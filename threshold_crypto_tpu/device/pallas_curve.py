"""Pallas megakernels for batched G1/G2 scalar multiplication (MSM).

The XLA-path curve ops (`device/curve.py`) run Montgomery multiplies as
limb-level HLO — ~15 M Fq-mul/s on a v5e chip and ~28 s of compile per
point-add body.  The pairing megakernels (`pallas_tower.py`) run the same
multiplies at ~150 M Fq-mul/s.  This module closes that gap for the OTHER
protocol hot loop — Σ rᵢ·Pᵢ over a share batch (RLC batch verification,
`/root/reference/src/lib.rs:177-179` pattern; Lagrange combine,
`/root/reference/src/lib.rs:740-765`) — with ONE fused kernel per
double-and-add step:

    acc ← 2·acc (+ Pᵢ if bitᵢ)        per lane, complete-formula selects

driven by `lax.scan` over the scalar bits (one Pallas call site, one Mosaic
compile).  The per-lane products are then reduced with the scan-fold
(`curve.fold_sum`) on the XLA side — the cross-lane tail is a negligible
fraction of the work.

Layout: points ride the packed ``uint32[n_planes, R, 128]`` limb-major
layout of `pallas_tower` (Jacobian G2 = 6 Fq components = 144 planes;
G1 = 3 = 72).  The per-step add/double formulas are hand-layered so each
multiply layer runs as few stacked engine instances as possible (the
doubling's Z-chain feeds the mixed add's Z² directly).

Correctness: the step kernel is asserted against the XLA curve ops
(`double`/`add` composition) in tests/test_pallas_curve.py, including the
T==Q, T==−Q, and infinity special cases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_tower as ptw
from .mont import FQ

L = ptw.L
LANES = ptw.LANES


# ---------------------------------------------------------------------------
# In-kernel field namespaces: identical formula code serves G1 (Fq) and
# G2 (Fq2).  Values are stacked uint32[24, S, 128] (Fq) or pairs (Fq2).
# ---------------------------------------------------------------------------

class _KFq:
    name = "fq"
    n_comp = 1

    mul_many = staticmethod(ptw.mul_many)
    add = staticmethod(ptw.k_add)
    sub = staticmethod(ptw.k_sub)
    neg = staticmethod(ptw.k_neg)
    small = staticmethod(ptw.k_small)

    @staticmethod
    def select(cond, a, b):
        """cond: bool[S, 128] -> elementwise choice of field values."""
        return jnp.where(cond[None], a, b)

    @staticmethod
    def is_zero(a):
        s = a[0]
        for j in range(1, L):
            s = s + a[j]
        return s == 0  # limbs < 2^16, 24 limbs: no overflow

    @staticmethod
    def one_like(a):
        # Per-limb scalar broadcasts: a materialized uint32[24] constant
        # would be captured by the kernel, which pallas_call rejects.
        return jnp.stack(
            [
                jnp.full(a.shape[1:], np.uint32(limb), jnp.uint32)
                for limb in ptw._ONE_LIMBS
            ],
            axis=0,
        )

    @staticmethod
    def zero_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def read(ref, k):
        return ptw.read_fqs(ref, k)

    @staticmethod
    def flat(vals):
        return list(vals)


class _KFq2:
    name = "fq2"
    n_comp = 2

    mul_many = staticmethod(ptw.fq2_mul_many)
    add = staticmethod(ptw.fq2_add)
    sub = staticmethod(ptw.fq2_sub)
    neg = staticmethod(ptw.fq2_neg)
    small = staticmethod(ptw.fq2_small)

    @staticmethod
    def select(cond, a, b):
        return (
            jnp.where(cond[None], a[0], b[0]),
            jnp.where(cond[None], a[1], b[1]),
        )

    @staticmethod
    def is_zero(a):
        return _KFq.is_zero(a[0]) & _KFq.is_zero(a[1])

    @staticmethod
    def one_like(a):
        return (_KFq.one_like(a[0]), _KFq.zero_like(a[1]))

    @staticmethod
    def zero_like(a):
        return (_KFq.zero_like(a[0]), _KFq.zero_like(a[1]))

    @staticmethod
    def read(ref, k):
        f = ptw.read_fqs(ref, 2 * k)
        return [(f[2 * i], f[2 * i + 1]) for i in range(k)]

    @staticmethod
    def flat(vals):
        out = []
        for v in vals:
            out += [v[0], v[1]]
        return out


# ---------------------------------------------------------------------------
# Fused double-and-(conditional)-add step, hand-layered for engine stacking.
# ---------------------------------------------------------------------------

def _msm_step(F, T, Q, do_add):
    """One MSM scan step: out ← 2T, then += Q where do_add (per lane).

    T: Jacobian (X, Y, Z); Q: affine (x2, y2) — Q-at-infinity lanes must be
    cleared in `do_add` by the driver.  Complete: handles T at infinity,
    2T == Q (doubling case) and 2T == −Q (cancellation) via selects.
    """
    X, Y, Z = T
    x2, y2 = Q

    # L1 — doubling squares/products
    m = F.mul_many([(X, X), (Y, Y), (Y, Z)])
    A, B, S = m  # S = Y·Z ; Zd = 2S
    XpB = F.add(X, B)
    E = F.small(A, 3)

    # L2 — finish doubling + start the madd Z-chain: Zd² = 4S²
    m = F.mul_many([(B, B), (XpB, XpB), (E, E), (S, S)])
    C, XB2, E2, SS = m
    D = F.small(F.sub(F.sub(XB2, A), C), 2)
    Xd = F.sub(E2, F.small(D, 2))
    z1z = F.small(SS, 4)  # Zd², with Zd = 2S
    Zd = F.small(S, 2)

    # L3 — doubling Y + madd u2/s2 chain
    m = F.mul_many([(E, F.sub(D, Xd)), (x2, z1z), (z1z, Zd)])
    EDX, u2, z1cu = m
    Yd = F.sub(EDX, F.small(C, 8))
    h = F.sub(u2, Xd)

    # L4 — s2, h², and the start of dbl(d) for the T==Q case
    m = F.mul_many([(y2, z1cu), (h, h), (Xd, Xd), (Yd, Yd), (Yd, Zd)])
    s2, hh, A2, B2, S2 = m  # S2 = Yd·Zd -> Zdd = 2·S2
    r = F.sub(s2, Yd)
    XpB2 = F.add(Xd, B2)
    E2_ = F.small(A2, 3)

    # L5 — madd core + dbl(d) squares
    m = F.mul_many(
        [(h, hh), (Xd, hh), (r, r), (B2, B2), (XpB2, XpB2), (E2_, E2_)]
    )
    hhh, v, rr, C2, XB2b, E2sq = m
    Xn = F.sub(F.sub(rr, hhh), F.small(v, 2))
    D2 = F.small(F.sub(F.sub(XB2b, A2), C2), 2)
    Xdd = F.sub(E2sq, F.small(D2, 2))

    # L6 — final products of madd and dbl(d)
    m = F.mul_many(
        [
            (r, F.sub(v, Xn)),
            (Yd, hhh),
            (Zd, h),
            (E2_, F.sub(D2, Xdd)),
        ]
    )
    rvx, Yhhh, Zn, EDX2 = m
    Yn = F.sub(rvx, Yhhh)
    Ydd = F.sub(EDX2, F.small(C2, 8))
    Zdd = F.small(S2, 2)

    # -- selects: assemble the complete madd result ------------------------
    one = F.one_like(X)
    zero = F.zero_like(X)
    h0 = F.is_zero(h)
    r0 = F.is_zero(r)
    t_inf = F.is_zero(Zd)

    # general mixed add
    Xo, Yo, Zo = Xn, Yn, Zn
    # 2T == Q  -> double again
    eq = h0 & r0
    Xo = F.select(eq, Xdd, Xo)
    Yo = F.select(eq, Ydd, Yo)
    Zo = F.select(eq, Zdd, Zo)
    # 2T == -Q -> infinity
    cancel = h0 & ~r0
    Xo = F.select(cancel, one, Xo)
    Yo = F.select(cancel, one, Yo)
    Zo = F.select(cancel, zero, Zo)
    # T at infinity -> Q (affine embedded in Jacobian)
    Xo = F.select(t_inf, x2, Xo)
    Yo = F.select(t_inf, y2, Yo)
    Zo = F.select(t_inf, one, Zo)

    # -- do_add gate: plain doubling where the bit is clear ----------------
    Xo = F.select(do_add, Xo, Xd)
    Yo = F.select(do_add, Yo, Yd)
    Zo = F.select(do_add, Zo, Zd)
    return Xo, Yo, Zo


def _jac_dbl(F, T):
    """Jacobian doubling (a=0): 7 muls in 3 layers; Z=0 stays Z=0."""
    X, Y, Z = T
    m = F.mul_many([(X, X), (Y, Y), (Y, Z)])
    A, B, S = m
    XpB = F.add(X, B)
    E = F.small(A, 3)
    m = F.mul_many([(B, B), (XpB, XpB), (E, E)])
    C, XB2, E2 = m
    D = F.small(F.sub(F.sub(XB2, A), C), 2)
    Xd = F.sub(E2, F.small(D, 2))
    m = F.mul_many([(E, F.sub(D, Xd))])
    Yd = F.sub(m[0], F.small(C, 8))
    Zd = F.small(S, 2)
    return (Xd, Yd, Zd)


def _jac_add(F, T, Q):
    """Complete Jacobian-Jacobian add, select-composed like curve.add:
    handles T/Q at infinity, T==Q (doubles) and T==−Q (infinity)."""
    X1, Y1, Z1 = T
    X2, Y2, Z2 = Q
    m = F.mul_many([(Z1, Z1), (Z2, Z2), (Z1, Z2)])
    z1z, z2z, Z1Z2 = m
    m = F.mul_many([(X1, z2z), (X2, z1z), (z2z, Z2), (z1z, Z1)])
    u1, u2, z2c, z1c = m
    h = F.sub(u2, u1)
    # chord products + dbl(T) layer 1 (for the T==Q case)
    m = F.mul_many(
        [(Y1, z2c), (Y2, z1c), (h, h), (X1, X1), (Y1, Y1), (Y1, Z1)]
    )
    s1, s2, hh, A_, B_, S_ = m
    r = F.sub(s2, s1)
    XpB = F.add(X1, B_)
    E_ = F.small(A_, 3)
    m = F.mul_many(
        [
            (h, hh), (u1, hh), (r, r), (Z1Z2, h),
            (B_, B_), (XpB, XpB), (E_, E_),
        ]
    )
    hhh, v, rr, Zo, C_, XB2, E2 = m
    Xo = F.sub(F.sub(rr, hhh), F.small(v, 2))
    D_ = F.small(F.sub(F.sub(XB2, A_), C_), 2)
    Xd = F.sub(E2, F.small(D_, 2))
    m = F.mul_many(
        [(r, F.sub(v, Xo)), (s1, hhh), (E_, F.sub(D_, Xd))]
    )
    rvx, s1hhh, EDX = m
    Yo = F.sub(rvx, s1hhh)
    Yd = F.sub(EDX, F.small(C_, 8))
    Zd = F.small(S_, 2)

    one = F.one_like(X1)
    zero = F.zero_like(X1)
    inf1 = F.is_zero(Z1)
    inf2 = F.is_zero(Z2)
    h0 = F.is_zero(h)
    r0 = F.is_zero(r)

    def sel3(c, a, b):
        return tuple(F.select(c, a[i], b[i]) for i in range(3))

    out = (Xo, Yo, Zo)
    out = sel3(h0 & r0, (Xd, Yd, Zd), out)        # T == Q  -> 2T
    out = sel3(h0 & ~r0, (one, one, zero), out)   # T == -Q -> infinity
    out = sel3(inf2, T, out)                      # T + 0
    out = sel3(inf1, Q, out)                      # 0 + Q
    return out


def _jac_madd(F, T, Q):
    """Complete mixed add: T (Jacobian) + Q (affine, not at infinity).

    Handles T at infinity, T == Q (doubles) and T == −Q (infinity) via
    selects — the Pallas analog of `curve.add` with an affine addend
    (11 muls + the 7-mul doubling branch, vs 16+7 for `_jac_add`).
    """
    X, Y, Z = T
    x2, y2 = Q
    # L1 — z1z + doubling squares (for the T == Q branch)
    m = F.mul_many([(Z, Z), (X, X), (Y, Y), (Y, Z)])
    z1z, A, B, S = m
    XpB = F.add(X, B)
    E = F.small(A, 3)
    # L2
    m = F.mul_many([(x2, z1z), (z1z, Z), (B, B), (XpB, XpB), (E, E)])
    u2, z1cu, C, XB2, E2 = m
    h = F.sub(u2, X)
    D = F.small(F.sub(F.sub(XB2, A), C), 2)
    Xd = F.sub(E2, F.small(D, 2))
    # L3
    m = F.mul_many([(y2, z1cu), (h, h), (E, F.sub(D, Xd))])
    s2, hh, EDX = m
    r = F.sub(s2, Y)
    Yd = F.sub(EDX, F.small(C, 8))
    Zd = F.small(S, 2)
    # L4
    m = F.mul_many([(h, hh), (X, hh), (r, r), (Z, h)])
    hhh, v, rr, Zn = m
    Xn = F.sub(F.sub(rr, hhh), F.small(v, 2))
    # L5
    m = F.mul_many([(r, F.sub(v, Xn)), (Y, hhh)])
    Yn = F.sub(m[0], m[1])

    one = F.one_like(X)
    zero = F.zero_like(X)
    h0 = F.is_zero(h)
    r0 = F.is_zero(r)
    t_inf = F.is_zero(Z)

    def sel3(c, a, b):
        return tuple(F.select(c, a[i], b[i]) for i in range(3))

    out = (Xn, Yn, Zn)
    out = sel3(h0 & r0, (Xd, Yd, Zd), out)        # T == Q  -> 2T
    out = sel3(h0 & ~r0, (one, one, zero), out)   # T == -Q -> infinity
    out = sel3(t_inf, (x2, y2, one), out)         # 0 + Q -> Q
    return out


def _msm_step_w4(F, T, table, digit):
    """One windowed MSM scan step: T ← 16T (+ table[d−1] if d = digit ≠ 0).

    table: 15 Jacobian points (1P..15P) per lane; digit: uint32[S, 128]
    base-16 digit.  Per 4 scalar bits: 4 doublings + ONE complete add —
    ~2.5× less multiply work per bit than the 1-bit `_msm_step`.
    """
    for _ in range(4):
        T = _jac_dbl(F, T)
    Q = table[0]
    for k in range(1, 15):
        c = digit == np.uint32(k + 1)
        Q = tuple(F.select(c, table[k][i], Q[i]) for i in range(3))
    s = _jac_add(F, T, Q)
    do = digit != 0
    return tuple(F.select(do, s[i], T[i]) for i in range(3))


def _mk_step_kernel(F):
    def kernel(acc_ref, q_ref, bit_ref, out_ref):
        a = F.read(acc_ref, 3)
        q = F.read(q_ref, 2)
        do_add = bit_ref[0] != 0
        Xo, Yo, Zo = _msm_step(F, tuple(a), tuple(q), do_add)
        ptw.write_fqs(out_ref, F.flat([Xo, Yo, Zo]))

    kernel.__name__ = f"_k_{F.name}_msm_step"
    return kernel


def _mk_step4_kernel(F):
    def kernel(acc_ref, table_ref, digit_ref, out_ref):
        T = tuple(F.read(acc_ref, 3))
        tab = F.read(table_ref, 45)  # 15 Jacobian points x 3 components
        table = [tuple(tab[3 * k : 3 * k + 3]) for k in range(15)]
        out = _msm_step_w4(F, T, table, digit_ref[0])
        ptw.write_fqs(out_ref, F.flat(list(out)))

    kernel.__name__ = f"_k_{F.name}_msm_step4"
    return kernel


def _mk_madd_kernel(F):
    """Table-build step: acc ← acc + Q (Q affine, per lane)."""

    def kernel(acc_ref, q_ref, out_ref):
        T = tuple(F.read(acc_ref, 3))
        q = F.read(q_ref, 2)
        out = _jac_madd(F, T, tuple(q))
        ptw.write_fqs(out_ref, F.flat(list(out)))

    kernel.__name__ = f"_k_{F.name}_madd"
    return kernel


def _mk_selmadd_kernel(F, nent: int):
    """Accumulation step of the shared-window MSM: acc ← acc + table[d−1]
    where d = digit ≠ 0 (complete Jacobian-Jacobian add, per lane);
    table holds nent = 2^w − 1 Jacobian multiples."""

    def kernel(acc_ref, table_ref, digit_ref, out_ref):
        T = tuple(F.read(acc_ref, 3))
        tab = F.read(table_ref, 3 * nent)
        table = [tuple(tab[3 * k : 3 * k + 3]) for k in range(nent)]
        digit = digit_ref[0]
        Q = table[0]
        for k in range(1, nent):
            c = digit == np.uint32(k + 1)
            Q = tuple(F.select(c, table[k][i], Q[i]) for i in range(3))
        s = _jac_add(F, T, Q)
        do = digit != 0
        out = tuple(F.select(do, s[i], T[i]) for i in range(3))
        ptw.write_fqs(out_ref, F.flat(list(out)))

    kernel.__name__ = f"_k_{F.name}_selmadd{nent}"
    return kernel


def _mk_dblw_kernel(F, w: int):
    """acc ← 2^w·acc: the between-windows doubling of the shared Horner
    accumulator (runs once per window on ONE block, not once per lane)."""

    def kernel(acc_ref, out_ref):
        T = tuple(F.read(acc_ref, 3))
        for _ in range(w):
            T = _jac_dbl(F, T)
        ptw.write_fqs(out_ref, F.flat(list(T)))

    kernel.__name__ = f"_k_{F.name}_dbl{w}"
    return kernel


_k_g1_msm_step = _mk_step_kernel(_KFq)
_k_g2_msm_step = _mk_step_kernel(_KFq2)
_k_g1_msm_step4 = _mk_step4_kernel(_KFq)
_k_g2_msm_step4 = _mk_step4_kernel(_KFq2)
_k_g1_madd = _mk_madd_kernel(_KFq)
_k_g2_madd = _mk_madd_kernel(_KFq2)


def _g1_step_impl(acc, q, bit):
    return ptw._call(
        _k_g1_msm_step, [3 * L, 2 * L, 1], [3 * L], [acc, q, bit]
    )


def _g2_step_impl(acc, q, bit):
    return ptw._call(
        _k_g2_msm_step, [6 * L, 4 * L, 1], [6 * L], [acc, q, bit]
    )


def _g1_step4_impl(acc, table, digit):
    return ptw._call(
        _k_g1_msm_step4, [3 * L, 45 * L, 1], [3 * L], [acc, table, digit]
    )


def _g2_step4_impl(acc, table, digit):
    return ptw._call(
        _k_g2_msm_step4, [6 * L, 90 * L, 1], [6 * L], [acc, table, digit]
    )


def _g1_madd_impl(acc, q):
    return ptw._call(_k_g1_madd, [3 * L, 2 * L], [3 * L], [acc, q])


def _g2_madd_impl(acc, q):
    return ptw._call(_k_g2_madd, [6 * L, 4 * L], [6 * L], [acc, q])


_impl_cache = {}


def _selmadd_impl(g2: bool, nent: int):
    key = ("selmadd", g2, nent)
    if key not in _impl_cache:
        F = _KFq2 if g2 else _KFq
        kern = _mk_selmadd_kernel(F, nent)
        nc = 3 * (2 if g2 else 1) * L  # accumulator planes

        def impl(acc, table, digit, _k=kern, _nc=nc, _ne=nent):
            return ptw._call(_k, [_nc, _ne * _nc, 1], [_nc],
                             [acc, table, digit])

        _impl_cache[key] = impl
    return _impl_cache[key]


def _dblw_impl(g2: bool, w: int):
    key = ("dblw", g2, w)
    if key not in _impl_cache:
        F = _KFq2 if g2 else _KFq
        kern = _mk_dblw_kernel(F, w)
        nc = 3 * (2 if g2 else 1) * L

        def impl(acc, _k=kern, _nc=nc):
            return ptw._call(_k, [_nc], [_nc], [acc])

        _impl_cache[key] = impl
    return _impl_cache[key]


def _packed_inf_vals(F, rows, lanes):
    """In-kernel packed Jacobian infinity (X = Y = Mont 1, Z = 0)."""
    one = jnp.stack(
        [jnp.full((rows, lanes), limb, jnp.uint32)
         for limb in ptw._ONE_LIMBS],
        axis=0,
    )
    zero = jnp.zeros((L, rows, lanes), jnp.uint32)
    if F.n_comp == 2:  # G2: X=(1,0), Y=(1,0), Z=(0,0)
        comps = [one, zero, one, zero, zero, zero]
    else:
        comps = [one, one, zero]
    return jnp.concatenate(comps, axis=0)


def _mk_winacc_kernel(F, nent, window, ndig, nblk):
    """The whole shared-window Horner phase as ONE kernel over a
    (windows × blocks) sequential grid: acc lives in VMEM scratch across
    every grid step (TPU grids execute in order), is 2^w-doubled at each
    window's first block, accumulates one gated select+add per block, and
    is written out once at the very last step.  Replaces ndig·nblk
    separate kernel dispatches (~100 µs fixed cost each — the dominant
    driver overhead measured at N=16k in r4)."""

    def kernel(table_ref, digit_ref, out_ref, acc_ref):
        w = pl.program_id(0)
        b = pl.program_id(1)

        @pl.when((w == 0) & (b == 0))
        def _init():
            acc_ref[...] = _packed_inf_vals(
                F, ptw.TILE_ROWS, LANES
            )

        @pl.when(b == 0)
        def _dbl():
            T = tuple(F.read(acc_ref, 3))
            for _ in range(window):
                T = _jac_dbl(F, T)
            ptw.write_fqs(acc_ref, F.flat(list(T)))

        T = tuple(F.read(acc_ref, 3))
        tab = F.read(table_ref, 3 * nent)
        table = [tuple(tab[3 * k : 3 * k + 3]) for k in range(nent)]
        digit = digit_ref[0, 0]
        Q = table[0]
        for k in range(1, nent):
            c = digit == np.uint32(k + 1)
            Q = tuple(F.select(c, table[k][i], Q[i]) for i in range(3))
        s = _jac_add(F, T, Q)
        do = digit != 0
        out = tuple(F.select(do, s[i], T[i]) for i in range(3))
        ptw.write_fqs(acc_ref, F.flat(list(out)))

        @pl.when((w == ndig - 1) & (b == nblk - 1))
        def _fin():
            out_ref[...] = acc_ref[...]

    kernel.__name__ = f"_k_{F.name}_winacc{nent}w{window}"
    return kernel


def _winacc_impl(g2: bool, nent: int, window: int, ndig: int, nblk: int):
    key = ("winacc", g2, nent, window, ndig, nblk)
    if key not in _impl_cache:
        F = _KFq2 if g2 else _KFq
        pplanes = 3 * F.n_comp * L
        kern = _mk_winacc_kernel(F, nent, window, ndig, nblk)

        def impl(tab_packed, digits4, _k=kern, _pp=pplanes):
            prev = ptw._ACTIVE_STACK
            ptw._ACTIVE_STACK = (
                ptw.DIRECT_STACK if ptw.DIRECT else ptw.MULTIBLOCK_STACK
            )
            try:
                return pl.pallas_call(
                    _k,
                    grid=(ndig, nblk),
                    in_specs=[
                        pl.BlockSpec(
                            (nent * _pp, ptw.TILE_ROWS, LANES),
                            lambda w, b: (0, b, 0),
                            memory_space=pltpu.VMEM,
                        ),
                        pl.BlockSpec(
                            (1, 1, ptw.TILE_ROWS, LANES),
                            lambda w, b: (w, b, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (_pp, ptw.TILE_ROWS, LANES),
                        lambda w, b: (0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    out_shape=jax.ShapeDtypeStruct(
                        (_pp, ptw.TILE_ROWS, LANES), jnp.uint32
                    ),
                    scratch_shapes=[
                        pltpu.VMEM((_pp, ptw.TILE_ROWS, LANES), jnp.uint32)
                    ],
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=ptw.VMEM_LIMIT_BYTES,
                    ),
                    interpret=ptw.INTERPRET,
                )(tab_packed, digits4)
            finally:
                ptw._ACTIVE_STACK = prev

        _impl_cache[key] = impl
    return _impl_cache[key]


p_g1_msm_step = jax.jit(_g1_step_impl)
p_g2_msm_step = jax.jit(_g2_step_impl)
p_g1_msm_step4 = jax.jit(_g1_step4_impl)
p_g2_msm_step4 = jax.jit(_g2_step4_impl)


# ---------------------------------------------------------------------------
# Driver: packed MSM over affine inputs.
# ---------------------------------------------------------------------------

def _bit_planes(k_limbs, nbits, R):
    """uint32[N, 16] canonical limbs -> uint32[nbits, 1, R, 128] MSB-first."""
    from . import curve as dcv

    n = k_limbs.shape[0]
    bits = dcv.scalar_bits(k_limbs, nbits)  # [nbits, N]
    if R * LANES != n:
        bits = jnp.pad(bits, ((0, 0), (0, R * LANES - n)))
    return bits.reshape(nbits, 1, R, LANES)


def _packed_inf_jac(planes, R):
    """Packed Jacobian infinity: X = Y = engine-Montgomery 1, Z = 0."""
    one = jnp.asarray(np.array(ptw._ONE_LIMBS, np.uint32))[:, None, None]
    one = jnp.broadcast_to(one, (L, R, LANES))
    zero = jnp.zeros((L, R, LANES), jnp.uint32)
    if planes == 3 * L:  # G1: X, Y, Z
        comps = [one, one, zero]
    else:  # G2: X(c0,c1), Y(c0,c1), Z(c0,c1)
        comps = [one, zero, one, zero, zero, zero]
    return jnp.concatenate(comps, axis=0)


def _jac_comps(curve, jac_tree):
    """Batched XLA Jacobian pytree -> flat Fq component list (read order)."""
    from . import curve as dcv

    if curve is dcv.G2:
        return [
            jac_tree[0][0], jac_tree[0][1],
            jac_tree[1][0], jac_tree[1][1],
            jac_tree[2][0], jac_tree[2][1],
        ]
    return list(jac_tree)


def msm_pallas(curve, points_aff, scalars, nbits: int = 64,
               window: int = 1, fold: bool = True):
    """Σ points_i·scalars_i through the fused Pallas step kernels.

    curve: dcv.G1 / dcv.G2; points_aff: the affine pytree (x, y, inf) of
    `device/pairing.g{1,2}_affine_from_host` layout; scalars: uint32[N, 16]
    canonical plain limbs.  Returns an UNBATCHED XLA Jacobian pytree
    (limbs-last), equal to `curve.msm*` on the same inputs — or, with
    fold=False, the per-lane products scalars_i·points_i as a BATCHED
    Jacobian pytree [N] (the megakernel form of `curve.scalar_mul`; the
    batched-encrypt path uses this, `ops.encrypt_batch`).

    window=1: scan over single bits (1 dbl + gated mixed add per bit).
    window=4: a 15-entry Jacobian multiple table per lane (built with ONE
    XLA scan-add body) and a scan over base-16 digits (4 dbl + ONE gated
    complete add per 4 bits — ~2.5× less multiply work per bit).
    """
    from . import curve as dcv

    x, y, inf = points_aff
    g2 = curve is dcv.G2
    n = inf.shape[0]
    R = ptw.pack_rows(n)
    acc_planes = 6 * L if g2 else 3 * L

    live = ~inf
    if R * LANES != n:
        live_p = jnp.pad(live, (0, R * LANES - n))
    else:
        live_p = live
    live_plane = live_p.reshape(1, 1, R, LANES).astype(jnp.uint32)

    acc0 = _packed_inf_jac(acc_planes, R)

    if window == 4:
        # Jacobian multiple table 1P..15P via one scan-add body
        p_jac = (x, y, dcv_select_z(curve, inf))

        def tbody(acc, _):
            nxt = curve.add(acc, p_jac)
            return nxt, nxt

        _, rest = jax.lax.scan(tbody, p_jac, None, length=14)
        table = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), p_jac, rest
        )  # [15, N] Jacobian
        tab_comps = []
        for k in range(15):
            entry = jax.tree_util.tree_map(lambda a: a[k], table)
            tab_comps += [
                c.reshape(n, ptw.XL) for c in _jac_comps(curve, entry)
            ]
        tab_packed = ptw.pack(tab_comps, n)

        digits = dcv.scalar_digits(scalars, nbits, 4)  # [D, N] MSB-first
        if R * LANES != n:
            digits = jnp.pad(digits, ((0, 0), (0, R * LANES - n)))
        digits = digits.reshape(-1, 1, R, LANES) * live_plane

        step = (
            (_g2_step4_impl if ptw.DIRECT else p_g2_msm_step4)
            if g2
            else (_g1_step4_impl if ptw.DIRECT else p_g1_msm_step4)
        )
        if ptw.DIRECT:
            acc = acc0
            for i in range(digits.shape[0]):
                acc = step(acc, tab_packed, digits[i])
        else:
            def body(acc, digit):
                return step(acc, tab_packed, digit), None

            acc, _ = jax.lax.scan(body, acc0, digits)
    else:
        comps = [x[0], x[1], y[0], y[1]] if g2 else [x, y]
        q_packed = ptw.pack([c.reshape(n, ptw.XL) for c in comps], n)
        bits = _bit_planes(scalars, nbits, R) * live_plane
        step = (
            (_g2_step_impl if ptw.DIRECT else p_g2_msm_step)
            if g2
            else (_g1_step_impl if ptw.DIRECT else p_g1_msm_step)
        )
        if ptw.DIRECT:
            # off-TPU validation: eager kernel bodies, Python-driven loop
            acc = acc0
            for i in range(bits.shape[0]):
                acc = step(acc, q_packed, bits[i])
        else:
            def body(acc, bit):
                return step(acc, q_packed, bit), None

            acc, _ = jax.lax.scan(body, acc0, bits)

    # unpack to the XLA Jacobian pytree and fold the lanes on the XLA side
    comps_out = ptw.unpack(acc, acc_planes // L, n)
    if g2:
        jac = (
            (comps_out[0], comps_out[1]),
            (comps_out[2], comps_out[3]),
            (comps_out[4], comps_out[5]),
        )
    else:
        jac = (comps_out[0], comps_out[1], comps_out[2])
    if not fold:
        return jac
    return dcv.fold_sum(curve, jac)


def scalar_mul_pallas(curve, points_aff, scalars, nbits: int = 255,
                      window: int = 4):
    """Per-lane scalars_i·points_i on the Pallas ladder (no fold): the
    megakernel form of `curve.scalar_mul` for full-width scalars —
    batched encryption's three scalar-muls ride this
    (`/root/reference/src/lib.rs:128-137`)."""
    return msm_pallas(curve, points_aff, scalars, nbits=nbits,
                      window=window, fold=False)


def scalar_mul_fixed_pallas(curve, points_aff, k: int, window: int = 4):
    """Per-lane k·P_i for ONE static public scalar k of ARBITRARY width.

    `scalar_mul_pallas` is capped at 256-bit per-lane scalars (the uint32
    [N, 16] limb layout); fixed public scalars wider than that — the
    507-bit G2 cofactor of `hash_g2`'s `scale_by_cofactor` step
    (`/root/reference/src/lib.rs:691-694` via pairing 0.16's
    `G2::random`) — previously had to be split across THREE chained
    255-bit ladders (3 multiple-table builds + 192 window steps).  Since
    k is a Python int known at trace time, ONE windowed ladder over its
    ⌈bits/4⌉ static base-16 digits with a single shared 15-entry table
    computes k·P directly: 1 table build + 127 steps for H2 (~1.5× less
    multiply work), same affine result.

    Returns the per-lane BATCHED Jacobian pytree [N] (like
    `scalar_mul_pallas`); infinity lanes stay at infinity.
    """
    from . import curve as dcv

    assert window == 4 and k >= 0
    x, y, inf = points_aff
    g2 = curve is dcv.G2
    n = inf.shape[0]
    R = ptw.pack_rows(n)
    acc_planes = 6 * L if g2 else 3 * L

    live = ~inf
    if R * LANES != n:
        live_p = jnp.pad(live, (0, R * LANES - n))
    else:
        live_p = live
    live_plane = live_p.reshape(1, 1, R, LANES).astype(jnp.uint32)

    # static MSB-first base-16 digits (leading zero digits dropped)
    nd = max(1, -(-max(k.bit_length(), 1) // window))
    digs = [(k >> (window * i)) & 0xF for i in range(nd - 1, -1, -1)]
    digits = (
        jnp.asarray(digs, jnp.uint32).reshape(nd, 1, 1, 1) * live_plane
    )  # [nd, 1, R, 128]

    # Jacobian multiple table 1P..15P via one scan-add body (shared with
    # `msm_pallas` window=4; P varies per lane, so the table is per-lane)
    p_jac = (x, y, dcv_select_z(curve, inf))

    def tbody(acc, _):
        nxt = curve.add(acc, p_jac)
        return nxt, nxt

    _, rest = jax.lax.scan(tbody, p_jac, None, length=14)
    table = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a[None], b], axis=0), p_jac, rest
    )
    tab_comps = []
    for j in range(15):
        entry = jax.tree_util.tree_map(lambda a: a[j], table)
        tab_comps += [
            c.reshape(n, ptw.XL) for c in _jac_comps(curve, entry)
        ]
    tab_packed = ptw.pack(tab_comps, n)

    acc0 = _packed_inf_jac(acc_planes, R)
    step = (
        (_g2_step4_impl if ptw.DIRECT else p_g2_msm_step4)
        if g2
        else (_g1_step4_impl if ptw.DIRECT else p_g1_msm_step4)
    )
    if ptw.DIRECT:
        acc = acc0
        for i in range(digits.shape[0]):
            acc = step(acc, tab_packed, digits[i])
    else:
        def body(acc, digit):
            return step(acc, tab_packed, digit), None

        acc, _ = jax.lax.scan(body, acc0, digits)

    comps_out = ptw.unpack(acc, acc_planes // L, n)
    if g2:
        return (
            (comps_out[0], comps_out[1]),
            (comps_out[2], comps_out[3]),
            (comps_out[4], comps_out[5]),
        )
    return (comps_out[0], comps_out[1], comps_out[2])


def _packed_one_planes(R):
    one = jnp.asarray(np.array(ptw._ONE_LIMBS, np.uint32))[:, None, None]
    return jnp.broadcast_to(one, (L, R, LANES))


def msm_pallas_shared(curve, points_aff, scalars, nbits: int = 64,
                      window: int = 3):
    """Σ points_i·scalars_i via shared-window Horner accumulation.

    The round-3 `msm_pallas` ladder pays 1 doubling per scalar BIT per
    LANE (64 G2 doublings/share dominate its multiply budget) and builds
    its window tables through the slow XLA point ops.  This form removes
    both costs (VERDICT r3 next-step #1):

    * table:  1P..15P per lane via a `lax.scan` over the Pallas mixed-add
      kernel — 14 complete madds/lane at megakernel throughput;
    * digits: base-16 windows processed MSB→LSB with ONE shared
      1024-lane Horner accumulator A:  per window, A ← 16·A (4 doublings
      on a single block — amortized to ~1/share at N=64k) followed by a
      scan over the lane blocks  A ← A + table[digit−1]  (one complete
      add per lane per window — 16 adds/share total);
    * the 1024 partial sums fold once on the XLA side at the end.

    ~2500 Fq-muls/share for the G1+G2 pair of 64-bit MSMs vs ~4500 for
    the ladder (with its tables on the 3×-slower XLA path).  Accelerates
    the reference's per-share verify loop
    (`/root/reference/src/lib.rs:177-179`) in RLC-batched form.

    Args/results exactly as `msm_pallas` (affine pytree in, unbatched
    XLA Jacobian pytree out).  window=3 default: a 7-entry table keeps the
    per-block table slice at ~16 MB of VMEM for G2 (2^w−1 entries; w=4's
    15 entries would double it past the Mosaic scoped budget on
    multi-block grids) at the same per-share multiply count.
    """
    from . import curve as dcv

    x, y, inf = points_aff
    g2 = curve is dcv.G2
    n = inf.shape[0]
    R = ptw.pack_rows(n)
    nblk = R // ptw.TILE_ROWS
    ncomp = 2 if g2 else 1
    pplanes = 3 * ncomp * L
    nent = (1 << window) - 1

    # -- digits [D, nblk, 1, 8, 128], dead lanes forced to digit 0 ---------
    live = ~inf
    if R * LANES != n:
        live = jnp.pad(live, (0, R * LANES - n))
    live_rows = live.reshape(R, LANES).astype(jnp.uint32)
    digits = dcv.scalar_digits(scalars, nbits, window)  # [D, N] MSB-first
    ndig = digits.shape[0]
    if R * LANES != n:
        digits = jnp.pad(digits, ((0, 0), (0, R * LANES - n)))
    digits = digits.reshape(ndig, R, LANES) * live_rows[None]
    dig_blocks = digits.reshape(ndig, nblk, 1, ptw.TILE_ROWS, LANES)

    # -- affine packed base + its Jacobian lift (Z = 1; dead lanes carry
    # placeholder coordinates but their digits are 0, so never selected) --
    comps = [x[0], x[1], y[0], y[1]] if g2 else [x, y]
    q_packed = ptw.pack([c.reshape(n, ptw.XL) for c in comps], n)
    one_planes = _packed_one_planes(R)
    if g2:
        z_planes = jnp.concatenate(
            [one_planes, jnp.zeros((L, R, LANES), jnp.uint32)], axis=0
        )
    else:
        z_planes = one_planes
    base_jac = jnp.concatenate([q_packed, z_planes], axis=0)

    madd = _g2_madd_impl if g2 else _g1_madd_impl
    selmadd = _selmadd_impl(g2, nent)
    dblw = _dblw_impl(g2, window)

    # -- per-lane multiple table 1P..(2^w−1)P, all adds in Pallas ----------
    if ptw.DIRECT:
        entries = [base_jac]
        for _ in range(nent - 1):
            entries.append(madd(entries[-1], q_packed))
        tab = jnp.stack(entries, axis=0)
    else:
        def tbody(acc, _):
            nxt = madd(acc, q_packed)
            return nxt, nxt

        _, rest = jax.lax.scan(tbody, base_jac, None, length=nent - 1)
        tab = jnp.concatenate([base_jac[None], rest], axis=0)

    # -- shared-window Horner over one accumulator block -------------------
    if ptw.DIRECT:
        # per-block loop over the small select+add / dbl kernels (the fused
        # grid kernel below is exercised on TPU; same math)
        tab_blocks = (
            tab.reshape(nent, pplanes, nblk, ptw.TILE_ROWS, LANES)
            .transpose(2, 0, 1, 3, 4)
            .reshape(nblk, nent * pplanes, ptw.TILE_ROWS, LANES)
        )
        acc = _packed_inf_jac(pplanes, ptw.TILE_ROWS)
        for w in range(ndig):
            acc = dblw(acc)
            for j in range(nblk):
                acc = selmadd(acc, tab_blocks[j], dig_blocks[w, j])
    else:
        # ONE pallas_call for the whole phase: sequential (window, block)
        # grid, acc in VMEM scratch, table blocks streamed from HBM.
        tab_packed = tab.reshape(nent * pplanes, R, LANES)
        digits4 = dig_blocks.reshape(ndig, nblk, ptw.TILE_ROWS, LANES)
        acc = _winacc_impl(g2, nent, window, ndig, nblk)(
            tab_packed, digits4
        )

    # -- unpack the 1024 partial sums and fold on the XLA side -------------
    comps_out = ptw.unpack(acc, 3 * ncomp, ptw.TILE_ROWS * LANES)
    if g2:
        jac = (
            (comps_out[0], comps_out[1]),
            (comps_out[2], comps_out[3]),
            (comps_out[4], comps_out[5]),
        )
    else:
        jac = (comps_out[0], comps_out[1], comps_out[2])
    return dcv.fold_sum(curve, jac)


def dcv_select_z(curve, inf):
    """Z ∈ {0, 1} column for lifting an affine pytree to Jacobian."""
    f = curve.f
    shape = inf.shape
    return f.select(inf, f.zero(shape), f.one(shape))
