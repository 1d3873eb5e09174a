"""Batched extension-field tower Fq2/Fq6/Fq12 on device limbs.

Same tower as the host oracle (`threshold_crypto_tpu.host.tower`):
Fq2 = Fq[u]/(u²+1), Fq6 = Fq2[v]/(v³-ξ) with ξ = 1+u, Fq12 = Fq6[w]/(w²-v).

Elements are pytrees of uint32[..., 24] Montgomery limb arrays:
Fq2 = (c0, c1), Fq6 = (fq2, fq2, fq2), Fq12 = (fq6, fq6).

**The central design rule: one stacked Montgomery multiply per formula.**
Every composite multiplication (Fq2, Fq6, Fq12, sparse line products) first
collects ALL its independent base-field products into a single
`[k, ..., L]`-stacked `mont.mul` call — e.g. a full Fq12 multiply issues its
54 Fq products as ONE CIOS scan over a 54×-wider batch.  This keeps XLA
graphs ~50× smaller (one control-flow op instead of dozens of nested scans;
compile time went from >9 min to seconds for the Miller loop) and feeds the
VPU wide, regular lanes at runtime.  Additions are likewise issued as
stacked `mont.add` calls wherever operands align.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..host import tower as htw
from . import mont
from .mont import FQ

# ---------------------------------------------------------------------------
# Stacking utilities
# ---------------------------------------------------------------------------

def _bcast_all(arrs):
    shape = jnp.broadcast_shapes(*[a.shape for a in arrs])
    return [jnp.broadcast_to(a, shape) for a in arrs]


def _stack(arrs):
    return jnp.stack(_bcast_all(list(arrs)), axis=0)


def _mul_many(pairs):
    """k independent Fq products as one stacked Montgomery multiply."""
    A = _stack([p[0] for p in pairs])
    B = _stack([p[1] for p in pairs])
    out = mont.mul(FQ, A, B)
    return [out[i] for i in range(len(pairs))]


def _add_many(pairs):
    A = _stack([p[0] for p in pairs])
    B = _stack([p[1] for p in pairs])
    out = mont.add(FQ, A, B)
    return [out[i] for i in range(len(pairs))]


def _sub_many(pairs):
    A = _stack([p[0] for p in pairs])
    B = _stack([p[1] for p in pairs])
    out = mont.sub(FQ, A, B)
    return [out[i] for i in range(len(pairs))]


def fq2_mul_many(pairs):
    """k independent Fq2 products (Karatsuba) via one 3k-stacked Fq multiply.

    The workhorse of the whole device tower: Fq6/Fq12/line products all
    funnel their component Fq2 multiplications through here.
    """
    k = len(pairs)
    sums = _add_many(
        [(x[0], x[1]) for x, _ in pairs] + [(y[0], y[1]) for _, y in pairs]
    )
    sa, sb = sums[:k], sums[k:]
    A = _stack(
        [x[0] for x, _ in pairs] + [x[1] for x, _ in pairs] + sa
    )
    B = _stack(
        [y[0] for _, y in pairs] + [y[1] for _, y in pairs] + sb
    )
    t = mont.mul(FQ, A, B)
    t0, t1, t2 = t[:k], t[k : 2 * k], t[2 * k :]
    c0 = mont.sub(FQ, t0, t1)
    c1 = mont.sub(FQ, mont.sub(FQ, t2, t0), t1)
    return [(c0[i], c1[i]) for i in range(k)]


# ---------------------------------------------------------------------------
# Fq2
# ---------------------------------------------------------------------------

def fq2_zero(shape=()):
    return (mont.zero(FQ, shape), mont.zero(FQ, shape))


def fq2_one(shape=()):
    return (mont.one(FQ, shape), mont.zero(FQ, shape))


def fq2_add(a, b):
    s = _add_many([(a[0], b[0]), (a[1], b[1])])
    return (s[0], s[1])


def fq2_sub(a, b):
    s = _sub_many([(a[0], b[0]), (a[1], b[1])])
    return (s[0], s[1])


def fq2_neg(a):
    n = mont.neg(FQ, _stack([a[0], a[1]]))
    return (n[0], n[1])


def fq2_conj(a):
    return (a[0], mont.neg(FQ, a[1]))


def fq2_mul(a, b):
    return fq2_mul_many([(a, b)])[0]


def fq2_sqr(a):
    a0, a1 = a
    s = mont.add(FQ, a0, a1)
    d = mont.sub(FQ, a0, a1)
    t = _mul_many([(s, d), (a0, a1)])
    return (t[0], mont.add(FQ, t[1], t[1]))


def fq2_scale_fq(a, k):
    t = mont.mul(FQ, _stack([a[0], a[1]]), k)
    return (t[0], t[1])


def fq2_mul_small(a, k: int):
    t = mont.mul_small(FQ, _stack([a[0], a[1]]), k)
    return (t[0], t[1])


def fq2_inv(a):
    a0, a1 = a
    sq = _mul_many([(a0, a0), (a1, a1)])
    norm = mont.add(FQ, sq[0], sq[1])
    ninv = mont.inv(FQ, norm)
    t = mont.mul(FQ, _stack([a0, a1]), ninv)
    return (t[0], mont.neg(FQ, t[1]))


def fq2_is_zero(a):
    return mont.is_zero(FQ, a[0]) & mont.is_zero(FQ, a[1])


def fq2_eq(a, b):
    return mont.eq(FQ, a[0], b[0]) & mont.eq(FQ, a[1], b[1])


def fq2_select(cond, a, b):
    return (mont.select(cond, a[0], b[0]), mont.select(cond, a[1], b[1]))


def mul_by_xi(a):
    """Multiply by ξ = 1 + u: (c0 - c1, c0 + c1)."""
    t = _sub_many([(a[0], a[1])]) + _add_many([(a[0], a[1])])
    return (t[0], t[1])


# ---------------------------------------------------------------------------
# Fq6 — decomposed into (operand prep, stacked Fq2 multiply, combine) so the
# Fq12 level can merge three Fq6 products into one stacked call.
# ---------------------------------------------------------------------------

def fq6_zero(shape=()):
    return (fq2_zero(shape), fq2_zero(shape), fq2_zero(shape))


def fq6_one(shape=()):
    return (fq2_one(shape), fq2_zero(shape), fq2_zero(shape))


def fq6_add(a, b):
    s = _add_many([(a[i][c], b[i][c]) for i in range(3) for c in range(2)])
    return ((s[0], s[1]), (s[2], s[3]), (s[4], s[5]))


def fq6_sub(a, b):
    s = _sub_many([(a[i][c], b[i][c]) for i in range(3) for c in range(2)])
    return ((s[0], s[1]), (s[2], s[3]), (s[4], s[5]))


def fq6_neg(a):
    n = mont.neg(FQ, _stack([a[i][c] for i in range(3) for c in range(2)]))
    return ((n[0], n[1]), (n[2], n[3]), (n[4], n[5]))


def _fq6_mul_parts(a, b):
    """The 6 Fq2 operand pairs of a Toom/Karatsuba Fq6 product."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    s = _add_many(
        [
            (a1[0], a2[0]), (a1[1], a2[1]),
            (a0[0], a1[0]), (a0[1], a1[1]),
            (a0[0], a2[0]), (a0[1], a2[1]),
            (b1[0], b2[0]), (b1[1], b2[1]),
            (b0[0], b1[0]), (b0[1], b1[1]),
            (b0[0], b2[0]), (b0[1], b2[1]),
        ]
    )
    a12, a01, a02 = (s[0], s[1]), (s[2], s[3]), (s[4], s[5])
    b12, b01, b02 = (s[6], s[7]), (s[8], s[9]), (s[10], s[11])
    return [(a0, b0), (a1, b1), (a2, b2), (a12, b12), (a01, b01), (a02, b02)]


def _fq6_mul_fin(t):
    """Combine the 6 Fq2 products into (c0, c1, c2)."""
    t0, t1, t2, m12, m01, m02 = t
    c0 = fq2_add(t0, mul_by_xi(fq2_sub(m12, fq2_add(t1, t2))))
    c1 = fq2_add(fq2_sub(m01, fq2_add(t0, t1)), mul_by_xi(t2))
    c2 = fq2_add(fq2_sub(m02, fq2_add(t0, t2)), t1)
    return (c0, c1, c2)


def fq6_mul(a, b):
    return _fq6_mul_fin(fq2_mul_many(_fq6_mul_parts(a, b)))


def fq6_sqr(a):
    return fq6_mul(a, a)


def fq6_mul_by_v(a):
    return (mul_by_xi(a[2]), a[0], a[1])


def fq6_mul_by_01(a, b0, b1):
    """a · (b0 + b1·v) — sparse product (5 Fq2 multiplies, one stacked call)."""
    t = fq2_mul_many(_sparse01_parts(a, b0, b1))
    return _sparse01_fin(t)


def _sparse01_parts(a, b0, b1):
    a0, a1, a2 = a
    sa = fq2_add(a0, a1)
    sb = fq2_add(b0, b1)
    return [(a0, b0), (a1, b1), (a2, b1), (sa, sb), (a2, b0)]


def _sparse01_fin(t):
    t0, t1, t2b1, tss, t2b0 = t
    c0 = fq2_add(t0, mul_by_xi(t2b1))
    c1 = fq2_sub(tss, fq2_add(t0, t1))
    c2 = fq2_add(t2b0, t1)
    return (c0, c1, c2)


def fq6_mul_by_1(a, b1):
    """a · (b1·v)."""
    t = fq2_mul_many([(a[2], b1), (a[0], b1), (a[1], b1)])
    return (mul_by_xi(t[0]), t[1], t[2])


def fq6_inv(a):
    a0, a1, a2 = a
    t = fq2_mul_many(
        [(a0, a0), (a2, a2), (a1, a1), (a1, a2), (a0, a1), (a0, a2)]
    )
    sq0, sq2, sq1, m12, m01, m02 = t
    c0 = fq2_sub(sq0, mul_by_xi(m12))
    c1 = fq2_sub(mul_by_xi(sq2), m01)
    c2 = fq2_sub(sq1, m02)
    u = fq2_mul_many([(a2, c1), (a1, c2), (a0, c0)])
    tt = fq2_add(mul_by_xi(fq2_add(u[0], u[1])), u[2])
    tinv = fq2_inv(tt)
    r = fq2_mul_many([(c0, tinv), (c1, tinv), (c2, tinv)])
    return (r[0], r[1], r[2])


def fq6_select(cond, a, b):
    return tuple(fq2_select(cond, x, y) for x, y in zip(a, b))


# ---------------------------------------------------------------------------
# Fq12
# ---------------------------------------------------------------------------

def fq12_zero(shape=()):
    return (fq6_zero(shape), fq6_zero(shape))


def fq12_one(shape=()):
    return (fq6_one(shape), fq6_zero(shape))


def fq12_add(a, b):
    return (fq6_add(a[0], b[0]), fq6_add(a[1], b[1]))


def fq12_mul(a, b):
    """One 18-wide stacked Fq2 multiply (= 54 Fq products in one scan)."""
    a0, a1 = a
    b0, b1 = b
    sa = fq6_add(a0, a1)
    sb = fq6_add(b0, b1)
    parts = (
        _fq6_mul_parts(a0, b0)
        + _fq6_mul_parts(a1, b1)
        + _fq6_mul_parts(sa, sb)
    )
    t = fq2_mul_many(parts)
    t0 = _fq6_mul_fin(t[0:6])
    t1 = _fq6_mul_fin(t[6:12])
    t3 = _fq6_mul_fin(t[12:18])
    c0 = fq6_add(t0, fq6_mul_by_v(t1))
    c1 = fq6_sub(t3, fq6_add(t0, t1))
    return (c0, c1)


def fq12_sqr(a):
    """Complex squaring via two merged Fq6 products."""
    a0, a1 = a
    s = fq6_add(a0, a1)
    sv = fq6_add(a0, fq6_mul_by_v(a1))
    parts = _fq6_mul_parts(a0, a1) + _fq6_mul_parts(s, sv)
    t = fq2_mul_many(parts)
    tt = _fq6_mul_fin(t[0:6])
    ss = _fq6_mul_fin(t[6:12])
    c0 = fq6_sub(fq6_sub(ss, tt), fq6_mul_by_v(tt))
    c1 = fq6_add(tt, tt)
    return (c0, c1)


def fq12_cyclo_sqr(a):
    """Granger–Scott cyclotomic squaring: 18 Fq products in ONE stacked call.

    Valid only for elements of the cyclotomic subgroup (anything after the
    easy part of the final exponentiation, i.e. f^(p⁶−1)(p²+1) and its
    products/powers/Frobenius images).  Replaces the generic 54-product
    `fq12_sqr` in the hard-part square chains — the dominant cost of the
    final exponentiation (6 × 63 squarings per `_exp_by_x`).

    Decomposes Fq12 into three Fq4 = Fq2[w']/(w'²−γ) pieces with
    coordinates z = (z0,z1), (z2,z3), (z4,z5) where
    c0 = (z0, z4, z3) and c1 = (z2, z1, z5); each Fq4 squaring is
    (a² + ξ·b², (a+b)² − a² − b²), and the subgroup relation folds the
    inverse (= conjugate) terms into the 2x+y recombination below.
    Correctness is asserted against `fq12_sqr` on real pairing outputs in
    tests/test_device_pairing.py.
    """
    (z0, z4, z3), (z2, z1, z5) = a

    # All 9 fq2 squarings (3 per Fq4) as 18 Fq products in one stacked mul:
    # fq2 sqr via (s·d, x0·x1): c0 = (x0+x1)(x0−x1), c1 = 2·x0·x1.
    sq_in = []
    for x, y in ((z0, z1), (z2, z3), (z4, z5)):
        xy = fq2_add(x, y)
        for e in (x, y, xy):
            sq_in.append(e)
    sums = _add_many([(e[0], e[1]) for e in sq_in])
    difs = _sub_many([(e[0], e[1]) for e in sq_in])
    A = _stack([s for s in sums] + [e[0] for e in sq_in])
    B = _stack([d for d in difs] + [e[1] for e in sq_in])
    t = mont.mul(FQ, A, B)
    sqs = [
        (t[i], mont.add(FQ, t[9 + i], t[9 + i])) for i in range(9)
    ]  # sqs[3k+j] = square of (x, y, x+y)[j] for Fq4 block k

    def fp4(k):
        t0sq, t1sq, ssq = sqs[3 * k], sqs[3 * k + 1], sqs[3 * k + 2]
        c0 = fq2_add(mul_by_xi(t1sq), t0sq)
        c1 = fq2_sub(fq2_sub(ssq, t0sq), t1sq)
        return c0, c1

    t0a, t1a = fp4(0)  # from (z0, z1)
    t0b, t1b = fp4(1)  # from (z2, z3)
    t0c, t1c = fp4(2)  # from (z4, z5)

    def two_x_minus_y_plus_x(x, y):
        d = fq2_sub(x, y)
        return fq2_add(fq2_add(d, d), x)

    def two_x_plus_y_plus_x(x, y):
        s = fq2_add(x, y)
        return fq2_add(fq2_add(s, s), x)

    z0o = two_x_minus_y_plus_x(t0a, z0)
    z1o = two_x_plus_y_plus_x(t1a, z1)
    z4o = two_x_minus_y_plus_x(t0b, z4)
    z5o = two_x_plus_y_plus_x(t1b, z5)
    xi_t1c = mul_by_xi(t1c)
    z2o = two_x_plus_y_plus_x(xi_t1c, z2)
    z3o = two_x_minus_y_plus_x(t0c, z3)
    return ((z0o, z4o, z3o), (z2o, z1o, z5o))


def fq12_conj(a):
    return (a[0], fq6_neg(a[1]))


def fq12_inv(a):
    a0, a1 = a
    parts = _fq6_mul_parts(a0, a0) + _fq6_mul_parts(a1, a1)
    t = fq2_mul_many(parts)
    s0 = _fq6_mul_fin(t[0:6])
    s1 = _fq6_mul_fin(t[6:12])
    tmp = fq6_inv(fq6_sub(s0, fq6_mul_by_v(s1)))
    parts = _fq6_mul_parts(a0, tmp) + _fq6_mul_parts(a1, tmp)
    t = fq2_mul_many(parts)
    return (_fq6_mul_fin(t[0:6]), fq6_neg(_fq6_mul_fin(t[6:12])))


def fq12_select(cond, a, b):
    return (fq6_select(cond, a[0], b[0]), fq6_select(cond, a[1], b[1]))


def fq12_is_one(a):
    shape = a[0][0][0].shape[:-1]
    o = fq12_one(shape)
    flat_a = [a[i][j][k] for i in range(2) for j in range(3) for k in range(2)]
    flat_o = [o[i][j][k] for i in range(2) for j in range(3) for k in range(2)]
    ok = None
    for got, want in zip(flat_a, flat_o):
        e = mont.eq(FQ, got, want)
        ok = e if ok is None else ok & e
    return ok


def fq12_mul_by_014(f, c0, c1, c4):
    """f · (c0 + c1·v + c4·v·w) — the sparse Miller-loop line product.

    13 Fq2 multiplies, all in one stacked call.
    """
    f0, f1 = f
    o = fq2_add(c1, c4)
    sf = fq6_add(f0, f1)
    parts = (
        _sparse01_parts(f0, c0, c1)
        + [(f1[2], c4), (f1[0], c4), (f1[1], c4)]
        + _sparse01_parts(sf, c0, o)
    )
    t = fq2_mul_many(parts)
    t0 = _sparse01_fin(t[0:5])
    t1 = (mul_by_xi(t[5]), t[6], t[7])
    t3 = _sparse01_fin(t[8:13])
    c1out = fq6_sub(t3, fq6_add(t0, t1))
    c0out = fq6_add(t0, fq6_mul_by_v(t1))
    return (c0out, c1out)


# ---------------------------------------------------------------------------
# Frobenius — coefficients derived by the host oracle, embedded as constants.
# ---------------------------------------------------------------------------

def _emb_fq2_const(c):
    # Plain numpy (not jnp): creating device arrays at import time would
    # initialize the XLA backend before a multi-host caller can run
    # jax.distributed.initialize().  jnp ops convert these on use.
    return (
        np.asarray(mont.to_mont(FQ, c[0])),
        np.asarray(mont.to_mont(FQ, c[1])),
    )


FROB12_C1 = [_emb_fq2_const(c) for c in htw.FROB12_C1]
FROB6_C1 = [_emb_fq2_const(c) for c in htw.FROB6_C1]
FROB6_C2 = [_emb_fq2_const(c) for c in htw.FROB6_C2]
# Products FROB6_Cx · FROB12_C1 precomputed host-side (used by fq12_frob).
FROB6_C1_X_12 = [
    _emb_fq2_const(htw.fq2_mul(a, b))
    for a, b in zip(htw.FROB6_C1, htw.FROB12_C1)
]
FROB6_C2_X_12 = [
    _emb_fq2_const(htw.fq2_mul(a, b))
    for a, b in zip(htw.FROB6_C2, htw.FROB12_C1)
]


def fq2_frob(a, power: int):
    return a if power % 2 == 0 else fq2_conj(a)


def fq12_frob(a, power: int):
    """(a)^(p^power): conjugate components, multiply by tower constants —
    5 constant Fq2 multiplies in one stacked call."""
    c0 = tuple(fq2_frob(x, power) for x in a[0])
    c1 = tuple(fq2_frob(x, power) for x in a[1])
    k = power % 12
    t = fq2_mul_many(
        [
            (c0[1], FROB6_C1[k]),
            (c0[2], FROB6_C2[k]),
            (c1[0], FROB12_C1[k]),
            (c1[1], FROB6_C1_X_12[k]),
            (c1[2], FROB6_C2_X_12[k]),
        ]
    )
    return ((c0[0], t[0], t[1]), (t[2], t[3], t[4]))


def fq6_frob(a, power: int):
    c0 = fq2_frob(a[0], power)
    t = fq2_mul_many(
        [
            (fq2_frob(a[1], power), FROB6_C1[power % 12]),
            (fq2_frob(a[2], power), FROB6_C2[power % 12]),
        ]
    )
    return (c0, t[0], t[1])


# ---------------------------------------------------------------------------
# Host <-> device conversions (tests / API boundary)
# ---------------------------------------------------------------------------

def fq2_from_host(c, shape=()):
    def bc(x):
        arr = mont.to_mont(FQ, x)
        return jnp.broadcast_to(jnp.asarray(arr), tuple(shape) + arr.shape)

    return (bc(c[0]), bc(c[1]))


def fq2_to_host(a):
    return (mont.from_mont_int(FQ, a[0]), mont.from_mont_int(FQ, a[1]))


def fq6_from_host(c, shape=()):
    return tuple(fq2_from_host(x, shape) for x in c)


def fq6_to_host(a):
    return tuple(fq2_to_host(x) for x in a)


def fq12_from_host(c, shape=()):
    return tuple(fq6_from_host(x, shape) for x in c)


def fq12_to_host(a):
    return tuple(fq6_to_host(x) for x in a)


def fq12_to_host_batch(a):
    """Batched device Fq12 (leading dims flattened) -> list of host tuples."""
    import numpy as np

    leaves = [
        np.asarray(a[i][j][k]).reshape(-1, mont.FQ.L)
        for i in range(2)
        for j in range(3)
        for k in range(2)
    ]
    n = leaves[0].shape[0]
    vals = [[mont.from_mont_int(FQ, row) for row in leaf] for leaf in leaves]
    out = []
    for b in range(n):
        flat = [v[b] for v in vals]
        it = iter(flat)
        out.append(
            tuple(
                tuple((next(it), next(it)) for _ in range(3)) for _ in range(2)
            )
        )
    return out
