"""Pallas TPU kernels for batched Montgomery limb arithmetic.

The XLA-graph field engine in :mod:`.mont` expresses one CIOS round per
`lax.scan` step, so every 16-bit-limb operation is its own tiny HLO op —
measured at ~11 M Fq-muls/s on a v5e chip (benches/micro_mont.py), two
orders of magnitude below VPU speed-of-light.  This module replaces the
multiply inner loop with ONE Pallas kernel per call:

* Layout inside the kernel is **limb-major** ``uint32[L, TR, 128]``: the
  batch fills whole (sublane × lane) = (8, 128) VPU tiles, so every limb
  operation is a fully-occupied vector op; the ``[..., L]`` public layout
  is transposed at the kernel boundary (an O(N·L) memory pass against the
  multiply's O(N·L²) compute).
* The full 24-round CIOS loop (`mont._cios_round` semantics, bit-for-bit)
  is unrolled in registers — no per-round HLO ops, no materialized
  intermediates, no carry `lax.scan`.
* The kernel is shape-polymorphic over the flattened batch via a 1-D grid
  of row blocks; stacked-product calls from the tower (3k/13k/18k-wide
  Fq multiplies) all funnel through the same code.

Used automatically by `mont.mul` when the active JAX backend is a TPU;
the pure-XLA path remains for CPU (tests) and as a cross-check
(`tests/test_pallas.py` runs this kernel in interpreter mode against the
scan engine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK16 = np.uint32(0xFFFF)
LANES = 128
TILE_ROWS = 8  # sublane rows per grid block -> 1024 batch lanes per block

# Flipped by tests to run kernels through the Pallas interpreter on CPU.
INTERPRET = False


def _mul_kernel(spec, a_ref, b_ref, o_ref):
    """Montgomery product of one (L, TR, 128) block, column-scanning (SOS).

    Two sweeps of output columns, each accumulating all of a column's limb
    products into a pair of registers before touching memory — unlike the
    row-scanning CIOS form, whose (L+1)-row running state spills to VMEM and
    turns every VPU op into load/compute/store (measured 7× off the ALU
    envelope).  Produces exactly `mont._mont_mul_impl`'s canonical result
    (asserted in tests/test_pallas.py).

    Phase 1:  T = a·b           — 48 columns, canonical 16-bit + carry.
    Phase 2:  U = (T + m·p)/R   — m limbs derived column-by-column
                                   (m = T·(-p⁻¹) mod R), then the standard
                                   conditional subtract (U < 2p).
    """
    L = spec.L
    p = [np.uint32(v) for v in spec.p_limbs]
    n0inv = np.uint32(spec.n0inv)
    zero = jnp.zeros_like(a_ref[0])

    a = [a_ref[i] for i in range(L)]
    b = [b_ref[i] for i in range(L)]

    def tree_sum(terms):
        """Pairwise-balanced sum: depth ⌈log₂ n⌉ instead of n — the VPU is
        latency-bound on serial accumulate chains, so keeping every column's
        reduction shallow is worth ~3× on the whole kernel."""
        if not terms:
            return zero
        while len(terms) > 1:
            nxt = [
                terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)
            ]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]

    # Phase 1: schoolbook product by columns. col ≤ carry_in + L·(2^16-1)
    # and carry ≤ 2^5 + L·(2^16-1) both stay far below 2^32 for L ≤ 24.
    T = []
    carry = zero
    for k in range(2 * L - 1):
        prods = [
            a[i] * b[k - i]
            for i in range(max(0, k - L + 1), min(k, L - 1) + 1)
        ]
        col = carry + tree_sum([q & MASK16 for q in prods])
        hi = tree_sum([q >> 16 for q in prods])
        T.append(col & MASK16)
        carry = (col >> 16) + hi
    T.append(carry & MASK16)  # column 2L-1
    # a·b < p² < 2^(32L): no carry past column 2L-1.

    # Phase 2: interleaved reduction. m_k fixed so every low column ≡ 0.
    m = []
    carry = zero
    U = []
    for k in range(2 * L):
        prods = [
            m[i] * p[k - i]
            for i in range(max(0, k - L + 1), min(k, L - 1, len(m) - 1) + 1)
        ]
        col = T[k] + carry + tree_sum([q & MASK16 for q in prods])
        hi = tree_sum([q >> 16 for q in prods])
        if k < L:
            mk = ((col & MASK16) * n0inv) & MASK16
            m.append(mk)
            prod = mk * p[0]
            col = col + (prod & MASK16)
            hi = hi + (prod >> 16)
        else:
            U.append(col & MASK16)
        carry = (col >> 16) + hi
    over = carry  # exact: (T + m·p)/R < 2p ⇒ over ∈ {0, 1}

    # Conditional subtract of p (borrow-chain compare, select).
    big = np.uint32(1 << 16)
    diff = []
    borrow = zero
    for j in range(L):
        d = U[j] + big - p[j] - borrow
        diff.append(d & MASK16)
        borrow = np.uint32(1) - (d >> 16)
    take = (over != 0) | (borrow == 0)
    for j in range(L):
        o_ref[j] = jnp.where(take, diff[j], U[j])


@functools.partial(jax.jit, static_argnums=(0, 3))
def _mul_rows(spec, a, b, rows_per_block: int):
    """Limb-major (L, R, 128) operands -> (L, R, 128) Montgomery product."""
    L = spec.L
    R = a.shape[1]
    grid = R // rows_per_block
    block = pl.BlockSpec(
        (L, rows_per_block, LANES), lambda g: (0, g, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_mul_kernel, spec),
        grid=(grid,),
        in_specs=[block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((L, R, LANES), jnp.uint32),
        interpret=INTERPRET,
    )(a, b)


def mul(spec, a, b):
    """Batched (a·b·R⁻¹ mod p) on ``uint32[..., L]`` Montgomery limbs.

    Drop-in replacement for `mont.mul`'s scan engine: broadcasts the free
    batch dims, pads the flattened batch to whole row blocks, transposes to
    limb-major, runs the kernel, and restores the public layout.
    """
    L = spec.L
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (L,))
    b = jnp.broadcast_to(b, shape + (L,))

    n = 1
    for d in shape:
        n *= d
    block = TILE_ROWS * LANES
    n_pad = max(-(-n // block), 1) * block

    def to_rows(x):
        x = x.reshape(n, L)
        if n_pad != n:
            x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        return x.T.reshape(L, n_pad // LANES, LANES)

    out = _mul_rows(spec, to_rows(a), to_rows(b), TILE_ROWS)
    out = out.reshape(L, n_pad).T
    if n_pad != n:
        out = out[:n]
    return out.reshape(shape + (L,))


# ---------------------------------------------------------------------------
# Fixed-exponent power megakernel (Fermat inversion, sqrt exponents).
#
# `mont.pow_fixed`'s lax.scan runs one multiply dispatch per exponent bit:
# a 381-bit Fermat inversion is ~760 sequential in-program kernel launches
# (~50-100 µs fixed cost each on the tunneled chip), measured 45 ms for a
# [4096] Fq batch and 74 ms even for a SINGLE point — dispatch-bound at any
# width.  Here the whole square-and-multiply chain runs inside ONE kernel:
# the exponent bits sit in SMEM, the accumulator stays in registers/VMEM,
# and each fori_loop step is a fused sqr + conditional-multiply (the
# "conditional" is a lane-wide select on a scalar bit — branch-free).
# ---------------------------------------------------------------------------


def _k_mul_stacked(spec, a, b):
    """Montgomery product on stacked uint32[L, S, 128] values — the same
    two-phase SOS column schedule as `_mul_kernel`, in functional form so
    it can live inside loop bodies (pallas_fr.k_mul generalized to any
    16-bit-limb FpSpec)."""
    L = spec.L
    P = [np.uint32(v) for v in spec.p_limbs]
    n0inv = np.uint32(spec.n0inv)
    zero = jnp.zeros_like(a[0])
    al = [a[i] for i in range(L)]
    bl = [b[i] for i in range(L)]

    def tsum(terms):
        if not terms:
            return zero
        terms = list(terms)
        while len(terms) > 1:
            nxt = [terms[i] + terms[i + 1]
                   for i in range(0, len(terms) - 1, 2)]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]

    T = []
    carry = zero
    for k in range(2 * L - 1):
        prods = [al[i] * bl[k - i]
                 for i in range(max(0, k - L + 1), min(k, L - 1) + 1)]
        col = carry + tsum([q & MASK16 for q in prods])
        hi = tsum([q >> 16 for q in prods])
        T.append(col & MASK16)
        carry = (col >> 16) + hi
    T.append(carry & MASK16)

    m = []
    carry = zero
    U = []
    for k in range(2 * L):
        prods = [m[i] * P[k - i]
                 for i in range(max(0, k - L + 1),
                                min(k, L - 1, len(m) - 1) + 1)]
        col = T[k] + carry + tsum([q & MASK16 for q in prods])
        hi = tsum([q >> 16 for q in prods])
        if k < L:
            mk = ((col & MASK16) * n0inv) & MASK16
            m.append(mk)
            prod = mk * P[0]
            col = col + (prod & MASK16)
            hi = hi + (prod >> 16)
        else:
            U.append(col & MASK16)
        carry = (col >> 16) + hi
    over = carry

    big = np.uint32(1 << 16)
    diff = []
    borrow = zero
    for j in range(L):
        d = U[j] + big - P[j] - borrow
        diff.append(d & MASK16)
        borrow = np.uint32(1) - (d >> 16)
    take = (over != 0) | (borrow == 0)
    return jnp.stack(
        [jnp.where(take, diff[j], U[j]) for j in range(L)], axis=0
    )


def _pow_kernel(spec, nbits, a_ref, bits_ref, o_ref):
    L = spec.L
    one = jnp.stack(
        [jnp.full((TILE_ROWS, LANES),
                  np.uint32((spec.one_mont >> (16 * i)) & 0xFFFF),
                  jnp.uint32)
         for i in range(L)],
        axis=0,
    )
    base = jnp.stack([a_ref[i] for i in range(L)], axis=0)

    def body(i, acc):
        acc = _k_mul_stacked(spec, acc, acc)
        withm = _k_mul_stacked(spec, acc, base)
        bit = bits_ref[i]
        return jnp.where(bit != 0, withm, acc)

    out = jax.lax.fori_loop(0, nbits, body, one)
    o_ref[...] = out


@functools.partial(jax.jit, static_argnums=(0, 3))
def _pow_rows(spec, a, bits, nbits: int):
    """Limb-major (L, R, 128) base -> (L, R, 128) a^e (MSB-first bits)."""
    L = spec.L
    R = a.shape[1]
    grid = R // TILE_ROWS
    block = pl.BlockSpec(
        (L, TILE_ROWS, LANES), lambda g: (0, g, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_pow_kernel, spec, nbits),
        grid=(grid,),
        in_specs=[block, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((L, R, LANES), jnp.uint32),
        interpret=INTERPRET,
    )(a, bits)


def pow_fixed(spec, a, e: int):
    """Batched a^e on ``uint32[..., L]`` Montgomery limbs, one kernel
    dispatch per ⌈batch/1024⌉ row blocks (sequential grid).  Semantics
    identical to `mont.pow_fixed` (0^e = 0 via Fermat for e = p−2)."""
    L = spec.L
    shape = a.shape[:-1]
    n = 1
    for d in shape:
        n *= d
    block = TILE_ROWS * LANES
    n_pad = max(-(-n // block), 1) * block

    x = a.reshape(n, L)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    rows = x.T.reshape(L, n_pad // LANES, LANES)

    bits = jnp.asarray([int(b) for b in bin(e)[2:]], dtype=jnp.int32)
    out = _pow_rows(spec, rows, bits, int(bits.shape[0]))
    out = out.reshape(L, n_pad).T
    if n_pad != n:
        out = out[:n]
    return out.reshape(shape + (L,))
