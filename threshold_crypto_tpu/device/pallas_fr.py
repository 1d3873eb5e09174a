"""Pallas Fr (scalar-field) engine + the fused Lagrange-denominator kernel.

Round 4 measured the large-N threshold combine dominated not by the
in-exponent MSM (106 ms at t+1=4096 through the shared-window kernel) but
by the O(N²) λ-coefficient denominators: `ops.fr.lagrange_coeffs_at_zero`
ran its N² Fr products through the generic per-call `pallas_mont` path at
~38 M Fr-mul/s (647 ms at N=4096) — every multiply paying a boundary
transpose and an HBM round trip (PERF.md, "MSM / combine").

This module keeps the whole denominator sweep inside ONE Pallas kernel:

* the Fr engine is the 16×16-bit SOS Montgomery multiplier of
  `pallas_mont._mul_kernel` / `pallas_tower._k_mul16`, instantiated for the
  255-bit scalar field r (R = 2^256, the same Montgomery form the XLA side
  uses, so pack/unpack is a pure transpose — no base conversion);
* `den_i = Π_{j≠i}(x_j − x_i)` is an all-pairs product.  Lanes cannot
  gather arbitrary x_j, so the kernel runs a *systolic rotation*: for each
  (i-block, j-block) tile pair the j-tile is rotated one lane per step
  (and one sublane per 128 steps), so after 8·128 = 1024 fused
  sub+select+multiply steps every i-lane has met every j-value of the
  tile.  The rotation is ~17 cheap vreg ops against ~1 900 for the
  multiply — >98 % of the kernel is the Fr engine itself.
* the accumulator lives in VMEM scratch across a sequential
  (i-blocks × j-blocks) grid (the `_mk_winacc_kernel` pattern,
  device/pallas_curve.py) and is written out once per i-block.

Duplicate detection rides along: a per-lane count of zero differences
against *live* j-lanes is accumulated in scratch; with distinct inputs
every lane sees exactly ONE zero (its own diagonal x_i − x_i), so
`count != 1` anywhere ⟺ some x_i == x_j collision — the condition the
reference reports as DuplicateEntry through a failed inverse
(`/root/reference/src/lib.rs:754-763`).  Zero diffs (and dead padded
j-lanes) multiply as 1 so the product stays exact.

Correctness: `DIRECT = True` runs the identical cell function as plain
jnp tracing code over the packed layout (the repo's standard off-TPU
megakernel validation mode); tests/test_pallas_fr.py asserts it against
the independent `ops.fr._lagrange_matrix` path and host bignum.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mont import FR

LANES = 128
TILE_ROWS = 8  # sublane rows per block -> 1024 lanes per grid block
MASK16 = np.uint32(0xFFFF)
L = FR.L  # 16 × 16-bit limbs (R = 2^256)

_P_LIMBS = [np.uint32(v) for v in FR.p_limbs]
_N0INV = np.uint32(FR.n0inv)
_ONE_LIMBS = [
    np.uint32((FR.one_mont >> (16 * i)) & 0xFFFF) for i in range(L)
]

# Flipped by tests: run the cell function as plain jnp code on the packed
# layout (no pallas_call) — validates kernel math + driver logic on CPU.
DIRECT = False
# Flipped by tests: route through the Pallas interpreter instead.
INTERPRET = False


def _tree_sum(terms, zero):
    if not terms:
        return zero
    terms = list(terms)
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


# ---------------------------------------------------------------------------
# Fr primitives on stacked uint32[L, S, 128] values (limb-major).
# Same column schedule / carry bounds as pallas_tower._k_mul16, with the
# scalar-field constants.
# ---------------------------------------------------------------------------

def k_mul(a, b):
    """Montgomery product a·b·R⁻¹ mod r on stacked values."""
    zero = jnp.zeros_like(a[0])
    al = [a[i] for i in range(L)]
    bl = [b[i] for i in range(L)]

    T = []
    carry = zero
    for k in range(2 * L - 1):
        prods = [
            al[i] * bl[k - i]
            for i in range(max(0, k - L + 1), min(k, L - 1) + 1)
        ]
        col = carry + _tree_sum([q & MASK16 for q in prods], zero)
        hi = _tree_sum([q >> 16 for q in prods], zero)
        T.append(col & MASK16)
        carry = (col >> 16) + hi
    T.append(carry & MASK16)

    m = []
    carry = zero
    U = []
    for k in range(2 * L):
        prods = [
            m[i] * _P_LIMBS[k - i]
            for i in range(max(0, k - L + 1), min(k, L - 1, len(m) - 1) + 1)
        ]
        col = T[k] + carry + _tree_sum([q & MASK16 for q in prods], zero)
        hi = _tree_sum([q >> 16 for q in prods], zero)
        if k < L:
            mk = ((col & MASK16) * _N0INV) & MASK16
            m.append(mk)
            prod = mk * _P_LIMBS[0]
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
        d = U[j] + big - _P_LIMBS[j] - borrow
        diff.append(d & MASK16)
        borrow = np.uint32(1) - (d >> 16)
    take = (over != 0) | (borrow == 0)
    return jnp.stack(
        [jnp.where(take, diff[j], U[j]) for j in range(L)], axis=0
    )


def k_sub(a, b):
    """(a − b) mod r on stacked values."""
    zero = jnp.zeros_like(a[0])
    big = np.uint32(1 << 16)
    d = []
    borrow = zero
    for j in range(L):
        x = a[j] + big - b[j] - borrow
        d.append(x & MASK16)
        borrow = np.uint32(1) - (x >> 16)
    s = []
    carry = zero
    for j in range(L):
        c = d[j] + _P_LIMBS[j] + carry
        s.append(c & MASK16)
        carry = c >> 16
    take = borrow != 0
    return jnp.stack([jnp.where(take, s[j], d[j]) for j in range(L)], axis=0)


def _one_tile(rows, lanes):
    return jnp.stack(
        [jnp.full((rows, lanes), limb, jnp.uint32) for limb in _ONE_LIMBS],
        axis=0,
    )


# ---------------------------------------------------------------------------
# Packed layout (pure transpose; Fr's engine form == the XLA-side form).
# ---------------------------------------------------------------------------

def pack_rows(n: int) -> int:
    rows = -(-n // LANES)
    return -(-rows // TILE_ROWS) * TILE_ROWS


def pack_fr(c, n: int):
    """uint32[n, 16] -> packed uint32[16, R, 128]."""
    R = pack_rows(n)
    c = c.reshape(n, L)
    if R * LANES != n:
        c = jnp.pad(c, ((0, R * LANES - n), (0, 0)))
    return c.T.reshape(L, R, LANES)


def unpack_fr(p, n: int):
    """Packed uint32[16, R, 128] -> uint32[n, 16]."""
    R = p.shape[1]
    return p.reshape(L, R * LANES).T[:n]


# ---------------------------------------------------------------------------
# The all-pairs denominator cell: one (i-block, j-block) tile pair.
# ---------------------------------------------------------------------------

def _roll(x, axis):
    """Rotate by one position along `axis` (lane or sublane)."""
    if DIRECT or INTERPRET:
        return jnp.roll(x, 1, axis=axis)
    return pltpu.roll(x, 1, axis)


def _cell(xi, jt, acc, zc):
    """Fold one j-tile into (acc, zc) for one i-tile.

    xi:  uint32[L, 8, 128]   the i-block's x values (Montgomery form)
    jt:  uint32[L+1, 8, 128] the j-block's x values + live plane (plane L)
    acc: uint32[L, 8, 128]   running Π(x_j − x_i) (Montgomery form)
    zc:  uint32[8, 128]      running count of zero diffs vs live j-lanes

    8·128 steps: at step (r, s) lane (a, b) of the i-tile meets the j-value
    originally at position (a+r mod 8, b+s mod 128).  Rotation visits every
    (r, s) exactly once, so each i-lane multiplies against all 1024 j-lanes
    of the tile.
    """
    one = _one_tile(xi.shape[1], xi.shape[2])

    def lane_step(_, carry):
        jt, acc, zc = carry
        xj = jt[:L]
        lv = jt[L]
        diff = k_sub(xj, xi)
        isz = _tree_sum([diff[i] for i in range(L)],
                        jnp.zeros_like(diff[0])) == 0
        dead = isz | (lv == 0)
        factor = jnp.where(dead[None], one, diff)
        acc = k_mul(acc, factor)
        zc = zc + jnp.where(isz & (lv != 0), np.uint32(1), np.uint32(0))
        jt = _roll(jt, 2)
        return jt, acc, zc

    def row_step(_, carry):
        jt, acc, zc = carry
        jt, acc, zc = jax.lax.fori_loop(
            0, LANES, lane_step, (jt, acc, zc)
        )
        jt = _roll(jt, 1)
        return jt, acc, zc

    _, acc, zc = jax.lax.fori_loop(0, TILE_ROWS, row_step, (jt, acc, zc))
    return acc, zc


def _mk_lagr_kernel(nblk_j: int):
    def kernel(xi_ref, xj_ref, prod_ref, cnt_ref, acc_ref, zc_ref):
        bj = pl.program_id(1)

        @pl.when(bj == 0)
        def _init():
            acc_ref[...] = _one_tile(TILE_ROWS, LANES)
            zc_ref[...] = jnp.zeros((TILE_ROWS, LANES), jnp.uint32)

        acc, zc = _cell(xi_ref[...], xj_ref[...], acc_ref[...], zc_ref[...])
        acc_ref[...] = acc
        zc_ref[...] = zc

        @pl.when(bj == nblk_j - 1)
        def _fin():
            prod_ref[...] = acc_ref[...]
            cnt_ref[...] = zc_ref[...]

    return kernel


@jax.jit
def _rowprod_call(xi_packed, xj_packed):
    R = xi_packed.shape[1]
    nblk = R // TILE_ROWS
    kernel = _mk_lagr_kernel(nblk)
    prod, cnt = pl.pallas_call(
        kernel,
        grid=(nblk, nblk),
        in_specs=[
            pl.BlockSpec(
                (L, TILE_ROWS, LANES), lambda bi, bj: (0, bi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (L + 1, TILE_ROWS, LANES), lambda bi, bj: (0, bj, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (L, TILE_ROWS, LANES), lambda bi, bj: (0, bi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda bi, bj: (bi, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, TILE_ROWS, LANES), jnp.uint32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.uint32),
        ],
        interpret=INTERPRET,
    )(xi_packed, xj_packed)
    return prod, cnt


def _rowprod_direct(xi_packed, xj_packed):
    """DIRECT mode: the same grid walk as plain jnp code (no pallas_call)."""
    R = xi_packed.shape[1]
    nblk = R // TILE_ROWS
    prods, cnts = [], []
    for bi in range(nblk):
        xi = xi_packed[:, bi * TILE_ROWS:(bi + 1) * TILE_ROWS]
        acc = _one_tile(TILE_ROWS, LANES)
        zc = jnp.zeros((TILE_ROWS, LANES), jnp.uint32)
        for bj in range(nblk):
            jt = xj_packed[:, bj * TILE_ROWS:(bj + 1) * TILE_ROWS]
            acc, zc = _cell(xi, jt, acc, zc)
        prods.append(acc)
        cnts.append(zc)
    return jnp.concatenate(prods, axis=1), jnp.concatenate(cnts, axis=0)


def lagrange_rowprod(xs_mont):
    """den-core of the Lagrange λ: Π_{j≠i}(x_j − x_i) for every i.

    xs_mont: uint32[N, 16] Montgomery-form Fr limbs (distinct x's expected).
    Returns (row_prod uint32[N, 16] Montgomery form, zcnt uint32[N]) where
    zcnt[i] counts x_j == x_i collisions INCLUDING the diagonal — all-ones
    iff the inputs are pairwise distinct.
    """
    n = xs_mont.shape[0]
    xi = pack_fr(xs_mont, n)
    R = xi.shape[1]
    live = jnp.zeros((R * LANES,), jnp.uint32).at[:n].set(1)
    xj = jnp.concatenate([xi, live.reshape(1, R, LANES)], axis=0)
    if DIRECT:
        prod, cnt = _rowprod_direct(xi, xj)
    else:
        prod, cnt = _rowprod_call(xi, xj)
    return unpack_fr(prod, n), cnt.reshape(-1)[:n]
