"""Batched scalar-field (Fr) protocol kernels.

These are the device-side, batch-first forms of the reference's sequential
Fr loops:

* `poly_eval`   — Horner evaluation of one polynomial at a batch of points
  (`/root/reference/src/poly.rs:358-369`: the per-share keygen hot loop).
* `lagrange_coeffs_at_zero` — the λ_i used by in-exponent interpolation
  (`/root/reference/src/lib.rs:740-763`: prefix/suffix products, one field
  inversion per share → here one *batched* Montgomery-trick inversion).
* `interpolate_at_zero` — Lagrange interpolation of scalar samples
  (`/root/reference/src/poly.rs:388-417`), used by DKG row reconstruction.

All values are uint32[..., 16] Montgomery-form Fr limbs unless noted;
helpers convert to the canonical (plain) limb form `scalar_bits` expects.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..device import mont
from ..device.mont import FR


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------

def fr_to_device(xs) -> jnp.ndarray:
    """Host ints -> uint32[N, 16] Montgomery-form limbs."""
    return jnp.asarray(mont.stack_mont(FR, list(xs)))


def fr_from_device(arr) -> list:
    """Montgomery-form limbs -> host ints."""
    return mont.unstack_mont(FR, np.asarray(arr))


def fr_to_plain(a):
    """Montgomery form -> canonical plain limbs (for `scalar_bits`):
    one Montgomery multiply by the literal 1."""
    one_plain = mont._const_limbs(FR, 1)
    return mont.mul(FR, a, one_plain)


def fr_from_plain(a):
    """Canonical plain limbs -> Montgomery form (multiply by R²)."""
    r2 = mont._const_limbs(FR, FR.r2)
    return mont.mul(FR, a, r2)


# ---------------------------------------------------------------------------
# Batched polynomial evaluation (keygen share derivation)
# ---------------------------------------------------------------------------

def poly_eval(coeffs, xs):
    """Horner: f(x) for every x in the batch.

    coeffs: uint32[D+1, 16] Montgomery Fr limbs, index k = coefficient of
    x^k (the reference's layout, `/root/reference/src/poly.rs:43`).
    xs:     uint32[..., 16] Montgomery Fr limbs (any batch shape).
    Returns uint32[..., 16].

    One `lax.scan` over the coefficient axis: D muls + D adds per lane,
    identical op count to the reference's sequential Horner but over the
    whole share batch at once.
    """
    shape = xs.shape[:-1]
    rev = coeffs[::-1]  # highest degree first
    init = jnp.broadcast_to(rev[0], shape + (FR.L,))

    def body(acc, c):
        acc = mont.mul(FR, acc, xs)
        acc = mont.add(FR, acc, jnp.broadcast_to(c, acc.shape))
        return acc, None

    out, _ = jax.lax.scan(body, init, rev[1:])
    return out


# ---------------------------------------------------------------------------
# Batched Lagrange machinery (threshold combine / interpolation)
# ---------------------------------------------------------------------------

def _prod_leading(a):
    """Product over the leading axis by pairwise halving (log-depth tree)."""
    n = a.shape[0]
    while n > 1:
        half = n // 2
        prod = mont.mul(FR, a[: 2 * half : 2], a[1 : 2 * half : 2])
        if n % 2:
            prod = jnp.concatenate([prod, a[-1:]], axis=0)
            n = half + 1
        else:
            n = half
        a = prod
    return a[0]


# Above this share count the N×N difference matrix is replaced by an O(N)-
# memory scan (same O(N²) field work as the reference's per-share loop).
_LAGRANGE_MATRIX_MAX = 1024


def lagrange_coeffs_at_zero(xs):
    """λ_i = Π_{j≠i} x_j / (x_j − x_i) for a batch of distinct x's.

    xs: uint32[N, 16] Montgomery Fr limbs. Returns (lam[N, 16], ok[]) where
    `ok` is False iff any x_i == x_j (duplicate) or any x_i == 0 — the
    conditions the reference reports as DuplicateEntry via a failed inverse
    (`/root/reference/src/lib.rs:754-763`).

    Two shapes of the same math, both ending in ONE Montgomery-trick
    `batch_inv` (vs the reference's N extended-Euclid inversions):

    * N ≤ 1024: the N×N difference matrix, fully data-parallel;
    * N > 1024 under Pallas: ONE fused systolic all-pairs kernel
      (`device/pallas_fr.lagrange_rowprod`) — the r4 λ computation ran
      its N² Fr products through the generic per-call multiply at
      ~38 M Fr-mul/s and dominated large combines (PERF.md);
    * N > 1024 otherwise: a chunked `lax.scan` over j accumulating
      den_i ·= (x_j − x_i) — O(N·chunk) memory, so t=4095+ combines
      never materialize N² limbs (the reference's own denominator loop
      shape, `/root/reference/src/lib.rs:754-763`).
    """
    n = xs.shape[0]
    if n <= _LAGRANGE_MATRIX_MAX:
        return _lagrange_matrix(xs)
    if _use_pallas_lagrange():
        return _lagrange_pallas(xs)
    return _lagrange_scan(xs)


def _use_pallas_lagrange() -> bool:
    env = os.environ.get("TC_TPU_LAGRANGE")
    if env is None:
        from ..device import pallas_fr

        return mont.use_pallas() or pallas_fr.DIRECT
    if env in ("0", "false", ""):
        return False
    if not mont._on_tpu():
        # forced on off-TPU (debugging): run the kernel in interpreter
        # mode rather than failing Mosaic lowering (ADVICE r4)
        from ..device import pallas_fr

        pallas_fr.INTERPRET = True
    return True


def _lagrange_pallas(xs):
    """Fused-kernel form: the O(N²) denominator sweep stays in VMEM.

    Same math and failure semantics as `_lagrange_matrix`; the duplicate
    flag comes from the kernel's zero-diff count (exactly one zero per
    lane — its own diagonal — iff all x's are distinct)."""
    from ..device import pallas_fr

    prod_all = _prod_leading(xs)
    row_prod, zcnt = pallas_fr.lagrange_rowprod(xs)
    dup = jnp.any(zcnt != 1)
    den = mont.mul(FR, xs, row_prod)
    zero_x = jnp.any(mont.is_zero(FR, xs))
    den_inv = mont.batch_inv(FR, den)
    lam = mont.mul(FR, jnp.broadcast_to(prod_all, den_inv.shape), den_inv)
    return lam, ~(dup | zero_x)


def _lagrange_matrix(xs):
    n = xs.shape[0]
    # numerator_i = Π_j x_j  (including x_i; divided out through den below)
    prod_all = _prod_leading(xs)

    # diffs[i, j] = x_j - x_i; diagonal forced to 1 so the row product is
    # Π_{j≠i}(x_j − x_i).
    diffs = mont.sub(FR, xs[None, :, :], xs[:, None, :])  # [i, j, L]
    eye = jnp.eye(n, dtype=bool)
    dup = jnp.any(mont.is_zero(FR, diffs) & ~eye)
    diffs = mont.select(eye, jnp.broadcast_to(mont.one(FR), diffs.shape), diffs)

    # row products: Π_j diffs[i, j]  -> [N, L]
    row_prod = _prod_leading(jnp.moveaxis(diffs, 1, 0))  # reduce over j

    # den_i = x_i * Π_{j≠i}(x_j − x_i); λ_i = prod_all / den_i
    den = mont.mul(FR, xs, row_prod)
    zero_x = jnp.any(mont.is_zero(FR, xs))
    den_inv = mont.batch_inv(FR, den)
    lam = mont.mul(FR, jnp.broadcast_to(prod_all, den_inv.shape), den_inv)
    return lam, ~(dup | zero_x)


_LAGRANGE_CHUNK = 256


def _lagrange_scan(xs):
    """O(N·chunk) memory form: the difference matrix is built CHUNK
    columns at a time (vs the r3 one-column-per-step scan, whose N
    sequential multiply dispatches cost ~0.4 s at N=4096 — each scan
    step is an in-program kernel launch)."""
    n = xs.shape[0]
    chunk = _LAGRANGE_CHUNK
    nchunks = -(-n // chunk)
    pad = nchunks * chunk - n
    prod_all = _prod_leading(xs)
    ones = jnp.broadcast_to(mont.one(FR), (n, FR.L))

    xs_p = jnp.pad(xs, ((0, pad), (0, 0)))
    live = jnp.pad(jnp.ones(n, bool), (0, pad))
    xj_chunks = xs_p.reshape(nchunks, chunk, FR.L)
    live_chunks = live.reshape(nchunks, chunk)

    def body(carry, inputs):
        den, dup = carry
        xj, lv = inputs  # [chunk, 16], [chunk]
        diff = mont.sub(FR, xj[:, None, :], xs[None, :, :])  # [chunk, N, 16]
        iszero = mont.is_zero(FR, diff) & lv[:, None]
        # each live x_j hits exactly its own row unless duplicates exist
        dup = dup | jnp.any(jnp.sum(iszero, axis=1) > 1)
        masked = mont.select(
            iszero | ~lv[:, None], jnp.broadcast_to(mont.one(FR), diff.shape),
            diff,
        )
        den = mont.mul(FR, den, _prod_leading(masked))
        return (den, dup), None

    (den, dup), _ = jax.lax.scan(
        body, (ones, jnp.bool_(False)), (xj_chunks, live_chunks)
    )
    den = mont.mul(FR, xs, den)
    zero_x = jnp.any(mont.is_zero(FR, xs))
    den_inv = mont.batch_inv(FR, den)
    lam = mont.mul(FR, jnp.broadcast_to(prod_all, den_inv.shape), den_inv)
    return lam, ~(dup | zero_x)


def interpolate_at_zero(xs, ys):
    """Lagrange interpolation of scalar samples at x=0: Σ λ_i·y_i.

    xs, ys: uint32[N, 16] Montgomery Fr limbs. Returns (value, ok).
    Mirrors `Poly::interpolate(...).evaluate(0)` without materializing the
    full polynomial (`/root/reference/src/poly.rs:341-350`).
    """
    lam, ok = lagrange_coeffs_at_zero(xs)
    terms = mont.mul(FR, lam, ys)
    n = terms.shape[0]
    acc = terms[0]
    # log-depth additive tree
    a = terms
    m = n
    while m > 1:
        half = m // 2
        s = mont.add(FR, a[: 2 * half : 2], a[1 : 2 * half : 2])
        if m % 2:
            s = jnp.concatenate([s, a[-1:]], axis=0)
            m = half + 1
        else:
            m = half
        a = s
    acc = a[0]
    return acc, ok
