"""Batched multi-limb Montgomery arithmetic for TPU (the L0 inner loop).

The reference delegates all 381/255-bit field arithmetic to the `pairing`
crate's u64 limb code (`/root/reference/Cargo.toml:27`).  On TPU there is no
64-bit integer datapath, so field elements are represented as **16-bit limbs
stored in uint32 lanes**, shape ``[..., L]`` with a free leading batch shape:

* Fq (381 bits): L = 24 limbs;  Fr (255 bits): L = 16 limbs.
* A 16x16-bit limb product fits a uint32 exactly; carries are propagated in
  short unrolled chains, and intermediate "column" accumulators stay well
  under 2^32 (bounded by ~L*2^18).
* All values are kept in **Montgomery form** (R = 2^(16 L)); `mul` is a CIOS
  (coarsely integrated operand scanning) Montgomery multiplication whose
  inner loop is unrolled at trace time — L iterations of pure element-wise
  uint32 VPU ops, fully fusable by XLA and trivially shardable with pjit
  because every op is batch-pointwise.

Design notes (why not alternatives):
* No data-dependent control flow anywhere — everything is select-based, so
  the same program serves jit, vmap, scan bodies and shard_map regions.
* Exponentiation (`pow_fixed`, inversion via Fermat) runs as a `lax.scan`
  over a constant bit vector: 2 muls per step, graph size O(L) not O(bits·L).
* Host<->device conversion helpers (`limbs_from_int`/`int_from_limbs`,
  `to_mont`/`from_mont_int`) live here so every higher layer can round-trip
  against the host oracle in tests.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..host.params import P as _P
from ..host.params import R as _R

MASK16 = np.uint32(0xFFFF)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_pallas() -> bool:
    """True when the multiply inner loop should run as a Pallas kernel.

    Default: on for TPU backends (where the XLA scan engine is ~100× off
    VPU speed-of-light — see device/pallas_mont.py), off for CPU (tests).
    Env overrides: TC_TPU_PALLAS=0 forces the XLA path, =1 forces Pallas
    (interpreter mode unless on TPU hardware).
    """
    env = os.environ.get("TC_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return _on_tpu()


class FpSpec:
    """Static description of one prime field's limb layout (hashable)."""

    __slots__ = ("p", "L", "n0inv", "r_mont", "r2", "p_limbs", "one_mont", "name")

    def __init__(self, p: int, L: int, name: str):
        assert p.bit_length() <= 16 * L
        self.p = p
        self.L = L
        self.name = name
        self.r_mont = (1 << (16 * L)) % p
        self.r2 = (self.r_mont * self.r_mont) % p
        self.n0inv = (-pow(p, -1, 1 << 16)) % (1 << 16)
        self.p_limbs = tuple((p >> (16 * i)) & 0xFFFF for i in range(L))
        self.one_mont = self.r_mont

    def __repr__(self):
        return f"FpSpec({self.name}, L={self.L})"


FQ = FpSpec(_P, 24, "Fq")
FR = FpSpec(_R, 16, "Fr")


# ---------------------------------------------------------------------------
# Host-side conversions (numpy; used at API boundaries and in tests)
# ---------------------------------------------------------------------------

def limbs_from_int(spec: FpSpec, x: int) -> np.ndarray:
    x %= spec.p
    return np.array(
        [(x >> (16 * i)) & 0xFFFF for i in range(spec.L)], dtype=np.uint32
    )


def int_from_limbs(arr) -> int:
    arr = np.asarray(arr, dtype=np.uint64)
    return sum(int(v) << (16 * i) for i, v in enumerate(arr))


def to_mont(spec: FpSpec, x: int) -> np.ndarray:
    """Host int -> Montgomery-form limbs."""
    return limbs_from_int(spec, (x % spec.p) * spec.r_mont % spec.p)


def from_mont_int(spec: FpSpec, arr) -> int:
    """Montgomery-form limbs -> host int."""
    return int_from_limbs(arr) * pow(spec.r_mont, -1, spec.p) % spec.p


def stack_mont(spec: FpSpec, xs) -> np.ndarray:
    """[N] host ints -> uint32[N, L] Montgomery limbs."""
    return np.stack([to_mont(spec, x) for x in xs])


def unstack_mont(spec: FpSpec, arr) -> list:
    arr = np.asarray(arr)
    flat = arr.reshape(-1, spec.L)
    rinv = pow(spec.r_mont, -1, spec.p)
    return [int_from_limbs(row) * rinv % spec.p for row in flat]


def _const_limbs(spec: FpSpec, x: int) -> jnp.ndarray:
    """Raw (unreduced) limb constant — must NOT reduce mod p, because the
    modulus itself is encoded through this path."""
    assert 0 <= x < 1 << (16 * spec.L)
    return jnp.asarray(
        np.array([(x >> (16 * i)) & 0xFFFF for i in range(spec.L)], np.uint32)
    )


# ---------------------------------------------------------------------------
# Core limb kernels.  All arrays uint32[..., L]; leading dims free.
# ---------------------------------------------------------------------------

def zeros_like_el(a):
    return jnp.zeros_like(a)


def _carry_chain(cols):
    """Resolve u32 column accumulators into canonical 16-bit limbs.

    Returns (limbs[..., L], overflow[...]) where overflow is whatever carries
    out of the top limb (may be > 1 for relaxed inputs).  On CPU this is a
    scan over the limb axis (tiny fixed graph); on TPU it is unrolled so XLA
    fuses the whole chain into one elementwise pass instead of L serial
    micro-dispatches.
    """
    if use_pallas():
        L = cols.shape[-1]
        c = jnp.zeros_like(cols[..., 0])
        out = []
        for j in range(L):
            s = cols[..., j] + c
            out.append(s & MASK16)
            c = s >> 16
        return jnp.stack(out, axis=-1), c

    x = jnp.moveaxis(cols, -1, 0)  # [L, ...]

    def body(c, col):
        s = col + c
        return s >> 16, s & MASK16

    c, limbs = jax.lax.scan(body, jnp.zeros_like(x[0]), x)
    return jnp.moveaxis(limbs, 0, -1), c


def _sub_limbs(a, b):
    """a - b over 16-bit limbs. Returns (diff[..., L], borrow[...] in {0,1})."""
    big = jnp.uint32(1 << 16)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)

    if use_pallas():
        L = shape[-1]
        borrow = jnp.zeros_like(a[..., 0])
        out = []
        for j in range(L):
            d = a[..., j] + big - b[..., j] - borrow
            out.append(d & MASK16)
            borrow = jnp.uint32(1) - (d >> 16)
        return jnp.stack(out, axis=-1), borrow

    xa = jnp.moveaxis(a, -1, 0)
    xb = jnp.moveaxis(b, -1, 0)

    def body(borrow, ab):
        ak, bk = ab
        d = ak + big - bk - borrow
        return jnp.uint32(1) - (d >> 16), d & MASK16

    borrow, limbs = jax.lax.scan(body, jnp.zeros_like(xa[0]), (xa, xb))
    return jnp.moveaxis(limbs, 0, -1), borrow


def _geq(a, b):
    """a >= b on canonical limbs."""
    _, borrow = _sub_limbs(a, b)
    return borrow == 0


def select(cond, a, b):
    """Elementwise limb select; cond[...] broadcast over the limb axis."""
    return jnp.where(cond[..., None], a, b)


@functools.partial(jax.jit, static_argnums=0)
def add(spec: FpSpec, a, b):
    """(a + b) mod p, canonical-limb inputs/outputs."""
    p_arr = _const_limbs(spec, spec.p)
    s, over = _carry_chain(a + b)
    d, borrow = _sub_limbs(s, p_arr)
    take_d = (over != 0) | (borrow == 0)
    return select(take_d, d, s)


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: FpSpec, a, b):
    """(a - b) mod p."""
    p_arr = _const_limbs(spec, spec.p)
    d, borrow = _sub_limbs(a, b)
    d2, _ = _carry_chain(d + p_arr)
    return select(borrow != 0, d2, d)


@functools.partial(jax.jit, static_argnums=0)
def neg(spec: FpSpec, a):
    p_arr = jnp.broadcast_to(_const_limbs(spec, spec.p), a.shape)
    d, _ = _sub_limbs(p_arr, a)
    # -0 must stay 0
    return select(is_zero(spec, a), jnp.zeros_like(a), d)


def is_zero(spec: FpSpec, a):
    return jnp.all(a == 0, axis=-1)


def eq(spec: FpSpec, a, b):
    return jnp.all(a == b, axis=-1)


# 'scan' keeps traced graphs tiny (fast XLA compiles, same total work);
# 'unroll' exposes the whole CIOS loop to the fuser.  Switchable for benches.
MUL_IMPL = "scan"


def _cios_round(spec: FpSpec, t, ai, b, p_arr, zcol):
    """One CIOS iteration on relaxed columns t[..., L+1]."""
    n0inv = jnp.uint32(spec.n0inv)

    def _acc(t, prod):
        lo = prod & MASK16
        hi = prod >> 16
        t = t + jnp.concatenate([lo, zcol], -1)
        t = t + jnp.concatenate([zcol, hi], -1)
        return t

    t = _acc(t, ai[..., None] * b)
    m = ((t[..., 0] & MASK16) * n0inv) & MASK16
    t = _acc(t, m[..., None] * p_arr)
    # low column is now ≡ 0 mod 2^16; shift down one limb
    carry = (t[..., 0] >> 16)[..., None]
    return jnp.concatenate([t[..., 1:2] + carry, t[..., 2:], zcol], -1)


def _mont_mul_impl(spec: FpSpec, a, b):
    """CIOS Montgomery multiplication: returns a*b*R^-1 mod p.

    Inputs canonical 16-bit limbs (Montgomery form); output canonical.
    Every op is elementwise uint32 over the free batch dims.
    """
    L = spec.L
    p_arr = _const_limbs(spec, spec.p)  # [L]

    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (L,))
    b = jnp.broadcast_to(b, shape + (L,))

    t = jnp.zeros(shape + (L + 1,), jnp.uint32)
    zcol = jnp.zeros(shape + (1,), jnp.uint32)

    if MUL_IMPL == "unroll":
        for i in range(L):
            t = _cios_round(spec, t, a[..., i], b, p_arr, zcol)
    else:
        a_steps = jnp.moveaxis(a, -1, 0)  # [L, ...]

        def body(t, ai):
            return _cios_round(spec, t, ai, b, p_arr, zcol), None

        t, _ = jax.lax.scan(body, t, a_steps)

    limbs, over = _carry_chain(t[..., :L])
    over = over + t[..., L]  # residual column above the top limb (< 2^16)
    d, borrow = _sub_limbs(limbs, p_arr)
    take_d = (over != 0) | (borrow == 0)
    return select(take_d, d, limbs)


def mul(spec: FpSpec, a, b):
    """Montgomery product dispatch: Pallas kernel on TPU, XLA scan on CPU.

    Tiny batches stay on the XLA path even on TPU: a Fermat inversion of
    a [1]-lane value is ~760 sequential sub-ms Pallas dispatches whose
    fixed cost dominates (measured ~76 ms per single-point inversion in
    the r4 RLC aggregate — 3 of them per batch), while the fused XLA form
    runs the whole scan in-program.
    """
    if use_pallas():
        lanes = 1
        for d in jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]):
            lanes *= d
        if lanes >= 64:
            from . import pallas_mont

            return pallas_mont.mul(spec, a, b)
    return _mul_xla(spec, a, b)


@functools.partial(jax.jit, static_argnums=0)
def _mul_xla(spec: FpSpec, a, b):
    return _mont_mul_impl(spec, a, b)


def sqr(spec: FpSpec, a):
    return mul(spec, a, a)


def mul_small(spec: FpSpec, a, k: int):
    """a * k for tiny static k (via repeated addition tree)."""
    assert 0 <= k
    if k == 0:
        return jnp.zeros_like(a)
    result = None
    acc = a
    while k:
        if k & 1:
            result = acc if result is None else add(spec, result, acc)
        k >>= 1
        if k:
            acc = add(spec, acc, acc)
    return result


def one(spec: FpSpec, shape=()):
    """Montgomery-form 1 broadcast to the given batch shape."""
    base = _const_limbs(spec, spec.one_mont)
    return jnp.broadcast_to(base, tuple(shape) + (spec.L,))


def zero(spec: FpSpec, shape=()):
    return jnp.zeros(tuple(shape) + (spec.L,), jnp.uint32)


def _bits_msb(e: int):
    return [int(b) for b in bin(e)[2:]]


def pow_fixed(spec: FpSpec, a, e: int):
    """a^e for a fixed public exponent.

    Large exponents on the Pallas path run the whole square-and-multiply
    chain inside ONE kernel (`pallas_mont.pow_fixed`): the lax.scan form
    is one multiply *dispatch* per exponent bit — a 381-bit Fermat
    inversion measured 45 ms at [4096] lanes and 74 ms even for a single
    point, dispatch-bound at any width, vs ~5 ms in-kernel.  Small
    exponents (ladder steps, tiny constants) stay on the scan form.
    """
    if e == 0:
        return one(spec, a.shape[:-1])
    if use_pallas() and e.bit_length() > 32:
        from . import pallas_mont

        return pallas_mont.pow_fixed(spec, a, e)
    return _pow_fixed_xla(spec, a, e)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _pow_fixed_xla(spec: FpSpec, a, e: int):
    bits = jnp.asarray(_bits_msb(e), dtype=jnp.uint32)

    def body(acc, bit):
        acc = mul(spec, acc, acc)
        with_mul = mul(spec, acc, a)
        acc = select(bit != 0, with_mul, acc)
        return acc, None

    init = one(spec, a.shape[:-1])
    out, _ = jax.lax.scan(body, init, bits)
    return out


def inv(spec: FpSpec, a):
    """a^(p-2): Fermat inverse (maps 0 -> 0).  Fixed-iteration, branch-free —
    the device-side answer to `ff`'s variable-time ext-Euclid inverse."""
    return pow_fixed(spec, a, spec.p - 2)


def batch_inv(spec: FpSpec, a):
    """Product-tree batched inversion along the leading axis.

    [N, ..., L] -> [N, ..., L]; one Fermat inversion total instead of N.
    Zero entries map to zero (masked to 1 during the tree walk).

    On the Pallas path this is simply `inv` — the in-kernel Fermat chain
    (`pallas_mont.pow_fixed`) runs the whole batch in one dispatch, which
    measures FASTER than any host-orchestrated tree (each tree level is
    its own in-program dispatch at ~50-100 µs fixed cost).

    XLA/CPU path: a pairwise product tree UP (N batched muls over log₂N
    levels), one Fermat inversion at the root, then DOWN the tree —
    inv(left) = inv(parent)·right, inv(right) = inv(parent)·left (2N
    batched muls).  Both the r3 Python-unrolled form (O(N) graph) and the
    scan form that replaced it (2N *serial* single-lane multiplies —
    ~0.5 s at N=4096, the dominant λ cost once the denominator sweep moved
    into the fused Pallas kernel) are gone: graph size and sequential
    depth are both O(log N) with every multiply batch-wide.
    """
    if use_pallas():
        return inv(spec, a)
    zmask = is_zero(spec, a)
    a_safe = select(zmask, one(spec, a.shape[:-1]), a)
    n = a.shape[0]
    m = 1 << (n - 1).bit_length() if n > 1 else 1
    if m != n:
        pad = jnp.broadcast_to(one(spec, a.shape[1:-1]),
                               (m - n,) + a.shape[1:])
        a_safe = jnp.concatenate([a_safe, pad], axis=0)

    levels = [a_safe]
    while levels[-1].shape[0] > 1:
        cur = levels[-1]
        levels.append(mul(spec, cur[0::2], cur[1::2]))

    inv_cur = inv(spec, levels[-1])  # [1, ..., L]
    for lev in levels[-2::-1]:
        left, right = lev[0::2], lev[1::2]
        inv_left = mul(spec, inv_cur, right)
        inv_right = mul(spec, inv_cur, left)
        inv_cur = jnp.stack([inv_left, inv_right], axis=1).reshape(
            (lev.shape[0],) + lev.shape[1:]
        )
    return select(zmask, jnp.zeros_like(a), inv_cur[:n])
