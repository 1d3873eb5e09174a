"""Batched extension-field tower Fq2/Fq6/Fq12 on device limbs.

Same tower as the host oracle (`threshold_crypto_tpu.host.tower`):
Fq2 = Fq[u]/(u²+1), Fq6 = Fq2[v]/(v³-ξ), ξ = 1+u, Fq12 = Fq6[w]/(w²-v).

Elements are pytrees of uint32[..., 24] Montgomery limb arrays:
Fq2 = (c0, c1), Fq6 = (fq2, fq2, fq2), Fq12 = (fq6, fq6) — so jit / vmap /
scan / shard_map all treat them natively.  Mirrors the Karatsuba shapes of
the host oracle so both compute identical values (verified in tests).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..host import tower as htw
from . import mont
from .mont import FQ

# ---------------------------------------------------------------------------
# Fq2
# ---------------------------------------------------------------------------

def fq2(c0, c1):
    return (c0, c1)


def fq2_zero(shape=()):
    return (mont.zero(FQ, shape), mont.zero(FQ, shape))


def fq2_one(shape=()):
    return (mont.one(FQ, shape), mont.zero(FQ, shape))


def fq2_add(a, b):
    return (mont.add(FQ, a[0], b[0]), mont.add(FQ, a[1], b[1]))


def fq2_sub(a, b):
    return (mont.sub(FQ, a[0], b[0]), mont.sub(FQ, a[1], b[1]))


def fq2_neg(a):
    return (mont.neg(FQ, a[0]), mont.neg(FQ, a[1]))


def fq2_conj(a):
    return (a[0], mont.neg(FQ, a[1]))


def fq2_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = mont.mul(FQ, a0, b0)
    t1 = mont.mul(FQ, a1, b1)
    t2 = mont.mul(FQ, mont.add(FQ, a0, a1), mont.add(FQ, b0, b1))
    return (
        mont.sub(FQ, t0, t1),
        mont.sub(FQ, mont.sub(FQ, t2, t0), t1),
    )


def fq2_sqr(a):
    a0, a1 = a
    s = mont.mul(FQ, mont.add(FQ, a0, a1), mont.sub(FQ, a0, a1))
    m = mont.mul(FQ, a0, a1)
    return (s, mont.add(FQ, m, m))


def fq2_scale_fq(a, k):
    """Multiply both components by an Fq element (limb array)."""
    return (mont.mul(FQ, a[0], k), mont.mul(FQ, a[1], k))


def fq2_mul_small(a, k: int):
    return (mont.mul_small(FQ, a[0], k), mont.mul_small(FQ, a[1], k))


def fq2_inv(a):
    a0, a1 = a
    norm = mont.add(FQ, mont.mul(FQ, a0, a0), mont.mul(FQ, a1, a1))
    ninv = mont.inv(FQ, norm)
    return (mont.mul(FQ, a0, ninv), mont.neg(FQ, mont.mul(FQ, a1, ninv)))


def fq2_is_zero(a):
    return mont.is_zero(FQ, a[0]) & mont.is_zero(FQ, a[1])


def fq2_eq(a, b):
    return mont.eq(FQ, a[0], b[0]) & mont.eq(FQ, a[1], b[1])


def fq2_select(cond, a, b):
    return (mont.select(cond, a[0], b[0]), mont.select(cond, a[1], b[1]))


def mul_by_xi(a):
    """Multiply by ξ = 1 + u: (c0 - c1, c0 + c1)."""
    return (mont.sub(FQ, a[0], a[1]), mont.add(FQ, a[0], a[1]))


# ---------------------------------------------------------------------------
# Fq6
# ---------------------------------------------------------------------------

def fq6_zero(shape=()):
    return (fq2_zero(shape), fq2_zero(shape), fq2_zero(shape))


def fq6_one(shape=()):
    return (fq2_one(shape), fq2_zero(shape), fq2_zero(shape))


def fq6_add(a, b):
    return tuple(fq2_add(x, y) for x, y in zip(a, b))


def fq6_sub(a, b):
    return tuple(fq2_sub(x, y) for x, y in zip(a, b))


def fq6_neg(a):
    return tuple(fq2_neg(x) for x in a)


def fq6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fq2_mul(a0, b0)
    t1 = fq2_mul(a1, b1)
    t2 = fq2_mul(a2, b2)
    c0 = fq2_add(
        t0,
        mul_by_xi(
            fq2_sub(fq2_mul(fq2_add(a1, a2), fq2_add(b1, b2)), fq2_add(t1, t2))
        ),
    )
    c1 = fq2_add(
        fq2_sub(fq2_mul(fq2_add(a0, a1), fq2_add(b0, b1)), fq2_add(t0, t1)),
        mul_by_xi(t2),
    )
    c2 = fq2_add(
        fq2_sub(fq2_mul(fq2_add(a0, a2), fq2_add(b0, b2)), fq2_add(t0, t2)), t1
    )
    return (c0, c1, c2)


def fq6_sqr(a):
    return fq6_mul(a, a)


def fq6_mul_by_v(a):
    return (mul_by_xi(a[2]), a[0], a[1])


def fq6_mul_by_01(a, b0, b1):
    """a * (b0 + b1·v) — sparse product used by Miller-loop line updates."""
    a0, a1, a2 = a
    t0 = fq2_mul(a0, b0)
    t1 = fq2_mul(a1, b1)
    c0 = fq2_add(t0, mul_by_xi(fq2_mul(a2, b1)))
    c1 = fq2_sub(
        fq2_mul(fq2_add(a0, a1), fq2_add(b0, b1)),
        fq2_add(t0, t1),
    )
    c2 = fq2_add(fq2_mul(a2, b0), t1)
    return (c0, c1, c2)


def fq6_mul_by_1(a, b1):
    """a * (b1·v)."""
    a0, a1, a2 = a
    return (mul_by_xi(fq2_mul(a2, b1)), fq2_mul(a0, b1), fq2_mul(a1, b1))


def fq6_inv(a):
    a0, a1, a2 = a
    c0 = fq2_sub(fq2_sqr(a0), mul_by_xi(fq2_mul(a1, a2)))
    c1 = fq2_sub(mul_by_xi(fq2_sqr(a2)), fq2_mul(a0, a1))
    c2 = fq2_sub(fq2_sqr(a1), fq2_mul(a0, a2))
    t = fq2_add(
        mul_by_xi(fq2_add(fq2_mul(a2, c1), fq2_mul(a1, c2))), fq2_mul(a0, c0)
    )
    tinv = fq2_inv(t)
    return (fq2_mul(c0, tinv), fq2_mul(c1, tinv), fq2_mul(c2, tinv))


def fq6_select(cond, a, b):
    return tuple(fq2_select(cond, x, y) for x, y in zip(a, b))


def _shape(limb_arr):
    return limb_arr.shape[:-1]


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
    a0, a1 = a
    b0, b1 = b
    t0 = fq6_mul(a0, b0)
    t1 = fq6_mul(a1, b1)
    c0 = fq6_add(t0, fq6_mul_by_v(t1))
    c1 = fq6_sub(fq6_mul(fq6_add(a0, a1), fq6_add(b0, b1)), fq6_add(t0, t1))
    return (c0, c1)


def fq12_sqr(a):
    """Complex squaring: c0 = (a0+a1)(a0+v·a1) − t − v·t, c1 = 2t, t = a0·a1."""
    a0, a1 = a
    t = fq6_mul(a0, a1)
    s = fq6_mul(fq6_add(a0, a1), fq6_add(a0, fq6_mul_by_v(a1)))
    c0 = fq6_sub(fq6_sub(s, t), fq6_mul_by_v(t))
    c1 = fq6_add(t, t)
    return (c0, c1)


def fq12_conj(a):
    return (a[0], fq6_neg(a[1]))


def fq12_inv(a):
    a0, a1 = a
    t = fq6_inv(fq6_sub(fq6_sqr(a0), fq6_mul_by_v(fq6_sqr(a1))))
    return (fq6_mul(a0, t), fq6_neg(fq6_mul(a1, t)))


def fq12_select(cond, a, b):
    return (fq6_select(cond, a[0], b[0]), fq6_select(cond, a[1], b[1]))


def fq12_is_one(a):
    shape = _shape(a[0][0][0])
    o = fq12_one(shape)
    ok = mont.eq(FQ, a[0][0][0], o[0][0][0])
    for got, want in [
        (a[0][0][1], o[0][0][1]),
        (a[0][1][0], o[0][1][0]), (a[0][1][1], o[0][1][1]),
        (a[0][2][0], o[0][2][0]), (a[0][2][1], o[0][2][1]),
        (a[1][0][0], o[1][0][0]), (a[1][0][1], o[1][0][1]),
        (a[1][1][0], o[1][1][0]), (a[1][1][1], o[1][1][1]),
        (a[1][2][0], o[1][2][0]), (a[1][2][1], o[1][2][1]),
    ]:
        ok = ok & mont.eq(FQ, got, want)
    return ok


def fq12_mul_by_014(f, c0, c1, c4):
    """f · (c0 + c1·v + c4·v·w) — the sparse line product of the Miller loop
    (line value after the w³ normalization; see device.pairing)."""
    f0, f1 = f
    t0 = fq6_mul_by_01(f0, c0, c1)
    t1 = fq6_mul_by_1(f1, c4)
    o = fq2_add(c1, c4)
    c1out = fq6_sub(
        fq6_mul_by_01(fq6_add(f0, f1), c0, o), fq6_add(t0, t1)
    )
    c0out = fq6_add(t0, fq6_mul_by_v(t1))
    return (c0out, c1out)


# ---------------------------------------------------------------------------
# Frobenius — coefficients derived by the host oracle, embedded as constants.
# ---------------------------------------------------------------------------

def _emb_fq2_const(c):
    return (
        jnp.asarray(mont.to_mont(FQ, c[0])),
        jnp.asarray(mont.to_mont(FQ, c[1])),
    )


FROB12_C1 = [_emb_fq2_const(c) for c in htw.FROB12_C1]
FROB6_C1 = [_emb_fq2_const(c) for c in htw.FROB6_C1]
FROB6_C2 = [_emb_fq2_const(c) for c in htw.FROB6_C2]


def fq2_frob(a, power: int):
    return a if power % 2 == 0 else fq2_conj(a)


def fq6_frob(a, power: int):
    c0 = fq2_frob(a[0], power)
    c1 = fq2_mul(fq2_frob(a[1], power), FROB6_C1[power % 12])
    c2 = fq2_mul(fq2_frob(a[2], power), FROB6_C2[power % 12])
    return (c0, c1, c2)


def fq12_frob(a, power: int):
    c0 = fq6_frob(a[0], power)
    c1 = fq6_frob(a[1], power)
    c1 = tuple(fq2_mul(x, FROB12_C1[power % 12]) for x in c1)
    return (c0, c1)


# ---------------------------------------------------------------------------
# Host <-> device conversions (tests / API boundary)
# ---------------------------------------------------------------------------

def fq2_from_host(c, shape=()):
    import numpy as np

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
