"""Device Fq2/Fq6/Fq12 tower vs the host oracle."""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy device path (see pytest.ini)

from threshold_crypto_tpu.device import tower as dtw
from threshold_crypto_tpu.host import tower as htw
from threshold_crypto_tpu.host.params import P

rnd = random.Random(0x70A3)


def _fq2():
    return (rnd.randrange(P), rnd.randrange(P))


def _fq6():
    return (_fq2(), _fq2(), _fq2())


def _fq12():
    return (_fq6(), _fq6())


B = 3  # small batch


def _b12():
    return [_fq12() for _ in range(B)]


def _stack2(vals):
    import numpy as np
    from threshold_crypto_tpu.device import mont

    c0 = np.stack([mont.to_mont(mont.FQ, v[0]) for v in vals])
    c1 = np.stack([mont.to_mont(mont.FQ, v[1]) for v in vals])
    return (c0, c1)


def _stack6(vals):
    return tuple(_stack2([v[i] for v in vals]) for i in range(3))


def _stack12(vals):
    return tuple(_stack6([v[i] for v in vals]) for i in range(2))


def _un2(a):
    from threshold_crypto_tpu.device import mont

    c0 = np.asarray(a[0])
    c1 = np.asarray(a[1])
    return [
        (
            mont.from_mont_int(mont.FQ, c0[i]),
            mont.from_mont_int(mont.FQ, c1[i]),
        )
        for i in range(c0.shape[0])
    ]


def _un6(a):
    parts = [_un2(c) for c in a]
    return [tuple(p[i] for p in parts) for i in range(len(parts[0]))]


def _un12(a):
    parts = [_un6(c) for c in a]
    return [tuple(p[i] for p in parts) for i in range(len(parts[0]))]


def test_fq2_ops():
    va = [_fq2() for _ in range(B)]
    vb = [_fq2() for _ in range(B)]
    a, b = _stack2(va), _stack2(vb)
    assert _un2(dtw.fq2_mul(a, b)) == [htw.fq2_mul(x, y) for x, y in zip(va, vb)]
    assert _un2(dtw.fq2_add(a, b)) == [htw.fq2_add(x, y) for x, y in zip(va, vb)]
    assert _un2(dtw.fq2_sub(a, b)) == [htw.fq2_sub(x, y) for x, y in zip(va, vb)]
    assert _un2(dtw.fq2_sqr(a)) == [htw.fq2_sqr(x) for x in va]
    assert _un2(dtw.fq2_inv(a)) == [htw.fq2_inv(x) for x in va]
    assert _un2(dtw.fq2_conj(a)) == [htw.fq2_conj(x) for x in va]
    assert _un2(dtw.mul_by_xi(a)) == [htw._mul_by_xi(x) for x in va]


def test_fq6_ops():
    va = [_fq6() for _ in range(B)]
    vb = [_fq6() for _ in range(B)]
    a, b = _stack6(va), _stack6(vb)
    assert _un6(dtw.fq6_mul(a, b)) == [htw.fq6_mul(x, y) for x, y in zip(va, vb)]
    assert _un6(dtw.fq6_mul_by_v(a)) == [htw.fq6_mul_by_v(x) for x in va]
    assert _un6(dtw.fq6_inv(a)) == [htw.fq6_inv(x) for x in va]
    # sparse 01 mul vs dense host mul
    vc0, vc1 = [_fq2() for _ in range(B)], [_fq2() for _ in range(B)]
    c0, c1 = _stack2(vc0), _stack2(vc1)
    want = [
        htw.fq6_mul(x, (y0, y1, htw.FQ2_ZERO))
        for x, y0, y1 in zip(va, vc0, vc1)
    ]
    assert _un6(dtw.fq6_mul_by_01(a, c0, c1)) == want
    want = [
        htw.fq6_mul(x, (htw.FQ2_ZERO, y1, htw.FQ2_ZERO))
        for x, y1 in zip(va, vc1)
    ]
    assert _un6(dtw.fq6_mul_by_1(a, c1)) == want


def test_fq12_ops():
    va, vb = _b12(), _b12()
    a, b = _stack12(va), _stack12(vb)
    assert _un12(dtw.fq12_mul(a, b)) == [
        htw.fq12_mul(x, y) for x, y in zip(va, vb)
    ]
    assert _un12(dtw.fq12_sqr(a)) == [htw.fq12_sqr(x) for x in va]
    assert _un12(dtw.fq12_conj(a)) == [htw.fq12_conj(x) for x in va]
    assert _un12(dtw.fq12_inv(a)) == [htw.fq12_inv(x) for x in va]


def test_fq12_mul_by_014():
    va = _b12()
    vc0, vc1, vc4 = (
        [_fq2() for _ in range(B)],
        [_fq2() for _ in range(B)],
        [_fq2() for _ in range(B)],
    )
    a = _stack12(va)
    c0, c1, c4 = _stack2(vc0), _stack2(vc1), _stack2(vc4)
    got = _un12(dtw.fq12_mul_by_014(a, c0, c1, c4))
    want = [
        htw.fq12_mul(
            x,
            ((y0, y1, htw.FQ2_ZERO), (htw.FQ2_ZERO, y4, htw.FQ2_ZERO)),
        )
        for x, y0, y1, y4 in zip(va, vc0, vc1, vc4)
    ]
    assert got == want


def test_frobenius():
    va = _b12()
    a = _stack12(va)
    for power in [1, 2, 3, 6]:
        assert _un12(dtw.fq12_frob(a, power)) == [
            htw.fq12_frob(x, power) for x in va
        ]


def test_fq12_is_one():
    vals = _b12()
    vals[1] = htw.FQ12_ONE
    a = _stack12(vals)
    got = list(np.asarray(dtw.fq12_is_one(a)))
    assert got == [False, True, False]


def test_select():
    va, vb = _b12(), _b12()
    a, b = _stack12(va), _stack12(vb)
    import jax.numpy as jnp

    cond = jnp.asarray([True, False, True])
    got = _un12(dtw.fq12_select(cond, a, b))
    assert got == [va[0], vb[1], va[2]]
