"""Device limb engine vs the host Python-int oracle."""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy device path (see pytest.ini)

from threshold_crypto_tpu.device import mont
from threshold_crypto_tpu.host.params import P, R

rnd = random.Random(0xDE7)


@pytest.fixture(params=[mont.FQ, mont.FR], ids=["Fq", "Fr"])
def spec(request):
    return request.param


def _rand_batch(spec, n):
    vals = [rnd.randrange(spec.p) for _ in range(n)]
    return vals, mont.stack_mont(spec, vals)


def test_roundtrip(spec):
    for x in [0, 1, spec.p - 1, rnd.randrange(spec.p)]:
        assert mont.from_mont_int(spec, mont.to_mont(spec, x)) == x
    vals, arr = _rand_batch(spec, 5)
    assert mont.unstack_mont(spec, arr) == vals


def _assert_canonical(spec, arr):
    """Raw limb value must be fully reduced (< p), not just correct mod p."""
    flat = np.asarray(arr).reshape(-1, spec.L)
    for row in flat:
        assert mont.int_from_limbs(row) < spec.p


def test_add_sub_neg(spec):
    vals_a, a = _rand_batch(spec, 8)
    vals_b, b = _rand_batch(spec, 8)
    out = mont.add(spec, a, b)
    _assert_canonical(spec, out)
    got = mont.unstack_mont(spec, out)
    assert got == [(x + y) % spec.p for x, y in zip(vals_a, vals_b)]
    got = mont.unstack_mont(spec, mont.sub(spec, a, b))
    assert got == [(x - y) % spec.p for x, y in zip(vals_a, vals_b)]
    got = mont.unstack_mont(spec, mont.neg(spec, a))
    assert got == [(-x) % spec.p for x in vals_a]
    # edge cases: 0 and p-1
    edge_vals = [0, spec.p - 1, 1, spec.p - 1]
    e = mont.stack_mont(spec, edge_vals)
    got = mont.unstack_mont(spec, mont.add(spec, e, e))
    assert got == [(x + x) % spec.p for x in edge_vals]
    assert mont.unstack_mont(spec, mont.neg(spec, mont.stack_mont(spec, [0])))[0] == 0


def test_mul(spec):
    vals_a, a = _rand_batch(spec, 16)
    vals_b, b = _rand_batch(spec, 16)
    got = mont.unstack_mont(spec, mont.mul(spec, a, b))
    assert got == [x * y % spec.p for x, y in zip(vals_a, vals_b)]
    # identity and zero
    one = mont.one(spec, (16,))
    assert mont.unstack_mont(spec, mont.mul(spec, a, one)) == vals_a
    z = mont.zero(spec, (16,))
    assert mont.unstack_mont(spec, mont.mul(spec, a, z)) == [0] * 16
    # worst-case operands
    w = mont.stack_mont(spec, [spec.p - 1, spec.p - 1])
    assert mont.unstack_mont(spec, mont.mul(spec, w, w)) == [
        (spec.p - 1) ** 2 % spec.p
    ] * 2


def test_mul_broadcast(spec):
    vals_a, a = _rand_batch(spec, 4)
    k = rnd.randrange(spec.p)
    kk = mont.to_mont(spec, k)
    got = mont.unstack_mont(spec, mont.mul(spec, a, kk))
    assert got == [x * k % spec.p for x in vals_a]


def test_mul_small(spec):
    vals, a = _rand_batch(spec, 4)
    for k in [0, 1, 2, 3, 8, 12]:
        got = mont.unstack_mont(spec, mont.mul_small(spec, a, k))
        assert got == [v * k % spec.p for v in vals]


def test_pow_and_inv(spec):
    vals, a = _rand_batch(spec, 4)
    got = mont.unstack_mont(spec, mont.pow_fixed(spec, a, 5))
    assert got == [pow(v, 5, spec.p) for v in vals]
    got = mont.unstack_mont(spec, mont.inv(spec, a))
    assert got == [pow(v, -1, spec.p) for v in vals]
    # inv(0) == 0 by Fermat
    z = mont.zero(spec, (1,))
    assert mont.unstack_mont(spec, mont.inv(spec, z)) == [0]


def test_batch_inv(spec):
    vals, a = _rand_batch(spec, 6)
    vals[3] = 0
    a = mont.stack_mont(spec, vals)
    got = mont.unstack_mont(spec, mont.batch_inv(spec, a))
    assert got == [pow(v, -1, spec.p) if v else 0 for v in vals]


def test_predicates(spec):
    a = mont.stack_mont(spec, [0, 5, 0])
    assert list(np.asarray(mont.is_zero(spec, a))) == [True, False, True]
    b = mont.stack_mont(spec, [0, 5, 7])
    assert list(np.asarray(mont.eq(spec, a, b))) == [True, True, False]


def test_specs():
    assert mont.FQ.p == P and mont.FQ.L == 24
    assert mont.FR.p == R and mont.FR.L == 16
    # n0inv: -p^-1 mod 2^16
    assert (mont.FQ.n0inv * P + 1) % (1 << 16) == 0
    assert (mont.FR.n0inv * R + 1) % (1 << 16) == 0
