"""Parity tests: the Pallas Montgomery kernel vs the XLA scan engine.

Runs the TPU kernel through the Pallas interpreter on CPU and asserts
bit-identical results with `mont._mont_mul_impl` (the engine every other
device test already validates against the host oracle).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy device path (see pytest.ini)

import threshold_crypto_tpu.device.mont as mont
import threshold_crypto_tpu.device.pallas_mont as pallas_mont
from threshold_crypto_tpu.device.mont import FQ, FR


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_mont, "INTERPRET", True)


def _rand_elems(spec, n, seed):
    rng = np.random.default_rng(seed)
    vals = [int.from_bytes(rng.bytes(64), "little") % spec.p for _ in range(n)]
    return vals, np.stack([mont.to_mont(spec, v) for v in vals])


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_pallas_mul_matches_scan_engine(spec):
    n = 160  # not a multiple of the 1024-lane block: exercises padding
    av, a = _rand_elems(spec, n, 1)
    bv, b = _rand_elems(spec, n, 2)
    got = np.asarray(pallas_mont.mul(spec, a, b))
    want = np.asarray(mont._mul_xla(spec, a, b))
    assert np.array_equal(got, want)
    # and against exact integer ground truth
    got_int = [mont.from_mont_int(spec, row) for row in got]
    assert got_int == [(x * y) % spec.p for x, y in zip(av, bv)]


def test_pallas_mul_broadcasts_and_keeps_shape():
    _, a = _rand_elems(FQ, 6, 3)
    _, b = _rand_elems(FQ, 1, 4)
    a3 = a.reshape(2, 3, FQ.L)
    got = np.asarray(pallas_mont.mul(FQ, a3, b.reshape(FQ.L)))
    want = np.asarray(mont._mul_xla(FQ, a3, b.reshape(FQ.L)))
    assert got.shape == (2, 3, FQ.L)
    assert np.array_equal(got, want)


def test_pallas_mul_edge_values():
    """0, 1, p-1 products hit the conditional-subtract edge cases."""
    edge = [0, 1, FQ.p - 1, FQ.p - 2, 2, (FQ.p - 1) // 2]
    pairs = [(x, y) for x in edge for y in edge]
    a = np.stack([mont.to_mont(FQ, x) for x, _ in pairs])
    b = np.stack([mont.to_mont(FQ, y) for _, y in pairs])
    got = np.asarray(pallas_mont.mul(FQ, a, b))
    got_int = [mont.from_mont_int(FQ, row) for row in got]
    assert got_int == [(x * y) % FQ.p for x, y in pairs]


@pytest.mark.parametrize("spec", [FR], ids=["Fr"])
def test_pallas_pow_fixed_bitscan(spec):
    """`pow_fixed` (the sole TPU-side inversion path for >32-bit
    exponents — `mont.inv` routes Fermat chains here) vs host bignum,
    incl. zero lanes and a non-block-aligned batch (ADVICE r4: it had no
    interpreter-mode test).  Scope kept affordable for the 2-core CI
    host: Fr only (the λ-denominator inversion path; the Fq mul body
    alone costs ~2 min of XLA:CPU compile) and a 37-bit exponent rather
    than the full p−2 (the interpreter walks the same
    square/conditional-multiply scan per bit — chain length is the only
    difference — and the full-width Fermat path is cross-checked against
    the XLA oracle on every TPU bench run)."""
    n = 70  # not a multiple of the 1024-lane block
    e = 0b1011000111010110010011101011001010011  # 37 bits, mixed run lengths
    vals, a = _rand_elems(spec, n, 8)
    vals[0], vals[-1] = 0, 1  # zero + identity lanes
    a[0] = mont.to_mont(spec, 0)
    a[-1] = mont.to_mont(spec, 1)
    got = np.asarray(pallas_mont.pow_fixed(spec, a, e))
    got_int = [mont.from_mont_int(spec, row) for row in got]
    assert got_int == [pow(v, e, spec.p) for v in vals]


def test_unrolled_carry_paths_match_scan(monkeypatch):
    """The unrolled (TPU) and scan (CPU) carry chains agree bit-for-bit.

    mont.add/sub pick a chain at trace time via use_pallas(); compare the
    two private primitives directly under a forced flag.
    """
    rng = np.random.default_rng(5)
    cols = rng.integers(0, 1 << 32, size=(33, FQ.L), dtype=np.uint64).astype(
        np.uint32
    )
    _, a = _rand_elems(FQ, 33, 6)
    _, b = _rand_elems(FQ, 33, 7)

    monkeypatch.setattr(mont, "use_pallas", lambda: False)
    limbs_s, over_s = mont._carry_chain(cols)
    diff_s, borrow_s = mont._sub_limbs(a, b)
    monkeypatch.setattr(mont, "use_pallas", lambda: True)
    limbs_u, over_u = mont._carry_chain(cols)
    diff_u, borrow_u = mont._sub_limbs(a, b)

    assert np.array_equal(np.asarray(limbs_s), np.asarray(limbs_u))
    assert np.array_equal(np.asarray(over_s), np.asarray(over_u))
    assert np.array_equal(np.asarray(diff_s), np.asarray(diff_u))
    assert np.array_equal(np.asarray(borrow_s), np.asarray(borrow_u))
