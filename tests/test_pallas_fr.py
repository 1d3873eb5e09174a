"""Fused Lagrange-denominator kernel (device/pallas_fr) vs independent paths.

DIRECT mode runs the exact kernel cell function as plain jnp code over the
packed layout (the repo's standard off-TPU megakernel validation — the
Pallas interpreter is far too slow for a 1024-step systolic sweep), so
everything but the pallas_call plumbing itself is exercised on CPU: the Fr
engine, the rotation schedule, live-lane masking, multi-block grid walk,
and the duplicate-count semantics.  On-chip the same cell runs inside
pallas_call (bench-time oracle: benches/combine_large.py asserts the
combine result against the scalarwise MSM path every run).
"""

import numpy as np
import pytest

from threshold_crypto_tpu.device import mont, pallas_fr
from threshold_crypto_tpu.device.mont import FR
from threshold_crypto_tpu.ops import fr as frops

N = 1100  # 2×2 grid blocks: exercises padding + live lanes + block walk


@pytest.fixture
def direct():
    pallas_fr.DIRECT = True
    try:
        yield
    finally:
        pallas_fr.DIRECT = False


def test_lagrange_pallas_vs_scan(direct):
    rng = np.random.default_rng(42)
    xs_int = list({int.from_bytes(rng.bytes(31), "little") % FR.p
                   for _ in range(N)})[:N]
    assert len(xs_int) == N
    xs = frops.fr_to_device(xs_int)

    lam_p, ok_p = frops._lagrange_pallas(xs)
    lam_s, ok_s = frops._lagrange_scan(xs)
    assert bool(ok_p) and bool(ok_s)
    assert (np.asarray(lam_p) == np.asarray(lam_s)).all()

    # host-bignum parity of one λ: λ_0 = Π x_j / (x_0 · Π_{j≠0}(x_j − x_0))
    num = 1
    for v in xs_int:
        num = num * v % FR.p
    den = xs_int[0]
    for v in xs_int[1:]:
        den = den * ((v - xs_int[0]) % FR.p) % FR.p
    got = mont.unstack_mont(FR, np.asarray(lam_p[:1]))[0]
    assert got == num * pow(den, -1, FR.p) % FR.p


def test_lagrange_pallas_duplicate_and_zero(direct):
    rng = np.random.default_rng(7)
    xs_int = [int.from_bytes(rng.bytes(31), "little") % FR.p
              for _ in range(N)]
    dup = list(xs_int)
    dup[997] = dup[3]  # collision across lanes
    _, ok = frops._lagrange_pallas(frops.fr_to_device(dup))
    assert not bool(ok)

    zero = list(xs_int)
    zero[512] = 0
    _, ok = frops._lagrange_pallas(frops.fr_to_device(zero))
    assert not bool(ok)

    # the dup-count plumbing itself: diagonal-only zeros on distinct input
    _, zcnt = pallas_fr.lagrange_rowprod(frops.fr_to_device(xs_int))
    assert (np.asarray(zcnt) == 1).all()


def test_batch_inv_tree_edges():
    # power-of-two padding edges the product tree must handle
    for n in (1, 2, 5):
        vals = [3 * i + 7 for i in range(n)]
        a = mont.stack_mont(FR, vals)
        got = mont.unstack_mont(FR, mont.batch_inv(FR, a))
        assert got == [pow(v, -1, FR.p) for v in vals]
