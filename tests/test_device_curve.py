"""Batched device curve ops vs the host curve oracle."""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy device path (see pytest.ini)

from threshold_crypto_tpu.device import curve as dcv
from threshold_crypto_tpu.host import curve as hcv
from threshold_crypto_tpu.host.params import R

rnd = random.Random(0xC07E)


@pytest.fixture(params=["G1", "G2"])
def groups(request):
    if request.param == "G1":
        return dcv.G1, hcv.G1
    return dcv.G2, hcv.G2


def _host_pts(hg, ks):
    return [hg.mul(hg.generator, k) if k else None for k in ks]


def test_roundtrip(groups):
    dg, hg = groups
    ks = [0, 1, 2, 12345, R - 1]
    pts = _host_pts(hg, ks)
    dev = dg.from_host_affine(pts)
    assert dg.to_host_affine(dev) == pts


def test_add_double(groups):
    dg, hg = groups
    ka = [1, 5, 0, 7, 9, 0]
    kb = [2, 0, 3, 7, R - 9, 0]
    pa = _host_pts(hg, ka)
    pb = _host_pts(hg, kb)
    da, db = dg.from_host_affine(pa), dg.from_host_affine(pb)
    got = dg.to_host_affine(dg.add(da, db))
    want = [hg.add(x, y) for x, y in zip(pa, pb)]
    assert got == want  # covers P+Q, P+0, 0+Q, P+P, P+(-P), 0+0
    got = dg.to_host_affine(dg.double(da))
    assert got == [hg.double(x) for x in pa]


def test_neg_eq(groups):
    dg, hg = groups
    pts = _host_pts(hg, [1, 4, 0])
    d = dg.from_host_affine(pts)
    got = dg.to_host_affine(dg.neg(d))
    assert got == [hg.neg(p) for p in pts]
    e = dg.eq(d, d)
    assert list(np.asarray(e)) == [True, True, True]
    d2 = dg.from_host_affine(_host_pts(hg, [1, 5, 0]))
    assert list(np.asarray(dg.eq(d, d2))) == [True, False, True]


def test_scalar_mul(groups):
    dg, hg = groups
    base_ks = [1, 3, 17]
    scalars = [0, 5, R - 1]
    pts = _host_pts(hg, base_ks)
    d = dg.from_host_affine(pts)
    klimbs = dcv.fr_limbs_from_ints(scalars)
    got = dg.to_host_affine(dg.scalar_mul(d, klimbs))
    want = [hg.mul(p, k) for p, k in zip(pts, scalars)]
    assert got == want


def test_scalar_mul_large_random(groups):
    dg, hg = groups
    ks = [rnd.randrange(R) for _ in range(2)]
    scalars = [rnd.randrange(R) for _ in range(2)]
    pts = _host_pts(hg, ks)
    d = dg.from_host_affine(pts)
    got = dg.to_host_affine(dg.scalar_mul(d, dcv.fr_limbs_from_ints(scalars)))
    assert got == [hg.mul(p, k) for p, k in zip(pts, scalars)]


def test_msm(groups):
    dg, hg = groups
    base_ks = [2, 3, 5, 7, 11]
    scalars = [9, 0, 31, R - 2, 4]
    pts = _host_pts(hg, base_ks)
    d = dg.from_host_affine(pts)
    got = dg.to_host_affine(
        jax_tree_expand(dg.msm(d, dcv.fr_limbs_from_ints(scalars)))
    )[0]
    want = hg.msm(pts, scalars)
    assert got == want


def jax_tree_expand(pt):
    import jax

    return jax.tree_util.tree_map(lambda a: a[None], pt)


def test_generator_matches_host(groups):
    dg, hg = groups
    g = dg.generator((1,))
    assert dg.to_host_affine(g) == [hg.generator]


def test_scalar_mul_unbatched(groups):
    """Unbatched (no leading batch dim) scalar_mul: the windowed table's
    gather path must handle [2^w, L] leaves (ADVICE r2: a former ndim-2
    special case in _table_select broke exactly this)."""
    import jax

    dg, hg = groups
    pt = _host_pts(hg, [7])[0]
    d = jax.tree_util.tree_map(
        lambda a: a[0], dg.from_host_affine([pt])
    )  # strip the batch dim entirely
    k = 0x1234567
    klimbs = dcv.fr_limbs_from_ints([k])[0]
    out = dg.scalar_mul(d, klimbs, nbits=32)
    got = dg.to_host_affine(jax.tree_util.tree_map(lambda a: a[None], out))
    assert got == [hg.mul(pt, k)]
