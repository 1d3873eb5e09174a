"""Device batched pairing vs the host oracle: identical GT elements."""

import random

import numpy as np

from threshold_crypto_tpu.device import pairing as dpr
from threshold_crypto_tpu.device import tower as dtw
from threshold_crypto_tpu.host import curve as hcv
from threshold_crypto_tpu.host import pairing as hpr
from threshold_crypto_tpu.host.params import R

import pytest

pytestmark = pytest.mark.slow  # compile-heavy device path (see pytest.ini)


rnd = random.Random(0xA173)


def _g1(k):
    return hcv.G1.mul(hcv.G1.generator, k) if k else None


def _g2(k):
    return hcv.G2.mul(hcv.G2.generator, k) if k else None


def test_miller_loop_matches_host_after_final_exp():
    ks1 = [1, 2, 7]
    ks2 = [1, 3, 5]
    p = dpr.g1_affine_from_host([_g1(k) for k in ks1])
    q = dpr.g2_affine_from_host([_g2(k) for k in ks2])
    f = dpr.final_exponentiation(dpr.miller_loop(p, q))
    got = dtw.fq12_to_host_batch(f)
    want = [hpr.pairing(_g1(a), _g2(b)) for a, b in zip(ks1, ks2)]
    assert got == want


def test_pairing_bilinearity_device():
    p = dpr.g1_affine_from_host([_g1(6), _g1(2), _g1(3)])
    q = dpr.g2_affine_from_host([_g2(1), _g2(3), _g2(2)])
    f = dpr.pairing(p, q)
    vals = dtw.fq12_to_host_batch(f)
    assert vals[0] == vals[1] == vals[2]


def test_pairing_infinity_lanes():
    p = dpr.g1_affine_from_host([None, _g1(5), None])
    q = dpr.g2_affine_from_host([_g2(3), None, None])
    f = dpr.pairing(p, q)
    got = dtw.fq12_to_host_batch(f)
    one = hpr.pairing(None, None)
    assert got == [one, one, one]


def test_pairing_random_scalars():
    a = rnd.randrange(1, R)
    b = rnd.randrange(1, R)
    p = dpr.g1_affine_from_host([_g1(a)])
    q = dpr.g2_affine_from_host([_g2(b)])
    got = dtw.fq12_to_host_batch(dpr.pairing(p, q))[0]
    assert got == hpr.pairing(_g1(a), _g2(b))


def test_pairing_check_batched():
    # verification shape: e(pk, H) · e(-G1, sig) == 1
    sks = [5, 11, 13]
    hs = [2, 9, 4]
    pks = [_g1(sk) for sk in sks]
    hpts = [_g2(h) for h in hs]
    sigs = [hcv.G2.mul(h, sk) for h, sk in zip(hpts, sks)]
    sigs[2] = hcv.G2.mul(hpts[2], 999)  # corrupt one lane
    neg_g1 = hcv.G1.neg(hcv.G1.generator)

    p = dpr.g1_affine_from_host(pks + [neg_g1] * 3)
    q = dpr.g2_affine_from_host(hpts + sigs)
    p2 = jax_reshape(p, (2, 3))
    q2 = jax_reshape(q, (2, 3))
    ok = dpr.pairing_check(p2, q2)
    assert list(np.asarray(ok)) == [True, True, False]


def jax_reshape(aff, shape):
    import jax

    def r(arr):
        if arr.dtype == np.bool_:
            return arr.reshape(shape)
        return arr.reshape(shape + (arr.shape[-1],))

    return jax.tree_util.tree_map(r, aff)


def test_cyclotomic_sqr_matches_generic_on_gt():
    # pairing outputs live in the cyclotomic subgroup, where the
    # Granger–Scott squaring must agree with the generic fq12_sqr
    p = dpr.g1_affine_from_host([_g1(3), _g1(8)])
    q = dpr.g2_affine_from_host([_g2(5), _g2(2)])
    f = dpr.pairing(p, q)
    got = dtw.fq12_to_host_batch(dtw.fq12_cyclo_sqr(f))
    want = dtw.fq12_to_host_batch(dtw.fq12_sqr(f))
    assert got == want


def test_fused_miller_matches_driver():
    p = dpr.g1_affine_from_host([_g1(4), _g1(9)])
    q = dpr.g2_affine_from_host([_g2(7), None])
    a = dpr.miller_loop(p, q)
    b = dpr.miller_loop_fused(p, q)
    assert dtw.fq12_to_host_batch(a) == dtw.fq12_to_host_batch(b)
