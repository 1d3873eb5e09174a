"""Ground-truth tests for the from-scratch host BLS12-381 stack: field tower
axioms, curve group laws, subgroup/cofactor structure, pairing bilinearity.
These anchor the protocol layer the way `pairing 0.16`'s own test suite
anchors the reference (which simply trusts the crate,
`/root/reference/Cargo.toml:27`)."""

import random

import pytest

from threshold_crypto_tpu.host import curve as cv
from threshold_crypto_tpu.host import pairing as pr
from threshold_crypto_tpu.host import tower as tw
from threshold_crypto_tpu.host.params import H1, H2, P, R, X

rnd = random.Random(0xB15)


def _rand_fq():
    return rnd.randrange(P)


def _rand_fq2():
    return (_rand_fq(), _rand_fq())


def _rand_fq6():
    return (_rand_fq2(), _rand_fq2(), _rand_fq2())


def _rand_fq12():
    return (_rand_fq6(), _rand_fq6())


# ---------------------------------------------------------------------------
# Field towers
# ---------------------------------------------------------------------------

def test_fq2_field_axioms():
    for _ in range(20):
        a, b, c = _rand_fq2(), _rand_fq2(), _rand_fq2()
        assert tw.fq2_mul(a, tw.fq2_mul(b, c)) == tw.fq2_mul(tw.fq2_mul(a, b), c)
        assert tw.fq2_mul(a, tw.fq2_add(b, c)) == tw.fq2_add(
            tw.fq2_mul(a, b), tw.fq2_mul(a, c)
        )
        assert tw.fq2_sqr(a) == tw.fq2_mul(a, a)
        if not tw.fq2_is_zero(a):
            assert tw.fq2_mul(a, tw.fq2_inv(a)) == tw.FQ2_ONE
    # u² = −1
    u = (0, 1)
    assert tw.fq2_mul(u, u) == (P - 1, 0)


def test_fq6_field_axioms():
    for _ in range(10):
        a, b = _rand_fq6(), _rand_fq6()
        assert tw.fq6_sqr(a) == tw.fq6_mul(a, a)
        assert tw.fq6_mul(a, b) == tw.fq6_mul(b, a)
        if a != tw.FQ6_ZERO:
            assert tw.fq6_mul(a, tw.fq6_inv(a)) == tw.FQ6_ONE
    # v³ = ξ = 1 + u
    v = (tw.FQ2_ZERO, tw.FQ2_ONE, tw.FQ2_ZERO)
    v3 = tw.fq6_mul(tw.fq6_mul(v, v), v)
    assert v3 == ((1, 1), tw.FQ2_ZERO, tw.FQ2_ZERO)


def test_fq12_field_axioms():
    for _ in range(5):
        a, b = _rand_fq12(), _rand_fq12()
        assert tw.fq12_sqr(a) == tw.fq12_mul(a, a)
        assert tw.fq12_mul(a, b) == tw.fq12_mul(b, a)
        if a != tw.FQ12_ZERO:
            assert tw.fq12_mul(a, tw.fq12_inv(a)) == tw.FQ12_ONE
    # w² = v (the quadratic extension generator squares to the Fq6 generator)
    w = (tw.FQ6_ZERO, tw.FQ6_ONE)
    assert tw.fq12_mul(w, w) == ((tw.FQ2_ZERO, tw.FQ2_ONE, tw.FQ2_ZERO), tw.FQ6_ZERO)


def test_frobenius_consistency():
    # frob(a, 1) must equal a^p — the defining property.
    a2 = _rand_fq2()
    assert tw.fq2_frob(a2, 1) == tw.fq2_pow(a2, P)
    a12 = _rand_fq12()
    assert tw.fq12_frob(a12, 1) == tw.fq12_pow(a12, P)
    # frob iterated 12 times is the identity
    b = a12
    for _ in range(12):
        b = tw.fq12_frob(b, 1)
    assert b == a12
    # frob(a, k) == frob^k(a)
    b = tw.fq12_frob(tw.fq12_frob(a12, 1), 1)
    assert b == tw.fq12_frob(a12, 2)


def test_fq_sqrt():
    for _ in range(10):
        a = _rand_fq()
        s = tw.fq_sqrt(a * a % P)
        assert s is not None and (s == a or s == P - a)
    # non-residue: p ≡ 3 mod 4, so −1 is a non-residue
    assert tw.fq_sqrt(P - 1) is None


def test_fq2_sqrt():
    for _ in range(10):
        a = _rand_fq2()
        s = tw.fq2_sqrt(tw.fq2_sqr(a))
        assert s is not None
        assert s == a or s == tw.fq2_neg(a)


# ---------------------------------------------------------------------------
# Curve groups
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("G", [cv.G1, cv.G2], ids=["G1", "G2"])
def test_group_laws(G):
    g = G.generator
    assert G.is_on_curve(g)
    assert G.in_subgroup(g)
    # commutativity / associativity on small multiples
    p2, p3, p5 = G.mul(g, 2), G.mul(g, 3), G.mul(g, 5)
    assert G.add(p2, p3) == p5
    assert G.add(p3, p2) == p5
    assert G.add(g, G.add(p2, p2)) == p5
    assert G.double(p2) == G.mul(g, 4)
    # inverse and identity
    assert G.add(p2, G.neg(p2)) is None
    assert G.add(p5, None) == p5
    # order r
    assert G.mul(g, R) is None
    assert G.mul(g, R + 1) == g
    assert G.mul(g, -1) == G.neg(g)


def test_g1_cofactor_structure():
    # A random curve point times the cofactor lands in the r-order subgroup.
    while True:
        x = rnd.randrange(P)
        rhs = (x * x % P * x + 4) % P
        y = tw.fq_sqrt(rhs)
        if y is not None:
            break
    pt = (x, y)
    assert cv.G1.is_on_curve(pt)
    cleared = cv.G1.mul(pt, H1)
    assert cleared is None or cv.G1.in_subgroup(cleared)


def test_msm_matches_sum_of_muls():
    g = cv.G1.generator
    pts = [cv.G1.mul(g, k) for k in [3, 11, 29]]
    scalars = [5, 7, 13]
    expect = None
    for pt, k in zip(pts, scalars):
        expect = cv.G1.add(expect, cv.G1.mul(pt, k))
    assert cv.G1.msm(pts, scalars) == expect


@pytest.mark.parametrize("G,enc,dec", [
    (cv.G1, cv.g1_to_compressed, cv.g1_from_compressed),
    (cv.G2, cv.g2_to_compressed, cv.g2_from_compressed),
], ids=["G1", "G2"])
def test_compressed_roundtrip(G, enc, dec):
    for k in [1, 2, 12345, R - 1]:
        pt = G.mul(G.generator, k)
        assert dec(enc(pt)) == pt
    assert dec(enc(None)) is None


# ---------------------------------------------------------------------------
# Pairing
# ---------------------------------------------------------------------------

def test_pairing_bilinearity():
    g1, g2 = cv.G1.generator, cv.G2.generator
    e = pr.pairing
    lhs = e(cv.G1.mul(g1, 6), g2)
    assert lhs == e(g1, cv.G2.mul(g2, 6))
    assert lhs == e(cv.G1.mul(g1, 2), cv.G2.mul(g2, 3))
    assert lhs == e(cv.G1.mul(g1, 3), cv.G2.mul(g2, 2))
    assert lhs != e(g1, g2)


def test_pairing_nondegenerate_and_identity():
    g1, g2 = cv.G1.generator, cv.G2.generator
    assert pr.pairing(g1, g2) != tw.FQ12_ONE
    assert pr.pairing(None, g2) == tw.FQ12_ONE
    assert pr.pairing(g1, None) == tw.FQ12_ONE


def test_pairing_check():
    g1, g2 = cv.G1.generator, cv.G2.generator
    a = cv.G1.mul(g1, 7)
    b = cv.G2.mul(g2, 9)
    # e(7·G1, 9·G2) · e(−63·G1, G2) == 1
    assert pr.pairing_check([(a, b), (cv.G1.mul(g1, -63), g2)])
    assert not pr.pairing_check([(a, b), (cv.G1.mul(g1, -62), g2)])
    assert pr.pairing_check([])  # empty product is 1


def test_pairing_output_order():
    # GT elements have order r: e(P,Q)^r == 1.
    f = pr.pairing(cv.G1.generator, cv.G2.generator)
    assert tw.fq12_pow(f, R) == tw.FQ12_ONE
    assert tw.fq12_pow(f, X % R) != tw.FQ12_ONE
