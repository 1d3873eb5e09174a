"""Ports of `/root/reference/src/poly.rs:755-901` tests: coeff_pos, poly
algebra, zeroize, and the flagship multi-node DKG simulation."""

import pytest

import threshold_crypto_tpu as tc
from threshold_crypto_tpu.poly import (
    BivarPoly,
    Commitment,
    Poly,
    coeff_pos,
)


def test_coeff_pos():
    i = j = 0
    for n in range(100):
        assert coeff_pos(i, j) == n
        if i >= j:
            j += 1
            i = 0
        else:
            i += 1
    too_large = 1 << 32
    assert coeff_pos(0, too_large) is None


def test_poly_algebra(backend):
    r = backend.r
    # The polynomial 5 X³ + X − 2.
    poly = Poly.monomial(3) * 5 + Poly.monomial(1) - 2
    assert poly.coeff == [(-2) % r, 1, 0, 5]
    samples = [(-1, -8), (2, 40), (3, 136), (5, 628)]
    for x, y in samples:
        assert poly.evaluate(x) == y % r
    interp = Poly.interpolate(samples)
    assert interp == poly


def test_poly_ring_ops(backend):
    r = backend.r
    a = Poly([1, 2, 3])
    b = Poly([5, 0, 0, 7])
    assert (a + b).coeff == [6, 2, 3, 7]
    assert (b - a).coeff == [4, (-2) % r, (-3) % r, 7]
    # (1 + x)(1 - x) == 1 - x²
    assert (Poly([1, 1]) * Poly([1, r - 1])).coeff == [1, 0, r - 1]
    # add/sub trim trailing zeros (`src/poly.rs:380-384`)
    assert (a - a).coeff == []
    assert (a - a).is_zero()
    # scalar ops
    assert (a * 2).coeff == [2, 4, 6]
    assert (a + 10).coeff == [11, 2, 3]
    assert (a - 1).coeff == [0, 2, 3]


def test_poly_zero_one_identity(backend):
    assert Poly.zero().is_zero()
    assert Poly.one().evaluate(12345) == 1
    assert Poly.identity().evaluate(7) == 7
    assert Poly.monomial(0).coeff == [1]
    assert Poly.constant(9).degree() == 0
    assert Poly.zero().degree() == 0
    assert Poly.zero().evaluate(3) == 0


def test_poly_interpolate_errors(backend):
    with pytest.raises(ValueError):
        Poly.interpolate([(1, 1), (1, 2)])
    assert Poly.interpolate([]) == Poly.zero()


def test_zeroize(backend, rng):
    poly = Poly.monomial(3) + Poly.monomial(2) - 1
    poly.zeroize()
    assert poly.is_zero()

    bi_poly = BivarPoly.random(3, rng)
    random_commitment = bi_poly.commitment()
    bi_poly.zeroize()
    zero_commitment = bi_poly.commitment()
    assert random_commitment != zero_commitment

    x = backend.fr_random(rng)
    y = backend.fr_random(rng)
    assert zero_commitment.evaluate(x, y) == backend.G1.zero()


def test_commitment_evaluate_matches_poly(backend, rng):
    poly = Poly.random(4, rng)
    comm = poly.commitment()
    g1 = backend.G1.one()
    for x in [0, 1, 7, backend.fr_random(rng)]:
        assert comm.evaluate(x) == g1.mul(poly.evaluate(x))
    assert comm.degree() == poly.degree()


def test_commitment_add(backend, rng):
    a, b = Poly.random(2, rng), Poly.random(3, rng)
    assert (a.commitment() + b.commitment()) == (a + b).commitment()


def test_bivar_row_symmetric(backend, rng):
    bp = BivarPoly.random(2, rng)
    # symmetry: f(x, y) == f(y, x)
    for x, y in [(1, 2), (3, 5), (0, 4)]:
        assert bp.evaluate(x, y) == bp.evaluate(y, x)
    # row(x).evaluate(y) == f(x, y)
    for x in range(4):
        row = bp.row(x)
        for y in range(4):
            assert row.evaluate(y) == bp.evaluate(x, y)


def test_bivar_degree_too_high(backend, rng):
    with pytest.raises(tc.DegreeTooHigh):
        BivarPoly.try_random((1 << 33), rng)


@pytest.mark.parametrize("backend_name", ["mock", "bls12_381"])
def test_distributed_key_generation(backend_name, rng):
    # `src/poly.rs:819-900`: 3 dealers, 5 nodes, 2 faulty — full in-process
    # DKG. BLS backend uses a smaller instance to keep the host path fast.
    with tc.using(backend_name) as b:
        if backend_name == "mock":
            dealer_num, node_num, faulty_num = 3, 5, 2
        else:
            dealer_num, node_num, faulty_num = 2, 3, 1

        bi_polys = [BivarPoly.random(faulty_num, rng) for _ in range(dealer_num)]
        pub_bi_commits = [bp.commitment() for bp in bi_polys]

        sec_keys = [0] * node_num
        g1 = b.G1.one()

        for bi_poly, bi_commit in zip(bi_polys, pub_bi_commits):
            for m in range(1, node_num + 1):
                row_poly = bi_poly.row(m)
                row_commit = bi_commit.row(m)
                assert row_poly.commitment() == row_commit
                for s in range(1, node_num + 1):
                    val = row_poly.evaluate(s)
                    assert bi_commit.evaluate(m, s) == g1.mul(val)
                    assert bi_poly.evaluate(m, s) == val

                # A cheating dealer who modified the polynomial is detected.
                wrong_poly = row_poly + Poly.monomial(2) * 5
                assert wrong_poly.commitment() != row_commit

                # Reconstruct the row from faulty_num+1 honest values.
                honest = list(range(1, faulty_num + 2))
                received = {i: bi_poly.evaluate(m, i) for i in honest}
                my_row = Poly.interpolate(received)
                assert my_row.evaluate(0) == bi_poly.evaluate(m, 0)
                assert my_row == row_poly

                sec_keys[m - 1] = (sec_keys[m - 1] + my_row.evaluate(0)) % b.r

        # Sum of row(0) polys is the secret key set polynomial.
        sec_key_set = Poly.zero()
        for bi_poly in bi_polys:
            sec_key_set += bi_poly.row(0)
        for m in range(1, node_num + 1):
            assert sec_key_set.evaluate(m) == sec_keys[m - 1]

        # Sum of committed first rows commits to the secret key set.
        sum_commit = Commitment([])
        for bi_commit in pub_bi_commits:
            sum_commit += bi_commit.row(0)
        assert sum_commit == sec_key_set.commitment()
