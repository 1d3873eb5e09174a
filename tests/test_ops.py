"""Batched device ops (`threshold_crypto_tpu.ops`) vs the host oracle."""

import random

import jax
import numpy as np
import pytest

from threshold_crypto_tpu import ops
from threshold_crypto_tpu.ops import threshold as tops
from threshold_crypto_tpu.device import curve as dcv
from threshold_crypto_tpu.device import pairing as dpr
from threshold_crypto_tpu.host import curve as hcv
from threshold_crypto_tpu.host.params import R
from threshold_crypto_tpu.ops import fr as frops

rnd = random.Random(0x0501)


def _poly(coeffs):
    return lambda x: sum(c * pow(x, k, R) for k, c in enumerate(coeffs)) % R


def _unbatch(tree):
    return jax.tree_util.tree_map(lambda a: a[None], tree)


# ---------------------------------------------------------------------------
# Fr kernels
# ---------------------------------------------------------------------------

def test_poly_eval_matches_host():
    coeffs = [rnd.randrange(R) for _ in range(6)]
    xs = [rnd.randrange(R) for _ in range(5)]
    f = _poly(coeffs)
    got = frops.fr_from_device(
        frops.poly_eval(frops.fr_to_device(coeffs), frops.fr_to_device(xs))
    )
    assert got == [f(x) for x in xs]


def test_poly_eval_degree_zero():
    got = frops.fr_from_device(
        frops.poly_eval(frops.fr_to_device([42]), frops.fr_to_device([1, 7]))
    )
    assert got == [42, 42]


def test_lagrange_interpolate_at_zero():
    coeffs = [rnd.randrange(R) for _ in range(4)]
    f = _poly(coeffs)
    xs = [1, 2, 5, 9]
    val, ok = frops.interpolate_at_zero(
        frops.fr_to_device(xs), frops.fr_to_device([f(x) for x in xs])
    )
    assert bool(ok)
    assert frops.fr_from_device(val[None])[0] == coeffs[0]


def test_lagrange_duplicate_and_zero_x_flagged():
    _, ok = frops.lagrange_coeffs_at_zero(frops.fr_to_device([1, 3, 3]))
    assert not bool(ok)
    _, ok = frops.lagrange_coeffs_at_zero(frops.fr_to_device([0, 1, 2]))
    assert not bool(ok)
    _, ok = frops.lagrange_coeffs_at_zero(frops.fr_to_device([1, 2, 3]))
    assert bool(ok)


def test_lagrange_scan_matches_matrix():
    """The O(N)-memory scan form (large-N path) must equal the N×N matrix
    form, including the duplicate/zero flags."""
    xs = [rnd.randrange(1, R) for _ in range(37)]
    dx = frops.fr_to_device(xs)
    lam_m, ok_m = frops._lagrange_matrix(dx)
    lam_s, ok_s = frops._lagrange_scan(dx)
    assert bool(ok_m) and bool(ok_s)
    assert frops.fr_from_device(lam_m) == frops.fr_from_device(lam_s)
    # duplicate and zero-x detection parity
    for bad in ([1, 5, 5, 9], [0, 2, 3, 4]):
        dbad = frops.fr_to_device(bad)
        assert not bool(frops._lagrange_scan(dbad)[1])
        assert not bool(frops._lagrange_matrix(dbad)[1])


def test_fr_plain_mont_roundtrip():
    xs = [0, 1, R - 1, rnd.randrange(R)]
    m = frops.fr_to_device(xs)
    plain = frops.fr_to_plain(m)
    back = frops.fr_from_plain(plain)
    assert frops.fr_from_device(back) == xs
    # plain limbs really are the canonical representation
    assert [dcv.mont.int_from_limbs(row) for row in np.asarray(plain)] == xs


# ---------------------------------------------------------------------------
# Group/pairing protocol ops
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sig_setup():
    """Shared tiny signing scenario: 3 shares of a degree-1 polynomial."""
    coeffs = [rnd.randrange(R) for _ in range(2)]
    f = _poly(coeffs)
    hk = rnd.randrange(1, R)
    h_host = hcv.G2.mul(hcv.G2.generator, hk)
    xs = [1, 2, 4]
    sks = [f(x) for x in xs]
    pk_host = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]
    sig_host = [hcv.G2.mul(h_host, s) for s in sks]
    return coeffs, f, h_host, xs, sks, pk_host, sig_host


@pytest.mark.slow
def test_sign_batch(sig_setup):
    _, _, h_host, _, sks, _, sig_host = sig_setup
    h_jac = dcv.G2.from_host_affine([h_host] * 3)
    sig = ops.sign_batch(h_jac, dcv.fr_limbs_from_ints(sks))
    assert dcv.G2.to_host_affine(sig) == sig_host


@pytest.mark.slow
def test_jacobian_affine_roundtrip(sig_setup):
    *_, pk_host, _ = sig_setup
    pts = pk_host + [None]
    jac = dcv.G1.from_host_affine(pts)
    aff = ops.jacobian_to_affine(dcv.G1, jac)
    x, y, inf = aff
    assert list(np.asarray(inf)) == [False, False, False, True]
    back = ops.affine_to_jacobian(dcv.G1, aff)
    assert dcv.G1.to_host_affine(back) == pts


def test_batch_inv_field_fq_fq2():
    """Product-tree field inversion: Fq with a zero lane, Fq2, and a
    non-power-of-two batch (tree padding edge)."""
    from threshold_crypto_tpu.device import mont

    vals = [7, 0, 12345, mont.FQ.p - 3, 999]  # n=5 -> padded to 8
    a = jax.numpy.asarray(mont.stack_mont(mont.FQ, vals))
    got = mont.unstack_mont(mont.FQ, np.asarray(tops.batch_inv_field(
        dcv.G1.f, a)))
    assert got == [pow(v, -1, mont.FQ.p) if v else 0 for v in vals]

    f2 = dcv.G2.f
    pairs = [(3, 8), (mont.FQ.p - 1, 5), (0, 11)]
    b = tuple(
        jax.numpy.asarray(mont.stack_mont(mont.FQ, [p[i] for p in pairs]))
        for i in range(2)
    )
    inv2 = tops.batch_inv_field(f2, b)
    prod = f2.mul(b, inv2)
    one = f2.one((len(pairs),))
    assert np.asarray(f2.eq(prod, one)).all()


@pytest.mark.slow
def test_verify_batch_stepwise(sig_setup):
    _, _, h_host, _, _, pk_host, sig_host = sig_setup
    bad = sig_host[:2] + [hcv.G2.mul(sig_host[2], 2)]
    pk = dpr.g1_affine_from_host(pk_host)
    h = dpr.g2_affine_from_host([h_host] * 3)
    sig = dpr.g2_affine_from_host(bad)
    ok = ops.verify_batch_stepwise(pk, h, sig)
    assert list(np.asarray(ok)) == [True, True, False]


@pytest.mark.slow
def test_verify_batch_fused_matches_stepwise(sig_setup):
    _, _, h_host, _, _, pk_host, sig_host = sig_setup
    bad = [sig_host[0]] + [hcv.G2.mul(sig_host[1], 3)] + [sig_host[2]]
    pk = dpr.g1_affine_from_host(pk_host)
    h = dpr.g2_affine_from_host([h_host] * 3)
    sig = dpr.g2_affine_from_host(bad)
    fused = ops.verify_batch(pk, h, sig)
    stepwise = ops.verify_batch_stepwise(pk, h, sig)
    assert list(np.asarray(fused)) == list(np.asarray(stepwise))
    assert list(np.asarray(fused)) == [True, False, True]


@pytest.mark.slow
def test_combine_batch_recovers_master_sig(sig_setup):
    coeffs, f, h_host, xs, _, _, sig_host = sig_setup
    sh = dcv.G2.from_host_affine(sig_host)
    out, ok = ops.combine_batch(dcv.G2, sh, frops.fr_to_device(xs))
    assert bool(ok)
    got = dcv.G2.to_host_affine(_unbatch(out))[0]
    assert got == hcv.G2.mul(h_host, f(0))


@pytest.mark.slow
def test_combine_batch_stepwise_matches(sig_setup):
    coeffs, f, h_host, xs, _, _, sig_host = sig_setup
    sh = dcv.G2.from_host_affine(sig_host)
    out, ok = ops.combine_batch_stepwise(dcv.G2, sh, frops.fr_to_device(xs))
    assert bool(ok)
    got = dcv.G2.to_host_affine(_unbatch(out))[0]
    assert got == hcv.G2.mul(h_host, f(0))


@pytest.mark.slow
def test_combine_batch_g1_decryption_shares():
    # decryption-share combine is the same interpolation in G1
    coeffs = [rnd.randrange(R) for _ in range(3)]
    f = _poly(coeffs)
    uk = rnd.randrange(1, R)
    u = hcv.G1.mul(hcv.G1.generator, uk)
    xs = [1, 2, 3]
    shares = [hcv.G1.mul(u, f(x)) for x in xs]
    out, ok = ops.combine_batch(
        dcv.G1, dcv.G1.from_host_affine(shares), frops.fr_to_device(xs)
    )
    assert bool(ok)
    got = dcv.G1.to_host_affine(_unbatch(out))[0]
    assert got == hcv.G1.mul(u, f(0))


@pytest.mark.slow
def test_combine_duplicate_x_flagged(sig_setup):
    *_, sig_host = sig_setup
    sh = dcv.G2.from_host_affine(sig_host)
    _, ok = ops.combine_batch(dcv.G2, sh, frops.fr_to_device([1, 2, 2]))
    assert not bool(ok)


@pytest.mark.slow
def test_commit_batch(sig_setup):
    coeffs, *_ = sig_setup
    comm = ops.commit_batch(dcv.fr_limbs_from_ints(coeffs))
    got = dcv.G1.to_host_affine(comm)
    assert got == [hcv.G1.mul(hcv.G1.generator, c) for c in coeffs]


@pytest.mark.slow
def test_derive_shares_matches_host_poly(sig_setup):
    coeffs, f, _, xs, sks, _, _ = sig_setup
    got = frops.fr_from_device(
        ops.derive_shares(frops.fr_to_device(coeffs), frops.fr_to_device(xs))
    )
    assert got == sks


@pytest.mark.slow
def test_verify_sig_shares_rlc(sig_setup):
    """Small-exponent batch verification: all-valid passes, one corrupt
    share fails the aggregate check."""
    # This compiles the largest XLA:CPU programs of the module (scan-fold
    # MSMs + the fused pairing check); drop the executables accumulated by
    # the earlier tests first or the process hits the known XLA:CPU JIT
    # code-memory exhaustion segfault (cf. conftest's per-module clearing).
    jax.clear_caches()
    _, _, h_host, _, sks, pk_host, sig_host = sig_setup
    n = len(sks)
    pk_aff = dpr.g1_affine_from_host(pk_host)
    sig_aff = dpr.g2_affine_from_host(sig_host)
    h_jac = dcv.G2.from_host_affine([h_host])
    h1 = jax.tree_util.tree_map(lambda a: a[0], h_jac)
    r = tops.rlc_exponents(n, b"test-seed")
    assert bool(tops.verify_sig_shares_rlc(pk_aff, h1, sig_aff, r))

    bad = list(sig_host)
    bad[1] = hcv.G2.mul(h_host, 424242)
    bad_aff = dpr.g2_affine_from_host(bad)
    assert not bool(tops.verify_sig_shares_rlc(pk_aff, h1, bad_aff, r))


def test_rlc_exponents_shape_and_determinism():
    a = tops.rlc_exponents(5, b"s")
    b = tops.rlc_exponents(5, b"s")
    c = tops.rlc_exponents(5, b"t")
    assert a.shape == (5, 16)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    # only the low 64 bits (4 limbs) populated, and never zero
    assert not np.asarray(a)[:, 4:].any()
    assert np.asarray(a)[:, :4].any(axis=1).all()


@pytest.mark.slow
def test_scalar_mul_stepwise_matches_scan():
    ks = [0, 1, rnd.randrange(R)]
    base = dcv.G1.from_host_affine([hcv.G1.generator] * 3)
    kl = dcv.fr_limbs_from_ints(ks)
    a = dcv.G1.to_host_affine(dcv.G1.scalar_mul(base, kl))
    b = dcv.G1.to_host_affine(dcv.G1.scalar_mul_stepwise(base, kl))
    assert a == b == [hcv.G1.mul(hcv.G1.generator, k) if k else None for k in ks]


# ---------------------------------------------------------------------------
# Batched device encrypt (Baek–Zhang, `/root/reference/src/lib.rs:128-137`)
# ---------------------------------------------------------------------------

def test_encrypt_batch_matches_host():
    """Device u/g/w (three batched scalar-muls) == host formulas with the
    same r; assembled ciphertexts pass both the host CCA gate and the
    batched device gate, and decrypt correctly."""
    import threshold_crypto_tpu as tc
    from threshold_crypto_tpu.backend import get_backend
    from threshold_crypto_tpu.hashing import hash_g1_g2
    from threshold_crypto_tpu.lib import xor_with_hash

    b = get_backend()
    n = 3
    sk = rnd.randrange(1, R)
    pk_el = b.G1.one().mul(sk)
    rs = [rnd.randrange(1, R) for _ in range(n)]
    msgs = [b"batched encrypt %d" % i for i in range(n)]

    r_plain = dcv.fr_limbs_from_ints(rs)
    pk_jac = dcv.G1.from_host_affine([pk_el.v] * n)
    u_jac, g_jac = tops.encrypt_begin_batch(pk_jac, r_plain)
    u_els = [b.G1(p) for p in dcv.G1.to_host_affine(u_jac)]
    g_els = [b.G1(p) for p in dcv.G1.to_host_affine(g_jac)]
    # host-formula parity for the device half 1
    for i, r in enumerate(rs):
        assert u_els[i] == b.G1.one().mul(r)
        assert g_els[i] == pk_el.mul(r)

    # host KDF between the halves
    vs = [xor_with_hash(g_els[i], msgs[i]) for i in range(n)]
    huvs = [hash_g1_g2(u_els[i], vs[i]) for i in range(n)]
    huv_jac = dcv.G2.from_host_affine([h.v for h in huvs])
    w_jac = tops.encrypt_finish_batch(huv_jac, r_plain)
    w_els = [b.G2(p) for p in dcv.G2.to_host_affine(w_jac)]
    for i, r in enumerate(rs):
        assert w_els[i] == huvs[i].mul(r)

    # assembled ciphertexts: host CCA gate + decrypt roundtrip
    for i in range(n):
        ct = tc.Ciphertext(u_els[i], vs[i], w_els[i])
        assert ct.verify()
        g_dec = u_els[i].mul(sk)
        assert xor_with_hash(g_dec, ct.v) == msgs[i]

    # batched device CCA gate accepts the whole batch
    u_aff = ops.jacobian_to_affine(dcv.G1, u_jac)
    w_aff = ops.jacobian_to_affine(dcv.G2, w_jac)
    huv_aff = ops.jacobian_to_affine(dcv.G2, huv_jac)
    ok = np.asarray(ops.ciphertext_verify_batch(u_aff, w_aff, huv_aff))
    assert ok.all()

    # one-call form agrees
    u2, g2, w2 = ops.encrypt_batch(pk_jac, r_plain, huv_jac)
    assert np.asarray(dcv.G1.eq(u2, u_jac)).all()
    assert np.asarray(dcv.G1.eq(g2, g_jac)).all()
    assert np.asarray(dcv.G2.eq(w2, w_jac)).all()


# ---------------------------------------------------------------------------
# Batched device DKG (`/root/reference/src/poly.rs:607-632,693-726`)
# ---------------------------------------------------------------------------

def test_device_dkg_scenario():
    """The ported DKG scenario with every dealer/verifier hot loop on the
    device: ONE batched fixed-base mul for the triangular commitment, rows
    for ALL nodes via batched row eval, and the per-value checks via
    batched in-exponent evaluation — asserted against the host-path
    BivarPoly/BivarCommitment at each step."""
    import threshold_crypto_tpu as tc
    from threshold_crypto_tpu.poly import BivarPoly, Poly
    from threshold_crypto_tpu.utils.rng import ChaChaRng

    b = tc.get_backend()
    rng = ChaChaRng(b"\x07" * 32)
    dealer_num, node_num, f = 2, 3, 1
    xs = list(range(1, node_num + 1))
    xs_mont = frops.fr_to_device(xs)
    sec_keys = [0] * node_num
    g1 = b.G1.one()

    for _ in range(dealer_num):
        bp = BivarPoly.random(f, rng)
        bc_host = bp.commitment()

        # dealer: commitment in ONE batched fixed-base mul
        commit_jac = ops.bivar_commit_batch(
            dcv.fr_limbs_from_ints(bp.coeff)
        )
        got = [b.G1(p) if p is not None else b.G1.zero()
               for p in dcv.G1.to_host_affine(commit_jac)]
        assert got == bc_host.coeff

        # dealer: rows for all nodes at once
        rows = ops.bivar_row_batch(
            frops.fr_to_device(bp.coeff), xs_mont, f
        )  # [M, f+1, 16]
        for m in xs:
            want = bp.row(m).coeff
            got_row = frops.fr_from_device(rows[m - 1])
            assert got_row == want

        # nodes: row commitments for all nodes at once
        rowc = ops.bivar_commit_row_batch(commit_jac, xs_mont, f)
        for m in xs:
            want = bc_host.row(m).coeff
            row_m = jax.tree_util.tree_map(lambda a: a[m - 1], rowc)
            got_row = [b.G1(p) if p is not None else b.G1.zero()
                       for p in dcv.G1.to_host_affine(row_m)]
            assert got_row == want

        # nodes: batched value verification commit.evaluate(m, s) == val·G1
        pairs = [(m, s) for m in xs for s in xs]
        ev = ops.bivar_commit_eval_batch(
            commit_jac,
            frops.fr_to_device([p[0] for p in pairs]),
            frops.fr_to_device([p[1] for p in pairs]),
            f,
        )
        vals = [bp.evaluate(m, s) for m, s in pairs]
        val_pts = ops.commit_batch(dcv.fr_limbs_from_ints(vals))
        assert np.asarray(dcv.G1.eq(ev, val_pts)).all()

        # protocol tail (host): reconstruct rows, accumulate secret keys
        for m in xs:
            honest = list(range(1, f + 2))
            received = {i: bp.evaluate(m, i) for i in honest}
            my_row = Poly.interpolate(received)
            assert my_row == bp.row(m)
            sec_keys[m - 1] = (sec_keys[m - 1] + my_row.evaluate(0)) % b.r


def test_rlc_exponents_device_matches_host():
    """The device ChaCha20 expansion (only the digest crosses the link)
    must be bit-exact with the host stream path."""
    for n in (5, 64, 333):
        a = tops.rlc_exponents(n, b"dev-vs-host", on_device=True)
        b = tops.rlc_exponents(n, b"dev-vs-host", on_device=False)
        assert np.array_equal(np.asarray(a), np.asarray(b)), n


def test_device_chacha_stream_matches_host_rng():
    """device.chacha word stream == utils.rng.ChaChaRng (rand_chacha 0.2)."""
    import jax.numpy as jnp
    from threshold_crypto_tpu.device import chacha as dch
    from threshold_crypto_tpu.utils.rng import ChaChaRng

    seed = bytes(range(32))
    key = jnp.asarray(np.frombuffer(seed, dtype="<u4"))
    got = list(np.asarray(dch.chacha20_words(key, 40)))
    rng = ChaChaRng(seed)
    want = [rng.next_u32() for _ in range(40)]
    assert got == want


def test_device_keccak_matches_hashlib():
    """Vectorized device SHA3-256 chunk digests == hashlib, and the
    transcript digest list is identical for device and host leaves."""
    import hashlib

    import jax.numpy as jnp
    from threshold_crypto_tpu.device import keccak as dk

    rng_np = np.random.default_rng(7)
    words = rng_np.integers(0, 1 << 32, (3, 544), dtype=np.uint64).astype(
        np.uint32
    )
    got = np.asarray(dk.sha3_256_chunks(jnp.asarray(words)))
    for i in range(3):
        want = hashlib.sha3_256(words[i].tobytes()).digest()
        assert got[i].tobytes() == want, i

    # device vs host leaves -> identical digest lists (incl. tails/bools)
    leaf_a = rng_np.integers(0, 1 << 16, (700, 24), dtype=np.uint64).astype(
        np.uint32
    )  # 67200 B = 30 full chunks + 1920 B tail
    leaf_b = np.zeros(700, bool)
    dev = dk.transcript_digests([jnp.asarray(leaf_a), jnp.asarray(leaf_b)])
    host = dk.transcript_digests([leaf_a, leaf_b])
    assert dev == host
    # header + 30 main chunks (level 1: K < 64) + tail + bool leaf
    assert len(dev) == 1 + 30 + 2

    # level-2 compression kicks in at >= 64 main chunks, still
    # residency-independent
    big = np.tile(leaf_a, (4, 1))  # 2800 rows -> 123 full chunks
    dev2 = dk.transcript_digests([jnp.asarray(big)])
    host2 = dk.transcript_digests([big])
    assert dev2 == host2
    # header + ceil(123/68)=2 level-2 digests + tail
    assert len(dev2) == 1 + 2 + 1


def test_rlc_exponents_transcript_binding_device_host():
    """Exponents bound to a transcript are identical whether the points
    are passed as device arrays or host numpy copies."""
    import jax.numpy as jnp

    rng_np = np.random.default_rng(11)
    x = rng_np.integers(0, 1 << 16, (64, 24), dtype=np.uint64).astype(
        np.uint32
    )
    inf = np.zeros(64, bool)
    a = tops.rlc_exponents(64, b"bind", pk_aff=(x, x, inf))
    b = tops.rlc_exponents(
        64, b"bind", pk_aff=(jnp.asarray(x), jnp.asarray(x), jnp.asarray(inf))
    )
    assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_pallas_keccak_kernel_matches_xla():
    """The VMEM-resident Pallas keccak kernel (interpret mode) produces
    the same chunk digests as the XLA scan form."""
    import os

    import jax.numpy as jnp
    from threshold_crypto_tpu.device import keccak as dk

    words = np.random.default_rng(9).integers(
        0, 1 << 32, (5, 544), dtype=np.uint64
    ).astype(np.uint32)
    os.environ["TC_TPU_KECCAK_INTERPRET"] = "1"
    try:
        got = np.asarray(dk._sha3_chunks_pallas(jnp.asarray(words)))
    finally:
        del os.environ["TC_TPU_KECCAK_INTERPRET"]
    want = np.asarray(dk.sha3_256_chunks(jnp.asarray(words)))
    assert np.array_equal(got, want)
