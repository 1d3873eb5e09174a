"""Ports of the reference's protocol round-trip tests
(`/root/reference/src/lib.rs:785-1082`), run under both backends."""

import pytest

import threshold_crypto_tpu as tc
from threshold_crypto_tpu.lib import interpolate
from threshold_crypto_tpu.poly import Poly
from threshold_crypto_tpu.utils.rng import ChaChaRng


def test_interpolate(backend, rng):
    # `src/lib.rs:793-808`: in-exponent interpolation at x=0 of commitment
    # samples equals the commitment evaluated at 0, for degrees 0..4 with
    # random x spacing.
    for deg in range(5):
        comm = Poly.random(deg, rng).commitment()
        values = []
        x = 0
        for _ in range(deg + 1):
            x += 1 + rng.next_u32() % 4
            values.append((x - 1, comm.evaluate(x)))
        actual = interpolate(deg, values)
        assert comm.evaluate(0) == actual


def test_simple_sig(backend, rng):
    sk0 = tc.SecretKey.random(rng)
    sk1 = tc.SecretKey.random(rng)
    pk0 = sk0.public_key()
    msg0, msg1 = b"Real news", b"Fake news"
    assert pk0.verify(sk0.sign(msg0), msg0)
    assert not pk0.verify(sk1.sign(msg0), msg0)  # wrong key
    assert not pk0.verify(sk0.sign(msg1), msg0)  # wrong message


def test_threshold_sig(backend, rng):
    sk_set = tc.SecretKeySet.random(3, rng)
    pk_set = sk_set.public_keys()
    pk_master = pk_set.public_key()

    # First coefficient is the master key; shares differ from it.
    for i in range(3):
        assert pk_master != pk_set.public_key_share(i).pk

    sk_master = sk_set.secret_key()
    for i in range(3):
        assert sk_master != sk_set.secret_key_share(i).sk

    msg = b"Totally real news"
    sigs = {i: sk_set.secret_key_share(i).sign(msg) for i in [5, 8, 7, 10]}
    for i, sig in sigs.items():
        assert pk_set.public_key_share(i).verify(sig, msg)

    sig = pk_set.combine_signatures(sigs)
    assert pk_set.public_key().verify(sig, msg)

    # A different set of signatories produces the same signature.
    sigs2 = {i: sk_set.secret_key_share(i).sign(msg) for i in [42, 43, 44, 45]}
    sig2 = pk_set.combine_signatures(sigs2)
    assert sig == sig2


def test_simple_enc(backend, rng):
    sk_bob = tc.SecretKey.random(rng)
    sk_eve = tc.SecretKey.random(rng)
    pk_bob = sk_bob.public_key()
    msg = b"Muffins in the canteen today! Don't tell Eve!"
    ciphertext = pk_bob.encrypt(msg, rng)
    assert ciphertext.verify()

    assert sk_bob.decrypt(ciphertext) == msg
    assert sk_eve.decrypt(ciphertext) != msg

    fake = tc.Ciphertext(ciphertext.u, bytes(len(ciphertext.v)), ciphertext.w)
    assert not fake.verify()
    assert sk_bob.decrypt(fake) is None


def test_random_extreme_thresholds(backend, rng):
    sks = tc.SecretKeySet.random(0, rng)
    assert sks.threshold() == 0
    with pytest.raises(tc.DegreeTooHigh):
        tc.SecretKeySet.try_random((1 << 64) - 1, rng)


def test_threshold_enc(backend, rng):
    sk_set = tc.SecretKeySet.random(3, rng)
    pk_set = sk_set.public_keys()
    msg = b"Totally real news"
    ciphertext = pk_set.public_key().encrypt(msg, rng)

    shares = {}
    for i in [5, 8, 7, 10]:
        share = sk_set.secret_key_share(i).decrypt_share(ciphertext)
        assert share is not None
        shares[i] = share

    for i, share in shares.items():
        assert pk_set.public_key_share(i).verify_decryption_share(share, ciphertext)

    assert pk_set.decrypt(shares, ciphertext) == msg


def test_threshold_enc_too_few_shares(backend, rng):
    sk_set = tc.SecretKeySet.random(3, rng)
    pk_set = sk_set.public_keys()
    ct = pk_set.public_key().encrypt(b"m", rng)
    shares = {i: sk_set.secret_key_share(i).decrypt_share(ct) for i in range(3)}
    with pytest.raises(tc.NotEnoughShares):
        pk_set.decrypt(shares, ct)


def test_duplicate_share_detected(backend, rng):
    b = backend
    with pytest.raises(tc.DuplicateEntry):
        interpolate(1, [(0, b.G2.one()), (0, b.G2.one())])


def test_hash_g2(backend, rng):
    msg = rng.fill_bytes(1000)
    msg_end0 = msg + b"end0"
    msg_end1 = msg + b"end1"
    assert tc.hash_g2(msg) == tc.hash_g2(msg)
    assert tc.hash_g2(msg) != tc.hash_g2(msg_end0)
    assert tc.hash_g2(msg_end0) != tc.hash_g2(msg_end1)


def test_hash_g1_g2(backend, rng):
    msg = rng.fill_bytes(1000)
    msg_end0 = msg + b"end0"
    msg_end1 = msg + b"end1"
    g0 = backend.G1.random(rng)
    g1 = backend.G1.random(rng)
    assert tc.hash_g1_g2(g0, msg) == tc.hash_g1_g2(g0, msg)
    assert tc.hash_g1_g2(g0, msg) != tc.hash_g1_g2(g0, msg_end0)
    assert tc.hash_g1_g2(g0, msg_end0) != tc.hash_g1_g2(g0, msg_end1)
    assert tc.hash_g1_g2(g0, msg) != tc.hash_g1_g2(g1, msg)


def test_xor_with_hash(backend, rng):
    g0 = backend.G1.random(rng)
    g1 = backend.G1.random(rng)
    xwh = tc.xor_with_hash
    assert xwh(g0, bytes(5)) == xwh(g0, bytes(5))
    assert xwh(g0, bytes(5)) != xwh(g1, bytes(5))
    assert len(xwh(g0, bytes(5))) == 5
    assert len(xwh(g0, bytes(6))) == 6
    assert len(xwh(g0, bytes(20))) == 20
    # XOR is an involution: applying twice restores the data.
    data = rng.fill_bytes(33)
    assert xwh(g0, xwh(g0, data)) == data


def test_from_to_bytes(backend, rng):
    sk = tc.SecretKey.random(rng)
    sig = sk.sign(b"Please sign here: ______")
    pk = sk.public_key()
    assert tc.PublicKey.from_bytes(pk.to_bytes()) == pk
    assert tc.Signature.from_bytes(sig.to_bytes()) == sig


def test_size(backend):
    assert backend.G1.one().to_compressed().__len__() == backend.PK_SIZE
    assert backend.G2.one().to_compressed().__len__() == backend.SIG_SIZE


def test_zeroize(backend, rng):
    zero_sk = tc.SecretKey.from_mut([0])
    sk = tc.SecretKey.random(rng)
    assert zero_sk != sk
    sk.zeroize()
    assert zero_sk == sk
    # from_mut zeroes its source (`src/lib.rs:349-353`)
    holder = [12345]
    sk2 = tc.SecretKey.from_mut(holder)
    assert holder[0] == 0
    assert sk2.fr == 12345 % backend.r


def test_zeroize_erases_backing_buffer(backend, rng):
    """zeroize must physically overwrite the authoritative byte storage
    (the reference's volatile clear, `src/secret.rs:9-13`)."""
    sk = tc.SecretKey.random(rng)
    assert any(sk._buf), "random key should have nonzero bytes"
    buf = sk._buf  # hold the same object to observe in-place erasure
    sk.zeroize()
    assert bytes(buf) == b"\x00" * len(buf)
    assert sk.fr == 0


def test_rng_seed(backend):
    seed = bytes(range(32))
    sk1 = tc.SecretKey.random(ChaChaRng(seed))
    sk2 = tc.SecretKey.random(ChaChaRng(seed))
    assert sk1 == sk2
    sk3 = tc.SecretKey.random(ChaChaRng(bytes(32)))
    assert sk1 != sk3


def test_signature_parity(backend, rng):
    # parity() is a deterministic bit of the uncompressed encoding
    # (`src/lib.rs:237-243`); both values occur over random signatures.
    sigs = [tc.Signature.random(rng) for _ in range(16)]
    parities = {s.parity() for s in sigs}
    for s in sigs:
        assert s.parity() == tc.Signature.from_bytes(s.to_bytes()).parity()
    assert parities <= {True, False}


def test_decrypt_share_no_verify(backend, rng):
    sk_set = tc.SecretKeySet.random(1, rng)
    pk_set = sk_set.public_keys()
    ct = pk_set.public_key().encrypt(b"m", rng)
    a = sk_set.secret_key_share(0).decrypt_share(ct)
    b_ = sk_set.secret_key_share(0).decrypt_share_no_verify(ct)
    assert a == b_


def test_verify_signature_shares_batch(backend, rng):
    """RLC batch verification: one aggregate check accepts N valid shares
    and rejects any tampering (`PublicKeySet.verify_signature_shares`)."""
    sk_set = tc.SecretKeySet.random(2, rng)
    pk_set = sk_set.public_keys()
    msg = b"batch me"
    shares = {
        i: sk_set.secret_key_share(i).sign(msg) for i in range(5)
    }
    assert pk_set.verify_signature_shares(shares, msg, rng)
    with pytest.raises(ValueError):  # empty input must not pass vacuously
        pk_set.verify_signature_shares({}, msg, rng)
    # corrupt one share -> aggregate check must fail
    bad = dict(shares)
    bad[3] = sk_set.secret_key_share(4).sign(msg)  # wrong signer for index
    assert not pk_set.verify_signature_shares(bad, msg, rng)
    # wrong message -> fail
    assert not pk_set.verify_signature_shares(shares, b"other", rng)
