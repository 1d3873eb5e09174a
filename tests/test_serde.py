"""Serialization layer tests: fixed sizes, byte-format vectors, roundtrips,
SerdeSecret policy, SCALE codec — mirroring
`/root/reference/src/serde_impl.rs:369-417` and `src/lib.rs:984-1047`."""

import pytest

import threshold_crypto_tpu as tc
from threshold_crypto_tpu import codec_impl
from threshold_crypto_tpu.poly import BivarPoly, Commitment, Poly
from threshold_crypto_tpu.serde_impl import SerdeSecret, deserialize, serialize

# Standard zcash-format BLS12-381 generator encodings (ground truth for the
# compressed codec; identical to what `pairing 0.16` emits).
G1_GEN_COMPRESSED = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb"
)
G2_GEN_COMPRESSED = bytes.fromhex(
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
    "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
    "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
)


def test_generator_vectors(bls_backend):
    assert bls_backend.G1.one().to_compressed() == G1_GEN_COMPRESSED
    assert bls_backend.G2.one().to_compressed() == G2_GEN_COMPRESSED
    assert bls_backend.G1.from_compressed(G1_GEN_COMPRESSED) == bls_backend.G1.one()
    assert bls_backend.G2.from_compressed(G2_GEN_COMPRESSED) == bls_backend.G2.one()


def test_identity_encoding(bls_backend):
    # Infinity flag bit set, all else zero.
    z1 = bls_backend.G1.zero().to_compressed()
    assert z1[0] == 0xC0 and all(b == 0 for b in z1[1:])
    z2 = bls_backend.G2.zero().to_compressed()
    assert z2[0] == 0xC0 and all(b == 0 for b in z2[1:])
    assert bls_backend.G1.from_compressed(z1).is_zero()
    assert bls_backend.G2.from_compressed(z2).is_zero()


def test_invalid_points_rejected(bls_backend):
    with pytest.raises(tc.FromBytesError):
        bls_backend.G1.from_compressed(bytes(48))  # no compression flag
    with pytest.raises(tc.FromBytesError):
        bls_backend.G1.from_compressed(bytes([0x80]) + bytes(47))  # uncompressed flag
    bad_inf = bytearray(bytes([0xC0]) + bytes(47))
    bad_inf[5] = 1  # infinity with nonzero payload
    with pytest.raises(tc.FromBytesError):
        bls_backend.G1.from_compressed(bytes(bad_inf))
    with pytest.raises(tc.FromBytesError):
        bls_backend.G1.from_compressed(G1_GEN_COMPRESSED[:-1])  # short
    # x >= p must be rejected
    too_big = bytearray(48)
    too_big[0] = 0x9F
    for i in range(1, 48):
        too_big[i] = 0xFF
    with pytest.raises(tc.FromBytesError):
        bls_backend.G1.from_compressed(bytes(too_big))


def test_serde_sizes(backend, rng):
    sk = tc.SecretKey.random(rng)
    sig = sk.sign(b"Please sign here: ______")
    pk = sk.public_key()
    ser_pk = serialize(pk)
    assert len(ser_pk) == backend.PK_SIZE
    assert deserialize(tc.PublicKey, ser_pk) == pk
    ser_sig = serialize(sig)
    assert len(ser_sig) == backend.SIG_SIZE
    assert deserialize(tc.Signature, ser_sig) == sig
    ser_sk = serialize(SerdeSecret(sk))
    assert len(ser_sk) == backend.FR_BYTES
    assert deserialize(tc.SecretKey, ser_sk) == sk


def test_serde_all_types_roundtrip(backend, rng):
    sk_set = tc.SecretKeySet.random(3, rng)
    pk_set = sk_set.public_keys()
    sk = tc.SecretKey.random(rng)
    pk = sk.public_key()
    sig = sk.sign(b"m")
    ct = pk.encrypt(b"payload", rng)
    dec_share = tc.DecryptionShare.random(rng)

    cases = [
        (tc.PublicKey, pk),
        (tc.PublicKeyShare, pk_set.public_key_share(2)),
        (tc.Signature, sig),
        (tc.SignatureShare, sk_set.secret_key_share(1).sign(b"m")),
        (tc.DecryptionShare, dec_share),
        (tc.Ciphertext, ct),
        (tc.PublicKeySet, pk_set),
    ]
    for cls, obj in cases:
        assert deserialize(cls, serialize(obj)) == obj, cls.__name__

    # secrets require SerdeSecret
    for secret in [sk, sk_set.secret_key_share(0), sk_set]:
        with pytest.raises(TypeError):
            serialize(secret)
    assert deserialize(tc.SecretKey, serialize(SerdeSecret(sk))) == sk
    assert (
        deserialize(tc.SecretKeyShare, serialize(SerdeSecret(sk_set.secret_key_share(0))))
        == sk_set.secret_key_share(0)
    )
    assert deserialize(tc.SecretKeySet, serialize(SerdeSecret(sk_set))) == sk_set


def test_serde_fr_validation(bls_backend):
    # value >= r rejected (`number outside of prime field`)
    bad = (bls_backend.r).to_bytes(32, "little")
    with pytest.raises(tc.FromBytesError):
        deserialize(tc.SecretKey, bad)
    with pytest.raises(tc.FromBytesError):
        deserialize(tc.SecretKey, bytes(16))  # short


def test_serde_trailing_bytes_rejected(backend, rng):
    pk = tc.SecretKey.random(rng).public_key()
    with pytest.raises(tc.FromBytesError):
        deserialize(tc.PublicKey, serialize(pk) + b"\x00")


def test_bivar_commitment_serde(backend, rng):
    bc = BivarPoly.random(2, rng).commitment()
    data = serialize(bc)
    assert deserialize(BivarPoly and type(bc), data) == bc
    # degree/len mismatch rejected (`serde_impl.rs:150-161`)
    tampered = bytearray(data)
    tampered[0] ^= 1  # change the degree u64
    with pytest.raises(tc.FromBytesError):
        deserialize(type(bc), bytes(tampered))


def test_commitment_poly_serde(backend, rng):
    poly = Poly.random(3, rng)
    comm = poly.commitment()
    assert deserialize(Commitment, serialize(comm)) == comm
    # The reference serializes Poly directly (field_vec derive,
    # `/root/reference/src/poly.rs:39-43`); bytes equal the SerdeSecret form.
    assert serialize(poly) == serialize(SerdeSecret(poly))
    assert deserialize(Poly, serialize(poly)) == poly
    assert deserialize(Poly, serialize(SerdeSecret(poly))) == poly


def test_codec(backend, rng):
    # `src/lib.rs:1010-1047` (codec-support feature)
    sk = tc.SecretKey.random(rng)
    pk = sk.public_key()
    sig = sk.sign(b"this is a test")
    ct = pk.encrypt(b"cipher text", rng)
    dec_share = tc.DecryptionShare.random(rng)
    pk_set = tc.SecretKeySet.random(3, rng).public_keys()

    for obj, cls in [
        (pk, tc.PublicKey),
        (sig, tc.Signature),
        (ct, tc.Ciphertext),
        (dec_share, tc.DecryptionShare),
        (pk_set, tc.PublicKeySet),
    ]:
        assert codec_impl.decode(cls, codec_impl.encode(obj)) == obj

    with pytest.raises(TypeError):
        codec_impl.encode(sk)


def test_scale_compact_roundtrip():
    for n in [0, 1, 63, 64, 16383, 16384, (1 << 30) - 1, 1 << 30, 1 << 40]:
        enc = codec_impl.scale_compact_encode(n)
        val, used = codec_impl.scale_compact_decode(enc)
        assert (val, used) == (n, len(enc))


def test_mock_sizes(mock_backend, rng):
    # mock PK_SIZE == SIG_SIZE == 4 (`src/mock/mod.rs`)
    pk = tc.SecretKey.random(rng).public_key()
    assert len(pk.to_bytes()) == 4
    assert len(serialize(SerdeSecret(tc.SecretKey.random(rng)))) == 4
