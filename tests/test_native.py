"""C++ host-runtime (`threshold_crypto_tpu.native`) vs the Python fallbacks.

The native library must be a bit-exact drop-in for the byte-oriented host
primitives (SHA3-256 per FIPS-202; ChaCha20 word stream per rand_chacha 0.2
framing — the reference's native deps, SURVEY.md §2b)."""

import hashlib

import pytest

from threshold_crypto_tpu import native
from threshold_crypto_tpu.utils.rng import ChaChaRng, chacha20_block

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


@pytest.mark.parametrize("n", [0, 1, 31, 32, 64, 135, 136, 137, 1000, 10_000])
def test_sha3_matches_hashlib(n):
    data = bytes((7 * i + 3) % 256 for i in range(n))
    assert native.sha3_256(data) == hashlib.sha3_256(data).digest()


def test_chacha20_words_match_python():
    seed = bytes(range(32))
    rng = ChaChaRng(seed)
    py_words = [rng.next_u32() for _ in range(100)]
    assert native.chacha20_words(seed, 0, 100) == py_words
    # offset reads land mid-block correctly
    assert native.chacha20_words(seed, 37, 20) == py_words[37:57]


def test_chacha20_low_bytes_match_keystream():
    seed = hashlib.sha3_256(b"keystream").digest()
    py = ChaChaRng(seed).keystream_bytes(333)
    assert native.chacha20_low_bytes(seed, 0, 333) == py


def test_fused_xor_with_hash_matches_composition():
    key_material = b"\x17" * 48  # stand-in for a compressed G1 point
    data = bytes((i * i) % 256 for i in range(517))
    digest = hashlib.sha3_256(key_material).digest()
    ks = ChaChaRng(digest).keystream_bytes(len(data))
    expect = bytes(a ^ b for a, b in zip(ks, data))
    assert native.xor_with_hash(key_material, data) == expect


def test_public_hashing_uses_native_consistently():
    """threshold_crypto_tpu.hashing must give identical results with the
    native library force-disabled (fallback) and enabled."""
    from threshold_crypto_tpu import hashing

    data = b"The quick brown fox jumps over the lazy dog"
    assert hashing.sha3_256(data) == hashlib.sha3_256(data).digest()
