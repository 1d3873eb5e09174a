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
    native library force-disabled (fallback, via subprocess with
    TC_TPU_NATIVE=0 — the flag is read once at first use) and enabled."""
    import json
    import os
    import subprocess
    import sys

    from threshold_crypto_tpu import hashing

    data = b"The quick brown fox jumps over the lazy dog"
    assert hashing.sha3_256(data) == hashlib.sha3_256(data).digest()

    prog = (
        "import json, sys\n"
        "from threshold_crypto_tpu import hashing, native\n"
        "from threshold_crypto_tpu.host import curve as hcv\n"
        "assert not native.available()\n"
        "h = hashing.hash_g2(b'native-parity-msg')\n"
        "class _G:\n"
        "    def to_compressed(self):\n"
        "        return hcv.g1_to_compressed(hcv.G1.generator)\n"
        "x = hashing.xor_with_hash(_G(), bytes(range(64)))\n"
        "print(json.dumps({'h': h.to_compressed().hex(), 'x': x.hex()}))\n"
    )
    env = dict(os.environ, TC_TPU_NATIVE="0")
    out = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    got = json.loads(out.stdout)

    from threshold_crypto_tpu.host import curve as hcv

    h_native = hashing.hash_g2(b"native-parity-msg")

    class _G:
        def to_compressed(self):
            return hcv.g1_to_compressed(hcv.G1.generator)

    x_native = hashing.xor_with_hash(_G(), bytes(range(64)))
    assert got["h"] == h_native.to_compressed().hex()
    assert got["x"] == x_native.hex()


def test_native_hash_g2_matches_sampling_oracle():
    """tc_hash_g2 = sha3 → ChaCha → rejection sampling → cofactor mul must be
    bit-exact with the Python pipeline (`/root/reference/src/lib.rs:691-694`)."""
    from threshold_crypto_tpu.host import sampling

    for i in range(4):
        msg = b"hash-g2-parity-%d" % i
        digest = hashlib.sha3_256(msg).digest()
        want = sampling.g2_random(ChaChaRng(digest))
        assert native.hash_g2(msg) == want
        assert native.g2_random_from_seed(digest) == want


def test_native_seed_length_guard():
    with pytest.raises(ValueError):
        native.chacha20_words(b"short", 0, 4)
    with pytest.raises(ValueError):
        native.chacha20_low_bytes(b"short", 0, 4)
    with pytest.raises(ValueError):
        native.g2_random_from_seed(b"short")
