"""Native (C++) host-runtime for threshold_crypto_tpu.

The reference delegates its byte-oriented host work to native Rust crates
(`tiny-keccak` SHA3, `rand_chacha` ChaCha20 — SURVEY.md §2b, consumed at
`/root/reference/src/util.rs:3-9` and `/root/reference/src/lib.rs:691-715`).
This package is the framework's native equivalent: `src/tc_native.cpp`
compiled to a shared library and loaded through ctypes.

Build model: compiled on demand with g++ (no pip, no pybind11 — environment
constraint), cached next to the source keyed by a source hash.  Every
function has a pure-Python fallback, so `available()` may be False (e.g. no
compiler) without loss of functionality — only host-side speed.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "tc_native.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _build_and_load():
    """Compile (if stale) and dlopen the native library; None on failure."""
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_HERE, f"_tc_native_{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-funroll-loops", "-shared", "-fPIC", "-std=c++17",
            "-o", tmp, _SRC,
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
            os.replace(tmp, so_path)
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    lib.tc_sha3_256.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p
    ]
    lib.tc_chacha20_words.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_size_t,
    ]
    lib.tc_chacha20_low_bytes.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_size_t
    ]
    lib.tc_xor_with_hash.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
    ]
    lib.tc_hash_g2.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p
    ]
    lib.tc_g2_random_from_seed.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.tc_native_abi_version.restype = ctypes.c_int
    if lib.tc_native_abi_version() != 2:
        return None
    return lib


def _get():
    global _lib, _tried
    if _lib is None and not _tried:
        with _lock:
            if _lib is None and not _tried:
                if os.environ.get("TC_TPU_NATIVE") in ("0", "false"):
                    _lib = None
                else:
                    _lib = _build_and_load()
                _tried = True
    return _lib


def available() -> bool:
    """True when the C++ library compiled/loaded and fast paths are active."""
    return _get() is not None


def sha3_256(data: bytes) -> bytes | None:
    lib = _get()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(32)
    lib.tc_sha3_256(bytes(data), len(data), out)
    return out.raw


def chacha20_words(seed: bytes, word_off: int, n_words: int) -> list | None:
    """Words [word_off, word_off+n_words) of the ChaCha20Rng u32 stream."""
    lib = _get()
    if lib is None:
        return None
    if len(seed) != 32:  # C memcpy's exactly 32 bytes; mirror ChaChaRng
        raise ValueError("ChaCha20 seed must be 32 bytes")
    buf = (ctypes.c_uint32 * n_words)()
    lib.tc_chacha20_words(bytes(seed), word_off, buf, n_words)
    return list(buf)


def chacha20_low_bytes(seed: bytes, word_off: int, n: int) -> bytes | None:
    """rand 0.7 Standard-u8 keystream (low byte of each u32 word)."""
    lib = _get()
    if lib is None:
        return None
    if len(seed) != 32:
        raise ValueError("ChaCha20 seed must be 32 bytes")
    out = ctypes.create_string_buffer(n)
    lib.tc_chacha20_low_bytes(bytes(seed), word_off, out, n)
    return out.raw


def _unpack_g2(raw: bytes):
    x0 = int.from_bytes(raw[0:48], "big")
    x1 = int.from_bytes(raw[48:96], "big")
    y0 = int.from_bytes(raw[96:144], "big")
    y1 = int.from_bytes(raw[144:192], "big")
    return ((x0, x1), (y0, y1))


def hash_g2(msg: bytes):
    """Full reference hash_g2 chain (sha3 → ChaCha → G2 rejection sampling →
    cofactor scaling) in one native call; returns a host affine G2 point
    ((x0,x1),(y0,y1)) or None when the library is unavailable."""
    lib = _get()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(192)
    lib.tc_hash_g2(bytes(msg), len(msg), out)
    return _unpack_g2(out.raw)


def g2_random_from_seed(seed: bytes):
    """G2::random(ChaChaRng::from_seed(seed)) — the sampling half of
    hash_g2, for parity tests against host.sampling.g2_random."""
    lib = _get()
    if lib is None:
        return None
    if len(seed) != 32:
        raise ValueError("ChaCha20 seed must be 32 bytes")
    out = ctypes.create_string_buffer(192)
    lib.tc_g2_random_from_seed(bytes(seed), out)
    return _unpack_g2(out.raw)


def xor_with_hash(key_material: bytes, data: bytes) -> bytes | None:
    """data ⊕ ChaCha20(SHA3-256(key_material)) low-byte keystream, fused."""
    lib = _get()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(len(data))
    lib.tc_xor_with_hash(
        bytes(key_material), len(key_material), bytes(data), len(data), out
    )
    return out.raw
