"""ChaCha20 word stream on device (vectorized over block counters).

The RLC batch-verification exponents are a ChaCha20Rng u64 stream keyed by
the transcript digest (`ops.rlc_exponents`).  Producing them host-side
costs a [N, 16]-limb upload through the tunneled device link (~100 ms at
N=16k — measured r4, the single biggest exponent-stage cost); here only
the 32-byte digest crosses the link and the stream expands on the VPU.

Bit-exact with `utils.rng.ChaChaRng` (rand_chacha 0.2 semantics: 64-bit
block counter in state words 12–13, stream id 0 in 14–15, block-major
word order) — asserted against the host stream in tests/test_ops.py.

ChaCha20 is pure 32-bit add-rotate-xor: each state word becomes a
[nblocks] u32 vector and the 20 rounds run as ~1k elementwise VPU ops,
independent of N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_C0, _C1, _C2, _C3 = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)


def _rotl(v, c: int):
    return (v << np.uint32(c)) | (v >> np.uint32(32 - c))


@functools.partial(jax.jit, static_argnums=1)
def chacha20_words(key_words, n_words: int):
    """Words [0, n_words) of the ChaCha20Rng u32 stream.

    key_words: uint32[8] (the little-endian words of the 32-byte seed).
    Returns uint32[n_words].
    """
    nblocks = -(-n_words // 16)
    ctr = jnp.arange(nblocks, dtype=jnp.uint32)
    zeros = jnp.zeros(nblocks, jnp.uint32)

    def bc(v):
        return jnp.full(nblocks, np.uint32(v), jnp.uint32)

    state = [bc(_C0), bc(_C1), bc(_C2), bc(_C3)] + [
        jnp.broadcast_to(key_words[i].astype(jnp.uint32), (nblocks,))
        for i in range(8)
    ] + [ctr, zeros, zeros, zeros]
    x = list(state)

    def qr(a, b, c, d):
        x[a] = x[a] + x[b]
        x[d] = _rotl(x[d] ^ x[a], 16)
        x[c] = x[c] + x[d]
        x[b] = _rotl(x[b] ^ x[c], 12)
        x[a] = x[a] + x[b]
        x[d] = _rotl(x[d] ^ x[a], 8)
        x[c] = x[c] + x[d]
        x[b] = _rotl(x[b] ^ x[c], 7)

    for _ in range(10):
        qr(0, 4, 8, 12)
        qr(1, 5, 9, 13)
        qr(2, 6, 10, 14)
        qr(3, 7, 11, 15)
        qr(0, 5, 10, 15)
        qr(1, 6, 11, 12)
        qr(2, 7, 8, 13)
        qr(3, 4, 9, 14)

    out = jnp.stack([x[i] + state[i] for i in range(16)], axis=1)  # [B, 16]
    return out.reshape(-1)[:n_words]


@functools.partial(jax.jit, static_argnums=1)
def rlc_exponent_limbs(key_words, n: int):
    """The [n, 16]-limb RLC exponent batch from a transcript digest.

    Mirrors the host tail of `ops.rlc_exponents`: u64 draws (low word
    first), zero draws replaced by 1, low 4 limbs populated.
    """
    words = chacha20_words(key_words, 2 * n)
    lo = words[0::2]
    hi = words[1::2]
    zero = (lo == 0) & (hi == 0)
    lo = jnp.where(zero, jnp.uint32(1), lo)
    mask = jnp.uint32(0xFFFF)
    limbs = jnp.stack(
        [lo & mask, lo >> 16, hi & mask, hi >> 16], axis=1
    )  # [n, 4]
    return jnp.concatenate(
        [limbs, jnp.zeros((n, 12), jnp.uint32)], axis=1
    )
