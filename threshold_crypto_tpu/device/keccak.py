"""Vectorized SHA3-256 (Keccak-f[1600]) on device.

The RLC transcript hash binds the batch-verification exponents to every
share being verified (`ops.rlc_exponents`).  Host-side that hash is the
verifier's linear cost — ~150 MB of point bytes per 262k-share batch at
~160 MB/s Keccak on this host's TWO cpu cores (measured r4: ~1 s, ~4
µs/share — as large as the whole MSM).  But the point limbs already LIVE
on device, and Keccak-f is pure 64-bit XOR/rotate logic: here every VPU
lane absorbs one 2176-byte chunk independently (17 permutations), so a
150 MB transcript hashes in ~milliseconds and only the final digest list
crosses the link.

64-bit lanes are (lo, hi) uint32 pairs — the TPU has no 64-bit integer
datapath; rotations split across the halves with static offsets.

Bit-exactness: each chunk digest equals `hashlib.sha3_256(chunk)` (the
stream is chunked little-endian u32 words, 2176 B = 16 rate blocks + the
standard 0x06…0x80 padding block), asserted in tests/test_ops.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_BYTES = 2176  # 16 SHA3-256 rate blocks (16 x 136 B); +1 padding perm
_RATE_WORDS64 = 17  # 136-byte rate = 17 lanes

# Keccak round constants, split into u32 halves
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_RC_LO = [np.uint32(c & 0xFFFFFFFF) for c in _RC]
_RC_HI = [np.uint32(c >> 32) for c in _RC]

# rho rotation offsets, indexed [x][y] (column-major lanes A[x, y])
_RHO = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rotl64(lo, hi, r: int):
    r %= 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r < 32:
        nlo = (lo << np.uint32(r)) | (hi >> np.uint32(32 - r))
        nhi = (hi << np.uint32(r)) | (lo >> np.uint32(32 - r))
        return nlo, nhi
    s = r - 32
    nlo = (hi << np.uint32(s)) | (lo >> np.uint32(32 - s))
    nhi = (lo << np.uint32(s)) | (hi >> np.uint32(32 - s))
    return nlo, nhi


def _round(lo, hi, rc_lo, rc_hi):
    """One Keccak round on 25-element half-lane lists."""
    # theta
    c_lo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20]
            for x in range(5)]
    c_hi = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20]
            for x in range(5)]
    for x in range(5):
        r1lo, r1hi = _rotl64(c_lo[(x + 1) % 5], c_hi[(x + 1) % 5], 1)
        dlo = c_lo[(x + 4) % 5] ^ r1lo
        dhi = c_hi[(x + 4) % 5] ^ r1hi
        for y in range(5):
            lo[x + 5 * y] = lo[x + 5 * y] ^ dlo
            hi[x + 5 * y] = hi[x + 5 * y] ^ dhi
    # rho + pi
    blo = [None] * 25
    bhi = [None] * 25
    for x in range(5):
        for y in range(5):
            rlo, rhi = _rotl64(lo[x + 5 * y], hi[x + 5 * y], _RHO[x][y])
            # pi: B[y, 2x+3y] = rotated A[x, y]
            blo[y + 5 * ((2 * x + 3 * y) % 5)] = rlo
            bhi[y + 5 * ((2 * x + 3 * y) % 5)] = rhi
    # chi
    lo_o = [None] * 25
    hi_o = [None] * 25
    for y in range(5):
        row_lo = [blo[x + 5 * y] for x in range(5)]
        row_hi = [bhi[x + 5 * y] for x in range(5)]
        for x in range(5):
            lo_o[x + 5 * y] = row_lo[x] ^ (
                ~row_lo[(x + 1) % 5] & row_lo[(x + 2) % 5]
            )
            hi_o[x + 5 * y] = row_hi[x] ^ (
                ~row_hi[(x + 1) % 5] & row_hi[(x + 2) % 5]
            )
    # iota
    lo_o[0] = lo_o[0] ^ rc_lo
    hi_o[0] = hi_o[0] ^ rc_hi
    return lo_o, hi_o


def keccak_f1600(lo, hi):
    """One Keccak-f[1600] permutation on [25, ...] u32 half-lane arrays.

    Lane index = x + 5*y (the standard flat order of the state bytes).
    The 24 rounds run as a `lax.scan` over the round constants — XLA:CPU
    compile time grows superlinearly in the unrolled chain length
    (measured: 1 round 1 s, 8 rounds 31 s), and only iota differs between
    rounds.
    """
    slo = jnp.stack([lo[i] for i in range(25)])
    shi = jnp.stack([hi[i] for i in range(25)])
    rcs = (jnp.asarray(np.array(_RC_LO)), jnp.asarray(np.array(_RC_HI)))

    def body(state, rc):
        clo, chi = state
        lo_l, hi_l = _round(
            [clo[i] for i in range(25)],
            [chi[i] for i in range(25)],
            rc[0], rc[1],
        )
        return (jnp.stack(lo_l), jnp.stack(hi_l)), None

    (slo, shi), _ = jax.lax.scan(body, (slo, shi), rcs)
    return [slo[i] for i in range(25)], [shi[i] for i in range(25)]


@jax.jit
def sha3_256_chunks(words):
    """SHA3-256 of many equal 2176-byte chunks at once.

    words: uint32[nchunks, 544] — each row is one chunk's byte stream as
    little-endian u32 words.  Returns uint32[nchunks, 8] digests (the
    same LE word order as the digest bytes).

    The 16 absorb blocks run as ONE `lax.scan` over a single-permutation
    body (the traced graph holds 2 permutations, not 17).
    """
    n = words.shape[0]
    blocks = words.reshape(n, 16, 34).transpose(1, 0, 2)  # [16, n, 34]

    def body(state, blk):
        slo, shi = state  # [25, n]
        slo = slo.at[:_RATE_WORDS64].set(
            slo[:_RATE_WORDS64] ^ blk[:, 0::2].T
        )
        shi = shi.at[:_RATE_WORDS64].set(
            shi[:_RATE_WORDS64] ^ blk[:, 1::2].T
        )
        lo, hi = keccak_f1600(
            [slo[i] for i in range(25)], [shi[i] for i in range(25)]
        )
        return (jnp.stack(lo), jnp.stack(hi)), None

    zero = jnp.zeros((25, n), jnp.uint32)
    (slo, shi), _ = jax.lax.scan(body, (zero, zero), blocks)
    # padding block: 0x06 at byte 0, 0x80 at byte 135 (lane 16, byte 7)
    lo = [slo[i] for i in range(25)]
    hi = [shi[i] for i in range(25)]
    lo[0] = lo[0] ^ np.uint32(0x06)
    hi[16] = hi[16] ^ np.uint32(0x80000000)
    lo, hi = keccak_f1600(lo, hi)
    out = []
    for w in range(4):  # 32-byte digest = 4 u64 lanes
        out.append(lo[w])
        out.append(hi[w])
    return jnp.stack(out, axis=1)


# ---------------------------------------------------------------------------
# Pallas form: the XLA scan above pays an HBM round trip of the [25, K]
# state per loop iteration (measured 91 ms at K=69k vs ~2 ms of pure VPU
# compute).  Here the state lives in VMEM scratch across a sequential
# (chunk-block, permutation) grid: each step absorbs one 136-byte rate
# block into 1024 chunks' states and runs the 24 unrolled rounds.
# ---------------------------------------------------------------------------

_ROWS = 8
_LANES = 128


def _k_sha3(words_ref, out_ref, st_ref):
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _init():
        st_ref[...] = jnp.zeros((50, _ROWS, _LANES), jnp.uint32)

    st = st_ref[...]
    lo = [st[i] for i in range(25)]
    hi = [st[25 + i] for i in range(25)]

    @pl.when(p < 16)
    def _absorb_rounds():
        llo = list(lo)
        lhi = list(hi)
        for w in range(_RATE_WORDS64):
            llo[w] = llo[w] ^ words_ref[2 * w]
            lhi[w] = lhi[w] ^ words_ref[2 * w + 1]
        for rnd in range(24):
            llo, lhi = _round(llo, lhi, _RC_LO[rnd], _RC_HI[rnd])
        st_ref[...] = jnp.concatenate(
            [jnp.stack(llo), jnp.stack(lhi)], axis=0
        )

    @pl.when(p == 16)
    def _pad_finish():
        llo = list(lo)
        lhi = list(hi)
        llo[0] = llo[0] ^ np.uint32(0x06)
        lhi[16] = lhi[16] ^ np.uint32(0x80000000)
        for rnd in range(24):
            llo, lhi = _round(llo, lhi, _RC_LO[rnd], _RC_HI[rnd])
        dig = []
        for w in range(4):
            dig.append(llo[w])
            dig.append(lhi[w])
        out_ref[...] = jnp.stack(dig, axis=0)


@jax.jit
def _sha3_chunks_pallas(words):
    """uint32[K, 544] -> uint32[K, 8] via the VMEM-resident kernel.

    jit-wrapped: the pad/transpose feeding the kernel and the digest
    unpack must fuse into one program — run eagerly they cost seconds of
    per-op dispatch on a 150 MB stream (measured: the unjitted form took
    the exponent stage from 0.25 s to ~7 s at K=69k)."""
    K = words.shape[0]
    rows = -(-K // _LANES)
    R = -(-rows // _ROWS) * _ROWS
    nblk = R // _ROWS
    w = words
    if R * _LANES != K:
        w = jnp.pad(w, ((0, R * _LANES - K), (0, 0)))
    planes = w.T.reshape(544, R, _LANES)
    out = pl.pallas_call(
        _k_sha3,
        grid=(nblk, 17),
        in_specs=[
            pl.BlockSpec(
                (34, _ROWS, _LANES),
                lambda b, p: (jnp.minimum(p, 15), b, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (8, _ROWS, _LANES), lambda b, p: (0, b, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((8, R, _LANES), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((50, _ROWS, _LANES), jnp.uint32)],
        interpret=os.environ.get("TC_TPU_KECCAK_INTERPRET") == "1",
    )(planes)
    return out.reshape(8, R * _LANES).T[:K]


@functools.lru_cache(maxsize=1)
def _use_pallas_keccak() -> bool:
    if os.environ.get("TC_TPU_KECCAK_INTERPRET") == "1":
        return True
    env = os.environ.get("TC_TPU_PALLAS_KECCAK")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def hash_chunks(words):
    """Dispatch: Pallas kernel on TPU, XLA scan elsewhere (identical
    digests — asserted in tests)."""
    if _use_pallas_keccak():
        return _sha3_chunks_pallas(words)
    return sha3_256_chunks(words)


# compress the main-stream digest list on device once it exceeds this
# many entries (avoids downloading ~32 B x chunks through the tunnel)
_L2_MIN = 64
_DIGESTS_PER_CHUNK = CHUNK_BYTES // 32  # 68


def transcript_digests(leaves):
    """Digest list for a transcript of device (or host) leaves.

    Stream structure (residency-independent — device and host leaves
    produce IDENTICAL lists, tested):

    * the "main stream" = the full 2176-byte chunks of every uint32 leaf
      large enough to chunk, in leaf order; hashed one-chunk-per-VPU-lane
      on device when the leaf lives there.  When the main stream has ≥64
      chunk digests, the digest array is itself zero-padded to a chunk
      multiple and compressed by a second SHA3 level (still on device) —
      so only ~count/68 digests ever cross the tunneled link.
    * the "host stream" = leaf tails, bool masks and small leaves, hashed
      host-side per 2176-byte chunk.
    * a header digest binds the structure: counts of both streams and
      the compression level.

    Exactly two device syncs total: the (possibly level-2) main digests
    and one batched `device_get` of tails/small leaves (each round trip
    costs ~0.1 s on the tunneled link).
    """
    from .. import hashing

    wpc = CHUNK_BYTES // 4

    def _globalize(leaf):
        # Multi-process meshes: a shard-spanning array cannot be fetched
        # (or hashed into one process-local transcript) directly — gather
        # the GLOBAL value so every process derives identical digests.
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(leaf, tiled=True)
            )
        return leaf

    leaves = [_globalize(leaf) for leaf in leaves]
    main = []        # ("dev", [k, wpc] jax) | ("hostmain", np [k, wpc])
    fetch = []       # device arrays to pull host-side
    host_stream = [] # ("bytes", raw) | ("fetch", idx)
    for leaf in leaves:
        is_device = isinstance(leaf, jax.Array) and not isinstance(
            leaf, np.ndarray
        )
        dtype = getattr(leaf, "dtype", None)
        big = dtype == np.uint32 and leaf.size * 4 >= CHUNK_BYTES
        if big:
            if is_device:
                flat = leaf.reshape(-1)
                nfull = (flat.size * 4) // CHUNK_BYTES
                main.append(("dev", flat[: nfull * wpc].reshape(nfull, wpc)))
                tail = flat[nfull * wpc :]
                if tail.size:
                    fetch.append(tail)
                    host_stream.append(("fetch", len(fetch) - 1))
            else:
                flat = np.ascontiguousarray(leaf).reshape(-1)
                nfull = (flat.size * 4) // CHUNK_BYTES
                main.append(
                    ("hostmain", flat[: nfull * wpc].reshape(nfull, wpc))
                )
                tail = flat[nfull * wpc :]
                if tail.size:
                    host_stream.append(("bytes", tail.tobytes()))
        elif is_device:
            fetch.append(leaf)
            host_stream.append(("fetch", len(fetch) - 1))
        else:
            host_stream.append(
                ("bytes", np.ascontiguousarray(leaf).tobytes())
            )

    # -- main stream: level-1 chunk digests, in leaf order -----------------
    any_dev = any(kind == "dev" for kind, _ in main)
    K = sum(arr.shape[0] for _, arr in main)
    main_digests = []  # list[bytes], final (possibly compressed) form
    level = 1
    if K:
        if any_dev:
            parts = [
                arr if kind == "dev" else jnp.asarray(arr)
                for kind, arr in main
            ]
            dig = hash_chunks(jnp.concatenate(parts, axis=0))  # [K, 8]
            if K >= _L2_MIN:
                level = 2
                dig = _l2_compress_device(dig)
            dig_np = np.asarray(dig)
        else:
            dig_np = _np_sha3_chunks(
                np.concatenate([arr for _, arr in main], axis=0)
            )
            if K >= _L2_MIN:
                level = 2
                dig_np = _l2_compress_host(dig_np)
        main_digests = [d.tobytes() for d in dig_np]

    fetched = jax.device_get(fetch) if fetch else []

    host_digests = []
    for kind, ref in host_stream:
        raw = (
            ref
            if kind == "bytes"
            else np.ascontiguousarray(np.asarray(fetched[ref])).tobytes()
        )
        for off in range(0, max(len(raw), 1), CHUNK_BYTES):
            host_digests.append(
                hashing.sha3_256(raw[off : off + CHUNK_BYTES])
            )

    header = hashing.sha3_256(
        b"TC-TRANSCRIPT-v2"
        + K.to_bytes(8, "little")
        + len(host_digests).to_bytes(8, "little")
        + bytes([level])
    )
    return [header] + main_digests + host_digests


def _l2_compress_device(dig):
    """[K, 8] device digests -> [ceil(K/68), 8] level-2 digests."""
    K = dig.shape[0]
    k2 = -(-K // _DIGESTS_PER_CHUNK)
    pad = k2 * _DIGESTS_PER_CHUNK - K
    if pad:
        dig = jnp.concatenate(
            [dig, jnp.zeros((pad, 8), jnp.uint32)], axis=0
        )
    return hash_chunks(dig.reshape(k2, CHUNK_BYTES // 4))


def _l2_compress_host(dig_np):
    K = dig_np.shape[0]
    k2 = -(-K // _DIGESTS_PER_CHUNK)
    pad = k2 * _DIGESTS_PER_CHUNK - K
    if pad:
        dig_np = np.concatenate(
            [dig_np, np.zeros((pad, 8), np.uint32)], axis=0
        )
    return _np_sha3_chunks(dig_np.reshape(k2, CHUNK_BYTES // 4))


def _np_sha3_chunks(words_np):
    """Host-parity form of `sha3_256_chunks` (hashlib per chunk)."""
    import hashlib

    out = np.zeros((words_np.shape[0], 8), np.uint32)
    for i in range(words_np.shape[0]):
        out[i] = np.frombuffer(
            hashlib.sha3_256(words_np[i].tobytes()).digest(), "<u4"
        )
    return out
