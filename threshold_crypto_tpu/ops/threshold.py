"""Batched threshold-protocol group operations (the device hot paths).

Each function here is the batch-first, jittable form of one reference hot
loop (SURVEY.md §3 call stacks):

* `sign_batch`        — sig_i = H(m_i) · sk_i, the per-share BLS sign
  (`/root/reference/src/lib.rs:372-374`), batched over shares/messages.
* `verify_batch`      — e(pk_i, H_i) == e(G1, sig_i) for a whole batch, as
  one fused 2-pair product check per lane
  (`/root/reference/src/lib.rs:108-110`).
* `verify_dec_share_batch` — e(share_i, H(u,v)_i) == e(pk_i, w_i)
  (`/root/reference/src/lib.rs:182-186`).
* `combine_batch`     — in-exponent Lagrange interpolation at x=0
  (`/root/reference/src/lib.rs:719-767`): λ on device Fr + one MSM.
* `commit_batch`      — Feldman commitment: per-coefficient fixed-base G1
  scalar-mul (`/root/reference/src/poly.rs:372-377`).

Points travel as the Jacobian pytrees of `device.curve` (or the affine
pytrees of `device.pairing` for pairing inputs); scalars as uint32[..., 16]
limbs — Montgomery form for field math, canonical plain form for scalar
multiplication bits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..device import curve as dcv
from ..device import mont
from ..device import pairing as dpr
from ..device.mont import FQ, FR
from . import fr as frops


# ---------------------------------------------------------------------------
# Coordinate plumbing
# ---------------------------------------------------------------------------

def batch_inv_field(f, a):
    """Product-tree batched inversion over any field-ops namespace.

    Same structure as `mont.batch_inv` (pairwise product tree up, ONE
    field inversion at the root, tree walk down) generalized to the
    f-pytree vocabulary (FqOps arrays, Fq2Ops tuples) and arbitrary batch
    shapes.  Replaces per-lane Fermat inversion (~510·N multiplies for
    Fq, more for Fq2) with ~3·N batched multiplies at O(log N) depth.
    Zero lanes map to zero, matching `f.inv`'s Fermat behavior.

    On the Pallas path the tree LOSES: its ~2·log₂N level multiplies are
    each an in-program dispatch (~50-100 µs fixed), while `f.inv` runs
    the whole Fermat chain in ONE kernel (`pallas_mont.pow_fixed`) —
    measured 0.10 s tree vs ~5 ms in-kernel for a [4096] Fq2 batch.  So
    this is the XLA/CPU form; Pallas defers to `f.inv`.
    """
    import jax.tree_util as jtu

    from ..device import mont as _m

    if _m.use_pallas():
        return f.inv(a)

    bs = f.shape(a)
    n = 1
    for d in bs:
        n *= int(d)
    if n <= 1:
        return f.inv(a)
    k = len(bs)
    flat = jtu.tree_map(lambda x: x.reshape((n,) + x.shape[k:]), a)
    zm = f.is_zero(flat)
    safe = f.select(zm, f.one((n,)), flat)
    m = 1 << (n - 1).bit_length()
    if m != n:
        pad = f.one((m - n,))
        safe = jtu.tree_map(
            lambda x, q: jnp.concatenate([x, q], axis=0), safe, pad
        )

    levels = [safe]
    while jtu.tree_leaves(levels[-1])[0].shape[0] > 1:
        cur = levels[-1]
        levels.append(f.mul(
            jtu.tree_map(lambda x: x[0::2], cur),
            jtu.tree_map(lambda x: x[1::2], cur),
        ))

    inv_cur = f.inv(levels[-1])
    for lev in levels[-2::-1]:
        left = jtu.tree_map(lambda x: x[0::2], lev)
        right = jtu.tree_map(lambda x: x[1::2], lev)
        il = f.mul(inv_cur, right)
        ir = f.mul(inv_cur, left)
        inv_cur = jtu.tree_map(
            lambda l, r: jnp.stack([l, r], axis=1).reshape(
                (2 * l.shape[0],) + l.shape[1:]
            ),
            il, ir,
        )
    out = f.select(zm, f.zero((n,)), jtu.tree_map(lambda x: x[:n], inv_cur))
    return jtu.tree_map(lambda x: x.reshape(bs + x.shape[1:]), out)


def jacobian_to_affine(curve: dcv.DeviceCurve, p):
    """Batched Jacobian -> affine pytree (x, y, inf) for the pairing kernels.

    ONE field inversion per batch via the product tree (`batch_inv_field`;
    per-lane Fermat inversion cost ~10 % of the large-N combine before
    this).  Infinity lanes produce masked garbage coordinates with
    inf=True (Z=0 → zinv=0, same as the Fermat path).
    """
    f = curve.f
    X, Y, Z = p
    inf = f.is_zero(Z)
    zinv = batch_inv_field(f, Z)
    zinv2 = f.sqr(zinv)
    x = f.mul(X, zinv2)
    y = f.mul(Y, f.mul(zinv2, zinv))
    return (x, y, inf)


def affine_to_jacobian(curve: dcv.DeviceCurve, aff):
    """Affine pytree (x, y, inf) -> Jacobian (X, Y, Z) with Z in {0, 1}."""
    f = curve.f
    x, y, inf = aff
    shape = f.shape(x)
    Z = f.select(inf, f.zero(shape), f.one(shape))
    return (x, y, Z)


# ---------------------------------------------------------------------------
# Sign (G2 scalar-mul over the share batch)
# ---------------------------------------------------------------------------

def sign_batch(h_jac, sk_plain):
    """sig_i = H_i · sk_i over the leading batch axis.

    h_jac: batched G2 Jacobian pytree (a shared hash point should be
    broadcast to the batch by the caller); sk_plain: uint32[N, 16]
    canonical plain Fr limbs. Returns a batched G2 Jacobian pytree.
    """
    return dcv.G2.scalar_mul(h_jac, sk_plain)


def decrypt_share_batch(u_jac, sk_plain):
    """d_i = u · sk_i (G1), the threshold-decryption share
    (`/root/reference/src/lib.rs:460-462`)."""
    return dcv.G1.scalar_mul(u_jac, sk_plain)


# ---------------------------------------------------------------------------
# Encrypt (batched Baek–Zhang, the one protocol stack that had no device
# path before round 4 — VERDICT r3 #6)
# ---------------------------------------------------------------------------

def encrypt_begin_batch(pk_jac, r_plain):
    """Device half 1 of batched Baek–Zhang encryption
    (`/root/reference/src/lib.rs:128-137`): u_i = r_i·G1 (fixed base) and
    g_i = r_i·pk_i, two batched scalar-muls.

    pk_jac: batched G1 Jacobian pytree [N] (broadcast a shared key to the
    batch); r_plain: uint32[N, 16] canonical plain Fr limbs.  The steps
    between the halves — v_i = m_i ⊕ H(g_i) and huv_i = hash_g1_g2(u_i,
    v_i) — are host-side byte/KDF work on the ciphertext bytes; feed the
    resulting H(u,v) points to `encrypt_finish_batch`.
    """
    n = r_plain.shape[0]
    base = dcv.G1.generator((n,))
    u = dcv.G1.scalar_mul(base, r_plain)
    g = dcv.G1.scalar_mul(pk_jac, r_plain)
    return u, g


def encrypt_finish_batch(huv_jac, r_plain):
    """Device half 2: w_i = r_i·H(u_i, v_i) (batched G2 scalar-mul)."""
    return dcv.G2.scalar_mul(huv_jac, r_plain)


def encrypt_batch(pk_jac, r_plain, huv_jac):
    """All three scalar-muls of batched encryption in one call, for callers
    that already hold the H(u, v) points (e.g. re-randomization, benches).
    Returns (u_jac [N], g_jac [N], w_jac [N])."""
    u, g = encrypt_begin_batch(pk_jac, r_plain)
    w = encrypt_finish_batch(huv_jac, r_plain)
    return u, g, w


def encrypt_batch_pallas(pk_aff, r_plain, huv_aff):
    """`encrypt_batch` on the Pallas per-lane ladders (255-bit, window=4)
    — the TPU fast path for the three scalar-muls of
    `/root/reference/src/lib.rs:128-137`.

    pk_aff / huv_aff: G1 / G2 affine pytrees [N] (broadcast a shared key
    to the batch).  Returns (u_jac [N], g_jac [N], w_jac [N]).
    """
    from ..device import pallas_curve as pcv

    n = r_plain.shape[0]
    gen = _gen_g1((n,))
    u = pcv.scalar_mul_pallas(dcv.G1, gen, r_plain)
    g = pcv.scalar_mul_pallas(dcv.G1, pk_aff, r_plain)
    w = pcv.scalar_mul_pallas(dcv.G2, huv_aff, r_plain)
    return u, g, w


# ---------------------------------------------------------------------------
# Verify (batched 2-pair product checks)
# ---------------------------------------------------------------------------

def _pair2(a_aff, b_aff):
    """Stack two equally-batched affine pytrees along a new leading axis."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.stack([x, y], axis=0), a_aff, b_aff
    )


def verify_batch(pk_aff, h_aff, sig_aff):
    """bool[N]: e(pk_i, H_i) == e(G1, sig_i) per lane.

    Inputs: pk_aff G1 affine pytree [N], h_aff / sig_aff G2 affine pytrees
    [N]. One fused multi-Miller (pair axis 2) + one final exponentiation —
    the standard e(pk,H)·e(−G1,sig)==1 trick, vs the reference's two full
    pairings (`/root/reference/src/lib.rs:108-110`).
    """
    n = pk_aff[2].shape[0]
    neg_gen = _neg_gen_g1((n,))
    p = _pair2(pk_aff, neg_gen)
    q = _pair2(h_aff, sig_aff)
    return dpr.pairing_check_fused(p, q)


def verify_batch_pallas(pk_aff, h_aff, sig_aff):
    """`verify_batch` through the Pallas megakernel pipeline
    (`device/pairing.pairing_check_pallas`): one jit-able program of ~560
    in-program tower-kernel dispatches — the TPU fast path (compiles in
    ~a minute cold vs tens of minutes for the HLO-level fused program)."""
    n = pk_aff[2].shape[0]
    p = _pair2(pk_aff, _neg_gen_g1((n,)))
    q = _pair2(h_aff, sig_aff)
    return dpr.pairing_check_pallas(p, q)


_jit_vbp = None
_AOT_DIR = None


def set_aot_cache(path) -> None:
    """Enable the AOT executable cache (`utils/aotcache`) for this
    module's big jitted programs: warm processes deserialize compiled
    executables from `path` instead of re-tracing the ~13 MB pipeline
    module (~2-3 min saved — VERDICT r3 #8).  None disables."""
    global _AOT_DIR, _jit_vbp, _jit_rlc_pallas_agg
    _AOT_DIR = path
    _jit_vbp = None
    _jit_rlc_pallas_agg = None


def verify_batch_pallas_jit(pk_aff, h_aff, sig_aff):
    """Module-level jitted `verify_batch_pallas`: every caller (bench
    per-pair stage, RLC aggregate check) shares ONE executable per shape —
    in-process reuse and a single persistent-cache entry (AOT-cached on
    disk when `set_aot_cache` is active)."""
    global _jit_vbp
    if _AOT_DIR is None:
        if not callable(_jit_vbp):
            _jit_vbp = jax.jit(verify_batch_pallas)
        return _jit_vbp(pk_aff, h_aff, sig_aff)
    if not isinstance(_jit_vbp, dict):
        _jit_vbp = {}
    n = pk_aff[2].shape[0]
    if n not in _jit_vbp:
        from ..utils import aotcache

        _jit_vbp[n] = aotcache.cached_compile(
            verify_batch_pallas, (pk_aff, h_aff, sig_aff),
            f"vbp{n}", _AOT_DIR,
        )
    return _jit_vbp[n](pk_aff, h_aff, sig_aff)


def verify_with_hash_batch(pk_aff, msgs, sig_aff, attempts: int = 8):
    """Batched verification of N signatures over N DISTINCT messages,
    INCLUDING the message hash — the reference's full per-share `verify`
    call stack (`/root/reference/src/lib.rs:177-179` → `:691-694`)
    TPU-bound end to end: device `hash_g2` sampling chain
    (`device/hash2g2.py`) feeding the fused 2-pair product checks.

    pk_aff: G1 affine pytree [N]; msgs: list of N bytes; sig_aff: G2
    affine pytree [N].  Returns bool[N] (host numpy).  The ≈2⁻ᴬ tail of
    lanes whose device hash attempt/word budget ran out is recomputed on
    the host oracle and spliced in — results are exact for every lane,
    not just the device-resolved ones.  For N signatures on ONE message
    use `verify_sig_shares_rlc` instead (amortizes the pairings too).

    Off-TPU the pairing checks route through the stepwise XLA pipeline
    (the Pallas megakernels need real Mosaic): same results, correctness
    path only.
    """
    import numpy as np

    from .. import hashing
    from ..device import hash2g2

    n = len(msgs)
    assert pk_aff[2].shape[0] == n == sig_aff[2].shape[0]
    digests = np.stack([
        np.frombuffer(hashing.sha3_256(bytes(m)), dtype="<u4")
        for m in msgs
    ])
    jac, ok = hash2g2.hash_g2_device(digests, attempts=attempts)
    h_aff = jacobian_to_affine(dcv.G2, jac)
    okh = np.asarray(jax.device_get(ok))
    if not okh.all():
        # splice host-oracle points into the failed lanes
        bad = np.nonzero(~okh)[0]
        fb = dpr.g2_affine_from_host(
            [hashing.hash_g2(bytes(msgs[i])).v for i in bad]
        )
        idx = jnp.asarray(bad)
        h_aff = (
            (h_aff[0][0].at[idx].set(fb[0][0]),
             h_aff[0][1].at[idx].set(fb[0][1])),
            (h_aff[1][0].at[idx].set(fb[1][0]),
             h_aff[1][1].at[idx].set(fb[1][1])),
            h_aff[2].at[idx].set(fb[2]),
        )
    check = (verify_batch_pallas_jit if mont.use_pallas()
             else verify_batch_stepwise)
    return np.asarray(jax.device_get(check(pk_aff, h_aff, sig_aff)))


def verify_batch_stepwise(pk_aff, h_aff, sig_aff):
    """`verify_batch` driven over small jitted step kernels (host-driven
    Miller loop + phase-wise final exponentiation): same results, a fraction
    of the compile latency.  Use on cold-start paths; the fused form wins
    once compiled."""
    n = pk_aff[2].shape[0]
    p = _pair2(pk_aff, _neg_gen_g1((n,)))
    q = _pair2(h_aff, sig_aff)
    return dpr.pairing_check(p, q)


def verify_sig_shares_rlc(pk_aff, h_jac, sig_aff, r_plain):
    """Probabilistic batch verification of N signature shares on ONE message:
    e(Σ rᵢ·pkᵢ, H) == e(G1, Σ rᵢ·sigᵢ) with random small exponents rᵢ.

    The standard small-exponent batch-verification trick: if any share is
    invalid the check fails except with probability 2⁻ᵇ (b = bit length of
    the rᵢ; use ≥64 bits drawn from a PRF the prover cannot predict).  This
    is the TPU-native throughput path for the threshold protocol's dominant
    verification pattern — all N share signatures are over the *same*
    message hash (`/root/reference/src/lib.rs:177-179` called in a loop) —
    trading 2N pairings for two 64-bit MSMs and ONE 2-pair product check.

    pk_aff: G1 affine pytree [N]; h_jac: the shared hash point as a G2
    Jacobian pytree (unbatched); sig_aff: G2 affine pytree [N];
    r_plain: uint32[N, 16] canonical Fr limbs with only low 64 bits set.
    Returns bool[] (scalar): True iff the aggregate check passes.
    """
    p, q = _rlc_aggregate_pairs(pk_aff, h_jac, sig_aff, r_plain)
    check = (
        dpr.pairing_check_pallas if mont.use_pallas()
        else dpr.pairing_check_fused
    )
    return check(p, q)[0]


_jit_rlc_aggregate = None
_jit_rlc_pallas_agg = None


def verify_sig_shares_rlc_pallas(pk_aff, h_jac, sig_aff, r_plain,
                                 check_batch: int = 512,
                                 msm: str = "shared"):
    """`verify_sig_shares_rlc` with BOTH 64-bit MSMs on Pallas megakernels
    and the single aggregate check run through `verify_batch_pallas` at
    `check_batch` replicated lanes — the exact jitted function+shapes of
    the per-pair fast path, so a warmed process (or persistent cache)
    pays ZERO extra compile for the check.

    msm="shared" (default): `pallas_curve.msm_pallas_shared` — shared-
    window Horner accumulation, ~2× the r3 ladder's throughput (tables in
    Pallas, no per-lane doublings).  msm="ladder": the r3 per-lane w=4
    scan (`msm_pallas`), kept for comparison benches.

    This is the TPU throughput path for the reference's dominant pattern
    (N same-message share verifies, `/root/reference/src/lib.rs:177-179`).
    """
    global _jit_rlc_pallas_agg
    key = (msm, r_plain.shape[0] if _AOT_DIR is not None else None)
    if _jit_rlc_pallas_agg is None:
        _jit_rlc_pallas_agg = {}
    if key not in _jit_rlc_pallas_agg:
        from ..device import pallas_curve as pcv

        if msm == "shared":
            def agg(pk_aff, sig_aff, r_plain):
                apk = pcv.msm_pallas_shared(dcv.G1, pk_aff, r_plain,
                                            nbits=64)
                asg = pcv.msm_pallas_shared(dcv.G2, sig_aff, r_plain,
                                            nbits=64)
                return (
                    jacobian_to_affine(dcv.G1, apk),
                    jacobian_to_affine(dcv.G2, asg),
                )
        else:
            def agg(pk_aff, sig_aff, r_plain):
                apk = pcv.msm_pallas(dcv.G1, pk_aff, r_plain, nbits=64,
                                     window=4)
                asg = pcv.msm_pallas(dcv.G2, sig_aff, r_plain, nbits=64,
                                     window=4)
                return (
                    jacobian_to_affine(dcv.G1, apk),
                    jacobian_to_affine(dcv.G2, asg),
                )

        if _AOT_DIR is not None:
            from ..utils import aotcache

            _jit_rlc_pallas_agg[key] = aotcache.cached_compile(
                agg, (pk_aff, sig_aff, r_plain),
                f"rlcagg-{msm}{r_plain.shape[0]}", _AOT_DIR,
            )
        else:
            _jit_rlc_pallas_agg[key] = jax.jit(agg)
    pk_a, sg_a = _jit_rlc_pallas_agg[key](pk_aff, sig_aff, r_plain)

    h1 = jax.tree_util.tree_map(
        lambda a: a if a.ndim == 2 else a[None], h_jac
    )
    h_a = jacobian_to_affine(dcv.G2, h1)

    def bc(tree):
        def one(a):
            if a.ndim and a.shape[0] == 1:  # [1, 24] / [1] batched leaves
                return jnp.broadcast_to(a, (check_batch,) + a.shape[1:])
            return jnp.broadcast_to(a, (check_batch,) + a.shape)

        return jax.tree_util.tree_map(one, tree)

    ok = verify_batch_pallas_jit(bc(pk_a), bc(h_a), bc(sg_a))
    return ok[0]


def verify_sig_shares_rlc_stepwise(pk_aff, h_jac, sig_aff, r_plain):
    """`verify_sig_shares_rlc` with the two MSMs as ONE jit program and the
    single aggregate 2-pair check through the stepwise pairing driver — the
    compile-latency-bounded form (the N-share MSM amortizes the stepwise
    pairing's per-dispatch cost, so this is also the bench's RLC path)."""
    global _jit_rlc_aggregate
    if _jit_rlc_aggregate is None:
        _jit_rlc_aggregate = jax.jit(_rlc_aggregate_pairs)
    p, q = _jit_rlc_aggregate(pk_aff, h_jac, sig_aff, r_plain)
    return dpr.pairing_check(p, q)[0]


def _rlc_aggregate_pairs(pk_aff, h_jac, sig_aff, r_plain):
    """(Σ rᵢ·pkᵢ, −G1) × (H, Σ rᵢ·sigᵢ) as [2]-pair affine pytrees."""
    pk_jac = affine_to_jacobian(dcv.G1, pk_aff)
    sig_jac = affine_to_jacobian(dcv.G2, sig_aff)
    agg_pk = dcv.G1.msm_scalarwise(pk_jac, r_plain, nbits=64)
    agg_sig = dcv.G2.msm_scalarwise(sig_jac, r_plain, nbits=64)
    pk1 = jax.tree_util.tree_map(lambda a: a[None], agg_pk)
    sg1 = jax.tree_util.tree_map(lambda a: a[None], agg_sig)
    pk_a = jacobian_to_affine(dcv.G1, pk1)
    sig_a = jacobian_to_affine(dcv.G2, sg1)
    # accept the shared hash point unbatched ([24]-leaves) or as a [1]-batch
    h1 = jax.tree_util.tree_map(
        lambda a: a if a.ndim == 2 else a[None], h_jac
    )
    h_a = jacobian_to_affine(dcv.G2, h1)
    p = _pair2(pk_a, _neg_gen_g1((1,)))
    q = _pair2(h_a, sig_a)
    return p, q


def rlc_exponents(n: int, seed: bytes, *trees, pk_aff=None, sig_aff=None,
                  h_jac=None, on_device: bool = True):
    """Deterministic 64-bit batch-verification exponents, bound to the
    verification transcript.

    Derived with ChaCha20 keyed by SHA3-256(seed ‖ n ‖ transcript), where
    the transcript absorbs the limb bytes of every point pytree passed via
    `pk_aff` / `sig_aff` / `h_jac` (or positionally).  Binding the
    exponents to the shares being verified means a malicious share-holder
    cannot predict them even for a public/reused seed: any change to any
    point changes every exponent (ADVICE r2: a predictable seed alone let
    crafted invalid shares cancel in the aggregate).  Callers should still
    pass fresh randomness as `seed` for defense in depth.

    Returns uint32[n, 16] canonical Fr limbs (low 64 bits populated, never
    zero: a zero exponent would drop a share from the check entirely).

    Transcript absorption is a chunk-digest tree: each leaf's byte stream
    splits into 2176-byte chunks; chunks of device-resident uint32 leaves
    hash ON DEVICE (one VPU lane per chunk, `device/keccak.py` — the
    point limbs already live there, so nothing big crosses the link),
    the rest host-side, and the final digest absorbs the ordered chunk-
    digest list.  The r3 single-stream host hash serialized ~40 MB of
    transcript at ~6 µs/share on this host's two cores — as large as the
    whole MSM (VERDICT r3 #1b).
    """
    import numpy as _np

    from .. import hashing
    from ..device import keccak as dkeccak
    from ..utils.rng import ChaChaRng

    absorb = [
        t for t in list(trees) + [pk_aff, sig_aff, h_jac] if t is not None
    ]
    chunk_digests = []
    if absorb:
        chunk_digests = dkeccak.transcript_digests(
            jax.tree_util.tree_leaves(absorb)
        )
    material = (
        bytes(seed)
        + n.to_bytes(8, "little")
        + len(chunk_digests).to_bytes(8, "little")
        + b"".join(chunk_digests)
    )
    digest = hashing.sha3_256(material)

    if on_device:
        # expand the stream on the VPU: only the 32-byte digest crosses
        # the device link (the host-side [N, 16] upload cost ~100 ms at
        # N=16k through the tunnel — measured r4); bit-exact with the
        # host path below (tested).
        from ..device import chacha as dchacha

        key = jnp.asarray(_np.frombuffer(digest, dtype="<u4"))
        return dchacha.rlc_exponent_limbs(key, n)

    from ..native import chacha20_words

    words = chacha20_words(digest, 0, 2 * n)
    if words is not None:  # native bulk stream (the fast path)
        w = _np.asarray(words, _np.uint64)
        v = w[0::2] | (w[1::2] << _np.uint64(32))
    else:  # pure-Python fallback, same stream order
        rng = ChaChaRng.from_seed(digest)
        v = _np.asarray([rng.next_u64() for _ in range(n)], _np.uint64)
    # a zero exponent would drop its share from the check; substitute 1
    # (probability n·2⁻⁶⁴ — deterministic and path-independent)
    v = _np.where(v == 0, _np.uint64(1), v)
    out = _np.zeros((n, 16), _np.uint32)
    for limb in range(4):
        out[:, limb] = ((v >> _np.uint64(16 * limb))
                        & _np.uint64(0xFFFF)).astype(_np.uint32)
    return jnp.asarray(out)


def verify_dec_share_batch(share_aff, huv_aff, pk_aff, w_aff):
    """bool[N]: e(share_i, H(u,v)_i) == e(pk_i, w_i) per lane
    (`/root/reference/src/lib.rs:182-186`)."""
    p = _pair2(share_aff, _neg_aff(dcv.G1, pk_aff))
    q = _pair2(huv_aff, w_aff)
    return dpr.pairing_check_fused(p, q)


def ciphertext_verify_batch(u_aff, w_aff, huv_aff):
    """bool[N]: e(G1, w_i) == e(u_i, H(u,v)_i) — the CCA gate
    (`/root/reference/src/lib.rs:508-513`)."""
    n = u_aff[2].shape[0]
    gen = _gen_g1((n,))
    p = _pair2(gen, _neg_aff(dcv.G1, u_aff))
    q = _pair2(w_aff, huv_aff)
    return dpr.pairing_check_fused(p, q)


def _gen_g1(shape):
    f = dcv.G1.f
    gx, gy = dcv.G1.gen_affine_host
    return (
        f.from_host(gx, shape),
        f.from_host(gy, shape),
        jnp.zeros(shape, bool),
    )


def _neg_gen_g1(shape):
    x, y, inf = _gen_g1(shape)
    return (x, dcv.G1.f.neg(y), inf)


def _neg_aff(curve, aff):
    x, y, inf = aff
    return (x, curve.f.neg(y), inf)


# ---------------------------------------------------------------------------
# Combine (in-exponent Lagrange at x=0)
# ---------------------------------------------------------------------------

def combine_batch(curve: dcv.DeviceCurve, shares_jac, xs_mont,
                  path: str = "scalarwise"):
    """Σ_i λ_i · share_i with λ from the batch's x coordinates.

    curve: dcv.G2 for signature shares, dcv.G1 for decryption shares.
    shares_jac: batched Jacobian pytree [N]; xs_mont: uint32[N, 16]
    Montgomery Fr limbs (already the reference's x = i+1 convention,
    `/root/reference/src/lib.rs:769-773`).
    Returns (point pytree [], ok[]) — ok False on duplicate/zero x
    (the reference's DuplicateEntry, `/root/reference/src/lib.rs:763`).

    `path` selects the MSM structure (ADVICE r3: this is a routing choice,
    not a window width):

    * "scalarwise" (default): N independent bit-scan ladders + one
      scan-fold reduction — the conservative path (compiles in ~2 min at
      any N; windowed table builds would cost ~28 s of XLA:TPU compile
      per unrolled point-op body, tens of minutes total).
    * "bitscan": one shared accumulator over `curve.msm` — the CPU dryrun
      path, where that graph shape is proven to compile in minutes.
    * "pallas": the shared-window Horner Pallas MSM
      (`pallas_curve.msm_pallas_shared`, 255-bit scalars → 85 base-8
      windows) — the r4 TPU fast path: one complete add per share per
      window instead of 255 doublings per lane (~20× at t+1=4096,
      measured in benches/combine_large.py).
    """
    lam_mont, ok = frops.lagrange_coeffs_at_zero(xs_mont)
    lam_plain = frops.fr_to_plain(lam_mont)
    if path == "bitscan":
        out = curve.msm(shares_jac, lam_plain, window=1)
    elif path == "scalarwise":
        out = curve.msm_scalarwise(shares_jac, lam_plain, window=1)
    elif path == "pallas":
        from ..device import pallas_curve as pcv

        aff = jacobian_to_affine(curve, shares_jac)
        out = pcv.msm_pallas_shared(curve, aff, lam_plain, nbits=255,
                                    window=3)
    else:
        raise ValueError(f"unknown combine path {path!r}")
    return out, ok


_jit_lagrange_plain = None


def combine_batch_stepwise(curve: dcv.DeviceCurve, shares_jac, xs_mont):
    """`combine_batch` with the MSM driven bit-by-bit over a small jitted
    kernel (compile-latency escape hatch, cf. `msm_stepwise`)."""
    global _jit_lagrange_plain
    if _jit_lagrange_plain is None:
        import jax as _jax

        @_jax.jit
        def _lp(xs):
            lam, ok = frops.lagrange_coeffs_at_zero(xs)
            return frops.fr_to_plain(lam), ok

        _jit_lagrange_plain = _lp
    lam_plain, ok = _jit_lagrange_plain(xs_mont)
    out = curve.msm_stepwise(shares_jac, lam_plain)
    return out, ok


# ---------------------------------------------------------------------------
# Commitments / keygen
# ---------------------------------------------------------------------------

def commit_batch(coeffs_plain):
    """Feldman commitment: G1·c_k for every coefficient.

    coeffs_plain: uint32[D+1, 16] canonical plain Fr limbs. Returns a
    batched G1 Jacobian pytree [D+1]. (The reference's per-coefficient
    fixed-base loop, `/root/reference/src/poly.rs:372-377`.)
    """
    n = coeffs_plain.shape[0]
    base = dcv.G1.generator((n,))
    return dcv.G1.scalar_mul(base, coeffs_plain)


# ---------------------------------------------------------------------------
# DKG: batched bivariate commitments / rows (VERDICT r3 #7 — before round 4
# the whole BivarPoly/BivarCommitment flow ran as nested host loops)
# ---------------------------------------------------------------------------

def powers_batch(xs_mont, degree: int):
    """[x⁰ .. x^degree] per lane: uint32[M, 16] → [M, degree+1, 16]
    (Montgomery form; the batched `/root/reference/src/poly.rs:735-744`)."""
    m = xs_mont.shape[0]
    one = jnp.broadcast_to(mont.one(FR), (m, FR.L))
    if degree == 0:
        return one[:, None]

    def body(acc, _):
        nxt = mont.mul(FR, acc, xs_mont)
        return nxt, nxt

    _, rest = jax.lax.scan(body, one, None, length=degree)
    return jnp.concatenate([one[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)


def bivar_commit_batch(coeffs_plain):
    """`BivarPoly.commitment` as ONE batched fixed-base G1 scalar-mul over
    the whole triangular coefficient vector — the DKG dealer hot loop the
    reference runs as (f+1)(f+2)/2 sequential muls
    (`/root/reference/src/poly.rs:626-632`).

    coeffs_plain: uint32[npos, 16] canonical plain Fr limbs in triangular
    `coeff_pos` order.  Returns a batched G1 Jacobian pytree [npos].
    """
    return commit_batch(coeffs_plain)


def _fold_axis1(curve, pts):
    moved = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 1, 0), pts)
    return dcv._tree_sum(curve, moved)


def bivar_row_batch(coeffs_mont, xs_mont, degree: int):
    """Row polynomials of a symmetric bivariate poly for a batch of x's:
    out[m, i] = Σ_j c[pos(i, j)]·x_m^j — the dealer's per-node row dealing
    (`/root/reference/src/poly.rs:607-623`), all nodes at once.

    coeffs_mont: uint32[npos, 16] Montgomery limbs (triangular order);
    xs_mont: uint32[M, 16].  Returns uint32[M, degree+1, 16] (Montgomery).
    """
    from ..poly import coeff_pos

    xpow = powers_batch(xs_mont, degree)  # [M, d+1, 16]
    rows = []
    for i in range(degree + 1):
        idx = jnp.asarray([coeff_pos(i, j) for j in range(degree + 1)])
        terms = mont.mul(FR, coeffs_mont[idx][None], xpow)  # [M, d+1, 16]
        acc = terms[:, 0]
        for j in range(1, degree + 1):
            acc = mont.add(FR, acc, terms[:, j])
        rows.append(acc)
    return jnp.stack(rows, axis=1)


def bivar_commit_row_batch(commit_jac, xs_mont, degree: int):
    """Row commitments from a BivarCommitment for a batch of x's:
    out[m, i] = Σ_j C[pos(i, j)]·x_m^j — the in-exponent form of
    `bivar_row_batch` (`/root/reference/src/poly.rs:693-726`), used by
    every node to check its dealt row.

    commit_jac: batched G1 Jacobian pytree [npos] (triangular order).
    Returns a G1 Jacobian pytree [M, degree+1].
    """
    from ..poly import coeff_pos

    m = xs_mont.shape[0]
    xpow_plain = frops.fr_to_plain(powers_batch(xs_mont, degree))
    outs = []
    for i in range(degree + 1):
        idx = jnp.asarray([coeff_pos(i, j) for j in range(degree + 1)])
        pts = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[idx][None], (m,) + a[idx].shape),
            commit_jac,
        )
        prods = dcv.G1.scalar_mul(pts, xpow_plain)  # [M, d+1]
        outs.append(_fold_axis1(dcv.G1, prods))
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls, axis=1), *outs)


def bivar_commit_eval_batch(commit_jac, xs_mont, ys_mont, degree: int):
    """`BivarCommitment.evaluate(x_m, y_m)` batched over M pairs:
    Σ_{i,j} C[pos(i, j)]·x^i·y^j (`/root/reference/src/poly.rs:589-604`
    in the exponent) — the per-value DKG verification
    `commit.evaluate(m, s) == val·G1`, whole batches at a time.

    Returns a G1 Jacobian pytree [M].
    """
    from ..poly import coeff_pos

    xpow = powers_batch(xs_mont, degree)
    ypow = powers_batch(ys_mont, degree)
    npos = (degree + 1) * (degree + 2) // 2
    scal = [None] * npos
    for i in range(degree + 1):
        for j in range(i, degree + 1):
            s = mont.mul(FR, xpow[:, i], ypow[:, j])
            if i != j:  # symmetric coefficient appears for (i,j) and (j,i)
                s = mont.add(FR, s, mont.mul(FR, xpow[:, j], ypow[:, i]))
            scal[coeff_pos(i, j)] = s
    m = xs_mont.shape[0]
    scal_plain = frops.fr_to_plain(jnp.stack(scal, axis=1))  # [M, npos, 16]
    pts = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (m,) + a.shape), commit_jac
    )
    prods = dcv.G1.scalar_mul(pts, scal_plain)  # [M, npos]
    return _fold_axis1(dcv.G1, prods)


def derive_shares(coeffs_mont, xs_mont):
    """Keygen: f(x_i) for the whole share batch (one batched Horner).

    Mirrors `SecretKeySet::secret_key_share`
    (`/root/reference/src/lib.rs:670-673`) over all N shares at once.
    Returns Montgomery-form Fr limbs [N, 16].
    """
    return frops.poly_eval(coeffs_mont, xs_mont)
