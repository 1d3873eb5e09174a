"""Device-side `hash_g2`: the reference's message→G2 sampling chain,
batched over distinct messages (VERDICT r4 #4 — the one reference call
stack that previously had no TPU-native equivalent).

The reference hash (`/root/reference/src/lib.rs:691-694` → `util.rs:3-9`)
is G2::random(ChaChaRng(sha3_256(msg))) — a *rejection-sampling* chain
(`host/sampling.py`):

    loop:
        x  = Fq2::random(rng)        # per Fq limb draw: 6×u64, shave 3
                                     # top bits, retry while ≥ p
        g  = rng.next_u32() odd      # the `greatest` bit
        y² = x³ + 4(1+u); retry loop if non-residue
        P  = (x, ±y) · cofactor

The control flow is data-dependent, but two observations make a
fixed-trip device form possible:

* stream consumption per OUTER attempt is QR-independent — x and the
  greatest word are always fully drawn before the residue test — so
  candidate extraction is a pure function of the ChaCha word stream;
* the limb-rejection walk is word-sequential, so ONE `lax.scan` over a
  fixed number of stream words extracts the first A (x, greatest)
  candidate tuples per lane exactly as the host walk would.

Pipeline (everything after the 32-byte digests stays on device):

  1. per-lane ChaCha20 streams (`_chacha_words_multikey`, the rand_chacha
     0.2 word order of `utils/rng.ChaChaRng`),
  2. word-scan candidate extraction (`extract_candidates`),
  3. batched residue tests for all A candidates at once: a ∈ Fq2 is a
     square iff norm(a) = c0²+c1² is a square in Fq — ONE Fq Euler
     exponentiation per candidate (`mont.pow_fixed`, in-kernel chain on
     the Pallas path) instead of an Fq2 one,
  4. Fq2 square root of the first accepted candidate (Adj–Rodríguez
     alg. 9, mirroring `host/tower.fq2_sqrt`), root normalized by the
     `greatest` draw exactly like `host/curve.get_point_from_x`,
  5. cofactor multiplication by the literal H2 (507 bits; bit-parity
     forbids the fast-cofactor endomorphism trick, which lands in a
     different representative) — one windowed ladder over H2's static
     base-16 digits on the Pallas path
     (`pallas_curve.scalar_mul_fixed_pallas`), the 255-bit-limb split
     c = c0 + 2^254·c1 across three chained ladders on the XLA path,
  6. lanes whose A attempts all failed (≈2⁻ᴬ per lane) or whose word
     budget ran out report `ok=False`; `threshold_crypto_tpu.hashing.
     hash_g2_batch` recomputes those few on the host oracle.

Bit-exact with `hashing.hash_g2` per message (tests/test_hash2g2.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..host.params import H2, P
from . import curve as dcv
from . import mont
from . import tower as tw
from .mont import FQ

# P as 12 little-endian u32 words (the draw's 6×u64 limb layout).
_P_WORDS = np.array(
    [(P >> (32 * i)) & 0xFFFFFFFF for i in range(12)], np.uint32
)
# FQ_SHAVE_MASK = 2^381-1: the top u32 word keeps 381-352 = 29 bits.
_TOP_MASK = np.uint32((1 << 29) - 1)

DEFAULT_ATTEMPTS = 8
# words per outer attempt: 2×(12 words / 0.813 acceptance) + 1 ≈ 30.5
DEFAULT_WORDS = 512


# ---------------------------------------------------------------------------
# Per-lane ChaCha20 word streams
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=1)
def _chacha_words_multikey(keys, n_words: int):
    """uint32[N, 8] keys -> uint32[N, n_words] ChaCha20Rng word streams.

    Same per-key stream as `chacha.chacha20_words` / `utils.rng.ChaChaRng`
    (64-bit block counter in words 12-13, stream id 0, block-major word
    order), vectorized over (lane, block) instances.
    """
    n = keys.shape[0]
    nblocks = -(-n_words // 16)
    ctr = jnp.broadcast_to(
        jnp.arange(nblocks, dtype=jnp.uint32)[None], (n, nblocks)
    )
    zeros = jnp.zeros((n, nblocks), jnp.uint32)

    def bc(v):
        return jnp.full((n, nblocks), np.uint32(v), jnp.uint32)

    consts = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
    state = [bc(v) for v in consts] + [
        jnp.broadcast_to(keys[:, i : i + 1], (n, nblocks)) for i in range(8)
    ] + [ctr, zeros, zeros, zeros]
    x = list(state)

    def rotl(v, c):
        return (v << np.uint32(c)) | (v >> np.uint32(32 - c))

    def qr(a, b, c, d):
        x[a] = x[a] + x[b]
        x[d] = rotl(x[d] ^ x[a], 16)
        x[c] = x[c] + x[d]
        x[b] = rotl(x[b] ^ x[c], 12)
        x[a] = x[a] + x[b]
        x[d] = rotl(x[d] ^ x[a], 8)
        x[c] = x[c] + x[d]
        x[b] = rotl(x[b] ^ x[c], 7)

    for _ in range(10):
        qr(0, 4, 8, 12)
        qr(1, 5, 9, 13)
        qr(2, 6, 10, 14)
        qr(3, 7, 11, 15)
        qr(0, 5, 10, 15)
        qr(1, 6, 11, 12)
        qr(2, 7, 8, 13)
        qr(3, 4, 9, 14)

    out = jnp.stack(
        [x[i] + state[i] for i in range(16)], axis=2
    )  # [N, B, 16]
    return out.reshape(n, -1)[:, :n_words]


# ---------------------------------------------------------------------------
# Candidate extraction: one scan over the word stream
# ---------------------------------------------------------------------------

def _lex_lt_p(cand):
    """cand uint32[N, 12] (LE words) < P, vectorized lexicographic."""
    lt = jnp.zeros(cand.shape[0], bool)
    eq = jnp.ones(cand.shape[0], bool)
    for j in range(11, -1, -1):
        pj = jnp.uint32(_P_WORDS[j])
        lt = lt | (eq & (cand[:, j] < pj))
        eq = eq & (cand[:, j] == pj)
    return lt


@functools.partial(jax.jit, static_argnums=(1,))
def extract_candidates(words, attempts: int = DEFAULT_ATTEMPTS):
    """Walk each lane's word stream exactly like the host sampler.

    words: uint32[N, S].  Returns (xc0, xc1, greatest, nvalid):
      xc0/xc1  uint32[N, A, 12] — accepted Fq draws (Montgomery-form
               u64-limb words, < p) for the two Fq2 components,
      greatest bool[N, A]       — the per-attempt parity draw,
      nvalid   int32[N]         — complete candidate tuples extracted
               (min(attempts_finished, A); lanes that exhausted the word
               budget mid-attempt simply count fewer).
    """
    n, s = words.shape
    A = attempts
    iota12 = jnp.arange(12, dtype=jnp.uint32)
    iotaA = jnp.arange(A, dtype=jnp.uint32)

    def body(carry, word):
        cur, widx, phase, aidx, xc0, xc1, grt = carry
        drawing = phase < 2
        completing = drawing & (widx == 11)

        cur = jnp.where(
            drawing[:, None] & (iota12[None] == widx[:, None]),
            word[:, None], cur,
        )
        cand = cur.at[:, 11].set(cur[:, 11] & _TOP_MASK)
        accept = completing & _lex_lt_p(cand)

        slot = iotaA[None] == aidx[:, None]  # [N, A]
        w0 = (accept & (phase == 0))[:, None] & slot
        w1 = (accept & (phase == 1))[:, None] & slot
        xc0 = jnp.where(w0[:, :, None], cand[:, None, :], xc0)
        xc1 = jnp.where(w1[:, :, None], cand[:, None, :], xc1)

        gstep = phase == 2
        grt = jnp.where(
            gstep[:, None] & slot, (word & 1).astype(bool)[:, None], grt
        )

        phase = jnp.where(gstep, 0, jnp.where(accept, phase + 1, phase))
        aidx = jnp.where(gstep, aidx + 1, aidx)
        widx = jnp.where(drawing, jnp.where(completing, 0, widx + 1), widx)
        return (cur, widx, phase, aidx, xc0, xc1, grt), None

    init = (
        jnp.zeros((n, 12), jnp.uint32),
        jnp.zeros(n, jnp.uint32),
        jnp.zeros(n, jnp.uint32),
        jnp.zeros(n, jnp.uint32),
        jnp.zeros((n, A, 12), jnp.uint32),
        jnp.zeros((n, A, 12), jnp.uint32),
        jnp.zeros((n, A), bool),
    )
    (cur, widx, phase, aidx, xc0, xc1, grt), _ = jax.lax.scan(
        body, init, jnp.moveaxis(words, 1, 0)
    )
    nvalid = jnp.minimum(aidx, jnp.uint32(A)).astype(jnp.int32)
    return xc0, xc1, grt, nvalid


def _words_to_limbs(w):
    """uint32[..., 12] LE draw words -> uint32[..., 24] 16-bit limbs
    (the device Montgomery layout; both use R = 2^384, so the accepted
    draw IS the device Montgomery form)."""
    lo = w & jnp.uint32(0xFFFF)
    hi = w >> jnp.uint32(16)
    return jnp.stack([lo, hi], axis=-1).reshape(w.shape[:-1] + (24,))


# ---------------------------------------------------------------------------
# Field helpers (Fq2 fixed-exponent pow, canonical compare)
# ---------------------------------------------------------------------------

def fq2_pow_fixed(a, e: int):
    """a^e in Fq2 for a fixed public exponent (MSB-first lax.scan)."""
    bits = jnp.asarray([int(b) for b in bin(e)[2:]], jnp.uint32)
    shape = a[0].shape[:-1]
    one = tw.fq2_one(shape)

    def body(acc, bit):
        acc = tw.fq2_sqr(acc)
        withm = tw.fq2_mul(acc, a)
        take = bit != 0
        return (
            jnp.where(take, withm[0], acc[0]),
            jnp.where(take, withm[1], acc[1]),
        ), None

    out, _ = jax.lax.scan(body, one, bits)
    return out


def _canonical_gt(a_plain, b_plain):
    """a > b on canonical 24×16-bit limbs (limb 0 least significant)."""
    gt = jnp.zeros(a_plain.shape[:-1], bool)
    eq = jnp.ones(a_plain.shape[:-1], bool)
    for j in range(23, -1, -1):
        gt = gt | (eq & (a_plain[..., j] > b_plain[..., j]))
        eq = eq & (a_plain[..., j] == b_plain[..., j])
    return gt


def _fq2_is_greatest(y):
    """fq2_cmp(y, -y) > 0 — pairing 0.16 ordering: c1 first, then c0,
    on CANONICAL values (`host/tower.fq2_cmp`)."""
    ny = tw.fq2_neg(y)
    one_plain = mont._const_limbs(FQ, 1)
    yp = (mont.mul(FQ, y[0], one_plain), mont.mul(FQ, y[1], one_plain))
    nyp = (mont.mul(FQ, ny[0], one_plain), mont.mul(FQ, ny[1], one_plain))
    c1_gt = _canonical_gt(yp[1], nyp[1])
    c1_eq = mont.eq(FQ, yp[1], nyp[1])
    c0_gt = _canonical_gt(yp[0], nyp[0])
    return c1_gt | (c1_eq & c0_gt)


def _const_scalar16(v: int):
    """int -> uint32[16] canonical 16-bit scalar limbs (≤256 bits)."""
    assert 0 <= v < (1 << 256)
    return jnp.asarray(
        [(v >> (16 * i)) & 0xFFFF for i in range(16)], jnp.uint32
    )


# ---------------------------------------------------------------------------
# The batched sampler
# ---------------------------------------------------------------------------

def _g2_scalar_mul(aff, k_limbs):
    """Per-lane 255-bit G2 scalar-mul: Pallas ladder on TPU, XLA path
    otherwise.  aff: ((xc0, xc1), (yc0, yc1), inf[N]); returns Jacobian."""
    if mont.use_pallas():
        from . import pallas_curve as pcv

        return pcv.scalar_mul_pallas(dcv.G2, aff, k_limbs)
    n = aff[2].shape[0]
    z = dcv.G2.f.select(
        aff[2], dcv.G2.f.zero((n,)), dcv.G2.f.one((n,))
    )
    return dcv.G2.scalar_mul((aff[0], aff[1], z), k_limbs)


@functools.partial(jax.jit, static_argnums=(1, 2))
def hash_g2_device(digests, attempts: int = DEFAULT_ATTEMPTS,
                   n_words: int = DEFAULT_WORDS):
    """Batched G2::random(ChaChaRng(digest)) on device.

    digests: uint32[N, 8] seed words (little-endian words of the 32-byte
    sha3-256 digests).  Returns (jac, ok):
      jac — G2 Jacobian pytree [N] (junk coordinates where not ok),
      ok  — bool[N]: True where the device pipeline produced the exact
            host answer; False lanes (≈2⁻ᴬ: all A candidates non-residue,
            or stream budget exhausted) need the host oracle.
    """
    n = digests.shape[0]
    A = attempts

    words = _chacha_words_multikey(digests, n_words)
    xc0_w, xc1_w, grt, nvalid = extract_candidates(words, attempts)
    xc0 = _words_to_limbs(xc0_w)  # [N, A, 24] Montgomery Fq limbs
    xc1 = _words_to_limbs(xc1_w)

    # rhs_k = x³ + b for every candidate; residue test via the Fq norm
    x = (xc0, xc1)
    x2 = tw.fq2_sqr(x)
    b = dcv.G2.f.from_host(dcv.G2.b_host, (n, A))
    rhs = tw.fq2_add(tw.fq2_mul(x2, x), b)
    norm = mont.add(
        FQ, mont.mul(FQ, rhs[0], rhs[0]), mont.mul(FQ, rhs[1], rhs[1])
    )
    euler = mont.pow_fixed(FQ, norm, (P - 1) // 2)
    is_qr = mont.eq(FQ, euler, mont.one(FQ, euler.shape[:-1])) | \
        mont.is_zero(FQ, norm)  # [N, A]; norm==0 ⟺ rhs==0 (y = 0)
    in_range = jnp.arange(A)[None, :] < nvalid[:, None]
    ok_k = is_qr & in_range

    # first accepted candidate per lane
    chosen = jnp.full((n,), A, jnp.int32)
    for k in range(A - 1, -1, -1):
        chosen = jnp.where(ok_k[:, k], k, chosen)
    found = chosen < A
    sel = jnp.arange(A)[None, :] == jnp.minimum(chosen, A - 1)[:, None]

    def pick(arr):  # [N, A, ...] -> [N, ...] one-hot gather
        shape = (n, A) + (1,) * (arr.ndim - 2)
        return jnp.sum(
            jnp.where(sel.reshape(shape), arr, jnp.zeros_like(arr)), axis=1
        )

    xs = (pick(xc0), pick(xc1))
    g = jnp.sum(jnp.where(sel, grt, False), axis=1).astype(bool)
    a = (pick(rhs[0]), pick(rhs[1]))  # y² of the chosen candidate

    # Fq2 sqrt, Adj–Rodríguez alg. 9 (branches as selects; mirrors
    # host/tower.fq2_sqrt including the alpha == -1 branch)
    a1 = fq2_pow_fixed(a, (P - 3) // 4)
    x0 = tw.fq2_mul(a1, a)
    alpha = tw.fq2_mul(a1, x0)
    minus_one = (mont.neg(FQ, mont.one(FQ, (n,))), mont.zero(FQ, (n,)))
    alpha_m1 = tw.fq2_eq(alpha, minus_one)
    y_branch_u = tw.fq2_mul((mont.zero(FQ, (n,)), mont.one(FQ, (n,))), x0)
    b_exp = fq2_pow_fixed(tw.fq2_add(tw.fq2_one((n,)), alpha), (P - 1) // 2)
    y_branch_b = tw.fq2_mul(b_exp, x0)
    y = tw.fq2_select(alpha_m1, y_branch_u, y_branch_b)

    # normalize the root by the greatest draw (host get_point_from_x)
    ny = tw.fq2_neg(y)
    y_final = tw.fq2_select(_fq2_is_greatest(y) == g, y, ny)

    # cofactor: literal H2 (507 bits), exactly pairing 0.16's
    # `scale_by_cofactor`.  On the Pallas path H2 is a static trace-time
    # int, so ONE windowed ladder over its 127 base-16 digits with a
    # single shared multiple table does it directly
    # (`pallas_curve.scalar_mul_fixed_pallas`); the XLA fallback keeps
    # the 255-bit-limb split across three chained ladders.
    inf = jnp.zeros((n,), bool)
    aff = (xs, y_final, inf)
    if mont.use_pallas():
        from . import pallas_curve as pcv

        out = pcv.scalar_mul_fixed_pallas(dcv.G2, aff, H2)
    else:
        c0 = H2 & ((1 << 254) - 1)
        c1 = H2 >> 254
        k0 = jnp.broadcast_to(_const_scalar16(c0)[None], (n, 16))
        k1 = jnp.broadcast_to(_const_scalar16(c1)[None], (n, 16))
        kq = jnp.broadcast_to(_const_scalar16(1 << 254)[None], (n, 16))

        p0 = _g2_scalar_mul(aff, k0)
        q = _g2_scalar_mul(aff, kq)  # 2^254 · P
        q_aff = _to_affine_g2(q)
        p1 = _g2_scalar_mul(q_aff, k1)
        out = dcv.G2.add(p0, p1)

    ok = found & ~dcv.G2.is_infinity(out)  # identity ⇒ host retries
    return out, ok


def _to_affine_g2(jac):
    """Batched Jacobian -> (x, y, inf) affine pytree (lazy import keeps
    device/ independent of ops/ at module load)."""
    from ..ops.threshold import jacobian_to_affine

    return jacobian_to_affine(dcv.G2, jac)
