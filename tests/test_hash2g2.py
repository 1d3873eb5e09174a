"""Device hash_g2 vs the host oracle (bit-parity of the full sampling
chain: ChaCha stream walk, limb rejection, residue test, sqrt root
normalization, literal-cofactor multiplication)."""

import numpy as np
import pytest

from threshold_crypto_tpu import hashing
from threshold_crypto_tpu.device import hash2g2
from threshold_crypto_tpu.utils.rng import ChaChaRng


def test_extract_candidates_matches_host_walk():
    """The word-scan yields exactly the host sampler's draw sequence."""
    from threshold_crypto_tpu.host.params import FQ_SHAVE_MASK, P

    digests = [hashing.sha3_256(b"walk-%d" % i) for i in range(3)]
    keys = np.stack([np.frombuffer(d, dtype="<u4") for d in digests])
    words = np.asarray(hash2g2._chacha_words_multikey(keys, 256))
    xc0, xc1, grt, nvalid = (
        np.asarray(v) for v in hash2g2.extract_candidates(words, 4)
    )

    for lane, d in enumerate(digests):
        rng = ChaChaRng.from_seed(d)
        consumed = 0

        def next_u32():
            nonlocal consumed
            consumed += 1
            return rng.next_u32()

        def next_u64():
            lo = next_u32()
            return lo | (next_u32() << 32)

        def draw_fq():
            # replicate host/sampling.fq_random word-for-word
            while True:
                limbs = 0
                for i in range(6):
                    limbs |= next_u64() << (64 * i)
                limbs &= FQ_SHAVE_MASK
                if limbs < P:
                    return limbs

        k = 0
        while k < 4:
            c0 = draw_fq()
            c1 = draw_fq()
            g = next_u32() % 2 != 0
            if consumed > 256:
                break  # device walk ran out of words mid-attempt
            got0 = sum(int(w) << (32 * i) for i, w in enumerate(xc0[lane, k]))
            got1 = sum(int(w) << (32 * i) for i, w in enumerate(xc1[lane, k]))
            assert got0 == c0 and got1 == c1, (lane, k)
            assert bool(grt[lane, k]) == g, (lane, k)
            k += 1
        assert nvalid[lane] == k


@pytest.mark.slow  # sqrt/ladder graphs: minutes of XLA:CPU compile
def test_hash_g2_batch_parity():
    """End-to-end device pipeline == host `hash_g2` per message."""
    msgs = [b"parity-%d" % i for i in range(3)]
    got = hashing.hash_g2_batch(msgs)
    for g, m in zip(got, msgs):
        assert g.to_compressed() == hashing.hash_g2(m).to_compressed(), m


@pytest.mark.slow  # XLA:CPU compile of the hash + stepwise verify chains
def test_verify_with_hash_batch():
    """Public distinct-message batched verify (`ops.verify_with_hash_
    batch`, the reference's full per-share verify stack): good sigs
    pass, swapped sigs fail; attempts=1 forces host-oracle splice lanes
    (~half the batch), covering the fallback path."""
    import random

    from threshold_crypto_tpu import ops
    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R

    rnd = random.Random(0xBEEF)
    msgs = [b"vwh-%d" % i for i in range(4)]
    sks = [rnd.randrange(1, R) for _ in msgs]
    pk = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]
    hs = [hashing.hash_g2(m).v for m in msgs]
    sig = [hcv.G2.mul(h, s) for h, s in zip(hs, sks)]
    pk_aff = dpr.g1_affine_from_host(pk)

    v = ops.verify_with_hash_batch(
        pk_aff, msgs, dpr.g2_affine_from_host(sig), attempts=1
    )
    assert v.all()

    sig2 = [sig[1], sig[0]] + sig[2:]
    v2 = ops.verify_with_hash_batch(
        pk_aff, msgs, dpr.g2_affine_from_host(sig2), attempts=1
    )
    assert not v2[0] and not v2[1] and v2[2:].all()
