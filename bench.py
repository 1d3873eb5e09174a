"""Headline benchmark: batched BLS share-verifications per second per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is the north-star op (BASELINE.md): one share verification =
one fused 2-pair product check e(pk, H)·e(−G1, sig) == 1 per lane, batched.
`vs_baseline` is value / 1e5 (the ≥1e5 verifies/s/chip build target —
the reference publishes no numbers of its own, BASELINE.md).

Usage: python bench.py [--batch N] [--iters K] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="verification batch size (0 = auto per platform)")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import numpy as np

    platform = jax.devices()[0].platform
    batch = args.batch or (256 if platform == "tpu" else 16)

    from threshold_crypto_tpu import ops
    from threshold_crypto_tpu.device import curve as dcv
    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R

    # Deterministic batch: distinct keys, distinct messages (hash points).
    rnd = random.Random(0xBE7C)
    n_unique = min(batch, 32)  # host-side point gen is slow; tile to batch
    sks = [rnd.randrange(1, R) for _ in range(n_unique)]
    hks = [rnd.randrange(1, R) for _ in range(n_unique)]
    h_host = [hcv.G2.mul(hcv.G2.generator, k) for k in hks]
    pk_host = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]
    sig_host = [hcv.G2.mul(h, s) for h, s in zip(h_host, sks)]

    reps = (batch + n_unique - 1) // n_unique
    pk_aff = dpr.g1_affine_from_host((pk_host * reps)[:batch])
    h_aff = dpr.g2_affine_from_host((h_host * reps)[:batch])
    sig_aff = dpr.g2_affine_from_host((sig_host * reps)[:batch])

    fn = jax.jit(ops.verify_batch)

    t0 = time.time()
    out = jax.block_until_ready(fn(pk_aff, h_aff, sig_aff))
    compile_s = time.time() - t0
    ok = np.asarray(out)
    assert ok.all(), f"verification batch failed: {ok[:8]}..."

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        jax.block_until_ready(fn(pk_aff, h_aff, sig_aff))
        times.append(time.time() - t0)
    best = min(times)
    value = batch / best

    print(json.dumps({
        "metric": "bls_share_verifications_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "verify/s",
        "vs_baseline": round(value / 1e5, 4),
    }))
    print(
        f"# platform={platform} batch={batch} best={best:.4f}s "
        f"compile={compile_s:.1f}s iters={args.iters}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
