"""TPU validation + timing for the Pallas megakernel pairing pipeline.

Checks `pairing_check_pallas` end-to-end on the device (correctness against
known-good/corrupt verification lanes) and reports compile and steady-state
times vs the stepwise path.

Usage: python benches/verify_pallas.py [--batch N] [--iters K] [--no-ref]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-ref", action="store_true",
                    help="skip the stepwise-path comparison run")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import numpy as np

    from threshold_crypto_tpu import ops
    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R

    print(f"devices: {jax.devices()}", file=sys.stderr)

    batch = args.batch
    rnd = random.Random(0xFA57)
    n_unique = min(batch, 16)
    sks = [rnd.randrange(1, R) for _ in range(n_unique)]
    hks = [rnd.randrange(1, R) for _ in range(n_unique)]
    h_host = [hcv.G2.mul(hcv.G2.generator, k) for k in hks]
    pk_host = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]
    sig_host = [hcv.G2.mul(h, s) for h, s in zip(h_host, sks)]
    # corrupt one unique signature -> known-false lanes
    bad_idx = 3 % n_unique
    sig_host[bad_idx] = hcv.G2.mul(h_host[bad_idx], 999)

    reps = (batch + n_unique - 1) // n_unique
    pk_aff = dpr.g1_affine_from_host((pk_host * reps)[:batch])
    h_aff = dpr.g2_affine_from_host((h_host * reps)[:batch])
    sig_aff = dpr.g2_affine_from_host((sig_host * reps)[:batch])
    want = np.array([(i % n_unique) != bad_idx for i in range(batch)])

    fn = jax.jit(ops.verify_batch_pallas)
    t0 = time.time()
    out = np.asarray(jax.device_get(fn(pk_aff, h_aff, sig_aff)))
    compile_s = time.time() - t0
    assert out.shape == (batch,), out.shape
    assert (out == want).all(), (
        f"pallas mismatch: got {out[:16]} want {want[:16]}"
    )
    print(f"pallas correctness OK  compile+first-run={compile_s:.1f}s",
          file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        np.asarray(jax.device_get(fn(pk_aff, h_aff, sig_aff)))
        times.append(time.time() - t0)
    best = min(times)
    print(f"pallas: batch={batch} best={best:.4f}s "
          f"-> {batch / best:.1f} verify/s", file=sys.stderr)

    if not args.no_ref:
        t0 = time.time()
        ref = np.asarray(
            jax.device_get(
                ops.verify_batch_stepwise(pk_aff, h_aff, sig_aff)
            )
        )
        ref_s = time.time() - t0
        assert (ref == want).all()
        print(f"stepwise agrees; first-run={ref_s:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
