"""Headline benchmark: batched BLS share-verifications per second per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The metric is the north-star op (BASELINE.md): one share verification =
one fused 2-pair product check e(pk, H)·e(−G1, sig) == 1 per lane, batched.
`vs_baseline` is value / 1e5 (the ≥1e5 verifies/s/chip build target —
the reference publishes no numbers of its own, BASELINE.md).

Execution paths over identical math (tests assert they agree):

* pallas (default on TPU): the megakernel pipeline — one jit program of
  ~560 in-program Pallas tower-kernel dispatches
  (threshold_crypto_tpu/device/pallas_tower.py).
* stepwise (--path stepwise; default off-TPU): Miller loop / final
  exponentiation driven from Python over small jitted kernels — the
  compile-latency escape hatch.

Extra JSON fields (SURVEY §5 roofline accounting):
  fq_mul_rate    — Montgomery Fq multiplies per second implied by the rate
  vpu_utilization — fraction of nominal v5e-class VPU u32 throughput
  hash_g2_per_sec — host hash rate (only with --with-hash)
  verify_with_hash_per_sec — end-to-end rate including hash_g2 (only with
  --with-hash; the reference's verify includes the hash,
  /root/reference/src/lib.rs:177-179)

Usage: python bench.py [--batch N] [--iters K] [--path pallas|stepwise]
                       [--with-hash]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

# Analytic cost model for roofline accounting (see device/pallas_tower.py):
# per verification = 2 Miller loops (63 dbl-iters á 122 + 5 add-iters á 82
# Fq muls) + one shared final exponentiation (~10.4k with cyclotomic
# squarings).  Adds/subs excluded — the multiply dominates.
FQ_MULS_PER_VERIFY = 26_600
# One SOS Montgomery multiply ≈ 2 × 24² products × ~5 u32 lane-ops.
U32_OPS_PER_FQ_MUL = 5_800
# Nominal v5e-class VPU: 4 lane-ops/cycle × (8×128) lanes × ~0.94 GHz.
VPU_PEAK_U32_OPS = 3.85e12


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="verification batch size (0 = auto per platform)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--path", choices=["pallas", "stepwise"], default="")
    ap.add_argument("--with-hash", action="store_true",
                    help="also measure hash_g2 and end-to-end verify rate")
    ap.add_argument("--fused", action="store_true",
                    help="deprecated alias for --path pallas")
    args = ap.parse_args()

    import jax

    # Persistent compile cache: cold Mosaic+XLA compiles for the megakernel
    # program cost minutes; cache them across processes.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import numpy as np

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    path = args.path or ("pallas" if on_tpu else "stepwise")
    if args.fused:
        path = "pallas"
    batch = args.batch or (512 if on_tpu else 16)

    from threshold_crypto_tpu import ops
    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R

    # Deterministic batch: distinct keys, distinct messages (hash points).
    rnd = random.Random(0xBE7C)
    n_unique = min(batch, 16)  # host-side point gen is slow; tile to batch
    sks = [rnd.randrange(1, R) for _ in range(n_unique)]
    hks = [rnd.randrange(1, R) for _ in range(n_unique)]
    h_host = [hcv.G2.mul(hcv.G2.generator, k) for k in hks]
    pk_host = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]
    sig_host = [hcv.G2.mul(h, s) for h, s in zip(h_host, sks)]

    reps = (batch + n_unique - 1) // n_unique
    pk_aff = dpr.g1_affine_from_host((pk_host * reps)[:batch])
    h_aff = dpr.g2_affine_from_host((h_host * reps)[:batch])
    sig_aff = dpr.g2_affine_from_host((sig_host * reps)[:batch])

    if path == "pallas":
        fn = jax.jit(ops.verify_batch_pallas)
    else:
        fn = ops.verify_batch_stepwise  # drives its own small jitted kernels

    t0 = time.time()
    try:
        out = np.asarray(jax.device_get(fn(pk_aff, h_aff, sig_aff)))
    except Exception as e:  # pallas path unavailable -> stepwise still runs
        if path != "pallas":
            raise
        print(f"# pallas path failed ({type(e).__name__}: {e}); "
              "falling back to stepwise", file=sys.stderr)
        path = "stepwise"
        fn = ops.verify_batch_stepwise
        t0 = time.time()
        out = np.asarray(jax.device_get(fn(pk_aff, h_aff, sig_aff)))
    compile_s = time.time() - t0
    assert out.all(), f"verification batch failed: {out[:8]}..."

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        np.asarray(jax.device_get(fn(pk_aff, h_aff, sig_aff)))
        times.append(time.time() - t0)
    best = min(times)
    value = batch / best

    fq_mul_rate = value * FQ_MULS_PER_VERIFY
    vpu_util = fq_mul_rate * U32_OPS_PER_FQ_MUL / VPU_PEAK_U32_OPS

    result = {
        "metric": "bls_share_verifications_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "verify/s",
        "vs_baseline": round(value / 1e5, 4),
        "path": path,
        "batch": batch,
        "compile_s": round(compile_s, 1),
        "fq_mul_rate": round(fq_mul_rate),
        "vpu_utilization": round(vpu_util, 4),
    }

    if args.with_hash:
        # The reference's verify includes hash_g2(msg)
        # (/root/reference/src/lib.rs:177-179); measure the host hash rate
        # (native C++ chain, threads — ctypes releases the GIL) and fold it
        # into an end-to-end rate assuming hash/verify overlap (pipelined).
        from concurrent.futures import ThreadPoolExecutor

        from threshold_crypto_tpu import hashing

        msgs = [b"bench-msg-%d" % i for i in range(batch)]
        hashing.hash_g2(msgs[0])  # warm native build
        workers = os.cpu_count() or 1
        t0 = time.time()
        with ThreadPoolExecutor(workers) as pool:
            list(pool.map(hashing.hash_g2, msgs))
        t_hash = time.time() - t0
        hash_rate = batch / t_hash
        e2e = batch / max(t_hash, best)
        result["hash_g2_per_sec"] = round(hash_rate, 1)
        result["verify_with_hash_per_sec"] = round(e2e, 1)

    print(json.dumps(result))
    print(
        f"# platform={platform} batch={batch} path={path} "
        f"best={best:.4f}s compile={compile_s:.1f}s iters={args.iters}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
