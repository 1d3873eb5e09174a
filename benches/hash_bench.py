"""Distinct-message hashing + verification rates (VERDICT r4 #4).

Measures, on the real chip:
  1. host-native `hash_g2` (C++ chain, threaded) — the r4 baseline,
  2. device `hash_g2_device` at batch N (one jitted program; the
     digest→point sampling chain on the VPU, host fallback counted),
  3. end-to-end distinct-message batch verification: device hashes
     feeding `verify_batch_pallas_jit` at the same batch — the
     reference's full `PublicKeyShare::verify` stack
     (`/root/reference/src/lib.rs:177-179` → `:691-694`) with BOTH the
     hash and the pairing checks TPU-bound.

Usage: python benches/hash_bench.py [--batch N] [--iters K]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--host-sample", type=int, default=512)
    args = ap.parse_args()

    import jax
    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from concurrent.futures import ThreadPoolExecutor

    from threshold_crypto_tpu import hashing, ops
    from threshold_crypto_tpu.device import curve as dcv
    from threshold_crypto_tpu.device import hash2g2
    from threshold_crypto_tpu.ops.threshold import jacobian_to_affine
    from threshold_crypto_tpu.utils import prebuilt

    prebuilt.unpack(root)
    ops.set_aot_cache(os.path.join(root, ".jax_aot"))

    n = args.batch
    msgs = [b"bench-msg-%d" % i for i in range(n)]
    digests = np.stack([
        np.frombuffer(hashing.sha3_256(m), dtype="<u4") for m in msgs
    ])

    # 1. host-native rate (threaded; sample then extrapolate)
    hashing.hash_g2(msgs[0])  # warm the native build
    hs = min(args.host_sample, n)
    t0 = time.time()
    with ThreadPoolExecutor(os.cpu_count() or 1) as pool:
        list(pool.map(hashing.hash_g2, msgs[:hs]))
    host_rate = hs / (time.time() - t0)
    print(json.dumps({"op": "hash_g2_host_native", "rate": round(host_rate, 1),
                      "sample": hs}), flush=True)

    # 2. device pipeline (digests -> points), fallback fraction counted
    t0 = time.time()
    jac, ok = hash2g2.hash_g2_device(digests)
    okh = np.asarray(jax.device_get(ok))
    compile_s = time.time() - t0
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        jac, ok = hash2g2.hash_g2_device(digests)
        okh = np.asarray(jax.device_get(ok))
        ts.append(time.time() - t0)
    dev = min(ts)
    fallback = int((~okh).sum())
    # effective rate charges the host oracle for the fallback tail
    eff = n / (dev + fallback / max(host_rate, 1e-9))
    print(json.dumps({
        "op": "hash_g2_device", "batch": n, "rate": round(n / dev, 1),
        "effective_rate": round(eff, 1), "fallback_lanes": fallback,
        "compile_s": round(compile_s, 1),
    }), flush=True)

    # 2b. host-parity spot-check of the device pipeline (the CPU parity
    # test exercises the XLA fallback branch; THIS is the only place the
    # on-TPU Pallas sampling chain is checked against the host oracle)
    sample = [i for i in range(0, n, max(1, n // 16)) if okh[i]][:16]
    h_aff_chk = jax.device_get(jacobian_to_affine(dcv.G2, jac))
    from threshold_crypto_tpu.device import mont
    from threshold_crypto_tpu.host import curve as hcv_mod

    mism = 0
    for i in sample:
        want = hashing.hash_g2(msgs[i]).to_compressed()
        x = (mont.from_mont_int(mont.FQ, h_aff_chk[0][0][i]),
             mont.from_mont_int(mont.FQ, h_aff_chk[0][1][i]))
        y = (mont.from_mont_int(mont.FQ, h_aff_chk[1][0][i]),
             mont.from_mont_int(mont.FQ, h_aff_chk[1][1][i]))
        got = hcv_mod.g2_to_compressed((x, y))
        if got != want:
            mism += 1
    print(json.dumps({"op": "hash_g2_device_parity", "sampled": len(sample),
                      "mismatches": mism}), flush=True)
    assert mism == 0, "device hash_g2 disagrees with the host oracle"

    # 3. end-to-end distinct-message verification (hash + 2-pair checks)
    import random as _r

    from threshold_crypto_tpu.host.params import R

    rnd = _r.Random(0xD15C)
    sks = [rnd.randrange(1, R) for _ in range(16)]
    sk_limbs = np.zeros((n, 16), np.uint32)
    for i in range(n):
        for limb in range(16):
            sk_limbs[i, limb] = (sks[i % 16] >> (16 * limb)) & 0xFFFF
    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.host import curve as hcv

    pk_host = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]
    reps = (n + 15) // 16
    pk_aff = jax.tree_util.tree_map(
        lambda a: jax.device_put(np.tile(
            np.asarray(a), (reps,) + (1,) * (a.ndim - 1))[:n]),
        dpr.g1_affine_from_host(pk_host),
    )

    # signatures once, outside the timed loop, over the EXACT hash
    # points (`hash_g2_batch` splices the host oracle into the fallback
    # tail); the timed loop is then the full public verifier API —
    # `ops.verify_with_hash_batch` — i.e. the reference's per-share
    # verify call stack (`src/lib.rs:177-179` → `:691-694`) end to end
    from threshold_crypto_tpu.device import pairing as dprr
    from threshold_crypto_tpu.device import pallas_curve as pcv

    h_aff0 = jax.tree_util.tree_map(
        jax.device_put,
        dprr.g2_affine_from_host(
            [e.v for e in hashing.hash_g2_batch(msgs)]
        ),
    )
    sig_jac = pcv.scalar_mul_pallas(
        dcv.G2, h_aff0, jax.device_put(sk_limbs)
    )
    sig_aff = jax.tree_util.tree_map(
        jax.device_put, jacobian_to_affine(dcv.G2, sig_jac)
    )

    def run():
        return ops.verify_with_hash_batch(pk_aff, msgs, sig_aff)

    t0 = time.time()
    v = run()
    compile_s = time.time() - t0
    assert v.all(), "distinct-message verification failed"
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    best = min(ts)
    print(json.dumps({
        "op": "verify_with_hash_device", "batch": n,
        "rate": round(n / best, 1), "compile_s": round(compile_s, 1),
        "note": "ops.verify_with_hash_batch: host sha3 digests + device "
                "hash_g2 + host-oracle splice + fused 2-pair checks",
    }), flush=True)


if __name__ == "__main__":
    main()
