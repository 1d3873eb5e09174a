"""Scaling table: sharded verify/combine throughput over 1..n_dev devices.

On real hardware this measures ICI scaling; under
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu it
validates the SPMD program shapes and emits the table for the virtual mesh
(numbers then measure the host, not a TPU — use for shape/scale QA only).

Usage: python benches/scaling.py [--batch N] [--devices 1,2,4,8]
Emits one JSON line per (op, n_devices).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--devices", type=str, default="")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    # persistent cache: the per-(op, n_dev) SPMD programs cost minutes of
    # XLA:CPU compile each on a small host; share entries across runs
    # (same dir as tests/conftest.py so the suite pre-warms this bench)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import numpy as np

    from threshold_crypto_tpu import ops, parallel as par
    from threshold_crypto_tpu.device import curve as dcv
    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R
    from threshold_crypto_tpu.ops import fr as frops

    n_avail = len(jax.devices())
    dev_counts = (
        [int(x) for x in args.devices.split(",") if x]
        if args.devices
        else [d for d in (1, 2, 4, 8) if d <= n_avail]
    )
    batch = args.batch or 256
    rnd = random.Random(0x5CA1E)

    # one shared scenario: N shares of h^s_i, combine weights from xs
    n_unique = min(batch, 8)
    h_host = hcv.G2.mul(hcv.G2.generator, rnd.randrange(1, R))
    sks = [rnd.randrange(1, R) for _ in range(n_unique)]
    shares_host = [hcv.G2.mul(h_host, s) for s in sks]
    reps = (batch + n_unique - 1) // n_unique
    shares_all = (shares_host * reps)[:batch]
    xs = list(range(1, batch + 1))

    for n_dev in dev_counts:
        mesh = par.make_mesh(n_dev)
        sh = par.shard_batch(mesh, dcv.G2.from_host_affine(shares_all))
        skp = par.shard_batch(
            mesh, dcv.fr_limbs_from_ints((sks * reps)[:batch])
        )
        h_jac = par.shard_batch(
            mesh, dcv.G2.from_host_affine([h_host] * batch)
        )
        xm = par.replicate(mesh, frops.fr_to_device(xs))

        # sign (pure DP)
        out = par.sharded_sign(mesh, h_jac, skp)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            jax.block_until_ready(par.sharded_sign(mesh, h_jac, skp))
            ts.append(time.time() - t0)
        print(json.dumps({
            "op": "sharded_sign", "n_devices": n_dev, "batch": batch,
            "sec": round(min(ts), 4),
            "per_sec": round(batch / min(ts), 1),
        }))

        # combine (collective reduction)
        out, ok = par.sharded_combine(mesh, dcv.G2, sh, xm)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            o, _ = par.sharded_combine(mesh, dcv.G2, sh, xm)
            jax.block_until_ready(o)
            ts.append(time.time() - t0)
        print(json.dumps({
            "op": "sharded_combine", "n_devices": n_dev, "batch": batch,
            "sec": round(min(ts), 4),
            "per_sec": round(batch / min(ts), 1),
        }))

        # RLC batch verification (the flagship throughput path: per-device
        # partial MSMs + collective point reduction + one replicated check)
        pk_hosts = [hcv.G1.mul(hcv.G1.generator, s)
                    for s in (sks * reps)[:batch]]
        pk_aff = par.shard_batch(mesh, dpr.g1_affine_from_host(pk_hosts))
        sig_aff = par.shard_batch(
            mesh, dpr.g2_affine_from_host(shares_all)
        )
        h1_jac = dcv.G2.from_host_affine([h_host])
        r_plain = ops.rlc_exponents(
            batch, b"\x09" * 32, pk_aff=pk_aff, sig_aff=sig_aff
        )
        ok = par.sharded_verify_rlc(mesh, pk_aff, h1_jac, sig_aff, r_plain)
        assert bool(ok), "sharded RLC verification failed"
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            par.sharded_verify_rlc(mesh, pk_aff, h1_jac, sig_aff, r_plain)
            ts.append(time.time() - t0)
        print(json.dumps({
            "op": "sharded_rlc_verify", "n_devices": n_dev, "batch": batch,
            "sec": round(min(ts), 4),
            "per_sec": round(batch / min(ts), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
