"""Large-threshold combine benchmark (SURVEY §7 step 9 north-star shapes).

Times Σ λ_i·share_i (in-exponent Lagrange, windowed MSM) at t+1 ∈
{64, 256, 1024, 4096} shares — the reference's `combine_signatures` hot
path (`/root/reference/benches/bench.rs:100-122` stops at t=40).  N=4096
exercises the O(N)-memory Lagrange scan path.

Usage: python benches/combine_large.py [--sizes 64,256,1024] [--iters 3]
Emits one JSON line per size.
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
    ap.add_argument("--sizes", type=str, default="64,256,1024")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--path", default="scalarwise",
                    choices=["scalarwise", "bitscan", "pallas"])
    args = ap.parse_args()

    import jax
    import numpy as np

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from threshold_crypto_tpu import ops
    from threshold_crypto_tpu.device import curve as dcv
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R
    from threshold_crypto_tpu.ops import fr as frops

    rnd = random.Random(0xC0B1E)
    sizes = [int(s) for s in args.sizes.split(",") if s]

    # Shares of a shared base point h: share_i = h^{s_i}.  Only a few
    # unique host points (host gen is slow); scalars all distinct — the
    # device work (λ's + MSM) is identical to fully unique shares.
    h_host = hcv.G2.mul(hcv.G2.generator, rnd.randrange(1, R))
    uniq = [hcv.G2.mul(h_host, rnd.randrange(1, R)) for _ in range(8)]

    fn = jax.jit(ops.combine_batch, static_argnums=(0, 3))
    for n in sizes:
        shares = dcv.G2.from_host_affine((uniq * ((n + 7) // 8))[:n])
        xs = frops.fr_to_device(list(range(1, n + 1)))
        t0 = time.time()
        out, ok = fn(dcv.G2, shares, xs, args.path)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        assert bool(ok)
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            o, _ = fn(dcv.G2, shares, xs, args.path)
            jax.block_until_ready(o)
            ts.append(time.time() - t0)
        best = min(ts)
        print(json.dumps({
            "op": "combine_signatures",
            "path": args.path,
            "t_plus_1": n,
            "sec": round(best, 4),
            "shares_per_sec": round(n / best, 1),
            "compile_s": round(compile_s, 1),
        }))


if __name__ == "__main__":
    main()
