"""Batched device encryption rate (the r4 encrypt path, VERDICT r3 #6).

Measures `ops.encrypt_batch_pallas` — the three 255-bit scalar-muls of
Baek–Zhang encryption (u = r·G1, g = r·pk, w = r·H(u,v);
`/root/reference/src/lib.rs:128-137`) on the per-lane Pallas ladders —
and spot-checks lanes against the host oracle.

Usage: python benches/encrypt_bench.py [--n 4096] [--iters 3]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from threshold_crypto_tpu import ops
    from threshold_crypto_tpu.device import curve as dcv
    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R

    n = args.n
    rnd = random.Random(0xE2C)
    sk = rnd.randrange(1, R)
    pk_host = hcv.G1.mul(hcv.G1.generator, sk)
    huv_hosts = [
        hcv.G2.mul(hcv.G2.generator, rnd.randrange(1, R)) for _ in range(16)
    ]
    rs = [rnd.randrange(1, R) for _ in range(n)]

    def bc(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(np.broadcast_to(
                np.asarray(a), (n,) + a.shape[1:]
            )),
            tree,
        )

    pk_aff = bc(dpr.g1_affine_from_host([pk_host]))
    reps = (n + 15) // 16
    huv_aff = jax.tree_util.tree_map(
        lambda a: jax.device_put(np.tile(
            np.asarray(a), (reps,) + (1,) * (a.ndim - 1))[:n]),
        dpr.g2_affine_from_host(huv_hosts),
    )
    r_plain = dcv.fr_limbs_from_ints(rs)

    fn = jax.jit(ops.encrypt_batch_pallas)
    t0 = time.time()
    out = fn(pk_aff, r_plain, huv_aff)
    jax.device_get(out[0][0][:1])
    compile_s = time.time() - t0
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        out = fn(pk_aff, r_plain, huv_aff)
        jax.device_get(out[0][0][:1])
        times.append(time.time() - t0)
    best = min(times)

    # host-oracle spot check on 3 lanes
    u, g, w = out
    for i in (0, 1, n - 1):
        lane = lambda t: jax.tree_util.tree_map(lambda a: a[i : i + 1], t)
        uh = dcv.G1.to_host_affine(lane(u))[0]
        gh = dcv.G1.to_host_affine(lane(g))[0]
        wh = dcv.G2.to_host_affine(lane(w))[0]
        assert uh == hcv.G1.mul(hcv.G1.generator, rs[i]), i
        assert gh == hcv.G1.mul(pk_host, rs[i]), i
        assert wh == hcv.G2.mul(huv_hosts[i % 16], rs[i]), i

    import json

    print(json.dumps({
        "op": "encrypt_batch_pallas",
        "n": n,
        "sec": round(best, 4),
        "encrypts_per_sec": round(n / best, 1),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
