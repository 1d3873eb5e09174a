"""Warm-start floor measurement (VERDICT r3 #8: < 60 s target).

A fresh process pays ~2-3 min of client-side tracing/lowering for the
fused verify pipeline even when every kernel hits the persistent XLA
cache.  With the AOT executable cache (`ops.set_aot_cache`) the compiled
executable deserializes straight onto the device.  This script measures,
in ONE fresh process: import → batch build → first per-pair verify
result, with the AOT cache active.

Usage: python benches/warmstart.py [--batch 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_T0 = time.time()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from threshold_crypto_tpu import ops
    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R

    ops.set_aot_cache(os.path.join(root, ".jax_aot"))
    print(f"imports+config: {time.time()-_T0:.1f}s", flush=True)

    import random

    rnd = random.Random(1)
    sk, hk = rnd.randrange(1, R), rnd.randrange(1, R)
    h = hcv.G2.mul(hcv.G2.generator, hk)
    pk = hcv.G1.mul(hcv.G1.generator, sk)
    sig = hcv.G2.mul(h, sk)
    n = args.batch

    def bc(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(
                np.broadcast_to(np.asarray(a), (n,) + a.shape[1:])
            ),
            tree,
        )

    pk_aff = bc(dpr.g1_affine_from_host([pk]))
    h_aff = bc(dpr.g2_affine_from_host([h]))
    sig_aff = bc(dpr.g2_affine_from_host([sig]))
    print(f"batch built: {time.time()-_T0:.1f}s", flush=True)

    ok = np.asarray(jax.device_get(
        ops.verify_batch_pallas_jit(pk_aff, h_aff, sig_aff)
    ))
    assert ok.all(), "warm-start verification failed"
    total = time.time() - _T0
    print(f"first verify result: {total:.1f}s "
          f"({'<60s TARGET MET' if total < 60 else 'over 60s'})",
          flush=True)


if __name__ == "__main__":
    main()
