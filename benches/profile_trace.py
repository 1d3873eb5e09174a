"""Kernel-level profiler capture for the headline programs (VERDICT #7).

Captures a `jax.profiler.trace` (XPlane + Chrome trace) around the
AOT-loaded per-pair verify pipeline and the RLC MSM pair program, then
prints the top device-side ops by accumulated duration — the
profiler-grade evidence (beyond wall-clock staging) of where the chip
spends its time.  Output dir: /tmp/tc_trace (open vm.trace.json.gz in
Perfetto/chrome://tracing for the full timeline).

Usage: python benches/profile_trace.py [--batch N] [--rlc-batch N]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)
)))

TRACE_DIR = "/tmp/tc_trace"


def _summarize(trace_dir, top=20):
    files = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    ))
    if not files:
        print("no trace captured")
        return
    d = json.load(gzip.open(files[-1]))
    durs = {}
    for e in d.get("traceEvents", []):
        if "dur" not in e or e.get("name", "").startswith("$"):
            continue  # host python frames
        durs[e["name"]] = durs.get(e["name"], 0.0) + float(e["dur"])
    print(f"-- top device ops ({files[-1]}):")
    for n, t in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {t / 1e3:>10.3f} ms  {n[:80]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--rlc-batch", type=int, default=262144)
    args = ap.parse_args()

    import jax
    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from threshold_crypto_tpu import ops
    from threshold_crypto_tpu.utils import prebuilt

    prebuilt.unpack(root)
    ops.set_aot_cache(os.path.join(root, ".jax_aot"))

    import bench as b

    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R

    # -- per-pair pipeline ------------------------------------------------
    pk, h, sig = b._make_batch(args.batch, dpr, hcv, R)
    t0 = time.time()
    out = np.asarray(jax.device_get(
        ops.verify_batch_pallas_jit(pk, h, sig)
    ))
    assert out.all()
    print(f"pipeline ready in {time.time() - t0:.1f}s")
    with jax.profiler.trace(TRACE_DIR):
        np.asarray(jax.device_get(ops.verify_batch_pallas_jit(pk, h, sig)))
    _summarize(TRACE_DIR)

    # -- RLC MSM pair -----------------------------------------------------
    n = args.rlc_batch
    pk_aff, sig_aff, h_jac, _, _ = b._make_rlc_batch(n, np)
    r = ops.rlc_exponents(n, b"\x07" * 32, pk_aff=pk_aff, sig_aff=sig_aff)
    ok = ops.verify_sig_shares_rlc_pallas(pk_aff, h_jac, sig_aff, r,
                                          check_batch=512)
    assert bool(np.asarray(jax.device_get(ok)))
    rlc_dir = TRACE_DIR + "_rlc"
    with jax.profiler.trace(rlc_dir):
        r = ops.rlc_exponents(n, os.urandom(32), pk_aff=pk_aff,
                              sig_aff=sig_aff)
        ok = ops.verify_sig_shares_rlc_pallas(pk_aff, h_jac, sig_aff, r,
                                              check_batch=512)
        assert bool(np.asarray(jax.device_get(ok)))
    _summarize(rlc_dir)


if __name__ == "__main__":
    main()
