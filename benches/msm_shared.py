"""Measure the shared-window Horner Pallas MSM (round-4 RLC engine) on chip.

Stages, each printed as it lands:
  1. exponent derivation (host bytes, threaded chunk-tree SHA3)
  2. G1+G2 64-bit MSM pair through `msm_pallas_shared` (one jit program)
  3. end-to-end `verify_sig_shares_rlc_pallas` (adds the single replicated
     2-pair product check at --check-batch lanes)
  4. (--ladder) the round-3 `msm_pallas` w=4 ladder for comparison

Usage: python benches/msm_shared.py [--n 65536] [--iters 3] [--window 3]
                                    [--check-batch 512] [--ladder] [--no-e2e]
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
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--window", type=int, default=3)
    ap.add_argument("--check-batch", type=int, default=512)
    ap.add_argument("--ladder", action="store_true")
    ap.add_argument("--no-e2e", action="store_true")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import threshold_crypto_tpu.ops as _o

    _o.set_aot_cache(os.path.join(os.path.dirname(cache_dir), ".jax_aot"))

    import jax.numpy as jnp
    import numpy as np

    from threshold_crypto_tpu import ops
    from threshold_crypto_tpu.device import curve as dcv
    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.device import pallas_curve as pcv
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R

    n = args.n
    rnd = random.Random(0xA66)
    n_unique = 16
    sks = [rnd.randrange(1, R) for _ in range(n_unique)]
    hk = rnd.randrange(1, R)
    h_host = hcv.G2.mul(hcv.G2.generator, hk)
    pk_host = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]
    sig_host = [hcv.G2.mul(h_host, s) for s in sks]
    reps = (n + n_unique - 1) // n_unique
    pk_aff = dpr.g1_affine_from_host((pk_host * reps)[:n])
    sig_aff = dpr.g2_affine_from_host((sig_host * reps)[:n])
    h_jac = dcv.G2.from_host_affine([h_host])
    # host-side transcript copies (what a real verifier holds as wire bytes)
    pk_np = jax.tree_util.tree_map(np.asarray, pk_aff)
    sig_np = jax.tree_util.tree_map(np.asarray, sig_aff)
    print(f"# built batch n={n}", flush=True)

    # -- stage 1: exponents -------------------------------------------------
    t0 = time.time()
    r_plain = ops.rlc_exponents(n, os.urandom(32), pk_aff=pk_aff,
                                sig_aff=sig_aff)
    np.asarray(r_plain)
    t_first = time.time() - t0
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        r_plain = ops.rlc_exponents(n, os.urandom(32), pk_aff=pk_aff,
                                    sig_aff=sig_aff)
        np.asarray(r_plain)
        times.append(time.time() - t0)
    t_exp = min(times)
    print(f"exponents: first={t_first:.3f}s best={t_exp:.3f}s "
          f"({t_exp/n*1e6:.2f}us/share)", flush=True)

    # -- stage 2: MSM pair --------------------------------------------------
    @jax.jit
    def msm_pair(pk_aff, sig_aff, r_plain):
        apk = pcv.msm_pallas_shared(dcv.G1, pk_aff, r_plain, nbits=64,
                                    window=args.window)
        asg = pcv.msm_pallas_shared(dcv.G2, sig_aff, r_plain, nbits=64,
                                    window=args.window)
        return apk, asg

    t0 = time.time()
    out = jax.block_until_ready(msm_pair(pk_aff, sig_aff, r_plain))
    t_compile = time.time() - t0
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        out = jax.block_until_ready(msm_pair(pk_aff, sig_aff, r_plain))
        times.append(time.time() - t0)
    t_msm = min(times)
    print(f"msm_shared w={args.window}: compile={t_compile:.1f}s "
          f"best={t_msm:.3f}s ({t_msm/n*1e6:.2f}us/share, "
          f"{n/(t_msm+t_exp):.0f} sh/s incl exps)", flush=True)

    # correctness spot-check vs msm_scalarwise on the XLA path
    apk, asg = out
    exp_pk = np.asarray(jax.device_get(
        jax.jit(lambda p, s: dcv.G1.msm_scalarwise(
            ops.affine_to_jacobian(dcv.G1, p), s, nbits=64))(
                pk_aff, r_plain)))
    got_pk1 = jax.tree_util.tree_map(lambda a: a[None], apk)
    exp_tree = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a)[None], tuple(exp_pk)
    )
    eqv = bool(np.asarray(dcv.G1.eq(got_pk1, exp_tree))[0])
    print(f"g1 msm matches XLA scalarwise: {eqv}", flush=True)
    assert eqv

    # -- stage 3: end-to-end RLC verify ------------------------------------
    if not args.no_e2e:
        def run():
            r = ops.rlc_exponents(n, os.urandom(32), pk_aff=pk_aff,
                                  sig_aff=sig_aff)
            ok = ops.verify_sig_shares_rlc_pallas(
                pk_aff, h_jac, sig_aff, r, check_batch=args.check_batch
            )
            return bool(np.asarray(jax.device_get(ok)))

        t0 = time.time()
        ok = run()
        t_c = time.time() - t0
        assert ok, "RLC aggregate verification failed"
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        best = min(times)
        print(f"e2e rlc: compile={t_c:.1f}s best={best:.3f}s "
              f"-> {n/best:.0f} share-verifies/s", flush=True)

    # -- stage 4: old ladder ------------------------------------------------
    if args.ladder:
        @jax.jit
        def msm_pair_old(pk_aff, sig_aff, r_plain):
            apk = pcv.msm_pallas(dcv.G1, pk_aff, r_plain, nbits=64, window=4)
            asg = pcv.msm_pallas(dcv.G2, sig_aff, r_plain, nbits=64, window=4)
            return apk, asg

        t0 = time.time()
        jax.block_until_ready(msm_pair_old(pk_aff, sig_aff, r_plain))
        t_c = time.time() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            jax.block_until_ready(msm_pair_old(pk_aff, sig_aff, r_plain))
            times.append(time.time() - t0)
        print(f"msm_ladder w=4: compile={t_c:.1f}s best={min(times):.3f}s "
              f"({min(times)/n*1e6:.2f}us/share)", flush=True)


if __name__ == "__main__":
    main()
