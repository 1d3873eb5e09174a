"""Headline benchmark: batched BLS share-verifications per second per chip.

Prints one or more JSON lines; each line is a COMPLETE result (the driver
may parse the first or the last — both are valid), later lines strictly
upgrade earlier ones.

The round-4 lesson (VERDICT r4 #1): the big Pallas programs cost
420-930 s of XLA+Mosaic compile EACH from a cold cache — no ladder of
cold compiles can land the ≥1e5 headline inside a ~520 s driver budget.
Round 5 therefore ships the two headline executables with the source
(`prebuilt/` — xz-compressed AOT entries, `utils/prebuilt.py`) and the
bench begins by materializing them, so the normal path is WARM:

  warm (prebuilt AOT entries match the current source/device/jax):
    child process AOT-loads the RLC MSM pair program (N=262144) and the
    fused per-pair check (vbp512/vbp8192) — no tracing, no XLA — and
    lands the RLC headline in ~1-2 min.  The parent runs stage-1
    stepwise only as a late fallback if the child goes silent.

  cold (entries missing or stale — e.g. a source edit without
  re-running benches/make_prebuilt.py):
    exactly the round-3 configuration that is MEASURED to land at 424 s
    cold on this host: stage-1 stepwise per-pair concurrently with a
    child running ladder-MSM RLC at N=16384 + the Pallas check at 512
    lanes, on the faster-compiling 16-bit engine (TC_TPU_ENGINE_BASE=16
    for the child; the 13-bit default compiles ~1.5x slower).

Stage rates measured in r4/r5 (PERF.md): RLC shared-window ~212k
equivalent share-verifies/s at N=262144 (148k at 65536), per-pair
pallas 25k/s at batch 8192 (7.8k at 512), cold-ladder RLC ~32.5k/s.

The headline `value` is the best measured share-verification rate;
`vs_baseline` is value / 1e5 (the ≥1e5 verifies/s/chip build target —
the reference publishes no numbers of its own, BASELINE.md).

Extra JSON fields (SURVEY §5 roofline accounting):
  per_pair_verifies_per_sec  — honest per-pair (2 pairings worth) rate
  rlc_share_verifies_per_sec — equivalent rate via RLC batch verification
  fq_mul_rate / vpu_utilization — analytic roofline for the per-pair path
  hash_g2_per_sec / verify_with_hash_per_sec — only with --with-hash

Usage: python bench.py [--batch N] [--iters K] [--path auto|pallas|stepwise]
                       [--rlc-batch N] [--deadline S] [--with-hash]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import time

_T0 = time.time()
_HERE = os.path.dirname(os.path.abspath(__file__))

# Analytic cost model for roofline accounting (see device/pallas_tower.py):
# per verification = 2 Miller loops (63 dbl-iters á 122 + 5 add-iters á 82
# Fq muls) + one shared final exponentiation (~10.4k with cyclotomic
# squarings).  Adds/subs excluded — the multiply dominates.
FQ_MULS_PER_VERIFY = 26_600
# One Montgomery multiply's u32 lane-ops: ~5 800 for the 16-bit SOS
# engine (lo/hi split per product), ~4 000 for the 13-bit raw-column
# engine (adjusted at runtime from the active TC_TPU_ENGINE_BASE).
U32_OPS_PER_FQ_MUL = 4_000
# Nominal v5e-class VPU: 4 lane-ops/cycle × (8×128) lanes × ~0.94 GHz.
VPU_PEAK_U32_OPS = 3.85e12


def _elapsed():
    return time.time() - _T0


def _emit(result):
    """Print one complete JSON result line and flush (driver-parseable even
    if a later stage is killed)."""
    print(json.dumps(result), flush=True)


def _make_batch(batch, dpr, hcv, R):
    """Deterministic verify batch: distinct keys, distinct messages.
    Converts only the 16 unique points; tiles at the limb level."""
    import jax
    import numpy as np

    rnd = random.Random(0xBE7C)
    n_unique = min(batch, 16)  # host-side point gen is slow; tile to batch
    sks = [rnd.randrange(1, R) for _ in range(n_unique)]
    hks = [rnd.randrange(1, R) for _ in range(n_unique)]
    h_host = [hcv.G2.mul(hcv.G2.generator, k) for k in hks]
    pk_host = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]
    sig_host = [hcv.G2.mul(h, s) for h, s in zip(h_host, sks)]
    reps = (batch + n_unique - 1) // n_unique

    def tile(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(np.tile(
                np.asarray(a), (reps,) + (1,) * (a.ndim - 1)
            )[:batch]),
            tree,
        )

    pk_aff = tile(dpr.g1_affine_from_host(pk_host))
    h_aff = tile(dpr.g2_affine_from_host(h_host))
    sig_aff = tile(dpr.g2_affine_from_host(sig_host))
    return pk_aff, h_aff, sig_aff


def _measure(fn, args, iters, np, jax):
    t0 = time.time()
    out = np.asarray(jax.device_get(fn(*args)))
    compile_s = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(jax.device_get(fn(*args)))
        times.append(time.time() - t0)
    return out, min(times), compile_s


def _warm_keys(rlc_batch, check_batch, batch):
    keys = [f"rlcagg-shared{rlc_batch}", f"vbp{check_batch}"]
    if batch != check_batch:
        keys.append(f"vbp{batch}")
    return keys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="per-pair verification batch size (0 = auto)")
    ap.add_argument("--rlc-batch", type=int, default=0,
                    help="RLC batch-verification share count (0 = auto)")
    ap.add_argument("--check-batch", type=int, default=512,
                    help="replicated lanes of the RLC aggregate check")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--path", choices=["auto", "pallas", "stepwise"],
                    default="auto")
    ap.add_argument("--deadline", type=float,
                    default=float(os.environ.get("TC_BENCH_DEADLINE", "520")),
                    help="total wall-clock budget in seconds (from start)")
    ap.add_argument("--with-hash", action="store_true",
                    help="also measure hash_g2 and end-to-end verify rate")
    ap.add_argument("--child-pallas", action="store_true",
                    help=argparse.SUPPRESS)  # internal: warm AOT stage
    ap.add_argument("--child-cold", action="store_true",
                    help=argparse.SUPPRESS)  # internal: cold-ladder stage
    args = ap.parse_args()

    # Materialize the shipped warm caches BEFORE the first compile: a
    # fresh checkout has empty .jax_cache/.jax_aot (both gitignored),
    # which is exactly the r4 scoreboard failure.
    from threshold_crypto_tpu.utils import prebuilt

    unpacked = prebuilt.unpack(_HERE)
    if unpacked and not (args.child_pallas or args.child_cold):
        print(f"# prebuilt: materialized {unpacked} cache entries "
              f"({_elapsed():.0f}s)", file=sys.stderr)

    import jax

    # Persistent compile cache: cold Mosaic+XLA compiles for the megakernel
    # program cost minutes; cache them across processes.
    cache_dir = os.path.join(_HERE, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import numpy as np

    from threshold_crypto_tpu import ops

    # AOT executable cache: a warm process deserializes the big compiled
    # programs directly (skips the ~2-3 min client-side tracing floor).
    ops.set_aot_cache(os.path.join(_HERE, ".jax_aot"))

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu" or bool(int(os.environ.get(
        "TC_BENCH_ASSUME_TPU", "1"
    )) and platform not in ("cpu", "gpu"))  # tunneled-TPU platform aliases
    # per-pair batch 8192 = the pipeline's throughput-bound point (VERDICT
    # r3 #4: 512 was latency-bound and understated the rate 3x).
    batch = args.batch or (8192 if on_tpu else 16)
    rlc_batch = args.rlc_batch or (262144 if on_tpu else 32)
    check_batch = args.check_batch
    stepwise_batch = min(batch, 512)  # stage 1 is dispatch-bound: keep small

    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.device import pallas_tower as _ptw
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R

    global U32_OPS_PER_FQ_MUL
    U32_OPS_PER_FQ_MUL = 5_800 if _ptw.BASE == 16 else 4_000

    # ---- child modes: emit one JSON stage line per milestone -------------
    if args.child_pallas:
        _child_warm(args, rlc_batch, batch, check_batch, np, jax,
                    dpr, hcv, R, ops)
        return
    if args.child_cold:
        _child_cold(args, np, jax, dpr, hcv, R, ops)
        return

    warm = on_tpu and all(
        prebuilt.aot_entry_exists(k, _HERE)
        for k in _warm_keys(rlc_batch, check_batch, batch)
    )

    # ---- launch the child: warm = AOT-load the headline executables
    # (first line in ~1-2 min); cold = the r3-proven ladder config.  The
    # chip and the compile service tolerate two clients, and a child can
    # be killed at the deadline, which an in-process compile cannot. ----
    child = None
    if args.path != "stepwise" and on_tpu:
        if warm:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child-pallas", "--batch", str(batch),
                   "--rlc-batch", str(rlc_batch),
                   "--check-batch", str(check_batch),
                   "--iters", str(args.iters)]
            env = None
        else:
            # r3-measured cold config: ladder MSM at N=16384 + check at
            # 512, 16-bit engine (lands at ~424 s cold; PERF.md r3)
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child-cold", "--iters", str(args.iters)]
            env = dict(os.environ, TC_TPU_ENGINE_BASE="16")
        print(f"# launching {'warm' if warm else 'cold'} child "
              f"({_elapsed():.0f}s)", file=sys.stderr)
        child = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, cwd=_HERE, env=env,
        )

    result = {
        "metric": "bls_share_verifications_per_sec_per_chip",
        "value": 0.0,
        "unit": "verify/s",
        "vs_baseline": 0.0,
        "batch": batch,
        "platform": platform,
        "warm_start": bool(warm),
    }
    import threading

    result_lock = threading.Lock()

    def set_headline(rate, mode):
        if rate > result["value"]:
            result["value"] = round(rate, 2)
            result["vs_baseline"] = round(rate / 1e5, 4)
            result["mode"] = mode

    def _apply_child_line(obj):
        if obj.get("stage") == "pallas":
            result["per_pair_verifies_per_sec"] = round(obj["per_pair"], 2)
            result["per_pair_path"] = "pallas"
            result["per_pair_batch"] = obj.get("batch")
            result["pallas_compile_s"] = obj["compile_s"]
            fq = obj["per_pair"] * FQ_MULS_PER_VERIFY
            result["fq_mul_rate"] = round(fq)
            result["vpu_utilization"] = round(
                fq * U32_OPS_PER_FQ_MUL / VPU_PEAK_U32_OPS, 4
            )
            set_headline(obj["per_pair"], "per_pair_pallas")
        elif obj.get("stage") in ("rlc_pallas", "rlc_ladder"):
            result["rlc_share_verifies_per_sec"] = round(obj["rate"], 2)
            result["rlc_batch"] = obj.get("rlc_batch")
            result["rlc_compile_s"] = obj.get("compile_s")
            set_headline(obj["rate"], "rlc_batch_pallas")
        else:
            return
        _emit(result)

    def _child_reader():
        # Stream the child's stage lines AS THEY LAND: if a later-stage
        # compile overruns the driver's own kill (the r2 failure mode),
        # the earlier headline has already been printed by this thread.
        for line in child.stdout:
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            with result_lock:
                _apply_child_line(obj)

    reader = None
    if child is not None:
        reader = threading.Thread(target=_child_reader, daemon=True)
        reader.start()

    # ---- stage 1: stepwise per-pair fallback -----------------------------
    # Warm: only if the child is silent past its expected landing window
    # (AOT load + batch build ≈ 1-2 min) — its ~155 s of small-kernel
    # compiles would otherwise just contend with nothing to gain.
    # Cold: start immediately, concurrent with the child (the r3 shape:
    # stage-1 landed at 161 s alongside the child's 424 s).
    run_stage1 = True
    if warm and child is not None:
        silent_budget = min(240.0, args.deadline * 0.55)
        while _elapsed() < silent_budget:
            if result["value"] > 0 or child.poll() is not None:
                break
            time.sleep(2)
        run_stage1 = result["value"] == 0

    if run_stage1:
        pk_aff, h_aff, sig_aff = _make_batch(stepwise_batch, dpr, hcv, R)
        out, best, compile_s = _measure(
            ops.verify_batch_stepwise, (pk_aff, h_aff, sig_aff),
            args.iters, np, jax,
        )
        assert out.all(), f"verification batch failed: {out[:8]}..."
        per_pair = stepwise_batch / best
        with result_lock:
            # never DOWNGRADE fields the child reader may have already set
            if result.get("per_pair_path") != "pallas":
                result["per_pair_verifies_per_sec"] = round(per_pair, 2)
                result["per_pair_path"] = "stepwise"
                fq_mul_rate = per_pair * FQ_MULS_PER_VERIFY
                result["fq_mul_rate"] = round(fq_mul_rate)
                result["vpu_utilization"] = round(
                    fq_mul_rate * U32_OPS_PER_FQ_MUL / VPU_PEAK_U32_OPS, 4
                )
            result["stepwise_batch"] = stepwise_batch
            result["stepwise_compile_s"] = round(compile_s, 1)
            set_headline(per_pair, "per_pair_stepwise")
            _emit(result)
        print(f"# stage1 stepwise: {per_pair:.1f}/s compile={compile_s:.1f}s "
              f"elapsed={_elapsed():.0f}s", file=sys.stderr)

    if args.with_hash:
        # The reference's verify includes hash_g2(msg)
        # (/root/reference/src/lib.rs:177-179); measure the host hash rate
        # (native C++ chain, threads — ctypes releases the GIL) and fold it
        # into an end-to-end rate assuming hash/verify overlap (pipelined).
        from concurrent.futures import ThreadPoolExecutor

        from threshold_crypto_tpu import hashing

        nmsg = max(stepwise_batch, 512)
        msgs = [b"bench-msg-%d" % i for i in range(nmsg)]
        hashing.hash_g2(msgs[0])  # warm native build
        workers = os.cpu_count() or 1
        t0 = time.time()
        with ThreadPoolExecutor(workers) as pool:
            list(pool.map(hashing.hash_g2, msgs))
        t_hash = time.time() - t0
        with result_lock:
            result["hash_g2_per_sec"] = round(nmsg / t_hash, 1)
            pp = result.get("per_pair_verifies_per_sec", 0.0)
            if pp:
                result["verify_with_hash_per_sec"] = round(
                    min(nmsg / t_hash, pp), 1
                )
            _emit(result)

    # ---- stage 2 (off-TPU/debug): stepwise RLC in-process ----------------
    if args.path != "stepwise" and not on_tpu \
            and args.deadline - _elapsed() > 60:
        try:
            rate, extras = _bench_rlc(rlc_batch, args.iters, np, jax)
            with result_lock:
                result["rlc_share_verifies_per_sec"] = round(rate, 2)
                result.update(extras)
                set_headline(rate, "rlc_batch")
                _emit(result)
            print(f"# stage2 rlc: {rate:.1f}/s elapsed={_elapsed():.0f}s",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover - keep stage-1 line valid
            print(f"# rlc stage failed ({type(e).__name__}: {e})",
                  file=sys.stderr)

    # ---- stage 3: wait out the child under the budget (its lines were
    # emitted by the reader thread the moment they landed) -----------------
    if child is not None:
        remaining = max(args.deadline - _elapsed() - 15, 1)
        try:
            child.wait(timeout=remaining)
        except subprocess.TimeoutExpired:
            child.kill()
            print(f"# child hit the {remaining:.0f}s budget; "
                  "keeping earlier result", file=sys.stderr)
        reader.join(timeout=30)

    print(f"# done: value={result['value']} mode={result.get('mode')} "
          f"elapsed={_elapsed():.0f}s", file=sys.stderr)


# ---------------------------------------------------------------------------
# Child stages
# ---------------------------------------------------------------------------

def _child_warm(args, rlc_batch, batch, check_batch, np, jax,
                dpr, hcv, R, ops) -> None:
    """Warm path: AOT-load the RLC MSM pair + per-pair check executables.
    RLC first — it is the 6x-better headline; if anything kills this
    child early, the line lost is the smaller per-pair one."""
    try:
        rate, extras = _bench_rlc_pallas(
            rlc_batch, check_batch, args.iters, np, jax
        )
        _emit({"stage": "rlc_pallas", "rate": rate, **extras})
    except Exception as e:
        print(f"# rlc_pallas stage failed ({type(e).__name__}: {e})",
              file=sys.stderr)
    pk_aff, h_aff, sig_aff = _make_batch(batch, dpr, hcv, R)
    out, best, compile_s = _measure(
        ops.verify_batch_pallas_jit, (pk_aff, h_aff, sig_aff),
        args.iters, np, jax,
    )
    assert out.all(), f"pallas verification batch failed: {out[:8]}"
    _emit({"stage": "pallas", "per_pair": batch / best, "batch": batch,
           "compile_s": round(compile_s, 1)})


def _child_cold(args, np, jax, dpr, hcv, R, ops) -> None:
    """Cold fallback: the exact r3 configuration measured to land at
    424 s from a cold cache on this host — ladder-MSM RLC at N=16384
    with the Pallas check at 512 lanes (the parent exports
    TC_TPU_ENGINE_BASE=16: the 16-bit kernels compile ~1.5x faster than
    the 13-bit default and compile latency is all that matters here).
    The per-pair stage then reuses the check executable for free."""
    n, check = 16384, 512
    try:
        rate, extras = _bench_rlc_pallas(
            n, check, args.iters, np, jax, msm="ladder"
        )
        _emit({"stage": "rlc_ladder", "rate": rate, **extras})
    except Exception as e:
        print(f"# rlc_ladder stage failed ({type(e).__name__}: {e})",
              file=sys.stderr)
    pk_aff, h_aff, sig_aff = _make_batch(check, dpr, hcv, R)
    out, best, compile_s = _measure(
        ops.verify_batch_pallas_jit, (pk_aff, h_aff, sig_aff),
        args.iters, np, jax,
    )
    assert out.all(), f"pallas verification batch failed: {out[:8]}"
    _emit({"stage": "pallas", "per_pair": check / best, "batch": check,
           "compile_s": round(compile_s, 1)})


def _make_rlc_batch(n, np):
    """Shared-message RLC batch: [N] pks + sigs over ONE hash point.

    Returns (pk_aff, sig_aff, h_jac, pk_np, sig_np): device affine pytrees
    plus host numpy copies of the point limbs (the transcript bytes a real
    verifier holds — `rlc_exponents` absorbs them without a device→host
    transfer).  Only 16 unique points are converted host-side; the batch
    is tiled at the limb level (converting 262k points one-by-one costs
    ~a minute of Python bignum work).
    """
    import jax

    from threshold_crypto_tpu.device import curve as dcv
    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.host.params import R

    rnd = random.Random(0xA66)
    n_unique = 16
    sks = [rnd.randrange(1, R) for _ in range(n_unique)]
    hk = rnd.randrange(1, R)
    h_host = hcv.G2.mul(hcv.G2.generator, hk)
    pk_host = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]
    sig_host = [hcv.G2.mul(h_host, s) for s in sks]
    reps = (n + n_unique - 1) // n_unique

    def tile(tree):
        return jax.tree_util.tree_map(
            lambda a: np.tile(
                np.asarray(a), (reps,) + (1,) * (a.ndim - 1)
            )[:n],
            tree,
        )

    pk_np = tile(dpr.g1_affine_from_host(pk_host))
    sig_np = tile(dpr.g2_affine_from_host(sig_host))
    to_dev = lambda tree: jax.tree_util.tree_map(
        lambda a: jax.device_put(a), tree
    )
    pk_aff, sig_aff = to_dev(pk_np), to_dev(sig_np)
    h_jac = dcv.G2.from_host_affine([h_host])
    return pk_aff, sig_aff, h_jac, pk_np, sig_np


def _bench_rlc_pallas(n, check_batch, iters, np, jax, msm="shared"):
    """Rate of Pallas-MSM RLC batch verification, exponent derivation
    included in the timed loop (a real verifier re-derives per batch;
    the transcript hashes on-device — `device/keccak.py` — and the
    ChaCha exponent stream expands on-device, so only digests cross the
    tunneled link)."""
    from threshold_crypto_tpu import ops

    pk_aff, sig_aff, h_jac, pk_np, sig_np = _make_rlc_batch(n, np)

    def run():
        r = ops.rlc_exponents(
            n, os.urandom(32), pk_aff=pk_aff, sig_aff=sig_aff
        )
        ok = ops.verify_sig_shares_rlc_pallas(
            pk_aff, h_jac, sig_aff, r, check_batch=check_batch, msm=msm
        )
        return bool(np.asarray(jax.device_get(ok)))

    t0 = time.time()
    ok = run()
    compile_s = time.time() - t0
    assert ok, "RLC (pallas) aggregate verification failed"
    times = []
    for _ in range(iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return n / min(times), {
        "rlc_batch": n, "compile_s": round(compile_s, 1),
    }


def _bench_rlc(n, iters, np, jax):
    """Rate of RLC batch share-verification: N shares on one message.

    The MSM part runs as one jit program; the single aggregate 2-pair check
    runs through the stepwise pairing (its ~1s wall cost is amortized over
    the N shares).  Returns (equivalent share-verifies/s, extra fields).
    """
    from threshold_crypto_tpu import ops

    pk_aff, sig_aff, h_jac, pk_np, sig_np = _make_rlc_batch(n, np)

    seed = os.urandom(32)
    r_plain = ops.rlc_exponents(n, seed, pk_aff=pk_np, sig_aff=sig_np)

    def run():
        ok = ops.verify_sig_shares_rlc_stepwise(
            pk_aff, h_jac, sig_aff, r_plain
        )
        return bool(np.asarray(jax.device_get(ok)))

    t0 = time.time()
    ok = run()
    compile_s = time.time() - t0
    assert ok, "RLC aggregate verification failed"
    times = []
    for _ in range(iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    best = min(times)
    return n / best, {
        "rlc_batch": n,
        "rlc_compile_s": round(compile_s, 1),
    }


if __name__ == "__main__":
    main()
