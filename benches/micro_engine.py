"""Fq-multiply engine shootout on chip (VERDICT r4 items #2/#3).

Three candidate inner loops for the universal hot op (381-bit Montgomery
multiply), measured as sustained Fq-mul/s on identical batches:

  16-bit — the production SOS engine (`pallas_tower.k_mul`): 24 limbs,
           every 16×16 product split lo/hi before column accumulation.
  13-bit — prototype: 30×13-bit limbs; 13×13 products are < 2^26, so a
           column of 30 accumulates RAW in uint32 (no splits, no
           mid-column carries) — ~2.1k fewer lane-ops per multiply.
  mxu    — the limb-product matrix formulation: per-lane outer product
           a⊗b contracted with a constant one-hot [48·48, 95] int8 matrix
           on the MXU (int8×int8→int32 dot), measuring whether the
           systolic array can beat the VPU at big-int column sums.

Each Pallas engine runs K sequential stacked multiplies per kernel call
(steady-state, dependency-chained so nothing folds away); the MXU path is
an XLA-level dot_general.  Prints one line per engine with Fq-mul/s.

Usage: python benches/micro_engine.py [--rows 56] [--chain 16] [--calls 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=56,
                    help="sublane rows per block (stack width x 8)")
    ap.add_argument("--chain", type=int, default=16,
                    help="dependent multiplies per kernel call")
    ap.add_argument("--calls", type=int, default=20)
    ap.add_argument("--repeat", type=int, default=32,
                    help="sequential grid steps per dispatch")
    ap.add_argument("--mxu-batch", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from threshold_crypto_tpu.device import pallas_tower as ptw
    from threshold_crypto_tpu.host.params import P

    LANES = 128
    ROWS = args.rows
    CHAIN = args.chain

    import random as _pyrandom

    pr = _pyrandom.Random(0xE45)
    rnd = np.random.default_rng(0xE45)

    # deterministic host values < p
    vals_a = [pr.randrange(1, P) for _ in range(8)]
    vals_b = [pr.randrange(1, P) for _ in range(8)]

    def limbs(vals, base, L):
        """Each (row, lane) holds ONE value's limbs (vals tiled)."""
        mask = (1 << base) - 1
        idx = (
            np.arange(ROWS)[:, None] * LANES + np.arange(LANES)[None, :]
        ) % len(vals)
        out = np.zeros((L, ROWS, LANES), np.uint32)
        for i in range(L):
            lv = np.array(
                [(v >> (base * i)) & mask for v in vals], np.uint32
            )
            out[i] = lv[idx]
        return jnp.asarray(out)

    def bench(fn, a, b, label, muls_per_call):
        t0 = time.time()
        out = jax.device_get(fn(a, b))  # true sync: the tunneled link's
        compile_s = time.time() - t0    # block_until_ready is not enough
        times = []
        for _ in range(3):
            c = a
            t0 = time.time()
            for _ in range(args.calls):
                c = fn(c, b)
            jax.device_get(c)
            times.append((time.time() - t0) / args.calls)
        best = min(times)
        rate = muls_per_call / best
        print(f"{label}: {rate/1e6:.1f} M Fq-mul/s "
              f"(call={best*1e3:.2f} ms, compile={compile_s:.1f}s)",
              flush=True)
        return out, rate

    REPEAT = args.repeat  # sequential grid steps: amortize the ~2.5 ms
    # tunneled dispatch latency under REPEAT x CHAIN muls of compute
    muls_per_call = REPEAT * CHAIN * ROWS * LANES

    # ---- 16-bit production engine ----------------------------------------
    def k16(a_ref, b_ref, o_ref):
        c = a_ref[...]
        b = b_ref[...]
        for _ in range(CHAIN):
            c = ptw.k_mul(c, b)
        o_ref[...] = c

    L16 = 24
    a16 = limbs(vals_a, 16, L16)
    b16 = limbs(vals_b, 16, L16)

    def _gridded(kern, L):
        spec = pl.BlockSpec((L, ROWS, LANES), lambda g: (0, 0, 0),
                            memory_space=pltpu.VMEM)

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kern,
                grid=(REPEAT,),
                in_specs=[spec, spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((L, ROWS, LANES), jnp.uint32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024
                ),
            )(a, b)

        return run

    run16 = _gridded(k16, L16)

    out16, _ = bench(run16, a16, b16, "engine16", muls_per_call)

    # ---- 13-bit prototype -------------------------------------------------
    B13, L13 = 13, 30
    M13 = np.uint32((1 << 13) - 1)
    P13 = [np.uint32((P >> (13 * i)) & int(M13)) for i in range(L13)]
    N0INV13 = np.uint32((-pow(P, -1, 1 << 13)) & int(M13))

    def tree_sum(terms, zero):
        if not terms:
            return zero
        while len(terms) > 1:
            nxt = [terms[i] + terms[i + 1]
                   for i in range(0, len(terms) - 1, 2)]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]

    def mul13(a, b):
        zero = jnp.zeros_like(a[0])
        al = [a[i] for i in range(L13)]
        bl = [b[i] for i in range(L13)]
        T = []
        carry = zero
        for k in range(2 * L13 - 1):
            prods = [
                al[i] * bl[k - i]
                for i in range(max(0, k - L13 + 1), min(k, L13 - 1) + 1)
            ]
            col = carry + tree_sum(prods, zero)  # raw: < 30·2^26 + 2^18
            T.append(col & M13)
            carry = col >> 13
        T.append(carry)
        m = []
        carry = zero
        U = []
        for k in range(2 * L13):
            prods = [
                m[i] * P13[k - i]
                for i in range(max(0, k - L13 + 1),
                               min(k, L13 - 1, len(m) - 1) + 1)
            ]
            col = T[k] + carry + tree_sum(prods, zero)
            if k < L13:
                mk = ((col & M13) * N0INV13) & M13
                m.append(mk)
                col = col + mk * P13[0]
            else:
                U.append(col & M13)
            carry = col >> 13
        over = carry
        big = np.uint32(1 << 13)
        diff = []
        borrow = zero
        for j in range(L13):
            d = U[j] + big - P13[j] - borrow
            diff.append(d & M13)
            borrow = np.uint32(1) - (d >> 13)
        take = (over != 0) | (borrow == 0)
        return jnp.stack(
            [jnp.where(take, diff[j], U[j]) for j in range(L13)], axis=0
        )

    def k13(a_ref, b_ref, o_ref):
        c = a_ref[...]
        b = b_ref[...]
        for _ in range(CHAIN):
            c = mul13(c, b)
        o_ref[...] = c

    a13 = limbs(vals_a, 13, L13)
    b13 = limbs(vals_b, 13, L13)

    run13 = _gridded(k13, L13)

    out13, _ = bench(run13, a13, b13, "engine13", muls_per_call)

    # cross-check: both engines computed a·b·R⁻¹ with different R; compare
    # the plain products mod p by converting back on the host.
    def to_int(arr, base, L):
        arr = np.asarray(arr)
        return sum(int(arr[i, 0, 0]) << (base * i) for i in range(L))

    r16 = to_int(out16, 16, L16)
    r13 = to_int(out13, 13, L13)
    a0, b0 = int(vals_a[0]), int(vals_b[0])
    # chained: c_{k+1} = c_k·b·R⁻¹; closed form c = a·b^CHAIN·R^-CHAIN
    exp16 = a0 * pow(b0, CHAIN, P) * pow(pow(2, 384 * CHAIN, P), -1, P) % P
    exp13 = a0 * pow(b0, CHAIN, P) * pow(pow(2, 390 * CHAIN, P), -1, P) % P
    print(f"check16 {'OK' if r16 == exp16 else 'MISMATCH'} "
          f"check13 {'OK' if r13 == exp13 else 'MISMATCH'}", flush=True)

    # ---- MXU formulation --------------------------------------------------
    # Column sums T_k = Σ_{i+j=k} a8_i·b8_j over 48 int8 limb-halves, as
    # (outer product per lane) ⋅ (constant one-hot [2304, 95] matrix).
    NB = args.mxu_batch
    L8 = 48
    onehot = np.zeros((L8 * L8, 2 * L8 - 1), np.int8)
    for i in range(L8):
        for j in range(L8):
            onehot[i * L8 + j, i + j] = 1
    onehot_j = jnp.asarray(onehot)

    a8 = jnp.asarray(rnd.integers(0, 128, (NB, L8), np.int8))
    b8 = jnp.asarray(rnd.integers(0, 128, (NB, L8), np.int8))

    @jax.jit
    def run_mxu(a, b):
        outer = (a[:, :, None].astype(jnp.int32)
                 * b[:, None, :].astype(jnp.int32))  # VPU: 2304 muls/lane
        flat = outer.reshape(NB, L8 * L8)
        # int32 × int8 dot -> int32 columns (XLA picks the unit; measures
        # whether a systolic contraction beats VPU tree-sums)
        return jax.lax.dot_general(
            flat, onehot_j.astype(jnp.int32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    t0 = time.time()
    jax.block_until_ready(run_mxu(a8, b8))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(args.calls):
            jax.block_until_ready(run_mxu(a8, b8))
        times.append((time.time() - t0) / args.calls)
    best = min(times)
    # one call = NB half-multiplies worth of columns ≈ NB Fq phase-1 passes
    print(f"mxu-dot: {NB/best/1e6:.2f} M column-pass/s "
          f"(call={best*1e3:.2f} ms, compile={compile_s:.1f}s; one pass = "
          f"phase-1 column sums of one Fq mul)", flush=True)


if __name__ == "__main__":
    main()
