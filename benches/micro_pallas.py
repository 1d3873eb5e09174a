"""Correctness + throughput check of the Pallas Montgomery kernel on TPU.

Usage: python benches/micro_pallas.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from threshold_crypto_tpu.device import mont, pallas_mont
from threshold_crypto_tpu.device.mont import FQ, FR


def timeit(fn, *args, iters=8):
    np.asarray(jax.device_get(fn(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print(f"devices: {jax.devices()}  use_pallas={mont.use_pallas()}")
    rng = np.random.default_rng(7)

    for spec in (FQ, FR):
        n = 1024
        av = [int.from_bytes(rng.bytes(64), "little") % spec.p for _ in range(n)]
        bv = [int.from_bytes(rng.bytes(64), "little") % spec.p for _ in range(n)]
        a = jnp.asarray(np.stack([mont.to_mont(spec, v) for v in av]))
        b = jnp.asarray(np.stack([mont.to_mont(spec, v) for v in bv]))
        got = np.asarray(jax.device_get(pallas_mont.mul(spec, a, b)))
        want = [(x * y) % spec.p for x, y in zip(av, bv)]
        got_int = [mont.from_mont_int(spec, row) for row in got]
        assert got_int == want, f"{spec}: MISMATCH"
        print(f"{spec}: correctness OK (n={n})")

    # throughput: chained muls to amortize transfer
    K = 64
    for n in (1024, 8192, 65536, 262144):
        vals = [int.from_bytes(rng.bytes(48), "little") % FQ.p for _ in range(n)]
        arr = np.stack([mont.to_mont(FQ, v) for v in vals])
        a = jnp.asarray(arr)
        b = jnp.asarray(np.roll(arr, 1, axis=0))

        @jax.jit
        def chain(x, y):
            def body(acc, _):
                return pallas_mont.mul(FQ, acc, y), None
            out, _ = jax.lax.scan(body, x, None, length=K)
            return out

        t = timeit(chain, a, b)
        print(f"pallas n={n:7d}: {t*1e3:8.2f} ms  {n*K/t/1e6:9.1f} M fqmul/s")


if __name__ == "__main__":
    main()
