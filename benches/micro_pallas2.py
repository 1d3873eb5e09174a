"""Find the pure in-kernel Montgomery-mul rate: chain K muls inside ONE
Pallas kernel (no scan steps, no HBM round-trips) at several tile heights.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from threshold_crypto_tpu.device import mont, pallas_mont
from threshold_crypto_tpu.device.mont import FQ


def chain_call(spec, a, b, K, TR):
    L = spec.L
    R = a.shape[1]

    def kernel(a_ref, b_ref, o_ref):
        acc = [a_ref[i] for i in range(L)]
        bb = [b_ref[i] for i in range(L)]

        class _Ref:
            def __init__(self, rows):
                self.rows = rows

            def __getitem__(self, i):
                return self.rows[i]

        outs = [None] * L

        class _Out:
            def __setitem__(self, i, v):
                outs[i] = v

        for _ in range(K):
            pallas_mont._mul_kernel(spec, _Ref(acc), _Ref(bb), _Out())
            acc = list(outs)
        for i in range(L):
            o_ref[i] = acc[i]

    block = pl.BlockSpec(
        (L, TR, pallas_mont.LANES), lambda g: (0, g, 0),
        memory_space=pltpu.VMEM,
    )
    f = jax.jit(
        lambda a, b: pl.pallas_call(
            kernel,
            grid=(R // TR,),
            in_specs=[block, block],
            out_specs=block,
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        )(a, b)
    )
    return f


def main():
    rng = np.random.default_rng(3)
    K = 32
    n = 65536
    vals = [int.from_bytes(rng.bytes(48), "little") % FQ.p for _ in range(n)]
    arr = np.stack([mont.to_mont(FQ, v) for v in vals])
    a2 = jnp.asarray(arr.T.copy().reshape(FQ.L, n // 128, 128))
    b2 = jnp.asarray(np.roll(arr, 1, 0).T.copy().reshape(FQ.L, n // 128, 128))

    # correctness of the chained kernel vs host ints
    f = chain_call(FQ, a2, b2, 2, 8)
    got = np.asarray(jax.device_get(f(a2, b2)))
    got_int = [
        mont.from_mont_int(FQ, got.reshape(FQ.L, n).T[i]) for i in range(4)
    ]
    want = [
        (vals[i] * pow(vals[(i - 1) % n], 2, FQ.p)) % FQ.p for i in range(4)
    ]
    assert got_int == want, f"chain mismatch\n{got_int}\n{want}"
    print("in-kernel chain correctness OK")

    for TR in (8, 16, 32):
        f = chain_call(FQ, a2, b2, K, TR)
        np.asarray(jax.device_get(f(a2, b2)))
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(f(a2, b2)))
            ts.append(time.perf_counter() - t0)
        # subtract pure-readback baseline measured with K=0-ish (K=1)
        f1 = chain_call(FQ, a2, b2, 1, TR)
        np.asarray(jax.device_get(f1(a2, b2)))
        t1s = []
        for _ in range(10):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(f1(a2, b2)))
            t1s.append(time.perf_counter() - t0)
        dt = min(ts) - min(t1s)
        rate = n * (K - 1) / max(dt, 1e-9)
        print(f"TR={TR:2d}: chain K={K}: dt={dt*1e3:8.2f} ms  {rate/1e6:9.1f} M fqmul/s")


if __name__ == "__main__":
    main()
