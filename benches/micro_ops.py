"""Isolate per-instruction VPU costs inside a Pallas kernel.

Methodology notes for the tunneled 'axon' platform:
* every device_get costs ~40 ms fixed, so kernels return only an (8,128)
  tile and each op is timed at two unroll depths — the difference cancels
  both the readback and the dispatch overhead.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_fn(op, reps, shape, dtype):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        acc = a
        for i in range(reps):
            acc = op(acc, b)
        o_ref[...] = acc[:8, :128]

    @jax.jit
    def f(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    return f


def timed(f, a, b, iters=8):
    np.asarray(jax.device_get(f(a, b)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(f(a, b)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(op, a, b, name, r1=64, r2=1024):
    f1 = make_fn(op, r1, a.shape, a.dtype)
    f2 = make_fn(op, r2, a.shape, a.dtype)
    t1 = timed(f1, a, b)
    t2 = timed(f2, a, b)
    n_ops = a.size * (r2 - r1)
    rate = n_ops / max(t2 - t1, 1e-9)
    print(f"{name:18s}: dt={1e3*(t2-t1):8.2f} ms  {rate/1e9:9.2f} Gop/s")


def main():
    shape = (256, 1024)  # 262144 elements = 256 (8,128) tiles
    rng = np.random.default_rng(0)
    au = jnp.asarray(rng.integers(0, 1 << 16, shape, dtype=np.int64).astype(np.uint32))
    bu = jnp.asarray(rng.integers(1, 1 << 16, shape, dtype=np.int64).astype(np.uint32))
    af = au.astype(jnp.float32)
    bf = bu.astype(jnp.float32)

    bench(lambda x, y: x + y, au, bu, "u32 add")
    bench(lambda x, y: x * y, au, bu, "u32 mul")
    bench(lambda x, y: (x * y) & np.uint32(0xFFFF), au, bu, "u32 mul+mask")
    bench(lambda x, y: x >> 16, au, bu, "u32 shift")
    bench(lambda x, y: x * y + y, af, bf, "f32 fma")
    bench(lambda x, y: x + y, af, bf, "f32 add")


if __name__ == "__main__":
    main()
