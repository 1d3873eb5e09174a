"""Microbenchmark: batched Montgomery Fq multiply on the real chip.

Quantifies the two levers for the device field engine:
  * batch size (op-dispatch overhead amortization),
  * limb-axis placement ([N, L] limbs-last vs [L, N] lanes-last).

Usage: python benches/micro_mont.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from threshold_crypto_tpu.device import mont
from threshold_crypto_tpu.device.mont import FQ


def timeit(fn, *args, iters=10):
    """Forces a device->host readback each rep: on the tunneled 'axon'
    platform, block_until_ready alone returns before the remote compute
    finishes, so only a readback gives a true wall-clock."""
    np.asarray(jax.device_get(fn(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain_mul(a, b, k=32):
    """k dependent muls — amortizes dispatch so we see steady-state rate."""
    def body(x, _):
        return mont._mont_mul_impl(FQ, x, b), None
    x, _ = jax.lax.scan(body, a, None, length=k)
    return x


# limbs-first variant: element = uint32[L, N] (lanes = batch)
MASK16 = np.uint32(0xFFFF)


def mul_limbs_first(a, b):
    """CIOS with limb axis leading: every op is a [N]-wide lane op."""
    L = FQ.L
    n0inv = jnp.uint32(FQ.n0inv)
    p = [jnp.uint32(v) for v in FQ.p_limbs]
    t = [jnp.zeros_like(a[0]) for _ in range(L + 1)]
    for i in range(L):
        ai = a[i]
        carry = jnp.zeros_like(ai)
        for j in range(L):
            prod = ai * b[j]
            t[j] = t[j] + (prod & MASK16)
            t[j + 1] = t[j + 1] + (prod >> 16)
        m = ((t[0] & MASK16) * n0inv) & MASK16
        for j in range(L):
            prod = m * p[j]
            t[j] = t[j] + (prod & MASK16)
            t[j + 1] = t[j + 1] + (prod >> 16)
        carry = t[0] >> 16
        t = t[1:] + [jnp.zeros_like(ai)]
        t[0] = t[0] + carry
    # carry resolve
    out = []
    c = jnp.zeros_like(t[0])
    for j in range(L):
        s = t[j] + c
        out.append(s & MASK16)
        c = s >> 16
    # conditional subtract omitted (timing only; same cost class)
    return jnp.stack(out)


def chain_mul_lf(a, b, k=32):
    def body(x, _):
        return mul_limbs_first(x, b), None
    x, _ = jax.lax.scan(body, a, None, length=k)
    return x


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    K = 32
    for n in (256, 1024, 4096, 16384, 65536):
        vals = [
            int.from_bytes(rng.bytes(48), "little") % FQ.p for _ in range(n)
        ]
        arr = np.stack([mont.to_mont(FQ, v) for v in vals])  # [N, L]
        a = jnp.asarray(arr)
        b = jnp.asarray(np.roll(arr, 1, axis=0))
        f = jax.jit(lambda x, y: chain_mul(x, y, K))
        t = timeit(f, a, b)
        rate = n * K / t
        print(f"[N,L] scan   n={n:6d}: {t*1e3:8.2f} ms  {rate/1e6:9.2f} M fqmul/s")

        a_t = jnp.asarray(arr.T.copy())  # [L, N]
        b_t = jnp.asarray(np.roll(arr, 1, axis=0).T.copy())
        f2 = jax.jit(lambda x, y: chain_mul_lf(x, y, K))
        t2 = timeit(f2, a_t, b_t)
        rate2 = n * K / t2
        print(f"[L,N] unroll n={n:6d}: {t2*1e3:8.2f} ms  {rate2/1e6:9.2f} M fqmul/s")


if __name__ == "__main__":
    main()
