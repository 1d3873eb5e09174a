"""Worker process for the 2-process multi-host tests (test_multihost.py).

Run as:  python mh_worker.py <coordinator> <process_id> <phase>

Exercises threshold_crypto_tpu.parallel.multihost for real (world size 2,
2 virtual CPU devices per process -> 4-device global mesh) — the runtime
analog of the reference's network boundary at
`/root/reference/src/poly.rs:838-851`.  Prints "WORKER-OK <pid>" on success;
any assertion failure exits nonzero.
"""

import os
import sys

coordinator, pid, phase = sys.argv[1], int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    .replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from threshold_crypto_tpu.parallel import multihost as mh  # noqa: E402


def main():
    assert mh.initialize(coordinator, 2, pid) is True
    idx, cnt = mh.world()
    assert idx == pid and cnt == 2, (idx, cnt)
    mesh = mh.global_mesh()
    assert mesh.devices.size == 4, mesh  # 2 procs x 2 virtual devices

    if phase == "basic":
        run_basic(mesh)
    elif phase == "combine":
        run_combine(mesh)
    elif phase == "rlc":
        run_rlc(mesh)
    else:
        raise SystemExit(f"unknown phase {phase}")
    print(f"WORKER-OK {pid}", flush=True)


def run_basic(mesh):
    """Dealer broadcast of real protocol bytes + replicated-state guard +
    one cross-process collective over the global mesh."""
    import threshold_crypto_tpu as tc
    from threshold_crypto_tpu import serde_impl
    from threshold_crypto_tpu.utils.rng import ChaChaRng

    # dealer (process 0) generates a key set and broadcasts the public side
    if pid == 0:
        sk_set = tc.SecretKeySet.random(1, ChaChaRng(b"\x2a" * 32))
        payload = serde_impl.serialize(sk_set.public_keys())
        got = mh.broadcast_bytes(payload, max_len=4096)
        assert got == payload
    else:
        got = mh.broadcast_bytes(None, max_len=4096)
    pk_set = serde_impl.deserialize(tc.PublicKeySet, got)
    # both processes must land on the dealer's key set (the dealer's RNG is
    # deterministic here so the non-dealer can cross-check independently)
    expect = tc.SecretKeySet.random(1, ChaChaRng(b"\x2a" * 32)).public_keys()
    assert pk_set == expect

    mh.assert_equal_across_hosts(
        {"pk": np.frombuffer(got, np.uint8)}, "public key set"
    )

    # one SPMD reduction across the 4-device (2-process) mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    arr = jax.device_put(
        np.arange(4, dtype=np.float32), NamedSharding(mesh, P(mh.SHARE_AXIS))
    )
    total = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(arr)
    assert float(total) == 6.0


def run_rlc(mesh):
    """Sharded RLC batch verification across the 2-process mesh: per-device
    partial MSMs on each process, cross-process collective point reduce,
    one replicated product check (the flagship throughput path's multi-host
    form — VERDICT r3 weak #5).  Accepts valid shares, rejects tampering."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from threshold_crypto_tpu import ops, parallel as par
    from threshold_crypto_tpu.device import curve as dcv
    from threshold_crypto_tpu.device import pairing as dpr
    from threshold_crypto_tpu.host import curve as hcv

    n = 4  # one share per device
    sks = [2000 + 11 * i for i in range(n)]
    h_host = hcv.G2.mul(hcv.G2.generator, 0xF00D)
    pk_hosts = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]
    sig_hosts = [hcv.G2.mul(h_host, s) for s in sks]

    shard = NamedSharding(mesh, P(mh.SHARE_AXIS))
    put = lambda tree: jax.tree_util.tree_map(
        lambda a: jax.device_put(a, shard), tree
    )
    pk_aff = put(dpr.g1_affine_from_host(pk_hosts))
    sig_aff = put(dpr.g2_affine_from_host(sig_hosts))
    h_jac = dcv.G2.from_host_affine([h_host])
    r_plain = ops.rlc_exponents(n, b"\x11" * 32, pk_aff=pk_aff,
                                sig_aff=sig_aff)
    with mesh:
        ok = bool(jax.device_get(par.sharded_verify_rlc(
            mesh, pk_aff, h_jac, sig_aff, r_plain, check_batch=n
        )))
        assert ok, "sharded RLC rejected a valid batch"

        bad = list(sig_hosts)
        bad[2] = sig_hosts[1]
        bad_aff = put(dpr.g2_affine_from_host(bad))
        r_bad = ops.rlc_exponents(n, b"\x11" * 32, pk_aff=pk_aff,
                                  sig_aff=bad_aff)
        ok2 = bool(jax.device_get(par.sharded_verify_rlc(
            mesh, pk_aff, h_jac, bad_aff, r_bad, check_batch=n
        )))
        assert not ok2, "sharded RLC accepted a tampered batch"


def run_combine(mesh):
    """Sharded sign + combine across the 2-process mesh; the combined
    signature must equal the host-oracle combine of the same shares."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from threshold_crypto_tpu import ops
    from threshold_crypto_tpu.device import curve as dcv
    from threshold_crypto_tpu.host import curve as hcv
    from threshold_crypto_tpu.ops import fr as frops

    n = 4  # one share per device
    sks = [1000 + 7 * i for i in range(n)]
    h_host = hcv.G2.mul(hcv.G2.generator, 0xBEEF)
    h_jac = dcv.G2.from_host_affine([h_host] * n)
    sk_plain = dcv.fr_limbs_from_ints(sks)
    xs_mont = frops.fr_to_device(list(range(1, n + 1)))

    shard = NamedSharding(mesh, P(mh.SHARE_AXIS))
    repl = NamedSharding(mesh, P())
    put = lambda tree, s: jax.tree_util.tree_map(
        lambda a: jax.device_put(a, s), tree
    )
    h_jac = put(h_jac, shard)
    sk_plain = jax.device_put(sk_plain, shard)
    xs_mont = jax.device_put(xs_mont, repl)

    with mesh:
        sig_jac = dcv.G2.scalar_mul_stepwise(h_jac, sk_plain, window=1)
        combined, ok = jax.jit(ops.combine_batch, static_argnums=(0, 3))(
            dcv.G2, sig_jac, xs_mont, "bitscan"
        )
        ok = bool(jax.device_get(ok))
        combined = jax.tree_util.tree_map(jax.device_get, combined)
    assert ok

    # host-oracle reference: interpolate the same shares at x=0
    from threshold_crypto_tpu.host.params import R

    lam = _host_lagrange_at_zero(list(range(1, n + 1)), R)
    expect = None
    for l, s in zip(lam, sks):
        term = hcv.G2.mul(h_host, (l * s) % R)
        expect = term if expect is None else hcv.G2.add(expect, term)
    got_aff = dcv.G2.to_host_affine(
        jax.tree_util.tree_map(lambda a: np.asarray(a)[None], combined)
    )[0]
    assert got_aff == expect, "sharded combine != host oracle combine"


def _host_lagrange_at_zero(xs, r):
    lams = []
    for i, xi in enumerate(xs):
        num = den = 1
        for j, xj in enumerate(xs):
            if j != i:
                num = num * xj % r
                den = den * (xj - xi) % r
        lams.append(num * pow(den, -1, r) % r)
    return lams


if __name__ == "__main__":
    main()
