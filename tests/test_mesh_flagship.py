"""Flagship Pallas kernels under a sharded mesh (VERDICT r4 #2).

Before round 5 the mesh tests and the driver dryrun exercised only the
stepwise/window-1 paths; the shared-window MSM megakernel — the RLC
throughput path's core — had never run under a sharded mesh anywhere.
These tests run it through `shard_map` on the 8-virtual-device CPU mesh
in DIRECT mode (kernel bodies as plain jnp — the same cell functions the
TPU kernels execute; the fused pallas_call plumbing itself is validated
on-chip by benches/msm_shared.py) and assert the mesh result equals the
host oracle:

* per-device partial MSMs over the sharded lane axis,
* a cross-device point reduction of the n_dev partials (the collective
  the sharded RLC path relies on, `parallel/sharded.py`),
* the packed limb-major engine layout sharded over its row axis.

The full per-pair verify pipeline (~560 chained tower kernels) stays
TPU-only: inlining it as one XLA:CPU program costs hours of compile on
this 2-core host (PERF.md compile economics), and its per-lane
semantics contain no cross-device interaction — the sharding surface is
exactly the lane-axis split these tests cover.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy device path (see pytest.ini)

from jax.sharding import PartitionSpec as Pspec

from threshold_crypto_tpu import parallel as par
from threshold_crypto_tpu.device import curve as dcv
from threshold_crypto_tpu.device import mont
from threshold_crypto_tpu.device import pairing as dpr
from threshold_crypto_tpu.device import pallas_curve as pcv
from threshold_crypto_tpu.device import pallas_tower as ptw
from threshold_crypto_tpu.host import curve as hcv
from threshold_crypto_tpu.host.params import P as FQ_P
from threshold_crypto_tpu.host.params import R
from threshold_crypto_tpu.parallel.mesh import SHARE_AXIS

rnd = random.Random(0x5AD7)

N_DEV = 8
N = 8192  # 1024 lanes (one packed block) per device


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, "conftest must force 8 CPU devices"
    return par.make_mesh(N_DEV)


def _tiled_batch(curve_host, n, nbits, n_unique=16):
    """n lanes tiling n_unique points, with infinity / zero-scalar edge
    lanes, plus the host-oracle sum (grouped per unique point so the
    oracle costs n_unique scalar-muls, not n)."""
    uniq = [
        curve_host.mul(curve_host.generator, rnd.randrange(1, R))
        for _ in range(n_unique)
    ]
    pts = [uniq[i % n_unique] for i in range(n)]
    ks = [rnd.randrange(1 << nbits) for _ in range(n)]
    pts[1] = None  # infinity lane
    ks[0] = 0      # zero-scalar lane

    group = [0] * n_unique
    for i in range(n):
        if pts[i] is None:
            continue
        group[i % n_unique] += ks[i]
    acc = None
    for j, s in enumerate(group):
        if s % R == 0:
            continue
        term = curve_host.mul(uniq[j], s % R)
        acc = term if acc is None else curve_host.add(acc, term)

    scal = np.zeros((n, 16), np.uint32)
    for i, k in enumerate(ks):
        for limb in range(-(-nbits // 16)):
            scal[i, limb] = (k >> (16 * limb)) & 0xFFFF
    return pts, scal, acc


def _sharded_msm_partials(mesh, curve, aff, scal, nbits, window):
    """Per-device shared-window MSM partials via shard_map + the
    cross-device tree reduction (the sharded-RLC collective shape)."""

    def body(aff, scal):
        part = pcv.msm_pallas_shared(curve, aff, scal, nbits=nbits,
                                     window=window)
        return jax.tree_util.tree_map(lambda a: a[None], part)

    # check_vma=False: the kernel drivers seed scan carries from
    # replicated zeros which become device-varying through the body —
    # legal data flow that shard_map's varying-axis typing rejects
    # (same escape hatch the round-1 sharded_combine needed).
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(Pspec(SHARE_AXIS), Pspec(SHARE_AXIS)),
        out_specs=Pspec(SHARE_AXIS),
        check_vma=False,
    )
    ptw.DIRECT = True
    try:
        partials = fn(aff, scal)  # [N_DEV] Jacobian pytree
    finally:
        ptw.DIRECT = False
    return dcv._tree_sum(curve, partials)


def _run_sharded_shared(mesh, curve, curve_host, from_host, nbits=8,
                        window=3):
    pts, scal, want = _tiled_batch(curve_host, N, nbits)
    aff = par.shard_batch(mesh, from_host(pts))
    scal_s = par.shard_batch(mesh, jnp.asarray(scal))
    with mesh:
        total = _sharded_msm_partials(mesh, curve, aff, scal_s, nbits,
                                      window)
    got = curve.to_host_affine(
        jax.tree_util.tree_map(lambda a: a[None], total)
    )[0]
    assert got == want, f"{curve.name} sharded shared-window MSM mismatch"


def test_msm_pallas_shared_sharded_g1(mesh):
    """G1 shared-window MSM: 8 per-device partials + point reduction ==
    host oracle (8192 lanes, infinity + zero-scalar edges)."""
    _run_sharded_shared(mesh, dcv.G1, hcv.G1, dpr.g1_affine_from_host)


def test_msm_pallas_shared_sharded_g2(mesh):
    """G2 form of the same (the RLC signature-side MSM)."""
    _run_sharded_shared(mesh, dcv.G2, hcv.G2, dpr.g2_affine_from_host)


def test_sharded_verify_rlc_shared_msm(mesh):
    """`sharded_verify_rlc(msm="shared")`: the flagship shared-window MSM
    as the per-device partial kernel (VERDICT r4 #2b) — accepts a valid
    share batch and rejects a tampered one."""
    from threshold_crypto_tpu import ops

    t = 3
    coeffs = [rnd.randrange(R) for _ in range(t + 1)]
    f = lambda x: sum(c * pow(x, k, R) for k, c in enumerate(coeffs)) % R
    h_host = hcv.G2.mul(hcv.G2.generator, rnd.randrange(1, R))
    sks = [f(x) for x in range(1, N_DEV + 1)]
    shares = [hcv.G2.mul(h_host, s) for s in sks]
    pk_hosts = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]

    pk_aff = par.shard_batch(mesh, dpr.g1_affine_from_host(pk_hosts))
    sig_aff = par.shard_batch(mesh, dpr.g2_affine_from_host(shares))
    h_jac = dcv.G2.from_host_affine([h_host])
    r_plain = ops.rlc_exponents(
        N_DEV, b"\x02" * 32, pk_aff=pk_aff, sig_aff=sig_aff
    )
    ptw.DIRECT = True
    try:
        ok = par.sharded_verify_rlc(mesh, pk_aff, h_jac, sig_aff, r_plain,
                                    msm="shared")
        assert bool(ok)

        bad = list(shares)
        bad[3] = shares[2]
        bad_aff = par.shard_batch(mesh, dpr.g2_affine_from_host(bad))
        r_bad = ops.rlc_exponents(
            N_DEV, b"\x02" * 32, pk_aff=pk_aff, sig_aff=bad_aff
        )
        ok2 = par.sharded_verify_rlc(mesh, pk_aff, h_jac, bad_aff, r_bad,
                                     msm="shared")
        assert not bool(ok2)
    finally:
        ptw.DIRECT = False


def test_packed_engine_mul_sharded(mesh):
    """The packed limb-major multiply engine (the cell every megakernel
    stacks) sharded over its row axis: per-row independence means a
    lane-axis mesh split must be exact."""
    n = N_DEV * 1024
    a = [rnd.randrange(FQ_P) for _ in range(n)]
    b = [rnd.randrange(FQ_P) for _ in range(n)]

    def pack(vals):
        last = jnp.asarray(mont.stack_mont(mont.FQ, vals))
        return ptw.pack([last], n)  # [L, R, 128]

    pa, pb = pack(a), pack(b)
    fn = jax.shard_map(
        ptw.k_mul, mesh=mesh,
        in_specs=(Pspec(None, SHARE_AXIS), Pspec(None, SHARE_AXIS)),
        out_specs=Pspec(None, SHARE_AXIS),
    )
    with mesh:
        got_packed = fn(
            jax.device_put(pa, jax.NamedSharding(mesh, Pspec(None, SHARE_AXIS))),
            jax.device_put(pb, jax.NamedSharding(mesh, Pspec(None, SHARE_AXIS))),
        )
    got = mont.unstack_mont(
        mont.FQ, np.asarray(ptw.unpack(got_packed, 1, n)[0])
    )
    assert got == [(x * y) % FQ_P for x, y in zip(a, b)]
