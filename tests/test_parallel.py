"""Mesh-sharded ops on the 8-virtual-device CPU mesh (conftest sets it up).

Multi-chip results must equal the single-device batched results — the
sharding is an implementation detail of the same math (SURVEY.md §2c).
"""

import random

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy device path (see pytest.ini)

from threshold_crypto_tpu import ops, parallel as par
from threshold_crypto_tpu.device import curve as dcv
from threshold_crypto_tpu.host import curve as hcv
from threshold_crypto_tpu.host.params import R
from threshold_crypto_tpu.ops import fr as frops

rnd = random.Random(0x9A11)

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, "conftest must force 8 CPU devices"
    return par.make_mesh(N_DEV)


@pytest.fixture(scope="module")
def scenario():
    t = 3
    coeffs = [rnd.randrange(R) for _ in range(t + 1)]
    f = lambda x: sum(c * pow(x, k, R) for k, c in enumerate(coeffs)) % R
    h_host = hcv.G2.mul(hcv.G2.generator, rnd.randrange(1, R))
    xs = list(range(1, N_DEV + 1))
    sks = [f(x) for x in xs]
    shares = [hcv.G2.mul(h_host, s) for s in sks]
    master = hcv.G2.mul(h_host, f(0))
    return h_host, xs, sks, shares, master


def test_sharded_sign(mesh, scenario):
    h_host, _, sks, shares, _ = scenario
    h_jac = par.shard_batch(mesh, dcv.G2.from_host_affine([h_host] * N_DEV))
    skp = par.shard_batch(mesh, dcv.fr_limbs_from_ints(sks))
    sig = par.sharded_sign(mesh, h_jac, skp)
    assert dcv.G2.to_host_affine(sig) == shares


def test_sharded_combine(mesh, scenario):
    _, xs, _, shares, master = scenario
    sh = par.shard_batch(mesh, dcv.G2.from_host_affine(shares))
    xm = par.replicate(mesh, frops.fr_to_device(xs))
    out, ok = par.sharded_combine(mesh, dcv.G2, sh, xm)
    assert bool(ok)
    got = dcv.G2.to_host_affine(
        jax.tree_util.tree_map(lambda a: a[None], out)
    )[0]
    assert got == master


def test_sharded_combine_duplicate_flagged(mesh, scenario):
    _, xs, _, shares, _ = scenario
    sh = par.shard_batch(mesh, dcv.G2.from_host_affine(shares))
    bad = par.replicate(mesh, frops.fr_to_device([1, 1] + xs[2:]))
    _, ok = par.sharded_combine(mesh, dcv.G2, sh, bad)
    assert not bool(ok)


def test_fused_combine_on_sharded_inputs(mesh, scenario):
    # jit(combine_batch) over sharded inputs (the dryrun path): XLA inserts
    # the collectives; result identical to the shard_map version.
    _, xs, _, shares, master = scenario
    sh = par.shard_batch(mesh, dcv.G2.from_host_affine(shares))
    xm = par.replicate(mesh, frops.fr_to_device(xs))
    with mesh:
        out, ok = jax.jit(ops.combine_batch, static_argnums=0)(
            dcv.G2, sh, xm
        )
    assert bool(ok)
    got = dcv.G2.to_host_affine(
        jax.tree_util.tree_map(lambda a: a[None], out)
    )[0]
    assert got == master


def test_sharded_verify_rlc(mesh, scenario):
    """Sharded RLC batch verification (the flagship throughput path under a
    mesh — VERDICT r3 weak #5): per-device partial 64-bit MSMs, collective
    point reduction, one replicated 2-pair check; accepts valid shares and
    rejects a tampered batch."""
    from threshold_crypto_tpu.device import pairing as dpr

    h_host, xs, sks, shares, _ = scenario
    pk_hosts = [hcv.G1.mul(hcv.G1.generator, s) for s in sks]
    pk_aff = par.shard_batch(mesh, dpr.g1_affine_from_host(pk_hosts))
    sig_aff = par.shard_batch(mesh, dpr.g2_affine_from_host(shares))
    h_jac = dcv.G2.from_host_affine([h_host])
    r_plain = ops.rlc_exponents(
        N_DEV, b"\x01" * 32, pk_aff=pk_aff, sig_aff=sig_aff
    )
    ok = par.sharded_verify_rlc(mesh, pk_aff, h_jac, sig_aff, r_plain)
    assert bool(ok)

    # tampered batch (share 3 replaced by share 2) must be rejected
    bad = list(shares)
    bad[3] = shares[2]
    bad_aff = par.shard_batch(mesh, dpr.g2_affine_from_host(bad))
    r_bad = ops.rlc_exponents(
        N_DEV, b"\x01" * 32, pk_aff=pk_aff, sig_aff=bad_aff
    )
    ok2 = par.sharded_verify_rlc(mesh, pk_aff, h_jac, bad_aff, r_bad)
    assert not bool(ok2)
