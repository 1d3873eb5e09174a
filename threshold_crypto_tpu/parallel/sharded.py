"""Mesh-sharded forms of the batched protocol ops.

Three scaling patterns (SURVEY.md §2c / §5 long-context analog):

* `sharded_sign` / `sharded_verify` — embarrassingly parallel over the
  share batch: jit with the batch axis sharded; zero collectives.
* `sharded_combine` — the cross-share reduction: each shard computes its
  *local* partial MSM sum under `shard_map`, partial points are
  `all_gather`ed over the mesh axis (ICI), and the tiny per-device tail
  reduction adds the n_dev partials. This is the "ring of bucket sums"
  that replaces the reference's sequential t+1-term loop
  (`/root/reference/src/lib.rs:740-765`).

All functions expect inputs already placed by `mesh.shard_batch` /
`mesh.replicate`; they compile to one SPMD program per (mesh, shape).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..device import curve as dcv
from ..ops import fr as frops
from ..ops import threshold as tops
from .mesh import SHARE_AXIS, batch_spec


def sharded_sign(mesh, h_jac, sk_plain, axis: str = SHARE_AXIS):
    """sig_i = H_i·sk_i with the share batch sharded over the mesh."""

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P(axis)))
    def fn(h_jac, sk_plain):
        return tops.sign_batch(h_jac, sk_plain)

    with mesh:
        return fn(h_jac, sk_plain)


def sharded_verify(mesh, pk_aff, h_aff, sig_aff, axis: str = SHARE_AXIS):
    """Per-share fused pairing checks, batch axis sharded (no collectives)."""

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P(axis)))
    def fn(pk_aff, h_aff, sig_aff):
        return tops.verify_batch(pk_aff, h_aff, sig_aff)

    with mesh:
        return fn(pk_aff, h_aff, sig_aff)


def sharded_combine(mesh, curve: dcv.DeviceCurve, shares_jac, xs_mont,
                    axis: str = SHARE_AXIS):
    """Σ λ_i·share_i across the whole mesh; result replicated.

    shares_jac sharded on the batch axis; xs_mont replicated (it is tiny —
    [N, 16] u32 — and every shard needs all x's for its λ's).

    Returns (point pytree, ok[]) exactly like `ops.combine_batch`.
    """
    n_dev = mesh.devices.size

    def local(shares_local, lam_local):
        # [N/n_dev] points × λ's -> one local partial sum
        partial = curve.msm(shares_local, lam_local)
        # exchange partials over ICI; every device ends with all n_dev
        partial_b = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, axis), partial
        )
        # tiny replicated tail reduction: n_dev-1 point adds
        acc = jax.tree_util.tree_map(lambda a: a[0], partial_b)
        for i in range(1, n_dev):
            nxt = jax.tree_util.tree_map(lambda a: a[i], partial_b)
            acc = curve.add(acc, nxt)
        return acc

    @jax.jit
    def fn(shares_jac, xs_mont):
        lam_mont, ok = frops.lagrange_coeffs_at_zero(xs_mont)
        lam_plain = frops.fr_to_plain(lam_mont)
        out = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(batch_spec(shares_jac, axis), P(axis)),
            # the local output is one point with the same treedef as the
            # batched input, fully replicated after the all_gather
            out_specs=jax.tree_util.tree_map(lambda _: P(), shares_jac),
            # the generic curve kernels mix shard-varying data with
            # replicated constants (scan carries seeded from broadcast
            # generator limbs); skip the varying-axes type check rather
            # than thread pcast through shared code
            check_vma=False,
        )(shares_jac, lam_plain)
        return out, ok

    with mesh:
        return fn(shares_jac, xs_mont)
