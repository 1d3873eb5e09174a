"""Device-mesh construction and sharding helpers.

The reference has no parallelism at all (SURVEY.md §2c): its "distribution"
is protocol-level. Here the share/signature batch is the data-parallel axis,
sharded over a 1-D mesh of TPU chips; cross-share reductions (Lagrange
combine, MSM) ride ICI collectives inside `shard_map` regions.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARE_AXIS = "shares"


def make_mesh(n_devices: int | None = None, axis: str = SHARE_AXIS) -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(jax.devices())}"
            )
    return Mesh(np.array(devs), axis_names=(axis,))


def shard_batch(mesh: Mesh, tree, axis: str = SHARE_AXIS):
    """Place every leaf of a batched pytree with its leading dim sharded."""
    s = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)


def replicate(mesh: Mesh, tree):
    """Place every leaf fully replicated over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)


def batch_spec(tree, axis: str = SHARE_AXIS):
    """PartitionSpec pytree: leading dim sharded on `axis` for every leaf."""
    return jax.tree_util.tree_map(lambda _: P(axis), tree)


def repl_spec(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)
