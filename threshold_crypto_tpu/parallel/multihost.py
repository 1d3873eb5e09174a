"""Multi-host runtime plumbing (SURVEY.md §2c, last row).

The reference's "distribution" is protocol-level: share-holders exchange
serde bytes over the caller's network (`/root/reference/README.md:98-101`).
This module is the TPU-native runtime side of that story: when one logical
verifier/combiner spans several hosts (a pod slice), JAX's distributed
runtime carries the *data-plane* (ICI within a slice, DCN across), while the
protocol bytes still travel over the application's transport.

Everything degrades gracefully to single-process: `initialize()` no-ops when
no coordinator is configured, `global_mesh()` falls back to the local
devices, and `broadcast_bytes` is the identity at world size 1 — so the same
program text runs from a laptop CPU to a multi-host slice (tested
single-host; the dryrun exercises the virtual 8-device mesh).
"""

from __future__ import annotations

import os

import numpy as np

import jax

from .mesh import SHARE_AXIS

_initialized = False


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """`jax.distributed.initialize` with env/arg wiring; returns True when a
    multi-process runtime came up, False for single-process operation.

    Arguments default to the standard JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID environment variables; with none
    set, this is a documented no-op (world size 1).
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return False
    kwargs = {"coordinator_address": coordinator}
    n = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if n is not None:
        kwargs["num_processes"] = int(n)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return jax.process_count() > 1


def world():
    """(process_index, process_count) of the current runtime."""
    return jax.process_index(), jax.process_count()


def global_mesh(axis: str = SHARE_AXIS):
    """1-D mesh over every device of every process (ICI+DCN), axis name
    shared with the single-host helpers so sharded ops are unchanged."""
    return jax.sharding.Mesh(np.array(jax.devices()), axis_names=(axis,))


def broadcast_bytes(data: bytes | None, max_len: int = 1 << 20) -> bytes:
    """Dealer-style broadcast of opaque protocol bytes (ciphertexts,
    commitments, public key sets) from process 0 to every process.

    The multi-host analog of the reference's network boundary at
    `/root/reference/src/poly.rs:838-851` (BROADCAST commit / SEND row):
    serialized protocol objects go through here; the receiving side
    deserializes with the normal validating codecs (serde_impl).

    Single-process: identity.  Multi-process: pads to a fixed-length u8
    array and rides `multihost_utils.broadcast_one_to_all`.
    """
    if jax.process_count() <= 1:
        if data is None:
            raise ValueError("process 0 must supply data")
        return bytes(data)

    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        if data is None:
            raise ValueError("process 0 must supply data")
        if len(data) > max_len:
            raise ValueError(f"payload {len(data)} exceeds max_len {max_len}")
        buf = np.zeros(max_len + 8, np.uint8)
        buf[:8] = np.frombuffer(
            len(data).to_bytes(8, "little"), np.uint8
        )
        buf[8 : 8 + len(data)] = np.frombuffer(bytes(data), np.uint8)
    else:
        buf = np.zeros(max_len + 8, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    n = int.from_bytes(bytes(np.asarray(out[:8])), "little")
    return bytes(np.asarray(out[8 : 8 + n]))


def assert_equal_across_hosts(tree, name: str = "value") -> None:
    """Guard that replicated protocol state really is identical everywhere
    (cheap corruption/desync detector for multi-host deployments)."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.assert_equal(tree, fail_message=f"{name} diverged across hosts")
