"""Multi-host runtime helpers: single-process graceful degradation AND a
real 2-process world (two spawned CPU processes, Gloo collectives, 4-device
global mesh) — SURVEY §4: "multi-host tests run the same pjit program on a
2+ host mesh"."""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _run_two_process(phase: str, timeout: float):
    """Spawn two mh_worker.py processes sharing a coordinator; return their
    (rc, output) pairs."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = {
        k: v for k, v in os.environ.items() if not k.startswith("JAX_")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(i), phase],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


def test_two_process_runtime_and_broadcast():
    """World size 2 for real: initialize, 4-device global mesh, dealer
    broadcast of serialized protocol bytes, replicated-state guard, and one
    cross-process SPMD reduction."""
    outs = _run_two_process("basic", timeout=480)
    for i, (rc, out) in enumerate(outs):
        assert rc == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER-OK {i}" in out


@pytest.mark.slow
def test_two_process_sharded_combine():
    """Sharded sign + Lagrange combine across the 2-process mesh equals the
    host-oracle combine (compile-heavy: real G2 math on XLA:CPU)."""
    outs = _run_two_process("combine", timeout=1800)
    for i, (rc, out) in enumerate(outs):
        assert rc == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER-OK {i}" in out


@pytest.mark.slow
def test_two_process_sharded_rlc():
    """Sharded RLC batch verification across the 2-process mesh: partial
    MSMs per process + cross-process point reduce + replicated check;
    accepts valid shares and rejects a tampered batch."""
    outs = _run_two_process("rlc", timeout=1800)
    for i, (rc, out) in enumerate(outs):
        assert rc == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER-OK {i}" in out


def test_multihost_single_process_graceful():
    """multihost helpers must degrade to no-ops at world size 1."""
    from threshold_crypto_tpu.parallel import multihost as mh

    assert mh.initialize() is False  # no coordinator configured
    idx, cnt = mh.world()
    assert idx == 0 and cnt == 1
    mesh = mh.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    payload = b"ciphertext-bytes \x00\x01"
    assert mh.broadcast_bytes(payload) == payload
    mh.assert_equal_across_hosts({"x": np.arange(3)})  # no-op at size 1
    with pytest.raises(ValueError):
        mh.broadcast_bytes(None)
