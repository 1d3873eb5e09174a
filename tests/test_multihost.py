"""Multi-host runtime helpers (single-process graceful degradation)."""

import jax
import numpy as np
import pytest


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
