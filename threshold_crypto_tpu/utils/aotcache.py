"""AOT executable cache: skip jit trace/lower/compile on warm starts.

The fused verify pipeline is a ~13 MB StableHLO module; even with every
kernel in the persistent XLA compilation cache, a fresh process pays
~2–3 min of client-side tracing/lowering before the first run (PERF.md,
r3 bottleneck #4).  `jax.experimental.serialize_executable` bypasses the
whole front end: the *compiled* executable (plus its arg/result trees)
is pickled to disk once, and later processes deserialize-and-load it
directly onto the device.

Entries are keyed by (caller key, jax version, device kind, package
source hash) — a stale executable is never loaded after a code change.
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax


def _fingerprint() -> str:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", dev.platform)
    return f"{jax.__version__}-{kind}".replace(" ", "_").replace("/", "_")


_src_hash = None


def _source_hash() -> str:
    """Hash of every .py file in the package (content-addressed keys)."""
    global _src_hash
    if _src_hash is None:
        import threshold_crypto_tpu as pkg

        root = os.path.dirname(os.path.abspath(pkg.__file__))
        h = hashlib.sha256()
        for dirpath, dirnames, files in sorted(os.walk(root)):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for f in sorted(files):
                if f.endswith(".py"):
                    h.update(f.encode())
                    with open(os.path.join(dirpath, f), "rb") as fh:
                        h.update(fh.read())
        _src_hash = h.hexdigest()[:16]
    return _src_hash


def cached_compile(fn, example_args, key: str, cache_dir: str,
                   static_argnums=()):
    """A compiled executable for `fn` at `example_args`' shapes.

    Loads from `cache_dir` when a matching entry exists (no tracing, no
    XLA); otherwise traces/compiles once and serializes the result.
    Returns a callable taking exactly the example arg structure.
    """
    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    os.makedirs(cache_dir, exist_ok=True)
    name = f"{key}-{_fingerprint()}-{_source_hash()}.aot"
    path = os.path.join(cache_dir, name)
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            return deserialize_and_load(payload, in_tree, out_tree)
        except Exception:
            # corrupt / incompatible entry: fall through to recompile
            try:
                os.unlink(path)
            except OSError:
                pass
    compiled = (
        jax.jit(fn, static_argnums=static_argnums)
        .lower(*example_args)
        .compile()
    )
    try:
        payload, in_tree, out_tree = serialize(compiled)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh)
        os.replace(tmp, path)
    except Exception:
        pass  # serialization is best-effort; the compiled fn still works
    return compiled
