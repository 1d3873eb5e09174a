"""Prebuilt compile-cache shipping: make a COLD checkout start warm.

The framework's headline programs (the RLC batch-verification MSM pair
and the fused per-pair verify pipeline) cost minutes of XLA+Mosaic
compile from a cold start — the dominant operational risk on a
fresh-checkout benchmark run (PERF.md "compile latency").  Both warm
layers this repo already uses are keyed to machine-generated state that
a fresh clone does not have:

* ``.jax_cache``  — the persistent XLA compilation cache (keyed by HLO
  hash; robust to unrelated source edits),
* ``.jax_aot``    — serialized compiled executables
  (`utils/aotcache.py`; keyed by jax version + device kind + package
  source hash, so any package edit invalidates them).

This module moves a curated subset of those entries into the
git-tracked ``prebuilt/`` directory so they ship with the source:

    prebuilt/jax_cache/<entry>   ->  .jax_cache/<entry>
    prebuilt/jax_aot/<entry>     ->  .jax_aot/<entry>

`unpack()` copies any entry that is not already present (never
overwrites — live caches win) and is called by `bench.py` and
`benches/warmstart.py` before the first compile.  Entries whose key no
longer matches (e.g. a stale AOT source hash) are simply never opened
by their consumers — shipping them is wasted bytes, not wrong results:
`aotcache.cached_compile` re-verifies the key by filename and the XLA
cache re-verifies the HLO hash.

`pack()` (driven by `benches/make_prebuilt.py`) snapshots the current
cache entries matching the headline-program patterns back into
``prebuilt/``.  Run it AFTER the last source change of a release: the
AOT keys embed the package source hash.
"""

from __future__ import annotations

import lzma
import os
import shutil

_PAIRS = (("jax_cache", ".jax_cache"), ("jax_aot", ".jax_aot"))

# AOT executables are raw pickles (~420-440 MB for the headline
# programs) but compress ~9x with xz; persistent-cache entries are
# already zstd-compressed by JAX (xz gains ~2%), so they ship raw.
_XZ_PRESET = 3


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))


def unpack(root: str | None = None) -> int:
    """Copy (and decompress) shipped cache entries into the live dirs.

    Existing live entries are never overwritten.  Returns the number of
    entries materialized (0 when nothing is shipped or all are present).
    """
    root = root or _repo_root()
    src_root = os.path.join(root, "prebuilt")
    copied = 0
    for sub, live in _PAIRS:
        src = os.path.join(src_root, sub)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(root, live)
        os.makedirs(dst, exist_ok=True)
        for name in sorted(os.listdir(src)):
            packed = name.endswith(".xz")
            target = os.path.join(dst, name[:-3] if packed else name)
            if os.path.exists(target):
                continue
            tmp = target + f".tmp{os.getpid()}"
            if packed:
                with lzma.open(os.path.join(src, name), "rb") as fi, \
                        open(tmp, "wb") as fo:
                    shutil.copyfileobj(fi, fo, 1 << 22)
            else:
                shutil.copyfile(os.path.join(src, name), tmp)
            os.replace(tmp, target)
            copied += 1
    return copied


def pack(patterns=("*",), root: str | None = None,
         clean: bool = True) -> list:
    """Snapshot live cache entries matching `patterns` into prebuilt/
    (AOT entries xz-compressed, persistent-cache entries raw).

    Returns [(relative path, size bytes)] of everything now shipped.
    """
    import fnmatch

    root = root or _repo_root()
    out = []
    for sub, live in _PAIRS:
        src = os.path.join(root, live)
        dst = os.path.join(root, "prebuilt", sub)
        if clean and os.path.isdir(dst):
            shutil.rmtree(dst)
        if not os.path.isdir(src):
            continue
        names = [
            n for n in sorted(os.listdir(src))
            if any(fnmatch.fnmatch(n, p) for p in patterns)
            and ".tmp" not in n
        ]
        if names:
            os.makedirs(dst, exist_ok=True)
        for n in names:
            if sub == "jax_aot":
                shipped = os.path.join(dst, n + ".xz")
                filt = [{"id": lzma.FILTER_LZMA2, "preset": _XZ_PRESET}]
                with open(os.path.join(src, n), "rb") as fi, \
                        lzma.open(shipped, "wb", filters=filt) as fo:
                    shutil.copyfileobj(fi, fo, 1 << 22)
            else:
                shipped = os.path.join(dst, n)
                shutil.copyfile(os.path.join(src, n), shipped)
            out.append((os.path.relpath(shipped, root),
                        os.path.getsize(shipped)))
    return out


def aot_entry_exists(key: str, root: str | None = None) -> bool:
    """True when a live (already unpacked) AOT entry for `key` matches
    the CURRENT jax version + device kind + package source hash — i.e.
    `aotcache.cached_compile(key=...)` would load without compiling."""
    from . import aotcache

    root = root or _repo_root()
    name = (f"{key}-{aotcache._fingerprint()}"
            f"-{aotcache._source_hash()}.aot")
    return os.path.exists(os.path.join(root, ".jax_aot", name))
