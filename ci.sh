#!/bin/sh
# CI pipeline — the TPU framework's equivalent of the reference's ci.sh
# (/root/reference/ci.sh:10-19: lint, tests in two profiles, docs, audit).
#
# Stages:
#   lint   — syntax/bytecode check of every module (no external linters in
#            this environment).
#   fast   — protocol suite on the host + mock backends, the native runtime,
#            and the golden wire vectors (seconds; the edit-loop gate).
#   full   — default pytest tier: everything except tests marked `slow`
#            (pytest.ini deselects them), plus the multi-chip dryrun.
#            Finishes cold in well under 30 minutes on a small host.
#   deep   — the slow tier too: compile-heavy device suites (XLA:CPU
#            pairing / scalar-mul graphs; hours cold on a 2-core box, use a
#            warm /tmp/jax_cache).
#
# Usage: ./ci.sh [fast|full|deep]   (default: full)

set -e
cd "$(dirname "$0")"
MODE="${1:-full}"

echo "== lint: compileall =="
python -m compileall -q threshold_crypto_tpu tests examples benches bench.py __graft_entry__.py

echo "== fast: protocol + native + golden-vector suites =="
python -m pytest tests/test_rng_and_mock.py tests/test_poly.py \
    tests/test_host_math.py tests/test_threshold.py tests/test_serde.py \
    tests/test_native.py tests/test_vectors.py -q

if [ "$MODE" = "full" ] || [ "$MODE" = "deep" ]; then
  echo "== full: default tier (slow-marked device suites deselected) =="
  python -m pytest tests/ -q

  echo "== dryrun: 8-virtual-device sharded step =="
  JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"
fi

if [ "$MODE" = "deep" ]; then
  echo "== deep: slow tier (compile-heavy device suites) =="
  # opt-level 0: ~2x faster XLA:CPU compiles; these tests assert math
  # parity, not performance, so unoptimized code is the right trade.
  XLA_FLAGS="${XLA_FLAGS:-} --xla_backend_optimization_level=0" \
    python -m pytest tests/ -q -m slow
fi

echo "CI ($MODE) passed."
