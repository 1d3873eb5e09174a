#!/bin/sh
# CI pipeline — the TPU framework's equivalent of the reference's ci.sh
# (/root/reference/ci.sh:10-19: lint, tests in two profiles, docs, audit).
#
# Stages:
#   lint   — syntax/bytecode check of every module (no external linters in
#            this environment).
#   fast   — protocol suite on the host + mock backends and the native
#            runtime (seconds; the edit-loop gate).
#   full   — everything, including the device (JAX) engines on an 8-virtual-
#            device CPU mesh.  Compile-heavy: first cold run populates
#            /tmp/jax_cache; warm reruns take a few minutes.
#   dryrun — the multi-chip sharding entry point the driver exercises.
#
# Usage: ./ci.sh [fast|full]   (default: full)

set -e
cd "$(dirname "$0")"
MODE="${1:-full}"

echo "== lint: compileall =="
python -m compileall -q threshold_crypto_tpu tests examples benches bench.py __graft_entry__.py

echo "== fast: protocol + native suites =="
python -m pytest tests/test_rng_and_mock.py tests/test_poly.py \
    tests/test_host_math.py tests/test_threshold.py tests/test_serde.py \
    tests/test_native.py -q

if [ "$MODE" = "full" ]; then
  echo "== full: device engine suites (compile-heavy) =="
  python -m pytest tests/ -q

  echo "== dryrun: 8-virtual-device sharded step =="
  JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"
fi

echo "CI ($MODE) passed."
