#!/usr/bin/env bash
# CI smoke: full test suite + multi-chip dryrun + CPU bench smoke + fidelity.
# Everything runs on CPU (8 virtual devices) — no TPU required.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"

echo "== pytest =="
python -m pytest tests/ -x -q

echo "== multi-chip dryrun (8 virtual devices) =="
python __graft_entry__.py

echo "== end-to-end demo (incl. two-drone wire exchange) =="
python examples/demo_synthetic.py --frames 4 --topo --two-drones --cpu

echo "== SDF fidelity vs reference math =="
python tools/compare_vs_reference.py --cpu

echo "CI: OK"
