#!/bin/sh
# Single CI entry point: unit/integration suite + the quick accuracy
# smoke gate (12 s profiles, functional bounds).  Both run on the 8-way
# virtual CPU mesh; the full 60 s gate (accuracy claims, multi-seed) is
# `python scripts/accuracy_gate.py --strict`.
#
# Cost: ~12 min for the suite + ~6 min for the gate with warm bag
# caches (.accuracy_cache/).  COLD caches must render the synthetic
# bags first: ~2 min/bag on a TPU chip (the prebuild loop below uses
# it automatically), ~10-13 min/bag on a 2-core CPU host — i.e. a
# fully cold CPU-only ci.sh is ~1 h; with a TPU attached, ~25 min.
set -e
cd "$(dirname "$0")/.."
# Pre-render any missing quick-gate bags on the default JAX backend
# (TPU when attached — an order of magnitude faster than the CPU
# raycast).  No-ops instantly when .accuracy_cache is warm.
for bag in r3live ntu agg rev; do
    python scripts/accuracy_gate.py --quick --prebuild "$bag"
done
python -m pytest tests/ -q
python scripts/accuracy_gate.py --quick --strict
