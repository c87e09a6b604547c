#!/bin/sh
# Single CI entry point: unit/integration suite + the quick accuracy
# smoke gate (12 s profiles, functional bounds).  Both run on the 8-way
# virtual CPU mesh; the full 60 s gate (accuracy claims, multi-seed) is
# `python scripts/accuracy_gate.py --strict` and takes ~1 h with cold
# bag caches.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python scripts/accuracy_gate.py --quick --strict
