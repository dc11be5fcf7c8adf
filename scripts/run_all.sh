#!/usr/bin/env bash
# One-command repro of everything the driver checks:
#   tests → oracle gate (engine session) → oracle gate (vanilla session) → bench
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q -m ""   # FULL suite (the default tier deselects `slow`)

echo "== oracle gate (engine session, sf0.01) =="
python scripts/check_oracle.py /root/testdata/sf0.01

echo "== oracle gate (vanilla session, sf0.01) =="
VANILLA=1 python scripts/check_oracle.py /root/testdata/sf0.01

echo "== bench (sf0.1) =="
python bench.py
