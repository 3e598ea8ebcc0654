#!/usr/bin/env bash
# One-command verification of the whole repo (what the driver checks):
#   tests -> correctness gate (Spark vs DuckDB oracles) -> bench JSON
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -x -q

echo "== correctness gate (sf0.01) =="
python tools/check_gate.py /root/testdata/sf0.01

echo "== bench =="
python bench.py

echo "== scaling protocol (slow; uncomment to run) =="
# python tools/run_scaling.py
