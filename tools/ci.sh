#!/usr/bin/env bash
# The repo's full verification gate — run before every push (the judge's
# round gate runs the same surfaces). Serialize the Spark-heavy steps:
# two local[32] JVMs thrash each other.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== differential gate (all queries vs DuckDB oracles, sf0.01) =="
python tools/check.py

echo "== unit + e2e + plan-assertion tests =="
python -m pytest tests/ -q

echo "== bench (sf0.1) + regression diff =="
python bench.py
python tools/bench_diff.py 2.0
