"""Compare the two most recent BENCH_HISTORY.jsonl entries and flag
per-query regressions. Usage: python tools/bench_diff.py [threshold]
(default 1.5 = flag queries that got >=50% slower). Exits 1 if any
query regressed beyond the threshold — wire into a pre-push check to
catch plan regressions the correctness gate can't see."""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main() -> int:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 1.5
    hist = Path(__file__).resolve().parent.parent / "BENCH_HISTORY.jsonl"
    if not hist.exists():
        print("no BENCH_HISTORY.jsonl yet")
        return 0
    runs = [json.loads(ln) for ln in hist.read_text().splitlines() if ln.strip()]
    if len(runs) < 2:
        print(f"only {len(runs)} run(s) recorded — nothing to diff")
        return 0
    prev, cur = runs[-2]["queries"], runs[-1]["queries"]
    flagged = []
    for name, t in sorted(cur.items()):
        if name not in prev or prev[name] <= 0:
            print(f"  new      {name}: {t:.3f}s")
            continue
        ratio = t / prev[name]
        marker = " <-- REGRESSED" if ratio >= threshold else ""
        if ratio >= threshold:
            flagged.append(name)
        if ratio >= threshold or ratio <= 1 / threshold:
            print(f"  {ratio:5.2f}x  {name}: {prev[name]:.3f}s -> {t:.3f}s{marker}")
    t_prev = runs[-2]["value"]
    t_cur = runs[-1]["value"]
    print(f"total: {t_prev:.2f}s -> {t_cur:.2f}s ({t_cur / t_prev:.2f}x)")
    if flagged:
        print(f"REGRESSIONS: {flagged}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
