"""Compare the two most recent BENCH_HISTORY.jsonl entries and gate on
PER-QUERY regressions. Usage: python tools/bench_diff.py [threshold]
(default 1.3 = flag queries whose median got >=30% slower). Exits 1 if
any query regressed beyond the threshold — wire into a pre-push check to
catch plan regressions the correctness gate can't see.

Why 1.3 per query, not 2.0 total: the r4 similarity regression (1.85x
on one query) sailed under a looser gate; BENCH_HISTORY shows ~±10%
host drift on medians, so 1.3 is above the noise floor but below any
plan-shape regression worth catching.

The ratio gate additionally requires an ABSOLUTE delta >= 0.25s: on
sub-second queries even medians bounce ±0.1s run to run (three
consecutive r6 runs flagged three DIFFERENT <0.5s queries), and a 1.3x
ratio there is pure noise — every regression this gate exists to catch
(r4's was +0.8s) clears the floor easily.

Runs recorded with different ``stat`` markers (e.g. the pre-r6
min-of-2 era vs median-of-3) are NOT gated against each other — the
first run after a stat change prints a rebaseline notice and passes.

ROUND-ANCHOR MODE (r6 judge #1): consecutive-run gating is structurally
blind to slow creep — r6 drifted +16% on the common subset while every
step stayed under threshold. ``--set-anchor`` snapshots the latest run
as the ROUND-OPEN baseline (BENCH_ANCHOR.json); ``--anchor`` gates the
latest run against that snapshot instead of the previous run, adding a
COMMON-SUBSET TOTAL gate (default 1.15x — above the ±12% host-drift
envelope BENCH_HISTORY shows, below a real round-long creep) on top of
the per-query gate. ci.sh runs both modes; set a fresh anchor at every
round open.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

TOTAL_ANCHOR_RATIO = 1.15


def main() -> int:
    args = [a for a in sys.argv[1:]]
    anchor_mode = "--anchor" in args
    set_anchor = "--set-anchor" in args
    pos = [a for a in args if not a.startswith("--")]
    threshold = float(pos[0]) if pos else 1.3
    root = Path(__file__).resolve().parent.parent
    hist = root / "BENCH_HISTORY.jsonl"
    anchor_path = root / "BENCH_ANCHOR.json"
    if not hist.exists():
        print("no BENCH_HISTORY.jsonl yet")
        return 0
    runs = [json.loads(ln) for ln in hist.read_text().splitlines() if ln.strip()]
    if not runs:
        print("BENCH_HISTORY.jsonl has no runs — nothing to diff/anchor")
        return 0
    if set_anchor:
        anchor_path.write_text(json.dumps(runs[-1]))
        print(f"anchor set: {runs[-1]['value']:.2f}s "
              f"({len(runs[-1]['queries'])} queries)")
        return 0
    if len(runs) < 2 and not anchor_mode:
        print(f"only {len(runs)} run(s) recorded — nothing to diff")
        return 0
    if anchor_mode:
        if not anchor_path.exists():
            print("no BENCH_ANCHOR.json — run --set-anchor at round open")
            return 0
        prev_run, cur_run = json.loads(anchor_path.read_text()), runs[-1]
    else:
        prev_run, cur_run = runs[-2], runs[-1]
    prev_stat = prev_run.get("stat", "min2")
    cur_stat = cur_run.get("stat", "min2")
    gating = prev_stat == cur_stat
    if not gating:
        print(
            f"stat changed {prev_stat} -> {cur_stat}: rebaselined, "
            "differences reported but not gated"
        )
    prev, cur = prev_run["queries"], cur_run["queries"]
    flagged = []
    for name, t in sorted(cur.items()):
        if name not in prev or prev[name] <= 0:
            print(f"  new      {name}: {t:.3f}s")
            continue
        ratio = t / prev[name]
        regressed = gating and ratio >= threshold and t - prev[name] >= 0.25
        marker = " <-- REGRESSED" if regressed else ""
        if regressed:
            flagged.append(name)
        if ratio >= threshold or ratio <= 1 / threshold:
            print(f"  {ratio:5.2f}x  {name}: {prev[name]:.3f}s -> {t:.3f}s{marker}")
    t_prev = prev_run["value"]
    t_cur = cur_run["value"]
    print(f"total: {t_prev:.2f}s -> {t_cur:.2f}s ({t_cur / t_prev:.2f}x)")
    if anchor_mode and gating:
        # creep gate: total over the COMMON query subset vs the round
        # anchor — catches the slow aggregate drift per-query ratios hide
        common = sorted(set(prev) & set(cur))
        cp, cc = sum(prev[n] for n in common), sum(cur[n] for n in common)
        if cp > 0:
            r = cc / cp
            print(f"anchor common-subset ({len(common)} queries): "
                  f"{cp:.2f}s -> {cc:.2f}s ({r:.2f}x, gate "
                  f"{TOTAL_ANCHOR_RATIO}x)")
            if r >= TOTAL_ANCHOR_RATIO:
                print("ROUND CREEP: common-subset total regressed vs the "
                      "round-open anchor — bisect or attribute before push")
                return 1
    if flagged:
        print(f"REGRESSIONS (median vs median, >={threshold}x): {flagged}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
