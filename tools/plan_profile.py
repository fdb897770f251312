"""Plan-profile census: one JSON row per graded query with its physical
plan's join/exchange composition — the at-a-glance answer to "does this
query shuffle/broadcast/cartesian the way its scale design claims?".

Counts come from the INITIAL physical plan (pre-AQE, no execution
forced), so building the census is cheap for pure queries; queries whose
CONSTRUCTION performs work (streaming drains, ledger writes, catalog
verticals) still run that work once. Temp-dir paths never enter the
counts, so the profile is stable across runs and hosts.

Usage:
  python tools/plan_profile.py            # (re)write PLAN_PROFILE.json
  python tools/plan_profile.py --check    # exit 1 on drift vs the file

A drift is not necessarily a bug — a deliberate plan improvement lands
with a regenerated profile in the same commit; an ACCIDENTAL broadcast
lost to a sort-merge join, or a new cartesian, shows up as a one-line
diff here before it shows up as a 100-TB incident.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKS = {
    "broadcast_hash_join": "BroadcastHashJoin",
    "sort_merge_join": "SortMergeJoin",
    "shuffled_hash_join": "ShuffledHashJoin",
    "exchange_hash": "Exchange hashpartitioning",
    "exchange_range": "Exchange rangepartitioning",
    "exchange_single": "Exchange SinglePartition",
    "cartesian": "CartesianProduct",
    "bcast_nested_loop": "BroadcastNestedLoopJoin",
    "python_arrow_stage": "MapInPandas",
    "grouped_pandas": "FlatMapGroupsInPandas",
}


def main() -> int:
    check = "--check" in sys.argv
    sf_dir = "/root/testdata/sf0.01"

    from gcp_etl_pipeline_spark import registry
    from gcp_etl_pipeline_spark.session import get_session

    spark = get_session(app_name="plan_profile")
    queries = registry.queries()

    profile: dict[str, dict[str, int]] = {}
    for name in sorted(queries):
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — census stays total
            profile[name] = {"error": 1}
            print(f"WARN {name}: {type(exc).__name__}", file=sys.stderr)
            continue
        row = {k: plan.count(pat) for k, pat in MARKS.items()}
        profile[name] = {k: v for k, v in row.items() if v}

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_PROFILE.json",
    )
    spark.stop()
    if check:
        with open(out_path) as fh:
            baseline = json.load(fh)
        drift = {
            n: (baseline.get(n), profile.get(n))
            for n in set(baseline) | set(profile)
            if baseline.get(n) != profile.get(n)
        }
        if drift:
            for n, (old, new) in sorted(drift.items()):
                print(f"DRIFT {n}: {old} -> {new}")
            return 1
        print(f"plan profile stable ({len(profile)} queries)")
        return 0
    with open(out_path, "w") as fh:
        json.dump(profile, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote PLAN_PROFILE.json ({len(profile)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
