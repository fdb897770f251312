"""Round-13/14 optimization probe: time individual queries (5x warm, noop
sink, median) and dump their .explain("formatted") plans.

Usage:
  python tools/opt_probe.py [--sf DIR] [--plans SUFFIX] q1 q2 ...

With --plans SUFFIX each query's formatted plan is written to
plans/r14/<query>_<SUFFIX>.txt (the judge-facing evidence files).
Timing methodology matches bench.py: construction + noop execution,
median of the WARM runs (first run excluded as JIT/codegen warm-up).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    plans_suffix = None
    reps = 5
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--plans":
            plans_suffix = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from gcp_etl_pipeline_spark.session import get_session
    import __spark_entry__ as entrymod

    spark = get_session(app_name="opt_probe")
    queries = entrymod.queries()

    import gc

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        samples = []
        for r in range(reps):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            if plans_suffix and r == reps - 1:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                os.makedirs("plans/r14", exist_ok=True)
                with open(f"plans/r14/{name}_{plans_suffix}.txt", "w") as fh:
                    fh.write(plan)
            del df
            gc.collect()
        warm = samples[1:] if len(samples) > 1 else samples
        out[name] = {
            "median_warm": round(statistics.median(warm), 3),
            "samples": samples,
        }
        print(f"{name}: median_warm={out[name]['median_warm']} {samples}",
              flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
