"""SCD2 builder semantics: change compression, version chaining,
deterministic tiebreaks, null-safe attribute comparison."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def _build(spark, rows):
    from gcp_etl_pipeline_spark.operators.scd2 import scd2_build

    df = spark.createDataFrame(
        rows, "k string, attr string, ts date, obs_id int"
    )
    return scd2_build(
        df, keys=["k"], attrs=["attr"], ts_col="ts", tiebreak=["obs_id"]
    )


def test_compresses_consecutive_duplicates_and_chains_validity(spark):
    rows = [
        ("a", "x", _d("2024-01-01"), 1),
        ("a", "x", _d("2024-02-01"), 2),  # no change -> collapsed
        ("a", "y", _d("2024-03-01"), 3),
        ("a", "x", _d("2024-04-01"), 4),  # back to x -> NEW version
    ]
    out = {
        (r.valid_from.isoformat(), r.attr): (
            r.valid_to.isoformat() if r.valid_to else None,
            r.is_current,
        )
        for r in _build(spark, rows).collect()
    }
    assert out == {
        ("2024-01-01", "x"): ("2024-03-01", 0),
        ("2024-03-01", "y"): ("2024-04-01", 0),
        ("2024-04-01", "x"): (None, 1),
    }


def test_exactly_one_current_version_per_key(spark):
    rows = [
        ("a", "x", _d("2024-01-01"), 1),
        ("a", "y", _d("2024-02-01"), 2),
        ("b", "z", _d("2024-01-15"), 3),
    ]
    cur = (
        _build(spark, rows)
        .groupBy("k")
        .agg(F.sum("is_current").alias("n_current"))
        .collect()
    )
    assert {r.k: r.n_current for r in cur} == {"a": 1, "b": 1}


def test_same_day_observations_use_tiebreak(spark):
    # two observations on one date: obs_id orders them; final state wins
    rows = [
        ("a", "x", _d("2024-01-01"), 1),
        ("a", "y", _d("2024-01-01"), 2),
    ]
    got = sorted(
        (r.attr, r.is_current) for r in _build(spark, rows).collect()
    )
    assert got == [("x", 0), ("y", 1)]


def test_null_attribute_transitions_are_versions(spark):
    rows = [
        ("a", None, _d("2024-01-01"), 1),
        ("a", None, _d("2024-02-01"), 2),  # null==null -> collapsed
        ("a", "x", _d("2024-03-01"), 3),   # null->x -> new version
    ]
    assert _build(spark, rows).count() == 2


def test_single_shuffle_plan(spark):
    # both windows share the key partitioning: exactly one hash exchange
    rows = [("a", "x", _d("2024-01-01"), 1)]
    from gcp_etl_pipeline_spark.operators.scd2 import scd2_build

    df = spark.createDataFrame(rows, "k string, attr string, ts date, obs_id int")
    plan = (
        scd2_build(df, ["k"], ["attr"], "ts", ["obs_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
