"""CDC apply_changes semantics: latest-per-key wins, deletes, inserts,
pass-through."""

from __future__ import annotations


def test_apply_changes_iud_semantics(spark):
    from gcp_etl_pipeline_spark.operators.cdc import apply_changes

    snapshot = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", "U", 10),   # update k=1 ...
            (1, "a3", "U", 20),   # ... but this later one wins
            (2, "-", "D", 5),     # delete k=2
            (4, "d", "I", 1),     # insert new k=4
        ],
        "k long, v string, op string, seq long",
    )
    got = {
        r.k: r.v
        for r in apply_changes(
            snapshot, changes, keys=["k"], seq_cols=["seq"]
        ).collect()
    }
    assert got == {1: "a3", 3: "c", 4: "d"}


def test_apply_changes_delete_then_reinsert_latest_wins(spark):
    from gcp_etl_pipeline_spark.operators.cdc import apply_changes

    snapshot = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "-", "D", 1), (1, "a2", "I", 2)],
        "k long, v string, op string, seq long",
    )
    got = apply_changes(snapshot, changes, ["k"], ["seq"]).collect()
    assert [(r.k, r.v) for r in got] == [(1, "a2")]
