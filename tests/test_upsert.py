"""Upsert (merge_column semantics, I3): update-matched + insert-new."""

from __future__ import annotations

from gcp_etl_pipeline_spark.operators.upsert import upsert


def test_upsert_first_write_creates_table(spark, tmp_path):
    path = str(tmp_path / "t")
    src = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    assert upsert(src, path, ["id"]) == 2
    assert spark.read.parquet(path).count() == 2


def test_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t2")
    upsert(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), path, ["id"])
    upsert(spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"]), path, ["id"])
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}  # 2 updated, 3 inserted, 1 kept


def test_upsert_idempotent_replay(spark, tmp_path):
    path = str(tmp_path / "t3")
    src = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    upsert(src, path, ["id"])
    upsert(src, path, ["id"])  # replay: same keys, same values
    assert spark.read.parquet(path).count() == 2


def test_upsert_null_key_matches(spark, tmp_path):
    path = str(tmp_path / "t4")
    upsert(
        spark.createDataFrame([(None, "x"), (1, "a")], "id INT, v STRING"),
        path, ["id"],
    )
    upsert(
        spark.createDataFrame([(None, "X")], "id INT, v STRING"), path, ["id"]
    )
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {None: "X", 1: "a"}
