"""Structured Streaming tests: file-source streams drained with
availableNow triggers, checked against batch results over the same data."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.sources.files import read_parquet
from gcp_etl_pipeline_spark.streaming import core


@pytest.fixture()
def events_path(sf_dir) -> str:
    return f"{sf_dir}/events.parquet"


@pytest.fixture()
def events_dir(events_path, tmp_path) -> str:
    """File streams need a *directory* that files land in."""
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(events_path, d / "events.parquet")
    return str(d)


def _drain(stream_df, name, tmp_path, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def test_tumbling_stream_matches_batch(spark, events_path, events_dir, tmp_path):
    stream = core.tumbling_counts(core.read_events_stream(spark, events_dir))
    got = _drain(stream, "t_tumbling", tmp_path, "complete")

    batch = read_parquet(spark, events_path).groupBy(
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600).alias("window_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))

    g = {(r.window_start, r.event_type): r.n_events for r in got.collect()}
    b = {(r.window_start, r.event_type): r.n_events for r in batch.collect()}
    assert g == b


def test_session_stream_total_events_conserved(spark, events_path, events_dir, tmp_path):
    stream = core.session_counts(core.read_events_stream(spark, events_dir))
    got = _drain(stream, "t_sessions", tmp_path, "complete")
    total = got.agg(F.sum("n_events")).first()[0]
    assert total == read_parquet(spark, events_path).count()
    # session windows for one user never overlap
    rows = sorted(
        [(r.user_id, r.sess_start, r.sess_end) for r in got.collect()]
    )
    for (u1, _, e1), (u2, s2, _) in zip(rows, rows[1:]):
        if u1 == u2:
            assert s2 >= e1


def test_dedup_within_watermark_removes_replayed_file(spark, events_path, tmp_path):
    # simulate an at-least-once source: the same file delivered twice
    src = tmp_path / "stream_in"
    src.mkdir()
    shutil.copy(events_path, src / "a.parquet")
    shutil.copy(events_path, src / "b.parquet")

    deduped = core.dedup_within_watermark(core.read_events_stream(spark, str(src)))
    got = _drain(deduped, "t_dedup", tmp_path, "append")
    n_unique = read_parquet(spark, events_path).count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_foreach_batch_insert_new_idempotent(spark, events_path, tmp_path):
    src = tmp_path / "upsert_in"
    src.mkdir()
    shutil.copy(events_path, src / "a.parquet")
    shutil.copy(events_path, src / "b.parquet")  # replay -> must not double

    target = str(tmp_path / "target")
    stream = core.read_events_stream(spark, str(src)).select(
        "event_id", "user_id", "event_type"
    )
    q = core.foreach_batch_insert_new(
        stream, target, keys=["event_id"], checkpoint=str(tmp_path / "ckpt_up")
    )
    q.awaitTermination()
    out = spark.read.parquet(target)
    assert out.count() == read_parquet(spark, events_path).count()
