"""Custom Python data sources: partitioned batch generation equal to the
driver-side builder, and a deterministic offset-tracked stream source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.sources.pysource import register_sources


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_sources(spark)


def test_media_source_matches_driver_builder(spark):
    from gcp_etl_pipeline_spark.operators.multimodal import make_fake_media

    via_source = (
        spark.read.format("graftmedia").option("n", 64).option("parts", 4).load()
    )
    assert via_source.count() == 64
    driver_side = make_fake_media(spark, n=64).select(
        "media_id", "kind", "content"
    )
    a = {(r.media_id, r.kind, bytes(r.content)) for r in via_source.collect()}
    b = {(r.media_id, r.kind, bytes(r.content)) for r in driver_side.collect()}
    assert a == b  # byte-identical blobs, generated in executors


def test_media_source_decodes_through_pipeline(spark):
    from gcp_etl_pipeline_spark.operators.multimodal import decode_media

    media = spark.read.format("graftmedia").option("n", 128).load()
    decoded = decode_media(media)
    assert decoded.where("decode_error IS NOT NULL").count() == 0
    assert decoded.count() == 128


def test_events_stream_source_windows(spark, tmp_path):
    stream = (
        spark.readStream.format("graftevents")
        .option("max_rows", 5000)
        .option("rows_per_batch", 1000)
        .load()
    )
    counts = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("pysrc_win")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("pysrc_win")
    total = got.agg(F.sum("n")).first()[0]
    assert total == 5000  # every generated row landed in exactly one window
    assert got.select("event_type").distinct().count() == 5


def test_events_stream_deterministic_replay(spark, tmp_path):
    """Two independent drains over the same offset range produce identical
    row sets — the checkpoint-replay contract."""

    def drain(name):
        stream = (
            spark.readStream.format("graftevents")
            .option("max_rows", 2000)
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / name))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.event_id, r.ts, r.user_id, r.event_type, r.value)
            for r in spark.table(name).collect()
        }

    assert drain("pysrc_a") == drain("pysrc_b")


def test_sink_writes_manifested_shards(spark, tmp_path):
    from gcp_etl_pipeline_spark.sources.pysource import read_manifested_jsonl

    out = str(tmp_path / "sink")
    df = spark.range(1000).selectExpr("id", "id * 2 AS v").repartition(6)
    df.write.format("graftsink").option("path", out).mode("append").save()
    import json
    import os

    with open(f"{out}/_manifest.json") as fh:
        manifest = json.load(fh)
    assert manifest["rows"] == 1000
    assert len(manifest["shards"]) == 6  # one shard per task
    back = read_manifested_jsonl(spark, out)
    assert back.count() == 1000
    assert back.agg({"v": "sum"}).first()[0] == 999 * 1000
    # a stray uncommitted shard must be ignored by the manifested read
    with open(os.path.join(out, "shard-stray.jsonl"), "w") as fh:
        fh.write('{"id": 99999, "v": 0}\n')
    assert read_manifested_jsonl(spark, out).count() == 1000


def test_sink_append_merges_manifest(spark, tmp_path):
    from gcp_etl_pipeline_spark.sources.pysource import read_manifested_jsonl

    out = str(tmp_path / "sink2")
    spark.range(100).repartition(2).write.format("graftsink").option(
        "path", out).mode("append").save()
    spark.range(100, 150).repartition(1).write.format("graftsink").option(
        "path", out).mode("append").save()
    back = read_manifested_jsonl(spark, out)
    assert back.count() == 150  # both writes' shards stay referenced


def test_sink_overwrite_replaces_and_cleans(spark, tmp_path):
    import json
    import os

    from gcp_etl_pipeline_spark.sources.pysource import read_manifested_jsonl

    out = str(tmp_path / "sink3")
    spark.range(100).repartition(2).write.format("graftsink").option(
        "path", out).mode("append").save()
    old_shards = set(json.load(open(f"{out}/_manifest.json"))["shards"])
    spark.range(500, 530).repartition(1).write.format("graftsink").option(
        "path", out).mode("overwrite").save()
    m = json.load(open(f"{out}/_manifest.json"))
    assert m["rows"] == 30  # not 130: overwrite really overwrites
    back = read_manifested_jsonl(spark, out)
    assert back.count() == 30 and back.agg({"id": "min"}).first()[0] == 500
    # superseded shard files were physically cleaned
    for s in old_shards:
        assert not os.path.exists(os.path.join(out, s))


def test_sink_serializes_timestamp_and_binary(spark, tmp_path):
    from gcp_etl_pipeline_spark.sources.pysource import read_manifested_jsonl

    out = str(tmp_path / "sink4")
    df = spark.sql(
        """SELECT id, TIMESTAMP'2024-01-01 00:00:01' AS ts,
                  CAST('blob' AS BINARY) AS b, CAST(1.5 AS DECIMAL(5,2)) AS d
           FROM range(5)"""
    )
    df.write.format("graftsink").option("path", out).mode("append").save()
    back = read_manifested_jsonl(spark, out)
    assert back.count() == 5
    # values round-trip through the JSON encodings, not just the count
    row = back.orderBy("id").first()
    assert row.ts == "2024-01-01T00:00:01"  # isoformat
    import base64

    assert base64.b64decode(row.b) == b"blob"
    assert row.d == "1.50"  # Decimal as lossless string


def test_events_stream_incremental_offsets_unit():
    """Driver-side contract of the incremental mode: latestOffset advances
    by rows_per_batch up to max_rows; partitions respect the per-task cap."""
    from gcp_etl_pipeline_spark.sources.pysource import _EventsStreamReader

    r = _EventsStreamReader(
        {"rows_per_batch": "100", "max_rows": "250", "incremental": "true",
         "parts": "4"}
    )
    assert r.initialOffset() == {"n": 0}
    assert [r.latestOffset()["n"] for _ in range(4)] == [100, 200, 250, 250]
    parts = r.partitions({"n": 0}, {"n": 250})
    spans = [p.value for p in parts]
    assert all(hi - lo <= 100 for lo, hi in spans)
    covered = sorted(i for lo, hi in spans for i in range(lo, hi))
    assert covered == list(range(250))  # exact cover, no gaps/overlaps
    # non-incremental default: one jump to max_rows (availableNow contract)
    r2 = _EventsStreamReader({"max_rows": "500"})
    assert r2.latestOffset() == {"n": 500}
