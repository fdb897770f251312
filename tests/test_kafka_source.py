"""Kafka-shaped source tests: schema contract, lossless encode→parse
roundtrip at row level, dense per-partition offsets, and the
missing-connector error path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.sources import kafka


@pytest.fixture(scope="module")
def encoded(spark, sf_dir):
    from gcp_etl_pipeline_spark.sources.files import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    return kafka.encode_kafka(
        ev, topic="t", key_col="user_id", partition_expr="user_id % 3",
        ts_col="ts", order_col="event_id",
    ).persist()


def test_record_schema_matches_connector_contract(encoded):
    got = [(f.name, f.dataType) for f in encoded.schema.fields]
    want = [(f.name, f.dataType) for f in kafka.KAFKA_SCHEMA.fields]
    assert got == want  # nullability differs (encoder cols are non-null)


def test_offsets_dense_per_partition(encoded):
    stats = (
        encoded.groupBy("partition")
        .agg(F.count("*").alias("n"), F.min("offset").alias("lo"),
             F.max("offset").alias("hi"),
             F.countDistinct("offset").alias("d"))
        .collect()
    )
    assert len(stats) == 3
    for r in stats:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1 and r["d"] == r["n"]


def test_roundtrip_row_identity(spark, sf_dir, encoded):
    from gcp_etl_pipeline_spark.sources.files import read_parquet

    payload = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    back = kafka.parse_kafka_json(encoded, payload).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    orig = read_parquet(spark, f"{sf_dir}/events.parquet").select(*back.columns)
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


def test_parse_keeps_kafka_metadata(encoded):
    out = kafka.parse_kafka_json(encoded, "event_id BIGINT")
    for c in ("topic", "partition", "offset", "kafka_ts", "event_id"):
        assert c in out.columns


def test_missing_connector_raises_helpfully(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka.read_kafka_stream(spark, "localhost:9092", "nope")
