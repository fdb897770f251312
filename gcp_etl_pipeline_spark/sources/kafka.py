"""Kafka-shaped source: the record contract, a real-connector entry point,
and a Catalyst-only simulator for environments without a broker.

The reference ingests via Beam `ReadFromJdbc` (SURVEY §2.1 S1); a
continuous deployment of the same contract reads a topic instead. Spark's
Kafka source emits a FIXED schema — (key, value binary; topic string;
partition int; offset long; timestamp; timestampType) — so every
downstream query can be written against `KAFKA_SCHEMA` and run unchanged
whether records come from a broker, a file stream, or the simulator:

    real:      read_kafka_stream(spark, "host:9092", "events")
    simulated: encode_kafka(df, ...) → parquet dir → readStream(KAFKA_SCHEMA)

`spark-sql-kafka` isn't in this container, so `read_kafka_stream` raises a
clear error at load time if the package is missing; everything else is
plain Catalyst and fully tested.

Scale notes: `parse_kafka_json` is a pure projection (cast + from_json,
JVM-side Jackson) — no shuffle, scales per-partition like the broker's
own parallelism (one Spark task per Kafka partition). The simulator's
dense per-partition offsets need one window shuffle, which the real
broker provides for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# to_json/from_json default to millisecond timestamps — these formats keep
# full microsecond precision through the JSON roundtrip (test-verified).
# NTZ columns get their own pattern (no offset): to_json consults
# timestampNTZFormat, not timestampFormat, for TIMESTAMP_NTZ.
_JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}

KAFKA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    **options: str,
) -> DataFrame:
    """The real connector path (requires the spark-sql-kafka package)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - depends on environment
        raise RuntimeError(
            "Kafka connector unavailable: add the spark-sql-kafka-0-10 "
            "package (spark.jars.packages) to read real topics; use "
            "encode_kafka()+a file stream with KAFKA_SCHEMA to simulate"
        ) from exc


def encode_kafka(
    df: DataFrame,
    topic: str,
    key_col: str,
    partition_expr: str,
    ts_col: str,
    order_col: str,
) -> DataFrame:
    """Wrap rows into Kafka's record shape: value = JSON of the whole row,
    key/partition from caller expressions, dense per-partition offsets
    ordered by (ts, order_col) — deterministic, so differentially
    testable."""
    w = Window.partitionBy("partition").orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    )
    # normalize the event-time column to TIMESTAMP (LTZ) inside the payload:
    # a TIMESTAMP_NTZ source column would otherwise serialize in the NTZ
    # format while consumers parse payload schemas declared TIMESTAMP.
    # Under the engine's UTC session timezone the cast is value-identity.
    payload = F.struct(
        *[
            F.col(c).cast("timestamp").alias(c) if c == ts_col else F.col(c)
            for c in df.columns
        ]
    )
    return (
        df.withColumn("partition", F.expr(partition_expr).cast("int"))
        .withColumn("key", F.col(key_col).cast("string").cast("binary"))
        .withColumn("value", F.to_json(payload, _JSON_OPTS).cast("binary"))
        .withColumn("topic", F.lit(topic))
        .withColumn("timestamp", F.col(ts_col).cast("timestamp"))
        .withColumn("timestampType", F.lit(0))
        .withColumn("offset", (F.row_number().over(w) - 1).cast("long"))
        .select([f.name for f in KAFKA_SCHEMA.fields])
    )


def parse_kafka_json(
    records: DataFrame, payload_schema: T.StructType | str
) -> DataFrame:
    """Decode JSON payloads back into typed columns, keeping the Kafka
    metadata (topic/partition/offset/timestamp). Works identically on a
    batch DataFrame, a file stream, or the real connector's output."""
    parsed = records.select(
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(
            F.col("value").cast("string"), payload_schema, _JSON_OPTS
        ).alias("p"),
    )
    return parsed.select("topic", "partition", "offset", "kafka_ts", "p.*")
