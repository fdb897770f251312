"""Streaming sources, windowed aggregations, and sinks.

Everything here is expressed with built-in Structured Streaming operators
(`window`, `session_window`, `withWatermark`,
`dropDuplicatesWithinWatermark`) — state stores, incremental execution and
late-data handling come from the engine, not hand-rolled code. At scale the
shuffle per micro-batch is keyed by (window, group) and the state store is
partitioned the same way, so throughput scales with executors exactly like
the batch twin.

Reference tie-in: the batch jobs' watermark contract
(`commons/utilities.py:162`) and insert-new-only maintenance
(`...retailer_hlp_01.py:57-63`) are realized here as `withWatermark` and a
`foreachBatch` anti-join upsert respectively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EVENTS_COLS = (
    "event_id BIGINT, {ts}, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over events parquet. ``path`` must be a DIRECTORY
    that files land in (Spark's file stream source rejects bare file paths).

    The stream schema is built from the Parquet footer's actual timestamp
    unit (`sources.files.timestamp_units` — the same sniffing the batch
    reader uses), so the reader is correct whether the fixture stores
    ``ts`` as INT64 TIMESTAMP(NANOS) (read as raw nanos + distributed
    divide) or µs/ms TIMESTAMP[_NTZ] (read directly as TIMESTAMP; with the
    engine's UTC session timezone the NTZ wall-clock equals the instant)."""
    from gcp_etl_pipeline_spark.sources.files import timestamp_units

    try:
        unit = timestamp_units(path).get("ts")
    except Exception:  # noqa: BLE001 — landing dir empty or not yet created
        # no files to sniff: default to the µs/ms TIMESTAMP layout (what
        # every current producer writes); an ns-fixture deployment that
        # starts on an empty directory should pre-seed one file or pass
        # through the batch reader once so the unit is observable
        unit = None
    if unit == "ns":
        # Spark's vectorized reader rejects TIMESTAMP(NANOS): read raw
        # int64 nanos, convert distributedly (integer div keeps precision)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = (
            spark.readStream.schema(_EVENTS_COLS.format(ts="ts BIGINT"))
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        spark.readStream.schema(_EVENTS_COLS.format(ts="ts TIMESTAMP"))
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, event_type) counts with late-data tolerance
    ``watermark``; the streaming twin of the batch `events_tumbling`."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "approx_users",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start"), "n_events")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user sessions with a ``gap`` inactivity timeout — the built-in
    `session_window` state-merging operator (the batch twin is the
    lag+flag-sum `events_sessionize` query)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("sess_start"),
            F.unix_timestamp(F.col("w.end")).alias("sess_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon: state holds one
    entry per key only until the watermark passes it (bounded state — the
    at-scale requirement a plain dropDuplicates can't meet on an unbounded
    stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(stream_df: DataFrame, name: str, checkpoint: str) -> DataFrame:
    """Drain everything currently available through the streaming engine
    into an in-memory table and return it as a DataFrame. Used for tests
    and for oracle-checking streaming semantics against batch SQL."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if not stream_df.isStreaming else _mode_for(stream_df))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def _mode_for(stream_df: DataFrame) -> str:
    # aggregated streams need complete/update to surface rows without
    # waiting for the watermark to close windows; plain streams append
    return "complete" if _has_aggregate(stream_df) else "append"


def _has_aggregate(stream_df: DataFrame) -> bool:
    try:
        plan = stream_df._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001
        return False
    return "Aggregate" in plan


def foreach_batch_versioned(
    stream_df: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint: str,
):
    """Stream into a snapshot-versioned table: every non-empty micro-batch
    becomes one immutable snapshot via a keyed upsert (sinks/versioned.py)
    — the streaming history/time-travel pattern Delta's streaming sink
    provides, on plain parquet. Batch id goes into the snapshot note, so
    the table history doubles as a processing ledger; the atomic manifest
    flip means readers never observe a half-written batch.

    Replay idempotency: foreachBatch is at-least-once, so a crash between
    the upsert and the checkpoint commit replays the batch. The keyed
    upsert keeps table CONTENT correct either way; to keep the HISTORY
    ledger exactly-once too, a replayed batch id (already the latest
    snapshot's note) is skipped as a no-op."""
    from gcp_etl_pipeline_spark.sinks.versioned import VersionedTable

    table = VersionedTable(table_path)
    return (
        stream_df.writeStream.foreachBatch(versioned_batch_writer(table, keys))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def versioned_batch_writer(table, keys: list[str]):
    """The foreachBatch closure for foreach_batch_versioned, exposed for
    direct testing of the replay-no-op guard."""

    def write_version(batch_df: DataFrame, batch_id: int) -> None:
        note = f"stream batch {batch_id}"
        latest = table.latest_version()
        if latest is not None:
            hist = {e["version"]: e["note"] for e in table.history()}
            if hist.get(latest) == note:
                return  # replay of an already-committed batch
        if not batch_df.isEmpty():
            table.upsert(batch_df, keys, note=note)

    return write_version


def foreach_batch_insert_new(
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint: str,
):
    """Streaming insert-new-only maintenance: every micro-batch anti-joins
    the current target state and appends only unseen keys — the streaming
    form of the reference's hlp/lkp/dim maintenance (I2). Idempotent per
    key across batches; with Delta in the sink this would be MERGE INTO."""
    from gcp_etl_pipeline_spark.operators.incremental import insert_new_only

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            target = spark.read.parquet(target_path)
        except Exception:  # noqa: BLE001 — first batch: target doesn't exist
            target = None
        new = insert_new_only(batch_df, target, keys, normalize=False)
        new.write.mode("append").parquet(target_path)

    return (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
