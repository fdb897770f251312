"""Stateful sessionizer tests: cross-batch state, gap closure, timeout."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.sources.files import read_parquet
from gcp_etl_pipeline_spark.streaming import core, stateful


def _run(spark, src_dir, ckpt, out_dir):
    """Drain through a file sink (supports checkpoint recovery across
    runs, unlike the memory sink); returns the cumulative output table."""
    stream = stateful.sessionize(core.read_events_stream(spark, src_dir))
    q = (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def test_sessionize_matches_batch_twin(spark, sf_dir, tmp_path):
    """All sessions closed by subsequent in-stream events must equal the
    batch lag+flag-sum sessionization over the same data (the final open
    session per user stays in state — watermark can't pass it without
    more data)."""
    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    got = _run(spark, str(src), str(tmp_path / "ck"), str(tmp_path / "out"))

    events = read_parquet(spark, f"{sf_dir}/events.parquet")
    batch = spark.sql(
        """
        WITH g AS (
          SELECT user_id, unix_timestamp(ts) AS epoch,
                 CASE WHEN unix_timestamp(ts) - LAG(unix_timestamp(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts) > 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM {events}
        ), s AS (
          SELECT user_id,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY epoch
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id,
                 epoch
          FROM g
        )
        SELECT user_id, sess_id, MIN(epoch) AS sess_start, MAX(epoch) AS sess_end,
               COUNT(*) AS n_events
        FROM s GROUP BY user_id, sess_id
        """,
        events=events,
    )
    b = {
        (r.user_id, r.sess_id): (r.sess_start, r.sess_end, r.n_events)
        for r in batch.collect()
    }
    # expected: every session closed by a later event (non-last), plus last
    # sessions the final watermark (max ts - 2h) timed out past sess_end+gap
    last = {}
    for (u, sid) in b:
        last[u] = max(last.get(u, -1), sid)
    wm = (
        events.agg(F.max(F.unix_timestamp("ts"))).first()[0] - 7200
    )
    b_closed = {
        k: v
        for k, v in b.items()
        if k[1] < last[k[0]] or v[1] + 1800 < wm
    }

    g = {
        (r.user_id, r.sess_id): (r.sess_start, r.sess_end, r.n_events)
        for r in got.collect()
    }
    assert g == b_closed


def test_sessionize_cross_batch_closure(spark, sf_dir, tmp_path):
    """A second batch far in the future closes every open session — either
    via the gap rule or the event-time timeout."""
    src = tmp_path / "in2"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    ckpt = str(tmp_path / "ck2")
    out = str(tmp_path / "out2")
    first = _run(spark, str(src), ckpt, out).count()

    events = read_parquet(spark, f"{sf_dir}/events.parquet")
    users = events.select("user_id").distinct()
    far_future = events.agg(
        (F.max(F.unix_timestamp("ts")) + 864000).alias("t")
    ).first().t
    sentinel = users.select(
        (F.col("user_id") + 1000000).alias("event_id"),
        F.timestamp_seconds(F.lit(far_future)).alias("ts").cast("timestamp"),
        "user_id",
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    # append the sentinel file in the same µs-timestamp layout as the
    # staged fixture (the stream reader sniffs the directory's unit once)
    sentinel.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).write.mode("append").parquet(str(src))

    cumulative = _run(spark, str(src), ckpt, out)
    n_users = users.count()
    total_sessions_batch = spark.sql(
        """
        SELECT COUNT(*) FROM (
          SELECT user_id, SUM(flag) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM (SELECT user_id, ts,
                 CASE WHEN unix_timestamp(ts) - LAG(unix_timestamp(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts) > 1800 THEN 1 ELSE 0 END AS flag
                FROM {events})
        ) GROUP BY user_id, sid
        """,
        events=events,
    ).count()
    # run 2 closes all remaining original sessions; sentinel sessions
    # stay open in state (they are the newest events)
    closed_in_run2 = cumulative.count() - first
    assert first + closed_in_run2 == total_sessions_batch
