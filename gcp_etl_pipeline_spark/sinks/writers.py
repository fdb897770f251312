"""Table writers (reference K1-K6).

The reference's sinks: Beam WriteToParquet with an explicit schema (K1),
CSV-with-header text writes (K2), Spark parquet overwrite with
dynamic-partition mode (K3), parquet append for insert-new-only
maintenance (K4), and BigQuery truncate-insert / insert-select (K5/K6).
Here they are the built-in DataFrame writers with the engine's physical-
design decisions applied:

  - facts partition by a date column (``partition_by``) so dynamic
    overwrite only replaces touched partitions and downstream scans prune
    by date — the reference sets the conf but never actually partitions
    (SURVEY §4). ``write_parquet`` pins ``partitionOverwriteMode=dynamic``
    around partitioned overwrites ITSELF (restoring the prior value), the
    reference's per-job scoping (`...sales_fact_01.py:107`) — a caller on
    a stock session must never get the static-mode full wipe;
  - ``insert_new_rows`` is the K4 append path fused with the P6 anti-join
    so the append can never double-insert keys already present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if partition_by and mode == "overwrite":
        # self-contained dynamic partition overwrite (eager write, so the
        # try/finally restore is safe — unlike lazy query conf, see
        # registry._self_contained)
        spark = df.sparkSession
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prior = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "dynamic")
        try:
            w.parquet(path)
        finally:
            if prior is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)
    else:
        w.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Newline-delimited JSON sink (interchange format; ~5-10x the bytes
    of Parquet/ORC — for handoff to JSON-consuming systems, not storage)."""
    df.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed (and optionally sorted) catalog table: rows are hash-
    distributed into ``num_buckets`` files per partition by
    ``bucket_cols``. Two tables bucketed the same way join WITHOUT a
    shuffle (co-located sort-merge; asserted in tests/test_bucketing.py) —
    the physical-design answer for repeated large-x-large joins on a
    stable key, e.g. fact-to-fact on order keys, where broadcast is
    impossible and per-query exchanges would dominate at 100 TB."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def read_target(spark: SparkSession, path: str) -> DataFrame | None:
    """Current state of a path-addressed target table; None if absent
    (first run — the reference's coalesce(MAX(key),0) empty case)."""
    try:
        return spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — [PATH_NOT_FOUND]
        return None


def insert_new_rows(
    df: DataFrame,
    path: str,
    keys: list[str],
    normalize: bool = True,
) -> int:
    """Append only rows whose natural key is absent from the target
    (reference K4 + P6 as one idempotent operation). Returns rows written."""
    from gcp_etl_pipeline_spark.operators.incremental import insert_new_only

    target = read_target(df.sparkSession, path)
    new = insert_new_only(df, target, keys, normalize=normalize)
    new = new.persist()
    try:
        n = new.count()
        if n > 0:  # reference write gate: `if rows_ingested > 0`
            new.write.mode("append").parquet(path)
    finally:
        new.unpersist()
    return n
