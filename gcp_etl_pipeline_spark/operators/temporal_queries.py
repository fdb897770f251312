"""Graded queries for the as-of and range join operators (engine
extensions; SURVEY §2.4 notes the reference has neither).

Both oracles use DuckDB's native forms (ASOF JOIN, BETWEEN theta join) —
a strong differential check: our bucketed/windowed Spark rewrites must
reproduce a real engine's native operator bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.functions.deterministic import det_sum_bigint_expr
from gcp_etl_pipeline_spark.queries_relational import ensure_views
from gcp_etl_pipeline_spark.registry import register


# --------------------------------------------------------- as-of join
# For every click event: the most recent error (same user, error.ts <=
# click.ts) and its value. The right side is aggregated to one row per
# (user_id, ts) first — the determinism precondition both our operator
# and DuckDB's ASOF JOIN share.

def _q_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_etl_pipeline_spark.operators.asof import asof_join

    ensure_views(spark, sf_dir)
    ev = spark.table("events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("err_value"))
    )
    out = asof_join(clicks, errors, on=["user_id"], left_ts="ts")
    return out.select("event_id", "user_id", "value", "err_value")


register(
    "asof_join_events",
    _q_asof_events,
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    errors AS (
      SELECT user_id, ts, MAX(value) AS err_value
      FROM events WHERE event_type = 'error' GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id, c.value, e.err_value
    FROM clicks c
    ASOF LEFT JOIN errors e ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
)


# -------------------------------------------------------- range join
# Non-uniform (quadratic) price bands; every lineitem lands in the band
# with lo <= l_extendedprice < hi. Bands are generated identically in
# both engines from range(0, 70).

_BANDS_SPARK = """
    SELECT id AS band_id,
           25.0D * id * id AS lo,
           25.0D * (id + 1) * (id + 1) AS hi
    FROM range(0, 70)
"""


def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_etl_pipeline_spark.operators.rangejoin import range_join

    ensure_views(spark, sf_dir)
    bands = spark.sql(_BANDS_SPARK)
    li = spark.table("lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    # chunk 1024 ≈ the mid-band width; the widest band (~3,450) explodes
    # into ~4 chunk copies — the broadcast side stays tiny.
    joined = range_join(
        li, bands, value_col="l_extendedprice", lo_col="lo", hi_col="hi", chunk=1024.0
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(det_sum_bigint_expr("l_extendedprice")).alias("sum_price_u"),
    )


register(
    "range_join_bands",
    _q_range_join,
    f"""
    WITH bands AS (
      SELECT range AS band_id,
             25.0 * range * range AS lo,
             25.0 * (range + 1) * (range + 1) AS hi
      FROM range(0, 70)
    )
    SELECT b.band_id, COUNT(*) AS n,
           {det_sum_bigint_expr('li.l_extendedprice')} AS sum_price_u
    FROM lineitem li
    JOIN bands b ON li.l_extendedprice >= b.lo AND li.l_extendedprice < b.hi
    GROUP BY 1
    """,
)


# ----------------------------------------- as-of with tolerance bound

def _q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a staleness bound (pandas merge_asof's ``tolerance``,
    kdb wj's window): a click matches the latest same-user error only if
    it is at most 30 minutes old — older context is stale and must stay
    NULL. DuckDB has no native tolerance, so the oracle decorrelates to
    a bounded MAX + equality join back."""
    from gcp_etl_pipeline_spark.operators.asof import asof_join

    ensure_views(spark, sf_dir)
    ev = spark.table("events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("err_value"))
    )
    out = asof_join(
        clicks, errors, on=["user_id"], left_ts="ts", tolerance_s=1800.0
    )
    return out.select("event_id", "user_id", "value", "err_value")


register(
    "asof_join_tolerance",
    _q_asof_tolerance,
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'click'
    ),
    errors AS (
      SELECT user_id, ts, MAX(value) AS err_value
      FROM events WHERE event_type = 'error' GROUP BY 1, 2
    ),
    m AS (
      SELECT c.event_id, c.user_id, c.value, MAX(e.ts) AS mts
      FROM clicks c
      LEFT JOIN errors e
        ON e.user_id = c.user_id AND e.ts <= c.ts
       AND e.ts >= c.ts - INTERVAL 30 MINUTE
      GROUP BY c.event_id, c.user_id, c.value
    )
    SELECT m.event_id, m.user_id, m.value, e.err_value
    FROM m LEFT JOIN errors e
      ON e.user_id = m.user_id AND e.ts = m.mts
    """,
)
