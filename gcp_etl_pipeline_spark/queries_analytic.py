"""Analytic-coverage queries: window value/distribution functions, SCD2,
correlated subqueries, array/explode, ordered string aggregation, exact
math suite, histogram bucketing, and time-spine gap fill.

These extend SURVEY.md §2's inventory with the analytics a warehouse user
expects on top of the reference's semantics (the reference itself stops at
row_number/rank — `...retailer_hlp_01.py:51`, `punjabcencus_tehsil_hlp_01.sql:4`).
Every query keeps cross-engine determinism: unique-key tiebreaks in every
ORDER BY, µ-unit quantization for derived doubles, and exact integer math
elsewhere (see functions/deterministic.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.functions.deterministic import det_sum_expr
from gcp_etl_pipeline_spark.queries_relational import ensure_views, shared_sql
from gcp_etl_pipeline_spark.registry import register

# ---------------------------------------------------------------- windows
# Distribution functions. percent_rank/cume_dist are single IEEE divisions
# of exact integers — deterministic cross-engine; quantized to µ-units so
# the value hash is byte-stable anyway.
shared_sql(
    "window_ntile_ranks",
    """
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           CAST(ROUND(PERCENT_RANK() OVER w * 1000000, 0) AS BIGINT)
             AS pct_rank_u,
           CAST(ROUND(CUME_DIST() OVER w * 1000000, 0) AS BIGINT) AS cume_u
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)

# first/last/nth value over explicit full frames (LAST_VALUE on the default
# frame is a classic footgun — pin ROWS UNBOUNDED..UNBOUNDED in both engines)
shared_sql(
    "window_value_functions",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(FIRST_VALUE(l_quantity) OVER wf AS BIGINT) AS first_qty,
           CAST(LAST_VALUE(l_quantity) OVER wf AS BIGINT) AS last_qty,
           CAST(NTH_VALUE(l_quantity, 2) OVER wf AS BIGINT) AS second_qty
    FROM lineitem
    WHERE l_orderkey < 2000
    WINDOW wf AS (PARTITION BY l_orderkey ORDER BY l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)

# ------------------------------------------------- ordered-arg aggregates
# max_by/min_by (DuckDB aliases of arg_max/arg_min). Second arg is the
# unique key, so ties cannot occur and both engines agree.
shared_sql(
    "minby_maxby",
    """
    SELECT c_nationkey,
           MAX_BY(c_name, c_custkey) AS newest_name,
           MIN_BY(c_name, c_custkey) AS oldest_name,
           COUNT(*) AS n
    FROM customer GROUP BY c_nationkey
    """,
)

# --------------------------------------------- correlated scalar subquery
# Per-order max detection; exact integer comparison, no float thresholds.
shared_sql(
    "correlated_max_lineitem",
    """
    SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem l1
    WHERE l_orderkey < 20000
      AND l_quantity = (SELECT MAX(l_quantity) FROM lineitem l2
                        WHERE l2.l_orderkey = l1.l_orderkey)
    """,
)

# ----------------------------------------------------- exact math suite
# Only functions whose doubles come from single correctly-rounded IEEE ops
# (abs/ceil/floor on products, sign, mod, greatest/least, small int powers)
# — libm-backed functions (exp/ln/sin) are NOT cross-engine exact and stay
# out of the differential surface.
shared_sql(
    "math_exact_suite",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(CAST(l_quantity AS BIGINT) - 25) AS abs_dev,
           CAST(SIGN(CAST(l_quantity AS BIGINT) - 25) AS INT) AS sgn,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_ceil,
           CAST(FLOOR(l_tax * 100) AS BIGINT) AS tax_floor,
           MOD(CAST(l_quantity AS BIGINT), 7) AS qty_mod7,
           GREATEST(CAST(l_quantity AS BIGINT), 30) AS qty_hi,
           LEAST(CAST(l_quantity AS BIGINT), 30) AS qty_lo,
           CAST(POWER(MOD(CAST(l_quantity AS BIGINT), 10), 2) AS BIGINT)
             AS qty_sq
    FROM lineitem WHERE l_orderkey < 5000
    """,
)

# -------------------------------------------------- histogram bucketing
# Integer bucket via FLOOR of one exact IEEE division — the width_bucket
# shape without relying on either engine's width_bucket internals.
shared_sql(
    "histogram_price_buckets",
    f"""
    SELECT CAST(FLOOR(o_totalprice / 30000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           {det_sum_expr('o_totalprice')} AS sum_price
    FROM orders GROUP BY 1
    """,
)

# ------------------------------------------------- ordered string agg
# Spark has no ORDER BY inside string_agg; sort_array(collect_list(...))
# reproduces it exactly for unique elements.
register(
    "string_agg_sorted",
    lambda spark, sf_dir: (
        ensure_views(spark, sf_dir),
        spark.sql(
            """
            SELECT c_nationkey,
                   array_join(sort_array(collect_list(c_name)), '|') AS names
            FROM customer WHERE c_custkey <= 500 GROUP BY c_nationkey
            """
        ),
    )[1],
    """
    SELECT c_nationkey, string_agg(c_name, '|' ORDER BY c_name) AS names
    FROM customer WHERE c_custkey <= 500 GROUP BY 1
    """,
)

# --------------------------------------------------- explode / unnest
# Word frequency over part names: Spark explode(split()) vs DuckDB
# unnest(string_split()). Tokenization (split on space) is pure string
# work — locale-safe in both engines.
register(
    "explode_word_counts",
    lambda spark, sf_dir: (
        ensure_views(spark, sf_dir),
        spark.sql(
            """
            SELECT word, COUNT(*) AS n
            FROM (SELECT explode(split(p_name, ' ')) AS word FROM part) t
            GROUP BY word
            """
        ),
    )[1],
    """
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
    GROUP BY 1
    """,
)

# --------------------------------------------------- time-spine gap fill
# Zero-filled daily counts between the observed min/max day. Spark:
# sequence() + explode; DuckDB: generate_series + unnest. The spine is
# derived from the data, broadcast (1-row bounds), and joined — no
# driver-side date loop.
def _q_time_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        WITH bounds AS (
          SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
          FROM events
        ),
        days AS (
          SELECT explode(sequence(lo, hi)) AS d FROM bounds
        ),
        daily AS (
          SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
          FROM events GROUP BY 1
        )
        SELECT days.d, COALESCE(daily.n, 0) AS n_events
        FROM days LEFT JOIN daily ON days.d = daily.d
        """
    )


register(
    "time_spine_gapfill",
    _q_time_spine,
    """
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
      FROM events
    ),
    days AS (
      SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events GROUP BY 1
    )
    SELECT days.d, COALESCE(daily.n, 0) AS n_events
    FROM days LEFT JOIN daily ON days.d = daily.d
    """,
)

# ------------------------------------------------------------- SCD2
# Orders as a change stream: each customer's order priority over time,
# compressed to versions with valid_from/valid_to/is_current.
def _q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_etl_pipeline_spark.operators.scd2 import scd2_build

    ensure_views(spark, sf_dir)
    changes = spark.table("orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    return scd2_build(
        changes,
        keys=["o_custkey"],
        attrs=["o_orderpriority"],
        ts_col="o_orderdate",
        tiebreak=["o_orderkey"],
    )


register(
    "scd2_priority_history",
    _q_scd2,
    """
    WITH ch AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             LAG(o_orderpriority) OVER w AS prev,
             ROW_NUMBER() OVER w AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    versions AS (
      SELECT * FROM ch
      WHERE rn = 1 OR prev IS DISTINCT FROM o_orderpriority
    )
    SELECT o_custkey, o_orderpriority,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w2 AS valid_to,
           CASE WHEN LEAD(o_orderdate) OVER w2 IS NULL THEN 1 ELSE 0 END
             AS is_current
    FROM versions
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)

# ------------------------------------------------------------ UNPIVOT
# Wide->long measure reshaping, SQL-standard syntax in both engines.
# Measures are µ-unit quantized BEFORE unpivoting so the long column is
# a single exact integer type.
shared_sql(
    "unpivot_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, val_u
    FROM (
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(CAST(l_quantity AS DOUBLE) * 1000000, 0) AS BIGINT)
               AS qty_u,
             CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 1000000, 0) AS BIGINT)
               AS price_u,
             CAST(ROUND(CAST(l_discount AS DOUBLE) * 1000000, 0) AS BIGINT)
               AS disc_u
      FROM lineitem WHERE l_orderkey < 3000
    ) src
    UNPIVOT (val_u FOR measure IN (qty_u, price_u, disc_u))
    """,
)

# ------------------------------------------------------ LATERAL join
# Correlated per-row subquery with ORDER BY + LIMIT: top-2 suppliers per
# nation. Spark plans this as a lateral join; deterministic via the
# unique-key tiebreak.
shared_sql(
    "lateral_top2_suppliers",
    """
    SELECT n.n_name, s.s_name, s.acctbal_u
    FROM nation n, LATERAL (
      SELECT s_name,
             CAST(ROUND(CAST(s_acctbal AS DOUBLE) * 1000000, 0) AS BIGINT)
               AS acctbal_u
      FROM supplier WHERE s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_suppkey LIMIT 2
    ) s
    """,
)

# ----------------------------------------------------- Z-order layout
# The layout operator's Morton key, graded: per zkey-bucket row counts
# and per-dimension quantized ranges — tight ranges in BOTH dimensions
# per bucket are exactly the property that lets parquet footer stats
# skip files for filters on either column. Spark side runs the real
# operator (operators/layout.py); the oracle re-derives the key with
# DuckDB's native bit operators.
_ZBITS = 8
_QX = "LEAST(GREATEST(CAST(FLOOR(CAST(l_quantity AS DOUBLE) / 0.25) AS BIGINT), 0), 255)"
_QY = "LEAST(GREATEST(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) / 512.0) AS BIGINT), 0), 255)"


def _q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from gcp_etl_pipeline_spark.operators.layout import quantize, zorder_key

    ensure_views(spark, sf_dir)
    li = spark.table("lineitem")
    qx = quantize(F.col("l_quantity"), 0.0, 64.0, _ZBITS)
    qy = quantize(F.col("l_extendedprice"), 0.0, 131072.0, _ZBITS)
    keyed = li.select(qx.alias("qx"), qy.alias("qy")).withColumn(
        "zkey", zorder_key([F.col("qx"), F.col("qy")], _ZBITS)
    )
    return keyed.groupBy(
        F.shiftright("zkey", 10).cast("bigint").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("qx").alias("qx_lo"),
        F.max("qx").alias("qx_hi"),
        F.min("qy").alias("qy_lo"),
        F.max("qy").alias("qy_hi"),
    )


def _zorder_oracle() -> str:
    from gcp_etl_pipeline_spark.operators.layout import zorder_sql_expr

    zexpr = zorder_sql_expr(
        ["qx", "qy"], _ZBITS,
        shiftl=lambda e, n: f"({e} << {n})",
        shiftr=lambda e, n: f"({e} >> {n})",
    )
    return f"""
    WITH q AS (
      SELECT {_QX} AS qx, {_QY} AS qy FROM lineitem
    ),
    z AS (SELECT qx, qy, ({zexpr}) AS zkey FROM q)
    SELECT CAST((zkey >> 10) AS BIGINT) AS zbucket, COUNT(*) AS n,
           MIN(qx) AS qx_lo, MAX(qx) AS qx_hi,
           MIN(qy) AS qy_lo, MAX(qy) AS qy_hi
    FROM z GROUP BY 1
    """


register("zorder_locality", _q_zorder, _zorder_oracle())

# -------------------------------------------------------- funnel analysis
# Ordered-stage conversion over the event log: one grouped pass builds
# per-user stage timestamps, one tiny aggregate scores the funnel.
# NULL-comparison semantics (missing stage -> FALSE) are identical in
# both engines.
shared_sql(
    "funnel_events",
    """
    WITH m AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS stage_view,
           CAST(SUM(CASE WHEN t_click >= t_view THEN 1 ELSE 0 END)
                AS BIGINT) AS stage_click,
           CAST(SUM(CASE WHEN t_click >= t_view AND t_purchase >= t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
    FROM m
    """,
)

# ------------------------------------------------------- cohort retention
# Classic cohort x age matrix via integer month indexes (year*12+month) —
# pure integer arithmetic, no engine-specific month-diff semantics.
shared_sql(
    "cohort_retention",
    """
    WITH firsts AS (
      SELECT o_custkey,
             MIN(CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT))
               AS cohort_m
      FROM orders GROUP BY o_custkey
    )
    SELECT f.cohort_m,
           CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT)
             - f.cohort_m AS age_months,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS active_customers
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
    """,
)

# --------------------------------------------- deterministic hash sample
# Reproducible ~10% sample via md5 prefix — the cross-engine, cross-run
# stable alternative to TABLESAMPLE (whose RNG differs per engine/seed).
# At 100 TB this is the only sampling that is re-runnable and joinable
# across tables (sample the same keys everywhere).
shared_sql(
    "hash_sample_orders",
    """
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key
    FROM orders
    WHERE substring(md5(CAST(o_orderkey AS STRING)), 1, 2) < '1a'
    GROUP BY o_orderstatus
    """,
)

# ----------------------------------------------------- percent of total
# ratio_to_report shape: exact integer group sums, then one window total
# and one deterministic division.
shared_sql(
    "pct_of_total_sales",
    """
    SELECT o_orderpriority,
           sum_u,
           CAST(ROUND(CAST(sum_u AS DOUBLE)
                      / CAST(SUM(sum_u) OVER () AS DOUBLE) * 1000000, 0)
                AS BIGINT) AS pct_u
    FROM (
      SELECT o_orderpriority,
             SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 1000000, 0)
                      AS BIGINT)) AS sum_u
      FROM orders GROUP BY o_orderpriority
    ) g
    """,
)

# ----------------------------------------------------------- CDC apply
# I/U/D change stream folded into a snapshot (operators/cdc.py). The
# change stream is synthesized deterministically from orders — EVERY
# order is a change event (latest per customer wins), plus 'I' rows for
# unseen keys — so the operator's latest-pick, delete, and upsert paths
# all carry weight. Oracle implements the same semantics declaratively.
_CDC_CHANGES = """
    SELECT o_custkey AS c_custkey,
           'upd-' || CAST(o_orderkey AS STRING) AS c_name,
           o_orderpriority AS c_mktsegment,
           CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
           o_orderdate AS seq_d, o_orderkey AS seq_k
    FROM orders
    UNION ALL
    SELECT 1000000 + o_orderkey, 'new-' || CAST(o_orderkey AS STRING),
           o_orderpriority, 'I', o_orderdate, o_orderkey
    FROM orders WHERE o_orderkey < 100
"""


def _q_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_etl_pipeline_spark.operators.cdc import apply_changes

    ensure_views(spark, sf_dir)
    snapshot = spark.table("customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    changes = spark.sql(_CDC_CHANGES)
    return apply_changes(
        snapshot, changes, keys=["c_custkey"], seq_cols=["seq_d", "seq_k"]
    )


register(
    "cdc_apply_changes",
    _q_cdc,
    f"""
    WITH ch AS ({_CDC_CHANGES}),
    lat AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                ORDER BY seq_d DESC, seq_k DESC) AS rn
      FROM ch
    ),
    l1 AS (SELECT * FROM lat WHERE rn = 1)
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM l1 WHERE l1.c_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment FROM l1 WHERE op <> 'D'
    """,
)

# ------------------------------------------- incremental view maintenance
# The rollup is maintained as mergeable partials: aggregate only each
# delta, merge states (operators/ivm.py). Splitting orders at a date
# boundary and merging the two states must be bit-identical to the
# from-scratch aggregate — which is exactly what the oracle computes.
def _q_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_etl_pipeline_spark.operators.ivm import (
        aggregate_partials,
        merge_partials,
    )

    ensure_views(spark, sf_dir)
    orders = spark.table("orders").select(
        "o_orderstatus", "o_orderdate", "o_orderkey",
        F.expr(
            "CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 1000000, 0) AS BIGINT)"
        ).alias("price_u"),
    )
    spec = dict(
        keys=["o_orderstatus"], sums=["price_u"],
        mins=["o_orderkey"], maxs=["o_orderdate"],
    )
    old = aggregate_partials(
        orders.where("o_orderdate < DATE '1996-01-01'"), **spec
    )
    new = aggregate_partials(
        orders.where("o_orderdate >= DATE '1996-01-01'"), **spec
    )
    return merge_partials([old, new], **spec).select(
        "o_orderstatus",
        F.col("__cnt").alias("n"),
        F.col("s_price_u").alias("sum_price_u"),
        F.col("mn_o_orderkey").alias("min_key"),
        F.col("mx_o_orderdate").alias("max_date"),
    )


register(
    "ivm_incremental_rollup",
    _q_ivm,
    """
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 1000000, 0)
                AS BIGINT)) AS BIGINT) AS sum_price_u,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           MAX(o_orderdate) AS max_date
    FROM orders GROUP BY 1
    """,
)


# ------------------------------------------------------- event analytics
# Funnel conversion (ordered-sequence detection): users advance
# view → click → purchase only if each stage's FIRST event is at or after
# the previous stage's first event. Stage sets shrink monotonically, so
# each CTE joins only the previous survivors — three keyed aggregates, no
# window state, scales as three shuffles on user_id at any corpus size.
shared_sql(
    "funnel_conversion",
    """
    WITH s1 AS (
      SELECT user_id, MIN({EPOCH}(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id AS user_id, MIN({EPOCH}(e.ts)) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND {EPOCH}(e.ts) >= s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id AS user_id, MIN({EPOCH}(e.ts)) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND {EPOCH}(e.ts) >= s2.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_view,
           (SELECT COUNT(*) FROM s2) AS n_view_click,
           (SELECT COUNT(*) FROM s3) AS n_full_funnel
    """,
)

# Weekly event-log cohorts (the monthly orders-table variant above is
# `cohort_retention`): users grouped by first-activity week; one row per
# (cohort_week, week_offset) with the count still active. Two keyed
# aggregates + one join — the first-activity table is users-sized (small
# relative to events), broadcast-able at scale.
shared_sql(
    "cohort_retention_weekly",
    """
    WITH f AS (
      SELECT user_id,
             CAST(FLOOR(MIN({EPOCH}(ts)) / 604800.0) AS BIGINT) AS cohort_w
      FROM events GROUP BY user_id
    ), a AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR({EPOCH}(ts) / 604800.0) AS BIGINT) AS w
      FROM events
    )
    SELECT f.cohort_w AS cohort_week, a.w - f.cohort_w AS week_offset,
           COUNT(*) AS n_users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)


# SCD2 point-in-time lookup: each probe (customer, date+10d) fetches the
# priority version in force at that instant — the standard PIT join every
# versioned-dimension warehouse needs. Probes predating a customer's first
# version surface with NULL attributes (left join).
def _q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_etl_pipeline_spark.operators.scd2 import scd2_build, scd2_lookup

    ensure_views(spark, sf_dir)
    changes = spark.table("orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    dim = scd2_build(
        changes, keys=["o_custkey"], attrs=["o_orderpriority"],
        ts_col="o_orderdate", tiebreak=["o_orderkey"],
    )
    probes = spark.table("orders").where("o_orderkey % 7 = 0").select(
        "o_orderkey", "o_custkey",
        F.date_add("o_orderdate", 10).alias("probe_date"),
    )
    out = scd2_lookup(probes, dim, keys=["o_custkey"], ts_col="probe_date")
    return out.select(
        "o_orderkey", "o_custkey", "probe_date",
        F.col("o_orderpriority").alias("prio"),
    )


register(
    "scd2_point_in_time_lookup",
    _q_scd2_lookup,
    """
    WITH ch AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             LAG(o_orderpriority) OVER w AS prev,
             ROW_NUMBER() OVER w AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    versions AS (
      SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
             LEAD(o_orderdate) OVER w2 AS valid_to
      FROM (SELECT * FROM ch
            WHERE rn = 1 OR prev IS DISTINCT FROM o_orderpriority)
      WINDOW w2 AS (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey)
    ),
    probes AS (
      SELECT o_orderkey, o_custkey, o_orderdate + INTERVAL 10 DAY AS pd
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT p.o_orderkey, p.o_custkey, CAST(p.pd AS DATE) AS probe_date,
           v.o_orderpriority AS prio
    FROM probes p LEFT JOIN versions v
      ON p.o_custkey = v.o_custkey
         AND v.valid_from <= p.pd
         AND (v.valid_to IS NULL OR p.pd < v.valid_to)
    """,
)


# ------------------------------------- grouped-map / cogrouped pandas

def _q_grouped_pandas_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event-gap statistics via GROUPED-MAP applyInPandas
    (one Arrow batch per user group; pandas does the per-group sort +
    median). The median of integer second gaps is exact in float64
    (integer or .5), so the SQL oracle reproduces it bit-for-bit. The
    shape: one hash exchange on the group key, then embarrassingly
    parallel pandas — the escape hatch for per-group logic Catalyst
    can't express, kept OFF the hot paths (this exact query is also
    expressible as lag+median, which is what the oracle does)."""
    import pandas as _pd

    ensure_views(spark, sf_dir)
    ev = spark.table("events").select("user_id", "ts")

    def stats(pdf: _pd.DataFrame) -> _pd.DataFrame:
        import numpy as _np

        s = pdf.sort_values("ts")["ts"]
        # exact integer MICROsecond gaps: the fixture's timestamps carry
        # sub-second precision, and float total_seconds() vs SQL epoch()
        # differ in the last ulp — integer µs are bit-stable, and their
        # median is an integer or .5 (exact in float64)
        gaps = (
            s.diff().dropna().to_numpy()
            .astype("timedelta64[us]").astype(_np.int64)
        )
        return _pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "median_gap_us": [
                    float(_np.median(gaps)) if len(gaps) else None
                ],
                "max_gap_us": [int(gaps.max()) if len(gaps) else None],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        stats,
        "user_id BIGINT, n_events BIGINT, median_gap_us DOUBLE, "
        "max_gap_us BIGINT",
    )


register(
    "grouped_pandas_gap_stats",
    _q_grouped_pandas_gaps,
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts)) AS gap
      FROM events),
    agg AS (
      SELECT user_id, COUNT(*) AS n_events,
             CAST(MEDIAN(gap) AS DOUBLE) AS median_gap_us,
             CAST(MAX(gap) AS BIGINT) AS max_gap_us
      FROM g GROUP BY 1)
    SELECT user_id, n_events, median_gap_us, max_gap_us FROM agg
    """,
)


def _q_cogrouped_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED applyInPandas: clicks and purchases cogrouped per user,
    pandas computes last-click attribution (each purchase attributed to
    the latest click at-or-before it) — the two-sided per-key merge shape
    (trades/quotes, impressions/conversions) that would otherwise need a
    range join. One co-partitioned exchange per side, then per-user
    pandas merges. Oracle: correlated MAX in SQL."""
    import pandas as _pd

    ensure_views(spark, sf_dir)
    ev = spark.table("events")
    clicks = ev.where("event_type = 'click'").select("user_id", "ts")
    buys = ev.where("event_type = 'purchase'").select(
        "user_id", "ts", "event_id"
    )

    def attribute(cl: _pd.DataFrame, pu: _pd.DataFrame) -> _pd.DataFrame:
        if pu.empty:
            return _pd.DataFrame(
                columns=["user_id", "purchase_id", "click_lag_s"]
            )
        out = []
        cts = cl["ts"].sort_values().tolist() if not cl.empty else []
        for _, r in pu.iterrows():
            prior = [t for t in cts if t <= r["ts"]]
            # integer µs lag (see grouped_pandas_gap_stats): float
            # seconds differ from SQL epoch() in the last ulp
            lag = (
                int((r["ts"] - prior[-1]).value // 1000) if prior else None
            )
            out.append((r["user_id"], r["event_id"], lag))
        return _pd.DataFrame(
            out, columns=["user_id", "purchase_id", "click_lag_us"]
        )

    return clicks.groupBy("user_id").cogroup(
        buys.groupBy("user_id")
    ).applyInPandas(
        attribute,
        "user_id BIGINT, purchase_id BIGINT, click_lag_us BIGINT",
    )


register(
    "cogrouped_attribution",
    _q_cogrouped_attribution,
    """
    SELECT p.user_id, p.event_id AS purchase_id,
           CAST(epoch_us(p.ts) - MAX(epoch_us(c.ts)) AS BIGINT)
             AS click_lag_us
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.user_id, p.event_id, p.ts
    """,
)
