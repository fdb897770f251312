"""Declarative data-quality expectations (Deequ / dbt-tests / Delta
CHECK-constraint analogue — the reference's only quality control is its
``rows_ingested > 0`` write gate, `...sales_fact_01.py:169`; a real
lakehouse engine needs row-level contracts).

An expectation is (name, boolean Column over one row). The operator
evaluates ALL expectations in one scan:

  - ``check(df, expectations)`` → per-rule violation counts + pass flag
    (one aggregate job; no per-rule passes);
  - ``enforce(df, expectations)`` → (good, bad) split, where ``bad``
    carries a ``failed_rules`` array naming every rule the row broke —
    the quarantine-table pattern (bad rows route to a review sink
    instead of poisoning the target).

Scale notes: everything is JVM-side boolean algebra fused into the scan
(one WholeStageCodegen span over the batch); ``enforce`` evaluates the
rule array ONCE via a shared projection, and both splits filter on it —
no second scan of the rule expressions, no UDFs, no shuffle at all.

Builders cover the reference-relevant constraint classes: not_null,
unique_key (the only one needing a shuffle — a groupBy on the key),
in_range, one_of, matches (regex), custom SQL predicate.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Expectations = Mapping[str, Column]


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> Column:
    c = F.col(col)
    return c.isNotNull() & (c >= F.lit(lo)) & (c <= F.lit(hi))


def one_of(col: str, allowed: list) -> Column:
    return F.col(col).isin(allowed)


def matches(col: str, regex: str) -> Column:
    return F.col(col).rlike(regex)


def predicate(sql: str) -> Column:
    """Arbitrary row-level SQL predicate, e.g. ``predicate("a < b")``."""
    return F.expr(sql)


def from_spec(spec) -> dict[str, Column]:
    """Derive the contract-implied rule set from a TableSpec (spec.py):
    merge-key columns must be present, date-like columns (stringified at
    ingestion per the reference's CAST-AS-CHAR ladder) must parse back as
    ``yyyy-MM-dd``, and the watermark column must be present. Merge-key
    UNIQUENESS is the shuffle-needing check — run it separately via
    ``unique_key_violations(df, spec.merge_columns)``."""
    rules: dict[str, Column] = {}
    for k in spec.merge_columns:
        rules[f"{k}_not_null"] = not_null(k)
    if spec.watermark_column and spec.watermark_column not in spec.merge_columns:
        rules[f"{spec.watermark_column}_not_null"] = not_null(
            spec.watermark_column
        )
    for c in spec.columns:
        if c.is_datelike:
            rules[f"{c.name}_date_parseable"] = F.col(c.name).isNull() | (
                F.try_to_timestamp(
                    F.col(c.name).cast("string"), F.lit("yyyy-MM-dd")
                ).isNotNull()
            )
    return rules


def check(df: DataFrame, expectations: Expectations) -> DataFrame:
    """One row per rule: (rule, violations, total, passed). A single
    aggregate over one scan regardless of rule count."""
    if not expectations:
        raise ValueError("check() needs at least one expectation")
    aggs = [
        F.sum(F.when(~cond, 1).otherwise(0)).cast("bigint").alias(name)
        for name, cond in expectations.items()
    ]
    totals = df.agg(F.count(F.lit(1)).alias("__total"), *aggs)
    names = list(expectations)
    stacked = totals.select(
        F.col("__total"),
        F.explode(
            F.array(*[
                F.struct(F.lit(n).alias("rule"), F.col(n).alias("violations"))
                for n in names
            ])
        ).alias("r"),
    )
    return stacked.select(
        F.col("r.rule").alias("rule"),
        F.col("r.violations").alias("violations"),
        F.col("__total").cast("bigint").alias("total"),
        (F.col("r.violations") == 0).alias("passed"),
    )


def unique_key_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys appearing more than once (the one constraint that needs a
    shuffle): (key columns..., n_rows). Empty result = constraint holds."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


# Persisted flagged projections awaiting release (keyed by application id
# so concurrent sessions don't evict each other) — the same bounded-cache-
# plus-finish-hook pattern as plans/gosales.py's dim cache. The GOOD split
# returned to the caller reads from this cache, so it can only be
# unpersisted after the caller's main write — pipeline wiring calls
# release_quarantine_caches() from its on_finish hook. Bounded: beyond
# _QUARANTINE_CACHE_MAX the oldest entry is force-unpersisted (its good
# split, if still unconsumed, falls back to recomputation — a slowdown,
# never a wrong answer), so a caller that forgets the release hook can't
# grow executor storage without limit.
_QUARANTINE_CACHE: list[tuple[str, DataFrame]] = []
_QUARANTINE_CACHE_MAX = 16


def release_quarantine_caches(spark=None) -> None:
    """Unpersist flagged projections retained by ``enforce_to_quarantine``
    (between-batch hygiene; with ``spark`` given, only that application's
    entries)."""
    app = spark.sparkContext.applicationId if spark is not None else None
    keep = []
    for app_id, df in _QUARANTINE_CACHE:
        if app is not None and app_id != app:
            keep.append((app_id, df))
            continue
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may be gone
            pass
    _QUARANTINE_CACHE[:] = keep


def enforce_to_quarantine(
    df: DataFrame,
    expectations: Expectations,
    quarantine_path: str,
    batch_id: str | None = None,
    persist: bool = True,
) -> DataFrame:
    """Pipeline form of ``enforce``: bad rows (with their ``failed_rules``
    provenance, plus ``batch_id`` when given) are APPENDED to the
    quarantine table at ``quarantine_path`` — the review sink pattern —
    and only the good split is returned for the main write.

    Single-scan contract (``persist=True``, default): the flagged
    projection is persisted (memory-and-disk), so the quarantine write
    materializes it ONCE and the returned good split reads the cache —
    the input source (a JDBC extraction in the gosales ingest wiring) is
    scanned exactly once across both writes. This is the reference's own
    R1 persist-before-dual-actions pattern (`...sales_fact_01.py:156`).
    The bad write is unconditional (an empty append is one no-op task;
    the old isEmpty probe was itself an extra action over the source).
    Callers release the retained cache after their main write via
    ``release_quarantine_caches()`` (pipeline runners: wire it into the
    finish hook). ``persist=False`` opts out — two source scans, zero
    executor storage — for inputs too large to cache but cheap to
    re-read."""
    if not expectations:
        raise ValueError("enforce_to_quarantine() needs at least one expectation")
    tagged = _tag(df, expectations)
    if persist:
        tagged = tagged.persist()
        while len(_QUARANTINE_CACHE) >= _QUARANTINE_CACHE_MAX:
            _, oldest = _QUARANTINE_CACHE.pop(0)
            try:
                oldest.unpersist()
            except Exception:  # noqa: BLE001 — session may be gone
                pass
        _QUARANTINE_CACHE.append(
            (df.sparkSession.sparkContext.applicationId, tagged)
        )
    bad = tagged.where(F.size("failed_rules") > 0)
    if batch_id is not None:
        bad = bad.withColumn("batch_id", F.lit(batch_id))
    bad.write.mode("append").parquet(quarantine_path)
    return tagged.where(F.size("failed_rules") == 0).drop("failed_rules")


def _tag(df: DataFrame, expectations: Expectations) -> DataFrame:
    """The shared one-scan projection: every rule evaluated once into a
    ``failed_rules`` array; both splits filter on it."""
    fails = F.array_compact(
        F.array(*[
            F.when(~cond, F.lit(name)) for name, cond in expectations.items()
        ])
    )
    return df.withColumn("failed_rules", fails)


def enforce(
    df: DataFrame, expectations: Expectations
) -> tuple[DataFrame, DataFrame]:
    """Split into (good, bad). ``bad`` rows gain ``failed_rules``
    (array<string>, the rules they broke, in declaration order); ``good``
    keeps the original schema."""
    if not expectations:
        raise ValueError("enforce() needs at least one expectation")
    tagged = _tag(df, expectations)
    good = tagged.where(F.size("failed_rules") == 0).drop("failed_rules")
    bad = tagged.where(F.size("failed_rules") > 0)
    return good, bad
