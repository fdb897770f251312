"""Keyed upsert — the reference's declared-but-unused ``merge_column``
intent (I3: `commons/utilities.py:193` parses a merge key per table; no
job ever merges).

On Delta (the reference provisions it on its clusters,
`commons/install-delta.sh:19-20`) this is ``MERGE INTO ... WHEN MATCHED
UPDATE WHEN NOT MATCHED INSERT``. This container has no delta-spark, so
the operator ships a parquet fallback with the same semantics:

    new_target = (target anti-join source on keys)  UNION  source

i.e. source rows replace matched target rows and append unmatched ones.
The write is staged-then-swapped because a path cannot be overwritten
while it is being read. On Delta the swap becomes a transactional MERGE
— ``upsert`` auto-detects availability and upgrades.

Scale: the anti-join shuffles on the merge key (or broadcasts the source
when small); nothing is collected. The staged double-write is the
parquet tax Delta removes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available(spark: SparkSession) -> bool:
    # the py4j JVM view returns a benign JavaPackage for any missing class,
    # so probe the Python binding instead
    try:
        import delta.tables  # noqa: F401

        return True
    except ImportError:
        return False


def upsert(
    source: DataFrame,
    target_path: str,
    keys: list[str],
) -> int:
    """Merge ``source`` into the parquet/Delta table at ``target_path`` on
    ``keys``. Returns the source row count (rows written)."""
    spark = source.sparkSession
    if delta_available(spark):  # pragma: no cover — not in this container
        from delta.tables import DeltaTable

        tgt = DeltaTable.forPath(spark, target_path)
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        (
            tgt.alias("t")
            .merge(source.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return source.count()

    try:
        target = spark.read.parquet(target_path)
    except Exception:  # noqa: BLE001 — first write
        n = source.count()
        source.write.mode("overwrite").parquet(target_path)
        return n

    src_keys = source.select(*keys).distinct()
    cond = [target[k].eqNullSafe(src_keys[k]) for k in keys]  # null keys match
    kept = target.join(src_keys, on=cond, how="left_anti")
    merged = kept.unionByName(source.select(*target.columns))
    staging = target_path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(target_path)
    return source.count()
