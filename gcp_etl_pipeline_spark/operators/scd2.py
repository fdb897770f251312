"""Slowly-changing-dimension type-2 builder.

The reference maintains dimensions as insert-new-only snapshots
(`jobs/curated/dimensions/retailer_dim/dl_ct_gosales_retailer_dim_01.py:52-63`)
and declares a ``merge_column`` upsert intent it never implements
(`commons/utilities.py:193`). This operator is the engine's full-history
upgrade of that capability: given a change stream (one row per key per
effective timestamp), produce the versioned dimension with
``valid_from`` / ``valid_to`` / ``is_current``, collapsing consecutive
rows whose tracked attributes did not change.

Scale shape: two windows over the SAME (key) partitioning — Catalyst
plans one ``Exchange hashpartitioning(key)`` and sorts once per window
within the partition. No global window, no driver collect; skewed keys
are bounded by per-key history length, not table size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Versioned dimension from a change stream.

    Parameters
    ----------
    changes: one row per observed state; duplicates in ``attrs`` across
        consecutive timestamps are collapsed (SCD2 change compression).
    keys: natural-key columns (the dimension identity).
    attrs: tracked attribute columns — a version closes when any changes.
    ts_col: effective timestamp/date of the observation.
    tiebreak: extra ORDER BY columns making same-``ts_col`` observations
        deterministic (pass a unique id; required for reproducible runs).

    Returns the input columns ``keys + attrs`` plus ``valid_from``,
    ``valid_to`` (null = open) and ``is_current`` (int 0/1).
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)

    # change detection: null-safe inequality vs the previous observation
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    is_first = F.row_number().over(w) == 1

    compressed = changes.withColumn(
        "__scd2_keep", is_first | changed
    ).where("__scd2_keep")

    # valid_to = next version's valid_from (within the compressed set);
    # same partitioning key -> Catalyst reuses the exchange, sorting only.
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        compressed.withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(
            *keys,
            *attrs,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.when(F.col("valid_to").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_current"),
        )
    )


# Above this many key×version rows the dimension stops being broadcast-
# sized: collecting it to the driver and shipping a copy per executor is
# the OOM risk, not the win. 2M slim rows ≈ low hundreds of MB serialized
# — the upper edge of a comfortable broadcast.
BROADCAST_DIM_MAX_ROWS = 2_000_000


def scd2_lookup(
    probes: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    how: str = "left",
    broadcast: bool | str = "auto",
    broadcast_max_rows: int = BROADCAST_DIM_MAX_ROWS,
) -> DataFrame:
    """Point-in-time dimension lookup: join each probe row to the SCD2
    version valid at its timestamp — ``valid_from <= ts < valid_to``
    (half-open; an open version has ``valid_to IS NULL``). At most one
    version matches per probe by construction of ``scd2_build`` (empty
    same-day intervals are excluded by the strict upper bound); probes
    before a key's first version keep NULL attributes under the default
    left join.

    Scale shape, chosen by ``broadcast``:

      - ``True`` — hint a broadcast-hash join: the probe (fact) side
        never shuffles; the range predicate rides as the join residual.
        Right for dimension-sized version tables, an executor-OOM risk
        for billion-row ones — hence not unconditional.
      - ``False`` — no hint: Catalyst plans a key-partitioned sort-merge
        join carrying the same range residual; both sides shuffle on the
        natural key, nothing is collected. The 100-TB-safe default shape.
      - ``"auto"`` (default) — a bounded row probe decides:
        ``dim.limit(broadcast_max_rows + 1).count()`` (early-stopping —
        never a full scan of a big dimension) picks the broadcast shape
        iff the version table is under the ceiling. Costs one cheap
        pre-action, the same trade ``knn_bruteforce``'s query-set guard
        makes; pass an explicit bool to skip the probe.
    """
    if broadcast == "auto":
        broadcast = (
            dim.limit(broadcast_max_rows + 1).count() <= broadcast_max_rows
        )
    d = dim.alias("__scd2_dim")
    p = probes.alias("__scd2_probe")
    cond = [p[k] == d[k] for k in keys]
    cond.append(d["valid_from"] <= p[ts_col])
    cond.append(d["valid_to"].isNull() | (p[ts_col] < d["valid_to"]))
    out = p.join(F.broadcast(d) if broadcast else d, cond, how)
    for k in keys:
        out = out.drop(d[k])
    return out
