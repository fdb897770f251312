"""Star join (reference J1/J5): enrich a fact with N dimension tables via
left equi-joins on case-normalized keys.

Reference: the sales_fact build's 4-way LEFT JOIN on lower() keys
(`...sales_fact_01.py:68-71`) and the thin layer's 3-way surrogate-key join
(`tl_sm_gosales_overview_01.sql:22-25`).

Scale stance: dimensions are small relative to the fact — we broadcast
them explicitly so the 100 TB fact side never shuffles. If a dimension is
too big to broadcast, pass ``broadcast_dims=False`` and let AQE pick
sort-merge with skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.operators.normalize import norm_key


def star_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str, str]],
    how: str = "left",
    normalize: bool = True,
    broadcast_dims: bool = True,
) -> DataFrame:
    """Join ``fact`` to each ``(dim_df, fact_key, dim_key)``.

    ``normalize=True`` lower(trim())s both key sides (J1 semantics);
    surrogate-key joins (J5) pass ``normalize=False`` for plain equality.
    """
    out = fact
    for dim, fact_key, dim_key in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        if normalize:
            cond = norm_key(out[fact_key]).eqNullSafe(norm_key(dim[dim_key]))
        else:
            cond = out[fact_key] == dim[dim_key]
        out = out.join(d, on=cond, how=how)
    return out
