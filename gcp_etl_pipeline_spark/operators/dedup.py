"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:
  - Exact dedup never compares documents — it hash-groups on a 32-byte
    md5 fingerprint (one shuffle on a short key).
  - Near-dup never goes O(n²): MinHash banding (LSH) buckets candidate
    pairs so the join fans out only within buckets; SimHash uses 4-band
    pigeonhole (hamming ≤ 3 ⇒ at least one equal byte) so candidates
    co-locate by band equality. Brute-force pairing exists only inside
    the verification step over LSH candidates.
  - All hashes are md5-derived (not Spark's xxhash64/murmur) so a DuckDB
    oracle can reproduce every sketch bit-for-bit — the sketches
    themselves are differential-testable, not just the final pairs.

Reference has no dedup operators; these are the training-data-pipeline
extensions (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.operators.text import fingerprint, tokens

HEX_HIGH = tuple("89abcdef")  # md5 nibbles whose high bit is set


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact-duplicate group.
    One shuffle on the md5 fingerprint; no document ever compared."""
    fp = df.withColumn("__fp", fingerprint(text_col))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, [id_col, "__fp"], "inner").drop("__fp")


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle) rows.
    The exploded layout is the scalable one — set ops become joins/groupBys
    instead of per-pair array intersections."""
    toks = tokens(text_col)
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame, id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """All pairs (a < b) with shingle-set Jaccard ≥ threshold, computed by
    shared-shingle join + per-pair common counts (never a full cross join;
    the join key is the shingle, so only docs sharing content meet).

    Skew note: stopword-heavy shingles create hot keys; at scale, drop
    shingles with document frequency above a cap first (they cannot push
    Jaccard of large sets on their own). Kept exact here."""
    a = shingles.select(F.col(id_col).alias("a"), "shingle")
    b = shingles.select(F.col(id_col).alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    return (
        common.join(F.broadcast(sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))), "a")
        .join(F.broadcast(sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))), "b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _minhash_expr(k: int) -> Column:
    """Hash-k of a shingle: 16 hex chars of md5(k|shingle); min over a
    document's shingles = the k-th MinHash component."""
    return F.min(F.substring(F.md5(F.concat(F.lit(f"{k}|"), F.col("shingle"))), 1, 16))


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", num_hashes: int = 12
) -> DataFrame:
    """MinHash signature per document — one groupBy computing all K mins."""
    return shingles.groupBy(id_col).agg(
        *[_minhash_expr(k).alias(f"mh{k}") for k in range(num_hashes)]
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Band the signature and bucket-join: docs sharing any band hash are
    candidates. Shuffle is on (band_id, band_hash) — the only fan-out is
    within buckets of near-identical documents."""
    rows = num_hashes // bands
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = signatures.select(F.col(id_col), *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("h"))
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(F.col(id_col), F.col("bh.band_id"), F.col("bh.h"))
    a = stacked.select(F.col(id_col).alias("a"), "band_id", "h")
    b = stacked.select(F.col(id_col).alias("b"), "band_id", "h")
    return (
        a.join(b, ["band_id", "h"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    candidates → exact-Jaccard verify ≥ threshold."""
    sh = shingle_sets(df, text_col, id_col, n)
    sh.persist()
    sig = minhash_signatures(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(sig, id_col, num_hashes, bands)
    # verify candidates only: join candidate pairs back to shingle sets
    a_sh = sh.select(F.col(id_col).alias("a"), "shingle")
    b_sh = sh.select(F.col(id_col).alias("b"), "shingle")
    common = (
        cand.join(a_sh, "a")
        .join(b_sh, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    return (
        common.join(sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb")), "b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash32(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash over distinct tokens. Bit i of a token's hash is the
    high bit of md5 hex digit i; document bit i is the sign of the ±1 vote
    sum. Pure SQL (explode token × 32 bit positions → sum) so a DuckDB
    oracle reproduces it exactly; the Pandas-UDF variant is the faster
    production path but isn't differential-testable."""
    tok = df.select(F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
    votes = (
        tok.withColumn("h", F.md5("tok"))
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.lit(31))).alias("i"),
            F.col("h"),
        )
        .withColumn(
            "vote",
            F.when(
                F.expr("substring(h, i + 1, 1)").isin(*HEX_HIGH), F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        .groupBy(id_col, "i")
        .agg(F.sum("vote").alias("s"))
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("s") >= 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ 3, found via 4-band
    pigeonhole (≤3 differing bits ⇒ at least one of 4 bytes equal), so the
    join is band-equality, never all-pairs."""
    assert max_hamming <= 3, "4-band pigeonhole only covers hamming <= 3"
    sh = simhash32(df, text_col, id_col)
    bands = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band_id"),
    ).withColumn(
        "band_val",
        F.expr("shiftrightunsigned(simhash, CAST(band_id * 8 AS INT))").bitwiseAND(
            F.lit(255)
        ),
    )
    a = bands.select(F.col(id_col).alias("a"), F.col("simhash").alias("ha"), "band_id", "band_val")
    b = bands.select(F.col(id_col).alias("b"), F.col("simhash").alias("hb"), "band_id", "band_val")
    return (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", F.col("hamming").cast("int").alias("hamming"))
    )
