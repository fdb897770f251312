"""Masked-column encryption (reference U2).

The reference encrypts each column listed in the contract's
``masking_column`` with a per-cell Cloud KMS RPC and base64-encodes the
ciphertext (`jobs/raw/dl_rw_job.py:70-83`, KMS path
`commons/utilities.py:50`). An RPC per cell is unusable at 100 TB
(SURVEY §7 hard part 7); the engine's redesign keeps KMS for key
*wrapping* only and encrypts data with Spark's built-in ``aes_encrypt``
— JVM-side, vectorized, zero Python round-trips. The ciphertext format
deliberately differs from the reference (documented deviation).

Modes: 'GCM' (default — random IV, semantically secure, NOT
deterministic across calls) and 'ECB' (deterministic — required if the
masked column must remain joinable/groupable; classic tradeoff,
caller's choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mask_columns(
    df: DataFrame,
    columns: list[str],
    key: str,
    mode: str = "GCM",
) -> DataFrame:
    """base64(aes_encrypt(col, key)) for each masked column; the column is
    replaced in place (reference behavior: the raw layer only ever sees
    ciphertext). ``key`` must be 16/24/32 bytes (the data-encryption key,
    unwrapped from the secret store by the caller)."""
    out = df
    for c in columns:
        out = out.withColumn(
            c,
            F.base64(
                F.aes_encrypt(
                    F.col(c).cast("string").cast("binary"),
                    F.lit(key).cast("binary"),
                    F.lit(mode),
                )
            ),
        )
    return out


def unmask_columns(
    df: DataFrame,
    columns: list[str],
    key: str,
    mode: str = "GCM",
) -> DataFrame:
    """Inverse of mask_columns: aes_decrypt(unbase64(col)) -> string."""
    out = df
    for c in columns:
        out = out.withColumn(
            c,
            F.aes_decrypt(
                F.unbase64(F.col(c)),
                F.lit(key).cast("binary"),
                F.lit(mode),
            ).cast("string"),
        )
    return out
