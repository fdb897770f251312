"""Driver-facing queries for the dedup / similarity / text operators.

Filled in alongside gcp_etl_pipeline_spark/operators/{dedup,similarity,
text}.py — each operator gets a queries() entry with a DuckDB oracle where
SQL can express it (MinHash/SimHash use md5-derived hashes so even the
sketches are oracle-checkable).
"""

from __future__ import annotations
