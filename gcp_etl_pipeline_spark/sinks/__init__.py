"""Sinks (SURVEY §2.2 K1-K7): parquet/csv writers and the run ledger."""
