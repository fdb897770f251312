"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_queries_and_oracles_align(spark):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(queries) >= 40
    # every oracle key must have a query; (queries without oracle get the
    # weaker rows-only check, allowed but should stay rare)
    assert set(oracles) <= set(queries)
    missing = set(queries) - set(oracles)
    assert len(missing) <= 3, f"too many oracle-less queries: {missing}"


def test_sources_read_events_timestamps(spark, sf_dir):
    # the fixture's physical unit varies (ns in early drops, µs NTZ now);
    # read_parquet must yield a usable timestamp type either way
    from gcp_etl_pipeline_spark.sources.files import read_parquet

    df = read_parquet(spark, f"{sf_dir}/events.parquet")
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert df.count() > 0
