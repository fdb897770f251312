"""Connector registry: scheme/format → reader/writer, resolved at call
time — the seam that lets production storage (GCS paths, BigQuery tables,
Spanner) drop in without code changes to any pipeline.

Reference counterparts: the raw jobs hardcode their I/O — Spanner reads
via a JDBC-ish client (`jobs/raw/source-to-gcs.py:92-99`), BigQuery SQL
execution (`jobs/semantic/dl_sm_job.py:46-53`), GCS parquet paths wired
as literals. Here every read/write goes through one registry:

    read(spark, "/data/part.parquet")            → parquet (extension)
    read(spark, "gs://bucket/x.parquet")         → `gs` scheme handler
    read(spark, "orders", format="bigquery")     → `bigquery` connector
    register_connector(Connector("bigquery", reader=..., writer=...))

Resolution order: explicit ``format=`` name → URI scheme → file
extension → parquet default. The GCP connectors themselves need jars
this sandbox doesn't have (spark-bigquery-connector, gcs-connector
Hadoop FS, Spanner JDBC), so the registry ships placeholder entries that
raise a clear actionable error; deployments (or tests) overwrite them
with `register_connector`, which is the entire wiring step. The registry
carries no data-plane logic — each reader returns a plain lazy DataFrame,
so pushdown/pruning behavior is whatever the underlying format provides
(asserted for parquet/orc/jdbc in tests).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

ReaderFn = Callable[..., DataFrame]  # (spark, path, **options) -> DataFrame
WriterFn = Callable[..., None]  # (df, path, **options) -> None


@dataclass(frozen=True)
class Connector:
    """A named I/O backend. ``schemes`` are URI schemes it claims (e.g.
    ``gs``); the ``name`` doubles as the explicit ``format=`` key."""

    name: str
    reader: ReaderFn
    writer: WriterFn | None = None
    schemes: tuple[str, ...] = ()
    extensions: tuple[str, ...] = field(default=())


_BY_NAME: dict[str, Connector] = {}
_BY_SCHEME: dict[str, str] = {}
_BY_EXT: dict[str, str] = {}


def register_connector(conn: Connector) -> None:
    """Add or REPLACE a connector (last registration wins — deployments
    override the placeholder GCP entries with real wirings)."""
    _BY_NAME[conn.name] = conn
    for s in conn.schemes:
        _BY_SCHEME[s] = conn.name
    for e in conn.extensions:
        _BY_EXT[e.lstrip(".")] = conn.name


def connector_for(path: str, format: str | None = None) -> Connector:
    """Resolve: explicit format name → URI scheme → extension → parquet."""
    if format is not None:
        try:
            return _BY_NAME[format]
        except KeyError:
            raise KeyError(
                f"no connector named {format!r}; registered: {sorted(_BY_NAME)}"
            ) from None
    scheme = urlparse(path).scheme
    if scheme and scheme in _BY_SCHEME:
        return _BY_NAME[_BY_SCHEME[scheme]]
    ext = path.rsplit(".", 1)[-1].lower() if "." in path.rsplit("/", 1)[-1] else ""
    if ext in _BY_EXT:
        return _BY_NAME[_BY_EXT[ext]]
    return _BY_NAME["parquet"]


def read(
    spark: SparkSession, path: str, format: str | None = None, **options
) -> DataFrame:
    return connector_for(path, format).reader(spark, path, **options)


def write(df: DataFrame, path: str, format: str | None = None, **options) -> None:
    conn = connector_for(path, format)
    if conn.writer is None:
        raise NotImplementedError(f"connector {conn.name!r} is read-only")
    conn.writer(df, path, **options)


def _unavailable(name: str, needs: str) -> Connector:
    def _raise(*_a, **_k):
        raise RuntimeError(
            f"{name} connector not wired in this environment: {needs}. "
            f"Call register_connector(Connector({name!r}, reader=..., "
            f"writer=...)) with the real implementation to enable it — "
            f"docs/DEPLOY_GCP.md has the exact jar coordinates, session "
            f"confs, and a worked wiring snippet per connector."
        )

    return Connector(name=name, reader=_raise, writer=_raise)


def _register_builtins() -> None:
    from gcp_etl_pipeline_spark.sinks import writers
    from gcp_etl_pipeline_spark.sources import files

    register_connector(
        Connector(
            "parquet",
            reader=files.read_parquet,
            writer=writers.write_parquet,
            extensions=("parquet",),
        )
    )
    register_connector(
        Connector(
            "csv",
            reader=files.read_csv,
            writer=writers.write_csv,
            extensions=("csv",),
        )
    )
    register_connector(
        Connector(
            "orc",
            reader=files.read_orc,
            writer=writers.write_orc,
            extensions=("orc",),
        )
    )
    register_connector(
        Connector(
            "jsonl",
            reader=files.read_json_lines,
            writer=writers.write_json_lines,
            extensions=("jsonl", "ndjson"),
        )
    )

    def _jdbc_reader(spark: SparkSession, url: str, **options) -> DataFrame:
        from gcp_etl_pipeline_spark.sources.jdbc import read_jdbc

        return read_jdbc(spark, url, **options)

    register_connector(
        Connector("jdbc", reader=_jdbc_reader, schemes=("jdbc",))
    )

    def _versioned_reader(spark: SparkSession, path: str, version=None, **_):
        from gcp_etl_pipeline_spark.sinks.versioned import VersionedTable

        return VersionedTable(path).read(spark, version)

    def _versioned_writer(df: DataFrame, path: str, keys=None, **opts):
        from gcp_etl_pipeline_spark.sinks.versioned import VersionedTable

        t = VersionedTable(path)
        if keys:
            t.upsert(df, list(keys), note=opts.get("note", ""))
        else:
            t.write(df, note=opts.get("note", ""))

    # snapshot-versioned tables resolve like any other format:
    #   read(spark, path, format="versioned", version=3)
    #   write(df, path, format="versioned", keys=["id"])
    register_connector(
        Connector(
            "versioned", reader=_versioned_reader, writer=_versioned_writer
        )
    )

    # Production GCP surfaces — placeholders until a deployment registers
    # the real wiring (each is one register_connector call):
    #   gs://     gcs-connector Hadoop FS jar; reader is then just the
    #             parquet/csv reader on the gs path
    #   bigquery  spark-bigquery-connector (format "bigquery")
    #   spanner   Spanner JDBC driver through sources/jdbc.py
    gs = _unavailable("gs", "add the gcs-connector Hadoop FS jar")
    register_connector(
        Connector("gs", reader=gs.reader, writer=gs.writer, schemes=("gs",))
    )
    register_connector(
        _unavailable("bigquery", "add the spark-bigquery-connector package")
    )
    register_connector(
        _unavailable("spanner", "add the Spanner JDBC driver jar")
    )


_register_builtins()
