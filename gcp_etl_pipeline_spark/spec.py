"""TableSpec — the declarative ingestion/maintenance contract.

Replaces the reference's MySQL `table_definations` dict-blob + ingestion
metadata row (reference: `commons/utilities.py:160-197` parses
``Column_names`` / ``merge_column`` / ``masking_column`` / ``data_types``;
a fuller example with ``partition_on``/``partition_column`` at
`commons/dictionary_check.py:4-16`; watermark fields selected at
`commons/utilities.py:162`).

One dataclass drives: schema-on-read casts (type ladder §1.3), source-side
projection SQL, watermark predicates for incremental extraction, merge keys
for insert-new-only/upsert maintenance, masked-column encryption, and the
physical partitioning of the written table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# Type ladder: SQL type-name family -> Spark type. Mirrors the reference's
# PyArrow ladder (`jobs/raw/dl_rw_job.py:44-57`) and python ladder
# (`commons/utilities.py:201-225`). Note the deliberate reference quirks we
# preserve: decimal/numeric -> double (lossy), date/time kinds -> string at
# ingestion (re-parsed downstream with to_date), bit -> int.
_TYPE_LADDER: list[tuple[tuple[str, ...], T.DataType]] = [
    (("tinyint", "smallint", "mediumint", "int", "integer", "year"), T.IntegerType()),
    (("bigint", "long"), T.LongType()),
    (("float", "real"), T.FloatType()),
    (("double", "decimal", "numeric"), T.DoubleType()),
    (("date", "datetime", "timestamp", "time"), T.StringType()),
    (("binary", "varbinary", "blob"), T.BinaryType()),
    (("bit",), T.IntegerType()),
    (("bool", "boolean"), T.BooleanType()),
    (("json", "jsonb"), T.StringType()),  # parse with from_json at use site
]

_DATE_KINDS = ("date", "datetime", "timestamp", "time")


def sql_type_to_spark(sql_type: str) -> T.DataType:
    """Map a SQL type name (e.g. ``varchar(255)``, ``decimal(10,2)``) to a
    Spark type via the reference's ladder; unknown -> string
    (`jobs/raw/dl_rw_job.py:54`)."""
    base = sql_type.strip().lower().split("(")[0].strip()
    for names, spark_type in _TYPE_LADDER:
        if base in names:
            return spark_type
    return T.StringType()


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    sql_type: str  # source-dialect type name, fed through the ladder

    @property
    def spark_type(self) -> T.DataType:
        return sql_type_to_spark(self.sql_type)

    @property
    def is_datelike(self) -> bool:
        base = self.sql_type.strip().lower().split("(")[0].strip()
        return base in _DATE_KINDS


@dataclass(frozen=True)
class TableSpec:
    """Full per-table contract (reference §1.1.3)."""

    name: str  # layer-qualified logical name, e.g. "raw.gosales_daily_sales"
    columns: tuple[ColumnSpec, ...]
    merge_columns: tuple[str, ...] = ()  # natural/merge key (insert-new-only / upsert)
    masking_columns: tuple[str, ...] = ()  # encrypted at ingestion (U2)
    watermark_column: str | None = None  # high-water-mark incremental extraction (I1)
    partition_columns: tuple[str, ...] = ()  # physical layout of the written table
    source_table: str | None = None  # upstream db.table for JDBC extraction

    @property
    def column_names(self) -> tuple[str, ...]:
        return tuple(c.name for c in self.columns)

    def struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type, True) for c in self.columns]
        )

    def extraction_query(self, last_watermark: str | None = None) -> str:
        """Source-side SELECT with projection, date->CHAR casts and the
        watermark predicate pushed into the source database.

        Reference: query generation at `jobs/raw/dl_rw_job.py:59-66`
        (CAST(x AS CHAR) for date/timestamp columns) + the unused-but-declared
        watermark contract (`commons/utilities.py:162`) which we make real.
        Pushing the predicate source-side means a 100 TB table never leaves
        the database unfiltered.
        """
        parts = [
            f"CAST({c.name} AS CHAR) AS {c.name}" if c.is_datelike else c.name
            for c in self.columns
        ]
        table = self.source_table or self.name
        q = f"SELECT {', '.join(parts)} FROM {table}"
        if self.watermark_column and last_watermark is not None:
            q += f" WHERE {self.watermark_column} > '{last_watermark}'"
        return q
