"""Custom Python data sources (Spark 4 `pyspark.sql.datasource` API).

Two sources showcase the engine's integration with the modern Python
DataSource surface — the sanctioned way to plug a non-JVM system into
Spark's scan planning (partitioned reads, schema contract, streaming
offsets) without writing a Java connector:

- ``graftmedia`` (batch): generates the synthetic multimodal corpus
  DISTRIBUTEDLY — one ``InputPartition`` per shard, rows produced inside
  executors, byte-identical to `operators.multimodal.make_fake_media`
  (which builds the same rows driver-side and is therefore bounded by
  driver memory; this source is the at-scale generator).
- ``graftevents`` (streaming): a deterministic offset-tracked event
  stream (rate-source shape, reproducible payloads) for exercising
  watermarks/windows without staging files. Offsets are plain row
  counters, so replays after a checkpoint restart yield identical rows —
  the exactly-once contract a file/Kafka source provides.

Register once per session:
    spark.dataSource.register(GraftMediaDataSource)
    spark.read.format("graftmedia").option("n", 4096).load()
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, content BINARY, "
    "width INT, height INT, sample_rate INT, n_frames INT"
)

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE"
)


def _media_row(i: int):
    # import inside the row path: this code runs on executors
    from gcp_etl_pipeline_spark.operators import multimodal as mm

    kind = mm.KINDS[i % 3]
    w, h = 16 + (i % 8) * 16, 16 + (i % 5) * 16
    sr = 8000 + (i % 4) * 8000
    frames = 1 if kind == "image" else 4 + i % 13
    return (i, kind, mm.encode_fake(kind, w, h, sr, frames, seed=i), w, h, sr, frames)


class _MediaReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 256))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):
        p = partition.value
        for i in range(p, self.n, self.parts):
            yield _media_row(i)


class GraftMediaDataSource(DataSource):
    """spark.read.format("graftmedia").option("n", N).option("parts", P)"""

    @classmethod
    def name(cls):
        return "graftmedia"

    def schema(self):
        return MEDIA_SCHEMA

    def reader(self, schema):
        return _MediaReader(self.options)


_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
_BASE_TS = 1704067200  # 2024-01-01T00:00:00Z — fixed, deterministic


def _event_row(i: int):
    import datetime

    # md5-free cheap determinism: multiplicative hashing
    h = (i * 2654435761) & 0xFFFFFFFF
    ts = datetime.datetime.fromtimestamp(
        _BASE_TS + i * 7 + h % 5, tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    return (
        i,
        ts,
        h % 150,
        _EVENT_TYPES[h % len(_EVENT_TYPES)],
        round((h % 10_000) / 100.0, 2),
    )


class _EventsStreamReader(DataSourceStreamReader):
    """Offset = total rows emitted so far. Reading [start, end) is a pure
    function of the offsets, so checkpoint replays regenerate identical
    rows.

    ``rows_per_batch`` bounds how many rows one latestOffset() poll
    advances in ``incremental`` mode (processing-time triggers see the
    stream grow batch by batch); the availableNow default jumps straight
    to ``max_rows`` — that trigger snapshots the latest offset ONCE at
    query start, so an incremental answer would silently truncate the
    drain. In both modes ``rows_per_batch`` also caps the rows per input
    partition (bounded task memory)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        self.max_rows = int(options.get("max_rows", 10_000))
        self.parts = int(options.get("parts", 4))
        self.incremental = str(options.get("incremental", "false")).lower() == "true"
        self._polled = 0

    def initialOffset(self):
        return {"n": 0}

    def deserializeOffset(self, json_str):
        # checkpoint-recovery clamp, part 1: EVERY offset the engine hands
        # back (the committed start on restart, replay bounds) passes
        # through here — advancing _polled to it guarantees the very first
        # post-restart latestOffset() can never regress below the
        # committed position, even when no batch is replayed first.
        import json as _json

        offset = _json.loads(json_str)
        self._polled = max(self._polled, int(offset.get("n", 0)))
        return offset

    def latestOffset(self):
        if self.incremental:
            self._polled = min(self._polled + self.rows_per_batch, self.max_rows)
            return {"n": self._polled}
        return {"n": self.max_rows}

    def partitions(self, start, end):
        # checkpoint-recovery clamp, part 2 (belt for paths that build
        # offsets without deserializeOffset): never let the counter sit
        # below a batch bound we have been asked to plan.
        self._polled = max(self._polled, end["n"])
        lo, hi = start["n"], end["n"]
        step = max(1, (hi - lo + self.parts - 1) // self.parts)
        step = min(step, self.rows_per_batch)
        return [
            InputPartition((p_lo, min(p_lo + step, hi)))
            for p_lo in range(lo, hi, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield _event_row(i)

    def commit(self, end):
        pass


class GraftEventsDataSource(DataSource):
    """spark.readStream.format("graftevents").option("max_rows", N)"""

    @classmethod
    def name(cls):
        return "graftevents"

    def schema(self):
        return EVENTS_SCHEMA

    def streamReader(self, schema):
        return _EventsStreamReader(self.options)


# ------------------------------------------------------------ sink side
#
# The writer half of the API: executors write task-local shard files and
# return commit messages; the DRIVER publishes a manifest listing exactly
# the committed shards (task retries/speculative duplicates never appear —
# their files exist but are unreferenced, the same two-phase publish
# protocol sinks/versioned.py uses for snapshots).


@dataclass
class _ShardCommit(WriterCommitMessage):
    shard: str
    rows: int


def _json_default(v):
    """JSON-encode the Spark row types json.dumps chokes on: timestamps/
    dates → ISO strings, binary → base64, Decimal → str (lossless)."""
    import base64
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, decimal.Decimal):
        return str(v)
    raise TypeError(f"not JSON-serializable: {type(v)}")


class _JsonShardWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        self.overwrite = overwrite
        if not self.path:
            raise ValueError("graftsink requires .option('path', ...)")

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        shard = f"shard-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, shard), "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict(), default=_json_default) + "\n")
                n += 1
        return _ShardCommit(shard=shard, rows=n)

    def commit(self, messages):
        import json as _json
        import os

        prev = {"shards": [], "rows": 0}
        try:
            with open(os.path.join(self.path, "_manifest.json")) as fh:
                prev = _json.load(fh)
        except (OSError, ValueError):
            pass
        new = [m for m in messages if m is not None]
        if self.overwrite:
            # overwrite: the new manifest references ONLY this write; the
            # superseded shard files are removed after the pointer flip
            manifest = {
                "shards": sorted(m.shard for m in new),
                "rows": sum(m.rows for m in new),
            }
        else:
            # append: merge so earlier writes' shards stay referenced
            manifest = {
                "shards": sorted(set(prev["shards"]) | {m.shard for m in new}),
                "rows": prev["rows"] + sum(m.rows for m in new),
            }
        tmp = os.path.join(self.path, "_manifest.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.path, "_manifest.json"))
        if self.overwrite:
            for s in set(prev["shards"]) - set(manifest["shards"]):
                try:
                    os.remove(os.path.join(self.path, s))
                except OSError:
                    pass

    def abort(self, messages):
        import os

        # failed tasks contribute None commit messages — skip them, clean
        # only the shards that successful tasks actually wrote
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.shard))
            except OSError:
                pass


class GraftSinkDataSource(DataSource):
    """df.write.format("graftsink").option("path", dir).save() — manifest-
    committed JSONL shards."""

    @classmethod
    def name(cls):
        return "graftsink"

    def writer(self, schema, overwrite):
        return _JsonShardWriter(self.options, overwrite)


def read_manifested_jsonl(spark, path):
    """Read back ONLY the shards the manifest committed (stray files from
    failed/speculative tasks are ignored)."""
    import json as _json

    with open(f"{path}/_manifest.json") as fh:
        manifest = _json.load(fh)
    return spark.read.json([f"{path}/{s}" for s in manifest["shards"]])


def register_sources(spark) -> None:
    spark.dataSource.register(GraftMediaDataSource)
    spark.dataSource.register(GraftEventsDataSource)
    spark.dataSource.register(GraftSinkDataSource)
