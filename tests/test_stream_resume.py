"""Kill-and-resume e2e for the streaming ledger wrappers: a micro-batch
that CRASHES after its ledger + output writes but BEFORE the checkpoint
commit must, on restart from the same checkpoint, replay to exactly the
state of an uninterrupted run — the attempt-scoped (batch_id-partition)
overwrite discipline is what makes the at-least-once replay
exactly-once, and this test exercises the actual crash window instead
of unit-testing the overwrite in isolation.

Reference parity note: the reference's Beam/Dataflow pipelines lean on
the runner's exactly-once bundles; this engine rebuilds the property on
Structured Streaming's at-least-once foreachBatch, so the crash-replay
path is the load-bearing claim."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F


def _stage_batches(spark, root: str, frames) -> str:
    """Write each frame as one parquet file with pinned ascending mtimes
    so FileStreamSource processes them in order, one per micro-batch."""
    src = f"{root}/in"
    os.makedirs(src, exist_ok=True)
    for i, df in enumerate(frames):
        tmp = f"{root}/tmp{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = sorted(glob.glob(f"{tmp}/part-*.parquet"))[0]
        dst = f"{src}/b{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    return src


def _run_stream(spark, src, schema, ckpt, process):
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _docs(spark):
    # dups both within and ACROSS batches; batch 1 carries the crash
    rows0 = [(1, "alpha beta gamma delta"), (2, "unique zero text here")]
    rows1 = [
        (10, "alpha beta gamma delta"),   # cross-batch dup of 1 -> dropped
        (11, "fresh middle document one"),
        (12, "fresh middle document one"),  # in-batch dup -> dropped
    ]
    rows2 = [
        (20, "fresh middle document one"),  # dup of survivor 11 -> dropped
        (21, "tail batch unique text"),
    ]
    schema = "doc_id BIGINT, text STRING"
    return [spark.createDataFrame(r, schema) for r in (rows0, rows1, rows2)]


def _neardup_process(store: str, out_dir: str, crash_once: dict | None):
    """The production wrapper's batch body (streaming/queries.py
    `stream_neardup_ledger`), plus an optional one-shot crash AFTER the
    ledger and output writes — i.e. inside the window where the work is
    durable but the checkpoint offset is not yet committed."""

    def process(batch, batch_id: int) -> None:
        from gcp_etl_pipeline_spark.operators.dedup import neardup_incremental

        acc = neardup_incremental(
            batch, store, num_hashes=8, bands=4, attempt_id=f"b{batch_id}"
        )
        acc.select("doc_id").write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )
        if crash_once is not None and batch_id == 1 and not crash_once["hit"]:
            crash_once["hit"] = True
            raise RuntimeError("injected crash after writes, before commit")

    return process


def _exact_process(store: str, out_dir: str, crash_once: dict | None):
    """dedup_incremental twin (attempt-scoped exact ledger)."""

    def process(batch, batch_id: int) -> None:
        from gcp_etl_pipeline_spark.operators.dedup import dedup_incremental

        acc = dedup_incremental(batch, store, attempt_id=f"b{batch_id}")
        acc.select("doc_id").write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )
        if crash_once is not None and batch_id == 1 and not crash_once["hit"]:
            crash_once["hit"] = True
            raise RuntimeError("injected crash after writes, before commit")

    return process


def _final_state(spark, store: str, out_dir: str):
    accepted = {
        (r.batch, r.doc_id)
        for r in spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .select(F.col("batch").cast("int").alias("batch"), "doc_id")
        .collect()
    }
    ledger_rows = (
        spark.read.option("recursiveFileLookup", "true").parquet(store)
    )
    # ledger content as a multiset-insensitive set of row tuples
    ledger = {tuple(r) for r in ledger_rows.collect()}
    return accepted, ledger


@pytest.mark.parametrize("mk_process", [_exact_process, _neardup_process],
                         ids=["exact", "neardup"])
def test_ledger_stream_kill_and_resume_equals_uninterrupted(
    spark, tmp_path, mk_process
):
    frames = _docs(spark)
    schema = frames[0].schema

    # uninterrupted twin
    root_a = str(tmp_path / "clean")
    src_a = _stage_batches(spark, root_a, frames)
    _run_stream(
        spark, src_a, schema, f"{root_a}/ckpt",
        mk_process(f"{root_a}/store", f"{root_a}/out", None),
    )

    # crashing run: batch 1 dies after its writes; the stream fails
    root_b = str(tmp_path / "crash")
    src_b = _stage_batches(spark, root_b, frames)
    crash = {"hit": False}
    proc = mk_process(f"{root_b}/store", f"{root_b}/out", crash)
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, src_b, schema, f"{root_b}/ckpt", proc)
    assert crash["hit"]
    # the crash window is real: batch 1's ledger attempt partition and
    # its output are already durable, but the checkpoint commit is not —
    # this is precisely the double-append window for a non-attempt-scoped
    # ledger
    assert glob.glob(f"{root_b}/store/attempt=b1/*.parquet")
    assert glob.glob(f"{root_b}/out/batch=1/*.parquet")

    # restart from the same checkpoint: batch 1 replays (same batch_id),
    # its attempt partitions are overwritten, batch 2 then runs
    _run_stream(spark, src_b, schema, f"{root_b}/ckpt", proc)

    clean = _final_state(spark, f"{root_a}/store", f"{root_a}/out")
    resumed = _final_state(spark, f"{root_b}/store", f"{root_b}/out")
    assert resumed == clean
    # sanity on the semantics themselves: cross-batch dups dropped
    accepted_ids = {d for _, d in clean[0]}
    assert accepted_ids == {1, 2, 11, 21}


def _excise_process(store: str, out_dir: str, crash_once: dict | None):
    """substring_excise_incremental twin (attempt-scoped chunk-fp
    ledger): the batch body writes the excised per-doc output, crashing
    once inside the durable-but-uncommitted window."""

    def process(batch, batch_id: int) -> None:
        from gcp_etl_pipeline_spark.operators.dedup import (
            substring_excise_incremental,
        )

        out = substring_excise_incremental(
            batch, store, attempt_id=f"b{batch_id}"
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        if crash_once is not None and batch_id == 1 and not crash_once["hit"]:
            crash_once["hit"] = True
            raise RuntimeError("injected crash after writes, before commit")

    return process


def test_excise_ledger_kill_and_resume_equals_uninterrupted(spark, tmp_path):
    """The substring-excision ledger under the same crash window: a
    replayed batch must overwrite its attempt partition (not double-
    append chunk fps) and converge to the uninterrupted twin's cleaned
    corpus and ledger."""
    frames = _docs(spark)
    schema = frames[0].schema

    def _state(root):
        out = spark.read.option("basePath", f"{root}/out").parquet(
            f"{root}/out"
        )
        cleaned = {
            (r.batch, r.doc_id, r.excised_chunks, r.clean_text)
            for r in out.select(
                F.col("batch").cast("int").alias("batch"),
                "doc_id", "excised_chunks", "clean_text",
            ).collect()
        }
        led = spark.read.option("recursiveFileLookup", "true").parquet(
            f"{root}/store"
        )
        return cleaned, {tuple(r) for r in led.collect()}

    root_a = str(tmp_path / "clean")
    src_a = _stage_batches(spark, root_a, frames)
    _run_stream(
        spark, src_a, schema, f"{root_a}/ckpt",
        _excise_process(f"{root_a}/store", f"{root_a}/out", None),
    )

    root_b = str(tmp_path / "crash")
    src_b = _stage_batches(spark, root_b, frames)
    crash = {"hit": False}
    proc = _excise_process(f"{root_b}/store", f"{root_b}/out", crash)
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, src_b, schema, f"{root_b}/ckpt", proc)
    assert crash["hit"]
    _run_stream(spark, src_b, schema, f"{root_b}/ckpt", proc)

    assert _state(root_b) == _state(root_a)
    # semantics: doc 10 (exact dup of batch-0 doc 1) is fully excised
    # on replayed state too — every chunk fp already in the ledger
    cleaned = dict(
        ((b, d), (e, t)) for b, d, e, t in _state(root_b)[0]
    )
    full_doc10 = cleaned[(1, 10)]
    assert full_doc10[1] == ""  # all chunks ledgered by doc 1
