"""The GoSales vertical as a CONTINUOUS deployment: raw ``go_daily_sales``
files land in a directory; each Structured Streaming micro-batch maintains
the dimension tables insert-new-only (surrogate keys continuing from the
written target) and appends enriched fact rows; the semantic overview is
recomputed from the written tables after (or between) drains — the
streaming form of the reference's Airflow-triggered batch chain
(`composer/goSalesPipeline.py:23-29`), with `foreachBatch` playing the
role of the per-job curated writes.

Design notes (the at-scale contracts):
  - dims are DISCOVERED from the stream (new retailer/product/method codes
    get keys on first sight) with attributes joined from static masters —
    the standard stream-static enrichment pattern; the static masters are
    dim-sized and broadcast;
  - every micro-batch does bounded work: anti-join against the (small)
    written dim, a window over the NEW rows only for key assignment, and
    a broadcast-enriched write of the batch's facts into a batch-id-keyed
    directory — no global state, no growing driver memory. foreachBatch
    is at-least-once, so every write is replay-idempotent: dim
    maintenance anti-joins the already-written keys, and the fact write
    OVERWRITES its own batch=<id> partition, so a crash-and-replay never
    duplicates rows; key assignment is deterministic given arrival order;
  - the method registry (`go_methods`) is folded into a projection
    (``method_name = split_part(code, '-', 2)``) because the mapping is
    functional on the code — one less maintained table in the hot path,
    same final semantics (verified against the batch build in tests);
  - final-state equality: surrogate KEY VALUES depend on arrival order,
    but the key→attribute mapping is functional, so the semantic overview
    (grouped by display attributes) from streaming-built tables equals
    the batch `sales_overview` EXACTLY — asserted in
    tests/test_gosales_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.operators.incremental import insert_new_only
from gcp_etl_pipeline_spark.operators.keys import surrogate_keys
from gcp_etl_pipeline_spark.operators.normalize import norm_key
from gcp_etl_pipeline_spark.plans import gosales
from gcp_etl_pipeline_spark.sinks.writers import read_target

RAW_SCHEMA = (
    "retailer_code STRING, product_number STRING, order_method_code STRING, "
    "sale_date STRING, quantity DOUBLE, unit_price DOUBLE, "
    "unit_sale_price DOUBLE"
)


def stage_raw_stream(
    spark: SparkSession, sf_dir: str, raw_dir: str, n_files: int = 4
) -> None:
    """Land the raw daily-sales feed as ``n_files`` parquet files — the
    arrival layout a file-watching stream consumes (each file becomes one
    micro-batch with maxFilesPerTrigger=1)."""
    gosales.go_daily_sales(spark, sf_dir).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(raw_dir)


def _maintain_dim(
    cand: DataFrame, path: str, key_col: str, nat_keys: list[str]
) -> None:
    """Insert-new-only + surrogate continuation against the written dim:
    anti-join the candidates, key ONLY the new rows from max(target)+1."""
    spark = cand.sparkSession
    target = read_target(spark, path)
    new = insert_new_only(cand, target, nat_keys, normalize=False)
    keyed = surrogate_keys(new, target, key_col, order_by=nat_keys)
    keyed.select(key_col, *[c for c in cand.columns]).write.mode(
        "append"
    ).parquet(path)


def _process_batch(warehouse: str, retailers_static, products_static):
    """foreachBatch body builder. The static masters arrive pre-built so
    every batch reuses the same (broadcastable) DataFrames."""

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.persist()
        try:
            # --- dims discovered from the stream, attributes from masters
            _maintain_dim(
                batch.select(
                    F.expr("split_part(order_method_code, '-', 2)").alias(
                        "method_name"
                    )
                ).distinct(),
                f"{warehouse}/method_hlp",
                "method_key",
                ["method_name"],
            )
            _maintain_dim(
                batch.select("retailer_code").distinct(),
                f"{warehouse}/retailer_hlp",
                "retailer_key",
                ["retailer_code"],
            )
            seen_products = batch.select("product_number").distinct().alias("b")
            _maintain_dim(
                seen_products.join(
                    F.broadcast(products_static.alias("s")),
                    norm_key(F.col("b.product_number"))
                    == norm_key(F.col("s.product_number")),
                )
                .drop(F.col("s.product_number")),
                f"{warehouse}/product_lkp",
                "product_key",
                ["product_number"],
            )

            # --- enrich THIS batch's facts against the updated dims
            rh = read_target(spark, f"{warehouse}/retailer_hlp")
            pl = read_target(spark, f"{warehouse}/product_lkp")
            mh = read_target(spark, f"{warehouse}/method_hlp")
            src = batch.withColumn(
                "method_name", F.expr("split_part(order_method_code, '-', 2)")
            )
            fact = (
                src.join(
                    F.broadcast(rh),
                    norm_key(src.retailer_code) == norm_key(rh.retailer_code),
                    "left",
                )
                .join(
                    F.broadcast(pl),
                    norm_key(src.product_number) == norm_key(pl.product_number),
                    "left",
                )
                .join(
                    F.broadcast(mh),
                    norm_key(src.method_name) == norm_key(mh.method_name),
                    "left",
                )
                .select(
                    "retailer_key",
                    "product_key",
                    "method_key",
                    "sale_date",
                    F.col("quantity").cast("int").alias("sell_quantity"),
                    pl.unit_price.cast("float").alias("buying_unit_price"),
                    src.unit_price.cast("float").alias("ask_selling_unit_price"),
                    F.col("unit_sale_price").cast("float").alias(
                        "selling_unit_price"
                    ),
                )
            )
            # batch-id-keyed directory, OVERWRITTEN on write: foreachBatch
            # is at-least-once, so a plain append would duplicate this
            # batch's rows when the engine replays it after a crash
            # between the append and the checkpoint commit; overwriting
            # batch=<id> makes the replay land on top of the first
            # attempt. (Dim maintenance is already replay-safe: the
            # anti-join sees the previously written keys.)
            fact.write.mode("overwrite").parquet(
                f"{warehouse}/sales_fact/batch={batch_id}"
            )
        finally:
            batch.unpersist()

    return process


def run_streaming_gosales(
    spark: SparkSession, sf_dir: str, raw_dir: str, warehouse: str
) -> None:
    """Drain everything currently staged in ``raw_dir`` through the
    continuous pipeline (availableNow; a production deployment runs the
    same query with a processing-time trigger and it never stops)."""
    retailers = gosales.go_retailers(spark, sf_dir)
    products = gosales.go_products(spark, sf_dir)
    stream = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            _process_batch(warehouse, retailers, products)
        )
        .option("checkpointLocation", f"{warehouse}/_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def overview_from_warehouse(spark: SparkSession, sf_dir: str, warehouse: str) -> DataFrame:
    """Semantic rollup over the streaming-built tables: same µ-unit exact
    recipe as the batch `sales_overview`, reading written parquet (the
    'semantic layer reads the curated table' shape the batch plan
    documents for 100 TB). retailer_dim is derived on the fly from the
    written helping + static master (broadcast-sized)."""
    fact = spark.read.parquet(f"{warehouse}/sales_fact")
    rh = read_target(spark, f"{warehouse}/retailer_hlp")
    pl = read_target(spark, f"{warehouse}/product_lkp")
    mh = read_target(spark, f"{warehouse}/method_hlp")
    r = gosales.go_retailers(spark, sf_dir)
    rd = r.join(
        F.broadcast(rh), norm_key(r.retailer_code) == norm_key(rh.retailer_code)
    ).select("retailer_key", "retailer_name", "retailer_type", "country")
    return gosales.overview_from_tables(fact, rd, pl, mh)
