"""Streaming ingest (SURVEY.md §2.10).

Reference parity: xsearch ingests continuously — gRPC AddDoc -> proxy ->
per-shard disk queue -> indexer goroutine builds in-memory segments,
flushed on size threshold, merged in the background (component-level
[R]; the queue is the author's diskqueue project). The Spark-native
equivalent:

  * ``readStream`` over an append-only staging directory (files play the
    queue's role; at-least-once replay is Spark's checkpointed file
    source),
  * ``foreachBatch``: each micro-batch runs the SAME batch operators
    (A1 tokenize -> B1/B2 postings -> B4 pack) into new small segment
    runs appended under ``segments/`` — one segment per (epoch, doc
    slice), exactly xsearch's flush-small model,
  * dedup on replay (S4 semantics): batch ids are offset by epoch so
    re-delivery cannot collide; exactly-once comes from foreachBatch's
    epoch id + the idempotent per-epoch output path,
  * periodic ``compact_segments`` = the B5 merge as a batch job (the
    reference's background merge goroutine).

No watermarks/session windows: the capability set has no event-time
aggregation (SURVEY.md §2.5 streaming note).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xsearch_spark.operators import build as b
from xsearch_spark.operators import segments as seg
from xsearch_spark.sources.io import DOCUMENTS_SCHEMA


def start_ingest(
    spark: SparkSession,
    staging_dir: str,
    index_root: str,
    avgdl_hint: float,
    variant: str = "base",
    text_col: str = "text",
    docs_per_segment: int = 4096,
):
    """Start the streaming ingest; returns the StreamingQuery.

    avgdl_hint: BM25's avgdl must be collection-global; streaming uses a
    running hint (recomputed at each compaction) — same approximation
    any incremental engine makes between merges.
    """
    os.makedirs(os.path.join(index_root, "segments"), exist_ok=True)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        post = b.postings_with_dl_fused(batch_df, text_col, "doc_id", variant)
        packed = seg.build_segments(post, avgdl_hint, docs_per_segment)
        # one directory per epoch: idempotent on redelivery (exactly-once)
        out = os.path.join(index_root, "segments", f"epoch={epoch_id}")
        packed.write.mode("overwrite").parquet(out)

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(staging_dir)
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(index_root, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )


def compact_segments(
    spark: SparkSession,
    index_root: str,
    avgdl: float,
    segs_per_shard: int = 4,
    num_buckets: int = 32,
) -> DataFrame:
    """The background-merge analogue: fold all streamed epoch segments
    into a queryable merged index (B5) and return it."""
    runs = spark.read.parquet(os.path.join(index_root, "segments"))
    merged = seg.merge_segments(runs.drop("epoch"), avgdl, segs_per_shard)
    merged = merged.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("term")), F.lit(num_buckets)).cast("int")
    )
    out = os.path.join(index_root, "index")
    merged.write.mode("overwrite").partitionBy("bucket").parquet(out)
    return spark.read.parquet(out)
