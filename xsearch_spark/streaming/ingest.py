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
  * exactly-once: each epoch writes to its own ``epoch=N`` directory
    with mode=overwrite, so foreachBatch re-delivery of an epoch
    replaces its own output idempotently (doc_ids are NOT re-keyed by
    epoch — a doc indexed in two different epochs is a genuine S4 dedup
    violation and fails fast at merge time via the strictly-increasing
    doc_id invariant),
  * periodic ``compact_segments`` = the B5 merge as a batch job (the
    reference's background merge goroutine). BM25's avgdl is
    collection-global, so each epoch records exact (n_docs, sum_dl) in a
    tiny sidecar and compaction recomputes the TRUE global avgdl from
    the sidecar sums — the merged index never scores with a drifted
    hint (queries between compactions may still use a hint, the same
    approximation any incremental engine makes between merges).

No watermarks/session windows: the capability set has no event-time
aggregation (SURVEY.md §2.5 streaming note).
"""

from __future__ import annotations

import json
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
    attr_cols: "str | tuple[str, ...] | list[str] | None" = "lang",
    positions: bool = False,
):
    """Start the streaming ingest; returns the StreamingQuery.

    avgdl_hint: used only for the provisional per-epoch block maxima;
    ``compact_segments`` recomputes real maxima under the exact global
    avgdl, and only the merged index serves WAND queries.

    ``attr_cols`` (v5, field-generic since round 5): each micro-batch
    also emits the synthetic attribute postings (tf=0/dl=0 filter
    carriers) for every listed column, so the compacted streamed index
    serves ``lang:``/``source:`` filters from the index exactly like a
    batch-built one. ``positions`` (v6): micro-batches pack the
    positional stream so the compacted streamed index serves phrase
    queries. ``compact_segments`` self-detects both from the merged
    rows — no configuration to keep in sync.
    """
    os.makedirs(os.path.join(index_root, "segments"), exist_ok=True)
    os.makedirs(os.path.join(index_root, "epoch_stats"), exist_ok=True)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_epoch(
            spark, batch_df, epoch_id, index_root, avgdl_hint,
            variant, text_col, docs_per_segment, attr_cols, positions,
        )

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


def process_epoch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    index_root: str,
    avgdl_hint: float,
    variant: str = "base",
    text_col: str = "text",
    docs_per_segment: int = 4096,
    attr_cols: "str | tuple[str, ...] | list[str] | None" = "lang",
    positions: bool = False,
) -> None:
    """One micro-batch -> its ``epoch=N`` segment directory + stats
    sidecar. Module-level (not a closure) so exactly-once re-delivery is
    testable in isolation: foreachBatch is at-least-once, and calling
    this twice with the same (batch, epoch_id) must leave the epoch
    directory and sidecar in the same state as one delivery — the epoch
    dir is mode=overwrite and the sidecar a temp-then-rename, so
    re-delivery replaces its own output idempotently (S4 semantics at
    the epoch granularity; asserted byte-identical in
    tests/test_admin_streaming.py)."""
    if batch_df.isEmpty():
        return
    n_docs = batch_df.count()
    attrs = (
        (attr_cols,) if isinstance(attr_cols, str) else tuple(attr_cols or ())
    )
    attrs = tuple(c for c in attrs if c in batch_df.columns)
    post = b.postings_with_dl_fused(
        batch_df, text_col, "doc_id", variant, positions=positions
    )
    from pyspark.sql.types import ArrayType

    col_types = {f.name: f.dataType for f in batch_df.schema.fields}
    for fld in attrs:
        from xsearch_spark.constants import attr_term

        if isinstance(col_types[fld], ArrayType):
            # multi-value attr (tags/licenses): one synthetic posting per
            # DISTINCT element per doc (distinct or repeated elements
            # would trip the merge's duplicate-doc_id invariant)
            pairs = (
                batch_df.select(
                    F.col("doc_id").cast("long").alias("doc_id"),
                    F.explode(fld).alias("_v"),
                )
                .filter(F.col("_v").isNotNull())
                .distinct()
            )
            syn = pairs.select(
                F.concat(F.lit(attr_term(fld, "")), F.col("_v")).alias("term"),
                "doc_id",
                F.lit(0).cast("int").alias("tf"),
                F.lit(0).cast("int").alias("dl"),
            )
        else:
            syn = batch_df.filter(F.col(fld).isNotNull()).select(
                F.concat(F.lit(attr_term(fld, "")), F.col(fld)).alias("term"),
                F.col("doc_id").cast("long").alias("doc_id"),
                F.lit(0).cast("int").alias("tf"),
                F.lit(0).cast("int").alias("dl"),
            )
        if positions:  # synthetic filter carriers have no occurrences
            syn = syn.withColumn(
                "poss", F.array().cast("array<long>")
            )
        post = post.unionByName(syn)
    packed = seg.build_segments(post, avgdl_hint, docs_per_segment)
    # one directory per epoch: idempotent on redelivery (exactly-once)
    out = os.path.join(index_root, "segments", f"epoch={epoch_id}")
    packed.write.mode("overwrite").parquet(out)
    # exact epoch stats for the global-avgdl recompute at compaction:
    # sum(dl over epoch docs) == sum(sum_tf over the packed runs)
    sum_dl = (
        spark.read.parquet(out).agg(F.sum("sum_tf")).collect()[0][0] or 0
    )
    stats = {"epoch": int(epoch_id), "n_docs": int(n_docs), "sum_dl": int(sum_dl)}
    sp = os.path.join(index_root, "epoch_stats", f"epoch={epoch_id}.json")
    with open(sp + ".tmp", "w") as f:
        json.dump(stats, f)
    os.replace(sp + ".tmp", sp)


def _epoch_totals(index_root: str) -> tuple[int, int]:
    """(n_docs, sum_dl) summed over all delivered epochs."""
    d = os.path.join(index_root, "epoch_stats")
    n, s = 0, 0
    for name in sorted(os.listdir(d)) if os.path.isdir(d) else []:
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as f:
            row = json.load(f)
        n += int(row["n_docs"])
        s += int(row["sum_dl"])
    return n, s


def compact_segments(
    spark: SparkSession,
    index_root: str,
    avgdl: float | None = None,
    segs_per_shard: int = 4,
    num_buckets: int = 32,
    docs_per_segment: int = 4096,
):
    """The background-merge analogue: fold all streamed epoch segments
    into a queryable merged index (B5) and return a BuiltIndex.

    ``avgdl=None`` (the default) recomputes the exact global avgdl from
    the per-epoch stats sidecars — post-compaction scoring and block
    maxima always reflect the full streamed collection, never the
    start-time hint (round-1 advisor: avgdl drift).

    The index and term_stats writes are write-temp-then-rename swaps
    (round-3 verdict item 3): ``build_index`` sets session-wide dynamic
    partition overwrite, under which an in-place re-compaction that
    shrinks the bucket set would leave stale bucket partitions — the
    exact round-1 pitfall ``admin.compact`` already guards against.
    stats.json carries ``format_version`` so a reader can reject a
    layout it does not understand.
    """
    import shutil

    from xsearch_spark.plans.build_index import (
        INDEX_FORMAT_VERSION,
        BuiltIndex,
        term_stats_lazy,
    )

    n_docs, sum_dl = _epoch_totals(index_root)
    if avgdl is None:
        avgdl = (sum_dl / n_docs) if n_docs else 0.0
    runs = spark.read.parquet(os.path.join(index_root, "segments"))
    # fused merge+layout (one shuffle) also stamps the global per-term df
    # into every row (v4) — post-compaction queries are driver-stats-free
    # run count from the epoch-segment parquet footers (driver-side,
    # zero jobs) so the merge salt is runs-bounded (round 7)
    import glob as _glob

    import pyarrow.parquet as _pq

    n_runs = sum(
        _pq.ParquetFile(f).metadata.num_rows
        for f in _glob.glob(
            os.path.join(index_root, "segments", "**", "*.parquet"),
            recursive=True,
        )
    )
    merged = seg.merge_to_index(
        runs.drop("epoch"), avgdl, segs_per_shard, num_buckets,
        n_runs=n_runs or None,
    )
    out = os.path.join(index_root, "index")
    tmp = out + "_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    index_df = spark.read.parquet(out)
    # SELF-DETECT the serveable capabilities from the merged rows (a
    # stats.json that promises filters/phrases the index cannot serve
    # would make those queries silently empty or raise): attr fields =
    # the distinct \x01field: prefixes actually present; positions =
    # any non-empty poss stream. Two tiny limit/distinct jobs at
    # compaction time — zero config to keep in sync with the ingest.
    from xsearch_spark.constants import ATTR_TERM_PREFIX

    # numeric self-detection (round-6 §3.13): a field whose every value
    # part is a 20-digit encoding was packed through num_attr_encode —
    # the same one-job aggregate that finds the field set decides it
    attr_rows = (
        index_df.filter(F.col("term").startswith(ATTR_TERM_PREFIX))
        .select(
            F.substring_index(
                F.expr("substring(term, 2)"), ":", 1
            ).alias("f"),
            F.col("term"),
        )
        .select(
            "f", F.expr("substring(term, length(f) + 3)").alias("v")
        )
        .groupBy("f")
        .agg(
            F.min(
                F.col("v").rlike("^[0-9]{20}$").cast("int")
            ).alias("all_num")
        )
        .collect()
    )
    attr_fields = sorted(r["f"] for r in attr_rows)
    num_attr_fields = sorted(r["f"] for r in attr_rows if r["all_num"] == 1)
    has_positions = bool(
        index_df.filter(F.octet_length("poss") > 0).limit(1).count()
    )
    # term_stats: lazily derived from the denormalized df rows (round
    # 7) — the materialized swap was a full-vocabulary job no query
    # path read; a stale pre-round-7 sidecar dir is simply abandoned
    shutil.rmtree(os.path.join(index_root, "term_stats"), ignore_errors=True)
    stats_path = os.path.join(index_root, "stats.json")
    with open(stats_path + ".tmp", "w") as f:
        json.dump(
            {
                "n_docs": n_docs,
                "avgdl": avgdl,
                "sum_dl": sum_dl,
                "docs_per_segment": docs_per_segment,
                "segs_per_shard": segs_per_shard,
                "num_buckets": num_buckets,
                "format_version": INDEX_FORMAT_VERSION,
                "attr_fields": attr_fields,
                "num_attr_fields": num_attr_fields,
                "positions": has_positions,
            },
            f,
        )
    os.replace(stats_path + ".tmp", stats_path)
    return BuiltIndex(
        index_root,
        index_df,
        term_stats_lazy(index_df),
        n_docs,
        avgdl,
        num_buckets,
        docs_per_segment=docs_per_segment,
        segs_per_shard=segs_per_shard,
        sum_dl=sum_dl,
        attr_fields=tuple(attr_fields),
        num_attr_fields=tuple(num_attr_fields),
        unique_term_shard=True,
        has_positions=has_positions,
    )
