"""Entry point 3: deletes (S4/S5) and compaction (SURVEY.md §3.3).

Reference parity: xsearch's metad folds deletes in as per-segment
tombstones at merge time; re-adding a key replaces the old doc
(component-level [R]). Spark shape:

  * ``upsert_latest``    — S4: keep the newest commit per (repo, path)
                           (row_number over a per-key window; Iceberg
                           MERGE INTO in prod).
  * ``append_tombstones``— S5: deleted doc_ids accumulate in a tiny
                           append-only parquet table.
  * ``apply_tombstones`` — query-time ``left_anti`` join (cheap: the
                           tombstone side is small and broadcast).
  * ``compact``          — folds tombstones into the packed index by
                           rewriting only the affected (bucket) rows:
                           decode -> filter -> re-pack, then clears the
                           tombstone table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_latest(
    df: DataFrame,
    key: list[str] | None = None,
    version_col: str = "commit",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """S4: one row per key, newest version wins; optional extra
    descending tie-break columns make the winner deterministic when the
    version column isn't unique per key."""
    key = key or ["repo", "path"]
    order = [F.col(version_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def tombstone_path(index_root: str) -> str:
    return os.path.join(index_root, "tombstones")


def append_tombstones(spark: SparkSession, index_root: str, doc_ids: list[int]) -> None:
    df = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    df.write.mode("append").parquet(tombstone_path(index_root))


def load_tombstones(spark: SparkSession, index_root: str) -> DataFrame | None:
    p = tombstone_path(index_root)
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p)


def apply_tombstones(result: DataFrame, tombstones: DataFrame | None) -> DataFrame:
    """S5 query-time filter: drop deleted docs before top-k."""
    if tombstones is None:
        return result
    return result.join(F.broadcast(tombstones.select("doc_id")), "doc_id", "left_anti")


def compact(
    spark: SparkSession,
    built,
    segs_per_shard: int | None = None,
    docs_per_segment: int | None = None,
) -> None:
    """Fold tombstones into the packed index and refresh the collection
    statistics. Semantics: the compacted index + stats equal a FRESH
    build over the source minus the deleted docs (same doc_ids, same
    geometry) — that equivalence is what the post-compact oracle test
    asserts.

    Geometry: the rebuild uses the BUILD-TIME docs_per_segment /
    segs_per_shard persisted in stats.json (round-1 advisor: repacking
    with a different geometry scatters a doc's terms across different
    shard groups than its kept rows — silent top-k corruption).

    Stats: N and avgdl are recomputed over the surviving docs. Because
    avgdl changes, EVERY row's block maxima must be recomputed (a stale
    upper bound computed under a smaller avgdl can under-estimate and
    make WAND prune a true top-k doc), so compaction rewrites the whole
    index rather than only tombstone-overlapping rows — the same choice
    Lucene makes for the segments it folds. The deleted docs' dl mass is
    measured from only the range-overlapping rows (cheap pruned decode).

    Caveat: a doc that tokenized to zero terms has no postings, so its
    deletion cannot adjust (N, avgdl); fresh-build parity holds for any
    doc with at least one token.

    The final write is an atomic directory swap (write temp -> rename),
    immune to the session's dynamic partitionOverwriteMode: a bucket
    whose rows all died must disappear, not survive as a stale partition
    (round-1 advisor).
    """
    import shutil

    from xsearch_spark.operators import segments as seg
    from xsearch_spark.plans.build_index import _paths

    tomb = load_tombstones(spark, built.root)
    if tomb is None or tomb.isEmpty():
        return
    dps = docs_per_segment or built.docs_per_segment
    sps = segs_per_shard or built.segs_per_shard
    idx = built.index_df
    t = F.broadcast(tomb.select("doc_id").distinct())

    # --- new collection stats from the deleted docs' (doc_id, dl) -------
    # only rows whose doc-id range overlaps a tombstone can contain one
    hit = idx.join(
        t.withColumnRenamed("doc_id", "_td"),
        (F.col("_td") >= F.col("first_doc_id")) & (F.col("_td") <= F.col("last_doc_id")),
        "left_semi",
    )
    deleted = (
        seg.decode_postings(hit)
        .join(t, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.max("dl").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
        .collect()[0]
    )
    n_deleted, dl_deleted = int(deleted["n"] or 0), int(deleted["s"] or 0)
    n_docs_new = built.n_docs - n_deleted
    sum_dl_new = built.sum_dl - dl_deleted
    avgdl_new = (sum_dl_new / n_docs_new) if n_docs_new else 0.0

    # --- full decode -> anti-join -> rebuild with original geometry -----
    # (merge_to_index recomputes the global df per surviving term, so the
    # v4 denormalized idf inputs stay exact after deletes)
    kept = seg.decode_postings(idx).drop("df").join(t, "doc_id", "left_anti")
    new_idx = seg.merge_to_index(
        seg.build_segments(kept, avgdl_new, dps), avgdl_new, sps, built.num_buckets
    )

    paths = _paths(built.root)
    tmp = paths["index"] + "_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    new_idx.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    shutil.rmtree(paths["index"], ignore_errors=True)
    os.replace(tmp, paths["index"])
    final = spark.read.parquet(paths["index"])
    ts = final.groupBy("term").agg(F.sum("n_docs").alias("df"))
    ts_tmp = paths["term_stats"] + "_compacting"
    shutil.rmtree(ts_tmp, ignore_errors=True)
    ts.write.mode("overwrite").parquet(ts_tmp)
    shutil.rmtree(paths["term_stats"], ignore_errors=True)
    os.replace(ts_tmp, paths["term_stats"])

    # --- refresh sidecar stats + the in-memory handle --------------------
    import json

    with open(paths["stats"]) as f:
        sidecar = json.load(f)
    sidecar.update(
        {"n_docs": n_docs_new, "avgdl": avgdl_new, "sum_dl": sum_dl_new}
    )
    with open(paths["stats"] + ".tmp", "w") as f:
        json.dump(sidecar, f)
    os.replace(paths["stats"] + ".tmp", paths["stats"])
    shutil.rmtree(tombstone_path(built.root), ignore_errors=True)
    built.index_df = final
    built.term_stats = spark.read.parquet(paths["term_stats"])
    built.n_docs = n_docs_new
    built.avgdl = avgdl_new
    built.sum_dl = sum_dl_new
    built.invalidate_stats_cache()
