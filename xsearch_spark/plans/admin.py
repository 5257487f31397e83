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


def compact(spark: SparkSession, built, segs_per_shard: int = 4) -> None:
    """Fold tombstones into the packed index: decode -> anti-join ->
    re-pack -> overwrite index + term stats; clear tombstones.

    Only rows whose [first_doc_id, last_doc_id] range intersects a
    tombstone need rewriting; untouched rows are unioned through as-is.
    """
    from xsearch_spark.operators import segments as seg
    from xsearch_spark.plans.build_index import _paths

    tomb = load_tombstones(spark, built.root)
    if tomb is None or tomb.count() == 0:
        return
    idx = built.index_df
    t = F.broadcast(tomb.select("doc_id"))
    # rows possibly containing a tombstoned doc (range overlap)
    hit_terms = (
        idx.join(
            t,
            (F.col("doc_id") >= F.col("first_doc_id"))
            & (F.col("doc_id") <= F.col("last_doc_id")),
        )
        .select("term", "shard")
        .distinct()
    )
    hit = idx.join(hit_terms, ["term", "shard"], "left_semi")
    keep = idx.join(hit_terms, ["term", "shard"], "left_anti")
    # rewrite the hit rows through decode -> filter -> repack
    long = seg.decode_postings(hit)
    long = long.join(t, "doc_id", "left_anti")
    repacked = seg.merge_segments(
        seg.build_segments(long, built.avgdl), built.avgdl, segs_per_shard
    )
    new_idx = keep.select(repacked.columns).unionByName(repacked)
    new_idx = new_idx.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("term")), F.lit(built.num_buckets)).cast("int")
    )
    paths = _paths(built.root)
    tmp = paths["index"] + "_compacting"
    new_idx.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").partitionBy("bucket").parquet(paths["index"])
    ts = final.groupBy("term").agg(F.sum("n_docs").alias("df"))
    ts.write.mode("overwrite").parquet(paths["term_stats"])
    # clear applied tombstones + refresh the in-memory handle
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(tombstone_path(built.root), ignore_errors=True)
    built.index_df = spark.read.parquet(paths["index"])
    built.term_stats = spark.read.parquet(paths["term_stats"])
