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
    from xsearch_spark.plans.build_index import _paths, term_stats_lazy

    # docs already purged by earlier incremental compactions still count
    # in the persisted stats — a full compact trues them up too, EVEN
    # when no new tombstones exist (round-3 advisor: returning early on
    # an empty tombstone table left accumulated pending_deleted applied
    # never, so frozen N/avgdl drifted permanently)
    paths = _paths(built.root)
    import json

    with open(paths["stats"]) as f:
        sidecar = json.load(f)
    pending = sidecar.pop("pending_deleted", {"n_docs": 0, "sum_dl": 0})
    tomb = load_tombstones(spark, built.root)
    has_tomb = tomb is not None and not tomb.isEmpty()
    if not has_tomb and not (int(pending["n_docs"]) or int(pending["sum_dl"])):
        return
    if not has_tomb:
        tomb = spark.createDataFrame([], "doc_id long")
    dps = docs_per_segment or built.docs_per_segment
    sps = segs_per_shard or built.segs_per_shard
    idx = built.index_df
    t = F.broadcast(tomb.select("doc_id").distinct())

    n_deleted, dl_deleted = _measure_deleted(idx, t)
    n_docs_new = built.n_docs - n_deleted - int(pending["n_docs"])
    sum_dl_new = built.sum_dl - dl_deleted - int(pending["sum_dl"])
    avgdl_new = (sum_dl_new / n_docs_new) if n_docs_new else 0.0

    # --- full decode -> anti-join -> rebuild with original geometry -----
    # (merge_to_index recomputes the global df per surviving term, so the
    # v4 denormalized idf inputs stay exact after deletes; attr runs —
    # the v5 lang allowlists — are decoded too so the rebuilt index keeps
    # serving lang: filters, minus the deleted docs)
    kept = (
        seg.decode_postings(
            idx,
            include_attrs=True,
            include_positions=getattr(built, "has_positions", False),
        )
        .drop("df")
        .join(t, "doc_id", "left_anti")
    )
    new_idx = seg.merge_to_index(
        seg.build_segments(kept, avgdl_new, dps), avgdl_new, sps, built.num_buckets
    )

    tmp = paths["index"] + "_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    new_idx.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    shutil.rmtree(paths["index"], ignore_errors=True)
    os.replace(tmp, paths["index"])
    final = spark.read.parquet(paths["index"])
    # term_stats: lazily derived from the rebuilt rows (round 7) — the
    # full-vocabulary parquet swap was a job no query path read; a stale
    # pre-round-7 sidecar dir is simply abandoned
    shutil.rmtree(paths["term_stats"], ignore_errors=True)

    # --- refresh sidecar stats + the in-memory handle --------------------
    # (pending_deleted was popped above: the full rebuild trues it up)
    sidecar.update(
        {"n_docs": n_docs_new, "avgdl": avgdl_new, "sum_dl": sum_dl_new}
    )
    with open(paths["stats"] + ".tmp", "w") as f:
        json.dump(sidecar, f)
    os.replace(paths["stats"] + ".tmp", paths["stats"])
    shutil.rmtree(tombstone_path(built.root), ignore_errors=True)
    built.index_df = final
    built.term_stats = term_stats_lazy(final)
    built.n_docs = n_docs_new
    built.avgdl = avgdl_new
    built.sum_dl = sum_dl_new
    built.invalidate_stats_cache()


def _measure_deleted(idx: DataFrame, t: DataFrame) -> tuple[int, int]:
    """Exact (n_docs, Σdl) of the tombstoned docs that actually have
    postings — measured from only the range-overlapping index rows
    (cheap pruned decode). ``t`` is the distinct broadcast tombstone set."""
    from xsearch_spark.operators import segments as seg

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
    return int(deleted["n"] or 0), int(deleted["s"] or 0)


def compact_incremental(
    spark: SparkSession,
    built,
    max_dl_drift: float = 0.01,
) -> str:
    """Bounded-drift compaction (round-3): purge tombstoned postings from
    ONLY the affected bucket partitions, leaving collection statistics —
    N, avgdl, and every row's denormalized df — at their pre-delete
    values until the next full :func:`compact`. Returns "incremental",
    "full" (drift exceeded ``max_dl_drift`` -> full compact ran instead)
    or "noop".

    Semantics (Lucene's between-merges model: deleted docs keep counting
    in docFreq/avgdl until segments merge): post-compaction queries are
    EXACTLY the pre-delete index queried with the tombstones applied —
    same scores, same ranks, deleted docs gone. That equivalence is the
    test oracle, and it is also why the untouched rows' block maxima
    stay valid WITHOUT recomputation: avgdl is unchanged and purging
    postings can only lower a block's true maximum, so every stored
    bound remains an upper bound (rewritten rows get exact recomputed
    metadata under the same avgdl). A full compact rewrites everything
    under trued-up stats; the dl-mass purged here is accumulated in the
    stats.json ``pending_deleted`` sidecar so that full compact's
    N/avgdl account for docs whose postings are already gone.

    Topology: tombstones are doc-range keyed, so they cogroup with the
    index rows on the SAME shard key the query path uses — no broadcast
    of the delete set, no full-index decode. Only buckets containing a
    tombstone-overlapping shard are rewritten; the rewrite goes to a
    STAGING directory and is swapped in per-bucket (round-3 advisor:
    dynamic-overwriting the path being read both mutated session conf
    and relied on cached blocks surviving until the write; the swap also
    removes fully-emptied buckets for free — the round-1 stale-partition
    pitfall). Rewritten buckets are re-sorted by (term, shard,
    first_doc_id) before the write so parquet row-group min/max term
    skipping survives incremental folds (round-3 verdict item 4).
    """
    import json
    import shutil

    import numpy as np
    import pandas as pd

    from xsearch_spark.constants import BLOCK_SIZE
    from xsearch_spark.functions import codec
    from xsearch_spark.operators.segments import (
        MERGED_BUCKET_SCHEMA,
        _bm25_factor,
    )
    from xsearch_spark.plans.build_index import _paths

    tomb = load_tombstones(spark, built.root)
    if tomb is None or tomb.isEmpty():
        return "noop"
    idx = built.index_df
    t = F.broadcast(tomb.select("doc_id").distinct())
    n_deleted, dl_deleted = _measure_deleted(idx, t)
    paths = _paths(built.root)
    with open(paths["stats"]) as f:
        sidecar = json.load(f)
    pend = sidecar.get("pending_deleted", {"n_docs": 0, "sum_dl": 0})
    # the drift gate bounds TOTAL frozen-stats drift, so it must include
    # the dl mass already purged by earlier incremental passes (round-3
    # advisor: gating on the current batch alone let many small delete
    # batches accumulate unbounded pending drift without escalating)
    if (
        built.sum_dl
        and (int(pend["sum_dl"]) + dl_deleted) / built.sum_dl > max_dl_drift
    ):
        compact(spark, built)
        return "full"

    # --- affected buckets: any bucket holding a tombstone-overlapping
    # shard (cheap column-pruned metadata scan; coarse superset is fine —
    # unaffected rows pass through the purge unchanged)
    tomb_shards = tomb.select(
        (F.col("doc_id") / F.lit(built.docs_per_shard)).cast("long").alias("shard")
    ).distinct()
    affected = sorted(
        r["bucket"]
        for r in idx.join(tomb_shards, "shard", "left_semi")
        .select("bucket")
        .distinct()
        .collect()
    )
    if not affected:
        # tombstoned docs have no postings at all: just clear the table
        shutil.rmtree(tombstone_path(built.root), ignore_errors=True)
        return "incremental"

    avgdl = built.avgdl
    cols = [f.name for f in MERGED_BUCKET_SCHEMA.fields]

    def purge_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=cols)
        left = left[cols]
        if right.empty:
            return left
        tombs = np.sort(right["doc_id"].to_numpy(np.int64))
        out = []
        for r in left.itertuples(index=False):
            row = r._asdict()
            if r.last_doc_id < tombs[0] or r.first_doc_id > tombs[-1]:
                out.append(row)
                continue
            ids = codec.decode_doc_ids(r.doc_ids).astype(np.int64)
            pos = np.searchsorted(tombs, ids)
            pos_c = np.minimum(pos, tombs.size - 1)
            keep = ~((pos < tombs.size) & (tombs[pos_c] == ids))
            if keep.all():
                out.append(row)
                continue
            if not keep.any():
                continue  # whole run deleted
            ids_k = ids[keep]
            tfs_full = codec.decode_tfs(r.tfs).astype(np.int64)
            tfs_k = tfs_full[keep]
            dls_k = codec.decode_tfs(r.dls).astype(np.int64)[keep]
            if getattr(r, "poss", b""):
                # v6: the positional stream is purged with the same
                # keep-mask (kept postings keep their substreams intact)
                from xsearch_spark.operators.segments import (
                    _gather_substreams,
                )

                flat = codec.decode_tfs(bytes(r.poss)).astype(np.int64)
                row.update(
                    poss=codec.encode_tfs(
                        _gather_substreams(
                            flat, tfs_full, np.nonzero(keep)[0]
                        )
                    )
                )
            starts = np.arange(0, ids_k.size, BLOCK_SIZE)
            row.update(
                n_docs=int(ids_k.size),
                first_doc_id=int(ids_k[0]),
                last_doc_id=int(ids_k[-1]),
                doc_ids=codec.encode_doc_ids(ids_k.astype(np.uint64)),
                tfs=codec.encode_tfs(tfs_k),
                dls=codec.encode_tfs(dls_k),
                block_last=ids_k[
                    np.minimum(starts + BLOCK_SIZE - 1, ids_k.size - 1)
                ].astype(np.int64).tolist(),
                # same avgdl as the rest of the index: stats are frozen
                # until full compact, so bounds stay exact
                block_max=np.maximum.reduceat(
                    _bm25_factor(tfs_k, dls_k, avgdl), starts
                ).tolist(),
            )
            out.append(row)
        return pd.DataFrame(out, columns=cols)

    affected_rows = idx.filter(F.col("bucket").isin(affected))
    tomb_keyed = tomb.select("doc_id").distinct().withColumn(
        "shard", (F.col("doc_id") / F.lit(built.docs_per_shard)).cast("long")
    )
    new_rows = (
        affected_rows.groupBy("shard")
        .cogroup(tomb_keyed.groupBy("shard"))
        .applyInPandas(purge_fn, MERGED_BUCKET_SCHEMA)
    )

    staging = paths["index"] + "_inc_staging"
    shutil.rmtree(staging, ignore_errors=True)
    # restore the term sort inside rewritten buckets (parquet row-group
    # min/max skipping on `term`); one job writes the staging dirs — the
    # purge UDF runs exactly once, no persist, no survivor-count job.
    # `bucket` leads the sort so the partitioned writer's required
    # ordering is already satisfied — otherwise it injects its own
    # bucket-only sort and destroys the term order.
    (
        new_rows.repartition("bucket")
        .sortWithinPartitions("bucket", "term", "shard", "first_doc_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staging)
    )
    for b in affected:
        dst = os.path.join(paths["index"], f"bucket={b}")
        src = os.path.join(staging, f"bucket={b}")
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isdir(src):  # fully-emptied buckets simply disappear
            os.replace(src, dst)
    shutil.rmtree(staging, ignore_errors=True)

    sidecar["pending_deleted"] = {
        "n_docs": int(pend["n_docs"]) + n_deleted,
        "sum_dl": int(pend["sum_dl"]) + dl_deleted,
    }
    with open(paths["stats"] + ".tmp", "w") as f:
        json.dump(sidecar, f)
    os.replace(paths["stats"] + ".tmp", paths["stats"])
    shutil.rmtree(tombstone_path(built.root), ignore_errors=True)
    built.index_df = spark.read.parquet(paths["index"])
    # N/avgdl/term_stats deliberately unchanged (frozen-stats semantics)
    return "incremental"
