"""S4 upsert, S5 tombstone delete + compaction, and the §2.10 streaming
ingest parity path (foreachBatch micro-segments + merge compaction)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from xsearch_spark import engine
from xsearch_spark.operators import segments as seg
from xsearch_spark.operators.wand import search_wand
from xsearch_spark.plans import admin
from xsearch_spark.plans.build_index import build_index
from xsearch_spark.plans.query import parse
from xsearch_spark.sources.io import read_documents


def test_upsert_latest(spark):
    rows = [
        ("o/r", "a.py", "2020", "py", "old"),
        ("o/r", "a.py", "2021", "py", "new"),
        ("o/r", "b.py", "2019", "py", "only"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    out = {(r["path"]): r["content"] for r in admin.upsert_latest(df).collect()}
    assert out == {"a.py": "new", "b.py": "only"}


@pytest.fixture()
def built(spark, tmp_path):
    docs = read_documents(spark, SF_DIR)
    bi = build_index(
        spark, docs, str(tmp_path / "idx"),
        text_col="text", variant="base",
        docs_per_segment=128, segs_per_shard=2, num_buckets=8,
    )
    yield bi


def test_tombstone_then_compact(spark, built):
    docs = read_documents(spark, SF_DIR)
    parsed = parse("hash join")
    before = [r["doc_id"] for r in search_wand(built, parsed, source_df=docs).collect()]
    victims = before[:2]

    # S5 query-time tombstones: victims disappear without a rebuild
    admin.append_tombstones(spark, built.root, victims)
    tomb = admin.load_tombstones(spark, built.root)
    filtered = admin.apply_tombstones(
        search_wand(built, parsed, k=20, source_df=docs), tomb
    ).collect()
    after_ids = [r["doc_id"] for r in filtered]
    assert not set(victims) & set(after_ids)

    # compaction folds tombstones in; now the raw query excludes them too
    admin.compact(spark, built, segs_per_shard=2)
    assert admin.load_tombstones(spark, built.root) is None
    post = [r["doc_id"] for r in search_wand(built, parsed, k=10, source_df=docs).collect()]
    assert not set(victims) & set(post)
    # and the compacted index equals a fresh build over the doc set minus victims
    fresh = engine.corpus_from_df(
        docs.filter(~F.col("doc_id").isin(victims)), "text"
    )
    # compare df stats for the query terms (compaction preserves stats)
    fresh_df = {r["term"]: r["df"] for r in fresh.term_stats.filter(F.col("term").isin(["hash", "join"])).collect()}
    built_df = {r["term"]: r["df"] for r in built.term_stats.filter(F.col("term").isin(["hash", "join"])).collect()}
    assert fresh_df == built_df


def test_streaming_ingest_matches_batch(spark, tmp_path):
    """Stream the documents table through foreachBatch micro-segments,
    compact, and verify the merged postings equal the batch build's."""
    from xsearch_spark.streaming.ingest import compact_segments, start_ingest

    docs = read_documents(spark, SF_DIR)
    staging = str(tmp_path / "staging")
    # write as several files to get multiple micro-batches
    docs.repartition(6).write.parquet(staging)
    root = str(tmp_path / "stream_idx")

    stats = engine.corpus_from_documents(spark, SF_DIR).stats
    q = start_ingest(spark, staging, root, avgdl_hint=stats.avgdl, docs_per_segment=128)
    q.awaitTermination(120)

    merged = compact_segments(spark, root, stats.avgdl, segs_per_shard=2, num_buckets=8)
    via_stream = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in seg.decode_postings(merged).collect()
    }
    corpus = engine.corpus_from_documents(spark, SF_DIR)
    from xsearch_spark.operators.build import postings_with_dl

    direct = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in postings_with_dl(corpus.tokenized).collect()
    }
    assert via_stream == direct
