"""Round-6 more-like-this (FIXTURES.md §3.16): seed-term ranking +
OR search vs the fully declarative DuckDB oracle, seed exclusion,
tombstone composition, and guards."""

from __future__ import annotations

import shutil

import pytest

from tests.conftest import SF_DIR
from xsearch_spark import oracles
from xsearch_spark.operators.wand import more_like_this
from xsearch_spark.plans.build_index import build_index
from xsearch_spark.sources.io import read_documents


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mlt_index"))
    bi = build_index(
        spark,
        read_documents(spark, SF_DIR),
        out,
        text_col="text",
        variant="base",
        docs_per_segment=128,
        segs_per_shard=2,
        num_buckets=16,
        attr_cols=("lang", "source"),
        positions=True,
    )
    yield bi
    shutil.rmtree(out, ignore_errors=True)


def _rounded(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


@pytest.mark.parametrize("doc,m", [(0, 5), (17, 3), (123, 8), (42, 1)])
def test_mlt_matches_oracle(spark, built, duck, doc, m):
    docs = read_documents(spark, SF_DIR)
    got = _rounded(more_like_this(built, doc, docs, m=m))
    want = [
        (int(r[0]), float(r[1]))
        for r in duck.execute(oracles.more_like_this_sql(doc, m=m)).fetchall()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], (doc, m)
    assert all(abs(a[1] - b[1]) < 1e-9 for a, b in zip(got, want)), (doc, m)
    assert doc not in [d for d, _ in got]  # seed always excluded


def test_mlt_with_tombstones(spark, built, duck):
    from pyspark.sql import functions as F

    docs = read_documents(spark, SF_DIR)
    tombs = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    got = _rounded(more_like_this(built, 3, docs, m=4, tombstones=tombs))
    want = [
        (int(r[0]), float(r[1]))
        for r in duck.execute(
            oracles.more_like_this_sql(3, m=4, extra_doc_pred="tf.doc_id % 7 <> 0")
        ).fetchall()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_mlt_missing_doc_raises(spark, built):
    docs = read_documents(spark, SF_DIR)
    with pytest.raises(ValueError, match="not in source"):
        more_like_this(built, 10**9, docs)
