"""Round-6 multi-field search (FIXTURES.md §3.25): per-field indexes
with field-local stats, weighted-sum fusion vs the DuckDB oracle, the
single-field degenerate == plain search pin, weights, tombstones, and
the guards."""

from __future__ import annotations

import shutil

import pytest

from tests.conftest import SF_DIR
from xsearch_spark import oracles
from xsearch_spark.operators.fields import multi_field_search, with_title
from xsearch_spark.operators.wand import search_index_relational
from xsearch_spark.plans.build_index import build_index
from xsearch_spark.plans.query import parse
from xsearch_spark.sources.io import read_documents


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    docs = with_title(read_documents(spark, SF_DIR))
    out_b = str(tmp_path_factory.mktemp("mf_body"))
    out_t = str(tmp_path_factory.mktemp("mf_title"))
    kw = dict(
        variant="base",
        docs_per_segment=128,
        segs_per_shard=2,
        num_buckets=16,
    )
    body = build_index(spark, docs, out_b, text_col="text", **kw)
    title = build_index(spark, docs, out_t, text_col="title", **kw)
    yield {"body": body, "title": title}
    shutil.rmtree(out_b, ignore_errors=True)
    shutil.rmtree(out_t, ignore_errors=True)


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


CASES = [
    # (title query, body query, weights)
    ("the", "hash join", None),
    ("the", "hash join", {"title": 2.5, "body": 1.0}),
    ("data OR scan", "hash OR join", {"title": 3.0}),
    ("zzzznotaterm", "hash", None),  # one field matches nothing
    ("the -data", "(hash OR join) sort", None),  # per-field NOT/groups
]


@pytest.mark.parametrize("tq,bq,w", CASES)
def test_multi_field_matches_oracle(spark, indexes, duck, tq, bq, w):
    got = _rows(
        multi_field_search(
            {
                "title": (indexes["title"], parse(tq)),
                "body": (indexes["body"], parse(bq)),
            },
            weights=w,
        )
    )
    w = w or {}
    want = [
        (int(a), float(b))
        for a, b in duck.execute(
            oracles.multi_field_sql(
                [
                    (
                        oracles.title_documents_sql(),
                        parse(tq),
                        w.get("title", 1.0),
                    ),
                    ("documents", parse(bq), w.get("body", 1.0)),
                ]
            )
        ).fetchall()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], (tq, bq)
    assert all(abs(a[1] - b[1]) < 1e-9 for a, b in zip(got, want)), (tq, bq)


def test_single_field_degenerates_to_plain_search(spark, indexes):
    """One field at weight 1.0 must equal the ordinary index search
    (same match truth, same scores)."""
    parsed = parse("hash join")
    fused = _rows(
        multi_field_search({"body": (indexes["body"], parsed)})
    )
    import pyspark.sql.functions as F

    plain = [
        (r["doc_id"], round(r["score"], 6))
        for r in search_index_relational(indexes["body"], parsed).collect()
    ]
    assert fused == [(d, round(s, 6)) for d, s in plain]


def test_field_local_stats_differ(spark, indexes):
    """The per-field indexes carry FIELD-LOCAL statistics — the title
    field is ~6 tokens, so its avgdl must be far below the body's
    (this is what makes §3.25 per-field BM25, not one merged bag)."""
    assert indexes["title"].avgdl < indexes["body"].avgdl / 3


def test_multi_field_tombstones(spark, indexes, duck):
    tombs = indexes["body"].index_df.sparkSession.createDataFrame(
        [(i,) for i in range(0, 500, 7)], "doc_id long"
    )
    got = _rows(
        multi_field_search(
            {
                "title": (indexes["title"], parse("the")),
                "body": (indexes["body"], parse("hash join")),
            },
            tombstones=tombs,
        )
    )
    want = [
        (int(a), float(b))
        for a, b in duck.execute(
            oracles.multi_field_sql(
                [
                    (oracles.title_documents_sql(), parse("the"), 1.0),
                    ("documents", parse("hash join"), 1.0),
                ],
                extra_doc_pred="tf.doc_id % 7 <> 0",
            )
        ).fetchall()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_multi_field_guards_raise(indexes):
    with pytest.raises(ValueError, match="at least one field"):
        multi_field_search({})
    with pytest.raises(ValueError, match="unknown field"):
        multi_field_search(
            {"body": (indexes["body"], parse("hash"))}, weights={"nope": 1.0}
        )
    with pytest.raises(ValueError, match=">= 0"):
        multi_field_search(
            {"body": (indexes["body"], parse("hash"))},
            weights={"body": -1.0},
        )
