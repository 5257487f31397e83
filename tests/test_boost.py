"""Round-6 per-term boosts (FIXTURES.md §3.15): parse, the idf-scale
fold on all three engine paths + batch vs the CASE-multiplied DuckDB
oracle, and composition with groups/filters."""

from __future__ import annotations

import shutil

import pytest

from tests.conftest import SF_DIR
from xsearch_spark import engine, oracles
from xsearch_spark.operators.wand import (
    search_index_relational,
    search_wand,
    search_wand_batch,
)
from xsearch_spark.plans.build_index import build_index
from xsearch_spark.plans.query import boost_of, parse
from xsearch_spark.sources.io import read_documents

BOOST_QUERIES = [
    "hash^2.5 join",  # AND with one boosted term
    "hash^0.1 OR join",  # down-weight under OR
    "the^3 -join lang:en",  # boost + NOT + filter
    "sow~1 sort^2",  # boost composes with a fuzzy group
    "hash^2 hash^3",  # repeated declaration: last wins
    "hash^0 join",  # zero boost: still required, contributes 0
]


def test_boost_parse():
    p = parse("hash^2.5 join")
    assert p.terms == ("hash", "join")
    assert p.boosts == (("hash", 2.5),)
    assert boost_of(p, "hash") == 2.5 and boost_of(p, "join") == 1.0
    # last declaration wins
    assert boost_of(parse("a^2 a^3"), "a") == 3.0
    # boost on an exclusion is ignored (the doc is dropped anyway)
    p = parse("-hash^2 join")
    assert p.exclude == ("hash",) and p.boosts == ()
    # invalid shapes degrade to plain analysis ('^' is a separator)
    assert parse("a^b").terms == ("a", "b") and parse("a^b").boosts == ()
    assert parse("^2").terms == ("2",)
    # '^' never leaks into phrases
    q = parse('"hash join" spark^2')
    assert q.boosts == (("spark", 2.0),)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("boost_index"))
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


@pytest.fixture(scope="module")
def corpus(spark):
    return engine.corpus_from_documents(spark, SF_DIR, cache=True)


def _rounded(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


@pytest.mark.parametrize("q", BOOST_QUERIES)
def test_boost_paths_match_oracle(spark, built, corpus, duck, q):
    parsed = parse(q)
    want = [
        (int(r[0]), float(r[1]))
        for r in duck.execute(oracles.bm25_sql(parsed)).fetchall()
    ]
    naive = [
        (r["doc_id"], r["score"])
        for r in engine.run_query(corpus, parsed).collect()
    ]
    wand = _rounded(search_wand(built, parsed, source_df=corpus.source))
    rel = _rounded(
        search_index_relational(built, parsed, source_df=corpus.source)
    )
    assert naive == wand == rel, q
    assert [d for d, _ in wand] == [d for d, _ in want], q
    assert all(abs(a[1] - b[1]) < 1e-9 for a, b in zip(wand, want)), q


def test_boost_changes_ranking(built):
    a = [r["doc_id"] for r in search_wand(built, parse("hash join")).collect()]
    b = [r["doc_id"] for r in search_wand(built, parse("hash^5 join")).collect()]
    assert a != b  # the fixture corpus is discriminative under a 5x boost


def test_boost_batch_equals_singles(spark, built, corpus):
    qs = {f"q{i}": parse(q) for i, q in enumerate(BOOST_QUERIES[:4])}
    by_q: dict[str, list] = {}
    for r in search_wand_batch(built, qs, source_df=corpus.source).collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 6))
        )
    for qid, p in qs.items():
        single = _rounded(search_wand(built, p, source_df=corpus.source))
        assert by_q.get(qid, []) == single, qid
