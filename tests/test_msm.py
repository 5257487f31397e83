"""Round-6 minimum-should-match (FIXTURES.md §3.20): parse semantics,
three-engine-path agreement (incl. the WAND OR path's msm-qualified
theta seed), clause counting across plain terms and prefix/fuzzy/
boolean groups, batch parity, and the fail-fast guards."""

from __future__ import annotations

import shutil

import pytest

from tests.conftest import SF_DIR
from xsearch_spark import engine, oracles
from xsearch_spark.operators.wand import (
    match_count,
    search_index_relational,
    search_wand,
    search_wand_batch,
)
from xsearch_spark.plans.build_index import build_index
from xsearch_spark.plans.query import parse
from xsearch_spark.sources.io import read_documents

MSM_QUERIES = [
    "hash OR join OR scan min_match:2",  # classic 2-of-3
    "hash OR join OR scan OR merge min_match:3",  # 3-of-4
    "the OR scan OR join min_match:2",  # hot terms (WAND pruning active)
    "(data OR dup) OR hash min_match:2",  # boolean group = one clause
    "s* OR hash OR join min_match:2",  # prefix group = one clause
    "sow~1 OR hash min_match:2",  # fuzzy group = one clause
    "hash OR join min_match:1",  # == plain OR
    "hash OR join min_match:5",  # N > clause count -> 0 rows
    "hash OR join -scan min_match:2",  # exclusion is not a clause
    "lang:en hash OR join OR merge min_match:2",  # attr filter composes
]


def test_msm_parse():
    p = parse("hash OR join OR scan min_match:2")
    assert p.min_match == 2 and p.connective == "OR"
    assert parse("a OR b").min_match == 0
    # last declaration wins
    assert parse("a OR b min_match:1 min_match:2").min_match == 2
    with pytest.raises(ValueError, match="OR connective"):
        parse("hash join min_match:2")  # AND
    with pytest.raises(ValueError, match="OR connective"):
        parse('"hash join" OR x min_match:2')  # phrases force AND
    with pytest.raises(ValueError, match="positive integer"):
        parse("a OR b min_match:0")
    with pytest.raises(ValueError, match="positive integer"):
        parse("a OR b min_match:x")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("msm_index"))
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


@pytest.mark.parametrize("q", MSM_QUERIES)
def test_msm_paths_agree(spark, built, corpus, q):
    parsed = parse(q, attr_fields=("lang", "source"))
    naive = [
        (r["doc_id"], r["score"])
        for r in engine.run_query(corpus, parsed).collect()
    ]
    wand = _rounded(search_wand(built, parsed))
    rel = _rounded(search_index_relational(built, parsed))
    assert naive == wand, f"WAND differs for {q!r}"
    assert naive == rel, f"index-relational differs for {q!r}"


def test_msm_matches_oracle(spark, built, duck):
    for q in MSM_QUERIES:
        parsed = parse(q, attr_fields=("lang", "source"))
        want = [
            (int(r[0]), float(r[1]))
            for r in duck.execute(oracles.bm25_sql(parsed)).fetchall()
        ]
        got = _rounded(search_wand(built, parsed))
        assert [d for d, _ in got] == [d for d, _ in want], q
        assert all(abs(a[1] - b[1]) < 1e-9 for a, b in zip(got, want)), q
        cgot = match_count(built, parsed).collect()[0][0]
        cwant = duck.execute(oracles.match_count_sql(parsed)).fetchone()[0]
        assert cgot == cwant, q


def test_msm_is_only_a_filter(spark, built, duck):
    """FROZEN (§3.20): the msm result is exactly the plain-OR result
    restricted to qualifying docs — scores identical doc for doc. The
    full plain-OR match set (no top-k cut) must contain the msm top-k
    with the same scores."""
    p_or = parse("hash OR join OR scan")
    p_msm = parse("hash OR join OR scan min_match:2")
    full_or = {
        int(r[0]): round(float(r[1]), 6)
        for r in duck.execute(
            oracles.bm25_sql(p_or, k=10_000_000)
        ).fetchall()
    }
    got = _rounded(search_wand(built, p_msm))
    assert got, "fixture regression: no 2-of-3 matches"
    for doc_id, score in got:
        assert full_or[doc_id] == score


def test_msm_one_equals_plain_or(spark, built):
    assert _rounded(search_wand(built, parse("hash OR join min_match:1"))) == (
        _rounded(search_wand(built, parse("hash OR join")))
    )


def test_msm_batch_equals_singles(spark, built, corpus):
    qs = {f"q{i}": parse(q) for i, q in enumerate(MSM_QUERIES[:6])}
    batch = search_wand_batch(built, qs, source_df=corpus.source)
    by_q: dict[str, list] = {}
    for r in batch.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 6))
        )
    for qid, p in qs.items():
        single = _rounded(search_wand(built, p, source_df=corpus.source))
        assert by_q.get(qid, []) == single, qid


def test_msm_hand_built_and_raises():
    """parse() rejects min_match under AND; a hand-built ParsedQuery
    must fail fast in the scorer itself (mirrors the OR-with-phrases
    guard) — score_shard is called directly because inside the engine
    it runs executor-side."""
    import dataclasses

    import numpy as np

    from xsearch_spark.operators.wand import score_shard

    p = dataclasses.replace(
        parse("hash OR join min_match:2"), connective="AND"
    )
    lists = {
        "hash": (
            np.array([1], np.int64),
            np.array([1], np.int32),
            np.array([3], np.int32),
        )
    }
    blocks = {"hash": (np.array([1], np.int64), np.array([1.0]))}
    with pytest.raises(ValueError, match="min_match requires OR"):
        score_shard(lists, blocks, {"hash": 1.0}, 3.0, p, 10)
