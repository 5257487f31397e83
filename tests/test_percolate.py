"""Round-6 §3.32 percolation / reverse search: the (query_id, doc_id)
routing set vs the UNION-ALL DuckDB oracle, composition across the
query-language features, no-match and guard behavior."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from xsearch_spark import engine, oracles
from xsearch_spark.plans.query import parse


@pytest.fixture(scope="module")
def corpus(spark):
    return engine.corpus_from_documents(spark, SF_DIR)


def test_percolate_matches_oracle(spark, corpus, duck):
    """Every registered query routes exactly its oracle match set —
    phrases, prefixes, boolean groups, attrs, exclusions, msm and
    proximity all compose (each branch IS the one match truth)."""
    qs = {
        "r1": parse("hash join"),
        "r2": parse('lang:en "scan merge"'),
        "r3": parse("d* -dup"),
        "r4": parse("(hash OR join) sort"),
        "r5": parse("zzz qqq"),  # no matching docs
        "r6": parse("the OR scan OR join min_match:2"),
        "r7": parse('"hash join"~2'),
    }
    got = sorted(
        (r["query_id"], r["doc_id"])
        for r in engine.percolate(corpus, qs).collect()
    )
    want = sorted(
        (r[0], int(r[1]))
        for r in duck.execute(oracles.percolate_sql(qs)).fetchall()
    )
    assert got == want and len(got) > 0
    assert not any(q == "r5" for q, _ in got)


def test_percolate_string_queries_use_corpus_variant(spark, corpus, duck):
    """String entries parse with the corpus variant — identical to
    pre-parsed entries (the engine.run_query convention)."""
    got_s = sorted(
        (r["query_id"], r["doc_id"])
        for r in engine.percolate(corpus, {"a": "hash join"}).collect()
    )
    got_p = sorted(
        (r["query_id"], r["doc_id"])
        for r in engine.percolate(corpus, {"a": parse("hash join")}).collect()
    )
    assert got_s == got_p and len(got_s) > 0


def test_percolate_code_variant(spark):
    """A code-variant corpus routes with code-analyzer semantics:
    a compound registered query matches via compound + subtokens,
    identical to the per-query naive evaluation."""
    rows = [
        (0, "def parse_config(x): return x"),
        (1, "import config\nparse(config)"),
        (2, "nothing here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    corpus = engine.corpus_from_df(docs, "content", "code")
    qs = {"r1": "parse_config", "r2": "config -import"}
    got = sorted(
        (r["query_id"], r["doc_id"])
        for r in engine.percolate(corpus, qs).collect()
    )
    want = []
    for qid, q in qs.items():
        want.extend(
            (qid, r["doc_id"])
            for r in engine.run_query(corpus, q, k=10**6).collect()
        )
    assert got == sorted(want)
    # compound expands: doc 1 contains subtoken matches for r1's parts
    # but not the compound itself under AND — pin the actual routing
    assert ("r1", 0) in got and ("r2", 0) in got and ("r2", 1) not in got


def test_percolate_guards(spark, corpus):
    with pytest.raises(ValueError, match="non-empty"):
        engine.percolate(corpus, {})
    with pytest.raises(ValueError, match="non-empty"):
        oracles.percolate_sql({})
