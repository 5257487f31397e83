"""Round-6 synonym expansion (FIXTURES.md §3.21): the rewrite is a
pure boolean-group (§3.19) construction, so the binding test is
STRUCTURAL — parse(q, synonyms=...) must equal the explicitly grouped
query dataclass-for-dataclass; one engine run confirms the rewrite
serves through the same paths."""

from __future__ import annotations

import pytest

from xsearch_spark.plans.query import parse

SYN = {"hash": ["digest", "checksum"], "join": ["merge"]}


def test_synonym_rewrite_equals_explicit_group():
    assert parse("hash sort", synonyms=SYN) == parse(
        "(hash OR digest OR checksum) sort"
    )
    # both terms expand; group order follows term order
    assert parse("hash join", synonyms=SYN) == parse(
        "(hash OR digest OR checksum) (join OR merge)"
    )
    # OR connective: groups stay member bags under OR on both sides
    assert parse("hash OR sort", synonyms=SYN) == parse(
        "(hash OR digest OR checksum) OR sort"
    )
    # min_match composes: the expanded term's group is ONE clause
    assert parse("hash OR sort OR scan min_match:2", synonyms=SYN) == parse(
        "(hash OR digest OR checksum) OR sort OR scan min_match:2"
    )


def test_synonym_scope_is_plain_positive_terms_only():
    # excluded terms never expand
    assert parse("sort -hash", synonyms=SYN) == parse("sort -hash")
    # existing group members never expand (one-level rewrite)
    assert parse("(hash OR scan) sort", synonyms=SYN).groups == (
        ("hash", "scan"),
    )
    # phrase members never expand (scoring terms stay plain)
    p = parse('"hash join" spark', synonyms={"spark": ["flink"]})
    assert p.phrases == (("hash", "join"),)
    assert p.groups == (("spark", "flink"),)
    assert p.terms == ("hash", "join")
    # prefix/fuzzy bodies never expand
    assert parse("hash* sort", synonyms=SYN).prefixes == ("hash",)
    assert parse("hash~1 sort", synonyms=SYN).fuzzies == ("hash",)
    # attr values never expand
    assert parse("lang:hash sort", synonyms=SYN).lang == "hash"


def test_synonym_normalization_and_degenerates():
    # keys and values analyze with the variant (case folds)
    assert parse("Hash sort", synonyms={"HASH": ["Digest"]}) == parse(
        "(hash OR digest) sort"
    )
    # self-synonym / empty alternatives collapse to the plain term
    assert parse("hash", synonyms={"hash": ["hash"]}) == parse("hash")
    assert parse("hash", synonyms={"hash": []}) == parse("hash")
    # compound values contribute all emitted terms (code variant)
    assert parse("foo", "code", synonyms={"foo": ["barBaz"]}) == parse(
        "(foo OR barbaz OR bar OR baz)", "code"
    )
    # a key that analyzes to 2+ terms is ambiguous -> raise
    with pytest.raises(ValueError, match="exactly one term"):
        parse("hash", synonyms={"foo bar": ["x"]})
    # duplicate expansion groups dedup
    assert parse("hash hash sort", synonyms=SYN).groups == (
        ("hash", "digest", "checksum"),
    )


def test_synonym_rewrite_serves_engine_paths(spark, duck):
    """The rewrite is groups, and groups are gated everywhere — one
    naive-path run against the group oracle closes the loop."""
    from tests.conftest import SF_DIR
    from xsearch_spark import engine, oracles

    corpus = engine.corpus_from_documents(spark, SF_DIR)
    p = parse("hash sort", synonyms={"hash": ["join"]})
    got = [
        (r["doc_id"], r["score"])
        for r in engine.run_query(corpus, p).collect()
    ]
    want = [
        (int(a), float(b))
        for a, b in duck.execute(
            oracles.bm25_sql(parse("(hash OR join) sort"))
        ).fetchall()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a[1] - b[1]) < 1e-9 for a, b in zip(got, want))
