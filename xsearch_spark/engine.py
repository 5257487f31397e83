"""High-level facade: build the in-flight (no materialized index) BM25
pipeline over a document DataFrame and answer queries — the M1
end-to-end slice (SURVEY.md §7), and the component layer the
index-backed path plugs into.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xsearch_spark.constants import DEFAULT_TOP_K, SCORE_ROUND_DECIMALS
from xsearch_spark.operators import build, search
from xsearch_spark.plans.query import ParsedQuery, parse
from xsearch_spark.sources.io import read_documents


@dataclass
class Corpus:
    """Tokenized corpus + derived stats, all lazy except the two scalars."""

    source: DataFrame  # with doc_id (+ lang when present)
    tokenized: DataFrame
    postings: DataFrame
    doc_stats: DataFrame
    term_stats: DataFrame
    stats: build.CollectionStats
    variant: str = "base"


def corpus_from_df(
    df: DataFrame, text_col: str, variant: str = "base", cache: bool = False
) -> Corpus:
    tok = build.with_tokens(df, text_col, variant)
    post = build.postings(tok)
    if cache:
        post = post.persist()
    dstats = build.doc_stats(tok)
    tstats = build.term_stats(post)
    cstats = build.collection_stats(dstats)
    return Corpus(df, tok, post, dstats, tstats, cstats, variant)


def corpus_from_documents(spark: SparkSession, sf_dir: str, cache: bool = False) -> Corpus:
    return corpus_from_df(read_documents(spark, sf_dir), "text", "base", cache)


def run_query(
    corpus: Corpus, query: str | ParsedQuery, k: int = DEFAULT_TOP_K
) -> DataFrame:
    """Parse + score + filter + exact top-k -> (doc_id, score) with the
    score rounded to the frozen oracle precision AFTER ordering by the
    raw float64 value (FIXTURES.md §3.3)."""
    parsed = parse(query, corpus.variant) if isinstance(query, str) else query
    topk = search.search_relational(
        corpus.source,
        corpus.postings,
        corpus.term_stats,
        corpus.doc_stats,
        corpus.stats,
        parsed,
        k,
        tokenized_df=corpus.tokenized,
    )
    return topk.select(
        "doc_id", F.round(F.col("score"), SCORE_ROUND_DECIMALS).alias("score")
    )


def run_query_fetch(
    corpus: Corpus, query: str | ParsedQuery, fetch_cols: list[str], k: int = DEFAULT_TOP_K
) -> DataFrame:
    parsed = parse(query, corpus.variant) if isinstance(query, str) else query
    topk = search.search_relational(
        corpus.source,
        corpus.postings,
        corpus.term_stats,
        corpus.doc_stats,
        corpus.stats,
        parsed,
        k,
        tokenized_df=corpus.tokenized,
    )
    fetched = search.fetch_docs(topk, corpus.source, fetch_cols)
    return fetched.select(
        "doc_id",
        F.round(F.col("score"), SCORE_ROUND_DECIMALS).alias("score"),
        *fetch_cols,
    )


def percolate(
    corpus: Corpus, queries: "dict[str, str | ParsedQuery]"
) -> DataFrame:
    """Percolation / reverse search (round-6, FIXTURES.md §3.32): for
    a REGISTERED query set, which docs match which query ->
    (query_id, doc_id), the FULL match set per query — the
    ES-percolator / streaming-router shape ("which alert rules does
    this incoming doc trigger").

    FROZEN semantics: a (query_id, doc_id) row appears iff the doc is
    in the query's §3.2–§3.31 match set — percolation introduces NO
    new match semantics, it is the same one match truth per query
    (match-only: scores are a search concern, routing is membership).
    An empty registry raises.

    Scale shape: the M registered queries become an M-fold UNION of
    the naive match plans over the incoming doc batch — one Spark job,
    each branch pruned to its own query terms. This is the
    right-sized topology for the router use case (M small, batches
    micro); a large-M registry would index the QUERIES instead (the
    real percolator trade), which this engine states as the honest
    boundary rather than pretending the union scales in M.
    """
    if not queries:
        raise ValueError("percolate requires a non-empty query registry")
    parts = []
    for qid, q in queries.items():
        parsed = parse(q, corpus.variant) if isinstance(q, str) else q
        parts.append(
            run_query(corpus, parsed, k=2**31 - 1).select(
                F.lit(qid).alias("query_id"), "doc_id"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
