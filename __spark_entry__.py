"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every implemented operator from SURVEY.md §2 has an entry here; the
oracle SQL strings are generated from the same frozen constants the
engine uses (xsearch_spark.oracles), so tokenizer/BM25 parity holds by
construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xsearch_spark import engine, oracles
from xsearch_spark.constants import SCORE_ROUND_DECIMALS
from xsearch_spark.plans.query import parse

# ---------------------------------------------------------------------------
# corpus cache: the driver calls many queries() entries against the same
# (spark, sf_dir); postings/stats are shared across them.
_CORPUS_CACHE: dict[str, engine.Corpus] = {}


def _corpus(spark: SparkSession, sf_dir: str) -> engine.Corpus:
    if sf_dir not in _CORPUS_CACHE:
        _CORPUS_CACHE[sf_dir] = engine.corpus_from_documents(spark, sf_dir, cache=True)
    return _CORPUS_CACHE[sf_dir]


# FIXTURES.md §4 reference query set (documents/base slice)
_QUERY_SET = {
    "bm25_single_rare": "hash",
    "bm25_hot_term": "the",
    "bm25_and": "hash join",
    "bm25_or": "hash OR join",
    "bm25_field_filter": "lang:zh spark",
    "bm25_not": "hash -join",
    "bm25_and4": "scan merge window sort",
    "bm25_absent_term": "zzzznotaterm",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 AND query with doc
    fetch over the documents table."""
    corpus = engine.corpus_from_documents(spark, "/root/testdata/sf0.001")
    return engine.run_query_fetch(corpus, "hash join", ["lang", "source"])


# ---------------------------------------------------------------------------


def _q_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _corpus(spark, sf_dir).postings  # (term, doc_id, tf)


def _q_dl(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _corpus(spark, sf_dir)
    return c.doc_stats.select("doc_id", F.col("dl").cast("int").alias("dl"))


def _q_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _corpus(spark, sf_dir).term_stats  # (term, df)


def _q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _corpus(spark, sf_dir)
    return spark.createDataFrame(
        [(c.stats.n_docs, round(c.stats.avgdl, SCORE_ROUND_DECIMALS))],
        "n_docs long, avgdl double",
    )


def _make_bm25_query(qstr: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return engine.run_query(_corpus(spark, sf_dir), qstr)

    return run


def _q_topk_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return engine.run_query_fetch(_corpus(spark, sf_dir), "hash join", ["lang", "source"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "tokens_tf": _q_tf,
        "doc_len": _q_dl,
        "term_df": _q_df,
        "collection_stats": _q_stats,
        "topk_fetch": _q_topk_fetch,
    }
    for name, qstr in _QUERY_SET.items():
        q[name] = _make_bm25_query(qstr)
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {
        "tokens_tf": oracles.tf_sql(),
        "doc_len": oracles.dl_sql(),
        "term_df": oracles.df_sql(),
        "collection_stats": oracles.collection_stats_sql(),
        "topk_fetch": oracles.bm25_fetch_sql(parse("hash join"), ["lang", "source"]),
    }
    for name, qstr in _QUERY_SET.items():
        o[name] = oracles.bm25_sql(parse(qstr))
    return o
