"""Query-side operators, relational path (SURVEY.md Q2, Q4–Q7, Q10).

This is the declarative twin of xsearch's searcher loop (analyze query ->
dictionary lookup -> DAAT scoring -> local top-k heap -> merge; [R],
SURVEY.md §3.2). In Spark the same semantics compile to:

  * Q2 dictionary lookup  -> ``filter(term IN (...))`` — a literal IN
    over the handful of query terms, pushed to the parquet scan.
  * Q4 AND                -> groupBy(doc_id) HAVING count(term) = k
    (postings are (term,doc_id)-unique, so count == countDistinct).
  * Q5 OR                 -> same aggregate without the HAVING.
  * Q6 BM25               -> pure Column arithmetic (functions.bm25).
  * Q7 top-k              -> orderBy(score desc, doc_id asc).limit(k),
    which Spark plans as TakeOrderedAndProject: a per-partition heap on
    executors plus a driver merge — exactly the reference's
    per-shard-heap + proxy-merge topology (Q9), for free.
  * Q10 doc fetch         -> inner join of the tiny top-k back to the
    source table (AQE broadcasts the top-k side).

Stats discipline at scale: per-term df for the few query terms is tiny
-> broadcast joined; (N, avgdl) are plain Python floats folded into the
expression as literals (no join at all). The only big-table join is
postings ⋈ doc_stats on doc_id when dl is not denormalized into the
index (the packed segment path stores dl per posting precisely to avoid
that join — see operators.segments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xsearch_spark.constants import DEFAULT_TOP_K
from xsearch_spark.functions.bm25 import bm25_weight_col, idf_col
from xsearch_spark.operators.build import CollectionStats
from xsearch_spark.plans.query import ParsedQuery


def score_postings(
    postings_df: DataFrame,
    term_stats_df: DataFrame,
    doc_stats_df: DataFrame | None,
    stats: CollectionStats,
    parsed: ParsedQuery,
) -> DataFrame:
    """Score candidate docs for the parsed query -> (doc_id, score).

    ``postings_df``: (term, doc_id, tf[, dl[, df]]). If ``dl`` is already
    a column (denormalized index), pass ``doc_stats_df=None`` and the big
    doc-stats join is skipped entirely. If ``df`` is also a column (v4
    index rows carry the global per-term df), the term-stats join is
    skipped too — the whole score is computed from the pruned scan.
    """
    if not parsed.terms:
        return postings_df.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    q = postings_df.filter(F.col("term").isin(list(parsed.terms)))
    if "df" not in q.columns:
        ts = term_stats_df.filter(F.col("term").isin(list(parsed.terms)))
        q = q.join(F.broadcast(ts), "term")
    if "dl" not in q.columns:
        if doc_stats_df is None:
            raise ValueError("postings lack dl and no doc_stats provided")
        q = q.join(doc_stats_df, "doc_id")
    idf = idf_col(stats.n_docs, F.col("df").cast("double"))
    w = bm25_weight_col(idf, F.col("tf"), F.col("dl"), stats.avgdl)
    scored = q.select("doc_id", "term", w.alias("w"))
    agg = scored.groupBy("doc_id").agg(
        F.sum("w").alias("score"), F.count(F.lit(1)).alias("n_terms")
    )
    if parsed.connective == "AND":
        agg = agg.filter(F.col("n_terms") == len(parsed.terms))
    return agg.select("doc_id", "score")


def phrase_match_col(tokens: "F.Column", phrase: tuple[str, ...]) -> "F.Column":
    """True iff the token array contains the phrase's terms at
    consecutive positions in order — a pure Column expression (exists
    over start offsets), the same shape as the DuckDB oracle's
    list_filter(generate_series) predicate."""
    k = len(phrase)
    idxs = F.sequence(F.lit(1), F.size(tokens) - F.lit(k - 1))

    def hit(i):
        cond = F.element_at(tokens, i) == phrase[0]
        for j in range(1, k):
            cond = cond & (F.element_at(tokens, i + F.lit(j)) == phrase[j])
        return cond

    return F.when(F.size(tokens) >= k, F.exists(idxs, hit)).otherwise(F.lit(False))


def apply_doc_filters(
    scored: DataFrame,
    postings_df: DataFrame,
    source_df: DataFrame | None,
    parsed: ParsedQuery,
    allowed_df: DataFrame | None = None,
    attr_allowed_dfs: list[DataFrame] | None = None,
    tokenized_df: DataFrame | None = None,
) -> DataFrame:
    """Q5b field filter (lang: / generic field:value) and NOT (-term) as
    semi/anti joins.

    ``allowed_df``: pre-computed (doc_id) allowlist for the lang filter —
    a v5 index passes the decoded synthetic attr posting here so the
    source table is never scanned; without it the allowlist comes from
    filtering ``source_df``. ``attr_allowed_dfs``: the same, one per
    ``parsed.attrs`` entry (positionally aligned); when absent the
    filters fall back to equality predicates on ``source_df`` (the
    naive/no-index path)."""
    out = scored
    if parsed.lang is not None:
        if allowed_df is not None:
            out = out.join(allowed_df.select("doc_id"), "doc_id", "left_semi")
        elif source_df is not None:
            allowed = source_df.filter(F.col("lang") == parsed.lang).select("doc_id")
            out = out.join(allowed, "doc_id", "left_semi")
        else:
            raise ValueError("lang: filter requires the source table")
    for i, (fld, val) in enumerate(getattr(parsed, "attrs", ())):
        adf = attr_allowed_dfs[i] if attr_allowed_dfs else None
        if adf is not None:
            out = out.join(adf.select("doc_id"), "doc_id", "left_semi")
        elif source_df is not None:
            from pyspark.sql.types import ArrayType

            col_type = dict(
                (f.name, f.dataType) for f in source_df.schema.fields
            ).get(fld)
            pred = (
                F.array_contains(F.col(fld), val)
                if isinstance(col_type, ArrayType)
                else F.col(fld) == val
            )  # multi-value attrs: membership, not equality
            out = out.join(
                source_df.filter(pred).select("doc_id"), "doc_id", "left_semi"
            )
        else:
            raise ValueError(f"{fld}: filter requires the source table")
    for ph in getattr(parsed, "phrases", ()):
        if tokenized_df is None:
            raise ValueError(
                "phrase filter on the no-index path requires the tokenized "
                "corpus (pass tokenized_df) — the index path reads the v6 "
                "positional stream instead"
            )
        match = tokenized_df.filter(
            phrase_match_col(F.col("tokens"), ph)
        ).select("doc_id")
        out = out.join(match, "doc_id", "left_semi")
    if parsed.exclude:
        bad = (
            postings_df.filter(F.col("term").isin(list(parsed.exclude)))
            .select("doc_id")
            .distinct()
        )
        out = out.join(bad, "doc_id", "left_anti")
    return out


def top_k(scored: DataFrame, k: int = DEFAULT_TOP_K) -> DataFrame:
    """Q7: exact top-k, ties by ascending doc_id -> TakeOrderedAndProject."""
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def fetch_docs(topk: DataFrame, source_df: DataFrame, cols: list[str]) -> DataFrame:
    """Q10: join the tiny top-k result back to the doc store. ``content``
    is never re-emitted (column pruning keeps it out of the scan)."""
    return topk.join(source_df.select("doc_id", *cols), "doc_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )


def search_relational(
    source_df: DataFrame,
    postings_df: DataFrame,
    term_stats_df: DataFrame,
    doc_stats_df: DataFrame | None,
    stats: CollectionStats,
    parsed: ParsedQuery,
    k: int = DEFAULT_TOP_K,
    tokenized_df: DataFrame | None = None,
) -> DataFrame:
    """Full Q1→Q7 pipeline over long-form postings -> (doc_id, score).
    ``tokenized_df``: (doc_id, tokens) — required only for phrase
    queries on this no-index path."""
    scored = score_postings(postings_df, term_stats_df, doc_stats_df, stats, parsed)
    scored = apply_doc_filters(
        scored, postings_df, source_df, parsed, tokenized_df=tokenized_df
    )
    return top_k(scored, k)
