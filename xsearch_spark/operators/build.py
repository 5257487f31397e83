"""Index-build operators B1–B3 (SURVEY.md §2.3): posting construction,
doc lengths, collection statistics.

Reference parity: xsearch builds an in-memory ``term -> []posting`` map
per shard and tracks per-doc lengths + global stats (component-level
[R]; pinned shape BASELINE.json:6 "partition-local posting-list
construction (term -> sorted docID runs with term frequencies and doc
lengths)").

Scale notes:
  * B1 is ``explode + groupBy(term, doc_id).count()`` — Catalyst plans a
    partial (map-side) HashAggregate before the shuffle, so the shuffle
    carries one row per *distinct* (term, doc_id), not per token
    occurrence. That partial-agg is the Spark analogue of xsearch's
    shard-local posting map.
  * dl is computed pre-explode via ``F.size(tokens)`` (no extra shuffle).
  * df/N/avgdl are one extra aggregation over the deduplicated postings.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xsearch_spark.functions.tokenize import tokenize_df


def with_tokens(df: DataFrame, text_col: str, variant: str = "base") -> DataFrame:
    """A1/A2: attach ``tokens`` and ``dl`` (post-filter token count)."""
    return tokenize_df(df, text_col, variant).withColumn("dl", F.size("tokens"))


def postings(tokenized: DataFrame, doc_id_col: str = "doc_id") -> DataFrame:
    """B1: (doc_id, tokens) -> (term, doc_id, tf).

    Map-side partial aggregation collapses repeated tokens before the
    shuffle; the output is the long (relational) form of the inverted
    index.
    """
    return (
        tokenized.select(F.col(doc_id_col).alias("doc_id"), F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def postings_with_dl(tokenized: DataFrame, doc_id_col: str = "doc_id") -> DataFrame:
    """B1+B2 in ONE tokenize pass: (term, doc_id, tf, dl). dl rides the
    groupBy key (constant per doc), so no postings⋈doc_stats join and no
    second evaluation of the tokenizer UDF — at 100 TB the tokenizer is
    the most expensive stage and must run exactly once."""
    return (
        tokenized.select(
            F.col(doc_id_col).alias("doc_id"), "dl", F.explode("tokens").alias("term")
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
        .select("term", "doc_id", "tf", "dl")
    )


def count_batch(texts, ids, variant: str, with_positions: bool = False):
    """Tokenize+count one Arrow batch -> (terms, doc_ids, tfs, dls) numpy
    arrays sorted by doc_id. Shared by the fused postings UDF and the
    one-pass segment packer. Returns None for an all-empty batch.

    ``with_positions`` (index layout v6): additionally return a fifth
    array ``pos_flat`` — the 1-based token-stream positions of every
    occurrence, grouped per returned posting in posting order (posting
    j's positions are ``pos_flat[cumsum(tfs)[j-1]:cumsum(tfs)[j]]``,
    ascending). Position = index in the analyzer's EMITTED token stream
    (frozen; equals the filtered-token index for the base variant, which
    is what the SQL oracle reproduces)."""
    import itertools

    import numpy as np
    import pandas as pd

    from xsearch_spark.functions.tokenize import _code_tokenize_series

    if variant == "base":
        token_lists = texts.fillna("").str.lower().str.findall(r"[a-z0-9_]+")
    elif variant == "cjk":
        # per-row Python is acceptable here: this variant is the plugin-
        # parity path (swap in a real segmenter at prod); the bigram
        # expansion itself is O(len) string slicing
        from xsearch_spark.functions.tokenize import tokenize_cjk_py

        token_lists = texts.fillna("").map(tokenize_cjk_py)
    else:
        token_lists = _code_tokenize_series(texts)
    lens = token_lists.map(len).to_numpy(np.int64)
    total = int(lens.sum())
    if total == 0:
        return None
    row_idx = np.repeat(np.arange(len(ids)), lens)
    all_tok = np.fromiter(
        itertools.chain.from_iterable(token_lists), dtype=object, count=total
    )
    # count (row, term) pairs on INTEGER keys: factorize terms to codes
    # (C-speed hash) and unique the combined int64 key — avoids an
    # O(n log n) Python-string comparison sort
    codes, uniques = pd.factorize(all_tok)
    n_codes = len(uniques)
    combined = row_idx * np.int64(n_codes) + codes
    u, counts = np.unique(combined, return_counts=True)
    r = (u // n_codes).astype(np.int64)
    c = (u % n_codes).astype(np.int64)
    out = (
        np.asarray(uniques, dtype=object)[c],
        ids[r],
        counts.astype(np.int64),
        lens[r],
    )
    if not with_positions:
        return out
    # positions: stable-sort the token stream by (row, code) key — within
    # a group the original (ascending-position) order is preserved, so
    # the sorted position column is already grouped per posting in the
    # same order np.unique returned the postings
    doc_starts = np.cumsum(lens) - lens
    pos = np.arange(total, dtype=np.int64) - doc_starts[row_idx] + 1
    order = np.argsort(combined, kind="stable")
    return out + (pos[order],)


def postings_with_dl_fused(
    source_df: DataFrame,
    text_col: str,
    doc_id_col: str = "doc_id",
    variant: str = "base",
    positions: bool = False,
) -> DataFrame:
    """B1+B2 fused INTO the tokenizer UDF: source -> (term, doc_id, tf,
    dl) in one ``mapInPandas``, no explode, no shuffle, no JVM hash-agg.

    Why: a (term, doc_id) group is complete inside one document, so tf
    counting never needs cross-partition data — the declarative
    explode+groupBy shuffles ~40M freshly-allocated JVM strings only to
    re-group what the tokenizer already had together. At local[32] that
    allocation storm made the JVM GC the serial bottleneck (measured:
    sha2-style allocation-heavy stages stop scaling past 8 threads while
    low-allocation stages hit 1.9x). Counting is NumPy-vectorized
    (repeat + lexsort + run-length encode) per Arrow batch: no per-row
    Python, and the JVM only ever sees the final compact postings.

    Must produce exactly the rows of :func:`postings_with_dl` (tested).

    ``positions`` (v6): add a ``poss`` array<long> column — the
    per-posting 1-based position list — so a streaming micro-batch can
    pack a positional epoch (``build_segments`` -> ``_pack_frame``
    re-encodes it into the varint stream).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    fields = [
        StructField("term", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", IntegerType(), False),
        StructField("dl", IntegerType(), False),
    ]
    if positions:
        fields.append(StructField("poss", ArrayType(LongType()), False))
    schema = StructType(fields)

    def it(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            res = count_batch(
                pdf[text_col],
                pdf[doc_id_col].to_numpy(np.int64),
                variant,
                with_positions=positions,
            )
            if res is None:
                continue
            if positions:
                terms, doc_ids, tfs, dls, flat = res
            else:
                terms, doc_ids, tfs, dls = res
            out = pd.DataFrame(
                {
                    "term": terms,
                    "doc_id": doc_ids,
                    "tf": tfs.astype(np.int32),
                    "dl": dls.astype(np.int32),
                }
            )
            if positions:
                out["poss"] = pd.Series(
                    np.split(flat, np.cumsum(tfs)[:-1]), dtype=object
                )
            yield out

    out = source_df.select(doc_id_col, text_col)
    # the tokenizer must not be gated by coarse input splits (a 200 MB
    # parquet = 2 natural partitions = 2 busy cores); fan out first
    par = source_df.sparkSession.sparkContext.defaultParallelism
    if out.rdd.getNumPartitions() < par:
        out = out.repartition(par * 2)
    return out.mapInPandas(it, schema)


def doc_stats(tokenized: DataFrame, doc_id_col: str = "doc_id") -> DataFrame:
    """B2: (doc_id, dl) — token count after the filter chain."""
    return tokenized.select(F.col(doc_id_col).alias("doc_id"), F.col("dl"))


def term_stats(postings_df: DataFrame) -> DataFrame:
    """B3 per-term df. (term, doc_id) is unique post-B1, so a plain
    count() equals countDistinct(doc_id) without the expensive distinct
    machinery."""
    return postings_df.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


@dataclass(frozen=True)
class CollectionStats:
    n_docs: int
    avgdl: float


def collection_stats(docs_stats_df: DataFrame) -> CollectionStats:
    """B3 global scalars: N and avgdl (mean dl over ALL docs).

    avgdl is computed as exact-integer sum(dl) divided once in float64 —
    bit-identical across Spark, Python and DuckDB regardless of
    summation order (a float-typed avg() would be order-dependent at the
    last ulp; SURVEY.md §5.2 float discipline).
    """
    row = docs_stats_df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    n = int(row["n"])
    avgdl = (int(row["s"]) / n) if n else 0.0
    return CollectionStats(n_docs=n, avgdl=avgdl)
