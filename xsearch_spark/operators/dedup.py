"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's capability set (xsearch has only key-based upsert
dedup, S4 [R]); these are the standard corpus-dedup techniques a 100 TB
text pipeline needs, each expressed as declarative DataFrame ops so
Catalyst handles pushdown/partial-agg, with hashing built from ``md5``
(available and bit-identical in Spark and DuckDB — every operator here
is oracle-checkable as plain SQL).

Scale notes:
  * exact dedup — one hash-groupBy; the md5 key shuffles ~32 bytes/doc.
  * MinHash+LSH — the permutation trick uses the *lexicographic order
    of md5(seed:token)* as the random order (a hash order is a valid
    permutation for MinHash); signatures are ``min(md5)`` per (doc,
    seed): one explode + one groupBy. Banding concatenates rows of the
    signature and groupBys the band key — candidate pairs only ever
    join docs sharing a band bucket, never the full cross product.
  * n-gram Jaccard — exact verification on LSH candidates only (the
    pair set is bucket-bounded), via shingle-set joins.
  * SimHash — 64-bit: per (doc, bit) weighted sums over token md5 bits,
    fully as Column expressions (bit b of a hex digest = nibble >> ...).
  * embedding cosine near-dup lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) -> (content_hash, dup_count,
    min_doc_id keeper). Docs appearing once are excluded."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keeper_doc_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id doc per exact content group (the S4 analogue for
    content rather than keys)."""
    w_min = (
        df.select(F.md5(F.col(text_col)).alias("h"), F.col(id_col).alias("_id"))
        .groupBy("h")
        .agg(F.min("_id").alias("keep_id"))
    )
    return df.join(
        w_min, F.md5(F.col(text_col)) == F.col("h"), "inner"
    ).filter(F.col(id_col) == F.col("keep_id")).drop("h", "keep_id")


# ---------------------------------------------------------------------------
# tokens helper (shared with textops): the frozen base tokenizer


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from xsearch_spark.functions.tokenize import tokenize_base_col

    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_base_col(F.col(text_col))).alias("term"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, seed, minhash): minhash = min over the doc's DISTINCT
    word-``shingle_n``-gram set of md5(seed || ':' || shingle).
    String-min over a hash order is a valid MinHash permutation and is
    exactly reproducible in SQL. Shingles (not unigrams) so that word
    ORDER matters — unigram sets degenerate on small vocabularies.

    Shape (round-2 de-amplification): all ``num_hashes`` mins are
    computed as SEPARATE AGGREGATE COLUMNS over one pass of the shingle
    rows — map-side partial agg reduces each partition to one row per
    doc BEFORE the shuffle, so the shuffle carries |docs| x num_hashes
    hashes instead of |shingles| x num_hashes rows (the round-1 seed
    explode amplified the shuffle 16x). The wide row is then unpivoted
    with ``stack`` to keep the (doc_id, seed, minhash) contract. Still
    zero UDFs; the declarative explode form lives on in the SQL oracle
    and in ``minhash_signatures_exploded`` (parity-tested).
    """
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_n)
    stack = ", ".join(f"{i}, _h{i}" for i in range(num_hashes))
    return wide.selectExpr(
        "doc_id", f"stack({num_hashes}, {stack}) AS (seed, minhash)"
    )


def _minhash_wide(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """(doc_id, _h0.._h{n-1}): one min-aggregate column per seed."""
    sh = _shingles(df, text_col, id_col, shingle_n)
    aggs = [
        F.min(
            F.md5(F.concat_ws(":", F.lit(str(i)), F.col("shingle")))
        ).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures_exploded(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Round-1 declarative form (seed explode before the groupBy) — kept
    as the readable reference implementation; must equal
    :func:`minhash_signatures` row-for-row (tests/test_pipeline_ops.py)."""
    sh = _shingles(df, text_col, id_col, shingle_n).withColumnRenamed("shingle", "term")
    seeds = F.explode(F.array(*[F.lit(i) for i in range(num_hashes)])).alias("seed")
    expanded = sh.select("doc_id", "term", seeds)
    return (
        expanded.select(
            "doc_id",
            "seed",
            F.md5(F.concat_ws(":", F.col("seed").cast("string"), F.col("term"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding over the minhash signature: docs sharing any band
    bucket become candidate pairs (doc_a < doc_b). rows = bands*|docs|,
    join only within buckets — no cross product anywhere.

    Band keys are built straight from the wide signature row (md5 over
    the seed-ordered minhashes of each band) — no second groupBy, no
    collect_list; the whole operator is two aggregations (shingle
    distinct + signature) and one self-join.

    ``max_bucket_size``: skew guard for the within-bucket self-join. A
    corpus with a mega-cluster of near-identical docs (boilerplate,
    license files) puts them all in one bucket and the join goes
    quadratic in that bucket. Buckets above the cap are dropped (their
    docs are still pairable through their other bands); at 100 TB run
    with a cap (e.g. 10_000) and handle the dropped mega-buckets by
    exact-hash grouping instead. None (default) = exact LSH semantics,
    matching the SQL oracle.
    """
    rows_per_band = num_hashes // bands
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_n)
    band_rows = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.col(f"_h{b * rows_per_band + j}") for j in range(rows_per_band)],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    band_keys = wide.select(
        "doc_id", F.explode(F.array(*band_rows)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    if max_bucket_size is not None:
        sizes = band_keys.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        band_keys = (
            band_keys.join(sizes, ["band", "bucket"])
            .filter(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    a = band_keys.select(
        F.col("band"), F.col("bucket"), F.col("doc_id").alias("doc_a")
    )
    b = band_keys.select(
        F.col("band"), F.col("bucket"), F.col("doc_id").alias("doc_b")
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact, on candidate pairs)


def _shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct word n-grams per doc via a self-zip of the token array:
    transform over index range, all Column expressions."""
    from xsearch_spark.functions.tokenize import tokenize_base_col

    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize_base_col(F.col(text_col)).alias("t")
    )
    # shingle i = t[i] .. t[i+n-1]; sequence over 0 .. size-n
    sh = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - n),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(F.col("t"), i + j + 1) for j in range(n)]
                    ),
                ),
            ).otherwise(F.array())
        ).alias("shingle"),
    )
    return sh.distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| via a shingle
    join, |A∪B| = |A|+|B|-|A∩B|. Returns (doc_a, doc_b, jaccard)."""
    sh = _shingles(df, text_col, id_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # intersection sizes via a (shingle, doc) join restricted to the pairs
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(a_sh, "doc_a").join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .select("doc_a", "doc_b", "jaccard")
    )
    if threshold > 0.0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


# ---------------------------------------------------------------------------
# SimHash (64-bit, pure Column expressions)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash over tf-weighted token md5 bits -> (doc_id,
    simhash:bigint as the signed 64-bit value).

    bit b of token hash = bit (3 - b%4) of hex nibble b//4 of md5(term).
    The per-(doc, bit) vote is sum(tf * (2*bit - 1)); sign -> bit set.

    Shape (round-2 de-amplification): the 64 per-bit votes are 64
    AGGREGATE COLUMNS over one pass of the (doc, term, tf) rows — the
    round-1 form exploded every posting 64x before its groupBy, a 64x
    shuffle amplification; here map-side partial agg collapses each
    partition to one 64-long row per doc before the shuffle. The word is
    then assembled from the vote signs in a single projection. Still
    pure Column expressions (codegen'd, no UDF); the exploded form
    remains in ``simhash_exploded`` and in the SQL oracle (parity-
    tested).
    """
    toks = _tokens(df, text_col, id_col).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    h = toks.withColumn("h", F.md5("term"))
    # vote_b = sum(tf * (2*bitval_b - 1)); bitval_b from the hex digest
    vote_aggs = [
        F.sum(
            F.col("tf")
            * (
                F.expr(
                    f"shiftright(CAST(conv(substring(h, {b // 4 + 1}, 1), 16, 10) AS INT), {3 - b % 4}) % 2"
                )
                * 2
                - 1
            )
        ).alias(f"_v{b}")
        for b in range(bits)
    ]
    votes = h.groupBy("doc_id").agg(*vote_aggs)
    low63 = None
    for b in range(1, bits):
        term = F.when(F.col(f"_v{b}") > 0, F.lit(1 << (63 - b)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        low63 = term if low63 is None else (low63 + term)
    sign = F.when(F.col("_v0") > 0, F.lit(-(2**63)).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    return votes.select("doc_id", (low63 + sign).alias("simhash"))


def simhash_exploded(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """Round-1 declarative form (64x bit explode) — kept as the readable
    reference implementation; must equal :func:`simhash` row-for-row
    (tests/test_pipeline_ops.py)."""
    toks = _tokens(df, text_col, id_col).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    h = toks.withColumn("h", F.md5("term"))
    bit_ids = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    per_bit = h.select("doc_id", "tf", "h", bit_ids).withColumn(
        "nibble",
        F.conv(F.substring(F.col("h"), (F.col("bit") / 4).cast("int") + 1, 1), 16, 10).cast("int"),
    ).withColumn(
        # Python F.shiftright demands a literal int; the SQL form takes
        # expressions for both operands
        "bitval", F.expr("shiftright(nibble, 3 - CAST(bit % 4 AS INT)) % 2")
    )
    votes = per_bit.groupBy("doc_id", "bit").agg(
        F.sum(F.col("tf") * (F.col("bitval") * 2 - 1)).alias("vote")
    )
    # assemble: sum of 2^(63-bit) for positive votes, as the SIGNED 64-bit
    # value (bit 0 = sign bit): use a portable two-step — accumulate the
    # low 63 bits as a bigint and subtract 2^63 when bit 0 is set.
    out = votes.withColumn("set", (F.col("vote") > 0).cast("long")).groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("bit") > 0,
                F.col("set")
                * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(63 - bit AS INT))"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("low63"),
        F.max(F.when(F.col("bit") == 0, F.col("set")).otherwise(F.lit(0))).alias("sign"),
    )
    return out.select(
        "doc_id",
        (
            F.col("low63")
            + F.when(F.col("sign") == 1, F.lit(-(2**63)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash"),
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over the undirected pair graph ->
    (node, component) where component = min node id reachable.

    Min-label propagation to fixpoint — the one deliberately ITERATIVE
    operator in the engine (dedup clustering is transitive; no finite
    SQL join expresses closure): each sweep is ONE heavy action — the
    edges⋈labels join + min-aggregate (both shuffle on node id),
    materialized by an eager localCheckpoint that also truncates lineage
    so plans stay bounded. The convergence probe rides the SAME pass: a
    ``_chg`` flag (did any neighbor lower this node's label?) is
    computed inside the join and read back afterwards with a
    ``limit(1).count()`` over the already-checkpointed partitions — a
    short-circuiting local scan, never a second labels⋈labels shuffle
    join per sweep (the round-4 shape doubled the per-iteration shuffle
    cost). Near-dup graphs are shallow (clusters are cliques-ish from
    LSH buckets), so the diameter — and hence the sweep count — is
    small in practice; the standard alternating-star optimizations drop
    in here unchanged if ever needed.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` sweeps (a component whose min-node eccentricity exceeds
    the budget — e.g. a pathological chain graph): non-convergence must
    fail fast, because non-converged labels are silently WRONG keeper
    assignments (round-4 advisor finding).
    """
    e = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    edges = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    changed = 1
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F.col("node").alias("b"), F.col("comp").alias("bcomp")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("bcomp").alias("nbr"))
            .withColumnRenamed("a", "node")
        )
        # eager localCheckpoint = the sweep's one heavy action; `_chg`
        # (a neighbor carried a strictly smaller label) is evaluated in
        # the same pass so the probe below never re-runs the join
        new = labels.join(nbr, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("nbr"), F.col("comp"))).alias(
                "comp"
            ),
            (F.coalesce(F.col("nbr"), F.col("comp")) < F.col("comp")).alias("_chg"),
        ).localCheckpoint()
        # cheap probe: scan of the checkpointed partitions, short-circuits
        # on the first changed row (no shuffle, no join)
        changed = new.filter(F.col("_chg")).limit(1).count()
        labels = new.drop("_chg")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} sweeps — "
            f"component diameter exceeds the sweep budget (pathological "
            f"chain graph?); raise max_iter or switch to "
            f"large-star/small-star propagation"
        )
    return labels


def near_dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """The composed near-dup KEEP/DROP decision: LSH candidates ->
    exact n-gram Jaccard >= threshold -> connected components ->
    (doc_id, keeper_doc_id) for every doc in a qualifying cluster
    (keeper = min doc_id of the component; docs in no cluster are
    implicitly kept and not emitted). Pairwise dedup only finds edges —
    near-duplication is transitive (A~B, B~C drops both B and C even if
    A!~C directly), so the cluster step is what a 100 TB pipeline
    actually acts on. The threshold compares the 6-decimal-rounded
    Jaccard (engine/oracle float discipline)."""
    pairs = lsh_candidate_pairs(df, text_col, num_hashes=num_hashes, bands=bands)
    jp = ngram_jaccard_pairs(df, pairs, text_col, id_col, n)
    qual = jp.filter(F.round(F.col("jaccard"), 6) >= threshold).select(
        "doc_a", "doc_b"
    )
    comp = connected_components(qual)
    return comp.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("keeper_doc_id")
    )
