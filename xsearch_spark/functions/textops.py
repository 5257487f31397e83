"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions over the frozen base tokenizer — no UDFs, so
every operator is whole-stage-codegen'd AND has an exact DuckDB SQL twin
(generated in xsearch_spark.oracles from the same constants/word lists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xsearch_spark.functions.tokenize import tokenize_base_col

# tiny per-language marker lexicons (n-gram heuristic fixture; the
# operator shape is what matters — swap lists for fastText at prod)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ich", "mit"],
    "en": ["the", "and", "of", "to", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "los", "se", "por"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "zh": ["de5", "shi4", "zai4", "you3", "wo3", "ta1", "le5", "bu4"],
}

# BPE-ish unit: word runs, digit runs, or single non-space symbols —
# identical semantics in Java regex (Spark) and RE2 (DuckDB)
BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = LANG_MARKERS["en"] + ["a", "in", "on", "at", "as", "by", "an", "be"]

FINGERPRINT_SHINGLE = 8  # char-level shingle width for winnowing-lite
# cap on hashed shingle positions per doc: stride = ceil(positions/cap).
# Without it a 100 KB doc costs ~100k md5 Column evals (round-1 advisor:
# the fingerprint dwarfed tokenization at scale); with it the cost is
# O(256) per doc regardless of length, deterministically.
FINGERPRINT_MAX_POSITIONS = 256


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit fraction over the token array."""
    toks = tokenize_base_col(text)
    n = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: (
            F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("double")
            / n.cast("double")
        )
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, lang_score): argmax language by marker
    fraction, ties broken alphabetically (deterministic)."""
    scores = lang_scores(F.col(text_col))
    # argmax via greatest + chained when (5 langs — fine as expressions)
    best = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    for lang in sorted(LANG_MARKERS):  # alphabetical: first match wins ties
        pred = F.when(
            pred.isNull() & (scores[lang] == best), F.lit(lang)
        ).otherwise(pred)
    return df.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("pred_lang"),
        F.round(best, 6).alias("lang_score"),
    )


def quality_features(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: char length, token count, mean token
    length, stopword ratio, punctuation ratio, digit ratio, uppercase
    ratio — the standard C4/Gopher-style filter inputs."""
    t = F.col(text_col)
    toks = tokenize_base_col(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    safe_tok = F.greatest(n_tok, F.lit(1)).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    punct = n_chars - F.length(F.regexp_replace(t, r"[^A-Za-z0-9_\s]", ""))
    digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    uppers = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
            )
            / safe_tok,
            6,
        ).alias("mean_tok_len"),
        F.round(stop.cast("double") / safe_tok, 6).alias("stopword_ratio"),
        F.round(punct.cast("double") / safe_chars, 6).alias("punct_ratio"),
        F.round(digits.cast("double") / safe_chars, 6).alias("digit_ratio"),
        F.round(uppers.cast("double") / safe_chars, 6).alias("upper_ratio"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """Composite [0,1] quality score from the features (fixed weights —
    a placeholder policy, the dataflow is the deliverable)."""
    feat = quality_features(df, text_col, id_col)
    score = (
        F.lit(1.0)
        - F.least(F.col("punct_ratio") * 2.0, F.lit(0.5))
        - F.least(F.col("digit_ratio"), F.lit(0.3))
    ) * F.least(F.col("n_tokens").cast("double") / 64.0, F.lit(1.0))
    return feat.select("doc_id", F.round(score, 6).alias("quality"))


def token_counts(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens): whitespace count + BPE-ish
    regex unit count (LLM-budget estimation)."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_REGEX), 0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
    )


def doc_fingerprint(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """Winnowing-lite fingerprint: min over strided char 8-gram shingles
    of md5(shingle). Stride = ceil(positions / FINGERPRINT_MAX_POSITIONS)
    — a deterministic function of doc length, so the oracle SQL computes
    the identical shingle set — bounding per-doc hash cost at ~256 md5
    evals whatever the doc size (bounded-stride winnowing; the every-
    position variant cost O(doc_len) md5 Column evals per row).
    Identical docs always collide; near-identical docs collide when the
    edit does not disturb the minimal strided shingle."""
    t = F.col(text_col)
    w = FINGERPRINT_SHINGLE
    p = F.greatest(F.length(t) - (w - 1), F.lit(1))
    stride = ((p + F.lit(FINGERPRINT_MAX_POSITIONS - 1)) / F.lit(FINGERPRINT_MAX_POSITIONS)).cast("int")
    positions = F.sequence(F.lit(1), p, stride)
    hashes = F.transform(positions, lambda i: F.md5(t.substr(i, F.lit(w))))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.array_min(hashes).alias("fingerprint"),
    )


def chunk_docs(
    df: DataFrame,
    text_col: str,
    max_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-bounded sliding chunks -> (doc_id, chunk_id, n_tokens,
    chunk_text, char_start, char_end, chunk_span) — the pre-training
    sequence-packing primitive (long docs split into model-window-sized
    pieces with ``overlap`` tokens of context carried across the
    boundary).

    Tokens are the frozen base analyzer; stride = max_tokens - overlap;
    chunk i covers tokens [i*stride+1, i*stride+max_tokens] (1-based
    slice bounds, matching SQL list_slice), emitted while
    i*stride < n_tokens, so the final chunk may be short but is never
    empty and every token lands in at least one chunk.

    Byte-span fidelity (round-5): ``char_start``/``char_end`` are the
    1-based inclusive character positions of the chunk's first/last
    token in the document, and ``chunk_span`` is the ORIGINAL substring
    ``substr(text, char_start, char_end - char_start + 1)`` — original
    whitespace/punctuation/case preserved, which is what a
    sequence-packing pipeline actually feeds the model (``chunk_text``,
    the space-joined lowered tokens, stays for analyzer-side uses).
    Positions are computed arithmetically: splitting lower(text) by
    TOKEN_RUN_REGEX (the exact complement of the tokenizer's split
    class) yields the separator runs sep_0 tok_1 sep_1 ... tok_n sep_n,
    so start(tok_i) = Σlen(sep_0..i-1) + Σlen(tok_1..i-1) + 1 — prefix
    sums over array slices, still pure Column expressions. Caveat:
    positions are measured on lower(text); they index the original text
    exactly whenever lowercasing is length-preserving (all of ASCII and
    the overwhelming mass of Unicode; the rare expanding case-pairs like
    U+0130 shift spans by the expansion amount).

    One tokenize, one sequence+explode, no shuffle, no UDF; at 100 TB
    this is a map-only stage that parallelizes with the scan."""
    from xsearch_spark.constants import TOKEN_RUN_REGEX

    stride = max_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than max_tokens")

    def len_sum(arr):  # Σ length over an array slice (0 on empty slice)
        return F.aggregate(arr, F.lit(0), lambda a, x: a + F.length(x))

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        tokenize_base_col(F.col(text_col)).alias("_toks"),
        F.split(F.lower(F.col(text_col)), TOKEN_RUN_REGEX).alias("_seps"),
    ).withColumn("_n", F.size("_toks"))
    toks = toks.filter(F.col("_n") > 0)
    out = toks.select(
        "doc_id",
        "_text",
        "_toks",
        "_seps",
        "_n",
        F.explode(
            F.sequence(
                F.lit(0), F.floor((F.col("_n") - 1) / F.lit(stride)).cast("long")
            )
        ).alias("chunk_id"),
    )
    fi = (F.col("chunk_id") * stride + 1).cast("int")  # first token, 1-based
    li = F.least(fi + F.lit(max_tokens - 1), F.col("_n").cast("int"))  # last
    sl = F.slice(F.col("_toks"), fi, max_tokens)
    char_start = (
        len_sum(F.slice(F.col("_seps"), 1, fi))
        + len_sum(F.slice(F.col("_toks"), 1, fi - F.lit(1)))
        + F.lit(1)
    )
    char_end = len_sum(F.slice(F.col("_seps"), 1, li)) + len_sum(
        F.slice(F.col("_toks"), 1, li)
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(sl).cast("long").alias("n_tokens"),
        F.array_join(sl, " ").alias("chunk_text"),
        char_start.cast("long").alias("char_start"),
        char_end.cast("long").alias("char_end"),
        F.col("_text")
        .substr(char_start, char_end - char_start + F.lit(1))
        .alias("chunk_span"),
    )
