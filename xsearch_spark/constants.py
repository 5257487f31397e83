"""Frozen semantic constants for the xsearch-capability engine.

This module is the single source of truth for every semantic degree of
freedom that the (empty) reference checkout would normally pin — see
FIXTURES.md §3. It is imported by:

  * the Spark engine (``xsearch_spark.functions`` / ``operators``),
  * the pure-NumPy oracle (``xsearch_spark.pyref``),
  * the DuckDB oracle-SQL generators (``__spark_entry__.py`` / tests).

Changing anything here invalidates all goldens (tests/goldens/) — see
FIXTURES.md §0.

Reference parity: BM25 parameterization k1=1.2, b=0.75 is pinned by the
driver contract (BASELINE.json:6, "same parameterization as xsearch's
searcher"). The idf variant is the Lucene/trec non-negative form, frozen
in FIXTURES.md §3.2 (the Go source is unavailable to verify — SURVEY.md
§0 open item).
"""

from __future__ import annotations

# --- BM25 (FIXTURES.md §3.2; BASELINE.json:6) ---------------------------
K1: float = 1.2
B: float = 0.75

# --- Tokenizer (FIXTURES.md §3.1) ----------------------------------------
# base variant: lowercase, split on this regex, drop empty tokens.
# Identical semantics in Python `re`, Java regex (Spark F.split) and
# DuckDB string_split_regex for this character class.
TOKEN_SPLIT_REGEX: str = r"[^a-z0-9_]+"

# The COMPLEMENT of TOKEN_SPLIT_REGEX: a maximal token run. Splitting
# the lowered text by THIS regex yields the inter-token separators
# (sep_0 tok_1 sep_1 ... tok_n sep_n, leading/trailing possibly empty)
# — the position arithmetic behind chunk byte spans (textops.chunk_docs)
# depends on the two regexes staying exact complements.
TOKEN_RUN_REGEX: str = r"[a-z0-9_]+"

# code variant additionally emits sub-tokens of compound identifiers
# (snake_case on '_', camelCase at lower->upper boundaries), lowercased,
# compound kept first (Lucene WordDelimiter preserve_original style).
CAMEL_BOUNDARY_REGEX: str = r"(?<=[a-z0-9])(?=[A-Z])"

# cjk variant (analyzer-plugin parity: xsearch ships a Chinese word
# segmenter plugin): base tokens of the full text, plus overlapping
# character bigrams of every CJK run (single-char runs emit the char) —
# the Lucene CJKAnalyzer indexing model, chosen over a dictionary
# segmenter because it is deterministic and exactly reproducible in SQL.
# \x{...} class works in BOTH Java regex (Spark) and RE2 (DuckDB);
# Python re needs the \u form.
CJK_RUN_REGEX_ENGINE: str = r"[\x{4e00}-\x{9fff}]+"
CJK_RUN_REGEX_PY: str = "[\u4e00-\u9fff]+"

# --- Posting codec (FIXTURES.md §3.4) ------------------------------------
# LEB128 varint: 7 bits/byte, little-endian, high bit = continuation.
# docIDs: sorted ascending, unique; delta-encoded with the first value
# kept absolute. tfs: plain varint stream aligned by position (no delta).
BLOCK_SIZE: int = 128  # postings per block-max block

# --- Query semantics (FIXTURES.md §3.3) ----------------------------------
DEFAULT_TOP_K: int = 10
# top-k ordering: score DESC, doc_id ASC (ties broken by ascending doc_id)
SCORE_ROUND_DECIMALS: int = 6  # oracle score comparison precision

# --- Attribute postings (index layout v5) --------------------------------
# Per-doc attributes (lang) are indexed as SYNTHETIC posting lists so a
# ``lang:X`` filter is a bucket-pruned INDEX read intersected by the
# existing machinery — never a per-query scan+shuffle of the source
# table (round-3 verdict: the one plan that did O(corpus) work per
# query at 10^12 docs). The prefix byte cannot appear in any analyzed
# token (every tokenizer variant emits only [a-z0-9_]+ / CJK chars), so
# synthetic terms can never collide with real ones. Synthetic postings
# carry tf=0, dl=0: they are filter carriers, never scored, and tf=0
# keeps them out of the sum_tf-derived avgdl by construction.
# \x01, NOT \x00: pandas' string hash table (factorize, on the pack
# path) hashes null-terminated C strings, silently collapsing distinct
# terms that differ only after an embedded NUL.
ATTR_TERM_PREFIX: str = "\x01"


def attr_term(fld: str, value: str) -> str:
    """The synthetic index term for attribute ``fld = value``."""
    return f"{ATTR_TERM_PREFIX}{fld}:{value}"


# --- Skew handling (SURVEY.md B5, §4) ------------------------------------
# Terms whose document frequency exceeds this fraction of total postings
# divided by the shuffle partition count are "hot" and get salted.
HOT_TERM_SALT_BUCKETS: int = 8

# --- idf -------------------------------------------------------------------


def idf(N: int, df: int) -> float:
    """Lucene-style non-negative idf: ln(1 + (N - df + 0.5)/(df + 0.5)).

    FROZEN in FIXTURES.md §3.2. Shared formula string for SQL oracles is
    built by :func:`idf_sql`.
    """
    import math

    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def idf_sql(n_expr: str, df_expr: str) -> str:
    """The idf formula as an ANSI-SQL expression (ln is ln in both Spark
    SQL and DuckDB)."""
    return f"ln(1.0 + ({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5))"


def bm25_weight_sql(idf_expr: str, tf_expr: str, dl_expr: str, avgdl_expr: str) -> str:
    """The BM25 per-(term,doc) weight as an ANSI-SQL expression."""
    return (
        f"({idf_expr}) * ({tf_expr}) * ({K1} + 1.0) / "
        f"(({tf_expr}) + {K1} * (1.0 - {B} + {B} * ({dl_expr}) / ({avgdl_expr})))"
    )
