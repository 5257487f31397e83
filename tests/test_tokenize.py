"""Tokenizer spec cases (FIXTURES.md §3.1) + Spark/Python/DuckDB parity."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from xsearch_spark.constants import TOKEN_SPLIT_REGEX
from xsearch_spark.functions.tokenize import (
    _code_tokenize_series,
    tokenize_base_py,
    tokenize_code_py,
    tokenize_df,
)


def test_base_spec_cases():
    assert tokenize_base_py("Hello, World!") == ["hello", "world"]
    assert tokenize_base_py("") == []
    assert tokenize_base_py("   ") == []
    assert tokenize_base_py("a_b c-d") == ["a_b", "c", "d"]
    assert tokenize_base_py("x1 2y _z_") == ["x1", "2y", "_z_"]
    assert tokenize_base_py("...!!!") == []


def test_code_spec_cases():
    # snake_case: compound kept, sub-tokens appended
    assert tokenize_code_py("parse_config") == ["parse_config", "parse", "config"]
    # camelCase
    assert tokenize_code_py("parseConfig") == ["parseconfig", "parse", "config"]
    # mixed
    assert tokenize_code_py("getHTTPResponse_v2") == [
        "gethttpresponse_v2",
        "get",  # boundary only at lower->upper: 'tH' splits, 'PR' does not
        "httpresponse",
        "v2",
    ]
    # non-compound: emitted once
    assert tokenize_code_py("def foo(bar):") == ["def", "foo", "bar"]
    # digits inside identifiers
    assert tokenize_code_py("base64Encode") == ["base64encode", "base64", "encode"]


def test_code_udf_matches_py():
    texts = [
        "def parse_config(fooBar, baz_qux): return fooBar",
        "",
        "class HTTPServer: pass",
        "x = snake_case + camelCaseName",
    ]
    got = _code_tokenize_series(pd.Series(texts)).tolist()
    assert got == [tokenize_code_py(t) for t in texts]


def test_spark_base_matches_py(spark):
    texts = ["Hello, World!", "a_b c-d", "", "Mixed CASE text_1"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["tokens"] for r in tokenize_df(df, "text").select("tokens").collect()]
    assert got == [tokenize_base_py(t) for t in texts]


def test_spark_code_matches_py(spark):
    texts = ["def parse_config(fooBar):", "class HTTPServer: pass", ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["tokens"]
        for r in tokenize_df(df, "text", variant="code").select("tokens").collect()
    ]
    assert got == [tokenize_code_py(t) for t in texts]


def test_duckdb_base_parity(duck):
    texts = ["Hello, World!", "a_b c-d", "Mixed CASE text_1"]
    for t in texts:
        rows = duck.execute(
            "SELECT u FROM (SELECT unnest(string_split_regex(lower(?), ?)) u) WHERE u <> ''",
            [t, TOKEN_SPLIT_REGEX],
        ).fetchall()
        assert [r[0] for r in rows] == tokenize_base_py(t)


def test_cjk_bigrams_py():
    from xsearch_spark.functions.tokenize import tokenize_cjk_py

    assert tokenize_cjk_py("hello 世界 搜索引擎 单 x") == [
        "hello", "x", "世界", "搜索", "索引", "引擎", "单",
    ]
    # CJK chars are separators for the base tokens; runs bigram'd in order
    assert tokenize_cjk_py("abc中文def") == ["abc", "def", "中文"]
    assert tokenize_cjk_py("") == []
    assert tokenize_cjk_py("纯中文测试") == ["纯中", "中文", "文测", "测试"]


def test_spark_cjk_matches_py(spark):
    from xsearch_spark.functions.tokenize import tokenize_cjk_py

    texts = ["hello 世界 spark", "单", "mixed中文and英文words混合 abc_def", "", "no cjk"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        sorted(r["tokens"])
        for r in tokenize_df(df, "text", variant="cjk").select("tokens").collect()
    ]
    # order differs (base then bigrams both sides — same rule); compare sorted
    assert got == [sorted(tokenize_cjk_py(t)) for t in texts]


def test_cjk_query_analyzer_roundtrip(spark):
    """A3 on the cjk variant: an exact CJK phrase query matches the doc
    through the full relational pipeline (query bigrams == index bigrams)."""
    from xsearch_spark import engine

    rows = [
        (0, "分布式搜索引擎", "zh", "wiki", 7),
        (1, "搜索很有趣", "zh", "wiki", 5),
        (2, "nothing chinese here", "en", "web", 20),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    corpus = engine.corpus_from_df(df, "text", variant="cjk")
    got = [r["doc_id"] for r in engine.run_query(corpus, "搜索引擎").collect()]
    assert got and got[0] == 0  # full-phrase bigrams only all match doc 0


def test_duckdb_code_tokenizer_parity():
    """The RE2 backreference formulation of the code analyzer
    (oracles.corpus_ctes_code — RE2 has no lookarounds, so the camel
    boundary is '([a-z0-9])([A-Z])' -> '\\1 \\2' instead of the engine's
    lookaround regex) must be token-multiset-identical to
    tokenize_code_py on adversarial identifiers."""
    from collections import Counter

    import duckdb

    from xsearch_spark.functions.tokenize import tokenize_code_py
    from xsearch_spark.oracles import corpus_ctes_code

    samples = [
        "hash_join fooBar parse_config XMLHttpRequest a",
        "_foo_ __ camelCase snake_case_long x9y",
        "ABCdef aB a_B_c9 _9x_",
        "", "justoneword", "UPPER lower Mixed_Case99",
    ]
    con = duckdb.connect()
    values = ", ".join(
        f"({i}, '{s}')" for i, s in enumerate(samples)  # samples have no quotes
    )
    con.execute(f"CREATE VIEW d AS SELECT * FROM (VALUES {values}) t(doc_id, text)")
    rows = con.execute(
        f"WITH {corpus_ctes_code('d')} SELECT doc_id, term FROM tok"
    ).fetchall()
    got: dict[int, list] = {}
    for i, t in rows:
        got.setdefault(i, []).append(t)
    for i, s in enumerate(samples):
        assert Counter(got.get(i, [])) == Counter(tokenize_code_py(s)), repr(s)


def test_compound_transform_spark_duckdb_parity(spark):
    """The snake_case compound-fusing transform (the code-shaped derived
    corpus for the driver gate) must agree byte-for-byte between Spark
    ($1_$2) and DuckDB ('\\1_\\2' + 'g')."""
    import duckdb
    from pyspark.sql import functions as F

    from xsearch_spark.oracles import COMPOUND_PAIR_REGEX

    texts = [
        "key agg row scan slow fast table",
        "a b c d e",
        "one",
        "",
        "x y  z w",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r[0]
        for r in df.select(
            F.regexp_replace("text", COMPOUND_PAIR_REGEX, "$1_$2")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            f"SELECT regexp_replace(s, '{COMPOUND_PAIR_REGEX}', '\\1_\\2', 'g') "
            f"FROM (SELECT unnest(?) AS s)",
            [texts],
        ).fetchall()
    ]
    assert got == want


def test_count_batch_arrow_kernel_parity():
    """Round 7: count_batch runs base/code on Arrow C++ kernels (RE2
    split + utf8_lower + dictionary_encode). Pin exact posting AND
    position parity against the frozen pure-Python tokenizers on
    adversarial inputs — including U+0130 (İ), the one codepoint whose
    Python lowercase is multi-codepoint (i + combining dot splits a
    token where Arrow's 1:1 lower would not)."""
    import numpy as np

    from xsearch_spark.functions.tokenize import (
        tokenize_base_py,
        tokenize_cjk_py,
        tokenize_code_py,
    )
    from xsearch_spark.operators.build import count_batch

    texts = [
        "",
        None,
        "...",
        "héllo WÖrld_fooBar",
        "日本語テキスト abc def",
        "İstanbul STRASSE ß",  # py lower -> 'i' + U+0307 + 'stanbul'
        "İİxİ yİz",
        "AΣ B ΣΟΦΟΣ",  # final-sigma context (non-token either way)
        "_x__y_ 0x1F camelCaseABCDef snake_case_x",
        "\x00null\x01byte",
        "a b a b a",
    ]
    ref = {"base": tokenize_base_py, "code": tokenize_code_py, "cjk": tokenize_cjk_py}
    for variant, tok in ref.items():
        res = count_batch(
            pd.Series(texts), np.arange(len(texts), dtype=np.int64), variant,
            with_positions=True,
        )
        terms, ids, tfs, dls, pos_flat = res
        cum = np.concatenate([[0], np.cumsum(tfs)])
        got = {}
        for j in range(len(terms)):
            got[(int(ids[j]), terms[j])] = (
                int(tfs[j]), int(dls[j]), tuple(pos_flat[cum[j]:cum[j + 1]])
            )
        want = {}
        for i, t in enumerate(texts):
            toks = tok(t or "")
            for p, term in enumerate(toks, start=1):
                tf, dl, ps = want.get((i, term), (0, len(toks), ()))
                want[(i, term)] = (tf + 1, len(toks), ps + (p,))
        assert got == want, f"variant {variant} diverges from python reference"
