"""The fused tokenize+tf+dl UDF must be row-identical to the
declarative explode+groupBy path on both tokenizer variants (it replaces
it in the build for scale reasons — see postings_with_dl_fused)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from xsearch_spark.operators import build as b
from xsearch_spark.sources.io import read_documents


def _as_dict(rows):
    return {(r["term"], r["doc_id"]): (r["tf"], r["dl"]) for r in rows}


def test_fused_equals_declarative_base(spark):
    docs = read_documents(spark, SF_DIR)
    tok = b.with_tokens(docs, "text", "base")
    a = _as_dict(b.postings_with_dl(tok).collect())
    c = _as_dict(b.postings_with_dl_fused(docs, "text", "doc_id", "base").collect())
    assert a == c


def test_fused_equals_declarative_code(spark):
    from xsearch_spark.sources.datagen import generate_code_files
    from xsearch_spark.sources.ids import assign_doc_ids_global
    from xsearch_spark.sources.io import read_source

    path = generate_code_files("0.001", "/root/repo/.cache/code_files/sf0.001")
    src = assign_doc_ids_global(read_source(spark, path))
    tok = b.with_tokens(src, "content", "code")
    a = _as_dict(b.postings_with_dl(tok).collect())
    c = _as_dict(b.postings_with_dl_fused(src, "content", "doc_id", "code").collect())
    assert a == c


def test_fused_empty_and_null_text(spark):
    rows = [(0, "hello world"), (1, ""), (2, None), (3, "...")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _as_dict(b.postings_with_dl_fused(df, "text", "doc_id", "base").collect())
    assert got == {("hello", 0): (1, 2), ("world", 0): (1, 2)}
