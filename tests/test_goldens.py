"""Golden regression: the Spark engine must reproduce the committed
pyref goldens (FIXTURES.md §4) exactly — docIDs and round-6 scores."""

from __future__ import annotations

import csv
import os

import pytest

from tests.conftest import SF_DIR
from tests.gen_goldens import CODE_QUERIES, DOC_QUERIES, GOLDEN_DIR
from xsearch_spark import engine

_HAVE_GOLDENS = os.path.isdir(os.path.join(GOLDEN_DIR, "documents"))


def _load(table: str, qid: str) -> list[tuple[int, float]]:
    with open(os.path.join(GOLDEN_DIR, table, f"{qid}.csv")) as f:
        return [
            (int(r["doc_id"]), float(r["score_round6"])) for r in csv.DictReader(f)
        ]


@pytest.mark.skipif(not _HAVE_GOLDENS, reason="run tests/gen_goldens.py first")
@pytest.mark.parametrize("qid", sorted(DOC_QUERIES))
def test_documents_goldens(spark, qid):
    corpus = engine.corpus_from_documents(spark, SF_DIR)
    got = [
        (r["doc_id"], r["score"])
        for r in engine.run_query(corpus, DOC_QUERIES[qid]).collect()
    ]
    assert got == _load("documents", qid), f"golden mismatch for {qid}"


@pytest.mark.skipif(not _HAVE_GOLDENS, reason="run tests/gen_goldens.py first")
def test_code_goldens(spark, tmp_path):
    from xsearch_spark.operators.wand import search_wand
    from xsearch_spark.plans.build_index import build_index
    from xsearch_spark.plans.query import parse
    from xsearch_spark.sources.datagen import generate_code_files
    from xsearch_spark.sources.ids import assign_doc_ids_global
    from xsearch_spark.sources.io import read_source

    path = generate_code_files("0.001", "/root/repo/.cache/code_files/sf0.001")
    src = assign_doc_ids_global(read_source(spark, path)).persist()
    built = build_index(
        spark,
        src,
        str(tmp_path / "idx"),
        text_col="content",
        variant="code",
        docs_per_segment=256,
        segs_per_shard=2,
        num_buckets=16,
    )
    for qid, q in CODE_QUERIES.items():
        parsed = parse(q, "code")
        got = [
            (r["doc_id"], round(r["score"], 6))
            for r in search_wand(built, parsed, source_df=src).collect()
        ]
        assert got == _load("code_files", qid), f"golden mismatch for {qid}"
