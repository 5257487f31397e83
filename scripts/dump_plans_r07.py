#!/usr/bin/env python
"""Dump .explain("formatted") for the round-7 optimization targets into
plans/r07/<query>_<suffix>.txt (suffix = before|after).

Usage: python scripts/dump_plans_r07.py before|after [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_dir = os.path.join(REPO, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F  # noqa: F401

    from xsearch_spark.operators.wand import (
        facet_counts,
        facet_histogram,
        field_stats,
        match_count,
        search_collapse,
        search_sorted,
        search_wand,
        suggest_terms,
    )
    from xsearch_spark.plans.build_index import build_index
    from xsearch_spark.plans.query import parse
    from xsearch_spark.session import get_spark
    from xsearch_spark.sources.io import read_documents

    spark = get_spark("plans-r07", master="local[8]", shuffle_partitions=32)
    docs = read_documents(spark, sf_dir)
    n = docs.count()
    idx = tempfile.mkdtemp(prefix="xsr07_plans_")
    built = build_index(
        spark, docs, idx, text_col="text", variant="base",
        docs_per_segment=4096, segs_per_shard=4, num_buckets=32,
        n_docs=n, fused_merge=True, positions=True,
        attr_cols=("lang", "n_chars"),
    )
    AF = ("lang", "n_chars")
    targets = {
        "q16_facet": lambda: facet_counts(built, parse("hash OR join"), "lang"),
        "q21_sorted": lambda: search_sorted(
            built, parse("hash OR join", attr_fields=AF), "n_chars",
            ascending=False, k=10, offset=5,
        ),
        "q22_cursor": lambda: search_sorted(
            built, parse("hash OR join", attr_fields=AF), "n_chars",
            ascending=False, k=10, after=(500, 0),
        ),
        "q23_stats": lambda: field_stats(
            built, parse("hash OR join", attr_fields=AF), "n_chars"
        ),
        "q24_histogram": lambda: facet_histogram(
            built, parse("hash OR join", attr_fields=AF), "n_chars", 100
        ),
        "q30_collapse": lambda: search_collapse(
            built, parse("hash OR join"), "lang", k=10, per_value=2
        ),
        "search_count": lambda: match_count(built, parse("hash OR join")),
        "q04_or_wand": lambda: search_wand(
            built, parse("hash OR join"), source_df=docs
        ),
        "q18_suggest": lambda: suggest_terms(built, "s", 10),
        "q14_phrase": lambda: search_wand(
            built, parse('"hash join" spark'), source_df=docs
        ),
        "q17_prefix": lambda: search_wand(
            built, parse("s* merge"), source_df=docs
        ),
        "q19_fuzzy": lambda: search_wand(
            built, parse("sort sow~1"), source_df=docs
        ),
        "q20_range": lambda: search_wand(
            built, parse("hash n_chars:400..530", attr_fields=AF)
        ),
    }
    for name, fn in targets.items():
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan_of(fn()))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
