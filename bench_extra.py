#!/usr/bin/env python
"""Round-7 isolation benchmarks (bench.py is FROZEN for measurement —
this file holds the guide-§1.4 noop-sink / stage-decomposition probes
whose numbers OPTIMIZATION_r07.md cites).

Usage:
    python bench_extra.py build [sf_key]   # code-build stage decomposition
    python bench_extra.py queries [sf_dir] # per-query noop-isolated walls
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _spark(cpus: int):
    from xsearch_spark.session import get_spark

    return get_spark(
        "xsearch-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(32, 4 * cpus),
    )


def bench_build(sf_key: str = "0.1", cpus: int | None = None) -> dict:
    """Stage-decomposed code build: ids checkpoint / pack+persist+agg /
    merge+write, each timed separately (same topology as bench.py's
    fused build; the stage cuts are the persist() barrier)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from xsearch_spark.operators import segments as seg
    from xsearch_spark.plans.build_index import checkpoint_source_ids
    from xsearch_spark.sources.datagen import generate_code_files
    from xsearch_spark.sources.io import read_source

    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    iters = int(os.environ.get("SPARK_GRAFT_BUILD_ITERS", "2"))
    code_parquet = generate_code_files(
        sf_key, os.path.join(REPO, ".cache", "code_files", f"sf{sf_key}")
    )
    spark = _spark(cpus)
    src = read_source(spark, code_parquet)
    n = src.count()
    src.agg(F.sum(F.length("content"))).collect()  # warm page cache
    res = {"n_docs": n, "cpus": cpus, "runs": []}
    try:
        for _ in range(iters):
            out = tempfile.mkdtemp(prefix="xsbx_")
            r: dict = {}
            try:
                spark.sparkContext.setJobDescription("bx: ids checkpoint")
                t0 = time.monotonic()
                ids, _n = checkpoint_source_ids(spark, src, out)
                r["ids_checkpoint_s"] = round(time.monotonic() - t0, 2)

                spark.sparkContext.setJobDescription("bx: pack+persist+agg")
                t0 = time.monotonic()
                packed = seg.pack_from_source(
                    ids, "content", "doc_id", "code", 4096, n_docs=n
                ).persist(StorageLevel.MEMORY_AND_DISK)
                row = packed.agg(
                    F.sum("sum_tf").alias("s"), F.count(F.lit(1)).alias("runs")
                ).collect()[0]
                r["pack_s"] = round(time.monotonic() - t0, 2)
                sum_dl = int(row["s"] or 0)
                avgdl = sum_dl / n

                spark.sparkContext.setJobDescription("bx: merge+write")
                t0 = time.monotonic()
                merged = seg.merge_to_index(
                    packed, avgdl, 4, 64, n_runs=int(row["runs"])
                )
                merged.write.mode("overwrite").partitionBy("bucket").parquet(
                    os.path.join(out, "index2")
                )
                r["merge_write_s"] = round(time.monotonic() - t0, 2)
                packed.unpersist()
                r["total_s"] = round(
                    r["ids_checkpoint_s"] + r["pack_s"] + r["merge_write_s"], 2
                )
                r["docs_per_sec"] = round(n / r["total_s"], 1)
            finally:
                shutil.rmtree(out, ignore_errors=True)
            res["runs"].append(r)
    finally:
        spark.stop()
    best = min(res["runs"], key=lambda r: r["total_s"])
    res.update(best)
    print(json.dumps(res))
    return res


def bench_queries(sf_dir: str = "/root/testdata/sf0.1", cpus: int | None = None) -> dict:
    """Noop-sink isolation (guide §1.4) for the aggregation-family
    queries over a prebuilt positional+attr documents index."""
    from pyspark.sql import functions as F

    from xsearch_spark.operators.wand import (
        facet_counts,
        facet_histogram,
        field_stats,
        search_collapse,
        search_sorted,
        search_wand,
    )
    from xsearch_spark.plans.build_index import build_index
    from xsearch_spark.plans.query import parse
    from xsearch_spark.sources.io import read_documents

    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _spark(cpus)
    docs = read_documents(spark, sf_dir)
    n = docs.count()
    docs.agg(F.sum(F.length("text"))).collect()
    out = tempfile.mkdtemp(prefix="xsbx_idx_")
    res: dict = {"cpus": cpus, "sf_dir": sf_dir}
    try:
        built = build_index(
            spark, docs, out, text_col="text", variant="base",
            docs_per_segment=4096, segs_per_shard=4, num_buckets=32,
            n_docs=n, fused_merge=True, positions=True,
            attr_cols=("lang", "n_chars"),
        )
        af = ("lang", "n_chars")
        cases = {
            "wand_and": lambda: search_wand(built, parse("hash join")),
            "facet": lambda: facet_counts(built, parse("hash OR join"), "lang"),
            "stats": lambda: field_stats(
                built, parse("hash OR join", attr_fields=af), "n_chars"
            ),
            "histogram": lambda: facet_histogram(
                built, parse("hash OR join", attr_fields=af), "n_chars", 100
            ),
            "sorted": lambda: search_sorted(
                built, parse("hash OR join", attr_fields=af), "n_chars",
                ascending=False, k=10, offset=5,
            ),
            "collapse": lambda: search_collapse(
                built, parse("hash OR join"), "lang", k=10, per_value=2
            ),
        }
        for name, fn in cases.items():
            walls = []
            for _ in range(3):
                spark.sparkContext.setJobDescription(f"bx: {name}")
                t0 = time.monotonic()
                fn().write.format("noop").mode("overwrite").save()
                walls.append(round(time.monotonic() - t0, 4))
            res[name] = walls
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "build"
    if mode == "build":
        bench_build(sys.argv[2] if len(sys.argv) > 2 else "0.1")
    else:
        bench_queries(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        )
