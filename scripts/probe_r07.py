#!/usr/bin/env python
"""Round-7 probe: per-query wall + Spark job count/walls for the bench
query surfaces, plus build-stage decomposition. Uses the status tracker
(job ids before/after each query) — cheap, no UI.

Usage: python scripts/probe_r07.py [sf_dir] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from xsearch_spark.operators.wand import (
        facet_counts,
        facet_histogram,
        field_stats,
        search_collapse,
        search_sorted,
        search_wand,
        search_wand_batch,
        suggest_terms,
        search_after_topk,
    )
    from xsearch_spark.plans.build_index import build_index
    from xsearch_spark.plans.query import parse
    from xsearch_spark.session import get_spark
    from xsearch_spark.sources.io import read_documents

    spark = get_spark(
        "probe-r07", master=f"local[{cpus}]", shuffle_partitions=max(32, 4 * cpus)
    )
    sc = spark.sparkContext
    docs = read_documents(spark, sf_dir)
    n = docs.count()
    docs.agg(F.sum(F.length("text"))).collect()
    idx = tempfile.mkdtemp(prefix="xsr07_probe_")
    t0 = time.monotonic()
    built = build_index(
        spark, docs, idx, text_col="text", variant="base",
        docs_per_segment=4096, segs_per_shard=4, num_buckets=32,
        n_docs=n, fused_merge=True, positions=True,
        attr_cols=("lang", "n_chars"),
    )
    build_wall = time.monotonic() - t0
    AF = ("lang", "n_chars")

    tracker = sc.statusTracker()

    def jobs_walls(jids):
        out = []
        for j in jids:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            sids = ji.stageIds
            w = 0.0
            for s in sids:
                si = tracker.getStageInfo(s)
                if si:
                    out.append((j, s, si.name.split(":")[0], si.numTasks))
        return out

    cases = {
        "q04_or": lambda: search_wand(built, parse("hash OR join"), source_df=docs),
        "q01_rare": lambda: search_wand(built, parse("hash"), source_df=docs),
        "q19_fuzzy": lambda: search_wand(built, parse("sort sow~1"), source_df=docs),
        "q17_prefix": lambda: search_wand(built, parse("s* merge"), source_df=docs),
        "q16_facet": lambda: facet_counts(built, parse("hash OR join"), "lang"),
        "q23_stats": lambda: field_stats(
            built, parse("hash OR join", attr_fields=AF), "n_chars"
        ),
        "q24_histogram": lambda: facet_histogram(
            built, parse("hash OR join", attr_fields=AF), "n_chars", 100
        ),
        "q21_sorted": lambda: search_sorted(
            built, parse("hash OR join", attr_fields=AF), "n_chars",
            ascending=False, k=10, offset=5,
        ),
        "q22_cursor": lambda: search_sorted(
            built, parse("hash OR join", attr_fields=AF), "n_chars",
            ascending=False, k=10, after=(500, 0),
        ),
        "q30_collapse": lambda: search_collapse(
            built, parse("hash OR join"), "lang", k=10, per_value=2
        ),
        "q27_score_cursor": lambda: search_after_topk(
            built, parse("the OR scan OR join"), k=10, after=(1.0, 0)
        ),
        "q18_suggest": lambda: suggest_terms(built, "s", 10),
    }
    res: dict = {"build_wall_s": round(build_wall, 2), "n_docs": n}
    for name, fn in cases.items():
        walls = []
        njobs = 0
        for it in range(3):
            gid = f"probe-{name}-{it}"
            sc.setJobGroup(gid, f"probe: {name} #{it}")
            t0 = time.monotonic()
            fn().collect()
            walls.append(round(time.monotonic() - t0, 4))
            njobs = len(set(tracker.getJobIdsForGroup(gid) or []))
        sc.setJobGroup("", "")
        res[name] = {"walls": walls, "jobs_last_run": njobs}
        print(name, res[name], flush=True)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
