#!/usr/bin/env python
"""Round-7 examination probe for the LLM-data-pipeline operators:
wall + Spark job count per driver-entry surface at sf0.01 (the driver's
correctness scale — these entries are gated on correctness, not timed,
but the checklist needs measured evidence that their shapes are sane).

Usage: python scripts/probe_pipeline_r07.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as m
    from xsearch_spark.session import get_spark

    spark = get_spark("probe-pipe", master="local[16]", shuffle_partitions=64)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    q = {**m.queries(), **m.extra_queries()}
    names = [
        "dedup_exact_keep", "dedup_minhash_sigs", "dedup_lsh_pairs",
        "dedup_simhash", "dedup_near_clusters", "emb_near_clusters",
        "text_lang_id", "text_quality_score", "text_token_counts",
        "text_fingerprint", "text_chunks", "pipeline_clean_corpus",
        "ann_cosine_topk", "ann_ivf_topk", "content_sha256_invariant",
    ]
    res = {}
    for name in names:
        fn = q[name]
        walls = []
        njobs = 0
        for it in range(2):
            gid = f"pp-{name}-{it}"
            sc.setJobGroup(gid, gid)
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            walls.append(round(time.monotonic() - t0, 3))
            njobs = len(set(tracker.getJobIdsForGroup(gid) or []))
        res[name] = {"walls": walls, "jobs": njobs}
        print(name, res[name], flush=True)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
