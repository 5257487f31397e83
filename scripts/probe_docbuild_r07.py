#!/usr/bin/env python
"""Decompose the bench documents build (positional + attrs, fused):
pack+persist+agg vs merge+write vs manifest, at bench geometry.

Usage: python scripts/probe_docbuild_r07.py [sf_dir] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from xsearch_spark.operators import segments as seg
    from xsearch_spark.plans.build_index import _partition_rows_parquet
    from xsearch_spark.session import get_spark
    from xsearch_spark.sources.io import read_documents

    spark = get_spark(
        "probe-docbuild", master=f"local[{cpus}]", shuffle_partitions=max(32, 4 * cpus)
    )
    docs = read_documents(spark, sf_dir)
    n = docs.count()
    docs.agg(F.sum(F.length("text"))).collect()
    res = {"n_docs": n, "runs": []}
    for _ in range(2):
        out = tempfile.mkdtemp(prefix="xsr07_db_")
        r: dict = {}
        t0 = time.monotonic()
        packed = seg.pack_from_source(
            docs, "text", "doc_id", "base", 4096, n_docs=n,
            attr_cols=("lang", "n_chars"), positions=True,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        row = packed.agg(
            F.sum("sum_tf").alias("s"), F.count(F.lit(1)).alias("runs")
        ).collect()[0]
        r["pack_s"] = round(time.monotonic() - t0, 3)
        avgdl = int(row["s"] or 0) / n
        t0 = time.monotonic()
        merged = seg.merge_to_index(packed, avgdl, 4, 32, n_runs=int(row["runs"]))
        merged.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(out, "index")
        )
        r["merge_write_s"] = round(time.monotonic() - t0, 3)
        packed.unpersist()
        t0 = time.monotonic()
        parts = _partition_rows_parquet(os.path.join(out, "index"), "bucket")
        r["manifest_s"] = round(time.monotonic() - t0, 3)
        r["n_files"] = sum(
            len(os.listdir(os.path.join(out, "index", d)))
            for d in os.listdir(os.path.join(out, "index"))
            if d.startswith("bucket=")
        )
        res["runs"].append(r)
        shutil.rmtree(out, ignore_errors=True)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
