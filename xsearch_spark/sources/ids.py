"""S2: deterministic dense doc_id assignment (SURVEY.md §2.1).

Reference parity: xsearch assigns shard-local auto-increment IDs at
ingest (component-level [R]). Our pinned mapping (FIXTURES.md §2): dense
``row_number() - 1`` ordered by (repo, path, commit) ascending.

Two implementations that must produce the SAME mapping (tested):

  * ``assign_doc_ids_global``  — a single window over a global order.
    Fine at test scale; at 100 TB a global-order window funnels every
    row through one task — unusable.
  * ``assign_doc_ids_scalable`` — range-repartition by the key, sort
    within partitions, number within partitions, then add per-partition
    offsets (a tiny driver-side cumsum over partition counts). This is
    the classic zipWithIndex topology expressed in the DataFrame API:
    two passes over the data, no global sort, no single-task stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["repo", "path", "commit"]


def assign_doc_ids_global(df: DataFrame) -> DataFrame:
    w = Window.orderBy(*[F.col(c).asc() for c in KEY])
    return df.withColumn("doc_id", (F.row_number().over(w) - 1).cast("long"))


def assign_doc_ids_scalable(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(n, *KEY).sortWithinPartitions(*KEY)
    parts = parts.withColumn("_pid", F.spark_partition_id())
    # pass 1: per-partition counts -> driver-side exclusive prefix sum.
    # counts is <= num_partitions rows — trivially collectable.
    counts = {
        r["_pid"]: r["c"]
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_df = parts.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    # pass 2: number within each (already sorted) partition and shift.
    # The window is partitioned by _pid -> no cross-partition shuffle of
    # the big table beyond the broadcast join of the tiny offset map.
    w = Window.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in KEY])
    out = (
        parts.join(F.broadcast(offset_df), "_pid")
        .withColumn("doc_id", (F.row_number().over(w) - 1 + F.col("_offset")).cast("long"))
        .drop("_pid", "_offset")
    )
    return out
