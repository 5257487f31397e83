"""Term-hash bucket layout, shared by the index writer and the query
planner (SURVEY.md Q2 / S6).

The bucket function must be computable BOTH as a JVM Column expression
(write path: one hash per merged run row — negligible) and in plain
Python (query path: locating a term's bucket must not cost a Spark
job). md5 is bit-identical across Spark, hashlib and DuckDB; the first
15 hex chars (60 bits) fit a signed 64-bit int, so the two forms agree
exactly. xxhash64 would be marginally cheaper JVM-side but has no exact
Python twin, which forced the round-1 design to spend one Spark job per
query just to compute bucket ids (`spark.range(1)` probe) — at
interactive query rates the job overhead dwarfs the hash cost.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_col(term: Column, num_buckets: int) -> Column:
    """JVM expression: md5(term) first 60 bits mod num_buckets."""
    return (
        F.pmod(
            F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long"),
            F.lit(num_buckets),
        )
    ).cast("int")


def bucket_of(term: str, num_buckets: int) -> int:
    """Python twin of :func:`bucket_col` — must agree bit-for-bit
    (property-tested in tests/test_index.py)."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % num_buckets


def buckets_of(terms: list[str], num_buckets: int) -> list[int]:
    return sorted({bucket_of(t, num_buckets) for t in terms})
