"""S1/S6: source scan and index sink behind a thin format switch.

Production target is Iceberg (BASELINE.json:14 "over Iceberg tables of
source-code repositories"); this sandbox has no Iceberg runtime jar
(verified — SURVEY.md §0), so the local format is Parquet. Everything
downstream sees only DataFrames, so the switch is total at this layer.

Schemas are explicit — never inferred — matching the reference's
protobuf-fixed schemas (component-level [R]).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# the pinned production input schema (BASELINE.json:15 input_hint)
CODE_FILES_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("source", StringType(), False),
        StructField("n_chars", LongType(), False),
    ]
)

FORMAT = os.environ.get("XSEARCH_TABLE_FORMAT", "parquet")  # "iceberg" in prod


def read_table(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    if FORMAT == "iceberg":
        return spark.read.format("iceberg").load(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, f"{sf_dir}/documents.parquet", DOCUMENTS_SCHEMA)


def read_source(spark: SparkSession, path: str) -> DataFrame:
    """S1: the production source-code table, with the S3 content
    fingerprint attached (built-in sha2 — no UDF)."""
    df = read_table(spark, path, CODE_FILES_SCHEMA)
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def write_table(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if FORMAT == "iceberg":
        writer.format("iceberg").save(path)
    else:
        writer.parquet(path)
