"""xsearch_spark — a from-scratch PySpark-native rebuild of the
capability set of tddhit/xsearch (distributed full-text search: inverted
index build, segment merge, compressed postings, BM25 top-k query with
block-max WAND), plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design contract (BASELINE.json / SURVEY.md):
  * DataFrame-first; RDD API is never used.
  * Python appears only in vectorized pandas/Arrow UDFs (tokenizer,
    posting codec, WAND scorer) — never per-row Python.
  * All frozen semantics live in :mod:`xsearch_spark.constants`.
"""

from xsearch_spark import constants

__all__ = ["constants"]
__version__ = "0.1.0"
