"""Scalar/vectorized function layer: tokenizers, posting codec, BM25
column expressions, text-analysis functions. Everything here is either a
pure-JVM Column expression or a vectorized (Arrow-batched) pandas UDF —
never per-row Python (BASELINE.json:15 input_hint)."""
