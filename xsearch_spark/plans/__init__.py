"""Query planning and job orchestration: the query parser, the index
build pipeline with per-partition checkpoint/lineage manifests, and the
spark-submit entry points."""
