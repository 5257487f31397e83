"""Dataflow operators: index build (postings, segments, merge), query
(relational + WAND paths), and the training-data-pipeline operators
(dedup, similarity, text analysis, multimodal plumbing)."""
