"""Structured Streaming ingest path (SURVEY.md §2.10): capability parity
with xsearch's diskqueue-fed continuous indexing."""
