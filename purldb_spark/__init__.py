"""purldb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of aboutcode-org/purldb.

This is NOT a port of the reference (a Django+PostgreSQL service). It is a
Spark-first re-expression of the same capabilities:

- catalog queries (filters, purl lookups, search mini-language) -> DataFrame
  predicates compiled to Catalyst expressions (operators/filters.py)
- code matching (exact sha1, LSH-banded halohash, snippet jaccard) -> joins
  over fingerprint index tables (operators/matching.py)
- mining dataflow (queue tables + workers) -> batch/Structured-Streaming
  pipelines (streaming/)
- merge/upsert semantics -> table-driven MERGE-style writers (operators/merge.py)

Plus first-class large-scale training-data-pipeline operators: dedup
(exact / MinHash-LSH / SimHash / n-gram jaccard / embedding cosine),
similarity search, text analysis, multimodal column plumbing.

See SURVEY.md for the full capability inventory with reference citations.
"""

__version__ = "0.1.0"
