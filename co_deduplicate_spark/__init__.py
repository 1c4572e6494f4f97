"""co_deduplicate_spark — a PySpark-native near-duplicate detection and
clustering engine.

A from-scratch reimplementation of the *semantics* of
conditor-project/co-deduplicate (record matching under named rules →
duplicate graph → transitive closure → deterministic cluster IDs), built
Spark-first: DataFrame/SQL plans, Arrow-vectorized pandas UDFs for the
signature kernels, iterative DataFrame joins for connected components,
and checkpointed stage tables for idempotent resume.

Reference semantics are cited per-module as ``file:line`` into
/root/reference (read-only study copy). No code is ported; the reference
is a Node.js + Elasticsearch online service, this is a batch/streaming
Spark engine.
"""

__version__ = "0.1.0"
