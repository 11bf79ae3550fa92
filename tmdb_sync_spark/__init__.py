"""tmdb_sync_spark — a PySpark-native analytics engine re-expressing the
query and data-processing capabilities of the reference service
``kadracoon/tmdb-sync`` (see SURVEY.md) as declarative Spark DataFrame/SQL
plans, plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Design rules (SURVEY.md §2.9 / §4):
- Zero row-level Python UDFs in query paths; everything compiles to
  Catalyst expressions (JVM, whole-stage codegen).
- Python only at source boundaries (HTTP ingestion) and for Arrow-batched
  multimodal decode stubs (``mapInPandas``).
- Partition-parallel everywhere: no driver-side ``collect()`` loops in any
  operator; broadcast joins for small dimensions; two-phase aggregation.
"""

__version__ = "0.1.0"
