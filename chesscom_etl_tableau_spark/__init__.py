"""chesscom_etl_tableau_spark — a PySpark-native analytics engine.

A brand-new, Spark-first rebuild of the query and data-processing
capabilities of the reference repo ``20r01a04l8/chesscom-etl-tableau``
(a Chess.com games ETL + BI dashboard), plus the LLM-training-data
pipeline operators (dedup, similarity search, multimodal columns,
text analysis) that a 100 TB-scale deployment needs.

Design stance (see SURVEY.md §7):
- DataFrame/SQL declarative plans; Catalyst + AQE do the physical planning.
- Explicit ``StructType`` schemas everywhere; no ``inferSchema`` in
  production paths.
- Built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs only
  where built-ins genuinely can't express the semantics (multimodal
  decode).
- Broadcast joins for dimensions, anti-joins for idempotent dedup,
  per-day pre-aggregation before range-frame windows.
"""

__version__ = "0.1.0"
