"""Large-scale training-data pipeline operators (the BASELINE.json north
star beyond the reference's own surface): deduplication, similarity search,
text analysis, multimodal columns.

Every operator has two faces kept in lock-step:
- a Spark DataFrame builder (JVM-side builtins wherever possible; pandas
  UDFs only where semantics genuinely require Python), and
- a DuckDB oracle SQL generator, built from the SAME constants and the
  portable expression helpers in :mod:`talna_spark.pipeline.portable`,
  so driver hash-checks compare independent engines computing one spec.
"""
