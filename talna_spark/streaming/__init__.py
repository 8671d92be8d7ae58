"""Structured Streaming extensions (beyond the reference's batch-on-LSM
surface, SURVEY.md §2.2: talna has no streaming machinery — these are the
Spark-native equivalents a continuously-ingesting deployment needs)."""
