"""Spark-side engine: sources, the vectorized UDF pipeline, audit/resume,
and distributed HMM training."""
