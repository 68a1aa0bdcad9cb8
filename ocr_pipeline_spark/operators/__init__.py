"""Spark-side operators: Arrow-vectorized wrappers of the pure kernel,
plus text-analytics / dedup operators for training-data pipelines."""
