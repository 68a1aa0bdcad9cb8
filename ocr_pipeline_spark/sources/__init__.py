"""Table IO: Iceberg when configured, Iceberg-shaped parquet fallback."""
