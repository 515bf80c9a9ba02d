"""Table adapters: parquet directories in the sandbox, Iceberg in production."""
