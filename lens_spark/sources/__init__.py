"""Table sources/sinks: parquet-backed table layer with Iceberg-style
semantics (atomic snapshot commit, MERGE upsert, row-level delete)."""
