"""Source/sink connectors beyond the core parquet scans in io.py."""
