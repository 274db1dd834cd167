"""Output sinks beyond parquet: the reference's report formats."""
