"""Spark engine: pandas-UDF detection + the quality-filter pipeline."""
