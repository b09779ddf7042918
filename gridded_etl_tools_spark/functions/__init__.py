"""Scalar/column-level functions (all JVM-side pyspark.sql.functions
compositions — no Python UDFs in this package)."""
