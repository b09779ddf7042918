"""Table loading helpers for the driver's synthetic star schema.

``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark only
reads via ``spark.sql.legacy.parquet.nanosAsLong`` (LongType nanoseconds).
We convert to a microsecond timestamp with floor division — the same
truncation DuckDB applies when it casts ns → its µs TIMESTAMP — so both
engines see identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # the caller may hand us a session without this conf (it is
        # runtime-settable); without it TIMESTAMP(NANOS) is unreadable
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000").cast("long"))
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
