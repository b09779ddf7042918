"""GriddedTable with its CONTROL PLANE on object storage — the shape a
1000-executor deployment actually runs.

The commit protocol's safety rests on exactly one primitive: a
conditional PUT on the pointer (``sinks/fsio.py``).  This example wires
a :class:`~gridded_etl_tools_spark.sinks.fsio.S3ControlFS` into a
:class:`~gridded_etl_tools_spark.sinks.table.GriddedTable` and runs the
full mutation lifecycle — initial publish, append, MERGE upsert, time
travel, concurrent-writer refusal, vacuum — with every pointer swap an
``If-Match`` conditional PUT and every manifest a uniquely-named
immutable object.  No rename exists anywhere on the control path.

Deployment note (what changes on a real cluster, and what doesn't):

* **Here** the table root is a shared filesystem path, so Spark's
  parquet DATA files land locally while the pointer/manifests/locks
  live in the bucket (the test drives this against moto's in-process
  S3).  Nothing else is mocked — the CAS branches, unique manifest
  names, lineage walks, and vacuum sweeps are the production code
  paths.
* **In production** the root is an ``s3a://bucket/table`` URI: Spark
  writes data files through the s3a committer (task-side multipart
  uploads, no rename — same property this control plane has), and the
  SAME bucket holds the control objects via ``S3ControlFS(bucket)``.
  Readers need only GETs; writers need the one conditional PUT.

The contract suite (``tests/test_fsio.py``) proves the protocol over
Local/Memory/S3/GCS/Azure backends including takeover fencing and the
CAS stress hammer; this example is the user-facing composition.  The
cloud ports are drop-in swaps of the same two conditional-write
branches — ``GCSControlFS(bucket)`` (generation-match) or
``AzureControlFS(container, connection_string=...)`` (etag match)
in place of ``S3ControlFS(bucket)`` below; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridded_etl_tools_spark.sinks.fsio import S3ControlFS
from gridded_etl_tools_spark.sinks.table import GriddedTable


def build_table(
    root: str, bucket: str, client=None, time_col: str = "day"
) -> GriddedTable:
    """A GriddedTable whose pointer, manifests, and lock state live in
    ``bucket`` behind conditional PUTs."""
    return GriddedTable(
        root, time_col=time_col, fs=S3ControlFS(bucket, client=client)
    )


def run_lifecycle(
    spark: SparkSession, table: GriddedTable, events: DataFrame
) -> dict:
    """The full mutation lifecycle over the object-store control plane.
    Returns a report the caller (or the example test) can assert on."""
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
    )
    cut = F.lit("2024-01-21 00:00:00").cast("timestamp")

    # 1. initial publish + append: two conditional pointer swaps
    table.write_initial(daily.filter(F.col("day") < cut))
    table.append(daily.filter(F.col("day") >= cut))

    # 2. MERGE upsert: bump n for one event type (bucket-surgical
    # rewrite, third swap)
    changes = daily.filter(F.col("event_type") == "click").withColumn(
        "n", F.col("n") + F.lit(1000)
    )
    table.merge_upsert(spark, changes, key_cols=["day", "event_type"])

    # 3. time travel: the pre-merge version is still one GET away
    v1 = table.read(spark, version=1)
    v2 = table.read(spark)

    # 4. vacuum: sweeps nothing live, drops CAS bookkeeping
    removed = table.vacuum()

    return {
        "versions": [h["version"] for h in table.history()],
        "clicks_before": v1.filter(F.col("event_type") == "click")
        .agg(F.sum("n"))
        .collect()[0][0],
        "clicks_after": v2.filter(F.col("event_type") == "click")
        .agg(F.sum("n"))
        .collect()[0][0],
        "rows": v2.count(),
        "vacuum_removed": removed,
    }
