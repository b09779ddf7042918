"""SparkSession factory with scale-aware defaults.

The reference hand-tunes a Dask LocalCluster (1 worker, threads ~ RAM,
spill thresholds — reference ``dataset_manager.py:229-262``,
``utils/publish.py:272-297``).  On Spark those knobs collapse into a few
session configs; everything else (spill, memory pressure, partition
coalescing) is handled by the unified memory manager and AQE.

Design notes for 100 TB scale (tested locally on ``local[N]``):

* AQE on, with partition coalescing and skew-join handling — at cluster
  scale this replaces hand-computed "chunk" sizing with runtime re-planning.
* ``spark.sql.shuffle.partitions`` defaults to the local core count here;
  on a real cluster it should be ~2-3x total cores (AQE coalesces down).
* Arrow enabled so the Pandas-UDF slow path is batch-vectorized.
* UTC session timezone: the reference stores CF/UTC times
  (``utils/metadata.py:816-848``); timestamp semantics must not depend on
  the driver's locale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Local-mode heap sized to the machine, clamped to [4g, 16g].

    In local mode this ONE JVM is driver + executor + block manager for
    all N task threads, so the heap must be sized to the task
    concurrency, not to a driver's usual bookkeeping (guide §5).  8g
    with 32 task threads was GC-bound: multi-second stalls landed on
    whatever bench row ran next (allocation-heavy rows swung 3-5x rep
    to rep, spread 1.9-3.7); at 16g the same rows hold spreads under
    ~0.6 and every heavy row's median dropped (OPTIMIZATION_r14.md
    §11; 24g measured WORSE — sizing, not more-is-better).  A quarter
    of physical RAM keeps small CI boxes out of the OOM-killer;
    ``SPARK_GRAFT_DRIVER_MEM`` overrides, and on a real cluster driver
    memory is a deployment setting with executors on their own heaps.
    """
    try:
        ram_gb = (os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")) >> 30
    except (ValueError, OSError, AttributeError):
        ram_gb = 0
    return f"{max(4, min(16, ram_gb // 4))}g"


def get_session(
    app_name: str = "gridded_etl_tools_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession with engine defaults applied."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # INT96 timestamps carry no parquet min/max stats; micros do —
        # our manifest file-pruning and row-group skipping depend on them
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
        # ContextCleaner frees localCheckpoint/broadcast blocks only
        # after a driver GC enqueues their weak references; the 30 min
        # default means a long-running stream (one checkpoint barrier
        # per micro-batch, e.g. stream_dedup) accumulates blocks for
        # half an hour.  5 min bounds the pileup without ever firing
        # inside a bench-sized run.
        .config("spark.cleaner.periodicGC.interval", "5min")
        # Parquet TIMESTAMP(NANOS) (pandas default) is unreadable by Spark
        # unless surfaced as long; plans.tables.load converts ns→µs with
        # the same truncation DuckDB applies.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Dynamic partition overwrite backs the insert-region write path
        # (reference utils/publish.py:406-450 writes region={time: slice});
        # we overwrite only the partitions an insert touches.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
