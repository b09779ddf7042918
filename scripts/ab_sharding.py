#!/usr/bin/env python3
"""A/B: zarr v3 sharded vs unsharded stores — object count, write, read
(round 9).

Why it matters at 100 TB: with small analysis-friendly chunks (the
read-pattern-optimal ~1-16 MB), an unsharded store needs one object PER
CHUNK — billions of PUTs to publish, billions of keys to list, and
object-store request pricing on every one.  ``sharding_indexed`` packs
an inner-chunk grid into one indexed object, dividing the object count
by the inner-grid size while readers keep chunk-granular access through
the shard index (range reads on a real object store; here the whole
shard is one task anyway, which is the Spark-scan shape).

Measures, on a dense (time, lat, lon) grid written through the
DISTRIBUTED sink both ways:
  * objects written (files on disk)
  * publish wall seconds (same single-shuffle plan both ways)
  * full-scan decode wall seconds via decode_zarr_long
  * on-disk bytes (the shard index overhead is 16 B/inner chunk)

Wall-clock caveat (same as every ab_ script here): one box hides I/O
wins behind task parallelism — the OBJECT-COUNT ratio is the 100 TB
story; the timings prove sharding costs nothing to produce or read.

Usage: python scripts/ab_sharding.py [nt] [nlat] [nlon]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.session import get_session  # noqa: E402
from gridded_etl_tools_spark.sinks.zarr_sink import (  # noqa: E402
    write_zarr_distributed,
)
from gridded_etl_tools_spark.sources import zarr2  # noqa: E402


def _tree_stats(root: str, var: str) -> tuple[int, int]:
    n_files = n_bytes = 0
    for dirpath, _dn, files in os.walk(os.path.join(root, var)):
        for f in files:
            if f == "zarr.json":
                continue
            n_files += 1
            n_bytes += os.path.getsize(os.path.join(dirpath, f))
    return n_files, n_bytes


def main() -> None:
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nlat = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    nlon = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    spark = get_session("ab_sharding")

    cells = nt * nlat * nlon
    df = (
        spark.range(cells)
        .select(
            (F.col("id") % nt).cast("double").alias("time"),
            (F.floor(F.col("id") / nt) % nlat).cast("double").alias("latitude"),
            F.floor(F.col("id") / (nt * nlat)).cast("double").alias("longitude"),
            (F.sin(F.col("id") / 1000.0) * 40).alias("value"),
        )
        .localCheckpoint(eager=True)  # time the WRITE, not the generator
    )

    chunks = (8, 10, 10)       # analysis-friendly small chunks
    shards = (32, 30, 30)      # 4x3x3 = 36 inner chunks per object
    report: dict = {"cells": cells, "chunks": chunks, "shards": shards}

    for label, kw in (
        ("unsharded", {}),
        ("sharded", {"shards": shards}),
    ):
        root = os.path.join(tempfile.mkdtemp(), f"{label}.zarr")
        t0 = time.perf_counter()
        write_zarr_distributed(
            df, root, "v", dims=("time", "latitude", "longitude"),
            chunks=chunks, zarr_format=3, compressor="gzip", **kw,
        )
        write_s = time.perf_counter() - t0
        n_files, n_bytes = _tree_stats(root, "v")
        t0 = time.perf_counter()
        n_rows = zarr2.decode_zarr_long(spark, root, "v").count()
        read_s = time.perf_counter() - t0
        assert n_rows == cells
        report[label] = {
            "objects": n_files,
            "mb_on_disk": round(n_bytes / 1e6, 2),
            "write_s": round(write_s, 2),
            "full_scan_s": round(read_s, 2),
        }
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)

    report["object_ratio"] = round(
        report["unsharded"]["objects"] / report["sharded"]["objects"], 1
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
