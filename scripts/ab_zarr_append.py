#!/usr/bin/env python3
"""A/B: distributed vs single-process zarr append (r7).

The reference's cadence append funnels every chunk of the new slice
through one writer (``to_zarr`` in one process; this repo's
``zarr2.append_time_chunks`` reproduces that shape).
``append_zarr_distributed`` writes the same chunks executor-parallel —
one chunk-key shuffle over the new cells, nothing proportional to the
existing store.

Measures, on a (T x S) float64 grid:
  * initial distributed publish of the first half
  * distributed append of the second half (wall)
  * single-process append of the same slice (wall) — the driver
    materializes the slice as one ndarray first, which is itself the
    scaling wall the distributed form removes
  * decode equality spot-check

Usage: python scripts/ab_zarr_append.py [times] [stations]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.session import get_session  # noqa: E402
from gridded_etl_tools_spark.sinks.zarr_sink import (  # noqa: E402
    append_zarr_distributed,
    write_zarr_distributed,
)
from gridded_etl_tools_spark.sources import zarr2  # noqa: E402

ROOT = "/tmp/spark_graft_zarr_append_ab"


def main() -> None:
    n_t = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_s = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
    spark = get_session("ab_zarr_append")
    half = n_t // 2
    cshape = (16, 2_000)

    def grid(t_lo, t_hi):
        return (
            spark.range(t_lo * n_s, t_hi * n_s)
            .select(
                (F.col("id") / n_s).cast("int").cast("double").alias("t"),
                (F.col("id") % n_s).cast("double").alias("s"),
                (F.pmod(F.hash("id"), 10_000) / 10.0).alias("value"),
            )
        )

    out = {"times": n_t, "stations": n_s, "cells": n_t * n_s}
    for tag in ("dist", "single"):
        root = f"{ROOT}_{tag}"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.time()
        write_zarr_distributed(
            grid(0, half), root, "v", dims=["t", "s"], chunks=cshape
        )
        out[f"publish_{tag}_s"] = round(time.time() - t0, 1)

        t0 = time.time()
        if tag == "dist":
            append_zarr_distributed(grid(half, n_t), root, "v")
        else:
            # single-process shape: collect the slice into one ndarray
            # (the driver-memory wall), then sequential chunk writes
            rows = (
                grid(half, n_t)
                .orderBy("t", "s")
                .select("value")
                .toPandas()["value"]
                .to_numpy()
            )
            block = rows.reshape(n_t - half, n_s)
            zarr2.append_time_chunks(
                root, "v", "t",
                np.arange(half, n_t, dtype="f8"), block,
            )
        out[f"append_{tag}_s"] = round(time.time() - t0, 1)

    # equality spot-check between the two stores
    a = zarr2.decode_zarr_long(spark, f"{ROOT}_dist", "v")
    b = zarr2.decode_zarr_long(spark, f"{ROOT}_single", "v")
    out["stores_equal"] = (
        a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    )
    out["speedup"] = round(
        out["append_single_s"] / max(out["append_dist_s"], 0.1), 1
    )
    print(json.dumps(out))
    for tag in ("dist", "single"):
        shutil.rmtree(f"{ROOT}_{tag}", ignore_errors=True)


if __name__ == "__main__":
    main()
