#!/usr/bin/env python3
"""A/B: multi-variable native zarr publish — ONE shuffle for all
variables vs one write_zarr_distributed call per variable (round 10).

Why it matters at 100 TB: an ERA5-shaped dataset carries 5-40 data
variables on one grid.  Per-variable publishes shuffle the dim columns
N times and scan the source N times; the list-valued ``data_var`` path
shuffles ONCE (the chunk-key exchange carries every variable's cell in
the same row) and each group writes all N chunk objects from the same
pass.  Exchange count is the scale story; the timings prove the fused
pass costs nothing extra on one box.

Measures, on a dense (time, lat, lon) grid with N value columns:
  * shuffled jobs (one vs N chunk-key exchanges, by construction)
  * publish wall seconds, fused vs per-variable loop
  * readback equality spot check

Usage: python scripts/ab_multivar.py [nt] [nlat] [nlon] [nvars]
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


def main() -> None:
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    nlat = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nlon = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    nvars = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    spark = get_session()

    names = [f"var_{i}" for i in range(nvars)]
    cols = [
        (F.col("t") * 3.0 + F.col("lat") * 0.5 + F.col("lon") * (i + 1))
        .alias(f"v{i}")
        for i in range(nvars)
    ]
    grid = (
        spark.range(nt)
        .selectExpr("CAST(id AS DOUBLE) AS t")
        .crossJoin(spark.range(nlat).selectExpr("CAST(id AS DOUBLE) AS lat"))
        .crossJoin(spark.range(nlon).selectExpr("CAST(id AS DOUBLE) AS lon"))
        .select("t", "lat", "lon", *cols)
        .localCheckpoint(eager=True)  # time the WRITE, not the generator
    )
    chunks = (8, 16, 16)
    work = tempfile.mkdtemp(prefix="ab_multivar_")
    out: dict[str, object] = {
        "cells": nt * nlat * nlon,
        "nvars": nvars,
        "chunks": chunks,
    }
    try:
        root_fused = os.path.join(work, "fused.zarr")
        t0 = time.time()
        write_zarr_distributed(
            grid, root_fused, names, dims=["t", "lat", "lon"],
            value_col=[f"v{i}" for i in range(nvars)], chunks=chunks,
        )
        out["fused_publish_s"] = round(time.time() - t0, 3)
        out["fused_exchanges"] = 1

        root_loop = os.path.join(work, "loop.zarr")
        t0 = time.time()
        for i, name in enumerate(names):
            write_zarr_distributed(
                grid.select("t", "lat", "lon", f"v{i}"),
                root_loop, name, dims=["t", "lat", "lon"],
                value_col=f"v{i}", chunks=chunks,
            )
        out["per_var_publish_s"] = round(time.time() - t0, 3)
        out["per_var_exchanges"] = nvars

        # readback equality spot check on the last variable
        a = {
            (r.t, r.lat, r.lon): r.value
            for r in zarr2.decode_zarr_long(
                spark, root_fused, names[-1]
            ).filter(F.col("t") < 2).collect()
        }
        b = {
            (r.t, r.lat, r.lon): r.value
            for r in zarr2.decode_zarr_long(
                spark, root_loop, names[-1]
            ).filter(F.col("t") < 2).collect()
        }
        out["readback_equal"] = a == b and len(a) > 0
        out["speedup"] = round(
            out["per_var_publish_s"] / max(out["fused_publish_s"], 1e-9), 2
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
