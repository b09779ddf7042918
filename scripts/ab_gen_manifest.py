#!/usr/bin/env python3
"""A/B: kerchunk ``gen`` expansion — driver-side dict vs JVM codegen
manifest (round 10).

Why it matters at 100 TB: a reference dataset's gen section can
describe 10^8-10^9 chunks.  The driver expansion materializes a Python
dict (the same size the materialized JSON would be); the distributed
path plans ``spark.range(n)`` + whole-stage-codegen arithmetic — O(1)
driver memory at any n.  This measures both on the SAME gen document
and proves they agree (row count + offset checksum), then runs the JVM
path alone at 10x the size the driver path was measured at.

Usage: python scripts/ab_gen_manifest.py [n_driver] [jvm_multiplier]
"""

from __future__ import annotations

import json
import os
import sys
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.session import get_session  # noqa: E402
from gridded_etl_tools_spark.sources import kerchunk  # noqa: E402


def _doc(nt: int, ny: int, nx: int) -> dict:
    return {
        "version": 1,
        "refs": {},
        "templates": {"u": "/archive"},
        "gen": [
            {
                "key": "v/{{t}}.{{y}}.{{x}}",
                "url": "{{u}}/era{{t // 1000}}.bin",
                "offset": "{{(( t * %d + y) * %d + x) * 4096}}" % (ny, nx),
                "length": "4096",
                "dimensions": {
                    "t": {"stop": nt},
                    "y": {"stop": ny},
                    "x": {"stop": nx},
                },
            }
        ],
    }


def main() -> None:
    n_driver = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    ny, nx = 100, 100
    nt = max(1, n_driver // (ny * nx))
    if nt * ny * nx != n_driver:
        print(
            f"# note: measuring {nt * ny * nx} refs "
            f"(nearest (t,100,100) grid to {n_driver})",
            file=sys.stderr,
        )
    doc = _doc(nt, ny, nx)
    spark = get_session()
    out: dict[str, object] = {"n_refs": nt * ny * nx}

    tracemalloc.start()
    t0 = time.time()
    expanded = kerchunk._expand_gen(doc["gen"], doc["templates"])
    out["driver_expand_s"] = round(time.time() - t0, 3)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    out["driver_peak_mb"] = round(peak / 1e6, 1)
    drv_sum = sum(v[1] for v in expanded.values())
    n_drv = len(expanded)
    del expanded

    t0 = time.time()
    agg = (
        kerchunk.gen_manifest_distributed(spark, doc, "v")
        .agg(F.count("*").alias("n"), F.sum("offset").alias("s"))
        .collect()[0]
    )
    out["jvm_manifest_s"] = round(time.time() - t0, 3)
    out["agree"] = (agg.n == n_drv) and (int(agg.s) == drv_sum)

    # the scale the driver path cannot reach comfortably: JVM only
    big = _doc(nt * mult, ny, nx)
    t0 = time.time()
    agg = (
        kerchunk.gen_manifest_distributed(spark, big, "v")
        .agg(F.count("*").alias("n"))
        .collect()[0]
    )
    out["jvm_10x_s"] = round(time.time() - t0, 3)
    out["jvm_10x_refs"] = int(agg.n)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
