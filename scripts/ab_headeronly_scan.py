#!/usr/bin/env python3
"""A/B: kerchunkify_scan refs production — whole-archive reads vs the
header-only ranged scan (round 11, closing the r10 perf nit).

Why it matters at 100 TB: refs production over a raw NetCDF3 archive
parses KB-scale headers, but the r10 scan read WHOLE files through
``binaryFile`` to get them — an archive-proportional I/O bill for
header-proportional work.  The r11 scan reads only ``path``/``length``
from the listing (content column pruned from the plan) and each task
ranged-reads a 64 KB prefix, escalating x4 only when the header parse
reports truncation.  This measures both on the SAME generated archive
and proves the refs agree byte-for-byte.

Usage: python scripts/ab_headeronly_scan.py [n_files] [records_per_file]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from gridded_etl_tools_spark.session import get_session  # noqa: E402
from gridded_etl_tools_spark.sources import kerchunk, netcdf3 as nc  # noqa: E402


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_rec = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    nlat, nlon = 180, 360  # ~0.5 MB per record slab
    spark = get_session("ab_headeronly_scan")
    d = tempfile.mkdtemp(prefix="ab_headeronly_")
    try:
        for i in range(n_files):
            data = (
                np.arange(n_rec * nlat * nlon, dtype="f8")
                .reshape(n_rec, nlat, nlon)
                + i
            )
            nc.write_netcdf3(
                os.path.join(d, f"era_{i:03d}.nc"),
                dims={"time": None, "latitude": nlat, "longitude": nlon},
                variables={
                    "time": (("time",), nc.NC_DOUBLE, {},
                             np.arange(n_rec, dtype="f8") + i * n_rec),
                    "latitude": (("latitude",), nc.NC_DOUBLE, {},
                                 np.arange(nlat, dtype="f8")),
                    "longitude": (("longitude",), nc.NC_DOUBLE, {},
                                  np.arange(nlon, dtype="f8")),
                    "precip": (("time", "latitude", "longitude"),
                               nc.NC_DOUBLE, {}, data),
                },
            )
        archive_bytes = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        )

        # A: whole-file reads (what r10 did), same per-file kerchunkify
        t0 = time.time()
        full_docs = []
        for f in sorted(os.listdir(d)):
            buf = open(os.path.join(d, f), "rb").read()
            full_docs.append(
                kerchunk.kerchunkify_netcdf3(buf, os.path.join(d, f))
            )
        t_full = time.time() - t0

        # B: the distributed header-only scan
        t0 = time.time()
        docs, stats = kerchunk.kerchunkify_scan(
            spark, d, glob="*.nc", return_stats=True
        )
        t_scan = time.time() - t0
        scan_bytes = sum(br for _p, br, _s in stats)

        assert docs == full_docs, "header-only refs != whole-file refs"
        merged = kerchunk.merge_refs_concat(docs, "time")
        n_refs = sum(
            1 for k in merged
            if k.startswith("precip/") and not k.endswith(("zarray", "zattrs"))
        )
        print(json.dumps({
            "metric": "headeronly_scan",
            "n_files": n_files,
            "archive_mb": round(archive_bytes / 1e6, 1),
            "scan_read_mb": round(scan_bytes / 1e6, 3),
            "io_reduction_x": round(archive_bytes / scan_bytes, 1),
            "t_fullread_s": round(t_full, 2),
            "t_headeronly_s": round(t_scan, 2),
            "merged_data_refs": n_refs,
            "refs_identical": True,
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
