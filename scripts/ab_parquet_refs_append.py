#!/usr/bin/env python3
"""A/B: extending a parquet reference store by one day's files —
full re-merge (re-scan EVERY archive file) vs the incremental append
(round 12 ``append_to_parquet_refs``).

Why it matters at 100 TB: a daily ingest over an N-file archive pays
O(N) scan work per day under re-merge — quadratic over a year — while
the append path scans only the new files, reads the validation
template from the store's own metadata (the driver parses ZERO refs
docs), and rewrites only the tail slabs.  This measures both on the
SAME archive and proves the two stores decode identically.

Usage: python scripts/ab_parquet_refs_append.py [n_base] [n_new]
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
from gridded_etl_tools_spark.sources import kerchunk  # noqa: E402
from gridded_etl_tools_spark.sources import netcdf3 as nc  # noqa: E402


def _era(d: str, it: int, n_rec: int, nlat: int, nlon: int) -> None:
    data = (
        np.arange(n_rec * nlat * nlon, dtype="f8").reshape(n_rec, nlat, nlon)
        % 977
        + it
    )
    nc.write_netcdf3(
        os.path.join(d, f"era_{it}.nc"),
        dims={"time": None, "latitude": nlat, "longitude": nlon},
        variables={
            "time": (("time",), nc.NC_DOUBLE, {},
                     np.arange(n_rec, dtype="f8") + it * n_rec),
            "latitude": (("latitude",), nc.NC_DOUBLE, {},
                         np.arange(nlat, dtype="f8")),
            "longitude": (("longitude",), nc.NC_DOUBLE, {},
                          np.arange(nlon, dtype="f8")),
            "precip": (("time", "latitude", "longitude"),
                       nc.NC_DOUBLE, {}, data),
        },
    )


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    n_new = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_rec, nlat, nlon = 16, 60, 90
    spark = get_session("ab_parquet_refs_append")
    d = tempfile.mkdtemp(prefix="ab_pqappend_")
    try:
        base_dir = os.path.join(d, "base")
        new_dir = os.path.join(d, "new")
        all_dir = os.path.join(d, "all")
        for p in (base_dir, new_dir, all_dir):
            os.makedirs(p)
        for i in range(n_base):
            _era(base_dir, i, n_rec, nlat, nlon)
            _era(all_dir, i, n_rec, nlat, nlon)
        for i in range(n_base, n_base + n_new):
            _era(new_dir, i, n_rec, nlat, nlon)
            _era(all_dir, i, n_rec, nlat, nlon)

        # build the base store once (untimed for the comparison)
        root_inc = os.path.join(d, "store_inc")
        kerchunk.kerchunkify_to_parquet_refs(
            spark, base_dir, root_inc, "time", glob="*.nc"
        )

        # A: full re-merge of base+new into a fresh store
        root_full = os.path.join(d, "store_full")
        t0 = time.time()
        kerchunk.kerchunkify_to_parquet_refs(
            spark, all_dir, root_full, "time", glob="*.nc"
        )
        t_full = time.time() - t0

        # B: incremental append of the new files only
        t0 = time.time()
        summary = kerchunk.append_to_parquet_refs(
            spark, new_dir, root_inc, "time", glob="*.nc"
        )
        t_append = time.time() - t0

        # the two stores decode identically on a probe slice
        probe = f"time >= {n_base * n_rec - 8}"
        a = {
            (r.time, r.latitude, r.longitude): r.value
            for r in kerchunk.decode_parquet_refs(
                spark, root_full, "precip"
            ).where(probe).collect()
        }
        b = {
            (r.time, r.latitude, r.longitude): r.value
            for r in kerchunk.decode_parquet_refs(
                spark, root_inc, "precip"
            ).where(probe).collect()
        }
        assert a == b and len(a) == (8 + n_new * n_rec) * nlat * nlon

        print(json.dumps({
            "metric": "parquet_refs_append",
            "n_base_files": n_base,
            "n_new_files": n_new,
            "files_scanned_full": n_base + n_new,
            "files_scanned_append": summary["files"],
            "scan_reduction_x": round((n_base + n_new) / summary["files"], 1),
            "t_full_remerge_s": round(t_full, 2),
            "t_append_s": round(t_append, 2),
            "speedup_x": round(t_full / t_append, 1),
            "slabs_rewritten": summary["slabs"],
            "stores_identical": True,
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
