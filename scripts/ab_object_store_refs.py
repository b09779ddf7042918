#!/usr/bin/env python3
"""Scale audit: parquet-refs on an OBJECT-STORE root — who performs
the object operations?  (round 13, verdict r12 missing #2)

Why it matters at 100 TB: an object-store-backed reference store is
only scale-safe if the DRIVER's operation count stays flat while the
executors own the data plane.  This instruments the driver's ControlFS
handle (every read/write/list/exists it performs) across a fresh
write, an append, and a full decode against a ``gs://``-style root
(DirObjectControlFS — same code path as S3/GCS/Azure, state on local
disk so executor writes are countable too), at two archive sizes.
The claim checked: driver ops grow with COORDINATE slabs and variable
count only — never with the number of data slabs or eras — while the
executor-side object count carries the whole data plane.

Prints ONE JSON line.

Usage: python scripts/ab_object_store_refs.py [n_eras_small] [n_eras_big]
"""

from __future__ import annotations

import functools
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from gridded_etl_tools_spark.session import get_session  # noqa: E402
from gridded_etl_tools_spark.sinks import fsio  # noqa: E402
from gridded_etl_tools_spark.sources import kerchunk  # noqa: E402
from gridded_etl_tools_spark.sources import netcdf3 as nc  # noqa: E402


class CountingFS(fsio.DirObjectControlFS):
    """Driver-handle proxy: counts every ControlFS call the DRIVER
    makes.  Executor tasks build their own (uncounted) handles via the
    fs_factory, so the counter isolates driver-side work."""

    def __init__(self, scheme_root: str, local_dir: str) -> None:
        super().__init__(scheme_root, local_dir)
        self.ops: dict[str, int] = {}

    def _count(self, op: str) -> None:
        self.ops[op] = self.ops.get(op, 0) + 1


for _op in (
    "read_text", "read_bytes", "write_atomic", "compare_and_swap",
    "exists", "isdir", "list_names", "walk_files", "mtime", "remove",
):
    def _wrap(name):
        base = getattr(fsio.DirObjectControlFS, name)

        def method(self, *a, **kw):
            self._count(name)
            return base(self, *a, **kw)

        return method

    setattr(CountingFS, _op, _wrap(_op))


def _era(d: str, it: int, n_rec: int = 8, nlat: int = 30, nlon: int = 40):
    data = (
        np.arange(n_rec * nlat * nlon, dtype="f8")
        .reshape(n_rec, nlat, nlon) % 977 + it
    )
    nc.write_netcdf3(
        os.path.join(d, f"era_{it:04d}.nc"),
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


def _run(spark, d: str, n_eras: int) -> dict:
    era_dir = os.path.join(d, f"eras_{n_eras}")
    os.makedirs(era_dir)
    for i in range(n_eras):
        _era(era_dir, i)
    new_dir = os.path.join(d, f"new_{n_eras}")
    os.makedirs(new_dir)
    _era(new_dir, n_eras)

    bucket = os.path.join(d, f"bucket_{n_eras}")
    root = "gs://ab-bucket/store"
    fs = CountingFS("gs://ab-bucket", bucket)
    factory = functools.partial(
        fsio.DirObjectControlFS, "gs://ab-bucket", bucket
    )
    out: dict = {"eras": n_eras}

    t0 = time.time()
    kerchunk.kerchunkify_to_parquet_refs(
        spark, era_dir, root, "time", glob="*.nc", record_size=8,
        fs=fs, fs_factory=factory,
    )
    out["write_seconds"] = round(time.time() - t0, 2)
    out["write_driver_ops"] = sum(fs.ops.values())

    fs.ops.clear()
    t0 = time.time()
    kerchunk.append_to_parquet_refs(
        spark, new_dir, root, "time", glob="*.nc",
        fs=fs, fs_factory=factory,
    )
    out["append_seconds"] = round(time.time() - t0, 2)
    out["append_driver_ops"] = sum(fs.ops.values())

    fs.ops.clear()
    t0 = time.time()
    n_rows = kerchunk.decode_parquet_refs(
        spark, root, "precip", fs=fs, fs_factory=factory
    ).count()
    out["decode_seconds"] = round(time.time() - t0, 2)
    out["decode_driver_ops"] = sum(fs.ops.values())
    out["decoded_rows"] = n_rows

    # total objects in the bucket = the data plane the EXECUTORS wrote
    total = sum(len(fns) for _, _, fns in os.walk(bucket))
    out["bucket_objects"] = total
    return out


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_session("ab_object_store_refs")
    d = tempfile.mkdtemp(prefix="ab_objstore_")
    try:
        small = _run(spark, d, n_small)
        big = _run(spark, d, n_big)
        # THE claim: driver ops flat across a {x}x archive growth while
        # the bucket's object count (executor data plane) scales
        print(json.dumps({
            "metric": "object_store_driver_ops_flat",
            "small": small,
            "big": big,
            "driver_ops_ratio_write": round(
                big["write_driver_ops"] / max(1, small["write_driver_ops"]), 2
            ),
            "bucket_objects_ratio": round(
                big["bucket_objects"] / max(1, small["bucket_objects"]), 2
            ),
            "eras_ratio": round(big["eras"] / small["eras"], 2),
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
