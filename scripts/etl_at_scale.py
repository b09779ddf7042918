#!/usr/bin/env python3
"""ETL-at-scale benchmark (r5 verdict item 5): a CHIRPS-shaped slice —
one classic-NetCDF3 daily file per day over the CHIRPS US 0.25° grid
(104 × 236 = 24,544 points/day) — pushed through the FULL manager
lifecycle with every gate on:

  synth raw files → manager.transform (magic-byte front door decode,
  sentinel→NULL, longitude standardization) → pre-parse QC (cadence +
  value bounds) → initial publish (sorted parquet, atomic manifest
  commit) → post-parse written-value audit (A7/A8 join-back, FULL
  population, not the reference's 100-point sample)

Each stage is timed separately and ONE JSON line is printed, recorded
in BASELINE.md next to the reference's "a few hours on a well powered
machine" anecdote for the same dataset class (reference README
Quickstart).

Usage: python scripts/etl_at_scale.py [n_days] [workdir]
  n_days defaults to 3650 (10 years ≈ 90M points ≈ 1.2 GB raw).
  18250 (50 years ≈ 448M points) reproduces the full-archive shape.
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.manager import DatasetManager  # noqa: E402
from gridded_etl_tools_spark.operators import qc as qc_ops  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402
from gridded_etl_tools_spark.sources import netcdf3 as nc  # noqa: E402

# CHIRPS US 0.25°: lat 24..49.75 (104), lon 235..293.75 (236, 0-360 form)
LATS = np.arange(24.0, 50.0, 0.25)
LONS = np.arange(235.0, 294.0, 0.25)
SENTINEL = -9999.0
EPOCH = dt.datetime(1981, 1, 1)


class ChirpsScale(DatasetManager):
    dataset_name = "chirps_scale_bench"
    data_var = "precip"
    unit = "mm"
    missing_value = SENTINEL
    spatial_resolution = 0.25
    time_resolution = "daily"
    time_epoch = EPOCH


def synth(raw_dir: str, n_days: int) -> int:
    """One NetCDF3 file per day, float32 grid, ~2% sentinel cells,
    integer-scaled values inside the mm bounds."""
    rng = np.random.default_rng(7)
    n_pts = LATS.size * LONS.size
    for d in range(n_days):
        data = (rng.random((1, LATS.size, LONS.size)) * 50).astype("f4")
        mask = rng.random((1, LATS.size, LONS.size)) < 0.02
        data[mask] = SENTINEL
        nc.write_netcdf3(
            f"{raw_dir}/chirps-{d:05d}.nc",
            dims={
                "time": None,
                "latitude": LATS.size,
                "longitude": LONS.size,
            },
            variables={
                "latitude": (("latitude",), nc.NC_DOUBLE, {}, LATS),
                "longitude": (("longitude",), nc.NC_DOUBLE, {}, LONS),
                "time": (
                    ("time",), nc.NC_DOUBLE,
                    {"units": (nc.NC_CHAR, "days since 1981-01-01")},
                    np.array([float(d)]),
                ),
                "precip": (
                    ("time", "latitude", "longitude"), nc.NC_FLOAT,
                    {"_FillValue": (nc.NC_FLOAT, SENTINEL)}, data,
                ),
            },
        )
    return n_days * n_pts


def main() -> None:
    n_days = int(sys.argv[1]) if len(sys.argv) > 1 else 3650
    workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="etl_at_scale_"
    )
    raw = f"{workdir}/raw"
    tbl = f"{workdir}/table"
    shutil.rmtree(raw, ignore_errors=True)
    shutil.rmtree(tbl, ignore_errors=True)
    import os

    os.makedirs(raw, exist_ok=True)

    t0 = time.time()
    n_points = synth(raw, n_days)
    t_synth = time.time() - t0

    spark = get_session()
    m = ChirpsScale(tbl)

    # transform + pre-parse QC + publish — run_etl with every gate on;
    # cadence gate gets the daily delta, value bounds come from unit=mm
    t1 = time.time()
    update = m.transform(spark, raw)
    r = m.parse(update, expected_delta=dt.timedelta(days=1))
    t_etl = time.time() - t1
    assert r["mode"] == "initial", r

    # post-parse audit: written values re-joined to the (re-decoded)
    # source over the FULL population — the reference samples 100 points
    t2 = time.time()
    mism = qc_ops.written_value_mismatches(
        m.table.read(spark),
        m.transform(spark, raw),
        keys=["time", "latitude", "longitude"],
        value_col="precip",
    ).count()
    t_audit = time.time() - t2
    assert mism == 0, f"{mism} written-value mismatches"

    n_written = m.table.read(spark).count()

    # incremental append — the reference's daily operational mode: one
    # month of new files lands, the update splits as pure append, QC
    # gates (cadence vs the stored extent, update position) run, and
    # only the NEW data + manifest are written
    raw2 = f"{workdir}/raw_append"
    shutil.rmtree(raw2, ignore_errors=True)
    os.makedirs(raw2, exist_ok=True)
    rng = np.random.default_rng(11)
    for d in range(n_days, n_days + 30):
        data = (rng.random((1, LATS.size, LONS.size)) * 50).astype("f4")
        nc.write_netcdf3(
            f"{raw2}/chirps-{d:05d}.nc",
            dims={
                "time": None,
                "latitude": LATS.size,
                "longitude": LONS.size,
            },
            variables={
                "latitude": (("latitude",), nc.NC_DOUBLE, {}, LATS),
                "longitude": (("longitude",), nc.NC_DOUBLE, {}, LONS),
                "time": (
                    ("time",), nc.NC_DOUBLE,
                    {"units": (nc.NC_CHAR, "days since 1981-01-01")},
                    np.array([float(d)]),
                ),
                "precip": (
                    ("time", "latitude", "longitude"), nc.NC_FLOAT,
                    {"_FillValue": (nc.NC_FLOAT, SENTINEL)}, data,
                ),
            },
        )
    t3 = time.time()
    r2 = m.run_etl(spark, raw2, expected_delta=dt.timedelta(days=1))
    t_append = time.time() - t3
    assert r2["mode"] == "update" and r2["n_appended_times"] == 30, r2

    # reader latency: one 6-key point query against the full table —
    # manifest time-range pruning + parquet row-group skipping must
    # keep this independent of archive size
    t4 = time.time()
    probe_day = EPOCH + dt.timedelta(days=n_days // 2)
    got = (
        m.table.read(
            spark,
            time_lo=probe_day,
            time_hi=probe_day,
        )
        .filter(
            (F.col("latitude") == 36.0) & (F.col("longitude") == -115.0)
        )
        .collect()
    )
    t_point = time.time() - t4
    assert len(got) == 1

    print(json.dumps({
        "bench": "etl_at_scale",
        "n_files": n_days,
        "n_points": n_points,
        "n_written": n_written,
        "t_synth_s": round(t_synth, 1),
        "t_etl_s": round(t_etl, 1),       # decode + QC + publish commit
        "t_audit_s": round(t_audit, 1),   # full-population A7/A8 audit
        "t_append_month_s": round(t_append, 1),  # incremental append
        "t_point_query_s": round(t_point, 2),    # pruned 6-key lookup
        "etl_points_per_s": round(n_points / t_etl),
    }))


if __name__ == "__main__":
    main()
