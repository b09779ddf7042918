#!/usr/bin/env python3
"""Runnable demo of the full ingest surface: ONE synthetic grid written
as eight different real on-disk formats, every format decoded back
through its Spark front door, all eight proven cell-identical, then
published and rolled into a climate index.

  grid → netcdf3 / netcdf4(hdf5) / geotiff / zarr v2 / zarr v3 /
         kerchunk refs / blosc-lz4 zarr (the reference's default
         compressor) / XChaCha20-Poly1305-encrypted zarr
       → per-format distributed decode (binaryFile + mapInPandas,
         chunk-parallel for the stores, manifest scan for kerchunk)
       → cross-format agreement check
       → GriddedTable publish → degree-day index

Usage: python scripts/demo_ingest_formats.py [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.session import get_session  # noqa: E402
from gridded_etl_tools_spark.sources import (  # noqa: E402
    geotiff,
    hdf5,
    kerchunk,
    netcdf3,
    zarr2,
)
from gridded_etl_tools_spark.sources.files import read_binary_files  # noqa: E402
from gridded_etl_tools_spark.sources.scan import scan_gridded  # noqa: E402


def fixture_grid():
    nt, nlat, nlon = 3, 4, 5
    idx = np.arange(nt * nlat * nlon, dtype="f8").reshape(nt, nlat, nlon)
    data = (idx * 7 % 101) / 4.0
    data[0, 0, 0] = -9999.0  # fill sentinel
    lats = 36.0 + 0.25 * np.arange(nlat)
    lons = -116.0 + 0.25 * np.arange(nlon)
    times = np.arange(nt, dtype="f8")
    return data, times, lats, lons


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ingest_demo_")
    os.makedirs(work, exist_ok=True)
    spark = get_session("ingest-demo")
    data, times, lats, lons = fixture_grid()
    dims = {"time": times, "latitude": lats, "longitude": lons}
    frames = {}

    # -- NetCDF3 (classic CDF) ------------------------------------------------
    nc_path = os.path.join(work, "grid.nc")
    netcdf3.write_netcdf3(
        nc_path,
        dims={"time": None, "latitude": lats.size, "longitude": lons.size},
        variables={
            **{
                n: ((n,), netcdf3.NC_DOUBLE, {}, v) for n, v in dims.items()
            },
            "precip": (
                ("time", "latitude", "longitude"), netcdf3.NC_DOUBLE,
                {"_FillValue": (netcdf3.NC_DOUBLE, -9999.0)}, data,
            ),
        },
    )
    frames["netcdf3"] = scan_gridded(
        spark, nc_path, data_var="precip", glob="*.nc",
        dims=["time", "latitude", "longitude"],
    )

    # -- NetCDF4 / HDF5 -------------------------------------------------------
    nc4_path = os.path.join(work, "grid.h5")
    hdf5.write_hdf5(
        nc4_path,
        {
            **{n: ((n,), v, {}) for n, v in dims.items()},
            "precip": (
                ("time", "latitude", "longitude"), data,
                {"_FillValue": np.float64(-9999.0)},
            ),
        },
        chunk_shapes={"precip": (2, 3, 3)},
        compress=True,
    )
    frames["netcdf4"] = scan_gridded(
        spark, nc4_path, data_var="precip", glob="*.h5",
        dims=["time", "latitude", "longitude"],
    )

    # -- GeoTIFF (one file per time slice, time from filename) ----------------
    tif_dir = os.path.join(work, "tifs")
    os.makedirs(tif_dir, exist_ok=True)
    for it, t in enumerate(times):
        # GeoTIFF is north-up: row 0 = max latitude, so flip the
        # ascending-latitude grid before writing
        geotiff.write_geotiff(
            os.path.join(tif_dir, f"slice_t{int(t)}.tif"),
            np.flipud(np.asarray(data[it])),
            lon0=float(lons[0]), lat0=float(lats[-1]), dx=0.25, dy=0.25,
            nodata=-9999.0, compression=8,
        )
    tif = geotiff.decode_geotiff_long(
        read_binary_files(spark, tif_dir, glob="*.tif")
    )
    frames["geotiff"] = tif.withColumn(
        "time",
        F.regexp_extract(F.col("path"), r"slice_t(\d+)\.tif", 1).cast("double"),
    ).select("path", "time", "latitude", "longitude", "value")

    # -- Zarr v2 (distributed-writable store) ---------------------------------
    z2_root = os.path.join(work, "grid_v2.zarr")
    zarr2.write_zarr_store(
        z2_root,
        variables={
            **{n: ((n,), v, {}) for n, v in dims.items()},
            "precip": (
                ("time", "latitude", "longitude"), data,
                {"_FillValue": -9999.0},
            ),
        },
        chunks={"precip": (2, 3, 2)},
        fill_values={"precip": -9999.0},
    )
    frames["zarr_v2"] = zarr2.decode_zarr_long(spark, z2_root, "precip")

    # -- Zarr v3 --------------------------------------------------------------
    z3_root = os.path.join(work, "grid_v3.zarr")
    zarr2.write_zarr3_store(
        z3_root,
        variables={
            **{n: ((n,), v, {}) for n, v in dims.items()},
            "precip": (
                ("time", "latitude", "longitude"), data,
                {"_FillValue": -9999.0},
            ),
        },
        chunks={"precip": (2, 3, 2)},
        fill_values={"precip": -9999.0},
    )
    frames["zarr_v3"] = zarr2.decode_zarr_long(spark, z3_root, "precip")

    # -- Kerchunk refs over the v2 store --------------------------------------
    refs = kerchunk.build_refs_for_zarr_store(z2_root)
    frames["kerchunk"] = kerchunk.decode_kerchunk_long(spark, refs, "precip")

    # -- Blosc-LZ4 store (the reference's DEFAULT compressor, r8) -------------
    zb_root = os.path.join(work, "grid_blosc.zarr")
    zarr2.write_zarr_store(
        zb_root,
        variables={
            **{n: ((n,), v, {}) for n, v in dims.items()},
            "precip": (
                ("time", "latitude", "longitude"), data,
                {"_FillValue": -9999.0},
            ),
        },
        chunks={"precip": (2, 3, 2)},
        fill_values={"precip": -9999.0},
        compressor="blosc",
    )
    frames["blosc"] = zarr2.decode_zarr_long(spark, zb_root, "precip")

    # -- Encrypted store (the reference's EncryptionFilter, r8) ---------------
    from gridded_etl_tools_spark.functions.encryption import (
        register_encryption_key,
    )

    key_digest = register_encryption_key(os.urandom(32))
    ze_root = os.path.join(work, "grid_encrypted.zarr")
    zarr2.write_zarr_store(
        ze_root,
        variables={
            **{n: ((n,), v, {}) for n, v in dims.items()},
            "precip": (
                ("time", "latitude", "longitude"), data,
                {"_FillValue": -9999.0},
            ),
        },
        chunks={"precip": (2, 3, 2)},
        fill_values={"precip": -9999.0},
        compressor="blosc",
        encryption_key_hash=key_digest,
        encrypt_vars=("precip",),
    )
    frames["encrypted"] = zarr2.decode_zarr_long(spark, ze_root, "precip")

    # -- cross-format agreement ----------------------------------------------
    def canon(df):
        return {
            (round(r.time, 6), round(r.latitude, 6), round(r.longitude, 6)):
            None if r.value is None else round(r.value, 6)
            for r in df.select("time", "latitude", "longitude", "value").collect()
        }

    baseline = canon(frames["netcdf3"])
    assert len(baseline) == data.size
    for name, df in frames.items():
        got = canon(df)
        assert got == baseline, f"{name} disagrees with netcdf3"
        print(f"{name:9s} -> {len(got)} cells OK (fill -> NULL preserved)")

    # -- publish + index ------------------------------------------------------
    from gridded_etl_tools_spark.operators import climate

    daily = climate.daily_index(
        frames["zarr_v2"].filter(F.col("value").isNotNull()).withColumn(
            "ts", F.timestamp_seconds(F.col("time") * 86400)
        ),
        station_col="latitude", ts_col="ts", value_col="value",
    )
    dd = climate.degree_days(daily, base=10.0).orderBy("station")
    print("\ndegree days per latitude band (base 10):")
    for r in dd.collect():
        print(f"  lat {r.station:6.2f}: n={r.n_days} hdd={r.hdd} cdd={r.cdd}")

    shutil.rmtree(work, ignore_errors=True)
    print("\nALL FORMATS AGREE")


if __name__ == "__main__":
    main()
