"""NetCDF3 decode path: format round-trip plus the reference's golden
end-to-end loop (``tests/system/test_chirps.py:186-271``): parse a real
on-disk .nc file, publish it, append a second file, and verify a point
select returns exactly the source array value (Las Vegas-style probe)
and that fill sentinels surfaced as NULL."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridded_etl_tools_spark.gridspec import GridSpec
from gridded_etl_tools_spark.operators.select import point_select
from gridded_etl_tools_spark.sinks.publish import publish
from gridded_etl_tools_spark.sinks.table import GriddedTable
from gridded_etl_tools_spark.sources import netcdf3 as nc
from gridded_etl_tools_spark.sources.files import read_binary_files

LATS = np.array([36.0, 36.25, 36.5, 36.75], dtype="f8")
LONS = np.array([-115.75, -115.5, -115.25, -115.0], dtype="f8")
EPOCH = dt.datetime(2024, 12, 1)


def _write_nc(path: str, day0: int, n_days: int, seed: int) -> np.ndarray:
    """A CHIRPS-shaped classic file: record time dim + float32 precip
    with a fill sentinel; returns the raw data array."""
    rng = np.random.default_rng(seed)
    data = (rng.random((n_days, LATS.size, LONS.size)) * 50).astype("f4")
    data[0, 0, 0] = -9999.0
    nc.write_netcdf3(
        path,
        dims={"time": None, "latitude": LATS.size, "longitude": LONS.size},
        variables={
            "latitude": (
                ("latitude",), nc.NC_DOUBLE,
                {"units": (nc.NC_CHAR, "degrees_north")}, LATS,
            ),
            "longitude": (("longitude",), nc.NC_DOUBLE, {}, LONS),
            "time": (
                ("time",), nc.NC_DOUBLE,
                {"units": (nc.NC_CHAR, "days since 2024-12-01")},
                np.arange(day0, day0 + n_days, dtype="f8"),
            ),
            "precip": (
                ("time", "latitude", "longitude"), nc.NC_FLOAT,
                {"_FillValue": (nc.NC_FLOAT, -9999.0)}, data,
            ),
        },
        attrs={"title": (nc.NC_CHAR, "synthetic CHIRPS-like")},
    )
    return data


def test_parse_round_trip(tmp_path):
    data = _write_nc(str(tmp_path / "a.nc"), 0, 3, seed=11)
    buf = (tmp_path / "a.nc").read_bytes()
    ds = nc.parse_netcdf3(buf)
    assert ds.dims == {"time": 3, "latitude": LATS.size, "longitude": LONS.size}
    v = ds.variables["precip"]
    assert v.dimensions == ("time", "latitude", "longitude")
    assert np.allclose(v.data[1:], data[1:])
    unpacked = nc.cf_unpack(v)
    assert np.isnan(unpacked[0, 0, 0])  # fill -> NaN
    assert ds.variables["time"].attrs["units"] == "days since 2024-12-01"


def test_cf_scale_offset(tmp_path):
    """Packed-integer variable: scale_factor/add_offset unpacking."""
    packed = np.array([[0, 100], [200, -32768]], dtype="i2")
    nc.write_netcdf3(
        str(tmp_path / "p.nc"),
        dims={"y": 2, "x": 2},
        variables={
            "t2m": (
                ("y", "x"), nc.NC_SHORT,
                {
                    "scale_factor": (nc.NC_DOUBLE, 0.01),
                    "add_offset": (nc.NC_DOUBLE, 273.15),
                    "_FillValue": (nc.NC_SHORT, -32768),
                },
                packed,
            )
        },
    )
    ds = nc.parse_netcdf3((tmp_path / "p.nc").read_bytes())
    out = nc.cf_unpack(ds.variables["t2m"])
    assert np.isclose(out[0, 0], 273.15)
    assert np.isclose(out[0, 1], 274.15)
    assert np.isnan(out[1, 1])


def _decoded(spark, directory: str):
    """binaryFile scan -> distributed decode -> publishable frame."""
    files = read_binary_files(spark, directory, glob="*.nc")
    long = nc.decode_netcdf3_long(files, "precip", ["time", "latitude", "longitude"])
    return long.select(
        F.timestamp_seconds(
            # session timezone is UTC (session.py): naive literals and
            # epoch seconds agree
            F.lit(EPOCH.replace(tzinfo=dt.timezone.utc).timestamp())
            + F.col("time") * 86400.0
        ).alias("time"),
        "latitude",
        "longitude",
        F.col("value"),
    )


@pytest.fixture()
def nc_spec() -> GridSpec:
    return GridSpec(
        dataset_name="nc_precip",
        data_var="value",
        spatial_resolution=0.25,
        missing_value=-9999.0,
        time_resolution="daily",
    )


def test_netcdf_initial_append_golden_point(spark, nc_spec, tmp_path):
    """The reference's core loop: ETL file A (initial write), ETL file B
    (append), then verify a point select equals the source array value
    and the fill cell surfaced as NULL."""
    src = tmp_path / "in_a"
    src.mkdir()
    data_a = _write_nc(str(src / "chirps_2024-12-01.nc"), 0, 3, seed=21)

    table = GriddedTable(str(tmp_path / "tbl"))
    r1 = publish(table, _decoded(spark, str(src)), nc_spec,
                 expected_delta=dt.timedelta(days=1))
    assert r1["mode"] == "initial"

    src_b = tmp_path / "in_b"
    src_b.mkdir()
    data_b = _write_nc(str(src_b / "chirps_2024-12-04.nc"), 3, 2, seed=22)
    r2 = publish(table, _decoded(spark, str(src_b)), nc_spec,
                 expected_delta=dt.timedelta(days=1))
    assert r2["mode"] == "update" and r2["n_appended_times"] == 2

    out = table.read(spark)
    assert out.count() == 5 * LATS.size * LONS.size

    # golden point probes, one from each source file (reference checks
    # the parsed store against the original .nc array value)
    probe_a = point_select(
        out,
        time=EPOCH + dt.timedelta(days=1),
        latitude=float(LATS[2]),
        longitude=float(LONS[3]),
    ).collect()
    assert len(probe_a) == 1
    assert probe_a[0]["value"] == pytest.approx(float(data_a[1, 2, 3]), rel=1e-6)

    probe_b = point_select(
        out,
        time=EPOCH + dt.timedelta(days=4),
        latitude=float(LATS[1]),
        longitude=float(LONS[2]),
    ).collect()
    assert probe_b[0]["value"] == pytest.approx(float(data_b[1, 1, 2]), rel=1e-6)

    # fill sentinel -> NULL survives the whole pipeline (S12)
    filled = point_select(
        out, time=EPOCH, latitude=float(LATS[0]), longitude=float(LONS[0])
    ).collect()
    assert len(filled) == 1 and filled[0]["value"] is None


def test_decode_is_distributed_not_collected(spark, tmp_path):
    """Many files decode as independent tasks: the plan is a mapInPandas
    over the binary scan — no driver-side loop."""
    src = tmp_path / "many"
    src.mkdir()
    for i in range(4):
        _write_nc(str(src / f"f{i}.nc"), 3 * i, 3, seed=i)
    files = read_binary_files(spark, str(src), glob="*.nc")
    long = nc.decode_netcdf3_long(files, "precip", ["time", "latitude", "longitude"])
    assert long.count() == 4 * 3 * LATS.size * LONS.size
    assert "MapInPandas" in long._jdf.queryExecution().executedPlan().toString()
    # every file contributed its own path
    assert long.select("path").distinct().count() == 4


def test_cdf5_round_trip(tmp_path):
    """64-bit-data CDF-5 variant: 64-bit counts/sizes/dimids plus the
    unsigned and 64-bit external types (the PnetCDF format extension)."""
    data = np.arange(24, dtype="u8").reshape(2, 3, 4) * 3
    nc.write_netcdf3(
        str(tmp_path / "c5.nc"),
        dims={"time": None, "y": 3, "x": 4},
        variables={
            "time": (("time",), nc.NC_INT64, {}, np.arange(2, dtype="i8")),
            "y": (("y",), nc.NC_DOUBLE, {}, np.arange(3, dtype="f8")),
            "x": (("x",), nc.NC_USHORT, {}, np.arange(4, dtype="u2")),
            "v": (
                ("time", "y", "x"), nc.NC_UINT64,
                {"_FillValue": (nc.NC_UINT64, 63)}, data,
            ),
        },
        attrs={"title": (nc.NC_CHAR, "cdf5 fixture")},
        version=5,
    )
    buf = (tmp_path / "c5.nc").read_bytes()
    assert buf[:4] == b"CDF\x05"
    ds = nc.parse_netcdf3(buf)
    assert ds.attrs["title"] == "cdf5 fixture"
    assert ds.dims == {"time": 2, "y": 3, "x": 4}
    np.testing.assert_array_equal(ds.variables["v"].data, data)
    np.testing.assert_array_equal(
        ds.variables["time"].data, np.arange(2, dtype="i8")
    )
    unpacked = nc.cf_unpack(ds.variables["v"])
    assert np.isnan(unpacked[1, 2, 1])  # 63 = 21*3 at flat index 21
    assert unpacked[0, 0, 1] == 3.0


def test_truncated_file_raises_typed_error(tmp_path):
    _write_nc(str(tmp_path / "t.nc"), 0, 3, seed=9)
    raw = (tmp_path / "t.nc").read_bytes()
    with pytest.raises(nc.NetCDF3Error):
        nc.parse_netcdf3(raw[:40])
