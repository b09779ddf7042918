"""HDF5/NetCDF4 decode path: wire-format round-trips (contiguous,
chunked + shuffle + deflate, DIMENSION_LIST vlen references through the
global heap, CF fill/scale/offset), plus the golden end-to-end loop
mirroring ``tests/test_netcdf3.py`` / reference
``tests/system/test_chirps.py:186-207``: parse a real on-disk .nc4
file, publish, append, point-probe the published table."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridded_etl_tools_spark.sinks.table import GriddedTable
from gridded_etl_tools_spark.sources import hdf5 as h5
from gridded_etl_tools_spark.sources.files import read_binary_files

LATS = np.array([36.0, 36.25, 36.5, 36.75], dtype="f8")
LONS = np.array([-115.75, -115.5, -115.25, -115.0], dtype="f8")
EPOCH = dt.datetime(2024, 12, 1)


def _data(day0: int, n_days: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    data = (rng.random((n_days, LATS.size, LONS.size)) * 50).astype("f8")
    data[0, 0, 0] = -9999.0
    return data


def _write(path: str, day0: int, n_days: int, seed: int, **kw) -> np.ndarray:
    data = _data(day0, n_days, seed)
    h5.write_hdf5(
        path,
        {
            "time": (
                ("time",),
                np.arange(day0, day0 + n_days, dtype="f8"),
                {"units": "days since 2024-12-01"},
            ),
            "latitude": (("latitude",), LATS, {"units": "degrees_north"}),
            "longitude": (("longitude",), LONS, {}),
            "precip": (
                ("time", "latitude", "longitude"),
                data,
                {"_FillValue": np.float64(-9999.0)},
            ),
        },
        attrs={"title": "synthetic CHIRPS-like nc4"},
        **kw,
    )
    return data


def test_contiguous_round_trip(tmp_path):
    data = _write(str(tmp_path / "a.nc4"), 0, 3, seed=11)
    f = h5.parse_hdf5((tmp_path / "a.nc4").read_bytes())
    assert f.attrs["title"] == "synthetic CHIRPS-like nc4"
    v = f.variables["precip"]
    assert v.dim_names == ("time", "latitude", "longitude")
    np.testing.assert_allclose(v.data, data)
    assert f.variables["latitude"].attrs["CLASS"] == "DIMENSION_SCALE"
    assert f.variables["latitude"].attrs["units"] == "degrees_north"


def test_chunked_shuffle_deflate_round_trip(tmp_path):
    """Chunked v1-B-tree layout with shuffle+deflate — the layout real
    netcdf-c deflated archives use — including edge chunks that overhang
    the array bounds."""
    data = _write(
        str(tmp_path / "c.nc4"), 0, 5, seed=7,
        chunk_shapes={"precip": (2, 3, 3)}, compress=True,
    )
    raw = (tmp_path / "c.nc4").read_bytes()
    f = h5.parse_hdf5(raw)
    np.testing.assert_allclose(f.variables["precip"].data, data)
    # compression actually happened: file smaller than raw contiguous
    assert len(raw) < data.nbytes + LATS.nbytes + LONS.nbytes + 4000


def test_cf_scale_offset_and_fill(tmp_path):
    vals = np.array([[0, 100], [200, 30000]], dtype="i2")
    h5.write_hdf5(
        str(tmp_path / "s.nc4"),
        {
            "y": (("y",), np.array([1.0, 2.0]), {}),
            "x": (("x",), np.array([10.0, 20.0]), {}),
            "t2m": (
                ("y", "x"),
                vals,
                {
                    "_FillValue": np.int16(30000),
                    "scale_factor": np.float64(0.01),
                    "add_offset": np.float64(250.0),
                },
            ),
        },
    )
    f = h5.parse_hdf5((tmp_path / "s.nc4").read_bytes())
    out = h5.cf_unpack(f.variables["t2m"])
    np.testing.assert_allclose(out[0], [250.0, 251.0])
    assert out[1, 0] == pytest.approx(252.0)
    assert np.isnan(out[1, 1])


def test_int_dtypes_round_trip(tmp_path):
    for dtype in ("i1", "i2", "i4", "i8", "u1", "f4"):
        arr = np.arange(12, dtype=dtype).reshape(3, 4)
        h5.write_hdf5(
            str(tmp_path / f"d_{dtype}.nc4"),
            {"v": ((), arr, {})},
        )
        f = h5.parse_hdf5((tmp_path / f"d_{dtype}.nc4").read_bytes())
        np.testing.assert_array_equal(f.variables["v"].data, arr)


def test_dimension_fallback_by_shape(tmp_path):
    """A variable written without DIMENSION_LIST still resolves axes by
    unique shape-match against the dimension scales (kerchunk-style)."""
    h5.write_hdf5(
        str(tmp_path / "f.nc4"),
        {
            "time": (("time",), np.arange(3, dtype="f8"), {}),
            "latitude": (("latitude",), LATS, {}),
            "anon": ((), np.zeros((3, LATS.size)), {}),  # no dims declared
        },
    )
    f = h5.parse_hdf5((tmp_path / "f.nc4").read_bytes())
    assert f.variables["anon"].dim_names == ("time", "latitude")


def test_rejects_non_hdf5():
    with pytest.raises(h5.HDF5Error):
        h5.parse_hdf5(b"CDF\x01 this is netcdf3, not hdf5" + b"\x00" * 64)


def test_netcdf4_initial_append_golden_point(spark, tmp_path):
    """Golden end-to-end (reference test_chirps.py:186-207 shape): decode
    a real .nc4 via the distributed path, publish, append a second file,
    and verify a point select returns exactly the source array value."""
    data_a = _write(str(tmp_path / "a.nc4"), 0, 3, seed=11,
                    chunk_shapes={"precip": (1, 4, 4)}, compress=True)
    data_b = _write(str(tmp_path / "b.nc4"), 3, 2, seed=12)

    def decoded(name):
        df = h5.decode_netcdf4_long(
            read_binary_files(spark, str(tmp_path / name)),
            "precip", ["time", "latitude", "longitude"],
        ).drop("path")
        return df.withColumn(
            "time",
            F.timestamp_micros(
                (F.col("time") * 86400 * 1_000_000 + F.lit(
                    int(EPOCH.timestamp() * 1_000_000)
                )).cast("long")
            ),
        )

    t = GriddedTable(str(tmp_path / "tbl"))
    t.write_initial(decoded("a.nc4"), sort_cols=["latitude", "longitude"])
    t.append(decoded("b.nc4"))
    df = t.read(spark)
    assert df.count() == 5 * LATS.size * LONS.size

    probe = df.filter(
        (F.col("time") == EPOCH + dt.timedelta(days=4))
        & (F.col("latitude") == 36.5)
        & (F.col("longitude") == -115.25)
    ).collect()
    assert len(probe) == 1
    assert probe[0]["value"] == pytest.approx(data_b[1, 2, 2])

    # the fill sentinel of each file surfaced as NULL
    assert df.filter(F.col("value").isNull()).count() == 2
    # decode is distributed: the plan contains no collect-side steps
    assert df.filter(F.col("value") > 50.0).count() == 0


def test_userblock_rebase(tmp_path):
    """A userblock shifts the signature to a power-of-two offset; every
    internal address is relative to it, so the rebased slice parses
    identically."""
    data = _write(str(tmp_path / "u.nc4"), 0, 2, seed=3)
    raw = (tmp_path / "u.nc4").read_bytes()
    with_block = b"\x00" * 512 + raw
    f = h5.parse_hdf5(with_block)
    np.testing.assert_allclose(f.variables["precip"].data, data)


def test_truncated_file_raises_typed_error(tmp_path):
    _write(str(tmp_path / "t.nc4"), 0, 2, seed=5)
    raw = (tmp_path / "t.nc4").read_bytes()
    with pytest.raises(h5.HDF5Error):
        h5.parse_hdf5(raw[: len(raw) // 3])


def test_decoded_nc4_through_full_publish_qc(spark, spec, tmp_path):
    """Full-pipeline integration: a real on-disk NetCDF4 file goes
    through distributed decode -> the publish lifecycle WITH the quality
    gates on (cadence, dtype, value checks) -> table read-back.  This is
    the reference's actual production path (kerchunkify -> publish with
    pre/post-parse QC) end to end on true bytes."""
    import datetime as dtm

    from gridded_etl_tools_spark.sinks.publish import publish

    # fill-free grid: the conftest spec's sentinel must not appear
    rng = np.random.default_rng(21)
    data = rng.random((3, LATS.size, LONS.size)) * 50
    h5.write_hdf5(
        str(tmp_path / "q.nc4"),
        {
            "time": (("time",), np.arange(3, dtype="f8"), {}),
            "latitude": (("latitude",), LATS, {}),
            "longitude": (("longitude",), LONS, {}),
            "precip": (("time", "latitude", "longitude"), data, {}),
        },
        chunk_shapes={"precip": (2, 4, 4)},
        compress=True,
    )
    df = h5.decode_netcdf4_long(
        read_binary_files(spark, str(tmp_path / "q.nc4")),
        "precip", ["time", "latitude", "longitude"],
    ).drop("path").withColumn(
        "time",
        F.timestamp_micros(
            (F.col("time") * 86400 * 1_000_000
             + F.lit(int(EPOCH.timestamp() * 1_000_000))).cast("long")
        ),
    )
    t = GriddedTable(str(tmp_path / "tbl"))
    r = publish(t, df, spec, expected_delta=dtm.timedelta(days=1))
    assert r["mode"] == "initial"
    out = t.read(spark)
    assert out.count() == 3 * LATS.size * LONS.size
    assert out.filter(F.col("value").isNull()).count() == 0


def test_libver_latest_layout(tmp_path):
    """libver='latest' container pieces: superblock v3, version-2 root
    object header, compact link messages — parses identically to the
    classic symbol-table layout."""
    data = _write(str(tmp_path / "l.nc4"), 0, 3, seed=11, latest=True)
    raw = (tmp_path / "l.nc4").read_bytes()
    assert raw[8] == 3                      # superblock version
    assert b"SNOD" not in raw and b"HEAP" not in raw
    f = h5.parse_hdf5(raw)
    assert f.attrs["title"] == "synthetic CHIRPS-like nc4"
    v = f.variables["precip"]
    assert v.dim_names == ("time", "latitude", "longitude")
    np.testing.assert_allclose(v.data, data)
    # same content parses from both layouts
    _write(str(tmp_path / "c.nc4"), 0, 3, seed=11)
    f2 = h5.parse_hdf5((tmp_path / "c.nc4").read_bytes())
    np.testing.assert_allclose(
        f2.variables["precip"].data, v.data
    )


def test_attribute_message_v2_v3_parse():
    """libver='latest' attribute framing: v2/v3 messages are unpadded
    and v3 carries a charset byte — same value comes back as from v1."""
    import struct

    dt_raw = h5._dt_message(np.dtype("f8"))
    ds_raw = struct.pack("<BBB5x", 1, 0, 0)  # scalar
    name = b"scale_factor\x00"
    val = np.float64(0.5).tobytes()
    for ver in (2, 3):
        body = struct.pack("<BBHHH", ver, 0, len(name), len(dt_raw), len(ds_raw))
        if ver == 3:
            body += b"\x00"  # charset
        body += name + dt_raw + ds_raw + val
        got_name, got_val = h5._parse_attribute(b"", body)
        assert got_name == "scale_factor" and got_val == 0.5
