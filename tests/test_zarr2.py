"""Zarr v2 store round-trips: golden initial+append structure mirroring
tests/test_netcdf3.py (reference tests/system/test_chirps.py:186-207
initial-parse + append point checks), plus layout variants the format
allows (separators, compressors, orders, missing chunks, CF unpack)."""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest

from gridded_etl_tools_spark.sources import zarr2


def _grid():
    nt, nlat, nlon = 3, 4, 5
    idx = np.arange(nt * nlat * nlon, dtype="f8").reshape(nt, nlat, nlon)
    data = (idx * 7 % 101) / 4.0
    data[0, 0, 0] = -9999.0
    lats = 36.0 + 0.25 * np.arange(nlat)
    lons = -116.0 + 0.25 * np.arange(nlon)
    times = np.arange(nt, dtype="f8")
    return data, times, lats, lons


def _write(root, data, times, lats, lons, **kw):
    zarr2.write_zarr_store(
        root,
        variables={
            "time": (("time",), times, {}),
            "latitude": (("latitude",), lats, {}),
            "longitude": (("longitude",), lons, {}),
            "precip": (
                ("time", "latitude", "longitude"), data,
                {"_FillValue": -9999.0},
            ),
        },
        chunks={"precip": (2, 3, 2), "time": (2,)},
        fill_values={"precip": -9999.0},
        **kw,
    )


def _collect(spark, root, var="precip"):
    rows = zarr2.decode_zarr_long(spark, root, var).collect()
    return {
        (r.time, r.latitude, r.longitude): r.value for r in rows
    }, rows


@pytest.mark.parametrize("compressor", ["zlib", "gzip", None])
def test_round_trip_compressors(spark, tmp_path, compressor):
    data, times, lats, lons = _grid()
    root = str(tmp_path / f"store_{compressor}")
    _write(root, data, times, lats, lons, compressor=compressor)
    got, rows = _collect(spark, root)
    assert len(rows) == data.size
    for it, t in enumerate(times):
        for ilat, la in enumerate(lats):
            for ilon, lo in enumerate(lons):
                v = data[it, ilat, ilon]
                expect = None if v == -9999.0 else v
                assert got[(t, la, lo)] == expect


def test_nested_separator_layout(spark, tmp_path):
    data, times, lats, lons = _grid()
    root = str(tmp_path / "nested")
    _write(root, data, times, lats, lons, dimension_separator="/")
    # nested directories actually exist on disk
    assert os.path.isdir(os.path.join(root, "precip", "0", "0"))
    got, rows = _collect(spark, root)
    assert len(rows) == data.size
    assert got[(2.0, 36.75, -115.0)] == data[2, 3, 4]


def test_fortran_order_chunks(spark, tmp_path):
    data, times, lats, lons = _grid()
    root = str(tmp_path / "forder")
    _write(root, data, times, lats, lons, order="F")
    got, _ = _collect(spark, root)
    assert got[(1.0, 36.5, -115.5)] == data[1, 2, 2]


def test_missing_chunk_materializes_fill_driver_read(tmp_path):
    data, times, lats, lons = _grid()
    root = str(tmp_path / "missing")
    _write(root, data, times, lats, lons)
    os.remove(os.path.join(root, "precip", "0.0.0"))
    metas = zarr2.open_store(root)
    arr = zarr2.read_array(root, metas["precip"])
    assert np.all(arr[:2, :3, :2] == -9999.0)  # whole missing chunk -> fill
    assert arr[2, 3, 4] == data[2, 3, 4]


def test_cf_scale_offset_unpack(spark, tmp_path):
    # int16 packed variable: value = raw * 0.5 + 100, fill = -32768
    raw = np.array([[1, 2], [-32768, 4]], dtype="<i2")
    root = str(tmp_path / "packed")
    zarr2.write_zarr_store(
        root,
        variables={
            "y": (("y",), np.array([0.0, 1.0]), {}),
            "x": (("x",), np.array([0.0, 1.0]), {}),
            "temp": (
                ("y", "x"), raw,
                {"scale_factor": 0.5, "add_offset": 100.0,
                 "_FillValue": -32768},
            ),
        },
        fill_values={"temp": np.int16(-32768)},
    )
    got = {
        (r.y, r.x): r.value
        for r in zarr2.decode_zarr_long(spark, root, "temp").collect()
    }
    assert got[(0.0, 0.0)] == 100.5
    assert got[(0.0, 1.0)] == 101.0
    assert got[(1.0, 0.0)] is None
    assert got[(1.0, 1.0)] == 102.0


def test_append_time_chunks_golden(spark, tmp_path):
    """Reference append_to_dataset shape: initial publish, append along
    time, point-check cells from both eras (test_chirps.py:186-207)."""
    data, times, lats, lons = _grid()
    # chunk-aligned initial extent: time chunk 2 won't divide 3 -> use 2
    data = data[:2]
    times = times[:2]
    root = str(tmp_path / "append")
    _write(root, data, times, lats, lons)
    new_times = np.array([2.0, 3.0])
    new_data = np.full((2, 4, 5), 7.25)
    new_data[1, 3, 4] = 9.5
    zarr2.append_time_chunks(root, "precip", "time", new_times, new_data)

    metas = zarr2.open_store(root)
    assert metas["precip"].shape == (4, 4, 5)
    assert metas["time"].shape == (4,)
    # consolidated metadata kept in sync
    with open(os.path.join(root, ".zmetadata")) as f:
        z = json.load(f)
    assert z["metadata"]["precip/.zarray"]["shape"] == [4, 4, 5]

    got, rows = _collect(spark, root)
    assert len(rows) == 4 * 4 * 5
    assert got[(0.0, 36.25, -116.0)] == data[0, 1, 0]   # initial era
    assert got[(2.0, 36.0, -116.0)] == 7.25             # appended era
    assert got[(3.0, 36.75, -115.0)] == 9.5


def test_append_requires_chunk_alignment(tmp_path):
    data, times, lats, lons = _grid()  # 3 times, chunk 2 -> misaligned
    root = str(tmp_path / "misaligned")
    _write(root, data, times, lats, lons)
    with pytest.raises(zarr2.ZarrError, match="chunk-aligned"):
        zarr2.append_time_chunks(
            root, "precip", "time", np.array([3.0]), np.zeros((1, 4, 5))
        )


def test_consolidated_and_unconsolidated_metadata_agree(tmp_path):
    data, times, lats, lons = _grid()
    root = str(tmp_path / "consol")
    _write(root, data, times, lats, lons)
    via_consol = zarr2.open_store(root)
    os.remove(os.path.join(root, ".zmetadata"))
    via_files = zarr2.open_store(root)
    assert set(via_consol) == set(via_files)
    for k in via_consol:
        assert via_consol[k].shape == via_files[k].shape
        assert via_consol[k].chunks == via_files[k].chunks
        assert via_consol[k].dims == via_files[k].dims


def test_nan_fill_value_round_trips(tmp_path):
    root = str(tmp_path / "nanfill")
    zarr2.write_zarr_store(
        root,
        variables={"v": (("x",), np.array([1.0, 2.0]), {})},
        fill_values={"v": float("nan")},
    )
    meta = zarr2.open_store(root)["v"]
    assert math.isnan(meta.fill_value)


def test_unsupported_compressor_raises(tmp_path):
    root = str(tmp_path / "blosc")
    os.makedirs(os.path.join(root, "v"))
    with open(os.path.join(root, "v", ".zarray"), "w") as f:
        json.dump(
            {"zarr_format": 2, "shape": [1], "chunks": [1], "dtype": "<f8",
             "compressor": {"id": "blosc", "cname": "lz4"},
             "fill_value": None, "order": "C", "filters": None}, f,
        )
    with pytest.raises(zarr2.ZarrError, match="blosc"):
        zarr2.open_store(root)


# --- zarr v3 -----------------------------------------------------------------

def test_zarr3_round_trip(spark, tmp_path):
    data, times, lats, lons = _grid()
    root = str(tmp_path / "v3")
    zarr2.write_zarr3_store(
        root,
        variables={
            "time": (("time",), times, {}),
            "latitude": (("latitude",), lats, {}),
            "longitude": (("longitude",), lons, {}),
            "precip": (
                ("time", "latitude", "longitude"), data,
                {"_FillValue": -9999.0},
            ),
        },
        chunks={"precip": (2, 3, 2), "time": (2,)},
        fill_values={"precip": -9999.0},
    )
    metas = zarr2.open_store(root)
    assert metas["precip"].zarr_version == 3
    assert metas["precip"].dims == ["time", "latitude", "longitude"]
    assert os.path.exists(os.path.join(root, "precip", "c", "0", "0", "0"))
    got, rows = _collect(spark, root)
    assert len(rows) == data.size
    assert got[(0.0, 36.0, -116.0)] is None  # fill sentinel -> NULL
    assert got[(2.0, 36.75, -115.0)] == data[2, 3, 4]


def test_zarr3_v2_encoding_and_uncompressed(spark, tmp_path):
    data, times, lats, lons = _grid()
    root = str(tmp_path / "v3nc")
    zarr2.write_zarr3_store(
        root,
        variables={
            "time": (("time",), times, {}),
            "latitude": (("latitude",), lats, {}),
            "longitude": (("longitude",), lons, {}),
            "precip": (("time", "latitude", "longitude"), data, {}),
        },
        chunks={"precip": (3, 4, 5)},
        gzip_level=None,
    )
    arr = zarr2.read_array(str(tmp_path / "v3nc"), zarr2.open_store(root)["precip"])
    import numpy as np
    np.testing.assert_array_equal(arr, data)


def test_zarr3_rejects_unknown_codec(tmp_path):
    import json as _json
    root = tmp_path / "v3bad"
    (root / "v").mkdir(parents=True)
    (root / "zarr.json").write_text(
        _json.dumps({"zarr_format": 3, "node_type": "group"})
    )
    (root / "v" / "zarr.json").write_text(_json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [2],
        "data_type": "float64",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [2]}},
        "fill_value": 0,
        "codecs": [{"name": "bytes"}, {"name": "blosc", "configuration": {}}],
    }))
    with pytest.raises(zarr2.ZarrError, match="blosc"):
        zarr2.open_store(str(root))


def test_append_time_chunks_v3_store(spark, tmp_path):
    """r7: append_to_dataset on a v3 store — chunk keys get the 'c/'
    prefix and the shape extends in zarr.json, not .zarray."""
    data, times, lats, lons = _grid()
    data, times = data[:2], times[:2]
    root = str(tmp_path / "append3")
    zarr2.write_zarr3_store(
        root,
        variables={
            "time": (("time",), times, {}),
            "latitude": (("latitude",), lats, {}),
            "longitude": (("longitude",), lons, {}),
            "precip": (("time", "latitude", "longitude"), data, {}),
        },
        chunks={"precip": (2, 4, 5), "time": (2,)},
    )
    new_times = np.array([2.0, 3.0])
    new_data = np.full((2, 4, 5), 7.25)
    new_data[1, 3, 4] = 9.5
    zarr2.append_time_chunks(root, "precip", "time", new_times, new_data)

    metas = zarr2.open_store(root)
    assert metas["precip"].shape == (4, 4, 5)
    assert metas["time"].shape == (4,)
    assert os.path.exists(os.path.join(root, "precip", "c", "1", "0", "0"))

    got, rows = _collect(spark, root)
    assert len(rows) == 4 * 4 * 5
    assert got[(0.0, 36.25, -116.0)] == data[0, 1, 0]
    assert got[(2.0, 36.0, -116.0)] == 7.25
    assert got[(3.0, 36.75, -115.0)] == 9.5
