"""GeoTIFF decode tests: strip/tile round-trips, compressions,
predictor, nodata, georeferencing, and the distributed decode path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gridded_etl_tools_spark.sources import geotiff
from gridded_etl_tools_spark.sources.files import read_binary_files


def _grid(dtype="<f8"):
    data = ((np.arange(20, dtype="f8").reshape(4, 5) * 7) % 101) / 4.0
    data[0, 0] = -9999.0
    return data.astype(dtype)


@pytest.mark.parametrize("compression", [1, 8])
def test_strip_round_trip(tmp_path, compression):
    data = _grid()
    path = str(tmp_path / f"strip_{compression}.tif")
    geotiff.write_geotiff(
        path, data, lon0=-116.0, lat0=36.75, dx=0.25, dy=0.25,
        nodata=-9999.0, compression=compression,
    )
    with open(path, "rb") as f:
        buf = f.read()
    page = geotiff.parse_tiff(buf)
    assert (page.width, page.height) == (5, 4)
    assert page.nodata == -9999.0
    raster = geotiff.read_raster(buf)
    np.testing.assert_array_equal(raster, data)


def test_tiled_layout_with_edge_tiles(tmp_path):
    data = _grid()
    path = str(tmp_path / "tiled.tif")
    geotiff.write_geotiff(path, data, tile=(3, 2), compression=8)
    with open(path, "rb") as f:
        buf = f.read()
    page = geotiff.parse_tiff(buf)
    assert page.tiled and len(page.tile_offsets) == 4  # 2x2 tile grid
    np.testing.assert_array_equal(geotiff.read_raster(buf), data)


def test_horizontal_predictor_int16(tmp_path):
    data = (np.arange(20).reshape(4, 5) * 3 - 7).astype("<i2")
    path = str(tmp_path / "pred.tif")
    geotiff.write_geotiff(path, data, compression=8, predictor=2)
    with open(path, "rb") as f:
        buf = f.read()
    assert geotiff.parse_tiff(buf).predictor == 2
    np.testing.assert_array_equal(geotiff.read_raster(buf), data)


def test_uint8_and_big_endian_reject():
    data = np.arange(6, dtype="u1").reshape(2, 3)
    import io, tempfile, os
    import numpy as _np

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "u8.tif")
        geotiff.write_geotiff(p, data, compression=1)
        with open(p, "rb") as f:
            buf = f.read()
        _np.testing.assert_array_equal(geotiff.read_raster(buf), data)
    with pytest.raises(geotiff.TiffError, match="II/MM"):
        geotiff.parse_tiff(b"XX\x2a\x00" + b"\x00" * 16)


def _lzw_literal_stream(data: bytes) -> bytes:
    """Trivially-valid TIFF LZW: CLEAR before every literal keeps the
    decoder table empty so every code is 9 bits."""
    bits = ""
    for b in data:
        bits += format(256, "09b") + format(b, "09b")
    bits += format(257, "09b")
    bits += "0" * (-len(bits) % 8)
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


def test_lzw_decode_literal_stream():
    payload = bytes(range(40))
    assert geotiff._lzw_decode(_lzw_literal_stream(payload)) == payload


def test_lzw_decode_with_table_growth():
    # repetitive data exercises table entries + code-width handling once
    # enough codes accumulate
    payload = b"ABABABABABAB" * 50
    # encode properly: simple reference encoder
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_size = 9
    out_bits = [format(256, "09b")]
    w = b""
    for ch in payload:
        c = bytes([ch])
        if w + c in table:
            w = w + c
            continue
        out_bits.append(format(table[w], f"0{code_size}b"))
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << code_size) - 1:
            code_size += 1
        w = c
    out_bits.append(format(table[w], f"0{code_size}b"))
    out_bits.append(format(257, f"0{code_size}b"))
    bits = "".join(out_bits)
    bits += "0" * (-len(bits) % 8)
    stream = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert geotiff._lzw_decode(stream) == payload


def test_long_frame_georeferencing_and_nodata(tmp_path):
    data = _grid()
    path = str(tmp_path / "geo.tif")
    geotiff.write_geotiff(
        path, data, lon0=-116.0, lat0=36.75, dx=0.25, dy=0.25,
        nodata=-9999.0, compression=8,
    )
    with open(path, "rb") as f:
        frame = geotiff.geotiff_long_frame(f.read())
    assert len(frame) == 20
    cell = frame[(frame.latitude == 36.75) & (frame.longitude == -116.0)]
    assert np.isnan(cell.value.iloc[0])  # nodata -> NaN
    cell = frame[(frame.latitude == 36.0) & (frame.longitude == -115.0)]
    assert cell.value.iloc[0] == data[3, 4]


def test_distributed_decode(spark, tmp_path):
    data = _grid()
    for i in range(2):
        geotiff.write_geotiff(
            str(tmp_path / f"f{i}.tif"), data + i, lon0=-116.0, lat0=36.75,
            dx=0.25, dy=0.25, compression=8,
        )
    files = read_binary_files(spark, str(tmp_path), glob="*.tif")
    out = geotiff.decode_geotiff_long(files)
    rows = out.collect()
    assert len(rows) == 40
    got = {
        (r.path.split("/")[-1], r.latitude, r.longitude): r.value for r in rows
    }
    assert got[("f0.tif", 36.0, -115.0)] == data[3, 4]
    assert got[("f1.tif", 36.0, -115.0)] == data[3, 4] + 1
