"""GRIB2 decode path: wire-format round-trips (bitmap / no-bitmap /
constant field / carried-forward 254 bitmap semantics via per-message
masks), multi-message valid times, mixed-variable layer selection,
ascending-j scan mode, typed truncation errors, and the golden
end-to-end publish loop mirroring ``tests/test_grib1.py``."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridded_etl_tools_spark.sinks.table import GriddedTable
from gridded_etl_tools_spark.sources import grib2 as g2
from gridded_etl_tools_spark.sources.files import read_binary_files

LATS = np.array([40.0, 39.5, 39.0, 38.5], dtype="f8")  # north -> south
LONS = np.array([250.0, 250.5, 251.0, 251.5, 252.0, 252.5], dtype="f8")
REF = dt.datetime(2024, 1, 1)


def _grid(step: int, mask_cells=((0, 1), (2, 4))) -> np.ndarray:
    idx = np.arange(LATS.size * LONS.size, dtype="f8").reshape(
        LATS.size, LONS.size
    )
    vals = (idx * 13 + step * 7) % 97
    for r, c in mask_cells:
        vals[r, c] = np.nan
    return vals


def _write(path: str, steps: list[int], **kw) -> list[np.ndarray]:
    grids = [_grid(s, **kw) for s in steps]
    g2.write_grib2(
        path,
        [
            {
                "values": v,
                "lats": LATS,
                "lons": LONS,
                "reference_time": REF,
                "forecast_hours": 6 * s,
                "discipline": 0,
                "category": 1,
                "number": 8,
                "nbits": 8,
            }
            for s, v in zip(steps, grids)
        ],
    )
    return grids


def test_parse_round_trip_with_bitmap(tmp_path):
    p = str(tmp_path / "a.grib2")
    grids = _write(p, [0, 1])
    fields = g2.parse_grib2(open(p, "rb").read())
    assert len(fields) == 2
    assert fields[0].valid_time == REF
    assert fields[1].valid_time == REF + dt.timedelta(hours=6)
    for f, v in zip(fields, grids):
        assert np.allclose(f.lats, LATS) and np.allclose(f.lons, LONS)
        assert (np.isnan(f.values) == np.isnan(v)).all()
        assert np.allclose(np.nan_to_num(f.values), np.nan_to_num(v))


def test_parse_no_bitmap_and_constant_field(tmp_path):
    p = str(tmp_path / "b.grib2")
    _write(p, [0], mask_cells=())
    f = g2.parse_grib2(open(p, "rb").read())[0]
    assert not np.isnan(f.values).any()

    # constant field: every value equal -> nbits may be tiny
    pc = str(tmp_path / "c.grib2")
    g2.write_grib2(
        pc,
        [dict(values=np.full((2, 3), 5.0), lats=LATS[:2], lons=LONS[:3],
              reference_time=REF, forecast_hours=0, nbits=1)],
    )
    fc = g2.parse_grib2(open(pc, "rb").read())[0]
    assert (fc.values == 5.0).all()


def test_ascending_j_scan_mode(tmp_path):
    p = str(tmp_path / "asc.grib2")
    lats_asc = LATS[::-1].copy()  # south -> north => scan flag 0x40
    vals = _grid(0, mask_cells=())
    g2.write_grib2(
        p,
        [dict(values=vals, lats=lats_asc, lons=LONS,
              reference_time=REF, forecast_hours=0, nbits=8)],
    )
    f = g2.parse_grib2(open(p, "rb").read())[0]
    assert np.allclose(f.lats, lats_asc)
    assert np.allclose(f.values, vals)


def test_layer_selection(tmp_path):
    p = str(tmp_path / "multi.grib2")
    precip = _grid(0, mask_cells=())
    temp = _grid(1, mask_cells=()) + 200.0
    g2.write_grib2(
        p,
        [
            dict(values=precip, lats=LATS, lons=LONS, reference_time=REF,
                 forecast_hours=0, discipline=0, category=1, number=8, nbits=16),
            dict(values=temp, lats=LATS, lons=LONS, reference_time=REF,
                 forecast_hours=0, discipline=0, category=0, number=0, nbits=16),
        ],
    )
    buf = open(p, "rb").read()
    assert len(g2.parse_grib2(buf)) == 2
    only = g2.select_fields(g2.parse_grib2(buf), category=0, number=0)
    assert len(only) == 1 and np.allclose(only[0].values, temp)
    with pytest.raises(g2.GRIB2Error, match="no fields match"):
        g2.select_fields(g2.parse_grib2(buf), category=9)


def test_grib2_initial_append_golden_point(spark, tmp_path):
    """Golden loop: decode a real .grib2 through the distributed
    mapInPandas path, publish, append a later file, point-probe."""
    d1, d2 = str(tmp_path / "drop1"), str(tmp_path / "drop2")
    for d in (d1, d2):
        import os

        os.makedirs(d)
    grids1 = _write(f"{d1}/t0.grib2", [0, 1])
    _write(f"{d2}/t1.grib2", [2])

    table = GriddedTable(str(tmp_path / "tbl"), time_col="time")
    long1 = g2.decode_grib2_long(read_binary_files(spark, d1, "*.grib2")).drop("path")
    table.write_initial(long1, sort_cols=["latitude", "longitude"])
    long2 = g2.decode_grib2_long(read_binary_files(spark, d2, "*.grib2")).drop("path")
    table.append(long2)

    df = table.read(spark)
    assert df.count() == 3 * LATS.size * LONS.size
    # golden point: message 1 (t=+6h), cell (1, 2)
    got = df.filter(
        (F.col("time") == REF + dt.timedelta(hours=6))
        & (F.col("latitude") == float(LATS[1]))
        & (F.col("longitude") == float(LONS[2]))
    ).collect()
    assert len(got) == 1
    assert got[0]["value"] == pytest.approx(grids1[1][1, 2])
    # bitmap cells surfaced as NULL
    n_null = df.filter(F.col("value").isNull()).count()
    assert n_null == 6  # 2 masked cells x 3 messages


def test_truncated_file_raises_typed_error(tmp_path):
    p = str(tmp_path / "t.grib2")
    _write(p, [0])
    buf = open(p, "rb").read()
    with pytest.raises(g2.GRIB2Error):
        g2.parse_grib2(buf[: len(buf) // 2])
    with pytest.raises(g2.GRIB2Error, match="no GRIB2 fields"):
        g2.parse_grib2(b"not a grib file at all")


@pytest.mark.parametrize("mode", ["complex", "complex_sd1", "complex_sd2"])
@pytest.mark.parametrize("masked", [False, True])
def test_complex_packing_round_trip(tmp_path, mode, masked):
    """Templates 5.2/7.2 and 5.3/7.3 (GFS/HRRR's default packing):
    grouped references/widths/lengths, and for 5.3 the spatial
    differencing head (seed values + overall minimum, sign-magnitude)."""
    nj, ni = 5, 8
    lats = 40.0 - 0.5 * np.arange(nj)
    lons = 250.0 + 0.5 * np.arange(ni)
    # oscillating field -> first/second differences go NEGATIVE, so the
    # gmin sign-magnitude path is on the hot path
    idx = np.arange(nj * ni, dtype="f8").reshape(nj, ni)
    vals = 100.0 + 50.0 * np.sin(idx) + idx
    vals = np.round(vals)
    if masked:
        vals[0, 1] = np.nan
        vals[4, 7] = np.nan
    p = str(tmp_path / "c.grib2")
    g2.write_grib2(
        p,
        [dict(values=vals, lats=lats, lons=lons, reference_time=REF,
              forecast_hours=3, packing=mode, group_len=6)],
    )
    f = g2.parse_grib2(open(p, "rb").read())[0]
    assert (np.isnan(f.values) == np.isnan(vals)).all()
    assert np.allclose(np.nan_to_num(f.values), np.nan_to_num(vals))
    assert f.valid_time == REF + dt.timedelta(hours=3)


def test_complex_packing_group_length_mismatch_raises(tmp_path):
    p = str(tmp_path / "c.grib2")
    vals = _grid(0, mask_cells=())
    g2.write_grib2(
        p,
        [dict(values=vals, lats=LATS, lons=LONS, reference_time=REF,
              forecast_hours=0, packing="complex")],
    )
    buf = bytearray(open(p, "rb").read())
    # corrupt the declared true-length-of-last-group (template 5.2
    # octet 43-46): find section 5 and bump it
    pos = 16
    while True:
        import struct as _s

        ln = _s.unpack(">I", buf[pos : pos + 4])[0]
        if buf[pos + 4] == 5:
            off = pos + 5 + 6 + 25  # body + 5.0 head to last_len
            buf[off + 3] ^= 0x01
            break
        pos += ln
    with pytest.raises(g2.GRIB2Error, match="group lengths"):
        g2.parse_grib2(bytes(buf))


@pytest.mark.parametrize("nbits", [8, 16])
def test_png_packing_round_trip(tmp_path, nbits):
    """Template 5.41/7.41 (PNG packing, used by MRMS-class products):
    the scaled integers travel as a real zlib'd PNG stream."""
    vals = (_grid(0) * (977 if nbits == 16 else 1)) % (1 << nbits)
    vals[0, 1] = np.nan
    p = str(tmp_path / "p.grib2")
    g2.write_grib2(
        p,
        [dict(values=vals, lats=LATS, lons=LONS, reference_time=REF,
              forecast_hours=12, packing="png", nbits=nbits)],
    )
    f = g2.parse_grib2(open(p, "rb").read())[0]
    assert (np.isnan(f.values) == np.isnan(vals)).all()
    assert np.allclose(np.nan_to_num(f.values), np.nan_to_num(vals))
    assert f.valid_time == REF + dt.timedelta(hours=12)


def test_png_packing_rejects_sample_count_mismatch(tmp_path):
    vals = _grid(0, mask_cells=())
    p = str(tmp_path / "p.grib2")
    g2.write_grib2(
        p,
        [dict(values=vals, lats=LATS, lons=LONS, reference_time=REF,
              forecast_hours=0, packing="png", nbits=8)],
    )
    buf = bytearray(open(p, "rb").read())
    # shrink the declared grid: Ni lives at section-3 template octet 16
    # (section body offset 9 + 16)
    import struct as _s

    pos = 16
    while True:
        ln = _s.unpack(">I", buf[pos : pos + 4])[0]
        if buf[pos + 4] == 3:
            off = pos + 5 + 9 + 16
            ni = _s.unpack(">I", buf[off : off + 4])[0]
            buf[off : off + 4] = _s.pack(">I", ni - 1)
            break
        pos += ln
    with pytest.raises(g2.GRIB2Error, match="samples"):
        g2.parse_grib2(bytes(buf))


def test_accumulation_validates_at_interval_end(tmp_path):
    """Product template 4.8 (statistically-processed fields): a 30-hour
    accumulation references the run start but VALIDATES at the end of
    the overall interval — mislabeling it ref+forecast would shift every
    accumulated-precip series."""
    vals = _grid(0, mask_cells=())
    p = str(tmp_path / "acc.grib2")
    g2.write_grib2(
        p,
        [dict(values=vals, lats=LATS, lons=LONS, reference_time=REF,
              forecast_hours=0,
              interval_end=REF + dt.timedelta(hours=30),
              interval_hours=30, nbits=8)],
    )
    f = g2.parse_grib2(open(p, "rb").read())[0]
    assert f.reference_time == REF
    assert f.valid_time == REF + dt.timedelta(hours=30)
    assert np.allclose(f.values, vals)


def test_lambert_conformal_grid_template(tmp_path):
    """Grid template 3.30 (the HRRR/NAM Lambert conformal grid): cells
    live on a regular projection-meter grid; decode inverse-projects
    every cell center with the same Snyder constants the column-level
    LCC path uses, so lat/lon come back as 2-D per-cell arrays."""
    from gridded_etl_tools_spark.functions.conventions import lcc_constants
    from gridded_etl_tools_spark.sources.grib2 import _lcc_np

    ny, nx = 4, 5
    vals = (np.arange(ny * nx, dtype="f8").reshape(ny, nx) * 7) % 50
    vals[2, 3] = np.nan
    lcc = dict(latin1=25.0, latin2=25.0, lad=25.0, lov=265.0,
               dx=3000.0, dy=3000.0, la1=35.0, lo1=-100.0)
    p = str(tmp_path / "l.grib2")
    g2.write_grib2(
        p, [dict(values=vals, reference_time=REF, forecast_hours=0,
                 nbits=8, lcc=lcc)],
    )
    f = g2.parse_grib2(open(p, "rb").read())[0]
    assert f.lats.shape == (ny, nx) and f.lons.shape == (ny, nx)
    # the grid origin inverts back to exactly (la1, lo1)
    assert f.lats[0, 0] == pytest.approx(35.0, abs=1e-9)
    assert f.lons[0, 0] == pytest.approx(-100.0, abs=1e-9)
    # an interior cell matches an independent forward-step-invert
    c = lcc_constants(25.0, 25.0, 25.0, 265.0, 6371229.0)
    fwd, inv = _lcc_np(c)
    x0, y0 = fwd(-100.0, 35.0)
    lon, lat = inv(x0 + 3 * 3000.0, y0 + 2 * 3000.0)
    assert f.lats[2, 3] == pytest.approx(lat)
    assert f.lons[2, 3] == pytest.approx(lon)
    # values + bitmap survive; the long frame carries per-cell coords
    assert (np.isnan(f.values) == np.isnan(vals)).all()
    df = g2.grib2_long_frame(open(p, "rb").read())
    assert len(df) == ny * nx
    assert df["latitude"].nunique() == ny * nx  # truly 2-D geometry


def test_ensemble_member_templates(tmp_path):
    """Product templates 4.1 / 4.11 (individual ensemble members — the
    reference's hindcast/ensemble category): each message carries its
    perturbation number, selectable like any other layer key, and 4.11
    keeps the interval-end validity of 4.8."""
    msgs = [
        dict(values=_grid(0, mask_cells=()) + 10 * k, lats=LATS, lons=LONS,
             reference_time=REF, forecast_hours=6, member=k, n_members=3,
             nbits=8)
        for k in range(3)
    ]
    msgs.append(
        dict(values=np.full((LATS.size, LONS.size), 7.0), lats=LATS,
             lons=LONS, reference_time=REF, forecast_hours=0, member=1,
             n_members=3, interval_end=REF + dt.timedelta(days=1), nbits=8)
    )
    p = str(tmp_path / "ens.grib2")
    g2.write_grib2(p, msgs)
    fields = g2.parse_grib2(open(p, "rb").read())
    assert [f.member for f in fields] == [0, 1, 2, 1]
    # deterministic forecasts decode with member=None, so the key is
    # filterable without ambiguity
    m1 = g2.select_fields(fields, member=1)
    assert len(m1) == 2
    assert m1[0].valid_time == REF + dt.timedelta(hours=6)
    assert m1[1].valid_time == REF + dt.timedelta(days=1)  # 4.11 end time
    assert np.allclose(m1[0].values, _grid(0, mask_cells=()) + 10)


@pytest.mark.parametrize("south", [False, True])
def test_polar_stereographic_grid_template(tmp_path, south):
    """Grid template 3.20 (polar stereographic — NSIDC/arctic products),
    both projection hemispheres: the regular projection-meter grid
    inverse-projects to 2-D per-cell coordinates; the origin cell lands
    exactly back on (la1, lo1)."""
    from gridded_etl_tools_spark.sources.grib2 import _ps_np

    ny, nx = 4, 5
    vals = (np.arange(ny * nx, dtype="f8").reshape(ny, nx) * 3) % 40
    vals[1, 2] = np.nan
    sgn = -1 if south else 1
    ps = dict(lad=60.0 * sgn, lov=-45.0, dx=25000.0, dy=25000.0,
              la1=70.0 * sgn, lo1=-120.0, south=south)
    p = str(tmp_path / "ps.grib2")
    g2.write_grib2(
        p, [dict(values=vals, reference_time=REF, forecast_hours=0,
                 nbits=8, ps=ps)],
    )
    f = g2.parse_grib2(open(p, "rb").read())[0]
    assert f.lats.shape == (ny, nx)
    assert f.lats[0, 0] == pytest.approx(ps["la1"], abs=1e-9)
    assert f.lons[0, 0] == pytest.approx(ps["lo1"], abs=1e-9)
    fwd, inv = _ps_np(ps["lad"], ps["lov"], 6371229.0, south)
    x0, y0 = fwd(ps["lo1"], ps["la1"])
    lon, lat = inv(x0 + 3 * 25000.0, y0 + 2 * 25000.0)
    assert f.lats[2, 3] == pytest.approx(lat)
    assert f.lons[2, 3] == pytest.approx(lon)
    assert (np.isnan(f.values) == np.isnan(vals)).all()
    assert np.allclose(np.nan_to_num(f.values), np.nan_to_num(vals))


def test_gaussian_grid_template(tmp_path):
    """Grid template 3.40 (regular Gaussian — the ERA5 native parallels):
    latitudes are the arcsines of the Gauss-Legendre nodes, recomputed at
    decode from N and cross-checked against the declared la1."""
    from gridded_etl_tools_spark.sources.grib2 import gaussian_latitudes

    n = 3
    lats = gaussian_latitudes(n)
    assert lats.size == 6 and lats[0] > 0 and np.all(np.diff(lats) < 0)
    # antisymmetric about the equator
    assert np.allclose(lats, -lats[::-1])
    lons = np.linspace(0.0, 300.0, 6)
    vals = (np.arange(36, dtype="f8").reshape(6, 6) * 5) % 60
    vals[2, 4] = np.nan
    p = str(tmp_path / "g.grib2")
    g2.write_grib2(
        p, [dict(values=vals, lats=lats, lons=lons, reference_time=REF,
                 forecast_hours=0, nbits=8, gaussian_n=n)],
    )
    f = g2.parse_grib2(open(p, "rb").read())[0]
    assert np.allclose(f.lats, lats, atol=1e-6)
    assert np.allclose(f.lons, lons)
    assert (np.isnan(f.values) == np.isnan(vals)).all()
    assert np.allclose(np.nan_to_num(f.values), np.nan_to_num(vals))


def test_reduced_gaussian_grid(tmp_path):
    """Reduced Gaussian grid (template 3.40 with Ni missing + per-parallel
    point counts — ERA5's true native layout): fewer points near the
    poles, per-row longitude spacing 360/pl[j], flat per-cell coords."""
    from gridded_etl_tools_spark.sources.grib2 import gaussian_latitudes

    n, pl = 2, [4, 8, 8, 4]
    total = sum(pl)
    vals = (np.arange(total, dtype="f8") * 3) % 31
    vals[5] = np.nan
    p = str(tmp_path / "rg.grib2")
    g2.write_grib2(
        p, [dict(values=vals, reference_time=REF, forecast_hours=0,
                 nbits=8, gaussian_n=n, gaussian_pl=pl, lo1=0.0)],
    )
    f = g2.parse_grib2(open(p, "rb").read())[0]
    assert np.allclose(f.lats, np.repeat(gaussian_latitudes(n), pl), atol=1e-6)
    assert np.allclose(
        f.lons,
        np.concatenate([np.arange(k) * (360.0 / k) for k in pl]),
        atol=1e-6,
    )
    fv = f.values.reshape(-1)
    assert (np.isnan(fv) == np.isnan(vals)).all()
    assert np.allclose(np.nan_to_num(fv), np.nan_to_num(vals))
    df = g2.grib2_long_frame(open(p, "rb").read())
    assert len(df) == total
    # polar rows really are sparser: 4 cells at the top parallel
    top = df[df["latitude"] == df["latitude"].max()]
    assert len(top) == 4


def test_rotated_latlon_grid_template(tmp_path):
    """Grid template 3.1 (rotated lat/lon — COSMO/regional models): the
    regular rotated-system grid un-rotates per cell to 2-D true
    coordinates.  Pinned: the rotated origin maps to
    (90 + sp_lat, sp_lon + 180), and a south pole at (-90, -180) is the
    identity rotation."""
    lats_r = np.array([2.0, 1.0, 0.0, -1.0])
    lons_r = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    vals = (np.arange(20, dtype="f8") * 3).reshape(4, 5) % 29
    p = str(tmp_path / "rot.grib2")
    g2.write_grib2(
        p, [dict(values=vals, lats=lats_r, lons=lons_r, reference_time=REF,
                 forecast_hours=0, nbits=8,
                 rotated=dict(sp_lat=-50.0, sp_lon=10.0))],
    )
    f = g2.parse_grib2(open(p, "rb").read())[0]
    assert f.lats.ndim == 2
    assert f.lats[2, 2] == pytest.approx(40.0, abs=1e-6)   # 90 + (-50)
    assert f.lons[2, 2] == pytest.approx(-170.0, abs=1e-6)  # 10 + 180 wrapped
    assert np.allclose(f.values, vals)

    pid = str(tmp_path / "ident.grib2")
    g2.write_grib2(
        pid, [dict(values=vals, lats=lats_r, lons=lons_r, reference_time=REF,
                   forecast_hours=0, nbits=8,
                   rotated=dict(sp_lat=-90.0, sp_lon=-180.0))],
    )
    fi = g2.parse_grib2(open(pid, "rb").read())[0]
    lon_mesh, lat_mesh = np.meshgrid(lons_r, lats_r)
    assert np.allclose(fi.lats, lat_mesh, atol=1e-6)
    assert np.allclose(fi.lons, lon_mesh, atol=1e-6)


def test_mercator_grid_template(tmp_path):
    """Grid template 3.10 (Mercator, true scale at LaD): x maps linearly
    to longitude, y inverts through the Mercator latitude formula; axes
    stay separable 1-D like plain lat/lon.  The origin cell lands back
    exactly on (la1, lo1)."""
    ny, nx = 4, 5
    vals = (np.arange(ny * nx, dtype="f8").reshape(ny, nx) * 7) % 50
    vals[1, 2] = np.nan
    merc = dict(lad=20.0, la1=10.0, lo1=-80.0, di=50000.0, dj=50000.0)
    p = str(tmp_path / "m.grib2")
    g2.write_grib2(
        p, [dict(values=vals, reference_time=REF, forecast_hours=0,
                 nbits=8, mercator=merc)],
    )
    f = g2.parse_grib2(open(p, "rb").read())[0]
    assert f.lats.ndim == 1 and f.lons.ndim == 1
    assert f.lats[0] == pytest.approx(10.0, abs=1e-9)
    assert f.lons[0] == pytest.approx(-80.0, abs=1e-9)
    R, lad = 6371229.0, 20.0
    k = R * np.cos(np.radians(lad))
    y = k * np.log(np.tan(np.pi / 4 + np.radians(10.0) / 2)) + 2 * 50000.0
    assert f.lats[2] == pytest.approx(
        np.degrees(2 * np.arctan(np.exp(y / k)) - np.pi / 2)
    )
    assert f.lons[3] == pytest.approx(-80.0 + np.degrees(3 * 50000.0 / k))
    assert (np.isnan(f.values) == np.isnan(vals)).all()
    assert np.allclose(np.nan_to_num(f.values), np.nan_to_num(vals))
