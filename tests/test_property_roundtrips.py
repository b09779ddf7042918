"""Property-based round-trips for the in-repo codecs (hypothesis):
random shapes/chunks/dtypes/values must survive write -> read exactly.
Driver-side readers only — the distributed paths reuse the same decode
functions and are covered by the per-format suites."""

from __future__ import annotations

import os

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gridded_etl_tools_spark.sources import geotiff, zarr2

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _grids(draw):
    ndim = draw(st.integers(1, 3))
    shape = tuple(draw(st.integers(1, 7)) for _ in range(ndim))
    chunks = tuple(draw(st.integers(1, s)) for s in shape)
    dtype = draw(st.sampled_from(["<f8", "<f4", "<i4", "<i2", ">f8"]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    if dtype[1] == "f":
        data = rng.integers(-1000, 1000, size=shape).astype(dtype) / 4.0
    else:
        data = rng.integers(-1000, 1000, size=shape).astype(dtype)
    return shape, chunks, dtype, data


@given(_grids(), st.sampled_from(["zlib", "gzip", None]),
       st.sampled_from([".", "/"]), st.sampled_from(["C", "F"]))
@settings(**_SETTINGS)
def test_zarr2_round_trip_property(tmp_path_factory, grid, comp, sep, order):
    shape, chunks, dtype, data = grid
    root = str(tmp_path_factory.mktemp("z2"))
    dims = tuple(f"d{i}" for i in range(len(shape)))
    zarr2.write_zarr_store(
        root,
        variables={"v": (dims, data, {})},
        chunks={"v": chunks},
        compressor=comp,
        dimension_separator=sep,
        order=order,
    )
    meta = zarr2.open_store(root)["v"]
    got = zarr2.read_array(root, meta)
    np.testing.assert_array_equal(got, data)


@given(_grids())
@settings(**_SETTINGS)
def test_zarr3_round_trip_property(tmp_path_factory, grid):
    shape, chunks, dtype, data = grid
    if dtype.startswith(">"):
        data = data.astype(dtype.replace(">", "<"))
    root = str(tmp_path_factory.mktemp("z3"))
    dims = tuple(f"d{i}" for i in range(len(shape)))
    zarr2.write_zarr3_store(
        root, variables={"v": (dims, data, {})}, chunks={"v": chunks},
    )
    meta = zarr2.open_store(root)["v"]
    got = zarr2.read_array(root, meta)
    np.testing.assert_array_equal(got, data)


@given(
    st.integers(1, 9), st.integers(1, 9),
    st.sampled_from(["<f8", "<f4", "<i2", "<u2"]),
    st.sampled_from([1, 8]),
    st.booleans(),
    st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_geotiff_round_trip_property(
    tmp_path_factory, h, w, dtype, comp, tiled, seed
):
    rng = np.random.default_rng(seed)
    if dtype[1] == "f":
        data = rng.integers(-500, 500, size=(h, w)).astype(dtype) / 4.0
    elif dtype[1] == "u":
        data = rng.integers(0, 1000, size=(h, w)).astype(dtype)
    else:
        data = rng.integers(-500, 500, size=(h, w)).astype(dtype)
    path = os.path.join(str(tmp_path_factory.mktemp("tif")), "t.tif")
    tile = (max(1, w // 2), max(1, h // 2)) if tiled else None
    geotiff.write_geotiff(path, data, compression=comp, tile=tile)
    with open(path, "rb") as f:
        got = geotiff.read_raster(f.read())
    np.testing.assert_array_equal(got, data)


@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_png_round_trip_property(w, h, seed):
    """Random shapes/content through the real PNG codec (cycling
    scanline filters on encode, inflate + unfilter on decode)."""
    from gridded_etl_tools_spark.multimodal import png

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint16).astype(np.uint8)
    width, height, channels, flat = png.decode_png(png.encode_png_gray8(px))
    assert (width, height, channels) == (w, h, 1)
    assert (flat.reshape(h, w) == px).all()


@given(
    st.integers(1, 31),
    st.integers(1, 6),
    st.integers(0, 2**31 - 1),
    st.sampled_from([1, 5]),
)
@settings(**_SETTINGS)
def test_netcdf3_round_trip_property(tmp_path_factory, n_lon, n_t, seed, version):
    """Random record/static shapes through the classic-NetCDF writer +
    parser (CDF-1 and CDF-5): float32 payload with a fill sentinel."""
    from gridded_etl_tools_spark.sources import netcdf3 as nc

    rng = np.random.default_rng(seed)
    data = (rng.random((n_t, 2, n_lon)) * 100 - 50).astype("f4")
    path = os.path.join(
        str(tmp_path_factory.mktemp("nc")), f"p_{seed}_{version}.nc"
    )
    nc.write_netcdf3(
        path,
        dims={"time": None, "latitude": 2, "longitude": n_lon},
        variables={
            "latitude": (("latitude",), nc.NC_DOUBLE, {},
                         np.array([0.0, 0.25])),
            "longitude": (("longitude",), nc.NC_DOUBLE, {},
                          np.arange(n_lon, dtype="f8")),
            "time": (("time",), nc.NC_DOUBLE, {},
                     np.arange(n_t, dtype="f8")),
            "v": (("time", "latitude", "longitude"), nc.NC_FLOAT, {}, data),
        },
        version=version,
    )
    ds = nc.parse_netcdf3(open(path, "rb").read())
    got = nc.cf_unpack(ds.variables["v"])
    assert got.shape == (n_t, 2, n_lon)
    np.testing.assert_array_equal(got.astype("f4"), data)


@given(
    st.integers(1, 3),              # ndim
    st.integers(0, 2**31 - 1),      # seed
    st.sampled_from(["fixed", "single", "implicit"]),
    st.sampled_from([1, 2, 10]),    # page_bits (1-2 force paging)
    st.booleans(),                  # compress
)
@settings(**_SETTINGS)
def test_hdf5_layout_v4_round_trip_property(
    tmp_path_factory, ndim, seed, index, page_bits, compress
):
    """Random shapes/chunk grids through the layout-v4 writer + reader
    (r12): Single Chunk / Implicit / Fixed Array (paged and unpaged,
    filtered client-1 and address-only client-0 elements) must all
    decode exactly, and the scan's chunk manifest must enumerate the
    full chunk grid."""
    from gridded_etl_tools_spark.sources import hdf5 as h5

    if index == "implicit" and compress:
        compress = False  # implicit carries unfiltered chunks only
    rng = np.random.default_rng(seed)
    shape = tuple(int(rng.integers(1, 8)) for _ in range(ndim))
    if index == "single":
        chunks = shape
    else:
        chunks = tuple(int(rng.integers(1, s + 1)) for s in shape)
    data = (rng.integers(-1000, 1000, size=shape)).astype("f8") / 4.0
    dims = tuple(f"d{i}" for i in range(ndim))
    path = os.path.join(
        str(tmp_path_factory.mktemp("h5v4")), f"p_{seed}.nc4"
    )
    h5.write_hdf5(
        path,
        {
            **{
                d: ((d,), np.arange(s, dtype="f8"), {})
                for d, s in zip(dims, shape)
            },
            "v": (dims, data, {}),
        },
        chunk_shapes={"v": chunks},
        compress=compress,
        latest=True,
        v4_index=index,
        v4_page_bits=page_bits,
    )
    buf = open(path, "rb").read()
    got = h5.parse_hdf5(buf).variables["v"].data
    np.testing.assert_array_equal(got, data)
    base, _ra, dsets, _a2n = h5.scan_hdf5(buf)
    d = {x.name: x for x in dsets}["v"]
    n_chunks = 1
    for s, c in zip(shape, chunks):
        n_chunks *= -(-s // c)
    assert len(d.chunks) == n_chunks
    # every manifest triple addresses real bytes
    re_got = h5._materialize(buf[base:] if base else buf, d)
    np.testing.assert_array_equal(re_got, data)


@given(
    st.integers(1, 3),              # ndim
    st.integers(0, 2**31 - 1),      # seed
    st.sampled_from([1, 2, 4]),     # idx_blk_elmts
    st.sampled_from([1, 2, 4]),     # data_blk_min_elmts
    st.sampled_from([2, 4]),        # sblk_min_dptrs
    st.booleans(),                  # compress
)
@settings(**_SETTINGS)
def test_hdf5_extensible_array_round_trip_property(
    tmp_path_factory, ndim, seed, ib, db, sp, compress
):
    """Random shapes/chunk grids through the EXTENSIBLE ARRAY writer +
    reader (r13): every creation-parameter combination — index blocks
    of 1-4 elements, 1-4-element minimum data blocks, 2-4 secondary
    minimum pointers, filtered and address-only clients — must place
    elements across the inline/direct/super-block tiers and decode
    exactly, with the scan enumerating the full chunk grid."""
    from gridded_etl_tools_spark.sources import hdf5 as h5

    rng = np.random.default_rng(seed)
    shape = tuple(int(rng.integers(1, 8)) for _ in range(ndim))
    chunks = tuple(int(rng.integers(1, s + 1)) for s in shape)
    data = (rng.integers(-1000, 1000, size=shape)).astype("f8") / 4.0
    dims = tuple(f"d{i}" for i in range(ndim))
    path = os.path.join(
        str(tmp_path_factory.mktemp("h5ea")), f"p_{seed}.nc4"
    )
    h5.write_hdf5(
        path,
        {
            **{
                d: ((d,), np.arange(s, dtype="f8"), {})
                for d, s in zip(dims, shape)
            },
            "v": (dims, data, {}),
        },
        chunk_shapes={"v": chunks},
        compress=compress,
        latest=True,
        v4_index="extensible",
        v4_ea_params=dict(
            idx_blk_elmts=ib, data_blk_min_elmts=db, sblk_min_dptrs=sp
        ),
    )
    buf = open(path, "rb").read()
    got = h5.parse_hdf5(buf).variables["v"].data
    np.testing.assert_array_equal(got, data)
    base, _ra, dsets, _a2n = h5.scan_hdf5(buf)
    d = {x.name: x for x in dsets}["v"]
    n_chunks = 1
    for s, c in zip(shape, chunks):
        n_chunks *= -(-s // c)
    assert len(d.chunks) == n_chunks
    re_got = h5._materialize(buf[base:] if base else buf, d)
    np.testing.assert_array_equal(re_got, data)
