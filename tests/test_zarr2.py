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

# Certification multiplier for the untrusted-bytes fuzz surfaces: round
# close runs once with SPARK_GRAFT_FUZZ_X=4 (fresh draws via
# HYPOTHESIS_PROFILE=fuzz) on top of the derandomized default run.
FUZZ_X = int(os.environ.get("SPARK_GRAFT_FUZZ_X", "1"))


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


@pytest.mark.parametrize("compressor", ["zlib", "gzip", "blosc", None])
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


@pytest.mark.parametrize(
    "compressor, match",
    [
        ({"id": "lzma"}, "compressor"),
        ({"id": "blosc", "cname": "snappy9"}, "cname"),
    ],
)
def test_unsupported_compressor_raises(tmp_path, compressor, match):
    """Genuinely unknown compressors/cnames still fail fast at metadata
    parse (driver-side).  blosclz and bit-shuffle decode since r9."""
    root = str(tmp_path / "store")
    os.makedirs(os.path.join(root, "v"))
    with open(os.path.join(root, "v", ".zarray"), "w") as f:
        json.dump(
            {"zarr_format": 2, "shape": [1], "chunks": [1], "dtype": "<f8",
             "compressor": compressor,
             "fill_value": None, "order": "C", "filters": None}, f,
        )
    with pytest.raises(zarr2.ZarrError, match=match):
        zarr2.open_store(root)


@pytest.mark.parametrize(
    "compressor",
    [
        {"id": "blosc", "cname": "blosclz", "clevel": 5, "shuffle": 1},
        {"id": "blosc", "cname": "lz4", "shuffle": 2},     # bit-shuffle
        {"id": "blosc", "cname": "blosclz", "shuffle": 2},
    ],
)
def test_blosclz_and_bitshuffle_metadata_accepted(tmp_path, compressor):
    """r9: the last two c-blosc corners (blosclz inner codec, bit-shuffle
    filter) parse instead of refusing."""
    root = str(tmp_path / "store")
    os.makedirs(os.path.join(root, "v"))
    with open(os.path.join(root, "v", ".zarray"), "w") as f:
        json.dump(
            {"zarr_format": 2, "shape": [1], "chunks": [1], "dtype": "<f8",
             "compressor": compressor,
             "fill_value": None, "order": "C", "filters": None}, f,
        )
    assert zarr2.open_store(root)["v"].compressor == compressor


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
        "codecs": [{"name": "bytes"}, {"name": "zstd", "configuration": {}}],
    }))
    with pytest.raises(zarr2.ZarrError, match="zstd"):
        zarr2.open_store(str(root))
    # blosc parses since r8; r9 adds bitshuffle + blosclz, so the v3
    # config normalizes instead of refusing
    (root / "v" / "zarr.json").write_text(_json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [2],
        "data_type": "float64",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [2]}},
        "fill_value": 0,
        "codecs": [{"name": "bytes"},
                   {"name": "blosc",
                    "configuration": {"cname": "blosclz", "shuffle": "bitshuffle"}}],
    }))
    meta = zarr2.open_store(str(root))["v"]
    assert meta.compressor["cname"] == "blosclz"
    assert meta.compressor["shuffle"] == 2
    # a genuinely unknown shuffle string still refuses
    (root / "v" / "zarr.json").write_text(_json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [2],
        "data_type": "float64",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [2]}},
        "fill_value": 0,
        "codecs": [{"name": "bytes"},
                   {"name": "blosc",
                    "configuration": {"cname": "lz4", "shuffle": "zigzag"}}],
    }))
    with pytest.raises(zarr2.ZarrError, match="shuffle"):
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


# --- blosc (the reference's default compressor, r8) --------------------------


def test_blosc_lz4_cross_checked_against_independent_c_impl():
    """The pure-Python LZ4 block codec is validated BOTH directions
    against pyarrow's lz4_raw (an independent C implementation): frames
    we write decode there; frames it writes decode here."""
    import pyarrow as pa

    from gridded_etl_tools_spark.sources import blosc

    c = pa.Codec("lz4_raw")
    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"x",
        b"hello world " * 200,
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
        np.arange(10000, dtype="<f8").tobytes(),
        b"\x00" * 100000,       # overlapping (RLE-style) matches
        b"abc" * 40000,
    ]
    for d in cases:
        mine = blosc.lz4_compress_block(d)
        assert c.decompress(mine, len(d), asbytes=True) == d
        theirs = c.compress(d, asbytes=True)
        assert blosc.lz4_decompress_block(theirs, len(d)) == d


def test_blosc_frame_matrix_roundtrip():
    """compress_frame/decompress_frame across typesize x codec x shuffle
    x split x blocksize, covering multi-block frames, leftover blocks,
    split streams (bsize/typesize >= 128), raw-stored streams, and the
    memcpy fallback for incompressible buffers."""
    from gridded_etl_tools_spark.sources import blosc

    rng = np.random.default_rng(11)
    for ts in (1, 2, 4, 8):
        for cname in ("lz4", "zlib", "blosclz"):
            for shuffle in (0, 1, 2):
                for split in (True, False):
                    for nbytes in (0, 7, 1024, 100004):
                        d = (np.arange(nbytes, dtype=np.uint8) % 251).tobytes()
                        for bs in (0, 4096):
                            f = blosc.compress_frame(
                                d, ts, cname=cname, shuffle=shuffle,
                                blocksize=bs, split=split,
                            )
                            assert blosc.decompress_frame(f) == d, (
                                ts, cname, shuffle, split, nbytes, bs,
                            )
    incompressible = bytes(rng.integers(0, 256, 50000, dtype=np.uint8))
    f = blosc.compress_frame(incompressible, 8)
    assert f[2] & 0x2  # memcpy flag
    assert blosc.decompress_frame(f) == incompressible


def test_blosc_frame_rejects_corruption():
    from gridded_etl_tools_spark.sources import blosc

    d = np.arange(4096, dtype="<f8").tobytes()
    f = bytearray(blosc.compress_frame(d, 8, blocksize=8192))
    with pytest.raises(blosc.BloscError, match="shorter than header"):
        blosc.decompress_frame(bytes(f[:10]))
    with pytest.raises(blosc.BloscError, match="truncated"):
        blosc.decompress_frame(bytes(f[:100]))
    bad = bytearray(f)
    bad[2] |= 0x4  # bit-shuffle flag
    with pytest.raises(blosc.BloscError, match="bit-shuffle"):
        blosc.decompress_frame(bytes(bad))
    bad = bytearray(f)
    bad[2] = (bad[2] & 0x1F) | (5 << 5)  # undefined codec id
    with pytest.raises(blosc.BloscError, match="codec id 5"):
        blosc.decompress_frame(bytes(bad))
    bad = bytearray(f)
    bad[2] |= 0x8  # blosc_set_delta filter: loud refusal, NEVER a
    # silent decode that skips the un-delta (close-review r9)
    with pytest.raises(blosc.BloscError, match="delta"):
        blosc.decompress_frame(bytes(bad))


def test_blosc_hypothesis_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gridded_etl_tools_spark.sources import blosc

    @settings(max_examples=60 * FUZZ_X, deadline=None)
    @given(
        data=st.binary(min_size=0, max_size=8192),
        typesize=st.sampled_from([1, 2, 3, 4, 8, 16]),
        cname=st.sampled_from(["lz4", "zlib", "blosclz"]),
        shuffle=st.sampled_from([0, 1, 2]),
        split=st.booleans(),
        blocksize=st.sampled_from([0, 256, 1024, 1 << 20]),
    )
    def check(data, typesize, cname, shuffle, split, blocksize):
        f = blosc.compress_frame(
            data, typesize, cname=cname, shuffle=shuffle,
            blocksize=blocksize, split=split,
        )
        assert blosc.decompress_frame(f) == data

    check()


def test_blosc_v3_store_round_trip(spark, tmp_path):
    """v3 store with the reference's default BloscCodec(cname='lz4')
    encoding decodes through the chunk-parallel path."""
    data, times, lats, lons = _grid()
    root = str(tmp_path / "v3blosc")
    zarr2.write_zarr3_store(
        root,
        variables={
            "time": (("time",), times, {}),
            "latitude": (("latitude",), lats, {}),
            "longitude": (("longitude",), lons, {}),
            "precip": (("time", "latitude", "longitude"), data,
                       {"_FillValue": -9999.0}),
        },
        chunks={"precip": (2, 3, 2), "time": (2,)},
        fill_values={"precip": -9999.0},
        blosc_lz4=True,
    )
    meta = zarr2.open_store(root)["precip"]
    assert meta.compressor["id"] == "blosc"
    got, rows = _collect(spark, root)
    assert len(rows) == data.size
    for it, t in enumerate(times):
        for ilat, la in enumerate(lats):
            for ilon, lo in enumerate(lons):
                v = data[it, ilat, ilon]
                assert got[(t, la, lo)] == (None if v == -9999.0 else v)


def test_blosc_append_time_chunks_recompresses_with_store_codec(tmp_path):
    """append_time_chunks on a blosc store writes blosc chunks (the
    shared _compress_chunk dispatch), and the appended era reads back."""
    rng = np.random.default_rng(3)
    data = (rng.standard_normal((4, 3, 2)) * 10).astype("<f8")
    times = np.arange(4, dtype="<f8")
    root = str(tmp_path / "blosc_append")
    zarr2.write_zarr_store(
        root,
        variables={
            "time": (("time",), times, {}),
            "precip": (("time", "y", "x"), data, {}),
        },
        chunks={"precip": (2, 3, 2), "time": (2,)},
        compressor="blosc",
    )
    new_times = np.arange(4, 6, dtype="<f8")
    new_data = (rng.standard_normal((2, 3, 2)) * 10).astype("<f8")
    zarr2.append_time_chunks(root, "precip", "time", new_times, new_data)
    meta = zarr2.open_store(root)["precip"]
    got = zarr2.read_array(root, meta)
    assert np.array_equal(got, np.concatenate([data, new_data]))
    # the appended chunk is a real blosc frame, not raw/zlib bytes
    with open(os.path.join(root, "precip", "2.0.0"), "rb") as fh:
        frame = fh.read()
    from gridded_etl_tools_spark.sources import blosc

    assert blosc.decompress_frame(frame)  # parses as blosc


# --- per-chunk encryption (reference EncryptionFilter parity, r8) -----------


def test_xchacha_block_matches_independent_impl():
    """The pure-Python ChaCha20 round core is pinned against the
    'cryptography' package's C implementation: the full block function
    (core + final add) must reproduce its keystream exactly, which
    fixes the quarter-round, word ordering and endianness the
    HChaCha20 subkey path shares."""
    import os as _os
    import struct as _struct

    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    from gridded_etl_tools_spark.functions import xchacha as X

    for trial in range(8):
        key = _os.urandom(32)
        nonce12 = _os.urandom(12)
        counter = trial * 11
        enc = Cipher(
            algorithms.ChaCha20(key, _struct.pack("<I", counter) + nonce12),
            mode=None,
        ).encryptor()
        assert X.chacha20_block(key, counter, nonce12) == enc.update(b"\0" * 64)


def test_hchacha20_draft_vector():
    """draft-irtf-cfrg-xchacha §2.2.1 test vector."""
    from gridded_etl_tools_spark.functions.xchacha import hchacha20

    key = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f"
    )
    nonce = bytes.fromhex("000000090000004a0000000031415927")
    assert hchacha20(key, nonce).hex() == (
        "82413b4227b27bfed30e42508a877d73"
        "a0f9e4d58a74a853c12ec41326d3ecdc"
    )


def test_xchacha_chunk_framing_roundtrip_and_tamper():
    import os as _os

    from gridded_etl_tools_spark.functions import xchacha as X

    key = _os.urandom(32)
    raw = b"chunk payload " * 500
    frame = X.encrypt_chunk(key, raw)
    assert len(frame) == 24 + 16 + len(raw)  # reference nonce|tag|ct framing
    assert X.decrypt_chunk(key, frame) == raw
    from cryptography.exceptions import InvalidTag

    with pytest.raises(InvalidTag):
        X.decrypt_chunk(key, frame[:50] + b"\x00" + frame[51:])
    with pytest.raises(InvalidTag):
        X.decrypt_chunk(_os.urandom(32), frame)
    with pytest.raises(InvalidTag):  # AAD header is authenticated
        X.decrypt_chunk(key, frame, header=b"other")


def test_encrypted_store_roundtrip_append_and_keyless_refusal(spark, tmp_path):
    """The reference's EncryptionFilter shape end to end: filters
    metadata on the data var, encrypt-then-compress chunk pipeline,
    registry-keyed decode (chunk-parallel AND driver reads), appends
    re-encrypt with the store's own key, and a keyless open fails with
    the registration hint — never garbage data."""
    from gridded_etl_tools_spark.functions.encryption import (
        _KEY_REGISTRY,
        register_encryption_key,
    )

    key = bytes(range(32))
    digest = register_encryption_key(key)
    data, times, lats, lons = _grid()
    root = str(tmp_path / "enc.zarr")
    _write(
        root, data, times, lats, lons,
        compressor="blosc", encryption_key_hash=digest,
        encrypt_vars=("precip",),
    )
    meta = zarr2.open_store(root)["precip"]
    assert meta.filters == [{"id": "xchacha20poly1305", "key_hash": digest}]
    # ciphertext on disk: the raw plaintext never appears in any chunk
    from gridded_etl_tools_spark.sources.blosc import decompress_frame

    with open(os.path.join(root, "precip", "0.0.0"), "rb") as f:
        payload = decompress_frame(f.read())
    assert data[:2, :3, :2].tobytes() not in payload

    got, rows = _collect(spark, root)  # executor-side decode path
    assert len(rows) == data.size
    assert got[(2.0, 36.75, -115.0)] == data[2, 3, 4]
    assert got[(0.0, 36.0, -116.0)] is None  # fill sentinel survives

    # keyless: clear registration error, driver and metadata both fine
    saved = dict(_KEY_REGISTRY)
    _KEY_REGISTRY.clear()
    try:
        keyless = zarr2.open_store(root)["precip"]
        assert keyless.filter_key is None
        with pytest.raises(zarr2.ZarrError, match="register_encryption_key"):
            zarr2.read_array(root, keyless)
    finally:
        _KEY_REGISTRY.update(saved)


def test_encrypted_distributed_sink_and_append(spark, tmp_path):
    """write_zarr_distributed(encryption_key_hash=...) + distributed
    append on the encrypted store: executor-parallel encrypt-then-
    compress chunk writes, reference filter metadata, exact readback."""
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.functions.encryption import (
        register_encryption_key,
    )
    from gridded_etl_tools_spark.sinks.zarr_sink import (
        append_zarr_distributed,
        write_zarr_distributed,
    )

    digest = register_encryption_key(bytes(range(100, 132)))

    def grid(t_lo, t_hi):
        return spark.range(100).select(
            (F.col("id") / 10).cast("int").cast("double").alias("t"),
            (F.col("id") % 10).cast("double").alias("x"),
            (F.col("id") * 1.5).alias("value"),
        ).filter((F.col("t") >= t_lo) & (F.col("t") < t_hi))

    root = str(tmp_path / "encsink.zarr")
    write_zarr_distributed(
        grid(0, 4), root, "v", dims=["t", "x"], chunks=(2, 10),
        encryption_key_hash=digest,
    )
    append_zarr_distributed(grid(4, 10), root, "v")
    rows = {
        (r["t"], r["x"]): r["value"]
        for r in zarr2.decode_zarr_long(spark, root, "v").collect()
    }
    assert len(rows) == 100
    for i in range(100):
        assert rows[(float(i // 10), float(i % 10))] == pytest.approx(i * 1.5)
    # v3 + encryption: loud refusal (no standard v3 encryption codec)
    with pytest.raises(NotImplementedError, match="v2"):
        write_zarr_distributed(
            grid(0, 4), str(tmp_path / "v3enc"), "v", dims=["t", "x"],
            zarr_format=3, encryption_key_hash=digest,
        )


def test_blosc_distributed_sink_roundtrip(spark, tmp_path):
    """compressor='blosc' through the distributed sink + distributed
    append: the executor write path shares the v2 codec dispatch, so
    the store reads back exactly and carries numcodecs.Blosc metadata."""
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.sinks.zarr_sink import (
        append_zarr_distributed,
        write_zarr_distributed,
    )

    df = spark.range(80).select(
        (F.col("id") / 10).cast("int").cast("double").alias("t"),
        (F.col("id") % 10).cast("double").alias("x"),
        (F.col("id") * 0.5).alias("value"),
    )
    root = str(tmp_path / "bloscsink.zarr")
    write_zarr_distributed(
        df.filter(F.col("t") < 4), root, "v", dims=["t", "x"],
        chunks=(2, 10), compressor="blosc",
    )
    meta = zarr2.open_store(root)["v"]
    assert meta.compressor["id"] == "blosc"
    append_zarr_distributed(df.filter(F.col("t") >= 4), root, "v")
    rows = {
        (r["t"], r["x"]): r["value"]
        for r in zarr2.decode_zarr_long(spark, root, "v").collect()
    }
    assert len(rows) == 80
    for i in range(80):
        assert rows[(float(i // 10), float(i % 10))] == pytest.approx(i * 0.5)


def test_blosc_zstd_snappy_inner_codecs(spark, tmp_path):
    """Real-world stores also ship Blosc(cname='zstd'|'snappy'); those
    inner streams decode through pyarrow's C codecs (the container
    format stays the in-repo frame codec).  End-to-end store check on
    zstd; frame-level on snappy; an undefined codec id still refuses."""
    import json as _json

    from gridded_etl_tools_spark.sources import blosc

    data_bytes = np.arange(4096, dtype="<f8").tobytes()
    for cname in ("zstd", "snappy"):
        f = blosc.compress_frame(data_bytes, 8, cname=cname, blocksize=8192)
        assert blosc.decompress_frame(f) == data_bytes
    with pytest.raises(blosc.BloscError, match="codec id 6"):
        # a frame claiming an id past every defined c-blosc codec
        bad = bytearray(blosc.compress_frame(data_bytes, 8))
        bad[2] = (bad[2] & 0x1F) | (6 << 5)
        blosc.decompress_frame(bytes(bad))
    # a frame mislabeled blosclz (codec id 0) fails CLEANLY: its lz4
    # streams are not valid blosclz, so BloscError — never garbage
    with pytest.raises(blosc.BloscError, match="blosclz"):
        bad = bytearray(blosc.compress_frame(data_bytes, 8))
        bad[2] = bad[2] & 0x1F  # codec bits -> 0
        blosc.decompress_frame(bytes(bad))

    # store-level: rewrite a blosc store's metadata+chunks to zstd
    data, times, lats, lons = _grid()
    root = str(tmp_path / "zstd_store")
    _write(root, data, times, lats, lons, compressor="blosc")
    for dirpath, _dn, files in os.walk(root):
        for fn in files:
            if fn.startswith("."):
                continue
            p = os.path.join(dirpath, fn)
            with open(p, "rb") as fh:
                raw = blosc.decompress_frame(fh.read())
            var = os.path.basename(dirpath)
            meta = zarr2.open_store(root)[var]
            with open(p, "wb") as fh:
                fh.write(
                    blosc.compress_frame(
                        raw, meta.dtype.itemsize, cname="zstd"
                    )
                )
    for marker in (".zmetadata",):
        path = os.path.join(root, marker)
        doc = _json.load(open(path))
        for k, v in doc["metadata"].items():
            if k.endswith(".zarray") and v.get("compressor"):
                v["compressor"]["cname"] = "zstd"
        _json.dump(doc, open(path, "w"))
    for var in ("time", "latitude", "longitude", "precip"):
        zpath = os.path.join(root, var, ".zarray")
        doc = _json.load(open(zpath))
        if doc.get("compressor"):
            doc["compressor"]["cname"] = "zstd"
        _json.dump(doc, open(zpath, "w"))
    got, rows = _collect(spark, root)
    assert len(rows) == data.size
    assert got[(2.0, 36.75, -115.0)] == data[2, 3, 4]


def test_blosc_decoder_fuzz_clean_errors_only():
    """The frame decoder consumes UNTRUSTED store bytes: random buffers
    and random mutations of a valid frame must either decode (a
    mutation can land in a don't-care byte) or raise BloscError —
    never IndexError/struct.error/MemoryError/OverflowError."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gridded_etl_tools_spark.sources import blosc

    valid = blosc.compress_frame(
        np.arange(4096, dtype="<f8").tobytes(), 8, blocksize=8192
    )

    @settings(max_examples=200 * FUZZ_X, deadline=None)
    @given(data=st.binary(min_size=0, max_size=200))
    def random_bytes(data):
        try:
            blosc.decompress_frame(data)
        except blosc.BloscError:
            pass

    @settings(max_examples=200 * FUZZ_X, deadline=None)
    @given(
        pos=st.integers(min_value=0, max_value=len(valid) - 1),
        val=st.integers(min_value=0, max_value=255),
        cut=st.integers(min_value=0, max_value=len(valid)),
    )
    def mutated_frames(pos, val, cut):
        buf = bytearray(valid)
        buf[pos] = val
        for payload in (bytes(buf), bytes(buf[:cut])):
            try:
                blosc.decompress_frame(payload)
            except blosc.BloscError:
                pass

    random_bytes()
    mutated_frames()


def test_encrypted_chunk_fuzz_clean_errors_only():
    """decrypt_chunk on mutated/truncated ciphertext: InvalidTag or
    ValueError, never a crash from framing arithmetic."""
    from cryptography.exceptions import InvalidTag
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gridded_etl_tools_spark.functions import xchacha

    key = bytes(range(32))
    frame = xchacha.encrypt_chunk(key, b"payload bytes " * 64)

    @settings(max_examples=150 * FUZZ_X, deadline=None)
    @given(
        pos=st.integers(min_value=0, max_value=len(frame) - 1),
        val=st.integers(min_value=0, max_value=255),
        cut=st.integers(min_value=0, max_value=len(frame)),
    )
    def mutated(pos, val, cut):
        buf = bytearray(frame)
        original = buf[pos]
        buf[pos] = val
        for payload in (bytes(buf), bytes(buf[:cut])):
            try:
                out = xchacha.decrypt_chunk(key, payload)
                # only the UNMUTATED full frame may authenticate
                assert val == original and len(payload) == len(frame)
            except (InvalidTag, ValueError):
                pass

    mutated()


# --- round-9 ADVICE fixes ----------------------------------------------------


def test_lz4_fast_path_validates_decoded_length():
    """ADVICE r8 (high): pyarrow's lz4_raw pads a valid-but-short stream
    out to dst_size with uninitialized bytes instead of raising, which
    broke the 'always raises BloscError on a bad stream' contract the
    split-count retry depends on.  lz4_decompress must reject a stream
    whose true decoded size differs from dst_size — both directions."""
    from gridded_etl_tools_spark.sources import blosc

    payload = b"hello world, hello world, hello world!!"
    comp = blosc.lz4_compress(payload)
    assert blosc.lz4_decompress(comp, len(payload)) == payload
    with pytest.raises(blosc.BloscError, match="decodes to"):
        blosc.lz4_decompress(comp, len(payload) + 17)  # would pad silently
    with pytest.raises(blosc.BloscError):
        blosc.lz4_decompress(comp, len(payload) - 1)


def test_lz4_dst_size_one_and_nonstrict_paths():
    """ADVICE r9 (low) edges: at dst_size==1 the probe buffer would be
    0 bytes, where pyarrow's failure is ambiguous — that case validates
    via the exact token walk (a padded empty stream must REJECT, a true
    1-byte stream must pass); strict=False documents the per-block
    fast path: it skips the probe entirely, returning the padded buffer
    (its only caller probes each block's lead compressed stream)."""
    from gridded_etl_tools_spark.sources import blosc

    one = blosc.lz4_compress(b"X")
    assert blosc.lz4_decompress(one, 1) == b"X"
    empty = blosc.lz4_compress(b"")
    with pytest.raises(blosc.BloscError, match="1-byte"):
        blosc.lz4_decompress(empty, 1)  # true size 0, would pad to 1
    short = blosc.lz4_compress(b"ab")
    with pytest.raises(blosc.BloscError):
        blosc.lz4_decompress(short, 40)  # strict: padded output rejected
    assert len(blosc.lz4_decompress(short, 40, strict=False)) == 40


def test_lz4_decoded_length_agrees_with_both_encoders():
    """The length-only token walk returns the exact decoded size for
    streams from BOTH encoders (ours and pyarrow's C one), and raises
    BloscError on structural corruption."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gridded_etl_tools_spark.sources import blosc

    c = pa.Codec("lz4_raw")

    @settings(max_examples=80 * FUZZ_X, deadline=None)
    @given(data=st.binary(min_size=0, max_size=4096))
    def check(data):
        assert blosc.lz4_decoded_length(blosc.lz4_compress_block(data)) == len(data)
        assert blosc.lz4_decoded_length(c.compress(data, asbytes=True)) == len(data)

    check()
    with pytest.raises(blosc.BloscError):
        blosc.lz4_decoded_length(b"\xff\x01")  # truncated literal run


def test_corrupt_short_lead_stream_in_later_block_raises():
    """Code-review r10: the r9 per-frame probe memo let a corrupt
    stream that decodes SHORT pass silently (zero-padded) once any
    sibling stream had confirmed the layout, and a failed split-count
    retry left the wrong layout memoized for every later block.  The
    per-BLOCK lead-stream policy must catch a valid-but-short lz4
    stream spliced into a later block's lead position."""
    import struct as _struct

    from gridded_etl_tools_spark.sources import blosc

    data = (np.arange(2048, dtype="<f8") % 97).tobytes()  # 2 x 8192 B
    f = bytearray(
        blosc.compress_frame(data, 8, cname="lz4", blocksize=8192,
                             split=False)
    )
    b2 = _struct.unpack_from("<2I", f, 16)[1]
    # a VALID lz4 stream whose true decoded size is 64 bytes short of
    # the declared 8192-byte split — pyarrow would pad it silently
    short_payload = blosc.lz4_compress(data[8192:16384 - 64])
    new = bytearray(
        bytes(f[:b2]) + _struct.pack("<I", len(short_payload))
        + short_payload
    )
    _struct.pack_into("<I", new, 12, len(new))  # fix cbytes
    with pytest.raises(blosc.BloscError):
        blosc.decompress_frame(bytes(new))


def test_blosc_dont_split_flag_mismatch_retries_correctly():
    """The exact silent-corruption scenario from the ADVICE: a frame
    written SPLIT but flagged dont-split (the alternate-c-blosc-vintage
    case the retry exists for) must decode to the original bytes via
    the alternate-split retry — not silently to padded garbage."""
    from gridded_etl_tools_spark.sources import blosc

    d = np.arange(4096, dtype="<f8").tobytes()  # ts=8, bsize/ts>=128 → split
    f = bytearray(blosc.compress_frame(d, 8, cname="lz4", blocksize=8192))
    assert not (f[2] & 0x10)  # written split
    f[2] |= 0x10  # lie: claim dont-split, so the heuristic guesses 1
    assert blosc.decompress_frame(bytes(f)) == d
    # and the mirror image: written unsplit, flagged split
    g = bytearray(blosc.compress_frame(d, 8, cname="lz4", blocksize=8192,
                                       split=False))
    assert g[2] & 0x10
    g[2] &= ~0x10 & 0xFF
    assert blosc.decompress_frame(bytes(g)) == d


def test_xchacha_key_length_validated_before_chunk_io(tmp_path):
    """ADVICE r8 (low): a registered 16/24-byte AES key passes the
    registry but XChaCha20 needs exactly 32 bytes — both write paths
    must fail UP FRONT naming the requirement, before any chunk file
    is written."""
    from gridded_etl_tools_spark.functions.encryption import (
        register_encryption_key,
    )

    digest16 = register_encryption_key(bytes(range(16)))
    data, times, lats, lons = _grid()
    root = str(tmp_path / "short_key.zarr")
    with pytest.raises(ValueError, match="32-byte"):
        _write(
            root, data, times, lats, lons,
            compressor="blosc", encryption_key_hash=digest16,
            encrypt_vars=("precip",),
        )
    # failed before any chunk I/O: no chunk files under the array dir
    assert not os.path.exists(os.path.join(root, "precip", "0.0.0"))


def test_xchacha_key_length_validated_in_distributed_sink(spark, tmp_path):
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.functions.encryption import (
        register_encryption_key,
    )
    from gridded_etl_tools_spark.sinks.zarr_sink import write_zarr_distributed

    digest24 = register_encryption_key(bytes(range(24)))
    df = spark.range(8).select(
        F.col("id").cast("double").alias("time"),
        F.lit(1.0).alias("latitude"),
        F.lit(2.0).alias("longitude"),
        (F.col("id") * 1.5).alias("precip"),
    )
    with pytest.raises(ValueError, match="32-byte"):
        write_zarr_distributed(
            df, str(tmp_path / "s.zarr"), dims=("time", "latitude", "longitude"),
            data_var="precip", chunks={"time": 4, "latitude": 1, "longitude": 1},
            encryption_key_hash=digest24,
        )
    assert not os.path.exists(os.path.join(str(tmp_path / "s.zarr"), "precip"))


# --- round-9 codec corners: blosclz inner codec + bit-shuffle filter ---------


def test_blosclz_format_vectors():
    """Handcrafted byte-level vectors straight from the blosclz/FastLZ-2
    stream format (c-blosc blosclz.c): literal runs, the 3-byte minimum
    match, distance-1 RLE runs, multi-byte length extension, the 16-bit
    far-distance escape (ctrl&31==31, low byte 255), and the first-ctrl
    level-marker masking."""
    from gridded_etl_tools_spark.sources import blosc

    dec = blosc.blosclz_decompress
    # pure literal run: ctrl=4 -> 5 literals
    assert dec(bytes([4]) + b"hello", 5) == b"hello"
    # minimum match: "abcabc" = 3 literals + match(len 3, dist 3):
    # field 1 -> ctrl 0x20 | hi(stored=2)=0, low byte 2
    assert dec(bytes([2]) + b"abc" + bytes([0x20, 2]), 6) == b"abcabc"
    # RLE: "a"*7 = 1 literal + match(len 6, dist 1 -> stored 0)
    assert dec(bytes([0]) + b"a" + bytes([4 << 5, 0]), 7) == b"a" * 7
    # extended length: field 7 + ext [255, 0] -> 6+255+0+3 = 264
    assert dec(bytes([0]) + b"a" + bytes([(7 << 5), 255, 0, 0]), 265) == b"a" * 265
    # far distance: 9000 literal bytes, then match(len 4) at distance
    # 9000: far escape (hi 31, low 255) + ofs16 = 9000-8192 = 808
    rng = np.random.default_rng(5)
    base = bytes(rng.integers(0, 256, 9000, dtype=np.uint8))
    s = bytearray()
    pos = 0
    while pos < 9000:
        run = min(32, 9000 - pos)
        s.append(run - 1)
        s += base[pos:pos + run]
        pos += run
    s += bytes([(2 << 5) | 31, 255, 808 >> 8, 808 & 255])
    assert dec(bytes(s), 9004) == base + base[:4]
    # the first ctrl byte is masked &31 (FastLZ level marker bits)
    assert dec(bytes([0x20 | 4]) + b"hello", 5) == b"hello"


def test_blosclz_rejects_corruption():
    from gridded_etl_tools_spark.sources import blosc

    dec = blosc.blosclz_decompress
    with pytest.raises(blosc.BloscError, match="empty"):
        dec(b"", 5)
    with pytest.raises(blosc.BloscError, match="literals past end"):
        dec(bytes([10]) + b"abc", 11)            # run longer than stream
    with pytest.raises(blosc.BloscError, match="distance"):
        dec(bytes([0]) + b"a" + bytes([0x20, 5]), 4)   # dist 6 at pos 1
    with pytest.raises(blosc.BloscError, match="truncated match length"):
        dec(bytes([0]) + b"a" + bytes([(7 << 5), 255]), 600)
    with pytest.raises(blosc.BloscError, match="truncated far"):
        dec(bytes([0]) + b"a" + bytes([(2 << 5) | 31, 255]), 600)
    with pytest.raises(blosc.BloscError, match="overruns"):
        dec(bytes([2]) + b"abc" + bytes([0x20, 2]), 4)  # decodes to 6
    with pytest.raises(blosc.BloscError, match="decoded"):
        dec(bytes([2]) + b"abc", 9)              # valid but short


def test_blosclz_roundtrip_hypothesis():
    """Encoder/decoder mutual consistency over adversarial inputs
    (low-entropy for dense matches incl. RLE, high-entropy for
    literal-run paths, planted long-range repeats for the far form)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gridded_etl_tools_spark.sources import blosc

    @settings(max_examples=120 * FUZZ_X, deadline=None)
    @given(
        body=st.binary(min_size=0, max_size=4096),
        alphabet=st.sampled_from([2, 8, 256]),
        plant_far=st.booleans(),
    )
    def check(body, alphabet, plant_far):
        data = bytes(b % alphabet for b in body)
        if plant_far and len(data) >= 16:
            data = data[:16] + bytes(10000) + data[:16]
        comp = blosc.blosclz_compress(data)
        assert blosc.blosclz_decompress(comp, len(data)) == data

    check()


def test_bitshuffle_matches_spec_micro_vectors():
    """LSB-first bit-matrix transpose semantics (bitshuffle_core.c
    bshuf_trans_bit_elem): for 8 uint8 elements the output byte b packs
    bit b of each element, element k at bit position k."""
    from gridded_etl_tools_spark.sources import blosc

    # bit 0 set in all 8 elements -> first bit-row all ones, rest zero
    assert blosc.bitshuffle_bytes(bytes([1] * 8), 1) == bytes(
        [0xFF, 0, 0, 0, 0, 0, 0, 0]
    )
    # element k has ONLY bit k set -> the bit matrix is the identity
    d = bytes([1, 2, 4, 8, 16, 32, 64, 128])
    assert blosc.bitshuffle_bytes(d, 1) == d
    # typesize 2: byte-transpose first, then per-byte-position bit rows:
    # low bytes of 8 x uint16 with bit 0 set -> one full row, zeros after
    d = np.full(8, 1, dtype="<u2").tobytes()
    got = blosc.bitshuffle_bytes(d, 2)
    assert got == bytes([0xFF]) + bytes(15)
    # non-multiple-of-8 element tail is copied verbatim (shuffle.c)
    d = bytes(range(20))  # 20 elements of 1 byte: 16 shuffled + 4 raw
    got = blosc.bitshuffle_bytes(d, 1)
    assert got[16:] == d[16:]
    assert blosc.bitunshuffle_bytes(got, 1) == d


def test_bitshuffle_whole_block_layout_above_8k():
    """Lock the c-blosc layout: shuffle.c's bitshuffle() runs
    bshuf_trans_bit_elem ONCE over the whole trimmed block — there is NO
    ~8192-byte sub-block boundary (that belongs to the standalone
    library's bshuf_bitshuffle API, which c-blosc never calls).  Real
    c-blosc/numcodecs are not installed in this container, so the pin is
    an independently-written naive per-bit reference of the documented
    kernel (byte j, bit b, group g packs bit b of byte j of elements
    8g..8g+7, LSB-first) evaluated on a block 4x the old sub-block size;
    any sub-blocking regression diverges from it immediately."""
    from gridded_etl_tools_spark.sources import blosc

    def naive_whole_block(data: bytes, ts: int) -> bytes:
        n = (len(data) // ts) & ~7  # trim to a multiple of 8 elements
        out = bytearray(data)  # verbatim tail beyond n*ts
        for j in range(ts):
            for b in range(8):
                row = (j * 8 + b) * (n // 8)
                for g in range(n // 8):
                    byte = 0
                    for k in range(8):
                        bit = (data[(8 * g + k) * ts + j] >> b) & 1
                        byte |= bit << k
                    out[row + g] = byte
        return bytes(out)

    rng = np.random.default_rng(17)
    ts = 2
    nbytes = 4 * 8192 + 6 * ts + 1  # 4x the old sub-block, ragged tail
    d = rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
    expect = naive_whole_block(d, ts)
    got = blosc.bitshuffle_bytes(d, ts)
    assert got == expect
    assert blosc.bitunshuffle_bytes(got, ts) == d


def test_bitshuffle_roundtrip_and_blocking():
    """Round trip across typesizes and sizes spanning the bshuf default
    sub-block boundary (8192 bytes target), plus the compressibility
    property the filter exists for: low-entropy int16 data must shuffle
    into long bit-runs that compress far better than plain bytes."""
    import zlib as _zlib

    from gridded_etl_tools_spark.sources import blosc

    rng = np.random.default_rng(9)
    for ts in (1, 2, 3, 4, 8, 16):
        sub = max((8192 // ts) // 8 * 8, 128) * ts
        for nbytes in (0, 1, ts * 8, sub - ts, sub, sub + ts, 3 * sub + 13):
            d = rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
            s = blosc.bitshuffle_bytes(d, ts)
            assert len(s) == len(d)
            assert blosc.bitunshuffle_bytes(s, ts) == d, (ts, nbytes)
    vals = (np.arange(65536, dtype="<i2") // 64).tobytes()
    plain = len(_zlib.compress(vals))
    shuf = len(_zlib.compress(blosc.bitshuffle_bytes(vals, 2)))
    assert shuf * 2 < plain  # the whole point of the filter (2.65x here)


def test_bitshuffle_store_roundtrip(spark, tmp_path):
    """A v2 store written with shuffle=2 (the common int16 satellite
    encoding) decodes through the chunk-parallel path, and a v3 store
    with BloscCodec(shuffle='bitshuffle') does too."""
    data, times, lats, lons = _grid()
    root = str(tmp_path / "bitshuf.zarr")
    zarr2.write_zarr_store(
        root,
        variables={
            "time": (("time",), times, {}),
            "latitude": (("latitude",), lats, {}),
            "longitude": (("longitude",), lons, {}),
            "precip": (("time", "latitude", "longitude"), data,
                       {"_FillValue": -9999.0}),
        },
        chunks={"precip": (2, 3, 2), "time": (2,)},
        compressor="blosc",
        fill_values={"precip": -9999.0},
    )
    # rewrite the data var's chunks with bitshuffle + blosclz (the two
    # r9 corners together) and patch the metadata to match
    import json as _json

    from gridded_etl_tools_spark.sources import blosc as _blosc

    meta = zarr2.open_store(root)["precip"]
    for key in os.listdir(os.path.join(root, "precip")):
        if key.startswith("."):
            continue
        p = os.path.join(root, "precip", key)
        raw = zarr2.decode_chunk(open(p, "rb").read(), meta)
        with open(p, "wb") as fh:
            fh.write(_blosc.compress_frame(
                raw.tobytes(), meta.dtype.itemsize, cname="blosclz", shuffle=2,
            ))
    for zpath in (os.path.join(root, "precip", ".zarray"),):
        doc = _json.load(open(zpath))
        doc["compressor"].update({"cname": "blosclz", "shuffle": 2})
        _json.dump(doc, open(zpath, "w"))
    zm = os.path.join(root, ".zmetadata")
    doc = _json.load(open(zm))
    doc["metadata"]["precip/.zarray"]["compressor"].update(
        {"cname": "blosclz", "shuffle": 2}
    )
    _json.dump(doc, open(zm, "w"))

    got, rows = _collect(spark, root)
    assert len(rows) == data.size
    assert got[(2.0, 36.75, -115.0)] == data[2, 3, 4]
    assert got[(0.0, 36.0, -116.0)] is None


# --- zarr v3 sharding_indexed (r9) -------------------------------------------


def test_crc32c_vectors():
    """Pinned to the standard CRC-32C check value and composition."""
    assert zarr2.crc32c(b"123456789") == 0xE3069283
    assert zarr2.crc32c(b"") == 0
    assert zarr2.crc32c(b"\x00" * 32) == 0x8A9136AA  # RFC 3720 B.4 vector


def _write_sharded(root, blosc_inner=False):
    nt, nlat, nlon = 5, 6, 8
    data = (np.arange(nt * nlat * nlon, dtype="<f8")
            .reshape(nt, nlat, nlon) * 3 % 97) / 4
    data[0, :2, :2] = -9999.0  # a whole inner chunk of fill -> elided
    zarr2.write_zarr3_store(
        root,
        variables={
            "time": (("time",), np.arange(nt, dtype="<f8"), {}),
            "latitude": (("latitude",), 36 + 0.25 * np.arange(nlat), {}),
            "longitude": (("longitude",), -116 + 0.25 * np.arange(nlon), {}),
            "precip": (("time", "latitude", "longitude"), data,
                       {"_FillValue": -9999.0}),
        },
        chunks={"precip": (1, 2, 2), "time": (5,)},
        shards={"precip": (2, 4, 4)},  # 2x2x2 inner chunks per shard
        fill_values={"precip": -9999.0},
        blosc_lz4=blosc_inner,
    )
    return data


@pytest.mark.parametrize("blosc_inner", [False, True])
def test_zarr3_sharded_store_roundtrip(spark, tmp_path, blosc_inner):
    """v3 sharding_indexed — the format's flagship object-store feature
    (many inner chunks per object): metadata parse, index-at-end with
    crc32c, per-inner-chunk decode through the inner codec chain
    (gzip AND the reference's blosc default), elided all-fill inner
    chunks, edge shards, chunk-parallel Spark read."""
    root = str(tmp_path / "sharded.zarr")
    data = _write_sharded(root, blosc_inner)
    m = zarr2.open_store(root)["precip"]
    assert m.chunks == (2, 4, 4)
    assert m.shard["inner_chunks"] == (1, 2, 2)
    assert m.shard["index_crc"] and m.shard["index_location"] == "end"
    # driver read
    arr = zarr2.read_array(root, m)
    np.testing.assert_array_equal(arr, data)
    # executor (chunk-parallel) read: one task per SHARD file
    got, rows = _collect(spark, root)
    assert len(rows) == data.size
    assert got[(2.0, 36.75, -115.0)] == data[2, 3, 4]
    assert got[(0.0, 36.0, -116.0)] is None  # elided inner chunk -> fill
    # an elided inner chunk really is absent from the shard index
    raw = open(os.path.join(root, "precip", "c", "0", "0", "0"), "rb").read()
    table = np.frombuffer(raw[-(16 * 8 + 4):-4], dtype="<u8").reshape(8, 2)
    assert int((table == 0xFFFFFFFFFFFFFFFF).all(axis=1).sum()) == 1


def test_zarr3_shard_corruption_rejected(tmp_path):
    """Untrusted shard bytes: crc mismatch, truncated index, and
    out-of-range inner offsets all raise ZarrError — never garbage."""
    root = str(tmp_path / "sharded.zarr")
    _write_sharded(root)
    m = zarr2.open_store(root)["precip"]
    p = os.path.join(root, "precip", "c", "0", "0", "0")
    raw = open(p, "rb").read()

    flipped = bytearray(raw)
    flipped[-1] ^= 0xFF  # corrupt the crc trailer
    with pytest.raises(zarr2.ZarrError, match="crc32c"):
        zarr2.decode_chunk(bytes(flipped), m)
    with pytest.raises(zarr2.ZarrError, match="shorter than its index"):
        zarr2.decode_chunk(raw[:40], m)
    # point an index entry past the shard end (then fix the crc so the
    # range check is what fires)
    bad = bytearray(raw)
    table = np.frombuffer(bad[-(16 * 8 + 4):-4], dtype="<u8").reshape(8, 2).copy()
    live = int(np.argmax(~(table == 0xFFFFFFFFFFFFFFFF).all(axis=1)))
    table[live, 1] = len(raw) + 1000
    idx = table.astype("<u8").tobytes()
    bad[-(16 * 8 + 4):] = idx + zarr2.crc32c(idx).to_bytes(4, "little")
    with pytest.raises(zarr2.ZarrError, match="past shard end"):
        zarr2.decode_chunk(bytes(bad), m)


def test_zarr3_shard_metadata_validation(tmp_path):
    """Misdeclared sharding refuses at parse time: inner shape that does
    not tile the outer, unknown index codecs, bad index_location."""
    import json as _json

    def _arr_meta(codecs):
        return _json.dumps({
            "zarr_format": 3, "node_type": "array", "shape": [4],
            "data_type": "float64",
            "chunk_grid": {"name": "regular",
                           "configuration": {"chunk_shape": [4]}},
            "fill_value": 0, "codecs": codecs,
        }).encode()

    base_inner = [{"name": "bytes", "configuration": {"endian": "little"}}]
    with pytest.raises(zarr2.ZarrError, match="does not tile"):
        zarr2.parse_zarr3_array("v", _arr_meta([{
            "name": "sharding_indexed",
            "configuration": {"chunk_shape": [3], "codecs": base_inner},
        }]))
    with pytest.raises(zarr2.ZarrError, match="index codec"):
        zarr2.parse_zarr3_array("v", _arr_meta([{
            "name": "sharding_indexed",
            "configuration": {"chunk_shape": [2], "codecs": base_inner,
                              "index_codecs": [{"name": "gzip"}]},
        }]))
    with pytest.raises(zarr2.ZarrError, match="index_location"):
        zarr2.parse_zarr3_array("v", _arr_meta([{
            "name": "sharding_indexed",
            "configuration": {"chunk_shape": [2], "codecs": base_inner,
                              "index_location": "middle"},
        }]))
    with pytest.raises(zarr2.ZarrError, match="nested sharding"):
        zarr2.parse_zarr3_array("v", _arr_meta([{
            "name": "sharding_indexed",
            "configuration": {"chunk_shape": [2], "codecs": [{
                "name": "sharding_indexed",
                "configuration": {"chunk_shape": [1],
                                  "codecs": base_inner},
            }]},
        }]))
    # index_location "start" parses and decodes
    meta = zarr2.parse_zarr3_array("v", _arr_meta([{
        "name": "sharding_indexed",
        "configuration": {"chunk_shape": [2], "codecs": base_inner,
                          "index_location": "start"},
    }]))
    assert meta.shard["index_location"] == "start"
    # hand-build a start-indexed shard: index first, then two raw
    # inner chunks of 2 float64 each
    import struct as _struct

    inner0 = np.array([1.0, 2.0], "<f8").tobytes()
    inner1 = np.array([3.0, 4.0], "<f8").tobytes()
    idx_size = 16 * 2 + 4
    table = np.array(
        [[idx_size, 16], [idx_size + 16, 16]], dtype="<u8"
    ).tobytes()
    shardbytes = (
        table + zarr2.crc32c(table).to_bytes(4, "little") + inner0 + inner1
    )
    out = zarr2.decode_chunk(shardbytes, meta)
    np.testing.assert_array_equal(out, [1.0, 2.0, 3.0, 4.0])


def test_shard_codec_chain_refusals_and_layout_honored(tmp_path):
    """Close-review r9 round 2: (a) spec-legal chains this reader does
    not apply refuse at PARSE time (codec after sharding_indexed,
    compressor before it, duplicate sharding) instead of reading back
    as a misleading crc mismatch; (b) encode honors a store's declared
    index layout (start location, no-crc), both directions."""
    import json as _json

    def _arr_meta(codecs):
        return _json.dumps({
            "zarr_format": 3, "node_type": "array", "shape": [4],
            "data_type": "float64",
            "chunk_grid": {"name": "regular",
                           "configuration": {"chunk_shape": [4]}},
            "fill_value": 0, "codecs": codecs,
        }).encode()

    base_inner = [{"name": "bytes", "configuration": {"endian": "little"}}]
    shard_codec = {"name": "sharding_indexed",
                   "configuration": {"chunk_shape": [2],
                                     "codecs": base_inner}}
    with pytest.raises(zarr2.ZarrError, match="after sharding_indexed"):
        zarr2.parse_zarr3_array("v", _arr_meta([shard_codec, {"name": "gzip"}]))
    with pytest.raises(zarr2.ZarrError, match="before sharding_indexed"):
        zarr2.parse_zarr3_array("v", _arr_meta([
            {"name": "gzip", "configuration": {"level": 5}}, shard_codec,
        ]))
    with pytest.raises(zarr2.ZarrError, match="after sharding_indexed"):
        zarr2.parse_zarr3_array("v", _arr_meta([shard_codec, shard_codec]))

    # encode honors start-location + no-crc declared layouts
    meta_start = zarr2.parse_zarr3_array("v", _arr_meta([{
        "name": "sharding_indexed",
        "configuration": {"chunk_shape": [2], "codecs": base_inner,
                          "index_location": "start"},
    }]))
    block = np.array([1.0, 2.0, 3.0, 4.0])
    raw = zarr2._encode_shard(
        block, (2,), None, 8, None,
        index_location="start", index_crc=True,
    )
    np.testing.assert_array_equal(zarr2.decode_chunk(raw, meta_start), block)
    meta_nocrc = zarr2.parse_zarr3_array("v", _arr_meta([{
        "name": "sharding_indexed",
        "configuration": {"chunk_shape": [2], "codecs": base_inner,
                          "index_codecs": [{"name": "bytes",
                                            "configuration": {"endian": "little"}}]},
    }]))
    raw = zarr2._encode_shard(block, (2,), None, 8, None, index_crc=False)
    np.testing.assert_array_equal(zarr2.decode_chunk(raw, meta_nocrc), block)


def test_append_time_chunks_on_sharded_store(tmp_path):
    """The single-process append re-encodes with the sharded layout too
    (previously wrote bare uncompressed chunk bytes -> crc mismatch)."""
    # shard-aligned extent required on the append axis -> 4 times
    root = str(tmp_path / "shard_app.zarr")
    nt, nlat, nlon = 4, 6, 8
    data = np.arange(nt * nlat * nlon, dtype="<f8").reshape(nt, nlat, nlon)
    zarr2.write_zarr3_store(
        root,
        variables={
            "time": (("time",), np.arange(nt, dtype="<f8"), {}),
            "latitude": (("latitude",), 36 + 0.25 * np.arange(nlat), {}),
            "longitude": (("longitude",), -116 + 0.25 * np.arange(nlon), {}),
            "precip": (("time", "latitude", "longitude"), data,
                       {"_FillValue": -9999.0}),
        },
        chunks={"precip": (1, 2, 2), "time": (2,)},
        shards={"precip": (2, 4, 4)},
        fill_values={"precip": -9999.0},
    )
    new = np.full((2, nlat, nlon), 3.5)
    new[1, 2, 3] = 9.25
    zarr2.append_time_chunks(
        root, "precip", "time", np.array([4.0, 5.0]), new
    )
    meta = zarr2.open_store(root)["precip"]
    assert meta.shape == (6, nlat, nlon)
    arr = zarr2.read_array(root, meta)
    np.testing.assert_array_equal(arr[:4], data)
    assert arr[5, 2, 3] == 9.25 and arr[4, 0, 0] == 3.5


def test_shard_decoder_fuzz_clean_errors_only(tmp_path):
    """The shard decoder consumes UNTRUSTED store bytes: random buffers
    and random mutations/truncations of a valid shard must either decode
    (a mutation can land in an elided region or be caught by an inner
    codec) or raise ZarrError/BloscError — never IndexError/
    struct.error/MemoryError from the index arithmetic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gridded_etl_tools_spark.sources.blosc import BloscError

    root = str(tmp_path / "fuzz.zarr")
    _write_sharded(root, blosc_inner=True)
    meta = zarr2.open_store(root)["precip"]
    valid = open(os.path.join(root, "precip", "c", "0", "0", "0"), "rb").read()

    @settings(max_examples=150 * FUZZ_X, deadline=None)
    @given(data=st.binary(min_size=0, max_size=200))
    def random_bytes(data):
        try:
            zarr2.decode_chunk(data, meta)
        except (zarr2.ZarrError, BloscError):
            pass

    @settings(max_examples=200 * FUZZ_X, deadline=None)
    @given(
        pos=st.integers(min_value=0, max_value=len(valid) - 1),
        val=st.integers(min_value=0, max_value=255),
        cut=st.integers(min_value=0, max_value=len(valid)),
    )
    def mutated(pos, val, cut):
        buf = bytearray(valid)
        buf[pos] = val
        for payload in (bytes(buf), bytes(buf[:cut])):
            try:
                out = zarr2.decode_chunk(payload, meta)
                assert out.shape == tuple(meta.chunks)
            except (zarr2.ZarrError, BloscError):
                pass

    random_bytes()
    mutated()


def test_shard_index_region_mutations_all_caught(tmp_path):
    """Judge r9 brief #5: target the INDEX REGION specifically — with
    index_crc on, CRC-32C detects every single-byte error, so flipping
    ANY byte of the index table or its trailer must raise ZarrError
    (crc mismatch, or a range error if the table were somehow
    consulted) — never a clean decode of wrong offsets.  Exhaustive
    sweep: every index-region position x 2 deterministic flips."""
    root = str(tmp_path / "idxfuzz.zarr")
    _write_sharded(root)
    meta = zarr2.open_store(root)["precip"]
    p = os.path.join(root, "precip", "c", "0", "0", "0")
    valid = open(p, "rb").read()
    n_inner = 8  # 2x2x2 inner grid per shard
    idx_size = 16 * n_inner + 4
    region = range(len(valid) - idx_size, len(valid))
    caught = 0
    for pos in region:
        for flip in (0xFF, 0x01):
            buf = bytearray(valid)
            buf[pos] ^= flip
            with pytest.raises(zarr2.ZarrError):
                zarr2.decode_chunk(bytes(buf), meta)
            caught += 1
    assert caught == idx_size * 2
