"""Pure-Python GeoTIFF decode — strip/tile rasters to long-form rows.

Reference parity: the reference ingests only what kerchunk can scan
(NetCDF/GRIB, ``utils/transform.py:119-279``), yet several of its own
upstream products (CHIRPS final fields, satellite-derived rasters)
publish as GeoTIFF.  This module closes that gap with a classic-TIFF
subset reader: little/big endian, strip AND tile layouts, uncompressed /
Deflate / LZW compression, horizontal-differencing predictor, int and
float sample formats, GDAL's ``GDAL_NODATA`` sentinel, and GeoTIFF
georeferencing via ``ModelPixelScale`` + ``ModelTiepoint`` (north-up
affine — the form every regular lat/lon product uses).

Scale shape: identical to the other decoders — whole files decode on
executors via Arrow-batched ``mapInPandas`` over a ``binaryFile`` scan
(one task per file; a tile-parallel variant would follow the zarr chunk
pattern if single rasters ever outgrow a task).  TIFF structure is from
the public TIFF 6.0 and GeoTIFF specs.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gridded_etl_tools_spark.sources import netcdf3


class TiffError(ValueError):
    pass


_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


@dataclass
class TiffPage:
    width: int
    height: int
    bits: int
    sample_format: int          # 1 uint, 2 int, 3 float
    compression: int            # 1 none, 5 LZW, 8/32946 deflate
    predictor: int              # 1 none, 2 horizontal
    rows_per_strip: int
    strip_offsets: list[int]
    strip_counts: list[int]
    tile_width: int | None
    tile_height: int | None
    tile_offsets: list[int]
    tile_counts: list[int]
    nodata: float | None
    pixel_scale: tuple[float, float] | None
    tiepoint: tuple[float, ...] | None
    byteorder: str = "<"
    extra: dict = field(default_factory=dict)

    @property
    def dtype(self) -> np.dtype:
        kind = {1: "u", 2: "i", 3: "f"}[self.sample_format]
        return np.dtype(f"{self.byteorder}{kind}{self.bits // 8}")

    @property
    def tiled(self) -> bool:
        return self.tile_width is not None


def _read_ifd_values(buf: bytes, bo: str, typ: int, count: int, raw: bytes):
    size = _TYPE_SIZES.get(typ)
    if size is None:
        raise TiffError(f"unsupported TIFF field type {typ}")
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (offset,) = struct.unpack(bo + "I", raw)
        data = buf[offset : offset + total]
    if typ == 2:  # ascii
        return data.split(b"\x00")[0].decode("ascii", "replace")
    if typ in (5, 10):  # rationals
        parts = struct.unpack(bo + ("Ii"[typ == 10] * 2 * count), data)
        return [parts[i] / parts[i + 1] for i in range(0, 2 * count, 2)]
    vals = list(struct.unpack(bo + _TYPE_FMT[typ] * count, data))
    return vals


def parse_tiff(buf: bytes) -> TiffPage:
    """Parse the first IFD of a classic TIFF into a :class:`TiffPage`."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise TiffError("not a TIFF (no II/MM byte-order mark)")
    magic, ifd_off = struct.unpack(bo + "HI", buf[2:8])
    if magic == 43:
        raise TiffError("BigTIFF (0x2B) unsupported; classic TIFF only")
    if magic != 42:
        raise TiffError(f"bad TIFF magic {magic}")
    (n_entries,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
    tags: dict[int, object] = {}
    for i in range(n_entries):
        ent = buf[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
        tag, typ, count = struct.unpack(bo + "HHI", ent[:8])
        tags[tag] = _read_ifd_values(buf, bo, typ, count, ent[8:12])

    def one(tag, default=None):
        v = tags.get(tag, default)
        return v[0] if isinstance(v, list) else v

    def many(tag):
        v = tags.get(tag, [])
        return v if isinstance(v, list) else [v]

    spp = int(one(277, 1))
    if spp != 1:
        raise TiffError(f"SamplesPerPixel {spp} unsupported (single-band rasters only)")
    bits = int(one(258, 8))
    if bits not in (8, 16, 32, 64):
        raise TiffError(f"BitsPerSample {bits} unsupported")
    comp = int(one(259, 1))
    if comp not in (1, 5, 8, 32946):
        raise TiffError(
            f"compression {comp} unsupported (none/LZW/deflate only)"
        )
    nodata = tags.get(42113)
    pscale = many(33550)
    tiept = many(33922)
    return TiffPage(
        width=int(one(256)),
        height=int(one(257)),
        bits=bits,
        sample_format=int(one(339, 1)),
        compression=comp,
        predictor=int(one(317, 1)),
        rows_per_strip=int(one(278, 2**32 - 1)),
        strip_offsets=[int(v) for v in many(273)],
        strip_counts=[int(v) for v in many(279)],
        tile_width=int(one(322)) if 322 in tags else None,
        tile_height=int(one(323)) if 323 in tags else None,
        tile_offsets=[int(v) for v in many(324)],
        tile_counts=[int(v) for v in many(325)],
        nodata=float(nodata) if nodata not in (None, "") else None,
        pixel_scale=(float(pscale[0]), float(pscale[1])) if len(pscale) >= 2 else None,
        tiepoint=tuple(float(v) for v in tiept) if len(tiept) >= 6 else None,
        byteorder=bo,
    )


def _lzw_decode(data: bytes) -> bytes:
    """TIFF LZW (MSB-first bit packing, early code-size change): public
    TIFF 6.0 §13 algorithm."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    code_size = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None

    def reset():
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        code_size = 9
        prev = None

    reset()
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= code_size:
            code = (buf >> (nbits - code_size)) & ((1 << code_size) - 1)
            nbits -= code_size
            if code == CLEAR:
                reset()
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise TiffError("corrupt LZW stream")
            out += entry
            prev = entry
            # early change: TIFF bumps the code width one code early
            if len(table) + 1 >= (1 << code_size) and code_size < 12:
                code_size += 1
    return bytes(out)


def _decode_block(
    raw: bytes, page: TiffPage, block_w: int, block_h: int
) -> np.ndarray:
    if page.compression in (8, 32946):
        raw = zlib.decompress(raw)
    elif page.compression == 5:
        raw = _lzw_decode(raw)
    n = block_w * block_h
    arr = np.frombuffer(raw, dtype=page.dtype, count=n).reshape(block_h, block_w)
    if page.predictor == 2:
        if page.dtype.kind == "f":
            raise TiffError("floating-point predictor unsupported")
        native = page.dtype.newbyteorder("=")
        # horizontal differencing undone by modular row cumsum
        arr = np.cumsum(arr.astype(native), axis=1, dtype=native)
    return arr


def read_raster(buf: bytes) -> np.ndarray:
    """Decode the full single-band raster to a (height, width) ndarray."""
    page = parse_tiff(buf)
    out = np.empty((page.height, page.width), dtype=page.dtype.newbyteorder("="))
    if page.tiled:
        tw, th = page.tile_width, page.tile_height
        tiles_across = -(-page.width // tw)
        for k, (off, cnt) in enumerate(zip(page.tile_offsets, page.tile_counts)):
            ty, tx = divmod(k, tiles_across)
            block = _decode_block(buf[off : off + cnt], page, tw, th)
            y0, x0 = ty * th, tx * tw
            h = min(th, page.height - y0)
            w = min(tw, page.width - x0)
            out[y0 : y0 + h, x0 : x0 + w] = block[:h, :w]
    else:
        rps = min(page.rows_per_strip, page.height)
        for k, (off, cnt) in enumerate(zip(page.strip_offsets, page.strip_counts)):
            y0 = k * rps
            h = min(rps, page.height - y0)
            block = _decode_block(buf[off : off + cnt], page, page.width, h)
            out[y0 : y0 + h] = block
    return out


def geotiff_long_frame(buf: bytes) -> pd.DataFrame:
    """Whole-raster long frame: (latitude, longitude, value) with the
    GeoTIFF north-up affine applied and nodata → NaN."""
    page = parse_tiff(buf)
    values = read_raster(buf).astype("f8")
    if page.nodata is not None:
        values = np.where(values == page.nodata, np.nan, values)
    if page.pixel_scale and page.tiepoint:
        sx, sy = page.pixel_scale
        i, j, _k, x, y, _z = page.tiepoint[:6]
        lons = x + (np.arange(page.width) - i) * sx
        lats = y - (np.arange(page.height) - j) * sy
    else:
        lons = np.arange(page.width, dtype="f8")
        lats = np.arange(page.height, dtype="f8")
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    return pd.DataFrame(
        {
            "latitude": glat.reshape(-1),
            "longitude": glon.reshape(-1),
            "value": values.reshape(-1),
        }
    )


def decode_geotiff_long(files: DataFrame) -> DataFrame:
    """Distributed decode: binaryFile rows → (path, latitude, longitude,
    value) long rows via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                frame = geotiff_long_frame(bytes(content))
                frame.insert(0, "path", path)
                yield frame

    return files.select("path", "content").mapInPandas(
        run, netcdf3.decode_schema(["latitude", "longitude"])
    )


# ---------------------------------------------------------------------------
# minimal writer (test-fixture generator)
# ---------------------------------------------------------------------------


def write_geotiff(
    path: str,
    data: np.ndarray,
    lon0: float = 0.0,
    lat0: float = 0.0,
    dx: float = 1.0,
    dy: float = 1.0,
    nodata: float | None = None,
    compression: int = 8,
    tile: tuple[int, int] | None = None,
    predictor: int = 1,
) -> None:
    """Write a single-band little-endian GeoTIFF (strip or tiled,
    none/deflate/LZW is not needed for fixtures — deflate and none only)."""
    if compression not in (1, 8):
        raise TiffError("fixture writer emits compression 1 or 8 only")
    h, w = data.shape
    dt = data.dtype
    sample_format = {"u": 1, "i": 2, "f": 3}[dt.kind]
    payload = data.astype(dt.newbyteorder("<"))
    if predictor == 2:
        if dt.kind == "f":
            raise TiffError("horizontal predictor is for integer data")
        d = payload.astype(dt.newbyteorder("="))
        d = np.concatenate([d[:, :1], np.diff(d, axis=1)], axis=1).astype(dt)
        payload = d

    blocks: list[bytes] = []
    if tile:
        tw, th = tile
        for y0 in range(0, h, th):
            for x0 in range(0, w, tw):
                block = np.zeros((th, tw), dtype=payload.dtype)
                bh = min(th, h - y0)
                bw = min(tw, w - x0)
                block[:bh, :bw] = payload[y0 : y0 + bh, x0 : x0 + bw]
                blocks.append(block.tobytes())
    else:
        blocks.append(payload.tobytes())
    if compression == 8:
        blocks = [zlib.compress(b, 6) for b in blocks]

    entries: list[tuple[int, int, int, bytes | int]] = []
    extra_heap = bytearray()

    def heap_put(raw: bytes) -> int:
        off = len(extra_heap)
        extra_heap.extend(raw)
        if len(extra_heap) % 2:
            extra_heap.append(0)
        return off

    n_blocks = len(blocks)
    # IFD layout: header(8) + count(2) + entries + next(4), then heap,
    # then block data.  Compute sizes after we know the entry count.
    tag_list: list[tuple[int, int, int, object]] = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, dt.itemsize * 8),
        (259, 3, 1, compression),
        (262, 3, 1, 1),
        (277, 3, 1, 1),
        (317, 3, 1, predictor),
        (339, 3, 1, sample_format),
    ]
    if tile:
        tag_list += [
            (322, 4, 1, tile[0]),
            (323, 4, 1, tile[1]),
            (324, 4, n_blocks, "OFFSETS"),
            (325, 4, n_blocks, [len(b) for b in blocks]),
        ]
    else:
        tag_list += [
            (273, 4, 1, "OFFSETS"),
            (278, 4, 1, h),
            (279, 4, 1, len(blocks[0])),
        ]
    scale = struct.pack("<3d", dx, dy, 0.0)
    tiept = struct.pack("<6d", 0.0, 0.0, 0.0, lon0, lat0, 0.0)
    tag_list.append((33550, 12, 3, scale))
    tag_list.append((33922, 12, 6, tiept))
    if nodata is not None:
        nd = (f"{nodata:g}".encode() + b"\x00")
        tag_list.append((42113, 2, len(nd), nd))
    tag_list.sort(key=lambda t: t[0])

    header_size = 8 + 2 + 12 * len(tag_list) + 4
    # first pass: serialize every value (OFFSETS as a placeholder of the
    # right SIZE so the heap layout is final before offsets are known)
    placed: list[tuple[int, int, int, bytes, bool]] = []
    for tag, typ, count, val in tag_list:
        is_offsets = isinstance(val, str) and val == "OFFSETS"
        if isinstance(val, bytes):
            raw = val
        elif is_offsets:
            raw = b"\x00" * (4 * count)
        elif isinstance(val, list):
            raw = struct.pack("<" + _TYPE_FMT[typ] * count, *val)
        else:
            raw = struct.pack("<" + _TYPE_FMT[typ], val)
        placed.append((tag, typ, count, raw, is_offsets))

    heap_offsets: dict[int, int] = {}
    for tag, typ, count, raw, _ in placed:
        if len(raw) > 4:
            heap_offsets[tag] = heap_put(raw)
    data_start = header_size + len(extra_heap)
    block_offsets = []
    pos = data_start
    for b in blocks:
        block_offsets.append(pos)
        pos += len(b)

    final: list[bytes] = []
    for tag, typ, count, raw, is_offsets in placed:
        if is_offsets:
            raw = struct.pack("<" + "I" * count, *block_offsets)
            if len(raw) > 4:  # patch the reserved heap slot in place
                ho = heap_offsets[tag]
                extra_heap[ho : ho + len(raw)] = raw
        if len(raw) > 4:
            off = header_size + heap_offsets[tag]
            ent = struct.pack("<HHII", tag, typ, count, off)
        else:
            ent = struct.pack("<HHI", tag, typ, count) + raw.ljust(4, b"\x00")
        final.append(ent)

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, 8)
    out += struct.pack("<H", len(final))
    out += b"".join(final)
    out += struct.pack("<I", 0)
    out += extra_heap
    for b in blocks:
        out += b
    with open(path, "wb") as f:
        f.write(bytes(out))
