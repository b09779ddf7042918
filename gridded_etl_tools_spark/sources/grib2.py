"""Pure-Python GRIB edition-2 decode path (simple packing, lat/lon grid).

Reference parity: ``utils/transform.py:226-279`` (``scan_grib`` inside
``kerchunkify``) is edition-agnostic — real archives mix GRIB1 (ERA5)
and GRIB2 (HRRR, GFS, most post-2000 NWP output).  ``sources/grib1.py``
covers edition 1; this module implements the edition-2 wire format
subset those datasets actually use: regular lat/lon grids (grid
template 3.0), analysis/forecast products (product template 4.0),
simple packing (data template 5.0/7.0), optional bitmap (section 6,
including the "previously defined bitmap" 254 indicator), and repeated
section 3-7 groups (how multi-field messages are laid out).

Decode shape mirrors ``sources/grib1.py``/``netcdf3.py``: whole files
decode on executors via Arrow-batched ``mapInPandas`` over a
``binaryFile`` scan — embarrassingly parallel, no driver-side loop.
Bitmap-masked cells surface as NaN → SQL NULL (the S12 sentinel rule).

A minimal writer (:func:`write_grib2`) fabricates real on-disk .grib2
fixtures so tests exercise true bytes, like the GRIB1/NetCDF3 golden
tests.
"""

from __future__ import annotations

import datetime as dt
import struct
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class GRIB2Error(ValueError):
    pass


_TIME_UNITS = {
    0: dt.timedelta(minutes=1),
    1: dt.timedelta(hours=1),
    2: dt.timedelta(days=1),
}


def _sm32(b: bytes) -> int:
    """GRIB2 sign-magnitude 32-bit int (bit 31 = sign)."""
    (v,) = struct.unpack(">I", b)
    return -(v & 0x7FFFFFFF) if v & 0x80000000 else v


def _enc_sm32(v: int) -> bytes:
    return struct.pack(">I", (0x80000000 | -v) if v < 0 else v)


def _sm16(b: bytes) -> int:
    (v,) = struct.unpack(">H", b)
    return -(v & 0x7FFF) if v & 0x8000 else v


def _enc_sm16(v: int) -> bytes:
    return struct.pack(">H", (0x8000 | -v) if v < 0 else v)


@dataclass
class Grib2Field:
    discipline: int
    category: int
    number: int
    level_type: int
    level_value: int
    reference_time: dt.datetime
    valid_time: dt.datetime
    lats: np.ndarray
    lons: np.ndarray
    values: np.ndarray  # (nj, ni), NaN where bitmap-masked
    member: int | None = None  # ensemble perturbation number (4.1/4.11)


def _parse_grid_template_30(body: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    """Grid template 3.0 (regular lat/lon).  ``body`` starts at the
    template (after the 14-byte section-3 prefix).  Returns
    (lats, lons, scan_flags)."""
    # 16 earth-shape bytes, then the grid proper
    ni = struct.unpack(">I", body[16:20])[0]
    nj = struct.unpack(">I", body[20:24])[0]
    # 24:32 = basic angle + subdivisions
    la1 = _sm32(body[32:36]) / 1e6
    lo1 = _sm32(body[36:40]) / 1e6
    # 40 = resolution/component flags
    la2 = _sm32(body[41:45]) / 1e6
    lo2 = _sm32(body[45:49]) / 1e6
    # 49:57 = Di, Dj
    scan = body[57]
    if scan & 0x80:
        raise GRIB2Error(f"scanning mode {scan:#x}: -i scanning unsupported")
    if scan & 0x20:
        raise GRIB2Error(f"scanning mode {scan:#x}: j-consecutive unsupported")
    if scan & 0x10:
        raise GRIB2Error(f"scanning mode {scan:#x}: boustrophedon unsupported")
    lats = np.linspace(la1, la2, nj)  # la1→la2 encodes the j direction
    lons = np.linspace(lo1, lo2, ni)
    return lats, lons, scan


def _parse_wrapped(
    buf: bytes, decode: bool = True, only_field: int | None = None
) -> list:
    """The ONE exception-taxonomy wrapper for every entry point (fifth
    review pass r11: parse/parse_field/scan had verbatim copies)."""
    try:
        return _parse_grib2_inner(buf, decode, only_field)
    except (struct.error, IndexError, ValueError) as e:
        if isinstance(e, GRIB2Error):
            raise
        raise GRIB2Error(f"truncated or corrupt GRIB2 structure: {e}") from e


def parse_grib2(buf: bytes) -> list[Grib2Field]:
    """Parse every field in every GRIB2 message of a file buffer.
    Messages may repeat sections (3-)4-7 for multiple fields; section
    state (grid / product / representation / bitmap) carries forward the
    way the spec defines."""
    return _parse_wrapped(buf)


def parse_grib2_field(buf: bytes, field: int) -> Grib2Field:
    """Decode ONE field by its in-message index, skipping every other
    data section's unpacking — the grib2 message codec's entry point
    (third review pass r11: decoding a V-field message's V variables
    through :func:`parse_grib2` was O(V^2) data-section work).  Indexes
    are per message; the codec hands this a single-message buffer."""
    out = _parse_wrapped(buf, only_field=field)
    if not out:
        raise GRIB2Error(
            f"message has no field with in-message index {field}"
        )
    return out[0]


def scan_grib2(buf: bytes) -> list[dict]:
    """Field DESCRIPTORS without decoding any data section — the
    refs-production scan (reference ``scan_grib``+``scan_indices``,
    ``utils/transform.py:226-279``): per field, the containing
    message's byte span (``msg_offset``/``msg_length``), its index
    within the message, the product identity, times, and the grid
    axes.  Sections 1-6 are header-sized; section 7's body is never
    unpacked, so this is O(headers) work over the buffer."""
    return _parse_wrapped(buf, decode=False)


def _parse_grib2_inner(
    buf: bytes, decode: bool = True, only_field: int | None = None
) -> list:
    out: list = []
    pos = 0
    while pos < len(buf):
        if buf[pos : pos + 4] != b"GRIB":
            nxt = buf.find(b"GRIB", pos)
            if nxt < 0:
                break
            pos = nxt
        if buf[pos + 7] != 2:
            raise GRIB2Error(f"GRIB edition {buf[pos + 7]}, only 2 supported")
        discipline = buf[pos + 6]
        (total_len,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
        if total_len < 20:  # IS(16) + ES(4) minimum — a zero/short
            # length would pin `pos = end` in place and loop the
            # message walk forever (code-review r11: grib1 twin)
            raise GRIB2Error(
                f"message at offset {pos} declares length {total_len}"
            )
        end = pos + total_len
        if buf[end - 4 : end] != b"7777":
            raise GRIB2Error("message missing 7777 terminator")
        p = pos + 16

        ref_time = None
        lats = lons = None
        flat_grid = False  # reduced (ragged) grids: per-cell flat coords
        product = None
        packing = None
        bitmap = None  # carried forward for indicator 254
        msg_field = 0  # field index within THIS message (repeated 4-7)
        while p < end - 4:
            (sec_len,) = struct.unpack(">I", buf[p : p + 4])
            if sec_len < 5 or p + sec_len > end - 4:
                # under 5 bytes (length + section number) would pin
                # `p += sec_len` in place and loop the walk forever
                # (fifth review pass r11, reproduced); overrunning the
                # message end would silently swallow the remaining
                # sections and return fewer fields than the message
                # carries (sixth review pass)
                raise GRIB2Error(
                    f"section at offset {p} declares length {sec_len}"
                )
            sec_no = buf[p + 4]
            body = buf[p + 5 : p + sec_len]
            if sec_no == 1:
                year = struct.unpack(">H", body[7:9])[0]
                ref_time = dt.datetime(
                    year, body[9], body[10], body[11], body[12], body[13]
                )
            elif sec_no == 2:
                pass  # local use
            elif sec_no == 3:
                tmpl = struct.unpack(">H", body[7:9])[0]
                if tmpl == 0:
                    lats, lons, _ = _parse_grid_template_30(body[9:])
                elif tmpl == 1:
                    lats, lons, _ = _parse_grid_template_31(body[9:])
                elif tmpl == 10:
                    lats, lons, _ = _parse_grid_template_310(body[9:])
                elif tmpl == 20:
                    lats, lons, _ = _parse_grid_template_320(body[9:])
                elif tmpl == 40:
                    ni_field = struct.unpack(">I", body[9 + 16 : 9 + 20])[0]
                    if ni_field == 0xFFFFFFFF:
                        lats, lons, _ = _parse_reduced_gaussian(body)
                        flat_grid = True
                    else:
                        lats, lons, _ = _parse_grid_template_340(body[9:])
                        flat_grid = False
                elif tmpl == 30:
                    lats, lons, _ = _parse_grid_template_330(body[9:])
                else:
                    raise GRIB2Error(
                        f"grid template 3.{tmpl}, only 3.0 (lat/lon), "
                        "3.1 (rotated lat/lon), 3.10 (Mercator), 3.20 "
                        "(polar stereographic), 3.30 (Lambert conformal), "
                        "and 3.40 (regular/reduced Gaussian) supported"
                    )
            elif sec_no == 4:
                tmpl = struct.unpack(">H", body[2:4])[0]
                if tmpl not in (0, 1, 8, 11):
                    raise GRIB2Error(
                        f"product template 4.{tmpl}, only 4.0/4.1/4.8/4.11 "
                        "supported"
                    )
                t = body[4:]
                unit, fcst = t[8], _sm32(t[9:13])
                if unit not in _TIME_UNITS:
                    raise GRIB2Error(f"unsupported time unit {unit}")
                product = {
                    "category": t[0],
                    "number": t[1],
                    "level_type": t[13],
                    "level_value": struct.unpack(">I", t[15:19])[0],
                    "offset": fcst * _TIME_UNITS[unit],
                }
                ens = 3 if tmpl in (1, 11) else 0
                if ens:
                    # 4.1/4.11: +3 octets after the fixed surfaces —
                    # ensemble type, perturbation number, member count
                    product["member"] = t[26]
                if tmpl in (8, 11):
                    # statistically-processed field (accumulation/avg):
                    # the field validates at the END of the overall time
                    # interval, not at ref+forecast
                    product["end_time"] = dt.datetime(
                        struct.unpack(">H", t[25 + ens : 27 + ens])[0],
                        t[27 + ens], t[28 + ens], t[29 + ens],
                        t[30 + ens], t[31 + ens],
                    )
            elif sec_no == 5:
                tmpl = struct.unpack(">H", body[4:6])[0]
                if tmpl not in (0, 2, 3, 41):
                    raise GRIB2Error(
                        f"data template 5.{tmpl}, only 5.0/5.2/5.3/5.41 supported"
                    )
                t = body[6:]
                packing = {
                    "template": tmpl,
                    "R": struct.unpack(">f", t[0:4])[0],
                    "E": _sm16(t[4:6]),
                    "D": _sm16(t[6:8]),
                    "nbits": t[8],
                }
                if tmpl in (2, 3):
                    if t[11] != 0:
                        raise GRIB2Error(
                            "complex packing missing-value management "
                            f"{t[11]} unsupported (use a bitmap)"
                        )
                    packing.update(
                        ng=struct.unpack(">I", t[20:24])[0],
                        width_ref=t[24],
                        width_bits=t[25],
                        len_ref=struct.unpack(">I", t[26:30])[0],
                        len_inc=t[30],
                        last_len=struct.unpack(">I", t[31:35])[0],
                        len_bits=t[35],
                    )
                if tmpl == 3:
                    packing.update(sd_order=t[36], sd_octets=t[37])
                    if packing["sd_order"] not in (1, 2):
                        raise GRIB2Error(
                            f"spatial differencing order {packing['sd_order']} "
                            "unsupported"
                        )
            elif sec_no == 6:
                ind = body[0]
                if ind == 255:
                    bitmap = None
                elif ind == 0:
                    if lats is None:
                        raise GRIB2Error("bitmap before grid definition")
                    n = (
                        lats.size
                        if (flat_grid or lats.ndim == 2)
                        else lats.size * lons.size
                    )
                    bits = np.unpackbits(np.frombuffer(body[1:], dtype="u1"))
                    if bits.size < n:
                        raise GRIB2Error(
                            f"bitmap has {bits.size} bits for {n} cells"
                        )
                    bitmap = bits[:n].astype(bool)
                elif ind == 254:
                    if bitmap is None:
                        raise GRIB2Error(
                            "bitmap indicator 254 with no prior bitmap"
                        )
                else:
                    raise GRIB2Error(f"predefined bitmap {ind} unsupported")
            elif sec_no == 7:
                if None in (ref_time, product, packing) or lats is None:
                    raise GRIB2Error("data section before required sections")
                if decode:
                    if only_field is None or msg_field == only_field:
                        out.append(
                            _decode_field(
                                discipline, ref_time, lats, lons, product,
                                packing, bitmap, body, flat_grid=flat_grid,
                            )
                        )
                else:
                    out.append(
                        {
                            "msg_offset": pos,
                            "msg_length": total_len,
                            "field": msg_field,
                            "discipline": discipline,
                            "category": product["category"],
                            "number": product["number"],
                            "level_type": product["level_type"],
                            "level_value": product["level_value"],
                            "member": product.get("member"),
                            "reference_time": ref_time,
                            "valid_time": product.get("end_time")
                            or (ref_time + product["offset"]),
                            "lats": lats,
                            "lons": lons,
                            "flat_grid": flat_grid,
                        }
                    )
                msg_field += 1
            else:
                raise GRIB2Error(f"unknown section number {sec_no}")
            p += sec_len
        pos = end
    if not out and only_field is None:
        # with only_field set, an empty result means "index out of
        # range" — parse_grib2_field raises the clearer message
        raise GRIB2Error("no GRIB2 fields found")
    return out


class _BitReader:
    """Sequential big-endian bit reader over a bytes buffer."""

    def __init__(self, buf: bytes):
        self._bits = np.unpackbits(np.frombuffer(buf, dtype="u1"))
        self._pos = 0

    def take(self, n_values: int, width: int) -> np.ndarray:
        """Read ``n_values`` unsigned ints of ``width`` bits each."""
        if width == 0:
            return np.zeros(n_values, dtype="int64")
        end = self._pos + n_values * width
        if end > self._bits.size:
            raise GRIB2Error("data section too short for declared grid")
        xs = self._bits[self._pos : end].reshape(n_values, width)
        self._pos = end
        weights = 1 << np.arange(width - 1, -1, -1, dtype="int64")
        return (xs.astype("int64") * weights).sum(axis=1)


def _unpack_simple(body: bytes, n_present: int, packing: dict) -> np.ndarray:
    nbits = packing["nbits"]
    if not nbits:  # constant field
        return np.zeros(n_present, dtype="int64")
    return _BitReader(body).take(n_present, nbits)


def _unpack_complex(body: bytes, n_present: int, packing: dict) -> np.ndarray:
    """Data template 7.2/7.3: grouped packing (GFS/HRRR's default).  Each
    group carries its own reference and bit width; values are
    ``group_ref + packed``.  7.3 packs spatial differences instead of
    raw values: the stream opens with the first value(s) and the overall
    minimum of the differenced sequence, and the field is rebuilt by
    ``order`` rounds of cumulative summation."""
    ng = packing["ng"]
    r = _BitReader(body)
    first_vals: list[int] = []
    gmin = 0
    if packing["template"] == 3:
        octets, order = packing["sd_octets"], packing["sd_order"]
        head = np.frombuffer(body, dtype="u1")[: (order + 1) * octets]
        vals = []
        for i in range(order + 1):
            v = 0
            for b in head[i * octets : (i + 1) * octets]:
                v = (v << 8) | int(b)
            sign_bit = 1 << (octets * 8 - 1)
            vals.append(-(v & (sign_bit - 1)) if v & sign_bit else v)
        first_vals, gmin = vals[:order], vals[order]
        r = _BitReader(body[(order + 1) * octets :])
    refs = r.take(ng, packing["nbits"])
    widths = packing["width_ref"] + r.take(ng, packing["width_bits"])
    lens = packing["len_ref"] + packing["len_inc"] * r.take(
        ng, packing["len_bits"]
    )
    if ng:
        lens[-1] = packing["last_len"]
    if int(lens.sum()) != n_present:
        raise GRIB2Error(
            f"complex-packing group lengths sum to {int(lens.sum())} "
            f"for {n_present} points"
        )
    out = np.empty(n_present, dtype="int64")
    pos = 0
    for g in range(ng):
        n = int(lens[g])
        out[pos : pos + n] = refs[g] + r.take(n, int(widths[g]))
        pos += n
    if packing["template"] == 3:
        order = packing["sd_order"]
        v = out + gmin  # v[:order] slots are padding; seeds come from head
        n = n_present
        if n <= order:
            return np.asarray(first_vals[:n], dtype="int64")
        if order == 1:
            f = np.empty(n, dtype="int64")
            f[0] = first_vals[0]
            f[1:] = first_vals[0] + np.cumsum(v[1:])
        else:  # order 2: integrate 2nd differences -> 1st -> values
            d1 = np.empty(n - 1, dtype="int64")
            d1[0] = first_vals[1] - first_vals[0]
            d1[1:] = d1[0] + np.cumsum(v[2:])
            f = np.empty(n, dtype="int64")
            f[0] = first_vals[0]
            f[1:] = first_vals[0] + np.cumsum(d1)
        out = f
    return out


def _decode_field(
    discipline, ref_time, lats, lons, product, packing, bitmap, body,
    flat_grid: bool = False,
) -> Grib2Field:
    if flat_grid:  # ragged grid: flat per-cell coordinate arrays
        nj, ni = lats.size, 1
    elif lats.ndim == 2:  # projected grid: per-cell 2-D coordinates
        nj, ni = lats.shape
    else:
        nj, ni = lats.size, lons.size
    n_present = int(bitmap.sum()) if bitmap is not None else nj * ni
    if packing["template"] in (2, 3):
        xvals = _unpack_complex(body, n_present, packing)
    elif packing["template"] == 41:
        xvals = _unpack_png(body, n_present, packing)
    else:
        xvals = _unpack_simple(body, n_present, packing)
    present = (packing["R"] + xvals * 2.0 ** packing["E"]) / 10.0 ** packing["D"]
    if bitmap is not None:
        values = np.full(nj * ni, np.nan)
        values[bitmap] = present
    else:
        values = present.astype("f8")
    return Grib2Field(
        discipline=discipline,
        category=product["category"],
        number=product["number"],
        level_type=product["level_type"],
        level_value=product["level_value"],
        reference_time=ref_time,
        valid_time=product.get("end_time") or (ref_time + product["offset"]),
        member=product.get("member"),
        lats=lats,
        lons=lons,
        values=values.reshape(nj, ni),
    )


def select_fields(
    fields: list[Grib2Field],
    discipline: int | None = None,
    category: int | None = None,
    number: int | None = None,
    level_type: int | None = None,
    member: int | None = None,
) -> list[Grib2Field]:
    """Layer pick (the reference's ``grib_filter``): keep exactly one
    (discipline, category, number, level[, ensemble member]) variable
    from a mixed file."""
    out = [
        f
        for f in fields
        if (discipline is None or f.discipline == discipline)
        and (category is None or f.category == category)
        and (number is None or f.number == number)
        and (level_type is None or f.level_type == level_type)
        and (member is None or f.member == member)
    ]
    if not out:
        raise GRIB2Error(
            f"no fields match discipline={discipline} category={category} "
            f"number={number} level_type={level_type}"
        )
    return out


def grib2_long_frame(
    buf: bytes,
    discipline: int | None = None,
    category: int | None = None,
    number: int | None = None,
    level_type: int | None = None,
) -> pd.DataFrame:
    """Decode (optionally one layer of) all fields to long form: one row
    per (valid_time, lat, lon) cell; bitmap-masked cells are NaN."""
    frames = []
    for f in select_fields(parse_grib2(buf), discipline, category, number, level_type):
        if f.lats.ndim == 2 or f.lats.shape == f.lons.shape == f.values.reshape(-1).shape:
            # projected (2-D) or reduced (flat) grid: coords are per-cell
            lat_mesh, lon_mesh = f.lats, f.lons
        else:
            lon_mesh, lat_mesh = np.meshgrid(f.lons, f.lats)
        frames.append(
            pd.DataFrame(
                {
                    "time": f.valid_time,
                    "latitude": lat_mesh.reshape(-1),
                    "longitude": lon_mesh.reshape(-1),
                    "value": f.values.reshape(-1),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def grib2_forecast_long_frame(
    buf: bytes,
    discipline: int | None = None,
    category: int | None = None,
    number: int | None = None,
    level_type: int | None = None,
) -> pd.DataFrame:
    """Decode all (selected) fields to FORECAST long form — the 4-D
    ensemble/forecast key the reference's forecast and hindcast
    categories publish under (reference ``utils/transform.py:737-753``
    ``set_key_dims``; ensemble fixtures ``tests/unit/conftest.py:
    74-134``): one row per (forecast_reference_time, step, ensemble,
    latitude, longitude) cell.

    ``step`` is seconds between reference and valid time; ``ensemble``
    is the template-4.1/4.11 perturbation number (NaN for deterministic
    4.0/4.8 fields, so mixed files stay decodable and the caller's dim
    check rejects them only when an ensemble axis was demanded)."""
    frames = []
    for f in select_fields(
        parse_grib2(buf), discipline, category, number, level_type
    ):
        if f.lats.ndim == 2 or f.lats.shape == f.lons.shape == f.values.reshape(-1).shape:
            lat_mesh, lon_mesh = f.lats, f.lons
        else:
            lon_mesh, lat_mesh = np.meshgrid(f.lons, f.lats)
        step_s = (f.valid_time - f.reference_time).total_seconds()
        frames.append(
            pd.DataFrame(
                {
                    "forecast_reference_time": f.reference_time,
                    "step": step_s,
                    "ensemble": (
                        float(f.member) if f.member is not None else np.nan
                    ),
                    "latitude": lat_mesh.reshape(-1),
                    "longitude": lon_mesh.reshape(-1),
                    "value": f.values.reshape(-1),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def decode_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("time", T.TimestampType(), True),
            T.StructField("latitude", T.DoubleType(), True),
            T.StructField("longitude", T.DoubleType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )


def decode_grib2_long(
    files: DataFrame,
    discipline: int | None = None,
    category: int | None = None,
    number: int | None = None,
    level_type: int | None = None,
) -> DataFrame:
    """Distributed decode: ``binaryFile`` rows (path, content) → long-form
    rows via Arrow-batched ``mapInPandas``; NaN (bitmap) becomes NULL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                frame = grib2_long_frame(
                    bytes(content), discipline, category, number, level_type
                )
                frame.insert(0, "path", path)
                yield frame

    return files.select("path", "content").mapInPandas(run, decode_schema())


# --- minimal GRIB2 writer (test-fixture generator) ---------------------------


def _section(number: int, body: bytes) -> bytes:
    return struct.pack(">I", 5 + len(body)) + bytes([number]) + body


class _BitWriter:
    def __init__(self):
        self._bits: list[np.ndarray] = []

    def put(self, values: np.ndarray, width: int) -> None:
        if width == 0:
            return
        v = np.asarray(values, dtype="int64")
        if v.size and (v.min() < 0 or int(v.max()) >= 1 << width):
            raise GRIB2Error(f"values out of range for {width} bits")
        self._bits.append(
            ((v[:, None] >> np.arange(width - 1, -1, -1)) & 1).astype("u1").reshape(-1)
        )

    def tobytes(self) -> bytes:
        if not self._bits:
            return b""
        return np.packbits(np.concatenate(self._bits)).tobytes()


def _bits_for(maxval: int) -> int:
    return max(int(maxval).bit_length(), 1)


def _complex_pack(
    xvals: np.ndarray, sd_order: int, group_len: int = 7
) -> tuple[dict, bytes]:
    """Encode scaled values with complex packing (template 5.2) or
    complex packing + spatial differencing (5.3).  Fixed-size groups
    (last one shorter) with per-group min reference and tight bit
    widths — enough to exercise every decode path.  Returns the
    template-parameter dict and the section-7 payload."""
    n = xvals.size
    head = b""
    work = xvals.astype("int64")
    if sd_order:
        seeds = [int(v) for v in work[:sd_order]]
        d = work.copy()
        for _ in range(sd_order):
            d = np.diff(d)
        gmin = int(d.min()) if d.size else 0
        packed = np.concatenate(
            [np.zeros(sd_order, dtype="int64"), d - gmin]
        )
        mag = max((abs(v) for v in [*seeds, gmin]), default=0)
        octets = max((mag.bit_length() + 1 + 7) // 8, 1)
        sign_bit = 1 << (octets * 8 - 1)
        for v in [*seeds, gmin]:
            enc = (sign_bit | -v) if v < 0 else v
            head += int(enc).to_bytes(octets, "big")
        work = packed
    groups = [work[i : i + group_len] for i in range(0, n, group_len)]
    refs = np.array([int(g.min()) for g in groups], dtype="int64")
    widths = np.array(
        [_bits_for(int((g - r).max())) if (g - r).max() > 0 else 0
         for g, r in zip(groups, refs)],
        dtype="int64",
    )
    lens = np.array([g.size for g in groups], dtype="int64")
    nbits = _bits_for(int(refs.max())) if refs.size else 1
    width_bits = _bits_for(int(widths.max())) if widths.size else 1
    len_bits = _bits_for(int(lens.max())) if lens.size else 1
    w = _BitWriter()
    w.put(refs, nbits)
    w.put(widths, width_bits)
    w.put(lens, len_bits)
    for g, r, gw in zip(groups, refs, widths):
        w.put(g - r, int(gw))
    params = {
        "nbits": nbits,
        "ng": len(groups),
        "width_ref": 0,
        "width_bits": width_bits,
        "len_ref": 0,
        "len_inc": 1,
        "last_len": int(lens[-1]) if lens.size else 0,
        "len_bits": len_bits,
    }
    if sd_order:
        params.update(sd_order=sd_order, sd_octets=len(head) // (sd_order + 1))
    return params, head + w.tobytes()


def _pack_bits(xvals: np.ndarray, nbits: int) -> bytes:
    bits = ((xvals[:, None] >> np.arange(nbits - 1, -1, -1)) & 1).astype("u1")
    return np.packbits(bits.reshape(-1)).tobytes()


def write_grib2(path: str, messages: list[dict]) -> None:
    """Write a GRIB2 file, one message per dict:
    ``{values: 2D (nj, ni) with NaN for missing, lats, lons,
    reference_time, forecast_hours, discipline, category, number,
    level_type, level_value, nbits}``.  Simple packing with E=0, D=0,
    R=min — exact for integer-valued grids.  Fixture-generation only."""
    blob = bytearray()
    for m in messages:
        values = np.asarray(m["values"], dtype="f8")
        rotated = m.get("rotated")
        gaussian_pl = m.get("gaussian_pl")
        if gaussian_pl is not None:
            # reduced Gaussian: FLAT values, one ragged row per parallel
            pl = np.asarray(gaussian_pl, dtype="int64")
            values = values.reshape(1, -1)  # flat through the packer
            if values.size != int(pl.sum()):
                raise GRIB2Error(
                    f"gaussian_pl sums to {int(pl.sum())} points, values "
                    f"have {values.size}"
                )
            nj, ni = int(pl.size), values.size // max(int(pl.size), 1)
        else:
            nj, ni = values.shape
        # lat/lon axes are only meaningful for the lat/lon template;
        # LCC messages may omit them (geometry lives in the lcc dict)
        lats = np.asarray(m.get("lats", np.zeros(nj)))
        lons = np.asarray(m.get("lons", np.zeros(ni)))
        rt: dt.datetime = m["reference_time"]
        mask = ~np.isnan(values.reshape(-1))
        has_bitmap = not mask.all()
        present = values.reshape(-1)[mask]
        ref = float(present.min()) if present.size else 0.0
        xvals = np.round(present - ref).astype("int64")
        nbits = int(m.get("nbits", 16))
        if xvals.size and int(xvals.max()) >= 1 << nbits:
            raise GRIB2Error(f"nbits={nbits} too small for range {int(xvals.max())}")

        s1 = (
            struct.pack(">HH", 255, 255)  # centre, subcentre
            + bytes([2, 1, 1])            # tables, local tables, sig of ref time
            + struct.pack(">H", rt.year)
            + bytes([rt.month, rt.day, rt.hour, rt.minute, rt.second, 0, 1])
        )

        if gaussian_pl is not None:
            n_par = int(m["gaussian_n"])
            glats = gaussian_latitudes(n_par)
            tmpl340r = (
                bytes([6])
                + bytes([0]) + struct.pack(">I", 0)
                + bytes([0]) + struct.pack(">I", 0)
                + bytes([0]) + struct.pack(">I", 0)
                + struct.pack(">II", 0xFFFFFFFF, pl.size)  # Ni missing
                + struct.pack(">II", 0, 0)
                + _enc_sm32(int(round(glats[0] * 1e6)))
                + _enc_sm32(int(round(m.get("lo1", 0.0) * 1e6)))
                + bytes([0x30])
                + _enc_sm32(int(round(glats[-1] * 1e6)))
                + _enc_sm32(0)
                + struct.pack(">I", 0xFFFFFFFF)            # Di missing
                + struct.pack(">I", n_par)
                + bytes([0x00])
            )
            s3 = (
                bytes([0])
                + struct.pack(">I", int(pl.sum()))
                + bytes([2, 1])                            # noct=2, per-row list
                + struct.pack(">H", 40)
                + tmpl340r
                + b"".join(int(k).to_bytes(2, "big") for k in pl)
            )
        elif m.get("gaussian_n") is not None:
            gaussian_n = m.get("gaussian_n")
            glats = gaussian_latitudes(int(gaussian_n))
            if nj != glats.size:
                raise GRIB2Error(
                    f"gaussian_n={gaussian_n} grid has {glats.size} parallels, "
                    f"values have {nj} rows"
                )
            tmpl340 = (
                bytes([6])
                + bytes([0]) + struct.pack(">I", 0)
                + bytes([0]) + struct.pack(">I", 0)
                + bytes([0]) + struct.pack(">I", 0)
                + struct.pack(">II", ni, nj)
                + struct.pack(">II", 0, 0)
                + _enc_sm32(int(round(glats[0] * 1e6)))
                + _enc_sm32(int(round(lons[0] * 1e6)))
                + bytes([0x30])
                + _enc_sm32(int(round(glats[-1] * 1e6)))
                + _enc_sm32(int(round(lons[-1] * 1e6)))
                + struct.pack(
                    ">I",
                    int(round(abs(lons[1] - lons[0]) * 1e6)) if ni > 1 else 0,
                )
                + struct.pack(">I", int(gaussian_n))
                + bytes([0x00])                    # scan +i, -j (north->south)
            )
            s3 = (
                bytes([0])
                + struct.pack(">I", ni * nj)
                + bytes([0, 0])
                + struct.pack(">H", 40)
                + tmpl340
            )
        else:
            s3 = None
        merc = m.get("mercator")
        if merc is not None:
            # grid template 3.10: octets per spec — la2/lo2 are derivable
            # from (la1, lo1, Di, Dj) and left approximate (decoder uses
            # only the origin + steps)
            tmpl310 = (
                bytes([6])
                + bytes([0]) + struct.pack(">I", 0)
                + bytes([0]) + struct.pack(">I", 0)
                + bytes([0]) + struct.pack(">I", 0)
                + struct.pack(">II", ni, nj)
                + _enc_sm32(int(round(merc["la1"] * 1e6)))
                + _enc_sm32(int(round(merc["lo1"] * 1e6)))
                + bytes([0x08])
                + _enc_sm32(int(round(merc["lad"] * 1e6)))
                + _enc_sm32(0) + _enc_sm32(0)      # la2, lo2 (unused)
                + bytes([0x40])                    # scan +i/+j
                + struct.pack(">I", 0)             # grid orientation
                + struct.pack(">II", int(round(merc["di"] * 1e3)),
                              int(round(merc["dj"] * 1e3)))
            )
            s3 = (
                bytes([0])
                + struct.pack(">I", ni * nj)
                + bytes([0, 0])
                + struct.pack(">H", 10)
                + tmpl310
            )
        ps = m.get("ps")
        if ps is not None:
            # grid template 3.20 (polar stereographic)
            tmpl320 = (
                bytes([6])
                + bytes([0]) + struct.pack(">I", 0)
                + bytes([0]) + struct.pack(">I", 0)
                + bytes([0]) + struct.pack(">I", 0)
                + struct.pack(">II", ni, nj)
                + _enc_sm32(int(round(ps["la1"] * 1e6)))
                + _enc_sm32(int(round(ps["lo1"] * 1e6)))
                + bytes([0x08])
                + _enc_sm32(int(round(ps["lad"] * 1e6)))
                + _enc_sm32(int(round(ps["lov"] * 1e6)))
                + struct.pack(">II", int(round(ps["dx"] * 1e3)),
                              int(round(ps["dy"] * 1e3)))
                + bytes([0x80 if ps.get("south") else 0])
                + bytes([0x40])                    # scan +i/+j
            )
            s3 = (
                bytes([0])
                + struct.pack(">I", ni * nj)
                + bytes([0, 0])
                + struct.pack(">H", 20)
                + tmpl320
            )
        lcc = m.get("lcc")
        if lcc is not None:
            # grid template 3.30 (Lambert conformal): encode the x/y grid
            # origin as la1/lo1 via the same Snyder forward math the
            # decoder inverts
            tmpl330 = (
                bytes([6])                                 # earth: r=6371229
                + bytes([0]) + struct.pack(">I", 0)
                + bytes([0]) + struct.pack(">I", 0)
                + bytes([0]) + struct.pack(">I", 0)
                + struct.pack(">II", ni, nj)
                + _enc_sm32(int(round(lcc["la1"] * 1e6)))
                + _enc_sm32(int(round(lcc["lo1"] * 1e6)))
                + bytes([0x08])
                + _enc_sm32(int(round(lcc["lad"] * 1e6)))
                + _enc_sm32(int(round(lcc["lov"] * 1e6)))
                + struct.pack(">II", int(round(lcc["dx"] * 1e3)),
                              int(round(lcc["dy"] * 1e3)))
                + bytes([0])                               # north pole proj
                + bytes([0x40])                            # scan +i/+j
                + _enc_sm32(int(round(lcc["latin1"] * 1e6)))
                + _enc_sm32(int(round(lcc["latin2"] * 1e6)))
                + _enc_sm32(-90000000) + _enc_sm32(0)      # south pole
            )
            s3 = (
                bytes([0])
                + struct.pack(">I", ni * nj)
                + bytes([0, 0])
                + struct.pack(">H", 30)
                + tmpl330
            )
        tmpl30 = (
            bytes([6])                     # shape of earth: spherical r=6371229
            + bytes([0]) + struct.pack(">I", 0)      # radius scale/value (n/a)
            + bytes([0]) + struct.pack(">I", 0)      # major
            + bytes([0]) + struct.pack(">I", 0)      # minor
            + struct.pack(">II", ni, nj)
            + struct.pack(">II", 0, 0)               # basic angle, subdivisions
            + _enc_sm32(int(round(lats[0] * 1e6)))
            + _enc_sm32(int(round(lons[0] * 1e6)))
            + bytes([0x30])                          # res/component flags: Di/Dj given
            + _enc_sm32(int(round(lats[-1] * 1e6)))
            + _enc_sm32(int(round(lons[-1] * 1e6)))
            + struct.pack(
                ">II",
                int(round(abs(lons[1] - lons[0]) * 1e6)) if ni > 1 else 0,
                int(round(abs(lats[1] - lats[0]) * 1e6)) if nj > 1 else 0,
            )
            + bytes([0x00 if nj < 2 or lats[0] >= lats[-1] else 0x40])  # scan mode
        )
        if s3 is None:
            if rotated is not None:
                s3 = (
                    bytes([0])
                    + struct.pack(">I", ni * nj)
                    + bytes([0, 0])
                    + struct.pack(">H", 1)     # template 3.1 (rotated)
                    + tmpl30
                    + _enc_sm32(int(round(rotated["sp_lat"] * 1e6)))
                    + _enc_sm32(int(round(rotated["sp_lon"] * 1e6)))
                    + _enc_sm32(0)             # rotation angle 0
                )
            else:
                s3 = (
                    bytes([0])                 # grid definition source
                    + struct.pack(">I", ni * nj)
                    + bytes([0, 0])            # no optional list of numbers
                    + struct.pack(">H", 0)     # template 3.0
                    + tmpl30
                )

        tmpl40 = (
            bytes([m.get("category", 1), m.get("number", 8)])
            + bytes([2, 0, 0])             # generating process: forecast
            + struct.pack(">H", 0) + bytes([0])  # cutoff
            + bytes([1])                   # time unit: hour
            + _enc_sm32(int(m.get("forecast_hours", 0)))
            + bytes([m.get("level_type", 1), 0])
            + struct.pack(">I", int(m.get("level_value", 0)))
            + bytes([255, 0]) + struct.pack(">I", 0)  # second surface: none
        )
        member = m.get("member")
        if member is not None:
            tmpl40 = tmpl40 + bytes([3, int(member), int(m.get("n_members", 1))])
        interval_end = m.get("interval_end")
        if interval_end is None:
            s4 = (
                struct.pack(">H", 0)
                + struct.pack(">H", 1 if member is not None else 0)
                + tmpl40
            )
        else:
            # template 4.8: 4.0 fields + overall-interval end + one
            # time-range spec (statistical process: accumulation)
            tmpl48 = (
                tmpl40
                + struct.pack(">H", interval_end.year)
                + bytes([interval_end.month, interval_end.day,
                         interval_end.hour, interval_end.minute,
                         interval_end.second])
                + bytes([1])                   # one time-range spec
                + struct.pack(">I", 0)         # no missing values
                + bytes([1, 2, 1])             # accum, same ref, unit hours
                + struct.pack(">I", int(m.get("interval_hours", 1)))
                + bytes([255]) + struct.pack(">I", 0)
            )
            s4 = (
                struct.pack(">H", 0)
                + struct.pack(">H", 11 if member is not None else 8)
                + tmpl48
            )

        pack_mode = m.get("packing", "simple")
        if pack_mode == "png":
            s5 = (
                struct.pack(">I", int(mask.sum()))
                + struct.pack(">H", 41)        # template 5.41 (PNG)
                + struct.pack(">f", ref)
                + _enc_sm16(0) + _enc_sm16(0)  # E, D
                + bytes([8 if nbits <= 8 else 16, 0])
            )
            s7 = _png_encode(xvals, 8 if nbits <= 8 else 16)
        elif pack_mode == "simple":
            s5 = (
                struct.pack(">I", int(mask.sum()))
                + struct.pack(">H", 0)         # template 5.0
                + struct.pack(">f", ref)
                + _enc_sm16(0) + _enc_sm16(0)  # E, D
                + bytes([nbits, 0])
            )
            s7 = _pack_bits(xvals, nbits) if xvals.size else b""
        else:
            sd_order = {"complex": 0, "complex_sd1": 1, "complex_sd2": 2}[
                pack_mode
            ]
            params, s7 = _complex_pack(
                xvals, sd_order, group_len=int(m.get("group_len", 7))
            )
            s5 = (
                struct.pack(">I", int(mask.sum()))
                + struct.pack(">H", 3 if sd_order else 2)
                + struct.pack(">f", ref)
                + _enc_sm16(0) + _enc_sm16(0)      # E, D
                + bytes([params["nbits"], 0])
                + bytes([1, 0])                    # general splitting, no missing mgmt
                + struct.pack(">II", 0, 0)         # missing substitutes
                + struct.pack(">I", params["ng"])
                + bytes([params["width_ref"], params["width_bits"]])
                + struct.pack(">I", params["len_ref"])
                + bytes([params["len_inc"]])
                + struct.pack(">I", params["last_len"])
                + bytes([params["len_bits"]])
                + (bytes([params["sd_order"], params["sd_octets"]])
                   if sd_order else b"")
            )

        if has_bitmap:
            s6 = bytes([0]) + np.packbits(mask.astype("u1")).tobytes()
        else:
            s6 = bytes([255])

        body = (
            _section(1, s1)
            + _section(3, s3)
            + _section(4, s4)
            + _section(5, s5)
            + _section(6, s6)
            + _section(7, s7)
        )
        total = 16 + len(body) + 4
        blob += (
            b"GRIB" + b"\x00\x00"
            + bytes([m.get("discipline", 0), 2])
            + struct.pack(">Q", total)
            + body
            + b"7777"
        )
    with open(path, "wb") as f:
        f.write(bytes(blob))


# --- PNG data packing (templates 5.41 / 7.41) --------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(buf: bytes):
    if buf[:8] != _PNG_SIG:
        raise GRIB2Error("data section is not a PNG stream")
    pos = 8
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        typ = buf[pos + 4 : pos + 8]
        yield typ, buf[pos + 8 : pos + 8 + ln]
        if typ == b"IEND":
            return
        pos += 12 + ln


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytes:
    """Reverse PNG scanline filters (all five types)."""
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise GRIB2Error(f"PNG filter type {ftype} invalid")
        out += line
        prev = line
    return bytes(out)


def _unpack_png(body: bytes, n_present: int, packing: dict) -> np.ndarray:
    """Data template 7.41: the scaled integers are a PNG image (one
    scanline per grid row as written by encoders like g2lib; we accept
    any height x width = n_present).  Bit depths 8/16 grayscale and the
    24/32-bit RGB(A) widenings are supported."""
    import zlib

    width = height = bitdepth = colortype = None
    idat = b""
    for typ, chunk in _png_chunks(body):
        if typ == b"IHDR":
            width, height = struct.unpack(">II", chunk[0:8])
            bitdepth, colortype = chunk[8], chunk[9]
            if chunk[10] or chunk[11] or chunk[12]:
                raise GRIB2Error("PNG interlace/compression flags unsupported")
        elif typ == b"IDAT":
            idat += chunk
    if width is None:
        raise GRIB2Error("PNG stream missing IHDR")
    channels = {0: 1, 2: 3, 6: 4}.get(colortype)
    if channels is None:
        raise GRIB2Error(f"PNG color type {colortype} unsupported")
    if bitdepth not in (8, 16):
        raise GRIB2Error(f"PNG bit depth {bitdepth} unsupported")
    if width * height != n_present:
        raise GRIB2Error(
            f"PNG carries {width * height} samples for {n_present} points"
        )
    bpp = channels * (bitdepth // 8)
    raw = _png_unfilter(zlib.decompress(idat), height, width * bpp, bpp)
    arr = np.frombuffer(raw, dtype=">u2" if bitdepth == 16 else "u1")
    if channels > 1:  # 24/32-bit ints spread across RGB(A) bytes
        arr = arr.reshape(-1, channels).astype("int64")
        out = np.zeros(arr.shape[0], dtype="int64")
        for c in range(channels):
            out = (out << 8) | arr[:, c]
        return out
    return arr.astype("int64")


def _png_encode(xvals: np.ndarray, nbits: int) -> bytes:
    """Minimal PNG writer for fixtures: grayscale, filter 0, one row."""
    import zlib

    if nbits <= 8:
        depth, data = 8, xvals.astype("u1").tobytes()
    elif nbits <= 16:
        depth, data = 16, xvals.astype(">u2").tobytes()
    else:
        raise GRIB2Error(f"PNG fixture nbits {nbits} unsupported")

    def chunk(typ: bytes, body: bytes) -> bytes:
        import zlib as _z

        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", _z.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", xvals.size, 1, depth, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00" + data)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# --- Lambert conformal grids (grid template 3.30) ----------------------------


def _earth_radius(body: bytes) -> float:
    """Spherical earth radius from the 16-byte shape-of-earth block."""
    shape = body[0]
    if shape == 0:
        return 6367470.0
    if shape == 6:
        return 6371229.0
    if shape == 1:
        scale, value = body[1], struct.unpack(">I", body[2:6])[0]
        return value / 10.0**scale
    raise GRIB2Error(f"earth shape {shape} unsupported (spherical only)")


def _lcc_np(c: dict):
    """Numpy Snyder spherical LCC forward/inverse sharing
    ``functions.conventions.lcc_constants`` — the exact constants the
    column-expression path uses."""
    n, big_f, rho0, radius, lon0 = c["n"], c["F"], c["rho0"], c["R"], c["lon0"]

    def fwd(lon, lat):
        dlon = ((np.asarray(lon) - lon0 + 540.0) % 360.0) - 180.0
        theta = n * np.radians(dlon)
        rho = radius * big_f / np.tan(np.pi / 4 + np.radians(lat) / 2) ** n
        return rho * np.sin(theta), rho0 - rho * np.cos(theta)

    def inv(x, y):
        rho = np.hypot(x, rho0 - y)
        theta = np.arctan2(x, rho0 - y)
        lat = np.degrees(2.0 * np.arctan((radius * big_f / rho) ** (1.0 / n)) - np.pi / 2)
        lon = ((lon0 + np.degrees(theta / n)) + 540.0) % 360.0 - 180.0
        return lon, lat

    return fwd, inv


def _parse_grid_template_330(body: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    """Grid template 3.30 (Lambert conformal, the HRRR/NAM grid): the
    cells live on a regular x/y grid in projection meters; decode
    inverse-projects every cell center, so ``lats``/``lons`` come back
    as 2-D arrays."""
    from gridded_etl_tools_spark.functions.conventions import lcc_constants

    radius = _earth_radius(body[0:16])
    nx = struct.unpack(">I", body[16:20])[0]
    ny = struct.unpack(">I", body[20:24])[0]
    la1 = _sm32(body[24:28]) / 1e6
    lo1 = _sm32(body[28:32]) / 1e6
    lad = _sm32(body[33:37]) / 1e6
    lov = _sm32(body[37:41]) / 1e6
    dx = struct.unpack(">I", body[41:45])[0] / 1e3
    dy = struct.unpack(">I", body[45:49])[0] / 1e3
    scan = body[50]
    if scan & 0x80 or not scan & 0x40:
        raise GRIB2Error(f"LCC scanning mode {scan:#x}: need +i/+j")
    latin1 = _sm32(body[51:55]) / 1e6
    latin2 = _sm32(body[55:59]) / 1e6
    c = lcc_constants(latin1, latin2, lad, lov, radius)
    fwd, inv = _lcc_np(c)
    x0, y0 = fwd(lo1, la1)
    x = x0 + dx * np.arange(nx)
    y = y0 + dy * np.arange(ny)
    xm, ym = np.meshgrid(x, y)
    lons, lats = inv(xm, ym)
    return lats, lons, scan


# --- Polar stereographic grids (grid template 3.20) --------------------------


def _ps_np(lad_deg: float, lov_deg: float, radius: float, south: bool):
    """Numpy spherical polar-stereographic forward/inverse (Snyder), with
    true scale at ``lad_deg`` and orientation ``lov_deg``."""
    sgn = -1.0 if south else 1.0
    k = radius * (1.0 + np.sin(np.radians(abs(lad_deg))))

    def fwd(lon, lat):
        rho = k * np.tan(np.pi / 4 - sgn * np.radians(lat) / 2)
        dlon = np.radians(((np.asarray(lon) - lov_deg + 540.0) % 360.0) - 180.0)
        return rho * np.sin(dlon), -sgn * rho * np.cos(dlon)

    def inv(x, y):
        rho = np.hypot(x, y)
        lat = sgn * np.degrees(np.pi / 2 - 2 * np.arctan(rho / k))
        lon = ((lov_deg + np.degrees(np.arctan2(x, -sgn * np.asarray(y))))
               + 540.0) % 360.0 - 180.0
        return lon, lat

    return fwd, inv


def _parse_grid_template_320(body: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    """Grid template 3.20 (polar stereographic — NSIDC/arctic products):
    regular x/y grid in projection meters; every cell center is
    inverse-projected, so lats/lons come back 2-D."""
    radius = _earth_radius(body[0:16])
    nx = struct.unpack(">I", body[16:20])[0]
    ny = struct.unpack(">I", body[20:24])[0]
    la1 = _sm32(body[24:28]) / 1e6
    lo1 = _sm32(body[28:32]) / 1e6
    lad = _sm32(body[33:37]) / 1e6
    lov = _sm32(body[37:41]) / 1e6
    dx = struct.unpack(">I", body[41:45])[0] / 1e3
    dy = struct.unpack(">I", body[45:49])[0] / 1e3
    south = bool(body[49] & 0x80)
    scan = body[50]
    if scan & 0x80 or not scan & 0x40:
        raise GRIB2Error(f"PS scanning mode {scan:#x}: need +i/+j")
    fwd, inv = _ps_np(lad, lov, radius, south)
    x0, y0 = fwd(lo1, la1)
    x = x0 + dx * np.arange(nx)
    y = y0 + dy * np.arange(ny)
    xm, ym = np.meshgrid(x, y)
    lons, lats = inv(xm, ym)
    return lats, lons, scan


# --- Gaussian grids (grid template 3.40) -------------------------------------


def gaussian_latitudes(n: int) -> np.ndarray:
    """The 2N Gaussian latitudes (degrees, north->south): arcsin of the
    Gauss-Legendre quadrature nodes — the native ECMWF grid parallels
    (ERA5's regular-Gaussian form)."""
    nodes, _ = np.polynomial.legendre.leggauss(2 * n)
    return np.degrees(np.arcsin(nodes))[::-1].copy()


def _parse_grid_template_340(body: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    """Grid template 3.40 (regular Gaussian): like lat/lon but the
    parallels are the 2N Gaussian latitudes (N = parallels between pole
    and equator, octets 68-71 replacing Dj).  The declared la1/la2 must
    frame the computed latitudes (guard against half-degree drift from a
    mis-encoded N)."""
    ni = struct.unpack(">I", body[16:20])[0]
    nj = struct.unpack(">I", body[20:24])[0]
    la1 = _sm32(body[32:36]) / 1e6
    lo1 = _sm32(body[36:40]) / 1e6
    lo2 = _sm32(body[45:49]) / 1e6
    n = struct.unpack(">I", body[53:57])[0]
    scan = body[57]
    if scan & 0x80 or scan & 0x20 or scan & 0x10:
        raise GRIB2Error(f"Gaussian scanning mode {scan:#x} unsupported")
    lats_all = gaussian_latitudes(n)
    if scan & 0x40:
        lats_all = lats_all[::-1]
    if nj > lats_all.size:
        raise GRIB2Error(
            f"Gaussian grid declares nj={nj} > 2N={lats_all.size} parallels"
        )
    # subset grids start at the parallel nearest la1
    start = int(np.argmin(np.abs(lats_all - la1)))
    lats = lats_all[start : start + nj]
    if lats.size != nj or abs(lats[0] - la1) > 0.5:
        raise GRIB2Error(
            f"declared la1={la1} does not sit on a Gaussian parallel of N={n}"
        )
    lons = np.linspace(lo1, lo2, ni)
    return lats.copy(), lons, scan


def _parse_reduced_gaussian(body: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    """Reduced Gaussian grid (template 3.40 with Ni missing and a
    per-parallel point-count list — ERA5's TRUE native layout): each
    parallel j carries ``pl[j]`` points at spacing 360/pl[j] from lo1.
    Returns FLAT per-cell (lats, lons) arrays aligned with the data
    values (the grid is ragged, so no rectangular mesh exists)."""
    noct, interp = body[5], body[6]
    if interp != 1:
        raise GRIB2Error(
            f"optional-list interpretation {interp}, need 1 (points per row)"
        )
    t = body[9:]
    nj = struct.unpack(">I", t[20:24])[0]
    la1 = _sm32(t[32:36]) / 1e6
    lo1 = _sm32(t[36:40]) / 1e6
    n = struct.unpack(">I", t[53:57])[0]
    scan = t[57]
    if scan & 0x80 or scan & 0x20 or scan & 0x10:
        raise GRIB2Error(f"Gaussian scanning mode {scan:#x} unsupported")
    raw = body[9 + 58 : 9 + 58 + nj * noct]
    if len(raw) < nj * noct:
        raise GRIB2Error("reduced-Gaussian point-count list truncated")
    pl = np.array(
        [int.from_bytes(raw[i * noct : (i + 1) * noct], "big") for i in range(nj)],
        dtype="int64",
    )
    lats_all = gaussian_latitudes(n)
    if scan & 0x40:
        lats_all = lats_all[::-1]
    start = int(np.argmin(np.abs(lats_all - la1)))
    lats_rows = lats_all[start : start + nj]
    if lats_rows.size != nj or abs(lats_rows[0] - la1) > 0.5:
        raise GRIB2Error(
            f"declared la1={la1} does not sit on a Gaussian parallel of N={n}"
        )
    lats_flat = np.repeat(lats_rows, pl)
    lons_flat = np.concatenate(
        [lo1 + np.arange(k) * (360.0 / k) for k in pl]
    )
    return lats_flat, lons_flat, scan


# --- Rotated lat/lon grids (grid template 3.1) -------------------------------


def _unrotate(lat_r, lon_r, sp_lat: float, sp_lon: float):
    """True (lat, lon) for rotated-system coordinates, given the
    geographic position of the rotated SOUTH pole (the COSMO/regional
    convention template 3.1 encodes).  Rotated north pole: (-sp_lat,
    sp_lon - 180)."""
    pn_lat = np.radians(-sp_lat)
    pn_lon = np.radians(sp_lon + 180.0)
    phi_r = np.radians(np.asarray(lat_r))
    lam_r = np.radians(np.asarray(lon_r))
    sin_phi = (
        np.sin(pn_lat) * np.sin(phi_r)
        + np.cos(pn_lat) * np.cos(phi_r) * np.cos(lam_r)
    )
    phi = np.arcsin(np.clip(sin_phi, -1.0, 1.0))
    lam = pn_lon + np.arctan2(
        np.cos(phi_r) * np.sin(lam_r),
        np.sin(pn_lat) * np.cos(phi_r) * np.cos(lam_r)
        - np.cos(pn_lat) * np.sin(phi_r),
    )
    lat = np.degrees(phi)
    lon = ((np.degrees(lam) + 540.0) % 360.0) - 180.0
    return lat, lon


def _parse_grid_template_31(body: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    """Grid template 3.1 (rotated lat/lon — COSMO/regional models): a
    regular grid in the rotated system, un-rotated per cell to true
    coordinates (2-D output).  Rotation angle != 0 is unsupported."""
    lats_r, lons_r, scan = _parse_grid_template_30(body)
    sp_lat = _sm32(body[58:62]) / 1e6
    sp_lon = _sm32(body[62:66]) / 1e6
    angle = _sm32(body[66:70])
    if angle != 0:
        raise GRIB2Error(f"rotation angle {angle} unsupported (only 0)")
    lon_mesh, lat_mesh = np.meshgrid(lons_r, lats_r)
    lat2d, lon2d = _unrotate(lat_mesh, lon_mesh, sp_lat, sp_lon)
    return lat2d, lon2d, scan


# --- Mercator grids (grid template 3.10) -------------------------------------


def _parse_grid_template_310(body: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    """Grid template 3.10 (Mercator): regular x/y in projection meters
    with true scale at LaD; x maps linearly to longitude, y inverts
    through the Mercator latitude formula.  Axes stay separable, so
    lats/lons return 1-D like the plain lat/lon template."""
    radius = _earth_radius(body[0:16])
    ni = struct.unpack(">I", body[16:20])[0]
    nj = struct.unpack(">I", body[20:24])[0]
    la1 = _sm32(body[24:28]) / 1e6
    lo1 = _sm32(body[28:32]) / 1e6
    lad = _sm32(body[33:37]) / 1e6
    # 37:45 = la2/lo2 (derivable; unused)  45 = scan  46:50 = orientation
    scan = body[45]
    if scan & 0x80 or scan & 0x20 or scan & 0x10:
        raise GRIB2Error(f"Mercator scanning mode {scan:#x} unsupported")
    di = struct.unpack(">I", body[50:54])[0] / 1e3
    dj = struct.unpack(">I", body[54:58])[0] / 1e3
    k = radius * np.cos(np.radians(lad))  # meters per radian at true-scale lat
    x0 = k * np.radians(lo1)
    y0 = k * np.log(np.tan(np.pi / 4 + np.radians(la1) / 2))
    sgn_j = 1.0 if scan & 0x40 else -1.0
    x = x0 + di * np.arange(ni)
    y = y0 + sgn_j * dj * np.arange(nj)
    lons = ((np.degrees(x / k) + 540.0) % 360.0) - 180.0
    lats = np.degrees(2 * np.arctan(np.exp(y / k)) - np.pi / 2)
    return lats, lons, scan
