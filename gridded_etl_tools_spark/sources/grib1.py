"""Pure-Python GRIB edition-1 decode path (simple packing, lat/lon grid).

Reference parity: ``utils/transform.py:119-279`` (``kerchunkify``) scans
GRIB files via ``scan_grib`` + a layer pick — the other half of the
reference's ingest front door next to NetCDF.  This container ships no
cfgrib/eccodes, but GRIB1's wire format is a small public spec (WMO
FM 92-VIII Ext.: IS/PDS/GDS/BMS/BDS sections, IBM-float reference
value, fixed-width bit packing), so this module implements the subset
the reference's datasets actually use: regular lat/lon grids, simple
packing, optional bitmap for missing cells.

Decode shape mirrors ``sources/netcdf3.py``: per-file and
embarrassingly parallel — whole files decode on executors via
``mapInPandas`` over a ``binaryFile`` scan; a multi-message file (one
GRIB record per time step, how real archives are laid out) yields one
long-form row per grid cell with the valid time from each PDS.  Bitmap
gaps surface as NaN → SQL NULL (the S12 sentinel rule).

A minimal writer (:func:`write_grib1`) fabricates real on-disk .grib
fixtures so tests exercise true bytes, like the NetCDF3 golden test.
"""

from __future__ import annotations

import datetime as dt
import math
import struct
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class GRIB1Error(ValueError):
    pass


# --- IBM System/360 single-precision float (GRIB1 reference value) -----------


def ibm_to_float(b: int) -> float:
    """Decode 32-bit IBM hex float: (-1)^s × frac/2^24 × 16^(exp-64)."""
    sign = -1.0 if b & 0x80000000 else 1.0
    exp = (b >> 24) & 0x7F
    frac = b & 0xFFFFFF
    return sign * frac * 2.0**-24 * 16.0 ** (exp - 64)


def float_to_ibm(x: float) -> int:
    """Encode to 32-bit IBM hex float (round-to-nearest mantissa)."""
    if x == 0.0:
        return 0
    sign = 0x80000000 if x < 0 else 0
    v = abs(x)
    exp = int(math.floor(math.log(v, 16))) + 1 + 64
    frac = int(round(v * 2.0**24 / 16.0 ** (exp - 64)))
    while frac >= 1 << 24:  # rounding overflowed a hex digit
        frac >>= 4
        exp += 1
    return sign | (exp << 24) | frac


# --- sign-magnitude integers (GRIB1 stores negatives as top-bit + magnitude) -


def _sm16(b: bytes) -> int:
    v = (b[0] & 0x7F) << 8 | b[1]
    return -v if b[0] & 0x80 else v


def _sm24(b: bytes) -> int:
    v = (b[0] & 0x7F) << 16 | b[1] << 8 | b[2]
    return -v if b[0] & 0x80 else v


def _enc_sm16(v: int) -> bytes:
    m = abs(v)
    return bytes([(0x80 if v < 0 else 0) | (m >> 8), m & 0xFF])


def _enc_sm24(v: int) -> bytes:
    m = abs(v)
    return bytes([(0x80 if v < 0 else 0) | (m >> 16), (m >> 8) & 0xFF, m & 0xFF])


def _u24(b: bytes) -> int:
    return b[0] << 16 | b[1] << 8 | b[2]


def _enc_u24(v: int) -> bytes:
    return bytes([(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF])


#: PDS time-unit indicator → timedelta of one unit (the units the
#: reference's forecast datasets use; others raise)
_TIME_UNITS = {0: dt.timedelta(minutes=1), 1: dt.timedelta(hours=1), 2: dt.timedelta(days=1)}


@dataclass
class GribMessage:
    parameter: int
    level_type: int
    level: int
    reference_time: dt.datetime
    valid_time: dt.datetime
    lats: np.ndarray  # Nj
    lons: np.ndarray  # Ni
    values: np.ndarray  # (Nj, Ni), NaN where the bitmap masked a cell
    member: int | None = None  # ECMWF local-PDS perturbation number


def _parse_message(
    buf: bytes, start: int, decode: bool = True
) -> tuple[object, int]:
    """Parse one GRIB1 message at ``start``; return (message, next_start).
    ``decode=False`` stops after the GDS and returns a field DESCRIPTOR
    dict (message byte span + identity + grid) without touching the
    BMS/BDS — the refs-production scan (r11, mirroring grib2's
    ``scan_grib2``)."""
    if buf[start : start + 4] != b"GRIB":
        raise GRIB1Error(f"no GRIB magic at offset {start}")
    if buf[start + 7] != 1:
        # edition check FIRST (fifth review pass r11): a GRIB2 buffer's
        # zeroed reserved octets would otherwise report a misleading
        # 'declares length' error instead of the edition diagnosis
        raise GRIB1Error(f"GRIB edition {buf[start + 7]}, only 1 supported")
    total_len = _u24(buf[start + 4 : start + 7])
    if total_len < 12:  # IS(8) + ES(4) minimum — a zero/short length
        # would park `end` before `start`, let the terminator check
        # read the PREVIOUS message's 7777, and loop the file walk
        # forever with unbounded growth (code-review r11, reproduced)
        raise GRIB1Error(
            f"message at offset {start} declares length {total_len}"
        )
    end = start + total_len
    if buf[end - 4 : end] != b"7777":
        raise GRIB1Error("message missing 7777 terminator")
    pos = start + 8

    # --- PDS ---
    pds = buf[pos : pos + _u24(buf[pos : pos + 3])]
    flags = pds[7]
    has_gds, has_bms = bool(flags & 0x80), bool(flags & 0x40)
    if not has_gds:
        raise GRIB1Error("messages without GDS are not supported")
    parameter, level_type = pds[8], pds[9]
    level = pds[10] << 8 | pds[11]
    century = pds[24] if len(pds) > 24 and pds[24] else 21
    year = (century - 1) * 100 + pds[12]
    ref_time = dt.datetime(year, pds[13], pds[14], pds[15], pds[16])
    time_unit, p1 = pds[17], pds[18]
    if time_unit not in _TIME_UNITS:
        raise GRIB1Error(f"unsupported PDS time unit {time_unit}")
    valid_time = ref_time + p1 * _TIME_UNITS[time_unit]
    d_scale = _sm16(pds[26:28])
    # ECMWF ensemble labelling (r13, verdict r12 #6): edition 1 has no
    # standard member field — ECMWF (centre 98) carries it in the
    # LOCAL use part of the PDS, local definition 1 ("MARS
    # labelling"): octet 41 = definition number, octet 50 =
    # perturbation number, octet 51 = total forecasts in ensemble
    # (0 when the product is not an ensemble — deterministic ECMWF
    # fields also carry definition 1, so the total gates the member).
    member = n_members = None
    centre = pds[4]
    if centre == 98 and len(pds) >= 52 and pds[40] == 1:
        total = int(pds[50])
        if total > 0:
            member, n_members = int(pds[49]), total
    pos += len(pds)

    # --- GDS (lat/lon grid only) ---
    gds = buf[pos : pos + _u24(buf[pos : pos + 3])]
    if gds[5] != 0:
        raise GRIB1Error(f"GDS representation {gds[5]}, only lat/lon (0) supported")
    ni = gds[6] << 8 | gds[7]
    nj = gds[8] << 8 | gds[9]
    la1, lo1 = _sm24(gds[10:13]) / 1000.0, _sm24(gds[13:16]) / 1000.0
    la2, lo2 = _sm24(gds[17:20]) / 1000.0, _sm24(gds[20:23]) / 1000.0
    scan = gds[27]
    if scan != 0:
        raise GRIB1Error(f"scanning mode {scan:#x}, only +i/-j (0) supported")
    lons = np.linspace(lo1, lo2, ni)
    lats = np.linspace(la1, la2, nj)  # north → south per scan mode 0
    pos += len(gds)

    if not decode:
        return (
            {
                "msg_offset": start,
                "msg_length": total_len,
                "parameter": parameter,
                "level_type": level_type,
                "level": level,
                "reference_time": ref_time,
                "valid_time": valid_time,
                "lats": lats,
                "lons": lons,
                "member": member,
                "n_members": n_members,
            },
            end,
        )

    # --- BMS (optional bitmap: 1 = value present) ---
    bitmap = None
    if has_bms:
        bms = buf[pos : pos + _u24(buf[pos : pos + 3])]
        unused = bms[3]
        if bms[4] << 8 | bms[5] != 0:
            raise GRIB1Error("predefined bitmaps are not supported")
        bits = np.unpackbits(np.frombuffer(bms[6:], dtype="u1"))
        bitmap = bits[: bits.size - unused].astype(bool)
        if bitmap.size != ni * nj:
            raise GRIB1Error(f"bitmap has {bitmap.size} bits for {ni * nj} cells")
        pos += len(bms)

    # --- BDS (simple packing) ---
    bds = buf[pos : pos + _u24(buf[pos : pos + 3])]
    if bds[3] & 0xF0:
        raise GRIB1Error("only grid-point simple packing is supported")
    unused_bits = bds[3] & 0x0F
    e_scale = _sm16(bds[4:6])
    (ref_bits,) = struct.unpack(">I", bds[6:10])
    ref_val = ibm_to_float(ref_bits)
    nbits = bds[10]
    n_present = int(bitmap.sum()) if bitmap is not None else ni * nj
    if nbits:
        packed = np.unpackbits(np.frombuffer(bds[11:], dtype="u1"))
        if packed.size - unused_bits < n_present * nbits:
            raise GRIB1Error("BDS too short for declared grid")
        xs = packed[: n_present * nbits].reshape(n_present, nbits)
        weights = 1 << np.arange(nbits - 1, -1, -1, dtype="int64")
        xvals = (xs.astype("int64") * weights).sum(axis=1)
    else:  # constant field
        xvals = np.zeros(n_present, dtype="int64")
    present = (ref_val + xvals * 2.0**e_scale) / 10.0**d_scale

    if bitmap is not None:
        values = np.full(ni * nj, np.nan)
        values[bitmap] = present
    else:
        values = present.astype("f8")
    return (
        GribMessage(
            parameter, level_type, level, ref_time, valid_time,
            lats, lons, values.reshape(nj, ni), member=member,
        ),
        end,
    )


def _parse_wrapped(buf: bytes, decode: bool) -> list:
    """The ONE exception-taxonomy wrapper for both entry points
    (fourth review pass r11: parse/scan had verbatim copies)."""
    try:
        return _parse_grib1_inner(buf, decode)
    except (struct.error, IndexError, ValueError) as e:
        if isinstance(e, GRIB1Error):
            raise
        raise GRIB1Error(f"truncated or corrupt GRIB1 structure: {e}") from e


def parse_grib1(buf: bytes) -> list[GribMessage]:
    """Parse every message in a GRIB1 file buffer (archives concatenate
    one message per time step / level)."""
    return _parse_wrapped(buf, decode=True)


def _parse_grib1_inner(buf: bytes, decode: bool = True) -> list:
    out: list = []
    pos = 0
    while pos < len(buf):
        if buf[pos : pos + 4] != b"GRIB":  # tolerate inter-message padding
            nxt = buf.find(b"GRIB", pos)
            if nxt < 0:
                break
            pos = nxt
        msg, pos = _parse_message(buf, pos, decode)
        out.append(msg)
    if not out:
        raise GRIB1Error("no GRIB messages found")
    return out


def scan_grib1(buf: bytes) -> list[dict]:
    """Message DESCRIPTORS without decoding any data section — the
    refs-production scan (r11): per message, its byte span, the PDS
    identity (parameter/level), times, and the grid axes.  GRIB1
    messages carry exactly one field each, so there is no in-message
    field index."""
    return _parse_wrapped(buf, decode=False)


def select_messages(
    messages: list[GribMessage],
    parameter: int | None = None,
    level_type: int | None = None,
    level: int | None = None,
) -> list[GribMessage]:
    """Layer pick (reference ``grib_filter`` + ``scan_indices``,
    ``utils/transform.py:226-279``): GRIB archives interleave parameters
    and levels in one file; real ingests keep exactly one layer."""
    out = [
        m
        for m in messages
        if (parameter is None or m.parameter == parameter)
        and (level_type is None or m.level_type == level_type)
        and (level is None or m.level == level)
    ]
    if not out:
        raise GRIB1Error(
            f"no messages match parameter={parameter} "
            f"level_type={level_type} level={level}"
        )
    return out


def grib1_long_frame(
    buf: bytes,
    parameter: int | None = None,
    level_type: int | None = None,
    level: int | None = None,
) -> pd.DataFrame:
    """Decode (optionally one layer of) all messages to long form: one
    row per (valid_time, lat, lon) cell; bitmap-masked cells are NaN."""
    frames = []
    for m in select_messages(parse_grib1(buf), parameter, level_type, level):
        lon_mesh, lat_mesh = np.meshgrid(m.lons, m.lats)
        frames.append(
            pd.DataFrame(
                {
                    "time": m.valid_time,
                    "ensemble": (
                        float(m.member) if m.member is not None
                        else np.nan
                    ),
                    "latitude": lat_mesh.reshape(-1),
                    "longitude": lon_mesh.reshape(-1),
                    "value": m.values.reshape(-1),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def decode_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("time", T.TimestampType(), True),
            T.StructField("ensemble", T.DoubleType(), True),
            T.StructField("latitude", T.DoubleType(), True),
            T.StructField("longitude", T.DoubleType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )


def decode_grib1_long(
    files: DataFrame,
    parameter: int | None = None,
    level_type: int | None = None,
    level: int | None = None,
) -> DataFrame:
    """Distributed decode: ``binaryFile`` rows (path, content) → long-form
    rows via Arrow-batched ``mapInPandas``; NaN (bitmap) becomes NULL.
    ``parameter``/``level_type``/``level`` pick one layer from
    multi-layer archives (reference ``grib_filter``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                frame = grib1_long_frame(
                    bytes(content), parameter, level_type, level
                )
                frame.insert(0, "path", path)
                yield frame

    return files.select("path", "content").mapInPandas(run, decode_schema())


# --- minimal GRIB1 writer (test-fixture generator) ---------------------------


def _pack_bits(xvals: np.ndarray, nbits: int) -> bytes:
    bits = ((xvals[:, None] >> np.arange(nbits - 1, -1, -1)) & 1).astype("u1")
    return np.packbits(bits.reshape(-1)).tobytes()


def write_grib1(
    path: str,
    messages: list[dict],
) -> None:
    """Write a multi-message GRIB1 file.  Each message dict:
    ``{values: 2D array (nj, ni) with NaN for missing, lats, lons,
    reference_time, p1_hours, parameter, level_type, level, nbits}``.
    Simple packing: E=0, R=min(values), D=0 — exact for integer-valued
    grids, which is what the golden tests use.  Fixture-generation only."""
    blob = bytearray()
    for m in messages:
        values = np.asarray(m["values"], dtype="f8")
        nj, ni = values.shape
        lats, lons = np.asarray(m["lats"]), np.asarray(m["lons"])
        rt: dt.datetime = m["reference_time"]
        mask = ~np.isnan(values.reshape(-1))
        has_bms = not mask.all()
        present = values.reshape(-1)[mask]
        ref = float(present.min()) if present.size else 0.0
        xvals = np.round(present - ref).astype("int64")
        nbits = int(m.get("nbits", 16))
        if xvals.size and int(xvals.max()) >= 1 << nbits:
            raise GRIB1Error(f"nbits={nbits} too small for range {int(xvals.max())}")

        member = m.get("member")
        pds = bytearray(52 if member is not None else 28)
        pds[0:3] = _enc_u24(len(pds))
        pds[3], pds[4], pds[5], pds[6] = 128, 0, 0, 255
        if member is not None:
            # ECMWF local PDS, definition 1 (MARS labelling)
            pds[4] = 98                       # originating centre
            pds[40] = 1                       # local definition number
            pds[41], pds[42] = 1, 11          # class od, type pf
            pds[43:45] = (1035).to_bytes(2, "big")  # stream enfo
            pds[45:49] = b"0001"              # expver
            pds[49] = int(member)             # perturbation number
            pds[50] = int(m.get("n_members", 1))  # ensemble size
        pds[7] = 0x80 | (0x40 if has_bms else 0)
        pds[8] = m.get("parameter", 61)
        pds[9] = m.get("level_type", 1)
        level = m.get("level", 0)
        pds[10], pds[11] = level >> 8, level & 0xFF
        pds[12] = rt.year % 100 or 100
        pds[13], pds[14], pds[15], pds[16] = rt.month, rt.day, rt.hour, rt.minute
        pds[17] = 1  # unit: hours
        pds[18] = m.get("p1_hours", 0)
        pds[19] = 0
        pds[20] = 0  # time range: forecast at reference + P1
        pds[24] = (rt.year - 1) // 100 + 1
        pds[26:28] = _enc_sm16(0)  # D = 0

        gds = bytearray(32)
        gds[0:3] = _enc_u24(32)
        gds[3], gds[4], gds[5] = 0, 255, 0
        gds[6], gds[7] = ni >> 8, ni & 0xFF
        gds[8], gds[9] = nj >> 8, nj & 0xFF
        gds[10:13] = _enc_sm24(int(round(lats[0] * 1000)))
        gds[13:16] = _enc_sm24(int(round(lons[0] * 1000)))
        gds[16] = 0x80
        gds[17:20] = _enc_sm24(int(round(lats[-1] * 1000)))
        gds[20:23] = _enc_sm24(int(round(lons[-1] * 1000)))
        di = abs(lons[1] - lons[0]) if ni > 1 else 0.0
        dj = abs(lats[1] - lats[0]) if nj > 1 else 0.0
        gds[23], gds[24] = int(round(di * 1000)) >> 8, int(round(di * 1000)) & 0xFF
        gds[25], gds[26] = int(round(dj * 1000)) >> 8, int(round(dj * 1000)) & 0xFF
        gds[27] = 0  # scan +i, -j

        bms = b""
        if has_bms:
            packed = np.packbits(mask.astype("u1"))
            unused = packed.size * 8 - mask.size
            body = packed.tobytes()
            length = 6 + len(body)
            if length % 2:  # sections pad to even length...
                body += b"\x00"
                length += 1
                unused += 8  # ...and the pad byte's 8 bits are unused too
            bms = _enc_u24(length) + bytes([unused, 0, 0]) + body

        data = _pack_bits(xvals, nbits) if xvals.size else b""
        unused_bits = (8 - (xvals.size * nbits) % 8) % 8
        length = 11 + len(data)
        if length % 2:
            data += b"\x00"
            length += 1
            unused_bits += 8
        bds = (
            _enc_u24(length)
            + bytes([unused_bits & 0x0F])
            + _enc_sm16(0)  # E = 0
            + struct.pack(">I", float_to_ibm(ref))
            + bytes([nbits])
            + data
        )

        body = bytes(pds) + bytes(gds) + bms + bds + b"7777"
        blob += b"GRIB" + _enc_u24(8 + len(body)) + b"\x01" + body

    with open(path, "wb") as f:
        f.write(bytes(blob))
