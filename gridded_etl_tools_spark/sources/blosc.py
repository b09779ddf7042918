"""Pure-Python Blosc1 frame codec (blosclz / LZ4 / zlib inner streams,
zstd / snappy via pyarrow; byte- and bit-shuffle filters).

Closes the reference-parity gap called out in round 7: the reference's
DEFAULT compressor is Blosc — v2 stores get ``numcodecs.Blosc()``
(= cname "lz4", clevel 5, byte-shuffle) and v3 stores get
``zarr.codecs.BloscCodec(cname="lz4")``
(``/root/reference/gridded_etl_tools/utils/metadata.py:952-954``) — so
any store the reference publishes with default settings was previously
unreadable here.  This module decodes (and, for fixtures and the native
sink, encodes) the c-blosc1 chunk format with zero new dependencies, in
the same style as the GRIB2 PNG codec.

Format (c-blosc ``README_CHUNK_FORMAT.rst``):

* 16-byte header: version, versionlz, flags, typesize, then
  little-endian uint32 ``nbytes`` / ``blocksize`` / ``cbytes``.
* flags: 0x1 byte-shuffle, 0x2 memcpyed (payload is the raw buffer,
  no filters), 0x4 bit-shuffle, 0x10 dont-split, bits 5-7 the inner
  codec (0 = blosclz, 1 = LZ4/LZ4HC, 3 = zlib).
* non-memcpyed: a uint32 offset table (one entry per block, offsets
  from the frame start), then per block ``nsplits`` streams, each a
  uint32 compressed size followed by the stream bytes; a stream whose
  recorded size equals its uncompressed size is stored raw.
* byte-shuffle and the split into ``typesize`` streams both apply PER
  BLOCK; the shuffle transposes ``(n_elements, typesize)`` and copies
  any non-multiple tail verbatim.

The split count is recomputed from the header the way ``blosc_d`` does
(``typesize <= 16 and blocksize//typesize >= 128 and not leftover and
not dont-split``); because that heuristic moved across c-blosc
releases, :func:`decompress_frame` validates that the chosen split
walk consumes the block's bytes exactly and reproduces ``blocksize``
output, and retries with the other split count on mismatch — so frames
from any c-blosc 1.x vintage decode.

The LZ4 inner codec is the standard LZ4 *block* format; tests
cross-check both directions against an independent C implementation
(pyarrow's ``lz4_raw``).  Everything here is executor-side: chunks
decode where the bytes land, in parallel, exactly like the zlib/gzip
path in :mod:`gridded_etl_tools_spark.sources.zarr2`.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class BloscError(ValueError):
    pass


# -- LZ4 block format -------------------------------------------------------

#: pyarrow's lz4_raw codec (C speed) — the hot-path implementation on
#: executors when available; the pure-Python codec below is the
#: zero-dependency fallback AND the independent cross-check in tests.
#: At 100 TB the decode rate difference (~GB/s vs ~MB/s) is the whole
#: game for reading reference stores, so prefer it whenever importable.
try:  # pragma: no cover - exercised via lz4_decompress/lz4_compress
    import pyarrow as _pa

    _LZ4_RAW = _pa.Codec("lz4_raw") if _pa.Codec.is_available("lz4_raw") else None
except Exception:  # noqa: BLE001 - any import/availability failure
    _LZ4_RAW = None


def lz4_decompress(src: bytes, dst_size: int, strict: bool = True) -> bytes:
    """LZ4 block decode — C fast path when pyarrow carries lz4_raw,
    pure-Python otherwise.  With ``strict`` (the default) it raises
    BloscError on a stream that does not decode to EXACTLY ``dst_size``
    (the contract decompress_frame's split-count retry depends on;
    real c-blosc has the same check for free — lz4_wrap_decompress
    rejects ``cbytes != maxout``).

    The C path alone cannot honor that contract: pyarrow's
    ``Codec.decompress(src, dst_size)`` pads a valid-but-short stream
    out to ``dst_size`` with uninitialized bytes instead of raising —
    so a frame whose split layout differs from the header heuristic's
    guess would decode silently to garbage instead of triggering the
    alternate-split retry, and corrupt input could leak heap bytes.

    The exactness check stays in C (the first cut used the Python
    token walk below, which measured ~17x slower than the decode itself
    on match-dense gridded data — unacceptable on the read path): a
    second decompress into a ``dst_size - 1`` buffer MUST fail iff the
    stream's true decoded size is >= dst_size (lz4 raises on output
    overflow), and the successful ``dst_size`` call already proves it
    is <= dst_size — together: exactly dst_size.  A stream that FITS
    dst_size - 1 is short (its dst_size output was padded), so that
    success path raises BloscError.  At ``dst_size == 1`` the probe
    buffer would be 0 bytes, where pyarrow's failure is ambiguous
    (overflow vs. reject-empty), so that case validates via the exact
    token walk instead — such streams are bytes-long, the walk is free.

    ``strict=False`` skips the probe: _decode_block uses it after the
    block's own LEAD compressed stream has probe-confirmed the split
    layout, which amortizes the ~2x probe cost to ~1/nsplits on the
    100 TB read path while keeping the retry contract sound per block.
    """
    if _LZ4_RAW is not None:
        if dst_size == 0:
            if lz4_decoded_length(src) != 0:
                raise BloscError("LZ4: nonempty stream for empty block")
            return b""
        try:
            out = _LZ4_RAW.decompress(src, dst_size, asbytes=True)
        except Exception as exc:  # noqa: BLE001 - ArrowInvalid etc.
            raise BloscError(f"LZ4: {exc}") from exc
        if not strict:
            return out
        if dst_size == 1:
            if lz4_decoded_length(src) != 1:
                raise BloscError("LZ4: stream is not a 1-byte block")
            return out
        try:
            _LZ4_RAW.decompress(src, dst_size - 1)
        except Exception:  # noqa: BLE001 - output overflow: expected
            return out
        raise BloscError(
            f"LZ4: stream decodes to under {dst_size} bytes "
            "(padded output rejected)"
        )
    return lz4_decompress_block(src, dst_size)


def lz4_decoded_length(src: bytes) -> int:
    """Walk an LZ4 block's token/length structure and return the exact
    decoded size WITHOUT producing output — O(#sequences), touching only
    token and extension bytes (literals are skipped by index).  Raises
    :class:`BloscError` on any structural problem (truncated lengths,
    literals past the end, zero or out-of-range match offsets), which
    makes it the validity gate for the C fast path above."""
    i, n, total = 0, len(src), 0
    while i < n:
        token = src[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                if i >= n:
                    raise BloscError("LZ4: truncated literal length")
                b = src[i]
                i += 1
                ll += b
                if b != 255:
                    break
        if i + ll > n:
            raise BloscError("LZ4: literals past end of block")
        total += ll
        i += ll
        if i == n:
            break  # last sequence carries literals only
        if i + 2 > n:
            raise BloscError("LZ4: truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > total:
            raise BloscError(f"LZ4: bad match offset {offset} at {total}")
        ml = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if i >= n:
                    raise BloscError("LZ4: truncated match length")
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        total += ml
    return total


def lz4_compress(src: bytes) -> bytes:
    """LZ4 block encode — C fast path when available (the sink's write
    throughput), pure-Python greedy encoder otherwise."""
    if _LZ4_RAW is not None:
        return _LZ4_RAW.compress(src, asbytes=True)
    return lz4_compress_block(src)


def lz4_decompress_block(src: bytes, dst_size: int) -> bytes:
    """Decode one raw LZ4 block (token / literals / offset / match
    sequences) into exactly ``dst_size`` bytes — the pure-Python
    reference implementation (also the test-time cross-check for the
    C path)."""
    dst = bytearray()
    i, n = 0, len(src)
    if dst_size == 0 and n == 0:
        return b""  # an empty block may also encode as one 0x00 token
    while i < n:
        token = src[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                if i >= n:
                    raise BloscError("LZ4: truncated literal length")
                b = src[i]
                i += 1
                ll += b
                if b != 255:
                    break
        if i + ll > n:
            raise BloscError("LZ4: literals past end of block")
        dst += src[i:i + ll]
        i += ll
        if i == n:
            break  # last sequence carries literals only
        if i + 2 > n:
            raise BloscError("LZ4: truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(dst):
            raise BloscError(f"LZ4: bad match offset {offset} at {len(dst)}")
        ml = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if i >= n:
                    raise BloscError("LZ4: truncated match length")
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        start = len(dst) - offset
        if offset >= ml:
            dst += dst[start:start + ml]
        else:
            # overlapping match = repeating pattern of length `offset`
            pattern = bytes(dst[start:])
            reps = -(-ml // offset)
            dst += (pattern * reps)[:ml]
        if len(dst) > dst_size:
            raise BloscError(
                f"LZ4: block overruns {dst_size} bytes ({len(dst)})"
            )
    if len(dst) != dst_size:
        raise BloscError(f"LZ4: decoded {len(dst)} bytes, expected {dst_size}")
    return bytes(dst)


def _emit_length(out: bytearray, rem: int) -> None:
    while rem >= 255:
        out.append(255)
        rem -= 255
    out.append(rem)


def lz4_compress_block(src: bytes) -> bytes:
    """Greedy LZ4 block encoder (fixture/sink writer — correctness over
    ratio): hash 4-byte prefixes, extend matches, honor the spec's end
    rules (last 5 bytes literal, no match starting in the last 12)."""
    n = len(src)
    out = bytearray()
    anchor = 0
    if n >= 13:
        table: dict[bytes, int] = {}
        i = 0
        limit = n - 12  # last legal match start
        while i <= limit:
            seq = src[i:i + 4]
            j = table.get(seq, -1)
            table[seq] = i
            if j < 0 or i - j > 0xFFFF or src[j:j + 4] != seq:
                i += 1
                continue
            mlen = 4
            max_end = n - 5
            while i + mlen < max_end and src[j + mlen] == src[i + mlen]:
                mlen += 1
            lits = src[anchor:i]
            ll, ml = len(lits), mlen - 4
            out.append((min(ll, 15) << 4) | min(ml, 15))
            if ll >= 15:
                _emit_length(out, ll - 15)
            out += lits
            out += struct.pack("<H", i - j)
            if ml >= 15:
                _emit_length(out, ml - 15)
            i += mlen
            anchor = i
    lits = src[anchor:]
    out.append(min(len(lits), 15) << 4)
    if len(lits) >= 15:
        _emit_length(out, len(lits) - 15)
    out += lits
    return bytes(out)


# -- blosclz codec (c-blosc cname 0, its historical DEFAULT) ----------------
#
# blosclz is c-blosc's own LZ77 variant (blosclz.c), a fork of FastLZ
# whose DECODE format is byte-identical to FastLZ level 2: 3-bit match
# length field with a multi-byte (while code==255) extension, 13-bit
# match distance stored as distance-1, and a 16-bit far-distance escape
# when the low distance byte is 255 and the high field is 31
# (MAX_DISTANCE 8191; far distance = ofs16 + 8192).  The first control
# byte is masked &31 (FastLZ puts its level marker in the top 3 bits).
# Old archives written before c-blosc changed its default cname to lz4
# hit this codec first, so decode support is required for reading them;
# there is no C implementation in this container, so this is the
# correct-but-Python path — production reads of blosclz-heavy archives
# should re-encode to lz4 (the sink does) for the C fast path.


def blosclz_decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one blosclz stream into exactly ``dst_size`` bytes.
    Raises :class:`BloscError` on any structural problem — same error
    contract as :func:`lz4_decompress` (the split-count retry in
    :func:`decompress_frame` depends on it)."""
    n = len(src)
    if dst_size == 0 and n == 0:
        return b""
    if n == 0:
        raise BloscError("blosclz: empty stream")
    dst = bytearray()
    i = 0
    ctrl = src[i] & 31
    i += 1
    while True:
        if ctrl >= 32:
            # match: field (ctrl>>5) in 1..7 -> base length field-1
            mlen = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if mlen == 6:  # field 7: multi-byte extension
                while True:
                    if i >= n:
                        raise BloscError("blosclz: truncated match length")
                    code = src[i]
                    i += 1
                    mlen += code
                    if code != 255:
                        break
            if i >= n:
                raise BloscError("blosclz: truncated match distance")
            code = src[i]
            i += 1
            mlen += 3
            distance = ofs + code + 1
            if code == 255 and ofs == (31 << 8):
                # far match: 16-bit big-endian offset + MAX_DISTANCE
                if i + 2 > n:
                    raise BloscError("blosclz: truncated far distance")
                distance = ((src[i] << 8) | src[i + 1]) + 8192
                i += 2
            if distance > len(dst):
                raise BloscError(
                    f"blosclz: match distance {distance} at {len(dst)}"
                )
            if len(dst) + mlen > dst_size:
                raise BloscError(
                    f"blosclz: output overruns {dst_size} bytes"
                )
            start = len(dst) - distance
            if distance >= mlen:
                dst += dst[start:start + mlen]
            else:
                # overlapping match = repeating pattern (incl. the
                # distance-1 RLE run blosclz emits for byte repeats)
                pattern = bytes(dst[start:])
                reps = -(-mlen // distance)
                dst += (pattern * reps)[:mlen]
        else:
            lits = ctrl + 1
            if i + lits > n:
                raise BloscError("blosclz: literals past end of stream")
            if len(dst) + lits > dst_size:
                raise BloscError(
                    f"blosclz: output overruns {dst_size} bytes"
                )
            dst += src[i:i + lits]
            i += lits
        if i >= n:
            break
        ctrl = src[i]
        i += 1
    if len(dst) != dst_size:
        raise BloscError(
            f"blosclz: decoded {len(dst)} bytes, expected {dst_size}"
        )
    return bytes(dst)


def blosclz_compress(src: bytes) -> bytes:
    """Greedy blosclz encoder (fixture writer / decode cross-check —
    correctness over ratio, exactly like :func:`lz4_compress_block`).
    Emits the full format surface the decoder must handle: literal runs
    (max 32), short and extended match lengths, near and FAR distances,
    and distance-1 RLE runs."""
    n = len(src)
    out = bytearray()
    anchor = 0

    def _flush_literals(upto: int) -> None:
        nonlocal out
        a = anchor
        while a < upto:
            run = min(32, upto - a)
            out.append(run - 1)
            out += src[a:a + run]
            a += run

    def _emit_match(dist: int, length: int) -> None:
        # dist >= 1, length >= 3; stored distance = dist-1
        nonlocal out
        stored = dist - 1
        far = stored >= 8191  # 8191 is the far-escape marker itself
        if far:
            hi, lo = 31, 255
        else:
            hi, lo = stored >> 8, stored & 255
        rem = length - 3  # base length units past the 3-byte minimum
        if rem < 6:
            out.append(((rem + 1) << 5) | hi)
        else:
            out.append((7 << 5) | hi)
            rem -= 6
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.append(lo)
        if far:
            ofs16 = dist - 8192
            out += bytes([ofs16 >> 8, ofs16 & 255])

    if n >= 4:
        table: dict[bytes, int] = {}
        i = 0
        # leave the last 3 bytes as literals (no match can start there)
        while i <= n - 4:
            seq = src[i:i + 3]
            j = table.get(seq, -1)
            table[seq] = i
            dist = i - j
            # far form encodes dist-8192 in 16 bits -> max 8192+65535
            if j < 0 or dist > 8192 + 65535 or src[j:j + 3] != seq:
                i += 1
                continue
            mlen = 3
            while i + mlen < n and src[j + mlen] == src[i + mlen]:
                mlen += 1
            _flush_literals(i)
            _emit_match(dist, mlen)
            i += mlen
            anchor = i
    _flush_literals(n)
    return bytes(out)  # empty input encodes as the empty stream


# -- byte shuffle filter ----------------------------------------------------


def shuffle_bytes(data: bytes, typesize: int) -> bytes:
    """c-blosc byte shuffle: transpose (n_elements, typesize) so each
    element-byte position becomes one contiguous stream; bytes past the
    last whole element are copied verbatim."""
    if typesize <= 1 or len(data) < typesize:
        return data
    body = len(data) - len(data) % typesize
    arr = np.frombuffer(data[:body], dtype=np.uint8)
    shuffled = arr.reshape(-1, typesize).T.tobytes()
    return shuffled + data[body:]


def unshuffle_bytes(data: bytes, typesize: int) -> bytes:
    if typesize <= 1 or len(data) < typesize:
        return data
    body = len(data) - len(data) % typesize
    arr = np.frombuffer(data[:body], dtype=np.uint8)
    unshuffled = arr.reshape(typesize, -1).T.tobytes()
    return unshuffled + data[body:]


# -- bit shuffle filter (c-blosc flag 0x4) -----------------------------------
#
# c-blosc delegates to the bitshuffle library (kiyo-masui/bitshuffle,
# vendored as internal-complibs/bitshuffle*): shuffle.c's ``bitshuffle()``
# trims the element count to a multiple of 8, runs
# ``bshuf_trans_bit_elem(src, dst, size, typesize, tmp)`` ONCE over the
# whole trimmed block and copies the tail verbatim.  NOTE it calls the
# per-block kernel directly — NOT ``bshuf_bitshuffle``, the standalone
# library's public API that additionally splits the input into
# independent ~8192-byte sub-blocks; c-blosc frames therefore have no
# sub-block boundary inside a blosc block (round-9 advice: the earlier
# sub-blocked layout here silently diverged from real c-blosc whenever
# blosc blocksize > ~8 KB, i.e. at the 32-256 KB c-blosc defaults).
# The transform is bshuf_trans_bit_elem: a byte transpose
# (n, typesize)->(typesize, n), then an LSB-first bit gather over each
# group of 8 bytes, then a regroup of the 8 bit-rows per byte position —
# net effect: output position (byte j, bit b, group g) packs bit b of
# byte j of elements 8g..8g+7, LSB-first.  Both directions below are
# whole-array numpy (unpackbits/packbits with bitorder="little"), not
# per-bit Python: common int16 satellite/radar archives use this filter,
# so the transform sits on the 100 TB read path next to the LZ4 decode.


def _trans_bit_elem(chunk: np.ndarray, elem_size: int) -> np.ndarray:
    """bshuf_trans_bit_elem over one bshuf sub-block (nelem % 8 == 0)."""
    nelem = chunk.size // elem_size
    bits = np.unpackbits(
        chunk.reshape(nelem, elem_size), axis=1, bitorder="little"
    )
    bits = bits.reshape(nelem, elem_size, 8).transpose(1, 2, 0)
    return np.packbits(bits, axis=-1, bitorder="little").reshape(-1)


def _untrans_bit_elem(chunk: np.ndarray, elem_size: int) -> np.ndarray:
    nelem = chunk.size // elem_size
    bits = np.unpackbits(
        chunk.reshape(elem_size, 8, nelem // 8), axis=-1, bitorder="little"
    )
    bits = bits.transpose(2, 0, 1).reshape(nelem, elem_size * 8)
    return np.packbits(bits, axis=1, bitorder="little").reshape(-1)


def _bitshuffle_blocked(data: bytes, typesize: int, fun) -> bytes:
    """shuffle.c ``bitshuffle()``: one whole-block bshuf_trans_bit_elem
    over the 8-element-trimmed prefix, verbatim tail.  No sub-blocking —
    that belongs to the standalone library's bshuf_bitshuffle, which
    c-blosc never calls."""
    if typesize < 1 or len(data) < typesize * 8:
        return data
    arr = np.frombuffer(data, dtype=np.uint8)
    size = arr.size // typesize
    size -= size % 8  # shuffle.c trims to whole groups of 8 elements
    tail = size * typesize
    out = bytearray(len(data))
    out[:tail] = fun(arr[:tail], typesize).tobytes()
    out[tail:] = data[tail:]  # verbatim tail (non-multiple-of-8 elements)
    return bytes(out)


def bitshuffle_bytes(data: bytes, typesize: int) -> bytes:
    """c-blosc bit-shuffle filter, forward direction (encoder side)."""
    return _bitshuffle_blocked(data, typesize, _trans_bit_elem)


def bitunshuffle_bytes(data: bytes, typesize: int) -> bytes:
    """Inverse of :func:`bitshuffle_bytes` (decoder side)."""
    return _bitshuffle_blocked(data, typesize, _untrans_bit_elem)


# -- blosc1 frame container -------------------------------------------------

_FLAG_SHUFFLE = 0x1
_FLAG_MEMCPYED = 0x2
_FLAG_BITSHUFFLE = 0x4
_FLAG_DODELTA = 0x8  # blosc_set_delta: XOR-vs-reference filter (refused)
_FLAG_DONT_SPLIT = 0x10
#: inner codec ids (c-blosc blosc.h format codes).  blosclz/lz4/zlib
#: always decode (pure Python implementations exist); snappy/zstd decode
#: through pyarrow's C codecs when available
_CODEC_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_MAX_SPLITS = 16
_MIN_BUFFERSIZE = 128
_VERSION_FORMAT = 2  # BLOSC_VERSION_FORMAT


def _split_count(typesize: int, bsize: int, leftover: bool, dont_split: bool) -> int:
    if (
        typesize <= _MAX_SPLITS
        and typesize > 0
        and bsize // typesize >= _MIN_BUFFERSIZE
        and not leftover
        and not dont_split
    ):
        return typesize
    return 1


_PA_CODECS: dict[str, object] = {}


def _pa_codec(name: str):
    """Resolve (once per process) a pyarrow codec by name — called per
    split stream, so the instance is cached like _LZ4_RAW."""
    if name not in _PA_CODECS:
        codec = None
        try:
            import pyarrow as pa

            if pa.Codec.is_available(name):
                codec = pa.Codec(name)
        except Exception:  # noqa: BLE001 - treat any failure as unavailable
            codec = None
        _PA_CODECS[name] = codec
    return _PA_CODECS[name]


def _decode_stream(
    codec: int, payload: bytes, out_size: int, strict: bool = True
) -> bytes:
    if codec == 0:
        return blosclz_decompress(payload, out_size)
    if codec == 1:
        return lz4_decompress(payload, out_size, strict=strict)
    if codec == 3:
        try:
            got = zlib.decompress(payload)
        except zlib.error as exc:
            # BloscError is the module's error contract AND what the
            # alternate-split-count retry in decompress_frame catches
            raise BloscError(f"zlib: {exc}") from exc
        if len(got) != out_size:
            raise BloscError(f"zlib: {len(got)} bytes, expected {out_size}")
        return got
    name = _CODEC_NAMES[codec]
    pa_codec = _pa_codec(name)
    if pa_codec is None:
        raise BloscError(
            f"blosc inner codec {name!r} needs pyarrow's {name} support, "
            "which this environment lacks"
        )
    try:
        got = pa_codec.decompress(payload, out_size, asbytes=True)
    except Exception as exc:  # noqa: BLE001 - ArrowInvalid etc.
        raise BloscError(f"{name}: {exc}") from exc
    if len(got) != out_size:
        raise BloscError(f"{name}: {len(got)} bytes, expected {out_size}")
    return got


def _decode_block(
    frame: bytes,
    start: int,
    bsize: int,
    nsplits: int,
    codec: int,
) -> bytes:
    """One block: walk ``nsplits`` (uint32 size, stream) pairs.  Raises
    on any inconsistency so the caller can retry the other split count.

    Strictness policy (r10, replacing r9's per-frame memo after review
    found two holes in it): the FIRST compressed stream of EVERY block
    runs the probe-guarded exact-length lz4 path; later streams of the
    same block skip the ~2x probe.  This (a) keeps the split-count
    retry sound per block — a wrong layout fails at the block's own
    lead stream, and a failed attempt cannot poison any later block
    (the old frame-wide memo survived the retry path, so one
    coincidental pass under the wrong layout disabled strictness for
    the rest of the frame); (b) bounds the probe cost at ~1/nsplits of
    per-stream probing (~3% of frame decode at typesize 8, vs the ~25%
    the r9 advice measured).  Residual trade, documented: a CORRUPT
    stream that decodes short in a non-lead split of a block is padded
    silently (total block length still gates in decode_chunk); real
    c-blosc rejects it, so archives that fail there may decode here —
    run the pure-Python path for forensic strictness."""
    out = bytearray()
    pos = start
    neblock = bsize // nsplits
    sizes = [neblock] * nsplits
    sizes[-1] += bsize - neblock * nsplits
    strict = True
    for esize in sizes:
        if pos + 4 > len(frame):
            raise BloscError("blosc: truncated split header")
        (csize,) = struct.unpack_from("<I", frame, pos)
        pos += 4
        if pos + csize > len(frame):
            raise BloscError("blosc: split stream past frame end")
        payload = frame[pos:pos + csize]
        pos += csize
        if csize == esize:
            out += payload  # stored raw (compression did not help)
        else:
            out += _decode_stream(codec, payload, esize, strict=strict)
            strict = False  # lead compressed stream validated the layout
    return bytes(out)


def decompress_frame(frame: bytes) -> bytes:
    """Full c-blosc1 chunk decode: header → blocks → splits → inner
    codec → per-block unshuffle."""
    if len(frame) < 16:
        raise BloscError(f"blosc frame shorter than header ({len(frame)}B)")
    version, _versionlz, flags, typesize = frame[0], frame[1], frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    if version < 1 or version > 3:
        raise BloscError(f"blosc format version {version} unsupported")
    if len(frame) < cbytes:
        raise BloscError(f"blosc frame truncated: {len(frame)} < cbytes {cbytes}")
    if flags & _FLAG_BITSHUFFLE and flags & _FLAG_SHUFFLE:
        raise BloscError("blosc frame claims both byte- and bit-shuffle")
    if flags & _FLAG_DODELTA:
        # blosc_set_delta frames XOR each chunk against a reference
        # buffer this reader does not have; ignoring the flag would
        # decode to silent garbage, so refuse loudly
        raise BloscError(
            "blosc delta filter (blosc_set_delta) unsupported — "
            "re-encode without delta"
        )
    if nbytes == 0:
        return b""
    if flags & _FLAG_MEMCPYED:
        if 16 + nbytes > len(frame):
            raise BloscError("blosc memcpy frame shorter than nbytes")
        return bytes(frame[16:16 + nbytes])
    codec = flags >> 5
    if codec not in _CODEC_NAMES:
        raise BloscError(
            f"blosc inner codec id {codec} unsupported (blosclz/lz4/zlib "
            "decode natively, zstd/snappy via pyarrow)"
        )
    if blocksize == 0:
        raise BloscError("blosc: zero blocksize in non-memcpy frame")
    nblocks = -(-nbytes // blocksize)
    table_end = 16 + 4 * nblocks
    if table_end > len(frame):
        raise BloscError("blosc: truncated block-offset table")
    bstarts = struct.unpack_from(f"<{nblocks}I", frame, 16)
    dont_split = bool(flags & _FLAG_DONT_SPLIT)
    shuffled = bool(flags & _FLAG_SHUFFLE)
    out = bytearray()
    leftover = nbytes % blocksize
    for bi, bstart in enumerate(bstarts):
        is_leftover = bi == nblocks - 1 and leftover != 0
        bsize = leftover if is_leftover else blocksize
        if bstart < table_end or bstart >= len(frame):
            raise BloscError(f"blosc: block offset {bstart} out of range")
        nsplits = _split_count(typesize, bsize, is_leftover, dont_split)
        try:
            block = _decode_block(frame, bstart, bsize, nsplits, codec)
        except BloscError:
            # the split heuristic moved across c-blosc releases; the
            # stream layout self-describes enough to try the other one
            alt = 1 if nsplits != 1 else typesize
            if alt == nsplits or alt < 1:
                raise
            block = _decode_block(frame, bstart, bsize, alt, codec)
        if shuffled:
            block = unshuffle_bytes(block, typesize)
        elif flags & _FLAG_BITSHUFFLE:
            block = bitunshuffle_bytes(block, typesize)
        out += block
    if len(out) != nbytes:
        raise BloscError(f"blosc: decoded {len(out)} bytes, expected {nbytes}")
    return bytes(out)


def compress_frame(
    data: bytes,
    typesize: int,
    cname: str = "lz4",
    shuffle: bool | int | str = True,
    blocksize: int = 0,
    split: bool = True,
    clevel: int = 5,
) -> bytes:
    """Encode a c-blosc1 frame (fixture writer + native sink).  Mirrors
    ``blosc_c``: per-block shuffle, split into ``typesize`` streams when
    the header rule triggers, store-raw fallback per stream, memcpy
    fallback for incompressible buffers.

    ``shuffle`` takes the numcodecs convention: 0/False = none,
    1/True = byte-shuffle, 2 = bit-shuffle (also the strings
    "noshuffle"/"shuffle"/"bitshuffle" that zarr v3 codec configs use).
    """
    shuffle = {
        "noshuffle": 0, "shuffle": 1, "bitshuffle": 2,
        False: 0, True: 1, 0: 0, 1: 1, 2: 2,
    }.get(shuffle)
    if shuffle is None:
        raise BloscError("shuffle must be 0/1/2 or noshuffle/shuffle/bitshuffle")
    codec = {
        "blosclz": 0, "lz4": 1, "lz4hc": 1, "snappy": 2, "zlib": 3, "zstd": 4,
    }.get(cname)
    if codec is None:
        raise BloscError(f"unsupported blosc cname {cname!r}")
    if codec in (2, 4) and _pa_codec(_CODEC_NAMES[codec]) is None:
        raise BloscError(
            f"blosc cname {cname!r} needs pyarrow's codec support"
        )
    if typesize < 1 or typesize > 255:
        typesize = 1
    nbytes = len(data)
    if blocksize <= 0:
        blocksize = min(max(nbytes, 1), 1 << 16)
    # round down to a typesize multiple (clean per-block shuffle/split
    # boundaries), then clamp into [typesize, nbytes]; the nbytes clamp
    # can break the multiple only in the single-block case, where the
    # shuffle's tail copy and nsplits=1 handle the remainder
    blocksize = max(blocksize - blocksize % typesize, typesize)
    blocksize = min(blocksize, max(nbytes, 1))
    flags = codec << 5
    if shuffle == 1 and typesize > 1:
        flags |= _FLAG_SHUFFLE
    elif shuffle == 2:
        # bit-shuffle applies at typesize 1 too (a bit transpose of
        # bytes) — blosc_compress accepts BITSHUFFLE for any typesize
        flags |= _FLAG_BITSHUFFLE
    if not split:
        flags |= _FLAG_DONT_SPLIT

    def _compress_stream(raw: bytes) -> bytes:
        if codec == 0:
            return blosclz_compress(raw)
        if codec == 1:
            return lz4_compress(raw)
        if codec == 3:
            return zlib.compress(raw, clevel)
        return _pa_codec(_CODEC_NAMES[codec]).compress(raw, asbytes=True)

    nblocks = -(-nbytes // blocksize) if nbytes else 0
    leftover = nbytes % blocksize
    body = bytearray()
    bstarts: list[int] = []
    table_end = 16 + 4 * nblocks
    for bi in range(nblocks):
        is_leftover = bi == nblocks - 1 and leftover != 0
        bsize = leftover if is_leftover else blocksize
        block = data[bi * blocksize:bi * blocksize + bsize]
        if flags & _FLAG_SHUFFLE:
            block = shuffle_bytes(block, typesize)
        elif flags & _FLAG_BITSHUFFLE:
            block = bitshuffle_bytes(block, typesize)
        nsplits = _split_count(
            typesize, bsize, is_leftover, bool(flags & _FLAG_DONT_SPLIT)
        )
        neblock = bsize // nsplits
        sizes = [neblock] * nsplits
        sizes[-1] += bsize - neblock * nsplits
        bstarts.append(table_end + len(body))
        pos = 0
        for esize in sizes:
            raw = block[pos:pos + esize]
            pos += esize
            comp = _compress_stream(raw)
            if len(comp) >= esize:
                comp = raw  # store raw; decoder keys on csize == esize
            body += struct.pack("<I", len(comp)) + comp
    cbytes = table_end + len(body)
    if cbytes >= nbytes + 16 and nbytes:
        # incompressible: memcpy mode, raw original buffer, no filters
        header = struct.pack(
            "<BBBBIII", _VERSION_FORMAT, 1, codec << 5 | _FLAG_MEMCPYED,
            typesize, nbytes, blocksize, nbytes + 16,
        )
        return header + data
    header = struct.pack(
        "<BBBBIII", _VERSION_FORMAT, 1, flags, typesize,
        nbytes, blocksize, cbytes,
    )
    return header + struct.pack(f"<{nblocks}I", *bstarts) + bytes(body)
