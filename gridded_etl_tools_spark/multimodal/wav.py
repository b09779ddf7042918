"""Real WAV (RIFF PCM16) codec — zero new dependencies.

The audio twin of :mod:`gridded_etl_tools_spark.multimodal.png`: the
container ships no audio libraries, but PCM WAV is a trivial RIFF
container, so the engine decodes REAL audio bytes on executors instead
of stubbing the modality.  ``encode_wav_pcm16`` writes a canonical
mono 16-bit file; ``wav_sample_stats`` walks the RIFF chunk list (it
does not assume canonical layout — readers must tolerate extra chunks
like LIST/INFO and odd-size padding) and decodes the samples to exact
integer statistics.

Everything here is executor-side: the catalog row
``multimodal_audio_decode`` runs encode+decode inside one Arrow-batched
``mapInPandas`` and the oracle recomputes the same statistics from the
waveform's generating formula, so the hash gate certifies the decoder
recovered every actual sample value.
"""

from __future__ import annotations

import struct


def encode_wav_pcm16(samples, sample_rate: int) -> bytes:
    """Mono 16-bit little-endian PCM WAV bytes for an int16 array."""
    data = memoryview(samples.astype("<i2")).tobytes()
    n = len(data)
    header = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH",
        16,            # fmt chunk size
        1,             # PCM
        1,             # mono
        sample_rate,
        sample_rate * 2,  # byte rate
        2,             # block align
        16,            # bits per sample
    )
    return header + fmt + b"data" + struct.pack("<I", n) + data


def wav_sample_stats(payload: bytes) -> dict:
    """REAL decode: RIFF chunk walk -> PCM16 samples -> exact integer
    statistics (sample_rate, n_samples, duration_ms, sample_sum,
    sample_min, sample_max, n_zero_crossings).  A zero crossing is a
    strict sign change between consecutive samples (v[i-1]*v[i] < 0)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        if pos + 8 + size > len(payload):
            # a declared size past the buffer would silently slice a
            # partial body — statistics over truncated samples (ADVICE
            # r7): reject loudly instead
            raise ValueError(
                f"truncated chunk {cid!r}: declares {size} bytes, "
                f"{len(payload) - pos - 8} remain"
            )
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                # a declared-in-bounds but undersized fmt chunk would
                # otherwise die in struct.unpack — same clean rejection
                # as the oversize guard above
                raise ValueError(
                    f"truncated chunk b'fmt ': {len(body)} of 16 bytes"
                )
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or n_channels != 1 or bits != 16:
        raise NotImplementedError(
            f"only mono PCM16 supported (format={audio_format}, "
            f"channels={n_channels}, bits={bits})"
        )
    v = np.frombuffer(data, dtype="<i2").astype(np.int64)
    return {
        "sample_rate": int(sample_rate),
        "n_samples": int(v.size),
        "duration_ms": int(v.size * 1000 // sample_rate),
        "sample_sum": int(v.sum()),
        "sample_min": int(v.min()) if v.size else 0,
        "sample_max": int(v.max()) if v.size else 0,
        "n_zero_crossings": int(((v[:-1] * v[1:]) < 0).sum()),
    }
