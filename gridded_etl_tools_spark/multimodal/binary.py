"""Multimodal binary-column plumbing (north star).

Model: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (media_type, width/height or
sample_rate/duration, codec).  Heavy per-item work (decode, resize,
feature-extract, frame-sample) runs as Arrow-batched Pandas iterators via
``mapInPandas`` — the Spark-side contract (schema, batching, partition
behavior) is real and tested; the actual codecs are stubbed because this
container ships no image/audio libraries.

Stub policy: ``decode_fn=None`` uses :func:`deterministic_fake_decode`
(content-hash-derived features, stable across runs) so pipelines are
testable end-to-end; passing a real decoder (PIL/librosa/ffmpeg wrapper)
swaps in production behavior without touching the Spark plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried next to every payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha", T.StringType(), False),
        # doubles, not floats: the fake decoder's hash-derived values are
        # exact IEEE doubles (uint32 / 2^32), so they cross-check exactly
        # against an engine-independent oracle; a real embedding decoder
        # may narrow to float32 at its own boundary
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def deterministic_fake_decode(payload: bytes, n_features: int = 8) -> list[float]:
    """Stand-in for a real decoder: derives a stable feature vector from
    the content hash.  NOT a real embedding — a deterministic fake so the
    distributed plumbing is testable in codec-less environments."""
    h = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(n_features)
    ]


def real_decode_placeholder(payload: bytes) -> list[float]:
    """Magic-byte front door to the REAL in-repo codecs — one per
    modality, all zero-dependency: PNG images (``multimodal/png.py``,
    zlib inflate + full unfilter), RIFF/PCM16 WAV audio
    (``multimodal/wav.py``, chunk walk + sample stats), and animated
    GIF video (``multimodal/gif.py``, variable-width LZW per frame).
    Each returns a small real-feature vector; see the
    ``multimodal_real_decode`` / ``multimodal_audio_decode`` /
    ``multimodal_video_decode`` catalog rows for the oracle-checked
    exact statistics.  Payloads outside these formats raise — plug a
    library decoder in via ``decode_fn`` where one is available."""
    from gridded_etl_tools_spark.multimodal import gif, png, wav

    if payload[:8] == png._PNG_SIG:
        _w, _h, _c, px = png.decode_png(payload)
        # simple real features: dimensions + global intensity moments
        mean = float(px.mean())
        std = float(px.std())
        return [float(_w), float(_h), float(_c), mean, std]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        s = wav.wav_sample_stats(payload)
        n = max(s["n_samples"], 1)
        return [
            float(s["sample_rate"]),
            float(s["n_samples"]),
            float(s["duration_ms"]),
            s["sample_sum"] / n,                 # mean amplitude
            s["n_zero_crossings"] / n,           # zero-crossing rate
        ]
    if payload[:6] in (b"GIF89a", b"GIF87a"):
        s = gif.gif_frame_stats(payload)
        n_px = max(s["n_frames"] * s["width"] * s["height"], 1)
        return [
            float(s["n_frames"]),
            float(s["width"]),
            float(s["height"]),
            s["pixel_sum"] / n_px,               # mean intensity
            float(s["motion_abs_sum"]),          # motion energy
        ]
    raise NotImplementedError(
        "no codec for this payload type in this environment; PNG, "
        "PCM16 WAV, and animated GIF are supported natively "
        "(multimodal/{png,wav,gif}.py), otherwise pass "
        "decode_fn=deterministic_fake_decode or a real decoder"
    )


def extract_features(
    df: DataFrame,
    id_col: str = "item_id",
    payload_col: str = "payload",
    media_type_col: str = "media_type",
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract every payload with an Arrow-batched
    ``mapInPandas``.  Output schema is fixed (FEATURE_SCHEMA) so
    downstream joins/aggregations plan normally.

    Scale shape: one Python worker per partition streams record batches;
    no payload ever moves to the driver, and partitions remain the unit
    of parallelism — repartition upstream to balance decode skew (a few
    giant videos next to thumbnails), typically by
    ``repartitionByRange(n, F.col('n_bytes'))``."""
    fn = decode_fn or deterministic_fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].astype("int64"),
                    "media_type": pdf[media_type_col].astype(str),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_sha": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "features": payloads.map(fn),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def attach_media_meta(
    df: DataFrame, media_type: str, payload_col: str = "payload"
) -> DataFrame:
    """Attach the typed metadata struct with byte-derived defaults (real
    decoders overwrite dimensions/codec)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ),
    )


def frame_sample_plan(
    df: DataFrame,
    every_n_ms: int,
    duration_col: str = "duration_ms",
    id_col: str = "item_id",
) -> DataFrame:
    """Explode each video row into per-frame work items (item_id,
    frame_ts_ms) — the shuffle-side plan of frame sampling; actual frame
    decode happens in extract_features over the exploded rows."""
    return df.select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col) - 1, F.lit(0)),
                F.lit(every_n_ms),
            )
        ).alias("frame_ts_ms"),
    )
