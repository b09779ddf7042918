#!/usr/bin/env python3
"""A/B: blosc chunk-decode throughput — pyarrow-C LZ4 fast path vs the
pure-Python fallback (round 8).

Why it matters at 100 TB: every chunk of a default-settings reference
store (numcodecs.Blosc = lz4 + byte-shuffle) passes through this decode
on an executor.  The container format (header walk, split streams,
un-shuffle) is the in-repo codec either way; the inner LZ4 streams are
the hot loop, and the C path should carry them at memory-bandwidth-ish
rates while the pure-Python fallback stays the correctness reference.

Measures, on realistic chunk payloads (smooth float64 field, the shape
climate rasters actually have):
  * decompress_frame MB/s with the pyarrow lz4_raw codec (default)
  * decompress_frame MB/s with the codec forced off (pure Python)
  * compress_frame MB/s both ways (the sink's write throughput)

Usage: python scripts/ab_blosc_decode.py [chunk_mb] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from gridded_etl_tools_spark.sources import blosc  # noqa: E402


def _payload(mb: float) -> bytes:
    n = int(mb * (1 << 20) / 8)
    x = np.arange(n, dtype="<f8")
    # smooth field + mild noise: compressible like real rasters
    return (np.sin(x / 50.0) * 100 + (x % 17) * 0.01).tobytes()


def _time_one(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    chunk_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    data = _payload(chunk_mb)
    mb = len(data) / (1 << 20)

    out = {"chunk_mb": round(mb, 2)}
    saved = blosc._LZ4_RAW
    for tag, codec in (("c", saved), ("pure_python", None)):
        blosc._LZ4_RAW = codec
        frame = blosc.compress_frame(data, 8, blocksize=1 << 18)
        assert blosc.decompress_frame(frame) == data
        dt_c = _time_one(lambda: blosc.compress_frame(data, 8, blocksize=1 << 18), reps)
        dt_d = _time_one(lambda f=frame: blosc.decompress_frame(f), reps)
        out[f"{tag}_compress_mb_s"] = round(mb / dt_c, 1)
        out[f"{tag}_decompress_mb_s"] = round(mb / dt_d, 1)
        out[f"{tag}_ratio"] = round(len(frame) / len(data), 3)
    blosc._LZ4_RAW = saved
    out["decode_speedup"] = round(
        out["c_decompress_mb_s"] / out["pure_python_decompress_mb_s"], 1
    )
    out["encode_speedup"] = round(
        out["c_compress_mb_s"] / out["pure_python_compress_mb_s"], 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
