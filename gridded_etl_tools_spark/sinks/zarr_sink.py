"""Distributed Zarr v2 sink: Spark-parallel chunk writes with a
metadata-last commit.

Reference parity: ``publish.py:155-240`` wraps ``xr.Dataset.to_zarr`` —
dask workers write chunk files, then zarr finalizes metadata.  The Spark
re-expression: ONE shuffle keys every cell by its chunk, each chunk group
encodes + compresses + writes its own chunk file on the executor
(``applyInPandas``), and the driver writes ``.zarray``/``.zmetadata``
only after the job action succeeds — so a reader never resolves a chunk
the metadata doesn't cover, the same metadata-last ordering
``sinks/table.py``'s manifest commit and ``zarr2.append_time_chunks``
use.

Scale design:

* The shuffle key is the chunk id — exactly the co-location the write
  needs, and the ONLY full-data movement.  100 TB in long form becomes
  millions of chunk groups spread over every executor; no driver
  involvement per chunk.
* Dimension axes are dimension-sized; they are collected once
  driver-side (the same eager-coords trade ``xr.open_zarr`` makes) and
  shipped back as index maps in the closure.
* Each group materializes only its own chunk ndarray (chunk-sized
  memory, the knob the caller sets via ``chunks``), fills gaps with the
  fill value, and writes one file — append-friendly object-store I/O.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gridded_etl_tools_spark.sources import zarr2


def write_zarr_distributed(
    df: DataFrame,
    root: str,
    data_var: str,
    dims: Sequence[str],
    value_col: str = "value",
    chunks: Sequence[int] | None = None,
    fill_value: float = float("nan"),
    compressor: str | None = "zlib",
    attrs: dict | None = None,
    zarr_format: int = 2,
) -> dict:
    """Write a long-form frame (one row per grid cell) as a Zarr v2
    (default) or v3 store.  Returns a summary {n_chunks, n_cells,
    shape}.

    ``zarr_format=3`` writes the OTHER metadata generation the
    reference tolerates (store.py:249-271 format flags): a root
    ``zarr.json`` group node, per-array ``zarr.json`` with a regular
    chunk grid + bytes/gzip codec chain, and ``c/i/j`` default
    chunk-key paths.  v3 has no zlib codec, so the v2 default
    compressor transparently upgrades to gzip (both inflate with the
    same decoder); the chunk-write parallelism and metadata-last
    ordering are identical across generations.

    Cells absent from ``df`` become ``fill_value`` (decoded back as NULL
    by ``zarr2.decode_zarr_long`` when the fill is NaN or matches
    ``_FillValue``).  Duplicate cells raise — a dedup/combine_first pass
    belongs upstream, matching the reference's pre-write QC gating.
    """
    if zarr_format not in (2, 3):
        raise ValueError("zarr_format must be 2 or 3")
    if zarr_format == 3 and compressor == "zlib":
        compressor = "gzip"  # v3's codec registry has gzip, not zlib
    dims = list(dims)
    spark = df.sparkSession
    # 1. axes: sorted distinct per dim — dimension-sized driver state
    axes: dict[str, np.ndarray] = {}
    for d in dims:
        vals = [r[0] for r in df.select(d).distinct().orderBy(d).collect()]
        axes[d] = np.asarray(vals, dtype="f8")
    shape = tuple(axes[d].size for d in dims)
    cshape = tuple(chunks) if chunks else shape
    if len(cshape) != len(dims):
        raise ValueError("chunks rank must match dims")

    dtype = np.dtype("<f8")

    # 2. key each cell by chunk id: broadcast-join each dim against its
    # (value -> axis index) table — dimension-sized build sides, all
    # JVM-side (no Python in the keying hot path); equality is exact
    # because the axis values came from distinct() of this very column
    keyed = df.select(
        *[F.col(d).cast("double").alias(d) for d in dims],
        F.col(value_col).cast("double").alias("__v"),
    )
    for i, d in enumerate(dims):
        ax_tbl = spark.createDataFrame(
            [(float(v), j) for j, v in enumerate(axes[d])],
            schema=T.StructType(
                [
                    T.StructField(d, T.DoubleType(), False),
                    T.StructField(f"__i{i}", T.IntegerType(), False),
                ]
            ),
        )
        keyed = keyed.join(F.broadcast(ax_tbl), on=d, how="inner")
    keyed = keyed.withColumn(
        "__ckey",
        F.concat_ws(
            ".",
            *[
                F.floor(F.col(f"__i{i}") / cshape[i]).cast("int")
                for i in range(len(dims))
            ],
        ),
    )

    os.makedirs(os.path.join(root, data_var), exist_ok=True)
    fill = fill_value

    out_schema = T.StructType(
        [
            T.StructField("chunk", T.StringType()),
            T.StructField("n_cells", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    v3 = zarr_format == 3

    def _write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import gzip as _gzip
        import zlib as _zlib

        idx = tuple(int(p) for p in pdf["__ckey"].iloc[0].split("."))
        block = np.full(cshape, fill, dtype=dtype)
        offsets = [
            pdf[f"__i{i}"].to_numpy() - idx[i] * cshape[i]
            for i in range(len(dims))
        ]
        flat = np.ravel_multi_index(tuple(offsets), cshape)
        if np.unique(flat).size != flat.size:
            raise ValueError(
                f"duplicate cells in chunk {idx} — dedup upstream"
            )
        block.reshape(-1)[flat] = pdf["__v"].to_numpy()
        raw = block.tobytes(order="C")
        if compressor == "zlib":
            raw = _zlib.compress(raw, 5)
        elif compressor == "gzip":
            raw = _gzip.compress(raw, 5)
        if v3:  # default chunk-key encoding: c/<i>/<j>/...
            rel = "c/" + "/".join(str(i) for i in idx)
            os.makedirs(
                os.path.dirname(os.path.join(root, data_var, rel)),
                exist_ok=True,
            )
        else:
            rel = ".".join(str(i) for i in idx)
        dest = os.path.join(root, data_var, rel)
        tmp = os.path.join(
            os.path.dirname(dest), f".{os.path.basename(dest)}.tmp-{os.getpid()}"
        )
        with open(tmp, "wb") as f:
            f.write(raw)
        os.replace(tmp, dest)
        return pd.DataFrame(
            {"chunk": [rel], "n_cells": [len(pdf)], "n_bytes": [len(raw)]}
        )

    # 3. the one shuffle: group cells by chunk, write each chunk where
    # its group lands
    written = (
        keyed.groupBy("__ckey").applyInPandas(_write_group, out_schema).collect()
    )

    # 4. metadata-last commit (readers resolve chunks only after this):
    # axis arrays + group metadata via the single-process writer (axes
    # are dimension-sized), then the data variable's metadata by hand —
    # its chunks were already written in parallel above
    import json as _json

    if v3:
        level = 5

        def _v3_meta(shape_, cshape_, dim_names, extra_attrs):
            codecs = [
                {"name": "bytes", "configuration": {"endian": "little"}}
            ]
            if compressor == "gzip":
                codecs.append(
                    {"name": "gzip", "configuration": {"level": level}}
                )
            return {
                "zarr_format": 3,
                "node_type": "array",
                "shape": list(shape_),
                "data_type": "float64",
                "chunk_grid": {
                    "name": "regular",
                    "configuration": {"chunk_shape": list(cshape_)},
                },
                "chunk_key_encoding": {
                    "name": "default",
                    "configuration": {"separator": "/"},
                },
                "fill_value": zarr2._encode_fill(fill),
                "codecs": codecs,
                "dimension_names": dim_names,
                "attributes": extra_attrs,
            }

        import gzip as _gzip

        for d in dims:  # dimension-sized single-chunk axis arrays
            ddir = os.path.join(root, d, "c")
            os.makedirs(ddir, exist_ok=True)
            raw = axes[d].astype("<f8").tobytes()
            if compressor == "gzip":
                raw = _gzip.compress(raw, level)
            with open(os.path.join(ddir, "0"), "wb") as f:
                f.write(raw)
            with open(os.path.join(root, d, "zarr.json"), "w") as f:
                _json.dump(
                    _v3_meta((axes[d].size,), (axes[d].size,), [d], {}), f
                )
        with open(os.path.join(root, data_var, "zarr.json"), "w") as f:
            _json.dump(_v3_meta(shape, cshape, dims, attrs or {}), f)
        # the root group node LAST: open_store's v3 detection keys on it,
        # so a reader never sees the store before it is complete
        with open(os.path.join(root, "zarr.json"), "w") as f:
            _json.dump(
                {"zarr_format": 3, "node_type": "group", "attributes": {}}, f
            )
        return {
            "n_chunks": len(written),
            "n_cells": int(sum(r.n_cells for r in written)),
            "shape": shape,
        }

    zarr2.write_zarr_store(
        root,
        variables={d: ((d,), axes[d], {}) for d in dims},
        compressor=compressor,
        consolidated=False,
    )

    zarray = {
        "zarr_format": 2,
        "shape": list(shape),
        "chunks": list(cshape),
        "dtype": dtype.str,
        "compressor": {"id": compressor, "level": 5} if compressor else None,
        "fill_value": zarr2._encode_fill(fill),
        "order": "C",
        "filters": None,
        "dimension_separator": ".",
    }
    zattrs = {"_ARRAY_DIMENSIONS": dims, **(attrs or {})}
    with open(os.path.join(root, data_var, ".zarray"), "w") as f:
        _json.dump(zarray, f)
    with open(os.path.join(root, data_var, ".zattrs"), "w") as f:
        _json.dump(zattrs, f)
    consolidated = {".zgroup": {"zarr_format": 2}}
    for name in [*dims, data_var]:
        with open(os.path.join(root, name, ".zarray")) as f:
            consolidated[f"{name}/.zarray"] = _json.load(f)
        with open(os.path.join(root, name, ".zattrs")) as f:
            consolidated[f"{name}/.zattrs"] = _json.load(f)
    with open(os.path.join(root, ".zmetadata"), "w") as f:
        _json.dump(
            {"zarr_consolidated_format": 1, "metadata": consolidated}, f
        )
    return {
        "n_chunks": len(written),
        "n_cells": int(sum(r.n_cells for r in written)),
        "shape": shape,
    }
