"""Unified gridded-file ingest front door (reference ``kerchunkify``,
``utils/transform.py:119-279``): one call scans a directory of raw
files and decodes EVERY supported format to the common long-form grid
schema, sniffing the format per file from its magic bytes — exactly the
role ``kerchunkify`` plays for the reference (it branches on NetCDF vs
GRIB internally; callers never care which they have).

Formats: HDF5/NetCDF4 (``\\x89HDF`` signature, incl. userblock offsets),
classic NetCDF3 CDF-1/2/5 (``CDF``), GRIB editions 1 and 2 (``GRIB``
magic + the edition octet).

Scale shape: identical to the per-format decoders — whole files decode
on executors via Arrow-batched ``mapInPandas`` over a ``binaryFile``
scan; a mixed directory (e.g. an archive mid-migration from GRIB to
NetCDF4) decodes in one pass with per-file dispatch, no driver
involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gridded_etl_tools_spark.sources import geotiff, grib1, grib2, hdf5, netcdf3
from gridded_etl_tools_spark.sources.files import read_binary_files


class UnknownFormatError(ValueError):
    pass


def sniff_format(buf: bytes) -> str:
    """'hdf5' | 'netcdf3' | 'grib1' | 'grib2' | 'geotiff' from the
    leading bytes (HDF5 also checked at the power-of-two userblock
    offsets)."""
    if buf[:4] == b"\x89HDF":
        return "hdf5"
    if buf[:3] == b"CDF" and len(buf) > 3 and buf[3] in (1, 2, 5):
        return "netcdf3"
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        return "geotiff"
    if buf[:4] == b"GRIB":
        # edition octet: byte 7 both editions (GRIB1 length+edition,
        # GRIB2 reserved+discipline+edition)
        return "grib2" if len(buf) > 7 and buf[7] == 2 else "grib1"
    off = 512
    while off + 8 <= len(buf):
        if buf[off : off + 8] == hdf5._MAGIC:
            return "hdf5"
        off *= 2
    raise UnknownFormatError(
        f"unrecognized gridded file format (leading bytes {buf[:4]!r})"
    )


def _frame_for(buf: bytes, data_var: str, dims: list[str]) -> pd.DataFrame:
    fmt = sniff_format(buf)
    if fmt == "hdf5":
        return hdf5.netcdf4_long_frame(buf, data_var)
    if fmt == "netcdf3":
        return netcdf3.netcdf3_long_frame(buf, data_var)
    # GRIB has no variable names; its long frame is already
    # (time, latitude, longitude, value)
    if fmt == "grib2":
        # forecast/ensemble/hindcast categories key on the reference
        # time + step (+ member) instead of valid time: dispatch to the
        # 4-D forecast frame when the scan demands any of those dims
        if {"forecast_reference_time", "step", "ensemble"} & set(dims):
            return grib2.grib2_forecast_long_frame(buf)
        return grib2.grib2_long_frame(buf)
    if fmt == "geotiff":
        # single-band, single-time rasters: (latitude, longitude, value);
        # when the scan requests a time dim, the timestamp lives in the
        # FILENAME (CHIRPS-style) and callers recover it via
        # functions.normalize.filename_coords on the path column
        return geotiff.geotiff_long_frame(buf)
    return grib1.grib1_long_frame(buf)


def decode_gridded_long(
    files: DataFrame,
    data_var: str,
    dims: list[str],
) -> DataFrame:
    """Distributed decode of a (possibly mixed-format) raw-file scan to
    long form: ``path`` + one double column per dim + ``value``; fill /
    bitmap sentinels surface as NULL.  GRIB times arrive as timestamps
    and are converted to fractional epoch days so every format shares
    one numeric schema (callers re-derive real timestamps per their
    calendar, exactly as with the per-format decoders)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                frame = _frame_for(bytes(content), data_var, dims)
                for col in frame.columns:
                    # every datetime axis (valid time, forecast
                    # reference time) crosses the uniform numeric
                    # schema as fractional epoch days; normalize to ns
                    # first: pandas 2 may hold these as datetime64[us],
                    # where a bare int64 view is 1000x off
                    if str(frame[col].dtype).startswith("datetime"):
                        frame[col] = (
                            frame[col].to_numpy()
                            .astype("datetime64[ns]").astype("int64")
                            / 86_400_000_000_000
                        )
                missing = [d for d in dims if d not in frame.columns]
                if missing:
                    raise UnknownFormatError(
                        f"{path}: dims {missing} not present (file has "
                        f"{[c for c in frame.columns if c != 'value']})"
                    )
                out = frame[[*dims, "value"]].copy()
                out.insert(0, "path", path)
                yield out

    return files.select("path", "content").mapInPandas(
        run, netcdf3.decode_schema(dims)
    )


def scan_gridded(
    spark: SparkSession,
    path: str,
    data_var: str,
    dims: list[str] | None = None,
    glob: str = "*",
) -> DataFrame:
    """The one-call front door: list + scan + decode a directory of raw
    gridded files of any supported format (mixed is fine)."""
    dims = dims or ["time", "latitude", "longitude"]
    return decode_gridded_long(
        read_binary_files(spark, path, glob=glob), data_var, dims
    )


def open_gridded(
    spark: SparkSession,
    path: str,
    data_var: str,
    dims: list[str] | None = None,
    base_dir: str = "",
) -> DataFrame:
    """STORE-level front door (r10): one call opens ANY dataset shape
    this engine reads and returns the common long form — the role the
    reference's dataset-open plays for its users (they point at a path
    and never care which container it is).

    Dispatch (second review pass r10 moved this to the right altitude
    — the store probes are the dedicated readers' OWN detectors, not a
    re-implementation):

    * ``.zmetadata`` carrying ``record_size`` (and no
      ``zarr_consolidated_format``) → PARQUET reference store
      (fsspec's LazyReferenceMapper marker; executor-side manifest);
    * anything ``zarr2.open_store`` accepts — v3 ``zarr.json``,
      consolidated v2 ``.zmetadata``, or UNCONSOLIDATED per-array
      ``.zarray`` files — → native store, chunk-parallel decode;
    * ``*.json`` file with a kerchunk shape → reference document
      (``gen``-dominated documents route to the JVM manifest path);
    * any other directory OR single raw file → magic-byte scan.
    """
    import json as _json
    import os

    from gridded_etl_tools_spark.sources import kerchunk, zarr2

    if os.path.isdir(path):
        zm = os.path.join(path, ".zmetadata")
        if os.path.exists(zm):
            with open(zm) as f:
                z = _json.load(f)
            if "record_size" in z and "zarr_consolidated_format" not in z:
                return kerchunk.decode_parquet_refs(
                    spark, path, data_var, base_dir=base_dir
                )
        try:
            zarr2.open_store(path)
        except (zarr2.ZarrError, OSError, ValueError):
            # not a zarr store in any of its three layouts: raw files
            return scan_gridded(spark, path, data_var, dims=dims)
        return zarr2.decode_zarr_long(spark, path, data_var)
    if path.endswith(".json"):
        with open(path) as f:
            doc = _json.load(f)
        if isinstance(doc, dict) and doc.get("gen"):
            return kerchunk.decode_kerchunk_long_gen(
                spark, doc, data_var, base_dir=base_dir or os.path.dirname(path)
            )
        return kerchunk.decode_kerchunk_long(
            spark, doc, data_var, base_dir=base_dir or os.path.dirname(path)
        )
    # a single raw gridded file is a valid dataset too
    return scan_gridded(spark, path, data_var, dims=dims)
