"""File-listing scans (SURVEY §2.1 S13-S15 + Q13 glue).

Reference parity:

* ``input_files``  (utils/convenience.py:102-115) — natural-sorted listing
  of the input directory, skipping dotfiles and ``.idx``.
* ``binaryFile`` scan + filename-coordinate extraction feeds the decode
  stage (replacing Kerchunk scans S10-S11): each raw file row carries its
  path, and :func:`gridded_etl_tools_spark.functions.normalize.filename_coords`
  regex-parses coordinates out of it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NAT_SPLIT = re.compile(r"(\d+)")


def natural_key(s: str) -> list:
    """natsort-style key: digit runs compare numerically."""
    return [int(p) if p.isdigit() else p for p in _NAT_SPLIT.split(s)]


#: Digit runs longer than this cannot be represented at fixed width by
#: :func:`natural_sort_col`; callers whose ordering is load-bearing gate
#: on :func:`oversize_digit_run_col` and refuse loudly (ADVICE r12).
NATURAL_SORT_PAD = 19


def natural_sort_col(col) -> "F.Column":
    """:func:`natural_key` as a whole-stage-codegen column expression:
    digit runs zero-pad to a fixed 19-digit width (covers int64 /
    epoch-nanoseconds) so lexicographic string order == numeric order
    (``era_2`` before ``era_10``).  The JVM-side twin of the driver-side
    ``natural_key`` sort — the distributed refs merge orders files with
    it instead of collecting paths.  Runs longer than 19 digits keep
    their extra length and would compare by prefix, diverging from
    ``natural_key`` when two such runs differ in length — ordering-
    critical callers (the parquet-refs merge/append) therefore refuse
    filenames carrying >19-digit runs via
    :func:`oversize_digit_run_col` instead of sorting them silently."""
    nat = F.regexp_replace(col, r"(\d+)", "0" * NATURAL_SORT_PAD + r"$1")
    return F.regexp_replace(nat, r"0*(\d{%d})" % NATURAL_SORT_PAD, r"$1")


def oversize_digit_run_col(col) -> "F.Column":
    """Boolean column: does the string carry a digit run longer than
    :data:`NATURAL_SORT_PAD` digits (i.e. one :func:`natural_sort_col`
    cannot order at fixed width)?  Used by the distributed refs merge to
    refuse — rather than mis-order — such filenames."""
    return col.rlike(r"\d{%d}" % (NATURAL_SORT_PAD + 1))


def input_files(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    skip_suffixes: tuple[str, ...] = (".idx",),
) -> DataFrame:
    """List input files as a DataFrame ``(path, length, modificationTime)``
    in natural-sort order, skipping dotfiles and index sidecars.  Uses the
    binaryFile source's listing (no content read: content column dropped
    before any action)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "length", "modificationTime")
    )
    base = F.element_at(F.split(F.col("path"), "/"), -1)
    for suffix in skip_suffixes:
        df = df.filter(~base.endswith(suffix))
    df = df.filter(~base.startswith("."))
    # natural order: numeric runs zero-padded into a sortable key
    return df.orderBy(natural_sort_col(base))


def read_binary_files(
    spark: SparkSession, path: str, glob: str = "*", recursive: bool = False
) -> DataFrame:
    """Raw-file scan for the decode stage: (path, modificationTime,
    length, content).  Decoders (NetCDF/GRIB/Zarr) plug in as mapInPandas
    over this — see gridded_etl_tools_spark.multimodal.binary.
    ``recursive`` enables recursiveFileLookup (nested chunk layouts, e.g.
    zarr ``dimension_separator='/'``)."""
    reader = spark.read.format("binaryFile").option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)
