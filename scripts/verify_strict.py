#!/usr/bin/env python3
"""STRICT replica of the driver's correctness gate.

The round-4 lesson: the lenient replica (``verify_oracle.py``) collapses
float-integers (``53.0`` == ``53``), which hid exactly the class the
driver flagged — DuckDB returns integer sums as HUGEINT and DECIMAL sums
as DECIMAL, and depending on DuckDB build and fetch path those surface
in pandas as float64 / Decimal objects while Spark emits int64 / float.

This verifier is type-sensitive and fetch-path-exhaustive:

* Path A (native): Spark ``collect()`` vs oracle ``fetchall()``.
* Path B (pandas): Spark ``toPandas()`` vs oracle ``.df()`` — both
  normalized through the same numpy→Python mapping, modelling a driver
  that compares DataFrames.

BOTH paths must match cell-for-cell under a repr that distinguishes
``3`` / ``3.0`` / ``Decimal('3.00')``.

If a query passes here it passes under any driver-side DuckDB
conversion of the canonical output types (BIGINT / DOUBLE / VARCHAR /
DATE / TIMESTAMP / BOOLEAN).

Usage: python scripts/verify_strict.py [sf_dir] [query ...]

Set SPARK_GRAFT_VANILLA=1 to run under a DRIVER-LIKE vanilla session
(``local[4]``, default 200 shuffle partitions, no tuned configs) —
catches any query whose values depend on partitioning or session
configuration rather than being exact by construction.
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from gridded_etl_tools_spark.plans.catalog import ORACLES, QUERIES  # noqa: E402
from gridded_etl_tools_spark.plans.tables import TABLES  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402


def strict_cell(v):
    """Type-sensitive canonical repr — deliberately DISTINGUISHES int,
    float, and Decimal so dtype drift fails instead of hiding."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{int(v)}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        return f"float:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"date:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    return f"str:{v}"


def _np_to_py(v):
    """pandas/numpy scalar -> Python object (what a driver would see)."""
    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    return v


def table_lines(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        "\x1f".join(strict_cell(r[i]) for i in order) for r in rows
    )


def main() -> int:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("verify_strict_vanilla")
            .getOrCreate()
        )
        print("== VANILLA session (driver-like, untuned) ==", flush=True)
    else:
        spark = get_session("verify_strict")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    n_run = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name not in ORACLES:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            # Spark side must never emit Decimal or Date (output canon)
            for f in sdf.schema.fields:
                tn = f.dataType.typeName()
                if tn.startswith("decimal") or tn == "date":
                    raise AssertionError(
                        f"Spark output column {f.name} is {tn} "
                        "(violates output-type canon)"
                    )
            spdf = sdf.toPandas()
            s_rows_pd = [
                tuple(_np_to_py(v) for v in row)
                for row in spdf.itertuples(index=False, name=None)
            ]
            rel = con.sql(ORACLES[name])
            o_cols = rel.columns
            o_rows_py = rel.fetchall()
            odf = con.sql(ORACLES[name]).df()
            o_rows_pd = [
                tuple(_np_to_py(v) for v in row)
                for row in odf.itertuples(index=False, name=None)
            ]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {e}", flush=True)
            continue
        n_run += 1
        ok_cols = sorted(s_cols) == sorted(o_cols)
        paths = (
            ("native", table_lines(s_rows, s_cols),
             table_lines(o_rows_py, o_cols)),
            ("pandas", table_lines(s_rows_pd, s_cols),
             table_lines(o_rows_pd, o_cols)),
        )
        bad_paths = [
            (tag, sl, ol) for tag, sl, ol in paths if sl != ol
        ]
        status = "PASS" if (ok_cols and not bad_paths) else "FAIL"
        if status == "FAIL":
            failures.append(name)
            detail = []
            if not ok_cols:
                detail.append(f"cols spark={s_cols} oracle={o_cols}")
            for tag, sl, ol in bad_paths:
                if len(sl) != len(ol):
                    detail.append(
                        f"{tag} rowcount spark={len(sl)} o={len(ol)}"
                    )
                for a, b in [(a, b) for a, b in zip(sl, ol) if a != b][:2]:
                    detail.append(f"{tag}: spark={a[:160]} oracle={b[:160]}")
            print(f"FAIL {name}: " + " | ".join(detail), flush=True)
        else:
            print(
                f"PASS {name} rows={len(s_rows)} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
    print(f"\n{n_run - len(failures)}/{n_run} strict-pass; "
          f"failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
