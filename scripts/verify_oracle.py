#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run every catalog query
in Spark AND its DuckDB oracle at a given scale factor, compare row count,
column names, and an order-insensitive value hash.

Usage: python scripts/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from gridded_etl_tools_spark.plans.catalog import ORACLES, QUERIES  # noqa: E402
from gridded_etl_tools_spark.plans.tables import TABLES  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def table_digest(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    import hashlib

    return hashlib.md5("\x1e".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session("verify_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in ORACLES:
            print(f"rows-only  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(ORACLES[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            hs, ho = table_digest(srows, scols), table_digest(orows, ocols)
            if hs != ho:
                problems.append("value-hash mismatch")
                # print a few differing lines to debug
                sset = {tuple(norm_cell(v) for v in r) for r in srows}
                oset = {tuple(norm_cell(v) for v in r) for r in orows}
                so = list(sset - oset)[:3]
                os_ = list(oset - sset)[:3]
                problems.append(f"spark-only={so} oracle-only={os_}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(str(p) for p in problems)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(QUERIES) - len(failures)}/{len(only) if only else len(QUERIES)} passing")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
