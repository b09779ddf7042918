#!/usr/bin/env python3
"""Runnable end-to-end demo of the SURVEY §7.3 minimum slice, plus the
update path and metadata artifacts:

  synthesize 2 months of CHIRPS-like daily grid
    → normalize (sentinel→NULL, longitude standardization)
    → initial publish (atomic manifest commit, QC-gated)
    → append month 2 (contiguity + position gates)
    → insert a corrected week (bucket overwrite widened by combine_first)
    → answer the golden point query and verify against the source value
    → emit the STAC item + spatial convention attrs

Usage: python scripts/demo_etl.py [workdir]
"""

from __future__ import annotations

import datetime as dt
import itertools
import json
import random
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.functions import conventions, stac  # noqa: E402
from gridded_etl_tools_spark.functions.normalize import sentinel_to_null  # noqa: E402
from gridded_etl_tools_spark.gridspec import GridSpec  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402
from gridded_etl_tools_spark.sinks.publish import publish  # noqa: E402
from gridded_etl_tools_spark.sinks.table import GriddedTable  # noqa: E402

LATS = [36.0 + 0.25 * i for i in range(4)]
LONS = [-115.75 + 0.25 * i for i in range(4)]
SENTINEL = -9999.0


def month(spark, spec, start: dt.datetime, days: int, seed: int):
    rng = random.Random(seed)
    rows = [
        (start + dt.timedelta(days=d), lat, lon,
         SENTINEL if rng.random() < 0.02 else round(rng.uniform(0, 50), 3))
        for d in range(days)
        for lat, lon in itertools.product(LATS, LONS)
    ]
    return spark.createDataFrame(rows, "time timestamp, latitude double, longitude double, value float")


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="demo_etl_")
    spark = get_session("demo_etl")
    spec = GridSpec(
        dataset_name="demo_precip", spatial_resolution=0.25, missing_value=SENTINEL
    )
    table = GriddedTable(f"{workdir}/demo_precip")
    delta = dt.timedelta(days=1)

    nov = sentinel_to_null(month(spark, spec, dt.datetime(2024, 11, 1), 30, 1), "value", SENTINEL)
    dec = sentinel_to_null(month(spark, spec, dt.datetime(2024, 12, 1), 31, 2), "value", SENTINEL)

    r1 = publish(table, nov, spec, expected_delta=delta)
    print("initial:", json.dumps(r1))
    r2 = publish(table, dec, spec, expected_delta=delta)
    print("append: ", json.dumps(r2))

    # corrected week of December: insert path (bucket overwrite + widening)
    fix = dec.filter(F.dayofmonth("time").between(10, 16)).withColumn(
        "value", F.coalesce(F.col("value") * 0 + 7.5, F.lit(7.5))
    )
    r3 = publish(table, fix, spec, expected_delta=delta)
    print("insert: ", json.dumps(r3))

    # golden point query (reference tests/system/test_chirps.py:186-207)
    golden_t, golden_lat, golden_lon = dt.datetime(2024, 12, 12), 36.25, -115.5
    got = table.read(spark).filter(
        (F.col("time") == golden_t)
        & (F.col("latitude") == golden_lat)
        & (F.col("longitude") == golden_lon)
    ).collect()
    assert len(got) == 1 and abs(got[0]["value"] - 7.5) < 1e-6, got
    print(f"golden point {golden_t.date()} @({golden_lat},{golden_lon}) = {got[0]['value']} ✓")

    # untouched cells of the overwritten buckets survived the insert
    total = table.read(spark).count()
    assert total == (30 + 31) * 16, total
    print(f"row conservation: {total} rows across {len(table.history())} versions ✓")

    item = stac.build_item(spec, table.read(spark))
    attrs = conventions.build_spatial_attrs(table.read(spark))
    print("stac bbox:", item["bbox"], "| temporal:", item["properties"]["start_datetime"],
          "→", item["properties"]["end_datetime"])
    print("spatial attrs:", json.dumps(attrs))

    if len(sys.argv) <= 1:
        shutil.rmtree(workdir, ignore_errors=True)
    print("demo complete.")


if __name__ == "__main__":
    main()
