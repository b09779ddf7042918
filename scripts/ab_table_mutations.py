#!/usr/bin/env python3
"""Scale A/B for the table-mutation surface (BASELINE.md "Measured
(round 6)"): keyed MERGE's touched-files-only rewrite vs the naive
full-table rewrite, and OPTIMIZE ZORDER's manifest-level bbox pruning
vs the time-sorted layout.

Builds a ~20M-row point table spanning 24 monthly buckets (deterministic
expansion of sf0.1 events), then:

  A. merge_upsert of a batch touching ONLY the last day (~0.13% of
     rows) — manifest prune on the batch's [min, max] time means the
     probe and rewrite never read the other 23 months — vs the naive
     read-all / anti-join / rewrite-everything form every engine
     without file-level statistics is forced into.
  B. a (lat, lon)-style bbox query against the time-sorted layout vs
     the same query after OPTIMIZE ZORDER, reporting the manifest
     file-skip ratio and wall time.

Wall-clock on one box understates the cluster gap: the naive merge's
cost grows with TABLE size while the surgical merge's grows with
BATCH size — at 100 TB that is the difference between an hourly
correction job being possible or not.

Usage: python scripts/ab_table_mutations.py [copies]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.session import get_session  # noqa: E402
from gridded_etl_tools_spark.sinks.table import GriddedTable  # noqa: E402

ROOT = "/tmp/spark_graft_ab_mut"


def build_source(spark, copies: int):
    """copies × sf0.1 events, re-dated across 24 months → one point
    frame with disjoint event_ids and a uniform (user_id, value) plane."""
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    return ev.crossJoin(
        spark.range(copies).select(F.col("id").alias("__c"))
    ).select(
        (F.col("event_id") + F.col("__c") * 10_000_000).alias("event_id"),
        # spread the copies across 24 months so buckets are real
        F.timestamp_add(
            "MONTH", (F.col("__c") % 24).cast("int"), F.col("ts").cast("timestamp")
        ).alias("ts"),
        (F.col("user_id") + (F.col("__c") * 37) % 1000).alias("user_id"),
        F.col("value"),
    )


def fresh_table(spark, src, path: str) -> GriddedTable:
    shutil.rmtree(path, ignore_errors=True)
    t = GriddedTable(path, time_col="ts")
    t.write_initial(src, sort_cols=["user_id"])
    return t


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    src = build_source(spark, copies).localCheckpoint(eager=True)
    n = src.count()
    print(f"rows={n:,} months=24")

    # ---- A: surgical MERGE vs naive full rewrite -------------------------
    t = fresh_table(spark, src, os.path.join(ROOT, "merge"))
    lo, hi = src.agg(F.min("ts"), F.max("ts")).first()
    last_day = src.filter(
        F.col("ts") >= F.timestamp_add("DAY", F.lit(-1), F.lit(hi))
    )
    batch = last_day.withColumn("value", F.col("value") * 2).localCheckpoint(
        eager=True
    )
    bn = batch.count()
    print(f"batch rows={bn:,} ({bn / n:.2%} of table)")

    t0 = time.time()
    snap = t.merge_upsert(spark, batch, ["ts", "event_id"])
    t_merge = time.time() - t0
    v0 = {e["path"]: e["rows"] for e in t.snapshot(0).entries}
    new_paths = set(snap.paths()) - set(v0)
    rows_written = sum(e["rows"] for e in snap.entries if e["path"] in new_paths)
    touched = len(v0) - sum(1 for e in snap.entries if e["path"] in v0)
    print(
        f"A  merge_upsert (touched-files-only): {t_merge:.1f}s — "
        f"rewrote {touched}/{len(v0)} files, {rows_written:,} rows written"
    )

    t2 = fresh_table(spark, src, os.path.join(ROOT, "naive"))
    t0 = time.time()
    cur = t2.read(spark)
    keys = batch.select("ts", "event_id")
    merged = cur.join(keys, ["ts", "event_id"], "left_anti").unionByName(batch)
    shutil.rmtree(os.path.join(ROOT, "naive2"), ignore_errors=True)
    t3 = GriddedTable(os.path.join(ROOT, "naive2"), time_col="ts")
    t3.write_initial(merged, sort_cols=["user_id"])
    t_naive = time.time() - t0
    nf = len(t3.snapshot().paths())
    print(f"B  naive full rewrite:               {t_naive:.1f}s — "
          f"rewrote {nf}/{nf} files, {n:,} rows written")
    print(f"   wall {t_naive / t_merge:.1f}x, write I/O {n / rows_written:.0f}x, "
          f"read I/O O(batch+touched) vs O(table) at {bn / n:.2%} batch")

    # ---- B: bbox query, time-sorted vs z-ordered --------------------------
    bbox = {"user_id": (100, 160), "value": (100.0, 160.0)}

    def run_bbox(tbl: GriddedTable) -> tuple[float, int]:
        t0 = time.time()
        got = (
            tbl.read(spark, where=bbox)
            .agg(F.count(F.lit(1)), F.round(F.sum("value"), 2))
            .first()
        )
        return time.time() - t0, got[0]

    dt_sorted, n1 = run_bbox(t)
    s1, tot1 = t.pruned_file_count(where=bbox)
    print(f"bbox on time-sorted layout: {dt_sorted:.2f}s "
          f"(manifest scans {s1}/{tot1} files, rows={n1:,})")

    lo_u, hi_u, lo_v, hi_v = src.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    t0 = time.time()
    t.optimize(
        spark,
        cluster_by=["user_id", "value"],
        ranges={"user_id": (float(lo_u), float(hi_u)),
                "value": (float(lo_v), float(hi_v))},
        target_file_rows=max(1, n // 400),
    )
    t_opt = time.time() - t0
    dt_z, n2 = run_bbox(t)
    s2, tot2 = t.pruned_file_count(where=bbox)
    assert n1 == n2, (n1, n2)
    print(f"OPTIMIZE ZORDER: {t_opt:.1f}s (one-off maintenance)")
    print(f"bbox on z-ordered layout:   {dt_z:.2f}s "
          f"(manifest scans {s2}/{tot2} files, rows={n2:,})")
    print(f"   file-skip {1 - s2 / tot2:.0%} vs {1 - s1 / tot1:.0%}; "
          f"query speedup {dt_sorted / dt_z:.1f}x")


    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
