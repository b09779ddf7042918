"""Publish-lifecycle tests: branch selection, update split, QC gates —
mirroring reference system tests (append path test_chirps.py:239-271,
hole-in-append 305-329, dry-run 137-153)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gridded_etl_tools_spark.operators.qc import QualityCheckError
from gridded_etl_tools_spark.sinks.publish import PublishError, publish
from gridded_etl_tools_spark.sinks.table import GriddedTable

DAY = dt.timedelta(days=1)


def test_publish_initial_then_append(spark, month1, month2, spec, tmp_path):
    t = GriddedTable(str(tmp_path / "tbl"))
    r1 = publish(t, month1, spec, expected_delta=DAY)
    assert r1["mode"] == "initial"
    r2 = publish(t, month2, spec, expected_delta=DAY)
    assert r2["mode"] == "update"
    assert r2["n_appended_times"] == 31 and r2["n_inserted_times"] == 0
    assert t.read(spark).count() == 976


def test_publish_dry_run_writes_nothing(spark, month1, spec, tmp_path):
    t = GriddedTable(str(tmp_path / "tbl"))
    r = publish(t, month1, spec, expected_delta=DAY, dry_run=True)
    assert r["mode"] == "dry_run"
    assert not t.exists()


def test_publish_rebuild_needs_allow_overwrite(spark, month1, spec, tmp_path):
    t = GriddedTable(str(tmp_path / "tbl"))
    publish(t, month1, spec, expected_delta=DAY)
    with pytest.raises(PublishError):
        publish(t, month1, spec, expected_delta=DAY, rebuild=True)
    r = publish(t, month1, spec, expected_delta=DAY, rebuild=True, allow_overwrite=True)
    assert r["mode"] == "initial"


def test_publish_hole_in_append_rejected(spark, month1, month2, spec, tmp_path):
    """Reference: appending with a gap raises (test_chirps.py:305-329)."""
    t = GriddedTable(str(tmp_path / "tbl"))
    publish(t, month1, spec, expected_delta=DAY)
    holey = month2.filter(F.dayofmonth("time") >= 5)  # starts Dec 5, gap Dec 1-4
    with pytest.raises(QualityCheckError, match="not contiguous"):
        publish(t, holey, spec, expected_delta=DAY)
    assert t.read(spark).count() == 480  # nothing written


def test_publish_update_before_start_rejected(spark, month1, month2, spec, tmp_path):
    t = GriddedTable(str(tmp_path / "tbl"))
    publish(t, month2, spec, expected_delta=DAY)  # dataset starts Dec 1
    with pytest.raises(QualityCheckError, match="before dataset start"):
        publish(t, month1, spec, expected_delta=DAY)


def test_publish_mixed_insert_and_append(spark, month1, month2, spec, tmp_path):
    """Update overlapping the existing tail: overlap becomes an insert
    (values overwritten), the rest appends — reference update_zarr
    (publish.py:322-356)."""
    t = GriddedTable(str(tmp_path / "tbl"))
    publish(t, month1, spec, expected_delta=DAY)

    overlap = month1.filter(F.dayofmonth("time") >= 29).withColumn(
        "value", F.col("value") + 100.0
    )
    update = overlap.unionByName(month2)
    r = publish(t, update, spec, expected_delta=DAY)
    assert r["n_inserted_times"] == 2
    assert r["n_appended_times"] == 31
    df = t.read(spark)
    assert df.count() == 976  # no dup rows from the insert
    # inserted day got the +100 values
    v = df.filter(
        (F.col("time") == dt.datetime(2024, 11, 29))
        & (F.col("latitude") == 36.0)
        & (F.col("longitude") == -115.75)
    ).collect()[0]["value"]
    orig = month1.filter(
        (F.col("time") == dt.datetime(2024, 11, 29))
        & (F.col("latitude") == 36.0)
        & (F.col("longitude") == -115.75)
    ).collect()[0]["value"]
    assert v == pytest.approx(orig + 100.0)
    # untouched november day keeps original value
    v2 = df.filter(
        (F.col("time") == dt.datetime(2024, 11, 10))
        & (F.col("latitude") == 36.0)
        & (F.col("longitude") == -115.75)
    ).collect()[0]["value"]
    orig2 = month1.filter(
        (F.col("time") == dt.datetime(2024, 11, 10))
        & (F.col("latitude") == 36.0)
        & (F.col("longitude") == -115.75)
    ).collect()[0]["value"]
    assert v2 == pytest.approx(orig2)


def test_publish_empty_update_rejected(spark, month1, spec, tmp_path):
    t = GriddedTable(str(tmp_path / "tbl"))
    publish(t, month1, spec, expected_delta=DAY)
    with pytest.raises(QualityCheckError, match="empty update"):
        publish(t, month1.limit(0), spec, expected_delta=DAY)


def test_publish_insert_only_rewrites_values(spark, month1, spec, tmp_path):
    t = GriddedTable(str(tmp_path / "tbl"))
    publish(t, month1, spec, expected_delta=DAY)
    upd = month1.filter(F.dayofmonth("time").isin(10, 11, 12)).withColumn(
        "value", F.lit(7.25)
    )
    r = publish(t, upd, spec, expected_delta=DAY)
    assert r["n_inserted_times"] == 3 and r["n_appended_times"] == 0
    df = t.read(spark)
    assert df.count() == 480
    assert df.filter(F.col("value") == 7.25).count() == 48


def test_publish_declares_spatial_stat_cols(spark, month1, month2, spec, tmp_path):
    """r7: the initial publish declares the spec's spatial dims as table
    stat columns — every file (initial AND appended) carries per-file
    lat/lon min/max, so bbox reads prune at the manifest before any
    OPTIMIZE, and the declaration persists across commits."""
    t = GriddedTable(str(tmp_path / "ds"))
    publish(t, month1, spec, expected_delta=DAY)
    snap = t.snapshot()
    assert snap.stat_cols == ["latitude", "longitude"]
    assert all(
        set(e.get("stats", {})) >= {"latitude", "longitude"}
        for e in snap.entries
    )
    publish(t, month2, spec, expected_delta=DAY)
    snap = t.snapshot()
    assert snap.stat_cols == ["latitude", "longitude"]
    assert all(
        set(e.get("stats", {})) >= {"latitude", "longitude"}
        for e in snap.entries
    )
    # bbox read stays exact (files are time-sorted, so the stats are
    # wide and prune little here — correctness is the contract)
    got = t.read(
        spark, where={"latitude": (36.0, 36.25)}
    ).count()
    want = (
        t.read(spark).filter(
            (F.col("latitude") >= 36.0) & (F.col("latitude") <= 36.25)
        ).count()
    )
    assert got == want
