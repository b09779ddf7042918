"""6-D hindcast end-to-end (SURVEY §7.4 hard item; reference fixture
``tests/unit/conftest.py:107-134``): key explosion to
(hindcast_reference_time, forecast_reference_offset, step, ensemble,
lat, lon) must keep the publish path working and partition pruning
effective."""

from __future__ import annotations

import datetime as dt
import itertools

import pytest
from pyspark.sql import functions as F

from gridded_etl_tools_spark.gridspec import GridSpec
from gridded_etl_tools_spark.operators.dedup import exact_dedup
from gridded_etl_tools_spark.sinks.table import GriddedTable


@pytest.fixture(scope="module")
def hindcast_spec() -> GridSpec:
    return GridSpec(
        dataset_name="synthetic_hindcast",
        category="hindcast",
        spatial_resolution=0.5,
        time_resolution="monthly",
    )


@pytest.fixture()
def hindcast_df(spark, hindcast_spec):
    refs = [dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)]
    offsets = [0, 1, 2]          # forecast_reference_offset (days)
    steps = [0, 86400]           # step (seconds)
    ensembles = [0, 1]
    lats, lons = [36.0, 36.5], [-115.5, -115.0]
    rows = [
        (r, o, s, e, la, lo, float(i % 17))
        for i, (r, o, s, e, la, lo) in enumerate(
            itertools.product(refs, offsets, steps, ensembles, lats, lons)
        )
    ]
    return spark.createDataFrame(rows, hindcast_spec.schema())


def test_hindcast_schema_has_six_key_dims(hindcast_spec):
    assert hindcast_spec.key_dims == [
        "hindcast_reference_time", "forecast_reference_offset",
        "step", "ensemble", "latitude", "longitude",
    ]
    assert len(hindcast_spec.schema().fields) == 7


def test_hindcast_publish_point_select_and_pruning(spark, hindcast_df, hindcast_spec, tmp_path):
    t = GriddedTable(str(tmp_path / "hc"), time_col="hindcast_reference_time")
    t.write_initial(hindcast_df, sort_cols=list(hindcast_spec.spatial_dims))
    assert t.read(spark).count() == 2 * 3 * 2 * 2 * 4

    # 6-D point select: composite-key lookup returns exactly one row
    out = t.read(spark).filter(
        (F.col("hindcast_reference_time") == dt.datetime(2024, 2, 1))
        & (F.col("forecast_reference_offset") == 1)
        & (F.col("step") == 86400)
        & (F.col("ensemble") == 1)
        & (F.col("latitude") == 36.5)
        & (F.col("longitude") == -115.0)
    )
    rows = out.collect()
    assert len(rows) == 1

    # manifest-level pruning on the reference-time bucket: asking for
    # January must touch only the 2024-01 files
    jan = t.read(spark, time_lo=dt.datetime(2024, 1, 1), time_hi=dt.datetime(2024, 1, 31))
    files = jan.inputFiles()
    assert files and all("2024-01" in f for f in files)
    assert jan.count() == 3 * 2 * 2 * 4


def test_hindcast_dedup_on_composite_key(spark, hindcast_df, hindcast_spec):
    doubled = hindcast_df.unionByName(hindcast_df)
    deduped = exact_dedup(
        doubled.withColumn("row_id", F.monotonically_increasing_id()),
        content_cols=hindcast_spec.key_dims,
        id_col="row_id",
    ).drop("row_id")
    assert deduped.count() == hindcast_df.count()


def test_hindcast_update_split_insert_and_append(spark, hindcast_df, hindcast_spec, tmp_path):
    """Update-split on the 6-D key: an update overlapping one reference
    time and adding a new one must split into 1 insert + 1 append, with
    the overlapped cells overwritten and untouched cells surviving
    (SURVEY §7.4 hard case; reference hindcast fixture
    tests/unit/conftest.py:107-134)."""
    from gridded_etl_tools_spark.sinks.publish import publish

    t = GriddedTable(str(tmp_path / "hc6"), time_col="hindcast_reference_time")
    publish(t, hindcast_df, hindcast_spec, run_quality_checks=False)
    before = t.read(spark).count()

    overlap = hindcast_df.filter(
        F.col("hindcast_reference_time") == dt.datetime(2024, 2, 1)
    ).withColumn("value", F.col("value") + 1000.0)
    march = hindcast_df.filter(
        F.col("hindcast_reference_time") == dt.datetime(2024, 1, 1)
    ).withColumn(
        "hindcast_reference_time", F.lit(dt.datetime(2024, 3, 1))
    )
    r = publish(
        t, overlap.unionByName(march), hindcast_spec, run_quality_checks=False
    )
    assert r["n_inserted_times"] == 1 and r["n_appended_times"] == 1

    out = t.read(spark)
    assert out.count() == before + march.count()  # insert overwrote in place
    feb = out.filter(F.col("hindcast_reference_time") == dt.datetime(2024, 2, 1))
    assert feb.agg(F.min("value")).collect()[0][0] >= 1000.0
    jan = out.filter(F.col("hindcast_reference_time") == dt.datetime(2024, 1, 1))
    assert jan.agg(F.max("value")).collect()[0][0] < 1000.0
