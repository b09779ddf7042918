"""Tests for grid conventions (Q18/Q19), encryption (W18), and STAC
metadata (W16) parity layers."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gridded_etl_tools_spark.functions import conventions, encryption, stac


# --- conventions ------------------------------------------------------------

def test_regular_grid_stats_regular_axis(spark):
    df = spark.createDataFrame([Row(x=35.0 + 0.25 * i) for i in range(9)])
    st = conventions.regular_grid_stats(df, "x")
    assert st["n"] == 9
    assert st["median_spacing"] == pytest.approx(0.25)
    assert st["is_regular"] is True


def test_regular_grid_stats_irregular_axis(spark):
    df = spark.createDataFrame([Row(x=v) for v in [0.0, 1.0, 2.0, 4.0]])
    st = conventions.regular_grid_stats(df, "x")
    assert st["is_regular"] is False
    assert st["max_spacing"] == pytest.approx(2.0)


def test_build_spatial_attrs_shape_bbox_transform(spark, month1):
    attrs = conventions.build_spatial_attrs(month1)
    assert attrs["spatial:shape"] == [4, 4]
    assert attrs["spatial:bbox"] == [-115.75, 36.0, -115.0, 36.75]
    assert attrs["spatial:regular"] is True
    west_edge, dx, _, north_edge, _, neg_dy = attrs["spatial:transform"]
    assert dx == pytest.approx(0.25) and neg_dy == pytest.approx(-0.25)
    assert west_edge == pytest.approx(-115.875)   # west - dx/2
    assert north_edge == pytest.approx(36.875)    # north + dy/2


def test_projection_attrs_gated_without_pyproj():
    if conventions.pyproj is None:
        with pytest.raises(NotImplementedError):
            conventions.projection_attrs("EPSG:4326")
        with pytest.raises(NotImplementedError):
            conventions.reproject_coords(None)
    else:  # pragma: no cover - environment with pyproj
        attrs = conventions.projection_attrs("EPSG:4326")
        assert attrs["proj:code"] == "EPSG:4326"


# --- encryption -------------------------------------------------------------

def test_encrypt_decrypt_roundtrip(spark):
    digest = encryption.register_encryption_key(b"0123456789abcdef")
    df = spark.createDataFrame([Row(id=1, value=3.5), Row(id=2, value=-9.25)])
    enc = encryption.encrypt_values(df, "value", digest)
    assert dict(enc.dtypes)["value"] == "binary"
    dec = encryption.decrypt_values(enc, "value", digest)
    out = {r["id"]: r["value"] for r in dec.collect()}
    assert out == {1: 3.5, 2: -9.25}


def test_key_registry_digest_addressing():
    key = b"0123456789abcdef"
    digest = encryption.register_encryption_key(key)
    import hashlib

    assert digest == hashlib.sha3_256(key).hexdigest()
    assert encryption.get_encryption_key(digest) == key
    with pytest.raises(KeyError):
        encryption.get_encryption_key("beef" * 16)
    with pytest.raises(ValueError):
        encryption.register_encryption_key(b"short")


# --- STAC metadata ----------------------------------------------------------

def test_dataset_extent_and_item(spark, spec, month1):
    item = stac.build_item(spec, month1)
    assert item["type"] == "Feature" and item["stac_version"] == "1.0.0"
    assert item["bbox"] == [-115.75, 36.0, -115.0, 36.75]
    assert item["properties"]["start_datetime"] == "2024-11-01T00:00:00Z"
    assert item["properties"]["end_datetime"] == "2024-11-30T00:00:00Z"
    ring = item["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]  # closed polygon


def test_collection_and_catalog(spark, spec, month1):
    item = stac.build_item(spec, month1)
    coll = stac.build_collection(spec, [item])
    assert coll["extent"]["spatial"]["bbox"] == [[-115.75, 36.0, -115.0, 36.75]]
    assert coll["extent"]["temporal"]["interval"][0][0] == "2024-11-01T00:00:00Z"
    cat = stac.build_catalog("root", [coll])
    assert cat["links"][0]["href"].endswith("collection.json")


def test_merge_in_outside_metadata_tracks_update_range(spark, month1, month2):
    attrs = stac.merge_in_outside_metadata({}, month1, update_is_append_only=True)
    assert attrs["date range"] == ["2024-11-01T00:00:00Z", "2024-11-30T00:00:00Z"]
    assert "update_date_range" not in attrs
    both = month1.unionByName(month2)
    attrs2 = stac.merge_in_outside_metadata(attrs, both, update_is_append_only=True)
    assert attrs2["update_date_range"] == ["2024-11-30T00:00:00Z", "2024-12-31T00:00:00Z"]
    assert attrs2["update_is_append_only"] is True


def test_metadata_store_overwrite_keeps_history(spark, spec, month1, month2):
    """Reference store.py:398-422/593-625 push_metadata: overwriting a
    STAC entity must first snapshot the existing copy into
    history/<title>/, so every previous item stays browsable."""
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        store = stac.MetadataStore(root)
        title = spec.dataset_name

        item_v1 = stac.build_item(spec, month1)
        store.push(title, item_v1)
        assert store.history(title) == []  # first write: nothing to retain

        item_v2 = stac.build_item(spec, month1.unionByName(month2))
        store.push(title, item_v2)

        current, path = store.retrieve(title)
        assert current["properties"]["end_datetime"] == "2024-12-31T00:00:00Z"
        assert path.endswith(f"datasets/{title}.json")

        hrefs = store.history(title)
        assert len(hrefs) == 1
        with open(hrefs[0]) as f:
            previous = json.load(f)
        assert previous == item_v1  # byte-faithful previous item
        assert previous["properties"]["end_datetime"] == "2024-11-30T00:00:00Z"

        # third push retains a second, distinct history copy even within
        # the same mtime second
        store.push(title, stac.build_item(spec, month2))
        assert len(store.history(title)) == 2

        # collection + catalog land in their own path parts
        coll_path = store.push(title, stac.build_collection(spec, [item_v2]), stac.COLLECTION)
        cat_path = store.push("root", stac.build_catalog("root", []), stac.CATALOG)
        assert f"{os.sep}collections{os.sep}" in coll_path
        assert os.path.dirname(cat_path) == root


def test_projected_grid_round_trip(spark, tmp_path):
    """Projected-grid path without pyproj (reference
    util_funcs/projections.py:6-43): an injected affine transform drives
    the same pandas-UDF plumbing — lon/lat -> easting/northing columns —
    and the projected GridSpec (crs_wkt + renamed spatial dims) survives
    a publish round-trip through the table attrs."""
    import numpy as np

    from gridded_etl_tools_spark.functions.conventions import reproject_coords
    from gridded_etl_tools_spark.gridspec import GridSpec
    from gridded_etl_tools_spark.sinks.publish import publish
    from gridded_etl_tools_spark.sinks.table import GriddedTable

    wkt = 'PROJCS["synthetic_laea",UNIT["metre",1]]'

    def affine(lon, lat):
        # deterministic stand-in for a projection: scale + offset
        return np.asarray(lon) * 1000.0 + 500.0, np.asarray(lat) * 2000.0 - 300.0

    rows = [
        (dt.datetime(2024, 1, 1 + d), float(la), float(lo), float(d + la + lo))
        for d in range(3)
        for la in (36.0, 36.5)
        for lo in (-115.5, -115.0)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, latitude double, longitude double, value double"
    )
    projected = reproject_coords(df, transform_fn=affine).drop(
        "latitude", "longitude"
    )
    assert {"easting", "northing"} <= set(projected.columns)
    got = projected.filter(
        F.col("time") == dt.datetime(2024, 1, 1)
    ).select("easting", "northing").distinct().collect()
    assert {(r["easting"], r["northing"]) for r in got} == {
        (lo * 1000.0 + 500.0, la * 2000.0 - 300.0)
        for la in (36.0, 36.5)
        for lo in (-115.5, -115.0)
    }

    spec = GridSpec(
        dataset_name="synthetic_projected",
        spatial_dims=("northing", "easting"),
        spatial_resolution=500.0,
        crs_wkt=wkt,
    )
    t = GriddedTable(str(tmp_path / "proj_tbl"))
    publish(
        t, projected, spec, run_quality_checks=False,
        attrs_update={"crs_wkt": spec.crs_wkt},
    )
    assert t.attrs()["crs_wkt"] == wkt
    out = t.read(spark)
    assert {"northing", "easting"} <= set(out.columns)
    assert out.count() == len(rows)


def test_cf_registry_polar_stereo_and_identity_roundtrip(spark):
    """The CF grid_mapping registry's polar-stereographic and identity
    entries must round-trip lon/lat through forward+inverse (the
    rotated/mercator/LCC entries are oracle-checked by the
    cf_gridmapping_reproject catalog row)."""
    import pyspark.sql.functions as F
    import pytest as _pt

    from gridded_etl_tools_spark.functions.projections import cf_transforms

    fwd, inv = cf_transforms(
        {
            "grid_mapping_name": "polar_stereographic",
            "straight_vertical_longitude_from_pole": -45.0,
            "standard_parallel": 60.0,
            "latitude_of_projection_origin": 90.0,
        }
    )
    grid = spark.range(0, 100).select(
        (40.0 + (F.col("id") / 10).cast("long").cast("double") * 2.0).alias("lat"),
        (-170.0 + (F.col("id") % 10).cast("double") * 30.0).alias("lon"),
    )
    x, y = fwd(F.col("lon"), F.col("lat"))
    prj = grid.select("lat", "lon", x.alias("x"), y.alias("y"))
    lon_b, lat_b = inv(F.col("x"), F.col("y"))
    err = prj.select(
        F.max(
            F.abs(lat_b - F.col("lat"))
            + F.abs(
                F.pmod(lon_b - F.col("lon") + 540.0, F.lit(360.0)) - 180.0
            )
        ).alias("e")
    ).collect()[0]["e"]
    assert err < 1e-9

    ident_f, ident_i = cf_transforms(
        {"grid_mapping_name": "latitude_longitude"}
    )
    a, b = ident_f(F.lit(10.0), F.lit(20.0))
    row = spark.range(1).select(a.alias("a"), b.alias("b")).collect()[0]
    assert (row["a"], row["b"]) == (10.0, 20.0)

    with _pt.raises(KeyError):
        cf_transforms({"grid_mapping_name": "geostationary"})
