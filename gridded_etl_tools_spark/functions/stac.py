"""STAC metadata artifacts (reference parity W16, plus the initial/merged
metadata fields of ``utils/metadata.py:242-269`` / ``870-921``).

The reference builds a catalog → collection → item JSON tree whose data-
derived fields (bbox, temporal extent, update cadence) come from the
published dataset (``utils/metadata.py:337-639``).  In Spark those fields
are one aggregate over the facts table — everything else is driver-side
dict assembly, which is deliberately kept as plain functions returning
JSON-able dicts (no data-plane involvement).

Version history on overwrite (reference ``store.py:398-422``) maps to the
table layer's retained manifest versions; `item_version_href` names them.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _iso(ts: dt.datetime | None) -> str | None:
    return ts.isoformat() + "Z" if ts is not None else None


def dataset_extent(
    df: DataFrame,
    time_col: str = "time",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> dict[str, Any]:
    """Spatiotemporal extent in one aggregate: bbox + [start, end]."""
    row = df.agg(
        F.min(time_col).alias("t0"), F.max(time_col).alias("t1"),
        F.min(lon_col).alias("w"), F.max(lon_col).alias("e"),
        F.min(lat_col).alias("s"), F.max(lat_col).alias("n"),
    ).collect()[0]
    return {
        "bbox": [float(row["w"]), float(row["s"]), float(row["e"]), float(row["n"])],
        "temporal": [_iso(row["t0"]), _iso(row["t1"])],
    }


def initial_metadata(spec, extra: dict[str, Any] | None = None) -> dict[str, Any]:
    """Static descriptive fields from the GridSpec (reference
    ``initial_metadata``'s declared subset)."""
    md = {
        "title": spec.dataset_name,
        "data variable": spec.data_var,
        "unit of measurement": spec.unit,
        "spatial resolution": spec.spatial_resolution,
        "temporal resolution": str(spec.time_resolution),
        "missing value": spec.missing_value,
    }
    md.update(extra or {})
    return md


def build_item(
    spec,
    df: DataFrame,
    properties: dict[str, Any] | None = None,
    time_col: str = "time",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> dict[str, Any]:
    """STAC Item for a published dataset: geometry/bbox/datetime come from
    the data, properties from the spec + caller."""
    ext = dataset_extent(df, time_col, lat_col, lon_col)
    w, s, e, n = ext["bbox"]
    props = initial_metadata(spec)
    props.update(
        {"start_datetime": ext["temporal"][0], "end_datetime": ext["temporal"][1]}
    )
    props.update(properties or {})
    return {
        "type": "Feature",
        "stac_version": "1.0.0",
        "id": spec.dataset_name,
        "bbox": ext["bbox"],
        "geometry": {
            "type": "Polygon",
            "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]],
        },
        "properties": props,
        "assets": {},
        "links": [],
    }


def build_collection(spec, items: list[dict[str, Any]]) -> dict[str, Any]:
    """STAC Collection wrapping item extents (union bbox, min/max time)."""
    bboxes = [i["bbox"] for i in items]
    times = [i["properties"] for i in items]
    return {
        "type": "Collection",
        "stac_version": "1.0.0",
        "id": spec.dataset_name,
        "description": f"{spec.dataset_name} published by gridded_etl_tools_spark",
        "license": "proprietary",
        "extent": {
            "spatial": {
                "bbox": [[
                    min(b[0] for b in bboxes), min(b[1] for b in bboxes),
                    max(b[2] for b in bboxes), max(b[3] for b in bboxes),
                ]]
            } if bboxes else {"bbox": []},
            "temporal": {
                "interval": [[
                    min(t["start_datetime"] for t in times),
                    max(t["end_datetime"] for t in times),
                ]]
            } if times else {"interval": []},
        },
        "links": [{"rel": "item", "href": f"./{i['id']}.json"} for i in items],
    }


def build_catalog(catalog_id: str, collections: list[dict[str, Any]]) -> dict[str, Any]:
    """Root STAC Catalog listing collections."""
    return {
        "type": "Catalog",
        "stac_version": "1.0.0",
        "id": catalog_id,
        "description": f"{catalog_id} root catalog",
        "links": [
            {"rel": "child", "href": f"./{c['id']}/collection.json"}
            for c in collections
        ],
    }


#: path parts per STAC entity kind (reference ``metadata.py:46`` StacType:
#: catalog at the store root, collections and items in subfolders)
CATALOG, COLLECTION, ITEM = "", "collections", "datasets"


class MetadataStore:
    """Driver-side STAC entity store with overwrite history (reference
    ``store.py:398-422`` (S3) / ``593-625`` (Local) ``push_metadata`` /
    ``retrieve_metadata``).

    Entirely metadata-plane: a handful of small JSON files per dataset,
    written by the driver after the data-plane commit — no Spark jobs.
    ``push`` snapshots any existing entity into
    ``history/<title>/<title>-<timestamp>.json`` before overwriting, so
    every previous version of an item stays browsable after an update,
    mirroring the reference's history-file copy."""

    def __init__(self, root: str):
        self.root = root

    def get_metadata_path(self, title: str, stac_type: str = ITEM) -> str:
        return os.path.join(self.root, stac_type, f"{title}.json")

    def _history_dir(self, title: str) -> str:
        return os.path.join(self.root, "history", title)

    def push(self, title: str, content: dict[str, Any], stac_type: str = ITEM) -> str:
        """Write (or overwrite) an entity; snapshot the old copy first."""
        path = self.get_metadata_path(title, stac_type)
        if os.path.exists(path):
            mtime = dt.datetime.fromtimestamp(
                os.stat(path).st_mtime, dt.timezone.utc
            ).replace(tzinfo=None)
            hdir = self._history_dir(title)
            os.makedirs(hdir, exist_ok=True)
            hpath = os.path.join(hdir, f"{title}-{mtime.isoformat(sep='T')}.json")
            # same-second overwrites (common in tests, rare in production)
            # must not clobber an earlier snapshot
            n = 0
            while os.path.exists(hpath):
                n += 1
                hpath = os.path.join(
                    hdir, f"{title}-{mtime.isoformat(sep='T')}.{n}.json"
                )
            shutil.copy(path, hpath)  # copy, not move: a crash mid-push
            # must leave the current entity in place
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(content, f, indent=2, sort_keys=True, default=str)
        os.replace(tmp, path)
        return path

    def retrieve(self, title: str, stac_type: str = ITEM) -> tuple[dict[str, Any], str]:
        path = self.get_metadata_path(title, stac_type)
        with open(path) as f:
            return json.load(f), path

    def history(self, title: str) -> list[str]:
        """Chronologically sorted hrefs of retained previous versions."""
        hdir = self._history_dir(title)
        if not os.path.isdir(hdir):
            return []
        return [os.path.join(hdir, name) for name in sorted(os.listdir(hdir))]


def merge_in_outside_metadata(
    attrs: dict[str, Any],
    df: DataFrame,
    update_is_append_only: bool,
    time_col: str = "time",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    now: dt.datetime | None = None,
) -> dict[str, Any]:
    """Post-write attr refresh (reference ``merge_in_outside_metadata``):
    date range, update date range, bbox, append-only flag."""
    ext = dataset_extent(df, time_col, lat_col, lon_col)
    out = dict(attrs)
    previous = attrs.get("date range")
    out["date range"] = ext["temporal"]
    if previous:
        out["update_date_range"] = [previous[1], ext["temporal"][1]]
    out["bbox"] = ext["bbox"]
    out["update_is_append_only"] = bool(update_is_append_only)
    if now is not None:
        out["update_previous_end_date"] = _iso(now)
    return out
