"""Publish orchestration: the reference's parse/publish lifecycle
(SURVEY §2.2 W1-W9, W11) over :class:`~.table.GriddedTable`.

Flow parity with ``gridded_etl_tools/utils/publish.py``:

* :func:`publish` — three-way branch initial/update/error
  (``publish_data``, publish.py:86-129).
* update path (``update_zarr``, publish.py:322-356): split update times
  into inserts (∩ existing) and appends (− existing) with broadcast
  semi/anti joins (``prepare_update_times``, 377-404); gate with the QC
  checks; insert per region via bucket overwrite widened by
  ``combine_first`` (``insert_into_dataset`` 406-450 +
  ``complete_insert_slice`` 1341-1385); append the rest (452-478).
* every write goes through the table's commit protocol, which carries
  the ``update_in_progress`` flag and failed-write-never-corrupts
  semantics of the ``to_zarr`` wrapper (155-268).

All decisions that need data (time splits, bucket sets) are computed in
Spark; only the tiny distinct-bucket list is collected.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridded_etl_tools_spark.gridspec import GridSpec
from gridded_etl_tools_spark.operators import qc as qc_ops
from gridded_etl_tools_spark.operators.joins import combine_first
from gridded_etl_tools_spark.sinks.table import GriddedTable, TableCorruptionGuard


class PublishError(RuntimeError):
    pass


def publish(
    table: GriddedTable,
    update: DataFrame,
    spec: GridSpec,
    expected_delta: dt.timedelta | None = None,
    rebuild: bool = False,
    allow_overwrite: bool = False,
    dry_run: bool = False,
    run_quality_checks: bool = True,
    attrs_update: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Entry point (reference ``publish_data``).  Returns a small report
    dict: {mode, n_inserted_times, n_appended_times, version}."""
    spark = update.sparkSession
    exists = table.exists()
    if exists and rebuild and not allow_overwrite:
        raise PublishError(
            "rebuild requested but allow_overwrite not set; refusing to "
            "overwrite existing dataset"  # reference publish.py:116-126
        )

    # every declared variable must actually be a column of the update —
    # a frame missing one would otherwise publish a silently narrower
    # table (schema-only check, no job)
    missing = [v for v in spec.data_vars if v not in update.columns]
    if missing:
        raise PublishError(
            f"update frame is missing declared data variable(s) "
            f"{missing}; spec declares {spec.data_vars}"
        )

    if run_quality_checks:
        # cadence/delta are var-independent: one pass.  Value bounds
        # gate EVERY declared variable in ONE job (an OR of per-var
        # out-of-bounds predicates) — a per-var pre_parse call would
        # re-execute the whole update lineage once per variable.
        qc_ops.pre_parse_quality_check(
            update,
            value_col=spec.data_var,
            expected_delta=None if spec.update_cadence_bounds else expected_delta,
            cadence_bounds=_bounds_td(spec) if spec.update_cadence_bounds else None,
            value_bounds=None,
            time_col=table.time_col,
        )
        if spec.value_bounds is not None:
            lo, hi = spec.value_bounds
            bad = F.lit(False)
            for var in spec.data_vars:
                c = F.col(var)
                bad = bad | (
                    c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi))
                )
            qc_ops.assert_empty(
                update.filter(bad), "value outside physical bounds"
            )

    if dry_run:
        # reference to_zarr wrapper: dry run exits before any mutation
        return {"mode": "dry_run", "version": None}

    sort_cols = list(spec.spatial_dims)
    if not exists or rebuild:
        # spatial dims double as declared stat columns: every file the
        # table ever writes (initial, append, merge/delete rewrites)
        # carries per-file min/max for them, so bbox reads and keyed
        # merges get manifest pruning from day one — before any OPTIMIZE
        snap = table.write_initial(
            update, sort_cols=sort_cols, attrs=attrs_update or {},
            overwrite=rebuild, stat_cols=sort_cols,
        )
        return {"mode": "initial", "version": snap.version}

    return _update(
        table, update, spec, spark,
        expected_delta=expected_delta,
        attrs_update=attrs_update,
        run_quality_checks=run_quality_checks,
        sort_cols=sort_cols,
    )


def _bounds_td(spec: GridSpec) -> tuple[dt.timedelta, dt.timedelta] | None:
    if spec.update_cadence_bounds is None:
        return None
    lo, hi = spec.update_cadence_bounds
    return dt.timedelta(days=lo), dt.timedelta(days=hi)


def _update(
    table: GriddedTable,
    update: DataFrame,
    spec: GridSpec,
    spark: SparkSession,
    expected_delta: dt.timedelta | None,
    attrs_update: dict[str, Any] | None,
    run_quality_checks: bool,
    sort_cols: list[str],
) -> dict[str, Any]:
    tcol = table.time_col
    existing_times = table.distinct_times(spark)

    if run_quality_checks:
        msgs = qc_ops.update_position_violations(
            update, table.read(spark), time_col=tcol, expected_delta=expected_delta
        )
        if msgs:
            raise qc_ops.QualityCheckError("; ".join(msgs))

    upd_times = update.select(tcol).distinct()
    insert_times = upd_times.join(F.broadcast(existing_times), on=tcol, how="left_semi")
    append_times = upd_times.join(F.broadcast(existing_times), on=tcol, how="left_anti")

    n_insert = insert_times.count()
    n_append = append_times.count()
    if n_insert == 0 and n_append == 0:
        raise qc_ops.QualityCheckError("empty update")  # reference publish.py:341-346

    version = None
    if n_insert:
        version = insert_into(
            table, update.join(F.broadcast(insert_times), on=tcol, how="left_semi"),
            spec, sort_cols=sort_cols, attrs_update=attrs_update,
        )
    if n_append:
        snap = table.append(
            update.join(F.broadcast(append_times), on=tcol, how="left_semi"),
            sort_cols=sort_cols,
            attrs_update=attrs_update,
        )
        version = snap.version
    return {
        "mode": "update",
        "n_inserted_times": n_insert,
        "n_appended_times": n_append,
        "version": version,
    }


def insert_into(
    table: GriddedTable,
    inserts: DataFrame,
    spec: GridSpec,
    sort_cols: list[str],
    attrs_update: dict[str, Any] | None = None,
) -> int:
    """Insert-as-surgical-bucket-overwrite with combine_first widening.

    The overwrite unit is a whole time bucket (the reference widens
    region writes to whole zarr chunks, ``complete_insert_slice``
    publish.py:1341-1385, for the same reason: partial-chunk region
    writes drop data).  New bucket contents = update rows coalesced over
    existing rows, full-outer on the key dims — untouched cells survive.
    """
    spark = inserts.sparkSession
    tcol = table.time_col
    buckets = {
        r["b"]
        for r in inserts.select(
            F.date_format(F.col(tcol), table.bucket_fmt).alias("b")
        ).distinct().collect()
    }
    existing = table.read(spark)
    existing_slice = existing.filter(
        F.date_format(F.col(tcol), table.bucket_fmt).isin(sorted(buckets))
    )
    keys = [tcol, *spec.spatial_dims]
    extra_keys = [
        c for c in spec.key_dims if c not in keys and c in inserts.columns
    ]
    # Coalesce over EVERY non-key column of the existing table, not just
    # spec.data_var — otherwise extra columns are silently dropped from the
    # rewritten buckets and the overwritten files get a narrower schema
    # than untouched ones (schema drift under spark.read without
    # mergeSchema).  Columns absent from the update side pass through
    # combine_first as existing-only values.
    all_keys = keys + extra_keys
    value_cols = sorted(
        {c for c in existing_slice.columns if c not in all_keys}
        | {c for c in inserts.columns if c not in all_keys}
    )
    widened = combine_first(
        inserts, existing_slice, keys=all_keys, value_cols=value_cols
    )
    snap = table.overwrite_buckets(
        widened, buckets, sort_cols=sort_cols, attrs_update=attrs_update
    )
    return snap.version


__all__ = [
    "publish",
    "insert_into",
    "PublishError",
    "GriddedTable",
    "TableCorruptionGuard",
]
