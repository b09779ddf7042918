"""DatasetManager: the reference's top-level user surface, Spark-first.

A reference user runs the ETL by SUBCLASSING ``DatasetManager``
(``gridded_etl_tools/dataset_manager.py:28``): class attributes declare
the dataset (name, dims, resolution, sentinel), hook methods customize
ingest, and ``extract → transform → parse`` drives the lifecycle.  This
module is the same contract over this engine's pieces:

* declaration   → a :class:`~gridded_etl_tools_spark.gridspec.GridSpec`
  built from subclass class attributes (reference
  ``utils/attributes.py:111-296``);
* registry      → :meth:`DatasetManager.get_manager` walks the subclass
  tree by ``dataset_name`` with a ``time_resolution`` tie-break
  (reference ``dataset_manager.py:494-534``);
* extract       → subclass ``remote_files()`` +
  ``sources/extractor`` fetch helpers (reference ``utils/extractor``);
* transform     → ``sources/scan.scan_gridded`` (magic-byte front door
  over NetCDF3/4, GRIB1/2, GeoTIFF, Zarr, kerchunk) + normalization
  (sentinel→NULL, longitude standardization, coordinate
  canonicalization) + ``preprocess``/``postprocess`` hook methods
  (reference ``utils/transform.py:347-396,614-650``);
* parse/publish → ``sinks/publish.publish`` into the manager's
  :class:`~gridded_etl_tools_spark.sinks.table.GriddedTable` (initial /
  insert / append with QC gates and the atomic commit protocol).

The hooks are DataFrame→DataFrame (they stay inside Catalyst); only
genuinely custom numeric work should reach for a pandas UDF.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridded_etl_tools_spark.functions.logging import DatasetLogging
from gridded_etl_tools_spark.gridspec import GridSpec
from gridded_etl_tools_spark.sinks.publish import publish
from gridded_etl_tools_spark.sinks.table import GriddedTable


class ManagerLookupError(LookupError):
    pass


class DatasetManager(DatasetLogging):
    """Subclass per dataset; declare the class attributes, override the
    hooks you need.  Instances are cheap — state is the table path."""

    #: required declaration (reference attributes.py: abstract class
    #: properties enforced at first use, not import)
    dataset_name: str | None = None
    data_var: str = "value"
    #: further value columns for multi-variable datasets (ERA5-style);
    #: transform() scans each var from the same raw files and joins on
    #: the dim key — see GridSpec.extra_data_vars
    extra_data_vars: tuple[str, ...] = ()
    unit: str | None = None
    category: str = "observation"
    spatial_dims: tuple[str, str] = ("latitude", "longitude")
    spatial_resolution: float | None = None
    spatial_precision: int = 5
    missing_value: float | None = None
    time_resolution: str = "daily"
    update_cadence_bounds: tuple[int, int] | None = None
    expected_nan_frequency: float | None = None
    #: western-hemisphere-negative longitude canonicalization at ingest
    standardize_longitudes: bool = True
    #: CF time decode declaration (reference ``metadata.py:816-848``
    #: time encodings / ``dataset_start_date``): the scan front door
    #: emits each file's raw numeric time coordinate ("<unit> since
    #: <epoch>"); the manager materializes real timestamps from it.
    #: GRIB-family sources already arrive as days since 1970-01-01, so
    #: the default epoch is the identity for them.
    time_epoch: dt.datetime = dt.datetime(1970, 1, 1)
    time_unit: str = "days"  # days | hours | seconds

    def __init__(self, table_root: str, time_col: str = "time"):
        if self.dataset_name is None:
            raise TypeError(
                f"{type(self).__name__} must declare dataset_name "
                "(reference attributes.py:111-296 required class attrs)"
            )
        self.table = GriddedTable(table_root, time_col=time_col)

    # -- declaration ---------------------------------------------------

    @classmethod
    def spec(cls) -> GridSpec:
        return GridSpec(
            dataset_name=cls.dataset_name or cls.__name__,
            data_var=cls.data_var,
            extra_data_vars=tuple(cls.extra_data_vars),
            unit=cls.unit,
            category=cls.category,
            spatial_dims=cls.spatial_dims,
            spatial_resolution=cls.spatial_resolution,
            spatial_precision=cls.spatial_precision,
            missing_value=cls.missing_value,
            time_resolution=cls.time_resolution,
            update_cadence_bounds=cls.update_cadence_bounds,
            expected_nan_frequency=cls.expected_nan_frequency,
        )

    # -- registry (reference dataset_manager.py:494-534) ---------------

    @classmethod
    def _walk(cls):
        for sub in cls.__subclasses__():
            yield sub
            yield from sub._walk()

    @classmethod
    def get_manager(
        cls, dataset_name: str, time_resolution: str | None = None
    ) -> type["DatasetManager"]:
        """Find the manager subclass for ``dataset_name``; when several
        resolutions of one dataset exist, ``time_resolution`` breaks the
        tie (exactly the reference's lookup semantics).

        Matching the reference ``get_subclass`` (dataset_manager.py:
        494-534): abstract classes are skipped, and when one hit is a
        proper ancestor of another (a concrete manager subclassed to
        override a hook) the LEAF subclass wins instead of declaring
        ambiguity — so hook-override subclasses stay resolvable."""
        import inspect

        hits = [
            s
            for s in cls._walk()
            if s.dataset_name == dataset_name and not inspect.isabstract(s)
        ]
        if time_resolution is not None:
            hits = [s for s in hits if s.time_resolution == time_resolution]
        # prefer leaves, but only when the descendant SHADOWS the
        # ancestor (same time_resolution, i.e. a hook-override
        # subclass); two resolutions of one dataset stay ambiguous
        hits = [
            h
            for h in hits
            if not any(
                o is not h
                and issubclass(o, h)
                and o.time_resolution == h.time_resolution
                for o in hits
            )
        ]
        if not hits:
            raise ManagerLookupError(
                f"no manager for {dataset_name!r}"
                + (f" at {time_resolution!r}" if time_resolution else "")
            )
        if len(hits) > 1:
            raise ManagerLookupError(
                f"ambiguous managers for {dataset_name!r}: "
                f"{[h.__name__ for h in hits]}; pass time_resolution"
            )
        return hits[0]

    # -- extract -------------------------------------------------------

    def remote_files(self, date_range=None) -> list[str]:
        """Subclass hook: list the remote files for a date range
        (reference ``get_links``/``find`` catalog discovery).  The base
        returns [] — local-input pipelines skip extraction."""
        return []

    # -- transform hooks (reference transform.py:347-396,614-650) ------

    def preprocess(self, df: DataFrame) -> DataFrame:
        """Runs on the raw decoded long-form frame, before
        normalization (reference ``preprocess_kerchunk`` analog)."""
        return df

    def postprocess(self, df: DataFrame) -> DataFrame:
        """Runs after normalization, before publish (reference
        ``postprocess_zarr`` analog)."""
        return df

    def decode_dims(self) -> list[str]:
        """The dims the RAW FILES carry — what ``transform`` asks the
        format front door to decode.  Defaults to the category's key
        dims; hindcast managers override it to the 4-D forecast key
        (forecast_reference_time, step, ensemble, lat, lon) and derive
        the 6-D hindcast axes (hindcast_reference_time,
        forecast_reference_offset) in :meth:`postprocess`, mirroring
        the reference's forecast→hindcast reshape
        (``utils/transform.py:737-753``)."""
        return self.spec().key_dims

    # -- transform -----------------------------------------------------

    def transform(self, spark: SparkSession, input_path: str) -> DataFrame:
        """Decode + normalize a directory of raw files into the
        canonical long form: the format front door, the subclass
        preprocess hook, sentinel→NULL, longitude standardization,
        coordinate rounding to ``spatial_precision`` (float32 label
        drift guard — reference attributes.py:183-186), canonical
        column order, and the postprocess hook."""
        from gridded_etl_tools_spark.functions.normalize import (
            sentinel_to_null,
            standardize_longitude,
        )
        from gridded_etl_tools_spark.sources.scan import scan_gridded

        spec = self.spec()
        dims = list(self.decode_dims())
        self.info(f"transforming raw files at {input_path} -> dims {dims}")
        # the front door emits a uniform numeric schema: one double per
        # dim (datetime axes as fractional epoch days) + a column named
        # "value" for the requested variable.  Multi-variable datasets
        # scan each declared var from the SAME raw files and equi-join
        # on the dim key (the dims partition identically across scans,
        # so at scale these are co-partitioned joins over one listing).
        df = scan_gridded(spark, input_path, spec.data_var, dims=dims)
        for var in spec.extra_data_vars:
            extra = scan_gridded(spark, input_path, var, dims=dims).select(
                *dims, F.col("value").alias(f"__{var}")
            )
            df = df.join(extra, on=dims, how="full_outer")
        df = self.preprocess(df)
        if spec.missing_value is not None:
            df = sentinel_to_null(df, "value", spec.missing_value)
            for var in spec.extra_data_vars:
                df = sentinel_to_null(df, f"__{var}", spec.missing_value)
        unit_us = {
            "days": 86_400_000_000.0,
            "hours": 3_600_000_000.0,
            "seconds": 1_000_000.0,
        }[self.time_unit]
        epoch_us = int(
            (self.time_epoch - dt.datetime(1970, 1, 1)).total_seconds()
            * 1_000_000
        )
        for d in dims:
            if d == "time" or d.endswith("_reference_time"):
                df = df.withColumn(
                    d,
                    F.timestamp_micros(
                        F.round(F.col(d) * unit_us).cast("long")
                        + F.lit(epoch_us)
                    ),
                )
            elif d in ("step", "forecast_reference_offset"):
                # decoder emits seconds / days as double; key type LONG
                df = df.withColumn(d, F.round(F.col(d)).cast("long"))
            elif d == "ensemble":
                df = df.withColumn(d, F.round(F.col(d)).cast("int"))
        lat_dim, lon_dim = spec.spatial_dims
        if self.standardize_longitudes:
            df = df.withColumn(lon_dim, standardize_longitude(F.col(lon_dim)))
        for d in spec.spatial_dims:
            df = df.withColumn(d, F.round(F.col(d), spec.spatial_precision))
        df = df.select(
            *dims,
            F.col("value").alias(spec.data_var),
            *[
                F.col(f"__{var}").alias(var)
                for var in spec.extra_data_vars
            ],
        )
        return self.postprocess(df)

    # -- parse / publish ----------------------------------------------

    def parse(
        self,
        update: DataFrame,
        expected_delta: dt.timedelta | None = None,
        **publish_kwargs: Any,
    ) -> dict[str, Any]:
        """Publish the transformed frame: initial write, append, or
        insert-region update — QC gates and the atomic manifest commit
        included (reference ``parse``/``publish_data``/``to_zarr``).
        Emits the reference's parse audit trail through the
        dataset-named logger (``DatasetLogging``)."""
        self.info(f"parsing update into {self.table.root}")
        result = publish(
            self.table, update, self.spec(),
            expected_delta=expected_delta, **publish_kwargs,
        )
        self.info(f"parse complete: {result}")
        return result

    def run_etl(
        self,
        spark: SparkSession,
        input_path: str,
        expected_delta: dt.timedelta | None = None,
        **publish_kwargs: Any,
    ) -> dict[str, Any]:
        """transform + parse in one call — the reference's
        ``run_etl`` test harness shape (``tests/common.py:23-75``)."""
        return self.parse(
            self.transform(spark, input_path),
            expected_delta=expected_delta,
            **publish_kwargs,
        )
