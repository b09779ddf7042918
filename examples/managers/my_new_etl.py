"""Template for a new gridded-dataset ETL (the Spark-idiom counterpart
of the reference's ``examples/managers/my_new_etl.py``): copy this
file, fill the class attributes, override only the hooks your provider
needs.  Every attribute below maps to a reference declaration
(``gridded_etl_tools/utils/attributes.py:62-314``); the lifecycle —
decode, sentinel→NULL, longitude standardization, cadence/value QC,
3-way publish, post-parse audit — is inherited.

Minimal usage::

    m = MyNewETL(table_root="/data/tables/my_dataset")
    m.run_etl(spark, "/data/raw/my_dataset/",
              expected_delta=datetime.timedelta(days=1))

``transform`` reads ANY mix of supported containers in the input
directory (NetCDF3/4, GRIB1/2, GeoTIFF, Zarr v2/v3, kerchunk
manifests) through the magic-byte front door — ``file_type`` needs no
declaration here.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gridded_etl_tools_spark.manager import DatasetManager


class MyNewETL(DatasetManager):
    # -- identity (reference attributes.py:118-147) --------------------
    dataset_name = "my_dataset"          # registry key for get_manager()
    category = "observation"             # observation | forecast | ensemble | hindcast
    data_var = "value"                   # canonical data-variable name (Q7 rename)
    # extra_data_vars = ("tmax", "tmin") # multi-variable datasets (ERA5
    #                                    # shape): each var scans from the
    #                                    # same files and lands as its own
    #                                    # column; QC gates every var
    unit = "unknown"                     # unit of measurement (STAC metadata)

    # -- axes ----------------------------------------------------------
    time_resolution = "daily"            # daily | hourly | monthly | ...
    spatial_dims = ("latitude", "longitude")
    spatial_resolution = None            # grid cell size in degrees, if regular
    spatial_precision = 5                # coordinate rounding at ingest

    # -- provider quirks ----------------------------------------------
    missing_value = -9999.0              # provider sentinel -> NULL (S12)
    standardize_longitudes = True        # 0-360 -> [-180, 180) (Q8)
    time_epoch = dt.datetime(1970, 1, 1)  # CF "days since <epoch>"
    time_unit = "days"                   # days | hours | seconds

    # -- QC declarations (reference publish.py:624-778) ----------------
    update_cadence_bounds = None         # (lo, hi) steps for irregular cadence
    expected_nan_frequency = None        # enables the binomial NaN gate (A4)

    # -- hooks (override only what the provider needs) -----------------

    def remote_files(self, date_range=None) -> list[str]:
        """WHAT to fetch; the engine fetches (pool / fetch_distributed,
        sources/extractor.py).  Return [] for drop-directory ingest."""
        return []

    def preprocess(self, df: DataFrame) -> DataFrame:
        """Raw decoded long frame -> fixed frame, BEFORE normalization
        and QC (reference preprocess_zarr).  Example: drop a provider
        diagnostics band."""
        return df

    def postprocess(self, df: DataFrame) -> DataFrame:
        """AFTER normalization, before publish (reference
        postprocess_zarr / remove_unwanted_fields).  Example: clamp
        negative precipitation artifacts to zero."""
        if "value" in df.columns:
            return df.withColumn(
                "value", F.greatest(F.col("value"), F.lit(0.0))
            )
        return df
