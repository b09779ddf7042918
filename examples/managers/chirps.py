"""CHIRPS manager hierarchy, Spark idiom — the example ETL the
reference ships (``examples/managers/chirps.py``): an abstract CHIRPS
base declaring everything the 0.05°/0.25° final/prelim variants share,
with concrete leaves per product.  What changes vs the reference:

* no chunk declarations — the reference's ``requested_dask_chunks`` /
  ``requested_zarr_chunks`` (chirps.py:27-28, 340-341) size the xarray
  compute and zarr storage grids; here the long-form table layer
  buckets by time and sorts (time, lat, lon) at write, so row-group
  pruning plays the role zarr chunk tiling plays (see
  ``operators/zorder.py`` for the 2-D locality variant);
* hooks operate on DataFrames — ``postprocess`` replaces
  ``remove_unwanted_fields`` / encoding surgery (chirps.py:235-281);
* extraction declares WHAT to fetch (``remote_files``); the engine
  fetches with the retry/pool machinery (``sources/extractor.py``).

Run one of these end-to-end with ``m.run_etl(spark, raw_dir)`` once the
raw NetCDF files are on disk — tests/test_examples.py does exactly
that against synthetic CHIRPS-shaped files.
"""

from __future__ import annotations

import datetime as dt

from gridded_etl_tools_spark.manager import DatasetManager
from gridded_etl_tools_spark.sources.extractor import FTPExtractor


class CHIRPS(DatasetManager):
    """Climate Hazards Group InfraRed Precipitation with Station data
    (reference ``examples/managers/chirps.py:16-281``): daily global
    precipitation, CF time axis "days since 1981-01-01", provider
    sentinel -9999 for missing cells."""

    dataset_name = "chirps_spark_example"
    category = "observation"
    data_var = "precip"
    unit = "mm"
    time_resolution = "daily"
    missing_value = -9999.0
    time_epoch = dt.datetime(1981, 1, 1)
    time_unit = "days"
    #: CHIRPS publishes 0-360 longitudes; ingest standardizes to
    #: [-180, 180) (reference ``standardize_longitudes``)
    standardize_longitudes = True

    #: reference ``dataset_download_url`` (chirps.py:128)
    download_host = "ftp.chc.ucsb.edu"

    def remote_files(self, date_range=None) -> list[str]:
        """List the provider's files for the requested range (reference
        ``extract``, chirps.py:158-205: FTP listing filtered by year).
        Network-free by default — wire ``connect`` for a live session."""
        ftp = FTPExtractor()
        ftp.host = self.download_host
        ftp.cwd = self._remote_dir()
        pattern = r"\.nc$"
        if date_range is not None:
            years = range(date_range[0].year, date_range[1].year + 1)
            pattern = "(" + "|".join(str(y) for y in years) + r").*\.nc$"
        return ftp.find(pattern)

    def _remote_dir(self) -> str:
        raise NotImplementedError("declared per product leaf")


class CHIRPSFinal(CHIRPS):
    """Finalized (station-corrected) product line (chirps.py:282-303)."""

    dataset_name = "chirps_spark_example_final"


class CHIRPSFinal05(CHIRPSFinal):
    """0.05° final product (chirps.py:305-327)."""

    dataset_name = "chirps_spark_example_final_05"
    spatial_resolution = 0.05

    def _remote_dir(self) -> str:
        return "pub/org/chc/products/CHIRPS-2.0/global_daily/netcdf/p05"


class CHIRPSFinal25(CHIRPSFinal):
    """0.25° final product (chirps.py:329-364)."""

    dataset_name = "chirps_spark_example_final_25"
    spatial_resolution = 0.25

    def _remote_dir(self) -> str:
        return "pub/org/chc/products/CHIRPS-2.0/global_daily/netcdf/p25"


class CHIRPSPrelim05(CHIRPS):
    """Preliminary (pre-station-correction) 0.05° product
    (chirps.py:366-393) — same grid as Final05, faster availability,
    values later superseded by final data via the insert/overwrite
    publish branch."""

    dataset_name = "chirps_spark_example_prelim_05"
    spatial_resolution = 0.05

    def _remote_dir(self) -> str:
        return "pub/org/chc/products/CHIRPS-2.0/prelim/global_daily/netcdf/p05"
