"""gridded_etl_tools_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Arbol-Project/gridded-etl-tools.

The reference (studied read-only at /root/reference/) is an xarray/Dask/Zarr
climate-ETL framework.  This package re-expresses its data model and every
operator in idiomatic PySpark:

* N-D labeled arrays  -> long-form DataFrames (one row per cell per timestep)
  plus a :class:`~gridded_etl_tools_spark.gridspec.GridSpec` metadata object.
* Zarr chunked store  -> partitioned Parquet managed by a manifest-based
  commit protocol (:mod:`gridded_etl_tools_spark.sinks.table`).
* xarray selection / alignment / reduction -> DataFrame ops planned by
  Catalyst (:mod:`gridded_etl_tools_spark.operators`).

Beyond reference parity, :mod:`operators.dedup`, :mod:`operators.similarity`
and :mod:`operators.text` add the LLM-training-data-pipeline operators
(dedup, ANN search, text analysis) the north star asks for.
"""

from gridded_etl_tools_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
