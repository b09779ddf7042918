"""GridSpec: the metadata companion of a long-form gridded DataFrame.

The reference encodes a dataset's shape in subclass *class attributes*
(``gridded_etl_tools/utils/attributes.py:111-296``: ``dataset_name``,
``spatial_resolution``, ``spatial_precision``, ``missing_value``,
``time_resolution`` …) and its dimension set in ``set_key_dims``
(``utils/transform.py:737-753``): observation datasets key on
``["time", lat, lon]``, forecasts add ``forecast_reference_time``/``step``,
ensembles add ``ensemble``, hindcasts key on four non-spatial dims.

Here the same declaration is a plain dataclass.  The long-form schema is
derived from it: one row per grid cell per (time-like) key tuple, one
float value column.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

#: Dataset categories and their non-spatial key dims, mirroring
#: reference utils/transform.py:737-753 (set_key_dims).
CATEGORY_DIMS: dict[str, list[str]] = {
    "observation": ["time"],
    "forecast": ["forecast_reference_time", "step"],
    "ensemble": ["forecast_reference_time", "step", "ensemble"],
    "hindcast": [
        "hindcast_reference_time",
        "forecast_reference_offset",
        "step",
        "ensemble",
    ],
}

#: Extreme physical bounds per unit for value QC, mirroring
#: reference utils/attributes.py:328-331 (EXTREME_VALUES_BY_UNIT).
EXTREME_VALUES_BY_UNIT: dict[str, tuple[float, float]] = {
    "deg_C": (-90.0, 60.0),
    "K": (183.15, 333.15),
    "deg_F": (-129.0, 140.0),
}


@dataclass
class GridSpec:
    """Declarative description of one gridded dataset."""

    dataset_name: str
    data_var: str = "value"
    #: additional value columns beyond ``data_var`` — the multi-variable
    #: surface (ERA5-style datasets carry e.g. t2m + d2m + sp in one
    #: grid).  The reference is one-data-var-per-dataset by declaration
    #: (attributes.py: ``data_var`` is scalar); this EXCEEDS parity: the
    #: long form simply carries one float column per variable, and the
    #: publish/QC/table layers treat every declared var uniformly.  All
    #: vars share ``unit``/``missing_value`` (declare separate datasets
    #: when physics differ).
    extra_data_vars: tuple[str, ...] = ()
    unit: str | None = None
    category: str = "observation"
    spatial_dims: tuple[str, str] = ("latitude", "longitude")
    #: degrees (or projected units) between adjacent cells
    spatial_resolution: float | None = None
    #: decimal places coordinates are rounded to at ingest; the reference
    #: (attributes.py:183-186) uses this to avoid float32 label drift —
    #: we canonicalize keys the same way so equi-joins are exact.
    spatial_precision: int = 5
    #: provider sentinel rewritten to NULL at ingest
    #: (reference attributes.py:203-206, transform.py:347-375)
    missing_value: float | None = None
    time_resolution: str = "daily"
    #: irregular-cadence tolerance (lo, hi) as day counts; None = regular
    #: (reference attributes.py:250-257 update_cadence_bounds)
    update_cadence_bounds: tuple[int, int] | None = None
    expected_nan_frequency: float | None = None
    bbox_rounding_value: int = 2
    #: CRS well-known text for projected grids (reference
    #: util_funcs/projections.py:6-43); None = EPSG:4326 lat/lon
    crs_wkt: str | None = None
    attrs: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        # refuse ambiguous declarations HERE, not as an
        # AMBIGUOUS_REFERENCE deep inside transform/publish: value
        # columns must be distinct from each other and from every dim
        names = self.data_vars
        if len(set(names)) != len(names):
            raise ValueError(
                f"duplicate data variable names in {names} "
                "(data_var + extra_data_vars must be distinct)"
            )
        clash = set(names) & set(self.key_dims)
        if clash:
            raise ValueError(
                f"data variable(s) {sorted(clash)} collide with the "
                f"dataset's dimension names {self.key_dims}"
            )

    @property
    def key_dims(self) -> list[str]:
        """Standard dims = category dims + spatial dims (composite PK)."""
        return CATEGORY_DIMS[self.category] + list(self.spatial_dims)

    @property
    def data_vars(self) -> list[str]:
        """Every declared value column, primary first."""
        return [self.data_var, *self.extra_data_vars]

    @property
    def standard_columns(self) -> list[str]:
        return self.key_dims + self.data_vars

    def schema(self) -> T.StructType:
        """Long-form schema.  Coordinates are DOUBLE (float32 coords are a
        round-trip hazard as join keys), values FLOAT (reference default
        dtype '<f4', attributes.py:172-175)."""
        fields: list[T.StructField] = []
        for dim in self.key_dims:
            if dim in self.spatial_dims:
                fields.append(T.StructField(dim, T.DoubleType(), False))
            elif dim in ("step", "forecast_reference_offset"):
                fields.append(T.StructField(dim, T.LongType(), False))
            elif dim == "ensemble":
                fields.append(T.StructField(dim, T.IntegerType(), False))
            else:
                fields.append(T.StructField(dim, T.TimestampType(), False))
        for var in self.data_vars:
            fields.append(T.StructField(var, T.FloatType(), True))
        return T.StructType(fields)

    @property
    def value_bounds(self) -> tuple[float, float] | None:
        if self.unit is None:
            return None
        return EXTREME_VALUES_BY_UNIT.get(self.unit)
