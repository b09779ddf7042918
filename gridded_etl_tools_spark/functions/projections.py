"""Generic CF ``grid_mapping`` projection registry — column math only.

Reference parity: ``util_funcs/projections.py:6-43`` hands a CF
grid-mapping attrs dict to metpy/pyproj and gets an ``assign_y_x``
transform back.  This module is the Spark-native equivalent: a registry
keyed by ``grid_mapping_name`` whose entries build FORWARD
(lon/lat → x/y) and INVERSE (x/y → lon/lat) transforms as plain JVM
column expressions (Snyder, "Map Projections — A Working Manual",
spherical forms) — no pyproj, no UDF, whole-stage codegen, and every
formula is mirrorable in an engine-independent SQL oracle
(``plans/catalog.py::cf_gridmapping_reproject``).

Registered mappings: ``latitude_longitude`` (identity),
``lambert_conformal_conic`` (delegates to ``functions/conventions``),
``mercator``, ``polar_stereographic``, ``rotated_latitude_longitude``
(rotation-matrix construction, exact involution) — the grid families
the reference's example managers actually publish (GRIB2 templates
3.0/3.1/3.10/3.20/3.30 cover the same set on the ingest side).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import functions as F

#: grid_mapping_name -> builder(attrs) -> (forward, inverse)
#: forward(lon_col, lat_col) -> (x_col, y_col)
#: inverse(x_col, y_col) -> (lon_col, lat_col)
CF_PROJECTIONS: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        CF_PROJECTIONS[name] = fn
        return fn
    return deco


def cf_transforms(attrs: dict):
    """Dispatch a CF grid-mapping attrs dict to its (forward, inverse)
    column-expression builders.  Raises KeyError for unregistered
    mappings — the caller decides whether to fall back to a UDF path."""
    name = attrs.get("grid_mapping_name")
    if name not in CF_PROJECTIONS:
        raise KeyError(
            f"unregistered grid_mapping_name {name!r}; "
            f"known: {sorted(CF_PROJECTIONS)}"
        )
    return CF_PROJECTIONS[name](attrs)


def _radius(attrs: dict) -> float:
    return float(attrs.get("earth_radius", 6371229.0))


def _wrap_lon(col):
    return F.pmod(col + F.lit(540.0), F.lit(360.0)) - F.lit(180.0)


@register("latitude_longitude")
def _latlon(attrs: dict):
    def fwd(lon, lat):
        return lon, lat

    def inv(x, y):
        return x, y

    return fwd, inv


@register("lambert_conformal_conic")
def _lcc(attrs: dict):
    from gridded_etl_tools_spark.functions.conventions import (
        lcc_constants,
        lcc_forward,
        lcc_inverse,
    )

    sp = attrs["standard_parallel"]
    p1, p2 = (sp, sp) if isinstance(sp, (int, float)) else (sp[0], sp[1])
    c = lcc_constants(
        p1,
        p2,
        attrs["latitude_of_projection_origin"],
        attrs["longitude_of_central_meridian"],
        _radius(attrs),
    )
    return (
        lambda lon, lat: lcc_forward(lon, lat, c),
        lambda x, y: lcc_inverse(x, y, c),
    )


@register("mercator")
def _mercator(attrs: dict):
    """Spherical Mercator with a true-scale parallel (Snyder 7-1..7-5):
    k = cos(phi_ts); x = R k Δλ; y = R k ln tan(π/4 + φ/2)."""
    radius = _radius(attrs)
    lon0 = float(attrs.get("longitude_of_projection_origin", 0.0))
    k = math.cos(math.radians(float(attrs.get("standard_parallel", 0.0))))
    rk = radius * k

    def fwd(lon, lat):
        dlon = _wrap_lon(lon - F.lit(lon0))
        x = F.lit(rk) * F.radians(dlon)
        y = F.lit(rk) * F.log(
            F.tan(F.lit(math.pi / 4) + F.radians(lat) / 2)
        )
        return x, y

    def inv(x, y):
        lon = _wrap_lon(F.lit(lon0) + F.degrees(x / F.lit(rk)))
        lat = F.degrees(
            F.lit(2.0) * F.atan(F.exp(y / F.lit(rk))) - F.lit(math.pi / 2)
        )
        return lon, lat

    return fwd, inv


@register("polar_stereographic")
def _polar_stereo(attrs: dict):
    """Spherical polar stereographic, north or south aspect (Snyder
    21-1..21-15): rho = 2 R k0 tan(π/4 ∓ φ/2) with k0 from the
    true-scale parallel."""
    radius = _radius(attrs)
    lon0 = float(attrs["straight_vertical_longitude_from_pole"])
    lat_ts = float(attrs.get("standard_parallel", 90.0))
    south = float(attrs.get("latitude_of_projection_origin", 90.0)) < 0
    sgn = -1.0 if south else 1.0
    k0 = (1.0 + math.sin(math.radians(sgn * lat_ts))) / 2.0
    two_rk0 = 2.0 * radius * k0

    def fwd(lon, lat):
        dlam = F.radians(_wrap_lon(lon - F.lit(lon0)))
        rho = F.lit(two_rk0) * F.tan(
            F.lit(math.pi / 4) - F.radians(F.lit(sgn) * lat) / 2
        )
        x = rho * F.sin(dlam)
        y = F.lit(-sgn) * rho * F.cos(dlam)
        return x, y

    def inv(x, y):
        rho = F.sqrt(x * x + y * y)
        lat = F.lit(sgn) * F.degrees(
            F.lit(math.pi / 2)
            - F.lit(2.0) * F.atan(rho / F.lit(two_rk0))
        )
        lon = _wrap_lon(
            F.lit(lon0) + F.degrees(F.atan2(x, F.lit(-sgn) * y))
        )
        return lon, lat

    return fwd, inv


@register("rotated_latitude_longitude")
def _rotated(attrs: dict):
    """Rotated-pole transform as an explicit rotation matrix (exact
    involution, no convention ambiguity): v = unit(lon, lat);
    Rz(-λp) then Ry(φp - π/2) maps the grid pole to +z; the rotated
    coordinates are read back with asin/atan2.  The inverse is the
    transpose.  Used by COSMO/CORDEX-style model grids."""
    phi_p = math.radians(float(attrs["grid_north_pole_latitude"]))
    lam_p = math.radians(float(attrs["grid_north_pole_longitude"]))
    sp, cp = math.sin(phi_p), math.cos(phi_p)
    sl, cl = math.sin(lam_p), math.cos(lam_p)

    def fwd(lon, lat):
        lam, phi = F.radians(lon), F.radians(lat)
        x = F.cos(phi) * F.cos(lam)
        y = F.cos(phi) * F.sin(lam)
        z = F.sin(phi)
        x1 = x * F.lit(cl) + y * F.lit(sl)
        y1 = -x * F.lit(sl) + y * F.lit(cl)
        z1 = z
        x2 = x1 * F.lit(sp) - z1 * F.lit(cp)
        y2 = y1
        z2 = x1 * F.lit(cp) + z1 * F.lit(sp)
        rlon = F.degrees(F.atan2(y2, x2))
        rlat = F.degrees(F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), z2))))
        return rlon, rlat

    def inv(rlon, rlat):
        lam, phi = F.radians(rlon), F.radians(rlat)
        x2 = F.cos(phi) * F.cos(lam)
        y2 = F.cos(phi) * F.sin(lam)
        z2 = F.sin(phi)
        x1 = x2 * F.lit(sp) + z2 * F.lit(cp)
        y1 = y2
        z1 = -x2 * F.lit(cp) + z2 * F.lit(sp)
        x = x1 * F.lit(cl) - y1 * F.lit(sl)
        y = x1 * F.lit(sl) + y1 * F.lit(cl)
        lon = F.degrees(F.atan2(y, x))
        lat = F.degrees(F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), z1))))
        return lon, lat

    return fwd, inv
