"""Property-based tests (hypothesis) — a layer the reference does not
have (SURVEY §5 "Not present"): operator invariants hold for arbitrary
generated inputs, not just the curated fixtures.

Spark jobs per example are expensive, so Spark-facing properties cap
``max_examples`` low and keep inputs tiny; pure-Python properties
(timeutil) run the default budget.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from gridded_etl_tools_spark.timeutil import TimeSpan, TimeUnit

# --- timeutil (pure python, cheap) ------------------------------------------

fixed_units = st.sampled_from([TimeUnit.MINUTE, TimeUnit.HOUR, TimeUnit.DAY, TimeUnit.WEEK])
all_units = st.sampled_from(list(TimeUnit))
amounts = st.integers(min_value=1, max_value=10_000)


@given(amounts, fixed_units)
def test_timespan_roundtrip_through_string(amount, unit):
    s = f"{amount}{unit.label}"
    span = TimeSpan.from_string(s)
    assert span == TimeSpan(amount, unit)
    assert span.to_timedelta() == dt.timedelta(minutes=amount * unit.minutes_per)


@given(amounts, all_units, amounts, all_units)
def test_timespan_ordering_total_and_consistent(a1, u1, a2, u2):
    s1, s2 = TimeSpan(a1, u1), TimeSpan(a2, u2)
    # total order: exactly one of <, ==-comparable, > holds
    assert (s1 < s2) or (s2 < s1) or (s1._comparable_minutes() == s2._comparable_minutes())
    if s1 < s2:
        assert not (s2 < s1)


@given(amounts, st.sampled_from([TimeUnit.MONTH, TimeUnit.SEASON, TimeUnit.YEAR]))
def test_calendar_units_refuse_timedelta(amount, unit):
    with pytest.raises(ValueError):
        TimeSpan(amount, unit).to_timedelta()


# --- gaps-and-islands invariants (Spark, small budget) ----------------------

spark_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@spark_settings
@given(st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=25, unique=True))
def test_contiguous_regions_partition_the_keys(spark, keys):
    from gridded_etl_tools_spark.operators.gaps import contiguous_regions

    df = spark.createDataFrame([Row(k=float(v)) for v in keys])
    regions = contiguous_regions(df, "k", expected_delta=1.0).collect()
    # regions cover every key exactly once and never overlap
    assert sum(r["n_keys"] for r in regions) == len(keys)
    spans = sorted((r["range_start"], r["range_end"]) for r in regions)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 < s2
    # within a region, keys are dense (end - start + 1 == n)
    by_span = {(r["range_start"], r["range_end"]): r["n_keys"] for r in regions}
    for (s, e), n in by_span.items():
        assert int(e - s) + 1 == n


@spark_settings
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 5000)),  # (user, offset seconds)
        min_size=1, max_size=30,
    )
)
def test_sessionize_conserves_events(spark, pairs):
    from gridded_etl_tools_spark.operators.gaps import sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_id=i, user_id=u, ts=t0 + dt.timedelta(seconds=off))
        for i, (u, off) in enumerate(pairs)
    ]
    out = sessionize(spark.createDataFrame(rows), gap=dt.timedelta(minutes=10)).collect()
    assert sum(r["n_events"] for r in out) == len(rows)
    for r in out:
        assert r["session_start"] <= r["session_end"]
        assert r["duration_us"] >= 0
        # a session never exceeds (n-1) * gap in duration
        assert r["duration_us"] <= (r["n_events"] - 1) * 10 * 60 * 1_000_000


# --- combine_first invariants -----------------------------------------------

@spark_settings
@given(
    st.dictionaries(st.integers(0, 8), st.floats(-100, 100, allow_nan=False), max_size=6),
    st.dictionaries(st.integers(0, 8), st.floats(-100, 100, allow_nan=False), max_size=6),
)
def test_combine_first_prefers_update_and_unions_keys(spark, upd, orig):
    from gridded_etl_tools_spark.operators.joins import combine_first

    if not upd and not orig:
        return
    schema = "k long, value double"
    u = spark.createDataFrame([(k, v) for k, v in upd.items()], schema)
    o = spark.createDataFrame([(k, v) for k, v in orig.items()], schema)
    out = {r["k"]: r["value"] for r in combine_first(u, o, ["k"], ["value"]).collect()}
    expected = {**orig, **upd}
    assert out == pytest.approx(expected)


# --- tolerance_join vs brute force ------------------------------------------

@spark_settings
@given(
    st.lists(st.integers(-50, 50), min_size=1, max_size=12, unique=True),
    st.lists(st.integers(-50, 50), min_size=1, max_size=12, unique=True),
    st.sampled_from([0.5, 1.0, 2.5]),
)
def test_tolerance_join_matches_brute_force(spark, probe_vals, target_vals, tol):
    from gridded_etl_tools_spark.operators.joins import tolerance_join

    # scale ints to non-integer grid points to exercise fractional buckets
    probes_py = [v * 0.7 for v in probe_vals]
    targets_py = [v * 0.7 for v in target_vals]
    probes = spark.createDataFrame([(v,) for v in probes_py], "x double")
    targets = spark.createDataFrame([(v,) for v in targets_py], "x double")

    got = {
        r["x"]: r["nearest_x"]
        for r in tolerance_join(probes, targets, "x", tol).collect()
    }

    expected = {}
    for p in probes_py:
        cands = [t for t in targets_py if abs(p - t) <= tol]
        if cands:
            expected[p] = min(cands, key=lambda t: (abs(p - t), t))
    assert got == pytest.approx(expected)


# --- interval joins vs brute force ------------------------------------------

@spark_settings
@given(
    st.lists(st.integers(-40, 40), min_size=1, max_size=10, unique=True),
    st.lists(
        st.tuples(st.integers(-40, 40), st.integers(0, 15)),
        min_size=1, max_size=8,
    ),
    st.sampled_from([1.0, 3.0, 10.0]),
)
def test_interval_join_matches_brute_force(spark, points_py, iv_specs, width):
    from gridded_etl_tools_spark.operators.joins import interval_join

    ivs_py = [(i, s * 0.7, s * 0.7 + ln * 0.3) for i, (s, ln) in enumerate(iv_specs)]
    pts_py = [p * 0.7 for p in points_py]
    points = spark.createDataFrame([(p,) for p in pts_py], "x double")
    ivs = spark.createDataFrame(ivs_py, "iid int, s double, e double")

    got = sorted(
        (r["x"], r["iv_iid"])
        for r in interval_join(points, ivs, "x", "s", "e", bucket_width=width).collect()
    )
    expected = sorted(
        (p, i) for p in pts_py for i, s, e in ivs_py if s <= p <= e
    )
    assert got == pytest.approx(expected)


@spark_settings
@given(
    st.lists(
        st.tuples(st.integers(-40, 40), st.integers(0, 15)),
        min_size=1, max_size=8,
    ),
    st.lists(
        st.tuples(st.integers(-40, 40), st.integers(0, 15)),
        min_size=1, max_size=8,
    ),
    st.sampled_from([1.0, 5.0]),
)
def test_interval_overlap_join_matches_brute_force(spark, l_specs, r_specs, width):
    """Every overlapping pair appears EXACTLY once regardless of how many
    buckets the overlap spans."""
    from gridded_etl_tools_spark.operators.joins import interval_overlap_join

    l_py = [(i, s * 0.7, s * 0.7 + ln * 0.3) for i, (s, ln) in enumerate(l_specs)]
    r_py = [(i, s * 0.7, s * 0.7 + ln * 0.3) for i, (s, ln) in enumerate(r_specs)]
    left = spark.createDataFrame(l_py, "lid int, s double, e double")
    right = spark.createDataFrame(r_py, "rid int, s double, e double")

    rows = interval_overlap_join(left, right, "s", "e", bucket_width=width).collect()
    got = sorted((r["lid"], r["r_rid"]) for r in rows)
    expected = sorted(
        (li, ri)
        for li, ls, le in l_py
        for ri, rs, re in r_py
        if ls <= re and rs <= le
    )
    assert got == expected  # exact multiset: no duplicates, no misses


# --- format decoders: pure-Python round trips, no Spark per example ----------

_dims = st.integers(min_value=1, max_value=7)
_small_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
).map(lambda v: round(v))


@given(
    nt=_dims, nlat=_dims, nlon=_dims,
    version=st.sampled_from([1, 5]),
    data=st.data(),
)
@settings(max_examples=25, deadline=None)
def test_netcdf3_roundtrip_any_grid(nt, nlat, nlon, version, data):
    """write_netcdf3 → parse_netcdf3 is the identity for any small grid,
    in both CDF-1 and CDF-5 (64-bit counts) layouts."""
    import numpy as np

    from gridded_etl_tools_spark.sources import netcdf3 as nc

    vals = np.array(
        data.draw(
            st.lists(
                _small_floats,
                min_size=nt * nlat * nlon,
                max_size=nt * nlat * nlon,
            )
        ),
        dtype="f8",
    ).reshape(nt, nlat, nlon)
    import io, os, tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.nc")
        nc.write_netcdf3(
            path,
            dims={"time": None, "lat": nlat, "lon": nlon},
            variables={
                "time": (("time",), nc.NC_DOUBLE, {}, np.arange(nt, dtype="f8")),
                "lat": (("lat",), nc.NC_DOUBLE, {}, np.arange(nlat, dtype="f8")),
                "lon": (("lon",), nc.NC_DOUBLE, {}, np.arange(nlon, dtype="f8")),
                "v": (("time", "lat", "lon"), nc.NC_DOUBLE, {}, vals),
            },
            version=version,
        )
        ds = nc.parse_netcdf3(open(path, "rb").read())
    assert ds.dims == {"time": nt, "lat": nlat, "lon": nlon}
    np.testing.assert_array_equal(ds.variables["v"].data, vals)


@given(nj=_dims, ni=_dims, mask_frac=st.floats(0, 0.9), data=st.data())
@settings(max_examples=25, deadline=None)
def test_grib1_roundtrip_any_bitmap(nj, ni, mask_frac, data):
    """write_grib1 → parse_grib1 preserves values and NaN mask for any
    grid shape — including every bitmap byte-parity (the r3 BMS pad
    bug's whole input class)."""
    import numpy as np

    from gridded_etl_tools_spark.sources import grib1 as g1

    n = nj * ni
    vals = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=60000), min_size=n, max_size=n
            )
        ),
        dtype="f8",
    ).reshape(nj, ni)
    n_mask = int(mask_frac * n)
    if n_mask >= n:
        n_mask = n - 1  # at least one present value
    flat = vals.reshape(-1)
    flat[:n_mask] = np.nan
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.grib")
        g1.write_grib1(
            path,
            [{
                "values": vals,
                "lats": 50.0 - 0.5 * np.arange(nj),
                "lons": -100.0 + 0.5 * np.arange(ni),
                "reference_time": dt.datetime(2024, 6, 1),
                "p1_hours": 3,
                "nbits": 16,
            }],
        )
        (m,) = g1.parse_grib1(open(path, "rb").read())
    np.testing.assert_array_equal(np.isnan(m.values), np.isnan(vals))
    np.testing.assert_allclose(
        m.values[~np.isnan(vals)], vals[~np.isnan(vals)]
    )


@given(
    shape=st.tuples(_dims, _dims, _dims),
    chunked=st.booleans(),
    compress=st.booleans(),
    latest=st.booleans(),
    data=st.data(),
)
@settings(max_examples=25, deadline=None)
def test_hdf5_roundtrip_any_layout(shape, chunked, compress, latest, data):
    """write_hdf5 → parse_hdf5 is the identity across layouts: contiguous
    and chunked (any chunk grid, edge overhang) × shuffle+deflate ×
    classic (superblock v0, symbol table) vs latest (superblock v3,
    OHDR v2 link messages) containers."""
    import numpy as np

    from gridded_etl_tools_spark.sources import hdf5 as h5

    n = shape[0] * shape[1] * shape[2]
    vals = np.array(
        data.draw(st.lists(_small_floats, min_size=n, max_size=n)), dtype="f8"
    ).reshape(shape)
    kw = {"latest": latest}
    if chunked:
        cs = tuple(
            data.draw(st.integers(min_value=1, max_value=s), label="chunk")
            for s in shape
        )
        kw.update({"chunk_shapes": {"v": cs}, "compress": compress})
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.nc4")
        h5.write_hdf5(
            path,
            {
                "t": (("t",), np.arange(shape[0], dtype="f8"), {}),
                "y": (("y",), np.arange(shape[1], dtype="f8"), {}),
                "x": (("x",), np.arange(shape[2], dtype="f8"), {}),
                "v": (("t", "y", "x"), vals, {}),
            },
            **kw,
        )
        f = h5.parse_hdf5(open(path, "rb").read())
    assert f.variables["v"].dim_names == ("t", "y", "x")
    np.testing.assert_array_equal(f.variables["v"].data, vals)


# --- round-4 analytics operators --------------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", categories=("L", "N", "Zs")),
            min_size=0, max_size=120,
        ),
        min_size=1, max_size=6,
    ),
    chunk=st.integers(min_value=5, max_value=40),
)
def test_chunk_documents_tiles_exactly(spark, texts, chunk):
    """Chunks reconstruct the document: chunk i starts at i*stride, the
    last chunk reaches the end, and no chunk exceeds the window."""
    from gridded_etl_tools_spark.operators.text import chunk_documents

    stride = max(1, chunk - 3)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(df, chunk_chars=chunk, stride=stride).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk_text"]
    for i, t in enumerate(texts):
        got = by_doc.get(i, {})
        if len(t) == 0:
            assert got == {}
            continue
        n = len(got)
        assert set(got) == set(range(n))
        for k, c in got.items():
            assert c == t[k * stride : k * stride + chunk]
            assert len(c) <= chunk
        # the final chunk must reach the document end
        assert (n - 1) * stride + len(got[n - 1]) == len(t)
        # and n is minimal for the stride/window tiling
        assert n == max(0, -(-max(len(t) - chunk, 0) // stride)) + 1


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=3, max_size=25,
    )
)
def test_grouped_ols_matches_closed_form(spark, pts):
    """grouped_ols agrees with the numpy closed form on random data."""
    import numpy as np

    from gridded_etl_tools_spark.operators.aggregations import grouped_ols

    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "g string, x int, y double"
    )
    row = grouped_ols(df, ["g"], "x", "y").collect()[0]
    xs = np.array([x for x, _ in pts], dtype=float)
    ys = np.array([round(y, 6) for _, y in pts], dtype=float)
    if np.var(xs) == 0:
        assert row["slope"] is None
        return
    slope, intercept = np.polyfit(xs, ys, 1)
    assert row["slope"] == pytest.approx(slope, abs=1e-4)
    assert row["intercept"] == pytest.approx(intercept, abs=1e-3)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    subjects=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.booleans(),
        ),
        min_size=1, max_size=20,
    )
)
def test_kaplan_meier_monotone_and_bounded(spark, subjects):
    """S(t) is non-increasing in t and always within [0, 1]; the at-risk
    counts are non-increasing too."""
    from gridded_etl_tools_spark.operators.aggregations import kaplan_meier

    df = spark.createDataFrame(
        [(t, int(e)) for t, e in subjects], "t int, is_event int"
    )
    rows = sorted(kaplan_meier(df).collect(), key=lambda r: r["t"])
    last_s, last_n = 1.0, float("inf")
    for r in rows:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= last_s + 1e-9
        assert r["n_at_risk"] <= last_n
        last_s, last_n = r["survival"], r["n_at_risk"]


# --- round-5 scalable-window operators vs their single-partition
# reference forms (the equivalence the oracle rows rely on) ------------


@spark_settings
@given(
    st.lists(
        st.integers(min_value=0, max_value=40),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_global_ntile_matches_window_ntile(spark, vals, k):
    """global_ntile (two-level bucketed prefix counts) must equal the
    positional Window.ntile for any data and tile count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators.aggregations import global_ntile

    rows = [Row(rid=i, v=v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows)
    got = {
        (r["rid"]): r["tile"]
        for r in global_ntile(
            df.withColumn("__bkt", F.col("v")),
            k,
            order_by=[F.asc("v"), F.asc("rid")],
            bucket_col="__bkt",
        ).collect()
    }
    w = Window.partitionBy(F.lit(0)).orderBy(F.asc("v"), F.asc("rid"))
    want = {
        r["rid"]: r["t"]
        for r in df.withColumn("t", F.ntile(k).over(w)).collect()
    }
    assert got == want


def test_global_ntile_barrier_false_matches_default(spark):
    """ADVICE r13: ``barrier=False`` (skip the eager localCheckpoint —
    for callers that already materialized the axis) must compute the
    exact same tiles as the default barrier path."""
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators.aggregations import global_ntile

    df = spark.createDataFrame(
        [Row(rid=i, v=(i * 7) % 13) for i in range(37)]
    ).withColumn("__bkt", F.col("v"))
    kw = dict(order_by=[F.asc("v"), F.asc("rid")], bucket_col="__bkt")
    with_barrier = {
        r["rid"]: r["tile"]
        for r in global_ntile(df.localCheckpoint(eager=True), 4, **kw).collect()
    }
    without = {
        r["rid"]: r["tile"]
        for r in global_ntile(
            df.localCheckpoint(eager=True), 4, barrier=False, **kw
        ).collect()
    }
    assert with_barrier == without


@spark_settings
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_grouped_ntile_matches_keyed_window_ntile(spark, pairs):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators.aggregations import grouped_ntile

    rows = [Row(rid=i, g=g, v=v) for i, (g, v) in enumerate(pairs)]
    df = spark.createDataFrame(rows)
    got = {
        r["rid"]: r["tile"]
        for r in grouped_ntile(
            df.withColumn("__bkt", F.floor(F.col("v") / 5)),
            4,
            order_by=[F.asc("v"), F.asc("rid")],
            bucket_col="__bkt",
            partition_cols=["g"],
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("rid"))
    want = {
        r["rid"]: r["t"]
        for r in df.withColumn("t", F.ntile(4).over(w)).collect()
    }
    assert got == want


@spark_settings
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20_000),  # seconds offset
            st.integers(min_value=-500, max_value=500),  # value cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_bucketed_sliding_window_matches_plain_window(spark, pairs):
    """Overlap replication must reproduce the plain single-partition
    trailing RANGE window exactly (count and exact decimal sum),
    including rows landing exactly on bucket boundaries."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators.aggregations import (
        bucketed_sliding_time_window,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(rid=i, g="k", ts=base + dt.timedelta(seconds=s), v=c / 100.0)
        for i, (s, c) in enumerate(pairs)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["rid"]: (r["trailing_n"], float(r["trailing_sum"]))
        for r in bucketed_sliding_time_window(
            df, keys=["g"], ts_col="ts", value_col="v",
            window_seconds=3600,
        ).collect()
    }
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("g")
        .orderBy(us)
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    want = {
        r["rid"]: (r["n"], float(r["s"]))
        for r in df.select(
            "rid",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).over(w).alias("s"),
        ).collect()
    }
    assert got == want


@spark_settings
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=12),  # dense -> many ties
        ),
        min_size=2,
        max_size=40,
    )
)
def test_grouped_rank_stats_matches_window_functions(spark, pairs):
    """Two-level positions + tie-collapse must reproduce ANSI rank /
    percent_rank / cume_dist exactly, including heavy ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators.aggregations import (
        grouped_rank_stats,
    )

    rows = [Row(rid=i, g=g, v=float(v)) for i, (g, v) in enumerate(pairs)]
    df = spark.createDataFrame(rows)
    got = {
        r["rid"]: (r["rank"], r["percent_rank"], r["cume_dist"])
        for r in grouped_rank_stats(
            df.withColumn("__bkt", F.floor(F.col("v") / 4)),
            partition_cols=["g"],
            value_col="v",
            bucket_col="__bkt",
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v")
    want = {
        r["rid"]: (r["rk"], r["pr"], r["cd"])
        for r in df.select(
            "rid",
            F.rank().over(w).alias("rk"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    assert got == want


@spark_settings
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.one_of(
                st.none(), st.integers(min_value=0, max_value=6)
            ),  # NULL values mixed with heavy ties
        ),
        min_size=2,
        max_size=30,
    )
)
def test_grouped_rank_stats_ranks_null_values(spark, pairs):
    """Round-5 advice: NULL value rows must be RANKED (nulls-first, as
    Spark's ``ORDER BY v ASC`` window does), not dropped by the
    internal equi-joins — pinned via null-safe joins in the operator."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from gridded_etl_tools_spark.operators.aggregations import (
        grouped_rank_stats,
    )

    schema = StructType([
        StructField("rid", LongType()),
        StructField("g", StringType()),
        StructField("v", DoubleType()),
    ])
    rows = [
        (i, g, float(v) if v is not None else None)
        for i, (g, v) in enumerate(pairs)
    ]
    df = spark.createDataFrame(rows, schema)
    got = {
        r["rid"]: (r["rank"], r["percent_rank"], r["cume_dist"])
        for r in grouped_rank_stats(
            df.withColumn("__bkt", F.floor(F.col("v") / 3)),  # NULL bucket
            partition_cols=["g"],
            value_col="v",
            bucket_col="__bkt",
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v").asc())  # nulls first
    want = {
        r["rid"]: (r["rk"], r["pr"], r["cd"])
        for r in df.select(
            "rid",
            F.rank().over(w).alias("rk"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    assert got == want


@spark_settings
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=20_000),  # seconds
            st.one_of(st.none(), st.integers(min_value=-99, max_value=99)),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_bucketed_locf_matches_plain_window(spark, triples):
    """Two-level LOCF (per-bucket last + seed carry-in + interior fill)
    must equal the single-sequence ignorenulls window, including
    all-null buckets, leading nulls, and bucket-boundary rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators.aggregations import bucketed_locf

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            rid=i, g=g,
            ts=base + dt.timedelta(seconds=s),
            v=None if c is None else float(c),
        )
        for i, (g, s, c) in enumerate(triples)
    ]
    df = spark.createDataFrame(rows, "rid long, g string, ts timestamp, v double")
    got = {
        r["rid"]: r["filled"]
        for r in bucketed_locf(
            df.withColumn(
                "__bkt", F.floor(F.unix_micros("ts") / 3_600_000_000)
            ),
            keys=["g"],
            order_by=[F.col("ts"), F.col("rid")],
            value_col="v",
            bucket_col="__bkt",
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("ts", "rid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["rid"]: r["f"]
        for r in df.select(
            "rid", F.last("v", ignorenulls=True).over(w).alias("f")
        ).collect()
    }
    assert got == want


@spark_settings
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=2000),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_bucketed_sliding_rows_window_matches_plain(spark, triples):
    """Block ghost-replication must reproduce the ROWS-frame window
    exactly — tiny blocks force frames to span block boundaries."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators.aggregations import (
        bucketed_sliding_rows_window,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(rid=i, g=g, ts=base + dt.timedelta(seconds=s), v=float(c))
        for i, (g, s, c) in enumerate(triples)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["rid"]: (r["n"], r["s"])
        for r in bucketed_sliding_rows_window(
            df.withColumn("__bkt", F.floor(F.unix_micros("ts") / 60_000_000)),
            keys=["g"],
            order_by=[F.asc("ts"), F.asc("rid")],
            n_preceding=3,
            bucket_col="__bkt",
            frame_aggs={
                "n": F.count(F.lit(1)),
                "s": F.sum(F.col("v").cast("decimal(18,2)")),
            },
            block_rows=4,   # force boundary-spanning frames
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy(F.asc("ts"), F.asc("rid"))
        .rowsBetween(-3, 0)
    )
    want = {
        r["rid"]: (r["n"], r["s"])
        for r in df.select(
            "rid",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).over(w).alias("s"),
        ).collect()
    }
    assert got == want


@spark_settings
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=20_000),
            st.integers(min_value=-500, max_value=500),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_trailing_prefix_matches_range_window(spark, triples):
    """The O(n) prefix-algebra trailing window (cum minus strictly-
    before as-of) must equal the RANGE frame exactly, including
    timestamp ties and rows landing exactly W before another."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators.aggregations import (
        trailing_time_window_prefix,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(rid=i, g=g, ts=base + dt.timedelta(seconds=s), v=c / 100.0)
        for i, (g, s, c) in enumerate(triples)
    ]
    # force exact-boundary and tie cases
    rows += [
        Row(rid=10_000 + i, g="a",
            ts=base + dt.timedelta(seconds=3600 * (i % 2)), v=1.0)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["rid"]: (r["trailing_n"], str(r["trailing_sum"]))
        for r in trailing_time_window_prefix(
            df, ["g"], "ts", "v", 3600
        ).collect()
    }
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("g")
        .orderBy(us)
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    want = {
        r["rid"]: (r["n"], str(r["s"]))
        for r in df.select(
            "rid",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).over(w).alias("s"),
        ).collect()
    }
    assert got == want


@spark_settings
@given(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=25),
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=25),
)
def test_rank_curve_lookup_matches_asof(spark, probes, curve_pts):
    """rank_curve_lookup (bucketed LOCF form) must equal the inclusive
    backward as-of against the curve, including exact rank ties."""
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators.aggregations import (
        rank_curve_lookup,
    )

    left = spark.createDataFrame(
        [Row(g="a", rid=i, __r=p / 100.0) for i, p in enumerate(probes)]
    ).withColumnRenamed("__r", "__r")
    curve = spark.createDataFrame(
        [Row(g="a", __r=c / 100.0, v=float(c)) for c in sorted(set(curve_pts))]
    )
    got = {
        r["rid"]: r["out"]
        for r in rank_curve_lookup(left, curve, ["g"], "v", "out").collect()
    }
    cpts = sorted(set(curve_pts))
    for i, p in enumerate(probes):
        le = [c for c in cpts if c / 100.0 <= p / 100.0]
        want = float(le[-1]) if le else None
        assert got[i] == want, (i, p, got[i], want)


# --- round-6: training-mix determinism --------------------------------------


@spark_settings
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),   # doc_id
            st.integers(min_value=0, max_value=3),        # source idx
        ),
        min_size=1, max_size=40, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=3),                # epoch
)
def test_training_mix_deterministic_under_repartition(spark, rows, epoch):
    """The whole resample→split→order chain must be a pure function of
    document ids: re-running over an arbitrarily re-partitioned input
    yields the identical (keep, split, shard, pos) for every doc — the
    guarantee Bernoulli sampling / orderBy(rand()) cannot give, and what
    makes a training mix reproducible across cluster sizes."""
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [Row(doc_id=d, source=f"s{s}", n_chars=10 + d % 7) for d, s in rows]
    )

    def run(frame):
        kept = text_ops.temperature_resample(
            frame, group_col="source", alpha=0.5, id_col="doc_id"
        )
        assigned = kept.withColumn(
            "split",
            text_ops.split_assign(
                F.col("doc_id"), {"train": 90, "val": 5, "test": 5}
            ),
        )
        ordered = text_ops.epoch_order(assigned, epoch=epoch, n_shards=4)
        return {
            r["doc_id"]: (r["split"], r["shard"], r["pos"])
            for r in ordered.collect()
        }

    a = run(df)
    b = run(df.repartition(7, "source"))
    assert a == b
    # keeps are downsample-only: every surviving doc came from the input
    assert set(a) <= {d for d, _ in rows}


@spark_settings
@given(
    st.lists(st.integers(min_value=1, max_value=400), min_size=2, max_size=12,
             unique=True),
    st.lists(st.integers(min_value=1, max_value=400), min_size=2, max_size=12,
             unique=True),
)
def test_rrf_fusion_matches_reference_formula(spark, lex_ids, dense_ids):
    """Reciprocal-rank fusion over two arbitrary ranked lists: the
    fused score of every doc equals sum(1/(60+rank)) over the lists it
    appears in, and the engine's full-outer-join form keeps docs that
    appear in only one list (the property a plain inner join silently
    breaks)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    lex = spark.createDataFrame(
        [Row(doc_id=d, lex_rank=i + 1) for i, d in enumerate(lex_ids)]
    )
    dense = spark.createDataFrame(
        [Row(doc_id=d, dense_rank=i + 1) for i, d in enumerate(dense_ids)]
    )
    rrf = (
        F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(
            F.lit(1.0) / (F.lit(60) + F.col("dense_rank")), F.lit(0.0)
        )
    )
    fused = (
        lex.join(dense, on="doc_id", how="full_outer")
        .withColumn("rrf_score", F.round(rrf, 6))
    )
    got = {r["doc_id"]: r["rrf_score"] for r in fused.collect()}
    lex_rank = {d: i + 1 for i, d in enumerate(lex_ids)}
    dense_rank = {d: i + 1 for i, d in enumerate(dense_ids)}
    assert set(got) == set(lex_rank) | set(dense_rank)
    for d, score in got.items():
        want = 0.0
        if d in lex_rank:
            want += 1.0 / (60 + lex_rank[d])
        if d in dense_rank:
            want += 1.0 / (60 + dense_rank[d])
        assert score == round(want, 6), (d, score, want)


# --- keyed MERGE semantics (Spark, small budget) -----------------------------

merge_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@merge_settings
@given(
    st.lists(  # table rows: (day-offset, key, value)
        st.tuples(
            st.integers(min_value=0, max_value=59),
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.lists(  # batch rows, same key space
        st.tuples(
            st.integers(min_value=0, max_value=59),
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=51, max_value=99),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_merge_upsert_equals_reference_merge(spark, tmp_path_factory, table_rows, batch_rows):
    """merge_upsert == the textbook MERGE: matched (time, key) rows take
    the batch value, unmatched table rows survive, unmatched batch rows
    insert — for ANY table/batch shape, across bucket boundaries."""
    import datetime as dt

    from gridded_etl_tools_spark.sinks.table import GriddedTable

    t0 = dt.datetime(2024, 11, 1)

    def frame(rows):
        return spark.createDataFrame(
            [
                (t0 + dt.timedelta(days=d), int(k), float(v))
                for d, k, v in rows
            ],
            "time timestamp, key long, value double",
        )

    root = str(tmp_path_factory.mktemp("merge_prop") / "tbl")
    t = GriddedTable(root)
    t.write_initial(frame(table_rows))
    t.merge_upsert(spark, frame(batch_rows), ["time", "key"])

    expected = {(d, k): float(v) for d, k, v in table_rows}
    expected.update({(d, k): float(v) for d, k, v in batch_rows})
    got = {
        ((r["time"] - t0).days, r["key"]): r["value"]
        for r in t.read(spark).collect()
    }
    assert got == expected


@settings(max_examples=300, deadline=None)
@given(
    a=st.text(min_size=0, max_size=24),
    b=st.text(min_size=0, max_size=24),
)
def test_time_key_order_preserving_for_non_temporal_strings(a, b):
    """ADVICE r7 (high) as a property: for strings that do NOT parse as
    instants, _time_key must be the identity — any normalization of
    non-temporal text risks breaking the lexical order manifest pruning
    compares with (the [ATA, ATZ] vs ATM bug class)."""
    import datetime as _dt

    from gridded_etl_tools_spark.sinks.table import GriddedTable

    def parses(s: str) -> bool:
        for cand in (s, s[:-1] + "+00:00" if s.endswith("Z") else s,
                     s[:-4] + "+00:00" if s.endswith(" UTC") else s):
            try:
                _dt.datetime.fromisoformat(cand)
                return True
            except ValueError:
                continue
        return False

    k = GriddedTable._time_key
    if not parses(a):
        assert k(a) == a
    if not parses(b):
        assert k(b) == b
    if not parses(a) and not parses(b):
        assert (k(a) < k(b)) == (a < b)


@settings(max_examples=200, deadline=None)
@given(
    t1=st.datetimes(
        min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2200, 1, 1)
    ),
    t2=st.datetimes(
        min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2200, 1, 1)
    ),
    sep1=st.sampled_from([" ", "T"]),
    sep2=st.sampled_from([" ", "T"]),
)
def test_time_key_chronological_across_separators(t1, t2, sep1, sep2):
    """Temporal strings compare CHRONOLOGICALLY regardless of the ISO
    separator spelling — the original reason _time_key exists."""
    from gridded_etl_tools_spark.sinks.table import GriddedTable

    k = GriddedTable._time_key
    s1 = t1.isoformat(sep=sep1)
    s2 = t2.isoformat(sep=sep2)
    assert (k(s1) < k(s2)) == (t1 < t2)
    assert k(t1.isoformat(sep=" ")) == k(t1.isoformat(sep="T"))
