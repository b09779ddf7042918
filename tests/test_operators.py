"""Operator unit tests on small synthetic frames (reference-style:
deterministic fixtures, exact expectations)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gridded_etl_tools_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard,
    simhash,
)
from gridded_etl_tools_spark.operators.gaps import contiguous_regions
from gridded_etl_tools_spark.operators.joins import asof_join, combine_first, tolerance_join
from gridded_etl_tools_spark.operators.qc import (
    QualityCheckError,
    cadence_violations,
    nan_frequency_violations,
    pre_parse_quality_check,
    update_position_violations,
    written_value_mismatches,
)
from gridded_etl_tools_spark.operators.reindex import missing_combinations, reindex_time
from gridded_etl_tools_spark.operators.similarity import cosine_topk, lsh_bucket_ann


def ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


# --- joins -------------------------------------------------------------------

def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [Row(id=1, k="a", t=ts(5)), Row(id=2, k="a", t=ts(2)), Row(id=3, k="b", t=ts(4))]
    ).withColumnRenamed("t", "time")
    right = spark.createDataFrame(
        [
            Row(k="a", time=ts(1), v=10.0),
            Row(k="a", time=ts(4), v=40.0),
            Row(k="b", time=ts(9), v=90.0),
        ]
    )
    out = {
        r["id"]: (r["asof_v"], r["asof_time"])
        for r in asof_join(left, right, on="time", by=["k"]).collect()
    }
    assert out[1] == (40.0, ts(4))   # latest right <= Jan 5 in group a
    assert out[2] == (10.0, ts(1))
    assert out[3] == (None, None)    # no right row <= Jan 4 in group b


def test_asof_join_equal_timestamp_included(spark):
    left = spark.createDataFrame([Row(id=1, time=ts(3))])
    right = spark.createDataFrame([Row(time=ts(3), v=5.0)])
    out = asof_join(left, right, on="time").collect()
    assert out[0]["asof_v"] == 5.0


def test_tolerance_join_picks_nearest_within_tol(spark):
    probes = spark.createDataFrame([Row(pid=1, x=10.0), Row(pid=2, x=50.0)])
    targets = spark.createDataFrame(
        [Row(tid=1, x=9.4), Row(tid=2, x=10.3), Row(tid=3, x=30.0)]
    )
    out = {
        r["pid"]: r["nearest_tid"]
        for r in tolerance_join(probes, targets, on="x", tolerance=1.0, probe_keys=["pid"]).collect()
    }
    assert out == {1: 2}  # |10-10.3| < |10-9.4|; probe 2 has nothing within 1.0


def test_combine_first_update_wins(spark):
    upd = spark.createDataFrame([Row(k=1, v=100.0)])
    ex = spark.createDataFrame([Row(k=1, v=1.0), Row(k=2, v=2.0)])
    out = {r["k"]: r["v"] for r in combine_first(upd, ex, keys=["k"]).collect()}
    assert out == {1: 100.0, 2: 2.0}


# --- gaps / reindex ----------------------------------------------------------

def test_contiguous_regions_regular(spark):
    days = spark.createDataFrame(
        [Row(time=ts(d)) for d in [1, 2, 3, 7, 8, 20]]
    )
    runs = contiguous_regions(days, "time", expected_delta=dt.timedelta(days=1)).collect()
    assert [(r["range_start"], r["range_end"], r["n_keys"]) for r in runs] == [
        (ts(1), ts(3), 3),
        (ts(7), ts(8), 2),
        (ts(20), ts(20), 1),
    ]


def test_contiguous_regions_bounds(spark):
    """Irregular cadence: any gap within bounds continues the run
    (reference update_cadence_bounds)."""
    days = spark.createDataFrame([Row(time=ts(d)) for d in [1, 3, 6, 20]])
    runs = contiguous_regions(
        days, "time",
        bounds=(dt.timedelta(days=1).total_seconds(), dt.timedelta(days=4).total_seconds()),
    ).collect()
    assert len(runs) == 2
    assert runs[0]["n_keys"] == 3 and runs[1]["n_keys"] == 1


def test_reindex_time_fills_holes_with_null(spark):
    facts = spark.createDataFrame(
        [Row(time=ts(1), g="a", v=1.0), Row(time=ts(3), g="a", v=3.0), Row(time=ts(1), g="b", v=9.0)]
    )
    out = reindex_time(facts, "time", "1 day", group_cols=["g"])
    assert out.count() == 6  # 3 days x 2 groups
    nulls = out.filter(F.col("v").isNull()).count()
    assert nulls == 3


def test_missing_combinations(spark):
    facts = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=1, b="y"), Row(a=2, b="x")]
    )
    holes = missing_combinations(facts, ["a", "b"]).collect()
    assert [(r["a"], r["b"]) for r in holes] == [(2, "y")]


# --- QC ----------------------------------------------------------------------

def test_cadence_violations_and_gate(spark):
    times = spark.createDataFrame([Row(time=ts(d)) for d in [1, 2, 4]])
    v = cadence_violations(times, "time", expected_delta=dt.timedelta(days=1)).collect()
    assert len(v) == 1 and v[0]["gap_seconds"] == 172800.0
    with pytest.raises(QualityCheckError, match="cadence"):
        pre_parse_quality_check(
            times.withColumn("value", F.lit(1.0)), "value",
            expected_delta=dt.timedelta(days=1),
        )


def test_nan_frequency_violations(spark):
    rows = [Row(time=ts(1), value=None if i < 50 else 1.0) for i in range(100)]
    rows += [Row(time=ts(2), value=None if i < 5 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "time timestamp, value double")
    bad = nan_frequency_violations(df, "time", "value", expected_frequency=0.05)
    assert [b["time"] for b in bad] == [ts(1)]


def test_update_position_violations(spark):
    existing = spark.createDataFrame([Row(time=ts(d), value=1.0) for d in [1, 2, 3]])
    update = spark.createDataFrame([Row(time=ts(6), value=1.0)])
    msgs = update_position_violations(
        update, existing, expected_delta=dt.timedelta(days=1)
    )
    assert msgs and "not contiguous" in msgs[0]
    ok = update_position_violations(
        spark.createDataFrame([Row(time=ts(4), value=1.0)]),
        existing, expected_delta=dt.timedelta(days=1),
    )
    assert ok == []


def test_written_value_mismatches_equivalences(spark):
    written = spark.createDataFrame(
        [Row(k=1, v=1.0), Row(k=2, v=None), Row(k=3, v=1e200), Row(k=4, v=5.0)],
        "k int, v double",
    )
    source = spark.createDataFrame(
        [Row(k=1, v=1.00005), Row(k=2, v=None), Row(k=3, v=2e200), Row(k=4, v=5.5)],
        "k int, v double",
    )
    bad = written_value_mismatches(written, source, keys=["k"], value_col="v")
    assert [r["k"] for r in bad.collect()] == [4]


# --- dedup / similarity ------------------------------------------------------

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 0
    (2, "completely different words about spark catalyst optimizer and shuffles"),
    (3, "yet another unrelated document mentioning parquet row groups and stats"),
]


def test_minhash_lsh_finds_planted_near_duplicate(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = minhash_lsh_candidates(docs, "text", "doc_id", num_hashes=16, bands=8, shingle_n=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert (2, 3) not in got


def test_ngram_jaccard_scores(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = spark.createDataFrame([Row(id_a=0, id_b=1), Row(id_a=0, id_b=2)])
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard(docs, pairs, "text", "doc_id", shingle_n=2).collect()}
    assert out[(0, 1)] > 0.7
    assert out[(0, 2)] == 0.0


def test_simhash_near_dups_close(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs, "text", "doc_id").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sigs[0], sigs[1]) < ham(sigs[0], sigs[2])
    assert ham(sigs[0], sigs[1]) <= 6


def test_lsh_ann_matches_exact_top1_mostly(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        r["probe_id"]: r["neighbor_id"]
        for r in cosine_topk(probes, emb, k=1).collect()
    }
    approx = {
        r["probe_id"]: r["neighbor_id"]
        for r in lsh_bucket_ann(probes, emb, k=1, n_planes=3, n_tables=6).collect()
    }
    hits = sum(1 for p, n in exact.items() if approx.get(p) == n)
    # multi-table LSH: 6 tables of 3 planes; per-table collision ~0.2-0.5
    # for these neighbors, union recall should clear 60%
    assert hits >= len(exact) * 0.6


# --- sessionize / ivf / polynomial fingerprint ------------------------------

def test_sessionize_splits_on_gap(spark):
    ev = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=ts(1, 10, 0)),
            Row(event_id=2, user_id=1, ts=ts(1, 10, 20)),   # same session (<30m)
            Row(event_id=3, user_id=1, ts=ts(1, 11, 0)),    # 40m gap -> new session
            Row(event_id=4, user_id=2, ts=ts(1, 10, 0)),    # other user independent
        ]
    )
    from gridded_etl_tools_spark.operators.gaps import sessionize

    out = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_us"])
        for r in sessionize(ev).collect()
    }
    assert out[(1, 1)] == (2, 20 * 60 * 1_000_000)
    assert out[(1, 2)] == (1, 0)
    assert out[(2, 1)] == (1, 0)


def test_sessionize_exact_gap_continues(spark):
    # a gap of exactly 30min is NOT a break (strict >)
    ev = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=ts(1, 10, 0)),
            Row(event_id=2, user_id=1, ts=ts(1, 10, 30)),
        ]
    )
    from gridded_etl_tools_spark.operators.gaps import sessionize

    rows = sessionize(ev).collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 2


def test_ivf_assign_and_topk(spark):
    # two well-separated clusters on orthogonal axes; centroids = ids 0, 10
    def vec(axis, mag):
        v = [0.0, 0.0]
        v[axis] = mag
        return v

    rows = [Row(vec_id=i, embedding=vec(0, 1.0 + i * 0.1)) for i in range(4)]
    rows += [Row(vec_id=10 + i, embedding=vec(1, 1.0 + i * 0.1)) for i in range(4)]
    emb = spark.createDataFrame(rows)
    from gridded_etl_tools_spark.operators.similarity import ivf_assign, ivf_topk

    centroids = emb.filter(F.col("vec_id").isin(0, 10))
    cells = {r["vec_id"]: r["centroid_id"] for r in ivf_assign(emb, centroids).collect()}
    assert all(cells[i] == 0 for i in range(4))
    assert all(cells[10 + i] == 10 for i in range(4))

    out = ivf_topk(emb, centroids, F.col("vec_id") == 1, k=10).collect()
    # probe 1 searches only its own cell: neighbors are 0,2,3 (never 1x)
    assert sorted(r["neighbor_id"] for r in out) == [0, 2, 3]
    assert all(abs(r["cosine"] - 1.0) < 1e-9 for r in out)  # colinear cluster


def test_vectorized_auto_default_resolves_to_blas():
    """r5 verdict item 2: with numpy importable (always, in this env)
    the unset ``vectorized`` flag must auto-select the BLAS path, and
    explicit False must pin pure-JVM."""
    from gridded_etl_tools_spark.operators.similarity import (
        resolve_vectorized,
    )

    assert resolve_vectorized(None) is True
    assert resolve_vectorized(False) is False
    assert resolve_vectorized(True) is True


def test_ivf_topk_auto_plan_uses_arrow_blas_path(spark):
    """The auto default must actually engage the Arrow data plane: the
    default-flag plan carries ArrowEvalPython (batched matmul/einsum),
    while vectorized=False stays Python-free."""
    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from gridded_etl_tools_spark.operators.similarity import ivf_topk

    rows = [
        Row(vec_id=i, embedding=[float(i % 7), float(i % 3), 1.0])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    cents = df.filter(F.col("vec_id") % 10 == 0)
    auto_plan = ivf_topk(
        df, cents, F.col("vec_id") % 5 == 0, k=3
    )._jdf.queryExecution().executedPlan().toString()
    jvm_plan = ivf_topk(
        df, cents, F.col("vec_id") % 5 == 0, k=3, vectorized=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in auto_plan
    assert "ArrowEvalPython" not in jvm_plan
    assert "BatchEvalPython" not in auto_plan


def test_ivf_assign_vectorized_matches_jvm(spark):
    # the opt-in Arrow+BLAS assignment path must agree with the pure-JVM
    # plan on every vector (incl. argmax tie-break = lowest centroid id)
    import random

    rng = random.Random(7)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows)
    from gridded_etl_tools_spark.operators.similarity import ivf_assign

    centroids = emb.filter(F.col("vec_id") % 20 == 0)
    jvm = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(emb, centroids, vectorized=False).collect()
    }
    blas = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(emb, centroids, vectorized=True).collect()
    }
    assert jvm == blas


def test_duplicate_clusters_connected_components(spark):
    # chain 1-2-3 (diameter 2, needs >1 propagation round), pair 10-11,
    # and an untouched singleton 99 (absent from pairs => absent from out)
    from gridded_etl_tools_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [Row(id_a=2, id_b=3), Row(id_a=1, id_b=2), Row(id_a=10, id_b=11)]
    )
    out = {r["id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_duplicate_clusters_empty_pairs(spark):
    from gridded_etl_tools_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert duplicate_clusters(pairs).count() == 0


def test_polynomial_fingerprint_order_sensitive(spark):
    from gridded_etl_tools_spark.operators.text import polynomial_fingerprint

    df = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta"), Row(doc_id=2, text="beta alpha"),
         Row(doc_id=3, text="alpha beta")]
    )
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", polynomial_fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert fps[1] == fps[3]          # identical text -> identical fp
    assert fps[1] != fps[2]          # word order matters
    assert all(0 <= v < 2147483647 for v in fps.values())


# --- skew helpers ------------------------------------------------------------

def test_salted_join_matches_plain_join(spark):
    from gridded_etl_tools_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(50)] + [Row(k=2, v=i) for i in range(5)]
    )
    small = spark.createDataFrame([Row(k=1, name="hot"), Row(k=2, name="cold")])
    plain = {(r["k"], r["v"], r["name"]) for r in big.join(small, "k").collect()}
    salted = {(r["k"], r["v"], r["name"]) for r in salted_join(big, small, ["k"]).collect()}
    assert salted == plain
    assert "__salt" not in salted_join(big, small, ["k"]).columns


def test_two_phase_agg_matches_plain(spark):
    from gridded_etl_tools_spark.operators.skew import two_phase_agg

    df = spark.createDataFrame([Row(k=i % 3, v=float(i)) for i in range(30)])
    out = {
        r["k"]: (r["sum_v"], r["count_v"], r["min_v"], r["max_v"])
        for r in two_phase_agg(df, ["k"], {"v": "sum"}).join(
            two_phase_agg(df, ["k"], {"v": "count"}), "k"
        ).join(two_phase_agg(df, ["k"], {"v": "min"}), "k")
        .join(two_phase_agg(df, ["k"], {"v": "max"}), "k").collect()
    }
    plain = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("c"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    assert out == plain


# --- z-order clustering ------------------------------------------------------

def test_zorder_bbox_span_beats_row_major(spark):
    """The point of z-order is range-pruning: an aligned 8x8 bbox inside a
    16x16 grid occupies ONE contiguous run of the z-sorted order (span =
    64 positions for 64 cells), where lat-major ordering smears the same
    bbox across 120 positions - i.e. a bbox scan touches ~2x the row
    groups without z-clustering."""
    import itertools

    from gridded_etl_tools_spark.operators.zorder import with_zorder

    cells = [
        Row(latitude=36.0 + 0.25 * i, longitude=-116.0 + 0.25 * j)
        for i, j in itertools.product(range(16), range(16))
    ]
    df = with_zorder(spark.createDataFrame(cells), resolution=0.25)
    ordered = [
        (r["latitude"], r["longitude"])
        for r in df.orderBy("z_index").collect()
    ]
    assert len(set(ordered)) == 256  # distinct codes for distinct cells

    def span(seq, in_bbox):
        pos = [i for i, c in enumerate(seq) if in_bbox(c)]
        assert len(pos) == 64
        return max(pos) - min(pos) + 1

    in_bbox = lambda c: c[0] < 36.0 + 8 * 0.25 and c[1] < -116.0 + 8 * 0.25  # noqa: E731
    assert span(ordered, in_bbox) == 64            # contiguous under Morton
    assert span(sorted(ordered), in_bbox) == 7 * 16 + 8   # smeared lat-major


def test_zorder_deterministic_and_jvm_side(spark):
    from gridded_etl_tools_spark.operators.zorder import with_zorder

    df = spark.createDataFrame(
        [Row(latitude=36.25, longitude=-115.5), Row(latitude=36.25, longitude=-115.5)]
    )
    vals = [r["z_index"] for r in with_zorder(df).collect()]
    assert vals[0] == vals[1]
    plan = with_zorder(df)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_interval_join_numeric_boundaries(spark):
    from gridded_etl_tools_spark.operators.joins import interval_join

    points = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 10.0), (4, 10.001), (5, 37.0)], "pid int, x double"
    )
    ivs = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 9.0, 40.0)], "iid int, s double, e double"
    )
    got = sorted(
        (r["pid"], r["iv_iid"])
        for r in interval_join(points, ivs, "x", "s", "e", bucket_width=10.0).collect()
    )
    # endpoints are inclusive on both sides; 10.001 falls only in the 2nd
    assert got == [(1, 100), (2, 100), (3, 100), (3, 200), (4, 200), (5, 200)]


def test_interval_join_timestamp_axis(spark):
    from gridded_etl_tools_spark.operators.joins import interval_join

    t0 = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(i, t0 + dt.timedelta(days=i)) for i in range(10)], "pid int, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(1, t0 + dt.timedelta(days=2), t0 + dt.timedelta(days=4))],
        "iid int, s timestamp, e timestamp",
    )
    got = sorted(
        r["pid"]
        for r in interval_join(points, ivs, "ts", "s", "e", bucket_width=86400.0).collect()
    )
    assert got == [2, 3, 4]


def test_interval_overlap_join_pairs_unique_across_buckets(spark):
    """A pair overlapping across many buckets must be emitted exactly
    once (the first-shared-bucket trick), including touch-only overlaps."""
    from gridded_etl_tools_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0.0, 100.0), (2, 200.0, 210.0)], "lid int, s double, e double"
    )
    right = spark.createDataFrame(
        [(10, 50.0, 95.0), (20, 100.0, 150.0), (30, 151.0, 199.0)],
        "rid int, s double, e double",
    )
    rows = interval_overlap_join(left, right, "s", "e", bucket_width=10.0).collect()
    got = sorted((r["lid"], r["r_rid"]) for r in rows)
    # (1,10) spans 5 shared buckets -> once; (1,20) touches at 100 -> once
    assert got == [(1, 10), (1, 20)]


def test_quantized_topk_recall_vs_exact(spark):
    """Int8 quantization must preserve most of the exact top-5 (64-dim
    vectors; quantization noise is ~0.4% per component)."""
    from gridded_etl_tools_spark.operators.similarity import quantized_cosine_topk

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(probes, emb, k=5)
    quant = quantized_cosine_topk(probes, emb, k=5)
    ex = {(r["probe_id"], r["neighbor_id"]) for r in exact.collect()}
    qu = {(r["probe_id"], r["neighbor_id"]) for r in quant.collect()}
    recall = len(ex & qu) / len(ex)
    assert recall >= 0.9


# --- exact binomial machinery (reference publish.py:1233 binom_test CI) ------

def _brute_minlike_pvalue(k: int, n: int, p: float) -> float:
    """O(n) reference implementation of the two-sided minlike p-value."""
    from gridded_etl_tools_spark.operators.qc import binom_pmf

    d = binom_pmf(k, n, p) * (1 + 1e-7)
    return min(1.0, sum(binom_pmf(i, n, p) for i in range(n + 1) if binom_pmf(i, n, p) <= d))


@pytest.mark.parametrize(
    "k,n,p",
    [
        (3, 100, 0.01), (0, 50, 0.1), (50, 50, 0.9), (25, 500, 0.05),
        (7, 20, 0.5), (499, 500, 0.95), (1, 1000, 0.005), (13, 200, 0.02),
    ],
)
def test_binom_pvalue_matches_bruteforce(k, n, p):
    from gridded_etl_tools_spark.operators.qc import binom_test_pvalue

    exact = binom_test_pvalue(k, n, p)
    brute = _brute_minlike_pvalue(k, n, p)
    assert abs(exact - brute) <= 1e-9 * max(1.0, brute)


def test_binom_cdf_matches_partial_sums():
    from gridded_etl_tools_spark.operators.qc import binom_cdf, binom_pmf

    for n, p in [(100, 0.01), (500, 0.3), (50, 0.97)]:
        acc = 0.0
        for k in range(n):
            acc += binom_pmf(k, n, p)
            assert abs(binom_cdf(k, n, p) - acc) < 1e-10


def test_binom_confint_duality_alpha_1e5():
    """Defining property of the test-inversion CI: p0 lies inside
    [lo, hi] iff the two-sided test of (count, nobs) at p0 is NOT
    rejected at alpha — including the small-n tail cases where a normal
    approximation gets the boundary wrong."""
    from gridded_etl_tools_spark.operators.qc import (
        binom_test_confint, binom_test_pvalue,
    )

    alpha = 1e-5
    for count, nobs in [(3, 100), (0, 5000), (250, 5000), (5, 5000), (97, 100)]:
        lo, hi = binom_test_confint(count, nobs, alpha)
        for p0 in [x / 200 for x in range(1, 200)]:
            pv = binom_test_pvalue(count, nobs, p0)
            if abs(pv - alpha) < alpha * 1e-3:
                continue  # numerical boundary
            assert (lo <= p0 <= hi) == (pv > alpha), (count, nobs, p0, pv, lo, hi)


def test_binom_confint_small_n_tails():
    """Hand-checked exact bounds where the normal approximation
    disagrees: 3/100 at alpha=1e-5 — the normal CI around p=0.05 would
    be [~-0.046, ~0.146] (nonsense negative lower bound); the exact
    inversion gives a strictly positive lower bound and a wider upper
    tail."""
    from gridded_etl_tools_spark.operators.qc import binom_test_confint

    lo, hi = binom_test_confint(3, 100, 1e-5)
    assert 0 < lo < 0.001
    assert 0.15 < hi < 0.25
    # degenerate observed counts hit the closed-form endpoints
    lo0, hi0 = binom_test_confint(0, 100, 1e-5)
    assert lo0 == 0.0 and 0 < hi0 < 0.25
    lo1, hi1 = binom_test_confint(100, 100, 1e-5)
    assert hi1 == 1.0 and 0.75 < lo1 < 1


def test_nan_frequency_one_sided(spark):
    """one_sided mirrors the reference: only a NaN *excess* trips the
    gate; a shortage (observed 0% vs expected 20%) passes silently."""
    rows = [Row(time=ts(1), value=1.0) for _ in range(200)]            # 0% nulls
    rows += [Row(time=ts(2), value=None) for _ in range(150)]          # 75% nulls
    rows += [Row(time=ts(2), value=1.0) for _ in range(50)]
    df = spark.createDataFrame(rows, "time timestamp, value double")
    bad = nan_frequency_violations(
        df, "time", "value", expected_frequency=0.2, one_sided=True
    )
    assert [b["time"] for b in bad] == [ts(2)]


def test_conservative_regrid_preserves_integral(spark):
    """The defining invariant of first-order conservative regridding:
    the area integral of the field is preserved exactly —
    sum(value x source_cell_area) == sum(mean x weight) over targets —
    including at non-integer source/target width ratios."""
    from gridded_etl_tools_spark.operators.regrid import conservative_regrid

    rows = [
        (0.125 + 0.25 * i, 0.125 + 0.25 * j, float(i * 7 + j))
        for i in range(8)
        for j in range(6)
    ]
    df = spark.createDataFrame(rows, "lat double, lon double, value double")
    out = conservative_regrid(
        df, {"lat": (0.25, 0.0, 0.4), "lon": (0.25, 0.0, 0.4)}, "value"
    )
    got = out.collect()
    src_integral = sum(r[2] for r in rows) * 0.25 * 0.25
    tgt_integral = sum(r["mean_value"] * r["weight"] for r in got)
    assert tgt_integral == pytest.approx(src_integral, rel=1e-12)
    # total overlap area equals the source domain area
    assert sum(r["weight"] for r in got) == pytest.approx(
        8 * 6 * 0.25 * 0.25, rel=1e-12
    )
    # interior target cell fully covered: weight == target cell area
    interior = [r for r in got if abs(r["weight"] - 0.16) < 1e-9]
    assert interior


# ---------------------------------------------------------------------------
# interpolate_na / temperature_resample (round-4 additions)
# ---------------------------------------------------------------------------

def test_interpolate_na_linear_and_edges(spark):
    import datetime as dt

    from gridded_etl_tools_spark.operators import reindex as reindex_ops

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # group A: null bracketed 25% of the way between 10.0 and 20.0
        ("a", t0, 10.0),
        ("a", t0 + dt.timedelta(hours=1), None),
        ("a", t0 + dt.timedelta(hours=4), 20.0),
        # group B: leading + trailing nulls stay null
        ("b", t0, None),
        ("b", t0 + dt.timedelta(hours=1), 5.0),
        ("b", t0 + dt.timedelta(hours=2), None),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = reindex_ops.interpolate_na(df, "ts", "v", group_cols=["g"])
    got = {(r["g"], r["ts"]): r["v"] for r in out.collect()}
    assert got[("a", t0 + dt.timedelta(hours=1))] == pytest.approx(12.5)
    assert got[("b", t0)] is None
    assert got[("b", t0 + dt.timedelta(hours=2))] is None
    # non-null values pass through untouched
    assert got[("a", t0)] == 10.0


def test_interpolate_na_duplicate_ts_fallback(spark):
    import datetime as dt

    from gridded_etl_tools_spark.operators import reindex as reindex_ops

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 3.0),
        (2, t0, None),   # same ts as both neighbors -> previous value
        (3, t0, 7.0),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v double")
    out = reindex_ops.interpolate_na(
        df, "ts", "v", tiebreak_cols=["id"]
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got[2] == 3.0


def test_temperature_resample_flattens_mixture(spark):
    from gridded_etl_tools_spark.operators import text as text_ops

    rows = [(i, "head" if i < 900 else "tail") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = text_ops.temperature_resample(df, "source", alpha=0.5)
    by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # alpha=0.5 shares: w_head=30, w_tail=10 -> head target 750 of 900
    # (rate 0.833); tail target 250 of 100 clips at 1.0 -> kept in full
    assert by_src["tail"] == 100
    assert 700 <= by_src["head"] <= 800
    # deterministic: the same call yields the same rows
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in text_ops.temperature_resample(df, "source", alpha=0.5).collect()
    )
    assert ids1 == ids2


def test_nearest_cells_matches_brute_force(spark):
    from gridded_etl_tools_spark.operators import spatial as spatial_ops

    cells = spark.range(0, 100).select(
        F.col("id").alias("cell_id"),
        (F.lit(10.0) + F.floor(F.col("id") / 10) * 0.5).alias("lat"),
        (F.lit(20.0) + (F.col("id") % 10) * 0.5).alias("lon"),
    )
    probes = spark.range(0, 12).select(
        F.col("id").alias("probe_id"),
        (F.lit(10.1) + ((F.col("id") * 7) % 40) / F.lit(10.0)).alias("lat"),
        (F.lit(20.1) + ((F.col("id") * 11) % 40) / F.lit(10.0)).alias("lon"),
    )
    got = {
        r["probe_id"]: (r["cell_id"], r["dist_km"])
        for r in spatial_ops.nearest_cells(probes, cells, max_km=45.0).collect()
    }
    # brute force with the same formula
    brute = (
        probes.crossJoin(
            cells.select(
                F.col("cell_id"), F.col("lat").alias("clat"), F.col("lon").alias("clon")
            )
        )
        .withColumn(
            "d",
            spatial_ops.haversine_km(
                F.col("lat"), F.col("lon"), F.col("clat"), F.col("clon")
            ),
        )
        .filter(F.col("d") <= 45.0)
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("probe_id").orderBy(F.col("d").asc(), F.col("cell_id").asc())
    )
    expect = {
        r["probe_id"]: (r["cell_id"], r["d"])
        for r in brute.withColumn("rn", rn).filter(F.col("rn") == 1).collect()
    }
    assert set(got) == set(expect)
    for pid, (cid, d) in expect.items():
        assert got[pid][0] == cid
        assert got[pid][1] == pytest.approx(d)


def test_nearest_cells_plan_has_no_cartesian(spark):
    from gridded_etl_tools_spark.operators import spatial as spatial_ops

    cells = spark.range(0, 400).select(
        F.col("id").alias("cell_id"),
        (F.floor(F.col("id") / 20) * 0.25).alias("lat"),
        ((F.col("id") % 20) * 0.25).alias("lon"),
    )
    probes = spark.range(0, 30).select(
        F.col("id").alias("probe_id"),
        (F.col("id") * 0.1).alias("lat"),
        (F.col("id") * 0.13).alias("lon"),
    )
    out = spatial_ops.nearest_cells(probes, cells, max_km=25.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_spatial_outliers_flags_planted_glitch(spark):
    from gridded_etl_tools_spark.operators.qc import spatial_outliers

    rows = []
    for i in range(6):
        for j in range(6):
            v = 10.0 + 0.1 * i + 0.05 * j      # smooth field
            if (i, j) == (3, 3):
                v = 500.0                       # sensor glitch
            rows.append((float(i), float(j), v))
    df = spark.createDataFrame(rows, "latitude double, longitude double, value double")
    out = spatial_outliers(df, time_col=None, resolution=1.0, threshold=3.0)
    got = [(r["latitude"], r["longitude"]) for r in out.collect()]
    assert got == [(3.0, 3.0)]
    row = out.first()
    assert row["n_neighbors"] == 8
    assert abs(row["deviation"]) > 3.0


def test_spatial_outliers_edge_cells_use_partial_neighborhoods(spark):
    from gridded_etl_tools_spark.operators.qc import spatial_outliers

    # slight variation so neighborhood stddev is nonzero
    rows = [(float(i), float(j), 1.0 + 0.01 * j + 0.02 * i)
            for i in range(2) for j in range(4)]
    rows[0] = (0.0, 0.0, 99.0)  # glitch in a CORNER (3 neighbors only)
    df = spark.createDataFrame(rows, "latitude double, longitude double, value double")
    out = spatial_outliers(df, time_col=None, resolution=1.0, threshold=3.0)
    got = {(r["latitude"], r["longitude"]): r["n_neighbors"] for r in out.collect()}
    assert got == {(0.0, 0.0): 3}


def test_verification_metrics_known_values(spark):
    from gridded_etl_tools_spark.operators.aggregations import verification_metrics

    rows = [
        # lead 1: fc = obs + 2 everywhere -> bias 2, mae 2, rmse 2, corr 1
        (1, 10.0, 12.0), (1, 20.0, 22.0), (1, 30.0, 32.0),
        # lead 2: fc = -obs -> corr -1, bias = -2*mean(obs)
        (2, 1.0, -1.0), (2, 2.0, -2.0), (2, 3.0, -3.0),
    ]
    df = spark.createDataFrame(rows, "lead int, obs double, fc double")
    got = {r["lead"]: r for r in verification_metrics(df, "fc", "obs", ["lead"]).collect()}
    assert got[1]["bias"] == pytest.approx(2.0)
    assert got[1]["mae"] == pytest.approx(2.0)
    assert got[1]["rmse"] == pytest.approx(2.0)
    assert got[1]["corr_fo"] == pytest.approx(1.0)
    assert got[2]["corr_fo"] == pytest.approx(-1.0)
    assert got[2]["bias"] == pytest.approx(-4.0)
    assert got[2]["n_pairs"] == 3


def test_crps_ensemble_known_values(spark):
    from gridded_etl_tools_spark.operators.aggregations import crps_ensemble

    rows = [
        # perfect deterministic ensemble: all members == obs -> CRPS 0
        (1, 5.0, [5.0, 5.0, 5.0]),
        # symmetric pair around obs: term1 = 1, term2 = 0.5*(8/9) -> 5/9
        (2, 0.0, [-1.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "id int, obs double, ms array<double>")
    out = {
        r["id"]: r["crps"]
        for r in df.select(
            "id", crps_ensemble(F.col("ms"), F.col("obs")).alias("crps")
        ).collect()
    }
    assert out[1] == pytest.approx(0.0)
    # term1 = (1+0+1)/3 = 2/3; pairwise sum = 2*(1+2+1) = 8, /9 -> 8/9
    assert out[2] == pytest.approx(2 / 3 - 0.5 * 8 / 9)


def test_quantile_map_matches_window_form_with_ties_and_payload(spark):
    """r13: both sides rank in ONE fused (group, __side) chain — pin
    that per-side percent_ranks cannot bleed across sides (ties exist
    in BOTH sides at the same values) and that forecast payload
    columns survive.  Expected values come from the single-sequence
    window formulation computed here on the same rows."""
    from pyspark.sql.window import Window

    from gridded_etl_tools_spark.operators.aggregations import quantile_map

    obs = spark.createDataFrame(
        [("a", v) for v in (1.0, 2.0, 2.0, 2.0, 7.0, 9.0)]
        + [("b", v) for v in (5.0, 5.0, 6.0)],
        "g string, value double",
    )
    fc = spark.createDataFrame(
        [("a", v, i) for i, v in enumerate((2.0, 2.0, 3.0, 8.0, 20.0))]
        + [("b", v, i) for i, v in enumerate((5.0, 7.0))],
        "g string, value double, tag long",
    )
    out = {
        (r["g"], r["value"], r["tag"]): r["corrected"]
        for r in quantile_map(fc, obs, "value", ["g"]).collect()
    }
    # window form: r = percent_rank per side, corrected = obs value at
    # the greatest obs rank <= the forecast rank (inclusive pick)
    wf = Window.partitionBy("g").orderBy("value")
    fcr = {
        (r["g"], r["value"], r["tag"]): r["r"]
        for r in fc.withColumn(
            "r", F.percent_rank().over(wf)
        ).collect()
    }
    obsr = [
        (r["g"], r["r"], r["value"])
        for r in obs.withColumn("r", F.percent_rank().over(wf)).collect()
    ]
    assert set(out) == set(fcr)
    for key, r in fcr.items():
        g = key[0]
        cands = [(cr, cv) for (cg, cr, cv) in obsr if cg == g and cr <= r]
        expect = max(cands)[1] if cands else None
        assert out[key] == expect, (key, r, out[key], expect)


def test_quantile_map_mixed_dtypes_keep_observed_precision(spark):
    """r13 regression guard: the fused (group, __side) chain would
    coerce an int forecast + double observed union to a common type
    and truncate corrected values — mixed value dtypes must take the
    two-chain path and return the OBSERVED side's dtype/precision."""
    from gridded_etl_tools_spark.operators.aggregations import quantile_map

    obs = spark.createDataFrame(
        [("a", v) for v in (0.25, 4.75, 9.5)], "g string, value double"
    )
    fc = spark.createDataFrame(
        [("a", v) for v in (100, 200, 300)], "g string, value int"
    )
    out = sorted(
        r["corrected"]
        for r in quantile_map(fc, obs, "value", ["g"]).collect()
    )
    assert out == [0.25, 4.75, 9.5]


def test_reserved_staging_name_refusals(spark):
    """r13: operators that stage dunder temp columns refuse loudly
    when a caller's column (or interpolate_na's out_col) collides,
    instead of silently replacing-then-dropping it."""
    import pytest

    from gridded_etl_tools_spark.operators import reindex as reindex_ops
    from gridded_etl_tools_spark.operators.aggregations import quantile_map

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0)], "g string, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="reserved staging"):
        reindex_ops.interpolate_na(df, "ts", "v", out_col="__nv")
    with pytest.raises(ValueError, match="reserved staging"):
        reindex_ops.interpolate_na(
            df.withColumn("__pt", F.lit(1)), "ts", "v"
        )
    base = spark.createDataFrame(
        [("a", 1.0)], "g string, value double"
    )
    with pytest.raises(ValueError, match="reserved staging"):
        quantile_map(
            base.withColumn("__side", F.lit(1)), base, "value", ["g"]
        )


def test_quantile_map_recovers_observed_distribution(spark):
    from gridded_etl_tools_spark.operators.aggregations import quantile_map

    obs_vals = [float(v) for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)]
    obs = spark.createDataFrame([("a", v) for v in obs_vals], "g string, value double")
    # biased forecast: scale 2x + shift — same ranks, different values
    fc = spark.createDataFrame(
        [("a", v * 2 + 100) for v in obs_vals], "g string, value double"
    )
    out = quantile_map(fc, obs, "value", ["g"])
    got = sorted(r["corrected"] for r in out.collect())
    # rank-for-rank the corrected series IS the observed series
    assert got == obs_vals


def test_quantile_delta_map_preserves_trend(spark):
    """QDM removes the historical per-quantile bias but keeps the future
    shift: hist_fc = obs + 10 (pure bias), future_fc = hist_fc + 3
    (bias + real trend) -> corrected = obs + 3 exactly."""
    from gridded_etl_tools_spark.operators.aggregations import quantile_delta_map

    obs_vals = [float(v) for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)]
    mk = lambda off: spark.createDataFrame(  # noqa: E731
        [("a", v + off) for v in obs_vals], "g string, value double"
    )
    out = quantile_delta_map(mk(13.0), mk(10.0), mk(0.0), "value", ["g"])
    got = sorted(r["corrected"] for r in out.collect())
    assert got == pytest.approx([v + 3.0 for v in obs_vals])


def test_idw_interpolate_exact_hit_and_weighting(spark):
    from gridded_etl_tools_spark.operators import spatial as spatial_ops

    cells = spark.createDataFrame(
        [(0, 10.0, 20.0, 100.0), (1, 10.0, 20.5, 200.0),
         (2, 10.5, 20.0, 300.0), (3, 10.5, 20.5, 400.0)],
        "cell_id long, lat double, lon double, value double",
    )
    probes = spark.createDataFrame(
        [(0, 10.0, 20.0),        # exact grid hit -> cell 0's value
         (1, 10.25, 20.25)],     # center-ish -> weighted mean of all 4
        "probe_id long, lat double, lon double",
    )
    got = {
        r["probe_id"]: (r["idw_value"], r["n_used"])
        for r in spatial_ops.idw_interpolate(
            probes, cells, max_km=60.0, k=4
        ).collect()
    }
    assert got[0][0] == 100.0          # exact hit short-circuits
    v, n = got[1]
    assert n == 4
    assert 100.0 < v < 400.0           # interior of the value range
    # lat rows are closer together than lon cols at this latitude, so
    # the probe is NOT equidistant; just pin the near-centroid band
    assert abs(v - 250.0) < 30.0


# --- persistence QC ----------------------------------------------------------

def test_persistence_runs_flags_stuck_states(spark):
    from gridded_etl_tools_spark.operators.qc import persistence_runs

    rows = [
        # user 1: A A A B A A -> one run of 3 (A), B and trailing AA short
        Row(event_id=i, ts=ts(1, i), user_id=1, state=s)
        for i, s in enumerate(["A", "A", "A", "B", "A", "A"])
    ] + [
        # user 2: four identical -> one run of 4
        Row(event_id=10 + i, ts=ts(2, i), user_id=2, state="X")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows)
    out = persistence_runs(
        df, entity_col="user_id", ts_col="ts", state_col="state",
        tiebreak_col="event_id", min_run=3,
    ).collect()
    got = {(r.user_id, r.state): r.n_obs for r in out}
    assert got == {(1, "A"): 3, (2, "X"): 4}
    run2 = [r for r in out if r.user_id == 2][0]
    assert run2.run_start == ts(2, 0) and run2.run_end == ts(2, 3)


def test_persistence_runs_min_run_boundary(spark):
    from gridded_etl_tools_spark.operators.qc import persistence_runs

    rows = [
        Row(event_id=i, ts=ts(1, i), user_id=1, state=s)
        for i, s in enumerate(["A", "A", "B", "B", "B"])
    ]
    out = persistence_runs(
        spark.createDataFrame(rows), entity_col="user_id", ts_col="ts",
        state_col="state", tiebreak_col="event_id", min_run=2,
    ).collect()
    got = sorted((r.state, r.n_obs) for r in out)
    assert got == [("A", 2), ("B", 3)]


# --- region mask -------------------------------------------------------------

def test_point_in_polygon_concave(spark):
    from gridded_etl_tools_spark.operators.spatial import point_in_polygon

    # L-shape: the notch (lat>36, lon>-118.5 .. -117 region removed)
    poly = [
        (35.0, -120.0), (35.0, -117.0), (37.0, -117.0),
        (37.0, -118.5), (36.0, -118.5), (36.0, -120.0),
    ]
    pts = spark.createDataFrame(
        [
            Row(pid=1, lat=35.5, lon=-119.0),  # inside lower arm
            Row(pid=2, lat=36.5, lon=-117.5),  # inside upper arm
            Row(pid=3, lat=36.5, lon=-119.0),  # in the notch -> outside
            Row(pid=4, lat=34.0, lon=-119.0),  # south of region
            Row(pid=5, lat=35.5, lon=-116.0),  # east of region
        ]
    )
    got = {
        r.pid: r.inside for r in point_in_polygon(pts, poly).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False, 5: False}


def test_grouped_mode_deterministic_tiebreak(spark):
    """Equal counts resolve to the smallest value — builtin mode() is
    arbitrary on ties, this operator must not be."""
    from gridded_etl_tools_spark.operators.aggregations import grouped_mode

    df = spark.createDataFrame(
        [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c")],
        "g string, v string",
    )
    row = grouped_mode(df, ["g"], "v").collect()[0]
    assert row["mode_value"] == "a" and row["mode_count"] == 2


def test_fixed_width_histogram_bins_negatives_toward_minus_inf(spark):
    """floor-based binning: -0.1 lands in bin -1, not bin 0; counts
    partition the rows."""
    from gridded_etl_tools_spark.operators.aggregations import (
        fixed_width_histogram,
    )

    df = spark.createDataFrame(
        [("g", -0.1), ("g", 0.0), ("g", 4.9), ("g", 5.0), ("g", 9.9)],
        "g string, v double",
    )
    out = {r["bin"]: r["bin_count"] for r in
           fixed_width_histogram(df, ["g"], "v", 5.0).collect()}
    assert out == {-1: 1, 0: 2, 1: 2}


def test_lsh_index_incremental_and_append(spark, tmp_path):
    """LshIndex: candidates(new) must equal the cross-batch slice of the
    full-corpus LSH candidates, and append() folds the batch in so a
    re-query sees it as corpus."""
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators.dedup import (
        LshIndex,
        minhash_lsh_candidates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)

    idx = LshIndex.build(
        corpus, str(tmp_path / "lsh"), num_hashes=8, bands=2, shingle_n=2
    )
    got = {
        (r["new_id"], r["corpus_id"])
        for r in idx.candidates(spark, batch).collect()
    }
    full = minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=8, bands=2, shingle_n=2
    )
    want = set()
    for r in full.collect():
        a, b = r["id_a"], r["id_b"]
        if (a % 10 == 0) != (b % 10 == 0):  # cross-batch pairs only
            new, old = (a, b) if a % 10 == 0 else (b, a)
            want.add((new, old))
    assert got == want

    # append the batch; a batch doc colliding with another batch doc is
    # now a corpus hit on re-query
    idx.append(batch)
    got2 = {
        (r["new_id"], r["corpus_id"])
        for r in idx.candidates(spark, batch).collect()
    }
    batch_pairs = {
        (a, b)
        for r in full.collect()
        for a, b in [(r["id_a"], r["id_b"])]
        if a % 10 == 0 and b % 10 == 0
    }
    assert got2 == want | batch_pairs | {(b, a) for a, b in batch_pairs}


def test_lsh_index_append_guards_resubmission(spark, tmp_path):
    """ADVICE r6: append() must not duplicate band rows for ids already
    in the index — a re-submitted batch is anti-joined away, so index
    cardinality and candidate output are unchanged."""
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.operators.dedup import LshIndex

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)

    idx = LshIndex.build(
        corpus, str(tmp_path / "lsh"), num_hashes=8, bands=2, shingle_n=2
    )
    bands_path = str(tmp_path / "lsh" / "bands")
    idx.append(batch)
    n1 = spark.read.parquet(bands_path).count()
    cand1 = {
        (r["new_id"], r["corpus_id"])
        for r in idx.candidates(spark, batch).collect()
    }

    # full re-submission: a no-op on the index
    idx.append(batch)
    assert spark.read.parquet(bands_path).count() == n1
    # partial overlap: only the genuinely-new docs are folded in
    idx.append(docs.filter((F.col("doc_id") % 10 == 0) | (F.col("doc_id") == 1)))
    n3 = spark.read.parquet(bands_path).count()
    assert n3 == n1  # doc 1 was already corpus; batch already appended
    cand3 = {
        (r["new_id"], r["corpus_id"])
        for r in idx.candidates(spark, batch).collect()
    }
    assert cand3 == cand1


def test_staged_tokens_refuses_existing_staging_column(spark):
    """ADVICE r13: staged_tokens must not silently replace a caller's
    pre-existing column with the staged token array (same reserved-name
    guard as interpolate_na / quantile_map)."""
    from gridded_etl_tools_spark.operators.text import staged_tokens

    df = spark.createDataFrame([Row(doc_id=1, text="a b", __toks="keep")])
    with pytest.raises(ValueError, match="__toks"):
        staged_tokens(df)
    # a non-colliding name still stages
    out = staged_tokens(df, toks_col="__t2")
    assert out.select("__t2").first()[0] == ["a", "b"]


def test_grouped_rank_stats_order_tiebreak_deprecation(spark):
    """ADVICE r13: the ignored order_tiebreak parameter must warn loudly
    (tie-invariant outputs) instead of implying an ordering guarantee."""
    import warnings

    from gridded_etl_tools_spark.operators.aggregations import (
        grouped_rank_stats,
    )

    df = spark.createDataFrame(
        [Row(g="a", v=float(i % 3), rid=i) for i in range(6)]
    ).withColumn("__bkt", F.floor(F.col("v")))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        grouped_rank_stats(
            df, ["g"], "v", "__bkt", order_tiebreak=[F.col("rid").asc()]
        )
    assert any(issubclass(w.category, FutureWarning) for w in caught)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        grouped_rank_stats(df, ["g"], "v", "__bkt")
    assert not any(
        issubclass(w.category, FutureWarning) for w in caught
    )
