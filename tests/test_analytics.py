"""Analytics module tests: accuracy bounds for the sketch/approximate
scale paths (which have no DuckDB oracle) and physical-plan properties
for the exact ones."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridded_etl_tools_spark.plans import analytics
from gridded_etl_tools_spark.plans.tables import load

from tests.test_plans import count_nodes, formatted_plan

SF_DIR = "/root/testdata/sf0.001"


def test_hll_daily_estimate_within_3pct(spark):
    exact = {
        r["day"]: r["n_users"]
        for r in analytics.distinct_users_daily(spark, SF_DIR).collect()
    }
    approx = {
        r["day"]: r["approx_users"]
        for r in analytics.approx_distinct_users_daily(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(3, 0.03 * n)


def test_hll_weekly_rollup_matches_exact_weekly(spark):
    ev = load(spark, SF_DIR, "events").withColumn(
        "week", F.date_trunc("week", "ts")
    )
    exact = {
        r["week"]: r["n"]
        for r in ev.groupBy("week")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["week"]: r["approx_users"]
        for r in analytics.sketch_rollup_weekly(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for week, n in exact.items():
        assert abs(approx[week] - n) <= max(3, 0.03 * n)


def test_approx_percentiles_close_to_exact(spark):
    exact = {
        r["event_type"]: (r["p25"], r["p50"], r["p75"], r["p90"])
        for r in analytics.value_percentiles(spark, SF_DIR).collect()
    }
    approx = {
        r["event_type"]: (r["p25"], r["p50"], r["p75"], r["p90"])
        for r in analytics.approx_value_percentiles(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for et, ps in exact.items():
        spread = max(ps) - min(ps) or 1.0
        for e, a in zip(ps, approx[et]):
            assert abs(a - e) <= 0.05 * spread


def test_climatology_broadcasts_back_onto_facts(spark):
    """The climatology table must broadcast; the fact scan must not be
    shuffled for the join."""
    plan = formatted_plan(spark, "climatology_anomaly_topk")
    assert count_nodes(plan, "BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan


def test_climatology_topk_is_take_ordered(spark):
    plan = formatted_plan(spark, "climatology_anomaly_topk")
    assert "TakeOrderedAndProject" in plan


def test_dispersion_single_hash_aggregate(spark):
    """Moment statistics are one partial+final hash aggregate — no join,
    no window, one exchange."""
    plan = formatted_plan(spark, "dispersion_stats")
    assert count_nodes(plan, "HashAggregate") == 2
    assert "Join" not in plan
    assert "Window" not in plan


def test_histogram_is_map_side_binning(spark):
    plan = formatted_plan(spark, "value_histogram")
    assert count_nodes(plan, "HashAggregate") == 2
    assert "Join" not in plan


# --- ANN quality pinning (the only queries with neither SQL oracle nor
# --- value-hash check): recall@5 against the exact cosine_topk ground
# --- truth.  A sign/bit error in the signature or assignment path drops
# --- recall to ~chance (5/500 = 0.01), far below these bounds.

def _recall_at_5(truth_rows, approx_rows) -> float:
    gt: dict = {}
    for r in truth_rows:
        gt.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    ap: dict = {}
    for r in approx_rows:
        ap.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    hits = sum(len(gt[p] & ap.get(p, set())) for p in gt)
    return hits / (5 * len(gt))


def _embeddings(spark):
    from gridded_etl_tools_spark.plans.tables import load

    return load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def test_lsh_ann_recall(spark):
    """Multi-table hyperplane LSH: measured 0.46 (4 tables) / 0.66
    (8 tables) on the sf0.001 embeddings; bound set with slack below the
    measured value but 35x above chance.  More tables must not lose
    recall."""
    from gridded_etl_tools_spark.operators import similarity as sim

    emb = _embeddings(spark)
    probes = emb.filter(F.col("vec_id") % 20 == 0)
    truth = sim.cosine_topk(probes, emb, k=5).collect()
    r4 = _recall_at_5(
        truth, sim.lsh_bucket_ann(probes, emb, k=5, n_planes=4, n_tables=4).collect()
    )
    r8 = _recall_at_5(
        truth, sim.lsh_bucket_ann(probes, emb, k=5, n_planes=4, n_tables=8).collect()
    )
    assert r4 >= 0.35, r4
    assert r8 >= r4 - 0.04, (r4, r8)  # union of tables only adds candidates


def test_ivf_ann_recall(spark):
    """IVF nprobe=1 with the catalog's deterministic centroids: measured
    recall 0.35 on sf0.001 general probes (cell-boundary neighbors are
    invisible at nprobe=1 — the known IVF trade; catalog probes that ARE
    centroids recall 1.0).  Bound sits below the measurement but 25x
    above chance, so a broken assignment still fails loudly."""
    from gridded_etl_tools_spark.operators import similarity as sim

    emb = _embeddings(spark)
    probes_pred = F.col("vec_id") % 20 == 0
    truth = sim.cosine_topk(emb.filter(probes_pred), emb, k=5).collect()
    cent = emb.filter(F.col("vec_id") % 50 == 0)
    approx = sim.ivf_topk(emb, cent, probes_pred, k=5).collect()
    r1 = _recall_at_5(truth, approx)
    assert r1 >= 0.25
    # nprobe=4 searches the 4 nearest cells: strictly more candidates per
    # probe, so recall must not drop — and it recovers a chunk of the
    # cell-boundary neighbors nprobe=1 misses (measured jump on sf0.001)
    r4 = _recall_at_5(
        truth, sim.ivf_topk(emb, cent, probes_pred, k=5, nprobe=4).collect()
    )
    assert r4 >= r1, (r1, r4)
    assert r4 >= 0.5, r4
    # centroid probes co-assign trivially: near-perfect recall
    truth_c = sim.cosine_topk(emb.filter(F.col("vec_id") % 100 == 0), emb, k=5).collect()
    approx_c = sim.ivf_topk(emb, cent, F.col("vec_id") % 100 == 0, k=5).collect()
    assert _recall_at_5(truth_c, approx_c) >= 0.9


def test_quantized_ann_recall(spark):
    """int8 quantization: measured 0.92 at sf0.001 (quantization noise
    only reorders near-ties)."""
    from gridded_etl_tools_spark.operators import similarity as sim

    emb = _embeddings(spark)
    probes = emb.filter(F.col("vec_id") % 20 == 0)
    truth = sim.cosine_topk(probes, emb, k=5).collect()
    approx = sim.quantized_cosine_topk(probes, emb, k=5).collect()
    assert _recall_at_5(truth, approx) >= 0.8


def test_pii_detect_and_redact(spark):
    from gridded_etl_tools_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-ample.co.uk now"),
            (2, "call 415-555-0137 or 415.555.0138"),
            (3, "docs at https://ex.com/a?b=1 and http://y.org"),
            (4, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        text_ops.pii_counts(F.col("text")).alias("pii"),
        text_ops.pii_redact(F.col("text")).alias("red"),
    ).orderBy("doc_id").collect()
    assert (out[0]["pii"]["n_emails"], out[0]["pii"]["n_phones"]) == (1, 0)
    assert "<EMAIL>" in out[0]["red"] and "@" not in out[0]["red"]
    assert out[1]["pii"]["n_phones"] == 2
    assert out[1]["red"].count("<PHONE>") == 2
    assert out[2]["pii"]["n_urls"] == 2
    assert out[2]["red"].count("<URL>") == 2
    assert out[3]["pii"] == (0, 0, 0) and out[3]["red"] == "no pii here"


def test_pack_sequences_per_shard(spark):
    from gridded_etl_tools_spark.operators import text as text_ops

    rows = [(s, i, "w " * 100) for s in (0, 1) for i in range(6)]
    df = spark.createDataFrame(rows, "shard int, doc_id long, text string")
    packed = text_ops.pack_sequences(
        df, seq_len=256, partition_col=F.col("shard")
    )
    got = {
        (r["shard"], r["doc_id"]): (r["bin"], r["start_offset"], r["n_tokens"])
        for r in packed.collect()
    }
    # 100 tokens per doc, 256-token bins: docs 0,1,2 start at offsets
    # 0/100/200 (bin 0), docs 3,4,5 at 300/400/500 (bin 1) — per shard
    for s in (0, 1):
        assert [got[(s, i)][0] for i in range(6)] == [0, 0, 0, 1, 1, 1]
        assert got[(s, 0)][1] == 0 and got[(s, 3)][1] == 300
        assert got[(s, 0)][2] == 100


def test_split_assign_deterministic_and_complete(spark):
    from gridded_etl_tools_spark.operators import text as text_ops

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    w = {"train": 90, "val": 5, "test": 5}
    out = df.withColumn(
        "split", text_ops.split_assign(F.col("doc_id"), w)
    )
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}     # total coverage
    assert sum(counts.values()) == 2000
    assert counts["train"] > 1600                       # roughly 90%
    # deterministic: re-computation gives the same assignment per id
    again = {r["doc_id"]: r["split"] for r in out.collect()}
    again2 = {
        r["doc_id"]: r["split"]
        for r in df.withColumn(
            "split", text_ops.split_assign(F.col("doc_id"), w)
        ).collect()
    }
    assert again == again2

    with pytest.raises(ValueError):
        text_ops.split_assign(F.col("doc_id"), {"a": 50, "b": 40})


def test_epoch_order_reproducible_and_epoch_varying(spark):
    from gridded_etl_tools_spark.operators import text as text_ops
    from gridded_etl_tools_spark.plans.tables import load

    docs = load(spark, SF_DIR, "documents").select("doc_id")
    e1a = {(r["doc_id"], r["shard"], r["pos"])
           for r in text_ops.epoch_order(docs, epoch=1, n_shards=8).collect()}
    e1b = {(r["doc_id"], r["shard"], r["pos"])
           for r in text_ops.epoch_order(docs, epoch=1, n_shards=8).collect()}
    e2 = {(r["doc_id"], r["shard"], r["pos"])
          for r in text_ops.epoch_order(docs, epoch=2, n_shards=8).collect()}
    assert e1a == e1b          # identical re-run
    assert e1a != e2           # different epoch, different order
    # every doc appears exactly once; positions are dense per shard
    n = docs.count()
    assert len(e1a) == n
    by_shard = {}
    for _, s, p in e1a:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_pq_encode_codewords_map_to_themselves(spark):
    """A sampled codeword vector's own subvectors are distance-0 to
    themselves, so it must encode to its own positions in every
    subspace."""
    from gridded_etl_tools_spark.operators import similarity as sim
    from gridded_etl_tools_spark.plans.tables import load

    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cb = sim.pq_codebooks(emb, F.col("vec_id") % 50 == 0, m=4, dim=64)
    sample_ids = sorted(
        r["vec_id"] for r in emb.filter(F.col("vec_id") % 50 == 0).collect()
    )
    codes = {
        r["vec_id"]: r["codes"]
        for r in sim.pq_encode(
            emb.filter(F.col("vec_id") % 50 == 0), cb, m=4, dim=64
        ).collect()
    }
    for pos, vid in enumerate(sample_ids):
        assert codes[vid] == [pos] * 4


def test_pq_ann_recall_beats_chance(spark):
    """PQ with m=4 x 16-dim subspaces over near-random synthetic
    embeddings measures recall@5 ~0.2 vs exact L2 (chance = 5/500 =
    0.01; kmeans-trained codebooks measure the same here because the
    vectors have no cluster structure to exploit).  Bound well below
    the measurement but 8x chance."""
    import numpy as np

    from gridded_etl_tools_spark.operators import similarity as sim
    from gridded_etl_tools_spark.plans.tables import load

    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    V = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    probes = [i for i in V if i % 100 == 0]
    exact = {
        p: {
            j
            for _, j in sorted(
                ((np.sum((V[p] - V[j]) ** 2), j) for j in V if j != p)
            )[:5]
        }
        for p in probes
    }
    cb = sim.pq_codebooks(emb, F.col("vec_id") % 50 == 0, m=4, dim=64)
    codes = sim.pq_encode(emb, cb, m=4, dim=64)
    out = sim.pq_topk(
        emb.filter(F.col("vec_id") % 100 == 0), codes, cb, m=4, dim=64, k=5
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    mean_recall = sum(len(got[p] & exact[p]) / 5 for p in probes) / len(probes)
    assert mean_recall >= 0.08


# --- bloom incremental dedup -------------------------------------------------

def test_bloom_dedup_no_false_negatives_and_exactness(spark):
    """Every true duplicate must be caught by the filter (no false
    negatives), and the exact two-phase result must equal the anti-join."""
    from pyspark.sql import Row

    from gridded_etl_tools_spark.operators.dedup import (
        bloom_incremental_dedup,
    )

    corpus = spark.createDataFrame([Row(k=f"doc{i}") for i in range(2000)])
    new = spark.createDataFrame(
        [Row(k=f"doc{i}") for i in range(1900, 2100)]  # 100 dup, 100 new
    )
    exact = bloom_incremental_dedup(new, corpus, "k", n_items=2000)
    got = sorted(r.k for r in exact.collect())
    want = sorted(f"doc{i}" for i in range(2000, 2100))
    assert got == want  # two-phase == anti-join, dups never survive

    # inexact mode: still zero false negatives (no dup survives);
    # may drop a ~fpp sliver of new docs
    fast = bloom_incremental_dedup(
        new, corpus, "k", n_items=2000, exact=False
    )
    survivors = {r.k for r in fast.collect()}
    assert not survivors & {f"doc{i}" for i in range(1900, 2000)}
    assert len(survivors) >= 95  # <= ~5% of 100 wrongly dropped at fpp=1%


def test_bloom_filter_word_table_is_compact(spark):
    from pyspark.sql import Row

    from gridded_etl_tools_spark.operators.dedup import (
        _bloom_geometry,
        bloom_filter_words,
    )

    corpus = spark.createDataFrame([Row(k=f"x{i}") for i in range(500)])
    m, k = _bloom_geometry(500, 0.01)
    words = bloom_filter_words(corpus, "k", 500, 0.01)
    assert words.count() <= m // 64  # at most one row per 64-bit word


def test_bucketed_prefix_sum_matches_global_cumsum(spark):
    """Two-level prefix sum == naive global ORDER BY running sum."""
    from pyspark.sql import Row, Window

    from gridded_etl_tools_spark.operators.aggregations import (
        bucketed_prefix_sum,
    )

    rows = [Row(id=i, v=(i * 37) % 23 + 1) for i in range(200)]
    df = spark.createDataFrame(rows).withColumn(
        "bkt", F.floor(F.col("v") / 5)
    )
    two_level = bucketed_prefix_sum(
        df, "bkt", [F.col("v").desc(), F.col("id").asc()], "v",
        cum_col="cum", bucket_desc=True,
    )
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("v").desc(), F.col("id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    naive = df.withColumn("cum", F.sum("v").over(w))
    a = {r.id: r.cum for r in two_level.collect()}
    b = {r.id: r.cum for r in naive.collect()}
    assert a == b


def test_remove_boilerplate_lines_order_and_counts(spark):
    from pyspark.sql import Row

    from gridded_etl_tools_spark.operators.text import (
        remove_boilerplate_lines,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="BANNER\nalpha\nmid\nFOOT"),
            Row(doc_id=2, text="BANNER\nbeta\nFOOT"),
            Row(doc_id=3, text="BANNER\ngamma\nFOOT\n\n"),
        ]
    )
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(docs, max_doc_freq=2).collect()
    }
    assert out[1].cleaned_text == "alpha\nmid"  # order preserved
    assert out[1].n_kept == 2 and out[1].n_removed == 2
    assert out[2].cleaned_text == "beta"
    assert out[3].cleaned_text == "gamma"  # blank lines never counted
    assert out[3].n_kept == 1 and out[3].n_removed == 2


def test_weighted_sample_bias_and_determinism(spark):
    from pyspark.sql import Row

    from gridded_etl_tools_spark.operators.text import weighted_sample

    df = spark.createDataFrame(
        [Row(id=i, w=100.0 if i < 50 else 1.0) for i in range(1000)]
    )
    out1 = {r.id for r in weighted_sample(df, "id", "w", k=30).collect()}
    out2 = {r.id for r in weighted_sample(df, "id", "w", k=30).collect()}
    assert out1 == out2  # re-run stable
    assert len(out1) == 30
    # 50 heavy rows (w=100) vs 950 light (w=1): heavies must dominate
    assert sum(1 for i in out1 if i < 50) >= 20
    # zero/negative weights never sampled
    df2 = spark.createDataFrame(
        [Row(id=1, w=0.0), Row(id=2, w=-3.0), Row(id=3, w=1.0)]
    )
    assert {r.id for r in weighted_sample(df2, "id", "w", k=5).collect()} == {3}


def test_seasonal_decompose_recovers_planted_seasonality(spark):
    """Pure weekly signal + linear trend: the decomposition must hand
    back the trend (exactly, for a linear series under a centered MA)
    and a seasonal component matching the planted weekday offsets."""
    import datetime as dt

    from pyspark.sql import Row

    from gridded_etl_tools_spark.operators.aggregations import (
        seasonal_decompose,
    )

    offsets = [3.0, -1.0, 0.5, -2.0, 1.5, 0.0, -2.0]  # sums to 0
    rows = []
    for d in range(28):
        day = dt.date(2024, 1, 1) + dt.timedelta(days=d)
        # 2024-01-01 is a Monday -> weekday(day) == d % 7
        rows.append(
            Row(k="a", day=day, v=100.0 + 2.0 * d + offsets[d % 7])
        )
    daily = spark.createDataFrame(rows)
    out = seasonal_decompose(daily, ["k"], "day", "v", ma_window=7)
    got = {r.day: r for r in out.collect()}
    assert len(got) == 22  # 28 days minus 3 edge days each side
    mid = dt.date(2024, 1, 10)  # d=9, weekday 2
    r = got[mid]
    # centered 7-day MA of (linear + zero-sum weekly signal) = linear part
    assert r.trend == 100.0 + 2.0 * 9
    assert abs(r.seasonal - offsets[9 % 7]) < 1e-6
    assert abs(r.residual) < 1e-6


def test_mann_kendall_monotone_series(spark):
    """Strictly increasing series: S = n(n-1)/2, Sen slope = step."""
    import datetime as dt

    from pyspark.sql import Row

    from gridded_etl_tools_spark.operators.aggregations import (
        mann_kendall_trend,
    )

    rows = [
        Row(k="a", day=dt.date(2024, 1, 1) + dt.timedelta(days=d),
            v=10.0 + 2.5 * d)
        for d in range(10)
    ]
    out = mann_kendall_trend(
        spark.createDataFrame(rows), ["k"], "day", "v"
    ).collect()[0]
    assert out.s_stat == 45  # all 45 pairs increasing
    assert out.n_pairs == 45
    assert out.sen_slope == 2.5
    # z = (S-1)/sqrt(n(n-1)(2n+5)/18) with n=10
    import math
    assert abs(out.z_stat - round(44 / math.sqrt(10 * 9 * 25 / 18.0), 6)) < 1e-9


def test_cusum_flags_level_shift(spark):
    """Flat series with a mid-series level jump: the post-shift cusum
    must cross the 3-sigma band exactly once the drift accumulates."""
    import datetime as dt

    from pyspark.sql import Row

    from gridded_etl_tools_spark.operators.aggregations import (
        cusum_changepoints,
    )

    rows = [
        Row(k="a", day=dt.date(2024, 1, 1) + dt.timedelta(days=d),
            v=10.0 if d < 20 else 11.0)
        for d in range(40)
    ]
    out = cusum_changepoints(
        spark.createDataFrame(rows), ["k"], "day", "v",
        threshold_sigmas=3.0,
    ).orderBy("day").collect()
    flags = [r.flagged for r in out]
    # drift accumulates: the first days sit inside the 3-sigma band,
    # the accumulated shift eventually leaves it
    assert not flags[0] and not flags[1]
    assert any(flags)
    # the retrospective change point is the cusum minimum: the last
    # low-era day (drift reverses direction there)
    cmin = min(out, key=lambda r: r.cusum)
    assert cmin.day == dt.date(2024, 1, 20)


def test_grouped_ols_recovers_planted_line(spark):
    """y = 3x + 7 exactly -> slope 3, intercept 7, r2 1; a constant-y
    group -> slope 0 and NULL-free n; a constant-x group -> NULL slope."""
    from gridded_etl_tools_spark.operators.aggregations import grouped_ols

    rows = (
        [("lin", x, 3.0 * x + 7.0) for x in range(10)]
        + [("flat", x, 5.0) for x in range(10)]
        + [("degx", 4, float(v)) for v in range(5)]
    )
    df = spark.createDataFrame(rows, "g string, x int, y double")
    out = {r["g"]: r for r in grouped_ols(df, ["g"], "x", "y").collect()}
    assert out["lin"]["slope"] == 3.0
    assert out["lin"]["intercept"] == 7.0
    assert out["lin"]["r2"] == 1.0
    assert out["flat"]["slope"] == 0.0
    assert out["flat"]["r2"] is None  # var(y) = 0
    assert out["degx"]["slope"] is None  # var(x) = 0
    assert out["degx"]["n"] == 5


def test_categorical_drift_chi2_null_and_shift(spark):
    """Identical period mixes -> chi2 ~ 0; a hard shift -> large chi2;
    dof = n_categories - 1; per-part decimal sum equals the total."""
    from gridded_etl_tools_spark.operators.aggregations import (
        categorical_drift_chi2,
    )
    from pyspark.sql import functions as F

    same = [("a", p) for p in (0, 1) for _ in range(50)] + [
        ("b", p) for p in (0, 1) for _ in range(30)
    ]
    df = spark.createDataFrame(same, "cat string, period int")
    out = categorical_drift_chi2(df, "cat", F.col("period")).collect()
    assert all(r["chi2_total"] == 0.0 for r in out)
    assert all(r["dof"] == 1 for r in out)

    shifted = [("a", 0)] * 90 + [("b", 0)] * 10 + [("a", 1)] * 10 + [("b", 1)] * 90
    df2 = spark.createDataFrame(shifted, "cat string, period int")
    out2 = categorical_drift_chi2(df2, "cat", F.col("period")).collect()
    total = out2[0]["chi2_total"]
    assert total > 50  # massive shift
    assert abs(sum(r["chi2_part"] for r in out2) - total) < 1e-6


def test_chunk_documents_bounds_and_overlap(spark):
    """Chunks tile the doc with the configured stride/window; the final
    chunk is the short tail; empty docs produce no chunks; adjacent
    chunks overlap by window - stride characters."""
    from gridded_etl_tools_spark.operators.text import chunk_documents

    text = "abcdefghij" * 50  # 500 chars
    df = spark.createDataFrame(
        [(1, text), (2, "short"), (3, "")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_chars=200, stride=150)
    rows = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"] for r in out.collect()}
    n1 = [k for k in rows if k[0] == 1]
    assert len(n1) == 3  # offsets 0,150,300 cover 500 chars
    assert rows[(1, 0)] == text[0:200]
    assert rows[(1, 1)] == text[150:350]
    assert rows[(1, 2)] == text[300:500]
    assert rows[(1, 0)][150:] == rows[(1, 1)][:50]  # 50-char overlap
    assert rows[(2, 0)] == "short"
    assert not [k for k in rows if k[0] == 3]


def test_term_distribution_shift_moved_term_ranks_first(spark):
    """A term appearing only in one half carries the largest JSD part;
    terms with identical frequencies contribute ~0."""
    from gridded_etl_tools_spark.operators.text import (
        term_distribution_shift,
    )
    from pyspark.sql import functions as F

    docs = [
        (0, "common common stable"),
        (2, "common stable filler"),
        (1, "common common stable"),
        (3, "common stable NEWTERM NEWTERM NEWTERM"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["term"]: r
        for r in term_distribution_shift(df, F.col("doc_id") % 2 == 1).collect()
    }
    assert out["newterm"]["p_cnt"] == 0 and out["newterm"]["q_cnt"] == 3
    best = max(out.values(), key=lambda r: r["jsd_part"])
    assert best["term"] == "newterm"
    assert out["common"]["jsd_part"] < out["newterm"]["jsd_part"]


def test_hll_estimate_accuracy_and_merge(spark):
    """m=256 HLL: estimate within ~3 sigma (20%) of true cardinality at
    10k distinct items; registers from two disjoint halves merged by
    min() give EXACTLY the combined-stream estimate (mergeability)."""
    from gridded_etl_tools_spark.operators.sketches import (
        hll_estimate, hll_registers,
    )
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        F.lit("g").alias("g"), F.col("id").alias("item")
    )
    regs = hll_registers(df, ["g"], "item")
    est = hll_estimate(regs, ["g"]).collect()[0]["hll_estimate"]
    assert abs(est - 10_000) / 10_000 < 0.20

    h1 = df.filter(F.col("item") < 6_000)
    h2 = df.filter(F.col("item") >= 4_000)  # overlapping halves
    merged = (
        hll_registers(h1, ["g"], "item")
        .unionByName(hll_registers(h2, ["g"], "item"))
        .groupBy("g", "bucket")
        .agg(F.min("min_bitlen").alias("min_bitlen"))
    )
    est_m = hll_estimate(merged, ["g"]).collect()[0]["hll_estimate"]
    assert est_m == est  # sketch merge == single-pass sketch


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities take the linear-counting branch and land very
    close to exact (the regime the catalog's daily query exercises)."""
    from gridded_etl_tools_spark.operators.sketches import (
        hll_estimate, hll_registers,
    )
    from pyspark.sql import functions as F

    df = spark.range(50).select(F.lit("g").alias("g"), F.col("id").alias("item"))
    est = hll_estimate(hll_registers(df, ["g"], "item"), ["g"]).collect()[0][
        "hll_estimate"
    ]
    assert abs(est - 50) < 5


def test_cms_never_underestimates_and_merges(spark):
    """CMS point estimates >= exact counts always (collisions only add);
    two halves' counter tables merged by cell-wise + equal the
    single-pass table."""
    from gridded_etl_tools_spark.operators.sketches import (
        cms_counters, cms_point_estimates,
    )
    from pyspark.sql import functions as F

    # skewed stream: item i appears (i % 10) + 1 times
    base = spark.range(200).select(
        F.col("id").alias("item"),
        F.explode(F.sequence(F.lit(1), (F.col("id") % 10 + 1).cast("int"))),
    ).select("item")
    counters = cms_counters(base, "item", depth=3, width=32)
    probes = base.select("item").distinct()
    est = {
        r["item"]: r["cms_estimate"]
        for r in cms_point_estimates(counters, probes, "item", 3, 32).collect()
    }
    exact = {
        r["item"]: r["n"]
        for r in base.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(est[i] >= exact[i] for i in exact)
    assert sum(est[i] > exact[i] for i in exact) > 0  # w=32 must collide

    h1 = base.filter(F.col("item") < 100)
    h2 = base.filter(F.col("item") >= 100)
    merged = (
        cms_counters(h1, "item", 3, 32)
        .unionByName(cms_counters(h2, "item", 3, 32))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    est_m = {
        r["item"]: r["cms_estimate"]
        for r in cms_point_estimates(merged, probes, "item", 3, 32).collect()
    }
    assert est_m == est


def test_funnel_counts_ordering_semantics(spark):
    """A user who clicks BEFORE their first view doesn't count at the
    click step; completing all steps in order counts everywhere."""
    import datetime as dt

    from gridded_etl_tools_spark.operators.aggregations import funnel_counts

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: view(1) -> click(2) -> purchase(3): full funnel
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # u2: click(1) -> view(2): click precedes first view -> view only
        (2, "click", t(1)), (2, "view", t(2)),
        # u3: view(1) -> purchase(2): skipped click -> view only
        (3, "view", t(1)), (3, "purchase", t(2)),
        # u4: never viewed
        (4, "click", t(1)), (4, "purchase", t(2)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {
        r["step"]: r["n_entities"]
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_bm25_ranks_term_frequency_and_rarity(spark):
    """A doc repeating a rare query term outscores one with a common
    term; docs without query terms are absent."""
    from gridded_etl_tools_spark.operators.text import bm25_scores

    docs = [
        (1, "rare rare rare filler filler"),
        (2, "common filler filler filler filler"),
        (3, "common filler pad pad pad"),
        (4, "nothing relevant here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["rare", "common"]).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] > out[2] > 0
    assert out[1] > out[3] > 0


def test_bm25_corpus_stats_count_every_doc(spark):
    """r13: the fused single-pass BM25 derives N and sum(dl) from
    null-term sentinel rows instead of a separate dl table — docs with
    NO query term (and empty/null texts) must still count toward N and
    avgdl exactly as the two-pass form did.  Reference values computed
    from the Okapi/Lucene formula by hand: N counts ALL 5 docs, sum_dl
    skips only the null text (split(null) -> null array -> dl null)."""
    import math

    from gridded_etl_tools_spark.operators.text import bm25_scores

    docs = [
        (1, "rare rare filler"),
        (2, "filler filler filler filler"),
        (3, ""),  # tokenizes to [""]: dl = 1, no match
        (4, None),  # null array: dl null, still counts toward N
        (5, "rare alone"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["rare"]).collect()
    }
    assert set(out) == {1, 5}
    n_docs, sum_dl, dfreq = 5, 3 + 4 + 1 + 2, 2
    avgdl = sum_dl / n_docs
    idf = math.log(1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))

    def score(tf, dl):
        sat = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        return round(round(idf * sat, 6), 6)

    assert out[1] == score(2, 3)
    assert out[5] == score(1, 2)


def test_unigram_perplexity_orders_quality(spark):
    """In-distribution repetitive text scores lower perplexity than a
    document of corpus-rare terms; perplexity >= 1 always."""
    from gridded_etl_tools_spark.operators.text import unigram_perplexity

    docs = [(i, "the cat sat on the mat") for i in range(10)] + [
        (99, "zyx qwv jkl pqr stu")
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["perplexity"] for r in unigram_perplexity(df).collect()}
    assert out[0] < out[99]
    assert all(v >= 1.0 for v in out.values())


def test_kaplan_meier_textbook_example(spark):
    """Classic small KM: times {1(e),2(e),3(c),4(e)} with N=4:
    S(1)=0.75, S(2)=0.5, S(4)=0.25; censored time 3 emits no row but
    shrinks the risk set."""
    from gridded_etl_tools_spark.operators.aggregations import kaplan_meier

    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 0), (4, 1)], "t int, is_event int"
    )
    rows = {r["t"]: r for r in kaplan_meier(df).collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["n_at_risk"] == 4 and rows[1]["survival"] == 0.75
    assert rows[2]["n_at_risk"] == 3 and rows[2]["survival"] == 0.5
    # terminal time: the whole remaining risk set fails -> survival 0
    assert rows[4]["n_at_risk"] == 1 and rows[4]["survival"] == 0.0


def test_prefix_refine_ann_recall(spark):
    """Coarse-to-fine prefix search: with a 50-deep shortlist over 400
    vectors, full-precision re-ranking recovers most of the true top-5
    (recall@5 well above the 50/400 shortlist-chance floor)."""
    import numpy as np

    rng = np.random.default_rng(7)
    n, dim = 400, 64
    vecs = rng.normal(size=(n, dim)).astype("float64")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    base = df.select(
        "vec_id", "embedding",
        F.slice("embedding", 1, 16).alias("prefix"),
    )
    probes = base.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_emb"),
        F.col("prefix").alias("p_pre"),
    )
    cand = base.crossJoin(F.broadcast(probes)).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    scored = cand.select(
        "probe_id", F.col("vec_id").alias("neighbor_id"),
        dot(F.col("p_pre"), F.col("prefix")).alias("psim"),
        dot(F.col("p_emb"), F.col("embedding")).alias("fsim"),
    )
    wc = Window.partitionBy("probe_id").orderBy(F.desc("psim"))
    wf = Window.partitionBy("probe_id").orderBy(F.desc("fsim"))
    got = (
        scored.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= 50)
        .withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= 5)
        .collect()
    )
    by_probe = {}
    for r in got:
        by_probe.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    sims = vecs @ vecs.T
    np.fill_diagonal(sims, -2)
    hits = total = 0
    for p in range(20):
        truth = set(np.argsort(-sims[p])[:5].tolist())
        hits += len(truth & by_probe.get(p, set()))
        total += 5
    recall = hits / total
    assert recall > 0.5  # shortlist-chance floor is 50/399 ~ 0.125


def test_ddsketch_merge_invariance_and_bound(spark):
    """DDSketch: (1) sketching shards then merging == sketching the
    whole corpus (lossless mergeability — what GK can't do); (2) every
    reconstructed quantile is within the published relative-error bound
    alpha=(gamma-1)/(gamma+1) of the true item quantile."""
    import math

    from gridded_etl_tools_spark.operators.sketches import (
        dd_histogram, dd_merge, dd_quantiles,
    )

    gamma = 1.02
    vals = [round(1.5 ** (i % 17) + i * 0.37, 4) for i in range(1, 401)]
    df = spark.createDataFrame(
        [(("a" if i % 3 else "b"), v) for i, v in enumerate(vals)],
        "g string, v double",
    )
    whole = dd_histogram(df, ["g"], "v", gamma)
    h1 = dd_histogram(df.filter(F.col("v") < 10), ["g"], "v", gamma)
    h2 = dd_histogram(df.filter(F.col("v") >= 10), ["g"], "v", gamma)
    merged = dd_merge(h1.unionByName(h2), ["g"])
    a = {tuple(r) for r in whole.collect()}
    b = {tuple(r) for r in merged.collect()}
    assert a == b  # bin counts identical: merge is exact

    got = {
        r["g"]: (r["p50"], r["p90"])
        for r in dd_quantiles(merged, ["g"], [0.5, 0.9], gamma).collect()
    }
    alpha = (gamma - 1) / (gamma + 1)
    rows = sorted((("a" if i % 3 else "b"), v) for i, v in enumerate(vals))
    for g in ("a", "b"):
        xs = sorted(v for gg, v in rows if gg == g)
        for q, est in zip((0.5, 0.9), got[g]):
            true = xs[math.ceil(q * len(xs)) - 1]  # item quantile
            assert abs(est - true) / true <= alpha + 1e-9, (g, q, est, true)
