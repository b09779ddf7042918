#!/usr/bin/env python3
"""Round-14 isolated A/Bs: OLD (r13-close) operator variants are
monkeypatched into the live modules and each experiment alternates
old/new reps INSIDE ONE session (r13 lesson: process-to-process A/Bs
lie by +-1s at this SF), timing the full catalog row through the noop
sink.

Usage: python scripts/ab_r14.py [experiment ...]   (default: all)
Experiments: tfidf minhash kmeans kmeans_auto rrf_batch rrf interp
             ivf_topk ivf_topk_auto ivf_nprobe pq
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.operators import clustering as clus  # noqa: E402
from gridded_etl_tools_spark.operators import dedup as dedup_ops  # noqa: E402
from gridded_etl_tools_spark.operators import reindex as reindex_ops  # noqa: E402
from gridded_etl_tools_spark.operators import retrieval as ret_ops  # noqa: E402
from gridded_etl_tools_spark.operators import similarity as sim_ops  # noqa: E402
from gridded_etl_tools_spark.operators import text as text_ops  # noqa: E402
from gridded_etl_tools_spark.plans.catalog import QUERIES  # noqa: E402
from gridded_etl_tools_spark.plans.tables import load  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "7"))


# ---------------------------------------------------------------- OLD variants
# verbatim r13-close (586bd1c) bodies, trimmed of docstrings

def old_rrf_fuse(lex_top, dense_top, by, k_out=10, rrf_k=60):
    rrf = (
        F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rank")), F.lit(0.0)
        )
    )
    part = [F.lit(0)] if len(by) == 1 else [F.col(c) for c in by[:-1]]
    w = Window.partitionBy(*part).orderBy(rrf.desc(), F.asc(by[-1]))
    return (
        lex_top.join(dense_top, on=by, how="full_outer")
        .withColumn("rrf_score", F.round(rrf, 6))
        .withColumn("rrf_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rrf_rank") <= k_out)
    )


def old_interpolate_na(df, time_col, value_col, group_cols=None,
                       out_col=None, tiebreak_cols=None):
    out_col = out_col or value_col
    parts = [F.col(c) for c in (group_cols or [])]
    order = [time_col, *(tiebreak_cols or [])]
    w_back = (
        Window.partitionBy(*parts).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*parts).orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    v = F.col(value_col)
    t_of_v = F.when(v.isNotNull(), t_us)
    scans = df.withColumns(
        {
            "__pv": F.last(v, ignorenulls=True).over(w_back),
            "__pt": F.last(t_of_v, ignorenulls=True).over(w_back),
            "__nv": F.first(v, ignorenulls=True).over(w_fwd),
            "__nt": F.first(t_of_v, ignorenulls=True).over(w_fwd),
        }
    )
    prev_v, prev_t = F.col("__pv"), F.col("__pt")
    next_v, next_t = F.col("__nv"), F.col("__nt")
    frac = F.when(
        next_t != prev_t,
        (t_us - prev_t).cast("double") / (next_t - prev_t).cast("double"),
    ).otherwise(F.lit(0.0))
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
    )
    return scans.withColumn(out_col, interp).drop(
        "__pv", "__pt", "__nv", "__nt"
    )


def old_minhash_lsh_candidates(df, text_col, id_col, num_hashes=16,
                               bands=4, shingle_n=3):
    band_hash = dedup_ops.lsh_band_hashes(
        df, text_col, id_col, num_hashes, bands, shingle_n
    )
    a = band_hash.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = band_hash.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def old_kmeans(df, init_centroids, iters=2, id_col="vec_id",
               vec_col="embedding", centroid_id_col="centroid_id",
               decimals=6, checkpoint=False, vectorized=None):
    from gridded_etl_tools_spark.operators.similarity import (
        ivf_assign,
        nearest_centroids,
        resolve_vectorized,
    )

    vectorized = resolve_vectorized(vectorized)

    def _assign(frame, cent):
        cent_in = cent.select(
            F.col(centroid_id_col).alias(id_col), F.col(vec_col)
        )
        if vectorized:
            return ivf_assign(
                frame, cent_in, id_col=id_col, vec_col=vec_col,
                centroid_id_col=centroid_id_col, vectorized=True,
            )
        return nearest_centroids(
            frame, cent_in,
            id_col=id_col, vec_col=vec_col, centroid_id_col=centroid_id_col,
        )

    cents = init_centroids.select(
        F.col(id_col).alias(centroid_id_col), F.col(vec_col)
    )
    assigned = None
    for _ in range(max(iters, 1)):
        assigned = _assign(df, cents)
        cents = clus._mean_centroids(assigned, vec_col, centroid_id_col,
                                     decimals)
        if checkpoint:
            cents = cents.localCheckpoint(eager=True)
    assigned = _assign(df, cents)
    return cents, assigned


def old_tfidf(spark, sf_dir) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(text_ops.tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=True)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(),
                                             F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


def old_ivf_topk(corpus, centroids, probe_predicate, id_col="vec_id",
                 vec_col="embedding", k=5, nprobe=1, vectorized=None,
                 rank_decimals=None):
    from gridded_etl_tools_spark.operators.similarity import (
        _dot,
        _norm,
        cosine_pandas,
        ivf_assign,
        nearest_centroids,
        resolve_vectorized,
    )

    vectorized = resolve_vectorized(vectorized)
    cells = ivf_assign(
        corpus, centroids, id_col, vec_col, vectorized=vectorized
    )
    probe_src = corpus.filter(probe_predicate)
    if nprobe > 1:
        probe_rows = nearest_centroids(
            probe_src.select(id_col, vec_col), centroids, id_col, vec_col,
            n=nprobe,
        )
    else:
        probe_rows = ivf_assign(
            probe_src, centroids, id_col, vec_col, vectorized=vectorized
        )
    p = probe_rows.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        _norm(F.col(vec_col)).alias("probe_norm"),
        "centroid_id",
    )
    n = cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("neighbor_vec"),
        _norm(F.col(vec_col)).alias("neighbor_norm"),
        "centroid_id",
    )
    probed_cells = p.select("centroid_id").distinct()
    n = n.join(F.broadcast(probed_cells), "centroid_id", "left_semi")
    if vectorized:
        score = cosine_pandas(F.col("probe_vec"), F.col("neighbor_vec"))
    else:
        score = _dot(F.col("probe_vec"), F.col("neighbor_vec")) / (
            F.col("probe_norm") * F.col("neighbor_norm")
        )
    scored = (
        F.broadcast(p).join(n, on="centroid_id")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id", score.alias("cosine"))
    )
    rank_key = (
        F.round(F.col("cosine"), rank_decimals)
        if rank_decimals is not None
        else F.col("cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(
        rank_key.desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def old_pq_ann_topk(spark, sf_dir) -> DataFrame:
    from gridded_etl_tools_spark.operators import similarity as _sim

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cb = _sim.pq_codebooks(emb, F.col("vec_id") % 50 == 0, m=4, dim=64)
    codes = _sim.pq_encode(emb, cb, m=4, dim=64)
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    out = _sim.pq_topk(probes, codes, cb, m=4, dim=64, k=5, rank_decimals=6)
    return out.select("probe_id", "neighbor_id", "adc", "rank")


# ---------------------------------------------------------------- experiments

#: experiment -> (query name, module, attr, old callable); tfidf swaps
#: the whole query build instead of an operator
EXPERIMENTS = {
    "tfidf": ("tfidf_top_terms", None, None, old_tfidf),
    "minhash": ("minhash_lsh_candidates", dedup_ops,
                "minhash_lsh_candidates", old_minhash_lsh_candidates),
    "kmeans": ("kmeans_centroids", clus, "kmeans", old_kmeans),
    "kmeans_auto": ("kmeans_auto_centroids", clus, "kmeans", old_kmeans),
    "rrf_batch": ("hybrid_rrf_search_batch", ret_ops, "rrf_fuse",
                  old_rrf_fuse),
    "rrf": ("hybrid_rrf_search", ret_ops, "rrf_fuse", old_rrf_fuse),
    "interp": ("interpolate_gaps", reindex_ops, "interpolate_na",
               old_interpolate_na),
    "ivf_topk": ("ivf_ann_topk", sim_ops, "ivf_topk", old_ivf_topk),
    "ivf_topk_auto": ("ivf_topk_auto", sim_ops, "ivf_topk", old_ivf_topk),
    "ivf_nprobe": ("ivf_nprobe_topk", sim_ops, "ivf_topk", old_ivf_topk),
    "pq": ("pq_ann_topk", None, None, old_pq_ann_topk),
}


def main() -> None:
    names = sys.argv[1:] or list(EXPERIMENTS)
    spark = get_session("ab_r14")

    for exp in names:
        qname, mod, attr, old_fn = EXPERIMENTS[exp]

        def run(variant: str) -> float:
            if mod is not None and variant == "old":
                orig = getattr(mod, attr)
                setattr(mod, attr, old_fn)
            try:
                spark.sparkContext.setJobDescription(f"{exp}:{variant}")
                build = (old_fn if mod is None and variant == "old"
                         else QUERIES[qname])
                t0 = time.perf_counter()
                build(spark, SF_DIR).write.format("noop").mode(
                    "overwrite").save()
                return time.perf_counter() - t0
            finally:
                if mod is not None and variant == "old":
                    setattr(mod, attr, orig)
                spark.sparkContext.setJobDescription(None)

        run("old"), run("new")  # warm-up both variants
        olds, news = [], []
        for _ in range(REPS):
            olds.append(run("old"))
            news.append(run("new"))
        mo, mn = statistics.median(olds), statistics.median(news)
        print(
            f"{exp}: old={mo:.3f}s new={mn:.3f}s speedup={mo / mn:.2f}x\n"
            f"    old={[round(s, 3) for s in olds]}\n"
            f"    new={[round(s, 3) for s in news]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
