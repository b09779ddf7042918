"""Hybrid retrieval: lexical (BM25) + dense (cosine) legs fused by
reciprocal-rank fusion (Cormack et al. 2009's public formulation,
score = Σ 1/(rrf_k + rank)) — rank-based, so the incomparable BM25 and
cosine scales need no calibration.  The standard search stack for
data selection and RAG corpus curation.

The catalog rows ``hybrid_rrf_search`` / ``hybrid_rrf_search_batch``
attest both forms under the DuckDB oracle; this module is the
call-it-yourself API.

Scale shape: the lexical leg shuffles only the query terms' posting
lists (``text.bm25_scores`` / ``bm25_scores_batch`` — the batch form
pays ONE corpus pass for the union of all query terms); the dense leg
broadcasts the probes through one ``similarity.cosine_topk`` scan;
each leg's per-query top-k bounds everything downstream, so fusion and
the final re-rank run on <= 2*k_leg-row frames per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gridded_etl_tools_spark.operators import similarity as sim_ops
from gridded_etl_tools_spark.operators import text as text_ops


def rrf_fuse(
    lex_top: DataFrame,
    dense_top: DataFrame,
    by: list[str],
    k_out: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Fuse two rank lists (columns ``by`` + ``lex_rank`` /
    ``dense_rank``) by reciprocal rank; rows appearing in only one leg
    contribute that leg's term alone.  Returns the ``by`` columns +
    lex_rank, dense_rank, rrf_score, rrf_rank (<= ``k_out``).

    r14 (guide §2.4): the two legs are fused by UNION + one per-key
    MAX aggregation instead of a full-outer join.  Each leg carries at
    most one row per ``by`` key, so padding the missing leg's rank with
    NULL and taking ``max`` per key reconstructs exactly the full-outer
    row — for one keyed exchange instead of two sort exchanges plus a
    SortMergeJoin on the bounded (<= 2 x k_leg per query) fusion
    frames.  In the batched form the union is repartitioned by the
    query key first, so the aggregation AND the final re-rank window
    reuse that single exchange (subset-key clustering).

    Output contract (r14): exactly the ``by`` columns + lex_rank,
    dense_rank, rrf_score, rrf_rank — the legs are projected down
    before fusing, so passthrough columns a caller left on a leg are
    NOT preserved (the old join-based form leaked them); re-join any
    payload on the ``by`` key after fusion."""
    lex_t = lex_top.schema["lex_rank"].dataType
    dense_t = dense_top.schema["dense_rank"].dataType
    lex_p = lex_top.select(
        *by, "lex_rank", F.lit(None).cast(dense_t).alias("dense_rank")
    )
    dense_p = dense_top.select(
        *by, F.lit(None).cast(lex_t).alias("lex_rank"), "dense_rank"
    )
    unioned = lex_p.unionByName(dense_p)
    if len(by) > 1:
        # one exchange on the query key serves the (by)-keyed agg and
        # the per-query re-rank window; the unioned frame is bounded
        # (<= 2 x k_leg rows per query), so the narrow key is skew-free
        unioned = unioned.repartition(*[F.col(c) for c in by[:-1]])
    fused = unioned.groupBy(*by).agg(
        F.max("lex_rank").alias("lex_rank"),
        F.max("dense_rank").alias("dense_rank"),
    )
    rrf = (
        F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rank")), F.lit(0.0)
        )
    )
    # single-query fusion (by = [doc_id]) ranks one bounded global
    # frame: partition on a constant, never an empty partitionBy
    part = [F.lit(0)] if len(by) == 1 else [F.col(c) for c in by[:-1]]
    w = Window.partitionBy(*part).orderBy(rrf.desc(), F.asc(by[-1]))
    return (
        fused.withColumn("rrf_score", F.round(rrf, 6))
        .withColumn("rrf_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rrf_rank") <= k_out)
    )


def hybrid_rrf_batch(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: DataFrame,
    probe_ids: list,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_leg: int = 20,
    k_out: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Batched hybrid retrieval: N queries in ONE plan.  ``query_terms``
    is a (query_id, term) table; ``probe_ids`` names each query's
    embedding row in ``emb`` (query_id doubles as the probe vector id —
    the tables share an id space, as in the single-query catalog row).
    Returns (query_id, doc_id, lex_rank, dense_rank, rrf_score,
    rrf_rank)."""
    lex = text_ops.bm25_scores_batch(
        docs, query_terms, text_col=text_col, id_col=doc_id_col
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("bm25"), F.asc(doc_id_col)
    )
    lex_top = (
        lex.withColumn("lex_rank", F.row_number().over(wq).cast("int"))
        .filter(F.col("lex_rank") <= k_leg)
        .select("query_id", doc_id_col, "lex_rank")
    )
    probes = emb.filter(F.col(vec_id_col).isin(list(probe_ids)))
    dense_top = (
        sim_ops.cosine_topk(probes, emb, id_col=vec_id_col, vec_col=vec_col, k=k_leg)
        .select(
            F.col("probe_id").cast("int").alias("query_id"),
            F.col("neighbor_id").alias(doc_id_col),
            F.col("rank").cast("int").alias("dense_rank"),
        )
    )
    return rrf_fuse(
        lex_top, dense_top, by=["query_id", doc_id_col],
        k_out=k_out, rrf_k=rrf_k,
    ).select(
        "query_id", doc_id_col, "lex_rank", "dense_rank",
        "rrf_score", "rrf_rank",
    )
