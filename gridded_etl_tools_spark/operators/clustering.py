"""Embedding clustering: spherical k-means (Lloyd's) and SemDeDup-style
semantic deduplication.

Reference parity: the reference repo has no clustering of its own — this
module is part of the training-data-pipeline extension (north star), the
cluster-then-dedup shape from SemDeDup (Abbas et al. 2023) expressed as
DataFrame plans.

Scale design
------------
* **Assignment is map-side.**  Each Lloyd round reuses
  :func:`~gridded_etl_tools_spark.operators.similarity.nearest_centroids`:
  the centroid book is packed into one broadcast row and every corpus
  vector picks its argmax-cosine centroid inside a whole-stage-codegen
  higher-order fold — zero shuffles over the corpus.
* **The update shuffles (centroid, dim) pairs, not vectors.**  New
  centroids are per-dimension means: ``posexplode`` the assigned vectors,
  partial-aggregate map-side, final-aggregate on ``(centroid_id, pos)`` —
  the exchange carries ``k × dim`` doubles of state regardless of corpus
  size (the rows entering the exchange are pre-combined per task).
* **Per-round lineage is cut** with ``localCheckpoint`` (same pattern as
  ``operators/dedup.py`` connected components) so a deep iteration count
  cannot blow up the plan.
* **Cross-engine determinism**: centroid coordinates are rounded to
  ``decimals`` places after every update.  Summation order differs
  between engines (and between Spark task schedules) at the last ulp;
  rounding re-quantizes the coordinates so the NEXT round's assignment —
  a comparison of cosines — sees bit-identical centroids everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gridded_etl_tools_spark.operators.similarity import (
    _dot,
    _norm,
    nearest_centroids,
)


def _mean_centroids(
    assigned: DataFrame,
    vec_col: str,
    centroid_id_col: str,
    decimals: int,
) -> DataFrame:
    """Per-dimension mean of each cluster's vectors, rounded, re-assembled
    into an array column.  Exchange payload is (centroid_id, pos, partial
    sum/count) — k*dim rows after map-side combine."""
    per_dim = (
        assigned.select(
            F.col(centroid_id_col),
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        .groupBy(centroid_id_col, "pos")
        .agg(F.round(F.avg("x"), decimals).alias("x"))
    )
    return per_dim.groupBy(centroid_id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "x"))), lambda s: s["x"]
        ).alias(vec_col)
    )


def kmeans(
    df: DataFrame,
    init_centroids: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    decimals: int = 6,
    checkpoint: bool = False,
    vectorized: bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Spherical k-means: ``iters`` Lloyd rounds of (argmax-cosine
    assignment, per-dimension mean update).  Assignment ties break on the
    lowest centroid id; updates are rounded to ``decimals`` so the
    trajectory is engine- and schedule-independent (see module doc).
    Cluster labels keep the ids of the seed centroids (a cluster that
    loses all members simply disappears, as in plain Lloyd's).

    Returns ``(centroids, assignments)``: the final centroid table
    ``(centroid_id, vec)`` and the corpus labeled with its final-round
    assignment ``(id, vec, centroid_id)``.

    ``checkpoint=True`` materializes each round's centroid table AND
    the input corpus once with ``localCheckpoint`` (r14: the corpus
    barrier trades one cached pass for iters+1 source scans and their
    per-pass cast work) — use for deep iteration counts.  Note
    ``localCheckpoint`` blocks are not fault-tolerant: an executor loss
    mid-run fails the job instead of recomputing, the standard trade
    this repo makes for lineage cuts.  The default keeps the plan lazy
    so small fixed-round queries stay single-job.

    ``vectorized`` defaults to AUTO (BLAS batch-matmul assignment via
    :func:`~gridded_etl_tools_spark.operators.similarity.ivf_assign`
    whenever numpy is importable — each Lloyd round collects the
    centroid table, which per-round decimal rounding makes
    deterministic, and each Arrow batch is one matmul + argmax;
    measured ~100x on the assignment stage at 200k x 64-dim, BASELINE
    round-5 notes).  Oracle catalog rows pass ``vectorized=False`` to
    pin the bit-exact pure-JVM float-sum order.
    """
    from gridded_etl_tools_spark.operators.similarity import (
        ivf_assign,
        resolve_vectorized,
    )

    vectorized = resolve_vectorized(vectorized)

    def _assign(frame: DataFrame, cent: DataFrame) -> DataFrame:
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
    if checkpoint:
        # every Lloyd round re-scans the corpus (iters assignment passes
        # + the final one); materializing it once trades one cached pass
        # for iters+1 source scans and their per-pass cast/projection
        # work — the guide §5 persist-when-reused call, scoped to the
        # deep-iteration mode that already cuts lineage per round
        df = df.localCheckpoint(eager=True)
    assigned = None
    for _ in range(max(iters, 1)):
        assigned = _assign(df, cents)
        cents = _mean_centroids(assigned, vec_col, centroid_id_col, decimals)
        if checkpoint:
            cents = cents.localCheckpoint(eager=True)
    # final assignment against the final centroids
    assigned = _assign(df, cents)
    return cents, assigned


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    checkpoint: bool = False,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: assign every vector to its
    nearest centroid (map-side broadcast argmax), then WITHIN each cluster
    mark as duplicate any vector whose cosine to a lower-id cluster-mate
    is ``>= threshold``.  Never all-pairs: the only join is the
    within-cell equi-join on ``centroid_id``, so candidate pairs per
    vector are bounded by its cell population — size the centroid book
    (k ≈ corpus / target_cell) to keep cells small at scale.

    Semantics note: the drop rule is "similar to ANY lower id in the
    cell" (deterministic, join-expressible) rather than the sequential
    greedy "similar to any lower SURVIVING id" — the parallel form can
    drop slightly more than the greedy form when duplicates chain, which
    is the conservative direction for training-data dedup.

    Returns ``(id, centroid_id, is_duplicate)`` for every input row.
    """
    assigned = nearest_centroids(
        df, centroids, id_col=id_col, vec_col=vec_col,
        centroid_id_col=centroid_id_col,
    )
    if checkpoint:
        # the assignment feeds three plan branches (pair sides + final
        # flags); materializing it trades one cached pass for three
        # corpus scans — the right call whenever df isn't itself cached
        assigned = assigned.localCheckpoint(eager=True)
    a = assigned.select(
        F.col(centroid_id_col),
        F.col(id_col).alias("__id_a"),
        F.col(vec_col).alias("__vec_a"),
        _norm(F.col(vec_col)).alias("__norm_a"),
    )
    b = assigned.select(
        F.col(centroid_id_col),
        F.col(id_col).alias("__id_b"),
        F.col(vec_col).alias("__vec_b"),
        _norm(F.col(vec_col)).alias("__norm_b"),
    )
    dropped = (
        a.join(b, on=centroid_id_col)
        .filter(F.col("__id_a") < F.col("__id_b"))
        .filter(
            _dot(F.col("__vec_a"), F.col("__vec_b"))
            / (F.col("__norm_a") * F.col("__norm_b"))
            >= F.lit(threshold)
        )
        .select(F.col("__id_b").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assigned.select(id_col, centroid_id_col)
        .join(dropped, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col(centroid_id_col),
            F.coalesce(F.col("__dup"), F.lit(False)).alias("is_duplicate"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    damping: float = 0.85,
    step_round: int = 8,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Simple PageRank over a directed edge list (pass both directions
    for an undirected graph): ``r' = (1-d)/N + d * sum(r(u)/deg(u))``.

    The graph-centrality sibling of :func:`~gridded_etl_tools_spark.
    operators.dedup.duplicate_clusters` — rank documents by their
    position in the near-duplicate graph (hubs of heavily-templated
    content score high and are prime removal candidates).

    Physical shape per iteration: one equi-join of ranks onto edges on
    the src key + one hash agg on dst — exactly a shuffle pair per
    round, dimension-free.  Ranks are rounded to ``step_round`` each
    iteration so cross-engine (and cross-partitioning) float-sum order
    can never compound; set ``checkpoint_every`` for deep iteration
    counts (same lineage-cut pattern as :func:`kmeans`).  Dangling-mass
    redistribution is intentionally omitted (the simple form; nodes
    without in-edges settle at ``(1-d)/N``).

    Returns ``id, rank``.
    """
    # The edge list is referenced every round (and nodes/deg derive from
    # it); Catalyst does not dedup the common subtree, so a lazily-derived
    # graph (e.g. the MinHash-LSH near-dup pipeline) would be recomputed
    # per iteration — measured 28 corpus scans for 2 rounds.  Materialize
    # the graph once; everything downstream reads the checkpoint.
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    ranks = nodes.withColumn("rank", F.round(F.lit(1.0) / n, step_round))
    for i in range(iterations):
        contrib = (
            edges.join(ranks, edges[src] == ranks["id"])
            .join(deg, ranks["id"] == deg["id"])
            .select(
                F.col(dst).alias("id"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
        )
        sums = contrib.groupBy("id").agg(
            F.round(F.sum("__c"), step_round).alias("__s")
        )
        ranks = nodes.join(sums, on="id", how="left").select(
            "id",
            F.round(
                (F.lit(1.0) - F.lit(damping)) / n
                + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0)),
                step_round,
            ).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def dbscan(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    eps: float = 1.0,
    min_pts: int = 4,
    max_iter: int = 20,
) -> DataFrame:
    """Density-based clustering (DBSCAN) over 2-D points: core points
    have >= ``min_pts`` points (counting themselves) within ``eps``;
    clusters are connected components of the core-core eps-graph; border
    points attach to their lowest-labeled neighboring core cluster;
    everything else is noise.  Returns ``id, role (core|border|noise),
    cluster_id (NULL for noise)``.

    Physical shape — NEVER all-pairs: points land in an eps-sized grid,
    the candidate join fans each point out to its 3x3 neighbor buckets
    (constant 9x, the spatial.nearest_cells pattern), so candidates per
    point are its bucket-neighborhood population.  Core flags are one
    hash agg over the pair list; components reuse the min-label CC
    fixpoint from dedup.duplicate_clusters (shuffles only (node, label)
    longs); border assignment is one more agg over the pair list.
    Deterministic throughout (min-cluster tie-breaks).
    """
    from gridded_etl_tools_spark.operators.dedup import duplicate_clusters

    eps2 = float(eps) * float(eps)
    p = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    b = p.select(
        "id", "x", "y",
        F.floor(F.col("x") / eps).cast("long").alias("bx"),
        F.floor(F.col("y") / eps).cast("long").alias("by"),
    )
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    contrib = (
        b.select(
            F.col("id").alias("nid"),
            F.col("x").alias("nx"),
            F.col("y").alias("ny"),
            "bx", "by",
            F.explode(off).alias("dy"),
        )
        .withColumn("dx", F.explode(off))
        .select(
            "nid", "nx", "ny",
            (F.col("bx") + F.col("dx")).alias("bx"),
            (F.col("by") + F.col("dy")).alias("by"),
        )
    )
    d2 = (F.col("x") - F.col("nx")) ** 2 + (F.col("y") - F.col("ny")) ** 2
    pairs = (
        b.join(contrib, on=["bx", "by"])
        .filter((F.col("id") != F.col("nid")) & (d2 <= F.lit(eps2)))
        .select("id", "nid")
    ).persist()

    counts = pairs.groupBy("id").agg(F.count(F.lit(1)).alias("__n"))
    core = counts.filter(F.col("__n") >= min_pts - 1).select("id")

    core_pairs = (
        pairs.join(core, on="id")
        .join(core.select(F.col("id").alias("nid")), on="nid")
        .filter(F.col("id") < F.col("nid"))
        .select(F.col("id").alias("id_a"), F.col("nid").alias("id_b"))
    )
    cc = duplicate_clusters(core_pairs, max_iter=max_iter)
    # singleton cores (no core neighbor) form their own cluster
    core_clusters = core.join(cc, on="id", how="left").select(
        "id", F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id")
    )

    border = (
        pairs.join(core.select(F.col("id").alias("__cid")),
                   pairs["nid"] == F.col("__cid"))
        .join(core_clusters.select(F.col("id").alias("__cid2"),
                                   F.col("cluster_id")),
              F.col("nid") == F.col("__cid2"))
        .join(core, on="id", how="left_anti")
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    labeled = core_clusters.withColumn("role", F.lit("core")).unionByName(
        border.withColumn("role", F.lit("border"))
    )
    noise = p.select("id").join(labeled.select("id"), on="id", how="left_anti")
    out = labeled.unionByName(
        noise.select(
            "id",
            F.lit(None).cast(labeled.schema["cluster_id"].dataType).alias(
                "cluster_id"
            ),
            F.lit("noise").alias("role"),
        )
    )
    return out.select("id", "role", "cluster_id")
