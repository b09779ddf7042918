#!/usr/bin/env python3
"""A/B: the AUTO-vectorized default for the big vector operators
(r5 verdict item 2 "done" check).

Round-5 measured (BASELINE.md "LLM-ops at scale", explicit flags):
ivf_assign JVM 274.8 s vs BLAS 2.4 s at 200k x 64; kmeans BLAS 5.0 s.
Round 6 makes the BLAS path the DEFAULT (``vectorized=None`` →
auto-enable when numpy imports); this script re-measures the same
200k x 64 shapes calling the operators WITHOUT any flag, proving a
plain caller now gets the ~110x path.

Usage: python scripts/ab_vector_auto.py  (run from /root/repo)
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.operators import clustering as clus  # noqa: E402
from gridded_etl_tools_spark.operators import similarity as sim  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402


def main() -> None:
    spark = get_session("ab_vector_auto")
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    # 100x the sf0.1 table = 200k x 64, ids kept unique per copy
    copies = spark.range(100).select(F.col("id").alias("copy"))
    emb = (
        base.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)  # exclude build time from the A/B
    )
    n = emb.count()
    cents = base.filter(F.col("vec_id") % 32 == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )  # 64 coarse cells

    t0 = time.time()
    # NO flag: auto default must pick the Arrow/BLAS path
    sim.ivf_assign(emb, cents).write.format("noop").mode("overwrite").save()
    t_assign = time.time() - t0

    t1 = time.time()
    sim.ivf_topk(
        emb, cents, F.col("vec_id") % 2000 == 0, k=5, nprobe=2
    ).write.format("noop").mode("overwrite").save()
    t_topk = time.time() - t1

    t2 = time.time()
    seeds = cents.limit(16)
    _, assigned = clus.kmeans(emb, seeds, iters=2)
    assigned.write.format("noop").mode("overwrite").save()
    t_kmeans = time.time() - t2

    print(json.dumps({
        "bench": "vector_auto_default",
        "n_vectors": n,
        "dims": 64,
        "ivf_assign_s": round(t_assign, 1),
        "ivf_topk_s": round(t_topk, 1),
        "kmeans_s": round(t_kmeans, 1),
    }))


if __name__ == "__main__":
    main()
