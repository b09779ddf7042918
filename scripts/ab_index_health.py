#!/usr/bin/env python3
"""A/B: index health metrics detect distribution drift (judge r7 item 4).

Claim under test: ``IvfIndex.health`` / ``IvfPqIndex.health`` give the
drift/rebalance policy a MEASURED trigger.  We build both indexes on a
base Gaussian-mixture distribution, then append batches drawn from a
progressively SHIFTED distribution (mean drifts along one axis) and
record the health report after each append:

  * cell skew (max/median population) climbs as the shifted vectors
    pile into the handful of cells nearest the drift direction, and
    crosses the 4x rebuild threshold;
  * the PQ sample quantization error (shifted batch vs the FROZEN
    build-time codebooks) climbs past the 2x mse_ratio threshold well
    before the cell skew does — PQ degrades first, exactly why the PQ
    health report carries the extra signal.

A rebuild (fresh centroids + codebooks on the union) restores both
metrics to ~baseline, closing the loop the policy describes.

Usage: python scripts/ab_index_health.py [n_base] [batch] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.operators.similarity import (  # noqa: E402
    IvfIndex,
    IvfPqIndex,
    pq_codebooks,
)
from gridded_etl_tools_spark.session import get_session  # noqa: E402

DIM = 64
ROOT = "/tmp/spark_graft_ivf_health_ab"


def _vectors(spark, n, start_id, shift, mode=None):
    """Gaussian mixture around 8 anchors — deterministic per id.
    ``mode`` collapses the draw to ONE anchor (the realistic drift: a
    new ingestion source dominated by a single domain) and ``shift``
    moves it off-manifold so quantization degrades too."""
    rng = np.random.default_rng(start_id)
    anchors = np.random.default_rng(0).standard_normal((8, DIM)) * 3.0
    if mode is None:
        pick = rng.integers(0, len(anchors), n)
    else:
        pick = np.full(n, mode)
    vecs = anchors[pick] + rng.standard_normal((n, DIM)) * 0.5
    vecs[:, 0] += shift
    rows = [
        (int(start_id + i), [float(x) for x in vecs[i]]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _report(tag, row):
    print(
        f"{tag}: skew={row['skew']} "
        + (
            f"mse_ratio={row['mse_ratio']} " if "mse_ratio" in row.asDict() else ""
        )
        + f"needs_rebuild={row['needs_rebuild']}"
    )
    return row


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_session()
    shutil.rmtree(ROOT, ignore_errors=True)

    base = _vectors(spark, n_base, 0, shift=0.0).cache()
    # centroids = the mixture anchors themselves: the baseline is a
    # well-balanced index (skew ~1), so the drift signal is unambiguous
    anchors = np.random.default_rng(0).standard_normal((8, DIM)) * 3.0
    cents = spark.createDataFrame(
        [(int(i), [float(x) for x in anchors[i]]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    books = pq_codebooks(base, F.col("vec_id") % 199 == 0, m=4, dim=DIM)
    ivf = IvfIndex.build(base, cents, os.path.join(ROOT, "ivf"))
    pq = IvfPqIndex.build(base, cents, books, os.path.join(ROOT, "pq"))

    out = {"baseline": {}, "drift": [], "after_rebuild": {}}
    row = ivf.health(spark).collect()[0]
    prow = pq.health(spark, sample=base.limit(2000)).collect()[0]
    _report("baseline ivf", row)
    _report("baseline pq ", prow)
    out["baseline"] = {
        "skew": row["skew"], "mse_ratio": prow["mse_ratio"],
    }

    union = base
    for b in range(n_batches):
        shift = 6.0 * (b + 1)
        drifted = _vectors(
            spark, batch, n_base + b * batch, shift=shift, mode=0
        ).cache()
        union = union.unionByName(drifted)
        ivf.append(drifted, skip_existing=False)
        pq.append(drifted, skip_existing=False)
        row = ivf.health(spark).collect()[0]
        prow = pq.health(spark, sample=drifted).collect()[0]
        _report(f"after shifted batch {b + 1} ivf", row)
        _report(f"after shifted batch {b + 1} pq ", prow)
        out["drift"].append(
            {
                "batch": b + 1, "shift": shift, "skew": row["skew"],
                "ivf_needs_rebuild": bool(row["needs_rebuild"]),
                "mse_ratio": prow["mse_ratio"],
                "pq_needs_rebuild": bool(prow["needs_rebuild"]),
            }
        )

    # the policy's answer: rebuild refreshes centroids + codebooks —
    # the real recipe: Lloyd rounds on the union, seeded with the old
    # anchors plus one sample from each drifted batch
    from gridded_etl_tools_spark.operators.clustering import kmeans

    seeds = cents.unionByName(
        union.filter(F.col("vec_id") >= n_base)
        .filter((F.col("vec_id") - n_base) % batch == 0)
        .select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    )
    cents2, _ = kmeans(union, seeds, iters=3)
    cents2 = cents2.select(F.col("centroid_id").alias("vec_id"), "embedding")
    books2 = pq_codebooks(union, F.col("vec_id") % 199 == 0, m=4, dim=DIM)
    shutil.rmtree(os.path.join(ROOT, "pq2"), ignore_errors=True)
    pq2 = IvfPqIndex.build(union, cents2, books2, os.path.join(ROOT, "pq2"))
    prow = pq2.health(
        spark, sample=union.orderBy(F.desc("vec_id")).limit(2000)
    ).collect()[0]
    _report("after rebuild pq", prow)
    out["after_rebuild"] = {
        "skew": prow["skew"], "mse_ratio": prow["mse_ratio"],
        "needs_rebuild": bool(prow["needs_rebuild"]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
