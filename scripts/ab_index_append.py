#!/usr/bin/env python3
"""A/B: IvfIndex.append cost vs corpus size (judge r6 item 3).

Claim under test: appending a fixed-size daily batch to a persisted
IVF index costs O(batch) — assignment against the centroid book plus a
partitioned write of batch-sized files — regardless of how big the
already-indexed corpus is.  The alternative (what you'd do without
``append``) is a full rebuild, which is O(corpus) per batch.

Measures, per corpus size:
  * build time (the one-off)
  * append of a fixed 10k batch with skip_existing=False (pure append
    path — O(batch))
  * append with skip_existing=True (adds the id-probe anti-join, an
    id-column-only scan of the index — grows with corpus but is a
    single-column read; reported separately so the trade is honest)
  * full rebuild time (the no-append alternative, O(corpus))

Usage: python scripts/ab_index_append.py [sizes...]   # default 200000 800000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.operators.similarity import IvfIndex  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402

DIM = 64
CELLS = 1000
BATCH = 10_000
ROOT = "/tmp/spark_graft_ivf_append_ab"


def synth(spark, n: int, id_offset: int = 0):
    """Deterministic pseudo-random vectors: hash-mixed sines, no numpy
    on the driver, fully distributed."""
    return (
        spark.range(n)
        .select((F.col("id") + id_offset).alias("vec_id"))
        .select(
            "vec_id",
            F.array(
                *[
                    F.sin(F.col("vec_id") * (0.37 + 0.011 * d) + d)
                    for d in range(DIM)
                ]
            ).alias("embedding"),
        )
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 800_000]
    spark = get_session("ab_index_append")
    out = {"dim": DIM, "cells": CELLS, "batch": BATCH, "runs": []}
    for n in sizes:
        shutil.rmtree(ROOT, ignore_errors=True)
        corpus = synth(spark, n)
        cents = synth(spark, CELLS, id_offset=10_000_000)
        batch = synth(spark, BATCH, id_offset=20_000_000)

        t0 = time.time()
        idx = IvfIndex.build(corpus, cents, ROOT)
        t_build = time.time() - t0

        t0 = time.time()
        idx.append(batch, skip_existing=False)
        t_append = time.time() - t0

        batch2 = synth(spark, BATCH, id_offset=30_000_000)
        t0 = time.time()
        idx.append(batch2, skip_existing=True)
        t_append_guarded = time.time() - t0

        t0 = time.time()
        IvfIndex.build(
            corpus.unionByName(batch).unionByName(batch2),
            cents,
            ROOT + "_rebuild",
        )
        t_rebuild = time.time() - t0
        shutil.rmtree(ROOT + "_rebuild", ignore_errors=True)

        run = {
            "corpus": n,
            "build_s": round(t_build, 1),
            "append_10k_s": round(t_append, 1),
            "append_10k_guarded_s": round(t_append_guarded, 1),
            "rebuild_s": round(t_rebuild, 1),
        }
        out["runs"].append(run)
        print(json.dumps(run))
    print(json.dumps(out))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
