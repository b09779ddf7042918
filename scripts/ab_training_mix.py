#!/usr/bin/env python3
"""Scale run for the round-6 training-mix composite: the fused
temperature-resample → hash-split → epoch-order plan at 10M documents
(~160x the sf0.1 documents table), metadata-only rows (the pipeline
never touches text payloads, so this is the realistic planner shape).

Checks the two claims the catalog row's docstring makes:

* the resample is a dim-sized rate broadcast + map-side filter — the
  corpus is NOT shuffled to decide keeps;
* the epoch order's one corpus exchange keys on the hash-uniform shard,
  so the max task time tracks rows/shards, not the skew of ``source``
  (which is deliberately zipf-heavy here: the top source owns ~23% of
  docs).

Usage: python scripts/ab_training_mix.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.operators import text as text_ops  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_session("ab_training_mix")

    # zipf-ish source axis: source s gets ~ 1/(s+1) of the mass over 20
    # sources — a realistic head-heavy web-crawl mix
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("src_"),
            F.floor(
                F.pow(F.lit(20.0), F.pmod(F.xxhash64("id"), 1000) / 1000.0)
            ).cast("int").cast("string"),
        ).alias("source"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 4000) + 100).alias("n_chars"),
    ).localCheckpoint(eager=True)  # materialize synth so timings are pure
    n = docs.count()
    top = docs.groupBy("source").count().orderBy(F.desc("count")).first()
    print(f"docs={n} top_source={top['source']} share={top['count']/n:.2f}",
          flush=True)

    t0 = time.time()
    kept = text_ops.temperature_resample(
        docs, group_col="source", alpha=0.5, id_col="doc_id"
    )
    assigned = kept.withColumn(
        "split",
        text_ops.split_assign(
            F.col("doc_id"), {"train": 90, "val": 5, "test": 5}
        ),
    )
    ordered = text_ops.epoch_order(assigned, epoch=1, n_shards=64)
    out = ordered.groupBy("source", "split", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.max("pos").alias("max_pos"),
    )
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"AB training_mix_fused_10M: {dt:.1f}s "
          f"({n / dt / 1e6:.1f}M docs/s)", flush=True)

    # shuffle-shape audit: exactly one exchange may key on a corpus-sized
    # frame, and it must key on the uniform shard hash
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exch = plan.count("Exchange hashpartitioning")
    print(f"exchanges={n_exch}", flush=True)


if __name__ == "__main__":
    main()
