"""End-to-end LLM training-data pipeline, Spark idiom — the composed
USER API of the engine's corpus operators (the catalog rows
``corpus_prep_end_to_end`` and ``training_mix_end_to_end`` exercise the
same stages under the DuckDB oracle; this module is the
call-it-yourself shape).

Stages, each an independent DataFrame→DataFrame step:

1. **Quality gate** — pure column expressions (``operators/text.py``:
   token counts, stopword/punct ratios), zero UDFs, zero shuffles.
2. **Exact dedup** — hash-agg on the content key
   (``dedup.exact_dedup``); swap in ``minhash_lsh_candidates`` +
   ``duplicate_clusters`` for near-dup, or ``dedup.LshIndex`` when the
   corpus is an incrementally-growing table.
3. **Decontamination** — n-gram overlap against a broadcast eval set.
4. **Mixture** — per-source temperature reweighting
   (``text.temperature_resample``: rates are a dim-sized broadcast,
   deterministic md5 keep/drop), content-hash split assignment
   (``text.split_assign``), reproducible per-epoch shard order
   (``text.epoch_order``: hash-uniform shard key, skew-free).
5. **Packing** — greedy sequence packing into ``seq_len``-token bins
   per (split, shard) (``text.pack_sequences`` with a partition
   column, so no single-partition funnel exists).

Scale shape: the corpus crosses the wire only where an operator needs
a key (content hash, n-gram, shard); every small side broadcasts, and
each stage returns a plain DataFrame you can localCheckpoint or
publish through ``GriddedTable`` for restartability.

Run ``build_training_set(spark, docs)`` on any frame with
``(doc_id, text, source)`` columns — tests/test_examples.py drives it
against the synthetic documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gridded_etl_tools_spark.operators import dedup, text


def quality_gate(
    docs: DataFrame,
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.9,
    max_punct_ratio: float = 0.4,
) -> DataFrame:
    """Stage 1: drop low-quality documents with pure column math."""
    return (
        docs.withColumn("__tokens", text.token_count(F.col("text")))
        .withColumn("__stop", text.stopword_ratio(F.col("text")))
        .withColumn("__punct", text.punct_ratio(F.col("text")))
        .filter(
            (F.col("__tokens") >= min_tokens)
            & (F.col("__stop") <= max_stopword_ratio)
            & (F.col("__punct") <= max_punct_ratio)
        )
        .drop("__tokens", "__stop", "__punct")
    )


def dedup_stage(docs: DataFrame) -> DataFrame:
    """Stage 2: exact dedup on the content key (hash agg — first doc_id
    per content wins, deterministic)."""
    return dedup.exact_dedup(docs, ["text"], "doc_id")


def decontaminate(
    docs: DataFrame, eval_texts: DataFrame, n: int = 3, max_overlap: int = 2
) -> DataFrame:
    """Stage 3: drop documents sharing more than ``max_overlap``
    distinct ``n``-grams with the (broadcast) eval set — eval sets are
    tiny next to the corpus by definition."""
    doc_grams = docs.select(
        "doc_id", F.explode(dedup.shingles(F.col("text"), n)).alias("g")
    ).distinct()
    eval_grams = eval_texts.select(
        F.explode(dedup.shingles(F.col("text"), n)).alias("g")
    ).distinct()
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__overlap"))
        .filter(F.col("__overlap") > max_overlap)
    )
    return docs.join(hits, "doc_id", "left_anti")


def mix_and_order(
    docs: DataFrame,
    alpha: float = 0.7,
    val_percent: int = 5,
    epoch: int = 0,
    n_shards: int = 64,
) -> DataFrame:
    """Stage 4: temperature-resample sources (keep rate ∝ n^alpha / n),
    split train/val by content hash, assign the epoch's (shard, pos)."""
    kept = text.temperature_resample(
        docs, group_col="source", alpha=alpha, id_col="doc_id"
    )
    split = kept.withColumn(
        "split",
        text.split_assign(
            F.col("doc_id"), {"train": 100 - val_percent, "val": val_percent}
        ),
    )
    return text.epoch_order(split, epoch=epoch, id_col="doc_id", n_shards=n_shards)


def build_training_set(
    spark,
    docs: DataFrame,
    eval_texts: DataFrame | None = None,
    seq_len: int = 512,
    n_shards: int = 64,
    epoch: int = 0,
) -> DataFrame:
    """The full pipeline; returns one row per surviving document with
    ``(split, shard, pos, bin, n_tokens, start_offset)`` — write it
    ``partitionBy("split", "shard")`` and the trainer reads shards in
    order, sequences cut at ``seq_len`` tokens."""
    staged = quality_gate(docs)
    staged = dedup_stage(staged)
    if eval_texts is not None:
        staged = decontaminate(staged, eval_texts)
    ordered = mix_and_order(staged, epoch=epoch, n_shards=n_shards)
    return text.pack_sequences(
        ordered,
        order_col="pos",
        seq_len=seq_len,
        partition_col=F.struct("split", "shard"),
    )
