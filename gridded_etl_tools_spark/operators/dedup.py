"""Deduplication family (SURVEY §2.3 Q22 + north-star additions).

The reference has no dedup (times were handled as Python sets,
``utils/publish.py:395-400``); these are the training-data-pipeline
operators the north star adds, designed to scale:

* exact dedup        — hash-groupBy; one shuffle on the content hash.
* MinHash + LSH      — shingle → k minhashes → b bands → band-bucket
  self-join.  The self-join is an equi-join on (band_id, band_hash), so
  candidate generation never compares all pairs; at 100 TB the bucket join
  shuffles only signature rows (doc_id + hash), not document text.
* SimHash            — 32-bit sign-aggregated token hashes; near-dups share
  the same simhash (or a close one — Hamming check on candidates).
* n-gram Jaccard     — exact verification of candidate pairs.

Determinism: all hashing is ``md5``-derived (content-defined, identical in
DuckDB for the oracle) — never partition- or time-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep one row (lowest ``id_col``) per distinct content tuple.
    Deterministic replacement for ``dropDuplicates`` (which keeps an
    arbitrary row).  One shuffle on the content columns; at scale group on
    ``md5(content)`` so wide text never becomes the shuffle key."""
    w = Window.partitionBy(
        *[F.md5(F.col(c).cast("string")).alias(f"__h_{c}") for c in content_cols]
    ).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_groups(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Content groups with multiplicity > 1: (content hash, n_dups,
    keeper id) — the audit view of exact dedup."""
    h = F.md5(F.concat_ws("", *[F.col(c).cast("string") for c in content_cols]))
    return (
        df.groupBy(h.alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") > 1)
    )


def shingles(text_col, n: int = 3):
    """Word n-gram shingle array from a text column (lowercased,
    whitespace-tokenized).  Column expression — JVM-side only.

    n=1 is just the distinct token set.  n>1 builds the windows by
    iterated ``zip_with`` against shifted copies (array-at-a-time) rather
    than a per-position ``slice`` inside ``transform`` — higher-order
    lambdas are interpreted, so per-element array slicing was the single
    hottest expression in the dedup family (~7x slower).  Docs shorter
    than n tokens yield one truncated shingle (the whole document)."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    if n == 1:
        return F.array_distinct(toks)
    sh = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    sh = F.filter(sh, lambda s: s.isNotNull())  # windows that ran off the end
    return F.array_distinct(
        F.when(F.size(toks) >= n, sh).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def _salted_hashes(num_hashes: int):
    """Per-shingle array of ``num_hashes`` salted md5 hex digests for the
    exploded shingle column ``s``."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.md5(F.concat(i.cast("string"), F.lit("|"), F.col("s"))),
    )


def _minhash_wide(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int, shingle_n: int
) -> DataFrame:
    """One row per id with columns ``mh_0..mh_{n-1}``: explode shingles,
    compute all salted hashes per shingle in one pass, take element-wise
    ``min`` per id.  One narrow shuffle of (id, hash-array) rows; the
    shingle expression is evaluated exactly once (higher-order lambdas
    are interpreted, and Catalyst's project-collapsing re-inlines any
    'materialized' column back into per-element lambdas — the explode is
    the only real evaluation barrier, measured 4x faster for n>1)."""
    ex = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_n)).alias("s")
    ).select(id_col, _salted_hashes(num_hashes).alias("hs"))
    return ex.groupBy(id_col).agg(
        *[F.min(F.col("hs")[i]).alias(f"mh_{i}") for i in range(num_hashes)]
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """(id, hash_idx, minhash): for each of ``num_hashes`` salted md5 hash
    functions, the lexicographic min over the document's shingles.
    md5-of-(salt ‖ shingle) is reproducible in any engine — the
    correctness oracle depends on it.

    Two physical shapes by shingle cost:

    * n=1 (token shingles are nearly free to recompute): map-only —
      per-row ``array_min(transform(...))``, zero shuffle before any
      downstream join.
    * n>1: explode + element-wise-min aggregation (:func:`_minhash_wide`)
      — one narrow shuffle, shingles computed once.
    """
    if shingle_n == 1:
        sh = shingles(F.col(text_col), 1)
        sigs = F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.struct(
                i.alias("hash_idx"),
                F.array_min(
                    F.transform(
                        sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit("|"), s))
                    )
                ).alias("minhash"),
            ),
        )
        return (
            df.select(F.col(id_col), F.explode(sigs).alias("s"))
            .select(
                id_col,
                F.col("s.hash_idx").alias("hash_idx"),
                F.col("s.minhash").alias("minhash"),
            )
            .filter(F.col("minhash").isNotNull())
        )
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_n)
    pairs = F.array(
        *[
            F.struct(F.lit(i).cast("int").alias("hash_idx"), F.col(f"mh_{i}").alias("minhash"))
            for i in range(num_hashes)
        ]
    )
    return (
        wide.select(F.col(id_col), F.explode(pairs).alias("s"))
        .select(
            id_col,
            F.col("s.hash_idx").alias("hash_idx"),
            F.col("s.minhash").alias("minhash"),
        )
        .filter(F.col("minhash").isNotNull())
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that collide in at
    least one LSH band.  rows_per_band = num_hashes / bands sets the
    similarity threshold ~ (1/bands)^(1/rows_per_band)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide into bands evenly")
    rows_per_band = num_hashes // bands
    # signature vector per id (shape chosen by shingle cost — see
    # minhash_signatures), then one band hash per contiguous slice; the
    # band join shuffles only (id, band, band_hash) rows, never text.
    if shingle_n == 1:
        # map-only: the full signature vector + band hashes in one
        # per-row expression (evaluated once per band — bands are few)
        sh = shingles(F.col(text_col), 1)
        minh = F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(
                F.transform(
                    sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit("|"), s))
                )
            ),
        )
        band_structs = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.cast("int").alias("band"),
                F.md5(
                    F.concat_ws("|", F.slice(minh, b * rows_per_band + 1, rows_per_band))
                ).alias("band_hash"),
            ),
        )
        source = df
    else:
        wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_n)
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).cast("int").alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"mh_{b * rows_per_band + j}")
                                for j in range(rows_per_band)
                            ],
                        )
                    ).alias("band_hash"),
                )
                for b in range(bands)
            ]
        )
        source = wide
    band_hash = (
        source.select(F.col(id_col), F.explode(band_structs).alias("bb"))
        .select(id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))
    )
    a = band_hash.select(
        F.col(id_col).alias("id_a"), "band", "band_hash"
    )
    b = band_hash.select(
        F.col(id_col).alias("id_b"), "band", "band_hash"
    )
    return (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity of shingle sets for given (id_a, id_b)
    candidate pairs — the verification stage after LSH.  Joins each side's
    shingle array in, computes |∩| / |∪| with array intrinsics."""
    sh = df.select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    out = (
        pairs.join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), on="id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), on="id_b")
    )
    # |a ∪ b| = |a| + |b| - |a ∩ b| — shingle arrays are distinct sets, so
    # one intersect pass suffices (no union array materialized)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return out.select(
        "id_a",
        "id_b",
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """32-bit SimHash per document: hash each distinct token to a 32-bit
    int (first 8 hex chars of md5), sum ±1 per bit over tokens, take sign.
    Near-duplicate docs land on equal or low-Hamming-distance fingerprints.

    Plan: explode (token × bit) — fine because tokens-per-doc × 32 rows
    per doc is bounded; at scale run per-partition via the same expression
    (stays in codegen, no Python).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        ).alias("token"),
    )
    th = toks.withColumn(
        "token_hash", F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    tb = th.select(id_col, "token_hash", bit).withColumn(
        "bit_val",
        F.when(F.expr("(token_hash % CAST(pow(2, bit + 1) AS BIGINT)) >= CAST(pow(2, bit) AS BIGINT)"), 1).otherwise(-1),
    )
    return (
        tb.groupBy(id_col, "bit")
        .agg(F.sum("bit_val").alias("s"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("CAST(pow(2, bit) AS BIGINT)")).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )
