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


def keep_best(
    df: DataFrame,
    content_cols: list[str],
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Quality-ranked canonical selection: keep the HIGHEST-``score_col``
    row per distinct content tuple (tie: lowest ``id_col``) — the
    curation policy next to :func:`exact_dedup`'s keep-first.  Keep-first
    is the right default for stable ids; keep-best is what corpus
    curation wants when duplicates differ in extraction quality (the
    cleanest crawl of a page survives, not the earliest).  Same shape:
    one shuffle on the hashed content key.  Round ``score_col`` before
    calling if it is float-derived, so ranking is engine-stable."""
    w = Window.partitionBy(
        *[F.md5(F.col(c).cast("string")).alias(f"__h_{c}") for c in content_cols]
    ).orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_groups(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Content groups with multiplicity > 1: (content hash, n_dups,
    keeper id) — the audit view of exact dedup.

    The hash is collision-safe across column boundaries: columns are
    joined with a \\x01 separator and NULL is marked \\x00, so
    ('ab','c') vs ('a','bc') and ('a',NULL) vs ('a','') stay distinct —
    matching the per-column hashing semantics of :func:`exact_dedup`."""
    h = F.md5(
        F.concat_ws(
            "\x01",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in content_cols],
        )
    )
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


#: modulus for the universal hash family — Mersenne prime 2^31-1
MINHASH_P = 2147483647


def minhash_constants(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) multiplier/offset pairs for the universal
    hash family ``h_i(x) = (a_i*x + b_i) mod MINHASH_P``.  ``a_i`` is kept
    under 2^20 so ``a_i * base`` (base is 40 bits) stays below 2^60 —
    no 64-bit overflow in either Spark or the DuckDB oracle."""
    out = []
    for i in range(num_hashes):
        a = (1_000_003 * (i + 1)) % 1_048_573 | 1
        b = (7_919 * i + 12_345) % MINHASH_P
        out.append((a, b))
    return out


def base_shingle_hash(col):
    """40-bit integer base hash of a shingle: first 10 hex chars of md5,
    parsed base-16.  Engine-portable: DuckDB reproduces it as
    ``try_cast(concat('0x', substr(md5(s),1,10)) AS BIGINT)``.  One md5
    per shingle — the k minhash functions derive arithmetically from this
    single digest instead of re-hashing the text k times (~2x end-to-end
    on the LSH pipeline)."""
    return F.conv(F.substring(F.md5(col), 1, 10), 16, 10).cast("long")


def _derived(i: int, base):
    """i-th universal hash of a base-hash column (NOT monotonic in the
    base — the ``mod p`` is what de-correlates the k functions; without it
    every function would share one argmin shingle and the MinHash
    signature would collapse to a single effective hash)."""
    a, b = minhash_constants(i + 1)[i]
    return (base * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)


def _minhash_struct(text_col, num_hashes: int):
    """Map-only MinHash signature as a single expression: one fold
    (``F.aggregate``) over the unigram base-hash array with a
    ``num_hashes``-field struct accumulator.  The base md5 is computed
    exactly once per token (it lives in the ``transform`` argument of the
    fold — one expression tree, no projected column for Catalyst's
    CollapseProject to re-inline k times).  Returns a struct with fields
    ``m0..m{k-1}``.  The MINHASH_P init value is an unreachable sentinel:
    ``split`` never yields an empty array, so every doc has ≥1 shingle and
    every field ends strictly below MINHASH_P."""
    base_arr = F.transform(shingles(text_col, 1), lambda s: base_shingle_hash(s))
    consts = minhash_constants(num_hashes)
    init = F.struct(
        *[F.lit(MINHASH_P).cast("long").alias(f"m{i}") for i in range(num_hashes)]
    )
    return F.aggregate(
        base_arr,
        init,
        lambda acc, t: F.struct(
            *[
                F.least(
                    acc[f"m{i}"],
                    (t * F.lit(consts[i][0]) + F.lit(consts[i][1])) % F.lit(MINHASH_P),
                ).alias(f"m{i}")
                for i in range(num_hashes)
            ]
        ),
    )


def _minhash_wide(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int, shingle_n: int
) -> DataFrame:
    """One row per id with columns ``mh_0..mh_{n-1}``: explode shingles,
    one md5 → 40-bit base hash per shingle, k statically-unrolled derived
    hashes (whole-stage codegen — no interpreted higher-order lambda in
    the hot loop), element-wise ``min`` per id.  One narrow shuffle of
    (id, k longs) after map-side partial aggregation; the shingle
    expression is evaluated exactly once (Catalyst re-inlines
    'materialized' columns into lambdas, so the explode is the only real
    evaluation barrier)."""
    ex = (
        df.select(
            F.col(id_col), F.explode(shingles(F.col(text_col), shingle_n)).alias("s")
        )
        .select(id_col, base_shingle_hash(F.col("s")).alias("h"))
        .select(
            id_col,
            *[_derived(i, F.col("h")).alias(f"h_{i}") for i in range(num_hashes)],
        )
    )
    return ex.groupBy(id_col).agg(
        *[F.min(f"h_{i}").alias(f"mh_{i}") for i in range(num_hashes)]
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """(id, hash_idx, minhash): for each of ``num_hashes`` universal hash
    functions over the 40-bit base shingle hash, the min over the
    document's shingles.  md5-derived base + fixed (a, b) constants are
    reproducible in any engine — the correctness oracle depends on it.

    Two physical shapes by shingle cost:

    * n=1 (token shingles are nearly free to recompute): map-only —
      base-hash array once, then per-function ``array_min(transform(...))``;
      zero shuffle before any downstream join.
    * n>1: explode + element-wise-min aggregation (:func:`_minhash_wide`)
      — one narrow shuffle of (id, k longs), shingles computed once.
    """
    if shingle_n == 1:
        sigs = F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("hash_idx"),
                    F.col("__mins")[f"m{i}"].alias("minhash"),
                )
                for i in range(num_hashes)
            ]
        )
        return (
            df.select(
                F.col(id_col),
                _minhash_struct(F.col(text_col), num_hashes).alias("__mins"),
            )
            .select(F.col(id_col), F.explode(sigs).alias("s"))
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


def lsh_band_hashes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, band_hash): each document's LSH band fingerprints —
    the signature stage of :func:`minhash_lsh_candidates`, exposed so
    the band table can be PERSISTED (:class:`LshIndex`) instead of
    recomputed per dedup run.  Map-side for unigram shingles; one
    narrow (id, k longs) shuffle otherwise."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide into bands evenly")
    rows_per_band = num_hashes // bands
    # signature vector per id (shape chosen by shingle cost — see
    # minhash_signatures), then one band hash per contiguous slice; the
    # band join shuffles only (id, band, band_hash) rows, never text.
    if shingle_n == 1:
        # map-only: fold the signature struct once per row, band-hash its
        # fields; the struct sits behind a Generate (explode) boundary so
        # CollapseProject cannot re-inline the fold per band
        mins = _minhash_struct(F.col(text_col), num_hashes)
        source = df.select(F.col(id_col), mins.alias("__mins"))
        sig_col = lambda j: F.col("__mins")[f"m{j}"].cast("string")  # noqa: E731
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).cast("int").alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[sig_col(b * rows_per_band + j) for j in range(rows_per_band)],
                        )
                    ).alias("band_hash"),
                )
                for b in range(bands)
            ]
        )
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
                                F.col(f"mh_{b * rows_per_band + j}").cast("string")
                                for j in range(rows_per_band)
                            ],
                        )
                    ).alias("band_hash"),
                )
                for b in range(bands)
            ]
        )
        source = wide
    return (
        source.select(F.col(id_col), F.explode(band_structs).alias("bb"))
        .select(id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))
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
    similarity threshold ~ (1/bands)^(1/rows_per_band).

    The band table is materialized ONCE (``localCheckpoint``) before the
    self-join: without the barrier Catalyst plans the signature pipeline
    (shingle explode -> md5 per shingle -> k hash mins -> band md5) as
    two identical subtrees, one per join side, so every document is
    shingled and hashed twice (r14, guide §1.2 — don't compute things
    twice; verified in the executed plan).  The join is left un-hinted:
    the checkpointed side's stats are unknown, so the planner starts
    from the always-safe shuffle join and AQE demotes it to a broadcast
    hash join at runtime when the band table is actually small — never
    a forced corpus-sized broadcast at scale."""
    band_hash = lsh_band_hashes(
        df, text_col, id_col, num_hashes, bands, shingle_n
    ).localCheckpoint(eager=True)
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


class LshIndex:
    """On-disk LSH band index: the corpus's MinHash band fingerprints
    are computed ONCE at build time and persisted as parquet
    partitioned by ``band`` — the dedup twin of :class:`~gridded_etl_tools_spark.operators.similarity.IvfIndex`'s
    assign-once/query-many shape.  Incremental near-dup then runs as
    "new batch vs index": only the NEW documents are shingled and
    hashed; the corpus contributes its persisted (id, band, band_hash)
    rows to the equi-join.  At 100 TB this is the daily-crawl dedup
    mode — re-shingling the whole corpus per batch is the cost this
    index exists to delete.  A new batch can be appended to the index
    after its own dedup (same partitioned layout, append mode).

    Layout under ``root``::

        bands/band=<b>/...parquet   # id, band_hash
        _lsh_meta.json              # text/id cols + hash config
    """

    _META = "_lsh_meta.json"

    def __init__(self, root: str):
        self.root = root

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        root: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_hashes: int = 16,
        bands: int = 4,
        shingle_n: int = 3,
    ) -> "LshIndex":
        import json
        import os

        bh = lsh_band_hashes(
            corpus, text_col, id_col, num_hashes, bands, shingle_n
        )
        # one writer task per band partition (see IvfIndex.build)
        bh.repartition("band").write.mode("overwrite").partitionBy(
            "band"
        ).parquet(os.path.join(root, "bands"))
        with open(os.path.join(root, cls._META), "w") as f:
            json.dump(
                {
                    "text_col": text_col,
                    "id_col": id_col,
                    "num_hashes": num_hashes,
                    "bands": bands,
                    "shingle_n": shingle_n,
                },
                f,
            )
        return cls(root)

    def _meta(self) -> dict:
        import json
        import os

        with open(os.path.join(self.root, self._META)) as f:
            return json.load(f)

    def candidates(self, spark, new_docs: DataFrame) -> DataFrame:
        """(new_id, corpus_id) pairs colliding in >=1 band: only
        ``new_docs`` pays the shingle/hash cost; the corpus side is the
        persisted band table.  Pairs where the same id appears on both
        sides (a re-submitted document) are excluded."""
        import os

        m = self._meta()
        bh_new = lsh_band_hashes(
            new_docs, m["text_col"], m["id_col"],
            m["num_hashes"], m["bands"], m["shingle_n"],
        ).select(
            F.col(m["id_col"]).alias("new_id"), "band", "band_hash"
        )
        corpus = spark.read.parquet(os.path.join(self.root, "bands")).select(
            F.col(m["id_col"]).alias("corpus_id"), "band", "band_hash"
        )
        return (
            bh_new.join(corpus, on=["band", "band_hash"])
            .filter(F.col("new_id") != F.col("corpus_id"))
            .select("new_id", "corpus_id")
            .distinct()
        )

    def append(self, new_docs: DataFrame, skip_existing: bool = True) -> None:
        """Add a (deduplicated) batch's fingerprints to the index.

        ``skip_existing`` (default True) guards re-submission: batch ids
        already present in the index are anti-joined away before any
        shingling — appending a known id would duplicate its band rows
        (index bloat) while the ``new_id != corpus_id`` filter in
        :meth:`candidates` makes the re-submitted doc silently match
        nothing new.  The probe reads ONE band partition, ids only:
        every doc has exactly one row per band, so band 0 carries the
        complete id set at 1/bands of the index bytes (column-pruned to
        the id).  Pass ``False`` only when the pipeline guarantees novel
        ids (e.g. monotone batch id allocation) to skip that read."""
        import os

        m = self._meta()
        if skip_existing:
            existing = (
                new_docs.sparkSession.read.parquet(
                    os.path.join(self.root, "bands")
                )
                .filter(F.col("band") == 0)   # partition-pruned id probe
                .select(m["id_col"])
                .distinct()
            )
            new_docs = new_docs.join(existing, m["id_col"], "left_anti")
        bh = lsh_band_hashes(
            new_docs, m["text_col"], m["id_col"],
            m["num_hashes"], m["bands"], m["shingle_n"],
        )
        bh.repartition("band").write.mode("append").partitionBy(
            "band"
        ).parquet(os.path.join(self.root, "bands"))


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over candidate near-duplicate pairs:
    (id, cluster_id) where cluster_id = min doc id reachable through the
    pair graph.  The canonical "keep one doc per near-dup cluster" step
    after LSH + verification.

    Physical strategy: iterative min-label propagation — each round joins
    labels to the (symmetrized, cached) edge list, takes the min neighbor
    label per node, and stops when the label-sum fixpoint is reached
    (labels only ever decrease, so an unchanged sum IS convergence — one
    scalar action per round, no change-join).  Rounds needed =
    graph diameter; near-dup components are clique-ish (diameter ≤ ~3),
    so this beats the alternating large-star/small-star scheme (Kiveris
    et al.) in practice while shuffling only (node, label) longs.  Each
    round is localCheckpoint-ed to truncate lineage — without it the plan
    doubles per iteration.
    """
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist()
    labels = (
        edges.select("u")
        .distinct()
        .select(F.col("u").alias("id"), F.col("u").alias("label"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.select(F.col("id").alias("v"), F.col("label").alias("vlabel")),
                on="v",
            )
            .groupBy("u")
            .agg(F.min("vlabel").alias("nmin"))
        )
        labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["u"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


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


def _bloom_geometry(n: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for n items at the target false-positive rate
    (standard formulas: m = -n ln p / ln^2 2, k = m/n ln 2)."""
    import math

    m = max(64, int(-n * math.log(fpp) / (math.log(2.0) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2.0)))
    return m, k


def _bloom_positions(key_col: str, m: int, k: int):
    """k bit positions per key via Kirsch-Mitzenmacher double hashing:
    pos_i = (h1 + i*h2) mod m with two independent xxhash64 streams —
    all JVM expressions."""
    # reduce both streams mod m BEFORE combining: i*h2 on raw xxhash64
    # output overflows long under ANSI arithmetic
    h1 = F.pmod(F.xxhash64(F.col(key_col)), F.lit(m))
    h2 = F.pmod(F.xxhash64(F.lit("bloom2"), F.col(key_col)), F.lit(m))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]


def bloom_filter_words(
    corpus: DataFrame, key_col: str, n_items: int, fpp: float = 0.01
) -> DataFrame:
    """Distributed Bloom-filter build with no driver bitmap: every key
    contributes k (word_index, bit) pairs, ``bit_or`` folds them into
    64-bit words — a (m/64)-row frame that broadcasts like a dim table.
    Map-side combine makes the shuffle carry at most m/64 rows per task.
    """
    m, k = _bloom_geometry(n_items, fpp)
    pos = F.explode(F.array(*_bloom_positions(key_col, m, k))).alias("__p")
    words = (
        corpus.select(pos)
        .select(
            (F.col("__p") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pmod(__p, 64) as int))").alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("bits"))
    )
    return words


def bloom_incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    key_col: str,
    n_items: int,
    fpp: float = 0.01,
    exact: bool = True,
) -> DataFrame:
    """Incremental-ingest dedup against a published corpus via a
    broadcast Bloom filter, optionally made exact with a second keyed
    verify phase.

    Scale rationale: an exact anti-join shuffles the 100 TB corpus every
    ingest tick.  Here the corpus compresses once into Bloom words
    (:func:`bloom_filter_words`) that broadcast like a dim table; each
    new doc probes its k positions through that broadcast join —
    constant fan-out on the SMALL batch, zero corpus shuffle.  Bloom
    misses are DEFINITELY new (no false negatives); Bloom hits are
    candidate duplicates (~fpp of them wrongly).  With ``exact=True``
    only that small candidate set pays an exact semi-check against the
    corpus, so the result is exactly the anti-join's — the two-phase
    shape production dedup uses.

    Returns the surviving (new, non-duplicate) rows of ``new_docs``.
    """
    m, k = _bloom_geometry(n_items, fpp)
    words = F.broadcast(bloom_filter_words(corpus, key_col, n_items, fpp))
    probes = new_docs.withColumn(
        "__pos", F.explode(F.array(*_bloom_positions(key_col, m, k)))
    ).withColumn("__word_idx", (F.col("__pos") / 64).cast("long"))
    hit = (
        F.col("bits").isNotNull()
        & (
            F.col("bits").bitwiseAND(
                F.expr("shiftleft(1L, cast(pmod(__pos, 64) as int))")
            )
            != 0
        )
    )
    probed = (
        probes.join(words, on=(F.col("__word_idx") == F.col("word_idx")), how="left")
        .withColumn("__hit", hit.cast("int"))
        .groupBy(*new_docs.columns)
        .agg((F.sum("__hit") == F.lit(k)).alias("__maybe_dup"))
    )
    definitely_new = probed.filter(~F.col("__maybe_dup")).drop("__maybe_dup")
    if not exact:
        return definitely_new
    candidates = probed.filter(F.col("__maybe_dup")).drop("__maybe_dup")
    # exact verify on the candidate sliver only (true dups + ~fpp FPs)
    verified_new = candidates.join(
        corpus.select(F.col(key_col).alias("__ck")).distinct(),
        on=(F.col(key_col) == F.col("__ck")),
        how="left_anti",
    )
    return definitely_new.unionByName(verified_new)
