"""Training-data pipeline composites (north star): TF-IDF term ranking,
JSON property extraction, stratified per-group quotas, and the
end-to-end near-duplicate removal pipeline (LSH candidates → connected
components → canonical-survivor selection).

Same registration + reproducibility conventions as ``plans/catalog.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gridded_etl_tools_spark.operators import dedup as dedup_ops
from gridded_etl_tools_spark.operators import text as text_ops
from gridded_etl_tools_spark.plans.catalog import ORACLES, query
from gridded_etl_tools_spark.plans.tables import load


@query(
    "tfidf_top_terms",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, tf,
             round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS INT) AS rank
    FROM scored QUALIFY rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (north star text analysis).
    Shape: explode → two hash aggregates (doc-term TF, then term DF) →
    broadcast DF back onto TF → ranking window partitioned by doc.  The
    window ranks the *rounded* score with a term tie-break, so last-ulp
    ln() differences between JVM and C math libraries cannot reorder the
    cut.  At 100 TB the DF table is vocabulary-sized — still broadcastable
    after a min-df filter; the only big shuffle keys on doc_id."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(text_ops.tokens(F.col("text"))).alias("term")
    )
    # tf feeds both the DF rollup and the scoring join: materialize it so
    # the corpus is exploded once (the classic cache-the-tokenized-corpus
    # decision — tf is token-bounded, far smaller than re-reading text)
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=True)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


@query(
    "json_props_extract",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (SURVEY §2.6 scalar functions): pull a typed
    field out of the free-form ``props`` JSON column and aggregate it —
    `get_json_object` stays JVM-side inside codegen."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "stratified_quota",
    """
    SELECT lang, doc_id, n_chars, CAST(rn AS INT) AS rank
    FROM (SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM documents)
    WHERE rn <= 10
    """,
)
def stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified selection (north star sampling analog):
    top-10 longest documents per language stratum.  Rank-within-group is
    the reproducible stand-in for per-stratum random sampling (seeded
    `sampleBy` cannot hash-match a SQL oracle); one shuffle on the
    stratum key, and AQE handles stratum skew."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("lang", "doc_id", "n_chars", "rank")
    )


@query(
    "dedup_survivors",
    """
    WITH RECURSIVE cand AS (
      {LSH_CANDIDATES}
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM cand
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM cand
    ), walk(id, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT w.id, e.v FROM walk w JOIN edges e ON e.u = w.r
    ), clusters AS (
      SELECT id AS doc_id, min(r) AS cluster_id FROM walk GROUP BY id
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id
    """,
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-duplicate removal (north star): MinHash-LSH
    candidate pairs → connected-component clusters → keep one canonical
    document (min doc_id) per cluster, pass uninvolved documents through
    untouched.  This is the full production dedup pipeline as one plan:
    the corpus is scanned once for signatures, the quadratic work happens
    only inside LSH buckets, and the final anti-join keys on doc_id."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup_ops.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=8, bands=2, shingle_n=2
    )
    clusters = dedup_ops.duplicate_clusters(pairs)
    drop = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    return docs.join(F.broadcast(drop), "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


# splice the LSH-candidates oracle in (same mechanism as
# duplicate_clusters in catalog.py) so the two stay literally identical
ORACLES["dedup_survivors"] = ORACLES["dedup_survivors"].replace(
    "{LSH_CANDIDATES}", ORACLES["minhash_lsh_candidates"]
)


@query(
    "gopher_repetition_flags",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    base AS (
      SELECT doc_id, len(t) AS n_tokens,
             round(CAST(len(list_distinct(t)) AS DOUBLE)
                   / greatest(len(t), 1), 6) AS distinct_ratio
      FROM toks
    ),
    tc AS (
      SELECT doc_id, term, count(*) AS n
      FROM toks, UNNEST(t) AS u(term)
      GROUP BY 1, 2
    ),
    top AS (
      SELECT doc_id, round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_token_ratio
      FROM tc GROUP BY 1
    )
    SELECT b.doc_id, b.n_tokens, b.distinct_ratio, top_token_ratio,
           (b.distinct_ratio < 0.45 OR top_token_ratio > 0.10) AS flag_repetitive
    FROM base b JOIN top USING (doc_id)
    """,
)
def gopher_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter: distinct-token ratio and
    most-frequent-token coverage per document, with the reject flag a
    training-data pipeline would gate on.  Distinct ratio never leaves
    the projection (array intrinsics); top-token coverage is two hash
    aggregates keyed on doc_id."""
    docs = load(spark, sf_dir, "documents")
    prof = text_ops.repetition_profile(docs, "doc_id", "text")
    return prof.select(
        "doc_id", "n_tokens", "distinct_ratio", "top_token_ratio",
        (
            (F.col("distinct_ratio") < 0.45) | (F.col("top_token_ratio") > 0.10)
        ).alias("flag_repetitive"),
    )


@query(
    "ngram_overlap_pairs",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    hashes AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS h
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 7, 1))) AS u(i)
    ),
    -- boilerplate cap (Lee et al.): shingles appearing in > 50 docs are
    -- headers/licenses, not copied passages — and posting-list joins
    -- cost sum(len^2), so the cap is also the scale guarantee
    capped AS (
      SELECT doc_id, h FROM hashes
      QUALIFY count(*) OVER (PARTITION BY h) <= 50
    )
    SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS shared_shingles
    FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 5
    """,
)
def ngram_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate detection (the Lee et al. 'Deduplicating
    Training Data' shape): document pairs sharing >= 5 distinct 8-token
    shingle hashes — catches copied *passages* that whole-document
    MinHash misses.

    Physical shape: rolling md5 shingle hashes are computed in the
    projection (array intrinsics, no Python), deduped per doc, exploded
    to (hash, doc) and self-joined on hash — the classic inverted-index
    join whose cost is Σ posting-list², bounded by hash selectivity, not
    |docs|².  Shingles appearing in more than 50 documents are dropped
    before the join (the paper's boilerplate cap) — at 100 TB that cap
    is what bounds the hot posting lists the self-join would otherwise
    square."""
    docs = load(spark, sf_dir, "documents")
    hashes = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(text_ops.rolling_hash_fingerprints(F.col("text"), 8))
        ).alias("h"),
    )
    # boilerplate cap (mirrors the oracle QUALIFY): posting lists longer
    # than 50 docs are dropped before the self-join
    from pyspark.sql.window import Window as _W

    hashes = hashes.withColumn(
        "__df", F.count(F.lit(1)).over(_W.partitionBy("h"))
    ).filter(F.col("__df") <= 50).drop("__df")
    a, b = hashes.alias("a"), hashes.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= 5)
    )


@query(
    "pii_scrub",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text || CASE doc_id % 5
               WHEN 0 THEN ' contact user' || doc_id || '@example.com or admin@test.org'
               WHEN 1 THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               WHEN 2 THEN ' see https://example.com/page/' || doc_id || '?ref=x'
               ELSE '' END AS text
      FROM documents
    ),
    hits AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))                    AS n_phones,
             len(regexp_extract_all(text, 'https?://[^\s]+'))                                AS n_urls,
             sha256(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g')
             ) AS redacted_sha
      FROM aug
    )
    SELECT doc_id, CAST(n_emails AS INT) AS n_emails,
           CAST(n_phones AS INT) AS n_phones, CAST(n_urls AS INT) AS n_urls,
           redacted_sha
    FROM hits WHERE n_emails + n_phones + n_urls > 0
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (north star: corpora must scrub emails,
    phones, URLs before release).  The synthetic corpus carries no PII,
    so deterministic PII is appended per doc in BOTH engines and the
    real detector/redactor runs over it; the redacted text is
    hash-compared, so the exact replacement spans are value-checked.
    Map-only: regexp extraction and rewriting never shuffle."""
    docs = load(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or admin@test.org"),
                ),
            )
            .when(
                F.col("doc_id") % 5 == 1,
                F.concat(
                    F.lit(" call 415-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            )
            .when(
                F.col("doc_id") % 5 == 2,
                F.concat(
                    F.lit(" see https://example.com/page/"),
                    F.col("doc_id").cast("string"),
                    F.lit("?ref=x"),
                ),
            )
            .otherwise(F.lit("")),
        ),
    )
    hits = aug.select(
        "doc_id",
        text_ops.pii_counts(F.col("text")).alias("pii"),
        F.sha2(text_ops.pii_redact(F.col("text")).cast("binary"), 256).alias(
            "redacted_sha"
        ),
    ).select(
        "doc_id",
        F.col("pii.n_emails").alias("n_emails"),
        F.col("pii.n_phones").alias("n_phones"),
        F.col("pii.n_urls").alias("n_urls"),
        "redacted_sha",
    )
    return hits.filter(
        F.col("n_emails") + F.col("n_phones") + F.col("n_urls") > 0
    )


@query(
    "sequence_packing",
    r"""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT doc_id, n_tokens,
             COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
      FROM t
    )
    SELECT CAST(start_offset // 512 AS BIGINT) AS bin,
           count(*)                            AS n_docs,
           min(doc_id)                         AS first_doc,
           max(doc_id)                         AS last_doc,
           CAST(sum(n_tokens) AS BIGINT)       AS bin_tokens
    FROM o
    GROUP BY 1
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (north star: training pipelines concatenate docs
    and cut fixed-length sequences to avoid padding waste): greedy
    sequential packing into 512-token bins, rolled up per bin.  Packing
    is inherently sequential, so production partitions by shard
    (pack_sequences(partition_col=...)); the catalog run packs one
    global sequence over the dimension-scale documents table."""
    docs = load(spark, sf_dir, "documents")
    packed = text_ops.pack_sequences(docs, seq_len=512)
    return packed.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


@query(
    "decontamination_flags",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    hashes AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS h
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 7, 1))) AS u(i)
    ),
    eval_h AS (SELECT DISTINCT h FROM hashes WHERE doc_id % 10 = 5),
    train  AS (SELECT doc_id, h FROM hashes WHERE doc_id % 10 <> 5)
    SELECT t.doc_id, count(*) AS n_shared_shingles
    FROM train t JOIN eval_h e USING (h)
    GROUP BY 1
    """,
)
def decontamination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (north star; the 8-gram-overlap
    train-vs-eval screen every release pipeline runs): training docs
    sharing ANY 8-token shingle with the held-out eval slice (doc_id
    ending in 5, a tenth of the corpus) are flagged with their shared-shingle count.

    Physical shape: both sides reuse the rolling-hash shingle
    projection; the eval side collapses to a distinct-hash set that is
    BROADCAST (eval suites are tiny by construction), so the screen is
    one map-side semi-join-shaped probe over the train shingles — no
    all-pairs, no shuffle of the training corpus beyond the final
    per-doc count."""
    docs = load(spark, sf_dir, "documents")
    hashes = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(text_ops.rolling_hash_fingerprints(F.col("text"), 8))
        ).alias("h"),
    )
    eval_h = (
        hashes.filter(F.col("doc_id") % 10 == 5).select("h").distinct()
    )
    train = hashes.filter(F.col("doc_id") % 10 != 5)
    return (
        train.join(F.broadcast(eval_h), on="h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


@query(
    "sequence_packing_sharded",
    r"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
      FROM t
    )
    SELECT source, CAST(start_offset // 512 AS BIGINT) AS bin,
           count(*)                      AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM o
    GROUP BY 1, 2
    """,
)
def sequence_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path of sequence packing: each source shard packs
    independently inside its own window partition (pack_sequences
    partition_col), so the cumulative sum parallelizes across shards and
    no single global sequence exists — bins are (shard, bin).  This is
    the form a 100 TB packing job runs; the global-sequence variant
    (``sequence_packing``) documents the single-partition bound."""
    docs = load(spark, sf_dir, "documents")
    packed = text_ops.pack_sequences(
        docs, seq_len=512, partition_col=F.col("source")
    )
    return packed.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


@query(
    "dataset_split_counts",
    """
    WITH assigned AS (
      SELECT doc_id, source,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           source,
           count(*)     AS n_docs,
           min(doc_id)  AS first_doc
    FROM assigned
    GROUP BY 1, 2
    """,
)
def dataset_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by content-hash bucket
    (operators/text.py::split_assign): assignment is a pure function of
    the document id, so it survives re-shards, re-runs, and engine
    changes — the guard against eval leakage when a corpus is rebuilt.
    Map-side assignment + one rollup shuffle."""
    docs = load(spark, sf_dir, "documents")
    assigned = docs.withColumn(
        "split",
        text_ops.split_assign(
            F.col("doc_id"), {"train": 90, "val": 5, "test": 5}
        ),
    )
    return assigned.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )


@query(
    "corpus_prep_end_to_end",
    r"""
    WITH toks AS (
      SELECT doc_id, text, source, n_chars,
             string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents),
    quality AS (
      SELECT doc_id, text, source, n_chars,
             len(t) AS n_tokens
      FROM toks
      WHERE n_chars >= 50
        AND CAST(len(list_distinct(t)) AS DOUBLE)
            / greatest(len(t), 1) >= 0.3),
    dedup AS (
      SELECT * FROM quality
      QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1),
    assigned AS (
      SELECT *,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) % 100 AS bucket
      FROM dedup)
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS first_doc
    FROM assigned GROUP BY 1
    """,
)
def corpus_prep_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data prep pipeline as ONE declarative plan —
    quality gate (length + distinct-token ratio) → exact dedup (first
    id per content) → deterministic hash split → per-split shard stats
    — composed from the same operators the standalone rows exercise
    (`text.distinct_token_ratio`, `dedup.exact_dedup` semantics,
    `text.split_assign`), so Catalyst fuses the stages into a single
    job: the quality filter runs inside the scan projection, the dedup
    is the lone content-keyed shuffle, the split is map-side, and the
    rollup leaves three rows.  The oracle replays every stage."""
    docs = text_ops.staged_tokens(load(spark, sf_dir, "documents"))
    t = F.col("__toks")
    # the staged array is dropped before the content-keyed dedup window:
    # only (doc cols + n_tokens) may cross that exchange (guide §2.3)
    quality = docs.filter(
        (F.col("n_chars") >= 50)
        & (text_ops.distinct_token_ratio(F.col("text"), toks=t) >= 0.3)
    ).withColumn("n_tokens", F.size(t)).drop("__toks")
    w = Window.partitionBy("text").orderBy("doc_id")
    dedup = (
        quality.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    assigned = dedup.withColumn(
        "split",
        text_ops.split_assign(
            F.col("doc_id"), {"train": 90, "val": 5, "test": 5}
        ),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


@query(
    "bpe_pair_counts",
    r"""
    WITH t AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS tk
      FROM documents),
    pairs AS (
      SELECT tk[i] || ' ' || tk[i + 1] AS pair
      FROM t, UNNEST(generate_series(1, len(tk) - 1)) AS u(i)
      WHERE len(tk) >= 2)
    SELECT pair, count(*) AS n_pair
    FROM pairs
    GROUP BY pair
    ORDER BY n_pair DESC, pair
    LIMIT 50
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE tokenizer-training inner loop at corpus scale: frequency
    of every adjacent token pair, top-50 merge candidates (deterministic
    (count desc, pair) tie-break).  One explode + one hash agg; the
    top-k plans as TakeOrderedAndProject.  At 100 TB this is exactly the
    job that picks the next BPE merge — the pair axis is
    vocabulary-squared bounded and combiner-friendly, the corpus is
    touched once per merge round (production caches the token arrays
    between rounds)."""
    docs = load(spark, sf_dir, "documents")
    pairs = docs.select(
        F.explode(text_ops.adjacent_token_pairs(F.col("text"))).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .orderBy(F.col("n_pair").desc(), F.col("pair").asc())
        .limit(50)
    )


@query(
    "training_mix_end_to_end",
    r"""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    t AS (SELECT sum(pow(n, 0.5)) AS sw, sum(n) AS tn FROM c),
    r AS (SELECT source,
                 round(least(1.0, tn * pow(n, 0.5) / sw / n), 6) AS keep_rate
          FROM c CROSS JOIN t),
    kept AS (
      SELECT d.doc_id, d.source, d.n_chars, r.keep_rate
      FROM documents d JOIN r USING (source)
      WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                 AS UBIGINT) % 1000000
            < CAST(round(keep_rate * 1e6) AS BIGINT)),
    assigned AS (
      SELECT *,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) % 100 AS bucket,
             CAST(concat('0x', substr(md5(concat('1', ':',
                    CAST(doc_id AS VARCHAR))), 1, 15)) AS UBIGINT) AS hv
      FROM kept),
    ordered AS (
      SELECT source, n_chars, keep_rate,
             CASE WHEN bucket < 90 THEN 'train'
                  WHEN bucket < 95 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(hv % 8 AS BIGINT) AS shard,
             CAST(row_number() OVER (PARTITION BY hv % 8
                    ORDER BY hv ASC, doc_id ASC) AS INT) AS pos
      FROM assigned)
    SELECT source, split, shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           max(pos) AS max_pos,
           min(keep_rate) AS keep_rate
    FROM ordered GROUP BY 1, 2, 3
    """,
)
def training_mix_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole TRAINING-MIX assembly as ONE fused plan (r5 verdict
    item 8, the companion to ``corpus_prep_end_to_end``): temperature
    mixture flattening (keep rate ∝ n^0.5/n per source, deterministic
    md5 keep/drop) → stable hash train/val/test split → reproducible
    epoch-1 shard order — then a (source, split, shard) rollup so the
    oracle can hash every stage's joint effect.

    Scale shape: the resample is a dim-sized rate broadcast + map-side
    filter (corpus never shuffles for it), the split is pure column
    math, and the epoch order's ONE corpus exchange keys on the
    hash-uniform shard — skew-free by construction; the rollup reuses
    nothing fact-sized.  Composed from `text.temperature_resample`,
    `text.split_assign`, `text.epoch_order`."""
    docs = load(spark, sf_dir, "documents")
    kept = text_ops.temperature_resample(
        docs, group_col="source", alpha=0.5, id_col="doc_id"
    )
    assigned = kept.withColumn(
        "split",
        text_ops.split_assign(
            F.col("doc_id"), {"train": 90, "val": 5, "test": 5}
        ),
    )
    ordered = text_ops.epoch_order(assigned, epoch=1, n_shards=8)
    return ordered.groupBy("source", "split", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.max("pos").alias("max_pos"),
        F.min("keep_rate").alias("keep_rate"),
    )
