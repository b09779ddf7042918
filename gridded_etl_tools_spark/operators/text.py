"""Text-analysis operators for the training-data pipeline (north star):
token counting, quality scoring, language ID, fingerprinting.

All JVM-side expression compositions (split/regexp/md5/array intrinsics) —
no Python UDFs — so they run inside whole-stage codegen over the documents
scan and the only shuffle is whatever aggregation the caller adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: tiny per-language stopword marker sets for the n-gram/stopword
#: language-ID heuristic.  Deliberately small and fixed: the operator's
#: contract is deterministic scoring, not linguistic accuracy.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "ich", "zu"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "pas", "que", "pour"],
}


def tokens(text_col) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def staged_tokens(
    df: DataFrame, text_col: str = "text", toks_col: str = "__toks"
) -> DataFrame:
    """Materialize the token array ONCE in its own projection.

    Composite text scores reference ``tokens(text)`` many times (length,
    word-length, one stopword filter per language); Catalyst inlines the
    identical split subtree into every reference, so each row pays the
    regex tokenization N times.  Staging the array in a separate Project
    sticks because CollapseProject declines to re-inline non-cheap
    expressions referenced more than once — measured ~30% off the
    quality-score scan (r13).  Pass the staged column to the scorers'
    ``toks=`` parameter."""
    if toks_col in df.columns:
        # withColumn REPLACES a same-named input and callers drop the
        # staged column when done — refuse loudly instead of silently
        # eating a caller's column (same guard as interpolate_na /
        # quantile_map reserved staging names, ADVICE r13)
        raise ValueError(
            f"staged_tokens: staging column {toks_col!r} already exists "
            "in the input; pass a different toks_col"
        )
    return df.withColumn(toks_col, tokens(F.col(text_col)))


def token_count(text_col) -> Column:
    return F.size(tokens(text_col))


def adjacent_token_pairs(text_col) -> Column:
    """Array of adjacent token bigrams (``'left right'`` strings) — the
    substrate of the BPE-training inner loop: counting merge-candidate
    pair frequencies over a corpus.  Pure array intrinsics; documents
    with fewer than two tokens yield an empty array (``sequence(1, 0)``
    would generate a DESCENDING range, so the short case is guarded
    explicitly)."""
    t = tokens(text_col)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )
    return F.when(F.size(t) >= 2, pairs).otherwise(
        F.array().cast("array<string>")
    )


def bpe_ish_token_count(text_col) -> Column:
    """BPE-flavored proxy: count word pieces after splitting words longer
    than 6 chars in half — ~ how sub-word tokenizers inflate counts.
    ``ceil(len/6)`` pieces per word, computed with array intrinsics."""
    return F.aggregate(
        tokens(text_col),
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(6.0)).cast("int"),
    )


def stopword_ratio(text_col, lang: str = "en", toks=None) -> Column:
    # Measured note: folding all four language sets into one token→bitmask
    # map literal + single aggregate() fold is ~1.5× SLOWER than these
    # per-language filters (map literals are array-backed, so each
    # try_element_at linear-scans 40 entries, and the fold allocates a
    # struct per token).  Keep the array_contains shape.
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = tokens(text_col) if toks is None else toks
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(text_col) -> Column:
    no_punct = F.regexp_replace(text_col, r"[^\w\s]", "")
    return (F.length(text_col) - F.length(no_punct)).cast("double") / F.greatest(
        F.length(text_col), F.lit(1)
    ).cast("double")


def mean_word_length(text_col, toks=None) -> Column:
    toks = tokens(text_col) if toks is None else toks
    return F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text_col, toks=None) -> Column:
    """Composite [0, 1] quality heuristic: rewards mid-length documents,
    low punctuation noise, presence of stopwords (any language), sane mean
    word length.  Fixed weights; deterministic.

    ``toks``: pass a :func:`staged_tokens` column to tokenize each row
    ONCE instead of once per component score (r13; the score itself is
    bit-identical either way)."""
    toks = tokens(text_col) if toks is None else toks
    n_tok = F.size(toks).cast("double")
    length_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text_col) * 5, F.lit(1.0))
    mwl = mean_word_length(text_col, toks=toks)
    word_len_score = F.when((mwl >= 3.0) & (mwl <= 8.0), 1.0).otherwise(0.5)
    any_stop = F.greatest(
        *[stopword_ratio(text_col, lg, toks=toks) for lg in STOPWORDS]
    )
    stop_score = F.least(any_stop * 10, F.lit(1.0))
    return (
        length_score * 0.3 + punct_score * 0.3 + word_len_score * 0.2 + stop_score * 0.2
    )


def language_id(text_col, toks=None) -> Column:
    """Pick the language whose stopword ratio is highest; 'und' when all
    are zero.  Ties break by language code order (deterministic).
    ``toks`` as in :func:`quality_score`."""
    toks = tokens(text_col) if toks is None else toks
    scored = F.array(
        *[
            F.struct(
                stopword_ratio(text_col, lg, toks=toks).alias("score"),
                F.lit(lg).alias("lang"),
            )
            for lg in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text_col, toks=None) -> Column:
    """Normalization fingerprint: md5 of the sorted distinct token set —
    robust to word order and repetition (the classic 'fingerprint'
    clustering key).  ``toks``: pass a :func:`staged_tokens` column to
    tokenize each row once across composite scans (ADVICE r13: plans
    previously re-inlined this expression by hand, letting the two
    definitions drift)."""
    toks = tokens(text_col) if toks is None else toks
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


def rolling_hash_fingerprints(text_col, window: int = 4) -> Column:
    """Array of md5 hashes of each ``window``-token run — the winnowing /
    rolling-hash fingerprint family used for plagiarism-style overlap
    detection."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0)))
    return F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window))))


def polynomial_fingerprint(text_col, base: int = 31, mod: int = 2147483647) -> Column:
    """Order-sensitive document fingerprint: Rabin-Karp-style polynomial
    rolling hash over the token stream, ``acc = (acc*base + h(tok)) % mod``
    with ``h`` = first 7 hex chars of md5 (so every term < 2^28 and the
    accumulator never overflows a long).  Unlike :func:`fingerprint` this
    distinguishes word order — the exact-substring-shift detector."""
    toks = tokens(text_col)
    tok_hash = lambda w: F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * base + tok_hash(w)) % F.lit(mod).cast("long"),
    )


def distinct_token_ratio(text_col, toks=None) -> Column:
    """Distinct-token fraction — the Gopher-style repetition signal (a
    low ratio marks boilerplate/looping text).  Pure array intrinsics.
    ``toks`` as in :func:`quality_score`."""
    toks = tokens(text_col) if toks is None else toks
    return F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals (Gopher-style quality filters):
    token count, distinct-token ratio, and the coverage of the single
    most frequent token (fraction of all tokens it accounts for).

    Physical shape: distinct ratio stays in the projection (array
    intrinsics, no shuffle); top-token coverage explodes to (doc, term)
    and hash-aggregates twice — both shuffles key on ``id_col`` so AQE
    stacks them on one exchange.  All ratios are deterministic numbers;
    no tie-breaking needed."""
    t = F.col(text_col)
    base = df.select(
        id_col,
        token_count(t).alias("n_tokens"),
        F.round(distinct_token_ratio(t), 6).alias("distinct_ratio"),
    )
    term_counts = (
        df.select(id_col, F.explode(tokens(t)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = term_counts.groupBy(id_col).agg(
        F.round(F.max("n") / F.sum("n"), 6).alias("top_token_ratio")
    )
    return base.join(top, id_col)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full profile: token counts, ratios, quality, language,
    fingerprint.  One projection — single pass over the scan."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        mean_word_length(t).alias("mean_word_len"),
        quality_score(t).alias("quality"),
        language_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


# --- PII detection / redaction (north star; training corpora must scrub
# emails, phone numbers, and live URLs before release) -----------------------

#: conservative patterns valid in both Java regex (Spark) and RE2
#: (DuckDB oracle) — no lookarounds, no backreferences
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_URL = r"https?://[^\s]+"


def pii_counts(text_col) -> Column:
    """Struct of per-category PII hit counts — pure regexp_extract_all +
    size, map-side."""
    return F.struct(
        # idx=0 = whole match (the patterns are group-free)
        F.size(F.regexp_extract_all(text_col, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text_col, F.lit(PII_PHONE), 0)).alias("n_phones"),
        F.size(F.regexp_extract_all(text_col, F.lit(PII_URL), 0)).alias("n_urls"),
    )


def pii_redact(text_col) -> Column:
    """Replace every PII span with a typed placeholder token (the
    standard corpus-scrub transform).  Order matters: URLs first so an
    address inside a URL query string does not leave a dangling host."""
    out = F.regexp_replace(text_col, PII_URL, "<URL>")
    out = F.regexp_replace(out, PII_EMAIL, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


# --- sequence packing (north star; training pipelines pack documents into
# fixed-length sequences to avoid padding waste) ------------------------------


def pack_sequences(
    df: DataFrame,
    order_col: str = "doc_id",
    token_count_col: Column | None = None,
    text_col: str = "text",
    seq_len: int = 512,
    partition_col: Column | None = None,
) -> DataFrame:
    """Greedy sequential packing: documents are concatenated in
    ``order_col`` order and cut into ``seq_len``-token training
    sequences; each document is attributed to the bin where it starts.
    Adds ``n_tokens``, ``start_offset``, ``bin``.

    Scale shape: packing is inherently sequential, so production runs it
    per shard — pass ``partition_col`` (e.g. a date or hash bucket) and
    each shard packs independently inside one partition; bins are then
    (shard, bin).  Without it the window is a single global sequence
    (documented single-partition bound, dimension-scale inputs only —
    same policy as gaps.contiguous_regions)."""
    from pyspark.sql import Window

    n_tok = token_count_col if token_count_col is not None else token_count(
        F.col(text_col)
    )
    part = partition_col if partition_col is not None else F.lit(0)
    w = Window.partitionBy(part).orderBy(order_col)
    with_tok = df.withColumn("n_tokens", n_tok)
    return (
        with_tok.withColumn(
            "start_offset",
            F.coalesce(
                F.sum("n_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("bin", F.floor(F.col("start_offset") / seq_len))
    )


# --- deterministic dataset splitting (north star; content-hash splits
# survive re-shards and re-runs, unlike random assignment) --------------------


def split_assign(
    id_col,
    weights: dict[str, int],
) -> Column:
    """Stable train/val/test assignment from a content/id hash: the md5
    of the id maps to [0, 100) and the cumulative weight ranges pick the
    split.  Engine-portable (md5 + hex, no murmur dependency) and
    re-run/re-shard stable — the property random splits lack, and what
    prevents eval leakage when a corpus is rebuilt.

    ``weights``: {split_name: percent}, must sum to 100.
    """
    if sum(weights.values()) != 100:
        raise ValueError("split weights must sum to 100")
    bucket = F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10
    ).cast("long") % 100
    expr = None
    lo = 0
    for name, pct in weights.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return expr


def temperature_resample(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    id_col: str = "doc_id",
    target_total: int | None = None,
) -> DataFrame:
    """Temperature-based domain reweighting (north star: the multilingual /
    multi-domain mixture flattener — sampling domain ``s`` proportional to
    ``n_s ** alpha`` instead of ``n_s``, the standard way to keep head
    domains from drowning tail domains in a training mix).

    Per-domain keep rate ``r_s = min(1, T * n_s**alpha / Σ n**alpha / n_s)``
    (``T`` = ``target_total``, default = corpus size: pure re-balancing,
    downsample-only).  Each document keeps or drops DETERMINISTICALLY: its
    md5-derived bucket in [0, 1e6) is compared to ``round(r_s * 1e6)`` —
    re-run-, re-shard- and engine-stable, unlike Bernoulli sampling.

    Scale shape: one dimension-sized aggregate over ``group_col``, the
    rate table broadcast-joined back, then a map-side hash filter — the
    corpus itself is never shuffled.

    Returns the input rows that survive, with ``keep_rate`` attached.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    weighted = counts.withColumn("__w", F.pow(F.col("__n").cast("double"), F.lit(alpha)))
    totals = weighted.agg(
        F.sum("__w").alias("__sum_w"), F.sum("__n").alias("__total_n")
    )
    rates = (
        weighted.crossJoin(F.broadcast(totals))
        .withColumn(
            "keep_rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    (F.lit(float(target_total)) if target_total is not None
                     else F.col("__total_n").cast("double"))
                    * F.col("__w")
                    / F.col("__sum_w")
                    / F.col("__n").cast("double"),
                ),
                6,
            ),
        )
        .select(group_col, "keep_rate")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000000
    )
    return (
        df.join(F.broadcast(rates), on=group_col)
        .filter(bucket < F.round(F.col("keep_rate") * 1e6).cast("long"))
    )


def epoch_order(
    df: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """Deterministic per-epoch training order: every document gets a
    pseudo-random (shard, pos) from the md5 of ``(epoch, id)``, so each
    epoch is a different but perfectly reproducible global shuffle —
    restartable mid-epoch, identical across engines and re-shards (the
    guarantees Bernoulli/``orderBy(rand())`` cannot give).

    Scale shape: the shuffle key is hash-uniform, so the ONE exchange is
    skew-free by construction; position is ranked within each shard
    (never a global total order, which would serialize through a single
    partition).  Readers consume shards in shard order, positions within
    — the standard sharded-epoch contract.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(epoch).cast("string"), F.col(id_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return (
        df.withColumn("__h", h)
        .withColumn("shard", F.col("__h") % n_shards)
        .withColumn("pos", F.row_number().over(w))
        .drop("__h")
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate removal (the C4/RefinedWeb cleaning step):
    drop every line that appears in MORE than ``max_doc_freq`` distinct
    documents (nav bars, cookie banners, shared headers/footers), keeping
    each surviving document's remaining lines in their original order.

    Returns ``id_col, cleaned_text, n_kept, n_removed``.

    Shape: posexplode lines -> per-line distinct-doc counts (hash agg on
    the line hash) -> broadcast the FREQUENT set back (boilerplate lines
    are by definition few and heavy) -> filter + ordered reassembly under
    a doc-keyed agg.  Two shuffles: the line-hash agg and the doc-keyed
    rebuild; the frequent-line join is a broadcast.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    ).filter(F.trim(F.col("__line")) != "")
    freq = (
        lines.groupBy("__line")
        .agg(F.countDistinct(id_col).alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select("__line", F.lit(True).alias("__boiler"))
    )
    flagged = lines.join(F.broadcast(freq), on="__line", how="left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__boiler").isNull(),
                                F.struct(F.col("__pos"), F.col("__line")),
                            )
                        )
                    ),
                    lambda s: s["__line"],
                ),
            ).alias("cleaned_text"),
            F.sum(
                F.when(F.col("__boiler").isNull(), 1).otherwise(0)
            ).alias("n_kept"),
            F.sum(
                F.when(F.col("__boiler").isNotNull(), 1).otherwise(0)
            ).alias("n_removed"),
        )
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col,
    k: int,
    strata: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES /
    Efraimidis-Spirakis): each row draws key = ln(u)/w from an
    md5-derived uniform u and the k LARGEST keys win — inclusion
    probability proportional to weight, exactly the quality-weighted
    subset selection a curated training mix needs.

    Deterministic and engine-portable: u comes from the id's md5 (the
    same re-run-stable idiom as split_assign), and the key is rounded to
    12 dp with an id tie-break so rank order can never hinge on a libm
    ulp.  Rows with non-positive weight are excluded.

    Shape: map-side key computation + one ranking window per stratum
    (or a documented single-partition window when unstratified — pass
    strata at scale).
    """
    from pyspark.sql import Window

    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 12)
    part = [F.col(c) for c in strata] if strata else [F.lit(0)]
    w = Window.partitionBy(*part).orderBy(
        F.col("__wkey").desc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__wkey", key)
        .withColumn("__wrank", F.row_number().over(w))
        .filter(F.col("__wrank") <= k)
        .drop("__wkey", "__wrank")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Split each document into overlapping fixed-width character chunks
    (window ``chunk_chars``, step ``stride``) — the context-window
    chunking pass that precedes embedding / retrieval indexing in a
    training-data pipeline.  The last chunk may be short; empty documents
    yield no chunks.

    Map-side only: the offset list is a per-row ``sequence`` + explode,
    so chunking 100 TB is a scan with zero shuffles; the output carries
    (id, chunk_idx, chunk_text) straight into dedup/embedding stages.
    """
    n = F.length(F.col(text_col))
    # null-SAFE guard: for NULL text `n <= 0` is NULL (not false), so the
    # positive branch must be the guarded one — NULL and empty text both
    # fall to 0 chunks (matches the oracle's WHERE length(text) > 0)
    n_chunks = F.when(
        n > 0,
        F.floor(
            (F.greatest(n - chunk_chars, F.lit(0)) + stride - 1) / stride
        )
        + 1,
    ).otherwise(F.lit(0))
    # sequence(0, -1) would generate a DESCENDING [0, -1] — guard the
    # empty-document case with an empty array instead
    idxs = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks.cast("int") - 1)
    ).otherwise(F.array().cast("array<int>"))
    out = df.select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        F.explode(idxs).alias("chunk_idx"),
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.substring(
            F.col("__t"), F.col("chunk_idx") * stride + 1, chunk_chars
        ).alias("chunk_text"),
    )


def term_distribution_shift(
    df: DataFrame,
    split_pred,
    text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """Per-term Jensen-Shannon divergence contributions between two
    corpus slices (``split_pred`` false → P, true → Q) — the
    domain-shift / snapshot-drift detector for training-corpus curation
    ("which words' frequencies moved between crawls?").

    JSD(P,Q) = 0.5 Σ_t [ p ln(2p/(p+q)) + q ln(2q/(p+q)) ] and this
    returns the bracketed per-term halves.  Counts are exact integers
    from one hash agg; each term's probabilities are single divisions of
    those integers and the ln() terms are plain scalar math on them —
    deterministic per row, no float accumulation (callers that want the
    scalar JSD decimal-sum the rounded contributions, as the oracle
    does).  Absent terms contribute with the 0·ln0 → 0 convention.
    Shape: explode → one (term, side) hash agg → term-keyed arithmetic;
    the corpus text never shuffles, only (term, count) pairs do.
    """
    side = F.when(split_pred, 1).otherwise(0)
    terms = df.select(
        side.alias("__side"), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.length("term") > 0)
    counts = terms.groupBy("term").agg(
        F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).alias("p_cnt"),
        F.sum(F.when(F.col("__side") == 1, 1).otherwise(0)).alias("q_cnt"),
    )
    # corpus totals are two scalars: broadcast them rather than running a
    # single-partition window over the vocab axis (the vocab itself can be
    # billions of terms at 100 TB)
    totals = F.broadcast(
        counts.agg(
            F.sum("p_cnt").alias("__tp"), F.sum("q_cnt").alias("__tq")
        )
    )
    counts = counts.crossJoin(totals)
    tp = F.col("__tp").cast("double")
    tq = F.col("__tq").cast("double")
    p = F.col("p_cnt").cast("double") / tp
    q = F.col("q_cnt").cast("double") / tq
    m2 = p + q  # 2 * mixture
    term_of = lambda r: F.when(  # noqa: E731 - x ln(2x/(p+q)), 0 at x=0
        r > 0.0, r * F.log(F.lit(2.0) * r / m2)
    ).otherwise(F.lit(0.0))
    return counts.select(
        "term",
        "p_cnt",
        "q_cnt",
        F.round(0.5 * (term_of(p) + term_of(q)), decimals).alias("jsd_part"),
    )


def _bm25_doc_term_parts(
    staged: DataFrame,
    qarr,
    id_col: str,
    term_col: str,
    k1: float,
    b: float,
    decimals: int,
) -> DataFrame:
    """Per-(doc, term) BM25 score parts from ONE corpus pass.

    ``staged`` carries the token array in its own ``__t`` projection
    (plus any broadcast query-set column ``qarr`` references).  One
    generator emits the query-term occurrences; ``posexplode_outer``
    keeps every document alive as a null-term sentinel row, and a
    first-row flag makes the corpus stats (N, sum dl) a pure global
    aggregate over the same stream.  The localCheckpoint materializes
    the occurrence stream once so the stats reduction and the tf
    aggregation both read it back instead of re-tokenizing the corpus
    — the r12 shape paid TWO full tokenization passes (dl table +
    explode) and a fact-sized (doc -> dl) join; dl now rides the
    postings into the tf aggregation, so that join is gone.  tf, df,
    dl, N are the same exact integers as the two-pass form."""
    src = (
        staged.select(
            F.col(id_col),
            F.size("__t").alias("dl"),
            F.posexplode_outer(
                F.filter("__t", lambda x: F.array_contains(qarr, x))
            ).alias("__pos", term_col),
        )
        .select(
            F.col(id_col),
            F.col("dl"),
            (F.col("__pos").isNull() | (F.col("__pos") == 0))
            .cast("int")
            .alias("__doc_row"),
            F.col(term_col),
        )
        .localCheckpoint(eager=True)
    )
    stats = F.broadcast(
        src.agg(
            F.sum("__doc_row").alias("__n_docs"),
            F.sum(
                F.when(F.col("__doc_row") == 1, F.col("dl"))
            ).alias("__sum_dl"),
        )
    )
    tf = (
        src.filter(F.col(term_col).isNotNull())
        .groupBy(id_col, term_col)
        .agg(
            F.count(F.lit(1)).alias("tf"),
            # dl is constant within a (doc, term) group
            F.first("dl").alias("dl"),
        )
    )
    dfreq = F.broadcast(
        tf.groupBy(term_col).agg(F.count(F.lit(1)).alias("df"))
    )
    j = tf.join(dfreq, term_col).crossJoin(stats)
    n_d = F.col("__n_docs").cast("double")
    avgdl = F.col("__sum_dl").cast("double") / n_d
    idf = F.log(
        F.lit(1.0)
        + (n_d - F.col("df") + 0.5) / (F.col("df").cast("double") + 0.5)
    )
    tf_d = F.col("tf").cast("double")
    sat = (
        tf_d * (k1 + 1.0)
        / (tf_d + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl))
    )
    return j.select(
        F.col(id_col),
        F.col(term_col),
        F.round(idf * sat, decimals).alias("__part"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    decimals: int = 6,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a bag-of-terms query —
    the lexical retrieval scorer (data selection, retrieval-eval
    baselines).  Uses the Lucene idf form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` and per-term saturation
    ``tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))``.

    Engine-exactness: tf/df/dl/N are exact integers from hash aggs;
    avgdl is one division of exact integers; each term's score is
    scalar double math on those, rounded to ``decimals``, and the
    per-document total decimal-sums the rounded parts.

    Scale shape: ONE corpus tokenization pass (see
    :func:`_bm25_doc_term_parts` — the r12 shape paid two); the tf
    shuffle carries only the query's posting lists, never the corpus
    vocabulary; df and the corpus stats broadcast.
    Returns (id, bm25) for documents matching >= 1 term.
    """
    qarr = (
        F.array(*[F.lit(t) for t in query_terms])
        if query_terms
        else F.array().cast("array<string>")
    )
    staged = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    parts = _bm25_doc_term_parts(
        staged, qarr, id_col, "term", k1=k1, b=b, decimals=decimals
    )
    return (
        parts.select(F.col(id_col), F.col("__part"))
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(
                    F.col("__part").cast(f"decimal(28,{decimals})")
                ).cast("double"),
                decimals,
            ).alias("bm25")
        )
    )


def bm25_scores_batch(
    df: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    decimals: int = 6,
) -> DataFrame:
    """BM25 for a BATCH of queries in one plan — ``queries`` is a
    (query_id, term) table, one row per query term.  Same scoring
    algebra and engine-exactness recipe as :func:`bm25_scores`.

    Scale shape (why this beats N single-query runs): the per-(doc,
    term) score part is QUERY-INDEPENDENT — tf, df, dl, avgdl don't
    mention the query — so the corpus is scanned and the posting lists
    aggregated ONCE for the union of all query terms; fanning out to
    per-query totals is then a broadcast join of the tiny (query_id,
    term) table against the already-aggregated parts.  Batch retrieval
    (the actual curation workload: thousands of probes against one
    corpus) costs one corpus pass + per-query posting-list-sized aggs,
    not N corpus passes.  The union term set packs into one broadcast
    array row (same driver-memory class as the broadcast distinct-term
    table it replaces).  The in-scan match is ``array_contains`` per
    token — linear in the union size in principle, but measured FLAT
    from 8 to 1000 union terms at sf0.1 (codegen'd scan of a broadcast
    array; postings costs dominate), and an explode + broadcast hash
    join variant measured no faster at either size (r13 A/B).
    Returns (query_id, id, bm25) for documents
    matching >= 1 of that query's terms."""
    qpack = F.broadcast(
        queries.agg(F.collect_set(F.col(term_col)).alias("__qset"))
    )
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    ).crossJoin(qpack)
    parts = _bm25_doc_term_parts(
        staged, F.col("__qset"), id_col, term_col, k1=k1, b=b,
        decimals=decimals,
    )
    return (
        parts.join(F.broadcast(queries), term_col)
        .groupBy(query_id_col, id_col)
        .agg(
            F.round(
                F.sum(
                    F.col("__part").cast(f"decimal(28,{decimals})")
                ).cast("double"),
                decimals,
            ).alias("bm25")
        )
    )


def unigram_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int = 6,
) -> DataFrame:
    """Per-document perplexity under the corpus's own add-1-smoothed
    unigram LM — the classic cheap LM-quality filter (CCNet-style: low
    perplexity ≈ in-distribution text, high ≈ junk), self-contained so
    no external model ships with the job.

    ``p(t) = (cnt(t) + 1) / (T + V)``; ``ppl = exp(-Σ tf·ln p / n)``.
    Exactness: counts are exact integers; each term's ln p rounds to
    ``decimals``; per-doc Σ tf·lnp6 rounds per term then decimal-sums,
    and the final exp of a deterministic double is engine-stable at 4dp.

    Scale shape: one (term) hash agg builds the LM, one (doc, term)
    hash agg the term frequencies; they join ON TERM — a plain shuffled
    hash join because at 100 TB the vocab is not broadcastable — then
    one doc-keyed agg.  The raw text never joins anything.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.length("term") > 0)
    # tf feeds both the LM build and the per-doc scoring: materialize it
    # so the corpus is tokenized ONCE (r13 — the vocab-side checkpoint
    # still left tf re-tokenizing the corpus in its own branch); the LM
    # counts derive exactly: cnt(term) = sum of per-doc tfs
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    totals = F.broadcast(
        vocab.agg(
            F.sum("cnt").alias("__T"), F.count(F.lit(1)).alias("__V")
        )
    )
    probs = vocab.crossJoin(totals).select(
        "term",
        F.round(
            F.log(
                (F.col("cnt") + 1).cast("double")
                / (F.col("__T") + F.col("__V")).cast("double")
            ),
            decimals,
        ).alias("__lnp"),
    )
    part = F.round(F.col("tf") * F.col("__lnp"), decimals)
    return (
        tf.join(probs, "term")
        .select(F.col(id_col), F.col("tf"), part.alias("__part"))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("__part").cast("decimal(28,6)")).alias("__S"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.exp(
                    -F.col("__S").cast("double")
                    / F.col("n_tokens").cast("double")
                ),
                4,
            ).alias("perplexity"),
        )
    )
