"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst column expressions (split / transform / filter /
aggregate higher-order functions) — no Python UDFs, so the hot path
stays inside whole-stage codegen and scales linearly with input bytes.
At 100 TB these are embarrassingly parallel map-side ops: no shuffle at
all unless the caller aggregates.

Ops: token counting, quality scoring (length / punctuation / stopword
ratios), heuristic language ID (marker-word scoring), document
fingerprinting (min-hash of rolling word shingles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators.scale import (
    bounded_global_partition,
    bounded_global_window,
)

from . import cachereg

# Deterministic marker lexicons for the language-ID heuristic. A real
# deployment swaps in per-language character-n-gram profiles; the operator
# shape (score per language → argmax with fixed priority) is unchanged.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "est", "une"),
    "es": ("el", "los", "de", "y", "es", "una"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased, trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def normalize_expr(text: Column | str) -> Column:
    """Canonical text normalization for dedup keys: lowercase, strip
    every non-alphanumeric/space character, collapse whitespace runs to
    one space, trim. Pure codegen projection (three regexp passes) —
    the standard pre-hash canonicalization so that case / punctuation /
    spacing variants of the same content dedup together."""
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def _in_list_sql(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def marker_hits(toks_col: str, words: tuple[str, ...]) -> Column:
    """Count of tokens belonging to a marker set — higher-order filter,
    evaluated per row with no shuffle. Delegates to
    ``marker_hits_expr`` so there is ONE membership semantics to keep
    oracle-aligned."""
    return marker_hits_expr(F.col(toks_col), words)


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring columns: n_chars, n_tokens, avg token length,
    punctuation ratio, stopword ratio. One projection, zero shuffles."""
    out = df.withColumn("_toks", tokens(text_col))
    n_chars = F.length(F.col(text_col))
    no_ws = F.regexp_replace(F.col(text_col), r"\s+", "")
    non_alnum = F.regexp_replace(F.lower(no_ws), r"[a-z0-9]", "")
    return (
        out.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", F.size("_toks"))
        .withColumn(
            "avg_token_len",
            F.round(F.length(no_ws) / F.greatest(F.size("_toks"), F.lit(1)), 6),
        )
        .withColumn(
            "punct_ratio",
            F.round(F.length(non_alnum) / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                marker_hits("_toks", STOPWORDS)
                / F.greatest(F.size("_toks"), F.lit(1)),
                6,
            ),
        )
        .drop("_toks")
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: marker-word score per language, argmax with
    a fixed priority order (en > de > fr > es > unknown) for ties."""
    out = df.withColumn("_toks", tokens(text_col))
    for lang, words in LANG_MARKERS.items():
        out = out.withColumn(f"score_{lang}", marker_hits("_toks", words))
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.when(best == 0, F.lit("unknown"))
    for lg in langs:  # fixed priority: first lang reaching the max wins
        pred = pred.when(F.col(f"score_{lg}") == best, F.lit(lg))
    return out.withColumn("lang_pred", pred).drop("_toks")


# characteristic character-trigrams per language (toy profiles — a real
# deployment trains these from corpora; the operator shape is identical)
CHAR_TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "ing", "ion", "and"),
    "de": ("der", "sch", "ein", "und"),
    "fr": ("les", "ent", "que", "une"),
    "es": ("los", "que", "ión", "una"),
}

BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def chargram_hits(text_col: Column | str, gram: str) -> Column:
    """Occurrences of one character n-gram — counted via split length
    (codegen'd, no UDF): count = size(split(text, gram)) - 1."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    escaped = "".join(
        f"\\{ch}" if not ch.isalnum() else ch for ch in gram
    )
    return F.size(F.split(F.lower(c), escaped)) - 1


def with_lang_id_chargram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-n-gram language ID: per-language score = total hits of
    that language's characteristic trigrams; argmax with fixed priority
    (the n-gram-profile variant of with_lang_id's marker-word scoring)."""
    out = df
    for lang, grams in CHAR_TRIGRAM_PROFILES.items():
        score = None
        for g in grams:
            h = chargram_hits(text_col, g)
            score = h if score is None else score + h
        out = out.withColumn(f"cscore_{lang}", score)
    langs = list(CHAR_TRIGRAM_PROFILES)
    best = F.greatest(*[F.col(f"cscore_{lg}") for lg in langs])
    pred = F.when(best == 0, F.lit("unknown"))
    for lg in langs:
        pred = pred.when(F.col(f"cscore_{lg}") == best, F.lit(lg))
    return out.withColumn("lang_pred_chargram", pred)


def bpe_ish_token_count(text_col: Column | str) -> Column:
    """BPE-style pre-tokenization count: alpha runs, digit runs, and
    punctuation runs each count as one token (the chunking a BPE
    tokenizer's pre-tokenizer regex produces, sans merges)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 0))


def shingles(toks_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token-array column. Rows with
    fewer than n tokens yield the whole text as a single shingle."""
    return F.expr(
        f"""
        CASE WHEN size({toks_col}) < {n}
             THEN array(concat_ws(' ', {toks_col}))
             ELSE array_distinct(transform(
                    sequence(1, size({toks_col}) - {n - 1}),
                    i -> concat_ws(' ', slice({toks_col}, i, {n}))))
        END
        """
    )


def with_fingerprint(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprint: min over rolling word-shingle hashes — the
    1-hash MinHash, a locality-sensitive rolling-hash fingerprint. md5 is
    used as the mixing function because it is identical in every engine
    (our oracle included); the min over hex strings is a valid uniform
    permutation min."""
    out = df.withColumn("_toks", tokens(text_col))
    fp = F.expr(
        "array_min(transform(_sh, s -> md5(s)))"
    )
    return (
        out.withColumn("_sh", shingles("_toks", n))
        .withColumn("fingerprint", fp)
        .drop("_toks", "_sh")
    )


def winnow_fingerprints(
    df: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
    2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
    the MOSS algorithm): hash every word k-gram, slide a window of w
    consecutive hashes, select each window's RIGHTMOST-minimal hash,
    dedupe selected (hash, position) pairs. The guarantee: any match
    of at least w+k−1 tokens between two documents shares at least one
    selected fingerprint, while only ~2/(w+1) of positions are kept —
    the bounded-density local sampling exact-substring detectors use
    when storing every gram is too much.

    md5 hex hashes (engine-portable, min over strings is a uniform
    permutation min); rightmost-min tie-break per the paper (ties only
    arise for REPEATED gram text, where rightmost selection minimizes
    re-selections across overlapping windows).

    Entirely map-side: per-document higher-order expressions (one fold
    per window over the zipped (hash, pos) array) — ZERO shuffles; the
    output is (id, fingerprints array<struct<h,p>>, n_grams). Documents
    shorter than k tokens yield their whole-text hash at position 1.
    """
    toks = df.select(F.col(doc_id), tokens(text_col).alias("__toks"))
    gram_hashes = F.expr(
        f"""
        CASE WHEN size(__toks) < {k}
             THEN array(md5(concat_ws(' ', __toks)))
             ELSE transform(
                    sequence(1, size(__toks) - {k - 1}),
                    i -> md5(concat_ws(' ', slice(__toks, i, {k}))))
        END
        """
    )
    staged = toks.select(
        F.col(doc_id), gram_hashes.alias("__gh")
    ).withColumn(
        "__hp",
        F.expr(
            "transform(__gh, (h, i) -> struct(h AS h, i + 1 AS p))"
        ),
    )
    # per window i: fold slice(__hp, i, w) keeping (h asc, p desc)
    win_min = F.expr(
        f"""
        transform(
          sequence(1, greatest(size(__hp) - {w - 1}, 1)),
          i -> aggregate(
                 slice(__hp, i, {w}),
                 cast(null as struct<h string, p int>),
                 (acc, x) -> CASE
                   WHEN acc IS NULL THEN x
                   WHEN x.h < acc.h OR (x.h = acc.h AND x.p > acc.p)
                     THEN x
                   ELSE acc END))
        """
    )
    return staged.select(
        F.col(doc_id),
        F.size("__gh").alias("n_grams"),
        F.array_distinct(win_min).alias("fingerprints"),
    )


def winnow_overlap_report(
    df: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document overlap through winnowed fingerprints: the
    bounded-density twin of ``duplicated_passage_report`` — instead of
    every gram, only the ~2/(w+1) winnow-selected ones shuffle, with
    the paper's guarantee that any shared run of ≥ w+k−1 tokens still
    surfaces. Output per document: ``(id, n_fingerprints, n_shared,
    shared_fraction)`` where shared = the fingerprint hash appears in
    ≥ ``min_docs`` distinct documents.

    Scale shape: fingerprint selection is map-only
    (``winnow_fingerprints``); the ONLY shuffles are the hash-grain
    distinct-doc count and the semi join back — both over the winnowed
    (≈ 2/(w+1)-density) stream, never the full gram table.
    """
    fps = winnow_fingerprints(df, doc_id, text_col, k=k, w=w).select(
        F.col(doc_id),
        F.explode(F.expr("transform(fingerprints, x -> x.h)")).alias("h"),
    )
    per_doc = fps.groupBy(doc_id, "h").agg(F.count(F.lit(1)).alias("__n"))
    cross = per_doc.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    shared = cross.filter(F.col("n_docs") >= min_docs).select("h")
    agg = (
        per_doc.join(shared, "h", "left_semi")
        .groupBy(doc_id)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    totals = per_doc.groupBy(doc_id).agg(
        F.count(F.lit(1)).alias("n_fingerprints")
    )
    return totals.join(agg, doc_id, "left").select(
        F.col(doc_id),
        "n_fingerprints",
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
        F.round(
            F.coalesce("n_shared", F.lit(0))
            / F.greatest(F.col("n_fingerprints"), F.lit(1)),
            6,
        ).alias("shared_fraction"),
    )


def tfidf_top_terms(
    df: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (corpus-level quality / rare-
    term signal for training-data curation; the classic two-aggregate
    doc×term pipeline).

    Scale shape: ONE pass over the corpus builds the (doc, term)
    frequency table; document frequency is re-aggregated FROM that table
    (never a second corpus scan), so the expensive explode happens once.
    The corpus size N joins in as a broadcast 1-row scalar; the idf join
    is keyed on the term dictionary (≪ corpus, AQE handles stopword
    skew); the final top-k is a per-doc row_number window. Scores are
    rounded to 6 decimals BEFORE ranking with a term-name tie-break, so
    the ranking is deterministic and engine-portable (last-ulp ln()
    differences cannot reorder).
    """
    from pyspark.sql import Window

    toks = df.select(
        doc_id, F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(doc_id, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").cast("double").alias("__n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy(doc_id).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(doc_id, "term", "tf", "tfidf", "rk")
    )


def with_repetition(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Repetition quality signal: fraction of word n-grams that are
    duplicates of an earlier n-gram in the same document (high ratio =
    boilerplate / looping text — a standard curation filter). Pure
    map-side higher-order expressions; rows with fewer than ``n`` tokens
    score 0."""
    out = df.withColumn("_toks", tokens(text_col))
    grams = F.expr(
        f"""
        CASE WHEN size(_toks) < {n} THEN array()
             ELSE transform(sequence(1, size(_toks) - {n - 1}),
                            i -> concat_ws(' ', slice(_toks, i, {n})))
        END
        """
    )
    o = out.withColumn("_grams", grams)
    n_g = F.size("_grams")
    n_d = F.size(F.array_distinct("_grams"))
    return (
        o.withColumn("n_grams", n_g)
        .withColumn(
            "dup_gram_ratio",
            F.when(n_g <= 0, F.lit(0.0)).otherwise(
                F.round((n_g - n_d) / n_g, 6)
            ),
        )
        .drop("_toks", "_grams")
    )


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level vocabulary profile in ONE pass over the exploded
    tokens: total tokens, vocabulary size, hapax count (terms seen
    exactly once — the long-tail signal), and type-token ratio. The
    per-term aggregate shuffles on the term dictionary; the final
    single-row reduce is a partial-aggregated scalar."""
    toks = df.select(F.explode(tokens(text_col)).alias("term")).filter(
        F.col("term") != ""
    )
    per_term = toks.groupBy("term").agg(F.count("*").alias("c"))
    return per_term.agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("vocab"),
        F.count_if(F.col("c") == 1).alias("hapax"),
        F.round(F.count("*") / F.sum("c"), 6).alias("type_token_ratio"),
    )


def chunk_documents(
    df: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    width: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Context-window chunking: split each document into ``width``-token
    chunks advancing by ``width - overlap`` tokens (the stride), the
    standard prep for fixed-context training/embedding.

    Native composition — explode a stride sequence and slice the token
    array per chunk; everything stays in whole-stage codegen and the
    fan-out is rows × ceil(tokens/stride), purely map-side. (A Python
    UDTF expressing the same op exists in tests as the §2.10 escape-
    hatch demonstration; this native form is the production path.)
    """
    if not 0 <= overlap < width:
        raise ValueError(f"need 0 <= overlap < width, got {overlap=} {width=}")
    stride = width - overlap
    out = df.withColumn("_toks", tokens(text_col))
    return (
        out.withColumn(
            "_start",
            F.explode(
                F.expr(f"sequence(1, greatest(size(_toks), 1), {stride})")
            ),
        )
        .select(
            doc_id,
            ((F.col("_start") - 1) / stride).cast("int").alias("chunk_idx"),
            F.expr(f"concat_ws(' ', slice(_toks, _start, {width}))").alias(
                "chunk"
            ),
            F.expr(f"size(slice(_toks, _start, {width}))").alias("chunk_tokens"),
        )
    )


def chargrams(
    text: Column | str, n: int = 3, normalized: bool = False
) -> Column:
    """Array of character n-grams of the normalized text (lowercase,
    punctuation stripped, whitespace collapsed) — native sequence +
    substring transform, no UDF. Documents shorter than n grams yield
    an empty array.

    ``normalized=True`` skips the normalization pass — REQUIRED when
    chargramming a derived expression at scale: the input expression is
    duplicated into every per-element ``transform`` slot, so an inlined
    3-regex normalization would re-run once PER GRAM (O(len²) regex
    work — measured 20s vs 0.3s on the 50-doc smoke table). Project
    ``normalize_expr`` into a real column first, then chargram that."""
    c = F.col(text) if isinstance(text, str) else text
    norm = c if normalized else normalize_expr(c)
    return F.when(
        F.length(norm) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - (n - 1)),
            lambda i: F.substring(norm, i, F.lit(n)),
        )
    )


def ngram_lm_score(
    df: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """CCNet-style language-model quality score: train a character
    n-gram unigram LM on the corpus itself, then score every document
    by its mean negative log2 gram probability (bits per gram — low =
    stereotypical text, high = unusual/noisy; CCNet buckets documents
    by exactly this perplexity signal to select training data).

    ONE corpus explode at 100 TB (VERDICT r6 #3 — the old shape ran it
    twice, once for the model and once for scoring):

      1. dg = explode grams → count per (doc, gram). Map-side combine
         collapses each task to its distinct (doc, gram) pairs before
         the exchange, so the shuffle carries the DEDUPED gram stream;
         the frame is persisted (spills to disk) because both the
         model aggregate and the scoring join read it.
      2. model = re-aggregate dg per gram (≤ ~37³ groups for
         normalized text — alphabet-bounded, broadcastable). No
         second corpus scan.
      3. score = dg ⋈ broadcast(model) → weighted mean per doc
         (Σ cnt·log2 p / Σ cnt — identical value to the per-occurrence
         mean, one row per DISTINCT gram instead of per occurrence).

    Grams ride internally as base-128 INTEGER codes (codepoint fold
    over a materialized char array), not 3-char strings: injective for
    ASCII-normalized text, so every count is identical to the
    string-gram formulation the oracle uses, while skipping millions
    of small-string allocations and — critically — the O(position)
    UTF8 seek ``substring(t, i, n)`` pays per gram (measured 2.3× on
    the gram pass). The codepoint array MUST be its own projected
    column: referencing the split+transform expression inside the
    gram lambda would re-evaluate it per element (O(len²)).

    Output: (doc_id, n_grams, bits_per_gram). Deterministic: the score
    is a mean of per-gram logs rounded late; grams unseen in training
    cannot occur (self-trained).
    """
    from pyspark import StorageLevel

    normed = df.select(
        F.col(doc_id), normalize_expr(text_col).alias("__t")
    )
    staged = normed.select(
        F.col(doc_id),
        F.length("__t").alias("__n"),
        F.transform(
            F.split(F.col("__t"), ""), lambda c: F.ascii(c)
        ).alias("__c"),
    )
    code = lambda i: sum(  # noqa: E731 - tight local expr builder
        (
            F.element_at(F.col("__c"), i + j) * F.lit(128 ** (n - 1 - j))
            for j in range(1, n)
        ),
        F.element_at(F.col("__c"), i) * F.lit(128 ** (n - 1)),
    )
    grams = F.when(
        F.col("__n") < n, F.array().cast("array<int>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.col("__n") - (n - 1)), code
        )
    )
    dg = (
        staged.select(F.col(doc_id), F.explode(grams).alias("gram"))
        .groupBy(doc_id, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cachereg.track(dg)
    model = dg.groupBy("gram").agg(F.sum("cnt").alias("gram_n"))
    total = model.agg(F.sum("gram_n").alias("total_n"))
    scored = (
        dg.join(F.broadcast(model), "gram")
        .crossJoin(F.broadcast(total))
        .groupBy(doc_id)
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.round(
                -(
                    F.sum(
                        F.col("cnt")
                        * F.log2(F.col("gram_n") / F.col("total_n"))
                    )
                    / F.sum("cnt")
                ),
                6,
            ).alias("bits_per_gram"),
        )
    )
    return df.select(doc_id).join(scored, doc_id, "left").select(
        doc_id,
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        "bits_per_gram",
    )


def ccnet_perplexity_buckets(
    df: DataFrame,
    group_col: str = "source",
    doc_id: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020): documents
    split per group (language/crawl) into head / middle / tail by the
    within-group terciles of their LM score — the step after
    ``ngram_lm_score`` that CCNet uses to stratify training data by
    how stereotypical it is (head = lowest bits-per-gram).

    Exactness: tercile thresholds are EXACT weighted percentiles over
    the (group, score) count grain — the scores are already
    6dp-quantized by ``ngram_lm_score``, so the grain is bounded and
    both engines compare identical rounded doubles; per-bucket mean
    bits ride ×1e6 integer sums (exact decimals) so partition order
    cannot perturb them.

    Scale shape: ``ngram_lm_score``'s one corpus gram pass, then a
    (group, score)-grain aggregation for the thresholds (broadcast
    back — group-cardinality rows) and one map-side bucket assignment
    + final group×3 aggregation.

    Output: ``(group, bucket, n_docs, mean_bits)`` — bucket ∈
    head/middle/tail, groups with no scoreable docs absent.
    """
    from pyspark import StorageLevel

    scored = ngram_lm_score(df, doc_id=doc_id, text_col=text_col, n=n)
    # both the threshold pass and the bucket pass read the scored
    # frame — persist it or the LM scoring join executes twice
    s = cachereg.track(
        scored.join(df.select(doc_id, group_col), doc_id)
        .filter(F.col("bits_per_gram").isNotNull())
        .select(doc_id, group_col, "bits_per_gram")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = s.groupBy(group_col, "bits_per_gram").agg(
        F.count(F.lit(1)).alias("__c")
    )
    th = counts.groupBy(group_col).agg(
        F.expr(
            "percentile(bits_per_gram, array(1.0D/3.0D, 2.0D/3.0D), __c)"
        ).alias("__th")
    ).select(
        group_col,
        F.round(F.element_at("__th", 1), 6).alias("__t1"),
        F.round(F.element_at("__th", 2), 6).alias("__t2"),
    )
    bucketed = s.join(F.broadcast(th), group_col).withColumn(
        "bucket",
        F.when(F.col("bits_per_gram") <= F.col("__t1"), "head")
        .when(F.col("bits_per_gram") <= F.col("__t2"), "middle")
        .otherwise("tail"),
    )
    return bucketed.groupBy(group_col, "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(
                F.round(F.col("bits_per_gram") * 1e6).cast("decimal(38,0)")
            ).cast("double")
            / 1e6
            / F.count(F.lit(1)),
            6,
        ).alias("mean_bits"),
    )


def moore_lewis_scores(
    df: DataFrame,
    in_domain,
    doc_id: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    alpha: float = 1.0,
) -> DataFrame:
    """Moore–Lewis cross-entropy-difference data selection (Moore &
    Lewis 2010, "Intelligent Selection of Language Model Training
    Data"): every document scored by
    ``ce_diff = bits_in − bits_out`` — its per-gram cross-entropy
    under a char-n-gram unigram LM trained on the IN-DOMAIN subset
    (``in_domain``: a boolean Column over ``df``) minus the same under
    the general-corpus LM. Low ce_diff = looks like the target domain
    relative to how stereotypical it is overall; selecting the lowest
    fraction is the classic LM-training-data selection step (the
    smoothed-LM complement of DSIR's hashed-token ratio).

    Both models take add-``alpha`` (Laplace) smoothing over the POOLED
    gram vocabulary V, so grams unseen in-domain still score finitely
    and both engines share one closed form:
    ``p = (cnt + α) / (total + α·|V|)``.

    Scale shape (the ``ngram_lm_score`` discipline): ONE corpus gram
    explode to a persisted (doc, gram, cnt, in_flag) frame; BOTH
    models fall out of one alphabet-bounded re-aggregation of it
    (in-domain counts are a conditional sum, not a second pass); the
    grand totals + |V| are a 1-row broadcast; scoring is one
    broadcast join + per-doc weighted mean. Grams ride as base-128
    integer codes (injective for normalized text — counts identical
    to the oracle's string grams).

    Output: ``(doc_id, in_domain, n_grams, bits_in, bits_out,
    ce_diff)`` — one row per input document, NULL bits for documents
    shorter than n chars.
    """
    from pyspark import StorageLevel

    normed = df.select(
        F.col(doc_id),
        in_domain.cast("boolean").alias("__in"),
        normalize_expr(text_col).alias("__t"),
    )
    staged = normed.select(
        F.col(doc_id),
        "__in",
        F.length("__t").alias("__n"),
        F.transform(
            F.split(F.col("__t"), ""), lambda c: F.ascii(c)
        ).alias("__c"),
    )
    code = lambda i: sum(  # noqa: E731 - tight local expr builder
        (
            F.element_at(F.col("__c"), i + j) * F.lit(128 ** (n - 1 - j))
            for j in range(1, n)
        ),
        F.element_at(F.col("__c"), i) * F.lit(128 ** (n - 1)),
    )
    grams = F.when(
        F.col("__n") < n, F.array().cast("array<int>")
    ).otherwise(
        F.transform(F.sequence(F.lit(1), F.col("__n") - (n - 1)), code)
    )
    dg = (
        staged.select(
            F.col(doc_id), "__in", F.explode(grams).alias("gram")
        )
        .groupBy(doc_id, "__in", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cachereg.track(dg)
    model = dg.groupBy("gram").agg(
        F.sum("cnt").alias("all_n"),
        F.sum(F.when(F.col("__in"), F.col("cnt")).otherwise(0)).alias(
            "in_n"
        ),
    )
    tot = model.agg(
        F.sum("all_n").alias("all_tot"),
        F.sum("in_n").alias("in_tot"),
        F.count(F.lit(1)).alias("v"),
    )
    a = F.lit(float(alpha))
    p_in = (F.col("in_n") + a) / (F.col("in_tot") + a * F.col("v"))
    p_out = (F.col("all_n") + a) / (F.col("all_tot") + a * F.col("v"))
    scored = (
        dg.join(F.broadcast(model), "gram")
        .crossJoin(F.broadcast(tot))
        .groupBy(doc_id, "__in")
        .agg(
            F.sum("cnt").alias("n_grams"),
            (-(F.sum(F.col("cnt") * F.log2(p_in)) / F.sum("cnt"))).alias(
                "__bin"
            ),
            (-(F.sum(F.col("cnt") * F.log2(p_out)) / F.sum("cnt"))).alias(
                "__bout"
            ),
        )
    )
    return (
        normed.select(doc_id, "__in")
        .join(scored, [doc_id, "__in"], "left")
        .select(
            F.col(doc_id),
            F.col("__in").alias("in_domain"),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.round("__bin", 6).alias("bits_in"),
            F.round("__bout", 6).alias("bits_out"),
            F.round(F.col("__bin") - F.col("__bout"), 6).alias("ce_diff"),
        )
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """One iteration of BPE vocabulary induction: the adjacent
    character-pair frequencies that byte-pair-encoding training greedily
    merges, weighted by word frequency. The highest-count pair is the
    merge a real BPE trainer would perform next.

    The classic scale trick (same as every BPE implementation since
    Sennrich et al. 2016): aggregate to the WORD-FREQUENCY table first —
    vocabulary-bounded, not corpus-bounded — then explode pairs over the
    vocabulary and weight by word count. At 100 TB the corpus is read
    once for the word count; the pair explode touches only |vocab| rows.

    Output: (pair, pair_n, rk) for the top_k pairs, rank ties broken by
    pair text — deterministic.
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.substring(F.col("w"), i, F.lit(2)),
                )
            ).alias("pair"),
        )
    )
    counts = pairs.groupBy("pair").agg(F.sum("freq").alias("pair_n"))
    w = bounded_global_window(
        "pair_n", F.desc("pair_n"), F.asc("pair")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
    )


def tokens_to_ids(
    df: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
    unk_id: int = 0,
) -> DataFrame:
    """Materialize training token-id sequences: build the corpus vocab
    (top ``vocab_size`` tokens by frequency, ties by token text; ids
    1..N by that rank, 0 = UNK) and map every document to its ORDERED
    id array — the last hop before tensors, and the step where token
    order must survive distribution.

    Scale shape: the vocab is frequency-aggregated (map-side combine →
    vocab-bounded shuffle), reduced to the top ``vocab_size`` via
    TakeOrderedAndProject, ranked with a window over those k rows only,
    and broadcast back; documents then posexplode, join the broadcast
    vocab, and re-assemble with array_sort over (pos, id) structs so
    reassembly is deterministic regardless of shuffle order.
    Output: (doc_id, n_tokens, ids).
    """
    toks = df.select(
        F.col(doc_id),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    # top-k FIRST via TakeOrderedAndProject (never a global window over
    # ALL distinct tokens — that funnels the whole vocabulary-candidate
    # set through one sorting task), THEN rank the k survivors: the
    # row_number window runs over exactly vocab_size rows
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(vocab_size)
    )
    vocab = top.withColumn(
        "id",
        F.row_number().over(
            bounded_global_window("freq", F.desc("freq"), F.asc("tok"))
        ),
    ).select("tok", "id")
    mapped = toks.join(F.broadcast(vocab), "tok", "left").select(
        doc_id,
        "pos",
        F.coalesce("id", F.lit(unk_id)).alias("id"),
    )
    assembled = (
        mapped.groupBy(doc_id)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "id"))),
                lambda s: s["id"],
            ).alias("ids"),
        )
    )
    return df.select(doc_id).join(assembled, doc_id, "left").select(
        doc_id,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("ids", F.array().cast("array<int>")).alias("ids"),
    )


def lexical_diversity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document type/token ratio — the classic lexical-diversity
    quality signal (low TTR ⇒ repetitive/template text; complements
    ``repetition_stats``' n-gram view). Pure map-side array expressions
    (split → size / array_distinct), no shuffle, no Python: at 100 TB
    this is a projection riding whatever scan already runs."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        F.round(n_types / n_tokens, 6).alias("ttr"),
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Fold one BPE merge rule (left,right)→left||right over a symbol
    array, scanning left to right — pure higher-order expression, no
    Python in the loop body."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 12,
    text_col: str = "text",
    checkpoint_every: int = 3,
) -> DataFrame:
    """FULL byte-pair-encoding training (Sennrich-style): greedy merge
    loop over the WORD-FREQUENCY table — ``bpe_pair_counts`` is one
    step of this. The corpus is read once (word counts); every
    iteration then works on the vocabulary-bounded symbol table:
    explode adjacent symbol pairs, pick the most frequent (ties by
    pair text — deterministic), fold the merge back through a
    higher-order array aggregate, re-checkpoint. The only driver
    traffic is ONE argmax row per merge (the k-means-centroid
    pattern); corpus size never touches the loop.

    Output: (step, left, right, merged, pair_n) — the ordered merge
    table a tokenizer ships."""
    from pyspark import StorageLevel  # noqa: F401  (parity with peers)

    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = words.select(
        "freq", F.expr("filter(split(w, ''), s -> s <> '')").alias("syms")
    ).localCheckpoint(eager=True)
    spark = df.sparkSession
    merges = []
    for step in range(1, n_merges + 1):
        pairs = vocab.filter(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("pair_n"))
            .orderBy(F.desc("pair_n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, n = best[0]["l"], best[0]["r"], best[0]["pair_n"]
        merges.append((step, l, r, l + r, int(n)))
        vocab = vocab.withColumn("syms", _apply_merge(F.col("syms"), l, r))
        # checkpoint every few merges, not every one: the vocab table is
        # small but each eager checkpoint is a full scheduler round
        # trip; nesting a few fold expressions between pins costs
        # nothing and halves the job count
        if step % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, pair_n long"
    )


def bpe_encode(
    df: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Apply a TRAINED ordered BPE merge list to the whole corpus — the
    tokenizer-deployment step ``bpe_train`` feeds (train once, encode
    every document). ``merges`` is the ordered list of ``(left,
    right)`` rules (e.g. ``[(r.left, r.right) for r in
    bpe_train(...).collect()]`` — n_merges driver rows, the k-means-
    centroid pattern).

    Each word's character symbols fold through every merge in training
    order with the SAME left-to-right higher-order fold the trainer
    used (``_apply_merge``), so encode(train_corpus) reproduces the
    trainer's final symbol table exactly.

    Scale shape: the fold runs over the DISTINCT-WORD vocabulary only
    (vocabulary-bounded, never the corpus — the trainer's own
    discipline), checkpointed every few merges to bound expression
    depth; the corpus then pays ONE broadcast equi-join of the encoded
    vocabulary onto its word stream plus a doc-grain reassembly
    (sort_array over one document's words, never a corpus sort).

    Output: one row per input document, ``(id, n_words, n_tokens,
    tokens_str)`` — word count, subword-token count, and the full
    space-joined token stream ('' for wordless documents).
    """
    wp = (
        df.select(
            F.col(id_col),
            F.posexplode(tokens(text_col)).alias("__pos0", "w"),
        )
        .filter(F.col("w") != "")
        .select(F.col(id_col), (F.col("__pos0") + 1).alias("__pos"), "w")
    )
    vocab = wp.select("w").distinct().withColumn(
        "__syms", F.expr("filter(split(w, ''), s -> s <> '')")
    )
    for i, (left, right) in enumerate(merges, 1):
        vocab = vocab.withColumn(
            "__syms", _apply_merge(F.col("__syms"), left, right)
        )
        if i % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    joined = wp.join(F.broadcast(vocab), "w")
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("__syms")).alias("n_tokens"),
        F.concat_ws(
            " ",
            F.flatten(
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(__pos AS i, __syms AS s))), x -> x.s)"
                )
            ),
        ).alias("tokens_str"),
    )
    return df.select(F.col(id_col)).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("tokens_str", F.lit("")).alias("tokens_str"),
    )


def with_gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_alpha_frac: float = 0.7,
    min_stopword_hits: int = 2,
    max_ellipsis_line_frac: float = 0.3,
    max_bullet_line_frac: float = 0.9,
    max_symbol_ratio: float = 0.1,
) -> DataFrame:
    """Gopher-style heuristic quality rules (after Rae et al. 2021,
    table A1) as one codegen projection: per-document boolean rule
    columns plus the conjunctive ``gopher_keep`` verdict. The standard
    first-pass web-corpus filter — each rule targets a concrete
    failure mode (boilerplate lists, symbol spam, machine-generated
    ellipsis walls, non-linguistic shards) and the per-rule flags let
    the corpus report show WHICH rule fires, not just how many
    documents die.

    Seven rules, all native expressions over one tokenization and one
    line split — zero shuffles, zero UDFs. DEFAULTS ARE ADAPTED TO
    SHORT SYNTHETIC DOCUMENTS, not the paper's: Gopher uses word count
    50..100k (here 5..100k), mean word length 3..10 (here 2..12), and
    alpha-word fraction ≥0.8 (here ≥0.7); pass the paper's values
    explicitly to reproduce the published filter. (The paper's
    duplicate-line-fraction rule lives separately in the dedup family
    — ``dedup_passages`` / ``dedup_normalized``.)
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_tok1 = F.greatest(n_tok, F.lit(1))
    no_ws = F.regexp_replace(F.col(text_col), r"\s+", "")
    lines = F.split(F.col(text_col), r"\n")
    n_lines1 = F.greatest(F.size(lines), F.lit(1))
    ell_lines = F.size(F.filter(lines, lambda l: l.endswith("...")))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("-")
            | l.startswith("*")
            | l.startswith("•"),
        )
    )
    hash_chars = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit("#"), F.lit(""))
    )
    ell_hits = F.size(F.split(F.col(text_col), r"\.\.\.")) - 1
    alpha_toks = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    mean_wl = F.length(no_ws) / n_tok1
    return (
        df.withColumn(
            "r_token_count", n_tok.between(min_tokens, max_tokens)
        )
        .withColumn(
            "r_mean_word_len",
            mean_wl.between(min_mean_word_len, max_mean_word_len),
        )
        .withColumn(
            "r_alpha_frac", alpha_toks / n_tok1 >= F.lit(min_alpha_frac)
        )
        .withColumn(
            "r_stopwords",
            marker_hits_expr(toks, STOPWORDS) >= F.lit(min_stopword_hits),
        )
        .withColumn(
            "r_ellipsis_lines",
            ell_lines / n_lines1 <= F.lit(max_ellipsis_line_frac),
        )
        .withColumn(
            "r_bullet_lines",
            bullet_lines / n_lines1 <= F.lit(max_bullet_line_frac),
        )
        .withColumn(
            "r_symbol_ratio",
            (hash_chars + ell_hits) / n_tok1 <= F.lit(max_symbol_ratio),
        )
        .withColumn(
            "gopher_keep",
            F.col("r_token_count")
            & F.col("r_mean_word_len")
            & F.col("r_alpha_frac")
            & F.col("r_stopwords")
            & F.col("r_ellipsis_lines")
            & F.col("r_bullet_lines")
            & F.col("r_symbol_ratio"),
        )
    )


def marker_hits_expr(toks_col: Column, words: tuple[str, ...]) -> Column:
    """``marker_hits`` over a Column (not a named column): count of
    tokens in the marker set — higher-order filter, no shuffle."""
    lits = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks_col, lambda w: F.array_contains(lits, w)))


def vocab_coverage(
    df: DataFrame,
    vocab_k: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """Vocabulary coverage / OOV-rate report: build the top-``vocab_k``
    token vocabulary from the corpus itself (count DESC, token ASC —
    a deterministic total order), then measure per-``by``-group what
    fraction of token OCCURRENCES falls outside it. The tokenizer-fit
    question every training pipeline asks before committing a vocab:
    a source whose OOV rate spikes is under-served by the planned
    vocabulary (or isn't the language you think it is).

    Scale shape: token counts are one explode + hash aggregation
    (map-side partial combine does the heavy lifting — the shuffle
    carries distinct tokens, not occurrences); the top-k is a
    ``TakeOrderedAndProject`` (never a global sort) whose k-row result
    BROADCASTS back onto the exploded stream for the coverage pass.
    The corpus is tokenized twice by design: re-running a cheap codegen
    projection beats persisting an |occurrences|-sized intermediate.

    Output one row per group: ``(by, n_docs, total_tokens, oov_tokens,
    oov_rate)``.
    """
    occ = df.select(
        F.col(by).alias("__g"),
        F.col(id_col).alias("__id"),
        F.explode(tokens(text_col)).alias("__tok"),
    )
    vocab = top_k_vocab(df, vocab_k, text_col).select(
        F.col("token").alias("__tok"), F.lit(True).alias("__in_vocab")
    )
    return (
        occ.join(F.broadcast(vocab), "__tok", "left")
        .groupBy(F.col("__g").alias(by))
        .agg(
            F.countDistinct("__id").alias("n_docs"),
            F.count(F.lit(1)).alias("total_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("oov_tokens"),
        )
        .withColumn(
            "oov_rate",
            F.round(
                F.col("oov_tokens")
                / F.greatest(F.col("total_tokens"), F.lit(1)),
                6,
            ),
        )
    )


def top_k_vocab(
    df: DataFrame, k: int, text_col: str = "text"
) -> DataFrame:
    """The corpus's top-``k`` token vocabulary on the deterministic
    (count DESC, token ASC) total order — one explode + hash
    aggregation (map-side combine carries the load; the shuffle moves
    distinct tokens, not occurrences) and a ``TakeOrderedAndProject``
    top-k, never a global sort. Output: ``(token)`` — k rows, sized to
    broadcast or collect; the build-once input to ``vocab_coverage``
    and the streaming OOV monitor."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("token").asc())
        .limit(k)
        .select("token")
    )


def distinct_ngram_diversity(
    df: DataFrame,
    group_col: str | None = None,
    text_col: str = "text",
    max_n: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Distinct-n diversity (the corpus-level distinct-1/2/3 of Li et
    al. 2016): distinct n-grams / total n-grams for n = 1..``max_n``,
    per ``group_col`` (source, model, shard) — the canonical
    mode-collapse / template-flood detector: synthetic or boilerplate
    text repeats n-grams, so its distinct ratios crater long before
    exact dedup fires.

    Scale shape: one exploded (group, n, gram) aggregation per n,
    unioned — each is the ``tfidf`` vocabulary-grain shape (md5-ish
    uniform keys, no skew); totals and distincts are exact longs from
    the SAME aggregation (count + count of first-occurrence rows),
    one final division.

    Output: one row per (group, n): ``(group, n, total_ngrams,
    distinct_ngrams, distinct_ratio)`` — groups with no n-gram of
    order n (all docs shorter than n) are absent.
    """
    g = (
        F.col(group_col).cast("string")
        if group_col
        else F.lit("all")
    )
    toks = df.select(
        g.alias("__g"), tokens(text_col).alias("__t")
    ).filter(F.size("__t") > 0)
    frames = []
    for n in range(1, max_n + 1):
        # docs shorter than n are filtered BEFORE the sequence —
        # sequence(0, negative) would generate a DESCENDING range
        grams = toks.filter(F.size("__t") >= n).select(
            "__g",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), F.size("__t") - F.lit(n)
                    ),
                    lambda i: F.concat_ws(
                        " ", F.slice("__t", i + 1, n)
                    ),
                )
            ).alias("__gram"),
        )
        per = grams.groupBy("__g", "__gram").agg(
            F.count(F.lit(1)).alias("__c")
        )
        frames.append(
            per.groupBy("__g").agg(
                F.lit(n).cast("long").alias("n"),
                F.sum("__c").alias("total_ngrams"),
                F.count(F.lit(1)).alias("distinct_ngrams"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        F.col("__g").alias(group_col if group_col else "group"),
        "n",
        F.col("total_ngrams").cast("long").alias("total_ngrams"),
        F.col("distinct_ngrams").cast("long").alias(
            "distinct_ngrams"
        ),
        F.round(
            F.col("distinct_ngrams").cast("double")
            / F.col("total_ngrams").cast("double"),
            round_dp,
        ).alias("distinct_ratio"),
    )


def distinct_ngram_diversity_approx(
    df: DataFrame,
    group_col: str | None = None,
    text_col: str = "text",
    max_n: int = 3,
    rsd: float = 0.02,
    round_dp: int = 6,
) -> DataFrame:
    """``distinct_ngram_diversity`` at scale: the distinct count comes
    from ``approx_count_distinct`` (HLL++) over the xxhash64 of each
    n-gram instead of an exact vocabulary-grain groupBy.

    Scale shape: ZERO vocabulary-grain shuffles AND a single corpus
    explode — positions explode ONCE (the exact path explodes per n)
    and every order's gram is hashed straight off the token-array
    slice (``xxhash64(slice)``, no gram STRING is ever built — the
    concat was the exact path's CPU bottleneck, not the shuffle).
    One map-combined aggregation then carries ``max_n`` HLL++
    sketches + exact counts per group: each map task ships one
    sketch row per group and the wire carries #groups·#map-tasks
    sketches instead of every distinct n-gram. ``total_ngrams``
    stays an exact long. The estimate is relative-error-bounded by
    ``rsd`` (HLL++ standard error); the agreement bound is pinned by
    tests and the 100M-token smoke.

    Output: one row per (group, n): ``(group, n, total_ngrams,
    distinct_ngrams_approx, distinct_ratio_approx)`` — (group, n)
    pairs with no n-gram of order n (all docs shorter than n) are
    absent, matching the exact operator.
    """
    g = (
        F.col(group_col).cast("string")
        if group_col
        else F.lit("all")
    )
    toks = df.select(
        g.alias("__g"), tokens(text_col).alias("__t")
    ).filter(F.size("__t") > 0)
    # one row per token POSITION; order-n grams exist at positions
    # i <= size - n, hashed off the array slice (NULL otherwise —
    # both count() and the HLL skip NULLs)
    pos = toks.select(
        "__g",
        F.size("__t").alias("__len"),
        F.explode(
            F.sequence(F.lit(0), F.size("__t") - F.lit(1))
        ).alias("__i"),
        F.col("__t"),
    )
    per_n = [
        F.when(
            F.col("__i") <= F.col("__len") - n,
            F.xxhash64(F.slice("__t", F.col("__i") + 1, n)),
        ).alias(f"__h{n}")
        for n in range(1, max_n + 1)
    ]
    hashed = pos.select("__g", *per_n)
    agg = hashed.groupBy("__g").agg(
        *[
            c
            for n in range(1, max_n + 1)
            for c in (
                F.count(F.col(f"__h{n}")).alias(f"__tot{n}"),
                F.approx_count_distinct(f"__h{n}", rsd).alias(
                    f"__d{n}"
                ),
            )
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(n).cast("long").alias("n"),
                F.col(f"__tot{n}").cast("long").alias("total_ngrams"),
                F.col(f"__d{n}")
                .cast("long")
                .alias("distinct_ngrams_approx"),
            )
            for n in range(1, max_n + 1)
        ]
    )
    return (
        agg.select("__g", F.explode(rows).alias("__r"))
        .filter(F.col("__r.total_ngrams") > 0)
        .select(
            F.col("__g").alias(group_col if group_col else "group"),
            F.col("__r.n").alias("n"),
            F.col("__r.total_ngrams").alias("total_ngrams"),
            F.col("__r.distinct_ngrams_approx").alias(
                "distinct_ngrams_approx"
            ),
            F.round(
                F.col("__r.distinct_ngrams_approx").cast("double")
                / F.col("__r.total_ngrams").cast("double"),
                round_dp,
            ).alias("distinct_ratio_approx"),
        )
    )


def heaps_law_fit(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    round_dp: int = 4,
) -> DataFrame:
    """Heaps'-law fit across corpus slices: OLS of ln(V) on ln(N)
    over the per-``group_col`` (token count, vocabulary size) points
    — natural text grows vocabulary as ``V ≈ k·N^β`` with β ≈
    0.4-0.6; a β near 0 flags a closed template vocabulary, near 1
    near-random strings. The growth-curve companion to
    ``zipf_slope`` (same OLS discipline) and
    ``vocab_richness_report`` (which prices ONE slice's tail).

    Scale shape: one exploded-token (group, term) aggregation →
    per-group exact (N, V) integers — a |groups|-bounded frame — then
    the four quantized OLS sums fold over it (1e-6 grid, order-free).

    Output one row: ``(n_groups, beta, ln_k, r2)`` — NULL fit when
    fewer than 2 groups or zero variance in ln(N).
    """
    toks = df.select(
        F.col(group_col).cast("string").alias("__g"),
        F.explode(tokens(text_col)).alias("__term"),
    ).filter(F.col("__term") != "")
    per_g = (
        toks.groupBy("__g", "__term")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("__g")
        .agg(
            F.sum("__c").alias("__n"),
            F.count(F.lit(1)).alias("__v"),
        )
    )
    q = lambda x: (  # noqa: E731
        F.floor(x * 1_000_000.0 + 0.5).cast("decimal(38,0)")
    )
    lx = F.log(F.col("__n").cast("double"))
    ly = F.log(F.col("__v").cast("double"))
    agg = per_g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(q(lx)).alias("__sx"),
        F.sum(q(ly)).alias("__sy"),
        F.sum(q(lx * ly)).alias("__sxy"),
        F.sum(q(lx * lx)).alias("__sxx"),
        F.sum(q(ly * ly)).alias("__syy"),
    )
    m = F.col("n_groups").cast("double")
    sx = F.col("__sx").cast("double") / 1e6
    sy = F.col("__sy").cast("double") / 1e6
    sxy = F.col("__sxy").cast("double") / 1e6
    sxx = F.col("__sxx").cast("double") / 1e6
    syy = F.col("__syy").cast("double") / 1e6
    cov = sxy - sx * sy / m
    varx = sxx - sx * sx / m
    vary = syy - sy * sy / m
    ok = (F.col("n_groups") >= 2) & (varx > 0)
    beta = cov / varx
    return agg.select(
        F.col("n_groups").cast("long").alias("n_groups"),
        F.round(F.when(ok, beta), round_dp).alias("beta"),
        F.round(F.when(ok, (sy - beta * sx) / m), round_dp).alias(
            "ln_k"
        ),
        F.round(
            F.when(ok & (vary > 0), cov * cov / (varx * vary)),
            round_dp,
        ).alias("r2"),
    )


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
    round_dp: int = 4,
) -> DataFrame:
    """Zipf rank–frequency fit: OLS of ln(freq) on ln(rank) over the
    term dictionary — natural corpora slope ≈ −1; a much flatter
    slope flags synthetic/template text, a much steeper one a
    degenerate vocabulary. The distributional companion to
    ``vocab_richness_report`` (which prices the tail mass; this
    prices the SHAPE).

    Scale shape: one exploded-token aggregation to the term grain,
    ranks from ``scale.global_rank`` (freq DESC, term ASC — a total
    order; range exchange, never a single-partition sort), then one
    map-combined aggregation of the four OLS sums. Each term's
    ln(rank)/ln(freq) quantize to the 1e-6 integer grid before
    summing (order-free exact decimals); ln is the one
    transcendental, tolerated under the coarse ``round_dp`` output
    round (slope to 4dp).

    Output one row: ``(vocab_size, n_tokens, slope, intercept,
    r2)`` — NULL fit when fewer than 2 distinct (rank, freq) points
    or zero variance.
    """
    from icnarc_to_philips_linkage_spark.operators.scale import (
        global_rank,
    )

    toks = df.select(F.explode(tokens(text_col)).alias("term")).filter(
        F.col("term") != ""
    )
    per_term = toks.groupBy("term").agg(F.count("*").alias("freq"))
    if min_freq > 1:
        per_term = per_term.filter(F.col("freq") >= min_freq)
    ranked = global_rank(
        per_term.select(
            (-F.col("freq")).alias("__negf"), "term", "freq"
        ),
        ["__negf", "term"],
        rank_col="rank",
    )
    q = lambda x: (  # noqa: E731  1e-6 grid, order-free exact sums
        F.floor(x * 1_000_000.0 + 0.5).cast("decimal(38,0)")
    )
    lx = F.log(F.col("rank").cast("double"))
    ly = F.log(F.col("freq").cast("double"))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("freq").alias("n_tokens"),
        F.sum(q(lx)).alias("__sx"),
        F.sum(q(ly)).alias("__sy"),
        F.sum(q(lx * ly)).alias("__sxy"),
        F.sum(q(lx * lx)).alias("__sxx"),
        F.sum(q(ly * ly)).alias("__syy"),
    )
    v = F.col("vocab_size").cast("double")
    sx = F.col("__sx").cast("double") / 1e6
    sy = F.col("__sy").cast("double") / 1e6
    sxy = F.col("__sxy").cast("double") / 1e6
    sxx = F.col("__sxx").cast("double") / 1e6
    syy = F.col("__syy").cast("double") / 1e6
    cov = sxy - sx * sy / v
    varx = sxx - sx * sx / v
    vary = syy - sy * sy / v
    ok = (F.col("vocab_size") >= 2) & (varx > 0)
    slope = cov / varx
    return agg.select(
        F.col("vocab_size").cast("long").alias("vocab_size"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.when(ok, slope), round_dp).alias("slope"),
        F.round(
            F.when(ok, (sy - slope * sx) / v), round_dp
        ).alias("intercept"),
        F.round(
            F.when(
                ok & (vary > 0), cov * cov / (varx * vary)
            ).otherwise(F.when(ok, F.lit(None))),
            round_dp,
        ).alias("r2"),
    )


def vocab_richness_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Species-richness estimates of the corpus vocabulary — "how much
    vocabulary have we NOT seen yet" for crawl-coverage decisions:
    the bias-corrected Chao1 lower bound on true vocabulary size
    (Chao 1984, ``V + f₁(f₁−1)/(2(f₂+1))`` — defined even with no
    doubletons) and the Good-Turing unseen-mass estimate (Good 1953,
    ``P(next token is a new type) ≈ f₁/N``), from the hapax/dis
    counts ``corpus_stats`` already surfaces individually.

    Scale shape: one exploded-token aggregation to the term
    dictionary (md5-uniform key space), then a single-row conditional
    reduce — the frequency-of-frequencies never materializes beyond
    two conditional counts. All integers until the two final
    divisions.

    Output one row: ``(n_tokens, vocab_size, f1_singletons,
    f2_doubletons, chao1_estimate, unseen_mass, coverage)``.
    """
    toks = df.select(F.explode(tokens(text_col)).alias("term")).filter(
        F.col("term") != ""
    )
    per_term = toks.groupBy("term").agg(F.count("*").alias("c"))
    agg = per_term.agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("vocab_size"),
        F.count_if(F.col("c") == 1).alias("f1_singletons"),
        F.count_if(F.col("c") == 2).alias("f2_doubletons"),
    )
    f1 = F.col("f1_singletons").cast("double")
    f2 = F.col("f2_doubletons").cast("double")
    n = F.col("n_tokens").cast("double")
    return agg.select(
        "n_tokens",
        "vocab_size",
        "f1_singletons",
        "f2_doubletons",
        F.round(
            F.col("vocab_size").cast("double")
            + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0)),
            6,
        ).alias("chao1_estimate"),
        F.round(f1 / n, 9).alias("unseen_mass"),
        F.round(1.0 - f1 / n, 9).alias("coverage"),
    )
