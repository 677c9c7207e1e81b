"""PII scrubbing for training-data pipelines: regex redaction of
emails, phone numbers, and long ID-like digit runs, with per-document
redaction counts.

Pure native column expressions (``regexp_count`` + ``regexp_replace``
chains) — zero Python in the hot path, so scrubbing is a map-side
projection that scales with input bytes and pushes through whole-stage
codegen. Patterns are deliberately engine-portable (shared by Java
regex and RE2, so the DuckDB oracle runs the identical spec): a real
deployment extends ``PII_PATTERNS`` with locale-specific rules; the
operator shape does not change.

Pattern order matters and is part of the contract: emails are redacted
before digit rules so an address's digits are never double-counted as
an ID; each kind's count is taken on the text state its replacement
sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"),
    ("long_id", r"\b\d{8,}\b"),
)


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
    out_col: str | None = None,
) -> DataFrame:
    """Redact every pattern match to ``[KIND]`` and append an
    ``n_<kind>`` count column per pattern. Counts are evaluated on the
    text as previous patterns left it (sequential semantics), so a
    span consumed by an earlier rule is never recounted by a later
    one. NULL text yields NULL counts and NULL output (unknown in,
    unknown out).

    With the default ``out_col`` (None) the text column is replaced in
    place; naming a DIFFERENT ``out_col`` keeps the original text
    column alongside the scrubbed one (the audit/diff shape)."""
    out_col = out_col or text_col
    if out_col != text_col and out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} collides with an existing column")
    cur = F.col(text_col)
    counts = []
    for kind, pat in patterns:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, f"[{kind.upper()}]")
    others = [c for c in df.columns if c != text_col or out_col != text_col]
    return df.select(*others, *counts, cur.alias(out_col))


def _word_pattern(word: str) -> str:
    """Literal-word regex with edge-aware boundaries: the word is
    escaped (curated lists contain things like 'c++' and 'a.b', whose
    metacharacters must match literally), and ``\\b`` is applied only
    on sides that END in a word character — ``\\b`` between '+' and a
    space never matches, so 'c++' would otherwise be undetectable."""
    import re

    core = re.escape(word)
    pre = r"\b" if re.match(r"\w", word[:1] or " ") else ""
    post = r"\b" if re.match(r"\w", word[-1:] or " ") else ""
    return f"{pre}{core}{post}"


# toy category lexicons — a real deployment swaps in curated lists
# (the operator shape, counts-then-decide, is unchanged)
BLOCKLIST_CATEGORIES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("profanity", ("badword", "explicit", "obscene")),
    ("violence", ("attack", "weapon", "assault")),
    ("spamlike", ("viagra", "lottery", "clickbait")),
)


def blocklist_filter(
    df: DataFrame,
    text_col: str = "text",
    categories: tuple[tuple[str, tuple[str, ...]], ...] = BLOCKLIST_CATEGORIES,
    max_hits_per_1k_tokens: float = 5.0,
) -> DataFrame:
    """Safety/content filtering: per-category blocklist hit counts plus
    a keep/drop decision — the counts-then-threshold content screen
    every public training corpus applies (C4's badword filter is this
    op with a bigger lexicon).

    Decision rule: RATE-based, not absolute — hits are normalized per
    1000 whitespace tokens so long documents are not penalized for
    length, matching C4-style practice; a document with zero tokens
    and zero hits keeps. Word-boundary token matching (``\\b...\\b``),
    case-insensitive, counts evaluated per category on the ORIGINAL
    text (unlike PII's sequential redaction, categories here are
    independent signals).

    Pure map-side projection: one regexp_count per category + one
    token count. Output: input columns + n_<category> per category,
    n_tokens, hit_rate_per_1k, kept.
    """
    from icnarc_to_philips_linkage_spark.operators.text import token_count

    t = F.lower(F.col(text_col))
    counts = []
    total = F.lit(0)
    for cat, words in categories:
        pat = "(" + "|".join(_word_pattern(w) for w in words) + ")"
        c = F.regexp_count(t, F.lit(pat))
        counts.append(c.alias(f"n_{cat}"))
        total = total + c
    n_tok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(token_count(text_col))
    rate = F.round(
        total * 1000.0 / F.greatest(n_tok, F.lit(1)), 6
    )
    return df.select(
        *df.columns,
        *counts,
        n_tok.alias("n_tokens"),
        rate.alias("hit_rate_per_1k"),
        (rate <= max_hits_per_1k_tokens).alias("kept"),
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 10,
    l: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier (QI)
    combination (Sweeney 2002; Machanavajjhala et al. 2007) — the
    release-safety check a training-data pipeline runs BEFORE shipping
    a table whose column combination could re-identify people: a row
    is k-anonymous when at least ``k − 1`` other rows share its QI
    tuple, and a QI group is l-diverse when its sensitive attribute
    takes ≥ ``l`` distinct values (otherwise membership alone leaks
    the sensitive value even at high k).

    One aggregation keyed on the QI tuple (group count + exact
    distinct sensitive values per group — the grain is the QI
    cardinality, bounded by the product of QI domains, NOT the row
    count), so at 100 TB this is a single map-combined shuffle on the
    QI key. Rows with a NULL QI component form their own groups (NULL
    is a value an attacker sees too) via null-safe grouping; NULL
    sensitive values are not counted toward diversity.

    Output per QI group: the QI columns, ``group_size``,
    ``n_sensitive``, and the two violation flags.
    """
    if not qi_cols:
        raise ValueError("k_anonymity_report needs ≥ 1 QI column")
    out = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
    )
    return out.select(
        *qi_cols,
        "group_size",
        "n_sensitive",
        (F.col("group_size") < k).alias("k_violation"),
        (F.col("n_sensitive") < l).alias("l_violation"),
    )


def t_closeness_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    t: float = 0.3,
    round_dp: int = 6,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    distributional upgrade over l-diversity: a QI group leaks when its
    sensitive-value DISTRIBUTION strays from the table-wide one, even
    if it is technically diverse. For categorical sensitive values
    the variational distance is ``d(g) = ½·Σ_s |p_g(s) − p(s)|``,
    computed here as EXACT integer cross-products:
    ``Σ_s |n_gs·N − n_s·N_g|`` over observed pairs plus the
    unobserved-value mass ``(N − Σ_{s∈g} n_s)·N_g``, divided once by
    ``2·N_g·N`` — bit-reproducible, no per-term float sums.

    Scale shape: one (QI, sensitive) aggregation (grain = QI × value
    domains, bounded), the global value marginals broadcast back, one
    QI-grain reduce. Output per QI group: the QI columns,
    ``group_size``, ``t_distance``, ``t_violation``.
    """
    if not qi_cols:
        raise ValueError("t_closeness_report needs ≥ 1 QI column")
    base = df.filter(F.col(sensitive_col).isNotNull()).select(
        *[F.col(c) for c in qi_cols],
        F.col(sensitive_col).alias("__s"),
    )
    grp = base.groupBy(*qi_cols, "__s").agg(
        F.count(F.lit(1)).alias("__ngs")
    )
    glob = base.groupBy("__s").agg(F.count(F.lit(1)).alias("__ns"))
    tot = base.agg(F.count(F.lit(1)).alias("__n"))
    gtot = grp.groupBy(*qi_cols).agg(F.sum("__ngs").alias("__ng"))
    joined = (
        grp.join(F.broadcast(glob), "__s")
        .join(F.broadcast(gtot), qi_cols)
        .crossJoin(F.broadcast(tot))
    )
    # observed-pair terms |n_gs*N - n_s*N_g| as exact integers, plus
    # the observed n_s running total (to back out the unobserved mass)
    per_g = joined.groupBy(*qi_cols).agg(
        F.first("__ng").alias("__ng"),
        F.first("__n").alias("__n"),
        F.sum(
            F.abs(
                F.col("__ngs").cast("decimal(38,0)") * F.col("__n")
                - F.col("__ns").cast("decimal(38,0)") * F.col("__ng")
            )
        ).alias("__obs"),
        F.sum("__ns").alias("__ns_seen"),
    )
    t_num = F.col("__obs") + (
        F.col("__n").cast("decimal(38,0)") - F.col("__ns_seen")
    ) * F.col("__ng")
    t_dist = F.round(
        t_num.cast("double")
        / (F.lit(2.0) * F.col("__ng") * F.col("__n")),
        round_dp,
    )
    return per_g.select(
        *qi_cols,
        F.col("__ng").alias("group_size"),
        t_dist.alias("t_distance"),
        (t_dist > F.lit(float(t))).alias("t_violation"),
    )
