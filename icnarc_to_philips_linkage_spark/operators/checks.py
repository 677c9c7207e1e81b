"""Declarative data-quality expectations — a Deequ-style constraint
report computed in ONE pass over the table.

An expectation is (name, predicate Column): rows violating the
predicate count against it. ``check_report`` evaluates every
expectation as a conditional count inside a single aggregate — no per
constraint scan, no collect — and appends the row total, so the report
is one row regardless of table size and constraint count: the shape a
100 TB nightly quality gate needs. ``violating_rows`` pulls sample rows
for one failing expectation (bounded by limit) for triage.

Constraint helpers cover the reference pipeline's recurring checks
(SURVEY §2.4's completeness/uniqueness profiling recast as gates):
not-null, value range, regex form, set membership. Uniqueness needs a
groupBy (it is not a per-row predicate) and is provided separately as
``uniqueness_violations``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"{col}_not_null", F.col(col).isNotNull()


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    """NULLs pass (compose with not_null to also require presence)."""
    c = F.col(col)
    return f"{col}_in_range", c.isNull() | ((c >= lo) & (c <= hi))


def matches(col: str, pattern: str) -> tuple[str, Column]:
    """Full-string regex form check; NULLs pass."""
    c = F.col(col)
    return f"{col}_matches", c.isNull() | c.rlike(f"^(?:{pattern})$")


def isin(col: str, values: Sequence) -> tuple[str, Column]:
    c = F.col(col)
    return f"{col}_isin", c.isNull() | c.isin(list(values))


def _expectation_aggs(
    expectations: Sequence[tuple[str, Column]],
) -> list[Column]:
    """Shared aggregate list for the global and grouped reports — one
    definition of violation-count semantics."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in expectations:
        aggs.append(F.count(F.when(~pred, 1)).alias(f"viol_{name}"))
    return aggs


def check_report(
    df: DataFrame, expectations: Sequence[tuple[str, Column]]
) -> DataFrame:
    """One row: n_rows plus a violation count per expectation — a
    single aggregate, map-side partial, constant-size output."""
    return df.agg(*_expectation_aggs(expectations))


def violating_rows(
    df: DataFrame, expectation: tuple[str, Column], limit: int = 100
) -> DataFrame:
    """Sample rows violating one expectation (triage; bounded)."""
    _, pred = expectation
    return df.filter(~pred).limit(limit)


def uniqueness_violations(
    df: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """(keys..., n) for key combinations appearing more than once — the
    uniqueness gate as a groupBy (uniqueness is a set property, not a
    per-row predicate). Empty result = constraint holds."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def split_leakage_report(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    fractions: dict[str, float] | None = None,
    salt: str = "split",
):
    """Train/test contamination check: after a hash split, does any
    CONTENT digest appear in more than one split? Splitting by id is
    leakproof only if content is unique per id — duplicated documents
    land in different splits and leak evaluation data into training
    (the reason dedup must precede splitting; this is the expectation
    that enforces the ordering).

    One digest projection + one digest-grain agg (countDistinct over
    the ≤|splits| labels per digest — bounded). Output: one row
    (n_docs, n_digests, n_leaked_digests, n_leaked_docs,
    leaked_doc_frac)."""
    from pyspark.sql import functions as F

    from icnarc_to_philips_linkage_spark.operators.sampling import hash_split

    fractions = fractions or {"train": 0.8, "test": 0.2}
    # NULL text is excluded: md5(NULL) = NULL would collapse every
    # NULL-text doc into ONE phantom digest and report contamination
    # on corpora with no duplicated content
    labeled = (
        hash_split(df, id_col, fractions, salt=salt)
        .filter(F.col("split").isNotNull())
        .filter(F.col(text_col).isNotNull())
    )
    per_digest = (
        labeled.select(
            F.md5(F.col(text_col)).alias("dg"), F.col("split")
        )
        .groupBy("dg")
        .agg(
            F.countDistinct("split").alias("n_splits"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    return per_digest.agg(
        F.sum("n_docs").alias("n_docs"),
        F.count(F.lit(1)).alias("n_digests"),
        F.count(F.when(F.col("n_splits") > 1, F.lit(1))).alias(
            "n_leaked_digests"
        ),
        F.coalesce(
            F.sum(F.when(F.col("n_splits") > 1, F.col("n_docs"))), F.lit(0)
        ).alias("n_leaked_docs"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("n_splits") > 1, F.col("n_docs"))),
                F.lit(0),
            )
            / F.sum("n_docs"),
            6,
        ).alias("leaked_doc_frac"),
    )


def observed_filter(
    df,
    keep,
    observation_name: str = "filter_metrics",
):
    """Filter with ONE-PASS observability: attach Spark's ``observe``
    metrics (rows seen / rows kept / kept fraction) to the filtering
    scan itself, so the pipeline run that produces the output ALSO
    produces its own audit numbers — no second scan, no separate
    count() jobs (at 100 TB a post-hoc "how many did we drop?" count
    re-reads the corpus).

    Returns (filtered_df, observation). After ANY action on a frame
    derived from filtered_df, ``observation.get`` yields
    {'n_seen', 'n_kept', 'kept_frac'}. ``keep`` must be deterministic —
    the observation reflects the rows of the action that materialized
    them.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(observation_name)
    kept_i = F.when(keep, 1).otherwise(0)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_seen"),
        F.sum(kept_i).alias("n_kept"),
        F.round(F.sum(kept_i) / F.count(F.lit(1)), 6).alias("kept_frac"),
    )
    return observed.filter(keep), obs


def check_report_grouped(
    df: DataFrame,
    group_col: str,
    expectations: Sequence[tuple[str, Column]],
) -> DataFrame:
    """Per-group expectation report — the multi-tenant/per-source form
    of ``check_report``: one row PER GROUP with its row total and
    violation counts, so a bad upstream feed is localized to its
    source instead of drowning in the corpus-wide totals. Same single
    aggregation (now keyed), map-side partials, |groups| rows out."""
    return df.groupBy(group_col).agg(*_expectation_aggs(expectations))


def referential_integrity_report(
    links: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key orphan audit: for each (name, child, child_key,
    parent, parent_key) link, count child rows whose key has no parent
    — the join-correctness precondition every star-schema pipeline
    gates on. Each link is one LEFT ANTI join aggregated to a single
    row; NULL child keys are reported separately (they are not orphans
    — they never join — but silently high null rates break facts the
    same way). Output per link: (fk_name, n_child, n_null_keys,
    n_orphans, ok)."""
    if not links:
        raise ValueError(
            "referential_integrity_report needs at least one "
            "(name, child, child_key, parent, parent_key) link"
        )
    reports = []
    for name, child, child_key, parent, parent_key in links:
        keys = child.select(F.col(child_key).alias("__k"))
        n_child = keys.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.col("__k").isNull().cast("long")).alias("n_null_keys"),
        )
        orphans = (
            keys.filter(F.col("__k").isNotNull())
            .join(
                parent.select(F.col(parent_key).alias("__k")),
                "__k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        reports.append(
            n_child.crossJoin(orphans).select(
                F.lit(name).alias("fk_name"),
                "n_child",
                "n_null_keys",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
