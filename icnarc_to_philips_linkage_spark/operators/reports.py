"""Cohort summary reports (SURVEY.md §2.10 UD3) — the reference's
``print_philips_summary`` / ``print_icnarc_summary`` / ``df_summary``
(clean_encounterids.py:20-28, 202-245) as side-effect-free queries.

Each report is ONE aggregation pass returning a single-row DataFrame
(the reference made several passes and printed). Percentiles are exact
(np.percentile parity); at 100 TB swap ``percentile`` for
``percentile_approx`` via the ``approx`` flag — the only semantic
change is documented sketch error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pctls(col: str, approx: bool) -> F.Column:
    if approx:
        return F.percentile_approx(col, [0.25, 0.5, 0.75], 10000)
    return F.expr(f"percentile(`{col}`, array(0.25D, 0.5D, 0.75D))")


def philips_summary(df: DataFrame, approx: bool = False) -> DataFrame:
    """Age/LOS median+IQR, gender counts and rates, missing-gender rate
    (clean_encounterids.py:202-218). LOS reported in days (E12)."""
    los_days = (F.col("`lengthOfStay (mins)`") / 1440.0).alias("_los_days")
    out = df.select(
        "age", "gender", los_days
    ).agg(
        F.count(F.lit(1)).alias("n_stays"),
        _pctls("age", approx).alias("_age_p"),
        _pctls("_los_days", approx).alias("_los_p"),
        F.count(F.when(F.col("gender") == "Male", 1)).alias("n_male"),
        F.count(F.when(F.col("gender").isNull(), 1)).alias("n_gender_missing"),
    )
    return out.select(
        "n_stays",
        F.element_at("_age_p", 2).alias("age_median"),
        F.element_at("_age_p", 1).alias("age_p25"),
        F.element_at("_age_p", 3).alias("age_p75"),
        F.element_at("_los_p", 2).alias("los_days_median"),
        F.element_at("_los_p", 1).alias("los_days_p25"),
        F.element_at("_los_p", 3).alias("los_days_p75"),
        "n_male",
        (F.col("n_male") / F.col("n_stays")).alias("male_rate"),
        "n_gender_missing",
        (F.col("n_gender_missing") / F.col("n_stays")).alias(
            "gender_missing_rate"
        ),
    )


def icnarc_summary(df: DataFrame, approx: bool = False) -> DataFrame:
    """The ICNARC-side twin (clean_encounterids.py:226-245): trusted
    age/LOS distributions, sex rate, readmission rate. Cross-source
    concordance = compare this row with ``philips_summary``'s row."""
    los_days = (F.col("icnarc_los") / 1440.0).alias("_los_days")
    out = df.select(
        "icnarc_age",
        "icnarc_gender",
        F.col("`Readmission during this hospital stay`").alias("_readm"),
        los_days,
    ).agg(
        F.count(F.lit(1)).alias("n_stays"),
        _pctls("icnarc_age", approx).alias("_age_p"),
        _pctls("_los_days", approx).alias("_los_p"),
        F.count(F.when(F.col("icnarc_gender") == "Male", 1)).alias("n_male"),
        F.count(F.when(F.col("_readm") == "Yes", 1)).alias("n_readmitted"),
        F.count(F.when(F.col("_readm").isNull(), 1)).alias("n_readm_missing"),
    )
    return out.select(
        "n_stays",
        F.element_at("_age_p", 2).alias("age_median"),
        F.element_at("_age_p", 1).alias("age_p25"),
        F.element_at("_age_p", 3).alias("age_p75"),
        F.element_at("_los_p", 2).alias("los_days_median"),
        F.element_at("_los_p", 1).alias("los_days_p25"),
        F.element_at("_los_p", 3).alias("los_days_p75"),
        (F.col("n_male") / F.col("n_stays")).alias("male_rate"),
        (F.col("n_readmitted") / F.col("n_stays")).alias("readmission_rate"),
        "n_readm_missing",
    )


def df_summary(df: DataFrame) -> DataFrame:
    """``df_summary`` (clean_encounterids.py:20-28): per-column non-null
    and distinct counts in ONE pass (the reference looped per column)."""
    aggs = []
    for c in df.columns:
        aggs.append(F.count(F.col(f"`{c}`")).alias(f"{c}__non_null"))
        aggs.append(F.countDistinct(F.col(f"`{c}`")).alias(f"{c}__distinct"))
    wide = df.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__non_null`, `{c}__distinct`" for c in df.columns
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(df.columns)}, {stack_args}) AS (column, n_non_null, n_distinct)"
        ),
    ).select("column", "n_rows", "n_non_null", "n_distinct")


def corpus_datasheet(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source corpus datasheet — the "data card" table accompanying
    a training-corpus release (composition, language spread, length
    distribution, duplication): one row per source with n_docs,
    n_langs, total/avg/median chars, and the exact duplicate rate
    (1 − distinct content hashes / docs).

    ONE aggregation pass: every column is a per-group aggregate
    (exact median included — swap percentile_approx at corpus scale,
    as in the A8 family), and the duplicate rate rides the same agg as
    a countDistinct over the content digest, so the corpus is scanned
    once."""
    length = F.length(F.col(text_col))
    return (
        docs.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(lang_col).alias("n_langs"),
            F.sum(length).alias("total_chars"),
            F.round(F.avg(length), 6).alias("avg_chars"),
            F.expr(f"percentile(length({text_col}), 0.5)").alias(
                "p50_chars"
            ),
            F.round(
                1
                - F.countDistinct(F.md5(F.col(text_col)))
                / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
    )


def source_overlap_report(
    pairs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "source",
    sim_col: str = "jaccard",
) -> DataFrame:
    """Cross-source duplication matrix: which sources copy from each
    other. ``pairs`` is any near-dup pair table (id_a, id_b, sim) —
    e.g. the MinHash-LSH output; ``labels`` maps id → source. Pairs
    aggregate into unordered source pairs (diagonal = within-source
    duplication), with pair counts and mean similarity.

    At 100 TB the pair table is already the LSH-bucketed candidate
    survivor set (corpus-sublinear), and the label attach is two
    id-keyed joins; the final aggregate has at most |sources|² rows.
    Mean similarity sums exact decimals before one final rounding so
    the report is partition-order independent.

    Output: (source_a, source_b, n_pairs, avg_sim) with
    source_a <= source_b.
    """
    la = labels.select(
        F.col(id_col).alias("id_a"), F.col(label_col).alias("__sa")
    )
    lb = labels.select(
        F.col(id_col).alias("id_b"), F.col(label_col).alias("__sb")
    )
    tagged = pairs.join(la, "id_a").join(lb, "id_b")
    return (
        tagged.select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
            F.col(sim_col).cast("decimal(38,6)").alias("__sim"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum("__sim").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_sim"),
        )
    )
