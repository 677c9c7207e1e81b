"""ID-cleaning operators — the reference pipeline's first stage
(SURVEY.md §2 ops J1, J7, E1, E2, P1, P2, E16, F1).

Reference: clean_encounterids.py:31-84. The reference implements the
corrections as row-wise Python loops and chained pandas mutations; here
each clean is a single lazy DataFrame expression: filter → broadcast
left join against the (tiny) known-errors dimension → coalesce. At
scale the error dims are broadcast (≤ thousands of rows), so cleaning
adds zero shuffles to the pipeline.

Known reference bugs (SURVEY §2.3 J7, §7) are NOT replicated by
default: ``strict_parity=True`` reproduces the buggy observable
behavior where computable and is documented per-function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CARDIAC_UNIT_ID = 14  # Unit ID 14 = CICU, excluded (clean_encounterids.py:37)
EXCLUDED_CLINICAL_UNIT = 8.0  # clean_encounterids.py:68


def clean_icnarc_cis_ids(
    icnarc: DataFrame,
    ww_errors: DataFrame,
    strict_parity: bool = False,
) -> DataFrame:
    """Clean the ICNARC-side link keys (clean_encounterids.py:31-53).

    - F1: drop cardiac-unit rows (``Unit ID != 14``) from both inputs.
    - P1: keep the original key as ``CIS Patient ID Original``.
    - J7: apply corrections from the WW issue sheet via broadcast left
      join + coalesce.

    ``strict_parity=True`` reproduces the reference bug at
    clean_encounterids.py:44-48 — membership is tested against the
    pandas Series *index* (0..n-1), not its values, so corrections
    (whose ICNARC numbers are large) effectively never fire; parity mode
    therefore skips the correction join entirely.
    """
    base = (
        icnarc.filter(F.col("`Unit ID`") != CARDIAC_UNIT_ID)
        .withColumnRenamed("CIS Patient ID", "CIS Patient ID Original")
    )
    if strict_parity:
        return base.withColumn(
            "CIS Patient ID", F.col("`CIS Patient ID Original`")
        )
    corrections = (
        ww_errors.filter(F.col("`Unit ID`") != CARDIAC_UNIT_ID)
        .select(
            F.col("`ICNARC Number`").alias("ICNARC number"),
            F.col("`Corrected encID`"),
        )
    )
    return (
        base.join(F.broadcast(corrections), on="ICNARC number", how="left")
        .withColumn(
            "CIS Patient ID",
            F.coalesce("`Corrected encID`", "`CIS Patient ID Original`"),
        )
        .drop("Corrected encID")
    )


def clean_philips_encounterids(
    philips: DataFrame, enc_errors: DataFrame
) -> DataFrame:
    """Clean the Philips-side encounter ids (clean_encounterids.py:55-84).

    P1 rename encounterId → encounterId_original; J1 broadcast left join
    of the issue-list sheet (rows with clinicalUnitId == 8.0 excluded,
    F1); E1 coalesce adjusted→original; E2 null explanation → 'NA' as
    ``error_type``; P2 drop helper columns; E16 cast the final id to
    long."""
    errors = enc_errors.filter(
        (F.col("clinicalUnitId").isNull())
        | (F.col("clinicalUnitId") != EXCLUDED_CLINICAL_UNIT)
    ).select(
        F.col("encounterId_CIS").alias("encounterId_original"),
        "encounterId_Adjusted",
        "Explanation",
    )
    return (
        philips.withColumnRenamed("encounterId", "encounterId_original")
        .join(F.broadcast(errors), on="encounterId_original", how="left")
        .withColumn(
            "encounterId",
            F.coalesce("encounterId_Adjusted", "encounterId_original").cast(
                "long"
            ),
        )
        .withColumn("error_type", F.coalesce("Explanation", F.lit("NA")))
        .drop("encounterId_Adjusted", "Explanation")
    )


def validation_report(
    icnarc: DataFrame, philips: DataFrame, linked: DataFrame
) -> DataFrame:
    """QA aggregates of the reference's ``validation()``
    (clean_encounterids.py:97-120) as one result row instead of prints:
    row counts per side, distinct link keys, missing-key counts, and the
    join row count. Side-effect-free."""
    i = icnarc.agg(
        F.count(F.lit(1)).alias("icnarc_rows"),
        F.countDistinct("`CIS Patient ID`").alias("icnarc_distinct_keys"),
        F.count(F.when(F.col("`CIS Patient ID`").isNull(), 1)).alias(
            "icnarc_null_keys"
        ),
    )
    p = philips.agg(
        F.count(F.lit(1)).alias("philips_rows"),
        F.countDistinct("encounterId").alias("philips_distinct_keys"),
    )
    j = linked.agg(F.count(F.lit(1)).alias("linked_rows"))
    return i.crossJoin(p).crossJoin(j)
