"""Classifier-evaluation statistics at corpus scale.

A quality filter (``plans/llm.quality_classifier_score``) gates what
enters the training mix; before trusting its threshold on 100 TB you
evaluate it against a labelled slice. This module computes the three
standard evaluation artifacts as exact, deterministic aggregations:

- **ROC AUC** (``roc_auc``): tie-aware Mann-Whitney form. The naive
  definition compares all pos×neg pairs (quadratic); the rank-sum form
  needs only per-distinct-score counts and one cumulative pass.
- **Precision/recall sweep** (``pr_at_thresholds``): confusion counts
  at a caller-fixed threshold grid — one conditional aggregation per
  scan, grid size independent of data size.
- **Calibration bins** (``calibration_bins``): reliability diagram —
  mean predicted probability vs empirical positive rate per equal-width
  bin, plus each bin's ECE contribution.

Scale shape, in order:

- ``roc_auc`` groups by the ROUNDED score (the classifier already
  emits ``p_quality`` on a 1e-6 grid), so the post-aggregation frame
  is bounded by the grid cardinality (≤ 1e6 + 1 rows) no matter how
  many documents scored — the one global ordered pass runs over that
  bounded frame, the same bounded-global-window justification as the
  digit/hour windows elsewhere in the package. Rank arithmetic stays
  in INTEGERS until the final division: with ``c`` = count and ``b`` =
  count of strictly-lower scores at a tied block, the block's average
  rank is ``b + (c+1)/2``, so ``2·rank_sum = pos·(2b + c + 1)`` is
  integral; ``AUC = (2·U) / (2·n_pos·n_neg)`` divides two exact longs,
  making the statistic bit-reproducible across engines and partition
  counts (no float accumulation order to disagree on).
- ``pr_at_thresholds`` and ``calibration_bins`` are single
  ``groupBy`` plans with threshold-grid / bin cardinality, i.e. one
  shuffle of at most ``len(thresholds)`` / ``bins`` rows.

Reference provenance: the reference repo audits its linkage quality
with hand-checked frequency tables (``summarise_icnarc_data.py``'s
rate tables); this module is the scaled generalization — the same
"how good is the decision rule" question, answered with the standard
statistics a corpus-scale pipeline actually monitors.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_dp: int = 9,
) -> DataFrame:
    """Exact tie-aware ROC AUC of ``score_col`` against the boolean
    ``label_col``.

    Mann-Whitney identity: ``AUC = U / (n_pos · n_neg)`` where ``U`` is
    the rank-sum of positive scores (ascending ranks, ties taking the
    block-average rank) minus ``n_pos·(n_pos+1)/2``. Computed from
    per-distinct-score (count, positives) pairs; see the module
    docstring for the integer form and the bounded-frame argument.

    Returns one row: ``n_pos, n_neg, auc`` (AUC rounded to
    ``round_dp``). Rows with a NULL score or label are excluded (they
    have no rank). Degenerate slices (no positives or no negatives)
    return a NULL auc rather than raising — monitoring queries run
    unattended.
    """
    return roc_auc_by(df, score_col, label_col, [], round_dp=round_dp)


def roc_auc_by(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: Sequence[str],
    round_dp: int = 9,
) -> DataFrame:
    """Per-group exact tie-aware ROC AUC — ``roc_auc`` stratified by
    ``group_cols`` (e.g. per-language classifier audit: a filter that
    looks fine globally can be near-random on a minority slice).

    Same shape as the global form: the cumulative rank pass runs per
    group over the per-(group, distinct score) frame, so each window
    partition is bounded by the score grid and group shuffles carry
    only that bounded aggregate. Returns ``(*group_cols, n_pos, n_neg,
    auc)``; groups with one class get a NULL auc.
    """
    gcols = list(group_cols)
    lbl = F.col(label_col).cast("boolean")
    per_score = (
        df.filter(F.col(score_col).isNotNull() & lbl.isNotNull())
        .groupBy(*gcols, F.col(score_col).alias("__s"))
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.sum(lbl.cast("long")).alias("__p"),
        )
    )
    w = (
        (Window.partitionBy(*gcols) if gcols else Window.partitionBy())
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # __b = strictly-lower count; 2·(avg rank of the tied block) =
    # 2·__b + __c + 1, integral by construction
    ranked = per_score.withColumn(
        "__b", F.sum("__c").over(w) - F.col("__c")
    ).withColumn(
        "__rs2", F.col("__p") * (F.lit(2) * F.col("__b") + F.col("__c") + 1)
    )
    return ranked.groupBy(*gcols).agg(
        F.sum("__p").alias("n_pos"),
        (F.sum("__c") - F.sum("__p")).alias("n_neg"),
        F.sum("__rs2").alias("__rs2_tot"),
    ).select(
        *gcols,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                (
                    F.col("__rs2_tot")
                    - F.col("n_pos") * (F.col("n_pos") + 1)
                ).cast("double")
                / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
                round_dp,
            ),
        ).alias("auc"),
    )


def pr_at_thresholds(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: Sequence[float],
    round_dp: int = 6,
) -> DataFrame:
    """Precision / recall / F1 / accuracy at each caller-fixed
    threshold (predict positive iff ``score >= t``).

    One scan: explodes the literal threshold grid against each row's
    (score, label) — the map-side blow-up factor is ``len(thresholds)``
    (a handful), then a single groupBy(threshold) of conditional
    counts. Grid rows with zero predicted positives yield NULL
    precision/F1 (undefined), recall still defined.

    Returns per threshold: ``threshold, tp, fp, fn, tn, precision,
    recall, f1, accuracy`` — ratios rounded to ``round_dp``.
    """
    if not thresholds:
        raise ValueError("thresholds must be a non-empty sequence")
    lbl = F.col(label_col).cast("boolean")
    base = df.filter(
        F.col(score_col).isNotNull() & lbl.isNotNull()
    ).select(
        F.col(score_col).alias("__s"), lbl.alias("__y")
    )
    grid = F.explode(
        F.array(*[F.lit(float(t)) for t in thresholds])
    ).alias("threshold")
    conf = (
        base.select("__s", "__y", grid)
        .groupBy("threshold")
        .agg(
            F.sum(((F.col("__s") >= F.col("threshold")) & F.col("__y"))
                  .cast("long")).alias("tp"),
            F.sum(((F.col("__s") >= F.col("threshold")) & ~F.col("__y"))
                  .cast("long")).alias("fp"),
            F.sum(((F.col("__s") < F.col("threshold")) & F.col("__y"))
                  .cast("long")).alias("fn"),
            F.sum(((F.col("__s") < F.col("threshold")) & ~F.col("__y"))
                  .cast("long")).alias("tn"),
        )
    )
    pred_pos = F.col("tp") + F.col("fp")
    actual_pos = F.col("tp") + F.col("fn")
    prec = F.when(
        pred_pos > 0, F.col("tp").cast("double") / pred_pos
    )
    rec = F.when(
        actual_pos > 0, F.col("tp").cast("double") / actual_pos
    )
    return conf.select(
        "threshold", "tp", "fp", "fn", "tn",
        F.round(prec, round_dp).alias("precision"),
        F.round(rec, round_dp).alias("recall"),
        F.round(
            F.when(
                prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
                F.lit(2.0) * prec * rec / (prec + rec),
            ),
            round_dp,
        ).alias("f1"),
        F.round(
            (F.col("tp") + F.col("tn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
            round_dp,
        ).alias("accuracy"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    bins: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """Reliability-diagram bins over predicted probability in [0, 1]:
    equal-width bins (prob 1.0 clamps into the top bin), per bin the
    document count, mean predicted probability, empirical positive
    rate, and the bin's |gap|·weight contribution to expected
    calibration error. ``sum(ece_contrib)`` over the result IS the ECE.

    Mean predicted probability averages the 6dp-rounded classifier
    output (a fixed decimal grid), summed as ``decimal(38,6)`` so the
    bin mean is partition-order independent before the final rounding.

    Returns per bin: ``bin, n, mean_p, pos_rate, ece_contrib``.
    """
    if bins <= 0:
        raise ValueError("bins must be positive")
    lbl = F.col(label_col).cast("boolean")
    base = df.filter(F.col(prob_col).isNotNull() & lbl.isNotNull())
    bin_idx = F.least(
        F.lit(bins - 1),
        F.floor(F.col(prob_col) * bins).cast("int"),
    )
    n_tot = Window.partitionBy()  # 1-row aggregate broadcast per bin via window over <=bins rows
    out = (
        base.groupBy(bin_idx.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(prob_col).cast("decimal(38,6)")).alias("__sp"),
            F.sum(lbl.cast("long")).alias("__pos"),
        )
        .withColumn("__n_tot", F.sum("n").over(n_tot))
    )
    mean_p = F.col("__sp").cast("double") / F.col("n")
    pos_rate = F.col("__pos").cast("double") / F.col("n")
    return out.select(
        "bin",
        "n",
        F.round(mean_p, round_dp).alias("mean_p"),
        F.round(pos_rate, round_dp).alias("pos_rate"),
        F.round(
            F.abs(mean_p - pos_rate) * F.col("n") / F.col("__n_tot"),
            round_dp,
        ).alias("ece_contrib"),
    )


def ks_separation(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_dp: int = 9,
) -> DataFrame:
    """Kolmogorov–Smirnov separation of the score distributions:
    ``KS = max_s |CDF_pos(s) − CDF_neg(s)|`` — the classifier-
    separability statistic reported next to AUC (credit-scoring "KS");
    also the threshold where Youden's J peaks. Same scale shape as
    ``roc_auc``: one per-distinct-score aggregate bounds everything
    downstream at the score grid; the cumulative pass never sees the
    corpus. Integer numerators until the final divisions, so engines
    agree bit-for-bit.

    Returns one row: ``n_pos, n_neg, ks, ks_score`` — ``ks_score`` is
    the score where the gap peaks (smallest such score on ties).
    Degenerate single-class slices return NULL ks/ks_score.
    """
    lbl = F.col(label_col).cast("boolean")
    per_score = (
        df.filter(F.col(score_col).isNotNull() & lbl.isNotNull())
        .groupBy(F.col(score_col).alias("__s"))
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.sum(lbl.cast("long")).alias("__p"),
        )
    )
    w = (
        Window.partitionBy()
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    cum = (
        per_score.withColumn("__cp", F.sum("__p").over(w))
        .withColumn("__cn", F.sum(F.col("__c") - F.col("__p")).over(w))
        .withColumn("__tp", F.sum("__p").over(w_all))
        .withColumn("__tn", F.sum(F.col("__c") - F.col("__p")).over(w_all))
    )
    gap = F.abs(
        F.col("__cp").cast("double") / F.col("__tp")
        - F.col("__cn").cast("double") / F.col("__tn")
    )
    scored = cum.select(
        "__s", "__tp", "__tn", F.round(gap, round_dp).alias("__gap")
    )
    best = (
        scored.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy().orderBy(
                    F.desc("__gap"), F.asc("__s")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
    )
    return best.select(
        F.col("__tp").alias("n_pos"),
        F.col("__tn").alias("n_neg"),
        F.when(
            (F.col("__tp") > 0) & (F.col("__tn") > 0), F.col("__gap")
        ).alias("ks"),
        F.when(
            (F.col("__tp") > 0) & (F.col("__tn") > 0), F.col("__s")
        ).alias("ks_score"),
    )
