"""Distributed classifier-evaluation metrics over any (label, score)
DataFrame — the library forms behind the `eval_*` registry rows
(queries_eval.py binds them to the fixture tables; these functions
take arbitrary frames so a pipeline can score its own quality/filter
models in place).

All math follows the corpus determinism contract: integer scores in,
exact integer identities throughout, ratios reported in ppm / micro
units via integer division — bit-identical across engines and
reduction orders.

Scale shape (shared by all three): ONE map-side partial aggregate
collapses the corpus to a bounded table (distinct scores for AUC,
<= 11 threshold buckets for PR, <= 10 bins for calibration); every
window below that point runs over the bounded table, never over
corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc(scored: DataFrame, y_col: str = "y", score_col: str = "score") -> DataFrame:
    """Exact tie-aware ROC-AUC via the rank-sum (Mann-Whitney U)
    identity: with per-distinct-score positive/negative counts
    (p_s, n_s) and cumn_s = negatives strictly below s,

        2U = SUM_s p_s * (2*cumn_s + n_s)

    — each (pos, neg) pair counts twice when the positive outranks
    the negative and once on ties, i.e. the average-rank statistic
    with no float rank arithmetic.  Returns one row
    (n_pos, n_neg, two_u, auc_micro); auc_micro is NULL for a
    single-class input (AUC is undefined, and NULL beats a division
    error or a fake 0.5 — both engines in the oracle pair agree on
    the NULL once the guard is in the SQL too).

    int64 bound: two_u <= 2 * n_pos * n_neg — exact to ~2.1e9
    pos x neg pairs; past that swap the micro constants for
    decimal(38) (the Gram-matrix escape hatch).
    """
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    s = bounded_single_group(
        scored.groupBy(F.col(score_col).alias("score")).agg(
            F.sum(y_col).alias("p"),
            (F.count(F.lit(1)) - F.sum(y_col)).alias("n"),
        )
    )  # score-domain-bounded table: the single group is declared
    w = (
        Window.partitionBy("__opid")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = s.select("p", "n", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("cumn"))
    t = c.agg(
        F.sum(F.col("p") * (2 * F.col("cumn") + F.col("n"))).alias("two_u"),
        F.sum("p").alias("n_pos"),
        F.sum("n").alias("n_neg"),
    )
    return t.select(
        "n_pos",
        "n_neg",
        "two_u",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr("(two_u * 1000000) div (2 * n_pos * n_neg)"),
        ).alias("auc_micro"),
    )


def normalize_micro(
    scored: DataFrame, y_col: str = "y", score_col: str = "score"
) -> DataFrame:
    """Min-max-normalize integer scores to micro-probabilities
    [0, 1e6]: pm = (score - min) * 1e6 // max(span, 1).  The span
    guard makes a constant-score input map to pm = 0 everywhere
    instead of dividing by zero.  min/max is a scalar aggregate
    broadcast back onto the feed — one extra corpus scan, no shuffle.
    """
    mm = scored.agg(
        F.min(score_col).alias("lo"), F.max(score_col).alias("hi")
    )
    span = F.greatest(F.col("hi") - F.col("lo"), F.lit(1))
    return (
        scored.crossJoin(F.broadcast(mm))
        .select(
            F.col(y_col).alias("y"),
            (F.col(score_col) - F.col("lo")).cast("long").alias("num0"),
            span.alias("span"),
        )
        .select("y", F.expr("(num0 * 1000000) div span").alias("pm"))
    )


def pr_curve(pm: DataFrame, n_thresholds: int = 11) -> DataFrame:
    """Precision/recall/F1 sweep over an evenly-spaced threshold grid
    on (y, pm) micro-probability rows (:func:`normalize_micro`).
    TP/FP come from a descending cumulative sum over the bucket
    histogram; all threshold math runs on the grid-sized frame.
    Conventions pinned cross-engine: precision of an empty prediction
    set = 1.0; recall with zero positives = 0.
    """
    spark = pm.sparkSession
    step = 1_000_000 // (n_thresholds - 1)
    g = pm.groupBy(
        F.least(F.expr(f"pm div {step}"), F.lit(n_thresholds - 1)).alias("bkt")
    ).agg(
        F.sum("y").alias("tp_b"),
        (F.count(F.lit(1)) - F.sum("y")).alias("fp_b"),
    )
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    grid = spark.range(0, n_thresholds).select(F.col("id").alias("bkt"))
    j = bounded_single_group(
        grid.join(F.broadcast(g), "bkt", "left").select(
            "bkt",
            F.coalesce("tp_b", F.lit(0)).alias("tp_b"),
            F.coalesce("fp_b", F.lit(0)).alias("fp_b"),
        )
    )  # grid-bounded (n_thresholds rows)
    w = (
        Window.partitionBy("__opid")
        .orderBy(F.col("bkt").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = j.select(
        "bkt",
        F.sum("tp_b").over(w).alias("tp"),
        F.sum("fp_b").over(w).alias("fp"),
        F.sum("tp_b").over(wall).alias("pos"),
    )
    m = c.select(
        (F.col("bkt") * step).cast("long").alias("threshold_micro"),
        "tp",
        "fp",
        (F.col("pos") - F.col("tp")).alias("fn"),
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(1_000_000))
        .otherwise(F.expr("(tp * 1000000) div (tp + fp)"))
        .alias("precision_ppm"),
        F.expr("(tp * 1000000) div greatest(pos, 1)").alias("recall_ppm"),
    )
    return m.select(
        "*",
        F.when(F.col("precision_ppm") + F.col("recall_ppm") == 0, F.lit(0))
        .otherwise(
            F.expr("(2 * precision_ppm * recall_ppm) div (precision_ppm + recall_ppm)")
        )
        .alias("f1_ppm"),
    ).orderBy("threshold_micro")


def calibration(pm: DataFrame, n_bins: int = 10) -> DataFrame:
    """Reliability diagram over (y, pm) rows: per equal-width bin the
    mean predicted micro-probability, empirical positive rate, their
    absolute gap (the ECE summand) and the bin weight in ppm.
    ECE = SUM(weight * gap) downstream."""
    step = 1_000_000 // n_bins
    g = pm.groupBy(
        F.least(F.expr(f"pm div {step}"), F.lit(n_bins - 1)).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pm").alias("sum_pm"),
        F.sum("y").alias("sum_y"),
    )
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    g = bounded_single_group(g)  # bin-bounded (n_bins rows)
    wall = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mean_pred = F.expr("sum_pm div n")
    frac_pos = F.expr("(sum_y * 1000000) div n")
    return (
        g.withColumn("total", F.sum("n").over(wall))
        .select(
            F.col("bin").cast("long").alias("bin"),
            "n",
            mean_pred.alias("mean_pred_micro"),
            frac_pos.alias("frac_pos_micro"),
            F.abs(mean_pred - frac_pos).alias("gap_micro"),
            F.expr("(n * 1000000) div total").alias("weight_ppm"),
        )
        .orderBy("bin")
    )
