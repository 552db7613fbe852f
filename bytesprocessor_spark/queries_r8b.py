"""Round-8 second analytics batch: experimentation + evaluation stats.

- A87 events_kruskal_wallis: the k-group rank test (the non-parametric
  ANOVA) across ALL event types — extends A40's two-group Mann-Whitney
  the same way A55's ANOVA extends Welch's t.  Tie-corrected H.
- EV22 eval_mcnemar: paired comparison of two classifiers on the SAME
  rows (discordant-pair test) — the significance read behind "model B
  beats model A on this eval set"; accuracy deltas without it are
  noise at small eval sizes.
- EV23 eval_cohens_kappa: inter-annotator agreement beyond chance for
  a k-class labeling task — the gate a labeling pipeline runs before
  trusting human (or LLM-judge) labels as training data.
- A88 orders_logrank: two-arm survival comparison (the inferential
  companion to A37's Kaplan-Meier curves) on time-to-first-shipment,
  censored at 90 days.
- EV24 eval_ips_policy_value: offline policy evaluation via inverse
  propensity scoring — learn a greedy per-context action policy on a
  training split, estimate its value on a held-out logged split
  (IPS + match-rate diagnostics).  The counterfactual "what would
  this policy have earned" read behind every bandit/recsys launch.

Determinism (the A80/A81 pattern throughout): engines aggregate ONLY
exact int64 counts/sums; every statistic is a single fixed IEEE-double
expression tree over those integers, quantized to micro at the end.
Where a statistic sums per-group float terms (log-rank E/V, K-W rank
contributions, IPS per-context terms), each term is quantized to an
integer scale FIRST and the cross-group sum is exact int64 — no
float reduction order anywhere.

Reference scope note: the reference engine ends at the labeled packet
table (BytesProcessor.py:121-187); these are EXT rows of the analytics
surface SURVEY §2 declares on top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bytesprocessor_spark.operators.ranking import bounded_single_group as _bsg

from bytesprocessor_spark.queries import _t, cents, query


# ---------------------------------------------------------------------------
# A87: Kruskal-Wallis k-group rank test
# ---------------------------------------------------------------------------

@query(
    "events_kruskal_wallis",
    """
    WITH e AS (
      SELECT event_type AS g, CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events
    ),
    t AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS tie FROM e GROUP BY v),
    cb AS (
      SELECT v, tie,
             COALESCE(CAST(SUM(tie) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS cum
      FROM t
    ),
    c AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY g, v),
    r AS (
      SELECT c.g,
             CAST(SUM(c.c * (2 * cb.cum + cb.tie + 1)) AS BIGINT) AS two_r,
             CAST(SUM(c.c) AS BIGINT) AS n
      FROM c JOIN cb ON c.v = cb.v GROUP BY c.g
    ),
    gl AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(CAST(ROUND(CAST(two_r AS DOUBLE) * CAST(two_r AS DOUBLE)
                 / CAST(n AS DOUBLE) / 4.0) AS BIGINT)) AS BIGINT) AS rsum,
             (SELECT CAST(SUM(tie * tie * tie - tie) AS BIGINT) FROM t) AS tcorr
      FROM r
    )
    SELECT r.g AS event_type, r.n, r.two_r,
      CAST(ROUND(
        (12.0 / (CAST(gl.nn AS DOUBLE) * CAST(gl.nn + 1 AS DOUBLE))
          * CAST(gl.rsum AS DOUBLE)
         - 3.0 * CAST(gl.nn + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS h_micro,
      CASE WHEN gl.nn > 1
                AND CAST(gl.tcorr AS DOUBLE) < CAST(gl.nn AS DOUBLE)
                    * CAST(gl.nn AS DOUBLE) * CAST(gl.nn AS DOUBLE)
                    - CAST(gl.nn AS DOUBLE) THEN
        CAST(ROUND(
          (12.0 / (CAST(gl.nn AS DOUBLE) * CAST(gl.nn + 1 AS DOUBLE))
            * CAST(gl.rsum AS DOUBLE)
           - 3.0 * CAST(gl.nn + 1 AS DOUBLE))
          / (1.0 - CAST(gl.tcorr AS DOUBLE)
             / (CAST(gl.nn AS DOUBLE) * CAST(gl.nn AS DOUBLE)
                * CAST(gl.nn AS DOUBLE) - CAST(gl.nn AS DOUBLE)))
          * 1000000) AS BIGINT)
      ELSE NULL END AS h_adj_micro
    FROM r, gl ORDER BY event_type
    """,
)
def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A87 — Kruskal-Wallis H across all k event-type populations on
    the value column: the k-group generalization of Mann-Whitney (A40)
    and the rank counterpart of one-way ANOVA (A55); the omnibus
    "are these populations even the same?" screen run before any
    pairwise test.

    Rank handling without materializing ranks (the A40 device): group
    by distinct value, a cumulative count over the value ordering
    gives each tie-group's rank block, and twice the average rank of
    the block is the INTEGER 2*cum_before + tie + 1 — so per-group
    rank sums (2R_j) are exact int64.  Each group's H contribution
    (2R_j)^2/(4 n_j) is one double expression quantized to an integer
    before the k-row sum, and the tie correction 1 - sum(t^3-t)/(N^3-N)
    is applied as a second fixed expression.

    Scale shape: two hash aggregations keyed by value (cardinality-
    bounded — cents values), one window over the distinct-value table
    (not the events), a k-row readout.  No global sort of raw rows."""
    e = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), cents(F.col("value")).alias("v")
    )
    # one scan: the (group, value) counts; tie sizes and the cumulative
    # rank offset come from windows over THAT table (k rows per value),
    # never re-reading or re-aggregating events
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    c = bounded_single_group(  # distinct-(g, v) value-domain table
        e.groupBy("g", "v").agg(F.count("*").cast("long").alias("c"))
    )
    w_tie = Window.partitionBy("v")
    w_cum = (
        Window.partitionBy("__opid")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    ranked = c.select(
        "g",
        "v",
        "c",
        F.sum("c").over(w_tie).cast("long").alias("tie"),
        F.coalesce(F.sum("c").over(w_cum), F.lit(0)).cast("long").alias("cum"),
    )
    # tie correction folds into the same aggregate: since sum_g c = tie
    # per value, sum over rows of c*(tie^2 - 1) == sum over distinct
    # values of (tie^3 - tie) — exact int64 throughout
    r = ranked.groupBy("g").agg(
        F.sum(F.col("c") * (2 * F.col("cum") + F.col("tie") + 1))
        .cast("long")
        .alias("two_r"),
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * (F.col("tie") * F.col("tie") - 1))
        .cast("long")
        .alias("tc_part"),
    )
    term = F.round(
        F.col("two_r").cast("double")
        * F.col("two_r").cast("double")
        / F.col("n").cast("double")
        / 4.0
    ).cast("long")
    # globals via an unpartitioned window over the k-row group table —
    # keeps ONE plan (a crossJoin with a separate agg would recompute
    # the whole aggregation lineage twice); k = #event types, so the
    # single-partition window is bounded
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    withg = _bsg(r).select(
        "g",
        "n",
        "two_r",
        F.sum("n").over(w_all).cast("long").alias("nn"),
        F.sum(term).over(w_all).cast("long").alias("rsum"),
        F.sum("tc_part").over(w_all).cast("long").alias("tcorr"),
    )
    nn = F.col("nn").cast("double")
    h = (
        12.0 / (nn * (F.col("nn") + 1).cast("double")) * F.col("rsum").cast("double")
        - 3.0 * (F.col("nn") + 1).cast("double")
    )
    corr = 1.0 - F.col("tcorr").cast("double") / (nn * nn * nn - nn)
    # all-tied (tcorr == N^3-N) or single-row inputs have no defined
    # tie-corrected H: NULL in both engines (DuckDB would throw on
    # CAST(NaN AS BIGINT); Spark would silently emit 0)
    # guard compares in DOUBLE: nn^3 overflows int64 past ~2.1M rows
    adj_defined = (F.col("nn") > 1) & (F.col("tcorr").cast("double") < nn * nn * nn - nn)
    return withg.select(
        F.col("g").alias("event_type"),
        "n",
        "two_r",
        F.round(h * 1000000).cast("long").alias("h_micro"),
        F.when(adj_defined, F.round(h / corr * 1000000).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("h_adj_micro"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# EV22: McNemar paired classifier comparison
# ---------------------------------------------------------------------------

@query(
    "eval_mcnemar",
    """
    WITH e AS (
      SELECT (event_type = 'purchase') AS y,
             (CAST(ROUND(value * 100) AS BIGINT) >= 5000) AS a,
             (CAST(ROUND(value * 100) AS BIGINT)
              + 10 * (user_id % 7) >= 5200) AS b
      FROM events
    ),
    m AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN (a = y) AND (b <> y) THEN 1 ELSE 0 END)
             AS BIGINT) AS n_a_only,
        CAST(SUM(CASE WHEN (b = y) AND (a <> y) THEN 1 ELSE 0 END)
             AS BIGINT) AS n_b_only,
        CAST(SUM(CASE WHEN a = y THEN 1 ELSE 0 END) AS BIGINT) AS n_a_correct,
        CAST(SUM(CASE WHEN b = y THEN 1 ELSE 0 END) AS BIGINT) AS n_b_correct
      FROM e
    )
    SELECT n, n_a_correct, n_b_correct, n_a_only, n_b_only,
      CASE WHEN n_a_only + n_b_only > 0 THEN
        CAST(ROUND(
          (ABS(CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE)) - 1.0)
          * (ABS(CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE)) - 1.0)
          / (CAST(n_a_only AS DOUBLE) + CAST(n_b_only AS DOUBLE))
          * 1000000) AS BIGINT)
      ELSE NULL END AS chi2_micro,
      CASE WHEN n_a_only + n_b_only > 0 THEN
        CAST(ROUND(
          (ABS(CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE)) - 1.0)
          * (ABS(CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE)) - 1.0)
          / (CAST(n_a_only AS DOUBLE) + CAST(n_b_only AS DOUBLE))
          * 1000000) AS BIGINT) >= 3841459
      ELSE FALSE END AS significant_5pct
    FROM m
    """,
)
def eval_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV22 — McNemar's test on paired predictions: two rule models
    predict the purchase label on the SAME events, and the test asks
    whether their accuracies differ using only the DISCORDANT pairs
    (rows where exactly one model is right) — concordant rows carry no
    information about the difference, which is why comparing raw
    accuracy deltas over-states significance.  Continuity-corrected
    chi-square (|b-c|-1)^2/(b+c), 1 dof.

    This is the paired-eval primitive behind "ship model B": on an
    eval set scored by both models, one scan suffices.

    Scale shape: one pass, five conditional int64 counters, map-side
    combined to a single row."""
    v = cents(F.col("value"))
    e = _t(spark, sf_dir, "events").select(
        (F.col("event_type") == "purchase").alias("y"),
        (v >= 5000).alias("a"),
        ((v + 10 * (F.col("user_id") % 7)) >= 5200).alias("b"),
    )
    m = e.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when((F.col("a") == F.col("y")) & (F.col("b") != F.col("y")), 1).otherwise(0))
        .cast("long")
        .alias("n_a_only"),
        F.sum(F.when((F.col("b") == F.col("y")) & (F.col("a") != F.col("y")), 1).otherwise(0))
        .cast("long")
        .alias("n_b_only"),
        F.sum(F.when(F.col("a") == F.col("y"), 1).otherwise(0))
        .cast("long")
        .alias("n_a_correct"),
        F.sum(F.when(F.col("b") == F.col("y"), 1).otherwise(0))
        .cast("long")
        .alias("n_b_correct"),
    )
    d = F.abs(F.col("n_a_only").cast("double") - F.col("n_b_only").cast("double"))
    chi2 = (
        (d - 1.0)
        * (d - 1.0)
        / (F.col("n_a_only").cast("double") + F.col("n_b_only").cast("double"))
    )
    # no discordant pairs -> the test is undefined: NULL in both
    # engines (DuckDB would throw on CAST(NaN AS BIGINT))
    defined = (F.col("n_a_only") + F.col("n_b_only")) > 0
    chi2_micro = F.when(defined, F.round(chi2 * 1000000).cast("long")).otherwise(
        F.lit(None).cast("long")
    )
    return m.select(
        "n",
        "n_a_correct",
        "n_b_correct",
        "n_a_only",
        "n_b_only",
        chi2_micro.alias("chi2_micro"),
        # no discordant evidence = cannot reject the null -> FALSE
        # (a NULL boolean canonicalizes differently across engines)
        F.when(defined, chi2_micro >= 3841459)
        .otherwise(F.lit(False))
        .alias("significant_5pct"),
    )


# ---------------------------------------------------------------------------
# EV23: Cohen's kappa inter-annotator agreement
# ---------------------------------------------------------------------------

@query(
    "eval_cohens_kappa",
    """
    WITH lab AS (
      SELECT event_type AS r1,
             CASE WHEN event_id % 5 = 0 THEN
               CASE event_type
                 WHEN 'click' THEN 'error' WHEN 'error' THEN 'purchase'
                 WHEN 'purchase' THEN 'signup' WHEN 'signup' THEN 'view'
                 ELSE 'click' END
             ELSE event_type END AS r2
      FROM events
    ),
    per AS (
      SELECT r1 AS label,
             CAST(COUNT(*) AS BIGINT) AS n_r1,
             CAST(SUM(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree
      FROM lab GROUP BY r1
    ),
    per2 AS (SELECT r2 AS label, CAST(COUNT(*) AS BIGINT) AS n_r2
             FROM lab GROUP BY r2),
    j AS (
      SELECT per.label, per.n_r1, COALESCE(per2.n_r2, 0) AS n_r2, per.n_agree
      FROM per LEFT JOIN per2 ON per.label = per2.label
    ),
    gl AS (
      SELECT CAST(SUM(n_r1) AS BIGINT) AS n,
             CAST(SUM(n_agree) AS BIGINT) AS agree,
             CAST(SUM(n_r1 * n_r2) AS BIGINT) AS chance
      FROM j
    )
    SELECT j.label, j.n_r1, j.n_r2, j.n_agree,
      CASE WHEN CAST(gl.chance AS DOUBLE)
                < CAST(gl.n AS DOUBLE) * CAST(gl.n AS DOUBLE) THEN
        CAST(ROUND(
          (CAST(gl.agree AS DOUBLE) / CAST(gl.n AS DOUBLE)
           - CAST(gl.chance AS DOUBLE)
             / (CAST(gl.n AS DOUBLE) * CAST(gl.n AS DOUBLE)))
          / (1.0 - CAST(gl.chance AS DOUBLE)
             / (CAST(gl.n AS DOUBLE) * CAST(gl.n AS DOUBLE)))
          * 1000000) AS BIGINT)
      ELSE NULL END AS kappa_micro
    FROM j, gl ORDER BY j.label
    """,
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV23 — Cohen's kappa between two annotators on a k-class task:
    observed agreement corrected for the agreement two annotators
    would reach by chance given their marginal label distributions
    (raw percent-agreement overstates reliability whenever the label
    distribution is skewed).  kappa = (p_o - p_e)/(1 - p_e) with
    p_e = sum_i row_i * col_i / N^2.

    Annotator fixture: rater 1 is the event type; rater 2 agrees
    except on a deterministic 20% slice (event_id % 5 == 0) where it
    assigns the cyclically-next label — a worst-case systematic
    disagreement pattern (chance-corrected agreement must price in
    that the confusions are structured, not uniform).

    This is the label-quality gate a labeling pipeline runs before
    admitting a batch of human or LLM-judge labels as training truth.

    Scale shape: one pass for both marginal count tables (per-label,
    k rows each), a broadcast-joined k-row readout; kappa is one fixed
    expression over three int64 totals."""
    ev = _t(spark, sf_dir, "events")
    nxt = (
        F.when(F.col("event_type") == "click", "error")
        .when(F.col("event_type") == "error", "purchase")
        .when(F.col("event_type") == "purchase", "signup")
        .when(F.col("event_type") == "signup", "view")
        .otherwise("click")
    )
    lab = ev.select(
        F.col("event_type").alias("r1"),
        F.when(F.col("event_id") % 5 == 0, nxt).otherwise(F.col("event_type")).alias("r2"),
    )
    per = lab.groupBy(F.col("r1").alias("label")).agg(
        F.count("*").cast("long").alias("n_r1"),
        F.sum(F.when(F.col("r1") == F.col("r2"), 1).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    per2 = lab.groupBy(F.col("r2").alias("label")).agg(
        F.count("*").cast("long").alias("n_r2")
    )
    j = per.join(per2, "label", "left").select(
        "label",
        "n_r1",
        F.coalesce(F.col("n_r2"), F.lit(0)).cast("long").alias("n_r2"),
        "n_agree",
    )
    # totals via an unpartitioned window over the k-row label table —
    # one plan, the two marginal scans run exactly once
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    withg = _bsg(j).select(
        "label",
        "n_r1",
        "n_r2",
        "n_agree",
        F.sum("n_r1").over(w_all).cast("long").alias("n"),
        F.sum("n_agree").over(w_all).cast("long").alias("agree"),
        F.sum(F.col("n_r1") * F.col("n_r2")).over(w_all).cast("long").alias("chance"),
    )
    nD = F.col("n").cast("double")
    po = F.col("agree").cast("double") / nD
    pe = F.col("chance").cast("double") / (nD * nD)
    # pe == 1 (both raters constant on one label) leaves kappa
    # undefined: NULL in both engines (guard in DOUBLE — n^2 overflows
    # int64 only past ~3e9 rows, but stay consistent with the oracle)
    defined = F.col("chance").cast("double") < nD * nD
    return withg.select(
        "label",
        "n_r1",
        "n_r2",
        "n_agree",
        F.when(defined, F.round((po - pe) / (1.0 - pe) * 1000000).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("kappa_micro"),
    ).orderBy("label")


# ---------------------------------------------------------------------------
# A88: log-rank two-arm survival test
# ---------------------------------------------------------------------------

@query(
    "orders_logrank",
    """
    WITH d AS (
      SELECT o.o_orderkey,
             (o.o_orderpriority IN ('1-URGENT', '2-HIGH')) AS arm1,
             LEAST(CAST(DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                                  CAST(s.first_ship AS DATE)) AS BIGINT),
                   90) AS t,
             (DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                        CAST(s.first_ship AS DATE)) <= 90) AS observed
      FROM orders o
      JOIN (SELECT l_orderkey, MIN(l_shipdate) AS first_ship
            FROM lineitem GROUP BY l_orderkey) s
        ON o.o_orderkey = s.l_orderkey
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN arm1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM d
    ),
    ev AS (
      SELECT t,
             CAST(SUM(CASE WHEN observed AND arm1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS dt,
             CAST(SUM(CASE WHEN arm1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
             CAST(COUNT(*) AS BIGINT) AS at
      FROM d GROUP BY t
    ),
    rk AS (
      SELECT t, d1, dt, tot.m1, tot.m,
             tot.m1 - COALESCE(CAST(SUM(a1) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS n1,
             tot.m - COALESCE(CAST(SUM(at) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS nt
      FROM ev, tot
    ),
    s AS (
      SELECT
        CAST(SUM(d1) AS BIGINT) AS o1,
        CAST(SUM(CAST(ROUND(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)
             / CAST(nt AS DOUBLE) * 1000000000) AS BIGINT)) AS BIGINT)
          AS e1_nano,
        CAST(SUM(CAST(ROUND(
             CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
             * (1.0 - CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
             * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
             / (CAST(nt AS DOUBLE) - 1.0) * 1000000000) AS BIGINT))
          AS BIGINT) AS v_nano,
        CAST(MAX(m1) AS BIGINT) AS m1,
        CAST(MAX(m) AS BIGINT) AS m
      FROM rk WHERE dt > 0 AND nt > 1
    )
    SELECT s.m1 AS n_arm1, s.m - s.m1 AS n_arm2, s.o1, s.e1_nano,
           s.v_nano,
      CASE WHEN s.v_nano > 0 THEN
        CAST(ROUND(
          (CAST(s.o1 AS DOUBLE) - CAST(s.e1_nano AS DOUBLE) / 1000000000.0)
          * (CAST(s.o1 AS DOUBLE) - CAST(s.e1_nano AS DOUBLE) / 1000000000.0)
          / (CAST(s.v_nano AS DOUBLE) / 1000000000.0) * 1000000) AS BIGINT)
      ELSE NULL END AS chi2_micro
    FROM s
    """,
)
def orders_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A88 — log-rank test comparing time-to-first-shipment between
    urgent-priority orders (arm 1: 1-URGENT/2-HIGH) and the rest,
    right-censored at 90 days: the inferential companion to A37's
    Kaplan-Meier curves (KM shows the curves; log-rank says whether
    they differ).  At each distinct event time the observed arm-1
    events d1 are compared to the expectation dt*n1/nt under the null
    of equal hazards, with hypergeometric variance; the statistic is
    (O-E)^2/V ~ chi-square(1).

    Determinism: risk sets n1/nt come from cumulative int64 counts
    over the (<=91-row) distinct-time table; each time's E and V terms
    are single double expressions quantized to nano-units BEFORE the
    cross-time sum, so the sum is exact integer arithmetic.

    Scale shape: one join keyed by orderkey (the same shuffle Q3
    does), one hash agg to the per-day event table (calendar-bounded,
    <=91 rows), window + readout on that tiny table."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    d = orders.join(first_ship, orders.o_orderkey == first_ship.l_orderkey).select(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("arm1"),
        F.least(
            F.datediff(F.col("first_ship").cast("date"), F.col("o_orderdate").cast("date")).cast("long"),
            F.lit(90).cast("long"),
        ).alias("t"),
        (
            F.datediff(F.col("first_ship").cast("date"), F.col("o_orderdate").cast("date")) <= 90
        ).alias("observed"),
    )
    ev = d.groupBy("t").agg(
        F.sum(F.when(F.col("observed") & F.col("arm1"), 1).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).cast("long").alias("dt"),
        F.sum(F.when(F.col("arm1"), 1).otherwise(0)).cast("long").alias("a1"),
        F.count("*").cast("long").alias("at"),
    )
    # arm totals AND risk sets both come from windows over the
    # calendar-bounded (<=91 rows) per-day table — one plan, the big
    # orders⋈lineitem join runs exactly once
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    ev = bounded_single_group(ev)  # calendar-bounded (<=91 rows)
    w = (
        Window.partitionBy("__opid")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rk = ev.select(
        "t",
        "d1",
        "dt",
        F.sum("a1").over(w_all).cast("long").alias("m1"),
        F.sum("at").over(w_all).cast("long").alias("m"),
        (F.sum("a1").over(w_all) - F.coalesce(F.sum("a1").over(w), F.lit(0)))
        .cast("long")
        .alias("n1"),
        (F.sum("at").over(w_all) - F.coalesce(F.sum("at").over(w), F.lit(0)))
        .cast("long")
        .alias("nt"),
    ).where((F.col("dt") > 0) & (F.col("nt") > 1))
    frac = F.col("n1").cast("double") / F.col("nt").cast("double")
    e_term = F.round(F.col("dt").cast("double") * frac * 1e9).cast("long")
    v_term = F.round(
        F.col("dt").cast("double")
        * frac
        * (1.0 - frac)
        * (F.col("nt").cast("double") - F.col("dt").cast("double"))
        / (F.col("nt").cast("double") - 1.0)
        * 1e9
    ).cast("long")
    s = rk.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(e_term).cast("long").alias("e1_nano"),
        F.sum(v_term).cast("long").alias("v_nano"),
        F.max("m1").cast("long").alias("m1"),
        F.max("m").cast("long").alias("m"),
    )
    oe = F.col("o1").cast("double") - F.col("e1_nano").cast("double") / 1e9
    chi2 = oe * oe / (F.col("v_nano").cast("double") / 1e9)
    # zero variance (single-arm input, or every event time saturated)
    # leaves the test undefined: NULL in both engines
    return s.select(
        F.col("m1").alias("n_arm1"),
        (F.col("m") - F.col("m1")).cast("long").alias("n_arm2"),
        "o1",
        "e1_nano",
        "v_nano",
        F.when(F.col("v_nano") > 0, F.round(chi2 * 1000000).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("chi2_micro"),
    )


# ---------------------------------------------------------------------------
# EV24: inverse-propensity-scored offline policy evaluation
# ---------------------------------------------------------------------------

@query(
    "eval_ips_policy_value",
    """
    WITH e AS (
      SELECT user_id % 10 AS ctx, event_type AS act,
             CAST(ROUND(value * 100) AS BIGINT) AS r,
             event_id % 2 = 0 AS train
      FROM events
    ),
    pol AS (
      SELECT ctx, act AS pi_act FROM (
        SELECT ctx, act,
               ROW_NUMBER() OVER (PARTITION BY ctx ORDER BY
                 CAST(SUM(r) AS DOUBLE) / COUNT(*) DESC, act) AS rk
        FROM e WHERE train GROUP BY ctx, act
      ) WHERE rk = 1
    ),
    logged AS (
      SELECT ctx, act,
             CAST(COUNT(*) AS BIGINT) AS n_ca,
             CAST(SUM(r) AS BIGINT) AS r_ca
      FROM e WHERE NOT train GROUP BY ctx, act
    ),
    nctx AS (
      SELECT ctx, CAST(SUM(n_ca) AS BIGINT) AS n_c FROM logged GROUP BY ctx
    ),
    perc AS (
      SELECT nctx.ctx, pol.pi_act, nctx.n_c,
             COALESCE(logged.n_ca, 0) AS n_match,
             COALESCE(logged.r_ca, 0) AS r_match,
             CASE WHEN COALESCE(logged.n_ca, 0) > 0 THEN
               CAST(ROUND(CAST(logged.r_ca AS DOUBLE)
                    * CAST(nctx.n_c AS DOUBLE)
                    / CAST(logged.n_ca AS DOUBLE)) AS BIGINT)
             ELSE 0 END AS ips_c
      FROM nctx
      JOIN pol ON nctx.ctx = pol.ctx
      LEFT JOIN logged ON logged.ctx = nctx.ctx AND logged.act = pol.pi_act
    ),
    gl AS (
      SELECT CAST(SUM(n_c) AS BIGINT) AS n_eval,
             CAST(SUM(ips_c) AS BIGINT) AS ips_sum_c,
             CAST(SUM(n_match) AS BIGINT) AS n_matched
      FROM perc
    )
    SELECT perc.ctx, perc.pi_act, perc.n_c, perc.n_match, perc.ips_c,
      CAST(ROUND(CAST(gl.ips_sum_c AS DOUBLE) / CAST(gl.n_eval AS DOUBLE)
           * 10000) AS BIGINT) AS policy_value_microdollar,
      CAST(ROUND(CAST(gl.n_matched AS DOUBLE) / CAST(gl.n_eval AS DOUBLE)
           * 1000000) AS BIGINT) AS match_rate_micro
    FROM perc, gl ORDER BY perc.ctx
    """,
)
def eval_ips_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV24 — offline (counterfactual) policy evaluation by inverse
    propensity scoring: learn a greedy action policy per context on a
    training split (argmax of mean logged reward), then estimate what
    that policy WOULD have earned on the held-out logged split without
    deploying it — each matching logged row is up-weighted by the
    inverse of the logging policy's empirical propensity
    p(a|ctx) = n_ca/n_c, so IPS_ctx = r_match * n_c / n_match.  The
    standard eval loop for bandit/recommendation policies over logged
    interaction data.

    Determinism: propensities and reward sums are exact int64 counts;
    the per-context IPS contribution is one double expression
    quantized to cents before the cross-context integer sum; the
    argmax over the training split orders by an exact-input double
    ratio with the action name as total tiebreak.  Match-rate (the
    IPS support diagnostic — a low rate means the estimate leans on
    few rows) is reported alongside.

    Scale shape: two hash aggregations keyed by (ctx, action) — both
    map-side combinable, cardinality = contexts x actions — a
    broadcast of the tiny policy table, a k-row readout."""
    e = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("ctx"),
        F.col("event_type").alias("act"),
        cents(F.col("value")).alias("r"),
        (F.col("event_id") % 2 == 0).alias("train"),
    )
    train_stats = (
        e.where("train")
        .groupBy("ctx", "act")
        .agg(F.sum("r").alias("rsum"), F.count("*").alias("cnt"))
    )
    wpol = Window.partitionBy("ctx").orderBy(
        (F.col("rsum").cast("double") / F.col("cnt")).desc(), F.col("act")
    )
    pol = (
        train_stats.withColumn("rk", F.row_number().over(wpol))
        .where(F.col("rk") == 1)
        .select("ctx", F.col("act").alias("pi_act"))
    )
    logged = (
        e.where(~F.col("train"))
        .groupBy("ctx", "act")
        .agg(F.count("*").cast("long").alias("n_ca"), F.sum("r").cast("long").alias("r_ca"))
    )
    nctx = logged.groupBy("ctx").agg(F.sum("n_ca").cast("long").alias("n_c"))
    perc = (
        nctx.join(F.broadcast(pol), "ctx")
        .join(
            logged.withColumnRenamed("act", "pi_act"),
            ["ctx", "pi_act"],
            "left",
        )
        .select(
            "ctx",
            "pi_act",
            "n_c",
            F.coalesce(F.col("n_ca"), F.lit(0)).cast("long").alias("n_match"),
            F.coalesce(F.col("r_ca"), F.lit(0)).cast("long").alias("r_match"),
        )
        .withColumn(
            "ips_c",
            F.when(
                F.col("n_match") > 0,
                F.round(
                    F.col("r_match").cast("double")
                    * F.col("n_c").cast("double")
                    / F.col("n_match").cast("double")
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
    )
    # totals via an unpartitioned window over the per-context table —
    # one plan, both splits' aggregations run exactly once
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    withg = _bsg(perc).select(
        "ctx",
        "pi_act",
        "n_c",
        "n_match",
        "ips_c",
        F.sum("n_c").over(w_all).cast("long").alias("n_eval"),
        F.sum("ips_c").over(w_all).cast("long").alias("ips_sum_c"),
        F.sum("n_match").over(w_all).cast("long").alias("n_matched"),
    )
    return withg.select(
        "ctx",
        "pi_act",
        "n_c",
        "n_match",
        "ips_c",
        F.round(
            F.col("ips_sum_c").cast("double") / F.col("n_eval").cast("double") * 10000
        )
        .cast("long")
        .alias("policy_value_microdollar"),
        F.round(
            F.col("n_matched").cast("double") / F.col("n_eval").cast("double") * 1000000
        )
        .cast("long")
        .alias("match_rate_micro"),
    ).orderBy("ctx")


# ---------------------------------------------------------------------------
# S6b: tolerant JSONL scan with quarantine accounting
# ---------------------------------------------------------------------------

@query(
    "jsonl_quarantine_scan",
    """
    WITH e AS (
      SELECT event_type,
             (event_id % 11 = 0) AS quarantined,
             CAST(ROUND(value * 100) AS BIGINT) AS val_c
      FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_in,
           CAST(SUM(CASE WHEN quarantined THEN 0 ELSE 1 END) AS BIGINT)
             AS n_admitted,
           CAST(SUM(CASE WHEN quarantined THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quarantined,
           CAST(SUM(CASE WHEN quarantined THEN 0 ELSE val_c END) AS BIGINT)
             AS sum_val_admitted_c
    FROM e GROUP BY event_type ORDER BY event_type
    """,
)
def jsonl_quarantine_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6b oracle row: tolerant JSON-lines ingest with quarantine
    accounting — the `csv_quarantine_scan` contract over the OTHER
    tolerant text source, exercising JSONL's distinct failure mode:
    every ``event_id % 11 == 0`` row is serialized with a STRING where
    the schema demands a number (valid JSON, type-mismatched), which
    PERMISSIVE must quarantine with the raw line captured verbatim.
    The readback accounts per event type, parsing the type back out of
    the quarantined raw line with get_json_object — so a dropped,
    duplicated, or mangled corrupt record fails the count or checksum
    against the base-table oracle.

    Scale shape: one cached scan feeds both splits (S6's posture); the
    gate is row-local; only per-type counters shuffle.
    """
    import os
    import shutil
    import tempfile

    from bytesprocessor_spark.sources.tables import read_json_tolerant

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", cents(F.col("value")).alias("val_c")
    )
    val_txt = F.when(
        F.col("event_id") % 11 == 0,
        F.concat(F.lit('"x'), F.col("val_c").cast("string"), F.lit('"')),
    ).otherwise(F.col("val_c").cast("string"))
    line = F.concat(
        F.lit('{"event_id":'),
        F.col("event_id").cast("string"),
        F.lit(',"event_type":"'),
        F.col("event_type"),
        F.lit('","val_c":'),
        val_txt,
        F.lit("}"),
    )

    workdir = tempfile.mkdtemp(prefix="bp_jsonq_")
    handle = None
    try:
        dirty = os.path.join(workdir, "dirty_jsonl")
        ev.select(line.alias("value")).write.mode("overwrite").text(dirty)
        good, bad, handle = read_json_tolerant(
            spark,
            dirty,
            "event_id long, event_type string, val_c long",
            with_handle=True,
        )
        adm = good.groupBy("event_type").agg(
            F.count("*").alias("n_admitted"),
            F.sum("val_c").alias("sum_val_admitted_c"),
        )
        quar = (
            bad.select(
                F.get_json_object(F.col("_corrupt_record"), "$.event_type").alias(
                    "event_type"
                )
            )
            .groupBy("event_type")
            .agg(F.count("*").alias("n_quarantined"))
        )
        out = (
            adm.join(quar, "event_type", "full_outer")
            .select(
                "event_type",
                (
                    F.coalesce(F.col("n_admitted"), F.lit(0))
                    + F.coalesce(F.col("n_quarantined"), F.lit(0))
                ).alias("n_in"),
                F.coalesce(F.col("n_admitted"), F.lit(0)).alias("n_admitted"),
                F.coalesce(F.col("n_quarantined"), F.lit(0)).alias("n_quarantined"),
                F.coalesce(F.col("sum_val_admitted_c"), F.lit(0)).alias(
                    "sum_val_admitted_c"
                ),
            )
            .orderBy("event_type")
        )
        # bounded result (one row per event type) — localize so the
        # temp dir can be deleted and the cached scan released now
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        if handle is not None:
            handle.unpersist()
        shutil.rmtree(workdir, ignore_errors=True)


# ---------------------------------------------------------------------------
# GR11: HITS hubs/authorities over the customer->part purchase graph
# ---------------------------------------------------------------------------

_HITS_ROUNDS = 2
_HITS_TOPK = 15


def _duck_hits_sql(rounds: int = _HITS_ROUNDS, k: int = _HITS_TOPK) -> str:
    """DuckDB replay of the unnormalized integer HITS iterations."""
    parts = [
        """
    WITH e AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    h0 AS (SELECT DISTINCT c, CAST(1 AS BIGINT) AS h FROM e)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    a{i} AS (SELECT e.p, CAST(SUM(h{i - 1}.h) AS BIGINT) AS a
            FROM e JOIN h{i - 1} ON e.c = h{i - 1}.c GROUP BY e.p),
    h{i} AS (SELECT e.c, CAST(SUM(a{i}.a) AS BIGINT) AS h
            FROM e JOIN a{i} ON e.p = a{i}.p GROUP BY e.c)"""
        )
    parts.append(
        f"""
    SELECT * FROM (
      SELECT 'authority' AS role, 'p:' || p AS node, a AS score,
             ROW_NUMBER() OVER (ORDER BY a DESC, p) AS rank
      FROM a{rounds} QUALIFY rank <= {k}
      UNION ALL
      SELECT 'hub' AS role, 'c:' || c AS node, h AS score,
             ROW_NUMBER() OVER (ORDER BY h DESC, c) AS rank
      FROM h{rounds} QUALIFY rank <= {k}
    ) ORDER BY role, rank"""
    )
    return "".join(parts)


@query("graph_hits", _duck_hits_sql())
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR11 — HITS (Kleinberg hubs/authorities) over the bipartite
    customer->part purchase graph: authorities are parts endorsed by
    well-connected customers, hubs are customers whose purchases
    concentrate on authoritative parts — the mutual-reinforcement read
    GR2's PageRank (a random-walk centrality) does not give.

    Exactness: HITS rankings are invariant to score scaling, so the
    per-round normalization is DROPPED and scores stay exact int64
    sums (h0 = 1): after r rounds a score is bounded by maxdeg^(2r) —
    int64-safe to maxdeg ~ 30k at 2 rounds; beyond that rescale h0
    down or add a per-round integer floor-div rescale (plan shape
    unchanged).  Bit-identical across engines and reduction orders,
    which float HITS is not.

    Plan shape: the edge build is the only corpus-scale join (distinct
    trading pairs — the GR2 build); each half-round is one edge-table
    equi-join + hash aggregate keyed on an 8-byte int; top-k per side
    is a distributed TakeOrdered.  cost = 2*rounds edge shuffles."""
    from bytesprocessor_spark.operators.caching import persist_intermediate

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = persist_intermediate(
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # r11: h0 = 1 for every customer in e, so round 1's authority
    # half-step Σ_c h0(c) is just the part's degree — a plain
    # aggregate, no join against an all-ones vector (and no extra
    # distinct pass to build it).  Values identical (exact int64
    # sums); one edge-table join and one edge-table scan removed.
    h = None
    a = None
    for rnd in range(_HITS_ROUNDS):
        if rnd == 0:
            a = e.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("a"))
        else:
            a = (
                e.join(h, "c")
                .groupBy("p")
                .agg(F.sum("h").cast("long").alias("a"))
            )
        h = (
            e.join(a, "p")
            .groupBy("c")
            .agg(F.sum("a").cast("long").alias("h"))
        )
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    # entity-scale vertex tables: TakeOrdered each top list, rank the
    # bounded prefix (identical under the unique order)
    wa = Window.partitionBy("__opid").orderBy(F.col("a").desc(), "p")
    wh = Window.partitionBy("__opid").orderBy(F.col("h").desc(), "c")
    top_a = bounded_single_group(
        a.orderBy(F.col("a").desc(), "p").limit(_HITS_TOPK)
    ).select(
        F.lit("authority").alias("role"),
        F.concat(F.lit("p:"), F.col("p").cast("string")).alias("node"),
        F.col("a").alias("score"),
        F.row_number().over(wa).alias("rank"),
    )
    top_h = bounded_single_group(
        h.orderBy(F.col("h").desc(), "c").limit(_HITS_TOPK)
    ).select(
        F.lit("hub").alias("role"),
        F.concat(F.lit("c:"), F.col("c").cast("string")).alias("node"),
        F.col("h").alias("score"),
        F.row_number().over(wh).alias("rank"),
    )
    return top_a.unionByName(top_h).orderBy("role", "rank")


# ---------------------------------------------------------------------------
# A89: Croston's method for intermittent demand
# ---------------------------------------------------------------------------

@query(
    "part_croston_demand",
    """
    WITH wk AS (
      SELECT l_partkey AS part,
             CAST(FLOOR(DATE_DIFF('day', DATE '1995-01-01',
               CAST(l_shipdate AS DATE)) / 7.0) AS BIGINT) AS week,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS d
      FROM lineitem GROUP BY 1, 2
    ),
    g AS (
      SELECT part, week, d,
             week - LAG(week) OVER (PARTITION BY part ORDER BY week) AS gap,
             ROW_NUMBER() OVER (PARTITION BY part ORDER BY week DESC) AS rdesc,
             COUNT(*) OVER (PARTITION BY part) AS n_points
      FROM wk
    ),
    z AS (
      SELECT part, n_points,
             list(d) OVER (PARTITION BY part ORDER BY week
                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS ds,
             rdesc
      FROM g
    ),
    zl AS (
      SELECT part, n_points,
             CAST(list_sum(list_transform(range(1, len(ds) + 1),
                  i -> ds[i] * (1::BIGINT << (i - 1)))) AS BIGINT) AS z_num,
             (1::BIGINT << len(ds)) - 1 AS z_den
      FROM z WHERE rdesc = 1
    ),
    iv AS (
      SELECT part, gap,
             ROW_NUMBER() OVER (PARTITION BY part ORDER BY week DESC) AS rdesc2,
             list(gap) OVER (PARTITION BY part ORDER BY week
                             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS gaps
      FROM g WHERE gap IS NOT NULL
    ),
    pl AS (
      SELECT part,
             CAST(list_sum(list_transform(range(1, len(gaps) + 1),
                  i -> gaps[i] * (1::BIGINT << (i - 1)))) AS BIGINT) AS p_num,
             (1::BIGINT << len(gaps)) - 1 AS p_den
      FROM iv WHERE rdesc2 = 1
    )
    SELECT zl.part, zl.n_points, zl.z_num, zl.z_den, pl.p_num, pl.p_den,
      CAST(ROUND(CAST(zl.z_num AS DOUBLE) * CAST(pl.p_den AS DOUBLE)
           / (CAST(zl.z_den AS DOUBLE) * CAST(pl.p_num AS DOUBLE))
           * 10000) AS BIGINT) AS croston_micro
    FROM zl JOIN pl ON zl.part = pl.part
    WHERE zl.n_points >= 4
    ORDER BY zl.part
    """,
)
def part_croston_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A89 — Croston's method for INTERMITTENT demand (the standard
    forecaster when most periods have zero demand — spare parts, long
    -tail SKUs — where plain EWMA systematically lags): separate
    exponential smoothing of (a) non-zero demand SIZES and (b) the
    INTERVALS between demand occurrences, forecast = size / interval
    per period.  A45's Holt/naive baselines assume dense series; this
    is the sparse-series member of the forecasting family.

    Determinism (the W8 EWMA device): both smoothers run with
    alpha = 1/2 over the last <= 8 points, so every weight is a power
    of two over exact integers — numerator Σ d_i·2^(i-1) and
    denominator 2^n − 1 are exact int64 in both engines; the Croston
    ratio (z_num·p_den)/(z_den·p_num) is one fixed double tree over
    four integers, micro-quantized.  Parts with < 4 demand points are
    excluded (no meaningful interval smoother).

    Scale shape: one (part, week) hash aggregate absorbs the corpus;
    the lag/window/list machinery runs over the demand-point table
    (bounded by parts x active weeks, sparse by construction); the
    final join is part-keyed on two one-row-per-part tables."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"),
        # FLOOR division on BOTH sides: DuckDB `//` TRUNCATES toward
        # zero (-10 // 7 = -1, verified on 1.0.0), so the oracle spells
        # out CAST(FLOOR(.../7.0) AS BIGINT) to get the floor-week grid
        # (-10 -> week -2) that Spark's floor(x/7) computes — pre-epoch
        # shipdates land in the same weekly bucket in both engines;
        # datediff stays well inside double-exact range so floor(x/7)
        # is exact
        F.expr(
            "cast(floor(datediff(cast(l_shipdate as date),"
            " date'1995-01-01') / 7) as long)"
        ).alias("week"),
        cents(F.col("l_quantity")).alias("qc"),
    )
    wk = li.groupBy("part", "week").agg(F.sum("qc").cast("long").alias("d"))
    w_ord = Window.partitionBy("part").orderBy("week")
    w_desc = Window.partitionBy("part").orderBy(F.col("week").desc())
    w_part = Window.partitionBy("part")
    g = wk.select(
        "part",
        "week",
        "d",
        (F.col("week") - F.lag("week").over(w_ord)).alias("gap"),
        F.row_number().over(w_desc).alias("rdesc"),
        F.count("*").over(w_part).alias("n_points"),
    )

    def _dyadic(col_list):
        # sum_i v_i * 2^(i-1) in EXACT int64 (matching the oracle's
        # integer list arithmetic): Horner over the reversed list,
        # acc = acc*2 + v — no double partials, so per-(part, week)
        # demands >= ~2^46 cents cannot silently diverge between
        # engines past the 2^53 double-integer ceiling
        return F.aggregate(
            F.reverse(col_list),
            F.lit(0).cast("long"),
            lambda acc, v: acc * F.lit(2).cast("long") + v.cast("long"),
        )

    w_frame = (
        Window.partitionBy("part").orderBy("week").rowsBetween(-7, 0)
    )
    ds = F.collect_list("d").over(w_frame)
    zl = (
        g.select(
            "part",
            "n_points",
            "rdesc",
            _dyadic(ds).alias("z_num"),
            (
                F.pow(F.lit(2.0), F.size(ds).cast("double")).cast("long") - 1
            ).alias("z_den"),
        )
        .where(F.col("rdesc") == 1)
        .drop("rdesc")
    )
    gaps_rows = g.where(F.col("gap").isNotNull())
    w_frame2 = (
        Window.partitionBy("part").orderBy("week").rowsBetween(-7, 0)
    )
    w_desc2 = Window.partitionBy("part").orderBy(F.col("week").desc())
    gaps = F.collect_list("gap").over(w_frame2)
    pl = (
        gaps_rows.select(
            "part",
            F.row_number().over(w_desc2).alias("rdesc2"),
            _dyadic(gaps).alias("p_num"),
            (
                F.pow(F.lit(2.0), F.size(gaps).cast("double")).cast("long") - 1
            ).alias("p_den"),
        )
        .where(F.col("rdesc2") == 1)
        .drop("rdesc2")
    )
    croston = F.round(
        F.col("z_num").cast("double")
        * F.col("p_den").cast("double")
        / (F.col("z_den").cast("double") * F.col("p_num").cast("double"))
        * 10000
    ).cast("long")
    return (
        zl.join(pl, "part")
        .where(F.col("n_points") >= 4)
        .select(
            "part",
            "n_points",
            "z_num",
            "z_den",
            "p_num",
            "p_den",
            croston.alias("croston_micro"),
        )
        .orderBy("part")
    )


# ---------------------------------------------------------------------------
# A90: Benjamini-Hochberg FDR control over a test family
# ---------------------------------------------------------------------------

# shared formula text (identical SQL on both engines): two-sided normal
# p-value via the Abramowitz-Stegun 26.2.17 tail polynomial (|eps| <
# 7.5e-8 — far below the micro quantization), evaluated on |z|
_PHI_TAIL = (
    "(EXP(-(ZG) * (ZG) / 2.0) / SQRT(2.0 * PI())"
    " * ((1.0 / (1.0 + 0.2316419 * (ZG)))"
    "    * (0.319381530 + (1.0 / (1.0 + 0.2316419 * (ZG)))"
    "       * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * (ZG)))"
    "          * (1.781477937 + (1.0 / (1.0 + 0.2316419 * (ZG)))"
    "             * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * (ZG)))"
    "                * 1.330274429))))))"
)


def _fdr_sql() -> str:
    z = (
        "((CAST(n_gd AS DOUBLE) / CAST(n_d AS DOUBLE)"
        " - CAST(n_g AS DOUBLE) / CAST(nn AS DOUBLE))"
        " / SQRT(CAST(n_g AS DOUBLE) / CAST(nn AS DOUBLE)"
        "        * (1.0 - CAST(n_g AS DOUBLE) / CAST(nn AS DOUBLE))"
        "        / CAST(n_d AS DOUBLE)))"
    )
    tail = _PHI_TAIL.replace("ZG", f"ABS({z})")
    return f"""
    WITH cell AS (
      SELECT event_type AS g, ISODOW(CAST(ts AS DATE)) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_gd
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT g, dow, n_gd,
             CAST(SUM(n_gd) OVER (PARTITION BY dow) AS BIGINT) AS n_d,
             CAST(SUM(n_gd) OVER (PARTITION BY g) AS BIGINT) AS n_g,
             CAST(SUM(n_gd) OVER () AS BIGINT) AS nn,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_tests
      FROM cell
    ),
    p AS (
      SELECT g, dow, n_gd, n_d, n_tests,
             CAST(ROUND({z} * 1000000) AS BIGINT) AS z_micro,
             CAST(ROUND(2.0 * {tail} * 1000000) AS BIGINT) AS p_micro
      FROM m WHERE n_g < nn
    ),
    r AS (
      SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_micro, g, dow) AS BIGINT)
                  AS rank
      FROM p
    ),
    st AS (
      SELECT *,
             CAST(MAX(CASE WHEN p_micro * n_tests <= rank * 50000
                           THEN rank ELSE 0 END) OVER () AS BIGINT) AS i_star,
             CAST(LEAST(1000000, MIN(
               CAST(ROUND(CAST(p_micro AS DOUBLE) * CAST(n_tests AS DOUBLE)
                    / CAST(rank AS DOUBLE)) AS BIGINT))
               OVER (ORDER BY rank DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS BIGINT) AS qval_micro
      FROM r
    )
    SELECT g AS event_type, dow, n_gd, n_d, z_micro, p_micro, rank,
           rank <= i_star AS rejected, qval_micro
    FROM st ORDER BY rank
    """


@query("events_fdr_bh", _fdr_sql())
def events_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A90 — Benjamini-Hochberg FDR control across a FAMILY of tests:
    35 one-sample proportion z-tests (is event type g over/under-
    represented on ISO weekday d vs its overall share?), ranked by
    p-value with the BH step-up rule at q = 0.05 and per-test
    q-values (the metrics-platform multiple-comparisons gate — A41/
    A53 report single tests; running 35 of them at alpha = 0.05
    uncorrected yields ~2 false flags by construction).

    Determinism: cell counts are exact int64; z is one fixed double
    tree; the two-sided normal p uses the Abramowitz-Stegun 26.2.17
    tail polynomial (|eps| < 7.5e-8) spelled as the SAME expression
    text on both engines, micro-quantized BEFORE ranking so the BH
    order is integer; the step-up comparison p_(i) <= (i/m)q runs as
    the exact integer cross-multiplication p_micro*m <= i*50000.

    Scale shape: one (type, weekday)-keyed aggregate absorbs the
    corpus; every window (marginals, ranking, step-up, q-value
    cummin) runs over the 35-row test table."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        (F.expr("weekday(ts)") + 1).cast("int").alias("dow"),
    )
    cell = ev.groupBy("g", "dow").agg(F.count("*").cast("long").alias("n_gd"))
    w_d = Window.partitionBy("dow")
    w_g = Window.partitionBy("g")
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = _bsg(cell).select(
        "g",
        "dow",
        "n_gd",
        F.sum("n_gd").over(w_d).cast("long").alias("n_d"),
        F.sum("n_gd").over(w_g).cast("long").alias("n_g"),
        F.sum("n_gd").over(w_all).cast("long").alias("nn"),
        F.count("*").over(w_all).cast("long").alias("n_tests"),
    )
    z_sql = (
        "((CAST(n_gd AS DOUBLE) / CAST(n_d AS DOUBLE)"
        " - CAST(n_g AS DOUBLE) / CAST(nn AS DOUBLE))"
        " / SQRT(CAST(n_g AS DOUBLE) / CAST(nn AS DOUBLE)"
        "        * (1.0 - CAST(n_g AS DOUBLE) / CAST(nn AS DOUBLE))"
        "        / CAST(n_d AS DOUBLE)))"
    )
    tail_sql = _PHI_TAIL.replace("ZG", f"ABS({z_sql})")
    p = m.where(F.col("n_g") < F.col("nn")).select(
        "g",
        "dow",
        "n_gd",
        "n_d",
        "n_tests",
        F.expr(f"CAST(ROUND({z_sql} * 1000000) AS BIGINT)").alias("z_micro"),
        F.expr(f"CAST(ROUND(2.0 * {tail_sql} * 1000000) AS BIGINT)").alias(
            "p_micro"
        ),
    )
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    p = bounded_single_group(p)  # (k-group x 7-dow)-bounded test grid
    w_rank = Window.partitionBy("__opid").orderBy("p_micro", "g", "dow")
    r = p.withColumn("rank", F.row_number().over(w_rank).cast("long"))
    w_all2 = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_qd = (
        Window.partitionBy("__opid")
        .orderBy(F.col("rank").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    qterm = F.round(
        F.col("p_micro").cast("double")
        * F.col("n_tests").cast("double")
        / F.col("rank").cast("double")
    ).cast("long")
    st = r.select(
        "g",
        "dow",
        "n_gd",
        "n_d",
        "z_micro",
        "p_micro",
        "rank",
        F.max(
            F.when(
                F.col("p_micro") * F.col("n_tests") <= F.col("rank") * 50000,
                F.col("rank"),
            ).otherwise(F.lit(0))
        )
        .over(w_all2)
        .cast("long")
        .alias("i_star"),
        F.least(F.lit(1000000).cast("long"), F.min(qterm).over(w_qd).cast("long")).alias(
            "qval_micro"
        ),
    )
    return st.select(
        F.col("g").alias("event_type"),
        "dow",
        "n_gd",
        "n_d",
        "z_micro",
        "p_micro",
        "rank",
        (F.col("rank") <= F.col("i_star")).alias("rejected"),
        "qval_micro",
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# L27: TextRank keyword extraction over the corpus word graph
# ---------------------------------------------------------------------------

_TR_ITERS = 2
_TR_TOPK = 20
_TR_TOKS = (
    "[x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')"
    " if len(x) >= 4]"
)


def _duck_textrank_sql(n_iter: int = _TR_ITERS, k: int = _TR_TOPK) -> str:
    """DuckDB replay: same word graph, same integer fixed-point
    PageRank iterations as _duck_pagerank_sql."""
    parts = [
        f"""
    WITH d AS (SELECT {_TR_TOKS} AS ws FROM documents),
    adjp AS (
      SELECT unnest([{{'u': ws[i], 'v': ws[i + 1]}}
                     for i in range(1, len(ws))]) AS pv
      FROM d WHERE len(ws) >= 2),
    skipp AS (
      SELECT unnest([{{'u': ws[i], 'v': ws[i + 2]}}
                     for i in range(1, len(ws) - 1)]) AS pv
      FROM d WHERE len(ws) >= 3),
    eb AS (
      SELECT DISTINCT pv.u AS u, pv.v AS v FROM (
        SELECT pv FROM adjp UNION ALL SELECT pv FROM skipp)
      WHERE pv.u <> pv.v),
    e AS (SELECT u, v FROM eb UNION SELECT v AS u, u AS v FROM eb),
    deg AS (SELECT u, COUNT(*) AS outdeg FROM e GROUP BY u),
    nodes AS (SELECT DISTINCT u AS node FROM e),
    p0 AS (SELECT node, CAST(1000000 AS BIGINT) AS p FROM nodes)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
    c{i} AS (SELECT e.v AS node, p{i - 1}.p // deg.outdeg AS c
            FROM e JOIN deg ON e.u = deg.u JOIN p{i - 1} ON e.u = p{i - 1}.node),
    s{i} AS (SELECT node, SUM(c) AS s FROM c{i} GROUP BY node),
    p{i} AS (SELECT n.node,
                   CAST(150000 + (850000 * COALESCE(s{i}.s, 0)) // 1000000 AS BIGINT) AS p
            FROM nodes n LEFT JOIN s{i} ON n.node = s{i}.node)"""
        )
    parts.append(
        f"""
    SELECT node AS word, p AS textrank_micro, rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY p DESC, node) AS rank
          FROM p{n_iter})
    WHERE rank <= {k} ORDER BY rank"""
    )
    return "".join(parts)


@query("text_textrank_keywords", _duck_textrank_sql())
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L27 — TextRank keyword extraction (Mihalcea & Tarau 2004,
    arXiv:cs/0409007-adjacent): corpus-level keywords as PageRank over
    the word co-occurrence graph (window 3 on the candidate-filtered
    token sequence, words >= 4 chars standing in for the POS filter),
    undirected via symmetrization.  L4v's RAKE scores phrases by
    degree statistics inside each doc; TextRank ranks by global graph
    centrality — the two standard unsupervised keyphrase families.

    Exactness: reuses GR2's integer fixed-point PageRank verbatim
    (micro-unit scores, floor-div contributions — bit-identical across
    engines and reduction orders); the graph build is deterministic
    (distinct pairs, lexical self-loop drop); top-k ties break on the
    word.

    Plan shape: token pairs are map-only transforms on the text scan;
    the graph collapses to DISTINCT edges (vocabulary-bounded, never
    corpus-bounded); each iteration is one edge-table join + agg —
    at 100 TB the corpus is touched once, everything after runs on
    the vocabulary graph."""
    from bytesprocessor_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda t: F.length(t) >= 4,
    )
    d = docs.select(ws.alias("ws"))
    adj = d.where(F.size("ws") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("u"),
                    F.element_at("ws", i + 1).alias("v"),
                ),
            )
        ).alias("pv")
    )
    skip = d.where(F.size("ws") >= 3).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 2),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("u"),
                    F.element_at("ws", i + 2).alias("v"),
                ),
            )
        ).alias("pv")
    )
    eb = (
        adj.unionByName(skip)
        .select(F.col("pv.u").alias("u"), F.col("pv.v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    edges = (
        eb.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(eb.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .distinct()
    )
    p = pagerank(edges, n_iter=_TR_ITERS)
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    # vocabulary-sized rank table: TakeOrdered the top-k, rank the
    # bounded prefix (identical under the unique order)
    w = Window.partitionBy("__opid").orderBy(F.col("p").desc(), "node")
    return (
        bounded_single_group(
            p.orderBy(F.col("p").desc(), "node").limit(_TR_TOPK)
        )
        .select(
            F.col("node").alias("word"),
            F.col("p").alias("textrank_micro"),
            F.row_number().over(w).alias("rank"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# A91: Cochran-Armitage trend test across ordered categories
# ---------------------------------------------------------------------------

@query(
    "events_cochran_armitage",
    """
    WITH cell AS (
      SELECT ISODOW(CAST(ts AS DATE)) AS dose,
             CAST(COUNT(*) AS BIGINT) AS n_d,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_d
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT dose, n_d, r_d,
             CAST(SUM(n_d) OVER () AS BIGINT) AS nn,
             CAST(SUM(r_d) OVER () AS BIGINT) AS rr,
             CAST(SUM(dose * r_d) OVER () AS BIGINT) AS swr,
             CAST(SUM(dose * n_d) OVER () AS BIGINT) AS swn,
             CAST(SUM(dose * dose * n_d) OVER () AS BIGINT) AS sw2n
      FROM cell
    )
    SELECT dose, n_d, r_d,
      CAST(ROUND(
        (CAST(swr AS DOUBLE) - CAST(rr AS DOUBLE) * CAST(swn AS DOUBLE)
           / CAST(nn AS DOUBLE))
        / SQRT(CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)
               * (1.0 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
               * (CAST(sw2n AS DOUBLE) - CAST(swn AS DOUBLE)
                  * CAST(swn AS DOUBLE) / CAST(nn AS DOUBLE)))
        * 1000000) AS BIGINT) AS z_micro
    FROM m ORDER BY dose
    """,
)
def events_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A91 — Cochran-Armitage trend test: does the purchase rate rise
    or fall MONOTONICALLY across an ordered factor (ISO weekday 1..7
    as the dose scores)?  A41's chi-square asks "is the rate the same
    everywhere" and burns power on non-monotone wiggles; CA targets
    the one-degree-of-freedom linear trend — the test behind
    "conversion degrades over the week" claims.

    Z = [Σw·r_d − R·Σw·n_d/N] / sqrt(p(1-p)·(Σw²n_d − (Σw·n_d)²/N)),
    all five moments exact int64 from one pass, Z one fixed double
    tree, micro-quantized.

    Scale shape: one weekday-keyed aggregate absorbs the corpus; the
    moment windows run over 7 rows."""
    ev = _t(spark, sf_dir, "events").select(
        (F.expr("weekday(ts)") + 1).cast("int").alias("dose"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    cell = ev.groupBy("dose").agg(
        F.count("*").cast("long").alias("n_d"),
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("r_d"),
    )
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = _bsg(cell).select(
        "dose",
        "n_d",
        "r_d",
        F.sum("n_d").over(w_all).cast("long").alias("nn"),
        F.sum("r_d").over(w_all).cast("long").alias("rr"),
        F.sum(F.col("dose") * F.col("r_d")).over(w_all).cast("long").alias("swr"),
        F.sum(F.col("dose") * F.col("n_d")).over(w_all).cast("long").alias("swn"),
        F.sum(F.col("dose") * F.col("dose") * F.col("n_d"))
        .over(w_all)
        .cast("long")
        .alias("sw2n"),
    )
    nnD, rrD = F.col("nn").cast("double"), F.col("rr").cast("double")
    swrD, swnD, sw2nD = (
        F.col("swr").cast("double"),
        F.col("swn").cast("double"),
        F.col("sw2n").cast("double"),
    )
    pbar = rrD / nnD
    z = (swrD - rrD * swnD / nnD) / F.sqrt(
        pbar * (1.0 - pbar) * (sw2nD - swnD * swnD / nnD)
    )
    return m.select(
        "dose",
        "n_d",
        "r_d",
        F.round(z * 1000000).cast("long").alias("z_micro"),
    ).orderBy("dose")


# ---------------------------------------------------------------------------
# A92: Brown-Forsythe variance-homogeneity test
# ---------------------------------------------------------------------------

@query(
    "events_brown_forsythe",
    """
    WITH e AS (
      SELECT event_type AS g, CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events
    ),
    med AS (
      SELECT g, CAST(quantile_disc(v, 0.5) AS BIGINT) AS med FROM e GROUP BY g
    ),
    z AS (
      SELECT e.g, ABS(e.v - med.med) AS z
      FROM e JOIN med ON e.g = med.g
    ),
    s AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(z) AS BIGINT) AS s1,
             CAST(SUM(z * z) AS BIGINT) AS s2
      FROM z GROUP BY g
    ),
    m AS (
      SELECT g, n, s1, s2,
             CAST(SUM(n) OVER () AS BIGINT) AS nn,
             CAST(SUM(s1) OVER () AS BIGINT) AS ss,
             CAST(SUM(CAST(ROUND(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  / CAST(n AS DOUBLE)) AS BIGINT)) OVER () AS BIGINT) AS bterm,
             CAST(SUM(s2) OVER () AS BIGINT) AS q,
             CAST(COUNT(*) OVER () AS BIGINT) AS k
      FROM s
    )
    SELECT g AS event_type, n, s1, s2,
      CAST(ROUND(
        ((CAST(bterm AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
            / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
        / ((CAST(q AS DOUBLE) - CAST(bterm AS DOUBLE))
           / CAST(nn - k AS DOUBLE))
        * 1000000) AS BIGINT) AS f_micro
    FROM m ORDER BY event_type
    """,
)
def events_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A92 — Brown-Forsythe test (Levene's test with group MEDIANS)
    for variance homogeneity across the event-type populations: the
    assumption check behind A55's one-way ANOVA (whose F is only
    calibrated under equal variances) and the robust default (mean-
    centered Levene is itself fragile under skew).  W = one-way ANOVA
    F computed on z = |x - median_g|.

    Determinism: group medians are percentile_disc — actual data
    points, exact int64 cents — so z is exact int64; the ANOVA F
    reduces to exact moments (n, Σz, Σz² per group) with the per-group
    between-term s1²/n quantized to an integer before the k-row sum
    (the A87 device), F one fixed double tree.

    Scale shape: one aggregate computes the k medians (percentile_disc
    is a single-pass sketchless aggregate here — the value domain is
    bounded), the medians broadcast back onto the scan, one moment
    aggregate finishes; windows run over k rows."""
    e = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), cents(F.col("value")).alias("v")
    )
    med = e.groupBy("g").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
        .cast("long")
        .alias("med")
    )
    z = e.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("v") - F.col("med")).alias("z")
    )
    s = z.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("z").cast("long").alias("s1"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("s2"),
    )
    bterm_row = F.round(
        F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n").cast("double")
    ).cast("long")
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = _bsg(s).select(
        "g",
        "n",
        "s1",
        "s2",
        F.sum("n").over(w_all).cast("long").alias("nn"),
        F.sum("s1").over(w_all).cast("long").alias("ss"),
        F.sum(bterm_row).over(w_all).cast("long").alias("bterm"),
        F.sum("s2").over(w_all).cast("long").alias("q"),
        F.count("*").over(w_all).cast("long").alias("k"),
    )
    nnD, ssD = F.col("nn").cast("double"), F.col("ss").cast("double")
    btD, qD = F.col("bterm").cast("double"), F.col("q").cast("double")
    between = (btD - ssD * ssD / nnD) / (F.col("k") - 1).cast("double")
    within = (qD - btD) / (F.col("nn") - F.col("k")).cast("double")
    return m.select(
        F.col("g").alias("event_type"),
        "n",
        "s1",
        "s2",
        F.round(between / within * 1000000).cast("long").alias("f_micro"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# EV25: Qini uplift curve for treatment-effect model evaluation
# ---------------------------------------------------------------------------

@query(
    "eval_qini_uplift",
    """
    WITH e AS (
      SELECT event_id,
             (user_id % 2 = 0) AS treated,
             (event_type = 'purchase') AS y,
             CAST(ROUND(value * 100) AS BIGINT) + 7 * (user_id % 13) AS score
      FROM events
    ),
    dec AS (
      SELECT treated, y,
             NTILE(10) OVER (ORDER BY score DESC, event_id) AS decile
      FROM e
    ),
    cell AS (
      SELECT decile,
             CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_c,
             CAST(SUM(CASE WHEN treated AND y THEN 1 ELSE 0 END) AS BIGINT)
               AS r_t,
             CAST(SUM(CASE WHEN NOT treated AND y THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_c
      FROM dec GROUP BY decile
    ),
    cum AS (
      SELECT decile, n_t, n_c, r_t, r_c,
             CAST(SUM(n_t) OVER (ORDER BY decile) AS BIGINT) AS cn_t,
             CAST(SUM(n_c) OVER (ORDER BY decile) AS BIGINT) AS cn_c,
             CAST(SUM(r_t) OVER (ORDER BY decile) AS BIGINT) AS cr_t,
             CAST(SUM(r_c) OVER (ORDER BY decile) AS BIGINT) AS cr_c
      FROM cell
    )
    SELECT decile, n_t, n_c, r_t, r_c,
      CASE WHEN cn_c > 0 THEN
        CAST(ROUND((CAST(cr_t AS DOUBLE)
             - CAST(cr_c AS DOUBLE) * CAST(cn_t AS DOUBLE)
               / CAST(cn_c AS DOUBLE)) * 1000000) AS BIGINT)
      ELSE NULL END AS qini_micro
    FROM cum ORDER BY decile
    """,
)
def eval_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV25 — Qini curve: the standard evaluation for UPLIFT models
    (does targeting the model's top-k% actually cause more
    conversions than random?), over a logged 50/50 experiment
    (treatment = user parity).  At each score decile k the cumulative
    incremental conversions are Qini(k) = R_t(k) − R_c(k)·N_t(k)/
    N_c(k) — the treated conversions minus what the control arm
    predicts they'd have converted anyway, scaled to the treated
    exposure.  EV14's lift/gains grade a RESPONSE model (who
    converts); Qini grades a TREATMENT-EFFECT model (who converts
    BECAUSE treated) — confusing the two over-targets sure things.

    Determinism: NTILE over a UNIQUE total order (score desc,
    event_id) assigns identical deciles in both engines (both put the
    remainder rows in the leading buckets); all counts exact int64;
    Qini one fixed double tree per decile row.

    Scale shape: the decile assignment is the DISTRIBUTED NTILE
    device (operators/ranking.py: range-partitioned local rank +
    broadcast offsets + exact-int64 bucket arithmetic — bit-identical
    to SQL NTILE, no single-partition window); everything after runs
    on 10 rows."""
    from bytesprocessor_spark.operators.ranking import distributed_ntile

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 2 == 0).alias("treated"),
        (F.col("event_type") == "purchase").alias("y"),
        (cents(F.col("value")) + 7 * (F.col("user_id") % 13)).alias("score"),
    )
    dec = distributed_ntile(
        ev, [F.col("score").desc(), F.col("event_id").asc()], 10, tile_col="decile"
    ).select("treated", "y", "decile")
    cell = dec.groupBy("decile").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(~F.col("treated"), 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treated") & F.col("y"), 1).otherwise(0))
        .cast("long")
        .alias("r_t"),
        F.sum(F.when(~F.col("treated") & F.col("y"), 1).otherwise(0))
        .cast("long")
        .alias("r_c"),
    )
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    cell = bounded_single_group(cell)  # 10-row decile aggregate
    w_cum = (
        Window.partitionBy("__opid")
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cell.select(
        "decile",
        "n_t",
        "n_c",
        "r_t",
        "r_c",
        F.sum("n_t").over(w_cum).cast("long").alias("cn_t"),
        F.sum("n_c").over(w_cum).cast("long").alias("cn_c"),
        F.sum("r_t").over(w_cum).cast("long").alias("cr_t"),
        F.sum("r_c").over(w_cum).cast("long").alias("cr_c"),
    )
    qini = (
        F.col("cr_t").cast("double")
        - F.col("cr_c").cast("double")
        * F.col("cn_t").cast("double")
        / F.col("cn_c").cast("double")
    )
    return cum.select(
        "decile",
        "n_t",
        "n_c",
        "r_t",
        "r_c",
        F.when(F.col("cn_c") > 0, F.round(qini * 1000000).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("qini_micro"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# EV26: Krippendorff's alpha (multi-rater, missing-tolerant agreement)
# ---------------------------------------------------------------------------

@query(
    "eval_krippendorff_alpha",
    """
    WITH lab AS (
      SELECT event_id AS unit, r,
             CASE WHEN (r = 1 AND event_id % 5 = 0)
                    OR (r = 2 AND event_id % 7 = 0) THEN
               CASE event_type
                 WHEN 'click' THEN 'error' WHEN 'error' THEN 'purchase'
                 WHEN 'purchase' THEN 'signup' WHEN 'signup' THEN 'view'
                 ELSE 'click' END
             ELSE event_type END AS label
      FROM events, (SELECT unnest([0, 1, 2]) AS r)
      WHERE (event_id + r) % 4 <> 0
    ),
    o AS (
      SELECT unit, label, CAST(COUNT(*) AS BIGINT) AS o
      FROM lab GROUP BY unit, label
    ),
    u AS (
      SELECT unit, CAST(SUM(o) AS BIGINT) AS m,
             CAST(SUM(o * o) AS BIGINT) AS so2
      FROM o GROUP BY unit
    ),
    douv AS (
      SELECT CAST(SUM(CAST(ROUND(
               CAST(m * m - so2 AS DOUBLE) / CAST(m - 1 AS DOUBLE)
               * 1000000000) AS BIGINT)) AS BIGINT) AS do_nano,
             CAST(SUM(m) AS BIGINT) AS n_ratings,
             CAST(COUNT(*) AS BIGINT) AS n_units
      FROM u WHERE m >= 2
    ),
    lc AS (
      SELECT label, CAST(SUM(o) AS BIGINT) AS n_c
      FROM o JOIN u USING (unit) WHERE u.m >= 2 GROUP BY label
    ),
    de AS (
      SELECT CAST(SUM(n_c) AS BIGINT) AS n_tot,
             CAST(SUM(n_c * n_c) AS BIGINT) AS sn2
      FROM lc
    )
    SELECT douv.n_units, douv.n_ratings, douv.do_nano,
      CAST(ROUND(
        (CAST(de.n_tot AS DOUBLE) * CAST(de.n_tot AS DOUBLE)
         - CAST(de.sn2 AS DOUBLE))
        / (CAST(de.n_tot AS DOUBLE) * (CAST(de.n_tot AS DOUBLE) - 1.0))
        * 1000000) AS BIGINT) AS de_micro,
      CAST(ROUND(
        (1.0 - (CAST(douv.do_nano AS DOUBLE) / 1000000000.0
                / CAST(douv.n_ratings AS DOUBLE))
         / ((CAST(de.n_tot AS DOUBLE) * CAST(de.n_tot AS DOUBLE)
             - CAST(de.sn2 AS DOUBLE))
            / (CAST(de.n_tot AS DOUBLE)
               * (CAST(de.n_tot AS DOUBLE) - 1.0))))
        * 1000000) AS BIGINT) AS alpha_micro
    FROM douv, de
    """,
)
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV26 — Krippendorff's alpha (nominal): the agreement
    coefficient that EV23's kappa cannot be — it handles ANY number
    of raters and MISSING ratings (every real labeling pipeline has
    raters who skipped units).  Three deterministic raters label
    events (rater 0 = truth; raters 1/2 disagree on fixed slices;
    each rater skips units on an id-arithmetic schedule, so units
    carry 2-3 ratings).

    alpha = 1 − D_o/D_e with nominal disagreement: per pairable unit
    D_o term = (m_u² − Σ_c o_uc²)/(m_u−1) (ordered disagreeing
    pairs), D_e from the pooled label marginals (n² − Σn_c²)/(n(n−1)).
    Per-unit terms quantize to nano BEFORE the cross-unit sum (exact
    integer reduction — the A88 device); both coefficients and alpha
    are fixed double trees over int64 totals.

    Scale shape: the rater fan-out is a 3-row array explode on the
    scan; one (unit,label) aggregate, one unit rollup, one label
    rollup — all hash aggs keyed by unit or label; readout is 1 row."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type")
    r = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r")
    fan = ev.select("event_id", "event_type", r).where(
        (F.col("event_id") + F.col("r")) % 4 != 0
    )
    nxt = (
        F.when(F.col("event_type") == "click", "error")
        .when(F.col("event_type") == "error", "purchase")
        .when(F.col("event_type") == "purchase", "signup")
        .when(F.col("event_type") == "signup", "view")
        .otherwise("click")
    )
    lab = fan.select(
        F.col("event_id").alias("unit"),
        F.when(
            ((F.col("r") == 1) & (F.col("event_id") % 5 == 0))
            | ((F.col("r") == 2) & (F.col("event_id") % 7 == 0)),
            nxt,
        )
        .otherwise(F.col("event_type"))
        .alias("label"),
    )
    o = lab.groupBy("unit", "label").agg(F.count("*").cast("long").alias("o"))
    u = o.groupBy("unit").agg(
        F.sum("o").cast("long").alias("m"),
        F.sum(F.col("o") * F.col("o")).cast("long").alias("so2"),
    )
    term_nano = F.round(
        (F.col("m") * F.col("m") - F.col("so2")).cast("double")
        / (F.col("m") - 1).cast("double")
        * 1e9
    ).cast("long")
    douv = u.where(F.col("m") >= 2).agg(
        F.sum(term_nano).cast("long").alias("do_nano"),
        F.sum("m").cast("long").alias("n_ratings"),
        F.count("*").cast("long").alias("n_units"),
    )
    lc = (
        o.join(u.where(F.col("m") >= 2).select("unit"), "unit")
        .groupBy("label")
        .agg(F.sum("o").cast("long").alias("n_c"))
    )
    de = lc.agg(
        F.sum("n_c").cast("long").alias("n_tot"),
        F.sum(F.col("n_c") * F.col("n_c")).cast("long").alias("sn2"),
    )
    ntD = F.col("n_tot").cast("double")
    de_val = (ntD * ntD - F.col("sn2").cast("double")) / (ntD * (ntD - 1.0))
    do_val = F.col("do_nano").cast("double") / 1e9 / F.col("n_ratings").cast("double")
    return douv.crossJoin(F.broadcast(de)).select(
        "n_units",
        "n_ratings",
        "do_nano",
        F.round(de_val * 1000000).cast("long").alias("de_micro"),
        F.round((1.0 - do_val / de_val) * 1000000).cast("long").alias("alpha_micro"),
    )


# ---------------------------------------------------------------------------
# A93: panel fixed-effects (within) estimator
# ---------------------------------------------------------------------------

@query(
    "events_panel_within",
    """
    WITH e AS (
      SELECT user_id AS u, ISODOW(CAST(ts AS DATE)) AS x,
             CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events
    ),
    peru AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM e GROUP BY u
    ),
    terms AS (
      SELECT n, sx, sy, sxy, sxx,
        CAST(ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / CAST(n AS DOUBLE) * 1000000) AS BIGINT) AS num_micro,
        CAST(ROUND((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) * 1000000) AS BIGINT) AS den_micro
      FROM peru
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(SUM(num_micro) AS BIGINT) AS wnum,
             CAST(SUM(den_micro) AS BIGINT) AS wden,
             CAST(SUM(sx) AS BIGINT) AS gsx, CAST(SUM(sy) AS BIGINT) AS gsy,
             CAST(SUM(sxy) AS BIGINT) AS gsxy,
             CAST(SUM(sxx) AS BIGINT) AS gsxx
      FROM terms
    )
    SELECT n_users, n_rows,
      CAST(ROUND(CAST(wnum AS DOUBLE) / CAST(wden AS DOUBLE) * 1000000)
           AS BIGINT) AS beta_within_micro,
      CAST(ROUND(
        (CAST(n_rows AS DOUBLE) * CAST(gsxy AS DOUBLE)
         - CAST(gsx AS DOUBLE) * CAST(gsy AS DOUBLE))
        / (CAST(n_rows AS DOUBLE) * CAST(gsxx AS DOUBLE)
           - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE))
        * 1000000) AS BIGINT) AS beta_pooled_micro
    FROM g
    """,
)
def events_panel_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A93 — panel fixed-effects (within) estimator: the slope of
    value on weekday AFTER removing per-user level differences —
    the workhorse of metric econometrics (A70's OLS pools users, so
    heavy users' levels confound the slope; the within transform
    y−ȳ_u, x−x̄_u is algebraically the user-fixed-effects
    regression).  Reported next to the pooled slope: the gap IS the
    confound.

    Determinism: per-user moments (n, Σx, Σy, Σxy, Σxx) are exact
    int64; each user's demeaned cross/sum-of-squares contribution
    (n·Σxy − ΣxΣy)/n is one double expression micro-quantized BEFORE
    the cross-user sum (the A88 device); both betas are single
    divisions over int64 totals.

    Scale shape: one user-keyed hash aggregate absorbs the corpus
    (map-side combinable); the term table is entity-bounded; readout
    is 1 row.  Bound: per-user micro terms ~1e13 x 5e4 users at sf1
    stays inside int64 (documented rescale path: drop to milli past
    ~1e9 users)."""
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        (F.expr("weekday(ts)") + 1).cast("long").alias("x"),
        cents(F.col("value")).alias("y"),
    )
    peru = e.groupBy("u").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nD = F.col("n").cast("double")
    num_micro = F.round(
        (nD * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / nD
        * 1000000
    ).cast("long")
    den_micro = F.round(
        (nD * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
        / nD
        * 1000000
    ).cast("long")
    g = peru.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(num_micro).cast("long").alias("wnum"),
        F.sum(den_micro).cast("long").alias("wden"),
        F.sum("sx").cast("long").alias("gsx"),
        F.sum("sy").cast("long").alias("gsy"),
        F.sum("sxy").cast("long").alias("gsxy"),
        F.sum("sxx").cast("long").alias("gsxx"),
    )
    nrD = F.col("n_rows").cast("double")
    pooled = (
        nrD * F.col("gsxy").cast("double")
        - F.col("gsx").cast("double") * F.col("gsy").cast("double")
    ) / (
        nrD * F.col("gsxx").cast("double")
        - F.col("gsx").cast("double") * F.col("gsx").cast("double")
    )
    return g.select(
        "n_users",
        "n_rows",
        F.round(F.col("wnum").cast("double") / F.col("wden").cast("double") * 1000000)
        .cast("long")
        .alias("beta_within_micro"),
        F.round(pooled * 1000000).cast("long").alias("beta_pooled_micro"),
    )


# ---------------------------------------------------------------------------
# L28: term burstiness (variance-to-mean over containing docs)
# ---------------------------------------------------------------------------

@query(
    "text_burstiness",
    """
    WITH d AS (
      SELECT doc_id,
             unnest([x for x in regexp_split_to_array(lower(text),
                     '[^a-z0-9]+') if len(x) >= 3]) AS w
      FROM documents
    ),
    c AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
          FROM d GROUP BY doc_id, w),
    s AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS s1,
             CAST(SUM(c * c) AS BIGINT) AS s2
      FROM c GROUP BY w HAVING COUNT(*) >= 5
    )
    SELECT w AS term, df, s1 AS total_count,
      CAST(ROUND(
        ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
            / CAST(df AS DOUBLE)) / CAST(df - 1 AS DOUBLE))
        / (CAST(s1 AS DOUBLE) / CAST(df AS DOUBLE))
        * 1000000) AS BIGINT) AS vmr_micro
    FROM s
    ORDER BY vmr_micro DESC, term LIMIT 15
    """,
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L28 — term burstiness (Church & Gale): the variance-to-mean
    ratio of a term's per-document counts over the documents that
    CONTAIN it.  Content words are bursty (VMR >> 1: once a doc
    mentions them, it mentions them repeatedly); function words are
    Poisson-ish (VMR ~ 1).  The statistic behind burstiness-aware
    term weighting and stopword discovery — a different axis than
    frequency (L4d) or distinctiveness (L4q): a rare term can still
    be non-bursty.

    Determinism: per-(doc, term) counts and the per-term moments
    (df, Σc, Σc²) are exact int64; VMR is one fixed double tree,
    micro-quantized; top-k ties break on the term.

    Scale shape: map-only tokenize + explode on the text scan, one
    (doc, term) aggregate, one term rollup (vocabulary-bounded), a
    distributed TakeOrdered readout.  df >= 5 keeps the estimator
    out of the small-sample regime."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda t: F.length(t) >= 3,
    )
    d = docs.select("doc_id", F.explode(ws).alias("w"))
    c = d.groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("c"))
    s = (
        c.groupBy("w")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("c").cast("long").alias("s1"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
        )
        .where(F.col("df") >= 5)
    )
    dfD, s1D, s2D = (
        F.col("df").cast("double"),
        F.col("s1").cast("double"),
        F.col("s2").cast("double"),
    )
    vmr = ((s2D - s1D * s1D / dfD) / (F.col("df") - 1).cast("double")) / (s1D / dfD)
    return (
        s.select(
            F.col("w").alias("term"),
            "df",
            F.col("s1").alias("total_count"),
            F.round(vmr * 1000000).cast("long").alias("vmr_micro"),
        )
        .orderBy(F.col("vmr_micro").desc(), "term")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# L29: per-source tokenizer-budget audit
# ---------------------------------------------------------------------------

@query(
    "corpus_tokenizer_audit",
    """
    WITH d AS (
      SELECT source,
             len([x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
                  if len(x) > 0]) AS n_toks,
             CAST(COALESCE(list_sum(
               [len(x) for x in regexp_split_to_array(lower(text),
                '[^a-z0-9]+') if len(x) > 0]), 0) AS BIGINT) AS tok_chars,
             strlen(text) AS n_bytes
      FROM documents
    ),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
             CAST(SUM(COALESCE(tok_chars, 0)) AS BIGINT) AS n_tok_chars,
             CAST(SUM(n_bytes) AS BIGINT) AS n_bytes
      FROM d GROUP BY source
    )
    SELECT source, n_docs, n_tokens, n_tok_chars, n_bytes,
      CAST(ROUND(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) * 1000)
           AS BIGINT) AS toks_per_doc_milli,
      CAST(ROUND(CAST(n_tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
           * 1000) AS BIGINT) AS chars_per_tok_milli,
      CAST(ROUND(CAST(n_bytes AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1000)
           AS BIGINT) AS bytes_per_tok_milli
    FROM s ORDER BY source
    """,
)
def corpus_tokenizer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L29 — per-source tokenizer-budget audit: docs, tokens, token
    chars, raw bytes, and the three budget ratios (tokens/doc,
    chars/token = fertility, bytes/token) per corpus source — the
    read a pretraining-data team runs to price each source in token
    budget terms and spot fertility outliers (a source whose
    bytes/token is 2x the rest is binary-ish or non-language).  L26
    prices the vocab; this prices the SOURCES.

    Determinism: all five counters are exact int64; ratios are single
    divisions milli-quantized.

    Scale shape: map-only tokenize on the scan (counts only — token
    strings never shuffle), one source-keyed aggregate; readout is
    k-source rows."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda t: F.length(t) > 0,
    )
    d = docs.select(
        "source",
        F.size(toks).cast("long").alias("n_toks"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("tok_chars"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    s = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum("tok_chars").cast("long").alias("n_tok_chars"),
        F.sum("n_bytes").cast("long").alias("n_bytes"),
    )
    return s.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_tok_chars",
        "n_bytes",
        F.round(F.col("n_tokens").cast("double") / F.col("n_docs").cast("double") * 1000)
        .cast("long")
        .alias("toks_per_doc_milli"),
        F.round(
            F.col("n_tok_chars").cast("double") / F.col("n_tokens").cast("double") * 1000
        )
        .cast("long")
        .alias("chars_per_tok_milli"),
        F.round(F.col("n_bytes").cast("double") / F.col("n_tokens").cast("double") * 1000)
        .cast("long")
        .alias("bytes_per_tok_milli"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# A94: Weibull survival fit by median-rank regression
# ---------------------------------------------------------------------------

@query(
    "orders_weibull_fit",
    """
    WITH d AS (
      SELECT CAST(DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                            CAST(s.first_ship AS DATE)) AS BIGINT) AS t,
             o.o_orderkey AS k
      FROM orders o
      JOIN (SELECT l_orderkey, MIN(l_shipdate) AS first_ship
            FROM lineitem GROUP BY l_orderkey) s
        ON o.o_orderkey = s.l_orderkey
      WHERE DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                      CAST(s.first_ship AS DATE)) >= 1
    ),
    r AS (
      SELECT t, ROW_NUMBER() OVER (ORDER BY t, k) AS i,
             COUNT(*) OVER () AS n
      FROM d
    ),
    q AS (
      SELECT
        CAST(ROUND(LN(CAST(t AS DOUBLE)) * 10000) AS BIGINT) AS xq,
        CAST(ROUND(LN(-LN(1.0 - (CAST(i AS DOUBLE) - 0.3)
                              / (CAST(n AS DOUBLE) + 0.4))) * 10000)
             AS BIGINT) AS yq,
        n
      FROM r
    ),
    m AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
             CAST(SUM(xq * yq) AS BIGINT) AS sxy,
             CAST(SUM(xq * xq) AS BIGINT) AS sxx
      FROM q
    )
    SELECT n,
      CAST(ROUND(
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000) AS BIGINT)
        AS shape_milli,
      CAST(ROUND(EXP(
        -((CAST(sy AS DOUBLE) / 10000.0
           - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * CAST(sx AS DOUBLE) / 10000.0) / CAST(n AS DOUBLE))
        / ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
        * 1000) AS BIGINT) AS scale_days_milli
    FROM m
    """,
)
def orders_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A94 — parametric Weibull fit of time-to-first-shipment by
    median-rank regression (the probability-plot method): plot
    ln(t) against ln(-ln(1-F_i)) with Bernard's median-rank
    F_i = (i-0.3)/(n+0.4) and fit a line — slope = Weibull shape k
    (k<1 infant-mortality hazard, k~1 exponential/memoryless, k>1
    wear-out), intercept gives scale lambda = exp(-b/k).  A37's
    Kaplan-Meier is the non-parametric curve, A88's log-rank compares
    two curves; this COMPRESSES the curve to two interpretable
    parameters a capacity model can extrapolate with.

    Determinism: the plot coordinates are each quantized to 1e-4
    BEFORE the moment sums, so Σx, Σy, Σxy, Σxx are exact int64
    (products of 5e4-scale ints x 1.5M rows stay under 2^63 — the
    1e-4 grid is why outputs are milli-, not micro-, quantized);
    shape and scale are fixed double trees over those five integers.

    Scale shape: the orderkey equi-join (Q3's shuffle), then the
    DISTRIBUTED rank device over the duration column
    (operators/ranking.py — every task ranks only its range slice;
    no single-partition window anywhere), one moment aggregate;
    readout 1 row.  t >= 1 day keeps ln defined (same-day shipments
    belong to a point mass a two-part model would handle
    separately)."""
    from bytesprocessor_spark.operators.ranking import distributed_rank

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    d = (
        orders.join(first_ship, orders.o_orderkey == first_ship.l_orderkey)
        .select(
            F.datediff(
                F.col("first_ship").cast("date"), F.col("o_orderdate").cast("date")
            )
            .cast("long")
            .alias("t"),
            F.col("o_orderkey").alias("k"),
        )
        .where(F.col("t") >= 1)
    )
    r = distributed_rank(
        d, [F.col("t").asc(), F.col("k").asc()], rank_col="i", total_col="n"
    )
    xq = F.round(F.log(F.col("t").cast("double")) * 10000).cast("long")
    yq = F.round(
        F.log(
            -F.log(
                1.0
                - (F.col("i").cast("double") - 0.3) / (F.col("n").cast("double") + 0.4)
            )
        )
        * 10000
    ).cast("long")
    q = r.select(xq.alias("xq"), yq.alias("yq"), "n")
    m = q.agg(
        F.max("n").cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
    )
    nD = F.col("n").cast("double")
    slope = (
        nD * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nD * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    intercept = (
        F.col("sy").cast("double") / 10000.0
        - slope * F.col("sx").cast("double") / 10000.0
    ) / nD
    return m.select(
        "n",
        F.round(slope * 1000).cast("long").alias("shape_milli"),
        F.round(F.exp(-intercept / slope) * 1000).cast("long").alias("scale_days_milli"),
    )


# ---------------------------------------------------------------------------
# A95: capture-recapture (Lincoln-Petersen / Chapman) population estimate
# ---------------------------------------------------------------------------

@query(
    "events_capture_recapture",
    """
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS in_b
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(SUM(in_a) AS BIGINT) AS n_a,
             CAST(SUM(in_b) AS BIGINT) AS n_b,
             CAST(SUM(in_a * in_b) AS BIGINT) AS n_ab,
             CAST(COUNT(*) AS BIGINT) AS n_true
      FROM u
    )
    SELECT n_a, n_b, n_ab, n_true,
      CAST(ROUND((CAST(n_a + 1 AS DOUBLE) * CAST(n_b + 1 AS DOUBLE)
           / CAST(n_ab + 1 AS DOUBLE) - 1.0) * 1000) AS BIGINT)
        AS chapman_est_milli,
      CAST(ROUND(
        (CAST(n_a + 1 AS DOUBLE) * CAST(n_b + 1 AS DOUBLE)
         * CAST(n_a - n_ab AS DOUBLE) * CAST(n_b - n_ab AS DOUBLE))
        / (CAST(n_ab + 1 AS DOUBLE) * CAST(n_ab + 1 AS DOUBLE)
           * CAST(n_ab + 2 AS DOUBLE)) * 1000) AS BIGINT)
        AS var_est_milli
    FROM m
    """,
)
def events_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A95 — capture-recapture population estimation (Chapman's
    bias-corrected Lincoln-Petersen): estimate the TRUE number of
    distinct users from two INDEPENDENT partial observation channels
    (samples A and B; the overlap n_ab calibrates each channel's
    coverage).  The estimator behind "how many users/entities/dupes
    did we NOT see" questions — coverage estimation for logging
    pipelines, crawl frontiers, and dedup completeness — where A32's
    KMV estimates the distinct count of what WAS seen, this estimates
    what WASN'T.  The fixture's ground truth (n_true) rides along so
    the estimate is auditable.

    N_hat = (n_a+1)(n_b+1)/(n_ab+1) − 1, with Chapman's variance.
    All four counts exact int64 from one user rollup; both outputs
    fixed double trees, milli-quantized (the +1s keep the estimator
    defined at zero overlap).

    Scale shape: one user-keyed hash aggregate (map-side combinable
    MAX flags), one 4-counter global rollup; readout 1 row."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_id") % 3 == 0, 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_id") % 5 == 0, 1).otherwise(0)).alias("in_b"),
        )
    )
    m = u.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_ab"),
        F.count("*").cast("long").alias("n_true"),
    )
    naD = (F.col("n_a") + 1).cast("double")
    nbD = (F.col("n_b") + 1).cast("double")
    nabD = (F.col("n_ab") + 1).cast("double")
    est = naD * nbD / nabD - 1.0
    var = (
        naD
        * nbD
        * (F.col("n_a") - F.col("n_ab")).cast("double")
        * (F.col("n_b") - F.col("n_ab")).cast("double")
    ) / (nabD * nabD * (F.col("n_ab") + 2).cast("double"))
    return m.select(
        "n_a",
        "n_b",
        "n_ab",
        "n_true",
        F.round(est * 1000).cast("long").alias("chapman_est_milli"),
        F.round(var * 1000).cast("long").alias("var_est_milli"),
    )


# ---------------------------------------------------------------------------
# EV27: Bradley-Terry preference-strength fit (fixed MM iterations)
# ---------------------------------------------------------------------------

_BT_ITERS = 3


def _duck_bt_sql(n_iter: int = _BT_ITERS) -> str:
    """DuckDB replay of the integer fixed-point MM iterations."""
    parts = [
        """
    WITH daily AS (
      SELECT event_type AS item, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    duel AS (
      SELECT a.item AS i, b.item AS j,
             CAST(SUM(CASE WHEN a.v > b.v THEN 1 ELSE 0 END) AS BIGINT) AS w_f,
             CAST(SUM(CASE WHEN b.v > a.v THEN 1 ELSE 0 END) AS BIGINT) AS w_r
      FROM daily a JOIN daily b ON a.day = b.day AND a.item < b.item
      GROUP BY a.item, b.item
    ),
    np AS (
      SELECT i, j, w_f AS w_ij, w_f + w_r AS n_ij FROM duel
      UNION ALL
      SELECT j AS i, i AS j, w_r AS w_ij, w_f + w_r AS n_ij FROM duel
    ),
    items AS (SELECT DISTINCT i AS item FROM np),
    p0 AS (SELECT item, CAST(1000000000 AS BIGINT) AS p FROM items)"""
    ]
    for it in range(1, n_iter + 1):
        parts.append(
            f""",
    upd{it} AS (
      SELECT np.i AS item,
             CAST(SUM(np.w_ij) AS BIGINT) AS wins,
             CAST(SUM(CAST(ROUND(CAST(np.n_ij AS DOUBLE)
                  / (CAST(pi.p AS DOUBLE) + CAST(pj.p AS DOUBLE))
                  * 1000000000) AS BIGINT)) AS BIGINT) AS denom_nano
      FROM np
      JOIN p{it - 1} pi ON np.i = pi.item
      JOIN p{it - 1} pj ON np.j = pj.item
      GROUP BY np.i
    ),
    raw{it} AS (
      SELECT item,
             CAST(ROUND(CAST(wins AS DOUBLE)
                  / (CAST(denom_nano AS DOUBLE) / 1000000000.0)
                  * 1000000000) AS BIGINT) AS p
      FROM upd{it}
    ),
    p{it} AS (
      SELECT item,
             CAST(ROUND(CAST(p AS DOUBLE)
                  / (SELECT CAST(SUM(p) AS DOUBLE) FROM raw{it})
                  * 5000000000) AS BIGINT) AS p
      FROM raw{it}
    )"""
        )
    parts.append(
        f"""
    SELECT item, p AS strength_nano,
           ROW_NUMBER() OVER (ORDER BY p DESC, item) AS rank
    FROM p{n_iter} ORDER BY rank"""
    )
    return "".join(parts)


@query("eval_bradley_terry", _duck_bt_sql())
def eval_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV27 — Bradley-Terry preference-strength fit: turn PAIRWISE
    win/loss records into a consistent per-item strength ranking —
    the model behind preference-data aggregation (LLM judge A-vs-B
    verdicts, ranker comparisons, match outcomes).  Win matrix: for
    each day, type i beats type j when its daily value total is
    higher; strengths fit by the standard MM algorithm
    p_i <- W_i / Σ_j n_ij/(p_i+p_j), FIXED 3 iterations.

    Determinism (the GR9 fixed-round device): each iteration's
    denominator terms quantize to nano BEFORE the per-item sum, the
    raw strengths re-quantize, and the renormalization (Σp pinned to
    5e9) is itself a quantized fixed tree — the trajectory is
    bit-identical across engines, so the oracle replays it as
    unrolled CTEs.

    Scale shape: the duel table is one (item, day) aggregate plus a
    day-keyed self-join bounded by items-per-day (k²·days rows, never
    corpus-scale); each MM iteration joins the k²-row pair table to
    the k-row strength table.  At 100 TB the corpus is touched once
    (the daily aggregate); the fit runs on the bounded duel matrix,
    localized driver-side (r11 — see the k-row-localize note below)."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("item"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(F.sum(cents(F.col("value"))).cast("long").alias("v"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    duel = (
        a.join(b, (F.col("a.day") == F.col("b.day")) & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("i"), F.col("b.item").alias("j"))
        .agg(
            F.sum(F.when(F.col("a.v") > F.col("b.v"), 1).otherwise(0))
            .cast("long")
            .alias("w_f"),
            F.sum(F.when(F.col("b.v") > F.col("a.v"), 1).otherwise(0))
            .cast("long")
            .alias("w_r"),
        )
    )
    # directed (i, j) pair table: wins of i over j + duel totals —
    # K²-bounded (K = event types), so the MM fit runs driver-side on
    # the localized matrix in arithmetic that mirrors the unrolled
    # Spark expression tree op-for-op (r11 k-row-localize device; the
    # 3-iteration join chain billed several small jobs per run for a
    # few dozen rows of state)
    np_rows = (
        duel.select(
            "i",
            "j",
            F.col("w_f").alias("w_ij"),
            (F.col("w_f") + F.col("w_r")).cast("long").alias("n_ij"),
        )
        .unionByName(
            duel.select(
                F.col("j").alias("i"),
                F.col("i").alias("j"),
                F.col("w_r").alias("w_ij"),
                (F.col("w_f") + F.col("w_r")).cast("long").alias("n_ij"),
            )
        )
        .collect()
    )

    def _r(v: float) -> int:
        # F.round(double) -> HALF_UP; every value here is >= 0
        import math

        return int(math.floor(v + 0.5))

    items = sorted({r["i"] for r in np_rows})
    p = {it: 1_000_000_000 for it in items}
    for _ in range(_BT_ITERS):
        wins = {it: 0 for it in items}
        denom = {it: 0 for it in items}
        for r in np_rows:
            pi, pj = float(p[r["i"]]), float(p[r["j"]])
            wins[r["i"]] += r["w_ij"]
            denom[r["i"]] += _r(float(r["n_ij"]) / (pi + pj) * 1e9)
        raw = {
            it: _r(float(wins[it]) / (float(denom[it]) / 1e9) * 1e9)
            for it in items
        }
        tot = float(sum(raw.values()))
        p = {it: _r(float(raw[it]) / tot * 5_000_000_000) for it in items}
    ranked = sorted(items, key=lambda it: (-p[it], it))
    rows = [
        (it, p[it], rk + 1) for rk, it in enumerate(ranked)
    ]
    # JVM-side literal readout (the r10 literal-grid device)
    return (
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(it).alias("item"),
                            F.lit(sv).cast("long").alias("strength_nano"),
                            F.lit(rk).cast("long").alias("rank"),
                        )
                        for it, sv, rk in rows
                    ]
                )
            ).alias("s")
        )
        .select("s.item", "s.strength_nano", "s.rank")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# A96: Gumbel extreme-value fit on daily maxima (block maxima method)
# ---------------------------------------------------------------------------

_EULER_GAMMA = "0.5772156649015329"
_PI = "3.141592653589793"

@query(
    "events_extreme_gumbel",
    f"""
    WITH dm AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(m) AS BIGINT) AS s1,
             CAST(SUM(m * m) AS BIGINT) AS s2
      FROM dm
    )
    SELECT n, s1, s2,
      CAST(ROUND(
        SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
        * SQRT(6.0) / {_PI} * 1000) AS BIGINT) AS beta_c_milli,
      CAST(ROUND(
        (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
         - {_EULER_GAMMA}
           * SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                   / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
           * SQRT(6.0) / {_PI}) * 1000) AS BIGINT) AS mu_c_milli,
      CAST(ROUND(
        (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
         - {_EULER_GAMMA}
           * SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                   / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
           * SQRT(6.0) / {_PI})
        - SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
          * SQRT(6.0) / {_PI} * LN(-LN(0.99))
        ) AS BIGINT) AS rl99_c
    FROM s
    """,
)
def events_extreme_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A96 — Gumbel (EV type I) fit on DAILY MAXIMA by the method of
    moments: beta = s*sqrt(6)/pi, mu = mean - gamma*beta, and the
    99% return level mu - beta*ln(-ln(0.99)) — "what daily peak
    should we provision for" (percentiles of the raw distribution
    systematically UNDER-state extremes; block maxima converge to
    the EV family, which is the defensible extrapolation).  A14's
    MAD flags today's outliers; this prices NEXT quarter's peak.

    Determinism: daily maxima and their two moments are exact int64;
    beta/mu/return-level are fixed double trees over (n, Σm, Σm²)
    with sqrt/ln on literals — milli-quantized (the return level
    rounds to whole cents: ln(-ln(.99)) is a shared literal
    expression, identical in both engines).

    Scale shape: one calendar-keyed max aggregate absorbs the corpus
    (map-side combinable MAX), one 3-counter rollup over the
    calendar-bounded daily table; readout 1 row."""
    dm = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.max(cents(F.col("value"))).cast("long").alias("m"))
    )
    s = dm.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("m").cast("long").alias("s1"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("s2"),
    )
    nD = F.col("n").cast("double")
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / nD
    ) / (F.col("n") - 1).cast("double")
    import math as _math

    beta = F.sqrt(var) * _math.sqrt(6.0) / _math.pi
    mu = F.col("s1").cast("double") / nD - 0.5772156649015329 * beta
    rl99 = mu - beta * _math.log(-_math.log(0.99))
    return s.select(
        "n",
        "s1",
        "s2",
        F.round(beta * 1000).cast("long").alias("beta_c_milli"),
        F.round(mu * 1000).cast("long").alias("mu_c_milli"),
        F.round(rl99).cast("long").alias("rl99_c"),
    )


# ---------------------------------------------------------------------------
# A97: peaks-over-threshold GPD fit (probability-weighted moments)
# ---------------------------------------------------------------------------

@query(
    "events_peaks_over_threshold",
    """
    WITH v AS (
      SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
    ),
    th AS (SELECT CAST(quantile_disc(c, 0.95) AS BIGINT) AS u,
                  CAST(COUNT(*) AS BIGINT) AS n_total FROM v),
    exc AS (
      SELECT v.c - th.u AS y, v.event_id, th.u, th.n_total
      FROM v, th WHERE v.c > th.u
    ),
    rk AS (
      SELECT y, u, n_total,
             CAST(ROW_NUMBER() OVER (ORDER BY y, event_id) AS BIGINT) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM exc
    ),
    m AS (
      SELECT CAST(MAX(u) AS BIGINT) AS u, CAST(MAX(n_total) AS BIGINT)
               AS n_total,
             CAST(MAX(n) AS BIGINT) AS n,
             SUM(CAST(y AS HUGEINT)) AS s1,
             SUM(CAST(i - 1 AS HUGEINT) * y) AS sw
      FROM rk
    )
    SELECT n, u AS threshold_c,
      CAST(ROUND(
        (2.0 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
             - 2.0 * CAST(sw AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))
        * 1000000) AS BIGINT) AS xi_micro,
      CAST(ROUND(
        (2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(sw AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
         / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
            - 2.0 * CAST(sw AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))
        * 1000) AS BIGINT) AS sigma_c_milli
    FROM m
    """,
)
def events_peaks_over_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A97 — peaks-over-threshold: generalized Pareto fit to the
    exceedances over the exact p95 threshold, by probability-weighted
    moments (Hosking-Wallis): with b0 = mean(y) and
    b1 = Σ(i-1)y_(i)/(n(n-1)) over the ASCENDING order statistics,
    xi = 2 - b0/(b0-2b1) and sigma = 2*b0*b1/(b0-2b1).  The tail-
    shape read behind A96's block-maxima fit: xi > 0 says the value
    tail is heavy (power-law-ish — provision for multiples, not
    increments), xi <= 0 says it is bounded/exponential.  POT uses
    every exceedance where block maxima keep one point per day — the
    higher-resolution member of the extreme-value pair.

    Determinism: the threshold is percentile_disc (an actual data
    point, exact int64); exceedances are exact ints; the weighted
    moment Σ(i-1)·y_i is EXACT 128-bit (decimal(38,0) <-> HUGEINT)
    over the unique (y, event_id) order (no per-row quantization
    needed — the weights are integers; the old int64 ~sf30 bound is
    gone, VERDICT r9 #3); xi/sigma are fixed double trees,
    micro/milli-quantized.

    Scale shape: one pass for the threshold (bounded value domain),
    one filtered scan for exceedances, then the DISTRIBUTED rank
    device over the ~5% tail (operators/ranking.py: range-partitioned
    local row_number + broadcast per-slice offsets — still 5 TB of
    exceedances at 100 TB, so no single-partition window), one
    5-counter rollup; readout 1 row.  Bound: (i-1)*y at sf1 ~
    5e4 * 5.6e6 = 2.8e11 per row, 1.4e16 summed — inside int64 to
    ~sf30."""
    from bytesprocessor_spark.operators.ranking import distributed_rank

    v = _t(spark, sf_dir, "events").select("event_id", cents(F.col("value")).alias("c"))
    th = v.agg(
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY c)")
        .cast("long")
        .alias("u"),
        F.count("*").cast("long").alias("n_total"),
    )
    exc = v.join(F.broadcast(th)).where(F.col("c") > F.col("u")).select(
        (F.col("c") - F.col("u")).alias("y"), "event_id", "u", "n_total"
    )
    rk = distributed_rank(
        exc, [F.col("y").asc(), F.col("event_id").asc()], rank_col="i"
    )
    m = rk.agg(
        F.max("u").cast("long").alias("u"),
        F.max("n_total").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n"),
        # exact 128-bit (decimal <-> the oracle's HUGEINT): Σ(i−1)·y
        # left int64 at ~sf30; neither sum is emitted, both feed ONE
        # double conversion, so widening removes the bound outright
        # with no guard column needed (VERDICT r9 #3)
        F.sum(F.col("y").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("i") - 1).cast("decimal(19,0)") * F.col("y")).alias("sw"),
    )
    nD = F.col("n").cast("double")
    b0 = F.col("s1").cast("double") / nD
    b1 = F.col("sw").cast("double") / (nD * (F.col("n") - 1).cast("double"))
    xi = 2.0 - b0 / (b0 - 2.0 * b1)
    sigma = 2.0 * b0 * b1 / (b0 - 2.0 * b1)
    return m.select(
        "n",
        F.col("u").alias("threshold_c"),
        F.round(xi * 1000000).cast("long").alias("xi_micro"),
        F.round(sigma * 1000).cast("long").alias("sigma_c_milli"),
    )


# ---------------------------------------------------------------------------
# S18: transaction-log incremental (change-feed) read
# ---------------------------------------------------------------------------

@query(
    "txnlog_changes_read",
    """
    WITH base AS (
      SELECT event_type,
             event_id % 3 AS batch,
             CAST(ROUND(value * 100) AS BIGINT) AS val_c
      FROM events
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN batch IN (1, 2) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(SUM(CASE WHEN batch IN (1, 2) THEN val_c ELSE 0 END)
                AS BIGINT) AS sum_changed_c,
           CAST(SUM(1) AS BIGINT) AS n_snapshot
    FROM base GROUP BY event_type ORDER BY event_type
    """,
)
def txnlog_changes_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18 — the transaction log's INCREMENTAL read as an oracle row:
    three event slices land as three append commits (v0, v1, v2);
    ``txn_changes(v0 -> v2)`` must return EXACTLY the rows of commits
    v1+v2 — no v0 row leaking in, none of the delta lost — and the
    full snapshot count rides along so the delta is checked AGAINST
    the snapshot it belongs to.  This is the consumer loop of every
    downstream incremental job (process the delta, advance the
    high-water version): S15 gives snapshots and time travel, this
    gives the change feed between them.

    Scale shape: the change read scans ONLY the delta file set
    resolved from two manifests — never the table directory; the
    readout is a per-type aggregate over the delta."""
    import os
    import shutil
    import tempfile

    from bytesprocessor_spark.sources.txnlog import txn_changes, txn_read, txn_write

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", cents(F.col("value")).alias("val_c")
    )
    workdir = tempfile.mkdtemp(prefix="bp_txncf_")
    try:
        t = os.path.join(workdir, "tbl")
        for part in range(3):
            txn_write(ev.where(F.col("event_id") % 3 == part), t)
        delta = txn_changes(spark, t, from_version=0, to_version=2)
        snap_n = (
            txn_read(spark, t)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_snapshot"))
        )
        out = (
            delta.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_changed"),
                F.sum("val_c").cast("long").alias("sum_changed_c"),
            )
            .join(snap_n, "event_type")
            .select("event_type", "n_changed", "sum_changed_c", "n_snapshot")
            .orderBy("event_type")
        )
        # bounded localize (<= |event types| rows) so the temp table drops
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


# ---------------------------------------------------------------------------
# A98: empirical-Bayes (beta-binomial) shrinkage of per-user rates
# ---------------------------------------------------------------------------

@query(
    "events_eb_shrinkage",
    """
    WITH u AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT user_id, n, k,
             CAST(ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * 1000000)
                  AS BIGINT) AS rate_u
      FROM u
    ),
    pri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(rate_u) AS BIGINT) AS s1,
             CAST(SUM(rate_u * rate_u) AS BIGINT) AS s2
      FROM r
    ),
    pk AS (
      SELECT n_users, s1, s2,
        CAST(s1 AS DOUBLE) / CAST(n_users AS DOUBLE) / 1000000.0 AS m,
        (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
           / CAST(n_users AS DOUBLE)) / CAST(n_users - 1 AS DOUBLE)
          / 1000000.0 / 1000000.0 AS v
      FROM pri
    ),
    kk AS (
      SELECT n_users, m, v,
             CASE WHEN v > 0 AND m * (1.0 - m) / v > 1.0
                  THEN m * (1.0 - m) / v - 1.0 ELSE NULL END AS kmass
      FROM pk
    ),
    sh AS (
      SELECT r.user_id, r.n, r.k, r.rate_u, kk.n_users, kk.kmass,
        CAST(ROUND((CAST(r.k AS DOUBLE) + kk.m * kk.kmass)
             / (CAST(r.n AS DOUBLE) + kk.kmass) * 1000000) AS BIGINT)
          AS shrunk_u
      FROM r, kk
    ),
    dec AS (
      SELECT *, NTILE(10) OVER (ORDER BY shrunk_u, user_id) AS decile
      FROM sh
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_users_bin,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(rate_u) AS BIGINT) AS sum_rate_u,
           CAST(SUM(shrunk_u) AS BIGINT) AS sum_shrunk_u,
           CAST(ROUND(MAX(kmass) * 1000) AS BIGINT) AS k_milli
    FROM dec GROUP BY decile ORDER BY decile
    """,
)
def events_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A98 — empirical-Bayes shrinkage of per-user purchase rates
    (beta-binomial, method-of-moments prior): a user with 1/2
    purchases is NOT a 50% converter — small-sample rates are mostly
    noise, and ranking or segmenting on them top-ranks the noisiest
    users.  The MoM prior mass K = m(1-m)/v - 1 says how much each
    user shrinks toward the population mean: shrunk = (k + mK)/(n + K)
    — users with little data move most.  The standard fix before any
    per-entity rate ranking (A42's LTV, Q12's bot scores).

    Determinism: per-user (n, k) are exact; the per-user rate
    quantizes to micro BEFORE the prior moments (A88 device — rate^2
    sums exact 128-bit — the old ~1e6-user int64 bound is gone,
    VERDICT r9 #3), m/v/K/shrunk are fixed
    double trees; the decile readout buckets by NTILE over a unique
    total order and sums quantized integers.  Overdispersion beyond
    Bernoulli (v >= m(1-m)) leaves the prior undefined: NULL K and
    unshrunk output would be wrong, so the whole readout nulls.

    Scale shape: one user-keyed aggregate absorbs the corpus, prior
    moments via one rollup, the shrink is a map over the user table
    with the 1-row prior broadcast, decile readout 10 rows."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
    )
    r = u.select(
        "user_id",
        "n",
        "k",
        F.round(F.col("k").cast("double") / F.col("n").cast("double") * 1000000)
        .cast("long")
        .alias("rate_u"),
    )
    pri = r.agg(
        F.count("*").cast("long").alias("n_users"),
        # exact 128-bit prior moments (decimal <-> HUGEINT): Σrate²
        # left int64 at ~1e6 users; both sums feed one double each, so
        # widening removes the bound with no guard (VERDICT r9 #3)
        F.sum(F.col("rate_u").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("rate_u").cast("decimal(19,0)") * F.col("rate_u")).alias("s2"),
    )
    nuD = F.col("n_users").cast("double")
    m = F.col("s1").cast("double") / nuD / 1e6
    v = (
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / nuD)
        / (F.col("n_users") - 1).cast("double")
        / 1e6
        / 1e6
    )
    kk = pri.select(
        "n_users",
        m.alias("m"),
        v.alias("v"),
        F.when((v > 0) & (m * (1.0 - m) / v > 1.0), m * (1.0 - m) / v - 1.0)
        .otherwise(F.lit(None).cast("double"))
        .alias("kmass"),
    )
    sh = r.crossJoin(F.broadcast(kk)).select(
        "user_id",
        "n",
        "rate_u",
        "kmass",
        F.round(
            (F.col("k").cast("double") + F.col("m") * F.col("kmass"))
            / (F.col("n").cast("double") + F.col("kmass"))
            * 1000000
        )
        .cast("long")
        .alias("shrunk_u"),
    )
    # per-USER table — entity-scale at 100x, so the distributed NTILE
    # device, not a single-partition window
    from bytesprocessor_spark.operators.ranking import distributed_ntile

    dec = distributed_ntile(
        sh,
        [F.col("shrunk_u").asc(), F.col("user_id").asc()],
        10,
        tile_col="decile",
    )
    return (
        dec.groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_users_bin"),
            F.sum("n").cast("long").alias("n_events"),
            F.sum("rate_u").cast("long").alias("sum_rate_u"),
            F.sum("shrunk_u").cast("long").alias("sum_shrunk_u"),
            F.round(F.max("kmass") * 1000).cast("long").alias("k_milli"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# A99: Kleinberg two-state burst detection over daily type shares
# ---------------------------------------------------------------------------

def _duck_burst_sql() -> str:
    """DuckDB replay: same integer-quantized emissions, recursive-CTE
    Viterbi carrying best-path state lists."""
    return """
    WITH RECURSIVE cell AS (
      SELECT event_type AS g, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM events GROUP BY 1, 2
    ),
    days AS (SELECT day, CAST(SUM(k) AS BIGINT) AS n FROM cell GROUP BY day),
    types AS (SELECT DISTINCT g FROM cell),
    grid AS (
      SELECT t.g, d.day, d.n, COALESCE(c.k, 0) AS k
      FROM types t CROSS JOIN days d
      LEFT JOIN cell c ON c.g = t.g AND c.day = d.day
    ),
    rate AS (
      SELECT g, CAST(SUM(k) AS BIGINT) AS kk, CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS nd
      FROM grid GROUP BY g
    ),
    em AS (
      SELECT grid.g, grid.day, grid.k, grid.n,
             ROW_NUMBER() OVER (PARTITION BY grid.g ORDER BY grid.day) AS rn,
             CAST(ROUND(-(CAST(grid.k AS DOUBLE)
                  * LN(CAST(rate.kk AS DOUBLE) / CAST(rate.nn AS DOUBLE))
                  + CAST(grid.n - grid.k AS DOUBLE)
                  * LN(1.0 - CAST(rate.kk AS DOUBLE)
                       / CAST(rate.nn AS DOUBLE))) * 1000000) AS BIGINT)
               AS e0,
             CAST(ROUND(-(CAST(grid.k AS DOUBLE)
                  * LN(LEAST(2.0 * CAST(rate.kk AS DOUBLE)
                       / CAST(rate.nn AS DOUBLE), 0.999999))
                  + CAST(grid.n - grid.k AS DOUBLE)
                  * LN(1.0 - LEAST(2.0 * CAST(rate.kk AS DOUBLE)
                       / CAST(rate.nn AS DOUBLE), 0.999999))) * 1000000)
               AS BIGINT) AS e1,
             CAST(ROUND(LN(CAST(rate.nd AS DOUBLE)) * 1000000) AS BIGINT)
               AS t01
      FROM grid JOIN rate ON grid.g = rate.g
    ),
    vit(g, rn, c0, c1, p0, p1) AS (
      SELECT g, rn, e0, e1 + t01,
             [CAST(0 AS BIGINT)], [CAST(1 AS BIGINT)]
      FROM em WHERE rn = 1
      UNION ALL
      SELECT x.g, x.rn,
             x.e0 + LEAST(v.c0, v.c1),
             x.e1 + LEAST(v.c0 + x.t01, v.c1),
             list_append(CASE WHEN v.c0 <= v.c1 THEN v.p0 ELSE v.p1 END,
                         CAST(0 AS BIGINT)),
             list_append(CASE WHEN v.c0 + x.t01 <= v.c1 THEN v.p0 ELSE v.p1
                         END, CAST(1 AS BIGINT))
      FROM vit v JOIN em x ON x.g = v.g AND x.rn = v.rn + 1
    ),
    fin AS (
      SELECT g, CASE WHEN c0 <= c1 THEN p0 ELSE p1 END AS path
      FROM vit QUALIFY rn = MAX(rn) OVER (PARTITION BY g)
    ),
    st AS (
      -- lateral driven by the ACTUAL path length (a fixed range cap
      -- would silently truncate calendars past the cap)
      SELECT fin.g, CAST(u.i AS BIGINT) AS rn, fin.path[CAST(u.i AS BIGINT)] AS state
      FROM fin, LATERAL (SELECT UNNEST(range(1, len(fin.path) + 1)) AS i) u
    )
    SELECT em.g AS event_type, STRFTIME(em.day, '%Y-%m-%d') AS day,
           em.k, em.n, CAST(st.state AS BIGINT) AS burst
    FROM em JOIN st ON em.g = st.g AND em.rn = st.rn
    ORDER BY event_type, day
    """


@query("events_burst_kleinberg", _duck_burst_sql())
def events_burst_kleinberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A99 — Kleinberg two-state burst detection (KDD 2002) on each
    event type's daily share: a low state emitting at the type's
    baseline rate p0 and a burst state at min(2*p0, cap), with an
    entry toll gamma*ln(D) — the Viterbi path labels each day
    burst/normal.  A86's changepoint finds ONE level shift; A38's
    SPRT answers "changed by now?" online; this segments the whole
    series into burst episodes with hysteresis (the toll suppresses
    one-day blips), the trending-topics primitive.

    Determinism: day/type counts are exact; per-day emission costs
    -(k ln p + (n-k) ln(1-p)) quantize to MICRO-INT before the DP
    (the LN-then-quantize device every surprisal entry uses), the
    toll likewise — so the Viterbi recursion is pure integer min/add
    with a fixed tie rule (state 0 wins ties), bit-identical across
    engines; the oracle replays it as a recursive CTE carrying
    best-path lists.

    Scale shape: volume work is one (type, day) aggregate + a
    calendar-bounded grid; the sequential DP runs as an ordered
    per-type Arrow replay over <= days rows (the A71 posture)."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("event_type").alias("g"), F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("k"))
    days = cell.groupBy("day").agg(F.sum("k").cast("long").alias("n"))
    types = cell.select("g").distinct()
    grid = (
        types.crossJoin(days)
        .join(cell, ["g", "day"], "left")
        .select("g", "day", "n", F.coalesce(F.col("k"), F.lit(0)).alias("k"))
    )
    rate = grid.groupBy("g").agg(
        F.sum("k").cast("long").alias("kk"),
        F.sum("n").cast("long").alias("nn"),
        F.count("*").cast("long").alias("nd"),
    )
    p0 = "CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)"
    p1 = f"LEAST(2.0 * {p0}, 0.999999)"
    em = grid.join(F.broadcast(rate), "g").selectExpr(
        "g",
        "day",
        "k",
        "n",
        f"CAST(ROUND(-(CAST(k AS DOUBLE) * LN({p0})"
        f" + CAST(n - k AS DOUBLE) * LN(1.0 - {p0})) * 1000000) AS BIGINT)"
        " AS e0",
        f"CAST(ROUND(-(CAST(k AS DOUBLE) * LN({p1})"
        f" + CAST(n - k AS DOUBLE) * LN(1.0 - {p1})) * 1000000) AS BIGINT)"
        " AS e1",
        "CAST(ROUND(LN(CAST(nd AS DOUBLE)) * 1000000) AS BIGINT) AS t01",
    )

    def viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        e0 = [int(v) for v in pdf["e0"]]
        e1 = [int(v) for v in pdf["e1"]]
        t01 = int(pdf["t01"].iloc[0])
        c0, c1 = e0[0], e1[0] + t01
        p0l, p1l = [0], [1]
        for t in range(1, len(e0)):
            # pure integer min/add; ties prefer state 0 (<=)
            n0 = e0[t] + (c0 if c0 <= c1 else c1)
            np0 = (p0l if c0 <= c1 else p1l) + [0]
            n1 = e1[t] + (c0 + t01 if c0 + t01 <= c1 else c1)
            np1 = (p0l if c0 + t01 <= c1 else p1l) + [1]
            c0, c1, p0l, p1l = n0, n1, np0, np1
        path = p0l if c0 <= c1 else p1l
        out = pdf[["g", "day", "k", "n"]].copy()
        out["burst"] = path
        return out

    res = em.groupBy("g").applyInPandas(
        viterbi, "g string, day date, k long, n long, burst long"
    )
    return res.select(
        F.col("g").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "k",
        "n",
        "burst",
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# A100: Hill tail-index estimator on order values
# ---------------------------------------------------------------------------

@query(
    "orders_hill_tail",
    """
    WITH v AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    r AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, o_orderkey) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM v
    ),
    ks AS (SELECT UNNEST([50, 100, 200]) AS k),
    top AS (
      SELECT ks.k, r.c, r.i,
             CAST(ROUND(LN(CAST(r.c AS DOUBLE)) * 1000000) AS BIGINT) AS lq
      FROM r JOIN ks ON r.i <= ks.k + 1
      WHERE ks.k + 1 <= (SELECT MAX(n) FROM r)
    ),
    agg AS (
      SELECT k,
             CAST(SUM(CASE WHEN i <= k THEN lq ELSE 0 END) AS BIGINT)
               AS sum_lq,
             CAST(MAX(CASE WHEN i = k + 1 THEN lq ELSE 0 END) AS BIGINT)
               AS ref_lq
      FROM top GROUP BY k
    )
    SELECT k,
      CAST(ROUND((CAST(sum_lq AS DOUBLE) / 1000000.0 / CAST(k AS DOUBLE)
           - CAST(ref_lq AS DOUBLE) / 1000000.0) * 1000000) AS BIGINT)
        AS hill_gamma_micro,
      CASE WHEN sum_lq > k * ref_lq THEN
        CAST(ROUND(1.0 / (CAST(sum_lq AS DOUBLE) / 1000000.0
             / CAST(k AS DOUBLE) - CAST(ref_lq AS DOUBLE) / 1000000.0)
             * 1000) AS BIGINT)
      ELSE NULL END AS alpha_milli
    FROM agg ORDER BY k
    """,
)
def orders_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A100 — Hill estimator of the price tail index at k = 50/100/
    200 order statistics: gamma(k) = (1/k)*sum ln(x_(i)/x_(k+1)) over
    the top k, alpha = 1/gamma.  The k-sweep IS the read (the "Hill
    plot"): a stable plateau across k says the power-law fit is
    trustworthy, disagreement says the tail is not Pareto — the
    classic order-statistics alternative to A97's PWM-GPD fit
    (POT estimates (xi, sigma) from all exceedances; Hill reads gamma
    straight off the top-k ratios).

    Determinism: per-row ln quantizes to micro BEFORE the top-k sum
    (integer reduction, the surprisal device); the reference statistic
    x_(k+1) resolves over the unique (value desc, orderkey) order;
    alpha nulls LOUDLY when gamma <= 0 (a degenerate tail where the
    top k ties the reference).

    Scale shape: only the top max(k)+1 = 201 order statistics matter,
    so the plan is a TakeOrderedAndProject (per-partition top-201
    heaps, merged at the driver-side-free limit — no global sort, no
    single-partition window over the table) plus a 1-row exact count
    broadcast for the k+1 <= n guard; the rank window runs over the
    201 surviving rows only."""
    v = _t(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("c")
    )
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    n_df = v.agg(F.count("*").cast("long").alias("n"))
    top201 = bounded_single_group(
        v.orderBy(F.col("c").desc(), "o_orderkey").limit(201)
    )
    w_rank = Window.partitionBy("__opid").orderBy(F.col("c").desc(), "o_orderkey")
    r = top201.select(
        "c", F.row_number().over(w_rank).cast("long").alias("i")
    ).crossJoin(F.broadcast(n_df))
    ks = spark.createDataFrame([(50,), (100,), (200,)], "k long")
    top = (
        r.join(F.broadcast(ks), F.col("i") <= F.col("k") + 1)
        .where(F.col("k") + 1 <= F.col("n"))
        .select(
            "k",
            "i",
            F.round(F.log(F.col("c").cast("double")) * 1000000)
            .cast("long")
            .alias("lq"),
        )
    )
    agg = top.groupBy("k").agg(
        F.sum(F.when(F.col("i") <= F.col("k"), F.col("lq")).otherwise(0))
        .cast("long")
        .alias("sum_lq"),
        F.max(F.when(F.col("i") == F.col("k") + 1, F.col("lq")).otherwise(0))
        .cast("long")
        .alias("ref_lq"),
    )
    gamma = (
        F.col("sum_lq").cast("double") / 1e6 / F.col("k").cast("double")
        - F.col("ref_lq").cast("double") / 1e6
    )
    return agg.select(
        "k",
        F.round(gamma * 1000000).cast("long").alias("hill_gamma_micro"),
        F.when(
            F.col("sum_lq") > F.col("k") * F.col("ref_lq"),
            F.round(1.0 / gamma * 1000).cast("long"),
        )
        .otherwise(F.lit(None).cast("long"))
        .alias("alpha_milli"),
    ).orderBy("k")
