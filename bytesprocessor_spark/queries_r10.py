"""Round-10 batch: non-parametric trend/agreement tests, optimal-
transport drift, residual diagnostics, forecast scoring, calibration
testing, and index-number theory — each an EXT row of SURVEY §2's
analytics surface on the registry's exact-integer determinism
contract (engines aggregate only exact int64/int128 moments; every
statistic is ONE fixed IEEE-double tree over those integers,
quantized once; per-term transcendental values are quantized to
integers BEFORE any cross-row fold so the fold order is pinned).

- A128 events_mann_kendall: Mann-Kendall trend test per event type on
  the daily-count series (exact pair-sign S, exact tie-corrected
  variance) — the distribution-free companion of A16's OLS slope and
  A75's Theil-Sen: it answers "is there ANY monotone trend" without a
  linearity assumption.
- A129 events_friedman: Friedman rank test across event types blocked
  by day (exact half-unit midranks) — the k-sample repeated-measures
  extension of A87's Mann-Whitney / A88's Kruskal-Wallis when every
  day scores EVERY type.
- A130 events_cochran_q: Cochran's Q over the user x type binary
  engagement matrix — the k-treatment extension of EV22's McNemar
  (which handles exactly two): did engagement breadth differ across
  types, charged only against discordant users.
- A131 orders_wasserstein_drift: exact 1-Wasserstein (earth-mover)
  distance between the even/odd-day order-value distributions per
  priority class — the magnitude-aware drift read next to Q11's KS
  (which sees only the max CDF gap) and A66's PSI (which pre-bins).
- A132 events_simpson_diversity: Simpson concentration/diversity per
  day (exact pair-count form) — the ecology-standard companion of
  A40's entropy mix read; 1-D is the probability two random events
  that day differ in type.
- A133 events_durbin_watson: Durbin-Watson first-difference statistic
  on each type's centered daily-value series (the n-scaled deviation
  device of A34, 128-bit products) — the lag-1 autocorrelation
  diagnostic in its classical [0, 4] form.
- EV40 events_mase: mean absolute SCALED error of the seasonal-naive
  weekly forecast on per-type daily event counts, scaled by the in-sample
  naive-1 MAE (Hyndman-Koehler) — the scale-free forecast score that
  lets A45/A71 baselines be compared ACROSS series.
- EV41 eval_hosmer_lemeshow: Hosmer-Lemeshow goodness-of-fit over
  NTILE-10 risk deciles of the EV1 pinned pseudo-model — the
  significance companion of EV3's reliability diagram and EV36's ECE
  (term-quantized before the 10-bin fold).
- A134 orders_fisher_index: Fisher ideal price index per year
  (geometric mean of the A65 Laspeyres and its Paasche dual) — the
  index-number-theory closure of the price-index family.
- GR15 graph_rich_club: rich-club coefficient of the co-supplier
  graph at degree thresholds — density among high-degree nodes vs
  all nodes, the hub-interconnection read PageRank/Katz cannot give.

Reference scope note: the reference engine ends at the labeled packet
table (BytesProcessor.py:121-187); these are EXT rows of the
analytics surface SURVEY §2 declares on top of it.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bytesprocessor_spark.operators.ranking import bounded_single_group
from bytesprocessor_spark.queries import _t, cents, query

_I64 = "9223372036854775807"


# ---------------------------------------------------------------------------
# A128: Mann-Kendall trend test per event type (daily counts)
# ---------------------------------------------------------------------------

@query(
    "events_mann_kendall",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.day < b.day
      GROUP BY 1
    ),
    n AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
    ),
    t AS (
      SELECT event_type,
             CAST(COALESCE(SUM(tt * (tt - 1) * (2 * tt + 5)), 0) AS BIGINT)
               AS tie18
      FROM (SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS tt
            FROM d GROUP BY 1, 2) g
      WHERE tt > 1 GROUP BY 1
    )
    SELECT n.event_type, n.n AS n_days, s.s AS s_stat,
           n.n * (n.n - 1) * (2 * n.n + 5) - COALESCE(t.tie18, 0) AS var18,
           CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - COALESCE(t.tie18, 0) > 0
                THEN CAST(ROUND(
                  (CASE WHEN s.s > 0 THEN CAST(s.s - 1 AS DOUBLE)
                        WHEN s.s < 0 THEN CAST(s.s + 1 AS DOUBLE)
                        ELSE 0.0 END)
                  / SQRT(CAST(n.n * (n.n - 1) * (2 * n.n + 5)
                              - COALESCE(t.tie18, 0) AS DOUBLE) / 18.0)
                  * 1000) AS BIGINT)
           END AS z_milli
    FROM n JOIN s USING (event_type) LEFT JOIN t USING (event_type)
    ORDER BY n.event_type
    """,
)
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A128 — Mann-Kendall trend test: S = Σ_{i<j} sign(x_j − x_i)
    over each type's daily-count series, tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18, continuity-corrected
    z — the distribution-free "is there a monotone trend" read (the
    test half of A75's Theil-Sen slope; A16's OLS assumes linearity,
    this assumes nothing).

    Determinism: S is an exact integer over the (type, day < day)
    pair join; tie groups and the 18·Var factor are exact int64
    (n ≤ calendar days, so n³ is int64-trivial); z is one fixed
    double tree, milli-quantized; degenerate all-tied series
    (var18 = 0) reads NULL on both engines.

    Scale shape: one (type, day) hash aggregate absorbs the scan;
    the pair join is type-keyed over calendar-bounded day tables
    (≤366²/2 pairs per type-year — bounded by the calendar, not the
    corpus); readout k rows."""
    d = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("x"))
    )
    a = d.select("event_type", F.col("day").alias("da"), F.col("x").alias("xa"))
    b = d.select("event_type", F.col("day").alias("db"), F.col("x").alias("xb"))
    s = (
        a.join(b, "event_type")
        .where(F.col("da") < F.col("db"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    n = d.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    t = (
        d.groupBy("event_type", "x")
        .agg(F.count("*").cast("long").alias("tt"))
        .where(F.col("tt") > 1)
        .groupBy("event_type")
        .agg(
            F.sum(F.col("tt") * (F.col("tt") - 1) * (2 * F.col("tt") + 5))
            .cast("long")
            .alias("tie18")
        )
    )
    j = (
        n.join(s, "event_type")
        .join(t, "event_type", "left")
        .select(
            "event_type",
            "n",
            "s",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie18"), F.lit(0))
            ).alias("var18"),
        )
    )
    num = (
        F.when(F.col("s") > 0, (F.col("s") - 1).cast("double"))
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double"))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("s").alias("s_stat"),
        "var18",
        F.when(
            F.col("var18") > 0,
            F.round(
                num / F.sqrt(F.col("var18").cast("double") / 18.0) * 1000
            ).cast("long"),
        ).alias("z_milli"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A129: Friedman rank test across event types, blocked by day
# ---------------------------------------------------------------------------

@query(
    "events_friedman",
    """
    WITH cell AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.day, t.event_type, COALESCE(c.x, 0) AS x
      FROM (SELECT DISTINCT day FROM cell) d
      CROSS JOIN (SELECT DISTINCT event_type FROM cell) t
      LEFT JOIN cell c ON c.day = d.day AND c.event_type = t.event_type
    ),
    rk AS (
      SELECT day, event_type, x,
             CAST(2 * RANK() OVER (PARTITION BY day ORDER BY x)
                  + COUNT(*) OVER (PARTITION BY day, x) - 1 AS BIGINT)
               AS mr2,
             CAST(COUNT(*) OVER (PARTITION BY day, x) AS BIGINT) AS tt
      FROM grid
    ),
    rj AS (
      SELECT event_type, CAST(SUM(mr2) AS BIGINT) AS r2
      FROM rk GROUP BY event_type
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
      FROM grid
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(tt * tt * tt - tt), 0) AS BIGINT) AS tsum
      FROM (SELECT DISTINCT day, x, tt FROM rk WHERE tt > 1) u
    )
    SELECT rj.event_type, rj.r2 AS rank2_sum,
      CAST(ROUND((12.0 * (CAST(rj.r2 AS DOUBLE) / 2.0)
                       * (CAST(rj.r2 AS DOUBLE) / 2.0)
                  / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                     * CAST(k + 1 AS DOUBLE))) * 1000) AS BIGINT)
        AS term_milli,
      CAST(ROUND(CASE WHEN CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                           * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
                           - CAST(tsum AS DOUBLE) > 0
        THEN ((12.0 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                       * CAST(k + 1 AS DOUBLE))
               * (SELECT CAST(SUM(CAST(r2 AS HUGEINT) * r2) AS DOUBLE)
                         / 4.0 FROM rj)
               - 3.0 * CAST(n AS DOUBLE) * CAST(k + 1 AS DOUBLE))
              / (1.0 - CAST(tsum AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                    * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))))
        END * 1000) AS BIGINT) AS chi2_milli
    FROM rj CROSS JOIN dims CROSS JOIN ties
    ORDER BY rj.event_type
    """,
)
def events_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A129 — Friedman test: within each day (block) the k event
    types are midranked by their count; χ²_F = [12/(nk(k+1))]ΣR_j²
    − 3n(k+1), divided by the tie correction 1 − Σ(t³−t)/(nk(k²−1)).
    The repeated-measures k-sample rank test — A88's Kruskal-Wallis
    assumes independent samples; days are natural blocks here.

    Determinism: midranks in exact HALF units (2·midrank = 2·rank +
    t − 1, all integers); R_j sums exact int64; Σ(t³−t) exact; χ² is
    one fixed double tree over the integers, milli-quantized.  The
    per-type term_milli column carries each type's contribution so
    the readout is k rows (not one scalar), keyed like the rest of
    the family.  ΣR_j² accumulates Σ(2R_j)² EXACTLY in
    decimal(38,0) <-> HUGEINT (2·midranks are integers, so squares
    are too) and divides by 4 ONCE inside the final double tree —
    no cross-row double fold, honoring the module's quantize-before-
    fold contract (ADVICE r10 fix).

    Scale shape: one (day, type) hash aggregate absorbs the scan; the
    dense grid / rank windows run over the calendar×k table (bounded);
    readout k rows."""
    cell = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.count("*").cast("long").alias("x"))
    )
    days = cell.select("day").distinct()
    types = cell.select("event_type").distinct()
    grid = (
        days.crossJoin(types)
        .join(cell, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce(F.col("x"), F.lit(0)).alias("x"))
    )
    w_rank = Window.partitionBy("day").orderBy("x")
    w_tie = Window.partitionBy("day", "x")
    rk = grid.select(
        "day",
        "event_type",
        "x",
        (2 * F.rank().over(w_rank) + F.count("*").over(w_tie) - 1)
        .cast("long")
        .alias("mr2"),
        F.count("*").over(w_tie).cast("long").alias("tt"),
    )
    rj = rk.groupBy("event_type").agg(F.sum("mr2").cast("long").alias("r2"))
    dims = grid.agg(
        F.countDistinct("day").cast("long").alias("n"),
        F.countDistinct("event_type").cast("long").alias("k"),
    )
    ties = (
        rk.where(F.col("tt") > 1)
        .select("day", "x", "tt")
        .distinct()
        .agg(
            F.coalesce(
                F.sum(F.col("tt") * F.col("tt") * F.col("tt") - F.col("tt")), F.lit(0)
            )
            .cast("long")
            .alias("tsum")
        )
    )
    sum_r2sq = rj.agg(
        (
            F.sum(F.col("r2").cast("decimal(38,0)") * F.col("r2")).cast("double")
            / 4.0
        ).alias("sum_rsq")
    )
    j = rj.crossJoin(F.broadcast(dims)).crossJoin(F.broadcast(ties)).crossJoin(
        F.broadcast(sum_r2sq)
    )
    nD = F.col("n").cast("double")
    kD = F.col("k").cast("double")
    r2D = F.col("r2").cast("double")
    denom_t = nD * kD * (kD * kD - 1.0) - F.col("tsum").cast("double")
    chi2 = (
        (12.0 / (nD * kD * (kD + 1).cast("double")) * F.col("sum_rsq"))
        - 3.0 * nD * (kD + 1).cast("double")
    ) / (
        1.0
        - F.col("tsum").cast("double") / (nD * kD * (kD * kD - 1.0))
    )
    return j.select(
        "event_type",
        F.col("r2").alias("rank2_sum"),
        F.round(
            (12.0 * (r2D / 2.0) * (r2D / 2.0) / (nD * kD * (kD + 1).cast("double")))
            * 1000
        )
        .cast("long")
        .alias("term_milli"),
        F.round(F.when(denom_t > 0, chi2) * 1000).cast("long").alias("chi2_milli"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A130: Cochran's Q over the user x type binary engagement matrix
# ---------------------------------------------------------------------------

@query(
    "events_cochran_q",
    f"""
    WITH m AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    k AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM m),
    r AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ri FROM m GROUP BY 1
    ),
    c AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cj FROM m GROUP BY 1
    ),
    rs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             SUM(CAST(ri AS HUGEINT)) AS sr,
             SUM(CAST(ri AS HUGEINT) * ri) AS sr2
      FROM r
    ),
    cs AS (
      SELECT SUM(CAST(cj AS HUGEINT)) AS sc,
             SUM(CAST(cj AS HUGEINT) * cj) AS sc2
      FROM c
    )
    SELECT n_users, k,
           CASE WHEN sr <= {_I64} THEN CAST(sr AS BIGINT) END AS sum_r,
           CASE WHEN sr2 <= {_I64} THEN CAST(sr2 AS BIGINT) END AS sum_r2,
           CASE WHEN k * sr - sr2 > 0
                THEN CAST(ROUND(CAST(k - 1 AS DOUBLE)
                     * (CAST(k AS DOUBLE) * CAST(sc2 AS DOUBLE)
                        - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                     / (CAST(k AS DOUBLE) * CAST(sr AS DOUBLE)
                        - CAST(sr2 AS DOUBLE)) * 1000) AS BIGINT)
           END AS q_milli
    FROM rs CROSS JOIN cs CROSS JOIN k
    """,
)
def events_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A130 — Cochran's Q: with the binary matrix "user i touched
    event type j at least once", Q = (k−1)[kΣC_j² − (ΣC_j)²] /
    (kΣR_i − ΣR_i²) — the k-treatment McNemar (EV22 handles two
    classifiers; this asks whether k engagement channels differ,
    charged only against users NOT constant across all k).

    Determinism: row/column sums are exact 128-bit (HUGEINT <->
    decimal(38,0), the VERDICT r9 #3 widen discipline — ΣR² leaves
    int64 past ~4e17 users only, but the raw readouts are guarded to
    NULL rather than wrap); Q is one fixed double tree, milli-
    quantized; all-concordant input (denominator 0) reads NULL on
    both engines.

    Scale shape: one DISTINCT (user, type) aggregate absorbs the
    scan; user-keyed and type-keyed rollups (entity-scale, map-
    combinable); readout 1 row."""
    m = _t(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    k = m.agg(F.countDistinct("event_type").cast("long").alias("k"))
    r = m.groupBy("user_id").agg(F.count("*").cast("long").alias("ri"))
    c = m.groupBy("event_type").agg(F.count("*").cast("long").alias("cj"))
    rs = r.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.col("ri").cast("decimal(38,0)")).alias("sr"),
        F.sum(F.col("ri").cast("decimal(19,0)") * F.col("ri")).alias("sr2"),
    )
    cs = c.agg(
        F.sum(F.col("cj").cast("decimal(38,0)")).alias("sc"),
        F.sum(F.col("cj").cast("decimal(19,0)") * F.col("cj")).alias("sc2"),
    )
    j = rs.crossJoin(F.broadcast(cs)).crossJoin(F.broadcast(k))
    kD = F.col("k").cast("double")
    q = (
        (kD - 1)
        * (kD * F.col("sc2").cast("double") - F.col("sc").cast("double") * F.col("sc").cast("double"))
        / (kD * F.col("sr").cast("double") - F.col("sr2").cast("double"))
    )
    return j.select(
        "n_users",
        "k",
        F.expr(f"CASE WHEN sr <= {_I64} THEN CAST(sr AS BIGINT) END").alias(
            "sum_r"
        ),
        F.expr(f"CASE WHEN sr2 <= {_I64} THEN CAST(sr2 AS BIGINT) END").alias(
            "sum_r2"
        ),
        F.when(
            F.col("k") * F.col("sr") - F.col("sr2") > 0,
            F.round(q * 1000).cast("long"),
        ).alias("q_milli"),
    )


# ---------------------------------------------------------------------------
# A131: exact 1-Wasserstein drift between even/odd-day order values
# ---------------------------------------------------------------------------

@query(
    "orders_wasserstein_drift",
    """
    WITH v AS (
      SELECT o_orderpriority AS prio,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
             DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 2
               AS par
      FROM orders
    ),
    s AS (
      SELECT prio, c,
             CAST(SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM v GROUP BY 1, 2
    ),
    n AS (
      SELECT prio, CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1
      FROM s GROUP BY 1
    ),
    cum AS (
      SELECT prio, c,
             CAST(SUM(c0) OVER w AS BIGINT) AS f0,
             CAST(SUM(c1) OVER w AS BIGINT) AS f1,
             LEAD(c) OVER w AS c_next
      FROM s WINDOW w AS (PARTITION BY prio ORDER BY c)
    ),
    w1 AS (
      SELECT cum.prio,
             SUM(CAST(cum.c_next - cum.c AS HUGEINT)
                 * ABS(cum.f0 * n.n1 - cum.f1 * n.n0)) AS num
      FROM cum JOIN n USING (prio)
      WHERE cum.c_next IS NOT NULL
      GROUP BY 1
    )
    SELECT n.prio AS o_orderpriority, n.n0 AS n_even, n.n1 AS n_odd,
           CASE WHEN n.n0 > 0 AND n.n1 > 0
                THEN CAST(COALESCE(w1.num, 0) // (CAST(n.n0 AS HUGEINT) * n.n1)
                          AS BIGINT)
           END AS w1_cents
    FROM n LEFT JOIN w1 ON n.prio = w1.prio
    ORDER BY o_orderpriority
    """,
)
def orders_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A131 — exact 1-Wasserstein (earth-mover) distance between the
    even-day and odd-day order-value distributions per priority:
    W1 = ∫|F_even − F_odd| dx over the pooled support, computed as
    Σ gap·|F0·n1 − F1·n0| / (n0·n1) in exact integers.  The
    magnitude-aware drift read: Q11's KS sees only the largest CDF
    gap and A66's PSI pre-bins — W1 is the actual cost of moving one
    distribution onto the other, in cents.

    Determinism: support points are exact cents; cumulative counts
    are exact int64; cross-multiplied CDF gaps |F0·n1 − F1·n0| and
    the gap-weighted sum accumulate in exact 128-bit (HUGEINT <->
    decimal(38,0)); the final division is truncating on both engines.
    The parity split matches EV35's (DATE_DIFF % 2, truncating
    remainder on BOTH engines — hazard-class (a) audited).

    Scale shape: one (prio, cents) hash aggregate absorbs the scan
    (support-bounded, not row-bounded); cumulative/lead windows
    partition BY PRIORITY over the value support (bounded by the
    2-decimal price domain per group, never a single global
    partition); readout k rows."""
    v = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        cents(F.col("o_totalprice")).alias("c"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
            % 2
        ).alias("par"),
    )
    s = v.groupBy("prio", "c").agg(
        F.sum(F.when(F.col("par") == 0, 1).otherwise(0)).cast("long").alias("c0"),
        F.sum(F.when(F.col("par") == 1, 1).otherwise(0)).cast("long").alias("c1"),
    )
    n = s.groupBy("prio").agg(
        F.sum("c0").cast("long").alias("n0"), F.sum("c1").cast("long").alias("n1")
    )
    w = Window.partitionBy("prio").orderBy("c")
    cum = s.select(
        "prio",
        "c",
        F.sum("c0").over(w).cast("long").alias("f0"),
        F.sum("c1").over(w).cast("long").alias("f1"),
        F.lead("c").over(w).alias("c_next"),
    )
    w1 = (
        cum.join(n, "prio")
        .where(F.col("c_next").isNotNull())
        .groupBy("prio")
        .agg(
            F.sum(
                (F.col("c_next") - F.col("c")).cast("decimal(19,0)")
                * F.abs(
                    F.col("f0").cast("decimal(19,0)") * F.col("n1")
                    - F.col("f1").cast("decimal(19,0)") * F.col("n0")
                ).cast("decimal(19,0)")
            ).alias("num")
        )
    )
    return (
        n.join(w1, "prio", "left")
        .select(
            F.col("prio").alias("o_orderpriority"),
            F.col("n0").alias("n_even"),
            F.col("n1").alias("n_odd"),
            F.when(
                (F.col("n0") > 0) & (F.col("n1") > 0),
                F.expr(
                    "CAST(coalesce(num, CAST(0 AS DECIMAL(38,0)))"
                    " div (CAST(n0 AS DECIMAL(19,0)) * n1) AS BIGINT)"
                ),
            ).alias("w1_cents"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# A132: Simpson diversity per day (exact pair-count form)
# ---------------------------------------------------------------------------

@query(
    "events_simpson_diversity",
    """
    WITH c AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT day, CAST(SUM(n) AS BIGINT) AS nn,
             SUM(CAST(n AS HUGEINT) * (n - 1)) AS pairs_same
      FROM c GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, nn AS n_events,
           CASE WHEN nn >= 2
                THEN CAST(1000000 - pairs_same * 1000000
                          // (CAST(nn AS HUGEINT) * (nn - 1)) AS BIGINT)
           END AS diversity_ppm
    FROM d ORDER BY day
    """,
)
def events_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A132 — Simpson diversity per day, unbiased pair form:
    1 − Σn_i(n_i−1)/(N(N−1)) — the probability that two events drawn
    that day (without replacement) differ in type.  The ecology-
    standard concentration read next to A40's Shannon-entropy mix
    (entropy weighs rare types logarithmically; Simpson is dominance-
    sensitive — the pair a mix-shift monitor wants both of).

    Determinism: pure exact integer pair counts in 128-bit (HUGEINT
    <-> decimal — N(N−1) leaves int64 past ~3e9 events/day), one
    truncating ppm division; single-event days read NULL on both
    engines.

    Scale shape: one (day, type) hash aggregate absorbs the scan;
    day rollup is calendar-bounded; readout ≤366 rows/year."""
    c = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    d = c.groupBy("day").agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.col("n").cast("decimal(19,0)") * (F.col("n") - 1)).alias(
            "pairs_same"
        ),
    )
    return d.select(
        # string day: the driver's pandas compare coerces DATE columns
        # differently across the two engines (registry convention)
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("nn").alias("n_events"),
        F.when(
            F.col("nn") >= 2,
            F.expr(
                "CAST(1000000 - pairs_same * 1000000"
                " div (CAST(nn AS DECIMAL(19,0)) * (nn - 1)) AS BIGINT)"
            ),
        ).alias("diversity_ppm"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# A133: Durbin-Watson statistic on centered daily-value series
# ---------------------------------------------------------------------------

@query(
    "events_durbin_watson",
    """
    WITH s AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    st AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s1
      FROM s GROUP BY 1
    ),
    j AS (
      SELECT s.event_type, s.v, st.n, st.s1,
             LAG(v) OVER (PARTITION BY s.event_type ORDER BY s.d) AS vp
      FROM s JOIN st USING (event_type)
    ),
    a AS (
      SELECT event_type, MAX(n) AS n_days,
             SUM((CAST(n AS HUGEINT)*v - s1) * (CAST(n AS HUGEINT)*v - s1))
               AS den,
             SUM(CASE WHEN vp IS NULL THEN 0
                 ELSE (CAST(n AS HUGEINT)*(v - vp))
                      * (CAST(n AS HUGEINT)*(v - vp)) END) AS num
      FROM j GROUP BY event_type
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           CASE WHEN den > 0 THEN CAST(num * 1000 // den AS BIGINT)
           END AS dw_milli
    FROM a ORDER BY event_type
    """,
)
def events_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A133 — Durbin-Watson statistic DW = Σ(e_t − e_{t−1})²/Σe_t² on
    each type's CENTERED daily-revenue series (deviations from the
    series mean — the classical lag-1 serial-correlation diagnostic
    in its [0, 4] form: 2 = no autocorrelation, →0 positive, →4
    negative).  Companion of A34's ACF(1): DW ≈ 2(1 − r₁) but is the
    form regression texts tabulate critical values for.

    Determinism: the A34 n-scaled deviation device — n·v_t − S makes
    the mean exact; the n² factor appears in BOTH numerator (n·(v_t −
    v_{t−1}) = (n·v_t − S) − (n·v_{t−1} − S)) and denominator and
    cancels in the ratio; products accumulate exact 128-bit (HUGEINT
    <-> decimal(38,0), the VERDICT r9 #3 discipline); one truncating
    milli division; constant series (den = 0) read NULL on both
    engines.

    Scale shape: one (type, day) partial aggregate absorbs the scan;
    the lag window partitions BY TYPE over calendar-bounded series;
    readout k rows."""
    ev = _t(spark, sf_dir, "events")
    s = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("v")
    )
    st = s.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"), F.sum("v").cast("long").alias("s1")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    j = s.join(F.broadcast(st), "event_type").select(
        "event_type", "v", "n", "s1", F.lag("v").over(w).alias("vp")
    )
    dev = (F.col("n").cast("decimal(19,0)") * F.col("v") - F.col("s1")).cast(
        "decimal(19,0)"
    )
    diff = (F.col("n").cast("decimal(19,0)") * (F.col("v") - F.col("vp"))).cast(
        "decimal(19,0)"
    )
    a = j.groupBy("event_type").agg(
        F.max("n").alias("n_days"),
        F.sum(dev * dev).alias("den"),
        F.sum(
            F.when(F.col("vp").isNull(), F.lit(0).cast("decimal(38,0)")).otherwise(
                diff * diff
            )
        ).alias("num"),
    )
    return a.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.when(
            F.col("den") > 0, F.expr("CAST(num * 1000 div den AS BIGINT)")
        ).alias("dw_milli"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# EV40: MASE of the seasonal-naive forecast on daily counts
# ---------------------------------------------------------------------------

_MASE_TRAIN_DAYS = 21  # first 21 fixture days train the scale; rest scored


@query(
    "events_mase",
    f"""
    WITH d AS (
      SELECT event_type,
             DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    lo AS (SELECT event_type, MIN(day) AS d0 FROM d GROUP BY 1),
    t AS (
      SELECT d.event_type, d.day - lo.d0 AS rel, d.x
      FROM d JOIN lo USING (event_type)
    ),
    scale AS (
      SELECT a.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_scale,
             CAST(SUM(ABS(a.x - b.x)) AS BIGINT) AS sae_scale
      FROM t a JOIN t b
        ON a.event_type = b.event_type AND b.rel = a.rel - 1
      WHERE a.rel < {_MASE_TRAIN_DAYS}
      GROUP BY 1
    ),
    model AS (
      SELECT a.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(ABS(a.x - b.x)) AS BIGINT) AS sae_model
      FROM t a JOIN t b
        ON a.event_type = b.event_type AND b.rel = a.rel - 7
      WHERE a.rel >= {_MASE_TRAIN_DAYS}
      GROUP BY 1
    )
    SELECT s.event_type, s.n_scale, s.sae_scale, m.n_test, m.sae_model,
           CASE WHEN s.sae_scale > 0 AND m.n_test > 0
                THEN CAST(CAST(m.sae_model AS HUGEINT) * s.n_scale * 1000000
                          // (CAST(s.sae_scale AS HUGEINT) * m.n_test)
                          AS BIGINT)
           END AS mase_micro
    FROM scale s JOIN model m USING (event_type)
    ORDER BY s.event_type
    """,
)
def events_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV40 — MASE (Hyndman-Koehler mean absolute SCALED error): the
    seasonal-naive-7 forecast scores the days past the 21-day train
    split, scaled by the in-sample naive-1 MAE — MASE < 1e6 (micro)
    beats the one-step naive ON THIS SERIES, making forecast quality
    comparable ACROSS series of different volumes (EV35's pinball
    scores bands, A45's baselines report raw MAE; MASE is the
    scale-free league table).

    Determinism: daily counts are exact integers; both SAE sums are
    exact int64; the scaled ratio cross-multiplies in 128-bit and
    truncates once (HUGEINT <-> decimal); zero in-sample scale or an
    empty test window reads NULL/absent on both engines.  Day index
    is epoch-relative (DATE_DIFF from 1970-01-01, non-negative for
    any post-epoch fixture; used only via rel = day − min(day), so
    pre-epoch dates stay consistent too).

    Scale shape: one (type, day) hash aggregate absorbs the scan;
    lag-1/lag-7 are equi-joins on the bounded day table (no window
    needed); readout k rows."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    ).agg(F.count("*").cast("long").alias("x"))
    lo = d.groupBy("event_type").agg(F.min("day").alias("d0"))
    t = d.join(F.broadcast(lo), "event_type").select(
        "event_type", (F.col("day") - F.col("d0")).alias("rel"), "x"
    )
    a = t.select("event_type", F.col("rel").alias("ra"), F.col("x").alias("xa"))
    b = t.select("event_type", F.col("rel").alias("rb"), F.col("x").alias("xb"))
    scale = (
        a.join(b, "event_type")
        .where((F.col("rb") == F.col("ra") - 1) & (F.col("ra") < _MASE_TRAIN_DAYS))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_scale"),
            F.sum(F.abs(F.col("xa") - F.col("xb"))).cast("long").alias("sae_scale"),
        )
    )
    model = (
        a.join(b, "event_type")
        .where((F.col("rb") == F.col("ra") - 7) & (F.col("ra") >= _MASE_TRAIN_DAYS))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(F.abs(F.col("xa") - F.col("xb"))).cast("long").alias("sae_model"),
        )
    )
    return (
        scale.join(model, "event_type")
        .select(
            "event_type",
            "n_scale",
            "sae_scale",
            "n_test",
            "sae_model",
            F.when(
                (F.col("sae_scale") > 0) & (F.col("n_test") > 0),
                F.expr(
                    "CAST(CAST(sae_model AS DECIMAL(19,0)) * n_scale * 1000000"
                    " div (CAST(sae_scale AS DECIMAL(19,0)) * n_test) AS BIGINT)"
                ),
            ).alias("mase_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# EV41: Hosmer-Lemeshow goodness-of-fit over NTILE-10 risk deciles
# ---------------------------------------------------------------------------

@query(
    "eval_hosmer_lemeshow",
    """
    WITH b AS (
      SELECT vec_id,
             CAST(label % 2 AS BIGINT) AS y,
             CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           + CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT)
               AS score
      FROM embeddings
    ),
    mm AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM b),
    p AS (
      SELECT vec_id, y,
             CAST(((score - lo) * 1000000) // GREATEST(hi - lo, 1) AS BIGINT)
               AS pm
      FROM b, mm
    ),
    g AS (
      SELECT *, CAST(NTILE(10) OVER (ORDER BY pm, vec_id) AS BIGINT) AS bin
      FROM p
    ),
    s AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS obs_pos,
             CAST(SUM(pm) AS BIGINT) AS exp_pos_micro
      FROM g GROUP BY bin
    ),
    t AS (
      SELECT bin, n, obs_pos, exp_pos_micro,
             CASE WHEN exp_pos_micro > 0 AND exp_pos_micro < n * 1000000
                  THEN CAST(ROUND(
                    (CAST(obs_pos AS DOUBLE)
                     - CAST(exp_pos_micro AS DOUBLE) / 1000000.0)
                    * (CAST(obs_pos AS DOUBLE)
                       - CAST(exp_pos_micro AS DOUBLE) / 1000000.0)
                    / ((CAST(exp_pos_micro AS DOUBLE) / 1000000.0)
                       * (1.0 - CAST(exp_pos_micro AS DOUBLE) / 1000000.0
                                / CAST(n AS DOUBLE)))
                    * 1000000000) AS BIGINT)
                  ELSE 0 END AS term_nano
      FROM s
    )
    SELECT bin, n, obs_pos, exp_pos_micro, term_nano,
           CAST(SUM(term_nano) OVER () AS BIGINT) AS hl_nano
    FROM t ORDER BY bin
    """,
)
def eval_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV41 — Hosmer-Lemeshow goodness-of-fit: the EV1 pinned pseudo-
    model's min-max micro-probabilities are cut into NTILE-10 risk
    deciles ((pm, vec_id) total order); per decile the χ² term
    (O − E)²/(E(1 − E/n)) compares observed positives against the
    summed predicted probability; HL = Σ over the 10 bins, against
    χ²(8) criticals.  EV3's reliability diagram SHOWS the miscali-
    bration and EV36's ECE averages it; HL is the significance test a
    model-validation report quotes.

    Determinism: pm and per-bin sums are exact int64 (Σpm is the
    exact expected-positive count in micro units); each bin's χ² term
    is ONE fixed double tree NANO-QUANTIZED BEFORE the 10-bin fold,
    so HL is an exact integer sum (the A112 Ljung-Box discipline);
    degenerate bins (E = 0 or E = n) contribute an agreed exact 0.

    Scale shape: the decile assignment uses the DISTRIBUTED ntile
    device (range-partitioned rank, no single-partition window); one
    10-bin hash aggregate; the Σ over 10 bins runs on the bounded
    bin table; readout 10 rows."""
    from bytesprocessor_spark.operators.ranking import distributed_ntile
    from bytesprocessor_spark.queries_eval import _scored

    b = _scored(spark, sf_dir)
    mm = b.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    p = (
        b.crossJoin(F.broadcast(mm))
        .select(
            "vec_id",
            "y",
            F.expr(
                "CAST(((score - lo) * 1000000) div GREATEST(hi - lo, 1)"
                " AS BIGINT)"
            ).alias("pm"),
        )
    )
    g = distributed_ntile(p, [F.col("pm").asc(), F.col("vec_id").asc()], 10,
                          tile_col="bin")
    s = g.groupBy(F.col("bin").cast("long").alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("obs_pos"),
        F.sum("pm").cast("long").alias("exp_pos_micro"),
    )
    eD = F.col("exp_pos_micro").cast("double") / 1000000.0
    oD = F.col("obs_pos").cast("double")
    nD = F.col("n").cast("double")
    term = F.when(
        (F.col("exp_pos_micro") > 0)
        & (F.col("exp_pos_micro") < F.col("n") * 1000000),
        F.round((oD - eD) * (oD - eD) / (eD * (1.0 - eD / nD)) * 1000000000)
        .cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    t = bounded_single_group(s.select("bin", "n", "obs_pos",
                                      "exp_pos_micro", term.alias("term_nano")))
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return t.select(
        "bin",
        "n",
        "obs_pos",
        "exp_pos_micro",
        "term_nano",
        F.sum("term_nano").over(w_all).cast("long").alias("hl_nano"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# A134: Fisher ideal price index (Laspeyres x Paasche geometric mean)
# ---------------------------------------------------------------------------

_FISHER_BASE_YEAR = 1995


@query(
    "orders_fisher_index",
    f"""
    WITH li AS (
      SELECT l_partkey,
             EXTRACT(year FROM l_shipdate) AS yr,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_c
      FROM lineitem
      WHERE EXTRACT(year FROM l_shipdate) BETWEEN {_FISHER_BASE_YEAR} AND 2000
    ),
    pp AS (
      SELECT l_partkey, yr,
             CAST(SUM(price_c) * 1000 // SUM(qty_c) AS BIGINT) AS unit_milli,
             CAST(SUM(qty_c) AS BIGINT) AS q
      FROM li GROUP BY 1, 2
    ),
    base AS (
      SELECT l_partkey, unit_milli AS p0, q AS q0 FROM pp
      WHERE yr = {_FISHER_BASE_YEAR}
    ),
    j AS (
      SELECT pp.yr, pp.unit_milli AS pt, pp.q AS qt, base.p0, base.q0
      FROM pp JOIN base USING (l_partkey)
      WHERE pp.yr > {_FISHER_BASE_YEAR}
    ),
    k AS (
      SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(pt * q0 // 1000) AS BIGINT) AS lasp_now,
             CAST(SUM(p0 * q0 // 1000) AS BIGINT) AS lasp_base,
             CAST(SUM(pt * qt // 1000) AS BIGINT) AS paasche_now,
             CAST(SUM(p0 * qt // 1000) AS BIGINT) AS paasche_base
      FROM j GROUP BY yr
    )
    SELECT yr, n_parts,
           CAST(lasp_now * 1000 // lasp_base AS BIGINT) AS laspeyres_milli,
           CAST(paasche_now * 1000 // paasche_base AS BIGINT)
             AS paasche_milli,
           CAST(ROUND(CASE WHEN lasp_base > 0 AND paasche_base > 0
                THEN SQRT((CAST(lasp_now AS DOUBLE)
                           / CAST(lasp_base AS DOUBLE))
                          * (CAST(paasche_now AS DOUBLE)
                             / CAST(paasche_base AS DOUBLE)))
                END * 1000) AS BIGINT) AS fisher_milli
    FROM k ORDER BY yr
    """,
)
def orders_fisher_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A134 — Fisher ideal price index per year: the geometric mean of
    the Laspeyres index (base-year basket, A65) and the Paasche index
    (current-year basket) — Laspeyres overstates inflation (frozen
    basket ignores substitution), Paasche understates it; Fisher is
    the superlative index national accounts actually publish, closing
    the price-index family.

    Determinism: unit prices are exact truncating milli-divisions of
    cents sums; all four baskets are exact int64 sums of truncated
    products (the A65 device); Laspeyres/Paasche are truncating milli
    ratios; Fisher is ONE double tree (two exact-int ratios, a
    product, a sqrt), milli-quantized.

    Scale shape: one (part, year) partial aggregate absorbs the scan;
    the base-year slice joins back on partkey (co-partitioned with
    the aggregate); K-year readout."""
    li = _t(spark, sf_dir, "lineitem")
    l = li.where(F.year("l_shipdate").between(_FISHER_BASE_YEAR, 2000)).select(
        "l_partkey",
        F.year("l_shipdate").alias("yr"),
        cents(F.col("l_extendedprice")).alias("price_c"),
        cents(F.col("l_quantity")).alias("qty_c"),
    )
    pp = l.groupBy("l_partkey", "yr").agg(
        F.expr("CAST(sum(price_c) * 1000 div sum(qty_c) AS BIGINT)").alias(
            "unit_milli"
        ),
        F.sum("qty_c").cast("long").alias("q"),
    )
    base = pp.where(F.col("yr") == _FISHER_BASE_YEAR).select(
        "l_partkey", F.col("unit_milli").alias("p0"), F.col("q").alias("q0")
    )
    k = (
        pp.where(F.col("yr") > _FISHER_BASE_YEAR)
        .join(base, "l_partkey")
        .groupBy("yr")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum(F.expr("unit_milli * q0 div 1000")).cast("long").alias("lasp_now"),
            F.sum(F.expr("p0 * q0 div 1000")).cast("long").alias("lasp_base"),
            F.sum(F.expr("unit_milli * q div 1000")).cast("long").alias(
                "paasche_now"
            ),
            F.sum(F.expr("p0 * q div 1000")).cast("long").alias("paasche_base"),
        )
    )
    # ADVICE r10 fix: a zero base basket made the double tree hit
    # inf inside SQRT (DuckDB CAST throws, Spark NULLs) — both
    # engines now agree on NULL via an identical positivity guard,
    # matching the sibling integer-ratio columns' NULL convention.
    fisher = F.round(
        F.when(
            (F.col("lasp_base") > 0) & (F.col("paasche_base") > 0),
            F.sqrt(
                (
                    F.col("lasp_now").cast("double")
                    / F.col("lasp_base").cast("double")
                )
                * (
                    F.col("paasche_now").cast("double")
                    / F.col("paasche_base").cast("double")
                )
            ),
        )
        * 1000
    ).cast("long")
    return k.select(
        "yr",
        "n_parts",
        F.expr("CAST(lasp_now * 1000 div lasp_base AS BIGINT)").alias(
            "laspeyres_milli"
        ),
        F.expr("CAST(paasche_now * 1000 div paasche_base AS BIGINT)").alias(
            "paasche_milli"
        ),
        fisher.alias("fisher_milli"),
    ).orderBy("yr")


# ---------------------------------------------------------------------------
# GR15: rich-club coefficient of the strong-edge co-supplier graph
# ---------------------------------------------------------------------------

_RICH_CLUB_KS = (2, 4, 8, 16)


@query(
    "graph_rich_club",
    f"""
    WITH os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
    pw AS (
      SELECT a.s AS a, b.s AS b, CAST(COUNT(*) AS BIGINT) AS w
      FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
      GROUP BY 1, 2
    ),
    rkd AS (
      SELECT a, b,
             ROW_NUMBER() OVER (ORDER BY w DESC, a, b) AS rk,
             COUNT(*) OVER () AS n
      FROM pw
    ),
    e0 AS (SELECT a, b FROM rkd WHERE rk <= GREATEST(n // 10, 10)),
    deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT a AS u FROM e0 UNION ALL SELECT b AS u FROM e0) x
      GROUP BY u
    ),
    ks AS (SELECT UNNEST([{", ".join(str(k) for k in _RICH_CLUB_KS)}]) AS k),
    nodes AS (
      SELECT ks.k, CAST(COUNT(deg.u) AS BIGINT) AS n_nodes
      FROM ks LEFT JOIN deg ON deg.d > ks.k GROUP BY ks.k
    ),
    edges AS (
      SELECT ks.k, CAST(COUNT(ee.a) AS BIGINT) AS n_edges
      FROM ks LEFT JOIN (
        SELECT e0.a, e0.b, da.d AS dda, db.d AS ddb
        FROM e0 JOIN deg da ON e0.a = da.u JOIN deg db ON e0.b = db.u
      ) ee ON ee.dda > ks.k AND ee.ddb > ks.k
      GROUP BY ks.k
    )
    SELECT n.k, n.n_nodes, e.n_edges,
           CASE WHEN n.n_nodes >= 2
                THEN CAST(2 * e.n_edges * 1000000
                          // (n.n_nodes * (n.n_nodes - 1)) AS BIGINT)
           END AS phi_ppm
    FROM nodes n JOIN edges e USING (k) ORDER BY n.k
    """,
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR15 — rich-club coefficient φ(k) = 2·E_k / (N_k(N_k−1)) of
    the strong-edge co-supplier graph: among nodes of degree > k, the
    realized fraction of possible edges.  Rising φ(k) says hubs
    preferentially interconnect (a rich club) — the topology read
    PageRank/Katz (importance) and GR10 (local clustering) cannot
    give; it is THE supply-chain concentration-risk structure metric.

    Edge rule: GR12's strong-edge discipline (top 10% of pairs by
    co-order weight, floor 10, distributed rank cut) — φ over the
    near-complete raw graph is structurally 1.

    Determinism: exact integer degrees/counts over the unique
    (w desc, a, b) rank order; φ is a truncating ppm division;
    clubs with fewer than 2 members read NULL on both engines.

    Scale shape: the memoized pair-weight substrate + distributed
    rank cut (GR12's plan); degrees and club filters are equi-joins
    on integer keys; the k-grid is a 4-row broadcast; readout 4
    rows."""
    # r11: the 10% rank cut is the memoized supplier_strong_edges
    # table (shared verbatim with jaccard_linkpred and ktruss)
    from bytesprocessor_spark.operators.graph import supplier_strong_edges

    e0 = supplier_strong_edges(spark, sf_dir)
    deg = (
        e0.select(F.col("a").alias("u"))
        .unionAll(e0.select(F.col("b").alias("u")))
        .groupBy("u")
        .agg(F.count("*").cast("long").alias("d"))
    )
    ks = spark.range(len(_RICH_CLUB_KS)).select(
        F.element_at(
            F.array(*[F.lit(k).cast("long") for k in _RICH_CLUB_KS]),
            F.col("id").cast("int") + 1,
        ).alias("k")
    )
    nodes = (
        ks.join(deg, deg.d > ks.k, "left")
        .groupBy("k")
        .agg(F.count(deg.u).cast("long").alias("n_nodes"))
    )
    ee = (
        e0.join(deg.select(F.col("u").alias("ua"), F.col("d").alias("dda")),
                F.col("a") == F.col("ua"))
        .join(deg.select(F.col("u").alias("ub"), F.col("d").alias("ddb")),
              F.col("b") == F.col("ub"))
        .select("a", "b", "dda", "ddb")
    )
    edges = (
        ks.join(ee, (ee.dda > ks.k) & (ee.ddb > ks.k), "left")
        .groupBy("k")
        .agg(F.count(ee.a).cast("long").alias("n_edges"))
    )
    return (
        nodes.join(edges, "k")
        .select(
            "k",
            "n_nodes",
            "n_edges",
            F.when(
                F.col("n_nodes") >= 2,
                F.expr(
                    "CAST(2 * n_edges * 1000000"
                    " div (n_nodes * (n_nodes - 1)) AS BIGINT)"
                ),
            ).alias("phi_ppm"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# A135: Nelson-Aalen cumulative hazard (the A37 Kaplan-Meier twin)
# ---------------------------------------------------------------------------

_NA_CUTOFF = "1995-07-01 00:00:00"  # A37's administrative censoring date


@query(
    "orders_nelson_aalen",
    f"""
    WITH fs AS (
      SELECT l_orderkey, MIN(l_shipdate) AS first_ship
      FROM lineitem GROUP BY l_orderkey
    ),
    obs AS (
      SELECT CASE WHEN fs.first_ship <= TIMESTAMP '{_NA_CUTOFF}'
                  THEN date_diff('day', o.o_orderdate, fs.first_ship)
                  ELSE date_diff('day', o.o_orderdate, TIMESTAMP '{_NA_CUTOFF}')
             END AS t,
             CASE WHEN fs.first_ship <= TIMESTAMP '{_NA_CUTOFF}'
                  THEN 1 ELSE 0 END AS ev
      FROM orders o JOIN fs ON o.o_orderkey = fs.l_orderkey
      WHERE o.o_orderdate < TIMESTAMP '{_NA_CUTOFF}'
    ),
    h AS (
      SELECT t, COUNT(*) AS m, CAST(SUM(ev) AS BIGINT) AS d
      FROM obs GROUP BY t
    ),
    r AS (
      SELECT t, d,
             CAST((SELECT COUNT(*) FROM obs) AS BIGINT)
               - COALESCE(SUM(m) OVER (ORDER BY t
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS n_risk
      FROM h
    ),
    steps AS (
      SELECT t, d, n_risk,
             CAST(d * 1000000 // n_risk AS BIGINT) AS inc_micro
      FROM r WHERE d > 0
    )
    SELECT CAST(t AS BIGINT) AS t_day, CAST(n_risk AS BIGINT) AS n_risk,
           d AS n_events,
           CAST(SUM(inc_micro) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS hazard_micro,
           CAST(ROUND(EXP(-CAST(SUM(inc_micro) OVER (ORDER BY t
                                                     ROWS UNBOUNDED PRECEDING)
                            AS DOUBLE) / 1000000) * 1000000) AS BIGINT)
             AS surv_fh_ppm
    FROM steps ORDER BY t_day
    """,
)
def orders_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A135 — Nelson-Aalen cumulative hazard over the A37 order→ship
    duration data (same censoring design): H(t) = Σ_{{t_i≤t}} d_i/n_i,
    plus the Fleming-Harrington survival exp(−H(t)) — the hazard-side
    twin of Kaplan-Meier (A37 multiplies survival factors; NA sums
    hazard increments, is defined even when a step empties the risk
    set, and is what a proportional-hazards diagnostic actually
    plots).

    Determinism: per-step increments d/n are truncating micro
    divisions (exact ints); the cumulative hazard is an EXACT integer
    prefix sum of those quantized increments (never a double fold);
    exp(−H) is one double per row, ppm-quantized.

    Scale shape: A37's exact plan — (order, first-ship) aggregate,
    duration-keyed hash aggregate, prefix windows over the duration-
    DOMAIN-bounded step table (declared bounded_single_group);
    readout ≤ duration-domain rows."""
    from pyspark.sql.window import Window as W

    cutoff = F.lit(_NA_CUTOFF).cast("timestamp_ntz")
    li = _t(spark, sf_dir, "lineitem")
    fs = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    o = _t(spark, sf_dir, "orders")
    obs = (
        o.where(F.col("o_orderdate") < cutoff)
        .join(fs, o["o_orderkey"] == fs["l_orderkey"])
        .select(
            F.when(
                F.col("first_ship") <= cutoff,
                F.datediff(F.col("first_ship"), F.col("o_orderdate")),
            )
            .otherwise(F.datediff(cutoff, F.col("o_orderdate")))
            .alias("t"),
            F.when(F.col("first_ship") <= cutoff, 1).otherwise(0).alias("ev"),
        )
    )
    h = obs.groupBy("t").agg(
        F.count("*").alias("m"), F.sum("ev").cast("long").alias("d")
    )
    n_total = obs.agg(F.count("*").cast("long").alias("n_total"))
    h = bounded_single_group(h)  # duration-domain-bounded table
    wprev = (
        W.partitionBy("__opid").orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    )
    r = h.crossJoin(F.broadcast(n_total)).select(
        "t",
        "d",
        (F.col("n_total") - F.coalesce(F.sum("m").over(wprev), F.lit(0))).alias(
            "n_risk"
        ),
    )
    steps = r.where(F.col("d") > 0).select(
        "t",
        "d",
        "n_risk",
        F.expr("CAST(d * 1000000 div n_risk AS BIGINT)").alias("inc_micro"),
    )
    steps = bounded_single_group(steps, col_name="__opid2")
    wcum = (
        W.partitionBy("__opid2").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    )
    hz = F.sum("inc_micro").over(wcum).cast("long")
    return steps.select(
        F.col("t").cast("long").alias("t_day"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("n_events"),
        hz.alias("hazard_micro"),
        F.round(F.exp(-hz.cast("double") / 1000000) * 1000000)
        .cast("long")
        .alias("surv_fh_ppm"),
    ).orderBy("t_day")


# ---------------------------------------------------------------------------
# A136: Holm-Bonferroni step-down over the A90 test family
# ---------------------------------------------------------------------------

def _holm_sql() -> str:
    from bytesprocessor_spark.queries_r8b import _PHI_TAIL

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
      SELECT g, dow, n_gd, n_tests,
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
             LEAST(1000000, p_micro * (n_tests - rank + 1)) AS raw_adj,
             CAST(MIN(CASE WHEN p_micro * (n_tests - rank + 1) > 50000
                           THEN rank ELSE NULL END) OVER () AS BIGINT)
               AS first_accept
      FROM r
    )
    SELECT g AS event_type, dow, n_gd, p_micro, rank,
           CAST(MAX(raw_adj) OVER (ORDER BY rank
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS p_adj_micro,
           (first_accept IS NULL OR rank < first_accept) AS rejected
    FROM st ORDER BY rank
    """


@query("events_holm_bonferroni", _holm_sql())
def events_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A136 — Holm-Bonferroni step-down over the A90 family (35
    type×weekday proportion z-tests): reject while p_(i) ≤
    α/(m−i+1), adjusted p = running max of min(1, p_(i)·(m−i+1)).
    Controls FWER with NO independence assumption — the conservative
    companion of A90's BH step-up (which controls FDR); a metrics
    platform reports both.

    Determinism: A90's exact machinery verbatim (integer cell counts,
    the pinned Abramowitz-Stegun 26.2.17 normal tail, micro-quantized
    p BEFORE any comparison); the step-down scan and running max run
    over integer p_micro on the bounded 35-row family; the rejection
    frontier is an integer rank compare at α = 0.05.

    Scale shape: one (type, dow) hash aggregate absorbs the scan;
    every window after it runs on the k×7-bounded test family;
    readout 35 rows."""
    from bytesprocessor_spark.queries_r8b import _PHI_TAIL

    ev = _t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("event_type").alias("g"),
        # A90's engine-neutral ISODOW device (Spark weekday: Monday=0)
        (F.expr("weekday(ts)") + 1).cast("long").alias("dow"),
    ).agg(F.count("*").cast("long").alias("n_gd"))
    cell = bounded_single_group(cell)
    w_dow = Window.partitionBy("__opid", "dow")
    w_g = Window.partitionBy("__opid", "g")
    w_all = Window.partitionBy("__opid")
    m = cell.select(
        "g",
        "dow",
        "n_gd",
        F.sum("n_gd").over(w_dow).cast("long").alias("n_d"),
        F.sum("n_gd").over(w_g).cast("long").alias("n_g"),
        F.sum("n_gd").over(w_all).cast("long").alias("nn"),
        F.count("*").over(w_all).cast("long").alias("n_tests"),
        F.col("__opid"),
    )
    z = (
        "((CAST(n_gd AS DOUBLE) / CAST(n_d AS DOUBLE)"
        " - CAST(n_g AS DOUBLE) / CAST(nn AS DOUBLE))"
        " / SQRT(CAST(n_g AS DOUBLE) / CAST(nn AS DOUBLE)"
        "        * (1.0 - CAST(n_g AS DOUBLE) / CAST(nn AS DOUBLE))"
        "        / CAST(n_d AS DOUBLE)))"
    )
    tail = _PHI_TAIL.replace("ZG", f"ABS({z})")
    p = m.where(F.col("n_g") < F.col("nn")).select(
        "g",
        "dow",
        "n_gd",
        "n_tests",
        "__opid",
        F.expr(f"CAST(ROUND(2.0 * {tail} * 1000000) AS BIGINT)").alias("p_micro"),
    )
    w_rank = Window.partitionBy("__opid").orderBy("p_micro", "g", "dow")
    r = p.withColumn("rank", F.row_number().over(w_rank).cast("long"))
    raw_adj = F.least(
        F.lit(1000000).cast("long"),
        F.col("p_micro") * (F.col("n_tests") - F.col("rank") + 1),
    )
    w_all2 = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    st = r.select(
        "g",
        "dow",
        "n_gd",
        "p_micro",
        "rank",
        "__opid",
        raw_adj.alias("raw_adj"),
        F.min(
            F.when(
                F.col("p_micro") * (F.col("n_tests") - F.col("rank") + 1) > 50000,
                F.col("rank"),
            )
        )
        .over(w_all2)
        .cast("long")
        .alias("first_accept"),
    )
    w_cum = Window.partitionBy("__opid").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return st.select(
        F.col("g").alias("event_type"),
        "dow",
        "n_gd",
        "p_micro",
        "rank",
        F.max("raw_adj").over(w_cum).cast("long").alias("p_adj_micro"),
        (
            F.col("first_accept").isNull() | (F.col("rank") < F.col("first_accept"))
        ).alias("rejected"),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# A137: Anderson-Darling intra-day uniformity per (type, day)
# ---------------------------------------------------------------------------

@query(
    "events_anderson_darling",
    """
    WITH u AS (
      SELECT event_type, CAST(ts AS DATE) AS day, event_id,
             (2 * (epoch_us(ts) - epoch_us(CAST(CAST(ts AS DATE)
                                            AS TIMESTAMP))) + 1) AS u2num
      FROM events
    ),
    r AS (
      SELECT event_type, day,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type, day
                                     ORDER BY u2num, event_id) AS BIGINT) AS i,
             CAST(COUNT(*) OVER (PARTITION BY event_type, day) AS BIGINT) AS n,
             CAST(ROUND(LN(CAST(u2num AS DOUBLE) / 172800000000.0)
                        * 1000000) AS BIGINT) AS ln_u_micro,
             CAST(ROUND(LN(1.0 - CAST(u2num AS DOUBLE) / 172800000000.0)
                        * 1000000) AS BIGINT) AS ln_1mu_micro
      FROM u
    ),
    pairs AS (
      SELECT a.event_type, a.day, a.n,
             SUM(CAST(2 * a.i - 1 AS HUGEINT)
                 * (a.ln_u_micro + b.ln_1mu_micro)) AS w
      FROM r a JOIN r b
        ON a.event_type = b.event_type AND a.day = b.day
       AND b.i = a.n + 1 - a.i
      GROUP BY 1, 2, 3
    ),
    ad AS (
      SELECT event_type, day, n,
             CAST(ROUND((-CAST(n AS DOUBLE)
                         - CAST(w AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE))
                        * 1000) AS BIGINT) AS a2_milli
      FROM pairs
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(a2_milli) // COUNT(*) AS BIGINT) AS mean_a2_milli,
           CAST(MAX(a2_milli) AS BIGINT) AS max_a2_milli
    FROM ad GROUP BY event_type ORDER BY event_type
    """,
)
def events_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A137 — Anderson-Darling uniformity of INTRA-DAY event times,
    per (type, day), rolled up per type: A² = −n − (1/n)Σ(2i−1)
    [ln u_(i) + ln(1−u_(n+1−i))] with u = fraction of the day.  The
    tail-sensitive distributional test (A-D weights the tails where
    KS is flattest) — "are this type's events spread through the day
    or bunched" is the load-shape read behind A42's hourly profile.

    Determinism: u is the exact odd integer 2·µs+1 over 2·86400e6
    (strictly inside (0,1) — no ln(0) edge); per-row ln values are
    micro-quantized BEFORE the weighted sum, which is then EXACT
    128-bit integer arithmetic over the (i, n+1−i) pairing join
    (ties in u broken by event_id — documented rank convention);
    A² is one double tree milli-quantized per day, and the per-type
    rollup is an exact integer mean (truncating).

    Scale shape: ranks partition by (type, day) — day-bounded windows,
    never corpus-scale; the mirror pairing is a (type, day, i)-keyed
    equi self-join; readout k rows."""
    ev = _t(spark, sf_dir, "events")
    u = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "event_id",
        (
            2
            * (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("ts").cast("date").cast("timestamp"))
            )
            + 1
        ).alias("u2num"),
    )
    w_rank = Window.partitionBy("event_type", "day").orderBy("u2num", "event_id")
    w_n = Window.partitionBy("event_type", "day")
    r = u.select(
        "event_type",
        "day",
        F.row_number().over(w_rank).cast("long").alias("i"),
        F.count("*").over(w_n).cast("long").alias("n"),
        F.round(F.log(F.col("u2num").cast("double") / 172800000000.0) * 1000000)
        .cast("long")
        .alias("ln_u_micro"),
        F.round(
            F.log(1.0 - F.col("u2num").cast("double") / 172800000000.0) * 1000000
        )
        .cast("long")
        .alias("ln_1mu_micro"),
    )
    a = r.select("event_type", "day", "i", "n", "ln_u_micro")
    b = r.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("day2"),
        F.col("i").alias("i2"),
        "ln_1mu_micro",
    )
    pairs = (
        a.join(
            b,
            (F.col("event_type") == F.col("et2"))
            & (F.col("day") == F.col("day2"))
            & (F.col("i2") == F.col("n") + 1 - F.col("i")),
        )
        .groupBy("event_type", "day", "n")
        .agg(
            F.sum(
                (2 * F.col("i") - 1).cast("decimal(19,0)")
                * (F.col("ln_u_micro") + F.col("ln_1mu_micro"))
            ).alias("w")
        )
    )
    ad = pairs.select(
        "event_type",
        "day",
        "n",
        F.round(
            (
                -F.col("n").cast("double")
                - F.col("w").cast("double") / 1000000.0 / F.col("n").cast("double")
            )
            * 1000
        )
        .cast("long")
        .alias("a2_milli"),
    )
    return (
        ad.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.expr("CAST(SUM(a2_milli) div COUNT(*) AS BIGINT)").alias(
                "mean_a2_milli"
            ),
            F.max("a2_milli").cast("long").alias("max_a2_milli"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# A138: Grubbs outlier statistic on daily totals per type
# ---------------------------------------------------------------------------

@query(
    "events_grubbs",
    """
    WITH s AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    st AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(v AS HUGEINT)) AS s1,
             SUM(CAST(v AS HUGEINT) * v) AS s2
      FROM s GROUP BY 1
    ),
    dev AS (
      SELECT s.event_type, s.day, s.v, st.n,
             ABS(CAST(st.n AS HUGEINT) * s.v - st.s1) AS adev,
             st.s1, st.s2
      FROM s JOIN st USING (event_type)
    ),
    top AS (
      SELECT event_type, day, v, n, adev, s1, s2,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY adev DESC, day) AS rk
      FROM dev
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           strftime(day, '%Y-%m-%d') AS outlier_day,
           CASE WHEN n >= 3 AND CAST(s2 AS DOUBLE) * CAST(n AS DOUBLE)
                                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0
                THEN CAST(ROUND(CAST(adev AS DOUBLE)
                     / (CAST(n AS DOUBLE)
                        * SQRT((CAST(s2 AS DOUBLE)
                                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                               / (CAST(n AS DOUBLE) - 1)))
                     * 1000) AS BIGINT)
           END AS g_milli
    FROM top WHERE rk = 1 ORDER BY event_type
    """,
)
def events_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A138 — Grubbs statistic per type: G = max|x − x̄| / s over the
    daily-revenue series, plus WHICH day achieved it.  The single-
    outlier screen (A25's MAD flags by robust distance; Grubbs is the
    classical normal-theory statistic a data-quality runbook
    tabulates critical values for — emitted raw since the critical
    depends on n).

    Determinism: the A34 n-scaled deviation device (|n·v − S| exact
    128-bit, so the argmax day needs no float); the (adev desc, day)
    rank picks a unique witness; G is one double tree over exact
    moments (Bessel s), milli-quantized; n < 3 or constant series
    read NULL on both engines.

    Scale shape: one (type, day) partial aggregate; type-partitioned
    rank over calendar-bounded series; readout k rows."""
    ev = _t(spark, sf_dir, "events")
    s = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("v")
    )
    st = s.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("v").cast("decimal(19,0)") * F.col("v")).alias("s2"),
    )
    dev = s.join(F.broadcast(st), "event_type").select(
        "event_type",
        "day",
        "v",
        "n",
        F.abs(
            F.col("n").cast("decimal(19,0)") * F.col("v") - F.col("s1")
        ).alias("adev"),
        "s1",
        "s2",
    )
    w = Window.partitionBy("event_type").orderBy(F.col("adev").desc(), F.col("day"))
    top = dev.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    nD = F.col("n").cast("double")
    var_num = F.col("s2").cast("double") * nD - F.col("s1").cast("double") * F.col(
        "s1"
    ).cast("double")
    g = F.col("adev").cast("double") / (
        nD
        * F.sqrt(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / nD
            )
            / (nD - 1)
        )
    )
    return top.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.date_format("day", "yyyy-MM-dd").alias("outlier_day"),
        F.when((F.col("n") >= 3) & (var_num > 0), F.round(g * 1000).cast("long"))
        .alias("g_milli"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# EV42: balanced accuracy, Youden's J, informedness/markedness
# ---------------------------------------------------------------------------

@query(
    "eval_youden_j",
    """
    WITH b AS (
      SELECT vec_id,
             CAST(label % 2 AS BIGINT) AS y,
             CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           + CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT)
               AS score
      FROM embeddings
    ),
    mm AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM b),
    p AS (
      SELECT y,
             CASE WHEN ((score - lo) * 1000000) // GREATEST(hi - lo, 1)
                       >= 500000 THEN 1 ELSE 0 END AS yhat
      FROM b, mm
    ),
    c AS (
      SELECT CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN y = 1 AND yhat = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN y = 0 AND yhat = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tn
      FROM p
    )
    SELECT tp, fp, fn, tn,
           CAST(tp * 1000000 // GREATEST(tp + fn, 1) AS BIGINT) AS sens_ppm,
           CAST(tn * 1000000 // GREATEST(tn + fp, 1) AS BIGINT) AS spec_ppm,
           CAST((tp * 1000000 // GREATEST(tp + fn, 1)
                 + tn * 1000000 // GREATEST(tn + fp, 1)) // 2 AS BIGINT)
             AS balanced_acc_ppm,
           CAST(tp * 1000000 // GREATEST(tp + fn, 1)
                + tn * 1000000 // GREATEST(tn + fp, 1) - 1000000 AS BIGINT)
             AS youden_j_ppm,
           CAST(tp * 1000000 // GREATEST(tp + fp, 1)
                + tn * 1000000 // GREATEST(tn + fn, 1) - 1000000 AS BIGINT)
             AS markedness_ppm
    FROM c
    """,
)
def eval_youden_j(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV42 — balanced accuracy, Youden's J (informedness = sens +
    spec − 1) and markedness (PPV + NPV − 1) of the EV1 pinned model
    thresholded at 0.5: the pair of chance-corrected scalars that
    stay honest under class imbalance (accuracy saturates, EV33's
    MCC is their geometric mean — reading both factors separates
    'misses positives' from 'cries wolf').

    Determinism: PURE exact integer arithmetic end to end — confusion
    counts, truncating ppm rates, integer sums; no doubles anywhere.

    Scale shape: one min/max scalar broadcast, one confusion-count
    aggregate absorbs the scan; readout 1 row."""
    from bytesprocessor_spark.queries_eval import _scored

    b = _scored(spark, sf_dir)
    mm = b.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    p = b.crossJoin(F.broadcast(mm)).select(
        "y",
        F.when(
            F.expr("((score - lo) * 1000000) div GREATEST(hi - lo, 1)") >= 500000,
            1,
        )
        .otherwise(0)
        .alias("yhat"),
    )
    c = p.agg(
        F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 0), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("CAST(tp * 1000000 div GREATEST(tp + fn, 1) AS BIGINT)").alias(
            "sens_ppm"
        ),
        F.expr("CAST(tn * 1000000 div GREATEST(tn + fp, 1) AS BIGINT)").alias(
            "spec_ppm"
        ),
        F.expr(
            "CAST((tp * 1000000 div GREATEST(tp + fn, 1)"
            " + tn * 1000000 div GREATEST(tn + fp, 1)) div 2 AS BIGINT)"
        ).alias("balanced_acc_ppm"),
        F.expr(
            "CAST(tp * 1000000 div GREATEST(tp + fn, 1)"
            " + tn * 1000000 div GREATEST(tn + fp, 1) - 1000000 AS BIGINT)"
        ).alias("youden_j_ppm"),
        F.expr(
            "CAST(tp * 1000000 div GREATEST(tp + fp, 1)"
            " + tn * 1000000 div GREATEST(tn + fn, 1) - 1000000 AS BIGINT)"
        ).alias("markedness_ppm"),
    )


# ---------------------------------------------------------------------------
# A139: Tukey IQR fences per priority class
# ---------------------------------------------------------------------------

@query(
    "orders_tukey_fences",
    """
    WITH v AS (
      SELECT o_orderpriority AS prio,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    q AS (
      SELECT prio,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(quantile_disc(c, 0.25) AS BIGINT) AS q1,
             CAST(quantile_disc(c, 0.75) AS BIGINT) AS q3
      FROM v GROUP BY prio
    )
    SELECT q.prio AS o_orderpriority, q.n, q.q1, q.q3,
           q.q3 - q.q1 AS iqr,
           CAST(SUM(CASE WHEN v.c < q.q1 - 3 * (q.q3 - q.q1) // 2
                           OR v.c > q.q3 + 3 * (q.q3 - q.q1) // 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outer_mild,
           CAST(SUM(CASE WHEN v.c < q.q1 - 3 * (q.q3 - q.q1)
                           OR v.c > q.q3 + 3 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
    FROM v JOIN q USING (prio)
    GROUP BY q.prio, q.n, q.q1, q.q3
    ORDER BY o_orderpriority
    """,
)
def orders_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A139 — Tukey boxplot fences per priority: counts outside
    Q1/Q3 ± 1.5·IQR (mild) and ± 3·IQR (extreme).  The box-and-
    whisker read every profiling card draws; A25's MAD flags by
    robust z — Tukey is the quartile-geometry convention, and the
    two disagree exactly on skewed tails (worth having both).

    Determinism: quartiles are percentile_disc data points (exact
    cents int64); the 1.5·IQR fence is 3·iqr//2 TRUNCATING INTEGER
    division on BOTH engines (DuckDB `//` <-> Spark `div`; iqr ≥ 0
    always since q3 ≥ q1, so trunc == floor — hazard-class (a)
    audited); counts exact.

    Scale shape: one percentile aggregate (k rows, broadcast back),
    one counting aggregate absorbs the scan; readout k rows."""
    v = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        cents(F.col("o_totalprice")).alias("c"),
    )
    q = v.groupBy("prio").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY c)")
        .cast("long")
        .alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY c)")
        .cast("long")
        .alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    mild_lo = F.col("q1") - F.expr("3 * (q3 - q1) div 2")
    mild_hi = F.col("q3") + F.expr("3 * (q3 - q1) div 2")
    ext_lo = F.col("q1") - 3 * iqr
    ext_hi = F.col("q3") + 3 * iqr
    return (
        v.join(F.broadcast(q), "prio")
        .groupBy("prio", "n", "q1", "q3")
        .agg(
            F.sum(
                F.when((F.col("c") < mild_lo) | (F.col("c") > mild_hi), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_outer_mild"),
            F.sum(
                F.when((F.col("c") < ext_lo) | (F.col("c") > ext_hi), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_extreme"),
        )
        .select(
            F.col("prio").alias("o_orderpriority"),
            "n",
            "q1",
            "q3",
            iqr.alias("iqr"),
            "n_outer_mild",
            "n_extreme",
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# A140: effect sizes (Cohen's d, Hedges' g, Glass delta)
# ---------------------------------------------------------------------------

@query(
    "events_effect_sizes",
    """
    WITH v AS (
      SELECT event_type,
             CASE WHEN ISODOW(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS wk,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ),
    m AS (
      SELECT event_type, wk,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(c AS HUGEINT)) AS s1,
             SUM(CAST(c AS HUGEINT) * c) AS s2
      FROM v GROUP BY 1, 2
    ),
    w AS (
      SELECT a.event_type,
             a.n AS n1, b.n AS n0,
             CAST(a.s1 AS DOUBLE) AS s11, CAST(a.s2 AS DOUBLE) AS s21,
             CAST(b.s1 AS DOUBLE) AS s10, CAST(b.s2 AS DOUBLE) AS s20
      FROM m a JOIN m b ON a.event_type = b.event_type
      WHERE a.wk = 1 AND b.wk = 0
    )
    SELECT event_type, n1 AS n_weekend, n0 AS n_weekday,
      CAST(ROUND((s11 / CAST(n1 AS DOUBLE) - s10 / CAST(n0 AS DOUBLE))
        / SQRT((
            (s21 - s11 * s11 / CAST(n1 AS DOUBLE))
          + (s20 - s10 * s10 / CAST(n0 AS DOUBLE))
          ) / CAST(n1 + n0 - 2 AS DOUBLE))
        * 1000000) AS BIGINT) AS cohens_d_micro,
      CAST(ROUND((s11 / CAST(n1 AS DOUBLE) - s10 / CAST(n0 AS DOUBLE))
        / SQRT((
            (s21 - s11 * s11 / CAST(n1 AS DOUBLE))
          + (s20 - s10 * s10 / CAST(n0 AS DOUBLE))
          ) / CAST(n1 + n0 - 2 AS DOUBLE))
        * (1.0 - 3.0 / (4.0 * CAST(n1 + n0 AS DOUBLE) - 9.0))
        * 1000000) AS BIGINT) AS hedges_g_micro,
      CAST(ROUND((s11 / CAST(n1 AS DOUBLE) - s10 / CAST(n0 AS DOUBLE))
        / SQRT((s20 - s10 * s10 / CAST(n0 AS DOUBLE))
               / CAST(n0 - 1 AS DOUBLE))
        * 1000000) AS BIGINT) AS glass_delta_micro
    FROM w WHERE n1 >= 2 AND n0 >= 2
    ORDER BY event_type
    """,
)
def events_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A140 — effect sizes for the weekend-vs-weekday value contrast
    per type: Cohen's d (pooled SD), Hedges' g (small-sample
    correction 1 − 3/(4N−9)), Glass Δ (control-group SD) — the
    MAGNITUDE companions of A43's Welch t (p-values say detectable,
    effect sizes say how big; at 100 TB everything is 'significant'
    and only d matters).

    Determinism: exact 128-bit moment sums per (type, weekend) cell
    (HUGEINT <-> decimal, the VERDICT r9 #3 discipline); every
    statistic is one fixed double tree over the six moments with
    identical parenthesization, micro-quantized; cells with n < 2
    drop on both engines.

    Scale shape: one (type, weekend-flag) hash aggregate absorbs the
    scan; the weekend/weekday self-join is k-keyed; readout k rows."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.when(F.expr("weekday(ts)") + 1 >= 6, 1).otherwise(0).alias("wk"),
        cents(F.col("value")).alias("c"),
    )
    m = v.groupBy("event_type", "wk").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c")).alias("s2"),
    )
    a = m.where(F.col("wk") == 1).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s1").cast("double").alias("s11"),
        F.col("s2").cast("double").alias("s21"),
    )
    b = m.where(F.col("wk") == 0).select(
        F.col("event_type").alias("et0"),
        F.col("n").alias("n0"),
        F.col("s1").cast("double").alias("s10"),
        F.col("s2").cast("double").alias("s20"),
    )
    w = a.join(b, F.col("event_type") == F.col("et0")).where(
        (F.col("n1") >= 2) & (F.col("n0") >= 2)
    )
    n1D, n0D = F.col("n1").cast("double"), F.col("n0").cast("double")
    mean_diff = F.col("s11") / n1D - F.col("s10") / n0D
    pooled = F.sqrt(
        (
            (F.col("s21") - F.col("s11") * F.col("s11") / n1D)
            + (F.col("s20") - F.col("s10") * F.col("s10") / n0D)
        )
        / (F.col("n1") + F.col("n0") - 2).cast("double")
    )
    d = mean_diff / pooled
    corr = 1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n0")).cast("double") - 9.0)
    glass = mean_diff / F.sqrt(
        (F.col("s20") - F.col("s10") * F.col("s10") / n0D) / (n0D - 1)
    )
    return w.select(
        "event_type",
        F.col("n1").alias("n_weekend"),
        F.col("n0").alias("n_weekday"),
        F.round(d * 1000000).cast("long").alias("cohens_d_micro"),
        F.round(d * corr * 1000000).cast("long").alias("hedges_g_micro"),
        F.round(glass * 1000000).cast("long").alias("glass_delta_micro"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# L31: Yule's K lexical concentration per source
# ---------------------------------------------------------------------------

@query(
    "text_yule_k",
    """
    WITH t AS (
      SELECT source, unnest([x for x in regexp_split_to_array(lower(text),
                             '[^a-z0-9]+') if len(x) > 0]) AS token
      FROM documents
    ),
    f AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS m
      FROM t GROUP BY 1, 2
    ),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(m) AS BIGINT) AS n,
             SUM(CAST(m AS HUGEINT) * m) AS sm2
      FROM f GROUP BY 1
    )
    SELECT source, vocab, n AS n_tokens,
           CASE WHEN n >= 2
                THEN CAST((sm2 - n) * 10000000000
                          // (CAST(n AS HUGEINT) * n) AS BIGINT)
           END AS yule_k_micro
    FROM s ORDER BY source
    """,
)
def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L31 — Yule's characteristic K per source: K = 10⁴·(Σm² − N)/N²
    over the token-frequency spectrum (m = each type's count) — the
    repeat-rate lexical-concentration constant that, unlike raw TTR
    (L14's diversity suite), is length-invariant by construction: the
    quadratic form estimates the probability two random tokens
    coincide.  High K = formulaic/boilerplate text — a curation
    signal next to L4e's repetition and L16's Zipf fit.

    Determinism: token counts exact; Σm² exact 128-bit (HUGEINT <->
    decimal); K emitted in micro units (×10¹⁰ // N² = 10⁴·10⁶·
    (Σm²−N)/N²) by one truncating division; single-token sources read
    NULL on both engines.

    Scale shape: one (source, token) hash aggregate absorbs the token
    explosion (vocabulary-bounded, not corpus-bounded); one source
    rollup; readout k rows."""
    from bytesprocessor_spark.functions.text import tokenize

    docs = _t(spark, sf_dir, "documents")
    f = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").cast("long").alias("m"))
    )
    s = f.groupBy("source").agg(
        F.count("*").cast("long").alias("vocab"),
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("m").cast("decimal(19,0)") * F.col("m")).alias("sm2"),
    )
    return s.select(
        "source",
        "vocab",
        F.col("n").alias("n_tokens"),
        F.when(
            F.col("n") >= 2,
            F.expr(
                "CAST((sm2 - n) * 10000000000"
                " div (CAST(n AS DECIMAL(19,0)) * n) AS BIGINT)"
            ),
        ).alias("yule_k_micro"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Q12: second-digit Benford conformance with chi-square
# ---------------------------------------------------------------------------

def _benford2_expected() -> list[int]:
    """Second-digit Benford probabilities in exact nano units,
    computed once in Python (module constant shared by BOTH engine
    texts — the literal-pinning discipline)."""
    import math as _m

    out = []
    for d2 in range(10):
        p = sum(_m.log10(1 + 1.0 / (10 * d1 + d2)) for d1 in range(1, 10))
        out.append(round(p * 1_000_000_000))
    return out


_B2_NANO = _benford2_expected()


@query(
    "quality_benford_digit2",
    f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 2, 1) AS INT) AS digit
      FROM orders
      WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) >= 10
    ),
    o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed
          FROM d GROUP BY digit),
    e AS (
      SELECT UNNEST(range(0, 10)) AS digit,
             UNNEST([{", ".join(str(x) for x in _B2_NANO)}]) AS p_nano
    ),
    t AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM o),
    j AS (
      SELECT e.digit, COALESCE(o.observed, 0) AS observed, e.p_nano, t.n
      FROM e LEFT JOIN o USING (digit) CROSS JOIN t
    ),
    terms AS (
      SELECT digit, observed, p_nano, n,
             CAST(ROUND(
               (CAST(observed AS DOUBLE)
                - CAST(n AS DOUBLE) * CAST(p_nano AS DOUBLE) / 1e9)
               * (CAST(observed AS DOUBLE)
                  - CAST(n AS DOUBLE) * CAST(p_nano AS DOUBLE) / 1e9)
               / (CAST(n AS DOUBLE) * CAST(p_nano AS DOUBLE) / 1e9)
               * 1000000) AS BIGINT) AS term_micro
      FROM j
    )
    SELECT digit, observed, p_nano AS expected_p_nano, term_micro,
           CAST(SUM(term_micro) OVER () AS BIGINT) AS chi2_micro
    FROM terms ORDER BY digit
    """,
)
def quality_benford_digit2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 — second-digit Benford test: the observed second digit of
    order-total cents against P(d₂) = Σ_{{d₁=1..9}} log10(1 +
    1/(10d₁+d₂)), with the χ² statistic against the 9-df criticals.
    The forensic follow-up to Q4's first-digit screen — fabricators
    who learn to fake the first digit almost never fake the second
    (Nigrini's standard audit pair).

    Determinism: digits extract from the exact cents integer's
    decimal string; expected probabilities are PINNED nano literals
    computed once in Python and interpolated into BOTH engine texts;
    each digit's χ² term is one double tree micro-quantized BEFORE
    the 10-row fold, so χ² is an exact integer sum (the A112/EV41
    discipline).

    Scale shape: map-only digit extraction, one 10-row aggregate, the
    fold on the bounded digit table; readout 10 rows."""
    o = _t(spark, sf_dir, "orders")
    d = o.select(cents(F.col("o_totalprice")).alias("c")).where(
        F.col("c") >= 10
    ).select(
        F.substring(F.col("c").cast("string"), 2, 1).cast("int").alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count("*").cast("long").alias("observed"))
    # JVM-side literal grid (spark.range + array literal): a
    # createDataFrame here plans as a Python RDD scan whose worker
    # spin-up bills ~4 s/job on a cold pool — measured, not theoretical
    nano = F.array(*[F.lit(x).cast("long") for x in _B2_NANO])
    e = spark.range(10).select(
        F.col("id").cast("int").alias("digit"),
        F.element_at(nano, F.col("id").cast("int") + 1).alias("p_nano"),
    )
    # total n folds as a window over the BOUNDED digit table so the
    # orders scan runs once, not twice (one scan per aggregate branch
    # was the 5 s plan; this is the eval_ece bounded-rollup device)
    j0 = bounded_single_group(
        e.join(obs, "digit", "left").select(
            "digit",
            F.coalesce(F.col("observed"), F.lit(0)).cast("long").alias("observed"),
            "p_nano",
        ),
        col_name="__nopid",
    )
    w_n = Window.partitionBy("__nopid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = j0.select(
        "digit",
        "observed",
        "p_nano",
        F.sum("observed").over(w_n).cast("long").alias("n"),
    )
    exp = F.col("n").cast("double") * F.col("p_nano").cast("double") / 1e9
    term = (
        F.round(
            (F.col("observed").cast("double") - exp)
            * (F.col("observed").cast("double") - exp)
            / exp
            * 1000000
        )
        .cast("long")
        .alias("term_micro")
    )
    terms = bounded_single_group(j.select("digit", "observed", "p_nano", term))
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return terms.select(
        "digit",
        "observed",
        F.col("p_nano").alias("expected_p_nano"),
        "term_micro",
        F.sum("term_micro").over(w_all).cast("long").alias("chi2_micro"),
    ).orderBy("digit")


# ---------------------------------------------------------------------------
# L3j: dominant principal component by integer power iteration
# ---------------------------------------------------------------------------

_PCA_DIMS = 64
_PCA_SCALE = 1000  # same 1e3 vector quantization as the L3i Gram entry
_PCA_ROUNDS = 3
_PCA_TOPK = 8


def _pca_oracle() -> str:
    gram = f"""
    e AS (
      SELECT list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * {_PCA_SCALE})
                                 AS BIGINT)) AS v
      FROM embeddings
    ),
    a AS (SELECT v, UNNEST(generate_series(1, {_PCA_DIMS})) AS i FROM e),
    tt AS (SELECT i, v[i] AS vi, v,
                  UNNEST(generate_series(1, {_PCA_DIMS})) AS j
           FROM a),
    g AS (
      SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
             CAST(SUM(vi * v[j]) AS BIGINT) AS g
      FROM tt GROUP BY i, j
    ),
    x0 AS (SELECT UNNEST(generate_series(1, {_PCA_DIMS})) AS i,
                  CAST(1000000 AS BIGINT) AS x)"""
    steps = []
    prev = "x0"
    for r in range(1, _PCA_ROUNDS + 1):
        steps.append(
            f"""
    y{r} AS (
      SELECT g.i, SUM(CAST(g.g AS HUGEINT) * {prev}.x) AS y
      FROM g JOIN {prev} ON g.j = {prev}.i GROUP BY g.i
    ),
    m{r} AS (SELECT MAX(ABS(y)) AS m FROM y{r}),
    x{r} AS (
      SELECT i, CAST(y * 1000000 // GREATEST(m, 1) AS BIGINT) AS x
      FROM y{r}, m{r}
    )"""
        )
        prev = f"x{r}"
    body = ",".join(steps)
    last = prev
    return f"""
    WITH {gram},{body},
    ray AS (
      SELECT CAST(SUM(CAST(xx.x AS HUGEINT) * g.g * xj.x) AS DOUBLE)
             / CAST((SELECT SUM(CAST(x AS HUGEINT) * x) FROM {last})
                    AS DOUBLE) AS lam
      FROM g JOIN {last} xx ON g.i = xx.i JOIN {last} xj ON g.j = xj.i
    ),
    topk AS (
      SELECT i AS dim, x AS loading_micro,
             ROW_NUMBER() OVER (ORDER BY ABS(x) DESC, i) AS rk
      FROM {last}
    )
    SELECT rk, dim, loading_micro,
           CAST(ROUND((SELECT lam FROM ray) * 1000) AS BIGINT)
             AS rayleigh_milli
    FROM topk WHERE rk <= {_PCA_TOPK} ORDER BY rk
    """


@query("embedding_pca_power", _pca_oracle())
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3j — dominant principal component of the embedding corpus by
    POWER ITERATION on the L3i exact Gram matrix: x ← G·x /
    max|G·x| for 3 fixed rounds from the uniform start, read as the
    top-8 loadings plus the Rayleigh quotient xᵀGx/xᵀx.  The missing
    member of the embedding linear-algebra family — L3i ships the
    Gram matrix "for a driver-side eigensolve"; this DOES the solve
    distributively, the GR14 Katz discipline applied to PCA.  With a
    FIXED round budget the Rayleigh quotient is a LOWER BOUND on
    λ_max converging at (λ₂/λ₁)^2k — on a near-isotropic corpus
    (this fixture: λ₂/λ₁ ≈ 0.93-0.98) 3 rounds read ~80-90% of
    λ_max, which is itself the isotropy diagnostic (a spiked
    spectrum converges in 2-3 rounds); the CONTRACT is the bit-exact
    integer trajectory, pinned by a pure-Python recompute pytest.

    Determinism: the trajectory is PURE integer — 1e3-quantized
    vectors make G exact int64; each matvec accumulates exact 128-bit
    (HUGEINT <-> decimal); normalization is a truncating division by
    the max |component| (micro scale), so all three iterates are
    bit-identical across engines and the SQL replay unrolls one CTE
    per round; the Rayleigh quotient is ONE double ratio of two exact
    128-bit integers, milli-quantized; (|x| desc, dim) tiebreak pins
    the top-k.

    Scale shape: the corpus collapses to the d×d Gram aggregate in
    one Arrow-GEMM pass (only d(d+1)/2 partial cells shuffle per
    batch); the eigensolve state is DIMENSION-bounded (d² = 4096
    ints), so the iterations run driver-side on the localized Gram —
    constant work at any corpus size; readout 8 rows."""
    import math

    import pandas as pd

    from bytesprocessor_spark.functions.vectors import np_round_half_away

    emb = _t(spark, sf_dir, "embeddings")

    # r11: the corpus pass is an Arrow per-batch GEMM — the nested
    # higher-order transform that exploded d(d+1)/2 struct cells per
    # row was interpreted (no codegen) and dominated the entry.  After
    # round(x*1e3) every value is an exact integer in a float64, every
    # product < 2^40 and every partial sum < 2^53, so M.T @ M under
    # ANY blocking (BLAS included) yields the identical integers the
    # expression walk produced (functions/vectors.py Arrow-kernel
    # note); rounding is np_round_half_away == F.round == DuckDB.
    def gram_partial(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np_round_half_away(
                np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]],
                    dtype=np.float64,
                )
                * float(_PCA_SCALE)
            )
            G = M.T @ M
            iu, ju = np.triu_indices(_PCA_DIMS)
            yield pd.DataFrame({"i": iu + 1, "j": ju + 1, "g": G[iu, ju]})

    tri = (
        emb.select("embedding")
        .mapInPandas(gram_partial, "i long, j long, g double")
        .groupBy("i", "j")
        .agg(F.sum("g").cast("long").alias("g"))
    )
    # d²-bounded localize (2080 triangle cells): the eigensolve data
    # is DIMENSION-bounded, so the 3 matvec rounds + Rayleigh + top-k
    # run driver-side in exact Python int arithmetic — the identical
    # integer trajectory the unrolled decimal(38) joins walked
    # (products, sums, trunc-toward-zero division: Spark div ==
    # DuckDB // on decimals), pinned bit-exact by the pure-Python
    # recompute pytest.  (r11: the lazy 3-round join chain billed a
    # localCheckpoint + several small jobs per run for 64 rows of
    # state.)
    cells = tri.collect()
    gram = [[0] * _PCA_DIMS for _ in range(_PCA_DIMS)]
    for r in cells:
        gi, gj, gv = int(r["i"]) - 1, int(r["j"]) - 1, int(r["g"])
        gram[gi][gj] = gv
        gram[gj][gi] = gv

    def tdiv(a: int, b: int) -> int:
        # truncation toward zero — Spark's div / DuckDB's // on decimals
        return a // b if a >= 0 else -((-a) // b)

    x = [1_000_000] * _PCA_DIMS
    for _ in range(_PCA_ROUNDS):
        y = [
            sum(gram[i][j] * x[j] for j in range(_PCA_DIMS))
            for i in range(_PCA_DIMS)
        ]
        mx = max(max(abs(t) for t in y), 1)
        x = [tdiv(t * 1_000_000, mx) for t in y]
    num = sum(
        x[i] * gram[i][j] * x[j]
        for i in range(_PCA_DIMS)
        for j in range(_PCA_DIMS)
    )
    den = sum(t * t for t in x)
    ratio = float(num) / float(den) * 1000
    ray_milli = (
        int(math.floor(ratio + 0.5)) if ratio >= 0 else int(math.ceil(ratio - 0.5))
    )
    order = sorted(range(_PCA_DIMS), key=lambda i: (-abs(x[i]), i))[:_PCA_TOPK]
    rows = [(rk + 1, dim + 1, x[dim], ray_milli) for rk, dim in enumerate(order)]
    # JVM-side literal readout (the r10 literal-grid device)
    return (
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(rk).cast("long").alias("rk"),
                            F.lit(dim).cast("long").alias("dim"),
                            F.lit(lv).cast("long").alias("loading_micro"),
                            F.lit(rm).cast("long").alias("rayleigh_milli"),
                        )
                        for rk, dim, lv, rm in rows
                    ]
                )
            ).alias("s")
        )
        .select("s.rk", "s.dim", "s.loading_micro", "s.rayleigh_milli")
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# A142: exact energy distance between the parity-split distributions
# ---------------------------------------------------------------------------

@query(
    "orders_energy_distance",
    """
    WITH v AS (
      SELECT o_orderpriority AS prio,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
             DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 2
               AS par
      FROM orders
    ),
    s AS (
      SELECT prio, c,
             CAST(SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM v GROUP BY 1, 2
    ),
    n AS (
      SELECT prio, CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1
      FROM s GROUP BY 1
    ),
    cum AS (
      SELECT prio, c,
             CAST(SUM(c0) OVER w AS BIGINT) AS f0,
             CAST(SUM(c1) OVER w AS BIGINT) AS f1,
             LEAD(c) OVER w AS c_next
      FROM s WINDOW w AS (PARTITION BY prio ORDER BY c)
    ),
    acc AS (
      SELECT cum.prio,
             SUM(CAST(cum.c_next - cum.c AS HUGEINT)
                 * (cum.f0 * (n.n1 - cum.f1) + cum.f1 * (n.n0 - cum.f0)))
               AS axy,
             SUM(CAST(cum.c_next - cum.c AS HUGEINT)
                 * (2 * cum.f0 * (n.n0 - cum.f0))) AS bxx,
             SUM(CAST(cum.c_next - cum.c AS HUGEINT)
                 * (2 * cum.f1 * (n.n1 - cum.f1))) AS cyy
      FROM cum JOIN n USING (prio)
      WHERE cum.c_next IS NOT NULL
      GROUP BY 1
    )
    SELECT n.prio AS o_orderpriority, n.n0 AS n_even, n.n1 AS n_odd,
           CASE WHEN n.n0 > 0 AND n.n1 > 0
                THEN CAST(COALESCE(acc.axy, 0) * 1000
                          // (CAST(n.n0 AS HUGEINT) * n.n1) AS BIGINT)
           END AS e_xy_milli,
           CASE WHEN n.n0 > 1
                THEN CAST(COALESCE(acc.bxx, 0) * 1000
                          // (CAST(n.n0 AS HUGEINT) * n.n0) AS BIGINT)
           END AS e_xx_milli,
           CASE WHEN n.n1 > 1
                THEN CAST(COALESCE(acc.cyy, 0) * 1000
                          // (CAST(n.n1 AS HUGEINT) * n.n1) AS BIGINT)
           END AS e_yy_milli,
           CASE WHEN n.n0 > 0 AND n.n1 > 0
                THEN CAST(ROUND((2.0 * CAST(COALESCE(acc.axy, 0) AS DOUBLE)
                          / CAST(n.n0 AS DOUBLE) / CAST(n.n1 AS DOUBLE)
                        - CAST(COALESCE(acc.bxx, 0) AS DOUBLE)
                          / CAST(n.n0 AS DOUBLE) / CAST(n.n0 AS DOUBLE)
                        - CAST(COALESCE(acc.cyy, 0) AS DOUBLE)
                          / CAST(n.n1 AS DOUBLE) / CAST(n.n1 AS DOUBLE))
                        * 1000) AS BIGINT)
           END AS energy_milli
    FROM n LEFT JOIN acc ON n.prio = acc.prio
    ORDER BY o_orderpriority
    """,
)
def orders_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A142 — exact energy distance D² = 2E|X−Y| − E|X−X'| − E|Y−Y'|
    between the even/odd-day order-value distributions per priority,
    via the CDF identities E|X−Y| = ∫[F₀(1−F₁) + F₁(1−F₀)]dx on the
    pooled support.  The rotation-free two-sample test of the Székely
    family — zero IFF the distributions are identical, sensitive to
    ALL moments where A131's W1 reads location-scale mass transport;
    the pair is the standard drift dashboard duo.

    Determinism: the A131 machinery verbatim (exact cents support,
    exact cumulative counts, gap-weighted 128-bit integer sums for
    all three expectations); the component expectations read out as
    truncating milli ratios and D² is ONE double tree over the three
    exact integers, milli-quantized.

    Scale shape: identical to A131 — support-bounded aggregate,
    priority-partitioned windows, k-row readout."""
    v = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        cents(F.col("o_totalprice")).alias("c"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            )
            % 2
        ).alias("par"),
    )
    s = v.groupBy("prio", "c").agg(
        F.sum(F.when(F.col("par") == 0, 1).otherwise(0)).cast("long").alias("c0"),
        F.sum(F.when(F.col("par") == 1, 1).otherwise(0)).cast("long").alias("c1"),
    )
    n = s.groupBy("prio").agg(
        F.sum("c0").cast("long").alias("n0"), F.sum("c1").cast("long").alias("n1")
    )
    w = Window.partitionBy("prio").orderBy("c")
    cum = s.select(
        "prio",
        "c",
        F.sum("c0").over(w).cast("long").alias("f0"),
        F.sum("c1").over(w).cast("long").alias("f1"),
        F.lead("c").over(w).alias("c_next"),
    )
    gap = (F.col("c_next") - F.col("c")).cast("decimal(19,0)")
    acc = (
        cum.join(n, "prio")
        .where(F.col("c_next").isNotNull())
        .groupBy("prio")
        .agg(
            F.sum(
                gap
                * (
                    F.col("f0").cast("decimal(19,0)") * (F.col("n1") - F.col("f1"))
                    + F.col("f1").cast("decimal(19,0)")
                    * (F.col("n0") - F.col("f0"))
                ).cast("decimal(19,0)")
            ).alias("axy"),
            F.sum(
                gap
                * (
                    2 * F.col("f0").cast("decimal(19,0)") * (F.col("n0") - F.col("f0"))
                ).cast("decimal(19,0)")
            ).alias("bxx"),
            F.sum(
                gap
                * (
                    2 * F.col("f1").cast("decimal(19,0)") * (F.col("n1") - F.col("f1"))
                ).cast("decimal(19,0)")
            ).alias("cyy"),
        )
    )
    z = F.lit(0).cast("decimal(38,0)")
    j = n.join(acc, "prio", "left").select(
        "prio",
        "n0",
        "n1",
        F.coalesce(F.col("axy"), z).alias("axy"),
        F.coalesce(F.col("bxx"), z).alias("bxx"),
        F.coalesce(F.col("cyy"), z).alias("cyy"),
    )
    n0D, n1D = F.col("n0").cast("double"), F.col("n1").cast("double")
    energy = (
        2.0 * F.col("axy").cast("double") / n0D / n1D
        - F.col("bxx").cast("double") / n0D / n0D
        - F.col("cyy").cast("double") / n1D / n1D
    )
    return j.select(
        F.col("prio").alias("o_orderpriority"),
        F.col("n0").alias("n_even"),
        F.col("n1").alias("n_odd"),
        F.when(
            (F.col("n0") > 0) & (F.col("n1") > 0),
            F.expr(
                "CAST(axy * 1000 div (CAST(n0 AS DECIMAL(19,0)) * n1) AS BIGINT)"
            ),
        ).alias("e_xy_milli"),
        F.when(
            F.col("n0") > 1,
            F.expr(
                "CAST(bxx * 1000 div (CAST(n0 AS DECIMAL(19,0)) * n0) AS BIGINT)"
            ),
        ).alias("e_xx_milli"),
        F.when(
            F.col("n1") > 1,
            F.expr(
                "CAST(cyy * 1000 div (CAST(n1 AS DECIMAL(19,0)) * n1) AS BIGINT)"
            ),
        ).alias("e_yy_milli"),
        F.when(
            (F.col("n0") > 0) & (F.col("n1") > 0),
            F.round(energy * 1000).cast("long"),
        ).alias("energy_milli"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# A143: Haar wavelet scale energies of the daily series (exact integer)
# ---------------------------------------------------------------------------

_HAAR_SLOTS = 32  # dyadic pad of the <=31-day fixture calendar


@query(
    "events_haar_energy",
    f"""
    WITH d AS (
      SELECT event_type,
             DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    lo AS (SELECT event_type, MIN(day) AS d0 FROM d GROUP BY 1),
    t AS (
      SELECT d.event_type, d.day - lo.d0 AS idx, d.x
      FROM d JOIN lo USING (event_type)
      WHERE d.day - lo.d0 < {_HAAR_SLOTS}
    ),
    lv AS (SELECT UNNEST([1, 2, 3, 4, 5]) AS level),
    det AS (
      SELECT t.event_type, lv.level,
             t.idx // (1 << lv.level) AS block,
             CAST(SUM(CASE WHEN (t.idx // (1 << (lv.level - 1))) % 2 = 0
                           THEN t.x ELSE -t.x END) AS BIGINT) AS dcoef
      FROM t CROSS JOIN lv
      GROUP BY 1, 2, 3
    )
    SELECT event_type, CAST(level AS BIGINT) AS level, n_blocks, energy
    FROM (
      SELECT event_type, level,
             CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(CAST(dcoef AS HUGEINT) * dcoef)
                  // (1 << level) AS BIGINT) AS energy
      FROM det GROUP BY event_type, level
    ) x ORDER BY event_type, level
    """,
)
def events_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A143 — Haar wavelet scale energies of each type's daily-count
    series (32-slot dyadic frame; absent days contribute 0 to every
    detail sum, and blocks with no observed day — detail 0 — emit no
    row on either engine): at
    level L the detail coefficient of each 2^L-day block is (sum of
    first half) − (sum of second half), and energy_L = Σd²/2^L — the
    multi-resolution variance decomposition that localizes WHERE the
    variation lives (level 1 = day-to-day jitter, level 3 ≈ weekly
    structure, level 5 = fortnight drift).  The scale-domain read
    A19's fixed seasonal window and A34's fixed-lag ACF cannot give —
    and unlike a DFT it is EXACT integer arithmetic end to end.

    Determinism: counts are integers; each detail coefficient is one
    signed integer sum (block/half indices from truncating division
    of non-negative day offsets — hazard-class (a) audited); energies
    are exact 128-bit squares with a truncating 2^L normalization.

    Scale shape: one (type, day) hash aggregate absorbs the scan; the
    block aggregate runs over the calendar-bounded (type, level,
    block) grid (≤ 5·32 cells/type); readout 5k rows."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    ).agg(F.count("*").cast("long").alias("x"))
    lo = d.groupBy("event_type").agg(F.min("day").alias("d0"))
    t = (
        d.join(F.broadcast(lo), "event_type")
        .select("event_type", (F.col("day") - F.col("d0")).alias("idx"), "x")
        .where(F.col("idx") < _HAAR_SLOTS)
    )
    lv = spark.range(1, 6).select(F.col("id").cast("int").alias("level"))
    det = (
        t.crossJoin(F.broadcast(lv))
        .groupBy(
            "event_type",
            "level",
            F.expr("idx div (1 << level)").alias("block"),
        )
        .agg(
            F.sum(
                F.when(
                    F.expr("(idx div (1 << (level - 1))) % 2 = 0"), F.col("x")
                ).otherwise(-F.col("x"))
            )
            .cast("long")
            .alias("dcoef")
        )
    )
    return (
        det.groupBy("event_type", "level")
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.expr(
                "CAST(SUM(CAST(dcoef AS DECIMAL(19,0)) * dcoef)"
                " div (1 << level) AS BIGINT)"
            ).alias("energy"),
        )
        .select(
            "event_type",
            F.col("level").cast("long").alias("level"),
            "n_blocks",
            "energy",
        )
        .orderBy("event_type", "level")
    )


# ---------------------------------------------------------------------------
# A144: circular statistics — Rayleigh test on time-of-day
# ---------------------------------------------------------------------------

@query(
    "events_circular_rayleigh",
    """
    WITH u AS (
      SELECT event_type,
             (epoch_us(ts) - epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)))
               AS us
      FROM events
    ),
    q AS (
      SELECT event_type,
             CAST(ROUND(COS(2 * PI() * CAST(us AS DOUBLE) / 86400000000.0)
                        * 1000000) AS BIGINT) AS c_micro,
             CAST(ROUND(SIN(2 * PI() * CAST(us AS DOUBLE) / 86400000000.0)
                        * 1000000) AS BIGINT) AS s_micro
      FROM u
    ),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(c_micro AS HUGEINT)) AS sc,
             SUM(CAST(s_micro AS HUGEINT)) AS ss
      FROM q GROUP BY 1
    )
    SELECT event_type, n,
      CAST(ROUND(SQRT(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                      + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
                 / CAST(n AS DOUBLE)) AS BIGINT) AS r_micro,
      CAST(ROUND((CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                  + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
                 / CAST(n AS DOUBLE) / 1000000.0 / 1000000.0 * 1000)
           AS BIGINT) AS rayleigh_z_milli,
      CAST(ROUND(ATAN2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE)) * 1000)
           AS BIGINT) AS mean_angle_milli_rad
    FROM m ORDER BY event_type
    """,
)
def events_circular_rayleigh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A144 — circular statistics of event TIME-OF-DAY per type:
    resultant length R = |Σe^(iθ)|/n with θ = 2π·(µs of day)/86400e6,
    the Rayleigh uniformity statistic z = nR², and the mean angle
    atan2(Σsin, Σcos) — the CIRCULAR read A42's hourly histogram
    linearizes away (23:00 and 01:00 are 2 h apart on the circle, 22
    bins apart on the histogram); R ≈ 0 = uniform load, R → 1 = one
    sharp daily peak at the mean angle.

    Determinism: per-row cos/sin are micro-quantized BEFORE the sums
    (the A137 per-row-transcendental discipline — both engines
    evaluate the identical double tree on the identical exact input,
    and the 1e-6 quantization absorbs any last-ulp libm divergence
    except exactly at a .5 boundary, which the triple-scale gate
    polices); the component sums are exact 128-bit; R/z/angle are
    fixed double trees over the two exact integers, quantized once.

    Scale shape: map-only trig + one (type) hash aggregate absorbs
    the scan; readout k rows."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("date").cast("timestamp")
    )
    theta = 2 * math.pi * us.cast("double") / 86400000000.0
    q = ev.select(
        "event_type",
        F.round(F.cos(theta) * 1000000).cast("long").alias("c_micro"),
        F.round(F.sin(theta) * 1000000).cast("long").alias("s_micro"),
    )
    m = q.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("c_micro").cast("decimal(38,0)")).alias("sc"),
        F.sum(F.col("s_micro").cast("decimal(38,0)")).alias("ss"),
    )
    scD, ssD = F.col("sc").cast("double"), F.col("ss").cast("double")
    nD = F.col("n").cast("double")
    r2 = scD * scD + ssD * ssD
    return m.select(
        "event_type",
        "n",
        F.round(F.sqrt(r2) / nD).cast("long").alias("r_micro"),
        F.round(r2 / nD / 1000000.0 / 1000000.0 * 1000)
        .cast("long")
        .alias("rayleigh_z_milli"),
        F.round(F.atan2(ssD, scD) * 1000).cast("long").alias(
            "mean_angle_milli_rad"
        ),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# S19: ORC round-trip source (write at construction, read + aggregate)
# ---------------------------------------------------------------------------

@query(
    "orc_roundtrip_read",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def orc_roundtrip_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S19 — ORC round-trip: the events table is written to ORC (zlib,
    Spark's built-in columnar sibling of parquet) at construction and
    the readout aggregates FROM THE ORC COPY; the oracle recomputes
    the identical aggregate from the parquet source, so equality
    proves the ORC writer/reader preserve every row, timestamp-free
    value, and key exactly.  Closes the columnar-format matrix next
    to S5 (parquet), S6/S6b (tolerant CSV/JSONL) and S12
    (WebDataset tars).

    Determinism: exact cents / counts only (no timestamp columns are
    read back, so ORC's timestamp-zone handling cannot enter the
    hash); the ORC copy lives under /tmp keyed by sf_dir and is
    rebuilt per call (cheap at fixture scale, temp-cleaned).

    Scale shape: one columnar write + one columnar scan + a k-row
    hash aggregate; at the design point the write is the one-time
    format migration and every read after it prunes columns exactly
    like parquet."""
    import shutil
    import tempfile

    ev = _t(spark, sf_dir, "events").select("event_type", "value", "user_id")
    out = tempfile.mkdtemp(prefix="bp_orc_")
    try:
        ev.write.mode("overwrite").orc(f"{out}/events_orc")
        back = spark.read.orc(f"{out}/events_orc")
        res = (
            back.groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(cents(F.col("value"))).cast("long").alias("sum_c"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
            )
            .orderBy("event_type")
        )
        # bounded localize (k rows) so the temp dir can drop
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# L32: compression-ratio quality signal (Arrow pandas UDF; pytest twin)
# ---------------------------------------------------------------------------

def _zlib_ratio_micro():
    """Arrow-batched zlib-compressibility: ratio = compressed/raw in
    exact micro units (level 6 pinned).  Deterministic for a given
    zlib version — pinned by the pure-Python pytest twin, not a SQL
    oracle (DuckDB has no zlib surface)."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def ratio(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            raw = (t or "").encode("utf-8")
            if not raw:
                out.append(1_000_000)
                continue
            comp = zlib.compress(raw, 6)
            out.append(len(comp) * 1_000_000 // len(raw))
        return pd.Series(out)

    return ratio


def text_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L32 — zlib compression-ratio quality signal per source: the
    Gopher-style boilerplate detector (highly compressible text =
    repetitive templates; incompressible = dense prose or noise),
    read as per-source doc counts in three compressibility bands plus
    the exact mean ratio.  The Python seam is the SANCTIONED one — an
    Arrow-batched pandas UDF (one vectorized crossing per batch,
    never per row); no SQL oracle exists for zlib, so the driver
    records the rows-only check and the pure-Python pytest twin pins
    the byte-exact ratios (same zlib, bit-identical).

    Scale shape: map-only UDF over the document scan, one source-
    keyed hash aggregate; readout k rows."""
    ratio = _zlib_ratio_micro()
    docs = _t(spark, sf_dir, "documents").select(
        "source", ratio(F.col("text")).alias("r_micro")
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("r_micro") < 300000, 1).otherwise(0))
            .cast("long")
            .alias("n_template_like"),
            F.sum(
                F.when(
                    (F.col("r_micro") >= 300000) & (F.col("r_micro") < 700000), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_normal"),
            F.sum(F.when(F.col("r_micro") >= 700000, 1).otherwise(0))
            .cast("long")
            .alias("n_incompressible"),
            F.expr("CAST(SUM(r_micro) div COUNT(*) AS BIGINT)").alias(
                "mean_ratio_micro"
            ),
        )
        .orderBy("source")
    )


from bytesprocessor_spark.queries_llm import QUERIES_NO_ORACLE  # noqa: E402

QUERIES_NO_ORACLE["text_compression_quality"] = text_compression_quality


# ---------------------------------------------------------------------------
# L33: reciprocal nearest-neighbor pairs (mutual top-1 cosine)
# ---------------------------------------------------------------------------

@query(
    "similarity_reciprocal_nn",
    """
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> round(CAST(x AS DOUBLE) * 1000000)) AS v
      FROM embeddings
    ),
    s AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.v, b.v)
               / (SQRT(list_dot_product(a.v, a.v))
                  * SQRT(list_dot_product(b.v, b.v))) AS sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    ),
    sym AS (
      SELECT id_a AS id, id_b AS nbr, sim FROM s
      UNION ALL SELECT id_b AS id, id_a AS nbr, sim FROM s
    ),
    nn AS (
      SELECT id, nbr, sim
      FROM (SELECT id, nbr, sim,
                   ROW_NUMBER() OVER (PARTITION BY id
                                      ORDER BY sim DESC, nbr) AS rk
            FROM sym) r
      WHERE rk = 1
    )
    SELECT a.id AS id_a, a.nbr AS id_b, ROUND(a.sim, 6) AS sim
    FROM nn a JOIN nn b ON a.nbr = b.id AND b.nbr = a.id AND a.id < b.id
    ORDER BY id_a
    """,
)
def similarity_reciprocal_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L33 — reciprocal nearest-neighbor pairs: (a, b) such that b is
    a's top-1 cosine neighbor AND a is b's — the mutual-NN pairing
    rule behind RNN-descent graph builds, bitext mining, and the
    strictest near-dup pairing (one-sided NN over-pairs hubs; mutual
    NN is hub-resistant by construction).  L3's top-k ranks per
    query; this emits the corpus's SELF-pairing.

    Determinism: the L2 quantized exact-cosine device (1e-6 fixed-
    point components, every product exact) so argmax ties cannot
    ulp-flip; top-1 under the (sim desc, neighbor id) total order;
    mutuality is an exact self-join; sim rounded to 6 on both
    engines.

    Scale shape: the block-partitioned all-pairs GEMM (L2's
    declared-exact small-side path — the LSH/IVF candidate stage is
    the 100 TB dispatch); the argmax window partitions BY VECTOR ID
    (entity-keyed, never global); mutual join on integer ids;
    readout ≤ n/2 rows."""
    from bytesprocessor_spark.operators.dedup import embedding_cosine_pairs

    emb = _t(spark, sf_dir, "embeddings")
    # (r11 measured and rejected: persisting the scored pair table to
    # share the GEMM between the two union branches — the n~2000 pair
    # scan recomputes in ~1 s while caching its 2M-row output costs
    # more than the recompute; see OPTIMIZATION_r11.md)
    pairs = embedding_cosine_pairs(emb, threshold=-2.0, quantize=True)
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nbr"), "sim"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("id"), F.col("id_a").alias("nbr"), "sim"
        )
    )
    # r11: argmax via a max-of-struct aggregate instead of the
    # row_number window — (sim, -nbr) compares lexicographically, so
    # the maximum is exactly the (sim DESC, nbr ASC) rank-1 row, and
    # the hash aggregate partial-combines map-side where the window
    # had to shuffle AND sort every (id, nbr, sim) row (guide §2.3)
    # ... and persist the n-row argmax table: the mutual self-join
    # consumes nn TWICE (nn and its id2/nbr2 re-projection), and
    # without the persist the whole all-pairs GEMM + aggregate
    # subtree ran once per consumer (the before plan prints the scan
    # subtree 4x: 2 union branches x 2 join sides).  nn is one row
    # per vector, so the cache is tiny where persisting the 2M-row
    # pair table measured slower than recomputing it.
    from bytesprocessor_spark.operators.caching import persist_intermediate

    nn = persist_intermediate(
        sym.groupBy("id")
        .agg(F.max(F.struct(F.col("sim"), (-F.col("nbr")).alias("mnbr"))).alias("m"))
        .select("id", (-F.col("m.mnbr")).alias("nbr"), F.col("m.sim").alias("sim"))
    )
    other = nn.select(
        F.col("id").alias("id2"), F.col("nbr").alias("nbr2")
    )
    return (
        nn.join(
            other,
            (F.col("nbr") == F.col("id2"))
            & (F.col("nbr2") == F.col("id"))
            & (F.col("id") < F.col("id2")),
        )
        .select(
            F.col("id").alias("id_a"),
            F.col("nbr").alias("id_b"),
            F.round("sim", 6).alias("sim"),
        )
        .orderBy("id_a")
    )


# ---------------------------------------------------------------------------
# GR16: k-truss peeling on the strong-edge co-supplier graph
# ---------------------------------------------------------------------------

_TRUSS_K = 4  # edges must sit in >= k-2 = 2 triangles
_TRUSS_ROUNDS = 2


def _truss_oracle() -> str:
    base = """
    WITH os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
    pw AS (
      SELECT a.s AS a, b.s AS b, CAST(COUNT(*) AS BIGINT) AS w
      FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
      GROUP BY 1, 2
    ),
    rkd AS (
      SELECT a, b,
             ROW_NUMBER() OVER (ORDER BY w DESC, a, b) AS rk,
             COUNT(*) OVER () AS n
      FROM pw
    ),
    e0 AS (SELECT a, b FROM rkd WHERE rk <= GREATEST(n // 10, 10))"""
    prev = "e0"
    steps = []
    for r in range(1, _TRUSS_ROUNDS + 1):
        steps.append(f"""
    d{r} AS (
      SELECT u, v FROM (SELECT a AS u, b AS v FROM {prev}
                        UNION ALL SELECT b AS u, a AS v FROM {prev}) x
    ),
    sup{r} AS (
      SELECT e.a, e.b, CAST(COUNT(w1.v) AS BIGINT) AS support
      FROM {prev} e
      LEFT JOIN d{r} w1 ON w1.u = e.a
      LEFT JOIN d{r} w2 ON w2.u = e.b AND w2.v = w1.v
      WHERE w2.v IS NOT NULL OR w1.v IS NULL
      GROUP BY e.a, e.b
    ),
    e{r} AS (SELECT a, b FROM sup{r} WHERE support >= {_TRUSS_K - 2})""")
        prev = f"e{r}"
    arms = []
    for r in range(1, _TRUSS_ROUNDS + 1):
        arms.append(f"""
    SELECT CAST({r} AS BIGINT) AS round,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
             (SELECT a AS u FROM e{r} UNION SELECT b AS u FROM e{r}) nu)
             AS n_nodes
    FROM e{r}""")
    body = ",".join(steps)
    sel = " UNION ALL ".join(arms)
    return (
        base
        + ","
        + body
        + "\n    SELECT round, n_edges, n_nodes FROM ("
        + sel
        + ") z ORDER BY round"
    )


@query("graph_ktruss", _truss_oracle())
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR16 — k-truss peeling (k=4) on the GR12 strong-edge
    co-supplier graph: each round recomputes every surviving edge's
    triangle support (common-neighbor count) and drops edges in
    fewer than k−2 triangles; 2 fixed rounds, read as edge/node
    counts per round.  The EDGE-cohesion community core — GR7's
    k-core peels by degree (a hub with pendant edges survives);
    k-truss requires the edges themselves to be triangle-reinforced,
    the standard stronger cohesion filter.

    Determinism: pure integer set operations over the deterministic
    strong-edge cut (the GR12 rank discipline); fixed round count so
    the SQL replay unrolls one support-join per round.

    Scale shape: each support round is the GR3 oriented common-
    neighbor equi-join on the PRUNED edge set (Σdeg² bounded by the
    cut); readout 2 rows."""
    # r11: the 10% rank cut is the memoized supplier_strong_edges
    # table (shared verbatim with jaccard_linkpred and rich_club)
    from bytesprocessor_spark.operators.graph import supplier_strong_edges

    edges = supplier_strong_edges(spark, sf_dir)
    out_rows = []
    for rnd in range(1, _TRUSS_ROUNDS + 1):
        d = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        w1 = d.select(F.col("u").alias("ua"), F.col("v").alias("cn"))
        w2 = d.select(F.col("u").alias("ub"), F.col("v").alias("cn2"))
        sup = (
            edges.join(w1, F.col("a") == F.col("ua"), "left")
            .join(
                w2,
                (F.col("b") == F.col("ub")) & (F.col("cn2") == F.col("cn")),
                "left",
            )
            .groupBy("a", "b")
            .agg(F.count(F.col("cn2")).cast("long").alias("support"))
        )
        edges = sup.where(F.col("support") >= _TRUSS_K - 2).select("a", "b")
        edges = edges.localCheckpoint()
        # r11: edge count and distinct-node count in ONE job over the
        # checkpointed round result (was two actions, two shuffles)
        stats = (
            edges.select(F.explode(F.array("a", "b")).alias("u"))
            .agg(
                F.expr("count(*) div 2").cast("long").alias("ec"),
                F.countDistinct("u").cast("long").alias("nc"),
            )
            .first()
        )
        out_rows.append((rnd, stats["ec"], stats["nc"]))
    return spark.createDataFrame(
        out_rows, "round long, n_edges long, n_nodes long"
    )


# ---------------------------------------------------------------------------
# A145: TOST equivalence test (weekend vs weekday value, per type)
# ---------------------------------------------------------------------------

_TOST_MARGIN_CENTS = 500  # +/- $5 equivalence margin on the mean
_TOST_Z95 = 1.6448536269514722  # one-sided 95% normal critical, pinned


@query(
    "events_tost_equivalence",
    f"""
    WITH v AS (
      SELECT event_type,
             CASE WHEN ISODOW(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS wk,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ),
    m AS (
      SELECT event_type, wk,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(c AS HUGEINT)) AS s1,
             SUM(CAST(c AS HUGEINT) * c) AS s2
      FROM v GROUP BY 1, 2
    ),
    w AS (
      SELECT a.event_type, a.n AS n1, b.n AS n0,
             CAST(a.s1 AS DOUBLE) AS s11, CAST(a.s2 AS DOUBLE) AS s21,
             CAST(b.s1 AS DOUBLE) AS s10, CAST(b.s2 AS DOUBLE) AS s20
      FROM m a JOIN m b ON a.event_type = b.event_type
      WHERE a.wk = 1 AND b.wk = 0 AND a.n >= 2 AND b.n >= 2
    ),
    t AS (
      SELECT event_type, n1, n0,
             (s11 / CAST(n1 AS DOUBLE) - s10 / CAST(n0 AS DOUBLE)) AS diff,
             SQRT((s21 - s11 * s11 / CAST(n1 AS DOUBLE))
                  / CAST(n1 - 1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                + (s20 - s10 * s10 / CAST(n0 AS DOUBLE))
                  / CAST(n0 - 1 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS se
      FROM w
    )
    SELECT event_type, n1 AS n_weekend, n0 AS n_weekday,
           CAST(ROUND(diff) AS BIGINT) AS mean_diff_c,
           CAST(ROUND((diff + {_TOST_MARGIN_CENTS}) / se * 1000) AS BIGINT)
             AS t_lower_milli,
           CAST(ROUND((diff - {_TOST_MARGIN_CENTS}) / se * 1000) AS BIGINT)
             AS t_upper_milli,
           ((diff + {_TOST_MARGIN_CENTS}) / se > {_TOST_Z95}
            AND (diff - {_TOST_MARGIN_CENTS}) / se < -{_TOST_Z95})
             AS equivalent
    FROM t ORDER BY event_type
    """,
)
def events_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A145 — TOST equivalence test (two one-sided tests, Schuirmann):
    is the weekend/weekday mean-value difference provably INSIDE the
    ±$5 margin?  A43's Welch t can only fail to find a difference —
    absence of evidence; TOST provides evidence of absence (both
    one-sided tests must reject: diff > −δ AND diff < +δ), the
    launch-gate read for "this change is value-neutral".

    Determinism: exact 128-bit cent moments per (type, weekend) cell
    (the A140 device); diff/SE/t are fixed double trees with the
    pinned z95 literal (17 digits, the A111 discipline), milli-
    quantized; the verdict is a double compare WELL away from the
    quantization boundary in practice and pinned by the triple-scale
    gate.

    Scale shape: one (type, flag) hash aggregate absorbs the scan;
    k-keyed self-join; readout k rows."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.when(F.expr("weekday(ts)") + 1 >= 6, 1).otherwise(0).alias("wk"),
        cents(F.col("value")).alias("c"),
    )
    m = v.groupBy("event_type", "wk").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c")).alias("s2"),
    )
    a = m.where((F.col("wk") == 1) & (F.col("n") >= 2)).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s1").cast("double").alias("s11"),
        F.col("s2").cast("double").alias("s21"),
    )
    b = m.where((F.col("wk") == 0) & (F.col("n") >= 2)).select(
        F.col("event_type").alias("et0"),
        F.col("n").alias("n0"),
        F.col("s1").cast("double").alias("s10"),
        F.col("s2").cast("double").alias("s20"),
    )
    w = a.join(b, F.col("event_type") == F.col("et0"))
    n1D, n0D = F.col("n1").cast("double"), F.col("n0").cast("double")
    diff = F.col("s11") / n1D - F.col("s10") / n0D
    se = F.sqrt(
        (F.col("s21") - F.col("s11") * F.col("s11") / n1D) / (n1D - 1) / n1D
        + (F.col("s20") - F.col("s10") * F.col("s10") / n0D) / (n0D - 1) / n0D
    )
    t_lo = (diff + _TOST_MARGIN_CENTS) / se
    t_hi = (diff - _TOST_MARGIN_CENTS) / se
    return w.select(
        "event_type",
        F.col("n1").alias("n_weekend"),
        F.col("n0").alias("n_weekday"),
        F.round(diff).cast("long").alias("mean_diff_c"),
        F.round(t_lo * 1000).cast("long").alias("t_lower_milli"),
        F.round(t_hi * 1000).cast("long").alias("t_upper_milli"),
        ((t_lo > _TOST_Z95) & (t_hi < -_TOST_Z95)).alias("equivalent"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A146: chain-ladder development factors on the order->ship triangle
# ---------------------------------------------------------------------------

@query(
    "orders_chain_ladder",
    """
    WITH base AS (
      SELECT DATE_TRUNC('month', o.o_orderdate) AS cohort,
             CAST(DATE_DIFF('month', DATE_TRUNC('month', o.o_orderdate),
                            DATE_TRUNC('month', l.l_shipdate)) AS BIGINT)
               AS dev,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS c
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1995-12-01 00:00:00'
    ),
    inc AS (
      SELECT cohort, dev, CAST(SUM(c) AS BIGINT) AS v
      FROM base WHERE dev BETWEEN 0 AND 4 GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort, dev,
             CAST(SUM(v) OVER (PARTITION BY cohort ORDER BY dev) AS BIGINT)
               AS cv
      FROM inc
    ),
    f AS (
      SELECT a.dev AS from_dev,
             CAST(SUM(b.cv) AS BIGINT) AS num,
             CAST(SUM(a.cv) AS BIGINT) AS den,
             CAST(COUNT(*) AS BIGINT) AS n_cohorts
      FROM cum a JOIN cum b
        ON a.cohort = b.cohort AND b.dev = a.dev + 1
      GROUP BY a.dev
    )
    SELECT from_dev, n_cohorts, num AS sum_next_c, den AS sum_curr_c,
           CAST(num * 1000 // GREATEST(den, 1) AS BIGINT) AS factor_milli
    FROM f ORDER BY from_dev
    """,
)
def orders_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A146 — chain-ladder development factors on the order→ship
    value triangle: cohorts = order months (H1 1995), development
    age = months from order to ship, cumulative shipped value per
    (cohort, age); the volume-weighted factor f_j = Σ_i C_{i,j+1} /
    Σ_i C_{i,j} is THE actuarial/finance run-off estimator (claims
    reserving, receivables aging, backlog burn-down) — the triangle
    read A68's open-order aging snapshots cannot give.

    Determinism: exact cents; month arithmetic via DATE_TRUNC /
    month-diff (identical on both engines for post-epoch dates);
    cumulative values are exact integer prefix sums over the
    dev-bounded (≤5-step) per-cohort windows; factors are truncating
    milli ratios.

    Scale shape: one orders⋈lineitem equi-join (AQE-planned) and one
    (cohort, dev) hash aggregate absorb the scan; everything after
    runs on the ≤6×5 triangle; readout ≤4 rows."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") < F.lit("1995-12-01 00:00:00").cast("timestamp")
    )
    base = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.date_trunc("month", "o_orderdate").alias("cohort"),
        (
            (F.year("l_shipdate") - F.year("o_orderdate")) * 12
            + (F.month("l_shipdate") - F.month("o_orderdate"))
        )
        .cast("long")
        .alias("dev"),
        cents(F.col("l_extendedprice")).alias("c"),
    )
    inc = (
        base.where(F.col("dev").between(0, 4))
        .groupBy("cohort", "dev")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    w = Window.partitionBy("cohort").orderBy("dev")
    cum = inc.select(
        "cohort", "dev", F.sum("v").over(w).cast("long").alias("cv")
    )
    nxt = cum.select(
        F.col("cohort").alias("cohort2"),
        F.col("dev").alias("dev2"),
        F.col("cv").alias("cv_next"),
    )
    f = (
        cum.join(
            nxt,
            (F.col("cohort") == F.col("cohort2"))
            & (F.col("dev2") == F.col("dev") + 1),
        )
        .groupBy(F.col("dev").alias("from_dev"))
        .agg(
            F.sum("cv_next").cast("long").alias("num"),
            F.sum("cv").cast("long").alias("den"),
            F.count("*").cast("long").alias("n_cohorts"),
        )
    )
    return f.select(
        "from_dev",
        "n_cohorts",
        F.col("num").alias("sum_next_c"),
        F.col("den").alias("sum_curr_c"),
        F.expr("CAST(num * 1000 div GREATEST(den, 1) AS BIGINT)").alias(
            "factor_milli"
        ),
    ).orderBy("from_dev")


# ---------------------------------------------------------------------------
# L3k: embedding isotropy (mean pairwise cosine via the sum-vector identity)
# ---------------------------------------------------------------------------

@query(
    "embedding_isotropy",
    """
    WITH n AS (
      SELECT vec_id, CAST(label % 2 AS BIGINT) AS grp,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    u AS (
      SELECT vec_id, grp,
             list_transform(v, x -> CAST(ROUND(x / SQRT(list_dot_product(n.v, n.v))
                                          * 1000000) AS BIGINT)) AS uv
      FROM n
    ),
    comp AS (
      SELECT grp, UNNEST(generate_series(1, 64)) AS dim, uv
      FROM u
    ),
    sums AS (
      SELECT grp, dim, SUM(CAST(uv[dim] AS HUGEINT)) AS s
      FROM comp GROUP BY 1, 2
    ),
    norms AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(list_dot_product(uv, uv) AS HUGEINT)) AS self_sq
      FROM u GROUP BY 1
    ),
    tot AS (
      SELECT grp, SUM(s * s) AS s_sq FROM sums GROUP BY grp
    )
    SELECT norms.grp AS label_parity, norms.n AS n_vectors,
           CAST(ROUND((CAST(tot.s_sq AS DOUBLE) - CAST(norms.self_sq AS DOUBLE))
                / (CAST(norms.n AS DOUBLE) * (CAST(norms.n AS DOUBLE) - 1))
                / 1e12 * 1000000) AS BIGINT) AS mean_cosine_micro
    FROM norms JOIN tot USING (grp)
    ORDER BY label_parity
    """,
)
def embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3k — embedding isotropy per label parity: the mean pairwise
    cosine of all n(n−1) ordered pairs via the SUM-VECTOR identity
    Σ_{i≠j} v̂ᵢ·v̂ⱼ = |Σv̂|² − Σ|v̂ᵢ|² — ONE corpus pass instead of the
    O(n²) pair scan (the anisotropy diagnostic of Ethayarajh 2019:
    contextual embeddings cluster in a narrow cone; mean cosine ≈ 0 =
    isotropic, → 1 = collapsed — the health check before cosine
    thresholds like L2's 0.45 are trusted, and the one-pass companion
    of L3j's spectral read).

    Determinism: unit vectors are micro-quantized per row (the A137
    per-row-transcendental discipline — one sqrt per vector, then
    exact integers); component sums, |S|², and Σ|v̂ᵢ|² are exact
    128-bit; the mean cosine is one fixed double tree over two exact
    integers, micro-quantized.

    Scale shape: one explode to (grp, dim) component sums (64k cells
    — dimension-bounded, not corpus-bounded) + one per-group norm
    aggregate; NO pair join anywhere; readout 2 rows."""
    emb = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    u = emb.select(
        (F.col("label") % 2).cast("long").alias("grp"),
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") / norm * 1000000).cast("long"),
        ).alias("uv"),
    )
    comp = u.select(
        "grp",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: F.struct(
                    i.alias("dim"), F.element_at("uv", i).alias("c")
                ),
            )
        ).alias("t"),
    )
    sums = comp.groupBy("grp", F.col("t.dim").alias("dim")).agg(
        F.sum(F.col("t.c").cast("decimal(38,0)")).alias("s")
    )
    tot = sums.groupBy("grp").agg(
        F.sum(F.col("s") * F.col("s")).alias("s_sq")
    )
    self_sq = F.aggregate(
        F.transform("uv", lambda x: x.cast("decimal(19,0)") * x),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: acc + x,
    )
    norms = u.select("grp", self_sq.alias("ss")).groupBy("grp").agg(
        F.count("*").cast("long").alias("n"), F.sum("ss").alias("self_sq")
    )
    nD = F.col("n").cast("double")
    return (
        norms.join(tot, "grp")
        .select(
            F.col("grp").alias("label_parity"),
            F.col("n").alias("n_vectors"),
            F.round(
                (F.col("s_sq").cast("double") - F.col("self_sq").cast("double"))
                / (nD * (nD - 1))
                / 1e12
                * 1000000
            )
            .cast("long")
            .alias("mean_cosine_micro"),
        )
        .orderBy("label_parity")
    )


# ---------------------------------------------------------------------------
# A147: XmR (individuals / moving-range) Shewhart control chart
# ---------------------------------------------------------------------------

@query(
    "events_xmr_chart",
    """
    WITH s AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    mr AS (
      SELECT event_type, d, v,
             ABS(v - LAG(v) OVER (PARTITION BY event_type ORDER BY d)) AS r
      FROM s
    ),
    st AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(v) AS BIGINT) AS sv,
             CAST(COUNT(r) AS BIGINT) AS n_r,
             CAST(SUM(r) AS BIGINT) AS sr
      FROM mr GROUP BY 1
    ),
    lim AS (
      SELECT event_type, n_days, sv, n_r, sr,
             CAST(sv AS DOUBLE) / CAST(n_days AS DOUBLE) AS center,
             2.66 * CAST(sr AS DOUBLE) / CAST(n_r AS DOUBLE) AS spread
      FROM st WHERE n_r >= 1
    )
    SELECT l.event_type, l.n_days,
           CAST(ROUND(l.center) AS BIGINT) AS center_c,
           CAST(ROUND(l.spread) AS BIGINT) AS spread_c,
           CAST(SUM(CASE WHEN CAST(s.v AS DOUBLE) > l.center + l.spread
                           OR CAST(s.v AS DOUBLE) < l.center - l.spread
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_control
    FROM s JOIN lim l USING (event_type)
    GROUP BY l.event_type, l.n_days, l.center, l.spread
    ORDER BY l.event_type
    """,
)
def events_xmr_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A147 — XmR (individuals & moving-range) Shewhart chart on each
    type's daily revenue: center = x̄, natural process limits = x̄ ±
    2.66·MR̄ (the d2-based individuals-chart constant), out-of-control
    day count.  THE classical SPC chart — A83's CUSUM and A18's EWMA
    detect small sustained shifts; XmR flags any single excursion
    past the voice-of-the-process limits, which is what an ops
    runbook pages on.

    Determinism: exact integer daily sums and moving ranges; center/
    spread are fixed double trees with the pinned 2.66 literal; the
    out-of-control compare is integer-vs-double with both sides
    computing the identical IEEE values (the A111 discipline).

    Scale shape: one (type, day) partial aggregate; type-partitioned
    lag window over calendar-bounded series; one broadcast-back
    counting aggregate; readout k rows."""
    ev = _t(spark, sf_dir, "events")
    s = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    mr = s.select(
        "event_type",
        "d",
        "v",
        F.abs(F.col("v") - F.lag("v").over(w)).alias("r"),
    )
    st = mr.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("v").cast("long").alias("sv"),
        F.count("r").cast("long").alias("n_r"),
        F.sum("r").cast("long").alias("sr"),
    )
    lim = st.where(F.col("n_r") >= 1).select(
        "event_type",
        "n_days",
        (F.col("sv").cast("double") / F.col("n_days").cast("double")).alias(
            "center"
        ),
        (2.66 * F.col("sr").cast("double") / F.col("n_r").cast("double")).alias(
            "spread"
        ),
    )
    j = s.join(F.broadcast(lim), "event_type")
    return (
        j.groupBy("event_type", "n_days", "center", "spread")
        .agg(
            F.sum(
                F.when(
                    (F.col("v").cast("double") > F.col("center") + F.col("spread"))
                    | (
                        F.col("v").cast("double")
                        < F.col("center") - F.col("spread")
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_out_of_control")
        )
        .select(
            "event_type",
            "n_days",
            F.round("center").cast("long").alias("center_c"),
            F.round("spread").cast("long").alias("spread_c"),
            "n_out_of_control",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# A148: sample entropy (SampEn) of the daily-count series
# ---------------------------------------------------------------------------

_SAMPEN_M = 2  # template length; matches compared at m and m+1


@query(
    "events_sampen",
    f"""
    WITH d AS (
      SELECT event_type,
             DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    lo AS (SELECT event_type, MIN(day) AS d0 FROM d GROUP BY 1),
    t AS (
      SELECT d.event_type, d.day - lo.d0 AS i, d.x
      FROM d JOIN lo USING (event_type)
    ),
    r AS (
      SELECT event_type,
             CAST(GREATEST((MAX(x) - MIN(x)) * 2 // 10, 1) AS BIGINT) AS tol
      FROM t GROUP BY 1
    ),
    w AS (
      SELECT a.event_type, a.i AS ia, b.i AS ib,
             GREATEST(ABS(a.x - b.x),
                      ABS(a2.x - b2.x)) AS dist_m,
             GREATEST(ABS(a.x - b.x), ABS(a2.x - b2.x),
                      ABS(a3.x - b3.x)) AS dist_m1,
             (a3.x IS NOT NULL AND b3.x IS NOT NULL) AS has_m1
      FROM t a
      JOIN t a2 ON a2.event_type = a.event_type AND a2.i = a.i + 1
      JOIN t b  ON b.event_type = a.event_type AND b.i > a.i
      JOIN t b2 ON b2.event_type = a.event_type AND b2.i = b.i + 1
      LEFT JOIN t a3 ON a3.event_type = a.event_type AND a3.i = a.i + 2
      LEFT JOIN t b3 ON b3.event_type = a.event_type AND b3.i = b.i + 2
    ),
    cnt AS (
      SELECT w.event_type,
             CAST(SUM(CASE WHEN w.dist_m <= r.tol THEN 1 ELSE 0 END)
                  AS BIGINT) AS b_matches,
             CAST(SUM(CASE WHEN w.has_m1 AND w.dist_m1 <= r.tol
                           THEN 1 ELSE 0 END) AS BIGINT) AS a_matches
      FROM w JOIN r USING (event_type)
      GROUP BY 1
    )
    SELECT cnt.event_type, r.tol AS tolerance, b_matches, a_matches,
           CASE WHEN a_matches > 0 AND b_matches > 0
                THEN CAST(ROUND(-LN(CAST(a_matches AS DOUBLE)
                                    / CAST(b_matches AS DOUBLE)) * 1000)
                          AS BIGINT)
           END AS sampen_milli
    FROM cnt JOIN r USING (event_type)
    ORDER BY cnt.event_type
    """,
)
def events_sampen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A148 — sample entropy (Richman-Moorman) of each type's daily-
    count series: SampEn(m=2, r=0.2·range) = −ln(A/B) where B counts
    template pairs matching at length m (Chebyshev distance ≤ r) and
    A those still matching at m+1 — the regularity read of the
    nonlinear-dynamics family (low SampEn = repetitive/predictable
    days, high = irregular), next to A120's Hurst (long memory) and
    A112's Ljung-Box (linear autocorrelation): SampEn sees NONLINEAR
    regularity both miss, and unlike ApEn it is self-match-free.

    Determinism: integer tolerance (20% of the integer range,
    truncating, floor 1); template distances are exact integer
    Chebyshev maxima over the (i < j) pair join; A/B exact counts;
    SampEn one ln over an exact ratio, milli-quantized; A or B = 0
    reads NULL on both engines.

    Scale shape: one (type, day) hash aggregate absorbs the scan;
    the template pair join is type-keyed over calendar-bounded day
    tables (≤ n²/2 pairs per type-year, calendar-bounded like A128);
    readout k rows."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    ).agg(F.count("*").cast("long").alias("x"))
    lo = d.groupBy("event_type").agg(F.min("day").alias("d0"))
    t = d.join(F.broadcast(lo), "event_type").select(
        "event_type", (F.col("day") - F.col("d0")).alias("i"), "x"
    )
    r = t.groupBy("event_type").agg(
        F.greatest(
            F.expr("(MAX(x) - MIN(x)) * 2 div 10"), F.lit(1).cast("long")
        ).alias("tol")
    )

    def ts(alias, off):
        return t.select(
            F.col("event_type").alias(f"et_{alias}"),
            (F.col("i") - off).alias(f"i_{alias}"),
            F.col("x").alias(f"x_{alias}"),
        )

    a = t.select("event_type", F.col("i").alias("ia"), F.col("x").alias("xa"))
    w = (
        a.join(
            ts("a2", 1),
            (F.col("et_a2") == F.col("event_type")) & (F.col("i_a2") == F.col("ia")),
        )
        .join(
            t.select(
                F.col("event_type").alias("et_b"),
                F.col("i").alias("ib"),
                F.col("x").alias("xb"),
            ),
            (F.col("et_b") == F.col("event_type")) & (F.col("ib") > F.col("ia")),
        )
        .join(
            ts("b2", 1),
            (F.col("et_b2") == F.col("event_type")) & (F.col("i_b2") == F.col("ib")),
        )
        .join(
            ts("a3", 2),
            (F.col("et_a3") == F.col("event_type")) & (F.col("i_a3") == F.col("ia")),
            "left",
        )
        .join(
            ts("b3", 2),
            (F.col("et_b3") == F.col("event_type")) & (F.col("i_b3") == F.col("ib")),
            "left",
        )
        .select(
            "event_type",
            F.greatest(
                F.abs(F.col("xa") - F.col("xb")),
                F.abs(F.col("x_a2") - F.col("x_b2")),
            ).alias("dist_m"),
            F.greatest(
                F.abs(F.col("xa") - F.col("xb")),
                F.abs(F.col("x_a2") - F.col("x_b2")),
                F.abs(F.col("x_a3") - F.col("x_b3")),
            ).alias("dist_m1"),
            (F.col("x_a3").isNotNull() & F.col("x_b3").isNotNull()).alias(
                "has_m1"
            ),
        )
    )
    cnt = (
        w.join(F.broadcast(r), "event_type")
        .groupBy("event_type", "tol")
        .agg(
            F.sum(F.when(F.col("dist_m") <= F.col("tol"), 1).otherwise(0))
            .cast("long")
            .alias("b_matches"),
            F.sum(
                F.when(
                    F.col("has_m1") & (F.col("dist_m1") <= F.col("tol")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("a_matches"),
        )
    )
    return cnt.select(
        "event_type",
        F.col("tol").alias("tolerance"),
        "b_matches",
        "a_matches",
        F.when(
            (F.col("a_matches") > 0) & (F.col("b_matches") > 0),
            F.round(
                -F.log(
                    F.col("a_matches").cast("double")
                    / F.col("b_matches").cast("double")
                )
                * 1000
            ).cast("long"),
        ).alias("sampen_milli"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# L34: Burrows' Delta stylometric distance between sources
# ---------------------------------------------------------------------------

_DELTA_TOPK_WORDS = 20


@query(
    "text_burrows_delta",
    f"""
    WITH t AS (
      SELECT source, unnest([x for x in regexp_split_to_array(lower(text),
                             '[^a-z0-9]+') if len(x) > 0]) AS token
      FROM documents
    ),
    tot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1
    ),
    tf AS (
      SELECT t.source, t.token, CAST(COUNT(*) AS BIGINT) AS c
      FROM t GROUP BY 1, 2
    ),
    top AS (
      SELECT token FROM (
        SELECT token, SUM(c) AS tc,
               ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, token) AS rk
        FROM tf GROUP BY token
      ) x WHERE rk <= {_DELTA_TOPK_WORDS}
    ),
    freq AS (
      SELECT tot.source, top.token,
             CAST(COALESCE(tf.c, 0) * 1000000 // tot.n AS BIGINT) AS f_micro
      FROM tot CROSS JOIN top
      LEFT JOIN tf ON tf.source = tot.source AND tf.token = top.token
    ),
    stats AS (
      SELECT token,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(f_micro AS HUGEINT)) AS sf,
             SUM(CAST(f_micro AS HUGEINT) * f_micro) AS sf2
      FROM freq GROUP BY token
    ),
    z AS (
      SELECT f.source, f.token,
             (CAST(f.f_micro AS DOUBLE)
              - CAST(s.sf AS DOUBLE) / CAST(s.k AS DOUBLE))
             / SQRT((CAST(s.sf2 AS DOUBLE)
                     - CAST(s.sf AS DOUBLE) * CAST(s.sf AS DOUBLE)
                       / CAST(s.k AS DOUBLE))
                    / CAST(s.k - 1 AS DOUBLE)) AS zval
      FROM freq f JOIN stats s USING (token)
      WHERE s.sf2 * s.k > s.sf * s.sf
    ),
    zq AS (
      SELECT source, token, CAST(ROUND(zval * 1000000) AS BIGINT) AS z_micro
      FROM z
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(SUM(ABS(a.z_micro - b.z_micro)) AS BIGINT) AS sum_absdiff,
             CAST(COUNT(*) AS BIGINT) AS n_words
      FROM zq a JOIN zq b ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT src_a, src_b, n_words,
             CAST(sum_absdiff // n_words AS BIGINT) AS delta_micro,
             ROW_NUMBER() OVER (ORDER BY sum_absdiff // n_words, src_a, src_b)
               AS rk
      FROM pairs
    )
    SELECT src_a, src_b, n_words, delta_micro
    FROM scored WHERE rk <= 10 ORDER BY delta_micro, src_a, src_b
    """,
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L34 — Burrows' Delta between sources: z-score each source's
    relative frequency of the corpus's top-{_DELTA_TOPK_WORDS} words
    (across-source mean/sd per word), Delta(a, b) = mean |z_a − z_b|;
    the 10 closest pairs are the stylometric attribution readout —
    THE standard authorship/provenance distance (Burrows 2002), a
    different axis from L15's topical distinctive terms: function-
    word PROFILES, not content.

    Determinism: relative frequencies are truncating micro divisions;
    per-word across-source moments exact 128-bit; z micro-quantized
    per (source, word) BEFORE the pair fold so Delta is an exact
    integer mean; degenerate words (zero across-source variance)
    drop on both engines; full (delta, a, b) tiebreak on the top-10.

    Scale shape: one (source, token) aggregate absorbs the token
    explosion (vocabulary-bounded); everything after runs on the
    k-source × {_DELTA_TOPK_WORDS}-word grid and its k²/2 pair join
    (bounded by the source taxonomy, not the corpus); readout 10
    rows."""
    from bytesprocessor_spark.functions.text import tokenize

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokenize(F.col("text"))).alias("token"))
    tot = toks.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    tf = toks.groupBy("source", "token").agg(F.count("*").cast("long").alias("c"))
    w_top = Window.partitionBy(F.lit(1)).orderBy(
        F.col("tc").desc(), F.col("token")
    )
    top = (
        bounded_single_group(
            tf.groupBy("token").agg(F.sum("c").cast("long").alias("tc"))
        )
        .select(
            "token",
            "tc",
            F.row_number()
            .over(
                Window.partitionBy("__opid").orderBy(
                    F.col("tc").desc(), F.col("token")
                )
            )
            .alias("rk"),
        )
        .where(F.col("rk") <= _DELTA_TOPK_WORDS)
        .select("token")
    )
    freq = (
        tot.crossJoin(F.broadcast(top))
        .join(tf, ["source", "token"], "left")
        .select(
            "source",
            "token",
            F.expr("CAST(COALESCE(c, 0) * 1000000 div n AS BIGINT)").alias(
                "f_micro"
            ),
        )
    )
    stats = freq.groupBy("token").agg(
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("f_micro").cast("decimal(38,0)")).alias("sf"),
        F.sum(F.col("f_micro").cast("decimal(19,0)") * F.col("f_micro")).alias(
            "sf2"
        ),
    )
    kD = F.col("k").cast("double")
    mean = F.col("sf").cast("double") / kD
    sd = F.sqrt(
        (F.col("sf2").cast("double") - F.col("sf").cast("double") * F.col("sf").cast("double") / kD)
        / (kD - 1)
    )
    z = (
        freq.join(F.broadcast(stats), "token")
        .where(F.col("sf2") * F.col("k") > F.col("sf") * F.col("sf"))
        .select(
            "source",
            "token",
            F.round((F.col("f_micro").cast("double") - mean) / sd * 1000000)
            .cast("long")
            .alias("z_micro"),
        )
    )
    zb = z.select(
        F.col("source").alias("src_b"),
        F.col("token").alias("token_b"),
        F.col("z_micro").alias("z_b"),
    )
    pairs = (
        z.join(
            zb,
            (F.col("token") == F.col("token_b"))
            & (F.col("source") < F.col("src_b")),
        )
        .groupBy(F.col("source").alias("src_a"), "src_b")
        .agg(
            F.sum(F.abs(F.col("z_micro") - F.col("z_b")))
            .cast("long")
            .alias("sum_absdiff"),
            F.count("*").cast("long").alias("n_words"),
        )
    )
    scored = bounded_single_group(
        pairs.select(
            "src_a",
            "src_b",
            "n_words",
            F.expr("CAST(sum_absdiff div n_words AS BIGINT)").alias("delta_micro"),
        )
    ).select(
        "src_a",
        "src_b",
        "n_words",
        "delta_micro",
        F.row_number()
        .over(
            Window.partitionBy("__opid").orderBy(
                "delta_micro", "src_a", "src_b"
            )
        )
        .alias("rk"),
    )
    return (
        scored.where(F.col("rk") <= 10)
        .select("src_a", "src_b", "n_words", "delta_micro")
        .orderBy("delta_micro", "src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# EV43: classification log-loss (cross-entropy) of the pinned model
# ---------------------------------------------------------------------------

_LL_CLAMP = 1000  # pm clamped to [1e-3, 1-1e-3] in micro units


@query(
    "eval_log_loss",
    f"""
    WITH b AS (
      SELECT vec_id,
             CAST(label % 2 AS BIGINT) AS y,
             CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           + CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT)
               AS score
      FROM embeddings
    ),
    mm AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM b),
    p AS (
      SELECT y,
             LEAST(GREATEST(((score - lo) * 1000000)
                            // GREATEST(hi - lo, 1), {_LL_CLAMP}),
                   1000000 - {_LL_CLAMP}) AS pm
      FROM b, mm
    ),
    q AS (
      SELECT y, pm,
             CAST(ROUND(-LN(CASE WHEN y = 1
                                 THEN CAST(pm AS DOUBLE) / 1000000.0
                                 ELSE 1.0 - CAST(pm AS DOUBLE) / 1000000.0
                            END) * 1000000000) AS BIGINT) AS nll_nano
      FROM p
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(nll_nano) AS BIGINT) AS sum_nll_nano,
           CAST(SUM(nll_nano) // COUNT(*) AS BIGINT) AS log_loss_nano
    FROM q
    """,
)
def eval_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV43 — classification log-loss (cross-entropy) of the EV1
    pinned pseudo-model: mean −ln p(y) over clamped min-max micro-
    probabilities ([1e-3, 1−1e-3] — the standard guard against
    infinite penalty).  THE proper scoring rule the Brier score
    (EV32) approximates quadratically; log-loss is what the training
    objective actually was, so eval should read it too.

    Determinism: pm is exact integer; the per-row −ln is NANO-
    quantized BEFORE the sum (the A112/A137 per-row-transcendental
    discipline) so the total and the truncating mean are exact
    integers.

    Scale shape: one min/max broadcast + one scalar aggregate absorbs
    the scan; readout 1 row."""
    from bytesprocessor_spark.queries_eval import _scored

    b = _scored(spark, sf_dir)
    mm = b.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    p = b.crossJoin(F.broadcast(mm)).select(
        "y",
        F.least(
            F.greatest(
                F.expr("((score - lo) * 1000000) div GREATEST(hi - lo, 1)"),
                F.lit(_LL_CLAMP).cast("long"),
            ),
            F.lit(1000000 - _LL_CLAMP).cast("long"),
        ).alias("pm"),
    )
    nll = F.round(
        -F.log(
            F.when(F.col("y") == 1, F.col("pm").cast("double") / 1000000.0)
            .otherwise(1.0 - F.col("pm").cast("double") / 1000000.0)
        )
        * 1000000000
    ).cast("long")
    q = p.select("y", nll.alias("nll_nano"))
    return q.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum("nll_nano").cast("long").alias("sum_nll_nano"),
        F.expr("CAST(SUM(nll_nano) div COUNT(*) AS BIGINT)").alias(
            "log_loss_nano"
        ),
    )


# ---------------------------------------------------------------------------
# A149: binary transfer entropy between event-type daily series
# ---------------------------------------------------------------------------

@query(
    "events_transfer_entropy",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type,
             CAST(quantile_disc(x, 0.5) AS BIGINT) AS m
      FROM d GROUP BY 1
    ),
    bin AS (
      SELECT d.event_type, d.day,
             CASE WHEN d.x > med.m THEN 1 ELSE 0 END AS b
      FROM d JOIN med USING (event_type)
    ),
    tri AS (
      SELECT y.event_type AS tgt, x.event_type AS src,
             yt.b AS y_now, y.b AS y_prev, x.b AS x_prev
      FROM bin y
      JOIN bin yt ON yt.event_type = y.event_type
                 AND yt.day = y.day + INTERVAL 1 DAY
      JOIN bin x ON x.day = y.day AND x.event_type <> y.event_type
    ),
    cells AS (
      SELECT tgt, src, y_now, y_prev, x_prev,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM tri GROUP BY 1, 2, 3, 4, 5
    ),
    m AS (
      SELECT tgt, src, y_now, y_prev, x_prev, c,
             CAST(SUM(c) OVER (PARTITION BY tgt, src) AS BIGINT) AS n,
             CAST(SUM(c) OVER (PARTITION BY tgt, src, y_prev, x_prev)
                  AS BIGINT) AS c_ypxp,
             CAST(SUM(c) OVER (PARTITION BY tgt, src, y_prev) AS BIGINT)
               AS c_yp,
             CAST(SUM(c) OVER (PARTITION BY tgt, src, y_now, y_prev)
                  AS BIGINT) AS c_ynyp
      FROM cells
    ),
    terms AS (
      SELECT tgt, src,
             CAST(ROUND(CAST(c AS DOUBLE)
                  * LN((CAST(c AS DOUBLE) * CAST(c_yp AS DOUBLE))
                       / (CAST(c_ypxp AS DOUBLE) * CAST(c_ynyp AS DOUBLE)))
                  * 1000000000) AS BIGINT) AS t_nano
      FROM m
    )
    SELECT tgt AS target_type, src AS source_type,
           CAST(SUM(t_nano) AS BIGINT) AS te_sum_nano
    FROM terms GROUP BY 1, 2
    ORDER BY target_type, source_type
    """,
)
def events_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A149 — binary transfer entropy TE(X→Y) at lag 1 between every
    ordered pair of event-type daily series (median-binarized):
    N·TE = Σ_cells c·ln(c·c_{{y'}} / (c_{{y'x'}}·c_{{yy'}})) — the
    DIRECTIONAL information-flow read (does knowing X yesterday
    reduce uncertainty about Y today beyond Y's own history?) that
    A39's symmetric correlation matrix and A57's G-test cannot give;
    TE(X→Y) ≠ TE(Y→X) is the whole point (Schreiber 2000).

    Determinism: median cuts are percentile_disc data points;
    binarization and the ≤8-cell contingency per ordered pair are
    exact integers; each cell's ln-term is NANO-quantized BEFORE the
    exact integer sum (the A112 discipline — the emitted statistic is
    N·TE in nano-nats, an exact integer); marginals by window sums
    over the bounded cell table.

    Scale shape: one (type, day) aggregate absorbs the scan; the
    triple join runs on calendar-bounded binary series (k² ordered
    pairs × ≤days rows); readout k(k−1) rows."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    med = d.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)")
        .cast("long")
        .alias("m")
    )
    bin_ = d.join(F.broadcast(med), "event_type").select(
        "event_type",
        "day",
        F.when(F.col("x") > F.col("m"), 1).otherwise(0).alias("b"),
    )
    y = bin_.select(
        F.col("event_type").alias("tgt"),
        F.col("day").alias("dy"),
        F.col("b").alias("y_prev"),
    )
    yt = bin_.select(
        F.col("event_type").alias("tgt2"),
        F.col("day").alias("dyt"),
        F.col("b").alias("y_now"),
    )
    xs = bin_.select(
        F.col("event_type").alias("src"),
        F.col("day").alias("dx"),
        F.col("b").alias("x_prev"),
    )
    tri = (
        y.join(
            yt,
            (F.col("tgt2") == F.col("tgt"))
            & (F.col("dyt") == F.expr("dy + INTERVAL 1 DAY")),
        )
        .join(
            xs,
            (F.col("dx") == F.col("dy")) & (F.col("src") != F.col("tgt")),
        )
        .select("tgt", "src", "y_now", "y_prev", "x_prev")
    )
    cells = tri.groupBy("tgt", "src", "y_now", "y_prev", "x_prev").agg(
        F.count("*").cast("long").alias("c")
    )
    w_pair = Window.partitionBy("tgt", "src")
    m = cells.select(
        "tgt",
        "src",
        "y_now",
        "y_prev",
        "x_prev",
        "c",
        F.sum("c").over(w_pair).cast("long").alias("n"),
        F.sum("c")
        .over(Window.partitionBy("tgt", "src", "y_prev", "x_prev"))
        .cast("long")
        .alias("c_ypxp"),
        F.sum("c")
        .over(Window.partitionBy("tgt", "src", "y_prev"))
        .cast("long")
        .alias("c_yp"),
        F.sum("c")
        .over(Window.partitionBy("tgt", "src", "y_now", "y_prev"))
        .cast("long")
        .alias("c_ynyp"),
    )
    t_nano = F.round(
        F.col("c").cast("double")
        * F.log(
            (F.col("c").cast("double") * F.col("c_yp").cast("double"))
            / (F.col("c_ypxp").cast("double") * F.col("c_ynyp").cast("double"))
        )
        * 1000000000
    ).cast("long")
    return (
        m.select("tgt", "src", t_nano.alias("t_nano"))
        .groupBy(
            F.col("tgt").alias("target_type"), F.col("src").alias("source_type")
        )
        .agg(F.sum("t_nano").cast("long").alias("te_sum_nano"))
        .orderBy("target_type", "source_type")
    )


# ---------------------------------------------------------------------------
# A150: exact continuous (interpolated) quartiles in quarter-cents
# ---------------------------------------------------------------------------

@query(
    "orders_quartiles_cont",
    """
    WITH v AS (
      SELECT o_orderpriority AS prio,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    r AS (
      SELECT prio, c,
             ROW_NUMBER() OVER (PARTITION BY prio
                                ORDER BY c, prio) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY prio) AS BIGINT) AS n
      FROM v
    ),
    pick AS (
      SELECT prio, n, k,
             MAX(CASE WHEN rn = (n - 1) * k // 4 + 1 THEN c END) AS lo,
             MAX(CASE WHEN rn = LEAST((n - 1) * k // 4 + 2, n) THEN c END)
               AS hi,
             (n - 1) * k % 4 AS frac4
      FROM r CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS k) ks
      GROUP BY prio, n, k
    )
    SELECT prio AS o_orderpriority, CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS quartile,
           CAST(lo * 4 + (hi - lo) * frac4 AS BIGINT) AS value_quarter_c
    FROM pick ORDER BY o_orderpriority, quartile
    """,
)
def orders_quartiles_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A150 — CONTINUOUS (linear-interpolated, type-7) quartiles per
    priority with ZERO floats: position (n−1)·k/4 splits into an
    exact integer index and a quarter fraction, so the interpolated
    value lo + (hi−lo)·frac is an EXACT integer in quarter-cents
    (value·4).  The registry's percentile_disc entries return data
    points (exact but step-biased on small n); this is the
    numpy/R-default interpolation made bit-exact cross-engine — the
    portability trap is that each engine's built-in quantile_cont
    interpolates in its own float order, differing in final ulps.

    Determinism: order statistics under the (value, unique-ish) rank;
    ties on value make any same-value pick equivalent; index/fraction
    arithmetic is pure integer; the readout is an exact int64.

    Scale shape: priority-partitioned rank windows (k-bounded
    groups); the 3-quartile grid is a 3-row literal; readout 3k
    rows."""
    v = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        cents(F.col("o_totalprice")).alias("c"),
    )
    w = Window.partitionBy("prio").orderBy("c", "prio")
    r = v.select(
        "prio",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("prio")).cast("long").alias("n"),
    )
    ks = spark.range(1, 4).select(F.col("id").cast("long").alias("k"))
    pick = (
        r.crossJoin(F.broadcast(ks))
        .groupBy("prio", "n", "k")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n - 1) * k div 4 + 1"), F.col("c")
                )
            ).alias("lo"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.least(F.expr("(n - 1) * k div 4 + 2"), F.col("n")),
                    F.col("c"),
                )
            ).alias("hi"),
            F.max(F.expr("(n - 1) * k % 4")).alias("frac4"),
        )
    )
    return pick.select(
        F.col("prio").alias("o_orderpriority"),
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("quartile"),
        (F.col("lo") * 4 + (F.col("hi") - F.col("lo")) * F.col("frac4"))
        .cast("long")
        .alias("value_quarter_c"),
    ).orderBy("o_orderpriority", "quartile")


# ---------------------------------------------------------------------------
# A151: Mood's median test across event types
# ---------------------------------------------------------------------------

@query(
    "events_mood_median",
    """
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
    ),
    gm AS (SELECT CAST(quantile_disc(c, 0.5) AS BIGINT) AS med FROM v),
    cell AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN c > med THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above,
             CAST(SUM(CASE WHEN c <= med THEN 1 ELSE 0 END) AS BIGINT)
               AS n_below
      FROM v CROSS JOIN gm GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(SUM(n_above) AS BIGINT) AS ta,
             CAST(SUM(n_below) AS BIGINT) AS tb,
             CAST(SUM(n_above + n_below) AS BIGINT) AS n
      FROM cell
    ),
    terms AS (
      SELECT c.event_type, c.n_above, c.n_below,
             CAST(ROUND(CASE WHEN t.ta > 0 AND t.tb > 0 THEN (
               (CAST(c.n_above AS DOUBLE)
                - CAST(c.n_above + c.n_below AS DOUBLE)
                  * CAST(t.ta AS DOUBLE) / CAST(t.n AS DOUBLE))
               * (CAST(c.n_above AS DOUBLE)
                  - CAST(c.n_above + c.n_below AS DOUBLE)
                    * CAST(t.ta AS DOUBLE) / CAST(t.n AS DOUBLE))
               / (CAST(c.n_above + c.n_below AS DOUBLE)
                  * CAST(t.ta AS DOUBLE) / CAST(t.n AS DOUBLE))
             + (CAST(c.n_below AS DOUBLE)
                - CAST(c.n_above + c.n_below AS DOUBLE)
                  * CAST(t.tb AS DOUBLE) / CAST(t.n AS DOUBLE))
               * (CAST(c.n_below AS DOUBLE)
                  - CAST(c.n_above + c.n_below AS DOUBLE)
                    * CAST(t.tb AS DOUBLE) / CAST(t.n AS DOUBLE))
               / (CAST(c.n_above + c.n_below AS DOUBLE)
                  * CAST(t.tb AS DOUBLE) / CAST(t.n AS DOUBLE))
             ) END * 1000000) AS BIGINT) AS term_micro
      FROM cell c CROSS JOIN tot t
    )
    SELECT event_type, n_above, n_below, term_micro,
           CAST(SUM(term_micro) OVER () AS BIGINT) AS chi2_micro
    FROM terms ORDER BY event_type
    """,
)
def events_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A151 — Mood's median test: each type's value counts above/at-
    or-below the GRAND median form a k×2 contingency; χ² against the
    proportional expectation asks "do the k types share a median" —
    the coarsest, most outlier-robust k-sample test (A88's Kruskal-
    Wallis uses full ranks and is more powerful but less robust to
    wild tails; a data-quality runbook wants both).

    Determinism: the grand median is a percentile_disc data point;
    counts exact; each type's χ² term is one fixed double tree
    MICRO-quantized before the k-row fold (exact integer χ², the
    A112 discipline).

    Scale shape: one global percentile (1 row, broadcast), one type-
    keyed counting aggregate absorbs the scan; readout k rows."""
    v = _t(spark, sf_dir, "events").select(
        "event_type", cents(F.col("value")).alias("c")
    )
    gm = v.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
        .cast("long")
        .alias("med")
    )
    cell = (
        v.crossJoin(F.broadcast(gm))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("c") > F.col("med"), 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
            F.sum(F.when(F.col("c") <= F.col("med"), 1).otherwise(0))
            .cast("long")
            .alias("n_below"),
        )
    )
    cell = bounded_single_group(cell)
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = cell.select(
        "event_type",
        "n_above",
        "n_below",
        F.sum("n_above").over(w_all).cast("long").alias("ta"),
        F.sum("n_below").over(w_all).cast("long").alias("tb"),
        F.sum(F.col("n_above") + F.col("n_below"))
        .over(w_all)
        .cast("long")
        .alias("n"),
        F.col("__opid"),
    )
    ri = (F.col("n_above") + F.col("n_below")).cast("double")
    nD = F.col("n").cast("double")
    ea = ri * F.col("ta").cast("double") / nD
    eb = ri * F.col("tb").cast("double") / nD
    # ADVICE r10 fix: when the grand median equals the corpus max
    # (ta = 0, plausible on heavily tied cents), ea = 0 made the
    # chi-square term 0/0 NaN — DuckDB errors on CAST(ROUND(nan))
    # while Spark non-ANSI-casts, a divergent failure.  Both engine
    # texts now guard the whole term with ta > 0 AND tb > 0 → NULL.
    term = F.round(
        F.when(
            (F.col("ta") > 0) & (F.col("tb") > 0),
            (F.col("n_above").cast("double") - ea)
            * (F.col("n_above").cast("double") - ea)
            / ea
            + (F.col("n_below").cast("double") - eb)
            * (F.col("n_below").cast("double") - eb)
            / eb,
        )
        * 1000000
    ).cast("long")
    terms = t.select(
        "event_type", "n_above", "n_below", "__opid", term.alias("term_micro")
    )
    return terms.select(
        "event_type",
        "n_above",
        "n_below",
        "term_micro",
        F.sum("term_micro").over(w_all).cast("long").alias("chi2_micro"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A152: Jonckheere-Terpstra ordered-alternative trend test
# ---------------------------------------------------------------------------

@query(
    "orders_jonckheere",
    """
    WITH v AS (
      SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    s AS (
      SELECT c,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
             CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
             CAST(SUM(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS m3,
             CAST(SUM(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS m4,
             CAST(SUM(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS BIGINT) AS m5
      FROM v GROUP BY c
    ),
    cum AS (
      SELECT c, m1, m2, m3, m4, m5,
             CAST(SUM(m1) OVER w - m1 AS BIGINT) AS lt1,
             CAST(SUM(m2) OVER w - m2 AS BIGINT) AS lt2,
             CAST(SUM(m3) OVER w - m3 AS BIGINT) AS lt3,
             CAST(SUM(m4) OVER w - m4 AS BIGINT) AS lt4
      FROM s WINDOW w AS (ORDER BY c ROWS UNBOUNDED PRECEDING)
    ),
    u AS (
      SELECT
        SUM(CAST(m2 AS HUGEINT) * lt1
          + CAST(m3 AS HUGEINT) * (lt1 + lt2)
          + CAST(m4 AS HUGEINT) * (lt1 + lt2 + lt3)
          + CAST(m5 AS HUGEINT) * (lt1 + lt2 + lt3 + lt4)) AS j2,
        SUM(CAST(m2 AS HUGEINT) * m1
          + CAST(m3 AS HUGEINT) * (m1 + m2)
          + CAST(m4 AS HUGEINT) * (m1 + m2 + m3)
          + CAST(m5 AS HUGEINT) * (m1 + m2 + m3 + m4)) AS ties2
      FROM cum
    ),
    n AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ni FROM v GROUP BY 1),
    mo AS (
      SELECT CAST(SUM(ni) AS BIGINT) AS nn,
             SUM(CAST(ni AS HUGEINT) * ni) AS sn2,
             SUM(CAST(ni AS HUGEINT) * ni * (2 * ni + 3)) AS sn23
      FROM n
    )
    SELECT mo.nn AS n_orders,
           CAST(u.j2 AS BIGINT) AS j_stat,
           CAST(u.ties2 AS BIGINT) AS tie_pairs,
           CAST(ROUND(
             (CAST(u.j2 AS DOUBLE) + CAST(u.ties2 AS DOUBLE) / 2.0
              - (CAST(mo.nn AS DOUBLE) * CAST(mo.nn AS DOUBLE)
                 - CAST(mo.sn2 AS DOUBLE)) / 4.0)
             / SQRT((CAST(mo.nn AS DOUBLE) * CAST(mo.nn AS DOUBLE)
                     * (2.0 * CAST(mo.nn AS DOUBLE) + 3.0)
                     - CAST(mo.sn23 AS DOUBLE)) / 72.0)
             * 1000) AS BIGINT) AS z_milli
    FROM u CROSS JOIN mo
    """,
)
def orders_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A152 — Jonckheere-Terpstra ordered-alternative test: J = Σ over
    ordered group pairs (g_a < g_b) of #{value_b > value_a} (ties
    counted half), z against the no-trend null — asks "does order
    VALUE increase monotonically with PRIORITY level", which A88's
    Kruskal-Wallis (any difference) and A57's G-test (association)
    cannot answer: JT spends its power entirely on the ORDERED
    alternative.

    Determinism AND scale: the EV1 rank-sum device — the corpus
    collapses to the value-domain-bounded grouped table (one column
    of counts per priority level, k = 5 fixed), ONE prefix window
    over that bounded support computes every group's
    strictly-below cumulative, and J = Σ_v Σ_{a<b} m_b(v)·lt_a(v)
    accumulates exact 128-bit with the tie mass alongside — NO pair
    join anywhere (a naive grouped-pair join is O(n²) and measured
    un-runnable at sf0.1).  The half-tie correction and the standard
    no-tie variance enter one double tree, milli-quantized.

    Scale shape: one (value) hash aggregate absorbs the scan
    (bounded by the 2-decimal price domain, not corpus rows — the
    EV1 argument); the prefix window runs over that bounded table
    (declared bounded_single_group); readout 1 row."""
    v = _t(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("g"),
        cents(F.col("o_totalprice")).alias("c"),
    )
    s = v.groupBy("c").agg(
        *[
            F.sum(F.when(F.col("g") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"m{i}")
            for i in range(1, 6)
        ]
    )
    s = bounded_single_group(s)  # value-domain-bounded support table
    w = (
        Window.partitionBy("__opid")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = s.select(
        "c",
        *[F.col(f"m{i}") for i in range(1, 6)],
        *[
            (F.sum(f"m{i}").over(w) - F.col(f"m{i}")).cast("long").alias(f"lt{i}")
            for i in range(1, 5)
        ],
    )
    dec = lambda c_: F.col(c_).cast("decimal(19,0)")  # noqa: E731
    j2 = F.sum(
        dec("m2") * F.col("lt1")
        + dec("m3") * (F.col("lt1") + F.col("lt2"))
        + dec("m4") * (F.col("lt1") + F.col("lt2") + F.col("lt3"))
        + dec("m5") * (F.col("lt1") + F.col("lt2") + F.col("lt3") + F.col("lt4"))
    )
    ties2 = F.sum(
        dec("m2") * F.col("m1")
        + dec("m3") * (F.col("m1") + F.col("m2"))
        + dec("m4") * (F.col("m1") + F.col("m2") + F.col("m3"))
        + dec("m5") * (F.col("m1") + F.col("m2") + F.col("m3") + F.col("m4"))
    )
    u = cum.agg(j2.alias("j2"), ties2.alias("ties2"))
    n = v.groupBy("g").agg(F.count("*").cast("long").alias("ni"))
    mo = n.agg(
        F.sum("ni").cast("long").alias("nn"),
        F.sum(F.col("ni").cast("decimal(19,0)") * F.col("ni")).alias("sn2"),
        F.sum(
            F.col("ni").cast("decimal(19,0)")
            * F.col("ni")
            * (2 * F.col("ni") + 3)
        ).alias("sn23"),
    )
    j = u.crossJoin(F.broadcast(mo))
    nD = F.col("nn").cast("double")
    z = (
        F.col("j2").cast("double")
        + F.col("ties2").cast("double") / 2.0
        - (nD * nD - F.col("sn2").cast("double")) / 4.0
    ) / F.sqrt(
        (nD * nD * (2.0 * nD + 3.0) - F.col("sn23").cast("double")) / 72.0
    )
    return j.select(
        F.col("nn").alias("n_orders"),
        F.col("j2").cast("long").alias("j_stat"),
        F.col("ties2").cast("long").alias("tie_pairs"),
        F.round(z * 1000).cast("long").alias("z_milli"),
    )
