"""Round-9 analytics batch: inequality / inventory / drift /
calibration operators, each built on the round-9 distributed-rank
discipline (no single-partition window anywhere — entity-scale ranks
use operators/ranking.py, k-row frames declare themselves with
bounded_single_group).

- A101 orders_theil_index: Theil-T inequality decomposition of order
  revenue across priorities (between- vs within-group concentration)
  — the additive-decomposable alternative to A35's Gini.
- A102 orders_newsvendor: critical-fractile (cu/(cu+co)) stocking
  levels per priority via percentile_disc, with exact stockout share.
- A103 part_cv2_adi_classes: Syntetos-Boylan demand classification
  (ADI x CV^2 quadrants: smooth / intermittent / erratic / lumpy) —
  the screen that decides when A89's Croston applies at all.
- A104 events_page_hinkley: Page-Hinkley change detection on the
  daily purchase-value mean (cumulative deviation minus running
  minimum against a lambda threshold) — the sequential drift test
  behind ST13's distribution monitor.
- A105 events_user_burstiness: per-user inter-event burstiness
  B = (sigma - mu)/(sigma + mu) (Goh-Barabasi), read as a bounded
  20-bucket histogram over users.
- A106 part_abc_xyz_matrix: the 9-cell ABC (revenue Pareto, via the
  distributed prefix-sum device) x XYZ (demand variability) planning
  matrix over parts — the join of A33's and A51's axes the A51
  docstring promises.
- EV28 eval_spiegelhalter_z: Spiegelhalter's Z calibration test over
  the pinned md5-uniform probability proxy — the significance read
  behind EV3's reliability diagram.
- EV29 eval_topk_accuracy: top-k accuracy (k = 1, 2, 3) of a pinned
  5-class score model with deterministic tiebreaks — the multi-class
  companion of EV9's confusion matrix.
- L30 corpus_length_profile: per-source log2-bucket document-length
  histogram with char-mass shares — the shard-sizing readout a
  training-data pipeline reads before packing (L6).
- GR12 graph_jaccard_linkpred: common-neighbor Jaccard scores over
  the supplier co-occurrence graph, top-20 — the normalized sibling
  of GR6's Adamic-Adar.
- ST22 stream_page_hinkley: A104 as a stream — per-day state
  accumulates across micro-batches, the PH replay runs on the drained
  sink (replay-valid: integer day aggregates are batch-order
  independent).

Determinism contract (the A80/A81 pattern): engines aggregate ONLY
exact int64 counts/sums (per-row ln/sqrt terms quantize to an integer
scale FIRST); class boundaries compare via integer cross-
multiplication, never rounded doubles; every remaining statistic is a
single fixed IEEE-double tree over exact integers, quantized once.

Reference scope note: the reference engine ends at the labeled packet
table (BytesProcessor.py:121-187); these are EXT rows of the
analytics surface SURVEY §2 declares on top of it.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bytesprocessor_spark.operators.ranking import (
    bounded_single_group,
    distributed_cumsum,
)
from bytesprocessor_spark.queries import _t, cents, query


def _h60(col):
    """Cross-engine 60-bit non-negative hash (md5 prefix as integer) —
    the queries_curation idiom, local copy to avoid an import cycle."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_H60_DUCK = "CAST('0x' || substr(md5({0}), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# A101: Theil-T inequality decomposition across order priorities
# ---------------------------------------------------------------------------

@query(
    "orders_theil_index",
    """
    WITH x AS (
      SELECT o_orderpriority AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
             CAST(ROUND(LN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) * 1000)
                  AS BIGINT) AS lq
      FROM orders
    ),
    grp AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * lq) AS BIGINT) AS xl
      FROM x GROUP BY g
    ),
    tot AS (
      SELECT grp.*,
             CAST(SUM(n) OVER () AS BIGINT) AS nn,
             CAST(SUM(s) OVER () AS BIGINT) AS ss
      FROM grp
    )
    SELECT g AS priority, n AS n_orders, s AS revenue_cents,
      CAST(s * 1000000 // ss AS BIGINT) AS share_ppm,
      CAST(ROUND((CAST(xl AS DOUBLE) / 1000.0 / CAST(s AS DOUBLE)
           - LN(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000) AS BIGINT)
        AS theil_within_micro,
      CAST(ROUND(CAST(s AS DOUBLE) / CAST(ss AS DOUBLE)
           * LN((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                / (CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))) * 1000000)
        AS BIGINT) AS between_term_micro
    FROM tot ORDER BY priority
    """,
)
def orders_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A101 — Theil-T inequality index decomposed across order
    priorities: T = T_between + Σ_g share_g · T_g, with per-group
    T_g = Σ x·ln(x) / S_g − ln(μ_g) and between-term
    share_g · ln(μ_g / μ).  Unlike A35's Gini, Theil decomposes
    ADDITIVELY — the readout says how much revenue concentration
    lives across priorities vs inside each one (the standard question
    for corpus-source token-mass audits too).

    Determinism: per-row ln quantizes to milli-nats BEFORE the
    weighted sum (x·lq is exact int64: ~1e12 per row, so the group
    sum stays inside int64 to ~9e6 rows per group ≈ sf30 — past that
    drop to centi-nat quantization or decimal(38), the Gram-matrix
    escape hatch); T_g and the between term are fixed double trees
    over (n, s, xl, nn, ss), micro-quantized.

    Scale shape: one priority-keyed hash aggregate absorbs the scan
    (map-side combinable); totals ride a bounded 5-row window
    (bounded_single_group); readout 5 rows."""
    x = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        cents(F.col("o_totalprice")).alias("x"),
    ).withColumn(
        "lq", F.round(F.log(F.col("x").cast("double")) * 1000).cast("long")
    )
    grp = x.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("lq")).cast("long").alias("xl"),
    )
    grp = bounded_single_group(grp)  # 5-priority bounded table
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = grp.select(
        "g",
        "n",
        "s",
        "xl",
        F.sum("n").over(w_all).cast("long").alias("nn"),
        F.sum("s").over(w_all).cast("long").alias("ss"),
    )
    sD, nD = F.col("s").cast("double"), F.col("n").cast("double")
    ssD, nnD = F.col("ss").cast("double"), F.col("nn").cast("double")
    t_within = F.col("xl").cast("double") / 1000.0 / sD - F.log(sD / nD)
    t_between = sD / ssD * F.log((sD / nD) / (ssD / nnD))
    return tot.select(
        F.col("g").alias("priority"),
        F.col("n").alias("n_orders"),
        F.col("s").alias("revenue_cents"),
        F.expr("CAST(s * 1000000 div ss AS BIGINT)").alias("share_ppm"),
        F.round(t_within * 1000000).cast("long").alias("theil_within_micro"),
        F.round(t_between * 1000000).cast("long").alias("between_term_micro"),
    ).orderBy("priority")


# ---------------------------------------------------------------------------
# A102: newsvendor critical-fractile stocking levels
# ---------------------------------------------------------------------------

_NV_CU, _NV_CO = 9, 1  # underage:overage 9:1 -> fractile 0.9


@query(
    "orders_newsvendor",
    f"""
    WITH v AS (
      SELECT o_orderpriority AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    lvl AS (
      SELECT g, CAST(quantile_disc(x, {_NV_CU / (_NV_CU + _NV_CO)}) AS BIGINT)
               AS level_c,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY g
    )
    SELECT v.g AS priority,
           CAST({_NV_CU * 1000000 // (_NV_CU + _NV_CO)} AS BIGINT)
             AS fractile_ppm,
           CAST(MAX(lvl.level_c) AS BIGINT) AS stock_level_cents,
           CAST(MAX(lvl.n) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN v.x > lvl.level_c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_stockout,
           CAST(SUM(CASE WHEN v.x > lvl.level_c THEN 1 ELSE 0 END) * 1000000
                // MAX(lvl.n) AS BIGINT) AS stockout_ppm
    FROM v JOIN lvl ON v.g = lvl.g
    GROUP BY v.g ORDER BY priority
    """,
)
def orders_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A102 — newsvendor critical fractile: with underage cost cu and
    overage cost co, the optimal stocking level is the cu/(cu+co)
    quantile of demand — here the 0.9-fractile of order value per
    priority (percentile_disc: an actual data point, exact int64),
    with the realized stockout share (orders strictly above the
    level) as the service-level check.  THE one-period inventory
    primitive behind every safety-stock table.

    Determinism: quantile_disc picks a data point (no interpolation);
    counts exact; floor-division ppm.

    Scale shape: one priority-keyed percentile aggregate (sketchless —
    the value domain is bounded), the k-row level table broadcasts
    back onto the scan for the strict-exceedance count; readout 5
    rows."""
    v = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        cents(F.col("o_totalprice")).alias("x"),
    )
    q = _NV_CU / (_NV_CU + _NV_CO)
    lvl = v.groupBy("g").agg(
        F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY x)")
        .cast("long")
        .alias("level_c"),
        F.count("*").cast("long").alias("n"),
    )
    j = v.join(F.broadcast(lvl), "g")
    return (
        j.groupBy("g")
        .agg(
            F.max("level_c").alias("stock_level_cents"),
            F.max("n").alias("n_orders"),
            F.sum(F.when(F.col("x") > F.col("level_c"), 1).otherwise(0))
            .cast("long")
            .alias("n_stockout"),
        )
        .select(
            F.col("g").alias("priority"),
            F.lit(_NV_CU * 1000000 // (_NV_CU + _NV_CO))
            .cast("long")
            .alias("fractile_ppm"),
            "stock_level_cents",
            "n_orders",
            "n_stockout",
            F.expr("CAST(n_stockout * 1000000 div n_orders AS BIGINT)").alias(
                "stockout_ppm"
            ),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# A103: Syntetos-Boylan demand classification (ADI x CV^2)
# ---------------------------------------------------------------------------

@query(
    "part_cv2_adi_classes",
    """
    WITH wk AS (
      SELECT l_partkey AS part,
             CAST(FLOOR(DATE_DIFF('day', DATE '1995-01-01',
               CAST(l_shipdate AS DATE)) / 7.0) AS BIGINT) AS week,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS d
      FROM lineitem GROUP BY 1, 2
    ),
    p AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS s1,
             CAST(SUM(d * d) AS BIGINT) AS s2,
             CAST(MAX(week) - MIN(week) AS BIGINT) AS span
      FROM wk GROUP BY part HAVING COUNT(*) >= 2
    ),
    cl AS (
      SELECT part, n, span,
             (span * 100 >= 132 * (n - 1)) AS slow,
             (100 * (n * s2 - s1 * s1) >= 49 * s1 * s1) AS variable
      FROM p
    )
    SELECT CASE WHEN NOT slow AND NOT variable THEN 'smooth'
                WHEN slow AND NOT variable THEN 'intermittent'
                WHEN NOT slow AND variable THEN 'erratic'
                ELSE 'lumpy' END AS demand_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(n) AS BIGINT) AS n_demand_points,
           CAST(SUM(span) AS BIGINT) AS sum_span_weeks
    FROM cl GROUP BY 1 ORDER BY demand_class
    """,
)
def part_cv2_adi_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A103 — Syntetos-Boylan demand classification: per part the
    average inter-demand interval ADI = span/(n−1) over floor-week
    demand buckets (A89's epoch discipline) and the squared
    coefficient of variation CV² = (n·Σd² − (Σd)²)/(Σd)² of demand
    sizes, cut at the standard 1.32 / 0.49 boundaries into the four
    quadrants — smooth (forecast with A45/A71), intermittent (A89's
    Croston), erratic, lumpy (safety stock, not forecasts).  The
    screen that says WHICH forecaster family each part belongs to.

    Determinism: NO doubles anywhere — both class cuts are exact
    integer cross-multiplications (span·100 >= 132·(n−1);
    100·(n·Σd²−(Σd)²) >= 49·(Σd)²), so quadrant assignment cannot
    drift.  Bound: d is part-week cents (~2e4 at sf1); (Σd)² per part
    ~1e13, well inside int64.

    Scale shape: one (part, week) hash aggregate absorbs the corpus,
    one part-keyed rollup (entity-bounded), one 4-row class
    aggregate."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"),
        F.expr(
            "cast(floor(datediff(cast(l_shipdate as date),"
            " date'1995-01-01') / 7) as long)"
        ).alias("week"),
        cents(F.col("l_quantity")).alias("qc"),
    )
    wk = li.groupBy("part", "week").agg(F.sum("qc").cast("long").alias("d"))
    p = (
        wk.groupBy("part")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("d").cast("long").alias("s1"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"),
            (F.max("week") - F.min("week")).cast("long").alias("span"),
        )
        .where(F.col("n") >= 2)
    )
    cl = p.select(
        "n",
        "span",
        (F.col("span") * 100 >= 132 * (F.col("n") - 1)).alias("slow"),
        (
            100 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            >= 49 * F.col("s1") * F.col("s1")
        ).alias("variable"),
    )
    demand_class = (
        F.when(~F.col("slow") & ~F.col("variable"), "smooth")
        .when(F.col("slow") & ~F.col("variable"), "intermittent")
        .when(~F.col("slow") & F.col("variable"), "erratic")
        .otherwise("lumpy")
    )
    return (
        cl.groupBy(demand_class.alias("demand_class"))
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("n").cast("long").alias("n_demand_points"),
            F.sum("span").cast("long").alias("sum_span_weeks"),
        )
        .orderBy("demand_class")
    )


# ---------------------------------------------------------------------------
# A104: Page-Hinkley drift detection on the daily purchase mean
# ---------------------------------------------------------------------------

_PH_LAMBDA = 20000  # milli-cents


@query(
    "events_page_hinkley",
    f"""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    m AS (
      SELECT day, n, CAST(s * 1000 // n AS BIGINT) AS m_milli FROM d
    ),
    r AS (
      SELECT day, n, m_milli,
             CAST(SUM(m_milli) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                  // ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS runmean
      FROM m
    ),
    c AS (
      SELECT day, n, m_milli,
             CAST(SUM(m_milli - runmean) OVER (ORDER BY day
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM r
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n, m_milli,
      CAST(cum - MIN(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS ph_milli,
      (cum - MIN(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING))
        > {_PH_LAMBDA} AS drift_flag
    FROM c ORDER BY day
    """,
)
def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A104 — Page-Hinkley change detection on the daily mean purchase
    value: PH_t = cum_t − min_{{i<=t}} cum_i with cum the running sum
    of deviations from the running mean; a day with PH above lambda
    (20 k milli-cents) flags an upward level shift.  The sequential
    drift test (Page 1954, Hinkley 1971) behind streaming model-input
    monitors — A38's SPRT tests a KNOWN alternative rate; PH detects
    an UNKNOWN mean shift.

    Determinism: the daily mean, running mean, deviations, cumulative
    sum and running minimum are ALL exact int64 (floor-division
    milli-cent means; both engines floor on non-negative operands);
    no doubles anywhere.

    Scale shape: one day-keyed hash aggregate absorbs the scan; every
    window runs over the calendar-bounded day table declared with
    bounded_single_group; readout one row per day."""
    d = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(cents(F.col("value"))).cast("long").alias("s"),
        )
    )
    m = bounded_single_group(  # calendar-bounded day table
        d.select("day", "n", F.expr("CAST(s * 1000 div n AS BIGINT)").alias("m_milli"))
    )
    w_cum = (
        Window.partitionBy("__opid")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_rn = Window.partitionBy("__opid").orderBy("day")
    r = m.select(
        "day",
        "n",
        "m_milli",
        "__opid",
        F.expr(
            "CAST(sum(m_milli) OVER (PARTITION BY __opid ORDER BY day"
            " ROWS UNBOUNDED PRECEDING) div row_number() OVER"
            " (PARTITION BY __opid ORDER BY day) AS BIGINT)"
        ).alias("runmean"),
    )
    c = r.select(
        "day",
        "n",
        "m_milli",
        "__opid",
        F.sum(F.col("m_milli") - F.col("runmean")).over(w_cum).cast("long").alias("cum"),
    )
    ph = (F.col("cum") - F.min("cum").over(w_cum)).cast("long")
    return c.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        "m_milli",
        ph.alias("ph_milli"),
        (ph > _PH_LAMBDA).alias("drift_flag"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# A105: per-user inter-event burstiness histogram
# ---------------------------------------------------------------------------

@query(
    "events_user_burstiness",
    """
    WITH g AS (
      SELECT user_id,
             CAST((epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id)) // 60000000 AS BIGINT) AS gap_min
      FROM events
    ),
    u AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap_min) AS BIGINT) AS s1,
             CAST(SUM(gap_min * gap_min) AS BIGINT) AS s2
      FROM g WHERE gap_min IS NOT NULL
      GROUP BY user_id HAVING COUNT(*) >= 2
    ),
    b AS (
      SELECT user_id,
             CAST(ROUND((SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE))
                         - CAST(s1 AS DOUBLE))
                        / (SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE))
                           + CAST(s1 AS DOUBLE)) * 1000) AS BIGINT) AS b_milli
      FROM u WHERE s1 > 0
    )
    SELECT CAST(LEAST(GREATEST((b_milli + 1000) // 100, 0), 19) AS BIGINT)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM b GROUP BY 1 ORDER BY bucket
    """,
)
def events_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A105 — Goh-Barabasi burstiness of each user's inter-event gap
    sequence: B = (σ − μ)/(σ + μ) over minute-quantized gaps, with the
    population-σ identity σ/μ = sqrt(n·Σg² − (Σg)²)/Σg so the n
    cancels and ONE sqrt per user suffices.  B → −1 is metronomic,
    B ≈ 0 Poisson, B → 1 bursty — the traffic-shape fingerprint that
    separates bots (periodic) from humans (bursty) next to Q12's
    rule-based bot score.  Read as a 20-bucket histogram over users.

    Determinism: gaps quantize to integer minutes; per-user moments
    are exact int64 (n·Σg² ~1e17 at sf1 — inside int64); B is one
    fixed double tree per user, milli-quantized, and bucket assignment
    is integer floor-division on the quantized value.

    Scale shape: one user-partitioned lag (the W-family shuffle), one
    user-keyed moment rollup (entity-bounded), one 20-row histogram
    aggregate — the entity table never sees a global window."""
    ev = _t(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = (
        ev.select(
            "user_id",
            (us - F.lag(us).over(w_u)).alias("gap_us"),
        )
        .where(F.col("gap_us").isNotNull())
        .select("user_id", F.expr("CAST(gap_us div 60000000 AS BIGINT)").alias("gap_min"))
    )
    u = (
        g.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("gap_min").cast("long").alias("s1"),
            F.sum(F.col("gap_min") * F.col("gap_min")).cast("long").alias("s2"),
        )
        .where((F.col("n") >= 2) & (F.col("s1") > 0))
    )
    sd = F.sqrt((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
    b_milli = F.round(
        (sd - F.col("s1").cast("double")) / (sd + F.col("s1").cast("double")) * 1000
    ).cast("long")
    return (
        u.select(b_milli.alias("b_milli"))
        .groupBy(
            F.expr(
                "CAST(LEAST(GREATEST((b_milli + 1000) div 100, 0), 19) AS BIGINT)"
            ).alias("bucket")
        )
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# A106: ABC x XYZ planning matrix over parts
# ---------------------------------------------------------------------------

@query(
    "part_abc_xyz_matrix",
    """
    WITH rev AS (
      SELECT l_partkey AS part,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM lineitem GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS total FROM rev),
    abc AS (
      SELECT part, rev_c,
             CASE WHEN SUM(rev_c) OVER (ORDER BY rev_c DESC, part
                       ROWS UNBOUNDED PRECEDING) * 1000000 // t.total <= 800000
                  THEN 'A'
                  WHEN SUM(rev_c) OVER (ORDER BY rev_c DESC, part
                       ROWS UNBOUNDED PRECEDING) * 1000000 // t.total <= 950000
                  THEN 'B' ELSE 'C' END AS abc_class
      FROM rev CROSS JOIN t
    ),
    mth AS (
      SELECT l_partkey AS part,
             date_trunc('month', CAST(l_shipdate AS DATE)) AS mon,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS d
      FROM lineitem GROUP BY 1, 2
    ),
    xyz AS (
      SELECT part,
             CASE WHEN COUNT(*) < 2 THEN 'Z'
                  WHEN 100 * (COUNT(*) * SUM(d * d) - SUM(d) * SUM(d))
                       < 25 * (COUNT(*) - 1) * SUM(d) * SUM(d) THEN 'X'
                  WHEN 100 * (COUNT(*) * SUM(d * d) - SUM(d) * SUM(d))
                       < 100 * (COUNT(*) - 1) * SUM(d) * SUM(d) THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM mth GROUP BY part
    )
    SELECT abc.abc_class, xyz.xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(abc.rev_c) AS BIGINT) AS revenue_cents
    FROM abc JOIN xyz ON abc.part = xyz.part
    GROUP BY 1, 2 ORDER BY abc_class, xyz_class
    """,
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A106 — the ABC x XYZ planning matrix over parts: ABC from the
    revenue Pareto (cumulative share cut at 80% / 95% over parts
    ranked by revenue — computed with the DISTRIBUTED prefix-sum
    device, operators/ranking.py:distributed_cumsum, because the part
    table is entity-scale) crossed with XYZ demand-variability classes
    (monthly-demand CV² cut at 0.5 / 1.0 via exact integer
    cross-multiplication with Bessel's n−1 — A51's cuts on CV map to
    CV² cuts 0.25 / 1.0 on the variance ratio).  The 9-cell readout
    every inventory/sourcing policy table starts from — and the join
    A33's and A51's docstrings promise.

    Determinism: exact int64 sums; the Pareto boundary is integer ppm
    floor-division; XYZ cuts are integer cross-multiplications (no
    sqrt — comparing CV² avoids it); parts with a single demand month
    are Z by definition.

    Scale shape: two part-keyed hash aggregates absorb the corpus
    (revenue, monthly demand), one distributed prefix-sum over the
    part-revenue table, one part-keyed equi-join, one 9-row
    aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(cents(F.col("l_extendedprice"))).cast("long").alias("rev_c")
    )
    t = rev.agg(F.sum("rev_c").cast("long").alias("total"))
    cum = distributed_cumsum(
        rev, [F.col("rev_c").desc(), F.col("part").asc()], "rev_c", cum_col="cum"
    )
    abc = cum.crossJoin(F.broadcast(t)).select(
        "part",
        "rev_c",
        F.when(F.expr("cum * 1000000 div total") <= 800000, "A")
        .when(F.expr("cum * 1000000 div total") <= 950000, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    mth = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.date_trunc("month", F.col("l_shipdate").cast("date")).alias("mon"),
    ).agg(F.sum(cents(F.col("l_quantity"))).cast("long").alias("d"))
    x = mth.groupBy("part").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("s1"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"),
    )
    var_num = 100 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
    mean_sq = (F.col("n") - 1) * F.col("s1") * F.col("s1")
    xyz = x.select(
        "part",
        F.when(F.col("n") < 2, "Z")
        .when(var_num < 25 * mean_sq, "X")
        .when(var_num < 100 * mean_sq, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, "part")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev_c").cast("long").alias("revenue_cents"),
        )
        .orderBy("abc_class", "xyz_class")
    )


# ---------------------------------------------------------------------------
# EV28: Spiegelhalter's Z calibration test
# ---------------------------------------------------------------------------

@query(
    "eval_spiegelhalter_z",
    f"""
    WITH s AS (
      SELECT {_H60_DUCK.format("'p:' || CAST(vec_id AS VARCHAR)")} % 1000001
               AS pm,
             CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
      FROM embeddings
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((y * 1000000 - pm) * (1000000 - 2 * pm)) AS BIGINT)
               AS num,
             CAST(SUM(CAST(ROUND(
               (CAST(1000000 - 2 * pm AS DOUBLE) / 1000000.0)
               * (CAST(1000000 - 2 * pm AS DOUBLE) / 1000000.0)
               * (CAST(pm AS DOUBLE) / 1000000.0)
               * (1.0 - CAST(pm AS DOUBLE) / 1000000.0) * 1000000000000.0)
               AS BIGINT)) AS BIGINT) AS den_q
      FROM s
    )
    SELECT n, num, den_q,
      CASE WHEN den_q > 0 THEN
        CAST(ROUND(CAST(num AS DOUBLE) / SQRT(CAST(den_q AS DOUBLE)))
             AS BIGINT)
      ELSE NULL END AS z_micro,
      CASE WHEN den_q > 0 THEN
        ABS(CAST(ROUND(CAST(num AS DOUBLE) / SQRT(CAST(den_q AS DOUBLE)))
            AS BIGINT)) < 1960000
      ELSE NULL END AS well_calibrated
    FROM m
    """,
)
def eval_spiegelhalter_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV28 — Spiegelhalter's Z test of calibration: with predicted
    probabilities p_i and outcomes y_i,
    Z = Σ(y_i − p_i)(1 − 2p_i) / sqrt(Σ(1 − 2p_i)² p_i (1 − p_i)) —
    mean-zero unit-variance under perfect calibration, so |Z| < 1.96
    passes at 5%.  EV3's reliability diagram SHOWS miscalibration;
    this is the significance test that says whether the wiggle is
    noise.  Probabilities are the pinned md5-uniform proxy (the eval
    family's fold-assignment construction) over the embeddings
    fixture, label 0 = positive.

    Determinism: the numerator is EXACT int64 in micro² units
    (|term| <= 1e12/row — inside int64 to ~9e6 rows… at larger scale
    swap micro for milli); each denominator term quantizes to an
    integer 1e-12 grid BEFORE the sum; Z is one fixed double tree,
    micro-quantized.  NULL (not a fake pass) when the denominator
    degenerates.

    Scale shape: one map-side-combinable scalar aggregate; readout 1
    row."""
    s = _t(spark, sf_dir, "embeddings").select(
        (
            _h60(F.concat(F.lit("p:"), F.col("vec_id").cast("string"))) % 1000001
        ).alias("pm"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
    )
    den_term = F.round(
        ((1000000 - 2 * F.col("pm")).cast("double") / 1000000.0)
        * ((1000000 - 2 * F.col("pm")).cast("double") / 1000000.0)
        * (F.col("pm").cast("double") / 1000000.0)
        * (1.0 - F.col("pm").cast("double") / 1000000.0)
        * 1000000000000.0
    ).cast("long")
    m = s.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("y") * 1000000 - F.col("pm")) * (1000000 - 2 * F.col("pm")))
        .cast("long")
        .alias("num"),
        F.sum(den_term).cast("long").alias("den_q"),
    )
    # units: num carries 1e12 (micro^2), den_q carries 1e12 — so
    # Z = num / (1e6 * sqrt(den_q)) and z_micro = round(num/sqrt(den_q))
    z = F.round(
        F.col("num").cast("double") / F.sqrt(F.col("den_q").cast("double"))
    ).cast("long")
    return m.select(
        "n",
        "num",
        "den_q",
        F.when(F.col("den_q") > 0, z).otherwise(F.lit(None).cast("long")).alias(
            "z_micro"
        ),
        F.when(F.col("den_q") > 0, F.abs(z) < 1960000)
        .otherwise(F.lit(None).cast("boolean"))
        .alias("well_calibrated"),
    )


# ---------------------------------------------------------------------------
# EV29: top-k accuracy of a pinned 5-class score model
# ---------------------------------------------------------------------------

_TOPK_CLASSES = ("click", "error", "purchase", "signup", "view")
_TOPK_BOOST = 250000


@query(
    "eval_topk_accuracy",
    f"""
    WITH r AS (
      SELECT event_id, event_type,
             1 + len([c FOR c IN {list(_TOPK_CLASSES)!r} IF c != event_type AND
               (({_H60_DUCK.format("'cls:' || CAST(event_id AS VARCHAR) || ':' || c")} % 1000000)
                > ({_H60_DUCK.format("'cls:' || CAST(event_id AS VARCHAR) || ':' || event_type")} % 1000000) + {_TOPK_BOOST}
                OR (({_H60_DUCK.format("'cls:' || CAST(event_id AS VARCHAR) || ':' || c")} % 1000000)
                    = ({_H60_DUCK.format("'cls:' || CAST(event_id AS VARCHAR) || ':' || event_type")} % 1000000) + {_TOPK_BOOST}
                    AND c < event_type))]) AS rnk
      FROM events
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN rnk <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
             CAST(SUM(CASE WHEN rnk <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
             CAST(SUM(CASE WHEN rnk <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3
      FROM r
    )
    SELECT CAST(1 AS BIGINT) AS k, h1 AS n_hits,
           CAST(h1 * 1000000 // n AS BIGINT) AS accuracy_ppm FROM t
    UNION ALL
    SELECT 2, h2, CAST(h2 * 1000000 // n AS BIGINT) FROM t
    UNION ALL
    SELECT 3, h3, CAST(h3 * 1000000 // n AS BIGINT) FROM t
    ORDER BY k
    """,
)
def eval_topk_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV29 — top-k accuracy (k = 1, 2, 3) of a pinned 5-class
    scoring model: per event the true class is event_type; each
    class's score is the md5-uniform hash of (event_id, class) with a
    +0.25 boost on the true class (so the model is right more often
    than chance but not always — the interesting regime).  The true
    class's rank is 1 + the number of classes strictly outranking it
    under the unique (score desc, class asc) order; top-k accuracy is
    the share of events with rank <= k.  The multi-class companion of
    EV9's confusion matrix (which is argmax-only = k=1 by class).

    Determinism: integer scores, deterministic tiebreak by class
    name, exact integer counts, floor-division ppm.

    Scale shape: the rank is computed INLINE per row (no explode, no
    join, no shuffle of scores); one scalar aggregate; readout 3
    rows.  (r11: the 5-class rank is UNROLLED to named per-class
    score columns and a codegen when-chain — the array higher-order
    filter ran interpreted and re-derived the true score per element,
    8 md5s/row instead of 6, and the events scan is spread to session
    parallelism, the single-row-group fixture having pinned the md5
    work to one task.  Same hashes, same comparisons, same counts.)"""
    from bytesprocessor_spark.sources.tables import spread_scan

    ev = spread_scan(_t(spark, sf_dir, "events"), "event_id")

    def score(cls_expr):
        return (
            _h60(
                F.concat(
                    F.lit("cls:"),
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    cls_expr,
                )
            )
            % 1000000
        )

    base = ev.select(
        "event_type",
        *[score(F.lit(c)).alias(f"s{i}") for i, c in enumerate(_TOPK_CLASSES)],
        (score(F.col("event_type")) + _TOPK_BOOST).alias("ts"),
    )
    ind = [
        F.when(
            (F.lit(c) != F.col("event_type"))
            & (
                (F.col(f"s{i}") > F.col("ts"))
                | (
                    (F.col(f"s{i}") == F.col("ts"))
                    & (F.lit(c) < F.col("event_type"))
                )
            ),
            1,
        ).otherwise(0)
        for i, c in enumerate(_TOPK_CLASSES)
    ]
    rnk = F.lit(1) + sum(ind[1:], ind[0])
    r = base.select(rnk.alias("rnk"))
    t = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("rnk") <= 1, 1).otherwise(0)).cast("long").alias("h1"),
        F.sum(F.when(F.col("rnk") <= 2, 1).otherwise(0)).cast("long").alias("h2"),
        F.sum(F.when(F.col("rnk") <= 3, 1).otherwise(0)).cast("long").alias("h3"),
    )
    return t.selectExpr(
        "stack(3, 1L, h1, CAST(h1 * 1000000 div n AS BIGINT),"
        " 2L, h2, CAST(h2 * 1000000 div n AS BIGINT),"
        " 3L, h3, CAST(h3 * 1000000 div n AS BIGINT))"
        " AS (k, n_hits, accuracy_ppm)"
    ).orderBy("k")


# ---------------------------------------------------------------------------
# L30: per-source log2 document-length profile
# ---------------------------------------------------------------------------

@query(
    "corpus_length_profile",
    """
    WITH b AS (
      SELECT source,
             CAST(FLOOR(LOG2(CAST(GREATEST(n_chars, 1) AS DOUBLE))) AS BIGINT)
               AS bucket,
             CAST(n_chars AS BIGINT) AS n_chars
      FROM documents
    ),
    h AS (
      SELECT source, bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM b GROUP BY 1, 2
    ),
    t AS (
      SELECT source, CAST(SUM(chars) AS BIGINT) AS src_chars
      FROM h GROUP BY source
    )
    SELECT h.source, h.bucket, h.n_docs, h.chars,
           CAST(h.chars * 1000000 // t.src_chars AS BIGINT) AS char_share_ppm
    FROM h JOIN t ON h.source = t.source
    ORDER BY h.source, h.bucket
    """,
)
def corpus_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L30 — per-source document-length profile in log2 buckets
    (floor(log2(n_chars))): doc counts, char mass and the char-mass
    share of each bucket within its source.  The shard-sizing /
    truncation-policy readout a training pipeline takes before
    sequence packing (L6) — a source whose mass sits in bucket 14+
    needs long-context packing; one concentrated at bucket 6 is
    padding waste.

    Determinism: log2 of an integer is exact at powers of two and
    floor is stable everywhere else (both engines IEEE log2); counts
    and shares are exact integers.

    Scale shape: bucket is a map expression on the scan; one
    (source, bucket) hash aggregate (map-side combinable), one
    source-keyed rollup joined back broadcast; readout is
    sources x <=20 buckets."""
    docs = _t(spark, sf_dir, "documents")
    b = docs.select(
        "source",
        F.floor(F.log2(F.greatest(F.col("n_chars"), F.lit(1)).cast("double")))
        .cast("long")
        .alias("bucket"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    h = b.groupBy("source", "bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    t = h.groupBy("source").agg(F.sum("chars").cast("long").alias("src_chars"))
    return (
        h.join(F.broadcast(t), "source")
        .select(
            "source",
            "bucket",
            "n_docs",
            "chars",
            F.expr("CAST(chars * 1000000 div src_chars AS BIGINT)").alias(
                "char_share_ppm"
            ),
        )
        .orderBy("source", "bucket")
    )


# ---------------------------------------------------------------------------
# GR12: common-neighbor Jaccard link scores (top-20)
# ---------------------------------------------------------------------------

_JAC_TOPK = 20


@query(
    "graph_jaccard_linkpred",
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
    e AS (
      SELECT a AS u, b AS v FROM e0
      UNION ALL SELECT b AS u, a AS v FROM e0
    ),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY u),
    cn AS (
      SELECT e1.u AS a, e2.u AS b, CAST(COUNT(*) AS BIGINT) AS c
      FROM e e1 JOIN e e2 ON e1.v = e2.v AND e1.u < e2.u
      GROUP BY 1, 2
    ),
    sc AS (
      SELECT cn.a, cn.b, cn.c, da.d AS deg_a, db.d AS deg_b,
             CAST(cn.c * 1000000 // (da.d + db.d - cn.c) AS BIGINT)
               AS jaccard_ppm
      FROM cn JOIN deg da ON cn.a = da.u JOIN deg db ON cn.b = db.u
    )
    SELECT a, b, c AS common_neighbors, deg_a, deg_b, jaccard_ppm
    FROM sc
    ORDER BY jaccard_ppm DESC, a, b LIMIT {_JAC_TOPK}
    """,
)
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR12 — common-neighbor Jaccard link scores over the supplier
    co-occurrence graph: J(a, b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
    for every pair sharing at least one neighbor, top-{_JAC_TOPK}.
    GR6's Adamic-Adar weights rare neighbors; Jaccard NORMALIZES by
    both degrees — high-degree hubs stop dominating, which is the
    right read for "are these two suppliers substitutes" (same
    neighborhoods) vs "do they co-occur a lot".

    Edge rule: the shared-neighbor join is Σ deg(v)² — on the
    near-complete co-supplier graph that is O(|V|³), for BOTH engines
    — so the graph is first cut to the STRONG edges (GR10's
    deterministic rank-cut discipline: top 10% of pairs by co-order
    weight, floor 10 edges so tiny fixtures keep their structure),
    computed with the DISTRIBUTED rank device.

    Determinism: exact integer neighbor counts, floor-division ppm,
    full (score desc, a, b) tiebreak on the top-k, rank cut over the
    unique (w desc, a, b) order.

    Scale shape: GR3's oriented edge enumeration + pair-weight
    aggregate, the distributed rank cut, one shared-neighbor equi
    self-join (now bounded by the PRUNED Σ deg(v)²), two degree
    joins, TakeOrdered top-{_JAC_TOPK}; integer keys only in every
    shuffle."""
    # r11: the 10% rank cut is the memoized supplier_strong_edges
    # table (shared verbatim with rich_club and ktruss) — the
    # distributed-rank pass is paid once per session, not per entry
    from bytesprocessor_spark.operators.graph import supplier_strong_edges

    e0 = supplier_strong_edges(spark, sf_dir).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    )
    e = e0.unionAll(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = e.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    e1, e2 = e.alias("e1"), e.alias("e2")
    cn = (
        e1.join(e2, (F.col("e1.v") == F.col("e2.v")) & (F.col("e1.u") < F.col("e2.u")))
        .groupBy(F.col("e1.u").alias("a"), F.col("e2.u").alias("b"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    sc = (
        cn.join(deg.select(F.col("u").alias("a"), F.col("d").alias("deg_a")), "a")
        .join(deg.select(F.col("u").alias("b"), F.col("d").alias("deg_b")), "b")
        .select(
            "a",
            "b",
            F.col("c").alias("common_neighbors"),
            "deg_a",
            "deg_b",
            F.expr(
                "CAST(c * 1000000 div (deg_a + deg_b - c) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )
    return sc.orderBy(F.col("jaccard_ppm").desc(), "a", "b").limit(_JAC_TOPK)


# ---------------------------------------------------------------------------
# ST22: streaming Page-Hinkley drift monitor
# ---------------------------------------------------------------------------

@query(
    "stream_page_hinkley",
    # same readout as the batch A104 row: the drained per-day state
    # must reproduce it exactly (integer day aggregates are
    # micro-batch-order independent)
    f"""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    m AS (
      SELECT day, n, CAST(s * 1000 // n AS BIGINT) AS m_milli FROM d
    ),
    r AS (
      SELECT day, n, m_milli,
             CAST(SUM(m_milli) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                  // ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS runmean
      FROM m
    ),
    c AS (
      SELECT day, n, m_milli,
             CAST(SUM(m_milli - runmean) OVER (ORDER BY day
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM r
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n, m_milli,
      CAST(cum - MIN(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS ph_milli,
      (cum - MIN(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING))
        > {_PH_LAMBDA} AS drift_flag
    FROM c ORDER BY day
    """,
)
def stream_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST22 — A104's Page-Hinkley drift detector deployed as a
    STREAM: per-day (count, value-sum) accumulates in streaming
    aggregation state across micro-batches; the PH replay (running
    mean, cumulative deviation, running minimum — all exact int64)
    runs on the drained sink, so the result is micro-batch-order
    independent and must equal the batch row bit-for-bit.

    Scale: state is O(days) (calendar-bounded); each micro-batch
    shuffles only its own rows to their day's state partition; the
    drained replay is the A104 bounded-window plan."""
    from bytesprocessor_spark.queries_streaming import (
        _drain_and_localize,
        _landing_dir,
    )

    land, batch = _landing_dir(spark, sf_dir, "events")
    try:
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(land, "events"))
        )
        daily = (
            stream.where(F.col("event_type") == "purchase")
            .groupBy(F.col("ts").cast("date").alias("day"))
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(cents(F.col("value"))).cast("long").alias("s"),
            )
        )

        def finish(sink_df: DataFrame) -> DataFrame:
            m = bounded_single_group(
                sink_df.select(
                    "day",
                    "n",
                    F.expr("CAST(s * 1000 div n AS BIGINT)").alias("m_milli"),
                )
            )
            w_cum = (
                Window.partitionBy("__opid")
                .orderBy("day")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            r = m.select(
                "day",
                "n",
                "m_milli",
                "__opid",
                F.expr(
                    "CAST(sum(m_milli) OVER (PARTITION BY __opid ORDER BY day"
                    " ROWS UNBOUNDED PRECEDING) div row_number() OVER"
                    " (PARTITION BY __opid ORDER BY day) AS BIGINT)"
                ).alias("runmean"),
            )
            c = r.select(
                "day",
                "n",
                "m_milli",
                "__opid",
                F.sum(F.col("m_milli") - F.col("runmean"))
                .over(w_cum)
                .cast("long")
                .alias("cum"),
            )
            ph = (F.col("cum") - F.min("cum").over(w_cum)).cast("long")
            return c.select(
                F.date_format("day", "yyyy-MM-dd").alias("day"),
                "n",
                "m_milli",
                ph.alias("ph_milli"),
                (ph > _PH_LAMBDA).alias("drift_flag"),
            ).orderBy("day")

        return _drain_and_localize(daily, finish, output_mode="complete")
    finally:
        shutil.rmtree(land, ignore_errors=True)


# ---------------------------------------------------------------------------
# EV30: DeLong variance / confidence interval for ROC-AUC
# ---------------------------------------------------------------------------

@query(
    "eval_auc_delong_ci",
    """
    WITH s AS (
      SELECT CAST('0x' || substr(md5('dl:' || CAST(vec_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 1000000 AS score,
             CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
      FROM embeddings
    ),
    g AS (
      SELECT score, CAST(SUM(y) AS BIGINT) AS p,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n
      FROM s GROUP BY score
    ),
    c AS (
      SELECT p, n,
             CAST(COALESCE(SUM(n) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cumn,
             CAST(COALESCE(SUM(p) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cump,
             CAST(SUM(p) OVER () AS BIGINT) AS pp,
             CAST(SUM(n) OVER () AS BIGINT) AS nn
      FROM g
    ),
    m AS (
      SELECT CAST(MAX(pp) AS BIGINT) AS pp, CAST(MAX(nn) AS BIGINT) AS nn,
             CAST(SUM(p * (2 * cumn + n)) AS BIGINT) AS a1,
             CAST(SUM(p * (2 * cumn + n) * (2 * cumn + n)) AS BIGINT) AS a2,
             CAST(SUM(n * (2 * (pp - cump) - p)) AS BIGINT) AS b1,
             CAST(SUM(n * (2 * (pp - cump) - p) * (2 * (pp - cump) - p))
                  AS BIGINT) AS b2
      FROM c
    )
    SELECT pp AS n_pos, nn AS n_neg,
      CASE WHEN pp > 1 AND nn > 1 THEN
        CAST(ROUND(CAST(a1 AS DOUBLE)
             / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE)) * 1000000)
             AS BIGINT) ELSE NULL END AS auc_micro,
      CASE WHEN pp > 1 AND nn > 1 THEN
        CAST(ROUND(SQRT(
          ((CAST(a2 AS DOUBLE) / (4.0 * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
            - CAST(pp AS DOUBLE)
              * (CAST(a1 AS DOUBLE) / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE)))
              * (CAST(a1 AS DOUBLE) / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE))))
           / (CAST(pp AS DOUBLE) - 1.0)) / CAST(pp AS DOUBLE)
          + ((CAST(b2 AS DOUBLE) / (4.0 * CAST(pp AS DOUBLE) * CAST(pp AS DOUBLE))
              - CAST(nn AS DOUBLE)
                * (CAST(a1 AS DOUBLE) / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE)))
                * (CAST(a1 AS DOUBLE) / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE))))
             / (CAST(nn AS DOUBLE) - 1.0)) / CAST(nn AS DOUBLE)
        ) * 1000000) AS BIGINT) ELSE NULL END AS se_micro
    FROM m
    """,
)
def eval_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV30 — DeLong's variance for ROC-AUC: per-positive placement
    values v10 (fraction of negatives it outranks, ties half) and
    per-negative v01, with var(AUC) = S10/P + S01/N over their sample
    variances — the distribution-free CI behind "model A's AUC 0.91
    beats B's 0.89" claims (EV1 gives the point estimate; without
    this the comparison is noise).  Scores are the pinned md5-uniform
    proxy over embeddings, label 0 = positive.

    Exactness device: with score-grouped counts, 2N·v10 at a score is
    the INTEGER 2·cumn + n (and 2P·v01 = 2·(P − cump) − p), so the
    placement-value moments A1 = Σp·(2N·v10), A2 = Σp·(2N·v10)²,
    B1, B2 are EXACT int64 (A2 <= P·(2N)² ~ 4N³ — inside int64 to
    N ~ 1.3e6 ≈ sf10 on the embeddings table; past that swap the
    moment accumulators for decimal(38)); AUC = A1/(2PN) (identical
    to EV1's
    rank-sum), and se is one fixed double tree over the six integers,
    micro-quantized; NULL when either class has < 2 members.

    Scale shape: one partial agg collapses the corpus to the
    distinct-score table (bounded by the 1e6 score domain, declared
    with bounded_single_group), prefix windows + one scalar rollup."""
    s = _t(spark, sf_dir, "embeddings").select(
        (
            _h60(F.concat(F.lit("dl:"), F.col("vec_id").cast("string"))) % 1000000
        ).alias("score"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
    )
    g = s.groupBy("score").agg(
        F.sum("y").cast("long").alias("p"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n"),
    )
    g = bounded_single_group(g)  # score-domain-bounded table
    w_prev = (
        Window.partitionBy("__opid")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("__opid")
    c = g.select(
        "p",
        "n",
        F.coalesce(F.sum("n").over(w_prev), F.lit(0)).cast("long").alias("cumn"),
        F.coalesce(F.sum("p").over(w_prev), F.lit(0)).cast("long").alias("cump"),
        F.sum("p").over(w_tot).cast("long").alias("pp"),
        F.sum("n").over(w_tot).cast("long").alias("nn"),
    )
    v10 = 2 * F.col("cumn") + F.col("n")
    v01 = 2 * (F.col("pp") - F.col("cump")) - F.col("p")
    m = c.agg(
        F.max("pp").cast("long").alias("pp"),
        F.max("nn").cast("long").alias("nn"),
        F.sum(F.col("p") * v10).cast("long").alias("a1"),
        F.sum(F.col("p") * v10 * v10).cast("long").alias("a2"),
        F.sum(F.col("n") * v01).cast("long").alias("b1"),
        F.sum(F.col("n") * v01 * v01).cast("long").alias("b2"),
    )
    ppD, nnD = F.col("pp").cast("double"), F.col("nn").cast("double")
    auc = F.col("a1").cast("double") / (2.0 * ppD * nnD)
    s10 = (
        F.col("a2").cast("double") / (4.0 * nnD * nnD) - ppD * auc * auc
    ) / (ppD - 1.0)
    s01 = (
        F.col("b2").cast("double") / (4.0 * ppD * ppD) - nnD * auc * auc
    ) / (nnD - 1.0)
    se = F.sqrt(s10 / ppD + s01 / nnD)
    ok = (F.col("pp") > 1) & (F.col("nn") > 1)
    return m.select(
        F.col("pp").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.when(ok, F.round(auc * 1000000).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("auc_micro"),
        F.when(ok, F.round(se * 1000000).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("se_micro"),
    )


# ---------------------------------------------------------------------------
# EV31: exact average precision (PR-AUC by the step definition)
# ---------------------------------------------------------------------------

@query(
    "eval_average_precision",
    """
    WITH s AS (
      SELECT CAST('0x' || substr(md5('dl:' || CAST(vec_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 1000000 AS score,
             CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
      FROM embeddings
    ),
    g AS (
      SELECT score, CAST(SUM(y) AS BIGINT) AS p,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n
      FROM s GROUP BY score
    ),
    c AS (
      SELECT p,
             CAST(SUM(p) OVER (ORDER BY score DESC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
             CAST(SUM(n) OVER (ORDER BY score DESC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp,
             CAST(SUM(p) OVER () AS BIGINT) AS pp,
             CAST(SUM(n) OVER () AS BIGINT) AS nn
      FROM g
    )
    SELECT CAST(MAX(pp) AS BIGINT) AS n_pos, CAST(MAX(nn) AS BIGINT) AS n_neg,
           CAST(SUM(p * tp * 1000000 // (tp + fp)) // MAX(pp) AS BIGINT)
             AS ap_ppm
    FROM c
    """,
)
def eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV31 — exact average precision (the step-function PR-AUC):
    AP = Σ_blocks ΔR·P = Σ over distinct scores (desc) of
    (p_s / P) · tp_s / (tp_s + fp_s), with ties handled as one block
    (the sklearn 'average_precision' convention).  EV2's pr_curve
    samples 11 thresholds; this integrates the EXACT curve — the
    right scalar when positives are rare and ROC-AUC (EV1/EV30)
    flatters.  Same pinned score proxy as EV30, so the pair reads
    together.

    Determinism: per-block precision quantizes by integer floor
    division BEFORE the sum (p·tp·1e6 div (tp+fp) <= P²·1e6 — exact
    int64 to P ~ 3e6 ≈ sf20 embeddings; decimal(38) past that),
    final ppm one more floor division.

    Scale shape: one partial agg to the score-domain-bounded table
    (bounded_single_group), two prefix windows, one scalar rollup."""
    s = _t(spark, sf_dir, "embeddings").select(
        (
            _h60(F.concat(F.lit("dl:"), F.col("vec_id").cast("string"))) % 1000000
        ).alias("score"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
    )
    g = s.groupBy("score").agg(
        F.sum("y").cast("long").alias("p"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n"),
    )
    g = bounded_single_group(g)  # score-domain-bounded table
    w_desc = (
        Window.partitionBy("__opid")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("__opid")
    c = g.select(
        "p",
        F.sum("p").over(w_desc).cast("long").alias("tp"),
        F.sum("n").over(w_desc).cast("long").alias("fp"),
        F.sum("p").over(w_tot).cast("long").alias("pp"),
        F.sum("n").over(w_tot).cast("long").alias("nn"),
    )
    return c.agg(
        F.max("pp").cast("long").alias("n_pos"),
        F.max("nn").cast("long").alias("n_neg"),
        F.expr(
            "CAST(sum(p * tp * 1000000 div (tp + fp)) div max(pp) AS BIGINT)"
        ).alias("ap_ppm"),
    )


# ---------------------------------------------------------------------------
# FE7: out-of-fold (leakage-safe) target encoding
# ---------------------------------------------------------------------------

_OOF_FOLDS, _OOF_M = 5, 20


@query(
    "orders_target_encoding_oof",
    f"""
    WITH o AS (
      SELECT o_orderpriority AS cat,
             CAST('0x' || substr(md5('fold:' || CAST(o_orderkey AS VARCHAR)),
                  1, 15) AS BIGINT) % {_OOF_FOLDS} AS fold,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS t
      FROM orders
    ),
    cell AS (
      SELECT cat, fold, CAST(COUNT(*) AS BIGINT) AS n_cf,
             CAST(SUM(t) AS BIGINT) AS s_cf
      FROM o GROUP BY 1, 2
    ),
    w AS (
      SELECT cat, fold, n_cf, s_cf,
             CAST(SUM(n_cf) OVER (PARTITION BY cat) AS BIGINT) AS n_c,
             CAST(SUM(s_cf) OVER (PARTITION BY cat) AS BIGINT) AS s_c,
             CAST(SUM(n_cf) OVER (PARTITION BY fold) AS BIGINT) AS n_f,
             CAST(SUM(s_cf) OVER (PARTITION BY fold) AS BIGINT) AS s_f,
             CAST(SUM(n_cf) OVER () AS BIGINT) AS n_tot,
             CAST(SUM(s_cf) OVER () AS BIGINT) AS s_tot
      FROM cell
    )
    SELECT cat AS priority, fold, n_cf AS n_rows,
      CAST(ROUND(
        (CAST(s_c - s_cf AS DOUBLE)
         + {_OOF_M}.0 * CAST(s_tot - s_f AS DOUBLE) / CAST(n_tot - n_f AS DOUBLE))
        / (CAST(n_c - n_cf AS DOUBLE) + {_OOF_M}.0) * 1000) AS BIGINT)
        AS enc_cents_milli
    FROM w ORDER BY priority, fold
    """,
)
def orders_target_encoding_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FE7 — OUT-OF-FOLD target encoding: each (category, fold) cell
    is encoded with the smoothed target mean computed from the OTHER
    folds only — enc = (S_c − S_cf + m·μ_−f) / (n_c − n_cf + m) with
    the global prior μ_−f itself fold-excluded.  FE2's plain target
    encoding leaks the row's own label into its feature (optimistic
    CV, collapses on rare categories); this is the leakage-safe
    variant every gradient-boosting pipeline actually ships, and the
    FE sibling of EV4's GroupKFold / L10's leakage-safe split.

    Determinism: md5 fold assignment, exact int64 cell sums, every
    marginal from windows over the 25-row cell table (one plan — no
    re-aggregation of the scan), one fixed double tree milli-
    quantized.

    Scale shape: one (category, fold) hash aggregate absorbs the
    corpus; everything after runs on k·K rows (bounded_single_group);
    readout 25 rows."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("cat"),
        (
            _h60(F.concat(F.lit("fold:"), F.col("o_orderkey").cast("string")))
            % _OOF_FOLDS
        ).alias("fold"),
        cents(F.col("o_totalprice")).alias("t"),
    )
    cell = o.groupBy("cat", "fold").agg(
        F.count("*").cast("long").alias("n_cf"),
        F.sum("t").cast("long").alias("s_cf"),
    )
    cell = bounded_single_group(cell)  # k x K bounded cell table
    w_c = Window.partitionBy("cat")
    w_f = Window.partitionBy("fold")
    w_t = Window.partitionBy("__opid")
    w = cell.select(
        "cat",
        "fold",
        "n_cf",
        "s_cf",
        F.sum("n_cf").over(w_c).cast("long").alias("n_c"),
        F.sum("s_cf").over(w_c).cast("long").alias("s_c"),
        F.sum("n_cf").over(w_f).cast("long").alias("n_f"),
        F.sum("s_cf").over(w_f).cast("long").alias("s_f"),
        F.sum("n_cf").over(w_t).cast("long").alias("n_tot"),
        F.sum("s_cf").over(w_t).cast("long").alias("s_tot"),
    )
    mu_excl = (F.col("s_tot") - F.col("s_f")).cast("double") / (
        F.col("n_tot") - F.col("n_f")
    ).cast("double")
    enc = (
        (F.col("s_c") - F.col("s_cf")).cast("double") + float(_OOF_M) * mu_excl
    ) / ((F.col("n_c") - F.col("n_cf")).cast("double") + float(_OOF_M))
    return w.select(
        F.col("cat").alias("priority"),
        "fold",
        F.col("n_cf").alias("n_rows"),
        F.round(enc * 1000).cast("long").alias("enc_cents_milli"),
    ).orderBy("priority", "fold")


# ---------------------------------------------------------------------------
# A107: Mantel-Haenszel pooled odds ratio across day strata
# ---------------------------------------------------------------------------

@query(
    "events_odds_ratio_mh",
    """
    WITH e AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(user_id % 2 AS BIGINT) AS exposed,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    st AS (
      SELECT day,
             CAST(SUM(CASE WHEN exposed = 1 AND hit = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN exposed = 1 AND hit = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN exposed = 0 AND hit = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN exposed = 0 AND hit = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM e GROUP BY day
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             CAST(SUM(a) AS BIGINT) AS aa, CAST(SUM(b) AS BIGINT) AS bb,
             CAST(SUM(c) AS BIGINT) AS cc, CAST(SUM(d) AS BIGINT) AS dd,
             CAST(SUM(a * d * 1000000 // (a + b + c + d)) AS BIGINT) AS t1,
             CAST(SUM(b * c * 1000000 // (a + b + c + d)) AS BIGINT) AS t2
      FROM st WHERE a + b + c + d > 0
    )
    SELECT n_strata, aa AS n_exposed_hit, cc AS n_unexposed_hit,
      CASE WHEN t2 > 0 THEN
        CAST(ROUND(CAST(t1 AS DOUBLE) / CAST(t2 AS DOUBLE) * 1000) AS BIGINT)
      ELSE NULL END AS or_mh_milli,
      CASE WHEN bb > 0 AND cc > 0 THEN
        CAST(ROUND(CAST(aa AS DOUBLE) * CAST(dd AS DOUBLE)
             / (CAST(bb AS DOUBLE) * CAST(cc AS DOUBLE)) * 1000) AS BIGINT)
      ELSE NULL END AS or_crude_milli
    FROM m
    """,
)
def events_odds_ratio_mh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A107 — Mantel-Haenszel pooled odds ratio across DAY strata for
    the (user-parity exposure) x (purchase outcome) 2x2 tables:
    OR_MH = Σ a_i·d_i/n_i / Σ b_i·c_i/n_i — the stratification-robust
    pooled effect that stays honest when daily traffic mix shifts,
    next to the crude pooled OR whose disagreement with it is the
    Simpson's-paradox alarm (A44's DiD is the continuous-outcome
    sibling; this is the classic discrete one).

    Determinism: per-stratum MH terms quantize by integer floor
    division BEFORE the sum (a·d·1e6 div n — exact int64: a·d ~1e9 at
    sf1 daily volumes, x1e6 inside int64); both ratios are single
    double divisions of exact integers, milli-quantized; NULL (not a
    crash) on degenerate margins.

    Scale shape: one day-keyed hash aggregate absorbs the scan; one
    scalar rollup over the calendar-bounded stratum table; readout 1
    row."""
    e = _t(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        (F.col("user_id") % 2).cast("long").alias("exposed"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("hit"),
    )
    st = e.groupBy("day").agg(
        F.sum(F.when((F.col("exposed") == 1) & (F.col("hit") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("exposed") == 1) & (F.col("hit") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("exposed") == 0) & (F.col("hit") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("exposed") == 0) & (F.col("hit") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    tot = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    m = st.where(tot > 0).agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("aa"),
        F.sum("b").cast("long").alias("bb"),
        F.sum("c").cast("long").alias("cc"),
        F.sum("d").cast("long").alias("dd"),
        F.sum(F.expr("a * d * 1000000 div (a + b + c + d)"))
        .cast("long")
        .alias("t1"),
        F.sum(F.expr("b * c * 1000000 div (a + b + c + d)"))
        .cast("long")
        .alias("t2"),
    )
    or_mh = F.round(F.col("t1").cast("double") / F.col("t2").cast("double") * 1000).cast(
        "long"
    )
    or_crude = F.round(
        F.col("aa").cast("double")
        * F.col("dd").cast("double")
        / (F.col("bb").cast("double") * F.col("cc").cast("double"))
        * 1000
    ).cast("long")
    return m.select(
        "n_strata",
        F.col("aa").alias("n_exposed_hit"),
        F.col("cc").alias("n_unexposed_hit"),
        F.when(F.col("t2") > 0, or_mh).otherwise(F.lit(None).cast("long")).alias(
            "or_mh_milli"
        ),
        F.when((F.col("bb") > 0) & (F.col("cc") > 0), or_crude)
        .otherwise(F.lit(None).cast("long"))
        .alias("or_crude_milli"),
    )


# ---------------------------------------------------------------------------
# A109: Bass diffusion fit on cumulative signups
# ---------------------------------------------------------------------------

_BASS_SCALE = 10  # adopter counts regress in units of 10 users


@query(
    "events_bass_diffusion",
    f"""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    c AS (
      SELECT day, n,
             CAST(COALESCE(SUM(n) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  // {_BASS_SCALE} AS BIGINT) AS x
      FROM d
    ),
    mh AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(x AS HUGEINT)) AS s1h,
             SUM(CAST(x AS HUGEINT) * x) AS s2h,
             SUM(CAST(x AS HUGEINT) * x * x) AS s3h,
             SUM(CAST(x AS HUGEINT) * x * x * x) AS s4h,
             SUM(CAST(n AS HUGEINT)) AS syh,
             SUM(CAST(x AS HUGEINT) * n) AS sxyh,
             SUM(CAST(x AS HUGEINT) * x * n) AS sx2yh
      FROM c
    ),
    m AS (
      SELECT k,
             (ABS(s1h) <= 9223372036854775807
              AND ABS(s2h) <= 9223372036854775807
              AND ABS(s3h) <= 9223372036854775807
              AND ABS(s4h) <= 9223372036854775807
              AND ABS(syh) <= 9223372036854775807
              AND ABS(sxyh) <= 9223372036854775807
              AND ABS(sx2yh) <= 9223372036854775807) AS ok,
             CAST(s1h AS DOUBLE) AS s1d, CAST(s2h AS DOUBLE) AS s2d,
             CAST(s3h AS DOUBLE) AS s3d, CAST(s4h AS DOUBLE) AS s4d,
             CAST(syh AS DOUBLE) AS syd, CAST(sxyh AS DOUBLE) AS sxyd,
             CAST(sx2yh AS DOUBLE) AS sx2yd,
             s1h, s2h, s3h, s4h, syh, sxyh, sx2yh
      FROM mh
    ),
    mg AS (
      SELECT k,
             CASE WHEN ok THEN CAST(s1h AS BIGINT) END AS s1,
             CASE WHEN ok THEN CAST(s2h AS BIGINT) END AS s2,
             CASE WHEN ok THEN CAST(s3h AS BIGINT) END AS s3,
             CASE WHEN ok THEN CAST(s4h AS BIGINT) END AS s4,
             CASE WHEN ok THEN CAST(syh AS BIGINT) END AS sy,
             CASE WHEN ok THEN CAST(sxyh AS BIGINT) END AS sxy,
             CASE WHEN ok THEN CAST(sx2yh AS BIGINT) END AS sx2y,
             CASE WHEN ok THEN s1d END AS s1f,
             CASE WHEN ok THEN s2d END AS s2f,
             CASE WHEN ok THEN s3d END AS s3f,
             CASE WHEN ok THEN s4d END AS s4f,
             CASE WHEN ok THEN syd END AS syf,
             CASE WHEN ok THEN sxyd END AS sxyf,
             CASE WHEN ok THEN sx2yd END AS sx2yf
      FROM m
    ),
    mr AS (
      SELECT k, s1, s2, s3, s4, sy, sxy, sx2y,
             s1f AS s1d, s2f AS s2d, s3f AS s3d, s4f AS s4d,
             syf AS syd, sxyf AS sxyd, sx2yf AS sx2yd
      FROM mg
    )
    SELECT k AS n_days, s1, s2, s3, s4, sy, sxy, sx2y,
      CAST(ROUND((
        syd * (s2d * s4d - s3d * s3d)
        - s1d * (sxyd * s4d - s3d * sx2yd)
        + s2d * (sxyd * s3d - s2d * sx2yd)
      ) / (
        CAST(k AS DOUBLE) * (s2d * s4d - s3d * s3d)
        - s1d * (s1d * s4d - s3d * s2d)
        + s2d * (s1d * s3d - s2d * s2d)
      ) * 1000000) AS BIGINT) AS a_micro,
      CAST(ROUND((
        CAST(k AS DOUBLE) * (sxyd * s4d - s3d * sx2yd)
        - syd * (s1d * s4d - s3d * s2d)
        + s2d * (s1d * sx2yd - sxyd * s2d)
      ) / (
        CAST(k AS DOUBLE) * (s2d * s4d - s3d * s3d)
        - s1d * (s1d * s4d - s3d * s2d)
        + s2d * (s1d * s3d - s2d * s2d)
      ) * 1000000) AS BIGINT) AS b_micro,
      CAST(ROUND((
        CAST(k AS DOUBLE) * (s2d * sx2yd - sxyd * s3d)
        - s1d * (s1d * sx2yd - sxyd * s2d)
        + syd * (s1d * s3d - s2d * s2d)
      ) / (
        CAST(k AS DOUBLE) * (s2d * s4d - s3d * s3d)
        - s1d * (s1d * s4d - s3d * s2d)
        + s2d * (s1d * s3d - s2d * s2d)
      ) * 1000000) AS BIGINT) AS c_micro
    FROM mr
    """,
)
def events_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A109 — Bass diffusion regression on daily signups: the discrete
    Bass model n_t = a + b·Y_{{t-1}} + c·Y_{{t-1}}² (a = pM,
    b = q − p, c = −q/M — innovation p, imitation q, market size M
    recoverable from the roots) fit by least squares on the
    cumulative-adopter regressor — THE product-growth curve read
    (Bass 1969), next to A31/A45's time-series baselines which see
    only the calendar, not the saturation term.

    Determinism: the regressor is integer (cumulative signups in
    units of {_BASS_SCALE}, floor division); ALL regression moments
    accumulate EXACT 128-bit (decimal(38,0) / HUGEINT — Σx⁴ is exact
    far past sf100); every readout is guarded by an exact integer
    compare and goes NULL LOUDLY on both engines the moment any
    moment leaves int64 (no silent wrap, no oracle throw — the
    VERDICT r9 #3 guard discipline, proven to fire by
    tests/test_sf1_bounds.py); the three coefficients are
    Cramer's-rule double trees over the eight moment integers with
    IDENTICAL parenthesization on both engines, micro-quantized.  The raw
    (a, b, c) are emitted rather than (p, q, M): the root extraction
    is a client-side two-liner and keeping the readout linear in the
    moments avoids a second quantization layer.

    Scale shape: one day-keyed hash aggregate absorbs the scan; the
    cumulative regressor is a window over the calendar-bounded day
    table (bounded_single_group); one scalar moment rollup; readout
    1 row."""
    d = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "signup")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    d = bounded_single_group(d)  # calendar-bounded day table
    w_prev = (
        Window.partitionBy("__opid")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.select(
        "n",
        F.expr(
            f"CAST(coalesce(sum(n) OVER (PARTITION BY __opid ORDER BY day"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
            f" div {_BASS_SCALE} AS BIGINT)"
        ).alias("x"),
    )
    # exact decimal(38,0) accumulation (the sf1-bounds discipline,
    # VERDICT r9 #3): int64 Σx⁴ binds at ~3e4 scaled cumulative
    # adopters ≈ sf100 — past it Spark's long sum would WRAP silently
    # while DuckDB's HUGEINT CAST would throw.  Both engines now
    # accumulate exact 128-bit and NULL every readout LOUDLY when any
    # moment leaves int64 (guard is an exact integer compare, no
    # double ulp at the boundary).
    dec = "CAST(x AS DECIMAL(38,0))"
    m = c.agg(
        F.count("*").cast("long").alias("k"),
        F.sum(F.expr(dec)).alias("s1h"),
        F.sum(F.expr(f"{dec} * x")).alias("s2h"),
        F.sum(F.expr(f"{dec} * x * x")).alias("s3h"),
        F.sum(F.expr(f"{dec} * x * x * x")).alias("s4h"),
        F.sum(F.expr("CAST(n AS DECIMAL(38,0))")).alias("syh"),
        F.sum(F.expr(f"{dec} * n")).alias("sxyh"),
        F.sum(F.expr(f"{dec} * x * n")).alias("sx2yh"),
    )
    _I64 = "9223372036854775807"
    ok = F.expr(
        " AND ".join(
            f"abs({c_}) <= {_I64}"
            for c_ in ("s1h", "s2h", "s3h", "s4h", "syh", "sxyh", "sx2yh")
        )
    )
    m = m.select(
        "k",
        *[
            F.when(ok, F.col(h).cast("long")).alias(h[:-1])
            for h in ("s1h", "s2h", "s3h", "s4h", "syh", "sxyh", "sx2yh")
        ],
        *[
            F.when(ok, F.col(h).cast("double")).alias(h[:-1] + "d")
            for h in ("s1h", "s2h", "s3h", "s4h", "syh", "sxyh", "sx2yh")
        ],
    )
    kD = F.col("k").cast("double")
    s1, s2 = F.col("s1d"), F.col("s2d")
    s3, s4 = F.col("s3d"), F.col("s4d")
    sy, sxy = F.col("syd"), F.col("sxyd")
    sx2y = F.col("sx2yd")
    det = (
        kD * (s2 * s4 - s3 * s3)
        - s1 * (s1 * s4 - s3 * s2)
        + s2 * (s1 * s3 - s2 * s2)
    )
    det_a = (
        sy * (s2 * s4 - s3 * s3)
        - s1 * (sxy * s4 - s3 * sx2y)
        + s2 * (sxy * s3 - s2 * sx2y)
    )
    det_b = (
        kD * (sxy * s4 - s3 * sx2y)
        - sy * (s1 * s4 - s3 * s2)
        + s2 * (s1 * sx2y - sxy * s2)
    )
    det_c = (
        kD * (s2 * sx2y - sxy * s3)
        - s1 * (s1 * sx2y - sxy * s2)
        + sy * (s1 * s3 - s2 * s2)
    )
    return m.select(
        F.col("k").alias("n_days"),
        "s1",
        "s2",
        "s3",
        "s4",
        "sy",
        "sxy",
        "sx2y",
        F.round(det_a / det * 1000000).cast("long").alias("a_micro"),
        F.round(det_b / det * 1000000).cast("long").alias("b_micro"),
        F.round(det_c / det * 1000000).cast("long").alias("c_micro"),
    )


# ---------------------------------------------------------------------------
# W21: per-user engaged time via capped-gap stitching
# ---------------------------------------------------------------------------

_ENG_CAP_US = 15 * 60 * 1000000  # 15-minute engagement gap cap


@query(
    "events_user_active_span",
    f"""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    u AS (
      SELECT user_id,
             CAST(SUM(LEAST(gap_us, {_ENG_CAP_US})) // 60000000 AS BIGINT)
               AS engaged_min
      FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
    )
    SELECT CAST(LEAST(engaged_min // 60, 19) AS BIGINT) AS bucket_hours,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(engaged_min) AS BIGINT) AS engaged_min
    FROM u GROUP BY 1 ORDER BY bucket_hours
    """,
)
def events_user_active_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W21 — engaged time per user by CAPPED-gap stitching: each
    consecutive-event gap contributes min(gap, 15 min), which equals
    the union length of 15-min-padded activity intervals without ever
    materializing the merge (the gaps-and-islands identity) — the
    engagement denominator behind DAU-quality metrics, read as a
    20-bucket hours histogram over users.  ST21/W3 build the session
    STRUCTURE; this is the one-pass TIME-MASS readout.

    Determinism: integer microsecond gaps, integer cap/floor
    divisions — no doubles anywhere.

    Scale shape: one user-partitioned lag (the W-family shuffle), one
    user-keyed sum (entity-bounded), one 20-row histogram
    aggregate."""
    ev = _t(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = ev.select(
        "user_id", (us - F.lag(us).over(w_u)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    u = g.groupBy("user_id").agg(
        F.expr(
            f"CAST(sum(LEAST(gap_us, {_ENG_CAP_US})) div 60000000 AS BIGINT)"
        ).alias("engaged_min")
    )
    return (
        u.groupBy(
            F.expr("CAST(LEAST(engaged_min div 60, 19) AS BIGINT)").alias(
                "bucket_hours"
            )
        )
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("engaged_min").cast("long").alias("engaged_min"),
        )
        .orderBy("bucket_hours")
    )


# ---------------------------------------------------------------------------
# A110: on-time-in-full (OTIF) fill rate by order month
# ---------------------------------------------------------------------------

_OTIF_DAYS = 30


@query(
    "orders_fill_rate_otif",
    f"""
    WITH s AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship
      FROM lineitem GROUP BY 1
    ),
    o AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(month FROM o_orderdate) AS mon,
             CASE WHEN DATE_DIFF('day', CAST(o_orderdate AS DATE), s.last_ship)
                       <= {_OTIF_DAYS} THEN 1 ELSE 0 END AS otif
      FROM orders JOIN s ON o_orderkey = s.l_orderkey
    )
    SELECT CAST(yr AS BIGINT) AS yr, CAST(mon AS BIGINT) AS mon,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(otif) AS BIGINT) AS n_otif,
           CAST(SUM(otif) * 1000000 // COUNT(*) AS BIGINT) AS otif_ppm
    FROM o GROUP BY 1, 2 ORDER BY yr, mon
    """,
)
def orders_fill_rate_otif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A110 — on-time-in-full fill rate: an order counts as OTIF only
    when its LAST line ships within {_OTIF_DAYS} days of the order
    date (every line, not any line — MAX(l_shipdate) is the
    completion time), rolled up by order month.  THE supply-chain
    service KPI; A54's shipping-SLA row reads per-LINE lateness,
    this reads per-ORDER completeness — a 10-line order with one
    late line is late here and 90% fine there.

    Determinism: exact date arithmetic and integer counts;
    floor-division ppm.

    Scale shape: one orderkey-keyed MAX aggregate absorbs lineitem
    (map-side combinable), one orderkey equi-join (Q3's shuffle), one
    (year, month) aggregate; readout is calendar-bounded."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    s = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("last_ship")
    )
    o = orders.join(s, orders.o_orderkey == s.l_orderkey).select(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.when(
            F.datediff(F.col("last_ship"), F.col("o_orderdate").cast("date"))
            <= _OTIF_DAYS,
            1,
        )
        .otherwise(0)
        .alias("otif"),
    )
    return (
        o.groupBy(
            F.col("yr").cast("long").alias("yr"),
            F.col("mon").cast("long").alias("mon"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("otif").cast("long").alias("n_otif"),
        )
        .select(
            "yr",
            "mon",
            "n_orders",
            "n_otif",
            F.expr("CAST(n_otif * 1000000 div n_orders AS BIGINT)").alias(
                "otif_ppm"
            ),
        )
        .orderBy("yr", "mon")
    )


# ---------------------------------------------------------------------------
# EV32: Murphy decomposition of the Brier score
# ---------------------------------------------------------------------------

@query(
    "eval_reliability_sharpness",
    """
    WITH s AS (
      SELECT CAST('0x' || substr(md5('p:' || CAST(vec_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 1000001 AS pm,
             CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
      FROM embeddings
    ),
    b AS (
      SELECT LEAST(pm // 100000, 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pm) AS BIGINT) AS sum_pm,
             CAST(SUM(y) AS BIGINT) AS sum_y
      FROM s GROUP BY 1
    ),
    t AS (
      SELECT bin, n, sum_pm, sum_y,
             CAST(SUM(n) OVER () AS BIGINT) AS nn,
             CAST(SUM(sum_y) OVER () AS BIGINT) AS yy
      FROM b
    ),
    q AS (
      SELECT nn, yy,
        CAST(ROUND(CAST(n AS DOUBLE)
          * (CAST(sum_pm AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
             - CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE))
          * (CAST(sum_pm AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
             - CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000000000.0)
          AS BIGINT) AS rel_q,
        CAST(ROUND(CAST(n AS DOUBLE)
          * (CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE)
             - CAST(yy AS DOUBLE) / CAST(nn AS DOUBLE))
          * (CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE)
             - CAST(yy AS DOUBLE) / CAST(nn AS DOUBLE)) * 1000000000000.0)
          AS BIGINT) AS res_q
      FROM t
    )
    SELECT CAST(MAX(nn) AS BIGINT) AS n,
      CAST(ROUND(CAST(SUM(rel_q) AS DOUBLE) / CAST(MAX(nn) AS DOUBLE)
           / 1000000.0) AS BIGINT) AS reliability_micro,
      CAST(ROUND(CAST(SUM(res_q) AS DOUBLE) / CAST(MAX(nn) AS DOUBLE)
           / 1000000.0) AS BIGINT) AS resolution_micro,
      CAST(ROUND(CAST(MAX(yy) AS DOUBLE) / CAST(MAX(nn) AS DOUBLE)
           * (1.0 - CAST(MAX(yy) AS DOUBLE) / CAST(MAX(nn) AS DOUBLE))
           * 1000000) AS BIGINT) AS uncertainty_micro
    FROM q
    """,
)
def eval_reliability_sharpness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV32 — Murphy decomposition of the (binned) Brier score:
    Brier = RELIABILITY − RESOLUTION + UNCERTAINTY, with
    REL = Σ n_k (p̄_k − ȳ_k)²/N (calibration error — want 0),
    RES = Σ n_k (ȳ_k − ȳ)²/N (sharpness — want big) and
    UNC = ȳ(1−ȳ) (the data's own difficulty).  EV3 plots the
    reliability diagram and EV17 profiles the raw Brier; this is the
    decomposition that says WHY a Brier score is what it is — a model
    can be perfectly calibrated and useless (RES = 0).  Same pinned
    proxy and 10-bin layout as EV3/EV28, so the family reads
    together.

    Determinism: exact int64 bin moments; each bin's REL/RES term is
    one fixed double tree quantized to a 1e-12 grid BEFORE the k-row
    sum (the A87 device); the three readouts are single divisions,
    micro-quantized.

    Scale shape: one bin-keyed partial aggregate absorbs the scan;
    totals via a 10-row bounded window; readout 1 row."""
    s = _t(spark, sf_dir, "embeddings").select(
        (
            _h60(F.concat(F.lit("p:"), F.col("vec_id").cast("string"))) % 1000001
        ).alias("pm"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
    )
    b = s.groupBy(
        F.least(F.expr("pm div 100000"), F.lit(9)).alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pm").cast("long").alias("sum_pm"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    b = bounded_single_group(b)  # 10-bin bounded table
    w_tot = Window.partitionBy("__opid")
    t = b.select(
        "bin",
        "n",
        "sum_pm",
        "sum_y",
        F.sum("n").over(w_tot).cast("long").alias("nn"),
        F.sum("sum_y").over(w_tot).cast("long").alias("yy"),
    )
    nD = F.col("n").cast("double")
    pbar = F.col("sum_pm").cast("double") / nD / 1000000.0
    ybar_k = F.col("sum_y").cast("double") / nD
    ybar = F.col("yy").cast("double") / F.col("nn").cast("double")
    q = t.select(
        "nn",
        "yy",
        F.round(nD * (pbar - ybar_k) * (pbar - ybar_k) * 1000000000000.0)
        .cast("long")
        .alias("rel_q"),
        F.round(nD * (ybar_k - ybar) * (ybar_k - ybar) * 1000000000000.0)
        .cast("long")
        .alias("res_q"),
    )
    nnD = F.max("nn").cast("double")
    yyD = F.max("yy").cast("double")
    return q.agg(
        F.max("nn").cast("long").alias("n"),
        F.round(F.sum("rel_q").cast("double") / nnD / 1000000.0)
        .cast("long")
        .alias("reliability_micro"),
        F.round(F.sum("res_q").cast("double") / nnD / 1000000.0)
        .cast("long")
        .alias("resolution_micro"),
        F.round(yyD / nnD * (1.0 - yyD / nnD) * 1000000)
        .cast("long")
        .alias("uncertainty_micro"),
    )


# ---------------------------------------------------------------------------
# A111: Wilson score intervals for weekend-share proportions
# ---------------------------------------------------------------------------

@query(
    "events_wilson_ci",
    """
    WITH e AS (
      SELECT event_type,
             CASE WHEN ISODOW(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS wknd
      FROM events
    ),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(wknd) AS BIGINT) AS k
      FROM e GROUP BY event_type
    )
    SELECT event_type, n, k,
      CAST(k * 1000000 // n AS BIGINT) AS p_ppm,
      CAST(ROUND((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
            + 1.9599639845400545 * 1.9599639845400545 / (2.0 * CAST(n AS DOUBLE))
            - 1.9599639845400545 * SQRT(
                CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                + 1.9599639845400545 * 1.9599639845400545
                  / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
           / (1.0 + 1.9599639845400545 * 1.9599639845400545 / CAST(n AS DOUBLE))
           * 1000000) AS BIGINT) AS ci_lo_ppm,
      CAST(ROUND((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
            + 1.9599639845400545 * 1.9599639845400545 / (2.0 * CAST(n AS DOUBLE))
            + 1.9599639845400545 * SQRT(
                CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                + 1.9599639845400545 * 1.9599639845400545
                  / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
           / (1.0 + 1.9599639845400545 * 1.9599639845400545 / CAST(n AS DOUBLE))
           * 1000000) AS BIGINT) AS ci_hi_ppm
    FROM g ORDER BY event_type
    """,
)
def events_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A111 — Wilson score 95% intervals for each event type's
    weekend share: the proportion CI that stays inside [0, 1] and
    behaves at small n / extreme p where the naive Wald interval
    collapses (the industry default for conversion-rate error bars —
    A18's two-sample test COMPARES arms; this puts honest bars on a
    SINGLE proportion).

    Determinism: exact int64 (k, n); both bounds are one fixed double
    tree each over (k, n) with the z constant pinned to the same
    17-digit literal in both engines, ppm-quantized.

    Scale shape: one event-type-keyed aggregate absorbs the scan
    (map-side combinable); the CI arithmetic runs on k rows; readout
    k rows."""
    z = 1.9599639845400545
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.expr("weekday(ts)") >= 5, 1).otherwise(0).alias("wknd"),
    )
    g = e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("wknd").cast("long").alias("k"),
    )
    nD, kD = F.col("n").cast("double"), F.col("k").cast("double")
    p = kD / nD
    center = p + z * z / (2.0 * nD)
    half = z * F.sqrt(p * (1.0 - p) / nD + z * z / (4.0 * nD * nD))
    denom = 1.0 + z * z / nD
    return g.select(
        "event_type",
        "n",
        "k",
        F.expr("CAST(k * 1000000 div n AS BIGINT)").alias("p_ppm"),
        F.round((center - half) / denom * 1000000).cast("long").alias("ci_lo_ppm"),
        F.round((center + half) / denom * 1000000).cast("long").alias("ci_hi_ppm"),
    ).orderBy("event_type")
