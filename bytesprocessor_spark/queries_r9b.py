"""Round-9 second batch: time-series diagnostics, distributional
tests, inventory policy, supply-chain variance, and survey-design
operators — each an EXT row of SURVEY §2's analytics surface on the
same exact-integer determinism contract as queries_r9 (engines
aggregate only exact int64/int128 moments; every statistic is ONE
fixed IEEE-double tree over those integers, quantized once).

- A112 events_ljung_box: Ljung-Box white-noise test on the daily
  purchase-count series (ACF at lags 1..7 with the cumulative Q_k
  against chi-square criticals) — the residual-diagnostic companion
  of A34's raw ACF: it says whether the wiggle A34 shows is NOISE.
- A113 events_jarque_bera: Jarque-Bera normality test (moment
  skewness/kurtosis) per event type — the distributional gate before
  any z/t-based read (A44, A48) is trusted.
- EV33 eval_mcc_multiclass: multiclass Matthews correlation + macro/
  micro F1 from the EV29 pinned 5-class model — the single-scalar
  quality read that survives class imbalance where accuracy lies.
- A114 part_eoq_policy: EOQ + safety stock + reorder point per brand
  (critical inputs from weekly demand moments) — the inventory policy
  table A102's newsvendor fractile feeds at line-item scale.
- A115 orders_bullwhip: order-date vs ship-date daily value-flow CV²
  amplification per year — the bullwhip read (demand-signal variance
  entering vs fulfillment variance leaving) behind A63's lead times.
- A116 events_neyman_allocation: Neyman vs proportional stratified
  sample allocation across event types — the survey-design primitive
  behind every budgeted human-eval pass over a 100 TB corpus.

Reference scope note: the reference engine ends at the labeled packet
table (BytesProcessor.py:121-187); these are EXT rows of the
analytics surface SURVEY §2 declares on top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bytesprocessor_spark.operators.ranking import bounded_single_group
from bytesprocessor_spark.queries import _t, cents, query


def _h60(col):
    """Cross-engine 60-bit non-negative hash (md5 prefix as integer)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_H60_DUCK = "CAST('0x' || substr(md5({0}), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# A112: Ljung-Box white-noise test on daily purchase counts
# ---------------------------------------------------------------------------

_LB_MAX_LAG = 7
# chi-square 95% criticals for df 1..7, milli-quantized
_LB_CRIT_MILLI = (3841, 5991, 7815, 9488, 11070, 12592, 14067)


def _lb_oracle() -> str:
    """Generate the 7-arm readout; each arm recomputes its lag's r and
    cumulative Q from the single moment row (explicit integer sums —
    no window over doubles, so the fold order is pinned)."""
    lead_cols = ", ".join(
        f"LEAD(d, {k}) OVER (ORDER BY day) AS d{k}"
        for k in range(1, _LB_MAX_LAG + 1)
    )
    num_cols = ", ".join(
        f"CAST(SUM(d * d{k}) AS BIGINT) AS num{k}"
        for k in range(1, _LB_MAX_LAG + 1)
    )
    nano = {
        k: (
            f"CAST(ROUND((CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE))"
            f" * (CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE))"
            f" / (CAST(n AS DOUBLE) - {k}) * 1000000000) AS BIGINT)"
        )
        for k in range(1, _LB_MAX_LAG + 1)
    }
    arms = []
    for k in range(1, _LB_MAX_LAG + 1):
        cum = " + ".join(nano[j] for j in range(1, k + 1))
        arms.append(
            f"SELECT CAST({k} AS BIGINT) AS lag, n AS n_days,\n"
            f"  CAST(ROUND(CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE)"
            f" * 1000000) AS BIGINT) AS r_micro,\n"
            f"  CAST(n * (n + 2) * ({cum}) // 1000000 AS BIGINT) AS q_milli,\n"
            f"  CAST({_LB_CRIT_MILLI[k - 1]} AS BIGINT) AS crit_milli,\n"
            f"  n * (n + 2) * ({cum}) // 1000000 >"
            f" {_LB_CRIT_MILLI[k - 1]} AS reject_white_noise\n"
            f"FROM m WHERE n > {k} AND den > 0"
        )
    stacked = "\nUNION ALL\n".join(arms)
    return f"""
    WITH wk AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    base AS (
      SELECT day, x,
             CAST(SUM(x) OVER () AS BIGINT) AS s,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM wk
    ),
    dev AS (
      SELECT day, n, x - s // n AS d FROM base
    ),
    led AS (
      SELECT day, n, d, {lead_cols} FROM dev
    ),
    m AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(d * d) AS BIGINT) AS den,
             {num_cols}
      FROM led
    )
    {stacked}
    ORDER BY lag
    """


@query("events_ljung_box", _lb_oracle())
def events_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A112 — Ljung-Box portmanteau test: is the daily purchase-count
    series white noise?  Q_k = n(n+2) Σ_{j<=k} r_j²/(n−j) over the
    first 7 autocorrelations, compared lag-by-lag against the
    chi-square(df=k) 95% critical value.  A34 SHOWS the ACF; this is
    the significance read that says whether any of it is signal —
    the standard residual diagnostic after fitting A45/A71 baselines.

    Determinism: the day series is exact integer counts; deviations
    use the integer floor-mean (d = x − S//n, the A104 idiom) so
    num_k = Σ d_t·d_{t+k} and den = Σ d² are exact int64; each lag's
    term r_k²/(n−k) is one fixed double tree nano-quantized BEFORE
    the cumulative sum (explicit integer adds, no double window
    fold); Q converts by integer floor division.

    Scale shape: one day-keyed aggregate absorbs the scan (the day
    table is calendar-bounded — years of days, not data-scale); lags
    ride a bounded window over it (bounded_single_group); readout 7
    rows."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    wk = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    wk = bounded_single_group(wk)  # calendar-bounded day table
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_ord = Window.partitionBy("__opid").orderBy("day")
    base = wk.select(
        "day",
        "x",
        "__opid",
        F.sum("x").over(w_all).cast("long").alias("s"),
        F.count("*").over(w_all).cast("long").alias("n"),
    )
    dev = base.select(
        "day", "n", "__opid", (F.col("x") - F.expr("s div n")).alias("d")
    )
    led = dev.select(
        "day",
        "n",
        "d",
        *[F.lead("d", k).over(w_ord).alias(f"d{k}") for k in range(1, _LB_MAX_LAG + 1)],
    )
    m = led.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("den"),
        *[
            F.sum(F.col("d") * F.col(f"d{k}")).cast("long").alias(f"num{k}")
            for k in range(1, _LB_MAX_LAG + 1)
        ],
    ).where(F.col("den") > 0)
    nD, denD = F.col("n").cast("double"), F.col("den").cast("double")
    nano = {}
    for k in range(1, _LB_MAX_LAG + 1):
        r = F.col(f"num{k}").cast("double") / denD
        nano[k] = F.round(r * r / (nD - F.lit(float(k))) * 1e9).cast("long")
    m = m.select(
        "n",
        "den",
        *[F.col(f"num{k}") for k in range(1, _LB_MAX_LAG + 1)],
        *[nano[k].alias(f"nano{k}") for k in range(1, _LB_MAX_LAG + 1)],
    )
    arms = []
    for k in range(1, _LB_MAX_LAG + 1):
        cum = " + ".join(f"nano{j}" for j in range(1, k + 1))
        arms.append(
            f"CAST({k} AS BIGINT), n, "
            f"CAST(ROUND(CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE)"
            f" * 1000000) AS BIGINT), "
            f"CAST(n * (n + 2) * ({cum}) div 1000000 AS BIGINT), "
            f"CAST({_LB_CRIT_MILLI[k - 1]} AS BIGINT), "
            f"n * (n + 2) * ({cum}) div 1000000 > {_LB_CRIT_MILLI[k - 1]}"
        )
    stacked = m.selectExpr(
        f"stack({_LB_MAX_LAG}, " + ", ".join(arms) + ")"
        " AS (lag, n_days, r_micro, q_milli, crit_milli, reject_white_noise)"
    )
    return stacked.where(F.col("n_days") > F.col("lag")).orderBy("lag")


# ---------------------------------------------------------------------------
# A113: Jarque-Bera normality test per event type
# ---------------------------------------------------------------------------

@query(
    "events_jarque_bera",
    """
    WITH u AS (
      SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS u
      FROM events WHERE value IS NOT NULL
    ),
    mt AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(FLOOR(CAST(SUM(u) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
      FROM u GROUP BY event_type
    ),
    e AS (
      SELECT u.event_type, mt.n, mt.m, u.u - mt.m AS e,
             (u.u - mt.m) * (u.u - mt.m) AS e2
      FROM u JOIN mt ON u.event_type = mt.event_type
    ),
    mom AS (
      SELECT event_type, MAX(n) AS n, MAX(m) AS m,
             CAST(SUM(CAST(e2 AS HUGEINT)) AS DOUBLE) AS s2,
             CAST(SUM(CAST(e2 AS HUGEINT) * e) AS DOUBLE) AS s3,
             CAST(SUM(CAST(e2 AS HUGEINT) * e2) AS DOUBLE) AS s4
      FROM e GROUP BY event_type
    )
    SELECT event_type, n, m AS mean_units,
      CAST(ROUND((s3 / n) / ((s2 / n) * SQRT(s2 / n)) * 1000) AS BIGINT)
        AS skew_milli,
      CAST(ROUND((s4 / n) / ((s2 / n) * (s2 / n)) * 1000) AS BIGINT)
        AS kurt_milli,
      CAST(ROUND(CAST(n AS DOUBLE) * (
          ((s3 / n) / ((s2 / n) * SQRT(s2 / n)))
            * ((s3 / n) / ((s2 / n) * SQRT(s2 / n))) / 6
          + ((s4 / n) / ((s2 / n) * (s2 / n)) - 3)
            * ((s4 / n) / ((s2 / n) * (s2 / n)) - 3) / 24) * 1000)
        AS BIGINT) AS jb_milli,
      ROUND(CAST(n AS DOUBLE) * (
          ((s3 / n) / ((s2 / n) * SQRT(s2 / n)))
            * ((s3 / n) / ((s2 / n) * SQRT(s2 / n))) / 6
          + ((s4 / n) / ((s2 / n) * (s2 / n)) - 3)
            * ((s4 / n) / ((s2 / n) * (s2 / n)) - 3) / 24) * 1000)
        > 5991 AS reject_normal
    FROM mom WHERE s2 > 0 AND n >= 4
    ORDER BY event_type
    """,
)
def events_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A113 — Jarque-Bera normality test per event type on the
    floor-dollar value: JB = n(S²/6 + (K−3)²/24) from moment skewness
    S and kurtosis K, against the chi-square(2) 95% critical (5.991).
    The distributional gate every z/t-based read (A44's DiD, A48's
    bootstrap-vs-normal comparison, A111's Wilson-vs-Wald choice)
    silently assumes — this row makes the assumption a measurement.

    Determinism: values floor to integer dollars (FLOOR on the same
    IEEE double in both engines); the per-type mean floors to an
    integer (A104's integer-center idiom) so deviations e are exact
    int64 and Σe², Σe³, Σe⁴ accumulate in exact int128
    (HUGEINT / decimal(38,0)); skew/kurt/JB are single fixed double
    trees over those, milli-quantized once.  The int128 sums hold to
    any realistic scale (|e| < 2^20 dollars ⇒ Σe⁴ < 2^80·n).

    Scale shape: type-keyed mean table (k rows) broadcasts back onto
    the scan; one more type-keyed aggregate absorbs the moments;
    readout k rows."""
    u = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", F.floor(F.col("value")).cast("long").alias("u"))
    )
    mt = u.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.floor(F.sum("u").cast("double") / F.count("*")).cast("long").alias("m"),
    )
    e = u.join(F.broadcast(mt), "event_type").select(
        "event_type",
        "n",
        "m",
        (F.col("u") - F.col("m")).alias("e"),
        ((F.col("u") - F.col("m")) * (F.col("u") - F.col("m"))).alias("e2"),
    )
    dec = F.col("e2").cast("decimal(38,0)")
    mom = e.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.sum(dec).cast("double").alias("s2"),
        F.sum(dec * F.col("e")).cast("double").alias("s3"),
        F.sum(dec * F.col("e2")).cast("double").alias("s4"),
    )
    nD = F.col("n").cast("double")
    v = F.col("s2") / nD
    skew = (F.col("s3") / nD) / (v * F.sqrt(v))
    kurt = (F.col("s4") / nD) / (v * v)
    jb = nD * (skew * skew / 6 + (kurt - 3) * (kurt - 3) / 24)
    return (
        mom.where((F.col("s2") > 0) & (F.col("n") >= 4))
        .select(
            "event_type",
            "n",
            F.col("m").alias("mean_units"),
            F.round(skew * 1000).cast("long").alias("skew_milli"),
            F.round(kurt * 1000).cast("long").alias("kurt_milli"),
            F.round(jb * 1000).cast("long").alias("jb_milli"),
            (F.round(jb * 1000) > 5991).alias("reject_normal"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# EV33: multiclass Matthews correlation + macro/micro F1
# ---------------------------------------------------------------------------

_MCC_CLASSES = ("click", "error", "purchase", "signup", "view")
_MCC_BOOST = 250000


def _mcc_eff_duck(c: str) -> str:
    s = _H60_DUCK.format(f"'cls:' || CAST(event_id AS VARCHAR) || ':' || {c}")
    return (
        f"(({s}) % 1000000"
        f" + CASE WHEN {c} = event_type THEN {_MCC_BOOST} ELSE 0 END)"
    )


@query(
    "eval_mcc_multiclass",
    f"""
    WITH s0 AS (
      SELECT event_type,
             [{_mcc_eff_duck("c")} FOR c IN {list(_MCC_CLASSES)!r}] AS scores
      FROM events
    ),
    p AS (
      SELECT event_type AS y,
             ({list(_MCC_CLASSES)!r})[list_position(scores,
                 list_aggregate(scores, 'max'))] AS yhat
      FROM s0
    ),
    conf AS (
      SELECT y, yhat, CAST(COUNT(*) AS BIGINT) AS n
      FROM p GROUP BY y, yhat
    ),
    marg AS (
      SELECT COALESCE(t.cls, q.cls) AS cls,
             COALESCE(t.t, 0) AS t, COALESCE(q.p, 0) AS p,
             COALESCE(dg.tp, 0) AS tp
      FROM (SELECT y AS cls, CAST(SUM(n) AS BIGINT) AS t
            FROM conf GROUP BY y) t
      FULL JOIN (SELECT yhat AS cls, CAST(SUM(n) AS BIGINT) AS p
                 FROM conf GROUP BY yhat) q ON t.cls = q.cls
      LEFT JOIN (SELECT y AS cls, CAST(SUM(n) AS BIGINT) AS tp
                 FROM conf WHERE y = yhat GROUP BY y) dg
        ON COALESCE(t.cls, q.cls) = dg.cls
    ),
    agg AS (
      SELECT CAST(SUM(t) AS BIGINT) AS s,
             CAST(SUM(tp) AS BIGINT) AS c,
             CAST(SUM(p * t) AS BIGINT) AS spt,
             CAST(SUM(p * p) AS BIGINT) AS spp,
             CAST(SUM(t * t) AS BIGINT) AS stt,
             CAST(SUM(CASE WHEN t + p > 0
                  THEN tp * 2 * 1000000 // (t + p) ELSE 0 END) AS BIGINT)
               AS f1sum,
             CAST(SUM(CASE WHEN t + p > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS kcls
      FROM marg
    )
    SELECT s AS n, c AS n_correct,
      CAST(c * 1000000 // s AS BIGINT) AS accuracy_ppm,
      CAST(f1sum // kcls AS BIGINT) AS macro_f1_ppm,
      CAST(ROUND((CAST(c AS DOUBLE) * CAST(s AS DOUBLE)
                  - CAST(spt AS DOUBLE))
           / (SQRT(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   - CAST(spp AS DOUBLE))
              * SQRT(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     - CAST(stt AS DOUBLE))) * 1000000) AS BIGINT)
        AS mcc_micro
    FROM agg
    """,
)
def eval_mcc_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV33 — multiclass Matthews correlation coefficient plus macro
    and micro F1 of the EV29 pinned 5-class model (argmax prediction
    under the same md5-uniform scores + true-class boost).  MCC =
    (c·s − Σ_k p_k t_k) / sqrt((s² − Σp_k²)(s² − Σt_k²)) — the one
    scalar that stays honest under class imbalance, where accuracy
    (micro F1) saturates; macro F1 averages per-class F1 so minority
    classes count equally.  EV9 gives the matrix; this is its
    headline-scalar readout.

    Determinism: integer scores with the deterministic (score desc,
    class asc) argmax; confusion and margin tables exact int64;
    per-class F1 floor-quantized to ppm BEFORE the macro average;
    MCC is one fixed double tree over five exact int64 moments.

    Scale shape: argmax is INLINE array arithmetic per row (no
    explode, no shuffle of scores); one (true, pred)-keyed aggregate
    (≤25 cells) absorbs the scan; margins and moments ride k-row
    tables; readout 1 row."""
    ev = _t(spark, sf_dir, "events")
    classes = F.array(*[F.lit(c) for c in _MCC_CLASSES])

    def eff(cls_col):
        return (
            _h60(
                F.concat(
                    F.lit("cls:"),
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    cls_col,
                )
            )
            % 1000000
            + F.when(cls_col == F.col("event_type"), _MCC_BOOST).otherwise(0)
        )

    scores = F.transform(classes, lambda c: eff(c))
    # first index of the max = the (score desc, class asc) argmax, since
    # the class array is already sorted ascending — 5 md5s per row, not 50
    yhat = F.element_at(classes, F.array_position(scores, F.array_max(scores)).cast("int"))
    conf = (
        ev.select(F.col("event_type").alias("y"), yhat.alias("yhat"))
        .groupBy("y", "yhat")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tm = conf.groupBy(F.col("y").alias("cls")).agg(
        F.sum("n").cast("long").alias("t")
    )
    pm = conf.groupBy(F.col("yhat").alias("cls")).agg(
        F.sum("n").cast("long").alias("p")
    )
    dg = (
        conf.where(F.col("y") == F.col("yhat"))
        .groupBy(F.col("y").alias("cls"))
        .agg(F.sum("n").cast("long").alias("tp"))
    )
    marg = (
        tm.join(pm, "cls", "full")
        .join(dg, "cls", "left")
        .select(
            "cls",
            F.coalesce("t", F.lit(0)).alias("t"),
            F.coalesce("p", F.lit(0)).alias("p"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    agg = marg.agg(
        F.sum("t").cast("long").alias("s"),
        F.sum("tp").cast("long").alias("c"),
        F.sum(F.col("p") * F.col("t")).cast("long").alias("spt"),
        F.sum(F.col("p") * F.col("p")).cast("long").alias("spp"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(
            F.when(
                F.col("t") + F.col("p") > 0,
                F.expr("tp * 2 * 1000000 div (t + p)"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("f1sum"),
        F.sum(F.when(F.col("t") + F.col("p") > 0, 1).otherwise(0))
        .cast("long")
        .alias("kcls"),
    )
    sD, cD = F.col("s").cast("double"), F.col("c").cast("double")
    mcc = (cD * sD - F.col("spt").cast("double")) / (
        F.sqrt(sD * sD - F.col("spp").cast("double"))
        * F.sqrt(sD * sD - F.col("stt").cast("double"))
    )
    return agg.select(
        F.col("s").alias("n"),
        F.col("c").alias("n_correct"),
        F.expr("CAST(c * 1000000 div s AS BIGINT)").alias("accuracy_ppm"),
        F.expr("CAST(f1sum div kcls AS BIGINT)").alias("macro_f1_ppm"),
        F.round(mcc * 1000000).cast("long").alias("mcc_micro"),
    )


# ---------------------------------------------------------------------------
# A114: EOQ / safety-stock / reorder-point policy per brand
# ---------------------------------------------------------------------------

_EOQ_ORDER_COST_CENTS = 10000  # $100 per order, pinned
_EOQ_HOLD_RATE = 0.2  # 20%/yr of unit cost, pinned
_EOQ_Z95 = 1.6448536269514722  # 95% service level, pinned literal
_EOQ_LEAD_WEEKS = 2


@query(
    "part_eoq_policy",
    f"""
    WITH li AS (
      SELECT p.p_brand AS brand,
             DATE_DIFF('day', DATE '1995-01-01', CAST(l.l_shipdate AS DATE))
               // 7 AS week,
             CAST(ROUND(l.l_quantity * 100) AS BIGINT) AS q_c,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS ext_c
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    wk AS (
      SELECT brand, week,
             CAST(SUM(q_c) AS BIGINT) AS d
      FROM li GROUP BY 1, 2
    ),
    b AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n_weeks,
             CAST(MAX(week) - MIN(week) + 1 AS BIGINT) AS span,
             CAST(SUM(d) AS BIGINT) AS sd,
             CAST(SUM(CAST(d AS HUGEINT) * d) AS DOUBLE) AS sd2
      FROM wk GROUP BY brand
    ),
    t AS (
      SELECT brand, CAST(SUM(q_c) AS BIGINT) AS tot_q,
             CAST(SUM(ext_c) AS BIGINT) AS tot_ext
      FROM li GROUP BY brand
    )
    SELECT b.brand, b.n_weeks, b.sd AS demand_qc,
      CAST(ROUND(CAST(b.sd AS DOUBLE) / b.span * 52 / 100 * 1000) AS BIGINT)
        AS d_annual_milli,
      CAST(ROUND(CAST(t.tot_ext AS DOUBLE)
           / (CAST(t.tot_q AS DOUBLE) / 100) * 1000) AS BIGINT)
        AS unit_price_milli_cents,
      CAST(ROUND(SQRT(2 * {_EOQ_ORDER_COST_CENTS}
               * (CAST(b.sd AS DOUBLE) / b.span * 52 / 100)
               / ({_EOQ_HOLD_RATE} * (CAST(t.tot_ext AS DOUBLE)
                  / (CAST(t.tot_q AS DOUBLE) / 100)))) * 1000) AS BIGINT)
        AS eoq_units_milli,
      CAST(ROUND({_EOQ_Z95} * SQRT((b.sd2 - CAST(b.sd AS DOUBLE)
               * b.sd / b.n_weeks) / (b.n_weeks - 1)) / 100
               * SQRT(CAST({_EOQ_LEAD_WEEKS} AS DOUBLE)) * 1000) AS BIGINT)
        AS safety_stock_milli,
      CAST(ROUND((CAST(b.sd AS DOUBLE) / b.n_weeks / 100 * {_EOQ_LEAD_WEEKS}
               + {_EOQ_Z95} * SQRT((b.sd2 - CAST(b.sd AS DOUBLE)
                  * b.sd / b.n_weeks) / (b.n_weeks - 1)) / 100
                  * SQRT(CAST({_EOQ_LEAD_WEEKS} AS DOUBLE))) * 1000)
        AS BIGINT) AS reorder_point_milli
    FROM b JOIN t ON b.brand = t.brand
    WHERE b.n_weeks >= 2 AND t.tot_q > 0
    ORDER BY b.brand
    """,
)
def part_eoq_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A114 — inventory policy per brand: EOQ = sqrt(2·K·D/h) from
    the annualized demand rate, safety stock = z95·σ_week·sqrt(L),
    reorder point = μ_week·L + safety stock.  The policy table A102's
    one-period newsvendor fractile generalizes to — what a replenish-
    ment planner (A60) actually posts against each brand.

    Determinism: weekly demand buckets on the floor-week grid (the
    A89 epoch, post-ADVICE floor semantics); Σd exact int64 and Σd²
    exact int128 (HUGEINT / decimal) before ONE double conversion;
    EOQ / ss / ROP are fixed double trees with pinned K, h, z, L
    literals (z to 17 digits, the A111 discipline), milli-quantized.

    Scale shape: lineitem⋈part partkey equi-join (AQE-planned),
    (brand, week) aggregate (map-combinable), brand rollup (k rows);
    readout ≤25 rows."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            F.expr(
                "cast(floor(datediff(cast(l_shipdate as date),"
                " date'1995-01-01') / 7) as long)"
            ).alias("week"),
            cents(F.col("l_quantity")).alias("q_c"),
            cents(F.col("l_extendedprice")).alias("ext_c"),
        )
    )
    wk = li.groupBy("brand", "week").agg(F.sum("q_c").cast("long").alias("d"))
    b = wk.groupBy("brand").agg(
        F.count("*").cast("long").alias("n_weeks"),
        (F.max("week") - F.min("week") + 1).cast("long").alias("span"),
        F.sum("d").cast("long").alias("sd"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d"))
        .cast("double")
        .alias("sd2"),
    )
    t = li.groupBy("brand").agg(
        F.sum("q_c").cast("long").alias("tot_q"),
        F.sum("ext_c").cast("long").alias("tot_ext"),
    )
    j = b.join(t, "brand").where((F.col("n_weeks") >= 2) & (F.col("tot_q") > 0))
    sdD = F.col("sd").cast("double")
    spanD = F.col("span").cast("double")
    nwD = F.col("n_weeks").cast("double")
    d_annual = sdD / spanD * 52 / 100
    unit_price = F.col("tot_ext").cast("double") / (
        F.col("tot_q").cast("double") / 100
    )
    sigma_c = F.sqrt((F.col("sd2") - sdD * sdD / nwD) / (nwD - 1))
    eoq = F.sqrt(
        2 * _EOQ_ORDER_COST_CENTS * d_annual / (_EOQ_HOLD_RATE * unit_price)
    )
    # association pinned to the oracle's tree: ((z*sigma_c)/100)*sqrt(L)
    ss = _EOQ_Z95 * sigma_c / 100 * F.sqrt(F.lit(float(_EOQ_LEAD_WEEKS)))
    rop = sdD / nwD / 100 * _EOQ_LEAD_WEEKS + ss
    return j.select(
        "brand",
        "n_weeks",
        F.col("sd").alias("demand_qc"),
        F.round(d_annual * 1000).cast("long").alias("d_annual_milli"),
        F.round(unit_price * 1000).cast("long").alias("unit_price_milli_cents"),
        F.round(eoq * 1000).cast("long").alias("eoq_units_milli"),
        F.round(ss * 1000).cast("long").alias("safety_stock_milli"),
        F.round(rop * 1000).cast("long").alias("reorder_point_milli"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# A115: bullwhip — order-date vs ship-date daily value-flow CV²
# ---------------------------------------------------------------------------

@query(
    "orders_bullwhip",
    """
    WITH od AS (
      SELECT YEAR(CAST(o_orderdate AS DATE)) AS yr,
             CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS v
      FROM orders GROUP BY 1, 2
    ),
    sd AS (
      SELECT YEAR(CAST(l_shipdate AS DATE)) AS yr,
             CAST(l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS v
      FROM lineitem GROUP BY 1, 2
    ),
    oy AS (
      SELECT yr, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS s2
      FROM od GROUP BY yr
    ),
    sy AS (
      SELECT yr, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS s2
      FROM sd GROUP BY yr
    )
    SELECT oy.yr AS yr, oy.n AS n_order_days, sy.n AS n_ship_days,
      CAST(ROUND((CAST(oy.n AS DOUBLE) * oy.s2
           - CAST(oy.s AS DOUBLE) * oy.s)
           / (CAST(oy.s AS DOUBLE) * oy.s) * 1000000) AS BIGINT)
        AS cv2_order_micro,
      CAST(ROUND((CAST(sy.n AS DOUBLE) * sy.s2
           - CAST(sy.s AS DOUBLE) * sy.s)
           / (CAST(sy.s AS DOUBLE) * sy.s) * 1000000) AS BIGINT)
        AS cv2_ship_micro,
      CAST(ROUND(((CAST(oy.n AS DOUBLE) * oy.s2
           - CAST(oy.s AS DOUBLE) * oy.s)
           / (CAST(oy.s AS DOUBLE) * oy.s))
           / ((CAST(sy.n AS DOUBLE) * sy.s2
           - CAST(sy.s AS DOUBLE) * sy.s)
           / (CAST(sy.s AS DOUBLE) * sy.s)) * 1000000) AS BIGINT)
        AS bullwhip_micro
    FROM oy JOIN sy ON oy.yr = sy.yr
    WHERE sy.s > 0 AND oy.s > 0
      AND (CAST(sy.n AS DOUBLE) * sy.s2 - CAST(sy.s AS DOUBLE) * sy.s) > 0
    ORDER BY yr
    """,
)
def orders_bullwhip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A115 — bullwhip ratio per year: the CV² of daily ORDER-side
    value flow (o_totalprice by order date — the demand signal
    entering the chain) over the CV² of daily SHIP-side value flow
    (l_extendedprice by ship date — fulfillment leaving it).  Ratio
    > 1 means ordering amplifies demand variance upstream (the
    bullwhip effect); the variance-side companion of A63's lead-time
    read and the why behind A60's replenishment cycles.

    Determinism: day buckets are exact cent sums; per-year n, Σv
    exact int64 and Σv² exact int128 before one double conversion;
    each CV² = (n·Σv² − (Σv)²)/(Σv)² and the ratio are fixed double
    trees, micro-quantized.

    Scale shape: two independent day-keyed aggregates (calendar-
    bounded day tables), year rollups (k rows), k-row join; no join
    of the raw fact tables against each other; readout ≤7 rows."""
    od = (
        _t(spark, sf_dir, "orders")
        .select(
            F.year(F.col("o_orderdate").cast("date")).alias("yr"),
            F.col("o_orderdate").cast("date").alias("day"),
            cents(F.col("o_totalprice")).alias("c"),
        )
        .groupBy("yr", "day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    sd = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.year(F.col("l_shipdate").cast("date")).alias("yr"),
            F.col("l_shipdate").cast("date").alias("day"),
            cents(F.col("l_extendedprice")).alias("c"),
        )
        .groupBy("yr", "day")
        .agg(F.sum("c").cast("long").alias("v"))
    )

    def yearly(df):
        return df.groupBy("yr").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
            F.sum(F.col("v").cast("decimal(38,0)") * F.col("v"))
            .cast("double")
            .alias("s2"),
        )

    oy = yearly(od)
    sy = yearly(sd)

    def cv2(n, s, s2):
        return (n.cast("double") * s2 - s.cast("double") * s) / (
            s.cast("double") * s
        )

    j = oy.alias("o").join(sy.alias("s"), "yr")
    cv2o = cv2(F.col("o.n"), F.col("o.s"), F.col("o.s2"))
    cv2s = cv2(F.col("s.n"), F.col("s.s"), F.col("s.s2"))
    return (
        j.where(
            (F.col("s.s") > 0)
            & (F.col("o.s") > 0)
            & (
                F.col("s.n").cast("double") * F.col("s.s2")
                - F.col("s.s").cast("double") * F.col("s.s")
                > 0
            )
        )
        .select(
            "yr",
            F.col("o.n").alias("n_order_days"),
            F.col("s.n").alias("n_ship_days"),
            F.round(cv2o * 1000000).cast("long").alias("cv2_order_micro"),
            F.round(cv2s * 1000000).cast("long").alias("cv2_ship_micro"),
            F.round(cv2o / cv2s * 1000000).cast("long").alias("bullwhip_micro"),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# A116: Neyman vs proportional stratified sample allocation
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 10000


@query(
    "events_neyman_allocation",
    f"""
    WITH v AS (
      SELECT event_type AS stratum,
             CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
    ),
    st AS (
      SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS s2
      FROM v GROUP BY stratum
    ),
    w AS (
      SELECT stratum, n,
             CAST(ROUND(CAST(n AS DOUBLE)
                  * SQRT((s2 - CAST(s AS DOUBLE) * s / n) / (n - 1)))
               AS BIGINT) AS wq,
             CAST(ROUND(SQRT((s2 - CAST(s AS DOUBLE) * s / n) / (n - 1))
                  * 1000) AS BIGINT) AS sigma_milli
      FROM st WHERE n >= 2
    ),
    tot AS (
      SELECT w.*, CAST(SUM(wq) OVER () AS BIGINT) AS wsum,
             CAST(SUM(n) OVER () AS BIGINT) AS nsum
      FROM w
    )
    SELECT stratum, n AS n_rows, sigma_milli,
      CAST(wq * 1000000 // wsum AS BIGINT) AS neyman_share_ppm,
      CAST(wq * {_NEYMAN_BUDGET} // wsum AS BIGINT) AS n_neyman,
      CAST(n * {_NEYMAN_BUDGET} // nsum AS BIGINT) AS n_proportional
    FROM tot ORDER BY stratum
    """,
)
def events_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A116 — Neyman-optimal stratified sample allocation across
    event types: with a fixed labeling budget, stratum h gets
    n_h ∝ N_h·σ_h (variance-optimal) vs the proportional N_h
    baseline.  THE survey-design primitive for budgeted human-eval /
    annotation passes over a 100 TB corpus — high-variance strata
    earn more labels.

    Determinism: cent-quantized values; per-stratum N, Σx exact
    int64 and Σx² exact int128; σ_h one Bessel double tree; the
    allocation weight N_h·σ_h rounds to an exact integer BEFORE the
    bounded denominator sum (so shares and counts are integer floor
    divisions of exact int64s).

    Scale shape: one stratum-keyed aggregate absorbs the scan; the
    k-row weight table rides a bounded window (bounded_single_group);
    readout k rows."""
    v = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("stratum"),
            cents(F.col("value")).alias("x"),
        )
    )
    st = v.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("s2"),
    )
    nD, sD = F.col("n").cast("double"), F.col("s").cast("double")
    sigma = F.sqrt((F.col("s2") - sD * sD / nD) / (nD - 1))
    w = st.where(F.col("n") >= 2).select(
        "stratum",
        "n",
        F.round(nD * sigma).cast("long").alias("wq"),
        F.round(sigma * 1000).cast("long").alias("sigma_milli"),
    )
    w = bounded_single_group(w)  # k-stratum bounded table
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = w.select(
        "stratum",
        "n",
        "wq",
        "sigma_milli",
        F.sum("wq").over(w_all).cast("long").alias("wsum"),
        F.sum("n").over(w_all).cast("long").alias("nsum"),
    )
    return tot.select(
        "stratum",
        F.col("n").alias("n_rows"),
        "sigma_milli",
        F.expr("CAST(wq * 1000000 div wsum AS BIGINT)").alias(
            "neyman_share_ppm"
        ),
        F.expr(f"CAST(wq * {_NEYMAN_BUDGET} div wsum AS BIGINT)").alias(
            "n_neyman"
        ),
        F.expr(f"CAST(n * {_NEYMAN_BUDGET} div nsum AS BIGINT)").alias(
            "n_proportional"
        ),
    ).orderBy("stratum")
