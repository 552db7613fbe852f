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

    Scale shape: argmax is INLINE per-row arithmetic (no explode, no
    shuffle of scores); one (true, pred)-keyed aggregate (≤25 cells)
    absorbs the scan; margins and moments ride k-row tables; readout
    1 row.  (r12: the argmax is ONE greatest() over (score, -index)
    structs + element_at into the literal class array — every score
    expression is referenced exactly ONCE, so exactly 5 md5/row reach
    the plan.  The r11 unroll — greatest() over named columns + a
    when-chain re-comparing each column — collapsed into a single
    projection whose when-chain duplicated every score expression:
    the committed r11 plan carries 45 md5 calls/row, and the
    generated method was big enough to fall off the JIT, measured
    [33, 19, 11, 29, 135] s across 5 fresh-session runs at sf0.1
    where this form holds ~1 s.  Lexicographic struct max picks the
    highest score and, on ties, the largest -i — the smallest index,
    i.e. the FIRST ascending class at the max, exactly
    array_position(array_max) over the ascending class array; pinned
    by tests/test_r11_opt.py::
    test_mcc_argmax_unroll_matches_array_position.  The events scan
    stays spread to session parallelism, r11.)"""
    from bytesprocessor_spark.sources.tables import spread_scan

    ev = spread_scan(_t(spark, sf_dir, "events"), "event_id")

    def eff(i, c):
        return (
            (
                _h60(
                    F.concat(
                        F.lit("cls:"),
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.lit(c),
                    )
                )
                % 1000000
            )
            + F.when(F.lit(c) == F.col("event_type"), _MCC_BOOST).otherwise(0)
        ).alias(f"e{i}")

    base = ev.select(
        F.col("event_type").alias("y"),
        *[eff(i, c) for i, c in enumerate(_MCC_CLASSES)],
    )
    m = F.greatest(
        *[
            F.struct(F.col(f"e{i}").alias("s"), F.lit(-i).alias("ni"))
            for i in range(len(_MCC_CLASSES))
        ]
    )
    yhat = F.element_at(
        F.array(*[F.lit(c) for c in _MCC_CLASSES]),
        (F.lit(1) - m["ni"]).cast("int"),
    )
    from bytesprocessor_spark.operators.caching import persist_intermediate

    # the ≤25-cell confusion table feeds THREE differently-pruned
    # consumers (row margins, column margins, diagonal) — distinct
    # canonical subtrees, so AQE exchange reuse cannot dedupe them and
    # without the persist the scan+argmax subtree runs three times
    # (the span/DSIR lesson, r11): persist the k²-row table so the
    # corpus is scanned once
    conf = persist_intermediate(
        base.select("y", yhat.alias("yhat"))
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
             CAST(FLOOR(DATE_DIFF('day', DATE '1995-01-01',
               CAST(l.l_shipdate AS DATE)) / 7.0) AS BIGINT) AS week,
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


# ---------------------------------------------------------------------------
# GR13: modularity of the GR9 LPA communities
# ---------------------------------------------------------------------------

def _modularity_oracle_sql() -> str:
    from bytesprocessor_spark.queries_r7 import _LPA_ITERS, lpa_cte_chain

    return lpa_cte_chain() + f""",
    deg AS (
      SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS z FROM e0 UNION ALL SELECT b AS z FROM e0
      ) GROUP BY z
    ),
    md AS (
      SELECT l.lbl, CAST(SUM(d.d) AS BIGINT) AS dc,
             CAST(COUNT(*) AS BIGINT) AS n_members
      FROM l{_LPA_ITERS} l JOIN deg d ON l.z = d.z GROUP BY l.lbl
    ),
    ie AS (
      SELECT la.lbl AS lbl, CAST(COUNT(*) AS BIGINT) AS ec
      FROM e0 e
      JOIN l{_LPA_ITERS} la ON e.a = la.z
      JOIN l{_LPA_ITERS} lb ON e.b = lb.z
      WHERE la.lbl = lb.lbl GROUP BY la.lbl
    ),
    c AS (
      SELECT md.lbl, md.n_members, md.dc,
             CAST(COALESCE(ie.ec, 0) AS BIGINT) AS ec,
             CAST(SUM(md.dc) OVER () AS BIGINT) AS m2
      FROM md LEFT JOIN ie ON md.lbl = ie.lbl
    )
    SELECT CAST(lbl AS BIGINT) AS community, n_members,
           ec AS intra_edges, dc AS degree_sum,
      CAST(ROUND((CAST(2 * ec AS DOUBLE) / m2
           - (CAST(dc AS DOUBLE) / m2) * (CAST(dc AS DOUBLE) / m2))
           * 1000000) AS BIGINT) AS q_contrib_micro
    FROM c ORDER BY community
    """


@query("graph_modularity", _modularity_oracle_sql())
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR13 — Newman modularity of the GR9 LPA partition:
    Q = Σ_c (e_c/m − (D_c/2m)²) over communities, read out per
    community (members, intra-edges, degree mass, Q contribution).
    GR9 SAYS what the communities are; this says whether the
    partition is any GOOD (Q near 0 = no better than random wiring)
    — the fitness read behind every community-driven curation
    decision (L2b's dedup clusters, GR10's co-occurrence groups).

    Determinism: reuses GR9's bit-deterministic 3-round trajectory
    (`queries_r7.lpa_run` / `lpa_cte_chain` — same edges, same
    labels); e_c, D_c, 2m are exact int64 counts; each community's
    Q contribution is one fixed double tree, micro-quantized.

    Scale shape: on top of GR9's per-round equi-joins, one degree
    aggregate, one labels⋈degrees join, one 2-sided edge⋈labels
    equi-join (all node-keyed shuffles), community-keyed rollups;
    readout is community-bounded (entity scale)."""
    from bytesprocessor_spark.queries_r7 import lpa_run

    e0, labels = lpa_run(spark, sf_dir)
    deg = (
        e0.select(F.col("a").alias("z"))
        .unionAll(e0.select(F.col("b").alias("z")))
        .groupBy("z")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    md = (
        labels.join(deg, "z")
        .groupBy("lbl")
        .agg(
            F.sum("d").cast("long").alias("dc"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
    )
    la = labels.select(F.col("z").alias("a"), F.col("lbl").alias("la"))
    lb = labels.select(F.col("z").alias("b"), F.col("lbl").alias("lb"))
    ie = (
        e0.join(la, "a")
        .join(lb, "b")
        .where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lbl"))
        .agg(F.count(F.lit(1)).cast("long").alias("ec"))
    )
    c = md.join(ie, "lbl", "left").select(
        "lbl",
        "n_members",
        "dc",
        F.coalesce("ec", F.lit(0)).cast("long").alias("ec"),
    )
    c = bounded_single_group(c)  # community-bounded table
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = c.withColumn("m2", F.sum("dc").over(w_all).cast("long"))
    m2D = F.col("m2").cast("double")
    dcD = F.col("dc").cast("double")
    q = (F.col("ec") * 2).cast("double") / F.col("m2") - (dcD / m2D) * (
        dcD / m2D
    )
    return c.select(
        F.col("lbl").cast("long").alias("community"),
        "n_members",
        F.col("ec").alias("intra_edges"),
        F.col("dc").alias("degree_sum"),
        F.round(q * 1000000).cast("long").alias("q_contrib_micro"),
    ).orderBy("community")


# ---------------------------------------------------------------------------
# EV34: expected reciprocal rank @10 over a pinned graded ranking
# ---------------------------------------------------------------------------

_ERR_QUERIES = 20
_ERR_K = 10


@query(
    "eval_err_at_k",
    f"""
    WITH q AS (SELECT UNNEST(range(0, {_ERR_QUERIES})) AS query_id),
    s AS (
      SELECT q.query_id, d.doc_id,
             GREATEST(0, {_H60_DUCK.format(
                 "'errg:' || CAST(q.query_id AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)"
             )} % 16 - 12) AS g,
             {_H60_DUCK.format(
                 "'errs:' || CAST(q.query_id AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)"
             )} % 262144 AS noise
      FROM q CROSS JOIN documents d
    ),
    r AS (
      SELECT query_id, doc_id, g,
             ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY g * 262144 + noise DESC, doc_id) AS rk
      FROM s
    ),
    t AS (
      SELECT query_id, rk, (1::BIGINT << g) - 1 AS num
      FROM r WHERE rk <= {_ERR_K}
    ),
    tp AS (
      SELECT query_id, rk, num,
             CAST(COALESCE(PRODUCT(8 - num) OVER (PARTITION BY query_id
                 ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 1) AS BIGINT) AS t
      FROM t
    )
    SELECT query_id,
           CAST(COUNT(*) AS BIGINT) AS n_ranked,
           CAST(SUM(CAST(ROUND(CAST(num * t AS DOUBLE)
                / CAST(rk * (1::BIGINT << (3 * rk)) AS DOUBLE)
                * 1000000000) AS BIGINT)) AS BIGINT) AS err_nano
    FROM tp GROUP BY query_id ORDER BY query_id
    """,
)
def eval_err_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV34 — expected reciprocal rank @10 of a pinned graded ranking
    over the documents corpus: relevance g ∈ {{0..3}} per (query, doc)
    from an md5 grade hash, ranking score = g·2^18 + md5 noise (so the
    ranker is good but imperfect — the interesting regime), and
    ERR = Σ_r (1/r)·R_r·Π_{{i<r}}(1−R_i) with R = (2^g−1)/8.  The
    cascade-model metric that, unlike EV8's NDCG, says a user STOPS
    at the first satisfying result — the readout that separates
    'good at rank 1' from 'good on average'.

    Determinism: grades and noise are exact ints with (score desc,
    doc_id) total order; R is an exact eighth, so the survival
    product T_r = Π(8−num_i) is an exact int64 (≤ 8^9) — DuckDB reads
    it off a windowed PRODUCT (exact: every partial product < 2^53),
    Spark folds the ordered num array with integer (T, 8^r)
    accumulators; each term is ONE double division of exact int64s,
    nano-quantized before the integer sum.

    Scale shape: {_ERR_QUERIES}-row query frame broadcast onto one
    corpus scan (the EV13 posture), per-query top-{_ERR_K} window,
    k-rows-per-query fold; readout {_ERR_QUERIES} rows.  The scale
    path swaps the exact scan for an index candidate stage like
    every other L3 consumer."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    q = F.broadcast(
        spark.range(_ERR_QUERIES).select(F.col("id").alias("query_id"))
    )

    def h(tag):
        return _h60(
            F.concat(
                F.lit(tag),
                F.col("query_id").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        )

    s = docs.crossJoin(q).select(
        "query_id",
        "doc_id",
        F.greatest(F.lit(0), h("errg:") % 16 - 12).alias("g"),
        (h("errs:") % 262144).alias("noise"),
    )
    w = Window.partitionBy("query_id").orderBy(
        (F.col("g") * 262144 + F.col("noise")).desc(), "doc_id"
    )
    t = (
        s.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _ERR_K)
        .select(
            "query_id",
            "rk",
            F.expr("CAST(shiftleft(1, CAST(g AS INT)) AS BIGINT) - 1").alias(
                "num"
            ),
        )
    )
    arr = (
        t.groupBy("query_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rk", "num"))
            ).alias("a")
        )
        .select("query_id", F.expr("transform(a, x -> x.num)").alias("nums"))
    )
    fold = F.aggregate(
        F.col("nums"),
        F.struct(
            F.lit(1).cast("long").alias("t"),
            F.lit(1).cast("long").alias("d"),
            F.lit(0).cast("long").alias("r"),
            F.lit(0).cast("long").alias("s"),
        ),
        lambda acc, x: F.struct(
            (acc["t"] * (F.lit(8) - x)).cast("long").alias("t"),
            (acc["d"] * 8).cast("long").alias("d"),
            (acc["r"] + 1).cast("long").alias("r"),
            (
                acc["s"]
                + F.round(
                    (x * acc["t"]).cast("double")
                    / ((acc["r"] + 1) * (acc["d"] * 8)).cast("double")
                    * 1000000000
                ).cast("long")
            ).alias("s"),
        ),
        lambda acc: acc["s"],
    )
    return arr.select(
        "query_id",
        F.size("nums").cast("long").alias("n_ranked"),
        fold.alias("err_nano"),
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# A117: G-test of independence (type x weekend)
# ---------------------------------------------------------------------------

@query(
    "events_gtest",
    """
    WITH cells AS (
      SELECT event_type,
             CASE WHEN ISODOW(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS wknd,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, wknd, o,
             CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
             CAST(SUM(o) OVER (PARTITION BY wknd) AS BIGINT) AS c,
             CAST(SUM(o) OVER () AS BIGINT) AS n
      FROM cells
    ),
    t AS (
      SELECT n,
             CAST(ROUND(CAST(o AS DOUBLE)
                  * LN(CAST(o AS DOUBLE) * n / (CAST(r AS DOUBLE) * c))
                  * 1000000) AS BIGINT) AS term_micro,
             event_type, wknd
      FROM m WHERE o > 0
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(2 * SUM(term_micro) AS BIGINT) AS g_micro,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT wknd) - 1) AS BIGINT) AS df,
           CAST(CASE (COUNT(DISTINCT event_type) - 1)
                     * (COUNT(DISTINCT wknd) - 1)
                WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815
                WHEN 4 THEN 9488 WHEN 5 THEN 11070 WHEN 6 THEN 12592
                WHEN 7 THEN 14067 ELSE 15507 END AS BIGINT) AS crit_milli,
           2 * SUM(term_micro) > 1000 * CASE (COUNT(DISTINCT event_type) - 1)
                     * (COUNT(DISTINCT wknd) - 1)
                WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815
                WHEN 4 THEN 9488 WHEN 5 THEN 11070 WHEN 6 THEN 12592
                WHEN 7 THEN 14067 ELSE 15507 END AS reject_independence
    FROM t
    """,
)
def events_gtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A117 — G-test (log-likelihood-ratio test) of independence
    between event type and weekend: G = 2 Σ O·ln(O·n/(r·c)) over the
    type × weekend contingency, against the chi-square((R−1)(C−1))
    95% critical.  The additive counterpart of A41's Pearson χ²: G
    decomposes exactly across nested partitions (the property that
    makes it the standard for hierarchical log-linear reads), and is
    the better approximation when expected cells are small.

    Determinism: exact int64 cells and margins; each cell's
    O·ln(O·n/(r·c)) is one fixed double tree micro-quantized BEFORE
    the bounded sum; criticals are pinned milli literals keyed by df.

    Scale shape: one (type, weekend)-keyed aggregate absorbs the
    scan; margins ride windows over the ≤2k-cell bounded table;
    readout 1 row."""
    cells = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.when(F.expr("weekday(ts)") >= 5, 1).otherwise(0).alias("wknd"),
        )
        .groupBy("event_type", "wknd")
        .agg(F.count("*").cast("long").alias("o"))
    )
    cells = bounded_single_group(cells)  # type x weekend bounded cells
    w_r = Window.partitionBy("__opid", "event_type")
    w_c = Window.partitionBy("__opid", "wknd")
    w_all = Window.partitionBy("__opid")
    m = cells.select(
        "event_type",
        "wknd",
        "o",
        F.sum("o").over(w_r).cast("long").alias("r"),
        F.sum("o").over(w_c).cast("long").alias("c"),
        F.sum("o").over(w_all).cast("long").alias("n"),
    ).where(F.col("o") > 0)
    oD = F.col("o").cast("double")
    term = F.round(
        oD * F.log(oD * F.col("n") / (F.col("r").cast("double") * F.col("c")))
        * 1000000
    ).cast("long")
    t = m.select("n", term.alias("term_micro"), "event_type", "wknd")
    crit = (
        "CASE (COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT wknd) - 1) "
        "WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815 "
        "WHEN 4 THEN 9488 WHEN 5 THEN 11070 WHEN 6 THEN 12592 "
        "WHEN 7 THEN 14067 ELSE 15507 END"
    )
    return t.agg(
        F.max("n").cast("long").alias("n"),
        (F.sum("term_micro") * 2).cast("long").alias("g_micro"),
        F.expr(
            "CAST((COUNT(DISTINCT event_type) - 1)"
            " * (COUNT(DISTINCT wknd) - 1) AS BIGINT)"
        ).alias("df"),
        F.expr(f"CAST({crit} AS BIGINT)").alias("crit_milli"),
        F.expr(f"2 * SUM(term_micro) > 1000 * {crit}").alias(
            "reject_independence"
        ),
    )


# ---------------------------------------------------------------------------
# A118: Goodman-Kruskal gamma + Somers' D (ordinal association)
# ---------------------------------------------------------------------------

@query(
    "orders_gk_gamma",
    """
    WITH v AS (
      SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS x,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS val
      FROM orders
    ),
    cuts AS (
      SELECT CAST(quantile_disc(val, 0.25) AS BIGINT) AS q1,
             CAST(quantile_disc(val, 0.50) AS BIGINT) AS q2,
             CAST(quantile_disc(val, 0.75) AS BIGINT) AS q3
      FROM v
    ),
    b AS (
      SELECT x,
             1 + CASE WHEN val > q1 THEN 1 ELSE 0 END
               + CASE WHEN val > q2 THEN 1 ELSE 0 END
               + CASE WHEN val > q3 THEN 1 ELSE 0 END AS y
      FROM v CROSS JOIN cuts
    ),
    cells AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS o FROM b GROUP BY x, y
    ),
    pairs AS (
      SELECT
        CAST(SUM(CASE WHEN c2.x > c1.x AND c2.y > c1.y
                 THEN CAST(c1.o AS HUGEINT) * c2.o ELSE 0 END) AS DOUBLE)
          AS conc,
        CAST(SUM(CASE WHEN c2.x > c1.x AND c2.y < c1.y
                 THEN CAST(c1.o AS HUGEINT) * c2.o ELSE 0 END) AS DOUBLE)
          AS disc
      FROM cells c1 CROSS JOIN cells c2
    ),
    marg AS (
      SELECT (SELECT CAST(SUM(o) AS BIGINT) FROM cells) AS n,
             CAST(SUM(CAST(rx AS HUGEINT) * (rx - 1)) AS DOUBLE) / 2 AS tx
      FROM (SELECT CAST(SUM(o) AS BIGINT) AS rx FROM cells GROUP BY x)
    )
    SELECT n AS n_orders, conc AS c_pairs, disc AS d_pairs,
      CAST(ROUND((conc - disc) / GREATEST(conc + disc, 1) * 1000000)
        AS BIGINT) AS gamma_micro,
      CAST(ROUND((conc - disc)
           / GREATEST(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2 - tx,
                      1)
           * 1000000) AS BIGINT) AS somers_d_micro
    FROM pairs CROSS JOIN marg
    """,
)
def orders_gk_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A118 — ordinal association between order priority (5 ordered
    levels) and order-value quartile: Goodman-Kruskal gamma =
    (C−D)/(C+D) over concordant/discordant pairs, and Somers'
    D(y|x) = (C−D)/(n(n−1)/2 − T_x) which additionally charges pairs
    tied on the OUTCOME.  The ordinal-vs-ordinal companion of A73's
    Kendall tau-b (which handles continuous ties) and A80's nominal
    Cramér's V — the right association read when both axes are
    ordered categories.

    Determinism: quartile cuts are percentile_disc data points
    (exact int64, broadcast); the r×c contingency is exact int64;
    C/D/T accumulate per-cell-pair products in exact int128
    (HUGEINT / decimal(38)) over the ≤20-cell table; gamma and
    Somers' D are fixed double trees, micro-quantized.

    Scale shape: one global percentile aggregate (1 row, broadcast
    back), one (x, y)-keyed aggregate absorbs the scan; the pair
    scan is a ≤20×20 bounded self-join (declared nested-loop);
    readout 1 row."""
    v = _t(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("x"),
        cents(F.col("o_totalprice")).alias("val"),
    )
    cuts = v.agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY val)")
        .cast("long")
        .alias("q1"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY val)")
        .cast("long")
        .alias("q2"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY val)")
        .cast("long")
        .alias("q3"),
    )
    b = v.crossJoin(F.broadcast(cuts)).select(
        "x",
        (
            F.lit(1)
            + F.when(F.col("val") > F.col("q1"), 1).otherwise(0)
            + F.when(F.col("val") > F.col("q2"), 1).otherwise(0)
            + F.when(F.col("val") > F.col("q3"), 1).otherwise(0)
        ).alias("y"),
    )
    cells = b.groupBy("x", "y").agg(F.count("*").cast("long").alias("o"))
    c1 = cells.select(
        F.col("x").alias("x1"), F.col("y").alias("y1"), F.col("o").alias("o1")
    )
    c2 = cells.select(
        F.col("x").alias("x2"), F.col("y").alias("y2"), F.col("o").alias("o2")
    )
    prod = F.col("o1").cast("decimal(38,0)") * F.col("o2")
    pairs = c1.crossJoin(c2).agg(
        F.sum(
            F.when((F.col("x2") > F.col("x1")) & (F.col("y2") > F.col("y1")), prod)
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        )
        .cast("double")
        .alias("conc"),
        F.sum(
            F.when((F.col("x2") > F.col("x1")) & (F.col("y2") < F.col("y1")), prod)
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        )
        .cast("double")
        .alias("disc"),
    )
    rx = cells.groupBy("x").agg(F.sum("o").cast("long").alias("rx"))
    marg = cells.agg(F.sum("o").cast("long").alias("n")).crossJoin(
        rx.agg(
            (
                F.sum(F.col("rx").cast("decimal(38,0)") * (F.col("rx") - 1))
                .cast("double")
                / 2
            ).alias("tx")
        )
    )
    j = pairs.crossJoin(marg)
    nD = F.col("n").cast("double")
    return j.select(
        F.col("n").alias("n_orders"),
        F.col("conc").alias("c_pairs"),
        F.col("disc").alias("d_pairs"),
        # degenerate-input guard (ADVICE r9): a one-cell contingency
        # table gives conc+disc = 0 (and all-tied-on-x gives a zero
        # Somers' denominator) — inf/nan sentinels differ across
        # engines, so both sides pin the denominator at >= 1, making
        # the degenerate statistic an agreed exact 0
        F.round(
            (F.col("conc") - F.col("disc"))
            / F.greatest(F.col("conc") + F.col("disc"), F.lit(1.0))
            * 1000000
        )
        .cast("long")
        .alias("gamma_micro"),
        F.round(
            (F.col("conc") - F.col("disc"))
            / F.greatest(nD * (nD - 1) / 2 - F.col("tx"), F.lit(1.0))
            * 1000000
        )
        .cast("long")
        .alias("somers_d_micro"),
    )


# ---------------------------------------------------------------------------
# EV35: pinball (quantile) loss of parity-split quantile forecasts
# ---------------------------------------------------------------------------

_PINBALL_QTS = (1, 5, 9)  # tenths: q = 0.1, 0.5, 0.9


def _pinball_oracle() -> str:
    arms = []
    for qt in _PINBALL_QTS:
        arms.append(
            f"""
    SELECT t.event_type, CAST({qt} AS BIGINT) AS q_tenths,
           p.p{qt} AS pred,
           CAST(COUNT(*) AS BIGINT) AS n_test_days,
           CAST(SUM(GREATEST({qt} * (t.x - p.p{qt}),
                             ({qt} - 10) * (t.x - p.p{qt}))) AS BIGINT)
             AS pinball_sum_tenths,
           CAST(SUM(GREATEST({qt} * (t.x - p.p{qt}),
                             ({qt} - 10) * (t.x - p.p{qt}))) * 100
                // COUNT(*) AS BIGINT) AS mean_loss_milli
    FROM test t JOIN preds p ON t.event_type = p.event_type
    GROUP BY t.event_type, p.p{qt}"""
        )
    body = "\nUNION ALL\n".join(arms)
    return f"""
    WITH day AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    split AS (
      SELECT event_type, x,
             DATE_DIFF('day', DATE '1970-01-01', day) % 2 AS par
      FROM day
    ),
    preds AS (
      SELECT event_type,
             CAST(quantile_disc(x, 0.1) AS BIGINT) AS p1,
             CAST(quantile_disc(x, 0.5) AS BIGINT) AS p5,
             CAST(quantile_disc(x, 0.9) AS BIGINT) AS p9
      FROM split WHERE par = 0 GROUP BY event_type
    ),
    test AS (SELECT event_type, x FROM split WHERE par = 1)
    {body}
    ORDER BY event_type, q_tenths
    """


@query("eval_pinball_loss", _pinball_oracle())
def eval_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV35 — pinball (quantile) loss of a parity-split quantile
    forecast: per event type, the 0.1/0.5/0.9 quantiles of daily
    counts on even days (train) are scored on odd days (test) with
    L_q(y, ŷ) = max(q(y−ŷ), (q−1)(y−ŷ)).  THE proper scoring rule
    for quantile forecasts — EV21 scores point predictions, this
    scores the P10/P50/P90 band a capacity planner actually ships
    (under-prediction of P90 hurts 9× more than over).

    Determinism: integer day counts; percentile_disc picks data
    points (exact int64); the loss is exact integer arithmetic in
    tenths (GREATEST of two integer products), floor-division milli
    mean.

    Scale shape: one (type, day) aggregate absorbs the scan
    (calendar-bounded), a k-row train-quantile table joins the
    bounded test-day table; readout 3 rows per type."""
    day = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("x"))
    )
    split = day.select(
        "event_type",
        "x",
        (F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 2).alias(
            "par"
        ),
    )
    preds = (
        split.where(F.col("par") == 0)
        .groupBy("event_type")
        .agg(
            *[
                F.expr(
                    f"percentile_disc(0.{qt}) WITHIN GROUP (ORDER BY x)"
                )
                .cast("long")
                .alias(f"p{qt}")
                for qt in _PINBALL_QTS
            ]
        )
    )
    test = split.where(F.col("par") == 1).select("event_type", "x")
    j = test.join(F.broadcast(preds), "event_type")
    arms = []
    for qt in _PINBALL_QTS:
        loss = F.greatest(
            F.lit(qt) * (F.col("x") - F.col(f"p{qt}")),
            F.lit(qt - 10) * (F.col("x") - F.col(f"p{qt}")),
        )
        arms.append(
            j.groupBy("event_type", f"p{qt}").agg(
                F.count("*").cast("long").alias("n_test_days"),
                F.sum(loss).cast("long").alias("pinball_sum_tenths"),
            ).select(
                "event_type",
                F.lit(qt).cast("long").alias("q_tenths"),
                F.col(f"p{qt}").alias("pred"),
                "n_test_days",
                "pinball_sum_tenths",
                F.expr(
                    "CAST(pinball_sum_tenths * 100 div n_test_days AS BIGINT)"
                ).alias("mean_loss_milli"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionAll(a)
    return out.orderBy("event_type", "q_tenths")


# ---------------------------------------------------------------------------
# A119: Lorenz curve deciles (distributed NTILE at entity scale)
# ---------------------------------------------------------------------------

@query(
    "orders_lorenz_deciles",
    """
    WITH t AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
             NTILE(10) OVER (ORDER BY CAST(ROUND(o_totalprice * 100)
                 AS BIGINT), o_orderkey) AS tile
      FROM orders
    ),
    d AS (
      SELECT tile, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS v
      FROM t GROUP BY tile
    ),
    c AS (
      SELECT tile, n, v,
             CAST(SUM(n) OVER (ORDER BY tile ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cn,
             CAST(SUM(v) OVER (ORDER BY tile ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cv,
             CAST(SUM(n) OVER () AS BIGINT) AS tn,
             CAST(SUM(v) OVER () AS BIGINT) AS tv
      FROM d
    )
    SELECT CAST(tile AS BIGINT) AS decile, n AS n_orders, v AS value_cents,
      CAST(cn * 1000000 // tn AS BIGINT) AS cum_pop_ppm,
      CAST(cv * 1000000 // tv AS BIGINT) AS cum_value_ppm,
      CAST(cn * 1000000 // tn - cv * 1000000 // tv AS BIGINT)
        AS lorenz_gap_ppm
    FROM c ORDER BY decile
    """,
)
def orders_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A119 — the Lorenz curve read out at deciles: orders ranked by
    value (ascending, orderkey tiebreak) are cut into SQL-NTILE
    deciles; each row reports cumulative population share vs
    cumulative value share and their gap.  A35's Gini integrates this
    curve to one number — this is the curve itself, the readout a
    pricing/concentration analyst actually plots (and the corpus
    token-mass analogue for sources).

    Determinism: cent values with orderkey tiebreak make the NTILE
    order total; decile aggregates and ppm shares are exact int64
    floor divisions.

    Scale shape: the decile assignment is the DISTRIBUTED NTILE
    device (operators/ranking.py: range repartition + local
    row_number + broadcast offsets — bit-identical to SQL NTILE, no
    single-partition window); one 10-row aggregate + bounded cum
    window; readout 10 rows."""
    from bytesprocessor_spark.operators.ranking import distributed_ntile

    v = _t(spark, sf_dir, "orders").select(
        cents(F.col("o_totalprice")).alias("x"),
        F.col("o_orderkey").alias("k"),
    )
    t = distributed_ntile(v, [F.col("x").asc(), F.col("k").asc()], 10)
    d = t.groupBy("tile").agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("v")
    )
    d = bounded_single_group(d)  # 10-row decile table
    w_cum = (
        Window.partitionBy("__opid")
        .orderBy("tile")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = d.select(
        "tile",
        "n",
        "v",
        F.sum("n").over(w_cum).cast("long").alias("cn"),
        F.sum("v").over(w_cum).cast("long").alias("cv"),
        F.sum("n").over(w_all).cast("long").alias("tn"),
        F.sum("v").over(w_all).cast("long").alias("tv"),
    )
    return c.select(
        F.col("tile").cast("long").alias("decile"),
        F.col("n").alias("n_orders"),
        F.col("v").alias("value_cents"),
        F.expr("CAST(cn * 1000000 div tn AS BIGINT)").alias("cum_pop_ppm"),
        F.expr("CAST(cv * 1000000 div tv AS BIGINT)").alias("cum_value_ppm"),
        F.expr(
            "CAST(cn * 1000000 div tn - cv * 1000000 div tv AS BIGINT)"
        ).alias("lorenz_gap_ppm"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# A120: Hurst exponent by rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------

_HURST_WINDOWS = (4, 8, 16)
# ln(w) pinned micro literals (the A111 constant discipline)
_HURST_LNW_MICRO = {4: 1386294, 8: 2079442, 16: 2772589}


def _hurst_oracle() -> str:
    per_w = []
    heads = []
    for w in _HURST_WINDOWS:
        heads.append(f"""
    b{w} AS (SELECT (rn - 1) // {w} AS blk, rn, x FROM idx),
    s{w} AS (
      SELECT blk, CAST(SUM(x) AS BIGINT) AS s
      FROM b{w} GROUP BY blk HAVING COUNT(*) = {w}
    ),
    c{w} AS (
      SELECT b.blk, b.x - s.s // {w} AS d,
             CAST(SUM(b.x - s.s // {w}) OVER (PARTITION BY b.blk
                 ORDER BY b.rn ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM b{w} b JOIN s{w} s ON b.blk = s.blk
    ),
    r{w} AS (
      SELECT blk, CAST(MAX(cum) - MIN(cum) AS BIGINT) AS rng,
             CAST(SUM(d * d) AS BIGINT) AS s2
      FROM c{w} GROUP BY blk
    ),
    v{w} AS (
      SELECT CAST({w} AS BIGINT) AS w,
             CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(CAST(ROUND(CAST(rng AS DOUBLE)
                  / SQRT(CAST(s2 AS DOUBLE) / {w}) * 1000000) AS BIGINT))
                  // COUNT(*) AS BIGINT) AS avg_rs_micro
      FROM r{w} WHERE s2 > 0
    )""")
        per_w.append(f"SELECT * FROM v{w}")
    xmu_case = " ".join(
        f"WHEN {w} THEN {_HURST_LNW_MICRO[w]}" for w in _HURST_WINDOWS
    )
    return f"""
    WITH wk AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    idx AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM wk
    ),{",".join(heads)},
    u AS (
      SELECT w, n_blocks, avg_rs_micro,
             CAST(CASE w {xmu_case} END AS BIGINT) AS xmu,
             CAST(ROUND(LN(CAST(avg_rs_micro AS DOUBLE)) * 1000000)
               AS BIGINT) AS ymu
      FROM ({" UNION ALL ".join(per_w)})
      WHERE n_blocks > 0 AND avg_rs_micro > 0
    ),
    t AS (
      SELECT u.*,
             CAST(SUM(xmu * ymu) OVER () AS BIGINT) AS sxy,
             CAST(SUM(xmu) OVER () AS BIGINT) AS sx,
             CAST(SUM(ymu) OVER () AS BIGINT) AS sy,
             CAST(SUM(xmu * xmu) OVER () AS BIGINT) AS sxx,
             CAST(COUNT(*) OVER () AS BIGINT) AS k
      FROM u
    )
    SELECT w, n_blocks, avg_rs_micro,
      CAST(ROUND(CAST(k * sxy - sx * sy AS DOUBLE)
           / CAST(k * sxx - sx * sx AS DOUBLE) * 1000) AS BIGINT)
        AS hurst_milli
    FROM t ORDER BY w
    """


@query("events_hurst_rs", _hurst_oracle())
def events_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A120 — Hurst exponent by rescaled-range analysis of the daily
    purchase-count series: for block sizes w ∈ {4, 8, 16}, each
    complete w-day block contributes R/S (range of integer-centered
    cumulative deviations over the block's population std); the
    log-log slope of average R/S against w is H.  H ≈ 0.5 = no
    memory, H > 0.5 = long-range persistence — the dependence read
    A34's short-lag ACF and A112's Ljung-Box cannot see (LRD decays
    too slowly for fixed lags).

    Determinism: block means floor to integers (A104 idiom) so
    cumulative deviations, ranges and Σd² are exact int64; per-block
    R/S is one double tree micro-quantized BEFORE the per-w integer
    average; ln(w) regressors are pinned micro literals, ln(avg R/S)
    quantizes to micro, and the slope is one double ratio of exact
    int64 regression moments (the 1e6 scale cancels in centering).

    Scale shape: one day-keyed aggregate absorbs the scan (calendar-
    bounded day table); block machinery rides bounded windows
    (bounded_single_group); readout ≤3 rows."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    wk = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    wk = bounded_single_group(wk)  # calendar-bounded day table
    w_ord = Window.partitionBy("__opid").orderBy("day")
    idx = wk.select("x", "__opid", F.row_number().over(w_ord).alias("rn"))
    per_w = []
    for w in _HURST_WINDOWS:
        b = idx.select(
            "__opid",
            "rn",
            "x",
            F.expr(f"(rn - 1) div {w}").alias("blk"),
        )
        s = (
            b.groupBy("blk")
            .agg(F.sum("x").cast("long").alias("s"), F.count("*").alias("cnt"))
            .where(F.col("cnt") == w)
            .select("blk", "s")
        )
        c = b.join(F.broadcast(s), "blk").select(
            "__opid",
            "blk",
            "rn",
            (F.col("x") - F.expr(f"s div {w}")).alias("d"),
        )
        w_blk = (
            Window.partitionBy("__opid", "blk")
            .orderBy("rn")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        c = c.withColumn("cum", F.sum("d").over(w_blk).cast("long"))
        r = c.groupBy("blk").agg(
            (F.max("cum") - F.min("cum")).cast("long").alias("rng"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"),
        )
        rs = F.round(
            F.col("rng").cast("double")
            / F.sqrt(F.col("s2").cast("double") / w)
            * 1000000
        ).cast("long")
        v = (
            r.where(F.col("s2") > 0)
            .agg(
                F.count("*").cast("long").alias("n_blocks"),
                F.sum(rs).alias("rs_sum"),
            )
            .select(
                F.lit(w).cast("long").alias("w"),
                "n_blocks",
                F.expr("CAST(rs_sum div n_blocks AS BIGINT)").alias(
                    "avg_rs_micro"
                ),
            )
        )
        per_w.append(v)
    u = per_w[0]
    for v in per_w[1:]:
        u = u.unionAll(v)
    u = u.where((F.col("n_blocks") > 0) & (F.col("avg_rs_micro") > 0))
    xmu_case = " ".join(
        f"WHEN {w} THEN {_HURST_LNW_MICRO[w]}" for w in _HURST_WINDOWS
    )
    u = u.select(
        "w",
        "n_blocks",
        "avg_rs_micro",
        F.expr(f"CAST(CASE w {xmu_case} END AS BIGINT)").alias("xmu"),
        F.round(F.log(F.col("avg_rs_micro").cast("double")) * 1000000)
        .cast("long")
        .alias("ymu"),
    )
    u = bounded_single_group(u)  # <=3-row regression table
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = u.select(
        "w",
        "n_blocks",
        "avg_rs_micro",
        F.sum(F.col("xmu") * F.col("ymu")).over(w_all).cast("long").alias("sxy"),
        F.sum("xmu").over(w_all).cast("long").alias("sx"),
        F.sum("ymu").over(w_all).cast("long").alias("sy"),
        F.sum(F.col("xmu") * F.col("xmu")).over(w_all).cast("long").alias("sxx"),
        F.count("*").over(w_all).cast("long").alias("k"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return t.select(
        "w",
        "n_blocks",
        "avg_rs_micro",
        F.round(slope * 1000).cast("long").alias("hurst_milli"),
    ).orderBy("w")


# ---------------------------------------------------------------------------
# EV36: expected / maximum calibration error (ECE, MCE)
# ---------------------------------------------------------------------------

def _ece_oracle() -> str:
    from bytesprocessor_spark.queries_eval import _DUCK_PM

    return f"""
    WITH {_DUCK_PM},
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM p),
    g AS (SELECT LEAST(pm // 100000, 9) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(pm) AS BIGINT) AS sum_pm,
                 CAST(SUM(y) AS BIGINT) AS sum_y
          FROM p GROUP BY 1)
    SELECT MAX(total) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins_used,
           CAST(SUM(n * ABS(sum_pm // n - (sum_y * 1000000) // n))
                // MAX(total) AS BIGINT) AS ece_micro,
           CAST(MAX(ABS(sum_pm // n - (sum_y * 1000000) // n)) AS BIGINT)
             AS mce_micro
    FROM g, t
    """


@query("eval_ece", _ece_oracle())
def eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV36 — expected and maximum calibration error over the EV3
    10-bin reliability layout: ECE = Σ (n_b/n)·|acc_b − conf_b| (the
    bin-weighted gap), MCE = max_b |acc_b − conf_b| (the worst bin).
    EV3 shows the diagram and EV32 decomposes the Brier score; ECE/
    MCE are the two headline scalars a model card actually quotes —
    the dashboard number tracked release-over-release.

    Determinism: reuses EV3's exact machinery (md5-uniform pinned
    probability proxy, micro-integer bin means); per-bin gaps are
    integer floor divisions, the weighted sum and max are exact
    int64.

    Scale shape: one partial aggregate to ≤10 bins, then a 1-row
    rollup; readout 1 row."""
    from bytesprocessor_spark.operators.evalmetrics import (
        calibration,
        normalize_micro,
    )
    from bytesprocessor_spark.queries_eval import _scored

    bins = calibration(normalize_micro(_scored(spark, sf_dir)))
    # bins: bin, n, mean_pred_micro, frac_pos_micro, gap_micro, weight_ppm
    # total n recoverable exactly from any row: n * 1e6 div weight_ppm is
    # NOT exact — carry it via the bin table instead
    b = bounded_single_group(bins)
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = b.select(
        "n",
        "gap_micro",
        F.sum("n").over(w_all).cast("long").alias("total"),
        F.count("*").over(w_all).cast("long").alias("n_bins_used"),
    )
    return t.agg(
        F.max("total").alias("n"),
        F.max("n_bins_used").alias("n_bins_used"),
        F.expr(
            "CAST(SUM(n * gap_micro) div MAX(total) AS BIGINT)"
        ).alias("ece_micro"),
        F.max("gap_micro").cast("long").alias("mce_micro"),
    )


# ---------------------------------------------------------------------------
# A121: Little's law read (L vs lambda x W) per month
# ---------------------------------------------------------------------------

@query(
    "orders_littles_law",
    """
    WITH dur AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS start_day,
             MAX(CAST(l.l_shipdate AS DATE)) AS end_day
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT day, CAST(SUM(delta) AS BIGINT) AS delta FROM (
        SELECT start_day AS day, 1 AS delta FROM dur
        UNION ALL
        SELECT end_day + INTERVAL 1 DAY, -1 FROM dur
      ) GROUP BY day
    ),
    bounds AS (
      SELECT MIN(start_day) AS mn, MAX(end_day) AS mx FROM dur
    ),
    spine AS (
      SELECT CAST(UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
        AS day
      FROM bounds
    ),
    open_t AS (
      SELECT s.day,
             CAST(SUM(COALESCE(d.delta, 0)) OVER (ORDER BY s.day
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_open
      FROM spine s LEFT JOIN deltas d ON s.day = CAST(d.day AS DATE)
    ),
    lm AS (
      SELECT STRFTIME(DATE_TRUNC('month', day), '%Y-%m') AS month,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(n_open) AS BIGINT) AS sum_open
      FROM open_t GROUP BY 1
    ),
    am AS (
      SELECT STRFTIME(DATE_TRUNC('month', start_day), '%Y-%m') AS month,
             CAST(COUNT(*) AS BIGINT) AS n_arrivals,
             CAST(SUM(DATE_DIFF('day', start_day, end_day) + 1) AS BIGINT)
               AS sum_dur
      FROM dur GROUP BY 1
    )
    SELECT lm.month, am.n_arrivals, lm.n_days,
      CAST(lm.sum_open * 1000 // lm.n_days AS BIGINT) AS l_milli,
      CAST(am.n_arrivals * 1000 // lm.n_days AS BIGINT) AS lambda_milli,
      CAST(am.sum_dur * 1000 // am.n_arrivals AS BIGINT) AS w_milli,
      CAST(lm.sum_open * 1000000 // am.sum_dur AS BIGINT)
        AS littles_ratio_ppm
    FROM lm JOIN am ON lm.month = am.month
    ORDER BY lm.month
    """,
)
def orders_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A121 — Little's law read per month: L (average number of open
    orders, integrated daily over a dense calendar spine) against
    λ·W (arrival rate × average order-to-last-ship duration of that
    month's arrivals).  The ratio L/(λW) ≈ 1 in steady state; a
    drifting ratio means work-in-progress is building faster than
    throughput explains — the queueing sanity check behind W7's
    concurrency and A54's lateness reads (and the training-job
    backlog read for a data-pipeline scheduler).

    Determinism: open-count integration is exact integers (+1/−1
    deltas cumulated over the dense day spine); all readouts are
    integer floor divisions (the 1000/1e6 scales).

    Scale shape: one orderkey-keyed duration aggregate (equi-join
    orders⋈lineitem), delta and month tables are calendar-bounded;
    the spine is a generated sequence (no data-scale window —
    the cumsum rides the bounded day table); readout ≤84 rows."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("start_day")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    dur = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "start_day")
        .agg(F.max("sd").alias("end_day"))
    )
    deltas = (
        dur.select(F.col("start_day").alias("day"), F.lit(1).alias("delta"))
        .unionAll(
            dur.select(
                F.date_add(F.col("end_day"), 1).alias("day"),
                F.lit(-1).alias("delta"),
            )
        )
        .groupBy("day")
        .agg(F.sum("delta").cast("long").alias("delta"))
    )
    bounds = dur.agg(
        F.min("start_day").alias("mn"), F.max("end_day").alias("mx")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("day")
    )
    sp = spine.join(deltas, "day", "left").select(
        "day", F.coalesce("delta", F.lit(0)).cast("long").alias("delta")
    )
    sp = bounded_single_group(sp)  # calendar-bounded day spine
    w_cum = (
        Window.partitionBy("__opid")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    open_t = sp.select(
        "day", F.sum("delta").over(w_cum).cast("long").alias("n_open")
    )
    lm = open_t.groupBy(
        F.date_format(F.trunc("day", "month"), "yyyy-MM").alias("month")
    ).agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("n_open").cast("long").alias("sum_open"),
    )
    am = dur.groupBy(
        F.date_format(F.trunc("start_day", "month"), "yyyy-MM").alias("month")
    ).agg(
        F.count("*").cast("long").alias("n_arrivals"),
        F.sum(F.datediff("end_day", "start_day") + 1)
        .cast("long")
        .alias("sum_dur"),
    )
    j = lm.join(am, "month")
    return j.select(
        "month",
        "n_arrivals",
        "n_days",
        F.expr("CAST(sum_open * 1000 div n_days AS BIGINT)").alias("l_milli"),
        F.expr("CAST(n_arrivals * 1000 div n_days AS BIGINT)").alias(
            "lambda_milli"
        ),
        F.expr("CAST(sum_dur * 1000 div n_arrivals AS BIGINT)").alias(
            "w_milli"
        ),
        F.expr("CAST(sum_open * 1000000 div sum_dur AS BIGINT)").alias(
            "littles_ratio_ppm"
        ),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# J15: nearest-within-tolerance as-of join (pandas merge_asof "nearest")
# ---------------------------------------------------------------------------

_NEAREST_TOL_S = 3600


@query(
    "asof_nearest_events",
    f"""
    WITH p AS (
      SELECT event_id AS p_id, user_id,
             CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS p_sec
      FROM events WHERE event_type = 'purchase'
    ),
    e AS (
      SELECT event_id AS e_id, user_id,
             CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS e_sec
      FROM events WHERE event_type = 'error'
    ),
    cand AS (
      SELECT p.p_id, e.e_id, e.e_sec - p.p_sec AS dt,
             ABS(e.e_sec - p.p_sec) AS absdt, e.e_sec
      FROM p JOIN e ON p.user_id = e.user_id
      WHERE ABS(e.e_sec - p.p_sec) <= {_NEAREST_TOL_S}
    ),
    best AS (
      SELECT p_id, e_id, dt,
             ROW_NUMBER() OVER (PARTITION BY p_id
                 ORDER BY absdt, e_sec, e_id) AS rn
      FROM cand
    )
    SELECT CAST(FLOOR(dt / 60.0) AS BIGINT) AS minute_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(e_id) AS BIGINT) AS sum_err_ids
    FROM best WHERE rn = 1
    GROUP BY 1 ORDER BY 1
    """,
)
def asof_nearest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J15 — nearest-within-tolerance as-of join (pandas
    merge_asof(direction='nearest', tolerance=1h) semantics): each
    purchase matches the SAME-USER error event minimizing |Δt| within
    ±1 hour, ties broken (|Δt|, error time, error id).  The backward
    as-of (J5) answers 'last state BEFORE'; this answers 'closest
    context AROUND' — the error-correlation shape incident analysis
    actually asks for.

    Determinism: epoch-second integers, a total tiebreak order, and a
    membership-pinning readout (signed-minute-bucket pair counts plus
    the matched-error-id checksum — a wrong match changes the sum).

    Scale shape: purchases explode to 3 hour buckets and equi-join
    errors on (user, bucket) — no data-scale inequality join; the
    per-purchase argmin is a min_by aggregate (no sort).  The oracle
    states the same predicate as a plain user-equi join + filter
    (identical result set by construction).  Readout ≤121 rows."""
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.unix_timestamp("ts").alias("p_sec"),
    )
    e = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        "user_id",
        F.unix_timestamp("ts").alias("e_sec"),
        F.expr(f"CAST(unix_timestamp(ts) div {_NEAREST_TOL_S} AS BIGINT)").alias(
            "hb"
        ),
    )
    px = p.select(
        "p_id",
        "user_id",
        "p_sec",
        F.explode(
            F.array(
                F.expr(f"CAST(p_sec div {_NEAREST_TOL_S} AS BIGINT) - 1"),
                F.expr(f"CAST(p_sec div {_NEAREST_TOL_S} AS BIGINT)"),
                F.expr(f"CAST(p_sec div {_NEAREST_TOL_S} AS BIGINT) + 1"),
            )
        ).alias("hb"),
    )
    cand = (
        px.join(e, ["user_id", "hb"])
        .select(
            "p_id",
            "e_id",
            (F.col("e_sec") - F.col("p_sec")).alias("dt"),
            F.abs(F.col("e_sec") - F.col("p_sec")).alias("absdt"),
            "e_sec",
        )
        .where(F.col("absdt") <= _NEAREST_TOL_S)
    )
    best = cand.groupBy("p_id").agg(
        F.expr(
            "min_by(named_struct('dt', dt, 'eid', e_id),"
            " named_struct('a', absdt, 'ts', e_sec, 'id', e_id))"
        ).alias("w")
    )
    return (
        best.select(
            F.floor(F.col("w.dt") / 60).cast("long").alias("minute_bucket"),
            F.col("w.eid").alias("e_id"),
        )
        .groupBy("minute_bucket")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("e_id").cast("long").alias("sum_err_ids"),
        )
        .orderBy("minute_bucket")
    )


# ---------------------------------------------------------------------------
# W22: per-user activity-streak histogram (gaps and islands)
# ---------------------------------------------------------------------------

@query(
    "events_user_streaks",
    """
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    i AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY day) AS INTEGER) AS island
      FROM d
    ),
    s AS (
      SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
      FROM i GROUP BY user_id, island
    ),
    u AS (
      SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest,
             CAST(COUNT(*) AS BIGINT) AS n_streaks,
             CAST(SUM(len) AS BIGINT) AS active_days
      FROM s GROUP BY user_id
    )
    SELECT longest AS streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(active_days) AS BIGINT) AS sum_active_days,
           CAST(SUM(n_streaks) AS BIGINT) AS sum_streaks
    FROM u GROUP BY longest ORDER BY streak_days
    """,
)
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W22 — longest consecutive-active-day streak per user (gaps and
    islands: day minus the day's per-user rank is constant within a
    run), read as a histogram of users by longest streak with total
    active days and streak counts.  The engagement-streak product
    metric next to W13's DAU growth and W15's growth accounting —
    retention teams segment exactly on this.

    Determinism: distinct (user, day) grid; island keys are exact
    date arithmetic; all counts exact int64.

    Scale shape: one distinct + one user-partitioned rank window
    (entity-keyed — no global window), two keyed aggregates, bounded
    histogram readout (streaks are calendar-bounded)."""
    d = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w_u = Window.partitionBy("user_id").orderBy("day")
    i = d.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w_u)).alias("island"),
    )
    s = i.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("len")
    )
    u = s.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest"),
        F.count("*").cast("long").alias("n_streaks"),
        F.sum("len").cast("long").alias("active_days"),
    )
    return (
        u.groupBy(F.col("longest").alias("streak_days"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("active_days").cast("long").alias("sum_active_days"),
            F.sum("n_streaks").cast("long").alias("sum_streaks"),
        )
        .orderBy("streak_days")
    )


# ---------------------------------------------------------------------------
# L3o: cosine range search (all neighbors above a threshold)
# ---------------------------------------------------------------------------

_RANGE_SIM_THRESHOLD = 0.25
_RANGE_QUERIES = 10


@query(
    "similarity_range_search",
    f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000))
               AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id < {_RANGE_QUERIES}),
    s AS (
      SELECT query_id, e.vec_id,
             list_dot_product(qv, v)
               / (SQRT(list_dot_product(qv, qv))
                  * SQRT(list_dot_product(v, v))) AS sim
      FROM q CROSS JOIN e
      WHERE e.vec_id <> query_id
    )
    SELECT query_id,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(ROUND(MAX(sim) * 1000000) AS BIGINT) AS max_sim_micro,
           CAST(SUM(vec_id) AS BIGINT) AS sum_vec_ids
    FROM s WHERE sim >= {_RANGE_SIM_THRESHOLD}
    GROUP BY query_id ORDER BY query_id
    """,
)
def similarity_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3o — cosine range search: ALL corpus neighbors with
    sim ≥ {_RANGE_SIM_THRESHOLD} per query (the other half of the ANN
    API surface: L3's top-k asks 'the best k', range search asks
    'everything this close' — the primitive behind near-dup blocking
    thresholds and radius-bounded retrieval).  Readout pins exact
    membership per query (count, max similarity, id checksum).

    Determinism: the L3 micro-quantized integer-vector cosine (same
    double tree as similarity_topk), threshold compare on identical
    doubles, membership checksum.

    Scale shape: {_RANGE_QUERIES}-row query batch broadcast onto one
    corpus scan (declared bounded nested-loop, the L3 posture); no
    per-query window at all — range search aggregates directly.  The
    scale path dispatches to the IVF/LSH candidate stage like every
    L3 consumer."""
    from bytesprocessor_spark.functions.vectors import dot_product

    emb = _t(spark, sf_dir, "embeddings")
    quant = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000000.0)
        ).alias("v"),
    )
    q = F.broadcast(
        quant.where(F.col("vec_id") < _RANGE_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    dot = dot_product(F.col("qv"), F.col("v"))
    na = dot_product(F.col("qv"), F.col("qv"))
    nb = dot_product(F.col("v"), F.col("v"))
    s = (
        quant.crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (dot / (F.sqrt(na) * F.sqrt(nb))).alias("sim"),
        )
    )
    return (
        s.where(F.col("sim") >= _RANGE_SIM_THRESHOLD)
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_neighbors"),
            F.round(F.max("sim") * 1000000).cast("long").alias("max_sim_micro"),
            F.sum("vec_id").cast("long").alias("sum_vec_ids"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# A122: exponentially-decayed engagement scores (recency-weighted MAU)
# ---------------------------------------------------------------------------

_DECAY_HALF_LIFE_DAYS = 7
# ROUND(2^(-r/7) * 1e6) for r = 0..6, pinned (pow is not correctly
# rounded across libms — the fractional factors are literals and the
# whole-week part is an exact integer shift, so no pow() at runtime)
_DECAY_FRACS = (1000000, 905724, 820335, 742997, 672950, 609507, 552045)
_DECAY_FRACS_SQL = ", ".join(str(f) for f in _DECAY_FRACS)


@query(
    "events_decayed_engagement",
    f"""
    WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS ref_day FROM events),
    a AS (
      SELECT user_id,
             DATE_DIFF('day', CAST(ts AS DATE), ref_day) AS age
      FROM events CROSS JOIN ref
    ),
    w AS (
      SELECT user_id,
             ([{_DECAY_FRACS_SQL}][1 + CAST(age % {_DECAY_HALF_LIFE_DAYS} AS INTEGER)])
               // (1::BIGINT << LEAST(age // {_DECAY_HALF_LIFE_DAYS}, 62))
               AS decay_micro
      FROM a
    ),
    u AS (
      SELECT user_id, CAST(SUM(decay_micro) AS BIGINT) AS score_micro
      FROM w GROUP BY user_id
    )
    SELECT CAST(FLOOR(LOG2(CAST(GREATEST(score_micro, 1) AS DOUBLE)))
             AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(score_micro) AS BIGINT) AS sum_score_micro
    FROM u GROUP BY 1 ORDER BY 1
    """,
)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A122 — recency-decayed engagement: each event contributes
    2^(−age/7) (7-day half-life from the corpus's latest day), summed
    per user and read as a log2-bucket histogram.  The
    recency-weighted MAU primitive behind churn scores and trending
    user segments — W13's DAU counts everyone equally; this is the
    decay-weighted version ranking models actually consume.

    Determinism: integer day ages against a 1-row reference frame;
    the decay weight is PURE integer arithmetic — the seven
    fractional half-life factors are pinned micro literals and the
    whole-week part is an integer shift (pow() is not correctly
    rounded across libms, so it never runs at query time); exact
    per-user integer sums, log2 buckets of exact int64 scores.

    Scale shape: 1-row ref-day frame broadcast onto the scan
    (declared bounded nested-loop — the events_gap_fill family), one
    user-keyed aggregate (entity scale, map-combinable), bounded
    histogram readout."""
    ev = _t(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.col("ts").cast("date")).alias("ref_day"))
    fr = F.array(*[F.lit(f).cast("long") for f in _DECAY_FRACS])
    a = ev.crossJoin(F.broadcast(ref)).select(
        "user_id",
        F.datediff(F.col("ref_day"), F.col("ts").cast("date"))
        .cast("long")
        .alias("age"),
    )
    w = a.select(
        "user_id",
        F.element_at(
            fr, (F.col("age") % _DECAY_HALF_LIFE_DAYS).cast("int") + 1
        ).alias("frac"),
        F.expr(
            f"CAST(shiftleft(CAST(1 AS BIGINT),"
            f" CAST(least(age div {_DECAY_HALF_LIFE_DAYS}, 62) AS INT))"
            f" AS BIGINT)"
        ).alias("denom"),
    ).select("user_id", F.expr("frac div denom").alias("decay_micro"))
    u = w.groupBy("user_id").agg(
        F.sum("decay_micro").cast("long").alias("score_micro")
    )
    return (
        u.groupBy(
            F.floor(
                F.log2(F.greatest(F.col("score_micro"), F.lit(1)).cast("double"))
            )
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("score_micro").cast("long").alias("sum_score_micro"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# A123: IPF raking (iterative proportional fitting) of a sampled table
# ---------------------------------------------------------------------------

_IPF_ITERS = 3
_IPF_SAMPLE_MOD = 10  # keep orderkeys with md5 % 10 == 0 (~10% sample)


def _ipf_oracle() -> str:
    h = _H60_DUCK.format("'ipf:' || CAST(o_orderkey AS VARCHAR)")
    steps = []
    prev = "w0"
    for t in range(1, _IPF_ITERS + 1):
        steps.append(f"""
    r{t} AS (
      SELECT p.i, p.j, p.n_sample, p.ri, p.cj,
             p.w * CAST(FLOOR(p.ri * 1000000000.0
                 / GREATEST(SUM(p.w) OVER (PARTITION BY p.i), 1)) AS BIGINT)
                 // 1000 AS w
      FROM {prev} p
    ),
    c{t} AS (
      SELECT i, j, n_sample, ri, cj,
             w * CAST(FLOOR(cj * 1000000000.0
                 / GREATEST(SUM(w) OVER (PARTITION BY j), 1)) AS BIGINT)
                 // 1000 AS w
      FROM r{t}
    )""")
        prev = f"c{t}"
    return f"""
    WITH full_t AS (
      SELECT o_orderpriority AS i, o_orderstatus AS j, o_orderkey,
             {h} % {_IPF_SAMPLE_MOD} AS bucket
      FROM orders
    ),
    rm AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS ri FROM full_t GROUP BY i),
    cm AS (SELECT j, CAST(COUNT(*) AS BIGINT) AS cj FROM full_t GROUP BY j),
    sm AS (
      SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n_sample
      FROM full_t WHERE bucket = 0 GROUP BY i, j
    ),
    w0 AS (
      SELECT sm.i, sm.j, sm.n_sample, rm.ri, cm.cj,
             CAST(sm.n_sample * 1000000 AS BIGINT) AS w
      FROM sm JOIN rm ON sm.i = rm.i JOIN cm ON sm.j = cm.j
    ),{",".join(steps)}
    SELECT i AS priority, j AS status, n_sample,
           ri AS row_target, cj AS col_target,
           w AS w_raked_micro
    FROM {prev} ORDER BY priority, status
    """


@query("orders_ipf_raking", _ipf_oracle())
def orders_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A123 — iterative proportional fitting (raking): a deterministic
    ~10% hash sample of orders is re-weighted over {_IPF_ITERS} fixed
    IPF rounds so its (priority × status) cell weights match the FULL
    table's row and column margins.  THE survey-weighting primitive
    for debiasing a sampled eval set toward known population margins
    — the two-margin sibling of A116's one-dimensional Neyman
    allocation, and the correction step behind every 'representative
    subset' claim on a 100 TB corpus.

    Determinism: exact int64 margins and sample cells; weights live
    in micro units and each half-step multiplies by a milli-quantized
    margin ratio (FLOOR(target·1e9 / current-sum) — one double
    division of exact int64s, floored identically in both engines)
    with integer floor division — the fixed-iteration unrolled
    trajectory is SQL-replayable like GR9's LPA.

    Scale shape: one scan feeds margins and sample cells (three keyed
    aggregates); the IPF rounds run on the bounded ≤15-cell table
    (bounded windows); readout ≤15 rows."""
    h = _h60(F.concat(F.lit("ipf:"), F.col("o_orderkey").cast("string")))
    full_t = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("i"),
        F.col("o_orderstatus").alias("j"),
        (h % _IPF_SAMPLE_MOD).alias("bucket"),
    )
    rm = full_t.groupBy("i").agg(F.count("*").cast("long").alias("ri"))
    cm = full_t.groupBy("j").agg(F.count("*").cast("long").alias("cj"))
    sm = (
        full_t.where(F.col("bucket") == 0)
        .groupBy("i", "j")
        .agg(F.count("*").cast("long").alias("n_sample"))
    )
    w = (
        sm.join(F.broadcast(rm), "i")
        .join(F.broadcast(cm), "j")
        .select(
            "i",
            "j",
            "n_sample",
            "ri",
            "cj",
            (F.col("n_sample") * 1000000).cast("long").alias("w"),
        )
    )
    w = bounded_single_group(w)  # <=15-cell contingency table
    w_row = Window.partitionBy("__opid", "i")
    w_col = Window.partitionBy("__opid", "j")
    for _ in range(_IPF_ITERS):
        w = w.withColumn(
            "w",
            F.expr(
                "CAST(w * CAST(FLOOR(ri * 1000000000.0 / GREATEST(SUM(w)"
                " OVER (PARTITION BY __opid, i), 1)) AS BIGINT)"
                " div 1000 AS BIGINT)"
            ),
        )
        w = w.withColumn(
            "w",
            F.expr(
                "CAST(w * CAST(FLOOR(cj * 1000000000.0 / GREATEST(SUM(w)"
                " OVER (PARTITION BY __opid, j), 1)) AS BIGINT)"
                " div 1000 AS BIGINT)"
            ),
        )
    return w.select(
        F.col("i").alias("priority"),
        F.col("j").alias("status"),
        "n_sample",
        F.col("ri").alias("row_target"),
        F.col("cj").alias("col_target"),
        F.col("w").alias("w_raked_micro"),
    ).orderBy("priority", "status")


# ---------------------------------------------------------------------------
# A124: price elasticity (log-log regression across parts)
# ---------------------------------------------------------------------------

@query(
    "orders_price_elasticity",
    """
    WITH p AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS ext_c,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_c
      FROM lineitem GROUP BY l_partkey
    ),
    x AS (
      SELECT CAST(ROUND(LN(CAST(ext_c AS DOUBLE) / (CAST(qty_c AS DOUBLE)
                 / 100)) * 1000) AS BIGINT) AS lx,
             CAST(ROUND(LN(CAST(qty_c AS DOUBLE) / 100) * 1000) AS BIGINT)
               AS ly
      FROM p WHERE qty_c > 0 AND ext_c > 0
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
             CAST(SUM(lx * lx) AS BIGINT) AS sxx,
             CAST(SUM(lx * ly) AS BIGINT) AS sxy,
             CAST(SUM(ly * ly) AS BIGINT) AS syy
      FROM x
    )
    SELECT n AS n_parts,
      CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) * 1000) AS BIGINT)
        AS elasticity_milli,
      CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
           * CAST(n * sxy - sx * sy AS DOUBLE)
           / (CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(n * syy - sy * sy AS DOUBLE)) * 1000000) AS BIGINT)
        AS r2_ppm
    FROM m
    """,
)
def orders_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A124 — price elasticity of demand across parts: the log-log
    OLS slope of ln(total quantity) on ln(average unit price) over
    the part cross-section (slope ≈ %Δquantity per %Δprice — the
    pricing read behind A65's discount-effect and A49's price-index
    rows; elasticity < −1 = revenue-losing price increases).

    Determinism: per-part exact cent sums; ln(price)/ln(quantity)
    milli-quantized to int64 BEFORE the regression moment sums
    (A70's OLS discipline — all six moments exact int64); slope and
    r² are single double ratios of exact integers.

    Scale shape: one partkey-keyed aggregate absorbs the scan
    (map-combinable, entity scale), one scalar moment aggregate;
    readout 1 row."""
    p = _t(spark, sf_dir, "lineitem").groupBy("l_partkey").agg(
        F.sum(cents(F.col("l_extendedprice"))).cast("long").alias("ext_c"),
        F.sum(cents(F.col("l_quantity"))).cast("long").alias("qty_c"),
    )
    x = p.where((F.col("qty_c") > 0) & (F.col("ext_c") > 0)).select(
        F.round(
            F.log(
                F.col("ext_c").cast("double")
                / (F.col("qty_c").cast("double") / 100)
            )
            * 1000
        )
        .cast("long")
        .alias("lx"),
        F.round(F.log(F.col("qty_c").cast("double") / 100) * 1000)
        .cast("long")
        .alias("ly"),
    )
    m = x.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).cast("long").alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).cast("long").alias("sxy"),
        F.sum(F.col("ly") * F.col("ly")).cast("long").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        F.col("n").alias("n_parts"),
        F.round(num / denx * 1000).cast("long").alias("elasticity_milli"),
        F.round(num * num / (denx * deny) * 1000000)
        .cast("long")
        .alias("r2_ppm"),
    )


# ---------------------------------------------------------------------------
# FE8: cyclic (sin/cos) calendar encoding with pinned literals
# ---------------------------------------------------------------------------

_MONTH_SIN_MICRO = (
    0, 500000, 866025, 1000000, 866025, 500000,
    0, -500000, -866025, -1000000, -866025, -500000,
)
_MONTH_COS_MICRO = (
    1000000, 866025, 500000, 0, -500000, -866025,
    -1000000, -866025, -500000, 0, 500000, 866025,
)


def _cyclic_oracle() -> str:
    sin_sql = ", ".join(str(v) for v in _MONTH_SIN_MICRO)
    cos_sql = ", ".join(str(v) for v in _MONTH_COS_MICRO)
    return f"""
    WITH m AS (
      SELECT CAST(MONTH(CAST(o_orderdate AS DATE)) AS BIGINT) AS month,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    )
    SELECT month,
           CAST([{sin_sql}][CAST(month AS INTEGER)] AS BIGINT)
             AS month_sin_micro,
           CAST([{cos_sql}][CAST(month AS INTEGER)] AS BIGINT)
             AS month_cos_micro,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(c) // COUNT(*) AS BIGINT) AS avg_value_cents
    FROM m GROUP BY month ORDER BY month
    """


@query("orders_cyclic_encoding", _cyclic_oracle())
def orders_cyclic_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FE8 — cyclic calendar encoding: order month mapped to
    (sin, cos) on the unit circle so December and January are
    NEIGHBORS in feature space (an ordinal month-number feature puts
    them 11 apart — the standard seasonality encoding for GBM/linear
    models, next to FE2/FE4/FE7's categorical encoders).  Read out
    as the 12-row month feature table with volume and average value.

    Determinism: the 12 sin/cos values are PINNED micro literals
    (trig is not correctly rounded across libms — same discipline as
    A122's decay factors); counts and floor-division averages exact
    int64.

    Scale shape: one month-keyed aggregate absorbs the scan; the
    encoding is a 12-literal lookup in the projection; readout 12
    rows."""
    sin_arr = F.array(*[F.lit(v).cast("long") for v in _MONTH_SIN_MICRO])
    cos_arr = F.array(*[F.lit(v).cast("long") for v in _MONTH_COS_MICRO])
    m = _t(spark, sf_dir, "orders").select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("month"),
        cents(F.col("o_totalprice")).alias("c"),
    )
    g = m.groupBy("month").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("c").cast("long").alias("sc"),
    )
    return g.select(
        "month",
        F.element_at(sin_arr, F.col("month").cast("int")).alias(
            "month_sin_micro"
        ),
        F.element_at(cos_arr, F.col("month").cast("int")).alias(
            "month_cos_micro"
        ),
        "n_orders",
        F.expr("CAST(sc div n_orders AS BIGINT)").alias("avg_value_cents"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# GR14: Katz centrality (fixed-iteration, exact-integer attenuation)
# ---------------------------------------------------------------------------

_KATZ_ITERS = 3
_KATZ_ATT_DIV = 10  # attenuation alpha = 1/10, pinned
_KATZ_TOPK = 20


def _katz_oracle() -> str:
    from bytesprocessor_spark.queries_r7 import lpa_edges_cte

    steps = []
    prev = "x0"
    for t in range(1, _KATZ_ITERS + 1):
        steps.append(f"""
    x{t} AS (
      SELECT n.z,
             1000000 + COALESCE(SUM(p.x), 0) // {_KATZ_ATT_DIV} AS x
      FROM nodes n
      LEFT JOIN (
        SELECT e.a AS z, p.x FROM e0 e JOIN {prev} p ON e.b = p.z
        UNION ALL
        SELECT e.b AS z, p.x FROM e0 e JOIN {prev} p ON e.a = p.z
      ) p ON n.z = p.z
      GROUP BY n.z
    )""")
        prev = f"x{t}"
    return lpa_edges_cte() + f""",
    nodes AS (SELECT DISTINCT z FROM (
      SELECT a AS z FROM e0 UNION ALL SELECT b AS z FROM e0)),
    deg AS (
      SELECT z, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT a AS z FROM e0 UNION ALL SELECT b AS z FROM e0
      ) GROUP BY z
    ),
    x0 AS (SELECT z, CAST(1000000 AS BIGINT) AS x FROM nodes),{",".join(steps)}
    SELECT CAST(k.z AS BIGINT) AS node, CAST(k.x AS BIGINT) AS katz_micro,
           d.degree
    FROM {prev} k JOIN deg d ON k.z = d.z
    ORDER BY katz_micro DESC, node LIMIT {_KATZ_TOPK}
    """


@query("graph_katz_centrality", _katz_oracle())
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR14 — Katz centrality over the GR9 co-supplier graph:
    x ← 1 + α·A·x for a FIXED {_KATZ_ITERS} iterations with α = 0.1,
    top-{_KATZ_TOPK} nodes.  Counts attenuated walks of every length
    — the influence read that distinguishes a node with ten isolated
    neighbors from one wired into a dense core, where GR5's raw
    degree cannot (and without GR2 PageRank's normalization, so it
    works on fragments and near-DAGs).

    Determinism: PURE integer trajectory — scores live in micro
    units, each step is 1e6 + (Σ neighbor scores) div 10 (exact
    int64: scores ≤ 1e6·(1 + d_max/10)^3), so the unrolled CTE
    replay is bit-exact with no doubles anywhere.

    Scale shape: per iteration one 2-sided edges⋈scores equi-join +
    node-keyed sum (the GR9/GR2 round shape), lineage cut per round;
    TakeOrdered top-{_KATZ_TOPK} readout (per-partition heaps, no
    global sort)."""
    from bytesprocessor_spark.queries_r7 import lpa_edges

    e0 = lpa_edges(spark, sf_dir)
    nodes = (
        e0.select(F.col("a").alias("z"))
        .unionAll(e0.select(F.col("b").alias("z")))
        .distinct()
    )
    deg = (
        e0.select(F.col("a").alias("z"))
        .unionAll(e0.select(F.col("b").alias("z")))
        .groupBy("z")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    x = nodes.select("z", F.lit(1000000).cast("long").alias("x"))
    for _ in range(_KATZ_ITERS):
        nbr = (
            e0.join(x.withColumnRenamed("z", "b"), "b")
            .select(F.col("a").alias("z"), "x")
            .unionAll(
                e0.join(x.withColumnRenamed("z", "a"), "a").select(
                    F.col("b").alias("z"), "x"
                )
            )
        )
        sums = nbr.groupBy("z").agg(F.sum("x").cast("long").alias("sx"))
        x = (
            nodes.join(sums, "z", "left")
            .select(
                "z",
                (
                    F.lit(1000000).cast("long")
                    + F.expr(
                        f"CAST(COALESCE(sx, 0) div {_KATZ_ATT_DIV} AS BIGINT)"
                    )
                ).alias("x"),
            )
            .localCheckpoint(eager=False)
        )
    out = x.join(deg, "z").select(
        F.col("z").cast("long").alias("node"),
        F.col("x").alias("katz_micro"),
        "degree",
    )
    return out.orderBy(F.col("katz_micro").desc(), "node").limit(_KATZ_TOPK)


# ---------------------------------------------------------------------------
# W23: time to second purchase (activation latency)
# ---------------------------------------------------------------------------

@query(
    "events_time_to_second",
    """
    WITH p AS (
      SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
             ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ),
    u AS (
      SELECT user_id,
             MIN(CASE WHEN rn = 1 THEN sec END) AS t1,
             MIN(CASE WHEN rn = 2 THEN sec END) AS t2
      FROM p WHERE rn <= 2 GROUP BY user_id
    ),
    d AS (SELECT t2 - t1 AS dt FROM u WHERE t2 IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(quantile_disc(dt, 0.25) AS BIGINT) AS p25_s,
           CAST(quantile_disc(dt, 0.50) AS BIGINT) AS p50_s,
           CAST(quantile_disc(dt, 0.75) AS BIGINT) AS p75_s,
           CAST(quantile_disc(dt, 0.90) AS BIGINT) AS p90_s,
           CAST(SUM(dt) * 1000 // COUNT(*) AS BIGINT) AS mean_milli_s
    FROM d
    """,
)
def events_time_to_second(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W23 — activation latency: per user the gap between first and
    second purchase (total (ts, event_id) order), read as the
    quartile/P90/mean table over users who converted twice.  THE
    activation metric a growth team tracks next to W19's conversion
    windows and W13's DAU — 'how long until the habit forms'.

    Determinism: floored epoch seconds, total per-user order, exact
    percentile_disc data points and floor-division mean.

    Scale shape: one user-partitioned rank window over purchases
    (entity-keyed — no global window), a user-keyed conditional
    aggregate, one global percentile aggregate; readout 1 row."""
    p = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("sec"),
            "event_id",
            F.col("ts").alias("ts"),
        )
    )
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = p.withColumn("rn", F.row_number().over(w_u)).where(F.col("rn") <= 2)
    u = r.groupBy("user_id").agg(
        F.min(F.when(F.col("rn") == 1, F.col("sec"))).alias("t1"),
        F.min(F.when(F.col("rn") == 2, F.col("sec"))).alias("t2"),
    )
    d = u.where(F.col("t2").isNotNull()).select(
        (F.col("t2") - F.col("t1")).alias("dt")
    )
    return d.agg(
        F.count("*").cast("long").alias("n_users"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY dt)")
        .cast("long")
        .alias("p25_s"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY dt)")
        .cast("long")
        .alias("p50_s"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY dt)")
        .cast("long")
        .alias("p75_s"),
        F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY dt)")
        .cast("long")
        .alias("p90_s"),
        F.expr("CAST(SUM(dt) * 1000 div COUNT(*) AS BIGINT)").alias(
            "mean_milli_s"
        ),
    )


# ---------------------------------------------------------------------------
# A126: demand risk pooling (portfolio effect) per manufacturer
# ---------------------------------------------------------------------------

@query(
    "part_risk_pooling",
    """
    WITH li AS (
      SELECT SUBSTRING(p.p_brand, 7, 1) AS mfgr, p.p_brand AS brand,
             CAST(FLOOR(DATE_DIFF('day', DATE '1995-01-01',
               CAST(l.l_shipdate AS DATE)) / 7.0) AS BIGINT) AS week,
             CAST(ROUND(l.l_quantity * 100) AS BIGINT) AS q_c
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    bw AS (
      SELECT mfgr, brand, week, CAST(SUM(q_c) AS BIGINT) AS d
      FROM li GROUP BY 1, 2, 3
    ),
    wk AS (SELECT DISTINCT mfgr, week FROM bw),
    br AS (SELECT DISTINCT mfgr, brand FROM bw),
    grid AS (
      SELECT br.mfgr, br.brand, wk.week, COALESCE(bw.d, 0) AS d
      FROM br JOIN wk ON br.mfgr = wk.mfgr
      LEFT JOIN bw ON bw.mfgr = br.mfgr AND bw.brand = br.brand
                  AND bw.week = wk.week
    ),
    bsig AS (
      SELECT mfgr, brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(ROUND(SQRT((CAST(SUM(CAST(d AS HUGEINT) * d) AS DOUBLE)
                  - CAST(SUM(d) AS DOUBLE) * SUM(d) / COUNT(*))
                  / (COUNT(*) - 1)) * 1000) AS BIGINT) AS sigma_milli
      FROM grid GROUP BY mfgr, brand HAVING COUNT(*) >= 2
    ),
    mw AS (
      SELECT mfgr, week, CAST(SUM(d) AS BIGINT) AS d
      FROM grid GROUP BY mfgr, week
    ),
    msig AS (
      SELECT mfgr, CAST(COUNT(*) AS BIGINT) AS n_weeks,
             CAST(ROUND(SQRT((CAST(SUM(CAST(d AS HUGEINT) * d) AS DOUBLE)
                  - CAST(SUM(d) AS DOUBLE) * SUM(d) / COUNT(*))
                  / (COUNT(*) - 1)) * 1000) AS BIGINT) AS sigma_pooled_milli
      FROM mw GROUP BY mfgr HAVING COUNT(*) >= 2
    ),
    agg AS (
      SELECT mfgr, CAST(COUNT(*) AS BIGINT) AS n_brands,
             CAST(SUM(sigma_milli) AS BIGINT) AS sigma_sum_milli
      FROM bsig GROUP BY mfgr
    )
    SELECT a.mfgr, a.n_brands, m.n_weeks,
           m.sigma_pooled_milli, a.sigma_sum_milli,
           CAST((a.sigma_sum_milli - m.sigma_pooled_milli) * 1000000
                // GREATEST(a.sigma_sum_milli, 1) AS BIGINT)
             AS pooling_benefit_ppm
    FROM agg a JOIN msig m ON a.mfgr = m.mfgr
    ORDER BY a.mfgr
    """,
)
def part_risk_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A126 — demand risk pooling (the portfolio effect): per
    manufacturer (the leading digit of the TPC-H brand code —
    Brand#ij belongs to Manufacturer#i), the pooled weekly-demand σ
    against the SUM of its
    brands' individual σs on a dense brand × week grid (missing
    weeks are true zero demand).  Pooling benefit =
    1 − σ_pooled/Σσ_brand — the sqrt-N aggregation dividend that
    says how much safety stock (A114) centralizing inventory
    actually saves; for imperfectly-correlated demands it is
    strictly positive.

    Determinism: floor-week grid (the A89/A114 epoch), dense grid
    fill with exact zeros, Σd exact int64 / Σd² exact int128, each
    σ ONE Bessel double tree milli-quantized BEFORE the brand sum;
    benefit is an integer floor division.

    Scale shape: lineitem⋈part equi-join, (mfgr, brand, week)
    aggregate (map-combinable), the grid is entity × calendar
    bounded (k brands × weeks), k-row rollups; readout ≤5 rows."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.substring("p_brand", 7, 1).alias("mfgr"),
            F.col("p_brand").alias("brand"),
            F.expr(
                "cast(floor(datediff(cast(l_shipdate as date),"
                " date'1995-01-01') / 7) as long)"
            ).alias("week"),
            cents(F.col("l_quantity")).alias("q_c"),
        )
    )
    bw = li.groupBy("mfgr", "brand", "week").agg(
        F.sum("q_c").cast("long").alias("d")
    )
    wk = bw.select("mfgr", "week").distinct()
    br = bw.select("mfgr", "brand").distinct()
    grid = (
        br.join(wk, "mfgr")
        .join(bw, ["mfgr", "brand", "week"], "left")
        .select(
            "mfgr", "brand", "week", F.coalesce("d", F.lit(0)).cast("long").alias("d")
        )
    )

    def sigma_milli(df, keys, out):
        nD = F.count("*").cast("double")
        s = F.sum("d").cast("double")
        s2 = F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")).cast("double")
        return (
            df.groupBy(*keys)
            .agg(
                F.count("*").cast("long").alias("n"),
                F.round(
                    F.sqrt((s2 - s * F.sum("d") / F.count("*")) / (F.count("*") - 1))
                    * 1000
                )
                .cast("long")
                .alias(out),
            )
            .where(F.col("n") >= 2)
        )

    bsig = sigma_milli(grid, ["mfgr", "brand"], "sigma_milli")
    mw = grid.groupBy("mfgr", "week").agg(F.sum("d").cast("long").alias("d"))
    msig = sigma_milli(mw, ["mfgr"], "sigma_pooled_milli").withColumnRenamed(
        "n", "n_weeks"
    )
    agg = bsig.groupBy("mfgr").agg(
        F.count("*").cast("long").alias("n_brands"),
        F.sum("sigma_milli").cast("long").alias("sigma_sum_milli"),
    )
    j = agg.join(msig, "mfgr")
    return j.select(
        "mfgr",
        "n_brands",
        "n_weeks",
        "sigma_pooled_milli",
        "sigma_sum_milli",
        F.expr(
            "CAST((sigma_sum_milli - sigma_pooled_milli) * 1000000"
            " div GREATEST(sigma_sum_milli, 1) AS BIGINT)"
        ).alias("pooling_benefit_ppm"),
    ).orderBy("mfgr")


# ---------------------------------------------------------------------------
# A127: multiple changepoints by depth-2 binary segmentation
# ---------------------------------------------------------------------------

@query(
    "events_changepoint_tree",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    idx0 AS (
      SELECT event_type, day, n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
             SUM(n) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS s,
             COUNT(*) OVER (PARTITION BY event_type) AS d,
             SUM(n) OVER (PARTITION BY event_type) AS t
      FROM daily
    ),
    best0 AS (
      SELECT event_type, day, k, d, t, ABS(d * s - k * t) AS score,
             ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY ABS(d * s - k * t) DESC, k ASC) AS r
      FROM idx0 WHERE k < d
    ),
    k1 AS (SELECT event_type, day AS day1, k AS k1, score AS score0,
                  d AS d0 FROM best0 WHERE r = 1),
    seg AS (
      SELECT i.event_type, i.day, i.n,
             CASE WHEN i.k <= k1.k1 THEN 'left' ELSE 'right' END AS seg
      FROM idx0 i JOIN k1 ON i.event_type = k1.event_type
    ),
    idx1 AS (
      SELECT event_type, seg, day, n,
             ROW_NUMBER() OVER (PARTITION BY event_type, seg
                 ORDER BY day) AS k,
             SUM(n) OVER (PARTITION BY event_type, seg ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS s,
             COUNT(*) OVER (PARTITION BY event_type, seg) AS d,
             SUM(n) OVER (PARTITION BY event_type, seg) AS t
      FROM seg
    ),
    best1 AS (
      SELECT event_type, seg, day, k, d, ABS(d * s - k * t) AS score,
             ROW_NUMBER() OVER (PARTITION BY event_type, seg
                 ORDER BY ABS(d * s - k * t) DESC, k ASC) AS r
      FROM idx1 WHERE k < d
    )
    SELECT event_type, CAST(0 AS BIGINT) AS level, 'all' AS segment,
           STRFTIME(day1, '%Y-%m-%d') AS split_day,
           CAST(k1 AS BIGINT) AS split_k,
           CAST(d0 AS BIGINT) AS seg_days,
           CAST(score0 AS BIGINT) AS score
    FROM k1
    UNION ALL
    SELECT event_type, CAST(1 AS BIGINT), seg,
           STRFTIME(day, '%Y-%m-%d'), CAST(k AS BIGINT),
           CAST(d AS BIGINT), CAST(score AS BIGINT)
    FROM best1 WHERE r = 1
    ORDER BY event_type, level, segment
    """,
)
def events_changepoint_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A127 — MULTIPLE changepoints by depth-2 binary segmentation:
    A86 finds the single best CUSUM split per type; this recurses
    once — the same integer score |d·s − k·t| re-maximized inside
    each half on SEGMENT-LOCAL prefix sums/totals — yielding up to
    three splits per type (the first two levels of the PELT/binary-
    segmentation tree monitors actually deploy; one split cannot
    describe a ramp-then-drop series).

    Determinism: A86's pure-int64 score with the same (score desc,
    k asc) argmax tiebreak at every node; segment membership derives
    from the level-0 argmax, so the whole tree is bit-deterministic
    and SQL-replayable.

    Scale shape: one calendar-bounded daily aggregate; both levels
    are windows over ≤D rows per (type[, segment]) — the fact table
    is touched once, the recursion never leaves the engine; readout
    ≤3 rows per type."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wk = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    idx0 = daily.select(
        "event_type",
        "day",
        "n",
        F.row_number().over(wk).alias("k"),
        F.sum("n").over(wk.rowsBetween(Window.unboundedPreceding, 0)).alias("s"),
        F.count(F.lit(1)).over(wall).alias("d"),
        F.sum("n").over(wall).alias("t"),
    )
    score0 = F.abs(F.col("d") * F.col("s") - F.col("k") * F.col("t"))
    wb0 = Window.partitionBy("event_type").orderBy(
        score0.desc(), F.col("k").asc()
    )
    k1 = (
        idx0.where(F.col("k") < F.col("d"))
        .withColumn("r", F.row_number().over(wb0))
        .where(F.col("r") == 1)
        .select(
            "event_type",
            F.col("day").alias("day1"),
            F.col("k").alias("k1"),
            score0.alias("score0"),
            F.col("d").alias("d0"),
        )
    )
    seg = idx0.join(F.broadcast(k1.select("event_type", "k1")), "event_type").select(
        "event_type",
        "day",
        "n",
        F.when(F.col("k") <= F.col("k1"), "left").otherwise("right").alias("seg"),
    )
    wks = Window.partitionBy("event_type", "seg").orderBy("day")
    walls = Window.partitionBy("event_type", "seg")
    idx1 = seg.select(
        "event_type",
        "seg",
        "day",
        F.row_number().over(wks).alias("k"),
        F.sum("n").over(wks.rowsBetween(Window.unboundedPreceding, 0)).alias("s"),
        F.count(F.lit(1)).over(walls).alias("d"),
        F.sum("n").over(walls).alias("t"),
    )
    score1 = F.abs(F.col("d") * F.col("s") - F.col("k") * F.col("t"))
    wb1 = Window.partitionBy("event_type", "seg").orderBy(
        score1.desc(), F.col("k").asc()
    )
    best1 = (
        idx1.where(F.col("k") < F.col("d"))
        .withColumn("r", F.row_number().over(wb1))
        .where(F.col("r") == 1)
    )
    lvl0 = k1.select(
        "event_type",
        F.lit(0).cast("long").alias("level"),
        F.lit("all").alias("segment"),
        F.date_format("day1", "yyyy-MM-dd").alias("split_day"),
        F.col("k1").cast("long").alias("split_k"),
        F.col("d0").cast("long").alias("seg_days"),
        F.col("score0").cast("long").alias("score"),
    )
    lvl1 = best1.select(
        "event_type",
        F.lit(1).cast("long").alias("level"),
        F.col("seg").alias("segment"),
        F.date_format("day", "yyyy-MM-dd").alias("split_day"),
        F.col("k").cast("long").alias("split_k"),
        F.col("d").cast("long").alias("seg_days"),
        score1.cast("long").alias("score"),
    )
    return lvl0.unionAll(lvl1).orderBy("event_type", "level", "segment")


# ---------------------------------------------------------------------------
# EV37: Wilcoxon signed-rank paired-model comparison
# ---------------------------------------------------------------------------

@query(
    "eval_wilcoxon_signed_rank",
    """
    WITH s AS (
      SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
             CAST('0x' || substr(md5('wxa:' || CAST(vec_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 1000001 AS pa,
             (CAST('0x' || substr(md5('wxb:' || CAST(vec_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 500001) + CAST(label % 2 AS BIGINT) * 500000 AS pb
      FROM embeddings
    ),
    d AS (
      SELECT vec_id,
             ABS(y * 1000000 - pa) - ABS(y * 1000000 - pb) AS diff
      FROM s
    ),
    nz AS (
      SELECT vec_id, diff, ABS(diff) AS absd,
             ROW_NUMBER() OVER (ORDER BY ABS(diff), vec_id) AS rn
      FROM d WHERE diff <> 0
    ),
    g AS (
      SELECT absd, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(rn) AS BIGINT) AS sum_rn,
             CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos
      FROM nz GROUP BY absd
    ),
    w AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(n_pos) AS BIGINT) AS npos,
             CAST(SUM(CAST(n_pos AS HUGEINT)
                  * (sum_rn * 1000000 // cnt)) AS DOUBLE) AS wp_micro
      FROM g
    )
    SELECT n AS n_pairs, npos AS n_b_better, wp_micro AS w_plus_micro,
      CAST(ROUND((wp_micro / 1000000.0
           - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 4)
           / SQRT(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
                  * (2 * CAST(n AS DOUBLE) + 1) / 24) * 1000) AS BIGINT)
        AS z_milli,
      (wp_micro / 1000000.0
           - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 4)
           / SQRT(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
                  * (2 * CAST(n AS DOUBLE) + 1) / 24) > 1.9599639845400545
        AS model_b_better
    FROM w
    """,
)
def eval_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV37 — Wilcoxon signed-rank test between two pinned models on
    the SAME eval rows: per row the loss difference d = loss_A −
    loss_B (model B is constructed better: its md5 probability is
    biased toward the true label), |d| ranked GLOBALLY with mean
    ranks over ties, W+ = Σ mean-ranks of d > 0 against the normal
    approximation.  The continuous-outcome sibling of EV22's
    McNemar (binary) and the nonparametric alternative to a paired
    t-test — the standard 'is model B actually better' read when
    loss deltas are skewed.

    Determinism: integer micro losses; the global |d| rank uses the
    DISTRIBUTED rank device with a (|d|, vec_id) total order (no
    single-partition window at eval scale); mean ranks enter W+ as
    sum_rn·1e6 // cnt per tie group (floor-quantized identically),
    summed in int128; z is one fixed double tree with the pinned z95
    literal.

    Scale shape: one scan computes both losses; the rank is range-
    repartition + local row_number + broadcast offsets; one tie-group
    aggregate + 1-row rollup; readout 1 row."""
    from bytesprocessor_spark.operators.ranking import distributed_rank

    e = _t(spark, sf_dir, "embeddings")
    y = (F.col("label") % 2).cast("long")
    pa = _h60(F.concat(F.lit("wxa:"), F.col("vec_id").cast("string"))) % 1000001
    pb = (
        _h60(F.concat(F.lit("wxb:"), F.col("vec_id").cast("string"))) % 500001
        + y * 500000
    )
    d = e.select(
        "vec_id",
        (
            F.abs(y * 1000000 - pa) - F.abs(y * 1000000 - pb)
        ).alias("diff"),
    ).where(F.col("diff") != 0)
    d = d.withColumn("absd", F.abs(F.col("diff")))
    ranked = distributed_rank(
        d, [F.col("absd").asc(), F.col("vec_id").asc()], rank_col="rn"
    )
    g = ranked.groupBy("absd").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("rn").cast("long").alias("sum_rn"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
    )
    w = g.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("n_pos").cast("long").alias("npos"),
        F.sum(
            F.col("n_pos").cast("decimal(38,0)")
            * F.expr("sum_rn * 1000000 div cnt")
        )
        .cast("double")
        .alias("wp_micro"),
    )
    nD = F.col("n").cast("double")
    z = (F.col("wp_micro") / 1000000.0 - nD * (nD + 1) / 4) / F.sqrt(
        nD * (nD + 1) * (2 * nD + 1) / 24
    )
    return w.select(
        F.col("n").alias("n_pairs"),
        F.col("npos").alias("n_b_better"),
        F.col("wp_micro").alias("w_plus_micro"),
        F.round(z * 1000).cast("long").alias("z_milli"),
        (z > 1.9599639845400545).alias("model_b_better"),
    )


# ---------------------------------------------------------------------------
# EV38: exact paired permutation test (md5-seeded sign flips)
# ---------------------------------------------------------------------------

_PERM_K = 200


@query(
    "eval_permutation_test",
    f"""
    WITH s AS (
      SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
             CAST('0x' || substr(md5('wxa:' || CAST(vec_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 1000001 AS pa,
             (CAST('0x' || substr(md5('wxb:' || CAST(vec_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 500001) + CAST(label % 2 AS BIGINT) * 500000 AS pb
      FROM embeddings
    ),
    d AS (
      SELECT vec_id,
             ABS(y * 1000000 - pa) - ABS(y * 1000000 - pb) AS diff
      FROM s
    ),
    perms AS (
      SELECT CAST(UNNEST(range(-1, {_PERM_K})) AS BIGINT) AS k
    ),
    t AS (
      SELECT p.k,
             CAST(SUM(CASE WHEN p.k = -1 THEN d.diff
                  WHEN CAST('0x' || substr(md5('perm:' || CAST(p.k AS VARCHAR)
                       || ':' || CAST(d.vec_id AS VARCHAR)), 1, 15) AS BIGINT)
                       % 2 = 0 THEN d.diff ELSE -d.diff END) AS BIGINT) AS tk,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM d CROSS JOIN perms p
      GROUP BY p.k
    ),
    obs AS (SELECT ABS(tk) AS t_obs, tk AS t_signed, n FROM t WHERE k = -1)
    SELECT obs.n AS n_pairs, CAST({_PERM_K} AS BIGINT) AS k_perms,
           obs.t_signed AS t_obs,
           CAST(SUM(CASE WHEN ABS(t.tk) >= obs.t_obs THEN 1 ELSE 0 END)
             AS BIGINT) AS n_extreme,
           CAST((SUM(CASE WHEN ABS(t.tk) >= obs.t_obs THEN 1 ELSE 0 END) + 1)
                * 1000 // ({_PERM_K} + 1) AS BIGINT) AS p_milli
    FROM t CROSS JOIN obs WHERE t.k >= 0
    GROUP BY obs.n, obs.t_signed
    """,
)
def eval_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV38 — exact paired permutation (sign-flip) test on the same
    two pinned models as EV37: under H0 (no model difference) each
    loss difference's sign is exchangeable, so the null distribution
    is T_k = Σ s_ki·d_i over {_PERM_K} md5-seeded sign assignments;
    p = (1 + #{{|T_k| ≥ |T_obs|}})/(K+1).  The assumption-free
    inference device next to EV37's rank test and EV22's McNemar —
    no normal approximation anywhere, and the md5 seeding makes the
    'random' permutations bit-reproducible across engines and runs.

    Determinism: integer micro losses, integer ±sums per
    permutation (NO doubles in the whole query), integer floor-
    division p-value; the identity permutation rides as k = −1 so
    T_obs needs no second scan.

    Scale shape: one scan computes d; the K-fold expansion is
    map-only (explode against a {_PERM_K + 1}-row literal range) into
    a K-key aggregate with map-side combine — the shuffle carries
    K+1 rows per partition, not K×n; readout 1 row."""
    e = _t(spark, sf_dir, "embeddings")
    y = (F.col("label") % 2).cast("long")
    pa = _h60(F.concat(F.lit("wxa:"), F.col("vec_id").cast("string"))) % 1000001
    pb = (
        _h60(F.concat(F.lit("wxb:"), F.col("vec_id").cast("string"))) % 500001
        + y * 500000
    )
    d = e.select(
        "vec_id",
        (F.abs(y * 1000000 - pa) - F.abs(y * 1000000 - pb)).alias("diff"),
    )
    ex = d.select(
        "vec_id",
        "diff",
        F.explode(F.sequence(F.lit(-1), F.lit(_PERM_K - 1))).alias("k"),
    )
    sign_hash = (
        _h60(
            F.concat(
                F.lit("perm:"),
                F.col("k").cast("string"),
                F.lit(":"),
                F.col("vec_id").cast("string"),
            )
        )
        % 2
    )
    contrib = F.when(F.col("k") == -1, F.col("diff")).otherwise(
        F.when(sign_hash == 0, F.col("diff")).otherwise(-F.col("diff"))
    )
    t = ex.groupBy("k").agg(
        F.sum(contrib).cast("long").alias("tk"),
        F.count("*").cast("long").alias("n"),
    )
    t = bounded_single_group(t)  # K+1-row permutation table
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = t.select(
        "k",
        "tk",
        "n",
        F.max(F.when(F.col("k") == -1, F.abs(F.col("tk")))).over(w_all).alias(
            "t_obs_abs"
        ),
        F.max(F.when(F.col("k") == -1, F.col("tk"))).over(w_all).alias(
            "t_obs"
        ),
    )
    return (
        t.where(F.col("k") >= 0)
        .agg(
            F.max("n").alias("n_pairs"),
            F.lit(_PERM_K).cast("long").alias("k_perms"),
            F.max("t_obs").alias("t_obs"),
            F.sum(
                F.when(F.abs(F.col("tk")) >= F.col("t_obs_abs"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_extreme"),
        )
        .select(
            "n_pairs",
            "k_perms",
            "t_obs",
            "n_extreme",
            F.expr(
                f"CAST((n_extreme + 1) * 1000 div ({_PERM_K} + 1) AS BIGINT)"
            ).alias("p_milli"),
        )
    )
