"""Round-11 batch: Avro container source, the edit-distance verify
tier of the dedup stack, and analytics closures (stationarity, scale
tests, variance homogeneity, ordered blocked trends, calibration
decomposition, multiple-testing closure, supply-chain safety stock) —
each on the registry's exact-integer determinism contract (engines
aggregate only exact int64/int128/decimal moments; every statistic is
ONE fixed IEEE-double tree over those integers, quantized once;
per-term transcendental values are quantized BEFORE any cross-row
fold).

- S20 avro_roundtrip_read: the events table round-trips through the
  in-repo Avro object-container source (sources/avro.py — pure-spec
  implementation, deflate blocks, mapInPandas on both sides) and the
  readout aggregates FROM THE AVRO COPY; oracle recomputes from
  parquet, so equality proves the writer/reader preserve every row
  exactly.  Closes the mainstream-format matrix next to parquet S5,
  ORC S19, CSV/JSONL S6, WebDataset S12.
- L35 dedup_editratio_verified: the RefinedWeb-style fuzzy tier the
  dedup stack stopped one step short of — candidate pairs from the
  shared word-3-gram Jaccard>=0.5 table, VERIFIED by exact edit
  ratio lev/max(len) <= 0.3 (levenshtein is built-in on BOTH
  engines, so the whole tier is oracle-checkable).
- A153 events_kpss: KPSS level-stationarity statistic (l=0) per
  event type on the daily-count series — the null-reversed companion
  of A128's Mann-Kendall (KPSS nulls STATIONARITY; MK nulls
  no-trend), via exact integer partial sums of n-scaled deviations.
- A154 events_cramer_von_mises: two-sample Cramér-von-Mises via the
  exact rank identity — the all-CDF-gap companion of Q11's KS (max
  gap) and A135's Anderson-Darling (tail-weighted).
- A155 events_ansari_bradley: Ansari-Bradley rank scale test — the
  DISPERSION counterpart of Mood's median location test (A151),
  exact center-folded scores with midrank ties.
- A156 events_bartlett: Bartlett's variance-homogeneity chi-square
  across event types (exact rational group variances via the A34
  n-scaled device; log terms quantized per GROUP before the bounded
  k-fold) — the classical companion of A122's Brown-Forsythe.
- A157 events_variance_ratio: Lo-MacKinlay variance-ratio VR(q) on
  the daily count series (q=5) — random-walk diagnostic; q-period
  overlapping differences via self-join on the bounded day table.
- A158 orders_page_trend: Page's L ordered-alternative test for the
  blocked design (weekday blocks x priority treatments) — the
  BLOCKED counterpart of A152's Jonckheere (independent groups),
  reusing the Friedman midrank machinery (A129).
- A159 orders_benjamini_yekutieli: the BY step-up with the harmonic
  correction factor — closes the multiple-testing family (A90 BH,
  A136 Holm) with the dependence-robust member; A90's machinery and
  p-values verbatim.
- EV44 eval_brier_decomposition: Murphy's three-term decomposition
  (reliability - resolution + uncertainty) of the Brier score over
  the EV1 pinned pseudo-model's NTILE-10 bins — the additive account
  that EV3 (reliability diagram) and EV36 (ECE) read pieces of.
- SC7 part_safety_stock: safety stock and reorder point per brand at
  a pinned service ladder (z from the A90 pinned normal machinery is
  NOT needed — the z values are design constants), from exact
  integer demand moments over supplier lead-time windows.
- SQL10 sql_qualify_dedup: QUALIFY-style windowed dedup (latest
  order per customer) — DuckDB runs a native QUALIFY clause as the
  oracle while Spark expresses the same plan as window + filter,
  pinning the cross-engine equivalence of the idiom.

Later round-11 waves extend the batch to 24 entries: A160
events_quade (range-weighted blocked ranks), A161 events_lilliefors
(KS vs fitted normal), A162 events_spectral_flatness (DFT Wiener
entropy), GR17 graph_double_sweep (2-BFS diameter bound), S21
xml_roundtrip_read (built-in XML sink certification), S20b
avro_schema_evolution (spec schema resolution), S22/S23 JSONL/CSV
sink certification, A163 events_seasonal_mann_kendall
(Hirsch-Slack), A164 events_sign_test (paired direction floor),
EV45 eval_weighted_kappa (ordinal agreement, pure integer
rational), GR18 graph_harmonic_centrality (exact 1e6//d folds).

Reference scope note: the reference engine ends at the labeled packet
table (BytesProcessor.py:121-187); these are EXT/S/L rows of the
surface SURVEY §2 declares on top of it.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bytesprocessor_spark.operators.ranking import bounded_single_group
from bytesprocessor_spark.queries import _t, cents, query


# ---------------------------------------------------------------------------
# S20: Avro object-container round-trip source
# ---------------------------------------------------------------------------

@query(
    "avro_roundtrip_read",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def avro_roundtrip_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S20 — Avro round-trip: events is written to Avro object-
    container files (sources/avro.py — built in-repo from the public
    Apache Avro 1.12 spec because this container ships no spark-avro
    jar; deflate blocks, deterministic sync markers) and the readout
    aggregates FROM THE AVRO COPY.  The oracle recomputes the
    identical aggregate from the parquet source, so equality proves
    the encoder/decoder preserve every row, double bit-pattern, and
    key exactly — the S19 ORC device applied to the row-oriented
    interchange format.

    Determinism: exact cents / counts only; doubles survive the trip
    bit-exactly (IEEE little-endian per spec), so cents() after the
    round-trip equals cents() before it.

    Scale shape: the write is mapInPandas one-file-per-partition (no
    driver collect; the k-row manifest is the only localized data);
    the read distributes one file per task, matching the writer's
    parallelism; decode is Arrow-batched per block.  At the design
    point Avro is the ingest interchange copy and every analytical
    read happens once, into parquet."""
    from bytesprocessor_spark.sources.avro import read_avro, write_avro

    ev = (
        _t(spark, sf_dir, "events")
        .select("event_type", "value", "user_id")
        .repartition(8)
    )
    out = tempfile.mkdtemp(prefix="bp_avro_")
    try:
        write_avro(ev, f"{out}/events_avro").collect()
        back = read_avro(spark, f"{out}/events_avro", ev.schema)
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
# L35: exact edit-ratio verify tier over the near-dup candidate pairs
# ---------------------------------------------------------------------------

_EDIT_RATIO_MICRO = 300_000  # keep pairs with lev/max(len) <= 0.30


@query(
    "dedup_editratio_verified",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, greatest(len(toks) - 2, 1) + 1)])
               AS shingles
      FROM (SELECT doc_id,
                   [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
                    if len(x) > 0] AS toks
            FROM documents)
    ),
    t  AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
    i  AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM t a JOIN t b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
    p  AS (SELECT id_a, id_b
           FROM i JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id
           WHERE c * 1.0 / (x.n + y.n - c) >= 0.5),
    v  AS (SELECT p.id_a, p.id_b,
                  CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
                  CAST(GREATEST(LENGTH(da.text), LENGTH(db.text), 1)
                       AS BIGINT) AS max_len
           FROM p JOIN documents da ON p.id_a = da.doc_id
                  JOIN documents db ON p.id_b = db.doc_id)
    SELECT id_a, id_b, lev,
           CAST(lev * 1000000 // max_len AS BIGINT) AS edit_ratio_micro
    FROM v
    WHERE lev * 1000000 // max_len <= {_EDIT_RATIO_MICRO}
    ORDER BY id_a, id_b
    """,
)
def dedup_editratio_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L35 — exact edit-ratio verify tier: the word-3-gram Jaccard >=
    0.5 candidate pairs (the session-memoized shared pair table the
    whole cluster family reads) are VERIFIED by exact character edit
    ratio levenshtein/max(len) <= 0.30 — the RefinedWeb-style fuzzy
    tier on top of set-similarity candidates.  ``levenshtein`` is a
    built-in on BOTH engines with identical unit-cost semantics, so
    unlike the hash tiers this verify is fully oracle-checkable.

    Determinism: lev and lengths are exact integers; the ratio is one
    truncating micro division (Spark ``div`` == DuckDB ``//``) with a
    GREATEST(...,1) zero-guard on both texts.

    Scale shape: candidates come from the inverted-index pair scan
    (shuffle keys are shingles, never document pairs) and the O(L²)
    edit-distance dynamic program runs ONLY on that bounded candidate
    set — never all-pairs; the two text joins are co-partitioned on
    doc_id."""
    from bytesprocessor_spark.queries_llm import shared_pairs_05

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = shared_pairs_05(spark, sf_dir).select("id_a", "id_b")
    v = (
        pairs.join(docs.select(F.col("doc_id").alias("id_a"),
                               F.col("text").alias("ta")), "id_a")
        .join(docs.select(F.col("doc_id").alias("id_b"),
                          F.col("text").alias("tb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("ta", "tb").cast("long").alias("lev"),
            F.greatest(F.length("ta"), F.length("tb"), F.lit(1))
            .cast("long")
            .alias("max_len"),
        )
    )
    return (
        v.select(
            "id_a",
            "id_b",
            "lev",
            F.expr("CAST(lev * 1000000 div max_len AS BIGINT)").alias(
                "edit_ratio_micro"
            ),
        )
        .where(F.col("edit_ratio_micro") <= _EDIT_RATIO_MICRO)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# A153: KPSS level-stationarity statistic (l=0) per event type
# ---------------------------------------------------------------------------

@query(
    "events_kpss",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    dims AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS tot
      FROM d GROUP BY 1
    ),
    s AS (
      SELECT d.event_type, d.day, dims.n,
             CAST(dims.n * d.x - dims.tot AS BIGINT) AS dev
      FROM d JOIN dims USING (event_type)
    ),
    p AS (
      SELECT event_type, n, dev,
             CAST(SUM(dev) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ps
      FROM s
    ),
    agg AS (
      SELECT event_type, MAX(n) AS n,
             SUM(CAST(ps AS HUGEINT) * ps) AS sp2,
             SUM(CAST(dev AS HUGEINT) * dev) AS sd2
      FROM p GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN sd2 > 0
                THEN sp2 * 1000000 // (n * sd2) END AS BIGINT) AS kpss_micro
    FROM agg ORDER BY event_type
    """,
)
def events_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A153 — KPSS level-stationarity (l=0) per event type on the
    observed daily-count series: eta = sum_t S_t^2 / (n^2 sigma2)
    with S_t the partial sums of mean deviations and sigma2 the plain
    variance.  The null-REVERSED companion of A128's Mann-Kendall:
    KPSS nulls stationarity (big eta = wandering level), MK nulls
    no-trend — the pair brackets the series diagnosis.

    Determinism: with the A34 n-scaled device (dev_t = n*x_t - T) the
    statistic is EXACTLY sum(P_t^2) / (n * sum(dev_t^2)) — a pure
    integer rational; both engines accumulate in decimal(38,0) <->
    HUGEINT and truncate one micro division.  No doubles anywhere.
    Overflow: sum P^2 <= n^3 * max_dev^2 — 1e24-scale at fixture,
    1e32 at the 100 TB design point, inside 38 digits.

    Scale shape: one (type, day) hash aggregate absorbs the scan; the
    running partial sum is a type-partitioned window over the bounded
    calendar table; readout k rows."""
    d = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("x"))
    )
    dims = d.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("tot"),
    )
    s = d.join(F.broadcast(dims), "event_type").select(
        "event_type",
        "day",
        "n",
        (F.col("n") * F.col("x") - F.col("tot")).cast("long").alias("dev"),
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = s.select(
        "event_type", "n", "dev", F.sum("dev").over(w).cast("long").alias("ps")
    )
    agg = p.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.col("ps").cast("decimal(38,0)") * F.col("ps")).alias("sp2"),
        F.sum(F.col("dev").cast("decimal(38,0)") * F.col("dev")).alias("sd2"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.when(
            F.col("sd2") > 0,
            F.expr("CAST(sp2 * 1000000 div (n * sd2) AS BIGINT)"),
        ).alias("kpss_micro"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A154: two-sample Cramér-von-Mises via the exact rank identity
# ---------------------------------------------------------------------------

@query(
    "events_cramer_von_mises",
    """
    WITH v AS (
      SELECT event_type, user_id % 2 AS g,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ),
    rk AS (
      SELECT event_type, g, c,
             CAST(2 * RANK() OVER (PARTITION BY event_type ORDER BY c)
                  + COUNT(*) OVER (PARTITION BY event_type, c) - 1
                  AS BIGINT) AS r2,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type, g ORDER BY c)
                  AS BIGINT) AS i
      FROM v
    ),
    q AS (
      SELECT event_type, g, CAST(COUNT(*) AS BIGINT) AS sz,
             SUM(CAST(r2 - 2 * i AS HUGEINT) * (r2 - 2 * i)) AS qq
      FROM rk GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type, a.sz AS n, b.sz AS m, a.qq AS q0, b.qq AS q1
      FROM q a JOIN q b ON a.event_type = b.event_type
      WHERE a.g = 0 AND b.g = 1
    )
    SELECT event_type, n, m,
           CAST(ROUND((CAST(n * q0 + m * q1 AS DOUBLE) / 4.0
                       / (CAST(n + m AS DOUBLE) * CAST(n AS DOUBLE)
                          * CAST(m AS DOUBLE))
                       - (4.0 * CAST(n AS DOUBLE) * CAST(m AS DOUBLE) - 1.0)
                         / (6.0 * CAST(n + m AS DOUBLE))) * 1000000)
                AS BIGINT) AS t_micro
    FROM j ORDER BY event_type
    """,
)
def events_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A154 — two-sample Cramér-von-Mises by the exact rank identity
    (Anderson 1962): T = U/(N n m) - (4nm-1)/(6N) with U = n sum(r_i
    - i)^2 + m sum(s_j - j)^2 over combined-sample ranks — the
    integrated-CDF-gap companion of Q11's KS (max gap) and A135's
    Anderson-Darling (tail-weighted): all three read the same two
    empirical CDFs with different norms.  Samples: even vs odd
    user_id within each event type (the A131 parity-split device).

    Determinism: midranks in half units (2r integer, the A129
    device); own-sample positions are ROW_NUMBER with arbitrary
    tie-break — the SUM of (r2-2i)^2 over a tied block is invariant
    to the break because the i-multiset in the block is fixed;
    accumulations in HUGEINT <-> decimal(38,0); T is ONE fixed
    double tree over (q0, q1, n, m), micro-quantized.

    Scale shape: one combined rank window per type, one (type, g)
    aggregate; readout k rows."""
    v = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("g"),
        cents(F.col("value")).alias("c"),
    )
    w_comb = Window.partitionBy("event_type").orderBy("c")
    w_tie = Window.partitionBy("event_type", "c")
    w_own = Window.partitionBy("event_type", "g").orderBy("c")
    rk = v.select(
        "event_type",
        "g",
        (2 * F.rank().over(w_comb) + F.count("*").over(w_tie) - 1)
        .cast("long")
        .alias("r2"),
        F.row_number().over(w_own).cast("long").alias("i"),
    )
    dif = (F.col("r2") - 2 * F.col("i")).cast("decimal(38,0)")
    q = rk.groupBy("event_type", "g").agg(
        F.count("*").cast("long").alias("sz"),
        F.sum(dif * dif).alias("qq"),
    )
    a = q.where(F.col("g") == 0).select(
        "event_type", F.col("sz").alias("n"), F.col("qq").alias("q0")
    )
    b = q.where(F.col("g") == 1).select(
        "event_type", F.col("sz").alias("m"), F.col("qq").alias("q1")
    )
    j = a.join(b, "event_type")
    nD = F.col("n").cast("double")
    mD = F.col("m").cast("double")
    u4 = (F.col("n") * F.col("q0") + F.col("m") * F.col("q1")).cast("double")
    t = u4 / 4.0 / ((nD + mD) * nD * mD) - (4.0 * nD * mD - 1.0) / (
        6.0 * (nD + mD)
    )
    return j.select(
        "event_type",
        "n",
        "m",
        F.round(t * 1000000).cast("long").alias("t_micro"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A155: Ansari-Bradley rank scale (dispersion) test
# ---------------------------------------------------------------------------

@query(
    "events_ansari_bradley",
    """
    WITH v AS (
      SELECT event_type, user_id % 2 AS g,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ),
    rk AS (
      SELECT event_type, g,
             CAST(2 * RANK() OVER (PARTITION BY event_type ORDER BY c)
                  + COUNT(*) OVER (PARTITION BY event_type, c) - 1
                  AS BIGINT) AS r2,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nn
      FROM v
    ),
    sc AS (
      SELECT event_type, g, nn,
             CAST(LEAST(r2, 2 * (nn + 1) - r2) AS BIGINT) AS a2
      FROM rk
    ),
    agg AS (
      SELECT event_type, MAX(nn) AS nn,
             CAST(SUM(CASE WHEN g = 0 THEN a2 ELSE 0 END) AS BIGINT) AS ab2,
             CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m,
             CAST(SUM(a2) AS BIGINT) AS a2sum
      FROM sc GROUP BY 1
    ),
    dev AS (
      SELECT s.event_type,
             SUM(CAST(s.a2 * g.nn - g.a2sum AS HUGEINT)
                 * (s.a2 * g.nn - g.a2sum)) AS sd2
      FROM sc s JOIN agg g USING (event_type)
      GROUP BY 1
    )
    SELECT a.event_type, a.n, a.m, a.ab2,
           CAST(ROUND(CASE WHEN d.sd2 > 0 THEN
                  CAST(a.ab2 * a.nn - a.n * a.a2sum AS DOUBLE)
                  * SQRT(CAST(a.nn AS DOUBLE) * (CAST(a.nn AS DOUBLE) - 1.0)
                         / (CAST(a.n AS DOUBLE) * CAST(a.m AS DOUBLE)
                            * CAST(d.sd2 AS DOUBLE)))
                END * 1000) AS BIGINT) AS z_milli
    FROM agg a JOIN dev d USING (event_type)
    ORDER BY a.event_type
    """,
)
def events_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A155 — Ansari-Bradley scale test: combined-sample scores a =
    min(r, N+1-r) peak at the center, so a LOW sample-X score sum
    means X occupies the tails — more dispersed.  The DISPERSION
    counterpart of A151's Mood median test (location) on the same
    parity-split device; Brown-Forsythe (A122) tests variances via
    centered absolute deviations, AB via pure ranks.

    Determinism: midranks in half units make 2a = min(r2, 2(N+1)-r2)
    exact; the null z uses the finite-sampling variance of a
    without-replacement score sum, all moments N-scaled to integers
    (D_j = a2_j*N - A2, sum D = 0, sum D^2 in HUGEINT <->
    decimal(38,0)); z is ONE double tree, milli-quantized, NULL on a
    degenerate score spread (sd2 = 0) on both engines.

    Scale shape: one combined rank window per type, two keyed
    aggregates; readout k rows."""
    v = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("g"),
        cents(F.col("value")).alias("c"),
    )
    w_comb = Window.partitionBy("event_type").orderBy("c")
    w_tie = Window.partitionBy("event_type", "c")
    w_all = Window.partitionBy("event_type")
    rk = v.select(
        "event_type",
        "g",
        (2 * F.rank().over(w_comb) + F.count("*").over(w_tie) - 1)
        .cast("long")
        .alias("r2"),
        F.count("*").over(w_all).cast("long").alias("nn"),
    )
    sc = rk.select(
        "event_type",
        "g",
        "nn",
        F.least(F.col("r2"), 2 * (F.col("nn") + 1) - F.col("r2"))
        .cast("long")
        .alias("a2"),
    )
    agg = sc.groupBy("event_type").agg(
        F.max("nn").alias("nn"),
        F.sum(F.when(F.col("g") == 0, F.col("a2")).otherwise(0))
        .cast("long")
        .alias("ab2"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long").alias("n"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("m"),
        F.sum("a2").cast("long").alias("a2sum"),
    )
    dev_col = (F.col("a2") * F.col("nn_g") - F.col("a2sum")).cast("decimal(38,0)")
    dev = (
        sc.join(
            F.broadcast(
                agg.select(
                    "event_type", F.col("nn").alias("nn_g"), "a2sum"
                )
            ),
            "event_type",
        )
        .groupBy("event_type")
        .agg(F.sum(dev_col * dev_col).alias("sd2"))
    )
    nnD = F.col("nn").cast("double")
    z = F.when(
        F.col("sd2") > 0,
        (F.col("ab2") * F.col("nn") - F.col("n") * F.col("a2sum")).cast("double")
        * F.sqrt(
            nnD
            * (nnD - 1.0)
            / (
                F.col("n").cast("double")
                * F.col("m").cast("double")
                * F.col("sd2").cast("double")
            )
        ),
    )
    return (
        agg.join(dev, "event_type")
        .select(
            "event_type",
            "n",
            "m",
            "ab2",
            F.round(z * 1000).cast("long").alias("z_milli"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# A156: Bartlett's variance-homogeneity test across event types
# ---------------------------------------------------------------------------

@query(
    "events_bartlett",
    """
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
    ),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(c AS HUGEINT)) AS sx,
             SUM(CAST(c AS HUGEINT) * c) AS sxx
      FROM v GROUP BY 1
    ),
    ss AS (
      SELECT event_type, n,
             (n * sxx - sx * sx) // n AS ssq
      FROM g
    ),
    t AS (
      SELECT event_type, n, ssq,
             CASE WHEN n >= 2 AND ssq > 0 THEN
               CAST(ROUND((n - 1) * (LN(CAST(ssq AS DOUBLE))
                                     - LN(CAST(n - 1 AS DOUBLE))) * 1000000)
                    AS BIGINT)
             END AS term_micro,
             CASE WHEN n >= 2 THEN 1000000000000 // (n - 1) END AS inv_pico
      FROM ss
    ),
    w AS (
      SELECT event_type, n,
             CASE WHEN ssq <= 9223372036854775807 THEN CAST(ssq AS BIGINT)
             END AS ss_c2,
             term_micro,
             CAST(SUM(n) OVER () AS BIGINT) AS nn,
             CAST(COUNT(*) OVER () AS BIGINT) AS k,
             SUM(ssq) OVER () AS ssum,
             CAST(SUM(term_micro) OVER () AS BIGINT) AS sumterm,
             CAST(SUM(inv_pico) OVER () AS BIGINT) AS invsum,
             CAST(SUM(CASE WHEN term_micro IS NULL THEN 1 ELSE 0 END)
                  OVER () AS BIGINT) AS n_degenerate
      FROM t
    )
    SELECT event_type, n, ss_c2, term_micro,
           CAST(ROUND(CASE WHEN k >= 2 AND nn > k AND ssum > 0
                           AND n_degenerate = 0 THEN
             ((CAST(nn - k AS DOUBLE)
               * (LN(CAST(ssum AS DOUBLE)) - LN(CAST(nn - k AS DOUBLE)))
               - CAST(sumterm AS DOUBLE) / 1000000.0)
              / (1.0 + (CAST(invsum AS DOUBLE) / 1000000000000.0
                        - 1.0 / CAST(nn - k AS DOUBLE))
                       / (3.0 * CAST(k - 1 AS DOUBLE))))
           END * 1000) AS BIGINT) AS chi2_milli
    FROM w ORDER BY event_type
    """,
)
def events_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A156 — Bartlett's test of variance homogeneity across the k
    event types: chi2 = [(N-k) ln s_p^2 - sum (n_i-1) ln s_i^2] / C —
    the classical (normal-theory, most powerful) companion of A122's
    Brown-Forsythe (which trades power for robustness).

    Determinism: group SS is the exact A34 device n*Sxx - Sx^2 in
    HUGEINT <-> decimal(38,0), floor-divided ONCE by n (cents^2
    units, identical truncation on both engines — this integer SS is
    the pinned definition of the statistic); each group's ln term and
    the 1/(n_i-1) reciprocal are quantized to micro/pico integers
    BEFORE the k-fold (integer window sums, never a double fold); the
    final chi2 is ONE double tree.  The common 1e6/ (n-1)e6 scale
    offsets cancel between the pooled and group log terms, so plain
    ln(SS) - ln(n-1) trees are used on both engines.  ANY degenerate
    group (n < 2 or zero spread) NULLs the whole statistic
    identically on both engines via an explicit degenerate COUNT (a
    bare SUM over the NULL term would silently drop the group from
    the numerator while keeping its n in N); ss_c2 readout carries
    the standard int64 overflow guard.

    Scale shape: one type-keyed moment aggregate absorbs the scan;
    everything after runs on the k-row table; readout k rows."""
    v = _t(spark, sf_dir, "events").select(
        "event_type", cents(F.col("value")).alias("c")
    )
    g = v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sxx"),
    )
    ss = g.select(
        "event_type",
        "n",
        F.expr("(n * sxx - sx * sx) div n").cast("decimal(38,0)").alias("ssq"),
    )
    t = ss.select(
        "event_type",
        "n",
        "ssq",
        F.when(
            (F.col("n") >= 2) & (F.col("ssq") > 0),
            F.round(
                (F.col("n") - 1)
                * (
                    F.log(F.col("ssq").cast("double"))
                    - F.log((F.col("n") - 1).cast("double"))
                )
                * 1000000
            ).cast("long"),
        ).alias("term_micro"),
        F.when(
            F.col("n") >= 2, F.expr("1000000000000 div (n - 1)")
        ).alias("inv_pico"),
    )
    t = bounded_single_group(t)
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = t.select(
        "event_type",
        "n",
        F.when(
            F.col("ssq") <= F.lit(9223372036854775807).cast("decimal(38,0)"),
            F.col("ssq").cast("long"),
        ).alias("ss_c2"),
        "term_micro",
        F.sum("n").over(w_all).cast("long").alias("nn"),
        F.count("*").over(w_all).cast("long").alias("k"),
        F.sum("ssq").over(w_all).alias("ssum"),
        F.sum("term_micro").over(w_all).cast("long").alias("sumterm"),
        F.sum("inv_pico").over(w_all).cast("long").alias("invsum"),
        F.sum(F.when(F.col("term_micro").isNull(), 1).otherwise(0))
        .over(w_all)
        .cast("long")
        .alias("n_degenerate"),
    )
    nnD = F.col("nn").cast("double")
    kD = F.col("k").cast("double")
    chi2 = F.when(
        (F.col("k") >= 2)
        & (F.col("nn") > F.col("k"))
        & (F.col("ssum") > 0)
        & (F.col("n_degenerate") == 0),
        (
            (nnD - kD)
            * (F.log(F.col("ssum").cast("double")) - F.log(nnD - kD))
            - F.col("sumterm").cast("double") / 1000000.0
        )
        / (
            1.0
            + (
                F.col("invsum").cast("double") / 1000000000000.0
                - 1.0 / (nnD - kD)
            )
            / (3.0 * (kD - 1.0))
        ),
    )
    return w.select(
        "event_type",
        "n",
        "ss_c2",
        "term_micro",
        F.round(chi2 * 1000).cast("long").alias("chi2_milli"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A157: Lo-MacKinlay variance-ratio test on the dense daily series
# ---------------------------------------------------------------------------

_VR_LAGS = (2, 5, 10)


@query(
    "events_variance_ratio",
    f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    lim AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
    cal AS (
      SELECT CAST(r AS BIGINT) AS rel
      FROM lim, LATERAL (
        SELECT unnest(generate_series(0, DATE_DIFF('day', d0, d1))) AS r
      )
    ),
    s AS (
      SELECT cal.rel, COALESCE(d.x, 0) AS x
      FROM cal CROSS JOIN lim LEFT JOIN d ON d.day = lim.d0 + CAST(cal.rel AS INT)
    ),
    dims AS (
      SELECT CAST(MAX(rel) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN rel = 0 THEN x ELSE 0 END) AS BIGINT) AS x0,
             CAST(SUM(CASE WHEN rel = (SELECT MAX(rel) FROM s)
                           THEN x ELSE 0 END) AS BIGINT) AS xn
      FROM s
    ),
    q AS (SELECT unnest([{", ".join(str(q) for q in _VR_LAGS)}]) AS q),
    diffs AS (
      SELECT q.q,
             CAST(COUNT(*) AS BIGINT) AS m,
             SUM(CAST(dims.n * (a.x - b.x) - q.q * (dims.xn - dims.x0)
                      AS HUGEINT)
                 * (dims.n * (a.x - b.x) - q.q * (dims.xn - dims.x0)))
               AS s2
      FROM q CROSS JOIN dims
      JOIN s a ON a.rel >= q.q
      JOIN s b ON b.rel = a.rel - q.q
      GROUP BY 1
    ),
    onep AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS mb,
             SUM(CAST(dims.n * (a.x - b.x) - (dims.xn - dims.x0) AS HUGEINT)
                 * (dims.n * (a.x - b.x) - (dims.xn - dims.x0))) AS sb
      FROM dims JOIN s a ON a.rel >= 1 JOIN s b ON b.rel = a.rel - 1
    )
    SELECT d.q, d.m, o.mb,
           CAST(CASE WHEN o.sb > 0
                THEN d.s2 * o.mb * 1000 // (o.sb * d.m * d.q)
           END AS BIGINT) AS vr_milli
    FROM diffs d CROSS JOIN onep o
    ORDER BY d.q
    """,
)
def events_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A157 — Lo-MacKinlay variance ratio VR(q) = Var(q-day change) /
    (q * Var(1-day change)) on the DENSE daily event-count series
    (missing days count 0): VR ~ 1 under a random walk, < 1 under
    mean reversion, > 1 under momentum — the random-walk diagnostic
    next to A127's Hurst R/S and A133's Durbin-Watson.

    Determinism: drift-centering uses the exact n-scaled device A_t =
    n(x_t - x_{{t-q}}) - q(x_n - x_0) (the per-interval drift mean
    (x_n-x_0)/n never becomes a double); squared sums accumulate in
    HUGEINT <-> decimal(38,0); VR is ONE truncating cross-multiplied
    milli division — no doubles anywhere.  Plain (biased) variance
    form, overlapping q-windows, documented as the pinned definition.

    Scale shape: the dense calendar is bounded (sequence over the
    min..max span); diffs are equi-joins on the bounded day table
    with a 3-row broadcast lag grid; readout 3 rows."""
    d = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("x"))
    )
    lim = d.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = lim.select(
        F.explode(F.sequence(F.lit(0), F.datediff("d1", "d0"))).alias("rel"),
        "d0",
    )
    s = (
        cal.join(
            d.join(F.broadcast(lim.select("d0")), F.lit(True)).select(
                F.datediff("day", "d0").alias("rel"), "x"
            ),
            "rel",
            "left",
        )
        .select(F.col("rel").cast("long").alias("rel"),
                F.coalesce("x", F.lit(0)).alias("x"))
    )
    n_rel = s.agg(F.max("rel").alias("n"))
    dims = (
        s.join(F.broadcast(n_rel), F.lit(True))
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum(F.when(F.col("rel") == 0, F.col("x")).otherwise(0))
            .cast("long")
            .alias("x0"),
            F.sum(F.when(F.col("rel") == F.col("n"), F.col("x")).otherwise(0))
            .cast("long")
            .alias("xn"),
        )
    )
    qgrid = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _VR_LAGS])).alias("q")
    )
    a = s.select(F.col("rel").alias("ra"), F.col("x").alias("xa"))
    b = s.select(F.col("rel").alias("rb"), F.col("x").alias("xb"))
    term = (
        F.col("n") * (F.col("xa") - F.col("xb"))
        - F.col("q") * (F.col("xn") - F.col("x0"))
    ).cast("decimal(38,0)")
    diffs = (
        a.crossJoin(F.broadcast(qgrid))
        .withColumn("rb", F.col("ra") - F.col("q"))
        .where(F.col("rb") >= 0)
        .join(b, "rb")
        .crossJoin(F.broadcast(dims))
        .groupBy("q")
        .agg(F.count("*").cast("long").alias("m"), F.sum(term * term).alias("s2"))
    )
    term1 = (
        F.col("n") * (F.col("xa") - F.col("xb")) - (F.col("xn") - F.col("x0"))
    ).cast("decimal(38,0)")
    onep = (
        a.withColumn("rb", F.col("ra") - 1)
        .where(F.col("rb") >= 0)
        .join(b, "rb")
        .crossJoin(F.broadcast(dims))
        .agg(
            F.count("*").cast("long").alias("mb"),
            F.sum(term1 * term1).alias("sb"),
        )
    )
    return (
        diffs.crossJoin(F.broadcast(onep))
        .select(
            "q",
            "m",
            "mb",
            F.when(
                F.col("sb") > 0,
                F.expr("CAST(s2 * mb * 1000 div (sb * m * q) AS BIGINT)"),
            ).alias("vr_milli"),
        )
        .orderBy("q")
    )


# ---------------------------------------------------------------------------
# A158: Page's L ordered trend test (weekday blocks x priority)
# ---------------------------------------------------------------------------

@query(
    "orders_page_trend",
    """
    WITH cell AS (
      SELECT DATE_DIFF('day', DATE '1970-01-01', o_orderdate) % 7 AS blk,
             CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS j,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cc
      FROM orders GROUP BY 1, 2
    ),
    rk AS (
      SELECT blk, j,
             CAST(2 * RANK() OVER (PARTITION BY blk ORDER BY cc)
                  + COUNT(*) OVER (PARTITION BY blk, cc) - 1 AS BIGINT) AS mr2
      FROM cell
    ),
    rj AS (
      SELECT j, CAST(SUM(mr2) AS BIGINT) AS r2
      FROM rk GROUP BY 1
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT blk) AS BIGINT) AS b,
             CAST(COUNT(DISTINCT j) AS BIGINT) AS k
      FROM cell
    ),
    l AS (SELECT CAST(SUM(j * r2) AS BIGINT) AS l2 FROM rj)
    SELECT rj.j, rj.r2 AS rank2_sum,
           l.l2,
           CAST(ROUND(CASE WHEN dims.k > 1 THEN
             (CAST(l.l2 AS DOUBLE) / 2.0
              - CAST(dims.b AS DOUBLE) * CAST(dims.k AS DOUBLE)
                * CAST(dims.k + 1 AS DOUBLE) * CAST(dims.k + 1 AS DOUBLE)
                / 4.0)
             / SQRT(CAST(dims.b AS DOUBLE)
                    * CAST(dims.k * dims.k * dims.k - dims.k AS DOUBLE)
                    * CAST(dims.k * dims.k * dims.k - dims.k AS DOUBLE)
                    / (144.0 * CAST(dims.k - 1 AS DOUBLE)))
           END * 1000) AS BIGINT) AS z_milli
    FROM rj CROSS JOIN dims CROSS JOIN l
    ORDER BY rj.j
    """,
)
def orders_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A158 — Page's L test for an ordered alternative in the blocked
    design: weekday blocks (epoch-day mod 7, the hazard-free weekday
    key) x priority treatments ranked within each block by revenue;
    L = sum_j j*R_j grows when revenue rises monotonically with
    priority.  The BLOCKED counterpart of A152's Jonckheere
    (independent groups) and the directional sharpening of A129's
    Friedman (which only asks "any difference").

    Determinism: cell revenues are exact cents sums; midranks in half
    units (2R integer, A129 device); L2 = sum j*2R_j exact int64; z
    is ONE double tree over (L2, b, k) using the classical no-tie
    null moments E[L] = bk(k+1)^2/4, Var[L] = b(k^3-k)^2/(144(k-1))
    (cents cell sums make ties measure-zero; the midrank device keeps
    the statistic defined if they occur).

    Scale shape: one (weekday, priority) aggregate absorbs the scan;
    ranks run on the bounded 7xk grid; readout k rows."""
    cell = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (
                F.datediff(
                    F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
                )
                % 7
            ).alias("blk"),
            F.substring("o_orderpriority", 1, 1).cast("long").alias("j"),
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("cc"))
    )
    w_rank = Window.partitionBy("blk").orderBy("cc")
    w_tie = Window.partitionBy("blk", "cc")
    rk = cell.select(
        "blk",
        "j",
        (2 * F.rank().over(w_rank) + F.count("*").over(w_tie) - 1)
        .cast("long")
        .alias("mr2"),
    )
    rj = rk.groupBy("j").agg(F.sum("mr2").cast("long").alias("r2"))
    dims = cell.agg(
        F.countDistinct("blk").cast("long").alias("b"),
        F.countDistinct("j").cast("long").alias("k"),
    )
    l = rj.agg(F.sum(F.col("j") * F.col("r2")).cast("long").alias("l2"))
    j = rj.crossJoin(F.broadcast(dims)).crossJoin(F.broadcast(l))
    bD, kD = F.col("b").cast("double"), F.col("k").cast("double")
    kcube = (
        F.col("k") * F.col("k") * F.col("k") - F.col("k")
    ).cast("double")
    z = F.when(
        F.col("k") > 1,
        (
            F.col("l2").cast("double") / 2.0
            - bD * kD * (kD + 1.0) * (kD + 1.0) / 4.0
        )
        / F.sqrt(bD * kcube * kcube / (144.0 * (kD - 1.0))),
    )
    return j.select(
        "j",
        F.col("r2").alias("rank2_sum"),
        "l2",
        F.round(z * 1000).cast("long").alias("z_milli"),
    ).orderBy("j")


# ---------------------------------------------------------------------------
# A159: Benjamini-Yekutieli dependence-robust FDR step-up
# ---------------------------------------------------------------------------

def _by_sql() -> str:
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
    h AS (
      SELECT CAST(SUM(1000000000000 // CAST(i AS BIGINT)) AS BIGINT) AS c_pico
      FROM (SELECT unnest(generate_series(
              1, (SELECT CAST(MAX(n_tests) AS INT) FROM p))) AS i)
    ),
    r AS (
      SELECT p.*, h.c_pico,
             CAST(ROW_NUMBER() OVER (ORDER BY p_micro, g, dow) AS BIGINT)
               AS rank
      FROM p CROSS JOIN h
    ),
    st AS (
      SELECT *,
             CAST(MAX(CASE WHEN CAST(p_micro AS HUGEINT) * n_tests * c_pico
                                <= CAST(rank AS HUGEINT) * 50000
                                   * 1000000000000
                           THEN rank ELSE 0 END) OVER () AS BIGINT) AS i_star,
             CAST(LEAST(1000000, MIN(
               CAST(ROUND(CAST(p_micro AS DOUBLE) * CAST(n_tests AS DOUBLE)
                    * (CAST(c_pico AS DOUBLE) / 1000000000000.0)
                    / CAST(rank AS DOUBLE)) AS BIGINT))
               OVER (ORDER BY rank DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS BIGINT) AS qval_micro
      FROM r
    )
    SELECT g AS event_type, dow, n_gd, p_micro, rank,
           rank <= i_star AS rejected, qval_micro
    FROM st ORDER BY rank
    """


@query("events_benjamini_yekutieli", _by_sql())
def events_benjamini_yekutieli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A159 — Benjamini-Yekutieli step-up over the A90 35-test family
    (type x ISO-weekday proportion z-tests): reject while p_(i) <=
    i*alpha/(m*c(m)), c(m) = sum 1/i — FDR control valid under
    ARBITRARY dependence, where A90's BH assumes positive dependence
    and A136's Holm controls the stricter FWER.  Closes the
    multiple-testing family with its dependence-robust member; A90's
    exact machinery (pinned A-S normal tail, micro p) verbatim.

    Determinism: the harmonic factor accumulates 1e12 // i pico
    integers (never a double fold); the step-up comparison is a pure
    128-bit integer cross-multiply (HUGEINT <-> decimal(38,0)); the
    adjusted q-value is the standard running tail-min of a per-row
    fixed double tree, micro-quantized per row before the min.

    Scale shape: one (type, dow) aggregate absorbs the scan; the
    step-up runs on the bounded 35-row test table."""
    from bytesprocessor_spark.operators.ranking import (
        bounded_single_group as _bsg,
    )
    from bytesprocessor_spark.queries_r8b import _PHI_TAIL

    cell = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("g"),
            # A90's engine-neutral ISODOW device (Spark weekday: Monday=0)
            (F.expr("weekday(ts)") + 1).cast("long").alias("dow"),
        )
        .agg(F.count("*").cast("long").alias("n_gd"))
    )
    cell = _bsg(cell)
    w_d = Window.partitionBy("__opid", "dow")
    w_g = Window.partitionBy("__opid", "g")
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = cell.select(
        "g",
        "dow",
        "n_gd",
        F.sum("n_gd").over(w_d).cast("long").alias("n_d"),
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
        F.expr(f"CAST(ROUND(2.0 * {tail} * 1000000) AS BIGINT)").alias(
            "p_micro"
        ),
    )
    h = (
        p.groupBy("__opid")
        .agg(F.max("n_tests").alias("mt"))
        .select(
            "__opid",
            F.explode(F.sequence(F.lit(1), F.col("mt"))).alias("i"),
        )
        .groupBy("__opid")
        .agg(
            F.sum(F.expr("1000000000000 div CAST(i AS BIGINT)"))
            .cast("long")
            .alias("c_pico")
        )
    )
    r = p.join(F.broadcast(h), "__opid").withColumn(
        "rank",
        F.row_number()
        .over(Window.partitionBy("__opid").orderBy("p_micro", "g", "dow"))
        .cast("long"),
    )
    w_all2 = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_qd = (
        Window.partitionBy("__opid")
        .orderBy(F.col("rank").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    accept = F.expr(
        "CAST(p_micro AS DECIMAL(38,0)) * n_tests * c_pico"
        " <= CAST(rank AS DECIMAL(38,0)) * 50000 * 1000000000000"
    )
    qterm = F.round(
        F.col("p_micro").cast("double")
        * F.col("n_tests").cast("double")
        * (F.col("c_pico").cast("double") / 1000000000000.0)
        / F.col("rank").cast("double")
    ).cast("long")
    st = r.select(
        "g",
        "dow",
        "n_gd",
        "p_micro",
        "rank",
        F.max(F.when(accept, F.col("rank")).otherwise(F.lit(0)))
        .over(w_all2)
        .cast("long")
        .alias("i_star"),
        F.least(F.lit(1000000).cast("long"), F.min(qterm).over(w_qd).cast("long"))
        .alias("qval_micro"),
    )
    return st.select(
        F.col("g").alias("event_type"),
        "dow",
        "n_gd",
        "p_micro",
        "rank",
        (F.col("rank") <= F.col("i_star")).alias("rejected"),
        "qval_micro",
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# EV44: Murphy decomposition of the Brier score (reliability /
# resolution / uncertainty) over the EV1 pinned pseudo-model
# ---------------------------------------------------------------------------

@query(
    "eval_brier_decomposition",
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
             CAST(SUM(pm) AS BIGINT) AS sum_pm
      FROM g GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(obs_pos) AS BIGINT) AS oo
      FROM s
    ),
    t AS (
      SELECT s.bin, s.n, s.obs_pos,
             CAST(s.sum_pm // s.n AS BIGINT) AS pbar_micro,
             CAST(ROUND(
               CAST(s.sum_pm - s.obs_pos * 1000000 AS DOUBLE)
               * CAST(s.sum_pm - s.obs_pos * 1000000 AS DOUBLE)
               / (CAST(s.n AS DOUBLE) * 1000000000000.0) * 1000000000)
               AS BIGINT) AS rel_nano,
             CAST(ROUND(
               CAST(s.obs_pos * tot.nn - tot.oo * s.n AS DOUBLE)
               * CAST(s.obs_pos * tot.nn - tot.oo * s.n AS DOUBLE)
               / (CAST(s.n AS DOUBLE) * CAST(tot.nn AS DOUBLE)
                  * CAST(tot.nn AS DOUBLE)) * 1000000000)
               AS BIGINT) AS res_nano,
             tot.nn, tot.oo
      FROM s CROSS JOIN tot
    )
    SELECT bin, n, obs_pos, pbar_micro, rel_nano, res_nano,
           CAST(ROUND(CAST(SUM(rel_nano) OVER () AS DOUBLE)
                      / CAST(nn AS DOUBLE) / 1000.0) AS BIGINT)
             AS reliability_micro,
           CAST(ROUND(CAST(SUM(res_nano) OVER () AS DOUBLE)
                      / CAST(nn AS DOUBLE) / 1000.0) AS BIGINT)
             AS resolution_micro,
           CAST(ROUND(CAST(oo AS DOUBLE) * CAST(nn - oo AS DOUBLE)
                      / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
                      * 1000000) AS BIGINT) AS uncertainty_micro
    FROM t ORDER BY bin
    """,
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV44 — Murphy's decomposition Brier = reliability - resolution
    + uncertainty over the EV1 pinned pseudo-model's NTILE-10 bins:
    reliability is the calibration gap EV3 draws and EV36 averages,
    resolution is how far bin outcome rates stray from the base rate
    (the part a sharper model EARNS), uncertainty is the base-rate
    floor no model can beat — the additive account of WHERE the
    Brier score comes from.

    Determinism: bin moments are exact int64 (sum_pm is the exact
    predicted mass in micro); each bin's reliability/resolution term
    is one fixed double tree NANO-quantized BEFORE the 10-bin fold
    (A112 discipline); the three readout columns are fixed double
    trees over the integer window sums, micro-quantized.

    Scale shape: distributed ntile (range-partitioned rank), one
    10-bin aggregate; readout 10 rows."""
    from bytesprocessor_spark.operators.ranking import distributed_ntile
    from bytesprocessor_spark.queries_eval import _scored

    b = _scored(spark, sf_dir)
    mm = b.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    p = b.crossJoin(F.broadcast(mm)).select(
        "vec_id",
        "y",
        F.expr(
            "CAST(((score - lo) * 1000000) div GREATEST(hi - lo, 1) AS BIGINT)"
        ).alias("pm"),
    )
    g = distributed_ntile(
        p, [F.col("pm").asc(), F.col("vec_id").asc()], 10, tile_col="bin"
    )
    s = g.groupBy(F.col("bin").cast("long").alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("obs_pos"),
        F.sum("pm").cast("long").alias("sum_pm"),
    )
    s = bounded_single_group(s)
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = s.select(
        "bin",
        "n",
        "obs_pos",
        "sum_pm",
        F.sum("n").over(w_all).cast("long").alias("nn"),
        F.sum("obs_pos").over(w_all).cast("long").alias("oo"),
        F.col("__opid"),
    )
    d_rel = (F.col("sum_pm") - F.col("obs_pos") * 1000000).cast("double")
    rel_nano = F.round(
        d_rel * d_rel / (F.col("n").cast("double") * 1000000000000.0)
        * 1000000000
    ).cast("long")
    d_res = (F.col("obs_pos") * F.col("nn") - F.col("oo") * F.col("n")).cast(
        "double"
    )
    res_nano = F.round(
        d_res
        * d_res
        / (
            F.col("n").cast("double")
            * F.col("nn").cast("double")
            * F.col("nn").cast("double")
        )
        * 1000000000
    ).cast("long")
    t2 = t.select(
        "bin",
        "n",
        "obs_pos",
        F.expr("CAST(sum_pm div n AS BIGINT)").alias("pbar_micro"),
        rel_nano.alias("rel_nano"),
        res_nano.alias("res_nano"),
        "nn",
        "oo",
        F.col("__opid"),
    )
    nnD = F.col("nn").cast("double")
    ooD = F.col("oo").cast("double")
    return t2.select(
        "bin",
        "n",
        "obs_pos",
        "pbar_micro",
        "rel_nano",
        "res_nano",
        F.round(
            F.sum("rel_nano").over(w_all).cast("double") / nnD / 1000.0
        )
        .cast("long")
        .alias("reliability_micro"),
        F.round(
            F.sum("res_nano").over(w_all).cast("double") / nnD / 1000.0
        )
        .cast("long")
        .alias("resolution_micro"),
        F.round(ooD * (nnD - ooD) / (nnD * nnD) * 1000000)
        .cast("long")
        .alias("uncertainty_micro"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# SC7: safety stock / reorder point per brand at a pinned service ladder
# ---------------------------------------------------------------------------

_SS_LEAD_DAYS = 7  # pinned replenishment lead time


@query(
    "part_safety_stock",
    f"""
    WITH d AS (
      SELECT p.p_brand, CAST(l.l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    lim AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
    cal AS (
      SELECT CAST(r AS BIGINT) AS rel
      FROM lim, LATERAL (
        SELECT unnest(generate_series(0, DATE_DIFF('day', d0, d1))) AS r
      )
    ),
    grid AS (
      SELECT b.p_brand, cal.rel, COALESCE(d.q, 0) AS q
      FROM (SELECT DISTINCT p_brand FROM part) b
      CROSS JOIN cal CROSS JOIN lim
      LEFT JOIN d ON d.p_brand = b.p_brand
                 AND d.day = lim.d0 + CAST(cal.rel AS INT)
    ),
    st AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(q) AS BIGINT) AS sx,
             SUM(CAST(q AS HUGEINT) * q) AS sxx
      FROM grid GROUP BY 1
    ),
    v AS (
      SELECT p_brand, n_days, sx,
             n_days * sxx - CAST(sx AS HUGEINT) * sx AS var_num
      FROM st
    )
    SELECT p_brand, n_days, sx AS demand_sum_c,
           CAST(ROUND(1.281552 * SQRT({_SS_LEAD_DAYS}.0
                * CAST(var_num AS DOUBLE)) / CAST(n_days AS DOUBLE))
                AS BIGINT) AS ss90_c,
           CAST(ROUND(1.644854 * SQRT({_SS_LEAD_DAYS}.0
                * CAST(var_num AS DOUBLE)) / CAST(n_days AS DOUBLE))
                AS BIGINT) AS ss95_c,
           CAST(ROUND(2.326348 * SQRT({_SS_LEAD_DAYS}.0
                * CAST(var_num AS DOUBLE)) / CAST(n_days AS DOUBLE))
                AS BIGINT) AS ss99_c,
           CAST(sx * {_SS_LEAD_DAYS} // n_days
                + CAST(ROUND(1.644854 * SQRT({_SS_LEAD_DAYS}.0
                      * CAST(var_num AS DOUBLE)) / CAST(n_days AS DOUBLE))
                      AS BIGINT) AS BIGINT) AS rop95_c
    FROM v ORDER BY p_brand
    """,
)
def part_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SC7 — safety stock SS = z * sigma_d * sqrt(L) and reorder
    point ROP = mu_d*L + SS per brand at the pinned 90/95/99 service
    ladder (z constants 1.281552 / 1.644854 / 2.326348, both engine
    texts carry the identical literals) — the service-level closure
    of the supply-chain family: SC3's newsvendor prices ONE period's
    over/under-age, SC5's risk pooling compares variance ACROSS
    locations; safety stock is the operating policy a planner
    actually sets.  Lead time L = 7 days pinned.

    Determinism: daily demand (zero-filled over the dense calendar,
    so quiet days lower the mean and raise nothing) in exact cents;
    variance numerator n*Sxx - Sx^2 exact in HUGEINT <->
    decimal(38,0); each SS column is ONE double tree (literal z,
    sqrt of exact integer, one division), cents-rounded; mu_d*L is
    an exact truncating integer division.

    Scale shape: one (brand, day) aggregate absorbs the lineitem x
    part broadcast join; the dense grid is brands x bounded
    calendar; readout k brands."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    d = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", F.col("l_shipdate").cast("date").alias("day"))
        .agg(F.sum(cents(F.col("l_quantity"))).cast("long").alias("q"))
    )
    lim = d.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = lim.select(
        F.explode(F.sequence(F.lit(0), F.datediff("d1", "d0"))).alias("rel"),
        "d0",
    )
    brands = pt.select("p_brand").distinct()
    grid = (
        brands.crossJoin(cal)
        .join(
            d.join(F.broadcast(lim.select("d0")), F.lit(True)).select(
                "p_brand", F.datediff("day", "d0").alias("rel"), "q"
            ),
            ["p_brand", "rel"],
            "left",
        )
        .select("p_brand", F.coalesce("q", F.lit(0)).alias("q"))
    )
    st = grid.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("q").cast("long").alias("sx"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sxx"),
    )
    v = st.select(
        "p_brand",
        "n_days",
        "sx",
        (
            F.col("n_days") * F.col("sxx")
            - F.col("sx").cast("decimal(38,0)") * F.col("sx")
        ).alias("var_num"),
    )
    sig = F.sqrt(
        F.lit(float(_SS_LEAD_DAYS)) * F.col("var_num").cast("double")
    ) / F.col("n_days").cast("double")
    return v.select(
        "p_brand",
        "n_days",
        F.col("sx").alias("demand_sum_c"),
        F.round(F.lit(1.281552) * sig).cast("long").alias("ss90_c"),
        F.round(F.lit(1.644854) * sig).cast("long").alias("ss95_c"),
        F.round(F.lit(2.326348) * sig).cast("long").alias("ss99_c"),
        (
            F.expr(f"CAST(sx * {_SS_LEAD_DAYS} div n_days AS BIGINT)")
            + F.round(F.lit(1.644854) * sig).cast("long")
        ).alias("rop95_c"),
    ).orderBy("p_brand")


# ---------------------------------------------------------------------------
# SQL10: QUALIFY-style windowed dedup (latest order per customer)
# ---------------------------------------------------------------------------

@query(
    "sql_qualify_dedup",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS odate,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_c
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC,
                                        o_orderkey DESC) = 1
    ORDER BY o_custkey
    """,
)
def sql_qualify_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL10 — QUALIFY-idiom dedup: keep each customer's latest order
    (date desc, orderkey desc as the deterministic tie-break).  The
    oracle runs DuckDB's NATIVE QUALIFY clause; Spark has no QUALIFY,
    so the engine expresses the same plan as a keyed window +
    post-filter — pinning the cross-engine equivalence of the single
    most common windowed-dedup idiom (the S16 merge-upsert and SCD2
    rows both lean on it).

    Determinism: ROW_NUMBER over a total order (orderkey unique);
    dates emitted as strings per the driver contract.

    Scale shape: one hash-partitioned window on the dedup key — the
    same shuffle a groupBy would pay, no single-partition stage."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            cents(F.col("o_totalprice")).alias("total_c"),
            F.row_number().over(w).alias("__rn"),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# A160: Quade test (range-weighted blocked ranks)
# ---------------------------------------------------------------------------

@query(
    "events_quade",
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
                  + COUNT(*) OVER (PARTITION BY day, x) - 1 AS BIGINT) AS mr2
      FROM grid
    ),
    rng AS (
      SELECT day, CAST(MAX(x) - MIN(x) AS BIGINT) AS r FROM grid GROUP BY day
    ),
    qr AS (
      SELECT day,
             CAST(2 * RANK() OVER (ORDER BY r)
                  + COUNT(*) OVER (PARTITION BY r) - 1 AS BIGINT) AS q2
      FROM rng
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
      FROM grid
    ),
    s AS (
      SELECT rk.event_type,
             SUM(CAST(qr.q2 * (rk.mr2 - (dims.k + 1)) AS HUGEINT)) AS s4,
             SUM(CAST(qr.q2 * (rk.mr2 - (dims.k + 1)) AS HUGEINT)
                 * (qr.q2 * (rk.mr2 - (dims.k + 1)))) AS sa_j
      FROM rk JOIN qr USING (day) CROSS JOIN dims
      GROUP BY 1
    ),
    agg AS (
      SELECT SUM(sa_j) AS sa, SUM(s4 * s4) AS sb FROM s
    )
    SELECT s.event_type,
           CAST(s.s4 AS BIGINT) AS s4,
           CAST(CASE WHEN dims.n * agg.sa - agg.sb > 0
                THEN (dims.n - 1) * agg.sb * 1000
                     // (dims.n * agg.sa - agg.sb)
           END AS BIGINT) AS f_milli
    FROM s CROSS JOIN agg CROSS JOIN dims
    ORDER BY s.event_type
    """,
)
def events_quade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A160 — Quade test: Friedman's blocked ranks WEIGHTED by each
    block's range rank (big-spread days count more), F = (n-1)B /
    (A-B) — more powerful than A129's Friedman for small k because
    it uses the between-block magnitude information Friedman throws
    away; completes the blocked-rank family A129 (any difference) /
    A158 (ordered trend) / A160 (range-weighted).

    Determinism: within-day midranks and across-day range midranks
    both in half units (2r, 2Q integers); the scaled scores S4 =
    2Q*(2r-(k+1)) are exact integers, so A and B fold exactly in
    HUGEINT <-> decimal(38,0) and the common 1/16 scale cancels in
    F = (n-1)*SB*1000 // (n*SA - SB) — a pure truncating integer
    rational, NO doubles.  Degenerate spread (n*SA = SB) NULLs F on
    both engines.

    Scale shape: one (day, type) aggregate; within-day ranks on the
    k-wide grid; the across-day range ranking uses the value-domain
    -bounded prefix-count device (never a single-partition window
    over raw rows); readout k rows."""
    from bytesprocessor_spark.operators.ranking import (
        bounded_single_group as _bsg,
    )

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
        .select(
            "day", "event_type", F.coalesce(F.col("x"), F.lit(0)).alias("x")
        )
    )
    w_rank = Window.partitionBy("day").orderBy("x")
    w_tie = Window.partitionBy("day", "x")
    rk = grid.select(
        "day",
        "event_type",
        (2 * F.rank().over(w_rank) + F.count("*").over(w_tie) - 1)
        .cast("long")
        .alias("mr2"),
    )
    rng = grid.groupBy("day").agg(
        (F.max("x") - F.min("x")).cast("long").alias("r")
    )
    # across-day range midrank via the value-domain-bounded
    # prefix-count device (EV1 idiom): 2Q = 2*cum_before + cnt + 1
    vals = _bsg(rng.groupBy("r").agg(F.count("*").cast("long").alias("cnt")))
    w_val = Window.partitionBy("__opid").orderBy("r").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vals = vals.select(
        "r",
        "cnt",
        (2 * (F.sum("cnt").over(w_val) - F.col("cnt")) + F.col("cnt") + 1)
        .cast("long")
        .alias("q2"),
    )
    qr = rng.join(vals.select("r", "q2"), "r").select("day", "q2")
    dims = grid.agg(
        F.countDistinct("day").cast("long").alias("n"),
        F.countDistinct("event_type").cast("long").alias("k"),
    )
    s4cell = (
        rk.join(qr, "day")
        .crossJoin(F.broadcast(dims))
        .select(
            "event_type",
            "n",
            (
                F.col("q2") * (F.col("mr2") - (F.col("k") + 1))
            ).cast("decimal(38,0)").alias("s4c"),
        )
    )
    s = s4cell.groupBy("event_type").agg(
        F.sum("s4c").alias("s4"),
        F.sum(F.col("s4c") * F.col("s4c")).alias("sa_j"),
        F.max("n").alias("n"),
    )
    agg = s.agg(
        F.sum("sa_j").alias("sa"),
        F.sum(F.col("s4") * F.col("s4")).alias("sb"),
        F.max("n").alias("n"),
    )
    j = s.select("event_type", "s4").crossJoin(F.broadcast(agg))
    return j.select(
        "event_type",
        F.col("s4").cast("long").alias("s4"),
        F.when(
            F.col("n") * F.col("sa") - F.col("sb") > 0,
            F.expr(
                "CAST((n - 1) * sb * 1000 div (n * sa - sb) AS BIGINT)"
            ),
        ).alias("f_milli"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A161: Lilliefors normality statistic (KS with estimated parameters)
# ---------------------------------------------------------------------------

def _lilliefors_sql() -> str:
    from bytesprocessor_spark.queries_r8b import _PHI_TAIL

    z = "((CAST(n AS DOUBLE) * CAST(c AS DOUBLE) - CAST(sx AS DOUBLE))" \
        " / SQRT(CAST(vnum AS DOUBLE)))"
    tail = _PHI_TAIL.replace("ZG", f"ABS({z})")
    return f"""
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
    ),
    mo AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sx,
             CAST(COUNT(*) AS HUGEINT) * SUM(CAST(c AS HUGEINT) * c)
               - CAST(SUM(CAST(c AS HUGEINT)) AS HUGEINT)
                 * SUM(CAST(c AS HUGEINT)) AS vnum
      FROM v GROUP BY 1
    ),
    dv AS (
      SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, c, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM dv
    ),
    ph AS (
      SELECT cum.event_type, cum.c, cum.cnt, cum.cum, mo.n, mo.sx,
             CASE WHEN {z} >= 0
                  THEN 1000000 - CAST(ROUND({tail} * 1000000) AS BIGINT)
                  ELSE CAST(ROUND({tail} * 1000000) AS BIGINT)
             END AS phi_micro
      FROM cum JOIN mo USING (event_type)
      WHERE mo.vnum > 0
    ),
    d AS (
      SELECT event_type, MAX(n) AS n,
             CAST(MAX(GREATEST(ABS(cum * 1000000 - phi_micro * n),
                               ABS((cum - cnt) * 1000000 - phi_micro * n)))
                  AS BIGINT) AS dnum
      FROM ph GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(dnum // n AS BIGINT) AS d_micro
    FROM d ORDER BY event_type
    """


@query("events_lilliefors", _lilliefors_sql())
def events_lilliefors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A161 — Lilliefors normality statistic per event type: the KS
    distance between the value ECDF and Normal(mu-hat, sigma-hat)
    WITH the parameters estimated from the same data (the correction
    that makes plain KS-vs-fitted-normal anticonservative); the
    normality companion of A96's Jarque-Bera (moment-based) and
    A137's A-D (which tests intra-day uniformity, not value
    normality).  Statistic only — compare to the Lilliefors table's
    0.886/sqrt(n) family externally.

    Determinism: the standardization collapses to the exact integer
    device z_i = (n*c_i - Sx)/sqrt(n*Sxx - Sx^2) (population sigma,
    pinned definition; 128-bit moments); Phi from the pinned A-S
    tail polynomial micro-quantized per DISTINCT value; both D+ and
    D- branches are exact integer |cum*1e6 - phi*n| numerators
    folded with MAX, divided once (truncating) — fold-order-free.
    Degenerate spread (vnum = 0) drops the type on both engines.

    Scale shape: one (type, value) group collapses the corpus to the
    bounded distinct-value table; one type-keyed prefix window; all
    Phi trees run on distinct values only; readout k rows."""
    from bytesprocessor_spark.queries_r8b import _PHI_TAIL

    v = _t(spark, sf_dir, "events").select(
        "event_type", cents(F.col("value")).alias("c")
    )
    mo = v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("sx"),
        (
            F.count("*").cast("decimal(38,0)")
            * F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
            - F.sum(F.col("c").cast("decimal(38,0)"))
            * F.sum(F.col("c").cast("decimal(38,0)"))
        ).alias("vnum"),
    )
    dv = v.groupBy("event_type", "c").agg(
        F.count("*").cast("long").alias("cnt")
    )
    w_cum = Window.partitionBy("event_type").orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dv.select(
        "event_type", "c", "cnt",
        F.sum("cnt").over(w_cum).cast("long").alias("cum"),
    )
    z_sql = (
        "((CAST(n AS DOUBLE) * CAST(c AS DOUBLE) - CAST(sx AS DOUBLE))"
        " / SQRT(CAST(vnum AS DOUBLE)))"
    )
    tail_sql = _PHI_TAIL.replace("ZG", f"ABS({z_sql})")
    ph = (
        cum.join(mo, "event_type")
        .where(F.col("vnum") > 0)
        .withColumn(
            "phi_micro",
            F.expr(
                f"CASE WHEN {z_sql} >= 0"
                f" THEN 1000000 - CAST(ROUND({tail_sql} * 1000000) AS BIGINT)"
                f" ELSE CAST(ROUND({tail_sql} * 1000000) AS BIGINT) END"
            ),
        )
    )
    d = ph.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max(
            F.greatest(
                F.abs(F.col("cum") * 1000000 - F.col("phi_micro") * F.col("n")),
                F.abs(
                    (F.col("cum") - F.col("cnt")) * 1000000
                    - F.col("phi_micro") * F.col("n")
                ),
            )
        )
        .cast("long")
        .alias("dnum"),
    )
    return d.select(
        "event_type",
        "n",
        F.expr("CAST(dnum div n AS BIGINT)").alias("d_micro"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A162: DFT spectral flatness of the dense daily count series
# ---------------------------------------------------------------------------

_SPECTRAL_FREQS = 8
_PI_LIT = "3.141592653589793"


@query(
    "events_spectral_flatness",
    f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    lim AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
    cal AS (
      SELECT CAST(r AS BIGINT) AS rel
      FROM lim, LATERAL (
        SELECT unnest(generate_series(0, DATE_DIFF('day', d0, d1))) AS r
      )
    ),
    s AS (
      SELECT cal.rel, COALESCE(d.x, 0) AS x
      FROM cal CROSS JOIN lim LEFT JOIN d ON d.day = lim.d0 + CAST(cal.rel AS INT)
    ),
    dims AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM s),
    fr AS (SELECT unnest(generate_series(1, {_SPECTRAL_FREQS})) AS f),
    tr AS (
      SELECT fr.f,
             SUM(s.x * CAST(ROUND(COS(2.0 * {_PI_LIT} * fr.f * s.rel
                                      / CAST(dims.nn AS DOUBLE)) * 1000000)
                            AS HUGEINT)) AS cf,
             SUM(s.x * CAST(ROUND(SIN(2.0 * {_PI_LIT} * fr.f * s.rel
                                      / CAST(dims.nn AS DOUBLE)) * 1000000)
                            AS HUGEINT)) AS sf
      FROM fr CROSS JOIN dims CROSS JOIN s
      GROUP BY 1
    ),
    p AS (
      SELECT f, cf * cf + sf * sf AS pw FROM tr
    ),
    t AS (
      SELECT f, pw,
             CASE WHEN pw > 0
                  THEN CAST(ROUND(LN(CAST(pw AS DOUBLE)) * 1000000) AS BIGINT)
             END AS ln_p_micro
      FROM p
    )
    SELECT CAST(f AS BIGINT) AS f, ln_p_micro,
           CAST(ROUND(CASE WHEN COUNT(*) OVER () = SUM(CASE WHEN pw > 0
                                THEN 1 ELSE 0 END) OVER () THEN
             EXP(CAST(SUM(ln_p_micro) OVER () AS DOUBLE)
                 / ({_SPECTRAL_FREQS}.0 * 1000000.0))
             / (CAST(SUM(pw) OVER () AS DOUBLE) / {_SPECTRAL_FREQS}.0)
           END * 1000000) AS BIGINT) AS flatness_micro
    FROM t ORDER BY f
    """,
)
def events_spectral_flatness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A162 — spectral flatness (Wiener entropy) of the dense daily
    count series at DFT bins f = 1..8: geometric / arithmetic mean of
    the periodogram — flatness near 1 reads white noise, near 0 a
    strongly periodic series; the frequency-domain companion of
    A146's Haar energy (dyadic time-domain) and A23's seasonality
    read (single pinned period) — DFT asks ALL low frequencies at
    once.

    Determinism: per-row cos/sin are micro-quantized BEFORE the
    multiply (the pinned pi literal appears verbatim in both engine
    texts, and the angle tree 2*pi*f*t/N is identical), so c_f/s_f
    are exact integer folds in HUGEINT <-> decimal(38,0) and the
    periodogram P_f = c_f^2 + s_f^2 is exact; per-bin ln is
    micro-quantized before the bounded 8-bin fold; flatness is ONE
    double tree, NULL if any bin is exactly zero-power.

    Scale shape: the 8-frequency grid broadcasts onto one pass of
    the bounded dense calendar (8N quantized-trig rows); readout 8
    rows."""
    d = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("x"))
    )
    lim = d.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = lim.select(
        F.explode(F.sequence(F.lit(0), F.datediff("d1", "d0"))).alias("rel"),
        "d0",
    )
    s = (
        cal.join(
            d.join(F.broadcast(lim.select("d0")), F.lit(True)).select(
                F.datediff("day", "d0").alias("rel"), "x"
            ),
            "rel",
            "left",
        )
        .select(
            F.col("rel").cast("long").alias("rel"),
            F.coalesce("x", F.lit(0)).alias("x"),
        )
    )
    dims = s.agg(F.count("*").cast("long").alias("nn"))
    fr = spark.range(1, _SPECTRAL_FREQS + 1).select(F.col("id").alias("f"))
    ang = f"2.0 * {_PI_LIT} * f * rel / CAST(nn AS DOUBLE)"
    tr = (
        s.crossJoin(F.broadcast(fr))
        .crossJoin(F.broadcast(dims))
        .groupBy("f")
        .agg(
            F.sum(
                F.col("x")
                * F.expr(
                    f"CAST(ROUND(COS({ang}) * 1000000) AS DECIMAL(38,0))"
                )
            ).alias("cf"),
            F.sum(
                F.col("x")
                * F.expr(
                    f"CAST(ROUND(SIN({ang}) * 1000000) AS DECIMAL(38,0))"
                )
            ).alias("sf"),
        )
    )
    p = tr.select(
        "f", (F.col("cf") * F.col("cf") + F.col("sf") * F.col("sf")).alias("pw")
    )
    t = p.select(
        "f",
        "pw",
        F.when(
            F.col("pw") > 0,
            F.round(F.log(F.col("pw").cast("double")) * 1000000).cast("long"),
        ).alias("ln_p_micro"),
    )
    t = bounded_single_group(t)
    w_all = Window.partitionBy("__opid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    kf = float(_SPECTRAL_FREQS)
    flat = F.when(
        F.count("*").over(w_all)
        == F.sum(F.when(F.col("pw") > 0, 1).otherwise(0)).over(w_all),
        F.exp(
            F.sum("ln_p_micro").over(w_all).cast("double") / (kf * 1000000.0)
        )
        / (F.sum("pw").over(w_all).cast("double") / kf),
    )
    return t.select(
        F.col("f").cast("long").alias("f"),
        "ln_p_micro",
        F.round(flat * 1000000).cast("long").alias("flatness_micro"),
    ).orderBy("f")


# ---------------------------------------------------------------------------
# GR17: double-sweep BFS diameter lower bound
# ---------------------------------------------------------------------------

_DIAM_DEPTH = 8


@query(
    "graph_double_sweep",
    f"""
    WITH RECURSIVE eb AS (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e AS (SELECT c AS src, s AS dst FROM eb
          UNION ALL SELECT s AS src, c AS dst FROM eb),
    seed1 AS (SELECT MIN(o_custkey) * 2 AS seed FROM orders),
    w1 AS (
      SELECT seed AS node, 0 AS d FROM seed1
      UNION
      SELECT e.dst AS node, w.d + 1 AS d
      FROM w1 w JOIN e ON e.src = w.node
      WHERE w.d < {_DIAM_DEPTH}
    ),
    m1 AS (SELECT node, MIN(d) AS dist FROM w1 GROUP BY node),
    u AS (SELECT node AS u FROM m1 ORDER BY dist DESC, node LIMIT 1),
    w2 AS (
      SELECT u AS node, 0 AS d FROM u
      UNION
      SELECT e.dst AS node, w.d + 1 AS d
      FROM w2 w JOIN e ON e.src = w.node
      WHERE w.d < {_DIAM_DEPTH}
    ),
    m2 AS (SELECT node, MIN(d) AS dist FROM w2 GROUP BY node)
    SELECT CAST(m2.dist AS BIGINT) AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(m2.node) AS BIGINT) AS node_checksum,
           CAST(MAX(u.u) AS BIGINT) AS sweep2_root,
           CAST((SELECT MAX(dist) FROM m2) AS BIGINT) AS ecc_lb
    FROM m2 CROSS JOIN u
    GROUP BY m2.dist ORDER BY m2.dist
    """,
)
def graph_double_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR17 — double-sweep diameter lower bound on the bipartite
    customer-supplier graph (GR2/GR4 node packing): BFS from the
    min-id customer finds the farthest node u (ties -> min id), a
    second BFS from u reports its full distance histogram and
    eccentricity — the standard 2-BFS diameter estimate (exact on
    trees, a tight lower bound on small-world graphs) that answers
    "how wide is this graph" without the all-pairs pass GR4's reach
    histogram cannot afford either.

    Determinism: hop counts are integers; the u argmax is a pinned
    (dist desc, node asc) total order; depth bounded at
    {_DIAM_DEPTH} on both engines (bipartite trade graphs saturate
    in far fewer sweeps).

    Scale shape: two edge-linear BFS traversals (one frontier join +
    min-aggregate per level, localCheckpoint lineage cuts via
    operators/graph.py:bfs_distances); the u pick is a 1-row
    ORDER-BY-LIMIT; readout <= depth rows."""
    from bytesprocessor_spark.operators.graph import (
        bfs_distances,
        trade_edges_symmetric,
    )

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # r11 optimization: the edge build is the session-memoized
    # trade_pairs_packed at-rest table — each bfs_distances call used
    # to persist its own selection of a fresh edge plan, so the
    # corpus-scale lineitem⋈orders DISTINCT ran TWICE per query (once
    # per sweep) and once more per sibling graph entry (guide §2.4 —
    # remove repeated passes outright)
    edges = trade_edges_symmetric(spark, sf_dir)
    seed1 = o.agg((F.min("o_custkey") * 2).alias("seed"))
    m1 = bfs_distances(edges, seed1, max_depth=_DIAM_DEPTH)
    u = (
        m1.orderBy(F.col("dist").desc(), F.col("node").asc())
        .limit(1)
        .select(F.col("node").alias("seed"))
    )
    m2 = bfs_distances(edges, u, max_depth=_DIAM_DEPTH)
    ecc = m2.agg(F.max("dist").cast("long").alias("ecc_lb"))
    hist = (
        m2.groupBy(F.col("dist").cast("long").alias("dist"))
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum("node").cast("long").alias("node_checksum"),
        )
        .crossJoin(F.broadcast(u.select(F.col("seed").alias("sweep2_root"))))
        .crossJoin(F.broadcast(ecc))
        .select("dist", "n_nodes", "node_checksum", "sweep2_root", "ecc_lb")
        .orderBy("dist")
    )
    return hist


# ---------------------------------------------------------------------------
# S21: XML round-trip source (Spark 4 built-in XML, oracle-certified)
# ---------------------------------------------------------------------------

@query(
    "xml_roundtrip_read",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def xml_roundtrip_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S21 — XML round-trip: events written through Spark 4's
    BUILT-IN XML sink (sources/tables.py:write_xml) and read back
    with an explicit schema (no inference pass); the readout
    aggregates FROM THE XML COPY while the oracle recomputes from
    parquet — the S19/S20 device applied to the last mainstream
    interchange format, upgrading the S6 XML claim from pytest-only
    to oracle-certified.

    Determinism: exact cents / counts only; Java's shortest-round-
    trip double formatting re-parses to identical bits, so cents()
    after the trip equals cents() before it (and the explicit read
    schema removes any inference ambiguity).  DuckDB has no XML
    reader — irrelevant: the oracle checks the AGGREGATE from the
    original table, so any row lost or value mangled by the XML
    writer/reader fails the hash.

    Scale shape: one distributed XML write + one schema-pinned XML
    scan + a k-row hash aggregate; XML is the interchange-export
    surface, not the analytical store."""
    import shutil
    import tempfile

    from bytesprocessor_spark.sources.tables import read_xml, write_xml

    ev = _t(spark, sf_dir, "events").select("event_type", "value", "user_id")
    out = tempfile.mkdtemp(prefix="bp_xml_")
    try:
        write_xml(ev, f"{out}/events_xml", row_tag="event")
        back = read_xml(
            spark,
            f"{out}/events_xml",
            row_tag="event",
            schema="event_type string, value double, user_id bigint",
        )
        res = (
            back.groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(cents(F.col("value"))).cast("long").alias("sum_c"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
            )
            .orderBy("event_type")
        )
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# S20b: Avro schema-resolution (evolution) read
# ---------------------------------------------------------------------------

@query(
    "avro_schema_evolution",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid,
           CAST(COUNT(*) AS BIGINT) AS n_day_null
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def avro_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S20b — Avro schema RESOLUTION: the events copy is written with
    writer schema (event_type, value, user_id) and read back with an
    EVOLVED reader schema — `value` dropped, nullable `day` added
    (reads null), `user_id` promoted long -> double — per the spec's
    Schema Resolution chapter (match by name, default-null for added
    nullable fields, numeric promotion).  The readout aggregates from
    the evolved view; the oracle recomputes from parquet with day
    identically null, so equality proves drop/add/promote each
    preserve row identity and values exactly.

    Determinism: user_id values are far below 2^53, so the
    long -> double promotion is exact and SUM over the promoted
    doubles casts back to the exact integer sum; n_day_null == n
    proves the added column reads null on every row.

    Scale shape: identical to S20 (one distributed write + one
    per-file-task resolved read + a k-row aggregate)."""
    from pyspark.sql import types as T

    from bytesprocessor_spark.sources.avro import read_avro, write_avro

    ev = (
        _t(spark, sf_dir, "events")
        .select("event_type", "value", "user_id")
        .repartition(8)
    )
    out = tempfile.mkdtemp(prefix="bp_avro_evo_")
    try:
        write_avro(ev, f"{out}/events_avro").collect()
        evolved = T.StructType(
            [
                T.StructField("event_type", T.StringType(), True),
                T.StructField("user_id", T.DoubleType(), True),
                T.StructField("day", T.StringType(), True),
            ]
        )
        back = read_avro(spark, f"{out}/events_avro", evolved, resolve=True)
        res = (
            back.groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("user_id").cast("long").alias("sum_uid"),
                F.sum(F.when(F.col("day").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_day_null"),
            )
            .orderBy("event_type")
        )
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# S22/S23: JSONL and CSV round-trips (sink certification)
# ---------------------------------------------------------------------------

_RT_AGG_SQL = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """


def _roundtrip_agg(back: DataFrame, spark: SparkSession) -> DataFrame:
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


@query("jsonl_roundtrip_read", _RT_AGG_SQL)
def jsonl_roundtrip_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S22 — JSON-lines round-trip: events through Spark's JSON sink
    and back with an explicit schema, aggregate FROM THE JSON COPY vs
    the parquet oracle — certifies the JSON WRITER (S6's tolerant
    scan certifies only the read path); Java shortest-round-trip
    double formatting re-parses bit-exactly, so exact cents survive.

    Scale shape: one distributed write + schema-pinned scan + k-row
    aggregate (the S19/S20/S21 device)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "user_id")
    out = tempfile.mkdtemp(prefix="bp_jsonl_")
    try:
        ev.write.mode("overwrite").json(f"{out}/events_jsonl")
        back = spark.read.schema(
            "event_type string, value double, user_id bigint"
        ).json(f"{out}/events_jsonl")
        return _roundtrip_agg(back, spark)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query("csv_roundtrip_read", _RT_AGG_SQL)
def csv_roundtrip_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S23 — CSV round-trip: events through Spark's CSV sink (header,
    default quoting) and back with an explicit schema — certifies the
    CSV WRITER next to S6's tolerant read; completes sink
    certification for every text interchange format (JSONL S22, XML
    S21, CSV here) on the same aggregate-equality device."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "user_id")
    out = tempfile.mkdtemp(prefix="bp_csvrt_")
    try:
        ev.write.mode("overwrite").option("header", True).csv(
            f"{out}/events_csv"
        )
        back = (
            spark.read.option("header", True)
            .schema("event_type string, value double, user_id bigint")
            .csv(f"{out}/events_csv")
        )
        return _roundtrip_agg(back, spark)
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# A163: seasonal Mann-Kendall (Hirsch-Slack) by weekday season
# ---------------------------------------------------------------------------

@query(
    "events_seasonal_mann_kendall",
    """
    WITH d AS (
      SELECT event_type,
             DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS wd,
             DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2, 3
    ),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.wd = b.wd AND a.day < b.day
      GROUP BY 1
    ),
    vn AS (
      SELECT event_type,
             CAST(SUM(nw * (nw - 1) * (2 * nw + 5)) AS BIGINT) AS var18_n,
             CAST(SUM(nw) AS BIGINT) AS n_days
      FROM (SELECT event_type, wd, CAST(COUNT(*) AS BIGINT) AS nw
            FROM d GROUP BY 1, 2) g
      GROUP BY 1
    ),
    t AS (
      SELECT event_type,
             CAST(COALESCE(SUM(tt * (tt - 1) * (2 * tt + 5)), 0) AS BIGINT)
               AS tie18
      FROM (SELECT event_type, wd, x, CAST(COUNT(*) AS BIGINT) AS tt
            FROM d GROUP BY 1, 2, 3) g
      WHERE tt > 1 GROUP BY 1
    )
    SELECT vn.event_type, vn.n_days, s.s AS s_stat,
           vn.var18_n - COALESCE(t.tie18, 0) AS var18,
           CASE WHEN vn.var18_n - COALESCE(t.tie18, 0) > 0
                THEN CAST(ROUND(
                  (CASE WHEN s.s > 0 THEN CAST(s.s - 1 AS DOUBLE)
                        WHEN s.s < 0 THEN CAST(s.s + 1 AS DOUBLE)
                        ELSE 0.0 END)
                  / SQRT(CAST(vn.var18_n - COALESCE(t.tie18, 0) AS DOUBLE)
                         / 18.0) * 1000) AS BIGINT)
           END AS z_milli
    FROM vn JOIN s USING (event_type) LEFT JOIN t USING (event_type)
    ORDER BY vn.event_type
    """,
)
def events_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A163 — seasonal Mann-Kendall (Hirsch-Slack): A128's S and
    tie-corrected variance computed WITHIN each weekday season
    (epoch-day mod 7, the hazard-free key) and summed — the trend
    test that a weekly cycle cannot fake: A128 compares Mondays to
    Saturdays and reads seasonality as trend; this compares Mondays
    only to later Mondays.

    Determinism: identical exact machinery as A128 (integer S over
    season-keyed pair joins, int64 18*Var terms, one milli-quantized
    continuity-corrected tree; all-tied degenerate NULL on both).

    Scale shape: the pair join is (type, weekday)-keyed over
    calendar-bounded day tables — 7x fewer pairs than A128's;
    readout k rows."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        (
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            % 7
        ).alias("wd"),
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day"),
    ).agg(F.count("*").cast("long").alias("x"))
    a = d.select(
        "event_type", "wd", F.col("day").alias("da"), F.col("x").alias("xa")
    )
    b = d.select(
        "event_type", "wd", F.col("day").alias("db"), F.col("x").alias("xb")
    )
    s = (
        a.join(b, ["event_type", "wd"])
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
    nw = d.groupBy("event_type", "wd").agg(F.count("*").cast("long").alias("nw"))
    vn = nw.groupBy("event_type").agg(
        F.sum(F.col("nw") * (F.col("nw") - 1) * (2 * F.col("nw") + 5))
        .cast("long")
        .alias("var18_n"),
        F.sum("nw").cast("long").alias("n_days"),
    )
    tg = (
        d.groupBy("event_type", "wd", "x")
        .agg(F.count("*").cast("long").alias("tt"))
        .where(F.col("tt") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(F.col("tt") * (F.col("tt") - 1) * (2 * F.col("tt") + 5)),
                F.lit(0),
            )
            .cast("long")
            .alias("tie18")
        )
    )
    j = vn.join(s, "event_type").join(tg, "event_type", "left")
    var18 = F.col("var18_n") - F.coalesce(F.col("tie18"), F.lit(0))
    zc = (
        F.when(F.col("s") > 0, (F.col("s") - 1).cast("double"))
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double"))
        .otherwise(F.lit(0.0))
    )
    z = F.when(var18 > 0, zc / F.sqrt(var18.cast("double") / 18.0))
    return j.select(
        "event_type",
        "n_days",
        F.col("s").alias("s_stat"),
        var18.cast("long").alias("var18"),
        F.round(z * 1000).cast("long").alias("z_milli"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A164: paired sign test (weekend vs weekday rate per ISO-free week)
# ---------------------------------------------------------------------------

@query(
    "events_sign_test",
    """
    WITH d AS (
      SELECT event_type,
             DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    wk AS (
      SELECT event_type, day // 7 AS week,
             CASE WHEN (day + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END AS we,
             x
      FROM d
    ),
    cell AS (
      SELECT event_type, week,
             CAST(SUM(CASE WHEN we = 1 THEN x ELSE 0 END) AS BIGINT) AS sum_we,
             CAST(SUM(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d_we,
             CAST(SUM(CASE WHEN we = 0 THEN x ELSE 0 END) AS BIGINT) AS sum_wd,
             CAST(SUM(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_wd
      FROM wk GROUP BY 1, 2
    ),
    sgn AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN sum_we * d_wd > sum_wd * d_we
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN sum_we * d_wd < sum_wd * d_we
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      FROM cell WHERE d_we > 0 AND d_wd > 0
      GROUP BY 1
    )
    SELECT event_type, n_pos, n_neg,
           CASE WHEN n_pos + n_neg > 0 THEN CAST(ROUND(
             (CASE WHEN n_pos > n_neg THEN CAST(n_pos - n_neg - 1 AS DOUBLE)
                   WHEN n_pos < n_neg THEN CAST(n_pos - n_neg + 1 AS DOUBLE)
                   ELSE 0.0 END)
             / SQRT(CAST(n_pos + n_neg AS DOUBLE)) * 1000) AS BIGINT)
           END AS z_milli
    FROM sgn ORDER BY event_type
    """,
)
def events_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A164 — paired sign test: each epoch-week is a matched pair
    (weekend daily rate vs weekday daily rate per type); the test
    counts only the DIRECTION of each week's difference — the
    assumption-free floor under A140's effect sizes and EV25's
    signed-rank (which need at least symmetric magnitudes), robust
    to anything the week throws at the rates.

    Determinism: the rate comparison cross-multiplies exact counts
    (sum_we * d_wd vs sum_wd * d_we — day-count denominators never
    become doubles); weekend membership is pure epoch-day integer
    arithmetic ((day+4) mod 7 in {0,6}, identical both engines;
    day // 7 == div is the pinned non-negative week key); exact
    ties drop (classical convention); z is the continuity-corrected
    normal tree, milli-quantized, NULL when every week ties.

    Scale shape: one (type, day) aggregate, one (type, week)
    re-aggregate, a k-row readout."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day"),
    ).agg(F.count("*").cast("long").alias("x"))
    wk = d.select(
        "event_type",
        F.expr("day div 7").alias("week"),
        F.when(((F.col("day") + 4) % 7).isin(0, 6), 1).otherwise(0).alias("we"),
        "x",
    )
    cell = wk.groupBy("event_type", "week").agg(
        F.sum(F.when(F.col("we") == 1, F.col("x")).otherwise(0))
        .cast("long")
        .alias("sum_we"),
        F.sum(F.when(F.col("we") == 1, 1).otherwise(0))
        .cast("long")
        .alias("d_we"),
        F.sum(F.when(F.col("we") == 0, F.col("x")).otherwise(0))
        .cast("long")
        .alias("sum_wd"),
        F.sum(F.when(F.col("we") == 0, 1).otherwise(0))
        .cast("long")
        .alias("d_wd"),
    )
    sgn = (
        cell.where((F.col("d_we") > 0) & (F.col("d_wd") > 0))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.col("sum_we") * F.col("d_wd")
                    > F.col("sum_wd") * F.col("d_we"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_pos"),
            F.sum(
                F.when(
                    F.col("sum_we") * F.col("d_wd")
                    < F.col("sum_wd") * F.col("d_we"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_neg"),
        )
    )
    nn = F.col("n_pos") + F.col("n_neg")
    zc = (
        F.when(
            F.col("n_pos") > F.col("n_neg"),
            (F.col("n_pos") - F.col("n_neg") - 1).cast("double"),
        )
        .when(
            F.col("n_pos") < F.col("n_neg"),
            (F.col("n_pos") - F.col("n_neg") + 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    z = F.when(nn > 0, zc / F.sqrt(nn.cast("double")))
    return sgn.select(
        "event_type",
        "n_pos",
        "n_neg",
        F.round(z * 1000).cast("long").alias("z_milli"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# EV45: weighted Cohen's kappa (linear + quadratic ordinal weights)
# ---------------------------------------------------------------------------

@query(
    "eval_weighted_kappa",
    """
    WITH lab AS (
      SELECT event_type AS r1,
             CASE WHEN event_id % 5 = 0 THEN
               CASE event_type
                 WHEN 'click' THEN 'error' WHEN 'error' THEN 'purchase'
                 WHEN 'purchase' THEN 'signup' WHEN 'signup' THEN 'view'
                 ELSE 'click' END
             ELSE event_type END AS r2
      FROM lab_src
    ),
    classes AS (
      SELECT r1 AS label,
             CAST(ROW_NUMBER() OVER (ORDER BY r1) - 1 AS BIGINT) AS idx
      FROM (SELECT DISTINCT r1 FROM lab)
    ),
    o AS (
      SELECT ca.idx AS i, cb.idx AS j, CAST(COUNT(*) AS BIGINT) AS o_ij
      FROM lab JOIN classes ca ON lab.r1 = ca.label
               JOIN classes cb ON lab.r2 = cb.label
      GROUP BY 1, 2
    ),
    row_m AS (SELECT i, CAST(SUM(o_ij) AS BIGINT) AS row_i FROM o GROUP BY 1),
    col_m AS (SELECT j, CAST(SUM(o_ij) AS BIGINT) AS col_j FROM o GROUP BY 1),
    num AS (
      SELECT CAST(SUM(ABS(i - j) * o_ij) AS BIGINT) AS lin_o,
             CAST(SUM((i - j) * (i - j) * o_ij) AS BIGINT) AS quad_o,
             CAST(SUM(o_ij) AS BIGINT) AS n
      FROM o
    ),
    den AS (
      SELECT CAST(SUM(ABS(r.i - c.j) * r.row_i * c.col_j) AS BIGINT) AS lin_e,
             SUM(CAST((r.i - c.j) * (r.i - c.j) AS HUGEINT)
                 * r.row_i * c.col_j) AS quad_e
      FROM row_m r CROSS JOIN col_m c
    )
    SELECT num.n, num.lin_o, num.quad_o,
           CAST(CASE WHEN den.lin_e > 0
             THEN 1000000 - CAST(num.lin_o AS HUGEINT) * num.n * 1000000
                            // den.lin_e
           END AS BIGINT) AS kappa_linear_micro,
           CAST(CASE WHEN den.quad_e > 0
             THEN 1000000 - CAST(num.quad_o AS HUGEINT) * num.n * 1000000
                            // den.quad_e
           END AS BIGINT) AS kappa_quadratic_micro
    FROM num CROSS JOIN den
    """.replace("lab_src", "events"),
)
def eval_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV45 — weighted Cohen's kappa on the EV23 annotator fixture:
    ordinal disagreement weights (linear |i-j| and quadratic (i-j)^2
    over the alphabetical class indexing, pinned) price NEAR misses
    below FAR misses — the ordinal-label agreement gate (EV23's
    unweighted kappa charges 'click vs error' and 'click vs view'
    identically; quadratic weighted kappa is the ICC-equivalent
    reliability number ordinal-rating pipelines quote).

    Determinism: kappa_w = 1 - (sum w*O * N) / (sum w*E*N... the E
    N-denominator cancels) collapses to a PURE integer rational —
    1 - (sum w_ij O_ij * N * 1e6) // (sum w_ij row_i col_j) — exact
    128-bit cross-multiply, no doubles anywhere; degenerate
    all-one-class marginals NULL identically.

    Scale shape: one confusion aggregate (k^2 cells), marginals and
    the weighted sums on k-row tables; readout 1 row."""
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
        F.when(F.col("event_id") % 5 == 0, nxt)
        .otherwise(F.col("event_type"))
        .alias("r2"),
    )
    from bytesprocessor_spark.operators.ranking import (
        bounded_single_group as _bsg,
    )

    classes = _bsg(lab.select(F.col("r1").alias("label")).distinct())
    w_cls = Window.partitionBy("__opid").orderBy("label")
    classes = classes.select(
        "label", (F.row_number().over(w_cls) - 1).cast("long").alias("idx")
    )
    o = (
        lab.join(
            F.broadcast(classes.select(F.col("label").alias("r1"),
                                       F.col("idx").alias("i"))),
            "r1",
        )
        .join(
            F.broadcast(classes.select(F.col("label").alias("r2"),
                                       F.col("idx").alias("j"))),
            "r2",
        )
        .groupBy("i", "j")
        .agg(F.count("*").cast("long").alias("o_ij"))
    )
    row_m = o.groupBy("i").agg(F.sum("o_ij").cast("long").alias("row_i"))
    col_m = o.groupBy("j").agg(F.sum("o_ij").cast("long").alias("col_j"))
    num = o.agg(
        F.sum(F.abs(F.col("i") - F.col("j")) * F.col("o_ij"))
        .cast("long")
        .alias("lin_o"),
        F.sum((F.col("i") - F.col("j")) * (F.col("i") - F.col("j")) * F.col("o_ij"))
        .cast("long")
        .alias("quad_o"),
        F.sum("o_ij").cast("long").alias("n"),
    )
    den = row_m.crossJoin(col_m).agg(
        F.sum(F.abs(F.col("i") - F.col("j")) * F.col("row_i") * F.col("col_j"))
        .cast("decimal(38,0)")
        .alias("lin_e"),
        F.sum(
            ((F.col("i") - F.col("j")) * (F.col("i") - F.col("j")))
            .cast("decimal(38,0)")
            * F.col("row_i")
            * F.col("col_j")
        ).alias("quad_e"),
    )
    j = num.crossJoin(F.broadcast(den))
    return j.select(
        "n",
        "lin_o",
        "quad_o",
        F.when(
            F.col("lin_e") > 0,
            F.lit(1000000)
            - F.expr(
                "CAST(CAST(lin_o AS DECIMAL(38,0)) * n * 1000000"
                " div lin_e AS BIGINT)"
            ),
        )
        .cast("long")
        .alias("kappa_linear_micro"),
        F.when(
            F.col("quad_e") > 0,
            F.lit(1000000)
            - F.expr(
                "CAST(CAST(quad_o AS DECIMAL(38,0)) * n * 1000000"
                " div quad_e AS BIGINT)"
            ),
        )
        .cast("long")
        .alias("kappa_quadratic_micro"),
    )


# ---------------------------------------------------------------------------
# GR18: harmonic centrality of the BFS seed set
# ---------------------------------------------------------------------------

@query(
    "graph_harmonic_centrality",
    """
    WITH RECURSIVE eb AS (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e AS (SELECT c AS src, s AS dst FROM eb
          UNION ALL SELECT s AS src, c AS dst FROM eb),
    seeds AS (SELECT DISTINCT o_custkey * 2 AS seed FROM orders
              WHERE o_custkey <= 4),
    walk AS (
      SELECT seed, seed AS node, 0 AS d FROM seeds
      UNION
      SELECT w.seed, e.dst AS node, w.d + 1 AS d
      FROM walk w JOIN e ON e.src = w.node
      WHERE w.d < 3
    ),
    m AS (SELECT seed, node, MIN(d) AS dist FROM walk GROUP BY seed, node)
    SELECT CAST(seed // 2 AS BIGINT) AS seed_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_micro
    FROM m WHERE dist > 0
    GROUP BY 1 ORDER BY 1
    """,
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR18 — harmonic centrality H(s) = sum over reached nodes of
    1/d(s,v) for the GR4 seed customers (depth-3 bound): the
    closeness variant that stays defined on disconnected graphs
    (unreached nodes contribute 0, not infinity) — the "how central
    is this account in the trade web" single-number read on top of
    GR4's per-distance histogram.

    Determinism: per-node 1/d quantized as the exact truncating
    integer 1e6 // d BEFORE the sum (Spark div == DuckDB //), so H
    is an exact integer on both engines; same recursive-CTE closure
    oracle as GR4.

    Scale shape: reuses bfs_distances (k seeds ride one traversal);
    one seed-keyed aggregate; readout k rows."""
    from bytesprocessor_spark.operators.graph import (
        bfs_distances,
        trade_edges_symmetric,
    )

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # r11: edge build shared via the session-memoized trade_pairs_packed
    edges = trade_edges_symmetric(spark, sf_dir)
    seeds = (
        o.where(F.col("o_custkey") <= 4)
        .select((F.col("o_custkey") * 2).alias("seed"))
        .distinct()
    )
    dist = bfs_distances(edges, seeds, max_depth=3)
    return (
        dist.where(F.col("dist") > 0)
        .groupBy(F.expr("seed div 2").alias("seed_custkey"))
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            F.sum(F.expr("1000000 div dist")).cast("long").alias(
                "harmonic_micro"
            ),
        )
        .orderBy("seed_custkey")
    )
