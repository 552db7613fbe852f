"""Round-5 scale-pattern batch (SURVEY §2 J/A/L widening).

Operators whose point is the 100 TB *plan shape* as much as the
answer:

  * join_bloom_prune — Bloom-filter semi-join pruning: the dim side
    compresses to a KB-scale position set that broadcasts onto the
    fact scan, so non-matching fact rows die BEFORE any shuffle — the
    manual form of the runtime filters AQE injects, exposed as an
    operator with its false-positive accounting.
  * events_stl_decompose — additive seasonal decomposition of the
    daily event series: centered 7-day moving-average trend, per-
    weekday lower-median seasonal, residual (the classical
    decomposition underlying STL, Cleveland et al. JOS'90).
  * text_oov_rate — tokenizer vocabulary coverage: out-of-vocabulary
    token rate per source against the corpus top-512 vocabulary (the
    pre-training readout that decides whether a tokenizer fits a new
    data source).
  * corpus_curriculum — curriculum ordering plan: difficulty-staged
    (quartile ntile over avg token length) with deterministic md5
    shuffling inside each stage — the sampler manifest for
    easy-to-hard curriculum training.

All rows follow the corpus determinism contract (queries.py module
docstring): exact integer arithmetic end-to-end (floor-division ppm /
micro units, lower medians of integer lists), ROW_NUMBER with unique
tiebreaks, no float reductions anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bytesprocessor_spark.functions.text import token_count, tokenize
from bytesprocessor_spark.queries import _t, query
from bytesprocessor_spark.queries_llm import _DUCK_TOKS

# Bloom geometry: m = 65536 positions, k = 3 independent affine hashes.
# The multipliers/offsets are primes small enough that key*A + B stays
# far inside int64 for any realistic key (key < 2^45), so the modular
# arithmetic is exact and identical on both engines.
_BLOOM_M = 65536
_BLOOM_HASHES = [(40503, 7919), (40507, 104729), (40519, 1299709)]

_VOCAB_SIZE = 512
_CURR_STAGES = 4


# ---------------------------------------------------------------------------
# J11: Bloom-filter pruned semi join (manual runtime filter)
# ---------------------------------------------------------------------------

def _bloom_pos_sql(key: str) -> list[str]:
    return [f"({key} * {a} + {b}) % {_BLOOM_M}" for a, b in _BLOOM_HASHES]


def _bloom_pos_col(key: str) -> list[F.Column]:
    return [
        (F.col(key) * F.lit(a) + F.lit(b)) % F.lit(_BLOOM_M)
        for a, b in _BLOOM_HASHES
    ]


@query(
    "join_bloom_prune",
    f"""
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    pos AS (
      SELECT DISTINCT p
      FROM dim, UNNEST([{", ".join(_bloom_pos_sql("c_custkey"))}]) AS t(p)
    ),
    bloom AS (SELECT list(p ORDER BY p) AS bl FROM pos),
    probe AS (
      SELECT o_orderpriority,
             ({" AND ".join(f"list_contains(bl, {e})" for e in _bloom_pos_sql("o_custkey"))}) AS pass,
             o_custkey IN (SELECT c_custkey FROM dim) AS hit
      FROM orders CROSS JOIN bloom
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
           CAST(SUM(CASE WHEN pass AND NOT hit THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM probe
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 Bloom-pruned semi join: build an m=65536 / k=3 Bloom filter
    over the dim keys (represented as the sorted distinct position set
    — the sparse form of the bit array, <=512 KB at full occupancy),
    broadcast it onto the fact scan, and count survivors vs true
    matches per priority class.  This is the manual form of the
    runtime bloom filters AQE injects for shuffle joins
    (spark.sql.optimizer.runtime.bloomFilter.enabled): at 100 TB the
    fact side drops non-matching rows at the SCAN, before the join
    shuffle, so shuffle volume tracks the match rate instead of the
    table size.  The n_false_pos column is the operating readout —
    Bloom filters never produce false negatives, so n_match <=
    n_bloom_pass always, and the gap is the wasted shuffle the chosen
    (m, k) geometry would still carry.

    Determinism: affine integer hashes mod 65536, set membership, and
    integer counts — no floats anywhere.

    Plan shape: one dim-side aggregate to a single KB-scale array row;
    the probe is a broadcast nested loop of that 1-row frame onto the
    fact scan (map-only); the true-match flag is a broadcast hash
    join.  The fact table is never shuffled; the final aggregate is
    5 rows."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    dim = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bloom = (
        dim.select(F.explode(F.array(*_bloom_pos_col("c_custkey"))).alias("p"))
        .distinct()
        .agg(F.array_sort(F.collect_list("p")).alias("bl"))
    )
    hit_dim = dim.select(F.col("c_custkey").alias("hk"), F.lit(1).alias("hit"))
    contains = [
        F.array_contains(F.col("bl"), pos) for pos in _bloom_pos_col("o_custkey")
    ]
    probe = (
        orders.crossJoin(F.broadcast(bloom))
        .join(F.broadcast(hit_dim), F.col("o_custkey") == F.col("hk"), "left")
        .select(
            "o_orderpriority",
            (contains[0] & contains[1] & contains[2]).alias("pass"),
            F.col("hit").isNotNull().alias("hit"),
        )
    )
    return (
        probe.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("pass"), 1).otherwise(0))
            .cast("long")
            .alias("n_bloom_pass"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0))
            .cast("long")
            .alias("n_match"),
            F.sum(F.when(F.col("pass") & ~F.col("hit"), 1).otherwise(0))
            .cast("long")
            .alias("n_false_pos"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# A31: additive seasonal decomposition of the daily series
# ---------------------------------------------------------------------------

@query(
    "events_stl_decompose",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT day, n,
             (day - DATE '1970-01-01') % 7 AS dow,
             CAST(SUM(n * 1000000) OVER w // COUNT(*) OVER w AS BIGINT) AS trend_micro
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT day, n, dow, trend_micro,
             n * 1000000 - trend_micro AS det_micro
      FROM tr
    ),
    seas AS (
      SELECT dow,
             list_sort(list(det_micro))[(COUNT(*) + 1) // 2] AS seasonal_micro
      FROM det GROUP BY dow
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n,
           trend_micro,
           seasonal_micro,
           det_micro - seasonal_micro AS resid_micro
    FROM det JOIN seas USING (dow)
    ORDER BY day
    """,
)
def events_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A31 additive seasonal decomposition (the classical moving-
    average decomposition underlying STL, Cleveland et al. JOS'90):
    daily event counts split into trend (centered 7-day moving
    average), weekly seasonal (per-weekday lower median of the
    detrended series — median, not mean, so single anomalous days
    don't print onto the seasonal profile), and residual.  The
    residual column is what downstream anomaly fences (A19) should
    monitor once a series has real weekly structure.

    Determinism: trend is exact integer floor-division micro-units
    over an integer window sum; the seasonal is the lower median of an
    integer list; dow is epoch-day mod 7 (engine-neutral, unlike
    dayofweek() whose origin differs between Spark and DuckDB).

    Plan shape: one map-side-combined aggregate collapses the event
    scan to one row per day; everything after (window, per-dow
    median, join) is O(days) driver-scale work — the single-partition
    window warning is on a frame bounded by the calendar, not the
    data."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "n",
        (F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7).alias("dow"),
        F.expr(
            "sum(n * 1000000) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)"
            " div count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)"
        ).alias("trend_micro"),
    )
    det = tr.withColumn("det_micro", F.col("n") * 1000000 - F.col("trend_micro"))
    seas = det.groupBy("dow").agg(
        F.element_at(
            F.array_sort(F.collect_list("det_micro")),
            ((F.count("*") + 1) / 2).cast("int"),
        ).alias("seasonal_micro")
    )
    return (
        det.join(F.broadcast(seas), "dow")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            "trend_micro",
            "seasonal_micro",
            (F.col("det_micro") - F.col("seasonal_micro")).alias("resid_micro"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# L4p: tokenizer vocabulary coverage (OOV rate per source)
# ---------------------------------------------------------------------------

@query(
    "text_oov_rate",
    f"""
    WITH t AS (
      SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS c FROM t GROUP BY tok
        ORDER BY c DESC, tok LIMIT {_VOCAB_SIZE}
      )
    ),
    m AS (
      SELECT t.source, t.tok,
             (vocab.tok IS NOT NULL) AS in_vocab
      FROM t LEFT JOIN vocab ON t.tok = vocab.tok
    )
    SELECT source,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) * 1000000 // COUNT(*)
                AS BIGINT) AS oov_ppm,
           CAST(COUNT(DISTINCT CASE WHEN NOT in_vocab THEN tok END) AS BIGINT)
             AS n_oov_types
    FROM m GROUP BY source ORDER BY source
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4p tokenizer vocabulary coverage: the out-of-vocabulary token
    rate of each source against the corpus top-{_VOCAB_SIZE}
    vocabulary — the readout that decides whether an existing
    tokenizer/vocab fits a new data source or needs retraining (a
    source with a high OOV ppm fragments into byte-fallback pieces and
    trains poorly).  n_oov_types separates "one weird token repeated"
    from "systematically different vocabulary".

    Determinism: token counts and floor-division ppm — all integers.

    Plan shape: one token-explode feeding two aggregates; the vocab is
    a fixed {_VOCAB_SIZE}-row table that BROADCASTS back onto the
    token stream (the membership join never shuffles the corpus), and
    the final aggregate is one row per source."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
    vocab = (
        t.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(_VOCAB_SIZE)
        .select(F.col("tok").alias("vtok"), F.lit(1).alias("in_v"))
    )
    m = t.join(F.broadcast(vocab), t.tok == F.col("vtok"), "left")
    return (
        m.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_v").isNotNull(), 0).otherwise(1))
            .cast("long")
            .alias("n_oov"),
            F.expr(
                "CAST(sum(CASE WHEN in_v IS NOT NULL THEN 0 ELSE 1 END) * 1000000"
                " div count(*) AS BIGINT)"
            ).alias("oov_ppm"),
            F.countDistinct(
                F.when(F.col("in_v").isNull(), F.col("tok"))
            ).cast("long").alias("n_oov_types"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# L16: curriculum ordering plan (difficulty stages, shuffled within)
# ---------------------------------------------------------------------------

@query(
    "corpus_curriculum",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             n_chars * 1000000 // GREATEST(len({_DUCK_TOKS}), 1) AS difficulty_micro
      FROM documents
    ),
    staged AS (
      SELECT doc_id, source, difficulty_micro,
             NTILE({_CURR_STAGES}) OVER (ORDER BY difficulty_micro, doc_id) AS stage
      FROM d
    )
    SELECT stage,
           ROW_NUMBER() OVER (PARTITION BY stage
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos,
           doc_id, source, difficulty_micro
    FROM staged
    ORDER BY stage, pos
    """,
)
def corpus_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L16 curriculum ordering plan: assign every document a
    difficulty proxy (average token length in micro-chars — longer
    tokens track rarer vocabulary), cut the corpus into
    {_CURR_STAGES} difficulty stages (ntile), and emit a deterministic
    within-stage shuffle order (md5 of the doc id) — the sampler
    manifest an easy-to-hard curriculum trainer consumes (Bengio et
    al. ICML'09).  The md5 shuffle keeps each stage i.i.d.-looking
    while the stage sequence carries the curriculum; re-running on the
    same corpus reproduces the same plan bit-for-bit.

    Determinism: integer floor-division difficulty, ntile over a
    unique (difficulty, doc_id) order, row_number over a unique
    (md5, doc_id) order.

    Plan shape: difficulty is a map expression on the scan; the two
    windows are the unavoidable global sort of a total-order plan —
    at 100 TB the same plan runs as a range-partitioned sort
    (ntile/row_number parallelize per range partition), and the output
    would be written sharded, not collected."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", "n_chars", token_count(F.col("text")).alias("n_toks")
    ).select(
        "doc_id",
        "source",
        F.expr("n_chars * 1000000 div GREATEST(n_toks, 1)").alias(
            "difficulty_micro"
        ),
    )
    staged = d.select(
        "doc_id",
        "source",
        "difficulty_micro",
        F.ntile(_CURR_STAGES)
        .over(Window.orderBy("difficulty_micro", "doc_id"))
        .alias("stage"),
    )
    return staged.select(
        "stage",
        F.row_number()
        .over(
            Window.partitionBy("stage").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("pos"),
        "doc_id",
        "source",
        "difficulty_micro",
    ).orderBy("stage", "pos")


# ---------------------------------------------------------------------------
# W14: exact rolling 7-day distinct users (the hard-at-scale rollup)
# ---------------------------------------------------------------------------

@query(
    "events_rolling_distinct",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    ex AS (
      SELECT user_id, day + CAST(i AS INTEGER) AS tday
      FROM ud, UNNEST(range(0, 7)) AS t(i)
    ),
    roll AS (
      SELECT tday AS day, COUNT(DISTINCT user_id) AS wau_7d
      FROM ex JOIN days ON ex.tday = days.day
      GROUP BY tday
    ),
    dau AS (
      SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
    )
    SELECT strftime(dau.day, '%Y-%m-%d') AS day,
           CAST(dau AS BIGINT) AS dau,
           CAST(wau_7d AS BIGINT) AS wau_7d,
           CAST(dau * 1000000 // wau_7d AS BIGINT) AS stickiness_ppm
    FROM dau JOIN roll ON dau.day = roll.day
    ORDER BY day
    """,
)
def events_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W14 exact rolling 7-day distinct users per day — the windowed
    COUNT(DISTINCT) that naive SQL cannot express as a window function
    (DISTINCT is not frame-decomposable) and that HLL rows (A11) only
    approximate.  The exact scale shape is expand-then-count: each
    (user, active-day) pair — already deduplicated, so the corpus
    touches this stage once — fans out to the <=7 window endpoints it
    contributes to, and a single (day) aggregate counts distinct
    users.  DAU/WAU stickiness ppm rides along since both sides are
    on hand.

    Determinism: pure integer counts and floor-division ppm.

    Plan shape: one (user, day) distinct shuffle bounded by active
    pairs, a constant x7 fan-out (map-only), one (day) count-distinct
    shuffle.  At 100 TB the fan-out factor is the window length, not
    the data — this beats the self-join form (which shuffles the pair
    table once PER window day) and needs no sketch error budget."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    ex = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
    ).select("user_id", F.expr("date_add(day, i)").alias("tday"))
    roll = (
        ex.join(days.withColumnRenamed("day", "tday"), "tday")
        .groupBy("tday")
        .agg(F.countDistinct("user_id").alias("wau_7d"))
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    return (
        dau.join(roll, dau.day == roll.tday)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau_7d").cast("long").alias("wau_7d"),
            F.expr("CAST(dau * 1000000 div wau_7d AS BIGINT)").alias(
                "stickiness_ppm"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# ST12 (batch twin): event-time lateness audit (watermark design input)
# ---------------------------------------------------------------------------

@query(
    "events_lateness_histogram",
    """
    WITH arr AS (
      SELECT user_id, ts,
             event_id + CAST('0x' || substr(md5('arr:' || event_id), 1, 15) AS BIGINT)
               % 50 AS arrival_seq,
             event_id
      FROM events
    ),
    l AS (
      SELECT user_id,
             CAST(date_diff('second', ts,
                    MAX(ts) OVER (PARTITION BY user_id ORDER BY arrival_seq, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                  AS BIGINT) AS late_s
      FROM arr
    ),
    b AS (
      SELECT CASE WHEN late_s = 0 THEN 'a_in_order'
                  WHEN late_s <= 60 THEN 'b_1min'
                  WHEN late_s <= 300 THEN 'c_5min'
                  WHEN late_s <= 3600 THEN 'd_1hour'
                  ELSE 'e_over_1hour' END AS bucket,
             late_s
      FROM l
    )
    SELECT bucket,
           COUNT(*) AS n_events,
           CAST(MAX(late_s) AS BIGINT) AS max_late_s,
           CAST(COUNT(*) * 1000000 // (SELECT COUNT(*) FROM b) AS BIGINT) AS share_ppm
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def events_lateness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST12 batch twin: the event-time lateness distribution that
    DECIDES a streaming job's watermark delay.  Replaying the event
    log in arrival order per user (the fixture log is perfectly
    time-ordered, so arrival is simulated as log order plus a
    deterministic md5 jitter of up to 50 positions — in production,
    feed the broker's real arrival sequence), lateness = running-max
    event time minus this event's time — the exact amount a watermark
    must lag to admit the event instead of dropping it.  The bucketed
    histogram (in-order / 1min / 5min / 1h / worse) is read directly
    against withWatermark(): pick the bucket boundary that keeps the
    loss share acceptable.  The streaming rows (ST1-ST11) consume the
    chosen delay; this is where the number comes from.

    Determinism: integer second differences, integer counts,
    floor-division ppm.

    Plan shape: one shuffle on user_id for the running max (the
    arrival log is per-key ordered state, same partitioning a real
    stream would carry), then a 5-row aggregate with a 1-row total
    broadcast."""
    ev = _t(spark, sf_dir, "events")
    from bytesprocessor_spark.queries_curation import _h60

    arr = ev.select(
        "user_id",
        "ts",
        "event_id",
        (
            F.col("event_id")
            + _h60(F.concat(F.lit("arr:"), F.col("event_id").cast("string"))) % 50
        ).alias("arrival_seq"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_seq", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = arr.select(
        (
            F.max(F.col("ts").cast("long")).over(w) - F.col("ts").cast("long")
        ).alias("late_s")
    )
    b = late.select(
        F.when(F.col("late_s") == 0, "a_in_order")
        .when(F.col("late_s") <= 60, "b_1min")
        .when(F.col("late_s") <= 300, "c_5min")
        .when(F.col("late_s") <= 3600, "d_1hour")
        .otherwise("e_over_1hour")
        .alias("bucket"),
        "late_s",
    )
    tot = b.agg(F.count("*").alias("n_total"))
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.max("late_s").cast("long").alias("max_late_s"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_events",
            "max_late_s",
            F.expr("CAST(n_events * 1000000 div n_total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Q9d: differentially-private count release (deterministic calibration)
# ---------------------------------------------------------------------------

_DP_EPS_INV = 1.0  # b = sensitivity/epsilon = 1/1.0


@query(
    "privacy_dp_release",
    """
    WITH g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
      FROM events GROUP BY event_type
    ),
    u AS (
      SELECT event_type, n_true,
             (CAST('0x' || substr(md5('dp:' || event_type), 1, 15) AS BIGINT)
              % 1000000 + 0.5) / 1000000.0 - 0.5 AS c
      FROM g
    )
    SELECT event_type, n_true,
           CAST(ROUND(-SIGN(c) * LN(1 - 2 * ABS(c)) * 1000000) AS BIGINT)
             AS noise_micro,
           n_true * 1000000
             + CAST(ROUND(-SIGN(c) * LN(1 - 2 * ABS(c)) * 1000000) AS BIGINT)
             AS released_micro
    FROM u ORDER BY event_type
    """,
)
def privacy_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9d differentially-private histogram release (Dwork et al.
    TCC'06), completing the privacy family (k-anonymity Q9, l-diversity
    Q10, t-closeness Q14): per-category counts plus Laplace(b=1/eps)
    noise at eps=1 — the mechanism a data clean room applies before a
    count leaves the boundary.  The noise draw is md5-seeded inverse-
    CDF (u uniform on the 1e6 grid -> -b*sign(u-.5)*ln(1-2|u-.5|)), so
    the release is REPRODUCIBLE — the property an auditable pipeline
    needs (re-running the release job must not print a second,
    differently-noised copy of the truth; a fresh-random release per
    run is an epsilon-budget leak).

    Determinism: the uniform is exact integer md5 arithmetic on a 1e6
    grid; ln/round on that grid is the established surprisal idiom;
    the released value is exact integer micro-units.

    Plan shape: one map-side-combined aggregate to K category rows;
    the mechanism is a map expression on that K-row table.  At 100 TB
    this is a metadata query."""
    ev = _t(spark, sf_dir, "events")
    from bytesprocessor_spark.queries_curation import _h60

    g = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n_true"))
    c = (
        (_h60(F.concat(F.lit("dp:"), F.col("event_type"))) % 1000000 + 0.5)
        / 1000000.0
        - 0.5
    )
    noise = F.round(
        -F.signum(c) * F.log(F.lit(1.0) - 2.0 * F.abs(c)) * 1000000 * F.lit(_DP_EPS_INV)
    ).cast("long")
    return (
        g.select(
            "event_type",
            "n_true",
            noise.alias("noise_micro"),
            (F.col("n_true") * 1000000 + noise).alias("released_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# L6c: T5-style span-corruption mask plan
# ---------------------------------------------------------------------------

_CORRUPT_PCT = 15   # corrupt ~15% of tokens
_SPAN_LEN = 3       # mean (here: fixed) span length


@query(
    "corpus_span_corruption",
    f"""
    WITH d AS (
      SELECT doc_id, len({_DUCK_TOKS}) AS n_toks FROM documents
    ),
    p AS (
      SELECT doc_id, n_toks,
             GREATEST(n_toks * {_CORRUPT_PCT} // (100 * {_SPAN_LEN}), 1) AS n_spans
      FROM d WHERE n_toks >= {_SPAN_LEN}
    ),
    s AS (
      SELECT doc_id, n_toks, n_spans, UNNEST(range(0, n_spans)) AS span_idx
      FROM p
    ),
    geo AS (
      SELECT doc_id, n_toks, n_spans, span_idx,
             n_toks // n_spans AS seg_len
      FROM s
    )
    SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
           CAST(span_idx * seg_len + 1
                + CAST('0x' || substr(md5(doc_id || ':' || span_idx), 1, 15) AS BIGINT)
                  % GREATEST(seg_len - {_SPAN_LEN} + 1, 1)
                AS BIGINT) AS start_tok,
           CAST(LEAST({_SPAN_LEN}, n_toks - (span_idx * seg_len
                + CAST('0x' || substr(md5(doc_id || ':' || span_idx), 1, 15) AS BIGINT)
                  % GREATEST(seg_len - {_SPAN_LEN} + 1, 1)) ) AS BIGINT) AS span_len
    FROM geo
    ORDER BY doc_id, span_idx
    """,
)
def corpus_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6c span-corruption mask plan (the T5 denoising objective,
    Raffel et al. JMLR'20 sec 3.1.4): for each document, choose
    ~{_CORRUPT_PCT}% of tokens as {_SPAN_LEN}-token corruption spans,
    one span per equal segment so spans never overlap, with the span
    offset inside its segment drawn from the doc's md5 stream.  The
    output (doc_id, span_idx, start_tok, span_len) is the mask
    manifest the example-builder consumes when materializing
    inputs/targets — deterministic, so a resumed preprocessing job
    regenerates byte-identical examples (the property that makes
    mid-epoch restarts safe).

    Determinism: token counts, floor-division geometry, md5-derived
    integer offsets — no floats.

    Plan shape: map-only — tokenize, per-doc arithmetic, a bounded
    explode of n_spans rows per doc.  No shuffle at all; at 100 TB
    this runs at scan speed."""
    docs = _t(spark, sf_dir, "documents")
    from bytesprocessor_spark.queries_curation import _h60

    d = docs.select("doc_id", token_count(F.col("text")).alias("n_toks"))
    p = d.where(F.col("n_toks") >= _SPAN_LEN).select(
        "doc_id",
        "n_toks",
        F.greatest(
            F.expr(f"n_toks * {_CORRUPT_PCT} div (100 * {_SPAN_LEN})"), F.lit(1)
        ).alias("n_spans"),
    )
    s = p.select(
        "doc_id",
        "n_toks",
        "n_spans",
        F.explode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("span_idx"),
        F.expr("n_toks div n_spans").alias("seg_len"),
    )
    off = _h60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("span_idx"))
    ) % F.greatest(F.col("seg_len") - _SPAN_LEN + 1, F.lit(1))
    start = F.col("span_idx") * F.col("seg_len") + 1 + off
    return s.select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        start.cast("long").alias("start_tok"),
        F.least(F.lit(_SPAN_LEN), F.col("n_toks") - (start - 1)).cast("long").alias("span_len"),
    ).orderBy("doc_id", "span_idx")


# ---------------------------------------------------------------------------
# E11: held-out unigram perplexity (tokenizer/LM eval on a clean split)
# ---------------------------------------------------------------------------

@query(
    "eval_perplexity_holdout",
    f"""
    WITH d AS (
      SELECT doc_id, source, {_DUCK_TOKS} AS toks,
             (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
              % 5 = 0) AS held
      FROM documents
    ),
    tr AS (SELECT unnest(toks) AS tok FROM d WHERE NOT held),
    cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tr GROUP BY tok),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tr,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM tr
    ),
    lp AS (
      SELECT tok,
             CAST(ROUND(LN(CAST(n_tr + v + 1 AS DOUBLE) / (c + 1)) * 1000000)
                  AS BIGINT) AS lp_q
      FROM cnt CROSS JOIN tot
    ),
    ho AS (SELECT source, unnest(toks) AS tok FROM d WHERE held),
    j AS (
      SELECT ho.source, ho.tok,
             COALESCE(lp.lp_q,
                      (SELECT CAST(ROUND(LN(CAST(n_tr + v + 1 AS DOUBLE)) * 1000000)
                              AS BIGINT) FROM tot)) AS lp_q,
             (lp.tok IS NULL) AS oov
      FROM ho LEFT JOIN lp ON ho.tok = lp.tok
    )
    SELECT source,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(lp_q) // COUNT(*) AS BIGINT) AS h_micro,
           CAST(ROUND(EXP((SUM(lp_q) // COUNT(*)) / 1000000.0) * 1000) AS BIGINT)
             AS ppl_milli
    FROM j GROUP BY source ORDER BY source
    """,
)
def eval_perplexity_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11 held-out unigram perplexity per source: train an add-one-
    smoothed unigram LM on the md5-hashed 80% split, score the held-out
    20% — the leakage-free twin of L4j (which scores the corpus under
    a model trained on ITSELF and so under-reports tail surprisal).
    The per-source ppl column is the data-quality readout a curation
    sweep tracks across snapshots: a source whose held-out perplexity
    jumps changed its vocabulary distribution.

    Determinism: the split is the corpus_split_assign md5 idiom; per-
    token log-probs are micro-quantized BIGINTs (the L4j idiom) summed
    exactly; H is floor-division; the final exp is a single IEEE op on
    a grid value.

    Plan shape: one token explode per split; the vocabulary-sized lp
    table broadcasts onto the held-out token stream; two shuffles total
    (token counts, source aggregate) plus a 1-row totals broadcast."""
    docs = _t(spark, sf_dir, "documents")
    from bytesprocessor_spark.queries_curation import _h60

    d = docs.select(
        "doc_id",
        "source",
        tokenize(F.col("text")).alias("toks"),
        (_h60(F.col("doc_id").cast("string")) % 5 == 0).alias("held"),
    )
    tr = d.where(~F.col("held")).select(F.explode("toks").alias("tok"))
    cnt = tr.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    tot = tr.agg(
        F.count("*").cast("long").alias("n_tr"),
        F.countDistinct("tok").cast("long").alias("v"),
    )
    lp = cnt.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.round(
            F.log((F.col("n_tr") + F.col("v") + 1).cast("double") / (F.col("c") + 1))
            * 1000000.0
        )
        .cast("long")
        .alias("lp_q"),
    )
    ho = d.where(F.col("held")).select("source", F.explode("toks").alias("tok"))
    oov_lp = tot.select(
        F.round(F.log((F.col("n_tr") + F.col("v") + 1).cast("double")) * 1000000.0)
        .cast("long")
        .alias("oov_lp")
    )
    j = (
        ho.join(F.broadcast(lp.withColumnRenamed("tok", "ltok")),
                ho.tok == F.col("ltok"), "left")
        .crossJoin(F.broadcast(oov_lp))
        .select(
            "source",
            F.coalesce(F.col("lp_q"), F.col("oov_lp")).alias("lp_q"),
            F.col("ltok").isNull().alias("oov"),
        )
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("oov"), 1).otherwise(0)).cast("long").alias("n_oov"),
            F.expr("CAST(sum(lp_q) div count(*) AS BIGINT)").alias("h_micro"),
            F.round(
                F.exp(F.expr("CAST(sum(lp_q) div count(*) AS BIGINT)") / 1000000.0)
                * 1000
            )
            .cast("long")
            .alias("ppl_milli"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# L3j: maximal-marginal-relevance diversified rerank
# ---------------------------------------------------------------------------

_MMR_POOL = 20
_MMR_K = 5
# lambda = 0.7 as the integer pair (7, 3) out of 10

_MMR_SIM = (
    "CAST(ROUND(list_dot_product({a}, {b}) / "
    "(SQRT(list_dot_product({a}, {a})) * SQRT(list_dot_product({b}, {b}))) "
    "* 1000000) AS BIGINT)"
)


def _mmr_oracle() -> str:
    qsim = _MMR_SIM.format(a="qv", b="v")
    psim = _MMR_SIM.format(a="a.v", b="b.v")
    steps = []
    sel_union = "SELECT vec_id FROM k1"
    finals = ["SELECT 1 AS sel_rank, vec_id, qs AS q_sim_micro, mmr AS mmr_score FROM k1"]
    for i in range(2, _MMR_K + 1):
        steps.append(f"""
    r{i} AS (
      SELECT c.vec_id, c.qs,
             7 * c.qs - 3 * (SELECT MAX(ps) FROM p
                             WHERE ai = c.vec_id AND bi IN ({sel_union})) AS mmr
      FROM cand c WHERE c.vec_id NOT IN ({sel_union})),
    k{i} AS (SELECT vec_id, qs, mmr FROM r{i} ORDER BY mmr DESC, vec_id LIMIT 1)""")
        sel_union += f" UNION ALL SELECT vec_id FROM k{i}"
        finals.append(
            f"SELECT {i} AS sel_rank, vec_id, qs AS q_sim_micro, mmr AS mmr_score FROM k{i}"
        )
    return f"""
    WITH e AS (SELECT vec_id, {_QUANT_SQL} AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    s AS (
      SELECT e.vec_id, {qsim} AS qs
      FROM e CROSS JOIN q WHERE e.vec_id <> 0),
    cand AS (SELECT vec_id, qs FROM s ORDER BY qs DESC, vec_id LIMIT {_MMR_POOL}),
    cv AS (SELECT c.vec_id, c.qs, e.v FROM cand c JOIN e USING (vec_id)),
    p AS (
      SELECT a.vec_id AS ai, b.vec_id AS bi, {psim} AS ps
      FROM cv a CROSS JOIN cv b WHERE a.vec_id <> b.vec_id),
    k1 AS (SELECT vec_id, qs, 7 * qs AS mmr FROM cand ORDER BY qs DESC, vec_id LIMIT 1),
    {",".join(steps)}
    {" UNION ALL ".join(finals)}
    ORDER BY sel_rank
    """


from bytesprocessor_spark.queries_llm import _QUANT as _QUANT_SQL  # noqa: E402
from bytesprocessor_spark.functions.vectors import dot_product  # noqa: E402


def _sim_micro(va, vb) -> F.Column:
    dq = dot_product(va, vb)
    return F.round(
        dq / (F.sqrt(dot_product(va, va)) * F.sqrt(dot_product(vb, vb))) * 1000000.0
    ).cast("long")


@query("similarity_mmr_rerank", _mmr_oracle())
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3j maximal-marginal-relevance rerank (Carbonell & Goldstein
    SIGIR'98): from the brute-force top-{_MMR_POOL} candidate pool for
    one query vector, greedily select {_MMR_K} results maximizing
    lambda*sim(q,d) - (1-lambda)*max sim(d, selected) with lambda=0.7
    — the diversified top-k a retrieval-augmented pipeline serves when
    the raw ANN neighbors are near-duplicates of each other (which,
    post-dedup corpora aside, they usually are).  Composes with any
    L3 candidate generator: swap the brute-force pool stage for the
    IVF/PQ/LSH path at scale.

    Determinism: similarities are micro-quantized BIGINTs over
    quantized vectors (the L3 idiom); the greedy argmax breaks ties on
    vec_id; lambda is the exact integer pair (7,3)/10.

    Plan shape: candidate generation is the standard broadcast-query
    corpus scan + top-k heap; everything after operates on the
    {_MMR_POOL}-row pool ({_MMR_POOL}^2 pair frame, {_MMR_K}
    tiny-frame iterations) — bounded work independent of corpus size,
    exactly like the driver-side rerank a vector DB performs, but
    expressed as lazy DataFrame ops so the whole thing stays one
    plan."""
    emb = _t(spark, sf_dir, "embeddings")
    from bytesprocessor_spark.functions.vectors import quantize_micro

    e = emb.select("vec_id", quantize_micro(F.col("embedding")).alias("v"))
    qv = F.broadcast(e.where(F.col("vec_id") == 0).select(F.col("v").alias("qv")))
    cand = (
        e.crossJoin(qv)
        .where(F.col("vec_id") != 0)
        .select("vec_id", _sim_micro(F.col("qv"), F.col("v")).alias("qs"))
        .orderBy(F.col("qs").desc(), "vec_id")
        .limit(_MMR_POOL)
    )
    cv = cand.join(e, "vec_id").select("vec_id", "qs", "v")
    a = cv.select(
        F.col("vec_id").alias("ai"), F.col("v").alias("va")
    )
    b = cv.select(F.col("vec_id").alias("bi"), F.col("v").alias("vb"))
    psym = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("ai") != F.col("bi"))
        .select("ai", "bi", _sim_micro(F.col("va"), F.col("vb")).alias("ps"))
    )
    sel = (
        cand.orderBy(F.col("qs").desc(), "vec_id")
        .limit(1)
        .select(
            F.lit(1).alias("sel_rank"),
            "vec_id",
            F.col("qs").alias("q_sim_micro"),
            (7 * F.col("qs")).alias("mmr_score"),
        )
    )
    for i in range(2, _MMR_K + 1):
        sel_ids = sel.select("vec_id")
        rem = cand.join(sel_ids, "vec_id", "left_anti")
        ms = (
            psym.join(sel_ids.withColumnRenamed("vec_id", "bi"), "bi")
            .groupBy("ai")
            .agg(F.max("ps").alias("ms"))
        )
        pick = (
            rem.join(ms, rem.vec_id == ms.ai)
            .select(
                "vec_id",
                "qs",
                (7 * F.col("qs") - 3 * F.col("ms")).alias("mmr"),
            )
            .orderBy(F.col("mmr").desc(), "vec_id")
            .limit(1)
            .select(
                F.lit(i).alias("sel_rank"),
                "vec_id",
                F.col("qs").alias("q_sim_micro"),
                F.col("mmr").alias("mmr_score"),
            )
        )
        sel = sel.unionAll(pick)
    return sel.orderBy("sel_rank")
