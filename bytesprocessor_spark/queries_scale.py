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
