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
