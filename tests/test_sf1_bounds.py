"""sf1 overflow spot-fixture (VERDICT r5 #6): the registry documents
int64 headroom for a handful of exact-integer-arithmetic entries
(events_acf "past sf~30 drop a decade", embedding_gram_matrix's
d(d+1)/2 cells, events_cuped's double products, the KMV hash
bottom-k).  This test turns those comments into evidence at sf1
VOLUME: it generates the minimal columns at 10x the sf0.1 row counts
(events 1M, lineitem 6M, embeddings 20k x 64) and re-runs the SAME
registry query against the SAME registry oracle on the generated
parquet.

The overflow oracle is DuckDB itself: its SUM over BIGINT accumulates
in HUGEINT (128-bit), so if any Spark-side int64 product or sum
wrapped at this volume the value compare would mismatch — a pass
means the documented bounds hold with real margin at sf1.
"""

import importlib.util
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "check_oracle", Path(__file__).resolve().parents[1] / "tools" / "check_oracle.py"
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)

_SECONDS_30D = 30 * 24 * 3600
_T0 = 1704067200  # 2024-01-01 00:00:00 UTC — matches the fixture epoch


@pytest.fixture(scope="module")
def sf1_dir(spark, tmp_path_factory):
    """Minimal-column tables at sf1 volume, deterministic via xxhash64."""
    d = str(tmp_path_factory.mktemp("sf1"))

    types = F.array(*[F.lit(t) for t in ["view", "click", "purchase", "refund", "share"]])
    events = spark.range(1_000_000).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(_T0) + F.pmod(F.xxhash64("id"), F.lit(_SECONDS_30D))
        )
        .cast("timestamp_ntz")
        .alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50_000)).alias("user_id"),
        F.element_at(
            types, (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5)) + 1).cast("int")
        ).alias("event_type"),
        # value in [0, 560.21] as exact cents/100 — the real table's range
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(56_021)).cast("double") / 100.0)
        .alias("value"),
        F.lit('{"k":1}').alias("props"),
    )
    events.write.parquet(f"{d}/events.parquet")

    lineitem = spark.range(6_000_000).select(
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(200_000)).alias("l_partkey"),
        # extra columns for the r8b survival/demand entries: order link,
        # ship date inside the 30-day window, small-integer quantity
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(1_500_000)).alias("l_orderkey"),
        F.timestamp_seconds(
            F.lit(_T0) + F.pmod(F.xxhash64("id", F.lit(12)), F.lit(_SECONDS_30D))
        )
        .cast("timestamp_ntz")
        .alias("l_shipdate"),
        (F.pmod(F.xxhash64("id", F.lit(13)), F.lit(50)) + 1).cast("double").alias(
            "l_quantity"
        ),
    )
    lineitem.write.parquet(f"{d}/lineitem.parquet")

    dims = F.sequence(F.lit(1), F.lit(64))
    embeddings = spark.range(20_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            dims,
            lambda j: (
                (F.pmod(F.xxhash64("id", j), F.lit(2001)) - 1000).cast("double")
                / 1000.0
            ).cast("float"),
        ).alias("embedding"),
        F.pmod(F.xxhash64("id", F.lit(5)), F.lit(16)).cast("int").alias("label"),
    )
    embeddings.write.parquet(f"{d}/embeddings.parquet")

    prios = F.array(
        *[F.lit(p) for p in ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECI", "5-LOW"]]
    )
    stats = F.array(*[F.lit(s) for s in ["O", "F", "P"]])
    orders = spark.range(1_500_000).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(6)), F.lit(150_000)).alias("o_custkey"),
        F.element_at(
            stats, (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(3)) + 1).cast("int")
        ).alias("o_orderstatus"),
        # totalprice in [900, 555975] as exact cents/100 — TPC-H's range
        (
            (F.pmod(F.xxhash64("id", F.lit(8)), F.lit(55_507_500)) + 90_000)
            .cast("double")
            / 100.0
        ).alias("o_totalprice"),
        F.timestamp_seconds(
            F.lit(_T0) + F.pmod(F.xxhash64("id", F.lit(9)), F.lit(_SECONDS_30D))
        )
        .cast("timestamp_ntz")
        .alias("o_orderdate"),
        F.element_at(
            prios, (F.pmod(F.xxhash64("id", F.lit(10)), F.lit(5)) + 1).cast("int")
        ).alias("o_orderpriority"),
    )
    orders.write.parquet(f"{d}/orders.parquet")
    return d


def _check(spark, sf1_dir, name, tables):
    from bytesprocessor_spark.queries import ORACLE, QUERIES

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf1_dir}/{t}.parquet/*.parquet')"
        )
    duck = con.execute(ORACLE[name]).fetchdf()
    sdf = QUERIES[name](spark, sf1_dir).toPandas()
    duck_cols, duck_rows = _co._pdf_rows(duck)
    spark_cols, spark_rows = _co._pdf_rows(sdf)
    problems = _co.compare(name, spark_cols, spark_rows, duck_cols, duck_rows)
    assert not problems, f"{name} diverged at sf1 volume: " + "\n".join(problems)
    assert len(spark_rows) > 0


def test_events_acf_sf1(spark, sf1_dir):
    _check(spark, sf1_dir, "events_acf", ["events"])


def test_events_cuped_sf1(spark, sf1_dir):
    _check(spark, sf1_dir, "events_cuped", ["events"])


def test_agg_kmv_distinct_sf1(spark, sf1_dir):
    _check(spark, sf1_dir, "agg_kmv_distinct", ["lineitem"])


def test_embedding_gram_matrix_sf1(spark, sf1_dir):
    _check(spark, sf1_dir, "embedding_gram_matrix", ["embeddings"])


def test_events_ols_sf1(spark, sf1_dir):
    # 9 Gram/moment sums exact int64 at 1M rows; Cramer solve in double
    _check(spark, sf1_dir, "events_ols", ["events"])


def test_events_holt_winters_sf1(spark, sf1_dir):
    # milli-cent state x 1e6 coefs at sf1 daily volumes stays in int64
    _check(spark, sf1_dir, "events_holt_winters", ["events"])


def test_eval_regression_metrics_sf1(spark, sf1_dir):
    # the documented bound: whole-dollar residuals squared x 1.5M rows
    # stay under 2^63 (cents would wrap — the reason for the scale)
    _check(spark, sf1_dir, "eval_regression_metrics", ["orders"])


def test_orders_cramers_v_sf1(spark, sf1_dir):
    # obs*n products at n=1.5M stay exact in double (< 2^53) before
    # the micro-quantization; a wrap or rounding split would mismatch
    _check(spark, sf1_dir, "orders_cramers_v", ["orders"])


def test_orders_target_encoding_sf1(spark, sf1_dir):
    # (sum_cat - y) * 100 at 300k-row categories of <=5.6e7 cents
    # stays well inside int64
    _check(spark, sf1_dir, "orders_target_encoding", ["orders"])


def test_events_welch_ttest_sf1(spark, sf1_dir):
    # the Σx² moment is the bound: vc <= 56_021 cents squared ~ 3.1e9,
    # x ~200k rows per group ~ 6e14 — three orders of magnitude of
    # int64 headroom at sf1 (wraps only past ~sf3000); t/df double
    # trees over the six moments must agree to the quantum
    _check(spark, sf1_dir, "events_welch_ttest", ["events"])


def test_events_changepoint_sf1(spark, sf1_dir):
    # the score |D*S_k - k*T| is bounded by D*T ~ 30 x 1e6 = 3e7 at
    # sf1 (int64-trivial); what sf1 actually stresses is the argmax
    # tie-break determinism over denser daily counts
    _check(spark, sf1_dir, "events_changepoint", ["events"])


def test_orders_woe_encoding_sf1(spark, sf1_dir):
    # pure-count WOE: n_pos * tn products ~ 3e5 x 1e6 = 3e11 reach the
    # double tree exactly (< 2^53); ln + micro-quantize must agree
    _check(spark, sf1_dir, "orders_woe_encoding", ["orders"])


def test_events_kruskal_wallis_sf1(spark, sf1_dir):
    # 2R_j ~ 2 * (1M/5 rows) * 1M max-rank ~ 4e11; the per-group term
    # (2R)^2/(4n) evaluates in double (identical tree both engines)
    # and quantizes to ~2e17 — rsum over 5 groups stays inside int64;
    # tie blocks (~18 rows per distinct cent value) keep tc_part tiny
    _check(spark, sf1_dir, "events_kruskal_wallis", ["events"])


def test_eval_cohens_kappa_sf1(spark, sf1_dir):
    # chance = sum of marginal products ~ 5 * (2e5)^2 = 2e11 — exact
    # int64 with 7 orders of magnitude headroom
    _check(spark, sf1_dir, "eval_cohens_kappa", ["events"])


def test_eval_mcnemar_sf1(spark, sf1_dir):
    _check(spark, sf1_dir, "eval_mcnemar", ["events"])


def test_eval_ips_policy_value_sf1(spark, sf1_dir):
    # per-context IPS term r_ca * n_c / n_ca: worst case ~1e10 cents
    # x 5e4 rows / 1 match ~ 5e14 before quantization — int64-safe
    _check(spark, sf1_dir, "eval_ips_policy_value", ["events"])


def test_events_fdr_bh_sf1(spark, sf1_dir):
    # what sf1 stresses is the A&S tail agreement at dense counts
    # (z in the hundreds -> p underflows to 0 micro identically) and
    # the integer step-up cross-multiplication at m=35
    _check(spark, sf1_dir, "events_fdr_bh", ["events"])


def test_orders_logrank_sf1(spark, sf1_dir):
    # risk sets ~1.5M at t=0; per-time E/V nano terms ~ dt * 1e9 with
    # dt up to ~50k/day -> 5e13 per term, ~30 terms -> 1.5e15 sum
    _check(spark, sf1_dir, "orders_logrank", ["orders", "lineitem"])


def test_part_croston_demand_sf1(spark, sf1_dir):
    # dyadic EWMA: demand sums per (part, week) ~ 30 rows x 50 qty x
    # 100 cents ~ 1.5e5; x 2^7 weight ~ 2e7 — trivially exact; sf1
    # stresses the 200k-part window fan-out, not the arithmetic
    _check(spark, sf1_dir, "part_croston_demand", ["lineitem"])


def test_graph_hits_sf1(spark, sf1_dir):
    # unnormalized integer HITS: mean degree ~40 (6M edges / 150k
    # customers), two rounds bound scores by ~maxdeg^4 — far inside
    # int64; sf1 stresses the edge-table distinct + iteration joins
    _check(spark, sf1_dir, "graph_hits", ["orders", "lineitem"])


def test_events_cochran_armitage_sf1(spark, sf1_dir):
    # dose-weighted moments: w^2 * n ~ 49 x 1e6 = 5e7 — int64-trivial;
    # sf1 pins the fixed Z tree at dense counts
    _check(spark, sf1_dir, "events_cochran_armitage", ["events"])


def test_events_brown_forsythe_sf1(spark, sf1_dir):
    # the bound: z^2 <= (56021)^2 ~ 3.1e9 x 1M rows ~ 3e15 in the s2
    # moment — three orders of int64 headroom; per-group between-terms
    # quantize before the 5-row sum
    _check(spark, sf1_dir, "events_brown_forsythe", ["events"])


def test_eval_qini_uplift_sf1(spark, sf1_dir):
    # what sf1 stresses is NTILE agreement over a 1M-row unique total
    # order (remainder-bucket placement must match cross-engine)
    _check(spark, sf1_dir, "eval_qini_uplift", ["events"])


def test_eval_krippendorff_alpha_sf1(spark, sf1_dir):
    # ~2.25M ratings; per-unit nano terms <= 6e9 x 1M units ~ 6e15 in
    # the D_o sum — inside int64; D_e marginal products ~ (1e6)^2 =
    # 1e12 reach the double tree exactly (< 2^53)
    _check(spark, sf1_dir, "eval_krippendorff_alpha", ["events"])


def test_events_panel_within_sf1(spark, sf1_dir):
    # per-user micro terms: (n*Sxy - SxSy)/n ~ 1e7 x 1e6 quantum =
    # 1e13, x 5e4 users ~ 5e17 in the cross-user sum — inside int64
    # (documented rescale to milli past ~1e9 users)
    _check(spark, sf1_dir, "events_panel_within", ["events"])


def test_eval_qini_and_weibull_rank_windows_sf1(spark, sf1_dir):
    # Weibull: 1e-4-quantized plot coords -> products ~2.5e9 x 6M
    # rows ~ 1.5e16 in Sxy — inside int64; the global rank window at
    # sf1 volume is the stress
    _check(spark, sf1_dir, "orders_weibull_fit", ["orders", "lineitem"])


def test_events_capture_recapture_sf1(spark, sf1_dir):
    # pure counts at 50k users; sf1 stresses nothing numeric — it pins
    # the flag-rollup determinism at dense ids
    _check(spark, sf1_dir, "events_capture_recapture", ["events"])


def test_eval_bradley_terry_sf1(spark, sf1_dir):
    # per-pair denominator terms ~ n_ij/(p_i+p_j) ~ 30/(1e10) * 1e9 =
    # 3 nano-units x k=4 js — the quantized MM trajectory must agree
    # at 30 dense duel days
    _check(spark, sf1_dir, "eval_bradley_terry", ["events"])


def test_events_extreme_gumbel_sf1(spark, sf1_dir):
    # daily-max moments: m^2 ~ 3.1e9 x 30 days — trivial; sf1 pins the
    # MAX-rollup determinism at dense days
    _check(spark, sf1_dir, "events_extreme_gumbel", ["events"])


def test_events_peaks_over_threshold_sf1(spark, sf1_dir):
    # the documented bound: (i-1)*y at 50k exceedances of <=2801-cent
    # excess ~ 1.4e8 per row, ~3.5e12 summed — int64-safe to ~sf30
    _check(spark, sf1_dir, "events_peaks_over_threshold", ["events"])


def test_events_eb_shrinkage_sf1(spark, sf1_dir):
    # the documented bound: rate_micro^2 ~ 1e12 x 50k users ~ 5e16 in
    # the prior's s2 — int64-safe to ~1e6 users (then drop a decade)
    _check(spark, sf1_dir, "events_eb_shrinkage", ["events"])


def test_events_burst_kleinberg_sf1(spark, sf1_dir):
    # emission magnitudes k*ln(p) ~ 2e5 * 1.6 -> 3e11 micro-units per
    # day; the integer Viterbi sums ~30 of them — int64-trivial; sf1
    # pins the LN-quantize agreement at dense daily counts
    _check(spark, sf1_dir, "events_burst_kleinberg", ["events"])


def test_orders_hill_tail_sf1(spark, sf1_dir):
    # ln quantized to micro over the top 201 order statistics: sums
    # ~ 201 x 1.8e7 micro-units — int64-trivial; sf1 pins the rank
    # window + LN agreement at 1.5M rows
    _check(spark, sf1_dir, "orders_hill_tail", ["orders"])


def test_events_bass_diffusion_overflow_guard(spark, tmp_path):
    """VERDICT r9 #3: A109's documented ~sf100 Σx⁴ bound now has an
    explicit guard instead of a silent-overflow path.  600k day-1
    signups push the day-2 cumulative regressor to x = 60,000, whose
    x⁴ = 1.296e19 exceeds int64 — BOTH engines must agree the readout
    is NULL (Spark would previously wrap silently; the DuckDB oracle
    would throw on the HUGEINT->BIGINT cast)."""
    from bytesprocessor_spark.queries import ORACLE, QUERIES

    d = str(tmp_path)
    day1 = spark.range(600_000).select(
        F.lit("2024-01-01 12:00:00").cast("timestamp_ntz").alias("ts"),
        F.lit("signup").alias("event_type"),
    )
    tail = spark.createDataFrame(
        [("2024-01-02 12:00:00",), ("2024-01-03 12:00:00",)], ["t"]
    ).select(
        F.col("t").cast("timestamp_ntz").alias("ts"),
        F.lit("signup").alias("event_type"),
    )
    day1.unionByName(tail).write.parquet(f"{d}/events.parquet")

    sdf = QUERIES["events_bass_diffusion"](spark, d).toPandas()
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert row["n_days"] == 3
    for col in ("s4", "sxy", "a_micro", "b_micro", "c_micro"):
        assert row[col] is None or row.isna()[col], f"{col} not NULLed"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    duck = con.execute(ORACLE["events_bass_diffusion"]).fetchdf()
    duck_cols, duck_rows = _co._pdf_rows(duck)
    spark_cols, spark_rows = _co._pdf_rows(sdf)
    problems = _co.compare(
        "events_bass_diffusion", spark_cols, spark_rows, duck_cols, duck_rows
    )
    assert not problems, "guarded NULL rows diverged: " + "\n".join(problems)


def test_events_mann_kendall_sf1(spark, sf1_dir):
    # pair-sign S over <=31-day series; counts at 1M rows stay trivial
    _check(spark, sf1_dir, "events_mann_kendall", ["events"])


def test_events_durbin_watson_sf1(spark, sf1_dir):
    # 128-bit deviation products at 1M-row daily cent sums
    _check(spark, sf1_dir, "events_durbin_watson", ["events"])


def test_events_effect_sizes_sf1(spark, sf1_dir):
    # 128-bit cent moment sums per (type, weekend) cell at 1M rows
    _check(spark, sf1_dir, "events_effect_sizes", ["events"])


def test_events_cochran_q_sf1(spark, sf1_dir):
    # 128-bit row/column moments over 50k users
    _check(spark, sf1_dir, "events_cochran_q", ["events"])


def test_events_simpson_diversity_sf1(spark, sf1_dir):
    # HUGEINT pair counts at ~33k events/day
    _check(spark, sf1_dir, "events_simpson_diversity", ["events"])


def test_orders_wasserstein_energy_sf1(spark, sf1_dir):
    # 128-bit gap-weighted CDF sums over the 1.5M-order support
    _check(spark, sf1_dir, "orders_wasserstein_drift", ["orders"])
    _check(spark, sf1_dir, "orders_energy_distance", ["orders"])


def test_orders_tukey_fences_sf1(spark, sf1_dir):
    # percentile_disc + fence counts at 1.5M orders
    _check(spark, sf1_dir, "orders_tukey_fences", ["orders"])
