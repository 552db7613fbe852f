"""Recompute / invariant tests for the queries_scale.py batch.

Each row already hash-checks against its DuckDB oracle; these pin the
ALGEBRAIC contracts the oracle comparison can't express (identities,
bounds, fixpoints) — the house standard for every registry family.
"""

from pyspark.sql import functions as F

from bytesprocessor_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_bloom_prune_no_false_negatives(spark):
    """Bloom filters never drop a true match: n_match <= n_bloom_pass
    per priority class, and false positives account for the exact gap."""
    rows = QUERIES["join_bloom_prune"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_match <= r.n_bloom_pass <= r.n_orders
        assert r.n_false_pos == r.n_bloom_pass - r.n_match


def test_stl_decompose_additive_identity(spark):
    """trend + seasonal + residual reconstructs the series exactly in
    micro units — the decomposition is lossless by construction."""
    rows = QUERIES["events_stl_decompose"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.trend_micro + r.seasonal_micro + r.resid_micro == r.n * 1_000_000


def test_token_budget_sums_exactly(spark):
    """Largest-remainder apportionment: allocations sum EXACTLY to the
    budget and each source is within 1 of its exact quota."""
    rows = QUERIES["corpus_token_budget"](spark, SF_DIR).collect()
    budget = 1_000_000
    assert sum(r.alloc for r in rows) == budget
    total_w = sum(r.weight_chars for r in rows)
    for r in rows:
        exact = r.weight_chars * budget / total_w
        assert abs(r.alloc - exact) < 1.0 + 1e-9
        assert r.alloc in (r.floor_alloc, r.floor_alloc + 1)


def test_rolling_distinct_bounds(spark):
    """WAU_7d is sandwiched: >= the day's DAU, <= the sum of the
    window's DAUs (distinct can't exceed the sum of dailies)."""
    rows = QUERIES["events_rolling_distinct"](spark, SF_DIR).collect()
    assert rows
    dau = {r.day: r.dau for r in rows}
    days = sorted(dau)
    for r in rows:
        assert r.wau_7d >= r.dau
        idx = days.index(r.day)
        window = days[max(0, idx - 6): idx + 1]
        assert r.wau_7d <= sum(dau[d] for d in window)


def test_span_corruption_spans_in_bounds_and_disjoint(spark):
    """Every span lies inside its document and spans never overlap
    (one span per equal segment by construction)."""
    from collections import defaultdict

    rows = QUERIES["corpus_span_corruption"](spark, SF_DIR).collect()
    assert rows
    by_doc = defaultdict(list)
    for r in rows:
        assert r.start_tok >= 1 and r.span_len >= 1
        by_doc[r.doc_id].append((r.start_tok, r.span_len))
    for spans in by_doc.values():
        spans.sort()
        for (s1, l1), (s2, _) in zip(spans, spans[1:]):
            assert s1 + l1 <= s2


def test_mmr_first_pick_is_max_relevance(spark):
    """MMR rank 1 is the pure-relevance argmax; the 5 selections are
    distinct and carry the declared lambda identity at rank 1."""
    rows = QUERIES["similarity_mmr_rerank"](spark, SF_DIR).collect()
    assert [r.sel_rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5
    first = rows[0]
    assert first.mmr_score == 7 * first.q_sim_micro
    assert first.q_sim_micro == max(r.q_sim_micro for r in rows)


def test_k_core_fixpoint_reached(spark):
    """The pinned round budget reaches the true 2-core at fixture
    scale: every surviving node keeps degree >= 2, and one additional
    peel round changes nothing (the docstring's fixpoint claim)."""
    out = QUERIES["graph_k_core"](spark, SF_DIR)
    rows = out.collect()
    assert rows
    assert all(r.core_degree >= 2 for r in rows)

    import bytesprocessor_spark.queries_scale as qs

    orig = qs._KCORE_ROUNDS
    try:
        qs._KCORE_ROUNDS = orig + 1
        extra = qs.graph_k_core(spark, SF_DIR).collect()
    finally:
        qs._KCORE_ROUNDS = orig
    assert sorted(map(tuple, extra)) == sorted(map(tuple, rows))


def test_bootstrap_ci_ordering(spark):
    """CI bounds are ordered and bracket the point estimate at this
    sample size; 50 replicas as declared."""
    r = QUERIES["events_bootstrap_ci"](spark, SF_DIR).collect()[0]
    assert r.n_replicas == 50
    assert r.ci_lo_cents <= r.ci_hi_cents
    assert r.ci_lo_cents <= r.point_mean_cents <= r.ci_hi_cents


def test_uniqueness_flags_primary_key(spark):
    """o_orderkey is the table key: distinct ratio 1e6 ppm and the
    key-candidate verdict true; priority is a low-cardinality column."""
    rows = {r.col: r for r in QUERIES["quality_uniqueness"](spark, SF_DIR).collect()}
    ok = rows["o_orderkey"]
    assert ok.is_key_candidate and ok.distinct_ppm == 1_000_000
    pr = rows["o_orderpriority"]
    assert not pr.is_key_candidate and pr.n_distinct <= 10


def test_mix_shift_reconstructs_delta(spark):
    """Summed per-segment mix+rate effects reconstruct the total AOV
    change up to the per-segment floor rounding (< 1 cent each)."""
    rows = QUERIES["orders_mix_shift"](spark, SF_DIR).collect()
    assert rows
    aov0 = sum(r.share0_ppm * r.rate0_cents for r in rows) / 1_000_000
    aov1 = sum(r.share1_ppm * r.rate1_cents for r in rows) / 1_000_000
    effects = sum(r.mix_effect_cents + r.rate_effect_cents for r in rows)
    assert abs(effects - (aov1 - aov0)) <= 2 * len(rows)


def test_lift_gains_monotone_and_complete(spark):
    """Cumulative capture is monotone and ends at 100% (1e6 ppm)."""
    rows = QUERIES["eval_lift_gains"](spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    caps = [r.cum_capture_ppm for r in rows]
    assert all(a <= b for a, b in zip(caps, caps[1:]))
    assert caps[-1] == 1_000_000


def test_price_index_matched_model(spark):
    """Every year's basket is non-empty and the index is positive;
    basket_base uses base-year prices so year {base}+1..2000 rows share
    no base-period drift."""
    rows = QUERIES["orders_price_index"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_parts > 0
        assert r.basket_base_c > 0 and r.basket_now_c > 0
        assert r.index_milli > 0


def test_cluster_sizes_account_for_corpus(spark):
    """Cluster-size histogram covers every document exactly once."""
    rows = QUERIES["dedup_cluster_sizes"](spark, SF_DIR).collect()
    from bytesprocessor_spark.sources.tables import load_table

    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.n_dropped == (r.cluster_size - 1) * r.n_clusters


def test_runs_test_run_count_bounds(spark):
    """Runs count is between 1 and the number of signed moves; up+down
    moves equal the signed-move count."""
    rows = QUERIES["events_runs_test"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        moves = r.n_up + r.n_down
        assert 1 <= r.n_runs <= moves


def test_fairness_parity_gaps_center(spark):
    """Selection-count-weighted parity gaps reconstruct to ~zero
    (the overall rate is the weighted mean of group rates)."""
    rows = QUERIES["eval_fairness_parity"](spark, SF_DIR).collect()
    assert rows
    n = sum(r.n for r in rows)
    weighted_gap = sum(r.parity_gap_ppm * r.n for r in rows) / n
    assert abs(weighted_gap) < len(rows) * 2  # floor-rounding slack


def test_poisson_rate_counts_consistent(spark):
    """k1+k2 equals the type's event count; exposures match the day
    domain split."""
    rows = QUERIES["events_poisson_rate"](spark, SF_DIR).collect()
    from bytesprocessor_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    totals = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for r in rows:
        assert r.k1 + r.k2 == totals[r.event_type]
        assert r.t1 > 0 and r.t2 > 0


def test_oov_rate_bounds(spark):
    """OOV counts are bounded by token totals and ppm is the floor
    ratio."""
    rows = QUERIES["text_oov_rate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_ppm == r.n_oov * 1_000_000 // r.n_tokens
        assert r.n_oov_types <= r.n_oov


def test_perplexity_holdout_positive(spark):
    """Held-out surprisal and perplexity are positive and ppl >= 1."""
    rows = QUERIES["eval_perplexity_holdout"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.h_micro > 0
        assert r.ppl_milli >= 1000
        assert 0 <= r.n_oov <= r.n_tokens


def test_curriculum_covers_corpus_once(spark):
    """Every document appears exactly once; positions are contiguous
    within each stage."""
    rows = QUERIES["corpus_curriculum"](spark, SF_DIR).collect()
    from collections import defaultdict

    by_stage = defaultdict(list)
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        by_stage[r.stage].append(r.pos)
    for stage, poss in by_stage.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_sla_ppm_monotone(spark):
    """SLA attainment is monotone in the threshold: 30d <= 60d <= 90d."""
    rows = QUERIES["orders_shipping_sla"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.within_30d_ppm <= r.within_60d_ppm <= r.within_90d_ppm <= 1_000_000


def test_hourly_profile_shares_and_peaks(spark):
    """Shares sum to ~1e6 (floor slack) and every observed dow carries
    exactly one peak-hour row unless tied."""
    rows = QUERIES["events_hourly_profile"](spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= len(rows)
    dows = {r.dow for r in rows}
    for d in dows:
        assert any(r.is_peak_hour for r in rows if r.dow == d)


def test_srm_counts_cover_days(spark):
    """Arm counts per day sum to the day's event count."""
    rows = QUERIES["events_srm_check"](spark, SF_DIR).collect()
    from bytesprocessor_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    total = ev.count()
    assert sum(r.n0 + r.n1 for r in rows) == total


def test_stream_srm_matches_batch(spark):
    """The streaming drain reproduces the batch SRM row exactly —
    per-day arm counts are order-independent sums."""
    batch = QUERIES["events_srm_check"](spark, SF_DIR).collect()
    stream = QUERIES["stream_srm_monitor"](spark, SF_DIR).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_anova_decomposition_bounds(spark):
    """eta2 is a share (0..1e6) and SSB/SSW are non-negative."""
    r = QUERIES["events_anova"](spark, SF_DIR).collect()[0]
    assert 0 <= r.eta2_ppm <= 1_000_000
    assert r.ssb_dollars2 >= 0 and r.ssw_dollars2 >= 0
    assert r.f_milli > 0


def test_seasonal_index_averages_to_one(spark):
    """Revenue-weighted (by definition, plain) mean of the index over
    observed months is ~1000 milli."""
    rows = QUERIES["orders_seasonal_index"](spark, SF_DIR).collect()
    assert rows
    k = len(rows)
    total_rev = sum(r.rev_c for r in rows)
    recomputed = [r.rev_c * k * 1000 // total_rev for r in rows]
    assert [r.seasonal_index_milli for r in rows] == recomputed
    assert abs(sum(recomputed) - 1000 * k) <= k  # floor slack


def test_duplicate_payments_canonical_pairs(spark):
    """Pairs are canonicalized (key_a < key_b) and gaps within the
    window; both orders share customer and band by construction."""
    rows = QUERIES["orders_duplicate_payments"](spark, SF_DIR).collect()
    for r in rows:
        assert r.key_a < r.key_b
        assert abs(r.gap_days) <= 30


def test_template_mining_thresholds(spark):
    """Every surfaced template repeats and ordering is by count desc."""
    rows = QUERIES["text_template_mining"](spark, SF_DIR).collect()
    assert rows
    counts = [r.n for r in rows]
    assert all(c >= 2 for c in counts)
    assert counts == sorted(counts, reverse=True)


def test_xyz_classes_partition_parts(spark):
    """Class counts cover every part with >= 3 demand months."""
    rows = QUERIES["orders_xyz_classes"](spark, SF_DIR).collect()
    from bytesprocessor_spark.sources.tables import load_table
    from pyspark.sql import functions as F2

    li = load_table(spark, SF_DIR, "lineitem")
    eligible = (
        li.groupBy(
            "l_partkey",
            (F2.year("l_shipdate") * 12 + F2.month("l_shipdate")).alias("m"),
        )
        .count()
        .groupBy("l_partkey")
        .count()
        .where(F2.col("count") >= 3)
        .count()
    )
    assert sum(r.n_parts for r in rows) == eligible


def test_open_aging_matches_anti_join(spark):
    """Bucketed open orders equal the raw childless-parent count."""
    rows = QUERIES["orders_open_aging"](spark, SF_DIR).collect()
    from bytesprocessor_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    n_open = orders.join(
        li.select("l_orderkey").distinct(),
        orders.o_orderkey == F.col("l_orderkey"),
        "left_anti",
    ).count()
    assert sum(r.n_orders for r in rows) == n_open


def test_conversion_windows_monotone(spark):
    """Wider attribution windows can only help: cvr monotone in width,
    all bounded by ever-conversion share."""
    r = QUERIES["events_conversion_windows"](spark, SF_DIR).collect()[0]
    assert r.cvr_1h_ppm <= r.cvr_6h_ppm <= r.cvr_24h_ppm <= r.cvr_7d_ppm
    assert r.cvr_7d_ppm <= r.n_converted_ever * 1_000_000 // r.n_viewers


def test_drawdown_identity(spark):
    """drawdown = peak - trough, ppm consistent, peak >= trough."""
    rows = QUERIES["orders_drawdown"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.peak_rev_cents >= r.trough_rev_cents
        assert r.drawdown_cents == r.peak_rev_cents - r.trough_rev_cents
        assert r.drawdown_ppm == r.drawdown_cents * 1_000_000 // r.peak_rev_cents


def test_slo_burn_identities(spark):
    """burn multiple and page flag recompute from the raw counts."""
    rows = QUERIES["events_slo_burn"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.err_ppm == r.errs * 1_000_000 // r.n
        assert r.burn_milli == r.errs * 1_000_000_000 // (r.n * 250_000)
        assert r.page_fast_burn == (r.burn_milli >= 2000)


def test_portscan_bounds(spark):
    """Fan-out counts respect the synthesized domains."""
    rows = QUERIES["packets_portscan"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.max_ports_per_day <= 1024
        assert r.max_dsts_per_day <= 10
        assert r.n_scan_days <= r.n_days


def test_ddos_fanin_surge_identity(spark):
    """Surge flag is the documented cross-multiplied comparison."""
    rows = QUERIES["packets_ddos_fanin"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.fan_in <= 10
        assert r.surge_flag == (r.n_packets * 10 >= r.med_packets * 15)


def test_yoy_identity(spark):
    """Basis points recompute from the revenue pair."""
    rows = QUERIES["orders_rolling_yoy"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        expected = (r.rev_c - r.prev_rev_c) * 10_000
        # both engines' integer division truncates toward ZERO on
        # negatives (Python's // floors, so don't use it here)
        q, rem = divmod(expected, r.prev_rev_c)
        trunc = q if rem == 0 or expected >= 0 else q + 1
        assert r.yoy_bp == trunc


def test_threshold_cost_beats_trivial_policies(spark):
    """The argmin threshold costs no more than select-all or
    select-none, and its cost recomputes from the confusion cells."""
    r = QUERIES["eval_threshold_cost"](spark, SF_DIR).collect()[0]
    assert r.cost == r.fp * 1 + r.fn * 5
    from bytesprocessor_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    np_ = emb.where(F.col("label") == 0).count()
    select_all_cost = (n - np_) * 1      # every negative is a FP
    select_none_cost = np_ * 5           # every positive is a FN
    assert r.cost <= min(select_all_cost, select_none_cost)


def test_split_drift_shares(spark):
    """Per-split shares recompute and sum to ~1e6 each."""
    rows = QUERIES["corpus_split_drift"](spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.train_share_ppm for r in rows) - 1_000_000) <= len(rows)
    assert abs(sum(r.val_share_ppm for r in rows) - 1_000_000) <= len(rows)
    for r in rows:
        assert r.share_gap_ppm == abs(r.train_share_ppm - r.val_share_ppm)


def test_segment_migration_rows_share(spark):
    """Row shares per band_from sum to ~1e6 (full partition of the
    from-state)."""
    from collections import defaultdict

    rows = QUERIES["orders_segment_migration"](spark, SF_DIR).collect()
    assert rows
    by_from = defaultdict(list)
    for r in rows:
        by_from[r.band_from].append(r.row_share_ppm)
    for shares in by_from.values():
        assert abs(sum(shares) - 1_000_000) <= len(shares)


def test_hazard_at_risk_monotone(spark):
    """The at-risk set shrinks as gaps lengthen; hazard is a share."""
    rows = QUERIES["events_return_hazard"](spark, SF_DIR).collect()
    assert rows
    risk = [r.n_at_risk for r in sorted(rows, key=lambda r: r.gap_days)]
    assert all(a >= b for a, b in zip(risk, risk[1:]))
    for r in rows:
        assert 0 < r.hazard_ppm <= 1_000_000
        assert r.hazard_ppm == r.n * 1_000_000 // r.n_at_risk


def test_replenishment_classes_cover_repeat_customers(spark):
    """Class counts cover every customer with >= 3 gaps (>= 4 orders)."""
    rows = QUERIES["orders_replenishment_cycle"](spark, SF_DIR).collect()
    from bytesprocessor_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    eligible = (
        orders.groupBy("o_custkey").count().where(F.col("count") >= 4).count()
    )
    assert sum(r.n_customers for r in rows) == eligible


def test_hhi_bounds(spark):
    """HHI lies between the uniform floor (within quantization slack)
    and the monopoly ceiling."""
    r = QUERIES["orders_hhi"](spark, SF_DIR).collect()[0]
    # per-customer bp shares floor individually, so the sum of squares
    # can undershoot the uniform floor by at most ~2*n_customers*max_bp
    assert r.hhi_bp2 <= 10_000 * 10_000
    assert r.hhi_bp2 >= r.hhi_uniform_bp2 - 2 * 10_000
    assert r.concentration_x_milli >= 900


def test_lead_time_classes_cover_suppliers(spark):
    """Reliability classes cover every supplier with >= 10 shipments."""
    rows = QUERIES["supplier_lead_time"](spark, SF_DIR).collect()
    from bytesprocessor_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    eligible = li.groupBy("l_suppkey").count().where(F.col("count") >= 10).count()
    assert sum(r.n_suppliers for r in rows) == eligible


def test_gap_percentiles_ordered(spark):
    """p50 <= p95 <= p99 and all positive."""
    rows = QUERIES["events_gap_percentiles"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.p50_s <= r.p95_s <= r.p99_s


def test_discount_effect_net_revenue_bound(spark):
    """Net revenue never exceeds gross average times lines (discounts
    only subtract) and bands partition the table."""
    rows = QUERIES["orders_discount_effect"](spark, SF_DIR).collect()
    from bytesprocessor_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r.n_lines for r in rows) == li.count()
    for r in rows:
        assert r.net_revenue_cents <= r.avg_price_cents * r.n_lines + r.n_lines


def test_assortativity_in_range(spark):
    """A correlation lives in [-1, 1] (micro units)."""
    r = QUERIES["graph_assortativity"](spark, SF_DIR).collect()[0]
    assert -1_000_000 <= r.assortativity_micro <= 1_000_000
    assert r.n_edges > 0


def test_release_manifest_consistent_with_card(spark):
    """The release manifest's kept universe is a subset of the card's
    census, and the val split matches the card's count after gating."""
    card = QUERIES["corpus_dataset_card"](spark, SF_DIR).collect()[0]
    man = QUERIES["corpus_release_manifest"](spark, SF_DIR).collect()
    kept_docs = sum(r.n_docs for r in man)
    # dedup keeps at most one doc per fingerprint, the length gate can
    # only remove more
    assert kept_docs <= card.n_unique_docs
    val_docs = sum(r.n_docs for r in man if r.split == "val")
    assert val_docs <= card.n_val_split


def test_dataset_card_identities(spark):
    """Dup ppm and mean tokens recompute; split census bounded."""
    r = QUERIES["corpus_dataset_card"](spark, SF_DIR).collect()[0]
    assert r.exact_dup_ppm == (r.n_docs - r.n_unique_docs) * 1_000_000 // r.n_docs
    assert r.mean_tokens == r.n_tokens // r.n_docs
    assert r.min_tokens <= r.mean_tokens <= r.max_tokens
    assert 0 <= r.n_val_split <= r.n_docs


def test_stream_slo_burn_matches_batch(spark):
    """The streaming drain reproduces the batch SLO-burn rows exactly
    (order-independent per-day sums, the SRM-parity argument)."""
    batch = QUERIES["events_slo_burn"](spark, SF_DIR).collect()
    stream = QUERIES["stream_slo_burn"](spark, SF_DIR).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_spearman_in_range(spark):
    """Spearman rho is a correlation; d2 bounded by the identity's
    denominator scale."""
    r = QUERIES["part_spearman"](spark, SF_DIR).collect()[0]
    assert -1_000_000 <= r.spearman_micro <= 1_000_000
    n = r.n_parts
    assert 0 <= r.sum_sq_rank_diff <= n * (n * n - 1) // 3


def test_period_end_loading_shares(spark):
    """Tail revenue is a sub-share of the month and flags recompute."""
    rows = QUERIES["orders_period_end_loading"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.tail_rev_c <= r.rev_c
        assert r.tail_share_ppm == r.tail_rev_c * 1_000_000 // r.rev_c
        assert r.loading_flag == (r.tail_share_ppm >= 400_000)


def test_mix_entropy_bounds_and_flag(spark):
    """Entropy stays under ln(K) and flags recompute from the fences."""
    import math

    rows = QUERIES["events_mix_entropy_daily"](spark, SF_DIR).collect()
    assert rows
    cap = int(math.log(5) * 1_000_000) + 1000  # 5 event types + slack
    for r in rows:
        assert 0 < r.h_micro <= cap
        assert r.mix_shift_flag == (
            abs(r.h_micro - r.median_h_micro) > 3 * r.mad_micro
        )
