"""Structural invariants of the round-6 operators — properties the
value gate cannot see (it only proves engine agreement), asserted
directly at sf0.001."""

from __future__ import annotations

from celestrak_tle_data_pipeline_spark import plans

from conftest import SF_DIR


def _run(spark, name):
    return plans.all_queries()[name](spark, SF_DIR)


def test_bloom_never_false_negative_and_positive_superset(spark):
    r = _run(spark, "bloom_membership_sketch").collect()[0]
    assert r.n_false_negatives == 0
    # the bloom-positive set contains every present key
    assert r.n_bloom_positive >= r.n_present
    assert r.n_candidates >= r.n_bloom_positive


def test_kmv_estimates_bracket_exacts(spark):
    r = _run(spark, "kmv_intersection_estimate").collect()[0]
    assert r.within_15pct
    # small-set rule at sf0.001: sketches hold whole sets -> exact
    assert r.est_a == float(r.exact_a)
    assert r.est_b == float(r.exact_b)
    assert r.est_inter == float(r.exact_inter)


def test_winnowing_density_near_guarantee(spark):
    rows = _run(spark, "winnowing_fingerprints").collect()
    assert rows
    for r in rows:
        # selected set is nonempty, never exceeds the gram count, and
        # the reported density is exactly the ratio (no 1/w lower
        # bound exists: one small hash can be the minimum of MANY
        # consecutive windows and is selected once)
        assert 0 < r.n_fingerprints <= r.n_grams
        assert abs(r.density - r.n_fingerprints / r.n_grams) < 1e-9


def test_curation_funnel_is_monotone(spark):
    rows = {r.stage: r for r in _run(spark, "corpus_curation_funnel").collect()}
    order = ["0_raw", "1_quality", "2_exact_dedup",
             "3_decontaminated", "4_train_split"]
    docs = [rows[s].n_docs for s in order]
    chars = [rows[s].n_chars for s in order]
    assert all(b <= a for a, b in zip(docs, docs[1:]))
    assert all(b <= a for a, b in zip(chars, chars[1:]))
    assert docs[-1] > 0


def test_kaplan_meier_survival_is_monotone_nonincreasing(spark):
    rows = sorted(
        _run(spark, "kaplan_meier_sessions").collect(),
        key=lambda r: r.duration_min,
    )
    assert rows
    surv = [r.survival for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(b <= a + 1e-12 for a, b in zip(surv, surv[1:]))
    # at-risk counts shrink as duration grows
    risk = [r.n_at_risk for r in rows]
    assert all(b <= a for a, b in zip(risk, risk[1:]))


def test_mann_whitney_u_identity(spark):
    r = _run(spark, "mann_whitney_u_values").collect()[0]
    # U1 + U2 = n1*n2 (2x-scaled columns)
    assert r.u1_2 + r.u2_2 == 2 * r.n1 * r.n2
    assert -1.0 <= r.cliffs_delta <= 1.0


def test_ks_statistic_in_unit_range(spark):
    r = _run(spark, "ks_two_sample_values").collect()[0]
    assert 0 <= r.d_scaled <= r.n1 * r.n2
    assert 0.0 <= r.d_stat <= 1.0


def test_chi2_nonnegative_with_correct_dof(spark):
    r = _run(spark, "chi2_independence_type_dow").collect()[0]
    assert r.chi2 >= 0.0
    assert r.dof == (r.n_types - 1) * (r.n_dow - 1)


def test_neyman_allocations_sum_to_budget(spark):
    rows = _run(spark, "neyman_allocation_sources").collect()
    assert sum(r.alloc for r in rows) == 1000
    # every stratum's integer allocation within 1 of its real quota
    assert all(abs(r.alloc - r.quota) < 1.0 for r in rows)


def test_debounce_totals_reconcile_with_raw_events(spark):
    from celestrak_tle_data_pipeline_spark.sources.tables import load_table

    rows = _run(spark, "debounce_first_per_burst").collect()
    assert rows
    # every burst covers >= 1 event; burst sizes sum to the raw count
    assert all(r.n_suppressed >= 1 for r in rows)
    assert sum(r.n_suppressed for r in rows) == load_table(
        spark, SF_DIR, "events"
    ).count()


def test_hilbert_and_morton_partition_identically_sized_tiles(spark):
    h = {r.tile: r.n_rows for r in _run(spark, "hilbert_curve_layout").collect()}
    m = {r.tile: r.n_rows for r in _run(spark, "zorder_morton_layout").collect()}
    # both curves partition the SAME point set: row totals match; tile
    # occupancy differs by curve and is bounded by the 256-tile grid
    # (sf0.001's 1500 points cannot fill it)
    assert sum(h.values()) == sum(m.values())
    assert 0 < len(h) <= 256 and 0 < len(m) <= 256


def test_cdc_terminal_deletes_absent(spark):
    rows = _run(spark, "cdc_apply_changes").collect()
    assert rows
    assert all(r.last_op in ("I", "U") for r in rows)


def test_theil_sen_pair_counts_are_choose_two(spark):
    rows = _run(spark, "tle_theil_sen_decay").collect()
    assert rows
    # n_pairs <= C(h,2) with h = epochs per satellite (equal-tick pairs
    # are excluded, so <= rather than ==)
    for r in rows:
        assert r.n_pairs >= 1


def test_psi_contributions_sum_to_total(spark):
    rows = _run(spark, "psi_value_drift").collect()
    assert rows
    total = rows[0].psi_total
    assert all(abs(r.psi_total - total) < 1e-12 for r in rows)
    assert abs(sum(r.psi_contribution for r in rows) - total) < 1e-6
    assert total >= 0.0  # PSI is a sum of (p-q)ln(p/q) >= 0 terms
    # shares are distributions
    assert abs(sum(r.p_ref for r in rows) - 1.0) < 1e-6
    assert abs(sum(r.p_cur for r in rows) - 1.0) < 1e-6


def test_hill_alpha_positive_with_k_order_stats(spark):
    r = _run(spark, "hill_tail_exponent").collect()[0]
    # k caps at 100 when there are enough keys; sf0.001 has only 15
    assert 1 <= r.k_order_stats <= 100
    assert r.k_order_stats == min(100, r.n_keys - 1)
    assert r.x_min >= 1
    assert r.hill_alpha > 0


def test_ab_readout_interval_brackets_conversion(spark):
    rows = _run(spark, "ab_experiment_readout").collect()
    assert {r.arm for r in rows} == {0, 1}
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.conversion <= r.wilson_hi <= 1.0
    # both rows carry the same Welch t
    assert rows[0].welch_t == rows[1].welch_t


def test_cuped_variance_reduction_is_squared_correlation(spark):
    r = _run(spark, "cuped_adjusted_ab").collect()[0]
    assert r.n_users == r.n_treat + r.n_ctrl
    # r^2 of (X, Y) lives in [0, 1]
    assert 0.0 <= r.var_reduction <= 1.0
    import math

    assert math.isfinite(r.theta) and math.isfinite(r.adj_diff)


def test_kappa_bounds_and_cell_consistency(spark):
    r = _run(spark, "cohens_kappa_agreement").collect()[0]
    assert r.n_both_pos + r.n_both_neg <= r.n_docs
    assert 0.0 <= r.p_observed <= 1.0
    assert 0.0 < r.p_expected < 1.0
    assert -1.0 <= r.kappa <= 1.0


def test_auc_bounds_and_normalization_identity(spark):
    r = _run(spark, "auc_rank_score").collect()[0]
    assert 0.0 <= r.auc <= 1.0
    assert 0 <= r.auc_num_2x <= 2 * r.n_pos * r.n_neg
    assert abs(r.auc - r.auc_num_2x / (2.0 * r.n_pos * r.n_neg)) < 1e-8


def test_mutual_information_bounded_by_marginal_entropies(spark):
    r = _run(spark, "mutual_information_type_dow").collect()[0]
    # MI >= 0 and MI <= min(H(X), H(Y)); rounding gives 1e-6 slack
    assert r.mi_nats >= -1e-6
    assert r.mi_nats <= min(r.h_type, r.h_dow) + 1e-6
    assert -1e-6 <= r.nmi <= 1.0 + 1e-6


def test_calibration_bins_partition_the_corpus(spark):
    from celestrak_tle_data_pipeline_spark.plans.common import t

    rows = _run(spark, "score_calibration_bins").collect()
    assert [r.bin for r in rows] == sorted(r.bin for r in rows)
    assert all(0 <= r.bin <= 9 for r in rows)
    assert all(r.brier >= 0.0 for r in rows)
    assert all(0.0 <= r.pos_rate <= 1.0 for r in rows)
    total = t(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == total


def test_l_diversity_exposure_within_bounds(spark):
    rows = _run(spark, "l_diversity_audit").collect()
    assert rows
    for r in rows:
        assert r.min_l >= 1
        assert r.n_low_diversity_groups <= r.n_groups
        assert 0.0 <= r.exposed_row_frac <= 1.0


def test_table_digest_is_partitioning_invariant(spark):
    """The certifying property: recompute the same fold over a
    deliberately different partitioning and row order; XOR and the
    modular sum must not move."""
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.plans.common import t

    base = {r.source: r for r in _run(spark, "rowhash_table_digest").collect()}
    d = t(spark, SF_DIR, "documents").repartition(13).sortWithinPartitions(
        F.desc("doc_id")
    )
    v = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("doc_id").cast("string"),
                    "lang",
                    "source",
                    F.col("n_chars").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    alt = (
        d.select("source", v.alias("v"))
        .groupBy("source")
        .agg(
            F.bit_xor("v").alias("x"),
            F.pmod(
                F.sum(F.col("v").cast("decimal(38,0)")),
                F.lit(2305843009213693951).cast("decimal(38,0)"),
            )
            .cast("bigint")
            .alias("s"),
        )
        .collect()
    )
    for r in alt:
        assert base[r.source].digest_xor == r.x
        assert base[r.source].digest_sum_mod == r.s
    for r in base.values():
        assert r.n_distinct_hashes <= r.n_rows
        assert 0 <= r.digest_sum_mod < 2305843009213693951


def test_srm_cohorts_and_overall_consistent(spark):
    rows = {r.cohort: r for r in _run(spark, "srm_guardrail_check").collect()}
    assert "_all" in rows
    for r in rows.values():
        assert r.n_treat >= 0 and r.n_ctrl >= 0
        assert r.chi2_srm >= 0.0
        assert r.srm_flag == (r.chi2_srm > 10.828)
    # any per-type cohort is a subset of the overall population
    overall = rows["_all"].n_treat + rows["_all"].n_ctrl
    for c, r in rows.items():
        if c != "_all":
            assert r.n_treat + r.n_ctrl <= overall
    # Knuth-hash assignment should not trip the strict SRM alarm
    assert not rows["_all"].srm_flag


def test_newcombe_interval_brackets_difference(spark):
    r = _run(spark, "ab_difference_newcombe").collect()[0]
    assert r.diff_lo <= r.diff <= r.diff_hi
    assert abs(r.diff - (r.p_treat - r.p_ctrl)) < 1e-8
    assert r.significant == (not (r.diff_lo <= 0.0 <= r.diff_hi))
    # arm sizes match the ab readout's population
    ab = {x.arm: x for x in _run(spark, "ab_experiment_readout").collect()}
    assert r.n_treat == ab[1].n_users
    assert r.n_ctrl == ab[0].n_users


def test_reach_curve_monotone_and_consistent(spark):
    rows = sorted(
        _run(spark, "cumulative_distinct_users").collect(),
        key=lambda r: r.d,
    )
    assert rows
    cum = 0
    for r in rows:
        cum += r.new_users
        assert r.cum_users == cum
        assert r.new_users <= r.dau  # first-seen users were active
    from celestrak_tle_data_pipeline_spark.plans.common import t

    total_users = (
        t(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert rows[-1].cum_users == total_users
    # day 1: everyone active is new
    assert rows[0].new_users == rows[0].dau


def test_mase_ratio_identity(spark):
    r = _run(spark, "seasonal_naive_mase").collect()[0]
    assert r.n_forecast_days == max(0, r.n_days - 7)
    assert r.mae_seasonal >= 0.0 and r.mae_naive1 > 0.0
    assert abs(r.mase - r.mae_seasonal / r.mae_naive1) < 1e-4


def test_mmr_greedy_structure(spark):
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.plans.common import t

    rows = sorted(
        _run(spark, "mmr_diversified_topk").collect(), key=lambda r: r.rank
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len({r.vec_id for r in rows}) == len(rows)
    assert rows[0].max_sim_q6 == 0
    # rank 1 is the globally most relevant candidate: recompute the
    # exact integer relevance independently
    e = t(spark, SF_DIR, "embeddings")
    q6 = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * 1000000).cast("bigint"),
    )
    vecs = e.select("vec_id", q6.alias("qe"))
    qv = vecs.where(F.col("vec_id") == 0).select(F.col("qe").alias("q"))
    rel = F.aggregate(
        F.zip_with("qe", "q", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    top = (
        vecs.where(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select("vec_id", rel.alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .first()
    )
    assert rows[0].vec_id == top.vec_id
    assert rows[0].rel_q6 == top.rel


def test_bigram_perplexity_dominates_on_seen_text(spark):
    import math

    rows = _run(spark, "bigram_lm_perplexity").collect()
    assert rows
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.cross_entropy > 0.0
        assert abs(r.perplexity - round(math.exp(r.cross_entropy), 6)) < 1e-6
    # interpolated p >= 0.5 * p_bigram and every bigram was seen in
    # training (scored on the training corpus itself), so perplexity
    # is bounded by exp(ln 2 + max entropy) — sanity ceiling: vocab
    from celestrak_tle_data_pipeline_spark.plans.common import t
    from pyspark.sql import functions as F

    v = (
        t(spark, SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .select("tok")
        .distinct()
        .count()
    )
    for r in rows:
        assert r.perplexity <= 2.0 * (v + 1)


def test_join_size_estimator_unbiased_shape(spark):
    r = _run(spark, "join_size_sample_estimate").collect()[0]
    assert r.est_size == r.sample_size * 10
    assert r.within_10pct == (
        abs(r.est_size - r.exact_size) / r.exact_size <= 0.10
    )
    assert r.within_10pct  # key-sampled estimator lands inside 10%
    assert 0 < r.sample_size < r.exact_size


def test_drawdown_bounds(spark):
    rows = _run(spark, "user_value_drawdown").collect()
    assert rows
    saw_positive_dd = False
    for r in rows:
        assert r.max_drawdown >= 0.0
        assert r.n_events >= 1
        if r.max_drawdown > 0.0:
            saw_positive_dd = True
    # the signed series makes drawdown non-degenerate somewhere
    assert saw_positive_dd


def test_qte_consistent_with_median_pivot(spark):
    r = _run(spark, "quantile_treatment_effect").collect()[0]
    assert abs(r.qte_50 - (r.med_treat - r.med_ctrl)) < 1e-9
    ab = {x.arm: x for x in _run(spark, "ab_experiment_readout").collect()}
    assert r.n_treat == ab[1].n_users and r.n_ctrl == ab[0].n_users


def test_rake_phrases_exclude_stopwords(spark):
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.plans.common import t

    rows = _run(spark, "rake_keyphrases").collect()
    assert rows
    top20 = set(
        r.tok
        for r in t(spark, SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(20)
        .collect()
    )
    by_doc = {}
    for r in rows:
        assert 1 <= r.rank <= 3
        assert r.n_words == len(r.phrase.split(" "))
        assert not (set(r.phrase.split(" ")) & top20)
        assert r.score_ppm >= 1000000 * r.n_words  # degree/freq >= 1
        by_doc.setdefault(r.doc_id, []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r.rank)
        scores = [r.score_ppm for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_association_rules_probability_bounds(spark):
    rows = _run(spark, "association_rules_parts").collect()
    assert rows
    for r in rows:
        assert r.pa < r.pb
        assert 2 <= r.c_ab <= min(r.c_a, r.c_b)
        assert 0.0 < r.support <= 1.0
        assert 0.0 < r.confidence <= 1.0
        assert r.lift > 0.0
    counts = [(r.c_ab, r.lift) for r in rows]
    assert counts == sorted(counts, key=lambda x: (-x[0], -x[1]))


def test_centroid_classifier_partitions_and_beats_chance(spark):
    from celestrak_tle_data_pipeline_spark.plans.common import t

    rows = _run(spark, "centroid_classifier_confusion").collect()
    total = sum(r.n_vecs for r in rows)
    n_emb = t(spark, SF_DIR, "embeddings").count()
    assert total == n_emb  # tournament yields exactly one winner each
    labels = {r.label for r in rows}
    diag = sum(r.n_vecs for r in rows if r.label == r.pred_label)
    # nearest-centroid must beat uniform chance on its own training set
    assert diag / total > 1.0 / len(labels)


def test_cem_matching_bounds_and_balance(spark):
    r = _run(spark, "cem_matched_att").collect()[0]
    assert 0 < r.n_matched <= min(r.n_treat, r.n_ctrl)
    assert abs(r.match_rate - r.n_matched / r.n_treat) < 1e-6
    # within-stratum rank pairing keeps pre-period covariates within
    # one stratum width of each other on average
    assert abs(r.mean_covariate_gap) < 50.0


def test_gains_chart_monotone_capture_ending_at_one(spark):
    rows = sorted(
        _run(spark, "gains_chart_deciles").collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    caps = [r.cum_capture for r in rows]
    assert caps == sorted(caps)
    assert abs(caps[-1] - 1.0) < 1e-9
    assert rows[-1].cum_lift == 1.0  # full population has lift 1
    # equi-depth deciles: each holds ~1/10 of the corpus
    total = sum(r.n_docs for r in rows)
    for r in rows:
        assert abs(r.n_docs - total / 10) <= total * 0.05


def test_clamped_balance_reflection_identity(spark):
    """Re-verify the Skorokhod reflection against a direct sequential
    replay of the Lindley recurrence in plain Python."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.plans.common import t

    rows = {r.user_id: r for r in _run(spark, "clamped_running_balance").collect()}
    ev = (
        t(spark, SF_DIR, "events")
        .select(
            "user_id", "ts", "event_id", "event_type",
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .collect()
    )
    series = defaultdict(list)
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        sign = 1 if r.event_type in ("purchase", "signup") else -1
        series[r.user_id].append(sign * r.v)
    for uid, vs in series.items():
        bal, peak, floor_hits = 0, 0, 0
        for v in vs:
            bal = max(0, bal + v)
            peak = max(peak, bal)
            if v < 0 and bal == 0:
                floor_hits += 1
        r = rows[uid]
        assert r.n_events == len(vs)
        assert float(r.peak_balance) == float(peak)
        assert r.n_floor_hits == floor_hits


def test_time_to_convert_ordering_and_rate(spark):
    r = _run(spark, "time_to_convert_quartiles").collect()[0]
    assert 0 < r.n_converted <= r.n_signups
    assert abs(r.conversion_rate - r.n_converted / r.n_signups) < 1e-6
    assert 0.0 <= r.q1_hours <= r.med_hours <= r.q3_hours


def test_anova_sum_of_squares_partition(spark):
    r = _run(spark, "anova_value_by_dow").collect()[0]
    assert r.n_groups == 7
    assert r.ss_between >= 0.0 and r.ss_within >= 0.0
    assert r.f_stat >= 0.0


def test_chi2_residuals_reconstruct_statistic(spark):
    rows = _run(spark, "chi2_cell_residuals").collect()
    chi = _run(spark, "chi2_independence_type_dow").collect()[0]
    assert len(rows) <= chi.n_types * chi.n_dow
    assert sum(r.observed for r in rows) == chi.n_events
    # plain (unadjusted) Pearson residuals squared sum back to chi2
    total = sum(
        (r.observed - r.expected) ** 2 / r.expected for r in rows
    )
    assert abs(total - chi.chi2) < 0.01


def test_clustering_coefficient_consistent_with_triangles(spark):
    rows = _run(spark, "graph_clustering_coefficient").collect()
    assert rows
    for r in rows:
        assert r.degree >= 2
        assert 0 <= r.n_triangles <= r.degree * (r.degree - 1) // 2
        assert 0.0 <= r.lcc <= 1.0
    # per-node triangle incidences sum to 3x the per-segment counts
    seg_tri = {}
    for r in rows:
        seg_tri[r.seg] = seg_tri.get(r.seg, 0) + r.n_triangles
    tri = {
        r.seg: r.n_triangles
        for r in _run(spark, "dup_graph_triangles").collect()
    }
    for seg, n in tri.items():
        assert seg_tri.get(seg, 0) == 3 * n


def test_power_analysis_consistent_with_readout(spark):
    r = _run(spark, "power_analysis_mde").collect()[0]
    assert r.var_value > 0.0
    assert r.mde_abs > 0.0
    assert abs(r.mde_rel - r.mde_abs / r.mean_value) < 1e-6
    assert r.n_per_arm_for_5pct >= 1
    ab = _run(spark, "ab_experiment_readout").collect()
    assert r.n_users == sum(x.n_users for x in ab)


def test_vocab_coverage_monotone(spark):
    rows = sorted(
        _run(spark, "vocab_coverage_curve").collect(),
        key=lambda r: r.vocab_budget,
    )
    assert [r.vocab_budget for r in rows] == [10, 100, 1000]
    covs = [r.coverage for r in rows]
    assert covs == sorted(covs)
    for r in rows:
        assert abs(r.coverage + r.oov_rate - 1.0) < 1e-8
        assert 0.0 < r.coverage <= 1.0
    # budget >= vocabulary means full coverage
    if rows[-1].vocab_budget >= rows[-1].v_size:
        assert rows[-1].coverage == 1.0


def test_entry_exit_matrix_reconciles_with_sessions(spark):
    rows = _run(spark, "session_entry_exit_matrix").collect()
    sessions = _run(spark, "session_windows").collect()
    assert sum(r.n_sessions for r in rows) == len(sessions)
    assert sum(r.n_events for r in rows) == sum(s.n_events for s in sessions)
    for r in rows:
        assert r.n_bounces <= r.n_sessions
        assert r.avg_session_len >= 1.0
        if r.entry_type != r.exit_type:
            assert r.n_bounces == 0  # a bounce enters and exits alike


def test_linear_attribution_conserves_value_approximately(spark):
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.plans.common import t

    rows = _run(spark, "attribution_linear_touch").collect()
    assert {r.touch_type for r in rows} <= {"click", "view"}
    credited = sum(r.credited_value for r in rows)
    # credited value telescopes back to the total value of touched
    # conversions (up to the 1e-6 per-touch rounding)
    e = t(spark, SF_DIR, "events")
    conv = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cid"), "user_id",
        F.col("ts").alias("cts"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    touch = e.where(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("ts").alias("tts")
    )
    touched_total = (
        conv.join(
            touch,
            (conv.user_id == touch.user_id)
            & (F.col("tts") <= F.col("cts"))
            & (
                F.unix_micros("tts")
                > F.unix_micros("cts") - 7 * 86_400 * 1_000_000
            ),
        )
        .select("cid", "v")
        .distinct()
        .agg(F.sum("v"))
        .collect()[0][0]
    )
    n_touches = sum(r.n_credited_touches for r in rows)
    assert abs(credited - float(touched_total)) <= n_touches * 1e-6


def test_elasticity_r2_bounds(spark):
    rows = _run(spark, "discount_quantity_elasticity").collect()
    assert rows
    for r in rows:
        assert r.n_lines > 2
        assert 0.0 <= r.r2 <= 1.0
        import math

        assert math.isfinite(r.slope) and math.isfinite(r.intercept)


def test_holt_replays_the_recurrence(spark):
    rows = sorted(
        _run(spark, "holt_linear_forecast").collect(), key=lambda r: r.d
    )
    assert rows
    assert rows[0].one_step_forecast is None
    assert rows[0].trend == 0.0 and rows[0].level == rows[0].y
    # replay the recurrence in pure python; level/trend must agree to
    # rounding tolerance
    l, b = rows[0].y, 0.0
    for r in rows[1:]:
        assert abs(r.one_step_forecast - (l + b)) < 1e-5
        l_new = 0.5 * r.y + 0.5 * (l + b)
        b = 0.5 * (l_new - l) + 0.5 * b
        l = l_new
        assert abs(r.level - l) < 1e-5
        assert abs(r.trend - b) < 1e-5


def test_weighted_quantiles_ordered_and_weight_dominates(spark):
    rows = _run(spark, "weighted_price_quantiles").collect()
    assert rows
    for r in rows:
        assert r.total_weight > r.n_lines  # quantities exceed 1
        assert r.wq25 <= r.wmedian <= r.wq75
    # weighted median differs from the unweighted one somewhere
    # (otherwise the frequency argument certifies nothing)
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.plans.common import t

    unw = {
        x.l_returnflag: x.m
        for x in t(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.median("l_extendedprice").alias("m"))
        .collect()
    }
    assert any(abs(unw[r.l_returnflag] - r.wmedian) > 1e-9 for r in rows)


def test_interleave_schedule_bresenham_fairness(spark):
    rows = _run(spark, "mixture_interleave_schedule").collect()
    assert rows
    assert sum(r.n_steps for r in rows) == 1000
    for r in rows:
        # Bresenham bound: achieved steps within 1 of the exact quota
        assert abs(r.n_steps - 1000 * r.target_share) <= 1.0 + 1e-6
        # even spacing: largest gap can't exceed ceil(1/share) + 1
        import math

        if r.target_share > 0:
            assert r.max_gap is None or r.max_gap <= math.ceil(
                1.0 / r.target_share
            ) + 1


def test_backlog_sweep_telescopes_and_stays_nonnegative(spark):
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.plans.common import t

    rows = sorted(
        _run(spark, "open_order_backlog_sweep").collect(),
        key=lambda r: r.d,
    )
    assert rows
    run = 0
    for r in rows:
        run += r.n_opened - r.n_closed
        assert r.backlog == run
        assert r.backlog >= 0  # an order closes only after it opened
    assert rows[-1].backlog == 0  # every order eventually ships
    # total opened equals the number of orders with lineitems
    o = t(spark, SF_DIR, "orders")
    l = t(spark, SF_DIR, "lineitem")
    n_orders = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select("o_orderkey")
        .distinct()
        .count()
    )
    assert sum(r.n_opened for r in rows) == n_orders


def test_sla_tiers_are_nested(spark):
    rows = _run(spark, "shipping_sla_attainment").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_within_30d <= r.n_within_60d <= r.n_within_90d
        assert r.n_within_90d <= r.n_lines
        assert 0.0 <= r.sla_30d <= r.sla_90d <= 1.0
        assert r.worst_lag_days >= 0
