"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in diive_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the raw->1m->1h->1d
    rollup cascade over the events table via the single-exchange fused
    plan (diive_ray/pipelines/rollup.py:cascade_fused), returning the
    1h tier."""
    from diive_ray.pipelines.rollup import events_cascade_fused

    fused = events_cascade_fused("/root/testdata/sf0.001")
    return fused.filter(expr="tier == '1h'").drop_columns(["tier", "n_child"])


# Queries the driver already recorded green in CORRECTNESS_r01/r02/r03.
# Rotation (VERDICT r2 #2): a driver that bounds recorded rows (~50)
# should spend them on oracle queries it has NOT yet recorded, so those
# come first, then the previously-recorded oracle set, then rows-only.
# wind_rotation was recorded in r03 but hash-failed there (fixed in r4:
# order-canonical window means + -0.0 normalization on both sides) and
# re-recorded green in r04.
#
# Round 5 (VERDICT r4 #4): the queries RE-PLUMBED this round — per-user
# analytics de-drivered to bounded cell tables, funnels vectorized with
# merge_asof, percentiles101 moved to the streaming quantile machinery,
# the late-merge path hardened — are force-ranked FIRST so their fixes
# get driver-recorded in CORRECTNESS_r05.
_RERECORD_FIRST = (
    "kaplan_meier", "logrank_test", "eb_shrinkage", "cohort_ltv",
    "new_vs_returning", "growth_accounting", "window_funnel",
    "funnel_latency", "shapley_attribution", "mcnemar_test",
    "percentiles101", "rollup_late_merge",
)

_R3_RECORDED = frozenset({
    "asof_join_hourly", "binary_extract", "compound_extremes",
    "cusum_drift", "doc_bm25_topk", "doc_dedup_normalized", "doc_dsir",
    "doc_global_shuffle", "doc_lm_perplexity", "doc_normalize",
    "doc_sample_hash", "doc_segment_dedup", "doc_word_freqs",
    "doy_cumulative", "eddypro_flag_battery", "eddypro_meteo_format",
    "embedding_knn_ivf_exact", "embedding_semdedup", "event_funnel",
    "event_transitions", "file_split_stats", "flux_detection_limit",
    "flux_randunc", "fluxnet_format", "freq_groups", "gapfill_scores",
    "granger_lag1_f", "harmonic_k1_fit", "hq_flux", "jsonl_ingest",
    "lagged_variants", "lof_scores", "max_covariance", "potrad_eot",
    "profile", "rank_drivers", "series_features", "sessionize",
    "stratified_analysis", "thermo_battery", "time_since",
    "timelag_analysis", "timestamp_conventions", "tokens_vocab_hist",
    "trim_frame", "variable_classify", "winddir_agg", "winsorize",
    "xcorr_lag_scan",
})

_R4_RECORDED = frozenset({
    "ale2d_fixed_grid", "ale_fixed_grid", "bin_fitter", "breusch_pagan",
    "chow_test", "cointegration_eg", "combine_variables", "csv_ingest",
    "dispersion_test", "doc_chunk", "doc_decontaminate", "doc_dup_spans",
    "doc_exact_dedup", "doc_fingerprint", "doc_heavy_hitters",
    "doc_jaccard_blocked", "doc_minhash_dedup", "doc_minhash_dups",
    "doc_pack_sequences", "doc_pii", "doc_repetition", "doc_source_mix",
    "doc_tfidf_top", "effective_sample_size", "embedding_kmeans",
    "embedding_near_dup", "embedding_topk", "file_inventory",
    "flux_chain_scores", "friedman_test", "haar_energy", "jarque_bera",
    "kendall_tau", "kruskal_wallis", "levene", "mann_whitney",
    "manual_removal", "media_decode", "range_join",
    "regression_diagnostics", "rh_offset", "sliding_window",
    "source_ks_drift", "source_vocab_divergence", "spearman_corr",
    "tail_dependence", "tpch_q3_topk", "variogram", "vpd",
    "wind_rotation",
})

_DRIVER_RECORDED = _R3_RECORDED | _R4_RECORDED | frozenset({
    "abs_limits", "bootstrap_ci", "counter_rate", "daily_correlation",
    "day_mean_as_hires", "daynight_flag", "dedup_keep_last", "diel_cycle",
    "diel_cycle_monthly", "doc_langid", "doc_quality", "doc_token_count",
    "eddypro_flags", "eddypro_vm97", "embedding_knn_lsh", "event_flag",
    "feature_engineer", "flux_chain", "freq_detect", "gap_stats_1h",
    "gap_table_1h", "gapfill_linear_1h", "grid_agg", "hampel_noniter",
    "harmonic_decompose", "histogram", "keep_daterange", "lineitem_agg",
    "lineitem_filter_project", "localsd", "localsd_noniter", "lof_outliers",
    "m4_downsample", "mds_fill", "monthly_matrix", "monthly_ranks",
    "optimum_range", "percentiles101", "qcf", "resample_1d",
    "resample_1d_mincount", "resample_1h", "retention_sweep",
    "ridge_gapfill", "screening_chain", "selfheating_sf",
    "set_exact_missing", "setto_threshold", "setto_value_range",
    "similarity_fill_1h", "sstats", "time_features", "tokens_rollup_1h",
    "tokens_rollup_tiny", "tokens_verify_tiny", "trimlow", "ustar_mpt",
    "ustar_vekuri", "zscore_daynight", "zscore_increments",
    "zscore_increments_noniter", "zscore_outliers", "zscore_rolling",
    "zscore_rolling_noniter",
})


# Queries that already existed at the end of round 2: every oracle-bearing
# one was verified there (50 driver rows + the judge's independent re-run of
# the remaining 48). Round-3 additions have no such record yet, so they
# outrank these in the driver's bounded recording budget.
_R2_ERA = frozenset({
    "abs_limits", "ale2d_fixed_grid", "ale_fixed_grid", "ale_response",
    "asof_join_hourly", "bin_fitter", "bootstrap_ci", "combine_variables",
    "compound_extremes", "counter_rate", "csv_ingest", "daily_correlation",
    "day_mean_as_hires", "daynight_flag", "dedup_keep_last", "diel_cycle",
    "diel_cycle_monthly", "doc_chunk", "doc_decontaminate", "doc_dup_spans",
    "doc_exact_dedup", "doc_fingerprint", "doc_heavy_hitters",
    "doc_jaccard_blocked", "doc_langid", "doc_minhash_dedup",
    "doc_minhash_dups", "doc_pack_sequences", "doc_pii", "doc_quality",
    "doc_repetition", "doc_simhash_dups", "doc_simhash_weighted",
    "doc_source_mix", "doc_tfidf_top", "doc_token_count", "driver_importance",
    "eddypro_flags", "eddypro_vm97", "embedding_kmeans", "embedding_knn_ivf",
    "embedding_knn_ivf_exact", "embedding_knn_lsh", "embedding_knn_pq",
    "embedding_near_dup", "embedding_topk", "event_flag", "feature_engineer",
    "flux_chain", "flux_randunc", "freq_detect", "gap_stats_1h",
    "gap_table_1h", "gapfill_linear_1h", "granger", "granger_lag1_f",
    "grid_agg", "hampel_noniter", "harmonic_decompose", "harmonic_k1_fit",
    "histogram", "keep_daterange", "lineitem_agg", "lineitem_filter_project",
    "localsd", "localsd_noniter", "lof_outliers", "lof_scores",
    "m4_downsample", "manual_removal", "max_covariance", "mds_fill",
    "media_decode", "monthly_matrix", "monthly_ranks", "nee_partition_dt",
    "nee_partition_nt", "optimum_range", "percentiles101", "profile", "qcf",
    "range_join", "resample_1d", "resample_1d_mincount", "resample_1h",
    "retention_sweep", "rh_offset", "ridge_gapfill", "screening_chain",
    "selfheating_sf", "sessionize", "set_exact_missing", "setto_threshold",
    "setto_value_range", "similarity_fill_1h", "sliding_window",
    "source_ks_drift", "source_vocab_divergence", "sstats", "stl_decompose",
    "stratified_analysis", "swin_gapfill", "time_features", "time_since",
    "timestamp_shifts", "tokens_rollup_1h", "tokens_rollup_tiny",
    "tokens_verify_tiny", "tree_gapfill", "trimlow", "ustar_mpt",
    "ustar_vekuri", "vpd", "wind_rotation", "xcorr_lag_scan",
    "zscore_daynight", "zscore_increments", "zscore_increments_noniter",
    "zscore_outliers", "zscore_rolling", "zscore_rolling_noniter"
})


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.
    See diive_ray/pipelines/queries.py. Order: oracle-bearing queries
    the driver has not yet recorded FIRST, then oracle queries already
    green in CORRECTNESS_r01/r02, then rows-only entries — so a driver
    that bounds the number of recorded rows (~50) extends coverage each
    round instead of re-recording the same set."""
    from diive_ray.pipelines.queries import ORACLE, QUERIES

    ordered = {k: QUERIES[k] for k in _RERECORD_FIRST if k in QUERIES}
    # VERDICT r3 #6: the ~30 r2-era oracle queries that are judge-green
    # but have never had a driver-recorded row come before this round's
    # brand-new additions, so CORRECTNESS_r04 closes that gap first.
    ordered.update({
        k: v for k, v in QUERIES.items()
        if k in ORACLE and k not in _DRIVER_RECORDED and k in _R2_ERA
    })
    ordered.update({
        k: v for k, v in QUERIES.items()
        if k in ORACLE and k not in _DRIVER_RECORDED and k not in _R2_ERA
    })
    ordered.update(
        {k: v for k, v in QUERIES.items() if k in ORACLE and k in _DRIVER_RECORDED}
    )
    ordered.update({k: v for k, v in QUERIES.items() if k not in ORACLE})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for ops whose
    semantics are not SQL-expressible -> driver records rows-only)."""
    from diive_ray.pipelines.queries import ORACLE

    return dict(ORACLE)
