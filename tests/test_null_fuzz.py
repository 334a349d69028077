"""Dirty-data parity: the oracle sweep re-run on a NULL-injected
copy of the tables.

100 TB corpora contain NULLs; clean synthetic data masks divergent
NULL semantics between engines (DuckDB concat() skips NULLs where
Spark propagates, NULLS FIRST/LAST tie-ordering, concat_ws silently
NULL→''-ing dedup keys, UDFs crashing on None payloads). Each query
below failed the first NULL-fuzz sweep and was fixed by DECLARING a
NULL semantic on both engine sides; this test pins those semantics
against a deterministic ~5% NULL injection.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from hls_stac_parquet_spark.testing import check_query
from tests.conftest import SF0001

# every query that failed the first NULL-fuzz sweep (see
# ROUND3_NOTES.md), plus exact dedup as the NULL-key control
FUZZ_QUERIES = [
    "q_dedup_incremental",
    "q_doc_repetition",
    "q_interval_overlap_join",
    "q_lang_id_trigram",
    "q_patchify_images",
    "q_pcm_audio_pipeline",
    "q_resize_raw_images",
    "q_simhash_dedup",
    "q_spectrogram_features",
    "q_string_funcs",
    "q_train_test_split",
    "q_variant_json",
    "q_video_frame_sample",
    "q_dedup_exact",
    # fourth-session additions touching fuzzed columns
    "q_psi_drift",
    "q_seasonal_decompose",
    "q_ndcg",
    "q_dedup_clusters_incremental",
    "q_theil_sen",
    # sixth-session additions
    "q_perplexity_filter",
    "q_distinct_ngrams",
    "q_pr_curve",
    "q_jpeg_decode_stats",
    "q_gif_frame_pipeline",
    # round-4 additions touching fuzzed columns (text → coalesce(''),
    # value → NULL-tolerant open/close picks)
    "q_token_fertility",
    "q_ohlc_bars",
    # round-5 additions touching fuzzed columns (value → NULL excluded
    # by the finite() measurement semantic on both engines; text →
    # NULL docs drop out of the postings identically)
    "q_isotonic_calibration",
    "q_greedy_max_cover",
    # round-6: the KEY-fuzz class (NULL ts / user_id, including one
    # user whose EVERY ts is NULL — the round-5 driver-red signature).
    # Spark orders NULL ts FIRST ascending, DuckDB LAST; every query
    # below either declares "NULL time/key rows are excluded" on both
    # engines or pins NULLS placement on both sides.
    "q_cumulative_distinct",
    "q_kaplan_meier",
    "q_markov_transitions",
    "q_moving_avg",
    "q_rolling_corr",
    "q_scd2_intervals",
    # q_session_paths covers BOTH fuzz axes (NULL ts/user_id here and
    # the sweep-2 NULL event_type axis) — listed once, not per sweep
    "q_session_paths",
    "q_session_window_agg",
    "q_stickiness",
    "q_seasonal_decompose",
    "q_cusum_changepoint",
    "q_dp_counts",
    "q_asof_join",
    "q_asof_nearest",
    "q_attribution",
    "q_autocorr_lag1",
    "q_bradley_terry",
    "q_dedup_time_window",
    "q_ema",
    "q_ewma",
    "q_fk_discovery",
    "q_gap_fill_locf",
    "q_hopping_window",
    "q_interval_overlap_join",
    "q_sort_global",
    "q_window_analytic",
    "q_sessionize",
    "q_tumbling_window_agg",
    # round-6 additions touching fuzzed columns (value → finite()
    # declared on both engines)
    "q_conformal_threshold",
    "q_ece_calibration",
    # round-6 sweep 2 (NULL event_type / source axes): untyped events
    # contribute no path step; unattributed docs are excluded from
    # source-keyed selection/budget/URL derivation on BOTH engines
    "q_dsir_resample",
    "q_token_budget_mix",
    "q_url_canonical_dedup",
    # round-6 late additions (source/user_id-keyed from birth)
    "q_kl_source_divergence",
    "q_propensity_ipw",
    # round-7 additions: every new operator declares its NULL/finite
    # semantics at birth (excluded keys/measurements on BOTH engines)
    "q_mann_whitney",
    "q_diff_in_diff",
    "q_hill_tail_index",
    "q_mutual_info",
    "q_ngram_entropy_rate",
    "q_minhash_portable",
    "q_wilson_ci",
    "q_cramers_v",
    "q_burstiness",
    "q_keyness_loglr",
    "q_interpolate_linear",
    "q_emd_1d",
    "q_abtest_power",
    "q_crossentropy_matrix",
    "q_spearman_rho",
    "q_theil_index",
    "q_cohens_d",
    "q_lift_curve",
    "q_cohen_kappa",
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nullfuzz"))
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT doc_id,
          CASE WHEN doc_id % 19 = 3 THEN NULL ELSE text END AS text,
          CASE WHEN doc_id % 23 = 5 THEN NULL ELSE lang END AS lang,
          CASE WHEN doc_id % 41 = 6 THEN NULL ELSE source END AS source,
          n_chars
         FROM read_parquet('{SF0001}/documents.parquet'))
        TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    # KEY fuzz (round 6): ~6% NULL ts, ~3% NULL user_id, AND one user
    # (14, the most active) whose EVERY ts is NULL — per-row injection
    # alone does NOT reproduce the round-5 driver reds; the all-NULL-
    # per-key entity is what flips a window's cumulative frame
    con.execute(f"""
        COPY (SELECT event_id,
          CASE WHEN user_id = 14 OR event_id % 17 = 4 THEN NULL ELSE ts
            END AS ts,
          CASE WHEN event_id % 29 = 11 THEN NULL ELSE user_id END AS user_id,
          CASE WHEN event_id % 37 = 5 THEN NULL ELSE event_type END
            AS event_type,
          CASE WHEN event_id % 17 = 2 THEN NULL ELSE value END AS value,
          CASE WHEN event_id % 13 = 7 THEN NULL ELSE props END AS props
         FROM read_parquet('{SF0001}/events.parquet'))
        TO '{out}/events.parquet' (FORMAT PARQUET)""")
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "embeddings"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF0001}/{tbl}.parquet')) "
            f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    return out


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_parity_on_null_fuzzed_data(spark, fuzz_dir, name):
    r = check_query(spark, fuzz_dir, name)
    assert r.match, f"{name}: {r.detail}"


def test_fuzz_dir_actually_has_nulls(fuzz_dir):
    con = duckdb.connect()
    n_text, n_lang = con.execute(
        "SELECT count(*) FILTER (WHERE text IS NULL), "
        "count(*) FILTER (WHERE lang IS NULL) "
        f"FROM read_parquet('{fuzz_dir}/documents.parquet')"
    ).fetchone()
    n_val, n_props, n_ts, n_uid = con.execute(
        "SELECT count(*) FILTER (WHERE value IS NULL), "
        "count(*) FILTER (WHERE props IS NULL), "
        "count(*) FILTER (WHERE ts IS NULL), "
        "count(*) FILTER (WHERE user_id IS NULL) "
        f"FROM read_parquet('{fuzz_dir}/events.parquet')"
    ).fetchone()
    assert min(n_text, n_lang, n_val, n_props, n_ts, n_uid) > 0
    # the all-NULL-ts entity must exist — the per-row injection alone
    # missed the round-5 driver-red class
    n_all_null = con.execute(
        "SELECT count(*) FROM ("
        "  SELECT user_id FROM read_parquet(?) WHERE user_id IS NOT NULL "
        "  GROUP BY user_id HAVING count(ts) = 0 AND count(*) > 0)",
        [f"{fuzz_dir}/events.parquet"],
    ).fetchone()[0]
    assert n_all_null >= 1


# ---- empty-table robustness --------------------------------------------
# Empty partitions/tables are routine at scale (a fresh day partition, a
# filter that matches nothing). First sweep found np.stack([]) crashes in
# every embedding operator; now guarded. Three DECLARED divergences stay:
# q_cube / q_grouping_sets (ANSI says the () grouping set emits one
# grand-total row over empty input — DuckDB does, Spark's rollup/cube
# emit zero rows) and q_logreg_train (training on an empty corpus raises
# an explicit, named error rather than returning junk weights).

EMPTY_OK_QUERIES = [
    "q_cosine_pairs",
    "q_cosine_topk",
    "q_embedding_dedup",
    "q_label_propagation",
    "q_semantic_dedup_blocked",
    "q_ann_ivf",
    "q_ann_lsh",
    "q_pq_ann",
    "q_minhash_dedup",
    "q_dedup_exact",
    "q_hash_agg",
    "q_topk",
    # third-session additions — every new operator must no-op cleanly
    "q_weighted_sample_topk",
    "q_kcore",
    "q_kmeans_clusters",
    "q_dbscan",
    "q_image_dhash_dedup",
    "q_audio_fingerprint_dedup",
    "q_rrf_fusion",
    "q_random_projection",
    "q_itemsets_3",
    "q_funnel_windowed",
    "q_attribution",
    "q_not_in_nulls",
    "q_ema",
    "q_bootstrap_ci",
    "q_keywords_rake",
    "q_session_paths",
    "q_reservoir_per_group",
    "q_dedup_recall_eval",
    "q_fk_discovery",
    "q_source_overlap",
    # fourth-session additions — every new operator must no-op cleanly
    "q_psi_drift",
    "q_seasonal_decompose",
    "q_item_item_cf",
    "q_sssp_weighted",
    "q_er_sorted_neighborhood",
    "q_geo_radius_join",
    "q_knn_classifier",
    "q_ndcg",
    "q_global_quantiles",
    "q_dedup_clusters_incremental",
    "q_textrank",
    "q_cusum_changepoint",
    "q_theil_sen",
    "q_golden_record",
    # fifth-session: queries rewritten onto the global-order kernel
    # (operators/ranking.py) — range shuffle + offsets must no-op
    "q_pack_sequences",
    "q_ks_drift",
    "q_vocab_growth",
    "q_zipf_slope",
    "q_auc",
    "q_sort_global",
    "q_shuffle_order",
    "q_rfm_segments",
    "q_skyline",
    "q_dsir_resample",
    "q_boilerplate_removal",
    "q_token_budget_mix",
    "q_split_leakage",
    "q_png_decode_stats",
    "q_wav_decode_pipeline",
    # sixth-session additions
    "q_perplexity_filter",
    "q_distinct_ngrams",
    "q_pr_curve",
    "q_jpeg_decode_stats",
    "q_gif_frame_pipeline",
    "q_int8_quantize",
    # round-5 additions — every new operator must no-op cleanly
    "q_mmr_diversify",
    "q_isotonic_calibration",
    "q_holt_winters",
    "q_greedy_max_cover",
    # round-6 additions — every new operator must no-op cleanly
    "q_hits",
    "q_adamic_adar",
    "q_conformal_threshold",
    "q_ece_calibration",
    "q_kl_source_divergence",
    "q_propensity_ipw",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("emptytables"))
    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF0001}/{tbl}.parquet') "
            f"WHERE 1=0) TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    return out


@pytest.mark.parametrize("name", EMPTY_OK_QUERIES)
def test_parity_on_empty_tables(spark, empty_dir, name):
    r = check_query(spark, empty_dir, name)
    assert r.match, f"{name}: {r.detail}"


def test_logreg_train_raises_named_error_on_empty(spark, empty_dir):
    from hls_stac_parquet_spark.queries import REGISTRY

    with pytest.raises(Exception, match="empty input"):
        REGISTRY["q_logreg_train"].fn(spark, empty_dir).collect()


def test_psi_drift_empty_reference_window(spark, tmp_path):
    """PSI with an EMPTY reference sample (all events after day 15):
    bins are undefined without reference deciles — both engines must
    emit the 10 zero-count bin rows rather than Spark silently binning
    current rows to 0 while DuckDB bins them to NULL."""
    import duckdb

    out = str(tmp_path / "lateonly")
    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SF0001}/events.parquet') "
        f"WHERE extract(day FROM ts) > 15) "
        f"TO '{out}/events.parquet' (FORMAT PARQUET)"
    )
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "documents", "embeddings"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF0001}/{tbl}.parquet')) "
            f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    r = check_query(spark, out, "q_psi_drift")
    assert r.match, r
    assert r.spark_rows == 10
