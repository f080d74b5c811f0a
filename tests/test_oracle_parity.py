"""Mimics the driver's correctness gate: run each queries() entry at
sf0.01 and compare against its oracle_sql() via DuckDB — row count,
column names and order-insensitive values."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _to_pandas(res):
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = [
    "lang_counts", "frame_counts", "median_nchars_by_lang", "events_hourly",
    "exact_dedup", "distinct_text_per_lang", "token_counts", "quality_scores",
    "doc_fingerprint", "heavy_tokens_topk", "ann_topk", "user_event_counts",
    "top_users_by_events", "event_type_daily",
    # round-2 additions
    "lineitem_pricing_summary", "orders_per_nation", "top_parts_by_revenue",
    "events_sessionize", "paired_join", "bpe_token_counts",
    "ann_topk_multi", "deterministic_sample", "events_asof_join",
    "top_docs_per_lang",
    # round-3 additions
    "deterministic_sample_hash", "minhash_dedup_kept",
    "ngram_jaccard_pairs", "token_rarity_scores",
    "events_sliding_window", "stratified_sample", "user_event_counts_salted",
    "spaced_seed_distinct_exact", "pack_documents",
    "repetition_stats", "decontaminate", "repeated_substrings",
    "pii_redact", "gopher_quality_flags", "remove_boilerplate_ngrams",
    "bigram_lm_scores", "chunk_documents", "tfidf_top_terms",
    "bigram_ppl_buckets", "dup_clusters", "source_stats",
    "source_quality_gate", "token_freq_histogram", "inverted_index",
    "bm25_topk", "source_mix_sample", "lang_centroids",
    "epoch_shuffle_head", "clean_corpus", "curation_funnel",
    "curation_funnel_by_source", "contamination_topk",
    "dup_group_size_histogram", "curation_partition_metrics",
    "source_overlap",
    "quality_weighted_sample", "ann_topk_filtered", "token_entropy",
    "corpus_report", "events_range_join",
    # round-4 additions
    "epoch_shuffle_full", "ann_ivf_exact",
    "events_props_stats", "top_bigrams_per_lang", "nchars_rank_in_source",
    "jsonl_roundtrip_lang_counts", "csv_roundtrip_event_counts",
    "windowed_distinct_users", "segment_revenue_topk", "nb_class_scores",
    "user_event_pivot", "token_drift_topk",
    "latest_event_per_user_type", "events_hourly_anomaly",
    "docs_rollup_cube", "nchars_ntile_buckets",
    "customers_without_orders", "region_revenue",
    "orders_priority_semijoin",
    "event_transitions", "event_type_daily_ma7", "funnel_conversion",
    "acctbal_percentiles_per_nation", "shard_assignment_counts",
    "partitioned_roundtrip_source_counts",
    "nation_monthly_revenue_delta", "nation_balance_union",
    "brand_distinct_sizes",
    "revenue_pareto_nations", "source_lang_entropy",
    "top_suppliers_by_quantity",
    "value_decile_stats", "top_size_modes_per_brand",
    "parts_above_type_avg",
    "event_user_setops", "type_day_dense_counts", "lineitem_corr_stats",
    "snapshot_user_diff", "max_concurrent_sessions", "pmi_top_bigrams",
    "doc_length_gini", "cross_lang_dup_matrix", "nchars_cume_dist",
    "cohort_retention", "source_lang_chi2", "name_typo_pairs",
    "orders_profile", "orders_quality_checks", "acctbal_robust_stats",
    "mg_heavy_tokens", "diversified_top_docs", "event_decayed_counts",
    "latest_events_per_user", "event_gap_quantiles",
    "rrf_hybrid_topk", "grouped_split_counts",
    "user_bfs_hops", "top_session_journeys",
    "weighted_sample_topk", "event_value_ffill_hourly",
    "zorder_bucket_counts", "funnel_latency_quantiles",
    "nchars_robust_outliers", "source_dup_report",
    "returning_users_daily", "video_frame_features",
    "nation_trade_volume", "promo_revenue_share",
    "top_returned_customers", "user_pagerank", "user_triangle_stats",
    "table_fingerprint", "term_overlap_topk", "readability_scores",
    "charclass_stats", "range_shard_bounds", "cusum_changepoints",
    "hour_of_day_profile", "supplier_part_coverage", "join_size_exact",
    "user_activity_streaks", "order_fill_rate",
    "value_benford_deviation", "weekly_distinct_users",
    "byte_median_doc_size", "multi_predicate_revenue",
    "copurchase_type_pairs", "ngram_containment_pairs",
    "source_exclusive_tokens", "fk_orphan_counts",
    "nchars_histogram_log2", "customer_order_distribution",
    "cold_customers_by_nation", "bloom_prune_join_revenue",
    "session_overlap_pairs", "rolling_median_daily_revenue",
    "late_sole_supplier_counts", "kmv_distinct_userdays",
    "part_skyline", "large_quantity_orders",
    "kmv_type_jaccard", "repeat_purchase_pairs",
    "strict_funnel_users", "lang_bigram_jsd",
    "local_supplier_revenue", "cheapest_shipper_per_brand",
    "grouped_higher_moments", "sliding_distinct_users",
    "full_quarter_customers", "exact_median_bisect",
    "clean_conversion_users", "acctbal_cont_quantiles",
    "value_ks_matrix", "acctbal_trimmed_stats",
    "transition_cond_entropy", "region_share_rollup",
    "order_price_reconciliation", "daily_revenue_haar",
    "value_drift_by_half", "top_value_days_with_ties",
    "type_user_overlap_exact", "view_attribution_credit",
    "acctbal_mean_family", "discounted_smallqty_revenue",
    "late_line_orders_by_priority", "smallqty_brand_revenue",
    "nation_market_share", "top_supplier_revenue_with_ties",
    "late_urgent_mix_by_status", "daily_revenue_autocorr",
    "transition_reciprocity", "supplier_hhi_by_nation",
    "dominant_supplier_parts", "parts_keyset_page",
    "cumulative_parts_catalog", "prefix_dup_groups",
    "token_len_histogram", "vocab_growth_by_docs",
    "fd_violation_audit", "bipartite_degree_dist",
    "revenue_up_run_lengths", "weekday_uniformity_chi2",
    "value_twap_by_type", "revenue_seasonal_decomposition",
    "nation_year_profit", "incremental_dedup_report",
    "lang_temperature_mix", "segment_unshipped_topk",
    "state_dwell_times", "weighted_median_quantity",
    "vocab_coverage_topp", "order_fulfillment_latency",
    "rfm_segments", "knn_label_accuracy",
    "customer_value_migration", "dup_cluster_representatives",
    "sample_budget_allocation", "nation_whale_share",
    "session_bounce_rate", "quality_gate_sweep",
    "user_tenure_distribution", "order_size_distribution",
    "curation_run_summary", "label_centroid_affinity",
    "supplier_rank_correlation",
    # round-5: TPC-H Q11 over the key-derived partsupp; the curation
    # runner with the MinHash near-dup stage
    "q11_important_stock", "curation_neardup_summary",
]

#: slots 1-7 of the registry: the namesake sketch family (no SQL
#: oracle can express them — the driver records its rows-only check;
#: value correctness is pinned by golden/bound/parity tests)
SKETCH_FAMILY_SLOTS = [
    "categorize_summary", "mibf_classify", "bloom_build_info",
    "bloom_fpr_report", "hll_error_sweep", "cms_error_sweep",
    "quantile_sketch_calibration",
]


def test_every_oracle_is_tested(entrymod):
    """The parametrized list must not silently lag oracle_sql()."""
    assert set(entrymod.oracle_sql()) == set(SQL_CHECKED)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_parity(entrymod, con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = _canon(_to_pandas(q(SF_DIR)))
    want = _canon(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            assert np.allclose(g.astype(float), w.astype(float),
                               rtol=0, atol=0), f"{name}.{c}"
        else:
            assert (g.to_numpy() == w.to_numpy()).all(), f"{name}.{c}"


def test_rows_only_queries_run(entrymod):
    qs = entrymod.queries()
    oracles = set(entrymod.oracle_sql())
    for name, fn in qs.items():
        if name in oracles:
            continue
        res = _to_pandas(fn(SF_DIR))
        assert res is not None
        assert len(res.columns) > 0


def test_entry_smoke(entrymod):
    out = entrymod.entry()
    df = _to_pandas(out)
    assert len(df) >= 0
    assert "filter_id" in df.columns


def test_top50_registry_slots_contract(entrymod):
    """The driver records CORRECTNESS rows for ~the first 50 registry
    entries only.  Round-5 ordering contract (queries() docstring,
    VERDICT r4 #5): slots 1-7 are the namesake sketch family (driver
    rows-only check; pytest golden/bound oracles), slots 8-50 are all
    DuckDB-oracled."""
    names = list(entrymod.queries())
    oracled = set(entrymod.oracle_sql())
    assert names[:7] == SKETCH_FAMILY_SLOTS
    not_oracled = [n for n in names[7:50] if n not in oracled]
    assert not_oracled == []
    # and every oracled query is exercised by this test module
    assert set(SQL_CHECKED) == oracled


def test_bench_query_list_subset_of_registry(entrymod):
    import bench

    names = set(entrymod.queries())
    missing = [q for q in bench.QUERIES if q not in names]
    assert missing == []
