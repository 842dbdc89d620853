"""Empty-input robustness: every operator family must degrade to an
empty (or zero-valued) result on zero-row tables, never crash. The
fixture preserves the testdata's exact parquet physical types
(events' ts is timestamp[us] in the current vintage) via pyarrow, so
the loaders' type handling is exercised too. Caught live: the
similarity top-k family crashed in numpy on an empty query batch
(1-D empty matrix).
"""

from __future__ import annotations

import pytest

from etl_sales_pandas_sqlserver_spark.plans.testdata_queries import QUERIES

_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

#: one representative per family, plus the similarity quartet that
#: crashed before the guards
_REPRESENTATIVES = [
    "clean_valid_sales",
    "tpch_q1_pricing_summary",
    "window_top_orders_per_customer",
    "merge_upsert_orders",
    "scd2_customer_versions",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_decontaminate",
    "text_token_stats",
    "similarity_topk_exact",
    "similarity_topk_ann",
    "similarity_topk_ivf",
    "similarity_topk_ann_indexed",
    "multimodal_binary_features",
    "stream_hourly_agg",
    # round-5 additions
    "dedup_decontaminate_bloom",
    "corpus_curation_pipeline",
    "source_quota_cap",
    "similarity_ann_recall_contract",
    # round-6: the partsupp-derived TPC-H family
    "tpch_q9_product_profit",
    "tpch_q20_excess_stock",
    # round-6: bucketed join, distributed global index, winnowing
    "bucketed_join_order_revenue",
    "training_order_global_index",
    "text_winnow_fingerprints",
    "text_docfreq_quality",
    "stream_session_window_native",
    "dedup_decontaminate_semantic",
    "dedup_incremental_batch",
    "timeseries_gapfill_hourly",
    "cohort_retention_weekly",
    "stats_corr_qty_price",
    "set_except_all_custkeys",
    "multimodal_audio_chunks",
    "fuzzy_join_customer_names",
    "dedup_triangle_census",
    # round-7 additions
    "dedup_jaccard_prefix_filter",
    "dedup_containment_pairs",
    "graph_pagerank_dup",
    "text_bm25_search",
    "text_bigram_lm",
    "text_lm_quality_rank",
    "heavy_hitters_users",
    "window_zscore_anomaly",
    "window_distinct_types_1h",
    "decile_stats_order_price",
    "quality_expectations_orders",
    "sketch_cms_user_hits_contract",
    "stream_topk_types_per_hour",
    "stream_sketch_daily_users",
    # round-8: real BMP/WAV decoder round trips + hot-key-safe window
    "multimodal_bmp_decode",
    "multimodal_wav_resample",
    "window_distinct_types_1h_chunked",
    "partition_pruned_day_load",
    "dedup_paragraph_exact",
    "text_diversity_stats",
    "importance_weights_ngram",
    "sample_weighted_priority",
    "stream_upsert_latest",
    "table_fingerprints",
    "dedup_cluster_representatives",
    # round-9: integer k-means family
    "cluster_kmeans_assign",
    "cluster_kmeans_profile",
    "semantic_dedup_kmeans",
    # round-10/11: cards, budget water-filling, shard manifest, PNG
    "dataset_card_by_source",
    "dataset_card_global",
    "token_budget_waterfill",
    "token_budget_summary",
    "budget_sampled_by_source",
    "shard_manifest_tokens",
    "multimodal_png_decode",
    "lm_band_prune_by_source",
    "release_shard_manifest",
    # r12: the curriculum family (distinct-score rank frames)
    "curriculum_decile_bounds",
    "curriculum_stage_mix",
    "curriculum_pacing_schedule",
    "bpe_top_pairs",
    # r14: fixed-merge-table apply (empty corpus -> empty merge table
    # -> zero folds -> empty per-source rollup)
    "bpe_apply_merges",
    # r13: the stage-homogeneous packing family + streaming card ingest
    "pack_by_curriculum_stage",
    "pack_stage_fill_summary",
    "pack_fill_histogram",
    "stream_dataset_card_ingest",
    # r13: the curation funnel audit
    "curation_funnel_stages",
    "curation_funnel_by_source",
    "hist_quantiles_by_source",
    "contamination_matrix_sources",
    "lang_sampling_weights_sqrt",
]


@pytest.fixture(scope="module")
def empty_sf(sf_small, tmp_path_factory) -> str:
    import pyarrow.parquet as pq

    dst = tmp_path_factory.mktemp("empty_sf")
    for t in _TABLES:
        schema = pq.read_schema(f"{sf_small}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(dst / f"{t}.parquet"))
    return str(dst)


#: contract queries emit one static row per variant even on an empty
#: corpus (vacuously true floors) -- that IS their designed behavior
_EXPECTED_EMPTY_ROWS = {
    "similarity_ann_recall_contract": 3,
    # one scalar fingerprint row per table, zero-count on empty input
    "table_fingerprints": 3,
    # the expectation suite REPORTS on empty input: 5 check rows, with
    # row_count_gt_0 correctly failing -- that is the designed loud
    # failure, not a crash
    "quality_expectations_orders": 5,
}


@pytest.mark.parametrize("name", _REPRESENTATIVES)
def test_query_survives_empty_tables(spark, empty_sf, name):
    fn, _sql = QUERIES[name]
    rows = fn(spark, empty_sf).collect()
    # aggregations without grouping keys may legitimately emit one
    # zero-valued row; everything else must be empty
    assert len(rows) <= _EXPECTED_EMPTY_ROWS.get(name, 1)
    if name == "similarity_ann_recall_contract":
        assert all(r["recall_floor_ok"] for r in rows), "vacuous pass broken"
    if name == "quality_expectations_orders":
        verdicts = {r["check_name"]: r["ok"] for r in rows}
        assert verdicts.pop("row_count_gt_0") is False
        # every other check passes vacuously on zero rows -- and none
        # may be NULL (a null verdict is neither pass nor fail)
        assert all(v is True for v in verdicts.values()), verdicts
