"""Registry of declared queries.

Each query is a named pair of
  - a Spark callable ``fn(spark, sf_dir) -> DataFrame`` (DataFrame-API
    implementation — the engine), and
  - an optional ANSI-SQL oracle string that DuckDB can run over the same
    parquet tables (the independent referee).

The driver's correctness gate (and our local differential tests in
``tests/test_oracle_parity.py``) run both and compare row count, schema, and
an order-insensitive value hash. Queries with no SQL-expressible semantics
register ``oracle=None`` and get a rows-only check.

Determinism contract for every registered query (what makes value-hash
comparison possible):
  - floating-point AGGREGATES are computed exactly: per-row arithmetic stays
    in double (IEEE, bitwise deterministic), the per-row result is cast to a
    fixed-scale DECIMAL, summed exactly (order-insensitive), and cast back to
    DOUBLE — see ``discogs_load_spark.functions.numeric``;
  - every LIMIT / top-k is ordered with a unique tie-break key;
  - every collected array is sorted (``sort_array`` / ``list_sort``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Driver-verification priority. The driver's correctness gate checks registry
# entries in iteration order and (empirically, CORRECTNESS_r01) caps at the
# first 50, so ordering is part of the contract: queries that have never
# received a driver row, plus queries whose oracle changed this round, are
# listed here FIRST; everything else follows in registration order. Names not
# in this list keep their relative registration order after the listed ones.
PRIORITY: list[str] = [
    # --- r08 gate window (first 50; the driver checks these) ---
    # Policy: with all 185 queries settled after r07 (CORRECTNESS_r07
    # 50/50 green), the window shifts to STALENESS ROTATION (VERDICT r07
    # item 1): (a) this round's brand-new queries first — they have no
    # driver row; then (b) the queries whose NEWEST green driver row is
    # oldest — the 17 whose only full-hash row dates to ROUND 1 (q28 is
    # excluded: its best possible row is rows-only `no_oracle` by design,
    # so a gate slot re-earns nothing); then (c) r02-stale greens in
    # registration order to fill the 50. None of these appear in
    # CORRECTNESS_r07.json, so the no-replay guard
    # (tests/test_priority_rotation.py) holds by construction.
    # (a) new in r08, never driver-checked:
    "q191_best_fuzzy_match",
    "q192_best_embedding_match",
    "q193_copy_codec_roundtrip",
    "q194_salted_join_autotune",
    "q195_minhash_best_match",
    "q196_sorted_neighborhood",
    "q197_sparse_best_match",
    "q198_linkage_score",
    "q199_adaptive_lsh_best_match",
    "q200_merge_purge_pipeline",
    # (b) newest green row = r01 (three+ rounds of shared-helper churn
    # since), registration order:
    "q51_minhash_lsh_pairs",
    "q52_jaccard_neardup",
    "q53_simhash",
    "q64_simhash_hamming_pairs",
    "q40_tumbling_window",
    "q41_sessionization",
    "q42_asof_join",
    "q46_sliding_window",
    "q25_percentiles_variance",
    "q26_pivot",
    "q27_correlated_subquery",
    "q35_merge_upsert",
    "q44_time_range_join",
    "q29_grouping_sets",
    "q36_window_suite",
    "q45_bucketized_range_join",
    "q47_scd2_history",
    # (c) newest green row = r02, registration order, fill to 50:
    "q30_shred_parent_project",
    "q31_shred_child_posexplode",
    "q33_first_wins_dedup",
    "q34_bridge_table",
    "q54_embedding_neardup",
    "q55_ann_bruteforce_topk",
    "q56_ann_lsh_topk",
    "q57_ann_ivf",
    "q60_token_stats",
    "q61_quality_signals",
    "q62_langid_confusion",
    "q63_fingerprint",
    "q65_corpus_pipeline",
    "q66_rolling_hash",
    "q73_local_supplier_volume",
    "q74_volume_shipping",
    "q75_market_share",
    "q76_returned_items",
    "q77_small_quantity_revenue",
    "q78_large_volume_customer",
    "q79_top_supplier",
    "q80_dormant_customers",
    "q38_disjunctive_predicates",
    "q39_exists_order_priority",
    "q48_price_histogram",
    "q49_argmax_aggregates",
    "q84_train_test_split",
    "q85_balanced_sample",
    # --- entries 51+: stalest-first-ish for future rotations, all
    # covered by the local oracle-parity sweep every test run ---
    "q28_approx_aggregates",
    "q86_shard_manifest",
    "q87_tfidf_topk",
    "q88_streaming_tumbling",
    "q90_sequence_packing",
    "q91_contamination_check",
    "q92_streaming_foreachbatch_sink",
    "q93_udtf_sentences",
    "q94_udaf_second_largest",
    "q96_doc_chunks",
    "q97_pii_redaction",
    "q98_repetition_filter",
    "q99_kmeans_clusters",
    "q100_incremental_dedup",
    "q101_interchange_roundtrip",
    "q23_conditional_agg",
    "q43_json_extraction",
    "q70_multimodal_meta",
    "q81_conversion_funnel",
    "q130_event_pagerank",
    "q89_dedup_components",
    "q112_fuzzy_name_match",
    "q123_prefix_filter_jaccard",
    "q138_ann_ivf_multiprobe",
    "q95_embedding_dedup_groups",
    "q108_filtered_ann",
    "q113_ann_ivf_learned",
    "q128_embedding_quantize",
    "q129_ann_recall",
    "q140_quantized_ann_topk",
    "q154_semdedup",
    "q155_matryoshka_energy",
    "q158_ivf_cell_balance",
    "q141_dedup_consensus",
    "q165_entity_clusters",
    "q109_recursive_spine",
    "q163_trailing_window_revenue",
    "q106_unpivot_stats",
    "q107_map_functions",
    "q139_table_profile",
    "q157_hll_shard_merge",
    "q166_correlation_profile",
    "q167_quality_audit",
    "q152_basket_triangles",
    "q153_brand_jaccard",
    "q111_partitioned_lake",
    "q132_bucketed_join",
    "q149_snapshot_diff",
    "q150_zorder_layout",
    "q156_incremental_agg_maintenance",
    "q162_orc_roundtrip",
    "q164_compaction_plan",
    "q125_decontaminated_corpus",
    "q126_source_mix",
    "q131_chunked_packing",
    "q151_temperature_mixture",
    "q159_curriculum_budget",
    "q169_curation_pipeline",
    "q32_array_roundtrip",
    "q168_shred_master_defaults",
    "q137_quirk_batch_scoped_dedup",
    "q133_shred_multiarray_parent",
    "q110_streaming_dedup",
    "q114_streaming_sessions",
    "q115_stateful_running_totals",
    "q116_stream_stream_join",
    "q127_stream_static_join",
    "q161_streaming_matview",
    "q124_vocab_topk",
    "q134_inverted_index",
    "q135_conjunctive_search",
    "q136_ranked_search",
    "q142_boilerplate_ngrams",
    "q143_length_histogram",
    "q145_bm25_topk",
    "q146_lm_doc_score",
    "q147_dup_ngram_fraction",
    "q144_bigram_lm_counts",
    "q160_nucleus_vocab",
    "q102_order_count_distribution",
    "q103_promo_revenue_share",
    "q104_sole_late_supplier",
    "q117_cheapest_supplier",
    "q118_product_profit",
    "q119_important_parts",
    "q120_supplier_part_counts",
    "q121_excess_shippers",
    "q122_forecast_revenue",
    "q105_grouped_map_normalize",
    "q148_scd2_dimension",
]


def _ordered_items() -> list[tuple[str, QuerySpec]]:
    rank = {name: i for i, name in enumerate(PRIORITY)}
    n = len(PRIORITY)
    order = {name: i for i, name in enumerate(REGISTRY)}
    return sorted(
        REGISTRY.items(), key=lambda kv: (rank.get(kv[0], n), order[kv[0]])
    )


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as the Spark implementation of ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def queries_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _ordered_items()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _ordered_items() if spec.oracle is not None
    }
