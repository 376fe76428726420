"""The declared query surface: SURVEY.md §2 inventory as (Spark, oracle) pairs.

Each query is registered with:
  * a Spark callable  (spark, sf_dir) -> DataFrame — the engine under test,
  * an ANSI-SQL oracle string DuckDB can run on the same parquet tables
    (views: region nation customer supplier part orders lineitem events
    documents embeddings), or None for non-SQL-expressible operators,
  * a `bench` flag marking the headline set bench.py times at sf0.1.

Column names are aliased identically on both sides (the driver's comparator
sorts columns by name before value-hashing), and every computed float is
rounded to a fixed scale on both sides so double summation order can't flip
the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    bench: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator registering a (spark, sf_dir) -> DataFrame query callable."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name, spark_fn=fn, oracle=oracle, doc=doc, bench=bench, tags=tags
        )
        return fn

    return wrap


# The external driver oracle-checks a 50-slot prefix of the registry per
# round. Round-13 rotation (VERDICT r12 "Next round" #3 plus this round's
# touched set): first every query whose code changed in round 13 — the 9
# analyzed-plan consumers of the rewritten arrow_udf cosine/norm kernels,
# the simhash candidate-tail rewrite, the two connected-components
# consumers of the folded convergence check, and lsh_index_probe (probe
# materialize flag) — then the 12 queries VERDICT r12 flagged as
# rewritten-in-r12 but never driver-checked post-rewrite
# (window_representative and duplicate_markup_writeback are the two
# highest-risk: argmax and single-window rewrites whose driver rows
# predate the rewrite), then the oldest standing driver evidence (the
# r10-era entries). Steady-state: each round re-checks changed queries
# plus the oldest standing evidence. (event_sessionization is the one
# r10-era entry left outside the prefix — bench-flagged, code untouched
# since r10, hostile-sweep-checked every round.)
HEAD: tuple[str, ...] = (
    # code changed in round 13 — must (re-)check first
    "embedding_cosine_neighbors",
    "embedding_cosine_near_dup",
    "embedding_knn_topk",
    "embedding_ann_topk",
    "embedding_ivf_topk",
    "embedding_ivfpq_rerank",
    "embedding_label_centroid_norms",
    "semantic_dedup",
    "semantic_decontamination",
    "simhash_near_duplicates",
    "near_dup_components",
    "dedup_representative",
    "lsh_index_probe",
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
    "embedding_ivfpq_batch",
    "dsir_selection",
    "dsir_threshold_select",
    # r12-rewritten, no post-rewrite driver row yet (VERDICT r12 #3)
    "window_representative",
    "duplicate_markup_writeback",
    "taxon_name_match",
    "classification_enrich",
    "user_assertion_lifecycle",
    "minhash_near_duplicates",
    "salted_skew_join",
    "kmeans_cells",
    "domain_cap_filter",
    "maintenance_delete_upsert",
    "snapshot_diff_rollup",
    "bigram_lm_score",
    # oldest standing driver evidence (r10-era entries)
    "doc_chunking",
    "stratified_sample",
    "span_dedup",
    "sequence_packing",
    "embedding_quantize",
    "bpe_token_stats",
    "coordinate_uncertainty_check",
    "grouped_percentiles",
    "habitat_biome_match",
    "media_thumbnail_sizes",
    "lang_mismatch_report",
    "corpus_mixture_plan",
    "dup_inflation_by_source",
    "boilerplate_removal",
    "facet_rollup",
    "model_quality_gate",
    "gopher_quality_flags",
    "fuzzy_date_parse",
    "date_precision_reformat",
    "outlier_store_merge",
    # --- 50-slot prefix ends here ---
)

DEPRIORITIZED: tuple[str, ...] = (
    # driver-green in CORRECTNESS_r12 (the r12 prefix) or r11/r10 and
    # untouched this round — they yield their prefix slots to the
    # rotation above.
    # r12-checked, unchanged in round 13:
    "broadcast_enrich_revenue",
    "collector_name_parse",
    "coordinate_validation",
    "datum_reprojection",
    "endemism_density_layers",
    "event_facet_counts",
    "event_json_extract",
    "event_hourly_histogram",
    "event_rollup_combined",
    "exact_dedup",
    "fuzzy_name_pairs",
    "histogram_threshold_refined",
    "ngram_decontamination",
    "ngram_jaccard_pairs",
    "range_filter_facet",
    "sds_generalization",
    "state_centroid_inference",
    "stored_query_bbox",
    "streaming_event_windows",
    "text_redact_pii",
    "text_repetition_stats",
    "tfidf_top_terms",
    "training_shard_plan",
    "utm_inverse",
    "verbatim_coord_parse",
    "repeated_substring_spans",
    "substring_decontamination",
    "chain_hybrid",
    "chain_vocab_fields",
    "assertion_rollup",
    "corpus_curation",
    "text_fingerprint",
    "text_simhash",
    "text_language_id",
    "text_quality_score",
    "license_canonicalize",
    # r11/r10-checked, unchanged since:
    "exif_metadata",
    "countmin_heavy_hitters",
    "rounding_ladder",
    "index_projection_facet",
    "dedup_occurrence_clusters",
    "dedup_incremental_merge",
    "media_decode_meta",
    "interval_containment_groups",
    "raw_processed_comparison",
    "attribution_lookup",
    "distance_parse",
    "stored_query_replay",
    "semi_join_incremental",
    "event_user_sessions",
    "text_quality_stats",
    "text_token_stats",
    "distinct_coordinates",
    "part_enrich_agg",
    "pricing_summary",
    "projected_scan",
    "indexed_field_scan",
    "multiget",
    "point_lookup",
    "validation_rule_wkt",
    "media_reference_rollup",
    "text_embedding_vectors",
    "bpe_merge_training",
    "nb_lang_classify",
    "facet_counts",
    "top_k",
    "set_union",
    "set_except",
    "anti_join_obsolete",
    "distinct_values",
    "expert_outlier_store_merge",
    "expert_outlier_markup",
    "expert_outlier_flags",
    "sample_layers_enrich",
    "bm25_search",
    "grouped_stats",
    "event_sessionization",
    # r10-era entries displaced from the prefix by the round-13
    # mapInArrow/DSIR-restructure consumers (roundtrip/markup/parser
    # entries with heavy unit + hostile-sweep coverage):
    "dwca_roundtrip",
    "gridref_parse",
    "jackknife_outlier_stats",
    "dwca_event_core_roundtrip",
    "outlier_assertion_markup",
)


def load_all() -> dict[str, Query]:
    """Import every query module so REGISTRY is fully populated.

    Returns the registry ordered head-first: every query not in
    DEPRIORITIZED in registration order, then the deprioritized tail.
    """
    from biocache_store_spark.queries import (  # noqa: F401
        analytics,
        coverage,
        curation,
        events,
        relational,
        text,
        vectors,
    )

    head, tail = set(HEAD), set(DEPRIORITIZED)
    ordered = {n: REGISTRY[n] for n in HEAD if n in REGISTRY}
    ordered.update(
        {n: q for n, q in REGISTRY.items() if n not in tail and n not in head}
    )
    for n in DEPRIORITIZED:
        if n in REGISTRY:
            ordered[n] = REGISTRY[n]
    return ordered


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in load_all().items()}


def oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
