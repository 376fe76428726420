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


# The external driver oracle-checks a prefix of the registry (50 names in
# rounds 2-3). Order the prefix by need: queries that have never had a
# driver row come first, then everything else in registration order, and
# shapes trivially re-derivable from other green rows (simple
# scans/facets/set-ops, all green in CORRECTNESS_r02+r03) yield their
# slots entirely.
HEAD: tuple[str, ...] = (
    # red in r04 (oracle HUGEINT dtype, CAST fix this round) — re-check first
    "span_dedup",
    "sequence_packing",
    "embedding_quantize",
    # never driver-checked (local-green only through r04) — close the gap
    "bpe_token_stats",
    "coordinate_uncertainty_check",
    "grouped_percentiles",
    "habitat_biome_match",
    # round-5 additions — no driver row yet (registered this round)
    "media_thumbnail_sizes",
    "lang_mismatch_report",
    "corpus_mixture_plan",
    "dup_inflation_by_source",
    "boilerplate_removal",
    "semantic_dedup",
    "bigram_lm_score",
    "dedup_representative",
    "embedding_pq_topk",
    "kmeans_cells",
    "facet_rollup",
    "model_quality_gate",
    "snapshot_diff_rollup",
    "gopher_quality_flags",
    # refresh tier: last driver-green in r02/r03; re-green to guard
    # against regressions now that every registry entry has evidence
    "dedup_occurrence_clusters",
    "fuzzy_date_parse",
    "gridref_parse",
    "expert_outlier_flags",
    "jackknife_outlier_stats",
    "maintenance_delete_upsert",
    "event_sessionization",
    "media_decode_meta",
    "assertion_rollup",
    "interval_containment_groups",
    "rounding_ladder",
    "raw_processed_comparison",
    "attribution_lookup",
    "distance_parse",
    "stored_query_replay",
    "classification_enrich",
    "semi_join_incremental",
    "window_representative",
    "event_user_sessions",
    "text_quality_stats",
    "text_token_stats",
    "distinct_coordinates",
    "embedding_knn_topk",
    "part_enrich_agg",
    "pricing_summary",
    "projected_scan",
    "indexed_field_scan",
    "multiget",
    "point_lookup",
    "range_filter_facet",
    "facet_counts",
    "distinct_values",
    "top_k",
    "set_union",
    "set_except",
    "anti_join_obsolete",
    "grouped_stats",
    "event_facet_counts",
    "event_json_extract",
    "event_hourly_histogram",
)

DEPRIORITIZED: tuple[str, ...] = (
    # all driver-green in CORRECTNESS_r04 (hash+rows+schema) — cumulative
    # evidence recorded; yield their prefix slots to the three CAST fixes,
    # the four never-checked rows, and the r02/r03 refresh tier.
    "corpus_curation",
    "chain_hybrid",
    "user_assertion_lifecycle",
    "stored_query_bbox",
    "validation_rule_wkt",
    "date_precision_reformat",
    "datum_reprojection",
    "utm_inverse",
    "collector_name_parse",
    "coordinate_validation",
    "text_language_id",
    "text_quality_score",
    "text_simhash",
    "simhash_near_duplicates",
    "text_fingerprint",
    "embedding_cosine_neighbors",
    "embedding_ann_topk",
    "embedding_ivf_topk",
    "embedding_label_centroid_norms",
    "embedding_cosine_near_dup",
    "streaming_event_windows",
    "salted_skew_join",
    "text_redact_pii",
    "text_repetition_stats",
    "near_dup_components",
    "license_canonicalize",
    "countmin_heavy_hitters",
    "bm25_search",
    "event_rollup_combined",
    "lsh_index_probe",
    "dwca_roundtrip",
    "fuzzy_name_pairs",
    "index_projection_facet",
    "taxon_name_match",
    "sds_generalization",
    "sample_layers_enrich",
    "verbatim_coord_parse",
    "chain_vocab_fields",
    "state_centroid_inference",
    "ngram_decontamination",
    "doc_chunking",
    "stratified_sample",
    "tfidf_top_terms",
    "broadcast_enrich_revenue",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_near_duplicates",
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
