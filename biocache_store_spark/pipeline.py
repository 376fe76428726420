"""The full occurrence lifecycle as one composable pipeline.

The reference's `biocache ingest` (Store.ingest, Store.scala:625-638) runs
load -> sample -> process -> index per data resource as separate CLI tools
over shared storage. Here the same lifecycle is a function composition over
DataFrames — each stage lazy, the whole pipeline one Spark job graph when
written:

    raw = load_archive(...) | load_csv(...)
    processed = run_pipeline(raw, dims)      # process + enrich + sample
    index = build_index(processed)           # the query surface
    index.write.partitionBy("data_resource_uid").parquet(...)

Dims are small broadcast tables (taxa, data resources, sensitive species,
cl/el layers); records never leave the executors.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import DataFrame

from biocache_store_spark.operators.index_projection import build_index
from biocache_store_spark.operators.sampling import (
    distinct_points,
    enrich_records,
    sample_points,
)
from biocache_store_spark.processors.chain import (
    enrich_classification,
    process_records,
    process_records_hybrid,
)
from biocache_store_spark.processors.enrichment import (
    apply_sensitivity,
    enrich_attribution,
)


@dataclass
class Dimensions:
    """The broadcastable lookup tables the processors need."""

    taxa: DataFrame | None = None
    data_resources: DataFrame | None = None
    sensitive_species: DataFrame | None = None
    cl_layers: DataFrame | None = None
    el_layers: DataFrame | None = None
    default_values_by_resource: dict | None = None


def run_pipeline(
    raw: DataFrame,
    dims: Dimensions | None = None,
    today: _dt.date | None = None,
    hybrid_chain: bool = True,
) -> DataFrame:
    """raw occurrences -> fully processed records (the 'process' + 'sample'
    stages). Stage order mirrors Store.ingest: sensitivity runs after
    location (it blurs the processed coordinates' raw source), sampling
    last over the final coordinates."""
    dims = dims or Dimensions()
    df = raw
    if dims.sensitive_species is not None:
        if "generalisation" in dims.sensitive_species.columns:
            # full SDS rule shape (zone-scoped conservation instances,
            # WITHHOLD, originalSensitiveValues round-trip)
            from pyspark.sql import functions as F

            from biocache_store_spark.processors.sds import apply_sds

            id_col = next(
                (c for c in ("rowKey", "occurrenceID") if c in df.columns), None
            )
            if id_col is None:
                df = df.withColumn("__sds_id", F.monotonically_increasing_id())
                df = apply_sds(df, dims.sensitive_species, id_col="__sds_id").drop(
                    "__sds_id"
                )
            else:
                df = apply_sds(df, dims.sensitive_species, id_col=id_col)
        else:
            df = apply_sensitivity(df, dims.sensitive_species)
    # the chain emits its own assertions column; stash any pre-chain
    # assertions (e.g. sensitivity) and concat afterwards
    pre_assertions = "assertions" in df.columns
    if pre_assertions:
        df = df.withColumnRenamed("assertions", "__pre_assertions")
    # hybrid (default): vocabulary stages run as per-distinct-value
    # broadcast map joins — with the column-zip batch conversion this is
    # ~3-4x the round-3 chain throughput (tools/chain_bench.py);
    # equivalence covered by test_hybrid_chain_equivalent
    chain = process_records_hybrid if hybrid_chain else process_records
    processed = chain(
        df,
        default_values_by_resource=dims.default_values_by_resource,
        today=today,
    )
    if pre_assertions:
        from pyspark.sql import functions as F

        processed = processed.withColumn(
            "assertions",
            F.concat(F.col("__pre_assertions"), F.col("assertions")),
        ).drop("__pre_assertions")
    if dims.taxa is not None:
        processed = enrich_classification(processed, dims.taxa)
    if dims.data_resources is not None:
        processed = enrich_attribution(processed, dims.data_resources)
    if dims.cl_layers is not None or dims.el_layers is not None:
        points = distinct_points(processed)
        samples = sample_points(points, dims.cl_layers, dims.el_layers)
        processed = enrich_records(processed, samples)
    return processed


def ingest(
    raw: DataFrame,
    dims: Dimensions | None = None,
    today: _dt.date | None = None,
) -> DataFrame:
    """Full lifecycle: process + enrich + sample -> index table."""
    return build_index(run_pipeline(raw, dims, today))
