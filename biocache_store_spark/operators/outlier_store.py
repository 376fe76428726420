"""Persisted reverse-jackknife outlier results.

The reference computes per-(taxon, environmental-layer) jackknife stats and
persists three things (outliers/ReverseJacknifeProcessor.scala:253-271 and
storeResultsWithStats :324-412, read back by dao/OutlierStatsDAOImpl.scala):
the stats map per taxon, the outlier record list per (taxon, layer), and a
per-record RecordJackKnifeStats row + `outlierForLayers` count
(model/OutlierResult.scala) driving the DETECTED_OUTLIER assertion; records
in the PREVIOUS result but not the current one are reverted (:382-412).

Here the store is one record-level DataFrame (group, layer, row_key, cell,
value, stats columns) — the stats table is a `dropDuplicates` projection of
it, not a second computation — maintained with the same versioned
replace-touched-groups merge the duplicates store uses, so
merge(full-at-T0, incremental-since-T0) == full-now. Per-record rows do NOT
carry the group's outlier_values array (the reference's per-record JSON
does): at corpus scale that array duplicates per record; read it from the
stats projection instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocache_store_spark.operators.jackknife import (
    MIN_SAMPLE_THRESHOLD,
    jackknife_stats,
)

#: stats columns attached to each tested record (RecordJackKnifeStats
#: parity, outliers/ReverseJacknifeProcessor.scala:352-368)
RECORD_STAT_COLS = [
    "sample_size",
    "min_value",
    "max_value",
    "mean_value",
    "std_dev",
    "value_range",
    "threshold",
]


def jackknife_record_outliers(
    df: DataFrame,
    group_cols: list[str],
    layer_cols: list[str],
    id_col: str,
    cell_col: str | None = None,
    min_sample_threshold: int = MIN_SAMPLE_THRESHOLD,
) -> DataFrame:
    """Record-level jackknife outlier detection over one or more layer
    VALUE columns (the reference's el* sample columns), long-form output:
    one row per (record, layer) tested, with `is_outlier` and the group's
    stats attached.

    Reference semantics (ReverseJacknifeProcessor.performJacknife
    :433-463): within a (taxon, layer) group the test samples ONE value
    per grid cell, and outlier VALUES map back to cells — every record
    in a flagged cell is an outlier, by value membership, not by record.
    `cell_col=None` makes each record its own cell (every value is a
    sample). The reference takes the cell's first-arriving value; here
    the cell sample is MIN(value) — deterministic under any partitioning
    where arrival order is not.

    Groups under `min_sample_threshold` cells are dropped (never tested),
    matching jackknife_stats. Failsafe groups (more than half the samples
    flagged) report trigger_failsafe with NO outliers, like the stats.
    NULL layer values are not samples and not tested rows.
    """
    melt = F.expr(
        "stack({n}, {pairs}) as (layer, value)".format(
            n=len(layer_cols),
            pairs=", ".join(
                f"'{c}', cast(`{c}` as double)" for c in layer_cols
            ),
        )
    )
    cell = (
        F.col(cell_col) if cell_col is not None else F.col(id_col)
    ).cast("string")
    long = df.select(
        *group_cols,
        F.col(id_col).cast("string").alias("row_key"),
        cell.alias("cell"),
        melt,
    ).filter(F.col("value").isNotNull())
    keys = [*group_cols, "layer"]
    samples = long.groupBy(*keys, "cell").agg(
        F.min("value").alias("value")
    )
    stats = jackknife_stats(
        samples, keys, "value", min_sample_threshold=min_sample_threshold
    )
    flagged_cells = (
        samples.join(stats, keys)
        .filter(F.array_contains(F.col("outlier_values"), F.col("value")))
        .select(*keys, "cell")
        .withColumn("__flagged", F.lit(True))
    )
    out_stats = [F.col(c) for c in RECORD_STAT_COLS]
    return (
        long.join(stats.drop("outlierness"), keys)  # inner: untested groups drop
        .join(flagged_cells, [*keys, "cell"], "left")
        .select(
            *keys,
            "row_key",
            "cell",
            "value",
            F.coalesce(F.col("__flagged"), F.lit(False)).alias("is_outlier"),
            *out_stats,
            "trigger_failsafe",
        )
    )


def outlier_for_layers(record_outliers: DataFrame) -> DataFrame:
    """Per record: the layers it is an outlier for + their count — the
    `outlierForLayers` column / OutlierResult.outlierForLayersCount the
    reference writes per record (storeResultsWithStats :370-376), which
    drives the DETECTED_OUTLIER 'Outlier for N layers' assertion."""
    return (
        record_outliers.filter(F.col("is_outlier"))
        .groupBy("row_key")
        .agg(
            F.sort_array(F.collect_set("layer")).alias("outlier_for_layers"),
            F.countDistinct("layer").cast("int").alias(
                "outlier_for_layers_count"
            ),
        )
    )


def merge_outlier_results(
    previous: DataFrame,
    incremental: DataFrame,
    groups: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Fold an incremental re-detection into the standing outlier store —
    the duplicates-store pattern applied to outliers: previous rows for
    the touched groups are dropped wholesale and the re-run rows take
    their place; untouched groups pass through, so merge(full-at-T0,
    incremental-since-T0) == full-now. As with merge_dedup_results, a
    record that MOVED groups is also scrubbed from its old group by a
    row_key anti-join (the full recompute never emits a record under two
    groups); callers deriving `groups` from changed records should union
    the old groups (reassigned_taxa pattern) so the old group's remaining
    records are recomputed too."""
    # rename the scope side: `groups` often shares lineage with `previous`
    # (derived from the same store), and same-name columns would resolve
    # ambiguously in the join condition
    scope = groups.select(
        *[groups[c].alias(f"__scope_{c}") for c in group_cols]
    )
    cond = previous[group_cols[0]].eqNullSafe(F.col(f"__scope_{group_cols[0]}"))
    for c in group_cols[1:]:
        cond = cond & previous[c].eqNullSafe(F.col(f"__scope_{c}"))
    kept = previous.join(scope, cond, "left_anti")
    cols = kept.columns
    kept = kept.join(
        incremental.select("row_key").distinct(), "row_key", "left_anti"
    ).select(*cols)
    return kept.unionByName(incremental)


def obsolete_outlier_records(
    previous: DataFrame, current: DataFrame
) -> DataFrame:
    """Record ids marked outliers in the previous result but no longer in
    the current one — the reference's `previousIDs diff currentIDs` reset
    set (storeResultsWithStats :382-412: delete the record's
    outlierForLayers column, flip DETECTED_OUTLIER to passed). One
    distinct row_key per record to revert."""
    prev_ids = (
        previous.filter(F.col("is_outlier")).select("row_key").distinct()
    )
    cur_ids = current.filter(F.col("is_outlier")).select("row_key").distinct()
    return prev_ids.join(cur_ids, "row_key", "left_anti")


def outlier_stats_table(record_outliers: DataFrame, group_cols: list[str]) -> DataFrame:
    """The per-(group, layer) stats projection of the record store — what
    OutlierStatsDAO.getJackKnifeStatsFor serves. One row per group x
    layer; no recomputation."""
    return record_outliers.select(
        *group_cols, "layer", *RECORD_STAT_COLS, "trigger_failsafe"
    ).dropDuplicates([*group_cols, "layer"])
