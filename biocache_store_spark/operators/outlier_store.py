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
from pyspark.sql.window import Window

from biocache_store_spark.operators.jackknife import MIN_SAMPLE_THRESHOLD

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
    matching jackknife_stats; so are zero-range groups (threshold <= 0,
    JackKnife.scala's early return). Failsafe groups (more than half the
    samples flagged, counted per SAMPLE like the reference) report
    trigger_failsafe with NO outliers. NULL layer values are not samples
    and not tested rows.

    Unlike jackknife_stats (the parity anchor, whose applyInPandas kernel
    preserves the reference's per-index outlierness quirk verbatim), this
    operator computes the cutoffs entirely with window functions — the
    cascade collapses to a low/high VALUE cutoff on the per-group sorted
    samples, which is provably the same flagged-record set: a below-mean
    trigger flags every sample at or below it, so the flagged set is
    exactly `value <= max(triggering below-mean value)` (and dually
    above), and the failsafe count `lo_rank + (n - hi_rank + 1)` equals
    the reference's flagged-sample count because tied values contribute
    the same gap multiset under any tie order. JVM-side end to end: no
    Arrow transfer, no per-group Python sort. With per-record cells the
    executed plan is ONE shuffle+sort, two stacked Window nodes, zero
    joins — measured 25.6 s vs the Python kernel's 162 s at 20M rows x 2
    layers on local[32] (SCALE.md round 8), equivalence-tested against
    the kernel. With a real cell column, the cell dedup adds one
    aggregation and the record fan-out joins the dim-sized cuts plus
    only the FLAGGED cells. Group-level aggregates run over the sorted
    frame, so float summation order — and therefore the incremental
    store's bit-identity with a full recompute — is deterministic.
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
    # group-less records are never tested — the reference iterates ACTUAL
    # taxon ids (ReverseJacknifeProcessor reads per-taxon runs), and a
    # NULL group would otherwise form its own phantom test population
    grouped = df
    for g in group_cols:
        grouped = grouped.filter(F.col(g).isNotNull())
    long = grouped.select(
        *group_cols,
        F.col(id_col).cast("string").alias("row_key"),
        cell.alias("cell"),
        melt,
    ).filter(F.col("value").isNotNull())
    keys = [*group_cols, "layer"]
    # per-record cells: every record IS its own sample (cell == row_key,
    # unique), so the per-cell MIN groupBy would be a no-op dedup costing
    # a full extra shuffle — skip it and carry row_key through the window
    # pass, turning the whole operator into one sort + one dim join
    per_record_cells = cell_col is None
    if per_record_cells:
        samples = long
    else:
        samples = long.groupBy(*keys, "cell").agg(
            F.min("value").alias("value")
        )
    ws = Window.partitionBy(*keys).orderBy("value", "cell")
    # the whole-partition aggregates run over the SAME sorted frame as the
    # lead/lag pass: one sort, and — load-bearing — a DETERMINISTIC float
    # summation order, so an incremental re-run's stats are bit-identical
    # to a full recompute's (an unordered frame sums in shuffle-arrival
    # order and drifts in the last ULP between runs)
    wa = ws.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    v = F.col("value")
    carry = ["row_key", "cell"] if per_record_cells else ["cell"]
    enriched = samples.select(
        *keys,
        *carry,
        "value",
        F.count("*").over(wa).alias("__n"),
        F.avg(v).over(wa).alias("__mean"),
        F.min(v).over(wa).alias("__min"),
        F.max(v).over(wa).alias("__max"),
        F.stddev_pop(v).over(wa).alias("__sd"),
        F.row_number().over(ws).alias("__rn"),
        F.lead(v).over(ws).alias("__next"),
        F.lag(v).over(ws).alias("__prev"),
    ).filter(
        (F.col("__n") >= min_sample_threshold) & (F.col("__max") > F.col("__min"))
    )
    threshold = (0.95 * F.sqrt("__n") + 0.2) * (
        (F.col("__max") - F.col("__min")) / 50.0
    )
    y = (
        F.when(v < F.col("__mean"), (F.col("__next") - v) * (F.col("__mean") - v))
        .when(v > F.col("__mean"), (v - F.col("__prev")) * (v - F.col("__mean")))
        .otherwise(F.lit(0.0))
    )
    c = y / F.col("__sd")
    trig_lo = (v < F.col("__mean")) & (c > threshold)
    trig_hi = (v > F.col("__mean")) & (c > threshold)
    cuts = (
        enriched.withColumn("__threshold", threshold)
        .withColumn("__trig_lo", trig_lo)
        .withColumn("__trig_hi", trig_hi)
        .groupBy(*keys)
        .agg(
            F.max("__n").alias("sample_size"),
            F.max("__min").alias("min_value"),
            F.max("__max").alias("max_value"),
            F.max("__mean").alias("mean_value"),
            F.max("__sd").alias("std_dev"),
            (F.max("__max") - F.max("__min")).alias("value_range"),
            F.max("__threshold").alias("threshold"),
            F.max(F.when(F.col("__trig_lo"), v)).alias("__lo_val"),
            F.min(F.when(F.col("__trig_hi"), v)).alias("__hi_val"),
            F.max(F.when(F.col("__trig_lo"), F.col("__rn"))).alias("__lo_rn"),
            F.min(F.when(F.col("__trig_hi"), F.col("__rn"))).alias("__hi_rn"),
        )
        .withColumn(
            "__n_flagged",
            F.coalesce(F.col("__lo_rn"), F.lit(0))
            + F.coalesce(
                F.col("sample_size") - F.col("__hi_rn") + 1, F.lit(0)
            ),
        )
        .withColumn(
            "trigger_failsafe",
            F.col("__n_flagged") > F.floor(F.col("sample_size") / 2),
        )
        .withColumn(
            "sample_size", F.col("sample_size").cast("int")
        )
    )
    # flags come from the CELL's SAMPLE value (a record in a flagged cell
    # is an outlier even when its own value differs from the cell's
    # sampled one — the reference's value->cells->points mapping). Join
    # shape matters at scale: `cuts` is one row per (group, layer) — a
    # broadcastable dim — so the stats attach without shuffling the
    # record side; the cell fan-out joins only the FLAGGED cells (outlier
    # counts, tiny), never all cells. With per-record cells
    # (cell_col=None) the record's value IS the sample, so the flag is a
    # plain column expression and the second join disappears entirely.
    flagged = F.when(
        F.col("trigger_failsafe"), F.lit(False)
    ).otherwise(
        F.coalesce(v <= F.col("__lo_val"), F.lit(False))
        | F.coalesce(v >= F.col("__hi_val"), F.lit(False))
    )
    if per_record_cells:
        # record rows == sample rows, and every group-level quantity is a
        # window aggregate: stack a SECOND window layer on the SAME
        # (partition, order) spec — Spark reuses the child's sort, so the
        # whole operator is ONE shuffle+sort with no joins at all
        lo_val = F.max(F.when(trig_lo, v)).over(wa)
        hi_val = F.min(F.when(trig_hi, v)).over(wa)
        lo_rn = F.max(F.when(trig_lo, F.col("__rn"))).over(wa)
        hi_rn = F.min(F.when(trig_hi, F.col("__rn"))).over(wa)
        n_flagged = F.coalesce(lo_rn, F.lit(0)) + F.coalesce(
            F.col("__n") - hi_rn + 1, F.lit(0)
        )
        failsafe = n_flagged > F.floor(F.col("__n") / 2)
        row_flag = F.when(failsafe, F.lit(False)).otherwise(
            F.coalesce(v <= lo_val, F.lit(False))
            | F.coalesce(v >= hi_val, F.lit(False))
        )
        return enriched.select(
            *keys,
            "row_key",
            "cell",
            "value",
            row_flag.alias("is_outlier"),
            F.col("__n").cast("int").alias("sample_size"),
            F.col("__min").alias("min_value"),
            F.col("__max").alias("max_value"),
            F.col("__mean").alias("mean_value"),
            F.col("__sd").alias("std_dev"),
            (F.col("__max") - F.col("__min")).alias("value_range"),
            threshold.alias("threshold"),
            failsafe.alias("trigger_failsafe"),
        )
    else:
        joined = long.join(cuts, keys)  # inner: untested groups drop
        flagged_cells = (
            samples.join(cuts, keys)
            .filter(flagged)
            .select(*keys, "cell", F.lit(True).alias("__flagged"))
        )
        joined = joined.join(flagged_cells, [*keys, "cell"], "left")
        is_outlier = F.coalesce(F.col("__flagged"), F.lit(False))
    return joined.select(
        *keys,
        "row_key",
        "cell",
        "value",
        is_outlier.alias("is_outlier"),
        *[F.col(col) for col in RECORD_STAT_COLS],
        "trigger_failsafe",
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


def apply_outlier_assertions(
    store: DataFrame,
    record_outliers: DataFrame,
    reverts: DataFrame | None = None,
    key_col: str = "rowKey",
    assertions_col: str = "assertions",
) -> DataFrame:
    """Mark up a processed store with the outlier results as SYSTEM
    assertions — the last mile of storeResultsWithStats
    (ReverseJacknifeProcessor.scala:370-380: addSystemAssertion
    DETECTED_OUTLIER 'Outlier for N layers'; reset path :402-410:
    replaceExistCode flips the code to PASSED for records that stopped
    being outliers).

    `record_outliers` is the record-level store (or the
    outlier_for_layers rollup); `reverts` the obsolete_outlier_records
    diff. Any existing DETECTED_OUTLIER entry is replaced, never
    duplicated (the reference's replaceExistCode semantics), and rows in
    neither frame keep their assertions untouched. Array surgery is all
    JVM-side (filter + array_append); the rollup and revert sides are
    dim-or-ingest-sized joins."""
    from biocache_store_spark.processors.assertions import (
        FAILED,
        PASSED,
        AssertionCodes,
    )

    code = AssertionCodes.DETECTED_OUTLIER.code
    name = AssertionCodes.DETECTED_OUTLIER.name
    if "outlier_for_layers" not in record_outliers.columns:
        record_outliers = outlier_for_layers(record_outliers)
    rollup = record_outliers.select(
        F.col("row_key").alias("__ofl_key"),
        F.col("outlier_for_layers_count").cast("int").alias("__ofl_n"),
    )
    out = store.join(
        rollup, store[key_col] == F.col("__ofl_key"), "left"
    ).drop("__ofl_key")
    if reverts is not None:
        rv = reverts.select(
            F.col("row_key").alias("__rv_key"), F.lit(True).alias("__revert")
        )
        out = out.join(rv, out[key_col] == F.col("__rv_key"), "left").drop(
            "__rv_key"
        )
    else:
        out = out.withColumn("__revert", F.lit(None).cast("boolean"))
    # null-safe: filter(NULL) and array_append(NULL, x) both return NULL,
    # which would silently DROP the outlier markup on rows whose
    # assertions column is null (same hazard append_assertion guards)
    existing = F.coalesce(
        F.col(assertions_col),
        F.array().cast(store.schema[assertions_col].dataType),
    )
    cleaned = F.filter(existing, lambda a: a["code"] != F.lit(code))
    failed = F.struct(
        F.lit(code).alias("code"),
        F.lit(name).alias("name"),
        F.lit(FAILED).alias("qa_status"),
        F.concat(
            F.lit("Outlier for "), F.col("__ofl_n"), F.lit(" layers")
        ).alias("comment"),
    )
    passed = F.struct(
        F.lit(code).alias("code"),
        F.lit(name).alias("name"),
        F.lit(PASSED).alias("qa_status"),
        F.lit("").alias("comment"),
    )
    new_assertions = (
        F.when(F.col("__ofl_n").isNotNull(), F.array_append(cleaned, failed))
        .when(F.col("__revert"), F.array_append(cleaned, passed))
        .otherwise(F.col(assertions_col))
    )
    return out.withColumn(assertions_col, new_assertions).drop(
        "__ofl_n", "__revert"
    )


def outlier_stats_table(record_outliers: DataFrame, group_cols: list[str]) -> DataFrame:
    """The per-(group, layer) stats projection of the record store — what
    OutlierStatsDAO.getJackKnifeStatsFor serves. One row per group x
    layer; no recomputation."""
    return record_outliers.select(
        *group_cols, "layer", *RECORD_STAT_COLS, "trigger_failsafe"
    ).dropDuplicates([*group_cols, "layer"])
