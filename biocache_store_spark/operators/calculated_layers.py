"""Calculated spatial layers: endemism, species richness, occurrence density.

Spark-first re-expression of tool/CalculatedLayerHelper.scala (the
`endemism` tool): the reference walks SOLR facets per species over N actor
threads, accumulating cell->species maps in driver memory and writing
speciesCellCounts / cellSpecies / cellOccurrenceCounts text files. Here the
whole computation is three aggregations over the occurrence table:

  * occurrence density  — occurrences per grid cell,
  * species richness    — distinct species per grid cell,
  * weighted endemism   — per cell, the sum over its species of
    1 / (number of cells that species occupies): a species found in one
    cell contributes 1, a cosmopolitan species almost nothing
    (Crisp et al. 2001, the layer the reference generates).

Determinism discipline: the endemism addend is floor(scale / n_cells) as
an INTEGER (micro-endemism at the default scale=10^6), so the per-cell sum
is an integer sum — commutative, bit-identical under any partitioning or
engine, unlike a float sum of reciprocals whose rounding noise rides the
reduce order. IEEE division of scale by an integer count is exact whenever
the true quotient is an integer, so floor never loses a unit to a
representation error.

Scale shape: distinct (cell, species) pairs reduce map-side before the one
shuffle per aggregation; the species->cell-count relation joins back on
the species key (a plain shuffle join — species cardinality is corpus-
sized, never collected); no driver-side state at any input size, where the
reference's cell maps grow with the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ENDEMISM_SCALE = 1_000_000


def grid_cell(
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    decimals: int = 3,
):
    """Grid-cell id for the point ladder's resolution (the reference
    facets on `point-0.001`): 'lat,lon' with both coordinates rounded to
    `decimals`. Cast-invalid coordinates yield NULL (dropped upstream)."""
    lat = F.round(F.col(lat_col).try_cast("double"), decimals)
    lon = F.round(F.col(lon_col).try_cast("double"), decimals)
    return F.when(
        lat.isNotNull() & lon.isNotNull(),
        F.concat(lat.cast("string"), F.lit(","), lon.cast("string")),
    )


def species_cell_counts(
    occ: DataFrame,
    species_col: str = "species_guid",
    cell_col: str = "cell",
) -> DataFrame:
    """(species, n_cells): how many grid cells each species occupies —
    the speciesCellCounts file (CalculatedLayerHelper.scala:129-149), and
    the denominator relation of weighted endemism."""
    return (
        occ.select(F.col(species_col).alias("species"), F.col(cell_col))
        .where(F.col("species").isNotNull() & F.col(cell_col).isNotNull())
        .distinct()
        .groupBy("species")
        .agg(F.count(F.lit(1)).alias("n_cells"))
    )


def calculated_layers(
    occ: DataFrame,
    species_col: str = "species_guid",
    cell_col: str = "cell",
    scale: int = DEFAULT_ENDEMISM_SCALE,
) -> DataFrame:
    """One row per grid cell: (cell, n_species, n_occurrences,
    endemism_micro) — the cellSpecies + cellOccurrenceCounts outputs plus
    the endemism score the reference's layer generation derives from
    them, in integer micro-units (see module docstring).

    `occ` needs a `cell` column (grid_cell()) and a species column;
    rows missing either are excluded, mirroring the reference's
    species_guid:* + geospatial_kosher:true scope queries."""
    base = occ.select(
        F.col(species_col).alias("species"), F.col(cell_col).alias("cell")
    ).where(F.col("species").isNotNull() & F.col("cell").isNotNull())
    cell_stats = base.groupBy("cell").agg(
        F.countDistinct("species").alias("n_species"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    pairs = base.distinct()
    scc = (
        pairs.groupBy("species").agg(F.count(F.lit(1)).alias("n_cells"))
    )
    addend = F.floor(F.lit(float(scale)) / F.col("n_cells")).cast("bigint")
    endemism = (
        pairs.join(scc, "species")
        .groupBy("cell")
        .agg(F.sum(addend).alias("endemism_micro"))
    )
    return cell_stats.join(endemism, "cell")
