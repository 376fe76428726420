"""Relational query surface over the TPC-H-ish driver tables.

Each query re-expresses one operator family from SURVEY.md §2 (scan,
projection, predicate filter, broadcast-dim enrichment join, facet
aggregation, distinct, multiget, set ops, window representative, top-k)
with the plan shape we want at 100 TB: filters and projections pushed
into the parquet scan, dimension joins broadcast, aggregations with
map-side partials, and no driver-side collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biocache_store_spark.io import read_table
from biocache_store_spark.queries import register
from biocache_store_spark.util import local_rows_df

_Q1_CUTOFF = "1998-09-02"


@register(
    "pricing_summary",
    doc=(
        "Flagship aggregation: groupBy + sums/avgs over the fact table with a "
        "pushed-down timestamp predicate. Reference analog: the index-time "
        "assertion/statistics roll-ups (index/SolrIndexDAO.scala:609-629) and "
        "facet statistics; shape is TPC-H Q1."
    ),
    bench=True,
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
               ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
               ROUND(AVG(l_discount), 4)                                    AS avg_disc,
               COUNT(*)                                                     AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.expr(f"TIMESTAMP_NTZ '{_Q1_CUTOFF}'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "facet_counts",
    doc=(
        "Facet counts = groupBy().count() — the reference's single most common "
        "query shape (SolrIndexDAO.pageOverFacet, index/SolrIndexDAO.scala:299-329)."
    ),
    bench=True,
    oracle="""
        SELECT o_orderpriority AS facet_value, COUNT(*) AS facet_count
        FROM orders GROUP BY o_orderpriority
    """,
)
def facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("facet_value"))
        .agg(F.count(F.lit(1)).alias("facet_count"))
    )


@register(
    "distinct_values",
    doc=(
        "Distinct values of a field under a filter "
        "(SolrIndexDAO.getDistinctValues, index/SolrIndexDAO.scala:1500-1532)."
    ),
    oracle="""
        SELECT DISTINCT c_mktsegment AS value
        FROM customer WHERE c_acctbal > 0
    """,
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_mktsegment").alias("value"))
        .distinct()
    )


@register(
    "projected_scan",
    doc=(
        "Projected scan with predicate — pageOverSelect "
        "(persistence/PersistenceManager.scala:106): column pruning + filter "
        "pushdown reach the parquet reader."
    ),
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity >= 45
    """,
)
def projected_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "indexed_field_scan",
    doc=(
        "Equality scan on an indexed field — pageOverIndexedField "
        "(persistence/PersistenceManager.scala:119); at scale this is "
        "partition pruning on the partition column."
    ),
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def indexed_field_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


@register(
    "multiget",
    doc=(
        "Multiget of selected columns for a key list — selectRows "
        "(Cassandra3PersistenceManager.scala:1143). Small literal key sets "
        "stay an IN filter (pushed down); large ones become a broadcast "
        "left-semi join."
    ),
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        FROM lineitem WHERE l_orderkey IN (1, 5, 32, 67, 97)
    """,
)
def multiget(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isin(1, 5, 32, 67, 97))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    )


@register(
    "point_lookup",
    doc="Point lookup by key — getByRowKey (dao/OccurrenceDAO.scala:35-45).",
    oracle="SELECT * FROM customer WHERE c_custkey = 42",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "customer").filter(F.col("c_custkey") == 42)


@register(
    "range_filter_facet",
    doc=(
        "Timestamp-range predicate + facet — the start-date incremental filter "
        "(SolrIndexDAO.shouldIndex, index/SolrIndexDAO.scala:580-607) combined "
        "with a facet count."
    ),
    oracle="""
        SELECT o_orderstatus AS facet_value, COUNT(*) AS facet_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY o_orderstatus
    """,
)
def range_filter_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1995-01-01'"))
            & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1997-01-01'"))
        )
        .groupBy(F.col("o_orderstatus").alias("facet_value"))
        .agg(F.count(F.lit(1)).alias("facet_count"))
    )


@register(
    "broadcast_enrich_revenue",
    doc=(
        "Dimension-enrichment join chain — the reference's attribution/taxon "
        "lookup pattern (caches/AttributionDAO.scala, LRU cache over a small "
        "dim) becomes broadcast hash joins; fact-fact join (orders-lineitem) "
        "shuffles on the key. Shape is TPC-H Q5-lite. Lineitem revenue is "
        "pre-aggregated per orderkey BEFORE the dimension joins: the "
        "map-side-combining agg shuffles on the same key the orders join "
        "needs (exchange reuse), and every downstream join moves one row "
        "per order instead of one per line — the partial-aggregation "
        "pushdown that matters at 100x."
    ),
    bench=True,
    oracle="""
        SELECT n_name AS nation, r_name AS region,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS line_count
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY n_name, r_name
    """,
)
def broadcast_enrich_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
        F.count(F.lit(1)).alias("__lc"),
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        # customer is sf-scaled (a fact, not a dim): no broadcast hint — AQE
        # picks broadcast at small SFs and shuffle join once it outgrows the
        # threshold. Hints stay only on the true fixed-size dims below.
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum("__rev"), 2).alias("revenue"),
            F.sum("__lc").alias("line_count"),
        )
    )


@register(
    "part_enrich_agg",
    doc=(
        "Single broadcast-dim enrichment + facet — taxon-profile lookup shape "
        "(caches/TaxonProfileDAO.scala → broadcast join)."
    ),
    bench=True,
    oracle="""
        SELECT p_brand AS brand,
               ROUND(SUM(l_quantity), 2) AS total_qty,
               COUNT(*) AS line_count
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
)
def part_enrich_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    return (
        # part is sf-scaled: leave the join strategy to AQE (broadcast at
        # small SFs, shuffle join at scale)
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@register(
    "semi_join_incremental",
    doc=(
        "Row-key-file incremental scoping (cmd/IncrementalTool.scala:34-50) = "
        "left-semi join of the fact table against a keys set."
    ),
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
)
def semi_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    keys = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    return orders.join(
        F.broadcast(keys), orders.o_custkey == keys.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "anti_join_obsolete",
    doc=(
        "Obsolete-set subtraction (DuplicationDetection.revertNonDuplicateRecords, "
        "tool/DuplicationDetection.scala:754-768) = left-anti join."
    ),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def anti_join_obsolete(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "grouped_stats",
    doc=(
        "Per-group summary statistics — the jackknife pre-pass "
        "(outliers/JackKnife.scala:101-106: n/min/max/mean/stddev per "
        "species × layer) as built-in partial-aggregating functions."
    ),
    oracle="""
        SELECT l_returnflag AS grp,
               COUNT(*) AS n,
               ROUND(MIN(l_quantity), 2) AS min_qty,
               ROUND(MAX(l_quantity), 2) AS max_qty,
               ROUND(AVG(l_quantity), 4) AS mean_qty,
               ROUND(STDDEV_POP(l_quantity), 4) AS sd_qty
        FROM lineitem GROUP BY l_returnflag
    """,
)
def grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_quantity"), 2).alias("min_qty"),
            F.round(F.max("l_quantity"), 2).alias("max_qty"),
            F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
            F.round(F.stddev_pop("l_quantity"), 4).alias("sd_qty"),
        )
    )


@register(
    "window_representative",
    doc=(
        "Representative-record selection — argmax within group with a "
        "deterministic tiebreak (DuplicationDetection.scala:874-926 picks max "
        "coordinate precision, first-wins; we add the key tiebreak the "
        "reference leaves to iteration order)."
    ),
    bench=True,
    oracle="""
        SELECT o_custkey, o_orderkey AS latest_orderkey,
               o_totalprice AS latest_totalprice, o_orderdate AS latest_orderdate
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
)
def window_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    # argmax as max_by over a lexicographic key struct, NOT a row_number
    # window (r12): the aggregation runs with map-side partials, so the
    # exchange moves one candidate row per (group x input partition)
    # instead of every order row, and the per-partition sort the window
    # needed disappears. (o_orderdate DESC, o_orderkey ASC) becomes the
    # struct (o_orderdate, -o_orderkey) under max_by — bit-identical
    # representative per group (row-identical at sf0.1, oracle-checked).
    # Measured isolated at sf0.1: 0.39-0.48s -> 0.28-0.39s.
    key = F.struct(F.col("o_orderdate"), (-F.col("o_orderkey")).alias("nk"))
    val = F.struct("o_orderkey", "o_totalprice", "o_orderdate")
    return (
        orders.groupBy("o_custkey")
        .agg(F.max_by(val, key).alias("v"))
        .select(
            "o_custkey",
            F.col("v.o_orderkey").alias("latest_orderkey"),
            F.col("v.o_totalprice").alias("latest_totalprice"),
            F.col("v.o_orderdate").alias("latest_orderdate"),
        )
    )


@register(
    "top_k",
    doc=(
        "Top-k with deterministic tiebreak — SOLR sort+limit exports "
        "(SolrIndexDAO.scala:1439; ExportFromIndexStream). Spark plans this "
        "as TakeOrderedAndProject (no full sort at scale)."
    ),
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "set_except",
    doc=(
        "Set subtraction on id sets — validation-rule apply/unapply "
        "(qa/ValidationRuleRunner.scala:151-260: new−old / old−new)."
    ),
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_keys.subtract(o_keys)


@register(
    "set_union",
    doc=(
        "Union of loader outputs (DwcCSVLoader.loadDirectory "
        "load/DwcCSVLoader.scala:133) = unionByName + distinct."
    ),
    oracle="""
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 400000
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    b = orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_orderpriority"
    )
    return a.unionByName(b).distinct()


_SIZE_GROUPS = [
    ("tiny", 1, 10),
    ("small", 11, 20),
    ("medium", 21, 35),
    ("large", 36, 50),
]
_SIZE_GROUP_VALUES = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _SIZE_GROUPS)


@register(
    "interval_containment_groups",
    doc=(
        "Interval-containment classification — the species-group range join "
        "(vocab/SpeciesGroup.scala:13 isPartOfGroup: lft/rgt BETWEEN group "
        "interval) as a broadcast range join of facts against a small "
        "interval dimension, then a facet."
    ),
    oracle=f"""
        WITH groups(group_name, lo, hi) AS (VALUES {_SIZE_GROUP_VALUES})
        SELECT g.group_name, COUNT(*) AS n_parts,
               ROUND(AVG(p.p_retailprice), 4) AS avg_price
        FROM part p JOIN groups g ON p.p_size BETWEEN g.lo AND g.hi
        GROUP BY g.group_name
    """,
)
def interval_containment_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    groups = local_rows_df(
        spark, "group_name string, lo int, hi int", _SIZE_GROUPS
    )
    return (
        part.join(
            F.broadcast(groups),
            (part.p_size >= groups.lo) & (part.p_size <= groups.hi),
        )
        .groupBy("group_name")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


@register(
    "distinct_coordinates",
    doc=(
        "Distinct-before-expensive-join discipline — the pre-sampling "
        "coordinate dedup (tool/Sampling.scala:371-444, "
        "caches/LocationDAO.storePointForSampling): distinct key pairs with "
        "their multiplicity."
    ),
    oracle="""
        SELECT l_suppkey AS key_a, l_partkey AS key_b, COUNT(*) AS n_records
        FROM lineitem GROUP BY 1, 2
    """,
)
def distinct_coordinates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_suppkey").alias("key_a"), F.col("l_partkey").alias("key_b")
        )
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


@register(
    "rounding_ladder",
    doc=(
        "Multi-precision rounding ladder — the point-1/point-0.1/… blocking "
        "keys (index/IndexDAO.scala:170-210 getLatLongStringStep) applied to "
        "a numeric column; pure expressions, reused downstream as dedup "
        "blocking keys."
    ),
    oracle="""
        SELECT c_custkey,
               ROUND(c_acctbal, 2) AS bal_p2,
               ROUND(c_acctbal, 1) AS bal_p1,
               ROUND(c_acctbal, 0) AS bal_p0
        FROM customer
    """,
)
def rounding_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("bal_p2"),
        F.round("c_acctbal", 1).alias("bal_p1"),
        F.round("c_acctbal", 0).alias("bal_p0"),
    )


@register(
    "salted_skew_join",
    doc=(
        "Hot-key salted join (operators/skew.py): lineitem joined to a "
        "3-row flag dimension on l_returnflag - a maximally skewed key "
        "(~200k rows per value at sf0.1) that would pin one shuffle "
        "partition per flag. The salt widens the key 8x; results are "
        "row-identical to the plain join, which is exactly what the "
        "oracle checks. The aggregate collapses the output so the "
        "checked relation stays small while the join itself runs at "
        "full fact-table width."
    ),
    oracle="""
        SELECT f.flag_label,
               COUNT(*) AS n,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN (SELECT 'A' AS l_returnflag, 'accepted' AS flag_label
              UNION ALL SELECT 'N', 'none'
              UNION ALL SELECT 'R', 'returned') f
          ON l.l_returnflag = f.l_returnflag
        GROUP BY f.flag_label
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.skew import salted_join

    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    dim = local_rows_df(
        spark,
        "l_returnflag string, flag_label string",
        [("A", "accepted"), ("N", "none"), ("R", "returned")],
    )
    joined = salted_join(lineitem, dim, "l_returnflag", salt=8)
    return joined.groupBy("flag_label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@register(
    "grouped_percentiles",
    doc=(
        "Exact interpolated percentiles per group (median/p90/p99 of "
        "lineitem quantity by return flag): Spark's percentile() and "
        "DuckDB's quantile_cont() both implement type-R7 linear "
        "interpolation, so the values compare exactly after fixed-scale "
        "rounding. Exact percentiles sort each group — the right tool at "
        "dashboard cardinalities; a 100 TB per-key distribution sketch "
        "would use percentile_approx (t-digest-style, deliberately NOT "
        "oracle-checked here: its result depends on partition merge "
        "order, which no cross-engine oracle can pin)."
    ),
    oracle="""
        SELECT l_returnflag AS grp,
               ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
               ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90,
               ROUND(quantile_cont(l_quantity, 0.99), 4) AS p99
        FROM lineitem GROUP BY l_returnflag
    """,
)
def grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.99)), 4).alias("p99"),
    )
