"""Offline-analytics queries: fuzzy dedup pairs, jackknife outlier stats,
stored-query replay — the SURVEY §2.4/§2.5 analytics operators exercised on
the driver tables with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biocache_store_spark.io import read_table
from biocache_store_spark.queries import register

_LEV_THRESHOLD = 2


@register(
    "fuzzy_name_pairs",
    doc=(
        "Blocked fuzzy-duplicate pairs — the collector-Levenshtein core of "
        "duplicate detection (DuplicationDetection.isCollectorDuplicate, "
        "tool/DuplicationDetection.scala:1074-1113) as a blocking-key "
        "self-join: block on (nation, segment, name-prefix) — the analog "
        "of the (taxon, date) group — then levenshtein(name) <= 2 pairwise "
        "inside the block only. The 15-char prefix component makes the "
        "block count data-proportional (a fixed (nation, segment) key is "
        "125 blocks forever, so within-block pair work grows quadratically "
        "with scale; with the prefix each block stays O(1000) rows at any "
        "sf). Built-in levenshtein, no UDF."
    ),
    bench=True,
    oracle=f"""
        SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
               levenshtein(a.c_name, b.c_name) AS name_distance
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_mktsegment = b.c_mktsegment
         AND substring(a.c_name, 1, 15) = substring(b.c_name, 1, 15)
         AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= {_LEV_THRESHOLD}
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    # POSTING-LIST shape (the lsh_candidates/ngram discipline, r12): ONE
    # exchange on the blocking key + in-block pair generation, replacing
    # the self-join that shuffled the customer relation twice and probed a
    # hash table per row. Singleton blocks (most of them) drop before any
    # pair work. Blocks stay O(1000) rows by the 15-char-prefix component
    # (see the register doc), so the per-block collect_list buffer is as
    # bounded as the join's per-key hash bucket was. Measured at sf0.1:
    # 0.62-0.68s -> 0.46-0.55s isolated, identical 17k pairs.
    blocked = (
        customer.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.substring("c_name", 1, 15).alias("__pfx"),
        )
        .agg(F.collect_list(F.struct("c_custkey", "c_name")).alias("rows"))
        .filter(F.size("rows") >= 2)
    )
    pairs = (
        blocked.select(F.explode("rows").alias("a"), "rows")
        .select("a", F.explode("rows").alias("b"))
        .filter(F.col("a.c_custkey") < F.col("b.c_custkey"))
    )
    # threshold variant early-exits the DP once the bound is exceeded
    # (returns -1 above threshold); same result set, ~25% faster at sf0.1
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"), _LEV_THRESHOLD)
    return pairs.filter(dist >= 0).select(
        F.col("a.c_custkey").alias("cust_a"),
        F.col("b.c_custkey").alias("cust_b"),
        dist.alias("name_distance"),
    )


@register(
    "jackknife_outlier_stats",
    doc=(
        "Per-group reverse-jackknife outlier statistics "
        "(outliers/JackKnife.scala:14-99) over l_extendedprice by "
        "l_returnflag, via applyInPandas (needs the full sorted group). The "
        "oracle reproduces the algorithm in SQL: the outlier cascade "
        "collapses to a low/high cutoff on the sorted index."
    ),
    oracle="""
        WITH s AS (
            SELECT l_returnflag AS grp, l_extendedprice AS v,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS idx,
                   COUNT(*) OVER (PARTITION BY l_returnflag) AS n,
                   AVG(l_extendedprice) OVER (PARTITION BY l_returnflag) AS mean_v,
                   MIN(l_extendedprice) OVER (PARTITION BY l_returnflag) AS min_v,
                   MAX(l_extendedprice) OVER (PARTITION BY l_returnflag) AS max_v,
                   STDDEV_POP(l_extendedprice) OVER (PARTITION BY l_returnflag) AS sd_v
            FROM lineitem
        ),
        y AS (
            SELECT *,
                   (0.95 * sqrt(n) + 0.2) * ((max_v - min_v) / 50.0) AS threshold,
                   CASE
                     WHEN v < mean_v THEN
                       (LEAD(v) OVER (PARTITION BY grp ORDER BY idx) - v) * (mean_v - v)
                     WHEN v > mean_v THEN
                       (v - LAG(v) OVER (PARTITION BY grp ORDER BY idx)) * (v - mean_v)
                     ELSE 0.0
                   END / sd_v AS c
            FROM s
        ),
        cuts AS (
            SELECT grp,
                   MAX(n) AS n, MAX(min_v) AS min_v, MAX(max_v) AS max_v,
                   MAX(mean_v) AS mean_v, MAX(sd_v) AS sd_v, MAX(threshold) AS threshold,
                   MAX(CASE WHEN v < mean_v AND c > threshold THEN idx END) AS lo_cut,
                   MIN(CASE WHEN v > mean_v AND c > threshold THEN idx END) AS hi_cut
            FROM y GROUP BY grp
        ),
        counted AS (
            SELECT c.grp, c.n, c.min_v, c.max_v, c.mean_v, c.sd_v, c.threshold,
                   (SELECT COUNT(*) FROM y
                    WHERE y.grp = c.grp
                      AND (
                        (c.lo_cut IS NOT NULL AND y.idx <= c.lo_cut)
                        OR (c.hi_cut IS NOT NULL AND y.idx >= c.hi_cut)
                      )) AS n_flagged
            FROM cuts c
        )
        SELECT grp,
               n AS sample_size,
               ROUND(min_v, 4) AS min_value,
               ROUND(max_v, 4) AS max_value,
               ROUND(mean_v, 4) AS mean_value,
               ROUND(sd_v, 4) AS std_dev,
               ROUND(threshold, 4) AS threshold,
               CASE WHEN n_flagged > n // 2 THEN 0 ELSE n_flagged END AS n_outliers,
               (n_flagged > n // 2) AS trigger_failsafe
        FROM counted
        WHERE n >= 20
    """,
)
def jackknife_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.jackknife import jackknife_stats

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"), F.col("l_extendedprice").alias("v")
    )
    stats = jackknife_stats(li, ["grp"], "v")
    return stats.select(
        "grp",
        F.col("sample_size").cast("long").alias("sample_size"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        F.round("mean_value", 4).alias("mean_value"),
        F.round("std_dev", 4).alias("std_dev"),
        F.round("threshold", 4).alias("threshold"),
        F.col("n_outliers").cast("long").alias("n_outliers"),
        "trigger_failsafe",
    )


@register(
    "outlier_store_merge",
    doc=(
        "Persisted record-level outlier store with incremental merge "
        "(operators/outlier_store.py — ReverseJacknifeProcessor.scala "
        "storeResultsWithStats :324-412 / dao/OutlierStatsDAO.scala): a "
        "T0 store (records modified before the cutoff) is fully "
        "detected, the T1 ingest's touched groups are re-detected over "
        "ALL their records and merged in (touched groups replaced "
        "wholesale, untouched pass through, moved row_keys scrubbed). "
        "Synthetic extremes are injected into BOTH touched and untouched "
        "groups across two layers, so inherited rows and recomputed rows "
        "both carry outliers under the hash. Values are FLOORED to "
        "integers-as-doubles so both engines' means are exact sums. The "
        "oracle is the FULL-run ground truth on the T1 store — the hash "
        "asserts incremental merge == full recompute, with record-level "
        "outlier membership by VALUE (the reference maps outlier values "
        "back to cells, performJacknife :433-463)."
    ),
    oracle="""
        WITH rec AS (
            SELECT l_returnflag || '_' || CAST(l_orderkey % 4 AS VARCHAR)
                       AS taxon,
                   CAST(l_orderkey AS VARCHAR) || '-'
                       || CAST(l_linenumber AS VARCHAR) || '-'
                       || CAST(l_partkey AS VARCHAR) || '-'
                       || CAST(l_suppkey AS VARCHAR) || '-'
                       || CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) || '-'
                       || CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                               AS VARCHAR) AS row_key,
                   FLOOR(l_extendedprice
                         * CASE WHEN l_orderkey % 501 = 0 AND l_linenumber = 1
                                THEN 12 ELSE 1 END) AS el_price,
                   FLOOR(l_extendedprice
                         * (CAST(1.0 AS DOUBLE) - l_discount)
                         * CASE WHEN l_orderkey % 703 = 0 AND l_linenumber = 1
                                THEN 15 ELSE 1 END) AS el_net
            FROM lineitem
        ),
        long AS (
            SELECT taxon, 'el_price' AS layer, row_key, el_price AS v FROM rec
            UNION ALL
            SELECT taxon, 'el_net' AS layer, row_key, el_net AS v FROM rec
        ),
        s AS (
            SELECT *, COUNT(*) OVER w AS n, AVG(v) OVER w AS mean_v,
                   MIN(v) OVER w AS min_v, MAX(v) OVER w AS max_v,
                   STDDEV_POP(v) OVER w AS sd_v
            FROM long WINDOW w AS (PARTITION BY taxon, layer)
        ),
        y AS (
            SELECT *,
              (0.95 * sqrt(n) + 0.2) * ((max_v - min_v)
                  / CAST(50.0 AS DOUBLE)) AS threshold,
              CASE WHEN v < mean_v THEN
                     (LEAD(v) OVER (PARTITION BY taxon, layer
                                    ORDER BY v, row_key) - v) * (mean_v - v)
                   WHEN v > mean_v THEN
                     (v - LAG(v) OVER (PARTITION BY taxon, layer
                                       ORDER BY v, row_key)) * (v - mean_v)
                   ELSE CAST(0.0 AS DOUBLE) END / sd_v AS c
            FROM s WHERE max_v > min_v AND n >= 20
        ),
        cuts AS (
            SELECT taxon, layer,
                   MAX(CASE WHEN v < mean_v AND c > threshold THEN v END)
                       AS lo_val,
                   MIN(CASE WHEN v > mean_v AND c > threshold THEN v END)
                       AS hi_val
            FROM y GROUP BY taxon, layer
        ),
        flagged AS (
            SELECT y.*,
                   ((cuts.lo_val IS NOT NULL AND y.v <= cuts.lo_val)
                    OR (cuts.hi_val IS NOT NULL AND y.v >= cuts.hi_val))
                       AS flag
            FROM y JOIN cuts USING (taxon, layer)
        ),
        fs AS (
            SELECT taxon, layer,
                   SUM(CASE WHEN flag THEN 1 ELSE 0 END) > MAX(n) // 2
                       AS failsafe
            FROM flagged GROUP BY taxon, layer
        )
        SELECT f.taxon, f.layer, f.row_key, f.v AS val,
               (f.flag AND NOT fs.failsafe) AS is_outlier,
               f.n AS sample_size,
               ROUND(f.threshold, 4) + 0.0 AS threshold,
               fs.failsafe AS trigger_failsafe
        FROM flagged f JOIN fs USING (taxon, layer)
    """,
)
def outlier_store_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.outlier_store import (
        jackknife_record_outliers,
        merge_outlier_results,
    )

    li = read_table(spark, sf_dir, "lineitem")
    ok = F.col("l_orderkey")
    boost = lambda m, x: F.when(  # noqa: E731
        (F.pmod(ok, F.lit(m)) == 0) & (F.col("l_linenumber") == 1), F.lit(x)
    ).otherwise(F.lit(1))
    recs = li.select(
        F.concat(
            F.col("l_returnflag"),
            F.lit("_"),
            F.pmod(ok, F.lit(4)).cast("string"),
        ).alias("taxon"),
        # the synthetic lineitem table does NOT keep (orderkey,
        # linenumber) unique, so the record id folds in enough columns to
        # be a real key at every SF (FLOOR, not ROUND: identical IEEE
        # doubles floor identically in both engines)
        F.concat_ws(
            "-",
            ok.cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_partkey").cast("string"),
            F.col("l_suppkey").cast("string"),
            F.col("l_quantity").cast("int").cast("string"),
            F.floor(F.col("l_extendedprice") * 100).cast("bigint").cast("string"),
        ).alias("oid"),
        F.floor(F.col("l_extendedprice") * boost(501, 12))
        .cast("double")
        .alias("el_price"),
        F.floor(
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * boost(703, 15)
        )
        .cast("double")
        .alias("el_net"),
        # orderkey%10==0 records arrive at T1: only their taxa
        # (suffix _0/_2 — multiples of 10 are even) are touched
        F.when(F.pmod(ok, F.lit(10)) == 0, F.lit("2026-02-01"))
        .otherwise(F.lit("2026-01-01"))
        .alias("lastModifiedTime"),
    )
    detect = lambda d: jackknife_record_outliers(  # noqa: E731
        d, ["taxon"], ["el_price", "el_net"], "oid"
    )
    t1 = recs
    t0 = recs.filter(F.col("lastModifiedTime") < "2026-01-15")
    prev = detect(t0)
    groups = (
        t1.filter(F.col("lastModifiedTime") >= "2026-01-15")
        .select("taxon")
        .distinct()
    )
    inc = detect(t1.join(groups, "taxon", "left_semi"))
    merged = merge_outlier_results(prev, inc, groups, ["taxon"])
    return merged.select(
        "taxon",
        "layer",
        "row_key",
        F.col("value").alias("val"),
        "is_outlier",
        F.col("sample_size").cast("long").alias("sample_size"),
        (F.round("threshold", 4) + F.lit(0.0)).alias("threshold"),
        "trigger_failsafe",
    )


@register(
    "duplicate_markup_writeback",
    doc=(
        "Duplicate write-back under the external hash gate "
        "(operators/dedup.py duplicate_markup + apply_duplicate_markup — "
        "DuplicationDetection.scala:588-651's per-record occ writes): the "
        "detected clusters are applied to a record store, so the hash "
        "pins the representative's pipe-joined member list, each "
        "duplicate's representative link and dup-type ids, the "
        "INFERRED_DUPLICATE_RECORD assertion presence, and the NULL "
        "markup on unique records. The oracle derives the same relation "
        "from the cluster arithmetic."
    ),
    oracle="""
        WITH occ AS (
            SELECT printf('c%09d', c_custkey) AS row_key,
                   c_mktsegment AS druid,
                   c_custkey // 4 AS cid,
                   c_custkey % 4 AS m
            FROM customer
        ),
        rec AS (
            SELECT row_key, druid, cid,
                   CASE WHEN m = 0 THEN 2 ELSE 0 END AS prec0
            FROM occ
        ),
        cl AS (
            SELECT *,
                   COUNT(*) OVER (PARTITION BY cid) AS n,
                   MIN(row_key) OVER (PARTITION BY cid) AS rep_key,
                   MAX(prec0) OVER (PARTITION BY cid) AS max_prec
            FROM rec
        ),
        st AS (
            SELECT *,
                   CASE WHEN n = 1 THEN 'U'
                        WHEN row_key = rep_key THEN 'R'
                        ELSE 'D' END AS status,
                   CASE WHEN max_prec = 2 THEN '5|6' ELSE '4|6' END AS dt
            FROM cl
        ),
        members AS (
            SELECT cid,
                   STRING_AGG(row_key, '|' ORDER BY row_key) AS member_list
            FROM st WHERE status = 'D' GROUP BY cid
        )
        SELECT s.row_key,
               CASE WHEN s.status IN ('R', 'D') THEN s.status END
                   AS dup_status,
               CASE WHEN s.status = 'R' THEN mem.member_list
                    WHEN s.status = 'D' THEN s.rep_key END AS assoc,
               CASE WHEN s.status = 'D' THEN s.dt END AS dup_type,
               (s.status = 'D') AS has_dup_assertion
        FROM st s LEFT JOIN members mem ON s.cid = mem.cid
    """,
)
def duplicate_markup_writeback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.dedup import (
        apply_duplicate_markup,
        detect_duplicates,
    )
    from biocache_store_spark.processors.assertions import AssertionCodes
    from biocache_store_spark.processors.chain import ASSERTION_TYPE

    customer = read_table(spark, sf_dir, "customer")
    occ = _dedup_occ_synthesis(customer)
    dups = detect_duplicates(occ)
    store = occ.select(
        F.col("occurrenceID").alias("row_key"),
        F.array().cast(ASSERTION_TYPE).alias("assertions"),
    )
    marked = apply_duplicate_markup(store, dups, key_col="row_key")
    code = AssertionCodes.INFERRED_DUPLICATE_RECORD.code
    return marked.select(
        "row_key",
        F.col("duplicationStatus_p").alias("dup_status"),
        F.col("associatedOccurrences_p").alias("assoc"),
        F.col("duplicationType_p").alias("dup_type"),
        F.exists(
            F.col("assertions"), lambda a: a["code"] == F.lit(code)
        ).alias("has_dup_assertion"),
    )


@register(
    "outlier_assertion_markup",
    doc=(
        "Outlier assertion write-back under the external hash gate "
        "(operators/outlier_store.py apply_outlier_assertions — "
        "ReverseJacknifeProcessor.scala:370-410): a synthetic rollup "
        "(every 7th record an outlier for custkey%3+1 layers) and revert "
        "list (every 11th, unless also an outlier) are applied to a "
        "record store whose even records carry a pre-existing "
        "DETECTED_OUTLIER entry — so the hash pins the replace-never-"
        "duplicate rule, the failed 'Outlier for N layers' comment, the "
        "passed revert flip, and untouched rows keeping their entry."
    ),
    oracle="""
        WITH rec AS (
            SELECT 'c' || CAST(c_custkey AS VARCHAR) AS row_key,
                   c_custkey % 7 = 0 AS is_out,
                   c_custkey % 11 = 0 AS in_revert,
                   c_custkey % 2 = 0 AS pre_marked,
                   CAST(c_custkey % 3 + 1 AS INTEGER) AS n_layers
            FROM customer
        )
        SELECT row_key,
               CASE WHEN is_out THEN 0
                    WHEN in_revert THEN 1
                    WHEN pre_marked THEN 0 END AS qa_status,
               CASE WHEN is_out
                        THEN 'Outlier for ' || CAST(n_layers AS VARCHAR)
                             || ' layers'
                    WHEN in_revert THEN ''
                    WHEN pre_marked THEN 'stale' END AS comment,
               CAST(is_out OR in_revert OR pre_marked AS BOOLEAN)
                   AS has_entry
        FROM rec
    """,
)
def outlier_assertion_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.outlier_store import (
        apply_outlier_assertions,
    )
    from biocache_store_spark.processors.assertions import AssertionCodes
    from biocache_store_spark.processors.chain import ASSERTION_TYPE

    code = AssertionCodes.DETECTED_OUTLIER.code
    name = AssertionCodes.DETECTED_OUTLIER.name
    customer = read_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    key = F.concat(F.lit("c"), k.cast("string"))
    # even records carry a stale pre-existing DETECTED_OUTLIER entry that
    # the markup must REPLACE (outliers/reverts) or leave alone (others)
    pre = F.struct(
        F.lit(code).alias("code"),
        F.lit(name).alias("name"),
        F.lit(0).alias("qa_status"),
        F.lit("stale").alias("comment"),
    )
    store = customer.select(
        key.alias("row_key"),
        F.when(
            F.pmod(k, F.lit(2)) == 0, F.array(pre).cast(ASSERTION_TYPE)
        )
        .otherwise(F.array().cast(ASSERTION_TYPE))
        .alias("assertions"),
    )
    rollup = customer.filter(F.pmod(k, F.lit(7)) == 0).select(
        key.alias("row_key"),
        F.array(F.lit("el1")).alias("outlier_for_layers"),
        (F.pmod(k, F.lit(3)) + 1).cast("int").alias(
            "outlier_for_layers_count"
        ),
    )
    reverts = customer.filter(
        (F.pmod(k, F.lit(11)) == 0) & (F.pmod(k, F.lit(7)) != 0)
    ).select(key.alias("row_key"))
    marked = apply_outlier_assertions(store, rollup, reverts, key_col="row_key")
    entry = F.filter(F.col("assertions"), lambda a: a["code"] == F.lit(code))
    first = F.try_element_at(entry, F.lit(1))  # ANSI: empty array must yield NULL
    return marked.select(
        "row_key",
        first["qa_status"].alias("qa_status"),
        first["comment"].alias("comment"),
        (F.size(entry) == 1).alias("has_entry"),
    )


_QID_QUERY = "o_orderpriority:1-URGENT AND o_totalprice:[100000 TO *]"


@register(
    "stored_query_replay",
    doc=(
        "Stored-query (qid) replay: a persisted SOLR q string "
        "(model/Qid.scala:8-27) translated to a Column predicate by "
        "plans/solr_query.py and applied as a filter — the validation-rule "
        "application path (qa/ValidationRuleRunner.scala:151-260)."
    ),
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice >= 100000
    """,
)
def stored_query_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.plans.solr_query import translate

    orders = read_table(spark, sf_dir, "orders")
    return orders.filter(translate(_QID_QUERY)).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )


@register(
    "index_projection_facet",
    doc=(
        "End-to-end process+index facet: occurrence-shaped records "
        "synthesized from customer run through the REAL 12-stage chain "
        "(processors/chain.process_records, one Arrow-batched mapInPandas "
        "pass) and the data-driven ~160-column index projection "
        "(operators/index_projection.build_index over the "
        "headerAttributes table, IndexDAO.scala:212-466), then the "
        "reference's most common production query: facet counts over "
        "basis_of_record gated on geospatial_kosher "
        "(SolrIndexDAO.pageOverFacet). The oracle replays the vocabulary "
        "canonicalization and the out-of-range kosher rule in SQL."
    ),
    oracle="""
        SELECT CASE c_custkey % 4
                 WHEN 0 THEN 'PreservedSpecimen'
                 WHEN 1 THEN 'HumanObservation'
                 WHEN 2 THEN 'PreservedSpecimen'
                 ELSE 'MachineObservation' END AS facet_value,
               COUNT(*) AS facet_count
        FROM customer
        WHERE c_custkey % 10 <> 0  -- lat -200.5: out of range, not invertible -> not kosher
        GROUP BY 1
    """,
)
def index_projection_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.index_projection import (
        build_index,
        facet_counts,
    )
    from biocache_store_spark.processors.chain import process_records

    customer = read_table(spark, sf_dir, "customer")
    occ = customer.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("occurrenceID"),
        F.col("c_mktsegment").alias("dataResourceUid"),
        # 'S' exercises the single-letter vocabulary variant -> PreservedSpecimen
        F.element_at(
            F.array(
                F.lit("PreservedSpecimen"),
                F.lit("HumanObservation"),
                F.lit("S"),
                F.lit("MachineObservation"),
            ),
            (F.pmod(F.col("c_custkey"), F.lit(4)) + 1).cast("int"),
        ).alias("basisOfRecord"),
        F.when(F.pmod(F.col("c_custkey"), F.lit(10)) == 0, F.lit("-200.5"))
        .otherwise(
            F.concat(F.lit("-"), F.pmod(F.col("c_custkey"), F.lit(80)).cast("string"), F.lit(".5"))
        )
        .alias("decimalLatitude"),
        F.concat(F.pmod(F.col("c_custkey"), F.lit(160)).cast("string"), F.lit(".25")).alias(
            "decimalLongitude"
        ),
        F.lit("WGS84").alias("geodeticDatum"),
    )
    index = build_index(process_records(occ))
    kosher = index.filter(F.col("geospatial_kosher"))
    return facet_counts(kosher, "basis_of_record").select("facet_value", "facet_count")


@register(
    "taxon_name_match",
    doc=(
        "Taxonomic name-match ladder (processors/taxonomy.py "
        "match_names_spark — the ClassificationProcessor/ClassificationDAO "
        "semantics, ClassificationProcessor.scala:152-305): staged "
        "broadcast joins on exact-normalized-name then canonical "
        "genus+epithet keys, then the Taxamatch-style fuzzy tier "
        "(genus-stem blocking, levenshtein budget 2), with homonym keys "
        "resolved through the record's kingdom. Names dimension "
        "synthesized from part (first two words of p_name; p_brand plays "
        "kingdom, so names spanning brands are homonyms); records query "
        "in four modes: exact name, case-folded name, genus+epithet "
        "only, and an epithet typo that only the fuzzy tier can match."
    ),
    oracle="""
        WITH words AS (
            SELECT p_partkey, p_brand,
                   string_split(p_name, ' ')[1] || ' ' || string_split(p_name, ' ')[2] AS nm
            FROM part
        ),
        dim AS (
            SELECT nm, p_brand AS kingdom, MIN(p_partkey) AS lsid
            FROM words GROUP BY nm, p_brand
        ),
        keyagg AS (
            SELECT nm, COUNT(*) AS n_candidates, MIN(lsid) AS any_lsid
            FROM dim GROUP BY nm
        ),
        rec AS (
            SELECT p_partkey, nm,
                   CASE WHEN p_partkey % 2 = 0 THEN p_brand END AS kingdom,
                   CASE WHEN p_partkey % 4 = 2 THEN 'canonicalMatch'
                        WHEN p_partkey % 4 = 3 THEN 'fuzzy'
                        ELSE 'exactMatch' END AS tier
            FROM words
        ),
        resolved AS (
            SELECT r.p_partkey, r.tier, r.nm, k.n_candidates, k.any_lsid,
                   d.lsid AS kingdom_lsid
            FROM rec r
            LEFT JOIN keyagg k ON r.nm = k.nm
            LEFT JOIN dim d ON r.nm = d.nm AND r.kingdom = d.kingdom
            WHERE r.tier <> 'fuzzy'
        ),
        fcand AS (
            SELECT r.p_partkey, r.kingdom AS rk, d.lsid, d.nm,
                   d.kingdom AS dk,
                   levenshtein(string_split(d.nm, ' ')[1],
                               string_split(r.nm, ' ')[1])
                 + levenshtein(string_split(d.nm, ' ')[2],
                               string_split(r.nm, ' ')[2] || 'x') AS dist
            FROM rec r JOIN dim d
              ON substring(string_split(d.nm, ' ')[1], 1, 4)
               = substring(string_split(r.nm, ' ')[1], 1, 4)
            WHERE r.tier = 'fuzzy'
        ),
        fval AS (SELECT * FROM fcand WHERE dist <= 2),
        fmin AS (SELECT p_partkey, MIN(dist) AS mind FROM fval GROUP BY 1),
        fbest AS (
            SELECT v.* FROM fval v
            JOIN fmin m ON v.p_partkey = m.p_partkey AND v.dist = m.mind
        ),
        fagg AS (
            SELECT p_partkey,
                   COUNT(DISTINCT lsid) AS n_l,
                   MIN(lsid) AS min_lsid,
                   ARG_MIN(nm, lsid) AS min_nm,
                   BOOL_OR(rk IS NOT NULL) AS has_k,
                   COUNT(DISTINCT lsid) FILTER (WHERE dk = rk) AS k_n,
                   MIN(lsid) FILTER (WHERE dk = rk) AS k_lsid,
                   ARG_MIN(nm, lsid) FILTER (WHERE dk = rk) AS k_nm
            FROM fbest GROUP BY p_partkey
        ),
        fres AS (
            SELECT r.p_partkey,
                   CASE WHEN f.n_l = 1 THEN f.min_lsid
                        WHEN f.has_k AND f.k_n = 1 THEN f.k_lsid
                   END AS matched_lsid,
                   CASE WHEN f.n_l = 1 THEN f.min_nm
                        WHEN f.has_k AND f.k_n = 1 THEN f.k_nm
                   END AS matched_name,
                   f.n_l
            FROM rec r LEFT JOIN fagg f ON r.p_partkey = f.p_partkey
            WHERE r.tier = 'fuzzy'
        )
        SELECT p_partkey,
               CASE WHEN n_candidates = 1 THEN any_lsid
                    WHEN n_candidates > 1 THEN kingdom_lsid END AS matched_lsid,
               CASE WHEN n_candidates = 1 OR kingdom_lsid IS NOT NULL
                    THEN nm END AS matched_name,
               CASE WHEN n_candidates = 1 OR kingdom_lsid IS NOT NULL
                    THEN tier END AS match_type,
               COALESCE(n_candidates > 1 AND kingdom_lsid IS NULL, FALSE) AS is_homonym
        FROM resolved
        UNION ALL
        SELECT p_partkey, matched_lsid, matched_name,
               CASE WHEN matched_lsid IS NOT NULL THEN 'fuzzyMatch' END AS match_type,
               (n_l IS NOT NULL AND matched_lsid IS NULL) AS is_homonym
        FROM fres
    """,
)
def taxon_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.processors.taxonomy import match_names_spark

    part = read_table(spark, sf_dir, "part")
    nm = F.concat_ws(
        " ",
        F.element_at(F.split(F.col("p_name"), " "), 1),
        F.element_at(F.split(F.col("p_name"), " "), 2),
    )
    words = part.select("p_partkey", "p_brand", nm.alias("nm"))
    names = (
        words.groupBy("nm", "p_brand")
        .agg(F.min("p_partkey").alias("lsid"))
        .select(
            "lsid",
            F.col("nm").alias("scientificName"),
            F.col("p_brand").alias("kingdom"),
        )
    )
    mode = F.pmod(F.col("p_partkey"), F.lit(4))
    records = words.select(
        "p_partkey",
        F.when(mode == 0, F.col("nm"))
        .when(mode == 1, F.upper(F.col("nm")))
        # mode 3: epithet typo (trailing character) — misses the exact and
        # canonical keys, lands in the same genus-stem fuzzy block at
        # distance 1
        .when(mode == 3, F.concat(F.col("nm"), F.lit("x")))
        .alias("scientificName"),
        F.when(mode == 2, F.element_at(F.split(F.col("nm"), " "), 1)).alias("genus"),
        F.when(mode == 2, F.element_at(F.split(F.col("nm"), " "), 2)).alias(
            "specificEpithet"
        ),
        F.when(F.pmod(F.col("p_partkey"), F.lit(2)) == 0, F.col("p_brand")).alias(
            "kingdom"
        ),
    )
    out = match_names_spark(records, names)
    return out.select(
        "p_partkey",
        "matched_lsid",
        F.col("matched_scientificName").alias("matched_name"),
        "match_type",
        "is_homonym",
    )


@register(
    "dedup_occurrence_clusters",
    doc=(
        "Full grouped duplicate detection (tool/DuplicationDetection.scala: "
        "blocking group -> pairwise spatial+collector match -> "
        "representative by precision, findDuplicates :966-1013, "
        "markRecordsAsDuplicatesAndSetTypes :874-926) run through the real "
        "applyInPandas operator on occurrence-shaped records synthesized "
        "from customer. The synthesis is designed so the pairwise match "
        "relation is an equivalence (cluster-constant collector; integer "
        "coordinates whose 2-decimal variant matches via the precision "
        "ladder walk of isSpatialDuplicate :1122-1158), which makes the "
        "greedy iterative outcome exactly reproducible with window "
        "functions in the DuckDB oracle: representative = min row_key "
        "(ties) unless a higher-precision member exists (it is the min-key "
        "member by construction), D1/D2 split on the representative's "
        "resource, dup types 6+5 (exact collector + different precision) "
        "or 6+4 (exact coord). Cluster coordinates are globally unique "
        "(lon = cluster id), so cross-cluster pairs always fail the spatial "
        "gate at rung 0 regardless of scale factor. The fuzzy paths "
        "(Levenshtein collector, record/catalogue numbers, missing dates) "
        "are covered by the unit matrix in tests/test_operators_offline.py."
    ),
    oracle="""
        WITH occ AS (
            SELECT printf('c%09d', c_custkey) AS row_key,
                   c_mktsegment AS druid,
                   c_custkey // 4 AS cid,
                   c_custkey % 4 AS m
            FROM customer
        ),
        rec AS (
            SELECT row_key, druid, cid,
                   CAST(cid % 25 AS VARCHAR) AS taxon,
                   CASE WHEN m = 0 THEN 2 ELSE 0 END AS prec0
            FROM occ
        ),
        cl AS (
            SELECT *,
                   COUNT(*) OVER (PARTITION BY cid) AS n,
                   MIN(row_key) OVER (PARTITION BY cid) AS rep_key,
                   MAX(prec0) OVER (PARTITION BY cid) AS max_prec,
                   FIRST_VALUE(druid) OVER (
                       PARTITION BY cid ORDER BY row_key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                   ) AS rep_druid
            FROM rec
        )
        SELECT taxon,
               '2000' AS year, '01' AS month, '05' AS day,
               row_key,
               CASE WHEN n = 1 THEN 'U'
                    WHEN row_key = rep_key THEN 'R'
                    WHEN druid = rep_druid THEN 'D1'
                    ELSE 'D2' END AS status,
               CASE WHEN n > 1 AND row_key <> rep_key THEN rep_key END AS duplicate_of,
               CASE WHEN n = 1 OR row_key = rep_key THEN ''
                    WHEN max_prec = 2 THEN '5,6'
                    ELSE '4,6' END AS dup_types,
               CAST(CASE WHEN n > 1 AND row_key = rep_key THEN max_prec
                         ELSE 0 END AS INTEGER) AS precision
        FROM cl
    """,
)
def dedup_occurrence_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.dedup import detect_duplicates

    customer = read_table(spark, sf_dir, "customer")
    # cluster coordinates are globally unique (lon = cid), so the spatial
    # gate always rejects cross-cluster pairs at rung 0 at ANY scale factor —
    # fuzzy-collector near-misses between "Collector-25"/"Collector-50" can
    # never merge clusters (see _dedup_occ_synthesis, shared with the
    # incremental variant; the lastModifiedTime it adds is ignored here)
    occ = _dedup_occ_synthesis(customer)
    res = detect_duplicates(occ)
    # the driver's canonicalizer cannot hash array cells: emit dup_types as a
    # sorted comma-joined string (the library API keeps the typed array)
    return res.select(
        "taxon",
        "year",
        "month",
        "day",
        "row_key",
        "status",
        "duplicate_of",
        F.array_join(F.col("dup_types").cast("array<string>"), ",").alias("dup_types"),
        "precision",
    )


def _dedup_occ_synthesis(customer):
    """The dedup_occurrence_clusters record synthesis, shared with the
    incremental variant so both queries detect over the identical store."""
    cid = F.expr("c_custkey DIV 4")
    member = F.expr("c_custkey % 4")
    lat_int = F.expr("(c_custkey DIV 4) DIV 25").cast("int")
    lon_int = cid.cast("int")
    return customer.select(
        F.format_string("c%09d", F.col("c_custkey")).alias("occurrenceID"),
        F.col("c_mktsegment").alias("dataResourceUid"),
        F.pmod(cid, F.lit(25)).cast("string").alias("taxonConceptID"),
        F.lit("2000").alias("year"),
        F.lit("01").alias("month"),
        F.lit("05").alias("day"),
        F.when(member == 0, F.concat(lat_int.cast("string"), F.lit(".01")))
        .otherwise(lat_int.cast("string"))
        .alias("decimalLatitude"),
        F.when(member == 0, F.concat(lon_int.cast("string"), F.lit(".01")))
        .otherwise(lon_int.cast("string"))
        .alias("decimalLongitude"),
        F.concat(F.lit("Collector-"), cid.cast("string")).alias("recordedBy"),
        F.lit(None).cast("string").alias("recordNumber"),
        F.lit(None).cast("string").alias("catalogNumber"),
        # the incremental fixture: clusters whose cid % 5 == 0 had their
        # high-precision member (m == 0) arrive in a LATER load. taxon =
        # cid % 25, so taxa {0,5,10,15,20} are touched (every one of
        # their clusters gained a record) and the other 20 taxa are not.
        F.when(
            (F.pmod(cid, F.lit(5)) == 0) & (member == 0), F.lit("2026-02-01")
        )
        .otherwise(F.lit("2026-01-01"))
        .alias("lastModifiedTime"),
    )


@register(
    "dedup_incremental_merge",
    doc=(
        "Incremental duplication detection under the external hash gate "
        "(operators/dedup.py touched_taxa + detect_duplicates_scoped + "
        "merge_dedup_results — tool/IncrementalDuplicationDetection.scala): "
        "a T0 store missing the later-loaded records is fully detected, "
        "then the T1 ingest's touched taxa (derived from lastModifiedTime) "
        "are re-detected over ALL their records and merged into the "
        "standing result, touched taxa replaced wholesale. The later "
        "arrivals are each cluster's HIGH-PRECISION member, so the merge "
        "must flip representatives and dup-type codes, and the departed-"
        "record revert is exercised structurally (T0 rows for touched taxa "
        "are dropped, never patched). The oracle is the FULL-run ground "
        "truth on the T1 store — the hash asserts incremental == full, the "
        "correctness contract of the reference's --inc mode."
    ),
    oracle="""
        WITH occ AS (
            SELECT printf('c%09d', c_custkey) AS row_key,
                   c_mktsegment AS druid,
                   c_custkey // 4 AS cid,
                   c_custkey % 4 AS m
            FROM customer
        ),
        rec AS (
            SELECT row_key, druid, cid,
                   CAST(cid % 25 AS VARCHAR) AS taxon,
                   CASE WHEN m = 0 THEN 2 ELSE 0 END AS prec0
            FROM occ
        ),
        cl AS (
            SELECT *,
                   COUNT(*) OVER (PARTITION BY cid) AS n,
                   MIN(row_key) OVER (PARTITION BY cid) AS rep_key,
                   MAX(prec0) OVER (PARTITION BY cid) AS max_prec,
                   FIRST_VALUE(druid) OVER (
                       PARTITION BY cid ORDER BY row_key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                   ) AS rep_druid
            FROM rec
        )
        SELECT taxon,
               '2000' AS year, '01' AS month, '05' AS day,
               row_key,
               CASE WHEN n = 1 THEN 'U'
                    WHEN row_key = rep_key THEN 'R'
                    WHEN druid = rep_druid THEN 'D1'
                    ELSE 'D2' END AS status,
               CASE WHEN n > 1 AND row_key <> rep_key THEN rep_key END AS duplicate_of,
               CASE WHEN n = 1 OR row_key = rep_key THEN ''
                    WHEN max_prec = 2 THEN '5,6'
                    ELSE '4,6' END AS dup_types,
               CAST(CASE WHEN n > 1 AND row_key = rep_key THEN max_prec
                         ELSE 0 END AS INTEGER) AS precision
        FROM cl
    """,
)
def dedup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.dedup import (
        detect_duplicates,
        detect_duplicates_scoped,
        merge_dedup_results,
        touched_taxa,
    )

    customer = read_table(spark, sf_dir, "customer")
    t1 = _dedup_occ_synthesis(customer)
    t0 = t1.filter(F.col("lastModifiedTime") < "2026-01-15")
    prev = detect_duplicates(t0)
    taxa = touched_taxa(t1, since="2026-01-15")
    inc = detect_duplicates_scoped(t1, taxa)
    merged = merge_dedup_results(prev, inc, taxa)
    return merged.select(
        "taxon",
        "year",
        "month",
        "day",
        "row_key",
        "status",
        "duplicate_of",
        F.array_join(F.col("dup_types").cast("array<string>"), ",").alias("dup_types"),
        "precision",
    )


@register(
    "sds_generalization",
    doc=(
        "Full SDS outcome application (processors/sds.py apply_sds — "
        "SensitivityProcessor.scala:37-302 semantics): rules synthesized "
        "over 40 species with WITHHOLD / zone-scoped / everywhere "
        "conservation instances; records from customer with zone, "
        "coordinates and uncertainty derived from c_custkey/c_acctbal. "
        "Exercises the zone filter, most-restrictive-instance pick, the "
        "coordinate grid ladder, uncertainty addition "
        "(SensitivityProcessor.scala:181-201) and coordinate withholding."
    ),
    oracle="""
        WITH rec AS (
            SELECT c_custkey,
                   (c_custkey % 40) % 4 AS m,
                   (c_custkey % 7) = ((c_custkey % 40) % 7) AS in_zone,
                   -10 - (c_custkey % 60) - c_acctbal / 100000 AS lat,
                   110 + (c_custkey % 50) + c_acctbal / 100000 AS lon,
                   (c_custkey % 4) * 10 AS unc
            FROM customer
        ),
        matched AS (
            SELECT c_custkey, lat, lon, unc,
                   CASE WHEN m = 0 AND in_zone THEN 'WITHHOLD'
                        WHEN m = 1 THEN '10km'
                        WHEN m = 2 AND in_zone THEN '10km'
                        WHEN m = 2 THEN '1km' END AS gen
            FROM rec
        )
        SELECT c_custkey,
               gen IS NOT NULL AS sensitive,
               gen,
               CASE WHEN gen = 'WITHHOLD' THEN NULL
                    WHEN gen = '10km' THEN round(lat, 1)
                    WHEN gen = '1km' THEN round(lat, 2)
                    ELSE lat END AS lat_g,
               CASE WHEN gen = 'WITHHOLD' THEN NULL
                    WHEN gen = '10km' THEN round(lon, 1)
                    WHEN gen = '1km' THEN round(lon, 2)
                    ELSE lon END AS lon_g,
               CASE WHEN gen = 'WITHHOLD' THEN NULL
                    WHEN gen = '10km' THEN unc + 10000
                    WHEN gen = '1km' THEN unc + 1000
                    ELSE unc END AS unc_g,
               CASE WHEN gen = 'WITHHOLD'
                    THEN 'Record is WITHHOLD: location withheld' END
                   AS info_withheld,
               CASE WHEN gen IN ('10km', '1km') THEN
                    'Coordinates generalised to ' ||
                    CASE gen WHEN '10km' THEN '10000' ELSE '1000' END ||
                    'm (' || gen || ')' END AS data_generalizations
        FROM matched
    """,
)
def sds_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.processors.sds import apply_sds

    customer = read_table(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    records = customer.select(
        ck.alias("rowKey"),
        F.concat(F.lit("Species "), (ck % 40).cast("string")).alias("scientificName"),
        F.concat(F.lit("ZONE"), (ck % 7).cast("string")).alias("stateProvince"),
        (F.lit(-10) - (ck % 60) - F.col("c_acctbal") / 100000)
        .cast("string")
        .alias("decimalLatitude"),
        (F.lit(110) + (ck % 50) + F.col("c_acctbal") / 100000)
        .cast("string")
        .alias("decimalLongitude"),
        ((ck % 4) * 10).cast("string").alias("coordinateUncertaintyInMeters"),
    )
    s = F.col("id")
    species = F.concat(F.lit("Species "), s.cast("string"))
    zone_s = F.concat(F.lit("ZONE"), (s % 7).cast("string"))
    base = spark.range(40)
    withhold_rules = base.filter(s % 4 == 0).select(
        species.alias("scientificName"), zone_s.alias("zone"),
        F.lit("WITHHOLD").alias("generalisation"),
    )
    everywhere_rules = base.filter(s % 4 == 1).select(
        species.alias("scientificName"), F.lit(None).cast("string").alias("zone"),
        F.lit("10km").alias("generalisation"),
    )
    zoned_rules = base.filter(s % 4 == 2).select(
        species.alias("scientificName"), zone_s.alias("zone"),
        F.lit("10km").alias("generalisation"),
    )
    fallback_rules = base.filter(s % 4 == 2).select(
        species.alias("scientificName"), F.lit(None).cast("string").alias("zone"),
        F.lit("1km").alias("generalisation"),
    )
    rules = (
        withhold_rules.unionByName(everywhere_rules)
        .unionByName(zoned_rules)
        .unionByName(fallback_rules)
        .withColumn("category", F.col("generalisation"))
    )
    out = apply_sds(records, rules, id_col="rowKey")
    return out.select(
        F.col("rowKey").alias("c_custkey"),
        "sensitive",
        F.col("sds_generalisation").alias("gen"),
        F.col("decimalLatitude").cast("double").alias("lat_g"),
        F.col("decimalLongitude").cast("double").alias("lon_g"),
        F.col("coordinateUncertaintyInMeters").cast("double").alias("unc_g"),
        F.col("informationWithheld").alias("info_withheld"),
        F.col("dataGeneralizations").alias("data_generalizations"),
    )
