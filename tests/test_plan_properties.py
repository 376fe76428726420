"""Physical-plan regression gates for the headline queries.

tools/plan_audit.py sweeps every registered query per round; these tests
pin the specific plan properties that past rounds fixed by measurement,
so a regression fails CI instead of surfacing as a silent slowdown:

  * the minhash signature relation must never be broadcast (it scales
    with the corpus; AQE broadcasting it also collected it onto the
    driver heap — measured 80+s of GC at sf0.1),
  * dimension enrichment must plan as BroadcastHashJoin with zero
    sort-merge (nation/region are true dims),
  * top-k must plan as TakeOrderedAndProject, not a global sort,
  * scans must prune columns (ReadSchema carries only what's selected)
    and push filters.
"""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_minhash_signature_relation_not_broadcast(spark, sf_dir):
    from biocache_store_spark.io import read_table
    from biocache_store_spark.operators.minhash import near_duplicates

    docs = read_table(spark, sf_dir, "documents")
    plan = _plan(near_duplicates(docs, threshold=0.5, max_bucket_size=1000))
    # the verification join's build sides are shuffle-hash, never a
    # broadcast of the signature/shingle-set relation
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan


def test_dim_enrichment_broadcasts_and_never_sort_merges(spark, sf_dir):
    from biocache_store_spark.queries import load_all

    q = load_all()["broadcast_enrich_revenue"]
    plan = _plan(q.spark_fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # nation/region dims
    assert "SortMergeJoin" not in plan


def test_top_k_is_take_ordered_not_global_sort(spark, sf_dir):
    from biocache_store_spark.queries import load_all

    q = load_all()["top_k"]
    plan = _plan(q.spark_fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_projected_scan_prunes_columns_and_pushes_filters(spark, sf_dir):
    from biocache_store_spark.io import read_table
    from pyspark.sql import functions as F

    lineitem = read_table(spark, sf_dir, "lineitem")
    df = lineitem.filter(F.col("l_quantity") > 30).select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(df)
    read_schema = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema  # pruned
    assert "PushedFilters: [" in plan and "l_quantity" in plan[plan.index("PushedFilters") :].splitlines()[0]


def test_sketch_estimate_join_broadcasts_the_sketch(spark, sf_dir):
    from biocache_store_spark.io import read_table
    from biocache_store_spark.operators.sketch import (
        count_min_sketch,
        estimate_counts,
    )
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("term"))
    sketch = count_min_sketch(tok, "term")
    probe = tok.limit(5)
    plan = _plan(estimate_counts(sketch, probe, "term"))
    assert "BroadcastHashJoin" in plan  # bounded sketch is the build side


def test_ngram_jaccard_is_posting_list_with_count_first_cap(spark, sf_dir):
    """ngram_jaccard_pairs must keep the capped posting-list shape (r5):
    pairs come from double-exploding per-shingle doc lists — no Window,
    no pair self-join — and the df cap runs COUNT-FIRST (count aggregate
    + left-semi prefilter on `sh`) so collect_list never materializes a
    viral shingle's full posting list in one aggregation buffer."""
    from biocache_store_spark.queries import load_all

    q = load_all()["ngram_jaccard_pairs"]
    plan = _plan(q.spark_fn(spark, sf_dir))
    assert "Window" not in plan
    assert "LeftSemi" in plan  # the count-first bucket prefilter
    # exactly one join (the semi prefilter) — no pair-generating self-join
    assert plan.count("Join") == plan.count("LeftSemi")
    # the count agg runs BEFORE any collect_list in the plan tree
    assert "collect_list" in plan
