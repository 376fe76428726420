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


def test_bm25_top_k_is_take_ordered_not_global_window(spark, sf_dir):
    from biocache_store_spark.queries import load_all

    q = load_all()["bm25_search"]
    plan = _plan(q.spark_fn(spark, sf_dir))
    # the top-15 must come from TakeOrderedAndProject (per-partition
    # heaps); a row_number window over EVERY scored document would move
    # the whole matching relation to one task — at corpus scale a common
    # query term makes that task the job. The rank window that remains
    # runs over the 15 surviving rows only, AFTER the limit.
    assert "TakeOrderedAndProject" in plan


def test_countmin_probe_top_20_is_take_ordered_not_global_window(spark, sf_dir):
    from biocache_store_spark.queries import load_all

    q = load_all()["countmin_heavy_hitters"]
    plan = _plan(q.spark_fn(spark, sf_dir))
    # the exact-ranking probe side must pick its top-20 via
    # TakeOrderedAndProject, not a row_number window over the entire
    # distinct-term relation (vocabulary-sized at corpus scale, all
    # funneled through ONE task). The remaining window ranks only the
    # 20 survivors.
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
    """ngram_jaccard_pairs must keep the budgeted posting-list shape (r6):
    pairs come from double-exploding per-shingle doc lists — no pair
    self-join, no sort-merge join. In the large-corpus (dynamic-budget)
    regime the df guard runs COUNT-FIRST (count aggregate + left-semi
    prefilter on `sh`) so collect_list never materializes a viral
    shingle's full posting list in one aggregation buffer, and the
    dynamic candidate budget resolves to 1-row broadcast builds (the
    admitted-df threshold and the doc count), never a record-sized
    nested-loop side; the single Window is the cumulative pair sum over
    the tiny df histogram. In the small-corpus (static) regime df is
    corpus-bounded, so the guard folds into the one collecting
    aggregation as a size() filter — no second shingle pass."""
    import biocache_store_spark.queries.text as qtext
    from biocache_store_spark.queries import load_all

    q = load_all()["ngram_jaccard_pairs"]
    # small-corpus regime (test SFs): single-pass static-cap plan — the df
    # guard is folded into the collecting aggregation as a size() filter
    # (no semi join, no window, no nested loop, no second shingle pass)
    plan = _plan(q.spark_fn(spark, sf_dir))
    assert plan.count("LeftSemi") == 0
    assert "size(docs" in plan  # folded df guard on the posting list
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan  # no pair-generating self-join
    assert plan.count("Generate explode") >= 2  # posting-list double explode
    assert "collect_list" in plan
    # large-corpus regime (forced): the dynamic budget adds the df
    # histogram window + the 1-row admitted-df-threshold semi, and the
    # only nested-loop join is that 1-row dimension build
    orig = qtext._NGRAM_BUDGET_MIN_DOCS
    qtext._NGRAM_BUDGET_MIN_DOCS = 0
    try:
        plan_big = _plan(q.spark_fn(spark, sf_dir))
    finally:
        qtext._NGRAM_BUDGET_MIN_DOCS = orig
    assert plan_big.count("LeftSemi") == 2
    assert plan_big.count("Window") == 1
    assert plan_big.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan_big


def test_ngram_budget_overflow_degrades_to_min_tier(spark, tmp_path):
    """When even the smallest df tier exceeds the candidate budget, the
    admitted-df threshold coalesces to 2 — the query degrades to the
    minimum tier instead of silently returning ZERO pairs (the NULL
    threshold regression: max over an empty tier set admits nothing)."""
    import biocache_store_spark.queries.text as qtext
    from biocache_store_spark.queries import load_all

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # exact pair, df=2 shingles
            (3, "one two three four five"),
            (4, "unrelated words entirely here now"),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    q = load_all()["ngram_jaccard_pairs"]
    orig_min, orig_budget = (
        qtext._NGRAM_BUDGET_MIN_DOCS,
        qtext._NGRAM_CANDIDATES_PER_DOC,
    )
    # force the dynamic regime AND a budget no tier can fit
    qtext._NGRAM_BUDGET_MIN_DOCS = 0
    qtext._NGRAM_CANDIDATES_PER_DOC = 0
    try:
        rows = q.spark_fn(spark, str(tmp_path)).collect()
    finally:
        qtext._NGRAM_BUDGET_MIN_DOCS = orig_min
        qtext._NGRAM_CANDIDATES_PER_DOC = orig_budget
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows] == [
        (1, 2, 1.0)
    ]


def test_semantic_dedup_assignment_is_map_only(spark, sf_dir):
    """semantic_dedup (r5) must keep the matrix-form assignment: no
    broadcast join materializing N x k scored rows (the measured
    quadratic in the k~N regime) — assignment is a single mapInArrow
    pass (r13: formerly mapInPandas); the only joins are the
    cell-blocked pairing and the keep-flag join-back."""
    from biocache_store_spark.io import read_table
    from biocache_store_spark.operators.similarity import semantic_dedup
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    plan = _plan(semantic_dedup(emb, cents, threshold=0.5))
    assert "MapInArrow" in plan           # bulk assignment (arrow, r13)
    assert "MapInPandas" not in plan      # the pandas-boxing form is gone
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan           # no argmax window either


def test_boilerplate_removal_is_anti_join_on_hash(spark, sf_dir):
    """remove_boilerplate (r5): the flagged-span filter must plan as an
    anti join on the md5 key with partial aggregation below the
    document-frequency exchange — never a window over span groups."""
    from biocache_store_spark.io import read_table
    from biocache_store_spark.operators.curation import (
        chunk_documents,
        remove_boilerplate,
    )

    docs = read_table(spark, sf_dir, "documents")
    plan = _plan(remove_boilerplate(chunk_documents(docs, 20, 20)))
    assert "LeftAnti" in plan
    assert "Window" not in plan
    assert "partial_count" in plan or "partial" in plan.lower()


def test_pq_scoring_stays_jvm_side_with_take_ordered(spark, sf_dir):
    """pq_topk (r5): ADC scoring must be pure JVM expression work over
    the codes (no Python in the scoring stage — encode's MapInArrow is
    the only Python) and the top-k must be TakeOrderedAndProject."""
    from biocache_store_spark.io import read_table
    from biocache_store_spark.operators.similarity import pq_encode, pq_topk
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    book_df = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    book = [r["embedding"] for r in sorted(book_df.collect(), key=lambda r: r["j"])]
    qvec = [0.0] * 64
    enc = pq_encode(emb.select("vec_id", "embedding"), book_df)
    plan = _plan(pq_topk(enc, qvec, book, k=10))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("MapInArrow") == 1  # encode only; scoring is JVM
    assert "MapInPandas" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dedup_streamed_single_exchange(spark, sf_dir):
    """The shipped duplicate-detection kernel must keep the per-group
    form's plan shape — exactly ONE Exchange (the group-key repartition)
    followed by an in-partition sort and a single MapInPandas; the JVM
    self-join A/B loser pays three shuffles, and a regression to it (or
    to a grouped cogroup) would show up here as extra Exchanges."""
    from biocache_store_spark.operators.dedup import detect_duplicates
    from biocache_store_spark.io import read_table

    records = read_table(spark, sf_dir, "customer").selectExpr(
        "cast(c_custkey as string) as occurrenceID",
        "cast(c_nationkey as string) as taxonConceptID",
        "'2000' as year", "'01' as month", "'05' as day",
        "'-35.2' as decimalLatitude", "'144.8' as decimalLongitude",
        "c_name as recordedBy",
        "cast(null as string) as recordNumber",
        "cast(null as string) as catalogNumber",
        "'dr1' as dataResourceUid",
    )
    plan = _plan(detect_duplicates(records))
    assert plan.count("Exchange") == 1, plan
    assert plan.count("MapInPandas") == 1, plan
    assert "SortMergeJoin" not in plan and "CoGroup" not in plan, plan
