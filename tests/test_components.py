"""Connected components (large-star/small-star) and corpus span dedup."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from biocache_store_spark.operators.components import connected_components
from biocache_store_spark.operators.curation import chunk_documents, dedup_spans


def _brute_components(edges):
    """Reference union-find over a Python edge list -> {node: min_of_comp}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for n in list(parent):
        groups.setdefault(find(n), []).append(n)
    return {n: min(g) for g in groups.values() for n in g}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, "src", "dst")
    return {r["node"]: r["component"] for r in out.collect()}


def test_components_basic_shapes(spark):
    # two triangles bridged by one edge + an isolated pair
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10), (100, 200)]
    got = _run(spark, edges)
    assert got == _brute_components(edges)
    assert got[12] == 1 and got[200] == 100


def test_components_chain_worst_diameter(spark):
    # a 40-node path: label propagation would need 40 rounds; the
    # star-contraction must finish well inside the max_iter guard
    edges = [(i, i + 1) for i in range(40)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_components_random_vs_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _brute_components(edges)


def test_components_self_loops_and_duplicates_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2)]
    got = _run(spark, edges)
    # the self-loop node still appears (it is an endpoint), as its own root
    assert got == {1: 1, 2: 1, 5: 5}


def test_components_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "src string, dst string"
    )
    got = {r["node"]: r["component"] for r in connected_components(df, "src", "dst").collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_dedup_spans_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # spans: "a b c", "d e f"
            (2, "a b c x y z"),  # "a b c" repeats -> dropped; "x y z" kept
            (3, "d e f"),  # whole doc is a repeat span
        ],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, window=3, stride=3)
    kept = dedup_spans(chunks)
    rows = {(r["doc_id"], r["chunk_idx"]): r["chunk"] for r in kept.collect()}
    assert rows == {(1, 0): "a b c", (1, 1): "d e f", (2, 1): "x y z"}


def test_dedup_spans_schema_and_payload_preserved(spark):
    docs = spark.createDataFrame([(7, "p q r")], "doc_id long, text string")
    chunks = chunk_documents(docs, window=3, stride=3)
    kept = dedup_spans(chunks)
    assert kept.columns == chunks.columns
    row = kept.collect()[0]
    assert row["n_tok"] == 3 and row["chunk"] == "p q r"


def test_dedup_spans_hot_span_plan_has_partial_agg(spark):
    # the scale guarantee: ONE exchange, preceded by a partial aggregate
    # (map-side combine), so a hot span can't pile into one reducer sort
    docs = spark.createDataFrame(
        [(i, "same old span") for i in range(20)], "doc_id long, text string"
    )
    kept = dedup_spans(chunk_documents(docs, window=3, stride=3))
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_min" in plan or "HashAggregate" in plan
    assert kept.count() == 1
    assert kept.collect()[0]["doc_id"] == 0


def test_rollup_incremental_refresh_and_pruning(spark, tmp_path):
    """operators/rollup.py: closed buckets materialize once; advancing the
    cutoff refreshes only the newly-closed day partitions; the combined
    query equals a direct aggregate at every cutoff."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from biocache_store_spark.operators.rollup import rollup_query, write_rollup

    rows = [
        (dt.datetime(2024, 1, d, h, 30), "click", 1.5)
        for d in (1, 2, 3)
        for h in (0, 5, 23)
    ] + [(dt.datetime(2024, 1, 3, 12, 0), "view", 2.0)]
    events = spark.createDataFrame(
        rows, "ts timestamp_ntz, event_type string, value double"
    )

    def direct(df):
        return {
            (r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"])
            for r in df.groupBy(
                F.date_trunc("hour", "ts").alias("hour_bucket"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .collect()
        }

    path = str(tmp_path / "roll")
    write_rollup(events, path, "2024-01-02 00:00:00")
    got1 = {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"])
        for r in rollup_query(spark, path, events, "2024-01-02 00:00:00").collect()
    }
    assert got1 == direct(events)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("day=")
    ) == ["day=2024-01-01"]

    # advance the cutoff: only the newly-closed day lands in the rollup
    # (dynamic overwrite — day=2024-01-01 is untouched by this refresh)
    refresh = events.filter(
        (F.col("ts") >= "2024-01-02") & (F.col("ts") < "2024-01-03")
    )
    write_rollup(refresh, path, "2024-01-03 00:00:00")
    got2 = {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"])
        for r in rollup_query(spark, path, events, "2024-01-03 00:00:00").collect()
    }
    assert got2 == direct(events)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("day=")
    ) == ["day=2024-01-01", "day=2024-01-02"]

    # retry safety: re-running the same refresh rewrites the same
    # partition with the same contents instead of double-counting
    write_rollup(refresh, path, "2024-01-03 00:00:00")
    got3 = {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"])
        for r in rollup_query(spark, path, events, "2024-01-03 00:00:00").collect()
    }
    assert got3 == got2


def test_components_hypothesis_random_graphs(spark):
    """Property sweep: operator output == union-find on arbitrary small
    edge lists (including self-loops, duplicates, reversed edges)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    edge = st.tuples(
        st.integers(min_value=0, max_value=25),
        st.integers(min_value=0, max_value=25),
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(edge, min_size=1, max_size=30))
    def run(edges):
        proper = [(a, b) for a, b in edges if a != b]
        got = _run(spark, edges)
        expected = _brute_components(proper)
        # self-loop-only nodes appear as their own roots
        for a, b in edges:
            if a == b and a not in expected:
                expected[a] = a
        assert got == expected

    run()


def test_assertion_registry_full_reference_parity():
    """Every live ErrorCode in the reference registry
    (vocab/AssertionCodes.scala; the QA_* trio there is commented out)
    has a counterpart here, including the media comment codes and the
    reference's own misspelt MISSING_GEOREFERNCEDBY attribute name kept
    as an alias of the corrected one."""
    from biocache_store_spark.processors.assertions import AssertionCodes as C

    assert C.MEDIA_REPRESENTATIVE.code == 70000
    assert C.MEDIA_UNREPRESENTATIVE.code == 70001
    assert C.MISSING_GEOREFERNCEDBY is C.MISSING_GEOREFERENCEDBY
    codes = {
        v.code
        for k, v in vars(C).items()
        if k.isupper() and hasattr(v, "code")
    }
    assert len(codes) >= 95  # full live-registry coverage


def test_dwca_meta_uses_dcterms_namespace_for_dc_terms(spark, tmp_path):
    import zipfile

    from biocache_store_spark.exports.exporters import create_dwca

    df = spark.createDataFrame(
        [("o1", "CC-BY", "2024-01-01")],
        "occurrenceID string, license string, modified string",
    )
    zp = str(tmp_path / "a.zip")
    create_dwca(df, ["occurrenceID", "license", "modified"], zp)
    with zipfile.ZipFile(zp) as zf:
        meta = zf.read("meta.xml").decode()
    assert "http://purl.org/dc/terms/license" in meta
    assert "http://purl.org/dc/terms/modified" in meta
    assert "http://rs.tdwg.org/dwc/terms/occurrenceID" in meta
    assert "dwc/terms/license" not in meta


def test_get_all_system_assertions_keeps_assertionless_records(spark):
    from biocache_store_spark.store import get_all_system_assertions

    occ = spark.createDataFrame(
        [("r1", [(1, "a", 0, "")]), ("r2", [])],
        "rowKey string, assertions array<struct<code:int,name:string,qa_status:int,comment:string>>",
    )
    rows = {r["rowKey"]: r["code"] for r in get_all_system_assertions(occ).collect()}
    assert rows == {"r1": 1, "r2": None}  # empty-array record still present


def test_facet_counts_limit_zero_returns_nothing(spark):
    from biocache_store_spark.operators.index_projection import facet_counts

    idx = spark.createDataFrame([("a",), ("b",)], "basis_of_record string")
    assert facet_counts(idx, "basis_of_record", limit=0).count() == 0


def test_should_index_tolerates_dirty_timestamps(spark):
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.index_projection import should_index

    df = spark.createDataFrame(
        [("r1", "not-a-date", "also-bad", "")],
        "rowKey string, lastLoadTime string, lastProcessedTime string, deleted string",
    )
    out = df.filter(
        should_index(
            F.col("lastLoadTime"), F.col("lastProcessedTime"),
            "2024-01-01 00:00:00", deleted=F.col("deleted"),
        )
    )
    assert out.count() == 0  # unparseable = not-after, never a crash


def test_build_index_deleted_date_string_filtered(spark):
    """The store's deletion-DATE-string convention must filter (not crash
    under ANSI, not index the row)."""
    import datetime as dt

    from biocache_store_spark.operators.index_projection import build_index
    from biocache_store_spark.processors.chain import process_records

    occ = spark.createDataFrame(
        [("o1", "PreservedSpecimen", "2023-06-05T10:00:00Z"),
         ("o2", "PreservedSpecimen", "")],
        "occurrenceID string, basisOfRecord string, deleted string",
    )
    idx = build_index(process_records(occ, today=dt.date(2026, 8, 14)))
    assert [r["id"] for r in idx.collect()] == ["o2"]


def test_apply_sensitivity_multi_rule_no_row_inflation(spark):
    """Multiple rules for one name (zoned sets) must pick ONE applicable
    rule per record, never emit one row per rule."""
    from biocache_store_spark.processors.enrichment import apply_sensitivity

    records = spark.createDataFrame(
        [("r1", "Litoria aurea", "-33.5", "151.2", "New South Wales"),
         ("r2", "Litoria aurea", "-27.5", "153.0", "Queensland"),
         ("r3", "Litoria aurea", "-37.8", "145.0", "Victoria")],
        "rowKey string, scientificName string, decimalLatitude string, "
        "decimalLongitude string, stateProvince string",
    )
    rules = spark.createDataFrame(
        [("Litoria aurea", "VU", 10000.0, "New South Wales"),
         ("Litoria aurea", "EN", 1000.0, "Queensland")],
        "scientificName string, category string, "
        "generalisationInMetres double, zone string",
    )
    out = apply_sensitivity(records, rules)
    assert out.count() == 3  # one row per record, not per rule
    rows = {r["rowKey"]: r for r in out.collect()}
    assert rows["r1"]["sensitive"] and rows["r1"]["sens_category"] == "VU"
    assert rows["r2"]["sensitive"] and rows["r2"]["sens_category"] == "EN"
    assert not rows["r3"]["sensitive"]  # no rule for its zone


def test_apply_sensitivity_fails_closed_without_state_column(spark):
    """Records without a stateProvince column cannot prove a zoned rule
    inapplicable — every rule applies (most restrictive wins), so species
    protected only by zoned rules still get blurred."""
    from biocache_store_spark.processors.enrichment import apply_sensitivity

    records = spark.createDataFrame(
        [("r1", "Litoria aurea", "-33.123456", "151.654321")],
        "rowKey string, scientificName string, decimalLatitude string, "
        "decimalLongitude string",
    )
    rules = spark.createDataFrame(
        [("Litoria aurea", "VU", 10000.0, "New South Wales"),
         ("Litoria aurea", "EN", 1000.0, "Queensland")],
        "scientificName string, category string, "
        "generalisationInMetres double, zone string",
    )
    row = apply_sensitivity(records, rules).collect()[0]
    assert row["sensitive"]
    assert row["sens_metres"] == 10000.0  # most restrictive of the two
    assert row["decimalLatitude"] == "-33.1"


def test_enrich_attribution_null_name_not_unknown(spark):
    from biocache_store_spark.processors.enrichment import enrich_attribution

    records = spark.createDataFrame(
        [("o1", "dr1"), ("o2", "dr404")],
        "occurrenceID string, dataResourceUid string",
    )
    dims = spark.createDataFrame(
        [("dr1", None, "dp1", "Provider", ["hub1"])],
        "dataResourceUid string, dataResourceName string, "
        "dataProviderUid string, dataProviderName string, "
        "dataHubUid array<string>",
    )
    out = {r["occurrenceID"]: r["assertions"] for r in
           enrich_attribution(records, dims).collect()}
    # registered resource with a null name: assertion PASSES (qa_status 1)
    assert out["o1"][-1]["qa_status"] == 1
    assert out["o2"][-1]["qa_status"] == 0  # genuinely unknown resource


def test_enrich_classification_synonym_rows_no_inflation(spark):
    from biocache_store_spark.processors.chain import enrich_classification

    records = spark.createDataFrame(
        [("o1", "Macropus rufus", None, None, None)],
        "occurrenceID string, scientificName string, genus string, "
        "specificEpithet string, kingdom string",
    )
    taxa = spark.createDataFrame(
        [("lsid:1", "Macropus rufus", "species", 1, 2, "Red Kangaroo"),
         ("lsid:1", "Osphranter rufus", "species", 1, 2, "Red Kangaroo")],
        "taxonConceptID string, scientificName string, taxonRank string, "
        "lft int, rgt int, vernacularName string",
    )
    out = enrich_classification(records, taxa)
    assert out.count() == 1  # synonym rows share the concept: no inflation


def test_repeated_substring_spans_exact(spark):
    """With exhaustive anchoring (anchor_hex_zeros=0, every position —
    suffix-array density), a 60-char string repeated across/within docs
    is cut everywhere EXCEPT its corpus-first occurrence, and the merged
    spans land exactly on the repeated region."""
    from biocache_store_spark.operators.curation import (
        remove_spans,
        repeated_substring_spans,
    )

    import random
    import string

    boiler = "the quick brown fox jumps over the lazy dog again and again."
    assert len(boiler) == 60
    # aperiodic, pairwise-distinct fillers: a periodic filler would be a
    # REAL self-repeat (the detector finds it, correctly) and shared
    # filler context would legitimately extend spans past the boiler
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + " "
    u1, u2, u3, u4 = (
        "".join(rng.choices(alphabet, k=n)) for n in (80, 50, 45, 18)
    )
    docs = spark.createDataFrame(
        [
            (1, boiler + u1),            # corpus-first copy: untouched
            (2, u2 + boiler),            # one span at [50, 110)
            (3, u3 + boiler + u4 + boiler),  # two spans
        ],
        "doc_id long, text string",
    )
    spans = repeated_substring_spans(
        docs, min_len=40, anchor_k=8, anchor_hex_zeros=0
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in spans.collect()
    }
    assert got == {(2, 50, 110), (3, 45, 105), (3, 123, 183)}

    cleaned = {r["doc_id"]: r["text"] for r in remove_spans(docs, spans).collect()}
    assert cleaned[1] == boiler + u1  # untouched
    assert cleaned[2] == u2
    assert cleaned[3] == u3 + u4

    # output is independent of the per-task segmentation: a 64-char
    # segment forces every doc through multiple slices and boundary
    # lookaheads, and the spans must not move
    seg = repeated_substring_spans(
        docs, min_len=40, anchor_k=8, anchor_hex_zeros=0, segment_chars=64
    )
    assert {
        (r["doc_id"], r["span_start"], r["span_end"]) for r in seg.collect()
    } == got


def test_substring_exact_mode_recall_bound(spark):
    """The documented recall bound, made executable: a repeat of length
    exactly min_len whose only fully-contained window start is NOT a z=1
    anchor is MISSED at anchor_hex_zeros=1 and CAUGHT at
    anchor_hex_zeros=0 (exact mode — the Lee et al. no-miss guarantee)."""
    import hashlib
    import random
    import string

    from biocache_store_spark.operators.curation import (
        repeated_substring_spans,
        substring_decontaminate,
    )

    L, k = 40, 8
    # deterministically find a 40-char repeat whose leading k-gram's md5
    # does NOT open with '0': for a length-L repeat the only window fully
    # inside it starts at position 0, so a non-anchor there == a z=1 miss
    rng = random.Random(23)
    alphabet = string.ascii_letters + string.digits
    repeat = None
    for _ in range(64):
        cand = "".join(rng.choices(alphabet, k=L))
        if not hashlib.md5(cand[:k].encode()).hexdigest().startswith("0"):
            repeat = cand
            break
    assert repeat is not None
    f1, f2 = (
        "".join(rng.choices(alphabet + " ", k=n)) for n in (65, 72)
    )
    docs = spark.createDataFrame(
        [(1, repeat + f1), (2, f2 + repeat)], "doc_id long, text string"
    )
    z1 = repeated_substring_spans(docs, min_len=L, anchor_k=k, anchor_hex_zeros=1)
    assert z1.count() == 0  # the documented miss, pinned
    z0 = repeated_substring_spans(docs, min_len=L, anchor_k=k, anchor_hex_zeros=0)
    got = {(r["doc_id"], r["span_start"], r["span_end"]) for r in z0.collect()}
    assert got == {(2, 72, 72 + L)}  # corpus-first copy in doc 1 kept

    # same bound on the decontamination side: eval doc carrying the
    # repeat contaminates train doc 2 only under exact mode
    eval_docs = spark.createDataFrame(
        [(100, "q: " + repeat)], "doc_id long, text string"
    )
    train = spark.createDataFrame([(2, f2 + repeat)], "doc_id long, text string")
    assert (
        substring_decontaminate(
            train, eval_docs, min_len=L, anchor_k=k, anchor_hex_zeros=1
        ).count()
        == 0
    )
    d0 = substring_decontaminate(
        train, eval_docs, min_len=L, anchor_k=k, anchor_hex_zeros=0
    )
    assert {
        (r["doc_id"], r["span_start"], r["span_end"]) for r in d0.collect()
    } == {(2, 72, 72 + L)}


def test_anchor_windows_param_guards(spark):
    """anchor_k > min_len breaks segmentation invariance (the segment
    lookahead only covers min_len-1 chars) and must refuse loudly;
    negative anchor_hex_zeros is nonsense."""
    import pytest as _pytest

    from biocache_store_spark.operators.curation import (
        repeated_substring_spans,
    )

    docs = spark.createDataFrame([(1, "x" * 100)], "doc_id long, text string")
    with _pytest.raises(ValueError, match="anchor_k"):
        repeated_substring_spans(docs, min_len=8, anchor_k=9).collect()
    with _pytest.raises(ValueError, match="anchor_hex_zeros"):
        repeated_substring_spans(docs, min_len=40, anchor_hex_zeros=-1).collect()


def test_anchor_windows_fan_out_single_partition_corpus(spark):
    # r12 optimization guard: the anchor scan's per-row cost (~one md5
    # per character through interpreted HOF lambdas) is map-only, so a
    # corpus read as ONE split would serialize the whole pass on one
    # core. _anchor_windows must fan the projected (id, text) rows out
    # to the session's default parallelism (no-op when the scan already
    # has more splits than cores).
    from biocache_store_spark.operators.curation import _anchor_windows

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "abcdefgh" * 20) for i in range(10)],
        "doc_id long, text string",
    ).coalesce(1)
    assert docs.rdd.getNumPartitions() == 1
    wins = _anchor_windows(docs, 40, 8, 1, "doc_id", "text", 1 << 16)
    expected = spark.sparkContext.defaultParallelism
    assert wins.rdd.getNumPartitions() == expected


def test_substring_decontaminate(spark):
    """Train spans sharing a >= min_len exact substring with any eval doc
    are flagged — including a contaminated region at a DIFFERENT offset
    than in the eval doc (the alignment case fixed-stride shingles miss)
    — and clean train docs are untouched."""
    import random
    import string

    from biocache_store_spark.operators.curation import (
        remove_spans,
        substring_decontaminate,
    )

    leak = "What is the capital of France? The capital of France is Paris, of course."
    assert len(leak) >= 60
    rng = random.Random(11)
    alphabet = string.ascii_letters + string.digits + " "
    f1, f2, f3 = ("".join(rng.choices(alphabet, k=n)) for n in (70, 55, 90))
    train = spark.createDataFrame(
        [(1, f1 + leak), (2, f2), (3, leak + f3)],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "Q7: " + leak + " [end]")], "doc_id long, text string"
    )
    spans = substring_decontaminate(
        train, eval_docs, min_len=40, anchor_hex_zeros=0
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"]) for r in spans.collect()
    }
    n = len(leak)
    assert got == {(1, 70, 70 + n), (3, 0, n)}
    cleaned = {r["doc_id"]: r["text"] for r in remove_spans(train, spans).collect()}
    assert cleaned == {1: f1, 2: f2, 3: f3}
