"""Expert-distribution outliers + validation-rule apply/unapply."""

from __future__ import annotations

import pytest

from biocache_store_spark.operators.outlier_distribution import (
    distance_outside_m,
)
from biocache_store_spark.operators.sampling import parse_wkt_polygon

RING = parse_wkt_polygon("POLYGON((140 -40, 150 -40, 150 -30, 140 -30, 140 -40))")


def test_distance_outside():
    assert distance_outside_m(145.0, -35.0, RING) == 0.0  # inside
    d = distance_outside_m(139.0, -35.0, RING)  # 1 degree west of edge
    assert d == pytest.approx(1.0 * 111320.0 * 0.8191, rel=0.01)  # cos(-35)
    d2 = distance_outside_m(145.0, -29.0, RING)  # 1 degree north
    assert d2 == pytest.approx(110540.0, rel=0.01)


def test_find_outliers(spark):
    from biocache_store_spark.operators.outlier_distribution import find_outliers

    records = spark.createDataFrame(
        [
            ("o1", "lsid:a", "-35.0", "145.0"),  # inside
            ("o2", "lsid:a", "-35.0", "139.0"),  # outside west
            ("o3", "lsid:b", "-35.0", "139.0"),  # no distribution -> untested
            ("o4", "lsid:a", None, None),  # no coords -> untested
        ],
        "occurrenceID string, taxonConceptID string, decimalLatitude string,"
        " decimalLongitude string",
    )
    dist = spark.createDataFrame(
        [("lsid:a", "POLYGON((140 -40, 150 -40, 150 -30, 140 -30, 140 -40))")],
        "taxonConceptID string, wkt string",
    )
    out = {r["occurrence_id"]: r for r in find_outliers(records, dist).collect()}
    assert set(out) == {"o1", "o2"}
    assert out["o1"]["in_range"] is True
    assert out["o2"]["in_range"] is False
    assert out["o2"]["distance_outside_m"] > 90000


def test_find_outliers_dimension_size_guard(spark):
    """The expert-range table is a driver-broadcast dimension; an
    oversize table must raise (bounded collect), not exhaust the driver."""
    from biocache_store_spark.operators.outlier_distribution import find_outliers

    records = spark.createDataFrame(
        [("o1", "lsid:0", "-35.0", "145.0")],
        "occurrenceID string, taxonConceptID string, decimalLatitude string,"
        " decimalLongitude string",
    )
    wkt = "POLYGON((140 -40, 150 -40, 150 -30, 140 -30, 140 -40))"
    dist = spark.createDataFrame(
        [(f"lsid:{i}", wkt) for i in range(5)],
        "taxonConceptID string, wkt string",
    )
    with pytest.raises(ValueError, match="max_distribution_rows"):
        find_outliers(records, dist, max_distribution_rows=4)
    # at the guard boundary it still runs
    out = find_outliers(records, dist, max_distribution_rows=5).collect()
    assert len(out) == 1 and out[0]["in_range"]


_EXPERT_WKT = "POLYGON((140 -40, 150 -40, 150 -30, 140 -30, 140 -40))"


def _expert_dists(spark):
    return spark.createDataFrame(
        [("lsid:a", _EXPERT_WKT)], "taxonConceptID string, wkt string"
    )


def test_expert_outlier_records_threshold_rule(spark):
    """markOutlierOccurrences' outlier rule
    (ExpertDistributionOutlierTool.scala:474-488): rounded distance > 0
    AND rounded - uncertainty > threshold; km = round(m/1000) stored only
    on outlier rows; tested non-outliers stay in the store as the PASSED
    set; untested records (no range / no coords) are absent."""
    from biocache_store_spark.operators.outlier_distribution import (
        expert_outlier_records,
    )

    records = spark.createDataFrame(
        [
            # inside the range: tested, passed
            ("o1", "lsid:a", -35.0, 145.0, None),
            # ~91 km west: outlier (unc null -> 0)
            ("o2", "lsid:a", -35.0, 139.0, None),
            # ~9 km west: under the 50 km threshold -> passed
            ("o3", "lsid:a", -35.0, 139.9, None),
            # ~182 km west but 140 km uncertainty -> 182-140 < 50 -> passed
            ("o4", "lsid:a", -35.0, 138.0, 140_000.0),
            # ~182 km west, 50 km uncertainty -> 182-50 > 50 -> outlier
            ("o5", "lsid:a", -35.0, 138.0, 50_000.0),
            # no expert range -> untested
            ("o6", "lsid:b", -35.0, 100.0, None),
        ],
        "occurrenceID string, taxonConceptID string, decimalLatitude double,"
        " decimalLongitude double, coordinateUncertaintyInMeters double",
    )
    out = {
        r["row_key"]: r
        for r in expert_outlier_records(records, _expert_dists(spark)).collect()
    }
    assert set(out) == {"o1", "o2", "o3", "o4", "o5"}
    assert not out["o1"]["is_outlier"] and out["o1"]["in_range"]
    assert out["o2"]["is_outlier"]
    assert out["o2"]["distance_outside_km"] == round(
        out["o2"]["distance_outside_m"] / 1000
    )
    assert not out["o3"]["is_outlier"] and out["o3"]["distance_outside_km"] is None
    assert not out["o4"]["is_outlier"]  # uncertainty eats the distance
    assert out["o5"]["is_outlier"]


def test_expert_outlier_store_incremental_merge_equals_full(spark):
    """The versioned-store contract applied to expert outliers: re-testing
    only the touched taxa and merging equals a full re-test, and the
    revert diff names exactly the record that left the outlier set."""
    from biocache_store_spark.operators.outlier_distribution import (
        expert_outlier_records,
        obsolete_expert_outliers,
    )
    from biocache_store_spark.operators.outlier_store import (
        merge_outlier_results,
    )

    dists = spark.createDataFrame(
        [("lsid:a", _EXPERT_WKT), ("lsid:b", _EXPERT_WKT)],
        "taxonConceptID string, wkt string",
    )
    schema = (
        "occurrenceID string, taxonConceptID string, decimalLatitude double,"
        " decimalLongitude double, coordinateUncertaintyInMeters double"
    )
    t0_rows = [
        ("a1", "lsid:a", -35.0, 139.0, None),  # outlier at T0
        ("a2", "lsid:a", -35.0, 145.0, None),
        ("b1", "lsid:b", -35.0, 138.0, None),  # untouched taxon's outlier
    ]
    # at T1 the record a1 is re-delivered INSIDE the range (corrected
    # coords) and a new outlier a3 arrives
    t1_rows = [
        ("a1", "lsid:a", -35.0, 145.5, None),
        ("a2", "lsid:a", -35.0, 145.0, None),
        ("a3", "lsid:a", -35.0, 137.0, None),
        ("b1", "lsid:b", -35.0, 138.0, None),
    ]
    t0 = spark.createDataFrame(t0_rows, schema)
    t1 = spark.createDataFrame(t1_rows, schema)
    detect = lambda d: expert_outlier_records(d, dists)  # noqa: E731
    prev = detect(t0)
    groups = spark.createDataFrame([("lsid:a",)], "taxon string")
    inc = detect(t1.join(groups, t1["taxonConceptID"] == groups["taxon"], "left_semi"))
    merged = merge_outlier_results(prev, inc, groups, ["taxon"])
    full = detect(t1)
    key = lambda r: (r["taxon"], r["row_key"])  # noqa: E731
    assert sorted(map(str, sorted(merged.collect(), key=key))) == sorted(
        map(str, sorted(full.collect(), key=key))
    )
    gone = {
        r["row_key"] for r in obsolete_expert_outliers(prev, merged).collect()
    }
    assert gone == {"a1"}  # b1 (untouched) stays an outlier


def test_distribution_outliers_rollup(spark):
    from biocache_store_spark.operators.outlier_distribution import (
        distribution_outliers_rollup,
        expert_outlier_records,
    )

    records = spark.createDataFrame(
        [
            ("o2", "lsid:a", -35.0, 139.0, None),
            ("o5", "lsid:a", -35.0, 138.0, None),
            ("o1", "lsid:a", -35.0, 145.0, None),
        ],
        "occurrenceID string, taxonConceptID string, decimalLatitude double,"
        " decimalLongitude double, coordinateUncertaintyInMeters double",
    )
    rec = expert_outlier_records(records, _expert_dists(spark))
    roll = distribution_outliers_rollup(rec).collect()
    assert len(roll) == 1
    assert roll[0]["taxon"] == "lsid:a"
    assert roll[0]["outlier_row_keys"] == ["o2", "o5"]
    assert roll[0]["outlier_count"] == 2


def test_apply_expert_outlier_markup_lifecycle(spark):
    """The write-back end states (markOutlierOccurrences :459-528):
    outliers get the km string column + FAILED '<m> metres outside...'
    assertion replacing any existing entry; tested non-outliers get
    PASSED + cleared column; reverted records get the column cleared and
    the assertion REMOVED (not flipped); untouched rows keep theirs."""
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.outlier_distribution import (
        apply_expert_outlier_markup,
    )
    from biocache_store_spark.processors.assertions import (
        FAILED,
        PASSED,
        AssertionCodes,
    )
    from biocache_store_spark.processors.chain import ASSERTION_TYPE

    code = AssertionCodes.SPECIES_OUTSIDE_EXPERT_RANGE.code
    name = AssertionCodes.SPECIES_OUTSIDE_EXPERT_RANGE.name
    stale = F.struct(
        F.lit(code).alias("code"),
        F.lit(name).alias("name"),
        F.lit(FAILED).alias("qa_status"),
        F.lit("stale").alias("comment"),
    )
    store = spark.createDataFrame(
        [("out1",), ("pass1",), ("gone1",), ("other1",), ("nullarr",)],
        "rowKey string",
    ).select(
        "rowKey",
        F.when(F.col("rowKey") != "nullarr", F.array(stale).cast(ASSERTION_TYPE))
        .otherwise(F.lit(None).cast(ASSERTION_TYPE))
        .alias("assertions"),
        F.when(F.col("rowKey").isin("gone1", "other1"), F.lit("7"))
        .alias("distanceOutsideExpertRange_p"),
    )
    rec = spark.createDataFrame(
        [
            ("lsid:a", "out1", False, 91190.2, 91, True),
            ("lsid:a", "pass1", True, 0.0, None, False),
            ("lsid:a", "nullarr", False, 191190.2, 191, True),
        ],
        "taxon string, row_key string, in_range boolean,"
        " distance_outside_m double, distance_outside_km long,"
        " is_outlier boolean",
    )
    reverts = spark.createDataFrame([("gone1",)], "row_key string")
    out = {
        r["rowKey"]: r
        for r in apply_expert_outlier_markup(store, rec, reverts).collect()
    }
    entry = lambda r: [a for a in (r["assertions"] or []) if a["code"] == code]  # noqa: E731

    o = out["out1"]
    assert o["distanceOutsideExpertRange_p"] == "91"
    (a,) = entry(o)
    assert a["qa_status"] == FAILED
    assert a["comment"] == "91190 metres outside of expert distribution range"
    # the stale entry was REPLACED, never duplicated
    assert len([x for x in o["assertions"] if x["code"] == code]) == 1

    p = out["pass1"]
    assert p["distanceOutsideExpertRange_p"] is None
    (a,) = entry(p)
    assert a["qa_status"] == PASSED

    g = out["gone1"]
    assert g["distanceOutsideExpertRange_p"] is None
    assert entry(g) == []  # removed, not flipped

    u = out["other1"]
    assert u["distanceOutsideExpertRange_p"] == "7"
    (a,) = entry(u)
    assert a["comment"] == "stale"  # untouched rows pass through

    n = out["nullarr"]  # null assertions array must not swallow the markup
    (a,) = entry(n)
    assert a["qa_status"] == FAILED and n["distanceOutsideExpertRange_p"] == "191"


def test_validation_rule_apply_unapply(spark):
    from biocache_store_spark.operators.validation_rules import (
        ValidationRule,
        apply_rule_delta,
        annotate_with_rule,
        matching_ids,
    )

    rule = ValidationRule("vr1", "state:Victoria AND year:[2000 TO *]", 20019,
                          "userAssertionOther", "suspect region")
    df = spark.createDataFrame(
        [("r1", "Victoria", 2005), ("r2", "Victoria", 1999), ("r3", "Tasmania", 2005)],
        "id string, state string, year int",
    )
    ids = {r["record_id"] for r in matching_ids(df, rule).collect()}
    assert ids == {"r1"}

    # first application: everything matching is asserted
    delta = {
        (r["record_id"], r["action"]) for r in apply_rule_delta(df, rule).collect()
    }
    assert delta == {("r1", "assert")}

    # data changed: r1 no longer matches, r3 newly matches
    df2 = spark.createDataFrame(
        [("r1", "Queensland", 2005), ("r3", "Victoria", 2005)],
        "id string, state string, year int",
    )
    prev = spark.createDataFrame([("r1",)], "record_id string")
    delta2 = {
        (r["record_id"], r["action"])
        for r in apply_rule_delta(df2, rule, prev).collect()
    }
    assert delta2 == {("r3", "assert"), ("r1", "unassert")}

    annotated = {r["id"]: r for r in annotate_with_rule(df, rule).collect()}
    a1 = annotated["r1"]["assertions"][0]
    assert (a1["code"], a1["qa_status"], a1["comment"]) == (20019, 0, "suspect region")
    assert annotated["r2"]["assertions"][0]["qa_status"] == 1


def test_wkt_predicate_matches_python_kernel(spark):
    """The unrolled sum-of-crossings Column expression must agree with the
    per-point ray-cast kernel (operators/sampling.point_in_polygon) on a
    grid spanning inside/outside/concave regions of an L-shaped polygon."""
    from biocache_store_spark.operators.sampling import (
        parse_wkt_polygon,
        point_in_polygon,
    )
    from biocache_store_spark.plans.solr_query import wkt_predicate

    wkt = "POLYGON((-50 -30, 30 -30, 30 0, 0 0, 0 25, -50 25, -50 -30))"
    ring = parse_wkt_polygon(wkt)
    pts = [
        (float(lon) + 0.3, float(lat) + 0.7)
        for lon in range(-60, 41, 10)
        for lat in range(-40, 31, 10)
    ]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    got = {
        (r["lon"], r["lat"]): r["inside"]
        for r in df.withColumn(
            "inside", wkt_predicate(wkt, lat_col="lat", lon_col="lon")
        ).collect()
    }
    for lon, lat in pts:
        assert got[(lon, lat)] == point_in_polygon(lon, lat, ring), (lon, lat)


def test_qid_bbox_predicate(spark):
    from biocache_store_spark.plans.solr_query import qid_predicate

    df = spark.createDataFrame(
        [(1, "x", 10.0, 10.0), (2, "x", 50.0, 10.0), (3, "y", 10.0, 10.0)],
        ["id", "tag", "lat", "lon"],
    )
    pred = qid_predicate(q="tag:x", bbox=[0.0, 0.0, 20.0, 20.0],
                         lat_col="lat", lon_col="lon")
    assert [r["id"] for r in df.filter(pred).collect()] == [1]


def test_validation_rule_wkt_scope(spark):
    """A WKT-scoped rule only asserts records inside the polygon
    (ValidationRuleRunner with Qid.wkt)."""
    from biocache_store_spark.operators.validation_rules import (
        ValidationRule,
        matching_ids,
    )

    df = spark.createDataFrame(
        [("r1", "BUILDING", -10.0, -10.0),   # inside
         ("r2", "BUILDING", 20.0, 20.0),     # outside (concave notch)
         ("r3", "AUTOMOBILE", -10.0, -10.0)],  # inside but q mismatch
        ["record_id", "segment", "lat", "lon"],
    )
    rule = ValidationRule(
        rule_id="vr1", query="segment:BUILDING", assertion_code=1,
        assertion_name="x",
        wkt="POLYGON((-50 -30, 30 -30, 30 0, 0 0, 0 25, -50 25, -50 -30))",
        lat_col="lat", lon_col="lon",
    )
    got = sorted(r["record_id"] for r in matching_ids(df, rule, "record_id").collect())
    assert got == ["r1"]


def test_qid_store_put_get_round_trip(spark, tmp_path):
    """QidTest.scala:30-50: put mints a rowKey; get round-trips q, fqs,
    bbox and maxAge; predicate() replays the stored filter."""
    from biocache_store_spark.plans.solr_query import Qid, QidStore

    store = QidStore(spark, str(tmp_path / "qid"))
    qid = Qid(
        q="*:*",
        fqs=("decimalLongitude:*", "decimalLatitude:*"),
        bbox=(112.0, -44.0, 154.0, -12.0),
        max_age=50000,
    )
    minted = store.put(qid)
    assert minted.row_key
    got = store.get(minted.row_key)
    assert got is not None
    assert got.q == qid.q and got.fqs == qid.fqs
    assert got.bbox == qid.bbox and got.max_age == 50000
    assert store.get("no-such-key") is None

    df = spark.createDataFrame(
        [(150.0, -30.0, "x"), (100.0, -30.0, "y"), (150.0, None, "z")],
        "decimalLongitude double, decimalLatitude double, v string",
    )
    kept = {r["v"] for r in df.filter(got.predicate()).collect()}
    assert kept == {"x"}  # inside bbox, both coords present


def test_jackknife_record_outliers_cells_and_layers(spark):
    """Record-level jackknife (operators/outlier_store.py): outlier VALUES
    map back to cells and every record in a flagged cell is an outlier
    (performJacknife, ReverseJacknifeProcessor.scala:433-463); a
    zero-range layer is never tested; under-threshold groups drop."""
    from biocache_store_spark.operators.outlier_store import (
        jackknife_record_outliers,
        outlier_for_layers,
    )

    rows = [
        ("t1", f"r{i}", f"cell{i}", float(i + 1), 3.0) for i in range(25)
    ]
    # the extreme lives in cell25; record rY sits in the SAME cell with a
    # different value — cell membership must flag it too
    rows.append(("t1", "rX", "cell25", 500.0, 3.0))
    rows.append(("t1", "rY", "cell25", 501.0, 3.0))
    # a second taxon with too few samples: never tested
    rows += [("t2", f"s{i}", f"c{i}", float(i), 3.0) for i in range(5)]
    df = spark.createDataFrame(
        rows, "taxon string, oid string, cid string, el1 double, el2 double"
    )
    out = jackknife_record_outliers(
        df, ["taxon"], ["el1", "el2"], "oid", cell_col="cid"
    )
    rows_out = out.collect()
    # el2 is constant (threshold 0) and t2 is under-threshold: only t1/el1
    assert {(r["taxon"], r["layer"]) for r in rows_out} == {("t1", "el1")}
    got = {r["row_key"]: r["is_outlier"] for r in rows_out}
    assert got["rX"] and got["rY"]  # cell-mates flagged together
    assert not any(got[f"r{i}"] for i in range(25))
    # the cell sample is MIN(value): the group's max_value is the sampled
    # 500.0, not rY's 501.0
    assert {r["max_value"] for r in rows_out} == {500.0}
    ofl = {r["row_key"]: r for r in outlier_for_layers(out).collect()}
    assert set(ofl) == {"rX", "rY"}
    assert ofl["rX"]["outlier_for_layers"] == ["el1"]
    assert ofl["rX"]["outlier_for_layers_count"] == 1


def test_outlier_store_incremental_merge_equals_full(spark):
    """The duplicates-store pattern applied to outliers: T1 adds records
    to one taxon; re-detecting only the touched taxon and merging into
    the T0 store equals a full T1 recompute, the revert set names the
    record that stopped being an outlier, and untouched taxa pass
    through unchanged."""
    from biocache_store_spark.operators.outlier_store import (
        jackknife_record_outliers,
        merge_outlier_results,
        obsolete_outlier_records,
    )

    detect = lambda d: jackknife_record_outliers(  # noqa: E731
        d, ["taxon"], ["el1"], "oid"
    )
    # t1 at T0: spread 1..25 plus a mild extreme 60 -> 60 is an outlier
    t0_rows = [("t1", f"r{i}", float(i + 1)) for i in range(25)]
    t0_rows.append(("t1", "rX", 60.0))
    # tU: untouched taxon with its own outlier
    t0_rows += [("tU", f"u{i}", float(i + 1)) for i in range(25)]
    t0_rows.append(("tU", "uX", 500.0))
    # T1 adds values 26..59 to t1: the gap closes and rX stops being an
    # outlier
    t1_rows = t0_rows + [
        ("t1", f"n{i}", float(26 + i)) for i in range(34)
    ]
    t0 = spark.createDataFrame(t0_rows, "taxon string, oid string, el1 double")
    t1 = spark.createDataFrame(t1_rows, "taxon string, oid string, el1 double")

    prev = detect(t0)
    assert {
        r["row_key"] for r in prev.filter("is_outlier").collect()
    } == {"rX", "uX"}

    groups = spark.createDataFrame([("t1",)], "taxon string")
    inc = detect(t1.join(groups, "taxon", "left_semi"))
    merged = merge_outlier_results(prev, inc, groups, ["taxon"])
    full = detect(t1)
    key = lambda r: (r["taxon"], r["layer"], r["row_key"])  # noqa: E731
    assert sorted(map(str, sorted(merged.collect(), key=key))) == sorted(
        map(str, sorted(full.collect(), key=key))
    )
    # revert set: rX left the outlier set, uX (untouched) did not
    gone = {r["row_key"] for r in obsolete_outlier_records(prev, merged).collect()}
    assert gone == {"rX"}


def test_outlier_stats_table_projection(spark):
    from biocache_store_spark.operators.outlier_store import (
        jackknife_record_outliers,
        outlier_stats_table,
    )

    rows = [("t1", f"r{i}", float(i + 1)) for i in range(25)]
    rows.append(("t1", "rX", 500.0))
    df = spark.createDataFrame(rows, "taxon string, oid string, el1 double")
    rec = jackknife_record_outliers(df, ["taxon"], ["el1"], "oid")
    st = outlier_stats_table(rec, ["taxon"]).collect()
    assert len(st) == 1
    assert st[0]["taxon"] == "t1" and st[0]["layer"] == "el1"
    assert st[0]["sample_size"] == 26


def test_window_jackknife_equals_python_kernel(spark):
    """jackknife_record_outliers' window-based cutoffs must produce
    exactly the Python reference kernel's outputs — stats, per-sample
    flags (by value membership) and failsafe — across shapes with
    duplicates, both-tail extremes, failsafe groups and near-threshold
    gaps."""
    import random

    from biocache_store_spark.operators.jackknife import jackknife
    from biocache_store_spark.operators.outlier_store import (
        jackknife_record_outliers,
    )

    rng = random.Random(8)
    groups = {}
    # g0: spread + high extreme; g1: duplicates + low extreme;
    # g2: bimodal (failsafe); g3: uniform with duplicate runs;
    # g4-g9: random mixtures
    groups["g0"] = [float(i) for i in range(30)] + [400.0]
    groups["g1"] = [10.0] * 10 + [float(10 + i) for i in range(15)] + [-300.0]
    groups["g2"] = [1.0 * i for i in range(12)] + [500.0 + i for i in range(12)]
    groups["g3"] = [float(i // 3) for i in range(36)]
    for k in range(4, 10):
        n = rng.randint(20, 120)
        vals = [round(rng.gauss(100, 15), 1) for _ in range(n)]
        for _ in range(rng.randint(0, 3)):
            vals.append(round(rng.choice([-1, 1]) * rng.uniform(300, 900), 1))
        groups[f"g{k}"] = vals
    rows = [
        (g, f"{g}-{i}", v)
        for g, vals in groups.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "taxon string, oid string, el1 double")
    got = jackknife_record_outliers(df, ["taxon"], ["el1"], "oid")
    by_group = {}
    for r in got.collect():
        by_group.setdefault(r["taxon"], []).append(r)

    for g, vals in groups.items():
        stats = jackknife(vals)
        if stats is None or stats.threshold <= 0:
            assert g not in by_group  # untested group emits nothing
            continue
        assert g in by_group, g
        grows = by_group[g]
        assert len(grows) == len(vals)
        r0 = grows[0]
        assert r0["sample_size"] == stats.sample_size
        assert abs(r0["mean_value"] - stats.mean) < 1e-9 * max(1, abs(stats.mean))
        assert abs(r0["std_dev"] - stats.std_dev) < 1e-9 * max(1, stats.std_dev)
        assert abs(r0["threshold"] - stats.threshold) < 1e-9 * max(1, stats.threshold)
        assert r0["trigger_failsafe"] == stats.trigger_failsafe
        want = set(stats.outlier_values)
        for r in grows:
            assert r["is_outlier"] == (r["value"] in want), (
                g, r["row_key"], r["value"], sorted(want)
            )


def test_index_outlier_overlay(spark):
    """The persisted outlier store rides onto the index build as the
    reference's outlier_layer / outlier_layer_count SOLR fields
    (IndexDAO.scala:662-670, :844-845); records absent from the store
    index count 0, and the raw record-level store and its
    outlier_for_layers() rollup both work as the overlay input."""
    from biocache_store_spark.operators.index_projection import build_index
    from biocache_store_spark.operators.outlier_store import (
        jackknife_record_outliers,
        outlier_for_layers,
    )
    from biocache_store_spark.processors.chain import process_records

    occ = [("t1", f"r{i}", float(i + 1), float(i + 1)) for i in range(25)]
    occ.append(("t1", "rX", 500.0, 400.0))  # outlier on both layers
    store = jackknife_record_outliers(
        spark.createDataFrame(
            occ, "taxon string, oid string, el1 double, el2 double"
        ),
        ["taxon"],
        ["el1", "el2"],
        "oid",
    )
    raw = spark.createDataFrame(
        [("rX", "dr1", "PreservedSpecimen"), ("r0", "dr1", "HumanObservation"),
         ("zz", "dr1", "MachineObservation")],
        ["occurrenceID", "dataResourceUid", "basisOfRecord"],
    )
    for overlay in (store, outlier_for_layers(store)):
        idx = build_index(process_records(raw), outliers=overlay)
        rows = {r["id"]: r for r in idx.collect()}
        assert rows["rX"]["outlier_layer"] == ["el1", "el2"]
        assert rows["rX"]["outlier_layer_count"] == 2
        assert rows["r0"]["outlier_layer"] is None
        assert rows["r0"]["outlier_layer_count"] == 0
        assert rows["zz"]["outlier_layer_count"] == 0


def test_outlier_null_group_rows_never_tested_or_lost(spark):
    """NULL-group records are never tested (reference iterates actual
    taxa), and an incremental merge whose scope is derived from changed
    records must not drop them either way (the null-safe anti-join +
    null-unsafe semi-join trap)."""
    from biocache_store_spark.operators.outlier_store import (
        jackknife_record_outliers,
        merge_outlier_results,
    )

    rows = [("t1", f"r{i}", float(i + 1)) for i in range(25)]
    rows.append(("t1", "rX", 400.0))
    rows += [(None, f"n{i}", float(i)) for i in range(30)]  # group-less
    df = spark.createDataFrame(rows, "taxon string, oid string, el1 double")
    out = jackknife_record_outliers(df, ["taxon"], ["el1"], "oid")
    assert out.filter("taxon IS NULL").count() == 0  # never tested
    # scope with a NULL row (the pre-fix CLI shape): merge must still
    # round-trip the previous rows because prev never holds NULL groups
    prev = out
    groups = spark.createDataFrame([("t1",), (None,)], "taxon string")
    inc = jackknife_record_outliers(
        df.join(groups.na.drop(), "taxon", "left_semi"), ["taxon"], ["el1"], "oid"
    )
    merged = merge_outlier_results(prev, inc, groups, ["taxon"])
    assert merged.count() == prev.count()


def test_apply_outlier_assertions_lifecycle(spark):
    """storeResultsWithStats' assertion last mile: outliers get a FAILED
    DETECTED_OUTLIER with the 'Outlier for N layers' comment (replacing
    any existing entry, never duplicating), reverted records flip to
    PASSED, untouched records keep their assertions verbatim."""
    from biocache_store_spark.operators.outlier_store import (
        apply_outlier_assertions,
    )
    from biocache_store_spark.processors.assertions import AssertionCodes
    from biocache_store_spark.processors.chain import process_records

    raw = spark.createDataFrame(
        [("rX", "dr1", "PreservedSpecimen"),
         ("rGone", "dr1", "HumanObservation"),
         ("rPlain", "dr1", "MachineObservation")],
        ["occurrenceID", "dataResourceUid", "basisOfRecord"],
    )
    store = process_records(raw)
    rollup = spark.createDataFrame(
        [("rX", ["el1", "el2"], 2)],
        "row_key string, outlier_for_layers array<string>,"
        " outlier_for_layers_count int",
    )
    reverts = spark.createDataFrame([("rGone",)], "row_key string")
    # run twice: the second application must REPLACE, not duplicate
    out = apply_outlier_assertions(store, rollup, reverts, key_col="occurrenceID")
    out = apply_outlier_assertions(out, rollup, reverts, key_col="occurrenceID")
    rows = {r["occurrenceID"]: r for r in out.collect()}
    code = AssertionCodes.DETECTED_OUTLIER.code

    def entries(r):
        return [a for a in r["assertions"] if a["code"] == code]

    ex = entries(rows["rX"])
    assert len(ex) == 1 and ex[0]["qa_status"] == 0
    assert ex[0]["comment"] == "Outlier for 2 layers"
    eg = entries(rows["rGone"])
    assert len(eg) == 1 and eg[0]["qa_status"] == 1
    assert entries(rows["rPlain"]) == []
    # non-outlier assertions untouched
    base = {a["name"] for r in store.collect()
            if r["occurrenceID"] == "rPlain" for a in r["assertions"]}
    assert {a["name"] for a in rows["rPlain"]["assertions"]} == base


def test_distances_outside_m_np_parity():
    """The vectorized distance kernel is bit-identical to the scalar
    distance_outside_m over a dense point grid against a rectangle, an
    octagon, a ring with a duplicate vertex (degenerate zero-length
    segment), and an unclosed ring (implicit closing edge) — including
    boundary points, vertices, and far-away points."""
    import math

    import numpy as np

    from biocache_store_spark.operators.outlier_distribution import (
        distance_outside_m,
        distances_outside_m_np,
    )

    rect = [(110.0, -20.0), (135.0, -20.0), (135.0, 0.0), (110.0, 0.0),
            (110.0, -20.0)]
    octagon = [
        (120.0 + 6.0 * math.cos(k * math.pi / 4),
         -30.0 + 6.0 * math.sin(k * math.pi / 4))
        for k in range(8)
    ]
    dup_vertex = [(0.0, 0.0), (0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0),
                  (0.0, 0.0)]
    open_ring = [(10.0, 10.0), (14.0, 10.0), (14.0, 14.0), (10.0, 14.0)]

    lons = np.array(
        [l for l in np.linspace(-5.0, 145.0, 61)]
        + [110.0, 135.0, 122.5, 0.0, 4.0, 10.0, 14.0, 126.0]
    )
    lats = np.array(
        [l for l in np.linspace(-45.0, 20.0, 61)]
        + [-20.0, 0.0, -10.0, 0.0, 4.0, 10.0, 14.0, -30.0]
    )
    for ring in (rect, octagon, dup_vertex, open_ring):
        vec = distances_outside_m_np(lons, lats, ring)
        scalar = [
            distance_outside_m(float(lo), float(la), ring)
            for lo, la in zip(lons, lats)
        ]
        assert vec.tolist() == scalar  # bitwise, not approx
        assert (vec == 0.0).sum() > 0 or ring is open_ring  # some inside
        assert (vec > 0.0).sum() > 0  # some outside


def test_expert_outlier_rule_single_round_boundary(spark):
    """The outlier rule applies ONE round to the RAW metre distance
    (ExpertDistributionOutlierTool.scala:474-480). A record whose raw
    distance is 50000.46 m (uncertainty 0) rounds to 50000 -> NOT an
    outlier; the old pipeline stored round(d, 1) = 50000.5 first and
    re-rounded to 50001 -> falsely an outlier. This pins the store
    keeping raw metres and the rule seeing them."""
    from biocache_store_spark.operators.outlier_distribution import (
        expert_outlier_records,
    )

    records = spark.createDataFrame(
        [("oBand", "tA", 0.0, 110.44915971972691, None)],
        "occurrenceID string, taxonConceptID string, decimalLatitude double,"
        " decimalLongitude double, coordinateUncertaintyInMeters double",
    )
    dists = spark.createDataFrame(
        [("tA", "POLYGON((100 -10, 110 -10, 110 10, 100 10, 100 -10))")],
        "taxonConceptID string, wkt string",
    )
    row = expert_outlier_records(records, dists).collect()[0]
    # the store holds RAW metres, not a 0.1-pre-rounded value
    assert abs(row["distance_outside_m"] - 50000.45999999903) < 1e-6
    assert row["distance_outside_m"] != 50000.5
    assert row["is_outlier"] is False
    assert row["distance_outside_km"] is None
