"""Offline analytics: jackknife, duplicate detection, index projection,
SOLR query translation."""

from __future__ import annotations

import pytest

from biocache_store_spark.operators.dedup import (
    DupRecord,
    determine_precision,
    find_group_duplicates,
    is_spatial_duplicate,
    levenshtein,
    point_ladder,
)
from biocache_store_spark.operators.jackknife import jackknife

# --- jackknife (pure math, JackKnife.scala:14-99) ---------------------------


def test_jackknife_too_few_samples():
    assert jackknife([1.0] * 19) is None
    assert jackknife([]) is None
    assert jackknife(None) is None


def test_jackknife_no_range():
    assert jackknife([5.0] * 30) is None  # threshold 0


def test_jackknife_no_outliers_uniform():
    stats = jackknife(list(range(100)))
    assert stats is not None
    assert stats.sample_size == 100
    assert stats.min == 0 and stats.max == 99
    assert stats.outlier_values == ()
    assert not stats.trigger_failsafe


def test_jackknife_detects_extreme_outlier():
    # bulk straddles the mean so the cascade flags only the upper tail
    values = [float(v) for v in range(100)] + [200.0]
    stats = jackknife(values)
    assert stats is not None
    assert 200.0 in stats.outlier_values
    assert not stats.trigger_failsafe
    assert len(stats.outlier_values) <= 3


def test_jackknife_gap_failsafe():
    # a huge gap above a tight below-mean bulk co-flags the whole bulk via
    # the cascade (JackKnife.scala:50-56) -> failsafe clears the set
    values = [float(v) for v in range(30)] + [9999.0]
    stats = jackknife(values)
    assert stats is not None
    assert stats.trigger_failsafe
    assert stats.outlier_values == ()


def test_jackknife_low_outlier_cascade():
    values = [-500.0] + [float(v) for v in range(100, 200)]
    stats = jackknife(values)
    assert stats is not None
    assert -500.0 in stats.outlier_values


def test_jackknife_failsafe():
    # two extreme half-clusters: everything gets flagged -> failsafe clears
    values = [0.0] * 15 + [1000.0] * 15
    stats = jackknife(values)
    assert stats is not None
    if stats.trigger_failsafe:
        assert stats.outlier_values == ()


def test_jackknife_stats_values():
    stats = jackknife([float(v) for v in range(20)])
    assert stats.mean == pytest.approx(9.5)
    assert stats.range == pytest.approx(19.0)
    assert stats.threshold == pytest.approx((0.95 * (20**0.5) + 0.2) * 19 / 50)


# --- dedup primitives (DuplicationDetection.scala) --------------------------


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("same", "same") == 0


def test_point_ladder():
    pts = point_ladder("-35.21667", "144.81060")
    assert pts[0] == "-35,145"
    assert pts[1] == "-35.2,144.8"
    assert pts[2] == "-35.22,144.81"
    assert pts[5] == "-35.21667,144.81060"


def test_point_ladder_half_up_on_shortest_repr():
    """Reference tie semantics (IndexDAO.getLatLongString:170-185): java
    DecimalFormat with EXPLICIT RoundingMode.HALF_UP over Double.toString
    digits — 0.35 (exact double value 0.34999...) still rounds UP because
    the formatter sees the shortest repr '0.35'; negatives round away
    from zero. Spark's F.round (BigDecimal.valueOf = Double.toString +
    HALF_UP) agrees, so the Catalyst index ladder and this kernel match
    the reference and each other on ties."""
    from biocache_store_spark.operators.dedup import lat_long_rounded

    assert lat_long_rounded("0.35", 1) == "0.4"
    assert lat_long_rounded("-35.25", 1) == "-35.3"
    assert lat_long_rounded("0.125", 2) == "0.13"
    assert lat_long_rounded("-0.125", 2) == "-0.13"
    assert lat_long_rounded("0.5", 0) == "1"
    assert lat_long_rounded("-0.5", 0) == "-1"
    assert lat_long_rounded("-0.04", 1) == "-0"
    assert point_ladder("-35.25", "0.35")[1] == "-35.3,0.4"


def test_determine_precision():
    assert determine_precision("-35.21667,144.8106") == 5
    assert determine_precision("-35,144") == 0
    assert determine_precision(None) == 0


def test_spatial_duplicate_exact():
    a = point_ladder("-35.2166", "144.8106")
    assert is_spatial_duplicate(a, list(a))


def test_spatial_duplicate_different():
    a = point_ladder("-35.2166", "144.8106")
    b = point_ladder("-36.2166", "145.8106")
    assert not is_spatial_duplicate(a, b)


def test_spatial_duplicate_precision_difference():
    # same location, one record reported at lower precision
    a = point_ladder("-35.2", "144.8")
    b = point_ladder("-35.21667", "144.81060")
    assert is_spatial_duplicate(a, b)


def _rec(key, lat, lon, collector, druid="dr1", catalogue=None):
    return DupRecord(
        row_key=key,
        druid=druid,
        year="2000",
        month="01",
        day="05",
        lat=lat,
        lon=lon,
        collector=collector,
        catalogue_number=catalogue,
    )


def test_group_duplicates_fuzzy_collector():
    records = [
        _rec("r1", "-35.21667", "144.81060", "Smith, J."),
        _rec("r2", "-35.2", "144.8", "Smyth, J."),  # lev <= 3, lower precision
        _rec("r3", "-20.0", "140.0", "Jones, K."),  # different place
    ]
    out = {r.row_key: r for r in find_group_duplicates(records)}
    assert out["r1"].status == "R"  # higher precision representative
    assert out["r2"].status == "D1"
    assert out["r2"].duplicate_of == "r1"
    assert out["r3"].status == "U"


def test_group_duplicates_representative_by_precision():
    records = [
        _rec("a_low", "-35.2", "144.8", "Smith, J."),
        _rec("b_high", "-35.21667", "144.81060", "Smith, J.", druid="dr2"),
    ]
    out = {r.row_key: r for r in find_group_duplicates(records)}
    assert out["b_high"].status == "R"
    assert out["a_low"].status == "D2"  # different resource from representative


def test_group_duplicates_catalogue_number():
    records = [
        _rec("r1", "-35.2", "144.8", "Smith, J.", catalogue="CAT42"),
        _rec("r2", "-35.2", "144.8", "Completely Different", catalogue="cat42 "),
    ]
    out = {r.row_key: r for r in find_group_duplicates(records)}
    assert out["r2"].duplicate_of == "r1"


# --- Spark integration ------------------------------------------------------


def test_detect_duplicates_spark(spark):
    from biocache_store_spark.operators.dedup import detect_duplicates

    rows = [
        ("o1", "dr1", "lsid:1", "2000", "01", "05", "-35.21667", "144.81060", "Smith, J.", None, None),
        ("o2", "dr1", "lsid:1", "2000", "01", "05", "-35.2", "144.8", "Smyth, J.", None, None),
        ("o3", "dr1", "lsid:1", "2001", "02", "06", "-35.2", "144.8", "Smith, J.", None, None),
        ("o4", "dr2", "lsid:2", "2000", "01", "05", "-35.2", "144.8", "Smith, J.", None, None),
    ]
    schema = (
        "occurrenceID string, dataResourceUid string, taxonConceptID string, "
        "year string, month string, day string, decimalLatitude string, "
        "decimalLongitude string, recordedBy string, recordNumber string, "
        "catalogNumber string"
    )
    df = spark.createDataFrame(rows, schema)
    out = {r["row_key"]: r for r in detect_duplicates(df).collect()}
    assert out["o1"]["status"] == "R"
    assert out["o2"]["status"] == "D1"
    assert out["o3"]["status"] == "U"  # different group (date)
    assert out["o4"]["status"] == "U"  # different group (taxon)


def test_detect_duplicates_join_parity(spark):
    """detect_duplicates_join (JVM pairwise predicate + greedy edge walk)
    is row-identical to detect_duplicates (live Python kernel) on a
    seeded random mix exercising every predicate branch: precision
    ladders, fuzzy/exact/missing collectors, 'null'/'UNKNOWN OR
    ANONYMOUS' sentinels, punctuation-only collectors, record/catalogue
    numbers with case+whitespace variants, unparseable and missing
    coordinates, and dateless groups."""
    import random

    from biocache_store_spark.operators.dedup import (
        detect_duplicates,
        detect_duplicates_grouped,
        detect_duplicates_join,
    )

    rng = random.Random(42)
    coords = [
        ("-35.21667", "144.81060"), ("-35.2", "144.8"),
        ("-35.2166", "144.8106"), ("-35.22", "144.81"),
        ("-20.0", "140.0"), ("20.123", "150.456"),
        (None, "144.8"), ("abc", "144.8"), ("-35.21667", None),
        ("0", "0"), ("-0.0", "0.00"),
    ]
    collectors = [
        "Smith, J.", "Smyth, J.", "Smith J", "SMITH, J.", "Jones, K.",
        None, "", "UNKNOWN OR ANONYMOUS", "null", "!!!", "Smithson, J.",
        # unicode collectors: the join form truncates and levenshteins
        # the prepared strings JVM-side — char-based length/substr/
        # distance must agree with Python's on non-ASCII letters
        "смит и", "Ég þú",
    ]
    rns = [None, "RN1", "rn1 ", "RN2", "", "null"]
    cats = [None, "CAT42", "cat42 ", "CAT43", "UNKNOWN OR ANONYMOUS"]
    dates = [("2000", "01", "05"), ("2000", "01", None), ("2000", None, None)]
    rows = []
    for i in range(240):
        lat, lon = rng.choice(coords)
        y, m, d = rng.choice(dates)
        rows.append((
            f"o{i:03d}", rng.choice(["dr1", "dr2"]),
            f"lsid:{rng.randrange(4)}", y, m, d, lat, lon,
            rng.choice(collectors), rng.choice(rns), rng.choice(cats),
        ))
    schema = (
        "occurrenceID string, dataResourceUid string, taxonConceptID string, "
        "year string, month string, day string, decimalLatitude string, "
        "decimalLongitude string, recordedBy string, recordNumber string, "
        "catalogNumber string"
    )
    df = spark.createDataFrame(rows, schema)
    live = sorted(map(str, detect_duplicates_grouped(df).collect()))
    joined = sorted(map(str, detect_duplicates_join(df).collect()))
    assert live == joined
    shipped = sorted(map(str, detect_duplicates(df).collect()))
    assert live == shipped
    # the mix actually formed clusters (non-vacuous parity)
    assert any("'R'" in r for r in live)


def test_dedup_np_kernel_helper_parity():
    """The round-10 NumPy pair kernel's three primitives are
    bit-identical to their scalar parity oracles: the vectorized
    spatial-ladder walk (exhaustive over 2-symbol ladders + seeded
    None-bearing randoms), the np.char-formatted point ladder (tricky
    rounding/parse values incl. banker's ties, -0.0, '1_0', 'nan'),
    and the early-exit Levenshtein>3 predicate."""
    import itertools
    import random
    import string

    import numpy as np

    from biocache_store_spark.operators.dedup import (
        _lev_gt3,
        _point_ladder_np,
        _spatial_dup_np,
        is_spatial_duplicate,
        levenshtein,
        point_ladder,
    )

    rng = random.Random(42)
    pairs = [
        (list(A), list(B))
        for A in itertools.product(["a", "b"], repeat=6)
        for B in itertools.product(["a", "b"], repeat=6)
    ]
    vals = ["a", "b", None]
    pairs += [
        ([rng.choice(vals) for _ in range(6)], [rng.choice(vals) for _ in range(6)])
        for _ in range(3000)
    ]
    Am = np.array([p[0] for p in pairs], dtype=object)
    Bm = np.array([p[1] for p in pairs], dtype=object)
    got = _spatial_dup_np(Am, Bm)
    for g, (a, b) in zip(got, pairs):
        assert bool(g) == is_spatial_duplicate(a, b), (a, b)

    tricky = [
        "-35.123456", "0.125", "-0.0", "150", "0.015", "0.545", "", None,
        "nan", "inf", "1_0", "  -35.5  ", "abc", "-35.44500", "2.675",
        "-0.2", "1e2", "-1.05e-3", "179.99995", "0.00005",
    ]
    la = [a for a in tricky for _ in tricky]
    lo = [b for _ in tricky for b in tricky]
    R = _point_ladder_np(np.array(la, dtype=object), np.array(lo, dtype=object))
    for i, (a, b) in enumerate(zip(la, lo)):
        assert list(R[i]) == point_ladder(a, b), (a, b)

    for _ in range(2000):
        a = "".join(rng.choices(string.ascii_lowercase[:5], k=rng.randint(0, 10)))
        b = "".join(rng.choices(string.ascii_lowercase[:5], k=rng.randint(0, 10)))
        assert _lev_gt3(a, b) == (levenshtein(a, b) > 3), (a, b)


def test_np_helper_parity_hypothesis():
    """Property-based widening of the dense parity tests: arbitrary
    coordinate strings (incl. float-repr noise, exponents, whitespace,
    garbage) through _point_ladder_np vs point_ladder; arbitrary
    None-bearing ladders through _spatial_dup_np vs the scalar walk."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from biocache_store_spark.operators.dedup import (
        _point_ladder_np,
        _spatial_dup_np,
        is_spatial_duplicate,
        point_ladder,
    )

    coord = st.one_of(
        st.none(),
        st.just(""),
        st.floats(allow_nan=True, allow_infinity=True).map(repr),
        st.floats(min_value=-180, max_value=180).map(lambda v: f"{v:.6f}"),
        st.text(
            alphabet="0123456789.-+eE_ ", min_size=0, max_size=14
        ),
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.tuples(coord, coord), min_size=1, max_size=20))
    def ladder_case(pairs):
        la = np.array([p[0] for p in pairs], dtype=object)
        lo = np.array([p[1] for p in pairs], dtype=object)
        R = _point_ladder_np(la, lo)
        for i, (a, b) in enumerate(pairs):
            assert list(R[i]) == point_ladder(a, b), (a, b)

    ladder_case()

    rung = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.tuples(rung, rung, rung, rung, rung, rung),
                st.tuples(rung, rung, rung, rung, rung, rung),
            ),
            min_size=1,
            max_size=50,
        )
    )
    def spatial_case(pairs):
        A = np.array([list(p[0]) for p in pairs], dtype=object)
        B = np.array([list(p[1]) for p in pairs], dtype=object)
        got = _spatial_dup_np(A, B)
        for g, (a, b) in zip(got, pairs):
            assert bool(g) == is_spatial_duplicate(list(a), list(b)), (a, b)

    spatial_case()


def test_streamed_vectorized_scalar_parity(spark):
    """detect_duplicates_streamed(vectorized=True) — the round-10 NumPy
    batch matcher — is row-identical to the scalar emit on the nasty
    predicate mix, under tiny Arrow batches so carries and group
    boundaries are exercised too."""
    import random

    from biocache_store_spark.operators.dedup import (
        detect_duplicates_streamed,
    )

    rng = random.Random(7)
    coords = [
        ("-35.21667", "144.81060"), ("-35.2", "144.8"),
        ("-35.2166", "144.8106"), ("-35.22", "144.81"),
        ("-20.0", "140.0"), ("20.123", "150.456"),
        (None, "144.8"), ("abc", "144.8"), ("-35.21667", None),
        ("0", "0"), ("-0.0", "0.00"),
    ]
    collectors = [
        "Smith, J.", "Smyth, J.", "Smith J", "SMITH, J.", "Jones, K.",
        None, "", "UNKNOWN OR ANONYMOUS", "null", "!!!", "Smithson, J.",
        "смит и", "Ég þú", "J Smith", "Smith J r",  # shift typos: the
        # hamming>3-but-lev<=3 pairs that hit the Python DP fallback
    ]
    rns = [None, "RN1", "rn1 ", "RN2", "", "null"]
    cats = [None, "CAT42", "cat42 ", "CAT43", "UNKNOWN OR ANONYMOUS"]
    dates = [("2000", "01", "05"), ("2000", "01", None), ("2000", None, None)]
    rows = []
    for i in range(300):
        lat, lon = rng.choice(coords)
        y, m, d = rng.choice(dates)
        rows.append((
            f"o{i:03d}", rng.choice(["dr1", "dr2"]),
            f"lsid:{rng.randrange(4)}", y, m, d, lat, lon,
            rng.choice(collectors), rng.choice(rns), rng.choice(cats),
        ))
    schema = (
        "occurrenceID string, dataResourceUid string, taxonConceptID string, "
        "year string, month string, day string, decimalLatitude string, "
        "decimalLongitude string, recordedBy string, recordNumber string, "
        "catalogNumber string"
    )
    df = spark.createDataFrame(rows, schema).coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
    try:
        vec = sorted(map(str, detect_duplicates_streamed(df).collect()))
        scal = sorted(
            map(str, detect_duplicates_streamed(df, vectorized=False).collect())
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert vec == scal
    assert any("'R'" in r for r in vec)  # non-vacuous


def test_streamed_np_no_cross_group_edge_leak(spark):
    """row_key uniqueness is a PER-GROUP contract: the same dirty
    occurrenceID may recur under two (taxon, date) keys inside one Arrow
    batch. The vectorized kernel's claim map must be keyed per group
    (ADVICE r10) — here 'dupA' claims 'dupB' in taxon 1 (same point,
    same collector) while in taxon 2 the same two keys sit far apart
    and must stay REPRESENTATIVE; taxon 2 still has its own claim pair
    so its group IS walked (a claim-free group would never consult the
    map and the leak could hide)."""
    from biocache_store_spark.operators.dedup import (
        detect_duplicates_streamed,
    )

    rows = [
        # taxon 1: dupA claims dupB (identical point, same collector)
        ("dupA", "dr1", "lsid:1", "2000", "01", "05",
         "-35.2", "144.8", "Smith, J.", None, None),
        ("dupB", "dr1", "lsid:1", "2000", "01", "05",
         "-35.2", "144.8", "Smith, J.", None, None),
        # taxon 2: same two row_keys, far apart -> NOT duplicates...
        ("dupA", "dr1", "lsid:2", "2000", "01", "05",
         "-35.2", "144.8", "Smith, J.", None, None),
        ("dupB", "dr1", "lsid:2", "2000", "01", "05",
         "20.0", "100.0", "Smith, J.", None, None),
        # ...but the group has its own claim edge, so it gets walked
        ("othC", "dr1", "lsid:2", "2000", "01", "05",
         "-10.0", "130.0", "Jones, K.", None, None),
        ("othD", "dr1", "lsid:2", "2000", "01", "05",
         "-10.0", "130.0", "Jones, K.", None, None),
    ]
    schema = (
        "occurrenceID string, dataResourceUid string, taxonConceptID string, "
        "year string, month string, day string, decimalLatitude string, "
        "decimalLongitude string, recordedBy string, recordNumber string, "
        "catalogNumber string"
    )
    df = spark.createDataFrame(rows, schema).coalesce(1)
    vec = sorted(map(str, detect_duplicates_streamed(df).collect()))
    scal = sorted(
        map(str, detect_duplicates_streamed(df, vectorized=False).collect())
    )
    assert vec == scal
    t2 = {
        (r["row_key"], r["status"])
        for r in detect_duplicates_streamed(df).collect()
        if r["taxon"] == "lsid:2"
    }
    assert ("dupB", "U") in t2  # not claimed by taxon 1's edge
    assert ("othD", "D1") in t2  # the group WAS walked


def test_np_pair_chunking_invariant(monkeypatch):
    """The pair-axis chunking added for the r10 ADVICE memory gate must
    be result-invariant to the chunk size: _emit_batch_np (called
    in-process — it is a pure pandas function) produces row-identical
    output under the default budget, a budget so small every chunk is
    ONE pair, and a budget below the participant gate (which flips the
    whole comparison to the per-pair Python fallback path)."""
    import pandas as pd

    from biocache_store_spark.operators import dedup as d

    rows = []
    collectors = [
        "Smith, John Albert", "Smith; John Albert", "Smyth, John Albert",
        "Jones, K.", "SMITH JOHN ALBERT", "Smith J A", "Smithson, J.",
    ]
    for i in range(24):
        rows.append({
            "g_taxon": "lsid:1", "g_year": "2000", "g_month": "01",
            "g_day": "05", "row_key": f"o{i:02d}", "druid": "dr1",
            "lat": "-35.2", "lon": "144.8",
            "collector": collectors[i % len(collectors)],
            "record_number": None, "catalogue_number": None,
        })
    # a second group so group offsets are exercised too
    for i in range(8):
        rows.append({
            "g_taxon": "lsid:2", "g_year": "2000", "g_month": "01",
            "g_day": "05", "row_key": f"p{i:02d}", "druid": "dr1",
            "lat": "-20.0", "lon": "140.0",
            "collector": collectors[(i * 3) % len(collectors)],
            "record_number": "RN1" if i % 2 else None,
            "catalogue_number": None,
        })
    pdf = pd.DataFrame(rows)
    keys = ["g_taxon", "g_year", "g_month", "g_day"]

    def run():
        out = d._emit_batch_np(pdf, keys)
        return sorted(
            out.assign(dup_types=out["dup_types"].map(tuple))
            .itertuples(index=False, name=None)
        )

    base = run()
    assert any(r for r in base if r[5] in ("R", "D1", "D2"))  # non-vacuous
    # multi-chunk: W=15 (longest cleaned collector), ~32 participants
    # -> W*part ~ 480 passes the gate at budget 600, while ~300 pairs
    # give step = 600//15 = 40 -> ~8 pair chunks
    monkeypatch.setattr(d, "_NP_CMP_ELEM_BUDGET", 600)
    assert run() == base
    # below the participant gate: W * part.size > budget -> the whole
    # codepoint-matrix path yields to the per-pair prefix/_lev_gt3 walk
    monkeypatch.setattr(d, "_NP_CMP_ELEM_BUDGET", 1)
    assert run() == base


def test_streamed_np_giant_group_cap_parity(spark):
    """Groups past _NP_PAIR_GROUP_CAP skip the O(m^2) pair
    materialization and walk the live matcher — output identical to the
    uncapped vectorized path (pair_group_cap=4 so ordinary test groups
    trip it — the param threads through the closure, reaching the
    Python workers where a module monkeypatch would not; 3/12/30-row
    groups mix capped and uncapped with 7-row Arrow carries active)."""
    from biocache_store_spark.operators import dedup as d

    rows = []
    for t in range(3):
        size = [3, 12, 30][t]  # below / above / far above the test cap
        for i in range(size):
            rows.append((
                f"o{t}_{i:02d}", "dr1", f"lsid:{t}", "2000", "01", "05",
                "-35.21667" if i % 3 else "-35.2",
                "144.81060" if i % 3 else "144.8",
                ["Smith, J.", "Smyth, J.", None][i % 3], None,
                "CAT1" if i % 4 == 0 else None,
            ))
    schema = (
        "occurrenceID string, dataResourceUid string, taxonConceptID string, "
        "year string, month string, day string, decimalLatitude string, "
        "decimalLongitude string, recordedBy string, recordNumber string, "
        "catalogNumber string"
    )
    df = spark.createDataFrame(rows, schema).coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        base = sorted(map(str, d.detect_duplicates_streamed(df).collect()))
        capped = sorted(
            map(
                str,
                d.detect_duplicates_streamed(df, pair_group_cap=4).collect(),
            )
        )
        scalar = sorted(
            map(str, d.detect_duplicates_streamed(df, vectorized=False).collect())
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert base == capped == scalar
    assert any("'R'" in r for r in base)  # non-vacuous


def test_detect_duplicates_streamed_batch_boundary(spark):
    """The carry buffer reunites a group that straddles an Arrow batch
    boundary: with maxRecordsPerBatch=7 and 30-row groups, every group
    spans batches, and the streamed kernel must still see each group
    whole (a split group would dedup each half separately and emit
    different representatives)."""
    from biocache_store_spark.operators.dedup import (
        detect_duplicates_grouped,
        detect_duplicates_streamed,
    )

    rows = []
    for t in range(4):
        for i in range(30):
            rows.append((
                f"o{t}_{i:02d}", "dr1", f"lsid:{t}", "2000", "01", "05",
                "-35.21667" if i % 3 else "-35.2",
                "144.81060" if i % 3 else "144.8",
                "Smith, J.", None, None,
            ))
    schema = (
        "occurrenceID string, dataResourceUid string, taxonConceptID string, "
        "year string, month string, day string, decimalLatitude string, "
        "decimalLongitude string, recordedBy string, recordNumber string, "
        "catalogNumber string"
    )
    df = spark.createDataFrame(rows, schema).coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        live = sorted(map(str, detect_duplicates_grouped(df).collect()))
        streamed = sorted(map(str, detect_duplicates_streamed(df).collect()))
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert live == streamed
    # one representative per 30-row cluster, nothing dropped
    assert sum("'R'" in r for r in streamed) == 4
    assert len(streamed) == 120


def test_incremental_dedup_equals_full_rerun(spark):
    """IncrementalDuplicationDetection mirror: after an ingest touches one
    species, a scoped re-run over that species (derived via touched_taxa
    from the modified time) merged into the standing duplicate store
    equals a full from-scratch re-run — including a record that LEFT its
    cluster (the obsolete-revert case) and untouched taxa passing
    through unchanged."""
    from biocache_store_spark.operators.dedup import (
        detect_duplicates,
        detect_duplicates_scoped,
        merge_dedup_results,
        touched_taxa,
    )

    schema = (
        "occurrenceID string, dataResourceUid string, taxonConceptID string, "
        "year string, month string, day string, decimalLatitude string, "
        "decimalLongitude string, recordedBy string, recordNumber string, "
        "catalogNumber string, lastModifiedTime string"
    )
    t0_rows = [
        # lsid:1 — o1/o2 duplicates at T0
        ("o1", "dr1", "lsid:1", "2000", "01", "05", "-35.21667", "144.81060", "Smith, J.", None, None, "2026-01-01"),
        ("o2", "dr1", "lsid:1", "2000", "01", "05", "-35.2", "144.8", "Smyth, J.", None, None, "2026-01-01"),
        # lsid:2 — untouched forever
        ("o4", "dr2", "lsid:2", "2000", "01", "05", "-35.2", "144.8", "Smith, J.", None, None, "2026-01-01"),
        ("o5", "dr2", "lsid:2", "2000", "01", "05", "-35.2", "144.8", "Smith, J.", None, None, "2026-01-01"),
    ]
    t1_rows = [
        # o2 reloaded with a corrected date: it LEAVES o1's cluster
        ("o1", "dr1", "lsid:1", "2000", "01", "05", "-35.21667", "144.81060", "Smith, J.", None, None, "2026-01-01"),
        ("o2", "dr1", "lsid:1", "2001", "03", "09", "-35.2", "144.8", "Smyth, J.", None, None, "2026-02-01"),
        # and a NEW record joins o1's group
        ("o3", "dr3", "lsid:1", "2000", "01", "05", "-35.2", "144.8", "Smith, J.", None, None, "2026-02-01"),
        ("o4", "dr2", "lsid:2", "2000", "01", "05", "-35.2", "144.8", "Smith, J.", None, None, "2026-01-01"),
        ("o5", "dr2", "lsid:2", "2000", "01", "05", "-35.2", "144.8", "Smith, J.", None, None, "2026-01-01"),
    ]
    store_t0 = spark.createDataFrame(t0_rows, schema)
    store_t1 = spark.createDataFrame(t1_rows, schema)
    prev = detect_duplicates(store_t0)

    taxa = touched_taxa(store_t1, since="2026-01-15")
    assert [r["taxon"] for r in taxa.collect()] == ["lsid:1"]

    inc = detect_duplicates_scoped(store_t1, taxa)
    # the scoped run covers ALL of lsid:1's records, so its rows equal
    # the full re-run's rows for that species
    full = detect_duplicates(store_t1)
    key = lambda r: (r["taxon"], r["row_key"])  # noqa: E731
    assert sorted(map(str, sorted(inc.collect(), key=key))) == sorted(
        map(str, sorted(full.filter("taxon = 'lsid:1'").collect(), key=key))
    )
    # merged standing store == full from-scratch recompute
    merged = merge_dedup_results(prev, inc, taxa)
    assert sorted(map(str, merged.collect())) == sorted(map(str, full.collect()))
    # and the departed record is demoted back to U (obsolete revert)
    got = {r["row_key"]: r["status"] for r in merged.collect()}
    assert got["o2"] == "U" and got["o1"] == "R" and got["o3"] == "D2"


def test_incremental_dedup_taxon_reassignment(spark):
    """A record that MOVES species between runs: scoping by the changed
    records' current taxa alone would leave the OLD species' clusters
    stale; reassigned_taxa recovers the old taxa from the standing
    duplicate store so merge(prev, scoped-rerun) == full recompute."""
    from biocache_store_spark.operators.dedup import (
        detect_duplicates,
        detect_duplicates_scoped,
        merge_dedup_results,
        reassigned_taxa,
        touched_record_ids,
        touched_taxa,
    )

    schema = (
        "occurrenceID string, dataResourceUid string, taxonConceptID string, "
        "year string, month string, day string, decimalLatitude string, "
        "decimalLongitude string, recordedBy string, recordNumber string, "
        "catalogNumber string, lastModifiedTime string"
    )
    t0_rows = [
        # lsid:A — o1/o2 duplicates at T0
        ("o1", "dr1", "lsid:A", "2000", "01", "05", "-35.21667", "144.81060", "Smith, J.", None, None, "2026-01-01"),
        ("o2", "dr1", "lsid:A", "2000", "01", "05", "-35.2", "144.8", "Smyth, J.", None, None, "2026-01-01"),
        # lsid:B — o7 alone
        ("o7", "dr2", "lsid:B", "2000", "01", "05", "-30.0", "140.0", "Jones", None, None, "2026-01-01"),
    ]
    # o2 is RE-IDENTIFIED as lsid:B (moves species) and lands at o7's spot
    t1_rows = [
        ("o1", "dr1", "lsid:A", "2000", "01", "05", "-35.21667", "144.81060", "Smith, J.", None, None, "2026-01-01"),
        ("o2", "dr1", "lsid:B", "2000", "01", "05", "-30.0", "140.0", "Jones", None, None, "2026-02-01"),
        ("o7", "dr2", "lsid:B", "2000", "01", "05", "-30.0", "140.0", "Jones", None, None, "2026-01-01"),
    ]
    store_t0 = spark.createDataFrame(t0_rows, schema)
    store_t1 = spark.createDataFrame(t1_rows, schema)
    prev = detect_duplicates(store_t0)

    # current taxa of changed records = lsid:B only; the old lsid:A comes
    # from the standing store via the changed record ids
    taxa_new = touched_taxa(store_t1, since="2026-01-15")
    assert [r["taxon"] for r in taxa_new.collect()] == ["lsid:B"]
    changed = touched_record_ids(store_t1, since="2026-01-15")
    taxa = taxa_new.unionByName(reassigned_taxa(prev, changed)).distinct()
    assert sorted(r["taxon"] for r in taxa.collect()) == ["lsid:A", "lsid:B"]

    inc = detect_duplicates_scoped(store_t1, taxa)
    merged = merge_dedup_results(prev, inc, taxa)
    full = detect_duplicates(store_t1)
    assert sorted(map(str, merged.collect())) == sorted(map(str, full.collect()))
    keys = {(r["taxon"], r["row_key"]) for r in merged.collect()}
    assert ("lsid:B", "o2") in keys and ("lsid:A", "o2") not in keys
    got = {r["row_key"]: r["status"] for r in merged.collect()}
    # o1 lost its only duplicate (obsolete revert in the OLD taxon);
    # o2/o7 pair up in the new one
    assert got["o1"] == "U" and {got["o2"], got["o7"]} <= {"R", "D2"}

    # merge_dedup_results safety net: even with the batch-only scope the
    # stale old-taxon row for the moved record must not survive
    inc_new_only = detect_duplicates_scoped(store_t1, taxa_new)
    merged_weak = merge_dedup_results(prev, inc_new_only, taxa_new)
    weak_keys = {(r["taxon"], r["row_key"]) for r in merged_weak.collect()}
    assert ("lsid:A", "o2") not in weak_keys
    rows = merged_weak.collect()
    assert len(rows) == len({r["row_key"] for r in rows})


def test_touched_taxa_timestamp_scoping(spark):
    """touched_taxa compares modified times AS TIMESTAMPS: a non-ISO
    `since` is rejected driver-side, and a store whose modified column
    holds unparseable strings fails loudly instead of silently scoping
    wrong (VERDICT r7 'What's wrong' #2)."""
    import pytest

    from biocache_store_spark.operators.dedup import touched_taxa

    schema = "occurrenceID string, taxonConceptID string, lastModifiedTime string"
    ok = spark.createDataFrame(
        [("o1", "t1", "2026-01-20 10:00:00"), ("o2", "t2", "2026-01-10")],
        schema,
    )
    got = [r["taxon"] for r in touched_taxa(ok, since="2026-01-15").collect()]
    assert got == ["t1"]
    # full-ISO since with a T separator parses too
    got = [
        r["taxon"]
        for r in touched_taxa(ok, since="2026-01-15T00:00:00").collect()
    ]
    assert got == ["t1"]

    with pytest.raises(ValueError, match="ISO"):
        touched_taxa(ok, since="15/01/2026").collect()

    bad = spark.createDataFrame([("o1", "t1", "20/1/2026")], schema)
    with pytest.raises(Exception, match="unparseable"):
        touched_taxa(bad, since="2026-01-15").collect()

    # NULL modified times are simply out of scope, not an error
    nulls = spark.createDataFrame([("o1", "t1", None)], schema)
    assert touched_taxa(nulls, since="2026-01-15").count() == 0
    # and a typed timestamp column works unchanged
    typed = ok.withColumn(
        "lastModifiedTime", ok["lastModifiedTime"].cast("timestamp")
    )
    got = [r["taxon"] for r in touched_taxa(typed, since="2026-01-15").collect()]
    assert got == ["t1"]


def test_calculated_layers_endemism(spark):
    """calculated_layers (tool/CalculatedLayerHelper.scala): per-cell
    density, richness, and integer micro-endemism; a single-cell endemic
    contributes the full scale, a two-cell species half per cell;
    rows missing species or cell are excluded; grid_cell rounds
    coordinates to the ladder resolution and nulls invalid ones."""
    from biocache_store_spark.operators.calculated_layers import (
        calculated_layers,
        grid_cell,
        species_cell_counts,
    )

    occ = spark.createDataFrame(
        [
            ("sp1", "A"), ("sp1", "A"),   # endemic to A, 2 occurrences
            ("sp2", "A"), ("sp2", "B"),   # spans A and B
            (None, "A"), ("sp3", None),   # excluded
        ],
        "species_guid string, cell string",
    )
    scc = {
        r["species"]: r["n_cells"]
        for r in species_cell_counts(occ, cell_col="cell").collect()
    }
    assert scc == {"sp1": 1, "sp2": 2}
    out = {r["cell"]: r for r in calculated_layers(occ).collect()}
    assert out["A"]["n_occurrences"] == 3 and out["A"]["n_species"] == 2
    assert out["A"]["endemism_micro"] == 1_000_000 + 500_000
    assert out["B"]["endemism_micro"] == 500_000
    assert set(out) == {"A", "B"}

    pts = spark.createDataFrame(
        [("-35.21667", "144.81061"), ("bad", "144.8")],
        "decimalLatitude string, decimalLongitude string",
    )
    cells = [r["c"] for r in pts.select(grid_cell().alias("c")).collect()]
    assert cells == ["-35.217,144.811", None]


def test_jackknife_spark(spark):
    from biocache_store_spark.operators.jackknife import jackknife_stats

    rows = [("g1", float(v)) for v in range(100)] + [("g1", 200.0)]
    rows += [("g2", 1.0)] * 5  # below sample threshold -> dropped
    df = spark.createDataFrame(rows, ["grp", "value"])
    out = jackknife_stats(df, ["grp"], "value").collect()
    assert len(out) == 1
    row = out[0]
    assert row["grp"] == "g1"
    assert row["sample_size"] == 101
    assert 200.0 in row["outlier_values"]
    assert not row["trigger_failsafe"]


def test_index_projection(spark):
    import datetime as dt

    from biocache_store_spark.operators.index_projection import (
        build_index,
        facet_counts,
    )
    from biocache_store_spark.processors.chain import process_records

    rows = [
        ("occ1", "dr1", "PreservedSpecimen", "1978-12-31", "-35.21667",
         "144.81060", "WGS84", "Australia", "Victoria"),
        ("occ2", "dr1", "HumanObservation", "2001-05-05", "-30.1", "150.5",
         "WGS84", "Australia", "New South Wales"),
    ]
    cols = ["occurrenceID", "dataResourceUid", "basisOfRecord", "eventDate",
            "decimalLatitude", "decimalLongitude", "geodeticDatum", "country",
            "stateProvince"]
    df = spark.createDataFrame(rows, cols)
    index = build_index(process_records(df, today=dt.date(2026, 8, 13)))
    data = {r["id"]: r for r in index.collect()}
    r1 = data["occ1"]
    assert r1["occurrence_year"] == 1978
    assert r1["occurrence_decade_i"] == 1970
    assert r1["point_1"] == "-35,145"
    assert r1["point_0_1"] == "-35.2,144.8"
    assert r1["latitude"] == pytest.approx(-35.21667)
    assert r1["geospatial_kosher"] is True
    assert "invalidCollectionDate" in r1["assertions_passed"]
    # "state" is PARSED (layer-derived); with no intersect layers the raw
    # value appears only in raw_state (headerAttributesFix parity)
    facets = {r["facet_value"]: r["facet_count"] for r in facet_counts(index, "raw_state").collect()}
    assert facets == {"Victoria": 1, "New South Wales": 1}


def test_solr_query_translator(spark):
    from biocache_store_spark.plans.solr_query import translate

    df = spark.createDataFrame(
        [("Victoria", 2005, "dr1"), ("Tasmania", 1999, "dr2"),
         ("Victoria", 1998, "dr2"), (None, 2010, "dr3")],
        ["state", "year", "data_resource_uid"],
    )
    q = translate("state:Victoria AND year:[2000 TO *]")
    assert [r["data_resource_uid"] for r in df.filter(q).collect()] == ["dr1"]

    q2 = translate("state:Victoria OR state:Tasmania")
    assert df.filter(q2).count() == 3

    q3 = translate("-state:Victoria AND year:[* TO 2005]")
    assert df.filter(q3).count() == 1

    q4 = translate('state:"Victoria"')
    assert df.filter(q4).count() == 2

    q5 = translate("data_resource_uid:dr*")
    assert df.filter(q5).count() == 4

    q6 = translate("*:*")
    assert df.filter(q6).count() == 4

    q7 = translate("state:(Victoria OR Tasmania) AND year:{1998 TO 2006}")
    assert df.filter(q7).count() == 2

    # field mapping (SOLR name -> column)
    q8 = translate("data_resource_uid:dr2", {"data_resource_uid": "data_resource_uid"})
    assert df.filter(q8).count() == 2


def test_raw_scientific_name_reference_matrix(spark):
    """IndexTest.scala "Raw Scientific Name": the fallback ladder."""
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.index_projection import (
        raw_scientific_name,
    )

    rows = [
        # scientificName, genus, species, subspecies, specificEpithet,
        # infraspecificEpithet, family, expected
        ("Aus bus", None, None, None, None, None, None, "Aus bus"),
        (None, "Aus", None, None, None, None, None, "Aus"),
        (None, "Aus", "bus", None, None, None, None, "Aus bus"),
        (None, "Aus", "bus", "cus", None, None, None, "Aus bus cus"),
        ("Aus", "Dus", None, None, None, None, None, "Aus"),
        (None, "Aus", None, None, "bus", None, None, "Aus bus"),
        (None, "Aus", None, None, "bus", "cus", None, "Aus bus cus"),
        (None, None, None, None, None, None, "Family", "Family"),
        # specificEpithet outranks species; infraspecific outranks subspecies
        (None, "Aus", "sp2", None, "sp1", None, None, "Aus sp1"),
        # empty strings behave as missing
        ("", "Aus", "", None, None, None, None, "Aus"),
        (None, None, None, None, None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "scientificName string, genus string, species string, "
        "subspecies string, specificEpithet string, "
        "infraspecificEpithet string, family string, expected string",
    )
    out = df.withColumn(
        "got",
        raw_scientific_name({c: F.col(c) for c in df.columns if c != "expected"}),
    )
    for r in out.collect():
        assert r["got"] == r["expected"], r


def test_should_index_reference_cases(spark):
    """IndexTest.scala "Tests Index Date Ranges"."""
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.index_projection import should_index

    df = spark.createDataFrame(
        [("2011-07-07 10:00:00", "2011-07-17 10:00:00", "")],
        "loaded string, processed string, deleted string",
    )

    def check(since, expected):
        got = df.select(
            should_index(
                F.col("loaded"), F.col("processed"), since, F.col("deleted")
            ).alias("x")
        ).collect()[0]["x"]
        assert got is expected, (since, got)

    check("2011-07-10 10:00:00", True)   # processed after since
    check("2011-07-20 10:00:00", False)  # both before since
    check(None, True)                    # full rebuild
    check("2011-08-20 10:00:00", False)
    # deleted rows never index, even on full rebuild
    deleted = spark.createDataFrame(
        [("2011-07-07 10:00:00", "2011-07-17 10:00:00", "2011-01-01")],
        "loaded string, processed string, deleted string",
    )
    got = deleted.select(
        should_index(F.col("loaded"), F.col("processed"), None, F.col("deleted")).alias("x")
    ).collect()[0]["x"]
    assert got is False
    # a missing processed time falls back to the loaded time
    half = spark.createDataFrame(
        [(None, "2011-07-17 10:00:00", "")],
        "loaded string, processed string, deleted string",
    )
    got = half.select(
        should_index(
            F.col("loaded"), F.col("processed"), "2011-07-10 10:00:00", F.col("deleted")
        ).alias("x")
    ).collect()[0]["x"]
    assert got is True


def test_should_index_boolean_deleted_column(spark):
    """A BooleanType deleted flag must behave like the string convention:
    false/null → live, true → excluded (false casts to the string 'false',
    which would count as non-empty/deleted under a naive != '' check)."""
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.index_projection import should_index

    df = spark.createDataFrame(
        [("a", False), ("b", True), ("c", None)],
        "id string, deleted boolean",
    )
    got = {
        r["id"]: r["x"]
        for r in df.select(
            "id",
            should_index(F.lit(None), F.lit(None), None, F.col("deleted")).alias("x"),
        ).collect()
    }
    assert got == {"a": True, "b": False, "c": True}


def test_jackknife_outlierness_scores():
    """JackKnife.scala:83-85: outlierness = accumulated c / threshold per
    sorted sample; flagged extremes score above 1."""
    samples = [float(v) for v in range(1, 26)] + [500.0]
    stats = jackknife(samples)
    assert stats is not None and len(stats.outlierness) == stats.sample_size
    assert stats.outlier_values == (500.0,)
    assert stats.outlierness[-1] > 1.0  # the flagged extreme
    assert all(o < 1.0 for o in stats.outlierness[:-1])


def test_distance_outside_includes_closing_edge():
    """An unclosed WKT ring: the implicit last->first edge must be a
    distance candidate, matching point_in_polygon's closure."""
    from biocache_store_spark.operators.outlier_distribution import (
        distance_outside_m,
        point_in_polygon,
    )

    ring = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]  # unclosed
    # just west of the implicit (0,10)->(0,0) edge
    assert not point_in_polygon(-0.1, 5.0, ring)
    d = distance_outside_m(-0.1, 5.0, ring)
    # ~0.1 degrees of longitude at lat 5 — must be ~11km, not the ~1100km
    # to the east edge that skipping the closing segment would measure
    assert d < 20_000, d


def test_rounded_point_keeps_integer_digits(spark):
    """point_1 on multiples of ten: '-30,150' must not collapse to
    '-3,15' via an over-eager trailing-zero strip."""
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.index_projection import (
        _rounded_point,
        _stepped_point,
    )

    df = spark.createDataFrame(
        [(-30.0, 150.0), (-35.2, 144.8), (0.0, 100.0)], "lat double, lon double"
    )
    out = df.select(
        _rounded_point(F.col("lat"), F.col("lon"), 0).alias("p1"),
        _rounded_point(F.col("lat"), F.col("lon"), 1).alias("p01"),
        _stepped_point(F.col("lat"), F.col("lon"), 0.02).alias("p002"),
    ).collect()
    assert out[0]["p1"] == "-30,150"
    assert out[0]["p01"] == "-30,150"
    assert out[0]["p002"] == "-30,150"
    assert out[1]["p1"] == "-35,145"
    assert out[1]["p01"] == "-35.2,144.8"
    assert out[2]["p1"] == "0,100"


def test_stepped_point_java_math_round_ties(spark):
    """getLatLongStringStep uses java Math.round = floor(x + 0.5): a
    negative coordinate exactly between steps rounds toward +inf
    (Math.round(-0.5) = 0), where Spark's F.round would go away from
    zero. step 0.25 makes the tie exactly representable."""
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.index_projection import (
        _stepped_point,
    )

    df = spark.createDataFrame(
        [(-0.125, 0.125), (-0.375, 0.375)], "lat double, lon double"
    )
    out = df.select(
        _stepped_point(F.col("lat"), F.col("lon"), 0.25).alias("p")
    ).collect()
    # -0.125/0.25 = -0.5 -> Math.round 0 -> 0; 0.125/0.25 = 0.5 -> 1 -> 0.25
    assert out[0]["p"] == "0,0.25"
    # -0.375/0.25 = -1.5 -> Math.round -1 -> -0.25; 0.375 -> 2 -> 0.5
    assert out[1]["p"] == "-0.25,0.5"


def test_point_ladder_catalyst_scalar_parity(spark):
    """functions/points.py holds BOTH ladder engines — the Catalyst
    index-projection rungs and the Python dedup scalar — so this test is
    the drift gate: every rung over a dense tie-heavy grid (HALF_UP ties
    at each precision: 0.35, 0.00005-multiples, banker's-tie magnets
    0.125/2.675) plus -0.0 and non-finite coordinates (the reference's
    NaN guard, IndexDAO.scala:171: both engines must yield NULL, never
    'NaN,NaN')."""
    import math

    from pyspark.sql import functions as F

    from biocache_store_spark.functions.points import (
        point_ladder,
        rounded_point,
    )

    vals = [k * 0.05 for k in range(-3620, 3621, 7)]  # coarse-rung ties
    vals += [k * 0.00005 for k in range(-40000, 40001, 101)]  # 4dp ties
    vals += [
        0.0, -0.0, 0.125, -0.125, 2.675, -2.675, 179.99995, -179.99995,
        float("nan"), float("inf"), float("-inf"),
    ]
    rows = [(v, v if math.isnan(v) else -v) for v in vals]
    df = spark.createDataFrame(rows, "lat double, lon double")
    out = df.select(
        "lat",
        "lon",
        *[
            rounded_point(F.col("lat"), F.col("lon"), d).alias(f"p{d}")
            for d in range(5)
        ],
    ).collect()
    for r in out:
        expect = point_ladder(r["lat"], r["lon"])[:5]
        got = [r[f"p{d}"] for d in range(5)]
        assert got == expect, (r["lat"], r["lon"], got, expect)


def test_lat_long_rounded_nonfinite_is_none():
    """NaN/inf coordinates produce NO rung (reference NaN guard), not a
    printf spelling like 'nan' — ADVICE r10."""
    from biocache_store_spark.functions.points import lat_long_rounded

    for bad in (float("nan"), float("inf"), float("-inf"), "nan", "inf", "-inf"):
        assert lat_long_rounded(bad, 1) is None, bad


def test_snapshot_diff_statuses(spark):
    from biocache_store_spark.operators.maintenance import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C-CHANGED"), (4, "d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_content_is_changed(spark):
    from biocache_store_spark.operators.maintenance import snapshot_diff

    old = spark.createDataFrame([(7, None)], "doc_id long, text string")
    new = spark.createDataFrame([(7, "rewritten")], "doc_id long, text string")
    [row] = snapshot_diff(old, new).collect()
    assert row["status"] == "changed"  # null-safe compare, not 'unchanged'


def test_detect_duplicates_skips_taxonless_and_null_ids(spark):
    """Taxon-less records must not pool into one mega-group of false
    duplicates (the reference iterates actual taxon lsids); null-id
    records are skipped rather than crashing the group sort."""
    from biocache_store_spark.operators.dedup import detect_duplicates

    rows = [
        (None, "o1", "dr1", "1999", "1", "1", "-35.2", "149.1", "Smith", None, None),
        (None, "o2", "dr1", "1999", "1", "1", "-35.2", "149.1", "Smith", None, None),
        ("lsid:1", None, "dr1", "1999", "1", "1", "-35.2", "149.1", "Smith", None, None),
        ("lsid:1", "o3", "dr1", "1999", "1", "1", "-35.2", "149.1", "Smith", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "taxonConceptID string, occurrenceID string, dataResourceUid string, "
        "year string, month string, day string, decimalLatitude string, "
        "decimalLongitude string, recordedBy string, recordNumber string, "
        "catalogNumber string",
    )
    out = {r["row_key"]: r["status"] for r in detect_duplicates(df).collect()}
    assert set(out) == {"o3"}  # taxon-less + null-id rows never examined
    assert out["o3"] == "U"


def test_solr_value_list_default_is_and(spark):
    """field:(a b) without an operator follows the clause-level default
    (AND), matching q.op semantics; explicit OR still ORs."""
    from biocache_store_spark.plans.solr_query import translate

    df = spark.createDataFrame(
        [("x", "a"), ("y", "b")], "k string, f string"
    )
    assert df.filter(translate("f:(a b)")).count() == 0  # AND on single-valued
    assert df.filter(translate("f:(a OR b)")).count() == 2


def test_qid_rowkeys_distinguish_maxage_and_fq_lists(spark, tmp_path):
    from biocache_store_spark.plans.solr_query import Qid, QidStore

    store = QidStore(spark, str(tmp_path / "qids"))
    k1 = store.put(Qid(q="x", max_age=-1)).row_key
    k2 = store.put(Qid(q="x", max_age=3600000)).row_key
    k3 = store.put(Qid(q="x", fqs=("a|b",), max_age=-1)).row_key
    k4 = store.put(Qid(q="x", fqs=("a", "b"), max_age=-1)).row_key
    assert len({k1, k2, k3, k4}) == 4


def test_rollup_incremental_refresh_keeps_boundary_day_hours(spark, tmp_path):
    """An incremental refresh carrying only the newly-closed hours must
    not wipe the boundary day's already-materialized earlier hours."""
    import datetime as dt

    from biocache_store_spark.operators.rollup import rollup_query, write_rollup

    def ev(h, m=0):
        return (dt.datetime(2024, 1, 14, h, m), "click", 1.0)

    all_events = spark.createDataFrame(
        [ev(1), ev(5), ev(7), ev(9)], "ts timestamp_ntz, event_type string, value double"
    )
    path = str(tmp_path / "rollup")
    write_rollup(all_events, path, "2024-01-14 06:00:00")
    # refresh with ONLY the newly-closed window's events (hours 06-09)
    late = all_events.filter("hour(ts) >= 6")
    write_rollup(late, path, "2024-01-14 10:00:00")
    out = rollup_query(
        spark, path, all_events.limit(0), "2024-01-14 10:00:00"
    )
    hours = sorted(r["hour_bucket"].hour for r in out.collect())
    assert hours == [1, 5, 7, 9]  # early hours survived the refresh


def test_scoped_detection_partition_prunes(spark, tmp_path):
    """DEPLOY.md's store-layout promise, pinned: on a taxon-partitioned
    store, the incremental scope must land in the scan's
    PartitionFilters (static isin via scope_to_groups) so only touched
    species' files are read — the left-semi join alone does NOT get
    dynamic partition pruning (unfiltered dim side) and silently scans
    everything."""
    import re

    from biocache_store_spark.operators.dedup import (
        detect_duplicates_scoped,
        scope_to_groups,
    )

    store_dir = str(tmp_path / "occ")
    rows = [
        (f"t{i % 20}", f"o{i}", "2001", "1", "2", "-35.1", "144.2",
         "Smith", "r", "c", "dr")
        for i in range(400)
    ]
    spark.createDataFrame(
        rows,
        "taxonConceptID string, occurrenceID string, year string,"
        " month string, day string, decimalLatitude string,"
        " decimalLongitude string, recordedBy string, recordNumber string,"
        " catalogNumber string, dataResourceUid string",
    ).write.partitionBy("taxonConceptID").parquet(store_dir)
    store = spark.read.parquet(store_dir)
    taxa = spark.createDataFrame([("t3",), ("t7",)], "taxon string")

    scoped = scope_to_groups(store, taxa, "taxonConceptID", group_col="taxon")
    plan = scoped._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "taxonConceptID" in pf and ("t3" in pf or "IN" in pf.upper()), pf
    assert scoped.count() == 40
    # and the end-to-end scoped detection returns exactly those taxa
    out = detect_duplicates_scoped(store, taxa)
    assert {r["taxon"] for r in out.select("taxon").distinct().collect()} == {
        "t3", "t7",
    }
    # a scope larger than the static cap falls back to the semi join
    from pyspark.sql import functions as F

    big = spark.range(20_001).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("taxon")
    )
    fallback = scope_to_groups(
        store, big, "taxonConceptID", group_col="taxon", max_static=20_000
    )
    assert "Join LeftSemi" in fallback._jdf.queryExecution().optimizedPlan().toString()


def test_apply_duplicate_markup_lifecycle(spark):
    """DuplicationDetection's per-record write-back (:588-651) + revert
    (:754-763): R rows get the member list, D rows the representative +
    types + INFERRED_DUPLICATE_RECORD assertion (replaced, never
    duplicated), reverted rows get the columns cleared and the assertion
    REMOVED, everyone else passes through — and the index projection
    serves the columns as duplicate_status / duplicate_record /
    duplicate_type."""
    from biocache_store_spark.operators.dedup import (
        apply_duplicate_markup,
        duplicate_markup,
        obsolete_duplicate_records,
    )
    from biocache_store_spark.operators.index_projection import build_index
    from biocache_store_spark.processors.assertions import AssertionCodes
    from biocache_store_spark.processors.chain import process_records

    dup_rows = [
        ("t1", "2000", "01", "05", "o1", "R", None, [], 4),
        ("t1", "2000", "01", "05", "o2", "D1", "o1", [4, 6], 0),
        ("t1", "2000", "01", "05", "o3", "D2", "o1", [5], 0),
        ("t2", "2000", "01", "05", "o4", "U", None, [], 0),
    ]
    dup_schema = (
        "taxon string, year string, month string, day string,"
        " row_key string, status string, duplicate_of string,"
        " dup_types array<int>, precision int"
    )
    dups = spark.createDataFrame(dup_rows, dup_schema)
    m = {r["row_key"]: r for r in duplicate_markup(dups).collect()}
    assert m["o1"]["duplicationStatus"] == "R"
    assert m["o1"]["associatedOccurrences"] == "o2|o3"
    assert m["o2"]["associatedOccurrences"] == "o1"
    assert m["o2"]["duplicationType"] == "4|6"
    assert "o4" not in m

    raw = spark.createDataFrame(
        [(k, "dr1", "PreservedSpecimen") for k in ("o1", "o2", "o3", "o4", "o9")],
        ["occurrenceID", "dataResourceUid", "basisOfRecord"],
    )
    store = process_records(raw)
    # previous run had o9 marked; now it is not -> revert
    prev = spark.createDataFrame(
        [("t3", "2000", "01", "05", "o9", "D1", "oX", [4], 0)], dup_schema
    )
    reverts = obsolete_duplicate_records(prev, dups)
    assert [r["row_key"] for r in reverts.collect()] == ["o9"]

    out = apply_duplicate_markup(store, dups, reverts, key_col="occurrenceID")
    out = apply_duplicate_markup(out, dups, reverts, key_col="occurrenceID")
    rows = {r["occurrenceID"]: r for r in out.collect()}
    assert rows["o1"]["duplicationStatus_p"] == "R"
    assert rows["o2"]["duplicationStatus_p"] == "D"
    assert rows["o2"]["associatedOccurrences_p"] == "o1"
    assert rows["o9"]["duplicationStatus_p"] is None  # reverted / cleared
    assert rows["o4"]["duplicationStatus_p"] is None  # never marked
    code = AssertionCodes.INFERRED_DUPLICATE_RECORD.code
    dup_asserts = {
        k: [a for a in rows[k]["assertions"] if a["code"] == code]
        for k in rows
    }
    assert len(dup_asserts["o2"]) == 1  # replaced, not duplicated
    assert "closely related to o1" in dup_asserts["o2"][0]["comment"]
    assert dup_asserts["o1"] == [] and dup_asserts["o9"] == []

    idx = {r["occurrence_id"]: r for r in build_index(out).collect()}
    assert idx["o2"]["duplicate_status"] == "D"
    assert idx["o2"]["duplicate_record"] == "o1"
    assert sorted(idx["o2"]["duplicate_type"]) == ["4", "6"]
    assert idx["o1"]["duplicate_status"] == "R"
    assert idx["o9"]["duplicate_status"] is None
