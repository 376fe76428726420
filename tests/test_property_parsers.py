"""Property-based tests (hypothesis) for the parser/predicate kernels.

Each property pins a kernel against an independently-computed expectation
over a generated input space — broader than the example-based suites, and
deterministic (derandomize=True) so the gate never flakes.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from biocache_store_spark.operators.sampling import point_in_polygon
from biocache_store_spark.parsers.latlon import parse as parse_latlon
from biocache_store_spark.parsers.vocab import normalize

SETTINGS = dict(max_examples=200, deadline=None, derandomize=True)


@settings(**SETTINGS)
@given(
    deg=st.integers(0, 89),
    mn=st.integers(0, 59),
    sec=st.integers(0, 59),
    hemi=st.sampled_from(["N", "S", "E", "W"]),
)
def test_latlon_dms_fixed_point(deg, mn, sec, hemi):
    """DMS parse equals the reference's scale-by-1e7 integer-divide
    conversion (parser/VerbatimLatLongParser.scala:78-96) for every
    degree/minute/second combination."""
    got = parse_latlon(f'{deg}° {mn}\' {sec}" {hemi}')
    sign = -1.0 if hemi in ("S", "W") else 1.0
    expected = sign * (
        deg * 10_000_000 + mn * 10_000_000 // 60 + sec * 10_000_000 // 3600
    ) / 10_000_000.0
    assert got == expected


@settings(**SETTINGS)
@given(
    deg=st.integers(0, 89),
    mn=st.integers(0, 59),
    hemi=st.sampled_from(["n", "s", "e", "w"]),
)
def test_latlon_degree_minute_form(deg, mn, hemi):
    got = parse_latlon(f"{deg}° {mn}' {hemi}")
    sign = -1.0 if hemi in ("s", "w") else 1.0
    expected = sign * (deg * 10_000_000 + mn * 10_000_000 // 60) / 10_000_000.0
    assert got == expected


@settings(**SETTINGS)
@given(s=st.text(min_size=0, max_size=40))
def test_vocab_normalize_idempotent(s):
    """normalize is idempotent and emits only [a-z0-9] (Vocab.scala:51-60)."""
    once = normalize(s)
    assert normalize(once) == once
    assert all(c.islower() or c.isdigit() for c in once)


def _convex_hull(pts):
    """Andrew's monotone chain: strictly convex hull, CCW order."""
    pts = sorted(set(pts))

    def half(points):
        out = []
        for p in points:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(reversed(pts))
    return lower[:-1] + upper[:-1]


@st.composite
def convex_polygon(draw):
    """A strictly convex ring (true hull of random points), so the
    half-plane formulation is a valid independent check of the ray-cast."""
    from hypothesis import assume

    pts = draw(
        st.lists(
            st.tuples(
                st.integers(-170, 170), st.integers(-80, 80)
            ),
            min_size=3,
            max_size=8,
            unique=True,
        )
    )
    hull = _convex_hull(pts)
    assume(len(hull) >= 3)
    return [(float(x), float(y)) for x, y in hull]


@settings(**SETTINGS)
@given(
    ring=convex_polygon(),
    px=st.integers(-175, 175),
    py=st.integers(-85, 85),
)
def test_point_in_polygon_matches_halfplane_test(ring, px, py):
    """For convex rings the ray-cast must agree with the sign-consistent
    half-plane test (an independent formulation). Probe points sit at
    half-integer offsets so they never touch an edge."""
    lon, lat = px + 0.5, py + 0.5
    got = point_in_polygon(lon, lat, ring)
    n = len(ring)
    sides = []
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        cross = (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1)
        sides.append(cross)
    inside = all(c >= 0 for c in sides) or all(c <= 0 for c in sides)
    assert got == inside


def test_wkt_predicate_random_hulls_match_kernel(spark):
    """Seeded sweep: the unrolled wkt_predicate Column expression agrees
    with the Python ray-cast kernel over random convex hulls x probe grids
    (extends the single-polygon parity test in test_outliers_validation)."""
    import random

    from biocache_store_spark.plans.solr_query import wkt_predicate

    rng = random.Random(42)
    for _ in range(4):
        pts = {(rng.randint(-170, 170), rng.randint(-80, 80)) for _ in range(10)}
        hull = _convex_hull(list(pts))
        if len(hull) < 3:
            continue
        ring = [(float(x), float(y)) for x, y in hull]
        wkt = (
            "POLYGON(("
            + ", ".join(f"{x} {y}" for x, y in ring + [ring[0]])
            + "))"
        )
        probes = [
            (rng.randint(-175, 175) + 0.5, rng.randint(-85, 85) + 0.5)
            for _ in range(60)
        ]
        df = spark.createDataFrame(probes, ["lon", "lat"])
        got = {
            (r["lon"], r["lat"]): r["inside"]
            for r in df.withColumn(
                "inside", wkt_predicate(wkt, lat_col="lat", lon_col="lon")
            ).collect()
        }
        for lon, lat in probes:
            assert got[(lon, lat)] == point_in_polygon(lon, lat, ring), (
                wkt, lon, lat,
            )


def test_solr_translate_random_queries_match_row_evaluator(spark):
    """Seeded sweep over the SOLR-q grammar: random ASTs rendered to q
    strings, translated to Column predicates, and checked row-by-row
    against an independent Python evaluator of the same AST. Covers
    equality, quoted phrases, inclusive/exclusive/open ranges, wildcards,
    AND/OR/NOT nesting, and field:(a OR b) value lists."""
    import random
    import re as _re

    from biocache_store_spark.plans.solr_query import translate

    rng = random.Random(7)
    states = ["Victoria", "Tasmania", "New Wales", "Qld", None]
    rows = [
        (i, rng.choice(states), rng.randint(1990, 2010),
         f"dr{rng.randint(1, 30)}")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["id", "state", "year", "dr"])

    def leaf():
        kind = rng.choice(["eq", "phrase", "range", "wild", "list"])
        if kind == "eq":
            return ("eq", "dr", f"dr{rng.randint(1, 30)}")
        if kind == "phrase":
            return ("phrase", "state", rng.choice(states[:4]))
        if kind == "range":
            lo = rng.choice(["*", str(rng.randint(1990, 2010))])
            hi = rng.choice(["*", str(rng.randint(1990, 2010))])
            return ("range", "year", lo, hi, rng.choice([True, False]))
        if kind == "wild":
            return ("wild", "dr", f"dr{rng.randint(1, 2)}*")
        vals = [f"dr{rng.randint(1, 30)}" for _ in range(2)]
        return ("list", "dr", vals)

    def node(depth):
        if depth == 0 or rng.random() < 0.4:
            t = leaf()
            return ("not", t) if rng.random() < 0.2 else t
        op = rng.choice(["and", "or"])
        return (op, node(depth - 1), node(depth - 1))

    def render(n):
        k = n[0]
        if k == "eq":
            return f"{n[1]}:{n[2]}"
        if k == "phrase":
            return f'{n[1]}:"{n[2]}"'
        if k == "range":
            br = ("[", "]") if n[4] else ("{", "}")
            return f"{n[1]}:{br[0]}{n[2]} TO {n[3]}{br[1]}"
        if k == "wild":
            return f"{n[1]}:{n[2]}"
        if k == "list":
            return f"{n[1]}:({' OR '.join(n[2])})"
        if k == "not":
            return f"NOT ({render(n[1])})"
        return f"({render(n[1])} {k.upper()} {render(n[2])})"

    def ev(n, row):
        k = n[0]
        if k == "eq":
            return row[n[1]] == n[2]
        if k == "phrase":
            return row[n[1]] == n[2]
        if k == "range":
            v = row[n[1]]
            if v is None:
                return False
            lo, hi, inc = n[2], n[3], n[4]
            ok = True
            # string compare like Spark does on a string column? year is
            # int column -> numeric compare both sides
            if lo != "*":
                ok = ok and (v >= int(lo) if inc else v > int(lo))
            if hi != "*":
                ok = ok and (v <= int(hi) if inc else v < int(hi))
            return ok
        if k == "wild":
            v = row[n[1]]
            if v is None:
                return False
            pat = "^" + _re.escape(n[2]).replace(r"\*", ".*") + "$"
            return _re.match(pat, v) is not None
        if k == "list":
            return row[n[1]] in n[2]
        if k == "not":
            inner = ev(n[1], row)
            return (not inner) if inner is not None else None
        a, b = ev(n[1], row), ev(n[2], row)
        # three-valued logic like SQL: None = unknown
        if k == "and":
            if a is False or b is False:
                return False
            if a is None or b is None:
                return None
            return True
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False

    def ev3(n, row):
        """eq/phrase/list on a NULL column is unknown, not False."""
        k = n[0]
        if k in ("eq", "phrase"):
            return None if row[n[1]] is None else row[n[1]] == n[2]
        if k == "list":
            return None if row[n[1]] is None else row[n[1]] in n[2]
        if k == "wild":
            return None if row[n[1]] is None else ev(n, row)
        if k == "range":
            return None if row[n[1]] is None else ev(n, row)
        if k == "not":
            # SOLR negation matches documents MISSING the field — the
            # translator coalesces NOT(NULL) to True (solr_query._negated)
            inner = ev3(n[1], row)
            return True if inner is None else not inner
        a, b = ev3(n[1], row), ev3(n[2], row)
        if k == "and":
            if a is False or b is False:
                return False
            if a is None or b is None:
                return None
            return True
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False

    row_dicts = [dict(zip(["id", "state", "year", "dr"], r)) for r in rows]
    for _ in range(25):
        ast = node(2)
        q = render(ast)
        got = {r["id"] for r in df.filter(translate(q)).collect()}
        want = {r["id"] for r in row_dicts if ev3(ast, r) is True}
        assert got == want, q


@settings(**SETTINGS)
@given(
    y=st.integers(1700, 2020),
    m=st.integers(1, 12),
    d=st.integers(1, 28),
    fmt=st.sampled_from(
        ["{y:04d}-{m:02d}-{d:02d}", "{d:02d}-{m:02d}-{y:04d}",
         "{d:02d}/{m:02d}/{y:04d}", "{d} {mon} {y:04d}",
         "{y:04d}-{m:02d}-{d:02d}T10:22:00"]
    ),
)
def test_date_parser_format_round_trip(y, m, d, fmt):
    """Any valid calendar date rendered in the supported format families
    parses back to the same ISO components (parsers/dates.py — the
    DateParser format cascade)."""
    import calendar

    from biocache_store_spark.parsers.dates import parse_date

    mon = calendar.month_name[m][:3]
    s = fmt.format(y=y, m=m, d=d, mon=mon)
    r = parse_date(s)
    assert r is not None, s
    assert (r.start_year, r.start_month, r.start_day) == (
        f"{y:04d}", f"{m:02d}", f"{d:02d}"
    ), s
    assert r.start_date == f"{y:04d}-{m:02d}-{d:02d}"


@settings(**SETTINGS)
@given(
    y1=st.integers(1800, 2000),
    y2=st.integers(1800, 2000),
)
def test_date_parser_year_range(y1, y2):
    """Year ranges split on the reference's separators ('/'; '-' is never
    a range separator, ParseUtil.splitRange DateParser.scala:1088) and
    parse to (start, end) years when ascending."""
    from hypothesis import assume

    from biocache_store_spark.parsers.dates import parse_date

    assume(y1 < y2)
    r = parse_date(f"{y1}/{y2}")
    assert r is not None
    assert r.start_year == str(y1) and r.end_year == str(y2)
    assert parse_date(f"{y1}-{y2}") is None or y2 <= 12  # '-' is not a range


@settings(max_examples=500, deadline=None)
@given(
    s=st.one_of(
        st.text(min_size=0, max_size=60),
        # parser-shaped garbage reaches deeper branches than uniform
        # unicode: near-coordinates, near-dates, near-grid-refs
        st.text(
            alphabet="0123456789.,-/:&deg'\"NSEWnsew mM kKft() Tto",
            min_size=1,
            max_size=40,
        ),
        st.text(alphabet="NHSTOIJ0123456789ABCDEFGHKLMNPQRSTUVWXYZ", max_size=14),
    )
)
def test_parsers_never_raise_on_arbitrary_text(s):
    """Crash-resistance contract: every public scalar parser consumes
    ARBITRARY text (dirty archive fields) and returns a value or None —
    it must never raise. A parser that throws inside the Arrow batch
    kills the whole task at ingest scale."""
    from biocache_store_spark.operators.dedup import (
        determine_precision,
        point_ladder,
    )
    from biocache_store_spark.parsers import collector, distance, latlon
    from biocache_store_spark.parsers.dates import (
        parse_date,
        parse_string_to_datetime,
    )
    from biocache_store_spark.parsers.gridref import (
        grid_ref_as_resolutions,
        grid_reference_to_easting_northing,
        process_grid_reference,
    )
    from biocache_store_spark.parsers.license import match_license
    from biocache_store_spark.parsers.stemmer import stem
    from biocache_store_spark.parsers.vocab import normalize

    parse_date(s)
    parse_string_to_datetime(s)
    latlon.parse(s)
    latlon.parse_with_direction(s)
    distance.parse(s)
    distance.parse_metres(s)
    collector.parse(s)
    collector.parse_for_list(s)
    grid_reference_to_easting_northing(s)
    process_grid_reference(s)
    grid_ref_as_resolutions(s)
    match_license(s)
    normalize(s)
    stem(s)
    determine_precision(s)
    point_ladder(s, s)
