"""The multi-precision coordinate point ladder — ONE module, both engines.

The reference rounds coordinates in IndexDAO.getLatLongString /
getLatLongStringStep (IndexDAO.scala:170-196): java DecimalFormat with an
explicit RoundingMode.HALF_UP (overriding the HALF_EVEN default, with a
comment mocking it) applied to the double's SHORTEST decimal
representation (DecimalFormat formats Double.toString's digits, not the
exact binary expansion — so 0.35, whose exact double value is 0.34999...,
still rounds UP to 0.4), trailing fraction zeros stripped, and a NaN
guard (IndexDAO.scala:171: NaN coordinates produce no point at all).

Two execution engines need those semantics bit-for-bit:

  * the Catalyst index projection — `rounded_point` / `stepped_point`
    below, whole-stage-codegen expressions whose F.round goes through
    BigDecimal.valueOf(double) (= Double.toString) with HALF_UP, matching
    the reference by construction;
  * the Python dedup kernels — `lat_long_rounded` / `point_ladder` /
    `point_ladder_np` below, Decimal(repr(v)).quantize(HALF_UP): repr is
    the same shortest round-trip decimal as Double.toString.

Round 10 fixed the HALF_UP-on-shortest-repr divergence in BOTH copies
separately; they live together here so the next rounding fix cannot
drift them apart. tests/test_operators_offline.py pins Catalyst ==
scalar over a dense tie-heavy coordinate grid (non-finite values
included), and the NumPy batch form against the scalar.
"""

from __future__ import annotations

import decimal as _decimal
import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: enough precision for any double's shortest repr quantized to 4 dp
#: (17 significant digits + e±308 exponent never exceeds ~330 digits)
_DEC_CTX = _decimal.Context(prec=400)
_DEC_Q = [_decimal.Decimal(1).scaleb(-d) for d in range(8)]


def lat_long_rounded(value: str | float | None, decimals: int) -> str | None:
    """One rung of the point ladder — IndexDAO.getLatLongString semantics
    EXACTLY (IndexDAO.scala:170-185): shortest-repr HALF_UP (see module
    docstring), trailing zeros dropped. Non-finite inputs return None —
    the reference's NaN guard (IndexDAO.scala:171) never formats them.
    Rounds <= 7 decimals (the ladder uses 0-4)."""
    if value is None or value == "":
        return None
    try:
        v = float(value)
    except (TypeError, ValueError):
        return None
    if not math.isfinite(v):
        return None
    q = _DEC_Q[decimals] if decimals < len(_DEC_Q) else (
        _decimal.Decimal(1).scaleb(-decimals)
    )
    s = str(
        _decimal.Decimal(repr(v)).quantize(
            q, rounding=_decimal.ROUND_HALF_UP, context=_DEC_CTX
        )
    )
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s


def point_ladder(lat, lon) -> list[str | None]:
    """point1, point0_1, point0_01, point0_001, point0_0001, latLong."""
    out = []
    for d in (0, 1, 2, 3, 4):
        la = lat_long_rounded(lat, d)
        lo = lat_long_rounded(lon, d)
        out.append(f"{la},{lo}" if la is not None and lo is not None else None)
    out.append(f"{lat},{lon}" if lat not in (None, "") and lon not in (None, "") else None)
    return out


def point_ladder_np(lat_s, lon_s):
    """(N, 6) object ladder matrix — point_ladder batched with a
    per-unique-SIDE memo: the rounded rungs go through the SAME
    lat_long_rounded as the scalar kernel (parity by construction — two
    earlier vectorizations each hid a 1-ulp divergence: pd.to_numeric's
    fast parser, and printf's exact-value HALF_EVEN vs the reference's
    shortest-repr HALF_UP), evaluated once per distinct coordinate
    STRING. The caller already deduplicates (lat, lon) pairs, so this
    pays the Decimal quantize on side-uniques only."""
    import numpy as np

    n = len(lat_s)
    out = np.empty((n, 6), dtype=object)
    if not n:
        return out

    memo: dict = {}

    def side(s):
        hit = memo.get(s)
        if hit is None:
            hit = tuple(lat_long_rounded(s, d) for d in range(5))
            memo[s] = hit
        return hit

    for i in range(n):
        la = lat_s[i]
        lo = lon_s[i]
        ra = side(la)
        rb = side(lo)
        for d in range(5):
            a, b = ra[d], rb[d]
            out[i, d] = f"{a},{b}" if a is not None and b is not None else None
        out[i, 5] = (
            f"{la},{lo}"
            if la not in (None, "") and lo not in (None, "")
            else None
        )
    return out


def _finite(c: Column) -> Column:
    """The reference's NaN guard (IndexDAO.scala:171) widened to all
    non-finite doubles, matching lat_long_rounded's None: NaN and ±inf
    coordinates produce NULL rungs, never 'NaN,NaN' / '∞' strings."""
    return ~F.isnan(c) & (F.abs(c) != float("inf"))


def strip_fraction_zeros(s: Column) -> Column:
    """DecimalFormat('#.##')-style trimming: drop trailing zeros of the
    FRACTIONAL part only, then a bare trailing dot. A dot-anchored
    pattern — a bare `0+$` strip would eat real integer digits
    ('-30' -> '-3', '150' -> '15') exactly on round coordinates."""
    s = F.regexp_replace(s, r"(\.\d*?)0+$", r"$1")
    return F.regexp_replace(s, r"\.$", "")


def rounded_point(lat: Column, lon: Column, decimals: int) -> Column:
    """One rung of the point ladder as 'lat,lon' with trailing zeros
    stripped (IndexDAO.getLatLongStringStep semantics, IndexDAO.scala:170-210)."""

    def fmt(c: Column) -> Column:
        r = F.round(c, decimals)
        s = F.format_number(r, decimals)
        s = F.regexp_replace(s, ",", "")  # format_number groups thousands
        s = strip_fraction_zeros(s)
        # java DecimalFormat keeps the OPERAND's sign on a zero result
        # ('-0.4' -> '-0' at 0 dp, '-0.0' -> '-0'); BigDecimal-backed
        # F.round cannot represent -0, so re-attach the sign from the
        # input (the string cast renders -0.0 as '-0.0', catching the
        # negative zero that `c < 0` misses; a 1/c sign probe would trip
        # ANSI division-by-zero). The scalar lat_long_rounded gets this
        # for free from Decimal('-0.0').
        neg = F.when(c != 0, c < 0).otherwise(
            c.cast("string").startswith("-")
        )
        return F.when((r == 0) & neg, F.concat(F.lit("-"), s)).otherwise(s)

    return F.when(
        lat.isNotNull() & lon.isNotNull() & _finite(lat) & _finite(lon),
        F.concat(fmt(lat), F.lit(","), fmt(lon)),
    )


def stepped_point(lat: Column, lon: Column, step: float) -> Column:
    """getLatLongStringStep (IndexDAO.scala:181-196): round to the nearest
    step (e.g. 0.02), formatted with trailing zeros stripped."""

    def fmt(c: Column) -> Column:
        # java Math.round(d) = floor(d + 0.5) — toward +inf on ties, NOT
        # Spark round's away-from-zero: Math.round(-2.5) is -2 while
        # F.round gives -3, so southern-hemisphere coordinates landing
        # exactly between steps must use the floor form (IndexDAO:192)
        stepped = F.floor(c / step + F.lit(0.5)) * step
        s = F.format_number(F.round(stepped, 2), 2)
        s = F.regexp_replace(s, ",", "")
        s = strip_fraction_zeros(s)
        return s

    return F.when(
        lat.isNotNull() & lon.isNotNull() & _finite(lat) & _finite(lon),
        F.concat(fmt(lat), F.lit(","), fmt(lon)),
    )
