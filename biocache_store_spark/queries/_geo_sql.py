"""SQL text generators replaying the datum/projection math in DuckDB.

The repo's geodesy (parsers/gridref.py `_inverse_tm` / `_helmert_core`,
parsers/utm.py — util/GISUtil.scala:27-60, util/GridUtil.scala:573-620) is
plain double arithmetic, so the DuckDB oracles can evaluate the SAME
formulas over the same literals: the fixed 8-iteration Helmert latitude
solve and the meridional-arc iteration unroll into chained CTEs
(`SELECT * REPLACE` stages). Both sides round their outputs, and
tests/test_geo_oracle_margin.py proves every value in the (finite,
key-modulus-bounded) input space sits far from a rounding boundary, so
libm-vs-DuckDB ulp drift cannot flip a rounded digit.
"""

from __future__ import annotations

from biocache_store_spark.parsers.gridref import (
    _GEOGRAPHIC_DATUMS,
    _WGS84_A,
    _WGS84_B,
)

def _dl(x: float) -> str:
    """Emit a float literal as an explicit DOUBLE so DuckDB uses IEEE double
    arithmetic (bare decimal literals parse as DECIMAL and diverge from
    Spark's double evaluation)."""
    return f"CAST({x!r} AS DOUBLE)"

# ---------------------------------------------------------------------------
# Helmert: (hlat, hlon radians on source ellipsoid sa/sb; params tx..sppm)
# -> latw (radians), x2/y2 for the longitude atan2. NULL params (identity
# datums) propagate to NULL latw; callers CASE back to the input.
# ---------------------------------------------------------------------------


def helmert_ctes(prev: str, n_iter: int = 8) -> tuple[str, str]:
    """Returns (cte_sql, final_cte_name). `prev` must expose columns
    hlat, hlon, sa, sb, tx, ty, tz, rxs, rys, rzs, sppm."""
    a2, b2 = _dl(_WGS84_A), _dl(_WGS84_B)
    ctes = [
        f"""h_cart AS (
            SELECT *,
                   (sa*sa - sb*sb)/(sa*sa) AS h_e2,
                   sin(hlat) AS h_sinlat, cos(hlat) AS h_coslat,
                   radians(rxs/3600) AS h_rx, radians(rys/3600) AS h_ry,
                   radians(rzs/3600) AS h_rz, sppm*1e-6 AS h_s
            FROM {prev}
        )""",
        """h_nu AS (
            SELECT *, sa / sqrt(1 - h_e2*h_sinlat*h_sinlat) AS h_nuv
            FROM h_cart
        )""",
        """h_xyz AS (
            SELECT *,
                   h_nuv*h_coslat*cos(hlon) AS h_x,
                   h_nuv*h_coslat*sin(hlon) AS h_y,
                   h_nuv*(1 - h_e2)*h_sinlat AS h_z
            FROM h_nu
        )""",
        """h_xyz2 AS (
            SELECT *,
                   tx + (1 + h_s)*h_x - h_rz*h_y + h_ry*h_z AS x2,
                   ty + h_rz*h_x + (1 + h_s)*h_y - h_rx*h_z AS y2,
                   tz - h_ry*h_x + h_rx*h_y + (1 + h_s)*h_z AS z2
            FROM h_xyz
        )""",
        f"""h_w AS (
            SELECT *,
                   ({a2}*{a2} - {b2}*{b2})/({a2}*{a2}) AS e2w,
                   sqrt(x2*x2 + y2*y2) AS h_p
            FROM h_xyz2
        )""",
        "h_it0 AS (SELECT *, atan2(z2, h_p*(1 - e2w)) AS latw FROM h_w)",
    ]
    prev_it = "h_it0"
    for i in range(1, n_iter + 1):
        name = f"h_it{i}"
        ctes.append(
            f"""{name} AS (
            SELECT * REPLACE (
              atan2(z2 + e2w*({a2}/sqrt(1 - e2w*sin(latw)*sin(latw)))*sin(latw), h_p)
              AS latw)
            FROM {prev_it}
        )"""
        )
        prev_it = name
    return ",\n".join(ctes), prev_it


def _datum_const_cases(
    epsg_col: str, datums: list[str], include_ellipsoid: bool = True
) -> str:
    """CASE columns sa/sb/tx..sppm for the given EPSG datum codes; identity
    datums (params None) yield NULL transform params."""
    rows = {d: _GEOGRAPHIC_DATUMS[d] for d in datums}

    def case(idx_fn):
        whens = " ".join(
            f"WHEN '{d}' THEN {_dl(idx_fn(v))}"
            for d, v in rows.items()
            if idx_fn(v) is not None
        )
        return f"CASE {epsg_col} {whens} END"

    parts = []
    if include_ellipsoid:
        parts.append(case(lambda v: v[0]) + " AS sa")
        parts.append(case(lambda v: v[1]) + " AS sb")
    for i, name in enumerate(("tx", "ty", "tz", "rxs", "rys", "rzs", "sppm")):
        parts.append(
            case(lambda v, i=i: v[2][i] if v[2] is not None else None)
            + f" AS {name}"
        )
    return ",\n                   ".join(parts)


DATUM_QUERY_DATUMS = ["EPSG:4202", "EPSG:4277", "EPSG:4267", "EPSG:4283"]
DATUM_IDENTITY = ["EPSG:4283"]


def datum_reprojection_oracle_sql() -> str:
    """Oracle for the datum_reprojection query: customer-synthesized
    lat/lon/datum inputs through the full Helmert shift (or identity for
    GRS80-based codes), rounded to 6dp like
    parsers/gridref.reproject_geographic_to_wgs84."""
    consts = _datum_const_cases("epsg", DATUM_QUERY_DATUMS)
    helmert, last = helmert_ctes("d_rad")
    idlist = ", ".join(f"'{d}'" for d in DATUM_IDENTITY)
    datum_array = ",".join(f"'{d}'" for d in DATUM_QUERY_DATUMS)
    return f"""
        WITH d_src AS (
            SELECT c_custkey AS k,
                   CAST(c_custkey % 50 AS DOUBLE) * CAST(1.37 AS DOUBLE)
                     - CAST(40.123 AS DOUBLE) AS lat,
                   CAST(c_custkey % 40 AS DOUBLE) * CAST(3.1 AS DOUBLE)
                     + CAST(100.456 AS DOUBLE) AS lon,
                   [{datum_array}][(c_custkey % 4) + 1] AS epsg
            FROM customer
        ),
        d_const AS (
            SELECT *,
                   {consts}
            FROM d_src
        ),
        d_rad AS (
            SELECT *, radians(lat) AS hlat, radians(lon) AS hlon FROM d_const
        ),
        {helmert}
        SELECT k, epsg,
               CASE WHEN epsg IN ({idlist}) THEN round(lat, 6)
                    ELSE round(degrees(latw), 6) END AS lat_wgs84,
               CASE WHEN epsg IN ({idlist}) THEN round(lon, 6)
                    ELSE round(degrees(atan2(y2, x2)), 6) END AS lon_wgs84
        FROM {last}
    """


# ---------------------------------------------------------------------------
# UTM / MGA / AMG inverse transverse Mercator
# ---------------------------------------------------------------------------

_UTM_DATUMS = {
    # datum -> (a, b, geographic EPSG for the Helmert leg or None)
    "AGD66": (6378160.0, 6356774.719, "EPSG:4202"),
    "AGD84": (6378160.0, 6356774.719, "EPSG:4203"),
    "GDA94": (6378137.0, 6356752.314140, None),
    "WGS84": (6378137.0, 6356752.3142, None),
}


def _tm_iteration_ctes(prev: str, n_iter: int = 10) -> tuple[str, str]:
    """Meridional-arc iteration (parsers/gridref._inverse_tm loop) unrolled:
    columns required on `prev`: northing, n0v, sa, sb, f0 (0.9996), lat0
    (=0 radians for UTM). Emits tm_lat / tm_m columns."""
    m_expr = (
        "sb*f0*((1 + nn + CAST(1.25 AS DOUBLE)*nn*nn + CAST(1.25 AS DOUBLE)*nn*nn*nn)*(tm_lat - lat0)"
        " - (3*nn + 3*nn*nn + CAST(21.0/8 AS DOUBLE)*nn*nn*nn)*sin(tm_lat - lat0)*cos(tm_lat + lat0)"
        " + (CAST(15.0/8 AS DOUBLE)*nn*nn + CAST(15.0/8 AS DOUBLE)*nn*nn*nn)*sin(2*(tm_lat - lat0))*cos(2*(tm_lat + lat0))"
        " - CAST(35.0/24 AS DOUBLE)*nn*nn*nn*sin(3*(tm_lat - lat0))*cos(3*(tm_lat + lat0)))"
    )
    ctes = [
        f"""t_base AS (
            SELECT *, (sa - sb)/(sa + sb) AS nn, lat0 AS tm_lat,
                   CAST(0.0 AS DOUBLE) AS tm_m
            FROM {prev}
        )"""
    ]
    prev_it = "t_base"
    for i in range(n_iter):
        lname, mname = f"t_l{i}", f"t_m{i}"
        ctes.append(
            f"""{lname} AS (
            SELECT * REPLACE ((northing - n0v - tm_m)/(sa*f0) + tm_lat AS tm_lat)
            FROM {prev_it}
        )"""
        )
        ctes.append(
            f"""{mname} AS (
            SELECT * REPLACE ({m_expr} AS tm_m) FROM {lname}
        )"""
        )
        prev_it = mname
    return ",\n".join(ctes), prev_it


def utm_inverse_oracle_sql() -> str:
    """Oracle for the utm_inverse query: easting/northing/zone/srs through
    the inverse TM series + (for AGD66/84) the Helmert leg, rounded to 5dp
    like parsers/utm.easting_northing_zone_to_wgs84. Invalid datum|zone
    keys yield NULL coordinates and a NULL EPSG code
    (GridUtil.scala:577-586)."""
    tm, tm_last = _tm_iteration_ctes("u_const")
    helmert, h_last = helmert_ctes("u_hin")

    def dc(name, idx):
        whens = " ".join(
            f"WHEN '{d}' THEN {_dl(v[idx])}" for d, v in _UTM_DATUMS.items()
        )
        return f"CASE datum {whens} END AS {name}"

    # Helmert params for the AGD datums via their geographic EPSG codes; the
    # geographic ellipsoid (ANS) equals the projection ellipsoid sa/sb the
    # flow already carries, so only the 7 transform params are CASEd here.
    agd_consts = _datum_const_cases(
        "gepsg", ["EPSG:4202", "EPSG:4203"], include_ellipsoid=False
    )
    return f"""
        WITH u_src AS (
            SELECT c_custkey AS k,
                   CAST(300000.0 AS DOUBLE)
                     + CAST(c_custkey % 60 AS DOUBLE) * 6000 AS easting,
                   CAST(6000000.0 AS DOUBLE)
                     + CAST(c_custkey % 40 AS DOUBLE) * 50000 AS northing,
                   ['GDA94','AGD66','AGD84','WGS84','GDA94'][(c_custkey % 5) + 1]
                     AS datum,
                   ['50','51','52','55N','99'][(c_custkey % 5) + 1] AS zone,
                   (c_custkey % 5) AS cls
            FROM customer
        ),
        u_epsg AS (
            SELECT *,
                   CASE cls WHEN 0 THEN 'EPSG:28350' WHEN 1 THEN 'EPSG:20251'
                            WHEN 2 THEN 'EPSG:20352' WHEN 3 THEN 'EPSG:32655'
                   END AS epsg_code,
                   CASE cls WHEN 0 THEN 50 WHEN 1 THEN 51 WHEN 2 THEN 52
                            WHEN 3 THEN 55 END AS zone_num,
                   CASE WHEN cls = 3 THEN CAST(0.0 AS DOUBLE)
                        ELSE CAST(10000000.0 AS DOUBLE) END AS n0v
            FROM u_src
        ),
        u_const AS (
            SELECT *,
                   {dc("sa", 0)},
                   {dc("sb", 1)},
                   CAST(0.9996 AS DOUBLE) AS f0,
                   CAST(0.0 AS DOUBLE) AS lat0,
                   radians(CAST(zone_num * 6 - 183 AS DOUBLE)) AS lon0,
                   CAST(500000.0 AS DOUBLE) AS e0v
            FROM u_epsg
        ),
        {tm},
        u_series AS (
            SELECT *,
                   (sa*sa - sb*sb)/(sa*sa) AS s_e2,
                   sin(tm_lat) AS s_sin, cos(tm_lat) AS s_cos, tan(tm_lat) AS s_tan
            FROM {tm_last}
        ),
        u_nu AS (
            SELECT *,
                   sa*f0 / sqrt(1 - s_e2*s_sin*s_sin) AS s_nu,
                   sa*f0*(1 - s_e2) / pow(1 - s_e2*s_sin*s_sin, 1.5) AS s_rho
            FROM u_series
        ),
        u_terms AS (
            SELECT *,
                   s_nu/s_rho - 1 AS s_eta2,
                   easting - e0v AS de
            FROM u_nu
        ),
        u_out AS (
            SELECT *,
                   tm_lat
                     - (s_tan/(2*s_rho*s_nu))*de*de
                     + (s_tan/(24*s_rho*s_nu*s_nu*s_nu)
                        *(5 + 3*s_tan*s_tan + s_eta2 - 9*s_tan*s_tan*s_eta2))
                       *de*de*de*de
                     - (s_tan/(720*s_rho*pow(s_nu,5))
                        *(61 + 90*s_tan*s_tan + 45*pow(s_tan,4)))
                       *pow(de,6) AS tmlat_out,
                   lon0
                     + (1/(s_cos*s_nu))*de
                     - (1/(s_cos*6*s_nu*s_nu*s_nu)*(s_nu/s_rho + 2*s_tan*s_tan))
                       *de*de*de
                     + (1/(s_cos*120*pow(s_nu,5))
                        *(5 + 28*s_tan*s_tan + 24*pow(s_tan,4)))
                       *pow(de,5)
                     - (1/(s_cos*5040*pow(s_nu,7))
                        *(61 + 662*s_tan*s_tan + 1320*pow(s_tan,4)
                          + 720*pow(s_tan,6)))
                       *pow(de,7) AS tmlon_out
            FROM u_terms
        ),
        u_gepsg AS (
            SELECT *,
                   CASE datum WHEN 'AGD66' THEN 'EPSG:4202'
                              WHEN 'AGD84' THEN 'EPSG:4203' END AS gepsg
            FROM u_out
        ),
        u_hin AS (
            SELECT *,
                   tmlat_out AS hlat, tmlon_out AS hlon,
                   {agd_consts}
            FROM u_gepsg
        ),
        {helmert},
        u_final AS (
            SELECT *,
                   CASE WHEN gepsg IS NULL THEN degrees(tmlat_out)
                        ELSE degrees(latw) END AS lat_out,
                   CASE WHEN gepsg IS NULL THEN degrees(tmlon_out)
                        ELSE degrees(atan2(y2, x2)) END AS lon_out
            FROM {h_last}
        )
        SELECT k, epsg_code,
               CASE WHEN cls = 4 THEN NULL ELSE round(lat_out, 5) END AS lat_wgs84,
               CASE WHEN cls = 4 THEN NULL ELSE round(lon_out, 5) END AS lon_wgs84
        FROM u_final
    """
