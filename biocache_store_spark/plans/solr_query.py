"""SOLR-query-string -> Spark Column translator.

The reference's only general predicate language is the SOLR q/fq string
(index/SolrIndexDAO.scala:299-392); stored queries (model/Qid.scala:8-27)
and validation rules (qa/ValidationRuleRunner.scala:151-260) persist such
strings and replay them. This module gives those strings a Spark meaning: a
small recursive-descent parser producing a Column predicate, so
`df.filter(translate(q))` replays any stored query against the index table.

Supported grammar (the subset the reference actually stores):
    clause   := term (("AND"|"OR") term)* ; bare juxtaposition = AND
    term     := ["-"|"NOT "] field ":" value | "(" clause ")" | "*:*"
    value    := bare | "quoted phrase" | [a TO b] | {a TO b} | wildcard*

Field names are translated through an optional mapping (SOLR field ->
DataFrame column, from the headerAttributes table IndexDAO.scala:212-403).
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


class SolrQueryError(ValueError):
    pass


_TOKEN = re.compile(
    r"""\s*(
        \(|\)
        |"(?:[^"\\]|\\.)*"          # quoted phrase
        |\[[^\]]*\]|\{[^}]*\}       # range
        |AND\b|OR\b|NOT\b
        |-
        |[^\s():]+                   # bare word / field
        |:
    )""",
    re.VERBOSE,
)


def _tokenize(q: str) -> list[str]:
    tokens = []
    pos = 0
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if not m:
            raise SolrQueryError(f"Cannot tokenize query at: {q[pos:]!r}")
        tokens.append(m.group(1))
        pos = m.end()
        if q[pos:].strip() == "":
            break
    return tokens


def _parse_value(col: Column, value: str) -> Column:
    if value.startswith('"') and value.endswith('"'):
        return col == value[1:-1].replace('\\"', '"')
    if (value.startswith("[") and value.endswith("]")) or (
        value.startswith("{") and value.endswith("}")
    ):
        inclusive = value.startswith("[")
        inner = value[1:-1]
        parts = re.split(r"\s+TO\s+", inner.strip(), flags=re.IGNORECASE)
        if len(parts) != 2:
            raise SolrQueryError(f"Bad range: {value}")
        lo, hi = (p.strip() for p in parts)
        conds = []
        if lo != "*":
            conds.append(col >= lo if inclusive else col > lo)
        if hi != "*":
            conds.append(col <= hi if inclusive else col < hi)
        if not conds:
            return col.isNotNull()
        result = conds[0]
        for c in conds[1:]:
            result = result & c
        return result
    if value == "*":
        return col.isNotNull()
    if "*" in value or "?" in value:
        pattern = re.escape(value).replace(r"\*", ".*").replace(r"\?", ".")
        return col.rlike(f"^{pattern}$")
    return col == value


class _Parser:
    def __init__(self, tokens: list[str], field_mapping: dict[str, str] | None):
        self.tokens = tokens
        self.pos = 0
        self.mapping = field_mapping or {}

    def peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self):
        tok = self.peek()
        self.pos += 1
        return tok

    def parse_clause(self) -> Column:
        result = self.parse_term()
        while True:
            tok = self.peek()
            if tok is None or tok == ")":
                return result
            if tok in ("AND", "OR"):
                self.next()
                rhs = self.parse_term()
                result = (result & rhs) if tok == "AND" else (result | rhs)
            else:
                # bare juxtaposition = AND (SOLR default op used by the ref)
                rhs = self.parse_term()
                result = result & rhs

    @staticmethod
    def _negated(result: Column) -> Column:
        """SOLR negation matches documents MISSING the field; Spark's
        three-valued ~(col == v) is NULL for null fields and filter()
        would drop them — coalesce restores the SOLR semantics."""
        return F.coalesce(~result, F.lit(True))

    def _read_value(self) -> str:
        """One unquoted value, reassembling pieces the tokenizer split:
        a leading '-' (negative numbers) and embedded ':' runs (taxon
        LSIDs like urn:lsid:...:taxon:1234, the dominant fq shape)."""
        value = self.next()
        if value is None or value in (")", ":"):
            raise SolrQueryError("Missing value")
        if value == "-":
            nxt = self.next()
            if nxt is None:
                raise SolrQueryError("Dangling '-' in value position")
            value = "-" + nxt
        while self.peek() == ":":
            self.next()
            nxt = self.next()
            if nxt is None:
                raise SolrQueryError("Dangling ':' in value position")
            value = f"{value}:{nxt}"
        return value

    def parse_term(self) -> Column:
        tok = self.next()
        if tok is None:
            raise SolrQueryError("Unexpected end of query")
        negate = False
        if tok in ("-", "NOT"):
            negate = True
            tok = self.next()
        if tok == "(":
            inner = self.parse_clause()
            if self.next() != ")":
                raise SolrQueryError("Unbalanced parentheses")
            return self._negated(inner) if negate else inner
        field = tok
        if self.peek() == ":":
            self.next()
            if self.peek() == "(":
                # field:(a OR b) — distribute field over inner values
                self.next()
                values = []
                saw_or = saw_and = False
                while True:
                    v = self.peek()
                    if v is None:
                        raise SolrQueryError("Unbalanced parentheses in value list")
                    if v == ")":
                        self.next()
                        break
                    if v == "OR":
                        saw_or = True
                        self.next()
                        continue
                    if v == "AND":
                        saw_and = True
                        self.next()
                        continue
                    values.append(self._read_value())
                if not values:
                    raise SolrQueryError(f"Empty value list for field {field!r}")
                if saw_or and saw_and:
                    raise SolrQueryError(
                        f"Mixed AND/OR in value list for field {field!r} — "
                        "not supported (SOLR precedence would be ambiguous "
                        "to replicate silently)"
                    )
                # bare juxtaposition inside a value list follows the SAME
                # default operator as clause level (AND — the q.op the
                # translator is committed to); explicit OR overrides
                op_or = saw_or
                col = self._column(field)
                conds = [_parse_value(col, v) for v in values]
                result = conds[0]
                for c in conds[1:]:
                    result = (result | c) if op_or else (result & c)
                return self._negated(result) if negate else result
            value = self._read_value()
            if field == "*" and value == "*":
                result = F.lit(True)
            else:
                result = _parse_value(self._column(field), value)
            return self._negated(result) if negate else result
        raise SolrQueryError(f"Expected 'field:value', got {field!r}")

    def _column(self, field: str) -> Column:
        return F.col(self.mapping.get(field, field))


def translate(q: str, field_mapping: dict[str, str] | None = None) -> Column:
    """Translate a SOLR q/fq string into a Spark Column predicate."""
    if q is None or q.strip() == "" or q.strip() == "*:*":
        return F.lit(True)
    tokens = _tokenize(q)
    parser = _Parser(tokens, field_mapping)
    result = parser.parse_clause()
    if parser.pos != len(parser.tokens):
        raise SolrQueryError(f"Trailing tokens: {parser.tokens[parser.pos:]}")
    return result


# ---------------------------------------------------------------------------
# Qid spatial predicates (model/Qid.scala:9: a stored query carries `wkt`
# and `bbox` alongside q/fqs; qa/ValidationRuleRunner.scala applies the WKT
# area when replaying). Both compile to static Column expressions over the
# coordinate columns: the polygon vertices are literals, so the ray-cast
# unrolls into a fixed sum of per-edge crossing indicators — whole-stage
# codegen, no UDF, pushdown-friendly.
# ---------------------------------------------------------------------------


def bbox_predicate(
    bbox: list[float],
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
) -> Column:
    """bbox = [minX, minY, maxX, maxY] (lon/lat order, Qid.scala:9) -> four
    range predicates."""
    min_x, min_y, max_x, max_y = (float(v) for v in bbox)
    lon = F.col(lon_col).cast("double")
    lat = F.col(lat_col).cast("double")
    return (lon >= min_x) & (lon <= max_x) & (lat >= min_y) & (lat <= max_y)


def _ring_edges(ring: list[tuple[float, float]]):
    """Non-horizontal edges as (xi, yi, yj, slope) with slope precomputed
    driver-side; horizontal edges can never satisfy the crossing test."""
    edges = []
    n = len(ring)
    j = n - 1
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if yi != yj:
            edges.append((xi, yi, yj, (xj - xi) / (yj - yi)))
        j = i
    return edges


def wkt_predicate(
    wkt: str,
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
) -> Column:
    """Point-in-polygon as a static expression: odd number of edge
    crossings, unrolled over the literal vertices.

    Boundary convention: STRICT crossings only — a point exactly on an
    edge is outside. This deliberately differs from operators/sampling.
    point_in_polygon (which counts the ray-through-vertex lon==x_cross
    case as inside): a validation/qid predicate should err toward NOT
    flagging a boundary record, while the sampling join errs toward
    giving it a layer value. wkt_predicate_sql unrolls the identical
    strict rule, so the Spark and oracle sides always agree."""
    from biocache_store_spark.operators.sampling import parse_wkt_polygon

    ring = parse_wkt_polygon(wkt)
    lon = F.col(lon_col).cast("double")
    lat = F.col(lat_col).cast("double")
    crossings: Column = F.lit(0)
    for xi, yi, yj, slope in _ring_edges(ring):
        straddles = (F.lit(yi) > lat) != (F.lit(yj) > lat)
        x_cross = F.lit(slope) * (lat - F.lit(yi)) + F.lit(xi)
        crossings = crossings + (straddles & (lon < x_cross)).cast("int")
    return F.pmod(crossings, F.lit(2)) == 1


def wkt_predicate_sql(
    wkt: str,
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
) -> str:
    """The identical ray-cast as ANSI SQL (for DuckDB oracles): both sides
    evaluate the same arithmetic over the same literals, so results match
    exactly."""
    from biocache_store_spark.operators.sampling import parse_wkt_polygon

    ring = parse_wkt_polygon(wkt)
    terms = [
        f"(CASE WHEN (({yi!r} > {lat_col}) <> ({yj!r} > {lat_col}))"
        f" AND ({lon_col} < {slope!r} * ({lat_col} - {yi!r}) + {xi!r})"
        " THEN 1 ELSE 0 END)"
        for xi, yi, yj, slope in _ring_edges(ring)
    ]
    return "(" + (" + ".join(terms) or "0") + ") % 2 = 1"


def qid_predicate(
    q: str | None = None,
    fqs: list[str] | None = None,
    wkt: str | None = None,
    bbox: list[float] | None = None,
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    field_mapping: dict[str, str] | None = None,
) -> Column:
    """Full stored-query replay: q AND every fq AND the spatial area
    (model/Qid.scala:8-27)."""
    pred = translate(q, field_mapping)
    for fq in fqs or []:
        pred = pred & translate(fq, field_mapping)
    if bbox is not None:
        pred = pred & bbox_predicate(bbox, lat_col, lon_col)
    if wkt is not None:
        pred = pred & wkt_predicate(wkt, lat_col, lon_col)
    return pred


@dataclass
class Qid:
    """A stored query (model/Qid.scala:8-27): q + fq list + optional
    spatial area, persisted under a minted rowKey with a freshness
    horizon (`max_age` millis; <=0 = never stale)."""

    q: str
    fqs: tuple[str, ...] = ()
    wkt: str | None = None
    bbox: tuple[float, ...] | None = None
    max_age: int = -1
    row_key: str | None = None

    def predicate(
        self,
        lat_col: str = "decimalLatitude",
        lon_col: str = "decimalLongitude",
        field_mapping: dict[str, str] | None = None,
    ) -> Column:
        return qid_predicate(
            self.q,
            list(self.fqs),
            self.wkt,
            list(self.bbox) if self.bbox is not None else None,
            lat_col,
            lon_col,
            field_mapping,
        )


class QidStore:
    """Parquet-backed qid persistence (dao/QidDAO over the `qid` table —
    QidTest.scala:30-50 put/get round trip). put() mints a uuid rowKey and
    appends one row; get() is a rowKey point lookup. A table of stored
    queries is tiny and append-only, so an append-mode parquet dir is the
    honest analog of the reference's Cassandra row — no compaction needed."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path

    _SCHEMA = (
        "rowKey string, q string, fqs array<string>, wkt string, "
        "bbox array<double>, maxAge long, created timestamp"
    )

    def put(self, qid: Qid) -> Qid:
        import uuid

        # unit-separator join + max_age in the seed: '|'.join would make
        # fqs=('a|b',) collide with ('a','b'), and two qids differing
        # only in max_age would shadow each other's freshness horizon
        seed = "\x1f".join(
            ["qid", qid.q, *qid.fqs, str(qid.wkt), str(qid.bbox), str(qid.max_age)]
        )
        row_key = qid.row_key or str(uuid.uuid5(uuid.NAMESPACE_URL, seed))
        row = [
            (
                row_key,
                qid.q,
                list(qid.fqs),
                qid.wkt,
                [float(v) for v in qid.bbox] if qid.bbox is not None else None,
                qid.max_age,
                _dt.datetime.now(tz=_dt.timezone.utc).replace(tzinfo=None),
            )
        ]
        from biocache_store_spark.util import local_rows_df

        local_rows_df(self.spark, self._SCHEMA, row).write.mode("append").parquet(
            self.path
        )
        return Qid(qid.q, tuple(qid.fqs), qid.wkt, qid.bbox, qid.max_age, row_key)

    def get(self, row_key: str) -> Qid | None:
        from pyspark.errors import AnalysisException

        try:
            rows = (
                self.spark.read.schema(self._SCHEMA)
                .parquet(self.path)
                .filter(F.col("rowKey") == row_key)
                .collect()
            )
        except AnalysisException:
            return None  # never-written store: every lookup is a miss
        if not rows:
            return None
        r = max(rows, key=lambda x: x["created"])  # latest write wins
        return Qid(
            r["q"],
            tuple(r["fqs"] or ()),
            r["wkt"],
            tuple(r["bbox"]) if r["bbox"] is not None else None,
            r["maxAge"],
            r["rowKey"],
        )
