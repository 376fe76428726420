"""Occurrence duplicate detection (grouped fuzzy dedup).

Port of tool/DuplicationDetection.scala:
  * grouping by (taxonConceptID, year, month, day) — :428-455, :809-860;
  * per-group pairwise matching — findDuplicates :966-1006: spatial
    sameness over the multi-precision point ladder (isSpatialDuplicate
    :1122-1152) AND one of collector-Levenshtein<=3 (:1074-1113), exact
    recordNumber (:1037), exact catalogNumber (:1015);
  * representative selection = max coordinate-decimal precision,
    first-wins on ties (markRecordsAsDuplicatesAndSetTypes :874-925); the
    reference's "first" depends on iteration order, so records are
    processed in row-key order here to make it deterministic (documented
    refinement);
  * statuses: R (representative), D1 (duplicate from the same data
    resource), D2 (from another resource); dup types from
    model/DupType.scala:9-20.

Spark shape: point-ladder blocking keys are precomputed as built-in
expressions (shared with the index projection, cf. IndexDAO.scala:170-210),
then one applyInPandas pass per (taxon, year, month, day) group — groups
are small (a species on a day), so the pairwise scan is bounded; skewed
giant groups are the AQE-skew risk called out in SURVEY §7.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the point ladder is SHARED with the Catalyst index projection — one
# module (functions/points.py) holds both engines' implementations plus
# the parity property test, so a rounding fix can never drift them apart
from biocache_store_spark.functions.points import (  # noqa: F401 — re-exported API
    lat_long_rounded,
    point_ladder,
)
from biocache_store_spark.functions.points import point_ladder_np as _point_ladder_np

COLLECTOR_LEVENSHTEIN_THRESHOLD = 3

# model/DupType.scala:9-20
MISSING_YEAR = 1
MISSING_MONTH = 2
MISSING_DAY = 3
EXACT_COORD = 4
DIFFERENT_PRECISION = 5
EXACT_COLLECTOR = 6
FUZZY_COLLECTOR = 7
MISSING_COLLECTOR = 8
EXACT_FIELD_NUMBER = 9
EXACT_CATALOGUE_NUMBER = 10

_UNKNOWN = re.compile(r"(null|UNKNOWN OR ANONYMOUS)")
_NON_ALNUM = re.compile(r"[\W_]", re.UNICODE)  # ref keeps only \p{L}\p{N}


def levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    previous = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        current = [i + 1]
        for j, cb in enumerate(b):
            current.append(
                min(previous[j + 1] + 1, current[j] + 1, previous[j] + (ca != cb))
            )
        previous = current
    return previous[-1]


def determine_precision(lat_long: str | None) -> int:
    """Max decimal places in 'lat,long' (DuplicationDetection.scala:928-941)."""
    if not lat_long:
        return 0
    m = re.fullmatch(r"(-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?)", lat_long)
    if not m:
        return 0
    latp = len(m.group(1).split(".")[1]) if "." in m.group(1) else 0
    lonp = len(m.group(2).split(".")[1]) if "." in m.group(2) else 0
    return max(latp, lonp)


def is_empty_unknown(s: str | None) -> bool:
    return s is None or s == "" or bool(_UNKNOWN.fullmatch(s))


def is_spatial_duplicate(points_a: list, points_b: list) -> bool:
    """isSpatialDuplicate (DuplicationDetection.scala:1122-1152), exact port
    including the precision-difference walk.

    NOTE the deliberate asymmetry at the i+1 look-ahead:
    `points_b[i] == points_a[i + 1]` compares ACROSS the two ladders —
    that is exactly what the reference does
    (`pointsB(i) == pointsA(i + 1)`, scala:1138) and makes the predicate
    order-dependent. Do not "fix" it to points_b[i + 1]; parity with the
    reference's grouping (which sorts by row key before comparing, as
    this module does) depends on reproducing it."""
    if len(points_a) != len(points_b):
        raise ValueError("Points supplied with a differing number of precisions")
    n = len(points_a)
    for i in range(n):
        if points_a[i] != points_b[i]:
            if i > 0:
                if points_a[i] == points_a[i - 1] or points_b[i] == points_b[i - 1]:
                    if i < n - 1:
                        if points_a[i] == points_a[i + 1] or points_b[i] == points_a[i + 1]:
                            return True
                    else:
                        return True
                return False
            return False
    return True


@dataclass
class DupRecord:
    row_key: str
    druid: str | None = None
    year: str | None = None
    month: str | None = None
    day: str | None = None
    lat: str | None = None
    lon: str | None = None
    collector: str | None = None
    record_number: str | None = None
    catalogue_number: str | None = None
    points: list = field(default_factory=list)
    duplicate_of: str | None = None
    duplicates: list = field(default_factory=list)
    dup_types: list = field(default_factory=list)
    precision: int = 0
    status: str = "U"

    def __post_init__(self):
        if not self.points:
            self.points = point_ladder(self.lat, self.lon)

    @property
    def lat_long(self):
        return self.points[-1]


def _prepare_collectors(c1: str, c2: str) -> tuple[str, str]:
    c11 = _NON_ALNUM.sub("", c1)
    c21 = _NON_ALNUM.sub("", c2)
    length = min(len(c11), len(c21))
    return c11[:length], c21[:length]


def _is_collector_duplicate(r1: DupRecord, r2: DupRecord) -> bool:
    if is_empty_unknown(r1.collector) or is_empty_unknown(r2.collector):
        if is_empty_unknown(r2.collector):
            r2.dup_types.append(MISSING_COLLECTOR)
        return True
    c1, c2 = _prepare_collectors(r1.collector, r2.collector)
    distance = levenshtein(c1, c2)
    if distance <= COLLECTOR_LEVENSHTEIN_THRESHOLD:
        r2.dup_types.append(FUZZY_COLLECTOR if distance > 0 else EXACT_COLLECTOR)
        return True
    return False


def _exact_field_dup(v1, v2, r2: DupRecord, dup_type: int) -> bool:
    if v1 is None or v2 is None:
        return False
    if is_empty_unknown(v1) or is_empty_unknown(v2):
        return False
    if v1.strip().lower() == v2.strip().lower():
        r2.dup_types.append(dup_type)
        return True
    return False


def _set_date_types(r: DupRecord, has_year, has_month, has_day):
    if has_year and has_month and not has_day:
        r.dup_types.append(MISSING_DAY)
    elif has_year and not has_month:
        r.dup_types.append(MISSING_MONTH)
    elif not has_year:
        r.dup_types.append(MISSING_YEAR)


def find_group_duplicates(
    records: list[DupRecord],
    edges: dict[tuple[str, str], list[int]] | None = None,
    adjacency: dict[str, list[tuple[str, list[int]]]] | None = None,
) -> list[DupRecord]:
    """checkDuplicates + markRecordsAsDuplicatesAndSetTypes over one
    (taxon, year, month, day) group. Returns all records with statuses set.

    `edges` (optional) short-circuits the live pairwise predicate with a
    precomputed claim map `{(head_key, other_key): [dup types]}` — the
    JVM-join formulation (detect_duplicates_join) evaluates the
    spatial/collector/field predicates as Catalyst expressions and hands
    only the surviving directed pairs here, so this pass degrades to the
    greedy claim walk over a (typically tiny) edge set. A type append in
    the live path always implies a claim (every append happens on a
    True-returning branch of an OR'd predicate), so the edge map captures
    the live path's mutations exactly. Assumes row_keys are unique within
    the group (the store upserts by id), which the live path also needs
    for coherent duplicate_of pointers.

    `adjacency` is the same claim map in head-keyed form
    `{head_key: [(other_key, types), ...]}` with each list sorted by
    other_key — the claim walk then visits only existing edges instead
    of probing every ordered pair (the vectorized batch kernel's form;
    per-key sorted order makes it claim-identical to the edges walk)."""
    # null-tolerant key: detect_duplicates filters id-less records, but
    # this is a public function — a None row_key must not TypeError the
    # whole task
    records = sorted(records, key=lambda r: (r.row_key is None, r.row_key or ""))
    if adjacency is not None:
        by_key = {r.row_key: r for r in records}
        for record in records:
            if record.duplicate_of is not None:
                continue
            for other_key, types in adjacency.get(record.row_key, ()):
                other = by_key.get(other_key)
                if (
                    other is None
                    or other.duplicate_of is not None
                    or other.row_key == record.row_key
                ):
                    continue
                other.dup_types.extend(types)
                other.duplicate_of = record.row_key
                record.duplicates.append(other)
        return _select_representatives(records)
    for record in records:
        if record.duplicate_of is not None:
            continue
        for other in records:
            if other.duplicate_of is not None or other.row_key == record.row_key:
                continue
            if edges is not None:
                types = edges.get((record.row_key, other.row_key))
                if types is not None:
                    other.dup_types.extend(types)
                    other.duplicate_of = record.row_key
                    record.duplicates.append(other)
                continue
            if is_spatial_duplicate(record.points, other.points):
                collector_dup = _is_collector_duplicate(record, other)
                record_number_dup = _exact_field_dup(
                    record.record_number, other.record_number, other, EXACT_FIELD_NUMBER
                )
                catalogue_dup = _exact_field_dup(
                    record.catalogue_number, other.catalogue_number, other,
                    EXACT_CATALOGUE_NUMBER,
                )
                if collector_dup or record_number_dup or catalogue_dup:
                    other.duplicate_of = record.row_key
                    record.duplicates.append(other)
    return _select_representatives(records)


def _select_representatives(records: list[DupRecord]) -> list[DupRecord]:
    """Phase 2 of find_group_duplicates
    (markRecordsAsDuplicatesAndSetTypes, DuplicationDetection.scala
    :874-925), shared by the live / edges / adjacency claim walks."""
    # snapshot the cluster heads BEFORE mutating: the reference's caller
    # (DuplicationDetection.scala:838-844) walks only the heads
    # checkDuplicates produced, so a representative promoted INTO a head's
    # duplicate list is never itself re-processed — re-testing
    # `duplicate_of is None and duplicates` per iteration would run the
    # swapped-in representative's cluster twice and double-append types
    heads = [r for r in records if r.duplicate_of is None and r.duplicates]
    for record in heads:
        highest = determine_precision(record.lat_long)
        record.precision = highest
        representative = record
        has_year = bool(record.year)
        has_month = bool(record.month)
        has_day = bool(record.day)
        _set_date_types(record, has_year, has_month, has_day)
        duplicates = list(record.duplicates)
        for r in duplicates:
            _set_date_types(r, has_year, has_month, has_day)
            r.precision = determine_precision(r.lat_long)
            if r.precision > highest:
                highest = r.precision
                representative = r
        representative.status = "R"
        if representative is not record:
            record.duplicates = []
            duplicates.append(record)
            duplicates.remove(representative)
            representative.duplicates = duplicates
            # COPY, not alias: the Scala original assigns the array ref but
            # every later mutation there is an immutable reassignment
            # (r.dupTypes = r.dupTypes ++ ...), while this port appends in
            # place — sharing the list would leak the demoted record's
            # precision type into the representative's array
            record.dup_types = list(representative.dup_types)
        # realign duplicate_of with the final representative (the reference
        # leaves the find-phase pointers stale; we emit coherent pointers)
        representative.duplicate_of = None
        for d in duplicates:
            d.duplicate_of = representative.row_key
            d.status = "D1" if d.druid == representative.druid else "D2"
            d.dup_types.append(
                EXACT_COORD if d.precision == representative.precision else DIFFERENT_PRECISION
            )
    return records


_OUT_FIELDS = [
    T.StructField("row_key", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("duplicate_of", T.StringType()),
    T.StructField("dup_types", T.ArrayType(T.IntegerType())),
    T.StructField("precision", T.IntegerType()),
]


def _dedup_projection(
    df: DataFrame,
    taxon_col: str,
    year_col: str,
    month_col: str,
    day_col: str,
    lat_col: str,
    lon_col: str,
    collector_col: str,
    record_number_col: str,
    catalogue_col: str,
    id_col: str,
    druid_col: str,
) -> DataFrame:
    """Shared input projection of the two duplicate-detection kernels.

    taxon-less (or id-less) records are never dedup-checked: the
    reference iterates ACTUAL taxon lsids (DuplicationDetection.scala:
    428-455), so records without one have no group — coalescing them
    to "" would instead pool every unrelated taxon-less record into
    one mega-group (false duplicates across species AND a potential
    O(n^2) single-task group)."""
    return df.filter(
        F.col(taxon_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(taxon_col).cast("string").alias("g_taxon"),
        F.coalesce(F.col(year_col).cast("string"), F.lit("")).alias("g_year"),
        F.coalesce(F.col(month_col).cast("string"), F.lit("")).alias("g_month"),
        F.coalesce(F.col(day_col).cast("string"), F.lit("")).alias("g_day"),
        F.col(id_col).cast("string").alias("row_key"),
        F.col(druid_col).cast("string").alias("druid"),
        F.col(lat_col).cast("string").alias("lat"),
        F.col(lon_col).cast("string").alias("lon"),
        F.col(collector_col).cast("string").alias("collector"),
        F.col(record_number_col).cast("string").alias("record_number"),
        F.col(catalogue_col).cast("string").alias("catalogue_number"),
    )


def detect_duplicates(
    df: DataFrame,
    taxon_col: str = "taxonConceptID",
    year_col: str = "year",
    month_col: str = "month",
    day_col: str = "day",
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    collector_col: str = "recordedBy",
    record_number_col: str = "recordNumber",
    catalogue_col: str = "catalogNumber",
    id_col: str = "occurrenceID",
    druid_col: str = "dataResourceUid",
) -> DataFrame:
    """Grouped duplicate detection. Output: group keys + per-record status.

    Records with status 'U' had no duplicates; 'R' is the representative of
    a duplicate cluster; 'D1'/'D2' are its duplicates (same/other resource).

    Ships the partition-streamed kernel — the round-9 A/B winner
    (tools/bench_dedup.py; SCALE.md: 3.5x over the per-group
    applyInPandas form, 5.7x over the JVM self-join form at 2M rows,
    identical output) — with detect_duplicates_grouped kept as the
    parity oracle."""
    return detect_duplicates_streamed(
        df,
        taxon_col=taxon_col,
        year_col=year_col,
        month_col=month_col,
        day_col=day_col,
        lat_col=lat_col,
        lon_col=lon_col,
        collector_col=collector_col,
        record_number_col=record_number_col,
        catalogue_col=catalogue_col,
        id_col=id_col,
        druid_col=druid_col,
    )


def detect_duplicates_grouped(
    df: DataFrame,
    taxon_col: str = "taxonConceptID",
    year_col: str = "year",
    month_col: str = "month",
    day_col: str = "day",
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    collector_col: str = "recordedBy",
    record_number_col: str = "recordNumber",
    catalogue_col: str = "catalogNumber",
    id_col: str = "occurrenceID",
    druid_col: str = "dataResourceUid",
) -> DataFrame:
    """The original per-group applyInPandas kernel — one Python call and
    two pandas frames per (taxon, year, month, day) group. Row-identical
    to the shipped streamed kernel (parity test) but pays ~16 s of pure
    harness overhead per 2M rows of day-species groups; kept as the
    parity oracle for the A/B in tools/bench_dedup.py."""
    from biocache_store_spark.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    selected = _dedup_projection(
        df, taxon_col, year_col, month_col, day_col, lat_col, lon_col,
        collector_col, record_number_col, catalogue_col, id_col, druid_col,
    )
    schema = T.StructType(
        [
            T.StructField("taxon", T.StringType()),
            T.StructField("year", T.StringType()),
            T.StructField("month", T.StringType()),
            T.StructField("day", T.StringType()),
        ]
        + list(_OUT_FIELDS)
    )

    def run(pdf):
        import pandas as pd

        records = [
            DupRecord(
                row_key=row.row_key,
                druid=row.druid,
                year=row.g_year or None,
                month=row.g_month or None,
                day=row.g_day or None,
                lat=row.lat,
                lon=row.lon,
                collector=row.collector,
                record_number=row.record_number,
                catalogue_number=row.catalogue_number,
            )
            for row in pdf.itertuples()
        ]
        out = find_group_duplicates(records)
        return pd.DataFrame(
            [
                {
                    "taxon": pdf["g_taxon"].iloc[0],
                    "year": pdf["g_year"].iloc[0],
                    "month": pdf["g_month"].iloc[0],
                    "day": pdf["g_day"].iloc[0],
                    "row_key": r.row_key,
                    "status": r.status,
                    "duplicate_of": r.duplicate_of,
                    "dup_types": sorted(set(r.dup_types)),
                    "precision": r.precision,
                }
                for r in out
            ]
        )

    return selected.groupBy("g_taxon", "g_year", "g_month", "g_day").applyInPandas(
        run, schema=schema
    )


def detect_duplicates_streamed(
    df: DataFrame,
    taxon_col: str = "taxonConceptID",
    year_col: str = "year",
    month_col: str = "month",
    day_col: str = "day",
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    collector_col: str = "recordedBy",
    record_number_col: str = "recordNumber",
    catalogue_col: str = "catalogNumber",
    id_col: str = "occurrenceID",
    druid_col: str = "dataResourceUid",
    vectorized: bool = True,
    pair_group_cap: int | None = None,
) -> DataFrame:
    """detect_duplicates with the per-GROUP applyInPandas replaced by a
    per-PARTITION stream: repartition on the group keys, sort within
    partitions so each (taxon, year, month, day) group is contiguous,
    then mapInPandas walks the Arrow batches once — a pandas groupby
    inside each batch dispatches to the SAME live matcher
    (find_group_duplicates), with a carry buffer for the group that
    straddles a batch boundary. Row-identical to detect_duplicates (the
    parity test pins it) at a fraction of the harness cost: applyInPandas
    pays one Python call + two pandas frames PER GROUP (~125k calls for
    2M rows of day-species groups — measured 16 s of pure harness
    overhead at 2M, more than the matcher itself), while this form pays
    one call per ~10k-row Arrow batch. Same single Exchange + sort plan
    shape; the per-group memory contract is unchanged (a group must fit
    in one worker's memory — day-species groups are small; giant-group
    skew remains the AQE-skew risk flagged in SURVEY §7).

    `vectorized=True` (round-10 default, the A/B winner in
    tools/bench_dedup.py) swaps the per-row Python matcher for
    _emit_batch_np: NumPy pairwise predicates + a greedy walk only over
    groups that actually have claim edges. `vectorized=False` keeps the
    round-9 scalar emit as the parity oracle."""
    from biocache_store_spark.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    selected = _dedup_projection(
        df, taxon_col, year_col, month_col, day_col, lat_col, lon_col,
        collector_col, record_number_col, catalogue_col, id_col, druid_col,
    )
    keys = ["g_taxon", "g_year", "g_month", "g_day"]
    arranged = selected.repartition(*keys).sortWithinPartitions(*keys)
    schema = T.StructType(
        [
            T.StructField("taxon", T.StringType()),
            T.StructField("year", T.StringType()),
            T.StructField("month", T.StringType()),
            T.StructField("day", T.StringType()),
        ]
        + list(_OUT_FIELDS)
    )

    def run(batches):
        import pandas as pd

        def emit_scalar(pdf: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for (tx, yr, mo, dy), g in pdf.groupby(keys, sort=False):
                records = [
                    DupRecord(
                        row_key=row.row_key,
                        druid=row.druid,
                        year=yr or None,
                        month=mo or None,
                        day=dy or None,
                        lat=row.lat,
                        lon=row.lon,
                        collector=row.collector,
                        record_number=row.record_number,
                        catalogue_number=row.catalogue_number,
                    )
                    for row in g.itertuples()
                ]
                rows.extend(
                    {
                        "taxon": tx,
                        "year": yr,
                        "month": mo,
                        "day": dy,
                        "row_key": r.row_key,
                        "status": r.status,
                        "duplicate_of": r.duplicate_of,
                        "dup_types": sorted(set(r.dup_types)),
                        "precision": r.precision,
                    }
                    for r in find_group_duplicates(records)
                )
            return pd.DataFrame(
                rows,
                columns=[
                    "taxon", "year", "month", "day", "row_key", "status",
                    "duplicate_of", "dup_types", "precision",
                ],
            )

        emit = (
            (lambda pdf: _emit_batch_np(pdf, keys, pair_group_cap))
            if vectorized else emit_scalar
        )
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            # the trailing group may continue into the next Arrow batch:
            # hold it back (rows are key-sorted, so it is the contiguous
            # tail of rows equal to the last key)
            last = pdf.iloc[-1]
            tail = pd.Series(True, index=pdf.index)
            for k in keys:
                tail &= pdf[k] == last[k]
            carry = pdf[tail]
            body = pdf[~tail]
            if not body.empty:
                yield emit(body)
        if carry is not None and not carry.empty:
            yield emit(carry)

    return arranged.mapInPandas(run, schema=schema)


def _lev_gt3(a: str, b: str) -> bool:
    """distance(a, b) > 3 — the same DP as `levenshtein` with a per-row
    early exit (once every cell in a row exceeds 3 the final distance
    must), so the boolean agrees with the full DP by construction."""
    if abs(len(a) - len(b)) > 3:
        return True
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a) > 3
    previous = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        current = [i + 1]
        for j, cb in enumerate(b):
            current.append(
                min(previous[j + 1] + 1, current[j] + 1, previous[j] + (ca != cb))
            )
        if min(current) > 3:
            return True
        previous = current
    return previous[-1] > 3


def _spatial_dup_np(A, B):
    """Vectorized isSpatialDuplicate over pair-axis ladder matrices
    (P, 6) of object dtype — the scalar walk's outcome is a function of
    the FIRST mismatching rung only, so it vectorizes as: no mismatch →
    True; mismatch at rung 0 → False; else the stall check at fd and the
    (deliberately cross-ladder) look-ahead at fd+1. Bit-identical to
    is_spatial_duplicate (exhaustive parity test)."""
    import numpy as np

    P, L = A.shape
    eq = A == B
    mism = ~eq
    res = np.ones(P, dtype=bool)
    if not P:
        return res
    has = mism.any(axis=1)
    idx = np.flatnonzero(has)
    if not idx.size:
        return res
    fd = mism[idx].argmax(axis=1)
    out = np.zeros(idx.size, dtype=bool)
    inner = fd > 0
    ii = idx[inner]
    fdi = fd[inner]
    if ii.size:
        a_fd = A[ii, fdi]
        b_fd = B[ii, fdi]
        stall = (a_fd == A[ii, fdi - 1]) | (b_fd == B[ii, fdi - 1])
        last = fdi == L - 1
        look = last.copy()
        nl = np.flatnonzero(~last)
        if nl.size:
            nxt = A[ii[nl], fdi[nl] + 1]
            look[nl] = (a_fd[nl] == nxt) | (b_fd[nl] == nxt)
        out[inner] = stall & look
    res[idx] = out
    return res


#: vectorized-kernel pair-materialization cap: groups larger than this
#: walk the LIVE per-group matcher instead (m*(m-1) int pairs would be
#: ~4M at the cap; a pathological 100k-row mega-group would otherwise
#: allocate O(m^2) index arrays at once where the scalar walk is merely
#: slow). Day-species groups are ~16 rows; this only fires on skew bugs.
_NP_PAIR_GROUP_CAP = 2048
#: ...and the WHOLE BATCH is bounded too: several near-cap groups in one
#: Arrow batch would otherwise multiply the per-group bound (~5 x 4.2M
#: pairs x 8 int64 arrays > 1 GB transient per task); groups whose pairs
#: would push the batch past this budget also fall back to the live walk
_NP_PAIR_BATCH_BUDGET = 8_000_000
#: element budget for the collector codepoint matrices: caps BOTH the
#: participant matrix (rows x W <= budget, else the per-pair Python
#: prefix/_lev_gt3 fallback) and each transient pair-axis comparison
#: chunk (chunk x W <= budget). Module-level so the chunk-invariance
#: test can shrink it in-process; workers see the default.
_NP_CMP_ELEM_BUDGET = 1 << 26


def _emit_batch_np(pdf, keys, pair_group_cap: int | None = None):
    """The vectorized batch matcher behind detect_duplicates_streamed:
    per key-sorted pandas batch, every pairwise predicate (spatial
    ladder walk, collector empty/prefix/Levenshtein, exact field
    equality) is a NumPy array op over the within-group pair index;
    Python runs only (a) a rare banded-Levenshtein fallback for
    truncated-unequal collector pairs whose Hamming distance exceeds 3
    (shift typos), and (b) the greedy claim walk — via the same
    find_group_duplicates(edges=...) path the JVM-join kernel uses —
    over groups that have at least one claim edge. Claim-free groups
    (the overwhelming majority at scale) are emitted straight from the
    arrays. Row-identical to the scalar emit (parity test)."""
    import numpy as np
    import pandas as pd

    n = len(pdf)
    out_cols = [
        "taxon", "year", "month", "day", "row_key", "status",
        "duplicate_of", "dup_types", "precision",
    ]
    key_vals = {k: pdf[k].to_numpy(dtype=object) for k in keys}

    def fast_frame(mask):
        m = int(mask.sum())
        return pd.DataFrame(
            {
                "taxon": key_vals["g_taxon"][mask],
                "year": key_vals["g_year"][mask],
                "month": key_vals["g_month"][mask],
                "day": key_vals["g_day"][mask],
                "row_key": pdf["row_key"].to_numpy(dtype=object)[mask],
                "status": np.full(m, "U", dtype=object),
                "duplicate_of": np.full(m, None, dtype=object),
                "dup_types": [[] for _ in range(m)],
                "precision": np.zeros(m, dtype="int64"),
            },
            columns=out_cols,
        )

    # contiguous group run ids (batch is key-sorted)
    kf = pdf[keys]
    gid = kf.ne(kf.shift()).any(axis=1).cumsum().to_numpy() - 1
    n_groups = int(gid[-1]) + 1 if n else 0
    sizes = np.bincount(gid, minlength=n_groups)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])

    multi = sizes >= 2
    if not multi.any():
        return fast_frame(np.ones(n, dtype=bool))

    # giant-group guard: the vectorized form MATERIALIZES m*(m-1)
    # ordered pairs per group, so a pathological mega-group (taxon-less
    # pooling bugs, skewed day-species keys) would allocate O(m^2)
    # index arrays at once where the scalar walk was merely slow —
    # route groups past the cap to the live per-group matcher instead
    # (~4M pairs of transient ints at the default; same output, pinned)
    cap = _NP_PAIR_GROUP_CAP if pair_group_cap is None else pair_group_cap
    base_huge = sizes > cap
    # batch-level budget: demote further groups (in batch order) once the
    # cumulative pair count would exceed it — the per-group cap alone
    # does not bound a batch of several near-cap groups
    reps_all = sizes * (sizes - 1)
    counted = np.where(multi & ~base_huge, reps_all, 0)
    over_budget = np.cumsum(counted) > _NP_PAIR_BATCH_BUDGET
    huge = multi & (base_huge | over_budget)
    pair_groups = multi & ~huge

    # ordered within-group pair index (i != j), capped groups only
    msz = sizes[pair_groups]
    mst = starts[pair_groups]
    reps = msz * (msz - 1)
    total = int(reps.sum())
    pair_start = np.repeat(mst, reps)
    pair_m = np.repeat(msz, reps)
    excl = np.concatenate([[0], np.cumsum(reps)[:-1]]) if len(reps) else reps
    ordinal = np.arange(total) - np.repeat(excl, reps)
    i_loc = ordinal // np.maximum(pair_m - 1, 1)
    j_r = ordinal % np.maximum(pair_m - 1, 1)
    j_loc = j_r + (j_r >= i_loc)
    I = pair_start + i_loc
    J = pair_start + j_loc

    lat_s = pdf["lat"].to_numpy(dtype=object)
    lon_s = pdf["lon"].to_numpy(dtype=object)
    # ladder only for rows that can actually pair (groups of size >= 2),
    # and only once per distinct (lat, lon) STRING pair — coordinates
    # repeat heavily within day-species groups, and the decimal
    # formatting is the kernel's most expensive vector op
    R = np.empty((n, 6), dtype=object)
    midx = np.flatnonzero(np.repeat(multi, sizes))
    lat_m = lat_s[midx]
    lon_m = lon_s[midx]
    lc = pd.factorize(pd.Series(lat_m, dtype=object))[0]
    oc = pd.factorize(pd.Series(lon_m, dtype=object))[0]
    pair_id = (lc.astype(np.int64) + 1) * (int(oc.max()) + 2) + (oc + 1)
    _, first, inv = np.unique(pair_id, return_index=True, return_inverse=True)
    R[midx] = _point_ladder_np(lat_m[first], lon_m[first])[inv]

    # rung-0 prefilter: the walk returns False whenever rung 0 differs,
    # so only pairs equal there (None == None included) pay the full
    # vectorized walk over the object matrices
    r0 = pd.factorize(pd.Series(R[:, 0]))[0]
    cand = r0[I] == r0[J]
    sp = np.zeros(total, dtype=bool)
    ci = np.flatnonzero(cand)
    if ci.size:
        sp[ci] = _spatial_dup_np(R[I[ci]], R[J[ci]])
    SP = np.flatnonzero(sp)

    claim = np.zeros(total, dtype=bool)
    t_miss_c = np.zeros(total, dtype=bool)
    t_exact_c = np.zeros(total, dtype=bool)
    t_fuzzy_c = np.zeros(total, dtype=bool)
    t_rn = np.zeros(total, dtype=bool)
    t_cat = np.zeros(total, dtype=bool)
    if SP.size:
        coll_raw = pdf["collector"]
        coll_empty = (
            coll_raw.isna()
            | coll_raw.isin(["", "null", "UNKNOWN OR ANONYMOUS"])
        ).to_numpy()
        cleaned = coll_raw.str.replace(_NON_ALNUM, "", regex=True)
        cc = cleaned.fillna("").to_numpy(dtype=object)
        lens = np.fromiter((len(s) for s in cc), dtype=np.int64, count=n)

        Ei = coll_empty[I[SP]]
        Ej = coll_empty[J[SP]]
        either_empty = Ei | Ej
        coll_dup = either_empty.copy()
        t_miss_c[SP] = Ej & either_empty

        ne = np.flatnonzero(~either_empty)
        if ne.size:
            pi = I[SP[ne]]
            pj = J[SP[ne]]
            # participants' codepoint matrix (vectorized utf-32 scatter)
            part = np.unique(np.concatenate([pi, pj]))
            plen = lens[part]
            W = int(plen.max()) if part.size else 0
            budget_ok = W * part.size <= _NP_CMP_ELEM_BUDGET
            if W and budget_ok:
                remap = np.full(n, -1, dtype=np.int64)
                remap[part] = np.arange(part.size)
                flat = np.frombuffer(
                    "".join(cc[r] for r in part).encode("utf-32-le"),
                    dtype=np.uint32,
                )
                CM = np.zeros((part.size, W), dtype=np.uint32)
                rows = np.repeat(np.arange(part.size), plen)
                offs = np.concatenate([[0], np.cumsum(plen)[:-1]])
                cols = np.arange(flat.size) - np.repeat(offs, plen)
                CM[rows, cols] = flat
                Lp = np.minimum(lens[pi], lens[pj])
                # pair-axis comparisons materialize two (pairs x W)
                # uint32 copies plus a bool matrix — the participant
                # budget alone doesn't bound them (ADVICE r10: a
                # 2048-row group of ~32k-char collectors passes
                # budget_ok with millions of pairs). Chunk the pair
                # axis so each transient stays within the same
                # 2^26-element budget as CM itself.
                prefix_eq = np.empty(ne.size, dtype=bool)
                ham = np.empty(ne.size, dtype=np.int64)
                colmask = np.arange(W)[None, :]
                step = max(1, _NP_CMP_ELEM_BUDGET // W)
                for s0 in range(0, int(ne.size), step):
                    sl = slice(s0, s0 + step)
                    neq = CM[remap[pi[sl]]] != CM[remap[pj[sl]]]
                    neq &= colmask < Lp[sl][:, None]
                    prefix_eq[sl] = ~neq.any(axis=1)
                    ham[sl] = neq.sum(axis=1)
                fuzzy = ~prefix_eq & (ham <= 3)
                hard = np.flatnonzero(~prefix_eq & (ham > 3))
            else:
                Lp = np.minimum(lens[pi], lens[pj])
                prefix_eq = np.fromiter(
                    (cc[a][:L] == cc[b][:L] for a, b, L in zip(pi, pj, Lp)),
                    dtype=bool, count=ne.size,
                )
                fuzzy = np.zeros(ne.size, dtype=bool)
                hard = np.flatnonzero(~prefix_eq)
            for h in hard:
                a, b, L = cc[pi[h]], cc[pj[h]], Lp[h]
                if not _lev_gt3(a[:L], b[:L]):
                    fuzzy[h] = True
            coll_dup[ne] = prefix_eq | fuzzy
            t_exact_c[SP[ne]] = prefix_eq
            t_fuzzy_c[SP[ne]] = fuzzy

        def field_codes(col):
            raw = pdf[col]
            valid = (
                raw.notna()
                & ~raw.isin(["", "null", "UNKNOWN OR ANONYMOUS"])
            )
            norm = raw.str.strip().str.lower().where(valid)
            return pd.factorize(norm)[0]

        rn_c = field_codes("record_number")
        cat_c = field_codes("catalogue_number")
        rn_dup = (rn_c[I[SP]] >= 0) & (rn_c[I[SP]] == rn_c[J[SP]])
        cat_dup = (cat_c[I[SP]] >= 0) & (cat_c[I[SP]] == cat_c[J[SP]])
        t_rn[SP] = rn_dup
        t_cat[SP] = cat_dup
        claim[SP] = coll_dup | rn_dup | cat_dup

    cl = np.flatnonzero(claim)
    if not cl.size and not huge.any():
        return fast_frame(np.ones(n, dtype=bool))

    rk = pdf["row_key"].to_numpy(dtype=object)
    # per-GROUP claim maps: row_key uniqueness is only a per-group
    # contract, so a batch-global map keyed by bare row_key would leak
    # edges across groups whenever a dirty occurrenceID recurs under two
    # (taxon, date) keys in one Arrow batch (ADVICE r10); each group's
    # walk sees only its own slice
    adj: dict[int, dict[str, list[tuple[str, list[int]]]]] = {}
    for p in cl:
        types: list[int] = []
        if t_miss_c[p]:
            types.append(MISSING_COLLECTOR)
        if t_exact_c[p]:
            types.append(EXACT_COLLECTOR)
        if t_fuzzy_c[p]:
            types.append(FUZZY_COLLECTOR)
        if t_rn[p]:
            types.append(EXACT_FIELD_NUMBER)
        if t_cat[p]:
            types.append(EXACT_CATALOGUE_NUMBER)
        adj.setdefault(int(gid[I[p]]), {}).setdefault(rk[I[p]], []).append(
            (rk[J[p]], types)
        )
    for gadj in adj.values():
        for lst in gadj.values():
            # the walk must visit others in row-key order (the generic
            # walk probes `records` sorted); keys are unique within a
            # group so the sort never compares the type lists
            lst.sort(key=lambda t: t[0])

    walk_groups = np.unique(gid[I[cl]]) if cl.size else np.empty(0, dtype=int)
    live_groups = np.flatnonzero(huge)
    walk_mask = np.isin(gid, walk_groups) | np.repeat(huge, sizes)
    druid = pdf["druid"].to_numpy(dtype=object)
    coll_raw_np = pdf["collector"].to_numpy(dtype=object)
    rn_raw_np = pdf["record_number"].to_numpy(dtype=object)
    cat_raw_np = pdf["catalogue_number"].to_numpy(dtype=object)
    # ONE columnar accumulator for every walked group — building a
    # pandas frame per group cost more than the matcher itself
    # (measured: 15 s of 41 s at 500k rows before this batching)
    w_tax, w_yr, w_mo, w_dy = [], [], [], []
    w_rk, w_st, w_dof, w_dt, w_pr = [], [], [], [], []

    def walk(groups, live):
        for g in groups:
            s, m = int(starts[g]), int(sizes[g])
            records = [
                DupRecord(
                    row_key=rk[r],
                    druid=druid[r],
                    year=key_vals["g_year"][r] or None,
                    month=key_vals["g_month"][r] or None,
                    day=key_vals["g_day"][r] or None,
                    # the live matcher re-evaluates every predicate and
                    # needs the full ladder + raw fields; the adjacency
                    # walk only reads lat_long (precision phase)
                    collector=coll_raw_np[r] if live else None,
                    record_number=rn_raw_np[r] if live else None,
                    catalogue_number=cat_raw_np[r] if live else None,
                    points=list(R[r]) if live else [R[r, 5]],
                )
                for r in range(s, s + m)
            ]
            out = (
                find_group_duplicates(records)
                if live
                else find_group_duplicates(
                    records, adjacency=adj.get(int(g), {})
                )
            )
            for rec in out:
                w_tax.append(key_vals["g_taxon"][s])
                w_yr.append(key_vals["g_year"][s])
                w_mo.append(key_vals["g_month"][s])
                w_dy.append(key_vals["g_day"][s])
                w_rk.append(rec.row_key)
                w_st.append(rec.status)
                w_dof.append(rec.duplicate_of)
                w_dt.append(sorted(set(rec.dup_types)))
                w_pr.append(rec.precision)

    walk(walk_groups, live=False)
    walk(live_groups, live=True)
    walked = pd.DataFrame(
        {
            "taxon": w_tax, "year": w_yr, "month": w_mo, "day": w_dy,
            "row_key": w_rk, "status": w_st, "duplicate_of": w_dof,
            "dup_types": w_dt,
            "precision": np.asarray(w_pr, dtype="int64"),
        },
        columns=out_cols,
    )
    return pd.concat([walked, fast_frame(~walk_mask)], ignore_index=True)


def _empty_unknown_expr(c: F.Column) -> F.Column:
    """is_empty_unknown as a Catalyst expression: NULL, '', or exactly
    'null' / 'UNKNOWN OR ANONYMOUS' (the _UNKNOWN fullmatch alternation
    has no metacharacters, so it is a two-literal isin)."""
    return c.isNull() | (c == "") | c.isin("null", "UNKNOWN OR ANONYMOUS")


def detect_duplicates_join(
    df: DataFrame,
    taxon_col: str = "taxonConceptID",
    year_col: str = "year",
    month_col: str = "month",
    day_col: str = "day",
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    collector_col: str = "recordedBy",
    record_number_col: str = "recordNumber",
    catalogue_col: str = "catalogNumber",
    id_col: str = "occurrenceID",
    druid_col: str = "dataResourceUid",
) -> DataFrame:
    """detect_duplicates with the O(n²) pairwise predicate moved to the
    JVM: a within-group self-join evaluates the spatial-ladder walk
    (isSpatialDuplicate, DuplicationDetection.scala:1122-1152, unrolled
    into null-safe-equality whens), the collector test as the BUILT-IN
    `levenshtein` over the prepared-and-truncated collector strings
    (:1074-1113), and the exact record/catalogue-number tests — all
    inside whole-stage codegen — so Python sees only (a) one linear
    Arrow pass computing the point ladder / prepared collector with the
    SAME helpers as the live kernel (bit parity by construction) and
    (b) the greedy claim walk per group over the surviving directed
    edges (find_group_duplicates(edges=...), typically a handful of
    rows). Output is identical to detect_duplicates — the parity test
    pins it — and the A/B at 20M rows decides which kernel ships on the
    occurrence hot path (SCALE.md).

    Scale shape: both self-join sides shuffle on the same group-key
    projection (one Exchange, reused), candidate pairs are bounded by
    the (taxon, day) group sizes exactly like the live kernel's
    per-group scan — no blocking key weaker than the reference's own
    grouping is introduced — and the edge relation entering the final
    cogroup is match-sized, not pair-sized."""
    import pandas as pd

    from biocache_store_spark.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    selected = _dedup_projection(
        df, taxon_col, year_col, month_col, day_col, lat_col, lon_col,
        collector_col, record_number_col, catalogue_col, id_col, druid_col,
    )

    prep_schema = T.StructType(
        list(selected.schema.fields)
        + [
            T.StructField("points", T.ArrayType(T.StringType())),
            T.StructField("prep_collector", T.StringType()),
            T.StructField("rn_norm", T.StringType()),
            T.StructField("cat_norm", T.StringType()),
        ]
    )

    def prep(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["points"] = [
                point_ladder(la, lo)
                for la, lo in zip(pdf["lat"], pdf["lon"])
            ]
            pdf["prep_collector"] = [
                None if c is None else _NON_ALNUM.sub("", c)
                for c in pdf["collector"]
            ]
            pdf["rn_norm"] = [
                None if v is None else v.strip().lower()
                for v in pdf["record_number"]
            ]
            pdf["cat_norm"] = [
                None if v is None else v.strip().lower()
                for v in pdf["catalogue_number"]
            ]
            yield pdf

    prepped = selected.mapInPandas(prep, schema=prep_schema)

    a = prepped.select(*[F.col(c).alias(f"a_{c}") for c in prepped.columns])
    b = prepped.select(*[F.col(c).alias(f"b_{c}") for c in prepped.columns])

    def E(x: F.Column, y: F.Column) -> F.Column:
        return x.eqNullSafe(y)

    def pa(i: int) -> F.Column:
        return F.col("a_points")[i]

    def pb(i: int) -> F.Column:
        return F.col("b_points")[i]

    # isSpatialDuplicate unrolled over the 6 ladder rungs: the walk stops
    # at the FIRST differing rung; null-safe equality reproduces Python's
    # None == None. The i+1 look-ahead's cross-ladder asymmetry
    # (pb(i) vs pa(i+1)) is the reference's own — see is_spatial_duplicate.
    spatial = F.when(~E(pa(0), pb(0)), F.lit(False))
    for i in range(1, 5):
        spatial = spatial.when(
            ~E(pa(i), pb(i)),
            (E(pa(i), pa(i - 1)) | E(pb(i), pb(i - 1)))
            & (E(pa(i), pa(i + 1)) | E(pb(i), pa(i + 1))),
        )
    spatial = spatial.when(
        ~E(pa(5), pb(5)), E(pa(5), pa(4)) | E(pb(5), pb(4))
    ).otherwise(F.lit(True))

    a_coll_empty = _empty_unknown_expr(F.col("a_collector"))
    b_coll_empty = _empty_unknown_expr(F.col("b_collector"))
    trunc_len = F.least(
        F.length("a_prep_collector"), F.length("b_prep_collector")
    )
    lev = F.levenshtein(
        F.col("a_prep_collector").substr(F.lit(1), trunc_len),
        F.col("b_prep_collector").substr(F.lit(1), trunc_len),
    )
    # type order mirrors the live appends: collector, field, catalogue
    coll_type = (
        F.when(b_coll_empty, F.lit(MISSING_COLLECTOR))
        .when(a_coll_empty, F.lit(None).cast("int"))
        .when(lev == 0, F.lit(EXACT_COLLECTOR))
        .when(lev <= COLLECTOR_LEVENSHTEIN_THRESHOLD, F.lit(FUZZY_COLLECTOR))
    )
    coll_dup = (
        a_coll_empty
        | b_coll_empty
        | F.coalesce(lev <= COLLECTOR_LEVENSHTEIN_THRESHOLD, F.lit(False))
    )

    def field_dup(name: str, norm: str) -> F.Column:
        a_raw, b_raw = F.col(f"a_{name}"), F.col(f"b_{name}")
        return (
            a_raw.isNotNull()
            & b_raw.isNotNull()
            & ~_empty_unknown_expr(a_raw)
            & ~_empty_unknown_expr(b_raw)
            & (F.col(f"a_{norm}") == F.col(f"b_{norm}"))
        )

    rn_dup = field_dup("record_number", "rn_norm")
    cat_dup = field_dup("catalogue_number", "cat_norm")
    types = F.array_compact(
        F.array(
            coll_type.cast("int"),
            F.when(rn_dup, F.lit(EXACT_FIELD_NUMBER)).cast("int"),
            F.when(cat_dup, F.lit(EXACT_CATALOGUE_NUMBER)).cast("int"),
        )
    )

    group_keys = ["g_taxon", "g_year", "g_month", "g_day"]
    edges = (
        a.join(
            b,
            [F.col(f"a_{k}") == F.col(f"b_{k}") for k in group_keys],
        )
        .where(F.col("a_row_key") != F.col("b_row_key"))
        .where(spatial & (coll_dup | rn_dup | cat_dup))
        .select(
            *[F.col(f"a_{k}").alias(k) for k in group_keys],
            F.col("a_row_key").alias("head_key"),
            F.col("b_row_key").alias("other_key"),
            types.alias("types"),
        )
    )

    schema = T.StructType(
        [
            T.StructField("taxon", T.StringType()),
            T.StructField("year", T.StringType()),
            T.StructField("month", T.StringType()),
            T.StructField("day", T.StringType()),
        ]
        + list(_OUT_FIELDS)
    )

    def assemble(records_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
        records = [
            DupRecord(
                row_key=row.row_key,
                druid=row.druid,
                year=row.g_year or None,
                month=row.g_month or None,
                day=row.g_day or None,
                lat=row.lat,
                lon=row.lon,
            )
            for row in records_pdf.itertuples()
        ]
        edge_map = {
            (h, o): [int(t) for t in ts]
            for h, o, ts in zip(
                edges_pdf["head_key"], edges_pdf["other_key"], edges_pdf["types"]
            )
        }
        out = find_group_duplicates(records, edges=edge_map)
        return pd.DataFrame(
            [
                {
                    "taxon": records_pdf["g_taxon"].iloc[0],
                    "year": records_pdf["g_year"].iloc[0],
                    "month": records_pdf["g_month"].iloc[0],
                    "day": records_pdf["g_day"].iloc[0],
                    "row_key": r.row_key,
                    "status": r.status,
                    "duplicate_of": r.duplicate_of,
                    "dup_types": sorted(set(r.dup_types)),
                    "precision": r.precision,
                }
                for r in out
            ]
        )

    # the record side of the cogroup is the RAW projection, not `prepped`:
    # assemble re-ladders each record once in DupRecord.__post_init__
    # (exactly the live kernel's construction cost), which keeps the
    # linear Python prep to the two join sides instead of three
    # evaluations of the mapInPandas subtree
    return (
        selected.groupBy(*group_keys)
        .cogroup(edges.groupBy(*group_keys))
        .applyInPandas(assemble, schema=schema)
    )


def modified_since(df: DataFrame, since: str, modified_col: str) -> DataFrame:
    """Rows whose `modified_col` is at or after `since`, compared AS
    TIMESTAMPS: string comparison is only correct for ISO-formatted
    values, and a store whose modified column arrived as e.g. `d/M/yyyy`
    strings would scope silently wrong. `since` is validated driver-side;
    a non-NULL stored value that does not parse as a timestamp fails
    loudly instead of silently dropping out of scope."""
    import datetime as _dt

    try:
        _dt.datetime.fromisoformat(since)
    except ValueError:
        raise ValueError(
            f"since={since!r} is not an ISO date/datetime "
            "(expected e.g. '2024-01-31' or '2024-01-31T12:00:00')"
        ) from None
    mod = F.col(modified_col)
    mod_ts = mod.cast("string").try_cast("timestamp")
    checked = F.when(
        mod.isNotNull() & mod_ts.isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"unparseable {modified_col} (not a timestamp): "),
                mod.cast("string"),
            )
        ).cast("timestamp"),
    ).otherwise(mod_ts)
    return df.filter(checked >= F.lit(since).cast("timestamp"))


def touched_taxa(
    df: DataFrame,
    since: str | None = None,
    modified_col: str = "lastModifiedTime",
    taxon_col: str = "taxonConceptID",
) -> DataFrame:
    """Distinct taxa owning records loaded/modified since `since` — the
    species list an incremental duplication-detection re-run must cover.
    (The reference's incremental filter is applied to the SUBSPECIES
    record downloads — IncrementalDuplicationDetection.scala:22-28
    appends `last_load_date:[since TO *]` to those download queries,
    truncating that taxon's record set; the semantics here are the
    stronger re-run-ALL-records-of-touched-taxa form, which is what the
    incremental==full merge invariant requires.) One distinct over the
    changed slice; `since=None` means every taxon (the --all run).
    Returns a one-column frame named `taxon`."""
    scoped = df
    if since is not None:
        scoped = modified_since(df, since, modified_col)
    return (
        scoped.filter(F.col(taxon_col).isNotNull())
        .select(F.col(taxon_col).cast("string").alias("taxon"))
        .distinct()
    )


def touched_record_ids(
    df: DataFrame,
    since: str | None = None,
    modified_col: str = "lastModifiedTime",
    id_col: str = "occurrenceID",
) -> DataFrame:
    """Distinct record ids modified since `since`, as a one-column frame
    named `row_key` — the join side for `reassigned_taxa`."""
    scoped = df
    if since is not None:
        scoped = modified_since(df, since, modified_col)
    return (
        scoped.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).cast("string").alias("row_key"))
        .distinct()
    )


def reassigned_taxa(previous: DataFrame, changed_ids: DataFrame) -> DataFrame:
    """The OLD taxa of records that may have moved species: taxa owning
    rows in the standing duplicate store (`previous`) for any changed
    record id (`changed_ids`, one `row_key` column).

    A re-delivered/reprocessed record can carry a NEW taxonConceptID; the
    upserted occurrence store then only shows the new taxon, but the
    standing duplicate store still holds the record under its old one.
    Scoping the re-detection by the changed records' CURRENT taxa alone
    would leave that old taxon's clusters stale (a duplicate row_key
    under the old taxon, and un-recomputed statuses for the records that
    remain there). Union these taxa into the scope so the old species'
    clusters are recomputed too — that is what keeps incremental == full.
    The semi join broadcasts the changed-id side when it is batch-sized.

    NULL taxa are dropped: a NULL-group row is never detected, so it must
    never enter the scope either — merge's null-SAFE anti-join would drop
    previous NULL-group rows wholesale while the null-UNSAFE scope
    semi-join/isin re-detects nothing to replace them (silent row loss
    from an externally supplied store)."""
    ids = changed_ids.select(F.col("row_key").cast("string").alias("row_key"))
    return (
        previous.join(ids, "row_key", "left_semi")
        .filter(F.col("taxon").isNotNull())
        .select(F.col("taxon").cast("string").alias("taxon"))
        .distinct()
    )


#: scope lists at or under this size are collected and pushed as a STATIC
#: isin partition filter; larger lists fall back to the semi join
SCOPE_STATIC_MAX = 10_000


def scope_to_groups(
    df: DataFrame,
    groups: DataFrame,
    col_name: str,
    group_col: str | None = None,
    max_static: int | None = SCOPE_STATIC_MAX,
) -> DataFrame:
    """Restrict `df` to rows whose `col_name` appears in `groups`.

    An incremental re-run's scope list is dim-sized by construction (the
    species touched by one ingest), but a left-semi join against it does
    NOT partition-prune a `partitionBy(taxon)` store — Spark's dynamic
    partition pruning declines unfiltered dim sides, so the scoped scan
    silently reads every file (measured: PartitionFilters carries only
    isnotnull). When the list fits `max_static`, collect it and push a
    static `isin` — that lands in PartitionFilters and the scan touches
    ONLY the touched groups' files, which is the property DEPLOY.md's
    store-layout table promises. Larger lists (the --all run) fall back
    to the semi join. The collect is bounded by max_static + 1 rows —
    the same dim-sized-collect class as the layer/centroid dims."""
    key = group_col or col_name
    # BOTH paths compare as strings, like the original semi join — a
    # native-typed isin would coerce differently (int 7 matching '07')
    # and results would silently change when a scope list crosses the
    # static threshold. A cast over a partition column still lands in
    # PartitionFilters (pruning evaluates any partition-column-only
    # predicate), which the pin test asserts.
    if max_static is not None:
        rows = (
            groups.select(F.col(key).cast("string"))
            .limit(max_static + 1)
            .collect()
        )
        # truncation test on the RAW collected count, BEFORE dropping
        # NULLs: a page of max_static+1 rows means the scope list was
        # truncated, and building the isin from it would silently drop
        # scope groups (breaking incremental == full) whenever the
        # dropped NULLs masked the overflow
        if len(rows) <= max_static:
            vals = [r[0] for r in rows if r[0] is not None]  # NULL never matches
            return df.filter(F.col(col_name).cast("string").isin(vals))
    scope = groups.select(F.col(key).cast("string").alias("__scope_key"))
    return df.join(
        scope,
        F.col(col_name).cast("string") == F.col("__scope_key"),
        "left_semi",
    )


def detect_duplicates_scoped(
    df: DataFrame,
    taxa: DataFrame,
    taxon_col: str = "taxonConceptID",
    **kwargs,
) -> DataFrame:
    """Duplicate detection restricted to the given taxa (`taxon` column).

    Duplicate clusters are strictly within-taxon (the group key leads
    with the lsid), so running the detector over ALL records of ONLY the
    touched species reproduces exactly the full run's rows for those
    species. (This is deliberately STRONGER than the reference's
    incremental mode: IncrementalDuplicationDetection.scala:22-28
    appends `last_load_date:[since TO *]` to the SUBSPECIES record
    downloads, truncating that taxon's record set — which can miss
    duplicates pairing a new record with an old one; re-running the
    touched taxon's complete records is what makes incremental == full
    hold exactly.) The scope filter is `scope_to_groups`: a static isin
    when the species list is dim-sized — which PARTITION-PRUNES a
    taxon-partitioned store, unlike the semi join — with a broadcast
    semi-join fallback for huge lists; at 100 TB an ingest touches a
    tiny fraction of taxa, so the re-run cost is proportional to the
    CHANGED species' FILES, not the corpus."""
    scoped = scope_to_groups(df, taxa, taxon_col, group_col="taxon")
    return detect_duplicates(scoped, taxon_col=taxon_col, **kwargs)


def merge_dedup_results(
    previous: DataFrame, incremental: DataFrame, taxa: DataFrame
) -> DataFrame:
    """Fold an incremental re-run into the standing duplicate store:
    previous rows for the touched taxa are dropped wholesale (their
    clusters were recomputed from scratch — including records that LEFT
    a cluster, the obsolete-revert case `anti_join_obsolete` applies to
    the occurrence store) and the re-run rows take their place. Rows for
    untouched taxa pass through unchanged, so merge(full-run-at-T0,
    incremental-since-T0) == full-run-now for any store whose changes
    all carry a modified time.

    Callers deriving `taxa` from changed records must include the
    records' OLD taxa too (see `reassigned_taxa`) — otherwise a record
    that moved species leaves its old taxon's clusters stale. As a
    safety net against exactly that, previous rows whose row_key
    reappears in the incremental result are also dropped (the full
    recompute would never emit a record under two taxa), so even a
    batch-only scope cannot produce duplicate row_keys — though the old
    taxon's REMAINING records still need the scope fix to be recomputed."""
    scope = taxa.select(F.col("taxon").cast("string").alias("__scope_taxon"))
    kept = previous.join(
        scope, previous["taxon"] == F.col("__scope_taxon"), "left_anti"
    )
    cols = kept.columns
    kept = kept.join(
        incremental.select("row_key").distinct(), "row_key", "left_anti"
    ).select(*cols)  # the name-keyed join moves row_key first; restore order
    return kept.unionByName(incremental)


def duplicate_markup(dup_results: DataFrame) -> DataFrame:
    """Per-record duplication columns from a duplicate-store result —
    what DuplicationDetection writes onto each occ record for indexing
    (tool/DuplicationDetection.scala:588-633): the representative gets
    duplicationStatus 'R' and associatedOccurrences = its members
    pipe-joined; each duplicate gets 'D', associatedOccurrences = the
    representative's id, and duplicationType = its dup-type ids (the
    reference stores a JSON array string; here pipe-joined, which the
    index projection's multivalue splitter consumes directly).
    Untested/unique records ('U') produce no markup row.

    SINGLE-PASS shape (r12): the earlier form split dup_results into
    three plan branches (members aggregation, the rep join, the dup
    projection), so the expensive detection kernel feeding it recomputed
    per branch — measured 3x the kernel cost in duplicate_markup_writeback
    at sf0.1. One window over the cluster key (`coalesce(duplicate_of,
    row_key)`: R rows carry duplicate_of=NULL and D rows point at their
    representative, the kernel's realignment invariant) computes the
    member list alongside every row, so dup_results is consumed by
    exactly ONE plan branch and the join disappears. Row-identical to
    the join form: an R row whose cluster has no D members gets a NULL
    member list (the left-join-miss semantics), never ''."""
    from pyspark.sql.window import Window

    base = dup_results.filter(F.col("status").isin("R", "D1", "D2")).withColumn(
        "__cluster", F.coalesce("duplicate_of", "row_key")
    )
    members = F.sort_array(
        F.collect_list(
            F.when(F.col("status") != "R", F.col("row_key"))
        ).over(Window.partitionBy("__cluster"))
    )
    is_rep = F.col("status") == "R"
    return base.withColumn("__members", members).select(
        "row_key",
        F.when(is_rep, F.lit("R")).otherwise(F.lit("D")).alias(
            "duplicationStatus"
        ),
        F.when(
            is_rep,
            F.when(F.size("__members") > 0, F.array_join("__members", "|")),
        )
        .otherwise(F.col("duplicate_of"))
        .alias("associatedOccurrences"),
        F.when(
            ~is_rep,
            F.array_join(
                F.transform(F.col("dup_types"), lambda t: t.cast("string")), "|"
            ),
        ).alias("duplicationType"),
    )


def obsolete_duplicate_records(
    previous: DataFrame, current: DataFrame
) -> DataFrame:
    """Record ids duplicate-marked (R or D) in the previous result but no
    longer in the current one — revertNonDuplicateRecords' diff
    (DuplicationDetection.scala:754-763: delete the three duplication
    columns, remove the INFERRED_DUPLICATE_RECORD assertion)."""
    marked = lambda d: (  # noqa: E731
        d.filter(F.col("status") != "U").select("row_key").distinct()
    )
    return marked(previous).join(marked(current), "row_key", "left_anti")


def apply_duplicate_markup(
    store: DataFrame,
    dup_results: DataFrame,
    reverts: DataFrame | None = None,
    key_col: str = "rowKey",
    assertions_col: str = "assertions",
) -> DataFrame:
    """Mark up a processed store with duplicate-detection results — the
    write-back DuplicationDetection does per record (:588-651) and the
    revert (:754-763), as one join pass:

      * records in the markup get duplicationStatus / associatedOccurrences
        / duplicationType set (replacing any previous values), and 'D'
        records additionally get a failed INFERRED_DUPLICATE_RECORD
        assertion ('Record has been inferred as closely related to <rep>'),
        replacing any existing entry of that code;
      * records in `reverts` (see obsolete_duplicate_records) get the
        three columns cleared and the assertion REMOVED — the reference
        deletes the column and calls removeSystemAssertion, unlike the
        outlier reset which flips to passed;
      * everything else passes through verbatim.

    The markup lands in `_p`-SUFFIXED columns (duplicationStatus_p,
    associatedOccurrences_p, duplicationType_p) — the flat-store twin of
    the reference's ":p" (processed) column qualifier — so the RAW DwC
    `associatedOccurrences` term a record may legitimately carry is
    never read as, or clobbered by, detection output.

    `dup_results` accepts the raw duplicate store (markup derived via
    duplicate_markup) or a pre-built markup frame."""
    from biocache_store_spark.processors.assertions import (
        FAILED,
        AssertionCodes,
    )

    if "duplicationStatus" not in dup_results.columns:
        markup = duplicate_markup(dup_results)
    else:
        markup = dup_results
    markup = markup.select(
        F.col("row_key").alias("__dm_key"),
        F.col("duplicationStatus").alias("__dm_status"),
        F.col("associatedOccurrences").alias("__dm_assoc"),
        F.col("duplicationType").alias("__dm_types"),
    )
    out = store.join(
        markup, store[key_col] == F.col("__dm_key"), "left"
    ).drop("__dm_key")
    if reverts is not None:
        rv = reverts.select(
            F.col("row_key").alias("__rv_key"), F.lit(True).alias("__revert")
        )
        out = out.join(rv, out[key_col] == F.col("__rv_key"), "left").drop(
            "__rv_key"
        )
    else:
        out = out.withColumn("__revert", F.lit(None).cast("boolean"))

    def updated(col_name: str, new_val) -> F.Column:
        existing = (
            F.col(col_name)
            if col_name in store.columns
            else F.lit(None).cast("string")
        )
        return (
            F.when(F.col("__dm_status").isNotNull(), new_val)
            .when(F.col("__revert"), F.lit(None).cast("string"))
            .otherwise(existing)
        )

    out = (
        out.withColumn(
            "duplicationStatus_p",
            updated("duplicationStatus_p", F.col("__dm_status")),
        )
        .withColumn(
            "associatedOccurrences_p",
            updated("associatedOccurrences_p", F.col("__dm_assoc")),
        )
        .withColumn(
            "duplicationType_p", updated("duplicationType_p", F.col("__dm_types"))
        )
    )
    code = AssertionCodes.INFERRED_DUPLICATE_RECORD.code
    name = AssertionCodes.INFERRED_DUPLICATE_RECORD.name
    existing_arr = F.coalesce(
        F.col(assertions_col),
        F.array().cast(store.schema[assertions_col].dataType),
    )
    cleaned = F.filter(existing_arr, lambda a: a["code"] != F.lit(code))
    dup_assertion = F.struct(
        F.lit(code).alias("code"),
        F.lit(name).alias("name"),
        F.lit(FAILED).alias("qa_status"),
        F.concat(
            F.lit("Record has been inferred as closely related to "),
            F.col("__dm_assoc"),
        ).alias("comment"),
    )
    new_assertions = (
        F.when(
            F.col("__dm_status") == "D", F.array_append(cleaned, dup_assertion)
        )
        .when(
            F.col("__dm_status").isNotNull() | F.coalesce(F.col("__revert"), F.lit(False)),
            cleaned,  # R rows and reverts carry no duplicate assertion
        )
        .otherwise(F.col(assertions_col))
    )
    return out.withColumn(assertions_col, new_assertions).drop(
        "__dm_status", "__dm_assoc", "__dm_types", "__revert"
    )
