"""Hot-key (skew) handling for shuffle equi-joins.

AQE's skew-join handles most skew by splitting oversized sort-merge
partitions at runtime (enabled in session.py). Salting is the explicit
fallback for the shapes AQE can't fix: a SINGLE join key carrying a large
fraction of all rows (one shuffle partition stays hot no matter how it's
split when downstream needs the key co-located), forced shuffle_hash
joins, and pre-AQE engines. The reference meets the same problem as
"group by species then thread-per-year inside the group"
(tool/DuplicationDetection.scala:432-448) — salting is the declarative
equivalent: widen the key, join, forget the salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _xxhashable(dt) -> bool:
    """xxhash64 rejects MapType anywhere inside a column's type."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _xxhashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_xxhashable(f.dataType) for f in dt.fields)
    return True


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join where `skewed` has hot keys: the skewed side gets a
    deterministic salt in [0, salt), `other` is replicated `salt` times,
    and the join runs on (key, salt) — one hot key now spreads over
    `salt` shuffle partitions.

    Result is row-identical to `skewed.join(other, on, how)` for `inner`
    and `left` joins (the replicated side never emits unmatched rows).
    `right`/`full`/semi/anti would duplicate or miscount unmatched
    `other` rows — rejected. The salt is a hash of the skewed side's
    whole row (xxhash64), not rand(): deterministic under retries and
    speculative execution, which rand() is not.

    Cost model: `other` is shuffled `salt` times over — so salt the join
    whose other side is small-but-not-broadcastable, and keep `salt` at
    the hot key's observed partition-size multiple, not higher.

    The salt hashes only HASHABLE columns (xxhash64 rejects MapType
    anywhere in a column's type, so map-bearing columns are excluded).
    Corollary of determinism: rows identical in every hashable column
    share a salt and do NOT spread — that is the price of retry-stable
    salting, and such fully-duplicate hot rows should be aggregated
    before the join anyway.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: "
            "replicating the other side breaks unmatched-row semantics "
            "for right/full/semi/anti"
        )
    hash_cols = [
        f.name for f in skewed.schema.fields if _xxhashable(f.dataType)
    ]
    if not hash_cols:
        raise ValueError(
            "salted_join: no hashable columns on the skewed side "
            "(every column carries a MapType)"
        )
    salted = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*hash_cols), F.lit(salt))
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("long"))
    return salted.join(replicated, keys + [SALT_COL], how).drop(SALT_COL)
