"""SimHash document fingerprinting.

Charikar-style similarity hashing over the shingle set: each shingle votes
+-1 on every bit position; the fingerprint takes the sign of each bit-sum.
Near-duplicate documents differ in few bits (Hamming distance).

Determinism-for-verification design (same philosophy as operators/minhash):
bit b of a shingle's hash is `md5(shingle)[b] >= '8'` — the high bit of each
hex nibble — giving 32 bit positions that every engine computes identically,
so fingerprints have an exact ANSI-SQL oracle. The fingerprint is emitted as
a 32-char '0'/'1' string to stay engine-neutral (no 64-bit signedness
traps).

All expressions are built-in (md5/substring/aggregate/transform); the md5
array is materialized per document first so codegen doesn't recompute the
hash per bit position.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from biocache_store_spark.functions.text import text_shingles

SIMHASH_BITS = 32


def simhash_bits_from_hashes(md5_array: Column, bits: int = SIMHASH_BITS) -> Column:
    """'0'/'1' fingerprint string from an array of md5 hex strings."""
    return F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda b: F.when(
                F.aggregate(
                    md5_array,
                    F.lit(0),
                    lambda acc, h: acc
                    + F.when(F.substring(h, b + 1, 1) >= "8", 1).otherwise(-1),
                )
                > 0,
                "1",
            ).otherwise("0"),
        ),
    )


def simhash(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(id, n_sh, simhash bit-string) per document with >= n tokens."""
    from biocache_store_spark.util import ensure_min_parallelism

    if not 1 <= bits <= 32:
        # bit b reads the (b+1)-th md5 hex nibble: past 32 the substring
        # is empty and every extra bit silently becomes a constant '0'
        raise ValueError("simhash: bits must be in 1..32 (one md5 nibble per bit)")

    docs = ensure_min_parallelism(docs.select(id_col, text_col))
    arrs = docs.select(
        id_col, text_shingles(F.col(text_col), n).alias("shs")
    ).filter(F.size("shs") > 0)
    hashed = arrs.select(
        id_col,
        F.size("shs").alias("n_sh"),
        F.transform(F.col("shs"), lambda s: F.md5(s)).alias("hs"),
    )
    return hashed.select(
        id_col,
        "n_sh",
        simhash_bits_from_hashes(F.col("hs"), bits).alias("simhash"),
    )


def hamming_distance(a: Column, b: Column, bits: int = SIMHASH_BITS) -> Column:
    """Hamming distance between two bit-string fingerprints."""
    return F.aggregate(
        F.zip_with(
            F.split(a, "(?!$)"), F.split(b, "(?!$)"), lambda x, y: (x != y).cast("int")
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def hamming_expr(a: Column, b: Column, bits: int = SIMHASH_BITS) -> Column:
    """Hamming distance between two '0'/'1' fingerprint strings as a static
    unrolled sum — whole-stage codegen, engine-neutral."""
    terms = [
        (F.substring(a, i + 1, 1) != F.substring(b, i + 1, 1)).cast("int")
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def simhash_near_duplicates(
    docs: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, band-blocked.

    The fingerprint splits into `bands` equal substrings; candidates share
    at least one band. By pigeonhole, any pair with Hamming distance
    <= bands-1 MUST share a band, so for max_hamming < bands this
    band-blocked result EQUALS the exact all-pairs result — blocking here
    is a pure cost optimization, not a recall trade (unlike minhash LSH).
    `max_bucket_size` is the same hot-bucket guard as the minhash join
    (dropping viral buckets does sacrifice the completeness guarantee for
    pairs connected only through them).

    Returns (doc_a, doc_b, hamming).
    """
    if bands < 1 or bits % bands:
        # bands > bits would give band_len 0 -> empty band_str for every
        # doc -> one mega-bucket and an O(n^2) join (the banded_keys
        # guard, same failure class)
        raise ValueError(
            f"simhash_near_duplicates: bands ({bands}) must divide bits ({bits})"
        )
    band_len = bits // bands
    # pack the '0'/'1' fingerprint into ONE long (bits <= 32 < 64, so
    # conv base-2 is exact): candidates then carry 8 bytes instead of a
    # 32-char string through the posting collect and the pair explode,
    # and the Hamming distance becomes a single bit_count(xor) instead of
    # `bits` substring comparisons per candidate pair (guide §2.3 —
    # shuffle/carry fewer bytes, cheaper per-pair work; measured 2.5x on
    # the full query at sf0.1, identical output).
    sh = simhash(docs, n, id_col, text_col, bits).withColumn(
        "__h", F.conv(F.col("simhash"), 2, 10).cast("long")
    )
    banded = sh.select(
        F.col(id_col),
        F.col("__h"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.substring(
                        F.col("simhash"), b * band_len + 1, band_len
                    ).alias("band_str"),
                ),
            )
        ).alias("bs"),
    ).select(id_col, "__h", F.col("bs.band"), F.col("bs.band_str"))
    if max_bucket_size is not None:
        # count-first + left-semi, not a window: the guard must never
        # shuffle a viral bucket into one task just to count it (the
        # minhash._cap_buckets discipline)
        ok = (
            banded.groupBy("band", "band_str")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
        banded = banded.join(
            ok.hint("shuffle_hash"), ["band", "band_str"], "left_semi"
        )
    # POSTING-LIST pair generation (the lsh_candidates r5 shape): collect
    # (id, simhash) structs per bucket and double-explode — singleton
    # buckets (the vast majority) drop before any pair work, and no
    # self-join shuffles every banded row twice
    posting = (
        banded.groupBy("band", "band_str")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("i"), F.col("__h").alias("h"))
            ).alias("ids")
        )
        .filter(F.size("ids") >= 2)
    )
    # Hamming filter BEFORE the dedup exchange: a viral band value makes
    # candidate pairs quadratic in its bucket size (202k pairs from 2k
    # docs at sf0.1), while max_hamming keeps a few hundred — filtering
    # first means the distinct shuffles survivors, not the candidate
    # flood. A pair sharing k bands is scored k times (<= bands), but a
    # bit_count(xor) per duplicate costs far less than exchanging every
    # candidate row. hamming is a pure function of the pair, so the
    # distinct-after-filter result set is unchanged.
    pairs = (
        posting.select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a.i") < F.col("b.i"))
    )
    ham = F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h")))
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.i").alias("doc_a"),
            F.col("b.i").alias("doc_b"),
            "hamming",
        )
        .distinct()
    )
