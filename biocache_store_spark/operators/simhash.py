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

from biocache_store_spark.functions.text import word_shingles, words

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
    toks = docs.select(id_col, words(F.col(text_col)).alias("toks"))
    arrs = toks.select(
        id_col, word_shingles(F.col("toks"), n).alias("shs")
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
