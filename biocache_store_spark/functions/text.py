"""Text-analysis Column expressions for the documents surface.

Token counting, shingling, quality ratios, fingerprints — all built-in
functions (split/regexp/transform/hash), no Python in the hot path. These
generalize the reference's parser layer (biocache-store keeps all text
processing record-local: parser/*.scala) into the operators a training-data
pipeline needs over a 100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE = r"\s+"


def words(text: Column) -> Column:
    """Lower-cased whitespace tokens of a trimmed text column."""
    return F.split(F.lower(F.trim(text)), WHITESPACE)


def token_count(text: Column) -> Column:
    return F.size(words(text))


def word_shingles(ws: Column, n: int = 3) -> Column:
    """Distinct contiguous n-word shingles (space-joined) of a token array.

    Used as the shingle set for n-gram Jaccard and as MinHash input.
    Returns an empty array when the document has fewer than n tokens.
    """
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(ws) >= n, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric or whitespace."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def fingerprint(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint (xxhash64 of normalized text).

    The normalization (trim + lowercase + whitespace collapse) mirrors the
    reference's vocabulary-normalization habit (vocab/Vocab.scala:51-80)
    applied at document granularity.
    """
    normalized = F.regexp_replace(F.lower(F.trim(text)), WHITESPACE, " ")
    return F.xxhash64(normalized)
