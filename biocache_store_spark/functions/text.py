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


def shingle_df(
    docs,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_count: bool = False,
):
    """Exploded (id[, n_sh], shingle) DataFrame with the token array
    materialized as a real column first.

    `with_count=True` carries the per-document distinct-shingle count on
    every exploded row, so similarity joins get both denominators from the
    join itself — no separate counts branch, broadcast, or cache (branch
    materialization under concurrent broadcast threads measured wildly
    variable: 4-31s for the same sf0.1 query).

    Two performance traps measured at sf0.1 (see git history):
    * building shingles inline re-splits the text inside every element_at
      of the transform lambda — materialize `toks` as a column first;
    * plain explode() makes Catalyst infer a `size(expr)>0 AND
      isnotnull(expr)` filter with the WHOLE higher-order expression
      inlined twice, and lambda expressions run interpreted (no codegen):
      ~19s for 5000 docs. explode_outer() skips the inferred filter; the
      null rows it emits for empty arrays are removed by a cheap filter on
      the generated attribute instead (21s -> 0.9s).
    """
    toks = docs.select(id_col, words(F.col(text_col)).alias("toks"))
    arrs = toks.select(id_col, word_shingles(F.col("toks"), n).alias("shs"))
    cols = [id_col]
    if with_count:
        cols.append(F.size("shs").alias("n_sh"))
    return arrs.select(*cols, F.explode_outer("shs").alias("sh")).filter(
        F.col("sh").isNotNull()
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
