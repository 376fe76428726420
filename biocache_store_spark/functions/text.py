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
    """Lower-cased whitespace tokens of a trimmed text column.

    Whitespace is collapsed BEFORE the edge-trim so leading/trailing tabs
    and newlines cannot mint phantom '' tokens (plain trim() removes only
    spaces, and Java split keeps trailing empties) — found by the
    adversarial shingle corpus test. Empty/whitespace-only text still
    yields [''] (the established token_count contract).
    """
    return F.split(F.trim(F.regexp_replace(F.lower(text), WHITESPACE, " ")), " ")


def token_count(text: Column) -> Column:
    return F.size(words(text))


def word_shingles(ws: Column, n: int = 3) -> Column:
    """Distinct contiguous n-word shingles (space-joined) of a token array.

    Array-based formulation (transform lambda). NOTE: Spark 4 evaluates
    higher-order lambdas INTERPRETED — in hot paths prefer
    `text_shingles`, which produces the identical set through codegen'd
    regex expressions (bit-identical output verified in tests). Kept for
    callers that already hold a token array.
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


def text_shingles(text: Column, n: int = 3) -> Column:
    """Distinct contiguous n-word shingles straight from the text column.

    Equivalent to `word_shingles(words(text), n)` (one edge apart: for
    n=1 an EMPTY/whitespace-only text yields [] here but [''] through
    words()+word_shingles — the '' token survives that path; the n>=2
    forms used everywhere in this repo are bit-identical) but expressed with
    regexp_replace + regexp_extract_all — native codegen'd expressions,
    no interpreted lambda. Overlapping windows come from a lookahead
    capture anchored at each token: `(?=(tok tok tok))tok ` captures the
    n-token window then consumes one token, so the scan advances word by
    word. Measured 15x faster cold than the lambda form at sf0.1 (the
    interpreted evaluator is also the wrong thing to JIT-warm on a 100 TB
    scan). For n=1 the trailing-space consumer would drop the last token,
    so that case is distinct tokens directly.
    """
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    if n == 1:
        toks = F.split(norm, " ")
        return F.when(norm == "", F.array().cast("array<string>")).otherwise(
            F.array_distinct(toks)
        )
    pattern = r"(?=(" + r"\S+ " * (n - 1) + r"\S+))\S+ "
    return F.array_distinct(F.regexp_extract_all(norm, F.lit(pattern), 1))


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

    Three performance traps measured at sf0.1 (see git history):
    * building shingles inline re-splits the text inside every element_at
      of the transform lambda — materialize `toks` as a column first;
    * plain explode() makes Catalyst infer a `size(expr)>0 AND
      isnotnull(expr)` filter with the WHOLE higher-order expression
      inlined twice, and lambda expressions run interpreted (no codegen):
      ~19s for 5000 docs. explode_outer() skips the inferred filter; the
      null rows it emits for empty arrays are removed by a cheap filter on
      the generated attribute instead (21s -> 0.9s);
    * a small corpus read as ONE parquet split runs the whole interpreted
      shingle transform on one core — and when the signature relation is
      rebuilt inside broadcast-exchange threads, that single cold task is
      the entire build (measured 4-31s variance for the same sf0.1 query).
      `ensure_min_parallelism` fans the map out first; at real corpus
      scale the scan already has more splits than cores and it's a no-op.
    """
    from biocache_store_spark.util import ensure_min_parallelism

    # project to the two needed columns BEFORE the fan-out repartition so
    # the (usually no-op) shuffle never carries unused columns
    docs = ensure_min_parallelism(docs.select(id_col, text_col))
    arrs = docs.select(id_col, text_shingles(F.col(text_col), n).alias("shs"))
    cols = [id_col]
    if with_count:
        cols.append(F.size("shs").alias("n_sh"))
    return arrs.select(*cols, F.explode_outer("shs").alias("sh")).filter(
        F.col("sh").isNotNull()
    )


def punct_ratio(text: Column) -> Column:
    r"""Fraction of characters that are not ASCII alphanumeric or
    whitespace. The ASCII class is INTENTIONAL: Unicode \p{L} tables can
    differ between Spark's Java regex and DuckDB's RE2, which would break
    the engine-exact oracles — the cost is that accented letters count as
    'punctuation', so quality thresholds built on this ratio should be
    tuned per-language (or gate on langid first) for non-English text."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def fingerprint(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint (xxhash64 of normalized text).

    The normalization (lowercase + whitespace collapse, THEN trim)
    mirrors the reference's vocabulary-normalization habit
    (vocab/Vocab.scala:51-80) at document granularity. Collapse-before-
    trim matters: Spark's trim strips only spaces, so trailing tabs/
    newlines would otherwise survive into the hash and 'abc' vs 'abc\n'
    would fingerprint differently — the same trap words() documents.
    """
    normalized = F.trim(F.regexp_replace(F.lower(text), WHITESPACE, " "))
    return F.xxhash64(normalized)


# GPT-2-style pre-tokenizer, RE2-compatible subset: contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs. The upstream
# pattern's `\s+(?!\S)` lookahead is dropped (RE2 has no lookahead; the
# scanner skipping unmatched whitespace gives the same token LIST — only
# standalone-whitespace tokens disappear, which a counter wants anyway).
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization (the merge-free first stage of a GPT-2
    tokenizer): case-preserving, space-prefix-aware token pieces. A
    codegen'd regexp_extract_all — and byte-identical in DuckDB's RE2,
    so counts built on it stay oracle-exact."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    """Pre-tokenizer piece count — the cheap upper-bound proxy for BPE
    token budgets (every merge only shrinks the count)."""
    return F.size(bpe_tokens(text))
