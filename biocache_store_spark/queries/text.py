"""Text-analysis + dedup queries over the documents table.

These are the training-data-pipeline operators (BASELINE.json north star)
layered on the same engine: exact dedup via content hash, n-gram Jaccard
near-dup pairs, token/quality statistics, fingerprinting. Everything here is
built-in expressions (split/regexp/md5/xxhash64/explode) — no Python UDFs —
so the plans stay in whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biocache_store_spark.functions.text import shingle_df, token_count
from biocache_store_spark.io import read_table
from biocache_store_spark.queries import register


@register(
    "text_token_stats",
    doc=(
        "Token counting + length stats per document — the parser-layer "
        "statistics shape (parser/*.scala) at document granularity."
    ),
    oracle=r"""
        SELECT doc_id,
               length(text) AS n_chars_measured,
               len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
               lang, source
        FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        token_count(F.col("text")).alias("n_tokens"),
        "lang",
        "source",
    )


@register(
    "text_quality_stats",
    doc=(
        "Quality-scoring aggregate per source: mean token count and mean "
        "token length — the facet+stats shape used for corpus quality "
        "dashboards."
    ),
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, source,
                   len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
                   length(text) AS n_chars
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               ROUND(AVG(n_tokens), 4) AS avg_tokens,
               ROUND(AVG(n_chars), 4) AS avg_chars,
               ROUND(AVG(n_chars * 1.0 / n_tokens), 4) AS avg_chars_per_token
        FROM toks GROUP BY source
    """,
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(F.col("n_chars") / F.col("n_tokens")), 4).alias(
            "avg_chars_per_token"
        ),
    )


@register(
    "exact_dedup",
    doc=(
        "Exact deduplication by content hash — the MD5 media-dedup pattern "
        "(load/MediaStore.scala:234-285) applied to text: hash-groupBy, "
        "representative = min key (deterministic first-wins, cf. "
        "DuplicationDetection.scala:874-926)."
    ),
    bench=True,
    oracle="""
        SELECT doc_id,
               md5(text) AS content_hash,
               (doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))) AS is_representative,
               COUNT(*) OVER (PARTITION BY md5(text)) AS group_size
        FROM documents
    """,
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "content_hash", F.md5("text")
    )
    w = Window.partitionBy("content_hash")
    return docs.select(
        "doc_id",
        "content_hash",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_representative"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    )


@register(
    "ngram_jaccard_pairs",
    doc=(
        "Near-duplicate pairs by word-3-gram Jaccard >= 0.5 — the generalized "
        "form of the reference's grouped fuzzy dedup "
        "(tool/DuplicationDetection.scala:966-1013). Distinct shingles are "
        "exploded and pairs built by shingle-equality join (the blocking "
        "key), so only documents sharing at least one shingle are compared — "
        "never an all-pairs product."
    ),
    bench=True,
    oracle=r"""
        WITH w AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM documents
        ),
        idx AS (
            SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
            FROM w
        ),
        shingles AS (
            SELECT DISTINCT doc_id,
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
            FROM idx
        ),
        counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM shingles a JOIN shingles b
              ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               ROUND(n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common), 4) AS jaccard
        FROM pairs
        JOIN counts ca ON ca.doc_id = doc_a
        JOIN counts cb ON cb.doc_id = doc_b
        WHERE n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common) >= 0.5
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    # n_sh rides along on every exploded row, so the self-join alone yields
    # intersection count AND both denominators in one shuffle — no counts
    # branch, no broadcast, no cache.
    shingles = shingle_df(docs, 3, with_count=True)
    a = shingles.alias("a")
    # shuffle-hash, not broadcast: the build side is the same-sized shingle
    # relation, not a small dim — broadcasting it costs a driver collect +
    # hash build (measured 10.8s vs 2.0s at sf0.1) and is impossible at
    # corpus scale, where this co-partitioned join is the only shape that
    # survives.
    b = shingles.hint("shuffle_hash").alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_sh_a"),
            F.col("b.n_sh").alias("n_sh_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jaccard = F.col("n_common") / (
        F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common")
    )
    # coalesce keeps the threshold filter null-tolerant: a plain
    # `jaccard >= 0.5` lets Catalyst infer isnotnull(n_sh) and push it to
    # the scan with the whole higher-order shingle expression inlined —
    # lambdas run interpreted there, measured ~19s per join side at sf0.1.
    return pairs.filter(F.coalesce(jaccard, F.lit(-1.0)) >= 0.5).select(
        "doc_a", "doc_b", F.round(jaccard, 4).alias("jaccard")
    )


@register(
    "text_fingerprint",
    doc=(
        "Deterministic 64-bit document fingerprint over normalized text "
        "(whitespace-collapse + lowercase), the cheap pre-filter for dedup "
        "pipelines. xxhash64 is Spark-specific, so the oracle checks the "
        "normalization + grouping semantics via duplicate-count parity on "
        "the normalized text itself."
    ),
    oracle=r"""
        SELECT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm_text,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS representative
        FROM documents
        GROUP BY 1
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.groupBy(norm.alias("norm_text")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("representative"),
    )
