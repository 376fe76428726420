"""Training-corpus curation queries: decontamination, chunking, sampling,
packing, TF-IDF — the pre-training data operations layered on the engine
beyond near-dup removal (see queries/text.py `corpus_curation` for the
quality->language->dedup pipeline these compose with).

Everything is deterministic (md5 hashing, doc_id ordering, rational
arithmetic only — no transcendentals) so every query has an EXACT DuckDB
oracle; float outputs are rounded in-query on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biocache_store_spark.io import read_table
from biocache_store_spark.queries import register
from biocache_store_spark.util import local_rows_df

# words(text) in DuckDB — keep in sync with functions/text.py `words`
_TOKS = r"string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')"


def _hashed_feature_cte(carry: str) -> str:
    """The tokenize -> unigram/bigram -> md5-bucket CTE chain shared by
    the DSIR and NB oracles (mirrors operators/curation.py
    hashed_feature_buckets); `carry` is the documents attribute carried
    through the explode (the DSIR source split / the NB label)."""
    return rf"""w AS (
            SELECT doc_id, {carry},
                   list_filter({_TOKS}, t -> t <> '') AS toks
            FROM documents
        ),
        uni AS (
            SELECT doc_id, {carry}, 'u|' || t AS f
            FROM (SELECT doc_id, {carry}, unnest(toks) AS t FROM w)
        ),
        bi AS (
            SELECT doc_id, {carry}, 'b|' || toks[i] || ' ' || toks[i+1] AS f
            FROM (SELECT doc_id, {carry}, toks,
                         unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i
                  FROM w)
        ),
        feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        bucketed AS (
            SELECT doc_id, {carry}, substr(md5(f), 1, 3) AS b FROM feats
        )"""


# The DSIR per-document scoring chain over `bucketed` (source = 'src0'
# is the trusted target split) — shared by the exact-rank and the
# histogram-threshold selection oracles; mirrors operators/curation.py
# dsir_importance.
_DSIR_SCORED_CTE = r"""tgt AS (SELECT b, COUNT(*) AS cp FROM bucketed WHERE source = 'src0' GROUP BY b),
        tgt_tot AS (SELECT COUNT(*) AS np FROM bucketed WHERE source = 'src0'),
        rawb AS (SELECT b, COUNT(*) AS cq FROM bucketed WHERE source <> 'src0' GROUP BY b),
        raw_tot AS (SELECT COUNT(*) AS nq FROM bucketed WHERE source <> 'src0'),
        doc AS (
            SELECT doc_id, b, COUNT(*) AS c FROM bucketed
            WHERE source <> 'src0' GROUP BY doc_id, b
        ),
        scored AS (
            SELECT d.doc_id,
                   CAST(SUM(d.c) AS BIGINT) AS n_feats,
                   ROUND(
                       (CAST(SUM(d.c * (COALESCE(t.cp, 0) + 1)) AS DOUBLE)
                        * CAST(ANY_VALUE(r2.nq) + 4096 AS DOUBLE))
                       / (CAST(SUM(d.c * (COALESCE(r.cq, 0) + 1)) AS DOUBLE)
                          * CAST(ANY_VALUE(t2.np) + 4096 AS DOUBLE)),
                       8) AS importance
            FROM doc d
            LEFT JOIN tgt t USING (b)
            LEFT JOIN rawb r USING (b)
            CROSS JOIN tgt_tot t2
            CROSS JOIN raw_tot r2
            GROUP BY d.doc_id
        )"""


@register(
    "ngram_decontamination",
    doc=(
        "Benchmark decontamination by n-gram overlap "
        "(operators/curation.py ngram_overlap): every training document's "
        "distinct 5-gram shingles are probed against the DISTINCT shingle "
        "set of the evaluation corpus (source 'src0' stands in as the "
        "benchmark); documents whose overlap ratio is >= 0.5 would be "
        "dropped before training. The benchmark shingle set is explicitly "
        "broadcast — eval sets are small by construction, so this is the "
        "scale-correct join direction at 100 TB of training text."
    ),
    oracle=rf"""
        WITH w AS (
            SELECT doc_id, source, {_TOKS} AS toks FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, source,
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                   toks[i+3] || ' ' || toks[i+4] AS sh
            FROM (SELECT doc_id, source, toks,
                         unnest(generate_series(1, greatest(len(toks) - 4, 0))) AS i
                  FROM w)
        ),
        bench AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'),
        train AS (SELECT doc_id, sh FROM sh WHERE source <> 'src0'),
        counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM train GROUP BY doc_id),
        overlap AS (
            SELECT t.doc_id, COUNT(*) AS n_overlap
            FROM train t JOIN bench b ON t.sh = b.sh
            GROUP BY t.doc_id
        )
        SELECT c.doc_id, c.n_sh,
               COALESCE(o.n_overlap, 0) AS n_overlap,
               ROUND(COALESCE(o.n_overlap, 0) * 1.0 / c.n_sh, 4) AS overlap_ratio
        FROM counts c LEFT JOIN overlap o ON c.doc_id = o.doc_id
    """,
)
def ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import ngram_overlap

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return ngram_overlap(train, bench, n=5)


@register(
    "doc_chunking",
    doc=(
        "Sliding-window document chunking (operators/curation.py "
        "chunk_documents): 20-token windows at stride 10 over the "
        "normalized token stream — the standard pre-tokenization split of "
        "long documents into model-context-sized pieces. Chunk 0 starts "
        "at token 1; only full windows are emitted except for documents "
        "shorter than one window, which yield a single partial chunk."
    ),
    oracle=rf"""
        WITH w AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        nz AS (
            SELECT doc_id, toks, len(toks) AS n FROM w
            WHERE len(toks) > 0 AND toks[1] <> ''
        ),
        starts AS (
            SELECT doc_id, toks, n,
                   unnest(generate_series(1, greatest(n - 19, 1), 10)) AS i
            FROM nz
        )
        SELECT doc_id,
               (i - 1) // 10 AS chunk_idx,
               array_to_string(toks[i : i + 19], ' ') AS chunk,
               least(20, n - i + 1) AS n_tok
        FROM starts
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import chunk_documents

    docs = read_table(spark, sf_dir, "documents")
    return chunk_documents(docs, window=20, stride=10)


@register(
    "span_dedup",
    doc=(
        "Corpus-wide exact span dedup (operators/curation.py dedup_spans): "
        "documents are chunked into DISJOINT 20-token spans (stride = "
        "window) and only the first occurrence of each distinct span "
        "(by (doc_id, chunk_idx)) survives anywhere in the corpus — the "
        "exact-substring dedup pass at chunk granularity. Implemented as "
        "groupBy(md5(span)) + min(struct), i.e. ONE shuffle with map-side "
        "partial aggregation, so a boilerplate span repeated a million "
        "times collapses to one row per input partition before the "
        "exchange (a row_number window would sort them in one reducer). "
        "Output is the per-document retention summary."
    ),
    oracle=rf"""
        WITH w AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        nz AS (
            SELECT doc_id, toks, len(toks) AS n FROM w
            WHERE len(toks) > 0 AND toks[1] <> ''
        ),
        starts AS (
            SELECT doc_id, toks, n,
                   unnest(generate_series(1, greatest(n - 19, 1), 20)) AS i
            FROM nz
        ),
        chunks AS (
            SELECT doc_id,
                   (i - 1) // 20 AS chunk_idx,
                   array_to_string(toks[i : i + 19], ' ') AS chunk,
                   least(20, n - i + 1) AS n_tok
            FROM starts
        ),
        ranked AS (
            SELECT doc_id, chunk_idx, n_tok,
                   ROW_NUMBER() OVER (
                       PARTITION BY md5(chunk) ORDER BY doc_id, chunk_idx
                   ) AS rn
            FROM chunks
        )
        SELECT doc_id,
               COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN rn = 1 THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tok
        FROM ranked GROUP BY doc_id
    """,
)
def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import chunk_documents, dedup_spans

    docs = read_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, window=20, stride=20)
    kept = dedup_spans(chunks)
    totals = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    kept_per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("n_tok").alias("kept_tok")
    )
    return totals.join(kept_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("kept_tok"), F.lit(0)).alias("kept_tok"),
    )


@register(
    "repeated_substring_spans",
    doc=(
        "Cross-document exact repeated-substring detection (operators/"
        "curation.py repeated_substring_spans — the Lee et al. 2021 "
        "suffix-array dedup re-expressed with content-defined anchors): "
        "a position anchors when md5 of its 8-gram opens with a hex "
        "zero (winnowing-style mod-p sampling, so identical content "
        "anchors identically in every copy and fixed-stride alignment "
        "misses never arise); every 40-char anchor window whose hash "
        "repeats anywhere in the corpus, except the corpus-first "
        "occurrence by (doc_id, pos), is a duplicate window, and "
        "overlapping/adjacent duplicate windows merge into maximal "
        "per-document cut spans. All JVM expressions: anchoring/"
        "hashing map-side, one map-side-combined shuffle on the window "
        "hash, per-document interval-merge window (never global)."
    ),
    oracle="""
        WITH anch AS (
            SELECT doc_id, p.pos AS pos,
                   md5(substr(text, p.pos + 1, 40)) AS h
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(
                     0, CAST(length(text) AS INT) - 40, 1)) AS pos) p
            WHERE length(text) >= 40
              AND substr(md5(substr(text, p.pos + 1, 8)), 1, 1) = '0'
        ),
        ranked AS (
            SELECT doc_id, pos,
                   ROW_NUMBER() OVER (
                       PARTITION BY h ORDER BY doc_id, pos) AS rn,
                   COUNT(*) OVER (PARTITION BY h) AS n
            FROM anch
        ),
        dup AS (SELECT doc_id, pos FROM ranked WHERE n >= 2 AND rn > 1),
        flag AS (
            SELECT doc_id, pos,
                   CASE WHEN max(pos + 40) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) IS NULL
                         OR pos > max(pos + 40) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING)
                        THEN 1 ELSE 0 END AS is_new
            FROM dup
        ),
        grp AS (
            SELECT doc_id, pos,
                   SUM(is_new) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS g
            FROM flag
        )
        SELECT doc_id,
               CAST(MIN(pos) AS INT) AS span_start,
               CAST(MAX(pos) + 40 AS INT) AS span_end
        FROM grp GROUP BY doc_id, g
    """,
)
def repeated_substring_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import (
        repeated_substring_spans,
    )

    docs = read_table(spark, sf_dir, "documents")
    out = repeated_substring_spans(
        docs, min_len=40, anchor_k=8, anchor_hex_zeros=1
    )
    return out.select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
    )


@register(
    "substring_decontamination",
    doc=(
        "Exact-substring eval decontamination (operators/curation.py "
        "substring_decontaminate — the Lee et al. application of the "
        "anchor-window machinery, the exact-match complement of the "
        "token-shingle ngram_decontamination): train docs (doc_id % 17 "
        "<> 0) whose text shares a >= 40-char exact substring with any "
        "eval doc (doc_id % 17 = 0) get maximal contamination cut "
        "spans. Eval windows reduce to a distinct hash set probed by "
        "one semi join; both sides anchor content-defined, so shared "
        "substrings align regardless of offset."
    ),
    oracle="""
        WITH anch AS (
            SELECT doc_id, p.pos AS pos,
                   md5(substr(text, p.pos + 1, 40)) AS h
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(
                     0, CAST(length(text) AS INT) - 40, 1)) AS pos) p
            WHERE length(text) >= 40
              AND substr(md5(substr(text, p.pos + 1, 8)), 1, 1) = '0'
        ),
        ev AS (SELECT DISTINCT h FROM anch WHERE doc_id % 17 = 0),
        hits AS (
            SELECT doc_id, pos FROM anch
            WHERE doc_id % 17 <> 0 AND h IN (SELECT h FROM ev)
        ),
        flag AS (
            SELECT doc_id, pos,
                   CASE WHEN max(pos + 40) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) IS NULL
                         OR pos > max(pos + 40) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING)
                        THEN 1 ELSE 0 END AS is_new
            FROM hits
        ),
        grp AS (
            SELECT doc_id, pos,
                   SUM(is_new) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS g
            FROM flag
        )
        SELECT doc_id,
               CAST(MIN(pos) AS INT) AS span_start,
               CAST(MAX(pos) + 40 AS INT) AS span_end
        FROM grp GROUP BY doc_id, g
    """,
)
def substring_decontamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import (
        substring_decontaminate,
    )

    docs = read_table(spark, sf_dir, "documents")
    train = docs.filter(F.pmod(F.col("doc_id"), F.lit(17)) != 0)
    eval_docs = docs.filter(F.pmod(F.col("doc_id"), F.lit(17)) == 0)
    out = substring_decontaminate(
        train, eval_docs, min_len=40, anchor_k=8, anchor_hex_zeros=1
    )
    return out.select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
    )


@register(
    "stratified_sample",
    doc=(
        "Deterministic stratified sampling (operators/curation.py "
        "stratified_sample): per-source keep rates applied as a hex-prefix "
        "comparison on md5(doc_id) — '1a' ~10%, '40' ~25%, '80' ~50%, "
        "default '33' ~20%. Hash sampling is the reproducible, "
        "partitioning-independent alternative to rand()-based sample(); "
        "the hex-string comparison makes the predicate engine-exact. "
        "Output aggregates kept counts per stratum."
    ),
    oracle=r"""
        WITH kept AS (
            SELECT source, doc_id
            FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
                  CASE source WHEN 'src0' THEN '1a'
                              WHEN 'src1' THEN '40'
                              WHEN 'src2' THEN '80'
                              ELSE '33' END
        ),
        totals AS (SELECT source, COUNT(*) AS n_in FROM documents GROUP BY source)
        SELECT t.source, t.n_in,
               COALESCE(k.n_kept, 0) AS n_kept,
               COALESCE(k.min_id, -1) AS min_kept_id,
               COALESCE(k.max_id, -1) AS max_kept_id
        FROM totals t
        LEFT JOIN (
            SELECT source, COUNT(*) AS n_kept,
                   MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
            FROM kept GROUP BY source
        ) k ON t.source = k.source
    """,
)
def stratified_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import stratified_sample

    docs = read_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs,
        "source",
        {"src0": "1a", "src1": "40", "src2": "80"},
        default_threshold="33",
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_in"))
    per = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )
    return totals.join(per, "source", "left").select(
        "source",
        "n_in",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("min_id"), F.lit(-1)).alias("min_kept_id"),
        F.coalesce(F.col("max_id"), F.lit(-1)).alias("max_kept_id"),
    )


@register(
    "sequence_packing",
    doc=(
        "Token-budget sequence packing (operators/curation.py "
        "pack_sequences): documents taken in id order within each source; "
        "a document starting at cumulative token offset c lands in bin "
        "floor(c/200). The streaming variant of first-fit packing — one "
        "shuffle on the stratum key + one window pass, the only shape "
        "that scales to a corpus that cannot be globally sorted."
    ),
    oracle=rf"""
        WITH tok AS (
            SELECT source, doc_id, len({_TOKS}) AS n_tok FROM documents
        ),
        offs AS (
            SELECT source, doc_id, n_tok,
                   COALESCE(SUM(n_tok) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS c
            FROM tok
        )
        SELECT source, CAST(c // 200 AS BIGINT) AS bin,
               COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM offs GROUP BY source, c // 200
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import pack_sequences

    docs = read_table(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=200)


@register(
    "tfidf_top_terms",
    doc=(
        "Per-source top-5 terms by TF-IDF. tf = term occurrences within "
        "the source; idf is the rational BM25 form "
        "(N_docs - df + 0.5)/(df + 0.5) over per-document frequencies — "
        "rational arithmetic only, so the doubles are bit-identical to "
        "the SQL oracle (ln() would round differently between libms). "
        "Ranking ties break on term text for determinism."
    ),
    oracle=rf"""
        WITH tok AS (
            SELECT doc_id, source, unnest({_TOKS}) AS term FROM documents
        ),
        tf AS (
            SELECT source, term, COUNT(*) AS tf
            FROM tok WHERE term <> '' GROUP BY source, term
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df
            FROM tok WHERE term <> '' GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.source, tf.term,
                   ROUND(tf.tf * ((n.n_docs - df.df + 0.5) / (df.df + 0.5)),
                         4) AS score
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        ),
        ranked AS (
            SELECT source, term, score,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY score DESC, term
                   ) AS rank
            FROM scored
        )
        SELECT source, term, score, rank FROM ranked WHERE rank <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from biocache_store_spark.functions.text import words
    from biocache_store_spark.util import ensure_min_parallelism

    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = ensure_min_parallelism(docs.select("doc_id", "source", "text")).select(
        "doc_id", "source", F.explode(words(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df.hint("shuffle_hash"), "term").select(
        "source",
        "term",
        F.round(
            F.col("tf")
            * ((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            4,
        ).alias("score"),
    )
    # rank on the ROUNDED score (ties then break on term) so the ordering
    # is identical on both sides of the oracle comparison
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("source", "term", "score", "rank")
    )


@register(
    "countmin_heavy_hitters",
    doc=(
        "Count-min sketch heavy hitters (operators/sketch.py): a 4 x 4096 "
        "counter table built in ONE pass over the token stream (hashes "
        "carved from a single md5, buckets keyed by hex PREFIX strings so "
        "no hex->int conversion exists on either side), then the exact "
        "top-20 terms probed back through the sketch. cms_est >= exact "
        "always; the sketch table is bounded by construction, hence "
        "broadcast — the one-pass bounded-memory frequency path a 100 TB "
        "corpus needs where an exact term table is itself big data. "
        "Deterministic md5 hashing makes the whole sketch EXACTLY "
        "reproducible in SQL."
    ),
    oracle=rf"""
        WITH tok AS (
            SELECT unnest({_TOKS}) AS term FROM documents
        ),
        t AS (SELECT term FROM tok WHERE term <> ''),
        sketch AS (
            SELECT g.d, substr(md5(term), g.d * 8 + 1, 3) AS bucket,
                   COUNT(*) AS cnt
            FROM t, generate_series(0, 3) g(d)
            GROUP BY 1, 2
        ),
        exact AS (SELECT term, COUNT(*) AS exact_cnt FROM t GROUP BY term),
        top AS (
            SELECT * FROM (
                SELECT term, exact_cnt,
                       ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, term) AS rank
                FROM exact
            ) WHERE rank <= 20
        ),
        probe AS (
            SELECT top.term, top.exact_cnt, top.rank, g.d,
                   substr(md5(top.term), g.d * 8 + 1, 3) AS bucket
            FROM top, generate_series(0, 3) g(d)
        )
        SELECT p.term, p.exact_cnt,
               MIN(COALESCE(s.cnt, 0)) AS cms_est, p.rank
        FROM probe p
        LEFT JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
        GROUP BY p.term, p.exact_cnt, p.rank
    """,
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from biocache_store_spark.functions.text import words
    from biocache_store_spark.operators.sketch import (
        count_min_sketch,
        estimate_counts,
    )
    from biocache_store_spark.util import ensure_min_parallelism

    docs = read_table(spark, sf_dir, "documents")
    tok = (
        ensure_min_parallelism(docs.select("text"))
        .select(F.explode(words(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
    )
    sketch = count_min_sketch(tok, "term")
    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # the exact ranking side exists only to pick verification probes — at
    # corpus scale you'd probe candidate terms straight through the sketch.
    # Top-20 as orderBy().limit(20) — TakeOrderedAndProject per-partition
    # heaps — NOT a global row_number window over the whole distinct-term
    # relation (vocabulary-sized at corpus scale, all in ONE task). The
    # single-partition window then ranks only the 20 survivors
    # (bm25_search's pattern, queries/text.py).
    w = Window.orderBy(F.col("exact_cnt").desc(), F.col("term"))
    top = (
        exact.orderBy(F.col("exact_cnt").desc(), F.col("term"))
        .limit(20)
        .withColumn("rank", F.row_number().over(w))
    )
    est = estimate_counts(sketch, top, "term")
    return est.select("term", "exact_cnt", "cms_est", "rank")


@register(
    "text_redact_pii",
    doc=(
        "PII scrubbing over a synthesized contact-text column (emails + "
        "long digit runs -> placeholder tokens), the standard redaction "
        "pass before corpus release. Patterns are lookahead-free so Java "
        "regex and DuckDB's RE2 agree byte-for-byte; the email pass runs "
        "before the digit pass so address digits are already masked. "
        "Pure regexp_replace/regexp_extract_all — whole-stage codegen, "
        "embarrassingly parallel at 100 TB."
    ),
    oracle=r"""
        WITH src AS (
            SELECT c_custkey,
                   c_name || ' reachable at user' || CAST(c_custkey AS VARCHAR)
                   || '@example.com or +1-'
                   || lpad(CAST(c_custkey % 10000000 AS VARCHAR), 7, '0') AS contact
            FROM customer
        ),
        pass1 AS (
            SELECT c_custkey,
                   len(regexp_extract_all(contact,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS n_emails,
                   regexp_replace(contact,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g')
                       AS t1
            FROM src
        )
        SELECT c_custkey,
               n_emails,
               len(regexp_extract_all(t1, '[0-9]{4,}')) AS n_num_runs,
               regexp_replace(t1, '[0-9]{4,}', '<NUM>', 'g') AS redacted
        FROM pass1
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    num_re = r"[0-9]{4,}"
    customer = read_table(spark, sf_dir, "customer")
    contact = F.concat(
        F.col("c_name"),
        F.lit(" reachable at user"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com or +1-"),
        F.lpad(F.pmod(F.col("c_custkey"), F.lit(10_000_000)).cast("string"), 7, "0"),
    )
    t0 = customer.select("c_custkey", contact.alias("contact"))
    t1 = t0.select(
        "c_custkey",
        F.size(F.regexp_extract_all("contact", F.lit(email_re), 0)).alias("n_emails"),
        F.regexp_replace("contact", email_re, "<EMAIL>").alias("t1"),
    )
    return t1.select(
        "c_custkey",
        "n_emails",
        F.size(F.regexp_extract_all("t1", F.lit(num_re), 0)).alias("n_num_runs"),
        F.regexp_replace("t1", num_re, "<NUM>").alias("redacted"),
    )


@register(
    "text_repetition_stats",
    doc=(
        "Repetition quality signals per document (the Gopher/MassiveText "
        "duplicate-fraction heuristics): 1 - distinct/total for words and "
        "for contiguous word bigrams. High repetition flags boilerplate "
        "and degenerate generations before they enter a training mix. "
        "Bigram distincts come from the codegen'd regex shingler "
        "(functions/text.py text_shingles)."
    ),
    oracle=rf"""
        WITH w AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        base AS (
            SELECT doc_id, toks, len(toks) AS n,
                   len(list_distinct(toks)) AS n_distinct
            FROM w WHERE len(toks) > 0 AND toks[1] <> ''
        ),
        bi AS (
            SELECT b.doc_id,
                   COUNT(DISTINCT toks[i] || ' ' || toks[i+1]) AS n_bi_distinct
            FROM (SELECT doc_id, toks,
                         unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i
                  FROM base) b
            GROUP BY b.doc_id
        )
        SELECT base.doc_id,
               base.n AS n_words,
               ROUND(1.0 - base.n_distinct * 1.0 / base.n, 4) AS word_rep,
               CASE WHEN base.n > 1
                    THEN ROUND(1.0 - bi.n_bi_distinct * 1.0 / (base.n - 1), 4)
                    ELSE CAST(0.0 AS DOUBLE) END AS bigram_rep
        FROM base LEFT JOIN bi ON base.doc_id = bi.doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.functions.text import text_shingles, words

    docs = read_table(spark, sf_dir, "documents")
    toks = words(F.col("text"))
    base = docs.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(text_shingles(F.col("text"), 2)).alias("n_bi_distinct"),
    ).filter((F.col("n_words") > 0) & (toks[0] != ""))
    return base.select(
        "doc_id",
        "n_words",
        F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 4).alias("word_rep"),
        F.when(
            F.col("n_words") > 1,
            F.round(1.0 - F.col("n_bi_distinct") / (F.col("n_words") - 1), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("bigram_rep"),
    )


@register(
    "bpe_token_stats",
    doc=(
        "Token budgets under the BPE-ish pre-tokenizer "
        "(functions/text.py bpe_tokens — GPT-2-style piece regex, "
        "RE2-compatible so the oracle runs the SAME pattern): per source, "
        "total whitespace tokens vs pre-tokenizer pieces and their ratio "
        "— the counting mode a training-budget estimate actually uses "
        "(merges only shrink piece counts, so pieces upper-bound BPE "
        "tokens)."
    ),
    oracle=rf"""
        WITH t AS (
            SELECT source,
                   len({_TOKS}) AS n_ws,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?\p{{L}}+| ?\p{{N}}+| ?[^\s\p{{L}}\p{{N}}]+'))
                       AS n_bpe
            FROM documents
        )
        SELECT source,
               CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
               CAST(SUM(n_bpe) AS BIGINT) AS bpe_pieces,
               ROUND(SUM(n_bpe) * 1.0 / SUM(n_ws), 4) AS pieces_per_word
        FROM t GROUP BY source
    """,
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.functions.text import bpe_token_count, words

    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.size(words(F.col("text"))).alias("n_ws"),
        bpe_token_count(F.col("text")).alias("n_bpe"),
    )
    return t.groupBy("source").agg(
        F.sum("n_ws").alias("ws_tokens"),
        F.sum("n_bpe").alias("bpe_pieces"),
        F.round(F.sum("n_bpe") / F.sum("n_ws"), 4).alias("pieces_per_word"),
    )


_MIXTURE_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.15}
_MIXTURE_DEFAULT_W = 0.05
_MIXTURE_BUDGET = 100_000


@register(
    "bigram_lm_score",
    doc=(
        "Reference-corpus bigram LM scoring (operators/curation.py "
        "bigram_lm_score): the CCNet-style perplexity filter with "
        "engine-exact arithmetic — each training document (sources other "
        "than 'src0') is scored by the quotient of two integer sums over "
        "its bigrams with add-one smoothing against the 'src0' reference "
        "LM, plus the fraction of bigrams seen in the reference at all. "
        "The reference LM is a broadcast dimension; training bigrams "
        "collapse map-side to (doc, w1, w2, multiplicity) before the "
        "join; one shuffle on the doc key for the rollup."
    ),
    oracle=rf"""
        WITH tok AS (
            SELECT doc_id, source, {_TOKS} AS toks FROM documents
        ),
        ok AS (
            SELECT doc_id, source, toks, len(toks) AS n FROM tok
            WHERE len(toks) > 1 AND toks[1] <> ''
        ),
        bg AS (
            SELECT doc_id, source, toks[i] AS w1, toks[i+1] AS w2
            FROM (SELECT doc_id, source, toks,
                         unnest(generate_series(1, n - 1)) AS i
                  FROM ok)
        ),
        c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg
               WHERE source = 'src0' GROUP BY w1, w2),
        c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg
               WHERE source = 'src0' GROUP BY w1),
        v AS (SELECT COUNT(DISTINCT w) AS v FROM (
                  SELECT unnest(toks) AS w FROM tok WHERE source = 'src0')
              WHERE w <> ''),
        m AS (SELECT doc_id, w1, w2, COUNT(*) AS m FROM bg
              WHERE source <> 'src0' GROUP BY doc_id, w1, w2),
        j AS (
            SELECT m.doc_id, m.m, c2.c2, c1.c1, v.v
            FROM m LEFT JOIN c2 USING (w1, w2)
                   LEFT JOIN c1 USING (w1)
                   CROSS JOIN v
        )
        SELECT doc_id,
               CAST(SUM(m) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN c2 IS NOT NULL THEN m ELSE 0 END) AS BIGINT)
                   AS n_hits,
               ROUND(SUM(CASE WHEN c2 IS NOT NULL THEN m ELSE 0 END) * 1.0
                     / SUM(m), 4) AS hit_rate,
               ROUND(SUM(m * (COALESCE(c2, 0) + 1)) * 1.0
                     / SUM(m * (COALESCE(c1, 0) + v)), 8) AS lm_score
        FROM j GROUP BY doc_id
    """,
)
def bigram_lm_score_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import bigram_lm_score

    docs = read_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return bigram_lm_score(train, ref)


@register(
    "boilerplate_removal",
    doc=(
        "CCNet-style boilerplate filtering (operators/curation.py "
        "remove_boilerplate): documents are chunked into disjoint "
        "20-token spans and every occurrence of a span appearing in more "
        "than 2 distinct documents is dropped — headers/footers/banners "
        "are noise in every copy, so unlike span_dedup no copy survives. "
        "Document frequency is two hash-keyed shuffles with map-side "
        "partial agg; the flagged set is tiny by construction, so the "
        "removal is a broadcastable left_anti join on the span hash. "
        "Output is the per-document retention summary."
    ),
    oracle=rf"""
        WITH w AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        nz AS (
            SELECT doc_id, toks, len(toks) AS n FROM w
            WHERE len(toks) > 0 AND toks[1] <> ''
        ),
        starts AS (
            SELECT doc_id, toks, n,
                   unnest(generate_series(1, greatest(n - 19, 1), 20)) AS i
            FROM nz
        ),
        chunks AS (
            SELECT doc_id,
                   array_to_string(toks[i : i + 19], ' ') AS chunk,
                   least(20, n - i + 1) AS n_tok
            FROM starts
        ),
        freq AS (
            SELECT md5(chunk) AS h, COUNT(DISTINCT doc_id) AS df
            FROM chunks GROUP BY md5(chunk)
        ),
        j AS (
            SELECT c.doc_id, c.n_tok, f.df
            FROM chunks c JOIN freq f ON md5(c.chunk) = f.h
        )
        SELECT doc_id,
               COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN df <= 2 THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tok
        FROM j GROUP BY doc_id
    """,
)
def boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import (
        chunk_documents,
        remove_boilerplate,
    )

    docs = read_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, window=20, stride=20)
    kept = remove_boilerplate(chunks, max_doc_freq=2)
    totals = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    kept_per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("n_tok").alias("kept_tok")
    )
    return totals.join(kept_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("kept_tok"), F.lit(0)).alias("kept_tok"),
    )


@register(
    "corpus_mixture_plan",
    doc=(
        "Training-mixture planning (operators/curation.py plan_mixture): "
        "per-source available tokens vs a weighted global token budget -> "
        "epochs (repeat factor when upsampling) and sample_rate (keep "
        "probability when downsampling). One partial-agg shuffle on the "
        "source key; output is one row per source however large the "
        "corpus — the DoReMi-style data-mixing planning stage."
    ),
    oracle=rf"""
        WITH per_source AS (
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(len({_TOKS})) AS BIGINT) AS available_tok
            FROM documents GROUP BY source
        ),
        weighted AS (
            SELECT *,
                   CASE source WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
                               WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
                               WHEN 'src2' THEN CAST(0.15 AS DOUBLE)
                               ELSE CAST(0.05 AS DOUBLE) END AS weight
            FROM per_source
        ),
        t AS (
            SELECT *, ROUND(CAST(100000 AS DOUBLE) * weight, 4) AS target_tok
            FROM weighted
        ),
        e AS (
            SELECT *, ROUND(target_tok / GREATEST(CAST(available_tok AS DOUBLE),
                                                  CAST(1.0 AS DOUBLE)), 4) AS epochs
            FROM t
        )
        SELECT source, n_docs, available_tok, weight, target_tok, epochs,
               ROUND(LEAST(epochs, CAST(1.0 AS DOUBLE)), 4) AS sample_rate
        FROM e
    """,
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import plan_mixture

    docs = read_table(spark, sf_dir, "documents")
    return plan_mixture(
        docs, _MIXTURE_WEIGHTS, _MIXTURE_BUDGET, default_weight=_MIXTURE_DEFAULT_W
    )


@register(
    "dup_inflation_by_source",
    doc=(
        "Exact-duplicate inflation per source: document count vs distinct "
        "content hashes and the inflation ratio — the corpus-health "
        "metric that decides which sources need dedup before mixing. "
        "groupBy(source) with a distinct-aggregate on md5(text); at "
        "100 TB this is the canonical two-phase distinct-count shuffle "
        "(partial sets per partition, merge on the source key)."
    ),
    oracle="""
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(text)) AS n_distinct,
               ROUND(COUNT(*) * 1.0 / COUNT(DISTINCT md5(text)), 4) AS inflation
        FROM documents GROUP BY source
    """,
)
def dup_inflation_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_distinct"),
        F.round(
            F.count(F.lit(1)) * F.lit(1.0) / F.countDistinct(F.md5("text")), 4
        ).alias("inflation"),
    )


@register(
    "facet_rollup",
    doc=(
        "Hierarchical facet counts via native ROLLUP(source, lang): one "
        "pass produces per-(source, lang) counts, per-source subtotals "
        "and the grand total — the multi-level dashboard aggregate that "
        "would otherwise take three scans. Catalyst plans Expand + ONE "
        "partial-agg shuffle; GROUPING() flags disambiguate real NULLs "
        "from subtotal rows. At 100 TB this is the cheapest way to keep "
        "corpus-composition dashboards consistent (all levels from the "
        "same scan) — token totals per source/lang pair included."
    ),
    oracle=rf"""
        SELECT COALESCE(source, '<all>') AS source,
               COALESCE(lang, '<all>') AS lang,
               CAST(GROUPING(source) AS INTEGER) AS is_source_total,
               CAST(GROUPING(lang) AS INTEGER) AS is_lang_total,
               COUNT(*) AS n_docs,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY ROLLUP(source, lang)
    """,
)
def facet_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.functions.text import token_count

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "__tok", token_count(F.col("text"))
    )
    return (
        docs.rollup("source", "lang")
        .agg(
            F.grouping("source").alias("is_source_total"),
            F.grouping("lang").alias("is_lang_total"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").alias("n_tokens"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
            F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
            "is_source_total",
            "is_lang_total",
            "n_docs",
            "n_tokens",
        )
    )


@register(
    "model_quality_gate",
    doc=(
        "Model-scored curation gate (operators/inference.py "
        "batch_score/score_and_filter): every document is scored by a "
        "classifier loaded ONCE per partition-task and applied to whole "
        "Arrow batches — the distributed-inference plumbing every "
        "model-in-the-loop stage (fastText quality/langid, perplexity, "
        "reward models) shares; docs under the threshold are dropped. "
        "The sandbox scorer is the deterministic md5 fake, so the gate "
        "replays exactly in SQL; in production only the loader changes. "
        "Plan note: a model score cannot push into the scan, so this "
        "gate runs LAST, after cheap filters have pruned."
    ),
    oracle="""
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(text), 1, 8))::UBIGINT AS DOUBLE)
                   / 4294967296.0 AS model_score
        FROM documents
        WHERE CAST(('0x' || substr(md5(text), 1, 8))::UBIGINT AS DOUBLE)
                   / 4294967296.0 >= 0.5
    """,
)
def model_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.inference import score_and_filter

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return score_and_filter(docs, threshold=0.5).select(
        "doc_id", "source", "model_score"
    )


@register(
    "snapshot_diff_rollup",
    doc=(
        "Corpus-build regression gate (operators/maintenance.py "
        "snapshot_diff): the live documents table diffed against its own "
        "deterministically-sampled prior build (md5 hex-prefix < '80', "
        "~50%, with src0 docs rewritten) — per-status counts of added / "
        "removed / changed / unchanged ids. One full-outer join on the "
        "id carrying only narrow md5 hashes; the nightly check that a "
        "rebuild didn't silently drop or rewrite what it shouldn't."
    ),
    oracle="""
        WITH old AS (
            SELECT doc_id,
                   md5(CASE WHEN source = 'src0' THEN text || '!' ELSE text END) AS h
            FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
        ),
        new AS (SELECT doc_id, md5(text) AS h FROM documents),
        d AS (
            SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.h IS DISTINCT FROM n.h THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        )
        SELECT status, COUNT(*) AS n FROM d GROUP BY status
    """,
)
def snapshot_diff_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.maintenance import snapshot_diff

    docs = read_table(spark, sf_dir, "documents")
    old = docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "80"
    ).withColumn(
        "text",
        F.when(
            F.col("source") == "src0", F.concat(F.col("text"), F.lit("!"))
        ).otherwise(F.col("text")),
    )
    diff = snapshot_diff(old, docs)
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


@register(
    "gopher_quality_flags",
    doc=(
        "Gopher-rule quality flags (Rae et al. 2021 §A1.1, the canonical "
        "heuristic filter set, adapted to this corpus's single-line "
        "documents): per document — word count in [50, 100k], mean word "
        "length in [3, 10], symbol-to-word ratio <= 0.1, and at least "
        "one English stopword present (thresholds are the rule set's "
        "corpus-scaled parameters: the synthetic docs run 10-99 words, "
        "so the word-count floor is 30) — plus the combined "
        "pass flag. All built-in expressions (map-only, whole-stage "
        "codegen); the rejection-reason breakdown is what a curation "
        "operator tunes thresholds against before committing a 100 TB "
        "filter pass."
    ),
    oracle=rf"""
        WITH t AS (
            SELECT doc_id,
                   {_TOKS} AS toks,
                   lower(trim(text)) AS lt
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   len(toks) AS n_words,
                   length(list_aggregate(toks, 'string_agg', ''))
                       * 1.0 / GREATEST(len(toks), 1) AS mwl,
                   length(regexp_replace(lt, '[a-z0-9\s]', '', 'g'))
                       * 1.0 / GREATEST(len(toks), 1) AS swr,
                   len(list_distinct(list_filter(toks,
                       x -> x IN ('the', 'and', 'of', 'to', 'in')))) AS n_stop
            FROM t
        )
        SELECT doc_id,
               n_words,
               (n_words >= 30 AND n_words <= 100000) AS ok_word_count,
               (mwl >= 3.0 AND mwl <= 10.0) AS ok_mean_word_len,
               (swr <= 0.1) AS ok_symbol_ratio,
               (n_stop >= 1) AS ok_stopwords,
               (n_words >= 30 AND n_words <= 100000
                AND mwl >= 3.0 AND mwl <= 10.0
                AND swr <= 0.1 AND n_stop >= 1) AS gopher_pass
        FROM m
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.functions.text import words

    docs = read_table(spark, sf_dir, "documents")
    lt = F.lower(F.trim(F.col("text")))
    t = docs.select("doc_id", words(F.col("text")).alias("toks"), lt.alias("lt"))
    n_words = F.size("toks")
    safe = F.greatest(n_words, F.lit(1))
    mwl = F.length(F.concat_ws("", F.col("toks"))) / safe
    swr = F.length(F.regexp_replace(F.col("lt"), r"[a-z0-9\s]", "")) / safe
    n_stop = F.size(
        F.array_distinct(
            F.filter(
                F.col("toks"),
                lambda x: x.isin("the", "and", "of", "to", "in"),
            )
        )
    )
    m = t.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("__mwl"),
        swr.alias("__swr"),
        n_stop.alias("__n_stop"),
    )
    ok_wc = (F.col("n_words") >= 30) & (F.col("n_words") <= 100000)
    ok_mwl = (F.col("__mwl") >= 3.0) & (F.col("__mwl") <= 10.0)
    ok_swr = F.col("__swr") <= 0.1
    ok_stop = F.col("__n_stop") >= 1
    return m.select(
        "doc_id",
        "n_words",
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_swr.alias("ok_symbol_ratio"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_swr & ok_stop).alias("gopher_pass"),
    )


@register(
    "training_shard_plan",
    doc=(
        "Deterministic global shuffle + sharding for training export "
        "(operators/curation.py plan_training_shards): shard = first 4 "
        "md5 bytes of doc_id mod 8, position = md5-hex rank in the shard, "
        "token_offset = running token total before this document — the "
        "(shard, pos, cursor) layout a tokenizer/packing writer consumes. "
        "All three are pure functions of the ids, so the layout is "
        "reproducible across runs/engines and the ordering sort is "
        "per-shard (8 partition-local sorts), never a global order-by."
    ),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, len({_TOKS}) AS n_tok,
                   md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ),
        s AS (
            SELECT doc_id, n_tok, h,
                   CAST(CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % 8
                        AS INTEGER) AS shard
            FROM t
        )
        SELECT doc_id, shard,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
                   AS pos,
               CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY shard ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS token_offset
        FROM s
    """,
)
def training_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.functions.text import token_count
    from biocache_store_spark.operators.curation import plan_training_shards

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    out = plan_training_shards(docs, n_shards=8, token_col="n_tok")
    return out.select("doc_id", "shard", "pos", "token_offset")


@register(
    "bpe_merge_training",
    doc=(
        "In-engine BPE merge training (operators/bpe.py "
        "train_bpe_merges): 3 merge rounds over the documents corpus — "
        "word-frequency dim once, then per-round vocab-scale pair "
        "counts, deterministic argmax (count DESC, pair ASC) and greedy "
        "left-to-right non-overlapping merge. The oracle replays all "
        "three rounds in SQL (list_reduce fold with a space-separated "
        "accumulator), pinning tie-breaks AND merge semantics, not just "
        "the counts."
    ),
    oracle=r"""
        WITH wf AS (
            SELECT w AS word, COUNT(*) AS freq
            FROM (SELECT UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS w
                  FROM documents)
            WHERE w <> '' GROUP BY w
        ),
        w0 AS (
            SELECT freq, list_append(string_split(word, ''), '</w>') AS syms
            FROM wf
        ),
        p1 AS (
            SELECT syms[i] AS l, syms[i+1] AS r, SUM(freq) AS cnt
            FROM w0, UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
            GROUP BY 1, 2
        ),
        b1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
        w1 AS (
            SELECT freq, string_split(list_reduce(syms, (acc, x) ->
                CASE WHEN regexp_extract(acc, '([^ ]*)$', 1) = b.l AND x = b.r
                     THEN acc || x ELSE acc || ' ' || x END), ' ') AS syms
            FROM w0, b1 b
        ),
        p2 AS (
            SELECT syms[i] AS l, syms[i+1] AS r, SUM(freq) AS cnt
            FROM w1, UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
            GROUP BY 1, 2
        ),
        b2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
        w2 AS (
            SELECT freq, string_split(list_reduce(syms, (acc, x) ->
                CASE WHEN regexp_extract(acc, '([^ ]*)$', 1) = b.l AND x = b.r
                     THEN acc || x ELSE acc || ' ' || x END), ' ') AS syms
            FROM w1, b2 b
        ),
        p3 AS (
            SELECT syms[i] AS l, syms[i+1] AS r, SUM(freq) AS cnt
            FROM w2, UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
            GROUP BY 1, 2
        ),
        b3 AS (SELECT l, r, cnt FROM p3 ORDER BY cnt DESC, l, r LIMIT 1)
        SELECT 0 AS rank, l AS left_sym, r AS right_sym, l || r AS merged,
               CAST(cnt AS BIGINT) AS pair_count FROM b1
        UNION ALL SELECT 1, l, r, l || r, CAST(cnt AS BIGINT) FROM b2
        UNION ALL SELECT 2, l, r, l || r, CAST(cnt AS BIGINT) FROM b3
    """,
)
def bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.bpe import train_bpe_merges

    docs = read_table(spark, sf_dir, "documents")
    return train_bpe_merges(docs, 3).select(
        "rank",
        F.col("left").alias("left_sym"),
        F.col("right").alias("right_sym"),
        "merged",
        "pair_count",
    )


@register(
    "dsir_selection",
    doc=(
        "DSIR-style data selection by importance resampling "
        "(operators/curation.py dsir_importance/dsir_select; Xie et al. "
        "2023): hashed n-gram bag features (word unigrams+bigrams md5-"
        "hashed into 4096 hex-prefix buckets), per-document importance = "
        "ratio of mean add-one-smoothed target-corpus probability to mean "
        "raw-corpus probability of its features (the module's rational-"
        "arithmetic analog of the DSIR log-ratio — integer sums, one "
        "double expression), then exact deterministic top-25% selection "
        "ranked by (importance DESC, doc_id). Source 'src0' stands in as "
        "the trusted target corpus. Scale shape: both per-bucket count "
        "tables collapse to <= 4096 rows and broadcast; the only corpus-"
        "size shuffle is the occurrence-to-doc reduction (map-side "
        "combined; no (doc,bucket) rollup — it barely reduces); at 100 TB the "
        "selection step switches to dsir_select's threshold regime (pure "
        "filter, no total order)."
    ),
    oracle=rf"""
        WITH {_hashed_feature_cte("source")},
        {_DSIR_SCORED_CTE},
        ranked AS (
            SELECT doc_id, n_feats, importance,
                   ROW_NUMBER() OVER (ORDER BY importance DESC, doc_id) AS rank,
                   COUNT(*) OVER () AS n
            FROM scored
        )
        SELECT doc_id, n_feats, importance, CAST(rank AS INT) AS rank,
               rank <= CAST(CEIL(n * 0.25) AS BIGINT) AS selected
        FROM ranked
    """,
)
def dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import (
        dsir_importance,
        dsir_select,
    )

    docs = read_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    weights = dsir_importance(train, target)
    return dsir_select(weights, top_fraction=0.25).select(
        "doc_id", "n_feats", "importance", "rank", "selected"
    )


@register(
    "nb_lang_classify",
    doc=(
        "In-engine multinomial Naive Bayes classification "
        "(operators/classifier.py train_nb/nb_classify) — the model-based "
        "quality/language/domain filter role of fastText classifiers in "
        "CCNet-style curation, as pure counting: train on even-doc_id "
        "documents labeled by lang over hashed unigram+bigram bag features "
        "(4096 hex-prefix buckets), score odd-doc_id documents with the "
        "package's rational-arithmetic NB analog (prior x mean add-one-"
        "smoothed likelihood; integer sums, one double expression), keep "
        "the deterministic argmax label, and report agreement with the "
        "actual lang column. Scale shape: the model is <= labels x 4096 "
        "rows + an L-row label dim — all broadcast; the only corpus-size "
        "shuffles are the occurrence-to-doc reduction (the label-pivoted "
        "wide model keeps per-label sums as columns) and the per-document "
        "argmax."
    ),
    oracle=rf"""
        WITH {_hashed_feature_cte("lang")},
        model AS (
            SELECT lang AS label, b, COUNT(*) AS c_lb FROM bucketed
            WHERE doc_id % 2 = 0 GROUP BY lang, b
        ),
        n_l AS (SELECT label, SUM(c_lb) AS n_l FROM model GROUP BY label),
        d_l AS (
            SELECT lang AS label, COUNT(*) AS d_l FROM documents
            WHERE doc_id % 2 = 0 AND lang IS NOT NULL GROUP BY lang
        ),
        labels AS (
            SELECT d.label, d.d_l, COALESCE(n.n_l, 0) AS n_l
            FROM d_l d LEFT JOIN n_l n USING (label)
        ),
        d_total AS (SELECT SUM(d_l) AS d_total FROM labels),
        doc AS (
            SELECT doc_id, b, COUNT(*) AS c FROM bucketed
            WHERE doc_id % 2 = 1 GROUP BY doc_id, b
        ),
        per_label AS (
            SELECT d.doc_id, l.label,
                   CAST(SUM(d.c) AS BIGINT) AS n_feats,
                   (CAST(ANY_VALUE(l.d_l) AS DOUBLE)
                    * CAST(SUM(d.c * (COALESCE(m.c_lb, 0) + 1)) AS DOUBLE))
                   / (CAST(ANY_VALUE(t.d_total) AS DOUBLE)
                      * CAST(ANY_VALUE(l.n_l) + 4096 AS DOUBLE)) AS score
            FROM doc d
            CROSS JOIN labels l
            LEFT JOIN model m ON m.b = d.b AND m.label = l.label
            CROSS JOIN d_total t
            GROUP BY d.doc_id, l.label
        ),
        argmax AS (
            SELECT doc_id, label, score, n_feats,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, label ASC
                   ) AS rn
            FROM per_label
        )
        SELECT a.doc_id, a.label AS predicted,
               ROUND(a.score, 10) AS score, a.n_feats,
               d.lang AS actual, a.label = d.lang AS correct
        FROM argmax a JOIN documents d USING (doc_id)
        WHERE a.rn = 1
    """,
)
def nb_lang_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.classifier import nb_classify, train_nb

    docs = read_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    model, labels = train_nb(train, label_col="lang")
    predicted = nb_classify(test, model, labels)
    return predicted.join(
        docs.select("doc_id", F.col("lang").alias("actual")), "doc_id"
    ).select(
        "doc_id",
        F.col("label").alias("predicted"),
        "score",
        "n_feats",
        "actual",
        (F.col("label") == F.col("actual")).alias("correct"),
    )


@register(
    "dsir_threshold_select",
    doc=(
        "DSIR selection by histogram-derived threshold — the full "
        "100 TB path with NO total order anywhere (operators/sketch.py "
        "histogram_threshold + operators/curation.py dsir_select "
        "threshold regime): importance weights bin into a fixed "
        "1000-bin grid over [0, 4) (one bounded groupBy), the keep-"
        "threshold for the top 25% is the lower edge of the highest "
        "bin whose from-the-top cumulative count reaches ceil(0.25*n), "
        "and selection is a pure broadcast-compare filter. Over-selects "
        "by at most one bin's worth vs the exact-rank dsir_selection. "
        "All bin indices and edges are single double expressions over "
        "plan literals, so the threshold reproduces exactly in any "
        "engine."
    ),
    oracle=rf"""
        WITH {_hashed_feature_cte("source")},
        {_DSIR_SCORED_CTE},
        binned AS (
            SELECT doc_id, n_feats, importance,
                   LEAST(GREATEST(CAST(FLOOR(((importance - CAST(0 AS DOUBLE))
                                              * CAST(1000 AS DOUBLE))
                                             / (CAST(4 AS DOUBLE) - CAST(0 AS DOUBLE)))
                                       AS INT), 0), 999) AS bin
            FROM scored
        ),
        hist AS (SELECT bin, COUNT(*) AS c FROM binned GROUP BY bin),
        cum AS (
            SELECT bin,
                   SUM(c) OVER (ORDER BY bin DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   SUM(c) OVER () AS total
            FROM hist
        ),
        th AS (
            SELECT CASE WHEN MAX(bin) = 0 THEN CAST('-Infinity' AS DOUBLE)
                   ELSE CAST(0 AS DOUBLE)
                        + CAST(MAX(bin) AS DOUBLE)
                          * (CAST(4 AS DOUBLE) - CAST(0 AS DOUBLE))
                          / CAST(1000 AS DOUBLE) END AS threshold
            FROM cum
            WHERE cum >= CEIL(total * CAST(0.25 AS DOUBLE))
        )
        SELECT s.doc_id, s.n_feats, s.importance,
               ROUND(t.threshold, 8) AS threshold,
               s.importance >= t.threshold AS selected
        FROM scored s CROSS JOIN th t
    """,
)
def dsir_threshold_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import (
        dsir_importance,
        dsir_select,
    )
    from biocache_store_spark.operators.sketch import histogram_threshold

    docs = read_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    weights = dsir_importance(train, target)
    # the threshold is collected eagerly (one scalar): a persist here
    # would leak a cached corpus-sized frame into the shared session
    # with no owner to unpersist it, and an UNmaterialized cache lets
    # the histogram and compare branches race into recomputing the
    # importance scan concurrently. Production checkpoints the weight
    # table instead (see dsir_select docstring); two passes is the
    # honest lazy-query shape.
    th_val = float(
        histogram_threshold(weights, 0.25, 0.0, 4.0, 1000)
        .collect()[0]["threshold"]
    )
    return dsir_select(weights, threshold=th_val).select(
        "doc_id",
        "n_feats",
        "importance",
        F.round(F.lit(th_val), 8).alias("threshold"),
        "selected",
    )


@register(
    "domain_cap_filter",
    doc=(
        "URL-domain curation (operators/curation.py extract_domain + "
        "filter_blocked_domains + cap_per_domain): the web-corpus "
        "front-door stages every large-scale build runs — drop blocklisted "
        "domains (broadcast anti-join), then keep at most K documents per "
        "domain, deterministically the first K by id (the domain-"
        "domination guard). The cap is ONE sentinel-keyed window — the "
        "measured-best of three forms (SCALE.md round 7; the count-first "
        "split was 5x slower and rejected); NULL-domain rows get per-row "
        "sentinel partitions so junk URLs pass through without pooling "
        "into one skewed sort. URLs are synthesized from doc ids (every 5th "
        "carries a www. prefix, which must strip to the same domain); the "
        "Spark side parses them with parse_url, the oracle derives the "
        "domain arithmetically — the hash pins the extraction too."
    ),
    oracle="""
        WITH urls AS (
            SELECT doc_id,
                   'd' || CAST(doc_id % 37 AS VARCHAR) || '.example.com'
                       AS domain
            FROM documents
        ),
        allowed AS (
            SELECT * FROM urls
            WHERE domain NOT IN ('d0.example.com', 'd5.example.com')
        ),
        ranked AS (
            SELECT doc_id, domain,
                   ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id)
                       AS rn
            FROM allowed
        )
        SELECT doc_id, domain FROM ranked WHERE rn <= 30
    """,
)
def domain_cap_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.curation import (
        cap_per_domain,
        extract_domain,
        filter_blocked_domains,
    )

    docs = read_table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://"),
            F.when(F.pmod(k, F.lit(5)) == 0, F.lit("www.")).otherwise(F.lit("")),
            F.lit("d"),
            F.pmod(k, F.lit(37)).cast("string"),
            F.lit(".example.com/p/"),
            k.cast("string"),
        ).alias("url"),
    )
    blocklist = local_rows_df(
        spark, "domain string", [("d0.example.com",), ("d5.example.com",)]
    )
    out = cap_per_domain(filter_blocked_domains(urls, blocklist), 30)
    return out.select("doc_id", extract_domain("url").alias("domain"))


@register(
    "histogram_threshold_refined",
    doc=(
        "Bottom-bin refinement of the fixed-grid threshold "
        "(operators/sketch.py histogram_threshold, refine=1): the fixture "
        "puts EVERY value inside the coarse grid's bottom bin (importance "
        "= (c_custkey % 1000)/10000 < 0.1 on a [0,1) x 10 grid at any "
        "scale factor), so the pass-1 cut degenerates and the operator "
        "re-histograms the bin-0 rows over [min(values), lo+w) and cuts "
        "inside it — a finite discriminating threshold where the legacy "
        "plan returned keep-everything -inf. The oracle replays the "
        "refinement pass in SQL (same IEEE bin/edge arithmetic), so the "
        "hash pins the two-pass derivation, the covered/total counts and "
        "the >= selection exactly."
    ),
    oracle="""
        WITH vals AS (
            SELECT c_custkey AS id,
                   CAST(c_custkey % 1000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                       AS importance
            FROM customer
        ),
        agg AS (SELECT MIN(importance) AS lo2, COUNT(*) AS n FROM vals),
        binned AS (
            SELECT v.importance,
                   LEAST(GREATEST(CAST(FLOOR(
                       ((v.importance - a.lo2) * CAST(10 AS DOUBLE))
                       / ((CAST(0 AS DOUBLE)
                           + (CAST(1 AS DOUBLE) - CAST(0 AS DOUBLE))
                             / CAST(10 AS DOUBLE)) - a.lo2)
                   ) AS INT), 0), 9) AS bin
            FROM vals v CROSS JOIN agg a
        ),
        hist AS (SELECT bin, COUNT(*) AS c FROM binned GROUP BY bin),
        cum AS (
            SELECT bin,
                   SUM(c) OVER (ORDER BY bin DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
                   SUM(c) OVER () AS total
            FROM hist
        ),
        th AS (
            SELECT CASE WHEN MAX(c2.bin) = 0 THEN a.lo2
                        ELSE a.lo2 + CAST(MAX(c2.bin) AS DOUBLE)
                             * ((CAST(0 AS DOUBLE)
                                 + (CAST(1 AS DOUBLE) - CAST(0 AS DOUBLE))
                                   / CAST(10 AS DOUBLE)) - a.lo2)
                             / CAST(10 AS DOUBLE) END AS threshold,
                   CAST(MIN(c2.cum) AS BIGINT) AS covered,
                   CAST(MAX(c2.total) AS BIGINT) AS total
            FROM cum c2 CROSS JOIN agg a
            WHERE c2.cum >= CEIL(c2.total * CAST(0.25 AS DOUBLE))
            GROUP BY a.lo2
        )
        SELECT v.id, v.importance,
               ROUND(t.threshold, 8) AS threshold,
               v.importance >= t.threshold AS selected,
               t.covered, t.total
        FROM vals v CROSS JOIN th t
    """,
)
def histogram_threshold_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.sketch import histogram_threshold

    customer = read_table(spark, sf_dir, "customer")
    vals = customer.select(
        F.col("c_custkey").alias("id"),
        (
            F.pmod(F.col("c_custkey"), F.lit(1000)).cast("double")
            / F.lit(10000).cast("double")
        ).alias("importance"),
    )
    th = histogram_threshold(vals, 0.25, 0.0, 1.0, n_bins=10)
    return vals.crossJoin(F.broadcast(th)).select(
        "id",
        "importance",
        F.round(F.col("threshold"), 8).alias("threshold"),
        (F.col("importance") >= F.col("threshold")).alias("selected"),
        "covered",
        "total",
    )
