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

# hot-bucket guard (never binds at the test scale factors)
_MAX_BAND_BUCKET = 1000

# n-gram Jaccard candidate budget: admit shingle-df tiers (ascending df)
# while the cumulative candidate-pair count fits this many pairs PER
# DOCUMENT. Unlike a static df cap, the admitted-df threshold is derived
# from the corpus's own df histogram inside the plan, so the total
# candidate volume stays O(budget × corpus) at any scale — the static
# cap 1000 admitted 6.0 BILLION candidates at 500k docs (SCALE.md)
# because a fixed df threshold admits ever-more near-cap buckets as the
# corpus grows. 400/doc admits the full uncapped candidate set at the
# test scale factors (sf0.1 carries 253/doc) and ~200M candidates at the
# 500k-doc SCALE fixture (df cutoff ≈ 56) — comfortably inside the
# volume the posting-list plan is measured to handle.
_NGRAM_CANDIDATES_PER_DOC = 400
# Below this corpus size the histogram pass costs more than it saves and
# the static cap is measured safe (SCALE.md: static cap at 5k docs beats
# dynamic 1.2 s vs 3.5 s at 5k docs with the single-pass static plan;
# at 50k docs dynamic wins 16 s vs 34 s even against the older two-pass
# static shape)
# — the single-pass static-cap plan is used instead.
_NGRAM_BUDGET_MIN_DOCS = 20_000
_NGRAM_STATIC_DF_CAP = 1000

# words(text) in DuckDB — keep in sync with functions/text.py `words`
_TOKS = r"string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')"

# The full minhash+LSH pipeline as a reusable CTE chain ending at
# pairs(doc_a, doc_b, jaccard) — shared by the minhash_near_duplicates
# oracle and the near_dup_components oracle (which closes the pairs
# transitively). Mirrors operators/minhash.py exactly: 3-gram shingles,
# 12 minhashes carved from 3 md5 digests, 4 bands of 3, band-bucket
# candidates (bucket cap 1000), exact-Jaccard verification >= 0.5.
_MINHASH_PAIRS_CTES = r"""
        w AS (
            SELECT doc_id, string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
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
        hashes AS (
            SELECT s.doc_id, g.k,
                   MIN(substr(md5((g.k // 4)::VARCHAR || '|' || s.sh),
                              (g.k % 4) * 8 + 1, 8)) AS mh
            FROM shingles s, generate_series(0, 11) g(k)
            GROUP BY s.doc_id, g.k
        ),
        bands AS (
            SELECT doc_id, k // 3 AS band,
                   string_agg(mh, '|' ORDER BY k) AS band_sig
            FROM hashes GROUP BY doc_id, k // 3
        ),
        allowed_buckets AS (
            SELECT band, band_sig FROM bands
            GROUP BY band, band_sig HAVING COUNT(*) <= 1000
        ),
        bands_ok AS (SELECT b.* FROM bands b JOIN allowed_buckets USING (band, band_sig)),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands_ok a JOIN bands_ok b
              ON a.band = b.band AND a.band_sig = b.band_sig
             AND a.doc_id < b.doc_id
        ),
        inter AS (
            SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
            FROM cand c
            JOIN shingles sa ON sa.doc_id = c.doc_a
            JOIN shingles sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT i.doc_a, i.doc_b,
                   ROUND(i.n_common * 1.0 / (ca.n_sh + cb.n_sh - i.n_common), 4) AS jaccard
            FROM inter i
            JOIN counts ca ON ca.doc_id = i.doc_a
            JOIN counts cb ON cb.doc_id = i.doc_b
            WHERE i.n_common * 1.0 / (ca.n_sh + cb.n_sh - i.n_common) >= 0.5
        )"""


@register(
    "text_token_stats",
    doc=(
        "Token counting + length stats per document — the parser-layer "
        "statistics shape (parser/*.scala) at document granularity."
    ),
    oracle=r"""
        SELECT doc_id,
               length(text) AS n_chars_measured,
               len(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS n_tokens,
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
                   len(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS n_tokens,
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
        "never an all-pairs product. Viral shingles are dropped by a "
        "DYNAMIC candidate budget: ascending-df tiers of the corpus's own "
        "df histogram are admitted while the cumulative pair count fits "
        f"{_NGRAM_CANDIDATES_PER_DOC} pairs/doc (computed in-plan from a "
        "tiny histogram relation — no driver collect). The budget does "
        "not bind at the test scale factors (max df 25 at sf0.1), so "
        "results are identical to the uncapped operator."
    ),
    bench=True,
    oracle=r"""
        WITH w AS (
            SELECT doc_id, string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
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
        allowed AS (
            SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) <= 1000
        ),
        blocked AS (SELECT s.* FROM shingles s JOIN allowed USING (sh)),
        counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM blocked a JOIN blocked b
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
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    # n_sh rides along on every exploded row, so the posting list alone
    # yields intersection count AND both denominators — no counts branch,
    # no broadcast, no cache.
    shingles = shingle_df(docs, 3, with_count=True)
    # POSTING-LIST shape (replaces the earlier self-join + df-cap window,
    # r3→r4 regression: two scans + two regex-shingle passes + two window
    # sorts): group the exploded shingles ONCE on `sh`, then generate the
    # per-bucket pairs map-side by double-exploding the collected doc
    # list. One scan, one regex pass, one exchange on `sh`, and the
    # hot-shingle guard becomes a free size(docs) filter.
    #   * size >= 2 drops singleton shingles (the vast majority) before
    #     any pair work;
    #   * the viral-3-gram guard is TWO-REGIME, picked by a parquet
    #     metadata row count. Small corpora (n_docs <=
    #     _NGRAM_BUDGET_MIN_DOCS = 20k; SCALE.md puts the measured
    #     crossover between 5k and 50k docs and the constant sits
    #     conservatively inside it) keep the single-pass plan with the
    #     static df cap 1000: every df tier a small corpus can produce is
    #     per-bucket bounded (a full-cap bucket is >= 5% of the corpus),
    #     and the second shingle pass the dynamic budget needs would
    #     cost more than it saves (measured crossover in SCALE.md).
    #     Large corpora switch to the DYNAMIC budget: the df histogram
    #     (one row per distinct df value) is walked in ascending-df
    #     order and tiers admitted while the cumulative candidate count
    #     Σ n(df)·C(df,2) fits _NGRAM_CANDIDATES_PER_DOC × n_docs —
    #     a STATIC cap admits ever-more near-cap buckets as the corpus
    #     grows (6.0B candidates / DNF at 500k docs, SCALE.md), while
    #     the budget keeps candidate volume linear in the corpus at any
    #     scale (150 s at 500k docs, default setting). At the test SFs
    #     neither guard binds (max df 25 at sf0.1), so the output equals
    #     the uncapped operator and is regime-independent.
    # The COUNT-FIRST discipline (prefilter before collect_list so a
    # viral shingle's posting list never materializes in one aggregation
    # buffer) is load-bearing ONLY in the dynamic regime, where df is
    # unbounded. In the static regime df <= n_docs <= 20k bounds every
    # posting buffer to a few hundred KB, so the guard folds into the
    # ONE collecting aggregation as a size() post-filter — one shingle
    # pass and one exchange total, instead of a second scan + regex +
    # explode pass feeding a count relation and a left-semi join.
    n_docs = docs.count()  # parquet footer count — cheap, and honest:
    #                        the regime is derived from the corpus itself
    if n_docs <= _NGRAM_BUDGET_MIN_DOCS:
        posting = (
            shingles.groupBy("sh")
            .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("docs"))
            .filter(
                (F.size("docs") >= 2)
                & (F.size("docs") <= _NGRAM_STATIC_DF_CAP)
            )
        )
    else:
        df_rel = shingles.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
        hist = (
            df_rel.filter(F.col("__df") >= 2)
            .groupBy("__df")
            .agg(F.count(F.lit(1)).alias("__nsh"))
        )
        cum_w = Window.orderBy("__df").rowsBetween(Window.unboundedPreceding, 0)
        tier_pairs = F.col("__nsh") * F.col("__df") * (F.col("__df") - 1) / 2
        budget = float(_NGRAM_CANDIDATES_PER_DOC) * n_docs
        max_df = (
            hist.withColumn("__cum", F.sum(tier_pairs).over(cum_w))
            .filter(F.col("__cum") <= budget)
            .agg(F.max("__df").alias("__max_df"))
        )
        # Coalesce to 2: if even the smallest tier (df=2) blows the budget
        # the max() aggregates over zero rows and __max_df is NULL — a
        # NULL threshold would admit NO shingles and the query would
        # silently return zero pairs. Degrade to the minimum tier instead:
        # df=2 candidate volume is at most n_shingles, already linear.
        ok_shingles = (
            df_rel.filter(F.col("__df") >= 2)
            .join(
                F.broadcast(max_df),
                F.col("__df") <= F.coalesce(F.col("__max_df"), F.lit(2)),
                "left_semi",
            )
            .drop("__df")
        )
        posting = (
            shingles.join(ok_shingles.hint("shuffle_hash"), "sh", "left_semi")
            .groupBy("sh")
            .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("docs"))
        )
    # plain explode is safe HERE: the generator argument is the
    # materialized `docs` attribute from the aggregation, so the
    # size()>0 filter Catalyst infers is a cheap attribute check — the
    # interpreted-lambda inlining trap in shingle_df's notes applies
    # only when the generator wraps the raw higher-order expression
    pairs = (
        posting.select(F.explode("docs").alias("a"), "docs")
        .select("a", F.explode("docs").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
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
    "minhash_near_duplicates",
    doc=(
        "MinHash+LSH near-dup detection (operators/minhash.py): shingle -> "
        "12 minhashes (8-hex-char substrings of 3 md5 digests) -> 4 bands "
        "-> band-bucket join -> exact Jaccard verification >= 0.5. The md5 "
        "hash family makes the whole pipeline deterministic, so the oracle "
        "reproduces signatures, banding, candidates and verification "
        "exactly in SQL."
    ),
    bench=True,
    oracle=f"""
        WITH {_MINHASH_PAIRS_CTES}
        SELECT doc_a, doc_b, jaccard FROM pairs
    """,
)
def minhash_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.minhash import near_duplicates

    docs = read_table(spark, sf_dir, "documents")
    # hot-band guard mirrored in the oracle's allowed_buckets CTE; the cap
    # never binds at the test scale factors
    return near_duplicates(docs, threshold=0.5, max_bucket_size=_MAX_BAND_BUCKET)


@register(
    "near_dup_components",
    doc=(
        "Near-duplicate CLUSTERS from near-duplicate PAIRS: the minhash "
        "pipeline's verified pairs closed transitively with alternating "
        "large-star/small-star connected components "
        "(operators/components.py — Kiveris et al. SoCC'14), labelling "
        "every involved document with its component's minimum doc_id plus "
        "the cluster size. This is the principled 'keep one per duplicate "
        "group' step a corpus-wide dedup needs (the reference's grouped "
        "dedup, tool/DuplicationDetection.scala:216-321, only clusters "
        "within one blocking key). The oracle closes the same pairs with "
        "a recursive CTE computing min-reachable-id."
    ),
    oracle=f"""
        WITH RECURSIVE {_MINHASH_PAIRS_CTES},
        und AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION
            SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        nodes AS (SELECT DISTINCT u AS node FROM und),
        reach(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT reach.node, und.v FROM reach JOIN und ON und.u = reach.r
        ),
        comp AS (SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node),
        sizes AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component)
        SELECT c.doc_id, c.component, s.cluster_size
        FROM comp c JOIN sizes s USING (component)
    """,
)
def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.components import connected_components
    from biocache_store_spark.operators.minhash import near_duplicates

    docs = read_table(spark, sf_dir, "documents")
    pairs = near_duplicates(docs, threshold=0.5, max_bucket_size=_MAX_BAND_BUCKET)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"), "component", "cluster_size"
    )


_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "los", "las", "es"),
    "fr": ("le", "les", "et", "est", "une"),
}


def _marker_list_sql(lang: str) -> str:
    return ", ".join(f"'{m}'" for m in _LANG_MARKERS[lang])


def _langid_scored(docs: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Shared marker-word scoring: (doc_id, labelled_lang, *extra,
    n_tokens, s_en/s_de/s_es/s_fr) — one pass, pure array expressions."""
    from biocache_store_spark.functions.text import words

    toks = docs.select(
        "doc_id",
        F.col("lang").alias("labelled_lang"),
        *extra_cols,
        words(F.col("text")).alias("toks"),
    )

    def marker_count(markers):
        return F.size(F.filter(F.col("toks"), lambda x: x.isin(*markers)))

    return toks.select(
        "doc_id",
        "labelled_lang",
        *extra_cols,
        F.size("toks").alias("n_tokens"),
        *[
            marker_count(markers).alias(f"s_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )


def _predicted_lang() -> F.Column:
    """Argmax with the fixed en>de>es>fr tie priority (mirrors the CASE
    ladder in every langid oracle)."""
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_MARKERS}
    return (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en"
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )



@register(
    "text_language_id",
    doc=(
        "N-gram/stopword language-ID heuristic: count marker-word hits per "
        "language over the token stream, argmax with a fixed priority "
        "(en>de>es>fr) on ties. Pure array expressions on both sides."
    ),
    oracle=rf"""
        WITH t AS (
            SELECT doc_id, lang AS labelled_lang,
                   string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
            FROM documents
        ),
        scored AS (
            SELECT doc_id, labelled_lang,
                   len(toks) AS n_tokens,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('en')}))) AS s_en,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('de')}))) AS s_de,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('es')}))) AS s_es,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('fr')}))) AS s_fr
            FROM t
        )
        SELECT doc_id, labelled_lang,
               CASE
                 WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                 WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                 WHEN s_es >= s_fr THEN 'es'
                 ELSE 'fr'
               END AS predicted_lang,
               ROUND(GREATEST(s_en, s_de, s_es, s_fr) * 1.0
                     / GREATEST(n_tokens, 1), 4) AS marker_ratio
        FROM scored
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    scored = _langid_scored(docs)
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_MARKERS}
    return scored.select(
        "doc_id",
        "labelled_lang",
        _predicted_lang().alias("predicted_lang"),
        F.round(
            F.greatest(*s.values()) / F.greatest(F.col("n_tokens"), F.lit(1)), 4
        ).alias("marker_ratio"),
    )


@register(
    "lang_mismatch_report",
    doc=(
        "Declared-vs-detected language contamination report: every "
        "(source, labelled lang, predicted lang) cell with its document "
        "count and a mismatch flag — the audit a multilingual corpus runs "
        "before per-language filtering, since mislabeled documents skew "
        "both the language mix and any lang-scoped dedup. One langid pass "
        "+ one groupBy; at 100 TB the cell count is bounded by "
        "sources x langs^2 however large the corpus."
    ),
    oracle=rf"""
        WITH t AS (
            SELECT doc_id, source, lang AS labelled_lang,
                   string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
            FROM documents
        ),
        scored AS (
            SELECT doc_id, source, labelled_lang,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('en')}))) AS s_en,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('de')}))) AS s_de,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('es')}))) AS s_es,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('fr')}))) AS s_fr
            FROM t
        ),
        pred AS (
            SELECT source, labelled_lang,
                   CASE
                     WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                     WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                     WHEN s_es >= s_fr THEN 'es'
                     ELSE 'fr'
                   END AS predicted_lang
            FROM scored
        )
        SELECT source, labelled_lang, predicted_lang,
               COUNT(*) AS n_docs,
               (labelled_lang IS DISTINCT FROM predicted_lang) AS mismatch
        FROM pred GROUP BY source, labelled_lang, predicted_lang
    """,
)
def lang_mismatch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    scored = _langid_scored(docs, extra_cols=("source",))
    pred = scored.select(
        "source", "labelled_lang", _predicted_lang().alias("predicted_lang")
    )
    return (
        pred.groupBy("source", "labelled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            # pure function of two group keys — derived post-agg, not an
            # aggregate buffer
            "mismatch",
            ~F.col("labelled_lang").eqNullSafe(F.col("predicted_lang")),
        )
    )


# The quality-metric block as reusable CTEs: text_quality_score's whole
# oracle, and the quality key of the dedup representative selection.
_QUALITY_CTES = rf"""
        qt AS (
            SELECT doc_id,
                   lower(trim(text)) AS lt,
                   string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
            FROM documents
        ),
        qm AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   ROUND(length(list_aggregate(toks, 'string_agg', ''))
                         * 1.0 / GREATEST(len(toks), 1), 4) AS mean_token_len,
                   ROUND(length(regexp_replace(lt, '[a-z0-9\s]', '', 'g'))
                         * 1.0 / GREATEST(length(lt), 1), 4) AS punct_ratio,
                   ROUND(len(list_filter(toks, x -> x IN ({_marker_list_sql('en')})))
                         * 1.0 / GREATEST(len(toks), 1), 4) AS stopword_ratio
            FROM qt
        ),
        quality AS (
            SELECT doc_id, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
                   ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.5
                         + (1.0 - punct_ratio) * 0.3
                         + LEAST(stopword_ratio * 5.0, 1.0) * 0.2, 4) AS quality_score
            FROM qm
        )"""


@register(
    "text_quality_score",
    doc=(
        "Per-document quality scoring: token count, mean token length, "
        "punctuation ratio, stopword ratio, and a weighted score — the "
        "corpus-filtering operator of a training-data pipeline, all "
        "built-in expressions."
    ),
    oracle=f"""
        WITH {_QUALITY_CTES}
        SELECT * FROM quality
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return _quality_frame(docs)


def _quality_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
    quality_score) — the text_quality_score metric block, shared with the
    dedup representative selection. All built-in expressions, map-only."""
    from biocache_store_spark.functions.text import words

    lt = F.lower(F.trim(F.col("text")))
    t = docs.select("doc_id", lt.alias("lt"), words(F.col("text")).alias("toks"))
    n_tokens = F.size("toks")
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    mean_token_len = F.round(
        F.length(F.concat_ws("", F.col("toks"))) / safe_tokens, 4
    )
    punct_ratio = F.round(
        F.length(F.regexp_replace(F.col("lt"), r"[a-z0-9\s]", ""))
        / F.greatest(F.length("lt"), F.lit(1)),
        4,
    )
    stopword_ratio = F.round(
        F.size(F.filter(F.col("toks"), lambda x: x.isin(*_LANG_MARKERS["en"])))
        / safe_tokens,
        4,
    )
    m = t.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        mean_token_len.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
    )
    score = F.round(
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
        + (1.0 - F.col("punct_ratio")) * 0.3
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.2,
        4,
    )
    return m.withColumn("quality_score", score)


@register(
    "dedup_representative",
    doc=(
        "Representative selection for near-duplicate clusters: each "
        "minhash component (near_dup_components) keeps its highest-"
        "quality member (text_quality_score key; ties to the lowest "
        "doc_id) — the reference's representative-picking step "
        "(tool/DuplicationDetection.scala markRecordsAsDuplicates* — "
        "precision-ladder argmax) generalized to corpus dedup, where the "
        "survivor should be the best copy, not the first. Implemented as "
        "groupBy(component) + max(struct(quality, -doc_id, payload)) so "
        "the argmax collapses map-side — no window sort of the largest "
        "cluster in one reducer."
    ),
    oracle=f"""
        WITH RECURSIVE {_MINHASH_PAIRS_CTES},
        und AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION
            SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        nodes AS (SELECT DISTINCT u AS node FROM und),
        reach(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT reach.node, und.v FROM reach JOIN und ON und.u = reach.r
        ),
        comp AS (SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node),
        {_QUALITY_CTES},
        ranked AS (
            SELECT c.component, c.doc_id, q.quality_score,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.component
                       ORDER BY q.quality_score DESC, c.doc_id ASC
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY c.component) AS cluster_size
            FROM comp c JOIN quality q USING (doc_id)
        )
        SELECT component, doc_id AS rep_doc_id,
               quality_score AS rep_quality, cluster_size
        FROM ranked WHERE rn = 1
    """,
)
def dedup_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.components import (
        component_representatives,
        connected_components,
    )
    from biocache_store_spark.operators.minhash import near_duplicates

    docs = read_table(spark, sf_dir, "documents")
    pairs = near_duplicates(docs, threshold=0.5, max_bucket_size=_MAX_BAND_BUCKET)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    quality = _quality_frame(docs).select("doc_id", "quality_score")
    return component_representatives(comp, quality).select(
        "component",
        "rep_doc_id",
        F.col("rep_quality_score").alias("rep_quality"),
        "cluster_size",
    )


@register(
    "text_simhash",
    doc=(
        "SimHash fingerprint per document (operators/simhash.py): shingles "
        "vote +-1 per bit, bits derived from md5 hex nibbles so the "
        "fingerprint is engine-neutral and exactly SQL-verifiable."
    ),
    oracle=r"""
        WITH w AS (
            SELECT doc_id, string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
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
        bits AS (
            SELECT s.doc_id, g.b,
                   CASE WHEN SUM(CASE WHEN substr(md5(s.sh), g.b + 1, 1) >= '8'
                                      THEN 1 ELSE -1 END) > 0
                        THEN '1' ELSE '0' END AS bit
            FROM shingles s, generate_series(0, 31) g(b)
            GROUP BY s.doc_id, g.b
        )
        SELECT b.doc_id, c.n_sh, string_agg(b.bit, '' ORDER BY b.b) AS simhash
        FROM bits b JOIN counts c ON c.doc_id = b.doc_id
        GROUP BY b.doc_id, c.n_sh
    """,
)
def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.simhash import simhash

    docs = read_table(spark, sf_dir, "documents")
    return simhash(docs)


def _simhash_pairs_oracle(bits: int = 32, bands: int = 4, max_hamming: int = 3) -> str:
    """Band-blocked Hamming pairs over the same SQL fingerprints as the
    text_simhash oracle; the 32-position Hamming sum is generated inline."""
    band_len = bits // bands
    ham = " + ".join(
        f"(CASE WHEN substr(a_sim, {i + 1}, 1) <> substr(b_sim, {i + 1}, 1)"
        " THEN 1 ELSE 0 END)"
        for i in range(bits)
    )
    return rf"""
        WITH w AS (
            SELECT doc_id, string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
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
        bits AS (
            SELECT s.doc_id, g.b,
                   CASE WHEN SUM(CASE WHEN substr(md5(s.sh), g.b + 1, 1) >= '8'
                                      THEN 1 ELSE -1 END) > 0
                        THEN '1' ELSE '0' END AS bit
            FROM shingles s, generate_series(0, {bits - 1}) g(b)
            GROUP BY s.doc_id, g.b
        ),
        fp AS (
            SELECT doc_id, string_agg(bit, '' ORDER BY b) AS simhash
            FROM bits GROUP BY doc_id
        ),
        banded AS (
            SELECT doc_id, simhash, g.b AS band,
                   substr(simhash, g.b * {band_len} + 1, {band_len}) AS band_str
            FROM fp, generate_series(0, {bands - 1}) g(b)
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.simhash AS a_sim, b.simhash AS b_sim
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.band_str = b.band_str
             AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, ({ham}) AS hamming
        FROM pairs
        WHERE ({ham}) <= {max_hamming}
    """


@register(
    "simhash_near_duplicates",
    doc=(
        "SimHash near-duplicate pairs (operators/simhash.py "
        "simhash_near_duplicates): band-blocked Hamming join - by "
        "pigeonhole, any pair within Hamming distance bands-1 shares a "
        "band, so for max_hamming=3 with 4 bands the blocked result EQUALS "
        "the exact all-pairs result (blocking is pure cost optimization, "
        "unlike minhash LSH recall). Hamming is a static unrolled 32-term "
        "sum on both engines."
    ),
    oracle=_simhash_pairs_oracle(),
)
def simhash_near_duplicates_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.simhash import simhash_near_duplicates

    docs = read_table(spark, sf_dir, "documents")
    return simhash_near_duplicates(docs)


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
        SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS representative
        FROM documents
        GROUP BY 1
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.groupBy(norm.alias("norm_text")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("representative"),
    )


def _corpus_curation_oracle() -> str:
    """The full curation pipeline as one SQL statement: the quality/language
    CTEs mirror text_quality_score / text_language_id, the near-dup CTEs are
    the minhash_near_duplicates oracle re-rooted at the candidate set, and
    the greedy keep-lowest-id dedup + manifest are ordinary SQL."""
    return rf"""
        WITH t AS (
            SELECT doc_id, source, text,
                   lower(trim(text)) AS lt,
                   string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
            FROM documents
        ),
        m AS (
            SELECT doc_id, source, text,
                   len(toks) AS n_tokens,
                   ROUND(length(regexp_replace(lt, '[a-z0-9\s]', '', 'g'))
                         * 1.0 / GREATEST(length(lt), 1), 4) AS punct_ratio,
                   ROUND(len(list_filter(toks, x -> x IN ({_marker_list_sql('en')})))
                         * 1.0 / GREATEST(len(toks), 1), 4) AS stopword_ratio,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('en')}))) AS s_en,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('de')}))) AS s_de,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('es')}))) AS s_es,
                   len(list_filter(toks, x -> x IN ({_marker_list_sql('fr')}))) AS s_fr
            FROM t
        ),
        scored AS (
            SELECT doc_id, source, text, n_tokens,
                   ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.5
                         + (1.0 - punct_ratio) * 0.3
                         + LEAST(stopword_ratio * 5.0, 1.0) * 0.2, 4) AS quality_score,
                   CASE
                     WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                     WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                     WHEN s_es >= s_fr THEN 'es'
                     ELSE 'fr'
                   END AS predicted_lang
            FROM m
        ),
        cand AS (
            SELECT * FROM scored
            WHERE quality_score >= 0.5 AND predicted_lang = 'en'
        ),
        cw AS (
            SELECT doc_id, string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
            FROM cand
        ),
        cidx AS (
            SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
            FROM cw
        ),
        cshingles AS (
            SELECT DISTINCT doc_id,
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
            FROM cidx
        ),
        ccounts AS (SELECT doc_id, COUNT(*) AS n_sh FROM cshingles GROUP BY doc_id),
        chashes AS (
            SELECT s.doc_id, g.k,
                   MIN(substr(md5((g.k // 4)::VARCHAR || '|' || s.sh),
                              (g.k % 4) * 8 + 1, 8)) AS mh
            FROM cshingles s, generate_series(0, 11) g(k)
            GROUP BY s.doc_id, g.k
        ),
        cbands AS (
            SELECT doc_id, k // 3 AS band,
                   string_agg(mh, '|' ORDER BY k) AS band_sig
            FROM chashes GROUP BY doc_id, k // 3
        ),
        callowed AS (
            SELECT band, band_sig FROM cbands
            GROUP BY band, band_sig HAVING COUNT(*) <= {_MAX_BAND_BUCKET}
        ),
        cbands_ok AS (SELECT b.* FROM cbands b JOIN callowed USING (band, band_sig)),
        ccand_pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM cbands_ok a JOIN cbands_ok b
              ON a.band = b.band AND a.band_sig = b.band_sig
             AND a.doc_id < b.doc_id
        ),
        cinter AS (
            SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
            FROM ccand_pairs c
            JOIN cshingles sa ON sa.doc_id = c.doc_a
            JOIN cshingles sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
            GROUP BY 1, 2
        ),
        dup_b AS (
            SELECT DISTINCT i.doc_b
            FROM cinter i
            JOIN ccounts ca ON ca.doc_id = i.doc_a
            JOIN ccounts cb ON cb.doc_id = i.doc_b
            WHERE i.n_common * 1.0 / (ca.n_sh + cb.n_sh - i.n_common) >= 0.5
        ),
        flagged AS (
            SELECT c.*, (d.doc_b IS NULL) AS is_kept
            FROM cand c LEFT JOIN dup_b d ON c.doc_id = d.doc_b
        ),
        inputs AS (SELECT source, COUNT(*) AS n_input FROM documents GROUP BY source)
        SELECT i.source,
               i.n_input,
               COUNT(f.doc_id) AS n_candidates,
               CAST(COALESCE(SUM(CASE WHEN f.is_kept THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_kept,
               CAST(COALESCE(SUM(CASE WHEN f.is_kept THEN f.n_tokens ELSE 0 END), 0) AS BIGINT) AS tokens_kept,
               ROUND(AVG(CASE WHEN f.is_kept THEN f.quality_score END), 4) AS avg_quality_kept
        FROM inputs i LEFT JOIN flagged f ON f.source = i.source
        GROUP BY i.source, i.n_input
    """


@register(
    "corpus_curation",
    doc=(
        "End-to-end training-corpus curation manifest — the composition a "
        "real data pipeline runs before tokenization: per-document quality "
        "scoring (text_quality_score formulas) -> language gate "
        "(text_language_id argmax = 'en') -> MinHash+LSH near-duplicate "
        "removal over the SURVIVING candidates (operators/minhash.py, "
        "greedy keep-lowest-doc_id: any candidate that is the doc_b of a "
        "verified pair is dropped) -> per-source manifest (inputs, "
        "candidates, kept, tokens kept, mean kept quality). Every stage "
        "stays declarative, so Catalyst fuses scoring+filter into the scan "
        "and the near-dup join runs only over the filtered candidate set — "
        "at 100 TB the quality gate prunes the expensive LSH stage's input "
        "by design, not by luck."
    ),
    oracle=_corpus_curation_oracle(),
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.functions.text import words
    from biocache_store_spark.operators.minhash import near_duplicates

    docs = read_table(spark, sf_dir, "documents")
    lt = F.lower(F.trim(F.col("text")))
    t = docs.select(
        "doc_id", "source", "text", lt.alias("lt"), words(F.col("text")).alias("toks")
    )
    n_tokens = F.size("toks")
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    punct_ratio = F.round(
        F.length(F.regexp_replace(F.col("lt"), r"[a-z0-9\s]", ""))
        / F.greatest(F.length("lt"), F.lit(1)),
        4,
    )
    stopword_ratio = F.round(
        F.size(F.filter(F.col("toks"), lambda x: x.isin(*_LANG_MARKERS["en"])))
        / safe_tokens,
        4,
    )
    def _marker_count(markers):
        # closure, not a default arg: Spark's lambda bridge binds every
        # declared parameter to a Column
        return F.size(F.filter(F.col("toks"), lambda x: x.isin(*markers)))

    marker_counts = {
        lang: _marker_count(markers) for lang, markers in _LANG_MARKERS.items()
    }
    m = t.select(
        "doc_id",
        "source",
        "text",
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        *[c.alias(f"s_{lang}") for lang, c in marker_counts.items()],
    )
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en"
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    quality = F.round(
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
        + (1.0 - F.col("punct_ratio")) * 0.3
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.2,
        4,
    )
    scored = m.select(
        "doc_id",
        "source",
        "text",
        "n_tokens",
        quality.alias("quality_score"),
        predicted.alias("predicted_lang"),
    )
    cand = scored.filter(
        (F.col("quality_score") >= 0.5) & (F.col("predicted_lang") == "en")
    )
    pairs = near_duplicates(
        cand.select("doc_id", "text"), threshold=0.5, max_bucket_size=_MAX_BAND_BUCKET
    )
    dup_b = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    flagged = cand.join(
        dup_b.withColumn("__dup", F.lit(True)), "doc_id", "left"
    ).withColumn("is_kept", F.col("__dup").isNull())
    inputs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_input"))
    per_source = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("is_kept"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("is_kept"), F.col("n_tokens")).otherwise(0)).alias(
            "tokens_kept"
        ),
        F.round(
            F.avg(F.when(F.col("is_kept"), F.col("quality_score"))), 4
        ).alias("avg_quality_kept"),
    )
    return (
        inputs.join(per_source, "source", "left")
        .select(
            "source",
            "n_input",
            F.coalesce(F.col("n_candidates"), F.lit(0)).alias("n_candidates"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("tokens_kept"), F.lit(0)).alias("tokens_kept"),
            "avg_quality_kept",
        )
    )


_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "bm25_search",
    doc=(
        "BM25 ranked retrieval over the document corpus — the search "
        "surface the reference builds its SOLR index FOR (the q= full-text "
        "path of SolrIndexDAO/stored queries), re-expressed as a scoring "
        "plan. idf is the rational BM25 form (N - df + 0.5)/(df + 0.5) "
        "without the log wrap (the repo's tfidf_top_terms convention: "
        "rational arithmetic only, so doubles are bit-identical to the "
        "SQL oracle; per-term rank order is unchanged, aggregate scores "
        "are compressed differently than log-idf and that divergence is "
        "deliberate and documented). The fixed query-term list pivots to "
        "per-term tf COLUMNS, so the score is a fixed-order expression — "
        "no float summation-order ambiguity — and the whole query is one "
        "shuffle (tf groupBy) plus a top-k."
    ),
    oracle=rf"""
        WITH w AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        base AS (
            SELECT doc_id, toks, len(toks) AS dl FROM w
            WHERE len(toks) > 0 AND toks[1] <> ''
        ),
        stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM base),
        tok AS (SELECT doc_id, dl, unnest(toks) AS term FROM base),
        tfs AS (
            SELECT doc_id, dl,
                   SUM(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS tf_spark,
                   SUM(CASE WHEN term = 'join' THEN 1 ELSE 0 END) AS tf_join,
                   SUM(CASE WHEN term = 'window' THEN 1 ELSE 0 END) AS tf_window
            FROM tok GROUP BY doc_id, dl
        ),
        dfs AS (
            SELECT SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
                   SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join,
                   SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
            FROM tfs
        ),
        scored AS (
            SELECT t.doc_id,
                   ((s.n - d.df_spark + 0.5) / (d.df_spark + 0.5))
                     * (t.tf_spark * (1.2 + 1.0))
                     / (t.tf_spark + 1.2 * (1.0 - 0.75 + (0.75 * t.dl) / s.avgdl))
                 + ((s.n - d.df_join + 0.5) / (d.df_join + 0.5))
                     * (t.tf_join * (1.2 + 1.0))
                     / (t.tf_join + 1.2 * (1.0 - 0.75 + (0.75 * t.dl) / s.avgdl))
                 + ((s.n - d.df_window + 0.5) / (d.df_window + 0.5))
                     * (t.tf_window * (1.2 + 1.0))
                     / (t.tf_window + 1.2 * (1.0 - 0.75 + (0.75 * t.dl) / s.avgdl))
                   AS score
            FROM tfs t CROSS JOIN stats s CROSS JOIN dfs d
            WHERE t.tf_spark + t.tf_join + t.tf_window > 0
        ),
        ranked AS (
            SELECT doc_id, ROUND(score, 4) AS score,
                   ROW_NUMBER() OVER (ORDER BY ROUND(score, 4) DESC, doc_id) AS rank
            FROM scored
        )
        SELECT doc_id, score, rank FROM ranked WHERE rank <= 15
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from biocache_store_spark.functions.text import words
    from biocache_store_spark.util import ensure_min_parallelism

    docs = read_table(spark, sf_dir, "documents")
    toks = words(F.col("text"))
    base = (
        ensure_min_parallelism(docs.select("doc_id", "text"))
        .select("doc_id", toks.alias("toks"))
        .withColumn("dl", F.size("toks"))
        .filter((F.col("dl") > 0) & (F.col("toks")[0] != ""))
    )
    row = base.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n, avgdl = float(row["n"]), float(row["avgdl"])

    tok = base.select("doc_id", "dl", F.explode("toks").alias("term"))
    tfs = tok.groupBy("doc_id", "dl").agg(
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{t}")
            for t in _BM25_TERMS
        ]
    )
    df_row = tfs.agg(
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in _BM25_TERMS
        ]
    ).collect()[0]

    k1, b = _BM25_K1, _BM25_B
    score = None
    # fixed left-to-right term order — float addition order is part of the
    # oracle contract
    for t in _BM25_TERMS:
        idf = (n - float(df_row[f"df_{t}"]) + 0.5) / (float(df_row[f"df_{t}"]) + 0.5)
        tf = F.col(f"tf_{t}")
        contrib = (
            F.lit(idf)
            * (tf * (k1 + 1.0))
            / (tf + k1 * (1.0 - b + (b * F.col("dl")) / F.lit(avgdl)))
        )
        score = contrib if score is None else score + contrib
    scored = tfs.filter(
        sum(F.col(f"tf_{t}") for t in _BM25_TERMS) > 0
    ).withColumn("score", F.round(score, 4))
    # top-k as orderBy().limit(k) — TakeOrderedAndProject, per-partition
    # heaps — NOT a global row_number window over every matching document
    # (which moves the whole scored relation to ONE task; at corpus scale a
    # common query term makes that task the job). The single-partition
    # window then ranks only the k surviving rows (pq_topk's pattern,
    # operators/similarity.py).
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(15)
        .withColumn("rank", F.row_number().over(w))
        .select("doc_id", "score", "rank")
    )


@register(
    "lsh_index_probe",
    doc=(
        "Incremental near-dup probe (operators/minhash.py "
        "write_lsh_index/probe_lsh_index): the corpus minus every 5th "
        "document is signed and persisted as the LSH index (signatures + "
        "band keys partitioned by band); the held-out batch is then "
        "shingled ALONE and probed against the stored bands — per-ingest "
        "cost proportional to the batch, never the corpus. The oracle is "
        "the full-corpus minhash pipeline restricted to pairs touching "
        "the batch, which is exactly what probe must reproduce: "
        "candidates with a new member are generated identically whether "
        "the other side was signed now or long ago."
    ),
    oracle=f"""
        WITH {_MINHASH_PAIRS_CTES}
        SELECT doc_a, doc_b, jaccard FROM pairs
        WHERE doc_a % 5 = 0 OR doc_b % 5 = 0
    """,
)
def lsh_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from biocache_store_spark.operators.minhash import (
        probe_lsh_index,
        write_lsh_index,
    )

    docs = read_table(spark, sf_dir, "documents")
    old = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) != 0)
    new = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
    path = tempfile.mkdtemp(prefix="lsh_idx_")
    write_lsh_index(old, path)
    return probe_lsh_index(
        spark, path, new, threshold=0.5, max_bucket_size=_MAX_BAND_BUCKET
    )
