"""Corpus-curation operators a training-data pipeline needs beyond dedup.

These generalize the reference's record-local hygiene layer (parser/
processor stages that normalize, validate and dedupe occurrence records,
e.g. processor/Processors.scala:16-29 ordering, the MD5 dedup discipline of
load/MediaStore.scala:234-285) to the operations run over a 100 TB text
corpus before training:

  * n-gram decontamination  — remove/flag training documents that overlap
    an evaluation benchmark (the standard 8/13-gram overlap check),
  * sliding-window chunking — split long documents into fixed token
    windows with stride,
  * stratified sampling     — deterministic hash-based per-stratum keeps,
  * sequence packing        — contiguous token-budget bin assignment.

Every operator is deterministic (md5-based hashing, doc_id ordering) so
each has an EXACT DuckDB oracle — no probabilistic slack in tests.

Scale shape: decontamination broadcasts only the benchmark shingle set
(benchmarks are small by construction; the training side streams),
chunking/sampling are embarrassingly parallel maps, and packing shuffles
once on the stratum key with a single window pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocache_store_spark.functions.text import text_shingles, words


def ngram_overlap(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per training document: how many of its distinct n-gram shingles
    appear anywhere in the benchmark corpus.

    Returns (id, n_sh, n_overlap, overlap_ratio) for every training doc
    with at least one shingle. The benchmark side is reduced to its
    DISTINCT shingle set and explicitly broadcast: an eval benchmark is
    small by construction, while the training side at corpus scale must
    stream map-side — this is the one join in the repo where broadcast is
    the *scale-correct* choice, not a small-SF artifact.
    """
    from biocache_store_spark.util import ensure_min_parallelism

    t = ensure_min_parallelism(train.select(id_col, text_col)).select(
        id_col, F.explode(text_shingles(F.col(text_col), n)).alias("sh")
    )
    b = (
        benchmark.select(F.explode(text_shingles(F.col(text_col), n)).alias("sh"))
        .distinct()
    )
    counts = t.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    overlap = (
        t.join(F.broadcast(b), "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        counts.join(overlap, id_col, "left")
        .select(
            id_col,
            "n_sh",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)) / F.col("n_sh"), 4
            ).alias("overlap_ratio"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 20,
    stride: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding token windows per document: (id, chunk_idx, chunk, n_tok).

    Starts at token 1, 1+stride, 1+2*stride, ... up to the last FULL
    window (len - window + 1); a document shorter than one window yields
    exactly one (possibly partial) chunk. Tokens are the normalized
    lower-cased whitespace tokens of `words`, so chunk text is already in
    model-input form. Embarrassingly parallel — no shuffle beyond the
    small-input fan-out.
    """
    from biocache_store_spark.util import ensure_min_parallelism

    toks = ensure_min_parallelism(docs.select(id_col, text_col)).select(
        id_col, words(F.col(text_col)).alias("toks")
    )
    toks = toks.withColumn("n", F.size("toks")).filter(
        (F.col("n") > 0) & (F.col("toks")[0] != "")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("n") - window + 1, F.lit(1)), F.lit(stride)
    )
    ex = toks.select(
        id_col, "toks", "n", F.posexplode(starts).alias("chunk_idx", "start")
    )
    piece = F.slice(F.col("toks"), F.col("start"), F.lit(window))
    return ex.select(
        id_col,
        "chunk_idx",
        F.concat_ws(" ", piece).alias("chunk"),
        F.least(F.lit(window), F.col("n") - F.col("start") + 1).alias("n_tok"),
    )


def dedup_spans(
    chunks: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "chunk_idx",
    text_col: str = "chunk",
) -> DataFrame:
    """Corpus-wide exact span dedup: keep only the FIRST occurrence (by
    (id, order)) of every distinct span text, dropping repeats anywhere
    else in the corpus — the exact-substring dedup pass (RefinedWeb/
    "dedup at chunk granularity") run after `chunk_documents`.

    Scale shape: ONE shuffle, keyed on md5(span) — never the span text —
    and implemented as groupBy + min(struct(...)) rather than a
    row_number window so Spark's partial aggregation collapses hot spans
    map-side (a boilerplate span repeated 10^6 times is 1 row per input
    partition after the combiner; a window would sort all 10^6 in one
    reducer). The whole surviving row rides inside the min struct:
    ordering is (id, order) first, so the min IS the first occurrence
    with its payload, no join-back needed.
    """
    rest = [c for c in chunks.columns if c not in (id_col, order_col)]
    keyed = F.struct(
        F.col(id_col).alias(id_col),
        F.col(order_col).alias(order_col),
        *[F.col(c).alias(c) for c in rest],
    )
    agg = chunks.groupBy(F.md5(F.col(text_col)).alias("__span_h")).agg(
        F.min(keyed).alias("__keep")
    )
    return agg.select(*[F.col(f"__keep.{c}").alias(c) for c in chunks.columns])


def repeated_substring_spans(
    docs: DataFrame,
    min_len: int = 40,
    anchor_k: int = 8,
    anchor_hex_zeros: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    segment_chars: int = 1 << 16,
) -> DataFrame:
    """Cross-document EXACT repeated-substring detection — the
    suffix-array dedup of Lee et al. 2021 ("Deduplicating Training Data
    Makes Language Models Better") re-expressed with content-defined
    anchors so the whole pass is JVM expressions: a position p is an
    ANCHOR when md5 of the k-gram starting there opens with
    `anchor_hex_zeros` hex zeros (expected anchor density 16^-z — the
    mod-p sampling of winnowing/MOSS). Identical content picks identical
    anchors in EVERY copy, so two copies of a repeated region share all
    interior anchors and their `min_len`-char windows hash equal — the
    alignment problem that defeats fixed-stride shingling never arises.
    Every window whose hash occurs elsewhere in the corpus (or earlier in
    the same document), EXCEPT the corpus-wide first occurrence by
    (doc, pos), is a duplicate window; per document, overlapping/adjacent
    duplicate windows merge into maximal `[span_start, span_end)` cut
    spans (`remove_spans` applies them).

    Scale shape: anchoring + window hashing are per-row expressions (no
    shuffle); one shuffle groups window hashes (map-side combined
    min-struct, the dedup_spans discipline — hot windows collapse before
    the exchange); the join back broadcasts when the repeated set is
    small; the interval merge windows per DOCUMENT (no global window).
    Cost is ~one md5 per character (the same work winnowing does) —
    embarrassingly parallel, no candidate explosion. Detection is exact
    (md5-keyed, like dedup_spans); a repeated region is found whenever it
    fully contains at least one anchor window, i.e. expected-miss only
    for repeats shorter than ~min_len + 16^z characters.
    `anchor_hex_zeros=0` is EXACT mode: every position is an anchor, so
    every repeat of length >= min_len is guaranteed caught (the full
    Lee et al. recall guarantee) at ~16× the window-hash volume of z=1
    — the knob for decontamination users who need no-miss semantics.

    Long documents are anchored in `segment_chars`-char slices (each
    carrying min_len-1 chars of lookahead so every window start is
    covered exactly once): the per-row transient state is then bounded
    by the segment size, not the document — a multi-MB crawl document
    must not materialize an O(doc_length) position array (or ride whole
    through the explode) in one task. Positions stay document-absolute,
    so the output is independent of segment_chars (pinned by test)."""
    wins = _anchor_windows(
        docs, min_len, anchor_k, anchor_hex_zeros, id_col, text_col,
        segment_chars,
    )
    firsts = wins.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
            "__first"
        ),
        F.count(F.lit(1)).alias("__n"),
    ).filter(F.col("__n") >= 2)
    dup_wins = wins.join(firsts, "__h").where(
        ~(
            (F.col(id_col) == F.col("__first.i"))
            & (F.col("pos") == F.col("__first.p"))
        )
    )
    return _merge_window_spans(dup_wins, min_len, id_col)


def _anchor_windows(
    docs: DataFrame,
    min_len: int,
    anchor_k: int,
    anchor_hex_zeros: int,
    id_col: str,
    text_col: str,
    segment_chars: int,
) -> DataFrame:
    """(id, pos, __h): every content-defined anchor position with the
    md5 of its min_len-char window — the shared front end of
    repeated_substring_spans and substring_decontaminate. Documents are
    processed in bounded slices with min_len-1 lookahead; positions are
    document-absolute."""
    L, k, S = int(min_len), int(anchor_k), int(segment_chars)
    if S < 1:
        raise ValueError("segment_chars must be >= 1")
    if k > L:
        # segments carry only min_len-1 chars of lookahead, so a k-gram
        # starting near a segment boundary would truncate differently
        # than in the unsegmented document — anchor selection (and spans)
        # would silently depend on segment_chars
        raise ValueError(
            f"anchor_k ({k}) must be <= min_len ({L}): the segment "
            "lookahead only covers min_len-1 chars, so longer anchor "
            "k-grams would break segmentation invariance"
        )
    if anchor_hex_zeros < 0:
        raise ValueError("anchor_hex_zeros must be >= 0")
    zeros = "0" * anchor_hex_zeros
    # Fan the anchor scan out before the segment explode: the per-row
    # cost here (~one md5 per character through interpreted HOF lambdas)
    # lands on however many tasks the scan produced — one, for a small
    # single-file corpus — the same input-skew shape as the name-match
    # ladder and hashed-feature passes. Projected first so the fan-out
    # exchange moves only (id, text); no-op at real scale.
    from biocache_store_spark.util import ensure_min_parallelism

    base = ensure_min_parallelism(
        docs.filter(F.length(text_col) >= L).select(id_col, text_col)
    )
    segs = base.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, length({text_col}) - {L}, {S}), "
                f"b -> named_struct("
                f"'base', b, "
                f"'seg', substring({text_col}, b + 1, {S + L - 1}), "
                f"'n', least({S}, length({text_col}) - {L} + 1 - b)))"
            )
        ).alias("__s"),
    )
    if anchor_hex_zeros == 0:
        # EXACT mode — every position is an anchor (the Lee et al.
        # no-miss guarantee: any >= min_len repeat contains a window).
        # Skip the anchor md5 entirely: the filter predicate
        # substring(md5(..), 1, 0) = '' is vacuously true, so computing
        # one extra md5 per character would be pure waste.
        offsets = F.expr("sequence(0, __s.n - 1)")
    else:
        offsets = F.expr(
            f"filter(sequence(0, __s.n - 1), "
            f"q -> substring(md5(substring(__s.seg, q + 1, {k})), "
            f"1, {int(anchor_hex_zeros)}) = '{zeros}')"
        )
    return segs.select(
        F.col(id_col),
        F.col("__s.base").alias("__b"),
        F.col("__s.seg").alias("__seg"),
        F.explode(offsets).alias("__q"),
    ).select(
        id_col,
        (F.col("__b") + F.col("__q")).alias("pos"),
        F.md5(F.expr(f"substring(__seg, __q + 1, {L})")).alias("__h"),
    )


def _merge_window_spans(
    wins: DataFrame, min_len: int, id_col: str
) -> DataFrame:
    """Merge flagged (id, pos) windows into maximal per-document
    `[span_start, span_end)` spans — overlapping or adjacent windows
    coalesce. Windowed per DOCUMENT, never globally."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(int(min_len))).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = (prev_end.isNull() | (F.col("pos") > prev_end)).cast("int")
    grp = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        wins.withColumn("__g", grp)
        .groupBy(id_col, "__g")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(int(min_len))).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def substring_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    min_len: int = 40,
    anchor_k: int = 8,
    anchor_hex_zeros: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    segment_chars: int = 1 << 16,
) -> DataFrame:
    """Exact-substring eval decontamination (the Lee et al. application
    of the suffix-array machinery, and the exact-match complement of the
    token-shingle `ngram_decontamination`): train-document spans sharing
    a >= min_len-char EXACT substring with any eval document are flagged
    as `[span_start, span_end)` contamination spans — cut them with
    `remove_spans`, or drop flagged docs wholesale. Both corpora are
    anchored with the same content-defined rule, so a shared substring
    anchors identically on both sides and alignment misses never arise;
    recall carries the same anchor-density caveat as
    repeated_substring_spans (a shared region is found when it fully
    contains an anchor window — expected miss only for overlaps shorter
    than ~min_len + 16^anchor_hex_zeros chars; anchor_hex_zeros=0 is
    exhaustive).

    Scale shape: eval windows reduce to a DISTINCT hash set (tiny — eval
    suites are benchmark-sized), the probe is one semi join on the hash
    (AQE broadcasts the eval side at runtime), and the interval merge
    windows per train document. The train side is the same one-pass
    anchor scan as repeated_substring_spans."""
    tw = _anchor_windows(
        train, min_len, anchor_k, anchor_hex_zeros, id_col, text_col,
        segment_chars,
    )
    ew = _anchor_windows(
        eval_docs, min_len, anchor_k, anchor_hex_zeros, id_col, text_col,
        segment_chars,
    ).select("__h").distinct()
    hits = tw.join(ew, "__h", "left_semi")
    return _merge_window_spans(hits, min_len, id_col)


def remove_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut `[span_start, span_end)` character ranges (repeated_
    substring_spans output) out of each document's text — the removal
    half of the Lee et al. pass. Spans are aggregated per document
    (sorted, they are disjoint by construction) and the splice is one
    JVM aggregate over the array: fold the kept gaps between spans with
    substring concatenation — no Python in the path. Documents without
    spans pass through verbatim."""
    agg = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans")
    )
    out = docs.join(agg, id_col, "left")
    # fold: acc = (kept_text, cursor); each span appends the gap before
    # it and advances the cursor to its end; finish appends the tail
    spliced = F.expr(
        f"""aggregate(
              __spans,
              named_struct('kept', CAST('' AS STRING), 'cur', 0),
              (acc, s) -> named_struct(
                  'kept', concat(acc.kept,
                                 substring({text_col}, acc.cur + 1,
                                           s.span_start - acc.cur)),
                  'cur', CAST(s.span_end AS INT)),
              acc -> concat(acc.kept, substring({text_col}, acc.cur + 1,
                                                length({text_col}) - acc.cur))
        )"""
    )
    return out.withColumn(
        text_col,
        F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(spliced),
    ).drop("__spans")


def remove_boilerplate(
    chunks: DataFrame,
    max_doc_freq: int = 2,
    id_col: str = "doc_id",
    text_col: str = "chunk",
) -> DataFrame:
    """Boilerplate-span removal: drop EVERY occurrence of a span that
    appears in more than `max_doc_freq` distinct documents — the
    CCNet-style common-paragraph filter (headers, footers, cookie
    banners), run after `chunk_documents`. Distinct from `dedup_spans`,
    which keeps the first occurrence: boilerplate is noise in every copy,
    so no copy survives.

    Scale shape: document frequency is computed as dropDuplicates(
    (md5(span), id)) + count — i.e. two shuffles on the span hash, both
    with map-side partial aggregation, never on the span text. The
    flagged set (spans OVER the threshold) is tiny relative to the corpus
    by construction, so the removal join is a broadcast-able left_anti on
    the hash; AQE picks broadcast once the flagged side's size is known
    at runtime.
    """
    h = F.md5(F.col(text_col)).alias("__span_h")
    flagged = (
        chunks.select(h, F.col(id_col))
        .dropDuplicates(["__span_h", id_col])
        .groupBy("__span_h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select("__span_h")
    )
    return (
        chunks.withColumn("__span_h", F.md5(F.col(text_col)))
        .join(flagged, "__span_h", "left_anti")
        .drop("__span_h")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    thresholds: dict[str, str],
    id_col: str = "doc_id",
    default_threshold: str = "00",
) -> DataFrame:
    """Deterministic hash sampling with a per-stratum rate.

    A row is kept when the first two hex chars of md5(id) compare below
    the stratum's 2-hex-digit threshold — '1a' keeps ~26/256 = 10.2%,
    '40' ~25%, '80' ~50%. Comparing IN HEX-STRING SPACE sidesteps any
    hex->integer conversion differences between engines: the predicate is
    a plain string comparison both here and in the SQL oracle. Sampling
    is a map-side filter — no shuffle, no RNG, stable across runs,
    partitionings and engines (the property `sample()` cannot give).
    """
    thr = F.lit(default_threshold)
    for k, v in sorted(thresholds.items()):
        thr = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(thr)
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return df.filter(bucket < thr)


def _strip_www(host):
    return F.when(
        host.startswith("www."), host.substr(F.lit(5), F.length(host))
    ).otherwise(host)


def extract_domain(url):
    """Host of a URL column, lowercased, leading 'www.' stripped — pure
    built-ins (parse_url is JVM-side), NULL for unparseable values. The
    key every URL-curation stage groups on."""
    col = F.col(url) if isinstance(url, str) else url
    # try_parse_url: web-crawl URL columns ALWAYS contain garbage, and
    # ANSI parse_url would fail the whole job on the first bad row
    return _strip_www(F.lower(F.try_parse_url(col, F.lit("HOST"))))


def filter_blocked_domains(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop documents whose URL's domain is on a blocklist (one `domain`
    column) — the URL-filtering stage every web-scale corpus build runs
    (C4/RefinedWeb/Gopher all begin here). A left_anti on the extracted
    domain; blocklists are dim-sized, so the optimizer broadcasts."""
    # the blocklist side gets the SAME normalization as the extracted
    # domains (lowercase + www-strip): real-world blocklists routinely
    # carry 'www.' entries, which would otherwise never match the
    # always-stripped document side and silently pass blocked content
    return (
        docs.withColumn("__domain", extract_domain(url_col))
        .join(
            blocklist.select(
                _strip_www(F.lower(F.col("domain"))).alias("__domain")
            ),
            "__domain",
            "left_anti",
        )
        .drop("__domain")
    )


def cap_per_domain(
    docs: DataFrame,
    max_docs: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most `max_docs` documents per domain, deterministically
    (the first `max_docs` by id) — the domain-domination guard
    (RefinedWeb's per-domain caps): without it one mirror farm or SEO
    host dominates the corpus after dedup.

    ONE window over the domain key, measured against a count-first
    split (count domains, pass under-cap domains through semi-joins,
    window only the over-cap rows — the shape the hot-key discipline
    suggests): at 20M rows with HALF the corpus in one viral domain
    (idle box, min-of-3; SCALE.md round 7) the split read 13.5 s vs
    2.4 s for a plain window and 2.7 s for this sentinel-keyed form —
    the split's three URL-parsing scans and two shuffle joins cost far
    more than the sorts it skips, and it cannot avoid the one sort
    that matters anyway (over-cap domains still window, and
    row_number's per-domain sort lands in one task under EITHER
    shape). The honest skew ceiling is therefore the window's: a
    domain's rows sort in a single task (10M rows ≈ 2 s; a
    pathological 10^9-row domain needs a pre-filter or a coarser key
    before this operator — see the SCALE.md round-7 entry).
    Unparseable URLs (NULL domain) pass through untouched — there is
    no domain to dominate ON, and dropping junk-URL rows is a quality
    filter's decision, not the guard's."""
    from pyspark.sql.window import Window

    if max_docs < 1:
        raise ValueError("cap_per_domain: max_docs must be >= 1")
    keyed = docs.withColumn("__domain", extract_domain(url_col))
    # NULL domains get a PER-ROW sentinel partition ('\\x00' cannot open a
    # real hostname): each junk-URL row is its own 1-row window (rn = 1,
    # always kept) instead of every NULL pooling into one skewed
    # partition that a garbage-heavy crawl would sort in a single task.
    # The monotonic id is appended UNCONDITIONALLY: keying the sentinel
    # by id alone would pool junk rows SHARING an id value and silently
    # cap them, and the pass-through guarantee must not depend on id
    # hygiene. (Task retries may renumber the monotonic ids, but every
    # sentinel partition stays single-row — rn = 1 regardless — so the
    # output is retry-deterministic anyway.)
    part = F.coalesce(
        F.col("__domain"),
        F.concat(
            F.lit("\x00"), F.monotonically_increasing_id().cast("string")
        ),
    )
    # "first max_docs by id, deterministically" must hold on dirty input
    # too: Spark sorts ASC NULLS FIRST by default, which would hand
    # NULL-id rows the cap slots ahead of every real id — so NULLs sort
    # LAST, and a content hash breaks ties among them (rows identical in
    # every hashable column remain interchangeable, so the surviving
    # multiset is still deterministic under any partitioning). MapType
    # columns are excluded from the hash — xxhash64 rejects them (maps
    # have no canonical element order), and a metadata map column must
    # not make the cap throw.
    def _hashable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    tiebreak_cols = [
        f.name for f in docs.schema.fields if _hashable(f.dataType)
    ]
    tiebreak = (
        F.xxhash64(*tiebreak_cols) if tiebreak_cols else F.lit(0)
    )
    w = Window.partitionBy(part).orderBy(
        F.col(id_col).asc_nulls_last(), tiebreak
    )
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_docs)
        .drop("__rn", "__domain")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 200,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous token-budget packing: assign each document to a bin so
    concatenating a bin's documents (in id order) stays near `budget`
    tokens.

    Documents are taken in deterministic id order within a stratum; a
    document starting at cumulative offset c goes to bin floor(c/budget).
    This is the streaming variant of first-fit packing — single window
    pass over one shuffle on the stratum key, which is how packing has to
    work at corpus scale (a true bin-packing pass would be a global
    sort + sequential state). Returns (stratum, bin, n_docs, n_tokens).
    """
    from pyspark.sql.window import Window

    tok = docs.select(
        stratum_col,
        id_col,
        F.size(words(F.col(text_col))).alias("n_tok"),
    )
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = tok.withColumn(
        "bin",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / budget),
    )
    return binned.groupBy(stratum_col, "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )


def plan_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    default_weight: float = 0.0,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Training-mixture planning: given per-source target weights and a
    global token budget, compute what each source can supply and how to
    sample it — the data-mixing stage (DoReMi-style reweighting, every
    pretraining pipeline's first planning query).

    Per source: available_tok (whitespace tokens on hand), target_tok
    (budget x weight), epochs = target/available (>1 means the source
    must repeat), sample_rate = min(1, epochs) (the keep probability when
    downsampling). One groupBy on the source key; the weight table is a
    literal CASE expression, so the plan is a single partial-agg shuffle
    however large the corpus — the output is one row per source.

    All ratios are ROUNDed to 4 places in-operator so the result is
    engine-exact (double division both sides).
    """
    weight_expr = F.lit(default_weight)
    for src, wgt in sorted(weights.items()):
        weight_expr = F.when(F.col(source_col) == src, F.lit(wgt)).otherwise(
            weight_expr
        )
    per_source = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words(F.col(text_col)))).alias("available_tok"),
    )
    target = F.round(F.lit(float(token_budget)) * weight_expr, 4)
    epochs = F.round(
        target / F.greatest(F.col("available_tok").cast("double"), F.lit(1.0)), 4
    )
    return per_source.select(
        source_col,
        "n_docs",
        "available_tok",
        weight_expr.alias("weight"),
        target.alias("target_tok"),
        epochs.alias("epochs"),
        F.round(F.least(epochs, F.lit(1.0)), 4).alias("sample_rate"),
    )


def bigram_lm_score(
    train_docs: DataFrame,
    ref_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Reference-corpus bigram language-model scoring — the CCNet-style
    "perplexity filter" stage (score each training document by how well a
    LM trained on a trusted reference corpus predicts it), made
    engine-exact: instead of a mean of per-bigram log-probabilities
    (transcendental, summation-order-sensitive), the score is the
    quotient of two integer sums over the document's bigrams with
    add-one smoothing,

        lm_score = SUM(m * (C(w1,w2) + 1)) / SUM(m * (C(w1) + V))

    where m is the bigram's multiplicity in the document, C(.) are
    reference-corpus counts and V the reference vocabulary size. Exact
    integer aggregation in any order, ONE double division at the end —
    bit-identical across engines and partitionings. Monotone in the same
    direction as mean probability: higher = closer to the reference.

    Scale shape: the reference LM is a dimension by construction (a
    trusted corpus, not the 100 TB training set), so its bigram/context
    tables broadcast; each training document's bigrams collapse to
    (doc, w1, w2, m) map-side before the join; one shuffle on the doc key
    for the final rollup. Documents with no bigrams are omitted.

    Returns (id, n_bigrams, n_hits, hit_rate, lm_score): hit_rate is the
    fraction of bigram occurrences seen in the reference at all.
    """
    # NOTE (r12): an ensure_min_parallelism fan-out of both bigrams()
    # inputs was measured (A/B/A, sf0.1 isolated min) at 1.41 s -> 1.92 s:
    # the added exchanges (train side + the ref side consumed twice by
    # c2/c1) cost more than the single-task explode they parallelize.
    # Rejected; the map-side (doc,w1,w2,m) collapse stays as-is.
    def bigrams(df: DataFrame) -> DataFrame:
        toks = df.select(F.col(id_col), words(F.col(text_col)).alias("toks"))
        toks = toks.filter((F.size("toks") > 1) & (F.col("toks")[0] != ""))
        bg = F.expr(
            "transform(sequence(0, size(toks)-2),"
            " i -> struct(toks[i] AS w1, toks[i+1] AS w2))"
        )
        return toks.select(F.col(id_col), F.explode(bg).alias("b")).select(
            id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
        )

    ref_bg = bigrams(ref_docs)
    c2 = ref_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = ref_bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    ref_toks = ref_docs.select(F.explode(words(F.col(text_col))).alias("w"))
    v = ref_toks.filter(F.col("w") != "").agg(
        F.countDistinct("w").alias("__v")
    )

    m = bigrams(train_docs).groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("m")
    )
    joined = (
        m.join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .crossJoin(F.broadcast(v))
    )
    numer = F.sum(F.col("m") * (F.coalesce(F.col("c2"), F.lit(0)) + 1))
    denom = F.sum(
        F.col("m") * (F.coalesce(F.col("c1"), F.lit(0)) + F.col("__v"))
    )
    hits = F.sum(
        F.when(F.col("c2").isNotNull(), F.col("m")).otherwise(F.lit(0))
    )
    n_bg = F.sum("m")
    return joined.groupBy(id_col).agg(
        n_bg.alias("n_bigrams"),
        hits.alias("n_hits"),
        F.round(hits * F.lit(1.0) / n_bg, 4).alias("hit_rate"),
        F.round(numer * F.lit(1.0) / denom, 8).alias("lm_score"),
    )


def hashed_feature_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hex: int = 3,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Hashed n-gram bag features: every word unigram ('u|tok') and
    bigram ('b|w1 w2') of a document, hashed into 16^n_hex buckets by
    the first n_hex chars of its md5 hex — the feature family of DSIR
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling"). Buckets are STRING keys (hex prefixes) so any engine
    reproduces them exactly; multiplicity is preserved (bag, not set).
    Returns (id, *carry_cols, bucket) one row per feature OCCURRENCE —
    callers aggregate map-side before any shuffle; carry_cols ride the
    explode so callers never join row attributes (e.g. a training
    label) back onto the occurrence-scale relation. Documents with no
    tokens contribute no rows."""
    from biocache_store_spark.util import ensure_min_parallelism

    carried = [F.col(c) for c in carry_cols]
    # Fan out before tokenize+explode so the per-occurrence feature work
    # parallelizes even when the corpus arrives as a single scan split
    # (no-op at real scale); project to only the needed columns first so
    # the fan-out shuffle moves nothing extra (guide §2.3).
    docs = ensure_min_parallelism(
        docs.select(F.col(id_col), *carried, F.col(text_col))
    )
    toks = F.filter(words(F.col(text_col)), lambda t: t != "")
    with_toks = docs.select(F.col(id_col), *carried, toks.alias("__toks"))
    uni = F.transform(F.col("__toks"), lambda t: F.concat(F.lit("u|"), t))
    bi = F.when(
        F.size("__toks") > 1,
        F.expr(
            "transform(sequence(0, size(__toks)-2),"
            " i -> concat('b|', __toks[i], ' ', __toks[i+1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = with_toks.select(
        F.col(id_col), *carried, F.explode(F.concat(uni, bi)).alias("__f")
    )
    return exploded.select(
        F.col(id_col),
        *carried,
        F.substring(F.md5("__f"), 1, n_hex).alias("bucket"),
    )


def dsir_importance(
    train_docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hex: int = 3,
    mode: str = "rational",
) -> DataFrame:
    """DSIR-style importance weighting over hashed n-gram bag features
    (Xie et al. 2023): score each raw-corpus document by how much more
    probable its features are under the TARGET (trusted) corpus's
    hashed-n-gram distribution than under the raw corpus's own.

    Engine-exact deviation, documented: exact DSIR uses the log-ratio
    sum Σ c_f·(log p_f − log q_f) (a geometric mean of per-feature
    ratios) — transcendental and summation-order-sensitive. Following
    this module's rational-arithmetic discipline (see bigram_lm_score),
    the score here is the ARITHMETIC-mean analog with the same add-one
    smoothing over B = 16^n_hex buckets:

        importance = [Σ c_b·(cp_b+1)] · (Nq+B)
                     ─────────────────────────
                     [Σ c_b·(cq_b+1)] · (Np+B)

    i.e. the ratio of the document's mean smoothed target-probability to
    its mean smoothed raw-probability. Integer sums in any order, ONE
    double expression at the end — bit-identical across engines and
    partitionings, and monotone in the same direction as the DSIR
    weight (>1 = more target-like).

    Scale shape: the target corpus is a dimension by construction (a
    trusted corpus, not the 100 TB raw set), and BOTH per-bucket count
    tables collapse to at most B = 16^n_hex rows (4096 at the default)
    with map-side partial aggregation, so they broadcast. Scoring joins
    each feature OCCURRENCE to the broadcast stats and sums straight to
    the doc key — Σ_b c_b·(x_b+1) = Σ_occurrences (x_b+1), so no
    (doc, bucket) rollup exists: that rollup barely reduces (most
    bucket multiplicities are 1, measured ~64M occurrences -> 47M
    groups at 500k docs) and would shuffle nearly the whole exploded
    relation, while groupBy(doc) map-side-combines occurrences to one
    row per document before the only corpus-size shuffle. The corpus
    is scanned twice (once for its own histogram, once for scoring) —
    the honest minimum, since q must be complete before any score.
    Documents with no features are omitted (no tokens = no evidence).

    mode="log_ratio" (opt-in) computes the PUBLISHED estimator instead:
    Σ_f c_f·(log p̂_f − log q̂_f) with the same add-one smoothing —
    citable as DSIR proper. It is a float log-sum, so the result is
    summation-order-sensitive (±1ulp across partitionings) and carries
    no SQL oracle; the rational default stays the oracle-checked mode.
    Both modes rank separable corpora identically (test-verified); the
    plan shape (broadcast stats, straight-to-doc reduction) is shared.

    Returns (id, n_feats, importance) with importance rounded to 8."""
    if mode not in ("rational", "log_ratio"):
        raise ValueError(
            f"dsir_importance: unknown mode {mode!r} "
            "(expected 'rational' or 'log_ratio')"
        )
    b_total = 16**n_hex
    tgt = hashed_feature_buckets(target_docs, id_col, text_col, n_hex)
    raw = hashed_feature_buckets(train_docs, id_col, text_col, n_hex)
    cp = tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("cp"))
    # a featureless target (empty, or all-blank text) has no evidence to
    # weight against; without this guard every importance would be NULL
    # and downstream selection would silently rank by id alone —
    # coalesce short-circuits, so raise_error fires only on NULL
    np_ = cp.agg(F.sum("cp").alias("np")).select(
        F.coalesce(
            F.col("np"),
            F.expr(
                "CAST(raise_error('dsir_importance: target corpus has"
                " no features') AS BIGINT)"
            ),
        ).alias("np")
    )
    cq = raw.groupBy("bucket").agg(F.count(F.lit(1)).alias("cq"))
    nq = cq.agg(F.sum("cq").alias("nq"))
    # ONE broadcast stats relation + ONE combined scalar row instead of
    # four separate broadcast probes per feature occurrence (r13, guide
    # §3.1): cp/cq merge bucket-wise (full outer — every raw bucket is
    # in cq by construction, so the left join below still sees a row
    # for every occurrence and the coalesce(+1) smoothing is
    # unchanged), np/nq ride one 1-row cross join. Halves the join work
    # over the occurrence-scale side; measured 1.65/1.41 → 1.05/1.14 s
    # at sf0.1, bit-identical output (exceptAll 0 both directions).
    stats = cp.join(cq, "bucket", "full")
    totals = np_.crossJoin(nq)
    joined = (
        raw.join(F.broadcast(stats), "bucket", "left")
        .crossJoin(F.broadcast(totals))
    )
    smoothed_cp = F.coalesce(F.col("cp"), F.lit(0)) + 1
    smoothed_cq = F.coalesce(F.col("cq"), F.lit(0)) + 1
    if mode == "log_ratio":
        # Σ_occ [log(cp_b+1) − log(cq_b+1)] + n_feats·[log(Nq+B) − log(Np+B)]
        # = Σ_f c_f·(log p̂_f − log q̂_f) — Xie et al.'s importance weight
        per_occ = F.log(smoothed_cp.cast("double")) - F.log(
            smoothed_cq.cast("double")
        )
        const = F.log((F.first("nq") + F.lit(b_total)).cast("double")) - F.log(
            (F.first("np") + F.lit(b_total)).cast("double")
        )
        importance = F.round(
            F.sum(per_occ) + F.count(F.lit(1)).cast("double") * const, 8
        )
    else:
        num = F.sum(smoothed_cp)
        den = F.sum(smoothed_cq)
        # np/nq are constant within every group; first() keeps them through
        # the aggregation without a re-join
        importance = F.round(
            (num.cast("double") * (F.first("nq") + F.lit(b_total)).cast("double"))
            / (den.cast("double") * (F.first("np") + F.lit(b_total)).cast("double")),
            8,
        )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_feats"), importance.alias("importance")
    )


def dsir_select(
    weights: DataFrame,
    top_fraction: float | None = None,
    threshold: "float | Column | None" = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Select documents by importance weight — the resampling step of
    DSIR, deterministic (no Gumbel noise; ties broken by id so any
    engine reproduces the exact selection).

    Two regimes, exactly one of which must be given:
      * threshold — keep importance >= threshold (a float, or a Column
        such as a broadcast-joined histogram_threshold edge). The
        100 TB path: a pure filter, no global ordering; derive the
        threshold once from operators/sketch.py histogram_threshold
        (fixed-grid histogram, no total order) or exact via the
        top_fraction path on a small slice.
      * top_fraction — keep the exact top ceil(fraction·n) by
        (importance DESC, id). Exact selection requires a total order,
        which Spark computes as an unpartitioned window (single-task
        sort over (id, importance) pairs only — narrow rows, but still
        a one-node sort): right for dimension-to-moderate inputs and
        for deriving thresholds, not for the full 100 TB corpus.

    Returns the input plus rank (top_fraction regime only) and a
    `selected` boolean."""
    from pyspark.sql.window import Window

    if (top_fraction is None) == (threshold is None):
        raise ValueError("dsir_select: give exactly one of top_fraction/threshold")
    if threshold is not None:
        return weights.withColumn("selected", F.col("importance") >= threshold)
    # rank and the total row count ride ONE window pass (the count's
    # frame is unbounded over the same ordering) — no separate eager
    # count() action recomputing the whole importance pipeline
    w = Window.orderBy(F.col("importance").desc(), F.col(id_col))
    n = F.count(F.lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    k = F.ceil(n * F.lit(float(top_fraction)))
    return weights.withColumn("rank", F.row_number().over(w)).withColumn(
        "selected", F.col("rank") <= k
    )


def plan_training_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data export.

    Tokenizer/packing pipelines want the corpus order-randomized and cut
    into a fixed number of shards, reproducibly: shard = first 4 md5
    bytes of the document id mod n_shards, position = rank of the md5
    hex within the shard. Both are pure functions of the id, so the plan is
    stable across runs, engines and partitionings — re-running the
    export after an append only reshuffles within shards, and any
    engine (or the DuckDB oracle) reproduces the exact layout.

    The ordering window partitions BY SHARD, so the sort is n_shards
    independent partition-local sorts, never a single global order-by;
    shard sizes are balanced by the uniformity of md5. With `token_col`,
    a running token offset within the shard rides along (the packing
    cursor a sequence writer needs). Write the result with
    `.repartition("shard").write.partitionBy("shard")` for one file
    per shard.
    """
    from pyspark.sql.window import Window

    # 8 hex chars (32 bits) before the mod: a single byte (0-255) would
    # leave shards 256+ permanently empty for n_shards > 256 and skew the
    # distribution whenever 256 % n_shards != 0.
    h = F.md5(F.col(id_col).cast("string"))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(n_shards)
    ).cast("int")
    out = docs.withColumn("__h", h).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    out = out.withColumn("pos", F.row_number().over(w) - 1)
    if token_col is not None:
        cum = Window.partitionBy("shard").orderBy("__h", id_col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        out = out.withColumn(
            "token_offset",
            F.coalesce(F.sum(F.col(token_col)).over(cum), F.lit(0)).cast("long"),
        )
    return out.drop("__h")


_DSIR_META_SCHEMA = "n_hex int"


def write_dsir_stats(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hex: int = 3,
) -> None:
    """Persist the DSIR scoring state: `cp/` (target-corpus bucket
    histogram — fixed once the trusted corpus is chosen), `cq/`
    (raw-corpus bucket histogram, append-grown by arriving batches),
    and a one-row `meta/` parquet recording the feature-hash width
    (same discipline as operators/minhash.py write_lsh_index — all
    through the Spark writer so object-store paths work).

    Both histograms are <= 16^n_hex rows after map-side partial
    aggregation, so the persisted state is KB-sized however large the
    corpus: this is what makes incremental DSIR (dsir probe streams)
    per-batch cost proportional to the batch. `cq/` accumulates one
    <= 16^n_hex-row file set per append; readers SUM by bucket, so
    appends never need the history rewritten (compact by rewriting
    `cq/` if file counts ever matter).

    A rebuild DELETES the whole `cq/` tree first: overwriting only the
    seed partition would leave prior runs' `cq/part=*` folds mixed into
    the fresh state (and, after an n_hex change, buckets of a different
    hash width) — every later probe would silently score against a
    corrupted histogram."""
    spark = target_docs.sparkSession
    jvm = spark._jvm
    cq_root = jvm.org.apache.hadoop.fs.Path(path, "cq")
    fs = cq_root.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(cq_root):
        fs.delete(cq_root, True)
    tgt = hashed_feature_buckets(target_docs, id_col, text_col, n_hex)
    raw = hashed_feature_buckets(raw_docs, id_col, text_col, n_hex)
    tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("cp")).coalesce(
        1
    ).write.mode("overwrite").parquet(path + "/cp")
    raw.groupBy("bucket").agg(F.count(F.lit(1)).alias("cq")).coalesce(
        1
    ).write.mode("overwrite").parquet(path + "/cq/part=seed")
    from biocache_store_spark.util import local_rows_df

    local_rows_df(spark, _DSIR_META_SCHEMA, [(n_hex,)]).coalesce(
        1
    ).write.mode("overwrite").parquet(path + "/meta")


def append_dsir_stats(
    new_docs: DataFrame,
    path: str,
    part: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold a new raw batch into the persisted `cq/` histogram — one
    <= 16^n_hex-row write, cost proportional to the batch. `part` names
    the batch's partition directory (`cq/part=<part>/`) and the write
    OVERWRITES it, so replaying the same batch (streaming at-least-once)
    re-folds identical counts instead of doubling them — the counts
    analog of the dedup-on-read guard the LSH/IVF appends rely on. The
    target side (`cp/`) never changes; re-point the index at a new
    trusted corpus by rebuilding with write_dsir_stats."""
    spark = new_docs.sparkSession
    if "=" in part or "/" in part:
        raise ValueError("append_dsir_stats: part must be a plain label")
    n_hex = int(spark.read.parquet(path + "/meta").collect()[0]["n_hex"])
    feats = hashed_feature_buckets(new_docs, id_col, text_col, n_hex)
    feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("cq")).coalesce(
        1
    ).write.mode("overwrite").parquet(path + f"/cq/part={part}")


def probe_dsir_stats(
    spark,
    path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against the persisted DSIR state: identical
    formula (and bit-identical output) to dsir_importance over the
    corpus the stats were built from — the equivalence the streaming
    tests pin — but reading two <= 16^n_hex-row histograms instead of
    re-scanning the corpus. The probe batch must already be folded
    into `cq/` (append_dsir_stats) for exact batch parity, matching
    batch mode where every scored document's features are part of q."""
    b_src = spark.read.parquet(path + "/cq").groupBy("bucket").agg(
        F.sum("cq").alias("cq")
    )
    cp = spark.read.parquet(path + "/cp")
    n_hex = int(spark.read.parquet(path + "/meta").collect()[0]["n_hex"])
    b_total = 16**n_hex
    np_ = cp.agg(F.sum("cp").alias("np")).select(
        F.coalesce(
            F.col("np"),
            F.expr(
                "CAST(raise_error('probe_dsir_stats: stored target"
                " histogram is empty') AS BIGINT)"
            ),
        ).alias("np")
    )
    nq = b_src.agg(F.sum("cq").alias("nq"))
    raw = hashed_feature_buckets(docs, id_col, text_col, n_hex)
    # one merged broadcast probe per occurrence instead of four — the
    # dsir_importance r13 restructure; a bucket absent from BOTH
    # histograms left-joins to null cp AND null cq exactly as the two
    # separate left joins did, so the smoothing math is unchanged
    stats = cp.join(b_src, "bucket", "full")
    totals = np_.crossJoin(nq)
    joined = (
        raw.join(F.broadcast(stats), "bucket", "left")
        .crossJoin(F.broadcast(totals))
    )
    num = F.sum(F.coalesce(F.col("cp"), F.lit(0)) + 1)
    den = F.sum(F.coalesce(F.col("cq"), F.lit(0)) + 1)
    importance = F.round(
        (num.cast("double") * (F.first("nq") + F.lit(b_total)).cast("double"))
        / (den.cast("double") * (F.first("np") + F.lit(b_total)).cast("double")),
        8,
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_feats"), importance.alias("importance")
    )
