"""MinHash + LSH near-duplicate detection over the documents table.

Generalizes the reference's grouped fuzzy dedup (the MD5 media-dedup
pattern load/MediaStore.scala:234-285 + the blocking-key discipline of
tool/DuplicationDetection.scala) to corpus scale:

    shingle -> K minhashes -> B bands -> band-bucket join -> candidates
    -> exact-Jaccard verification

Design choice for verifiability: the hash family is h_k(s) =
substr(md5((k div 4) || '|' || s), (k mod 4)*8+1, 8) compared
lexicographically — four independent 32-bit (8 hex char) hashes carved out
of each of ceil(K/4) md5 evaluations. md5 is available and bit-identical in
every engine, so signatures, band buckets, candidate pairs AND the verified
output are all deterministic and reproducible in ANSI SQL — the whole
pipeline has an exact oracle (no probabilistic slack in tests). Splitting
the 128-bit digest instead of hashing K times cuts md5 evaluations per
shingle 12 -> 3 (measured 2.9x faster signature stage at sf0.1) and shrinks
the min-aggregation/shuffle width 32 -> 8 chars per hash.

Scale shape: one explode per (doc, shingle, k) for the signature aggregation
is avoided — the K minhashes are computed per document with array
expressions over the shingle array (JVM-side, no shuffle), then ONE explode
per (doc, band) feeds the bucket join. Hot buckets (identical band
signatures across many docs) are the skew risk; the verification join is
bounded by candidate count, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 12
DEFAULT_BANDS = 4


def signatures(
    docs: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingles: int | None = None,
) -> DataFrame:
    """(id, n_sh, signature array, shingle set) per document.

    Shape: explode shingles once, compute the K hashes as plain projection
    columns (codegen'd, unlike higher-order lambdas which Spark interprets),
    then ONE groupBy(doc) computing all K mins + the shingle set + its size
    with partial aggregation. Measured 4x faster than the per-row
    array-transform formulation at sf0.1, and the signature relation is
    computed once for all downstream consumers.
    """
    from biocache_store_spark.functions.text import shingle_df

    exploded = shingle_df(docs, n, id_col=id_col, text_col=text_col)
    digests = [
        F.md5(F.concat(F.lit(str(g)), F.lit("|"), F.col("sh")))
        for g in range((num_hashes + 3) // 4)
    ]
    hashed = exploded.select(
        id_col,
        "sh",
        *[
            F.substring(digests[k // 4], (k % 4) * 8 + 1, 8).alias(f"__h{k}")
            for k in range(num_hashes)
        ],
    )
    # `max_shingles` bounds the per-document set payload the verification
    # join carries: one adversarial mega-document would otherwise balloon
    # the shuffled row to its full shingle count. Capped sets keep the
    # deterministic (sorted) prefix, so Jaccard becomes an approximation
    # ONLY for documents over the cap — everything else is exact.
    shingle_set = F.collect_set("sh")
    if max_shingles is not None:
        shingle_set = F.slice(F.sort_array(shingle_set), 1, max_shingles)
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"__h{k}").alias(f"__mh{k}") for k in range(num_hashes)],
        shingle_set.alias("shs"),
    )
    return agg.select(
        id_col,
        F.size("shs").alias("n_sh"),
        F.array(*[F.col(f"__mh{k}") for k in range(num_hashes)]).alias("sig"),
        "shs",
    )


def banded_keys(
    sig_df: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_sig): one row per (document, band) — the LSH join
    key relation, shared by in-memory candidate generation and the
    persisted index (write_lsh_index)."""
    if bands < 1 or num_hashes % bands:
        # bands > num_hashes would make rows_per_band 0 -> every band_sig
        # "" -> one mega-bucket and an O(n^2) join; a non-dividing bands
        # silently ignores trailing hashes and changes the recall curve
        raise ValueError(
            f"banded_keys: bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    rows_per_band = num_hashes // bands
    return sig_df.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(
                        "|", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                    ).alias("band_sig"),
                ),
            )
        ).alias("bs"),
    ).select(id_col, F.col("bs.band"), F.col("bs.band_sig"))


def _cap_buckets(banded: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """Hot-band guard shared by the batch and incremental paths: drop
    (band, band_sig) buckets larger than the cap. COUNT-FIRST shape (the
    lsh_candidates discipline): the count aggregates with map-side
    partials so a million-row viral bucket collapses to one row per
    input partition, then surviving keys gate via a left-semi join on
    the same partitioning — a window count would instead shuffle the
    whole viral bucket into one task just to count it."""
    if max_bucket_size is None:
        return banded
    ok = (
        banded.groupBy("band", "band_sig")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_bucket_size)
        .drop("__n")
    )
    return banded.join(ok.hint("shuffle_hash"), ["band", "band_sig"], "left_semi")


def lsh_candidates(
    sig_df: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one band signature.

    `max_bucket_size` is the hot-band guard for corpus scale: a band
    signature shared by B documents contributes B^2/2 candidate pairs, so
    one viral bucket (boilerplate, empty strings) turns the join quadratic.
    Buckets larger than the cap are dropped from candidate generation — the
    standard LSH trade (documents connected ONLY through a viral bucket are
    missed; everything else is unaffected).

    POSTING-LIST shape (same r5 rewrite as ngram_jaccard_pairs): one
    groupBy on the (band, band_sig) bucket key collects the doc-id list,
    then pairs are generated map-side by double-exploding it — no
    self-join, no window sort. Singleton buckets (the vast majority)
    drop before any pair work.

    With a cap set, a COUNT-FIRST prefilter runs before collect_list:
    counts aggregate with map-side partials (a million-row viral bucket
    collapses to one count per input partition), over-cap bucket keys are
    dropped via a left-semi join on the same (band, band_sig)
    partitioning, and only surviving buckets — each <= cap ids — are
    collected. Collecting before filtering would materialize the entire
    viral bucket in one aggregation buffer, the exact input the cap
    exists to drop."""
    banded = banded_keys(sig_df, num_hashes, bands, id_col)
    if max_bucket_size is not None:
        ok_buckets = (
            banded.groupBy("band", "band_sig")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter((F.col("__n") >= 2) & (F.col("__n") <= max_bucket_size))
            .drop("__n")
        )
        banded = banded.join(
            ok_buckets.hint("shuffle_hash"), ["band", "band_sig"], "left_semi"
        )
    posting = (
        banded.groupBy("band", "band_sig")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        posting.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def _verify_pairs(
    cand: DataFrame,
    sets: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact shingle-set Jaccard verification of candidate pairs — shared
    by the batch (near_duplicates) and incremental (probe_lsh_index)
    paths so their null handling, rounding, and join strategy can never
    diverge. `sets` is (id, n_sh, shs).

    shuffle_hash, NOT broadcast: the set relation carries per-document
    shingle arrays — exactly what could never broadcast at corpus scale.
    Letting AQE broadcast it at small SF also ran the signature build
    inside two concurrent broadcast-exchange threads and collected both
    onto the driver heap (measured: 80+ s of GC at sf0.1)."""
    sets_a = sets.select(
        F.col(id_col).alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n_sh").alias("n_sh_a"),
    )
    sets_b = sets.select(
        F.col(id_col).alias("doc_b"),
        F.col("shs").alias("shs_b"),
        F.col("n_sh").alias("n_sh_b"),
    )
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    jaccard = inter / (F.col("n_sh_a") + F.col("n_sh_b") - inter)
    return (
        cand.join(sets_a.hint("shuffle_hash"), "doc_a")
        .join(sets_b.hint("shuffle_hash"), "doc_b")
        .filter(F.coalesce(jaccard, F.lit(-1.0)) >= threshold)
        .select("doc_a", "doc_b", F.round(jaccard, 4).alias("jaccard"))
    )


def near_duplicates(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
    max_shingles: int | None = None,
    materialize_signatures: bool = False,
) -> DataFrame:
    """LSH candidates verified with exact shingle-set Jaccard >= threshold.

    Returns (doc_a, doc_b, jaccard). Output is a SUBSET of the exact
    all-pairs result (LSH recall < 1 by design); with the default 4 bands x
    3 rows the candidate recall at 0.5 similarity is ~1-(1-0.5^3)^4 = 0.41
    per band formula — raise bands for higher recall. `max_bucket_size`
    caps hot band-buckets (see lsh_candidates); `max_shingles` caps the
    per-document set payload in the verification join (see signatures).

    The signature relation feeds FOUR plan branches (banding, the
    bucket-count gate, and both sides of the verification join); AQE
    reuses the canonically-identical shuffle stages among them at
    runtime, so only the post-exchange final aggregations and the
    branch-specific prunings of the shingle pass recompute per branch.
    `materialize_signatures` instead cuts the relation to a single
    computation with a LAZY localCheckpoint (blocks freed by the
    ContextCleaner once the result is unreferenced — unlike persist(),
    which pins the plan in the CacheManager until an explicit unpersist
    a lazily-returned DataFrame can never safely issue). Measured r12 at
    sf0.1 both ways, hence OFF by default: isolated warm sessions gain
    ~10-15% (1.26-1.39 s -> 1.08-1.24 s min-of-3), but under bench/
    multi-query session pressure the serialization of the heavyweight
    shingle-set rows into block storage costs MORE than the AQE-assisted
    recompute (bench min-of-3 2.75-3.40 s vs 1.89-2.30 s plain). Turn it
    on when the signature stage dominates (long documents, large n,
    expensive normalization) and the job owns the session; it also
    trades fault-tolerance of the intermediate for speed (executor loss
    = job retry, the connected-components trade documented in
    operators/components.py). Streaming inputs skip the checkpoint
    automatically (illegal on a streaming plan).
    """
    sig = signatures(docs, num_hashes, n, id_col, text_col, max_shingles)
    if materialize_signatures and not docs.isStreaming:
        sig = sig.localCheckpoint(eager=False)
    cand = lsh_candidates(sig, num_hashes, bands, id_col, max_bucket_size)
    return _verify_pairs(
        cand, sig.select(id_col, "n_sh", "shs"), threshold, id_col
    )


def write_lsh_index(
    docs: DataFrame,
    path: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingles: int | None = None,
    mode: str = "overwrite",
    allow_legacy: bool = False,
) -> None:
    """Persist the near-dup LSH index: the signature relation (with the
    shingle sets the verification join needs) under `sig/`, and the
    banded join keys under `bands/` PARTITIONED BY band.

    This is the production shape of near-dup detection: sign the corpus
    ONCE, then probe arriving batches against the stored index
    (probe_lsh_index) instead of re-shingling 100 TB per ingest. Pass
    mode="append" to accumulate a growing corpus index — each ingest
    appends its own signatures after probing.

    The hash-family parameters are persisted as a one-row parquet
    dataset under `meta/` on the first write and validated on append and
    probe: an index probed or extended with different num_hashes/bands/n
    would silently match nothing (different hash families), so a
    mismatch raises instead. Meta goes through the same Spark writer as
    the sig/bands data, so the index works on HDFS/S3 paths the driver's
    local filesystem never sees.
    """
    from pyspark import StorageLevel

    spark = docs.sparkSession
    meta = {"num_hashes": num_hashes, "bands": bands, "n": n}
    if mode == "append":
        _check_index_meta(
            spark, path, meta, "write_lsh_index(append)", allow_legacy
        )
    sig = signatures(docs, num_hashes, n, id_col, text_col, max_shingles)
    # persist: the sig plan feeds BOTH writes; without it the whole
    # shingle/md5/groupBy pass over the corpus runs twice per index build
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        sig.write.mode(mode).parquet(path + "/sig")
        banded = banded_keys(sig, num_hashes, bands, id_col)
        banded.write.mode(mode).partitionBy("band").parquet(path + "/bands")
    finally:
        sig.unpersist()
    _write_index_meta(spark, path, meta)


_META_SCHEMA = "num_hashes int, bands int, n int"


def _write_index_meta(spark, path: str, meta: dict) -> None:
    """One-row parquet dimension under `<index>/meta` — written with the
    Spark writer so object-store index paths work end to end. Always
    overwrite: append re-writes identical params (validated first).

    Built as a JVM literal relation (util.local_rows_df), not
    createDataFrame: the pickled-RDD scan behind a Python-list
    createDataFrame made this one-row write cost 4.5-7 s — most of the
    index-build wall clock at sf0.1 and a per-microbatch tax on the
    streaming ingest path."""
    from biocache_store_spark.util import local_rows_df

    local_rows_df(
        spark, _META_SCHEMA, [(meta["num_hashes"], meta["bands"], meta["n"])]
    ).coalesce(1).write.mode("overwrite").parquet(path + "/meta")


def _read_index_meta(spark, path: str) -> dict | None:
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.parquet(path + "/meta").collect()
    except AnalysisException:
        return None  # pre-meta (legacy) index — callers decide the policy
    return rows[0].asDict() if rows else None


def _check_index_meta(
    spark, path: str, expected: dict, caller: str, allow_legacy: bool = False
) -> None:
    """Validate the caller's hash-family params against the stored index.

    A missing `meta` dataset (an index written before meta existed) is
    REJECTED by default: probing it with mismatched num_hashes/bands/n
    would silently return garbage pairs, which is worse than an error.
    `allow_legacy=True` accepts the index AND backfills `meta` with the
    caller's params, so the trust-me escape hatch is one-time — every
    later probe/append is validated against what this caller asserted.
    """
    stored = _read_index_meta(spark, path)
    if stored is None:
        if not allow_legacy:
            raise ValueError(
                f"{caller}: index at {path!r} has no meta dataset (written "
                f"before hash-family params were persisted); its "
                f"num_hashes/bands/n cannot be validated and a mismatch "
                f"would silently return wrong pairs. Pass allow_legacy=True "
                f"to accept it with the current params (this backfills meta)."
            )
        _write_index_meta(spark, path, expected)
        return
    mismatched = {
        k: (stored.get(k), v) for k, v in expected.items() if stored.get(k) != v
    }
    if mismatched:
        raise ValueError(
            f"{caller}: hash-family parameters differ from the stored "
            f"index ({mismatched}); results would silently be wrong"
        )


def probe_lsh_index(
    spark,
    path: str,
    new_docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
    max_shingles: int | None = None,
    allow_legacy: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs of `new_docs` against the persisted index AND
    within the new batch, without touching stored text: only the new
    batch is shingled; stored documents contribute their persisted
    signatures/shingle sets. Returns (doc_a, doc_b, jaccard), doc_a <
    doc_b; stored-vs-stored pairs are the index owner's history and are
    not re-emitted. Ids must be unique across the stored corpus and the
    batch.

    `new_docs` must be a BATCH DataFrame (the streaming path hands the
    operator foreachBatch microbatches, never an unbounded stream).
    `materialize=True` (default) cuts the re-computation of the shared
    signature/candidate plans via lazy localCheckpoints, which truncates
    lineage: an executor/block loss mid-probe fails the per-ingest job
    (idempotent — the caller replays the microbatch) instead of
    recomputing the lost stage. Pass materialize=False to keep full
    lineage on deployments where per-ingest job retries are costlier
    than the ~3x plan re-execution (see DEPLOY.md).

    Together with write_lsh_index(mode="append") this is incremental
    near-dup maintenance: probe the batch, emit its pairs, append its
    signatures — per-ingest cost proportional to the BATCH (plus the
    band-bucket fan-in), never the corpus. The hot-bucket cap applies to
    the combined band table, same trade as lsh_candidates.
    """
    _check_index_meta(
        spark,
        path,
        {"num_hashes": num_hashes, "bands": bands, "n": n},
        "probe_lsh_index",
        allow_legacy,
    )
    # materialize: the batch signature plan feeds banding AND the set
    # union, and the candidate plan feeds the id-restriction union twice
    # plus the verification join — unmaterialized, the most expensive
    # stages of the per-ingest probe re-run ~3x. LAZY localCheckpoint,
    # not persist() (r12): a lazily-returned operator can never safely
    # unpersist, so a long-lived ingest session probing every batch
    # accumulated one CacheManager entry (plan + pinned blocks) per call
    # forever; checkpoint blocks are freed by the ContextCleaner as soon
    # as the returned DataFrame is unreferenced. Both relations are
    # batch-sized (never corpus-sized), so the serialization cost the
    # near_duplicates docstring warns about does not bind here.
    if new_docs.isStreaming:
        raise ValueError(
            "probe_lsh_index: new_docs must be a batch DataFrame "
            "(use near_dup_stream/foreachBatch for streaming ingest)"
        )
    new_sig = signatures(new_docs, num_hashes, n, id_col, text_col, max_shingles)
    if materialize:
        new_sig = new_sig.localCheckpoint(eager=False)
    new_banded = banded_keys(new_sig, num_hashes, bands, id_col).withColumn(
        "is_new", F.lit(True)
    )
    # dropDuplicates guards against mode="append" ingests that re-carried
    # already-indexed ids: duplicate band rows would inflate (band,
    # band_sig) bucket counts toward max_bucket_size and drop hot buckets
    # prematurely. Signatures are deterministic per id, so (id, band,
    # band_sig) dedup restores exactly the once-indexed relation.
    stored_banded = (
        spark.read.parquet(path + "/bands")
        .select(id_col, "band", "band_sig")
        .dropDuplicates([id_col, "band", "band_sig"])
        .withColumn("is_new", F.lit(False))
    )
    tagged = _cap_buckets(stored_banded.unionByName(new_banded), max_bucket_size)
    a = tagged.filter(F.col("is_new")).alias("a")
    b = tagged.alias("b")
    cand = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_b"),
        )
        .distinct()
    )
    if materialize:
        cand = cand.localCheckpoint(eager=False)
    stored_sig = spark.read.parquet(path + "/sig").select(id_col, "n_sh", "shs")
    sets = stored_sig.unionByName(
        new_sig.select(id_col, "n_sh", "shs")
    ).dropDuplicates([id_col])
    # restrict the set-payload relation to CANDIDATE ids before attaching
    # shingle arrays: without this, every stored signature row shuffles
    # through the verification join on every ingest — O(corpus), exactly
    # what the probe exists to avoid.
    cand_ids = (
        cand.select(F.col("doc_a").alias(id_col))
        .union(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    if max_bucket_size is not None:
        # with the cap the candidate-id set is bounded by
        # (batch x bands x cap): safe to force-broadcast. UNCAPPED, one
        # viral bucket makes it O(batch x corpus) — forcing broadcast
        # there collects it onto the driver, so AQE decides instead.
        cand_ids = F.broadcast(cand_ids)
    sets = sets.join(cand_ids, id_col, "left_semi")
    return _verify_pairs(cand, sets, threshold, id_col)
