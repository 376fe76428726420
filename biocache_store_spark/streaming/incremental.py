"""Incremental / streaming processing.

The reference has no streaming engine — incrementality is file- and
flag-based (cmd/IncrementalTool.scala:34 row-key files,
SolrIndexDAO.shouldIndex lastModified reindex). Structured Streaming
subsumes both patterns:

  * `process_staging_stream` watches a staging directory (the drop zone a
    loader writes to), runs the full record-processing chain on new files
    only, and appends to the processed table — Trigger.AvailableNow gives
    exactly the reference's "process what arrived since last run" semantics
    with checkpoint-tracked progress instead of row-key files.
  * `windowed_event_counts` is the streaming twin of the batch
    event_hourly_histogram query: tumbling windows + watermark for late
    data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from biocache_store_spark.processors.chain import process_records

STAGING_SCHEMA = T.StructType(
    [
        T.StructField(name, T.StringType())
        for name in (
            "occurrenceID",
            "dataResourceUid",
            "basisOfRecord",
            "eventDate",
            "year",
            "month",
            "day",
            "decimalLatitude",
            "decimalLongitude",
            "geodeticDatum",
            "country",
            "stateProvince",
            "scientificName",
            "recordedBy",
        )
    ]
)


def process_staging_stream(
    spark: SparkSession,
    staging_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = STAGING_SCHEMA,
    available_now: bool = True,
) -> StreamingQuery:
    """CSV staging directory -> processed parquet, incrementally."""
    raw = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 16)
        .csv(staging_dir)
    )
    processed = process_records(raw)
    writer = (
        processed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_store_stream(
    spark: SparkSession,
    staging_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = STAGING_SCHEMA,
    available_now: bool = True,
    key_col: str = "occurrenceID",
) -> StreamingQuery:
    """Streaming occurrence-store maintenance: the reference's incremental
    reprocess+reindex loop (cmd/IncrementalTool.scala row-key files +
    SolrIndexDAO.shouldIndex lastModified checks) as a foreachBatch
    partition-scoped upsert.

    Each micro-batch runs the full processing chain, then merges into the
    resource-partitioned store with DYNAMIC partition overwrite: only the
    data-resource partitions present in the batch are rewritten — files of
    untouched resources are never read or written, which is what keeps
    incremental maintenance O(batch), not O(store), at 100 TB. Within a
    touched partition the batch row wins by key; surviving rows carry over
    via an anti-join. The merge is idempotent per key, so availableNow +
    checkpoint restarts (at-least-once delivery) still converge to the
    same store contents. A micro-batch can span several staging files
    (maxFilesPerTrigger) and may carry the same key more than once — the
    row from the lexicographically-last staging file wins, mirroring a
    sequential loader where later drops supersede earlier ones.
    """
    raw = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 16)
        .csv(staging_dir)
    )

    def merge_batch(batch: DataFrame, _batch_id: int) -> None:
        from pyspark.errors import AnalysisException
        from pyspark.sql.window import Window

        sess = batch.sparkSession
        # intra-batch dedup by key BEFORE processing: last staging file
        # wins (order within one file is undefined — a single file should
        # not carry the same key twice)
        w = Window.partitionBy(key_col).orderBy(F.col("__src").desc())
        batch = (
            batch.withColumn("__src", F.input_file_name())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__src", "__rn")
        )
        processed = process_records(batch)
        touched_rows = processed.select("dataResourceUid").distinct().collect()
        touched = [r[0] for r in touched_rows if r[0] is not None]
        touches_null = any(r[0] is None for r in touched_rows)
        out = processed
        try:
            # null-safe partition scope: the null-resource partition is
            # rewritten too whenever the batch carries null-resource rows,
            # so its surviving rows must join the carry-over as well
            scope = F.col("dataResourceUid").isin(touched)
            if touches_null:
                scope = scope | F.col("dataResourceUid").isNull()
            existing = sess.read.parquet(store_dir).filter(scope)
            keep = existing.join(
                processed.select(key_col), key_col, "left_anti"
            )
            out = keep.unionByName(processed, allowMissingColumns=True)
        except AnalysisException:
            pass  # first batch: store doesn't exist yet
        # materialize BEFORE the overwrite — the merge plan reads the very
        # partitions the write replaces
        out = out.localCheckpoint(eager=True)
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("dataResourceUid")
            .parquet(store_dir)
        )

    writer = raw.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup bounded by a watermark: the first arrival of
    each key within the watermark horizon passes, replays are dropped,
    and state for keys older than the watermark is evicted — the
    streaming twin of exact_dedup for an ingest pipeline where the same
    document can arrive repeatedly (retries, overlapping crawl dumps).
    dropDuplicatesWithinWatermark keeps state BOUNDED (unlike plain
    dropDuplicates on a stream, whose key state grows forever), which is
    the property that lets this run indefinitely at corpus scale."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts with a watermark; works on both a static and a
    streaming events DataFrame (same code path, batch first).

    `watermark=None` skips the watermark — required when the event-time
    column is TIMESTAMP_NTZ (watermarks demand TIMESTAMP) and legitimate
    for complete-mode aggregation over a bounded availableNow stream,
    where no state ever needs evicting. Unbounded append-mode deployments
    must keep the watermark (and a TIMESTAMP event-time column)."""
    df = events
    if df.isStreaming and watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(F.col(ts_col), window_duration).alias("win"), F.col(key_col)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a STREAMING DataFrame (file source).

    Same nanos-as-long handling as io.read_table (events.parquet carries
    INT64 TIMESTAMP(NANOS)); the rebuild uses pure integer arithmetic on
    a TIMESTAMP_NTZ epoch so results are session-timezone independent.
    File-source streaming needs an explicit schema — the batch reader's
    footer inference doesn't run in readStream.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = (
        "event_id long, ts long, user_id long, "
        "event_type string, value double, props string"
    )
    # the file source's basePath must be a DIRECTORY — stream the sf dir
    # with a glob filter rather than pointing at the single parquet file
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # The batch reader under nanosAsLong yields raw NANOS; the file-stream
    # reader yields MICROS for the same column (it resolves the nanos
    # annotation before applying the user schema). Scale-detect instead of
    # trusting either: epoch-micros for any plausible date is < 1e16,
    # epoch-nanos > 1e16.
    micros = F.when(
        F.abs(F.col("ts")) > F.lit(10_000_000_000_000_000),
        F.expr("ts div 1000"),
    ).otherwise(F.col("ts"))
    return (
        raw.withColumn("__micros", micros)
        .withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, __micros,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
        .drop("__micros")
    )


DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def _index_dir_exists(spark: SparkSession, index_path: str, sub: str) -> bool:
    """Seed-index existence check through the Hadoop FileSystem API —
    os.path.isdir would reject a perfectly good s3a:// or hdfs:// index
    the local filesystem never sees."""
    from biocache_store_spark.util import hadoop_exists

    return hadoop_exists(spark, index_path.rstrip("/") + "/" + sub)


def _marker_path(spark: SparkSession, index_path: str, batch_id: int):
    """(FileSystem, Path) for the per-batch append marker (shared
    util.hadoop_fs accessor), so the idempotence guard works on any
    Hadoop-visible filesystem (local, HDFS, s3a) — a local open() would
    silently never guard an object-store index path. The underscore
    prefix keeps Spark's parquet discovery ignoring the marker."""
    from biocache_store_spark.util import hadoop_fs

    return hadoop_fs(
        spark, index_path.rstrip("/") + f"/_batch_{batch_id}_appended"
    )


def _marker_exists(spark: SparkSession, index_path: str, batch_id: int) -> bool:
    fs, path = _marker_path(spark, index_path, batch_id)
    return fs.exists(path)


def _commit_marker(spark: SparkSession, index_path: str, batch_id: int) -> None:
    # committed AFTER the append: a crash between append and marker can
    # double a batch's rows once; both probe paths dedup on read
    fs, path = _marker_path(spark, index_path, batch_id)
    fs.create(path, True).close()


def near_dup_stream(
    spark: SparkSession,
    staging_dir: str,
    index_path: str,
    pairs_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = DOC_STREAM_SCHEMA,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming incremental near-duplicate maintenance: JSONL document
    drops are probed against the persisted LSH index (batch-vs-stored AND
    within-batch pairs appended under `pairs_dir`), then the batch's own
    signatures are appended to the index — per-microbatch cost
    proportional to the BATCH, never the corpus.

    foreachBatch is the right streaming tool here, not a stream-stream
    join: the probe is a batch join against an append-only persisted
    index, so state lives in the index files (checkpoint-tracked progress
    decides which drops were consumed), not in the streaming state store.
    The index must be seeded first (write_lsh_index on the initial
    corpus); ids must be unique across the corpus and all batches — the
    probe dedups the stored band table defensively, but duplicate ids
    still inflate bucket counts toward the cap.
    """
    import os

    from biocache_store_spark.operators.minhash import (
        probe_lsh_index,
        write_lsh_index,
    )

    if not _index_dir_exists(spark, index_path, "sig"):
        raise ValueError(
            f"near_dup_stream: no LSH index at {index_path!r}; seed it with "
            "write_lsh_index on the initial corpus before streaming"
        )
    raw = spark.readStream.schema(schema).json(staging_dir)

    def handle(batch: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a crash mid-handler replays the
        # whole microbatch. Pairs are made idempotent by overwriting a
        # batch-scoped subdirectory (a replay rewrites the same dir).
        # The index append is guarded by a marker committed AFTER the
        # append: a crash between append and marker can double a batch's
        # signatures once — probe_lsh_index dedups both relations on
        # read, so results stay correct and only the bucket-cap counters
        # see the (single, bounded) inflation.
        if not batch.take(1):
            return
        batch = batch.persist()
        try:
            pairs = probe_lsh_index(
                spark,
                index_path,
                batch,
                threshold=threshold,
                max_bucket_size=max_bucket_size,
            )
            pairs.write.mode("overwrite").parquet(
                os.path.join(pairs_dir, f"batch={batch_id}")
            )
            if not _marker_exists(spark, index_path, batch_id):
                write_lsh_index(batch, index_path, mode="append")
                _commit_marker(spark, index_path, batch_id)
        finally:
            batch.unpersist()

    writer = raw.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


EMBEDDING_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def semantic_dedup_stream(
    spark: SparkSession,
    staging_dir: str,
    index_path: str,
    decisions_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = EMBEDDING_STREAM_SCHEMA,
    threshold: float = 0.5,
    nprobe: int = 1,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming semantic-dedup maintenance — the embedding twin of
    `near_dup_stream`: each microbatch of arriving vectors (JSONL drops)
    is scored against the persisted IVF index (query_ivf_index, probe-
    pruned scan), any vector whose nearest stored neighbor clears
    `threshold` cosine is marked pruned, and the batch (all of it — a
    pruned vector still represents its cluster for FUTURE arrivals) is
    appended to the index. Per-batch cost proportional to the batch and
    its probed cells; the keep/prune decision table accumulates under
    `decisions_dir` partitioned by batch (idempotent under replay).
    Seed the index with write_ivf_index first; ids must be unique across
    the corpus and all batches.
    """
    import os

    from biocache_store_spark.operators.similarity import (
        query_ivf_index,
        write_ivf_index,
    )

    if not _index_dir_exists(spark, index_path, "cells"):
        raise ValueError(
            f"semantic_dedup_stream: no IVF index at {index_path!r}; seed it "
            "with write_ivf_index on the initial corpus before streaming"
        )
    raw = spark.readStream.schema(schema).json(staging_dir)

    def handle(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        batch = batch.persist()
        try:
            queries = batch.select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            # exclude the batch's OWN ids from candidates: after the
            # append a replayed handler would otherwise match batch-mates
            # against each other and flip keep decisions (replay must be
            # a no-op, not a re-judgement)
            nearest = (
                query_ivf_index(
                    spark,
                    index_path,
                    queries,
                    k=1,
                    nprobe=nprobe,
                    exclude_ids=batch.select("vec_id"),
                )
                .filter(F.col("cos_sim") >= threshold)
                .select(F.col("query_id").alias("vec_id"))
                .withColumn("__pruned", F.lit(True))
            )
            decisions = batch.select("vec_id").join(
                nearest, "vec_id", "left"
            ).select(
                "vec_id",
                F.coalesce(~F.col("__pruned"), F.lit(True)).alias("keep"),
            )
            decisions.write.mode("overwrite").parquet(
                os.path.join(decisions_dir, f"batch={batch_id}")
            )
            if not _marker_exists(spark, index_path, batch_id):
                centroids = spark.read.parquet(index_path + "/centroids")
                write_ivf_index(batch, centroids, index_path, mode="append")
                _commit_marker(spark, index_path, batch_id)
        finally:
            batch.unpersist()

    writer = raw.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivfpq_index_stream(
    spark: SparkSession,
    staging_dir: str,
    index_path: str,
    neighbors_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = EMBEDDING_STREAM_SCHEMA,
    k: int = 10,
    nprobe: int = 2,
    rerank_shortlist: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming IVFADC index maintenance (VERDICT r11 #6) — the
    compressed twin of `semantic_dedup_stream`: each microbatch of
    arriving vectors (JSONL drops) is first searched against the
    persisted IVFADC index (query_ivfpq_index_batch — ONE probe-pruned
    batch job; ADC, or ADC + exact re-rank with `rerank_shortlist`),
    writing each arrival's current top-k under `neighbors_dir`
    partitioned by batch, then the batch's residual-PQ codes are
    appended so the codes store stays current — per-batch cost
    proportional to the batch and its probed cells, never the corpus.

    Dims are NEVER re-derived per batch: the append encodes with the
    index's own stored centroids + codebook and n_subspaces from its
    meta (write_ivfpq_index re-validates — a drifted store raises
    rather than writing mixed-length codes). Replay semantics match
    near_dup_stream: the neighbor report overwrites a batch-scoped
    subdirectory, the append is marker-guarded (a crash between append
    and marker can double a batch's codes once — the probe path dedups
    on read), and the batch excludes its OWN ids from candidates so a
    replayed handler after its own append reports identical neighbors.
    Seed the index with write_ivfpq_index first (store_vectors=True if
    re-ranked streaming search is wanted); ids must be unique across
    the corpus and all batches."""
    import os

    from biocache_store_spark.operators.similarity import (
        _ivfpq_meta,
        query_ivfpq_index_batch,
        write_ivfpq_index,
    )

    if not _index_dir_exists(spark, index_path, "codes"):
        raise ValueError(
            f"ivfpq_index_stream: no IVFADC index at {index_path!r}; seed "
            "it with write_ivfpq_index on the initial corpus before "
            "streaming"
        )
    # resolve the dims contract at CONSTRUCTION time, next to the seed
    # check: a pre-meta index must fail here as an argument error (where
    # the CLI can catch it), not as a StreamingQueryException escaping
    # from inside the first foreachBatch tick — and guessing a subspace
    # count instead could append wrong-length codes that silently
    # eclipse the seed corpus (size-filtered out of every later query)
    meta = _ivfpq_meta(spark, index_path)
    if meta is None:
        raise ValueError(
            f"ivfpq_index_stream: index at {index_path!r} has no meta/ "
            "contract; re-seed it with write_ivfpq_index (which writes "
            "meta) before streaming"
        )
    n_sub = int(meta["n_subspaces"])
    exp_dim = int(meta["dim"])
    if rerank_shortlist is not None:
        if rerank_shortlist < k:
            raise ValueError(
                f"ivfpq_index_stream: rerank_shortlist {rerank_shortlist} "
                f"smaller than k {k}"
            )
        if not meta.get("has_vectors"):
            raise ValueError(
                f"ivfpq_index_stream: index at {index_path!r} has no "
                "raw-vector store; build it with "
                "write_ivfpq_index(store_vectors=True) for re-ranked "
                "streaming search"
            )
    raw = spark.readStream.schema(schema).json(staging_dir)

    def handle(batch: DataFrame, batch_id: int) -> None:
        # sanitize BEFORE anything driver-side: a null/missing vec_id, a
        # null, wrong-dimension or null-element embedding, or a
        # duplicated vec_id inside one tick (producer retries staging
        # the same record twice) would otherwise raise deterministically
        # in the batch query's collect — and a deterministic per-batch
        # failure wedges the checkpoint on that batch forever
        clean = batch.filter(
            F.col("vec_id").isNotNull()
            & F.col("embedding").isNotNull()
            & (F.size("embedding") == exp_dim)
            & F.forall("embedding", lambda x: x.isNotNull())
        )
        # emptiness probe on the pre-dedup relation (same emptiness, no
        # shuffle); dropDuplicates runs once inside the persisted plan
        if not clean.take(1):
            return
        batch = clean.dropDuplicates(["vec_id"]).persist()
        try:
            queries = batch.select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            report = query_ivfpq_index_batch(
                spark,
                index_path,
                queries,
                k=k,
                nprobe=nprobe,
                n_subspaces=n_sub,
                rerank_shortlist=rerank_shortlist,
                exclude_ids=batch.select("vec_id"),
            )
            report.write.mode("overwrite").parquet(
                os.path.join(neighbors_dir, f"batch={batch_id}")
            )
            if not _marker_exists(spark, index_path, batch_id):
                centroids = spark.read.parquet(index_path + "/centroids")
                codebook = spark.read.parquet(index_path + "/codebook")
                write_ivfpq_index(
                    batch, centroids, codebook, index_path,
                    n_subspaces=n_sub, mode="append",
                )
                _commit_marker(spark, index_path, batch_id)
        finally:
            batch.unpersist()

    writer = raw.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def classify_stream(
    spark: SparkSession,
    staging_dir: str,
    model_path: str,
    predictions_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = DOC_STREAM_SCHEMA,
    keep_label: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming model-based gating — the classifier twin of
    `near_dup_stream`: each microbatch of arriving documents (JSONL
    drops) is scored against the persisted Naive Bayes model
    (operators/classifier.py), and (doc_id, label, score, n_feats[,
    keep]) accumulates under `predictions_dir` partitioned by batch
    (idempotent under replay: a batch-scoped overwrite). With
    `keep_label` set this is the streaming quality/language gate: `keep`
    = argmax label matches.

    The model is READ-ONLY — counting-based training means "retrain and
    re-point" is the update path, so unlike the dedup streams there is
    no append step and no marker protocol; per-batch cost is one
    broadcast join of the batch's feature occurrences against the
    <= L x 4096-row model. Train with write_nb_model first. Documents
    with no tokens are omitted from predictions (no evidence — the
    batch-vs-stream equivalence contract of nb_classify).
    """
    import os

    from biocache_store_spark.operators.classifier import (
        nb_classify,
        read_nb_model,
    )

    if not _index_dir_exists(spark, model_path, "model"):
        raise ValueError(
            f"classify_stream: no NB model at {model_path!r}; train it "
            "with train_nb + write_nb_model before streaming"
        )
    # no persist: the model relations are <= L x 4096-row parquet reads
    # per microbatch (negligible), and a cache pinned here would outlive
    # the availableNow query in a long-lived driver with no owner to
    # unpersist it
    model, labels, n_hex = read_nb_model(spark, model_path)
    raw = spark.readStream.schema(schema).json(staging_dir)

    def handle(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        out = nb_classify(batch, model, labels, n_hex=n_hex)
        if keep_label is not None:
            out = out.withColumn("keep", F.col("label") == keep_label)
        out.write.mode("overwrite").parquet(
            os.path.join(predictions_dir, f"batch={batch_id}")
        )

    writer = raw.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dsir_stream(
    spark: SparkSession,
    staging_dir: str,
    stats_path: str,
    weights_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = DOC_STREAM_SCHEMA,
    threshold: float | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming incremental DSIR maintenance — the importance-weighting
    twin of `near_dup_stream`: each microbatch of arriving raw documents
    is folded into the persisted `cq/` histogram (a <= 16^n_hex-row
    partition-scoped overwrite — replay-idempotent by construction, no
    marker protocol needed for COUNTS), then scored against the updated
    stats, so a batch's weights equal a batch-mode dsir_importance over
    corpus-so-far + batch (the equivalence the tests pin). Weights
    accumulate under `weights_dir` partitioned by batch; with
    `threshold` set each row also carries the keep decision (the pure-
    filter 100 TB selection regime). Per-batch cost is proportional to
    the batch — the corpus only ever participates as its KB-sized
    histogram. Seed with write_dsir_stats first.
    """
    import os

    from biocache_store_spark.operators.curation import (
        append_dsir_stats,
        probe_dsir_stats,
    )

    if not _index_dir_exists(spark, stats_path, "cp"):
        raise ValueError(
            f"dsir_stream: no DSIR stats at {stats_path!r}; seed them with "
            "write_dsir_stats on the target + initial corpus first"
        )
    # partition labels are namespaced by a run id derived from the
    # checkpoint path: Spark restarts batch_id at 0 whenever a stream
    # gets a fresh checkpoint, and a bare `batch0` label would then
    # OVERWRITE the counts an earlier run already folded (deleting
    # history, unlike the LSH/IVF appends). Same checkpoint -> same run
    # id, so replay idempotence is preserved; new checkpoint -> new
    # namespace, so prior folds survive.
    import hashlib

    run_id = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]
    raw = spark.readStream.schema(schema).json(staging_dir)

    def handle(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        batch = batch.persist()
        try:
            # fold first, then score: batch mode counts every scored
            # document's own features in q, so the probe must too
            append_dsir_stats(
                batch, stats_path, part=f"r{run_id}b{batch_id}"
            )
            weights = probe_dsir_stats(spark, stats_path, batch)
            if threshold is not None:
                weights = weights.withColumn(
                    "selected", F.col("importance") >= threshold
                )
            weights.write.mode("overwrite").parquet(
                os.path.join(weights_dir, f"run={run_id}", f"batch={batch_id}")
            )
        finally:
            batch.unpersist()

    writer = raw.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


OCCURRENCE_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("occurrenceID", T.StringType()),
        T.StructField("dataResourceUid", T.StringType()),
        T.StructField("taxonConceptID", T.StringType()),
        T.StructField("year", T.StringType()),
        T.StructField("month", T.StringType()),
        T.StructField("day", T.StringType()),
        T.StructField("decimalLatitude", T.StringType()),
        T.StructField("decimalLongitude", T.StringType()),
        T.StructField("recordedBy", T.StringType()),
        T.StructField("recordNumber", T.StringType()),
        T.StructField("catalogNumber", T.StringType()),
    ]
)


def _latest_dup_version(
    spark: SparkSession, dup_dir: str, before: int | None = None
) -> str | None:
    """Newest `v=<n>` subdirectory of the standing duplicate store, via the
    Hadoop FileSystem API (works on local/HDFS/s3a alike); None when the
    store has no committed version yet. `before` bounds the search to
    versions < that batch id — an at-least-once REPLAY of batch N must
    read its PREDECESSOR, never the (possibly partial) v=N it is about to
    overwrite: reading and overwriting the same path either trips Spark's
    self-overwrite guard every restart or races the delete."""
    best = None
    for n in _dup_version_numbers(spark, dup_dir):
        if before is not None and n >= before:
            continue
        if best is None or n > best:
            best = n
    return None if best is None else f"{dup_dir}/v={best}"


def _dup_version_numbers(spark: SparkSession, dup_dir: str) -> list[int]:
    """All committed `v=<n>` version numbers of a versioned store, sorted
    ascending; [] when the store directory does not exist yet."""
    fs, base = _hadoop_fs(spark, dup_dir)
    if not fs.exists(base):
        return []
    out = []
    for status in fs.listStatus(base):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), p


def _checkpoint_query_id(spark: SparkSession, checkpoint_dir: str) -> str | None:
    """The streaming query id from `<checkpoint>/metadata` — stable across
    restarts of the same checkpoint, fresh when the checkpoint is wiped.
    None if the metadata file does not exist (stream not started yet)."""
    import json

    fs, p = _hadoop_fs(spark, checkpoint_dir + "/metadata")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        content = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(content).get("id")


def _guard_dup_epoch(
    spark: SparkSession,
    dup_dir: str,
    checkpoint_dir: str,
    batch_id: int,
    prev_dir: str | None,
    batch: DataFrame | None = None,
    store_dir: str | None = None,
) -> None:
    """Refuse to write into a duplicate store from another checkpoint
    epoch. Batch ids restart at 0 when the checkpoint is wiped; if the
    store/dup dirs were kept, the new batch 0 would read no predecessor
    (silently dropping every untouched taxon from the new latest version)
    and overwrite the old v=0. The epoch is the streaming query id
    (stable per checkpoint), recorded as an `_epoch_<id>` marker dir on
    first write. Legacy stores without a marker are validated by the
    version numbers instead: versions the current batch does not follow
    (all >= batch_id) mean the ids restarted."""
    query_id = _checkpoint_query_id(spark, checkpoint_dir)
    fs, base = _hadoop_fs(spark, dup_dir)
    epoch: str | None = None
    if fs.exists(base):
        for status in fs.listStatus(base):
            name = status.getPath().getName()
            if name.startswith("_epoch_"):
                epoch = name[len("_epoch_"):]
                break
    if epoch is not None and query_id is not None and epoch != query_id:
        raise RuntimeError(
            f"streaming store maintenance: versioned store {dup_dir} belongs "
            f"to checkpoint epoch {epoch} but this stream's checkpoint is "
            f"{query_id} — the checkpoint was wiped while the store was "
            "kept. Batch ids restarted, so merging would silently drop "
            "every untouched taxon and overwrite old versions. Start with "
            "fresh store/dup dirs, or restore the original checkpoint."
        )
    if epoch is None:
        if prev_dir is None and _latest_dup_version(spark, dup_dir) is not None:
            # one legitimate shape slips through the version heuristic: a
            # pre-marker store whose stream crashed after writing v=0 but
            # before the checkpoint commit replays batch 0 at-least-once
            # with v=0 already on disk. When v=0 is the ONLY version the
            # replay is a self-overwrite of identical rows (idempotent) —
            # refusing it would block restart until manual intervention.
            versions = _dup_version_numbers(spark, dup_dir)
            if batch_id != 0 or versions != [0]:
                raise RuntimeError(
                    f"streaming store maintenance: versioned store {dup_dir} "
                    f"has versions the current batch (id={batch_id}) does "
                    "not follow, and no epoch marker — the checkpoint was "
                    "likely wiped while the store was kept. Start with "
                    "fresh store/dup dirs, or restore the original "
                    "checkpoint."
                )
            # batch 0 over a single-version legacy store is EITHER a
            # first-batch crash replay (idempotent) OR a wiped checkpoint
            # over a store that ran exactly one batch — the on-disk SHAPE
            # cannot distinguish them, but the CONTENT can: a true replay
            # re-delivers exactly the rows `store_dir/batch=0` already
            # holds. Anything else means new data under a new checkpoint
            # is about to clobber the old epoch's records — refuse.
            if batch is not None and store_dir is not None:
                import os as _os

                b0 = _os.path.join(store_dir, "batch=0")
                bfs, bbase = _hadoop_fs(spark, b0)
                differs = not bfs.exists(bbase)
                # v=0 is written strictly AFTER batch=0 in handle(), so a
                # MISSING batch=0 can never be a crash replay either —
                # that shape is a fresh/re-pointed store_dir over a kept
                # legacy dup_dir, and accepting it would merge the new
                # batch against no predecessor (dropping every untouched
                # group from the old epoch)
                if not differs:
                    existing = spark.read.parquet(b0)
                    cols = [c for c in existing.columns if c in batch.columns]
                    differs = bool(
                        batch.select(*cols)
                        .exceptAll(existing.select(*cols))
                        .take(1)
                        or existing.select(*cols)
                        .exceptAll(batch.select(*cols))
                        .take(1)
                    )
                if differs:
                    raise RuntimeError(
                        f"streaming store maintenance: {dup_dir} has "
                        "v=0 and no epoch marker, and the incoming "
                        "batch 0 does not match the store's existing "
                        "batch=0 rows — this is a wiped checkpoint "
                        "over a kept legacy store, not an at-least-"
                        "once replay. Start with fresh store/dup "
                        "dirs, or restore the original checkpoint "
                        "(a legacy store can also be adopted by "
                        "manually creating its _epoch_<queryId> "
                        "marker)."
                    )
        if query_id is not None:
            fs.mkdirs(
                spark._jvm.org.apache.hadoop.fs.Path(
                    f"{dup_dir}/_epoch_{query_id}"
                )
            )


def occurrence_dedup_stream(
    spark: SparkSession,
    staging_dir: str,
    store_dir: str,
    dup_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = OCCURRENCE_STREAM_SCHEMA,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming incremental duplication detection — the occurrence twin
    of `near_dup_stream` and the streaming composition of
    tool/IncrementalDuplicationDetection.scala: each microbatch of
    arriving records (JSONL drops) is appended to the occurrence store,
    its DISTINCT TAXA — unioned with the OLD taxa of any re-delivered
    record, so a record that moved species gets both its old and new
    species recomputed — are re-detected over the updated store
    (detect_duplicates_scoped — all of the touched species' records,
    never just the batch), and the result is merged into the standing
    duplicate store (merge_dedup_results). Per-microbatch cost is
    proportional to the touched species' records, never the corpus.
    An epoch marker ties the duplicate store to its checkpoint: wiping
    the checkpoint while keeping the store fails loudly instead of
    silently restarting batch ids over old versions.

    State lives in files, versioned for at-least-once safety:
      * the store append writes an overwrite-idempotent
        `batch=<id>` subdirectory (a replay rewrites the same rows);
      * the duplicate store is APPEND-ONLY versioned `v=<batch_id>`
        directories — the merge reads the latest committed version and
        writes the next, so a crash mid-write can never corrupt the
        version being read (the read-modify-overwrite race a single
        directory would have), and a replay overwrites its own version
        with identical rows. Consumers read `_latest_dup_version`.
    """
    from biocache_store_spark.operators.dedup import (
        detect_duplicates_scoped,
        merge_dedup_results,
    )

    return _versioned_maintenance_stream(
        spark,
        staging_dir,
        store_dir,
        dup_dir,
        checkpoint_dir,
        schema,
        id_col="occurrenceID",
        group_col="taxonConceptID",
        detect_fn=lambda store, groups: detect_duplicates_scoped(
            store, groups.withColumnRenamed("taxonConceptID", "taxon")
        ),
        merge_fn=lambda prev, inc, groups: merge_dedup_results(
            prev, inc, groups.withColumnRenamed("taxonConceptID", "taxon")
        ),
        available_now=available_now,
    )


def _versioned_maintenance_stream(
    spark: SparkSession,
    staging_dir: str,
    store_dir: str,
    versioned_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    id_col: str,
    group_col: str,
    detect_fn,
    merge_fn,
    available_now: bool,
) -> StreamingQuery:
    """Shared skeleton of the streaming incremental-maintenance twins
    (occurrence_dedup_stream / occurrence_outlier_stream): drain JSONL
    drops, append each microbatch to the occurrence store as an
    overwrite-idempotent `batch=<id>` partition, build the upsert view
    (argmax-by-batch per id — a re-delivered record supersedes its older
    versions), scope = the batch's groups UNION the superseded rows' OLD
    groups (a moved record's old group must be recomputed too or
    incremental != full), `detect_fn(store, groups)` recomputes them,
    and `merge_fn(prev, inc, groups)` folds the result into the
    append-only versioned store against the strictly-earlier predecessor
    (a replay of batch N must never read the v=N it overwrites). The
    checkpoint-epoch guard runs BEFORE any write — including the store
    append, so a wiped-checkpoint restart cannot clobber the old epoch's
    `batch=0` records before failing."""
    import os

    raw = spark.readStream.schema(schema).json(staging_dir)

    def touched(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col(group_col).isNotNull())
            .select(F.col(group_col).cast("string").alias(group_col))
            .distinct()
        )

    def handle(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        prev_dir = _latest_dup_version(spark, versioned_dir, before=batch_id)
        _guard_dup_epoch(
            spark, versioned_dir, checkpoint_dir, batch_id, prev_dir,
            batch=batch, store_dir=store_dir,
        )
        batch.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch={batch_id}")
        )
        from pyspark.sql.window import Window

        raw_store = spark.read.parquet(store_dir)
        w = Window.partitionBy(id_col).orderBy(F.col("batch").desc())
        store = (
            raw_store.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "batch")
        )
        superseded = raw_store.filter(F.col("batch") < batch_id).join(
            batch.select(F.col(id_col).cast("string").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        )
        # persist: the groups plan embeds a store scan and is evaluated
        # by the scope push-down, the detection AND the merge
        groups = (
            touched(batch).unionByName(touched(superseded)).distinct().persist()
        )
        try:
            inc = detect_fn(store, groups)
            merged = (
                inc
                if prev_dir is None
                else merge_fn(spark.read.parquet(prev_dir), inc, groups)
            )
            merged.write.mode("overwrite").parquet(
                os.path.join(versioned_dir, f"v={batch_id}")
            )
        finally:
            groups.unpersist()

    writer = raw.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


OUTLIER_STREAM_SCHEMA = T.StructType(
    [T.StructField("taxonConceptID", T.StringType()),
     T.StructField("occurrenceID", T.StringType())]
    + [T.StructField(f"el{i}", T.DoubleType()) for i in range(1, 3)]
)


def occurrence_outlier_stream(
    spark: SparkSession,
    staging_dir: str,
    store_dir: str,
    outlier_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = OUTLIER_STREAM_SCHEMA,
    layer_cols: list[str] | None = None,
    group_col: str = "taxonConceptID",
    id_col: str = "occurrenceID",
    cell_col: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming jackknife-outlier maintenance — the outlier twin of
    `occurrence_dedup_stream`, completing the persisted-outlier-store
    lifecycle (ReverseJacknifeProcessor storeResultsWithStats) as a
    stream: each microbatch of arriving records is appended to the
    occurrence store, the batch's DISTINCT GROUPS — unioned with the OLD
    groups of any re-delivered record — are re-detected over ALL their
    records in the upserted store, and the result merges into the
    standing versioned outlier store (touched groups replaced wholesale,
    moved row_keys scrubbed). The same at-least-once safety as the dedup
    twin: overwrite-idempotent `batch=<id>` store appends, append-only
    `v=<batch_id>` outlier versions merged against the strictly-earlier
    predecessor, and the checkpoint-epoch guard refusing wiped-checkpoint
    /kept-store mismatches. Per-microbatch cost is proportional to the
    touched groups' records, never the corpus."""
    from biocache_store_spark.operators.outlier_store import (
        jackknife_record_outliers,
        merge_outlier_results,
    )

    layers = layer_cols or [
        f.name for f in schema.fields if isinstance(f.dataType, T.DoubleType)
    ]

    def detect(store: DataFrame, groups: DataFrame) -> DataFrame:
        from biocache_store_spark.operators.dedup import scope_to_groups

        scoped = scope_to_groups(store, groups, group_col)
        return jackknife_record_outliers(
            scoped, [group_col], layers, id_col, cell_col=cell_col
        )

    return _versioned_maintenance_stream(
        spark,
        staging_dir,
        store_dir,
        outlier_dir,
        checkpoint_dir,
        schema,
        id_col=id_col,
        group_col=group_col,
        detect_fn=detect,
        merge_fn=lambda prev, inc, groups: merge_outlier_results(
            prev, inc, groups, [group_col]
        ),
        available_now=available_now,
    )


EXPERT_OUTLIER_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("taxonConceptID", T.StringType()),
        T.StructField("occurrenceID", T.StringType()),
        T.StructField("decimalLatitude", T.DoubleType()),
        T.StructField("decimalLongitude", T.DoubleType()),
        T.StructField("coordinateUncertaintyInMeters", T.DoubleType()),
    ]
)


def expert_outlier_stream(
    spark: SparkSession,
    staging_dir: str,
    store_dir: str,
    outlier_dir: str,
    checkpoint_dir: str,
    distributions: DataFrame,
    schema: T.StructType = EXPERT_OUTLIER_STREAM_SCHEMA,
    distance_threshold_m: float | None = None,
    group_col: str = "taxonConceptID",
    id_col: str = "occurrenceID",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming expert-distribution outlier maintenance — the third
    `_versioned_maintenance_stream` twin, completing the incremental
    trilogy (duplicates / jackknife / expert ranges). Each microbatch of
    arriving records is appended to the occurrence store; the batch's
    DISTINCT TAXA — unioned with the OLD taxa of any re-delivered record,
    so a record that moved species gets both species recomputed — are
    re-tested against the broadcast expert-range dim over ALL their
    records in the upserted store (expert_outlier_records, the
    markOutlierOccurrences relation of
    tool/ExpertDistributionOutlierTool.scala:459-528), and the result
    merges into the standing versioned store (touched taxa replaced
    wholesale, moved row_keys scrubbed — merge_outlier_results with
    group_cols=['taxon']). Taxa without an expert range are never tested
    (find_outliers' semi-join), so their presence in the touched set
    replaces nothing with nothing. Same at-least-once safety as the other
    twins: overwrite-idempotent `batch=<id>` store appends, append-only
    `v=<batch_id>` versions merged against the strictly-earlier
    predecessor, checkpoint-epoch guard before any write. Per-microbatch
    cost is proportional to the touched taxa's records, never the corpus;
    the range dim broadcasts once per batch (it is driver-collected and
    guard-capped inside expert_outlier_records)."""
    from biocache_store_spark.operators.dedup import scope_to_groups
    from biocache_store_spark.operators.outlier_distribution import (
        DISTANCE_THRESHOLD_M,
        expert_outlier_records,
    )
    from biocache_store_spark.operators.outlier_store import (
        merge_outlier_results,
    )

    threshold = (
        DISTANCE_THRESHOLD_M
        if distance_threshold_m is None
        else float(distance_threshold_m)
    )

    def detect(store: DataFrame, groups: DataFrame) -> DataFrame:
        scoped = scope_to_groups(store, groups, group_col)
        return expert_outlier_records(
            scoped,
            distributions,
            distance_threshold_m=threshold,
            taxon_col=group_col,
            id_col=id_col,
        )

    return _versioned_maintenance_stream(
        spark,
        staging_dir,
        store_dir,
        outlier_dir,
        checkpoint_dir,
        schema,
        id_col=id_col,
        group_col=group_col,
        detect_fn=detect,
        merge_fn=lambda prev, inc, groups: merge_outlier_results(
            prev, inc, groups.withColumnRenamed(group_col, "taxon"), ["taxon"]
        ),
        available_now=available_now,
    )
