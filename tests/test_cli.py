"""CLI tool surface: the reference's operational loop (cmd/CMD2.scala
registry) driven end-to-end through `python -m biocache_store_spark`."""

from __future__ import annotations

import json
import os
import zipfile

from biocache_store_spark.cli import main

FIXTURE_DWCA = os.path.join(os.path.dirname(__file__), "fixtures", "test-dwca")


def test_cli_load_dwca_event_core(spark, tmp_path):
    """`load-dwca` on an event-core (sampling-event) archive: the loader
    must pick the event-core path and store one record per
    occurrence-extension row with event terms inherited."""
    from test_sources_exports_streaming import _write_event_archive

    archive = tmp_path / "event-archive"
    archive.mkdir()
    _write_event_archive(archive)
    out = str(tmp_path / "raw")
    assert main([
        "load-dwca", "--archive", str(archive), "--dr", "drE",
        "--unique-terms", "occurrenceID", "--out", out,
    ]) == 0
    raw = spark.read.parquet(out)
    rows = {r["occurrenceID"]: r for r in raw.collect()}
    assert set(rows) == {"o1", "o2", "o3", "o4"}
    assert rows["o1"]["stateProvince"] == "NSW"
    assert rows["o1"]["locality"] == "Site A"
    assert rows["o1"]["rowKey"] == "drE|o1"


def test_cli_load_process_index_facet_lifecycle(spark, tmp_path, capsys):
    """load-dwca -> process -> index -> facet: the `biocache ingest`
    loop as four separate tools sharing parquet stores."""
    raw_store = str(tmp_path / "raw")
    processed_store = str(tmp_path / "processed")
    index_store = str(tmp_path / "index")

    assert main([
        "load-dwca", "--archive", FIXTURE_DWCA, "--dr", "dr0",
        "--unique-terms", "occurrenceID", "--out", raw_store,
    ]) == 0
    raw = spark.read.parquet(raw_store)
    assert raw.count() == 3
    assert "rowKey" in raw.columns and "uuid" in raw.columns

    assert main(["process", "--in", raw_store, "--out", processed_store]) == 0
    processed = spark.read.parquet(processed_store)
    assert processed.count() == 3
    assert "assertions" in processed.columns

    assert main(["index", "--in", processed_store, "--out", index_store]) == 0
    index = spark.read.parquet(index_store)
    assert index.count() == 3
    assert "basis_of_record" in index.columns

    capsys.readouterr()
    assert main(["facet", "--in", index_store, "--field", "basis_of_record"]) == 0
    out = capsys.readouterr().out
    facets = dict(line.split("\t") for line in out.strip().splitlines())
    assert facets == {"PreservedSpecimen": "2", "HumanObservation": "1"}


def test_cli_export_delete_describe(spark, tmp_path, capsys):
    raw_store = str(tmp_path / "raw")
    main([
        "load-dwca", "--archive", FIXTURE_DWCA, "--dr", "dr0",
        "--unique-terms", "occurrenceID", "--out", raw_store,
    ])

    # query-scoped CSV export (ExportFromIndex shape)
    export_dir = str(tmp_path / "export")
    assert main([
        "export", "--in", raw_store, "--fields", "occurrenceID,scientificName",
        "--query", "basisOfRecord:PreservedSpecimen", "--out", export_dir,
    ]) == 0
    import glob

    csvs = glob.glob(export_dir + "/*.csv")
    assert csvs
    lines = [ln for p in csvs for ln in open(p).read().splitlines() if ln]
    # raw store is pre-vocab-normalization: exactly one row carries the
    # literal 'PreservedSpecimen' (r3's 'S' normalizes only in process)
    assert len(lines) == 2  # header + urn:occ:1
    assert any("urn:occ:1" in ln for ln in lines)

    # DwC-A zip round trip (DwCACreator shape)
    zip_path = str(tmp_path / "out.zip")
    assert main([
        "export-dwca", "--in", raw_store,
        "--fields", "occurrenceID,scientificName", "--out", zip_path,
    ]) == 0
    assert set(zipfile.ZipFile(zip_path).namelist()) == {
        "meta.xml", "eml.xml", "occurrence.csv",
    }

    # delete by query, survivors written out
    kept_store = str(tmp_path / "kept")
    dellog = str(tmp_path / "dellog")
    assert main([
        "delete", "--in", raw_store, "--query", "basisOfRecord:S",
        "--out", kept_store, "--dellog", dellog,
    ]) == 0
    assert spark.read.parquet(kept_store).count() == 2
    assert spark.read.parquet(dellog).count() == 1

    # delete by explicit keys
    keys = [r["rowKey"] for r in spark.read.parquet(raw_store).collect()][:1]
    kept2 = str(tmp_path / "kept2")
    assert main([
        "delete", "--in", raw_store, "--keys", keys[0], "--out", kept2,
    ]) == 0
    assert spark.read.parquet(kept2).count() == 2

    # describe emits schema + per-resource counts as JSON
    capsys.readouterr()
    assert main(["describe", "--in", raw_store]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["rows"] == 3
    assert info["resources"] == {"dr0": 3}

    capsys.readouterr()
    assert main(["healthcheck", "--in", raw_store]) == 0
    health = json.loads(capsys.readouterr().out)
    assert health["store_rows"] == 3

    capsys.readouterr()
    assert main(["version"]) == 0
    assert capsys.readouterr().out.strip()


def test_cli_dedup_and_jackknife(spark, tmp_path):
    store = str(tmp_path / "occ")
    spark.createDataFrame(
        [
            ("t1", "2001", "1", "2", "-35.1", "144.2", "Smith, J.", "r1", "c1", "o1", "dr0"),
            ("t1", "2001", "1", "2", "-35.1", "144.2", "Smith, J.", "r1", "c1", "o2", "dr0"),
            ("t2", "2002", "3", "4", "-30.0", "140.0", "Jones, K.", "r2", "c2", "o3", "dr0"),
        ],
        "taxonConceptID string, year string, month string, day string,"
        " decimalLatitude string, decimalLongitude string, recordedBy string,"
        " recordNumber string, catalogNumber string, occurrenceID string,"
        " dataResourceUid string",
    ).write.mode("overwrite").parquet(store)

    dup_out = str(tmp_path / "dups")
    assert main(["dedup-detect", "--in", store, "--out", dup_out]) == 0
    statuses = {
        r["row_key"]: r["status"]
        for r in spark.read.parquet(dup_out).collect()
    }
    assert statuses["o3"] == "U"
    assert sorted(statuses[k] for k in ("o1", "o2")) == ["D1", "R"]

    # scoped re-run (--lsids) merged into the standing store (--prev):
    # only t1 recomputed, t2's row passes through; equals the full run
    scoped_out = str(tmp_path / "dups_scoped")
    assert main([
        "dedup-detect", "--in", store, "--out", scoped_out,
        "--lsids", "t1", "--prev", dup_out,
    ]) == 0
    merged = {
        r["row_key"]: r["status"]
        for r in spark.read.parquet(scoped_out).collect()
    }
    assert merged == statuses

    # --since + --prev with a taxon MOVE: o2 re-identified t1 -> t2; the
    # CLI must union the old taxon from the standing store so t1's
    # remaining record reverts and no stale (t1, o2) row survives
    store2 = str(tmp_path / "occ2")
    spark.createDataFrame(
        [
            ("t1", "2001", "1", "2", "-35.1", "144.2", "Smith, J.", "r1", "c1", "o1", "dr0", "2026-01-01"),
            ("t2", "2002", "3", "4", "-30.0", "140.0", "Jones, K.", "r2", "c2", "o2", "dr0", "2026-02-01"),
            ("t2", "2002", "3", "4", "-30.0", "140.0", "Jones, K.", "r2", "c2", "o3", "dr0", "2026-01-01"),
        ],
        "taxonConceptID string, year string, month string, day string,"
        " decimalLatitude string, decimalLongitude string, recordedBy string,"
        " recordNumber string, catalogNumber string, occurrenceID string,"
        " dataResourceUid string, lastModifiedTime string",
    ).write.mode("overwrite").parquet(store2)
    moved_out = str(tmp_path / "dups_moved")
    assert main([
        "dedup-detect", "--in", store2, "--out", moved_out,
        "--since", "2026-01-15", "--prev", dup_out,
    ]) == 0
    moved = spark.read.parquet(moved_out).collect()
    keys = {(r["taxon"], r["row_key"]) for r in moved}
    assert ("t2", "o2") in keys and ("t1", "o2") not in keys
    st = {r["row_key"]: r["status"] for r in moved}
    assert st["o1"] == "U" and sorted((st["o2"], st["o3"])) == ["D1", "R"]

    # outlier-detect: full run, then an incremental --since/--prev merge
    # that must equal a full recompute
    occ3 = str(tmp_path / "occ3")
    rows3 = [("tA", f"a{i}", f"a{i}", float(i + 1), "2026-01-01") for i in range(25)]
    rows3.append(("tA", "aX", "aX", 60.0, "2026-01-01"))
    rows3 += [("tB", f"b{i}", f"b{i}", float(i + 1), "2026-01-01") for i in range(25)]
    # T1 adds an extreme to tB only
    rows3.append(("tB", "bX", "bX", 400.0, "2026-02-01"))
    spark.createDataFrame(
        [(t, o, c, v, m) for (t, o, c, v, m) in rows3],
        "taxon string, oid string, cid string, el1 double,"
        " lastModifiedTime string",
    ).write.mode("overwrite").parquet(occ3)
    full_out = str(tmp_path / "outliers_full")
    assert main([
        "outlier-detect", "--in", occ3, "--group-cols", "taxon",
        "--layer-cols", "el1", "--id-col", "oid", "--out", full_out,
    ]) == 0
    full_rows = spark.read.parquet(full_out)
    assert {
        r["row_key"] for r in full_rows.filter("is_outlier").collect()
    } == {"aX", "bX"}

    # standing store = full detect over T0 (drop the T1 arrival)
    t0_store = str(tmp_path / "occ3_t0")
    spark.read.parquet(occ3).filter(
        "lastModifiedTime < '2026-01-15'"
    ).write.parquet(t0_store)
    prev_out = str(tmp_path / "outliers_prev")
    assert main([
        "outlier-detect", "--in", t0_store, "--group-cols", "taxon",
        "--layer-cols", "el1", "--id-col", "oid", "--out", prev_out,
    ]) == 0
    inc_out = str(tmp_path / "outliers_inc")
    assert main([
        "outlier-detect", "--in", occ3, "--group-cols", "taxon",
        "--layer-cols", "el1", "--id-col", "oid", "--out", inc_out,
        "--since", "2026-01-15", "--prev", prev_out,
    ]) == 0
    merged = spark.read.parquet(inc_out)
    key = lambda r: (r["taxon"], r["layer"], r["row_key"])  # noqa: E731
    assert sorted(map(str, sorted(merged.collect(), key=key))) == sorted(
        map(str, sorted(full_rows.collect(), key=key))
    )
    # a later ingest fills tA's gap: aX stops being an outlier and the
    # --revert-out diff (the reference's reset list) must name it
    occ4 = str(tmp_path / "occ4")
    rows4 = rows3 + [
        ("tA", f"g{i}", f"g{i}", float(26 + i), "2026-03-01")
        for i in range(34)
    ]
    spark.createDataFrame(
        rows4,
        "taxon string, oid string, cid string, el1 double,"
        " lastModifiedTime string",
    ).write.mode("overwrite").parquet(occ4)
    inc2_out = str(tmp_path / "outliers_inc2")
    revert_out = str(tmp_path / "outlier_reverts")
    assert main([
        "outlier-detect", "--in", occ4, "--group-cols", "taxon",
        "--layer-cols", "el1", "--id-col", "oid", "--out", inc2_out,
        "--since", "2026-02-15", "--prev", inc_out,
        "--revert-out", revert_out,
    ]) == 0
    reverts = {r["row_key"] for r in spark.read.parquet(revert_out).collect()}
    assert reverts == {"aX"}

    # --since without --prev and --prev==--out both refuse
    assert main([
        "outlier-detect", "--in", occ3, "--group-cols", "taxon",
        "--layer-cols", "el1", "--id-col", "oid", "--out", inc_out,
        "--since", "2026-01-15",
    ]) == 2
    assert main([
        "outlier-detect", "--in", occ3, "--group-cols", "taxon",
        "--layer-cols", "el1", "--id-col", "oid", "--out", prev_out,
        "--since", "2026-01-15", "--prev", prev_out,
    ]) == 2

    jk_store = str(tmp_path / "vals")
    spark.createDataFrame(
        [("g1", float(v)) for v in range(1, 26)] + [("g1", 500.0)],
        "grp string, val double",
    ).write.mode("overwrite").parquet(jk_store)
    jk_out = str(tmp_path / "jk")
    assert main([
        "jackknife", "--in", jk_store, "--group-cols", "grp",
        "--value-col", "val", "--out", jk_out,
    ]) == 0
    rows = spark.read.parquet(jk_out).collect()
    assert len(rows) == 1 and rows[0]["outlier_values"] == [500.0]


def test_cli_curation_tools(spark, tmp_path, capsys):
    """lsh-index -> near-dup-probe --append-after -> semantic-dedup -> curate."""
    import json as _json

    from biocache_store_spark.cli import main

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    seed_store = str(tmp_path / "docs_seed")
    spark.createDataFrame(
        [(1, base, "s"), (2, "one two three four five six seven eight", "s")],
        "doc_id long, text string, source string",
    ).write.parquet(seed_store)
    index = str(tmp_path / "lsh")
    assert main(["lsh-index", "--in", seed_store, "--index", index]) == 0

    batch_store = str(tmp_path / "docs_batch")
    spark.createDataFrame(
        [(11, base + " llama", "s")], "doc_id long, text string, source string"
    ).write.parquet(batch_store)
    pairs_out = str(tmp_path / "pairs")
    assert main([
        "near-dup-probe", "--in", batch_store, "--index", index,
        "--out", pairs_out, "--append-after",
    ]) == 0
    pairs = {(r["doc_a"], r["doc_b"]) for r in spark.read.parquet(pairs_out).collect()}
    assert (1, 11) in pairs
    # --append-after: doc 11's signatures are now in the index
    sig_ids = {r["doc_id"] for r in spark.read.parquet(index + "/sig").collect()}
    assert 11 in sig_ids

    emb_store = str(tmp_path / "emb")
    spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    ).write.parquet(emb_store)
    sd_out = str(tmp_path / "sd")
    assert main([
        "semantic-dedup", "--in", emb_store, "--out", sd_out,
        "--cells", "2", "--threshold", "0.9",
    ]) == 0
    keep = {r["vec_id"]: r["keep"] for r in spark.read.parquet(sd_out).collect()}
    assert keep == {0: True, 1: False, 2: True}

    docs_dir = tmp_path / "corpus"
    docs_dir.mkdir()
    spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).write.parquet(str(docs_dir / "documents.parquet"))
    assert main(["curate", "--in", str(docs_dir)]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert lines and all("source" in _json.loads(l) for l in lines)


def test_cli_kmeans_train_feeds_semantic_dedup(spark, tmp_path, capsys):
    from biocache_store_spark.cli import main

    emb_store = str(tmp_path / "emb")
    spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).write.parquet(emb_store)
    cent_out = str(tmp_path / "cents")
    assert main([
        "kmeans-train", "--in", emb_store, "--out", cent_out, "--k", "4",
    ]) == 0
    cents = spark.read.parquet(cent_out)
    assert cents.columns == ["cell_id", "centroid"] and cents.count() == 4

    sd_out = str(tmp_path / "sd")
    assert main([
        "semantic-dedup", "--in", emb_store, "--out", sd_out,
        "--centroids", cent_out, "--threshold", "0.99",
    ]) == 0
    out = spark.read.parquet(sd_out)
    assert out.count() == spark.read.parquet(emb_store).count()


def test_cli_compact_bounds_file_count(spark, tmp_path):
    import glob

    from biocache_store_spark.cli import main

    frag = str(tmp_path / "fragmented")
    # simulate streaming-append fragmentation: 40 tiny files
    spark.range(200).repartition(40).write.parquet(frag)
    assert len(glob.glob(frag + "/part-*")) == 40

    out = str(tmp_path / "compacted")
    assert main(["compact", "--in", frag, "--out", out, "--target-files", "2"]) == 0
    assert len(glob.glob(out + "/part-*")) <= 2
    assert spark.read.parquet(out).count() == 200


def test_cli_compact_partitioned_clusters_by_partition_cols(spark, tmp_path):
    import glob

    from biocache_store_spark.cli import main
    from pyspark.sql import functions as F

    frag = str(tmp_path / "frag")
    spark.range(300).withColumn(
        "dr", F.concat(F.lit("dr"), (F.col("id") % 10).cast("string"))
    ).repartition(30).write.parquet(frag)
    out = str(tmp_path / "out")
    assert main([
        "compact", "--in", frag, "--out", out,
        "--target-files", "10", "--partition-by", "dr",
    ]) == 0
    # hash-clustered by dr: each partition-value dir holds ~1 file, never
    # target_files x n_values
    files = glob.glob(out + "/dr=*/part-*")
    assert len(files) <= 20
    assert spark.read.parquet(out).count() == 300


def test_cli_build_corpus(spark, tmp_path, capsys):
    import json as _json

    from biocache_store_spark.cli import main

    store = str(tmp_path / "docs")
    spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).write.parquet(store)
    out = str(tmp_path / "corpus")
    assert main([
        "build-corpus", "--in", store, "--out", out,
        "--quality-threshold", "0.3",
    ]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    stages = {_json.loads(l)["stage"] for l in lines}
    assert "0_input" in stages and "4_near_dup" in stages
    assert spark.read.parquet(out + "/documents").count() > 0


def test_cli_streaming_ticks(spark, tmp_path):
    """stream-ingest and stream-near-dup both drain their staging dirs
    and exit (availableNow) — the cron-able incremental loop as two
    commands."""
    import csv
    import json as _json

    from biocache_store_spark.cli import main
    from biocache_store_spark.operators.minhash import write_lsh_index
    from biocache_store_spark.streaming.incremental import STAGING_SCHEMA

    staging = tmp_path / "staging"
    staging.mkdir()
    with open(staging / "drop1.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow([f.name for f in STAGING_SCHEMA.fields])
        w.writerow(["o1", "dr1", "PreservedSpecimen", "1999-04-01", "1999",
                    "4", "1", "-35.25", "149.75", "WGS84", "Australia",
                    "New South Wales", "Macropus rufus", "Smith, J."])
    out = str(tmp_path / "processed")
    assert main([
        "stream-ingest", "--staging", str(staging), "--out", out,
        "--checkpoint", str(tmp_path / "ck1"),
    ]) == 0
    assert spark.read.parquet(out).count() == 1

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    seed = spark.createDataFrame([(1, base)], "doc_id long, text string")
    index = str(tmp_path / "lsh")
    write_lsh_index(seed, index)
    dstage = tmp_path / "docs_staging"
    dstage.mkdir()
    (dstage / "d.jsonl").write_text(
        _json.dumps({"doc_id": 9, "text": base + " mu", "source": "s"})
    )
    pairs = str(tmp_path / "pairs")
    assert main([
        "stream-near-dup", "--staging", str(dstage), "--index", index,
        "--pairs", pairs, "--checkpoint", str(tmp_path / "ck2"),
    ]) == 0
    got = {(r["doc_a"], r["doc_b"]) for r in spark.read.parquet(pairs).collect()}
    assert (1, 9) in got


def test_cli_stream_semantic_dedup(spark, tmp_path):
    """stream-semantic-dedup drains an embedding drop against a seeded
    IVF index and lands keep/prune decisions; an unseeded index path is
    an argument error."""
    import json as _json

    from pyspark.sql import functions as F

    from biocache_store_spark.cli import main
    from biocache_store_spark.operators.similarity import write_ivf_index

    seed = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    cents = seed.select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    index = str(tmp_path / "ivf")
    write_ivf_index(seed, cents, index)
    staging = tmp_path / "sstage"
    staging.mkdir()
    (staging / "d.jsonl").write_text(_json.dumps(
        {"vec_id": 10, "embedding": [0.99, 0.01], "label": 1}  # dup of 0
    ) + "\n" + _json.dumps(
        {"vec_id": 11, "embedding": [-1.0, 0.2], "label": 1}   # novel
    ))
    decisions = str(tmp_path / "decisions")
    assert main([
        "stream-semantic-dedup", "--staging", str(staging),
        "--index", index, "--decisions", decisions,
        "--checkpoint", str(tmp_path / "ckd"), "--threshold", "0.9",
    ]) == 0
    got = {r["vec_id"]: r["keep"]
           for r in spark.read.parquet(decisions).collect()}
    assert got == {10: False, 11: True}
    assert main([
        "stream-semantic-dedup", "--staging", str(staging),
        "--index", str(tmp_path / "missing"), "--decisions", decisions,
        "--checkpoint", str(tmp_path / "ckd2"),
    ]) == 2


def test_cli_stream_ivfpq(spark, tmp_path):
    """stream-ivfpq drains an embedding drop against a seeded IVFADC
    index (neighbor report + marker-guarded code append) and exits;
    an unseeded index path is an argument error."""
    import json as _json

    from pyspark.sql import functions as F

    from biocache_store_spark.cli import main
    from biocache_store_spark.operators.similarity import write_ivfpq_index

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter((F.col("vec_id") >= 2) & (F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    seed = emb.filter(F.col("vec_id") < 40)
    index = str(tmp_path / "ivfpq")
    write_ivfpq_index(seed, cents, book, index)
    staging = tmp_path / "estage"
    staging.mkdir()
    drop = emb.filter(F.col("vec_id") >= 40).collect()
    (staging / "d.jsonl").write_text("\n".join(
        _json.dumps({"vec_id": r["vec_id"],
                     "embedding": [float(x) for x in r["embedding"]],
                     "label": r["label"]})
        for r in drop
    ))
    neighbors = str(tmp_path / "nbrs")
    assert main([
        "stream-ivfpq", "--staging", str(staging), "--index", index,
        "--neighbors", neighbors, "--checkpoint", str(tmp_path / "ck3"),
        "--k", "3",
    ]) == 0
    assert spark.read.parquet(index + "/codes").count() == emb.count()
    rep = spark.read.parquet(neighbors)
    assert rep.count() == 3 * len(drop)
    # unseeded index -> message + exit 2
    assert main([
        "stream-ivfpq", "--staging", str(staging),
        "--index", str(tmp_path / "missing"),
        "--neighbors", neighbors, "--checkpoint", str(tmp_path / "ck4"),
    ]) == 2


def test_cli_stream_expert_outliers(spark, tmp_path):
    """stream-expert-outliers drains a drop against a parquet range dim
    and lands the versioned record store."""
    import json as _json

    from biocache_store_spark.cli import main
    from biocache_store_spark.streaming.incremental import _latest_dup_version

    dist_dir = str(tmp_path / "dists")
    spark.createDataFrame(
        [("tA", "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))")],
        "taxonConceptID string, wkt string",
    ).write.parquet(dist_dir)
    staging = tmp_path / "staging"
    staging.mkdir()
    rows = [
        {"occurrenceID": "in1", "taxonConceptID": "tA",
         "decimalLatitude": 0.5, "decimalLongitude": 0.5,
         "coordinateUncertaintyInMeters": None},
        {"occurrenceID": "outX", "taxonConceptID": "tA",
         "decimalLatitude": 0.5, "decimalLongitude": 5.0,
         "coordinateUncertaintyInMeters": None},
    ]
    (staging / "d.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows)
    )
    out_dir = str(tmp_path / "outliers")
    assert main([
        "stream-expert-outliers", "--staging", str(staging),
        "--store", str(tmp_path / "store"), "--outliers", out_dir,
        "--checkpoint", str(tmp_path / "ck"),
        "--distributions", dist_dir,
    ]) == 0
    got = spark.read.parquet(_latest_dup_version(spark, out_dir))
    flagged = {r["row_key"] for r in got.filter("is_outlier").collect()}
    assert flagged == {"outX"}


def test_cli_snapshot_diff(spark, tmp_path, capsys):
    import json as _json

    from biocache_store_spark.cli import main

    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).write.parquet(old_p)
    spark.createDataFrame(
        [(2, "b2"), (3, "c")], "doc_id long, text string"
    ).write.parquet(new_p)
    assert main(["snapshot-diff", "--old", old_p, "--new", new_p]) == 0
    got = {
        _json.loads(l)["status"]: _json.loads(l)["n"]
        for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    }
    assert got == {"added": 1, "removed": 1, "changed": 1}


def test_cli_export_jsonl_format(spark, tmp_path):
    import json as _json
    import glob

    from biocache_store_spark.cli import main

    store = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "hello world", "en")], "doc_id long, text string, lang string"
    ).write.parquet(store)
    out = str(tmp_path / "jsonl_out")
    assert main([
        "export", "--in", store, "--fields", "doc_id,text",
        "--format", "jsonl", "--out", out,
    ]) == 0
    lines = []
    for f in glob.glob(out + "/part-*"):
        lines += [l for l in open(f) if l.strip()]
    assert [_json.loads(l) for l in lines] == [{"doc_id": 1, "text": "hello world"}]


def test_cli_all_tools_parse():
    """Every registered tool's parser builds and rejects empty args
    cleanly (argparse exits 2 on missing required) — guards against a
    malformed subparser breaking the whole CLI."""
    import pytest as _pytest

    from biocache_store_spark.cli import build_parser

    parser = build_parser()
    tools = sorted(parser._subparsers._group_actions[0].choices)
    assert len(tools) >= 20
    for t in ("load-dwca", "process", "build-corpus", "snapshot-diff"):
        assert t in tools
    with _pytest.raises(SystemExit):
        parser.parse_args([])  # tool required


def test_cli_ann_pipeline(spark, tmp_path, capsys):
    """kmeans-train -> ivf-index -> ann-query: the similarity-search
    lifecycle end-to-end through the CLI."""
    import json as _json

    from biocache_store_spark.cli import main

    emb_store = str(tmp_path / "emb")
    spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).write.parquet(emb_store)
    cents = str(tmp_path / "cents")
    assert main(["kmeans-train", "--in", emb_store, "--out", cents, "--k", "4"]) == 0
    index = str(tmp_path / "ivf")
    assert main([
        "ivf-index", "--in", emb_store, "--centroids", cents, "--index", index,
    ]) == 0
    assert main([
        "ann-query", "--index", index, "--queries", emb_store,
        "--query-ids", "0,1", "--k", "3",
    ]) == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{") and "query_id" in l]
    assert {r["query_id"] for r in rows} == {0, 1}
    assert all(1 <= r["rank"] <= 3 for r in rows)


def test_cli_ivfpq_pipeline(spark, tmp_path, capsys):
    """kmeans-train -> ivfpq-index (in-engine residual codebook
    training) -> ivfpq-query: the compressed similarity lifecycle
    through the CLI, plus the codebook-source guard."""
    import json as _json

    from biocache_store_spark.cli import main

    emb_store = str(tmp_path / "emb")
    spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).write.parquet(emb_store)
    cents = str(tmp_path / "cents")
    assert main(["kmeans-train", "--in", emb_store, "--out", cents, "--k", "4"]) == 0
    index = str(tmp_path / "ivfpq")
    # exactly one codebook source required
    assert main([
        "ivfpq-index", "--in", emb_store, "--centroids", cents,
        "--index", index,
    ]) == 2
    assert main([
        "ivfpq-index", "--in", emb_store, "--centroids", cents,
        "--index", index, "--train-codebook", "4",
    ]) == 0
    capsys.readouterr()
    assert main([
        "ivfpq-query", "--index", index, "--queries", emb_store,
        "--query-ids", "0,1", "--k", "3",
    ]) == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{") and "query_id" in l]
    assert {r["query_id"] for r in rows} == {0, 1}
    assert all(1 <= r["rank"] <= 3 for r in rows)
    assert all(r["approx_dist"] >= 0 for r in rows)
    # self-matches excluded (ann-query's convention): a query drawn
    # from the indexed corpus never appears in its own top-k
    assert all(r["vec_id"] != r["query_id"] for r in rows)
    # unknown query id -> clear error
    assert main([
        "ivfpq-query", "--index", index, "--queries", emb_store,
        "--query-ids", "999999",
    ]) == 2
    # --append must reuse the index's own dims: retraining (or passing
    # any dim) is refused — codes against a fresh codebook would decode
    # wrong under the stored one
    assert main([
        "ivfpq-index", "--in", emb_store, "--index", index,
        "--append", "--train-codebook", "4",
    ]) == 2
    assert main([
        "ivfpq-index", "--in", emb_store, "--index", index, "--append",
    ]) == 0
    # dims that disagree with the stored meta: message + exit 2, not a
    # traceback (ADVICE r11 #1/#4) — for append AND query
    assert main([
        "ivfpq-index", "--in", emb_store, "--index", index, "--append",
        "--subspaces", "4",
    ]) == 2
    assert main([
        "ivfpq-query", "--index", index, "--queries", emb_store,
        "--query-ids", "0", "--subspaces", "4",
    ]) == 2
    # --rerank against an index built without --store-vectors: exit 2
    assert main([
        "ivfpq-query", "--index", index, "--queries", emb_store,
        "--query-ids", "0", "--rerank", "10",
    ]) == 2
    # a trainer argument error (64 dims not divisible by 7 subspaces)
    # follows the same convention
    assert main([
        "ivfpq-index", "--in", emb_store, "--centroids", cents,
        "--index", str(tmp_path / "bad"), "--train-codebook", "4",
        "--subspaces", "7",
    ]) == 2

    # the re-rank lifecycle: --store-vectors index, --rerank query
    index2 = str(tmp_path / "ivfpq_rr")
    assert main([
        "ivfpq-index", "--in", emb_store, "--centroids", cents,
        "--index", index2, "--train-codebook", "4", "--store-vectors",
    ]) == 0
    capsys.readouterr()
    assert main([
        "ivfpq-query", "--index", index2, "--queries", emb_store,
        "--query-ids", "0,1", "--k", "3", "--rerank", "10",
    ]) == 0
    rr = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
          if l.startswith("{") and "query_id" in l]
    assert {r["query_id"] for r in rr} == {0, 1}
    assert all("cos_sim" in r and 1 <= r["rank"] <= 3 for r in rr)
    # re-ranked output is ordered by exact cosine, descending per query
    for qid in (0, 1):
        mine = sorted((r for r in rr if r["query_id"] == qid),
                      key=lambda r: r["rank"])
        assert all(a["cos_sim"] >= b["cos_sim"]
                   for a, b in zip(mine, mine[1:]))

    # delete lifecycle: tombstone the first query's rank-1 neighbor,
    # re-query (gone), vacuum (physically removed), unknown id warns
    victim = min(r["vec_id"] for r in rr if r["query_id"] == 0)
    capsys.readouterr()
    assert main([
        "ivfpq-delete", "--index", index2,
        "--ids", f"{victim},{victim},999999", "--check-present",
    ]) == 0
    out = capsys.readouterr()
    assert "999999" in out.err  # opt-in not-present warning
    # duplicated input id counted once
    assert _json.loads(out.out.splitlines()[-1])["tombstoned"] == 2
    assert main([
        "ivfpq-query", "--index", index2, "--queries", emb_store,
        "--query-ids", "0", "--k", "3", "--rerank", "10",
    ]) == 0
    rows2 = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{") and "query_id" in l]
    assert victim not in {r["vec_id"] for r in rows2}
    capsys.readouterr()
    assert main(["ivfpq-vacuum", "--index", index2]) == 0
    vac = _json.loads(capsys.readouterr().out.splitlines()[-1])
    assert vac == {"removed_codes": 1, "removed_vectors": 1}


def test_cli_migrate_media_and_references(spark, tmp_path, capsys):
    """migrate-media (dry-run count + real run) -> media-references
    rebuild + overlay (MigrateMedia / LoadMediaReferences tools)."""
    img = tmp_path / "m.jpg"
    img.write_bytes(b"\xff\xd8migratebytes")
    records_path = str(tmp_path / "records")
    spark.createDataFrame(
        [("r1", f"file://{img}")], "record_id string, associatedMedia string"
    ).write.parquet(records_path)

    # dry-run counts candidates WITHOUT fetching (the reference's dryRun):
    # no fetched/failed keys because no transport ran
    assert main(["migrate-media", "--in", records_path, "--dry-run"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {"to_migrate": 1}

    store_path = str(tmp_path / "store")
    assert main(["migrate-media", "--in", records_path, "--out", store_path]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "to_migrate": 1, "fetched": 1, "failed": 0,
    }
    refs_path = str(tmp_path / "refs")
    assert main([
        "media-references", "--store", store_path,
        "--records", records_path, "--out", refs_path,
    ]) == 0
    out = spark.read.parquet(refs_path).collect()
    assert len(out) == 1 and len(out[0]["images"]) == 1


def test_cli_migrate_media_failed_fetch_stays_retryable(spark, tmp_path, capsys):
    """A failed fetch must NOT enter the store: a null-content row would
    satisfy the candidate anti-join and permanently block retrying that
    URL. The failed pair stays a candidate for the next sweep."""
    img = tmp_path / "ok.jpg"
    img.write_bytes(b"\xff\xd8okbytes")
    records_path = str(tmp_path / "records")
    spark.createDataFrame(
        [("r1", f"file://{img}"), ("r2", f"file://{tmp_path}/missing.jpg")],
        "record_id string, associatedMedia string",
    ).write.parquet(records_path)

    store_path = str(tmp_path / "store")
    assert main(["migrate-media", "--in", records_path, "--out", store_path]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "to_migrate": 2, "fetched": 1, "failed": 1,
    }
    stored = spark.read.parquet(store_path)
    assert [r["record_id"] for r in stored.collect()] == ["r1"]

    # second sweep against the store: the failed URL is STILL a candidate
    assert main([
        "migrate-media", "--in", records_path, "--store", store_path,
        "--dry-run",
    ]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {"to_migrate": 1}


def test_cli_debug_and_scan(spark, tmp_path, capsys):
    """debug-record (rowKey + uuid fallback) and scan-records (totals,
    deleted, aggregate counts, csv) — util/DebugRecord.scala,
    tool/ScanRecords.scala."""
    store = str(tmp_path / "occ")
    spark.createDataFrame(
        [("rk1", "u1", "dr1", ""), ("rk2", "u2", "dr1", "2024-01-01"),
         ("rk3", "u3", "dr2", ""),
         # 'false' is LIVE under the store's shared flag convention
         # (operators/maintenance.py is_deleted_flag) — scan-records must
         # agree with cleanup/index, not re-implement the test
         ("rk4", "u4", "dr2", "false")],
        "rowKey string, uuid string, dataResourceUid string, deleted string",
    ).write.parquet(store)

    assert main(["debug-record", "--in", store, "--key", "rk1"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["found"] and out["raw"]["uuid"] == "u1"
    assert main(["debug-record", "--in", store, "--key", "u2"]) == 0
    assert json.loads(capsys.readouterr().out)["raw"]["rowKey"] == "rk2"
    assert main(["debug-record", "--in", store, "--key", "nope"]) == 1
    capsys.readouterr()

    csv = str(tmp_path / "counts.csv")
    assert main([
        "scan-records", "--in", store, "--aggregate", "dataResourceUid",
        "--csv", csv,
    ]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["scanned"] == 4 and out["deleted"] == 1
    assert out["aggregate"] == {"dr1": 2, "dr2": 2}
    assert open(csv).read().splitlines() == ["dr1,2", "dr2,2"]


def test_cli_resource_cleanup_and_remap(spark, tmp_path, capsys):
    """resource-cleanup rows/delete + remap-unique-key round trip
    (tool/ResourceCleanupTask.scala, util/RemapUniqueKey.scala)."""
    store = str(tmp_path / "store")
    spark.createDataFrame(
        [
            ("r1", "dr1", "2024-01-01T00:00:00Z", "", "AB 1"),
            ("r2", "dr1", "2024-06-01T00:00:00Z", "", "CD2"),
            ("r3", "dr2", "2024-01-01T00:00:00Z", "", "EF3"),
        ],
        "rowKey string, dataResourceUid string, lastModifiedTime string,"
        " deleted string, catalogNumber string",
    ).write.parquet(store)

    # --test mode writes nothing
    capsys.readouterr()
    assert main([
        "resource-cleanup", "--in", store, "--dr", "dr1", "--type", "rows",
        "--date", "2024-05-01T00:00:00Z", "--test",
    ]) == 0
    assert "[test] changes: 1" in capsys.readouterr().out

    marked = str(tmp_path / "marked")
    assert main([
        "resource-cleanup", "--in", store, "--dr", "dr1", "--type", "rows",
        "--date", "2024-05-01T00:00:00Z", "--out", marked,
    ]) == 0
    flags = {
        r["rowKey"]: r["deleted"] for r in spark.read.parquet(marked).collect()
    }
    assert flags["r1"] != "" and flags["r2"] == "" and flags["r3"] == ""

    cleaned = str(tmp_path / "cleaned")
    dellog = str(tmp_path / "dellog")
    assert main([
        "resource-cleanup", "--in", marked, "--dr", "dr1", "--type", "delete",
        "--date", "2025-01-01T00:00:00Z", "--out", cleaned, "--log", dellog,
    ]) == 0
    assert {r["rowKey"] for r in spark.read.parquet(cleaned).collect()} == {
        "r2", "r3"
    }
    assert [r["deleted_key"] for r in spark.read.parquet(dellog).collect()] == ["r1"]

    mapping = str(tmp_path / "mapping")
    assert main([
        "remap-unique-key", "--in", store, "--drs", "dr1",
        "--fields", "catalogNumber", "--out", mapping,
    ]) == 0
    rows = {
        r["uniqueID"]: r["rowKey"] for r in spark.read.parquet(mapping).collect()
    }
    assert rows == {"dr1|AB1": "r1", "dr1|CD2": "r2"}


def test_cli_classifier_lifecycle(spark, tmp_path, capsys):
    """train-classifier -> classify: the model-based filtering
    lifecycle through a persisted model (n_hex travels in meta/)."""
    train_store = str(tmp_path / "train")
    test_store = str(tmp_path / "test")
    model_path = str(tmp_path / "nbmodel")
    spark.createDataFrame(
        [
            (1, "apple banana cherry apple", "fruit"),
            (2, "banana cherry date banana", "fruit"),
            (3, "carrot potato onion carrot", "veg"),
            (4, "potato onion leek potato", "veg"),
        ],
        "doc_id long, text string, label string",
    ).write.parquet(train_store)
    spark.createDataFrame(
        [(10, "apple cherry"), (11, "potato onion")],
        "doc_id long, text string",
    ).write.parquet(test_store)

    capsys.readouterr()
    assert main([
        "train-classifier", "--in", train_store,
        "--n-hex", "2", "--out", model_path,
    ]) == 0
    printed = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {r["label"] for r in printed} == {"fruit", "veg"}
    meta = spark.read.parquet(model_path + "/meta").collect()[0]
    assert meta["n_hex"] == 2

    assert main([
        "classify", "--in", test_store, "--model", model_path,
    ]) == 0
    out = {
        r["doc_id"]: r["label"]
        for r in map(json.loads, capsys.readouterr().out.strip().splitlines())
    }
    assert out == {10: "fruit", 11: "veg"}

    # gate mode: keep only one label, write parquet
    kept_path = str(tmp_path / "kept")
    assert main([
        "classify", "--in", test_store, "--model", model_path,
        "--keep-label", "veg", "--out", kept_path,
    ]) == 0
    kept = spark.read.parquet(kept_path)
    assert [r["doc_id"] for r in kept.collect()] == [11]


def test_cli_dsir_select(spark, tmp_path, capsys):
    """dsir-select: threshold regime end-to-end; exactly one selection
    flag is required."""
    raw_store = str(tmp_path / "raw")
    target_store = str(tmp_path / "target")
    out_path = str(tmp_path / "selected")
    spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "zzz qqq vvv www")],
        "doc_id long, text string",
    ).write.parquet(raw_store)
    spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    ).write.parquet(target_store)

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # neither flag: argparse rejects
        main(["dsir-select", "--in", raw_store, "--target", target_store])
    with _pytest.raises(SystemExit):  # both flags: mutually exclusive
        main([
            "dsir-select", "--in", raw_store, "--target", target_store,
            "--threshold", "1.0", "--top-fraction", "0.5",
        ])

    capsys.readouterr()
    assert main([
        "dsir-select", "--in", raw_store, "--target", target_store,
        "--threshold", "1.0", "--out", out_path,
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["scored"] == 2
    kept = spark.read.parquet(out_path)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_cli_dsir_and_classify_stream_ticks(spark, tmp_path, capsys):
    """dsir-stats -> stream-dsir and train-classifier -> stream-classify:
    the incremental curation loop end-to-end through the CLI."""
    target_store = str(tmp_path / "target")
    seed_store = str(tmp_path / "seed")
    spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    ).write.parquet(target_store)
    spark.createDataFrame(
        [(1, "the quick brown fox runs", "fruit"),
         (2, "zzz qqq vvv www", "veg")],
        "doc_id long, text string, label string",
    ).write.parquet(seed_store)

    stats = str(tmp_path / "stats")
    assert main([
        "dsir-stats", "--in", seed_store, "--target", target_store,
        "--out", stats,
    ]) == 0
    assert spark.read.parquet(stats + "/cp").count() > 0

    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "d.jsonl").write_text(json.dumps(
        {"doc_id": 10, "text": "the lazy dog jumps", "source": "s"}
    ))
    weights = str(tmp_path / "weights")
    assert main([
        "stream-dsir", "--staging", str(staging), "--stats", stats,
        "--weights", weights, "--checkpoint", str(tmp_path / "c1"),
        "--threshold", "0.5",
    ]) == 0
    rows = spark.read.parquet(weights).collect()
    assert [r["doc_id"] for r in rows] == [10]
    assert "selected" in rows[0].asDict()

    model = str(tmp_path / "nb")
    assert main([
        "train-classifier", "--in", seed_store, "--out", model,
    ]) == 0
    preds = str(tmp_path / "preds")
    assert main([
        "stream-classify", "--staging", str(staging), "--model", model,
        "--predictions", preds, "--checkpoint", str(tmp_path / "c2"),
        "--keep-label", "fruit",
    ]) == 0
    got = {r["doc_id"]: r["keep"] for r in spark.read.parquet(preds).collect()}
    # doc 10 shares 'the' with the fruit-labeled seed doc and nothing
    # with the veg-labeled one, so the argmax is 'fruit' -> kept
    assert got == {10: True}


def test_cli_build_corpus_gate_flags(spark, tmp_path, capsys):
    """build-corpus --nb-model/--nb-keep-label and --dsir-target/
    --dsir-threshold: the gate stages appear in the manifest, and a
    half-given pair exits 2 before any compute."""
    docs_store = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (i, f"alpha beta w{i} gamma delta epsilon", "en", "srcA", 30)
            for i in range(10)
        ]
        + [
            (100 + i, f"zzz qqq w{i} vvv www yyy", "de", "srcB", 24)
            for i in range(10)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(docs_store)

    model = str(tmp_path / "nb")
    assert main([
        "train-classifier", "--in", docs_store, "--label-col", "lang",
        "--out", model,
    ]) == 0

    assert main([
        "build-corpus", "--in", docs_store, "--out", str(tmp_path / "x"),
        "--nb-model", model,
    ]) == 2  # half-given pair rejected before any Spark job
    assert main([
        "build-corpus", "--in", docs_store, "--out", str(tmp_path / "x"),
        "--decontaminate-eval", docs_store,
    ]) == 2  # decontamination pair is validated the same way
    assert main([
        "build-corpus", "--in", docs_store, "--out", str(tmp_path / "x"),
        "--substring-dedup", "7",
    ]) == 2  # min_len below the anchor k-gram length refused up front

    capsys.readouterr()
    out = str(tmp_path / "corpus")
    assert main([
        "build-corpus", "--in", docs_store, "--out", out,
        "--quality-threshold", "0.0",
        "--nb-model", model, "--nb-keep-label", "en",
        "--dsir-target", docs_store, "--dsir-threshold", "0.5",
    ]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    stages = {json.loads(l)["stage"] for l in lines}
    assert {"1b_model_gate", "2b_dsir_gate"} <= stages
    # the en-gate drops the de-labeled half (disjoint vocab -> separable)
    kept = spark.read.parquet(out + "/documents")
    assert {r["lang"] for r in kept.collect()} == {"en"}


def test_cli_process_uuid_scope(spark, tmp_path):
    """process --uuids: scope the chain to a comma-separated uuid/rowKey
    list (the reference's process-uuids tool)."""
    raw_store = str(tmp_path / "raw")
    main([
        "load-dwca", "--archive", FIXTURE_DWCA, "--dr", "dr0",
        "--unique-terms", "occurrenceID", "--out", raw_store,
    ])
    uuids = [r["uuid"] for r in spark.read.parquet(raw_store).collect()]
    out = str(tmp_path / "processed")
    assert main([
        "process", "--in", raw_store, "--uuids", ",".join(uuids[:2]),
        "--out", out,
    ]) == 0
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert {r["uuid"] for r in got.collect()} == set(uuids[:2])


def test_cli_stream_outliers(spark, tmp_path):
    """stream-outliers: one availableNow tick detects outliers over the
    drained drops and writes the versioned store."""
    staging = tmp_path / "staging"
    staging.mkdir()
    rows = [{"occurrenceID": f"r{i}", "taxonConceptID": "t1",
             "cellID": f"c{i}", "el1": float(i + 1), "el2": 3.0}
            for i in range(25)]
    rows.append({"occurrenceID": "rX", "taxonConceptID": "t1",
                 "cellID": "cX", "el1": 400.0, "el2": 3.0})
    (staging / "d1.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    assert main([
        "stream-outliers", "--staging", str(staging),
        "--store", str(tmp_path / "store"),
        "--outliers", str(tmp_path / "outliers"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--cell-col", "cellID",
    ]) == 0
    got = spark.read.parquet(str(tmp_path / "outliers" / "v=0"))
    flagged = {r["row_key"] for r in got.filter("is_outlier").collect()}
    assert flagged == {"rX"}


def test_cli_mark_outliers(spark, tmp_path):
    """mark-outliers: processed store + outlier rollup + reverts ->
    assertions updated in place."""
    from biocache_store_spark.processors.chain import process_records

    raw = spark.createDataFrame(
        [("rX", "dr1", "PreservedSpecimen"), ("rGone", "dr1", "HumanObservation")],
        ["occurrenceID", "dataResourceUid", "basisOfRecord"],
    )
    store = str(tmp_path / "processed")
    process_records(raw).write.parquet(store)
    rollup = str(tmp_path / "rollup")
    spark.createDataFrame(
        [("rX", ["el1"], 1)],
        "row_key string, outlier_for_layers array<string>,"
        " outlier_for_layers_count int",
    ).write.parquet(rollup)
    reverts = str(tmp_path / "reverts")
    spark.createDataFrame([("rGone",)], "row_key string").write.parquet(reverts)
    out = str(tmp_path / "marked")
    assert main([
        "mark-outliers", "--in", store, "--outliers", rollup,
        "--reverts", reverts, "--out", out,
    ]) == 0
    rows = {r["occurrenceID"]: r for r in spark.read.parquet(out).collect()}
    ox = [a for a in rows["rX"]["assertions"] if a["name"] == "detectedOutlier"]
    assert len(ox) == 1 and ox[0]["qa_status"] == 0
    og = [a for a in rows["rGone"]["assertions"] if a["name"] == "detectedOutlier"]
    assert len(og) == 1 and og[0]["qa_status"] == 1


def test_cli_mark_duplicates(spark, tmp_path):
    """mark-duplicates: processed store + dedup-detect output + reverts
    -> duplication columns and assertions applied."""
    from biocache_store_spark.processors.chain import process_records

    raw = spark.createDataFrame(
        [(k, "dr1", "PreservedSpecimen") for k in ("o1", "o2", "o9")],
        ["occurrenceID", "dataResourceUid", "basisOfRecord"],
    )
    store = str(tmp_path / "processed")
    process_records(raw).write.parquet(store)
    dups = str(tmp_path / "dups")
    spark.createDataFrame(
        [("t1", "2000", "01", "05", "o1", "R", None, [], 4),
         ("t1", "2000", "01", "05", "o2", "D1", "o1", [4], 0)],
        "taxon string, year string, month string, day string,"
        " row_key string, status string, duplicate_of string,"
        " dup_types array<int>, precision int",
    ).write.parquet(dups)
    reverts = str(tmp_path / "reverts")
    spark.createDataFrame([("o9",)], "row_key string").write.parquet(reverts)
    out = str(tmp_path / "marked")
    assert main([
        "mark-duplicates", "--in", store, "--dups", dups,
        "--reverts", reverts, "--out", out,
    ]) == 0
    rows = {r["occurrenceID"]: r for r in spark.read.parquet(out).collect()}
    assert rows["o1"]["duplicationStatus_p"] == "R"
    assert rows["o2"]["duplicationStatus_p"] == "D"
    assert rows["o2"]["duplicationType_p"] == "4"
    assert rows["o9"]["duplicationStatus_p"] is None
    # --out == --in refused
    assert main([
        "mark-duplicates", "--in", store, "--dups", dups, "--out", store,
    ]) == 2


def test_cli_expert_outlier_lifecycle(spark, tmp_path):
    """expert-outlier-detect full -> incremental --since/--prev merge
    (+ revert + rollup outputs) -> mark-expert-outliers write-back:
    the CLI composition of ExpertDistributionOutlierTool's run loop."""
    wkt = "POLYGON((140 -40, 150 -40, 150 -30, 140 -30, 140 -40))"
    dists = str(tmp_path / "dists")
    spark.createDataFrame(
        [("lsid:a", wkt), ("lsid:b", wkt)], "taxonConceptID string, wkt string"
    ).write.parquet(dists)
    schema = (
        "occurrenceID string, taxonConceptID string, decimalLatitude double,"
        " decimalLongitude double, coordinateUncertaintyInMeters double,"
        " lastModifiedTime string"
    )
    t0_rows = [
        ("a1", "lsid:a", -35.0, 139.0, None, "2026-01-01"),  # outlier
        ("a2", "lsid:a", -35.0, 145.0, None, "2026-01-01"),
        ("b1", "lsid:b", -35.0, 138.0, None, "2026-01-01"),  # untouched outlier
    ]
    # a1 re-delivered inside the range; new outlier a3 arrives
    t1_rows = [
        ("a1", "lsid:a", -35.0, 145.5, None, "2026-02-01"),
        ("a2", "lsid:a", -35.0, 145.0, None, "2026-01-01"),
        ("a3", "lsid:a", -35.0, 137.0, None, "2026-02-01"),
        ("b1", "lsid:b", -35.0, 138.0, None, "2026-01-01"),
    ]
    t0_store = str(tmp_path / "occ_t0")
    t1_store = str(tmp_path / "occ_t1")
    spark.createDataFrame(t0_rows, schema).write.parquet(t0_store)
    spark.createDataFrame(t1_rows, schema).write.parquet(t1_store)

    prev_out = str(tmp_path / "expert_prev")
    assert main([
        "expert-outlier-detect", "--in", t0_store,
        "--distributions", dists, "--out", prev_out,
    ]) == 0
    assert {
        r["row_key"]
        for r in spark.read.parquet(prev_out).filter("is_outlier").collect()
    } == {"a1", "b1"}

    inc_out = str(tmp_path / "expert_inc")
    reverts = str(tmp_path / "expert_reverts")
    rollup = str(tmp_path / "expert_rollup")
    assert main([
        "expert-outlier-detect", "--in", t1_store,
        "--distributions", dists, "--out", inc_out,
        "--since", "2026-01-15", "--prev", prev_out,
        "--revert-out", reverts, "--rollup-out", rollup,
    ]) == 0
    merged = spark.read.parquet(inc_out)
    assert {
        r["row_key"] for r in merged.filter("is_outlier").collect()
    } == {"a3", "b1"}
    assert {r["row_key"] for r in spark.read.parquet(reverts).collect()} == {
        "a1"
    }
    roll = {r["taxon"]: r for r in spark.read.parquet(rollup).collect()}
    assert roll["lsid:a"]["outlier_row_keys"] == ["a3"]
    assert roll["lsid:b"]["outlier_row_keys"] == ["b1"]

    # write-back: a3 marked failed + km column; a1 (still tested, now
    # inside the range) ends PASSED with the column cleared — the
    # reference removes the old entry then QaPasser marks it passed;
    # a2 passed
    from biocache_store_spark.processors.chain import process_records

    raw = spark.createDataFrame(
        [(k, "dr1", "PreservedSpecimen") for k in ("a1", "a2", "a3", "b1")],
        ["occurrenceID", "dataResourceUid", "basisOfRecord"],
    )
    store = str(tmp_path / "processed")
    process_records(raw).write.parquet(store)
    marked = str(tmp_path / "marked")
    assert main([
        "mark-expert-outliers", "--in", store, "--outliers", inc_out,
        "--reverts", reverts, "--out", marked,
    ]) == 0
    rows = {r["occurrenceID"]: r for r in spark.read.parquet(marked).collect()}
    ent = lambda r: [  # noqa: E731
        a for a in (r["assertions"] or [])
        if a["name"] == "speciesOutsideExpertRange"
    ]
    (a3,) = ent(rows["a3"])
    assert a3["qa_status"] == 0 and a3["comment"].endswith(
        "metres outside of expert distribution range"
    )
    assert rows["a3"]["distanceOutsideExpertRange_p"] is not None
    (a1,) = ent(rows["a1"])
    assert a1["qa_status"] == 1  # removal then QaPasser -> passed entry
    assert rows["a1"]["distanceOutsideExpertRange_p"] is None
    (a2,) = ent(rows["a2"])
    assert a2["qa_status"] == 1  # tested, passed
    # in-place --out refused
    assert main([
        "expert-outlier-detect", "--in", t1_store,
        "--distributions", dists, "--out", t1_store,
    ]) == 2


def test_cli_index_query_reprocess_scope(spark, tmp_path):
    """`index-query` (ReprocessIndexSelect parity,
    tool/ReprocessIndexSelect.scala:20-63): query the index for a scope,
    reprocess ONLY those records from the (edited) raw store, reindex
    only those index rows — then `--exist` reuses the saved scope and
    `--index-only` skips the reprocess."""
    raw1 = str(tmp_path / "raw1")
    raw2 = str(tmp_path / "raw2")
    processed0 = str(tmp_path / "processed0")
    index0 = str(tmp_path / "index0")
    scope = str(tmp_path / "scope")
    processed1 = str(tmp_path / "processed1")
    index1 = str(tmp_path / "index1")

    rows = [
        ("a1", "2001", "PreservedSpecimen"),
        ("a2", "2001", "PreservedSpecimen"),
        ("b1", "2000", "PreservedSpecimen"),
        ("b2", "2000", "PreservedSpecimen"),
    ]
    csv = tmp_path / "occ.csv"
    csv.write_text(
        "occurrenceID,year,basisOfRecord\n"
        + "\n".join(",".join(r) for r in rows)
        + "\n"
    )
    assert main([
        "load-csv", "--path", str(csv), "--dr", "dr1",
        "--unique-terms", "occurrenceID", "--out", raw1,
    ]) == 0
    assert main(["process", "--in", raw1, "--out", processed0]) == 0
    assert main(["index", "--in", processed0, "--out", index0]) == 0

    # edit the raw store: flip basisOfRecord on one IN-scope (a1) and one
    # OUT-of-scope (b1) record — only a1's edit may land
    raw = spark.read.parquet(raw1)
    from pyspark.sql import functions as F
    edited = raw.withColumn(
        "basisOfRecord",
        F.when(F.col("occurrenceID").isin("a1", "b1"), "HumanObservation")
        .otherwise(F.col("basisOfRecord")),
    )
    edited.write.mode("overwrite").parquet(raw2)

    assert main([
        "index-query", "--index", index0, "-q", "year:2001",
        "--scope", scope, "--raw", raw2, "--prev-processed", processed0,
        "--out", processed1, "--index-out", index1,
    ]) == 0

    idx1 = {r["occurrence_id"]: r for r in spark.read.parquet(index1).collect()}
    assert len(idx1) == 4
    assert idx1["a1"]["basis_of_record"] == "HumanObservation"  # reindexed
    assert idx1["a2"]["basis_of_record"] == "PreservedSpecimen"
    assert idx1["b1"]["basis_of_record"] == "PreservedSpecimen"  # untouched
    p1 = {r["occurrenceID"]: r for r in spark.read.parquet(processed1).collect()}
    assert len(p1) == 4
    assert p1["a1"]["processed"]["basisOfRecord"] == "HumanObservation"
    assert p1["b1"]["processed"]["basisOfRecord"] == "PreservedSpecimen"

    # scope file persisted: 2 keys
    assert spark.read.parquet(scope).count() == 2

    # --exist + --index-only: reuse the scope, reindex straight from the
    # merged processed store, no raw needed
    index2 = str(tmp_path / "index2")
    assert main([
        "index-query", "--index", index1, "--exist", "--scope", scope,
        "--prev-processed", processed1, "--index-out", index2,
        "--index-only",
    ]) == 0
    idx2 = {r["occurrence_id"]: r for r in spark.read.parquet(index2).collect()}
    assert len(idx2) == 4
    assert idx2["a1"]["basis_of_record"] == "HumanObservation"

    # guardrails: --query missing without --exist; in-place --index-out
    assert main([
        "index-query", "--index", index1, "--scope", scope,
        "--prev-processed", processed1, "--index-out", index2,
        "--index-only",
    ]) == 2
    assert main([
        "index-query", "--index", index1, "--exist", "--scope", scope,
        "--prev-processed", processed1, "--index-out", index1,
        "--index-only",
    ]) == 2
    # --exist + --query are mutually exclusive (the reference's flags):
    # silently preferring the saved scope would reprocess the wrong keys
    assert main([
        "index-query", "--index", index1, "--exist", "-q", "year:2001",
        "--scope", scope, "--prev-processed", processed1,
        "--index-out", str(tmp_path / "index3"), "--index-only",
    ]) == 2
