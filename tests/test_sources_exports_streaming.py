"""Loaders (CSV + DwC-A), exporters, and the streaming surface."""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

FIXTURE_DWCA = os.path.join(os.path.dirname(__file__), "fixtures", "test-dwca")


def test_dwc_term_matching():
    from biocache_store_spark.sources.dwc_terms import match_term

    assert match_term("Decimal Latitude") == "decimalLatitude"
    assert match_term("decimal_latitude") == "decimalLatitude"
    assert match_term("http://rs.tdwg.org/dwc/terms/decimalLatitude") == "decimalLatitude"
    assert match_term("lat") == "decimalLatitude"
    assert match_term("class") == "classs"  # reference's classs remap
    assert match_term("no such header") is None


def test_csv_loader(spark, tmp_path):
    from biocache_store_spark.sources.csv_loader import load_csv, mint_uuid

    p = tmp_path / "in.csv"
    p.write_text(
        "Occurrence ID,Scientific Name,LAT,Long,Event Date\n"
        "o1,Macropus rufus,-35.2,144.8,1981-10-17\n"
        "o2,Emu,-30.0,150.0,2001-01-01\n"
    )
    df = load_csv(spark, str(p), "dr1", ["occurrenceID"])
    rows = {r["occurrenceID"]: r for r in df.collect()}
    assert set(rows) == {"o1", "o2"}
    assert rows["o1"]["scientificName"] == "Macropus rufus"
    assert rows["o1"]["decimalLatitude"] == "-35.2"
    assert rows["o1"]["rowKey"] == "dr1|o1"
    # JVM-side uuid column == python uuid5 reference implementation
    assert rows["o1"]["uuid"] == mint_uuid("dr1|o1")
    assert rows["o2"]["uuid"] == mint_uuid("dr1|o2")


def test_resolve_multimedia_locations(spark, tmp_path):
    """DwCALoaderTest 'locate multimedia 1-3' mirror: absolute identifiers
    (any scheme, query strings intact) pass through, bare filenames
    resolve to file:// under the archive dir, NULL identifiers stay
    NULL."""
    import os

    from biocache_store_spark.sources.dwca import (
        resolve_multimedia_locations,
    )

    df = spark.createDataFrame(
        [(
            "o1",
            [
                {"identifier": "672737.jpg"},
                {"identifier": "http://localhost/no.where/nothing.png"},
                {"identifier": "http://localhost/nowhere/something.gif?format=gif"},
                {"identifier": None},
            ],
        )],
        "occurrenceID string, multimedia array<struct<identifier string>>",
    )
    arch = str(tmp_path / "arch")
    out = resolve_multimedia_locations(df, arch).collect()[0]["multimedia"]
    base = "file://" + os.path.abspath(arch) + "/"
    assert out[0]["location"] == base + "672737.jpg"
    assert out[1]["location"] == "http://localhost/no.where/nothing.png"
    assert (
        out[2]["location"]
        == "http://localhost/nowhere/something.gif?format=gif"
    )
    assert out[3]["location"] is None


def test_import_table_migration_loader(spark, tmp_path):
    """import_table (tool/ImportUtil.scala): headerless tab-separated
    file + explicit positional column list, the reference's '|' quote
    and '$' escape, id column copied to rowKey; bad argument shapes
    raise before any read."""
    import pytest as _pytest

    from biocache_store_spark.sources.csv_loader import import_table

    p = tmp_path / "migrate.tsv"
    p.write_text(
        "k1\t|Macropus rufus|\t-35.2\n"
        "k2\tEmu\t-30.0\n"
    )
    df = import_table(
        spark, str(p), ["uuid", "scientificName", "decimalLatitude"]
    )
    rows = {r["rowKey"]: r for r in df.collect()}
    assert set(rows) == {"k1", "k2"}
    assert rows["k1"]["scientificName"] == "Macropus rufus"  # quote stripped
    assert rows["k2"]["uuid"] == "k2" and rows["k2"]["rowKey"] == "k2"
    with _pytest.raises(ValueError, match="column list"):
        import_table(spark, str(p), [])
    with _pytest.raises(ValueError, match="id_column_idx"):
        import_table(spark, str(p), ["a", "b"], id_column_idx=5)


def test_dwca_loader(spark):
    from biocache_store_spark.sources.dwca import load_archive, parse_meta

    desc = parse_meta(FIXTURE_DWCA)
    assert desc.core.delimiter == "\t"
    assert desc.core.fields[2] == "scientificName"
    assert len(desc.extensions) == 1

    df = load_archive(spark, FIXTURE_DWCA, "dr0", ["occurrenceID"])
    rows = {r["occurrenceID"]: r for r in df.collect()}
    assert set(rows) == {"urn:occ:1", "urn:occ:2", "urn:occ:3"}
    r1 = rows["urn:occ:1"]
    assert r1["scientificName"] == "Macropus rufus"
    assert r1["classs"] == "Mammalia"
    assert r1["rowKey"] == "dr0|urn:occ:1"
    media = sorted(m["identifier"] for m in r1["multimedia"])
    assert media == ["http://images.example/1.jpg", "http://images.example/2.jpg"]
    assert rows["urn:occ:2"]["multimedia"] is None


def test_dwca_end_to_end_process_and_index(spark):
    """Golden slice: DwC-A -> process -> index -> facet (SURVEY §7 minimum
    slice)."""
    import datetime as dt

    from biocache_store_spark.operators.index_projection import build_index, facet_counts
    from biocache_store_spark.processors.chain import process_records
    from biocache_store_spark.sources.dwca import load_archive

    raw = load_archive(spark, FIXTURE_DWCA, "dr0", ["occurrenceID"])
    processed = process_records(raw, today=dt.date(2026, 8, 13))
    index = build_index(processed)
    rows = {r["id"]: r for r in index.collect()}
    assert rows["urn:occ:1"]["occurrence_year"] == 1981
    assert str(rows["urn:occ:2"]["occurrence_date"]) == "1981-10-17"  # day-first parsed, DATE-typed
    assert rows["urn:occ:2"]["basis_of_record"] == "HumanObservation"
    assert rows["urn:occ:3"]["basis_of_record"] == "PreservedSpecimen"  # "S"
    kosher = index.filter(F.col("geospatial_kosher"))
    facets = {
        r["facet_value"]: r["facet_count"]
        for r in facet_counts(kosher, "basis_of_record").collect()
    }
    assert facets == {"PreservedSpecimen": 2, "HumanObservation": 1}


def test_exports(spark, tmp_path):
    from biocache_store_spark.exports.exporters import (
        create_dwca,
        export_by_facet,
        export_csv,
        export_facet,
        stream_records,
    )

    df = spark.createDataFrame(
        [("o1", "Victoria", "A"), ("o2", "Victoria", "B"), ("o3", "Tasmania", "C")],
        "occurrenceID string, stateProvince string, scientificName string",
    )
    out1 = str(tmp_path / "csv")
    export_csv(df, ["occurrenceID", "scientificName"], out1)
    back = spark.read.option("header", True).csv(out1)
    assert back.count() == 3 and back.columns == ["occurrenceID", "scientificName"]

    out2 = str(tmp_path / "facet")
    export_facet(df, "stateProvince", out2)
    facets = {
        r["stateProvince"]: int(r["count"])
        for r in spark.read.option("header", True).csv(out2).collect()
    }
    assert facets == {"Victoria": 2, "Tasmania": 1}

    out3 = str(tmp_path / "byfacet")
    export_by_facet(df, "stateProvince", ["occurrenceID"], out3)
    assert os.path.isdir(os.path.join(out3, "stateProvince=Victoria"))

    streamed = list(stream_records(df, ["occurrenceID"]))
    assert sorted(v[0] for v in streamed) == ["o1", "o2", "o3"]

    zip_path = str(tmp_path / "archive.zip")
    create_dwca(df, ["occurrenceID", "stateProvince", "scientificName"], zip_path)
    with zipfile.ZipFile(zip_path) as zf:
        assert set(zf.namelist()) == {"meta.xml", "eml.xml", "occurrence.csv"}
        body = zf.read("occurrence.csv").decode()
        assert "Victoria" in body and body.startswith("id,occurrenceID")
    # round-trip: the archive we write is readable by our own DwC-A loader
    import shutil

    extract_dir = str(tmp_path / "extracted")
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(extract_dir)
    from biocache_store_spark.sources.dwca import load_archive

    back_df = load_archive(spark, extract_dir, "dr9", ["occurrenceID"])
    assert back_df.count() == 3
    shutil.rmtree(extract_dir)


def test_create_dwca_multimedia_extension(spark, tmp_path):
    """create_dwca with `multimedia` emits the reference's Multimedia
    extension layout (export/DwCACreator.scala:407-494): image.csv keyed
    by the core id, the extension block in meta.xml, absent descriptor
    columns written empty — and our own loader star-joins the extension
    rows back onto their core records."""
    import shutil

    from biocache_store_spark.exports.exporters import create_dwca
    from biocache_store_spark.sources.dwca import load_archive

    df = spark.createDataFrame(
        [("o1", "Aus bus"), ("o2", "Cus dus")],
        "occurrenceID string, scientificName string",
    )
    media = spark.createDataFrame(
        [
            ("o1", "http://img/1.jpg", "image/jpeg", "CC-BY"),
            ("o1", "http://img/2.png", "image/png", "CC0"),
        ],
        "occurrenceID string, identifier string, format string, license string",
    )
    zip_path = str(tmp_path / "mm.zip")
    create_dwca(
        df,
        ["occurrenceID", "scientificName"],
        zip_path,
        multimedia=media,
        core_id_col="occurrenceID",
    )
    with zipfile.ZipFile(zip_path) as zf:
        assert set(zf.namelist()) == {
            "meta.xml", "eml.xml", "occurrence.csv", "image.csv"
        }
        meta = zf.read("meta.xml").decode()
        assert "http://rs.gbif.org/terms/1.0/Multimedia" in meta
        assert "<location>image.csv</location>" in meta
        assert '<coreid index="0"/>' in meta
        assert "http://purl.org/dc/terms/identifier" in meta
        # core id column carries the record id, not a row index
        occ = zf.read("occurrence.csv").decode()
        assert occ.splitlines()[1].startswith("o1,o1,")
        img = zf.read("image.csv").decode().splitlines()
        assert img[0] == (
            "id,identifier,creator,created,title,format,license,rights,"
            "rightsHolder,references"
        )
        # absent descriptors (creator/created/title/...) written empty
        assert "o1,http://img/1.jpg,,,,image/jpeg,CC-BY,,," in img

    extract_dir = str(tmp_path / "mm_extracted")
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(extract_dir)
    back = load_archive(spark, extract_dir, "dr-mm", ["occurrenceID"])
    rows = {r["occurrenceID"]: r for r in back.collect()}
    got_media = {m["identifier"] for m in rows["o1"]["multimedia"]}
    assert got_media == {"http://img/1.jpg", "http://img/2.png"}
    assert rows["o2"]["multimedia"] is None  # media-less record: left join
    shutil.rmtree(extract_dir)

    # multimedia without a core id is an error, not a broken archive
    import pytest as _pytest

    with _pytest.raises(ValueError, match="core_id_col"):
        create_dwca(
            df, ["occurrenceID"], str(tmp_path / "bad.zip"), multimedia=media
        )


def test_media_store_to_dwca_multimedia(spark, tmp_path):
    """Media store -> multimedia_descriptor_rows -> create_dwca: the
    addImageExportsToArchives analog (DwCACreator.scala:483-494) —
    stored media ride into image.csv as identifier/format rows, failed
    fetches excluded."""
    from biocache_store_spark.exports.exporters import create_dwca
    from biocache_store_spark.operators.multimodal import (
        multimedia_descriptor_rows,
    )

    store = spark.createDataFrame(
        [
            ("o1", "http://img/a.jpg", b"x", "image/jpeg", True, "m1"),
            ("o1", "http://img/broken.jpg", None, None, False, None),
            ("o2", "http://snd/b.mp3", b"y", "audio/mpeg", True, "m2"),
        ],
        "record_id string, url string, content binary, mime_type string, "
        "fetch_ok boolean, media_id string",
    )
    rows = {
        (r["record_id"], r["identifier"], r["format"])
        for r in multimedia_descriptor_rows(store).collect()
    }
    assert rows == {
        ("o1", "http://img/a.jpg", "image/jpeg"),
        ("o2", "http://snd/b.mp3", "audio/mpeg"),
    }
    df = spark.createDataFrame(
        [("o1", "Aus bus"), ("o2", "Cus dus")],
        "occurrenceID string, scientificName string",
    )
    zip_path = str(tmp_path / "store_mm.zip")
    create_dwca(
        df,
        ["occurrenceID", "scientificName"],
        zip_path,
        multimedia=multimedia_descriptor_rows(store).withColumnRenamed(
            "record_id", "occurrenceID"
        ),
        core_id_col="occurrenceID",
    )
    img = zipfile.ZipFile(zip_path).read("image.csv").decode()
    assert "o1,http://img/a.jpg,,,,image/jpeg,,,," in img
    assert "broken" not in img


def test_streaming_incremental(spark, tmp_path):
    from biocache_store_spark.streaming.incremental import process_staging_stream

    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "batch1.csv").write_text(
        "occurrenceID,dataResourceUid,basisOfRecord,eventDate,year,month,day,"
        "decimalLatitude,decimalLongitude,geodeticDatum,country,stateProvince,"
        "scientificName,recordedBy\n"
        "s1,dr1,PreservedSpecimen,2001-05-05,,,,-35.2,144.8,WGS84,Australia,,Xus yus,Smith J\n"
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = process_staging_stream(spark, str(staging), out, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    assert first.count() == 1
    assert first.collect()[0]["processed"]["eventDate"] == "2001-05-05"

    # drop a second file: only the new file is processed on the next run
    (staging / "batch2.csv").write_text(
        "occurrenceID,dataResourceUid,basisOfRecord,eventDate,year,month,day,"
        "decimalLatitude,decimalLongitude,geodeticDatum,country,stateProvince,"
        "scientificName,recordedBy\n"
        "s2,dr1,HumanObservation,2002-06-06,,,,-30.0,150.0,WGS84,Australia,,Aus bus,Doe K\n"
    )
    q2 = process_staging_stream(spark, str(staging), out, ckpt)
    q2.awaitTermination(120)
    ids = sorted(
        r["occurrenceID"] for r in spark.read.parquet(out).select("occurrenceID").collect()
    )
    assert ids == ["s1", "s2"]


def test_streaming_windowed_counts(spark):
    import datetime as dt

    from biocache_store_spark.streaming.incremental import windowed_event_counts

    rows = [
        (dt.datetime(2024, 1, 1, 0, 10), "click", 1.0),
        (dt.datetime(2024, 1, 1, 0, 50), "click", 2.0),
        (dt.datetime(2024, 1, 1, 1, 10), "view", 3.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {
        (r["win"]["start"].hour, r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_counts(df).collect()
    }
    assert out[(0, "click")] == (2, 3.0)
    assert out[(1, "view")] == (1, 3.0)


def test_auto_csv_loader(spark, tmp_path):
    # AutoDwcCSVLoader: *dwc*.csv* data + dwc-id currency files
    from biocache_store_spark.sources.auto_csv import (
        discover_files,
        load_auto,
        stale_records,
    )

    d = tmp_path / "auto"
    d.mkdir()
    (d / "dwc-data-1.csv").write_text(
        "occurrenceID,scientificName,decimalLatitude\n"
        "occ1,Osphranter rufus,-35.2\nocc2,Dromaius novaehollandiae,-30.1\n"
    )
    (d / "dwc-data-2.csv").write_text(
        "occurrenceID,scientificName\nocc3,Thalia depressa\n"
    )
    (d / "dwc-id-1.csv").write_text("occurrenceID\nocc1\nocc3\n")
    (d / "notes.txt").write_text("ignored")
    (d / "other.csv").write_text("a,b\n1,2\n")  # no 'dwc' in name -> ignored

    data_files, id_files = discover_files(str(d))
    assert len(data_files) == 2 and len(id_files) == 1

    records, current = load_auto(spark, str(d), "dr1", ["occurrenceID"])
    assert records.count() == 3
    assert current.count() == 2
    # occ2 is in the store but absent from the id files -> stale
    stale = stale_records(records, current)
    assert [r["occurrenceID"] for r in stale.collect()] == ["occ2"]


def test_export_all_spatial_species(spark, tmp_path):
    # ExportAllSpatialSpecies: per-species sorted TSV dumps
    import glob

    from biocache_store_spark.exports.exporters import export_all_spatial_species

    index = spark.createDataFrame(
        [
            ("r1", "sp1", None, "-35.2,144.8", "-35.2", "144.8"),
            ("r2", "sp1", "ssp1", "-35.3,144.9", "-35.3", "144.9"),
            ("r3", "sp2", None, "-30.0,150.0", "-30.0", "150.0"),
            ("r4", "sp2", None, None, None, None),  # not georeferenced
        ],
        "id string, species_guid string, subspecies_guid string, "
        "lat_long string, latitude string, longitude string",
    )
    out = tmp_path / "spatial"
    export_all_spatial_species(index, str(out))
    species_rows = []
    for f in glob.glob(str(out / "species" / "*.csv")):
        with open(f) as fh:
            lines = fh.read().strip().splitlines()
            assert lines[0].startswith("id\tspecies_guid")
            species_rows += [ln.split("\t")[0] for ln in lines[1:]]
    assert sorted(species_rows) == ["r1", "r2", "r3"]  # r4 filtered
    sub_rows = []
    for f in glob.glob(str(out / "subspecies" / "*.csv")):
        with open(f) as fh:
            lines = fh.read().strip().splitlines()
            sub_rows += [ln.split("\t")[0] for ln in lines[1:]]
    assert sub_rows == ["r2"]


def test_export_all_records_facet_filter(spark, tmp_path):
    """ExportAllRecordFacetFilter: optional filter + per-facet-value
    min-count gate (>= 2 georeferenced records, the reference's
    CountAwareFacetConsumer threshold) on top of the spatial dump."""
    import glob

    from biocache_store_spark.exports.exporters import (
        export_all_records_facet_filter,
    )

    index = spark.createDataFrame(
        [
            ("r1", "sp1", None, "-35.2,144.8", "2000"),
            ("r2", "sp1", "ssp1", "-35.3,144.9", "2000"),
            ("r3", "sp2", None, "-30.0,150.0", "2000"),  # single record
            ("r4", "sp3", None, None, "2000"),  # not georeferenced
            ("r5", "sp4", None, "-20.0,140.0", "1990"),  # filtered out
            ("r6", "sp4", None, "-20.1,140.1", "1990"),
            # the gate counts PRE-georeference (reference semantics):
            # sp5 has 2 records, only 1 with coordinates -> passes the
            # gate, dumps its 1 georeferenced row
            ("r7", "sp5", None, "-25.0,135.0", "2000"),
            ("r8", "sp5", None, None, "2000"),
            # rows tied on (facet, subspecies): the row key must break
            # the tie (reference sort=<facet>,<sub>,row_key — ADVICE r9)
            ("z2", "sp6", None, "-10.2,130.2", "2000"),
            ("z1", "sp6", None, "-10.1,130.1", "2000"),
        ],
        "id string, species_guid string, subspecies_guid string, "
        "lat_long string, year string",
    )
    out = tmp_path / "facet_dump"
    export_all_records_facet_filter(
        index, str(out), filter_expr="year = '2000'",
        fields=["id", "species_guid", "subspecies_guid", "lat_long"],
    )
    species_rows = []
    sp6_order = []
    for f in glob.glob(str(out / "species" / "*.csv")):
        with open(f) as fh:
            lines = fh.read().strip().splitlines()
            for ln in lines[1:]:
                cells = ln.split("\t")
                species_rows.append(cells[0])
                if cells[1] == "sp6":
                    sp6_order.append(cells[0])
    # sp2 (count 1) gated out, sp3 not georeferenced, sp4 filtered,
    # sp5 passes the pre-georeference gate with its one located row
    assert sorted(species_rows) == ["r1", "r2", "r7", "z1", "z2"]
    # within-shard determinism: rows tied on (facet, subspecies) come out
    # row-key sorted, not input-order (input had z2 before z1)
    assert sp6_order == ["z1", "z2"]
    sub_rows = []
    for f in glob.glob(str(out / "subspecies" / "*.csv")):
        with open(f) as fh:
            lines = fh.read().strip().splitlines()
            sub_rows += [ln.split("\t")[0] for ln in lines[1:]]
    assert sub_rows == ["r2"]

    # a custom fields list WITHOUT the subspecies column must skip the
    # subspecies sort key and side file (not reference a dropped column)
    out2 = tmp_path / "facet_dump_nosub"
    export_all_records_facet_filter(
        index, str(out2), filter_expr="year = '2000'",
        fields=["id", "species_guid", "lat_long"],
    )
    rows2 = []
    for f in glob.glob(str(out2 / "species" / "*.csv")):
        with open(f) as fh:
            rows2 += [ln.split("\t")[0] for ln in fh.read().strip().splitlines()[1:]]
    assert sorted(rows2) == ["r1", "r2", "r7", "z1", "z2"]
    assert not glob.glob(str(out2 / "subspecies" / "*.csv"))


def test_export_avro_or_fallback(spark, tmp_path):
    from biocache_store_spark.exports.exporters import export_avro

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    path = str(tmp_path / "avro_out")
    wrote_avro = export_avro(df, path)
    if wrote_avro:
        back = spark.read.format("avro").load(path)
    else:
        back = spark.read.parquet(path)
    assert back.count() == 2


def test_map_loader(spark):
    # MapDataLoader.scala:23-38 — property maps keyed by arbitrary headers,
    # canonicalised to DwC terms, identity minted from unique terms
    from biocache_store_spark.sources.map_loader import load_map_records

    values = [
        {"occurrence id": "o1", "latitude": "-35.2", "scientific name": "Aus bus"},
        {"occurrenceID": "o2", "decimalLatitude": "-30.0"},
    ]
    df = load_map_records(spark, values, "dr9", ["occurrenceID"])
    rows = {r["occurrenceID"]: r for r in df.collect()}
    assert set(rows) == {"o1", "o2"}
    assert rows["o1"]["decimalLatitude"] == "-35.2"
    assert rows["o1"]["scientificName"] == "Aus bus"
    assert rows["o1"]["rowKey"] == "dr9|o1"
    assert rows["o1"]["uuid"] != rows["o2"]["uuid"]
    # deterministic uuid5: reload mints identical uuids
    again = load_map_records(spark, values, "dr9", ["occurrenceID"])
    assert {r["uuid"] for r in again.collect()} == {r["uuid"] for r in df.collect()}


def test_export_local_node(spark, tmp_path):
    # ExportLocalNode.scala:32-105 — sorted runs + el/cl map resolution
    import glob

    from biocache_store_spark.exports.exporters import export_local_node

    df = spark.createDataFrame(
        [
            ("k2", "B", {"el882": "1.5"}, {"cl22": "NSW"}),
            ("k1", "A", {"el882": "2.5"}, {"cl22": "VIC"}),
        ],
        "rowKey string, name string, el_p map<string,string>, cl_p map<string,string>",
    ).coalesce(1)
    out = tmp_path / "local_node"
    export_local_node(df, str(out), ["name", "el882", "cl22"])
    files = glob.glob(str(out / "*.csv"))
    lines = open(files[0]).read().strip().splitlines()
    assert lines[0] == "rowKey\tname\tel882\tcl22"
    assert lines[1].startswith("k1\tA\t2.5\tVIC")  # sorted by rowKey
    assert lines[2].startswith("k2\tB\t1.5\tNSW")


def test_custom_index_fields(spark):
    # SolrIndexDAO.scala:682-768 + Store.scala:695-705
    from biocache_store_spark.operators.index_projection import (
        add_custom_index_fields,
        normalise_custom_index_fields,
    )

    assert normalise_custom_index_fields(["a", "b_i", "c_d"]) == ["a_s", "b_i", "c_d"]

    df = spark.createDataFrame(
        [("r1", '{"count": "7", "score": "1.25", "seen": "2020-04-01", "note": "hi", "bad": "x"}')],
        "id string, miscProperties string",
    )
    out = add_custom_index_fields(
        df, ["count_i", "score_d", "seen_dt", "note", "bad_i"]
    ).collect()[0]
    assert out["count_i"] == "7"
    assert out["score_d"] == "1.25"
    assert out["seen_dt"] == "2020-04-01"
    assert out["note_s"] == "hi"
    assert out["bad_i"] is None  # unparseable -> null, job survives

    # user-provided-type path: the full field name IS the map key
    df2 = spark.createDataFrame(
        [("r1", {"count_i": "9"})], "id string, miscProperties map<string,string>"
    )
    out2 = add_custom_index_fields(
        df2, ["count_i"], keys_include_suffix=True
    ).collect()[0]
    assert out2["count_i"] == "9"


# ---------------------------------------------------------------------------
# Archive fetch (load/DataLoader.scala:373-470, util/SFTPTools.scala)
# ---------------------------------------------------------------------------


def test_fetch_archive_zip(tmp_path):
    import zipfile

    from biocache_store_spark.sources.archive import fetch_archive

    src = tmp_path / "src" / "dr123.zip"
    src.parent.mkdir()
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("occurrence.csv", "occurrenceID,scientificName\n1,Aus bus\n")
    dest = tmp_path / "work"
    extracted, modified = fetch_archive(str(src), "dr123", str(dest))
    assert extracted == str(dest / "dr123")
    assert (dest / "dr123" / "occurrence.csv").read_text().startswith("occurrenceID")
    assert modified is not None


def test_fetch_archive_gzip_and_plain(tmp_path):
    import gzip as _gzip

    from biocache_store_spark.sources.archive import fetch_archive

    import os

    gz = tmp_path / "feed.csv.gz"
    gz.write_bytes(_gzip.compress(b"a,b\n1,2\n"))
    dest = tmp_path / "work"
    extracted, _ = fetch_archive("file://" + str(gz), "dr9", str(dest))
    # gz: gunzipped into a PER-RESOURCE directory (a loader pointed at the
    # returned path must see only this resource's files), archive removed
    assert extracted != str(dest)
    assert os.listdir(extracted) == ["dr9.csv"]
    assert open(os.path.join(extracted, "dr9.csv"), "rb").read() == b"a,b\n1,2\n"
    assert not (dest / "dr9.csv.gz").exists()

    plain = tmp_path / "plain.csv"
    plain.write_text("x,y\n")
    extracted2, _ = fetch_archive(str(plain), "dr10", str(dest))
    assert extracted2 != str(dest) and extracted2 != extracted
    assert os.listdir(extracted2) == ["dr10.csv"]
    # two resources fetched into one dest_dir never see each other's files
    assert open(os.path.join(extracted2, "dr10.csv")).read() == "x,y\n"


def test_fetch_archive_not_newer_skips(tmp_path):
    import datetime as dt

    from biocache_store_spark.sources.archive import fetch_archive

    src = tmp_path / "dr1.csv"
    src.write_text("a\n")
    dest = tmp_path / "work"
    future = dt.datetime.now() + dt.timedelta(days=1)
    assert fetch_archive(str(src), "dr1", str(dest), last_checked=future) == (
        None,
        None,
    )


def test_fetch_archive_sftp_unsupported_without_transport(tmp_path):
    """No paramiko in this sandbox and no injected transport -> the
    documented NotImplementedError gate."""
    import pytest

    from biocache_store_spark.sources.archive import fetch_archive

    with pytest.raises(NotImplementedError):
        fetch_archive("sftp://host/data.zip", "dr2", str(tmp_path))


class _FakeSftpTransport:
    """In-memory transport honoring the injectable contract: list(dir) ->
    [(name, mtime)], get(remote, local)."""

    def __init__(self, files):
        # files: {dir: {name: (mtime, bytes)}}
        self.files = files
        self.fetched = []

    def list(self, directory):
        return [
            (name, mtime) for name, (mtime, _) in self.files[directory].items()
        ]

    def get(self, remote, local):
        import os

        directory, name = os.path.dirname(remote), os.path.basename(remote)
        self.fetched.append(remote)
        with open(local, "wb") as fh:
            fh.write(self.files[directory][name][1])


def test_fetch_archive_sftp_latest_file_round_trip(tmp_path):
    """SFTPTools.sftpLatestArchive parity over an injected transport:
    directory URL -> newest *.* file wins, not-newer skips, the fetched
    zip extracts for the loader."""
    import datetime as dt
    import io
    import zipfile

    from biocache_store_spark.sources.archive import fetch_archive

    def make_zip(member, body):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr(member, body)
        return buf.getvalue()

    new_zip = make_zip("occurrence.txt", "id\n1\n")
    old_zip = make_zip("occurrence.txt", "id\n0\n")
    utc = dt.timezone.utc
    transport = _FakeSftpTransport({
        "/feeds": {
            "old.zip": (dt.datetime(2024, 1, 1, tzinfo=utc), old_zip),
            "new.zip": (dt.datetime(2025, 6, 1, tzinfo=utc), new_zip),
            "README": (dt.datetime(2026, 1, 1, tzinfo=utc), b"no dot -> ignored"),
        }
    })
    extracted, modified = fetch_archive(
        "sftp://u:p@host/feeds", "dr7", str(tmp_path / "work"),
        sftp_transport=transport,
    )
    assert transport.fetched == ["/feeds/new.zip"]
    assert modified == dt.datetime(2025, 6, 1, tzinfo=utc)
    import os

    assert os.path.exists(os.path.join(extracted, "occurrence.txt"))

    # conditional download: nothing newer than last_checked -> (None, None)
    assert fetch_archive(
        "sftp://u:p@host/feeds", "dr7", str(tmp_path / "work2"),
        last_checked=dt.datetime(2025, 7, 1, tzinfo=utc),
        sftp_transport=transport,
    ) == (None, None)

    # direct file reference fetches exactly that file
    extracted2, _ = fetch_archive(
        "sftp://u:p@host/feeds/old.zip", "dr8", str(tmp_path / "work3"),
        sftp_transport=transport,
    )
    assert transport.fetched[-1] == "/feeds/old.zip"

    # a typo'd explicit filename raises — it must not masquerade as the
    # routine not-newer skip (the HTTP path 404s for the same mistake)
    import pytest

    with pytest.raises(FileNotFoundError):
        fetch_archive(
            "sftp://u:p@host/feeds/missing.zip", "dr9", str(tmp_path / "w4"),
            sftp_transport=transport,
        )


def test_streaming_watermark_drops_late_events(spark, tmp_path):
    """True streaming semantics across micro-batches: append-mode tumbling
    windows emit once finalized, the checkpoint carries the watermark
    across restarts, and an event older than the watermark is DROPPED
    instead of reopening its window (the late-data contract the batch-mode
    test above cannot exercise)."""
    import datetime as dt
    import glob

    from biocache_store_spark.streaming.incremental import windowed_event_counts

    src = tmp_path / "events_in"
    out = tmp_path / "events_out"
    chk = tmp_path / "chk"
    src.mkdir()
    schema = "ts timestamp, event_type string, value double"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def run_stream():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            windowed_event_counts(stream, watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(chk))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: window [00:00,01:00) gets 2 clicks; 01:30 advances the
    # watermark to 01:20 so that window finalizes and is emitted
    write_batch("b1", [
        (dt.datetime(2024, 1, 1, 0, 10), "click", 1.0),
        (dt.datetime(2024, 1, 1, 0, 20), "click", 2.0),
        (dt.datetime(2024, 1, 1, 1, 30), "view", 3.0),
    ])
    run_stream()

    # batch 2 (same checkpoint): 00:30 is behind the carried watermark ->
    # dropped; 02:40 advances it past 02:00 so [01:00,02:00) finalizes
    write_batch("b2", [
        (dt.datetime(2024, 1, 1, 0, 30), "click", 99.0),  # late: dropped
        (dt.datetime(2024, 1, 1, 2, 40), "view", 4.0),
    ])
    run_stream()

    assert glob.glob(str(out) + "/*.parquet")
    got = {
        (r["win"]["start"].hour, r["event_type"]): (r["n"], r["total_value"])
        for r in spark.read.parquet(str(out)).collect()
    }
    # finalized windows only, each exactly once, late row absent everywhere
    assert got[(0, "click")] == (2, 3.0)  # NOT 3 / 102.0 - late row dropped
    assert got[(1, "view")] == (1, 3.0)
    assert (2, "view") not in got  # still open at the end


def test_write_occurrence_store_layout(spark, tmp_path):
    """Resource-partitioned store layout: directory-level pruning per
    dataResourceUid and partition-scoped overwrite semantics."""
    import glob

    from pyspark.sql import functions as F

    from biocache_store_spark.exports.exporters import write_occurrence_store

    df = spark.range(100).select(
        F.concat(F.lit("r"), F.col("id")).alias("rowKey"),
        F.concat(F.lit("dr"), F.pmod(F.col("id"), F.lit(3))).alias(
            "dataResourceUid"
        ),
        (F.col("id") * 2).alias("payload"),
    )
    path = str(tmp_path / "occ")
    write_occurrence_store(df, path)
    dirs = sorted(
        d.split("=")[-1]
        for d in glob.glob(path + "/dataResourceUid=*")
    )
    assert dirs == ["dr0", "dr1", "dr2"]

    back = spark.read.parquet(path)
    # partition pruning: a resource filter reads one directory
    plan = back.filter(F.col("dataResourceUid") == "dr1")._jdf.queryExecution(
    ).executedPlan().toString()
    assert back.count() == 100
    assert back.filter(F.col("dataResourceUid") == "dr1").count() == 33

    # file-size bounding: target_file_rows caps rows per output file
    write_occurrence_store(df, path, target_file_rows=10)
    files = glob.glob(path + "/dataResourceUid=*/*.parquet")
    assert len(files) >= 9  # ~33 rows / 10 -> >=4 files per resource
    import pyarrow.parquet as pq

    for f in files:
        assert pq.read_metadata(f).num_rows <= 10
    assert spark.read.parquet(path).count() == 100


def test_bucketed_store_colocated_join(spark, tmp_path):
    """Two relations bucketed on the same key join with ZERO Exchange —
    the Spark-native form of the reference's same-wide-row co-location of
    raw and processed column families (Store.scala comparison path)."""
    from biocache_store_spark.exports.exporters import write_bucketed_store

    raw = spark.range(0, 10_000).select(
        F.col("id").alias("row_key"),
        F.concat(F.lit("raw"), F.col("id")).alias("raw_val"),
    )
    processed = spark.range(0, 10_000).select(
        F.col("id").alias("row_key"),
        F.concat(F.lit("proc"), F.col("id")).alias("proc_val"),
    )
    for name, df in [("t_raw_bucketed", raw), ("t_proc_bucketed", processed)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_bucketed_store(
            df,
            name,
            bucket_cols=("row_key",),
            num_buckets=8,
            sort_cols=("row_key",),
            path=str(tmp_path / name),
        )
    try:
        joined = spark.table("t_raw_bucketed").join(
            spark.table("t_proc_bucketed").hint("merge"), "row_key"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
        one = joined.filter(F.col("row_key") == 42).collect()[0]
        assert one["raw_val"] == "raw42" and one["proc_val"] == "proc42"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_raw_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_proc_bucketed")


def test_streaming_store_maintenance_upserts_by_partition(spark, tmp_path):
    """foreachBatch incremental store maintenance: batch rows upsert into
    the resource-partitioned store; only touched resource partitions are
    rewritten, untouched ones carry their files through unchanged."""
    import os

    from biocache_store_spark.streaming.incremental import maintain_store_stream

    hdr = (
        "occurrenceID,dataResourceUid,basisOfRecord,eventDate,year,month,day,"
        "decimalLatitude,decimalLongitude,geodeticDatum,country,stateProvince,"
        "scientificName,recordedBy\n"
    )
    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "b1.csv").write_text(
        hdr
        + "a1,drA,PreservedSpecimen,2001-05-05,,,,-35.2,144.8,WGS84,Australia,,Xus yus,Smith J\n"
        + "a2,drA,HumanObservation,2002-06-06,,,,-30.0,150.0,WGS84,Australia,,Aus bus,Doe K\n"
        + "b1,drB,PreservedSpecimen,2003-07-07,,,,-33.0,151.0,WGS84,Australia,,Cus dus,Poe E\n"
    )
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    maintain_store_stream(spark, str(staging), store, ckpt).awaitTermination(120)

    first = spark.read.parquet(store)
    assert first.count() == 3
    drb_files = sorted(os.listdir(os.path.join(store, "dataResourceUid=drB")))

    # batch 2: update a1 (new eventDate), introduce drC; drB untouched
    (staging / "b2.csv").write_text(
        hdr
        + "a1,drA,PreservedSpecimen,2011-01-01,,,,-35.2,144.8,WGS84,Australia,,Xus yus,Smith J\n"
        + "c1,drC,HumanObservation,2004-08-08,,,,-20.0,140.0,WGS84,Australia,,Eus fus,Fox G\n"
    )
    maintain_store_stream(spark, str(staging), store, ckpt).awaitTermination(120)

    final = spark.read.parquet(store)
    rows = {r["occurrenceID"]: r for r in final.collect()}
    assert set(rows) == {"a1", "a2", "b1", "c1"}
    assert rows["a1"]["processed"]["eventDate"] == "2011-01-01"  # upserted
    assert rows["a2"]["processed"]["eventDate"] == "2002-06-06"  # carried over
    # drB partition files untouched by the second batch (dynamic overwrite
    # only rewrites partitions present in the batch)
    assert sorted(os.listdir(os.path.join(store, "dataResourceUid=drB"))) == drb_files


def test_streaming_store_null_resource_rows_survive_merges(spark, tmp_path):
    """Rows with NULL dataResourceUid live in the default partition; a
    later batch touching that partition must carry the earlier rows over
    rather than silently dropping them (the isin() null-trap)."""
    from biocache_store_spark.streaming.incremental import maintain_store_stream

    hdr = (
        "occurrenceID,dataResourceUid,basisOfRecord,eventDate,year,month,day,"
        "decimalLatitude,decimalLongitude,geodeticDatum,country,stateProvince,"
        "scientificName,recordedBy\n"
    )
    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "b1.csv").write_text(
        hdr + "k1,,PreservedSpecimen,2001-05-05,,,,-35.2,144.8,WGS84,Australia,,Xus yus,Smith J\n"
    )
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    maintain_store_stream(spark, str(staging), store, ckpt).awaitTermination(120)
    (staging / "b2.csv").write_text(
        hdr + "k2,,HumanObservation,2002-06-06,,,,-30.0,150.0,WGS84,Australia,,Aus bus,Doe K\n"
    )
    maintain_store_stream(spark, str(staging), store, ckpt).awaitTermination(120)
    ids = sorted(
        r["occurrenceID"]
        for r in spark.read.parquet(store).select("occurrenceID").collect()
    )
    assert ids == ["k1", "k2"]


def test_streaming_store_intra_batch_duplicate_keys_last_file_wins(
    spark, tmp_path
):
    """Several staging files can land in ONE micro-batch; a key repeated
    across them must upsert to a single row, the lexicographically-last
    file winning (later drops supersede earlier ones)."""
    from biocache_store_spark.streaming.incremental import maintain_store_stream

    hdr = (
        "occurrenceID,dataResourceUid,basisOfRecord,eventDate,year,month,day,"
        "decimalLatitude,decimalLongitude,geodeticDatum,country,stateProvince,"
        "scientificName,recordedBy\n"
    )
    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "a_first.csv").write_text(
        hdr + "d1,drX,PreservedSpecimen,2001-01-01,,,,-35.2,144.8,WGS84,Australia,,Xus yus,Smith J\n"
    )
    (staging / "b_fix.csv").write_text(
        hdr + "d1,drX,PreservedSpecimen,2009-09-09,,,,-35.2,144.8,WGS84,Australia,,Xus yus,Smith J\n"
    )
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    maintain_store_stream(spark, str(staging), store, ckpt).awaitTermination(120)
    rows = spark.read.parquet(store).collect()
    assert len(rows) == 1
    assert rows[0]["processed"]["eventDate"] == "2009-09-09"


def test_map_headers_full_record_mapper_cases(spark):
    """FullRecordMapperTest.scala: 'class' maps to the keyword-safe
    'classs' field, and header matching is case-insensitive
    ('SCIENTIFICNAME' -> scientificName)."""
    from biocache_store_spark.sources.csv_loader import map_headers

    df = spark.createDataFrame(
        [("Aves", "Platycercus", "elegans")],
        ["class", "genus", "specificEpithet"],
    )
    out = map_headers(df)
    assert set(out.columns) == {"classs", "genus", "specificEpithet"}
    row = out.collect()[0]
    assert row["classs"] == "Aves" and row["genus"] == "Platycercus"

    upper = spark.createDataFrame([("Aves",)], ["SCIENTIFICNAME"])
    out2 = map_headers(upper)
    assert out2.columns == ["scientificName"]
    assert out2.collect()[0]["scientificName"] == "Aves"


def test_map_headers_id_and_occurrence_id_collision(spark):
    """'id,occurrenceID' headers (the standard DwC-A export shape): the
    explicit occurrenceID column wins the term; 'id' keeps its own name;
    no duplicate output columns."""
    from biocache_store_spark.sources.csv_loader import (
        add_record_identity,
        map_headers,
    )

    df = spark.createDataFrame(
        [("core1", "occ1", "x")], "id string, occurrenceID string, v string"
    )
    out = map_headers(df)
    assert out.columns.count("occurrenceID") == 1
    row = out.collect()[0]
    assert row["occurrenceID"] == "occ1"
    ident = add_record_identity(out, "dr1", ["occurrenceID"]).collect()[0]
    assert ident["rowKey"] == "dr1|occ1"


def test_dwca_fields_enclosed_by_empty_disables_quoting(spark, tmp_path):
    """fieldsEnclosedBy=\"\" (GBIF TSV convention) must not re-enable the
    double quote: an inch mark in the data stays literal."""
    from biocache_store_spark.sources.dwca import load_archive

    (tmp_path / "meta.xml").write_text(
        '<archive xmlns="http://rs.tdwg.org/dwc/text/">'
        '<core rowType="http://rs.tdwg.org/dwc/terms/Occurrence" '
        'fieldsTerminatedBy="\\t" fieldsEnclosedBy="" ignoreHeaderLines="1">'
        "<files><location>occ.txt</location></files>"
        '<id index="0"/>'
        '<field index="1" term="http://rs.tdwg.org/dwc/terms/verbatimLocality"/>'
        "</core></archive>"
    )
    (tmp_path / "occ.txt").write_text(
        'id\tverbatimLocality\n1\t35 12\' 30" N ridge\n2\tplain place\n'
    )
    out = {r["coreID"]: r["verbatimLocality"] for r in load_archive(
        spark, str(tmp_path), "drq", unique_terms=["coreID"]
    ).collect()}
    assert out["1"] == '35 12\' 30" N ridge'
    assert out["2"] == "plain place"


_EVENT_META = (
    '<archive xmlns="http://rs.tdwg.org/dwc/text/">'
    '<core rowType="http://rs.tdwg.org/dwc/terms/Event" ignoreHeaderLines="1">'
    "<files><location>event.csv</location></files>"
    '<id index="0"/>'
    '<field index="1" term="http://rs.tdwg.org/dwc/terms/eventDate"/>'
    '<field index="2" term="http://rs.tdwg.org/dwc/terms/locality"/>'
    '<field index="3" term="http://rs.tdwg.org/dwc/terms/stateProvince"/>'
    "</core>"
    '<extension rowType="http://rs.tdwg.org/dwc/terms/Occurrence" '
    'ignoreHeaderLines="1">'
    "<files><location>occurrence.csv</location></files>"
    '<coreid index="0"/>'
    '<field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceID"/>'
    '<field index="2" term="http://rs.tdwg.org/dwc/terms/scientificName"/>'
    '<field index="3" term="http://rs.tdwg.org/dwc/terms/locality"/>'
    "</extension></archive>"
)


def _write_event_archive(tmp_path):
    (tmp_path / "meta.xml").write_text(_EVENT_META)
    (tmp_path / "event.csv").write_text(
        "id,eventDate,locality,stateProvince\n"
        "e1,2021-03-04,Site A,NSW\n"
        "e2,2021-05-06,,VIC\n"  # blank event locality: occurrence wins
        "e3,2021-07-08,Site C,QLD\n"  # no occurrences: emits nothing
    )
    (tmp_path / "occurrence.csv").write_text(
        "coreid,occurrenceID,scientificName,locality\n"
        "e1,o1,Macropus rufus,occ place\n"  # event Site A overrides
        "e1,o2,Vombatus ursinus,\n"
        "e2,o3,Macropus rufus,kept locality\n"
        "e2,o4,Dromaius novaehollandiae,   \n"  # blank both sides: NULL
        "e-missing,o5,Orphanus maximus,nowhere\n"  # orphan: dropped
    )


def test_dwca_event_core_loader(spark, tmp_path):
    """EventCoreExtractor parity (load/DwCALoader.scala:522-600): the
    Occurrence-extension rows fan out against the Event core, inherit
    the parent event's terms, and on a term both sides declare the
    NON-BLANK event value wins (recordTuples++eventTuples toMap with
    isNotBlank guards)."""
    from biocache_store_spark.sources.dwca import load_archive

    _write_event_archive(tmp_path)
    df = load_archive(spark, str(tmp_path), "drE", ["occurrenceID"])
    rows = {r["occurrenceID"]: r for r in df.collect()}
    # fan-out: one record per occurrence row; orphan o5 and event e3 gone
    assert set(rows) == {"o1", "o2", "o3", "o4"}
    # event terms inherited
    assert rows["o1"]["eventDate"] == "2021-03-04"
    assert rows["o1"]["stateProvince"] == "NSW"
    assert rows["o3"]["stateProvince"] == "VIC"
    # conflict rule: non-blank event locality overrides the occurrence's
    assert rows["o1"]["locality"] == "Site A"
    assert rows["o2"]["locality"] == "Site A"
    # blank event locality falls back to the occurrence value
    assert rows["o3"]["locality"] == "kept locality"
    # blank on both sides = absent
    assert rows["o4"]["locality"] is None
    # identity runs on the fanned-out records
    assert rows["o1"]["rowKey"] == "drE|o1"
    assert rows["o1"]["coreID"] == "e1"


def test_dwca_event_core_requires_occurrence_extension(spark, tmp_path):
    from biocache_store_spark.sources.dwca import load_archive

    (tmp_path / "meta.xml").write_text(
        '<archive xmlns="http://rs.tdwg.org/dwc/text/">'
        '<core rowType="http://rs.tdwg.org/dwc/terms/Event" '
        'ignoreHeaderLines="1">'
        "<files><location>event.csv</location></files>"
        '<id index="0"/>'
        '<field index="1" term="http://rs.tdwg.org/dwc/terms/eventDate"/>'
        "</core></archive>"
    )
    (tmp_path / "event.csv").write_text("id,eventDate\ne1,2021-01-01\n")
    with pytest.raises(ValueError, match="no Occurrence extension"):
        load_archive(spark, str(tmp_path), "drE")


def test_dwca_event_core_refuses_event_id_identity(spark, tmp_path):
    """The default identity must never be the parent event id: sibling
    occurrences would share a rowKey and upserts would collapse them."""
    from biocache_store_spark.sources.dwca import load_archive

    _write_event_archive(tmp_path)
    meta = _EVENT_META.replace(
        '<field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceID"/>',
        '<field index="1" term="http://rs.tdwg.org/dwc/terms/otherCatalogNumbers"/>',
    )
    (tmp_path / "meta.xml").write_text(meta)
    with pytest.raises(ValueError, match="occurrenceID"):
        load_archive(spark, str(tmp_path), "drE")
    # explicit unique_terms still work
    df = load_archive(
        spark, str(tmp_path), "drE", unique_terms=["otherCatalogNumbers"]
    )
    assert df.count() == 4


def test_dwca_event_core_skips_multimedia(spark, tmp_path):
    """The reference only loads multimedia when the core is an
    Occurrence/SimpleDarwinRecord (DwCALoader.scala:287-295): an
    event-core archive's Multimedia extension must NOT surface."""
    from biocache_store_spark.sources.dwca import load_archive

    _write_event_archive(tmp_path)
    meta = _EVENT_META.replace(
        "</extension></archive>",
        "</extension>"
        '<extension rowType="http://rs.gbif.org/terms/1.0/Multimedia" '
        'ignoreHeaderLines="1">'
        "<files><location>image.csv</location></files>"
        '<coreid index="0"/>'
        '<field index="1" term="http://purl.org/dc/terms/identifier"/>'
        "</extension></archive>",
    )
    (tmp_path / "meta.xml").write_text(meta)
    (tmp_path / "image.csv").write_text(
        "id,identifier\ne1,http://images.example/e1.jpg\n"
    )
    df = load_archive(spark, str(tmp_path), "drE", ["occurrenceID"])
    assert "multimedia" not in df.columns
    assert df.count() == 4


def test_create_event_dwca_roundtrip(spark, tmp_path):
    """create_event_dwca writes an Event-core zip that load_archive
    fans back out through the event-core path."""
    import zipfile

    from biocache_store_spark.exports.exporters import create_event_dwca
    from biocache_store_spark.sources.dwca import load_archive, parse_meta

    events = spark.createDataFrame(
        [("ev1", "2022-02-02", "Gully"), ("ev2", "2022-03-03", "Ridge")],
        "eventID string, eventDate string, locality string",
    )
    occurrences = spark.createDataFrame(
        [("ev1", "occA", "Petaurus breviceps"),
         ("ev1", "occB", "Macropus rufus"),
         ("ev2", "occC", "Vombatus ursinus")],
        "coreid string, occurrenceID string, scientificName string",
    )
    zip_path = str(tmp_path / "event_archive.zip")
    create_event_dwca(
        events, ["eventDate", "locality"],
        occurrences, ["occurrenceID", "scientificName"],
        zip_path, event_id_col="eventID", core_id_col="coreid",
    )
    extract = tmp_path / "extracted"
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(extract)
    desc = parse_meta(str(extract))
    assert desc.core.row_type.endswith("/Event")
    back = load_archive(spark, str(extract), "drZ", ["occurrenceID"])
    rows = {r["occurrenceID"]: r for r in back.collect()}
    assert set(rows) == {"occA", "occB", "occC"}
    assert rows["occA"]["locality"] == "Gully"
    assert rows["occC"]["eventDate"] == "2022-03-03"
    with pytest.raises(ValueError, match="id column"):
        create_event_dwca(
            events, ["eventDate"], occurrences, ["occurrenceID"],
            zip_path, event_id_col="nope", core_id_col="coreid",
        )


def test_export_facet_without_counts(spark, tmp_path):
    from biocache_store_spark.exports.exporters import export_facet

    df = spark.createDataFrame(
        [("NSW",), ("NSW",), ("VIC",), (None,)], "stateProvince string"
    )
    path = str(tmp_path / "facet")
    export_facet(df, "stateProvince", path, include_counts=False)
    back = spark.read.option("header", True).csv(path)
    assert sorted(r[0] for r in back.collect()) == ["NSW", "VIC"]


def test_stale_records_scoped_to_resource(spark):
    from biocache_store_spark.sources.auto_csv import stale_records

    existing = spark.createDataFrame(
        [("dr1|a", "dr1"), ("dr1|b", "dr1"), ("dr2|z", "dr2")],
        "rowKey string, dataResourceUid string",
    )
    current = spark.createDataFrame([("dr1|a",)], "rowKey string")
    stale = stale_records(existing, current, data_resource_uid="dr1")
    assert {r["rowKey"] for r in stale.collect()} == {"dr1|b"}  # dr2 untouched


def test_jsonl_loader_shapes(spark, tmp_path):
    """JSONL corpus ingest: field aliasing, deterministic id minting,
    corrupt-line tolerance, explicit-id passthrough."""
    from biocache_store_spark.sources.jsonl import load_jsonl

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"text": "alpha beta", "lang": "en", "url": "http://a"}\n'
        '{"content": "gamma delta"}\n'
        "this line is not json at all\n"
        '{"id": "doc-7", "text": "epsilon zeta"}\n'
    )
    docs = load_jsonl(spark, str(p), source="crawl1")
    rows = {r["text"]: r for r in docs.collect()}
    assert set(rows) == {"alpha beta", "gamma delta", "epsilon zeta"}
    assert rows["alpha beta"]["lang"] == "en"
    assert rows["alpha beta"]["url"] == "http://a"
    assert rows["gamma delta"]["doc_id"].startswith("crawl1-")  # minted
    assert rows["epsilon zeta"]["doc_id"] == "doc-7"  # explicit id wins
    assert all(r["source"] == "crawl1" for r in rows.values())
    assert rows["alpha beta"]["n_chars"] == 10
    # determinism: re-loading mints identical ids
    again = {r["text"]: r["doc_id"] for r in load_jsonl(spark, str(p), source="crawl1").collect()}
    assert again["gamma delta"] == rows["gamma delta"]["doc_id"]


def test_jsonl_loader_does_not_mutate_document_schema(spark, tmp_path):
    """load_jsonl(schema=None) extends the declared schema with alias
    columns; that extension must be a fresh StructType — StructType.add
    mutates in place, and leaking the aliases into the module constant
    would silently widen every later consumer."""
    from biocache_store_spark.sources import jsonl

    before = [f.name for f in jsonl.DOCUMENT_SCHEMA.fields]
    p = tmp_path / "c.jsonl"
    p.write_text('{"text": "alpha"}\n')
    load = jsonl.load_jsonl(spark, str(p), source="s")
    load.collect()
    after = [f.name for f in jsonl.DOCUMENT_SCHEMA.fields]
    assert after == before


def test_rollup_cutoff_must_be_hour_aligned(spark, tmp_path):
    """write_rollup/rollup_query reject a cutoff off the hour boundary —
    a misaligned cutoff would silently emit two partial rows for the
    boundary hour instead of failing."""
    import pytest

    from biocache_store_spark.operators.rollup import rollup_query, write_rollup

    events = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a", 1.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    path = str(tmp_path / "rollup")
    with pytest.raises(ValueError, match="hour boundary"):
        write_rollup(events, path, "2024-01-02 00:30:00")
    write_rollup(events, path, "2024-01-02 00:00:00")
    with pytest.raises(ValueError, match="hour boundary"):
        rollup_query(spark, path, events, "2024-01-02 00:00:30")


def test_dwca_stripped_copy_tracks_source_mtime(spark, tmp_path):
    """sources/dwca.py _read_file: the ignoreHeaderLines>1 stripped copy
    lives outside the archive dir and regenerates when the source file is
    re-extracted with newer content."""
    import os

    from biocache_store_spark.sources.dwca import FileDescriptor, _read_file

    arch = tmp_path / "arch"
    arch.mkdir()
    f = arch / "occ.csv"
    f.write_text("preamble\nid,name\n1,alpha\n")
    fd = FileDescriptor(
        row_type="t", location="occ.csv", delimiter=",", quote='"',
        ignore_header_lines=2, fields={1: "name"}, id_index=0,
    )
    first = _read_file(spark, str(arch), fd, id_alias="id").collect()
    assert {r["name"] for r in first} == {"alpha"}
    # no derived file may appear inside the archive dir (glob safety)
    assert os.listdir(arch) == ["occ.csv"]
    # re-extract with new content, bump mtime forward
    f.write_text("preamble\nid,name\n1,beta\n")
    os.utime(f, (os.path.getmtime(f) + 5, os.path.getmtime(f) + 5))
    second = _read_file(spark, str(arch), fd, id_alias="id").collect()
    assert {r["name"] for r in second} == {"beta"}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dedup_stream: replays of a key within the watermark are dropped;
    first arrivals pass."""
    import datetime as dt

    from biocache_store_spark.streaming.incremental import dedup_stream

    src = tmp_path / "stream"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 10, 0)
    (src / "b1.json").write_text(
        '{"doc_id": "a", "ts": "2024-01-01T10:00:00"}\n'
        '{"doc_id": "b", "ts": "2024-01-01T10:00:10"}\n'
        '{"doc_id": "a", "ts": "2024-01-01T10:00:20"}\n'  # replay of a
    )
    stream = (
        spark.readStream.schema("doc_id string, ts timestamp")
        .json(str(src))
    )
    deduped = dedup_stream(stream, ["doc_id"], watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_stream_sink").collect()}
    assert got == {"a", "b"}
    assert spark.sql("SELECT * FROM dedup_stream_sink").count() == 2


def test_occurrence_dedup_stream_equals_batch_recompute(spark, tmp_path):
    """occurrence_dedup_stream: after two drops (the second adds a new
    higher-precision member to an existing cluster AND an unrelated
    taxon), the latest version of the standing duplicate store equals a
    full from-scratch detect_duplicates over the accumulated store —
    the streaming composition of IncrementalDuplicationDetection."""
    import json

    from biocache_store_spark.operators.dedup import detect_duplicates
    from biocache_store_spark.streaming.incremental import (
        _latest_dup_version,
        occurrence_dedup_stream,
    )

    def rec(oid, dr, taxon, lat, lon):
        return {
            "occurrenceID": oid, "dataResourceUid": dr,
            "taxonConceptID": taxon, "year": "2000", "month": "01",
            "day": "05", "decimalLatitude": lat, "decimalLongitude": lon,
            "recordedBy": "Smith, J.", "recordNumber": None,
            "catalogNumber": None,
        }

    staging = tmp_path / "occ_staging"
    staging.mkdir()
    drop1 = [
        rec("o1", "dr1", "t1", "-35.2", "144.8"),
        rec("o2", "dr1", "t1", "-35.2", "144.8"),
        rec("o5", "dr2", "t2", "-30.0", "140.0"),
    ]
    drop2 = [
        rec("o0", "dr2", "t1", "-35.21667", "144.81060"),  # precise, new rep
        rec("o9", "dr1", "t3", "-20.0", "130.0"),          # fresh taxon
    ]
    (staging / "d1.jsonl").write_text("\n".join(json.dumps(r) for r in drop1))

    store_dir = str(tmp_path / "occ_store")
    dup_dir = str(tmp_path / "occ_dups")
    ckpt = str(tmp_path / "occ_ckpt")
    q = occurrence_dedup_stream(spark, str(staging), store_dir, dup_dir, ckpt)
    q.awaitTermination(120)
    (staging / "d2.jsonl").write_text("\n".join(json.dumps(r) for r in drop2))
    q2 = occurrence_dedup_stream(spark, str(staging), store_dir, dup_dir, ckpt)
    q2.awaitTermination(120)

    latest = _latest_dup_version(spark, dup_dir)
    assert latest is not None
    merged = spark.read.parquet(latest)
    full = detect_duplicates(
        spark.read.parquet(store_dir).drop("batch")
    )
    assert sorted(map(str, merged.collect())) == sorted(map(str, full.collect()))
    got = {r["row_key"]: r["status"] for r in merged.collect()}
    # the later high-precision arrival became t1's representative
    assert got["o0"] == "R" and got["o1"] in ("D1", "D2") and got["o9"] == "U"

    # drop 3 RE-DELIVERS o1 with a corrected (far-away) location: the
    # upsert view must supersede the old o1 — one dup row per record id,
    # o1 leaves the cluster — never a phantom same-id duplicate pair
    (staging / "d3.jsonl").write_text(
        json.dumps(rec("o1", "dr1", "t1", "-10.0", "120.0"))
    )
    q3 = occurrence_dedup_stream(spark, str(staging), store_dir, dup_dir, ckpt)
    q3.awaitTermination(120)
    merged3 = spark.read.parquet(_latest_dup_version(spark, dup_dir))
    rows3 = merged3.collect()
    assert len(rows3) == len({r["row_key"] for r in rows3})  # one row per id
    got3 = {r["row_key"]: r["status"] for r in rows3}
    assert got3["o1"] == "U" and got3["o0"] == "R" and got3["o2"] in ("D1", "D2")
    # strictly-earlier predecessor rule: a replay of the latest batch id
    # must read the version BEFORE it, never its own output
    import re as _re

    latest_n = int(_re.search(r"v=(\d+)$", _latest_dup_version(spark, dup_dir)).group(1))
    prev = _latest_dup_version(spark, dup_dir, before=latest_n)
    assert prev is not None and prev != _latest_dup_version(spark, dup_dir)

    # drop 4 MOVES o5 to a new taxon (t2 -> t3): the scope must include
    # the OLD taxon from the superseded store rows, so the merged store
    # drops t2's stale row for o5 and recomputes t3 — incremental == full
    # must survive taxon reassignment
    (staging / "d4.jsonl").write_text(
        json.dumps(rec("o5", "dr2", "t3", "-20.0", "130.0"))
    )
    q4 = occurrence_dedup_stream(spark, str(staging), store_dir, dup_dir, ckpt)
    q4.awaitTermination(120)
    merged4 = spark.read.parquet(_latest_dup_version(spark, dup_dir))
    from pyspark.sql.window import Window as _W

    raw4 = spark.read.parquet(store_dir)
    upserted4 = (
        raw4.withColumn(
            "__rn",
            F.row_number().over(
                _W.partitionBy("occurrenceID").orderBy(F.col("batch").desc())
            ),
        )
        .filter("__rn = 1")
        .drop("__rn", "batch")
    )
    full4 = detect_duplicates(upserted4)
    assert sorted(map(str, merged4.collect())) == sorted(
        map(str, full4.collect())
    )
    by_key4 = {(r["taxon"], r["row_key"]) for r in merged4.collect()}
    assert ("t3", "o5") in by_key4 and ("t2", "o5") not in by_key4
    # o5 and o9 now share t3's group and coordinates: they pair up
    got4 = {r["row_key"]: r["status"] for r in merged4.collect()}
    assert {got4["o5"], got4["o9"]} <= {"R", "D1", "D2"}


def test_occurrence_dedup_stream_epoch_guard(spark, tmp_path):
    """Wiping the checkpoint while keeping the duplicate store must fail
    loudly: batch ids restart at 0 and a silent run would merge against
    no predecessor (dropping every untouched taxon) and overwrite v=0."""
    import json
    import shutil

    from py4j.protocol import Py4JJavaError

    from biocache_store_spark.streaming.incremental import (
        occurrence_dedup_stream,
    )

    def rec(oid, taxon):
        return {
            "occurrenceID": oid, "dataResourceUid": "dr1",
            "taxonConceptID": taxon, "year": "2000", "month": "01",
            "day": "05", "decimalLatitude": "-35.2",
            "decimalLongitude": "144.8", "recordedBy": "Smith, J.",
            "recordNumber": None, "catalogNumber": None,
        }

    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "d1.jsonl").write_text(json.dumps(rec("o1", "t1")))
    store_dir = str(tmp_path / "store")
    dup_dir = str(tmp_path / "dups")
    ckpt = str(tmp_path / "ckpt")
    q = occurrence_dedup_stream(spark, str(staging), store_dir, dup_dir, ckpt)
    q.awaitTermination(120)
    assert os.path.isdir(os.path.join(dup_dir, "v=0"))
    epoch_dirs = [d for d in os.listdir(dup_dir) if d.startswith("_epoch_")]
    assert len(epoch_dirs) == 1

    # same checkpoint restarts are fine (same epoch)
    (staging / "d2.jsonl").write_text(json.dumps(rec("o2", "t1")))
    q2 = occurrence_dedup_stream(spark, str(staging), store_dir, dup_dir, ckpt)
    q2.awaitTermination(120)

    # wiped checkpoint + kept dup store: the new query id mismatches the
    # recorded epoch and the stream must die loudly
    shutil.rmtree(ckpt)
    (staging / "d3.jsonl").write_text(json.dumps(rec("o3", "t1")))
    q3 = occurrence_dedup_stream(spark, str(staging), store_dir, dup_dir, ckpt)
    with pytest.raises(Exception, match="epoch"):
        try:
            q3.awaitTermination(120)
        except Py4JJavaError as ex:  # surface the java message for match
            raise RuntimeError(str(ex)) from ex

    # legacy store (no epoch marker) + wiped checkpoint: version-number
    # heuristic catches it too
    legacy_dup = str(tmp_path / "dups_legacy")
    shutil.copytree(dup_dir, legacy_dup)
    for d in os.listdir(legacy_dup):
        if d.startswith("_epoch_"):
            shutil.rmtree(os.path.join(legacy_dup, d))
    ckpt2 = str(tmp_path / "ckpt2")
    staging2 = tmp_path / "staging2"
    staging2.mkdir()
    (staging2 / "d1.jsonl").write_text(json.dumps(rec("o4", "t1")))
    q4 = occurrence_dedup_stream(
        spark, str(staging2), str(tmp_path / "store2"), legacy_dup, ckpt2
    )
    with pytest.raises(Exception, match="epoch|does not follow"):
        try:
            q4.awaitTermination(120)
        except Py4JJavaError as ex:
            raise RuntimeError(str(ex)) from ex


def test_legacy_single_version_epoch_guard_content_check(spark, tmp_path):
    """A legacy (no-marker) store with only v=0 and a batch 0 is EITHER a
    first-batch crash replay or a wiped checkpoint — the guard
    distinguishes them by CONTENT: an identical re-delivery is accepted
    (idempotent self-overwrite), a different batch 0 refuses loudly
    instead of clobbering the old epoch's records."""
    import json
    import shutil

    from py4j.protocol import Py4JJavaError

    from biocache_store_spark.streaming.incremental import (
        occurrence_dedup_stream,
    )

    def rec(oid, taxon):
        return {
            "occurrenceID": oid, "dataResourceUid": "dr1",
            "taxonConceptID": taxon, "year": "2000", "month": "01",
            "day": "05", "decimalLatitude": "-35.2",
            "decimalLongitude": "144.8", "recordedBy": "Smith, J.",
            "recordNumber": None, "catalogNumber": None,
        }

    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "d1.jsonl").write_text(json.dumps(rec("o1", "t1")))
    store_dir = str(tmp_path / "store")
    dup_dir = str(tmp_path / "dups")
    q = occurrence_dedup_stream(
        spark, str(staging), store_dir, dup_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    # make it a legacy store: drop the epoch marker
    for d in os.listdir(dup_dir):
        if d.startswith("_epoch_"):
            shutil.rmtree(os.path.join(dup_dir, d))

    # identical re-delivery under a fresh checkpoint == the crash-replay
    # shape: accepted, marker re-stamped, store unchanged
    q2 = occurrence_dedup_stream(
        spark, str(staging), store_dir, dup_dir, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    assert any(d.startswith("_epoch_") for d in os.listdir(dup_dir))
    got = {r["row_key"] for r in spark.read.parquet(
        os.path.join(dup_dir, "v=0")).collect()}
    assert got == {"o1"}

    # DIFFERENT batch 0 over the same (re-legacied) store: refused
    for d in os.listdir(dup_dir):
        if d.startswith("_epoch_"):
            shutil.rmtree(os.path.join(dup_dir, d))
    staging2 = tmp_path / "staging2"
    staging2.mkdir()
    (staging2 / "d1.jsonl").write_text(json.dumps(rec("oNEW", "t9")))
    q3 = occurrence_dedup_stream(
        spark, str(staging2), store_dir, dup_dir, str(tmp_path / "ckpt3")
    )
    with pytest.raises(Exception, match="does not match the store"):
        try:
            q3.awaitTermination(120)
        except Py4JJavaError as ex:
            raise RuntimeError(str(ex)) from ex
    # the old epoch's records survived the refusal
    survivors = {r["row_key"] for r in spark.read.parquet(
        os.path.join(dup_dir, "v=0")).collect()}
    assert survivors == {"o1"}

    # a kept legacy dup store with a FRESH/re-pointed record store dir
    # (no batch=0 to compare against) can never be a crash replay —
    # v=0 is written strictly after batch=0 — so it must refuse too
    legacy2 = tmp_path / "dups_fresh_store"
    legacy2.mkdir()
    shutil.copytree(
        os.path.join(dup_dir, "v=0"), str(legacy2 / "v=0")
    )
    q4 = occurrence_dedup_stream(
        spark, str(staging), str(tmp_path / "store_fresh"), str(legacy2),
        str(tmp_path / "ckpt4"),
    )
    with pytest.raises(Exception, match="does not match the store"):
        try:
            q4.awaitTermination(120)
        except Py4JJavaError as ex:
            raise RuntimeError(str(ex)) from ex


def test_near_dup_stream_matches_direct_probe(spark, tmp_path):
    """Streaming drops probed against the seeded LSH index produce
    exactly the pairs a direct probe_lsh_index call finds, and the
    second drop sees the first drop's appended signatures."""
    import json

    from pyspark.sql import functions as F

    from biocache_store_spark.operators.minhash import (
        near_duplicates,
        write_lsh_index,
    )
    from biocache_store_spark.streaming.incremental import near_dup_stream

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    seed_rows = [(1, base), (2, other)]
    seed = spark.createDataFrame(seed_rows, "doc_id long, text string")
    index = str(tmp_path / "lsh")
    write_lsh_index(seed, index)

    staging = tmp_path / "staging"
    staging.mkdir()
    # drop 1: near-dup of seed doc 1; drop 2: near-dup of drop 1's doc 11
    drop1 = [{"doc_id": 11, "text": base + " llama", "source": "s"}]
    drop2 = [{"doc_id": 21, "text": base + " llama extra", "source": "s"},
             {"doc_id": 22, "text": "unrelated fresh words here today", "source": "s"}]
    (staging / "d1.jsonl").write_text("\n".join(json.dumps(r) for r in drop1))

    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    q = near_dup_stream(spark, str(staging), index, pairs_dir, ckpt)
    q.awaitTermination(120)
    (staging / "d2.jsonl").write_text("\n".join(json.dumps(r) for r in drop2))
    q2 = near_dup_stream(spark, str(staging), index, pairs_dir, ckpt)
    q2.awaitTermination(120)

    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in spark.read.parquet(pairs_dir).collect()
    }
    # ground truth: full-batch pairs over seed+drops, minus seed-internal
    all_docs = spark.createDataFrame(
        seed_rows + [(r["doc_id"], r["text"]) for r in drop1 + drop2],
        "doc_id long, text string",
    )
    full = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in near_duplicates(all_docs, threshold=0.5).collect()
    }
    seed_internal = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in near_duplicates(seed, threshold=0.5).collect()
    }
    assert got == full - seed_internal
    # the cross-drop pair (11, 21) proves drop 1's signatures were appended
    assert any(a == 11 and b == 21 for a, b, _ in got)


def test_near_dup_stream_requires_seeded_index(spark, tmp_path):
    import pytest as _pytest

    from biocache_store_spark.streaming.incremental import near_dup_stream

    with _pytest.raises(ValueError, match="seed"):
        near_dup_stream(
            spark, str(tmp_path / "staging"), str(tmp_path / "missing"),
            str(tmp_path / "pairs"), str(tmp_path / "ckpt"),
        )


def test_near_dup_stream_replay_is_idempotent(spark, tmp_path):
    """Re-invoking the foreachBatch handler with the same batch_id (the
    at-least-once replay case) must not duplicate pairs, and the marker
    must prevent a second signature append."""
    import json

    from biocache_store_spark.operators.minhash import write_lsh_index
    from biocache_store_spark.streaming.incremental import near_dup_stream

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    seed = spark.createDataFrame([(1, base)], "doc_id long, text string")
    index = str(tmp_path / "lsh")
    write_lsh_index(seed, index)

    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "d1.jsonl").write_text(
        json.dumps({"doc_id": 11, "text": base + " llama", "source": "s"})
    )
    pairs_dir = str(tmp_path / "pairs")

    q = near_dup_stream(spark, str(staging), index, pairs_dir, str(tmp_path / "c1"))
    q.awaitTermination(120)
    first = spark.read.parquet(pairs_dir).count()
    sig_first = spark.read.parquet(index + "/sig").count()
    # simulate replay: fresh checkpoint, same staging content and batch id
    q2 = near_dup_stream(spark, str(staging), index, pairs_dir, str(tmp_path / "c2"))
    q2.awaitTermination(120)
    assert spark.read.parquet(pairs_dir).count() == first  # overwritten, not appended
    assert spark.read.parquet(index + "/sig").count() == sig_first  # marker held


def test_jsonl_export_roundtrips_through_loader(spark, tmp_path):
    from pyspark.sql import functions as F

    from biocache_store_spark.exports.exporters import export_jsonl
    from biocache_store_spark.sources.jsonl import load_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "corpus_jsonl")
    export_jsonl(docs, path, fields=["doc_id", "text", "lang", "source"])
    back = load_jsonl(spark, path, source="roundtrip")
    assert back.count() == docs.count()
    # loader canonicalizes ids to string; numeric ids must survive the
    # round trip (not be nulled by the string schema and re-minted)
    a = {str(r["doc_id"]): r["text"] for r in docs.select("doc_id", "text").collect()}
    b = {r["doc_id"]: r["text"] for r in back.select("doc_id", "text").collect()}
    assert a == b


def test_jsonl_loader_numeric_ids_survive(spark, tmp_path):
    """A corpus with numeric doc_id values must keep them (stringified):
    the string-schema read would null JSON numbers under ANSI and the
    loader would silently re-mint every identity."""
    import json as _json

    from biocache_store_spark.sources.jsonl import load_jsonl

    p = tmp_path / "num.jsonl"
    p.write_text("\n".join(
        _json.dumps({"doc_id": i, "text": f"document {i}"}) for i in range(5)
    ))
    got = {r["doc_id"] for r in load_jsonl(spark, str(p), source="s").collect()}
    assert got == {"0", "1", "2", "3", "4"}


def test_semantic_dedup_stream(spark, tmp_path):
    """Embedding drops: near-identical arrivals are pruned against the
    stored corpus, novel ones kept; a later drop sees an earlier drop's
    appended vectors (cross-drop pruning)."""
    import json as _json

    from pyspark.sql import functions as F

    from biocache_store_spark.operators.similarity import write_ivf_index
    from biocache_store_spark.streaming.incremental import semantic_dedup_stream

    seed = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    cents = seed.select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    index = str(tmp_path / "ivf")
    write_ivf_index(seed, cents, index)

    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "d1.jsonl").write_text(_json.dumps(
        {"vec_id": 10, "embedding": [0.99, 0.01], "label": 1}  # dup of 0
    ) + "\n" + _json.dumps(
        {"vec_id": 11, "embedding": [-1.0, 0.2], "label": 1}   # novel
    ))
    decisions = str(tmp_path / "decisions")
    q = semantic_dedup_stream(
        spark, str(staging), index, decisions, str(tmp_path / "c1"),
        threshold=0.9,
    )
    q.awaitTermination(120)
    got = {r["vec_id"]: r["keep"] for r in spark.read.parquet(decisions).collect()}
    assert got == {10: False, 11: True}

    # drop 2: dup of drop-1's novel vector 11 -> pruned via the append
    (staging / "d2.jsonl").write_text(_json.dumps(
        {"vec_id": 20, "embedding": [-0.99, 0.21], "label": 1}
    ))
    q2 = semantic_dedup_stream(
        spark, str(staging), index, decisions, str(tmp_path / "c1"),
        threshold=0.9,
    )
    q2.awaitTermination(120)
    got = {r["vec_id"]: r["keep"] for r in spark.read.parquet(decisions).collect()}
    assert got[20] is False  # matched vector 11 from the previous drop


def test_ivfpq_index_stream_equals_batch_rebuild(spark, tmp_path):
    """Streaming IVFADC maintenance (VERDICT r11 #6): embedding drops
    append their residual-PQ codes (and the raw-vector store) to the
    persisted index; after two drops the index answers queries
    IDENTICALLY to a batch rebuild over the full corpus — including a
    cross-batch probe whose neighbors span the seed and both drops —
    and each drop's neighbor report excludes its own ids while seeing
    the PREVIOUS drop's appended vectors."""
    import json as _json

    from pyspark.sql import functions as F

    from biocache_store_spark.operators.similarity import (
        query_ivfpq_index_batch,
        write_ivfpq_index,
    )
    from biocache_store_spark.streaming.incremental import ivfpq_index_stream

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter((F.col("vec_id") >= 2) & (F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    seed = emb.filter(F.col("vec_id") < 30)
    b1 = emb.filter((F.col("vec_id") >= 30) & (F.col("vec_id") < 45))
    b2 = emb.filter(F.col("vec_id") >= 45)
    index = str(tmp_path / "ivfpq_stream")
    write_ivfpq_index(seed, cents, book, index, store_vectors=True)

    staging = tmp_path / "staging"
    staging.mkdir()
    neighbors = str(tmp_path / "neighbors")

    def drop(df, name):
        (staging / name).write_text("\n".join(
            _json.dumps({
                "vec_id": r["vec_id"],
                "embedding": [float(x) for x in r["embedding"]],
                "label": r["label"],
            })
            for r in df.collect()
        ))

    drop(b1, "d1.jsonl")
    q = ivfpq_index_stream(
        spark, str(staging), index, neighbors, str(tmp_path / "ckpt"),
        k=5, nprobe=2,
    )
    q.awaitTermination(120)
    drop(b2, "d2.jsonl")
    q2 = ivfpq_index_stream(
        spark, str(staging), index, neighbors, str(tmp_path / "ckpt"),
        k=5, nprobe=2,
    )
    q2.awaitTermination(120)

    n_all = emb.count()
    assert spark.read.parquet(index + "/codes").count() == n_all
    # the raw-vector store is maintained in lockstep (meta has_vectors)
    assert spark.read.parquet(index + "/vectors").count() == n_all

    # streaming-maintained index == batch rebuild over the full corpus,
    # probed by queries whose neighbors span seed + both drops
    rebuilt = str(tmp_path / "ivfpq_rebuild")
    write_ivfpq_index(emb, cents, book, rebuilt, store_vectors=True)
    queries = emb.filter(F.col("vec_id").isin([0, 35, 50])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for kwargs in ({}, {"rerank_shortlist": 12}):
        streamed = {
            tuple(r)
            for r in query_ivfpq_index_batch(
                spark, index, queries, k=5, nprobe=2, **kwargs
            ).collect()
        }
        batch = {
            tuple(r)
            for r in query_ivfpq_index_batch(
                spark, rebuilt, queries, k=5, nprobe=2, **kwargs
            ).collect()
        }
        assert streamed == batch and len(streamed) == 15, kwargs

    # per-drop neighbor reports: own ids excluded; the second drop can
    # see the first drop's appended vectors (cross-batch probing)
    rep = spark.read.parquet(neighbors).withColumn(
        "batch",
        F.regexp_extract(F.input_file_name(), r"batch=(\d+)", 1).cast("int"),
    )
    rows = rep.collect()
    b1_ids = {r["vec_id"] for r in b1.select("vec_id").collect()}
    b2_ids = {r["vec_id"] for r in b2.select("vec_id").collect()}
    first = [r for r in rows if r["batch"] == 0]
    second = [r for r in rows if r["batch"] == 1]
    assert first and second
    assert not {r["vec_id"] for r in first} & b1_ids
    assert not {r["vec_id"] for r in second} & b2_ids
    assert not {r["vec_id"] for r in first} & b2_ids  # b2 not yet appended

    # a dirty drop — duplicated vec_id (producer retry), null embedding,
    # wrong-dimension embedding, an embedding with a null element, and a
    # missing vec_id — must not wedge the stream: sanitized rows flow,
    # the duplicate appends once, every malformed row is skipped (each
    # would otherwise raise deterministically in the driver-side collect
    # and pin the checkpoint on this batch forever)
    good_emb = [float(x) for x in b1.limit(1).collect()[0]["embedding"]]
    dirty = [
        {"vec_id": 900, "embedding": good_emb, "label": 1},
        {"vec_id": 900, "embedding": good_emb, "label": 1},
        {"vec_id": 901, "embedding": None, "label": 1},
        {"vec_id": 902, "embedding": [0.1, 0.2], "label": 1},
        {"vec_id": 903, "embedding": [None] + good_emb[1:], "label": 1},
        {"embedding": good_emb, "label": 1},
    ]
    (staging / "d3.jsonl").write_text(
        "\n".join(_json.dumps(d) for d in dirty)
    )
    q3 = ivfpq_index_stream(
        spark, str(staging), index, neighbors, str(tmp_path / "ckpt"),
        k=5, nprobe=2,
    )
    q3.awaitTermination(120)
    codes = spark.read.parquet(index + "/codes")
    assert codes.filter(F.col("vec_id") == 900).count() == 1
    assert codes.filter(
        F.col("vec_id").isin([901, 902, 903]) | F.col("vec_id").isNull()
    ).count() == 0

    # construction-time argument errors: a shortlist below k and a
    # pre-meta index both fail BEFORE the stream starts (CLI-catchable),
    # not as a StreamingQueryException from inside the first tick
    import shutil

    with pytest.raises(ValueError, match="smaller than k"):
        ivfpq_index_stream(
            spark, str(staging), index, neighbors, str(tmp_path / "ck_rr"),
            k=10, rerank_shortlist=2,
        )
    shutil.rmtree(index + "/meta")
    with pytest.raises(ValueError, match="meta"):
        ivfpq_index_stream(
            spark, str(staging), index, neighbors, str(tmp_path / "ck_pm"),
        )


def test_jsonl_loader_mixed_id_types_stay_string(spark, tmp_path):
    """An alias seen with BOTH numeric and string values in the head must
    be typed string so string ids survive (numeric ones re-mint)."""
    import json as _json

    from biocache_store_spark.sources.jsonl import load_jsonl

    p = tmp_path / "mixed.jsonl"
    p.write_text("\n".join([
        _json.dumps({"doc_id": 1, "text": "numeric id line"}),
        _json.dumps({"doc_id": "legacy-abc", "text": "string id line"}),
    ]))
    got = {r["text"]: r["doc_id"] for r in load_jsonl(spark, str(p), source="s").collect()}
    assert got["string id line"] == "legacy-abc"


def test_dwca_quoted_multiline_field(spark, tmp_path):
    """A quoted field containing an embedded newline (IPT emits these)
    must stay one record, not shear into misaligned rows."""
    import os

    from biocache_store_spark.sources.dwca import load_archive

    d = tmp_path / "arch"
    d.mkdir()
    (d / "meta.xml").write_text(
        '<archive xmlns="http://rs.tdwg.org/dwc/text/">'
        '<core rowType="http://rs.tdwg.org/dwc/terms/Occurrence" '
        'fieldsTerminatedBy="," fieldsEnclosedBy="&quot;" ignoreHeaderLines="1">'
        "<files><location>occ.csv</location></files>"
        '<id index="0"/>'
        '<field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceRemarks"/>'
        '<field index="2" term="http://rs.tdwg.org/dwc/terms/scientificName"/>'
        "</core></archive>"
    )
    (d / "occ.csv").write_text(
        'id,remarks,name\n"u1","line one\nline two","Macropus rufus"\n'
    )
    df = load_archive(spark, str(d), "dr1", unique_terms=["coreID"])
    [row] = df.collect()
    assert row["scientificName"] == "Macropus rufus"
    assert "line one\nline two" == row["occurrenceRemarks"]
    assert os.path.basename(row["rowKey"]).startswith("dr1|")


def test_dwca_missing_identity_raises_clearly(spark, tmp_path):
    import pytest as _pytest

    from biocache_store_spark.sources.dwca import load_archive

    d = tmp_path / "arch2"
    d.mkdir()
    (d / "meta.xml").write_text(
        '<archive xmlns="http://rs.tdwg.org/dwc/text/">'
        '<core rowType="http://rs.tdwg.org/dwc/terms/Occurrence" '
        'fieldsTerminatedBy="," ignoreHeaderLines="1">'
        "<files><location>occ.csv</location></files>"
        '<field index="0" term="http://rs.tdwg.org/dwc/terms/scientificName"/>'
        "</core></archive>"
    )
    (d / "occ.csv").write_text("name\nMacropus rufus\n")
    with _pytest.raises(ValueError, match="identity terms"):
        load_archive(spark, str(d), "dr1")


def test_classify_stream_matches_batch_and_gates(spark, tmp_path):
    """Document drops scored against the persisted NB model: streaming
    predictions equal a batch nb_classify over the same rows (the
    equivalence contract), keep_label gates, an empty-text doc is
    omitted, and a missing model raises before the stream starts."""
    import json as _json

    import pytest as _pytest

    from biocache_store_spark.operators.classifier import (
        nb_classify,
        read_nb_model,
        train_nb,
        write_nb_model,
    )
    from biocache_store_spark.streaming.incremental import classify_stream

    train = spark.createDataFrame(
        [
            (1, "apple banana cherry apple", "fruit"),
            (2, "banana cherry date banana", "fruit"),
            (3, "carrot potato onion carrot", "veg"),
            (4, "potato onion leek potato", "veg"),
        ],
        "doc_id long, text string, label string",
    )
    model_path = str(tmp_path / "nb")
    m, l = train_nb(train, label_col="label")
    write_nb_model(m, l, model_path)

    with _pytest.raises(ValueError, match="no NB model"):
        classify_stream(
            spark, str(tmp_path / "nowhere"), str(tmp_path / "missing"),
            str(tmp_path / "p0"), str(tmp_path / "c0"),
        )

    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "d1.jsonl").write_text("\n".join(
        _json.dumps(d) for d in [
            {"doc_id": 10, "text": "apple cherry banana", "source": "s"},
            {"doc_id": 11, "text": "onion potato", "source": "s"},
            {"doc_id": 12, "text": "", "source": "s"},
        ]
    ))
    preds = str(tmp_path / "preds")
    q = classify_stream(
        spark, str(staging), model_path, preds, str(tmp_path / "c1"),
        keep_label="fruit",
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["label"], r["score"], r["keep"])
        for r in spark.read.parquet(preds).collect()
    }
    assert set(got) == {10, 11}
    assert got[10][0] == "fruit" and got[10][2] is True
    assert got[11][0] == "veg" and got[11][2] is False

    # streaming == batch equivalence on (label, score)
    batch_docs = spark.createDataFrame(
        [(10, "apple cherry banana"), (11, "onion potato")],
        "doc_id long, text string",
    )
    m2, l2, n_hex = read_nb_model(spark, model_path)
    batch = {
        r["doc_id"]: (r["label"], r["score"])
        for r in nb_classify(batch_docs, m2, l2, n_hex=n_hex).collect()
    }
    assert {k: v[:2] for k, v in got.items()} == batch


def test_dsir_stream_equals_batch_recompute(spark, tmp_path):
    """Incremental DSIR: drop-1 weights equal batch dsir_importance over
    seed+drop1; after drop 2, probing drop-2 docs equals batch over
    seed+drop1+drop2 — the probe-vs-recompute equivalence of the LSH
    index family, at histogram (KB) cost. Replaying a batch folds
    identical counts (partition overwrite), not doubles."""
    import json as _json

    from pyspark.sql import functions as F

    from biocache_store_spark.operators.curation import (
        dsir_importance,
        write_dsir_stats,
    )
    from biocache_store_spark.streaming.incremental import dsir_stream

    target = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    seed = spark.createDataFrame(
        [(1, "the quick brown fox runs"), (2, "zzz qqq vvv www")],
        "doc_id long, text string",
    )
    stats = str(tmp_path / "stats")
    write_dsir_stats(target, seed, stats)

    staging = tmp_path / "staging"
    staging.mkdir()
    d1 = [
        {"doc_id": 10, "text": "the lazy dog jumps", "source": "s"},
        {"doc_id": 11, "text": "kkk lll mmm nnn", "source": "s"},
    ]
    (staging / "d1.jsonl").write_text(
        "\n".join(_json.dumps(d) for d in d1)
    )
    weights_dir = str(tmp_path / "weights")
    q = dsir_stream(
        spark, str(staging), stats, weights_dir, str(tmp_path / "c1"),
        threshold=1.0,
    )
    q.awaitTermination(120)

    got1 = {
        r["doc_id"]: (r["importance"], r["selected"])
        for r in spark.read.parquet(weights_dir).collect()
    }
    batch_docs_1 = seed.unionByName(
        spark.createDataFrame(
            [(d["doc_id"], d["text"]) for d in d1], "doc_id long, text string"
        )
    )
    exp1 = {
        r["doc_id"]: r["importance"]
        for r in dsir_importance(batch_docs_1, target).collect()
    }
    assert {k: v[0] for k, v in got1.items()} == {
        k: v for k, v in exp1.items() if k in (10, 11)
    }
    assert got1[10][0] > got1[11][0]  # target-like outscores disjoint
    for _id, (imp, sel) in got1.items():
        assert sel == (imp >= 1.0)

    # drop 2: scored against stats INCLUDING drop 1
    d2 = [{"doc_id": 20, "text": "the quick dog", "source": "s"}]
    (staging / "d2.jsonl").write_text(_json.dumps(d2[0]))
    q2 = dsir_stream(
        spark, str(staging), stats, weights_dir, str(tmp_path / "c1"),
        threshold=1.0,
    )
    q2.awaitTermination(120)
    got2 = {
        r["doc_id"]: r["importance"]
        for r in spark.read.parquet(weights_dir).collect()
    }
    all_docs = batch_docs_1.unionByName(
        spark.createDataFrame(
            [(d2[0]["doc_id"], d2[0]["text"])], "doc_id long, text string"
        )
    )
    exp2 = {
        r["doc_id"]: r["importance"]
        for r in dsir_importance(all_docs, target).collect()
    }
    assert got2[20] == exp2[20]


def test_occurrence_outlier_stream_equals_batch_recompute(spark, tmp_path):
    """occurrence_outlier_stream: after two drops (the second adds a new
    extreme to one taxon AND moves a record between taxa), the latest
    version of the standing outlier store equals a full from-scratch
    jackknife_record_outliers over the upserted store."""
    import json

    from pyspark.sql.window import Window as _W

    from biocache_store_spark.operators.outlier_store import (
        jackknife_record_outliers,
    )
    from biocache_store_spark.streaming.incremental import (
        _latest_dup_version,
        occurrence_outlier_stream,
    )

    def rec(oid, taxon, v1, v2):
        return {"occurrenceID": oid, "taxonConceptID": taxon,
                "el1": v1, "el2": v2}

    staging = tmp_path / "staging"
    staging.mkdir()
    drop1 = [rec(f"a{i}", "tA", float(i + 1), float(i + 1)) for i in range(25)]
    drop1 += [rec(f"b{i}", "tB", float(i + 1), 3.0) for i in range(25)]
    drop1.append(rec("aX", "tA", 400.0, 5.0))  # tA el1 outlier
    (staging / "d1.jsonl").write_text("\n".join(json.dumps(r) for r in drop1))

    store_dir = str(tmp_path / "store")
    out_dir = str(tmp_path / "outliers")
    ckpt = str(tmp_path / "ckpt")
    q = occurrence_outlier_stream(spark, str(staging), store_dir, out_dir, ckpt)
    q.awaitTermination(120)
    v0 = spark.read.parquet(_latest_dup_version(spark, out_dir))
    got0 = {r["row_key"] for r in v0.filter("is_outlier").collect()}
    assert got0 == {"aX"}

    # drop 2: tB gains an extreme, and aX is re-delivered under tB (taxon
    # move) with an unremarkable value — tA must be recomputed too and
    # aX's old tA rows scrubbed
    drop2 = [rec("bX", "tB", 400.0, 3.0), rec("aX", "tB", 12.0, 3.0)]
    (staging / "d2.jsonl").write_text("\n".join(json.dumps(r) for r in drop2))
    q2 = occurrence_outlier_stream(spark, str(staging), store_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    merged = spark.read.parquet(_latest_dup_version(spark, out_dir))
    raw = spark.read.parquet(store_dir)
    upserted = (
        raw.withColumn(
            "__rn",
            F.row_number().over(
                _W.partitionBy("occurrenceID").orderBy(F.col("batch").desc())
            ),
        )
        .filter("__rn = 1")
        .drop("__rn", "batch")
    )
    full = jackknife_record_outliers(
        upserted, ["taxonConceptID"], ["el1", "el2"], "occurrenceID"
    )
    assert sorted(map(str, merged.collect())) == sorted(map(str, full.collect()))
    keys = {(r["taxonConceptID"], r["row_key"]) for r in merged.collect()}
    assert ("tB", "aX") in keys and ("tA", "aX") not in keys
    got = {r["row_key"] for r in merged.filter("is_outlier").collect()}
    assert got == {"bX"}  # aX left tA; tB's new extreme flags


def test_expert_outlier_stream_equals_batch_recompute(spark, tmp_path):
    """expert_outlier_stream: after two drops (the second adds a new
    out-of-range record to one taxon AND moves the first outlier between
    taxa to an in-range spot), the latest version of the standing store
    equals a full from-scratch expert_outlier_records over the upserted
    store, and the moved record's old-taxon rows are scrubbed."""
    import json

    from pyspark.sql.window import Window as _W

    from biocache_store_spark.operators.outlier_distribution import (
        expert_outlier_records,
    )
    from biocache_store_spark.streaming.incremental import (
        _latest_dup_version,
        expert_outlier_stream,
    )

    dists = spark.createDataFrame(
        [
            ("tA", "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"),
            ("tB", "POLYGON((10 10, 11 10, 11 11, 10 11, 10 10))"),
        ],
        "taxonConceptID string, wkt string",
    )

    def rec(oid, taxon, lat, lon, unc=None):
        return {
            "occurrenceID": oid, "taxonConceptID": taxon,
            "decimalLatitude": lat, "decimalLongitude": lon,
            "coordinateUncertaintyInMeters": unc,
        }

    staging = tmp_path / "staging"
    staging.mkdir()
    drop1 = [rec(f"a{i}", "tA", 0.5, 0.1 * (i + 1)) for i in range(8)]
    drop1 += [rec(f"b{i}", "tB", 10.5, 10.0 + 0.1 * (i + 1)) for i in range(8)]
    drop1.append(rec("aX", "tA", 0.5, 5.0))  # ~440 km outside tA's range
    drop1.append(rec("nR", "noRange", 0.5, 5.0))  # taxon without a range
    (staging / "d1.jsonl").write_text("\n".join(json.dumps(r) for r in drop1))

    store_dir = str(tmp_path / "store")
    out_dir = str(tmp_path / "outliers")
    ckpt = str(tmp_path / "ckpt")
    q = expert_outlier_stream(
        spark, str(staging), store_dir, out_dir, ckpt, distributions=dists
    )
    q.awaitTermination(120)
    v0 = spark.read.parquet(_latest_dup_version(spark, out_dir))
    assert {r["row_key"] for r in v0.filter("is_outlier").collect()} == {"aX"}
    # untested taxa never land in the store
    assert v0.filter(F.col("taxon") == "noRange").count() == 0

    # drop 2: tB gains an out-of-range record, and aX is re-delivered
    # under tB at an in-range spot (taxon move) — tA must be recomputed
    # too and aX's old tA rows scrubbed
    drop2 = [rec("bX", "tB", 10.5, 15.0), rec("aX", "tB", 10.5, 10.5)]
    (staging / "d2.jsonl").write_text("\n".join(json.dumps(r) for r in drop2))
    q2 = expert_outlier_stream(
        spark, str(staging), store_dir, out_dir, ckpt, distributions=dists
    )
    q2.awaitTermination(120)

    merged = spark.read.parquet(_latest_dup_version(spark, out_dir))
    raw = spark.read.parquet(store_dir)
    upserted = (
        raw.withColumn(
            "__rn",
            F.row_number().over(
                _W.partitionBy("occurrenceID").orderBy(F.col("batch").desc())
            ),
        )
        .filter("__rn = 1")
        .drop("__rn", "batch")
    )
    full = expert_outlier_records(upserted, dists)
    assert sorted(map(str, merged.collect())) == sorted(map(str, full.collect()))
    keys = {(r["taxon"], r["row_key"]) for r in merged.collect()}
    assert ("tB", "aX") in keys and ("tA", "aX") not in keys
    got = {r["row_key"] for r in merged.filter("is_outlier").collect()}
    assert got == {"bX"}  # aX moved in-range under tB; tB's new extreme flags


def test_dwca_default_value_fields(spark, tmp_path):
    """DwC-text default values (gbif dwca-io supplies them automatically
    in the reference's reader): an index-less field becomes a constant
    column, and an indexed field with a default falls back to it when
    the cell is missing."""
    from biocache_store_spark.sources.dwca import load_archive, parse_meta

    (tmp_path / "meta.xml").write_text(
        '<archive xmlns="http://rs.tdwg.org/dwc/text/">'
        '<core rowType="http://rs.tdwg.org/dwc/terms/Occurrence" '
        'ignoreHeaderLines="1">'
        "<files><location>occ.csv</location></files>"
        '<id index="0"/>'
        '<field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceID"/>'
        '<field index="2" term="http://rs.tdwg.org/dwc/terms/basisOfRecord" '
        'default="HumanObservation"/>'
        '<field term="http://rs.tdwg.org/dwc/terms/institutionCode" '
        'default="MV"/>'
        "</core></archive>"
    )
    (tmp_path / "occ.csv").write_text(
        "id,occurrenceID,basisOfRecord\n"
        "1,o1,PreservedSpecimen\n"
        "2,o2,\n"  # empty cell: the field default applies
    )
    desc = parse_meta(str(tmp_path))
    assert desc.core.defaults == {"institutionCode": "MV"}
    assert desc.core.field_defaults == {"basisOfRecord": "HumanObservation"}
    df = load_archive(spark, str(tmp_path), "drD", ["occurrenceID"])
    rows = {r["occurrenceID"]: r for r in df.collect()}
    assert rows["o1"]["basisOfRecord"] == "PreservedSpecimen"
    assert rows["o2"]["basisOfRecord"] == "HumanObservation"
    assert rows["o1"]["institutionCode"] == "MV"
    assert rows["o2"]["institutionCode"] == "MV"


def test_dwca_declared_encoding(spark, tmp_path):
    """meta.xml's encoding attribute is honored: an ISO-8859-1 archive
    (IPT emits these) loads its accented values intact instead of
    mojibake from a UTF-8 misread."""
    from biocache_store_spark.sources.dwca import load_archive, parse_meta

    (tmp_path / "meta.xml").write_text(
        '<archive xmlns="http://rs.tdwg.org/dwc/text/">'
        '<core rowType="http://rs.tdwg.org/dwc/terms/Occurrence" '
        'encoding="ISO-8859-1" ignoreHeaderLines="1">'
        "<files><location>occ.csv</location></files>"
        '<id index="0"/>'
        '<field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceID"/>'
        '<field index="2" term="http://rs.tdwg.org/dwc/terms/recordedBy"/>'
        "</core></archive>"
    )
    (tmp_path / "occ.csv").write_bytes(
        "id|occurrenceID|recordedBy\n1|o1|Muñoz, J.\n".encode("iso-8859-1")
    )
    # pipe delimiter so the comma inside the name stays literal
    meta = (tmp_path / "meta.xml").read_text().replace(
        'encoding="ISO-8859-1"',
        'encoding="ISO-8859-1" fieldsTerminatedBy="|"',
    )
    (tmp_path / "meta.xml").write_text(meta)
    assert parse_meta(str(tmp_path)).core.encoding == "ISO-8859-1"
    df = load_archive(spark, str(tmp_path), "drE8", ["occurrenceID"])
    row = df.collect()[0]
    assert row["recordedBy"] == "Muñoz, J."
