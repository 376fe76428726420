"""LLM-pipeline operators: minhash, simhash, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("lazy", "sleepy")
    rows = [
        (0, base),
        (1, base),  # exact duplicate
        (2, near),  # near duplicate
        (3, "completely different words about spark engines and parquet files"),
        (4, "tiny"),  # < 3 tokens -> no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_identical_signatures(spark, docs):
    from biocache_store_spark.operators.minhash import signatures

    sigs = {r["doc_id"]: r["sig"] for r in signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]
    assert 4 not in sigs  # too short


def test_minhash_near_duplicates(spark, docs):
    from biocache_store_spark.operators.minhash import near_duplicates

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in near_duplicates(docs, threshold=0.3).collect()
    }
    assert pairs.get((0, 1)) == 1.0
    assert (0, 3) not in pairs
    # the near-dup pair shares most shingles; banding at 12/4 catches it
    if (0, 2) in pairs:
        assert 0.3 <= pairs[(0, 2)] < 1.0


def test_simhash_properties(spark, docs):
    from biocache_store_spark.operators.simhash import hamming_distance, simhash

    out = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert out[0] == out[1]  # identical docs -> identical fingerprints
    assert len(out[0]) == 32 and set(out[0]) <= {"0", "1"}
    dist_df = spark.createDataFrame(
        [(out[0], out[2]), (out[0], out[3])], "a string, b string"
    ).select(hamming_distance(F.col("a"), F.col("b")).alias("d"))
    d_near, d_far = [r["d"] for r in dist_df.collect()]
    assert d_near < d_far  # near-dup closer in Hamming space


def _media_rows():
    return [
        ("m1", "r1", "image", "image/jpeg", b"\xff\xd8fakejpegbytes",
         ("http://x/1.jpg", 640, 480, None, "A", "CC-BY")),
        ("m2", "r1", "image", "image/jpeg", b"\xff\xd8fakejpegbytes",  # same content
         ("http://x/1-copy.jpg", 640, 480, None, "A", "CC-BY")),
        ("m3", "r2", "video", "video/mp4", b"\x00\x00fakevideo",
         ("http://x/2.mp4", 1280, 720, 3500, "B", "CC0")),
    ]


def test_multimodal_dedup_and_decode(spark):
    from biocache_store_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        dedup_media,
    )

    media = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    deduped = dedup_media(media)
    assert deduped.count() == 2  # m1/m2 collapse
    kept = {r["media_id"] for r in deduped.collect()}
    assert kept == {"m1", "m3"}

    decoded = decode_media(deduped)
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert rows["m1"]["content_length"] == len(b"\xff\xd8fakejpegbytes")
    assert len(rows["m1"]["features"]) == 8
    assert all(0.0 <= v <= 1.0 for v in rows["m1"]["features"])
    # deterministic: same content -> same features
    again = {r["media_id"]: r for r in decode_media(deduped).collect()}
    assert again["m1"]["features"] == rows["m1"]["features"]


def test_multimodal_real_decode_stubbed(spark):
    from biocache_store_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
    )

    media = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        decode_media(media, real_decode=True).collect()


def test_multimodal_frame_sampling(spark):
    from biocache_store_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        frame_sample_plan,
    )

    media = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    frames = frame_sample_plan(media, every_ms=1000).collect()
    ts = sorted(r["frame_ts_ms"] for r in frames)
    assert ts == [0, 1000, 2000, 3000]  # 3500ms video sampled at 1s
    assert all(r["media_id"] == "m3" for r in frames)


def test_media_url_validators_reference_cases():
    """MediaStore.isValidImageURL/isValidImage family (load/MediaStore.scala
    :40-57), cases from MiscTest.scala:65-83 + ImageUrlTest.scala."""
    from biocache_store_spark.operators.multimodal import (
        is_valid_image,
        is_valid_image_url,
        is_valid_sound,
        is_valid_sound_url,
        is_valid_video,
        is_valid_video_url,
    )

    assert is_valid_image_url(
        "http://74.50.62.163/images/display/biodiversity/vertebrates/"
        "id_images/web-birds/o29275a.jpg"
    )
    assert is_valid_image_url(
        "file:///data/biocache-media/dr340/2224/"
        "5b76a871-c3fc-4394-9559-3f6fd627512b/NNSWII02-37_Thalassoma_lunare.jpg"
    )
    assert is_valid_image_url("https://test.ala.org.au/images/image1/img.gif")
    assert is_valid_image_url("https://x.org/a.png?size=large")  # query ok
    assert not is_valid_image_url("https://test.ala.org.au/images/img.bmp")
    assert not is_valid_image_url("http://tests.ala.org.au/images/image1/img")
    assert not is_valid_image_url("a.jpg")  # scheme required for URL form
    assert is_valid_image("a.JPG")  # bare filename: extension suffix wins
    # reference quirk preserved: endsWithOneOf lowercases the URL but
    # compares against the mixed-case "imgType=jpeg" literal, so the
    # service-URL form never matches (MediaStore.scala:68-69)
    assert not is_valid_image("http://x/y?imgType=jpeg")
    assert is_valid_sound_url("http://x.org/call.mp3")
    assert not is_valid_sound_url("http://x.org/call.mp4")
    assert is_valid_video_url("ftp://x.org/clip.mov")
    assert is_valid_sound("song.flac") and not is_valid_sound("song.doc")
    assert is_valid_video("v.avi") and not is_valid_video("v.jpg")


def test_scaled_dims_reference_matrix():
    """ThumbnailableImage.scala:24-50 size arithmetic: copy-unchanged when
    both edges already fit, else scale by edge/max(w,h) with toInt
    truncation on each axis."""
    from biocache_store_spark.operators.multimodal import scaled_dims

    assert scaled_dims(640, 480, 100.0) == (100, 75, True)
    assert scaled_dims(640, 480, 314.0) == (314, 235, True)   # 480*0.490625
    assert scaled_dims(640, 480, 650.0) == (640, 480, False)  # both under
    assert scaled_dims(480, 640, 100.0) == (75, 100, True)    # portrait
    assert scaled_dims(100, 100, 100.0) == (100, 100, True)   # == edge resizes
    assert scaled_dims(99, 99, 100.0) == (99, 99, False)


def test_thumbnail_media_fake_path_byte_stable(spark):
    """Without Pillow the thumbnail stage keeps the reference's exact size
    arithmetic over metadata dims and emits a deterministic placeholder
    payload; the copy-unchanged rendition carries the original bytes."""
    from biocache_store_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        thumbnail_media,
    )

    media = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    out = thumbnail_media(media)
    rows = {(r["media_id"], r["size_name"]): r for r in out.collect()}
    # only image rows fan out; 2 images x 3 renditions
    assert set(r[0] for r in rows) == {"m1", "m2"}
    assert len(rows) == 6
    thumb = rows[("m1", "thumb")]
    assert (thumb["width"], thumb["height"], thumb["resized"]) == (100, 75, True)
    small = rows[("m1", "small")]
    assert (small["width"], small["height"]) == (314, 235)
    large = rows[("m1", "large")]
    assert large["resized"] is False
    assert bytes(large["content"]) == b"\xff\xd8fakejpegbytes"  # copy path
    assert rows[("m1", "thumb")]["real_resize"] is False
    # deterministic: identical content -> identical placeholder payloads
    again = {(r["media_id"], r["size_name"]): r for r in thumbnail_media(media).collect()}
    assert bytes(again[("m1", "thumb")]["content"]) == bytes(thumb["content"])
    assert bytes(rows[("m2", "thumb")]["content"]) == bytes(thumb["content"])


def test_pillow_decode_features_with_fake_module():
    """The Pillow-backed real decode path, exercised with a duck-typed
    fake Image module (Pillow isn't installed in this sandbox): 8-dim
    vector, deterministic, dims and channel means where expected."""
    from biocache_store_spark.operators.multimodal import (
        _pillow_decode_features,
    )

    class FakeImg:
        size = (640, 480)

        def convert(self, mode):
            return self

        def resize(self, dims):
            return self

        def getdata(self):
            return [(255, 0, 128)] * 16

    class FakeImageModule:
        @staticmethod
        def open(buf):
            return FakeImg()

    feats = _pillow_decode_features(FakeImageModule, b"whatever")
    assert len(feats) == 8
    assert feats[0] == 0.064 and feats[1] == 0.048  # w/1e4, h/1e4
    assert feats[2] == 1.0 and feats[3] == 0.0  # mean R, mean G
    assert feats == _pillow_decode_features(FakeImageModule, b"whatever")


def test_exif_coordinates_reference_semantics():
    """util/EXIF.scala:34-60 arithmetic, case for case: latitude abs()es
    each rational and negates on ref 'S'; longitude does NOT abs and —
    the reference bug kept for parity — reads the LATITUDE ref for its
    sign (EXIF.scala:57), so lon_ref 'W' never negates. corrected=True
    is the intended behavior."""
    from biocache_store_spark.operators.multimodal import exif_coordinates

    # 35 deg 30 min 36 sec = 35 + (30*60 + 36)/3600 = 35.51
    assert exif_coordinates((35, 30, 36), (144, 0, 0), "N", "E") == (35.51, 144.0)
    assert exif_coordinates((35, 30, 36), (144, 0, 0), "S", "E") == (-35.51, 144.0)
    # latitude components abs()ed (negative rationals in dirty EXIF)
    assert exif_coordinates((-35, -30, -36), (144, 0, 0), "N", "E") == (35.51, 144.0)
    # the bug: western longitude NOT negated (sign reads latitude ref)
    assert exif_coordinates((35, 0, 0), (144, 30, 36), "N", "W") == (35.0, 144.51)
    # ...a pathological latitude ref 'W' DOES negate longitude
    assert exif_coordinates((35, 0, 0), (144, 0, 0), "W", "E") == (35.0, -144.0)
    # corrected mode uses the longitude ref, the intended semantics
    assert exif_coordinates(
        (35, 0, 0), (144, 30, 36), "N", "W", corrected=True
    ) == (35.0, -144.51)
    # longitude components NOT abs()ed — the reference passes them raw
    assert exif_coordinates((35, 0, 0), (-144, 0, 0), "N", "E") == (35.0, -144.0)
    assert exif_coordinates(None, (144, 0, 0), "N", "E") is None
    assert exif_coordinates((35, 0, 0), None, "N", "E") is None


def test_exif_metadata_fake_deterministic(spark):
    """The digest-driven fake EXIF pass: per-row outputs equal the
    scalar pipeline recomputed driver-side, GPS-less rows (digest byte
    0 % 4 == 0) carry has_gps=False and nulls, and the pass is
    byte-stable across runs."""
    from biocache_store_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _fake_exif,
        exif_coordinates,
        exif_metadata,
    )

    rows = [
        (f"m{i}", "r1", "image", "image/jpeg", f"payload-{i}".encode(),
         (None, None, None, None, None, None))
        for i in range(40)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in exif_metadata(media).collect()}
    saw_gpsless = saw_tsless = False
    for i in range(40):
        r = got[f"m{i}"]
        d = _fake_exif(f"payload-{i}".encode())
        if d is None:
            assert r["has_gps"] is False
            assert r["exif_latitude"] is None
            assert r["exif_longitude"] is None
            assert r["exif_datetime"] is None
            saw_gpsless = True
        else:
            lat, lon = exif_coordinates(d[0], d[1], d[2], d[3])
            assert r["has_gps"] is True
            assert r["exif_latitude"] == lat
            assert r["exif_longitude"] == lon
            assert r["exif_datetime"] == d[4]
            assert lon >= 0.0  # the parity bug: never negated
            if d[4] is None:
                saw_tsless = True
    assert saw_gpsless and saw_tsless  # the gates are non-vacuous at n=40
    again = {r["media_id"]: r for r in exif_metadata(media).collect()}
    assert all(str(again[k]) == str(got[k]) for k in got)

    # non-image rows carry no EXIF even in fake mode (the real path
    # refuses them loudly; the fake mirrors it as a clean no-GPS row)
    mixed = spark.createDataFrame(
        [("v1", "r1", "video", "video/mp4", b"has-gps-digest-anyway",
          (None, None, None, None, None, None))],
        MEDIA_SCHEMA,
    )
    [vrow] = exif_metadata(mixed).collect()
    assert vrow["has_gps"] is False and vrow["exif_latitude"] is None


def test_exif_metadata_real_gated(spark):
    from biocache_store_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        exif_metadata,
    )

    media = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|real EXIF|not implemented"):
        exif_metadata(media, real_extract=True).collect()


def test_pillow_exif_with_fake_module():
    """The Pillow-backed real EXIF path with a duck-typed fake module:
    GPS IFD rationals + refs and DateTimeOriginal flow through the same
    reference arithmetic; a missing GPS IFD returns None (the reference
    returns None without a GpsDirectory, EXIF.scala:64-66)."""
    from biocache_store_spark.operators.multimodal import (
        _pillow_exif,
        exif_coordinates,
    )

    class FakeExif(dict):
        def __init__(self, gps, sub):
            super().__init__({1: 1})
            self._ifds = {0x8825: gps, 0x8769: sub}

        def get_ifd(self, tag):
            return self._ifds.get(tag, {})

    class FakeImg:
        def __init__(self, exif):
            self._exif = exif

        def getexif(self):
            return self._exif

    def module_for(exif):
        class FakeImageModule:
            @staticmethod
            def open(buf):
                return FakeImg(exif)

        return FakeImageModule

    gps = {1: "S", 2: (35, 30, 36), 3: "W", 4: (144, 0, 0)}
    sub = {0x9003: "2015:06:07 08:09:10"}
    d = _pillow_exif(module_for(FakeExif(gps, sub)), b"x")
    assert d is not None
    lat_dms, lon_dms, lat_ref, lon_ref, ts = d
    assert ts == "2015-06-07 08:09:10"
    assert exif_coordinates(lat_dms, lon_dms, lat_ref, lon_ref) == (-35.51, 144.0)
    # no GPS IFD -> None, even with a DateTimeOriginal present
    assert _pillow_exif(module_for(FakeExif({}, sub)), b"x") is None


def test_minhash_shingle_cap(spark):
    """max_shingles bounds the per-document set payload in the verification
    join: an adversarial mega-doc carries at most the cap, small docs are
    unaffected (exact Jaccard preserved below the cap)."""
    from biocache_store_spark.operators.minhash import near_duplicates, signatures

    mega = "x" + " y z w".join(str(i) for i in range(2000))
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the dog"),
         (2, "the quick brown fox jumps over the dog"),
         (3, mega)],
        ["doc_id", "text"],
    )
    sig = {r["doc_id"]: r for r in signatures(docs, max_shingles=50).collect()}
    assert sig[3]["n_sh"] == 50  # capped
    assert sig[1]["n_sh"] < 50  # small doc untouched
    assert sorted(sig[1]["shs"]) == sorted(sig[2]["shs"])

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in near_duplicates(docs, threshold=0.5, max_shingles=50).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact dup still exact under the cap


def test_fetch_media_round_trip(spark, tmp_path):
    """Loader -> fetch (injectable transport) -> hash dedup round trip
    (load/MediaStore.scala:317-420 + :234-285 MD5 dedup)."""
    from biocache_store_spark.operators.multimodal import (
        add_content_hash,
        fetch_media,
    )

    blob = tmp_path / "img1.jpg"
    blob.write_bytes(b"\xff\xd8fakejpegbytes")

    payloads = {"mem://a": (b"AAA", "image/png"), "mem://dup": (b"AAA", "image/png")}

    def fake_transport(url):
        if url in payloads:
            return payloads[url]
        if url.startswith("file://"):
            from biocache_store_spark.operators.multimodal import default_transport

            return default_transport(url)
        return None, None

    records = spark.createDataFrame(
        [("r1", "mem://a"), ("r2", "mem://dup"), ("r3", f"file://{blob}"),
         ("r4", "mem://missing"), ("r5", None)],
        ["record_id", "url"],
    )
    out = fetch_media(records, transport=fake_transport)
    hashed = {r["record_id"]: r for r in add_content_hash(out).collect()}
    assert hashed["r1"]["fetch_ok"] and hashed["r2"]["fetch_ok"]
    # MD5 dedup key identical for identical bytes fetched from distinct urls
    assert hashed["r1"]["content_hash"] == hashed["r2"]["content_hash"]
    assert bytes(hashed["r3"]["content"]) == b"\xff\xd8fakejpegbytes"
    assert hashed["r3"]["mime_type"] == "image/jpeg"
    assert not hashed["r4"]["fetch_ok"] and hashed["r4"]["content"] is None
    assert not hashed["r5"]["fetch_ok"]


def test_fetch_media_http_gated(spark):
    """http(s) without an injected transport raises the environment gate."""
    import pytest as _pytest

    from biocache_store_spark.operators.multimodal import fetch_media

    records = spark.createDataFrame(
        [("r1", "https://example.org/a.png")], ["record_id", "url"]
    )
    with _pytest.raises(Exception, match="(?i)network|NotImplemented"):
        fetch_media(records).collect()


def test_simhash_near_dup_pigeonhole_complete(spark):
    """With max_hamming < bands, band blocking is recall-lossless: the
    blocked result equals exact all-pairs Hamming filtering."""
    from itertools import combinations

    from biocache_store_spark.operators.simhash import (
        simhash,
        simhash_near_duplicates,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy dog today",   # near dup
        "the quick brown fox jumps over the lazy dog tonight", # exact dup
        "completely different words about database engines and joins",
        "entirely unrelated sentence regarding spark catalyst planning",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_duplicates(docs, max_hamming=3).collect()
    }
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    exact = {
        (a, b): sum(x != y for x, y in zip(fps[a], fps[b]))
        for a, b in combinations(sorted(fps), 2)
        if sum(x != y for x, y in zip(fps[a], fps[b])) <= 3
    }
    assert got == exact
    assert got[(0, 2)] == 0  # exact duplicate


def test_corpus_curation_manifest_semantics(spark, tmp_path):
    """Quality gate drops junk, the near-dup stage drops the higher doc_id
    of a verified pair, and the per-source manifest counts all three
    populations (input / candidates / kept)."""
    from biocache_store_spark.queries.text import corpus_curation

    good = (
        "the quick brown fox jumps over the lazy dog and the cat sat on "
        "the mat while the sun was high in the sky and the birds of the "
        "field sang songs of summer to the children walking to school in "
        "the morning light with bags full of books and dreams of the "
        "future that waits for all of us in the years to come and the "
        "rivers run down to the sea where the ships sail out to far "
        "lands in search of spices and silk and stories of old"
    )
    near = good.replace("lazy", "sleepy")
    other = (
        "in the beginning of the project the team wrote down all of the "
        "goals and then the work began in earnest with each member of "
        "the group taking one part of the plan and by the end of the "
        "first month most of the hard problems were solved and the rest "
        "of the schedule was a steady march of small wins that added up "
        "to a launch the whole town came out to see on the first day of "
        "spring when the gates opened to the public at last"
    )
    junk = "!!! ??? ;;; ... === %%% $$$ @@@ ((( )))"
    rows = [
        (0, good, "en", "s1", len(good)),
        (1, near, "en", "s1", len(near)),
        (2, junk, "en", "s2", len(junk)),
        (3, other, "en", "s2", len(other)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    manifest = {
        r["source"]: r
        for r in corpus_curation(spark, str(tmp_path)).collect()
    }
    s1, s2 = manifest["s1"], manifest["s2"]
    assert s1["n_input"] == 2 and s1["n_candidates"] == 2
    assert s1["n_kept"] == 1  # doc 1 is the doc_b of the near-dup pair
    assert s2["n_input"] == 2 and s2["n_candidates"] == 1  # junk gated out
    assert s2["n_kept"] == 1
    assert s1["tokens_kept"] > 0 and s2["avg_quality_kept"] >= 0.5


def test_text_shingles_equals_word_shingles(spark):
    """The codegen'd regex shingler must produce the identical shingle set
    as the lambda formulation for every n and for the edge shapes (short
    docs, repeated whitespace, empty/whitespace-only text)."""
    from biocache_store_spark.functions.text import (
        text_shingles,
        word_shingles,
        words,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "  leading and   trailing   whitespace\tand tabs\nnewlines  "),
        (2, "one"),
        (3, "two words"),
        (4, ""),
        (5, "   "),
        (6, "MiXeD Case TOKENS repeated repeated repeated tokens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (1, 2, 3, 5):
        cmp = df.select(
            "text",
            F.array_sort(text_shingles(F.col("text"), n)).alias("a"),
            F.array_sort(word_shingles(words(F.col("text")), n)).alias("b"),
        ).collect()
        for r in cmp:
            if n == 1 and r["text"].strip() == "":
                # intended divergence: the lambda form emits a bogus ['']
                # 1-shingle for empty/whitespace-only text (split('') ->
                # ['']); the regex form correctly yields no shingles
                assert r["a"] == [] and r["b"] == [""]
                continue
            assert r["a"] == r["b"], (n, r)


def test_find_mime_type_reference_cases():
    """MultimediaTest.scala:12-80 — format wins, then identifier extension,
    then image/*; vocab canonicalization with verbatim passthrough."""
    from biocache_store_spark.operators.multimodal import find_mime_type

    assert find_mime_type(format="image/jpeg") == "image/jpeg"
    assert find_mime_type(format="jpeg") == "image/jpeg"
    assert find_mime_type(format="mp3") == "audio/mp3"
    assert find_mime_type(format="something-odd") == "something-odd"
    assert find_mime_type(identifier="fred.jpg") == "image/jpeg"
    assert find_mime_type(identifier="fred.PNG") == "image/png"
    assert find_mime_type(identifier="fred.PNG?a-parameter") == "image/png"
    assert find_mime_type(identifier="fred.nurke.PNg") == "image/png"
    assert find_mime_type(identifier="fred.blah") == "image/*"
    assert find_mime_type() == "image/*"
    # subtype collisions resolve in reference vocabulary block order
    assert find_mime_type(format="ogg") == "audio/ogg"
    # an explicit format outranks the identifier extension
    assert find_mime_type(format="mp4", identifier="x.png") == "video/mp4"


def test_count_min_sketch_overestimates_never_under(spark):
    import pytest
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.sketch import (
        count_min_sketch,
        estimate_counts,
    )

    rows = [(w,) for w in ["a"] * 7 + ["b"] * 3 + ["c"] * 1 + ["dd"] * 5]
    df = spark.createDataFrame(rows, "term string")
    sketch = count_min_sketch(df, "term")
    exact = df.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = {
        r["term"]: (r["cms_est"], r["exact_cnt"])
        for r in estimate_counts(sketch, exact, "term").collect()
    }
    assert set(est) == {"a", "b", "c", "dd"}
    for term, (e, x) in est.items():
        assert e >= x, term
    # 4 terms in 4096 buckets: no collisions, estimates are exact
    assert all(e == x for e, x in est.values())
    # unseen term estimates 0 (no bucket collisions at this size)
    probe = spark.createDataFrame([("zz",)], "term string")
    assert estimate_counts(sketch, probe, "term").collect()[0]["cms_est"] == 0
    with pytest.raises(ValueError):
        count_min_sketch(df, "term", depth=5)


def test_count_min_sketch_bounded_and_broadcast(spark):
    from biocache_store_spark.operators.sketch import count_min_sketch, estimate_counts

    rows = [(f"w{i % 50}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "term string")
    sketch = count_min_sketch(df, "term", depth=3, bucket_hex=2)
    # bounded by construction: depth * 16^bucket_hex regardless of input size
    assert sketch.count() <= 3 * 256
    assert sketch.select("d").distinct().count() == 3
    probe = spark.createDataFrame([("w1",), ("w2",)], "term string")
    plan = estimate_counts(sketch, probe, "term", depth=3, bucket_hex=2)
    assert "BroadcastHashJoin" in plan._jdf.queryExecution().executedPlan().toString()


def test_lsh_index_probe_matches_batch_rerun(spark, tmp_path):
    """Incremental near-dup maintenance: probing a new batch against the
    persisted LSH index (old corpus signed ONCE, never re-shingled) plus
    the already-known old-corpus pairs reproduces exactly the pairs a
    full batch rerun over old+new would find."""
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.minhash import (
        near_duplicates,
        probe_lsh_index,
        write_lsh_index,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    variant = "alpha beta gamma delta epsilon zeta eta theta iota mu"
    other = "one two three four five six seven eight nine ten"
    rows = [
        (1, base),      # old
        (2, variant),   # old near-dup of 1
        (3, other),     # old, unrelated
        (11, base),     # new exact dup of 1
        (12, other + " eleven"),  # new near-dup of 3
        (13, "totally different words entirely here now folks"),  # new
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = docs.filter(F.col("doc_id") < 10)
    new = docs.filter(F.col("doc_id") >= 10)

    path = str(tmp_path / "lsh")
    write_lsh_index(old, path)
    old_pairs = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in near_duplicates(old, threshold=0.5).collect()
    }
    probe_pairs = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in probe_lsh_index(spark, path, new, threshold=0.5).collect()
    }
    full_pairs = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in near_duplicates(docs, threshold=0.5).collect()
    }
    assert old_pairs | probe_pairs == full_pairs
    assert probe_pairs  # the planted cross-split dup was found
    assert any(a < 10 <= b for a, b, _ in probe_pairs)  # old-vs-new pair

    # append the new batch's signatures: the index now answers for the
    # grown corpus — probing a doc similar to a NEW doc finds it
    write_lsh_index(new, path, mode="append")
    probe2 = spark.createDataFrame(
        [(21, "totally different words entirely here now friends")],
        "doc_id long, text string",
    )
    got = probe_lsh_index(spark, path, probe2, threshold=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {(13, 21)}

    # a careless append that re-carries already-indexed ids must not
    # change probe results: duplicate band rows are deduped on read, so
    # bucket counts don't inflate toward max_bucket_size and drop the
    # bucket prematurely
    write_lsh_index(new, path, mode="append")  # ids 11-13 now stored twice
    got_dup = probe_lsh_index(
        spark, path, probe2, threshold=0.5, max_bucket_size=4
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got_dup} == {(13, 21)}


def test_remove_boilerplate_drops_every_occurrence(spark):
    from biocache_store_spark.operators.curation import remove_boilerplate

    # span "cookie banner" is in 3 docs (> max_doc_freq=2): ALL copies go,
    # including the first — the semantic that separates this from dedup_spans
    rows = [
        (0, 0, "cookie banner", 2),
        (1, 0, "cookie banner", 2),
        (2, 0, "cookie banner", 2),
        (0, 1, "real content a", 3),
        (1, 1, "real content b", 3),
        (2, 1, "shared twice", 2),
        (3, 0, "shared twice", 2),  # df=2 == threshold: kept
    ]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_idx long, chunk string, n_tok long"
    )
    kept = remove_boilerplate(chunks, max_doc_freq=2)
    got = {(r["doc_id"], r["chunk"]) for r in kept.collect()}
    assert not any(c == "cookie banner" for _, c in got)
    assert (2, "shared twice") in got and (3, "shared twice") in got
    assert (0, "real content a") in got


def test_remove_boilerplate_df_is_per_document_not_per_occurrence(spark):
    from biocache_store_spark.operators.curation import remove_boilerplate

    # 3 occurrences but only 1 distinct doc -> df=1, survives at threshold 2
    rows = [(0, i, "repeated in one doc", 4) for i in range(3)]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_idx long, chunk string, n_tok long"
    )
    assert remove_boilerplate(chunks, max_doc_freq=2).count() == 3


def test_semantic_dedup_prunes_higher_id_within_cell(spark):
    from biocache_store_spark.operators.similarity import semantic_dedup

    # two orthogonal clusters; 0/1 identical (cell of centroid 0),
    # 2 alone in the other cell; 3 opposite to cluster A -> cos=-1, kept
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "cell_id long, centroid array<float>",
    )
    got = {r["vec_id"]: (r["cell_id"], r["keep"]) for r in
           semantic_dedup(emb, cents, threshold=0.9).collect()}
    assert got[0] == (0, True)
    assert got[1] == (0, False)  # higher id of the identical pair
    assert got[2] == (1, True)
    assert got[3][1] is True  # same cell as nothing similar


def test_semantic_dedup_max_cell_guard(spark):
    from biocache_store_spark.operators.similarity import semantic_dedup

    # every vector identical: the single cell exceeds max_cell, so the
    # pairing is skipped entirely and everything is kept (re-cluster signal)
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(5)], "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cell_id long, centroid array<float>"
    )
    out = semantic_dedup(emb, cents, threshold=0.5, max_cell=3).collect()
    assert len(out) == 5 and all(r["keep"] for r in out)


def test_ivf_assign_bulk_matches_join_form(spark):
    from biocache_store_spark.operators.similarity import ivf_assign, ivf_assign_bulk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    ref = {r["vec_id"]: r["cell_id"] for r in
           ivf_assign(emb, cents).select("vec_id", "cell_id").collect()}
    got = {r["vec_id"]: r["cell_id"] for r in
           ivf_assign_bulk(emb, cents).select("vec_id", "cell_id").collect()}
    assert got == ref


def test_ivf_assign_bulk_null_embedding_lowest_cell(spark):
    from biocache_store_spark.operators.similarity import ivf_assign_bulk

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None)], "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(7, [0.0, 1.0]), (3, [1.0, 0.0])], "cell_id long, centroid array<float>"
    )
    got = {r["vec_id"]: r["cell_id"] for r in ivf_assign_bulk(emb, cents).collect()}
    assert got[0] == 3  # argmax
    assert got[1] == 3  # null -> lowest cell_id


def test_bigram_lm_score_smoothing_and_hits(spark):
    from biocache_store_spark.operators.curation import bigram_lm_score

    ref = spark.createDataFrame(
        [(100, "a b a b c")], "doc_id long, text string"
    )
    # ref bigrams: (a,b)x2 (b,a) (b,c); contexts: a->2, b->2; V=3
    train = spark.createDataFrame(
        [(0, "a b"), (1, "z q")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_lm_score(train, ref).collect()}
    # doc 0: one bigram (a,b): c2=2, c1(a)=2 -> (2+1)/(2+3)
    assert got[0]["n_bigrams"] == 1 and got[0]["n_hits"] == 1
    assert abs(got[0]["lm_score"] - 3 / 5) < 1e-7  # rounded to 8dp in-query
    assert got[0]["hit_rate"] == 1.0
    # doc 1: unseen bigram AND unseen context -> (0+1)/(0+3)
    assert got[1]["n_hits"] == 0 and abs(got[1]["lm_score"] - 1 / 3) < 1e-7


def test_bigram_lm_score_omits_single_token_docs(spark):
    from biocache_store_spark.operators.curation import bigram_lm_score

    ref = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(0, "solo"), (1, "")], "doc_id long, text string"
    )
    assert bigram_lm_score(train, ref).count() == 0


def test_pq_encode_picks_nearest_codeword_per_subspace(spark):
    from biocache_store_spark.operators.similarity import pq_encode

    # 4-dim vectors, 2 subspaces of 2; codewords crafted per subspace
    book = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 1.0, 1.0, 1.0])],
        "j long, embedding array<float>",
    )
    vecs = spark.createDataFrame(
        [(10, [0.9, 1.1, 0.1, -0.1]),   # sub0 near cw1, sub1 near cw0
         (11, [0.0, 0.0, 1.0, 1.0])],   # sub0 == cw0, sub1 == cw1
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["codes"] for r in
           pq_encode(vecs, book, n_subspaces=2).collect()}
    assert got[10] == [1, 0]
    assert got[11] == [0, 1]


def test_pq_encode_tie_keeps_lowest_codeword(spark):
    from biocache_store_spark.operators.similarity import pq_encode

    book = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])], "j long, embedding array<float>"
    )
    # equidistant from both codewords in the single subspace
    vecs = spark.createDataFrame(
        [(5, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    [row] = pq_encode(vecs, book, n_subspaces=1).collect()
    assert row["codes"] == [0]


def test_pq_topk_scores_by_table_lookup(spark):
    from biocache_store_spark.operators.similarity import pq_encode, pq_topk

    book = [[0.0, 0.0], [2.0, 0.0]]
    book_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(book)], "j long, embedding array<float>"
    )
    vecs = spark.createDataFrame(
        [(1, [0.1, 0.0]), (2, [2.1, 0.0])], "vec_id long, embedding array<float>"
    )
    enc = pq_encode(vecs, book_df, n_subspaces=1)
    out = pq_topk(enc, [0.0, 0.0], book, k=2, n_subspaces=1).collect()
    # vec 1 -> codeword 0 (dist 0), vec 2 -> codeword 1 (dist 4)
    assert [(r["vec_id"], r["approx_dist"], r["rank"]) for r in out] == [
        (1, 0.0, 1), (2, 4.0, 2),
    ]


def test_content_sha1_reference_vector(spark):
    """FileHelperTest.scala:12-21: SHA-1 of 'This is a test\\n' — the hash
    the remote media store is searched by (contentsha1hash)."""
    from biocache_store_spark.operators.multimodal import (
        add_content_sha1,
        sha1_hex,
    )

    expected = "3c1bb0cd5d67dddc02fae50bf56d3a3a4cbc7204"
    assert sha1_hex(b"This is a test\n") == expected
    df = spark.createDataFrame([(b"This is a test\n",)], "content binary")
    assert add_content_sha1(df).collect()[0]["content_sha1"] == expected


def test_kmeans_train_deterministic_across_partitionings(spark):
    from biocache_store_spark.operators.similarity import kmeans_train

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    c1, b1, a1 = kmeans_train(emb, k=4, iters=2)
    c2, b2, a2 = kmeans_train(emb.repartition(13), k=4, iters=2)
    assert c1 == c2 and b1 == b2  # integer sums: partitioning-independent
    assert (
        a1.select("vec_id", "cell_id").exceptAll(
            a2.select("vec_id", "cell_id")
        ).count() == 0
    )


def test_kmeans_train_drops_empty_cells(spark):
    from biocache_store_spark.operators.similarity import kmeans_train

    # seed 1 ([9,9]) attracts nothing after the update: all mass at origin
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [9.0, 9.0]), (2, [0.1, 0.0]), (3, [0.0, 0.1]),
         (4, [0.05, 0.05])],
        "vec_id long, embedding array<float>",
    )
    cells, book, assigned = kmeans_train(emb, k=2, iters=1)
    # iteration 1: vec 1 is its own cell; it keeps itself (self-assigned),
    # so both cells survive — but centroid 0 moved to the small cluster mean
    assert cells == [0, 1]
    got = {r["vec_id"]: r["cell_id"] for r in assigned.collect()}
    assert got[1] == 1 and got[0] == 0 and got[2] == 0


def test_kmeans_centroid_is_exact_integer_mean(spark):
    from biocache_store_spark.operators.similarity import kmeans_train

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.5, 0.0])],
        "vec_id long, embedding array<float>",
    )
    cells, book, _ = kmeans_train(emb, k=1, iters=1)
    assert cells == [0]
    assert book[0] == [0.5, 0.0]  # (0 + 1000000 + 500000) / (3 * 1e6)


def test_kmeans_centroids_drive_ivf_with_bounded_cells(spark):
    """The trained codebook composes with ivf_topk: recall@10 stays
    useful at nprobe=2 and trained cells are MORE balanced than the
    first-k seed cells (max/mean imbalance shrinks) — the property that
    bounds per-probe scan cost at corpus scale. Deterministic end-to-end
    (fixed seeds, integer-sum updates), so exact thresholds are safe."""
    import statistics

    from pyspark.sql.window import Window

    from biocache_store_spark.functions.vectors import cosine_similarity_arrow
    from biocache_store_spark.operators.similarity import (
        ivf_assign_bulk,
        ivf_topk,
        kmeans_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cells, book, assigned = kmeans_train(emb, k=16, iters=2)
    cents = spark.createDataFrame(
        list(zip(cells, book)), "cell_id long, centroid array<double>"
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, queries, cents, k=10, nprobe=2).collect()
    }
    q = queries.select("query_id", F.col("embedding").alias("q_emb"))
    cand = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cs", cosine_similarity_arrow(F.col("embedding"), F.col("q_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("vec_id").asc()
    )
    truth = {
        (r["query_id"], r["vec_id"])
        for r in cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10).collect()
    }
    assert len(approx & truth) / len(truth) >= 0.5

    trained_sizes = [r["count"] for r in assigned.groupBy("cell_id").count().collect()]
    seed_cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    seed_sizes = [
        r["count"]
        for r in ivf_assign_bulk(emb, seed_cents).groupBy("cell_id").count().collect()
    ]
    imbalance = lambda s: max(s) / statistics.mean(s)  # noqa: E731
    assert imbalance(trained_sizes) < imbalance(seed_sizes)


def test_batch_score_plumbing(spark):
    from biocache_store_spark.operators.inference import (
        batch_score,
        fake_quality_model,
        score_and_filter,
    )

    docs = spark.createDataFrame(
        [(0, "good text"), (1, None), (2, "good text"), (3, "other")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["model_score"] for r in batch_score(docs).collect()}
    assert out[1] == 0.0                  # null -> 0
    assert out[0] == out[2]               # deterministic per content
    assert all(0.0 <= v < 1.0 for v in out.values())
    # identical across partitionings
    out2 = {r["doc_id"]: r["model_score"]
            for r in batch_score(docs.repartition(3)).collect()}
    assert out2 == out

    kept = {r["doc_id"] for r in score_and_filter(docs, threshold=out[3]).collect()}
    assert 3 in kept and 1 not in kept


def test_batch_score_loads_model_once_per_partition(spark):
    """The loader must run once per partition-task, not per batch/row —
    counted via a Spark accumulator from executor-side."""
    from biocache_store_spark.operators.inference import batch_score

    acc = spark.sparkContext.accumulator(0)

    def counting_loader():
        acc.add(1)
        import pandas as pd

        return lambda s: pd.Series([0.5] * len(s), index=s.index)

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "doc_id long, text string"
    ).repartition(4)
    n = batch_score(docs, model_loader=counting_loader).count()
    assert n == 100
    assert acc.value == 4  # once per partition-task


def test_pq_topk_null_codes_never_rank(spark):
    from biocache_store_spark.operators.similarity import pq_encode, pq_topk

    book = [[0.0, 0.0], [2.0, 0.0]]
    book_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(book)], "j long, embedding array<float>"
    )
    vecs = spark.createDataFrame(
        [(1, [0.1, 0.0]), (2, None)], "vec_id long, embedding array<float>"
    )
    out = pq_topk(pq_encode(vecs, book_df, n_subspaces=1), [0.0, 0.0], book, k=2,
                  n_subspaces=1).collect()
    assert [r["vec_id"] for r in out] == [1]  # null-coded row excluded


def test_pq_topk_rejects_mismatched_dims(spark):
    from biocache_store_spark.operators.similarity import pq_topk

    enc = spark.createDataFrame([(1, [0])], "vec_id long, codes array<int>")
    with pytest.raises(ValueError, match="not divisible"):
        pq_topk(enc, [0.0] * 60, [[0.0] * 60], n_subspaces=8)
    with pytest.raises(ValueError, match="codebook dim"):
        pq_topk(enc, [0.0] * 64, [[0.0] * 32], n_subspaces=8)


def test_pq_encode_matches_brute_force_hypothesis(spark):
    """Property sweep: every code equals the numpy argmin-L2 over the
    codebook (ties to the lowest codeword), per subspace, for arbitrary
    small float vectors."""
    import numpy as np
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from biocache_store_spark.operators.similarity import pq_encode

    fin = st.floats(
        min_value=-4.0, max_value=4.0, allow_nan=False, allow_infinity=False,
        width=32,
    )
    vec = st.lists(fin, min_size=4, max_size=4)

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(vec, min_size=1, max_size=6), st.lists(vec, min_size=1, max_size=4))
    def run(vectors, book):
        vdf = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vectors)],
            "vec_id long, embedding array<float>",
        )
        bdf = spark.createDataFrame(
            [(j, cw) for j, cw in enumerate(book)], "j long, embedding array<float>"
        )
        got = {r["vec_id"]: r["codes"] for r in
               pq_encode(vdf, bdf, n_subspaces=2).collect()}
        A = np.array(vectors, dtype=np.float64)
        B = np.array(book, dtype=np.float64)
        for i, v in enumerate(A):
            for s in range(2):
                lo, hi = s * 2, s * 2 + 2
                d = ((B[:, lo:hi] - v[lo:hi]) ** 2).sum(axis=1)
                assert got[i][s] == int(np.flatnonzero(d == d.min())[0])

    run()


def test_kmeans_assignment_is_argmin_hypothesis(spark):
    """Property: the final assignment maps every vector to its argmin-L2
    trained centroid (ties to the lowest surviving cell id)."""
    import numpy as np
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from biocache_store_spark.operators.similarity import kmeans_train

    fin = st.floats(
        min_value=-2.0, max_value=2.0, allow_nan=False, allow_infinity=False,
        width=32,
    )
    vec = st.lists(fin, min_size=2, max_size=2)

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(vec, min_size=2, max_size=8))
    def run(vectors):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vectors)],
            "vec_id long, embedding array<float>",
        )
        cells, book, assigned = kmeans_train(df, k=2, iters=1)
        got = {r["vec_id"]: r["cell_id"] for r in assigned.collect()}
        B = np.array(book, dtype=np.float64)
        A = np.array(vectors, dtype=np.float64)
        for i, v in enumerate(A):
            d = ((B - v) ** 2).sum(axis=1)
            assert got[i] == cells[int(np.flatnonzero(d == d.min())[0])]

    run()


def test_ivf_index_persist_probe_prunes_and_matches(spark, tmp_path):
    """query_ivf_index == ivf_topk on the same data, and the persisted
    read touches ONLY the probed cells' partition directories."""
    from biocache_store_spark.operators.similarity import (
        ivf_topk,
        query_ivf_index,
        write_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, path)

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    stored = query_ivf_index(spark, path, queries, k=5, nprobe=2)
    direct = ivf_topk(emb, queries, cents, k=5, nprobe=2)
    a = {(r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
         for r in stored.collect()}
    b = {(r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
         for r in direct.collect()}
    assert a == b and a

    # pruning: the probed-cell filter must become a PartitionFilter on
    # the scan (directory-level pruning), not a post-scan row filter
    probed = spark.read.parquet(path + "/cells").filter(
        F.col("cell_id").isin([0, 1])
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.index("PartitionFilters"):].splitlines()[0]
    assert "cell_id" in pf
    # and the pruned scan actually reads fewer rows than the store holds
    total = spark.read.parquet(path + "/cells").count()
    assert probed.count() < total


def test_ivf_index_append_split(spark, tmp_path):
    """mode='append' adds a new split assigned with the same centroids;
    queries then see both splits."""
    from biocache_store_spark.operators.similarity import (
        query_ivf_index,
        write_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "ivf")
    write_ivf_index(old, cents, path)
    write_ivf_index(new, cents, path, mode="append")
    n = spark.read.parquet(path + "/cells").count()
    assert n == emb.count()


def test_ivfpq_index_persist_prunes_and_matches(spark, tmp_path):
    """query_ivfpq_index == ivfpq_topk over the same encoded relation,
    the codes store reads ONLY the probed cells' partition directories,
    and mode='append' adds a split encoded with the same dims."""
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk,
        pq_encode_residual,
        query_ivfpq_index,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 20)).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    body = emb.filter(F.col("vec_id") != 0)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(body, cents, book, path)

    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    stored = query_ivfpq_index(spark, path, qvec, k=5, nprobe=2)
    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(cents.collect(), key=lambda r: r["cell_id"])
    ]
    book_rows = [
        r["embedding"] for r in sorted(book.collect(), key=lambda r: r["j"])
    ]
    direct = ivfpq_topk(
        pq_encode_residual(body.select("vec_id", "embedding"), cents, book),
        qvec, cent_rows, book_rows, k=5, nprobe=2,
    )
    a = {(r["vec_id"], r["approx_dist"], r["rank"]) for r in stored.collect()}
    b = {(r["vec_id"], r["approx_dist"], r["rank"]) for r in direct.collect()}
    assert a == b and a

    # directory pruning on the ACTUAL query plan: the probed-cell
    # filter must land in PartitionFilters below the defensive
    # dropDuplicates (an aggregate above the filter would block the
    # pushdown and scan every cell directory)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.index("PartitionFilters"):].splitlines()[0]
    assert "cell_id" in pf, pf

    # append a split encoded with the same dims; queries see both
    extra = emb.filter(F.col("vec_id") == 0)  # re-add the held-out row
    write_ivfpq_index(extra, cents, book, path, mode="append")
    assert spark.read.parquet(path + "/codes").count() == emb.count()


def test_ivfpq_index_meta_guards(spark, tmp_path):
    """The meta/ contract (ADVICE r11 #1): a query or append whose
    n_subspaces disagrees with the stored index raises instead of
    silently scoring NULL (which, pre-guard, returned k arbitrary ids);
    a legacy-style append backfills meta; dims are validated before any
    write so a failed append can't corrupt the store."""
    from biocache_store_spark.operators.similarity import (
        query_ivfpq_index,
        query_ivfpq_index_batch,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter((F.col("vec_id") >= 2) & (F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, cents, book, path, n_subspaces=8)
    meta = spark.read.parquet(path + "/meta").collect()[0]
    assert (meta["n_subspaces"], meta["dim"], meta["has_vectors"]) == (
        8, 64, False,
    )
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    with pytest.raises(ValueError, match="n_subspaces"):
        query_ivfpq_index(spark, path, qvec, n_subspaces=4)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError, match="n_subspaces"):
        query_ivfpq_index_batch(spark, path, q, n_subspaces=4)
    with pytest.raises(ValueError, match="mixed code lengths"):
        write_ivfpq_index(emb, cents, book, path, n_subspaces=4, mode="append")
    # codes store untouched by the refused append
    assert spark.read.parquet(path + "/codes").count() == emb.count()
    # rerank against an index built without store_vectors: clear refusal
    with pytest.raises(ValueError, match="raw-vector store"):
        query_ivfpq_index(spark, path, qvec, k=3, rerank_shortlist=10)

    # a PRE-meta index (meta/ deleted to simulate a legacy store) must
    # refuse store_vectors via append: the born-from-append vectors/
    # would miss the whole seed corpus and silently starve rerank joins
    import shutil

    shutil.rmtree(path + "/meta")
    with pytest.raises(ValueError, match="rebuild"):
        write_ivfpq_index(
            emb, cents, book, path, mode="append", store_vectors=True
        )
    # ...and a plain legacy append back-fills meta with
    # has_vectors=False, never True
    write_ivfpq_index(
        emb.filter(F.col("vec_id") == 0), cents, book, path, mode="append"
    )
    assert spark.read.parquet(path + "/meta").collect()[0]["has_vectors"] is False

    # a rebuild WITHOUT store_vectors must reclaim a stale vectors/
    # (the ~64x-larger artifact) left by a previous store_vectors build
    import os

    path2 = str(tmp_path / "ivfpq2")
    write_ivfpq_index(emb, cents, book, path2, store_vectors=True)
    assert os.path.isdir(path2 + "/vectors")
    write_ivfpq_index(emb, cents, book, path2, mode="overwrite")
    assert not os.path.isdir(path2 + "/vectors")
    assert spark.read.parquet(path2 + "/meta").collect()[0]["has_vectors"] is False

    # appended raw vectors are cast to the store's element type: a
    # float64 drop into a float32-seeded store must not mix schemas
    path3 = str(tmp_path / "ivfpq3")
    write_ivfpq_index(
        emb.filter(F.col("vec_id") > 0), cents, book, path3,
        store_vectors=True,
    )
    seed_type = spark.read.parquet(path3 + "/vectors").schema["embedding"].dataType
    as_double = emb.filter(F.col("vec_id") == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    write_ivfpq_index(as_double, cents, book, path3, mode="append")
    assert (
        spark.read.parquet(path3 + "/vectors").schema["embedding"].dataType
        == seed_type
    )


def test_ivfpq_index_rerank_prunes_and_matches(spark, tmp_path):
    """query_ivfpq_index(rerank_shortlist=S) over a store_vectors=True
    index == ivfpq_topk_rerank over the in-memory relations, BOTH scans
    (codes and raw vectors) prune to the probed cell directories, and
    append maintains the raw-vector store alongside the codes."""
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk_rerank,
        pq_encode_residual,
        query_ivfpq_index,
        query_ivfpq_index_batch,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 20)).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    body = emb.filter(F.col("vec_id") != 0)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(body, cents, book, path, store_vectors=True)
    assert spark.read.parquet(path + "/meta").collect()[0]["has_vectors"]

    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    stored = query_ivfpq_index(
        spark, path, qvec, k=5, nprobe=2, rerank_shortlist=20
    )
    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(cents.collect(), key=lambda r: r["cell_id"])
    ]
    book_rows = [
        r["embedding"] for r in sorted(book.collect(), key=lambda r: r["j"])
    ]
    direct = ivfpq_topk_rerank(
        pq_encode_residual(body.select("vec_id", "embedding"), cents, book),
        body.select("vec_id", "embedding"),
        qvec, cent_rows, book_rows, k=5, shortlist=20, nprobe=2,
    )
    a = {(r["vec_id"], r["cos_sim"], r["rank"]) for r in stored.collect()}
    b = {(r["vec_id"], r["cos_sim"], r["rank"]) for r in direct.collect()}
    assert a == b and len(a) == 5

    # BOTH index scans (codes for ADC, vectors for the exact re-rank)
    # keep their probed-cell filter in PartitionFilters
    plan = stored._jdf.queryExecution().executedPlan().toString()
    pruned = [
        seg.splitlines()[0]
        for seg in plan.split("PartitionFilters")[1:]
    ]
    with_cell = [p for p in pruned if "cell_id" in p]
    assert len(with_cell) >= 2, plan

    # append keeps the raw-vector store in lockstep with the codes
    extra = emb.filter(F.col("vec_id") == 0)
    write_ivfpq_index(extra, cents, book, path, mode="append")
    assert spark.read.parquet(path + "/codes").count() == emb.count()
    assert spark.read.parquet(path + "/vectors").count() == emb.count()

    # batch rerank on the persisted index: k rows per query, exact
    # cosine ordering per query, self excluded
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    outb = query_ivfpq_index_batch(
        spark, path, queries, k=5, nprobe=2, rerank_shortlist=20
    ).collect()
    assert len(outb) == 15
    assert all(r["vec_id"] != r["query_id"] for r in outb)


def test_ivfpq_delete_and_vacuum(spark, tmp_path):
    """Tombstone deletion (the ANN tier's member of the delete family):
    deleted ids vanish from ADC, re-ranked and batch queries immediately
    without touching the codes store; vacuum physically rewrites both
    stores minus the tombstones and clears deleted/, after which query
    results are unchanged; an overwrite rebuild resets tombstones."""
    import os

    from biocache_store_spark.operators.similarity import (
        delete_from_ivfpq_index,
        query_ivfpq_index,
        query_ivfpq_index_batch,
        vacuum_ivfpq_index,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 20)).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    body = emb.filter(F.col("vec_id") != 0)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(body, cents, book, path, store_vectors=True)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]

    before = query_ivfpq_index(spark, path, qvec, k=5, nprobe=4).collect()
    victims = [r["vec_id"] for r in sorted(before, key=lambda r: r["rank"])][:2]
    delete_from_ivfpq_index(
        spark, path,
        spark.createDataFrame([(v,) for v in victims], "vec_id long"),
    )
    for kwargs in ({}, {"rerank_shortlist": 20}):
        got = {
            r["vec_id"]
            for r in query_ivfpq_index(
                spark, path, qvec, k=5, nprobe=4, **kwargs
            ).collect()
        }
        assert not got & set(victims), kwargs
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch_ids = {
        r["vec_id"]
        for r in query_ivfpq_index_batch(
            spark, path, queries, k=5, nprobe=4
        ).collect()
    }
    assert not batch_ids & set(victims)

    tombstoned = query_ivfpq_index(spark, path, qvec, k=5, nprobe=4).collect()
    n = body.count()
    removed = vacuum_ivfpq_index(spark, path)
    assert removed == {"removed_codes": 2, "removed_vectors": 2}
    assert spark.read.parquet(path + "/codes").count() == n - 2
    assert spark.read.parquet(path + "/vectors").count() == n - 2
    assert not os.path.isdir(path + "/deleted")
    after = query_ivfpq_index(spark, path, qvec, k=5, nprobe=4).collect()
    assert {tuple(r) for r in after} == {tuple(r) for r in tombstoned}
    # idempotent: vacuuming a clean index is a no-op
    assert vacuum_ivfpq_index(spark, path) == {
        "removed_codes": 0, "removed_vectors": 0,
    }

    # an overwrite rebuild clears stale tombstones (they refer to the
    # previous corpus)
    delete_from_ivfpq_index(
        spark, path, spark.createDataFrame([(1,)], "vec_id long")
    )
    write_ivfpq_index(body, cents, book, path, store_vectors=True)
    assert not os.path.isdir(path + "/deleted")
    assert 1 in {
        r["vec_id"]
        for r in query_ivfpq_index(spark, path, qvec, k=n, nprobe=4).collect()
    }

    # vacuuming the index EMPTY is refused (an empty partitioned store
    # is unreadable; rebuild instead) and leaves everything intact
    delete_from_ivfpq_index(spark, path, body.select("vec_id"))
    with pytest.raises(ValueError, match="rebuild"):
        vacuum_ivfpq_index(spark, path)
    assert spark.read.parquet(path + "/codes").count() == n
    assert os.path.isdir(path + "/deleted")  # tombstones NOT cleared
    # a leftover __vacuum sibling from a crashed attempt never blocks a
    # retry (the staging write overwrites it)
    os.makedirs(path + "/codes__vacuum", exist_ok=True)
    delete_from_ivfpq_index(  # shrink the tombstone set to one id
        spark, path,
        spark.createDataFrame([(2,)], "vec_id long"),
    )
    # deleted/ currently holds ALL ids + id 2 -> clear and re-tombstone
    import shutil

    shutil.rmtree(path + "/deleted")
    delete_from_ivfpq_index(
        spark, path, spark.createDataFrame([(2,)], "vec_id long")
    )
    assert vacuum_ivfpq_index(spark, path) == {
        "removed_codes": 1, "removed_vectors": 1,
    }


def test_component_representatives_string_ids(spark):
    """String ids must work (no numeric negation) with the same
    lowest-id-on-ties rule."""
    from biocache_store_spark.operators.components import (
        component_representatives,
    )

    comp = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a")], "node string, component string"
    )
    scores = spark.createDataFrame(
        [("a", 0.5), ("b", 0.9), ("c", 0.9)], "doc_id string, quality_score double"
    )
    [row] = component_representatives(comp, scores).collect()
    assert row["rep_doc_id"] == "b"  # top score, lowest id among ties
    assert row["cluster_size"] == 3


def test_query_ivf_index_excludes_and_dedups(spark, tmp_path):
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.similarity import (
        query_ivf_index,
        write_ivf_index,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cents = emb.limit(1).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, path)
    # simulate a crash-replayed double append of vec 1
    write_ivf_index(emb.filter(F.col("vec_id") == 1), cents, path, mode="append")

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = query_ivf_index(spark, path, q, k=2, nprobe=1).collect()
    ids = [r["vec_id"] for r in out]
    assert ids.count(1) == 1  # dedup-on-read: doubled vector fills one slot

    out2 = query_ivf_index(
        spark, path, q, k=2, nprobe=1,
        exclude_ids=spark.createDataFrame([(1,)], "vec_id long"),
    ).collect()
    assert 1 not in [r["vec_id"] for r in out2]


def test_ivf_index_delete_and_vacuum(spark, tmp_path):
    """The IVF index honors the same delete contract as its IVFADC
    sibling: tombstoned ids vanish from query_ivf_index immediately,
    vacuum_ivf_index physically removes them from cells/, and an
    overwrite rebuild clears stale tombstones."""
    import os

    from pyspark.sql import functions as F

    from biocache_store_spark.operators.similarity import (
        delete_from_ivf_index,
        query_ivf_index,
        vacuum_ivf_index,
        write_ivf_index,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.8, 0.2]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cents = emb.limit(1).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, path)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert 1 in {
        r["vec_id"] for r in query_ivf_index(spark, path, q, k=3).collect()
    }
    delete_from_ivf_index(
        spark, path, spark.createDataFrame([(1,)], "vec_id long")
    )
    assert 1 not in {
        r["vec_id"] for r in query_ivf_index(spark, path, q, k=3).collect()
    }
    assert vacuum_ivf_index(spark, path) == {"removed_cells": 1}
    assert spark.read.parquet(path + "/cells").count() == 3
    assert not os.path.isdir(path + "/deleted")
    assert 1 not in {
        r["vec_id"] for r in query_ivf_index(spark, path, q, k=3).collect()
    }
    # overwrite rebuild clears stale tombstones
    delete_from_ivf_index(
        spark, path, spark.createDataFrame([(2,)], "vec_id long")
    )
    write_ivf_index(emb, cents, path)
    assert not os.path.isdir(path + "/deleted")
    assert 2 in {
        r["vec_id"] for r in query_ivf_index(spark, path, q, k=3).collect()
    }


def test_banded_keys_rejects_non_dividing_bands(spark):
    from biocache_store_spark.operators.minhash import banded_keys, signatures

    sig = signatures(spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"))
    with pytest.raises(ValueError, match="divide"):
        banded_keys(sig, num_hashes=12, bands=16)
    with pytest.raises(ValueError, match="divide"):
        banded_keys(sig, num_hashes=12, bands=5)


def test_lsh_index_rejects_mismatched_params(spark, tmp_path):
    from biocache_store_spark.operators.minhash import (
        probe_lsh_index,
        write_lsh_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    path = str(tmp_path / "lsh")
    write_lsh_index(docs, path, n=3)
    with pytest.raises(ValueError, match="hash-family"):
        probe_lsh_index(spark, path, docs, n=5)
    with pytest.raises(ValueError, match="hash-family"):
        write_lsh_index(docs, path, n=5, mode="append")


def test_lsh_index_rejects_legacy_index_without_meta(spark, tmp_path):
    """An index lacking the meta dataset (pre-meta layout) must FAIL the
    probe by default — its hash-family params cannot be validated and a
    silent mismatch returns garbage pairs. allow_legacy=True accepts it
    once and backfills meta with the caller's params, after which a
    mismatched probe is caught like any other."""
    import shutil

    from biocache_store_spark.operators.minhash import (
        probe_lsh_index,
        write_lsh_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    path = str(tmp_path / "lsh_legacy")
    write_lsh_index(docs, path, n=3)
    shutil.rmtree(path + "/meta")  # simulate a pre-meta index layout
    with pytest.raises(ValueError, match="allow_legacy"):
        probe_lsh_index(spark, path, docs, n=3)
    with pytest.raises(ValueError, match="allow_legacy"):
        write_lsh_index(docs, path, n=3, mode="append")
    # the escape hatch accepts AND backfills meta...
    assert probe_lsh_index(spark, path, docs, n=3, allow_legacy=True).count() >= 0
    # ...so a later mismatched probe is validated against the backfill
    with pytest.raises(ValueError, match="hash-family"):
        probe_lsh_index(spark, path, docs, n=5)


def test_cms_bucket_hex_validated_and_probe_rows_preserved(spark):
    from biocache_store_spark.operators.sketch import (
        count_min_sketch,
        estimate_counts,
    )

    tok = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "term string"
    )
    with pytest.raises(ValueError, match="bucket_hex"):
        count_min_sketch(tok, "term", bucket_hex=10)
    sketch = count_min_sketch(tok, "term")
    # duplicate probe rows must stay distinct rows (no groupBy collapse)
    probes = spark.createDataFrame([("a",), ("a",)], "term string")
    rows = estimate_counts(sketch, probes, "term").collect()
    assert len(rows) == 2 and all(r["cms_est"] >= 2 for r in rows)
    # probe column named like sketch internals must not collide
    probes2 = spark.createDataFrame([("a", 9)], "term string, cnt int")
    [r2] = estimate_counts(sketch, probes2, "term").collect()
    assert r2["cms_est"] >= 2 and r2["cnt"] == 9


def test_component_representatives_all_null_scores_kept(spark):
    from biocache_store_spark.operators.components import (
        component_representatives,
    )

    comp = spark.createDataFrame(
        [("x", "x"), ("y", "x")], "node string, component string"
    )
    scores = spark.createDataFrame(
        [("x", None), ("y", None)], "doc_id string, quality_score double"
    )
    [row] = component_representatives(comp, scores).collect()
    assert row["rep_doc_id"] == "x" and row["cluster_size"] == 2


def test_simhash_guards(spark, docs):
    from biocache_store_spark.operators.simhash import (
        simhash,
        simhash_near_duplicates,
    )

    with pytest.raises(ValueError, match="divide"):
        simhash_near_duplicates(docs, bands=40)
    with pytest.raises(ValueError, match="nibble"):
        simhash(docs, bits=64)


def test_el_binning_boundary_coordinates(spark):
    """A coordinate exactly on a 0.1-degree cell boundary must bin into
    ITS cell, not one cell low (151.2/0.1 floats to 1511.9999...)."""
    from biocache_store_spark.operators.sampling import sample_el_layers

    points = spark.createDataFrame(
        [(-33.9, 151.2)], "lat double, lon double"
    )
    grid = spark.createDataFrame(
        [("elx", 7.0, -33.9, 151.2)],
        "layerID string, value double, lat_bin double, lon_bin double",
    )
    [row] = sample_el_layers(points, grid, resolution=0.1).collect()
    assert row["el"] == {"elx": 7.0}


def test_wkt_holes_rejected_cleanly(spark):
    from biocache_store_spark.operators.sampling import parse_wkt_polygon

    with pytest.raises(ValueError, match="simple POLYGON"):
        parse_wkt_polygon(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 3, 2 3, 2 2))"
        )


def test_unpack_associated_media_leading_delimiter(spark):
    from biocache_store_spark.operators.multimodal import unpack_associated_media

    df = spark.createDataFrame(
        [("|http://a.jpg|http://b.jpg",), ("a;b",)], "s string"
    )
    out = [r["m"] for r in df.select(
        unpack_associated_media(F.col("s")).alias("m")).collect()]
    assert out[0] == ["http://a.jpg", "http://b.jpg"]
    assert out[1] == ["a", "b"]


def test_dedup_media_null_content_rows_kept(spark):
    from biocache_store_spark.operators.multimodal import MEDIA_SCHEMA, dedup_media

    rows = [
        ("m1", "r1", "image", "image/jpeg", None, (None, None, None, None, None, None)),
        ("m2", "r2", "image", "image/jpeg", None, (None, None, None, None, None, None)),
        ("m3", "r3", "image", "image/jpeg", b"x", (None, None, None, None, None, None)),
    ]
    out = {r["media_id"] for r in
           dedup_media(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    assert out == {"m1", "m2", "m3"}  # failed fetches keep per-record rows


def test_frame_sample_zero_duration_no_phantom(spark):
    from biocache_store_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        frame_sample_plan,
    )

    rows = [("v0", "r1", "video", "video/mp4", b"",
             (None, None, None, 0, None, None))]
    assert frame_sample_plan(
        spark.createDataFrame(rows, MEDIA_SCHEMA)
    ).count() == 0


def test_media_maintenance_round_trip(spark, tmp_path):
    """migrate-media -> media_references -> load_media_references round
    trip (tool/MigrateMedia.scala, tool/LoadMediaReferences.scala): the
    first sweep fetches every associatedMedia file, the second sweep
    against the resulting store fetches nothing, and the reference table
    rebuilt from the store is deterministic and buckets ids by mime."""
    from biocache_store_spark.operators.multimodal import (
        load_media_references,
        media_references,
        migrate_media,
    )

    img = tmp_path / "a.jpg"
    img.write_bytes(b"\xff\xd8imgbytes")
    snd = tmp_path / "b.mp3"
    snd.write_bytes(b"ID3soundbytes")
    img2 = tmp_path / "c.png"
    img2.write_bytes(b"\x89PNGother")
    records = spark.createDataFrame(
        [("r1", f"file://{img};file://{snd}"),
         ("r2", f"file://{img2}"),
         ("r3", None)],
        "record_id string, associatedMedia string",
    )

    store = migrate_media(records, None).filter("fetch_ok").cache()
    rows = {(r["record_id"], r["url"]): r for r in store.collect()}
    assert len(rows) == 3
    assert rows[("r1", f"file://{img}")]["mime_type"] == "image/jpeg"
    assert rows[("r1", f"file://{snd}")]["mime_type"] == "audio/mpeg"
    assert all(r["media_id"] is not None for r in rows.values())

    # idempotent: a second sweep against the store has nothing to fetch
    assert migrate_media(records, store).count() == 0

    refs1 = media_references(store).collect()
    refs2 = media_references(store.repartition(7)).collect()
    assert sorted(map(str, refs1)) == sorted(map(str, refs2))  # deterministic

    out = {
        r["record_id"]: r
        for r in load_media_references(records, media_references(store)).collect()
    }
    jpg_id = rows[("r1", f"file://{img}")]["media_id"]
    mp3_id = rows[("r1", f"file://{snd}")]["media_id"]
    assert out["r1"]["images"] == [jpg_id]
    assert out["r1"]["sounds"] == [mp3_id]
    assert out["r2"]["images"] == [rows[("r2", f"file://{img2}")]["media_id"]]
    assert out["r3"]["images"] == [] and out["r3"]["sounds"] == []


def test_batch_embed_deterministic_unit_vectors(spark):
    """batch_embed: md5-derived fake embedder is partitioning-independent,
    unit-norm, identical texts -> identical vectors; the output column is
    the embeddings-table shape the similarity operators consume."""
    import math

    from biocache_store_spark.operators.inference import batch_embed

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma"), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: list(r["embedding"]) for r in batch_embed(docs).collect()}
    out2 = {
        r["doc_id"]: list(r["embedding"])
        for r in batch_embed(docs.repartition(3)).collect()
    }
    assert out == out2
    assert out[1] == out[2] and out[1] != out[3]
    assert len(out[1]) == 8
    assert math.isclose(sum(v * v for v in out[1]), 1.0, rel_tol=1e-5)
    assert out[4] is not None  # None text embeds the empty string


def test_batch_embed_feeds_similarity_family(spark):
    """End-to-end: text -> batch_embed -> embedding-cosine near-dup.
    Exact duplicate texts are cosine-1 near-dups of each other."""
    from biocache_store_spark.operators.inference import batch_embed
    from biocache_store_spark.operators.similarity import cosine_near_duplicates

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "completely different content here"), (4, "yet another document")],
        "doc_id long, text string",
    )
    emb = batch_embed(docs, dim=16).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_duplicates(emb, dim=16, threshold=0.99).collect()
    }
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_sentence_transformer_gated(spark):
    """The real-model loader raises the import gate when the package is
    absent (same convention as the Pillow decode gate)."""
    import pytest as _pytest

    from biocache_store_spark.operators.inference import (
        sentence_transformer_model,
    )

    try:
        import sentence_transformers  # type: ignore # noqa: F401
    except ImportError:
        with _pytest.raises(NotImplementedError, match="sentence-transformers"):
            sentence_transformer_model()()


def _has_sentence_transformers() -> bool:
    try:
        import sentence_transformers  # type: ignore # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_sentence_transformers(),
    reason="sentence-transformers not installed (opt-in real-model path)",
)
def test_real_model_embed_dedup_pipeline(spark):
    """Opt-in executed evidence for the REAL-model path: a tiny corpus
    runs batch_embed(sentence_transformer_model) -> cosine_near_duplicates
    -> kmeans_train -> semantic_dedup end to end. Paraphrase pairs must
    out-score unrelated pairs and identical texts must dedup; the fake
    embedder covers the same plumbing deterministically in sandboxes
    without the package."""
    from biocache_store_spark.operators.inference import (
        batch_embed,
        sentence_transformer_model,
    )
    from biocache_store_spark.operators.similarity import (
        cosine_near_duplicates,
        kmeans_train,
        semantic_dedup,
    )

    docs = spark.createDataFrame(
        [
            (1, "a cat sits on the mat"),
            (2, "a cat sits on the mat"),  # exact duplicate of 1
            (3, "the stock market fell sharply today"),
            (4, "equity prices dropped steeply this afternoon"),  # ~3
            (5, "photosynthesis converts sunlight into energy"),
        ],
        "doc_id long, text string",
    )
    emb = batch_embed(
        docs, model_loader=sentence_transformer_model(), dim=384
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    emb = emb.persist()
    dim = len(emb.first()["embedding"])
    # identical texts -> identical vectors -> same LSH bucket at any
    # plane count; the exact-dup pair must survive the bucketed operator
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_near_duplicates(emb, dim=dim, threshold=0.95).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.99
    # semantic sanity of the real model, checked driver-side (5 vectors):
    # the paraphrase pair is closer than any unrelated pair
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    cos = lambda a, b: sum(x * y for x, y in zip(a, b))  # noqa: E731 (unit vectors)
    sims = {
        (i, j): cos(vecs[i], vecs[j])
        for i in vecs
        for j in vecs
        if i < j
    }
    assert sims[(3, 4)] > max(
        s for p, s in sims.items() if p not in ((1, 2), (3, 4))
    )
    cents = kmeans_train(emb, k=2, iters=1)
    dedup = {r["vec_id"]: r["keep"] for r in semantic_dedup(emb, cents, 0.99).collect()}
    assert dedup[1] is True and dedup[2] is False  # greedy-by-id prune
    emb.unpersist()


def test_histogram_threshold_covers_fraction_and_clamps(spark):
    """histogram_threshold (operators/sketch.py): the derived edge keeps
    AT LEAST the requested fraction, over-selecting by at most one bin;
    out-of-range values clamp into the edge bins; the result is
    partitioning-independent; bad parameters raise."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from biocache_store_spark.operators.sketch import histogram_threshold

    # values 0.005, 0.015, ..., 0.995 — one per bin at n_bins=100
    vals = spark.range(100).select(
        ((F.col("id").cast("double") + F.lit(0.5)) / 100.0).alias("importance")
    )
    th = histogram_threshold(vals, 0.25, 0.0, 1.0, n_bins=100).collect()[0]
    assert th["total"] == 100
    assert th["covered"] == 25  # exactly ceil(0.25*100) at one-per-bin
    kept = vals.filter(F.col("importance") >= th["threshold"]).count()
    assert kept == 25
    # partitioning independence
    th7 = histogram_threshold(
        vals.repartition(7), 0.25, 0.0, 1.0, n_bins=100
    ).collect()[0]
    assert th7["threshold"] == th["threshold"]

    # clamping: values >= hi land in the top bin and are always kept
    spread = spark.createDataFrame(
        [(99.0,), (5.0,), (0.5,), (-3.0,)], "importance double"
    )
    th2 = histogram_threshold(spread, 0.5, 0.0, 1.0, n_bins=10).collect()[0]
    kept2 = {
        r["importance"]
        for r in spread.filter(F.col("importance") >= th2["threshold"]).collect()
    }
    assert {99.0, 5.0} <= kept2 and -3.0 not in kept2

    with _pytest.raises(ValueError):
        histogram_threshold(vals, 0.0, 0.0, 1.0)
    with _pytest.raises(ValueError):
        histogram_threshold(vals, 0.5, 1.0, 1.0)


def test_histogram_threshold_bottom_bin_refinement(spark):
    """When the cut lands in the BOTTOM bin, one refinement pass
    re-histograms the bin-0 rows over [their min, lo+w) and cuts inside
    it — the threshold stays finite, discriminates below-lo values, and
    keeps at least the requested fraction; refine=0 reproduces the
    legacy -inf keep-everything plan."""
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.sketch import histogram_threshold

    # 100 values spread over [-0.05, 0.05): with grid [0, 1) x 10 bins
    # ALL land in bin 0 (below-lo clamps + sub-width values), so any cut
    # lands in the bottom bin
    vals = spark.range(100).select(
        (F.col("id").cast("double") / 1000.0 - F.lit(0.05)).alias("importance")
    )
    th = histogram_threshold(vals, 0.25, 0.0, 1.0, n_bins=10).collect()[0]
    assert th["total"] == 100
    assert th["threshold"] != float("-inf")
    kept = vals.filter(F.col("importance") >= th["threshold"]).count()
    assert kept >= 25  # at-least guarantee survives the refinement
    # over-select bounded by one REFINED bin's worth (values span ~2/3 of
    # the refined grid -> ~15 per bin), vs keep-everything's 100
    assert kept <= 40
    # the refined threshold may legitimately sit below lo: the below-lo
    # rows were counted toward the fraction and remain selectable
    assert th["threshold"] < 1.0 / 10

    # legacy single-plan shape keeps the documented -inf degeneracy
    th0 = histogram_threshold(
        vals, 0.25, 0.0, 1.0, n_bins=10, refine=0
    ).collect()[0]
    assert th0["threshold"] == float("-inf")

    # degenerate refinement: every bin-0 value identical -> the bin
    # cannot be subdivided; threshold = that exact value (finite)
    same = spark.createDataFrame([(0.01,)] * 5 + [(0.9,)], "importance double")
    th_same = histogram_threshold(same, 0.9, 0.0, 1.0, n_bins=10).collect()[0]
    assert th_same["threshold"] == 0.01

    # a -inf value clamps into bin 0: the refinement must NOT anchor its
    # grid there (every edge would be NaN and 'value >= NaN' selects
    # NOTHING) — it falls back to keep-everything, the legacy semantics
    with_inf = spark.createDataFrame(
        [(float("-inf"),)] + [(v / 1000.0,) for v in range(50)],
        "importance double",
    )
    th_inf = histogram_threshold(with_inf, 0.9, 0.0, 1.0, n_bins=10).collect()[0]
    assert th_inf["threshold"] == float("-inf")
    kept_inf = with_inf.filter(
        F.col("importance") >= th_inf["threshold"]
    ).count()
    assert kept_inf == 51  # nothing silently dropped

    # NULL values clamp into bin 0 (greatest(NULL, 0) = 0 — the grid
    # expression's documented behavior, identical in the legacy plan);
    # when they dominate the cut the refinement finds no finite minimum
    # and falls back to keep-everything, matching refine=0 exactly
    mostly_null = spark.createDataFrame(
        [(None,)] * 6 + [(0.35,)] * 4, "importance double"
    )
    th_null = histogram_threshold(mostly_null, 0.5, 0.0, 1.0, n_bins=10)
    th_null0 = histogram_threshold(
        mostly_null, 0.5, 0.0, 1.0, n_bins=10, refine=0
    )
    assert (
        th_null.collect()[0]["threshold"]
        == th_null0.collect()[0]["threshold"]
        == float("-inf")
    )


def test_semantic_decontamination_cross_set_only(spark):
    """semantic_decontamination (operators/similarity.py): reports the
    closest same-bucket EVAL neighbor per training vector — never a
    train-train pair — flags cosine >= threshold, omits training vectors
    with no same-bucket eval candidate, and drops eval buckets over the
    cap."""
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.similarity import (
        semantic_decontamination,
    )

    # 2-d vectors: bucket = sign pattern vs md5-seeded planes; vectors
    # on opposite sides of every plane never share a bucket
    train = spark.createDataFrame(
        [(1, [1.0, 0.01]), (2, [0.99, 0.0]), (3, [-1.0, -0.01])],
        "vec_id long, embedding array<float>",
    )
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r
        for r in semantic_decontamination(
            train, ev, dim=2, threshold=0.99, n_planes=4
        ).collect()
    }
    # ids 1 and 2 point the same way as the eval vectors; 3 is opposite
    assert set(out) <= {1, 2}
    for r in out.values():
        assert r["eval_id"] in (100, 101)  # never a train id
        assert r["contaminated"] == (r["cos_sim"] >= 0.99)
    assert out[2]["eval_id"] == 100 and out[2]["contaminated"]

    # eval-side cap: both eval vectors point the same way, so they share
    # a bucket; with max_bucket=1 that bucket is dropped and NO training
    # vector has any candidate left
    from biocache_store_spark.operators.similarity import (
        _bucket_expr,
        hyperplanes,
    )

    ev_buckets = {
        r["b"]
        for r in ev.select(
            _bucket_expr(F.col("embedding"), hyperplanes(2, 4)).alias("b")
        ).collect()
    }
    assert len(ev_buckets) == 1  # fixture premise (same 4 planes as below)
    dropped = semantic_decontamination(
        train, ev, dim=2, threshold=0.5, n_planes=4, max_bucket=1
    ).collect()
    assert dropped == []


def _has_pillow() -> bool:
    try:
        import PIL  # type: ignore # noqa: F401

        return True
    except ImportError:
        return False


def _make_png(width: int, height: int, rgb=(200, 30, 30)) -> bytes:
    """A real, valid RGB PNG built with stdlib only (zlib + struct), so
    the opt-in Pillow test does not need Pillow to CREATE its fixture."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(rgb) * width  # filter 0 + RGB pixels
    idat = zlib.compress(row * height)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


@pytest.mark.skipif(
    not _has_pillow(),
    reason="Pillow not installed (opt-in real-decode path)",
)
def test_real_pillow_decode_and_thumbnail(spark):
    """Opt-in executed evidence for the REAL media decoder (the
    Thumbnailer.scala JAI/ImageIO analog): decode_media(real_decode=True)
    must read the actual pixel dimensions and colors out of a genuine
    PNG, and thumbnail_media must emit really-resized JPEG renditions
    whose bytes differ from the placeholder path."""
    from biocache_store_spark.operators.multimodal import (
        decode_media,
        thumbnail_media,
    )

    png = _make_png(640, 480, rgb=(200, 30, 30))
    media = spark.createDataFrame(
        [("m1", "r1", "image", "image/png", png)],
        "media_id string, record_id string, media_type string,"
        " mime_type string, content binary",
    ).withColumn(
        "metadata",
        F.struct(
            F.lit(None).cast("string").alias("url"),
            F.lit(640).cast("int").alias("width"),
            F.lit(480).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("string").alias("creator"),
            F.lit(None).cast("string").alias("license"),
        ),
    )
    feats = decode_media(media, real_decode=True).collect()[0]["features"]
    # [w/1e4, h/1e4, mean R, mean G, mean B, aspect, ...]
    assert abs(feats[0] - 0.064) < 1e-6 and abs(feats[1] - 0.048) < 1e-6
    assert feats[2] > 0.7 and feats[3] < 0.2 and feats[4] < 0.2  # red image
    assert abs(feats[5] - 640 / 480) < 1e-6

    thumbs = {r["size_name"]: r for r in thumbnail_media(media).collect()}
    assert thumbs["thumb"]["real_resize"] and thumbs["thumb"]["resized"]
    assert (thumbs["thumb"]["width"], thumbs["thumb"]["height"]) == (100, 75)
    # the payload is a real JPEG, not the md5 placeholder
    assert bytes(thumbs["thumb"]["content"])[:2] == b"\xff\xd8"
    # the 'large' edge (650) exceeds both dims: copy-unchanged branch
    assert not thumbs["large"]["resized"]
    assert bytes(thumbs["large"]["content"]) == png


def test_simhash_packed_hamming_matches_string_hamming(spark):
    """The packed-long Hamming path (conv base-2 + bit_count(xor), the
    round-13 candidate-tail rewrite) must equal per-character string
    Hamming for arbitrary fingerprints, including all-ones (sign/overflow
    guard for the 32-bit value in a long)."""
    from pyspark.sql import functions as F

    fps = [
        ("0" * 32, "1" * 32, 32),
        ("1" * 32, "1" * 32, 0),
        ("10" * 16, "01" * 16, 32),
        ("1" + "0" * 31, "0" * 32, 1),
        ("11110000" * 4, "11110001" * 4, 4),
    ]
    df = spark.createDataFrame(fps, "a string, b string, want int")
    got = df.select(
        "want",
        F.bit_count(
            F.conv(F.col("a"), 2, 10)
            .cast("long")
            .bitwiseXOR(F.conv(F.col("b"), 2, 10).cast("long"))
        ).alias("got"),
    ).collect()
    assert all(r["got"] == r["want"] for r in got)
