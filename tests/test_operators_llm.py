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
