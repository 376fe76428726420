"""Multimodal (image/audio/video) column plumbing.

Generalizes the reference's media pipeline (load/MediaStore.scala:34-171:
validate/download/dedupe media per record; load/Thumbnailer.scala: resize)
to the columns a training-data pipeline carries: media as opaque `binary`
content plus a typed metadata struct, with decode / feature-extract /
resize / frame-sample as Arrow-batched mapInPandas stages.

The Spark-side plumbing (schema, batch shape, partitioning, UDF signatures,
content hashing / dedup) is real and tested. The actual byte decoding needs
image/audio libraries that are not in this environment, so `decode_media`
uses a deterministic fake decoder by default and raises NotImplementedError
if a real decode is requested — swap `_decode_bytes` for a Pillow/ffmpeg
implementation in an environment that has them.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("mime_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("url", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("creator", T.StringType()),
                    T.StructField("license", T.StringType()),
                ]
            ),
        ),
    ]
)

_FEATURE_DIM = 8


def _pillow_or_none():
    """Executor-side optional import: Pillow when the environment has it,
    None otherwise — callers fall back to the deterministic fake path.
    Import is attempted INSIDE the UDF so the decision is made where the
    decode actually runs, not on the driver."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _pillow_decode_features(image_mod, content: bytes):
    """Real image decode via Pillow: an _FEATURE_DIM-float vector of
    [w/1e4, h/1e4, mean R, mean G, mean B, aspect, coverage of the 4x4
    grayscale grid's first two cells] — deterministic for a given image."""
    import io

    img = image_mod.open(io.BytesIO(content)).convert("RGB")
    w, h = img.size
    small = img.resize((4, 4))
    px = list(small.getdata())
    means = [sum(p[i] for p in px) / (len(px) * 255.0) for i in range(3)]
    return [
        min(w / 1e4, 1.0),
        min(h / 1e4, 1.0),
        *means,
        w / h if h else 0.0,
        px[0][0] / 255.0,
        px[5][0] / 255.0,
    ]


def _decode_bytes(content: bytes, media_type: str, real_decode: bool):
    """Decode one media payload to an _FEATURE_DIM-float feature vector.

    Default: deterministic fake from the content digest — byte-stable,
    library-free, what the oracle-checked queries pin. `real_decode=True`
    uses Pillow when importable (images only); environments without image
    libraries raise NotImplementedError, same gating as before
    (reference: load/Thumbnailer.scala:77-130 decodes with JAI/ImageIO)."""
    if real_decode:
        if media_type != "image":
            # no audio/video decoder exists in ANY supported configuration;
            # silently returning fake features for an explicit real-decode
            # request would be indistinguishable from a real result
            raise NotImplementedError(
                f"real decoding of media_type={media_type!r} is not "
                "implemented (only images, via Pillow when importable)"
            )
        image_mod = _pillow_or_none()
        if image_mod is None:
            raise NotImplementedError(
                "real media decoding requires image libraries not present "
                "in this environment; only the deterministic fake decoder "
                "is available"
            )
        if content:
            try:
                return _pillow_decode_features(image_mod, content)
            except Exception:
                pass  # undecodable bytes: reference logs and skips — fake below
    digest = hashlib.sha256(content or b"").digest()
    return [b / 255.0 for b in digest[:_FEATURE_DIM]]


# Mime-type resolution (model/Multimedia.scala:17-54 + vocab/MimeType.scala
# over the IANA registry file). The reference scans its vocabulary in file
# order — audio, image, multipart, text, video — which is what resolves
# subtype collisions like "ogg" to the audio row; this list keeps that
# block order over the subset of rows biodiversity media actually uses.
# Both the canonical ("image/jpeg") and the bare subtype ("jpeg") act as
# variants after the vocab normalization (strip non-alphanumerics, lower).
_MIME_CANONICALS: tuple[str, ...] = (
    "audio/mp3",
    "audio/basic",
    "audio/ogg",
    "audio/opus",
    "audio/vorbis",
    "image/gif",
    "image/jpeg",
    "image/png",
    "image/tiff",
    "image/svg+xml",
    "text/csv",
    "text/html",
    "text/plain",
    "text/xml",
    "video/mp4",
    "video/mpeg",
    "video/ogg",
    "video/quicktime",
    "video/raw",
)

# Multimedia.EXTENSION_MAP — deliberately tiny in the reference too; any
# other extension (or no identifier at all) falls back to "image/*".
_MIME_EXTENSION_MAP = {
    ".jpg": "image/jpeg",
    ".gif": "image/gif",
    ".png": "image/png",
}

_EXTENSION_RE = re.compile(r"(\.[0-9A-Za-z\-_]+)(\?.*)?$")


def _norm(value: str) -> str:
    # the shared vocab normalization (parsers/vocab.py) — one rule, not
    # a drifting private copy
    from biocache_store_spark.parsers.vocab import normalize

    return normalize(value)


# normalized variant -> canonical, built once; setdefault keeps the FIRST
# writer so subtype collisions resolve in the reference's block order
_MIME_LOOKUP: dict[str, str] = {}
for _canonical in _MIME_CANONICALS:
    _MIME_LOOKUP.setdefault(_norm(_canonical), _canonical)
    _MIME_LOOKUP.setdefault(_norm(_canonical.split("/", 1)[1]), _canonical)


def _match_mime_vocab(value: str) -> str | None:
    norm = _norm(value)
    return _MIME_LOOKUP.get(norm) if norm else None


def find_mime_type(format: str | None = None, identifier: str | None = None) -> str:
    """Multimedia.findMimeType: an explicit format wins; otherwise the
    identifier's extension (query strings stripped, case-insensitive) maps
    through the small extension table; otherwise assume some sort of image
    ("image/*"). The result is canonicalized through the mime vocabulary
    when it matches; unrecognized formats pass through verbatim
    (MultimediaTest.scala cases)."""
    if format is not None:
        resolved = format
    elif identifier is not None:
        m = _EXTENSION_RE.search(identifier)
        resolved = (
            _MIME_EXTENSION_MAP.get(m.group(1).lower(), "image/*")
            if m
            else "image/*"
        )
    else:
        resolved = "image/*"
    return _match_mime_vocab(resolved) or resolved


def add_content_hash(media_df: DataFrame) -> DataFrame:
    """MD5 content dedup key (MediaStore.scala:234-285)."""
    return media_df.withColumn("content_hash", F.md5(F.col("content")))


def add_content_sha1(media_df: DataFrame) -> DataFrame:
    """SHA-1 content key — the hash the REMOTE media store is searched by
    (`contentsha1hash`, MediaStore.scala:241-245, via
    util/FileHelper.scala sha1Hash). Kept alongside the MD5 dedup key so
    an export can address images already held by a remote store."""
    return media_df.withColumn("content_sha1", F.sha1(F.col("content")))


def sha1_hex(data: bytes) -> str:
    """Driver-side twin of add_content_sha1 for single payloads
    (FileHelper.scala file2helper().sha1Hash())."""
    import hashlib

    return hashlib.sha1(data).hexdigest()


def dedup_media(media_df: DataFrame) -> DataFrame:
    """Keep one row per distinct content hash (min media_id wins —
    deterministic first-wins, as in the dedup representative rule).

    NULL-content rows (e.g. fetch_media failures, whose docstring routes
    them here) keep per-record identity: md5(NULL) is NULL and a naive
    hash partition would collapse every failed fetch into ONE surviving
    row, silently dropping the rest."""
    from pyspark.sql.window import Window

    hashed = add_content_hash(media_df).withColumn(
        "content_hash",
        F.coalesce(
            F.col("content_hash"),
            F.concat(F.lit("__null__"), F.col("media_id").cast("string")),
        ),
    )
    w = Window.partitionBy("content_hash").orderBy("media_id")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def decode_media(media_df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched decode stage: adds `features array<double>` and
    `content_length`. One mapInPandas pass; rows never leave the executor."""
    from biocache_store_spark.util import (
        ensure_min_parallelism,
        ensure_package_on_workers,
    )

    ensure_package_on_workers(media_df.sparkSession)
    media_df = ensure_min_parallelism(media_df)
    schema = T.StructType(
        list(media_df.schema.fields)
        + [
            T.StructField("content_length", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("batch_size", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["content_length"] = [
                len(c) if c is not None else 0 for c in pdf["content"]
            ]
            out["features"] = [
                _decode_bytes(c, t, real_decode)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            out["batch_size"] = len(pdf)
            yield out

    return media_df.mapInPandas(run, schema=schema)


# load/MediaStore.scala:40-57 — URL/filename validity by media family.
# The URL parsers require a scheme and a known extension (optionally a
# query string after it); the filename checks accept a bare extension
# suffix too (plus the imgType=jpeg service-URL quirk for images).
_IMAGE_URL_RE = re.compile(
    r"""^((?:http|ftp|file)s?://[^\'"<>]+?\.(jpg|jpeg|gif|png)(\?.+)?)$"""
)
_SOUND_URL_RE = re.compile(
    r"""^((?:http|ftp|file)s?://[^\'"<>]+?\.(?:wav|mp3|ogg|flac)(\?.+)?)$"""
)
_VIDEO_URL_RE = re.compile(
    r"""^((?:http|ftp|file)s?://[^\'"<>]+?\.(?:wmv|mp4|mpg|avi|mov)(\?.+)?)$"""
)
# NOTE "imgType=jpeg" reproduces a reference quirk: endsWithOneOf
# (MediaStore.scala:68-69) lowercases the URL but compares against this
# mixed-case literal, so the service-URL form can never actually match —
# kept verbatim for behavioral parity
_IMAGE_EXTS = (".jpg", ".gif", ".png", ".jpeg", "imgType=jpeg")
_SOUND_EXTS = (".wav", ".mp3", ".ogg", ".flac")
_VIDEO_EXTS = (".wmv", ".mp4", ".mpg", ".avi", ".mov")


def is_valid_image_url(url: str) -> bool:
    """MediaStore.isValidImageURL (load/MediaStore.scala:49)."""
    return _IMAGE_URL_RE.fullmatch(url.strip().lower()) is not None


def is_valid_sound_url(url: str) -> bool:
    return _SOUND_URL_RE.fullmatch(url.strip().lower()) is not None


def is_valid_video_url(url: str) -> bool:
    return _VIDEO_URL_RE.fullmatch(url.strip().lower()) is not None


def is_valid_image(filename: str) -> bool:
    """MediaStore.isValidImage (:55): bare extension suffix OR URL form."""
    low = filename.strip().lower()
    return low.endswith(_IMAGE_EXTS) or _IMAGE_URL_RE.search(low) is not None


def is_valid_sound(filename: str) -> bool:
    low = filename.strip().lower()
    return low.endswith(_SOUND_EXTS) or _SOUND_URL_RE.search(low) is not None


def is_valid_video(filename: str) -> bool:
    low = filename.strip().lower()
    return low.endswith(_VIDEO_EXTS) or _VIDEO_URL_RE.search(low) is not None


# load/MediaStore.scala:903-919 — the three generated renditions: suffix +
# max edge length. generateAllSizes (Thumbnailer.scala:77-84) emits all
# three per source image.
THUMBNAIL_SIZES: tuple[tuple[str, str, float], ...] = (
    ("thumb", "__thumb", 100.0),
    ("small", "__small", 314.0),
    ("large", "__large", 650.0),
)


def scaled_dims(width: int, height: int, edge: float) -> tuple[int, int, bool]:
    """ThumbnailableImage.writeThumbnailToFile (ThumbnailableImage.scala:
    24-50) size arithmetic: when BOTH edges are already under the target
    edge length the file is copied unchanged; otherwise scale by
    edge/max(w, h) with Scala's toInt truncation on each dimension.
    Returns (new_w, new_h, resized)."""
    if height < edge and width < edge:
        return width, height, False
    denom = max(height, width)
    modifier = edge / denom
    return int(width * modifier), int(height * modifier), True


def thumbnail_media(
    media_df: DataFrame,
    sizes: tuple[tuple[str, str, float], ...] = THUMBNAIL_SIZES,
) -> DataFrame:
    """Thumbnailer.generateAllSizes as a distributed stage: each image row
    fans out to one row per rendition (thumb/small/large) with the resized
    content and dimensions. Arrow-batched mapInPandas; rows never leave the
    executor, one pass for all renditions.

    Real resize runs when Pillow is importable on the executors (JPEG
    output, SCALE_SMOOTH equivalent LANCZOS); otherwise the stage keeps
    the reference's exact size arithmetic (scaled_dims over metadata
    width/height) and emits a deterministic placeholder payload
    md5(content) + suffix — byte-stable so tests and downstream dedup
    behave identically run-to-run. Rows whose metadata carries no
    dimensions pass through with null dims and the original content
    (the reference's copy-unchanged branch)."""
    from biocache_store_spark.util import (
        ensure_min_parallelism,
        ensure_package_on_workers,
    )

    ensure_package_on_workers(media_df.sparkSession)
    images = ensure_min_parallelism(
        media_df.filter(F.col("media_type") == "image")
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("record_id", T.StringType()),
            T.StructField("size_name", T.StringType()),
            T.StructField("suffix", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized", T.BooleanType()),
            T.StructField("real_resize", T.BooleanType()),
        ]
    )

    def _resize_real(image_mod, img, content, edge):
        import io

        w, h = img.size
        new_w, new_h, resized = scaled_dims(w, h, edge)
        if not resized:
            return content, w, h, False
        out = io.BytesIO()
        # record the ACTUAL emitted dimensions: scaled_dims' toInt
        # truncation (reference parity) can yield 0 for extreme aspect
        # ratios, but Pillow clamps to 1px — the row must describe the
        # payload, not the arithmetic
        emit_w, emit_h = max(new_w, 1), max(new_h, 1)
        img.resize((emit_w, emit_h), image_mod.LANCZOS).save(
            out, format="JPEG"
        )
        return out.getvalue(), emit_w, emit_h, True

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        image_mod = _pillow_or_none()
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                content = rec.content
                meta = rec.metadata
                # decode ONCE per row (the reference's generateAllSizes
                # shape: one read, three rendition writes) — decode
                # dominates resize cost, so per-rendition re-opens would
                # triple the stage's CPU
                img = None
                if image_mod is not None and content:
                    try:
                        img = image_mod.open(io.BytesIO(content)).convert("RGB")
                    except Exception:
                        img = None  # undecodable: arithmetic path below
                for size_name, suffix, edge in sizes:
                    if img is not None:
                        c, w, h, resized = _resize_real(
                            image_mod, img, content, edge
                        )
                        rows.append(
                            (rec.media_id, rec.record_id, size_name,
                             suffix, c, w, h, resized, True)
                        )
                        continue
                    width = meta.get("width") if meta is not None else None
                    height = meta.get("height") if meta is not None else None
                    if width is None or height is None:
                        rows.append(
                            (rec.media_id, rec.record_id, size_name, suffix,
                             content, None, None, False, False)
                        )
                        continue
                    new_w, new_h, resized = scaled_dims(width, height, edge)
                    payload = (
                        hashlib.md5(content or b"").digest() + suffix.encode()
                        if resized
                        else content
                    )
                    rows.append(
                        (rec.media_id, rec.record_id, size_name, suffix,
                         payload, new_w, new_h, resized, False)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return images.mapInPandas(run, schema=schema)


def default_transport(url: str) -> tuple[bytes | None, str | None]:
    """The environment-gated media transport: file:// URLs read locally
    (the reference's local-file path, MediaStore.scala:361-366); http(s)
    needs network access this sandbox doesn't have — inject a real
    transport (requests/urllib session) where one exists. Mirrors the
    sources/archive.py gating shape."""
    import mimetypes
    import urllib.parse

    parsed = urllib.parse.urlparse(url)
    scheme = parsed.scheme or "file"
    if scheme == "file":
        path = parsed.path
        try:
            with open(path, "rb") as fh:
                return fh.read(), mimetypes.guess_type(path)[0]
        except OSError:
            return None, None
    raise NotImplementedError(
        f"{scheme}:// media needs network access not present in this "
        "environment (reference: load/MediaStore.scala:324 RemoteMediaStore)"
    )


def fetch_media(
    records: DataFrame,
    url_col: str = "url",
    record_id_col: str = "record_id",
    transport=default_transport,
) -> DataFrame:
    """Distributed media download (load/MediaStore.scala:317-420 save):
    one transport call per (record, url) row, executed inside the
    partitions — no driver-side loop, no collect. `transport(url) ->
    (bytes | None, mime | None)` is injectable so tests (and air-gapped
    environments) supply a fake; failed fetches keep the row with NULL
    content, matching the reference's skip-and-log behavior.

    Output adds: content binary, mime_type, fetch_ok boolean. Feed the
    result to add_content_hash/dedup_media for the MD5 dedup the reference
    applies to stored media."""
    from biocache_store_spark.util import (
        ensure_min_parallelism,
        ensure_package_on_workers,
    )

    ensure_package_on_workers(records.sparkSession)
    records = ensure_min_parallelism(records)
    schema = T.StructType(
        list(records.schema.fields)
        + [
            T.StructField("content", T.BinaryType()),
            T.StructField("mime_type", T.StringType()),
            T.StructField("fetch_ok", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, mimes, oks = [], [], []
            for url in pdf[url_col]:
                if url is None or (isinstance(url, float) and pd.isna(url)):
                    contents.append(None), mimes.append(None), oks.append(False)
                    continue
                try:
                    content, mime = transport(str(url))
                except NotImplementedError:
                    raise
                except Exception:
                    content, mime = None, None
                contents.append(content)
                mimes.append(mime)
                oks.append(content is not None)
            out = pdf.copy()
            out["content"] = contents
            out["mime_type"] = mimes
            out["fetch_ok"] = oks
            yield out

    return records.mapInPandas(run, schema=schema)


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: expands each video into
    (media_id, frame_ts_ms) rows from metadata duration — the explode shape
    a real frame extractor plugs into."""
    # duration > 0 required: a zero-length video must yield no frames,
    # consistent with NULL-duration rows (greatest(-1, 0) would otherwise
    # mint a phantom frame at t=0 for "no playable content")
    videos = media_df.filter(
        (F.col("media_type") == "video") & (F.col("metadata.duration_ms") > 0)
    )
    return videos.select(
        "media_id",
        "record_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("metadata.duration_ms") - 1,
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def exif_coordinates(
    lat_dms: tuple[float, float, float] | None,
    lon_dms: tuple[float, float, float] | None,
    lat_ref: str | None,
    lon_ref: str | None,
    corrected: bool = False,
) -> tuple[float, float] | None:
    """EXIF.extractCoordinates' DMS->decimal arithmetic, EXACTLY
    (util/EXIF.scala:34-60): latitude takes abs() of each rational
    component and negates on lat_ref == 'S'; longitude does NOT abs its
    components, and — a genuine reference bug kept for parity — its sign
    test reads the LATITUDE ref (`if(latitudeRef == "W")`,
    EXIF.scala:57), which is only ever N/S, so western longitudes are
    never actually negated. `corrected=True` uses lon_ref, the intended
    behavior, for pipelines that want true coordinates."""
    if lat_dms is None or lon_dms is None:
        return None
    la_deg, la_min, la_sec = (abs(float(v)) for v in lat_dms)
    lat = (la_deg + ((la_min * 60 + la_sec) / 3600.0)) * (
        -1.0 if lat_ref == "S" else 1.0
    )
    lo_deg, lo_min, lo_sec = (float(v) for v in lon_dms)
    sign_ref = lon_ref if corrected else lat_ref
    lon = (lo_deg + ((lo_min * 60 + lo_sec) / 3600.0)) * (
        -1.0 if sign_ref == "W" else 1.0
    )
    return lat, lon


def _fake_exif(content: bytes):
    """Deterministic fake EXIF directory from the content digest —
    byte-stable and SQL-reproducible (the oracle recomputes the sha256
    nibble arithmetic in DuckDB), same stubbing contract as
    _decode_bytes. Returns (lat_dms, lon_dms, lat_ref, lon_ref,
    datetime_original) or None when the 'GPS directory' is absent
    (digest byte 0 % 4 == 0 — the reference returns None there,
    EXIF.scala:64-66)."""
    b = hashlib.sha256(content or b"").digest()
    if b[0] % 4 == 0:
        return None
    lat_ref = "S" if b[1] % 2 else "N"
    lon_ref = "W" if b[2] % 2 else "E"
    lat_dms = (float(b[3] % 90), float(b[4] % 60), float(b[5] % 60))
    lon_dms = (float(b[6] % 180), float(b[7] % 60), float(b[8] % 60))
    # DateTimeOriginal may be missing with the GPS directory present —
    # the reference still returns Some((lat, lon, null))
    ts = None
    if b[9] % 5 != 0:
        ts = "%04d-%02d-%02d %02d:%02d:%02d" % (
            2000 + b[10] % 20, 1 + b[11] % 12, 1 + b[12] % 28,
            b[13] % 24, b[14] % 60, b[15] % 60,
        )
    return lat_dms, lon_dms, lat_ref, lon_ref, ts


def _pillow_exif(image_mod, content: bytes):
    """Real EXIF read via Pillow: GPSInfo IFD (tag 34853) rationals +
    refs, DateTimeOriginal (tag 36867) — the same directories
    metadata-extractor reads in the reference. Returns the _fake_exif
    tuple shape, or None when the GPS IFD is absent."""
    import io

    img = image_mod.open(io.BytesIO(content))
    exif = img.getexif()
    gps = exif.get_ifd(0x8825) if exif else None
    if not gps:
        return None
    try:
        lat_dms = tuple(float(v) for v in gps[2])
        lon_dms = tuple(float(v) for v in gps[4])
    except (KeyError, TypeError, ValueError):
        return None
    lat_ref = gps.get(1)
    lon_ref = gps.get(3)
    sub = exif.get_ifd(0x8769)
    raw_ts = sub.get(0x9003) if sub else None  # DateTimeOriginal
    ts = None
    if raw_ts:
        # EXIF spells it 'YYYY:MM:DD HH:MM:SS'; normalize the date colons
        p = str(raw_ts).split(" ")
        ts = p[0].replace(":", "-") + (" " + p[1] if len(p) > 1 else "")
    return lat_dms, lon_dms, lat_ref, lon_ref, ts


def exif_metadata(
    media_df: DataFrame,
    real_extract: bool = False,
    corrected: bool = False,
) -> DataFrame:
    """GPS coordinate + timestamp extraction from image metadata
    (util/EXIF.scala:34-60) as a media column op: adds `exif_latitude`,
    `exif_longitude` (doubles, EXIF.scala's exact DMS arithmetic incl.
    the latitudeRef longitude-sign bug — see exif_coordinates),
    `exif_datetime` (string, 'YYYY-MM-DD HH:MM:SS') and `has_gps`; all
    null when the GPS directory is absent. One mapInPandas pass over the
    binary content column — embarrassingly parallel, no shuffle, same
    plumbing as decode_media. Default is the deterministic digest-driven
    fake (oracle-checked); `real_extract=True` uses Pillow's EXIF reader
    when importable and raises NotImplementedError otherwise, mirroring
    the decode gating."""
    from biocache_store_spark.util import (
        ensure_min_parallelism,
        ensure_package_on_workers,
    )

    ensure_package_on_workers(media_df.sparkSession)
    media_df = ensure_min_parallelism(media_df)
    schema = T.StructType(
        list(media_df.schema.fields)
        + [
            T.StructField("has_gps", T.BooleanType()),
            T.StructField("exif_latitude", T.DoubleType()),
            T.StructField("exif_longitude", T.DoubleType()),
            T.StructField("exif_datetime", T.StringType()),
        ]
    )

    def extract_one(content, media_type):
        if not real_extract and media_type != "image":
            # EXIF is image metadata; audio/video rows carry none. The
            # real path below refuses non-images loudly — the fake path
            # mirrors that as a clean no-GPS row so mixed-media frames
            # don't mint phantom coordinates.
            return False, None, None, None
        if real_extract:
            if media_type != "image":
                raise NotImplementedError(
                    f"EXIF extraction from media_type={media_type!r} is "
                    "not implemented (only images)"
                )
            image_mod = _pillow_or_none()
            if image_mod is None:
                raise NotImplementedError(
                    "real EXIF extraction requires image libraries not "
                    "present in this environment; only the deterministic "
                    "fake extractor is available"
                )
            try:
                d = _pillow_exif(image_mod, content or b"")
            except Exception:
                d = None  # undecodable bytes: log-and-skip, like decode
        else:
            d = _fake_exif(content or b"")
        if d is None:
            return False, None, None, None
        lat_dms, lon_dms, lat_ref, lon_ref, ts = d
        coords = exif_coordinates(
            lat_dms, lon_dms, lat_ref, lon_ref, corrected=corrected
        )
        if coords is None:
            return False, None, None, None
        return True, coords[0], coords[1], ts

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            cols = [
                extract_one(c, t)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            out["has_gps"] = [c[0] for c in cols]
            out["exif_latitude"] = pd.array(
                [c[1] for c in cols], dtype="float64"
            )
            out["exif_longitude"] = pd.array(
                [c[2] for c in cols], dtype="float64"
            )
            out["exif_datetime"] = [c[3] for c in cols]
            yield out

    return media_df.mapInPandas(run, schema=schema)


def unpack_associated_media(col: F.Column) -> F.Column:
    """Split a DwC associatedMedia string into its media URL/path list.

    Mirrors load/DownloadMedia.scala:40-63 (unpackAssociatedMedia +
    splitByChar, behaviors pinned by AssociatedMediaTest.scala): delimiter
    precedence is '|' (the DwC default) then ';' then ','; parts are
    trimmed; and if splitting yields a MIX of URL-ish (http/ftp/file:)
    and non-URL parts the whole string is kept as ONE value — that is how
    the reference keeps a lone URL containing a comma intact. Empty parts
    (trailing delimiter) are dropped, matching Scala split semantics.

    Pure Column expressions (split/transform/filter/forall) — no Python
    in the media ingest path. The transform/forall lambdas evaluate
    interpreted (documented repo trap), acceptable here: the unpack runs
    once per record at load time, not inside a pairwise hot loop.
    """

    def split_by(s, delim_re):
        parts = F.filter(
            F.transform(F.split(s, delim_re), lambda x: F.trim(x)),
            lambda x: x != "",
        )
        is_url = lambda x: (
            x.startswith("http") | x.startswith("ftp") | x.startswith("file:")
        )
        all_url = F.forall(parts, is_url)
        none_url = F.forall(parts, lambda x: ~is_url(x))
        return F.when(all_url | none_url, parts).otherwise(F.array(F.trim(s)))

    s = col
    return (
        F.when(s.isNull() | (F.trim(s) == ""), F.array().cast("array<string>"))
        # instr is 1-BASED: > 0 means present anywhere, incl. a leading
        # delimiter ('|a|b' must split; '> 1' skipped it and could even
        # invert precedence onto a lower-priority delimiter)
        .when(F.instr(s, "|") > 0, split_by(s, r"\|"))
        .when(F.instr(s, ";") > 0, split_by(s, ";"))
        .when(F.instr(s, ",") > 0, split_by(s, ","))
        .otherwise(F.array(F.trim(s)))
    )


# --- media maintenance ops (tool/LoadMediaReferences.scala,
# --- tool/MigrateMedia.scala) -------------------------------------------


def media_references(
    stored: DataFrame,
    record_id_col: str = "record_id",
    media_id_col: str = "media_id",
    mime_col: str = "mime_type",
) -> DataFrame:
    """Rebuild the per-record media-reference table from a media store.

    The export LoadMediaReferences consumes is (record uuid, media uuid,
    mime type); the tool buckets media ids into the record's `images` or
    `sounds` column by mime prefix (LoadMediaReferences.scala:55-80).
    This is that whole-table effect as ONE aggregation: group the store
    on the record key and conditionally collect ids per media class
    (anything non-image/non-sound lands in `videos`, the third media
    column MediaStore carries). Arrays are sorted so a rebuild from the
    same store is byte-identical regardless of partitioning.
    """
    mime = F.coalesce(F.col(mime_col), F.lit(""))
    mid = F.col(media_id_col)
    return stored.groupBy(F.col(record_id_col).alias("record_id")).agg(
        F.sort_array(
            F.collect_list(F.when(mime.startswith("image"), mid))
        ).alias("images"),
        F.sort_array(
            F.collect_list(F.when(mime.startswith("audio"), mid))
        ).alias("sounds"),
        F.sort_array(
            F.collect_list(
                F.when(~mime.startswith("image") & ~mime.startswith("audio"), mid)
            )
        ).alias("videos"),
    )


def multimedia_descriptor_rows(
    stored: DataFrame,
    record_id_col: str = "record_id",
) -> DataFrame:
    """Media store -> the long-form descriptor rows the DwC-A creator's
    Multimedia extension consumes (exports/exporters.py create_dwca
    `multimedia=`): one row per stored media file with the dcterms
    columns image.csv carries. Mirrors what the reference's
    addImageExportsToArchives splices in from the image service export
    (export/DwCACreator.scala:483-494) — identifier = the stored URL,
    format = the sniffed mime type; rows that never fetched cleanly
    (fetch_ok = false) are excluded like the store-append path excludes
    them. Accepts both migrate_media output and the MEDIA_SCHEMA store
    (url nested under metadata)."""
    url = F.col("url") if "url" in stored.columns else F.col("metadata.url")
    out = stored
    if "fetch_ok" in stored.columns:
        out = out.filter(F.col("fetch_ok"))
    return out.select(
        F.col(record_id_col).cast("string").alias(record_id_col),
        url.cast("string").alias("identifier"),
        F.col("mime_type").cast("string").alias("format"),
    )


def load_media_references(
    records: DataFrame,
    references: DataFrame,
    record_id_col: str = "record_id",
) -> DataFrame:
    """Overlay a media-reference table onto the records table — the
    LoadMediaReferences effect (replace the record's media columns with
    the store's truth; records absent from the references keep empty
    arrays, mirroring the reference's put of the full buffer). One left
    broadcast-or-shuffle join on the record key; no per-record loop."""
    refs = references.withColumnRenamed("record_id", record_id_col)
    out = records.drop("images", "sounds", "videos").join(
        refs, record_id_col, "left"
    )
    empty = F.array().cast("array<string>")
    return (
        out.withColumn("images", F.coalesce(F.col("images"), empty))
        .withColumn("sounds", F.coalesce(F.col("sounds"), empty))
        .withColumn("videos", F.coalesce(F.col("videos"), empty))
    )


def migrate_media_candidates(
    records: DataFrame,
    stored: DataFrame | None,
    record_id_col: str = "record_id",
    associated_media_col: str = "associatedMedia",
) -> DataFrame:
    """The (record_id, url) pairs a migration sweep would fetch — the
    candidate set of MigrateMedia.scala:35-58 (split associatedMedia,
    skip alreadyStored) WITHOUT running any transport, so the CLI's
    --dry-run can count the backlog exactly like the reference's dryRun:
    no download, no bytes moved. `stored` None means an empty store."""
    todo = records.select(
        F.col(record_id_col).alias("record_id"),
        F.explode(
            unpack_associated_media(F.col(associated_media_col))
        ).alias("url"),
    ).dropDuplicates(["record_id", "url"])
    if stored is not None:
        # accept either migrate_media's own flat output (url column) or
        # the MEDIA_SCHEMA store (url nested under metadata)
        stored_url = (
            F.col("url") if "url" in stored.columns else F.col("metadata.url")
        )
        already = stored.select(F.col("record_id"), stored_url.alias("url"))
        todo = todo.join(already, ["record_id", "url"], "left_anti")
    return todo


def migrate_media(
    records: DataFrame,
    stored: DataFrame | None,
    record_id_col: str = "record_id",
    associated_media_col: str = "associatedMedia",
    transport=default_transport,
) -> DataFrame:
    """Fetch every associatedMedia file not already in the media store —
    the MigrateMedia sweep (MigrateMedia.scala:35-58) as set algebra:
    migrate_media_candidates picks the (record, url) pairs, then the
    distributed fetch_media pass downloads them. Returns the NEW store
    rows (record_id, url, content, mime_type, media_id = sha1 of
    content); failed fetches keep fetch_ok = false for the caller's
    retry/log path — callers appending to the store must append ONLY the
    fetch_ok rows, or the anti-join above will treat the failure as
    already-stored and never retry it (the CLI does exactly this
    split). `stored` None means an empty store (first migration)."""
    todo = migrate_media_candidates(
        records, stored, record_id_col=record_id_col,
        associated_media_col=associated_media_col,
    )
    fetched = fetch_media(
        todo, url_col="url", record_id_col="record_id", transport=transport
    )
    return fetched.select(
        "record_id",
        "url",
        "content",
        "mime_type",
        "fetch_ok",
        F.when(F.col("fetch_ok"), F.sha1(F.col("content"))).alias("media_id"),
    )
