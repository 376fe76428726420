"""JSON-Lines corpus loader.

The de-facto interchange format for training-text corpora (one JSON object
per line, optionally gzip-compressed — the shape of Common Crawl derivates,
RedPajama, Dolma, etc.). The reference's loaders are biodiversity-format
adapters (DwC CSV/archives); this is the equivalent adapter for the
documents surface: read, project/rename to the documents schema, mint the
deterministic identity the engine's dedup and curation operators key on.

Scale shape: spark.read.json with an EXPLICIT schema — schema inference
scans the data twice and samples unpredictably at 100 TB, so the schema is
declared (callers can pass their own). Gzip files are splittable-hostile
(one task per .gz file); that is a property of the codec, noted here so
corpus layouts prefer many medium files over few huge ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

# accepted aliases for the two essential fields, tried in order
_TEXT_ALIASES = ("text", "content", "raw_content", "body")
_ID_ALIASES = ("id", "doc_id", "document_id", "uuid")


def load_jsonl(
    spark: SparkSession,
    path: str,
    source: str,
    schema: T.StructType | None = None,
    text_field: str | None = None,
    id_field: str | None = None,
) -> DataFrame:
    """JSONL file(s)/dir -> documents DataFrame: (doc_id, text, lang,
    source, url, n_chars).

    Identity: a supplied id field wins; otherwise doc_id is minted
    deterministically as xxhash64 of (source, text) — re-loading the same
    corpus yields the same ids with no coordination, the same design as
    the CSV loader's uuid5 minting. Corrupt lines survive as nulls under
    PERMISSIVE mode and are dropped by the non-null text filter rather
    than failing the read.
    """
    if schema is None:
        # build a FRESH StructType: StructType.add mutates in place and
        # returns self, so extending DOCUMENT_SCHEMA directly would leak
        # the alias columns into every later consumer of the constant
        base_names = {f.name for f in DOCUMENT_SCHEMA.fields}
        # a JSON number read into a StringType field parses to NULL
        # (Spark 4 / ANSI), which would silently re-mint every numeric
        # id — so sniff a few lines driver-side and type each id alias
        # long when the corpus carries numeric ids. Corpora large enough
        # to make even this 100-line peek matter pass an explicit schema.
        seen_int: set[str] = set()
        seen_other: set[str] = set()
        try:
            import json as _json

            for row in spark.read.text(path).limit(100).collect():
                try:
                    obj = _json.loads(row["value"])
                except ValueError:
                    continue
                for alias in _ID_ALIASES:
                    v = obj.get(alias)
                    if isinstance(v, bool) or v is None:
                        continue
                    (seen_int if isinstance(v, int) else seen_other).add(alias)
        except Exception:  # unreadable head: fall back to all-string
            pass
        # long ONLY for purely-numeric aliases: a mixed corpus (numeric
        # and string ids for the same alias) must stay StringType so the
        # string ids survive — numeric lines in a string field null out
        # and re-mint, the lesser loss. Mixed corpora should pass an
        # explicit schema/id_field.
        numeric_ids = seen_int - seen_other
        extra = [
            T.StructField(
                alias,
                T.LongType() if alias in numeric_ids else T.StringType(),
            )
            for alias in _TEXT_ALIASES[1:] + _ID_ALIASES[1:]
            if alias not in base_names
        ]
        fields = [
            T.StructField(f.name, T.LongType())
            if f.name in numeric_ids
            else f
            for f in DOCUMENT_SCHEMA.fields
        ]
        schema = T.StructType(fields + extra)
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

    cols = set(df.columns)

    def first_present(cands, explicit):
        if explicit is not None:
            return explicit if explicit in cols else None
        for c in cands:
            if c in cols:
                return c
        return None

    text_col = first_present(_TEXT_ALIASES, text_field)
    if text_col is None:
        raise ValueError(
            f"no text field found (looked for {text_field or _TEXT_ALIASES})"
        )
    id_col = first_present(_ID_ALIASES, id_field)

    text = F.coalesce(
        *[F.col(c) for c in _TEXT_ALIASES if c in cols]
    ) if text_field is None else F.col(text_col)
    # per-ROW fallback: a corpus can mix lines with and without explicit
    # ids, so the minted id kicks in wherever the id field is null.
    # Like `text`, the default coalesces over EVERY id alias present —
    # the base schema always carries an (often empty) `id` column, so
    # picking only the first alias would shadow a populated `doc_id`
    # behind an all-null `id` and re-mint every identity
    minted = F.concat(
        F.lit(source), F.lit("-"), F.xxhash64(F.lit(source), text).cast("string")
    )
    if id_field is not None:
        doc_id = (
            F.coalesce(F.col(id_col).cast("string"), minted)
            if id_col is not None
            else minted
        )
    else:
        doc_id = F.coalesce(
            *[F.col(c).cast("string") for c in _ID_ALIASES if c in cols], minted
        )
    out = df.filter(text.isNotNull()).select(
        doc_id.alias("doc_id"),
        text.alias("text"),
        (F.col("lang") if "lang" in cols else F.lit(None)).cast("string").alias("lang"),
        F.lit(source).alias("source"),
        (F.col("url") if "url" in cols else F.lit(None)).cast("string").alias("url"),
    )
    return out.withColumn("n_chars", F.length("text"))
