"""In-engine BPE merge training and encoding.

The text twin of the fixed-point k-means codebook training
(operators/similarity.py): byte-pair-encoding merge rules learned from
the corpus WITHOUT leaving the engine, then applied as a tokenizer.
This is beyond the reference's scope (biocache has no tokenizer
training); it rounds out the training-data pipeline the way kmeans
rounds out the ANN family — the corpus-facing half of tokenizer
construction (Sennrich et al. 2016) as ordinary DataFrame passes.

Why this scales to 100 TB:
  * the corpus is touched ONCE, to build the word-frequency dimension
    (explode + groupBy count). Everything iterative runs on that dim,
    whose size is the VOCABULARY (sub-linear in corpus bytes, and
    bounded further by `max_words`), never the corpus;
  * each merge round is one narrow vocab-scale shuffle of
    (left, right, freq) rows plus a 1-row argmax collect — the same
    dimension-sized driver hop the k-means trainer uses for centroids;
  * per-round plans are kept flat with localCheckpoint (the
    connected-components discipline, operators/components.py) so round
    N's lambda expressions don't nest inside round N-1's;
  * encoding (`apply_bpe`) is one Arrow-batched mapInPandas pass with
    the rank table a plain broadcast-sized Python dict and per-batch
    word memoization — each DISTINCT word is encoded once per batch,
    so hot words cost O(1) regardless of corpus repetition.

Determinism: merge-pair ties break on (count DESC, left ASC, right ASC)
and within-word merging is greedy left-to-right non-overlapping — both
pinned by the DuckDB oracle of the `bpe_merge_training` query, which
replays the training rounds in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

END_OF_WORD = "</w>"

# tokens for TRAINING default to lowercase ASCII runs: char-level symbol
# splitting is engine-sensitive outside ASCII (UTF-16 code units in the
# JVM vs code points elsewhere), and BPE quality work normalizes case
# first anyway. Pass a different regex when the corpus warrants it.
DEFAULT_TOKEN_REGEX = "[a-z]+"


def word_freq_table(
    docs: DataFrame,
    text_col: str = "text",
    token_regex: str = DEFAULT_TOKEN_REGEX,
    max_words: int | None = None,
) -> DataFrame:
    """(word, freq) dimension: the ONE corpus-scale pass of BPE
    training. `max_words` keeps the dim bounded on pathological corpora
    (top-N by frequency, ties broken by word for determinism) — BPE
    statistics are dominated by frequent words, so the truncation is the
    standard practice, not an approximation sleight."""
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(token_regex), F.lit(0)
                )
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if max_words is not None:
        words = words.orderBy(F.desc("freq"), "word").limit(max_words)
    return words


def _symbols(word_col) -> F.Column:
    """Char symbols + the end-of-word marker as the final symbol."""
    return F.concat(F.split(word_col, ""), F.array(F.lit(END_OF_WORD)))


def _adjacent_pairs(syms_col) -> F.Column:
    return F.zip_with(
        F.slice(syms_col, 1, F.size(syms_col) - 1),
        F.slice(syms_col, 2, F.size(syms_col) - 1),
        lambda left, right: F.struct(left.alias("l"), right.alias("r")),
    )


def _merge_pair(syms_col, left: str, right: str) -> F.Column:
    """Greedy left-to-right non-overlapping merge of (left, right) into
    one symbol — a fold whose accumulator is the rebuilt symbol array:
    merging consumes the current tail, so `aaa` under (a,a) becomes
    [aa, a], never [aa, aa] — the semantics every reference BPE
    implementation uses and the DuckDB oracle replays."""
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    token_regex: str = DEFAULT_TOKEN_REGEX,
    max_words: int | None = None,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn `n_merges` BPE merge rules from the corpus.

    Returns a DataFrame (rank int, left string, right string, merged
    string, pair_count long) — rank 0 is the first (highest-count)
    merge. Training stops early when no pair reaches `min_pair_count`
    (merging a pair seen once encodes noise, and a 1-count argmax would
    make the tail of the rule list an arbitrary tie-break walk).

    The loop collects ONE row per round (the argmax pair) — the same
    dimension-sized driver hop as the k-means centroid update; the word
    dimension itself never leaves the executors.
    """
    spark = docs.sparkSession
    words = word_freq_table(docs, text_col, token_regex, max_words).select(
        "freq", _symbols(F.col("word")).alias("syms")
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            words.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < min_pair_count:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append((rank, left, right, left + right, best[0]["pair_count"]))
        # flatten the plan each round: without the checkpoint, round N's
        # aggregate-lambda nests inside round N-1's and analysis cost
        # grows quadratically in n_merges
        words = words.select(
            "freq", _merge_pair(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
    from biocache_store_spark.util import local_rows_df

    return local_rows_df(
        spark,
        "rank int, left string, right string, merged string, pair_count long",
        merges,
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE encode for one word: repeatedly merge the
    lowest-rank adjacent pair present (greedy left-to-right within a
    round) until no learned pair remains."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        left, right = best_pair
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    token_regex: str = DEFAULT_TOKEN_REGEX,
) -> DataFrame:
    """Tokenize `text_col` with learned merge rules: adds `out_col`
    (array<string> of BPE symbols) and `{out_col}_count`.

    The rank table is collected once (vocab-sized — it IS the
    tokenizer) and rides to executors inside the mapInPandas closure;
    each Arrow batch memoizes encodes per distinct word, so corpus-scale
    repetition of hot words costs a dict hit, not a re-encode."""
    rules = [
        (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
    ]
    ranks = {pair: i for i, pair in enumerate(rules)}

    import re

    import pandas as pd

    pattern = re.compile(token_regex)
    out_schema = T.StructType(
        list(docs.schema.fields)
        + [
            T.StructField(out_col, T.ArrayType(T.StringType())),
            T.StructField(out_col + "_count", T.IntegerType()),
        ]
    )
    in_cols = list(docs.columns)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            memo: dict[str, list[str]] = {}
            toks_col, counts = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in pattern.findall(str(text or "").lower()):
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
                toks_col.append(toks)
                counts.append(len(toks))
            out = pdf[in_cols].copy()
            out[out_col] = toks_col
            out[out_col + "_count"] = pd.array(counts, dtype="int32")
            yield out

    return docs.mapInPandas(run, out_schema)


def bpe_vocab(
    spark: SparkSession, merges: DataFrame, token_regex: str = DEFAULT_TOKEN_REGEX
) -> DataFrame:
    """The tokenizer's symbol vocabulary: base symbols (ASCII letters
    under the default regex + the end-of-word marker) plus one merged
    symbol per rule, with the rank that minted it (-1 = base)."""
    from biocache_store_spark.util import local_rows_df

    base = [(s, -1) for s in "abcdefghijklmnopqrstuvwxyz"] + [(END_OF_WORD, -1)]
    base_df = local_rows_df(spark, "symbol string, rank int", base)
    merged = merges.select(F.col("merged").alias("symbol"), "rank")
    return base_df.unionByName(merged)
