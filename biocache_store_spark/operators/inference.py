"""Distributed batched model inference over a DataFrame — the plumbing
every model-in-the-loop curation stage shares (fastText-style quality /
language classifiers, LM perplexity filters, reward-model scoring).

The expensive mistakes at 100 TB are all in the plumbing, not the model:
loading the model per ROW (or per batch) instead of once per partition,
shipping it through the closure serializer instead of loading on the
executor, and calling it row-at-a-time instead of on Arrow batches. This
module fixes the shape once:

  * `batch_score` runs ONE `mapInPandas` pass; `model_loader()` is called
    once per partition-task (lazily, executor-side) and the returned
    callable scores whole pandas Series batches;
  * the model itself never rides the closure — only the loader function
    does, so a loader can read from an executor-local path / artifact
    cache and the driver never materializes weights;
  * real model libraries are absent in this sandbox, so the default
    loader is a deterministic fake (md5-derived scores) behind the same
    import-gate convention as the media decoder
    (operators/multimodal.py): the Spark-side plumbing — schema,
    batching, per-partition lifecycle — is real and tested, the weights
    are not.

Reference analog: the processor chain's per-record enrichment stages
(processor/*.scala) are the same pattern at classifier granularity;
cf. SURVEY §2.9.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# A scorer takes a pandas Series of strings and returns a float Series of
# the same length/index. A loader builds one scorer per partition-task.
Scorer = Callable[[pd.Series], pd.Series]
ModelLoader = Callable[[], Scorer]


def fake_quality_model() -> Scorer:
    """Deterministic stand-in for a learned quality classifier: score in
    [0, 1) derived from md5 of the text — stable across runs, engines and
    partitionings, so pipelines built on the plumbing are exactly
    testable. Swap for a real loader in production."""

    def score(texts: pd.Series) -> pd.Series:
        def one(t) -> float:
            if t is None:
                return 0.0
            digest = hashlib.md5(str(t).encode()).digest()
            return int.from_bytes(digest[:4], "big") / 2**32

        return texts.map(one).astype("float64")

    return score


def batch_score(
    df: DataFrame,
    model_loader: ModelLoader = fake_quality_model,
    text_col: str = "text",
    score_col: str = "model_score",
) -> DataFrame:
    """Add `score_col` by scoring `text_col` with the loader's model.

    One Arrow-batched pass; the loader runs once per partition-task and
    its scorer sees whole batches — no per-row model calls, no weights in
    the closure, no shuffle. Output schema: input columns + score_col
    (double)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(score_col, T.DoubleType())]
    )
    in_cols = list(df.columns)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = model_loader()  # once per partition-task, executor-side
        for pdf in batches:
            out = pdf[in_cols].copy()
            out[score_col] = scorer(pdf[text_col]).astype("float64")
            yield out

    return df.mapInPandas(run, out_schema)


def score_and_filter(
    df: DataFrame,
    threshold: float,
    model_loader: ModelLoader = fake_quality_model,
    text_col: str = "text",
    score_col: str = "model_score",
) -> DataFrame:
    """The standard curation gate: score, keep rows >= threshold. The
    filter sits ABOVE the scoring map (a model score can't be pushed into
    the scan), so cost is one full pass regardless of selectivity — plan
    model-gated filtering as the LAST stage after cheap filters have
    pruned, never the first."""
    from pyspark.sql import functions as F

    return batch_score(df, model_loader, text_col, score_col).filter(
        F.col(score_col) >= threshold
    )


# --- embedding models ----------------------------------------------------

# An embedder takes a pandas Series of strings and returns a list of
# equal-length float vectors (one per row). A loader builds one embedder
# per partition-task, same lifecycle as Scorer.
Embedder = Callable[[pd.Series], list]


def fake_embedding_model(dim: int = 8) -> Callable[[], Embedder]:
    """Loader factory for a deterministic stand-in embedder: each text
    maps to a unit vector derived from its md5 digest — stable across
    runs, partitionings and engines (the oracle-testable analog of
    fake_quality_model), with the property near-dup pipelines need for
    demos: IDENTICAL texts get identical vectors. Swap for
    sentence_transformer_model in an environment that has the package."""

    def load() -> Embedder:
        def embed(texts: pd.Series) -> list:
            import math

            out = []
            for t in texts:
                digest = hashlib.md5(str(t if t is not None else "").encode()).digest()
                # 4 bytes per component, centered; md5 re-hashed for dims > 4
                raw = []
                block = digest
                while len(raw) < dim:
                    for i in range(0, 16, 4):
                        raw.append(int.from_bytes(block[i : i + 4], "big") / 2**32 - 0.5)
                    block = hashlib.md5(block).digest()
                vec = raw[:dim]
                norm = math.sqrt(sum(v * v for v in vec)) or 1.0
                out.append([float(v / norm) for v in vec])
            return out

        return embed

    return load


def sentence_transformer_model(
    model_name: str = "all-MiniLM-L6-v2",
) -> Callable[[], Embedder]:
    """Loader factory for a real sentence-transformers embedder,
    import-gated like the Pillow decode path (operators/multimodal.py):
    the loader runs executor-side once per partition-task, so the model
    weights are loaded from the executor's local cache and never ride
    the closure. Raises NotImplementedError at LOAD time (executor) when
    the package is absent — build pipelines against fake_embedding_model
    in this sandbox."""

    def load() -> Embedder:
        try:
            from sentence_transformers import SentenceTransformer  # type: ignore
        except ImportError as exc:  # pragma: no cover - package not in sandbox
            raise NotImplementedError(
                "sentence-transformers is not installed; use "
                "fake_embedding_model (deterministic) or install the "
                "package where executors can load it"
            ) from exc
        model = SentenceTransformer(model_name)

        def embed(texts: pd.Series) -> list:
            vecs = model.encode(
                [str(t) if t is not None else "" for t in texts],
                normalize_embeddings=True,
            )
            return [[float(x) for x in v] for v in vecs]

        return embed

    return load


def batch_embed(
    df: DataFrame,
    model_loader: Callable[[], Embedder] | None = None,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 8,
) -> DataFrame:
    """Add an `array<float>` embedding column by encoding `text_col` —
    the entry point of the ANN/SemDeDup family when the corpus arrives
    as text. One Arrow-batched mapInPandas pass, loader once per
    partition-task, no weights in the closure (the batch_score
    discipline at vector granularity). The output column is exactly the
    embeddings-table shape the similarity operators consume
    (operators/similarity.py), so `batch_embed -> ivf_topk /
    semantic_dedup / cosine near-dup` composes end-to-end."""
    loader = model_loader or fake_embedding_model(dim)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )
    in_cols = list(df.columns)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        embedder = loader()  # once per partition-task, executor-side
        for pdf in batches:
            out = pdf[in_cols].copy()
            out[out_col] = embedder(pdf[text_col])
            yield out

    return df.mapInPandas(run, out_schema)
