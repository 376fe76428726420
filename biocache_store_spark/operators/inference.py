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
