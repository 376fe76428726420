"""Reverse-jackknife outlier detection.

Port of outliers/JackKnife.scala:14-106, preserving its exact semantics:
  * requires >= min_sample_threshold samples (default 20);
  * threshold = (0.95*sqrt(n) + 0.2) * range/50;
  * the gap statistic y_i is (next-gap)*(mean-dist) below the mean and
    (prev-gap)*(dist-from-mean) above it, scaled by the population stddev;
  * an outlier flag CASCADES to the tail: everything <= i when below the
    mean, everything >= i when above (JackKnife.scala:50-63);
  * after flagging, c-values accumulate along flagged runs toward the
    extremes (JackKnife.scala:69-81) and outlierness = c/threshold;
  * failsafe: if more than half the samples are flagged, the outlier set is
    cleared and trigger_failsafe is set (JackKnife.scala:93-96).

The grouped Spark form runs per (group) via applyInPandas — the reference
reads a taxonConceptID-sorted dump per species x environmental layer
(outliers/ReverseJacknifeProcessor.scala:198-313); here each group needs its
full sorted sample vector, which built-in aggregates can't express.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MIN_SAMPLE_THRESHOLD = 20


@dataclass(frozen=True)
class JackKnifeStats:
    sample_size: int
    min: float
    max: float
    mean: float
    std_dev: float
    range: float
    threshold: float
    outlier_values: tuple[float, ...]
    trigger_failsafe: bool
    # per-sample outlierness = accumulated c / threshold (JackKnife.scala:
    # 83-85), aligned with the SORTED sample order — the score the
    # reference attaches to each flagged record
    outlierness: tuple[float, ...] = ()


def jackknife(
    sampled_unsorted, min_sample_threshold: int = MIN_SAMPLE_THRESHOLD
) -> JackKnifeStats | None:
    """JackKnife.jackknife (JackKnife.scala:14-99)."""
    if sampled_unsorted is None or len(sampled_unsorted) == 0:
        return None
    if len(sampled_unsorted) < min_sample_threshold:
        return None

    samples = sorted(float(v) for v in sampled_unsorted)
    n = len(samples)
    smin, smax = samples[0], samples[-1]
    smean = sum(samples) / n
    sstd = math.sqrt(sum((v - smean) ** 2 for v in samples) / n)
    srange = smax - smin
    threshold = (0.95 * math.sqrt(n) + 0.2) * (srange / 50.0)
    if threshold <= 0:
        return None

    outliers = [False] * n
    c_arr = [0.0] * n
    for i in range(n):
        if samples[i] < smean:
            y = (samples[i + 1] - samples[i]) * (smean - samples[i])
        elif samples[i] > smean:
            y = (samples[i] - samples[i - 1]) * (samples[i] - smean)
        else:
            y = 0.0
        c = y / sstd if sstd != 0 else 0.0
        if c > threshold:
            outliers[i] = True
            if samples[i] < smean and i > 0:
                for q in range(i, -1, -1):
                    outliers[q] = True
            if samples[i] > smean and i < n - 1:
                for q in range(i, n):
                    outliers[q] = True
        c_arr[i] = c

    # REFERENCE PARITY (JackKnife.scala:69-81): the forward pass gates on
    # outliers[i-1] but NOT outliers[i], and the backward pass adds
    # c_arr[i+1] without requiring outliers[i+1] — so a c-value can leak
    # across a flagged-run boundary into an unflagged neighbor's
    # outlierness. That is the reference's own accumulation, preserved
    # verbatim (the outlier FLAGS, which drive record assertions, are
    # unaffected; only the advisory outlierness score carries the quirk).
    for i in range(n):
        if samples[i] > smean and i > 0 and outliers[i - 1]:
            c_arr[i] = c_arr[i] + c_arr[i - 1]
    for i in range(n - 1, -1, -1):
        if samples[i] < smean and outliers[i] and i < n - 1:
            c_arr[i] = c_arr[i] + c_arr[i + 1]

    outlier_values = [samples[i] for i in range(n) if outliers[i]]
    trigger_failsafe = len(outlier_values) > n // 2
    if trigger_failsafe:
        outlier_values = []

    return JackKnifeStats(
        sample_size=n,
        min=smin,
        max=smax,
        mean=smean,
        std_dev=sstd,
        range=srange,
        threshold=threshold,
        outlier_values=tuple(outlier_values),
        trigger_failsafe=trigger_failsafe,
        outlierness=tuple(
            (c / threshold) if threshold != 0 else 0.0 for c in c_arr
        ),
    )


_RESULT_FIELDS = [
    T.StructField("sample_size", T.IntegerType()),
    T.StructField("min_value", T.DoubleType()),
    T.StructField("max_value", T.DoubleType()),
    T.StructField("mean_value", T.DoubleType()),
    T.StructField("std_dev", T.DoubleType()),
    T.StructField("value_range", T.DoubleType()),
    T.StructField("threshold", T.DoubleType()),
    T.StructField("outlier_values", T.ArrayType(T.DoubleType())),
    T.StructField("n_outliers", T.IntegerType()),
    T.StructField("trigger_failsafe", T.BooleanType()),
    T.StructField("outlierness", T.ArrayType(T.DoubleType())),
]


def jackknife_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    min_sample_threshold: int = MIN_SAMPLE_THRESHOLD,
) -> DataFrame:
    """Per-group jackknife over value_col. Groups below the sample threshold
    are dropped (the reference skips them, ReverseJacknifeProcessor)."""
    from biocache_store_spark.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)

    schema = T.StructType(
        [df.schema[c] for c in group_cols] + list(_RESULT_FIELDS)
    )

    def run(pdf):
        import pandas as pd

        stats = jackknife(
            pdf[value_col].dropna().tolist(), min_sample_threshold
        )
        if stats is None:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        row = {c: pdf[c].iloc[0] for c in group_cols}
        row.update(
            {
                "sample_size": stats.sample_size,
                "min_value": stats.min,
                "max_value": stats.max,
                "mean_value": stats.mean,
                "std_dev": stats.std_dev,
                "value_range": stats.range,
                "threshold": stats.threshold,
                "outlier_values": list(stats.outlier_values),
                "n_outliers": len(stats.outlier_values),
                "trigger_failsafe": stats.trigger_failsafe,
                "outlierness": list(stats.outlierness),
            }
        )
        return pd.DataFrame([row])

    return df.select(*group_cols, value_col).groupBy(*group_cols).applyInPandas(
        run, schema=schema
    )
