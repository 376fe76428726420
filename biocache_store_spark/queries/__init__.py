"""The declared query surface: SURVEY.md §2 inventory as (Spark, oracle) pairs.

Each query is registered with:
  * a Spark callable  (spark, sf_dir) -> DataFrame — the engine under test,
  * an ANSI-SQL oracle string DuckDB can run on the same parquet tables
    (views: region nation customer supplier part orders lineitem events
    documents embeddings), or None for non-SQL-expressible operators,
  * a `bench` flag marking the headline set bench.py times at sf0.1.

Column names are aliased identically on both sides (the driver's comparator
sorts columns by name before value-hashing), and every computed float is
rounded to a fixed scale on both sides so double summation order can't flip
the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    bench: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator registering a (spark, sf_dir) -> DataFrame query callable."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name, spark_fn=fn, oracle=oracle, doc=doc, bench=bench, tags=tags
        )
        return fn

    return wrap


def load_all() -> dict[str, Query]:
    """Import every query module so REGISTRY is fully populated."""
    from biocache_store_spark.queries import (  # noqa: F401
        analytics,
        coverage,
        events,
        relational,
        text,
        vectors,
    )

    return REGISTRY


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in load_all().items()}


def oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
