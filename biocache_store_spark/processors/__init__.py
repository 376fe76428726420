"""The record-processing chain (reference: processor/Processors.scala:16-29).

Each stage is a pure-Python record function (unit-testable against the
reference's processor tests) plus a Spark integration in chain.py that runs
the whole chain as one Arrow-batched mapInPandas pass, emitting the
processed.* struct and the assertions array column.

Stage order preserved from the reference (order matters: defaults before
classification before location; sensitivity after location).
"""

from biocache_store_spark.processors.assertions import (  # noqa: F401
    AssertionCodes,
    QualityAssertion,
)
