"""Pure-Python parser layer — no Spark dependency.

Ports of the reference's parser semantics (biocache-store
src/main/scala/au/org/ala/biocache/parser/*.scala), written against the
reference's unit-test matrices. These functions are plain callables so they
unit-test instantly and plug into Spark as vectorized pandas UDFs in
biocache_store_spark.functions / processors.
"""
