"""Chain throughput: full-Python 12-stage pass vs hybrid (vocab in Catalyst).

Synthesizes occurrence-shaped records from the customer table at
$SPARK_GRAFT_SF_DIR (default sf0.1) and times process_records vs
process_records_hybrid end-to-end (count() forces the full pass).
Prints one JSON line: records, per-variant wall seconds and records/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from biocache_store_spark.io import read_table  # noqa: E402
from biocache_store_spark.processors.chain import (  # noqa: E402
    process_records,
    process_records_hybrid,
)
from biocache_store_spark.session import get_spark  # noqa: E402


def occurrences(spark, sf_dir):
    lineitem = read_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    return lineitem.select(
        F.concat(F.lit("l"), k.cast("string")).alias("occurrenceID"),
        F.col("l_returnflag").alias("dataResourceUid"),
        F.element_at(
            F.array(
                F.lit("PreservedSpecimen"),
                F.lit("HumanObservation"),
                F.lit("S"),
                F.lit("MachineObservation"),
            ),
            (F.pmod(k, F.lit(4)) + 1).cast("int"),
        ).alias("basisOfRecord"),
        F.element_at(
            F.array(F.lit("holotype"), F.lit("HOLOTYPUS material"), F.lit("")),
            (F.pmod(k, F.lit(3)) + 1).cast("int"),
        ).alias("typeStatus"),
        F.element_at(
            F.array(F.lit("native"), F.lit("naturalised; indigenous"), F.lit("")),
            (F.pmod(k, F.lit(3)) + 1).cast("int"),
        ).alias("establishmentMeans"),
        F.element_at(
            F.array(F.lit("present"), F.lit("absent"), F.lit("")),
            (F.pmod(k, F.lit(3)) + 1).cast("int"),
        ).alias("occurrenceStatus"),
        F.concat(
            F.lit("19"),
            F.lpad(F.pmod(k, F.lit(99)).cast("string"), 2, "0"),
            F.lit("-0"),
            (F.pmod(k, F.lit(9)) + 1).cast("string"),
            F.lit("-1"),
            F.pmod(k, F.lit(9)).cast("string"),
        ).alias("eventDate"),
        F.concat(F.lit("-"), F.pmod(k, F.lit(80)).cast("string"), F.lit(".5")).alias(
            "decimalLatitude"
        ),
        F.concat(F.pmod(k, F.lit(160)).cast("string"), F.lit(".25")).alias(
            "decimalLongitude"
        ),
        F.lit("WGS84").alias("geodeticDatum"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    occ = occurrences(spark, sf_dir)
    n = occ.count()
    out = {"records": n, "sf_dir": sf_dir}
    # warm the JVM/codegen/Python workers so neither variant pays first-call cost
    process_records(occ.limit(2000)).write.format("noop").mode("overwrite").save()
    process_records_hybrid(occ.limit(2000)).write.format("noop").mode(
        "overwrite"
    ).save()
    # hybrid+loc: additionally run the LocationProcessor once per distinct
    # coordinate tuple (real occurrence data repeats coordinates heavily —
    # the reference keeps a 10k-entry location cache for the same reason,
    # Config.scala:165-173; opt-in because pathological corpora with
    # near-unique GPS coords would pay the distinct+join for nothing)
    def hybrid_loc(df):
        return process_records_hybrid(df, location_by_distinct=True)

    hybrid_loc(occ.limit(2000)).write.format("noop").mode("overwrite").save()
    for name, fn in (
        ("full", process_records),
        ("hybrid", process_records_hybrid),
        ("hybrid_loc", hybrid_loc),
    ):
        t0 = time.time()
        fn(occ).select(
            F.col("processed")["basisOfRecord"], F.col("geospatially_kosher")
        ).write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        out[f"{name}_sec"] = round(sec, 3)
        out[f"{name}_rps"] = round(n / sec)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
