"""User-assertion workflow: add/delete user assertions and the combined
qa-status recalculation.

Re-expresses the reference's per-record user-assertion lifecycle
(Store.scala:332-412 getUserAssertions/addUserAssertion/deleteUserAssertion;
dao/OccurrenceDAOImpl.scala:892-925 addUserAssertion, :956-995
deleteUserAssertion, :1003-1086 getCombinedUserStatus, :1089-1160
updateAssertionStatus) as whole-table DataFrame operations: the assertions
store is a (rowKey, uuid)-keyed table, add/delete are Delta-style rewrites
(union / anti-join, the operators/maintenance.py pattern), and the combined
status is one aggregation pipeline — groupBy/window on rowKey, broadcast-free,
so it scales as a plain shuffle on the record key.

State model (vocab/AssertionStatus.scala:12-18):
  QA_OPEN_ISSUE = 50001   admin verified, flagged still-a-problem
  QA_VERIFIED   = 50002   admin verified as correct
  QA_CORRECTED  = 50003   data custodian corrected the record
  QA_NONE       = 50004   no user assertions exist
  QA_UNCONFIRMED= 50005   user assertion awaiting admin verification
A verification row carries code 50000 (AssertionCodes.VERIFIED) and points
at the assertion it verifies via related_uuid; its record_num mirrors the
reference's referenceRowKey "rowKey|userId|code|recNum" counter
(OccurrenceDAOImpl.scala:869-887 getNextVerifiedRecordNumber).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

VERIFIED_CODE = 50000

QA_OPEN_ISSUE = 50001
QA_VERIFIED = 50002
QA_CORRECTED = 50003
QA_NONE = 50004
QA_UNCONFIRMED = 50005

# AssertionStatus.isUserAssertionType (AssertionStatus.scala:20-22);
# UNCHECKED is 2 in the reference's status vocabulary
UNCHECKED = 2
_USER_ASSERTION_STATUSES = (
    QA_OPEN_ISSUE,
    QA_UNCONFIRMED,
    QA_NONE,
    QA_VERIFIED,
    UNCHECKED,
)

USER_ASSERTION_SCHEMA = T.StructType(
    [
        T.StructField("rowKey", T.StringType()),
        T.StructField("uuid", T.StringType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("qa_status", T.IntegerType()),
        T.StructField("comment", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("related_uuid", T.StringType()),
        T.StructField("record_num", T.IntegerType()),
    ]
)


def empty_store(spark) -> DataFrame:
    # optimizer-visible empty relation: the seeded union in
    # add_user_assertions prunes away instead of carrying an opaque
    # empty-RDD scan branch through every lifecycle plan
    from biocache_store_spark.util import empty_df

    return empty_df(spark, USER_ASSERTION_SCHEMA)


def add_user_assertions(store: DataFrame, new_assertions: DataFrame) -> DataFrame:
    """Upsert user assertions by (rowKey, uuid) — the reference's put is
    keyed, so re-adding an existing uuid (client retry, edited comment)
    REPLACES the stored row instead of duplicating it. A non-verification
    row is always stored unconfirmed (OccurrenceDAOImpl.scala:895-897:
    "if its not a verification of an existing assertion ... its
    unconfirmed")."""
    normalized = new_assertions.withColumn(
        "qa_status",
        F.when(F.col("code") != VERIFIED_CODE, F.lit(QA_UNCONFIRMED)).otherwise(
            F.col("qa_status")
        ),
    )
    merged = store.withColumn("__new", F.lit(0)).unionByName(
        normalized.withColumn("__new", F.lit(1)), allowMissingColumns=True
    )
    w = Window.partitionBy("rowKey", "uuid").orderBy(
        F.desc("__new"), F.desc_nulls_last("record_num")
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__new", "__rn")
    )


def delete_user_assertions(store: DataFrame, keys: DataFrame) -> DataFrame:
    """Delete by (rowKey, uuid) — the Store.deleteUserAssertion shape
    (Store.scala:396-405); the rewrite is an anti-join like the delete ops
    in operators/maintenance.py. Verification rows POINTING at a deleted
    assertion cascade with it: an orphaned verification would otherwise
    keep driving the combined status (e.g. QA_VERIFIED with zero
    assertions) — the reference never reads such rows because it walks
    verifications per surviving assertion."""
    trimmed = store.join(
        keys.select("rowKey", "uuid"), ["rowKey", "uuid"], "left_anti"
    )
    return trimmed.join(
        keys.select("rowKey", F.col("uuid").alias("related_uuid")),
        ["rowKey", "related_uuid"],
        "left_anti",
    )


def combined_user_status(store: DataFrame) -> DataFrame:
    """Per-record combined user-assertion status + outstanding assertions.

    Vectorizes OccurrenceDAOImpl.getCombinedUserStatus (scala:1003-1086):
      * latest verification per assertion = max record_num within
        (rowKey, related_uuid)
      * combined (outstanding) = user-type non-verification assertions with
        no verification pointing at them
      * status: outstanding>0 -> UNCONFIRMED; else any latest verification
        flagged OPEN_ISSUE -> OPEN_ISSUE (and the flagged assertions
        reopen); else the qa_status of the globally-latest verification;
        records with no rows at all simply have no output row (QA_NONE —
        apply via overlay_user_status).

    Returns: rowKey, user_assertion_status, outstanding_codes (sorted
    array<int>), outstanding_count.
    """
    verifications = store.filter(F.col("code") == VERIFIED_CODE)
    user_asserts = store.filter(
        (F.col("code") != VERIFIED_CODE)
        & F.col("qa_status").isin(*_USER_ASSERTION_STATUSES)
    )

    w = Window.partitionBy("rowKey", "related_uuid").orderBy(
        F.desc("record_num"), F.desc("uuid")
    )
    latest = (
        verifications.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # outstanding before the open-issue reopen: not covered by ANY latest
    # verification (scala:1049-1053)
    open_asserts = user_asserts.join(
        latest.select("rowKey", F.col("related_uuid").alias("uuid")),
        ["rowKey", "uuid"],
        "left_anti",
    )
    base = open_asserts.groupBy("rowKey").agg(
        F.count("*").alias("base_count"),
        F.sort_array(F.collect_list("code")).alias("base_codes"),
    )

    # struct(record_num, uuid) ordering key: cross-assertion record_num
    # ties are normal (the counter is per assertion), and bare max_by is
    # non-deterministic under ties — uuid makes the pick stable
    latest_agg = latest.groupBy("rowKey").agg(
        F.max_by(
            "qa_status", F.struct(F.col("record_num"), F.col("uuid"))
        ).alias("latest_status"),
        F.max((F.col("qa_status") == QA_OPEN_ISSUE).cast("int")).alias("any_open"),
    )

    # assertions reopened by an open-issue verification (scala:1074-1080)
    reopened = (
        user_asserts.join(
            latest.filter(F.col("qa_status") == QA_OPEN_ISSUE).select(
                "rowKey", F.col("related_uuid").alias("uuid")
            ),
            ["rowKey", "uuid"],
            "left_semi",
        )
        .groupBy("rowKey")
        .agg(
            F.count("*").alias("reopen_count"),
            F.sort_array(F.collect_list("code")).alias("reopen_codes"),
        )
    )

    empty_codes = F.array().cast("array<int>")
    out = (
        base.join(latest_agg, "rowKey", "full_outer")
        .join(reopened, "rowKey", "full_outer")
        .select(
            "rowKey",
            F.coalesce(F.col("base_count"), F.lit(0)).alias("base_count"),
            F.coalesce(F.col("base_codes"), empty_codes).alias("base_codes"),
            "latest_status",
            F.coalesce(F.col("any_open"), F.lit(0)).alias("any_open"),
            F.coalesce(F.col("reopen_count"), F.lit(0)).alias("reopen_count"),
            F.coalesce(F.col("reopen_codes"), empty_codes).alias("reopen_codes"),
        )
    )
    status = (
        F.when(F.col("base_count") > 0, F.lit(QA_UNCONFIRMED))
        .when(F.col("any_open") == 1, F.lit(QA_OPEN_ISSUE))
        .when(F.col("latest_status").isNotNull(), F.col("latest_status"))
        .otherwise(F.lit(QA_NONE))
    )
    # outstanding is either/or, exactly as the reference computes it
    # (OccurrenceDAOImpl.scala:1071-1082): unverified assertions when any
    # exist; ONLY when all assertions are verified does an OPEN_ISSUE
    # verification re-add (reopen) the assertions it points at. A record
    # with both unverified and reopened assertions reports just the
    # unverified ones — the scala `else` branch never runs when
    # combinedUserAssertions is non-empty.
    outstanding_codes = F.array_sort(
        F.when(F.col("base_count") > 0, F.col("base_codes"))
        .when(F.col("any_open") == 1, F.col("reopen_codes"))
        .otherwise(empty_codes)
    )
    return out.select(
        "rowKey",
        status.alias("user_assertion_status"),
        outstanding_codes.alias("outstanding_codes"),
        F.size(outstanding_codes).alias("outstanding_count"),
    )


def overlay_user_status(records: DataFrame, store: DataFrame, key_col: str = "rowKey") -> DataFrame:
    """The user_assertions index overlay (updateAssertionStatus effects,
    OccurrenceDAOImpl.scala:1089-1160 + addUserAssertion's userVerified
    column, scala:915-920): joins the combined status onto the records
    table, defaulting absent records to QA_NONE. user_verified mirrors
    "verified = status VERIFIED or CORRECTED" (scala:749)."""
    status = combined_user_status(store)
    joined = records.join(
        status.withColumnRenamed("rowKey", key_col), key_col, "left"
    )
    st = F.coalesce(F.col("user_assertion_status"), F.lit(QA_NONE))
    return (
        joined.withColumn("user_assertion_status", st)
        .withColumn(
            "outstanding_codes",
            F.coalesce(F.col("outstanding_codes"), F.array().cast("array<int>")),
        )
        .withColumn("outstanding_count", F.coalesce(F.col("outstanding_count"), F.lit(0)))
        .withColumn(
            "user_verified", st.isin(QA_VERIFIED, QA_CORRECTED)
        )
        .withColumn("has_user_assertions", F.col("outstanding_count") > 0)
    )
