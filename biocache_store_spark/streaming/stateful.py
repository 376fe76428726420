"""Custom stateful streaming operators via applyInPandasWithState.

The batch engine expresses sessionization as lag/cumsum windows
(queries/events.py); on an unbounded stream that shape needs per-key state.
This module implements the canonical custom-stateful-operator pattern the
reference's incremental processing implies (process-new-records loops,
tool/ProcessRecords.scala) re-expressed as Structured Streaming state:

  * per-key state lives in the state store (checkpointed, exactly-once);
  * closed sessions are emitted eagerly as soon as a later event proves the
    gap (no watermark wait for the common case);
  * still-open sessions flush through an event-time timeout once the
    watermark passes session_end + gap, so quiet keys terminate.

State is kept as integer epoch-microseconds (tz-independent, cheap to
serialize); timestamps are rebuilt only at the output boundary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _session_schema(key_name: str, key_type: T.DataType) -> T.StructType:
    """Output schema keyed by the ACTUAL grouping column's name and type —
    a hardcoded long user_id would fail at Arrow conversion the moment a
    caller groups by a string device/session key."""
    return T.StructType(
        [
            T.StructField(key_name, key_type),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )


SESSION_SCHEMA = _session_schema("user_id", T.LongType())

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 seconds",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming per-user sessionization (gap-based), one state entry per
    live user. Input must be a streaming DataFrame with a timestamp
    `ts_col`. Returns the stream of CLOSED sessions."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000
    # applyInPandasWithState delivers timestamps as naive values localized
    # to the SESSION timezone, but setTimeoutTimestamp compares against the
    # true-UTC watermark — the naive epoch must be converted through the
    # session tz or timeouts skew by the offset (an eastern tz flushes
    # hours late; a western one can throw "timeout before watermark")
    session_tz = events.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    ) or "UTC"

    def _true_epoch_ms(naive_us: int) -> int:
        ts = pd.Timestamp(naive_us, unit="us").tz_localize(
            session_tz, ambiguous=True, nonexistent="shift_forward"
        )
        return ts.value // 1_000_000

    def assemble(key, pdfs, state: GroupState):
        (user,) = key

        def to_row(start_us: int, last_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    key_name: [user],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield to_row(start_us, last_us, n)
            return

        batch = pd.concat(list(pdfs))
        # .value is nanoseconds since epoch; truncate to microseconds
        stamps = sorted(int(t.value) // 1000 for t in batch[ts_col])
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        closed = []
        for t_us in stamps:
            if start_us is None:
                start_us, last_us, n = t_us, t_us, 1
            elif t_us - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t_us, t_us, 1
            else:
                # a late-but-admissible event can precede the stored
                # session start — the session must extend backwards too
                start_us = min(start_us, t_us)
                last_us, n = max(last_us, t_us), n + 1
        state.update((start_us, last_us, n))
        # flush the open session once the watermark passes last + gap
        state.setTimeoutTimestamp(_true_epoch_ms(last_us + gap_us))
        for s in closed:
            yield to_row(*s)

    key_name = user_col
    out_schema = _session_schema(user_col, events.schema[user_col].dataType)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            assemble,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
