"""Gap-based sessionization — batch and stateful-streaming twins.

The reference has no sessionization, but its session-table domain
(user_sessions with start/end times, final-module-3/airflow/dags/
seed_mongo.py:113-133) makes it the natural custom STATEFUL operator
for the Spark-native streaming extension (SURVEY §2.9): group events
by user, close a session when the gap to the next event exceeds
``gap_seconds``.

- ``sessionize_batch``: lag-gap flag + running sum over a per-user
  window -> session ids -> per-session aggregate. Pure DataFrame ops,
  two shuffles on user_id (window + groupBy share the same hash
  partitioning, so Catalyst reuses the exchange). SQL-expressible,
  oracle-checked.
- ``sessionize_stream``: the same semantics as an
  ``applyInPandasWithState`` operator — per-user state carries the
  open session across micro-batches; closed sessions are emitted in
  append mode. This is the piece plain watermarked windows cannot
  express (session windows have data-driven, unaligned boundaries).

Scale notes: state per user is one fixed-size tuple — memory is
O(active users), not O(events). At 100 TB the batch variant's window
is per-user (parallel, no global sort); the stream variant shuffles
each micro-batch once on user_id. Production hardening would add an
event-time timeout (GroupStateTimeout.EventTimeTimeout) to evict
users idle past the watermark; the availableNow replay used in tests
processes time-ordered files, which the in-batch sort covers.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.exact import as_value, units_sum

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        # exact integer cent units, NOT a float accumulator — matches the
        # units_sum contract of the batch twins (functions/exact.py) so a
        # long session cannot drift a cent via float error or banker's
        # rounding at emit
        T.StructField("total_cents", T.LongType()),
    ]
)


def _epoch_micros(df: DataFrame, ts_col: str) -> F.Column:
    """Epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ inputs.

    Parquet written without the UTC-adjusted flag reads as
    TIMESTAMP_NTZ under Spark's NTZ inference, and ``unix_micros``
    accepts only TIMESTAMP. For NTZ, measure from an NTZ epoch literal
    with ``timestamp_diff`` — deterministic and independent of
    ``spark.sql.session.timeZone`` (casting NTZ to TIMESTAMP would
    re-interpret the wall time in the session zone, shifting gaps
    across DST transitions).
    """
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", epoch, F.col(ts_col))
    return F.unix_micros(F.col(ts_col))


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user gap sessions: (user_id, session_start, session_end,
    n_events, total_value), one row per session. ``total_value`` sums
    in exact cent units to stay engine-independent."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = _epoch_micros(events, ts_col)
    new_session = (
        F.when(
            us - F.lag(us).over(w) > gap_seconds * 1_000_000, F.lit(1)
        )
        .otherwise(F.lit(0))
    )
    with_sid = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    ).withColumn(
        "session_id",
        F.sum(new_session).over(
            Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            as_value(units_sum(F.coalesce(F.col("value"), F.lit(0.0)))).alias(
                "total_value"
            ),
        )
        .drop("session_id")
    )


def _make_sessionizer(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def sessionize(key: tuple, pdfs: Iterator[Any], state: Any) -> Iterator[Any]:
        import pandas as pd

        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            start_us, last_us, n, cents = state.get
        else:
            start_us, last_us, n, cents = None, None, 0, 0
        closed: list[tuple] = []
        for ts, val in zip(rows["ts"], rows["value"]):
            us = int(ts.value // 1_000)  # pandas ns -> us
            if last_us is not None and us - last_us > gap_us:
                closed.append((key[0], start_us, last_us, n, cents / 100.0))
                start_us, n, cents = None, 0, 0
            if start_us is None:
                start_us = us
            last_us = us
            n += 1
            if val == val and val is not None:  # NaN/None guard
                # half-up to cents on ingest (values are non-negative),
                # mirroring units() = round(x * 100) in the batch twins
                cents += int(float(val) * 100.0 + 0.5)
        state.update((start_us, last_us, n, cents))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return sessionize


def sessionize_stream(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Stateful-streaming sessionization over a (user_id, ts, value)
    stream. Emits a session's row once a later event closes it; the
    open tail session stays in state (see module docstring for the
    production timeout story)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_native(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The built-in form: ``F.session_window`` (Spark 3.2+) — dynamic
    merge-on-overlap session windows, usable identically in batch and
    Structured Streaming (with a watermark).

    Boundary semantics differ from sessionize_batch at EXACT gap
    distance: session_window closes when the next event is >= gap
    away, the lag-based form closes only when it is > gap. Pick one
    contract per pipeline; tests assert equivalence under a gap that
    cannot tie.
    """
    return (
        events.groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            as_value(units_sum(F.coalesce(F.col(value_col), F.lit(0.0)))).alias(
                "total_value"
            ),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )
