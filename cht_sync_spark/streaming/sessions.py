"""Streaming sessionization — watermarked session windows and a custom
stateful operator (``applyInPandasWithState``).

The batch form (:mod:`cht_sync_spark.functions.sessions`) is one
``session_window`` aggregation. These are its streaming twins, the two
idiomatic Structured Streaming shapes for event-time sessions:

1. :func:`stream_sessionize` — the SAME ``session_window`` aggregate under
   ``withWatermark``: Spark's session-merging state store assembles
   sessions incrementally and the watermark bounds state (sessions whose
   window end has passed it are finalized and evicted). Append mode: a
   session row is emitted exactly once, when the watermark passes its
   window end. This is the at-scale shape — state is per-open-session,
   not per-event, and the shuffle is the same single user-keyed exchange
   as the batch form.

2. :func:`stream_session_examples` — ``applyInPandasWithState`` with
   event-time timeouts, for session PAYLOADS an algebraic aggregate cannot
   express: here the ordered per-session event-type sequence (the
   "training example" assembly — concatenating a session's events into one
   sample). State per (user): the open session's bounds, count, and ordered
   event list; a batch's events are split on >gap silences (closed sessions
   emit immediately), the still-open tail re-arms an event-time timeout at
   ``last_ts + gap``, and the timeout firing (watermark passed the gap)
   emits the final session. Arrow-batched both directions — no per-row
   Python.

Late data (pinned empirically on Spark 4.1.2, tests/test_sessions.py):
the two forms differ, and the difference is part of the contract. The
``session_window`` aggregate does NOT filter a late row whose session is
still in the state store — the row merges into the open session and the
merged session is emitted once on eviction (Spark's late-row discard for
session windows keys on state eviction, not on a row-level event-time
comparison). The stateful form drops late-beyond-watermark rows
EXPLICITLY (``applyInPandasWithState`` delivers late rows to the user
function and leaves the policy to it); an ingest pipeline that needs a
hard late cutoff uses the stateful form or pre-filters. The batch form
has no late data — it sees the closed corpus. End-of-stream: sessions
still open when the input drains are held in state until the watermark
passes their gap; Spark's no-data micro-batch (on by default) fires the
remaining timeouts once a later event advances the watermark, so a drain
test appends one far-future flush event to close the books.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# event schema expected from the feed directory (the testdata `events`
# shape; extra columns pass through the watermark untouched)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("event_seq", T.StringType(), True),
    ]
)

# applyInPandasWithState state row: open-session bounds (epoch micros —
# timestamps in state structs round-trip less portably than longs),
# event count, and the ordered event-type sequence so far
_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("seq", T.StringType(), True),
    ]
)


def _events_stream(
    spark: SparkSession, feed_dir: str, max_files_per_trigger: int
) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(feed_dir)
    )


def stream_sessionize(
    spark: SparkSession,
    feed_dir: str,
    out_path: str,
    checkpoint_dir: str,
    *,
    gap: str = "30 minutes",
    watermark: str = "1 seconds",
    max_files_per_trigger: int = 1,
    timeout_sec: float = 300.0,
) -> None:
    """Drain ``feed_dir`` through a watermarked ``session_window``
    aggregation into parquet at ``out_path`` (availableNow trigger).

    Emits the batch form's columns minus ``n_event_types`` (exact distinct
    counts are not expressible in an append-mode streaming aggregate;
    ``approx_count_distinct`` would be the streaming answer but breaks
    batch-parity tests) — the parity contract with
    :func:`~cht_sync_spark.functions.sessions.sessionize` on the common
    columns is pinned in tests/test_sessions.py.
    """
    ev = _events_stream(spark, feed_dir, max_files_per_trigger).withWatermark(
        "ts", watermark
    )
    agg = (
        ev.groupBy(F.col("user_id"), F.session_window(F.col("ts"), gap))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):  # pragma: no cover - hang guard
        q.stop()
        raise TimeoutError(f"availableNow session drain incomplete after {timeout_sec}s")


def _session_examples_fn(gap_us: int):
    """Build the per-group stateful function (closure over the gap)."""

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key

        def emit(start_us: int, last_us: int, n: int, seq: str) -> "pd.DataFrame":
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "event_seq": [seq],
                }
            )

        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session is final
            start_us, last_us, n, seq = state.get
            state.remove()
            yield emit(start_us, last_us, n, seq)
            return

        # fold this batch's events (may span several sessions) onto the
        # open-session state; closed sessions emit immediately
        open_s = state.get if state.exists else None
        events = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        # normalize to µs regardless of the Arrow->pandas resolution
        # (datetime64[ns] on pandas 1.x, [us] possible on 2.x)
        ts_us = events["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        types = events["event_type"].astype(str).to_numpy()
        # explicit late-data policy: applyInPandasWithState hands late rows
        # to the user function (unlike built-in aggregates, no automatic
        # discard) — drop rows older than the current watermark so a
        # replayed straggler cannot reopen or corrupt an emitted session
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us > 0:
            keep = ts_us >= wm_us
            ts_us, types = ts_us[keep], types[keep]
        if len(ts_us) == 0:
            if open_s is not None:
                state.update(open_s)
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max(open_s[1] // 1000 + gap_us // 1000, wm_ms + 1)
                )
            return
        out: list["pd.DataFrame"] = []
        for t_us, etype in zip(ts_us, types):
            if open_s is None:
                open_s = (int(t_us), int(t_us), 1, etype)
                continue
            start_us, last_us, n, seq = open_s
            if t_us - last_us > gap_us:
                out.append(emit(start_us, last_us, n, seq))
                open_s = (int(t_us), int(t_us), 1, etype)
            else:
                # late-but-within-gap event: fold bounds monotonically
                open_s = (
                    min(start_us, int(t_us)),
                    max(last_us, int(t_us)),
                    n + 1,
                    seq + "," + etype,
                )
        assert open_s is not None
        state.update(open_s)
        # re-arm: fire when the watermark passes the session's gap. Spark
        # requires the timeout to sit strictly beyond the current watermark
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(open_s[1] // 1000 + gap_us // 1000, wm_ms + 1))
        yield from out

    return fn


def stream_session_examples(
    spark: SparkSession,
    feed_dir: str,
    out_path: str,
    checkpoint_dir: str,
    *,
    gap: str = "30 minutes",
    watermark: str = "1 seconds",
    max_files_per_trigger: int = 1,
    timeout_sec: float = 300.0,
) -> None:
    """Custom stateful sessionizer: per-user open-session state, event-time
    timeouts, ordered event-type sequence per session (availableNow drain
    into parquet at ``out_path``)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = _parse_interval_us(gap)
    ev = _events_stream(spark, feed_dir, max_files_per_trigger).withWatermark(
        "ts", watermark
    )
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        _session_examples_fn(gap_us),
        outputStructType=SESSION_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):  # pragma: no cover - hang guard
        q.stop()
        raise TimeoutError(f"availableNow session drain incomplete after {timeout_sec}s")


_UNITS_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
}


def _parse_interval_us(spec: str) -> int:
    n, unit = spec.strip().split()
    return int(n) * _UNITS_US[unit]
