"""Sessionization: batch session_window form, the watermarked streaming
form, and the applyInPandasWithState stateful form.

Pins (1) the exactly-at-gap merge boundary the DuckDB oracle encodes,
(2) batch/stream parity on a feed drained file-by-file (watermark
advancing between micro-batches), (3) late-beyond-watermark drop, and
(4) the stateful operator's non-algebraic payload (ordered per-session
event sequence) against hand-computed expectations.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from cht_sync_spark.functions.sessions import sessionize

BASE = dt.datetime(2025, 1, 1, 0, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


# (event_id, ts, user_id, event_type, value, props) — ts-ordered FILES so
# each micro-batch advances the watermark monotonically
FILES = [
    [  # f0
        (1, _m(0), 1, "click", 1.5, None),
        (2, _m(5), 2, "view", 2.0, None),
        (3, _m(10), 1, "view", 1.0, None),
    ],
    [  # f1: u1 event at exactly gap after 00:10 -> merges; u2 new session
        (4, _m(40), 1, "buy", 3.0, None),
        (5, _m(60), 2, "click", 4.0, None),
    ],
    [  # f2: event 6 is LATE beyond the watermark (wm ~ 00:59:59) -> dropped
        (6, _m(6), 2, "late", 9.0, None),
        (7, _m(80), 1, "click", 2.5, None),
    ],
    [  # f3: far-future flush advances the watermark past every open gap
        (99, BASE + dt.timedelta(days=1), 99, "flush", 0.0, None),
    ],
]

# expected sessions over the ON-TIME events, gap 30 minutes
# (user_id, start, end, n_events, total_value, event_seq)
EXPECTED = {
    (1, _m(0), _m(40), 3, 5.5, "click,view,buy"),
    (1, _m(80), _m(80), 1, 2.5, "click"),
    (2, _m(5), _m(5), 1, 2.0, "view"),
    (2, _m(60), _m(60), 1, 4.0, "click"),
}


@pytest.fixture(scope="module")
def feed_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sessions")
    feed = str(root / "feed")
    os.makedirs(feed)
    for i, rows in enumerate(FILES):
        stage = str(root / f"stage{i}")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(feed, f"f{i}.parquet")
        shutil.copy(part, dst)
        # file source orders by (mtime, path): make both agree with i
        os.utime(dst, (time.time() + i, time.time() + i))
    return feed


def test_boundary_exact_gap_merges(spark):
    """An event at EXACTLY prev_ts + gap extends the session; one second
    past splits — the semantics the gaps-and-islands oracle encodes with
    a strict '>' (functions/sessions.py)."""
    rows = [
        (1, _m(0), 10, "a", 0.0, None),
        (2, _m(30), 10, "a", 0.0, None),  # exactly gap -> same session
        (3, _m(0), 11, "a", 0.0, None),
        (4, _m(30) + dt.timedelta(seconds=1), 11, "a", 0.0, None),  # splits
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r.user_id, r.n_events)
        for r in sessionize(df, gap="30 minutes").collect()
    }
    assert got == {(10, 2), (11, 1)}


def _ontime_df(spark):
    rows = [r for f in FILES for r in f if r[3] not in ("late", "flush")]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_stream_sessionize_matches_batch(spark, feed_dir, tmp_path):
    """Watermarked session_window drain: open sessions flush once the
    watermark passes their gap (no-data micro-batch after the flush file)
    and every emitted row appears exactly once (append mode).

    Late-row semantics pinned here (Spark 4.1.2, see module docstring):
    the late event (id 6, ts 00:06, arriving when the watermark is already
    00:59:59) is NOT discarded — user 2's first session is still in the
    state store, so the row merges and the session emits as
    (00:05–00:06, n=2). The stateful form below drops it instead."""
    from cht_sync_spark.streaming.sessions import stream_sessionize

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_sessionize(
        spark, feed_dir, out, ckpt, gap="30 minutes", watermark="1 seconds"
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.read.parquet(out).where("user_id != 99").collect()
    }
    expected = {(u, s, e, n, v) for (u, s, e, n, v, _) in EXPECTED}
    expected.remove((2, _m(5), _m(5), 1, 2.0))
    expected.add((2, _m(5), _m(6), 2, 11.0))  # late row merged in-state
    assert got == expected

    # batch form over on-time events = the stateful form's contract
    batch = sessionize(_ontime_df(spark), gap="30 minutes")
    got_batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got_batch == {(u, s, e, n, v) for (u, s, e, n, v, _) in EXPECTED}


def test_stream_session_examples_stateful(spark, feed_dir, tmp_path):
    """applyInPandasWithState sessionizer: same session boundaries as the
    algebraic forms PLUS the ordered event-type sequence per session (the
    payload a streaming aggregate cannot express)."""
    from cht_sync_spark.streaming.sessions import stream_session_examples

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_session_examples(
        spark, feed_dir, out, ckpt, gap="30 minutes", watermark="1 seconds"
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.event_seq)
        for r in spark.read.parquet(out).where("user_id != 99").collect()
    }
    assert got == {(u, s, e, n, q) for (u, s, e, n, _, q) in EXPECTED}


def test_stateful_multi_session_single_batch(spark, tmp_path):
    """One micro-batch containing several >gap silences for one user must
    emit every closed session immediately (the in-batch split path) and
    hold only the open tail in state."""
    from cht_sync_spark.streaming.sessions import stream_session_examples

    feed = str(tmp_path / "feed")
    rows = [
        (1, _m(0), 5, "a", 0.0, None),
        (2, _m(1), 5, "b", 0.0, None),
        (3, _m(90), 5, "c", 0.0, None),  # >gap: closes session 1 in-batch
        (4, BASE + dt.timedelta(days=1), 99, "flush", 0.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(feed)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_session_examples(
        spark, feed, out, ckpt, gap="30 minutes", watermark="1 seconds",
        max_files_per_trigger=8,
    )
    got = {
        (r.user_id, r.n_events, r.event_seq)
        for r in spark.read.parquet(out).where("user_id != 99").collect()
    }
    assert got == {(5, 2, "a,b"), (5, 1, "c")}
