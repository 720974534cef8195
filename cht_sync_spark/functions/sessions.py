"""Sessionization — assemble event streams into gap-bounded sessions.

A training-data pipeline over transcripts/events constantly needs this
shape: "group each actor's events into sessions separated by >gap of
silence, then roll each session up into one training example / feature
row". The reference has no analogue (SURVEY.md §2.6 — its feed is totally
seq-ordered, so event-time sessions never arise); this is one of the
beyond-reference LLM-pipeline operators, same tier as dedup/similarity.

Spark-first design
------------------

The batch form is ONE native ``F.session_window`` aggregation — Catalyst's
``MergingSessionsExec`` assembles sessions inside a single shuffle keyed by
the user column (partial merge map-side, final merge reduce-side; no
window-function sort-the-world pass, no Python). At 100 TB this is exactly
one keyed exchange, skew handled by AQE like any other aggregation.

Boundary semantics (pinned by test and by the DuckDB oracle): Spark merges
an event at EXACTLY ``prev_ts + gap`` into the running session — a new
session starts only when ``ts - prev_ts > gap`` (strict). The oracle's
gaps-and-islands form therefore flags ``> INTERVAL``, not ``>=``.

The streaming forms live in :mod:`cht_sync_spark.streaming.sessions`:
the same ``session_window`` aggregate under a watermark (late data
dropped, state bounded), and an ``applyInPandasWithState`` variant for
session payloads an algebraic aggregate cannot express (the ordered
per-session event sequence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# canonical output schema shared by the batch form, the streaming
# session_window form, and the stateful form (minus columns noted there)
SESSION_COLS = [
    "user_id", "session_start", "session_end", "n_events",
    "n_event_types", "total_value",
]


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-bounded sessions per user: one ``session_window`` aggregation.

    Returns one row per (user, session): actual event-time bounds
    (min/max ts — not the window's ``end = last_ts + gap`` convention,
    which would bake the gap parameter into the output), event count,
    distinct event-type count, and the summed ``value`` (decimal-summed
    then rounded, the repo's oracle-stable float convention).
    """
    ts = F.col(ts_col).cast("timestamp")
    return (
        events.groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(ts, gap),
        )
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .select(*SESSION_COLS)
    )


def sessionize_oracle_sql(gap_minutes: int = 30) -> str:
    """ANSI-SQL gaps-and-islands twin of :func:`sessionize` for DuckDB.

    lag() flags a session break strictly AFTER the gap (Spark merges the
    exactly-at-gap event), a running sum numbers the islands, and the
    final rollup mirrors the Spark aggregate column-for-column.
    """
    return (
        "WITH flg AS ("
        "  SELECT user_id, ts, event_type, value,"
        "         CASE WHEN lag(ts) OVER w IS NULL"
        f"              OR ts - lag(ts) OVER w > INTERVAL '{gap_minutes} minutes'"
        "              THEN 1 ELSE 0 END AS new_s"
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)"
        "), sess AS ("
        "  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts"
        "                             ROWS UNBOUNDED PRECEDING) AS sid"
        "  FROM flg)"
        " SELECT user_id,"
        "        min(ts) AS session_start,"
        "        max(ts) AS session_end,"
        "        count(*) AS n_events,"
        "        count(DISTINCT event_type) AS n_event_types,"
        "        round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)"
        "          AS total_value"
        " FROM sess GROUP BY user_id, sid"
    )
