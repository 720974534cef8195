"""Sequential-apply oracle (FIXTURES.md §7).

Independently computes the expected final table state by replaying the
change feed one event at a time in plain Python — the semantics the
reference's e2e suite asserts (tests/e2e-test.spec.js): keep the
highest-(rev_height, live-beats-deleted, rev, seq) version per id; models
additionally drop tombstone winners. Deliberately shares NO code with the
engine's window/merge path.
"""

from __future__ import annotations

import json
import re
from typing import Any

_SAN = re.compile(r"(\\+u0000)|\x00")


def _key(ev: dict[str, Any]) -> tuple:
    height = int(ev["rev"].split("-", 1)[0])
    live = 0 if ev["op"] != "delete" else 1  # live sorts as "greater" priority
    # comparator tuple: larger wins
    return (height, 1 - live, ev["rev"], ev["seq"])


def expected_state(events: list[dict[str, Any]], drop_tombstones: bool = False) -> dict[str, dict]:
    winners: dict[str, dict] = {}
    for ev in sorted(events, key=lambda e: e["seq"]):
        cur = winners.get(ev["id"])
        if cur is None or _key(ev) > _key(cur):
            winners[ev["id"]] = ev

    out: dict[str, dict] = {}
    for _id, ev in winners.items():
        deleted = ev["op"] == "delete"
        if deleted and drop_tombstones:
            continue
        row: dict[str, Any] = {
            "_id": _id,
            "_rev": ev["rev"],
            "_deleted": deleted,
            "source": ev["source"],
            "seq": ev["seq"],
            "rev_height": int(ev["rev"].split("-", 1)[0]),
        }
        if ev["doc"] is None:
            conv, _, turn = _id.rpartition(":")
            row.update({"conv_id": conv, "turn_idx": int(turn), "role": None, "text": None, "tool": None, "ts_ms": None})
        else:
            d = json.loads(_SAN.sub("", ev["doc"]))
            if d.get("type") == "user":
                for k in ("password_scheme", "derived_key", "salt"):
                    d.pop(k, None)
            row.update(
                {
                    "conv_id": d.get("conv_id"),
                    "turn_idx": d.get("turn_idx"),
                    "role": d.get("role"),
                    "text": d.get("text"),
                    "tool": d.get("tool"),
                    "ts_ms": d.get("ts"),
                }
            )
        out[_id] = row
    return out


COMPARE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts_ms", "_id", "_rev", "_deleted", "source", "seq", "rev_height"]


def table_to_state(rows: list[dict[str, Any]]) -> dict[str, dict]:
    from datetime import timezone

    out = {}
    for r in rows:
        ts = r.get("ts")
        # Spark collects session-TZ (UTC) naive datetimes; pin UTC explicitly
        ts_ms = int(ts.replace(tzinfo=timezone.utc).timestamp() * 1000) if ts is not None else None
        out[r["_id"]] = {
            **{c: r.get(c) for c in COMPARE_COLS if c != "ts_ms"},
            "ts_ms": ts_ms,
        }
    return out
