"""Prometheus exposition rendering of the engine's own bookkeeping —
the reference's sql-exporter parity surface
(deploy/cht_sync/templates/sql-exporter-config.yaml:19-90: couch2pg
progress sequence/pending/liveness per (instance, db), dbt latency and
per-model execution time scraped from Postgres tables).

This engine computes every underlying number already — per-(source,
partition) checkpoints, per-model epoch markers, attached-consumer
cursors — and commits them ATOMICALLY with the data they describe, so
the renderer is a pure DRIVER-SIDE property read: zero Spark jobs, zero
table scans, safe to wire to a scrape endpoint at any cadence. (The
reference needs a sidecar Postgres poller because its progress lives in
tables; ours lives in snapshot metadata.)

Reference metric names are kept verbatim ONLY where both the semantic
and the unit match (``couch2pg_progress_sequence``,
``couch2pg_progress_pending``, ``couch2pg_up``); everything else uses an
engine-native ``cht_sync_`` name with the unit in the name, so a
dashboard or alert rule ported from the reference's sql-exporter config
can never silently misread a gauge whose unit changed (ADVICE r4: the
reference's ``dbt_latency`` is SECONDS — Postgres timestamps are its
only watermark — while this engine's freshness domain is ingest epochs,
hence ``cht_sync_model_epoch_lag``; its ``dbt_execution_time`` is dbt's
seconds-float, ours is ``cht_sync_model_exec_time_ms``).
``cht_sync_model_exec_time_ms`` requires the run-stats table and is
therefore OPT-IN (``include_model_runs=True`` — the one call that runs
a, tiny, Spark read).
"""

from __future__ import annotations

import json
import re
import time

__all__ = ["metrics_text", "render_metrics"]

_CKPT_PART = re.compile(r"^ckpt_part\.(\d+)\.(.+)$")
# the reference's liveness window: updated within the last minute
LIVENESS_WINDOW_MS = 60_000


def _esc(v: str) -> str:
    return str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _labels(**kv) -> str:
    inner = ",".join(f'{k}="{_esc(v)}"' for k, v in kv.items() if v is not None)
    return "{" + inner + "}" if inner else ""


def _src_labels(source: str) -> dict:
    # reference splits 'instance/db' (sql-exporter-config.yaml:26-27);
    # a plain source name is its own db with no instance label
    if "/" in source:
        inst, db = source.split("/", 1)
        return {"db": db, "cht_instance": inst}
    return {"db": source}


def render_metrics(families: list[tuple[str, str, str, list[tuple[dict, float]]]]) -> str:
    """families = [(name, type, help, [(labels, value), ...])] -> text."""
    out: list[str] = []
    for name, typ, help_, samples in families:
        if not samples:
            continue
        out.append(f"# HELP {name} {help_}")
        out.append(f"# TYPE {name} {typ}")
        for labels, value in samples:
            v = int(value) if float(value).is_integer() else value
            out.append(f"{name}{_labels(**labels)} {v}")
    return "\n".join(out) + "\n"


def metrics_text(
    pipe,
    now_ms: int | None = None,
    include_model_runs: bool = False,
) -> str:
    """Prometheus text exposition of a :class:`ReplayPipeline`'s state.

    Driver-side only: landing checkpoint properties (sequence, pending,
    rows, liveness per (source, partition)), per-model epoch lag (landing
    epoch marker vs each model table's committed epoch marker), and
    attached consumers' pending source versions (cursor property vs the
    source tip — the O(1) lag probe). ``now_ms`` is injectable for
    deterministic tests; it only feeds the ``couch2pg_up`` window.
    """
    now = int(time.time() * 1000) if now_ms is None else int(now_ms)
    props = pipe.table.snapshot().properties

    seq_s: list[tuple[dict, float]] = []
    pend_s: list[tuple[dict, float]] = []
    rows_s: list[tuple[dict, float]] = []
    up_s: list[tuple[dict, float]] = []
    for k, v in sorted(props.items()):
        m = _CKPT_PART.match(k)
        if not m:
            continue
        d = json.loads(v)
        lab = {**_src_labels(m.group(2)), "partition": m.group(1)}
        seq_s.append((lab, int(d["seq"])))
        if d.get("pending") is not None:
            pend_s.append((lab, int(d["pending"])))
        if d.get("rows") is not None:
            rows_s.append((lab, int(d["rows"])))
        upd = d.get("updated_at")
        live = 1 if (upd is not None and now - int(upd) <= LIVENESS_WINDOW_MS) else 0
        up_s.append((lab, live))

    # model-plane freshness from pure metadata: the landing marker's last
    # applied epoch vs each model table's committed epoch marker
    lag_s: list[tuple[dict, float]] = []
    _, landing_epoch = pipe.state()
    for runner in getattr(pipe, "models", []):
        lag_s.append(
            (
                {"model": runner.spec.name},
                max(0, landing_epoch - runner.last_epoch()),
            )
        )

    # attached changelog consumers: versions of the landing not yet applied
    cons_s: list[tuple[dict, float]] = []
    for c in getattr(pipe, "consumers", []):
        cons_s.append(({"consumer": c.name}, c.pending_versions()))

    fams: list = [
        (
            "couch2pg_progress_sequence", "counter",
            "current sequence number for the changes-feed ingest",
            seq_s,
        ),
        (
            "couch2pg_progress_pending", "gauge",
            "approximate number of changes left to sync into the landing table",
            pend_s,
        ),
        (
            "cht_sync_rows_upserted_total", "counter",
            "rows upserted into the landing table per (source, partition)",
            rows_s,
        ),
        (
            "couch2pg_up", "gauge",
            "1 if the ingest updated this checkpoint in the last minute, 0 if not",
            up_s,
        ),
        (
            "cht_sync_model_epoch_lag", "gauge",
            "ingest epochs the model lags behind the landing table "
            "(0 = current; the reference's dbt_latency, which is seconds)",
            lag_s,
        ),
        (
            "cht_sync_consumer_pending_versions", "gauge",
            "landing snapshots an attached consumer has not applied yet",
            cons_s,
        ),
    ]

    if include_model_runs:
        # execution-time parity (the reference's dbt_execution_time) needs
        # the run-stats records — one tiny Spark read of the 1-bucket runs
        # table, opt-in by contract
        exec_s: list[tuple[dict, float]] = []
        runs = pipe.model_runs()
        from pyspark.sql import functions as F

        last = (
            runs.where(F.col("completed") == 1)
            .groupBy("model")
            .agg(F.max_by("exec_ms", "epoch").alias("exec_ms"))
            .collect()
        )
        for r in sorted(last, key=lambda r: r["model"]):
            exec_s.append(({"model": r["model"]}, int(r["exec_ms"])))
        fams.append(
            (
                "cht_sync_model_exec_time_ms", "gauge",
                "last completed model run execution time in milliseconds "
                "(the reference's dbt_execution_time, which is seconds)",
                exec_s,
            )
        )

    return render_metrics(fams)
