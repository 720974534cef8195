"""Prometheus exposition renderer (streaming/metrics.py metrics_text) —
the reference sql-exporter parity surface
(deploy/cht_sync/templates/sql-exporter-config.yaml:19-90).

Pinned: the render is a pure driver-side property read (ZERO Spark jobs
by default — asserted via the scheduler's job counter); names/labels/
values match the reference's metric set (progress sequence, pending,
liveness window, model latency) for a known pipeline state; the
liveness gauge flips with the injected clock; the opt-in
cht_sync_model_exec_time_ms family appears only with include_model_runs
and carries the completed runs' exec_ms. Reference names whose UNIT
differs here carry engine-native unit-bearing names (ADVICE r4):
dbt_latency (seconds) -> cht_sync_model_epoch_lag (epochs),
dbt_execution_time (seconds) -> cht_sync_model_exec_time_ms — the
verbatim reference names must NOT appear in the exposition.
"""

from __future__ import annotations

from cht_sync_spark.operators.models import CONV_PROFILES, CONVERSATIONS
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming import ChangelogConsumer, ReplayPipeline, metrics_text


def _parse(text: str) -> dict[str, float]:
    out = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, val = line.rsplit(" ", 1)
        out[name] = int(val) if val.lstrip("-").isdigit() else float(val)
    return out


def test_metrics_text_golden(spark, feed_path, tmp_path):
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    pipe = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), batch_size=10_000, num_buckets=4,
        models=[
            (CONVERSATIONS, str(tmp_path / "conv")),
            (CONV_PROFILES, str(tmp_path / "prof")),
        ],
        model_runs_path=str(tmp_path / "runs"),
        table_properties={"cdc.enabled": "true"},
    )
    pipe.run()
    tgt = ChangelogConsumer.create_target(spark, pipe.table, str(tmp_path / "m"), "mirror")
    cons = ChangelogConsumer(spark, pipe.table, tgt, "mirror")
    pipe.consumers.append(cons)

    cps = {
        (r["source"], r["partition_id"]): r
        for r in pipe.checkpoints().collect()
    }
    upd_ms = max(
        int(r["updated_at"].timestamp() * 1000) for r in cps.values()
    )

    # -- zero Spark jobs: the default render is driver-side metadata only
    # (any job submitted inside the tagged group would show up here)
    sc = spark.sparkContext
    sc.setJobGroup("metrics_render_check", "must submit nothing")
    try:
        text = metrics_text(pipe, now_ms=upd_ms + 1_000)
    finally:
        sc.setJobGroup("", "")
    assert list(sc.statusTracker().getJobIdsForGroup("metrics_render_check")) == []

    got = _parse(text)
    # progress sequence/pending per (source, partition) — the
    # couch2pg_progress_* parity rows, exact values from the checkpoints
    from cht_sync_spark.streaming.metrics import _labels, _src_labels

    def lab(src, part):
        return _labels(**_src_labels(src), partition=str(part))

    for (src, part), r in cps.items():
        assert got[f"couch2pg_progress_sequence{lab(src, part)}"] == r["seq"]
        assert got[f"couch2pg_up{lab(src, part)}"] == 1  # inside the window
    assert sum(
        v for k, v in got.items() if k.startswith("couch2pg_progress_pending")
    ) == 0  # fully drained feed
    # models finished the same epochs as the landing -> zero latency;
    # the reference's seconds-unit name must not leak into our
    # epochs-unit gauge (a ported alert rule would misread it)
    assert not any(k.startswith("dbt_latency") for k in got)
    assert got['cht_sync_model_epoch_lag{model="conversations"}'] == 0
    assert got['cht_sync_model_epoch_lag{model="conv_profiles"}'] == 0
    # attached consumer has not applied anything yet -> real lag surfaces
    assert got['cht_sync_consumer_pending_versions{consumer="mirror"}'] > 0
    cons.run()
    drained = _parse(metrics_text(pipe, now_ms=upd_ms + 1_000))
    assert drained['cht_sync_consumer_pending_versions{consumer="mirror"}'] == 0

    # liveness window: one minute after the last update the gauge drops
    stale = _parse(metrics_text(pipe, now_ms=upd_ms + 61_000))
    for (src, part) in cps:
        assert stale[f"couch2pg_up{lab(src, part)}"] == 0

    # no execution-time family unless opted in (it reads the runs table)
    assert "cht_sync_model_exec_time_ms" not in text
    with_runs = metrics_text(pipe, now_ms=upd_ms + 1_000, include_model_runs=True)
    runs = _parse(with_runs)
    # seconds-unit reference name must not be an emitted metric
    assert not any(k.startswith("dbt_execution_time") for k in runs)
    assert runs['cht_sync_model_exec_time_ms{model="conversations"}'] >= 0
    assert runs['cht_sync_model_exec_time_ms{model="conv_profiles"}'] >= 0


def test_metrics_instance_split_and_escaping(spark, tmp_path):
    """'instance/db' sources split into (cht_instance, db) labels like the
    reference's split_part pair; label values escape quotes/backslashes."""
    from cht_sync_spark.streaming.metrics import _labels, _src_labels

    assert _src_labels("hosta/db1") == {"db": "db1", "cht_instance": "hosta"}
    assert _src_labels("plain") == {"db": "plain"}
    assert _labels(db='we"ird\\x') == '{db="we\\"ird\\\\x"}'
    assert _labels() == ""
