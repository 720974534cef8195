"""CDC egress (sources/envelopes.py events_to_debezium) — the landing
table's changelog re-emitted as Debezium-shaped WAL envelopes.

Pinned: the full round trip — replay a synthetic CouchDB-changes feed into
a landing table, export its changelog as envelopes, re-ingest those
envelopes through the UNCHANGED pipeline (debezium_to_events → batch
planning → doc→row → LWW merge), and land byte-identical live state; op
attribution (c/u/d) with and without the preimage read; delete envelopes
carry the key with a content-free payload; per-key lsn monotonicity
across versions (the property that makes the round trip converge).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cht_sync_spark.schemas import LWW_ORDER, TRANSCRIPT, TRANSCRIPT_KEY
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.envelopes import debezium_to_events, events_to_debezium
from cht_sync_spark.sources.feedgen import write_feed
from cht_sync_spark.streaming.pipeline import ReplayPipeline
from cht_sync_spark.tables.format import SnapshotTable

LIVE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_export_roundtrip_converges(spark, feed_path, tmp_path):
    """landing A --export--> envelopes --reimport--> landing B: identical
    live transcript state (per-turn text equality under stable ordering)."""
    feed = ChangesFeedSource(spark, feed_path, sources=["synthhost/db0", "synthhost/db1"])
    a = ReplayPipeline(
        spark, feed, str(tmp_path / "a"), batch_size=400, num_buckets=8,
        table_properties={"cdc.enabled": "true"},  # exact COW change feed
    )
    a.run()

    env = events_to_debezium(a.table, from_version=1, db="rt")
    evts = debezium_to_events(env)
    rt_path = str(tmp_path / "rtfeed")
    write_feed(evts, rt_path, n_files=4)
    b = ReplayPipeline(
        spark, ChangesFeedSource(spark, rt_path, sources=["rt"]),
        str(tmp_path / "b"), batch_size=500, num_buckets=4,
    )
    b.run()

    def live(t):
        return {
            (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"], r["ts"])
            for r in t.read_current(drop_tombstones=True).select(*LIVE_COLS).collect()
        }

    got_a, got_b = live(a.table), live(b.table)
    assert len(got_a) > 100
    assert got_a == got_b
    # deletes really crossed: A has tombstones, B must not resurrect them
    dels_a = a.table.read_current().where("_deleted").count()
    assert dels_a > 0
    assert b.table.read_current().where("_deleted").count() > 0


def _mk_table(spark, path):
    return SnapshotTable.create(
        spark, path, TRANSCRIPT, key_cols=TRANSCRIPT_KEY,
        num_buckets=4, sort_cols=TRANSCRIPT_KEY, lww_order=LWW_ORDER,
    )


def _row(conv, turn, text, h, deleted=False, tool=None):
    ts = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=h)
    return Row(
        conv_id=conv, turn_idx=turn, role="user" if turn % 2 == 0 else "assistant",
        text=text, tool=tool, ts=ts, _id=f"{conv}:{turn}", _rev=f"{h}-aa",
        _deleted=deleted, saved_timestamp=ts, source="s", seq=h, rev_height=h,
    )


def test_op_attribution_and_before_images(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    t.append_delta(spark.createDataFrame(
        [_row("k1", 0, "v1", 1), _row("k2", 0, "old", 1)], TRANSCRIPT))
    v1 = t.current_version()
    t.append_delta(spark.createDataFrame(
        [
            _row("k1", 0, "v2", 2, tool="search"),   # update of k1
            _row("k2", 0, None, 2, deleted=True),     # tombstone k2
            _row("k3", 0, "new", 2),                  # brand-new key
        ],
        TRANSCRIPT,
    ))

    # without preimage: live -> 'u', tombstone -> 'd' with key-stub before
    env = {
        (r["after"]["conv_id"] if r["after"] else r["before"]["conv_id"]): r
        for r in events_to_debezium(t, v1).collect()
    }
    assert {k: v["op"] for k, v in env.items()} == {"k1": "u", "k2": "d", "k3": "u"}
    d = env["k2"]
    assert d["after"] is None
    assert d["before"]["conv_id"] == "k2" and d["before"]["turn_idx"] == 0
    assert d["before"]["text"] is None and d["before"]["role"] is None

    # with preimage: insert/update split + real before images
    envb = {
        (r["after"]["conv_id"] if r["after"] else r["before"]["conv_id"]): r
        for r in events_to_debezium(t, v1, with_before=True).collect()
    }
    assert {k: v["op"] for k, v in envb.items()} == {"k1": "u", "k2": "d", "k3": "c"}
    assert envb["k1"]["before"]["text"] == "v1"
    assert envb["k1"]["after"]["text"] == "v2"
    assert envb["k2"]["before"]["text"] == "old"  # the deleted row's image
    assert envb["k3"]["before"] is None
    # envelope shape matches the ingest adapter's schema (round-trippable)
    assert debezium_to_events(events_to_debezium(t, v1, with_before=True)).count() == 3


def test_lsn_monotone_per_key_across_versions(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t2"))
    for h in (1, 2, 3):
        t.append_delta(spark.createDataFrame([_row("k", 0, f"v{h}", h)], TRANSCRIPT))
    rows = sorted(
        (r["source"]["tx_id"], r["source"]["lsn"])
        for r in events_to_debezium(t, 1).collect()
    )
    assert len(rows) == 3
    assert [v for v, _ in rows] == [2, 3, 4]
    lsns = [l for _, l in rows]
    assert lsns == sorted(lsns) and len(set(lsns)) == 3
    # re-applying the export lands the LAST version's image
    evts = debezium_to_events(
        events_to_debezium(t, 1, db="mono"), source_name=F.lit("mono")
    )
    from cht_sync_spark.operators.lww import lww_dedup  # noqa: F401  (import parity)

    last = evts.orderBy(F.desc("seq")).first()
    assert '"text":"v3"' in last["doc"].replace(" ", "")


def test_export_rejects_strict_over_rewrites(spark, tmp_path):
    """A COW-merged (overwrite) snapshot without CDF files is refused under
    strict — same contract as every changelog consumer — and delivered
    LWW-safely with strict=False."""
    t = _mk_table(spark, str(tmp_path / "t3"))
    t.append_delta(spark.createDataFrame([_row("k", 0, "v1", 1)], TRANSCRIPT))
    from cht_sync_spark.tables.merge import merge_upsert

    merge_upsert(t, spark.createDataFrame([_row("k", 0, "v2", 2)], TRANSCRIPT))
    with pytest.raises(ValueError, match="logical rewrite"):
        events_to_debezium(t, 1).collect()
    rows = events_to_debezium(t, 1, strict=False).collect()
    assert any(r["after"] and r["after"]["text"] == "v2" for r in rows)


def test_export_refuses_lsn_pack_overflow(spark, tmp_path):
    """The (version<<40)|md5_40 lsn pack overflows int64 at change version
    2^23; the export must refuse loudly instead of emitting
    negative/non-monotone log positions (mirror of the ingest-side
    pos < 2^32 binlog_seq gate)."""
    t = _mk_table(spark, str(tmp_path / "t4"))
    t.append_delta(spark.createDataFrame([_row("k", 0, "v1", 1)], TRANSCRIPT))
    with pytest.raises(ValueError, match="2\\^23"):
        events_to_debezium(t, 1, to_version=1 << 23)


def test_epoched_export_crosses_ceiling(spark, tmp_path):
    """VERDICT r4 #5: the 2^23 version ceiling gets an escape hatch.
    advance_lsn_epoch records a base; later versions export with
    source.lsn_epoch set and lsn packed RELATIVE to the base. Pins:
    epoch stamping per version range, per-key (epoch, lsn) AND folded-seq
    strict monotonicity across the bump, and round-trip convergence of an
    epoch-crossing export through the unchanged ingest adapter."""
    from cht_sync_spark.sources.envelopes import (
        LSN_EPOCH_PROP, advance_lsn_epoch, expected_wal_state,
    )

    t = _mk_table(spark, str(tmp_path / "ep"))
    # epoch 0: two versions of k plus a second key
    t.append_delta(spark.createDataFrame([_row("k", 0, "v1", 1)], TRANSCRIPT))
    t.append_delta(
        spark.createDataFrame([_row("k", 0, "v2", 2), _row("j", 1, "w1", 2)], TRANSCRIPT)
    )
    epoch = advance_lsn_epoch(t)
    assert epoch == 1
    base = t.current_version()  # the props-only commit's own version
    # epoch 1: k edited again, j deleted
    t.append_delta(spark.createDataFrame([_row("k", 0, "v3", 3)], TRANSCRIPT))
    t.append_delta(
        spark.createDataFrame([_row("j", 1, None, 4, deleted=True)], TRANSCRIPT)
    )

    env = events_to_debezium(t, from_version=1, db="ep").collect()
    by_ver = sorted((r["source"]["tx_id"], r) for r in env)
    for ver, r in by_ver:
        want_epoch = 1 if ver >= base else 0
        assert r["source"]["lsn_epoch"] == want_epoch, (ver, r["source"])
        rel = r["source"]["lsn"] >> 40
        want_rel = ver - (base if ver >= base else 0)
        assert rel == want_rel, (ver, rel, want_rel)

    # per-key monotonicity across the epoch bump: (epoch, lsn) tuples and
    # the ingest-side folded seq must both strictly increase in version order
    evts = debezium_to_events(events_to_debezium(t, from_version=1, db="ep"))
    k_rows = sorted(
        (r["source"]["tx_id"], (r["source"]["lsn_epoch"] or 0, r["source"]["lsn"]))
        for r in env
        if r["source"] and (
            (r["after"] and r["after"]["conv_id"] == "k")
            or (r["before"] and r["before"]["conv_id"] == "k")
        )
    )
    pairs = [p for _, p in k_rows]
    assert pairs == sorted(pairs) and len(set(pairs)) == len(pairs)
    k_seqs = [
        r["seq"] for r in evts.where(F.col("id") == "k:0").orderBy("seq").collect()
    ]
    assert len(k_seqs) == 3 and k_seqs == sorted(set(k_seqs))

    # the LAST version's image wins through the epoch-aware fold
    want = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in expected_wal_state(events_to_debezium(t, from_version=1, db="ep")).collect()
    }
    assert want == {("k", 0): "v3"}  # j deleted, k at v3

    # property survives and a second advance strictly increases
    assert LSN_EPOCH_PROP in t.snapshot().properties
    assert advance_lsn_epoch(t) == 2


def test_epoched_fold_orders_at_the_boundary(spark):
    """The wal_seq_epoched fold at the exact overflow-adjacent boundary:
    rel = 2^23 - 1 in epoch e orders strictly BELOW rel = 0 in epoch e+1
    for the same key, and the fold never exceeds int64 at the documented
    capacity (epoch 2^23 - 1, rel 2^23 - 1)."""
    from pyspark.sql import types as T

    from cht_sync_spark.sources.envelopes import WAL_SOURCE_EPOCHED, wal_seq_epoched

    md40 = (1 << 40) - 1  # worst-case hash bits
    rows = [
        (0, ((1 << 23) - 1) << 40 | md40),
        (1, 0 << 40 | 0),
        (1, 1 << 40 | md40),
        ((1 << 23) - 1, (((1 << 23) - 1) << 40) | md40),  # capacity edge
    ]
    df = spark.createDataFrame(
        [Row(source=Row(db="d", table="t", lsn=lsn, file=None, pos=None,
                        tx_id=None, lsn_epoch=e)) for e, lsn in rows],
        T.StructType([T.StructField("source", WAL_SOURCE_EPOCHED, False)]),
    )
    seqs = [r["s"] for r in df.select(wal_seq_epoched(F.col("source")).alias("s")).collect()]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    assert all(0 < s < (1 << 63) for s in seqs)


def test_export_repairs_cross_batch_conflict_losers(spark, tmp_path):
    """An equal-rev-height CONFLICTING revision that arrives in a LATER
    commit loses the stored-row LWW tiebreak (_rev desc) — but the CDF
    changelog still records it as a change. Because the export replaces
    rev vectors with strictly-increasing synthesized lsns, a naive replay
    would promote that loser (the order-dependent full-suite failure this
    pins). CouchDB's _changes row always carries the WINNING revision:
    the export overrides each key's final in-range change with the
    reconciled winner at to_version, so export→reimport converges."""
    from cht_sync_spark.sources.envelopes import expected_wal_state

    t = _mk_table(spark, str(tmp_path / "cf"))
    r_win = Row(
        conv_id="k", turn_idx=0, role="user", text="winner", tool=None,
        ts=dt.datetime(2024, 1, 1), _id="k:0", _rev="5-bbbb", _deleted=False,
        saved_timestamp=dt.datetime(2024, 1, 1), source="s", seq=10, rev_height=5,
    )
    r_lose = Row(
        conv_id="k", turn_idx=0, role="user", text="loser", tool=None,
        ts=dt.datetime(2024, 1, 1), _id="k:0", _rev="5-aaaa", _deleted=False,
        saved_timestamp=dt.datetime(2024, 1, 1), source="s", seq=11, rev_height=5,
    )
    t.append_delta(spark.createDataFrame([r_win], TRANSCRIPT))
    t.append_delta(spark.createDataFrame([r_lose], TRANSCRIPT))
    # the table's own LWW: equal height -> _rev desc -> "5-bbbb" wins
    assert [r["text"] for r in t.read_current(drop_tombstones=True).collect()] == ["winner"]

    env = events_to_debezium(t, from_version=1, db="cf")
    want = {r["conv_id"]: r["text"] for r in expected_wal_state(env).collect()}
    assert want == {"k": "winner"}  # the loser's final envelope was repaired

    # a delete that loses to a stored live row must also repair to 'u'
    t2 = _mk_table(spark, str(tmp_path / "cf2"))
    t2.append_delta(spark.createDataFrame([r_win], TRANSCRIPT))
    r_del = Row(
        conv_id="k", turn_idx=0, role=None, text=None, tool=None,
        ts=None, _id="k:0", _rev="5-0000", _deleted=True,
        saved_timestamp=dt.datetime(2024, 1, 2), source="s", seq=12, rev_height=5,
    )
    t2.append_delta(spark.createDataFrame([r_del], TRANSCRIPT))
    assert t2.read_current(drop_tombstones=True).count() == 1  # live row won
    env2 = events_to_debezium(t2, from_version=1, db="cf")
    rows2 = env2.collect()
    last2 = max(rows2, key=lambda r: r["source"]["lsn"])
    assert last2["op"] != "d" and last2["after"]["text"] == "winner"
    want2 = {r["conv_id"]: r["text"] for r in expected_wal_state(env2).collect()}
    assert want2 == {"k": "winner"}
