"""Right-to-be-forgotten erasure (SnapshotTable.purge / erase_history).

A purge is the anti-tombstone: a tombstone RECORDS a deletion (reference
importer.js:86-95 keeps delete stubs forever), a purge removes every
version of a key with no record in the live state — and, after
erase_history, no bytes on disk. Pins:

- purged state == anti-join oracle; tombstones of purged keys vanish too;
- untouched buckets carry over by file reference (O(touched buckets));
- no-match purge is a metadata no-op (idempotent re-runs);
- cdc markers: changes() across a purge delivers content-free deletes
  that a strict ChangelogConsumer cascades downstream (marker beats the
  stored winner under LWW);
- without markers strict changes() refuses (removal is inexpressible);
- erase_history removes purged bytes from disk, refusing while tags or
  branches pin history;
- a concurrent append during the purge is never swallowed (S4 retry).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from cht_sync_spark.streaming.consumer import ChangelogConsumer
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)


def _rows(spark, items):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_idx=t, text=x, seq=s, _deleted=d) for c, t, x, s, d in items],
        SCHEMA,
    )


def _mk(spark, path, cdc=False, bucket_cols=None) -> SnapshotTable:
    return SnapshotTable.create(
        spark, str(path), SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=4,
        bucket_cols=bucket_cols or ["conv_id"],
        lww_order=[("seq", False)],
        properties={"cdc.enabled": "true"} if cdc else None,
    )


def _state(t, **kw):
    return {
        (r.conv_id, r.turn_idx, r.text, r.seq, r._deleted)
        for r in t.read_current(**kw).collect()
    }


def _keys(spark, convs):
    return spark.createDataFrame([Row(conv_id=c) for c in convs], "conv_id string")


def _seed(spark, t):
    merge_upsert(t, _rows(spark, [
        ("a", 0, "a0", 1, False), ("a", 1, "a1", 2, False),
        ("b", 0, "b0", 3, False), ("c", 0, "c0", 4, False),
    ]))
    # edits + a tombstone so purged keys have multi-version history
    merge_upsert(t, _rows(spark, [
        ("a", 0, "a0-edit", 5, False), ("b", 0, None, 6, True),
    ]))


def test_purge_matches_anti_join_oracle(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _seed(spark, t)
    before = _state(t)
    assert ("b", 0, None, 6, True) in before  # tombstone retained pre-purge

    snap, n = t.purge(_keys(spark, ["a", "b"]))
    # every version of a AND b's tombstone erased: 2 'a' rows + 1 'b' row
    assert n == 3
    expected = {r for r in before if r[0] not in ("a", "b")}
    assert _state(t) == expected == {("c", 0, "c0", 4, False)}
    # unlike a tombstone delete, NO record of the purged keys remains
    assert all(r[0] == "c" for r in _state(t))


def test_purge_untouched_buckets_carry_over_by_reference(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    # many convs so several buckets are populated
    merge_upsert(t, _rows(spark, [(f"c{i}", 0, f"x{i}", i + 1, False) for i in range(40)]))
    snap0 = t.snapshot()
    target = "c7"
    b = t.bucket_for({"conv_id": target})
    untouched_before = {f["path"] for f in snap0.files if f["bucket"] != b}

    _, n = t.purge(_keys(spark, [target]))
    assert n == 1
    snap1 = t.snapshot()
    untouched_after = {f["path"] for f in snap1.files if f["bucket"] != b}
    assert untouched_after == untouched_before  # no rewrite outside the bucket
    assert all(f["path"] not in untouched_before for f in snap1.files if f["bucket"] == b)


def test_purge_no_match_is_metadata_noop(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _seed(spark, t)
    v = t.current_version()
    snap, n = t.purge(_keys(spark, ["zzz-not-there"]))
    assert n == 0 and snap.version == v and t.current_version() == v
    # idempotent: purging already-purged keys is also a no-op
    t.purge(_keys(spark, ["a"]))
    v2 = t.current_version()
    snap2, n2 = t.purge(_keys(spark, ["a"]))
    assert n2 == 0 and t.current_version() == v2


def test_full_key_purge_erases_single_turn(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _seed(spark, t)
    keys = spark.createDataFrame(
        [Row(conv_id="a", turn_idx=0)], "conv_id string, turn_idx int"
    )
    _, n = t.purge(keys)
    assert n == 1
    got = _state(t)
    assert ("a", 1, "a1", 2, False) in got  # same conversation, other turn kept
    assert not any(r[0] == "a" and r[1] == 0 for r in got)


def test_purge_key_validation(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # bucketed by conv_id
    _seed(spark, t)
    with pytest.raises(ValueError, match="key columns"):
        t.purge(spark.createDataFrame([Row(text="a0")], "text string"))
    # table bucketed by the FULL key: a conv_id-only purge can't derive buckets
    t2 = _mk(spark, tmp_path / "t2", bucket_cols=["conv_id", "turn_idx"])
    _seed(spark, t2)
    with pytest.raises(ValueError, match="bucket_cols"):
        t2.purge(_keys(spark, ["a"]))


def test_purge_cdc_markers_content_free_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", cdc=True)
    _seed(spark, t)
    v0 = t.current_version()
    _, n = t.purge(_keys(spark, ["a"]))
    assert n == 2
    ch = t.changes(v0)  # strict default: markers make the purge readable
    rows = ch.collect()
    assert {(r.conv_id, r.turn_idx) for r in rows} == {("a", 0), ("a", 1)}
    assert all(r._change_type == "delete" and r._deleted for r in rows)
    # content-free: no purged text re-emitted, LWW bump beats the winner
    assert all(r.text is None for r in rows)
    assert {(r.conv_id, r.turn_idx, r.seq) for r in rows} == {("a", 0, 6), ("a", 1, 3)}


def test_purge_cascades_through_strict_consumer(spark, tmp_path):
    src = _mk(spark, tmp_path / "src", cdc=True)
    tgt = ChangelogConsumer.create_target(spark, src, str(tmp_path / "tgt"), "m")
    c = ChangelogConsumer(spark, src, tgt, "m", tombstones="drop")
    _seed(spark, src)
    c.run_once()
    assert any(r[0] == "a" for r in _state(tgt))

    src.purge(_keys(spark, ["a"]))
    r = c.run_once()  # strict consumer crosses the purge via markers
    assert r is not None
    assert not any(r_[0] == "a" for r_ in _state(tgt))
    # and no purged content landed in the target's files
    assert not any(x[2] == "a0-edit" for x in _state(tgt))


def test_purge_without_cdc_strict_refuses(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", cdc=False)
    _seed(spark, t)
    v0 = t.current_version()
    t.purge(_keys(spark, ["a"]))
    with pytest.raises(ValueError, match="purge"):
        t.changes(v0)
    # non-strict over-delivers restated survivors (documented retention risk)
    got = {r.conv_id for r in t.changes(v0, strict=False).collect()}
    assert "a" not in got


def _disk_texts(spark, path, schema):
    """Every text value readable from ANY parquet file under the table dir."""
    files = []
    for dirpath, _d, fns in os.walk(os.path.join(path, "data")):
        files += [os.path.join(dirpath, f) for f in fns if f.endswith(".parquet")]
    if not files:
        return set()
    df = spark.read.schema(schema).parquet(*files)
    return {r.text for r in df.select("text").collect()}


def test_erase_history_removes_bytes(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _mk(spark, path)
    _seed(spark, t)
    t.purge(_keys(spark, ["a"]))
    # live state is clean but HISTORY still holds the content
    assert "a0-edit" in _disk_texts(spark, path, SCHEMA)
    expired, removed = t.erase_history(grace_seconds=0)
    assert expired > 0 and removed > 0
    assert "a0-edit" not in _disk_texts(spark, path, SCHEMA)
    assert "a0" not in _disk_texts(spark, path, SCHEMA)
    assert _state(t) == {("b", 0, None, 6, True), ("c", 0, "c0", 4, False)}


def test_erase_history_refuses_pinned_history(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _seed(spark, t)
    t.tag("training-run-1")
    t.purge(_keys(spark, ["a"]))
    with pytest.raises(ValueError, match="tags"):
        t.erase_history(grace_seconds=0)
    t.drop_tag("training-run-1")
    t.create_branch("wip")
    with pytest.raises(ValueError, match="branches"):
        t.erase_history(grace_seconds=0)
    # force acknowledges partial erasure (branch keeps its own chain)
    expired, _ = t.erase_history(grace_seconds=0, force=True)
    assert expired > 0


def test_concurrent_append_during_purge_not_lost(spark, tmp_path, monkeypatch):
    t = _mk(spark, tmp_path / "t")
    _seed(spark, t)
    other = SnapshotTable(spark, t.path)
    orig = SnapshotTable._write_data
    fired = {"done": False}

    def racing_write(self, df, snap, level, **kw):
        files = orig(self, df, snap, level, **kw)
        if not fired["done"] and self is t:
            fired["done"] = True  # another writer lands between read and commit
            other.append_delta(_rows(spark, [("d", 0, "late", 9, False)]))
        return files

    monkeypatch.setattr(SnapshotTable, "_write_data", racing_write)
    _, n = t.purge(_keys(spark, ["a"]))
    assert n == 2
    got = _state(t)
    assert ("d", 0, "late", 9, False) in got  # concurrent append survived
    assert not any(r[0] == "a" for r in got)


def test_purge_keys_type_conformed_before_hashing(spark, tmp_path):
    """Spark hash functions are type-sensitive: an INT-typed key against a
    LONG-keyed table must still derive the right buckets (the keys are cast
    to the table schema first) — otherwise the purge silently misses."""
    from pyspark.sql import types as TT

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("_deleted", T.BooleanType()),
        ]
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), schema, key_cols=["doc_id"], num_buckets=8,
        lww_order=[("seq", False)],
    )
    merge_upsert(
        t,
        spark.createDataFrame(
            [Row(doc_id=i, text=f"x{i}", seq=1, _deleted=False) for i in range(20)],
            schema,
        ),
    )
    int_keys = spark.createDataFrame([Row(doc_id=7)], "doc_id int")
    _, n = t.purge(int_keys)
    assert n == 1
    assert t.read_current().where("doc_id = 7").count() == 0


def test_purge_refuses_unmarkable_cdc_table(spark, tmp_path):
    """cdc.enabled without a numeric most-significant LWW column cannot
    emit markers — purge must refuse loudly (a silent markerless purge
    wedges every strict changelog consumer downstream) unless the caller
    explicitly opts out."""
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("_rev", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), schema, key_cols=["conv_id"], num_buckets=2,
        lww_order=[("_rev", False)], properties={"cdc.enabled": "true"},
    )
    merge_upsert(t, spark.createDataFrame([Row(conv_id="a", _rev="1-x", text="t")], schema))
    with pytest.raises(ValueError, match="numeric"):
        t.purge(_keys(spark, ["a"]))
    _, n = t.purge(_keys(spark, ["a"]), cdc_markers=False)  # explicit opt-out
    assert n == 1
