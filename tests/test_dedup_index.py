"""Incrementally-maintained MinHash-LSH dedup index (streaming/dedup_index.py).

Pins: bootstrap-by-changelog equals the batch minhash_lsh_pairs form on the
same corpus state (both hash_fn variants); edits invalidate stale band rows
via delete-by-absence tombstones (and surface NEW near-dups the old text
did not have); doc deletes drop every band row; emptied docs drop out
entirely (no all-empty band-bucket blowup); probe queries prune to the
probe hashes' buckets; replay from a rolled-back cursor converges; reseed
equals the incremental build; compaction-only ranges advance the cursor
without data writes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.functions.dedup import minhash_lsh_pairs
from cht_sync_spark.streaming.dedup_index import (
    DedupIndexConsumer,
    dedup_index_pairs,
    dedup_index_probe,
)
from cht_sync_spark.tables.format import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)


def _rows(spark, items):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, seq=s, _deleted=d) for i, t, s, d in items], SCHEMA
    )


def _mk_pair(spark, tmp_path, num_buckets=16, hash_fn="xxhash", n=2):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), SCHEMA, key_cols=["doc_id"], num_buckets=4,
        lww_order=[("seq", False)],
    )
    idx = DedupIndexConsumer.create_index(
        spark, src, str(tmp_path / "idx"), num_buckets=num_buckets,
        hash_fn=hash_fn, shingle_n=n,
    )
    return src, idx, DedupIndexConsumer(spark, src, idx, "ix")


def _docs(src):
    return src.read_current(drop_tombstones=True).select("doc_id", "text")


def _pairs(idx, src, threshold=0.5):
    return {
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in dedup_index_pairs(idx, _docs(src), threshold=threshold).collect()
    }


def _batch_pairs(src, hash_fn, threshold=0.5):
    return {
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in minhash_lsh_pairs(
            _docs(src), n=2, threshold=threshold, hash_fn=hash_fn
        ).collect()
    }


# two planted near-dup clusters + singletons; texts long enough to shingle
CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank", 1, False),
    (1, "the quick brown fox jumps over the lazy dog near the river bend", 2, False),
    (2, "merge upsert pipelines checkpoint their sequence cursors atomically", 3, False),
    (3, "merge upsert pipelines checkpoint their sequence cursors idempotently", 4, False),
    (4, "totally unrelated content about zebras and xylophones today", 5, False),
]


@pytest.mark.parametrize("hash_fn", ["xxhash", "md5"])
def test_bootstrap_matches_batch_form(spark, tmp_path, hash_fn):
    src, idx, c = _mk_pair(spark, tmp_path, hash_fn=hash_fn)
    src.append_delta(_rows(spark, CORPUS))
    r = c.run_once()
    assert r is not None and r.rows_upserted > 0
    got = _pairs(idx, src)
    want = _batch_pairs(src, hash_fn)
    assert got == want and {(0, 1), (2, 3)} <= {(a, b) for a, b, _ in got}


def test_edit_invalidates_stale_band_rows(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    before = idx.read_current(drop_tombstones=True)
    rows_doc1 = before.where(F.col("doc_id") == 1).count()
    assert rows_doc1 == 8  # bands
    # doc 1 rewritten AWAY from cluster {0,1} and INTO cluster {2,3}
    src.append_delta(_rows(spark, [
        (1, "merge upsert pipelines checkpoint their sequence cursors monotonically", 6, False),
    ]))
    c.run_once()
    after = idx.read_current(drop_tombstones=True)
    # still exactly `bands` rows for doc 1 — the old-signature rows were
    # tombstoned by absence and physically dropped at the merge
    assert after.where(F.col("doc_id") == 1).count() == 8
    got = {(a, b) for a, b, _ in _pairs(idx, src)}
    assert (0, 1) not in got
    assert {(1, 2), (1, 3), (2, 3)} <= got
    # and the index agrees with a from-scratch batch run on the new state
    assert _pairs(idx, src) == _batch_pairs(src, "xxhash")


def test_delete_and_emptied_docs_drop_out(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    src.append_delta(_rows(spark, [
        (0, None, 6, True),      # tombstone: every band row must go
        (2, "   ", 7, False),    # emptied: re-signs under the empty shingle
    ]))
    c.run_once()
    live = idx.read_current(drop_tombstones=True)
    assert live.where(F.col("doc_id") == 0).count() == 0
    # the emptied doc keeps `bands` rows under the empty-shingle signature —
    # batch-form parity (two EMPTY docs are exact dups and must match); its
    # OLD text's signature rows are gone
    assert live.where(F.col("doc_id") == 2).count() == 8
    got = {(a, b) for a, b, _ in _pairs(idx, src)}
    assert got == set()  # both planted clusters lost a member
    # and the index still agrees with a from-scratch batch run
    assert _pairs(idx, src) == _batch_pairs(src, "xxhash")


def test_probe_gate_prunes_and_verifies(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path, num_buckets=16)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    probe = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps over the lazy dog near the river edge")]
    )
    cand = dedup_index_probe(idx, probe)
    got = {(r.probe_id, r.match_id) for r in cand.collect()}
    assert {(100, 0), (100, 1)} <= got
    verified = dedup_index_probe(idx, probe, source_docs=_docs(src), threshold=0.5)
    vg = {(r.probe_id, r.match_id) for r in verified.collect()}
    assert vg == {(100, 0), (100, 1)}
    # prune: the probe's band hashes cover fewer buckets than the live set
    live_buckets = {f["bucket"] for f in idx.snapshot().files}
    assert len(live_buckets) > 1  # something to prune against


def test_probe_self_key_never_matches_itself(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    # an UPDATE arriving as a probe: same key, near-identical text — must
    # match its near-dup neighbour but never its own stored key
    probe = spark.createDataFrame(
        [Row(doc_id=0, text="the quick brown fox jumps over the lazy dog near the river bank")]
    )
    got = {(r.probe_id, r.match_id) for r in dedup_index_probe(idx, probe).collect()}
    assert (0, 0) not in got and (0, 1) in got


def test_replay_from_rolled_back_cursor_converges(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    pre = c.position()
    src.append_delta(_rows(spark, [
        (1, "merge upsert pipelines checkpoint their sequence cursors monotonically", 6, False),
    ]))
    c.run_once()
    state = _pairs(idx, src)
    # crash simulation: cursor rolled back, band rows left applied — the
    # worst inconsistent restart; re-running the range must be a no-op
    idx.commit(add_files=[], properties_update={"consumer.ix.version": str(pre)})
    r = c.run_once()
    assert r is not None
    assert _pairs(idx, src) == state
    assert c.position() > pre


def test_subrange_racer_never_strands_stale_rows(spark, tmp_path, monkeypatch):
    """The cursor-moved guard (derived_index._props): a concurrent
    same-name maintainer that lands a SUB-range between this consumer's
    cursor read and its merge commit invalidates the batch's preimage
    basis — the absence tombstones were diffed against from_v, so applying
    them over the racer's rows would strand the racer's band rows (doc 1's
    intermediate-text signatures would survive forever). The guard aborts
    the merge and re-derives from the moved cursor."""
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    src.append_delta(_rows(spark, [
        (1, "an intermediate rewrite with entirely fresh words", 6, False),
    ]))
    v_mid = src.current_version()
    src.append_delta(_rows(spark, [
        (1, "merge upsert pipelines checkpoint their sequence cursors monotonically", 7, False),
    ]))

    # the racer: a second same-name maintainer whose view of the source is
    # pinned to v_mid, so it lands exactly the sub-range [cursor, v_mid]
    src2 = SnapshotTable(spark, str(tmp_path / "src"))
    idx2 = SnapshotTable(spark, str(tmp_path / "idx"))
    racer = DedupIndexConsumer(spark, src2, idx2, "ix")
    monkeypatch.setattr(src2, "current_version", lambda: v_mid)

    fired = {"done": False}
    orig = c._delta

    def hooked(from_v, tip):
        d = orig(from_v, tip)
        if not fired["done"]:
            # interleave AFTER this consumer derived its batch against the
            # from_v preimage, BEFORE its merge commits
            fired["done"] = True
            r = racer.run_once()
            assert r is not None and r.rows_upserted > 0
        return d

    monkeypatch.setattr(c, "_delta", hooked)
    res = c.run_once()
    assert res is not None and res.retries >= 1  # the guard fired
    assert c.position() == src.current_version()
    # exactly `bands` live rows for doc 1 — the racer's intermediate-text
    # rows were re-diffed and tombstoned, not stranded
    live = idx.read_current(drop_tombstones=True)
    assert live.where(F.col("doc_id") == 1).count() == 8
    assert _pairs(idx, src) == _batch_pairs(src, "xxhash")


def test_reseed_equals_incremental(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    src.append_delta(_rows(spark, [
        (0, None, 6, True),
        (1, "merge upsert pipelines checkpoint their sequence cursors monotonically", 7, False),
    ]))
    c.run_once()
    inc = {
        tuple(r)
        for r in idx.read_current(drop_tombstones=True)
        .select("band", "bh", "doc_id")
        .collect()
    }
    src2, idx2, c2 = _mk_pair(spark, tmp_path / "re")
    src2.append_delta(_rows(spark, CORPUS))
    src2.append_delta(_rows(spark, [
        (0, None, 6, True),
        (1, "merge upsert pipelines checkpoint their sequence cursors monotonically", 7, False),
    ]))
    c2.reseed()
    res = {
        tuple(r)
        for r in idx2.read_current(drop_tombstones=True)
        .select("band", "bh", "doc_id")
        .collect()
    }
    assert inc == res
    assert c2.position() == src2.current_version()


def test_compaction_only_range_advances_cursor(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    v = idx.current_version()
    src.compact()
    r = c.run_once()
    assert r is not None and r.rows_upserted == 0
    assert c.position() == src.current_version()
    # cursor-only commit: no data files were written
    assert idx.current_version() == v + 1
    assert c.run_once() is None  # caught up


def test_create_index_validates_config(spark, tmp_path):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), SCHEMA, key_cols=["doc_id"], num_buckets=4,
        lww_order=[("seq", False)],
    )
    with pytest.raises(ValueError, match="must divide"):
        DedupIndexConsumer.create_index(spark, src, str(tmp_path / "i1"), bands=5)
    with pytest.raises(ValueError, match="hash_fn"):
        DedupIndexConsumer.create_index(spark, src, str(tmp_path / "i2"), hash_fn="sha")
    # a non-index table is refused by the query functions
    with pytest.raises(ValueError, match="not a dedup index"):
        dedup_index_pairs(src, _docs(src))
