"""Incrementally-maintained inverted term index (streaming/term_index.py).

Pins: bootstrap-by-changelog equals the scan-form BM25 on the same corpus
state; edits invalidate stale terms via delete-by-absence tombstones; doc
deletes drop every posting and decrement the maintained corpus stats;
queries prune to the query terms' buckets; replay from a rolled-back
cursor converges; reseed equals the incremental build; one maintainer
name is enforced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.functions.search import bm25_topk
from cht_sync_spark.streaming.term_index import TermIndexConsumer, bm25_index_topk
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

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


def _mk_source(spark, path) -> SnapshotTable:
    return SnapshotTable.create(
        spark, str(path), SCHEMA, key_cols=["doc_id"], num_buckets=4,
        lww_order=[("seq", False)],
    )


def _mk_pair(spark, tmp_path, num_buckets=16):
    src = _mk_source(spark, tmp_path / "src")
    idx = TermIndexConsumer.create_index(
        spark, src, str(tmp_path / "idx"), num_buckets=num_buckets
    )
    return src, idx, TermIndexConsumer(spark, src, idx, "ix")


def _live_postings(idx):
    return {
        (r.term, r.doc_id, r.tf, r.dl)
        for r in idx.read_current(drop_tombstones=True).collect()
    }


CORPUS = [
    (0, "spark merge window merge merge", 1, False),
    (1, "window window table scan", 2, False),
    (2, "merge of the century", 3, False),
    (3, "totally unrelated text here", 4, False),
    (4, "spark spark spark zebra", 5, False),
]


def test_bootstrap_matches_scan_form(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    r = c.run_once()
    assert r is not None and r.n_docs == 5
    live = src.read_current(drop_tombstones=True)
    for terms in (["merge", "window"], ["zebra"], ["spark", "table"]):
        got = {r_.doc_id: r_.score for r_ in bm25_index_topk(idx, terms, k=10).collect()}
        ref = {r_.doc_id: r_.score for r_ in bm25_topk(live, terms, k=10).collect()}
        assert set(got) == set(ref)
        for i in got:
            assert got[i] == pytest.approx(ref[i], rel=1e-9)
    assert c.run_once() is None  # caught up


def test_edit_invalidates_stale_terms(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    assert {r.doc_id for r in bm25_index_topk(idx, ["zebra"], k=5).collect()} == {4}
    # doc 4 re-written WITHOUT 'zebra'
    src.append_delta(_rows(spark, [(4, "spark only now", 6, False)]))
    c.run_once()
    assert bm25_index_topk(idx, ["zebra"], k=5).count() == 0
    assert not any(t == "zebra" for t, *_ in _live_postings(idx))
    # still retrievable by its remaining terms, with updated tf
    post = {(t, i): (tf, dl) for t, i, tf, dl in _live_postings(idx)}
    assert post[("spark", 4)] == (1, 3)


def test_delete_drops_postings_and_stats(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    n0, avg0 = c.stats()
    assert n0 == 5
    src.append_delta(_rows(spark, [(0, None, 9, True)]))  # tombstone doc 0
    r = c.run_once()
    assert r is not None
    assert not any(i == 0 for _, i, *_ in _live_postings(idx))
    n1, avg1 = c.stats()
    assert n1 == 4
    # avgdl recomputed over the survivors matches the maintained stats
    live = src.read_current(drop_tombstones=True)
    dl = live.select(F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n")).collect()
    assert avg1 == pytest.approx(sum(x.n for x in dl) / 4)


def test_incremental_equals_reseed(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS[:3]))
    c.run_once()
    src.append_delta(_rows(spark, CORPUS[3:]))
    src.append_delta(_rows(spark, [(1, "rewritten window doc", 7, False), (2, None, 8, True)]))
    c.run_once()

    idx2 = TermIndexConsumer.create_index(spark, src, str(tmp_path / "idx2"), num_buckets=16)
    c2 = TermIndexConsumer(spark, src, idx2, "ix2")
    c2.reseed()
    assert _live_postings(idx) == _live_postings(idx2)
    assert c.stats() == c2.stats()


def test_query_prunes_to_term_buckets(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path, num_buckets=16)
    texts = [(i, f"term{i} shared filler", i + 1, False) for i in range(40)]
    src.append_delta(_rows(spark, texts))
    c.run_once()
    snap = idx.snapshot()
    live_buckets = {f["bucket"] for f in snap.files}
    q_buckets = {idx.bucket_for({"term": t}) for t in ("term3", "term17")}
    assert len(live_buckets) > len(q_buckets)  # something to prune
    got = {r.doc_id for r in bm25_index_topk(idx, ["term3", "term17"], k=5).collect()}
    assert got == {3, 17}


def test_replay_from_rolled_back_cursor_converges(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    pre_cursor = c.position()
    src.append_delta(_rows(spark, [(1, "fresh window text", 7, False)]))
    c.run_once()
    state, stats = _live_postings(idx), c.stats()
    # crash simulation: cursor and stats back to the pre-range snapshot's
    # values, postings left applied — the worst inconsistent restart
    p = idx.snapshot().properties
    idx.commit(add_files=[], properties_update={
        "consumer.ix.version": str(pre_cursor),
        "termindex.n_docs": "5",
        "termindex.total_dl": p["termindex.total_dl"],
    })
    # hand-roll total_dl back too (doc 1 went 4 -> 3 tokens)
    p2 = idx.snapshot().properties
    idx.commit(add_files=[], properties_update={
        "termindex.total_dl": str(int(p2["termindex.total_dl"]) + 1),
    })
    r = TermIndexConsumer(spark, src, idx, "ix").run_once()
    assert r is not None
    assert _live_postings(idx) == state
    assert c.stats() == stats


def test_stop_terms_and_empty_docs(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    idx = TermIndexConsumer.create_index(spark, src, str(tmp_path / "idx"), num_buckets=8)
    c = TermIndexConsumer(spark, src, idx, "ix", stop_terms={"the", "of"})
    src.append_delta(_rows(spark, [
        (0, "the merge of the century", 1, False),
        (1, "", 2, False),           # empty doc: counted, zero-length
        (2, None, 3, False),         # null text: counted, zero-length
    ]))
    r = c.run_once()
    assert r is not None and r.n_docs == 3
    terms = {t for t, *_ in _live_postings(idx)}
    assert terms == {"merge", "century"}
    n, avgdl = c.stats()
    # stats count raw tokens (5 + 0 + 0) / 3 docs — stop terms are an
    # INDEX exclusion, not a length redefinition
    assert n == 3 and avgdl == pytest.approx(5 / 3)


def test_sole_owner_enforced(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS[:2]))
    c.run_once()
    with pytest.raises(ValueError, match="ONE maintainer"):
        TermIndexConsumer(spark, src, idx, "other").run_once()


def test_cow_source_with_cdf(spark, tmp_path):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), SCHEMA, key_cols=["doc_id"], num_buckets=4,
        lww_order=[("seq", False)], properties={"cdc.enabled": "true"},
    )
    idx = TermIndexConsumer.create_index(spark, src, str(tmp_path / "idx"), num_buckets=8)
    c = TermIndexConsumer(spark, src, idx, "ix")  # strict default
    merge_upsert(src, _rows(spark, CORPUS))
    c.run_once()
    merge_upsert(src, _rows(spark, [(4, "no more animals", 6, False)]))
    c.run_once()  # strict consumer over COW via exact change files
    assert bm25_index_topk(idx, ["zebra"], k=5).count() == 0
    assert {r.doc_id for r in bm25_index_topk(idx, ["animals"], k=5).collect()} == {4}
