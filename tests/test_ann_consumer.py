"""CDC-maintained embedding ANN index (streaming/ann_index.py).

Pins the capability the append-only ``ann_index_append`` documents as
missing: an UPDATED vector whose signature (and therefore bucket) changes
must not leave a stale row behind — searches see exactly the source's
current state. Uses hand-picked 2-d hyperplanes (quadrant signatures) so
every signature transition is deterministic by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.functions.similarity import cosine_topk
from cht_sync_spark.streaming.ann_index import AnnIndexConsumer, ann_index_search
from cht_sync_spark.tables.format import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
        T.StructField("seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)

# quadrant planes: bit0 = x >= 0, bit1 = y >= 0
PLANES = [[1.0, 0.0], [0.0, 1.0]]


def _rows(spark, items):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=v, seq=s, _deleted=d) for i, v, s, d in items], SCHEMA
    )


def _mk_pair(spark, tmp_path, num_buckets=8):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), SCHEMA, key_cols=["vec_id"], num_buckets=4,
        lww_order=[("seq", False)],
    )
    idx = AnnIndexConsumer.create_index(
        spark, src, str(tmp_path / "idx"), planes=PLANES, num_buckets=num_buckets
    )
    return src, idx, AnnIndexConsumer(spark, src, idx, "ix")


def _live(idx):
    return {
        (r["__sig"], r["vec_id"], tuple(r["embedding"]))
        for r in idx.read_current(drop_tombstones=True).collect()
    }


CORPUS = [
    (0, [1.0, 1.0], 1, False),    # sig 3 (quadrant ++)
    (1, [0.9, 1.1], 2, False),    # sig 3, near vec 0
    (2, [-1.0, 1.0], 3, False),   # sig 2 (quadrant -+)
    (3, [-1.0, -1.0], 4, False),  # sig 0
    (4, [2.0, -0.1], 5, False),   # sig 1
]


def test_bootstrap_signatures_and_search(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    r = c.run_once()
    assert r is not None and r.rows_upserted == 5
    assert {(s, i) for s, i, _ in _live(idx)} == {(3, 0), (3, 1), (2, 2), (0, 3), (1, 4)}
    got = [r.vec_id for r in ann_index_search(idx, [1.0, 1.0], k=2, probe_bits=0).collect()]
    assert set(got) == {0, 1}


def test_update_moves_signature_without_stale_rows(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    # vec 1 re-embedded across two hyperplanes: quadrant ++ -> --
    src.append_delta(_rows(spark, [(1, [-0.9, -1.1], 6, False)]))
    c.run_once()
    state = _live(idx)
    assert (0, 1, (-0.9, -1.1)) in state
    assert all(not (s == 3 and i == 1) for s, i, _ in state)  # stale row GONE
    # a probe of the OLD quadrant no longer returns vec 1...
    near_pp = {r.vec_id for r in ann_index_search(idx, [1.0, 1.0], k=5, probe_bits=0).collect()}
    assert 1 not in near_pp
    # ...and the new quadrant does, ranked by the NEW embedding
    near_mm = [r.vec_id for r in ann_index_search(idx, [-1.0, -1.0], k=2, probe_bits=0).collect()]
    assert set(near_mm) == {1, 3}


def test_update_keeping_signature_refreshes_payload(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    # vec 4 stays in quadrant +- (sig 1) but points elsewhere within it
    src.append_delta(_rows(spark, [(4, [0.1, -2.0], 6, False)]))
    c.run_once()
    state = _live(idx)
    assert (1, 4, (0.1, -2.0)) in state and (1, 4, (2.0, -0.1)) not in state
    # exact re-rank uses the refreshed vector: [1, -0.05] is now far
    got = ann_index_search(idx, [1.0, -0.05], k=1, probe_bits=0).collect()
    assert got[0].vec_id == 4 and got[0].cos < 0.1


def test_delete_drops_vector(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    src.append_delta(_rows(spark, [(0, None, 6, True)]))
    c.run_once()
    assert all(i != 0 for _, i, _ in _live(idx))
    got = {r.vec_id for r in ann_index_search(idx, [1.0, 1.0], k=5, probe_bits=0).collect()}
    assert got == {1}


def test_search_matches_exact_on_final_state(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    src.append_delta(_rows(spark, [
        (1, [-0.9, -1.1], 6, False),
        (0, None, 7, True),
    ]))
    c.run_once()
    # full multiprobe (2 planes -> probe_bits=2 covers all 4 signatures) ==
    # exact brute force over the reconciled source
    final = src.read_current(drop_tombstones=True).where(F.col("embedding").isNotNull())
    exact = [(r.vec_id, round(r.cos, 9)) for r in cosine_topk(final, [0.5, -0.5], k=4).collect()]
    approx = [
        (r.vec_id, round(r.cos, 9))
        for r in ann_index_search(idx, [0.5, -0.5], k=4, probe_bits=2).collect()
    ]
    assert approx == exact


def test_reseed_equals_incremental(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    src.append_delta(_rows(spark, [(1, [-0.9, -1.1], 6, False), (0, None, 7, True)]))
    c.run_once()
    inc = _live(idx)
    src2, idx2, c2 = _mk_pair(spark, tmp_path / "re")
    src2.append_delta(_rows(spark, CORPUS))
    src2.append_delta(_rows(spark, [(1, [-0.9, -1.1], 6, False), (0, None, 7, True)]))
    c2.reseed()
    assert _live(idx2) == inc
    assert c2.position() == src2.current_version()


def test_create_index_validates(spark, tmp_path):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), SCHEMA, key_cols=["vec_id"], num_buckets=4,
        lww_order=[("seq", False)],
    )
    with pytest.raises(ValueError, match="planes or dim"):
        AnnIndexConsumer.create_index(spark, src, str(tmp_path / "i1"))
    with pytest.raises(ValueError, match="not an ANN index"):
        ann_index_search(src, [1.0, 0.0])
