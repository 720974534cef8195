"""CDC-maintained IVF coarse index (streaming/ann_index.IvfIndexConsumer).

The symmetric gap-closer to AnnIndexConsumer: ``build_ivf_index`` is a
one-shot build, so a re-embedded vector that changes cells would leave a
stale row in its old cell's bucket and deletes have no path short of a
rebuild. Uses hand-pinned axis centroids so every cell transition is
deterministic by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.functions.similarity import cosine_topk
from cht_sync_spark.streaming.ann_index import IvfIndexConsumer, ivf_index_search
from cht_sync_spark.tables.format import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
        T.StructField("seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)

# axis centroids: cell = nearest axis direction (argmax cosine)
CENTS = [[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]]


def _rows(spark, items):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=v, seq=s, _deleted=d) for i, v, s, d in items], SCHEMA
    )


def _mk_pair(spark, tmp_path, num_buckets=4):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), SCHEMA, key_cols=["vec_id"], num_buckets=4,
        lww_order=[("seq", False)],
    )
    idx = IvfIndexConsumer.create_index(
        spark, src, str(tmp_path / "idx"), centroids=CENTS, num_buckets=num_buckets
    )
    return src, idx, IvfIndexConsumer(spark, src, idx, "ix")


def _live(idx):
    return {
        (r["__cell"], r["vec_id"], tuple(r["embedding"]))
        for r in idx.read_current(drop_tombstones=True).collect()
    }


CORPUS = [
    (0, [1.0, 0.1], 1, False),    # cell 0 (+x)
    (1, [0.9, 0.2], 2, False),    # cell 0
    (2, [-1.0, 0.1], 3, False),   # cell 1 (-x)
    (3, [0.1, 1.0], 4, False),    # cell 2 (+y)
    (4, [-0.1, -1.0], 5, False),  # cell 3 (-y)
]


def test_bootstrap_cells_and_search(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    r = c.run_once()
    assert r is not None and r.rows_upserted == 5
    assert {(cl, i) for cl, i, _ in _live(idx)} == {(0, 0), (0, 1), (1, 2), (2, 3), (3, 4)}
    got = [r.vec_id for r in ivf_index_search(idx, [1.0, 0.0], k=2, n_probe=1).collect()]
    assert set(got) == {0, 1}


def test_update_moves_cell_without_stale_rows(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    # vec 1 re-embedded from +x to +y: cell 0 -> 2
    src.append_delta(_rows(spark, [(1, [0.1, 0.9], 6, False)]))
    c.run_once()
    state = _live(idx)
    assert (2, 1, (0.1, 0.9)) in state
    assert all(not (cl == 0 and i == 1) for cl, i, _ in state)  # stale row GONE
    near_x = {r.vec_id for r in ivf_index_search(idx, [1.0, 0.0], k=5, n_probe=1).collect()}
    assert 1 not in near_x
    near_y = [r.vec_id for r in ivf_index_search(idx, [0.0, 1.0], k=2, n_probe=1).collect()]
    assert set(near_y) == {1, 3}


def test_update_keeping_cell_refreshes_payload(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    # vec 0 stays nearest +x but points elsewhere within the cell
    src.append_delta(_rows(spark, [(0, [1.0, -0.4], 6, False)]))
    c.run_once()
    state = _live(idx)
    assert (0, 0, (1.0, -0.4)) in state and (0, 0, (1.0, 0.1)) not in state


def test_delete_drops_vector(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    src.append_delta(_rows(spark, [(3, None, 6, True)]))
    c.run_once()
    assert all(i != 3 for _, i, _ in _live(idx))
    got = {r.vec_id for r in ivf_index_search(idx, [0.0, 1.0], k=5, n_probe=1).collect()}
    assert 3 not in got


def test_search_matches_exact_on_final_state(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    src.append_delta(_rows(spark, [
        (1, [0.1, 0.9], 6, False),
        (3, None, 7, True),
    ]))
    c.run_once()
    # probing every cell == exact brute force over the reconciled source
    final = src.read_current(drop_tombstones=True).where(F.col("embedding").isNotNull())
    exact = [(r.vec_id, round(r.cos, 9)) for r in cosine_topk(final, [0.5, -0.5], k=4).collect()]
    approx = [
        (r.vec_id, round(r.cos, 9))
        for r in ivf_index_search(idx, [0.5, -0.5], k=4, n_probe=4).collect()
    ]
    assert approx == exact


def test_reseed_equals_incremental(spark, tmp_path):
    src, idx, c = _mk_pair(spark, tmp_path)
    src.append_delta(_rows(spark, CORPUS))
    c.run_once()
    src.append_delta(_rows(spark, [(1, [0.1, 0.9], 6, False), (3, None, 7, True)]))
    c.run_once()
    inc = _live(idx)
    src2, idx2, c2 = _mk_pair(spark, tmp_path / "re")
    src2.append_delta(_rows(spark, CORPUS))
    src2.append_delta(_rows(spark, [(1, [0.1, 0.9], 6, False), (3, None, 7, True)]))
    c2.reseed()
    assert _live(idx2) == inc
    assert c2.position() == src2.current_version()


def test_assign_cells_join_form_parity(spark):
    """assign_cells beyond 256 centroids switches to the broadcast-join
    argmax; it must agree with a per-row Python argmax (same smallest-cell
    tie-break) and preserve every input column."""
    import math

    from cht_sync_spark.functions.similarity import assign_cells

    rnd = __import__("random").Random(3)
    cents = [[rnd.uniform(-1, 1), rnd.uniform(-1, 1)] for _ in range(300)]
    rows = [Row(vec_id=i, embedding=[rnd.uniform(-1, 1), rnd.uniform(-1, 1)],
                seq=i, _deleted=False) for i in range(12)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.vec_id: (r["__cell"], r.seq) for r in assign_cells(df, cents, "embedding", "vec_id").collect()}

    def cos(a, b):
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb) if na and nb else 0.0

    for r in rows:
        want = max(range(300), key=lambda i: (cos(r.embedding, cents[i]), -i))
        assert got[r.vec_id] == (want, r.seq)


def test_sampled_centroids_and_validation(spark, tmp_path):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), SCHEMA, key_cols=["vec_id"], num_buckets=4,
        lww_order=[("seq", False)],
    )
    with pytest.raises(ValueError, match="no centroids"):
        IvfIndexConsumer.create_index(spark, src, str(tmp_path / "i0"))
    with pytest.raises(ValueError, match="not an IVF index"):
        ivf_index_search(src, [1.0, 0.0])
    src.append_delta(_rows(spark, CORPUS))
    # default centroids: the deterministic smallest-md5 sample of live
    # vectors — the ivf_assign rule, so the pinned set is reproducible
    idx = IvfIndexConsumer.create_index(
        spark, src, str(tmp_path / "i1"), n_cells=2, cent_hash="md5"
    )
    import json

    cents = json.loads(idx.snapshot().properties["ivf.centroids"])
    assert len(cents) == 2 and all(len(c) == 2 for c in cents)
    c = IvfIndexConsumer(spark, src, idx, "ix")
    c.run_once()
    assert len(_live(idx)) == 5  # every live vector lands in some cell
