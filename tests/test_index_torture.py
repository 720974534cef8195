"""Seeded random interleavings for the derived-index plane.

test_ann_consumer / test_ivf_consumer pin each transition alone
(signature/cell move, payload refresh, delete, reseed); what they cannot
pin is the CROSS-PRODUCT the changelog machinery must survive — duplicate
re-delivery of an already-applied batch, several source commits folded
into one catch-up cycle, compaction on either side mid-stream, a delete
and a resurrection of the same key in one range. This drives a
deterministic pseudo-random schedule of all of them against both index
consumers and checks, at every catch-up point, that the index equals the
from-scratch derivation of the source's reconciled state (the reseed
oracle, computed in Python).

Seeds are fixed: failures are reproducible, schedules are test corpus.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from cht_sync_spark.streaming.ann_index import AnnIndexConsumer, IvfIndexConsumer
from cht_sync_spark.tables.format import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
        T.StructField("seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)

CENTS = [[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]]
PLANES = [[1.0, 0.0], [0.0, 1.0]]  # quadrant signatures
KEYS = list(range(6))


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
    return d / (na * nb) if na > 0 and nb > 0 else 0.0


def _cell(v):
    best = max(range(len(CENTS)), key=lambda i: (_cos(v, CENTS[i]), -i))
    return best


def _sig(v):
    s = 0
    for j, p in enumerate(PLANES):
        if sum(x * y for x, y in zip(v, p)) >= 0:
            s |= 1 << j
    return s


def _expected(model, kind):
    out = set()
    for k, (seq, vec, dead) in model.items():
        if dead or vec is None:
            continue
        dk = _cell(vec) if kind == "ivf" else _sig(vec)
        out.add((dk, k, tuple(vec)))
    return out


def _live(idx, kind):
    col = "__cell" if kind == "ivf" else "__sig"
    return {
        (r[col], r["vec_id"], tuple(r["embedding"]))
        for r in idx.read_current(drop_tombstones=True).collect()
    }


@pytest.mark.parametrize("kind,seed", [("ivf", 1), ("ivf", 2), ("ann", 1)])
def test_random_interleavings_match_reseed_oracle(spark, tmp_path, kind, seed):
    rnd = random.Random(seed)
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), SCHEMA, key_cols=["vec_id"], num_buckets=4,
        lww_order=[("seq", False)],
    )
    if kind == "ivf":
        idx = IvfIndexConsumer.create_index(
            spark, src, str(tmp_path / "idx"), centroids=CENTS, num_buckets=4
        )
        c = IvfIndexConsumer(spark, src, idx, "ix")
    else:
        idx = AnnIndexConsumer.create_index(
            spark, src, str(tmp_path / "idx"), planes=PLANES, num_buckets=4
        )
        c = AnnIndexConsumer(spark, src, idx, "ix")

    model: dict[int, tuple[int, list | None, bool]] = {}
    seq = 0
    prev_batches: list[list[Row]] = []

    def mk_batch():
        nonlocal seq
        rows = []
        for _ in range(rnd.randint(1, 4)):
            k = rnd.choice(KEYS)
            seq += 1
            if rnd.random() < 0.25 and k in model:
                rows.append(Row(vec_id=k, embedding=None, seq=seq, _deleted=True))
                model[k] = (seq, None, True)
            else:
                v = [rnd.uniform(-1, 1), rnd.uniform(-1, 1)]
                rows.append(Row(vec_id=k, embedding=v, seq=seq, _deleted=False))
                model[k] = (seq, v, False)
        return rows

    for step in range(8):
        if prev_batches and rnd.random() < 0.3:
            # duplicate re-delivery of an already-applied batch: every row
            # is LWW-older than the model state, so it must change nothing
            src.append_delta(spark.createDataFrame(rnd.choice(prev_batches), SCHEMA))
        batch = mk_batch()
        prev_batches.append(batch)
        src.append_delta(spark.createDataFrame(batch, SCHEMA))
        if rnd.random() < 0.25:
            src.compact()
        if step % 2 == 1:
            c.run()  # catch-up may fold several source commits into cycles
            if rnd.random() < 0.5:
                idx.compact()
            assert _live(idx, kind) == _expected(model, kind), f"step {step}"

    c.run()
    final = _live(idx, kind)
    assert final == _expected(model, kind)
    # the incremental result equals a from-scratch reseed on the same pair
    c.reseed()
    assert _live(idx, kind) == final
