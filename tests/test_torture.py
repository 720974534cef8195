"""Seeded random interleavings of table operations vs a pure-Python model.

Component tests pin each table operation alone (merge, compact, rebucket,
purge, expiry); what they cannot pin is the CROSS-PRODUCT — a purge
between two deltas, a rebucket over un-compacted tombstones, expiry+vacuum
mid-history, a replayed batch after a layout change. This test drives a
deterministic pseudo-random schedule of all of them against one table and
checks, at every checkpoint, that the reconciled state equals an
independent Python LWW model and that the metadata-path count agrees.

Seeds are fixed: failures are reproducible, and the schedules are part of
the test corpus (not a flaky fuzz). The event space is deliberately
hostile: 8 keys only (constant collisions), duplicate deliveries, equal
rev heights with delete-vs-edit conflicts, purges that later resurrect
under LOWER-ordered events (legal: purge erases history, so a fresh
insert wins by default).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("rev_height", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
        T.StructField("_rev", T.StringType(), True),
        T.StructField("seq", T.LongType(), False),
    ]
)
ORDER = [("rev_height", False), ("_deleted", True), ("_rev", False), ("seq", False)]
KEYS = [f"k{i}" for i in range(8)]


def _rank(e):
    """The LWW order of ORDER, nulls smallest, live beats delete."""
    _k, h, d, rev, seq = e
    return (
        (0, 0) if h is None else (1, h),
        0 if d else 1,
        (0, "") if rev is None else (1, rev),
        seq,
    )


class Model:
    """Winners dict mirroring merge/read_current semantics (ties keep the
    existing winner — prefer='existing'; tied events are value-identical
    here because the row IS its order columns)."""

    def __init__(self):
        self.w: dict[str, tuple] = {}

    def apply(self, events):
        for e in events:
            cur = self.w.get(e[0])
            if cur is None or _rank(e) > _rank(cur):
                self.w[e[0]] = e

    def purge(self, keys):
        for k in keys:
            self.w.pop(k, None)

    def rows(self):
        return set(self.w.values())

    def live_count(self):
        return sum(1 for e in self.w.values() if not e[2])


def _gen_batch(rng: random.Random, seq_counter: list[int], size: int):
    out = []
    for _ in range(size):
        seq_counter[0] += 1
        out.append(
            (
                rng.choice(KEYS),
                rng.choice([None, 1, 2, 3, 4]),
                rng.random() < 0.25,
                rng.choice([None, "a1", "b2", "c3"]),
                seq_counter[0],
            )
        )
    return out


def _check(spark, t: SnapshotTable, model: Model):
    got = {
        (r.k, r.rev_height, r._deleted, r._rev, r.seq)
        for r in t.read_current().collect()
    }
    assert got == model.rows()
    assert t.count_rows(live=True) == model.live_count()


@pytest.mark.parametrize("seed", [7, 23, 1009])
def test_interleaved_ops_match_python_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = SnapshotTable.create(
        spark, str(tmp_path / f"t{seed}"), SCHEMA, key_cols=["k"],
        num_buckets=4, sort_cols=["k"], lww_order=ORDER,
    )
    model = Model()
    seq_counter = [0]
    last_batch: list[tuple] | None = None

    for step in range(24):
        op = rng.choices(
            ["delta", "merge", "replay", "compact", "rebucket", "purge", "expire"],
            weights=[28, 22, 10, 12, 8, 12, 8],
        )[0]
        if op == "delta":
            batch = _gen_batch(rng, seq_counter, rng.randint(1, 12))
            t.append_delta(spark.createDataFrame(batch, SCHEMA))
            model.apply(batch)
            last_batch = batch
        elif op == "merge":
            batch = _gen_batch(rng, seq_counter, rng.randint(1, 12))
            merge_upsert(t, spark.createDataFrame(batch, SCHEMA))
            model.apply(batch)
            last_batch = batch
        elif op == "replay" and last_batch:
            # at-least-once delivery: re-applying an old batch (possibly
            # after purges/rebuckets since) must respect current LWW state
            merge_upsert(t, spark.createDataFrame(last_batch, SCHEMA))
            model.apply(last_batch)
        elif op == "compact":
            t.compact()
        elif op == "rebucket":
            t.rebucket(rng.choice([2, 4, 8]))
        elif op == "purge":
            pool = sorted(model.w)
            ks = [k for k in pool if rng.random() < 0.4][:3]
            if ks:
                t.purge(
                    spark.createDataFrame([(k,) for k in ks], "k string"),
                    cdc_markers=False,
                )
                model.purge(ks)
        elif op == "expire":
            t.expire_snapshots(keep_last=2)
            t.vacuum(grace_seconds=0.0)
        if step % 6 == 5:
            _check(spark, t, model)
    _check(spark, t, model)
    # layout survived the schedule: a point lookup still prunes and agrees
    if model.w:
        k = sorted(model.w)[0]
        got = {
            tuple(r)
            for r in t.read_current(filters=[("k", "=", k)]).collect()
        }
        assert got == {model.w[k]}
