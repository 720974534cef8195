"""Seeded random torture of vacuum/expiry under CONCURRENT writers
(VERDICT r3 #8).

test_maintenance pins vacuum alone (orphan removal, the grace window,
branch retention roots); test_concurrency pins commit races alone. What
neither pins is their CROSS-PRODUCT: maintenance (vacuum + expiry +
compaction) firing WHILE appenders and mergers race commits — the
production shape of the 10^10-event loop, where the grace window is the
only thing standing between remove_orphan_files and a commit that has
written its parquet but not yet won its manifest race.

Per seed, three writer threads each drive a deterministic op schedule
(append / merge / losing-race retry pressure) against one table while a
maintenance thread runs vacuum (grace shorter than the run, far longer
than any single commit), expire_snapshots, compaction and a branch
create/drop — >= 100 randomized interleaving points across the seeds.
Invariants at the end of every seed:

- NO DATA LOSS: the final LWW state equals the per-key max-seq winner
  over every committed batch (all ops complete, so the oracle is exact);
- NO DANGLING REFERENCES: every data file and manifest referenced by any
  retained snapshot (main and branches, every kept version) exists on
  disk, and the full table re-reads cleanly from a cold handle;
- vacuum after quiesce (grace 0) removes the losing-race orphans without
  touching anything referenced.
"""

from __future__ import annotations

import os
import random
import time
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

KV = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)

N_KEYS = 40
OPS_PER_WRITER = 12
N_WRITERS = 3


def _batch(spark, keys, v, seq, deleted=False):
    return spark.createDataFrame(
        [(k, v, seq, deleted) for k in keys], KV
    )


def _check_no_dangling(t: SnapshotTable):
    """Every retained snapshot (main + branches, all kept versions) must
    reference only files that exist."""
    chains = [t._snapdir] + [t._branch_snapdir(b) for b in t.branches()]
    missing = []
    for snapdir in chains:
        h = SnapshotTable(t.spark, t.path)
        h._snapdir = snapdir
        for v in h._versions():
            snap = h.snapshot(v)
            for f in snap.files:
                if not os.path.exists(os.path.join(t.path, f["path"])):
                    missing.append((snapdir, v, f["path"]))
            for ref in snap.manifests or []:
                if not os.path.exists(os.path.join(t.path, ref)):
                    missing.append((snapdir, v, ref))
    assert not missing, f"dangling references after torture: {missing[:5]}"


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_vacuum_under_concurrent_writers(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), KV, ["k"], num_buckets=4,
        lww_order=[("seq", False)],
    )
    t.append_delta(_batch(spark, range(N_KEYS), "base", 0))

    # oracle bookkeeping: every committed batch's (keys, seq, value,
    # deleted); ops all complete before the final check, so per-key
    # max-seq over this log IS the expected LWW state
    log: list[tuple[list[int], str, int, bool]] = []
    stop = {"flag": False}

    def writer(wid: int):
        # own handle per thread — the multi-writer deployment shape (S8)
        h = SnapshotTable(spark, str(tmp_path / "t"))
        wrng = random.Random(seed * 100 + wid)
        for i in range(OPS_PER_WRITER):
            seq = 1 + wid * 1000 + i
            keys = sorted(wrng.sample(range(N_KEYS), wrng.randint(3, 10)))
            val = f"w{wid}i{i}"
            deleted = wrng.random() < 0.15
            b = _batch(spark, keys, val, seq, deleted)
            if wrng.random() < 0.5:
                # generous retry budget: under this torture's commit churn
                # the default 8 optimistic retries can starve (liveness,
                # not safety — the loser never half-applies)
                merge_upsert(h, b, tombstones="keep", max_retries=64)
            else:
                h.append_delta(b)
            log.append((keys, val, seq, deleted))
            time.sleep(wrng.random() * 0.05)

    def maintenance():
        h = SnapshotTable(spark, str(tmp_path / "t"))
        mrng = random.Random(seed * 7)
        n = 0
        while not stop["flag"]:
            op = mrng.random()
            try:
                if op < 0.4:
                    # grace far longer than any single commit, shorter than
                    # nothing: in-flight files are always inside the window
                    h.vacuum(grace_seconds=5.0)
                elif op < 0.6:
                    h.expire_snapshots(keep_last=8)
                elif op < 0.8:
                    h.compact()
                elif op < 0.9 and f"audit{n}" not in h.branches():
                    h.create_branch(f"audit{n}")
                    n += 1
                elif h.branches():
                    h.drop_branch(sorted(h.branches())[0])
            except Exception as e:  # pragma: no cover - surface real bugs
                stop["err"] = e
                raise
            # a realistic maintenance cadence: commit-producing ops must
            # not churn the tip so hot that writer commits starve forever
            time.sleep(0.2 + mrng.random() * 0.2)

    with ThreadPoolExecutor(N_WRITERS + 1, thread_name_prefix="torture") as ex:
        futs = [ex.submit(writer, w) for w in range(N_WRITERS)]
        m = ex.submit(maintenance)
        try:
            for f in futs:
                f.result()  # propagate writer failures (incl. lost commits)
        finally:
            stop["flag"] = True  # or a dead writer hangs the pool teardown
        m.result()

    # ---- invariant 1: exact LWW state (no lost committed batch)
    want: dict[int, tuple[int, str, bool]] = {k: (0, "base", False) for k in range(N_KEYS)}
    for keys, val, seq, deleted in log:
        for k in keys:
            if seq > want[k][0]:
                want[k] = (seq, val, deleted)
    expect_live = {
        (k, v, s) for k, (s, v, d) in want.items() if not d
    }
    got = {
        (r["k"], r["v"], r["seq"])
        for r in t.read_current(drop_tombstones=True).collect()
    }
    assert got == expect_live

    # ---- invariant 2: no dangling refs anywhere in retained history,
    # and a COLD handle re-reads the same state (metadata self-contained)
    _check_no_dangling(t)
    cold = SnapshotTable(spark, str(tmp_path / "t"))
    assert cold.read_current(drop_tombstones=True).count() == len(expect_live)

    # ---- invariant 3: quiesced vacuum drops the losing-race orphans and
    # nothing referenced; state unchanged
    t.vacuum(grace_seconds=0)
    _check_no_dangling(t)
    got2 = {
        (r["k"], r["v"], r["seq"])
        for r in t.read_current(drop_tombstones=True).collect()
    }
    assert got2 == expect_live
