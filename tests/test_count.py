"""Metadata-only row counts (SnapshotTable.count_rows) — Iceberg's
metadata count(*): answered from recorded per-file footer row counts
wherever provably exact (pure-base buckets; live counts additionally need
the footer to prove tombstone-freedom), with a bucket-pruned scan only
for the residue. Pins: parity with the scanning count in every mode, the
zero-Spark-job claim for the exact cases, and conservative fallbacks for
deltas / mixed tombstones / legacy entries without counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

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


def _mk(spark, path, props=None):
    return SnapshotTable.create(
        spark, str(path), SCHEMA, key_cols=["doc_id"], num_buckets=4,
        lww_order=[("seq", False)], properties=props,
    )


def _no_jobs(spark, fn):
    sc = spark.sparkContext
    sc.setJobGroup("cntchk", "metadata count check")
    try:
        out = fn()
        ids = sc.statusTracker().getJobIdsForGroup("cntchk")
        return out, list(ids)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)


def test_total_count_is_metadata_only_after_compaction(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [(i, f"x{i}", 1, False) for i in range(100)]))
    merge_upsert(t, _rows(spark, [(i, None, 2, True) for i in range(0, 100, 10)]))
    t.compact(buckets=list(range(4)))  # force full fold
    # tombstones retained: total count (live=False) is provable everywhere
    (n, jobs) = _no_jobs(spark, lambda: t.count_rows(live=False))
    assert n == 100 and jobs == []
    assert t.last_count_scanned_buckets == []
    # live count can't be proven from mixed-tombstone footers: scans, but
    # agrees with the data
    n_live = t.count_rows(live=True)
    assert t.last_count_scanned_buckets != []
    assert n_live == 90 == t.read_current(drop_tombstones=True).count()


def test_live_count_metadata_only_when_tombstone_free(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [(i, f"x{i}", 1, False) for i in range(80)]))
    merge_upsert(t, _rows(spark, [(i, None, 2, True) for i in range(0, 80, 8)]),
                 tombstones="drop")  # model-style: tombstones physically gone
    (n, jobs) = _no_jobs(spark, lambda: t.count_rows(live=True))
    assert n == 70 and jobs == [] and t.last_count_scanned_buckets == []


def test_delta_buckets_fall_back_to_pruned_scan(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [(i, f"x{i}", 1, False) for i in range(100)]),
                 tombstones="drop")
    # one delta touching a FEW keys: only its buckets may scan
    t.append_delta(_rows(spark, [(3, "edit", 5, False), (200, "new", 5, False)]))
    n = t.count_rows(live=True)
    assert n == 101 == t.read_current(drop_tombstones=True).count()
    assert 0 < len(t.last_count_scanned_buckets) < 4


def test_legacy_entries_without_counts_scan(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [(i, f"x{i}", 1, False) for i in range(40)]),
                 tombstones="drop")
    for f in t.snapshot().files:  # simulate pre-rows manifests
        f.pop("rows", None)
    n = t.count_rows()
    assert n == 40 and len(t.last_count_scanned_buckets) == 4


def test_meta_files_exposes_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [(i, f"x{i}", 1, False) for i in range(50)]),
                 tombstones="drop")
    files = t.meta("files").collect()
    assert sum(r["rows"] for r in files) == 50
    assert all(r["live_exact"] for r in files)
