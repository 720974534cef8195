"""Incremental changelog reads (SnapshotTable.changes) — the read-side
half of CDC: a downstream consumer tails the engine's OWN tables the way
the pipeline tails the changes feed (Iceberg incremental append scan).

Pins: exact change sets per version range, compaction invisibility,
rewrite refusal (strict) / LWW-safe over-delivery (non-strict), tombstone
typing, O(changed-files) scan cost, and the consumer contract —
state@from + changelog, LWW-folded, equals read_current@to.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from cht_sync_spark.operators.lww import lww_dedup
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)


def _mk(spark, path):
    return SnapshotTable.create(
        spark, str(path), SCHEMA, key_cols=["k"], num_buckets=4,
        lww_order=[("seq", True)],
    )


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, v, s, d) for k, v, s, d in rows], SCHEMA
    )


def test_changes_exact_per_version(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v0 = t.current_version()
    t.append_delta(_df(spark, [("a", 1, 1, False), ("b", 2, 2, False)]))
    v1 = t.current_version()
    t.append_delta(_df(spark, [("a", 10, 3, False)]))
    v2 = t.current_version()

    all_ch = t.changes(v0).collect()
    assert {(r.k, r.v, r._change_version) for r in all_ch} == {
        ("a", 1, v1), ("b", 2, v1), ("a", 10, v2),
    }
    assert all(r._change_type == "upsert" for r in all_ch)
    # bounded range: only the second commit
    second = t.changes(v1, v2).collect()
    assert [(r.k, r.v) for r in second] == [("a", 10)]


def test_changes_tombstone_typed_delete(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v0 = t.current_version()
    t.append_delta(_df(spark, [("a", 1, 1, False), ("a", None, 2, True)]))
    ch = {(r.seq, r._change_type) for r in t.changes(v0).collect()}
    assert ch == {(1, "upsert"), (2, "delete")}


def test_compaction_invisible_to_changelog(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v0 = t.current_version()
    t.append_delta(_df(spark, [("a", 1, 1, False), ("b", 2, 2, False)]))
    t.compact()  # physical-only "replace" snapshot
    t.append_delta(_df(spark, [("c", 3, 3, False)]))
    ch = t.changes(v0).collect()  # strict: compaction must NOT raise
    assert {(r.k, r.v) for r in ch} == {("a", 1), ("b", 2), ("c", 3)}
    # and the restated compacted rows appear exactly once
    assert len(ch) == 3


def test_rewrite_refused_strict_and_lww_safe_nonstrict(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append_delta(_df(spark, [("a", 1, 1, False), ("b", 2, 2, False)]))
    v1 = t.current_version()
    merge_upsert(t, _df(spark, [("a", 99, 5, False)]))  # COW rewrite
    v2 = t.current_version()
    with pytest.raises(ValueError, match="logical rewrite"):
        t.changes(v1)
    # non-strict: over-delivers the restated bucket, but folding the
    # changelog onto state@v1 with the table's own LWW reproduces tip state
    base = t.read_current(version=v1)
    ch = t.changes(v1, strict=False).select(*[f.name for f in SCHEMA.fields])
    folded = lww_dedup(base.unionByName(ch), key=["k"], order=[("seq", True)])
    want = {(r.k, r.v) for r in t.read_current(version=v2).collect()}
    assert {(r.k, r.v) for r in folded.collect()} == want


def test_changes_scan_cost_is_changed_files_only(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append_delta(_df(spark, [(f"k{i}", i, i, False) for i in range(40)]))
    v1 = t.current_version()
    files_before = len(t.snapshot().files)
    t.append_delta(_df(spark, [("x", 1, 100, False)]))
    t.changes(v1).collect()
    assert t.last_scan_files <= files_before  # never O(live files)
    added = len(t.snapshot().files) - files_before
    assert t.last_scan_files == added


def test_changes_empty_range_and_validation(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v = t.current_version()
    out = t.changes(v)
    assert out.count() == 0
    assert "_change_version" in out.columns
    with pytest.raises(ValueError, match="to_version"):
        t.changes(v, v - 1)


def test_changes_projects_through_evolved_schema(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v0 = t.current_version()
    t.append_delta(_df(spark, [("a", 1, 1, False)]))
    wide = T.StructType(
        list(SCHEMA.fields) + [T.StructField("extra", T.StringType())]
    )
    evolved = t.evolve_schema(wide)
    t.append_delta(
        spark.createDataFrame([("b", 2, 2, False, "hello")], wide),
        new_schema=evolved,
    )
    ch = {r.k: r.extra for r in t.changes(v0).collect()}
    assert ch == {"a": None, "b": "hello"}  # old file reads null


def test_operation_markers_recorded(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    assert t.snapshot().operation == "create"
    t.append_delta(_df(spark, [("a", 1, 1, False)]))
    assert t.snapshot().operation == "append"
    t.compact()
    assert t.snapshot().operation == "replace"
    merge_upsert(t, _df(spark, [("a", 2, 2, False)]))
    assert t.snapshot().operation == "overwrite"
