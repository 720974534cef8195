"""Metadata tables (`SnapshotTable.meta`) — the Iceberg ``db.t.snapshots``
/ ``.files`` / ``.manifests`` / refs-listing analogue: the table's own
bookkeeping as queryable DataFrames, driver-side state only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.tables.format import SnapshotTable

KV = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _kv(spark, lo, hi, v, seq):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(v).alias("v"), F.lit(seq).cast("long").alias("seq")
    )


def test_meta_tables_reflect_lifecycle(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), KV, ["k"], num_buckets=4)
    t.append_delta(_kv(spark, 0, 100, "a", 1))
    t.append_delta(_kv(spark, 50, 150, "b", 2))
    t.tag("after_loads")
    t.compact()
    t.create_branch("audit")
    t.rebucket(8)

    snaps = {r["version"]: r for r in t.meta("snapshots").collect()}
    ordered = [snaps[v] for v in sorted(snaps)]
    assert ordered[0]["operation"] == "create" and ordered[0]["parent"] is None
    # two data appends (+ the tag's marker commit is an append too), then
    # the compact and rebucket replace-class rewrites, in order
    assert [r["operation"] for r in ordered].count("replace") == 2
    assert [r["operation"] for r in ordered][-1] == "replace"
    assert all(
        snaps[v]["parent"] == v - 1 for v in sorted(snaps)[1:]
    )
    # layout history is visible: 4 buckets until the rebucket, 8 after
    assert ordered[-2]["num_buckets"] == 4 and ordered[-1]["num_buckets"] == 8
    assert all(r["n_manifests"] == len(t.snapshot(v).manifests or []) for v, r in snaps.items())

    files = t.meta("files").collect()
    assert len(files) == len(t.snapshot().files)
    assert all(r["level"] == "base" and 0 <= r["bucket"] < 8 for r in files)

    mans = t.meta("manifests").collect()
    assert sum(r["n_entries"] for r in mans) == len(files)

    refs = {(r["kind"], r["name"]): r["version"] for r in t.meta("refs").collect()}
    assert refs[("tag", "after_loads")] == t.resolve_ref("after_loads")
    assert ("branch", "audit") in refs

    with pytest.raises(ValueError):
        t.meta("nope")


def test_meta_refs_flags_crashed_branch_claim(spark, tmp_path):
    """A crashed create_branch leaves an empty claim dir; the ops view must
    FLAG it (null head) rather than throw — it exists to debug that state."""
    import os

    from cht_sync_spark.tables.format import _SNAPDIR

    t = SnapshotTable.create(spark, str(tmp_path / "t"), KV, ["k"], num_buckets=2)
    t.append_delta(_kv(spark, 0, 10, "a", 1))
    t.create_branch("healthy")
    os.makedirs(os.path.join(t.path, f"{_SNAPDIR}.br-crashed"))
    refs = {(r["kind"], r["name"]): r["version"] for r in t.meta("refs").collect()}
    assert refs[("branch", "healthy")] is not None
    assert refs[("branch", "crashed")] is None
    t.drop_branch("crashed")
    assert ("branch", "crashed") not in {
        (r["kind"], r["name"]) for r in t.meta("refs").collect()
    }
