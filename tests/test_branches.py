"""Branches (write-audit-publish), fast-forward publish, and rollback on
SnapshotTable (tables/format.py). The WAP pattern is the table-format
analogue of the reference's staged-then-published dbt runs: write to an
isolated snapshot chain, audit it, publish by fast-forwarding main —
metadata-only at every step, shared immutable data/manifest files."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from cht_sync_spark.tables.format import CommitConflict, SnapshotTable


def _mk(spark, path, rows):
    df = spark.createDataFrame(rows, "k int, v string")
    t = SnapshotTable.create(spark, path, df.schema, key_cols=["k"], num_buckets=4,
                             lww_order=[("v", False)])  # larger v wins the LWW fold
    t.append_delta(df)
    return t


def _state(t, version=None):
    return {r["k"]: r["v"] for r in t.read_current(version=version).collect()}


class TestBranchIsolation:
    def test_branch_write_invisible_to_main(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a"), (2, "b")])
        main_v = t.current_version()
        br = t.create_branch("audit")
        br.append_delta(spark.createDataFrame([(3, "c")], "k int, v string"))
        assert _state(br) == {1: "a", 2: "b", 3: "c"}
        assert _state(t) == {1: "a", 2: "b"}
        assert t.current_version() == main_v
        assert t.branches() == ["audit"]

    def test_fork_is_metadata_only(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        n_data = sum(len(fs) for _, _, fs in os.walk(str(tmp_path / "t" / "data")))
        t.create_branch("b")
        assert sum(len(fs) for _, _, fs in os.walk(str(tmp_path / "t" / "data"))) == n_data

    def test_branch_requires_create(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        with pytest.raises(FileNotFoundError):
            t.branch("nope")
        t.create_branch("b")
        with pytest.raises(FileExistsError):
            t.create_branch("b")
        with pytest.raises(ValueError):
            t.branch("b").create_branch("nested")

    def test_crashed_create_claim_is_refused_and_droppable(self, spark, tmp_path):
        # the .branch marker (published create-iff-absent through the
        # FileIO seam — locally an O_EXCL file, a conditional PUT on
        # object stores) is the atomic creation claim; a create that
        # crashed after the marker but before the fork snapshot leaves an
        # unusable claim — re-create refused, branch() not found,
        # drop_branch cleans it up
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        d = str(tmp_path / "t" / t._branch_snapdir("ghost"))
        os.mkdir(d)
        open(os.path.join(d, ".branch"), "w").close()
        with pytest.raises(FileExistsError):
            t.create_branch("ghost")
        with pytest.raises(FileNotFoundError):
            t.branch("ghost")
        t.drop_branch("ghost")
        t.create_branch("ghost")  # now succeeds
        assert t.branches() == ["ghost"]
        # a crash BEFORE the marker landed claims nothing: the bare dir
        # does not block a re-create (strictly better than the old
        # mkdir-as-claim, which wedged until a manual drop)
        os.mkdir(str(tmp_path / "t" / t._branch_snapdir("gh2")))
        t.create_branch("gh2")
        assert sorted(t.branches()) == ["gh2", "ghost"]


class TestFastForward:
    def test_publish_applies_branch_commits(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a"), (2, "b")])
        fork_tip = t.current_version()
        br = t.create_branch("wap")
        br.append_delta(spark.createDataFrame([(2, "b2"), (3, "c")], "k int, v string"))
        br.append_delta(spark.createDataFrame([(4, "d")], "k int, v string"))
        new_tip = t.fast_forward("wap")
        # publish is ONE atomic squashed commit (all-or-nothing), not a
        # per-branch-snapshot replay that a crash could strand midway
        assert new_tip == fork_tip + 1
        assert _state(t) == {1: "a", 2: "b2", 3: "c", 4: "d"}
        # add-only branch squashes to an append: changelog readers see
        # exactly the net additions
        ch = t.changes(fork_tip)
        assert ch.count() == 3

    def test_publish_is_noop_on_unchanged_branch(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        tip = t.current_version()
        t.create_branch("idle")
        assert t.fast_forward("idle") == tip
        assert t.current_version() == tip

    def test_publish_from_branch_handle_refused(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        a, _b = t.create_branch("a"), t.create_branch("b")
        with pytest.raises(ValueError, match="main table"):
            a.fast_forward("b")

    def test_refuses_when_main_advanced(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        br = t.create_branch("wap")
        br.append_delta(spark.createDataFrame([(2, "b")], "k int, v string"))
        t.append_delta(spark.createDataFrame([(9, "z")], "k int, v string"))
        with pytest.raises(CommitConflict, match="re-fork"):
            t.fast_forward("wap")
        assert _state(t) == {1: "a", 9: "z"}  # main untouched

    def test_failed_audit_drops_branch_and_vacuum_reclaims(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        br = t.create_branch("bad")
        br.append_delta(spark.createDataFrame([(2, "JUNK")], "k int, v string"))
        # branch-referenced files survive a graceless vacuum while the branch lives
        assert t.vacuum(grace_seconds=0.0) == 0
        assert _state(br) == {1: "a", 2: "JUNK"}
        t.drop_branch("bad")
        assert t.branches() == []
        assert t.vacuum(grace_seconds=0.0) >= 1  # branch-only data reclaimed
        assert _state(t) == {1: "a"}

    def test_wap_flow_with_contract_audit(self, spark, tmp_path):
        # the full write-audit-publish round: stage a batch on a branch, run
        # a data-quality audit there, publish only on pass
        from cht_sync_spark.operators.contracts import check_contract

        t = _mk(spark, str(tmp_path / "t"), [(1, "a"), (2, "b")])
        br = t.create_branch("stage")
        br.append_delta(spark.createDataFrame([(3, "c"), (4, None)], "k int, v string"))
        stats = check_contract(br.read_current(), unique_key=["k"], not_null=["k"])
        assert stats["n_rows"] == 4  # v is nullable by contract; k clean -> publish
        t.fast_forward("stage")
        assert _state(t)[4] is None


class TestRollback:
    def test_rollback_restores_old_state_forward(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        v1 = t.current_version()
        t.append_delta(spark.createDataFrame([(2, "b")], "k int, v string"))
        t.append_delta(spark.createDataFrame([(3, "c")], "k int, v string"))
        tip = t.current_version()
        snap = t.rollback(v1)
        assert snap.version == tip + 1  # history moves FORWARD
        assert snap.operation == "rollback"
        assert _state(t) == {1: "a"}
        # old states remain time-travelable
        assert _state(t, version=tip) == {1: "a", 2: "b", 3: "c"}

    def test_rollback_to_tag(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        t.tag("golden")
        t.append_delta(spark.createDataFrame([(1, "zz")], "k int, v string"))
        assert _state(t) == {1: "zz"}
        t.rollback(to_ref="golden")
        assert _state(t) == {1: "a"}

    def test_rollback_keeps_later_tags_pinned(self, spark, tmp_path):
        # tags are REFS, not table state: rolling back past a tag's creation
        # must not unpin it (or expire+vacuum would reap the tagged snapshot)
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        v1 = t.current_version()
        t.append_delta(spark.createDataFrame([(2, "b")], "k int, v string"))
        t.tag("run-x")
        pinned = t.resolve_ref("run-x")
        t.rollback(v1)
        assert t.resolve_ref("run-x") == pinned
        for i in range(12):
            t.append_delta(spark.createDataFrame([(10 + i, "x")], "k int, v string"))
        t.expire_snapshots(keep_last=2)
        t.vacuum(grace_seconds=0.0)
        assert _state(t, version=pinned) == {1: "a", 2: "b"}  # still readable

    def test_changelog_refuses_to_cross_rollback(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        v1 = t.current_version()
        t.append_delta(spark.createDataFrame([(2, "b")], "k int, v string"))
        t.rollback(v1)
        with pytest.raises(ValueError, match="rollback"):
            t.changes(v1).collect()
        # non-strict consumers accept the over-delivery
        assert t.changes(v1, strict=False).count() >= 1

    def test_rollback_never_delivers_resurrected_cdc(self, spark, tmp_path):
        # a rollback can re-add OLD cdc-level files to the fold (a later
        # compaction dropped them); those are change records of a PAST
        # commit and must never be delivered as the rollback's changelog
        from cht_sync_spark.tables.merge import merge_upsert

        mk = lambda rows: spark.createDataFrame(rows, "k int, v string, seq long")
        t = SnapshotTable.create(
            spark, str(tmp_path / "t"), mk([]).schema, key_cols=["k"],
            num_buckets=4, lww_order=[("seq", False)],
            properties={"cdc.enabled": "true"},
        )
        merge_upsert(t, mk([(1, "a", 1), (2, "b", 2)]))
        merge_upsert(t, mk([(1, "a2", 3)]))
        v2 = t.current_version()
        t.compact()
        v3 = t.current_version()
        t.rollback(v2)
        with pytest.raises(ValueError, match="rollback"):
            t.changes(v3).collect()
        got = {(r["k"], r["v"]) for r in t.changes(v3, strict=False).collect()}
        # compaction retired the cdc entries WITHOUT rewriting base files, so
        # the rollback's only re-added files are the resurrected cdc records —
        # and those must NOT be delivered (pre-fix this set was
        # {(1,'a'),(2,'b'),(1,'a2')}: the stale (1,'a') would resurrect at a
        # consumer). The restored state equals the tip state, so the correct
        # changelog is empty.
        assert got == set()
        assert {(r["k"], r["v"]) for r in t.read_current().collect()} == {(1, "a2"), (2, "b")}

    def test_rollback_then_new_writes(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        v1 = t.current_version()
        t.append_delta(spark.createDataFrame([(2, "b")], "k int, v string"))
        t.rollback(v1)
        t.append_delta(spark.createDataFrame([(5, "e")], "k int, v string"))
        assert _state(t) == {1: "a", 5: "e"}


class TestBranchMergeOps:
    def test_merge_upsert_on_branch(self, spark, tmp_path):
        from cht_sync_spark.tables.merge import merge_upsert

        t = _mk(spark, str(tmp_path / "t"), [(1, "a"), (2, "b")])
        br = t.create_branch("m")
        # merge is LWW ('v' desc): 'bb' outranks 'b', so the upsert wins
        merge_upsert(br, spark.createDataFrame([(2, "bb"), (3, "C")], "k int, v string"))
        assert _state(br) == {1: "a", 2: "bb", 3: "C"}
        assert _state(t) == {1: "a", 2: "b"}
        t.fast_forward("m")
        assert _state(t) == {1: "a", 2: "bb", 3: "C"}

    def test_main_expire_does_not_break_branch(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), [(1, "a")])
        br = t.create_branch("keep")
        for i in range(6):
            t.append_delta(spark.createDataFrame([(10 + i, "x")], "k int, v string"))
        t.expire_snapshots(keep_last=2)
        t.vacuum(grace_seconds=0.0)
        assert _state(br) == {1: "a"}  # fork-point copy + shared files survive
