"""Mergeable-sketch distinct counting (streaming/hll.py HllDistinctConsumer).

No DuckDB twin exists for the DataSketches HLL, so correctness is pinned
here against exact distinct counts: lifecycle estimates within tolerance,
register-max idempotence under cursor rollback (crash-window replay),
monotone ever-seen semantics (edits add, deletes never subtract),
compaction invisibility, reseed's semantic reset, and the table-pinned
sketch config.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.streaming.hll import HllDistinctConsumer
from cht_sync_spark.tables.format import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("author", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)


def _rows(spark, items):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_idx=t, author=a, seq=s, _deleted=d) for c, t, a, s, d in items],
        SCHEMA,
    )


def _mk_source(spark, path) -> SnapshotTable:
    return SnapshotTable.create(
        spark, str(path), SCHEMA, key_cols=["conv_id", "turn_idx"],
        num_buckets=4, bucket_cols=["conv_id"], lww_order=[("seq", False)],
    )


def _mk(spark, tmp_path, **kw):
    src = _mk_source(spark, tmp_path / "src")
    tgt = HllDistinctConsumer.create_target(
        spark, src, str(tmp_path / "hll"), ["conv_id"], "author",
        num_buckets=4, **kw,
    )
    return src, HllDistinctConsumer(spark, src, tgt, "uniq_authors", ["conv_id"], "author")


def _counts(c) -> dict:
    return {r.conv_id: r.distinct_est for r in c.counts().collect()}


def _exact(src) -> dict:
    live = src.read_current(drop_tombstones=True).where(F.col("author").isNotNull())
    return {
        r.conv_id: r.n
        for r in live.groupBy("conv_id").agg(F.count_distinct("author").alias("n")).collect()
    }


def test_lifecycle_matches_exact_within_tolerance(spark, tmp_path):
    src, c = _mk(spark, tmp_path)
    # wave 1: 300 distinct authors in conv a, 5 in conv b, a null author
    w1 = [("a", i, f"u{i}", 1, False) for i in range(300)]
    w1 += [("b", i, f"v{i % 5}", 1, False) for i in range(20)]
    w1 += [("b", 99, None, 1, False)]
    src.append_delta(_rows(spark, w1))
    c.run(max_cycles=10)
    # wave 2: more rows, overlapping + new authors
    src.append_delta(_rows(spark, [("a", 300 + i, f"u{i + 250}", 2, False) for i in range(100)]))
    c.run(max_cycles=10)
    est, exact = _counts(c), _exact(src)
    assert set(est) == set(exact) == {"a", "b"}
    assert est["b"] == exact["b"] == 5  # small sets are exact (coupon mode)
    assert abs(est["a"] - exact["a"]) / exact["a"] < 0.05  # 350 ± lgK-12 error


def test_monotone_ever_seen_semantics(spark, tmp_path):
    src, c = _mk(spark, tmp_path)
    src.append_delta(_rows(spark, [("a", 0, "u0", 1, False), ("a", 1, "u1", 1, False)]))
    c.run(max_cycles=10)
    assert _counts(c)["a"] == 2
    # an edit to a NEW author adds; the old author stays counted (ever seen)
    src.append_delta(_rows(spark, [("a", 0, "u2", 2, False)]))
    c.run(max_cycles=10)
    assert _counts(c)["a"] == 3
    # a delete never subtracts
    src.append_delta(_rows(spark, [("a", 1, None, 3, True)]))
    c.run(max_cycles=10)
    assert _counts(c)["a"] == 3
    # ...but the exact current-state count did drop — the documented trade
    assert _exact(src)["a"] == 1


def test_cursor_rollback_replay_is_idempotent(spark, tmp_path):
    src, c = _mk(spark, tmp_path)
    src.append_delta(_rows(spark, [("a", i, f"u{i}", 1, False) for i in range(50)]))
    c.run(max_cycles=10)
    before = _counts(c)
    # force a crash-window replay: move the cursor back and re-apply
    tgt = c.target
    tgt.commit(add_files=[], properties_update={c._ckpt_key: "1"})
    assert c.position() == 1
    c.run(max_cycles=10)
    assert _counts(c) == before  # register-max union: replay is a no-op


def test_compaction_only_range_advances_cursor(spark, tmp_path):
    src, c = _mk(spark, tmp_path)
    src.append_delta(_rows(spark, [("a", 0, "u0", 1, False)]))
    c.run(max_cycles=10)
    v = c.position()
    src.compact()
    c.run(max_cycles=10)
    assert c.position() == src.current_version() > v
    assert _counts(c)["a"] == 1


def test_reseed_resets_to_live_state(spark, tmp_path):
    src, c = _mk(spark, tmp_path)
    src.append_delta(_rows(spark, [("a", 0, "u0", 1, False), ("a", 1, "u1", 1, False)]))
    c.run(max_cycles=10)
    src.append_delta(_rows(spark, [("a", 0, None, 2, True)]))  # delete u0's row
    c.run(max_cycles=10)
    assert _counts(c)["a"] == 2  # ever-seen keeps u0
    c.reseed()
    assert _counts(c)["a"] == 1  # the documented semantic reset
    # incremental resumes cleanly after the reseed
    src.append_delta(_rows(spark, [("a", 2, "u9", 3, False)]))
    c.run(max_cycles=10)
    assert _counts(c)["a"] == 2


def test_config_pinning_and_validation(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    with pytest.raises(ValueError, match="lg_k"):
        HllDistinctConsumer.create_target(spark, src, str(tmp_path / "x"), ["conv_id"], "author", lg_k=2)
    with pytest.raises(ValueError, match="not in source schema"):
        HllDistinctConsumer.create_target(spark, src, str(tmp_path / "x"), ["conv_id"], "nope")
    tgt = HllDistinctConsumer.create_target(
        spark, src, str(tmp_path / "hll"), ["conv_id"], "author", num_buckets=4
    )
    with pytest.raises(ValueError, match="refusing to"):
        HllDistinctConsumer(spark, src, tgt, "n", ["conv_id"], "conv_id")
    # a plain table (no pinned config) is refused outright
    plain = SnapshotTable.create(
        spark, str(tmp_path / "plain"),
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("sketch", T.BinaryType())]),
        key_cols=["conv_id"], num_buckets=2,
    )
    with pytest.raises(ValueError, match="hll.lg_k"):
        HllDistinctConsumer(spark, src, plain, "n", ["conv_id"], "author")
