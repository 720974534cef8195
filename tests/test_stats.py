"""File-level column statistics + manifest-bounds data skipping.

The skipping stack (SnapshotTable.read/read_current):
bucket pruning (hash layout) > file skipping (per-file min/max bounds in
manifest entries, recorded from parquet footers at write time — Iceberg's
lower_bounds/upper_bounds) > parquet row-group pushdown. These tests pin:
bounds are recorded and correct; a filtered read opens only range-matching
files yet returns exactly the unpruned-read-plus-where result; files
without stats are conservatively kept; read_current point lookups derive
the bucket from equality filters and stay LWW-correct; string truncation
never over-prunes.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.tables.format import SnapshotTable, _entry_matches, _norm_bound


SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _rows(lo: int, hi: int, batch: int):
    base = dt.datetime(2024, 1, 1)
    return [
        Row(
            conv_id=f"c{i % 7:04d}",
            turn_idx=i,
            seq=1000 + i,
            text=f"turn {i}",
            ts=base + dt.timedelta(seconds=i),
        )
        for i in range(lo, hi)
    ]


def _mk(spark, path, **kw) -> SnapshotTable:
    return SnapshotTable.create(
        spark,
        str(path),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        bucket_cols=["conv_id"],
        num_buckets=4,
        sort_cols=["conv_id", "turn_idx"],
        lww_order=[("seq", False)],  # highest seq wins
        **kw,
    )


def _commit_ranges(spark, t, spans):
    for lo, hi in spans:
        t.append_delta(spark.createDataFrame(_rows(lo, hi, hi - lo), SCHEMA))


def test_bounds_recorded_per_file(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", properties={"stats.cols": '["turn_idx", "seq", "ts"]'})
    _commit_ranges(spark, t, [(0, 100)])
    files = [f for f in t.snapshot().files if f["level"] == "delta"]
    assert files and all("stats" in f for f in files)
    # bounds per file are consistent with the file's actual content
    for f in files:
        df = spark.read.schema(SCHEMA).parquet(f"{t.path}/{f['path']}")
        lo, hi = df.agg(F.min("turn_idx"), F.max("turn_idx")).first()
        # nulls: footer-proven null-freedom (expire_rows' metadata-drop proof)
        assert f["stats"]["turn_idx"] == {"lo": lo, "hi": hi, "nulls": False}
        slo, shi = df.agg(F.min("seq"), F.max("seq")).first()
        assert f["stats"]["seq"] == {"lo": slo, "hi": shi, "nulls": False}
        # timestamps are stored as epoch micros (total order preserved)
        tlo = f["stats"]["ts"]["lo"]
        assert isinstance(tlo, int) and tlo == _norm_bound(
            df.agg(F.min("ts")).first()[0], T.TimestampType()
        )
    # the union of per-file ranges covers the commit
    assert min(f["stats"]["turn_idx"]["lo"] for f in files) == 0
    assert max(f["stats"]["turn_idx"]["hi"] for f in files) == 99


def test_filtered_read_skips_files_and_matches_where(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", properties={"stats.cols": '["seq"]'})
    # three commits with disjoint seq ranges -> 3 generations of files/bucket
    _commit_ranges(spark, t, [(0, 100), (100, 200), (200, 300)])
    all_files = len(t.snapshot().files)
    got = t.read(filters=[("seq", ">=", 1100), ("seq", "<", 1200)])
    rows = got.count()
    pruned = t.last_scan_files
    assert pruned < all_files  # middle commit's files only
    t.read()
    assert t.last_scan_files == all_files
    # identical result to the unpruned read + where
    want = t.read().where((F.col("seq") >= 1100) & (F.col("seq") < 1200))
    assert rows == want.count() == 100
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_default_stats_cols_are_sort_cols(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # no stats.cols property
    _commit_ranges(spark, t, [(0, 50)])
    f = next(f for f in t.snapshot().files if f["level"] == "delta")
    assert set(f["stats"].keys()) == {"conv_id", "turn_idx"}


def test_legacy_entries_without_stats_are_kept(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", properties={"stats.cols": "[]"})  # disabled
    _commit_ranges(spark, t, [(0, 100)])
    n_all = len(t.snapshot().files)
    t.read(filters=[("seq", "=", 1001)])
    assert t.last_scan_files == n_all  # no stats -> conservatively keep all
    assert t.read(filters=[("seq", "=", 1001)]).count() == 1


def test_read_current_point_lookup_derives_bucket(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _commit_ranges(spark, t, [(0, 100)])
    # rewrite turn 10 of c0003 with a newer seq: LWW must still see it
    upd = spark.createDataFrame(
        [Row(conv_id="c0003", turn_idx=10, seq=99999, text="EDITED", ts=dt.datetime(2024, 2, 1))],
        SCHEMA,
    )
    t.append_delta(upd)
    total = len(t.snapshot().files)
    got = t.read_current(filters=[("conv_id", "=", "c0003")])
    out = {(r.turn_idx, r.text) for r in got.collect()}
    assert t.last_scan_files < total  # one bucket only
    # equals the full reconciled state restricted to the conv
    want = {
        (r.turn_idx, r.text)
        for r in t.read_current().where(F.col("conv_id") == "c0003").collect()
    }
    assert out == want and (10, "EDITED") in out


def test_read_current_rejects_non_key_filters(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _commit_ranges(spark, t, [(0, 10)])
    import pytest

    with pytest.raises(ValueError, match="key columns"):
        t.read_current(filters=[("text", "=", "turn 1")])


def test_string_truncation_never_over_prunes():
    # a 200-char string bound: lower bound truncates (prefix is still a
    # valid lower bound), upper bound is dropped -> matching stays sound
    long = "m" * 200
    entry = {"stats": {"s": {"lo": long[:64], "hi": None}}}
    assert _entry_matches(entry, [("s", ">=", "m" * 300)])  # hi unknown: keep
    assert _entry_matches(entry, [("s", "=", "m" * 70)])
    assert not _entry_matches(entry, [("s", "<", "a")])  # below true min: skip


def test_local_append_records_stats(spark, tmp_path):
    lineage_schema = T.StructType(
        [
            T.StructField("epoch", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    t = SnapshotTable.create(
        spark,
        str(tmp_path / "lin"),
        lineage_schema,
        key_cols=["epoch", "source"],
        num_buckets=1,
        sort_cols=["epoch"],
        lww_order=[("epoch", True)],
    )
    t.append_rows_local([(1, "db0", 10), (2, "db0", 20)])
    t.append_rows_local([(3, "db0", 30)])
    f = [f for f in t.snapshot().files]
    assert all(e["stats"]["epoch"]["lo"] is not None for e in f)
    t.read(filters=[("epoch", ">=", 3)])
    assert t.last_scan_files == 1


def test_stats_survive_compaction_and_prune_after(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", properties={"stats.cols": '["seq"]'})
    _commit_ranges(spark, t, [(0, 100), (100, 200)])
    t.compact()
    base = [f for f in t.snapshot().files if f["level"] == "base"]
    assert base and all("stats" in f for f in base)
    _commit_ranges(spark, t, [(200, 300)])
    got = t.read(filters=[("seq", ">=", 1200)])
    assert got.count() == 100
    # only the post-compaction commit's files match the range
    assert t.last_scan_files < len(t.snapshot().files)


def test_tz_aware_filter_values_normalize_to_utc(spark, tmp_path):
    """A tz-aware filter value must anchor at the UTC epoch — an epoch
    carrying the value's own offset shifts the normalized micros by that
    offset and silently over-prunes files (review finding)."""
    import datetime as dt

    t = _mk(spark, tmp_path / "t", properties={"stats.cols": '["ts"]'})
    _commit_ranges(spark, t, [(0, 50)])  # ts spans 2024-01-01T00:00:00..49s
    # +05:00 representation of 2024-01-01T00:00:10 UTC
    aware = dt.datetime(2024, 1, 1, 5, 0, 10, tzinfo=dt.timezone(dt.timedelta(hours=5)))
    naive = dt.datetime(2024, 1, 1, 0, 0, 10)
    from cht_sync_spark.tables.format import _norm_bound
    from pyspark.sql import types as T

    assert _norm_bound(aware, T.TimestampType()) == _norm_bound(naive, T.TimestampType())
    got = t.read(filters=[("ts", ">=", naive)])
    assert got.count() == 40 and t.last_scan_files >= 1


def test_none_filter_value_rejected(spark, tmp_path):
    import pytest

    t = _mk(spark, tmp_path / "t")
    _commit_ranges(spark, t, [(0, 10)])
    with pytest.raises(ValueError, match="must not be None"):
        t.read(filters=[("seq", ">", None)])
