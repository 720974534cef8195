"""Scale contract of the grouped-model incremental path (VERDICT r1 #1):
per-batch maintenance must read only the landing buckets the batch touched
— O(touched groups), never O(table). Asserted on actual scan file counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cht_sync_spark.functions.json_doc import doc_to_row
from cht_sync_spark.operators.lww import lww_dedup
from cht_sync_spark.operators.models import CONVERSATIONS, ModelRunner
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.schemas import TRANSCRIPT, TRANSCRIPT_KEY


def _landing_with_rows(spark, path, feed_df, num_buckets=8):
    t = SnapshotTable.create(
        spark, path, TRANSCRIPT, TRANSCRIPT_KEY,
        num_buckets=num_buckets, bucket_cols=["conv_id"],
    )
    rows = lww_dedup(doc_to_row(feed_df)).withColumn(
        "saved_timestamp", F.timestamp_millis(F.col("seq") % 10**12)
    )
    t.append_delta(rows)
    return t, rows


def test_grouped_increment_reads_only_touched_buckets(spark, feed_df, tmp_path):
    landing, rows = _landing_with_rows(spark, str(tmp_path / "landing"), feed_df)
    total_files = len(landing.snapshot().files)
    assert total_files >= 8  # one per bucket at least

    runner = ModelRunner(spark, CONVERSATIONS, str(tmp_path / "conversations"))
    # epoch 0: fresh table -> full refresh (reads everything, by design)
    runner.run_increment(landing, rows, epoch=0)
    full_n = {r["conv_id"]: r["n_turns"] for r in runner.table.read_current().collect()}

    # epoch 1: a batch touching exactly ONE conversation
    one = rows.where(F.col("conv_id") == "c0000010").limit(1)
    batch = (
        # seq must be NEWER than every existing seq of the conv (feeds are
        # monotone; the feedgen phase bands top out below 3e18)
        one.withColumn("seq", F.lit(3_000_000_000_000_000_000))
        .withColumn("turn_idx", F.lit(99999))
        .withColumn("_id", F.concat_ws(":", "conv_id", F.lit("099999")))
        .withColumn("_rev", F.lit("1-newturn"))
        .withColumn("rev_height", F.lit(1).cast("long"))
        .withColumn("_deleted", F.lit(False))
    )
    landing.append_delta(batch)
    runner.run_increment(landing, batch, epoch=1)

    # the incremental read opened ≤ the files of ONE bucket (+ its deltas),
    # strictly fewer than the table's file count
    assert landing.last_scan_files < total_files
    assert landing.last_scan_files <= total_files // 4

    got = {r["conv_id"]: r["n_turns"] for r in runner.table.read_current().collect()}
    assert got["c0000010"] == full_n["c0000010"] + 1  # recount includes the new turn
    untouched = [c for c in full_n if c != "c0000010"]
    assert all(got[c] == full_n[c] for c in untouched)


def test_incompatible_group_layout_falls_back_to_full_read(spark, feed_df, tmp_path):
    """A landing table bucketed by the FULL key cannot prune by conv_id —
    the model must still be correct (just unpruned)."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "landing_fullkey"), TRANSCRIPT, TRANSCRIPT_KEY, num_buckets=8,
    )  # bucket_cols defaults to the full key
    rows = lww_dedup(doc_to_row(feed_df)).withColumn(
        "saved_timestamp", F.timestamp_millis(F.col("seq") % 10**12)
    )
    t.append_delta(rows)
    runner = ModelRunner(spark, CONVERSATIONS, str(tmp_path / "conv_fullkey"))
    runner.run_increment(t, rows, epoch=0)
    batch = rows.where(F.col("conv_id") == "c0000010")
    runner.run_increment(t, batch, epoch=1)
    total_files = len(t.snapshot().files)
    assert t.last_scan_files == total_files  # no pruning possible — full scan
    got = {r["conv_id"]: r["n_turns"] for r in runner.table.read_current().collect()}
    want = rows.where(~F.col("_deleted")).groupBy("conv_id").count().collect()
    assert got["c0000010"] == {r["conv_id"]: r["count"] for r in want}["c0000010"]
