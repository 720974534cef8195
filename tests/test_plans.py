"""Physical-plan audits: the properties §4/§7 promise must be visible in
`.explain("formatted")` — pushed filters, pruned read schemas, hash
aggregates (not window sorts) on the LWW fast path, and no cartesian
products anywhere in the candidate-generation plans.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_seq_range_filter_pushed_to_scan(spark, feed_path):
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    plan = _plan(feed.batch(100, 500))
    assert "PushedFilters" in plan
    # both range bounds reach the parquet scan (file-level min/max pruning)
    assert "GreaterThan(seq,100)" in plan and "LessThanOrEqual(seq,500)" in plan


def test_column_pruning_reaches_scan(spark, feed_path):
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    plan = _plan(feed.df().select("seq", "source"))
    # ReadSchema carries only the projected columns — doc (the wide column)
    # is never read for a metadata-only query
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("doc" not in ln for ln in read_schema)


def test_lww_window_gets_rank_limit_pushdown(spark, feed_path):
    """The LWW `rn == 1` window must trigger Spark's WindowGroupLimit rank
    pushdown: a PARTIAL group-limit before the shuffle (map-side winner
    pruning — the property that makes the window the fast path, see
    operators/lww.py) and the final limit after it."""
    from cht_sync_spark.functions.json_doc import doc_to_row
    from cht_sync_spark.operators.lww import lww_dedup

    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    plan = _plan(lww_dedup(doc_to_row(feed.df())))
    assert plan.count("WindowGroupLimit") >= 2  # partial (map-side) + final
    assert "Partial" in plan


def test_no_cartesian_product_in_dedup_plans(spark):
    from cht_sync_spark.functions.dedup import (
        embedding_dup_pairs,
        jaccard_pairs,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    for df in (
        jaccard_pairs(docs, n=2, threshold=0.5),
        minhash_lsh_pairs(docs, n=2, threshold=0.5),
        simhash_pairs(docs),
        embedding_dup_pairs(emb, threshold=0.5, dim=dim),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bucket_pruned_read_lists_only_requested_buckets(spark, tmp_path):
    """read(buckets=...) must translate to a scan over ONLY those buckets'
    files — checked at the file-listing level (the manifest is the prune
    point, like Iceberg scan planning)."""
    from pyspark.sql import types as T

    from cht_sync_spark.tables.format import SnapshotTable

    schema = T.StructType(
        [T.StructField("k", T.LongType(), False), T.StructField("v", T.StringType(), True)]
    )
    t = SnapshotTable.create(spark, str(tmp_path / "t"), schema, ["k"], num_buckets=8)
    t.append_delta(spark.range(1000).select(F.col("id").alias("k"), F.lit("x").alias("v")))
    total = len(t.snapshot().files)
    assert total >= 8
    t.read(buckets=[0, 1])
    assert t.last_scan_files <= total // 3


def test_scd2_derivation_is_single_exchange(spark):
    """scd2_intervals plans ONE hash exchange: the duplicate fold, the
    check-collapse lag, and the interval-chain lead all window over the
    same key partitioning with an order prefixed by order_col, so the
    dedup can never force a second shuffle (the dropDuplicates form did)."""
    from cht_sync_spark.streaming.scd2 import scd2_intervals

    df = spark.range(100).selectExpr(
        "cast(id % 10 as string) conv_id", "id seq",
        "cast(id % 3 as string) role", "cast(false as boolean) _deleted",
    )
    for kw in ({}, {"check_cols": ["role"]},
               {"tiebreak": [("seq", False), ("role", False)]}):
        # executedPlan tree (each node printed once, unlike formatted mode)
        plan = scd2_intervals(df, ["conv_id"], "seq", **kw)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, (kw, plan)
