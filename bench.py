#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Two workload groups:

1. **CDC replay** (the BASELINE.json north-star metric): a deterministic
   synthetic CouchDB-changes feed, sized proportionally to the scale factor,
   replayed through the full pipeline (seq-range source -> Catalyst doc->row
   transform -> LWW dedup -> snapshot-committed upsert) in both merge-on-read
   (sustained-ingest path) and copy-on-write (bucket-pruned MERGE) modes.
   Feed generation/writing is NOT timed; `events_per_sec` extras report
   sustained change-events/sec. Scaling-efficiency evidence (local[8] vs
   local[32]) lives in scripts/bench_scaling.py -> BENCH/BASELINE.md.

2. **Driver-table queries**: representative operators from
   __spark_entry__.queries() over the driver parquet tables, forced with the
   noop sink (full computation, no driver collect).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

# mutable bench state on tmpfs when available (the VM's one virtual disk
# is shared and noisy; see BENCH/BASELINE.md), feed cache included
_default_tmp = "/dev/shm/cht_sync_bench" if os.path.isdir("/dev/shm") else "/tmp/cht_sync_bench"
BENCH_TMP = os.environ.get("SPARK_GRAFT_BENCH_TMP", _default_tmp)
# page-zero the heap at JVM startup, outside the timed sections
os.environ.setdefault("SPARK_GRAFT_JVM_OPTS", "-Xms16g -XX:+AlwaysPreTouch")
# table-building driver queries (changelog/consumer/stats/tag) create their
# working tables via tempfile.mkdtemp — put those on tmpfs too, or the
# shared virtual disk adds 2x noise to exactly those queries
os.makedirs(os.path.join(BENCH_TMP, "qtmp"), exist_ok=True)
os.environ.setdefault("TMPDIR", os.path.join(BENCH_TMP, "qtmp"))
import tempfile

tempfile.tempdir = None  # re-read TMPDIR on next use


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _force(df) -> None:
    """Run the full plan with no result transfer (noop sink)."""
    df.write.format("noop").mode("overwrite").save()


def ensure_feed(spark, sf: float) -> tuple[str, int]:
    """Deterministic bench feed sized ~10M events/sf unit, cached on disk.

    Cache key includes all gen params, so identical across rounds/runs.
    """
    from cht_sync_spark.sources.feedgen import feed_sources, synth_changes, write_feed

    n_convs = max(200, int(80_000 * sf / 0.1))
    params = f"v2_{n_convs}_6_8_4_2500_2_42"
    path = os.path.join(BENCH_TMP, f"feed_{params}")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        feed = synth_changes(
            spark, n_convs=n_convs, base_turns=6, turns_jitter=8,
            hot_convs=4, hot_turns=2500, n_sources=2, seed=42,
        )
        write_feed(feed, path, n_files=32)
        with open(marker, "w") as fh:
            fh.write("ok")
    n = spark.read.parquet(path).count()
    return path, n


def bench_replay(
    spark, feed_path: str, n_events: int, mode: str, num_buckets: int,
    with_models: bool = False, with_ivm: bool = False,
) -> float:
    from cht_sync_spark.sources.changes import ChangesFeedSource
    from cht_sync_spark.sources.feedgen import feed_sources
    from cht_sync_spark.streaming.pipeline import ReplayPipeline

    tag = f"replay_{mode}" + ("_models" if with_models else "") + ("_ivm" if with_ivm else "")
    out = os.path.join(BENCH_TMP, tag)
    shutil.rmtree(out, ignore_errors=True)
    models = []
    if with_models:
        from cht_sync_spark.operators.models import CONV_PROFILES, CONVERSATIONS

        models = [
            (CONVERSATIONS, os.path.join(out, "conversations")),
            (CONV_PROFILES, os.path.join(out, "conv_profiles")),
        ]
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    pipe = ReplayPipeline(
        spark, feed, os.path.join(out, "landing"),
        batch_size=max(200_000, n_events // 4),
        num_buckets=num_buckets, mode=mode, models=models,
        # sustained-ingest form end to end: MOR model tables append O(slice)
        # deltas per epoch instead of rewriting the model table (models.py
        # ModelRunner mode='mor'); compaction is paid in-time below
        model_mode=mode,
    )
    if with_ivm:
        # conversations-profile aggregate maintained per batch by the IVM
        # consumer (streaming/ivm.py): sum measures delta-merge at O(batch),
        # the max-kind ones fold candidates and recompute only retracted
        # groups — the scale comparison point for replay_mor_models, which
        # recomputes every touched group's slice per epoch
        from pyspark.sql import functions as F

        from cht_sync_spark.streaming.ivm import AggregateConsumer, Measure

        measures = {
            "chars": F.length("text"),
            "max_h": Measure(F.col("rev_height"), kind="max"),
            "any_tool": Measure(F.col("tool").isNotNull(), kind="max"),
        }
        tgt = AggregateConsumer.create_target(
            spark, pipe.table, os.path.join(out, "conv_agg"), ["conv_id"],
            measures, num_buckets=num_buckets,
        )
        cons = AggregateConsumer(spark, pipe.table, tgt, "agg", ["conv_id"], measures)
        t0 = time.monotonic()
        cuts = feed.plan_batches(pipe.batch_size)
        lo = -(2**62)
        for epoch, hi in enumerate(cuts):
            pipe.run_batch(epoch, lo, hi)
            cons.run_once()
            lo = hi
        if mode == "mor":
            pipe.table.compact()
        return time.monotonic() - t0
    t0 = time.monotonic()
    pipe.run()
    if mode == "mor":
        pipe.table.compact()  # sustained path pays compaction too
        for m in pipe.models:
            m.table.compact()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from cht_sync_spark.session import get_spark

    spark = get_spark("cht_sync_bench")
    os.makedirs(BENCH_TMP, exist_ok=True)

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ---- group 1: CDC replay (north-star workload) --------------------
    feed_path, n_events = ensure_feed(spark, sf)
    extras["feed_events"] = n_events
    for mode in ("mor", "cow"):
        sec = bench_replay(spark, feed_path, n_events, mode, num_buckets=64)
        timings[f"replay_{mode}"] = round(sec, 3)
        extras[f"replay_{mode}_events_per_sec"] = round(n_events / sec, 1)
    # full model DAG maintained incrementally alongside the ingest
    # (conversations -> conv_profiles, the persons.sql-analogue chain)
    sec = bench_replay(spark, feed_path, n_events, "mor", num_buckets=64, with_models=True)
    timings["replay_mor_models"] = round(sec, 3)
    extras["replay_mor_models_events_per_sec"] = round(n_events / sec, 1)
    # same ingest with a per-batch IVM aggregate instead of the group-
    # recompute model plane (the O(batch) vs O(touched-group-history) story)
    sec = bench_replay(spark, feed_path, n_events, "mor", num_buckets=64, with_ivm=True)
    timings["replay_mor_ivm"] = round(sec, 3)
    extras["replay_mor_ivm_events_per_sec"] = round(n_events / sec, 1)

    # ---- group 2: driver-table operator queries -----------------------
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in (
        "i1_seq_lww_dedup",
        "t6_merge_upsert_lww",
        "t8_inner_equijoin",
        "t9_cascade_delete_antijoin",
        "a3_count_by_status",
        "p3_doc_row_transform",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_clusters",
        "dedup_simhash",
        "text_stats",
        "similarity_topk",
        "pq_adc_topk",
        "pq_adc_topk_trained",
        "similarity_ivf_trained",
        "text_fingerprint_winnow",
        "asof_click_attribution",
        "range_join_click_window",
        "dlq_classify",
        "contamination_check",
        "repetition_stats",
        "pack_sequences",
        "curation_funnel",
        "ngram_lm_perplexity",
        "bpe_pair_counts",
        "sample_exact_k",
        "doc_chunking",
        "bm25_search",
        "bm25_index_search",
        "dedup_index_probe",
        "dedup_index_pairs",
        "ann_index_cdc",
        "ivf_index_cdc",
        "conversation_assembly",
        "sft_examples",
        "scd2_history",
        "cdc_wal_export",
        "changelog_read",
        "changelog_consume",
        "ivm_join",
        "gdpr_purge",
        "retention_expiry",
        "mixture_sample",
        "table_diff",
        "metadata_count",
        "stats_prune_scan",
        "bloom_prune_scan",
        "sql_view",
    ):
        t0 = time.monotonic()
        _force(qs[name](spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "e2e_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
