"""Micro-batch replay orchestration — the engine's main loop.

Re-expresses the reference's watcher/importer loop (couch2pg/src/watcher.js:
6-15, importer.js:142-175 — drain batches until empty, checkpoint after each
upsert) as a checkpointed batch loop over the changes-feed source. The same
body also runs under Structured Streaming ``foreachBatch``
(:mod:`cht_sync_spark.streaming.stream`); this class is the deterministic
batch form used for correctness replays, kill/resume tests and benches.

Per micro-batch (epoch):

1. resume state = snapshot properties of the TARGET table (watermark, epoch)
   — the checkpoint lives inside the data table's atomic commit, so there is
   no window where data and checkpoint disagree (SURVEY.md §7.3 #5);
2. events = seq-range read (pushed-down filter);
3. doc->row transform (Catalyst ``from_json`` path by default);
4. LWW dedup + bucket-pruned MERGE (or merge-on-read append), committing
   data + watermark + per-source checkpoints + epoch marker in ONE snapshot;
5. lineage records appended per (epoch, source).

Exactly-once: if the epoch marker in the target says epoch >= k, batch k is
skipped on replay (and the merge is idempotent anyway — belt and braces,
matching the reference's checkpoint-after-commit + idempotent upsert design,
importer.js:171-172 / 19-25).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from typing import Literal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cht_sync_spark.functions.json_doc import doc_to_row, doc_to_row_arrow
from cht_sync_spark.operators.lww import lww_dedup
from cht_sync_spark.schemas import LINEAGE, TRANSCRIPT, TRANSCRIPT_KEY
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

WATERMARK_PROP = "watermark.global"
EPOCH_PROP = "epoch.global"


@dataclass
class BatchResult:
    epoch: int
    seq_lo: int
    seq_hi: int
    rows: int
    duration_ms: int
    skipped: bool = False


class ReplayPipeline:
    def __init__(
        self,
        spark: SparkSession,
        feed: ChangesFeedSource,
        table_path: str,
        *,
        batch_size: int = 100_000,
        num_buckets: int = 16,
        mode: Literal["cow", "mor"] = "cow",
        transform: Literal["catalyst", "arrow"] = "catalyst",
        saved_ts: Literal["event", "now"] = "event",
        lineage_path: str | None = None,
        models: list[tuple] | None = None,  # [(ModelSpec, path), ...]
    ):
        self.spark = spark
        self.feed = feed
        self.batch_size = batch_size
        self.mode = mode
        self.transform = transform
        self.saved_ts = saved_ts
        self.table = SnapshotTable.create(
            spark, table_path, TRANSCRIPT, TRANSCRIPT_KEY, num_buckets=num_buckets
        )
        self.lineage = (
            SnapshotTable.create(
                spark, lineage_path, LINEAGE, ["epoch_id", "source", "partition_id"], num_buckets=1
            )
            if lineage_path
            else None
        )
        from cht_sync_spark.operators.models import ModelRunner

        self.models = [ModelRunner(spark, spec, path) for spec, path in (models or [])]

    # ------------------------------------------------------------------ state
    def state(self) -> tuple[int, int]:
        """(watermark_seq, last_epoch) from the target's snapshot properties."""
        props = self.table.snapshot().properties
        return int(props.get(WATERMARK_PROP, -1)), int(props.get(EPOCH_PROP, -1))

    # ------------------------------------------------------------------- run
    def _transform(self, events: DataFrame) -> DataFrame:
        rows = doc_to_row(events) if self.transform == "catalyst" else doc_to_row_arrow(events)
        if self.saved_ts == "event":
            # deterministic ingest-time stand-in -> byte-identical replays
            rows = rows.withColumn("saved_timestamp", F.coalesce(F.col("ts"), F.timestamp_millis(F.col("seq") % 10**12)))
        return rows

    def run_batch(self, epoch: int, lo: int, hi: int) -> BatchResult:
        t0 = time.monotonic()
        wm, last_epoch = self.state()
        landing_done = epoch <= last_epoch
        models_done = all(m.last_epoch() >= epoch for m in self.models)
        if landing_done and models_done:
            return BatchResult(epoch, lo, hi, 0, 0, skipped=True)

        events = self.feed.batch(lo, hi)
        rows = self._transform(events)
        rows = lww_dedup(rows)

        if landing_done:
            # crash happened between landing commit and model commit last
            # run: replay only the model side of this batch
            for m in self.models:
                m.run_increment(self.table, rows, epoch=epoch)
            return BatchResult(epoch, lo, hi, 0, int((time.monotonic() - t0) * 1000))

        # Per-source checkpoint stats (the couchdb_progress analogue) ride
        # the write job as Observation metrics — conditional aggregates per
        # known source, collected DURING the write, zero extra pass over the
        # batch. Committed atomically with the data.
        from pyspark.sql import Observation

        sources = self.feed.sources()
        obs = Observation(f"batch{epoch}")
        metrics = []
        for i, s in enumerate(sources):
            hit = F.when(F.col("source") == s, F.col("seq"))
            metrics += [F.max(hit).alias(f"hi{i}"), F.count(hit).alias(f"n{i}")]
        rows = rows.observe(obs, *metrics)

        src_stats: list[dict] = []

        def _ckpt_props() -> dict[str, str]:
            # runs post-write / pre-commit: metrics from the write job land
            # in the SAME atomic snapshot as the data they describe
            got = obs.get
            out = {}
            for i, s in enumerate(sources):
                if got[f"n{i}"]:
                    src_stats.append({"source": s, "hi": got[f"hi{i}"], "n": got[f"n{i}"]})
                    out[f"checkpoint.{s}"] = json.dumps(
                        {"seq": int(got[f"hi{i}"]), "rows": int(got[f"n{i}"])}
                    )
            return out

        props = {WATERMARK_PROP: str(hi), EPOCH_PROP: str(epoch)}
        if self.mode == "mor":
            schema = self.table.evolve_schema(rows.schema)
            self.table.append_delta(
                rows, properties_update=props, new_schema=schema, properties_fn=_ckpt_props
            )
            dels = 0
            skew = 0.0
        else:
            stats = merge_upsert(
                self.table, rows, tombstones="keep", dedup_batch=False,
                properties_update=props, properties_fn=_ckpt_props,
            )
            dels, skew = stats.rows_deleted_tombstones, stats.skew_max_ratio
        n = int(sum(r["n"] for r in src_stats))

        for m in self.models:
            m.run_increment(self.table, rows, epoch=epoch)

        dur = int((time.monotonic() - t0) * 1000)
        if self.lineage is not None:
            recs = [
                (epoch, r["source"], 0, lo, int(r["hi"]), int(r["n"]), dels, skew, dur)
                for r in src_stats
            ]
            if recs:
                self.lineage.append_delta(self.spark.createDataFrame(recs, LINEAGE))
        return BatchResult(epoch, lo, hi, n, dur)

    def run(self, max_batches: int | None = None) -> list[BatchResult]:
        """Drain the feed (the reference's drain-until-empty loop,
        watcher.js:8-14, as ``trigger(availableNow=True)`` semantics)."""
        cuts = self.feed.plan_batches(self.batch_size)
        results: list[BatchResult] = []
        lo = -(2**62)
        for epoch, hi in enumerate(cuts):
            if max_batches is not None and len([r for r in results if not r.skipped]) >= max_batches:
                break
            # run_batch itself decides skip per component (landing watermark
            # vs per-model epoch markers), so lagging models catch up even
            # when the landing table is already past this range
            r = self.run_batch(epoch, lo, hi)
            if not r.skipped:
                results.append(r)
            lo = hi
        return results
