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
   data + watermark + per-(source, partition) checkpoints + epoch marker in
   ONE snapshot;
5. lineage records appended per (epoch, source, partition);
6. downstream models maintained incrementally — CONCURRENTLY when there is
   more than one (T14: the reference splits dbt models across daemons by
   selector, docker-compose.yml:40-62 / profiles.yml:5; here each model is
   an independent Spark job submitted from its own thread, so Spark
   schedules their stages in parallel; each model commits its own epoch
   marker to its own table, preserving per-model exactly-once).

Checkpoint semantics: the per-source/per-partition stats are observed on the
PRE-dedup event stream (raw ingested events), so ``checkpoint.*.seq`` is a
true resume cursor — a high-seq event that loses LWW still advances it —
and ``rows`` counts events processed, matching the reference's
``couchdb_progress`` bookkeeping (importer.js:171-172).

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
from cht_sync_spark.schemas import CHECKPOINT, LINEAGE, MODEL_RUN, TRANSCRIPT, TRANSCRIPT_KEY
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
    rows: int  # raw change events processed (pre-dedup)
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
        model_mode: Literal["cow", "mor"] = "cow",
        bucket_cols: list[str] | None = None,
        model_parallelism: int | None = None,
        marker: str = "global",
        probe_pending: bool = False,
        maintenance_every: int | None = None,
        minor_compact_every: int | None = None,
        maintenance_keep_snapshots: int = 20,
        dlq_path: str | None = None,
        table_properties: dict[str, str] | None = None,
        model_runs_path: str | None = None,
        consumers: list | None = None,
    ):
        self.spark = spark
        self.feed = feed
        self.batch_size = batch_size
        self.mode = mode
        self.transform = transform
        self.saved_ts = saved_ts
        # S8 in-process fan-out: several pipelines (one per source/watcher,
        # reference couch2pg/src/index.js:7-11) may ingest into the SAME
        # landing table concurrently. Each keeps its own watermark/epoch
        # marker namespace so one worker's progress never masks another's;
        # the idempotent LWW merge + commit retries make the interleaving
        # safe.
        self.marker = marker
        self._wm_prop = f"watermark.{marker}"
        self._epoch_prop = f"epoch.{marker}"
        # In-loop table maintenance (Iceberg's rewrite_data_files /
        # expire_snapshots cadence): every N applied batches the MOR deltas
        # fold into a fresh base, old manifests expire, and aged orphans
        # vacuum. This is what BOUNDS read amplification (deltas since last
        # compaction) and driver-side metadata (live manifest count) over a
        # 10^10-event replay — without a cadence both grow O(batches).
        self.maintenance_every = maintenance_every
        # Minor cadence (compact_deltas): bin-pack per-epoch delta files
        # per bucket without refolding any base — O(delta bytes). Runs
        # between full cycles; a full cycle resets its counter.
        self.minor_compact_every = minor_compact_every
        self.maintenance_keep_snapshots = maintenance_keep_snapshots
        # In-loop changelog consumers (ChangelogConsumer, TermIndexConsumer,
        # DedupIndexConsumer, AnnIndexConsumer, AggregateConsumer — anything
        # with run()): after each applied batch the drain loop gives every
        # consumer a catch-up cycle, so one process keeps the downstream
        # mirrors/indexes/aggregates fresh alongside the ingest. This is
        # CONVENIENCE wiring, not a correctness dependency: each consumer
        # owns its cursor, committed atomically with its derived data, so a
        # crash between the landing commit and a consumer cycle simply
        # leaves that consumer one range behind — the next call (here or
        # anywhere else) heals it. Consumers over a COW landing table need
        # cdc.enabled (strict changelog rules apply unchanged).
        self.consumers = list(consumers or [])
        # S2 lag probe: when on, each batch's checkpoint also records the
        # per-source events still pending past the batch's high seq (the
        # reference's `_changes?limit=0&since=seq -> pending`,
        # importer.js:147-153) — one pruned count per batch, opt-in.
        self.probe_pending = probe_pending
        # Landing layout: bucket by conv_id (a PREFIX of the key) rather than
        # the full (conv_id, turn_idx) key — every conversation lives in one
        # bucket, so conv_id-grouped incremental models prune their landing
        # read to the touched buckets (O(touched groups), not O(table)).
        # Tradeoff: a pathologically hot conversation concentrates in one
        # bucket's write task; pass bucket_cols=TRANSCRIPT_KEY to spread it
        # if no grouped models need pruning.
        # table_properties passes through to CREATE (e.g. 'cdc.enabled':
        # 'true' so a COW landing table emits exact change-data files per
        # merge and downstream ChangelogConsumers can tail it strictly;
        # MOR landings need no CDF — their appends ARE the changelog)
        self.table = SnapshotTable.create(
            spark, table_path, TRANSCRIPT, TRANSCRIPT_KEY,
            num_buckets=num_buckets, bucket_cols=bucket_cols or ["conv_id"],
            properties=table_properties,
        )
        self.lineage = (
            SnapshotTable.create(
                spark, lineage_path, LINEAGE, ["epoch_id", "source", "partition_id"], num_buckets=1
            )
            if lineage_path
            else None
        )
        # Model run-stats table (dbt_results parity — the per-model status/
        # rows/execution-time records the reference's metrics exporter
        # scrapes, sql-exporter-config.yaml:75-90). Keyed (model, epoch);
        # LWW on `completed` DESC so a crash-resumed batch's 'skipped'
        # replay record never shadows the completed run's record.
        from cht_sync_spark.operators.models import create_model_runs_table

        self.model_runs_table = (
            create_model_runs_table(spark, model_runs_path) if model_runs_path else None
        )
        # Dead-letter quarantine (functions/dlq.py): with a dlq_path,
        # malformed events are filtered out BEFORE the typed transform
        # (whose ANSI casts would throw on them), written to their own
        # keyed table with a reason, and the seq cursor advances past them
        # — a poison document can no longer stall the 10^10-event replay.
        # Without one the engine keeps its fail-fast default.
        from cht_sync_spark.functions.dlq import DLQ_KEY, DLQ_SCHEMA

        self.dlq = (
            SnapshotTable.create(
                spark, dlq_path, DLQ_SCHEMA, DLQ_KEY,
                num_buckets=4, lww_order=[("seq", False)],
            )
            if dlq_path
            else None
        )
        from cht_sync_spark.operators.models import ModelRunner, topo_levels

        self.models = [
            ModelRunner(spark, spec, path, mode=model_mode)
            for spec, path in (models or [])
        ]
        self.model_mode = model_mode
        self.model_parallelism = model_parallelism
        # Model dependency DAG (dbt's ref() graph — the reference's
        # persons.sql reads the contacts MODEL): resolve depends_on against
        # the declared model set and precompute topological LEVELS. Models
        # within a level are independent and run in parallel (T14); levels
        # run in order so a dependent transform always reads upstream state
        # that already includes this epoch.
        self._runners_by_name = {m.spec.name: m for m in self.models}
        self._model_levels = topo_levels(self.models)

    # ------------------------------------------------------------------ state
    def state(self) -> tuple[int, int]:
        """(watermark_seq, last_epoch) from the target's snapshot properties."""
        props = self.table.snapshot().properties
        return int(props.get(self._wm_prop, -1)), int(props.get(self._epoch_prop, -1))

    def checkpoints(self) -> DataFrame:
        """Per-(source, partition) checkpoint state as a CHECKPOINT-schema
        DataFrame — the queryable form of the ``couchdb_progress`` analogue
        (reference setup.js:13-19), decoded from the atomic snapshot
        properties."""
        import re
        from datetime import datetime, timezone

        rows = []
        for k, v in self.table.snapshot().properties.items():
            # per-partition keys use their own `ckpt_part.<p>.<source>`
            # prefix (partition id FIRST) so a source name that itself ends
            # in '.p<digits>' can never parse as a phantom partition key and
            # the aggregate `checkpoint.<source>` namespace never collides
            m = re.match(r"^ckpt_part\.(\d+)\.(.+)$", k)
            if not m:
                continue
            d = json.loads(v)
            pend = d.get("pending")
            upd = d.get("updated_at")
            rows.append(
                (
                    m.group(2), int(m.group(1)), int(d["seq"]),
                    int(pend) if pend is not None else None,
                    int(d.get("epoch", -1)),
                    datetime.fromtimestamp(upd / 1000, tz=timezone.utc).replace(tzinfo=None)
                    if upd is not None
                    else None,
                )
            )
        return self.spark.createDataFrame(rows, CHECKPOINT)

    @classmethod
    def bootstrap(
        cls,
        spark: SparkSession,
        feed,
        table_path: str,
        snapshot_df: DataFrame,
        frontier_seq: int,
        checkpoint_rows: list[tuple[str, int, int]] | None = None,
        marker: str = "global",
        **pipe_kw,
    ) -> "ReplayPipeline":
        """Initial load at a changelog position — the canonical CDC
        bootstrap (Debezium's snapshot-then-stream, DMS full-load+CDC,
        CouchDB's one-shot replication then ``since=seq``): land an
        existing reconciled snapshot of the corpus and start tailing the
        feed from ``frontier_seq`` instead of replaying history that may
        no longer exist upstream (compacted feed, purged changes).

        ``snapshot_df`` is landing-shaped rows (the transcript schema —
        e.g. another table's ``read_current()``, or a one-off batch
        transform of a CouchDB dump); it is LWW-deduped and landed in ONE
        atomic overwrite that also sets the ``marker``'s watermark to
        ``frontier_seq`` — so either the snapshot AND the resume position
        land together or neither does, the same crash contract as a batch
        commit. ``run()`` then skips every planned cut at or below the
        frontier via the watermark guard (no epoch alignment needed: the
        cut plan may use any batch size, and a cut straddling the frontier
        over-delivers only rows the idempotent fold discards).

        ``checkpoint_rows`` — optional ``(source, partition, seq)`` triples
        (e.g. from the donor pipeline's :meth:`checkpoints`) — seed the
        per-(source, partition) cursor surface so lag/liveness metrics are
        meaningful from the first cycle; they are bookkeeping only (resume
        is the watermark's job).

        Downstream planes are NOT bootstrapped here: grouped models and
        changelog consumers derive from the landing table and should
        ``reseed()`` (consumers) or full-refresh (models change their
        transform hash) after adoption — their incremental paths need a
        cursor into THIS table's history, which starts at the snapshot.

        Refuses a landing table that already holds data or ANY marker's
        progress: the snapshot lands as a full overwrite, which would
        destroy rows other markers (S8 fan-out) already ingested while
        their watermarks kept them from re-landing. Bootstrap is a
        fresh-table operation by construction.
        """
        pipe = cls(spark, feed, table_path, marker=marker, **pipe_kw)
        snap = pipe.table.snapshot()
        markers = sorted(
            k for k in snap.properties
            if k.startswith("watermark.") or k.startswith("epoch.")
        )
        if markers or snap.files:
            raise ValueError(
                f"landing table at {table_path} already holds "
                f"{len(snap.files)} data file(s) and progress {markers}; "
                "bootstrap overwrites the WHOLE table, so it requires a "
                "fresh path (other markers' ingested rows would be "
                "destroyed while their watermarks block re-landing)"
            )
        rows = lww_dedup(snapshot_df)
        now_ms = int(time.time() * 1000)
        props: dict[str, str] = {pipe._wm_prop: str(frontier_seq)}
        agg: dict[str, tuple[int, int]] = {}
        for s, p, seq in checkpoint_rows or []:
            props[f"ckpt_part.{p}.{s}"] = json.dumps(
                {"seq": int(seq), "rows": 0, "epoch": -1, "updated_at": now_ms}
            )
            hi0, tot = agg.get(s, (-(2**62), 0))
            agg[s] = (max(hi0, int(seq)), tot)
        for s, (hi0, _) in agg.items():
            props[f"checkpoint.{s}"] = json.dumps(
                {"seq": hi0, "rows": 0, "updated_at": now_ms}
            )
        pipe.table.overwrite(rows, properties_update=props)
        return pipe

    def model_runs(self) -> DataFrame:
        """The reconciled model run-stats table (dbt_results parity —
        reference sql-exporter-config.yaml:75-90): one record per
        (model, epoch) with status, rows written, execution ms, and the
        covered seq bound. Latest record per key wins; a resumed epoch's
        'skipped' replay record (completed=0) never shadows a completed
        run's record (the LWW order is ``completed`` DESC)."""
        if self.model_runs_table is None:
            raise ValueError("pipeline was constructed without model_runs_path")
        return self.model_runs_table.read_current()

    def model_latency(self) -> DataFrame:
        """dbt-latency parity (reference sql-exporter-config.yaml:63-75:
        MAX(saved_timestamp) in the dbt root model vs the landing table):
        per model, how far behind the landing ingest frontier the model's
        last COMPLETED epoch is — derived entirely from engine bookkeeping
        (the run-stats records + the landing checkpoints), no data-plane
        scan. ``seq_lag`` is in feed-sequence units, the engine's native
        freshness domain (the reference's is seconds because Postgres
        timestamps are its only watermark)."""
        runs = self.model_runs()
        completed = runs.where(F.col("completed") == 1).groupBy("model").agg(
            F.max("epoch").alias("last_epoch"),
            F.max("hi_seq").alias("model_hi_seq"),
        )
        # every model the metric should cover: the pipeline's declared set
        # plus anything ever recorded — a model whose ONLY records are
        # crash-window skips (or that never ran at all) must surface as a
        # row with null bounds (= infinitely behind), not silently vanish
        # from the freshness metric it exists to feed
        names = runs.select("model")
        if self.models:
            names = names.union(
                self.spark.createDataFrame(
                    [(m.spec.name,) for m in self.models], "model string"
                )
            )
        tip = self.checkpoints().agg(F.max("seq").alias("tip_hi_seq"))
        return names.distinct().join(completed, "model", "left").crossJoin(tip).select(
            "model",
            "last_epoch",
            "model_hi_seq",
            "tip_hi_seq",
            (F.col("tip_hi_seq") - F.col("model_hi_seq")).alias("seq_lag"),
        )

    # ------------------------------------------------------------------- run
    def _transform(self, events: DataFrame) -> DataFrame:
        rows = doc_to_row(events) if self.transform == "catalyst" else doc_to_row_arrow(events)
        if self.saved_ts == "event":
            # deterministic ingest-time stand-in -> byte-identical replays
            rows = rows.withColumn("saved_timestamp", F.coalesce(F.col("ts"), F.timestamp_millis(F.col("seq") % 10**12)))
        return rows

    def _run_models(self, batch_rows: DataFrame, epoch: int, hi: int | None = None) -> None:
        """T14 model-level parallelism + dependency ordering: models run in
        topological LEVELS (a dependent transform needs its upstreams at
        this epoch first); within a level each model's incremental update is
        an independent Spark job chain submitted from its own thread, so
        stages interleave on the cluster. Exactly-once holds per model (own
        epoch marker, idempotent merge): a crash mid-DAG replays only the
        models that hadn't committed — upstreams already at this epoch skip,
        and their tables feed the retried downstream reads unchanged.

        With ``model_runs_path`` configured, each model's run record (the
        dbt_results analogue: status, rows written, execution ms, covered
        seq bound) is micro-appended AFTER the whole DAG epoch — stats are
        observability, never lineage-of-record: a crash between a model's
        epoch commit and this append records the resumed run as 'skipped'
        (completed=0) for that epoch, and the LWW order guarantees a
        completed record is never overwritten by a replayed skip."""
        if not self.models:
            return
        from cht_sync_spark.operators.models import run_model_levels

        stats = run_model_levels(
            self._model_levels, self.table, batch_rows, epoch,
            parallelism=self.model_parallelism,
        )
        if self.model_runs_table is not None and stats:
            from cht_sync_spark.operators.models import model_run_records

            self.model_runs_table.append_rows_local(
                model_run_records(stats, hi, int(time.time() * 1000))
            )

    def _dlq_epoch(self) -> int:
        return int(self.dlq.snapshot().properties.get(self._epoch_prop, -1))

    def _write_dlq(self, epoch: int, lo: int, hi: int, bad_n: int | None = None) -> None:
        """Quarantine the batch's malformed events, exactly once.

        Runs AFTER the landing commit (the bad-row count rides the write
        job's Observation — zero extra job when the batch is clean); a
        crash in between is healed on resume: the landing_done replay
        branch re-derives the bad slice from the feed's recorded seq range
        and the (source, seq)-keyed merge is an idempotent re-apply.
        ``bad_n=None`` means the count is unknown (replay path) — recompute
        unconditionally."""
        if self.dlq is None or self._dlq_epoch() >= epoch:
            return
        from cht_sync_spark.functions.dlq import REASON_COL, malformed_reason

        props = {self._epoch_prop: str(epoch)}
        if bad_n == 0:
            # marker-only commit: O(1) driver-side, no Spark job
            self.dlq.commit(add_files=[], properties_update=props)
            return
        bad = self.feed.batch(lo, hi).withColumn(REASON_COL, malformed_reason())
        rows = bad.where(F.col(REASON_COL).isNotNull()).select(
            F.col("seq"),
            F.col("source"),
            F.col("_feed_partition").cast("int").alias("partition_id"),
            "op",
            "id",
            "rev",
            "doc",
            F.col(REASON_COL).alias("reason"),
            F.lit(epoch).cast("long").alias("epoch_id"),
        )
        merge_upsert(
            self.dlq, rows, tombstones="keep", dedup_batch=False, properties_update=props
        )

    def run_batch(self, epoch: int, lo: int, hi: int) -> BatchResult:
        t0 = time.monotonic()
        wm, last_epoch = self.state()
        # two skip guards: the epoch marker (replay of the SAME cut plan —
        # run() enforces plan stability per marker, because epoch numbers
        # from a different plan would alias unrelated seq ranges for both
        # the landing skip and the per-model epoch markers) and the seq
        # watermark, which covers ranges a snapshot BOOTSTRAP
        # (:meth:`bootstrap`, no epoch progress) already landed. A cut
        # straddling the watermark re-delivers its below-watermark half;
        # the idempotent LWW fold makes that a state no-op on both paths.
        landing_done = epoch <= last_epoch or hi <= wm
        models_done = all(m.last_epoch() >= epoch for m in self.models)
        dlq_done = self.dlq is None or self._dlq_epoch() >= epoch
        if landing_done and models_done and dlq_done:
            return BatchResult(epoch, lo, hi, 0, 0, skipped=True)

        events = self.feed.batch(lo, hi)
        if self.dlq is not None:
            from cht_sync_spark.functions.dlq import REASON_COL, malformed_reason

            events = events.withColumn(REASON_COL, malformed_reason())

        if landing_done:
            # crash happened between the landing commit and a component
            # commit last run: replay only the lagging side of this batch
            if not models_done:
                clean = (
                    events.where(F.col("_dlq_reason").isNull()).drop("_dlq_reason")
                    if self.dlq is not None
                    else events
                )
                rows = lww_dedup(self._transform(clean))
                if self.models:
                    from pyspark.storagelevel import StorageLevel

                    rows = rows.persist(StorageLevel.MEMORY_AND_DISK)
                try:
                    self._run_models(rows, epoch, hi)
                finally:
                    if self.models:
                        rows.unpersist()
            self._write_dlq(epoch, lo, hi)
            return BatchResult(epoch, lo, hi, 0, int((time.monotonic() - t0) * 1000))

        # Per-(source, partition) checkpoint stats (the couchdb_progress
        # analogue) ride the write job as Observation metrics on the
        # PRE-dedup event stream — conditional aggregates collected DURING
        # the write, zero extra pass, committed atomically with the data.
        from pyspark.sql import Observation

        sources = self.feed.sources()
        n_parts = self.feed.num_partitions()
        obs = Observation(f"batch{epoch}")
        metrics = []
        for i, s in enumerate(sources):
            for p in range(n_parts):
                hit = F.when(
                    (F.col("source") == s) & (F.col("_feed_partition") == p), F.col("seq")
                )
                metrics += [F.max(hit).alias(f"hi{i}_{p}"), F.count(hit).alias(f"n{i}_{p}")]
        if self.dlq is not None:
            # bad-row count piggybacks the write job: the clean path pays
            # ZERO extra jobs for poison detection
            metrics.append(
                F.count(F.when(F.col("_dlq_reason").isNotNull(), 1)).alias("dlq_n")
            )
        events = events.observe(obs, *metrics)

        if self.dlq is not None:
            rows_in = events.where(F.col("_dlq_reason").isNull()).drop("_dlq_reason")
        else:
            rows_in = events
        rows = self._transform(rows_in)
        rows = lww_dedup(rows)
        if self.models:
            # the model plane consumes the batch subtree MANY times (keys
            # agg, scope semi-join build, seq re-stamp join, gone anti-join
            # — per model); without materialization each action re-runs
            # scan→transform→LWW (measured ~5x the whole model-plane cost).
            # The landing write below populates the cache in the same pass.
            from pyspark.storagelevel import StorageLevel

            rows = rows.persist(StorageLevel.MEMORY_AND_DISK)

        src_stats: list[dict] = []

        def _ckpt_props() -> dict[str, str]:
            # runs post-write / pre-commit: metrics from the write job land
            # in the SAME atomic snapshot as the data they describe.
            # Cleared on entry: merge_upsert re-invokes this on every
            # CommitConflict retry, and without the reset a lost commit race
            # would double-append src_stats (double-counted BatchResult.rows
            # + duplicate lineage records).
            src_stats.clear()
            # liveness timestamp (reference couchdb_progress.updated_at,
            # setup.js:13-19 / sql-exporter liveness CASE): commit wall time,
            # intentionally OUTSIDE the replay-deterministic surface — it
            # feeds the freshness metric, never the data plane
            now_ms = int(time.time() * 1000)
            pending: dict[tuple[str, int], int] = {}
            if self.probe_pending:
                pending = {
                    (r["source"], r["_feed_partition"]): r["n"]
                    for r in self.feed.df()
                    .where(F.col("seq") > hi)
                    .groupBy("source", "_feed_partition")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
            got = obs.get
            out = {}
            for i, s in enumerate(sources):
                tot, s_hi = 0, None
                for p in range(n_parts):
                    n = got[f"n{i}_{p}"]
                    if not n:
                        continue
                    hi_sp = int(got[f"hi{i}_{p}"])
                    src_stats.append({"source": s, "partition": p, "hi": hi_sp, "n": int(n)})
                    ck = {"seq": hi_sp, "rows": int(n), "epoch": epoch, "updated_at": now_ms}
                    if self.probe_pending:
                        ck["pending"] = int(pending.get((s, p), 0))
                    out[f"ckpt_part.{p}.{s}"] = json.dumps(ck)
                    tot += int(n)
                    s_hi = hi_sp if s_hi is None else max(s_hi, hi_sp)
                if tot:
                    out[f"checkpoint.{s}"] = json.dumps(
                        {"seq": s_hi, "rows": tot, "updated_at": now_ms}
                    )
            return out

        props = {
            self._wm_prop: str(hi),
            self._epoch_prop: str(epoch),
            # the cut plan this epoch numbering belongs to (run()'s
            # plan-stability fence reads it on resume)
            f"batchplan.{self.marker}": str(self.batch_size),
        }
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
        if self.dlq is not None:
            self._write_dlq(epoch, lo, hi, bad_n=int(obs.get["dlq_n"]))

        try:
            self._run_models(rows, epoch, hi)
        finally:
            if self.models:
                rows.unpersist()

        dur = int((time.monotonic() - t0) * 1000)
        if self.lineage is not None:
            recs = [
                (
                    epoch, r["source"], r["partition"], lo, int(r["hi"]), int(r["n"]),
                    dels, skew, dur,
                )
                for r in src_stats
            ]
            if recs:
                # driver-side pyarrow micro-append: a Spark write job for
                # 2-4 bookkeeping rows costs a full plan+schedule round trip
                # per batch — measurable fixed overhead at 20k batches
                self.lineage.append_rows_local(recs)
        return BatchResult(epoch, lo, hi, n, dur)

    def _maintenance_sets(self):
        """(all tables, MOR/micro-append compact subset) shared by the full
        maintenance cycle and the minor-compaction cadence."""
        tables = [self.table] + [m.table for m in self.models]
        compact = [self.table] if self.mode == "mor" else []
        if self.model_mode == "mor":
            # MOR model tables accrete one delta per epoch: fold them on the
            # same cadence (compaction also physically drops their shadowed
            # tombstones — tombstones.retain=false)
            compact += [m.table for m in self.models]
        if self.lineage is not None:
            tables.append(self.lineage)
            compact.append(self.lineage)
        if self.model_runs_table is not None:
            # same shape as lineage: one micro-append per batch — fold and
            # expire on the same cadence
            tables.append(self.model_runs_table)
            compact.append(self.model_runs_table)
        if self.dlq is not None:
            # one snapshot per batch (mostly marker-only) — expire with the rest
            tables.append(self.dlq)
        # attached consumers' targets commit once per catch-up cycle (one
        # per applied batch in this loop): expire them on the same cadence,
        # and fold any MOR-style deltas (compact() is an incremental no-op
        # on pure-COW targets). The drain loop runs consumers BEFORE
        # maintenance, so at expire time every attached cursor sits at the
        # landing tip as of its catch-up; the only commits a cursor can lag
        # are this cycle's own compaction snapshots (replace-class, which
        # changes() skips), so keep_last >= 2 always retains the diff
        # parent. Detached consumers (tailing from another process) keep
        # the documented keep_last-1 lag contract.
        ctabs = [c.target for c in self.consumers if getattr(c, "target", None) is not None]
        tables += ctabs
        compact += ctabs
        return tables, compact

    def maintain(self) -> None:
        """One maintenance cycle on the landing, model AND lineage tables:
        fold MOR deltas into a fresh base (bounds per-read reconciliation
        work), expire old manifests (bounds driver metadata — each model
        commits one snapshot per epoch, and lineage one per batch:
        unbounded over a 10^10-event replay), vacuum aged orphans (bounds
        disk). The lineage table's per-batch micro-appends are pure delta
        files, so it is folded too — without that, lineage reads reconcile
        O(batches) tiny files."""
        from cht_sync_spark.tables.format import maintain_tables

        tables, compact = self._maintenance_sets()
        maintain_tables(tables, self.maintenance_keep_snapshots, compact=compact)

    def minor_compact(self) -> None:
        """One MINOR maintenance cycle: bin-pack each MOR table's delta
        files per bucket (``SnapshotTable.compact_deltas``) without
        refolding any base — O(delta bytes) vs :meth:`maintain`'s
        O(touched buckets). The sustained cadence for the 10^10 target is
        minor-pack every ``minor_compact_every`` batches, full
        fold+expire+vacuum every ``maintenance_every`` >> that."""
        _, compact = self._maintenance_sets()
        for t in compact:
            t.compact_deltas()

    def run(self, max_batches: int | None = None) -> list[BatchResult]:
        """Drain the feed (the reference's drain-until-empty loop,
        watcher.js:8-14, as ``trigger(availableNow=True)`` semantics).
        With ``maintenance_every=k`` a maintenance cycle runs after every k
        applied batches — the sustained-ingest shape for the 10^10 target
        (append O(batch) deltas, fold on a cadence)."""
        # Plan-stability fence: epoch markers (landing skip + per-model
        # epochs) are positions in the cut plan, so a resume under a
        # DIFFERENT batch_size would re-number ranges and silently skip
        # unlanded data (epoch <= last_epoch aliases a new, wider range).
        # The first applied batch records the plan's batch_size; a
        # mismatched resume is refused instead of corrupted. Bootstrapped
        # pipelines (watermark only, no epochs) are free to choose any
        # size — the seq watermark, not epoch numbering, carries them.
        props = self.table.snapshot().properties
        rec = props.get(f"batchplan.{self.marker}")
        if rec is not None and int(rec) != self.batch_size and self.state()[1] >= 0:
            raise ValueError(
                f"marker {self.marker!r} has epoch progress under "
                f"batch_size={rec}; resuming with batch_size="
                f"{self.batch_size} would re-number the cut plan and skip "
                "unlanded ranges — resume with the recorded size (or "
                "bootstrap a fresh table at the current watermark)"
            )
        cuts = self.feed.plan_batches(self.batch_size)
        results: list[BatchResult] = []
        lo = -(2**62)
        applied_since_maintain = 0
        applied_since_minor = 0
        for epoch, hi in enumerate(cuts):
            if max_batches is not None and len([r for r in results if not r.skipped]) >= max_batches:
                break
            # run_batch itself decides skip per component (landing watermark
            # vs per-model epoch markers), so lagging models catch up even
            # when the landing table is already past this range
            r = self.run_batch(epoch, lo, hi)
            if not r.skipped:
                results.append(r)
                applied_since_maintain += 1
                # consumers catch up BEFORE maintenance: expire_snapshots
                # must never run while a cursor still needs the pre-batch
                # snapshot as its changelog diff parent (the cadence
                # comment in maintain() depends on this order)
                for c in self.consumers:
                    c.run()
                applied_since_minor += 1
                if self.maintenance_every and applied_since_maintain >= self.maintenance_every:
                    self.maintain()
                    applied_since_maintain = 0
                    applied_since_minor = 0  # the full fold subsumes a pack
                elif (
                    self.minor_compact_every
                    and applied_since_minor >= self.minor_compact_every
                ):
                    self.minor_compact()
                    applied_since_minor = 0
            lo = hi
        # a resume with nothing new to ingest still gives lagging consumers
        # their catch-up cycle (crash window between landing commit and
        # consumer run; mirrors the lagging-model catch-up rule above)
        if not results:
            for c in self.consumers:
                c.run()
        return results
