"""Structured Streaming form of the replay pipeline.

The batch loop in :mod:`cht_sync_spark.streaming.pipeline` is the
deterministic form used for correctness replays; this module runs the SAME
per-batch body under Spark Structured Streaming — the idiomatic shape the
engine deploys with on a real cluster:

    spark.readStream (file source over the seq-ordered feed directory)
      -> foreachBatch(apply)     # MERGE is not a raw streaming sink
      -> trigger(availableNow=True)   # drain-and-stop (watcher.js:8-14)
         or trigger(processingTime=...)  # tailing mode (DELAY=5s poll,
                                         # couch2pg/src/watcher.js:4)

Exactly-once composition (SURVEY.md §2.5 I2):

- Spark's streaming checkpoint (WAL of file offsets) guarantees each batch
  id is replayed with the same input files after a crash — at-least-once
  with stable batch ids;
- the engine's epoch marker (``epoch.stream`` in the target's snapshot
  properties, committed atomically WITH the data) + the idempotent LWW
  MERGE turn that into exactly-once: a replayed batch is either skipped
  (marker already past it) or merges to a byte-identical state.

This mirrors the reference's design: checkpoint written after the upsert
commits (importer.js:171-172), upsert idempotent by key (importer.js:19-25),
so the crash window replays one batch harmlessly.
"""

from __future__ import annotations

import json
from typing import Literal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cht_sync_spark.functions.json_doc import doc_to_row
from cht_sync_spark.operators.lww import lww_dedup
from cht_sync_spark.schemas import CHANGE_EVENT, TRANSCRIPT, TRANSCRIPT_KEY
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

EPOCH_PROP = "epoch.stream"  # default marker namespace (see `marker` param)


class StreamingReplay:
    """Replay/tail a changes-feed directory with Structured Streaming."""

    def __init__(
        self,
        spark: SparkSession,
        feed_path: str,
        table_path: str,
        checkpoint_dir: str,
        *,
        max_files_per_trigger: int = 4,
        num_buckets: int = 16,
        mode: Literal["cow", "mor"] = "cow",
        sources: list[str] | None = None,  # declared feed sources (db.js:45)
        fail_after_batches: int | None = None,  # test hook: crash injection
        marker: str = "stream",
        models: list[tuple] | None = None,  # [(ModelSpec, path), ...]
        model_mode: Literal["cow", "mor"] = "cow",
        model_parallelism: int | None = None,
        bucket_cols: list[str] | None = None,
        maintenance_every: int | None = None,
        minor_compact_every: int | None = None,
        maintenance_keep_snapshots: int = 20,
        dlq_path: str | None = None,
        source_format: Literal["parquet", "cht_changes"] = "parquet",
        events_per_trigger: int = 0,
        model_runs_path: str | None = None,
        consumers: list | None = None,
    ):
        self.spark = spark
        self.feed_path = feed_path
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        # "parquet": the built-in file stream (batch boundaries = files,
        # maxFilesPerTrigger). "cht_changes": the custom Python data source
        # (sources/datasource.py) — offsets ARE per-feed-partition seq
        # cursors and batch boundaries are event-count caps
        # (events_per_trigger, 0 = unthrottled), independent of file layout.
        self.source_format = source_format
        self.events_per_trigger = events_per_trigger
        self.mode = mode
        self.sources = sources
        self.fail_after_batches = fail_after_batches
        self._applied = 0
        # in-loop maintenance cadence, same shape as ReplayPipeline: fold
        # MOR deltas + expire snapshots + vacuum every N applied batches.
        # Logical state is untouched (compaction is state-preserving and
        # the grace-windowed vacuum tolerates concurrent S8 writers), so
        # exactly-once replay semantics are unaffected.
        self.maintenance_every = maintenance_every
        # minor cadence parity with ReplayPipeline(minor_compact_every=):
        # bin-pack MOR delta files between full maintenance cycles — the
        # sustained-ingest form is exactly where per-trigger delta files
        # otherwise accumulate O(batches)
        self.minor_compact_every = minor_compact_every
        self.maintenance_keep_snapshots = maintenance_keep_snapshots
        self.consumers = list(consumers or [])
        self._since_maintain = 0
        self._since_minor = 0
        # S8: several streaming queries (one per source/watcher, own Spark
        # checkpoint dir) may share one landing table; each keeps its own
        # epoch-marker namespace, like ReplayPipeline's `marker`.
        self._epoch_prop = f"epoch.{marker}"
        self.table = SnapshotTable.create(
            spark, table_path, TRANSCRIPT, TRANSCRIPT_KEY, num_buckets=num_buckets,
            bucket_cols=bucket_cols or ["conv_id"],
        )
        # dead-letter quarantine, same semantics as ReplayPipeline(dlq_path=)
        from cht_sync_spark.functions.dlq import DLQ_KEY, DLQ_SCHEMA

        self.dlq = (
            SnapshotTable.create(
                spark, dlq_path, DLQ_SCHEMA, DLQ_KEY,
                num_buckets=4, lww_order=[("seq", False)],
            )
            if dlq_path
            else None
        )
        # model run-stats (dbt_results parity) — same table shape and
        # crash-window semantics as ReplayPipeline(model_runs_path=); the
        # covered bound is the batch's OBSERVED max seq (streaming batches
        # have no planned seq range)
        from cht_sync_spark.operators.models import create_model_runs_table

        self.model_runs_table = (
            create_model_runs_table(spark, model_runs_path) if model_runs_path else None
        )
        # downstream model DAG maintained inside the SAME foreachBatch body
        # as the batch pipeline (T14/T16 parity between the two forms)
        from cht_sync_spark.operators.models import ModelRunner, topo_levels

        self.models = [
            ModelRunner(spark, spec, path, mode=model_mode)
            for spec, path in (models or [])
        ]
        self.model_mode = model_mode
        self.runners_by_name = {m.spec.name: m for m in self.models}
        self._model_levels = topo_levels(self.models)
        self.model_parallelism = model_parallelism

    # ------------------------------------------------------------- batch body
    def _write_dlq(self, batch: DataFrame, epoch_id: int, bad_n: int | None = None) -> None:
        """Quarantine this batch's malformed events exactly once (same
        semantics as ``ReplayPipeline._write_dlq``; the streaming source
        has no feed-partition column, so partition_id is null). A crash
        between the landing commit and this write is healed because Spark
        re-delivers the SAME batch id with the same files and the
        (source, seq)-keyed merge is idempotent."""
        if self.dlq is None:
            return
        if int(self.dlq.snapshot().properties.get(self._epoch_prop, -1)) >= epoch_id:
            return
        from cht_sync_spark.functions.dlq import REASON_COL

        props = {self._epoch_prop: str(int(epoch_id))}
        if bad_n == 0:
            self.dlq.commit(add_files=[], properties_update=props)
            return
        rows = batch.where(F.col(REASON_COL).isNotNull()).select(
            "seq",
            "source",
            F.lit(None).cast("int").alias("partition_id"),
            "op",
            "id",
            "rev",
            "doc",
            F.col(REASON_COL).alias("reason"),
            F.lit(int(epoch_id)).cast("long").alias("epoch_id"),
        )
        merge_upsert(
            self.dlq, rows, tombstones="keep", dedup_batch=False, properties_update=props
        )

    def _apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        if self.fail_after_batches is not None and self._applied >= self.fail_after_batches:
            raise RuntimeError("injected crash (test hook)")

        last = int(self.table.snapshot().properties.get(self._epoch_prop, -1))
        landing_done = epoch_id <= last
        models_done = all(m.last_epoch() >= epoch_id for m in self.models)
        dlq_done = self.dlq is None or int(
            self.dlq.snapshot().properties.get(self._epoch_prop, -1)
        ) >= epoch_id
        if landing_done and models_done and dlq_done:
            return  # replayed batch already fully committed -> exactly-once skip

        if self.sources is not None:
            # a declared source list FILTERS the feed (matching
            # ChangesFeedSource and the reference's static DB list,
            # couch2pg/src/db.js:45) — undeclared rows are not ingested,
            # so data and checkpoints always cover the same set
            batch = batch.where(F.col("source").isin(self.sources))

        # Per-source checkpoint stats, observed on the PRE-dedup event
        # stream (raw ingested counts — a true resume cursor even when a
        # high-seq event loses LWW). When the source list is declared they
        # ride the write job as Observation metrics — zero extra pass,
        # committed atomically via the properties callback. Undeclared
        # sources fall back to one aggregation pass over the same pre-dedup
        # batch, so both branches have identical checkpoint semantics.
        from pyspark.sql import Observation

        if self.dlq is not None:
            from cht_sync_spark.functions.dlq import REASON_COL, malformed_reason

            batch = batch.withColumn(REASON_COL, malformed_reason())

        bad_n: int | None = None
        if self.sources is not None:
            obs = Observation(f"stream{epoch_id}")
            metrics = []
            for i, s in enumerate(self.sources):
                hit = F.when(F.col("source") == s, F.col("seq"))
                metrics += [F.max(hit).alias(f"hi{i}"), F.count(hit).alias(f"n{i}")]
            if self.dlq is not None:
                # poison count rides the write job — zero extra pass
                metrics.append(
                    F.count(F.when(F.col(REASON_COL).isNotNull(), 1)).alias("dlq_n")
                )
            batch = batch.observe(obs, *metrics)

            def _ckpt_props() -> dict[str, str]:
                import time as _time

                got = obs.get
                now_ms = int(_time.time() * 1000)
                return {
                    f"checkpoint.{s}": json.dumps(
                        {"seq": int(got[f"hi{i}"]), "rows": int(got[f"n{i}"]),
                         "updated_at": now_ms}
                    )
                    for i, s in enumerate(self.sources)
                    if got[f"n{i}"]
                }
        else:
            aggs = [F.max("seq").alias("hi"), F.count("*").alias("n")]
            if self.dlq is not None:
                aggs.append(
                    F.count(F.when(F.col(REASON_COL).isNotNull(), 1)).alias("dlq")
                )
            src_stats = batch.groupBy("source").agg(*aggs).collect()
            if self.dlq is not None:
                bad_n = int(sum(r["dlq"] for r in src_stats))

            def _ckpt_props() -> dict[str, str]:
                import time as _time

                now_ms = int(_time.time() * 1000)
                return {
                    f"checkpoint.{r['source']}": json.dumps(
                        {"seq": int(r["hi"]), "rows": int(r["n"]), "updated_at": now_ms}
                    )
                    for r in src_stats
                }

        clean = (
            batch.where(F.col(REASON_COL).isNull()).drop(REASON_COL)
            if self.dlq is not None
            else batch
        )
        rows = doc_to_row(clean)
        # deterministic ingest timestamp -> byte-identical resumed replays
        rows = rows.withColumn(
            "saved_timestamp",
            F.coalesce(F.col("ts"), F.timestamp_millis(F.col("seq") % 10**12)),
        )
        rows = lww_dedup(rows)
        if self.models:
            # model plane consumes the batch subtree many times — cache it
            # for the epoch (the landing write populates it in one pass)
            from pyspark.storagelevel import StorageLevel

            rows = rows.persist(StorageLevel.MEMORY_AND_DISK)

        if not landing_done:
            props = {self._epoch_prop: str(epoch_id)}
            if self.mode == "mor":
                schema = self.table.evolve_schema(rows.schema)
                self.table.append_delta(
                    rows, properties_update=props, new_schema=schema, properties_fn=_ckpt_props
                )
            else:
                merge_upsert(
                    self.table, rows, tombstones="keep", dedup_batch=False,
                    properties_update=props, properties_fn=_ckpt_props,
                )
            if self.dlq is not None and bad_n is None:
                # the landing write materialized the Observation
                bad_n = int(obs.get["dlq_n"])
        self._write_dlq(batch, epoch_id, bad_n)
        if self.models:
            # crash window between the landing commit and a model commit
            # replays only the lagging models (per-model epoch markers)
            from cht_sync_spark.operators.models import run_model_levels

            try:
                mstats = run_model_levels(
                    self._model_levels, self.table, rows, int(epoch_id),
                    parallelism=self.model_parallelism,
                )
            finally:
                rows.unpersist()
            if self.model_runs_table is not None and mstats:
                import time as _time

                # covered bound = the batch's observed max seq. Only known
                # when the landing write materialized the checkpoint
                # metrics this batch — a replayed (landing-done) batch
                # records None rather than touching the unmaterialized
                # Observation (whose .get would block forever)
                hi = None
                if not landing_done:
                    if self.sources is not None:
                        got = obs.get
                        his = [
                            int(got[f"hi{i}"])
                            for i in range(len(self.sources))
                            if got[f"n{i}"]
                        ]
                    else:
                        his = [int(r["hi"]) for r in src_stats if r["n"]]
                    hi = max(his) if his else None
                from cht_sync_spark.operators.models import model_run_records

                self.model_runs_table.append_rows_local(
                    model_run_records(mstats, hi, int(_time.time() * 1000))
                )
        self._applied += 1
        self._since_maintain += 1
        self._since_minor += 1
        # in-loop changelog consumers, same contract as ReplayPipeline:
        # convenience wiring — each consumer owns its atomically-committed
        # cursor, so a crash here just leaves it one range behind. They run
        # BEFORE maintenance so expire_snapshots never removes a cursor's
        # changelog diff parent.
        for c in self.consumers:
            c.run()
        if self.maintenance_every and self._since_maintain >= self.maintenance_every:
            self.maintain()
            self._since_maintain = 0
            self._since_minor = 0  # the full fold subsumes a pack
        elif self.minor_compact_every and self._since_minor >= self.minor_compact_every:
            self.minor_compact()
            self._since_minor = 0

    def maintain(self) -> None:
        """One maintenance cycle on the landing AND model tables (the
        shared :func:`maintain_tables` body — parity with
        ``ReplayPipeline.maintain``; the streaming form keeps no lineage
        table, Structured Streaming's own progress log covers it)."""
        from cht_sync_spark.tables.format import maintain_tables

        runs = [self.model_runs_table] if self.model_runs_table is not None else []
        # consumer targets: same cadence as the micro-batch loop's (see
        # ReplayPipeline.maintain) — _apply_batch runs consumers before
        # maintenance, so cursors sit at the landing tip when this fires
        # (only this cycle's replace-class compaction commits come later,
        # and changes() skips those)
        ctabs = [c.target for c in self.consumers if getattr(c, "target", None) is not None]
        maintain_tables(
            [self.table] + [m.table for m in self.models]
            + ([self.dlq] if self.dlq is not None else []) + runs + ctabs,
            self.maintenance_keep_snapshots,
            compact=self._compact_set(),
        )

    def _compact_set(self):
        runs = [self.model_runs_table] if self.model_runs_table is not None else []
        ctabs = [c.target for c in self.consumers if getattr(c, "target", None) is not None]
        return (
            ([self.table] if self.mode == "mor" else [])
            + ([m.table for m in self.models] if self.model_mode == "mor" else [])
            + runs  # one micro-append per batch: fold on the same cadence
            + ctabs
        )

    def minor_compact(self) -> None:
        """One MINOR maintenance cycle (parity with
        ``ReplayPipeline.minor_compact``): bin-pack each MOR table's delta
        files per bucket without refolding any base — O(delta bytes) vs
        :meth:`maintain`'s O(touched buckets). The sustained cadence for
        the 10^10 target is minor-pack every ``minor_compact_every``
        triggers, full fold+expire+vacuum every ``maintenance_every`` >>
        that."""
        for t in self._compact_set():
            t.compact_deltas()

    def model_runs(self) -> DataFrame:
        """dbt_results parity for the streaming form — same reconciled
        run-stats table as ``ReplayPipeline.model_runs`` (latest record per
        (model, epoch); completed records win the fold over replayed
        skips)."""
        if self.model_runs_table is None:
            raise ValueError("stream was constructed without model_runs_path")
        return self.model_runs_table.read_current()

    # ------------------------------------------------------------------ runs
    def _stream(self) -> DataFrame:
        if self.source_format == "cht_changes":
            from cht_sync_spark.sources.datasource import register

            register(self.spark)
            reader = self.spark.readStream.format("cht_changes").option(
                "path", self.feed_path
            )
            if self.events_per_trigger:
                reader = reader.option("eventsPerBatch", self.events_per_trigger)
            # source filtering happens in _apply_batch for both forms; the
            # slice id column is the file stream's schema parity drop
            return reader.load().drop("_feed_partition")
        return (
            self.spark.readStream.schema(CHANGE_EVENT)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.feed_path)
        )

    def run_available_now(self, timeout_sec: int = 3600) -> None:
        """Drain everything currently in the feed, then stop
        (trigger(availableNow) — the reference's drain-until-empty loop)."""
        if self.source_format == "cht_changes" and self.events_per_trigger:
            # capped multi-batch drain: trigger(availableNow) on a capped
            # Python source stops after ONE cap's worth (no
            # SupportsTriggerAvailableNow hook) — loop until caught up
            from cht_sync_spark.sources.datasource import drain

            drain(
                self.spark,
                self.feed_path,
                self.checkpoint_dir,
                lambda df, eid: self._apply_batch(df.drop("_feed_partition"), eid),
                events_per_batch=self.events_per_trigger,
                timeout_sec=timeout_sec,
            )
            return
        q = (
            self._stream()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(timeout_sec)
        finally:
            if q.isActive:
                q.stop()
        if q.exception() is not None:
            raise q.exception()
        if not finished:
            # the drain did NOT complete in time — a partial ingest must be
            # an error, not indistinguishable from success (the streaming
            # checkpoint makes the retry safe)
            raise TimeoutError(
                f"availableNow drain incomplete after {timeout_sec}s at {self.feed_path}"
            )

    def run_tailing(self, processing_time: str = "5 seconds"):
        """Continuous tailing (the 5s poll loop, watcher.js:4); returns the
        StreamingQuery for the caller to manage."""
        return (
            self._stream()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=processing_time)
            .start()
        )
