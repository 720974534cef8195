"""Downstream typed models — the dbt transform plane, Spark-first.

The reference maintains typed tables out of the raw landing table with dbt
incremental models: type-dispatch filter + JSON projection + watermark +
``unique_key`` merge + tombstone post-hook + model↔landing join
(tests/dbt/package/models/contacts/{contacts,reports,persons}.sql —
SURVEY.md §2.3 T1-T9, T12). Our models are Python transforms over
DataFrames, maintained incrementally per micro-batch:

- each model declares a transform ``f(landing_slice) -> rows`` and a key;
- per epoch, the pipeline hands every model the batch's landing rows
  (the micro-batch replaces the T5 watermark: the batch boundary IS the
  watermark — which also removes the reference's couch2pg→dbt latency gap,
  SURVEY.md §3.3);
- aggregate models recompute only the GROUPS the batch touched, reading
  just those keys back from the landing table (group-scoped incremental
  aggregation — the Spark answer to dbt's row-level incremental);
- tombstones cascade: a turn whose LWW winner is a delete produces a
  ``_deleted`` model row, and the model merge drops it (T7/T9 — the FK
  ``ON DELETE CASCADE`` of persons, contacts.yml:49-51);
- each model stores a hash of its transform source in table properties;
  a changed hash triggers a full rebuild from the landing table (T12 —
  dbt's ``state:modified --full-refresh`` manifest diff, dbt-run.py:78-149);
- models may depend on OTHER MODELS (``depends_on``): the transform then
  receives ``(landing_scope, deps)`` where ``deps[name]`` is the upstream
  model's reconciled current state scoped to the same touched groups. The
  pipeline runs models in topological order (parallel within a level) —
  the dbt dependency DAG that the reference's ``persons.sql`` uses
  (tests/dbt/package/models/contacts/persons.sql:13-22 selects FROM the
  contacts MODEL and joins it back to the landing table; dbt orders model
  runs by their ref() graph).
"""

from __future__ import annotations

import hashlib
import inspect
from dataclasses import dataclass, field
from typing import Callable, Literal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

HASH_PROP = "model.transform_hash"
EPOCH_PROP = "model.epoch"


@dataclass
class ModelRunStats:
    """One model-maintenance run record — the engine analogue of dbt's
    ``dbt_results`` rows that the reference's metrics exporter scrapes per
    model (``status``, ``execution_time``, ``name`` —
    deploy/cht_sync/templates/sql-exporter-config.yaml:75-90, written by
    dbt/dbt-run.py's run loop). Returned by :meth:`ModelRunner.run_increment`
    and recorded by the pipeline's model-runs table when configured.

    ``rows`` is the size of the recomputed slice this run APPLIED,
    including retraction tombstones — deliberately identical across model
    modes (MOR physically appends the tombstone rows as shadowing deltas;
    the COW merge counts them in the same slice before physically dropping
    them). 0 for 'skipped'; live rows only for 'full_refresh' (a rebuild
    has nothing to retract)."""

    model: str
    epoch: int
    status: str  # 'success' | 'full_refresh' | 'skipped'
    rows: int
    exec_ms: int


def create_model_runs_table(spark: SparkSession, path: str) -> SnapshotTable:
    """The run-stats bookkeeping table (MODEL_RUN schema), shared by the
    batch pipeline and the streaming form: keyed (model, epoch) with LWW on
    ``completed`` DESC, so a crash-resumed batch's 'skipped' replay record
    can never shadow a completed run's record."""
    from cht_sync_spark.schemas import MODEL_RUN

    return SnapshotTable.create(
        spark, path, MODEL_RUN, ["model", "epoch"], num_buckets=1,
        sort_cols=["model", "epoch"], lww_order=[("completed", False)],
    )


def model_run_records(
    stats: list["ModelRunStats"], hi_seq: int | None, now_ms: int
) -> list[tuple]:
    """MODEL_RUN-schema rows (in schema column order) for the per-batch
    micro-append — the one place the tuple layout is defined."""
    hi = int(hi_seq) if hi_seq is not None else None
    return [
        (
            s.model, int(s.epoch), s.status, int(s.rows), int(s.exec_ms),
            hi, 0 if s.status == "skipped" else 1, now_ms,
        )
        for s in stats
    ]


@dataclass
class ModelSpec:
    name: str
    key_cols: list[str]
    schema: T.StructType
    # transform: full-state rows for the given landing slice (live + deleted
    # rows of the affected scope); must emit a `_deleted` column so the merge
    # can cascade deletions. Models with ``depends_on`` get a second arg:
    # ``deps`` — {upstream model name -> its reconciled (live) state, scoped
    # to the same touched groups}.
    transform: Callable[..., DataFrame]
    # group_cols: if set, the model aggregates per group; incremental runs
    # recompute whole groups touched by the batch (reading them back from
    # landing); if None, the model is row-wise on the batch itself.
    group_cols: list[str] | None = None
    # depends_on: names of upstream MODELS this transform reads (dbt ref()).
    # Dependent models must be grouped (group_cols set): the touched-group
    # set is what scopes both the landing read and every upstream read, so
    # the incremental update stays O(touched groups) through the whole DAG.
    depends_on: list[str] = field(default_factory=list)
    # bucket_cols: hash layout of the model table (default: key_cols). A
    # multi-row grouped model (key_cols ⊋ group_cols, e.g. SFT examples
    # keyed (conv_id, turn_idx) grouped by conv_id) should bucket by the
    # GROUP key so the within-group reconciliation read prunes to the
    # touched groups' buckets instead of scanning the whole model table.
    bucket_cols: list[str] | None = None
    num_buckets: int = 16
    lww_order: list[tuple[str, bool]] = field(default_factory=lambda: [("seq", False)])
    # T10 contract enforcement (contacts.yml:7-15): `enforced` strictly
    # validates the transform's output schema against the declared one
    # (raises SchemaContractError on drift — no silent cast/null-fill);
    # `unique_test` + `not_null` run dbt-style data tests after every run
    # (raise ContractViolation): incremental epochs test the recomputed
    # slice (O(slice), no table re-read), full refresh tests the whole
    # written state.
    enforced: bool = False
    unique_test: bool = False
    not_null: list[str] = field(default_factory=list)
    # Periodic DEEP data test (ADVICE r4): every Nth epoch, re-run the
    # unique/not_null tests against the reconciled post-merge READ VIEW
    # (the full_refresh form, table re-read included), not just the
    # recomputed slice. The slice test's structural argument — keyed
    # merge + keyed fold ⇒ no cross-epoch duplicates — holds only while
    # merge/fold are themselves bug-free; this cadence keeps a detector
    # for fold-level regressions (e.g. a _fold_rank tie surfacing two
    # versions of a key) at 1/N of the old per-epoch table-scan cost.
    # 0 = off (slice tests only, plus full_refresh's full test).
    deep_test_every: int = 0
    # Row-level expectations on the TRANSFORM OUTPUT (functions/quality.py
    # — dbt's accepted_values/custom tests, DLT's expectations), as a
    # zero-arg factory returning the rules (Column objects are not
    # source-hashable; the factory's source is). Semantics per action:
    # 'drop' — a failing row RETRACTS from the model (marked _deleted, so
    # the merge tombstone-cascades it; uniform across row-wise and grouped
    # shapes, and a row that STARTS failing retracts the stored row
    # instead of leaving it stale); 'fail' — the batch raises before the
    # merge (enforced-test path, exactly-once: the epoch never commits);
    # 'warn' — counted in the same one-pass report, rows kept.
    expectations: Callable[[], list] | None = None

    def transform_hash(self) -> str:
        # the dependency list is part of the model's identity: rewiring the
        # DAG must trigger a full rebuild just like editing the transform.
        # Expectations too: drop-rules shape the stored table, so editing
        # them must trigger the same full rebuild a transform edit does
        ident = inspect.getsource(self.transform) + "|deps:" + ",".join(self.depends_on)
        if self.expectations is not None:
            ident += "|expect:" + inspect.getsource(self.expectations)
        return hashlib.sha256(ident.encode()).hexdigest()[:16]

    def __post_init__(self) -> None:
        if self.expectations is not None and not callable(self.expectations):
            raise ValueError(
                f"model {self.name!r}: expectations must be a zero-arg factory "
                "returning the rule list (Columns are not source-hashable; "
                "the factory's source is part of the model identity)"
            )
        if self.depends_on and not self.group_cols:
            raise ValueError(
                f"model {self.name!r}: depends_on requires group_cols — the "
                "touched-group set is what scopes the upstream model reads"
            )
        if self.group_cols and not set(self.group_cols) <= set(self.key_cols):
            raise ValueError(
                f"model {self.name!r}: group_cols must be a subset of key_cols "
                "— a recomputed group is authoritative for every key inside "
                "it, which requires the key to carry the group identity"
            )


class ModelRunner:
    def __init__(self, spark: SparkSession, spec: ModelSpec, path: str,
                 mode: Literal["cow", "mor"] = "cow"):
        """``mode`` mirrors the landing table's two write strategies:

        - ``'cow'`` (default): each increment MERGEs — reads the touched
          model buckets, rewrites them with winners, drops tombstones
          physically. Read-optimized; per-batch cost O(touched buckets ×
          bucket size).
        - ``'mor'``: each increment APPENDs the recomputed slice (live rows
          ∪ delete-by-absence tombstones) as delta files — O(slice), no
          target read, no rewrite; readers fold base ∪ deltas with the same
          LWW window used everywhere and compaction (the maintenance
          cadence) folds deltas into a fresh base. The sustained-ingest
          form of the model plane: at 10^10 events a COW model merge
          rewrites its table every micro-batch, a MOR append writes only
          the recomputed groups. Correctness matches COW because a group
          recompute is deterministic in the scope's max seq — two rows that
          tie on the fold's order columns are value-identical, so the
          fold's winner choice can never disagree with the COW merge.

        Model tables are created with ``tombstones.retain=false``: the
        reference's post-hook deletes tombstones from models
        (contacts.sql:6), so reconciled reads hide them and compaction
        physically drops them (no-op under COW, which never stores any).
        """
        if mode not in ("cow", "mor"):
            raise ValueError(f"model mode must be 'cow' or 'mor', got {mode!r}")
        self.spark = spark
        self.spec = spec
        self.mode = mode
        # violation counts from the most recent expectations check (the
        # dbt-test/DLT metrics surface; see _apply_expectations)
        self.last_expectation_stats: dict[str, int] | None = None
        schema, lww_order = spec.schema, spec.lww_order
        props = {"tombstones.retain": "false"}
        if mode == "mor":
            # The group-max-seq stamp is monotone only under seq-ordered
            # delivery; a file-ordered stream (maxFilesPerTrigger) can hand
            # two recomputes of one group the SAME stamp with DIFFERENT
            # content (a lower-seq edit landing between them). The COW merge
            # resolves that with prefer='batch'; the MOR fold needs an
            # explicit commit-order tiebreak: _fold_rank = the append's
            # snapshot version, strictly increasing per commit, appended to
            # the fold order and hidden from reconciled reads
            # (internal.cols). A table created in MOR mode should keep MOR
            # runners — a COW merge on it null-fills the rank, reverting
            # ties to the arbitrary pick.
            schema = T.StructType(
                list(spec.schema.fields) + [T.StructField("_fold_rank", T.LongType(), True)]
            )
            lww_order = list(spec.lww_order) + [("_fold_rank", False)]
            props["internal.cols"] = '["_fold_rank"]'
        self.table = SnapshotTable.create(
            spark, path, schema, spec.key_cols,
            num_buckets=spec.num_buckets, lww_order=lww_order,
            bucket_cols=spec.bucket_cols,
            properties=props,
        )
        has_rank = "_fold_rank" in [f.name for f in self.table.snapshot().schema.fields]
        if mode == "mor" and not has_rank:
            raise ValueError(
                f"model table {path!r} was created without the MOR fold-rank "
                "column (cow-mode table); recreate it, or keep mode='cow'"
            )
        if mode == "cow" and has_rank:
            # symmetric guard: a COW merge on a MOR-created table would
            # conform batch rows with a NULL _fold_rank while the persisted
            # lww_order still ranks by it — stored non-null ranks then win
            # every tie BEFORE the merge's prefer='batch' tiebreak, silently
            # pinning stale group rows on stream re-delivery
            raise ValueError(
                f"model table {path!r} was created in mor mode (_fold_rank in "
                "schema); keep mode='mor', or recreate the table for cow"
            )
        if self.table.snapshot().properties.get("tombstones.retain") != "false":
            # adopted a pre-existing table created without the marker: set it
            # (marker-only commit, O(1) driver-side) so MOR deltas' delete
            # semantics hold regardless of who created the table
            self.table.commit(
                add_files=[], properties_update={"tombstones.retain": "false"}
            )

    def needs_full_refresh(self) -> bool:
        return self.table.snapshot().properties.get(HASH_PROP) != self.spec.transform_hash()

    def last_epoch(self) -> int:
        """Per-model exactly-once marker: models commit independently of the
        landing table, so a crash between the two replays only the model
        side of the batch (idempotent merge makes that safe)."""
        return int(self.table.snapshot().properties.get(EPOCH_PROP, -1))

    def _apply_transform(self, scope: DataFrame, upstreams: dict[str, "ModelRunner"] | None,
                         keys: DataFrame | None, scope_cache: dict | None = None) -> DataFrame:
        """Invoke the transform, attaching upstream model states when the
        spec declares dependencies. Upstream reads are the model tables'
        reconciled LIVE state (tombstones never reach model tables — the
        merge drops them), scoped to the touched groups when ``keys`` is
        given: file-level bucket pruning when the upstream layout hashes on
        a subset of the group key, then a broadcast semi-join — the same
        two-level O(touched groups) discipline as the landing read.

        SLICE REUSE: when the upstream ran THIS epoch with the SAME group
        key, its recomputed slice (cached for the DAG epoch by
        run_model_levels) holds exactly the touched groups' fresh rows —
        and both models derive their touched-group set from the same batch
        with the same group columns, so the sets are identical by
        construction. The slice's live rows equal the post-commit folded
        table state for those keys (the recompute is authoritative: the
        merge prefers it, the MOR fold ranks it last), so the dependent
        reads the in-memory slice instead of re-folding the upstream table
        — one MOR reconciliation per epoch per table, not one per
        dependent."""
        if not self.spec.depends_on:
            return self.spec.transform(scope)
        if upstreams is None:
            raise ValueError(f"model {self.spec.name!r} declares depends_on but no upstreams given")
        from cht_sync_spark.tables.format import bucket_expr

        deps: dict[str, DataFrame] = {}
        for up in self.spec.depends_on:
            urunner = upstreams[up]
            sl = (
                scope_cache[("slice", up)]
                if (
                    scope_cache is not None
                    and keys is not None
                    and self.spec.group_cols
                    and urunner.spec.group_cols == self.spec.group_cols
                    and ("slice", up) in scope_cache
                )
                else None
            )
            if sl is not None:
                deps[up] = sl.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
                continue
            ut = urunner.table
            buckets = None
            if keys is not None:
                usnap = ut.snapshot()
                if set(usnap.bucket_cols) <= set(self.spec.group_cols or []):
                    buckets = sorted(
                        r["__b"]
                        for r in keys.select(
                            bucket_expr(usnap.bucket_cols, usnap.num_buckets).alias("__b")
                        ).distinct().collect()
                    )
            d = ut.read_current(buckets=buckets, drop_tombstones=True)
            if keys is not None:
                d = d.join(
                    F.broadcast(keys.select(*self.spec.group_cols)),
                    on=self.spec.group_cols, how="left_semi",
                )
            deps[up] = d
        return self.spec.transform(scope, deps)

    def full_refresh(self, landing: SnapshotTable, upstreams: dict[str, "ModelRunner"] | None = None) -> int:
        """Rebuild from scratch (T12): transform the whole reconciled
        landing state (plus full upstream model states for dependent
        models — topological ordering guarantees upstreams are current),
        drop tombstone outputs, overwrite. Returns rows written (an
        Observation metric riding the overwrite's own write job)."""
        from pyspark.storagelevel import StorageLevel

        # the reconciled landing feeds BOTH the transform and the per-group
        # seq-stamp aggregation below — persist it or the overwrite job
        # scans + LWW-folds the whole table twice (same discipline as
        # run_increment's scope persist)
        cur = landing.read_current().persist(StorageLevel.MEMORY_AND_DISK)
        rows = self._apply_transform(cur, upstreams, keys=None)
        self._enforce_schema(rows)
        rows = self._apply_expectations(rows)
        if self.spec.group_cols and "seq" in rows.columns:
            # same stamp discipline as run_increment: per-group max landing
            # seq (tombstones included). Without it a refresh would store
            # the transform's raw seq (null for sft_examples) while
            # increments store the scope max — the final seq would then
            # depend on WHICH keys happened to be recomputed after the
            # refresh, i.e. on batching/delivery history. With it the
            # stored seq is always the group's global max landing seq —
            # deterministic across batch sizes, streams, and replays.
            seqs = cur.groupBy(*self.spec.group_cols).agg(F.max("seq").alias("seq"))
            rows = rows.drop("seq").join(seqs, on=self.spec.group_cols, how="left")
        from pyspark.sql import Observation

        obs = Observation()
        live = rows.where(~F.coalesce(F.col("_deleted"), F.lit(False))).observe(
            obs, F.count(F.lit(1)).alias("n")
        )
        try:
            self.table.overwrite(live, properties_update={HASH_PROP: self.spec.transform_hash()})
        finally:
            cur.unpersist()
        self._run_data_tests(buckets=None)
        return int(obs.get["n"])

    def _enforce_schema(self, out: DataFrame) -> None:
        """Strict contract on the transform output (T10, contacts.yml:7-8):
        plan-time column/type comparison, raises on drift. Validation only —
        the relaxed conform inside merge still handles internal plumbing
        rows (tombstone stubs) that legitimately carry a column subset."""
        if self.spec.enforced:
            from cht_sync_spark.tables.format import _conform

            _conform(out, self.spec.schema, strict=True)

    def _apply_expectations(self, out: DataFrame) -> DataFrame:
        """Row-level expectations on the transform output (see ModelSpec):
        'fail'/'warn' rules run as ONE aggregation over the slice (raising
        on 'fail' violations BEFORE anything commits); 'drop' rules cost no
        extra job — failing rows are marked ``_deleted`` in the same plan,
        so the merge retracts them like any other tombstone (and the
        grouped shapes' absence logic sees them as emitted, never
        double-tombstoned).

        'fail'/'warn' rules judge LIVE rows only: a landing tombstone flows
        through the transform with null payload columns, and Expectation's
        null-fails semantics would otherwise turn every routine source
        delete into a permanently re-raising batch abort (a delete cannot
        be "fixed" upstream). The retraction itself is already the row's
        fate — there is nothing to validate on it. The counts of the last
        check are kept on ``self.last_expectation_stats`` (the dbt test /
        DLT metrics surface; 'warn' violations are observable there)."""
        if self.spec.expectations is None:
            return out
        from cht_sync_spark.functions.quality import check_expectations

        rules = list(self.spec.expectations())
        reportable = [r for r in rules if r.action in ("fail", "warn")]
        if reportable:
            live = (
                out.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
                if "_deleted" in out.columns
                else out
            )
            # raises on 'fail' violations; counts recorded for metrics
            self.last_expectation_stats = check_expectations(live, reportable)
        dead = None
        for r in rules:
            if r.action == "drop":
                dead = r.fails() if dead is None else (dead | r.fails())
        if dead is not None:
            out = out.withColumn(
                "_deleted", F.coalesce(F.col("_deleted"), F.lit(False)) | dead
            )
        return out

    def _run_data_tests(self, buckets: list[int] | None) -> None:
        """dbt-style unique/not_null tests (contacts.yml:10-15) on the
        reconciled live TABLE state — the full-refresh form (incremental
        epochs test the recomputed slice instead: O(slice), zero table
        re-read — see run_increment)."""
        if not (self.spec.unique_test or self.spec.not_null):
            return
        from cht_sync_spark.operators.contracts import check_contract

        cur = self.table.read_current(buckets=buckets, drop_tombstones=True)
        check_contract(
            cur,
            unique_key=self.spec.key_cols if self.spec.unique_test else None,
            not_null=self.spec.not_null,
        )

    def run_increment(
        self,
        landing: SnapshotTable,
        batch_rows: DataFrame,
        epoch: int | None = None,
        upstreams: dict[str, "ModelRunner"] | None = None,
        scope_cache: dict | None = None,
    ) -> ModelRunStats:
        """Incremental maintenance for one micro-batch.

        ``batch_rows`` = the LWW-deduped landing-shaped rows of this epoch
        (including tombstones). Row-wise models transform the batch
        directly; grouped models recompute the touched groups from the
        landing table (scoped semi-join read). ``upstreams`` maps upstream
        model names to their runners for ``depends_on`` transforms — the
        caller (pipeline) guarantees they are already at this epoch
        (topological ordering).

        Returns a :class:`ModelRunStats` record (the dbt_results analogue):
        rows written ride the write job as an Observation metric (MOR
        appends / full refresh) or come from the merge's own stats (COW) —
        zero extra Spark jobs either way.
        """
        import time as _time

        t0 = _time.monotonic()

        def _done(status: str, rows: int) -> ModelRunStats:
            return ModelRunStats(
                self.spec.name, -1 if epoch is None else epoch, status, rows,
                int((_time.monotonic() - t0) * 1000),
            )

        if epoch is not None and epoch <= self.last_epoch():
            return _done("skipped", 0)
        if self.needs_full_refresh():
            n = self.full_refresh(landing, upstreams)
            if epoch is not None:
                self.table.commit(add_files=[], properties_update={EPOCH_PROP: str(epoch)})
            return _done("full_refresh", n)
        own_persists: list[DataFrame] = []  # uncached-caller cleanup
        if self.spec.group_cols:
            from pyspark.storagelevel import StorageLevel

            from cht_sync_spark.tables.format import bucket_expr

            # Per-epoch shared intermediates: models with the SAME group
            # key derive IDENTICAL (keys, scope, seqs) from the same batch,
            # and each is referenced by several downstream actions (bucket
            # collects, broadcast builds, the gone anti-join). One cache
            # entry per (group_cols, buckets) — landing buckets scanned
            # once per epoch, not once per model per consumer.
            lsnap = landing.snapshot()
            # Landing read scoped to touched groups. Two-level pruning:
            # (1) FILE level — when the landing table's hash layout is a
            #     function of the group key (bucket_cols ⊆ group_cols, e.g.
            #     transcripts bucketed by conv_id for a conv_id-grouped
            #     model), compute the buckets the touched groups hash into
            #     (collect of ≤ num_buckets small ints) and reconcile ONLY
            #     those buckets: per-batch cost is O(touched buckets), not
            #     O(table) — the difference between this model plane
            #     surviving 10^10 rows or rescanning them every micro-batch;
            # (2) ROW level — broadcast semi-join on the touched-group set
            #     (micro-batch-sized) inside those buckets.
            # The cache key is (group key, landing layout): the buckets are
            # a pure function of those plus the batch, so models sharing a
            # group key share ONE bucket-collect job per epoch, not one
            # each (the cache is created fresh per DAG epoch).
            ck = (
                tuple(self.spec.group_cols),
                tuple(lsnap.bucket_cols),
                lsnap.num_buckets,
            )
            if scope_cache is not None and ck in scope_cache:
                keys, scope, seqs, buckets = scope_cache[ck]
            else:
                # touched groups: group identity only — the LWW stamp comes
                # from the SCOPE below, never from the batch (see there)
                keys = batch_rows.select(*self.spec.group_cols).distinct()
                keys = keys.persist(StorageLevel.MEMORY_AND_DISK)
                buckets = None
                if set(lsnap.bucket_cols) <= set(self.spec.group_cols):
                    buckets = sorted(
                        r["__b"]
                        for r in keys.select(
                            bucket_expr(lsnap.bucket_cols, lsnap.num_buckets).alias("__b")
                        )
                        .distinct()
                        .collect()
                    )
                scope = landing.read_current(buckets=buckets).join(
                    F.broadcast(keys),
                    on=self.spec.group_cols,
                    how="left_semi",
                ).persist(StorageLevel.MEMORY_AND_DISK)
                # per-group LWW stamp = the SCOPE's max seq (tombstones
                # included). Not the transform's own seq: after a delete
                # the live-turn max regresses below the stored row's and
                # the stale row would win the LWW merge. And not the
                # BATCH's max seq either: a resumed Structured Streaming
                # query may RE-DELIVER already-processed files under new
                # epoch ids (the landing absorbs that via row-level LWW by
                # design) — an old batch's low seq would lose the merge
                # even though the recompute read the full current landing.
                # The scope max is monotone (scope ⊇ every prior stamp's
                # source) and re-delivery-idempotent.
                seqs = (
                    scope.groupBy(*self.spec.group_cols)
                    .agg(F.max("seq").alias("seq"))
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                if scope_cache is not None:
                    # the level runner unpersists the whole epoch's cache
                    scope_cache[ck] = (keys, scope, seqs, buckets)
                else:
                    own_persists += [keys, scope, seqs]
            out = self._apply_transform(scope, upstreams, keys=keys, scope_cache=scope_cache)
            self._enforce_schema(out)
            out = self._apply_expectations(out)
            if "seq" in out.columns:
                out = out.drop("seq").join(F.broadcast(seqs), on=self.spec.group_cols, how="left")
            if set(self.spec.key_cols) == set(self.spec.group_cols):
                # groups whose every turn is now deleted disappear from the
                # transform output -> emit explicit tombstones for them,
                # stamped with the delete's seq from the scope
                gone = (
                    keys.join(
                        out.select(*self.spec.group_cols).distinct(),
                        on=self.spec.group_cols,
                        how="left_anti",
                    )
                    .join(F.broadcast(seqs), on=self.spec.group_cols, how="left")
                    .withColumn("_deleted", F.lit(True))
                )
                out = out.unionByName(gone, allowMissingColumns=True)
            else:
                # MULTI-ROW grouped model (key_cols ⊋ group_cols, e.g. SFT
                # examples keyed (conv_id, turn_idx) grouped by conv_id): a
                # recomputed group is authoritative for EVERY key inside it.
                # Keys the stored model state holds in a touched group that
                # the recompute no longer emits — an edited turn that changed
                # role, a deleted turn retracting its example, or a fully
                # deleted conversation — become explicit tombstones
                # (within-group delete-by-absence; subsumes the gone-group
                # case above, whose group-only tombstones would not carry a
                # complete key here). O(touched groups): the model read
                # prunes to the buckets the touched groups hash into
                # (bucket_cols ⊆ group_cols), then a broadcast semi-join
                # scopes rows before the anti-join.
                msnap = self.table.snapshot()
                mbuckets = None
                if set(msnap.bucket_cols) <= set(self.spec.group_cols):
                    mbuckets = sorted(
                        r["__b"]
                        for r in keys.select(
                            bucket_expr(msnap.bucket_cols, msnap.num_buckets).alias("__b")
                        )
                        .distinct()
                        .collect()
                    )
                stale = (
                    self.table.read_current(buckets=mbuckets, drop_tombstones=True)
                    .select(*self.spec.key_cols)
                    .join(F.broadcast(keys), on=self.spec.group_cols, how="left_semi")
                    .join(
                        out.select(*self.spec.key_cols),
                        on=self.spec.key_cols,
                        how="left_anti",
                    )
                    .join(F.broadcast(seqs), on=self.spec.group_cols, how="left")
                    .withColumn("_deleted", F.lit(True))
                )
                out = out.unionByName(stale, allowMissingColumns=True)
            # the recomputed slice feeds THREE actions (the merge's
            # bucket-stats collect, the bucket rewrite, the data-test
            # bucket collect) — each would re-run the scope read +
            # transform + gone anti-join without materialization; the
            # slice is micro-batch-sized, so cache it for the epoch.
            # Persisting AFTER the union covers the gone branch too.
            out = out.persist(StorageLevel.MEMORY_AND_DISK)
            cached = out
        else:
            cached = None
            out = self.spec.transform(batch_rows)
            self._enforce_schema(out)
            out = self._apply_expectations(out)
        props = {HASH_PROP: self.spec.transform_hash()}
        if epoch is not None:
            props[EPOCH_PROP] = str(epoch)
        try:
            # grouped recomputes are authoritative (derived from CURRENT
            # landing): prefer the batch on order-column ties, or a resumed
            # stream re-delivering old epochs would pin stale rows forever.
            # dedup_batch=False: uniqueness is structural — a grouped
            # transform emits one row per group (groupBy output ∪ disjoint
            # gone tombstones), a row-wise transform projects the already
            # LWW-unique batch — so the merge's own window pass would be a
            # per-epoch no-op shuffle.
            if self.mode == "mor":
                # sustained-ingest form: the recomputed slice (key-unique by
                # construction — live groupBy output ∪ disjoint absence
                # tombstones) lands as O(slice) delta files; tombstones
                # shadow their base rows in the read-time fold and are
                # physically dropped at the next compaction
                # (tombstones.retain=false). epoch/hash markers commit
                # atomically with the data, same as the merge path. The
                # _fold_rank stamp (next snapshot version) is the fold's
                # commit-order tiebreak — a later recompute always beats an
                # earlier one even when the group-max-seq stamp ties (see
                # __init__); re-delivered old batches recompute from current
                # landing under a higher rank, so the winner is
                # value-identical and replay stays idempotent.
                # rank = the version this append will commit at, pinned with
                # expected_version: under a concurrent writer (S8 shared
                # model tables) a plain rebase would let two appends carry
                # the SAME rank, breaking the strictly-increasing invariant
                # the fold tiebreak needs — on conflict, re-stamp from the
                # new tip and retry (failed attempts' files become vacuum-
                # collected orphans, same as merge retries)
                from pyspark.sql import Observation

                from cht_sync_spark.tables.format import CommitConflict

                last_err: Exception | None = None
                for _ in range(8):
                    v = self.table.current_version()
                    obs = Observation()
                    stamped = out.withColumn(
                        "_fold_rank", F.lit(v + 1).cast("long")
                    ).observe(obs, F.count(F.lit(1)).alias("n"))
                    try:
                        self.table.append_delta(
                            stamped, properties_update=props, expected_version=v
                        )
                        n_written = int(obs.get["n"])
                        break
                    except CommitConflict as e:
                        last_err = e
                else:
                    raise last_err  # type: ignore[misc]
            else:
                prefer = "batch" if self.spec.group_cols else "existing"
                mstats = merge_upsert(
                    self.table, out, tombstones="drop", dedup_batch=False,
                    properties_update=props, prefer=prefer,
                )
                n_written = mstats.rows_in_batch
            if self.spec.unique_test or self.spec.not_null:
                # INCREMENTAL test scope = the recomputed slice itself
                # (dbt's intent: test the MODEL OUTPUT). Within-slice key
                # uniqueness + not-null on the new live rows is the whole
                # incremental obligation: untouched keys were tested by the
                # epochs that wrote them, and cross-epoch duplicates cannot
                # exist in the read view (the merge is keyed; the MOR fold
                # reconciles by key). O(slice) with zero table re-read —
                # the previous touched-bucket table scan re-folded the
                # model table once per model per epoch, the single largest
                # fixed cost in the DAG loop; full_refresh still tests the
                # whole written state (buckets=None).
                from cht_sync_spark.operators.contracts import check_contract

                live = (
                    out.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
                    if "_deleted" in out.columns
                    else out
                )
                check_contract(
                    live,
                    unique_key=self.spec.key_cols if self.spec.unique_test else None,
                    not_null=self.spec.not_null,
                )
                if (
                    self.spec.deep_test_every > 0
                    and epoch is not None
                    and epoch % self.spec.deep_test_every == 0
                ):
                    # periodic deep check over the reconciled read view —
                    # catches fold/merge regressions the slice test's
                    # structural argument assumes away (see ModelSpec)
                    self._run_data_tests(buckets=None)
        except BaseException:
            if cached is not None:
                cached.unpersist()
            raise
        finally:
            for df in own_persists:
                df.unpersist()
        if cached is not None:
            if scope_cache is not None:
                # success only: hand the persisted slice to the DAG-epoch
                # cache so same-group dependents read it instead of
                # re-folding this model's table (_apply_transform slice
                # reuse); the level runner unpersists the whole epoch's
                # cache when the DAG epoch completes
                scope_cache[("slice", self.spec.name)] = cached
            else:
                cached.unpersist()
        return _done("success", n_written)


# --------------------------------------------------------------------------
# DAG scheduling (shared by the batch pipeline and the streaming form)
# --------------------------------------------------------------------------

def topo_levels(runners: list[ModelRunner]) -> list[list[ModelRunner]]:
    """Topological LEVELS of the model DAG (dbt's dependency-ordered run):
    models within a level are independent and may run concurrently; levels
    run in order so dependent transforms always read upstream state that
    already includes the current epoch. Raises on undeclared dependencies
    and cycles."""
    by_name = {m.spec.name: m for m in runners}
    for m in runners:
        for d in m.spec.depends_on:
            if d not in by_name:
                raise ValueError(f"model {m.spec.name!r} depends on undeclared model {d!r}")
    levels: list[list[ModelRunner]] = []
    placed: set[str] = set()
    remaining = list(runners)
    while remaining:
        ready = [m for m in remaining if set(m.spec.depends_on) <= placed]
        if not ready:
            cyc = sorted(m.spec.name for m in remaining)
            raise ValueError(f"model dependency cycle among {cyc}")
        levels.append(ready)
        placed |= {m.spec.name for m in ready}
        remaining = [m for m in remaining if m.spec.name not in placed]
    return levels


def _entry_dfs(entry):
    """The persisted DataFrames inside a scope-cache entry — a
    (keys, scope, seqs, buckets) tuple or a bare recomputed-slice frame."""
    items = entry if isinstance(entry, tuple) else (entry,)
    return [df for df in items if hasattr(df, "unpersist")]


def run_model_levels(
    levels: list[list[ModelRunner]],
    landing,
    batch_rows: DataFrame,
    epoch: int,
    parallelism: int | None = None,
) -> list[ModelRunStats]:
    """Run one epoch of the model DAG: levels in order, models within a
    level thread-parallel (T14 — each model's update is an independent
    Spark job chain, so stages interleave on the cluster). Exactly-once
    holds per model (own epoch marker + idempotent merge): a crash mid-DAG
    replays only models that hadn't committed. Returns one
    :class:`ModelRunStats` per model (the dbt_results records of this
    epoch)."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    ups = {m.spec.name: m for lvl in levels for m in lvl}
    # per-epoch landing-scope cache shared across models (guarded: models
    # within a level run concurrently). Persisted entries are released when
    # the whole DAG epoch completes.
    scope_cache: dict = {}
    lock = threading.Lock()

    class _LockedCache(dict):
        def __contains__(self, k):  # pragma: no cover - trivial
            with lock:
                return dict.__contains__(self, k)

        def __getitem__(self, k):
            with lock:
                return dict.__getitem__(self, k)

        def __setitem__(self, k, v):
            with lock:
                # a racing model may have inserted first: keep the winner
                # and unpersist the loser's duplicate entry (entries are a
                # (keys, scope, seqs, buckets) tuple or a bare slice frame;
                # only the DataFrames hold storage)
                if dict.__contains__(self, k):
                    for df in _entry_dfs(v):
                        df.unpersist()
                    return
                dict.__setitem__(self, k, v)

    scope_cache = _LockedCache()
    stats: list[ModelRunStats] = []
    try:
        for level in levels:
            par = min(parallelism or len(level), len(level))
            if par <= 1 or len(level) == 1:
                for m in level:
                    stats.append(
                        m.run_increment(
                            landing, batch_rows, epoch=epoch, upstreams=ups,
                            scope_cache=scope_cache,
                        )
                    )
                continue
            with ThreadPoolExecutor(max_workers=par, thread_name_prefix="model") as pool:
                futs = [
                    pool.submit(
                        m.run_increment, landing, batch_rows, epoch, ups, scope_cache
                    )
                    for m in level
                ]
                for f in futs:
                    stats.append(f.result())  # propagate the first failure
    finally:
        for entry in scope_cache.values():
            for df in _entry_dfs(entry):
                df.unpersist()
    return stats


# --------------------------------------------------------------------------
# Concrete transcript models (FIXTURES.md §5)
# --------------------------------------------------------------------------

def _conversations_transform(landing: DataFrame) -> DataFrame:
    """conversations(conv_id, n_turns, first_ts, last_ts, has_tool_calls):
    per-conversation rollup of LIVE turns — the contacts.sql analogue
    (filter + project + unique-key merge + tombstone delete)."""
    live = landing.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
    return (
        live.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.max((F.col("role") == "tool").cast("boolean")).alias("has_tool_calls"),
            F.max("seq").alias("seq"),
        )
        .withColumn("_deleted", F.lit(False))
    )


CONVERSATIONS = ModelSpec(
    name="conversations",
    key_cols=["conv_id"],
    schema=T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("n_turns", T.LongType(), True),
            T.StructField("first_ts", T.TimestampType(), True),
            T.StructField("last_ts", T.TimestampType(), True),
            T.StructField("has_tool_calls", T.BooleanType(), True),
            T.StructField("seq", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
    ),
    transform=_conversations_transform,
    group_cols=["conv_id"],
    # contract: enforced + key tests (contacts.yml:7-15 parity)
    enforced=True,
    unique_test=True,
    not_null=["conv_id"],
)


def _tool_calls_transform(rows: DataFrame) -> DataFrame:
    """tool_calls(conv_id, turn_idx, tool, text, ts): row-wise filter model —
    the persons.sql analogue (model-scoped projection with cascade delete:
    a deleted turn deletes its tool_call row; a live non-tool winner also
    removes any stale tool_call row for that key)."""
    return rows.select(
        "conv_id",
        "turn_idx",
        "tool",
        "text",
        "ts",
        "seq",
        "rev_height",
        "_rev",
        (F.coalesce(F.col("_deleted"), F.lit(False)) | (F.col("role") != "tool")).alias("_deleted"),
    )


def _conv_profiles_transform(landing: DataFrame, deps: dict[str, DataFrame]) -> DataFrame:
    """conv_profiles(conv_id, n_turns, last_ts, has_tool_calls,
    first_user_text): the persons.sql analogue of a MODEL->MODEL dependency
    (tests/dbt/package/models/contacts/persons.sql:13-22 selects FROM the
    contacts model and joins the landing table for doc fields) — reads the
    ``conversations`` MODEL for the rollup columns and joins the landing
    slice for the first user-authored turn text."""
    conv = deps["conversations"]
    live = landing.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
    first_user = (
        live.where(F.col("role") == "user")
        .groupBy("conv_id")
        .agg(F.min_by("text", "turn_idx").alias("first_user_text"))
    )
    return (
        conv.select("conv_id", "n_turns", "last_ts", "has_tool_calls", "seq")
        .join(first_user, "conv_id", "left")
        .withColumn("_deleted", F.lit(False))
    )


CONV_PROFILES = ModelSpec(
    name="conv_profiles",
    key_cols=["conv_id"],
    schema=T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("n_turns", T.LongType(), True),
            T.StructField("last_ts", T.TimestampType(), True),
            T.StructField("has_tool_calls", T.BooleanType(), True),
            T.StructField("seq", T.LongType(), True),
            T.StructField("first_user_text", T.StringType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
    ),
    transform=_conv_profiles_transform,
    group_cols=["conv_id"],
    depends_on=["conversations"],
    enforced=True,
    unique_test=True,
    not_null=["conv_id"],
)


TOOL_CALLS = ModelSpec(
    name="tool_calls",
    key_cols=["conv_id", "turn_idx"],
    schema=T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("seq", T.LongType(), True),
            T.StructField("rev_height", T.LongType(), True),
            T.StructField("_rev", T.StringType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
    ),
    transform=_tool_calls_transform,
    group_cols=None,
    lww_order=[("rev_height", False), ("_deleted", True), ("_rev", False), ("seq", False)],
    enforced=True,
    unique_test=True,
    not_null=["conv_id", "turn_idx"],
)


# Context width of the built-in SFT model. Baked into the spec (not a
# factory parameter) because transform_hash() fingerprints the transform
# SOURCE — a closure over a runtime parameter would hash identically for
# different widths and defeat the changed-code full-refresh detection
# (T12). To run a different width, define a sibling spec with its own
# transform function.
SFT_CONTEXT_TURNS = 4


def _sft_examples_transform(rows: DataFrame) -> DataFrame:
    """sft_examples(conv_id, turn_idx, n_context_turns, context_text,
    target_text): one (context, target) training pair per live assistant
    turn — the conversation-plane example-assembly stage
    (functions/transcripts.py) maintained INCREMENTALLY under CDC. Editing
    any turn re-derives every example of its conversation (a context window
    spans neighboring turns, so per-row maintenance is impossible — the
    group IS the dependency unit); examples whose target turn was deleted
    or re-roled are retracted by the runner's within-group
    delete-by-absence. The null seq column is the runner's stamp slot
    (replaced by the group's scope-max seq)."""
    from cht_sync_spark.functions.transcripts import sft_examples

    live = rows.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
    return (
        sft_examples(live, context_turns=SFT_CONTEXT_TURNS)
        .withColumn("seq", F.lit(None).cast("long"))
        .withColumn("_deleted", F.lit(False))
    )


SFT_EXAMPLES_MODEL = ModelSpec(
    name="sft_examples",
    key_cols=["conv_id", "turn_idx"],
    schema=T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("n_context_turns", T.IntegerType(), True),
            T.StructField("context_text", T.StringType(), True),
            T.StructField("target_text", T.StringType(), True),
            T.StructField("seq", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
    ),
    transform=_sft_examples_transform,
    group_cols=["conv_id"],
    # bucket by the GROUP key: the within-group reconciliation read and the
    # cascade merge both prune to the touched conversations' buckets
    bucket_cols=["conv_id"],
    enforced=True,
    unique_test=True,
    not_null=["conv_id", "turn_idx"],
)
