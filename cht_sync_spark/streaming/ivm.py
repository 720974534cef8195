"""Incremental view maintenance (IVM): grouped aggregates over a changelog.

The grouped-model plane (:mod:`cht_sync_spark.operators.models`) keeps a
derived table fresh by RECOMPUTING every touched group from the landing
slice — exact for arbitrary SQL, but O(touched groups' full history) per
epoch: on a feed where every batch touches most groups (the bench's
worst case) the recompute dominates the batch cost. For aggregates with
algebraic structure, classic IVM does strictly less work: apply the batch
as **retractions and insertions against the aggregate state**, O(batch)
instead of O(touched group history).

The missing piece in an upsert changelog is the retraction: the feed
carries new images only, so the OLD contribution of an updated/deleted
key must come from somewhere. Engines with CDF preimages read them from
the log; this engine recovers them from its own storage — **a time-travel
read of the changed keys at the consumer's cursor version** (immutable
snapshots make the preimage a bucket-pruned, semi-joined point read, not
a log format requirement). Per cycle:

1. ``changes(cursor, tip)`` — the new images, O(changed files)
   (manifest-name diff; compaction invisible).
2. preimages: ``read_current(version=cursor)`` pruned to the changed
   keys' buckets + broadcast semi-join on the keys — O(touched buckets),
   and the LWW fold at the cursor version is exactly the state the
   aggregate last saw.
3. new state per changed key = the same LWW fold the merge path uses
   (old ∪ changelog, prefer-existing tiebreak) — so a late out-of-order
   event that LOSES to the stored row contributes a zero delta, exactly
   matching the landing table's own reconciliation.
4. one keyed aggregation over the signed/sided union yields, per group:
   additive deltas for SUM-kind measures, and (old, new) extremum
   candidates for MAX/MIN-kind measures.
5. additive + extremum merge into the aggregate table (below), touched
   buckets rewritten, groups whose live-row support hits zero deleted —
   committed atomically with the cursor (``consumer.<name>.version``),
   pinned to the target snapshot read.

Measure kinds:

- ``sum`` (default; plain Column) — fully invertible: count, sum, and
  anything derived from them (avg, rates) at read time. Delta-merged,
  never recomputed.
- ``max`` / ``min`` — semi-invertible: an arriving value that dominates
  the stored extremum just replaces it, and a batch that never touched
  the extremum-holding value leaves it alone; ONLY a batch that retracts
  the stored extremum itself (deletes or lowers the row that held it,
  with nothing at least as large arriving) triggers an exact per-group
  recompute — the textbook partial-recomputation rule, O(retracted
  groups' history), empty on insert-mostly feeds. Because the candidates
  fold over the changed keys' old images, "held the extremum" is decided
  exactly (old candidate == stored extremum), not heuristically.
  ``bool_or`` is ``max`` over a boolean; ``arg_min/arg_max`` are
  ``min``/``max`` over a ``struct(order_col, value)`` (structs compare
  lexicographically).

Exactly-once without idempotent apply: the delta is a deterministic
function of two immutable snapshot versions, and it commits atomically
with the cursor — a crash replays the same delta once; a lost commit race
re-reads BOTH the target and the cursor before retrying, so a concurrent
same-name consumer that already applied the range turns the retry into a
no-op instead of a double-count (additive state is NOT idempotent; the
cursor re-check is what stands in for it).

Retention contract: both the changelog diff and the preimage read open
the cursor's snapshot, so with producer ``expire_snapshots(keep_last=k)``
the safe consumer lag is k−1 snapshots (same bound as
:class:`~cht_sync_spark.streaming.consumer.ChangelogConsumer`); a lapsed
cursor or a producer rollback is recovered by :meth:`reseed`.

Reference basis: the reference has no incremental aggregates — its dbt
models fully re-select per run (dbt-run.py loop; persons.sql). This is
the Spark-first capability a 10^10-event deployment needs so dashboards
over the transcripts (turns per conversation, volume per source, last
activity) don't re-scan conversation histories every micro-batch.

Measured honesty (BENCH/BASELINE.md `replay_mor_ivm`): on the bench
corpus — every batch touches ~all groups, history ~1.4 rows/key — this
plane TIES the grouped-model recompute plane (both are bound by reading
the touched buckets, which coincide). The advantage is algorithmic and
appears with deep per-group histories or batches touching a small group
fraction: preimages are one row per changed key regardless of history
depth, while a group recompute re-reads the whole slice.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from cht_sync_spark.operators.lww import lww_dedup
from cht_sync_spark.streaming.cursor import CursorConsumer, start_version
from cht_sync_spark.tables.format import CommitConflict, SnapshotTable, bucket_expr

# the mandatory support measure: live rows contributing to the group.
# Reaching zero deletes the group (retraction to absence).
SUPPORT_COL = "n_rows"

_KINDS = ("sum", "max", "min")


@dataclass
class Measure:
    """A maintained aggregate column: per-row contribution ``expr``
    (evaluated on LIVE rows only; null contributes nothing) and fold
    ``kind`` (module docstring)."""

    expr: F.Column
    kind: str = "sum"

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"measure kind must be one of {_KINDS}, got {self.kind!r}")


@dataclass
class IvmResult:
    """One applied changelog range."""

    from_version: int  # exclusive
    to_version: int  # inclusive
    groups_changed: int  # delta groups with any nonzero/changed measure
    affected_buckets: int
    groups_recomputed: int = 0  # extremum retractions that forced exact recompute
    retries: int = 0


def _live(df: DataFrame) -> F.Column:
    if "_deleted" in df.columns:
        return ~F.coalesce(F.col("_deleted"), F.lit(False))
    return F.lit(True)


def _nullable(dt):
    """Recursively relax nullability: aggregate outputs are always nullable
    (empty-group / all-null-contribution cases), even when the underlying
    source column is NOT NULL — keeps _conform's cast legal for struct
    measures (arg_min/arg_max patterns)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _nullable(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(_nullable(dt.keyType), _nullable(dt.valueType), True)
    return dt


def _norm_measures(measures: dict) -> dict[str, Measure]:
    out: dict[str, Measure] = {}
    for n, m in measures.items():
        out[n] = m if isinstance(m, Measure) else Measure(m)
    return out


def _norm_groups(group_cols) -> tuple[list[str], dict[str, F.Column]]:
    """Group spec: plain source column names, or (name, expr) pairs for
    DERIVED group keys (daily rollups: ("day", F.to_date("ts"))). An expr
    must be a deterministic function of the row — it is evaluated on
    changelog rows, preimages, and recompute reads alike."""
    names: list[str] = []
    exprs: dict[str, F.Column] = {}
    for g in group_cols:
        if isinstance(g, str):
            names.append(g)
        else:
            n, e = g
            names.append(n)
            exprs[n] = e
    return names, exprs


class AggregateConsumer(CursorConsumer):
    """Maintain ``target`` = ``SELECT group_cols, count(*) AS n_rows,
    SUM/MAX/MIN(measure)... FROM source-live-rows GROUP BY group_cols``
    incrementally from ``source``'s changelog.

    ``measures`` maps output column name → a plain contribution Column
    (sum kind) or a :class:`Measure`. ``n_rows`` is maintained
    automatically and is reserved.
    """

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable | str,
        target: SnapshotTable,
        name: str,
        group_cols: list[str | tuple[str, F.Column]],
        measures: dict[str, F.Column | Measure],
        strict: bool = True,
        max_retries: int = 8,
    ):
        if SUPPORT_COL in measures:
            raise ValueError(f"{SUPPORT_COL!r} is maintained automatically; rename the measure")
        self.spark = spark
        self.source = (
            source if isinstance(source, SnapshotTable) else SnapshotTable(spark, source)
        )
        self.target = target
        self.name = name
        self.group_cols, self._group_exprs = _norm_groups(group_cols)
        if self._group_exprs:  # plain-name consumers pay no snapshot read here
            src_cols = {f.name for f in self.source.snapshot().schema.fields}
            shadowed = sorted(set(self._group_exprs) & src_cols)
            if shadowed:
                raise ValueError(
                    f"derived group column(s) {shadowed} shadow existing source columns"
                )
        self.measures = _norm_measures(measures)
        self.strict = strict
        self.max_retries = max_retries

    def _grouped(self, df: DataFrame) -> DataFrame:
        """Materialize derived group columns. Idempotent (skips columns
        already materialized); shadowing of real source columns is rejected
        at construction."""
        for n, e in self._group_exprs.items():
            if n not in df.columns:
                df = df.withColumn(n, e)
        return df

    # cursor read/probe, pinned advance, drain loop: CursorConsumer

    # ---------------------------------------------------------- internals
    def _exact_agg(self, df: DataFrame) -> DataFrame:
        """The view definition itself, over raw source-shaped rows —
        used by reseed and by extremum-retraction group recomputes.

        Sum measures coalesce to 0 (not SQL SUM's NULL) so a group whose
        live rows all carry null contributions stores the same value on
        this path as on the incremental path (whose additive fold starts
        at 0) — the maintained invariant is "sum of non-null
        contributions, 0 when none", on every code path."""
        df = self._grouped(df)
        live = _live(df)
        aggs = [F.sum(F.when(live, 1).otherwise(0)).cast("long").alias(SUPPORT_COL)]
        for n, m in self.measures.items():
            e = F.when(live, m.expr)
            if m.kind == "sum":
                aggs.append(F.coalesce(F.sum(e), F.lit(0)).alias(n))
            else:
                aggs.append((F.max if m.kind == "max" else F.min)(e).alias(n))
        return df.groupBy(*self.group_cols).agg(*aggs).where(F.col(SUPPORT_COL) > 0)

    def _proj(self, df: DataFrame, side: int) -> DataFrame:
        """Per-row projection under the group key: signed contributions for
        sum measures, raw live values for extremum measures, side tag."""
        df = self._grouped(df)
        live = _live(df)
        sg = F.lit(1 if side == 1 else -1)
        cols = [
            F.lit(side).alias("__side"),
            (sg * F.when(live, F.lit(1)).otherwise(0)).cast("long").alias(SUPPORT_COL),
        ]
        for n, m in self.measures.items():
            if m.kind == "sum":
                cols.append((sg * F.when(live, m.expr)).alias(n))
            else:
                cols.append(F.when(live, m.expr).alias(n))
        return df.select(*self.group_cols, *cols)

    def _delta(self, from_v: int, tip: int) -> DataFrame | None:
        """Per-group delta frame for the (from_v, tip] changelog range
        (sum deltas + extremum old/new candidates), or None when the range
        holds no logical changes.

        Scale note: the changed-key semi-join broadcasts O(range's distinct
        keys) — ~15 MB for a 500k-key micro-batch, comfortably inside
        executor broadcast budgets at the design point. A consumer resuming
        across a HUGE range (days of lag) should :meth:`reseed` instead of
        crossing it incrementally; the broadcast is the first thing that
        says so."""
        src = self.source
        ch = src.changes(from_v, tip, strict=self.strict).drop(
            "_change_version", "_change_type"
        )
        snap = src.snapshot(from_v)
        key = snap.key_cols
        # preimages: bucket-prune the cursor-version read to the changed
        # keys' buckets (pure function of bucket_cols ⊆ key), then cut to
        # exactly the changed keys with a broadcast semi-join — the same
        # two-level prune the grouped-model plane uses (operators/models.py)
        touched = [
            r["__b"]
            for r in ch.select(
                bucket_expr(snap.bucket_cols, snap.num_buckets).alias("__b")
            )
            .distinct()
            .collect()
        ]
        if not touched:
            return None
        keys = ch.select(*key).distinct()
        old = src.read_current(version=from_v, buckets=sorted(touched)).join(
            F.broadcast(keys), on=key, how="left_semi"
        )
        # new state per changed key: the merge path's exact fold (old ∪
        # changelog, prefer existing on full order ties) — a losing late
        # event nets a zero delta, matching the landing reconciliation
        order = (snap.lww_order or [(key[0], True)]) + [("__existing", False)]
        new = lww_dedup(
            old.withColumn("__existing", F.lit(1)).unionByName(
                ch.withColumn("__existing", F.lit(0)), allowMissingColumns=True
            ),
            key=key,
            order=order,
        ).drop("__existing")

        rows = self._proj(new, 1).unionByName(self._proj(old, 0))
        side1 = F.col("__side") == 1
        aggs = [F.sum(SUPPORT_COL).alias(SUPPORT_COL)]
        changed = F.coalesce(F.col(SUPPORT_COL), F.lit(0)) != 0
        for n, m in self.measures.items():
            if m.kind == "sum":
                aggs.append(F.sum(n).alias(n))
                changed = changed | (F.coalesce(F.col(n), F.lit(0)) != 0)
            else:
                f = F.max if m.kind == "max" else F.min
                aggs.append(f(F.when(side1, F.col(n))).alias(f"__new_{n}"))
                aggs.append(f(F.when(~side1, F.col(n))).alias(f"__old_{n}"))
                changed = changed | ~F.col(f"__new_{n}").eqNullSafe(F.col(f"__old_{n}"))
        # HAVING drops no-op groups (zero nets, identical extremum
        # candidates, phantom null-group stubs from delete-stub rows)
        return rows.groupBy(*self.group_cols).agg(*aggs).where(changed)

    # ---------------------------------------------------------------- run
    def run_once(self, to_version: int | None = None) -> IvmResult | None:
        """Apply everything committed since the cursor, or None if caught
        up. The additive merge re-reads the cursor inside the retry loop:
        additive state is not idempotent, so a lost commit race must
        re-check whether the range already landed before reapplying.

        ``to_version`` pins the cycle's tip to a version the caller
        observed — the multi-table-sketch rule (CmsConsumer): sibling
        consumers sharing one source must land on ONE tip per cycle or
        their cursors skew and cross-table reads (min-across-depths)
        momentarily disagree about which inserts exist."""
        self._check_sole_owner()
        last_err: CommitConflict | None = None
        for attempt in range(self.max_retries):
            tip = to_version if to_version is not None else self.source.current_version()
            from_v = start_version(self.source, self.position())
            if tip <= from_v:
                return None if attempt == 0 else IvmResult(from_v, tip, 0, 0, 0, attempt)
            try:
                delta = self._delta(from_v, tip)
                if delta is None:  # e.g. compaction-only range: advance cursor
                    self._advance_cursor(tip)
                    return IvmResult(from_v, tip, 0, 0, 0, attempt)
                return self._apply(delta, from_v, tip, attempt)
            except CommitConflict as e:
                last_err = e
                time.sleep(0.05 * (attempt + 1))
        raise last_err  # type: ignore[misc]

    def _check_sole_owner(self) -> None:
        """An additive target admits exactly ONE maintaining cursor: two
        consumers under DIFFERENT names would each track their own cursor
        and both apply every range — silent double-counting (same-name
        concurrency is safe; the pinned commits serialize it). Fail fast on
        the misconfiguration instead."""
        others = [
            k
            for k in self.target.snapshot().properties
            if k.startswith("consumer.")
            and k.endswith(".version")
            and k != self._ckpt_key
        ]
        if others:
            raise ValueError(
                f"aggregate target {self.target.path} is already maintained by "
                f"{others}; one additive target admits one consumer name "
                f"(this one: {self._ckpt_key}). To take over under a new name "
                "(rename, ownership transfer), run reseed() — it rebuilds the "
                "state and clears the stale cursor atomically."
            )

    def _apply(self, delta: DataFrame, from_v: int, tip: int, attempt: int) -> IvmResult:
        tsnap = self.target.snapshot()
        bstats = (
            delta.withColumn("__b", bucket_expr(tsnap.bucket_cols, tsnap.num_buckets))
            .groupBy("__b")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        if not bstats:
            self._advance_cursor(tip)
            return IvmResult(from_v, tip, 0, 0, 0, attempt)
        affected = sorted(r["__b"] for r in bstats)
        n_groups = int(sum(r["n"] for r in bstats))

        # state ⟗ delta: additive fold for sum measures; extremum rule for
        # max/min (dominating new candidate replaces; untouched extremum
        # stays; a retracted extremum flags the group for exact recompute).
        # Untouched groups in the affected buckets ride along unchanged
        # (COW bucket rewrite); support == 0 retracts the group to absence.
        state = self.target.read(buckets=affected)
        s, d = state.alias("s"), delta.alias("d")
        # NULL-SAFE group equality: a null group key (derived day over a
        # null ts is the flagship case) is a real group; a null-unsafe join
        # would never match its state row against its delta row, splitting
        # the group into permanent duplicate target rows
        cond = None
        for c in self.group_cols:
            t = F.col(f"s.{c}").eqNullSafe(F.col(f"d.{c}"))
            cond = t if cond is None else (cond & t)
        joined = s.join(d, on=cond, how="full_outer")

        def _sum_col(n: str) -> F.Column:
            return (
                F.coalesce(F.col(f"s.{n}"), F.lit(0)) + F.coalesce(F.col(f"d.{n}"), F.lit(0))
            ).alias(n)

        out_cols = [
            F.coalesce(F.col(f"s.{c}"), F.col(f"d.{c}")).alias(c) for c in self.group_cols
        ] + [_sum_col(SUPPORT_COL)]
        rec_flags: list[F.Column] = []
        for n, m in self.measures.items():
            if m.kind == "sum":
                out_cols.append(_sum_col(n))
                continue
            E, new, old = F.col(f"s.{n}"), F.col(f"d.__new_{n}"), F.col(f"d.__old_{n}")
            if m.kind == "max":
                dominates = new.isNotNull() & (E.isNull() | (new >= E))
                untouched = old.isNull() | E.isNull() | (old < E)
                pick = F.greatest(E, new)
            else:
                dominates = new.isNotNull() & (E.isNull() | (new <= E))
                untouched = old.isNull() | E.isNull() | (old > E)
                pick = F.least(E, new)
            # dominates → fold candidates; untouched → stored extremum held
            # by an unchanged row; else the batch retracted the extremum
            # itself and only the group's full history knows the new one
            out_cols.append(
                F.when(dominates, F.coalesce(pick, new)).when(untouched, E).alias(n)
            )
            rec_flags.append(~dominates & ~untouched)
        rec = None
        for fcol in rec_flags:
            rec = fcol if rec is None else (rec | fcol)
        out_cols.append(F.coalesce(rec, F.lit(False)).alias("__rec") if rec is not None else F.lit(False).alias("__rec"))

        folded = joined.select(*out_cols).where(F.col(SUPPORT_COL) > 0)
        n_recomputed = 0
        if rec_flags:
            # the retracted-extremum groups (usually none/few) get the exact
            # per-group recompute from the source AT THE PINNED VERSION
            # `tip` — never the unpinned current tip: a producer commit
            # racing this apply would otherwise bake post-tip rows into the
            # recomputed group while the cursor commits as tip, and the next
            # cycle would re-apply the (tip, tip'] delta on top (a double
            # count). Bucket-pruned when the source layout allows,
            # key-semi-joined always.
            folded = folded.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                rec_rows = folded.where(F.col("__rec"))
                ssnap = self.source.snapshot(tip)
                can_prune = set(ssnap.bucket_cols) <= set(self.group_cols)
                if can_prune:
                    rb = sorted(
                        r["__b"]
                        for r in rec_rows.select(
                            bucket_expr(ssnap.bucket_cols, ssnap.num_buckets).alias("__b")
                        )
                        .distinct()
                        .collect()
                    )
                    need = len(rb) > 0
                else:
                    rb = None
                    need = not rec_rows.limit(1).isEmpty()
                ok_rows = folded.where(~F.col("__rec")).drop("__rec")
                if need:
                    rec_keys = rec_rows.select(*self.group_cols)
                    n_recomputed = rec_keys.count()
                    src = self._grouped(
                        self.source.read_current(version=tip, buckets=rb)
                    ).alias("r")
                    k = rec_keys.alias("k")
                    sem = None  # null-safe: null group keys recompute too
                    for c in self.group_cols:
                        t = F.col(f"r.{c}").eqNullSafe(F.col(f"k.{c}"))
                        sem = t if sem is None else (sem & t)
                    src_rows = src.join(F.broadcast(k), on=sem, how="left_semi")
                    merged = ok_rows.unionByName(self._exact_agg(src_rows))
                else:
                    merged = ok_rows
                result = self._commit_merged(merged, tsnap, affected, tip)
            finally:
                folded.unpersist()
        else:
            merged = folded.drop("__rec")
            result = self._commit_merged(merged, tsnap, affected, tip)
        return IvmResult(from_v, tip, n_groups, len(affected), n_recomputed, attempt)

    def _commit_merged(self, merged: DataFrame, tsnap, affected: list[int], tip: int):
        from cht_sync_spark.tables.format import _conform

        merged = _conform(merged, tsnap.schema)
        files = self.target._write_data(merged, tsnap, level="base")
        return self.target.commit(
            add_files=files,
            remove_buckets=set(affected),
            properties_update={self._ckpt_key: str(tip)},
            expected_version=tsnap.version,
        )

    # ------------------------------------------------------------- reseed
    def reseed(self) -> IvmResult:
        """Full recompute from the source's CURRENT reconciled state in one
        atomic overwrite that also sets the cursor — bootstrap over a
        pre-existing table, and recovery from a producer rollback or a
        cursor lagged past snapshot retention (both make the incremental
        range uncrossable). O(source live rows), the recovery path only.

        The read is PINNED to the version the cursor commits as — an
        unpinned read racing a producer commit would bake post-tip rows
        into the overwrite while the cursor says tip, and the next
        incremental cycle would re-apply them additively (double count).

        Also the OWNERSHIP-TAKEOVER path: any OTHER consumer's cursor on
        this target is definitionally stale after a full rebuild, so reseed
        deletes those keys in the same atomic commit (a renamed consumer
        would otherwise be bricked by the sole-owner fence forever —
        properties inherit through every commit, including this overwrite).
        """
        tip = self.source.current_version()
        from_v = self.position()
        agg = self._exact_agg(self.source.read_current(version=tip))
        props: dict[str, str | None] = {self._ckpt_key: str(tip)}
        props.update(self._foreign_cursor_deletions())  # ownership takeover
        self.target.overwrite(agg, properties_update=props)
        return IvmResult(from_v, tip, -1, -1)

    # ---------------------------------------------------------------- DDL
    @classmethod
    def create_target(
        cls,
        spark: SparkSession,
        source: SnapshotTable | str,
        target_path: str,
        group_cols: list[str | tuple[str, F.Column]],
        measures: dict[str, F.Column | Measure],
        num_buckets: int = 16,
        **table_kw,
    ) -> SnapshotTable:
        """Bootstrap the aggregate table: schema derived by ANALYZING the
        view definition against the source schema (no Spark job), key =
        group columns, no LWW order (additive state has exactly one row per
        key by construction)."""
        src = source if isinstance(source, SnapshotTable) else SnapshotTable(spark, source)
        ms = _norm_measures(measures)
        names, exprs = _norm_groups(group_cols)
        # analyze-only: measure columns take their POST-AGGREGATE types
        # (count/int sums accumulate as long; extremums keep the expr type)
        probe_aggs = [F.sum(F.lit(1)).cast("long").alias(SUPPORT_COL)]
        for n, m in ms.items():
            f = {"sum": F.sum, "max": F.max, "min": F.min}[m.kind]
            probe_aggs.append(f(m.expr).alias(n))
        from pyspark.sql import types as T

        base = spark.createDataFrame([], src.snapshot().schema)
        for n, e in exprs.items():
            base = base.withColumn(n, e)
        raw = (
            base.groupBy(*names)
            .agg(*probe_aggs)
            .schema
        )
        probe = T.StructType(
            [
                T.StructField(
                    f.name,
                    f.dataType if f.name in names else _nullable(f.dataType),
                    f.name not in names or f.nullable,
                )
                for f in raw.fields
            ]
        )
        return SnapshotTable.create(
            spark,
            target_path,
            probe,
            key_cols=names,
            num_buckets=num_buckets,
            **table_kw,
        )


class DistinctCountConsumer(AggregateConsumer):
    """Exact, incrementally-maintained ``COUNT(DISTINCT value) GROUP BY
    group_cols`` — the one dashboard aggregate the additive plane cannot
    express (distinct count is not algebraic: an arriving duplicate must
    know whether the group already holds the value).

    Classic two-level IVM, collapsed into ONE table and ONE atomic commit:

    - **refcount rows** (``__v`` NOT null): one row per (group, value) with
      ``n_rows`` = live source rows contributing that value — maintained by
      the SAME changelog-delta machinery as :class:`AggregateConsumer`,
      with the value as one more derived group key (so updates that
      migrate a row between values retract one refcount and add another,
      and time-travel preimages make the retraction exact).
    - **one summary row per group** (``__v`` null): ``n_rows`` = the
      distinct count. Folded in the SAME pass from the refcount
      transitions — a value APPEARS when its refcount crosses 0→+ and
      VANISHES on +→0, and the summary delta is (appeared − vanished).
      Because both levels commit in one snapshot pinned to one cursor,
      there is no window where the refcounts and the count disagree.

    Null values never count (SQL ``COUNT(DISTINCT)`` semantics). Groups
    retract to absence when their last value vanishes. Reads:
    :meth:`counts` is a bucket-prunable scan of the summary rows — no
    aggregation over the refcounts at query time.

    Scale: state is O(sum of per-group distinct cardinalities) — the same
    state lower bound ANY exact distinct count needs; per cycle the work is
    the AggregateConsumer delta (O(batch) + touched-bucket rewrite). For
    cardinalities where exact state is unaffordable, keep the measure
    approximate at read time instead (HLL over the refcount rows); the
    refcount table IS the exact sketch.

    Reference basis: the reference's sql-exporter dashboards count distinct
    entities per source with full re-scans (sql-exporter-config.yaml); dbt
    re-selects. This is the Spark-first incremental form.
    """

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable | str,
        target: SnapshotTable,
        name: str,
        group_cols: list,
        value: F.Column | str,
        strict: bool = True,
        max_retries: int = 8,
    ):
        vcol = F.col(value) if isinstance(value, str) else value
        super().__init__(
            spark,
            source,
            target,
            name,
            group_cols=list(group_cols) + [("__v", vcol)],
            measures={},
            strict=strict,
            max_retries=max_retries,
        )
        self.outer = self.group_cols[:-1]  # group cols without __v

    # ------------------------------------------------------------- reads
    def counts(self, buckets: list[int] | None = None) -> DataFrame:
        """The maintained view: one row per group, ``n_distinct``."""
        t = self.target.read(buckets=buckets)
        return t.where(F.col("__v").isNull()).select(
            *self.outer, F.col(SUPPORT_COL).alias("n_distinct")
        )

    def refcounts(self, buckets: list[int] | None = None) -> DataFrame:
        """The per-(group, value) support rows (the exact 'sketch')."""
        t = self.target.read(buckets=buckets)
        return t.where(F.col("__v").isNotNull())

    @staticmethod
    def topk_from_state(
        target: SnapshotTable, outer: list[str], k: int,
        buckets: list[int] | None = None,
    ) -> DataFrame:
        """Heavy hitters from a maintained refcount table (the query
        :meth:`topk_values` wraps): per group the k most frequent values
        by live support, deterministic (support desc, value asc)
        tie-break. Runs over STATE — vocabulary-sized, bucket-prunable —
        with zero corpus I/O: the 'top event kinds per conversation'
        dashboard query the reference answers with a full rescan
        (sql-exporter-config.yaml), priced at O(distinct values) here
        regardless of corpus size."""
        from pyspark.sql import Window

        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        w = Window.partitionBy(*outer).orderBy(
            F.col(SUPPORT_COL).desc(), F.col("__v").asc()
        )
        return (
            target.read(buckets=buckets)
            .where(F.col("__v").isNotNull())
            .withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k)
            .select(
                *outer,
                F.col("__v").alias("value"),
                F.col(SUPPORT_COL).alias("support"),
                F.col("__rk").cast("int").alias("rank"),
            )
        )

    def topk_values(self, k: int, buckets: list[int] | None = None) -> DataFrame:
        """Per-group top-k most frequent values (see :meth:`topk_from_state`)."""
        return self.topk_from_state(self.target, self.outer, k, buckets)

    # ------------------------------------------------------------- apply
    def _apply(self, delta: DataFrame, from_v: int, tip: int, attempt: int) -> IvmResult:
        tsnap = self.target.snapshot()
        # SQL COUNT(DISTINCT) ignores nulls; a null-valued refcount row
        # would also collide with the summary row's __v-null key
        delta = delta.where(F.col("__v").isNotNull()).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            bstats = (
                delta.withColumn("__b", bucket_expr(tsnap.bucket_cols, tsnap.num_buckets))
                .groupBy("__b")
                .agg(F.count("*").alias("n"))
                .collect()
            )
            if not bstats:
                self._advance_cursor(tip)
                return IvmResult(from_v, tip, 0, 0, 0, attempt)
            affected = sorted(r["__b"] for r in bstats)
            n_vals = int(sum(r["n"] for r in bstats))

            state = self.target.read(buckets=affected)
            vals = state.where(F.col("__v").isNotNull()).alias("s")
            sums = state.where(F.col("__v").isNull())
            d = delta.alias("d")

            keycols = [*self.outer, "__v"]
            cond = None
            for c in keycols:  # null-safe: null OUTER group keys are real groups
                t = F.col(f"s.{c}").eqNullSafe(F.col(f"d.{c}"))
                cond = t if cond is None else (cond & t)
            j = vals.join(d, on=cond, how="full_outer")
            old_n = F.col(f"s.{SUPPORT_COL}")
            new_n = F.coalesce(old_n, F.lit(0)) + F.coalesce(F.col(f"d.{SUPPORT_COL}"), F.lit(0))
            folded = j.select(
                *[F.coalesce(F.col(f"s.{c}"), F.col(f"d.{c}")).alias(c) for c in keycols],
                new_n.alias(SUPPORT_COL),
                # stored refcounts are always > 0, so presence of the state
                # row IS the old set-membership bit
                (old_n.isNull() & (new_n > 0)).cast("long").alias("__app"),
                (old_n.isNotNull() & (new_n <= 0)).cast("long").alias("__van"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
            try:
                dd = (
                    folded.groupBy(*self.outer)
                    .agg((F.sum("__app") - F.sum("__van")).alias("__dd"))
                    .where(F.col("__dd") != 0)
                ).alias("d2")
                s2 = sums.alias("s2")
                cond2 = None
                for c in self.outer:
                    t = F.col(f"s2.{c}").eqNullSafe(F.col(f"d2.{c}"))
                    cond2 = t if cond2 is None else (cond2 & t)
                new_cnt = F.coalesce(F.col(f"s2.{SUPPORT_COL}"), F.lit(0)) + F.coalesce(
                    F.col("d2.__dd"), F.lit(0)
                )
                new_sums = s2.join(dd, on=cond2, how="full_outer").select(
                    *[
                        F.coalesce(F.col(f"s2.{c}"), F.col(f"d2.{c}")).alias(c)
                        for c in self.outer
                    ],
                    F.lit(None).alias("__v"),
                    new_cnt.alias(SUPPORT_COL),
                ).where(F.col(SUPPORT_COL) > 0)
                new_vals = folded.where(F.col(SUPPORT_COL) > 0).drop("__app", "__van")
                merged = new_vals.unionByName(new_sums, allowMissingColumns=False)
                self._commit_merged(merged, tsnap, affected, tip)
            finally:
                folded.unpersist()
            return IvmResult(from_v, tip, n_vals, len(affected), 0, attempt)
        finally:
            delta.unpersist()

    # ------------------------------------------------------------- reseed
    def reseed(self) -> IvmResult:
        """Exact rebuild from the source's current reconciled state: the
        refcount rows are the view definition grouped by (group, value);
        the summary rows count them. Atomic overwrite + cursor, stale
        foreign cursors cleared (ownership takeover), as the base class."""
        tip = self.source.current_version()
        from_v = self.position()
        rows = self._grouped(self.source.read_current(version=tip))
        live = _live(rows)
        vals = (
            rows.where(live & F.col("__v").isNotNull())
            .groupBy(*self.outer, "__v")
            .agg(F.count(F.lit(1)).cast("long").alias(SUPPORT_COL))
        )
        sums = (
            vals.groupBy(*self.outer)
            .agg(F.count(F.lit(1)).cast("long").alias(SUPPORT_COL))
            .withColumn("__v", F.lit(None))
            .select(*self.outer, "__v", SUPPORT_COL)
        )
        props: dict[str, str | None] = {self._ckpt_key: str(tip)}
        props.update(self._foreign_cursor_deletions())  # ownership takeover
        self.target.overwrite(vals.unionByName(sums), properties_update=props)
        return IvmResult(from_v, tip, -1, -1)

    # ---------------------------------------------------------------- DDL
    @classmethod
    def create_distinct_target(
        cls,
        spark: SparkSession,
        source: SnapshotTable | str,
        target_path: str,
        group_cols: list,
        value: F.Column | str,
        num_buckets: int = 16,
        **table_kw,
    ) -> SnapshotTable:
        """Bootstrap the two-level table: key = group cols + ``__v``
        (null ⇔ the group's summary row), bucketed by the OUTER group
        prefix so a group's refcounts and its summary co-locate in one
        bucket (one-bucket point reads, one-bucket rewrites)."""
        src = source if isinstance(source, SnapshotTable) else SnapshotTable(spark, source)
        vcol = F.col(value) if isinstance(value, str) else value
        names, exprs = _norm_groups(list(group_cols) + [("__v", vcol)])
        base = spark.createDataFrame([], src.snapshot().schema)
        for n, e in exprs.items():
            base = base.withColumn(n, e)
        raw = base.groupBy(*names).agg(
            F.sum(F.lit(1)).cast("long").alias(SUPPORT_COL)
        ).schema
        from pyspark.sql import types as T

        probe = T.StructType(
            [
                T.StructField(f.name, f.dataType, True if f.name == "__v" else f.nullable)
                for f in raw.fields
            ]
        )
        return SnapshotTable.create(
            spark,
            target_path,
            probe,
            key_cols=names,
            bucket_cols=names[:-1],  # outer prefix: summary + refcounts co-locate
            num_buckets=num_buckets,
            **table_kw,
        )
