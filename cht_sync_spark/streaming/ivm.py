"""Incremental view maintenance (IVM): algebraic aggregates over a changelog.

The grouped-model plane (:mod:`cht_sync_spark.operators.models`) keeps a
derived table fresh by RECOMPUTING every touched group from the landing
slice — exact for arbitrary SQL, but O(touched groups' full history) per
epoch: on a feed where every batch touches most groups (the bench's
worst case) the recompute dominates the batch cost. For the large class
of *invertible* aggregates (count, sum, and anything derived from them —
avg, rates, totals), classic IVM does strictly less work: apply the batch
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
4. delta per group = Σ contribution(new live rows) − Σ contribution(old
   live rows): one signed union + one keyed shuffle.
5. additive merge into the aggregate table: touched buckets rewritten
   with value + delta, groups whose live-row support hits zero deleted —
   committed atomically with the cursor (``consumer.<name>.version``),
   pinned to the target snapshot read.

Exactly-once without idempotent apply: the delta is a deterministic
function of two immutable snapshot versions, and it commits atomically
with the cursor — a crash replays the same delta once; a lost commit race
re-reads BOTH the target and the cursor before retrying, so a concurrent
same-name consumer that already applied the range turns the retry into a
no-op instead of a double-count (additive state is NOT idempotent; the
cursor re-check is what stands in for it).

Scope honesty: only invertible measures. MIN/MAX/bool_or cannot be
maintained under retraction without per-group history — for those, use
the grouped-model recompute plane, which is exact for arbitrary SQL.
Conditional counts/sums ARE expressible: make the contribution expression
itself conditional (``F.when(cond, x)``; null contributes nothing).

Retention contract: both the changelog diff and the preimage read open
the cursor's snapshot, so with producer ``expire_snapshots(keep_last=k)``
the safe consumer lag is k−1 snapshots (same bound as
:class:`~cht_sync_spark.streaming.consumer.ChangelogConsumer`); a lapsed
cursor or a producer rollback is recovered by :meth:`reseed`.

Reference basis: the reference has no incremental aggregates — its dbt
models fully re-select per run (dbt-run.py loop; persons.sql). This is
the Spark-first capability a 10^10-event deployment needs so dashboards
over the transcripts (turns per conversation, volume per source) don't
re-scan conversation histories every micro-batch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cht_sync_spark.operators.lww import lww_dedup
from cht_sync_spark.tables.format import CommitConflict, SnapshotTable, bucket_expr

# the mandatory support measure: live rows contributing to the group.
# Reaching zero deletes the group (retraction to absence).
SUPPORT_COL = "n_rows"


@dataclass
class IvmResult:
    """One applied changelog range."""

    from_version: int  # exclusive
    to_version: int  # inclusive
    groups_changed: int  # delta groups with any nonzero measure
    affected_buckets: int
    retries: int = 0


def _live(df: DataFrame) -> F.Column:
    if "_deleted" in df.columns:
        return ~F.coalesce(F.col("_deleted"), F.lit(False))
    return F.lit(True)


class AggregateConsumer:
    """Maintain ``target`` = ``SELECT group_cols, count(*) AS n_rows,
    SUM(measure)... FROM source-live-rows GROUP BY group_cols``
    incrementally from ``source``'s changelog.

    ``measures`` maps output column name → per-row contribution expression
    (a Column over source columns; evaluated on LIVE rows only, null
    contributes nothing). ``n_rows`` is maintained automatically and is
    reserved.
    """

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable | str,
        target: SnapshotTable,
        name: str,
        group_cols: list[str],
        measures: dict[str, F.Column],
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
        self.group_cols = list(group_cols)
        self.measures = dict(measures)
        self.strict = strict
        self.max_retries = max_retries

    # ------------------------------------------------------------- cursor
    @property
    def _ckpt_key(self) -> str:
        return f"consumer.{self.name}.version"

    def position(self) -> int:
        v = self.target.snapshot().properties.get(self._ckpt_key)
        return int(v) if v is not None else 0

    def pending_versions(self) -> int:
        return max(0, self.source.current_version() - max(self.position(), 1))

    # ---------------------------------------------------------- internals
    def _contrib(self, df: DataFrame, sign: int) -> DataFrame:
        """Per-row signed contributions (live rows only) under the group key."""
        live = _live(df)
        sg = F.lit(sign)
        cols = [
            (sg * F.when(live, F.lit(1)).otherwise(0)).cast("long").alias(SUPPORT_COL)
        ] + [(sg * F.when(live, expr)).alias(n) for n, expr in self.measures.items()]
        return df.select(*self.group_cols, *cols)

    def _measure_cols(self) -> list[str]:
        return [SUPPORT_COL, *self.measures.keys()]

    def _delta(self, from_v: int, tip: int) -> DataFrame | None:
        """Per-group measure deltas for the (from_v, tip] changelog range,
        or None when the range holds no logical changes."""
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

        signed = self._contrib(new, +1).unionByName(self._contrib(old, -1))
        mcols = self._measure_cols()
        delta = signed.groupBy(*self.group_cols).agg(
            *[F.sum(c).alias(c) for c in mcols]
        )
        # drop all-zero groups (unchanged nets, phantom null-group stubs)
        nz = None
        for c in mcols:
            t = F.coalesce(F.col(c), F.lit(0)) != 0
            nz = t if nz is None else (nz | t)
        return delta.where(nz)

    # ---------------------------------------------------------------- run
    def run_once(self) -> IvmResult | None:
        """Apply everything committed since the cursor, or None if caught
        up. The additive merge re-reads the cursor inside the retry loop:
        additive state is not idempotent, so a lost commit race must
        re-check whether the range already landed before reapplying."""
        last_err: CommitConflict | None = None
        for attempt in range(self.max_retries):
            tip = self.source.current_version()
            from_v = max(self.position(), 1)  # v1 = the empty CREATE
            if tip <= from_v:
                return None if attempt == 0 else IvmResult(from_v, tip, 0, 0, attempt)
            delta = self._delta(from_v, tip)
            if delta is None:  # e.g. compaction-only range: advance cursor
                self.target.commit(
                    add_files=[], properties_update={self._ckpt_key: str(tip)}
                )
                return IvmResult(from_v, tip, 0, 0, attempt)
            try:
                return self._apply(delta, from_v, tip, attempt)
            except CommitConflict as e:
                last_err = e
                time.sleep(0.05 * (attempt + 1))
        raise last_err  # type: ignore[misc]

    def _apply(self, delta: DataFrame, from_v: int, tip: int, attempt: int) -> IvmResult:
        tsnap = self.target.snapshot()
        mcols = self._measure_cols()
        bstats = (
            delta.withColumn("__b", bucket_expr(tsnap.bucket_cols, tsnap.num_buckets))
            .groupBy("__b")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        if not bstats:
            self.target.commit(add_files=[], properties_update={self._ckpt_key: str(tip)})
            return IvmResult(from_v, tip, 0, 0, attempt)
        affected = sorted(r["__b"] for r in bstats)
        n_groups = int(sum(r["n"] for r in bstats))

        # state + delta -> one keyed sum; untouched groups in the affected
        # buckets ride along unchanged (COW bucket rewrite); support == 0
        # retracts the group to absence
        state = self.target.read(buckets=affected).select(*self.group_cols, *mcols)
        merged = (
            state.unionByName(delta.select(*self.group_cols, *mcols))
            .groupBy(*self.group_cols)
            .agg(*[F.sum(c).alias(c) for c in mcols])
            .where(F.col(SUPPORT_COL) > 0)
        )
        from cht_sync_spark.tables.format import _conform

        merged = _conform(merged, tsnap.schema)
        files = self.target._write_data(merged, tsnap, level="base")
        committed = self.target.commit(
            add_files=files,
            remove_buckets=set(affected),
            properties_update={self._ckpt_key: str(tip)},
            expected_version=tsnap.version,
        )
        del committed
        return IvmResult(from_v, tip, n_groups, len(affected), attempt)

    def run(self, poll_seconds: float = 0.0, max_cycles: int | None = None) -> list[IvmResult]:
        results: list[IvmResult] = []
        cycles = 0
        while True:
            r = self.run_once()
            if r is not None:
                results.append(r)
            cycles += 1
            if max_cycles is not None and cycles >= max_cycles:
                return results
            if r is None:
                if poll_seconds <= 0:
                    return results
                time.sleep(poll_seconds)

    # ------------------------------------------------------------- reseed
    def reseed(self) -> IvmResult:
        """Full recompute from the source's CURRENT reconciled state in one
        atomic overwrite that also sets the cursor — bootstrap over a
        pre-existing table, and recovery from a producer rollback or a
        cursor lagged past snapshot retention (both make the incremental
        range uncrossable). O(source live rows), the recovery path only."""
        tip = self.source.current_version()
        from_v = self.position()
        full = self._contrib(self.source.read_current(), +1)
        mcols = self._measure_cols()
        agg = (
            full.groupBy(*self.group_cols)
            .agg(*[F.sum(c).alias(c) for c in mcols])
            .where(F.col(SUPPORT_COL) > 0)
        )
        self.target.overwrite(agg, properties_update={self._ckpt_key: str(tip)})
        return IvmResult(from_v, tip, -1, -1)

    # ---------------------------------------------------------------- DDL
    @classmethod
    def create_target(
        cls,
        spark: SparkSession,
        source: SnapshotTable | str,
        target_path: str,
        group_cols: list[str],
        measures: dict[str, F.Column],
        num_buckets: int = 16,
        **table_kw,
    ) -> SnapshotTable:
        """Bootstrap the aggregate table: schema derived by ANALYZING the
        measure expressions against the source schema (no Spark job), key =
        group columns, no LWW order (additive state has exactly one row per
        key by construction)."""
        src = source if isinstance(source, SnapshotTable) else SnapshotTable(spark, source)
        # analyze-only (no job): measure columns take their POST-SUM types
        # (count/int contributions accumulate as long)
        probe = (
            spark.createDataFrame([], src.snapshot().schema)
            .select(
                *group_cols,
                F.lit(1).cast("long").alias(SUPPORT_COL),
                *[expr.alias(n) for n, expr in measures.items()],
            )
            .groupBy(*group_cols)
            .agg(*[F.sum(c).alias(c) for c in [SUPPORT_COL, *measures.keys()]])
            .schema
        )
        return SnapshotTable.create(
            spark,
            target_path,
            probe,
            key_cols=list(group_cols),
            num_buckets=num_buckets,
            **table_kw,
        )
