"""SCD Type 2 history (dbt snapshots): validity-interval tables from CDC.

The reference's transform plane is dbt, and dbt's built-in ``snapshot``
command is exactly this operator: turn a mutable source into an append-only
history table where every revision of a key carries ``valid_from`` /
``valid_to`` / ``is_current`` (dbt calls them ``dbt_valid_from`` /
``dbt_valid_to``; strategies ``timestamp`` and ``check``). The reference
project does not ship a snapshot model, but any dbt user porting to this
engine expects the capability — and for a CDC engine it is the canonical
"slowly changing dimension" deliverable: the changelog already carries every
revision, so history is a pure derivation, not a second capture path.

Two forms, same semantics:

- :func:`scd2_intervals` — the batch derivation: given ALL revisions of each
  key (one row per revision, totally ordered per key by ``order_col``),
  produce the interval rows. One window pass per step, fully Catalyst
  (keyed shuffle on the key — the same partitioning the LWW fold uses), no
  Python rows. This is the oracle-checkable form.
- :class:`Scd2Consumer` — the incremental form: tails a landing table's
  changelog (:meth:`SnapshotTable.changes`, O(changed files)) and maintains
  the history table with O(touched keys' history) work per cycle: read the
  touched keys' stored revisions (bucket-pruned + broadcast-semi-joined,
  the grouped-model prune), union the new revisions, re-derive the interval
  chain for exactly those keys, and MERGE on ``(key..., valid_from)``.
  Re-deriving the chain per touched key (instead of patching the one
  affected interval) is what makes the operator correct under out-of-order
  delivery: a late revision lands IN THE MIDDLE of a key's chain and the
  recompute re-closes its neighbours exactly; batch-split boundaries can
  never change the result because the chain is a pure function of the
  revision SET.

Exactly-once: the cursor (``consumer.<name>.version``) commits atomically
with the derived rows (same contract as
:class:`~cht_sync_spark.streaming.consumer.ChangelogConsumer`); replaying a
range re-derives identical interval rows and the LWW merge makes the apply
a byte-level no-op. A lost commit race re-reads the cursor and the stored
chain before retrying, and because the chain recompute is a pure function
of the revision set (which only ever grows in ``timestamp`` strategy),
concurrent same-name consumers converge; a transient cursor regression is
healed by the next cycle's recompute.

Strategies (dbt parity):

- default (dbt ``timestamp``): every revision opens a new interval. Fully
  correct under out-of-order and duplicate delivery.
- ``check_cols`` (dbt ``check``): a revision whose tracked columns (and
  deletion flag) equal its predecessor's is collapsed into the predecessor's
  interval. Collapse DISCARDS the duplicate revision, so it requires
  per-key monotone arrival (a WAL/binlog in commit order — the normal CDC
  case); the consumer detects a violation (a stored interval row that the
  recompute no longer produces) and raises with reseed guidance instead of
  silently corrupting history.

Deletes: a tombstone revision (``_deleted = true``) is a real history row —
it closes the previous interval, its own interval is the "gone" period, and
``is_current`` is false for it (a key whose last revision is a delete has no
current row — dbt's ``invalidate_hard_deletes``). A later re-insert opens a
fresh interval.

Scale: per cycle the consumer shuffles O(touched keys' revisions) once for
the chain window and once for the merge fold — the grouped-model cost class
(operators/models.py), bucket-pruned on both the read and the write. At
10^10 events the history table is the largest derived table in the system
(every revision is a row), which is exactly why it shares the landing
table's bucket layout: the merge rewrites only touched buckets, and point
lookups ("history of conversation X") stay one-bucket scans.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.streaming.cursor import CursorConsumer, start_version
from cht_sync_spark.tables.format import CommitConflict, SnapshotTable, bucket_expr
from cht_sync_spark.tables.merge import MergeStats, merge_upsert

_META = ("valid_from", "valid_to", "is_current")


def scd2_intervals(
    df: DataFrame,
    key: Sequence[str],
    order_col: str,
    check_cols: Sequence[str] | None = None,
    deleted_col: str = "_deleted",
    tiebreak: Sequence[tuple[str, bool]] | None = None,
) -> DataFrame:
    """Derive SCD2 interval rows from a set of revisions.

    ``df`` holds one row per revision; ``order_col`` totally orders a key's
    revisions (a CDC seq, a commit LSN, an updated-at). Revisions with a
    null order value are dropped (unorderable). Duplicate (key, order)
    deliveries fold to one row: with ``tiebreak`` — (column, ascending)
    pairs — the fold is the engine's LWW conflict-winner rule (equal-height
    CouchDB rev conflicts pick the same winner here as in the landing
    table); without it the duplicates must be value-identical (pure
    redelivery) and an arbitrary one is kept.

    Output: the input columns plus ``valid_from`` (= the revision's order
    value), ``valid_to`` (= the next surviving revision's order value, null
    for the last) and ``is_current`` (last revision of the key AND not a
    delete). With ``check_cols``, a revision equal to its predecessor on
    the tracked columns (null-safely, deletion flag included) is collapsed
    into the predecessor's interval (dbt ``check`` strategy).
    """
    df = df.where(F.col(order_col).isNotNull())
    deleted = (
        F.coalesce(F.col(deleted_col), F.lit(False))
        if deleted_col in df.columns
        else F.lit(False)
    )
    # ONE exchange for the whole derivation: every step below windows over
    # the same key partitioning with an order whose PREFIX is order_col, so
    # Catalyst plans a single hash exchange + sort and the dedup / collapse
    # / chain passes all reuse it (vs dropDuplicates, whose (key, order)
    # aggregate forces a second shuffle before the chain window).
    from cht_sync_spark.operators.lww import lww_order_cols

    ord_cols = [F.col(order_col).asc()]
    if tiebreak:
        # within an equal-order run the LWW tiebreak sorts the winner first
        ord_cols += lww_order_cols(tiebreak)
    w0 = Window.partitionBy(*key).orderBy(*ord_cols)
    # duplicate fold = keep each order-run's head (the tiebreak winner)
    df = (
        df.withColumn("__dup", F.lag(F.col(order_col)).over(w0).eqNullSafe(F.col(order_col)))
        .where(~F.col("__dup"))
        .drop("__dup")
    )
    w = Window.partitionBy(*key).orderBy(F.col(order_col).asc())
    if check_cols:
        tracked = F.struct(*[F.col(c) for c in check_cols], deleted.alias("__del"))
        df = (
            df.withColumn("__prev", F.lag(tracked).over(w))
            .where(F.col("__prev").isNull() | ~F.col("__prev").eqNullSafe(tracked))
            .drop("__prev")
        )
    nxt = F.lead(F.col(order_col)).over(w)
    return (
        df.withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull() & ~deleted)
    )


@dataclass
class Scd2Result:
    """One applied changelog range."""

    from_version: int  # exclusive
    to_version: int  # inclusive
    rows: int  # interval rows written (new + re-closed)
    merge: MergeStats | None
    retries: int = 0


class Scd2Consumer(CursorConsumer):
    """Maintain ``target`` = ``scd2_intervals(all revisions of source)``
    incrementally from ``source``'s changelog. See module docstring."""

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable | str,
        target: SnapshotTable,
        name: str,
        order_col: str | None = None,
        check_cols: Sequence[str] | None = None,
        strict: bool = True,
        max_retries: int = 8,
    ):
        self.spark = spark
        self.source = (
            source if isinstance(source, SnapshotTable) else SnapshotTable(spark, source)
        )
        self.target = target
        self.name = name
        ssnap = self.source.snapshot()
        if order_col is None:
            if not ssnap.lww_order:
                raise ValueError("source has no lww_order; pass order_col explicitly")
            order_col = ssnap.lww_order[0][0]
        self.order_col = order_col
        self.check_cols = list(check_cols) if check_cols else None
        self.strict = strict
        self.max_retries = max_retries
        tsnap = target.snapshot()
        if list(tsnap.key_cols) != list(ssnap.key_cols) + ["valid_from"]:
            raise ValueError(
                f"target key must be source key + ['valid_from']; got {tsnap.key_cols}"
            )
        if (
            list(tsnap.bucket_cols) != list(ssnap.bucket_cols)
            or tsnap.num_buckets != ssnap.num_buckets
        ):
            raise ValueError(
                "target must share the source's bucket layout "
                f"({ssnap.bucket_cols} x {ssnap.num_buckets}) so touched-bucket "
                f"pruning lines up; got {tsnap.bucket_cols} x {tsnap.num_buckets}"
            )

    # cursor read/probe, pinned advance, drain loop: CursorConsumer

    # ---------------------------------------------------------------- run
    def run_once(self) -> Scd2Result | None:
        """Derive intervals for everything committed since the cursor, or
        None if caught up. A lost commit race re-reads cursor + stored
        chain and re-derives (the merge itself runs single-attempt so the
        recompute is never applied against state it did not read)."""
        last_err: CommitConflict | None = None
        for attempt in range(self.max_retries):
            tip = self.source.current_version()
            from_v = start_version(self.source, self.position())
            if tip <= from_v:
                return None if attempt == 0 else Scd2Result(from_v, tip, 0, None, attempt)
            try:
                return self._apply(from_v, tip, attempt)
            except CommitConflict as e:
                last_err = e
                time.sleep(0.05 * (attempt + 1))
        raise last_err  # type: ignore[misc]

    def _apply(self, from_v: int, tip: int, attempt: int) -> Scd2Result:
        from pyspark.storagelevel import StorageLevel

        ssnap = self.source.snapshot(tip)
        key = list(ssnap.key_cols)
        # pin the target version the recompute reads: the merge below
        # refuses to apply (CommitConflict -> run_once re-derives) if a
        # concurrent same-name consumer committed in between — the stale
        # chain (missing that consumer's newer revisions) must never land
        tsnap0 = self.target.snapshot()
        ch = self.source.changes(from_v, tip, strict=self.strict).drop(
            "_change_version", "_change_type"
        )
        # the slice feeds three jobs (bucket collect, key broadcast, chain
        # union) — one scan of the changed files, not three
        ch = ch.where(F.col(self.order_col).isNotNull()).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            # touched buckets: pure function of bucket_cols ⊆ key; layout
            # equality (cols AND modulus) is validated at construction
            touched = sorted(
                r["__b"]
                for r in ch.select(
                    bucket_expr(ssnap.bucket_cols, ssnap.num_buckets).alias("__b")
                )
                .distinct()
                .collect()
            )
            if not touched:  # compaction-only / empty range: cursor-only commit
                self._advance_cursor(tip)
                return Scd2Result(from_v, tip, 0, None, attempt)
            keys = ch.select(*key).distinct()
            stored = self.target.read_current(
                version=tsnap0.version, buckets=touched
            ).join(F.broadcast(keys), on=key, how="left_semi")
            # stored interval rows ARE the revisions (valid_from == order
            # value); strip the derived columns and re-derive the chain
            old_revs = stored.drop(*_META)
            revs = old_revs.unionByName(ch, allowMissingColumns=True)
            # fold equal-order duplicates with the SOURCE's LWW rule, so an
            # equal-height rev conflict resolves to the same winner the
            # landing table keeps — deterministic across replays
            out = scd2_intervals(
                revs,
                key,
                self.order_col,
                check_cols=self.check_cols,
                tiebreak=ssnap.lww_order or None,
            )
            if self.check_cols:
                # check strategy discards collapsed revisions, which is only
                # sound when revisions arrive per-key monotone (commit-ordered
                # WAL). A stored interval row the recompute no longer produces
                # means a late revision re-collapsed history that is already
                # written — fail fast instead of leaving a stale row. The
                # derivation feeds both this probe and the merge: persist it.
                out = out.persist(StorageLevel.MEMORY_AND_DISK)
                stale = stored.select(*key, "valid_from").join(
                    out.select(*key, "valid_from"), on=[*key, "valid_from"], how="left_anti"
                )
                if not stale.limit(1).isEmpty():
                    raise ValueError(
                        "check_cols collapse received out-of-order revisions that "
                        "invalidate stored history rows; reseed() the consumer, or "
                        "use the default (timestamp) strategy for out-of-order feeds"
                    )
            try:
                stats = merge_upsert(
                    self.target,
                    out,
                    tombstones="keep",  # delete revisions are real history rows
                    dedup_batch=False,  # scd2_intervals is unique per (key, valid_from)
                    prefer="batch",  # re-closed intervals overwrite their stored form
                    properties_update={self._ckpt_key: str(tip)},
                    max_retries=1,  # a lost race must re-derive, not re-apply
                    expected_version=tsnap0.version,  # ...and never apply stale
                )
            finally:
                if self.check_cols:
                    out.unpersist()
            return Scd2Result(from_v, tip, stats.rows_in_batch, stats, attempt)
        finally:
            ch.unpersist()

    # ------------------------------------------------------------- reseed
    def reseed(self) -> Scd2Result:
        """Adopt-from-now bootstrap / recovery: rebuild the history table
        from the source's CURRENT reconciled state — one interval per key
        (dbt's first snapshot run: no history exists before adoption). Used
        over a pre-existing source, after a producer rollback, or after a
        cursor lagged past snapshot retention. Atomic overwrite that also
        sets the cursor and clears any other consumer's stale cursor."""
        tip = self.source.current_version()
        from_v = self.position()
        cur = self.source.read_current(version=tip)
        out = scd2_intervals(cur, list(self.source.snapshot(tip).key_cols), self.order_col)
        props: dict[str, str | None] = {self._ckpt_key: str(tip)}
        props.update(self._foreign_cursor_deletions())  # ownership takeover
        self.target.overwrite(out, properties_update=props)
        return Scd2Result(from_v, tip, -1, None)

    # ---------------------------------------------------------------- DDL
    @classmethod
    def create_target(
        cls,
        spark: SparkSession,
        source: SnapshotTable | str,
        target_path: str,
        order_col: str | None = None,
        **table_kw,
    ) -> SnapshotTable:
        """Bootstrap the history table: source schema + the three interval
        columns, key = source key + valid_from, source bucket layout (so
        touched-bucket pruning lines up), LWW on valid_from (part of the
        key, so every stored-vs-rederived pair ties and ``prefer`` decides
        — re-closed intervals always take the recomputed form)."""
        src = source if isinstance(source, SnapshotTable) else SnapshotTable(spark, source)
        snap = src.snapshot()
        if order_col is None:
            if not snap.lww_order:
                raise ValueError("source has no lww_order; pass order_col explicitly")
            order_col = snap.lww_order[0][0]
        by_name = {f.name: f.dataType for f in snap.schema.fields}
        if order_col not in by_name:
            raise ValueError(f"order_col {order_col!r} not in source schema")
        ot = by_name[order_col]
        schema = T.StructType(
            list(snap.schema.fields)
            + [
                T.StructField("valid_from", ot, True),
                T.StructField("valid_to", ot, True),
                T.StructField("is_current", T.BooleanType(), True),
            ]
        )
        return SnapshotTable.create(
            spark,
            target_path,
            schema,
            key_cols=list(snap.key_cols) + ["valid_from"],
            num_buckets=table_kw.pop("num_buckets", snap.num_buckets),
            bucket_cols=table_kw.pop("bucket_cols", list(snap.bucket_cols)),
            sort_cols=table_kw.pop("sort_cols", list(snap.key_cols) + ["valid_from"]),
            lww_order=table_kw.pop("lww_order", [("valid_from", True)]),
            **table_kw,
        )
