"""Incrementally-maintained equi-join: ``target = left ⋈ right``.

The missing member of the IVM family: :class:`JoinConsumer` keeps a
materialized N:1 enrichment join (fact rows decorated with dimension
columns — the reference's ``persons.sql`` shape, a doc table joined to
the ``contacts`` model, tests/dbt/package/models/contacts/persons.sql:13-22)
fresh from BOTH inputs' changelogs, at the storage layer rather than the
model plane: the model DAG re-runs a transform over touched groups; this
consumer maintains the joined TABLE with two cursors and O(delta) work.

Semantics. ``on`` must be exactly the RIGHT table's key, so each left row
matches at most one reconciled live right row (N:1 — the dimension-
enrichment join; a general N:M join delta needs multiset counting that
this engine expresses via the model plane instead). The target holds, for
every live left row, the joined row (``how='inner'``: only when a live
right match exists; ``'left'``: always, right columns null when not).
Deleted left rows cascade as target tombstones; a right-side delete
retracts its dependents (inner) or null-outs their right columns (left).

Delta rule (classic view maintenance, specialised to keyed tables — the
N:1 restriction collapses ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB into one recompute set):

- **left-driven**: keys changed in the left changelog range; their
  current rows re-join against right@tip (bucket-pruned preimage-style
  read + broadcast semi-join, the IVM plane's two-level prune);
- **right-driven**: join values changed in the right changelog range
  select their dependent left rows (a broadcast semi-join over the left
  live set — bucket-pruned too when the left table is co-bucketed by the
  join columns, the transcripts layout: landing bucketed by conv_id,
  dim keyed by conv_id). On a NON-co-located layout the honest cost is a
  live-file scan — unless a ``value_index``
  (:class:`~cht_sync_spark.streaming.key_index.JoinKeyIndexConsumer`'s
  join-value → referencing-keys inverted index) is attached, in which
  case the dependents' left buckets come from two bounded index probes;
  the index is used only when its cursor is >= this consumer's left
  cursor (values acquired later belong to the left-driven delta anyway,
  and stale extra index rows only widen the scan — superset, never a
  miss), falling back to the live scan when it lags;
- the affected rows are re-derived FROM SOURCE STATE at the two pinned
  tips; rows the recompute no longer produces (left deletes, inner-join
  match loss) become **delete-by-absence tombstones**, the derived-index
  discipline. The TARGET's LWW order is a consumer-owned monotone cycle
  version (``__join_ver`` = the pinned tip pair) rather than the left
  row's order columns: a right-driven change doesn't move the left row's
  rev/seq, and the engine's tombstone tiebreak (live-beats-dead at equal
  order, schemas.LWW_ORDER) would otherwise pin stale enrichments against
  same-order retractions — while BUMPING the left order would block
  resurrection (an unmatched row re-joining when its dimension appears).
  A strictly-newer cycle always supersedes; a replay of the same range
  writes the same version and byte-identical rows (tie -> no-op); a
  racing same-name consumer that read newer tips wins the fold.

Exactly-once: both cursors (``consumer.<name>.version`` for the left
source, ``consumer.<name>.right.version`` for the right) commit
atomically with the merged rows; no additive state is kept, so a
crash-window replay recomputes from tips ≥ the lost ones and converges
(byte-identical under replay of the same range). Concurrent same-name
maintainers are safe but wasteful, as in derived_index.py.

Scale: per cycle, O(changed files) changelog scans, one bucket-pruned
read per side, one keyed merge into a target bucketed like the left
table. The broadcast of changed keys/join values is O(range's distinct
keys) — a consumer lagging by days should :meth:`reseed`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from cht_sync_spark.operators.lww import lww_dedup
from cht_sync_spark.streaming.cursor import CursorConsumer, start_version
from cht_sync_spark.tables.format import CommitConflict, SnapshotTable, bucket_expr
from cht_sync_spark.tables.merge import MergeStats, merge_upsert

__all__ = ["JoinConsumer", "JoinResult"]


class _RangeAlreadyApplied(Exception):
    """A concurrent same-name maintainer already landed this whole range
    (both cursors at/past our tips under the merge) — skip, don't re-land
    (re-landing would be harmless under the monotone cycle version, just
    wasteful). Same discipline as derived_index.py."""

_CHANGE_META = ["_change_version", "_change_type"]

#: consumer-owned LWW order column on the target: the pinned (left_tip,
#: right_tip) pair packed monotone, so recomputes supersede stored rows
#: and same-range replays tie into byte-no-ops (module docstring).
VER_COL = "__join_ver"


def _cycle_ver(a_tip: int, b_tip: int) -> int:
    return (a_tip << 32) | b_tip


@dataclass
class JoinResult:
    """One consumed (left-range × right-range) maintenance cycle."""

    left_from: int
    left_to: int
    right_from: int
    right_to: int
    rows: int  # rows in the merged batch (recomputed + absence tombstones)
    merge: MergeStats | None = None  # None: cursor-only advance or reseed
    retries: int = 0


def _deleted_col(df: DataFrame) -> F.Column:
    if "_deleted" in df.columns:
        return F.coalesce(F.col("_deleted"), F.lit(False))
    return F.lit(False)


class JoinConsumer(CursorConsumer):
    """Maintain ``target = left JOIN right ON on`` incrementally from both
    sources' changelogs. See module docstring for the full contract."""

    def __init__(
        self,
        spark: SparkSession,
        left: SnapshotTable,
        right: SnapshotTable,
        target: SnapshotTable,
        name: str,
        on: list[str],
        *,
        how: str = "inner",
        right_cols: dict[str, str] | list[str] | None = None,
        tombstones: str = "keep",
        strict: bool = True,
        max_retries: int = 8,
        value_index: SnapshotTable | None = None,
    ):
        if how not in ("inner", "left"):
            raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
        self.spark = spark
        self.left = left
        self.right = right
        self.source = left  # CursorConsumer's probe side
        self.target = target
        self.name = name
        self.on = list(on)
        self.how = how
        self.tombstones = tombstones
        self.strict = strict
        self.max_retries = max_retries

        lsnap, rsnap, tsnap = left.snapshot(), right.snapshot(), target.snapshot()
        if set(self.on) != set(rsnap.key_cols):
            raise ValueError(
                f"on={self.on} must be exactly the right table's key "
                f"{list(rsnap.key_cols)} (the N:1 enrichment contract)"
            )
        missing = [c for c in self.on if c not in lsnap.schema.names]
        if missing:
            raise ValueError(f"left table lacks join columns {missing}")
        if list(tsnap.key_cols) != list(lsnap.key_cols):
            raise ValueError(
                f"target key must equal the left key {list(lsnap.key_cols)}; "
                f"got {list(tsnap.key_cols)}"
            )
        if (
            list(tsnap.bucket_cols) != list(lsnap.bucket_cols)
            or tsnap.num_buckets != lsnap.num_buckets
        ):
            raise ValueError(
                "target must share the left table's bucket layout "
                f"({lsnap.bucket_cols} x {lsnap.num_buckets}) so touched-"
                f"bucket pruning lines up; got {tsnap.bucket_cols} x "
                f"{tsnap.num_buckets}"
            )
        mistyped = [
            (c, lsnap.schema[c].dataType.simpleString(), rsnap.schema[c].dataType.simpleString())
            for c in self.on
            if lsnap.schema[c].dataType != rsnap.schema[c].dataType
        ]
        if mistyped:
            # xxhash64 hashes an int and a long of the same value to
            # DIFFERENT buckets, so a dtype mismatch would silently break
            # bucket pruning on both sides even though the join coerces
            raise ValueError(
                f"join column dtypes differ between left and right: {mistyped}"
            )
        if VER_COL not in tsnap.schema.names or list(tsnap.lww_order[:1]) != [
            (VER_COL, False)
        ]:
            raise ValueError(
                f"target must carry {VER_COL} as its leading (descending) LWW "
                "order column — create it with JoinConsumer.create_target"
            )
        self._right_cols = self._norm_right_cols(lsnap, rsnap, right_cols)
        undeclared = [
            t for t in self._right_cols.values() if t not in tsnap.schema.names
        ]
        if undeclared:
            # the merge would otherwise silently schema-evolve the target
            # on the first cycle, leaving every pre-existing row null
            raise ValueError(
                f"right_cols target names {undeclared} are not in the target "
                "schema — create the target with the same right_cols"
            )
        # co-bucketed fast path: the left bucket id is a pure function of
        # the join columns, so right-driven deltas prune the left scan
        self._colocated = set(lsnap.bucket_cols) <= set(self.on)
        self.value_index = value_index
        if value_index is not None:
            iks = list(value_index.snapshot().key_cols)
            if iks != [*self.on, *lsnap.key_cols]:
                raise ValueError(
                    f"value_index key must be {[*self.on, *lsnap.key_cols]} "
                    f"(join values + left key); got {iks}"
                )

    def _norm_right_cols(self, lsnap, rsnap, right_cols) -> dict[str, str]:
        """right column -> target column name for the enrichment payload.
        Default (None): every right value column whose name is free on the
        left — shared bookkeeping columns (rev_height, seq, ...) are the
        LEFT row's and are not enrichment. Explicit selections validate
        strictly instead."""
        value_cols = [c for c in rsnap.schema.names if c not in self.on and c != "_deleted"]
        if right_cols is None:
            out = {c: c for c in value_cols if c not in lsnap.schema.names}
        elif isinstance(right_cols, dict):
            out = dict(right_cols)
        else:
            out = {c: c for c in right_cols}
        bad = [c for c in out if c not in value_cols]
        if bad:
            raise ValueError(f"right_cols {bad} not value columns of the right table")
        clash = [t for t in out.values() if t in lsnap.schema.names]
        if clash:
            raise ValueError(f"right_cols target names {clash} collide with left columns")
        return out

    # ------------------------------------------------------------- cursors
    # left cursor = the mixin's consumer.<name>.version; right side below
    @property
    def _rkey(self) -> str:
        return f"consumer.{self.name}.right.version"

    def right_position(self) -> int:
        v = self.target.snapshot().properties.get(self._rkey)
        return int(v) if v is not None else 0

    def _index_covers(self, a_from: int) -> bool:
        """Is the attached value index fresh enough to answer the reverse
        delta soundly? Its (sole maintaining) cursor must be at or past
        OUR left cursor — see the module docstring's freshness contract."""
        props = self.value_index.snapshot().properties
        curs = [
            int(v)
            for k, v in props.items()
            if k.startswith("consumer.") and k.endswith(".version")
        ]
        return bool(curs) and max(curs) >= a_from

    def pending_versions(self) -> int:
        """Lag probe across BOTH inputs (driver metadata only)."""
        left_pending = super().pending_versions()
        right_pending = max(
            0, self.right.current_version() - max(self.right_position(), 1)
        )
        return left_pending + right_pending

    # ---------------------------------------------------------------- run
    def run_once(self) -> JoinResult | None:
        """Consume everything committed on either side since the cursors,
        or None when caught up on both."""
        last_err: CommitConflict | None = None
        for attempt in range(self.max_retries):
            a_tip = self.left.current_version()
            b_tip = self.right.current_version()
            a_from = start_version(self.left, self.position())
            b_from = start_version(self.right, self.right_position())
            if a_tip <= a_from and b_tip <= b_from:
                return None if attempt == 0 else JoinResult(
                    a_from, a_tip, b_from, b_tip, 0, None, attempt
                )
            try:
                return self._apply(a_from, a_tip, b_from, b_tip, attempt)
            except _RangeAlreadyApplied:
                # a concurrent same-name maintainer covered this whole
                # range: the state is at least as fresh as our derivation
                return JoinResult(a_from, a_tip, b_from, b_tip, 0, None, attempt)
            except CommitConflict as e:
                last_err = e
                time.sleep(0.05 * (attempt + 1))
        raise last_err  # type: ignore[misc]

    def _apply(self, a_from: int, a_tip: int, b_from: int, b_tip: int, attempt: int) -> JoinResult:
        lsnap = self.left.snapshot(a_tip)
        akey = list(lsnap.key_cols)
        pinned: list[DataFrame] = []  # each changelog slice feeds 2-4 jobs
        try:
            return self._apply_pinned(
                a_from, a_tip, b_from, b_tip, attempt, lsnap, akey, pinned
            )
        finally:
            for df in pinned:
                df.unpersist()

    def _apply_pinned(
        self, a_from, a_tip, b_from, b_tip, attempt, lsnap, akey, pinned
    ) -> JoinResult:
        ka: DataFrame | None = None
        cha: DataFrame | None = None
        a_buckets: set[int] = set()
        if a_tip > a_from:
            cha = self.left.changes(a_from, a_tip, strict=self.strict).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            pinned.append(cha)
            ka = cha.select(*akey).distinct()
            a_buckets = {
                r["__b"]
                for r in cha.select(
                    bucket_expr(lsnap.bucket_cols, lsnap.num_buckets).alias("__b")
                )
                .distinct()
                .collect()
            }
            if not a_buckets:
                ka = None  # compaction-only left range

        jb: DataFrame | None = None
        b_buckets: set[int] | None = None  # left-layout buckets of ΔB, if derivable
        if b_tip > b_from:
            chb = self.right.changes(b_from, b_tip, strict=self.strict).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            pinned.append(chb)
            jb = chb.select(*self.on).distinct()
            if self._colocated:
                b_buckets = {
                    r["__b"]
                    for r in chb.select(
                        bucket_expr(lsnap.bucket_cols, lsnap.num_buckets).alias("__b")
                    )
                    .distinct()
                    .collect()
                }
                if not b_buckets:
                    jb = None  # compaction-only right range
            elif self.value_index is not None and self._index_covers(a_from):
                from cht_sync_spark.streaming.key_index import value_ref_buckets

                b_buckets = set(value_ref_buckets(self.value_index, jb, lsnap))
                if not b_buckets:
                    # empty right range, or changed values with no live
                    # dependents (any dependent acquired inside ΔA is the
                    # left-driven half's job)
                    jb = None
            elif jb.limit(1).isEmpty():  # one O(changed files) probe
                jb = None

        if ka is None and jb is None:  # no logical changes on either side
            self._advance_cursors({self._ckpt_key: a_tip, self._rkey: b_tip})
            return JoinResult(a_from, a_tip, b_from, b_tip, 0, None, attempt)

        # ---- affected left rows: ONE scan, pruned to the union of both
        # halves' buckets (full live scan only for a non-co-located ΔB)
        buckets: list[int] | None
        if jb is not None and b_buckets is None:
            buckets = None  # reverse delta needs the live file set
        else:
            buckets = sorted(a_buckets | (b_buckets or set()))
        acur = self.left.read_current(version=a_tip, buckets=buckets)
        marks, pred = acur, F.lit(False)
        if ka is not None:
            marks = marks.join(
                F.broadcast(ka.withColumn("__ha", F.lit(1))), on=akey, how="left"
            )
            pred = pred | F.col("__ha").isNotNull()
        if jb is not None:
            marks = marks.join(
                F.broadcast(jb.withColumn("__hb", F.lit(1))), on=self.on, how="left"
            )
            pred = pred | F.col("__hb").isNotNull()
        affected = (
            marks.where(pred)
            .drop("__ha", "__hb")
            .persist(StorageLevel.MEMORY_AND_DISK)  # feeds 3 jobs below
        )
        pinned.append(affected)
        # ---- right-side pruned read: the affected rows' join values map
        # to right buckets (bucket_cols ⊆ key = on); the collect is bounded
        # by the right table's modulus
        rsnap = self.right.snapshot(b_tip)
        rb = sorted(
            r["__b"]
            for r in affected.select(
                bucket_expr(rsnap.bucket_cols, rsnap.num_buckets).alias("__b")
            )
            .distinct()
            .collect()
        )
        rproj = [F.col(c).alias(t) for c, t in self._right_cols.items()]
        if rb:
            blive = self.right.read_current(
                version=b_tip, drop_tombstones=True, buckets=rb
            ).select(*self.on, *rproj)
        else:
            # affected set is empty (all changed keys purged, or ΔB values
            # with no dependents): nothing to re-derive — only ghost
            # deletes below may remain, so skip the right scan entirely.
            bschema = T.StructType(
                [rsnap.schema[c] for c in self.on]
                + [
                    T.StructField(t, rsnap.schema[c].dataType, True)
                    for c, t in self._right_cols.items()
                ]
            )
            blive = self.spark.createDataFrame([], bschema)
        alive = affected.where(~_deleted_col(affected))
        joined = alive.join(blive, on=self.on, how=self.how)
        # rows the recompute no longer produces -> absence tombstones (left
        # deletes; inner-join match loss). The monotone VER_COL stamped
        # below is what makes them supersede the stored rows; the left
        # order columns they carry are payload, not the tiebreak.
        dead = (
            affected.join(joined.select(*akey), on=akey, how="left_anti")
            .withColumn("_deleted", F.lit(True))
        )
        batch = joined.unionByName(dead, allowMissingColumns=True)
        if ka is not None:
            # ghost deletes: changed keys with NO row in the current read —
            # a left-side PURGE (content-free cdc delete markers,
            # format.py purge()). The marker rows carry the key + a bumped
            # LWW order, so they cascade as tombstones here.
            assert cha is not None
            ghosts = (
                lww_dedup(
                    cha.where(F.col("_change_type") == "delete").drop(*_CHANGE_META),
                    key=akey,
                    order=lsnap.lww_order or [(akey[0], True)],
                )
                .join(affected.select(*akey), on=akey, how="left_anti")
                .withColumn("_deleted", F.lit(True))
            )
            batch = batch.unionByName(ghosts, allowMissingColumns=True)
        batch = batch.withColumn(
            VER_COL, F.lit(_cycle_ver(a_tip, b_tip)).cast("long")
        ).persist(StorageLevel.MEMORY_AND_DISK)  # merge runs 2+ jobs over it
        pinned.append(batch)

        def _props() -> dict[str, str]:
            # post-write, PRE-COMMIT (same atomic snapshot as the merge):
            # re-read both cursors. A concurrent same-name maintainer that
            # covered this whole range shows as advanced cursors with no
            # CommitConflict — skip rather than re-land. Cursors at any
            # OTHER position mean a racer landed a different range: this
            # batch was derived against tips the cursor no longer reflects
            # (its stale enrichments could otherwise pin — the racer's
            # newer rows carry a ver our next cycle would never revisit,
            # since the ranges are consumed) — abort and re-derive.
            p = self.target.snapshot().properties
            cur_a = max(int(p.get(self._ckpt_key, 0)), 1)
            cur_b = max(int(p.get(self._rkey, 0)), 1)
            if cur_a >= a_tip and cur_b >= b_tip:
                raise _RangeAlreadyApplied()
            if cur_a != a_from or cur_b != b_from:
                raise CommitConflict(
                    f"cursors moved ({a_from},{b_from}) -> ({cur_a},{cur_b}) "
                    "under the merge"
                )
            return {self._ckpt_key: str(a_tip), self._rkey: str(b_tip)}

        stats = merge_upsert(
            self.target,
            batch,
            tombstones=self.tombstones,  # type: ignore[arg-type]
            dedup_batch=False,  # unique per key: reconciled N:1 recompute
            properties_fn=_props,
            max_retries=1,  # a lost race re-checks the cursors out in run_once
        )
        if self.position() < a_tip or self.right_position() < b_tip:
            # empty batch (merge's empty path skips properties_fn): commit
            # the cursors pinned
            self._advance_cursors({self._ckpt_key: a_tip, self._rkey: b_tip})
        return JoinResult(
            a_from, a_tip, b_from, b_tip, stats.rows_in_batch, stats, attempt
        )

    # ------------------------------------------------------------- reseed
    def reseed(self) -> JoinResult:
        """Full rebuild from both sources' CURRENT reconciled state in one
        atomic overwrite that also sets both cursors — the recovery path
        for a lapsed cursor, a producer rollback, or adoption of a target
        built elsewhere. Clears foreign cursors (ownership takeover)."""
        a_tip = self.left.current_version()
        b_tip = self.right.current_version()
        a_from, b_from = self.position(), self.right_position()
        acur = self.left.read_current(version=a_tip)
        blive = self.right.read_current(version=b_tip, drop_tombstones=True).select(
            *self.on, *[F.col(c).alias(t) for c, t in self._right_cols.items()]
        )
        out = acur.where(~_deleted_col(acur)).join(blive, on=self.on, how=self.how)
        if self.tombstones == "keep":
            dead = acur.where(_deleted_col(acur))
            out = out.unionByName(dead, allowMissingColumns=True)
        out = out.withColumn(VER_COL, F.lit(_cycle_ver(a_tip, b_tip)).cast("long"))
        props: dict[str, str | None] = {self._ckpt_key: str(a_tip)}
        props.update(self._foreign_cursor_deletions())  # ownership takeover
        props[self._rkey] = str(b_tip)  # AFTER: the deletion sweep matches it
        self.target.overwrite(out, properties_update=props)
        return JoinResult(a_from, a_tip, b_from, b_tip, -1, None)

    # ---------------------------------------------------------------- DDL
    @classmethod
    def create_target(
        cls,
        spark: SparkSession,
        left: SnapshotTable,
        right: SnapshotTable,
        target_path: str,
        on: list[str],
        right_cols: dict[str, str] | list[str] | None = None,
        **table_kw,
    ) -> SnapshotTable:
        """Bootstrap the joined table: left schema + the right value
        columns (nullable — absent under ``how='left'`` misses), key /
        buckets / sort / LWW order inherited from the left table so the
        merge's bucket pruning and tie-breaking line up."""
        lsnap, rsnap = left.snapshot(), right.snapshot()
        shim = cls.__new__(cls)  # reuse the validation/normalisation only
        shim.on = list(on)
        rmap = cls._norm_right_cols(shim, lsnap, rsnap, right_cols)
        rfields = {f.name: f for f in rsnap.schema.fields}
        fields = list(lsnap.schema.fields) + [
            T.StructField(t, rfields[c].dataType, True) for c, t in rmap.items()
        ]
        if "_deleted" not in lsnap.schema.names:
            # tombstone carrier: the merge projects the batch onto the
            # target schema, so absence tombstones need the column declared
            fields.append(T.StructField("_deleted", T.BooleanType(), True))
        fields.append(T.StructField(VER_COL, T.LongType(), True))
        return SnapshotTable.create(
            spark,
            target_path,
            T.StructType(fields),
            key_cols=list(lsnap.key_cols),
            num_buckets=table_kw.pop("num_buckets", lsnap.num_buckets),
            bucket_cols=table_kw.pop("bucket_cols", list(lsnap.bucket_cols)),
            sort_cols=table_kw.pop("sort_cols", list(lsnap.sort_cols)),
            # consumer-owned monotone cycle version (module docstring):
            # recomputes supersede, same-range replays tie into no-ops
            lww_order=[(VER_COL, False)],
            **table_kw,
        )
