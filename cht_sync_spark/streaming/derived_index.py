"""Generic changelog-fed derived-row index maintenance.

Several at-scale index planes share one maintenance shape: a source
SnapshotTable's rows each derive a set of INDEX ROWS whose key embeds a
value-dependent component (an LSH band hash, a hyperplane signature),
stored in a SnapshotTable bucketed by that component so probes prune to
their buckets. Because the derived key component CHANGES when the source
row changes, a derived row is immutable once written — an update is
delete + insert of different keys — which preserves the one-key-one-bucket
invariant the merge and the pruning both rely on, and makes invalidation a
pure set-difference:

- per cycle, read the source changelog (O(changed files)), recover each
  changed key's PREIMAGE with the IVM plane's time-travel read
  (bucket-pruned + broadcast semi-join at the cursor version), and LWW-fold
  preimage ∪ changes to the new winner per key;
- the new winner's derived rows -> upserts carrying the winner's LWW order
  columns;
- derived rows the new version no longer produces (every row of a deleted
  source key, every old-value row of an edited one) ->
  **delete-by-absence tombstones** carrying the SAME new order columns, so
  they beat the stale row and the merge (``tombstones='drop'``) physically
  removes it; tombstones carry NULL payload (content-free, the purge-marker
  discipline);
- the cursor commits ATOMICALLY with the merge — one snapshot per cycle.
  No additive state is kept, so crash-window replays are byte-identical by
  plain LWW idempotence; concurrent same-name maintainers are safe, just
  wasteful.

Subclasses define ``derived_key`` (the value-dependent key columns) and
``derived_rows(docs, key)`` (live source rows -> derived rows); see
:mod:`cht_sync_spark.streaming.dedup_index` (MinHash band signatures),
:mod:`cht_sync_spark.streaming.ann_index` (embedding LSH signatures) and
:mod:`cht_sync_spark.streaming.term_index` (postings — which additionally
maintains additive corpus statistics through the ``_cycle_extra`` /
``_extra_props`` hooks; the cursor guard in the pre-commit callback is
what makes that read-modify-write sound, IVM's additive-state rule).

Retention contract: each cycle opens the cursor's snapshot (changelog
diff + preimage read), so with producer ``expire_snapshots(keep_last=k)``
the safe lag is k-1 snapshots; a lapsed cursor or producer rollback is
recovered by :meth:`DerivedIndexConsumer.reseed`.

Reference parity: none — the reference has no derived-index surface
(SURVEY §2.5-class capability); the maintenance pattern is the reference's
own checkpoint-after-commit loop (importer.js:171-172) applied one level
down, like streaming/consumer.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from cht_sync_spark.operators.lww import lww_dedup
from cht_sync_spark.streaming.cursor import start_version
from cht_sync_spark.tables.format import CommitConflict, SnapshotTable, bucket_expr
from cht_sync_spark.tables.merge import merge_upsert

__all__ = ["DerivedIndexConsumer", "DerivedIndexResult"]


class _RangeAlreadyApplied(Exception):
    """A concurrent same-name maintainer already landed this range (the
    cursor advanced under the merge with no CommitConflict) — re-applying
    would be harmless (plain LWW, no additive state) but pointless."""


@dataclass
class DerivedIndexResult:
    from_version: int
    to_version: int
    rows_upserted: int
    rows_deleted: int
    retries: int = 0


class DerivedIndexConsumer:
    #: the value-dependent index key columns, e.g. ["band", "bh"] / ["__sig"]
    derived_key: list[str] = []

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable,
        index: SnapshotTable,
        name: str,
        *,
        strict: bool = True,
        max_retries: int = 8,
    ):
        self.spark = spark
        self.source = source
        self.index = index
        self.name = name
        self.strict = strict
        self.max_retries = max_retries

    # --------------------------------------------------------- subclass API
    def derived_rows(self, docs: DataFrame, key: list[str]) -> DataFrame:
        """LIVE source rows -> derived index rows
        (derived_key..., key..., payload...)."""
        raise NotImplementedError

    def _pre_run(self) -> None:
        """Hook before each run_once attempt loop (e.g. sole-owner check
        for consumers that keep non-idempotent additive state)."""

    def _cycle_extra(self, old: DataFrame, new: DataFrame):
        """Hook computed once per cycle from the preimages and new winners
        (e.g. additive corpus-stat deltas); passed to :meth:`_extra_props`
        and :meth:`_mk_result`."""
        return None

    def _extra_props(self, extra, props: dict[str, str]) -> dict[str, str]:
        """Hook merged into the atomic cycle commit's property update.
        Runs inside the pre-commit callback AFTER the cursor guard, so a
        read-modify-write of additive properties against ``props`` is
        pinned (the cursor can only be at from_v here)."""
        return {}

    def _reseed_props(self, cur: DataFrame, tip: int) -> dict[str, str]:
        """Hook merged into reseed's property update (e.g. recomputed
        corpus stats)."""
        return {}

    def _mk_result(self, from_v: int, tip: int, ups: int, dels: int, attempt: int):
        """Result constructor — subclasses may return a richer type."""
        return DerivedIndexResult(from_v, tip, ups, dels, attempt)

    # ------------------------------------------------------------- cursor
    @property
    def _ckpt_key(self) -> str:
        return f"consumer.{self.name}.version"

    def position(self) -> int:
        v = self.index.snapshot().properties.get(self._ckpt_key)
        return int(v) if v is not None else 0

    def pending_versions(self) -> int:
        return max(0, self.source.current_version() - max(self.position(), 1))

    # ------------------------------------------------------------- deltas
    def _payload_fields(self, src_key: list[str], ocols: list[str]):
        fixed = {*self.derived_key, *src_key, *ocols, "_deleted"}
        return [f for f in self.index.snapshot().schema.fields if f.name not in fixed]

    def _delta(self, from_v: int, tip: int):
        """(index batch, old, new) for the changelog range, or None when
        the range holds no logical changes (compaction-only)."""
        src = self.source
        ch = src.changes(from_v, tip, strict=self.strict).drop(
            "_change_version", "_change_type"
        )
        snap = src.snapshot(from_v)
        key = list(snap.key_cols)
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
        order = (snap.lww_order or [(key[0], True)]) + [("__existing", False)]
        new = lww_dedup(
            old.withColumn("__existing", F.lit(1)).unionByName(
                ch.withColumn("__existing", F.lit(0)), allowMissingColumns=True
            ),
            key=key,
            order=order,
        ).drop("__existing")
        # the preimages and new winners each feed two consumers below (a
        # derived-row side and the absence anti-join) — persist the tiny
        # changed-key frames instead of re-running the fold. The DERIVED
        # frames are persisted too: new_r feeds both the upsert join and
        # the absence anti-join, and derivation is the cycle's expensive
        # stage (md5 minhash permutations, hyperplane signatures) — without
        # the persist it runs once per consumer
        old = old.persist()
        new = new.persist()
        new_r = self.derived_rows(new, key).persist()
        old_r = self.derived_rows(old, key)
        ocols = [c for c, _ in (snap.lww_order or [])]
        winner_order = new.select(*key, *ocols)
        ups = new_r.join(winner_order, on=key).withColumn("_deleted", F.lit(False))
        # delete-by-absence: derived rows the new version no longer
        # produces get tombstones carrying the NEW winner's order values
        # (they must beat the stale row under the index's LWW) with NULL
        # payload — content-free, the purge-marker move
        dk = [*self.derived_key, *key]
        dels = (
            old_r.select(*dk)
            .join(new_r.select(*dk), on=dk, how="left_anti")
            .join(winner_order, on=key)
            .withColumn("_deleted", F.lit(True))
        )
        for f in self._payload_fields(key, ocols):
            dels = dels.withColumn(f.name, F.lit(None).cast(f.dataType))
        batch = ups.unionByName(dels.select(*ups.columns))
        return batch, [old, new, new_r], self._cycle_extra(old, new)

    # ---------------------------------------------------------------- run
    def run_once(self, to_version: int | None = None) -> DerivedIndexResult | None:
        """Index everything committed since the cursor, or None if caught
        up. Derived-row merge and cursor commit in ONE snapshot; a lost
        commit race re-reads the cursor before retrying.

        ``to_version`` pins the cycle's tip to a version the caller
        observed — lets a caller replay a recorded commit history
        cycle-by-cycle (lifecycle fixtures) or keep sibling indexes over
        one source in lockstep (the CmsConsumer rule)."""
        self._pre_run()
        last_err: CommitConflict | None = None
        for attempt in range(self.max_retries):
            tip = to_version if to_version is not None else self.source.current_version()
            from_v = start_version(self.source, self.position())
            if tip <= from_v:
                return None if attempt == 0 else self._mk_result(from_v, tip, 0, 0, attempt)
            d = self._delta(from_v, tip)
            if d is None:  # compaction-only range: advance the cursor
                try:
                    isnap = self.index.snapshot()
                    self.index.commit(
                        add_files=[],
                        properties_update={self._ckpt_key: str(tip)},
                        expected_version=isnap.version,
                    )
                    return self._mk_result(from_v, tip, 0, 0, attempt)
                except CommitConflict as e:
                    last_err = e
                    time.sleep(0.05 * (attempt + 1))
                    continue
            batch, pinned, extra = d

            def _props() -> dict[str, str]:
                # post-write, PRE-COMMIT (same atomic snapshot as the
                # merge): re-read the cursor — a concurrent same-name
                # maintainer that already landed THIS range shows up as an
                # advanced cursor with NO CommitConflict (the merge pinned
                # to the post-racer tip); skip instead of re-landing. A
                # cursor at any OTHER version than from_v means a racer
                # landed a SUB-range: this batch's absence tombstones were
                # diffed against the from_v preimage, so applying them over
                # the racer's rows would strand the racer's derived rows
                # (never tombstoned) — abort and re-derive from the moved
                # cursor (same guard as term_index._props)
                p = self.index.snapshot().properties
                cur = max(int(p.get(self._ckpt_key, 0)), 1)
                if cur >= tip:
                    raise _RangeAlreadyApplied()
                if cur != from_v:
                    raise CommitConflict(
                        f"cursor moved {from_v} -> {cur} under the merge"
                    )
                return {self._ckpt_key: str(tip), **self._extra_props(extra, p)}

            try:
                stats = merge_upsert(
                    self.index,
                    batch,
                    tombstones="drop",
                    prefer="batch",  # a re-derived row is authoritative
                    properties_fn=_props,
                    max_retries=1,  # losses re-check the cursor out here
                )
                if self.position() < tip:
                    # empty batch (the range's winners derive no rows): the
                    # merge's empty path skips properties_fn — commit the
                    # cursor pinned here
                    isnap = self.index.snapshot()
                    self.index.commit(
                        add_files=[],
                        properties_update=_props(),
                        expected_version=isnap.version,
                    )
                return self._mk_result(
                    from_v, tip, stats.rows_in_batch,
                    stats.rows_deleted_tombstones, attempt,
                )
            except _RangeAlreadyApplied:
                return self._mk_result(from_v, tip, 0, 0, attempt)
            except CommitConflict as e:
                last_err = e
                time.sleep(0.05 * (attempt + 1))
            finally:
                for df in pinned:
                    df.unpersist()
        raise last_err  # type: ignore[misc]

    def run(self, max_cycles: int | None = None) -> list[DerivedIndexResult]:
        out: list[DerivedIndexResult] = []
        while max_cycles is None or len(out) < max_cycles:
            r = self.run_once()
            if r is None:
                break
            out.append(r)
        return out

    def reseed(self) -> DerivedIndexResult:
        """Atomic full rebuild from the source's current state — recovery
        for uncrossable changelogs (producer rollback, lapsed cursor)."""
        tip = self.source.current_version()
        snap = self.source.snapshot(tip)
        key = list(snap.key_cols)
        cur = self.source.read_current(version=tip)
        ocols = [c for c, _ in (snap.lww_order or [])]
        full = (
            self.derived_rows(cur, key)
            .join(cur.select(*key, *ocols), on=key)
            .withColumn("_deleted", F.lit(False))
        )
        isnap = self.index.snapshot()
        stale = [
            k for k in isnap.properties
            if k.startswith("consumer.") and k.endswith(".version")
        ]
        self.index.overwrite(
            full.select(*isnap.schema.fieldNames()),
            properties_update={
                **{k: None for k in stale},
                self._ckpt_key: str(tip),
                **self._reseed_props(cur, tip),
            },
        )
        return self._mk_result(0, tip, 0, 0, 0)
