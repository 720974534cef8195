"""Table-to-table incremental pipelines: tail a SnapshotTable's changelog.

``ChangelogConsumer`` is the downstream half of CDC composition — the same
relationship the ingest pipeline has to the external changes feed
(reference couch2pg tails CouchDB ``_changes``; a consumer here tails an
ENGINE table the same way, reference-style cursors included). It turns the
lakehouse into a medallion cascade that crosses job boundaries: the ingest
pipeline (own lifecycle) commits the landing table; any number of
independently-scheduled consumers (own lifecycles, own checkpoints)
incrementally derive further tables from it via
:meth:`cht_sync_spark.tables.format.SnapshotTable.changes`.

Exactly-once, without coordination between producer and consumer:

- the consumer's cursor (``consumer.<name>.version`` — the last source
  snapshot version fully applied) lives in the TARGET table's snapshot
  properties and is committed atomically with the derived data it
  describes, exactly like the ingest pipeline's per-source seq checkpoints
  (SURVEY §2.1 S5/S6; reference ``couchdb_progress`` updated in the same
  transaction, importer.js:171-172);
- a crash between reading the changelog and committing leaves the cursor
  unmoved -> the batch replays; the merge is the engine's idempotent LWW
  MERGE, so replay is a byte-level no-op (at-least-once + idempotent
  apply = exactly-once, §7.3 #1);
- work per cycle is O(changed files), not O(source table): ``changes``
  plans from the manifest-name diff and compaction snapshots are invisible,
  so a consumer never re-reads data because the producer compacted.

Scale: at 10^10 rows the consumer's cost profile is the ingest pipeline's —
one keyed shuffle per batch for the LWW fold plus the bucket-pruned merge.
Producer ``expire_snapshots(keep_last=k)`` bounds how far a consumer may
lag: the changelog diff also opens the cursor version itself as the diff
parent, so the safe lag is **k-1 snapshots** (a consumer exactly k behind
finds its parent snapshot expired) — the same retention contract Iceberg
gives incremental readers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.streaming.cursor import CursorConsumer, start_version
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import MergeStats, merge_upsert


@dataclass
class ConsumeResult:
    """One consumed changelog range."""

    from_version: int  # exclusive
    to_version: int  # inclusive
    rows: int  # change rows applied (post transform + LWW dedup)
    merge: MergeStats | None = None  # None for a reseed (overwrite, not merge)


class ChangelogConsumer(CursorConsumer):
    """Incrementally derive ``target`` from ``source``'s changelog.

    ``transform(df) -> DataFrame`` receives the changelog slice (source
    schema + ``_change_version``/``_change_type``) and returns rows for the
    target. It must keep the target's key columns and SHOULD carry
    ``_deleted`` through (or derive it from ``_change_type == 'delete'``)
    so tombstones cascade; identity (None) passes the source rows through
    minus the changelog metadata.

    ``tombstones='keep'`` mirrors a landing table; ``'drop'`` builds a
    live-rows-only derived table (deletes physically removed, reference
    contacts.sql:6).
    """

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable | str,
        target: SnapshotTable,
        name: str,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        tombstones: str = "keep",
        strict: bool = True,
    ):
        self.spark = spark
        self.source = (
            source if isinstance(source, SnapshotTable) else SnapshotTable(spark, source)
        )
        self.target = target
        self.name = name
        self.transform = transform
        self.tombstones = tombstones
        self.strict = strict

    # cursor read/probe and the drain loop come from CursorConsumer

    # ---------------------------------------------------------------- run
    def run_once(self) -> ConsumeResult | None:
        """Consume everything committed since the cursor, or None if the
        consumer is caught up. One changelog scan, one idempotent merge,
        cursor committed atomically with the derived rows."""
        tip = self.source.current_version()
        from_v = start_version(self.source, self.position())
        if tip <= from_v:
            return None
        ch = self.source.changes(from_v, tip, strict=self.strict)
        out = self.transform(ch) if self.transform is not None else ch
        if "_deleted" not in out.columns and "_change_type" in out.columns:
            out = out.withColumn("_deleted", F.col("_change_type") == "delete")
        out = out.drop("_change_version", "_change_type")
        # ONE pass over the changed files: the merge counts the batch itself
        # (MergeStats.rows_in_batch) and its empty-batch path still commits
        # the cursor atomically — no separate count() job, no second scan.
        stats = merge_upsert(
            self.target,
            out,
            tombstones=self.tombstones,  # type: ignore[arg-type]
            properties_update={self._ckpt_key: str(tip)},
        )
        return ConsumeResult(from_v, tip, stats.rows_in_batch, stats)

    def reseed(self) -> ConsumeResult:
        """Full resynchronization for when the changelog is UNCROSSABLE:
        a producer :meth:`~cht_sync_spark.tables.format.SnapshotTable.rollback`
        (strict ``changes()`` refuses it — and an incremental merge could
        never apply it anyway, since restored rows can be LWW-older than
        what the target already holds, so the fold would keep the
        rolled-back values), or a cursor that lagged past the producer's
        snapshot retention (expired diff parent).

        Rebuilds the target from the producer's CURRENT reconciled state in
        ONE atomic overwrite that also advances the cursor — the same
        crash contract as :meth:`run_once`: either the new state and the
        cursor both land or neither does, and a replay converges. The
        transform sees the full state shaped like a changelog slice
        (synthetic ``_change_version`` = tip, ``_change_type`` from
        tombstones), so the same transform serves both paths. Cost is
        O(source current state) — a recovery operation, not the steady
        path."""
        from pyspark.sql import Observation

        tip = self.source.current_version()
        from_v = self.position()
        full = self.source.read_current()  # tombstones kept: cascade below
        deleted = (
            F.coalesce(F.col("_deleted"), F.lit(False))
            if "_deleted" in full.columns
            else F.lit(False)
        )
        shaped = full.withColumn("_change_version", F.lit(tip).cast("long")).withColumn(
            "_change_type", F.when(deleted, F.lit("delete")).otherwise(F.lit("upsert"))
        )
        out = self.transform(shaped) if self.transform is not None else shaped
        if "_deleted" not in out.columns and "_change_type" in out.columns:
            out = out.withColumn("_deleted", F.col("_change_type") == "delete")
        out = out.drop("_change_version", "_change_type")
        if self.tombstones == "drop" and "_deleted" in out.columns:
            out = out.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
        # row count rides the overwrite's own write job (Observation) — no
        # second scan, same pattern as the pipeline's poison counter
        obs = Observation()
        out = out.observe(obs, F.count(F.lit(1)).alias("n"))
        self.target.overwrite(out, properties_update={self._ckpt_key: str(tip)})
        return ConsumeResult(from_v, tip, int(obs.get["n"]), None)

    # ---------------------------------------------------------------- DDL
    @classmethod
    def create_target(
        cls,
        spark: SparkSession,
        source: SnapshotTable | str,
        target_path: str,
        name: str,
        schema: T.StructType | None = None,
        key_cols: list[str] | None = None,
        **table_kw,
    ) -> "SnapshotTable":
        """Bootstrap a target table shaped like the source (schema and key
        inherited unless overridden) — the consumer-side DDL analogue of
        the pipeline's S7 bootstrap."""
        src = source if isinstance(source, SnapshotTable) else SnapshotTable(spark, source)
        snap = src.snapshot()
        # bucket_cols inherit too (a source bucketed by a key PREFIX, e.g.
        # conv_id, must not silently become a full-key-bucketed mirror —
        # that would strip group pruning and point-lookup bucket derivation
        # from every derived table); only valid when the key is inherited
        inherit_buckets = (key_cols or list(snap.key_cols)) == list(snap.key_cols)
        return SnapshotTable.create(
            spark,
            target_path,
            schema or snap.schema,
            key_cols=key_cols or list(snap.key_cols),
            num_buckets=table_kw.pop("num_buckets", snap.num_buckets),
            sort_cols=table_kw.pop("sort_cols", list(snap.sort_cols)),
            lww_order=table_kw.pop("lww_order", list(snap.lww_order)),
            bucket_cols=table_kw.pop(
                "bucket_cols", list(snap.bucket_cols) if inherit_buckets else None
            ),
            **table_kw,
        )
