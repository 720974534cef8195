"""MERGE INTO over SnapshotTable — bucket-pruned copy-on-write upsert.

The Spark re-expression of the reference's idempotent bulk upsert
``INSERT ... ON CONFLICT (_id) DO UPDATE SET ... = EXCLUDED.*``
(couch2pg/src/importer.js:18-25, 67-84) plus the dbt incremental
``unique_key`` merge + tombstone post-hook
(tests/dbt/package/models/contacts/contacts.sql:2-6).

Algorithm (all DataFrame ops; Catalyst plans the physical side):

1. LWW-dedup the batch to one row per key (precondition for idempotent
   replay — SURVEY.md §7.3 #1).
2. Compute each batch row's bucket; collect the distinct bucket ids (≤
   num_buckets small ints — the only driver-side collect).
3. Read ONLY the affected buckets of the target (file pruning via the
   manifest; untouched buckets are carried over unchanged).
4. Union target-slice ∪ batch and run the same LWW window again, with a
   final "prefer existing row" tiebreak so replaying an already-applied
   batch is a byte-level no-op (exactly-once = at-least-once + idempotent
   apply, SURVEY.md §2.1 S3/S4).
5. Tombstone policy:
   - ``'keep'``  (landing table): winner tombstones remain as rows with
     ``_deleted=true`` (e2e-test.spec.js:203-204);
   - ``'drop'``  (typed models): winner tombstones are removed — the
     ``WHEN MATCHED AND s._deleted THEN DELETE`` clause + suppressed
     insert of never-seen tombstones (contacts.sql:6, SURVEY §2.3 T7).
6. Write replacement files for affected buckets, commit atomically with
   any property updates (checkpoints / epoch markers) in the SAME
   snapshot.

Scale: upsert cost ∝ (batch keys' bucket spread / num_buckets) × table
size. Size ``num_buckets`` so a micro-batch touches a small fraction;
for pure-ingest throughput use ``SnapshotTable.append_delta`` (merge-on-
read) and compact on a cadence. Skew: the union/window shuffles by the
full key (conv_id, turn_idx) — fine-grained — and AQE skew-join handles
the residual (session.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cht_sync_spark.operators.lww import lww_dedup
from cht_sync_spark.tables.format import (
    CommitConflict,
    SnapshotTable,
    Snapshot,
    _conform,
    bucket_expr,
)


@dataclass
class MergeStats:
    version: int
    rows_in_batch: int
    rows_deleted_tombstones: int
    affected_buckets: int
    num_buckets: int
    skew_max_ratio: float
    retries: int = 0


def merge_upsert(
    table: SnapshotTable,
    batch: DataFrame,
    *,
    tombstones: Literal["keep", "drop"] = "keep",
    dedup_batch: bool = True,
    properties_update: dict[str, str] | None = None,
    evolve: bool = True,
    properties_fn=None,
    max_retries: int = 8,
    prefer: Literal["existing", "batch"] = "existing",
    expected_version: int | None = None,
) -> MergeStats:
    """See module docstring. ``prefer`` breaks FULL order-column ties
    between a stored row and a batch row:

    ``expected_version`` pins the merge to a snapshot the CALLER already
    read: when the table has moved past it the merge raises
    ``CommitConflict`` without writing, so a caller whose batch was
    derived FROM the target's state (e.g. an SCD2 chain recompute) never
    applies that derivation against state it did not read. Callers whose
    batch is independent of the target (the landing upsert) leave it
    unset and let the internal retry re-read freely.

    - ``'existing'`` (landing default): replaying an already-applied batch
      is a byte-level no-op (exactly-once = at-least-once + idempotent
      apply);
    - ``'batch'`` (grouped models): a group RECOMPUTE is authoritative —
      it was derived from the CURRENT landing state, so it is at least as
      fresh as any stored row even when the order columns tie (a resumed
      stream re-delivering old batches at new epochs produces exactly such
      ties). Idempotence is preserved because a same-state recompute is
      value-identical.

    Concurrency (S4): the commit pins the snapshot
    the merge READ (``expected_version``); losing the race to another writer
    (e.g. a concurrent compaction or second source stream) redoes the
    read-merge-write against the new tip — the reference's deadlock
    rollback-and-retry (importer.js:132-138) in optimistic-concurrency form.
    The failed attempt's files become unreferenced orphans (same class as
    crash leftovers; cleaned by vacuum, never visible)."""
    last_err: CommitConflict | None = None
    for attempt in range(max_retries):
        try:
            stats = _merge_once(
                table, batch, tombstones=tombstones, dedup_batch=dedup_batch,
                properties_update=properties_update, evolve=evolve,
                properties_fn=properties_fn, prefer=prefer,
                expected_version=expected_version,
            )
            stats.retries = attempt
            return stats
        except CommitConflict as e:
            last_err = e
            # brief jittered backoff: the claim loser otherwise redoes its
            # read-merge-write while the winner is still fsyncing its
            # manifest, burning retries against an invisible in-flight
            # commit (the reference sleeps before its deadlock retry too,
            # importer.js:136)
            import random
            import time as _time

            _time.sleep(0.05 + random.random() * 0.15)
    raise last_err  # type: ignore[misc]


def _merge_once(
    table: SnapshotTable,
    batch: DataFrame,
    *,
    tombstones: Literal["keep", "drop"],
    dedup_batch: bool,
    properties_update: dict[str, str] | None,
    evolve: bool,
    properties_fn,
    prefer: Literal["existing", "batch"] = "existing",
    expected_version: int | None = None,
) -> MergeStats:
    snap = table.snapshot()
    if expected_version is not None and snap.version != expected_version:
        raise CommitConflict(
            f"table moved to v{snap.version} past the caller's pinned "
            f"v{expected_version} before the merge read"
        )
    key = snap.key_cols

    schema = table.evolve_schema(batch.schema) if evolve else snap.schema

    lww = snap.lww_order or [(key[0], True)]
    if dedup_batch:
        batch = lww_dedup(batch, key=key, order=lww)
    batch = _conform(batch, schema)

    # single light aggregation for lineage + affected-bucket discovery
    del_expr = (
        F.sum(F.col("_deleted").cast("long")) if "_deleted" in batch.columns else F.lit(0)
    )
    bstats = (
        batch.withColumn("__b", bucket_expr(snap.bucket_cols, snap.num_buckets))
        .groupBy("__b")
        .agg(F.count("*").alias("n"), del_expr.alias("d"))
        .collect()
    )
    if not bstats:
        if properties_update:
            table.commit(add_files=[], properties_update=properties_update, new_schema=schema)
        return MergeStats(table.current_version(), 0, 0, 0, snap.num_buckets, 0.0)

    affected = sorted(r["__b"] for r in bstats)
    rows_in = int(sum(r["n"] for r in bstats))
    dels = int(sum(r["d"] or 0 for r in bstats))
    sizes = sorted(r["n"] for r in bstats)
    med = sizes[len(sizes) // 2]
    skew = float(sizes[-1]) / float(med or 1)

    target = table.read(buckets=affected)
    target = _conform(target, schema).withColumn("__existing", F.lit(1))
    cdc_batch = batch  # deduped+conformed: the exact change records
    batch = batch.withColumn("__existing", F.lit(0))

    # LWW across old+new; the `prefer` side wins a full order-column tie
    # (existing -> replay no-op; batch -> authoritative group recompute)
    order = list(lww) + [("__existing", prefer == "batch")]
    merged = lww_dedup(target.unionByName(batch), key=key, order=order).drop("__existing")

    if tombstones == "drop":
        merged = merged.where(~F.coalesce(F.col("_deleted"), F.lit(False)))

    write_snap = Snapshot(**{**snap.__dict__, "schema": schema})
    files = table._write_data(merged, write_snap, level="base")
    if snap.properties.get("cdc.enabled") == "true":
        # Change Data Feed (Delta's CDF / table_changes, opt-in per table):
        # a COW merge restates whole buckets, so its added base files are
        # useless as a changelog. Recording the (already deduped+conformed)
        # batch as 'cdc'-level files in the SAME commit gives changes()
        # exact change records for overwrite snapshots — O(batch) extra
        # write, invisible to normal reads (read() lists base/delta only),
        # dropped from the live fold at compaction, retained on disk for
        # exactly the snapshot-retention window (vacuum keeps any file a
        # retained snapshot references).
        files = files + table._write_data(cdc_batch, write_snap, level="cdc")
    props = dict(properties_update or {})
    if properties_fn is not None:
        # post-write, pre-commit: Observation metrics from the write job
        # land in the SAME atomic snapshot as the data
        props.update(properties_fn())
    committed = table.commit(
        add_files=files,
        remove_buckets=set(affected),
        properties_update=props,
        new_schema=schema,
        expected_version=snap.version,
    )
    return MergeStats(committed.version, rows_in, dels, len(affected), snap.num_buckets, skew)


