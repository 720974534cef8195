"""Mergeable-sketch distinct counting: an HLL (DataSketches HyperLogLog)
per group, maintained incrementally from a table's changelog.

The exact form (:class:`~cht_sync_spark.streaming.ivm.DistinctCountConsumer`)
keeps a refcount row per (group, value) — the O(Σ per-group cardinality)
lower bound ANY exact answer needs, with exact retraction. This consumer is
its at-scale complement: O(2^lg_k) bytes per group REGARDLESS of
cardinality, for ±~1% estimates — the standard lakehouse trade for
"distinct users per day over 10^10 events" dashboards.

Why a sketch fits CDC replay unusually well: HLL union is a register-wise
MAX — commutative, associative, and IDEMPOTENT. Re-applying a crash
window's batch is a no-op by algebra (not by bookkeeping), so the consumer
needs no refcount plane, no preimage read, and no retraction recompute.
The price is monotone semantics, stated precisely: the sketch counts
every value DELIVERED in a live physical row through the changelog
("distinct users ever active"), so edits add but deletes never subtract —
state-of-now distinct counting stays with the exact consumer. Under
out-of-order delivery this includes a late-arriving older revision that
the LWW fold immediately shadows (the row was never visible in any
reconciled read, but its value still enters the sketch). Filtering those
losers out would require exactly the preimage read / per-version winner
recompute this consumer exists to avoid, for an approximate monotone
estimate; the over-inclusion only widens the "ever seen" upper bound.
:meth:`reseed` narrows to current winners — the documented semantic
reset. Both consumers are maintained from the same changelog cursor
contract (``consumer.<name>.version`` committed atomically with the
merged sketches).

Scale shape per cycle: changelog scan O(changed files) → one groupBy
sketch-agg over the delta rows → bucket-pruned read of the affected
target buckets → register-max union → COW bucket rewrite. No broadcast of
changed keys, no time-travel preimage read — cheaper than every other
consumer in the engine.

All sketch math is Spark-built-in (``hll_sketch_agg`` / ``hll_union`` /
``hll_sketch_estimate``, JVM-side DataSketches); no Python in the data
path. No DuckDB oracle exists (different sketch family), so correctness
is pinned in pytest against exact distinct counts (tests/test_hll.py).
"""

from __future__ import annotations

import time
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.streaming.cursor import CursorConsumer, start_version
from cht_sync_spark.streaming.ivm import _live
from cht_sync_spark.tables.format import (
    CommitConflict,
    SnapshotTable,
    bucket_expr,
)

__all__ = ["HllDistinctConsumer"]

SKETCH_COL = "sketch"
LGK_PROP = "hll.lg_k"
VALUE_PROP = "hll.value_col"


class HllDistinctConsumer(CursorConsumer):
    """Maintain ``target`` = one HLL sketch per ``group_cols`` over the
    values of ``value_col`` ever seen in live source rows.

    The sketch config (``lg_k``, the value column) is pinned in target
    properties at creation so maintenance can never silently union
    incompatible sketches (the hash-config-pinning discipline of the
    dedup/ANN index planes)."""

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable | str,
        target: SnapshotTable,
        name: str,
        group_cols: list[str],
        value_col: str,
        strict: bool = True,
        max_retries: int = 8,
    ):
        self.spark = spark
        self.source = (
            source if isinstance(source, SnapshotTable) else SnapshotTable(spark, source)
        )
        self.target = target
        self.name = name
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.strict = strict
        self.max_retries = max_retries
        props = target.snapshot().properties
        if LGK_PROP not in props:
            raise ValueError(
                f"target {target.path} was not created by "
                "HllDistinctConsumer.create_target (missing hll.lg_k) — "
                "sketch config must be table-pinned"
            )
        self.lg_k = int(props[LGK_PROP])
        pinned = props.get(VALUE_PROP)
        if pinned is not None and pinned != value_col:
            raise ValueError(
                f"target {target.path} counts distinct {pinned!r}; refusing to "
                f"union sketches over {value_col!r} into it"
            )

    # --------------------------------------------------------------- reads
    def sketches(self, buckets: list[int] | None = None) -> DataFrame:
        return self.target.read_current(buckets=buckets)

    def counts(self, buckets: list[int] | None = None) -> DataFrame:
        """Per-group distinct estimate (long). Bucket-prunable like any
        keyed read; the estimate is computed from the stored registers,
        no source access."""
        return self.sketches(buckets).select(
            *self.group_cols,
            F.hll_sketch_estimate(F.col(SKETCH_COL)).alias("distinct_est"),
        )

    # ---------------------------------------------------------- internals
    def _batch_sketches(self, rows: DataFrame) -> DataFrame:
        """One sketch per group over the live, non-null values of a row
        set — the same aggregate on the incremental and reseed paths."""
        return (
            rows.where(_live(rows) & F.col(self.value_col).isNotNull())
            .groupBy(*self.group_cols)
            .agg(F.hll_sketch_agg(F.col(self.value_col), F.lit(self.lg_k)).alias(SKETCH_COL))
        )

    def _merge(self, batch: DataFrame, tsnap, affected: list[int]) -> DataFrame:
        st = self.target.read(buckets=affected).select(
            *self.group_cols, F.col(SKETCH_COL).alias("__s")
        )
        bt = batch.withColumnRenamed(SKETCH_COL, "__b")
        cond = reduce(
            lambda a, b: a & b,
            [st[g].eqNullSafe(bt[g]) for g in self.group_cols],
        )
        joined = st.join(bt, cond, "full")
        sketch = (
            F.when(st["__s"].isNull(), bt["__b"])
            .when(bt["__b"].isNull(), st["__s"])
            .otherwise(F.hll_union(st["__s"], bt["__b"]))
        )
        return joined.select(
            *[F.coalesce(st[g], bt[g]).alias(g) for g in self.group_cols],
            sketch.alias(SKETCH_COL),
        )

    # ---------------------------------------------------------------- run
    def run_once(self):
        """Apply everything committed since the cursor, or None when caught
        up. Union idempotence makes crash-window replays algebraically
        safe; the pinned cursor commit still serializes same-name racers."""
        last_err: CommitConflict | None = None
        for attempt in range(self.max_retries):
            tip = self.source.current_version()
            from_v = start_version(self.source, self.position())
            if tip <= from_v:
                return None if attempt == 0 else (from_v, tip, 0)
            try:
                ch = self.source.changes(from_v, tip, strict=self.strict).drop(
                    "_change_version", "_change_type"
                )
                batch = self._batch_sketches(ch)
                tsnap = self.target.snapshot()
                affected = sorted(
                    r["__b"]
                    for r in batch.select(
                        bucket_expr(tsnap.bucket_cols, tsnap.num_buckets).alias("__b")
                    )
                    .distinct()
                    .collect()
                )
                if not affected:  # compaction-only / delete-only range
                    self._advance_cursor(tip)
                    return (from_v, tip, 0)
                merged = self._merge(batch, tsnap, affected)
                from cht_sync_spark.tables.format import _conform

                merged = _conform(merged, tsnap.schema)
                files = self.target._write_data(merged, tsnap, level="base")
                self.target.commit(
                    add_files=files,
                    remove_buckets=set(affected),
                    properties_update={self._ckpt_key: str(tip)},
                    expected_version=tsnap.version,
                )
                return (from_v, tip, len(affected))
            except CommitConflict as e:
                last_err = e
                time.sleep(0.05 * (attempt + 1))
        raise last_err  # type: ignore[misc]

    # ------------------------------------------------------------- reseed
    def reseed(self):
        """Rebuild every sketch from the source's CURRENT live state in one
        atomic overwrite that also sets the cursor — bootstrap-over-
        existing and rollback/retention-lapse recovery, like every other
        consumer. NOTE the semantic reset: a reseeded sketch counts values
        in rows live NOW; history seen only through deleted rows is gone
        (monotone 'ever seen' resumes from here)."""
        tip = self.source.current_version()
        agg = self._batch_sketches(self.source.read_current(version=tip))
        props: dict[str, str | None] = {self._ckpt_key: str(tip)}
        props.update(self._foreign_cursor_deletions())
        self.target.overwrite(agg, properties_update=props)
        return tip

    # ---------------------------------------------------------------- DDL
    @classmethod
    def create_target(
        cls,
        spark: SparkSession,
        source: SnapshotTable | str,
        target_path: str,
        group_cols: list[str],
        value_col: str,
        lg_k: int = 12,
        num_buckets: int = 16,
        **table_kw,
    ) -> SnapshotTable:
        """Bootstrap the sketch table: group columns typed from the source
        schema + a binary sketch column; key = group columns (one row per
        group by construction, no LWW order); lg_k and the value column
        pinned in properties."""
        if not 4 <= lg_k <= 21:
            raise ValueError(f"lg_k must be in [4, 21] (DataSketches range), got {lg_k}")
        src = source if isinstance(source, SnapshotTable) else SnapshotTable(spark, source)
        by_name = {f.name: f for f in src.snapshot().schema.fields}
        missing = [c for c in list(group_cols) + [value_col] if c not in by_name]
        if missing:
            raise ValueError(f"columns {missing} not in source schema")
        schema = T.StructType(
            [T.StructField(g, by_name[g].dataType, True) for g in group_cols]
            + [T.StructField(SKETCH_COL, T.BinaryType(), True)]
        )
        props = dict(table_kw.pop("properties", None) or {})
        props[LGK_PROP] = str(lg_k)
        props[VALUE_PROP] = value_col
        return SnapshotTable.create(
            spark, target_path, schema, key_cols=list(group_cols),
            num_buckets=num_buckets, properties=props, **table_kw,
        )
