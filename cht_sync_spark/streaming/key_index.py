"""Join-value -> referencing-keys inverted index.

The scale path for :class:`~cht_sync_spark.streaming.join.JoinConsumer`'s
reverse delta on NON-co-located layouts: when the left (fact) table is not
bucketed by the join columns, a right-side (dimension) change must find
its dependent left rows, which is a live-file scan of the left table per
cycle. This index inverts that lookup — one row per live (join value,
left key), keyed ``(value..., left_key...)`` and BUCKETED BY THE VALUE, so
a changed dimension key prunes to its value's files and the referenced
left BUCKETS fall out of the stored left-key columns (the left bucket id
is a pure function of the left key, which every index row carries — no
payload column needed).

Maintenance is the generic derived-row discipline
(:mod:`cht_sync_spark.streaming.derived_index`): the value columns are a
value-dependent key component, so a left row's value flip is delete +
insert of different index keys, invalidation is delete-by-absence, purges
cascade from the changelog's content-free markers, and the cursor commits
atomically with the merge.

Freshness contract for the join probe: the index answers "which left
buckets hold rows with value j *as of left version v*" soundly whenever
its cursor is **>= the join consumer's left cursor (a_from)** — any value
acquired after a_from belongs to the join's own left-driven delta range
and is recomputed there regardless, and a stale extra index row only
widens the pruned scan (superset, never a miss).
:meth:`cht_sync_spark.streaming.join.JoinConsumer` checks exactly this
and falls back to the live scan when the index lags.

Reference parity: none (SURVEY §2.5-class capability) — this is the
secondary-index half of what a relational engine gets from an index on
the fact table's foreign-key column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.streaming.derived_index import DerivedIndexConsumer
from cht_sync_spark.tables.format import SnapshotTable, bucket_expr

__all__ = ["JoinKeyIndexConsumer", "value_ref_buckets"]


class JoinKeyIndexConsumer(DerivedIndexConsumer):
    """Maintain the (value..., left_key...) inverted index from the left
    table's changelog. ``derived_key`` (the value columns) is derived from
    the index table's key shape at construction."""

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
        super().__init__(spark, source, index, name, strict=strict, max_retries=max_retries)
        ssnap, isnap = source.snapshot(), index.snapshot()
        skey = list(ssnap.key_cols)
        vals = [c for c in isnap.key_cols if c not in skey]
        if list(isnap.key_cols) != [*vals, *skey] or not vals:
            raise ValueError(
                f"index key must be (value..., source_key...); got {list(isnap.key_cols)} "
                f"for source key {skey}"
            )
        if list(isnap.bucket_cols) != vals:
            raise ValueError(
                f"index must be bucketed by the value columns {vals} so probes "
                f"prune; got {list(isnap.bucket_cols)}"
            )
        self.derived_key = vals

    def derived_rows(self, docs: DataFrame, key: list[str]) -> DataFrame:
        live = docs
        if "_deleted" in docs.columns:
            live = docs.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
        for c in self.derived_key:  # null values match nothing — never indexed
            live = live.where(F.col(c).isNotNull())
        return live.select(*self.derived_key, *key)

    # --------------------------------------------------------------- setup
    @classmethod
    def create_index(
        cls,
        spark: SparkSession,
        source: SnapshotTable,
        path: str,
        value_cols: list[str],
        *,
        num_buckets: int = 16,
    ) -> SnapshotTable:
        """Empty value-bucketed index wired to the source's key and LWW
        spec; bootstrap = run the consumer (history is one range)."""
        snap = source.snapshot()
        overlap = [c for c in value_cols if c in snap.key_cols]
        if overlap:
            raise ValueError(
                f"value columns {overlap} are part of the source key — rows "
                "with a key-derived value never move and need no index"
            )
        missing = [c for c in value_cols if c not in snap.schema.names]
        if missing:
            raise ValueError(f"source lacks value columns {missing}")
        fields = [
            T.StructField(c, snap.schema[c].dataType, True) for c in value_cols
        ] + [T.StructField(k, snap.schema[k].dataType, True) for k in snap.key_cols]
        for c, _ in snap.lww_order or []:
            if c not in snap.key_cols and c not in value_cols and c != "_deleted":
                fields.append(T.StructField(c, snap.schema[c].dataType, True))
        fields.append(T.StructField("_deleted", T.BooleanType(), True))
        return SnapshotTable.create(
            spark, path, T.StructType(fields),
            key_cols=[*value_cols, *snap.key_cols],
            bucket_cols=list(value_cols),
            num_buckets=num_buckets,
            sort_cols=[*value_cols, *snap.key_cols],
            lww_order=list(snap.lww_order or []),
        )


def value_ref_buckets(
    index: SnapshotTable, values: DataFrame, left_snap
) -> list[int]:
    """Distinct LEFT-table bucket ids referenced by the given join values —
    the probe side. Two bounded steps: the values' index buckets prune the
    index read (collect <= index modulus), then the matching rows' stored
    left-key columns derive the left buckets (collect <= left modulus)."""
    isnap = index.snapshot()
    vb = sorted(
        {
            r["__b"]
            for r in values.select(
                bucket_expr(isnap.bucket_cols, isnap.num_buckets).alias("__b")
            )
            .distinct()
            .collect()
        }
    )
    if not vb:
        return []
    vals = list(isnap.bucket_cols)
    rows = index.read_current(drop_tombstones=True, buckets=vb).join(
        F.broadcast(values.select(*vals).distinct()), on=vals, how="left_semi"
    )
    return sorted(
        {
            r["__b"]
            for r in rows.select(
                bucket_expr(left_snap.bucket_cols, left_snap.num_buckets).alias("__b")
            )
            .distinct()
            .collect()
        }
    )
