"""Last-writer-wins dedup (SURVEY.md §2.5 I1).

The reference gets LWW for free: the CouchDB feed delivers at most one change
per doc per read (latest winning rev), and the Postgres ``ON CONFLICT DO
UPDATE`` upsert (importer.js:19-25) makes replays converge. Spark sees raw
event streams, so the engine resolves winners explicitly with one window:

    row_number() OVER (PARTITION BY conv_id, turn_idx
                       ORDER BY rev_height DESC, _deleted ASC, _rev DESC,
                                seq DESC)  == 1

Ordering semantics (matched against reference e2e tests):
- higher revision height wins (CouchDB rev vector, 'N-hash');
- at equal height a live edit beats a delete (delete-vs-edit conflict keeps
  the live doc — tests/e2e-test.spec.js:307-328);
- then lexicographically greater rev hash (deterministic conflict winner —
  e2e-test.spec.js:281-305);
- then later seq.

Scale note: the window partitions by the FULL key (conv_id, turn_idx) — a hot
conversation with 10^6 turns spreads over 10^6 window partitions, so the
dedup itself does not skew; only per-conv_id aggregations and the merge join
need salting/AQE (operators/upsert.py, SURVEY.md §2.5 I3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cht_sync_spark.schemas import LWW_ORDER, TRANSCRIPT_KEY


def lww_order_cols(order: Sequence[tuple[str, bool]] = tuple(LWW_ORDER)) -> list[Column]:
    """Window ordering columns from (name, ascending) pairs; nulls last."""
    return [
        (F.col(name).asc_nulls_last() if asc else F.col(name).desc_nulls_last())
        for name, asc in order
    ]


def _max_wins_exprs(df: DataFrame, order: Sequence[tuple[str, bool]]) -> list[Column] | None:
    """Rewrite an (asc/desc, nulls-last) order spec into columns whose
    STRUCT MAX picks the same winner, or None if not expressible.

    desc_nulls_last == max with null-smallest struct ordering directly;
    asc is invertible only for booleans (~). Numeric negation is NOT safe:
    -NaN flips float/double ordering vs the asc_nulls_last window, and under
    Spark 4 ANSI mode negating an integral MIN_VALUE throws
    ARITHMETIC_OVERFLOW — so any non-boolean ascending column falls back to
    the row_number window (max_by/window parity is property-tested in
    tests/test_lww_parity.py).
    """
    types = dict(df.dtypes)
    out: list[Column] = []
    for name, asc in order:
        c = F.col(name)
        if not asc:
            out.append(c)
        elif types.get(name) == "boolean":
            out.append(~c)  # ~null = null -> loses, matching asc_nulls_last
        else:
            return None
    return out


def lww_dedup(
    df: DataFrame,
    key: Sequence[str] = tuple(TRANSCRIPT_KEY),
    order: Sequence[tuple[str, bool]] = tuple(LWW_ORDER),
) -> DataFrame:
    """Keep exactly one winning row per key.

    Idempotent and associative: dedup(a ∪ dedup(b ∪ c)) == dedup(a ∪ b ∪ c),
    which is what makes micro-batch replay and merge-on-read compaction safe
    (the same operator runs batch-level, merge-level, and read-level).

    Physical strategy: when the order spec can be expressed as a struct MAX
    (all columns desc, or asc on invertible types), the winner is computed
    with ``groupBy(key).agg(max_by(row, order_struct))`` — a hash aggregate
    with MAP-SIDE PARTIAL COMBINE, so duplicate-heavy feeds shrink before
    the shuffle and no per-partition sort happens at all. Otherwise falls
    back to the row_number window (full sort per key partition). Both paths
    implement identical winner semantics (asserted equal in tests).
    """
    exprs = _max_wins_exprs(df, order)
    if exprs is not None:
        payload = F.struct(*[F.col(c) for c in df.columns])
        winner = F.max_by(payload, F.struct(*exprs)).alias("__w")
        return df.groupBy(*[F.col(k) for k in key]).agg(winner).select("__w.*")
    w = Window.partitionBy(*key).orderBy(*lww_order_cols(order))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
