"""Count-min sketch maintenance from a changelog — the bounded-state
member of the frequency family.

Where it sits (the engine's frequency/distinct ladder):

- exact per-(group, value) counts: the :class:`DistinctCountConsumer`
  refcount plane — state O(Σ per-group cardinality), supports
  :meth:`~DistinctCountConsumer.topk_values`;
- ever-seen distinct estimate: :class:`HllDistinctConsumer` — O(2^lg_k)
  bytes/group, but MONOTONE (deletes never subtract);
- **this module**: approximate per-(group, value) frequencies at FIXED
  state O(depth x width) rows per group, with EXACT turnstile deletes —
  the classic count-min guarantee (Cormode & Muthukrishnan): estimates
  never undercount, overcount ≤ εN with probability 1-δ for
  width = e/ε, depth = ln(1/δ).

The Spark-first composition is the whole point: a CMS cell is just an
ADDITIVE COUNTER, so the sketch is ``depth`` independent
:class:`AggregateConsumer` instances whose derived group key is the
hashed cell (``pmod(xxhash64(value, seed_i), width)``) and whose
automatic ``n_rows`` support IS the cell value. Updates, value
migrations, deletions, exactly-once crash replays, compaction
invisibility — all inherited verbatim from the additive-IVM machinery
(time-travel preimages make every retraction exact), zero new state
logic. A row whose value is NULL hashes to a per-group null-cell row
that probes never touch (SQL aggregates skip nulls; the row is bounded
bookkeeping, not error).

Config (width/depth/seed/value column) is pinned in every depth table's
properties at create time and re-validated by the constructor and every
probe — maintenance and estimation can never disagree on the hash
(the ann/ivf/dedup config-pinning rule).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cht_sync_spark.streaming.ivm import SUPPORT_COL, AggregateConsumer
from cht_sync_spark.tables.format import SnapshotTable

__all__ = ["CmsConsumer"]


def _cell(value_col: str, seed: int, width: int, hash_fn: str = "xxhash64") -> F.Column:
    # nulls land in a real sentinel cell (-1) probes never target — a
    # NULL group key would complicate the additive table's key handling.
    # hash_fn='md5' (60-bit md5 prefix keyed by the seed) is the
    # ANSI-SQL-replayable variant every hash-based plane offers for
    # DuckDB oracles; xxhash64 stays the at-scale default.
    v = F.col(value_col)
    if hash_fn == "md5":
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), v.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
    elif hash_fn == "xxhash64":
        h = F.xxhash64(v.cast("string"), F.lit(seed))
    else:
        raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
    return (
        F.when(v.isNotNull(), F.pmod(h, F.lit(width)))
        .otherwise(F.lit(-1))
        .cast("int")
    )


class CmsConsumer:
    """``depth`` hashed-cell additive consumers + a min-across-depths
    probe. All sub-consumers share the source; every :meth:`run_once`
    cycle pins them to ONE observed source tip, so a clean cycle leaves
    all depth cursors equal. A crash mid-cycle can still leave them
    skewed (each depth is individually exactly-once) — :meth:`estimate`
    REFUSES to probe while cursors diverge, because the
    "empty cell in any depth proves count 0" claim is false for values
    in a lagging depth's unapplied range; one :meth:`run` reconverges."""

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable | str,
        targets: list[SnapshotTable],
        name: str,
        strict: bool = True,
    ):
        if not targets:
            raise ValueError("need at least one depth table")
        self.spark = spark
        self.targets = targets
        self.name = name
        confs = [self._conf(t) for t in targets]
        if len({json.dumps(c, sort_keys=True) for c in confs}) != 1:
            raise ValueError("depth tables carry diverging cms.* configs")
        c = confs[0]
        if int(c["depth"]) != len(targets):
            raise ValueError(
                f"cms.depth={c['depth']} but {len(targets)} depth tables supplied"
            )
        self.width = int(c["width"])
        self.seed = int(c["seed"])
        self.value_col = c["value"]
        self.group_cols = list(c["groups"])
        self.hash_fn = c["hash"]
        self.subs = [
            AggregateConsumer(
                spark, source, t, f"{name}.d{i}",
                group_cols=self.group_cols
                + [("__cell", _cell(self.value_col, self.seed + i, self.width, self.hash_fn))],
                measures={},
                strict=strict,
            )
            for i, t in enumerate(targets)
        ]

    @staticmethod
    def _conf(t: SnapshotTable) -> dict:
        p = t.snapshot().properties
        try:
            return {
                "width": int(p["cms.width"]),
                "depth": int(p["cms.depth"]),
                "seed": int(p["cms.seed"]),
                "value": p["cms.value"],
                "groups": json.loads(p["cms.groups"]),
                "hash": p.get("cms.hash", "xxhash64"),
            }
        except KeyError as e:
            raise ValueError(
                f"{t.path} is not a cms depth table (missing {e}); create via "
                "CmsConsumer.create_targets"
            ) from e

    # ----------------------------------------------------------------- DDL
    @classmethod
    def create_targets(
        cls,
        spark: SparkSession,
        source: SnapshotTable | str,
        base_path: str,
        group_cols: list[str],
        value: str,
        depth: int = 4,
        width: int = 256,
        seed: int = 7,
        num_buckets: int = 8,
        hash_fn: str = "xxhash64",
    ) -> list[SnapshotTable]:
        if depth <= 0 or width <= 0:
            raise ValueError(f"depth/width must be positive, got {depth}/{width}")
        if hash_fn not in ("xxhash64", "md5"):
            raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
        props = {
            "cms.width": str(width),
            "cms.depth": str(depth),
            "cms.seed": str(seed),
            "cms.value": value,
            "cms.groups": json.dumps(list(group_cols)),
            "cms.hash": hash_fn,
        }
        return [
            AggregateConsumer.create_target(
                spark, source, f"{base_path}/d{i}",
                group_cols=list(group_cols)
                + [("__cell", _cell(value, seed + i, width, hash_fn))],
                measures={},
                num_buckets=num_buckets,
                properties=props,
            )
            for i in range(depth)
        ]

    # ----------------------------------------------------------------- run
    def run_once(self):
        """One cycle per depth, all pinned to ONE source tip observed up
        front — sibling cursors cannot skew within a clean cycle. Depths
        run CONCURRENTLY (each writes its own table, so their commits
        never conflict; each job chain is independent — the T14
        model-level-parallelism argument applied to sketch planes).
        Returns the per-depth results (None where caught up)."""
        from concurrent.futures import ThreadPoolExecutor

        tip = self.subs[0].source.current_version()
        if len(self.subs) == 1:
            return [self.subs[0].run_once(to_version=tip)]
        with ThreadPoolExecutor(
            max_workers=len(self.subs), thread_name_prefix="cms"
        ) as pool:
            futs = [pool.submit(s.run_once, to_version=tip) for s in self.subs]
            return [f.result() for f in futs]

    def run(self, max_cycles: int = 100):
        """Drain every depth to the (shared, re-observed each cycle) tip.
        Returns one result list per depth, same shape as before."""
        results: list[list] = [[] for _ in self.subs]
        for _ in range(max_cycles):
            rs = self.run_once()
            for out, r in zip(results, rs):
                if r is not None:
                    out.append(r)
            if all(r is None for r in rs):
                break
        return results

    def pending_versions(self) -> int:
        return max(s.pending_versions() for s in self.subs)

    # --------------------------------------------------------------- probe
    def estimate(self, values: list) -> DataFrame:
        """Frequency estimates for ``values`` in every group:
        ``(group_cols..., value, est)`` with ``est = min`` over the depth
        tables' matching cells. One-sided: ``est >=`` the true live count
        for every (group, value) present; a (group, value) pair absent
        from the output has estimate 0 (some depth's cell is empty —
        which proves the true count is 0; probes REFUSE while depth
        cursors diverge, so the proof cannot be voided by a lagging
        depth's unapplied range). Cost: d state-table scans joined
        on precomputed cell ids — sketch-sized, zero corpus I/O."""
        if not values:
            raise ValueError("values must be non-empty")
        if any(v is None for v in values):
            raise ValueError("cannot probe null (nulls are never counted)")
        positions = {s.position() for s in self.subs}
        if len(positions) > 1:
            raise RuntimeError(
                f"cms depth cursors diverge ({sorted(positions)}): a crash "
                "mid-cycle left some depths behind, so min-across-depths "
                "estimates could undercount the unapplied range — run() to "
                "reconverge, then probe"
            )
        # Probe values are rendered ENGINE-side: the probe frame carries
        # the source column's actual Spark type and _cell's cast('string')
        # does the rendering — the exact expression maintenance hashed.
        # (Python str(v) diverges from Spark's rendering for
        # bool/timestamp/decimal — 'True' vs 'true' — which would probe
        # the wrong cells and report present values as proven-absent.)
        from pyspark.sql import types as T

        src_schema = self.subs[0].source.snapshot().schema
        vfield = next(
            (f for f in src_schema.fields if f.name == self.value_col), None
        )
        vtype = vfield.dataType if vfield is not None else T.StringType()
        probe = self.spark.createDataFrame(
            [(v,) for v in values],
            T.StructType([T.StructField(self.value_col, vtype, False)]),
        )
        parts = []
        for i, t in enumerate(self.targets):
            cells = probe.select(
                F.col(self.value_col).alias("value"),
                _cell(self.value_col, self.seed + i, self.width, self.hash_fn).alias("__cell"),
            )
            parts.append(
                t.read()
                .join(F.broadcast(cells), "__cell")
                .select(
                    *self.group_cols, "value",
                    F.col(SUPPORT_COL).alias("__n"),
                )
            )
        allhits = parts[0]
        for p in parts[1:]:
            allhits = allhits.unionByName(p)
        d = len(self.targets)
        return (
            allhits.groupBy(*self.group_cols, "value")
            .agg(F.count(F.lit(1)).alias("__hits"), F.min("__n").alias("est"))
            .where(F.col("__hits") == d)  # an empty cell anywhere proves 0
            .drop("__hits")
        )
