"""CDC-maintained embedding ANN index: updates and deletes, not just appends.

``functions/similarity.py`` ships the persisted signature-bucketed LSH
index (``build_ann_index`` + ``ann_index_topk``) and an APPEND-ONLY
incremental path (``ann_index_append``), whose docstring states the
limitation honestly: an UPDATED vector can change signature and therefore
bucket, so its stale row would survive in its old bucket (bucket-pruned
probes cannot see across buckets to reconcile), and deletes have no path
at all short of a rebuild.

This module closes that gap with the generic changelog-fed derived-index
machinery (:mod:`cht_sync_spark.streaming.derived_index`): the index is a
SnapshotTable keyed (``__sig``, vec key) and bucketed by ``__sig`` — the
signature is part of the ROW KEY, so a re-embedded vector's new row is a
NEW key and its stale row in the old signature's bucket is invalidated by
a delete-by-absence tombstone derived from the source changelog's
preimage diff (physically dropped at the merge). Deleted vectors lose
their row the same way. Cost per cycle is O(changed vectors); crash-window
replays are idempotent (plain LWW, no additive state).

When a vector's update KEEPS its signature, the (sig, key) row key is
unchanged and the upsert simply overwrites the payload embedding with the
fresher LWW winner — exact re-ranking always sees current vectors.

Plane parameters are committed in the index table properties at
:meth:`AnnIndexConsumer.create_index` (same contract as
``build_ann_index``), so maintenance and probes can never diverge.
:func:`ann_index_search` queries with the same margin-aware multiprobe as
``ann_index_topk`` but reads through ``read_current`` (LWW fold +
tombstone drop) — correct over MOR delta files between compactions.

Reference parity: none (SURVEY §2.5-class capability); the maintenance
pattern is streaming/consumer.py's applied to the similarity plane.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from cht_sync_spark.functions.similarity import (
    assign_cells,
    cosine_topk,
    lsh_signature,
    make_planes,
    probe_plan,
)
from cht_sync_spark.streaming.derived_index import DerivedIndexConsumer, DerivedIndexResult
from cht_sync_spark.tables.format import SnapshotTable

__all__ = [
    "AnnIndexConsumer",
    "AnnIndexResult",
    "IvfIndexConsumer",
    "ann_index_search",
    "ivf_index_search",
]

AnnIndexResult = DerivedIndexResult

_PLANES = "ann.planes"
_N_PLANES = "ann.n_planes"
_CENTS = "ivf.centroids"


def _cents_of(snap) -> list[list[float]]:
    try:
        return json.loads(snap.properties[_CENTS])
    except KeyError:
        raise ValueError(
            "not an IVF index: missing ivf.centroids — create it with "
            "IvfIndexConsumer.create_index"
        ) from None


def _planes_of(snap) -> tuple[list[list[float]], int]:
    p = snap.properties
    try:
        return json.loads(p[_PLANES]), int(p[_N_PLANES])
    except KeyError as e:
        raise ValueError(
            "not an ANN index: missing plane property "
            f"{e} — create it with AnnIndexConsumer.create_index"
        ) from None


class AnnIndexConsumer(DerivedIndexConsumer):
    derived_key = ["__sig"]

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable,
        index: SnapshotTable,
        name: str,
        *,
        vec_col: str = "embedding",
        strict: bool = True,
        max_retries: int = 8,
    ):
        super().__init__(spark, source, index, name, strict=strict, max_retries=max_retries)
        self.vec_col = vec_col

    def derived_rows(self, docs: DataFrame, key: list[str]) -> DataFrame:
        planes, n_planes = _planes_of(self.index.snapshot())
        live = (
            docs.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
            if "_deleted" in docs.columns
            else docs
        )
        # null/absent embeddings derive no rows (an emptied vector drops
        # out of the index entirely via absence)
        return live.where(F.col(self.vec_col).isNotNull()).select(
            lsh_signature(F.col(self.vec_col), n_planes, planes).alias("__sig"),
            *key,
            F.col(self.vec_col),
        )

    # --------------------------------------------------------------- setup
    @classmethod
    def create_index(
        cls,
        spark: SparkSession,
        source: SnapshotTable,
        path: str,
        *,
        vec_col: str = "embedding",
        n_planes: int = 8,
        planes: list[list[float]] | None = None,
        dim: int | None = None,
        num_buckets: int = 16,
    ) -> SnapshotTable:
        """Empty signature-bucketed index wired to the source's key and LWW
        spec, planes committed in table properties (build_ann_index's
        contract); bootstrap = run the consumer (history is one range)."""
        if planes is None:
            if dim is None:
                raise ValueError("create_index needs planes or dim")
            planes = make_planes(dim, n_planes)
        snap = source.snapshot()
        fields = [T.StructField("__sig", T.LongType(), True)]
        for k in snap.key_cols:
            fields.append(T.StructField(k, snap.schema[k].dataType, True))
        fields.append(T.StructField(vec_col, snap.schema[vec_col].dataType, True))
        for c, _ in snap.lww_order or []:
            if c not in snap.key_cols and c not in ("__sig", vec_col, "_deleted"):
                fields.append(T.StructField(c, snap.schema[c].dataType, True))
        fields.append(T.StructField("_deleted", T.BooleanType(), True))
        return SnapshotTable.create(
            spark, path, T.StructType(fields),
            key_cols=["__sig", *snap.key_cols],
            bucket_cols=["__sig"],
            num_buckets=num_buckets,
            sort_cols=["__sig", *snap.key_cols],
            lww_order=list(snap.lww_order or []),
            properties={_PLANES: json.dumps(planes), _N_PLANES: str(len(planes))},
        )


class IvfIndexConsumer(DerivedIndexConsumer):
    """CDC-maintained IVF coarse index — the same update/delete gap-closer
    :class:`AnnIndexConsumer` is for the LSH index, applied to the
    cell-bucketed form (``functions/similarity.py build_ivf_index`` is a
    one-shot build; a re-embedded vector can change cells, so its stale
    row would survive in its old cell's bucket, and deletes have no path
    short of a rebuild). ``__cell`` joins the ROW KEY (a cell move is
    delete + insert of different keys), buckets stay cell-derived so
    probes prune, and stale rows die by the shared delete-by-absence
    machinery. Centroids are committed in the index properties at
    :meth:`create_index` — maintenance assigns every batch against the
    SAME centroids the build used (``assign_cells``), so incremental and
    rebuilt indexes agree exactly (centroid drift/re-clustering is a
    rebuild-and-swap, the standard IVF operational answer)."""

    derived_key = ["__cell"]

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable,
        index: SnapshotTable,
        name: str,
        *,
        vec_col: str = "embedding",
        strict: bool = True,
        max_retries: int = 8,
    ):
        super().__init__(spark, source, index, name, strict=strict, max_retries=max_retries)
        self.vec_col = vec_col
        self._cents_cache: list[list[float]] | None = None

    def _cents(self) -> list[list[float]]:
        # centroids are frozen for the index's lifetime (create_index
        # commits them once; re-clustering is rebuild-and-swap), so parse
        # the JSON once per consumer — derived_rows runs twice per cycle,
        # and at the 65k-cell design point the list is megabytes
        if self._cents_cache is None:
            self._cents_cache = _cents_of(self.index.snapshot())
        return self._cents_cache

    def derived_rows(self, docs: DataFrame, key: list[str]) -> DataFrame:
        live = (
            docs.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
            if "_deleted" in docs.columns
            else docs
        )
        live = live.where(F.col(self.vec_col).isNotNull())
        return assign_cells(live, self._cents(), self.vec_col, key).select(
            "__cell", *key, F.col(self.vec_col)
        )

    # --------------------------------------------------------------- setup
    @classmethod
    def create_index(
        cls,
        spark: SparkSession,
        source: SnapshotTable,
        path: str,
        *,
        vec_col: str = "embedding",
        n_cells: int = 16,
        centroids: list[list[float]] | None = None,
        num_buckets: int = 16,
        cent_hash: str = "xxhash64",
        source_version: int | None = None,
        refine_rounds: int = 0,
    ) -> SnapshotTable:
        """Empty cell-bucketed index wired to the source's key and LWW
        spec, centroids committed in table properties (build_ivf_index's
        contract). Default centroids = the deterministic smallest-hash
        sample of the source's CURRENT live vectors (ivf_assign's rule;
        ``cent_hash='md5'`` for the DuckDB-replayable ordering), or of the
        live state at ``source_version`` when given — pins the sample to a
        recorded snapshot so index creation is reproducible over a source
        that keeps moving; pass ``centroids`` to pin an external/k-means
        set, or ``refine_rounds > 0`` to Lloyd-refine the sampled init
        against the same pinned state (functions/similarity.py
        refine_ivf_centroids — deterministic training). Bootstrap = run
        the consumer (history is one range)."""
        snap = source.snapshot()
        if centroids is None:
            key0 = snap.key_cols[0]
            cent_order = (
                F.md5(F.col(key0).cast("string"))
                if cent_hash == "md5"
                else F.xxhash64(F.col(key0).cast("string"))
            )
            live = source.read_current(
                version=source_version, drop_tombstones=True
            ).where(F.col(vec_col).isNotNull())
            centroids = [
                [float(x) for x in r[0]]
                for r in live.select(
                    F.col(vec_col), cent_order.alias("__o"), F.col(key0)
                )
                .orderBy("__o", key0)
                .limit(n_cells)
                .collect()
            ]
            if refine_rounds > 0 and centroids:
                from cht_sync_spark.functions.similarity import refine_ivf_centroids

                centroids = refine_ivf_centroids(
                    live, centroids, refine_rounds, vec_col, key0
                )
        if not centroids:
            raise ValueError("no centroids: source has no live vectors and none were passed")
        fields = [T.StructField("__cell", T.IntegerType(), True)]
        for k in snap.key_cols:
            fields.append(T.StructField(k, snap.schema[k].dataType, True))
        fields.append(T.StructField(vec_col, snap.schema[vec_col].dataType, True))
        for c, _ in snap.lww_order or []:
            if c not in snap.key_cols and c not in ("__cell", vec_col, "_deleted"):
                fields.append(T.StructField(c, snap.schema[c].dataType, True))
        fields.append(T.StructField("_deleted", T.BooleanType(), True))
        return SnapshotTable.create(
            spark, path, T.StructType(fields),
            key_cols=["__cell", *snap.key_cols],
            bucket_cols=["__cell"],
            num_buckets=num_buckets,
            sort_cols=["__cell", *snap.key_cols],
            lww_order=list(snap.lww_order or []),
            properties={_CENTS: json.dumps([[float(x) for x in c] for c in centroids])},
        )


def ivf_index_search(
    index: SnapshotTable,
    query_vec,
    k: int = 10,
    n_probe: int = 4,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k from the CDC-maintained IVF index: identical
    probe strategy to ``similarity.ivf_index_topk`` (centroids ranked
    driver-side from the committed list, scan pruned to the probed cells'
    buckets) but read through ``read_current`` — the LWW fold drops
    absence tombstones and reconciles MOR delta rows, so results are
    exact over the index's CURRENT state between compactions."""
    from cht_sync_spark.functions.similarity import _pynorm
    from cht_sync_spark.tables.format import bucket_expr

    snap = index.snapshot()
    cents = _cents_of(snap)
    scored = sorted(
        range(len(cents)),
        key=lambda i: -sum(float(a) * float(b) for a, b in zip(query_vec, cents[i]))
        / (_pynorm(cents[i]) * _pynorm(query_vec)),
    )
    probe = scored[:n_probe]
    buckets = sorted(
        {
            r["__b"]
            for r in index.spark.createDataFrame([(c,) for c in probe], "__cell int")
            .select(bucket_expr(["__cell"], snap.num_buckets).alias("__b"))
            .collect()
        }
    )
    cand = index.read_current(buckets=buckets, drop_tombstones=True).where(
        F.col("__cell").isin(probe)
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def ann_index_search(
    index: SnapshotTable,
    query_vec,
    k: int = 10,
    probe_bits: int = 4,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k from the CDC-maintained index: identical probe
    strategy to ``similarity.ann_index_topk`` (margin-aware multiprobe
    signatures computed driver-side from the committed planes; scan pruned
    to the probed signatures' buckets at the file level, filtered at the
    row level) but read through ``read_current`` — the LWW fold drops
    absence tombstones and reconciles MOR delta rows, so results are exact
    over the index's CURRENT state between compactions."""
    snap = index.snapshot()
    planes, _ = _planes_of(snap)
    sigs, buckets = probe_plan(index, planes, query_vec, probe_bits)
    cand = index.read_current(buckets=buckets, drop_tombstones=True).where(
        F.col("__sig").isin(sigs)
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col)
