"""Product quantization / IVF-PQ (functions/similarity.py pq_*).

Pinned: encoding is deterministic, partition-invariant, and in-range;
ADC ranking with exact refinement recovers the exact cosine top-k (the
two-stage recall knob); the IVF-PQ index prunes files to the probed
cells and pins centroids + codebooks in table properties; validation
(non-divisible dim, oversized ks, refine without vectors) refuses
loudly. Codebooks are deterministic hash-ordered samples, so everything
here replays in the DuckDB oracle (driver entry pq_adc_topk).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cht_sync_spark.functions.similarity import (
    build_pq_index,
    cosine_topk,
    make_pq_codebooks,
    pq_adc_topk,
    pq_encode,
    pq_index_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_encode_shape_determinism_partition_invariance(spark, emb):
    cbs = make_pq_codebooks(emb)
    assert len(cbs) == 8 and len(cbs[0]) == 64 and len(cbs[0][0]) == 8
    codes = pq_encode(emb, cbs)
    rows = {r["vec_id"]: r["codes"] for r in codes.collect()}
    assert all(len(c) == 8 and all(0 <= x < 64 for x in c) for c in rows.values())
    again = {r["vec_id"]: r["codes"] for r in pq_encode(emb.repartition(7), cbs).collect()}
    assert rows == again
    # compression: 8 codes stand in for 64 floats (~32x at byte level)
    assert len(rows) == emb.count()


def test_adc_with_refine_recovers_exact_topk(spark, emb):
    q = emb.where("vec_id = 0").first()["embedding"]
    corp = emb.where("vec_id <> 0")
    cbs = make_pq_codebooks(corp)
    codes = pq_encode(corp, cbs, keep=("embedding",))
    exact = [r["vec_id"] for r in cosine_topk(corp, q, 10).collect()]
    # pure ADC: rough but correlated — at least some of the true top-10
    adc = [r["vec_id"] for r in pq_adc_topk(codes, q, cbs, 10).collect()]
    assert len(set(adc) & set(exact)) >= 3
    # ADC pool + exact re-rank: high recall at a 100-vector pool
    pool = (
        codes.select(
            "vec_id", "embedding",
            F.col("codes").alias("codes"),
        )
    )
    from cht_sync_spark.functions.similarity import pq_adc_score

    ranked = (
        pool.withColumn("adc", pq_adc_score(F.col("codes"), q, cbs))
        .orderBy(F.desc("adc"), "vec_id").limit(100)
    )
    refined = [r["vec_id"] for r in cosine_topk(ranked, q, 10).collect()]
    assert len(set(refined) & set(exact)) >= 8


def test_ivfpq_index_prunes_and_refines(spark, emb, tmp_path):
    q = emb.where("vec_id = 0").first()["embedding"]
    corp = emb.where("vec_id <> 0")
    t = build_pq_index(corp, str(tmp_path / "pq"), n_cells=8, num_buckets=8)
    snap = t.snapshot()
    assert "pq.codebooks" in snap.properties and "ivf.centroids" in snap.properties
    n_files = len(snap.files)
    got = pq_index_topk(t, q, k=10, n_probe=2, refine=50).collect()
    assert len(got) == 10
    assert t.last_scan_files < n_files  # probed cells only
    # full probe + refine ~= exact over the corpus
    exact = [r["vec_id"] for r in cosine_topk(corp, q, 10).collect()]
    full = [r["vec_id"] for r in pq_index_topk(t, q, 10, n_probe=8, refine=100).collect()]
    assert len(set(full) & set(exact)) >= 8


def test_validation(spark, emb, tmp_path):
    with pytest.raises(ValueError, match="not divisible"):
        make_pq_codebooks(emb, 7, 16)
    with pytest.raises(ValueError, match="< ks"):
        make_pq_codebooks(emb.limit(5), 4, 16)
    with pytest.raises(ValueError, match="hash_fn"):
        make_pq_codebooks(emb, 4, 16, hash_fn="sha1")
    q = emb.where("vec_id = 0").first()["embedding"]
    t = build_pq_index(
        emb.where("vec_id <> 0"), str(tmp_path / "nv"), n_cells=4,
        keep_vectors=False,
    )
    with pytest.raises(ValueError, match="keep_vectors"):
        pq_index_topk(t, q, refine=10)
    # codes-only still answers
    assert len(pq_index_topk(t, q, k=5, n_probe=4).collect()) == 5


# ---------------------------------------------------------------------------
# Lloyd refinement (refine_pq_codebooks / refine_ivf_centroids)
# ---------------------------------------------------------------------------

def _pq_distortion(spark, corp, cbs) -> float:
    """Mean L2^2 between each normalized slice and its assigned codebook
    entry — the Lloyd objective the refinement minimizes."""
    from cht_sync_spark.functions.similarity import _lit_vec, _vhat, dot, pq_encode

    m_sub, dsub = len(cbs), len(cbs[0][0])
    enc = pq_encode(corp, cbs, keep=("embedding",)).withColumn("__vh", _vhat("embedding"))
    err = None
    for m in range(m_sub):
        sub = F.slice(F.col("__vh"), m * dsub + 1, dsub)
        entries = F.array(*[_lit_vec(e) for e in cbs[m]])
        cvec = F.element_at(entries, F.element_at("codes", m + 1) + 1)
        diff = F.zip_with(sub, cvec, lambda a, b: a - b)
        term = dot(diff, diff)
        err = term if err is None else err + term
    return enc.select(F.avg(err).alias("e")).first()["e"]


def test_refine_pq_monotone_deterministic_partition_invariant(spark, emb):
    from cht_sync_spark.functions.similarity import make_pq_codebooks, refine_pq_codebooks

    corp = emb.where("vec_id <> 0")
    cbs0 = make_pq_codebooks(corp)
    cbs2 = refine_pq_codebooks(corp, cbs0, rounds=2)
    # classic Lloyd monotonicity: distortion never increases
    d0 = _pq_distortion(spark, corp, cbs0)
    d2 = _pq_distortion(spark, corp, cbs2)
    assert d2 <= d0 + 1e-12
    assert d2 < d0 * 0.9  # and actually trains on this corpus
    # deterministic and re-shard-stable (the exact fixed-point mean rule)
    again = refine_pq_codebooks(corp.repartition(7), cbs0, rounds=2)
    assert cbs2 == again


def test_refine_ivf_recovers_planted_clusters(spark):
    """Planted well-separated clusters: hash-sampled centroids land
    arbitrarily (several in one cluster), Lloyd rounds must move them so
    assignment groups the clusters correctly and probe recall improves
    (or at worst ties) on every query."""
    import random

    from cht_sync_spark.functions.similarity import (
        assign_cells, refine_ivf_centroids,
    )

    rng = random.Random(7)
    centers = [[10.0 if d == c else 0.0 for d in range(8)] for c in range(4)]
    rows = []
    for i in range(400):
        c = i % 4
        rows.append(
            (i, [x + rng.uniform(-0.5, 0.5) for x in centers[c]]),
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # init: one (noisy, off-center) sample per cluster — refinement pulls
    # each toward its cluster's mean direction. (An init that MISSES a
    # cluster stays missed — the Lloyd local-optimum property; coverage is
    # the sampled init's job, centering is refinement's.)
    cents0 = [rows[0][1], rows[1][1], rows[2][1], rows[3][1]]
    cents2 = refine_ivf_centroids(df, cents0, rounds=3)

    def mean_cos(cents):
        from cht_sync_spark.functions.similarity import _lit_vec, cosine

        a = assign_cells(df, cents)
        arr = F.array(*[_lit_vec(c) for c in cents])
        return a.select(
            F.avg(cosine(F.col("embedding"), F.element_at(arr, F.col("__cell") + 1))).alias("c")
        ).first()["c"]

    # spherical-k-means objective (mean cosine to the assigned center)
    # strictly improves on the noisy init, and assignment purity is perfect
    assert mean_cos(cents2) > mean_cos(cents0)
    got = assign_cells(df, cents2).select("vec_id", "__cell").collect()
    by_cell: dict = {}
    for r in got:
        by_cell.setdefault(r["__cell"], set()).add(r["vec_id"] % 4)
    assert all(len(v) == 1 for v in by_cell.values())  # no merged clusters
    # determinism across partitionings
    assert cents2 == refine_ivf_centroids(df.repartition(5), cents0, rounds=3)
    # a duplicated init entry leaves one cell empty (smallest-cell ties):
    # the empty cell keeps its current center — no NaN, no crash
    dup = [rows[0][1], rows[0][1], rows[1][1], rows[2][1]]
    ref = refine_ivf_centroids(df, dup, rounds=1)
    assert ref[1] == [float(x) for x in rows[0][1]]  # untouched loser copy
    assert all(all(x == x for x in c) for c in ref)  # no NaNs anywhere


def test_build_pq_index_refined_and_ivf_consumer_refined(spark, emb, tmp_path):
    """refine_rounds wires through build_pq_index and
    IvfIndexConsumer.create_index; refined indexes answer queries with
    recall >= the unrefined build (same probe budget)."""
    from cht_sync_spark.functions.similarity import build_pq_index, cosine_topk, pq_index_topk

    corp = emb.where("vec_id >= 20")
    qs = [r["embedding"] for r in emb.where("vec_id < 20").orderBy("vec_id").collect()]
    t0 = build_pq_index(corp, str(tmp_path / "p0"), n_cells=8, num_buckets=8)
    t2 = build_pq_index(
        corp, str(tmp_path / "p2"), n_cells=8, num_buckets=8, refine_rounds=2
    )

    def mean_recall(t):
        rec = 0.0
        for qv in qs:
            exact = {r["vec_id"] for r in cosine_topk(corp, qv, 10).collect()}
            got = {
                r["vec_id"]
                for r in pq_index_topk(t, qv, 10, n_probe=4, refine=100).collect()
            }
            rec += len(got & exact) / 10
        return rec / len(qs)

    # trained centroids/codebooks: mean recall over 20 queries at the same
    # probe budget must be >= the hash-sampled build's (measured 0.735 vs
    # 0.66 on this corpus; single-query comparisons are cell-luck noise)
    r0, r2 = mean_recall(t0), mean_recall(t2)
    assert r2 >= r0 - 0.02
    assert r2 >= 0.65
    q = qs[0]

    # CDC-maintained IVF with trained centroids
    from pyspark.sql import types as T

    from cht_sync_spark.streaming.ann_index import IvfIndexConsumer, ivf_index_search
    from cht_sync_spark.tables.format import SnapshotTable

    src_rows = corp.select(
        "vec_id", "embedding", F.lit(1).cast("long").alias("seq"),
        F.lit(False).alias("_deleted"),
    )
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), src_rows.schema, key_cols=["vec_id"],
        num_buckets=4, lww_order=[("seq", False)],
    )
    src.append_delta(src_rows)
    idx = IvfIndexConsumer.create_index(
        spark, src, str(tmp_path / "idx"), n_cells=8, num_buckets=8,
        cent_hash="md5", refine_rounds=2,
    )
    IvfIndexConsumer(spark, src, idx, "ix").run_once()
    exact = {r["vec_id"] for r in cosine_topk(corp, q, 10).collect()}
    got = {r["vec_id"] for r in ivf_index_search(idx, q, k=10, n_probe=8).collect()}
    assert got == exact  # full probe over all 8 cells IS the exact top-k
