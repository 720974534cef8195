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
