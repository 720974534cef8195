"""Trained-vs-sampled PQ/IVF recall at sf0.1 with >= 100 queries
(VERDICT r4 #7 — the r4 pin used 20 queries at sf0.01 scale).

Protocol: corpus = sf0.1 embeddings with vec_id >= 100 (1,900 x 64);
queries = the 100 held-out vec_id < 100 vectors. Two indexes over the
identical corpus: `build_pq_index` with md5-sampled codebooks/centroids
(refine_rounds=0) and with 2 Lloyd rounds (refine_rounds=2). Recall@10
of `pq_index_topk(n_probe=4, refine=100)` against the exact cosine
top-10 (numpy oracle over the collected corpus — oracle only; the
measured path is the index query). Same probe budget both sides.

Writes BENCH/recall_sf01.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import tempfile

    from cht_sync_spark.functions.similarity import build_pq_index, pq_index_topk
    from cht_sync_spark.session import get_spark

    spark = get_spark("bench_recall", cores=8, shuffle_partitions=8)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corp = emb.where("vec_id >= 100")
    held = emb.where("vec_id < 100").orderBy("vec_id").collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in held]

    # exact-cosine oracle, computed once driver-side
    rows = corp.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat_n = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)

    def exact_top10(qv):
        q = np.array(qv, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-30)
        sims = mat_n @ q
        return set(ids[np.argsort(-sims)[:10]].tolist())

    work = tempfile.mkdtemp(prefix="recall_")
    out = {"sf_dir": SF, "n_corpus": int(len(ids)), "n_queries": len(queries),
           "k": 10, "n_probe": 4, "refine_pool": 100}
    for label, rounds in (("sampled", 0), ("trained", 2)):
        t0 = time.monotonic()
        idx = build_pq_index(
            corp, f"{work}/{label}", n_cells=8, num_buckets=8,
            refine_rounds=rounds,
        )
        build_s = time.monotonic() - t0
        t0 = time.monotonic()
        rec = 0.0
        for _vid, qv in queries:
            got = {
                r["vec_id"]
                for r in pq_index_topk(idx, qv, 10, n_probe=4, refine=100).collect()
            }
            rec += len(got & exact_top10(qv)) / 10.0
        out[label] = {
            "mean_recall_at_10": round(rec / len(queries), 4),
            "build_s": round(build_s, 1),
            "query_s": round(time.monotonic() - t0, 1),
        }
        print(label, out[label], flush=True)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/recall_sf01.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
