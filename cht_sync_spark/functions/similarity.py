"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline — one pass, JVM-side dot
  products via zip_with/aggregate, TakeOrdered for the top-k (no full sort).
- Random-hyperplane LSH: the scale path — signature buckets shrink the
  candidate set from N to N/2^p per query; exact cosine re-ranks candidates.
- IVF-lite: coarse quantization by nearest of K seeded centroids (sampled
  deterministically), probe the closest cells only.

All math stays in Catalyst expressions; nothing crosses into Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _lit_vec(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    df: DataFrame, query_vec, k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exact brute-force top-k by cosine to a literal query vector.

    orderBy+limit compiles to TakeOrderedAndProject: each partition keeps
    its local top-k, driver merges k*P rows — no global sort shuffle.
    """
    q = _lit_vec(query_vec)
    return (
        df.select(
            F.col(id_col),
            (dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(_pynorm(query_vec)))).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def _pynorm(vec) -> float:
    return math.sqrt(sum(float(x) * float(x) for x in vec)) or 1.0


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (hash-derived, no RNG state):
    plane[j][i] in {-1,+1} from a splitmix-style integer mix."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            z = (seed * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9 + i * 0x94D049BB133111EB) & (2**64 - 1)
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
            row.append(1.0 if (z >> 63) == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_signature(vec: Column, n_planes: int = 12, planes: list[list[float]] | None = None, dim: int | None = None) -> Column:
    """Bit-packed random-hyperplane signature (long). ``planes`` must be the
    same object between indexing and querying; default planes are derived
    deterministically from the vector dimension at plan time."""
    if planes is None:
        if dim is None:
            raise ValueError("lsh_signature needs planes or dim")
        planes = make_planes(dim, n_planes)
    sig = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        bit = F.when(dot(vec, _lit_vec(p)) >= 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return sig


def ann_lsh_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    max_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket plus buckets within
    ``max_hamming`` signature bits, exact-rank the candidates by cosine.

    At scale the signature column is precomputed and the table bucketed by
    it, so a query touches ~(1 + n_planes) buckets of N/2^p vectors each.
    """
    dim = len(query_vec)
    planes = make_planes(dim, n_planes)
    qsig = 0
    for j, p in enumerate(planes):
        d = sum(float(a) * float(b) for a, b in zip(query_vec, p))
        if d >= 0:
            qsig |= 1 << j
    sigs = [qsig] + ([qsig ^ (1 << j) for j in range(n_planes)] if max_hamming >= 1 else [])
    cand = df.withColumn("__sig", lsh_signature(F.col(vec_col), n_planes, planes)).where(
        F.col("__sig").isin(sigs)
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def ivf_assign(df: DataFrame, n_cells: int = 16, vec_col: str = "embedding", id_col: str = "vec_id") -> tuple[DataFrame, list]:
    """IVF-lite coarse index: centroids = a deterministic sample of the data
    (ids with smallest xxhash — seedable, no RNG), cell = argmax cosine.
    Returns (assigned df with __cell, centroid list). At scale, write the
    table bucketed by __cell (SnapshotTable key) so probes are file-pruned."""
    cents = [
        (r[0], r[1])
        for r in df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(n_cells)
        .collect()
    ]
    best_cell, best_cos = F.lit(0), F.lit(-2.0)
    for i, (_, cvec) in enumerate(cents):
        c = cosine(F.col(vec_col), _lit_vec(cvec))
        better = c > best_cos
        best_cell = F.when(better, F.lit(i)).otherwise(best_cell)
        best_cos = F.when(better, c).otherwise(best_cos)
    return df.withColumn("__cell", best_cell), [c for _, c in cents]


def ivf_topk(df: DataFrame, query_vec, k: int = 10, n_cells: int = 16, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    assigned, cents = ivf_assign(df, n_cells, vec_col, id_col)
    scored = sorted(
        range(len(cents)),
        key=lambda i: -sum(float(a) * float(b) for a, b in zip(query_vec, cents[i]))
        / (_pynorm(cents[i]) * _pynorm(query_vec)),
    )
    probe = scored[:n_probe]
    return cosine_topk(assigned.where(F.col("__cell").isin(probe)), query_vec, k, vec_col, id_col)
