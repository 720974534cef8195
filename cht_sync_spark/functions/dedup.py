"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Design rules for 100 TB scale:

- NEVER cross-join the corpus. Candidate generation is always an
  inverted-index or LSH-bucket SELF-JOIN on a small key (token, band hash,
  bucket id), so the shuffle is keyed and prunable, and AQE handles bucket
  skew.
- All shingle/hash math is built-in Catalyst expressions (xxhash64,
  transform, aggregate) — zero Python in the path.
- Exact Jaccard verification runs only on LSH/bucket candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cht_sync_spark.functions.text import normalize_text, simhash64, hamming64, words


# --------------------------------------------------------------- exact dedup
def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact duplicates (after normalization): one row per
    duplicated content hash with the group size and the keeper (min id).
    Map-side partial aggregation makes this one shuffle of (hash) keys."""
    return (
        df.select(F.md5(normalize_text(F.col(text_col))).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .where(F.col("n_dups") > 1)
    )


def canonical_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup over the canonical token-set fingerprint (sorted distinct
    words): catches reorderings/repetitions that byte-level hashing misses."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(words(normalize_text(F.col(text_col))))))
    return (
        df.select(F.md5(canon).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .where(F.col("n_dups") > 1)
    )


# ------------------------------------------------------------------ shingles
def word_ngrams(col, n: int = 3):
    """Distinct word n-gram shingles, columnar: slice the token array at
    each offset (sequence+transform; no explode)."""
    w = words(normalize_text(col))
    k = F.size(w) - (n - 1)
    return F.when(
        k > 0,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(w, i, n)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", w)))


# ----------------------------------------------------- exact n-gram Jaccard
def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via an inverted-index self-join.

    shingle -> postings; pairs sharing >=1 shingle get |A∩B| by a grouped
    count; |A∪B| = |A|+|B|-|A∩B|. Shuffles by shingle then by pair — both
    keyed, no cross join. (This is also the verifier for LSH candidates.)
    """
    sh = df.select(F.col(id_col).alias("id"), word_ngrams(F.col(text_col), n).alias("sh"))
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    post = sh.select("id", F.explode("sh").alias("s"))
    a, b = post.alias("a"), post.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        inter.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------- MinHash + LSH
def minhash_signature(col, num_hashes: int = 32, n: int = 3):
    """MinHash signature: for seed j, min over shingles of xxhash64(shingle, j).
    One transform over seeds of an array_min over shingle hashes — columnar."""
    sh = word_ngrams(col, n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, j))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash -> band -> bucket-join candidates -> exact Jaccard verify.

    Candidates = pairs agreeing on at least one band hash (classic banding:
    P[candidate] ≈ 1-(1-j^r)^b). The bucket join shuffles on (band, hash) —
    small keys, skew-safe under AQE. Verification reuses jaccard_pairs'
    math on the candidate set only.
    """
    r = num_hashes // bands
    sig = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"), minhash_signature(F.col(text_col), num_hashes, n).alias("sig"))
    banded = sig.select(
        "id",
        "__t",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.alias("band"), F.xxhash64(F.concat_ws(",", F.transform(F.slice("sig", b * r + 1, r), lambda x: x.cast("string")))).alias("bh")),
            )
        ).alias("bb"),
    ).select("id", "__t", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.__t").alias("ta"),
            F.col("y.__t").alias("tb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verify on candidates only (columnar set ops on shingle arrays)
    sa, sb = word_ngrams(F.col("ta"), n), word_ngrams(F.col("tb"), n)
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(sa) + F.size(sb) - inter
    return cand.select(
        "id_a", "id_b", (inter.cast("double") / union.cast("double")).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


# ----------------------------------------------------------------- SimHash
def simhash_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: bucket by the 4 16-bit chunks (a pair within
    hamming<=3 of 64 bits must agree exactly on >=1 of 4 chunks — pigeonhole),
    then verify hamming distance on candidates."""
    s = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh"))
    # unrolled chunk extraction: shiftright needs a literal bit count
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(F.col("sh"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("ck"),
            )
            for i in range(4)
        ]
    )
    chunks = s.select("id", "sh", F.explode(chunk_structs).alias("c")).select(
        "id", "sh", F.col("c.chunk").alias("chunk"), F.col("c.ck").alias("ck")
    )
    x, y = chunks.alias("x"), chunks.alias("y")
    return (
        x.join(
            y,
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.ck") == F.col("y.ck"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            hamming64(F.col("x.sh"), F.col("y.sh")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------- embedding cosine near-dup
def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    planes=None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, LSH-bucketed.

    Buckets = random-hyperplane signature (deterministic planes provided by
    the caller or derived from xxhash of index); pairs within a bucket are
    verified with exact cosine. Avoids the O(N^2) cross join; recall is
    tunable via n_planes (fewer planes -> bigger buckets -> higher recall).
    """
    from cht_sync_spark.functions.similarity import cosine, lsh_signature

    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_signature(F.col(vec_col), n_planes=n_planes, planes=planes).alias("b"),
    )
    x, y = sig.alias("x"), sig.alias("y")
    return (
        x.join(y, (F.col("x.b") == F.col("y.b")) & (F.col("x.id") < F.col("y.id")))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            cosine(F.col("x.v"), F.col("y.v")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
