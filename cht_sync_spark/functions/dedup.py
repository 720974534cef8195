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
    """EXACT n-gram Jaccard similar pairs (no misses at >= threshold), at
    inverted-index cost bounded by prefix filtering (AllPairs/PPJoin-style).

    Why not the naive postings self-join: with a skewed token distribution
    the per-token posting lists explode the join (sum over tokens of
    |postings|^2). Prefix filtering is the standard fix: order each doc's
    distinct shingle hashes by global document frequency (rarest first) and
    index only the first ``|A| - ceil(t*|A|) + 1``; any pair with
    J >= t must share >= ceil(t*|A|) shingles, hence shares at least one
    PREFIX shingle — so joining prefixes only loses nothing, and the
    high-frequency tokens that caused the blowup never enter the join.
    Verification then computes exact Jaccard per deduped candidate pair
    from compact int64 shingle-hash arrays.

    Shuffles: postings by token (freq join), by id (rank window), prefix
    join by token, verify joins by id — all keyed; AQE handles residual
    token skew.
    """
    from pyspark.sql import Window

    base = (
        df.select(F.col(id_col).alias("id"), shingle_hashes(F.col(text_col), n).alias("hs"))
        .withColumn("n_sh", F.size("hs"))
    )
    post = base.select("id", "n_sh", F.explode("hs").alias("h"))
    freq = post.groupBy("h").agg(F.count("*").alias("df"))
    ranked = post.join(freq, "h").withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("id").orderBy("df", "h")),
    )
    prefix = ranked.where(
        F.col("rk") <= F.col("n_sh") - F.ceil(F.lit(float(threshold)) * F.col("n_sh")) + 1
    ).select("id", "h")
    x, y = prefix.alias("x"), prefix.alias("y")
    cand = (
        x.join(y, (F.col("x.h") == F.col("y.h")) & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    a, b = base.alias("sa"), base.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.hs"), F.col("sb.hs")))
    union = F.col("sa.n_sh") + F.col("sb.n_sh") - inter
    return (
        cand.join(a, F.col("id_a") == F.col("sa.id"))
        .join(b, F.col("id_b") == F.col("sb.id"))
        .select("id_a", "id_b", (inter.cast("double") / union.cast("double")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------- MinHash + LSH
def shingle_hashes(col, n: int = 3):
    """Distinct shingles -> distinct int64 hashes. Each shingle string is
    hashed EXACTLY ONCE; every downstream minhash permutation hashes these
    fixed-width longs (the hash-once trick: string hashing is O(shingle
    bytes), the per-permutation re-hash is O(1) per shingle)."""
    return F.transform(word_ngrams(col, n), lambda s: F.xxhash64(s))


def minhash_signature(col, num_hashes: int = 32, n: int = 3):
    """MinHash signature over pre-hashed shingles: sig[j] = min over
    shingle hashes h of xxhash64(h, j). Columnar; long-input hashes only
    (no per-permutation string re-hash, and no ANSI overflow — Spark 4
    rejects wrapping long arithmetic, so a*h+b permutations are out)."""
    hs = shingle_hashes(col, n)
    return _signature_from_hashes(hs, num_hashes)


def _signature_from_hashes(hs, num_hashes: int):
    return F.array(
        *[
            F.array_min(F.transform(hs, lambda h: F.xxhash64(h, F.lit(j))))
            for j in range(num_hashes)
        ]
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
    P[candidate] ≈ 1-(1-j^r)^b). Scale discipline:

    - shingles are hashed to int64 ONCE (:func:`shingle_hashes`); signatures
      are integer permutations of that array;
    - the band self-join carries ONLY (id, band, bandhash) — candidate pairs
      are deduped as bare id pairs before any text/array is attached;
    - verification joins the deduped pairs back to a compact
      (id, shingle-hash array) side, so exact Jaccard runs on int arrays for
      candidate pairs only, never on texts.

    The bucket join shuffles on (band, bandhash) — small keys, skew-safe
    under AQE.
    """
    r = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), n).alias("hs"),
    )
    sig = base.select("id", "hs", _signature_from_hashes(F.col("hs"), num_hashes).alias("sig"))
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",", F.transform(F.slice("sig", b * r + 1, r), lambda x: x.cast("string"))
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sides = base.select("id", "hs", F.size("hs").alias("n_sh"))
    a, b = sides.alias("sa"), sides.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.hs"), F.col("sb.hs")))
    union = F.col("sa.n_sh") + F.col("sb.n_sh") - inter
    return (
        cand.join(a, F.col("id_a") == F.col("sa.id"))
        .join(b, F.col("id_b") == F.col("sb.id"))
        .select("id_a", "id_b", (inter.cast("double") / union.cast("double")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


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
        .where(F.col("hamming") <= max_hamming)  # filter BEFORE the pair dedup
        .dropDuplicates(["id_a", "id_b"])
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
