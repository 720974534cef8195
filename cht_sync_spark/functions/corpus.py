"""Corpus-curation operators for training-data pipelines: benchmark
contamination detection, deterministic hash-based splits / stratified
sampling, and Gopher-style repetition quality filters.

These are the gate stages a 100 TB pretraining pipeline runs between
ingest (the CDC plane) and tokenization: drop eval-set leakage, carve
reproducible train/val/test partitions, and kill boilerplate-repetitive
documents. All three are deliberately built so the SAME arithmetic replays
in any ANSI engine (DuckDB oracles in ``__spark_entry__.oracle_sql``):

- hashes are md5 hex strings compared LEXICOGRAPHICALLY (equal-length
  lowercase hex compares identically to the numeric value, so a split
  threshold is just a hex-string literal — no bigint conversion that
  differs across engines);
- repetition fractions are ratios of exact integer counts, computed by a
  single Catalyst ``aggregate`` fold over a sorted n-gram array (zero
  shuffle, whole-stage codegen) and re-derived in SQL via unnest+group.

Scale notes (100 TB):
- ``contamination``: the benchmark n-gram set is tiny versus the corpus
  (eval suites are MBs); it is broadcast, so the only shuffle is the final
  per-doc hit count keyed by doc_id. At true scale pass ``hashed=True`` to
  shrink both the broadcast and the exchange rows to 8-byte longs
  (xxhash64) instead of gram strings — same plan shape, no oracle twin.
- ``hash_split`` / ``sample_stratified``: pure map stages — zero shuffle,
  zero state; the split is a function of (salt, id) alone so it is stable
  across reruns, engines, and cluster sizes (the property that matters
  when the corpus is re-sharded between runs).
- ``repetition_stats``: per-row lambda folds; no shuffle at all.

Reference parity: the reference has no corpus plane (it ships raw docs to
Postgres); these operators extend the engine toward the training-data
use-case the north_star targets, in the same style as functions/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import word_ngrams
from .text import normalize_text, spread

__all__ = [
    "chunk_documents",
    "composition_rollup",
    "export_shards",
    "length_quantiles",
    "shard_assign",
    "contamination",
    "curation_funnel",
    "funnel_report",
    "hash_split",
    "mixture_sample",
    "pack_sequences",
    "sample_stratified",
    "sample_exact_k",
    "repetition_stats",
    "split_threshold_hex",
]


# --------------------------------------------------------------------------
# deterministic md5-hex thresholds
# --------------------------------------------------------------------------

def split_threshold_hex(rate: float) -> str:
    """First-8-hex-chars threshold such that
    ``substr(md5(x),1,8) < threshold`` selects ~``rate`` of uniform inputs.

    Lowercase-hex strings of equal length order exactly like their numeric
    values, so the comparison is engine-portable (Spark ``F.md5`` and
    DuckDB ``md5`` both emit lowercase hex)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        # 'g' sorts after every hex digit -> strictly greater than any
        # 8-char lowercase-hex hash (keep everything)
        return "g"
    return format(int(rate * 0x100000000), "08x")


def _hash8(col: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, 8)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row a deterministic train/val/test split label.

    ``weights`` maps label -> probability mass (must sum to ~1). The label
    is a pure function of (salt, id): re-running on a re-sharded or
    re-ordered corpus yields the SAME assignment — the reproducibility
    property ``df.randomSplit`` does not have (it is partition-layout
    dependent). Zero shuffle; the plan is one map stage."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    h = _hash8(F.col(id_col), salt)
    cum = 0.0
    expr = None
    items = list(weights.items())
    for label, w in items[:-1]:
        cum += w
        cond = h < F.lit(split_threshold_hex(cum))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling (the data-mixing knob: e.g.
    keep 40% of web text, 100% of code). Keeps a row iff its md5-hex coin
    lands under the stratum's threshold. Pure map stage, zero shuffle,
    stable under re-sharding (same property as ``hash_split``)."""
    h = _hash8(F.col(id_col), salt)
    expr = None
    for stratum, rate in rates.items():
        cond = F.col(stratum_col) == F.lit(stratum)
        thr = F.lit(split_threshold_hex(rate))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    thr_col = (
        expr.otherwise(F.lit(split_threshold_hex(default_rate)))
        if expr is not None
        else F.lit(split_threshold_hex(default_rate))
    )
    return df.where(h < thr_col)


def sample_exact_k(
    df: DataFrame,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "reservoir",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically —
    the distributed reservoir sample.

    ``sample_stratified`` keeps a RATE (binomial count jitter);
    evaluation sets, few-shot pools, and audit samples need an exact
    COUNT. Keeping the k rows with the smallest md5 coin is equivalent
    to a uniform k-reservoir, and — unlike ``rand()``-based sampling —
    deterministic, re-shard-stable, and engine-portable (the oracle is
    a plain ``row_number() <= k``).

    Scale shape: the naive form is one rank window per stratum — a full
    shuffle of the corpus where a hot stratum serializes into one task.
    Here a zero-shuffle PRE-FILTER bounds the window's input first: one
    tiny per-stratum count aggregate sets each stratum's coin threshold
    to overshoot k by 6 sigma (binomial), so the window ranks O(k) rows
    per stratum instead of all of them. The filter can only FALSELY DROP
    a should-be-winner if fewer than k survive — detected exactly by
    comparing survivor counts against min(k, n), and those strata (p ~
    1e-9 each, plus every stratum with n <= the overshoot where the
    filter is a no-op by construction) fall back to ranking their full
    slice. Result is EXACTLY the brute-force rank — the fast path is an
    optimization, never a semantics change."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = _hash8(F.col(id_col), salt)
    sizes = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    # overshoot: rate covering k + 6*sqrt(k) expected survivors
    import math

    over = k + 6.0 * math.sqrt(k) + 1.0
    with_thr = df.join(F.broadcast(sizes), stratum_col).withColumn(
        "__thr",
        F.when(
            F.col("__n") <= F.lit(over), F.lit("g")  # > any md5 hex: keep all
        ).otherwise(
            # threshold_hex is driver-side math over a literal rate — but the
            # rate depends on the per-stratum n, so inline the same formula
            # as a Catalyst expression: first 8 hex chars of the coin
            # compared against rate * 16^8
            F.lpad(
                F.lower(  # conv() emits uppercase hex; the md5 coin is lower
                    F.conv(
                        F.least(
                            F.lit(float(2**32 - 1)),
                            F.ceil(F.lit(over) / F.col("__n") * F.lit(float(2**32))),
                        ).cast("bigint").cast("string"),
                        10,
                        16,
                    )
                ),
                8,
                "0",
            )
        ),
    )
    survivors = with_thr.where(F.substring(h, 1, 8) < F.col("__thr"))
    # exact-recovery check: a stratum whose survivor count fell short of
    # min(k, n) re-ranks its FULL slice (rare; keeps exactness a theorem
    # instead of a probability). LEFT join from sizes: a stratum with
    # ZERO survivors has no row in the survivor counts at all — an inner
    # join would silently drop it from the output instead of recovering it
    short = (
        sizes.join(
            survivors.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__s")),
            stratum_col,
            "left",
        )
        .where(
            F.coalesce(F.col("__s"), F.lit(0)) < F.least(F.lit(k), F.col("__n"))
        )
        .select(stratum_col)
    )
    ranked_input = survivors.join(
        F.broadcast(short), stratum_col, "left_anti"
    ).select(df.columns + []).unionByName(
        df.join(F.broadcast(short), stratum_col, "left_semi")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        ranked_input.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    multipliers: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_mult: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Weighted corpus mixing with deterministic UPSAMPLING — the
    training-mixture knob (per-source sampling weights with repetition,
    the way large pretraining runs weight wikipedia/code above raw web).

    ``multipliers`` maps stratum value -> expected copies per document.
    A multiplier ``m`` emits ``floor(m)`` guaranteed copies (``epoch`` =
    0..floor(m)-1) plus one extra copy at ``epoch = floor(m)`` for the
    ``frac(m)`` fraction of documents chosen by the md5-hex coin — so
    m=2.25 repeats every doc twice and a deterministic quarter of them a
    third time, m=0.4 is plain downsampling, m=0 drops the stratum.

    Scale/determinism (the properties that matter at 100 TB):
    - pure map stage + generator: the per-row epoch list is built from
      literal per-stratum constants (floor and frac threshold are computed
      in PYTHON, so no engine float arithmetic) and exploded — zero
      shuffle, zero state;
    - the extra-copy coin is a function of (salt, id) alone: re-sharded /
      re-ordered / re-clustered corpora produce the SAME mixture, and the
      same doc is upsampled consistently across reruns (``df.sample``
      with replacement is partition-layout dependent);
    - downstream shard assignment should hash (id, epoch) so repeated
      copies spread across shards instead of colliding.
    """
    if default_mult < 0 or any(m < 0 for m in multipliers.values()):
        raise ValueError("mixture multipliers must be >= 0")

    def _parts(m: float) -> tuple[int, str]:
        fl = int(m)  # m >= 0, so int() == floor()
        return fl, split_threshold_hex(m - fl)

    floor_expr = None
    thr_expr = None
    for stratum, m in multipliers.items():
        fl, thr = _parts(m)
        cond = F.col(stratum_col) == F.lit(stratum)
        floor_expr = (
            F.when(cond, fl) if floor_expr is None else floor_expr.when(cond, fl)
        )
        thr_expr = (
            F.when(cond, thr) if thr_expr is None else thr_expr.when(cond, thr)
        )
    dfl, dthr = _parts(default_mult)
    floor_col = (
        F.lit(dfl) if floor_expr is None else floor_expr.otherwise(F.lit(dfl))
    ).cast("int")
    thr_col = F.lit(dthr) if thr_expr is None else thr_expr.otherwise(F.lit(dthr))
    empty = F.array().cast("array<int>")
    base = F.when(floor_col > 0, F.sequence(F.lit(0), floor_col - 1)).otherwise(empty)
    extra = F.when(
        _hash8(F.col(id_col), salt) < thr_col, F.array(floor_col)
    ).otherwise(empty)
    return df.withColumn("epoch", F.explode(F.concat(base, extra)))


# --------------------------------------------------------------------------
# benchmark contamination
# --------------------------------------------------------------------------

def contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
) -> DataFrame:
    """Per-document eval-set leakage score: how many of the document's
    distinct word ``n``-grams appear anywhere in the ``benchmark`` corpus.

    The standard decontamination gate (PaLM/GPT-3 style 8-13-gram overlap;
    ``n`` is a knob — the synthetic corpus's vocabulary is tiny so tests
    use n=5). Plan shape: benchmark grams are collected DISTINCT and
    broadcast (eval suites are MBs against a 100 TB corpus), the document
    side explodes its distinct grams map-side, the broadcast LEFT SEMI
    join filters hits without a shuffle, and the only exchange is the
    final per-doc count keyed by ``id_col``. ``hashed=True`` replaces gram
    strings with xxhash64 longs on both sides — 8-byte broadcast entries
    and exchange rows at scale (no cross-engine oracle twin; the string
    form is the oracle-checked one).

    Returns (id_col, n_grams, n_contaminated, contamination_ratio) for
    every NON-benchmark document, including zero-hit rows."""
    # word_ngrams normalizes internally and returns DISTINCT grams
    # (docs shorter than n words contribute their whole text as one gram)
    gram_arr = word_ngrams(F.col(text_col), n)
    if hashed:
        gram_of = lambda g: F.xxhash64(g)  # noqa: E731
    else:
        gram_of = lambda g: g  # noqa: E731

    bench_grams = (
        benchmark.select(F.explode(gram_arr).alias("g"))
        .select(gram_of(F.col("g")).alias("g"))
        .distinct()
    )
    base = spread(df).select(
        F.col(id_col), F.size(gram_arr).alias("n_grams"), gram_arr.alias("__grams")
    )
    hits = (
        base.select(F.col(id_col), F.explode("__grams").alias("g"))
        .select(F.col(id_col), gram_of(F.col("g")).alias("g"))
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        base.drop("__grams")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias("n_contaminated"),
            F.round(
                F.coalesce(F.col("n_contaminated"), F.lit(0))
                / F.greatest(F.col("n_grams"), F.lit(1)),
                6,
            ).alias("contamination_ratio"),
        )
    )


# --------------------------------------------------------------------------
# Gopher-style repetition filters
# --------------------------------------------------------------------------

def _ngrams_all(w: Column, n: int) -> Column:
    """NON-distinct word n-grams (dedup.word_ngrams dedups, which would
    erase exactly the repetitions this operator measures). Empty array for
    docs shorter than n words."""
    k = F.size(w) - (n - 1)
    return F.when(
        k > 0,
        F.transform(F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(w, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def _run_stats(sorted_arr: Column) -> Column:
    """One fold over a SORTED array returning
    struct(best_run, dup_items): the longest equal-run length and the
    total number of items belonging to runs of length >= 2. Equal items
    are adjacent after sort, so one linear pass suffices — zero shuffle,
    stays in whole-stage codegen."""
    init = F.named_struct(
        F.lit("prev"), F.lit(None).cast("string"),
        F.lit("run"), F.lit(0).cast("long"),
        F.lit("best"), F.lit(0).cast("long"),
        F.lit("dups"), F.lit(0).cast("long"),
    )

    def step(acc, x):
        same = acc["prev"].eqNullSafe(x)
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        # entering a run's 2nd member counts BOTH members; deeper members +1
        dups = (
            F.when(same & (acc["run"] == 1), acc["dups"] + 2)
            .when(same, acc["dups"] + 1)
            .otherwise(acc["dups"])
        )
        return F.named_struct(
            F.lit("prev"), x,
            F.lit("run"), run,
            F.lit("best"), F.greatest(acc["best"], run),
            F.lit("dups"), dups,
        )

    return F.aggregate(
        sorted_arr,
        init,
        step,
        lambda acc: F.named_struct(
            F.lit("best_run"), acc["best"], F.lit("dup_items"), acc["dups"]
        ),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition quality signals (Gopher rules §A1.1):

    - ``dup_word_frac``  — 1 - distinct/total words,
    - ``top2_frac``      — share of 2-gram slots taken by the single most
      frequent 2-gram ("fraction of characters in most common n-gram"
      adapted to the word level),
    - ``dup3_frac``      — share of 3-gram slots whose 3-gram occurs more
      than once ("fraction of n-grams that are duplicated").

    All three are exact integer ratios computed by sorting the per-row
    n-gram array and folding once (``_run_stats``) — no explode, no
    shuffle; the whole operator is one codegen'd map stage. Fractions are
    rounded to 6 dp so the DuckDB oracle (unnest + group + window) hashes
    identically."""
    norm = normalize_text(F.col(text_col))
    w = F.split(norm, " ")
    g2 = F.array_sort(_ngrams_all(w, 2))
    g3 = F.array_sort(_ngrams_all(w, 3))
    s2 = _run_stats(g2)
    s3 = _run_stats(g3)
    nw = F.size(w)
    n2 = F.size(g2)
    n3 = F.size(g3)
    return spread(df).select(
        F.col(id_col),
        nw.alias("n_words"),
        F.round(
            F.when(nw > 0, 1.0 - F.size(F.array_distinct(w)) / nw).otherwise(0.0), 6
        ).alias("dup_word_frac"),
        F.round(
            F.when(n2 > 0, s2["best_run"] / n2).otherwise(0.0), 6
        ).alias("top2_frac"),
        F.round(
            F.when(n3 > 0, s3["dup_items"] / n3).otherwise(0.0), 6
        ).alias("dup3_frac"),
    )


# --------------------------------------------------------------------------
# sequence packing (concat-then-chunk training-example assembly)
# --------------------------------------------------------------------------

def shard_assign(col: Column, n_shards: int, salt: str = "shards") -> Column:
    """Deterministic shard id in [0, n_shards): the md5-hex value of
    (salt, id) scaled into n equal bands. A pure function of the id —
    re-running on a re-partitioned/re-ordered corpus yields the same
    assignment (the property that makes incremental re-exports append-
    consistent), and the arithmetic replays verbatim in SQL
    (``CAST('0x' || substr(md5(..),1,8) AS BIGINT) * n // 2^32``)."""
    h = F.conv(_hash8(col, salt), 16, 10).cast("long")
    return ((h * F.lit(int(n_shards))) / F.lit(0x100000000)).cast("int")


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    fmt: str = "parquet",
    salt: str = "shards",
) -> DataFrame:
    """Export the curated corpus as ``n_shards`` deterministic shard files
    plus a manifest — the last mile of the training pipeline (what the
    tokenizer/dataloader fleet actually reads).

    - assignment: :func:`shard_assign` — a pure function of the id, so
      re-exports of the same corpus produce byte-identical shard
      membership regardless of partitioning;
    - layout: ONE file per shard (one shuffle into exactly n_shards
      tasks, rows ordered by id within a shard — the same write shape as
      the table format's bucket writer), ``shard=<k>/`` directories in
      ``fmt`` ('parquet' or 'json' for JSONL loaders);
    - manifest (returned): ``(shard_id, n_docs, n_tokens, checksum)``
      where checksum is the order-independent BIT_XOR of each doc's
      60-bit md5 prefix — cross-engine verifiable, so a reader can audit
      a shard without trusting the writer.

    Sizing note: n_shards is the dataloader-parallelism knob; at 100 TB
    pick n_shards >> cores so shards stay rsync/object-store sized. The
    manifest is a second pass over the exported columns (production
    writers fold it into the write task; the audit replay needs the
    recompute anyway).
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    shard = shard_assign(F.col(id_col), n_shards, salt)
    out = df.withColumn("shard", shard)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", id_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )
    from .text import token_count

    h60 = F.conv(
        F.substring(F.md5(F.coalesce(F.col(text_col), F.lit(""))), 1, 15), 16, 10
    ).cast("long")
    return (
        out.withColumn("__h60", h60)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.coalesce(token_count(F.col(text_col)), F.lit(0)).cast("long")
            ).alias("n_tokens"),
            F.expr("bit_xor(__h60)").alias("checksum"),
        )
        .withColumnRenamed("shard", "shard_id")
    )


def curation_funnel(
    df: DataFrame,
    stages: "list[tuple[str, Column]]",
    *,
    verdict_col: str = "dropped_at",
) -> DataFrame:
    """Staged quality-filter funnel (the C4/RefinedWeb-style cleaning
    cascade): each document is attributed to the FIRST stage whose keep-
    predicate it fails — the accounting every production curation pipeline
    publishes ("N dropped by language ID, M by length, ..."), which a bare
    chain of ``.where()`` calls cannot produce without one full pass per
    stage.

    ``stages`` is an ordered list of ``(name, keep_condition)``; the
    result is the input plus ``dropped_at`` (the failing stage's name, or
    null for survivors). ONE chained-when map stage — zero shuffle, zero
    extra passes, whole-stage-codegen'd — so the funnel costs the same as
    a single filter at 100 TB. A null predicate value counts as a failure
    (an un-evaluable document must not silently pass a gate). Compose with
    :func:`funnel_report` for the per-stage drop table, or
    ``.where(F.col('dropped_at').isNull())`` for the survivors.
    """
    if not stages:
        raise ValueError("curation_funnel needs at least one stage")
    expr = None
    for name, keep in stages:
        fail = ~F.coalesce(keep, F.lit(False))
        expr = F.when(fail, F.lit(name)) if expr is None else expr.when(fail, F.lit(name))
    return df.withColumn(verdict_col, expr.otherwise(F.lit(None).cast("string")))


def funnel_report(
    verdict: DataFrame,
    stages: "list[tuple[str, Column]]",
    *,
    verdict_col: str = "dropped_at",
) -> DataFrame:
    """Per-stage funnel accounting over a :func:`curation_funnel` result:
    ``(stage_idx, stage, dropped, remaining)`` — ``remaining`` is the
    corpus size after that stage (so the last row's remaining is the
    surviving-document count). ONE keyed aggregation over the corpus
    (≤ #stages + 1 groups, materialized once via localCheckpoint so the
    total and the per-stage join don't each re-trigger the scan), then
    driver-tiny joins/windows."""
    from pyspark.sql import Window

    spark = verdict.sparkSession
    sdf = spark.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(stages)],
        "stage_idx int, stage string",
    )
    # the null group is the survivor count — the single aggregation holds
    # the whole report; localCheckpoint pins its (<= #stages + 1)-row
    # result so deriving total does not rescan the corpus
    counts = (
        verdict.groupBy(F.col(verdict_col).alias("stage"))
        .agg(F.count(F.lit(1)).alias("dropped"))
        .localCheckpoint()
    )
    total = counts.agg(F.sum("dropped").alias("__total"))
    w = Window.orderBy("stage_idx").rowsBetween(Window.unboundedPreceding, 0)
    return (
        sdf.join(counts, on="stage", how="left")
        .withColumn("dropped", F.coalesce(F.col("dropped"), F.lit(0)))
        .crossJoin(F.broadcast(total))
        .withColumn("remaining", F.col("__total") - F.sum("dropped").over(w))
        .select("stage_idx", "stage", "dropped", "remaining")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — the fixed-length-example cutter
    between curation and tokenization (and the retrieval-corpus builder):
    each document's whitespace tokens are windowed into chunks of
    ``chunk_tokens`` with ``overlap`` tokens shared between neighbours
    (stride = chunk_tokens - overlap). The last chunk may be short; every
    token is covered by at least one chunk; empty documents yield none.

    Output: ``id_col``, ``chunk_id`` (0-based), ``chunk_text``,
    ``chunk_n_tokens``. Pure Catalyst (split → sequence → explode →
    slice): a zero-shuffle map stage — chunking 100 TB costs one scan.
    Deterministic: chunk boundaries depend only on the text, so re-runs
    and re-shards produce identical chunks (the property dedup-by-chunk
    and stable retrieval ids rely on).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens); got overlap={overlap}, "
            f"chunk_tokens={chunk_tokens} (a negative overlap would skip "
            "tokens, breaking the every-token-covered invariant)"
        )
    stride = chunk_tokens - overlap
    from .text import words

    toks = df.select(
        F.col(id_col), words(F.col(text_col)).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("__n") - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
    )
    return (
        toks.where(F.col("__n") > 0)
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            F.col(id_col),
            "chunk_id",
            F.array_join(
                F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens),
                " ",
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.col("__n") - F.col("chunk_id") * stride
            ).cast("int").alias("chunk_n_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
    token_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins — the
    concat-then-chunk packing every pretraining pipeline runs between
    curation and tokenization: documents are laid out in a deterministic
    order (``id_col`` within ``shard_col``) and the stream is chunked into
    ``budget``-token windows; each document is attributed to the bin where
    it STARTS, with its offset inside that bin.

    Output: the input plus ``n_tokens``, ``bin_id`` (per shard, 0-based)
    and ``bin_offset`` (token position of the doc's first token within its
    bin). A document longer than the remaining bin space straddles into the
    next bin(s), exactly like the GPT-style packed-example writer; the
    consumer slicing physical examples re-derives boundaries from
    (bin_id, bin_offset, n_tokens).

    Scale: the running sum is a window PARTITIONED BY the shard column —
    embarrassingly parallel across shards, sequential only within one
    (a total order over 10^10 docs would be a single-task prefix sum; the
    per-shard form is how production packers shard the problem, and
    shard_col granularity is the parallelism knob). Token counts default to
    whitespace tokens (``token_col`` supplies real tokenizer counts when
    available). Deterministic: same input -> same bins on any partitioning,
    any engine (DuckDB oracle replays it verbatim).
    """
    from .text import token_count

    toks = F.col(token_col) if token_col else token_count(F.col(text_col))
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # null text packs as a 0-token doc (size(NULL) is NULL, which would
    # otherwise null the whole running sum and silently unplace documents)
    out = df.withColumn("n_tokens", F.coalesce(toks.cast("long"), F.lit(0)))
    before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return (
        out.withColumn("__before", before)
        # integer `div`, not float `/`: a double loses exactness past 2^53,
        # which a hot shard's cumulative token count can reach — float
        # rounding there would disagree with the SQL oracle's `//`
        .withColumn("bin_id", F.expr(f"__before div CAST({int(budget)} AS BIGINT)"))
        .withColumn("bin_offset", F.col("__before") % F.lit(budget))
        .drop("__before")
    )


def length_quantiles(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_chars",
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """Per-group length/token distribution report — the curation dashboard
    every pretraining pipeline keeps (length histograms per language /
    source feed the funnel thresholds in :func:`curation_funnel`).

    One hash aggregate keyed by ``group_col``: count, mean, min/max and the
    requested quantiles. ``approx=False`` uses Spark's EXACT interpolated
    ``percentile`` — linear interpolation between order statistics, the
    same definition as DuckDB's ``quantile_cont``, so the report replays
    bit-comparably in the oracle. Exact percentile buffers each group's
    values in the aggregation state; that is the right trade for report
    cardinalities (languages, sources — thousands of groups), while at
    100 TB with high-cardinality groups ``approx=True`` switches to
    ``percentile_approx`` (t-digest-style sketch, mergeable map-side
    partials, bounded state — no oracle twin, sketch internals are
    engine-specific).
    """
    v = F.col(value_col).cast("double")
    if approx:
        qs = F.percentile_approx(v, list(probs))
    else:
        qs = F.percentile(v, F.array(*[F.lit(p) for p in probs]))
    pcols = [
        F.round(F.element_at(F.col("__qs"), i + 1), 6).alias(
            f"p{str(p).replace('0.', '').ljust(2, '0')}"
        )
        for i, p in enumerate(probs)
    ]
    return (
        df.groupBy(group_col)
        .agg(
            F.count(v).alias("n"),
            F.round(F.avg(v), 6).alias("mean"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
            qs.alias("__qs"),
        )
        .select(group_col, "n", "mean", "vmin", "vmax", *pcols)
    )


def composition_rollup(
    df: DataFrame,
    dims: tuple[str, str] = ("lang", "source"),
    value_col: str = "n_chars",
) -> DataFrame:
    """Corpus composition at every rollup level — the "what is this corpus
    made of" report (docs and volume by language, by language x source,
    and the grand total) produced as ONE job.

    ``ROLLUP(d1, d2)`` evaluates the three grouping sets via Catalyst's
    ``Expand`` (each input row is replicated once per set, map-side, then
    ONE hash aggregate with partial combine) — at 100 TB this is one
    shuffle of pre-combined partials, versus three separate jobs each
    rescanning the corpus. ``grouping_id`` disambiguates a genuine NULL
    dimension value from a rolled-up subtotal (the classic GROUPING()
    disambiguation), so the report is loss-free even on dirty metadata.
    """
    d1, d2 = dims
    # grouping_id() is only resolvable INSIDE the grouping-sets aggregate
    return df.rollup(d1, d2).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(value_col).cast("long")).alias("volume"),
        F.grouping_id().cast("int").alias("gid"),
    )
