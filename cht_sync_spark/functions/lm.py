"""N-gram language-model training and perplexity scoring — the classic
corpus quality filter.

The production LLM-data pipelines this engine targets gate web text on the
perplexity of a small n-gram language model trained on a trusted corpus
(CCNet's KenLM filter; C4 and its descendants keep the idea): fluent text
scores low perplexity, boilerplate/gibberish scores high. This module is
that filter expressed Spark-first — counts are ONE aggregation over
exploded n-grams, scoring is keyed joins against the counts table, and
everything stays in Catalyst (no UDFs), so the whole path is
whole-stage-codegen'd and AQE-planned.

Model: bigram LM with add-k smoothing (Lidstone). For a document
``w1..wn``::

    log P(doc) = log P(w1) + sum_i log P(wi | w(i-1))
    P(w)       = (c(w) + k) / (T + k*V)          -- unigram, T = token count
    P(w|v)     = (c(v w) + k) / (c(v) + k*V)     -- bigram over vocab V

OOV words and unseen bigrams get the k-mass — never zero, so scores are
total. ``avg_logp`` is log P(doc)/n and ``ppl = exp(-avg_logp)``.

Scale shape:

- **Training** (:func:`ngram_lm_counts`): bigrams come from
  ``zip_with(slice, slice)`` over the token array — ZERO shuffle to form
  pairs — then one explode + one hash aggregation (map-side partial
  combine does the Zipf heavy lifting: "the dog" pre-aggregates inside
  each task). Output is vocab-sized, not corpus-sized.
- **Scoring** (:func:`ngram_lm_score`): keyed joins against the
  counts (bigram and context), both on Zipf-skewed keys — the counts side
  is the small side (vocab-bounded), so Catalyst broadcasts it below the
  threshold and AQE's skew join covers the sort-merge case above it; the
  per-doc reduce reuses the doc key. Tokenization matches
  :func:`cht_sync_spark.functions.text.words` (whitespace split,
  lowercased) so LM scores compose with the rest of the text plane.

Determinism: counts and scores are pure functions of the corpus — no
sampling, no RNG — so the whole path replays bit-stable and is fully
DuckDB-oracle-checkable (same ln/double math as the BM25 oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words

__all__ = ["ngram_lm_counts", "ngram_lm_score"]


def _toks(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), words(F.lower(F.col(text_col))).alias("__toks")
    )


def ngram_lm_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train: unigram + bigram counts in ONE aggregation pass.

    Returns ``(prev, word, cnt)`` — unigram rows carry ``prev IS NULL``.
    Corpus totals (T, V) are derived from the unigram rows at score time;
    no separate bookkeeping table to drift out of sync."""
    toks = _toks(df, id_col, text_col).where(F.size("__toks") > 0)
    uni = toks.select(
        F.lit(None).cast("string").alias("prev"),
        F.explode("__toks").alias("word"),
    )
    n = F.size("__toks")
    bi = toks.select(
        F.explode(
            F.zip_with(
                F.slice("__toks", 1, n - 1),
                F.slice("__toks", 2, n - 1),
                lambda a, b: F.struct(a.alias("prev"), b.alias("word")),
            )
        ).alias("p")
    ).select("p.prev", "p.word")
    return (
        uni.unionByName(bi)
        .groupBy("prev", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_lm_score(
    df: DataFrame,
    counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Score every document against a trained counts table.

    Returns ``(id_col, n_tokens, avg_logp, ppl)``; empty documents are
    dropped (no tokens — perplexity undefined)."""
    if not k > 0:
        raise ValueError(f"add-k smoothing needs k > 0, got {k}")
    uni = counts.where(F.col("prev").isNull()).select(
        F.col("word").alias("__uw"), F.col("cnt").alias("__cw")
    )
    bi = counts.where(F.col("prev").isNotNull()).select(
        F.col("prev").alias("__bp"), F.col("word").alias("__bw"),
        F.col("cnt").alias("__cbi"),
    )
    tot = uni.agg(
        F.sum("__cw").alias("T"), F.count(F.lit(1)).alias("V")
    ).first()
    T, V = float(tot["T"] or 0), float(tot["V"] or 0)
    if V == 0:
        # an empty counts table would make every denominator collapse to
        # zero and score all docs Infinity/0.0 — garbage silently passing
        # a quality gate; refuse loudly instead
        raise ValueError("counts table holds no unigrams (empty training corpus)")

    toks = _toks(df, id_col, text_col).where(F.size("__toks") > 0)
    n = F.size("__toks")
    # (id, prev|null, word): head term scores against the unigram model
    # (prev null => context total T), transitions against their bigram
    terms = toks.select(
        F.col(id_col), n.alias("n_tokens"),
        F.explode(
            F.concat(
                F.array(F.struct(
                    F.lit(None).cast("string").alias("prev"),
                    F.element_at("__toks", 1).alias("word"),
                )),
                F.zip_with(
                    F.slice("__toks", 1, n - 1),
                    F.slice("__toks", 2, n - 1),
                    lambda a, b: F.struct(a.alias("prev"), b.alias("word")),
                ),
            )
        ).alias("t"),
    ).select(id_col, "n_tokens", "t.prev", "t.word")
    prevc = uni.select(F.col("__uw").alias("__pw"), F.col("__cw").alias("__cprev"))
    scored = (
        terms.join(
            bi,
            (F.col("prev") == F.col("__bp")) & (F.col("word") == F.col("__bw")),
            "left",
        )
        .drop("__bp", "__bw")
        .join(prevc, F.col("prev") == F.col("__pw"), "left")
        .drop("__pw")
        .join(uni, F.col("word") == F.col("__uw"), "left")
        .drop("__uw")
        .withColumn(
            "__logp",
            F.when(
                F.col("prev").isNull(),
                F.log((F.coalesce(F.col("__cw"), F.lit(0)) + k) / (T + k * V)),
            ).otherwise(
                F.log(
                    (F.coalesce(F.col("__cbi"), F.lit(0)) + k)
                    / (F.coalesce(F.col("__cprev"), F.lit(0)) + k * V)
                )
            ),
        )
    )
    return (
        scored.groupBy(id_col, "n_tokens")
        .agg((F.sum("__logp") / F.col("n_tokens")).alias("avg_logp"))
        .select(
            id_col, "n_tokens", "avg_logp",
            F.exp(-F.col("avg_logp")).alias("ppl"),
        )
    )
