"""Keyword search over the document corpus: BM25 scoring and term lookup.

The retrieval half of a curation pipeline that the similarity plane
(functions/similarity.py) does for embeddings, done for exact terms:
"find the documents about X" for targeted extraction, quality audits, and
contamination spot-checks. Robertson/Spärck-Jones BM25 (the Okapi form
used by Lucene/Elasticsearch defaults, k1=1.2 b=0.75).

Spark-first shape (no UDFs, no index build required):

- tokenize + measure doc length in ONE map stage;
- explode tokens and FILTER TO THE QUERY TERMS before any shuffle — the
  exchange carries only (doc, query-term) hits, not the corpus vocabulary
  (for a 3-term query over 10^10 docs that is orders of magnitude smaller
  than a vocabulary aggregation);
- per-term document frequencies are a ≤|terms|-row aggregate, broadcast
  back; corpus N / avgdl is a 1-row aggregate, broadcast — the only
  shuffle keyed by doc is the per-(doc, term) tf count;
- final top-k is TakeOrderedAndProject (no global sort materialization).

The arithmetic is pure double math (ln, +, *) that replays bit-close in
any ANSI engine — the DuckDB oracle in __spark_entry__ recomputes the
same scores; ties break by doc id so top-k is deterministic.

At persistent-index scale the same banding trick as the ANN plane applies
(store the exploded (term, doc, tf) postings as a term-bucketed
SnapshotTable and bucket-prune per query); the query-time form here is
the one-shot/audit path.

Reference parity: none — the reference has no search surface; this
extends the engine toward the training-data use-case per SURVEY §2.5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import words

__all__ = ["bm25_topk", "term_postings"]


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __toks, dl): the shared tokenization stage."""
    return df.select(
        F.col(id_col), words(F.lower(F.col(text_col))).alias("__toks")
    ).withColumn("dl", F.size("__toks"))


def _tf_for_terms(toks: DataFrame, id_col: str, terms: list[str]) -> DataFrame:
    """(id, dl, term, tf) for the query terms only — the filter runs
    BEFORE the shuffle, so the exchange carries query-term hits, not the
    vocabulary."""
    return (
        toks.select(id_col, "dl", F.explode("__toks").alias("term"))
        .where(F.col("term").isin(list(terms)))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def term_postings(
    df: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, term) frequencies with doc length, for the given terms
    only: ``(id, dl, term, tf)``. The shared first half of BM25; exposed
    for boolean/AND-OR retrieval composition."""
    return _tf_for_terms(_tokens(df, id_col, text_col), id_col, terms)


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 relevance to ``terms`` (bag-of-words
    OR query). Returns ``(id, score)`` ordered by score desc, id asc
    (deterministic under ties). See module docstring for the plan shape.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = _tokens(df, id_col, text_col)
    stats = toks.agg(
        F.count(F.lit(1)).alias("__N"), F.avg("dl").alias("__avgdl")
    )
    tf = _tf_for_terms(toks, id_col, terms)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    idf: Column = F.log(
        F.lit(1.0)
        + (F.col("__N") - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(contrib).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
