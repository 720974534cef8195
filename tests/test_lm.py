"""N-gram LM training + perplexity scoring (functions/lm.py) — the
CCNet/KenLM-style corpus quality filter.

Pinned: hand-computed add-k probabilities on a tiny corpus (the math is
the contract — the DuckDB oracle replays the same ln/double arithmetic);
OOV smoothing never yields -inf; in-distribution text scores lower
perplexity than gibberish under a model trained on the distribution;
empty docs are dropped; scoring is partition-invariant.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from cht_sync_spark.functions.lm import ngram_lm_counts, ngram_lm_score


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)],
        "doc_id long, text string",
    )


def test_counts_and_score_hand_computed(spark):
    train = _docs(spark, ["a b a", "b a"])
    counts = ngram_lm_counts(train)
    got = {
        (r["prev"], r["word"]): r["cnt"] for r in counts.collect()
    }
    assert got == {
        (None, "a"): 3, (None, "b"): 2,
        ("a", "b"): 1, ("b", "a"): 2,
    }
    k, T, V = 0.5, 5.0, 2.0
    scored = {r["doc_id"]: r for r in ngram_lm_score(train, counts, k=k).collect()}
    # doc0 "a b a": ln P(a) + ln P(b|a) + ln P(a|b)
    want0 = (
        math.log((3 + k) / (T + k * V))
        + math.log((1 + k) / (3 + k * V))
        + math.log((2 + k) / (2 + k * V))
    ) / 3
    assert scored[0]["n_tokens"] == 3
    assert scored[0]["avg_logp"] == pytest.approx(want0, abs=1e-12)
    assert scored[0]["ppl"] == pytest.approx(math.exp(-want0), rel=1e-12)
    want1 = (
        math.log((2 + k) / (T + k * V)) + math.log((2 + k) / (2 + k * V))
    ) / 2
    assert scored[1]["avg_logp"] == pytest.approx(want1, abs=1e-12)


def test_oov_total_and_finite(spark):
    train = _docs(spark, ["a b a", "b a"])
    counts = ngram_lm_counts(train)
    k, T, V = 0.5, 5.0, 2.0
    got = ngram_lm_score(_docs(spark, ["z q"]), counts, k=k).collect()[0]
    # ln P(z) [OOV unigram] + ln P(q|z) [unseen context: c(z)=0]
    want = (math.log(k / (T + k * V)) + math.log(k / (k * V))) / 2
    assert got["avg_logp"] == pytest.approx(want, abs=1e-12)
    assert math.isfinite(got["ppl"])


def test_fluent_beats_gibberish(spark):
    train = _docs(
        spark,
        ["the cat sat on the mat"] * 5 + ["the dog sat on the rug"] * 5,
    )
    counts = ngram_lm_counts(train)
    test = _docs(spark, ["the cat sat on the rug", "rug the on mat cat the"])
    got = {r["doc_id"]: r["ppl"] for r in ngram_lm_score(test, counts).collect()}
    assert got[0] < got[1]  # in-distribution word ORDER matters, not just vocab


def test_empty_docs_dropped_and_partition_invariant(spark):
    train = _docs(spark, ["x y z x y", "y z"])
    counts = ngram_lm_counts(train)
    docs = _docs(spark, ["x y", "", "   ", "z x y z"])
    a = ngram_lm_score(docs, counts)
    assert sorted(r["doc_id"] for r in a.collect()) == [0, 3]
    b = ngram_lm_score(docs.repartition(7), counts.repartition(5))
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    # float sums are partition-order-dependent in the last ulp; identity
    # holds to 1e-12 relative (the 6-decimal oracle rounding is far coarser)
    assert len(rows_a) == len(rows_b)
    for ra, rb in zip(rows_a, rows_b):
        assert ra[:2] == rb[:2]
        assert ra[2] == pytest.approx(rb[2], rel=1e-12)
        assert ra[3] == pytest.approx(rb[3], rel=1e-12)


def test_bad_k_raises(spark):
    train = _docs(spark, ["a b"])
    counts = ngram_lm_counts(train)
    with pytest.raises(ValueError, match="k > 0"):
        ngram_lm_score(train, counts, k=0.0)


def test_empty_counts_refused(spark):
    empty = ngram_lm_counts(_docs(spark, ["", "   "]))
    with pytest.raises(ValueError, match="no unigrams"):
        ngram_lm_score(_docs(spark, ["a b"]), empty)
