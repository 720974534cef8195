"""BPE tokenizer induction + application (functions/bpe.py).

Pinned: the distributed trainer with batch_merges=1 IS the classic
sequential algorithm (merge-for-merge equality against an independent
pure-Python reference); tokenization reconstructs the input exactly
(concat of a word's tokens == word + end marker) and compresses as the
merge list grows; training is deterministic and partition-invariant;
batched training picks only non-conflicting pairs; validation refuses
bad arguments.
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import Row

from cht_sync_spark.functions.bpe import (
    EOW,
    apply_merges_py,
    bpe_tokenize,
    train_bpe,
    word_counts,
)

CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest lower",
    "low low newer",
]


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)],
        "doc_id long, text string",
    )


def _reference_bpe(texts, num_merges):
    """Independent sequential BPE (Sennrich): no engine code shared
    beyond apply_merges_py's semantics, reimplemented inline."""
    wc = collections.Counter(
        w for t in texts for w in t.lower().split() if w
    )
    vocab = {w: list(w) + [EOW] for w in wc}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_classic_equality_with_reference(spark):
    d = _docs(spark)
    got = train_bpe(d, 12, batch_merges=1)
    want = _reference_bpe(CORPUS, 12)
    assert got == want


def test_tokenize_reconstructs_and_compresses(spark):
    d = _docs(spark)
    merges = train_bpe(d, 10)
    toks = {r["doc_id"]: r for r in bpe_tokenize(d, merges).collect()}
    for i, text in enumerate(CORPUS):
        ws = [w for w in text.lower().split() if w]
        # reconstruction: concatenated tokens == concatenated words + EOW
        assert "".join(toks[i]["tokens"]) == "".join(w + EOW for w in ws)
        assert toks[i]["n_tokens"] == len(toks[i]["tokens"])
    # more merges => never more tokens
    few = sum(r["n_tokens"] for r in bpe_tokenize(d, merges[:2]).collect())
    many = sum(r["n_tokens"] for r in bpe_tokenize(d, merges).collect())
    chars = sum(r["n_tokens"] for r in bpe_tokenize(d, []).collect())
    assert many < few <= chars


def test_partition_invariance_and_batched(spark):
    d = _docs(spark)
    base = train_bpe(d, 8)
    again = train_bpe(d.repartition(7), 8)
    assert base == again
    batched = train_bpe(d, 8, batch_merges=4)
    assert len(batched) == 8
    # a batch never merges conflicting pairs: within each round of 4, no
    # symbol participates in two chosen merges
    for r0 in range(0, 8, 4):
        used = set()
        for a, b in batched[r0 : r0 + 4]:
            assert a not in used and b not in used and (a + b) not in used
            used.update((a, b, a + b))
    # batched tokenization still reconstructs
    toks = bpe_tokenize(d, batched).collect()
    for r in toks:
        assert "".join(r["tokens"]).endswith(EOW)


def test_apply_merges_reference_semantics():
    assert apply_merges_py(list("aab") + [EOW], [("a", "a")]) == ["aa", "b", EOW]
    # in-order application: later merges see earlier results
    assert apply_merges_py(list("aab") + [EOW], [("a", "a"), ("aa", "b")]) == [
        "aab", EOW,
    ]
    # left-to-right within one merge: "aaa" -> ["aa", "a"]
    assert apply_merges_py(list("aaa"), [("a", "a")]) == ["aa", "a"]


def test_validation(spark):
    d = _docs(spark)
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(d, 0)
    with pytest.raises(ValueError, match="batch_merges"):
        train_bpe(d, 2, batch_merges=0)
    # merge budget larger than the pair space: trainer stops early
    tiny = _docs(spark, ["a a a"])
    got = train_bpe(tiny, 50)
    assert 0 < len(got) < 50


def test_word_counts(spark):
    wc = {r["word"]: r["cnt"] for r in word_counts(_docs(spark)).collect()}
    assert wc["low"] == 5 and wc["newer"] == 2


def test_tokenize_keeps_wordless_docs(spark):
    d = _docs(spark, ["hello world", "", "   "])
    out = {r["doc_id"]: r for r in bpe_tokenize(d, []).collect()}
    assert set(out) == {0, 1, 2}
    assert out[1]["tokens"] == [] and out[1]["n_tokens"] == 0
    assert out[2]["n_tokens"] == 0
    assert out[0]["n_tokens"] > 0
