"""Byte-pair-encoding tokenizer induction and application — Spark-first.

Training-data pipelines need a learned subword vocabulary (token budgets,
packing, dedup shingles, LM features all count in tokens); BPE (Sennrich
et al. 2016, the GPT-2/RoBERTa tokenizer family) is the standard
induction: start from characters, repeatedly merge the most frequent
adjacent symbol pair.

The scale insight (same as the original implementation): BPE trains on
the WORD-FREQUENCY TABLE, not the corpus — `groupBy(word)` collapses
100 TB of text into a Zipf-bounded vocabulary (one shuffle with map-side
combine does the heavy lifting), and every training round is then an
aggregation over that vocabulary-sized table:

1. pair counts: explode each word's adjacent symbol pairs weighted by the
   word's count — ONE hash aggregation per round;
2. pick the top merge(s) by (count desc, pair asc) — deterministic; with
   ``batch_merges > 1`` the standard parallel approximation takes the B
   best NON-CONFLICTING pairs per round (no symbol shared between chosen
   pairs), cutting rounds by ~B while staying deterministic (equality
   with the classic one-merge-per-round trainer is NOT guaranteed — that
   is the documented trade; ``batch_merges=1`` IS the classic algorithm,
   pinned against a sequential reference in tests);
3. apply the merges to the symbol arrays — an Arrow ``applyInPandas``-
   style grouped map over the vocabulary table (vectorized Python on
   vocab-sized data, never on the corpus).

Tokenization then never touches Python row-at-a-time either:
``bpe_tokenize`` computes the word→tokens mapping ONCE over the DISTINCT
words of the input (vocab-sized Arrow job) and broadcast-joins it back —
tokenizing 100 TB is a map-side dictionary join.

Determinism: no RNG anywhere; ties break lexicographically; the merge
list is an ordered artifact (the tokenizer model) the caller persists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words

__all__ = ["word_counts", "train_bpe", "apply_merges_py", "bpe_tokenize"]

# end-of-word marker (Sennrich's </w>): lets the tokenizer distinguish
# "est" inside a word from "est" at the end
EOW = "▁"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — the Zipf-collapsed training input. One shuffle."""
    return (
        df.select(F.explode(words(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _init_symbols(word: str) -> list[str]:
    return list(word) + [EOW]


def apply_merges_py(symbols: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Reference merge application (also used inside the Arrow UDF):
    apply each merge IN ORDER, left-to-right within the word."""
    for a, b in merges:
        if len(symbols) < 2:
            break
        out = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, n) over adjacent symbol pairs, weighted by word count —
    one explode + one aggregation over the vocabulary table."""
    syms = F.col("symbols")
    n = F.size(syms)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array())
    return (
        vocab.select(F.col("cnt"), F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("n"))
    )


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    batch_merges: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a document corpus. Returns the
    ordered merge list (the tokenizer model).

    Driver memory: O(batch) collected pair rows per round (top-B only);
    the vocabulary table stays distributed. Rounds = num_merges /
    batch_merges aggregations over vocab-sized data."""
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    if batch_merges <= 0:
        raise ValueError(f"batch_merges must be positive, got {batch_merges}")
    spark = df.sparkSession
    vocab = word_counts(df, text_col).select(
        F.col("cnt"),
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("symbols"),
    )
    # the vocab table is re-aggregated every round: keep it materialized
    vocab = vocab.persist()
    vocab.count()
    merges: list[tuple[str, str]] = []
    try:
        while len(merges) < num_merges:
            want = min(batch_merges, num_merges - len(merges))
            # over-fetch 4x then drop conflicts driver-side (bounded collect)
            top = (
                _pair_counts(vocab)
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(max(4 * want, 16))
                .collect()
            )
            chosen: list[tuple[str, str]] = []
            used: set[str] = set()
            for r in top:
                a, b = r["a"], r["b"]
                # non-conflicting: no symbol of this pair participates in an
                # earlier chosen merge this round (order of application
                # within a round would otherwise matter)
                if a in used or b in used or (a + b) in used:
                    continue
                chosen.append((a, b))
                used.update((a, b, a + b))
                if len(chosen) >= want:
                    break
            if not chosen:
                break  # vocabulary exhausted (no pairs left)
            merges.extend(chosen)
            batch = list(chosen)

            def gen(batches, _m=batch):
                import pandas as pd

                for pdf in batches:
                    pdf = pdf.copy()
                    pdf["symbols"] = pdf["symbols"].map(
                        lambda s: apply_merges_py(list(s), _m)
                    )
                    yield pdf
            new_vocab = vocab.mapInPandas(gen, schema=vocab.schema).persist()
            new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
    return merges


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — apply a learned merge list.

    The word→tokens dictionary is computed ONCE over the input's DISTINCT
    words (vocab-sized Arrow job) and broadcast-joined back, so the
    corpus-sized side is a pure map stage: split, join, flatten. Word
    order is preserved (posexplode + ordered re-assembly)."""
    toks = df.select(
        F.col(id_col), words(F.lower(F.col(text_col))).alias("__ws")
    )
    distinct_words = toks.select(F.explode("__ws").alias("word")).distinct()
    m = list(merges)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["toks"] = pdf["word"].map(
                lambda w: apply_merges_py(_init_symbols(w), m)
            )
            yield pdf[["word", "toks"]]

    dic = distinct_words.mapInPandas(gen, schema="word string, toks array<string>")
    per_word = (
        toks.select(F.col(id_col), F.posexplode("__ws").alias("__pos", "word"))
        .join(F.broadcast(dic), "word")
    )
    agg = per_word.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("toks")))
                ),
                lambda s: s["toks"],
            )
        ).alias("tokens")
    )
    # word-less documents (empty/whitespace text) produce no exploded rows
    # — left-join them back as (tokens=[], n_tokens=0) instead of silently
    # dropping them from the output
    return (
        toks.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("tokens"), F.array().cast("array<string>")).alias("tokens"),
        )
        .select(id_col, "tokens", F.size("tokens").alias("n_tokens"))
    )
