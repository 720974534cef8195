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
    """63-bit SimHash over whitespace tokens, fully JVM-side.

    Per token: xxhash64 rendered as a 64-char binary string (``bin`` —
    shift-by-column doesn't exist in Spark, string bits do); per bit:
    majority vote (+1/-1) across tokens via one ``aggregate`` over a
    63-slot counter array (no explode — one row stays one row, cost linear
    in tokens). The sign bit is left 0 so the result reassembles into a
    non-negative long via ``conv`` without overflow.
    """
    tok_bins = F.transform(words(col), lambda w: F.lpad(F.bin(F.xxhash64(w)), 64, "0"))
    bits = F.sequence(F.lit(1), F.lit(63))  # 1-based positions in the bin string
    counters = F.aggregate(
        tok_bins,
        F.transform(bits, lambda b: F.lit(0).cast("long")),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(bits, lambda b: F.when(F.substr(s, b + 1, F.lit(1)) == "1", F.lit(1)).otherwise(F.lit(-1)).cast("long")),
            lambda a, v: a + v,
        ),
    )
    simbin = F.array_join(
        F.transform(counters, lambda c: F.when(c > 0, F.lit("1")).otherwise(F.lit("0"))), ""
    )
    hi = F.conv(F.substring(simbin, 1, 31), 2, 10).cast("long")
    lo = F.conv(F.substring(simbin, 32, 32), 2, 10).cast("long")
    return hi * F.lit(2**32).cast("long") + lo


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


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
