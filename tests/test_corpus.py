"""Corpus-curation operators (functions/corpus.py): contamination,
deterministic splits / stratified sampling, repetition stats.

The driver's CORRECTNESS gate cross-checks these against DuckDB; the pins
here are the properties the oracle can't express — determinism under
re-partitioning, planted-leak recall, and hand-computed repetition counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cht_sync_spark.functions.corpus import (
    contamination,
    hash_split,
    repetition_stats,
    sample_stratified,
    split_threshold_hex,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ------------------------------------------------------------- thresholds
def test_threshold_hex_bounds():
    assert split_threshold_hex(0.0) == "00000000"
    assert split_threshold_hex(0.5) == "80000000"
    assert split_threshold_hex(1.0) == "g"  # > every lowercase-hex hash
    assert "ffffffff" < "g"
    with pytest.raises(ValueError):
        split_threshold_hex(1.5)


# -------------------------------------------------------------- hash_split
def test_hash_split_deterministic_and_partition_invariant(spark):
    rows = [(i, f"text {i}", "en") for i in range(2000)]
    d = _docs(spark, rows)
    a = {r.doc_id: r.split for r in hash_split(d).collect()}
    # different physical layout -> identical assignment
    b = {
        r.doc_id: r.split
        for r in hash_split(d.repartition(7, "lang")).collect()
    }
    assert a == b
    # rough proportions (md5 is uniform; 2000 draws)
    n = len(a)
    frac_train = sum(v == "train" for v in a.values()) / n
    assert 0.85 <= frac_train <= 0.95
    assert set(a.values()) == {"train", "val", "test"}


def test_hash_split_weights_validated(spark):
    d = _docs(spark, [(1, "x", "en")])
    with pytest.raises(ValueError):
        hash_split(d, weights={"train": 0.5, "val": 0.1})


def test_hash_split_salt_changes_assignment(spark):
    d = _docs(spark, [(i, "x", "en") for i in range(500)])
    a = {r.doc_id: r.split for r in hash_split(d, salt="s1").collect()}
    b = {r.doc_id: r.split for r in hash_split(d, salt="s2").collect()}
    assert a != b  # independent coins


# ------------------------------------------------------ sample_stratified
def test_sample_stratified_rate_edges(spark):
    rows = [(i, "x", "en" if i % 2 == 0 else "zh") for i in range(400)]
    d = _docs(spark, rows)
    kept = sample_stratified(d, rates={"en": 1.0, "zh": 0.0}).collect()
    langs = {r.lang for r in kept}
    assert langs == {"en"}
    assert len(kept) == 200  # rate 1.0 keeps the WHOLE stratum


def test_sample_stratified_default_rate(spark):
    rows = [(i, "x", "fr") for i in range(1000)]
    d = _docs(spark, rows)
    n = sample_stratified(d, rates={"en": 0.1}, default_rate=0.5).count()
    assert 400 <= n <= 600


# ----------------------------------------------------------- contamination
def test_contamination_planted_leak(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, bench_text, "en"),                       # verbatim leak
        (2, "one two three four five six seven", "en"),  # disjoint
        (3, "xx " + bench_text + " yy", "en"),       # superstring leak
    ]
    bench = _docs(spark, [(100, bench_text, "en")])
    out = {
        r.doc_id: r
        for r in contamination(_docs(spark, rows), bench, n=5).collect()
    }
    assert out[1].contamination_ratio == 1.0
    assert out[2].n_contaminated == 0
    assert out[3].n_contaminated == 4  # the 4 bench 5-grams inside
    assert out[3].n_grams == 6


def test_contamination_hashed_matches_string_form(spark):
    rows = [(i, f"w{i} common phrase here tail{i} z{i} q{i}", "en") for i in range(50)]
    bench = _docs(spark, [(999, "common phrase here tail7 z7 q7 extra", "en")])
    d = _docs(spark, rows)
    s = {(r.doc_id, r.n_contaminated) for r in contamination(d, bench, n=3).collect()}
    h = {
        (r.doc_id, r.n_contaminated)
        for r in contamination(d, bench, n=3, hashed=True).collect()
    }
    assert s == h


# --------------------------------------------------------- repetition_stats
def test_repetition_stats_hand_computed(spark):
    rows = [
        (1, "a a a a", "en"),        # 2-grams: [a a]x3 ; 3-grams: [a a a]x2
        (2, "a b c d", "en"),        # no repetition
        (3, "a b a b a", "en"),      # 2-grams: a b, b a, a b, b a
        (4, "solo", "en"),           # too short for any n-gram
    ]
    out = {r.doc_id: r for r in repetition_stats(_docs(spark, rows)).collect()}

    r1 = out[1]
    assert r1.n_words == 4
    assert r1.dup_word_frac == pytest.approx(0.75)
    assert r1.top2_frac == pytest.approx(1.0)   # best run 3 / 3 grams
    assert r1.dup3_frac == pytest.approx(1.0)   # both 3-grams duplicated

    r2 = out[2]
    assert r2.dup_word_frac == 0.0
    assert r2.top2_frac == pytest.approx(1 / 3)  # all 2-grams unique, max run 1
    assert r2.dup3_frac == 0.0

    r3 = out[3]
    assert r3.top2_frac == pytest.approx(0.5)   # "a b" twice / 4 slots
    assert r3.dup3_frac == pytest.approx(2 / 3)  # "a b a" twice of 3

    r4 = out[4]
    assert (r4.top2_frac, r4.dup3_frac) == (0.0, 0.0)


def test_repetition_stats_zero_shuffle_plan(spark):
    d = _docs(spark, [(1, "a b c", "en")])
    plan = repetition_stats(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map stage


def test_hash_split_zero_shuffle_plan(spark):
    d = _docs(spark, [(1, "a", "en")])
    plan = hash_split(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --------------------------------------------------------------- packing
def test_pack_sequences_hand_computed(spark):
    from cht_sync_spark.functions.corpus import pack_sequences

    rows = [
        (1, "a b c", "s1"),          # 3 tokens, before=0  -> bin 0 @ 0
        (2, "d e f g", "s1"),        # 4 tokens, before=3  -> bin 0 @ 3
        (3, "h i j k l m", "s1"),    # 6 tokens, before=7  -> bin 0 @ 7 (straddles)
        (4, "n", "s1"),              # 1 token,  before=13 -> bin 1 @ 3
        (5, "x y", "s2"),            # other shard restarts at 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.doc_id: (r.n_tokens, r.bin_id, r.bin_offset)
        for r in pack_sequences(df, budget=10).collect()
    }
    assert out == {
        1: (3, 0, 0),
        2: (4, 0, 3),
        3: (6, 0, 7),
        4: (1, 1, 3),
        5: (2, 0, 0),
    }


def test_pack_sequences_partition_invariant_and_reconstructs(spark):
    from cht_sync_spark.functions.corpus import pack_sequences

    rows = [(i, " ".join(["w"] * (1 + i % 17)), f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = pack_sequences(df, budget=64).collect()
    b = pack_sequences(df.repartition(7), budget=64).collect()
    key = lambda r: (r.doc_id, r.bin_id, r.bin_offset)
    assert sorted(map(key, a)) == sorted(map(key, b))
    # stream reconstruction: within a shard, each doc starts exactly where
    # the previous one ended (offset arithmetic mod budget)
    for shard in ("s0", "s1", "s2"):
        seq = sorted((r for r in a if r.source == shard), key=lambda r: r.doc_id)
        pos = 0
        for r in seq:
            assert (r.bin_id, r.bin_offset) == (pos // 64, pos % 64)
            pos += r.n_tokens


def test_pack_sequences_null_text_is_zero_tokens(spark):
    from cht_sync_spark.functions.corpus import pack_sequences

    rows = [(1, "a b", "s"), (2, None, "s"), (3, "c", "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: (r.n_tokens, r.bin_id, r.bin_offset)
           for r in pack_sequences(df, budget=4).collect()}
    # the null doc occupies zero tokens and stays PLACED (not null bins)
    assert out == {1: (2, 0, 0), 2: (0, 0, 2), 3: (1, 0, 2)}


# ------------------------------------------------- distribution reports
def test_length_quantiles_exact_interpolation(spark):
    from cht_sync_spark.functions.corpus import length_quantiles

    # 4 values in one group: p50 of [10, 20, 30, 40] interpolates to 25.0
    rows = [(1, "a", "en", 10), (2, "b", "en", 20), (3, "c", "en", 30),
            (4, "d", "en", 40), (5, "e", "de", 7)]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    out = {r.lang: r for r in length_quantiles(d, "lang", "n_chars").collect()}
    en = out["en"]
    assert (en.n, en.mean, en.vmin, en.vmax) == (4, 25.0, 10.0, 40.0)
    assert en.p50 == 25.0                       # linear interpolation
    assert en.p90 == pytest.approx(37.0)        # 10 + 0.9*3 order stats
    assert out["de"].p50 == 7.0 and out["de"].n == 1

    # approx form: same shape, sketch values (not oracle-checked)
    ap = {r.lang: r for r in
          length_quantiles(d, "lang", "n_chars", approx=True).collect()}
    assert set(ap) == {"en", "de"} and ap["en"].n == 4


def test_length_quantiles_single_aggregate_plan(spark):
    from cht_sync_spark.functions.corpus import length_quantiles

    d = spark.createDataFrame(
        [(i, "t", "en", i) for i in range(100)],
        "doc_id long, text string, lang string, n_chars long")
    plan = length_quantiles(d)._jdf.queryExecution().executedPlan().toString()
    # one keyed aggregate pair, no window / join / extra exchange
    assert plan.count("Exchange") == 1 and "Window" not in plan


def test_composition_rollup_levels_and_grouping_id(spark):
    from cht_sync_spark.functions.corpus import composition_rollup

    rows = [(1, "a", "en", "web", 10), (2, "b", "en", "web", 20),
            (3, "c", "en", "book", 5), (4, "d", None, "web", 2)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = composition_rollup(d, ("lang", "source"), "n_chars").collect()
    assert len(out) == 3 + 2 + 1  # leaf sets + per-lang + grand total
    by = {(r.lang, r.source, r.gid): (r.n_docs, r.volume) for r in out}
    assert by[("en", "web", 0)] == (2, 30)
    assert by[("en", None, 1)] == (3, 35)       # subtotal: gid says rolled-up
    assert by[(None, "web", 0)] == (1, 2)       # genuine NULL lang: gid 0
    assert by[(None, None, 1)] == (1, 2)
    assert by[(None, None, 3)] == (4, 37)       # grand total

    # ONE Expand + ONE aggregate pair: a single shuffle for all levels
    plan = composition_rollup(d)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan and plan.count("Exchange") == 1


def test_sample_exact_k_counts_and_brute_force_parity(spark):
    """sample_exact_k: exactly min(k, n) per stratum, and the fast
    pre-filtered path returns EXACTLY the brute-force rank's rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cht_sync_spark.functions.corpus import _hash8, sample_exact_k

    def lang(i):
        # en 300 / fr 300 / mid 300 (window path) + tiny 3 (n < k: the
        # keep-all threshold branch AND the min(k, n) = n output size)
        return "en" if i < 300 else "fr" if i < 600 else "mid" if i < 900 else "tiny"

    rows = [(i, f"t{i}", lang(i), "w", i) for i in range(903)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    k = 25
    got = sample_exact_k(d, k)
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {s: min(k, n) for s, n in sizes.items()}

    h = _hash8(F.col("doc_id"), "reservoir")
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    brute = d.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k).drop("__rn")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, brute.collect()))

    # partition invariance (re-shard stability)
    again = sample_exact_k(d.repartition(11), k)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, got.collect()))


def test_sample_exact_k_validation(spark):
    import pytest

    from cht_sync_spark.functions.corpus import sample_exact_k

    d = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="k must be positive"):
        sample_exact_k(d, 0)
