"""Curation funnel, document chunking, and BM25 keyword search.

Pins: funnel attribution goes to the FIRST failing stage and costs zero
shuffles; the report's remaining column telescopes to the survivor count;
chunking covers every token, reconstructs the original stream, and is
partition-invariant; BM25 matches a hand-computed score and ranks by
term rarity and frequency deterministically.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cht_sync_spark.functions.corpus import (
    chunk_documents,
    curation_funnel,
    funnel_report,
)
from cht_sync_spark.functions.search import bm25_topk


def _docs(spark, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang) for i, (t, lang) in enumerate(zip(texts, langs))],
        "doc_id long, text string, lang string",
    )


STAGES = lambda: [  # noqa: E731
    ("too_short", F.length("text") >= 10),
    ("bad_lang", F.col("lang") == "en"),
    ("no_spark", F.col("text").contains("spark")),
]


def test_funnel_attributes_first_failing_stage(spark):
    df = _docs(
        spark,
        ["spark is a fine engine", "tiny", "ein langer deutscher satz", "a long text without the word"],
        ["en", "de", "de", "en"],
    )
    v = curation_funnel(df, STAGES())
    got = {r.doc_id: r.dropped_at for r in v.collect()}
    # doc 1 fails too_short AND bad_lang -> attributed to too_short (first)
    assert got == {0: None, 1: "too_short", 2: "bad_lang", 3: "no_spark"}


def test_funnel_null_predicate_drops(spark):
    df = _docs(spark, ["spark text here", None])
    v = curation_funnel(df, [("too_short", F.length("text") >= 3)])
    got = {r.doc_id: r.dropped_at for r in v.collect()}
    assert got == {0: None, 1: "too_short"}  # null length must not pass a gate


def test_funnel_is_zero_shuffle(spark):
    df = _docs(spark, ["spark"] * 4)
    plan = curation_funnel(df, STAGES())._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_funnel_report_telescopes(spark):
    df = _docs(
        spark,
        ["spark is a fine engine", "tiny", "ein langer deutscher satz", "also quite long but wrong"],
        ["en", "de", "de", "en"],
    )
    v = curation_funnel(df, STAGES())
    rep = {r.stage: (r.stage_idx, r.dropped, r.remaining) for r in funnel_report(v, STAGES()).collect()}
    assert rep == {
        "too_short": (0, 1, 3),
        "bad_lang": (1, 1, 2),
        "no_spark": (2, 1, 1),
    }


def test_funnel_zero_drop_stage_reported(spark):
    df = _docs(spark, ["spark one two three", "spark four five six"])
    stages = [("never", F.lit(True)), ("no_spark", F.col("text").contains("spark"))]
    rep = {r.stage: r.dropped for r in funnel_report(curation_funnel(df, stages), stages).collect()}
    assert rep == {"never": 0, "no_spark": 0}


def test_chunking_hand_example(spark):
    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    df = _docs(spark, [text])
    out = chunk_documents(df, chunk_tokens=4, overlap=1)
    got = {r.chunk_id: (r.chunk_text, r.chunk_n_tokens) for r in out.collect()}
    assert got == {
        0: ("t0 t1 t2 t3", 4),
        1: ("t3 t4 t5 t6", 4),
        2: ("t6 t7 t8 t9", 4),
    }


@pytest.mark.parametrize("n", [1, 3, 4, 5, 8, 11, 13])
def test_chunking_reconstructs_token_stream(spark, n):
    size, overlap = 4, 2
    toks = [f"w{i}" for i in range(n)]
    df = _docs(spark, [" ".join(toks)])
    rows = sorted(
        chunk_documents(df, chunk_tokens=size, overlap=overlap).collect(),
        key=lambda r: r.chunk_id,
    )
    rebuilt = rows[0].chunk_text.split()
    for r in rows[1:]:
        rebuilt += r.chunk_text.split()[overlap:]
    assert rebuilt == toks
    # every chunk except the last is full-size; none shorter than stride+?
    assert all(r.chunk_n_tokens == size for r in rows[:-1])
    assert rows[-1].chunk_n_tokens == len(rows[-1].chunk_text.split())


def test_chunking_empty_and_validation(spark):
    df = _docs(spark, ["", "   ", None, "one"])
    out = chunk_documents(df, chunk_tokens=4, overlap=1)
    got = {(r.doc_id, r.chunk_id): r.chunk_text for r in out.collect()}
    assert got == {(3, 0): "one"}  # empty/whitespace/null docs yield no chunks
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunking_partition_invariant(spark):
    texts = [" ".join(f"d{i}w{j}" for j in range(i + 1)) for i in range(30)]
    df = _docs(spark, texts)
    a = {(r.doc_id, r.chunk_id, r.chunk_text) for r in chunk_documents(df, 5, 2).collect()}
    b = {
        (r.doc_id, r.chunk_id, r.chunk_text)
        for r in chunk_documents(df.repartition(7), 5, 2).collect()
    }
    assert a == b and len(a) > 30


def _bm25_ref(corpus, terms, k1=1.2, b=0.75):
    """Tiny independent python BM25 for parity."""
    toks = [t.lower().split() for t in corpus]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    out = {}
    for term in terms:
        df_ = sum(1 for t in toks if term in t)
        if df_ == 0:
            continue
        idf = math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
        for i, t in enumerate(toks):
            tf = t.count(term)
            if tf:
                out[i] = out.get(i, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(t) / avgdl)
                )
    return out


def test_bm25_matches_reference_math(spark):
    corpus = [
        "spark merge window merge merge",
        "window window table scan",
        "merge of the century",
        "totally unrelated text here",
        "spark spark spark spark spark spark",
    ]
    df = _docs(spark, corpus)
    got = {r.doc_id: r.score for r in bm25_topk(df, ["merge", "window"], k=5).collect()}
    ref = _bm25_ref(corpus, ["merge", "window"])
    assert set(got) == set(ref)
    for i, s in got.items():
        assert s == pytest.approx(ref[i], rel=1e-9)


def test_bm25_ranking_properties(spark):
    corpus = [
        "common common common rare",   # has the rare term
        "common common common common", # only common
        "common rare rare",            # most rare hits
    ] + ["common filler text"] * 5
    df = _docs(spark, corpus)
    top = [r.doc_id for r in bm25_topk(df, ["rare"], k=3).collect()]
    assert top[0] == 2 and top[1] == 0  # more hits of the rare term wins
    # rare term outweighs common term under an OR query
    both = {r.doc_id: r.score for r in bm25_topk(df, ["rare", "common"], k=8).collect()}
    assert both[2] > both[1]


def test_bm25_deterministic_ties_and_validation(spark):
    corpus = ["tie term text"] * 6
    df = _docs(spark, corpus)
    top = [r.doc_id for r in bm25_topk(df, ["term"], k=3).collect()]
    assert top == [0, 1, 2]  # equal scores break by doc id
    with pytest.raises(ValueError, match="term"):
        bm25_topk(df, [])


# --------------------------------------------------------------- shard export

def test_export_shards_roundtrip_and_manifest(spark, tmp_path):
    from cht_sync_spark.functions.corpus import export_shards, shard_assign

    texts = [" ".join(f"d{i}w{j}" for j in range(1 + i % 7)) for i in range(200)]
    df = _docs(spark, texts)
    out = str(tmp_path / "shards")
    manifest = export_shards(df.select("doc_id", "text"), out, 8)
    rows = {r.shard_id: r for r in manifest.collect()}
    assert sum(r.n_docs for r in rows.values()) == 200
    # one file per shard directory
    import os

    for k in rows:
        d = os.path.join(out, f"shard={k}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1
    # round trip: the exported corpus is exactly the input
    back = spark.read.parquet(out)
    assert back.count() == 200
    got = {(r.doc_id, r.text) for r in back.select("doc_id", "text").collect()}
    assert got == {(r.doc_id, r.text) for r in df.select("doc_id", "text").collect()}
    # manifest agrees with a recount over the exported files (reader audit)
    from pyspark.sql import functions as F2

    re_manifest = {
        r.shard: (r.n, r.toks)
        for r in back.groupBy("shard")
        .agg(
            F2.count(F2.lit(1)).alias("n"),
            F2.sum(F2.size(F2.split(F2.trim("text"), r"\s+"))).alias("toks"),
        )
        .collect()
    }
    for k, r in rows.items():
        assert re_manifest[k] == (r.n_docs, r.n_tokens)
    # assignment is partition-invariant (re-shard stability)
    a = {r.doc_id: r.s for r in df.select("doc_id", shard_assign(F2.col("doc_id"), 8).alias("s")).collect()}
    b = {
        r.doc_id: r.s
        for r in df.repartition(13)
        .select("doc_id", shard_assign(F2.col("doc_id"), 8).alias("s"))
        .collect()
    }
    assert a == b and set(a.values()) == set(range(8))


def test_export_shards_checksum_detects_corruption(spark, tmp_path):
    from cht_sync_spark.functions.corpus import export_shards

    df = _docs(spark, [f"doc number {i} words" for i in range(50)])
    m1 = {r.shard_id: r.checksum for r in export_shards(df.select("doc_id", "text"), str(tmp_path / "a"), 4).collect()}
    df2 = df.withColumn(
        "text",
        F.when(F.col("doc_id") == 17, F.lit("tampered")).otherwise(F.col("text")),
    )
    m2 = {r.shard_id: r.checksum for r in export_shards(df2.select("doc_id", "text"), str(tmp_path / "b"), 4).collect()}
    diff = [k for k in m1 if m1[k] != m2[k]]
    assert len(diff) == 1  # exactly the shard holding doc 17


def test_export_shards_validation(spark, tmp_path):
    from cht_sync_spark.functions.corpus import export_shards

    df = _docs(spark, ["x"])
    with pytest.raises(ValueError, match="fmt"):
        export_shards(df, str(tmp_path / "x"), 4, fmt="csvish")
