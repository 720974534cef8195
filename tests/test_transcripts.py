"""Transcript-plane operators (functions/transcripts.py): conversation
assembly, SFT example extraction (incl. the token-budget truncation the
driver oracle doesn't cover), and the integrity QC gate."""

import pytest
from pyspark.sql import Row, functions as F

from cht_sync_spark.functions.transcripts import (
    assemble_conversations,
    sft_examples,
    transcript_integrity,
)


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        # conv a: clean alternation, 4 turns
        Row(conv_id="a", turn_idx=0, role="user", text="hello there friend"),
        Row(conv_id="a", turn_idx=1, role="assistant", text="hi how can I help"),
        Row(conv_id="a", turn_idx=2, role="user", text="sum two and two"),
        Row(conv_id="a", turn_idx=3, role="assistant", text="four"),
        # conv b: gap (idx 2 missing), role repeat, starts with assistant
        Row(conv_id="b", turn_idx=0, role="assistant", text="welcome"),
        Row(conv_id="b", turn_idx=1, role="user", text="q one"),
        Row(conv_id="b", turn_idx=3, role="user", text="q two"),
        Row(conv_id="b", turn_idx=4, role="assistant", text="a both"),
        # conv c: duplicate turn_idx (CDC conflict leak), null text
        Row(conv_id="c", turn_idx=0, role="user", text="only"),
        Row(conv_id="c", turn_idx=0, role="user", text="zonly"),
        Row(conv_id="c", turn_idx=1, role="assistant", text=None),
    ]
    return spark.createDataFrame(rows)


def test_assemble_order_and_counts(spark, turns):
    got = {r["conv_id"]: r for r in assemble_conversations(turns).collect()}
    a = got["a"]
    assert a["n_turns"] == 4
    assert a["conversation_text"] == (
        "user: hello there friend\nassistant: hi how can I help\n"
        "user: sum two and two\nassistant: four"
    )
    # whitespace tokens of the joined text (role labels count): 4 labels
    # + 3 + 5 + 4 + 1 text tokens
    assert a["n_tokens"] == 17
    # duplicate turn_idx: deterministic struct-order tiebreak (text asc)
    c = got["c"]
    assert c["conversation_text"] == "user: only\nuser: zonly\nassistant: "
    assert c["n_turns"] == 3


def test_sft_examples_window(spark, turns):
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in sft_examples(turns, context_turns=8).collect()
    }
    # every assistant turn becomes an example
    assert set(got) == {("a", 1), ("a", 3), ("b", 0), ("b", 4), ("c", 1)}
    assert got[("a", 3)]["context_text"] == (
        "user: hello there friend\nassistant: hi how can I help\nuser: sum two and two"
    )
    assert got[("a", 3)]["n_context_turns"] == 3
    # first turn of a conversation: empty context, not null
    assert got[("b", 0)]["context_text"] == ""
    assert got[("b", 0)]["n_context_turns"] == 0
    # bounded frame: context_turns=1 keeps only the immediately prior turn
    one = {
        (r["conv_id"], r["turn_idx"]): r
        for r in sft_examples(turns, context_turns=1).collect()
    }
    assert one[("a", 3)]["context_text"] == "user: sum two and two"


def test_sft_budget_truncation(spark, turns):
    # conv a, target idx 3; context lines and their whitespace token counts:
    #   user: hello there friend      -> text tokens 3
    #   assistant: hi how can I help  -> text tokens 5
    #   user: sum two and two         -> text tokens 4
    # budget counts TEXT tokens (not the role labels)
    def ctx(budget):
        got = {
            (r["conv_id"], r["turn_idx"]): r
            for r in sft_examples(turns, context_turns=8, budget_tokens=budget).collect()
        }
        return got[("a", 3)]

    # budget fits all (3+5+4=12)
    assert ctx(12)["n_context_turns"] == 3
    # budget 11: drop the OLDEST turn (5+4=9 fits)
    r = ctx(11)
    assert r["n_context_turns"] == 2
    assert r["context_text"].startswith("assistant: hi how can I help")
    # exact boundary: suffix == budget is kept
    assert ctx(9)["n_context_turns"] == 2
    assert ctx(8)["n_context_turns"] == 1
    # budget below the most recent turn: empty context, example survives
    r = ctx(3)
    assert r["n_context_turns"] == 0
    assert r["context_text"] == ""
    assert r["target_text"] == "four"


def test_integrity_flags(spark, turns):
    got = {r["conv_id"]: r for r in transcript_integrity(turns).collect()}
    a, b, c = got["a"], got["b"], got["c"]
    assert (a["n_dup_turns"], bool(a["has_gaps"]), a["n_role_repeats"]) == (0, False, 0)
    assert a["starts_with_user"] and a["n_turns"] == 4
    # b: gap at idx 2, consecutive user-user repeat, assistant-first
    assert (b["n_dup_turns"], bool(b["has_gaps"]), b["n_role_repeats"]) == (0, True, 1)
    assert not b["starts_with_user"]
    # c: duplicate key counted once as dup, no gap (0,0,1 distinct = 2 idx)
    assert (c["n_dup_turns"], bool(c["has_gaps"]), c["n_role_repeats"]) == (1, False, 1)


def test_single_exchange_plans(spark, turns):
    # assembly: one hash aggregate exchange, no join/window
    plan = assemble_conversations(turns)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "Join" not in plan
    # integrity: the groupBy reuses the window's hash partitioning
    plan = transcript_integrity(turns)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "Join" not in plan
    # sft: one exchange for the window sort, no join
    plan = sft_examples(turns, 4)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "Join" not in plan


def test_hot_conversation_bounded_context(spark):
    # 1,000-turn conversation: examples stay O(context_turns) wide
    long_turns = spark.range(1000).select(
        F.lit("hot").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.when(F.col("id") % 2 == 0, "user").otherwise("assistant").alias("role"),
        F.concat(F.lit("turn "), F.col("id")).alias("text"),
    )
    out = sft_examples(long_turns, context_turns=4)
    stats = out.agg(
        F.count("*").alias("n"), F.max("n_context_turns").alias("mx")
    ).first()
    assert stats["n"] == 500 and stats["mx"] == 4
    last = out.where(F.col("turn_idx") == 999).first()
    assert last["context_text"] == (
        "assistant: turn 995\nuser: turn 996\nassistant: turn 997\nuser: turn 998"
    )
