"""Conversation-level operators over transcript tables — the payload this
engine ingests (``BASELINE.json`` input_hint: ``(conv_id, turn_idx, role,
text, tool, ts)``). The CDC plane reconciles turn ROWS; these operators
turn reconciled rows back into training artifacts:

- :func:`assemble_conversations` — the full conversation as one ordered,
  role-tagged document (the unit SFT/pretraining corpora store);
- :func:`sft_examples` — one (context, target) pair per assistant turn,
  with a bounded context window and an optional token budget (the
  example-assembly stage of an instruction-tuning pipeline);
- :func:`transcript_integrity` — per-conversation QC: duplicate turn keys,
  index gaps, role-alternation violations (the gate that keeps malformed
  conversations out of training bins).

Reference parity: the reference has no conversation plane (its dbt models
are row-wise projections, ``tests/dbt/package/models/contacts/*.sql``);
these extend the engine toward the transcripts payload the north_star
targets, in the style of functions/sessions.py.

Shape at scale (100 TB of turns):
- every operator is ONE hash exchange keyed by ``conv_id`` (assembly and
  integrity are a single groupBy; examples are a single window sort) —
  no joins, no broadcast state;
- per-group memory is O(conversation), which is inherent: the assembled
  conversation IS one output value. Hot conversations (the 2,500-turn
  skew case in the bench feed) are bounded by the context window in
  :func:`sft_examples` (O(context_turns) per row, not O(n_turns));
- everything is pure Catalyst (collect_list/array_sort/transform/
  aggregate lambdas) — whole-stage-codegen'd, no Python on the path.

All three are deliberately ANSI-replayable (DuckDB oracles in
``__spark_entry__.oracle_sql``): ordering ties are broken on full struct
order, token counts are whitespace splits, and the context join uses a
plain ``\\n`` separator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "assemble_conversations",
    "sft_examples",
    "transcript_integrity",
]


def _line(role: Column, text: Column) -> Column:
    """One rendered turn: ``role: text`` (null-safe on both sides)."""
    return F.concat_ws(": ", F.coalesce(role, F.lit("")), F.coalesce(text, F.lit("")))


def assemble_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """One row per conversation: turns in ``turn_idx`` order rendered as
    ``role: text`` lines joined by newlines, plus turn/token counts.

    ONE aggregation keyed by ``conv_id``: ``array_sort(collect_list(...))``
    orders by the struct's leading field (``turn_idx``), with role/text as
    deterministic tiebreaks for (malformed) duplicate indexes — the same
    total order the DuckDB oracle's ``string_agg(... ORDER BY ...)`` uses.
    Map-side partial aggregation keeps the exchange at one in-flight array
    per conversation; the sort is per-group O(n log n), not a global sort.
    """
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(idx_col).alias("i"),
                F.col(role_col).alias("r"),
                F.col(text_col).alias("t"),
            )
        )
    )
    out = df.groupBy(F.col(conv_col).alias("conv_id")).agg(arr.alias("__arr"))
    text = F.array_join(F.transform("__arr", lambda s: _line(s["r"], s["t"])), "\n")
    return out.select(
        "conv_id",
        F.size("__arr").alias("n_turns"),
        text.alias("conversation_text"),
    ).withColumn(
        "n_tokens",
        F.size(F.filter(F.split(F.trim("conversation_text"), r"\s+"), lambda w: w != "")),
    )


def sft_examples(
    df: DataFrame,
    context_turns: int = 8,
    budget_tokens: int | None = None,
    target_role: str = "assistant",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """One (context, target) training pair per ``target_role`` turn.

    The context is the up-to-``context_turns`` immediately preceding turns
    (any role), rendered like :func:`assemble_conversations`; with
    ``budget_tokens`` set, the OLDEST context turns are dropped at turn
    granularity until the kept lines total <= budget whitespace tokens —
    the truncate-from-the-front rule instruction-tuning pipelines use (the
    most recent exchange matters most).

    ONE window (partition ``conv_id``, order ``turn_idx``) with a ROWS
    frame: per-row state is O(context_turns) regardless of conversation
    length, so the 2,500-turn hot conversations cost the same per row as
    the 6-turn median. The budget trim is a per-row lambda over the
    <=``context_turns``-element array (O(K^2) prefix sums with K bounded
    and small — deliberately NOT a per-token explode).
    """
    if context_turns < 1:
        raise ValueError(f"context_turns must be >= 1, got {context_turns}")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(idx_col).asc(), F.col(role_col).asc(), F.col(text_col).asc())
        .rowsBetween(-context_turns, -1)
    )
    ctx = F.collect_list(F.struct(F.col(role_col).alias("r"), F.col(text_col).alias("t"))).over(w)
    out = (
        df.withColumn("__ctx", ctx)
        .where(F.col(role_col) == target_role)
        .select(
            F.col(conv_col).alias("conv_id"),
            F.col(idx_col).alias("turn_idx"),
            F.col("__ctx"),
            F.col(text_col).alias("target_text"),
        )
    )
    if budget_tokens is not None:
        # per-line whitespace token counts, then drop the shortest PREFIX
        # such that the remaining suffix fits the budget: j = #{i : sum of
        # tc[i:] > budget}; suffix sums via total - prefix(i), prefix(i)
        # by an O(K^2) slice-sum (K = context_turns, bounded small)
        tc = F.transform(
            "__ctx",
            lambda s: F.size(
                F.filter(F.split(F.trim(F.coalesce(s["t"], F.lit(""))), r"\s+"), lambda x: x != "")
            ).cast("long"),
        )
        out = out.withColumn("__tc", tc)
        total = F.aggregate("__tc", F.lit(0).cast("long"), lambda a, x: a + x)
        n = F.size("__tc")
        drop = F.size(
            F.filter(
                F.sequence(F.lit(1), n),
                lambda i: (
                    total
                    - F.aggregate(
                        F.slice("__tc", F.lit(1), i - 1), F.lit(0).cast("long"), lambda a, x: a + x
                    )
                )
                > F.lit(budget_tokens).cast("long"),
            )
        )
        out = (
            out.withColumn("__drop", F.when(n > 0, drop).otherwise(F.lit(0)))
            .withColumn("__ctx", F.expr("slice(__ctx, __drop + 1, size(__ctx) - __drop)"))
            .drop("__tc", "__drop")
        )
    return out.select(
        "conv_id",
        "turn_idx",
        F.size("__ctx").alias("n_context_turns"),
        F.array_join(F.transform("__ctx", lambda s: _line(s["r"], s["t"])), "\n").alias(
            "context_text"
        ),
        "target_text",
    )


def transcript_integrity(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """Per-conversation QC report: duplicate turn keys, turn-index gaps,
    and consecutive same-role turns (role-alternation violations among
    live rows) — the gate stage that keeps malformed conversations out of
    :func:`sft_examples` / :func:`assemble_conversations` bins.

    One exchange: the lag window hash-partitions by ``conv_id`` and the
    follow-up groupBy reuses that partitioning (no second shuffle — the
    aggregation runs on the window's output partitioning).
    """
    w = Window.partitionBy("conv_id").orderBy(F.col("__i").asc(), F.col("__r").asc())
    rows = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("__i"),
        F.col(role_col).alias("__r"),
    ).withColumn("__rep", (F.lag("__r").over(w) == F.col("__r")).cast("int"))
    return rows.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        (F.count("*") - F.countDistinct("__i")).alias("n_dup_turns"),
        (
            (F.max("__i") - F.min("__i") + 1) != F.countDistinct("__i")
        ).alias("has_gaps"),
        F.coalesce(F.sum("__rep"), F.lit(0)).alias("n_role_repeats"),
        (F.min_by("__r", F.struct(F.col("__i"), F.col("__r"))) == F.lit("user")).alias(
            "starts_with_user"
        ),
    )
