"""Canonical StructTypes for the engine.

Mirrors the reference's data model (SURVEY.md §1):

- change event  <- CouchDB ``_changes`` result rows
  (reference: couch2pg/src/importer.js:155-161 — ``{id, seq, deleted?,
  changes:[{rev}], doc?}``)
- landing/transcripts table <- the raw landing table
  (reference: couch2pg/src/setup.js:4-11 — ``(saved_timestamp, _id,
  _deleted, source, doc)``) with the payload typed out as conversation
  turns per BASELINE.json ``input_hint``
- checkpoint row <- ``couchdb_progress`` (reference: setup.js:13-19)
- lineage row   <- per-batch metrics (north_rule; reference exposes the
  equivalent via sql-exporter gauges)
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Change feed (the stream). One row per change event; `doc` is the raw JSON
# document string (include_docs: true), null for deletes (importer.js:86-95).
# `seq` is monotone per source; the reference's opaque 'N-hash' token is kept
# as plain int64 here (FIXTURES.md §2).
# ---------------------------------------------------------------------------
CHANGE_EVENT = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("op", T.StringType(), False),  # insert|update|delete
        T.StructField("id", T.StringType(), False),  # conv_id || ':' || turn_idx
        T.StructField("rev", T.StringType(), True),  # 'N-hash'
        T.StructField("doc", T.StringType(), True),  # JSON; null for delete
    ]
)

# Payload document schema used by the Catalyst `from_json` fast path of the
# doc->row transform. The `_extra` map catches late-added fields for additive
# schema evolution (SURVEY.md §2.3 T11): unknown keys are preserved until the
# matching ALTER/promotion lands.
DOC_PAYLOAD = T.StructType(
    [
        T.StructField("_id", T.StringType(), True),
        T.StructField("_rev", T.StringType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),  # late-added field
        T.StructField("ts", T.LongType(), True),  # epoch millis (contacts.sql:20)
        # security fields that must be redacted for user docs (importer.js:37-44)
        T.StructField("type", T.StringType(), True),
        T.StructField("password_scheme", T.StringType(), True),
        T.StructField("derived_key", T.StringType(), True),
        T.StructField("salt", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Landing table = typed transcripts + reference envelope columns
# (setup.js:4-11). Key: (conv_id, turn_idx) unique after replay.
# ---------------------------------------------------------------------------
TRANSCRIPT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        # envelope (reference landing-table columns)
        T.StructField("_id", T.StringType(), False),
        T.StructField("_rev", T.StringType(), True),
        T.StructField("_deleted", T.BooleanType(), False),
        T.StructField("saved_timestamp", T.TimestampType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("rev_height", T.LongType(), True),
    ]
)

TRANSCRIPT_KEY = ["conv_id", "turn_idx"]

# LWW ordering spec, most-significant first, as (column, ascending) pairs:
# higher rev height wins; at equal height a live edit beats a delete
# (reference e2e: tests/e2e-test.spec.js:307-328); then lexicographically
# greater rev hash (CouchDB deterministic winner, e2e-test.spec.js:281-305);
# then later seq.
LWW_ORDER = [
    ("rev_height", False),
    ("_deleted", True),  # False (live) sorts before True under asc
    ("_rev", False),
    ("seq", False),
]

CHECKPOINT = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("pending", T.LongType(), True),
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

# Per-(model, epoch) maintenance-run record — the dbt_results/dbt-latency
# observability plane (reference sql-exporter-config.yaml:63-90: per-model
# status + execution_time, and the model-vs-landing freshness gap). Keyed
# (model, epoch) with LWW on `completed` DESC: a resumed batch's 'skipped'
# replay record can never overwrite a completed run's record.
MODEL_RUN = T.StructType(
    [
        T.StructField("model", T.StringType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows", T.LongType(), True),
        T.StructField("exec_ms", T.LongType(), True),
        # the batch's planned high seq bound — what the model state covers
        # after this epoch; model_latency() diffs it against the landing
        # checkpoints' frontier (the dbt-latency metric, in seq units)
        T.StructField("hi_seq", T.LongType(), True),
        T.StructField("completed", T.IntegerType(), False),
        T.StructField("updated_at", T.LongType(), True),  # wall-clock epoch ms
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("seq_lo", T.LongType(), True),
        T.StructField("seq_hi", T.LongType(), True),
        T.StructField("rows_upserted", T.LongType(), True),
        T.StructField("rows_deleted", T.LongType(), True),
        T.StructField("skew_max_ratio", T.DoubleType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)
