"""Dead-letter channel — poison-pill quarantine for malformed change events.

The reference has no answer to a malformed document: couch2pg throws,
the loop retries the same batch, and the pipeline crash-loops until a
human deletes the doc (couch2pg/src/importer.js:142-175 retries
wholesale; nothing skips a poison row). At 10^10 events a single
unparseable document must not stall ingest — the standard CDC answer is
a dead-letter queue: classify each event, quarantine the malformed ones
in their own table WITH the reason, let the seq cursor advance past
them, and keep the landing table clean.

Classification (first match wins — the order is part of the contract and
is mirrored verbatim by the DuckDB oracle of the ``dlq_classify`` driver
query):

1. ``bad_rev``       — rev missing, or its height prefix isn't an integer:
                       LWW cannot order the event (applies to deletes too);
2. ``null_doc_live`` — a live (non-delete) event with no document at all;
3. ``invalid_json``  — a live document that is not a JSON OBJECT: the
                       map-typed ``from_json`` returns null for malformed
                       input AND for valid non-object JSON like ``5``
                       (the struct-typed parse can't detect either — it
                       yields an all-null struct); the DuckDB twin is
                       ``json_valid(doc) AND json_type(doc) = 'OBJECT'``;
4. ``bad_key``       — (conv_id, turn_idx) unrecoverable from BOTH the
                       parsed doc and the ``conv:turn`` id format: the
                       merge key would be null.

Everything here is try_cast/when Catalyst — classification rides the
batch's existing write job (zero extra pass), and poison rows are
filtered out BEFORE the typed transform, whose ANSI casts would
otherwise throw on exactly these rows (Spark 4 ANSI mode is on). With no
DLQ configured the engine keeps its fail-fast default: garbage stops the
job rather than silently landing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.functions.json_doc import sanitise
from cht_sync_spark.schemas import DOC_PAYLOAD

REASON_COL = "_dlq_reason"

# quarantine table row: the raw event verbatim + reason + lineage epoch
DLQ_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("rev", T.StringType(), True),
        T.StructField("doc", T.StringType(), True),
        T.StructField("reason", T.StringType(), False),
        T.StructField("epoch_id", T.LongType(), False),
    ]
)
DLQ_KEY = ["source", "seq"]


def malformed_reason(payload_schema: T.StructType = DOC_PAYLOAD) -> Column:
    """Reason string for a CHANGE_EVENT row, null when the event is clean.

    Pure Catalyst over (op, id, rev, doc); ``try_cast`` (not ``cast``)
    everywhere so classification itself can never throw under ANSI mode.
    """
    rev_height = F.split(F.col("rev"), "-", 2).getItem(0).try_cast("long")
    bad_rev = F.col("rev").isNull() | rev_height.isNull()

    live = F.col("op") != "delete"
    d = F.from_json(sanitise(F.col("doc")), payload_schema)
    d_map = F.from_json(
        sanitise(F.col("doc")), T.MapType(T.StringType(), T.StringType())
    )

    # id format 'conv:turn' (FIXTURES.md §2) is the fallback key source,
    # exactly as doc_to_row recovers delete-stub keys
    id_conv = F.nullif(F.substring_index(F.col("id"), ":", 1), F.lit(""))
    id_turn = F.substring_index(F.col("id"), ":", -1).try_cast("int")
    bad_key = (
        F.coalesce(d["conv_id"], id_conv).isNull()
        | F.coalesce(d["turn_idx"], id_turn).isNull()
    )

    return (
        F.when(bad_rev, F.lit("bad_rev"))
        .when(live & F.col("doc").isNull(), F.lit("null_doc_live"))
        .when(live & d_map.isNull(), F.lit("invalid_json"))
        .when(bad_key, F.lit("bad_key"))
    )
