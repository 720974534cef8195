"""Doc->row transform plane: sanitise, redact, rev parsing, envelope build.

Reference behavior being re-expressed (not ported):

- ``sanitise``: strip raw NUL and escaped ``\\u0000`` (any number of leading
  backslashes) from the JSON string — couch2pg/src/importer.js:27-35, tested
  at tests/unit/importer.spec.js:321-354. Postgres JSONB cannot store NUL;
  we keep the behavior for byte parity of the landing ``doc``.
- ``removeSecurityDetails``: drop ``password_scheme/derived_key/salt`` from
  ``type=='user'`` docs whose id starts with ``org.couchdb.user:`` —
  importer.js:37-44.
- envelope projection ``(now(), _id, !!deleted, source, doc)`` —
  importer.js:67-84.
- delete stub ``{_id, _rev, _deleted: true}`` for tombstone events —
  importer.js:86-95.

Two implementations of the doc->row transform:

- :func:`doc_to_row` — pure Catalyst (``from_json`` with an explicit schema):
  whole-stage-codegen'd, zero Python in the data path. Used when the payload
  schema is known (the common case).
- :func:`doc_to_row_arrow` — Arrow-vectorized pandas UDF over the raw JSON
  strings. This is the escape hatch the north_rule mandates stays vectorized
  ("no per-row Python"); used when per-doc logic outgrows Catalyst (e.g.
  schema sniffing for evolution). Both return identical schemas and are
  cross-checked in tests.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.schemas import DOC_PAYLOAD

# raw NUL, or '\x00' with one-or-more backslashes (importer.js:31 regex
# /(\\+u0000)|\x00/g — note JS '\\+' matches one-or-more literal '\')
_SANITISE_RE = r"(\\+u0000)|\x00"

import re  # noqa: E402  (kept near the pattern it compiles)

_SANITISE_PY = re.compile(_SANITISE_RE)


def sanitise(col: Column) -> Column:
    """Strip NUL escapes from a JSON string column (importer.js:27-35)."""
    return F.regexp_replace(col, _SANITISE_RE, "")


def is_user_doc(doc: Column) -> Column:
    """Reference redaction predicate (importer.js:38-39)."""
    return (doc["type"] == "user") & F.coalesce(
        doc["_id"].startswith("org.couchdb.user:"), F.lit(False)
    )


def redact_security(doc: Column, *, predicate: Column | None = None) -> Column:
    """Null the security fields of user docs (importer.js:37-44).

    ``predicate`` defaults to a relaxed ``type=='user'`` check (our synthetic
    transcript ids are ``conv:turn``, not ``org.couchdb.user:*``); pass
    :func:`is_user_doc` output for strict reference parity.
    """
    cond = predicate if predicate is not None else (doc["type"] == "user")
    cond = F.coalesce(cond, F.lit(False))
    redacted = doc.withField("password_scheme", F.lit(None).cast("string")) \
        .withField("derived_key", F.lit(None).cast("string")) \
        .withField("salt", F.lit(None).cast("string"))
    return F.when(cond, redacted).otherwise(doc)


def parse_rev(rev: Column) -> Column:
    """CouchDB ``'N-hash'`` -> revision height N (long).

    Rev format visible in reference fixtures (tests/unit/importer.spec.js:
    133-135, e.g. ``'23-ppp'``); height drives LWW ordering.
    """
    return F.split(rev, "-", 2).getItem(0).cast("long")


def doc_to_row(
    events: DataFrame,
    payload_schema: T.StructType = DOC_PAYLOAD,
    *,
    strict_user_predicate: bool = False,
) -> DataFrame:
    """Catalyst doc->row: change events -> typed transcript rows + envelope.

    Input: CHANGE_EVENT schema (seq, source, op, id, rev, doc-json).
    Output: TRANSCRIPT columns. Tombstones (null doc) become delete-stub rows
    (importer.js:86-95): key columns recovered from ``id``, payload null.

    Fully JVM-side: from_json + string ops, all codegen'd.
    """
    doc = F.from_json(sanitise(F.col("doc")), payload_schema).alias("d")
    pred = None
    ev = events.withColumn("d", doc)
    if strict_user_predicate:
        pred = is_user_doc(F.col("d"))
    ev = ev.withColumn("d", redact_security(F.col("d"), predicate=pred))

    is_del = F.col("op") == "delete"
    # delete stubs carry no doc: recover (conv_id, turn_idx) from the id
    # format 'conv:turnidx' (FIXTURES.md §2)
    id_conv = F.substring_index(F.col("id"), ":", 1)
    id_turn = F.substring_index(F.col("id"), ":", -1).cast("int")

    return ev.select(
        F.coalesce(F.col("d.conv_id"), id_conv).alias("conv_id"),
        F.coalesce(F.col("d.turn_idx"), id_turn).alias("turn_idx"),
        F.col("d.role").alias("role"),
        F.col("d.text").alias("text"),
        F.col("d.tool").alias("tool"),
        F.timestamp_millis(F.col("d.ts")).alias("ts"),
        F.col("id").alias("_id"),
        F.col("rev").alias("_rev"),
        is_del.alias("_deleted"),
        F.current_timestamp().alias("saved_timestamp"),
        F.col("source"),
        F.col("seq"),
        parse_rev(F.col("rev")).alias("rev_height"),
    )


def doc_extras(doc_col: Column, known_fields: list[str] | None = None) -> Column:
    """Unknown-field overflow map (SURVEY.md §7.3 #3 / T11).

    Parses the raw JSON into ``map<string,string>`` (scalars coerced to
    their JSON text) and drops every key the typed payload schema already
    owns — what remains are fields that appeared before their ALTER/
    promotion landed. Committed alongside the typed columns, so additive
    evolution never loses data mid-stream. Pure Catalyst (from_json +
    map_filter), no Python.
    """
    if known_fields is None:
        known_fields = [f.name for f in DOC_PAYLOAD.fields]
    m = F.from_json(sanitise(doc_col), T.MapType(T.StringType(), T.StringType()))
    known = F.array(*[F.lit(k) for k in known_fields])
    return F.map_filter(m, lambda k, _v: ~F.array_contains(known, k))


def doc_to_row_arrow(events: DataFrame) -> DataFrame:
    """Arrow-vectorized doc->row over raw JSON strings (north_rule I5).

    A ``pandas_udf`` batch-maps json-string Series -> struct Series; the
    JVM<->Python boundary is crossed once per Arrow batch (20k rows by
    session default), never per row. Functionally identical to
    :func:`doc_to_row` (asserted in tests); exists for payloads whose parse
    logic can't be expressed in Catalyst.
    """
    out_type = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _parse(docs: pd.Series, ids: pd.Series) -> pd.DataFrame:
        recs = []
        for raw, _id in zip(docs, ids):
            if raw is None:
                conv, _, turn = _id.rpartition(":")
                recs.append((conv, int(turn), None, None, None, None))
                continue
            d = json.loads(_SANITISE_PY.sub("", raw))
            if d.get("type") == "user":
                for k in ("password_scheme", "derived_key", "salt"):
                    d.pop(k, None)
            recs.append(
                (
                    d.get("conv_id"),
                    d.get("turn_idx"),
                    d.get("role"),
                    d.get("text"),
                    d.get("tool"),
                    d.get("ts"),
                )
            )
        return pd.DataFrame(recs, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts_ms"])

    ev = events.withColumn("d", _parse(F.col("doc"), F.col("id")))
    return ev.select(
        F.col("d.conv_id").alias("conv_id"),
        F.col("d.turn_idx").alias("turn_idx"),
        F.col("d.role").alias("role"),
        F.col("d.text").alias("text"),
        F.col("d.tool").alias("tool"),
        F.timestamp_millis(F.col("d.ts_ms")).alias("ts"),
        F.col("id").alias("_id"),
        F.col("rev").alias("_rev"),
        (F.col("op") == "delete").alias("_deleted"),
        F.current_timestamp().alias("saved_timestamp"),
        F.col("source"),
        F.col("seq"),
        parse_rev(F.col("rev")).alias("rev_height"),
    )
