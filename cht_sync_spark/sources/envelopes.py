"""WAL / binlog CDC envelope adapters — Debezium-shaped tap → canonical feed.

The north rule names the ingest family "binlog/WAL tail → lake upsert". The
engine's native feed is CouchDB-``_changes``-shaped (``CHANGE_EVENT``:
seq/source/op/id/rev/doc). Real transaction-log taps emit a different,
well-known envelope instead — the Debezium change-record shape used by both
its Postgres (logical WAL) and MySQL (binlog) connectors:

    { op: c|u|d|r, ts_ms, before: <row image>, after: <row image>,
      source: { db, table, lsn (pg) | file+pos (mysql), tx_id } }

This module normalizes that envelope into ``CHANGE_EVENT`` rows, so every
downstream stage — footer-statistics batch planning, seq-range predicate
pushdown, the Catalyst/Arrow doc→row transform, LWW merge, exactly-once
checkpoints, the model DAG — runs unchanged on a WAL tail. The adapter is
pure Catalyst (struct field access, ``to_json``, hash/concat): zero Python
in the data path, fully whole-stage-codegen'd, safe at 10^10 events.

Ordering semantics — the one real design decision here: a transaction log
has no multi-master revision vectors; its total order IS the log position.
The adapter therefore synthesizes the engine's revision vector from the log
position::

    seq        = lsn                    (pg)   |  (file ordinal << 32) | pos (mysql)
    rev_height = seq                    so LWW's primary key (height desc)
    rev        = '<seq>-<md5 hash>'     degenerates to "highest LSN wins"

Per (source, key) the log position never ties, so the engine's full LWW
order (height desc → live-beats-delete → hash → seq) collapses to exactly
Postgres logical-replication apply semantics: the latest WAL entry for a key
wins, a later DELETE really deletes. Snapshot reads (op ``r``, Debezium's
initial-load records) map to inserts — replaying snapshot + tail through the
idempotent merge converges to the same state regardless of overlap.

MySQL binlog positions are (file, pos) pairs, totally ordered by file
ordinal then byte offset; ``binlog_seq`` packs them into one int64
(ordinal << 32 | pos — a binlog file is capped well under 4 GiB, enforced
here rather than assumed) so the rest of the engine sees one monotone
sequence, as it does for LSNs.

Reference basis: the reference tails CouchDB ``_changes`` only
(couch2pg/src/importer.js:142-175); this adapter is the Spark-first
generalization of the same tail-the-log contract to WAL/binlog taps, per
the north rule. Envelope field names follow Debezium's public message
format (debezium.io docs), which is the lingua franca binlog taps emit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Envelope schema (for readers of raw tap output and for the generator).
# The row images are the transcript-table row (input_hint columns); `ts` is
# epoch millis in the image, as a log tap would emit for a timestamp column.
# ---------------------------------------------------------------------------
_ROW_IMAGE = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),
    ]
)

WAL_SOURCE = T.StructType(
    [
        T.StructField("db", T.StringType(), False),
        T.StructField("table", T.StringType(), True),
        T.StructField("lsn", T.LongType(), True),  # Postgres
        T.StructField("file", T.StringType(), True),  # MySQL binlog
        T.StructField("pos", T.LongType(), True),  # MySQL binlog
        T.StructField("tx_id", T.LongType(), True),
    ]
)

# Epoched egress variant (additive field — legacy envelopes simply lack
# it): once a table's change versions approach the 2^23 ceiling of the
# (version<<40)|md5_40 int64 pack, `advance_lsn_epoch` stores a new epoch
# base and exports stamp `source.lsn_epoch` with the lsn packed RELATIVE
# to that base. Consumers order by (lsn_epoch, lsn); this engine's own
# re-ingest folds the pair into one per-key-monotone int64 (wal_seq_epoched).
WAL_SOURCE_EPOCHED = T.StructType(
    WAL_SOURCE.fields + [T.StructField("lsn_epoch", T.LongType(), True)]
)

WAL_ENVELOPE = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # c|u|d|r
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("before", _ROW_IMAGE, True),  # null for c/r
        T.StructField("after", _ROW_IMAGE, True),  # null for d
        T.StructField("source", WAL_SOURCE, False),
    ]
)

# Debezium op → engine op. Snapshot reads (r) are inserts: replay through
# the idempotent LWW merge makes snapshot/tail overlap harmless.
_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}

# Table property holding the JSON list of lsn-epoch base versions
# (strictly increasing; epoch i >= 1 starts at bases[i-1], epoch 0 at 0).
LSN_EPOCH_PROP = "cdc.lsn_epoch.bases"


def binlog_seq(file: Column, pos: Column) -> Column:
    """(binlog file, byte pos) → one monotone int64.

    File ordinal = the numeric suffix of ``mysql-bin.000042``; binlog
    positions are byte offsets within one file and MySQL caps
    ``max_binlog_size`` at 1 GiB (< 2^32), so ``ordinal << 32 | pos``
    preserves the (file, pos) total order exactly. Input outside that
    envelope (pos ≥ 2^32) would corrupt ordering silently, so it maps to
    null and the strict gate in :func:`debezium_to_events` rejects it.
    """
    ordinal = F.regexp_extract(file, r"(\d+)$", 1).cast("long")
    ok = ordinal.isNotNull() & pos.isNotNull() & (pos >= 0) & (pos < F.lit(1 << 32))
    return F.when(ok, F.shiftleft(ordinal, 32) + pos)


def wal_seq(source: Column) -> Column:
    """Log position → engine seq: LSN when present (pg), else packed
    binlog (file, pos) (mysql)."""
    return F.coalesce(source["lsn"], binlog_seq(source["file"], source["pos"]))


def wal_seq_epoched(source: Column) -> Column:
    """(lsn_epoch, epoch-relative lsn) → one per-key-monotone int64.

    The epoched pack is ``lsn = (rel_version << 40) | md5_40`` with
    ``rel_version < 2^23`` per epoch (enforced at export). The fold keeps
    the 46-bit global version ``(epoch << 23) | rel`` in the high bits and
    the top 17 bits of the key hash below it::

        seq = (((epoch << 23) | rel) << 17) | (md5_40 >> 23)

    Ordering: per key, (epoch, rel) strictly increases with change
    version (epochs only advance; rel restarts at each advance but the
    epoch term dominates), so the fold is strictly increasing per key —
    the only property LWW needs. The truncated 17-bit hash exists to keep
    positions mostly distinct ACROSS keys within a version; a cross-key
    tie is harmless (LWW compares within a key; seq-range batch cuts keep
    tie groups intact because cuts are inclusive/exclusive on the same
    value). Capacity: 2^23 epochs × 2^23 versions ≈ 7×10^13 change
    versions. Rows with a null ``lsn_epoch`` fold as epoch 0, so a stream
    that stamped epochs from its first export is self-consistent; mixing
    epoched exports with LEGACY (un-epoched, verbatim-lsn) exports of the
    same table is not ordered — re-export from a version boundary instead
    (documented in :func:`events_to_debezium`)."""
    epoch = F.coalesce(source["lsn_epoch"], F.lit(0)).cast("long")
    rel = F.shiftrightunsigned(source["lsn"], 40)
    md17 = F.shiftrightunsigned(
        source["lsn"].bitwiseAND(F.lit((1 << 40) - 1)), 23
    )
    pg = F.shiftleft(F.shiftleft(epoch, 23) + rel, 17) + md17
    return F.coalesce(
        F.when(source["lsn"].isNotNull(), pg),
        binlog_seq(source["file"], source["pos"]),
    )


def _op_col(op: Column) -> Column:
    m = F.create_map(*[F.lit(x) for kv in _OP_MAP.items() for x in kv])
    return m[op]


def debezium_to_events(
    env: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    source_name: Column | None = None,
    strict: bool = True,
) -> DataFrame:
    """Debezium-shaped WAL/binlog envelopes → canonical CHANGE_EVENT rows.

    - ``id`` = ``key_cols`` joined with ':' from the after-image (before-image
      for deletes, which carry no after) — the engine's composite-key format.
    - ``rev`` = ``'<seq>-<md5(source, id, op)>'``: :func:`parse_rev` recovers
      ``rev_height == seq``, making LWW "highest log position wins" (module
      docstring). The hash suffix only keeps the 'N-hash' shape; it never
      decides a comparison because heights cannot tie per key.
    - ``doc`` = ``to_json(after)`` for upserts, null for deletes — the
      tombstone path downstream (delete-stub projection, P2) is identical to
      a CouchDB delete.
    - ``strict=True`` fails the job on malformed envelopes (unknown op, or no
      usable log position) via ANSI ``raise_error``; ``strict=False`` maps
      them to null-op rows the caller can route to a DLQ with
      :func:`cht_sync_spark.functions.dlq.classify_events`-style filters.

    Pure Catalyst; the output plan keeps ``seq`` a plain column so the
    feed-side range predicates still push into the tap's parquet scan.

    Epoched streams: when the envelope's ``source`` struct carries the
    additive ``lsn_epoch`` field (egress past the 2^23 version ceiling —
    see :func:`advance_lsn_epoch`), seq is the :func:`wal_seq_epoched`
    fold of (epoch, relative lsn), which stays strictly increasing per
    key across epoch bumps. Detection is schema-driven, so legacy and
    epoched envelopes both flow through this one adapter.
    """
    src = F.col("source")
    name = source_name if source_name is not None else src["db"]
    src_type = env.schema["source"].dataType
    epoched = isinstance(src_type, T.StructType) and "lsn_epoch" in src_type.names
    seq = wal_seq_epoched(src) if epoched else wal_seq(src)
    op = _op_col(F.col("op"))

    img = F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after"))
    key = F.concat_ws(":", *[img[k].cast("string") for k in key_cols])

    if strict:
        bad_op = F.when(
            op.isNull(),
            F.raise_error(F.concat(F.lit("wal envelope: unknown op "), F.col("op"))),
        )
        bad_seq = F.when(
            seq.isNull(),
            F.raise_error(F.lit("wal envelope: no usable log position (lsn/file+pos)")),
        )
        op = F.coalesce(op, bad_op)
        seq = F.coalesce(seq, bad_seq.cast("long"))
    else:
        # the lenient-mode DLQ contract is "malformed rows have null op":
        # a known op with NO usable log position is just as malformed (null
        # seq breaks range planning; concat_ws would silently drop the
        # missing height prefix from rev) — null its op too so one
        # op-is-null filter catches every malformed shape
        op = F.when(seq.isNotNull(), op)

    rev = F.when(
        seq.isNotNull(),
        F.concat_ws("-", seq.cast("string"), F.md5(F.concat_ws("|", name, key, F.col("op")))),
    )
    doc = F.when(F.col("op") != "d", F.to_json(F.col("after")))

    return env.select(
        seq.alias("seq"),
        name.alias("source"),
        op.alias("op"),
        key.alias("id"),
        rev.alias("rev"),
        doc.alias("doc"),
    )


# ---------------------------------------------------------------------------
# Deterministic synthetic WAL tap (tests + bench), in the feedgen mold:
# columnar, seeded, no wall clock, no per-row Python — the same code makes a
# 1k-row test tap and a 10^10-row bench tap.
# ---------------------------------------------------------------------------
def generate_wal_envelopes(
    spark: SparkSession,
    n_keys: int,
    *,
    seed: int = 7,
    db: str = "waldb",
    flavor: str = "pg",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic Debezium-shaped tap over ``n_keys`` transcript rows.

    Per key (scenario bucket = ``xxhash64(conv, turn, seed) % 100``):
    every key gets an op-``c`` insert; ``s < 30`` an op-``u`` edit;
    ``30 <= s < 40`` an op-``u`` edit then op-``d`` delete (delete of an
    updated row); ``40 <= s < 45`` op-``d`` delete of the unedited row;
    ``45 <= s < 50`` a snapshot op-``r`` re-read AFTER the insert (the
    snapshot/tail overlap case). LSNs are phase-banded (inserts < edits <
    deletes) so causal order holds per key; ``flavor='mysql'`` emits the
    same order as (file, pos) pairs instead, exercising :func:`binlog_seq`.

    Update images change ``text`` and set ``tool`` (the additive-evolution
    field), matching the feedgen scenario mix.
    """
    if flavor not in ("pg", "mysql"):
        raise ValueError(f"flavor must be pg|mysql, got {flavor!r}")

    keys = spark.range(n_keys, numPartitions=partitions)
    conv = F.concat(F.lit("wconv"), (F.col("id") % F.lit(max(n_keys // 4, 1))).cast("string"))
    turn = (F.col("id") % 16).cast("int")
    base = keys.select(
        conv.alias("conv_id"),
        turn.alias("turn_idx"),
        F.col("id").alias("k"),
        (F.pmod(F.xxhash64(conv, turn, F.lit(seed)), F.lit(100))).alias("s"),
    )

    def image(text_tag: str, with_tool: bool):
        return F.struct(
            F.col("conv_id"),
            F.col("turn_idx"),
            F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
            F.concat(F.lit(text_tag), F.lit(" k"), F.col("k").cast("string")).alias("text"),
            (F.lit("search") if with_tool else F.lit(None).cast("string")).alias("tool"),
            (F.lit(1_700_000_000_000) + F.col("k") * 1000).alias("ts"),
        )

    n = F.lit(int(n_keys))
    lsn_c = F.col("k") + 1  # band 0: inserts
    lsn_u1 = n + F.col("k") + 1  # band 1: first edits / snapshot reads
    lsn_u2 = n * 2 + F.col("k") + 1  # band 2: second edits
    lsn_d = n * 3 + F.col("k") + 1  # band 3: deletes

    def env(op: str, lsn: Column, before: Column, after: Column) -> Column:
        if flavor == "pg":
            src = F.struct(
                F.lit(db).alias("db"),
                F.lit("transcripts").alias("table"),
                lsn.cast("long").alias("lsn"),
                F.lit(None).cast("string").alias("file"),
                F.lit(None).cast("long").alias("pos"),
                lsn.cast("long").alias("tx_id"),
            )
        else:
            # one binlog file per 1M positions; pos = offset within file
            src = F.struct(
                F.lit(db).alias("db"),
                F.lit("transcripts").alias("table"),
                F.lit(None).cast("long").alias("lsn"),
                F.concat(
                    F.lit("mysql-bin."),
                    F.lpad((lsn / F.lit(1_000_000)).cast("long").cast("string"), 6, "0"),
                ).alias("file"),
                F.pmod(lsn, F.lit(1_000_000)).cast("long").alias("pos"),
                lsn.cast("long").alias("tx_id"),
            )
        return F.struct(
            F.lit(op).alias("op"),
            (F.lit(1_700_000_000_000) + lsn).cast("long").alias("ts_ms"),
            before.alias("before"),
            after.alias("after"),
            src.alias("source"),
        )

    null_img = F.lit(None).cast(_ROW_IMAGE)
    s = F.col("s")
    envs = F.array_compact(
        F.array(
            env("c", lsn_c, null_img, image("turn", False)),
            F.when(s < 30, env("u", lsn_u1, image("turn", False), image("edit1", True))),
            F.when((s >= 30) & (s < 40), env("u", lsn_u1, image("turn", False), image("edit1", True))),
            F.when((s >= 30) & (s < 40), env("d", lsn_d, image("edit1", True), null_img)),
            F.when((s >= 40) & (s < 45), env("d", lsn_d, image("turn", False), null_img)),
            F.when((s >= 45) & (s < 50), env("r", lsn_u1, null_img, image("turn", False))),
            F.when(s < 15, env("u", lsn_u2, image("edit1", True), image("edit2", True))),
        )
    )
    return (
        base.select(F.explode(envs).alias("e"))
        .select("e.op", "e.ts_ms", "e.before", "e.after", "e.source")
    )


def events_to_debezium(
    table,
    from_version: int,
    to_version: int | None = None,
    *,
    db: str | None = None,
    with_before: bool = False,
    strict: bool = True,
) -> DataFrame:
    """CDC EGRESS — the inverse of :func:`debezium_to_events`: a landing
    table's own changelog re-emitted as Debezium-shaped WAL envelopes, so
    any Debezium-speaking downstream (Kafka sinks, other lakes, search
    indexers) can tail THIS engine the way this engine tails a WAL. The
    reference has no egress at all (Postgres IS its terminal store); at
    lake scale the changelog-out surface is what makes the landing table a
    first-class CDC source rather than a dead end.

    Envelope mapping (``WAL_ENVELOPE`` shape, pg flavor):

    - ``op``: tombstones → ``'d'``; live changes → ``'u'`` (upsert — an
      LWW changelog does not know insert-vs-update without a preimage),
      or ``'c'``/``'u'`` split by preimage existence when
      ``with_before=True``;
    - ``source.lsn`` = ``(change_version << 40) | md5_40(_id)`` — per key
      the change version strictly increases, so the synthesized log
      position preserves each key's change order exactly and replaying
      the export through :func:`debezium_to_events` + the idempotent LWW
      merge converges to the exported table's live state (the round-trip
      pinned in tests). 40 bits of md5 keep positions distinct across
      keys within a version. The pack holds (epoch-relative) versions up
      to 2^23; a longer-lived table records epoch bases via
      :func:`advance_lsn_epoch` BEFORE crossing, after which envelopes
      carry ``source.lsn_epoch`` and the lsn packs ``version - base`` —
      consumers order by (lsn_epoch, lsn), and this engine's own
      re-ingest folds the pair per :func:`wal_seq_epoched`. Enabling
      epochs mid-stream re-bases only versions AFTER the recorded base,
      so previously exported envelopes keep their positions; do not mix
      un-epoched exports of post-base ranges with epoched ones (the
      verbatim and relative packs are not mutually ordered — re-export
      from the base instead).
    - ``before``: for deletes, the key columns (null payload — the
      content-free tombstone stub, importer.js:86-95); with
      ``with_before=True``, the full image at ``from_version`` (the
      range-preimage: for a key that changed multiple times inside the
      range, intermediate envelopes still carry the range-start image —
      the audit-diff convention, documented rather than hidden);
    - ``ts_ms`` = the row's ``saved_timestamp`` in epoch millis.

    Cost: O(changed files) — the changelog scan plans driver-side; the
    optional preimage read is bucket-pruned to the touched buckets plus a
    broadcast key semi-join (the derived-index consumers' discipline).
    Pure Catalyst throughout.
    """
    import json as _json
    import os as _os

    from cht_sync_spark.tables.format import bucket_expr

    # The (version << 40) | md5_40 pack needs (epoch-relative) change
    # versions < 2^23 or the shift overflows int64 and synthesized log
    # positions go negative/non-monotone — mirroring the pos < 2^32 gate
    # binlog_seq applies on the ingest side. A long-lived table escapes
    # the ceiling by recording lsn-epoch bases (:func:`advance_lsn_epoch`)
    # BEFORE crossing: versions then pack relative to their epoch's base
    # and envelopes carry the additive ``source.lsn_epoch`` field.
    tip = to_version if to_version is not None else table.current_version()
    bases = _json.loads(
        table.snapshot().properties.get(LSN_EPOCH_PROP, "[]")
    )
    if bases:
        starts = [0] + [int(b) for b in bases]
        for i, b in enumerate(starts):
            end = (starts[i + 1] - 1) if i + 1 < len(starts) else tip
            if end < from_version + 1 or b > tip:
                continue  # segment outside the export range
            if end - b >= 1 << 23:
                raise ValueError(
                    f"events_to_debezium: lsn epoch {i} spans change versions "
                    f"{b}..{end} (>= 2^23 apart) — advance_lsn_epoch was "
                    "called too late for this range; re-export from a "
                    "bounded range or record an intermediate base"
                )
    elif tip >= 1 << 23:
        raise ValueError(
            f"events_to_debezium: change version {tip} >= 2^23 would overflow "
            "the (version<<40)|md5_40 int64 lsn pack — call "
            "advance_lsn_epoch(table) to start an epoched export "
            "(consumers order by (source.lsn_epoch, source.lsn)), or "
            "expire/compact table history before exporting"
        )
    ch = table.changes(from_version, to_version, strict=strict)

    # ---- conflict-winner repair (CouchDB changes-feed semantics) --------
    # A COW merge's CDF records the LWW-deduped BATCH, so a batch row that
    # LOST the tiebreak against the stored row (an equal-rev-height
    # conflicting revision — CouchDB's conflict pair) still appears as a
    # change. Harmless for consumers that keep the true rev vectors (the
    # idempotent LWW re-resolves), but THIS export replaces rev vectors
    # with strictly-increasing synthesized log positions, which would
    # promote the later-exported loser on replay. CouchDB's own _changes
    # row always reflects the WINNING revision, so: each key's LAST change
    # in the range is overridden with the reconciled winner at
    # ``to_version`` (one window over changed rows + one bucket-pruned,
    # key-semi-joined reconciled read — O(changed keys)); a key absent
    # from the reconciled state (purged) exports as a content-free delete.
    # Replaying the export then converges to the exported live state even
    # across cross-batch conflicts.
    from pyspark.sql import Window as _W

    snap_tip = table.snapshot(tip)
    kcols = list(snap_tip.key_cols)
    ch_cols = ch.columns
    rn = F.row_number().over(
        _W.partitionBy(*kcols).orderBy(F.col("_change_version").desc())
    )
    ch = ch.withColumn("__rn", rn)
    lastch = ch.where(F.col("__rn") == 1)
    win_touched = sorted(
        r["__b"]
        for r in lastch.select(
            bucket_expr(snap_tip.bucket_cols, snap_tip.num_buckets).alias("__b")
        )
        .distinct()
        .collect()
    )
    payload = ("role", "text", "tool", "ts", "_deleted", "saved_timestamp")
    if not win_touched:  # empty export range: nothing to repair or emit
        return ch.limit(0).select(
            F.lit(None).cast("string").alias("op"),
            F.lit(None).cast("long").alias("ts_ms"),
            F.lit(None).cast(_ROW_IMAGE).alias("before"),
            F.lit(None).cast(_ROW_IMAGE).alias("after"),
            F.lit(None)
            .cast(WAL_SOURCE_EPOCHED if bases else WAL_SOURCE)
            .alias("source"),
        )
    cur = (
        table.read_current(version=tip, buckets=win_touched, drop_tombstones=False)
        .join(F.broadcast(lastch.select(*kcols).distinct()), on=kcols, how="left_semi")
        .select(
            *kcols,
            *[F.col(c).alias(f"__w{c}") for c in payload],
            F.lit(True).alias("__wexists"),
        )
    )
    lastch = lastch.join(cur, on=kcols, how="left")
    win_del = F.coalesce(F.col("__w_deleted"), F.lit(True))
    lastch = lastch.withColumn(
        "_change_type",
        F.when(win_del, F.lit("delete")).otherwise(
            F.when(F.col("_change_type") == "delete", F.lit("update")).otherwise(
                F.col("_change_type")
            )
        ),
    )
    for c in ("role", "text", "tool", "ts"):
        lastch = lastch.withColumn(c, F.when(~win_del, F.col(f"__w{c}")))
    lastch = lastch.withColumn(
        "saved_timestamp",
        F.coalesce(F.col("__wsaved_timestamp"), F.col("saved_timestamp")),
    )
    ch = ch.where(F.col("__rn") > 1).select(*ch_cols).unionByName(
        lastch.select(*ch_cols)
    )

    db_name = db if db is not None else _os.path.basename(_os.path.normpath(table.path))
    is_del = F.col("_change_type") == "delete"

    def image(prefix: str = "") -> Column:
        c = lambda n: F.col(prefix + n)  # noqa: E731
        return F.struct(
            c("conv_id").alias("conv_id"),
            c("turn_idx").alias("turn_idx"),
            c("role").alias("role"),
            c("text").alias("text"),
            c("tool").alias("tool"),
            F.unix_millis(c("ts")).alias("ts"),
        )

    key_stub = F.struct(
        F.col("conv_id").alias("conv_id"),
        F.col("turn_idx").alias("turn_idx"),
        *[F.lit(None).cast("string").alias(n) for n in ("role", "text", "tool")],
        F.lit(None).cast("long").alias("ts"),
    )

    if with_before:
        snap = table.snapshot(from_version)
        key = list(snap.key_cols)
        touched = [
            r["__b"]
            for r in ch.select(
                bucket_expr(snap.bucket_cols, snap.num_buckets).alias("__b")
            )
            .distinct()
            .collect()
        ]
        pre = (
            table.read_current(
                version=from_version, buckets=sorted(touched), drop_tombstones=True
            )
            .join(F.broadcast(ch.select(*key).distinct()), on=key, how="left_semi")
            .select(
                *key,
                *[
                    F.col(n).alias(f"__pre_{n}")
                    for n in ("role", "text", "tool", "ts")
                ],
                F.lit(True).alias("__pre_exists"),
            )
        )
        ch = ch.join(pre, on=key, how="left")
        before = F.when(
            F.col("__pre_exists").isNotNull(),
            F.struct(
                F.col("conv_id").alias("conv_id"),
                F.col("turn_idx").alias("turn_idx"),
                F.col("__pre_role").alias("role"),
                F.col("__pre_text").alias("text"),
                F.col("__pre_tool").alias("tool"),
                F.unix_millis(F.col("__pre_ts")).alias("ts"),
            ),
        ).otherwise(F.when(is_del, key_stub))
        op = F.when(is_del, F.lit("d")).otherwise(
            F.when(F.col("__pre_exists").isNotNull(), F.lit("u")).otherwise(F.lit("c"))
        )
    else:
        before = F.when(is_del, key_stub)
        op = F.when(is_del, F.lit("d")).otherwise(F.lit("u"))

    md40 = F.conv(F.substring(F.md5(F.col("_id")), 1, 10), 16, 10).cast("long")
    v = F.col("_change_version").cast("long")
    src_fields = [
        F.lit(db_name).alias("db"),
        F.lit("transcripts").alias("table"),
    ]
    if bases:
        # epoch(v) = number of recorded bases <= v; base(v) via the
        # driver-side starts list (bases are few — one per ~8.4M commits)
        epoch_c = F.lit(0)
        for b in bases:
            epoch_c = epoch_c + F.when(v >= F.lit(int(b)), 1).otherwise(0)
        epoch_c = epoch_c.cast("long")
        starts_arr = F.array(*[F.lit(int(b)) for b in ([0] + list(bases))])
        base_c = F.element_at(starts_arr, (epoch_c + 1).cast("int")).cast("long")
        src_fields += [
            (F.shiftleft(v - base_c, 40) + md40).alias("lsn"),
            F.lit(None).cast("string").alias("file"),
            F.lit(None).cast("long").alias("pos"),
            v.alias("tx_id"),  # full version: epoch-free diagnostics
            epoch_c.alias("lsn_epoch"),
        ]
    else:
        src_fields += [
            (F.shiftleft(v, 40) + md40).alias("lsn"),
            F.lit(None).cast("string").alias("file"),
            F.lit(None).cast("long").alias("pos"),
            v.alias("tx_id"),
        ]
    src = F.struct(*src_fields)
    return ch.select(
        op.alias("op"),
        F.unix_millis(F.col("saved_timestamp")).alias("ts_ms"),
        before.alias("before"),
        F.when(~is_del, image()).alias("after"),
        src.alias("source"),
    )


def advance_lsn_epoch(table, *, max_retries: int = 8) -> int:
    """Start a new lsn epoch for :func:`events_to_debezium` egress.

    Records the NEXT commit's version (this metadata-only commit itself,
    which carries no changelog rows, so no exported row sits on the
    boundary) as a base in the ``cdc.lsn_epoch.bases`` table property.
    All strictly later change versions export with
    ``source.lsn_epoch = <new epoch>`` and lsn packed relative to the
    base; previously exported versions keep their epoch and positions.
    Call BEFORE the epoch-relative version span reaches 2^23 (the export
    refuses otherwise). Optimistic-concurrency safe (expected-version
    pin + retry, the S4 discipline). Returns the new epoch number."""
    import json as _json

    from cht_sync_spark.tables.format import CommitConflict

    last_err: Exception | None = None
    for _ in range(max_retries):
        cur = table.current_version()
        bases = _json.loads(
            table.snapshot().properties.get(LSN_EPOCH_PROP, "[]")
        )
        base = cur + 1
        if bases and base <= int(bases[-1]):
            raise ValueError(
                f"advance_lsn_epoch: recorded base {bases[-1]} is not below "
                f"the next commit version {base} — bases must strictly increase"
            )
        try:
            table.commit(
                add_files=[],
                properties_update={
                    LSN_EPOCH_PROP: _json.dumps([int(b) for b in bases] + [base])
                },
                expected_version=cur,
            )
            return len(bases) + 1
        except CommitConflict as e:
            last_err = e
    raise last_err  # type: ignore[misc]


def expected_wal_state(envelopes: DataFrame) -> DataFrame:
    """Oracle for tests: the final table state a WAL apply must converge to —
    per (source.db, key) the image at the highest log position; keys whose
    last entry is a delete are absent. Independent implementation (max-seq
    semi-join, no engine code) for cross-checking replay results. Orders
    by the epoch-aware fold when the envelopes carry ``lsn_epoch``."""
    src_type = envelopes.schema["source"].dataType
    epoched = isinstance(src_type, T.StructType) and "lsn_epoch" in src_type.names
    seq_fn = wal_seq_epoched if epoched else wal_seq
    ev = envelopes.select(
        seq_fn(F.col("source")).alias("seq"),
        F.col("source.db").alias("source"),
        F.col("op"),
        F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after")).alias("img"),
    )
    w = ev.groupBy("source", "img.conv_id", "img.turn_idx").agg(F.max("seq").alias("seq"))
    last = ev.join(w, ["source", "seq"]).where(
        (F.col("img.conv_id") == F.col("conv_id")) & (F.col("img.turn_idx") == F.col("turn_idx"))
    )
    return last.where(F.col("op") != "d").select(
        "source", "conv_id", "turn_idx", "img.role", "img.text", "img.tool",
        F.timestamp_millis(F.col("img.ts")).alias("ts"), "seq",
    )
