"""Deterministic synthetic CouchDB-changes replay generator.

Produces a change-event table shaped per FIXTURES.md §2, mirroring the feed
consumed by the reference at couch2pg/src/importer.js:155-161 (fields used at
importer.js:86-95, 106-119: ``id, seq, deleted, changes[0].rev, doc``), with
the payload being multi-turn conversation transcripts (BASELINE.json
``input_hint``).

Everything is columnar and seeded — no wall clock, no Python loops over rows,
no ``monotonically_increasing_id`` — so the SAME code generates the 6k-row
test feed and a 10^10-row bench feed, and two runs at any parallelism produce
identical events.

Scenario mix per base turn (deterministic on ``xxhash64(conv, turn, seed)``),
mirroring the reference's e2e scenarios (tests/e2e-test.spec.js):

====================  =========================================================
scenario bucket       events emitted (beyond the height-1 insert)
====================  =========================================================
``s < 20``            plain edit: update at height 2 (e2e 150-197)
``20 <= s < 25``      conflict: two updates at height 2, divergent hashes —
                      deterministic winner = greater hash (e2e 281-305)
``25 <= s < 30``      delete at height 2 → tombstone (e2e 199-253)
``30 <= s < 33``      delete-vs-edit conflict at equal height 2 — live edit
                      wins even if the delete's hash is greater (e2e 307-328)
``33 <= s < 35``      edit at height 2 then delete at height 3 (delete of an
                      updated doc)
otherwise             insert only
====================  =========================================================

Additional parity fixtures (FIXTURES.md §2): ~1% of docs carry raw/escaped
NUL sequences (sanitiser, importer.js:27-35); ~0.5% are ``type:'user'`` docs
with ``password_scheme/derived_key/salt`` (redaction, importer.js:37-44);
``tool`` appears only in events past half the feed (additive schema
evolution); a small set of hot conversations carries a large share of events
(skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# seq-space layout: each phase gets its own band so seqs are unique and
# causally ordered (insert < update < late delete for the same key).
_PHASE = {
    "insert": 0,
    "update": 1,  # plain edits + both conflict branches + h2 deletes
    "delete3": 2,  # height-3 deletes of edited docs
}

_WORDS = (
    "data spark merge stream turn tool agent reply query plan batch state "
    "model check table shard index scan join sort hash skew salt"
).split()


def _doc_json(tool_visible_col):
    """Assemble the document JSON string columnar-ly.

    ``to_json(struct(...))`` drops null fields only with
    ``ignoreNullFields`` — which is the default — so late-field semantics
    (``tool`` absent from early events) come out naturally by nulling it.
    """
    return F.to_json(
        F.struct(
            F.col("_id"),
            F.col("rev").alias("_rev"),
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("role"),
            F.col("text"),
            F.when(tool_visible_col, F.col("tool")).alias("tool"),
            F.col("ts_ms").alias("ts"),
            F.col("user_type").alias("type"),
            F.col("password_scheme"),
            F.col("derived_key"),
            F.col("salt"),
        )
    )


def feed_sources(n_sources: int = 2) -> list[str]:
    """The static source-name list a :func:`synth_changes` feed carries —
    the analogue of the reference's configured DB list (db.js:45). Callers
    pass this to :class:`ChangesFeedSource` so no O(feed) discovery scan is
    ever needed."""
    return [f"synthhost/db{i}" for i in range(n_sources)]


def synth_changes(
    spark: SparkSession,
    n_convs: int = 100,
    base_turns: int = 6,
    turns_jitter: int = 8,
    hot_convs: int = 2,
    hot_turns: int = 200,
    n_sources: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Return the synthetic change-event DataFrame (schema per FIXTURES.md §2).

    Deterministic in (args, seed); event count ≈ n_convs*(base_turns +
    turns_jitter/2)*1.28 + hot_convs*hot_turns*1.28.
    """
    s = F.lit(seed)

    conv = (
        spark.range(n_convs)
        .withColumn("conv_id", F.format_string("c%07d", F.col("id")))
        .withColumn(
            "n_turns",
            F.when(F.col("id") < hot_convs, F.lit(hot_turns)).otherwise(
                base_turns + F.pmod(F.xxhash64(F.col("id"), s), F.lit(turns_jitter))
            ),
        )
    )
    # dense per-turn index: cumulative turns before this conv + turn_idx,
    # via a TWO-LEVEL prefix sum so no stage is single-partition at scale:
    # (1) running sum WITHIN each 64k-conv block (window partitioned by
    #     block id — parallel across blocks);
    # (2) block offsets = running sum over the per-block totals (a window
    #     over n_convs/64k rows — trivial), broadcast-joined back.
    # Identical values to a global ORDER BY id running sum for any block
    # size; deterministic at any parallelism.
    blk = F.floor(F.col("id") / F.lit(65536)).alias("__blk")
    conv = conv.withColumn("__blk", blk)
    w_in = Window.partitionBy("__blk").orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    conv = conv.withColumn("__intra", F.coalesce(F.sum("n_turns").over(w_in), F.lit(0)))
    w_blk = Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
    blk_off = (
        conv.groupBy("__blk")
        .agg(F.sum("n_turns").alias("__bt"))
        .withColumn("__bo", F.coalesce(F.sum("__bt").over(w_blk), F.lit(0)))
        .select("__blk", "__bo")
    )
    conv = (
        conv.join(F.broadcast(blk_off), "__blk")
        .withColumn("turn_offset", F.col("__bo") + F.col("__intra"))
        .drop("__blk", "__intra", "__bo")
    )

    turns = conv.select(
        "conv_id",
        "turn_offset",
        F.explode(F.sequence(F.lit(0), F.col("n_turns").cast("int") - 1)).alias("turn_idx"),
    ).withColumn("base_idx", F.col("turn_offset") + F.col("turn_idx"))

    h = F.xxhash64("conv_id", "turn_idx", s)
    total = F.lit(int(1e18))  # phase band width; far above any real event count

    words = F.array(*[F.lit(wd) for wd in _WORDS])
    base_text = F.concat_ws(
        " ",
        F.format_string("turn %d of %s:", F.col("turn_idx"), F.col("conv_id")),
        F.element_at(words, (F.pmod(h, F.lit(23)) + 1).cast("int")),
        F.element_at(words, (F.pmod(h + 7, F.lit(23)) + 1).cast("int")),
        F.element_at(words, (F.pmod(h + 13, F.lit(23)) + 1).cast("int")),
    )
    # sanitiser fixtures: raw NUL and escaped \x00 (with repeated slashes)
    base_text = F.when(
        F.pmod(h, F.lit(97)) == 0, F.concat(base_text, F.lit(" x\x00y\\u0000z\\\\u0000w"))
    ).otherwise(base_text)

    is_user_doc = F.pmod(h, F.lit(211)) == 0

    turns = (
        turns.withColumn("_id", F.concat_ws(":", "conv_id", F.lpad(F.col("turn_idx").cast("string"), 6, "0")))
        .withColumn("scenario", F.pmod(h, F.lit(100)))
        .withColumn(
            "role",
            F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(
                F.when(F.pmod(h, F.lit(7)) == 0, F.lit("tool")).otherwise(F.lit("assistant"))
            ),
        )
        .withColumn("text0", base_text)
        .withColumn(
            "tool",
            F.when(F.col("role") == "tool", F.element_at(words, (F.pmod(h + 3, F.lit(23)) + 1).cast("int"))),
        )
        .withColumn("ts_ms", F.lit(1704067200000) + F.col("base_idx") * 1000)  # 2024-01-01 + i sec
        .withColumn(
            "source",
            F.concat(F.lit("synthhost/db"), F.pmod(F.xxhash64("conv_id", s), F.lit(n_sources))),
        )
        .withColumn("user_type", F.when(is_user_doc, F.lit("user")))
        .withColumn("password_scheme", F.when(is_user_doc, F.lit("pbkdf2")))
        .withColumn("derived_key", F.when(is_user_doc, F.md5(F.concat(F.col("_id"), F.lit("dk")))))
        .withColumn("salt", F.when(is_user_doc, F.md5(F.concat(F.col("_id"), F.lit("na")))))
    )

    def rev(height: int, tag: str):
        return F.concat(
            F.lit(f"{height}-"), F.substring(F.md5(F.concat(F.col("_id"), F.lit(tag), s.cast("string"))), 1, 8)
        )

    common = [
        "conv_id", "turn_idx", "_id", "role", "tool", "ts_ms", "source",
        "user_type", "password_scheme", "derived_key", "salt", "base_idx", "scenario",
    ]

    # --- phase 0: inserts (every turn) ---------------------------------
    inserts = (
        turns.select(*common, F.col("text0").alias("text"))
        .withColumn("rev", rev(1, "i"))
        .withColumn("seq", F.lit(_PHASE["insert"]) * total + F.col("base_idx"))
        .withColumn("op", F.lit("insert"))
        .withColumn("is_delete", F.lit(False))
    )

    # --- phase 1: edits / conflicts / height-2 deletes ------------------
    upd_base = turns.where(F.col("scenario") < 35)
    plain_edit = (
        upd_base.where(F.col("scenario") < 20)
        .select(*common, F.concat(F.col("text0"), F.lit(" (edited)")).alias("text"))
        .withColumn("rev", rev(2, "u"))
        .withColumn("sub", F.lit(0))
    )
    conflict_a = (
        upd_base.where((F.col("scenario") >= 20) & (F.col("scenario") < 25))
        .select(*common, F.concat(F.col("text0"), F.lit(" (branch a)")).alias("text"))
        .withColumn("rev", rev(2, "ca"))
        .withColumn("sub", F.lit(0))
    )
    conflict_b = (
        upd_base.where((F.col("scenario") >= 20) & (F.col("scenario") < 25))
        .select(*common, F.concat(F.col("text0"), F.lit(" (branch b)")).alias("text"))
        .withColumn("rev", rev(2, "cb"))
        .withColumn("sub", F.lit(1))
    )
    del_h2 = (
        upd_base.where((F.col("scenario") >= 25) & (F.col("scenario") < 30))
        .select(*common, F.lit(None).cast("string").alias("text"))
        .withColumn("rev", rev(2, "d"))
        .withColumn("sub", F.lit(0))
    )
    # delete-vs-edit conflict at equal height: live must win even though the
    # delete's rev hash is forced lexicographically greater ('z' > any md5 hex)
    dve_edit = (
        upd_base.where((F.col("scenario") >= 30) & (F.col("scenario") < 33))
        .select(*common, F.concat(F.col("text0"), F.lit(" (live edit)")).alias("text"))
        .withColumn("rev", rev(2, "ve"))
        .withColumn("sub", F.lit(0))
    )
    dve_del = (
        upd_base.where((F.col("scenario") >= 30) & (F.col("scenario") < 33))
        .select(*common, F.lit(None).cast("string").alias("text"))
        .withColumn("rev", F.concat(F.lit("2-zzz"), F.substring(F.md5(F.col("_id")), 1, 5)))
        .withColumn("sub", F.lit(1))
    )
    edit_then_del = (
        upd_base.where((F.col("scenario") >= 33) & (F.col("scenario") < 35))
        .select(*common, F.concat(F.col("text0"), F.lit(" (edited)")).alias("text"))
        .withColumn("rev", rev(2, "u"))
        .withColumn("sub", F.lit(0))
    )

    phase1 = (
        plain_edit.unionByName(conflict_a)
        .unionByName(conflict_b)
        .unionByName(dve_edit)
        .unionByName(edit_then_del)
        .withColumn("is_delete", F.lit(False))
        .withColumn("op", F.lit("update"))
        .unionByName(
            del_h2.unionByName(dve_del).withColumn("is_delete", F.lit(True)).withColumn("op", F.lit("delete"))
        )
        .withColumn("seq", F.lit(_PHASE["update"]) * total + F.col("base_idx") * 2 + F.col("sub"))
        .drop("sub")
    )

    # --- phase 2: height-3 delete of the edited doc ---------------------
    del_h3 = (
        upd_base.where((F.col("scenario") >= 33) & (F.col("scenario") < 35))
        .select(*common, F.lit(None).cast("string").alias("text"))
        .withColumn("rev", rev(3, "d3"))
        .withColumn("seq", F.lit(_PHASE["delete3"]) * total + F.col("base_idx"))
        .withColumn("op", F.lit("delete"))
        .withColumn("is_delete", F.lit(True))
    )

    events = inserts.unionByName(phase1).unionByName(del_h3)

    # `tool` appears only in the later half of the feed (phase >= 1, or the
    # second half of the insert phase) -> drives in-flight additive evolution
    max_base = events.agg(F.max("base_idx")).first()[0] or 0
    tool_visible = (F.col("seq") >= F.lit(int(1e18))) | (F.col("base_idx") * 2 >= F.lit(int(max_base)))
    events = events.withColumn(
        "doc", F.when(F.col("is_delete"), F.lit(None).cast("string")).otherwise(_doc_json(tool_visible))
    )

    return events.select(
        "seq",
        "source",
        "op",
        F.col("_id").alias("id"),
        "rev",
        "doc",
    )


def write_feed(df: DataFrame, path: str, n_files: int = 16) -> None:
    """Persist the feed seq-sorted so seq-range scans prune at file level.

    ``repartitionByRange(seq)`` + ``sortWithinPartitions(seq)`` gives each
    parquet file a tight seq min/max — the source's range filters then skip
    whole files (the Spark analogue of the reference reading the feed by
    ``since=seq``, importer.js:155-161).
    """
    (
        df.repartitionByRange(n_files, "seq")
        .sortWithinPartitions("seq")
        .write.mode("overwrite")
        .parquet(path)
    )
