"""Incrementally-maintained inverted term index: BM25 at CDC scale.

``functions/search.py`` scores a query by scanning the corpus — right for
one-shot audits, wrong as the standing retrieval path at 10^10 documents.
This module keeps a **postings table** fresh from the document table's own
changelog, the same promotion the similarity plane made for ANN/IVF
(query-time scan → persisted, pruned index maintained per micro-batch):

- **Index layout**: one row per (term, doc key) with ``tf`` (term
  frequency) and ``dl`` (doc token length), stored as a SnapshotTable
  **bucketed by term** — a query's candidate set is pruned to its terms'
  buckets at plan time, so query cost is O(postings of the query terms),
  not O(index).
- **Maintenance** (:class:`TermIndexConsumer`): per cycle, the consumer
  reads the source changelog (O(changed files)), recovers each changed
  key's PREIMAGE with the IVM plane's time-travel read (bucket-pruned +
  broadcast semi-join at the cursor version — no CDC preimage format
  needed), and diffs old vs new term sets:

    * new/updated terms -> posting upserts carrying the new winner's LWW
      order columns;
    * terms the new version no longer contains (and every term of a
      deleted doc) -> **delete-by-absence tombstones** carrying the SAME
      new order columns, so they beat the stale posting and the merge
      (``tombstones='drop'``) physically removes it — the within-group
      absence move of the SFT model plane, applied to postings.

  Corpus statistics (live doc count, total token length) are maintained
  additively in index properties and committed ATOMICALLY with the
  postings merge and the cursor — one snapshot per cycle, crash-window
  replays are byte-identical (idempotent merge) and never double-count
  stats (the cursor is re-read before any retry, IVM's additive-state
  rule; one index admits one maintainer name, enforced).
- **Bootstrap** is just incremental from zero: create an empty index and
  run the consumer — the whole history is one changelog range.
- **Query** (:func:`bm25_index_topk`): term-bucket-pruned reconciled
  read -> exact per-term document frequencies from the pruned candidates
  (df of term t only needs t's postings) -> the same BM25 arithmetic as
  the scan form -> TakeOrderedAndProject.

Skew note: natural-language term frequencies are Zipfian — a stopword's
bucket is orders of magnitude hotter than the tail. ``stop_terms``
excludes terms from indexing entirely (the standard IR move; queries for
them fall back to the scan form), and ``num_buckets`` is the write-
parallelism knob exactly as for the landing table.

Retention contract: each cycle opens the cursor's snapshot (changelog
diff + preimage read), so with producer ``expire_snapshots(keep_last=k)``
the safe lag is k-1 snapshots; a lapsed cursor or producer rollback is
recovered by :meth:`TermIndexConsumer.reseed`.

Reference parity: none — the reference has no search surface (SURVEY
§2.5-class capability); the maintenance pattern is the reference's own
checkpoint-after-commit loop (importer.js:171-172) applied one level
down, like streaming/consumer.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from cht_sync_spark.operators.lww import lww_dedup
from cht_sync_spark.tables.format import CommitConflict, SnapshotTable, bucket_expr
from cht_sync_spark.tables.merge import merge_upsert
from cht_sync_spark.functions.text import words

__all__ = ["TermIndexConsumer", "IndexResult", "bm25_index_topk"]

_N_DOCS = "termindex.n_docs"
_TOTAL_DL = "termindex.total_dl"


class _RangeAlreadyApplied(Exception):
    """Raised from the pre-commit hook when a concurrent same-name
    maintainer already landed this changelog range — the additive corpus
    stats must not be applied twice (IVM's additive-state rule)."""


@dataclass
class IndexResult:
    from_version: int
    to_version: int
    postings_upserted: int
    postings_deleted: int
    n_docs: int
    retries: int = 0


class TermIndexConsumer:
    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable,
        index: SnapshotTable,
        name: str,
        *,
        text_col: str = "text",
        stop_terms: set[str] | None = None,
        strict: bool = True,
        max_retries: int = 8,
    ):
        self.spark = spark
        self.source = source
        self.index = index
        self.name = name
        self.text_col = text_col
        self.stop_terms = set(stop_terms or ())
        self.strict = strict
        self.max_retries = max_retries

    # ------------------------------------------------------------- cursor
    @property
    def _ckpt_key(self) -> str:
        return f"consumer.{self.name}.version"

    def position(self) -> int:
        v = self.index.snapshot().properties.get(self._ckpt_key)
        return int(v) if v is not None else 0

    def pending_versions(self) -> int:
        return max(0, self.source.current_version() - max(self.position(), 1))

    def stats(self) -> tuple[int, float]:
        """(live docs, average doc length) from index properties — O(1)."""
        p = self.index.snapshot().properties
        n = int(p.get(_N_DOCS, 0))
        total = int(p.get(_TOTAL_DL, 0))
        return n, (total / n if n else 0.0)

    # ------------------------------------------------------------ postings
    def _postings_of(self, docs: DataFrame, key: list[str]) -> DataFrame:
        """(key..., term, tf, dl) for the LIVE rows of ``docs`` — one
        explode + one keyed count; stop/empty terms excluded."""
        live = (
            docs.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
            if "_deleted" in docs.columns
            else docs
        )
        toks = live.select(
            *key, words(F.lower(F.col(self.text_col))).alias("__toks")
        ).withColumn("dl", F.coalesce(F.size("__toks"), F.lit(0)).cast("long"))
        t = toks.select(*key, "dl", F.explode("__toks").alias("term"))
        if self.stop_terms:
            t = t.where(~F.col("term").isin(sorted(self.stop_terms)))
        return t.groupBy(*key, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))

    def _delta(self, from_v: int, tip: int):
        """(postings batch, docs_added, docs_removed, dl_delta) for the
        changelog range, or None when it holds no logical changes."""
        src = self.source
        ch = src.changes(from_v, tip, strict=self.strict).drop(
            "_change_version", "_change_type"
        )
        snap = src.snapshot(from_v)
        key = list(snap.key_cols)
        touched = [
            r["__b"]
            for r in ch.select(
                bucket_expr(snap.bucket_cols, snap.num_buckets).alias("__b")
            )
            .distinct()
            .collect()
        ]
        if not touched:
            return None
        keys = ch.select(*key).distinct()
        old = src.read_current(version=from_v, buckets=sorted(touched)).join(
            F.broadcast(keys), on=key, how="left_semi"
        )
        order = (snap.lww_order or [(key[0], True)]) + [("__existing", False)]
        new = lww_dedup(
            old.withColumn("__existing", F.lit(1)).unionByName(
                ch.withColumn("__existing", F.lit(0)), allowMissingColumns=True
            ),
            key=key,
            order=order,
        ).drop("__existing")
        # the preimages and new winners feed FOUR consumers below (two
        # postings sets, the del anti-join, the stats aggregate) — persist
        # the tiny changed-key frames instead of re-running the fold
        old = old.persist()
        new = new.persist()

        new_p = self._postings_of(new, key)
        old_p = self._postings_of(old, key)
        ocols = [c for c, _ in (snap.lww_order or [])]
        winner_order = new.select(*key, *ocols)
        ups = new_p.join(winner_order, on=key).withColumn("_deleted", F.lit(False))
        # delete-by-absence: old terms the new version no longer emits get
        # tombstones carrying the NEW winner's order values (they must beat
        # the stale posting under the index's LWW — the purge-marker move)
        dels = (
            old_p.select(*key, "term")
            .join(new_p.select(*key, "term"), on=[*key, "term"], how="left_anti")
            .join(winner_order, on=key)
            .withColumn("tf", F.lit(None).cast("long"))
            .withColumn("dl", F.lit(None).cast("long"))
            .withColumn("_deleted", F.lit(True))
        )
        batch = ups.unionByName(dels.select(*ups.columns))

        live = (
            ~F.coalesce(F.col("_deleted"), F.lit(False))
            if "_deleted" in new.columns
            else F.lit(True)
        )
        dl_of = F.coalesce(F.size(words(F.lower(F.col(self.text_col)))), F.lit(0))
        stat = (
            new.select(F.lit(1).alias("__side"), live.alias("__live"), dl_of.alias("__dl"))
            .unionByName(
                old.select(F.lit(0).alias("__side"), live.alias("__live"), dl_of.alias("__dl"))
            )
            .agg(
                F.sum(F.when((F.col("__side") == 1) & F.col("__live"), 1).otherwise(0)).alias("n_new"),
                F.sum(F.when((F.col("__side") == 0) & F.col("__live"), 1).otherwise(0)).alias("n_old"),
                F.sum(F.when((F.col("__side") == 1) & F.col("__live"), F.col("__dl")).otherwise(0)).alias("dl_new"),
                F.sum(F.when((F.col("__side") == 0) & F.col("__live"), F.col("__dl")).otherwise(0)).alias("dl_old"),
            )
            .first()
        )
        return (
            batch,
            int(stat["n_new"] or 0) - int(stat["n_old"] or 0),
            int(stat["dl_new"] or 0) - int(stat["dl_old"] or 0),
            old,
            new,
        )

    # ---------------------------------------------------------------- run
    def _check_sole_owner(self) -> None:
        others = [
            k
            for k in self.index.snapshot().properties
            if k.startswith("consumer.") and k.endswith(".version") and k != self._ckpt_key
        ]
        if others:
            raise ValueError(
                f"term index {self.index.path} is already maintained by {others}; "
                "additive corpus stats admit ONE maintainer name — reseed() to "
                "take over atomically"
            )

    def run_once(self) -> IndexResult | None:
        """Index everything committed since the cursor, or None if caught
        up. Postings merge, corpus stats, and cursor commit in ONE
        snapshot; a lost commit race re-reads the cursor before retrying
        (additive stats are not idempotent — IVM's rule)."""
        self._check_sole_owner()
        last_err: CommitConflict | None = None
        for attempt in range(self.max_retries):
            tip = self.source.current_version()
            from_v = max(self.position(), 1)
            if tip <= from_v:
                return None if attempt == 0 else IndexResult(from_v, tip, 0, 0, self.stats()[0], attempt)
            d = self._delta(from_v, tip)
            if d is None:  # compaction-only range: advance the cursor
                try:
                    isnap = self.index.snapshot()
                    self.index.commit(
                        add_files=[],
                        properties_update={self._ckpt_key: str(tip)},
                        expected_version=isnap.version,
                    )
                    return IndexResult(from_v, tip, 0, 0, self.stats()[0], attempt)
                except CommitConflict as e:
                    last_err = e
                    time.sleep(0.05 * (attempt + 1))
                    continue
            batch, docs_delta, dl_delta, old, new = d
            applied_n = {"n": 0}

            def _props() -> dict[str, str]:
                # post-write, PRE-COMMIT (same atomic snapshot as the
                # postings): re-read the cursor so the additive stats are
                # a pinned read-modify-write. A concurrent same-name
                # maintainer that already landed this range shows up as an
                # advanced cursor with NO CommitConflict (the merge pinned
                # to the post-racer tip) — abort instead of double-adding.
                p = self.index.snapshot().properties
                cur = max(int(p.get(self._ckpt_key, 0)), 1)
                if cur >= tip:
                    raise _RangeAlreadyApplied()
                if cur != from_v:
                    raise CommitConflict(
                        f"cursor moved {from_v} -> {cur} under the merge"
                    )
                applied_n["n"] = int(p.get(_N_DOCS, 0)) + docs_delta
                return {
                    self._ckpt_key: str(tip),
                    _N_DOCS: str(applied_n["n"]),
                    _TOTAL_DL: str(int(p.get(_TOTAL_DL, 0)) + dl_delta),
                }

            try:
                stats = merge_upsert(
                    self.index,
                    batch,
                    tombstones="drop",
                    prefer="batch",  # a re-derived posting is authoritative
                    properties_fn=_props,
                    max_retries=1,  # losses re-check the cursor out here
                )
                if self.position() < tip:
                    # empty postings batch (e.g. changed docs with only
                    # stop/empty text): the merge's empty path skips
                    # properties_fn — commit stats + cursor pinned here
                    isnap = self.index.snapshot()
                    self.index.commit(
                        add_files=[],
                        properties_update=_props(),
                        expected_version=isnap.version,
                    )
                return IndexResult(
                    from_v, tip, stats.rows_in_batch,
                    stats.rows_deleted_tombstones, applied_n["n"], attempt,
                )
            except _RangeAlreadyApplied:
                return IndexResult(from_v, tip, 0, 0, self.stats()[0], attempt)
            except CommitConflict as e:
                last_err = e
                time.sleep(0.05 * (attempt + 1))
            finally:
                old.unpersist()
                new.unpersist()
        raise last_err  # type: ignore[misc]

    def run(self, max_cycles: int | None = None) -> list[IndexResult]:
        out: list[IndexResult] = []
        while max_cycles is None or len(out) < max_cycles:
            r = self.run_once()
            if r is None:
                break
            out.append(r)
        return out

    def reseed(self) -> IndexResult:
        """Atomic full rebuild from the source's current state — recovery
        for uncrossable changelogs (producer rollback, lapsed cursor) and
        the sanctioned ownership-transfer path."""
        tip = self.source.current_version()
        snap = self.source.snapshot(tip)
        key = list(snap.key_cols)
        cur = self.source.read_current(version=tip)
        if "_deleted" not in cur.columns:
            cur = cur.withColumn("_deleted", F.lit(False))
        p = self._postings_of(cur, key)
        ocols = [c for c, _ in (snap.lww_order or [])]
        full = p.join(cur.select(*key, *ocols), on=key).withColumn(
            "_deleted", F.lit(False)
        )
        live = cur.where(~F.coalesce(F.col("_deleted"), F.lit(False))) if "_deleted" in cur.columns else cur
        agg = live.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.size(words(F.lower(F.col(self.text_col)))), F.lit(0))).alias("dl"),
        ).first()
        isnap = self.index.snapshot()
        stale = [
            k for k in isnap.properties
            if k.startswith("consumer.") and k.endswith(".version")
        ]
        self.index.overwrite(
            full.select(*self.index.snapshot().schema.fieldNames()),
            properties_update={
                **{k: None for k in stale},
                self._ckpt_key: str(tip),
                _N_DOCS: str(int(agg["n"] or 0)),
                _TOTAL_DL: str(int(agg["dl"] or 0)),
            },
        )
        return IndexResult(0, tip, int(agg["n"] or 0), 0, int(agg["n"] or 0))

    # --------------------------------------------------------------- setup
    @classmethod
    def create_index(
        cls,
        spark: SparkSession,
        source: SnapshotTable,
        path: str,
        *,
        num_buckets: int = 16,
    ) -> SnapshotTable:
        """Empty term-bucketed postings table wired to the source's key and
        LWW spec; bootstrap = run the consumer (history is one range)."""
        snap = source.snapshot()
        fields = [T.StructField("term", T.StringType(), False)]
        for k in snap.key_cols:
            fields.append(T.StructField(k, snap.schema[k].dataType, True))
        fields += [
            T.StructField("tf", T.LongType(), True),
            T.StructField("dl", T.LongType(), True),
        ]
        for c, _ in snap.lww_order or []:
            # "_deleted" is appended explicitly below even when it is an
            # order column (the landing default LWW_ORDER includes it)
            if c not in snap.key_cols and c not in ("term", "_deleted"):
                fields.append(T.StructField(c, snap.schema[c].dataType, True))
        fields.append(T.StructField("_deleted", T.BooleanType(), True))
        return SnapshotTable.create(
            spark, path, T.StructType(fields),
            key_cols=["term", *snap.key_cols],
            bucket_cols=["term"],
            num_buckets=num_buckets,
            sort_cols=["term", *snap.key_cols],
            lww_order=list(snap.lww_order or []),
        )


def bm25_index_topk(
    index: SnapshotTable,
    terms: list[str],
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` docs by BM25 from the PERSISTED index: candidate postings
    are pruned to the query terms' buckets at plan time (bucket_for on the
    driver — no scan of the rest of the index), per-term df comes exactly
    from the pruned candidates, N/avgdl from the maintained properties.
    Same arithmetic and (score desc, key asc) tie-break as the scan form
    (:func:`cht_sync_spark.functions.search.bm25_topk`), so the two agree
    on any corpus state — pinned in tests."""
    if not terms:
        raise ValueError("bm25_index_topk needs at least one query term")
    snap = index.snapshot()
    p = snap.properties
    n_docs = int(p.get(_N_DOCS, 0))
    total_dl = int(p.get(_TOTAL_DL, 0))
    if n_docs == 0:
        key = [c for c in snap.key_cols if c != "term"]
        return index.spark.createDataFrame(
            [], T.StructType([snap.schema[c] for c in key] + [T.StructField("score", T.DoubleType(), True)])
        )
    avgdl = total_dl / n_docs
    # all query terms' buckets in ONE constant-folded job (per-term
    # bucket_for calls would pay one driver job per term), evaluated with
    # the table's own bucket expression so it cannot disagree with the
    # layout hash
    tdf = index.spark.createDataFrame([(t,) for t in set(terms)], "term string")
    buckets = sorted(
        {
            r["__b"]
            for r in tdf.select(
                bucket_expr(["term"], snap.num_buckets).alias("__b")
            )
            .distinct()
            .collect()
        }
    )
    cand = index.read_current(buckets=buckets, drop_tombstones=True).where(
        F.col("term").isin(list(terms))
    )
    key = [c for c in snap.key_cols if c != "term"]
    dfreq = cand.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)))
    )
    return (
        cand.join(F.broadcast(dfreq), on="term")
        .groupBy(*key)
        .agg(F.sum(contrib).alias("score"))
        .orderBy(F.desc("score"), *[F.asc(c) for c in key])
        .limit(k)
    )
