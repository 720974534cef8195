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

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from cht_sync_spark.functions.text import words
from cht_sync_spark.streaming.derived_index import DerivedIndexConsumer
from cht_sync_spark.tables.format import SnapshotTable, bucket_expr

__all__ = ["TermIndexConsumer", "IndexResult", "bm25_index_topk"]

_N_DOCS = "termindex.n_docs"
_TOTAL_DL = "termindex.total_dl"


@dataclass
class IndexResult:
    from_version: int
    to_version: int
    postings_upserted: int
    postings_deleted: int
    n_docs: int
    retries: int = 0


class TermIndexConsumer(DerivedIndexConsumer):
    """Postings maintenance over the generic derived-index loop
    (:mod:`cht_sync_spark.streaming.derived_index`): derived rows are the
    (term, doc key, tf, dl) postings of each live doc, and the base
    class's preimage diff + delete-by-absence tombstones invalidate stale
    terms. On top of the generic loop this consumer maintains ADDITIVE
    corpus statistics (live doc count, total token length) via the
    ``_cycle_extra``/``_extra_props`` hooks — the base's cursor guard
    (abort when the cursor moved under the merge) is exactly what makes
    the read-modify-write of those properties sound, so one index admits
    one maintainer name (enforced in ``_pre_run``)."""

    derived_key = ["term"]

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
        super().__init__(spark, source, index, name, strict=strict, max_retries=max_retries)
        self.text_col = text_col
        self.stop_terms = set(stop_terms or ())

    def stats(self) -> tuple[int, float]:
        """(live docs, average doc length) from index properties — O(1)."""
        p = self.index.snapshot().properties
        n = int(p.get(_N_DOCS, 0))
        total = int(p.get(_TOTAL_DL, 0))
        return n, (total / n if n else 0.0)

    # ------------------------------------------------------------ postings
    def derived_rows(self, docs: DataFrame, key: list[str]) -> DataFrame:
        """(term, key..., tf, dl) for the LIVE rows of ``docs`` — one
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

    # -------------------------------------------------------- stat deltas
    def _live_dl(self, docs: DataFrame, side: int):
        live = (
            ~F.coalesce(F.col("_deleted"), F.lit(False))
            if "_deleted" in docs.columns
            else F.lit(True)
        )
        dl_of = F.coalesce(F.size(words(F.lower(F.col(self.text_col)))), F.lit(0))
        return docs.select(
            F.lit(side).alias("__side"), live.alias("__live"), dl_of.alias("__dl")
        )

    def _cycle_extra(self, old: DataFrame, new: DataFrame):
        """(docs_delta, dl_delta) over the changed keys: new winners minus
        preimages, live rows only — the additive corpus-stat increments."""
        stat = (
            self._live_dl(new, 1)
            .unionByName(self._live_dl(old, 0))
            .agg(
                F.sum(F.when((F.col("__side") == 1) & F.col("__live"), 1).otherwise(0)).alias("n_new"),
                F.sum(F.when((F.col("__side") == 0) & F.col("__live"), 1).otherwise(0)).alias("n_old"),
                F.sum(F.when((F.col("__side") == 1) & F.col("__live"), F.col("__dl")).otherwise(0)).alias("dl_new"),
                F.sum(F.when((F.col("__side") == 0) & F.col("__live"), F.col("__dl")).otherwise(0)).alias("dl_old"),
            )
            .first()
        )
        return (
            int(stat["n_new"] or 0) - int(stat["n_old"] or 0),
            int(stat["dl_new"] or 0) - int(stat["dl_old"] or 0),
        )

    def _extra_props(self, extra, props: dict[str, str]) -> dict[str, str]:
        # runs AFTER the base cursor guard, so this is a pinned
        # read-modify-write of the additive stats (IVM's rule)
        docs_delta, dl_delta = extra
        return {
            _N_DOCS: str(int(props.get(_N_DOCS, 0)) + docs_delta),
            _TOTAL_DL: str(int(props.get(_TOTAL_DL, 0)) + dl_delta),
        }

    def _reseed_props(self, cur: DataFrame, tip: int) -> dict[str, str]:
        agg = (
            self._live_dl(cur, 1)
            .where(F.col("__live"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("__dl").alias("dl"))
            .first()
        )
        return {
            _N_DOCS: str(int(agg["n"] or 0)),
            _TOTAL_DL: str(int(agg["dl"] or 0)),
        }

    def _mk_result(self, from_v: int, tip: int, ups: int, dels: int, attempt: int):
        return IndexResult(from_v, tip, ups, dels, self.stats()[0], attempt)

    # ---------------------------------------------------------------- run
    def _pre_run(self) -> None:
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
