"""Incrementally-maintained MinHash-LSH near-dup index: dedup at CDC scale.

``functions/dedup.py`` finds near-duplicates by re-shingling and re-signing
the WHOLE corpus per run — right for one-shot audits, wrong as the standing
dedup gate at 10^10 documents, where each micro-batch should pay only for
its own changes. This module keeps a **band-signature table** fresh from
the document table's own changelog — the same query-time -> persisted-index
promotion the similarity plane (ANN/IVF) and the retrieval plane
(streaming/term_index.py) already made.

The maintenance loop is the generic changelog-fed derived-index machinery
(:mod:`cht_sync_spark.streaming.derived_index`): one row per (band,
band-hash, doc key), bucketed by (band, bh) — the LSH band hash IS the
candidate-lookup key, so probing a batch of M docs prunes the scan to the
(<= num_buckets) buckets its M x bands band hashes live in. (band, bh) is
part of the ROW KEY (a signature row is immutable; an update is delete +
insert of different keys), and stale rows of edited/deleted docs are
invalidated by the base class's delete-by-absence tombstones.

- **Hash config** (num_hashes / bands / shingle n / hash_fn) is pinned in
  index table properties at :meth:`DedupIndexConsumer.create_index` and
  read back by the consumer and the query functions, so maintenance and
  probes can never disagree on the signature scheme.
- **Queries**: :func:`dedup_index_pairs` (within-corpus verified near-dup
  pairs from the index — the standing replacement for re-running
  ``minhash_lsh_pairs`` per audit) and :func:`dedup_index_probe` (the
  dedup GATE: candidate matches for an incoming batch against the corpus,
  bucket-pruned, optionally exact-Jaccard verified). Both verify on
  compact int64 shingle arrays attached to candidate pairs only, never on
  texts — the minhash_lsh_pairs discipline.

``hash_fn='md5'`` uses the lexicographic string-min permutations
(:func:`cht_sync_spark.functions.dedup._md5_signature_from_shingles`)
whose every step exists verbatim in ANSI SQL, so a DuckDB oracle replays
signatures, band keys, candidates and verified jaccards across the whole
CDC sequence; the xxhash64 form stays the at-scale default (fixed-width
long mixing beats 32 md5s per shingle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from cht_sync_spark.functions.dedup import (
    _md5_signature_from_shingles,
    _signature_from_hashes,
    shingle_hashes,
    word_ngrams,
)
from cht_sync_spark.streaming.derived_index import DerivedIndexConsumer, DerivedIndexResult
from cht_sync_spark.tables.format import SnapshotTable, bucket_expr

__all__ = [
    "DedupIndexConsumer",
    "DedupIndexResult",
    "dedup_index_pairs",
    "dedup_index_probe",
]

# kept as the public result type of this plane
DedupIndexResult = DerivedIndexResult

_NUM_HASHES = "dedupindex.num_hashes"
_BANDS = "dedupindex.bands"
_SHINGLE_N = "dedupindex.shingle_n"
_HASH_FN = "dedupindex.hash_fn"


def _index_config(snap) -> tuple[int, int, int, str]:
    p = snap.properties
    try:
        return (int(p[_NUM_HASHES]), int(p[_BANDS]), int(p[_SHINGLE_N]), p[_HASH_FN])
    except KeyError as e:
        raise ValueError(
            "not a dedup index: missing hash-config property "
            f"{e} — create it with DedupIndexConsumer.create_index"
        ) from None


def _banded_rows(
    docs: DataFrame,
    key: list[str],
    text_col: str,
    num_hashes: int,
    bands: int,
    n: int,
    hash_fn: str,
) -> DataFrame:
    """(band, bh, key...) band-signature rows for the LIVE rows of
    ``docs``. Null-signature docs produce NO rows; empty/whitespace docs
    sign under the single empty shingle (word_ngrams' degenerate array) and
    so match other EMPTY docs exactly — deliberate batch-form parity: the
    same fold and band key as minhash_lsh_pairs, so the index and the batch
    form agree row-for-row on any corpus state (pinned in tests)."""
    live = (
        docs.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
        if "_deleted" in docs.columns
        else docs
    )
    if hash_fn == "md5":
        sig = _md5_signature_from_shingles(word_ngrams(F.col(text_col), n), num_hashes)
    else:
        sig = _signature_from_hashes(shingle_hashes(F.col(text_col), n), num_hashes)
    based = live.select(*key, sig.alias("sig")).where(F.col("sig").isNotNull())
    r = num_hashes // bands

    def _band_key(b):
        joined = F.concat_ws(
            ",", F.transform(F.slice("sig", b * r + 1, r), lambda x: x.cast("string"))
        )
        return joined if hash_fn == "md5" else F.xxhash64(joined)

    return based.select(
        *key,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.cast("int").alias("band"), _band_key(b).alias("bh")),
            )
        ).alias("bb"),
    ).select(F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"), *key)


class DedupIndexConsumer(DerivedIndexConsumer):
    derived_key = ["band", "bh"]

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable,
        index: SnapshotTable,
        name: str,
        *,
        text_col: str = "text",
        strict: bool = True,
        max_retries: int = 8,
    ):
        super().__init__(spark, source, index, name, strict=strict, max_retries=max_retries)
        self.text_col = text_col

    def derived_rows(self, docs: DataFrame, key: list[str]) -> DataFrame:
        nh, bands, n, fn = _index_config(self.index.snapshot())
        return _banded_rows(docs, key, self.text_col, nh, bands, n, fn)

    # --------------------------------------------------------------- setup
    @classmethod
    def create_index(
        cls,
        spark: SparkSession,
        source: SnapshotTable,
        path: str,
        *,
        num_buckets: int = 16,
        num_hashes: int = 32,
        bands: int = 8,
        shingle_n: int = 3,
        hash_fn: str = "xxhash",
    ) -> SnapshotTable:
        """Empty band-bucketed signature table wired to the source's key
        and LWW spec, with the hash scheme pinned in table properties;
        bootstrap = run the consumer (history is one range)."""
        if num_hashes % bands:
            raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
        if hash_fn not in ("xxhash", "md5"):
            raise ValueError(f"hash_fn must be 'xxhash' or 'md5', got {hash_fn!r}")
        snap = source.snapshot()
        bh_type: T.DataType = T.StringType() if hash_fn == "md5" else T.LongType()
        fields = [
            T.StructField("band", T.IntegerType(), False),
            T.StructField("bh", bh_type, True),
        ]
        for k in snap.key_cols:
            fields.append(T.StructField(k, snap.schema[k].dataType, True))
        for c, _ in snap.lww_order or []:
            if c not in snap.key_cols and c not in ("band", "bh", "_deleted"):
                fields.append(T.StructField(c, snap.schema[c].dataType, True))
        fields.append(T.StructField("_deleted", T.BooleanType(), True))
        return SnapshotTable.create(
            spark, path, T.StructType(fields),
            key_cols=["band", "bh", *snap.key_cols],
            bucket_cols=["band", "bh"],
            num_buckets=num_buckets,
            sort_cols=["band", "bh", *snap.key_cols],
            lww_order=list(snap.lww_order or []),
            properties={
                _NUM_HASHES: str(num_hashes),
                _BANDS: str(bands),
                _SHINGLE_N: str(shingle_n),
                _HASH_FN: hash_fn,
            },
        )


def _single_key(snap) -> str:
    key = [c for c in snap.key_cols if c not in ("band", "bh")]
    if len(key) != 1:
        raise ValueError(
            f"dedup-index pair queries need a single-column doc key, got {key}"
        )
    return key[0]


def _verify_pairs(
    cand: DataFrame,
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_a: str,
    text_b: str,
    id_a: str,
    id_b: str,
    n: int,
    threshold: float,
) -> DataFrame:
    """Exact Jaccard on candidate pairs only, over compact int64 shingle
    arrays (never texts) — identical to minhash_lsh_pairs' verify stage.
    Sides are separate frames so a probe doc that UPDATES an existing
    corpus key verifies its new text against the corpus text."""

    def _side(docs, text_col, id_col):
        return docs.select(
            F.col(id_col).alias("id"), shingle_hashes(F.col(text_col), n).alias("hs")
        ).withColumn("n_sh", F.size("hs"))

    a, b = _side(docs_a, text_a, id_a).alias("sa"), _side(docs_b, text_b, id_b).alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.hs"), F.col("sb.hs")))
    union = F.col("sa.n_sh") + F.col("sb.n_sh") - inter
    return (
        cand.join(a, F.col("id_a") == F.col("sa.id"))
        .join(b, F.col("id_b") == F.col("sb.id"))
        .select("id_a", "id_b", (inter.cast("double") / union.cast("double")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def dedup_index_pairs(
    index: SnapshotTable,
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Within-corpus verified near-dup pairs from the PERSISTED index:
    candidates = key pairs sharing a (band, bh) row (classic banding),
    generated by a self-join of the maintained table — no re-shingling or
    re-signing of the corpus; ``docs`` supplies texts for the exact-Jaccard
    verify of candidate pairs only. Equals ``minhash_lsh_pairs`` with the
    same config on the same corpus state — pinned in tests."""
    snap = index.snapshot()
    _, _, n, _ = _index_config(snap)
    key = _single_key(snap)
    id_col = id_col or key
    # persist before the self-join: read_current is a scan + LWW window
    # fold when deltas exist, and aliasing it as both sides would run the
    # whole reconciliation twice (the same measured reason
    # dedup._materialize_sigs persists the batch form's shared base)
    rows = (
        index.read_current(drop_tombstones=True)
        .select("band", "bh", key)
        .persist()
    )
    x, y = rows.alias("x"), rows.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col(f"x.{key}") < F.col(f"y.{key}")),
        )
        .select(F.col(f"x.{key}").alias("id_a"), F.col(f"y.{key}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_pairs(cand, docs, docs, text_col, text_col, id_col, id_col, n, threshold)


def dedup_index_probe(
    index: SnapshotTable,
    probe: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_docs: DataFrame | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """The dedup GATE: candidate corpus matches for an incoming batch.
    The probe's band hashes are computed batch-side with the index's own
    pinned hash config, the index scan is PRUNED to the (<= num_buckets)
    buckets those hashes map to, and candidates join on (band, bh). With
    ``source_docs`` the candidates are exact-Jaccard verified (probe text
    vs corpus text); without it, raw candidate pairs return. A probe doc
    whose key already exists in the corpus never matches itself."""
    snap = index.snapshot()
    nh, bands, n, fn = _index_config(snap)
    key = _single_key(snap)
    # pb is computed twice (the bucket-prune collect + the candidate join)
    # — a probe is one micro-batch, so re-banding it beats holding a cached
    # frame across the caller's eventual execution
    pb = _banded_rows(
        probe.select(F.col(id_col), F.col(text_col)), [id_col], text_col, nh, bands, n, fn
    )
    buckets = sorted(
        r["__b"]
        for r in pb.select(
            bucket_expr(["band", "bh"], snap.num_buckets).alias("__b")
        )
        .distinct()
        .collect()
    )
    if not buckets:
        fields = [
            T.StructField("probe_id", probe.schema[id_col].dataType, True),
            T.StructField("match_id", snap.schema[key].dataType, True),
        ]
        if source_docs is not None:  # schema parity with the verified path
            fields.append(T.StructField("jaccard", T.DoubleType(), True))
        return probe.sparkSession.createDataFrame([], T.StructType(fields))
    idx = index.read_current(buckets=buckets, drop_tombstones=True).select(
        "band", "bh", F.col(key).alias("match_id")
    )
    cand = (
        pb.withColumnRenamed(id_col, "probe_id")
        .join(idx, on=["band", "bh"])
        .where(F.col("probe_id") != F.col("match_id"))
        .select("probe_id", "match_id")
        .dropDuplicates(["probe_id", "match_id"])
    )
    if source_docs is None:
        return cand
    out = _verify_pairs(
        cand.withColumnRenamed("probe_id", "id_a").withColumnRenamed("match_id", "id_b"),
        probe, source_docs, text_col, text_col, id_col, key, n, threshold,
    )
    return out.select(
        F.col("id_a").alias("probe_id"), F.col("id_b").alias("match_id"), "jaccard"
    )
