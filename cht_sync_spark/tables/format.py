"""SnapshotTable — a minimal ACID table layer over parquet.

This sandbox ships no Iceberg/Delta runtime jar, so the engine provides its
own lakehouse primitives with the same guarantees the design needs
(SURVEY.md §7.2/§7.3):

- **atomic commits**: one small JSON snapshot file per version, claimed
  with ``O_CREAT|O_EXCL`` (optimistic concurrency) and finalized via POSIX
  ``rename``; a crash mid-commit leaves only orphan data/manifest files,
  never a half-visible snapshot. This is the analogue of Iceberg's atomic
  snapshot swap and of the reference's reliance on single-statement
  Postgres atomicity (importer.js:129-131).
- **split manifests (Iceberg's manifest-list architecture)**: the snapshot
  file holds schema/properties plus a LIST of immutable manifest-file
  names; each manifest file holds the data-file entries of one commit.
  An append commit therefore writes O(files-in-this-commit) metadata —
  one new manifest plus a tiny snapshot — NOT a rewrite of the full live
  file list (which at 10^10 events with num_buckets sized to cluster
  cores would make every commit O(live files) of driver-side JSON).
  Commits that REMOVE files (COW merge, compact) rewrite only the
  manifests they intersect; compaction collapses all of them into one.
  Readers fold the manifests, each parsed at most once per process
  (immutable -> cached).
- **snapshot properties**: a string->string map committed atomically WITH
  the data — carries the per-source/per-partition sequence checkpoints and
  the exactly-once epoch markers (the analogue of stashing the commit epoch
  in the Iceberg snapshot summary; reference: ``couchdb_progress`` row
  updated after the upsert commits, importer.js:171-172).
- **hash-bucket layout**: every data file belongs to one of ``num_buckets``
  buckets of ``pmod(xxhash64(bucket_cols...), num_buckets)``. MERGE rewrites
  only the buckets a batch touches (copy-on-write), so upsert cost scales
  with the batch's key spread, not table size. ``bucket_cols`` defaults to
  the key but may be a PREFIX of it (e.g. bucket transcripts by ``conv_id``
  alone): every row of a key still lands in exactly one bucket, and
  group-scoped readers (incremental models keyed by ``conv_id``) prune to
  the touched buckets instead of scanning the table. The analogue of the
  reference's Postgres indexes (setup.js:21-31) is bucket pruning + parquet
  min/max stats from the per-bucket ``sort_cols`` write order.
- **merge-on-read deltas**: ``append_delta`` commits a micro-batch as pure
  appended files (O(batch) ingest); readers reconcile with the same LWW
  window used everywhere; ``compact()`` folds deltas into the base. This is
  the sustained-throughput path for the 10^10-event replay target.
- **additive schema evolution**: the manifest carries the current schema;
  readers project old files through it (missing columns read as null) —
  the analogue of dbt ``on_schema_change='append_new_columns'``
  (contacts.sql:5) / ``ALTER TABLE ADD COLUMN IF NOT EXISTS``.

Time travel: any committed version can be read back (``read(version=...)``),
used by tests to diff pre/post-merge states.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.tables.fileio import LOCAL_IO, FileIO, _fsync_dir  # noqa: E402

_SNAPDIR = "_snapshots"
_MANDIR = "_manifests"
_DATADIR = "data"


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic concurrency)."""


class SchemaContractError(ValueError):
    """Strict-contract violation: batch schema is incompatible with the table
    contract (missing column, type mismatch, or undeclared extra column).
    The analogue of dbt ``contract: enforced: true`` (contacts.yml:7-8),
    which FAILS the run instead of silently coercing."""


@dataclass
class Snapshot:
    version: int
    schema: T.StructType
    key_cols: list[str]
    # bucket_cols ⊆ key_cols (usually the key or its prefix): the hash-layout
    # columns. Bucketing by a key prefix lets group-scoped readers prune.
    bucket_cols: list[str]
    num_buckets: int
    sort_cols: list[str]
    # LWW precedence as (column, ascending) pairs — part of the table
    # contract so merge-time and read-time reconciliation always agree
    lww_order: list[tuple[str, bool]]
    # files: the FOLDED view of all manifest entries — list of
    # {"path": rel, "bucket": int, "level": "base"|"delta", "commit": str}.
    # Built by concatenating cached immutable manifest-file contents; the
    # snapshot JSON on disk stores only `manifests` (the file names).
    files: list[dict[str, Any]]
    properties: dict[str, str]
    parent: int | None
    # relative paths of the immutable manifest files this snapshot folds
    manifests: list[str] | None = None
    # what produced this snapshot — Iceberg's snapshot `operation` field:
    # "create" | "append" (pure file adds) | "overwrite" (logical rewrite:
    # COW merge / full refresh) | "replace" (physical-only rewrite:
    # compaction — NO logical change, skipped by changelog reads)
    operation: str = "append"
    # commit wall-clock (epoch seconds) — Iceberg's timestamp-ms: enables
    # AS OF <timestamp> time travel (:meth:`SnapshotTable.as_of`). Metadata
    # only; never feeds data-plane determinism. Legacy snapshots fall back
    # to the snapshot file's mtime on load. compare=False: CONTENT equality
    # (fast_forward's fork-point check) must not depend on when — or from
    # which copied file's mtime — a snapshot was stamped.
    committed_at: float | None = field(default=None, compare=False)


def maintain_tables(
    tables: list["SnapshotTable"],
    keep_last: int,
    compact: list["SnapshotTable"] = (),
) -> None:
    """One maintenance cycle over a set of tables (the shared body of
    ``ReplayPipeline.maintain`` / ``StreamingReplay.maintain``): fold
    merge-on-read deltas in the ``compact`` subset (the MOR landing table;
    bookkeeping tables built from per-batch micro-appends, e.g. lineage,
    which otherwise accrete one delta file per batch forever), then expire
    old snapshots (bounds driver metadata) and vacuum aged orphans (bounds
    disk) everywhere. Grace-windowed vacuum is concurrency-safe (S8)."""
    for t in compact:
        t.compact()  # incremental: no-op unless delta/cdc buckets exist
    for t in tables:
        t.expire_snapshots(keep_last=keep_last)
        t.vacuum()


def bucket_expr(key_cols: list[str], num_buckets: int):
    """The bucket transform: pmod(xxhash64(key...), N). Deterministic across
    sessions (xxhash64 seed fixed), so batch and table always agree."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(num_buckets)).cast("int")


# ---------------------------------------------------------- file-level stats
# Per-data-file column min/max bounds recorded in manifest entries at write
# time (Iceberg's lower_bounds/upper_bounds) and consulted at scan planning:
# a filtered read opens only the files whose range can contain matches. This
# is the file-granular layer of the skipping stack — bucket pruning (hash
# layout) > file skipping (manifest bounds, driver-side, no I/O beyond the
# already-cached manifest) > parquet row-group pushdown (page stats from the
# sort_cols write order). At 10^10 rows the middle layer is what keeps a
# point/range lookup from *opening* every file of a bucket.

_STR_BOUND_CAP = 64  # chars; beyond this a string upper bound is dropped


def _norm_bound(v: Any, dtype: T.DataType) -> Any:
    """Normalize a bound/filter value into its JSON-storable, totally-ordered
    compare domain: timestamps -> epoch micros (int), dates -> ISO string
    (lexicographic == chronological), numerics/strings/bools unchanged."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(dtype, T.TimestampType) or isinstance(dtype, T.TimestampNTZType):
        if isinstance(v, _dt.datetime):
            # anchor at the UNIX epoch: tz-aware values subtract against
            # the UTC epoch (an epoch carrying v's own offset would shift
            # the result by that offset and silently mis-prune); naive
            # values are taken as UTC wall time, matching parquet stats
            epoch = _dt.datetime(
                1970, 1, 1, tzinfo=_dt.timezone.utc if v.tzinfo is not None else None
            )
            return int((v - epoch).total_seconds() * 1_000_000)
        return int(v)  # already micros
    if isinstance(dtype, T.DateType):
        return v.isoformat() if isinstance(v, _dt.date) else str(v)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(v)
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(v)
    return v


def _file_stats(
    abs_path: str, stat_cols: list[str], schema: T.StructType
) -> tuple[dict[str, dict[str, Any]], int, bool | None]:
    """Column bounds, row count, and tombstone-freedom of one parquet file
    from its FOOTER metadata (no data pages read; ~ms per file,
    driver-side). A bound side is ``None`` when unknowable (all-null
    chunk, missing stats, over-cap string upper bound) — ``None`` disables
    pruning on that side, never causes a false skip. String lower bounds
    may be truncated (a prefix is a valid lower bound); string upper
    bounds are kept only when exact.

    The third element is the ``_deleted`` verdict for metadata-only LIVE
    counts: ``True`` = provably no tombstone rows (column absent, all
    null, or boolean max is False), ``None`` = unknowable from the footer
    (mixed/unstatted) — never a guess."""
    import pyarrow.parquet as pq

    by_name = {f.name: f.dataType for f in schema.fields}
    md = pq.ParquetFile(abs_path).metadata
    tomb_free: bool | None = True
    didx = None
    for i in range(md.num_columns):
        if md.schema.column(i).name == "_deleted":
            didx = i
            break
    if didx is not None:
        for rg in range(md.num_row_groups):
            ch = md.row_group(rg).column(didx)
            st = ch.statistics
            if st is not None and st.null_count == ch.num_values:
                continue  # all-null chunk: no tombstones here
            if st is None or not st.has_min_max or st.max is not False:
                tomb_free = None  # may hold tombstones: footer can't say
                break
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict[str, dict[str, Any]] = {}
    for col in stat_cols:
        if col not in idx or col not in by_name:
            continue
        dtype = by_name[col]
        lo: Any = None
        hi: Any = None
        ok = True
        # null presence (for expire_rows' all-rows-expired proof): False =
        # provably no nulls, True = nulls present, None = unknowable
        nulls: bool | None = False

        def _chunk_nulls(st, ch) -> bool | None:
            if st is None or not getattr(st, "has_null_count", False):
                return None if ch.num_values else False
            return st.null_count > 0

        for rg in range(md.num_row_groups):
            ch = md.row_group(rg).column(idx[col])
            st = ch.statistics
            cn = _chunk_nulls(st, ch)
            if cn is True:
                nulls = True
            elif cn is None and nulls is False:
                nulls = None
            if st is None or not st.has_min_max:
                if ch.num_values and (st is None or st.null_count != ch.num_values):
                    ok = False  # real values with no stats: bounds unknowable
                    break
                continue  # all-null chunk contributes nothing
            mn, mx = _norm_bound(st.min, dtype), _norm_bound(st.max, dtype)
            lo = mn if lo is None or (mn is not None and mn < lo) else lo
            hi = mx if hi is None or (mx is not None and mx > hi) else hi
        if not ok:
            out[col] = {"lo": None, "hi": None, "nulls": None}
            continue
        if isinstance(dtype, T.StringType):
            if lo is not None and len(lo) > _STR_BOUND_CAP:
                lo = lo[:_STR_BOUND_CAP]  # prefix: still a valid lower bound
            if hi is not None and len(hi) > _STR_BOUND_CAP:
                hi = None  # a truncated upper bound would over-prune
        out[col] = {"lo": lo, "hi": hi, "nulls": nulls}
    return out, int(md.num_rows), tomb_free


_FILTER_OPS = ("=", "<", "<=", ">", ">=", "in")


def _entry_matches(entry: dict[str, Any], filters: list[tuple[str, str, Any]]) -> bool:
    """Can this manifest entry's file contain rows satisfying ALL filters?
    Conservative: a file with no recorded stats (legacy entries, uncovered
    columns, unknown bound sides) is always kept."""
    stats = entry.get("stats")
    if not stats:
        return True
    for col, op, v in filters:
        b = stats.get(col)
        if b is None:
            continue
        lo, hi = b.get("lo"), b.get("hi")
        if op == "=":
            if (lo is not None and v < lo) or (hi is not None and v > hi):
                return False
        elif op == "in":
            # the file survives if ANY listed value fits its range
            if not any(
                (lo is None or x >= lo) and (hi is None or x <= hi) for x in v
            ):
                return False
        elif op == "<":
            if lo is not None and lo >= v:
                return False
        elif op == "<=":
            if lo is not None and lo > v:
                return False
        elif op == ">":
            if hi is not None and hi <= v:
                return False
        elif op == ">=":
            if hi is not None and hi < v:
                return False
        else:
            raise ValueError(f"unsupported filter op {op!r} (use one of {_FILTER_OPS})")
    return True


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str, io: "FileIO | None" = None):
        self.spark = spark
        self.path = path
        # Storage seam for the METADATA plane (tables/fileio.py): commit
        # claims, snapshot/manifest/sidecar IO, clone linking, vacuum
        # listing all route through it. The default is the POSIX impl;
        # an object-store deployment passes its own (the data plane is
        # Spark's and flows through the Hadoop FS connectors instead).
        self._io = io if io is not None else LOCAL_IO
        # branch handles point at a sibling snapshot dir; data files and
        # manifest files are SHARED across branches (immutable, content-
        # addressed), so a branch is metadata-only until it commits
        self._snapdir = _SNAPDIR
        self.last_scan_files = 0  # files opened by the most recent read()
        # Manifest parse cache keyed by version. Manifests are IMMUTABLE
        # once committed (O_EXCL claim + atomic rename), so a parsed
        # Snapshot can be reused forever; a successful commit also primes
        # the cache with the snapshot it just wrote. This removes the
        # per-batch JSON read+parse that showed up as fixed driver overhead
        # (~every state()/merge/model call re-read the tip manifest).
        self._snap_cache: dict[int, Snapshot] = {}
        # manifest files are immutable too: parse each at most once
        self._manifest_cache: dict[str, list[dict[str, Any]]] = {}
        # bloom sidecars are immutable (uuid-named, swapped by property):
        # decoded bitsets cached per sidecar path
        self._bloom_cache: dict[str, dict[str, Any]] = {}

    # ------------------------------------------------------------------ DDL
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        num_buckets: int = 16,
        sort_cols: list[str] | None = None,
        lww_order: list[tuple[str, bool]] | None = None,
        properties: dict[str, str] | None = None,
        if_not_exists: bool = True,
        bucket_cols: list[str] | None = None,
        io: "FileIO | None" = None,
    ) -> "SnapshotTable":
        t = cls(spark, path, io=io)
        if t.exists():
            if if_not_exists:
                return t
            raise FileExistsError(path)
        if lww_order is None:
            # default: the transcript LWW spec, restricted to columns the
            # schema actually has (append-only tables may have none — then
            # later rows win only via explicit order, and read_current's
            # dedup degenerates to key-uniqueness)
            from cht_sync_spark.schemas import LWW_ORDER

            names = {f.name for f in schema.fields}
            lww_order = [(c, asc) for c, asc in LWW_ORDER if c in names]
        t._io.mkdirs(os.path.join(path, t._snapdir))
        t._io.mkdirs(os.path.join(path, _DATADIR))
        try:
            t._write_manifest(
            Snapshot(
                version=1,
                schema=schema,
                key_cols=list(key_cols),
                bucket_cols=list(bucket_cols or key_cols),
                num_buckets=num_buckets,
                sort_cols=list(sort_cols or key_cols),
                lww_order=[(c, bool(a)) for c, a in lww_order],
                files=[],
                properties=dict(properties or {}),
                parent=None,
                manifests=[],
                operation="create",
            )
            )
        except CommitConflict:
            # two writers raced CREATE TABLE IF NOT EXISTS: the loser adopts
            # the winner's table (S8 concurrent watchers share one landing)
            if not if_not_exists:
                raise
        return t

    def exists(self) -> bool:
        d = os.path.join(self.path, self._snapdir)
        return any(f.endswith(".json") for f in self._io.list_dir(d))

    # ------------------------------------------------------------- snapshots
    def _versions(self) -> list[int]:
        """Committed versions only: a concurrent writer's O_EXCL CLAIM file
        is empty until the atomic rename lands, so zero-size manifests are
        in-flight commits, not visible snapshots (reading one raced a
        JSONDecodeError before this guard)."""
        d = os.path.join(self.path, self._snapdir)
        out = []
        for f in self._io.list_dir(d):
            if not (f.startswith("v") and f.endswith(".json")):
                continue
            v = int(f[1:-5])
            if v in self._snap_cache:
                out.append(v)
                continue
            sz = self._io.size(os.path.join(d, f))
            if sz:  # None = expired/removed concurrently; 0 = in-flight claim
                out.append(v)
        return sorted(out)

    def current_version(self) -> int:
        """Latest COMMITTED version. If every manifest present is a
        zero-size in-flight claim (a concurrent CREATE between its O_EXCL
        claim and the atomic rename), wait briefly for the creator's rename
        — the same race used to surface as a JSONDecodeError on the empty
        claim file before the zero-size guard existed."""
        import time as _time

        for _ in range(250):
            vs = self._versions()
            if vs:
                return vs[-1]
            _time.sleep(0.02)
        raise FileNotFoundError(f"no committed snapshot at {self.path}")

    def snapshot(self, version: int | None = None) -> Snapshot:
        import time as _time

        v = version if version is not None else self.current_version()
        cached = self._snap_cache.get(v)
        if cached is not None:
            return cached
        fp = os.path.join(self.path, self._snapdir, f"v{v:08d}.json")
        # Retry window for the claim->rename race when an explicit version
        # is requested (the default path already filters in-flight claims).
        m = None
        for _ in range(100):
            try:
                m = json.loads(self._io.read_text(fp))
                break
            except json.JSONDecodeError:
                _time.sleep(0.02)
        if m is None:
            m = json.loads(self._io.read_text(fp))
        snap = self._from_manifest(m)
        if snap.committed_at is None:  # legacy snapshot: file mtime
            snap.committed_at = self._io.mtime(fp)
        self._snap_cache[v] = snap
        return snap

    def _from_manifest(self, m: dict) -> Snapshot:
        if "manifests" in m:
            refs = m["manifests"]
            files: list[dict[str, Any]] = []
            for ref in refs:
                files.extend(self._load_manifest(ref))
        else:  # legacy inline file list (pre-split-manifest snapshots)
            refs = None
            files = m["files"]
        return Snapshot(
            version=m["version"],
            schema=T.StructType.fromJson(m["schema"]),
            key_cols=m["key_cols"],
            bucket_cols=m.get("bucket_cols", m["key_cols"]),
            num_buckets=m["num_buckets"],
            sort_cols=m["sort_cols"],
            lww_order=[(c, bool(a)) for c, a in m.get("lww_order", [])],
            files=files,
            properties=m["properties"],
            parent=m["parent"],
            manifests=refs,
            # legacy snapshots (pre-changelog) carry no operation marker;
            # "unknown" makes changelog reads over them explicitly refuse
            # instead of silently guessing
            operation=m.get("operation", "unknown"),
            committed_at=m.get("committed_at"),
        )

    # -------------------------------------------------------- manifest files
    def _load_manifest(self, rel: str) -> list[dict[str, Any]]:
        cached = self._manifest_cache.get(rel)
        if cached is not None:
            return cached
        entries = json.loads(self._io.read_text(os.path.join(self.path, rel)))["entries"]
        self._manifest_cache[rel] = entries
        return entries

    def _write_manifest_file(self, entries: list[dict[str, Any]]) -> str:
        """Write one immutable manifest file; returns its table-relative
        path. Content-fsync'd AND directory-fsync'd BEFORE any snapshot
        references it: POSIX does not order metadata ops across a crash,
        so without the directory fsync a later snapshot rename could
        survive power loss while this manifest's rename does not — a
        visible snapshot referencing a missing manifest (permanent
        corruption, vs the clean rollback a lost snapshot file is)."""
        d = os.path.join(self.path, _MANDIR)
        self._io.mkdirs(d)
        rel = os.path.join(_MANDIR, f"m-{uuid.uuid4().hex}.json")
        # write_text_atomic is content-fsync'd AND dir-fsync'd locally
        # (see fileio.py); a PUT's 200 is the same acknowledgment on S3
        self._io.write_text_atomic(
            os.path.join(self.path, rel), json.dumps({"entries": entries})
        )
        self._manifest_cache[rel] = entries
        return rel

    def history(self) -> list[Snapshot]:
        return [self.snapshot(v) for v in self._versions()]

    def meta(self, kind: str) -> DataFrame:
        """Iceberg metadata-table analogue (``db.t.snapshots`` /
        ``db.t.files`` / ``db.t.manifests``, the refs listing): the table's
        own bookkeeping as a queryable DataFrame — the ops/debugging surface
        (how many live files per bucket, which snapshot compacted what, what
        refs pin retention). Driver-side state only, no data-file I/O.

        - ``'snapshots'``: version, parent, operation, num_buckets,
          n_files, n_manifests per retained snapshot;
        - ``'files'``: path, bucket, level, commit (+ has_stats) of the
          CURRENT snapshot's live files;
        - ``'manifests'``: manifest path + entry count of the current
          snapshot;
        - ``'refs'``: tags and branches with their pinned/head versions.
        """
        if kind == "snapshots":
            rows = [
                (s.version, s.parent, s.operation, s.num_buckets,
                 len(s.files), len(s.manifests or []))
                for s in self.history()
            ]
            cols = "version int, parent int, operation string, num_buckets int, n_files int, n_manifests int"
        elif kind == "files":
            snap = self.snapshot()
            conf = self._bloom_conf(snap)
            side = self._bloom_words(conf["sidecar"]) if conf and conf["sidecar"] else {}
            rows = [
                (f["path"], f["bucket"], f["level"], f["commit"], "stats" in f,
                 f.get("rows"), bool(f.get("live_exact", False)), f["path"] in side)
                for f in snap.files
            ]
            cols = (
                "path string, bucket int, level string, commit string, "
                "has_stats boolean, rows bigint, live_exact boolean, has_bloom boolean"
            )
        elif kind == "manifests":
            snap = self.snapshot()
            rows = [(m, len(self._load_manifest(m))) for m in (snap.manifests or [])]
            cols = "path string, n_entries int"
        elif kind == "refs":
            rows = [("tag", n, v) for n, v in sorted(self.tags().items())]
            for n in self.branches():
                try:
                    head = SnapshotTable(self.spark, self.path, io=self._io).branch(n).current_version()
                except FileNotFoundError:
                    # a crashed create_branch left an empty claim dir —
                    # surface it (null head) so the ops view FLAGS the state
                    # it exists to debug instead of throwing on it;
                    # drop_branch clears the claim
                    head = None
                rows.append(("branch", n, head))
            cols = "kind string, name string, version int"
        else:
            raise ValueError(
                f"unknown metadata table {kind!r}; one of snapshots/files/manifests/refs"
            )
        return self.spark.createDataFrame(rows, cols)

    def _write_manifest(self, snap: Snapshot) -> None:
        if snap.committed_at is None:
            import time as _time

            # stamped at the single commit choke point — every committed
            # snapshot gets a wall-clock for AS OF time travel (metadata
            # only; replay determinism never reads it)
            snap.committed_at = _time.time()
        d = os.path.join(self.path, self._snapdir)
        final = os.path.join(d, f"v{snap.version:08d}.json")
        body: dict[str, Any] = {
            "version": snap.version,
            "schema": snap.schema.jsonValue(),
            "key_cols": snap.key_cols,
            "bucket_cols": snap.bucket_cols,
            "num_buckets": snap.num_buckets,
            "sort_cols": snap.sort_cols,
            "lww_order": [[c, a] for c, a in snap.lww_order],
            "properties": snap.properties,
            "parent": snap.parent,
            "operation": snap.operation,
            "committed_at": snap.committed_at,
        }
        if snap.manifests is not None:
            body["manifests"] = snap.manifests  # split form: O(#manifests)
        else:
            body["files"] = snap.files  # legacy inline fallback
        # THE atomic publication (fileio.py publish_atomic): create-iff-
        # absent of the snapshot JSON — O_EXCL claim + fsync'd rename
        # locally, a single conditional PUT on an object store. A
        # concurrent writer racing to the same version loses here and
        # must retry on top of the new snapshot.
        try:
            self._io.publish_atomic(final, json.dumps(body))
        except FileExistsError as e:
            raise CommitConflict(
                f"version {snap.version} already committed at {self.path}"
            ) from e
        self._snap_cache[snap.version] = snap  # committed -> immutable

    # ----------------------------------------------------------------- read
    def read(
        self,
        buckets: list[int] | None = None,
        version: int | None = None,
        levels: tuple[str, ...] = ("base", "delta"),
        filters: list[tuple[str, str, Any]] | None = None,
    ) -> DataFrame:
        """Raw file-level read (no LWW reconciliation).

        Old files are projected through the CURRENT snapshot schema —
        columns added later read as null (additive evolution). Bucket
        pruning: only files of the requested buckets are listed, so Spark
        never opens the rest.

        ``filters`` — ``[(col, op, value), ...]`` with op in ``= < <= > >=
        in`` (``'in'`` takes a non-empty value list: the multi-point
        lookup — a file survives if ANY listed value fits its range /
        bloom) — adds manifest-bounds file skipping: files whose recorded column
        range cannot contain matches are never listed (driver-side, no
        I/O), and the residual row predicate is applied to the survivors,
        where parquet row-group pushdown finishes the job. Files without
        stats for a column are conservatively kept.
        """
        snap = self.snapshot(version)
        files = [
            f
            for f in snap.files
            if f["level"] in levels and (buckets is None or f["bucket"] in buckets)
        ]
        norm: list[tuple[str, str, Any]] = []
        if filters:
            by_name = {f.name: f.dataType for f in snap.schema.fields}
            for col, op, v in filters:
                if col not in by_name:
                    raise ValueError(f"filter column {col!r} not in table schema")
                if op not in _FILTER_OPS:
                    raise ValueError(f"unsupported filter op {op!r}")
                if op == "in":
                    if not isinstance(v, (list, tuple, set)) or not v:
                        raise ValueError(
                            f"'in' filter for {col!r} needs a non-empty list of values"
                        )
                    if any(x is None for x in v):
                        raise ValueError(
                            f"'in' filter for {col!r} must not contain None "
                            "(a null comparison matches no rows)"
                        )
                    norm.append(
                        (col, op, [_norm_bound(x, by_name[col]) for x in v])
                    )
                    continue
                if v is None:
                    raise ValueError(
                        f"filter value for {col!r} must not be None "
                        "(a null comparison matches no rows)"
                    )
                norm.append((col, op, _norm_bound(v, by_name[col])))
            files = [f for f in files if _entry_matches(f, norm)]
            files = self._bloom_filter_files(snap, files, filters)
        # scan-size instrumentation: tests assert pruned reads open fewer
        # files than the table holds (the file-count analogue of Iceberg's
        # scan-planning metrics)
        self.last_scan_files = len(files)
        if not files:
            return self.spark.createDataFrame([], snap.schema)
        paths = [os.path.join(self.path, f["path"]) for f in files]
        df = self.spark.read.schema(snap.schema).parquet(*paths)
        if filters:
            for col, op, v in filters:
                c = F.col(col)
                if op == "in":
                    df = df.where(c.isin(list(v)))
                else:
                    df = df.where(
                        {"=": c == v, "<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[op]
                    )
        return df

    def bucket_for(self, values: dict[str, Any]) -> int:
        """Bucket id of a fully specified bucket key — the driver-side
        entry to point-lookup pruning. Evaluated with the table's OWN
        Catalyst bucket expression over literals (constant-folded single-row
        job, ~0.1 s) so it can never disagree with the layout hash."""
        snap = self.snapshot()
        missing = [c for c in snap.bucket_cols if c not in values]
        if missing:
            raise ValueError(f"bucket_for needs all bucket cols; missing {missing}")
        by_name = {f.name: f.dataType for f in snap.schema.fields}
        row = self.spark.range(1).select(
            *[F.lit(values[c]).cast(by_name[c]).alias(c) for c in snap.bucket_cols]
        )
        return row.select(bucket_expr(snap.bucket_cols, snap.num_buckets).alias("b")).first()["b"]

    def as_view(self, name: str, drop_tombstones: bool = True) -> str:
        """Register the reconciled current state as a Spark SQL temp view —
        the engine's SQL surface (the reference exposes its landing/model
        tables to downstream SQL consumers as Postgres tables/views;
        couch2pg feeds dbt which feeds sql-exporter). The view is a LOGICAL
        plan over the snapshot current at call time: re-register after new
        commits to advance it (same re-resolution contract as a Postgres
        view over a swapped table). All scan pruning (bucket layout, file
        bounds, row-group pushdown) stays available to Catalyst underneath
        the view; the LWW window folds exactly as read_current."""
        self.read_current(drop_tombstones=drop_tombstones).createOrReplaceTempView(name)
        return name

    def read_current(
        self,
        version: int | None = None,
        drop_tombstones: bool = False,
        buckets: list[int] | None = None,
        filters: list[tuple[str, str, Any]] | None = None,
    ) -> DataFrame:
        """Reconciled current state: base ∪ deltas -> LWW winner per key.

        When no delta files exist this is a plain scan (no window). The
        dedup window is the SAME operator used batch-side, so
        base-merge-time and read-time reconciliation can never disagree.

        ``buckets`` prunes the scan BEFORE reconciliation: because bucketing
        is a pure function of ``bucket_cols`` ⊆ key, every row of a key
        lives in one bucket, so per-bucket LWW equals global LWW restricted
        to those buckets — pruning is semantics-preserving.

        ``filters`` (KEY columns only) adds file skipping + the row
        predicate BEFORE reconciliation — safe for the same reason bucket
        pruning is: every version of a key carries identical key-column
        values, so filtering can never split a key's history. Equality
        filters covering all ``bucket_cols`` additionally derive the bucket
        id, turning a point lookup into one-bucket + skipped-files scan.
        Non-key predicates must be applied AFTER read_current (a .where on
        the result), never here.
        """
        from cht_sync_spark.operators.lww import lww_dedup  # circular-safe

        snap = self.snapshot(version)
        if filters:
            bad = [c for c, _, _ in filters if c not in snap.key_cols]
            if bad:
                raise ValueError(
                    f"read_current filters must be on key columns {snap.key_cols}; "
                    f"got {bad} — apply non-key predicates to the result instead"
                )
            if buckets is None:
                eq = {c: v for c, op, v in filters if op == "="}
                if all(c in eq for c in snap.bucket_cols):
                    buckets = [self.bucket_for(eq)]
        df = self.read(version=version, buckets=buckets, filters=filters)
        has_delta = any(
            f["level"] == "delta" and (buckets is None or f["bucket"] in buckets)
            for f in snap.files
        )
        if has_delta:
            # per-table LWW spec from the manifest; tables without order
            # columns (e.g. append-only lineage) dedup to key-uniqueness only
            order = snap.lww_order or [(snap.key_cols[0], True)]
            df = lww_dedup(df, key=snap.key_cols, order=order)
        # Tables with property tombstones.retain=false (model tables, where
        # the reference's post-hook DELETEs tombstones — contacts.sql:6)
        # treat tombstones as purely internal shadow markers: a merge-on-read
        # delete delta shadows its base row in the fold above, then vanishes
        # from every reconciled read. Because compact() folds through THIS
        # method, compaction physically drops them too — the MOR equivalent
        # of the COW merge's tombstones='drop'.
        retain = snap.properties.get("tombstones.retain", "true") != "false"
        if (drop_tombstones or not retain) and "_deleted" in df.columns:
            df = df.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
        # internal.cols (JSON list): engine-plumbing columns — e.g. the MOR
        # model plane's _fold_rank commit-order tiebreak — participate in
        # the fold above but are hidden from every reconciled read
        # (Iceberg's hidden metadata-column pattern). Raw read() keeps them.
        internal = json.loads(snap.properties.get("internal.cols", "[]"))
        hide = [c for c in internal if c in df.columns]
        if hide:
            df = df.drop(*hide)
        return df

    def count_rows(self, *, live: bool = True, version: int | None = None) -> int:
        """Row count of the reconciled state, answered from MANIFEST
        metadata wherever that is provably exact — Iceberg's
        metadata-only ``count(*)`` — and by a bucket-pruned scan only for
        the residue:

        - a bucket holding only ``base`` files is one LWW fold's output
          (one row per key), so its count is the sum of recorded per-file
          row counts — zero I/O;
        - ``live=True`` (default) excludes tombstone rows; a base file
          whose footer PROVES it tombstone-free (``live_exact``) still
          counts from metadata, others fall to the scan;
        - buckets holding deltas (fold would collapse versions) or legacy
          entries without recorded counts fall to ONE ``read_current``
          scan over exactly those buckets.

        ``last_count_scanned_buckets`` records the residue (empty = the
        answer cost zero Spark jobs — on a compacted 10^10-row table this
        turns the most common operational query from a full scan into a
        driver-side sum)."""
        snap = self.snapshot(version)
        retain = snap.properties.get("tombstones.retain", "true") != "false"
        need_live_proof = live and retain and "_deleted" in snap.schema.fieldNames()
        per_bucket: dict[int, list[dict[str, Any]]] = {}
        for f in snap.files:
            if f["level"] in ("base", "delta"):
                per_bucket.setdefault(f["bucket"], []).append(f)
        total = 0
        scan: list[int] = []
        for b, files in per_bucket.items():
            exact = all(
                f["level"] == "base"
                and f.get("rows") is not None
                and (not need_live_proof or f.get("live_exact"))
                for f in files
            )
            if exact:
                total += sum(f["rows"] for f in files)
            else:
                scan.append(b)
        self.last_count_scanned_buckets = sorted(scan)
        if scan:
            total += (
                self.read_current(
                    version=version, buckets=sorted(scan), drop_tombstones=live
                ).count()
            )
        return total

    # ---------------------------------------------------------------- write
    def _write_data(
        self, df: DataFrame, snap: Snapshot, level: str,
        sort_exprs: list | None = None, max_rows_per_file: int | None = None,
    ) -> list[dict[str, Any]]:
        """Write df (must contain all snapshot schema cols) as per-bucket
        parquet under a fresh commit dir; returns manifest file entries.

        One shuffle by bucket id into EXACTLY num_buckets tasks (each bucket
        lands wholly in one task), so a commit produces ~one file per
        touched bucket — not tasks×buckets small files. Within each bucket
        the rows are sorted by ``sort_cols`` so parquet pages carry tight
        min/max stats for key lookups (the 'write-ordered by (conv_id,
        turn_idx)' from SURVEY §4). num_buckets is the write-parallelism
        knob: size it to O(cluster cores) at scale.

        ``sort_exprs`` overrides the within-bucket order (:meth:`cluster`'s
        z-value) and ``max_rows_per_file`` makes the writer split each
        bucket's sorted stream into bounded files — consecutive files then
        cover contiguous ranges of the sort expression, which is what gives
        clustered columns tight per-file bounds.
        """
        commit_id = uuid.uuid4().hex[:12]
        rel = os.path.join(_DATADIR, commit_id)
        out = os.path.join(self.path, rel)
        writer = (
            df.withColumn("__bucket", bucket_expr(snap.bucket_cols, snap.num_buckets))
            .repartition(snap.num_buckets, F.col("__bucket"))
            .sortWithinPartitions("__bucket", *(sort_exprs if sort_exprs is not None else snap.sort_cols))
            .write.partitionBy("__bucket")
            .mode("overwrite")
        )
        if max_rows_per_file:
            writer = writer.option("maxRecordsPerFile", max_rows_per_file)
        writer.parquet(out)
        entries: list[dict[str, Any]] = []
        for bdir in sorted(self._io.list_dir(out)):
            if not bdir.startswith("__bucket="):
                continue
            b = int(bdir.split("=", 1)[1])
            for fn in sorted(self._io.list_dir(os.path.join(out, bdir))):
                if fn.endswith(".parquet"):
                    entries.append(
                        {
                            "path": os.path.join(rel, bdir, fn),
                            "bucket": b,
                            "level": level,
                            "commit": commit_id,
                        }
                    )
        self._attach_stats(entries, snap)
        return entries

    def _stats_cols(self, snap: Snapshot) -> list[str]:
        """Columns whose per-file bounds are recorded in manifest entries.
        Table property ``stats.cols`` (JSON list; ``[]`` disables) overrides
        the default of ``sort_cols`` — the columns the write order already
        clusters, so their per-file ranges are tight and skippable."""
        raw = snap.properties.get("stats.cols")
        return list(json.loads(raw)) if raw is not None else list(snap.sort_cols)

    def _attach_stats(self, entries: list[dict[str, Any]], snap: Snapshot) -> None:
        """Record column bounds, row counts, and tombstone-freedom on
        freshly written manifest entries, read from parquet footers
        concurrently (O(files-in-commit) ms-scale driver work — the same
        place Iceberg's writer gathers its bounds)."""
        scols = self._stats_cols(snap)
        if not entries:
            return
        from concurrent.futures import ThreadPoolExecutor

        def one(e: dict[str, Any]):
            return _file_stats(os.path.join(self.path, e["path"]), scols, snap.schema)

        with ThreadPoolExecutor(max_workers=min(16, len(entries))) as ex:
            for e, (st, nrows, tomb_free) in zip(entries, ex.map(one, entries)):
                if st:
                    e["stats"] = st
                e["rows"] = nrows
                if tomb_free:
                    e["live_exact"] = True

    # ------------------------------------------------------------- blooms
    def _bloom_conf(self, snap: Snapshot) -> dict[str, Any] | None:
        """Pinned bloom config (cols/bits/k + current sidecar path), or
        None when the table has never built blooms."""
        raw = snap.properties.get("bloom.cols")
        if raw is None:
            return None
        return {
            "cols": list(json.loads(raw)),
            "bits": int(snap.properties.get("bloom.bits", "0")),
            "k": int(snap.properties.get("bloom.k", "0")),
            "sidecar": snap.properties.get("bloom.sidecar"),
        }

    def _bloom_words(self, sidecar_rel: str) -> dict[str, dict[str, Any]]:
        """Decoded ``{file path -> {col -> uint64 bitset}}`` for one
        immutable sidecar, cached. Missing sidecar (e.g. a clone whose
        source never copied one) degrades to no pruning."""
        cached = self._bloom_cache.get(sidecar_rel)
        if cached is not None:
            return cached
        from . import blooms as _bl

        try:
            body = json.loads(self._io.read_text(os.path.join(self.path, sidecar_rel)))
            # "" = computed-all-null sentinel: the file provably holds no
            # non-null values of the column, so an equality probe (which
            # never matches null) can SOUNDLY prune it — an all-zero
            # bitset expresses exactly that
            nbits = int(body["bits"])
            decoded = {
                path: {
                    c: _bl.b64_to_words(b64) if b64 else _bl.empty_words(nbits)
                    for c, b64 in cols.items()
                }
                for path, cols in body["files"].items()
            }
        except FileNotFoundError:
            decoded = {}
        self._bloom_cache[sidecar_rel] = decoded
        return decoded

    def _bloom_filter_files(
        self,
        snap: Snapshot,
        files: list[dict[str, Any]],
        filters: list[tuple[str, str, Any]],
    ) -> list[dict[str, Any]]:
        """Drop files whose bitset PROVABLY excludes an equality filter
        value. Conservative everywhere a bitset is missing (post-build
        appends, unrenderable probe values, absent sidecar)."""
        conf = self._bloom_conf(snap)
        if not conf or not conf["sidecar"] or not files:
            return files
        from . import blooms as _bl

        # each probe is (col, [position-arrays]): "=" carries one array,
        # "in" one per listed value — a file survives a probe if ANY of
        # its arrays might be contained
        probes: list[tuple[str, list]] = []
        for col, op, v in filters:
            if op not in ("=", "in") or col not in conf["cols"]:
                continue
            vals = list(v) if op == "in" else [v]
            try:
                pos = [
                    _bl.positions(_bl.render_value(x), conf["bits"], conf["k"])
                    for x in vals
                ]
            except TypeError:
                continue  # keep: prober can't render what the builder hashed
            probes.append((col, pos))
        if not probes:
            return files
        side = self._bloom_words(conf["sidecar"])
        kept = []
        for f in files:
            entry = side.get(f["path"])
            if entry is not None and any(
                col in entry
                and not any(_bl.might_contain(entry[col], p) for p in pos)
                for col, pos in probes
            ):
                continue
            kept.append(f)
        return kept

    def build_blooms(
        self,
        cols: list[str] | None = None,
        *,
        bits: int | None = None,
        k: int | None = None,
    ) -> int:
        """Compute per-file Bloom bitsets for ``cols`` over every live file
        missing one, and commit the refreshed sidecar as a metadata-only
        ``replace`` snapshot (changelog-invisible — no logical change).
        The lake analogue of the reference's secondary point-lookup
        indexes (setup.js:21-31, contacts.sql:7-11); see
        :mod:`cht_sync_spark.tables.blooms` for the design and sizing.

        Incremental by construction: a re-run with unchanged config hashes
        only files the current sidecar doesn't cover (new appends, post-
        compaction rewrites); a config change (cols/bits/k) rebuilds all.
        ONE zero-shuffle Spark job per call (Arrow ``mapInPandas`` partial
        bitsets, OR-merged driver-side — the collect is O(partitions ×
        cols) KB-sized rows, the same order as the manifest metadata
        itself). Returns the number of files (re)computed."""
        from . import blooms as _bl

        snap = self.snapshot()
        prev = self._bloom_conf(snap)
        if cols is None:
            if prev is None:
                raise ValueError("no bloom.cols pinned yet; pass cols= on the first build")
            cols = prev["cols"]
        by_name = {f.name: f.dataType.simpleString() for f in snap.schema.fields}
        for c in cols:
            if c not in by_name:
                raise ValueError(f"bloom column {c!r} not in table schema")
            if by_name[c] not in _bl.ALLOWED_TYPES:
                raise ValueError(
                    f"bloom column {c!r} has type {by_name[c]}; only "
                    f"{'/'.join(_bl.ALLOWED_TYPES)} have a canonical hashable "
                    "rendering (range stats serve the rest)"
                )
        bits = bits if bits is not None else (prev["bits"] if prev else _bl.DEFAULT_BITS)
        k = k if k is not None else (prev["k"] if prev else _bl.DEFAULT_K)
        if bits % 64 != 0 or bits <= 0:
            raise ValueError(f"bits must be a positive multiple of 64, got {bits}")
        if not (1 <= k <= 16):
            raise ValueError(f"k must be in [1, 16], got {k}")

        same_conf = (
            prev is not None
            and prev["sidecar"] is not None
            and prev["cols"] == cols
            and prev["bits"] == bits
            and prev["k"] == k
        )
        old_b64: dict[str, dict[str, str]] = {}
        if same_conf:
            try:
                old_b64 = json.loads(
                    self._io.read_text(os.path.join(self.path, prev["sidecar"]))
                )["files"]
            except FileNotFoundError:
                old_b64 = {}

        live = [f for f in snap.files if f["level"] in ("base", "delta")]
        targets = [
            f
            for f in live
            if any(c not in old_b64.get(f["path"], {}) for c in cols)
        ]
        computed: dict[str, dict[str, str]] = {}
        if targets:
            cset, bset, kset = list(cols), bits, k

            def gen(batches):
                import pandas as pd

                acc: dict[tuple[str, str], str] = {}
                for pdf in batches:
                    for fname, sub in pdf.groupby("__file", sort=False):
                        for c in cset:
                            b64 = _bl.series_bitset(sub[c], bset, kset)
                            if b64 is not None:
                                key = (fname, c)
                                acc[key] = _bl.merge_b64(acc.get(key), b64)
                yield pd.DataFrame(
                    [(f, c, b) for (f, c), b in acc.items()],
                    columns=["file", "col", "b64"],
                )

            paths = [os.path.join(self.path, f["path"]) for f in targets]
            # integer columns are cast to STRING before crossing into
            # pandas: a nullable int64 column would otherwise arrive as
            # float64 and lose exactness above 2^53 — the builder would
            # hash a different rendering than the prober and the bloom
            # would FALSELY PRUNE (the one failure a Bloom must never
            # have). Spark's long->string cast equals Python's str(int).
            src = (
                self.spark.read.schema(snap.schema)
                .parquet(*paths)
                .select(*[F.col(c).cast("string").alias(c) for c in cols])
                .withColumn("__file", F.input_file_name())
            )
            from urllib.parse import unquote as _unquote

            root = os.path.abspath(self.path)
            for fname, c, b64 in src.mapInPandas(
                gen, schema="file string, col string, b64 string"
            ).collect():
                # input_file_name yields a percent-encoded file: URI of
                # the absolute path — decode before mapping back to the
                # manifest-relative path (a space in the table path would
                # otherwise key every bitset wrongly and disable pruning)
                p = _unquote(fname)
                if p.startswith("file:"):
                    p = "/" + p[5:].lstrip("/")
                rel = os.path.normpath(os.path.relpath(p, root))
                d = computed.setdefault(rel, {})
                d[c] = _bl.merge_b64(d.get(c), b64)

        # fold: live files only (stale removed-file entries dropped here).
        # A TARGETED file the job produced no bitset for holds only nulls
        # in that column: record the empty-string sentinel ("computed,
        # nothing to hash" — the prober ignores it) so the next build's
        # missing-column check reaches the zero-recompute steady state
        # instead of rescanning all-null files forever.
        target_paths = {f["path"] for f in targets}
        out_files: dict[str, dict[str, str]] = {}
        for f in live:
            entry: dict[str, str] = {}
            for c in cols:
                b64 = computed.get(f["path"], {}).get(c)
                if b64 is None:
                    b64 = old_b64.get(f["path"], {}).get(c)
                if b64 is None and f["path"] in target_paths:
                    b64 = ""
                if b64 is not None:
                    entry[c] = b64
            if entry:
                out_files[f["path"]] = entry
        d = os.path.join(self.path, _MANDIR)
        self._io.mkdirs(d)
        rel = os.path.join(_MANDIR, f"bloom-{uuid.uuid4().hex}.json")
        self._io.write_text_atomic(
            os.path.join(self.path, rel),
            json.dumps({"bits": bits, "k": k, "cols": cols, "files": out_files}),
        )
        self.commit(
            add_files=[],
            properties_update={
                "bloom.cols": json.dumps(cols),
                "bloom.bits": str(bits),
                "bloom.k": str(k),
                "bloom.sidecar": rel,
            },
            operation="replace",
        )
        return len(targets)

    def commit(
        self,
        *,
        add_files: list[dict[str, Any]],
        remove_buckets: set[int] | None = None,
        remove_level: tuple[str, ...] = ("base", "delta"),
        properties_update: dict[str, str] | None = None,
        new_schema: T.StructType | None = None,
        expected_version: int | None = None,
        max_retries: int = 5,
        operation: str | None = None,
        new_bucket_cols: list[str] | None = None,
        new_num_buckets: int | None = None,
    ) -> Snapshot:
        """Produce snapshot N+1 = parent minus (removed buckets/levels) plus
        ``add_files``, with properties merged in — all atomically.

        Concurrency (S4, reference importer.js:132-138 deadlock retry):
        a PURE-APPEND commit (``remove_buckets is None`` and no
        ``expected_version`` pin) composes with any concurrent commit, so a
        lost manifest race is retried here automatically on top of the new
        parent. Commits that REMOVE files (merge/compact/overwrite) must pin
        ``expected_version`` — on conflict the caller re-reads and redoes
        the work (see :func:`cht_sync_spark.tables.merge.merge_upsert` and
        :meth:`compact`), because the removed set was computed against a
        snapshot that no longer is the tip.
        """
        # snapshot operation marker (Iceberg parity): pure file adds are
        # "append"; anything that removes files is a logical "overwrite"
        # unless the caller says otherwise (compact passes "replace")
        if operation is None:
            operation = "append" if remove_buckets is None else "overwrite"
        retriable = remove_buckets is None and expected_version is None
        attempts = max_retries if retriable else 1
        last_err: CommitConflict | None = None
        # the added files become ONE immutable manifest, written once and
        # reused verbatim across rebase retries (its content doesn't depend
        # on the parent) — the O(batch) metadata write of the append path
        add_ref = self._write_manifest_file(add_files) if add_files else None
        for _ in range(attempts):
            parent = self.snapshot()
            if expected_version is not None and parent.version != expected_version:
                raise CommitConflict(
                    f"expected v{expected_version}, found v{parent.version} at {self.path}"
                )
            keep_refs, keep = self._keep_manifests(parent, remove_buckets, remove_level)
            props = dict(parent.properties)
            for k, v in (properties_update or {}).items():
                if v is None:
                    props.pop(k, None)  # None deletes the key (tag removal)
                else:
                    props[k] = v
            snap = Snapshot(
                version=parent.version + 1,
                schema=new_schema or parent.schema,
                key_cols=parent.key_cols,
                bucket_cols=new_bucket_cols or parent.bucket_cols,
                num_buckets=new_num_buckets or parent.num_buckets,
                sort_cols=parent.sort_cols,
                lww_order=parent.lww_order,
                files=keep + add_files,
                properties=props,
                parent=parent.version,
                manifests=keep_refs + ([add_ref] if add_ref is not None else []),
                operation=operation,
            )
            try:
                self._write_manifest(snap)
                return snap
            except CommitConflict as e:
                last_err = e  # another writer took this version: rebase
                # jittered pause: the lost claim's winner may still be
                # fsyncing (its manifest is a zero-size in-flight claim we
                # deliberately don't read) — spinning dry burns the retries
                import random
                import time as _time

                _time.sleep(0.02 + random.random() * 0.08)
        raise last_err  # type: ignore[misc]

    def _keep_manifests(
        self,
        parent: Snapshot,
        remove_buckets: set[int] | None,
        remove_level: tuple[str, ...],
    ) -> tuple[list[str], list[dict[str, Any]]]:
        """Surviving (manifest refs, folded entries) of ``parent`` after the
        removal mask. Append commits keep every parent manifest BY REFERENCE
        (zero metadata rewrite); removal commits rewrite only the manifests
        they intersect, drop the ones they empty, and keep the rest by
        reference. A legacy inline-file parent is adopted as one manifest."""
        parent_refs = parent.manifests
        if parent_refs is None:  # legacy snapshot: adopt inline list
            parent_refs = [self._write_manifest_file(parent.files)] if parent.files else []
            # memoize on the CACHED parent (folded files are identical):
            # commit retries and concurrent attempts on the same legacy tip
            # would otherwise each write a fresh O(live files) adoption copy
            parent.manifests = parent_refs
        if remove_buckets is None:
            return list(parent_refs), list(parent.files)
        keep_refs: list[str] = []
        keep: list[dict[str, Any]] = []
        for ref in parent_refs:
            entries = self._load_manifest(ref)
            kept = [
                f
                for f in entries
                if not (f["bucket"] in remove_buckets and f["level"] in remove_level)
            ]
            if not kept:
                continue  # fully removed: drop the reference
            if len(kept) == len(entries):
                keep_refs.append(ref)  # untouched: reuse immutably
            else:
                keep_refs.append(self._write_manifest_file(kept))
            keep.extend(kept)
        return keep_refs, keep

    def append_delta(
        self,
        df: DataFrame,
        properties_update: dict[str, str] | None = None,
        new_schema: T.StructType | None = None,
        properties_fn=None,
        expected_version: int | None = None,
    ) -> Snapshot:
        """Merge-on-read fast path: commit the (already LWW-deduped) batch as
        appended delta files. O(batch) — no target read, no rewrite.

        ``properties_fn`` is called AFTER the data write and BEFORE the
        manifest commit — the hook for checkpoint stats gathered as
        Observation metrics during the write job, committed atomically with
        the data they describe."""
        snap = self.snapshot()
        schema = new_schema or snap.schema
        df = _conform(df, schema)
        snap = Snapshot(**{**snap.__dict__, "schema": schema})
        files = self._write_data(df, snap, level="delta")
        props = dict(properties_update or {})
        if properties_fn is not None:
            props.update(properties_fn())
        return self.commit(
            add_files=files,
            remove_buckets=None,
            properties_update=props,
            new_schema=schema,
            # None (default): pure append, auto-rebases over concurrent
            # commits. Set when the batch content depends on the version it
            # read (e.g. the MOR model plane's _fold_rank stamp) — the
            # caller re-stamps and retries on CommitConflict.
            expected_version=expected_version,
        )

    def append_rows_local(
        self,
        rows: list[tuple],
        properties_update: dict[str, str] | None = None,
    ) -> Snapshot:
        """Driver-side micro-append for TINY bookkeeping tables (lineage:
        a handful of rows per batch). A Spark write job for 2-4 rows costs a
        full plan+schedule round-trip (~0.3-0.5 s measured) — at 10^10
        events / 20k batches that is hours of serialized driver time for
        metadata. This path converts the rows with pyarrow in-process, fsyncs
        one parquet file, and commits it through the SAME manifest protocol
        (single bucket 0, append-only -> auto-rebased on conflict). Readers
        see an ordinary delta file; Spark never knows the difference.

        Only valid for tables with ``num_buckets == 1`` — bookkeeping tables
        — so bucket pruning semantics are trivially preserved.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        snap = self.snapshot()
        if snap.num_buckets != 1:
            raise ValueError(
                f"append_rows_local requires num_buckets=1 (got {snap.num_buckets})"
            )
        if not rows:
            return snap
        arrow_schema = to_arrow_schema(snap.schema)
        cols = [list(c) for c in zip(*rows)]
        table = pa.Table.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)],
            schema=arrow_schema,
        )
        commit_id = uuid.uuid4().hex[:12]
        rel_dir = os.path.join(_DATADIR, commit_id)
        self._io.mkdirs(os.path.join(self.path, rel_dir))
        rel = os.path.join(rel_dir, "part-00000.parquet")
        pq.write_table(table, os.path.join(self.path, rel))
        entry = {"path": rel, "bucket": 0, "level": "delta", "commit": commit_id}
        self._attach_stats([entry], snap)
        return self.commit(add_files=[entry], properties_update=properties_update or {})

    def compact(
        self, max_retries: int = 5, buckets: list[int] | None = None
    ) -> Snapshot:
        """Fold deltas into a fresh base (LWW winners, tombstones kept).

        ``buckets=None`` compacts INCREMENTALLY: only the buckets that
        actually hold delta files are refolded — per-bucket LWW equals
        global LWW restricted to the bucket (same argument as read
        pruning), so the result is identical to a full rewrite while the
        work is O(buckets touched since the last compaction), not
        O(table). At 10^10 rows with localized update patterns this is
        the difference between a maintenance cadence that stays cheap and
        one that rewrites the world every k batches (Iceberg's
        rewrite_data_files with a delete-file filter, not its full
        rewrite). Pass an explicit bucket list to scope it further, or
        ``buckets=range(num_buckets)`` to force a full rewrite.

        Pinned to the snapshot it read (``expected_version``): a delta
        appended concurrently between the fold-read and the commit would
        otherwise be REMOVED without having been folded — silent data loss.
        On conflict the fold is redone from the new tip (S4 retry)."""
        last_err: CommitConflict | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            if buckets is None:
                refold = sorted({f["bucket"] for f in snap.files if f["level"] == "delta"})
                # buckets holding ONLY change-feed entries (pure-COW tables
                # accrete cdc with no deltas) need a METADATA-ONLY commit to
                # retire those entries from the live fold — rewriting their
                # identical base files just to drop manifest rows would
                # double every merge's write I/O over a maintenance cycle
                cdc_only = sorted(
                    {f["bucket"] for f in snap.files if f["level"] == "cdc"}
                    - set(refold)
                )
            else:
                refold, cdc_only = sorted(set(buckets)), []
            if not refold and not cdc_only:
                return snap  # nothing to fold
            try:
                out = snap
                if refold:
                    cur = self.read_current(buckets=refold)
                    files = self._write_data(cur, snap, level="base")
                    out = self.commit(
                        add_files=files,
                        remove_buckets=set(refold),
                        # 'cdc' entries of refolded buckets leave the LIVE
                        # fold too; their files remain on disk (and
                        # changes()-readable) for the snapshot-retention
                        # window, since vacuum keeps anything a retained
                        # historical snapshot references
                        remove_level=("base", "delta", "cdc"),
                        expected_version=snap.version,
                        operation="replace",  # physical-only: changelog skips
                    )
                if cdc_only:
                    out = self.commit(
                        add_files=[],
                        remove_buckets=set(cdc_only),
                        remove_level=("cdc",),
                        expected_version=out.version,
                        operation="replace",
                    )
                return out
            except CommitConflict as e:
                last_err = e  # concurrent append landed: refold from tip
        raise last_err  # type: ignore[misc]

    def compact_deltas(self, min_files: int = 2, max_retries: int = 5) -> Snapshot:
        """Minor compaction: bin-pack each bucket's DELTA files into one
        fresh sorted delta file WITHOUT touching the base — the LSM
        minor-compaction / Iceberg small-file rewrite that sits between
        full :meth:`compact` passes.

        :meth:`compact` refolds whole buckets (base ∪ deltas → winners):
        O(bucket) per touched bucket, re-reading the base on every
        maintenance tick. At a high micro-batch cadence the pressure that
        actually accumulates between folds is the pile of SMALL per-epoch
        delta files (manifest entries, file-open cost, loose parquet
        pages); this rewrite reads ONLY the delta files of buckets holding
        >= ``min_files`` of them and writes them back as one sorted delta
        file per bucket — O(delta bytes), base files untouched and carried
        by reference. At the 10^10-event design point the cadence becomes:
        minor-pack every k batches, full refold every K >> k.

        Correctness: the read-time LWW fold orders by ``lww_order``
        COLUMNS only — never file identity, commit order, or level — so
        re-packing delta rows into different files is state-invisible
        (the same invariant that lets :meth:`compact` fold per bucket),
        and rows that tie on the full order are value-identical by the
        engine's delivery contract. ``cdc``-level change files are never
        touched (they are the retention-windowed change records). Commits
        as ``operation='replace'`` (physical-only: changelog-invisible,
        like compact), pinned to the snapshot it read (S4 retry).
        """
        if min_files < 1:
            raise ValueError(f"min_files must be >= 1, got {min_files}")
        last_err: CommitConflict | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            per: dict[int, int] = {}
            for f in snap.files:
                if f["level"] == "delta":
                    per[f["bucket"]] = per.get(f["bucket"], 0) + 1
            cands = sorted(b for b, n in per.items() if n >= min_files)
            if not cands:
                return snap  # nothing to pack
            df = self.read(buckets=cands, version=snap.version, levels=("delta",))
            files = self._write_data(df, snap, level="delta")
            try:
                return self.commit(
                    add_files=files,
                    remove_buckets=set(cands),
                    remove_level=("delta",),
                    expected_version=snap.version,
                    operation="replace",
                )
            except CommitConflict as e:
                last_err = e  # concurrent commit landed: re-pack from tip
        raise last_err  # type: ignore[misc]

    def overwrite(self, df: DataFrame, properties_update: dict[str, str] | None = None) -> Snapshot:
        """Full rewrite (the T12 'state-diff full refresh' analogue).
        Pinned like :meth:`compact` — a concurrent append must not be
        silently swallowed by the bucket removal."""
        snap = self.snapshot()
        df = _conform(df, snap.schema)
        files = self._write_data(df, snap, level="base")
        return self.commit(
            add_files=files,
            remove_buckets=set(range(snap.num_buckets)),
            properties_update=properties_update,
            expected_version=snap.version,
        )

    def rebucket(
        self,
        num_buckets: int,
        *,
        bucket_cols: list[str] | None = None,
        max_retries: int = 5,
    ) -> Snapshot:
        """Bucket-layout evolution — the Iceberg partition-spec-evolution
        analogue, done eagerly as ONE atomic rewrite.

        ``num_buckets`` is the table's write-parallelism and prune-granularity
        knob, sized for the data volume at create time; at 10^10 rows the
        creation-time choice goes stale (too few buckets -> giant files and
        hot write tasks; too many -> a small-files problem). Iceberg evolves
        the partition SPEC lazily — new data in the new layout, old files
        keeping the old one — but with a hash-bucket layout the lazy form
        would break the engine's core invariant (every version of a key
        lives in exactly one bucket: the basis of merge pruning, group
        pruning, and point lookups), so this engine rewrites: fold the
        current LWW state (tombstone shadows kept, exactly like
        :meth:`compact`) and land it in the new layout in one replace-class
        commit. ``bucket_cols`` may simultaneously be narrowed/changed to
        another subset of ``key_cols`` (e.g. from the full key to the
        ``conv_id`` group prefix so group-scoped readers can prune).

        Semantics:
        - content-preserving => ``operation='replace'``: changelog readers
          skip it exactly like compaction, strict consumers cross it freely;
        - layout is snapshot-scoped: time travel, tags, and branches forked
          before the rebucket keep their own layout (and a diverged main is
          correctly refused by ``fast_forward``'s content compare);
        - pinned to the snapshot it read (``expected_version``): a
          concurrent append raises :class:`CommitConflict` here and the fold
          is redone from the new tip — same no-data-loss argument as
          :meth:`compact`.

        Cost is O(live table) — one full fold + write, the same as a forced
        full compaction; run it as a maintenance action, not per batch.
        """
        if num_buckets < 1:
            raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
        last_err: CommitConflict | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            new_cols = list(bucket_cols or snap.bucket_cols)
            bad = [c for c in new_cols if c not in snap.key_cols]
            if bad:
                raise ValueError(
                    f"bucket_cols must be key columns {snap.key_cols}; got {bad} "
                    "(bucketing by non-key columns would split a key's history)"
                )
            if num_buckets == snap.num_buckets and new_cols == snap.bucket_cols:
                return snap  # no-op: already in the requested layout
            cur = self.read_current()
            layout = Snapshot(
                **{**snap.__dict__, "bucket_cols": new_cols, "num_buckets": num_buckets}
            )
            files = self._write_data(cur, layout, level="base")
            try:
                return self.commit(
                    add_files=files,
                    # defensive union: live entries are always < the current
                    # layout's bucket count, but removing by observed ids too
                    # costs nothing and can never strand a file
                    remove_buckets={f["bucket"] for f in snap.files}
                    | set(range(snap.num_buckets)),
                    remove_level=("base", "delta", "cdc"),
                    expected_version=snap.version,
                    operation="replace",
                    new_bucket_cols=new_cols,
                    new_num_buckets=num_buckets,
                )
            except CommitConflict as e:
                last_err = e  # concurrent commit landed: refold from tip
        raise last_err  # type: ignore[misc]

    def cluster(
        self,
        cols: list[str],
        *,
        bits: int = 16,
        max_rows_per_file: int = 500_000,
        max_retries: int = 5,
    ) -> Snapshot:
        """Z-order clustering — Delta's ``OPTIMIZE ZORDER BY`` / an Iceberg
        sort-order rewrite, as a replace-class maintenance rewrite.

        The write path orders each bucket by ``sort_cols`` (point-lookup
        locality on the key), so per-file bounds are tight only on that
        prefix: a predicate on any OTHER column — a time-range scan over a
        conv_id-sorted transcript table — matches every file's bounds and
        skips nothing. This rewrites the folded state ordered by the Morton
        (Z) interleaving of the requested columns' normalized ranks, split
        into bounded files, so every clustered column's per-file range is
        tight SIMULTANEOUSLY: one rewrite buys file-level skipping on d
        dimensions at once (a 1-dim slice matches ~n^((d-1)/d) of n files
        instead of all of them).

        Mechanics — one Spark job, one shuffle (the same per-bucket
        exchange every write pays):

        - per column, a rank in [0, 2^bits) min-max scaled from the GLOBAL
          column bounds; the bounds come free from the manifest file stats
          when every live file carries them (driver-side, no job), else one
          aggregation over the fold;
        - z = bit-interleave of the ranks — a pure-Catalyst shift/or
          expression tree, whole-stage-codegen'd;
        - rows sort (bucket, z) inside the bucket exchange and the writer
          splits every ``max_rows_per_file`` rows, so consecutive files
          cover contiguous z-ranges and footer stats give tight per-file
          bounds on every clustered column;
        - the commit adds ``cols`` to ``stats.cols`` so the bounds are
          recorded and ``read(filters=...)`` skips at planning time.

        Numeric and timestamp columns only (timestamps normalize to epoch
        micros — the same compare domain the manifest stats use); string
        columns are rejected: a hash rank would destroy the value locality
        z-ordering exists to create. Content-preserving exactly like
        :meth:`compact`: tombstone shadows kept, ``operation='replace'``
        (changelog-invisible), pinned against concurrent commits.
        """
        if not cols:
            raise ValueError("cluster needs at least one column")
        if len(set(cols)) != len(cols):
            raise ValueError(f"duplicate cluster columns: {cols}")
        if bits * len(cols) > 60:
            raise ValueError(
                f"bits*len(cols) must fit a long: {bits}*{len(cols)} > 60"
            )
        last_err: CommitConflict | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            by_name = {f.name: f.dataType for f in snap.schema.fields}
            exprs: dict[str, Any] = {}
            for c in cols:
                if c not in by_name:
                    raise ValueError(f"cluster column {c!r} not in table schema")
                t = by_name[c]
                if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
                    # NTZ casts through the session tz (UTC here) — the same
                    # naive-as-UTC convention the manifest stats use
                    exprs[c] = F.unix_micros(F.col(c).cast("timestamp"))
                elif isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                                    T.FloatType, T.DoubleType)):
                    exprs[c] = F.col(c).cast("double")
                else:
                    raise ValueError(
                        f"cluster column {c!r} has type {t.simpleString()}; only "
                        "numeric/timestamp columns keep value locality under a "
                        "min-max rank — z-order something orderable"
                    )
            if not snap.files:
                return snap  # empty table: nothing to rewrite
            bounds = self._manifest_bounds(snap, cols)
            cur = self.read_current()
            persisted = False
            if bounds is None:
                # some live file lacks recorded bounds: one agg pass over
                # the fold (persist so the write below reuses it)
                from pyspark.storagelevel import StorageLevel

                cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
                persisted = True
                row = cur.agg(
                    *[F.min(exprs[c]).alias(f"lo_{i}") for i, c in enumerate(cols)],
                    *[F.max(exprs[c]).alias(f"hi_{i}") for i, c in enumerate(cols)],
                ).first()
                bounds = {
                    c: (row[f"lo_{i}"], row[f"hi_{i}"]) for i, c in enumerate(cols)
                }
            d = len(cols)
            ranks = []
            top = (1 << bits) - 1
            for c in cols:
                lo, hi = bounds[c]
                if lo is None or hi is None or float(hi) <= float(lo):
                    ranks.append(F.lit(0).cast("long"))  # constant/all-null col
                    continue
                scaled = (
                    (exprs[c] - F.lit(float(lo))) * F.lit(float(top))
                    / F.lit(float(hi) - float(lo))
                )
                ranks.append(
                    F.coalesce(  # nulls rank lowest (they cluster together)
                        F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(top)),
                        F.lit(0),
                    )
                )
            z = F.lit(0).cast("long")
            for b in range(bits):
                for j, r in enumerate(ranks):
                    bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
                    z = z.bitwiseOR(F.shiftleft(bit, b * d + j))
            scols = sorted(set(self._stats_cols(snap)) | set(cols))
            layout = Snapshot(
                **{
                    **snap.__dict__,
                    "properties": {**snap.properties, "stats.cols": json.dumps(scols)},
                }
            )
            try:
                files = self._write_data(
                    cur, layout, level="base",
                    sort_exprs=[z], max_rows_per_file=max_rows_per_file,
                )
                return self.commit(
                    add_files=files,
                    remove_buckets={f["bucket"] for f in snap.files}
                    | set(range(snap.num_buckets)),
                    remove_level=("base", "delta", "cdc"),
                    properties_update={"stats.cols": json.dumps(scols)},
                    expected_version=snap.version,
                    operation="replace",
                )
            except CommitConflict as e:
                last_err = e  # concurrent commit landed: refold from tip
            finally:
                if persisted:
                    cur.unpersist()
        raise last_err  # type: ignore[misc]

    def _manifest_bounds(
        self, snap: Snapshot, cols: list[str]
    ) -> dict[str, tuple[Any, Any]] | None:
        """Global (lo, hi) per column folded from the manifest file stats —
        driver-side, no Spark job. None when ANY live file lacks a usable
        bound for any column (the caller falls back to one agg pass)."""
        out: dict[str, tuple[Any, Any]] = {}
        for c in cols:
            lo: Any = None
            hi: Any = None
            for f in snap.files:
                st = (f.get("stats") or {}).get(c)
                if st is None or st.get("lo") is None or st.get("hi") is None:
                    return None
                lo = st["lo"] if lo is None or st["lo"] < lo else lo
                hi = st["hi"] if hi is None or st["hi"] > hi else hi
            if lo is None:
                return None
            out[c] = (lo, hi)
        return out

    def drop(self) -> None:
        self._io.remove_tree(self.path)
        self._snap_cache.clear()
        self._manifest_cache.clear()

    # ----------------------------------------------------- incremental read
    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        strict: bool = True,
    ) -> DataFrame:
        """Incremental changelog scan: the rows committed AFTER
        ``from_version`` up to and including ``to_version`` (default: the
        current tip) — Iceberg's incremental append scan, the read-side
        half of CDC (a downstream consumer tails THIS table the way the
        pipeline tails the changes feed).

        Scan cost is O(changed data): only the manifest files ADDED by each
        snapshot in the range are opened, never the table's live file set —
        the property that makes a downstream incremental consumer viable at
        10^10 rows. The diff is a driver-side set difference over immutable
        manifest names (split-manifest architecture), no Spark job.

        Semantics per snapshot operation:
        - ``append`` — added files ARE the change set: emitted with
          ``_change_version`` and ``_change_type`` ('delete' for tombstone
          rows, else 'upsert'; consumers apply the table's own LWW to fold,
          exactly like ``read_current``).
        - ``replace`` (compaction) — no logical change; SKIPPED.
        - ``overwrite``/``unknown``/``rollback`` — a logical rewrite's added files
          restate whole buckets, not just changes. ``strict=True`` (default)
          raises — same contract as Iceberg, whose incremental read
          supports append snapshots only (enable ``cdc.enabled`` on the
          producer for exact change files instead). ``strict=False`` emits
          the added files as upserts: an OVER-delivery (unchanged rows
          reappear) that is safe for idempotent/LWW consumers PROVIDED the
          rewrite only restates/upserts rows. A rewrite that REMOVES keys
          (``overwrite()`` full refresh dropping rows, a
          ``tombstones='drop'`` COW merge physically deleting) is
          UNDER-delivered — the removal is invisible to any changelog
          reader without change files, and a non-strict consumer's target
          will retain the removed keys. Keep deletes as tombstone rows (the
          landing-table convention) or enable ``cdc.enabled``.
        - ``purge`` (right-to-be-forgotten) / ``retention``
          (:meth:`expire_rows` TTL) — with ``cdc.enabled`` the
          commit carries content-free delete MARKER files (cdc level) and
          reads exactly like an append of deletes; without them ``strict``
          raises (the removal is inexpressible) and non-strict
          over-delivers restated rows while silently retaining the purged
          keys downstream — re-seed or cascade the purge explicitly.
        - ``clone`` (a clone table's v1) — holds the FULL cloned state,
          not a delta; ``strict`` refuses a range that crosses it (a fresh
          consumer must ``reseed()``-bootstrap, then tail), ``strict=False``
          delivers it as upserts (exact for LWW consumers — a clone
          restates every live row and tombstone; carried-over cdc files
          from the source's history are dropped, they record another
          chain's commits).

        Snapshots expired by ``expire_snapshots`` cannot be read
        incrementally (their manifests may be vacuumed); reading version
        range (from, to] also opens ``from``'s own snapshot as the diff
        parent, so a consumer at cursor c needs ``keep_last >= tip - c + 1``
        — equivalently, safe lag is ``keep_last - 1`` snapshots, as with
        Iceberg."""
        to_version = to_version if to_version is not None else self.current_version()
        if to_version < from_version:
            raise ValueError(f"to_version {to_version} < from_version {from_version}")
        final = self.snapshot(to_version)
        meta = [
            ("_change_version", T.IntegerType()),
            ("_change_type", T.StringType()),
        ]
        out_schema = T.StructType(
            list(final.schema.fields)
            + [T.StructField(n, t, False) for n, t in meta]
        )
        parts: list[DataFrame] = []
        n_files = 0
        for v in range(from_version + 1, to_version + 1):
            snap = self.snapshot(v)
            if snap.operation in ("replace", "create"):
                continue  # no logical change
            if snap.operation not in (
                "append", "overwrite", "unknown", "rollback", "purge", "retention",
                "clone",
            ):
                raise ValueError(f"unknown snapshot operation {snap.operation!r} at v{v}")
            parent = self.snapshot(v - 1) if snap.parent is not None else None
            prev = {f["path"] for f in (parent.files if parent else [])}
            if snap.manifests is not None and parent is not None and parent.manifests is not None:
                # manifest-NAME diff bounds the I/O to O(changed manifests);
                # the path-level subtraction against the parent's in-memory
                # fold then drops survivor entries that a removal commit
                # carried into a REWRITTEN manifest (same rows, new manifest
                # name) — without it a COW merge's untouched-row survivors
                # would re-deliver as changes
                prev_refs = set(parent.manifests)
                added_refs = [m for m in snap.manifests if m not in prev_refs]
                entries = [
                    e
                    for ref in added_refs
                    for e in self._load_manifest(ref)
                    if e["path"] not in prev
                ]
            else:  # legacy inline file lists: diff by path
                entries = [f for f in snap.files if f["path"] not in prev]
            cdc = [e for e in entries if e.get("level") == "cdc"]
            if snap.operation in ("rollback", "clone"):
                # a rollback RESTORES an old snapshot's file set (and a
                # clone's v1 HOLDS the full cloned state); any cdc-level
                # files in the set (resurrected by the restore, or carried
                # over by the clone) are the change records of a PAST
                # commit on another chain, not this one — never deliver
                # them as a precise feed, and drop them from the
                # non-strict delivery set
                entries = [e for e in entries if e.get("level") != "cdc"]
                if strict and snap.operation == "clone":
                    # the consumer convention starts tailing after v1 (the
                    # empty CREATE snapshot of a normal table); a clone's
                    # v1 is DATA-BEARING, so a fresh consumer that clamped
                    # its cursor to 1 would silently miss the entire cloned
                    # corpus — refuse loudly instead and point at the two
                    # sound bootstraps
                    raise ValueError(
                        f"v{v} is a clone's initial snapshot — it holds the full "
                        "cloned state, not a delta; bootstrap the consumer from "
                        "current state (reseed()) and tail from there, or pass "
                        "strict=False to receive the cloned state as upserts "
                        "(exact for LWW consumers: a clone restates every live "
                        "row and tombstone)"
                    )
                if strict:
                    raise ValueError(
                        f"v{v} is a logical rewrite (rollback) — a restore is not "
                        "expressible as row-level deltas; re-seed the consumer from "
                        "the restored state, or pass strict=False to accept "
                        "over-delivery of restated rows (safe for LWW consumers "
                        "only if their fold tolerates resurrected older versions)"
                    )
            elif cdc:
                # change-data-feed files (COW merge with cdc.enabled): the
                # EXACT change records of this commit — use them and ignore
                # the restated bucket files, making an overwrite snapshot
                # as precisely readable as an append
                entries = cdc
            elif snap.operation in ("purge", "retention") and strict:
                raise ValueError(
                    f"v{v} is a {snap.operation} with no change-data marker files; the removal "
                    "cannot be delivered as row-level deltas (and non-strict "
                    "over-delivery would silently RETAIN the purged keys downstream) "
                    "— enable 'cdc.enabled' on the producer so purge() writes "
                    "content-free delete markers, or re-seed the consumer"
                )
            elif snap.operation in ("overwrite", "unknown") and strict:
                raise ValueError(
                    f"v{v} is a logical rewrite ({snap.operation}) with no change-data "
                    "files; incremental read supports append and cdc.enabled snapshots "
                    "only — enable the 'cdc.enabled' table property on the producer, or "
                    "pass strict=False to accept over-delivery of restated rows (safe "
                    "for LWW consumers)"
                )
            if not entries:
                continue
            n_files += len(entries)
            paths = [os.path.join(self.path, e["path"]) for e in entries]
            df = self.spark.read.schema(final.schema).parquet(*paths)
            ctype = (
                F.when(F.coalesce(F.col("_deleted"), F.lit(False)), F.lit("delete"))
                .otherwise(F.lit("upsert"))
                if "_deleted" in final.schema.fieldNames()
                else F.lit("upsert")
            )
            parts.append(
                df.withColumn("_change_version", F.lit(v))
                .withColumn("_change_type", ctype)
            )
        self.last_scan_files = n_files
        if not parts:
            return self.spark.createDataFrame([], out_schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ----------------------------------------------------------------- diff
    def as_of(self, ts: Any) -> int:
        """Resolve ``AS OF <timestamp>`` time travel (Iceberg's
        timestamp-based snapshot lookup): the newest retained snapshot
        committed at or before ``ts`` (epoch seconds or ``datetime``).
        Use the result as the ``version=`` argument of :meth:`read` /
        :meth:`read_current`. Raises if every retained snapshot is newer
        (the moment predates the table or its retained history —
        :meth:`expire_snapshots` bounds how far back this can resolve,
        exactly as in Iceberg)."""
        from datetime import datetime as _dt

        if isinstance(ts, _dt):
            ts = ts.timestamp()
        best: int | None = None
        for v in self._versions():
            s = self.snapshot(v)
            if s.committed_at is not None and s.committed_at <= float(ts):
                best = v  # _versions() ascends: last match wins
        if best is None:
            raise ValueError(
                f"no snapshot at or before ts={ts} — history may have been expired"
            )
        return best

    def diff(
        self,
        ref_a: int | str,
        ref_b: int | str | None = None,
        *,
        other: "SnapshotTable | None" = None,
        compare_cols: list[str] | None = None,
    ) -> DataFrame:
        """Keyed diff of two reconciled states — the audit surface for
        write-audit-publish (what did this branch change vs main?), debugging
        (what moved between yesterday's tag and now?), and replay validation
        (engine state vs an independently rebuilt table).

        ``ref_a``/``ref_b`` are versions or tag names; ``ref_b`` defaults to
        the current tip. ``other`` diffs against a DIFFERENT handle — a
        branch of the same table, or an entirely separate table sharing the
        key columns. ``compare_cols`` restricts which non-key columns define
        "changed" (default: the non-key columns both sides share).

        Returns one row per differing key: the key columns, ``diff_type``
        (``'added'``/``'removed'``/``'changed'``, from a's perspective →
        b has it / lost it / changed it), and ``before``/``after`` structs
        of the compared columns (null struct on the absent side).

        Scale: when both refs share the table's path and hash layout, the
        candidate buckets are pruned DRIVER-SIDE to those whose file sets
        differ between the snapshots (identical files ⇒ identical content —
        zero Spark work for untouched buckets; ``last_diff_buckets`` records
        the pruned set). The residual is two pruned reconciled reads and one
        keyed full-outer join — O(changed buckets), not O(table)."""
        other_t = other if other is not None else self
        va = self.resolve_ref(ref_a) if isinstance(ref_a, str) else int(ref_a)
        if ref_b is None:
            vb = other_t.current_version()
        else:
            vb = other_t.resolve_ref(ref_b) if isinstance(ref_b, str) else int(ref_b)
        sa, sb = self.snapshot(va), other_t.snapshot(vb)
        if sa.key_cols != sb.key_cols:
            raise ValueError(
                f"diff requires matching key columns; got {sa.key_cols} vs {sb.key_cols}"
            )
        keys = list(sa.key_cols)
        a_names = set(sa.schema.fieldNames())
        b_names = set(sb.schema.fieldNames())
        # internal.cols (e.g. the MOR model plane's _fold_rank) are hidden
        # from every reconciled read, so they can neither be compared nor
        # selected from read_current's output
        hidden = set(json.loads(sa.properties.get("internal.cols", "[]"))) | set(
            json.loads(sb.properties.get("internal.cols", "[]"))
        )
        cmp = compare_cols or sorted((a_names & b_names) - set(keys) - hidden)
        bad = [
            c for c in cmp if c not in a_names or c not in b_names or c in hidden
        ]
        if bad:
            raise ValueError(
                f"compare_cols {bad} missing from one side's schema or hidden "
                "(internal.cols)"
            )

        buckets: list[int] | None = None
        if (
            other_t.path == self.path
            and sa.num_buckets == sb.num_buckets
            and sa.bucket_cols == sb.bucket_cols
        ):
            def per_bucket(snap: Snapshot) -> dict[int, frozenset]:
                out: dict[int, set] = {}
                for f in snap.files:
                    if f["level"] in ("base", "delta"):
                        out.setdefault(f["bucket"], set()).add(f["path"])
                return {b: frozenset(s) for b, s in out.items()}

            pa, pb = per_bucket(sa), per_bucket(sb)
            buckets = sorted(
                b for b in (pa.keys() | pb.keys()) if pa.get(b) != pb.get(b)
            )
        self.last_diff_buckets = buckets

        def side(t: "SnapshotTable", v: int, alias: str) -> DataFrame:
            df = t.read_current(version=v, buckets=buckets)
            return df.select(
                *keys, F.struct(*[F.col(c) for c in cmp]).alias(alias)
            )

        if buckets == []:  # identical file sets everywhere: provably equal
            fields = [sa.schema[k] for k in keys]
            mk = lambda s: T.StructType([s.schema[c] for c in cmp])  # noqa: E731
            empty = T.StructType(
                fields
                + [
                    T.StructField("diff_type", T.StringType(), False),
                    T.StructField("before", mk(sa), True),
                    T.StructField("after", mk(sb), True),
                ]
            )
            return self.spark.createDataFrame([], empty)
        j = side(self, va, "before").join(side(other_t, vb, "after"), on=keys, how="full_outer")
        return (
            j.where(~F.col("before").eqNullSafe(F.col("after")))
            .select(
                *keys,
                F.when(F.col("before").isNull(), F.lit("added"))
                .when(F.col("after").isNull(), F.lit("removed"))
                .otherwise(F.lit("changed"))
                .alias("diff_type"),
                "before",
                "after",
            )
        )

    # ----------------------------------------------------------------- tags
    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a named TAG to a snapshot version (Iceberg table refs): the
        tagged snapshot survives ``expire_snapshots`` (and therefore its
        files survive ``vacuum``) until the tag is dropped — the audit /
        reproducibility handle ('the table as training run X saw it').
        The tag itself is a table property committed atomically, so it is
        as crash-safe as any commit. Returns the pinned version."""
        v = version if version is not None else self.current_version()
        if v not in self._versions():
            raise ValueError(f"version {v} does not exist (or was expired)")
        self.commit(add_files=[], properties_update={f"tag.{name}": str(v)})
        return v

    def drop_tag(self, name: str) -> None:
        """Remove a tag; the snapshot it pinned becomes expirable again."""
        self.commit(add_files=[], properties_update={f"tag.{name}": None})

    def tags(self) -> dict[str, int]:
        return {
            k[len("tag."):]: int(v)
            for k, v in self.snapshot().properties.items()
            if k.startswith("tag.")
        }

    def resolve_ref(self, name: str) -> int:
        """Tag name -> pinned snapshot version (for ``read(version=...)``)."""
        t = self.tags()
        if name not in t:
            raise ValueError(f"unknown tag {name!r}; have {sorted(t)}")
        return t[name]

    # ------------------------------------------------------------- branches
    # A branch is an independent snapshot CHAIN over the same table
    # directory (Iceberg branch refs / the write-audit-publish pattern):
    # its snapshots live in a sibling `_snapshots.br-<name>/` dir while data
    # files and manifest files are shared immutably, so forking is a
    # metadata-only copy of one snapshot JSON and branch writes never touch
    # what main readers see. vacuum() treats every branch's snapshots as
    # retention roots, so branch-only files survive until the branch is
    # dropped.

    def _branch_snapdir(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"bad branch name {name!r}")
        return f"{_SNAPDIR}.br-{name}"

    def create_branch(self, name: str, version: int | None = None) -> "SnapshotTable":
        """Fork a branch at ``version`` (default: current tip). The fork is
        one snapshot-JSON copy — O(1), no data movement. Returns the branch
        handle; every write/read/merge API works on it unchanged.

        The branch DIRECTORY is the exclusivity claim (``mkdir`` is atomic),
        so two racing creates — even at different fork versions — resolve to
        exactly one winner; the loser gets FileExistsError. A create that
        crashes between mkdir and the snapshot rename leaves an empty claim
        dir: ``branch()`` refuses it (no snapshot) and ``drop_branch``
        removes it."""
        if self._snapdir != _SNAPDIR:
            raise ValueError("branches fork from the main table, not from a branch")
        v = version if version is not None else self.current_version()
        src = os.path.join(self.path, self._snapdir, f"v{v:08d}.json")
        d = os.path.join(self.path, self._branch_snapdir(name))
        # atomic claim — no TOCTOU window. Was an os.mkdir; a marker
        # object published create-iff-absent is the seam form (identical
        # locally, a conditional PUT on object stores, where mkdir does
        # not exist). A crashed create leaves marker-without-snapshot:
        # branch() raises FileNotFoundError and meta('refs') flags a null
        # head, exactly as the empty claim dir did.
        self._io.mkdirs(d)
        try:
            self._io.publish_atomic(os.path.join(d, ".branch"), "")
        except FileExistsError as e:
            raise FileExistsError(f"branch {name!r} already exists at {self.path}") from e
        body = self._io.read_text(src)  # copy RAW bytes: byte-identical fork
        self._io.publish_atomic(os.path.join(d, f"v{v:08d}.json"), body)
        return self.branch(name)

    def branch(self, name: str) -> "SnapshotTable":
        """Handle for an existing branch (same table path, sibling snapshot
        chain). Shares this handle's parsed-manifest cache — manifest files
        are immutable and uuid-named, so entries are chain-agnostic."""
        t = SnapshotTable(self.spark, self.path, io=self._io)
        t._snapdir = self._branch_snapdir(name)
        t._manifest_cache = self._manifest_cache
        if not t.exists():
            raise FileNotFoundError(f"no branch {name!r} at {self.path}")
        return t

    def branches(self) -> list[str]:
        pre = f"{_SNAPDIR}.br-"
        return sorted(
            d[len(pre):] for d in self._io.list_dir(self.path) if d.startswith(pre)
        )

    def drop_branch(self, name: str) -> None:
        """Delete a branch's snapshot chain (abandoning a failed audit).
        Branch-ONLY data/manifest files become unreferenced and are
        reclaimed by the next grace-aged :meth:`vacuum`."""
        d = os.path.join(self.path, self._branch_snapdir(name))
        if not self._io.is_dir(d) and not self._io.list_dir(d):
            raise FileNotFoundError(f"no branch {name!r} at {self.path}")
        self._io.remove_tree(d)

    def fast_forward(self, name: str) -> int:
        """Publish a branch: advance main to the branch head's STATE in one
        atomic commit — the WAP publish step. All post-fork branch commits
        squash into a single main snapshot referencing the branch head's
        (already-durable, shared) manifests, so publication is all-or-
        nothing: either main's readers see the fully-audited head, or — if a
        concurrent main writer claims the slot first — CommitConflict, with
        main untouched. (Per-commit publication would let a crash or race
        strand main on an unaudited intermediate branch snapshot.) The
        branch keeps the fine-grained history until dropped.

        Requires main's tip to be the branch's fork point (no main commits
        since the fork); otherwise the audit ran against a stale base and
        the caller must re-fork. The published snapshot is an ``append``
        when the branch only added files (changelog readers see exactly the
        net additions) and an ``overwrite`` otherwise (cdc files added on
        the branch ride along, so cdc-enabled tables stay precisely
        readable). Returns the new tip."""
        if self._snapdir != _SNAPDIR:
            raise ValueError("fast_forward publishes to the main table, not to a branch")
        br = self.branch(name)
        bvs = br._versions()
        tip = self.current_version()
        # version NUMBERS collide across chains (main's post-fork v3 and the
        # branch's v3 are different snapshots), so membership of the number
        # alone proves nothing — the tip snapshot must be content-identical
        # to the branch's snapshot at that version (i.e. main has not moved
        # since the fork).
        if tip not in bvs or self.snapshot(tip) != br.snapshot(tip):
            raise CommitConflict(
                f"fast_forward({name!r}): main tip v{tip} is not on the branch "
                f"(fork base v{bvs[0] if bvs else '?'}); re-fork and re-audit"
            )
        base = self.snapshot(tip)
        head = br.snapshot()
        if head.version == tip:
            return tip  # nothing committed on the branch
        removed = {f["path"] for f in base.files} - {f["path"] for f in head.files}
        snap = Snapshot(
            version=tip + 1,
            schema=head.schema,
            key_cols=head.key_cols,
            bucket_cols=head.bucket_cols,
            num_buckets=head.num_buckets,
            sort_cols=head.sort_cols,
            lww_order=head.lww_order,
            files=list(head.files),
            # fork-point identity means main's refs/props are a subset of the
            # branch's inherited ones, so adopting the head's is lossless
            properties=dict(head.properties),
            parent=tip,
            manifests=list(head.manifests) if head.manifests is not None else None,
            operation="append" if not removed else "overwrite",
        )
        self._write_manifest(snap)  # O_EXCL claim: all-or-nothing publish
        return snap.version

    def rollback(self, version: int | None = None, *, to_ref: str | None = None) -> "Snapshot":
        """Restore the table to an older snapshot's state by committing a
        NEW snapshot with that content (history moves forward; nothing is
        rewound or deleted, so concurrent readers and time travel are
        unaffected). ``to_ref`` accepts a tag name. The snapshot is marked
        ``operation="rollback"`` — changelog readers refuse to cross it
        (a restore is not expressible as row-level deltas without a diff),
        exactly like any other restatement."""
        if to_ref is not None:
            version = self.resolve_ref(to_ref)
        if version is None:
            raise ValueError("rollback needs a version or to_ref")
        old = self.snapshot(version)  # raises if expired
        tip = self.snapshot()
        # tags are REFS, not table state: restore the old snapshot's
        # state-coupled properties (checkpoints, cursors — they must match
        # the restored data) but carry the TIP's tag set forward, or a
        # rollback would silently unpin every tag created after `version`
        # and expire_snapshots/vacuum would reap the snapshots they protect
        props = {k: v for k, v in old.properties.items() if not k.startswith("tag.")}
        props.update({k: v for k, v in tip.properties.items() if k.startswith("tag.")})
        snap = Snapshot(
            version=tip.version + 1,
            schema=old.schema,
            key_cols=old.key_cols,
            bucket_cols=old.bucket_cols,
            num_buckets=old.num_buckets,
            sort_cols=old.sort_cols,
            lww_order=old.lww_order,
            files=list(old.files),
            properties=props,
            parent=tip.version,
            manifests=list(old.manifests) if old.manifests is not None else None,
            operation="rollback",
        )
        self._write_manifest(snap)  # O_EXCL claim: loses cleanly to a racer
        return snap

    def clone(self, dest_path: str, version: int | None = None,
              *, ref: str | None = None, deep: bool = False) -> "SnapshotTable":
        """Zero-copy SHALLOW CLONE (Delta ``CREATE TABLE ... SHALLOW
        CLONE`` / exporting an Iceberg snapshot as a new table): a new,
        fully independent table at ``dest_path`` whose v1 holds the source
        snapshot's exact state — no data bytes copied or rewritten.

        Data files are immutable, so the clone HARD-LINKS them at the same
        table-relative paths (O(files) driver-side metadata, zero data
        I/O). Independence is total from that point: writes on either side
        commit into their own snapshot dirs, and because ``vacuum`` only
        ever unlinks its OWN table's name for a file, reclaiming a file on
        one side can never pull bytes out from under the other (the inode
        lives until its last link drops) — the experimentation fork for
        "try a risky rewrite against yesterday's 100 TB table" at zero
        storage cost. On an object store the same op is manifest-level
        path sharing (Delta shallow clones reference the source's absolute
        file URIs); hard links are this sandbox's faithful filesystem
        equivalent, with copy-fallback across filesystems.

        Carried over: schema, key/bucket/sort/LWW config, and ALL
        state-coupled properties (checkpoint cursors, epoch markers,
        consumer cursors, pinned hash/sketch configs) — so a cloned
        pipeline or consumer target resumes exactly where the source
        state says. Stripped: ``tag.*`` refs (they pin versions of the
        SOURCE's history, which the clone does not have) — branches are
        sibling snapshot dirs and simply aren't copied. The clone's v1 is
        ``operation='clone'`` and is DATA-BEARING: a strict
        :meth:`changes` range that crosses it refuses with a bootstrap
        hint (a fresh consumer must ``reseed()`` first, then tail —
        otherwise the tail-from-v1 convention would silently miss the
        cloned corpus), while ``strict=False`` delivers the full cloned
        state as upserts.

        ``ref`` accepts a tag name; ``version`` a snapshot version;
        default = current tip. Cloning a BRANCH handle clones the branch's
        state. Refuses an existing ``dest_path``. ``deep=True`` copies the
        bytes instead of linking (Delta's deep clone): the migration form
        for moving a snapshot to another filesystem/disk, where link-based
        sharing is impossible or unwanted.
        """
        if ref is not None:
            if version is not None:
                raise ValueError("pass either version or ref, not both")
            version = self.resolve_ref(ref)
        src = self.snapshot(version)  # raises if expired/unknown
        dest = SnapshotTable(self.spark, dest_path, io=self._io)
        if dest.exists():
            raise FileExistsError(dest_path)
        self._io.mkdirs(os.path.join(dest_path, dest._snapdir))
        self._io.mkdirs(os.path.join(dest_path, _DATADIR))
        linked_dirs = set()
        for f in src.files:
            s = os.path.join(self.path, f["path"])
            d = os.path.join(dest_path, f["path"])
            dd = os.path.dirname(d)
            if dd not in linked_dirs:
                self._io.mkdirs(dd)
                linked_dirs.add(dd)
            # a clone interrupted before its v1 manifest landed leaves
            # dest.exists() False, so a retry re-enters here with some
            # files already linked — clear them (remove drops only this
            # table's name) instead of letting link raise EEXIST or copy
            # raise SameFileError on the shared inode
            if self._io.exists(d):
                self._io.remove(d)
            # seam op: hard link locally, server-side COPY on object
            # stores — both O(metadata). deep=True forces the byte copy
            # (migration across filesystems) by never offering the link.
            if deep:
                self._io.copy(s, d)
            else:
                self._io.link_or_copy(s, d)
        for dd in linked_dirs:
            _fsync_dir(dd)
        props = {k: v for k, v in src.properties.items() if not k.startswith("tag.")}
        # bloom sidecar: copy the immutable file so the clone keeps its
        # point-lookup pruning; on any miss just drop the reference (the
        # reader degrades to conservative keeps, and build_blooms rebuilds)
        side = props.get("bloom.sidecar")
        if side is not None:
            s = os.path.join(self.path, side)
            if self._io.exists(s):
                dd = os.path.join(dest_path, os.path.dirname(side))
                self._io.mkdirs(dd)
                self._io.copy(s, os.path.join(dest_path, side))
            else:
                props.pop("bloom.sidecar", None)
        # one fresh manifest holding the full entry list (the compacted-
        # metadata shape a new table starts from)
        man = dest._write_manifest_file(list(src.files)) if src.files else None
        dest._write_manifest(
            Snapshot(
                version=1,
                schema=src.schema,
                key_cols=list(src.key_cols),
                bucket_cols=list(src.bucket_cols),
                num_buckets=src.num_buckets,
                sort_cols=list(src.sort_cols),
                lww_order=list(src.lww_order),
                files=list(src.files),
                properties=props,
                parent=None,
                manifests=[man] if man is not None else [],
                operation="clone",
            )
        )
        return dest

    # ---------------------------------------------------------- maintenance
    # ------------------------------------------------------------- erasure
    def purge(
        self,
        keys: DataFrame,
        *,
        cdc_markers: bool = True,
        max_retries: int = 5,
    ) -> tuple[Snapshot, int]:
        """Right-to-be-forgotten erasure: physically remove every version of
        the matching keys from the LIVE table — the GDPR/erasure primitive
        (Iceberg/Delta "DELETE + expire + remove_orphan_files" guidance),
        and the one thing a tombstone deliberately does NOT do. A tombstone
        (T7) is a retained *record* that a key was deleted; a purge leaves
        no row, no tombstone, and — after :meth:`erase_history` — no bytes.

        ``keys`` is a DataFrame of key values to erase. Its columns must be
        key columns and must cover ``bucket_cols`` (so the touched buckets
        are derivable and pruning stays sound — every version of a matching
        key lives in a derived bucket). A group-prefix purge, e.g. one
        ``conv_id`` column on a conv_id-bucketed transcript table, erases
        entire conversations.

        Cost: O(touched buckets), like :meth:`compact` — the touched
        buckets' reconciled state is anti-joined against the keys and
        rewritten; untouched buckets carry over by reference. The commit is
        pinned to the snapshot it read and redone on conflict (S4), so a
        concurrent append is never silently swallowed.

        Changelog semantics (``operation='purge'``): a purge REMOVES keys,
        which plain restated-bucket files cannot express (removal would be
        under-delivered — see :meth:`changes`). With ``cdc.enabled`` and
        ``cdc_markers=True`` the commit also writes *marker* files at the
        ``cdc`` level: one row per purged key carrying the key columns, a
        bumped most-significant LWW order value (so it beats the stored
        winner downstream — for transcripts this is exactly a CouchDB
        delete: rev height + 1), ``_deleted=true``, and NULL everywhere
        else — so the changelog delivers exact content-free deletes,
        strict consumers cascade the removal, and no purged content is
        re-emitted. Without markers, ``changes()`` over the purge raises
        under ``strict`` and under-delivers the removal otherwise.

        Erasure scope: this removes the keys from the CURRENT state of THIS
        table. Historical snapshots still reference the old files; complete
        the erasure with :meth:`erase_history`. Upstream feed files and
        downstream derived tables are separate stores — purge each.

        Returns ``(snapshot, rows_purged)``; a purge matching nothing is a
        metadata no-op (no new version — idempotent re-runs don't churn
        history).
        """
        from pyspark.sql import Observation

        kcols = list(keys.columns)
        last_err: CommitConflict | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            bad = [c for c in kcols if c not in snap.key_cols]
            if bad:
                raise ValueError(
                    f"purge keys columns must be key columns {snap.key_cols}; got {bad}"
                )
            missing = [c for c in snap.bucket_cols if c not in kcols]
            if missing:
                raise ValueError(
                    f"purge keys must cover bucket_cols {snap.bucket_cols} "
                    f"(missing {missing}) — otherwise the touched buckets are "
                    "not derivable and the purge would scan the whole table"
                )
            # conform key types to the table schema BEFORE hashing: Spark's
            # hash functions are type-sensitive (int 5 and long 5 hash
            # differently), so an int-typed keys df against a long-typed
            # table would derive the wrong buckets and silently miss rows
            keys_d = keys.select(
                *[F.col(c).cast(snap.schema[c].dataType).alias(c) for c in kcols]
            ).distinct()
            touched_all = {
                r["__b"]
                for r in keys_d.select(
                    bucket_expr(snap.bucket_cols, snap.num_buckets).alias("__b")
                )
                .distinct()
                .collect()
            }
            touched = sorted(touched_all & {f["bucket"] for f in snap.files})
            if not touched:
                return snap, 0
            cur = self.read_current(buckets=touched)
            purged = cur.join(keys_d, on=kcols, how="left_semi")

            marker_files: list[dict[str, Any]] = []
            cdc_on = snap.properties.get("cdc.enabled") == "true"
            markable = bool(snap.lww_order) and isinstance(
                snap.schema[snap.lww_order[0][0]].dataType, T.NumericType
            )
            if cdc_markers and cdc_on and not markable:
                # refuse rather than silently commit an unreadable purge:
                # every strict changelog consumer downstream would wedge on
                # it with no signal at purge time
                raise ValueError(
                    "cdc.enabled is set but purge markers need a numeric "
                    "most-significant LWW order column to outrank the stored "
                    f"winner (lww_order={snap.lww_order}); pass "
                    "cdc_markers=False to accept that strict changelog "
                    "readers cannot cross this purge and must re-seed"
                )
            use_markers = cdc_markers and cdc_on and markable
            obs = Observation()
            purged = purged.observe(obs, F.count(F.lit(1)).alias("n"))
            if use_markers:
                marker_files = self._write_data(
                    purged.select(*self._marker_projection(snap)), snap, level="cdc"
                )
                n_purged = int(obs.get["n"])
            else:
                n_purged = int(purged.count())
            if n_purged == 0:
                # marker files (if any) are zero-row orphans; vacuum collects
                return snap, 0
            survivors = cur.join(keys_d, on=kcols, how="left_anti")
            files = self._write_data(survivors, snap, level="base") + marker_files
            try:
                out = self.commit(
                    add_files=files,
                    remove_buckets=set(touched),
                    remove_level=("base", "delta", "cdc"),
                    expected_version=snap.version,
                    operation="purge",
                )
                return out, n_purged
            except CommitConflict as e:
                last_err = e  # concurrent commit landed: redo from tip
        raise last_err  # type: ignore[misc]

    def _marker_projection(self, snap: Snapshot) -> list:
        """Content-free delete-marker projection shared by :meth:`purge` and
        :meth:`expire_rows`: key columns + a bumped most-significant LWW
        order value (so the marker outranks the stored winner downstream —
        the CouchDB delete-is-a-new-revision move), ``_deleted=true``, NULL
        everywhere else."""
        msc, asc = snap.lww_order[0]
        bump = F.coalesce(F.col(msc), F.lit(0)) + F.lit(-1 if asc else 1)
        keep = set(snap.key_cols) | {c for c, _ in snap.lww_order}
        cols = []
        for f in snap.schema.fields:
            if f.name == msc:
                cols.append(bump.cast(f.dataType).alias(f.name))
            elif f.name == "_deleted":
                cols.append(F.lit(True).cast(f.dataType).alias(f.name))
            elif f.name in keep:
                cols.append(F.col(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return cols

    def expire_rows(
        self,
        col: str,
        cutoff: Any,
        *,
        cdc_markers: bool = True,
        max_retries: int = 5,
    ) -> tuple[Snapshot, int]:
        """Predicate retention (TTL): remove every key whose RECONCILED
        winner has ``col < cutoff`` — the data-retention primitive
        (Iceberg/Delta ``DELETE FROM t WHERE ts < cutoff`` + expire +
        vacuum), e.g. "drop conversations idle for 90 days". Like
        :meth:`purge`, the expired keys leave no row and no tombstone;
        complete the byte-level erasure with :meth:`erase_history`.

        Semantics:
        - the predicate is evaluated on the LWW WINNER of each key: a key
          whose winner is fresh keeps ALL its versions (older shadowed
          versions are compaction's job, and dropping them here while a
          fresher winner exists would be wrong under clock skew — an older
          version may carry a LARGER ``col`` than the winner);
        - NULL retention values never expire (retention must not delete
          rows it cannot date). Tombstone rows whose ``col`` is null —
          e.g. delete stubs with no payload timestamp — therefore survive;
          expire them by a column every row carries (``seq``);
        - expiring is a REMOVAL: the snapshot commits as the same
          changelog class as :meth:`purge` (exact content-free delete
          markers when ``cdc.enabled`` + ``cdc_markers``; otherwise strict
          changelog readers refuse to cross it).

        Cost: bucket layouts hash by key, so age mixes into every bucket —
        the work is bounded by FILE-LEVEL stats instead: buckets where no
        file's ``[lo, hi]`` bound admits ``col < cutoff`` are untouched
        (one driver-side pass over manifest stats, no I/O), which gets
        sharp after :meth:`cluster` puts ``col`` in the Z-order. Touched
        buckets rewrite like purge — O(touched buckets). With
        ``cdc_markers=False``, buckets whose every file PROVABLY holds only
        expired rows (``hi < cutoff`` and footer-proven null-free — the
        ``nulls`` flag recorded at commit time) are dropped by pure
        metadata, no read at all: the whole-table-went-cold fast path.
        (Markers force a read of the expired keys, so the metadata path is
        only available without them; the physical row counts of
        metadata-dropped buckets come from manifest entries.)

        Returns ``(snapshot, rows_expired)`` — expired winner rows for the
        read path plus manifest physical rows for metadata-dropped buckets;
        a no-match call is a metadata no-op (idempotent re-runs)."""
        from pyspark.sql import Observation

        last_err: CommitConflict | None = None
        for _ in range(max_retries):
            snap = self.snapshot()
            names = {f.name for f in snap.schema.fields}
            if col not in names:
                raise ValueError(f"retention column {col!r} not in schema {sorted(names)}")
            dtype = snap.schema[col].dataType
            cut = _norm_bound(cutoff, dtype)
            if cut is None:
                raise ValueError("retention cutoff must be non-null")
            by_bucket: dict[int, list[dict[str, Any]]] = {}
            for e in snap.files:
                by_bucket.setdefault(e["bucket"], []).append(e)
            touched = sorted(
                b
                for b, fs in by_bucket.items()
                if any(_entry_matches(e, [(col, "<", cut)]) for e in fs)
            )
            if not touched:
                return snap, 0
            cdc_on = snap.properties.get("cdc.enabled") == "true"
            markable = bool(snap.lww_order) and isinstance(
                snap.schema[snap.lww_order[0][0]].dataType, T.NumericType
            )
            if cdc_markers and cdc_on and not markable:
                raise ValueError(
                    "cdc.enabled is set but retention markers need a numeric "
                    "most-significant LWW order column to outrank the stored "
                    f"winner (lww_order={snap.lww_order}); pass "
                    "cdc_markers=False to accept that strict changelog "
                    "readers cannot cross this retention commit"
                )
            use_markers = cdc_markers and cdc_on and markable

            def _all_expired(e: dict[str, Any]) -> bool:
                st = (e.get("stats") or {}).get(col)
                return (
                    bool(st)
                    and st.get("hi") is not None
                    and st["hi"] < cut
                    and st.get("nulls") is False
                )

            meta_drop = (
                []
                if use_markers  # markers need the keys: must read
                else [b for b in touched if all(_all_expired(e) for e in by_bucket[b])]
            )
            residual = [b for b in touched if b not in set(meta_drop)]
            self.last_expire_meta_buckets = meta_drop  # observability
            n_meta = sum(int(e.get("rows") or 0) for b in meta_drop for e in by_bucket[b])
            files: list[dict[str, Any]] = []
            n_exp = 0
            if residual:
                # typed cutoff literal rebuilt from the NORMALIZED bound so
                # int-micros and datetime cutoffs behave identically
                if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
                    lit_cut = F.timestamp_micros(F.lit(cut)).cast(dtype)
                else:
                    lit_cut = F.lit(cut).cast(dtype)
                cur = self.read_current(buckets=residual)
                expired_pred = F.col(col).isNotNull() & (F.col(col) < lit_cut)
                expired = cur.where(expired_pred)
                obs = Observation()
                expired = expired.observe(obs, F.count(F.lit(1)).alias("n"))
                marker_files: list[dict[str, Any]] = []
                if use_markers:
                    marker_files = self._write_data(
                        expired.select(*self._marker_projection(snap)), snap, level="cdc"
                    )
                    n_exp = int(obs.get["n"])
                else:
                    n_exp = int(expired.count())
                if n_exp:
                    survivors = cur.where(~expired_pred)
                    files = self._write_data(survivors, snap, level="base") + marker_files
                # n_exp == 0: stats were conservative, nothing to rewrite;
                # any zero-row marker files become vacuum-collected orphans
            remove = set(meta_drop) | (set(residual) if n_exp else set())
            if not remove:
                return snap, 0
            try:
                out = self.commit(
                    add_files=files,
                    remove_buckets=remove,
                    remove_level=("base", "delta", "cdc"),
                    expected_version=snap.version,
                    operation="retention",
                )
                return out, n_exp + n_meta
            except CommitConflict as e:
                last_err = e  # concurrent commit landed: redo from tip
        raise last_err  # type: ignore[misc]

    def erase_history(
        self,
        *,
        keep_last: int = 1,
        grace_seconds: float = 3600.0,
        force: bool = False,
    ) -> tuple[int, int]:
        """Complete an erasure: expire historical snapshots and vacuum the
        now-unreferenced files so purged content physically leaves disk.
        This is Iceberg's documented GDPR sequence (DELETE →
        expire_snapshots → remove_orphan_files) as one call.

        Refuses (unless ``force``) while tags or branches pin history —
        a tagged/branched snapshot would silently keep the purged bytes
        alive, defeating the erasure while appearing to succeed. With
        ``force=True`` pinned snapshots are still retained (the caller is
        acknowledging partial erasure, e.g. a branch scheduled for its own
        purge), not deleted out from under their refs.

        ``grace_seconds`` is :meth:`vacuum`'s in-flight-commit guard; pass
        ``0`` only on a quiesced table. Note the changelog contracts: after
        expiry, consumers more than ``keep_last - 1`` snapshots behind must
        :meth:`~cht_sync_spark.streaming.consumer.ChangelogConsumer.reseed`.

        Returns ``(snapshots_expired, files_removed)``."""
        if not force:
            if self.tags():
                raise ValueError(
                    f"tags {sorted(self.tags())} pin historical snapshots — "
                    "purged content would survive under them; drop the tags "
                    "or pass force=True to accept partial erasure"
                )
            if self.branches():
                raise ValueError(
                    f"branches {self.branches()} are retention roots — purged "
                    "content may survive on them; drop/purge the branches or "
                    "pass force=True to accept partial erasure"
                )
        expired = self.expire_snapshots(keep_last=keep_last)
        removed = self.vacuum(grace_seconds=grace_seconds)
        return expired, removed

    def expire_snapshots(self, keep_last: int = 10) -> int:
        """Remove manifests older than the last ``keep_last`` snapshots
        (Iceberg's expire_snapshots analogue). Bounds driver-side metadata:
        with a compaction cadence the live file list stays O(num_buckets +
        deltas-since-compaction), and expiry keeps the manifest DIRECTORY
        from growing O(commits) over a long replay. Returns the number of
        manifests removed. Time travel remains available across the kept
        window only — EXCEPT tagged versions (:meth:`tag`), which are
        retained regardless of age until their tag is dropped."""
        versions = self._versions()
        pinned = set(self.tags().values())
        expired = [
            v
            for v in (versions[:-keep_last] if keep_last > 0 else versions[:-1])
            if v not in pinned
        ]
        d = os.path.join(self.path, self._snapdir)
        for v in expired:
            self._io.remove(os.path.join(d, f"v{v:08d}.json"))
            self._snap_cache.pop(v, None)
        return len(expired)

    def vacuum(self, grace_seconds: float = 3600.0) -> int:
        """Delete data files not referenced by ANY retained snapshot —
        crash leftovers and files orphaned by losing commit races (S4
        retries write before they win).

        ``grace_seconds`` is the orphan-file age threshold (Iceberg's
        ``older_than`` on remove_orphan_files): a CONCURRENT writer writes
        its parquet files BEFORE committing the manifest, so a file that is
        unreferenced *right now* may be referenced by a commit that lands a
        moment later — deleting it would let that commit succeed pointing at
        missing files. Files younger than the grace window are therefore
        never touched; only files old enough that no in-flight commit can
        still adopt them are removed. With ``grace_seconds=0`` (quiesced
        table only) every unreferenced file goes. Returns files removed."""
        import time as _time

        live: set[str] = set()
        live_manifests: set[str] = set()
        # every snapshot CHAIN over this directory is a retention root:
        # main plus all branches (a branch-only file must survive until its
        # branch is dropped or expires it)
        chains: list[SnapshotTable] = [self]
        for name in self.branches():
            h = SnapshotTable(self.spark, self.path, io=self._io)
            h._snapdir = self._branch_snapdir(name)
            # immutable uuid-named manifests: share the parsed cache so a
            # maintenance-cadence vacuum doesn't re-read every branch's
            # manifest JSON each cycle
            h._manifest_cache = self._manifest_cache
            if h._snapdir != self._snapdir:
                chains.append(h)
        if self._snapdir != _SNAPDIR:
            main = SnapshotTable(self.spark, self.path, io=self._io)
            main._manifest_cache = self._manifest_cache
            if main.exists():
                chains.append(main)
        for h in chains:
            for v in h._versions():
                snap = h.snapshot(v)
                for f in snap.files:
                    live.add(os.path.normpath(f["path"]))
                for ref in snap.manifests or []:
                    live_manifests.add(os.path.normpath(ref))
                sc = snap.properties.get("bloom.sidecar")
                if sc:  # sidecar referenced by a retained snapshot: live
                    live_manifests.add(os.path.normpath(sc))
        data_root = os.path.join(self.path, _DATADIR)
        cutoff = _time.time() - grace_seconds
        removed = 0
        # dirs fully emptied by THIS pass, where every entry removed was
        # itself past the grace window (aged orphan file / aged staging /
        # aged-empty child dir): safe to rmdir even though our own
        # own remove calls just refreshed the dir's mtime
        aged_emptied: set = set()
        for dirpath, dirnames, filenames in self._io.walk_files(data_root):
            # NEVER descend into Hadoop commit staging: a concurrent
            # writer creates data/<uuid>/_temporary/... and renames task
            # files out on commit — deleting (or rmdir'ing, below) any of
            # it mid-write fails the writer's job with a phantom
            # chmod/rename error (found by tests/test_vacuum_torture.py).
            # Aged-out staging left by CRASHED writers is removed whole
            # once NOTHING in its tree is younger than the grace window.
            if "_temporary" in dirpath.split(os.sep):
                continue
            dir_mtime_before = self._io.mtime(dirpath)
            # names present at walk time that this pass removed as aged
            gone_aged: set = set()
            for dn in list(dirnames):
                full = os.path.join(dirpath, dn)
                if dn == "_temporary":
                    # liveness = the NEWEST entry anywhere in the staging
                    # tree, not the root's mtime (set at job start): a
                    # legitimate job running longer than the grace window
                    # keeps writing fresh task files deep in the tree
                    newest = self._io.mtime(full)
                    if newest is not None:
                        for dp2, dns2, fns2 in self._io.walk_files(full):
                            for entry in dns2 + fns2:
                                m2 = self._io.mtime(os.path.join(dp2, entry))
                                if m2 is not None:
                                    newest = max(newest, m2)
                        if newest <= cutoff:
                            self._io.remove_tree(full)
                            gone_aged.add(dn)
                elif full in aged_emptied:
                    gone_aged.add(dn)
            for fn in filenames:
                full = os.path.join(dirpath, fn)
                rel = os.path.normpath(os.path.relpath(full, self.path))
                if fn.endswith(".parquet") and rel not in live:
                    m = self._io.mtime(full)
                    if m is None or m > cutoff:
                        continue  # gone, or possibly an in-flight commit's file
                    self._io.remove(full)
                    gone_aged.add(fn)
                    removed += 1
            if not self._io.list_dir(dirpath) and dirpath != data_root:
                # the directory-level grace twin of the file rule: an empty
                # dir touched inside the window may be a writer's
                # just-created bucket/staging parent — removing it races
                # the writer's own mkdir/rename. Two safe cases: the dir
                # was last modified before the cutoff (mtime captured
                # BEFORE our own deletions refreshed it), or everything it
                # held at walk time was removed by this pass as past-grace
                # (so the fresh mtime is our own doing, not a writer's).
                walked = set(filenames) | set(dirnames)
                aged_ok = bool(walked) and walked == gone_aged
                try:
                    if aged_ok or (
                        dir_mtime_before is not None and dir_mtime_before <= cutoff
                    ):
                        self._io.remove_dir(dirpath)
                        aged_emptied.add(dirpath)
                except OSError:
                    pass  # concurrent writer repopulated it: leave it
        # manifest files referenced by no retained snapshot (expired history,
        # losing commit races) — same grace window as data files
        man_root = os.path.join(self.path, _MANDIR)
        for fn in self._io.list_dir(man_root):
            full = os.path.join(man_root, fn)
            rel = os.path.normpath(os.path.relpath(full, self.path))
            # ".tmp" infix (not suffix): write_text_atomic stages as
            # <name>.tmp.<uuid>, so a crashed mid-manifest-write leaves
            # m-<uuid>.json.tmp.<uuid>
            if (
                fn.endswith(".json") and rel not in live_manifests
            ) or ".tmp" in fn:
                m = self._io.mtime(full)
                if m is None or m > cutoff:
                    continue
                self._io.remove(full)
                self._manifest_cache.pop(rel, None)
                removed += 1
        return removed

    # ------------------------------------------------------------ evolution
    def evolve_schema(self, batch_schema: T.StructType) -> T.StructType:
        """Additive + widening evolution (Iceberg's sanctioned set).

        - new batch fields are appended nullable
          (on_schema_change='append_new_columns', contacts.sql:5);
        - an existing TOP-LEVEL column widens along the Iceberg promotion
          lattice (tinyint→smallint→int→bigint, float→double) when the
          batch arrives wider — safe in place because Spark 4's vectorized
          parquet reader upcasts old INT32/FLOAT files under the widened
          read schema (no rewrite), and ``_conform`` casts every future
          batch up;
        - key/bucket columns NEVER widen: the bucket layout is
          ``pmod(xxhash64(col), n)`` and Spark's hash of an int differs
          from the hash of the same value as long — a widened bucket
          column would silently re-bucket future writes away from
          existing data. A wider batch key is cast DOWN by ``_conform``
          (ANSI overflow there is the correct failure);
        - anything else (narrower batch, string/int clashes, nested types)
          keeps the current type — relaxed ``_conform`` casting owns it.
        """
        cur = self.snapshot().schema
        frozen = set(self.snapshot().key_cols) | set(self.snapshot().bucket_cols)
        by_name = {f.name: f for f in batch_schema.fields}
        changed = False
        fields: list[T.StructField] = []
        for f in cur.fields:
            nb = by_name.get(f.name)
            w = (
                _widened(f.dataType, nb.dataType)
                if nb is not None and f.name not in frozen
                else None
            )
            if w is not None:
                fields.append(T.StructField(f.name, w, f.nullable))
                changed = True
            else:
                fields.append(f)
        names = {f.name for f in cur.fields}
        added = [f for f in batch_schema.fields if f.name not in names]
        if added:
            changed = True
        if not changed:
            return cur
        return T.StructType(
            fields + [T.StructField(f.name, f.dataType, True) for f in added]
        )


_INT_WIDTH = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}


def _widened(cur: T.DataType, new: T.DataType) -> T.DataType | None:
    """The widened type if cur→new is a sanctioned promotion, else None."""
    a, b = cur.simpleString(), new.simpleString()
    if a in _INT_WIDTH and b in _INT_WIDTH and _INT_WIDTH[b] > _INT_WIDTH[a]:
        return new
    if a == "float" and b == "double":
        return new
    return None


def _conform(df: DataFrame, schema: T.StructType, strict: bool = False) -> DataFrame:
    """Project df onto schema column order.

    Relaxed (default): silently casts and null-fills — the landing-table
    behavior, where additive evolution owns schema drift.

    Strict (``contract: enforced``, contacts.yml:7-8): any drift FAILS —
    a missing column, a type that differs from the declared one, or an
    undeclared extra column all raise :class:`SchemaContractError` instead
    of coercing. Plan-time only (no data pass); row-level not_null/unique
    checks live in :mod:`cht_sync_spark.operators.contracts`.
    """
    if strict:
        declared = {f.name: f for f in schema.fields}
        have = dict(df.dtypes)
        missing = [n for n in declared if n not in have]
        extra = [n for n in have if n not in declared]
        wrong = [
            (n, have[n], f.dataType.simpleString())
            for n, f in declared.items()
            if n in have and have[n] != f.dataType.simpleString()
        ]
        if missing or extra or wrong:
            raise SchemaContractError(
                f"contract violation: missing={missing} extra={extra} "
                f"retyped={[f'{n}: {got} != {want}' for n, got, want in wrong]}"
            )
        return df.select(*[F.col(f.name) for f in schema.fields])
    cols = []
    have = set(df.columns)
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
