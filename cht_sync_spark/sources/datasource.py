"""``cht_changes`` — the changes feed as a first-class Spark data source.

The reference's feed consumer is an imperative poll loop around
``couchDb.changes({since, limit})`` with hand-rolled seq checkpoints
(couch2pg/src/importer.js:142-175 and watcher.js). This module re-expresses
that contract through Spark's OWN source abstraction — the PySpark 4 Python
Data Source API (`pyspark.sql.datasource`) — so the feed plugs into the
engine like Kafka does:

- ``spark.read.format("cht_changes").option("path", dir)`` — batch reads
  with ``since``/``until`` seq-range options. File and row-group pruning
  happen in OUR planner from parquet footer statistics (the Python-source
  analogue of Catalyst's ``PushedFilters``): a resumed ingest never opens
  files below its watermark.
- ``spark.readStream.format("cht_changes")`` — a micro-batch stream whose
  OFFSETS are the per-feed-partition seq cursors themselves
  (``{"0": seq, "1": seq, ...}``). Spark's offset log / checkpointLocation
  then carries exactly the state the reference keeps in its
  ``couchdb_progress`` table (importer.js:177-183), and
  kill-and-resume-exactly-once falls out of the engine contract instead of
  bespoke bookkeeping. ``eventsPerBatch`` caps admission per trigger (the
  ``maxOffsetsPerTrigger`` analogue, planned from row-group row counts —
  no data read on the driver).

Scale notes (100 TB / 10^10 events):
- Planning is O(files) driver-side footer metadata, same as the batch
  scheduler in :mod:`cht_sync_spark.sources.changes`; no Spark job runs to
  plan a micro-batch.
- Each ``read`` task streams pyarrow record batches (Arrow end-to-end into
  Spark's vectorized reader) — no per-row Python. Row groups wholly outside
  the requested seq range are skipped without decoding.
- One input partition per overlapping file per feed slice: task parallelism
  tracks the feed layout exactly like the native parquet source.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

# Spark-facing schema: CHANGE_EVENT (schemas.py) + the feed-slice id that
# ChangesFeedSource.df() synthesizes for per-(source, partition) lineage.
FEED_DDL = (
    "seq bigint, source string, op string, id string, rev string, doc string, "
    "_feed_partition int"
)
_COLS = ["seq", "source", "op", "id", "rev", "doc"]

_MIN_SEQ = -(1 << 62)  # "before everything" sentinel (feed seqs are >= 0)


def _split_paths(path_opt: str) -> list[str]:
    paths = [p.strip() for p in path_opt.split(",") if p.strip()]
    if not paths:
        raise ValueError("cht_changes: empty `path` option")
    return paths


def _feed_files(feed_dir: str) -> list[str]:
    try:
        names = sorted(
            f
            for f in os.listdir(feed_dir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    except OSError as e:
        raise FileNotFoundError(f"cht_changes: cannot list feed dir {feed_dir}") from e
    return [os.path.join(feed_dir, f) for f in names]


def _file_seq_stats(path: str) -> list[tuple[int | None, int | None, int]]:
    """Per-row-group (seq_min, seq_max, rows) from the parquet footer.

    (None, None, rows) when the writer dropped seq statistics — the planner
    then treats the group as overlapping every range (correct, just
    unpruned), mirroring how Iceberg scans handle stats-less files.
    """
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: list[tuple[int | None, int | None, int]] = []
    for g in range(md.num_row_groups):
        rows = md.row_group(g).num_rows
        if "seq" not in idx:
            out.append((None, None, rows))
            continue
        st = md.row_group(g).column(idx["seq"]).statistics
        if st is None or not st.has_min_max:
            out.append((None, None, rows))
        else:
            out.append((int(st.min), int(st.max), rows))
    return out


@dataclass
class FeedSlice(InputPartition):
    """One scan task: a single feed file restricted to a (lo, hi] seq range."""

    file: str
    feed_partition: int
    lo: int  # exclusive
    hi: int | None  # inclusive; None = unbounded


def _plan_slices(
    paths: list[str], lo_by_part: dict[int, int], hi_by_part: dict[int, int | None]
) -> list[FeedSlice]:
    """File-level pruning from footer stats: keep only files that can hold
    rows in their feed partition's (lo, hi] range."""
    slices: list[FeedSlice] = []
    for i, d in enumerate(paths):
        lo = lo_by_part.get(i, _MIN_SEQ)
        hi = hi_by_part.get(i)
        if hi is not None and hi <= lo:
            continue
        for f in _feed_files(d):
            keep = False
            for gmin, gmax, _rows in _file_seq_stats(f):
                if gmin is None:
                    keep = True  # stats-less: cannot prune
                    break
                if gmax > lo and (hi is None or gmin <= hi):
                    keep = True
                    break
            if keep:
                slices.append(FeedSlice(f, i, lo, hi))
    return slices


def _read_slice(sl: FeedSlice, sources: list[str] | None) -> Iterator["pa.RecordBatch"]:
    """Executor-side scan of one slice: row-group pruning + vectorized
    seq-range / source filters, yielding Arrow batches in FEED_DDL order."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(sl.file)
    md = pf.metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    groups = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(idx["seq"]).statistics if "seq" in idx else None
        if st is not None and st.has_min_max:
            if int(st.max) <= sl.lo or (sl.hi is not None and int(st.min) > sl.hi):
                continue  # wholly outside the range: skip without decoding
        groups.append(g)
    out_schema = pa.schema(
        [
            ("seq", pa.int64()),
            ("source", pa.string()),
            ("op", pa.string()),
            ("id", pa.string()),
            ("rev", pa.string()),
            ("doc", pa.string()),
            ("_feed_partition", pa.int32()),
        ]
    )
    for g in groups:
        tbl = pf.read_row_group(g, columns=_COLS)
        mask = pc.greater(tbl["seq"], pa.scalar(sl.lo, pa.int64()))
        if sl.hi is not None:
            mask = pc.and_(mask, pc.less_equal(tbl["seq"], pa.scalar(sl.hi, pa.int64())))
        if sources is not None:
            mask = pc.and_(mask, pc.is_in(tbl["source"], value_set=pa.array(sources)))
        tbl = tbl.filter(mask)
        if tbl.num_rows == 0:
            continue
        fp = pa.nulls(tbl.num_rows, pa.int32()).fill_null(sl.feed_partition)
        tbl = tbl.append_column("_feed_partition", fp).cast(out_schema)
        yield from tbl.to_batches(max_chunksize=1 << 16)


class _Options:
    """Parsed reader options (DataSource options arrive lower-cased)."""

    def __init__(self, options: dict):
        self.paths = _split_paths(options["path"])
        self.since = int(options.get("since", _MIN_SEQ))
        until = options.get("until")
        self.until = int(until) if until is not None else None
        srcs = options.get("sources")
        self.sources = [s.strip() for s in srcs.split(",") if s.strip()] if srcs else None
        # 0 = uncapped (one batch per trigger reads everything new). Caps are
        # for TAILING (processingTime) streams; see ChangesStreamReader note
        # on trigger(availableNow) + caps.
        self.events_per_batch = int(options.get("eventsperbatch", 0))


class ChangesBatchReader(DataSourceReader):
    def __init__(self, opts: _Options):
        self.opts = opts

    def partitions(self) -> Sequence[InputPartition]:
        o = self.opts
        n = len(o.paths)
        return _plan_slices(
            o.paths, {i: o.since for i in range(n)}, {i: o.until for i in range(n)}
        )

    def read(self, partition: FeedSlice) -> Iterator["pa.RecordBatch"]:
        return _read_slice(partition, self.opts.sources)


class ChangesStreamReader(DataSourceStreamReader):
    """Micro-batch reader whose offset IS the per-feed-partition seq map.

    With ``eventsPerBatch`` set, ``latestOffset`` advances each partition's
    cursor by ~that many rows using row-group statistics only (sorted by
    seq_min, accumulate row counts past the cursor, cut at a row-group
    seq_max boundary) — the same zero-job schedule as
    ``ChangesFeedSource.plan_batches``, expressed through the engine's
    admission-control hook so Spark's offset log owns resume. A row group
    larger than the cap still advances the cursor by at least one group
    (a soft target, as with Kafka's maxOffsetsPerTrigger).

    ``trigger(availableNow=True)`` + caps DON'T compose: the Python source
    API has no SupportsTriggerAvailableNow hook, so Spark takes the FIRST
    ``latestOffset`` as the whole drain's target and a capped reader drains
    only one batch per invocation (verified empirically). Hence caps default
    OFF (full drains are always complete), and capped multi-batch drains go
    through :func:`drain`, which loops a tailing trigger until the committed
    offsets reach the feed max.
    """

    def __init__(self, opts: _Options):
        self.opts = opts

    # ----------------------------------------------------------- offsets
    def initialOffset(self) -> dict:
        off = {str(i): self.opts.since for i in range(len(self.opts.paths))}
        # belt-and-braces cursor seed; latestOffset already treats an
        # unseeded partition as sitting at `since` (the runner may prefetch
        # latestOffset BEFORE initialOffset on fresh queries)
        self._seed(off)
        return off

    def _max_seq(self, part: int) -> int | None:
        hi: int | None = None
        for f in _feed_files(self.opts.paths[part]):
            for _gmin, gmax, _rows in _file_seq_stats(f):
                if gmax is not None and (hi is None or gmax > hi):
                    hi = gmax
        return hi

    def _next_cut(self, part: int, cur: int) -> int:
        groups: list[tuple[int, int, int]] = []
        stats_less = False
        for f in _feed_files(self.opts.paths[part]):
            for gmin, gmax, rows in _file_seq_stats(f):
                if gmin is None:
                    stats_less = True
                else:
                    groups.append((gmin, gmax, rows))
        if stats_less:
            # cannot bound admission without stats: take everything (one
            # big batch is correct, just unthrottled)
            hi = self._max_seq(part)
            return cur if hi is None else max(cur, hi)
        groups.sort()
        acc, cut = 0, cur
        for gmin, gmax, rows in groups:
            if gmax <= cur:
                continue
            acc += rows
            cut = max(cut, gmax)
            if acc >= self.opts.events_per_batch:
                break
        return cut

    def latestOffset(self) -> dict:
        """Next offsets. The Python API's latestOffset takes no start
        offset, so the cursor we advance from is OUR last observed offset.
        An UNSEEDED cursor provably means a fresh query starting at
        ``since``: on restart the engine pushes the checkpointed offset into
        the reader BEFORE any latestOffset call (PythonMicroBatchStream
        implements AcceptsLatestSeenOffset; setLatestSeenOffset arrives here
        as a degenerate partitions(o, o) call — verified against
        spark-sql_2.13-4.1.2 bytecode and the offset log in
        tests/test_datasource.py). A capped cut from a stale cursor would
        land BEHIND the checkpoint, and a regressed offset log means
        duplicate re-delivery — partitions() guards that invariant loudly."""
        out: dict[str, int] = {}
        for i in range(len(self.opts.paths)):
            cur = int(self._cursor.get(str(i), self.opts.since))
            if self.opts.events_per_batch <= 0:
                hi = self._max_seq(i)
                out[str(i)] = cur if hi is None else max(cur, hi)
            else:
                out[str(i)] = self._next_cut(i, cur)
        return out

    @property
    def _cursor(self) -> dict:
        return getattr(self, "_cursor_state", {})

    def _seed(self, *offsets: dict) -> None:
        cur = dict(self._cursor)
        for off in offsets:
            for k, v in off.items():
                if k not in cur or int(v) > int(cur[k]):
                    cur[k] = int(v)
        self._cursor_state = cur

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        for k, v in end.items():
            if k in start and int(v) < int(start[k]):
                # committing a regressed offset would silently re-deliver
                # (start[k], old_end] on the NEXT batch — fail loudly instead
                raise AssertionError(
                    f"cht_changes: offset regression on feed partition {k}: "
                    f"start={start[k]} > end={v}"
                )
        self._seed(start, end)
        lo = {int(k): int(v) for k, v in start.items()}
        hi = {int(k): int(v) for k, v in end.items()}
        return _plan_slices(self.opts.paths, lo, hi)

    def read(self, partition: FeedSlice) -> Iterator["pa.RecordBatch"]:
        return _read_slice(partition, self.opts.sources)

    def commit(self, end: dict) -> None:
        # offsets live in Spark's own log; just seed the admission cursor
        self._seed(end)


class ChangesDataSource(DataSource):
    """``spark.dataSource.register(ChangesDataSource)`` →
    ``spark.read.format("cht_changes")`` / ``spark.readStream.format(...)``.

    Options: ``path`` (comma-separated feed dirs — each dir is one feed
    partition, the multi-source S8 layout), ``since`` (exclusive seq lower
    bound), ``until`` (inclusive upper bound, batch only), ``sources``
    (comma-separated source filter), ``eventsPerBatch`` (streaming
    admission target, default 500k).
    """

    @classmethod
    def name(cls) -> str:
        return "cht_changes"

    def schema(self) -> str:
        return FEED_DDL

    def reader(self, schema) -> ChangesBatchReader:
        return ChangesBatchReader(_Options(self.options))

    def streamReader(self, schema) -> ChangesStreamReader:
        return ChangesStreamReader(_Options(self.options))


def register(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(ChangesDataSource)


def drain(
    spark,
    feed_path: str | list[str],
    checkpoint_dir: str,
    apply_batch,
    *,
    events_per_batch: int = 500_000,
    sources: list[str] | None = None,
    since: int | None = None,
    timeout_sec: float = 3600.0,
) -> int:
    """Capped, multi-batch, COMPLETE drain of the feed through foreachBatch.

    The availableNow analogue for an admission-capped ``cht_changes`` stream
    (plain ``trigger(availableNow)`` would stop after one capped batch — see
    :class:`ChangesStreamReader`): runs a fast-tailing trigger and stops once
    the committed offsets reach the feed max that was visible when the drain
    started (new data arriving mid-drain is picked up too; the stop check
    re-reads footers only once per poll). Returns the number of micro-batches
    committed by THIS call. Resume-safe: offsets live in Spark's checkpoint.
    """
    import time

    paths = feed_path if isinstance(feed_path, list) else [feed_path]
    reader = (
        spark.readStream.format("cht_changes")
        .option("path", ",".join(paths))
        .option("eventsPerBatch", events_per_batch)
    )
    if sources:
        reader = reader.option("sources", ",".join(sources))
    if since is not None:
        reader = reader.option("since", since)
    register(spark)
    q = (
        reader.load()
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )
    t0, n0 = time.time(), _committed_batches(checkpoint_dir)
    try:
        while True:
            if q.exception() is not None:
                raise q.exception()
            done = stream_offsets(checkpoint_dir)
            if done is not None and all(
                (mx := _dir_max_seq(d)) is None or done.get(i, _MIN_SEQ) >= mx
                for i, d in enumerate(paths)
            ):
                # drained up to the CURRENT footer max for every partition
                if _committed_batches(checkpoint_dir) >= _offset_batches(checkpoint_dir):
                    break
            if time.time() - t0 > timeout_sec:
                raise TimeoutError(f"cht_changes drain incomplete after {timeout_sec}s")
            time.sleep(0.2)
    finally:
        q.stop()
    return _committed_batches(checkpoint_dir) - n0


def _dir_max_seq(feed_dir: str) -> int | None:
    hi: int | None = None
    for f in _feed_files(feed_dir):
        for _gmin, gmax, _rows in _file_seq_stats(f):
            if gmax is not None and (hi is None or gmax > hi):
                hi = gmax
    return hi


def _count_log(checkpoint_dir: str, sub: str) -> int:
    try:
        return len([f for f in os.listdir(os.path.join(checkpoint_dir, sub)) if f.isdigit()])
    except OSError:
        return 0


def _committed_batches(checkpoint_dir: str) -> int:
    return _count_log(checkpoint_dir, "commits")


def _offset_batches(checkpoint_dir: str) -> int:
    return _count_log(checkpoint_dir, "offsets")


def stream_offsets(checkpoint_dir: str) -> dict[int, int] | None:
    """Decode the newest committed per-partition seq cursors from a
    streaming query's OWN offset log (the ``couchdb_progress`` readback,
    but sourced from Spark's checkpoint instead of a side table)."""
    d = os.path.join(checkpoint_dir, "offsets")
    try:
        names = sorted((f for f in os.listdir(d) if f.isdigit()), key=int)
    except OSError:
        return None
    if not names:
        return None
    with open(os.path.join(d, names[-1])) as fh:
        last = [ln for ln in fh.read().splitlines() if ln.strip()][-1]
    return {int(k): int(v) for k, v in json.loads(last).items()}
