"""Cross-table consistent reads: snapshot isolation by epoch alignment.

A pipeline commit touches SEVERAL tables — the landing table, each model
table, run-stats — each with its own atomic snapshot, but there is no
multi-table transaction (Iceberg has the same gap: readers align related
tables by snapshot timestamps, approximately). This engine can do better
than timestamps because every data commit already carries its **epoch
marker** in the snapshot properties, written atomically with the data
(SURVEY §2.1 S6: landing ``epoch.<marker>``, model tables ``model.epoch``,
streaming ``epoch.stream``) — the exactly-once machinery doubles as a
cross-table alignment vector:

- :func:`epoch_of` — the epoch a table version had committed through.
- :func:`epoch_frontier` — the largest epoch ALL given tables have
  reached: the consistent frontier (a lagging model pins it back).
- :func:`read_consistent` — for each table, the latest version whose
  committed epoch ≤ E, read as of that version: every returned DataFrame
  reflects exactly the events of epochs ≤ E, none newer — a multi-table
  snapshot-isolation read, exact rather than timestamp-approximate.

Correctness rests on two properties the engine already maintains:
epoch markers are MONOTONE per table (batches commit in epoch order;
replays skip, never regress), and maintenance commits (compaction =
``replace``) inherit the parent's properties, so they keep the same
epoch and stay transparently readable. Cost: a driver-side walk over
cached snapshot manifests from the tip backwards — O(versions since E),
no Spark jobs until the reads themselves; bounded by snapshot retention
(``expire_snapshots`` limits how far back E may reach, same contract as
incremental reads).

Reference basis: the reference has no such read — couch2pg and dbt run
asynchronously and a Postgres reader sees whatever half-updated state is
current (dashboards over mid-run models are simply wrong until the next
dbt pass). This is the Spark-first repair of that gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cht_sync_spark.tables.format import SnapshotTable

# auto-detected marker keys, most specific first (model tables carry
# model.epoch; landing/streaming tables carry exactly one epoch.* key
# per maintaining pipeline)
_MODEL_MARKER = "model.epoch"
_EPOCH_PREFIX = "epoch."


def _detect_marker(table: SnapshotTable) -> str:
    props = table.snapshot().properties
    if _MODEL_MARKER in props:
        return _MODEL_MARKER
    cands = sorted(k for k in props if k.startswith(_EPOCH_PREFIX))
    if len(cands) == 1:
        return cands[0]
    if not cands:
        raise ValueError(
            f"{table.path}: no epoch marker property found — the table is not "
            "maintained by an epoch-marking pipeline (pass marker= explicitly "
            "if it uses a custom namespace)"
        )
    raise ValueError(
        f"{table.path}: multiple epoch markers {cands} (concurrent multi-source "
        "namespaces) — pass marker= to choose the alignment vector"
    )


def epoch_of(
    table: SnapshotTable, version: int | None = None, marker: str | None = None
) -> int | None:
    """The epoch ``table`` had committed through at ``version`` (default
    tip), or None if that version predates the first epoch commit."""
    marker = marker or _detect_marker(table)
    v = table.snapshot(version).properties.get(marker)
    return int(v) if v is not None else None


def epoch_frontier(
    tables: dict[str, SnapshotTable], markers: dict[str, str] | None = None
) -> int:
    """The largest epoch EVERY table has reached — the consistent frontier.
    A lagging component (a model mid-catch-up, a killed stream) pins the
    frontier back, exactly like a Kafka consumer group's committed offset."""
    markers = markers or {}
    es = []
    for name, t in tables.items():
        e = epoch_of(t, marker=markers.get(name))
        if e is None:
            raise ValueError(f"{name} ({t.path}): no epoch committed yet")
        es.append(e)
    return min(es)


def version_at_epoch(
    table: SnapshotTable, epoch: int, marker: str | None = None
) -> int:
    """Latest version whose committed epoch ≤ ``epoch``. Walks the cached
    snapshot manifests from the tip backwards (markers are monotone, so the
    first version at or under the target is the answer); raises if every
    retained version is already past ``epoch`` (the history needed has been
    expired — same retention contract as incremental reads)."""
    marker = marker or _detect_marker(table)
    v = table.current_version()
    while v >= 1:
        props = table.snapshot(v).properties
        ev = props.get(marker)
        # a marker-LESS version is ambiguous, not epoch-0: properties
        # inherit through every commit, so markers only vanish BELOW the
        # first marked commit — pre-pipeline data whose epoch alignment is
        # unknowable (it may reflect arbitrarily late source state, e.g. a
        # bootstrap full-load). Skip it; raising at the bottom beats
        # silently returning a torn read.
        if ev is not None and int(ev) <= epoch:
            return v
        v -= 1
    raise ValueError(
        f"{table.path}: no retained version with committed epoch <= {epoch} "
        "(expired by snapshot retention, or the table's history predates "
        "its first epoch-marked commit)"
    )


def read_consistent(
    tables: dict[str, SnapshotTable],
    epoch: int | None = None,
    markers: dict[str, str] | None = None,
    drop_tombstones: bool = False,
) -> dict[str, tuple[int, DataFrame]]:
    """Snapshot-isolation read across ``tables``: each comes back pinned to
    its latest version with committed epoch ≤ ``epoch`` (default: the
    current :func:`epoch_frontier`), so every DataFrame reflects exactly
    the events of epochs ≤ E. Versions are returned alongside so callers
    can audit or re-pin (e.g. ``table.tag()`` the aligned set).

    An explicit ``epoch`` ABOVE the frontier is rejected: a lagging table
    cannot serve it, and pinning the others forward anyway would hand back
    exactly the torn multi-table read this function exists to prevent."""
    markers = markers or {}
    frontier = epoch_frontier(tables, markers)
    if epoch is None:
        epoch = frontier
    elif epoch > frontier:
        lag = {
            name: epoch_of(t, marker=markers.get(name))
            for name, t in tables.items()
        }
        raise ValueError(
            f"epoch {epoch} is past the consistent frontier {frontier} — "
            f"lagging table(s): "
            f"{ {n: e for n, e in lag.items() if e is not None and e < epoch} } "
            "(wait for them to catch up, or read at the frontier)"
        )
    out: dict[str, tuple[int, DataFrame]] = {}
    for name, t in tables.items():
        v = version_at_epoch(t, epoch, marker=markers.get(name))
        out[name] = (v, t.read_current(version=v, drop_tombstones=drop_tombstones))
    return out
