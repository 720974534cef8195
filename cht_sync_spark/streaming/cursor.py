"""Shared cursor contract for changelog consumers.

Every table-to-table consumer in the engine (mirror, SCD2 history,
additive/extremum IVM, distinct-count IVM, term/dedup/ANN indexes) owns a
cursor — ``consumer.<name>.version``, the last SOURCE snapshot version
fully applied — stored in the TARGET table's snapshot properties and
committed atomically with the derived data it describes (the
``couchdb_progress``-in-the-same-transaction rule, reference
importer.js:171-172). This mixin is the single home of that contract, so
a fix to the cursor rules lands once instead of once per consumer class.

Subclasses provide ``spark``/``source``/``target``/``name`` attributes
and a ``run_once()`` returning a result object or None when caught up.
"""

from __future__ import annotations

import time

from cht_sync_spark.tables.format import SnapshotTable


def start_version(source: SnapshotTable, position: int) -> int:
    """The changelog version a consumer tails from. A recorded cursor is
    authoritative. A FRESH cursor (position 0) starts after v1 — correct
    for a normal table, whose v1 is the empty CREATE snapshot — but a
    CLONE's v1 is DATA-BEARING (it holds the full cloned state), so
    silently starting after it would hand the consumer a target missing
    the entire cloned corpus with no error. Refuse loudly instead: the
    sound bootstrap on a clone is ``reseed()`` (which derives the target
    from current state and records the cursor), then tail."""
    if position >= 1:
        return position
    try:
        op = source.snapshot(1).operation
    except Exception:
        # v1 expired from history: a consumer this far behind cannot tail
        # incrementally anyway — changes() will refuse on the missing
        # snapshot and the recovery is the same reseed()
        return 1
    if op == "clone":
        raise ValueError(
            f"source table {source.path} is a clone: its v1 holds the full "
            "cloned state, which the tail-after-v1 consumer convention "
            "would silently skip — bootstrap this consumer with reseed() "
            "first, then tail"
        )
    return 1


class CursorConsumer:
    """Mixin: cursor read/probe, the pinned cursor-only advance, the drain
    loop, and reseed's foreign-cursor clearing. See module docstring."""

    spark: object
    source: SnapshotTable
    target: SnapshotTable
    name: str

    # ------------------------------------------------------------- cursor
    @property
    def _ckpt_key(self) -> str:
        return f"consumer.{self.name}.version"

    def position(self) -> int:
        """Last source snapshot version fully applied to the target
        (0 = nothing consumed; version 1 is the source's empty CREATE)."""
        v = self.target.snapshot().properties.get(self._ckpt_key)
        return int(v) if v is not None else 0

    def pending_versions(self) -> int:
        """Source snapshots not yet consumed — the consumer-side lag probe
        (reference S2 pending), O(1) driver metadata."""
        return max(0, self.source.current_version() - max(self.position(), 1))

    def _advance_cursor(self, tip: int) -> None:
        """Cursor-only commit, PINNED to the target version it read — an
        unpinned advance could rebase on top of a concurrent same-name
        consumer's commit and move the cursor BACKWARD (its range would
        then be re-applied: for additive state a double count).
        Monotonicity is re-checked against the pinned snapshot; a conflict
        retries through the caller's loop, which re-reads the cursor."""
        self._advance_cursors({self._ckpt_key: tip})

    def _advance_cursors(self, tips: dict[str, int]) -> None:
        """Multi-cursor form of :meth:`_advance_cursor` (one pinned commit
        advancing every named cursor that is behind) — for consumers with
        more than one input, e.g. the two-sided join."""
        tsnap = self.target.snapshot()
        props = {
            k: str(v)
            for k, v in tips.items()
            if v > int(tsnap.properties.get(k, 0))
        }
        if not props:
            return
        self.target.commit(
            add_files=[],
            properties_update=props,
            expected_version=tsnap.version,
        )

    def _foreign_cursor_deletions(self) -> dict[str, None]:
        """Property deletions for every OTHER consumer's cursor on this
        target — reseed's ownership-takeover rule: any foreign cursor is
        definitionally stale after a full rebuild, and properties inherit
        through every commit (including the overwrite), so a renamed
        consumer would otherwise be bricked by sole-owner fences forever."""
        return {
            k: None
            for k in self.target.snapshot().properties
            if k.startswith("consumer.") and k.endswith(".version") and k != self._ckpt_key
        }

    # ---------------------------------------------------------------- run
    def run(self, poll_seconds: float = 0.0, max_cycles: int | None = None) -> list:
        """Drain loop (the downstream S9 analogue): consume until caught
        up; with ``poll_seconds`` keep tailing until ``max_cycles``."""
        results: list = []
        cycles = 0
        while True:
            r = self.run_once()  # type: ignore[attr-defined]
            if r is not None:
                results.append(r)
            cycles += 1
            if max_cycles is not None and cycles >= max_cycles:
                return results
            if r is None:
                if poll_seconds <= 0:
                    return results
                time.sleep(poll_seconds)
