"""File-level Bloom-filter skipping — the lake analogue of the reference's
secondary point-lookup indexes.

The reference keeps btree indexes on scattered landing/model columns so a
point predicate never scans the table (``couch2pg/src/setup.js:21-31``
indexes ``_deleted``/``saved_timestamp``/``source``; ``contacts.sql:7-11``
adds ``hash(uuid)``). A lakehouse gets range skipping for free from
min/max file stats, but min/max is useless for HIGH-CARDINALITY SCATTERED
values (a uuid lands inside almost every file's [lo, hi]). The standard
answer — parquet column bloom filters, Iceberg Puffin blobs, Delta bloom
indexes — is a tiny per-file Bloom bitset consulted at scan planning:
an equality probe skips every file whose bitset provably excludes the
value, with zero data I/O and no false *negatives* (a Bloom filter can
only over-keep, never over-prune, so results are exact by construction).

Design here (mirrors :mod:`format`'s manifest conventions):

- **Sidecar, not manifest inline** (Iceberg stores blooms in Puffin files
  next to manifests for the same reason): bitsets are ~KB per file per
  column — inlining them would bloat every manifest parse on the hot
  commit path. One immutable JSON sidecar under ``_manifests/`` maps
  ``file path -> {col -> base64 bitset}``; the current sidecar is named by
  the ``bloom.sidecar`` table property, loaded lazily and only when an
  equality filter touches a bloom column.
- **Maintenance-time, not write-time** (Iceberg's ANALYZE / Delta's
  separate index compute): :meth:`SnapshotTable.build_blooms` runs ONE
  Spark job over live files missing a bitset and commits a metadata-only
  ``replace`` snapshot (changelog-invisible — no logical change). The hot
  ingest append path stays untouched; files written after the last build
  simply have no bitset and are conservatively kept.
- **Both sides hash in Python** — the builder (Arrow ``mapInPandas``
  batches, partial bitsets OR-merged driver-side: zero shuffle) and the
  prober (driver-side at plan time) share :func:`positions`, so there is
  no cross-engine hash-parity risk. md5 → two 64-bit halves →
  Kirsch-Mitzenmacher double hashing (h1 + i*h2), the standard k-probe
  construction.

Column types are restricted to strings and integers: their Python
``str()`` rendering is unambiguous, so builder and prober can never
disagree on the hashed bytes. (Floats/timestamps have no canonical text
form across engines; range stats already serve them.)

Sizing: with n distinct values per file, m bits and k probes the false-
positive rate is ~(1 - e^(-kn/m))^k — the default 32768 bits / 6 probes
gives <1% FP up to n≈3400, and ~9% at n≈8192. Size ``bits`` to the
per-FILE distinct count (corpus NDV / buckets / files-per-bucket), not
the corpus NDV.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np

DEFAULT_BITS = 32768
DEFAULT_K = 6

# Spark simpleString type names whose values a bloom may cover.
ALLOWED_TYPES = ("string", "tinyint", "smallint", "int", "bigint")


def render_value(v: object) -> bytes:
    """Canonical hashed bytes for a value — shared by builder and prober.
    Raises TypeError for anything without an unambiguous rendering."""
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, bool):  # bool is an int subclass; pointless in a bloom
        raise TypeError("bloom filters do not cover boolean values")
    if isinstance(v, (int, np.integer)):
        return str(int(v)).encode("ascii")
    raise TypeError(f"bloom filters cover only string/integer values, got {type(v).__name__}")


def positions(raw: bytes, bits: int, k: int) -> np.ndarray:
    """The k probe positions for one value (Kirsch-Mitzenmacher double
    hashing over the md5 halves — k independent-enough probes from one
    128-bit hash)."""
    d = hashlib.md5(raw).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd: full-period stride
    return np.array([(h1 + i * h2) % bits for i in range(k)], dtype=np.int64)


def empty_words(bits: int) -> np.ndarray:
    return np.zeros(bits // 64, dtype=np.uint64)


def set_positions(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))


def might_contain(words: np.ndarray, pos: np.ndarray) -> bool:
    """False => the value is PROVABLY absent from the file."""
    return bool(
        np.all((words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1))
    )


def words_to_b64(words: np.ndarray) -> str:
    return base64.b64encode(words.tobytes()).decode("ascii")


def b64_to_words(b64: str) -> np.ndarray:
    return np.frombuffer(base64.b64decode(b64), dtype=np.uint64).copy()


def merge_b64(a: str | None, b: str) -> str:
    """OR-combine two partial bitsets (builder partials from different
    Arrow partitions of the same file)."""
    if a is None:
        return b
    wa, wb = b64_to_words(a), b64_to_words(b)
    return words_to_b64(np.bitwise_or(wa, wb))


def series_bitset(values, bits: int, k: int) -> str | None:
    """Bitset b64 for one pandas Series slice (one file, one column) —
    nulls skipped; returns None when nothing non-null was seen. Hashing
    runs over the DISTINCT values only (the md5 loop is the cost).

    The builder casts every bloom column to STRING on the Spark side
    before the Arrow crossing (a nullable int64 would otherwise arrive
    as float64 and lose exactness above 2^53 — a silently-over-pruning
    bloom); Spark's long->string cast renders exactly like the prober's
    ``str(int(v))``, so values here are always strings."""
    s = values.dropna()
    if len(s) == 0:
        return None
    words = empty_words(bits)
    for v in s.unique():
        set_positions(words, positions(render_value(v), bits, k))
    return words_to_b64(words)
