"""FileIO — the storage seam under :class:`SnapshotTable`'s metadata plane.

``SnapshotTable`` historically assumed a POSIX filesystem: ``O_EXCL``
commit claims, ``rename`` finalization, hard-link clones, ``os.walk``
vacuum. None of those primitives exist in that form on the object stores
where a 100 TB corpus actually lives (S3/GCS/ABFS). This module narrows
every metadata-plane storage touch to ONE small interface with the POSIX
implementation behind it, and documents — per operation — the object-store
mapping an S3 implementation must honor. The DATA plane (parquet
read/write) is Spark's: on a cluster it flows through the Hadoop
FileSystem connectors (``s3a://`` etc.) and never touches this seam; the
seam carries snapshots, manifests, tags/branches, sidecars, clone
linking and vacuum listing.

## The S3 contract (what a cloud implementation must provide)

| operation            | local impl                                   | object-store mapping |
|----------------------|----------------------------------------------|----------------------|
| ``publish_atomic``   | ``O_CREAT|O_EXCL`` claim, tmp write+fsync, ``rename`` over the claim, dir fsync | **conditional PUT** (`If-None-Match: *`, S3 Nov-2024+ / GCS `x-goog-if-generation-match: 0`) of the full body in ONE request — the claim and the finalize collapse into one atomic op; on 412 Precondition Failed raise ``FileExistsError``. No multi-step window exists, so the local zero-size-claim visibility (see below) simply never occurs. |
| ``write_text_atomic``| tmp write+fsync+``rename`` (overwrite ok)    | plain PUT — object stores are read-after-write consistent and PUT is all-or-nothing; no tmp file, no rename. |
| ``read_text``        | ``open().read()``                            | GET. Immutable objects (manifests, committed snapshots) may be CDN/edge cached; the caller's caches key on immutable names. |
| ``list_dir``         | ``os.listdir`` (``[]`` if missing)           | LIST with `prefix=<dir>/` + `delimiter=/`. S3 LIST is strongly consistent since Dec-2020, which the commit protocol relies on (a committed snapshot must be visible to the next ``_versions`` listing). |
| ``size`` / ``mtime`` | ``os.path.getsize/getmtime``                 | HEAD (`Content-Length`, `Last-Modified`). ``mtime`` feeds only vacuum's grace heuristics — advisory, never correctness. |
| ``walk_files``       | ``os.walk``                                  | paginated LIST under the prefix, grouped into pseudo-directories. Directories are synthetic: ``remove_dir`` is a no-op there. |
| ``remove`` / ``remove_dir`` / ``remove_tree`` | ``os.remove/rmdir/shutil.rmtree`` | DELETE / no-op (no real dirs) / batched DeleteObjects under the prefix. |
| ``link_or_copy``     | ``os.link``, copy fallback                   | server-side COPY (`x-amz-copy-source`) — same O(metadata) cost a hard link buys locally; 5 GiB+ objects use multipart copy. |
| ``mkdirs``           | ``os.makedirs``                              | no-op (prefixes need no creation). |
| ``exists``           | ``os.path.exists``                           | HEAD == 200. |

Atomicity note (the one that matters): the ONLY operation the commit
protocol needs to be atomic-and-exclusive is ``publish_atomic`` of the
snapshot JSON — everything else (data files, manifests, sidecars) is
written to fresh uuid names before any snapshot references them, so
half-written garbage is invisible and vacuum-collectable. That is
Iceberg's own commit discipline, and it is exactly the shape S3
conditional PUT / GCS generation-match preconditions provide. On stores
without conditional writes, a DynamoDB/ZooKeeper-style lock table or a
catalog service takes this one operation over — still behind this seam.

Durability note: the local implementation fsyncs file contents AND the
parent directory before a snapshot can reference them (POSIX does not
order metadata ops across power loss). Object stores give this for free:
a 200 on PUT is the durability acknowledgment.

In-flight-claim visibility (local only): between the ``O_EXCL`` claim and
the finalizing ``rename`` the snapshot file exists with size 0;
``SnapshotTable._versions`` filters zero-size entries and
``current_version`` briefly waits on them. Object-store implementations
have no such window — the filter is simply never triggered (``size``
of a committed object is its body length).
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Iterator


def _fsync_dir(d: str) -> None:
    """fsync a directory so a just-renamed entry survives power loss."""
    fd = os.open(d, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class FileIO:
    """Interface; see module docstring for the per-op object-store
    contract. All paths are absolute strings (local) or full object keys
    (cloud). Subclass and pass to :class:`SnapshotTable` via ``io=``."""

    # ---- commit protocol -------------------------------------------------
    def publish_atomic(self, path: str, text: str) -> None:
        """Create ``path`` with ``text`` iff absent, atomically; raise
        ``FileExistsError`` if it exists (the loser of a commit race)."""
        raise NotImplementedError

    # ---- plain metadata IO ----------------------------------------------
    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text_atomic(self, path: str, text: str) -> None:
        """All-or-nothing write, overwrite allowed (tags, sidecars)."""
        raise NotImplementedError

    # ---- namespace -------------------------------------------------------
    def mkdirs(self, d: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def list_dir(self, d: str) -> list[str]:
        """Entry NAMES in ``d``; empty list if ``d`` does not exist."""
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError

    def size(self, path: str) -> int | None:
        """Bytes, or None if the path vanished (concurrent removal)."""
        raise NotImplementedError

    def mtime(self, path: str) -> float | None:
        """Advisory last-modified (vacuum grace heuristics only)."""
        raise NotImplementedError

    def walk_files(self, root: str) -> Iterator[tuple[str, list[str], list[str]]]:
        """``os.walk(root, topdown=False)`` shape; object stores emit the
        same shape from one paginated LIST."""
        raise NotImplementedError

    # ---- removal ---------------------------------------------------------
    def remove(self, path: str) -> None:
        raise NotImplementedError

    def remove_dir(self, d: str) -> None:
        """Remove an EMPTY directory; raises OSError if repopulated
        concurrently (vacuum relies on that). No-op on object stores."""
        raise NotImplementedError

    def remove_tree(self, d: str) -> None:
        raise NotImplementedError

    # ---- clone -----------------------------------------------------------
    def link_or_copy(self, src: str, dst: str) -> None:
        """O(metadata) aliasing of an immutable file: hard link locally,
        server-side COPY on object stores (both sides own their ref;
        vacuum of either table never corrupts the other because data
        files are immutable and removal is per-name)."""
        raise NotImplementedError

    def copy(self, src: str, dst: str) -> None:
        """Force a byte copy (deep clone / sidecar copy) — never a link:
        the migration form for moving snapshots across filesystems. On
        object stores this and :meth:`link_or_copy` coincide (COPY)."""
        raise NotImplementedError


class LocalFileIO(FileIO):
    """POSIX implementation — the exact protocol SnapshotTable always used
    (O_EXCL claims, fsync'd tmp+rename, hard-link clone), now behind the
    seam. Stateless; one shared instance is the default for every table."""

    def publish_atomic(self, path: str, text: str) -> None:
        # claim: a concurrent writer racing to the same name loses here.
        # The claim is an empty file until the rename lands — readers
        # filter zero-size entries (module docstring).
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            tmp = path + f".tmp.{uuid.uuid4().hex}"
            with open(tmp, "w") as fh:
                fh.write(text)
                fh.flush()
                os.fsync(fh.fileno())
            os.rename(tmp, path)  # atomic replace of the claimed file
            _fsync_dir(os.path.dirname(path))  # commit is crash-durable
        finally:
            os.close(fd)

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(text)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, path)
        _fsync_dir(os.path.dirname(path))

    def mkdirs(self, d: str) -> None:
        os.makedirs(d, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list_dir(self, d: str) -> list[str]:
        try:
            return os.listdir(d)
        except FileNotFoundError:
            return []

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def size(self, path: str) -> int | None:
        try:
            return os.path.getsize(path)
        except OSError:
            return None

    def mtime(self, path: str) -> float | None:
        try:
            return os.path.getmtime(path)
        except OSError:
            return None

    def walk_files(self, root: str) -> Iterator[tuple[str, list[str], list[str]]]:
        return os.walk(root, topdown=False)

    def remove(self, path: str) -> None:
        os.remove(path)

    def remove_dir(self, d: str) -> None:
        os.rmdir(d)

    def remove_tree(self, d: str) -> None:
        shutil.rmtree(d, ignore_errors=True)

    def link_or_copy(self, src: str, dst: str) -> None:
        import errno

        try:
            os.link(src, dst)
        except OSError as e:
            if e.errno != errno.EXDEV:
                raise
            shutil.copy2(src, dst)  # cross-filesystem fallback only

    def copy(self, src: str, dst: str) -> None:
        shutil.copy2(src, dst)


LOCAL_IO = LocalFileIO()
