"""Commit-protocol abstraction for the ManagedTable log (VERDICT r5
item 4): the log's correctness rests on ONE storage primitive —
put-if-absent of an immutable version record — plus an atomic-overwrite
put for advisory artifacts (the ``_LATEST`` pointer hint, checkpoint
caches). POSIX filesystems provide the CAS via exclusive hard links;
S3-class object stores have no link or atomic rename, but modern ones
expose conditional puts (S3 ``If-None-Match: *``, GCS
``x-goog-if-generation-match: 0``, Azure Blob ETag preconditions) —
exactly the same primitive. This module extracts the contract so a
table's log can live on either, and ships an in-memory reference store
so the concurrency protocol is testable under object-store semantics
(no link, no rename, injected races).

Storage contract (what a real S3/GCS/ABFS adapter must guarantee):

- ``put_if_absent(key, data)`` is ATOMIC per key: of N concurrent
  callers exactly one returns True; the rest see False after a complete
  object exists. Readers never observe a partial object (native to
  object-store PUT).
- ``put(key, data)`` atomically replaces the whole object (plain PUT).
- ``get(key)`` returns the full object or None; read-after-write
  consistency for ``put_if_absent`` winners (S3 is strongly consistent
  since 2020; eventual-consistency stores need a consistency layer).

Data/DV/bloom parquet files do NOT go through this interface — they are
immutable uniquely-named objects whose writes cannot conflict; only the
log needs the CAS. Parquet checkpoint twins are local planning caches
and likewise bypass it.
"""

from __future__ import annotations

import os
import threading
import uuid
from abc import ABC, abstractmethod
from pathlib import Path


class CommitProtocol(ABC):
    """The storage primitives the commit log is built on. ``put_if_absent``
    is the correctness-critical CAS; everything else is reads and
    advisory overwrites."""

    @abstractmethod
    def put_if_absent(self, dest: Path, payload: str) -> bool:
        """Create ``dest`` with ``payload`` iff it does not exist; True on
        win. Losers must be able to read the winner's complete record."""

    @abstractmethod
    def put_text(self, dest: Path, payload: str) -> None:
        """Atomically overwrite ``dest`` with ``payload`` (pointer hints,
        checkpoint caches — never the versioned records themselves)."""

    @abstractmethod
    def read_text(self, path: Path) -> str:
        """Full contents of ``path``; FileNotFoundError when absent."""

    @abstractmethod
    def exists(self, path: Path) -> bool:
        """Whether ``path`` holds a complete object."""


class LinkCommitProtocol(CommitProtocol):
    """POSIX default: put-if-absent via an exclusive hard link from a
    fully-written temp file (the record appears atomically complete or
    not at all), overwrite via ``os.replace``. Requires a filesystem
    with hard-link support — NFSv3/FUSE/object-store mounts are NOT safe
    and fail with a clear error instead of corrupting commits."""

    def put_if_absent(self, dest: Path, payload: str) -> bool:
        dest = Path(dest)
        tmp = dest.parent / f".commit.tmp.{uuid.uuid4().hex}"
        tmp.write_text(payload)
        try:
            os.link(tmp, dest)
            return True
        except FileExistsError:
            return False
        except OSError as e:
            if dest.exists():  # racing writer won; link failed on exist
                return False
            raise OSError(
                f"cannot commit to {dest.parent}: the log directory must "
                f"live on a filesystem with POSIX hard-link support "
                f"(os.link failed: {e}); NFSv3/FUSE/object-store mounts "
                f"need a ConditionalPutCommitProtocol (see "
                f"sources/commit_protocol.py)"
            ) from e
        finally:
            tmp.unlink(missing_ok=True)

    def put_text(self, dest: Path, payload: str) -> None:
        dest = Path(dest)
        tmp = dest.parent / f".put.tmp.{uuid.uuid4().hex}"
        tmp.write_text(payload)
        os.replace(tmp, dest)

    def read_text(self, path: Path) -> str:
        return Path(path).read_text()

    def exists(self, path: Path) -> bool:
        return Path(path).exists()


class ConditionalPutCommitProtocol(CommitProtocol):
    """Object-store protocol: the CAS is the store's conditional put, the
    overwrite is a plain PUT (atomic by store contract), reads go through
    ``get``. ``store`` is any adapter satisfying the module-docstring
    contract — a real S3/GCS/ABFS client wrapper in production,
    :class:`InMemoryObjectStore` in tests."""

    def __init__(self, store):
        self.store = store

    def put_if_absent(self, dest: Path, payload: str) -> bool:
        return self.store.put_if_absent(str(dest), payload)

    def put_text(self, dest: Path, payload: str) -> None:
        self.store.put(str(dest), payload)

    def read_text(self, path: Path) -> str:
        v = self.store.get(str(path))
        if v is None:
            raise FileNotFoundError(path)
        return v

    def exists(self, path: Path) -> bool:
        return self.store.get(str(path)) is not None


class InMemoryObjectStore:
    """Reference conditional-put store (a test double for an S3-class
    bucket): thread-safe, no link, no rename — the CAS is a dict
    insert-if-absent under a lock, mirroring ``If-None-Match: *``
    semantics. ``before_cas`` is a race-injection hook invoked (outside
    the lock) before every conditional put, so tests can land a
    competing commit at the exact CAS window."""

    def __init__(self):
        self._objects: dict[str, str] = {}
        self._lock = threading.Lock()
        self.before_cas = None
        self.cas_attempts = 0

    def put_if_absent(self, key: str, data: str) -> bool:
        if self.before_cas is not None:
            self.before_cas(key)
        with self._lock:
            self.cas_attempts += 1
            if key in self._objects:
                return False
            self._objects[key] = data
            return True

    def put(self, key: str, data: str) -> None:
        with self._lock:
            self._objects[key] = data

    def get(self, key: str) -> str | None:
        with self._lock:
            return self._objects.get(key)


#: longest-prefix registry mapping table roots to protocols; everything
#: unregistered uses the POSIX link protocol.
_LINK = LinkCommitProtocol()
_REGISTRY: list[tuple[str, CommitProtocol]] = []
_REGISTRY_LOCK = threading.Lock()


def register_commit_protocol(root_prefix: "str | Path", protocol: CommitProtocol) -> None:
    """Route every table whose resolved root starts with ``root_prefix``
    through ``protocol`` (process-wide — the datasource commit hooks
    construct fresh handles, so per-instance wiring would not reach
    them). Pass the same prefix again to replace; see
    :func:`unregister_commit_protocol`."""
    key = str(Path(root_prefix).resolve())
    with _REGISTRY_LOCK:
        _REGISTRY[:] = [(p, pr) for p, pr in _REGISTRY if p != key]
        _REGISTRY.append((key, protocol))
        _REGISTRY.sort(key=lambda t: len(t[0]), reverse=True)


def unregister_commit_protocol(root_prefix: "str | Path") -> None:
    key = str(Path(root_prefix).resolve())
    with _REGISTRY_LOCK:
        _REGISTRY[:] = [(p, pr) for p, pr in _REGISTRY if p != key]


def protocol_for(root: Path) -> CommitProtocol:
    s = str(Path(root).resolve())
    with _REGISTRY_LOCK:
        for prefix, proto in _REGISTRY:
            if s == prefix or s.startswith(prefix + os.sep):
                return proto
    return _LINK
