"""Rename-free commit protocol for streaming state on object stores.

The POSIX state recipes (streaming/state.py) are built on atomic directory
``os.rename`` — a primitive S3/GCS-class object stores do not have ("rename"
is copy+delete with a visible window, and ``os.path`` calls silently report
URI paths missing).  r9 made that contract fail loud at the constructor;
this module is the other half: the same snapshot / append-only semantics
re-expressed in the primitives object stores DO guarantee:

* **atomic single-object PUT** — an object is never partially visible;
* **conditional put** (PUT-if-absent: S3 ``If-None-Match: *``, GCS
  ``x-goog-if-generation-match: 0``) — at most one writer creates a key;
* **strongly consistent LIST/GET** (S3 since 2020, GCS always).

The protocol (the Delta/Iceberg-style commit-log shape):

1. Every state generation (snapshot) or batch (append) is written under an
   IMMUTABLE token-addressed prefix (``gen-<token>/``, ``batch-<token>/``)
   that no reader knows about yet.  Data-plane writes need no atomicity at
   all — visibility is gated entirely by step 2.
2. One commit object ``commits/<n>`` is then created with a CONDITIONAL
   put.  Its payload is the manifest: which prefixes ARE the state.
   Readers list ``commits/``, take the highest ``n``, and read exactly the
   prefixes its manifest names.
3. There is no crash window: a crash before the commit leaves orphaned
   (invisible) data swept by ``gc()``; the commit itself is one atomic
   object creation.  ``recover()`` is therefore a no-op — the property the
   two-rename POSIX promote can only approximate.

Replay safety is unchanged from the POSIX recipes: non-idempotent merges
keep their content-addressed ledger INSIDE the committed generation, so a
replayed micro-batch is recognized and skipped at the recipe layer.

The data plane is deliberately delegated: ``ObjectStore.spark_path()``
returns the path Spark reads/writes a prefix at.  On a real cluster that
is the ``s3a://...`` URI itself (executors write direct, no driver
round-trip — state stays any size), with a direct/magic-style committer so
the write is PUT-only; on the test double it is the backing directory.
Correctness never depends on the data plane's atomicity — only the commit
object gates visibility.

``LocalObjectStore`` is the test double: a directory-backed store whose
API has NO rename and NO overwrite — conditional put is ``O_CREAT|O_EXCL``,
the one atomic-create primitive POSIX and object stores share.  The
crash-window tests in tests/test_objectstore.py drive every protocol step
against it.

A real adapter implements the four ``ObjectStore`` methods with its SDK and
registers a factory for its scheme::

    register_object_store_factory("s3a", lambda uri: (S3Store(bucket), key))

after which every streaming recipe accepts ``s3a://bucket/path`` state
dirs unchanged — the constructors in streaming/state.py dispatch here.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from typing import Callable

_URI_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")


class ObjectStore:
    """Minimal object-store surface the commit protocol needs.  All keys
    are ``/``-separated relative strings; none of these methods may be
    implemented with rename."""

    def put(self, key: str, data: bytes, if_none_match: bool = True) -> bool:
        """Atomically create ``key``.  With ``if_none_match`` (the only
        mode the protocol uses for control-plane objects) the put FAILS —
        returns False — when the key already exists."""
        raise NotImplementedError

    def get(self, key: str) -> bytes | None:
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        """All keys under ``prefix`` (recursive), sorted."""
        raise NotImplementedError

    def delete(self, key: str) -> None:
        """Delete one key; deleting a missing key is a no-op."""
        raise NotImplementedError

    def spark_path(self, prefix: str) -> str:
        """The path Spark reads/writes this prefix at (the data plane).
        Real adapters return their URI (``s3a://bucket/prefix``); the
        local double returns the backing directory."""
        raise NotImplementedError

    # -- derived helpers ------------------------------------------------

    def delete_prefix(self, prefix: str) -> None:
        for key in self.list(prefix):
            self.delete(key)


class LocalObjectStore(ObjectStore):
    """Directory-backed emulation with object-store semantics ONLY: atomic
    create-if-absent (``O_CREAT|O_EXCL``), get, recursive list, delete.
    No method renames or overwrites anything — if the protocol needed
    either, the tests against this double would fail."""

    def __init__(self, backing_dir: str):
        self.backing_dir = os.path.abspath(backing_dir)
        os.makedirs(self.backing_dir, exist_ok=True)

    #: staging dir for atomic publishes — invisible to list()
    _TMP = ".tmp"

    def _fs(self, key: str) -> str:
        path = os.path.normpath(os.path.join(self.backing_dir, key))
        if path != self.backing_dir and not path.startswith(
            self.backing_dir + os.sep
        ):
            raise ValueError(f"key escapes the store root: {key!r}")
        return path

    def put(self, key: str, data: bytes, if_none_match: bool = True) -> bool:
        """Atomic publish: the payload is written COMPLETELY to a hidden
        staging file first, then the key appears via one ``os.link`` —
        link(2) atomically creates the new name and fails with EEXIST if
        it already exists, which is exactly conditional-put semantics and
        never exposes a partially written object (a reader either sees no
        key or the full payload, matching a real store's atomic PUT).
        link is name CREATION, not a move — the no-rename discipline
        holds."""
        path = self._fs(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp_dir = os.path.join(self.backing_dir, self._TMP)
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(tmp_dir, uuid.uuid4().hex)
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            if not if_none_match:
                # unconditional put = replace: a real store's PUT swaps the
                # object atomically; locally, drop the old name first (the
                # protocol never uses this arm for control-plane objects)
                try:
                    os.remove(path)
                except FileNotFoundError:
                    pass
            try:
                os.link(tmp, path)
            except FileExistsError:
                return False
            return True
        finally:
            os.remove(tmp)

    def get(self, key: str) -> bytes | None:
        try:
            with open(self._fs(key), "rb") as fh:
                return fh.read()
        except (FileNotFoundError, IsADirectoryError):
            return None

    def list(self, prefix: str) -> list[str]:
        root = self._fs(prefix)
        if not os.path.isdir(root):
            return [prefix] if os.path.isfile(root) else []
        out = []
        for dirpath, dirnames, filenames in os.walk(root):
            if dirpath == self.backing_dir and self._TMP in dirnames:
                dirnames.remove(self._TMP)  # staging files are not objects
            rel = os.path.relpath(dirpath, self.backing_dir)
            for name in filenames:
                out.append(os.path.join(rel, name).replace(os.sep, "/"))
        return sorted(out)

    def delete(self, key: str) -> None:
        try:
            os.remove(self._fs(key))
        except FileNotFoundError:
            pass

    def spark_path(self, prefix: str) -> str:
        return self._fs(prefix)


class CommitLog:
    """The single visibility gate: numbered commit objects under
    ``<prefix>/commits/``; the highest number wins.  A commit's payload is
    a JSON manifest naming the data prefixes that ARE the state.

    ``commit()`` creates ``commits/<n+1>`` with a conditional put — under
    the recipes' single-writer discipline (Structured Streaming serializes
    ``foreachBatch``) a False return means a replayed handler lost to its
    own earlier attempt, which callers treat as success-already."""

    def __init__(self, store: ObjectStore, prefix: str):
        self.store = store
        self.prefix = prefix.rstrip("/")
        self._commits = f"{self.prefix}/commits"

    @staticmethod
    def _num(key: str) -> int:
        return int(os.path.basename(key))

    def latest(self) -> tuple[int, dict] | None:
        """Highest-numbered commit whose object is still readable.  A key
        can vanish between list and get (racing gc of OLD commits), so walk
        downward past missing ones instead of crashing; the newest commit
        is never gc'd, so the walk terminates at it in practice."""
        keys = sorted(self.store.list(self._commits), key=self._num)
        for key in reversed(keys):
            data = self.store.get(key)
            if data is not None:
                return self._num(key), json.loads(data.decode("utf-8"))
        return None

    def commit(self, payload: dict) -> bool:
        """Create ``commits/<n+1>`` with a conditional put.  The key is
        EXACTLY the zero-padded number — no unique suffix — so a replayed
        or crash-recovered writer attempting the same n genuinely collides
        and gets False (= its earlier attempt already committed), and
        latest()/gc agree on ordering by construction.  S3-class stores
        condition on the full key, which is what this is."""
        head = self.latest()
        n = (head[0] if head else 0) + 1
        key = f"{self._commits}/{n:020d}"
        return self.store.put(
            key, json.dumps(payload, sort_keys=True).encode("utf-8")
        )

    def all_payloads(self) -> list[dict]:
        out = []
        for key in self.store.list(self._commits):
            data = self.store.get(key)
            if data is not None:
                out.append(json.loads(data.decode("utf-8")))
        return out

    def gc(self, keep_last: int = 2) -> None:
        """Drop commit objects beyond the newest ``keep_last`` (their data
        prefixes are collected by the state classes' own gc)."""
        keys = sorted(self.store.list(self._commits), key=self._num)
        for key in keys[:-keep_last] if keep_last else keys:
            self.store.delete(key)


# -- scheme registry (the constructors in state.py dispatch through this) --

_FACTORIES: dict[str, Callable[[str], tuple[ObjectStore, str]]] = {}


def register_object_store_factory(
    scheme: str, factory: Callable[[str], tuple[ObjectStore, str]]
) -> None:
    """Map a URI scheme to ``factory(uri) -> (store, prefix)``.  After
    registration, every streaming state constructor accepts
    ``<scheme>://...`` state dirs and runs the rename-free protocol."""
    _FACTORIES[scheme.lower()] = factory


def unregister_object_store_factory(scheme: str) -> None:
    _FACTORIES.pop(scheme.lower(), None)


def resolve_object_target(state_dir) -> tuple[ObjectStore, str] | None:
    """(store, prefix) when ``state_dir`` is an object-store target —
    either an explicit ``(ObjectStore, prefix)`` tuple or a URI whose
    scheme has a registered factory; None for plain paths; raises for a
    URI with NO registered adapter (the r9 fail-loud guard, now with the
    registration escape hatch)."""
    if (
        isinstance(state_dir, tuple)
        and len(state_dir) == 2
        and isinstance(state_dir[0], ObjectStore)
    ):
        return state_dir[0], str(state_dir[1]).strip("/")
    if not isinstance(state_dir, str):
        return None
    m = _URI_SCHEME_RE.match(state_dir)
    if not m:
        return None
    scheme = m.group(1).lower()
    factory = _FACTORIES.get(scheme)
    if factory is None:
        raise ValueError(
            f"state dir {state_dir!r} is an object-store URI but no "
            f"ObjectStore adapter is registered for scheme "
            f"{scheme!r}. POSIX state stores rely on atomic directory "
            "rename, which object stores do not provide — register an "
            "adapter (carto_etl_spark.streaming.objectstore."
            "register_object_store_factory) to run the rename-free "
            "commit protocol, or point the state at a POSIX-mounted path."
        )
    return factory(state_dir)
