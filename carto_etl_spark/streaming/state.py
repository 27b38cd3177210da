"""Shared crash-safe state-store recipes for the streaming operators.

Five modules (frequency, cardinality, quantile, lshindex, export) grew the
same three primitives independently, and review found two crash-window bugs
in one of the hand-rolled copies (r4 ADVICE: lshindex's missing ``_recover``
and non-staged appends) — exactly the class of bug a single shared
implementation prevents.  The recipes:

**Snapshot state** (``SnapshotState``): the whole state lives under ONE
``current/`` directory replaced atomically per batch by the two-rename
promote (``current`` -> ``current.old``, ``current.tmp`` -> ``current``).
``recover()`` — called first by every reader and writer — heals the only
crash window (between the two renames) by restoring ``current.old``.
Because every state table (sketch cells, meta, the applied-batch ledger)
lives inside the one promoted directory, no crash point can leave a
half-applied batch: the state is always a consistent tuple.  Used by the
count-min, HLL and quantile trackers.

**Content-addressed ledger** (``SnapshotState.ledger_*``): operators whose
merge is NOT idempotent under replay (counting; n_total) store the
fingerprints of applied batches inside the snapshot and skip a batch whose
fingerprint is already present.  Content addressing (not ``batch_id``)
survives checkpoint resets, where batch ids restart and an id-keyed ledger
would double-count.  Idempotent merges (HLL register max, id-keyed
appends) need no ledger — don't pay for one.

**Append-only state** (``AppendOnlyState``): an ever-growing parquet tree
of committed batch subdirectories.  Appends write to a staging directory
OUTSIDE the read path and commit with one ``os.rename`` into
``<root>/batch-<token>/`` — a crash mid-write leaves only an orphaned
staging dir, swept by ``recover()``, never a partially visible batch.
Compaction rewrites the tree and promotes with the same two-rename pair as
snapshots.  Used by the LSH bucket index.

**_SUCCESS-gated batch dirs** (``complete_dirs`` / ``is_complete``): a file
SINK needs no ledger at all — write each batch to a content-addressed
directory, let Spark's committer drop ``_SUCCESS`` last, skip the batch if
``_SUCCESS`` already exists, and have readers list only complete dirs.
``mode("overwrite")`` on replay heals partial crash leftovers.  Used by the
streaming JSONL export.

Single-writer discipline throughout: the ``foreachBatch`` handler is the
only writer; ``recover()`` would race a concurrent appender, which these
stores do not support (Structured Streaming guarantees serialized batch
execution per query).

**Path contract (r8 verdict #6 / r9 #2).**  The classes above rely on
directory ``os.rename`` being atomic and on ``os.path`` semantics —
guarantees object stores do not provide (S3/GCS have no rename; "rename"
is copy+delete with a visible window; ``os.path.exists`` on an
``s3a://`` path silently returns False, so a state store would quietly
report "fresh" and restart from scratch).  Construction therefore
DISPATCHES on the target: a plain path runs the POSIX rename protocol; an
object-store target (a URI with a registered
``objectstore.register_object_store_factory`` adapter, or an
``(ObjectStore, prefix)`` tuple) runs the RENAME-FREE commit-log protocol
(``ObjectSnapshotState`` / ``ObjectAppendOnlyState`` below: immutable
token-addressed generation prefixes + one conditional-put commit object
as the only visibility gate — see streaming/objectstore.py).  A URI with
no registered adapter still fails loud at the constructor, never quiet
at recovery time.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from carto_etl_spark.streaming.objectstore import (
    CommitLog,
    resolve_object_target,
)

_LEDGER = "applied"

#: Any URI scheme (s3a://, gs://, hdfs://, file://, …) — these stores are
#: os.rename/os.path based and must fail loud rather than silently treat
#: an object-store state as absent.
_URI_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def _require_posix_path(state_dir: str, who: str) -> str:
    if _URI_SCHEME_RE.match(str(state_dir)):
        raise ValueError(
            f"{who} requires a POSIX-local state directory (atomic "
            f"directory rename); got the URI {state_dir!r}. Object stores "
            "have no atomic rename and os.path would silently report the "
            "state missing — mount the state on a POSIX filesystem "
            "instead (see carto_etl_spark/streaming/state.py module docs)."
        )
    return str(state_dir)


def _staged_row_count(staging: str, stop_after: int | None = None) -> int:
    """Total row count of a staged local parquet directory from file
    footers only (no Spark job; ``_``/``.``-prefixed marker files are
    skipped).  ``stop_after`` short-circuits once that many rows are
    known — the empty-append probe needs only "zero or not"."""
    import pyarrow.parquet as pq

    total = 0
    for dirpath, dirnames, filenames in os.walk(staging):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        for name in filenames:
            if name.startswith(("_", ".")) or not name.endswith(".parquet"):
                continue
            total += pq.ParquetFile(
                os.path.join(dirpath, name)
            ).metadata.num_rows
            if stop_after is not None and total >= stop_after:
                return total
    return total


def _restore_old(path: str) -> None:
    """Heal the two-rename promote's crash window: ``path`` missing but
    ``path.old`` intact means the crash hit between the renames."""
    old = path + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)


def _promote(tmp: str, path: str) -> None:
    """The two-rename promote: ``path`` -> ``path.old``, ``tmp`` -> ``path``,
    then drop ``path.old``.  Any crash point leaves either the old state
    reachable (directly or via ``_restore_old``) or the new state complete."""
    old = path + ".old"
    if os.path.exists(old):  # leftover from a crash after the final rename
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


class SnapshotState:
    """Atomically replaced state directory + optional applied-batch ledger.

    Layout: ``<state_dir>/current/<table>/*.parquet`` for each named table,
    plus ``<state_dir>/current/applied/`` when the ledger is used.  The
    write protocol is: stage every table of the NEW state under
    ``begin_tmp()``, then ``promote()`` once.

    Constructing with an object-store target — a URI whose scheme has a
    registered adapter (``objectstore.register_object_store_factory``) or
    an ``(ObjectStore, prefix)`` tuple — returns ``ObjectSnapshotState``,
    the same semantics on the rename-free commit-log protocol.  A URI with
    no registered adapter still fails loud (the r9 guard)."""

    def __new__(cls, state_dir):
        if cls is SnapshotState and resolve_object_target(state_dir):
            return object.__new__(ObjectSnapshotState)
        return object.__new__(cls)

    def __init__(self, state_dir: str):
        self.state_dir = _require_posix_path(state_dir, "SnapshotState")
        self.current = os.path.join(self.state_dir, "current")

    def recover(self) -> None:
        _restore_old(self.current)

    def exists(self) -> bool:
        self.recover()
        return os.path.exists(self.current)

    def table_path(self, table: str) -> str:
        return os.path.join(self.current, table)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        self.recover()
        return spark.read.parquet(self.table_path(table))

    # -- driver-side Arrow fast path (sketch-sized tables only) ----------
    #
    # Snapshot tables are SKETCH-sized by contract (k centroids, <=cap
    # quantile samples, CMS cells, a ledger of one md5 per batch): reading
    # or writing them through a distributed Spark job costs a full
    # job-launch round-trip (~100 ms at local[32], a scheduler round-trip
    # on a cluster) per table PER BATCH, which dominates the streaming
    # recipes' per-batch cost (r10 measure: apply_kmeans_batch was ~8 jobs,
    # ~6 of them state I/O on KB-sized tables).  On a POSIX state the
    # driver reads/writes the parquet directly via pyarrow — zero jobs,
    # same files, same schema.  The object-store subclasses override these
    # with the Spark path (state may live behind any registered adapter).

    def read_arrow(self, spark: SparkSession, table: str):
        """The committed ``table`` as a pyarrow.Table, without a Spark job
        on POSIX state dirs.  pyarrow skips ``_``/``.``-prefixed files
        (Spark's _SUCCESS markers) by default."""
        import pyarrow.parquet as pq

        self.recover()
        return pq.read_table(self.table_path(table))

    def write_arrow(self, spark: SparkSession, tmp: str, table, arrow_table) -> None:
        """Stage ``arrow_table`` as ``<tmp>/<table>`` parquet, without a
        Spark job on POSIX state dirs.  Layout-compatible with
        ``spark.read.parquet`` (one part file in a directory)."""
        import pyarrow.parquet as pq

        dest = os.path.join(tmp, table)
        os.makedirs(dest, exist_ok=True)
        pq.write_table(arrow_table, os.path.join(dest, "part-00000.parquet"))

    def begin_tmp(self) -> str:
        """Staging root for the replacement state (cleared if a previous
        crash left one behind).  Write each table under
        ``os.path.join(tmp, name)`` then call ``promote()``."""
        tmp = self.current + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        return tmp

    def promote(self) -> None:
        _promote(self.current + ".tmp", self.current)

    # -- content-addressed ledger (non-idempotent merges only) ----------

    def ledger_fps(self, spark: SparkSession) -> list[str]:
        """All applied-batch fingerprints ([] for a fresh state)."""
        if not self.exists():
            return []
        return self.read_arrow(spark, _LEDGER).column("fp").to_pylist()

    def ledger_contains(self, spark: SparkSession, fp: str) -> bool:
        if not self.exists():
            return False
        return fp in self.ledger_fps(spark)

    def write_ledger(
        self, spark: SparkSession, tmp: str, fps: list[str]
    ) -> None:
        """Stage the ledger table into a ``begin_tmp()`` root (ledger rows
        are sketch-sized: one md5 per applied batch)."""
        import pyarrow as pa

        self.write_arrow(
            spark, tmp, _LEDGER,
            pa.table({"fp": pa.array(list(fps), pa.string())}),
        )


class AppendOnlyState:
    """Append-only parquet tree with staged atomic appends + recoverable
    compaction.  ``root_name`` is the committed read path under
    ``state_dir``; staging dirs live beside it, outside the read path.

    Like ``SnapshotState``, an object-store target dispatches to the
    rename-free implementation (``ObjectAppendOnlyState``)."""

    def __new__(cls, state_dir, root_name: str = "batches"):
        if cls is AppendOnlyState and resolve_object_target(state_dir):
            return object.__new__(ObjectAppendOnlyState)
        return object.__new__(cls)

    def __init__(self, state_dir: str, root_name: str = "batches"):
        self.state_dir = _require_posix_path(state_dir, "AppendOnlyState")
        self.root = os.path.join(self.state_dir, root_name)

    def recover(self) -> None:
        _restore_old(self.root)
        if os.path.isdir(self.state_dir):
            for name in os.listdir(self.state_dir):
                if name.startswith("staging-"):
                    shutil.rmtree(
                        os.path.join(self.state_dir, name),
                        ignore_errors=True,
                    )

    def exists(self) -> bool:
        """True when at least one committed batch subdir or compacted data
        file is present."""
        self.recover()
        if not os.path.isdir(self.root):
            return False
        return any(
            not name.startswith(("_", ".")) for name in os.listdir(self.root)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """The committed state: compacted part files at the root plus
        per-batch subdirs, one recursive listing (hidden ``_``/``.`` files
        are skipped by Spark's lister)."""
        self.recover()
        return spark.read.option("recursiveFileLookup", "true").parquet(
            self.root
        )

    def append(self, rows: DataFrame) -> bool:
        """Stage ``rows`` and commit with one rename; empty appends commit
        nothing (Spark writes a schema-only part file for an empty frame —
        probe the staged local parquet rather than count the plan twice).
        Returns True when a batch dir was committed."""
        self.recover()
        token = uuid.uuid4().hex
        staging = os.path.join(self.state_dir, f"staging-{token}")
        rows.write.mode("overwrite").parquet(staging)
        # emptiness from the staged parquet FOOTERS (driver-side metadata
        # read, no second Spark job over the staged data)
        if _staged_row_count(staging, stop_after=1) == 0:
            shutil.rmtree(staging, ignore_errors=True)
            return False
        os.makedirs(self.root, exist_ok=True)
        os.rename(staging, os.path.join(self.root, f"batch-{token}"))
        return True

    def compact(self, rewritten: DataFrame) -> None:
        """Replace the whole tree with ``rewritten`` (the caller chooses the
        layout — e.g. range-partitioned and sorted so row-group stats prune
        the per-batch scans) via the two-rename promote."""
        tmp = self.root + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        rewritten.write.mode("overwrite").parquet(tmp)
        _promote(tmp, self.root)


# -- object-store implementations (rename-free commit protocol) ----------


class ObjectSnapshotState(SnapshotState):
    """SnapshotState semantics on the objectstore.py commit protocol: each
    promoted state is an immutable ``gen-<token>/`` prefix; ONE conditional
    put of a commit object makes it current; readers follow the latest
    commit.  There is no crash window, so ``recover()`` is a no-op — a
    crash before the commit leaves only invisible orphans (swept by
    ``gc()``, which ``promote()`` runs with retain=2).

    The ledger methods are inherited unchanged: the applied-batch table
    lives inside the committed generation exactly as it lives inside
    ``current/`` on POSIX, so replayed batches are recognized the same
    way."""

    def __init__(self, state_dir):
        self.store, self.prefix = resolve_object_target(state_dir)
        self.state_dir = state_dir
        self._staged_token: str | None = None

    # -- protocol plumbing ----------------------------------------------

    def _log(self) -> CommitLog:
        return CommitLog(self.store, self.prefix)

    def _gen(self, token: str) -> str:
        return f"{self.prefix}/gen-{token}"

    def _current_gen(self) -> str | None:
        head = self._log().latest()
        return None if head is None else head[1]["gen"]

    # -- SnapshotState surface -------------------------------------------

    def recover(self) -> None:
        pass  # rename-free: there is no crash window to heal

    def exists(self) -> bool:
        return self._current_gen() is not None

    def table_path(self, table: str) -> str:
        gen = self._current_gen()
        if gen is None:
            # same failure mode as the POSIX class on a fresh state: a
            # missing-path read error from Spark, not a silent empty frame
            return self.store.spark_path(
                f"{self._gen('absent')}/{table}"
            )
        return self.store.spark_path(f"{self._gen(gen)}/{table}")

    def read_arrow(self, spark: SparkSession, table: str):
        """Object-store states read through Spark (the store may be any
        registered adapter; only Spark's reader speaks its scheme)."""
        return self.read(spark, table).toArrow()

    def write_arrow(self, spark: SparkSession, tmp: str, table, arrow_table) -> None:
        """Object-store staging prefixes are store URIs — write through
        Spark (createDataFrame on a pyarrow Table preserves the schema)."""
        spark.createDataFrame(arrow_table).coalesce(1).write.parquet(
            f"{tmp}/{table}"
        )

    def begin_tmp(self) -> str:
        token = uuid.uuid4().hex
        self._staged_token = token
        return self.store.spark_path(self._gen(token))

    def promote(self) -> None:
        if self._staged_token is None:
            raise RuntimeError("promote() without begin_tmp()")
        token, self._staged_token = self._staged_token, None
        self._log().commit({"gen": token})
        self.gc()

    def gc(self, retain: int = 2) -> None:
        """Drop generations no commit in the newest ``retain`` references,
        then the superseded commit objects themselves.  retain=2 keeps the
        previous generation readable for any in-flight reader that
        resolved the old commit just before a promote."""
        log = self._log()
        keys = sorted(self.store.list(f"{self.prefix}/commits"))
        live_payloads = keys[-retain:] if retain else []
        live = set()
        for key in live_payloads:
            data = self.store.get(key)
            if data is not None:
                live.add(json.loads(data.decode("utf-8"))["gen"])
        staged = self._staged_token
        for key in self.store.list(self.prefix):
            rel = key[len(self.prefix) + 1 :]
            if not rel.startswith("gen-"):
                continue
            token = rel.split("/", 1)[0][len("gen-") :]
            if token not in live and token != staged:
                self.store.delete(key)
        log.gc(keep_last=retain)


class ObjectAppendOnlyState(AppendOnlyState):
    """AppendOnlyState semantics on the commit protocol: the latest commit
    object's manifest lists the batch/compaction prefixes that ARE the
    state.  Appends write an immutable ``batch-<token>/`` prefix then
    commit ``manifest + [that prefix]``; compaction writes
    ``compacted-<token>/`` and commits a one-element manifest.  Crash
    before a commit orphans invisible data (``gc()``); the commit itself
    is one atomic object creation, so there is no partially applied
    append and ``recover()`` is a no-op."""

    def __init__(self, state_dir, root_name: str = "batches"):
        self.store, self.prefix = resolve_object_target(state_dir)
        self.state_dir = state_dir
        self.root_name = root_name

    def _log(self) -> CommitLog:
        return CommitLog(self.store, f"{self.prefix}/{self.root_name}")

    def _manifest(self) -> list[str]:
        head = self._log().latest()
        return [] if head is None else list(head[1]["prefixes"])

    def recover(self) -> None:
        pass

    def exists(self) -> bool:
        return bool(self._manifest())

    def read(self, spark: SparkSession) -> DataFrame:
        paths = [self.store.spark_path(p) for p in self._manifest()]
        return spark.read.parquet(*paths)

    def append(self, rows: DataFrame) -> bool:
        spark = rows.sparkSession
        token = uuid.uuid4().hex
        data_prefix = f"{self.prefix}/{self.root_name}/batch-{token}"
        path = self.store.spark_path(data_prefix)
        rows.write.mode("overwrite").parquet(path)
        if spark.read.parquet(path).isEmpty():
            self.store.delete_prefix(data_prefix)
            return False
        self._log().commit({"prefixes": self._manifest() + [data_prefix]})
        self.gc()
        return True

    def compact(self, rewritten: DataFrame) -> None:
        token = uuid.uuid4().hex
        data_prefix = f"{self.prefix}/{self.root_name}/compacted-{token}"
        rewritten.write.mode("overwrite").parquet(
            self.store.spark_path(data_prefix)
        )
        self._log().commit({"prefixes": [data_prefix]})
        self.gc()

    def gc(self, retain: int = 2) -> None:
        """Drop data prefixes referenced by none of the newest ``retain``
        manifests, then superseded commit objects."""
        root = f"{self.prefix}/{self.root_name}"
        keys = sorted(self.store.list(f"{root}/commits"))
        live: set[str] = set()
        for key in keys[-retain:] if retain else []:
            data = self.store.get(key)
            if data is not None:
                live.update(json.loads(data.decode("utf-8"))["prefixes"])
        for key in self.store.list(root):
            rel = key[len(root) + 1 :]
            if rel.startswith("commits/"):
                continue
            data_prefix = f"{root}/{rel.split('/', 1)[0]}"
            if data_prefix not in live:
                self.store.delete(key)
        self._log().gc(keep_last=retain)


# -- _SUCCESS-gated batch dirs (file sinks) ------------------------------


class BatchSinkTarget:
    """Dispatching facade for ``_SUCCESS``-gated batch-dir sinks (the
    streaming JSONL export): path construction, marker probes and marker
    writes that run on os.path for plain paths and on the store API for
    object-store targets.  Spark's committer writes ``_SUCCESS`` last on
    both (s3a committers included), so the completeness gate is the same
    marker either way; only the probe mechanics differ."""

    def __init__(self, root):
        self._t = resolve_object_target(root)
        if self._t is None:
            _require_posix_path(root, "BatchSinkTarget")
        self.root = root

    def spark_path(self, *parts: str) -> str:
        if self._t:
            store, prefix = self._t
            return store.spark_path("/".join((prefix,) + parts))
        return os.path.join(self.root, *parts)

    def file_exists(self, *parts: str) -> bool:
        if self._t:
            store, prefix = self._t
            return store.get("/".join((prefix,) + parts)) is not None
        return os.path.exists(os.path.join(self.root, *parts))

    def touch(self, *parts: str) -> None:
        """Create an empty marker object/file; already-present (a replayed
        handler) is success."""
        if self._t:
            store, prefix = self._t
            store.put("/".join((prefix,) + parts), b"")
            return
        path = os.path.join(self.root, *parts)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "a"):
            pass

    def complete_batches(self, *parts: str) -> list[str]:
        """Names of the complete (``_SUCCESS``-bearing) batch directories
        under ``<root>/<parts...>``, sorted."""
        if self._t:
            store, prefix = self._t
            base = "/".join((prefix,) + parts)
            return sorted(
                {
                    key[len(base) + 1 : -len("/_SUCCESS")]
                    for key in store.list(base)
                    if key.endswith("/_SUCCESS")
                    and "/" not in key[len(base) + 1 : -len("/_SUCCESS")]
                }
            )
        base = os.path.join(self.root, *parts)
        return sorted(
            os.path.basename(d)
            for d in glob.glob(os.path.join(base, "*"))
            if is_complete(d)
        )


def is_complete(batch_dir: str) -> bool:
    """A batch directory whose write finished — Spark's committer writes
    ``_SUCCESS`` last, so its presence gates visibility."""
    return os.path.exists(os.path.join(batch_dir, "_SUCCESS"))


def complete_dirs(root: str) -> list[str]:
    """All complete batch directories under ``root`` (sorted for
    deterministic reads); partial crash leftovers are invisible.  For an
    object-store target the listing goes through the store API (Spark's
    committer still writes ``_SUCCESS`` last on s3a-class filesystems, so
    the same marker gates visibility); plain paths use glob/os.path."""
    target = resolve_object_target(root)
    if target is not None:
        store, prefix = target
        # depth-1 children only, like the glob branch below: a _SUCCESS
        # nested deeper (a partitioned sub-write) is not a batch dir
        done = sorted(
            key[: -len("/_SUCCESS")]
            for key in store.list(prefix)
            if key.endswith("/_SUCCESS")
            and "/" not in key[len(prefix) + 1 : -len("/_SUCCESS")]
        )
        return [store.spark_path(d) for d in done]
    _require_posix_path(root, "complete_dirs")
    return sorted(d for d in glob.glob(os.path.join(root, "*")) if is_complete(d))
