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

**POSIX-ONLY CONTRACT (r8 verdict #6).**  Every primitive here relies on
directory ``os.rename`` being atomic and on ``os.path`` semantics —
guarantees object stores do not provide (S3/GCS have no rename; "rename"
is copy+delete with a visible window).  Worse than a crash window: on an
``s3a://``/``gs://`` path ``os.path.exists`` simply returns False, so a
state store would silently report "fresh" and restart from scratch.
Construction therefore REJECTS any URI-schemed state dir; on a real
cluster, point the state at a POSIX-mounted path (HDFS via NFS gateway,
EFS/Filestore, local NVMe + checkpoint upload) or replace this store
with a commit-marker protocol on the object store's conditional-put
primitive.  The guard makes the contract fail loud at the constructor,
not quiet at recovery time.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from carto_etl_spark.session import local_df

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
    ``begin_tmp()``, then ``promote()`` once."""

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
        return [
            r["fp"] for r in self.read(spark, _LEDGER).collect()
        ]

    def ledger_contains(self, spark: SparkSession, fp: str) -> bool:
        if not self.exists():
            return False
        applied = self.read(spark, _LEDGER)
        return applied.where(applied.fp == fp).limit(1).count() > 0

    def write_ledger(
        self, spark: SparkSession, tmp: str, fps: list[str]
    ) -> None:
        """Stage the ledger table into a ``begin_tmp()`` root (ledger rows
        are sketch-sized: one md5 per applied batch)."""
        local_df(spark, [(f,) for f in fps], "fp string").coalesce(
            1
        ).write.parquet(os.path.join(tmp, _LEDGER))


class AppendOnlyState:
    """Append-only parquet tree with staged atomic appends + recoverable
    compaction.  ``root_name`` is the committed read path under
    ``state_dir``; staging dirs live beside it, outside the read path."""

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
        spark = rows.sparkSession
        token = uuid.uuid4().hex
        staging = os.path.join(self.state_dir, f"staging-{token}")
        rows.write.mode("overwrite").parquet(staging)
        if spark.read.parquet(staging).isEmpty():
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


# -- _SUCCESS-gated batch dirs (file sinks) ------------------------------


def is_complete(batch_dir: str) -> bool:
    """A batch directory whose write finished — Spark's committer writes
    ``_SUCCESS`` last, so its presence gates visibility."""
    return os.path.exists(os.path.join(batch_dir, "_SUCCESS"))


def complete_dirs(root: str) -> list[str]:
    """All complete batch directories under ``root`` (sorted for
    deterministic reads); partial crash leftovers are invisible.  Same
    POSIX-only contract as the state classes (glob/os.path based)."""
    _require_posix_path(root, "complete_dirs")
    return sorted(d for d in glob.glob(os.path.join(root, "*")) if is_complete(d))
