"""Transactional parquet table: an atomic-commit, snapshot-isolated sink.

The plain ``TargetTable`` (jobs.py) rewrites via tmp-dir swap: crash-narrowed
but still a multi-step filesystem mutation, and a reader that lists the
directory mid-swap can see a transient state.  At 100 TB you want what
Delta/Iceberg provide — an append-only data area plus a commit log whose
single atomic rename IS the transaction.  This module is that core, built
from scratch on stdlib + Spark (same spirit, none of their formats):

- data files live under ``<path>/data/<commit-uuid>/part-*.parquet`` and are
  NEVER mutated or renamed after being written;
- a commit is one manifest ``<path>/_log/<version 8-digit>.json`` holding the
  FULL file list of the snapshot (like an Iceberg manifest list; fine at this
  scale because files, not rows, bound its size);
- publishing a commit is ``os.link(tmp, final)`` — atomic, and it FAILS if
  the version already exists, which is exactly optimistic concurrency
  control: on conflict re-read the latest snapshot and retry the commit
  (appends compose; overwrites win-last like Delta's);
- readers resolve the latest manifest once and read its file list —
  snapshot isolation for the whole query plan, regardless of concurrent
  commits or later vacuums;
- ``vacuum()`` deletes data files unreferenced by the retained manifests;
- manifests can carry per-file min/max stats for chosen columns
  (``stats_columns``), collected in one Spark job per commit;
  ``read_where`` prunes files against those ranges before Spark ever plans
  the scan — Delta/Iceberg-style data skipping.

Append = write files + commit(old ∪ new).  Overwrite = write files +
commit(new).  The keyed update/delete jobs compose: read() is a snapshot, the
rewritten result lands as one overwrite commit, and a crash at ANY point
leaves the previous snapshot fully readable.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
import warnings
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from carto_etl_spark.session import local_df


class SchemaEvolutionError(ValueError):
    """An append's schema conflicts with the table's (same column, different
    type).  Adding columns is allowed; changing a column's type is not."""


class CommitConflict(RuntimeError):
    """Another writer committed this version first (retried internally)."""


class TransactionalTable:
    """Drop-in for ``TargetTable`` (same append/overwrite/read/exists surface)
    with atomic commits and snapshot-isolated reads."""

    def __init__(self, spark: SparkSession, path: str | Path,
                 max_commit_retries: int = 10,
                 stats_columns: list[str] | None = None,
                 manifest_warn_files: int = 100_000):
        self.spark = spark
        self.path = Path(path)
        self.log_dir = self.path / "_log"
        self.data_dir = self.path / "data"
        self.max_commit_retries = max_commit_retries
        #: columns whose per-file min/max land in the manifest (data skipping)
        self.stats_columns = list(stats_columns or [])
        #: the JSON manifest (file list + per-file stats) lives in driver
        #: memory; past this many files each commit warns to ``compact()``.
        #: ~100k files x ~200 bytes/entry ~ 20 MB of manifest — the practical
        #: driver ceiling before compaction is mandatory, not optional.
        self.manifest_warn_files = manifest_warn_files
        # interface parity with TargetTable; hive-partitioned layout is the
        # plain table's concern — here pruning comes from per-commit files
        self.partition_by: list[str] = []

    # -- log protocol --------------------------------------------------------

    def _versions(self) -> list[int]:
        if not self.log_dir.is_dir():
            return []
        out = []
        for p in self.log_dir.iterdir():
            if p.suffix == ".json" and p.stem.isdigit():
                out.append(int(p.stem))
        return sorted(out)

    def version(self) -> int:
        """Latest committed version, 0 when the table is empty/uncreated."""
        vs = self._versions()
        return vs[-1] if vs else 0

    def _manifest_path(self, version: int) -> Path:
        return self.log_dir / f"{version:08d}.json"

    def _read_manifest(self, version: int) -> dict:
        return json.loads(self._manifest_path(version).read_text())

    def snapshot_files(self, version: int | None = None) -> list[str]:
        """Absolute data-file paths of a snapshot (default: latest)."""
        v = self.version() if version is None else version
        if v == 0:
            return []
        return [str(self.path / f) for f in self._read_manifest(v)["files"]]

    def _commit(self, files: list[str], base_version: int,
                idempotency_key: str | None = None,
                stats: dict | None = None,
                schema_json: str | None = None) -> int:
        """Atomically publish ``files`` as version base+1; on a version
        collision the caller re-reads state and retries (optimistic CC)."""
        self.log_dir.mkdir(parents=True, exist_ok=True)
        version = base_version + 1
        manifest = {
            "version": version,
            "files": sorted(files),
            "timestamp": time.time(),
        }
        if stats:
            manifest["stats"] = stats
        if schema_json is not None:
            manifest["schema"] = schema_json
        if idempotency_key is not None:
            manifest["idempotency_key"] = idempotency_key
        tmp = self.log_dir / f".tmp-{uuid.uuid4().hex}.json"
        tmp.write_text(json.dumps(manifest))
        try:
            # link(2) is atomic and errors if the target exists: the first
            # writer of this version wins, losers get CommitConflict
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as exc:
            raise CommitConflict(f"version {version} already committed") from exc
        finally:
            tmp.unlink(missing_ok=True)
        return version

    # -- data writes ---------------------------------------------------------

    def _write_files(self, df: DataFrame) -> list[str]:
        """Write df as immutable parquet files, return table-relative paths."""
        commit_id = uuid.uuid4().hex[:12]
        out_dir = self.data_dir / commit_id
        df.write.parquet(str(out_dir))
        return [
            str(p.relative_to(self.path))
            for p in out_dir.iterdir()
            if p.suffix == ".parquet"
        ]

    def _collect_stats(self, rel_files: list[str]) -> dict:
        """Per-file min/max for the tracked stat columns, computed in ONE
        Spark job over the just-written files (grouped by input_file_name) —
        never a job per file."""
        if not self.stats_columns or not rel_files:
            return {}
        from pyspark.sql import functions as F

        paths = [str(self.path / f) for f in rel_files]
        df = self.spark.read.parquet(*paths)
        json_safe = {"tinyint", "smallint", "int", "bigint", "float",
                     "double", "string", "boolean"}
        types = dict(df.dtypes)
        cols = [
            c for c in self.stats_columns
            if types.get(c) in json_safe  # decimals/dates skipped (not JSON)
        ]
        if not cols:
            return {}
        aggs = []
        for c in cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        rows = (
            df.groupBy(F.input_file_name().alias("__file")).agg(*aggs).collect()
        )
        # input_file_name returns a URI (file://...); key both sides by the
        # table-relative tail (commit_dir/filename) for an O(1) dict lookup —
        # the former endswith scan over every known file was O(files^2) per
        # commit, quadratic driver work at millions of files.
        def _tail(p: str) -> tuple[str, str]:
            parts = p.rstrip("/").split("/")
            return (parts[-2], parts[-1]) if len(parts) >= 2 else ("", parts[-1])

        by_tail = {_tail(f): f for f in rel_files}
        stats: dict = {}
        for r in rows:
            rel = by_tail.get(_tail(r["__file"]))
            if rel is None:
                continue
            stats[rel] = {
                c: [r[f"min_{c}"], r[f"max_{c}"]] for c in cols
            }
        return stats

    def _merge_schema_json(self, base_json: str | None, new_json: str | None) -> str | None:
        """Add-column schema evolution: the union of table and commit fields
        in table order, new fields appended in commit order.  A field present
        in both with a DIFFERENT type raises — silent coercion at 100 TB is
        how tables rot.  (Delta's additive default, without its type
        widening.)"""
        if new_json is None:
            return base_json
        if base_json is None:
            return new_json
        from pyspark.sql.types import StructType

        base = StructType.fromJson(json.loads(base_json))
        new = StructType.fromJson(json.loads(new_json))
        by_name = {f.name.lower(): f for f in base.fields}
        merged = list(base.fields)
        for f in new.fields:
            prev = by_name.get(f.name.lower())
            if prev is None:
                merged.append(f)
            elif prev.dataType != f.dataType:
                raise SchemaEvolutionError(
                    f"column {f.name!r}: table has {prev.dataType.simpleString()}, "
                    f"append has {f.dataType.simpleString()}"
                )
        return StructType(merged).json()

    def _commit_with_retry(self, new_files: list[str], mode: str,
                           idempotency_key: str | None = None,
                           schema_json: str | None = None) -> int:
        new_stats = self._collect_stats(new_files)
        for _ in range(self.max_commit_retries):
            base = self.version()
            if idempotency_key is not None and self._key_committed(
                idempotency_key
            ):
                return base  # this unit of work already landed (e.g. retry)
            stats = dict(new_stats)
            schema = schema_json
            if mode == "append":
                current_manifest = self._read_manifest(base) if base else {}
                files = current_manifest.get("files", []) + new_files
                stats = {**current_manifest.get("stats", {}), **stats}
                schema = self._merge_schema_json(
                    current_manifest.get("schema"), schema_json
                )
            else:
                files = new_files
            if len(files) > self.manifest_warn_files:
                warnings.warn(
                    f"manifest for {self.path} tracks {len(files)} files "
                    f"(> {self.manifest_warn_files}); driver-side manifest "
                    "work grows linearly with the file count — run "
                    ".compact() to fold small commits",
                    RuntimeWarning,
                    stacklevel=3,
                )
            try:
                return self._commit(files, base, idempotency_key, stats, schema)
            except CommitConflict:
                continue  # someone else committed; recompute against them
        raise CommitConflict(
            f"gave up after {self.max_commit_retries} commit attempts"
        )

    def _key_committed(self, key: str) -> bool:
        return any(
            self._read_manifest(v).get("idempotency_key") == key
            for v in self._versions()
        )

    # -- TargetTable surface -------------------------------------------------

    def exists(self) -> bool:
        return self.version() > 0

    def append(self, df: DataFrame, idempotency_key: str | None = None) -> None:
        """Append one commit.  ``idempotency_key`` makes a retried unit of
        work (a replayed streaming micro-batch, a re-run ingest chunk) a
        no-op if a commit bearing the same key already exists — the basis of
        the exactly-once streaming sink (streaming/jobs.py).  Keys are
        checked against the full log; a sequential retrier (Structured
        Streaming replays batches one at a time) therefore never
        double-commits."""
        if idempotency_key is not None and self._key_committed(idempotency_key):
            return
        self._commit_with_retry(
            self._write_files(df), "append", idempotency_key,
            schema_json=df.schema.json(),
        )

    def overwrite(self, df: DataFrame) -> None:
        self._commit_with_retry(
            self._write_files(df), "overwrite", schema_json=df.schema.json()
        )

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read: the plan pins the manifest's file list, so later
        commits/vacuums of OTHER snapshots never change this DataFrame.
        ``version`` time-travels to an older snapshot.

        The scan is pinned to the MANIFEST's schema (the running union of
        committed schemas): files from commits predating an added column
        null-fill it, and no mergeSchema footer sweep is needed — the log
        already knows the answer, which is the Delta/Iceberg read path."""
        files = self.snapshot_files(version)
        if not files:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        schema_json = self._read_manifest(
            version if version is not None else self.version()
        ).get("schema")
        reader = self.spark.read
        if schema_json is not None:
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(schema_json)))
        return reader.parquet(*files)

    def read_where(self, column: str, lo=None, hi=None) -> DataFrame:
        """Data-skipping read: files whose manifest [min,max] range for
        ``column`` cannot intersect [lo, hi] are dropped BEFORE Spark plans
        the scan — at 100 TB this is the difference between listing a few
        files and scanning a table, exactly Delta/Iceberg file pruning.
        Files without stats (untracked column, pre-stats commits, all-null)
        are conservatively kept; the residual filter is applied either way,
        so results are always exact."""
        v = self.version()
        if v == 0:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        manifest = self._read_manifest(v)
        stats = manifest.get("stats", {})
        kept = []
        for rel in manifest["files"]:
            rng = stats.get(rel, {}).get(column)
            if rng is not None and rng[0] is not None:
                fmin, fmax = rng
                if lo is not None and fmax < lo:
                    continue
                if hi is not None and fmin > hi:
                    continue
            kept.append(str(self.path / rel))
        from pyspark.sql import functions as F

        if not kept:
            # all files pruned: empty frame with the table schema
            df = self.read().limit(0)
        else:
            reader = self.spark.read
            schema_json = manifest.get("schema")
            if schema_json is not None:
                from pyspark.sql.types import StructType

                reader = reader.schema(
                    StructType.fromJson(json.loads(schema_json))
                )
            df = reader.parquet(*kept)
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(column) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(column) <= F.lit(hi))
        return df.filter(cond)

    def delete_where(self, column: str, lo=None, hi=None) -> int:
        """Copy-on-write range delete: rows with ``lo <= column <= hi`` are
        removed by REWRITING only the files whose manifest stats can contain
        them; every other file carries into the new snapshot untouched.  At
        100 TB a delete touching one day of data rewrites that day, not the
        table.  NULLs never match a range, so they always survive.  One
        atomic commit (OCC-retried); old snapshots stay time-travelable.
        Returns the new version.

        Pruning needs ``column`` in ``stats_columns``; without stats every
        file is conservatively rewritten (still correct, just COW over the
        full snapshot)."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        for _ in range(self.max_commit_retries):
            base = self.version()
            if base == 0:
                raise FileNotFoundError(f"no committed snapshot at {self.path}")
            manifest = self._read_manifest(base)
            stats = manifest.get("stats", {})
            touched, untouched = [], []
            for rel in manifest["files"]:
                rng = stats.get(rel, {}).get(column)
                if rng is not None and rng[0] is not None:
                    fmin, fmax = rng
                    if (lo is not None and fmax < lo) or (
                        hi is not None and fmin > hi
                    ):
                        untouched.append(rel)
                        continue
                touched.append(rel)
            if not touched:
                return base  # nothing can match: zero rewrite, zero commit
            reader = self.spark.read
            schema_json = manifest.get("schema")
            if schema_json is not None:
                reader = reader.schema(
                    StructType.fromJson(json.loads(schema_json))
                )
            df = reader.parquet(*[str(self.path / r) for r in touched])
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col(column) >= F.lit(lo))
            if hi is not None:
                cond = cond & (F.col(column) <= F.lit(hi))
            survivors = df.filter(~F.coalesce(cond, F.lit(False)))
            new_files = self._write_files(survivors)
            new_stats = self._collect_stats(new_files)
            files = untouched + new_files
            kept_stats = {
                rel: s for rel, s in stats.items() if rel in set(untouched)
            }
            try:
                return self._commit(
                    files, base, None, {**kept_stats, **new_stats}, schema_json
                )
            except CommitConflict:
                continue  # a concurrent commit landed: recompute against it
        raise CommitConflict(
            f"gave up after {self.max_commit_retries} delete attempts"
        )

    def upsert(self, updates: DataFrame, key: str) -> int:
        """Copy-on-write MERGE keyed on ``key``: existing rows with a
        matching key are replaced, unmatched update rows are inserted, and
        only files whose manifest ``key`` stats intersect the updates' key
        range are rewritten — everything else carries into the new snapshot
        verbatim.  Update rows are last-wins deduplicated on the key first;
        NULL-key update rows are pure inserts (nothing to match).  One
        OCC-retried atomic commit; additive schema evolution applies (an
        update set may add columns).  Returns the new version."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        updates = updates.dropDuplicates([key])
        bounds = updates.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).collect()[0]
        lo, hi = bounds["lo"], bounds["hi"]
        for _ in range(self.max_commit_retries):
            base = self.version()
            manifest = self._read_manifest(base) if base else {}
            stats = manifest.get("stats", {})
            touched, untouched = [], []
            for rel in manifest.get("files", []):
                rng = stats.get(rel, {}).get(key)
                if rng is not None and rng[0] is not None and lo is not None:
                    fmin, fmax = rng
                    if fmax < lo or fmin > hi:
                        untouched.append(rel)
                        continue
                touched.append(rel)
            schema_json = self._merge_schema_json(
                manifest.get("schema"), updates.schema.json()
            )
            target_schema = StructType.fromJson(json.loads(schema_json))
            aligned_updates = updates.select(
                *[
                    F.col(f.name).cast(f.dataType)
                    if f.name in updates.columns
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in target_schema.fields
                ]
            )
            if touched:
                old = self.spark.read.schema(target_schema).parquet(
                    *[str(self.path / r) for r in touched]
                )
                survivors = old.join(
                    updates.select(key).where(F.col(key).isNotNull()),
                    on=key,
                    how="left_anti",
                )
                combined = survivors.unionByName(aligned_updates)
            else:
                combined = aligned_updates
            new_files = self._write_files(combined)
            new_stats = self._collect_stats(new_files)
            files = untouched + new_files
            kept_stats = {
                rel: s for rel, s in stats.items() if rel in set(untouched)
            }
            try:
                return self._commit(
                    files, base, None, {**kept_stats, **new_stats}, schema_json
                )
            except CommitConflict:
                continue
        raise CommitConflict(
            f"gave up after {self.max_commit_retries} upsert attempts"
        )

    def diff(self, from_version: int,
             to_version: int | None = None) -> DataFrame:
        """Row-level change feed between two snapshots: every row present in
        ``to_version`` but not ``from_version`` tagged ``_change='insert'``,
        every row present in ``from_version`` but not ``to_version`` tagged
        ``_change='delete'`` (an update surfaces as a delete+insert pair —
        the schema-agnostic CDF shape; join the two sides on a key to fold
        them into updates).  Bag semantics: duplicate rows diff by
        multiplicity.

        Scale contract: manifests are compared FILE-level first — a file
        carried unchanged between the snapshots is never opened, so the cost
        is proportional to the churned files (what the commits touched), not
        the table.  Rewritten-but-unchanged rows inside churned files cancel
        in the exceptAll, whose shuffle is likewise bounded by churn.  Both
        sides read under the newer manifest's schema (evolution is additive,
        so older files null-fill — a row whose only change is a null-filled
        added column does NOT spuriously appear)."""
        tv = self.version() if to_version is None else to_version
        if tv == 0 and from_version == 0:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        from_files = set(self.snapshot_files(from_version))
        to_files = set(self.snapshot_files(tv))
        added = sorted(to_files - from_files)
        removed = sorted(from_files - to_files)

        schema_json = None
        if tv > 0:
            schema_json = self._read_manifest(tv).get("schema")
        elif from_version > 0:
            schema_json = self._read_manifest(from_version).get("schema")
        reader = self.spark.read
        pinned = None
        if schema_json is not None:
            from pyspark.sql.types import StructType

            pinned = StructType.fromJson(json.loads(schema_json))
            reader = reader.schema(pinned)

        from pyspark.sql import functions as F

        if not added and not removed:
            # identical file sets (e.g. diff(v, v)): an empty feed, typed
            base = self.read(tv if tv > 0 else from_version)
            return base.where(F.lit(False)).withColumn(
                "_change", F.lit("insert")
            )

        def _side(files: list[str]) -> DataFrame:
            if files:
                return reader.parquet(*files)
            if pinned is not None:
                return local_df(self.spark, [], pinned)
            # no pre-schema manifests and an empty side: mirror the other
            # side's schema through an always-false filter
            other = added or removed
            return reader.parquet(*other).where(F.lit(False))

        new_side, old_side = _side(added), _side(removed)
        inserted = new_side.exceptAll(old_side).withColumn(
            "_change", F.lit("insert")
        )
        deleted = old_side.exceptAll(new_side).withColumn(
            "_change", F.lit("delete")
        )
        return inserted.unionByName(deleted)

    # -- maintenance ---------------------------------------------------------

    def compact(self, num_files: int | None = None,
                zorder_by: list[str] | None = None) -> int:
        """Rewrite the current snapshot as one fresh commit with
        ``num_files`` output files (default: Spark decides), optionally
        Z-order-clustered first — the many-small-commits answer (streaming
        appends land one file set per micro-batch; compaction folds them into
        scan-efficient files with tight stats).  Old snapshots stay
        time-travelable until vacuumed.  Returns the new version."""
        df = self.read()
        if zorder_by:
            from carto_etl_spark.operators.layout import cluster_by_zorder

            df = cluster_by_zorder(
                df, zorder_by, partitions=num_files or None
            )
        elif num_files:
            df = df.repartition(num_files)
        # materialize input rows before the commit replaces the file list the
        # plan reads (read() pins files, but be explicit about ordering)
        return self._commit_with_retry(
            self._write_files(df), "overwrite", schema_json=df.schema.json()
        )

    def vacuum(self, retain_versions: int = 1) -> list[str]:
        """Delete data files referenced by NO retained manifest (the newest
        ``retain_versions`` snapshots survive, supporting their readers and
        time travel).  Returns deleted paths.

        Dropped manifests also drop their idempotency keys: keep
        ``retain_versions`` at or above the streaming engine's replay horizon
        (Structured Streaming replays at most the last uncommitted batch, so
        anything >= 2 is safe there)."""
        if retain_versions < 1:
            # versions[-0:] would keep EVERY manifest while the loop below
            # deleted them all — refuse the footgun outright
            raise ValueError("retain_versions must be >= 1")
        versions = self._versions()
        keep_versions = versions[-retain_versions:] if versions else []
        keep: set[str] = set()
        for v in keep_versions:
            keep.update(self._read_manifest(v)["files"])
        deleted = []
        if self.data_dir.is_dir():
            for commit_dir in self.data_dir.iterdir():
                for p in list(commit_dir.iterdir()):
                    rel = str(p.relative_to(self.path))
                    if p.suffix == ".parquet" and rel not in keep:
                        p.unlink()
                        deleted.append(rel)
                if not any(commit_dir.iterdir()):
                    commit_dir.rmdir()
        for v in versions[:-retain_versions]:
            self._manifest_path(v).unlink(missing_ok=True)
        return deleted

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)


def apply_aggregate_delta(
    mv: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Maintain a grouped SUM+COUNT materialized view from a ``diff()``
    change feed without recomputing the base table: inserts add, deletes
    subtract, and a group whose maintained row count reaches zero is
    dropped from the view.

    This is the classic delta-maintenance identity for distributive
    aggregates (SUM/COUNT — and via them AVG): ``MV(v2) =
    MV(v1) (+) delta(feed(v1, v2))``.  At 100 TB the difference is the
    whole point of the change feed — the refresh costs shuffle
    proportional to the CHURNED rows (what the feed carries, already
    file-pruned by ``diff``), not to the table.

    ``mv`` must carry ``keys``, the ``sum_cols``, and ``count_col`` (build
    the initial view with the same groupBy this function maintains).  Use
    exact-arithmetic measure types (long cents, decimals) if the view must
    stay bit-identical to a full recompute under arbitrary churn —
    floating-point SUM is order-dependent, so delta-maintained doubles can
    drift ulps from a recompute even though both are "correct".

    MIN/MAX are deliberately not supported: they are not delta-maintainable
    under deletes without the full value multiset — recompute those.
    """
    from pyspark.sql import functions as F

    sign = F.when(F.col("_change") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = changes.groupBy(*keys).agg(
        *[F.sum(F.col(c) * sign).alias(f"__d_{c}") for c in sum_cols],
        F.sum(sign).cast("long").alias("__d_n"),
    )
    merged = mv.join(delta, on=keys, how="full_outer").select(
        *keys,
        *[
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
            for c in sum_cols
        ],
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col("__d_n"), F.lit(0))
        ).cast("long").alias(count_col),
    )
    return merged.where(F.col(count_col) > 0)
