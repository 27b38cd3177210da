"""Job surface: InsertJob / UpdateJob / DeleteJob + target tables + retry sink.

Mirrors the reference's public API (/root/reference/etl/etl.py:296-372) on top of
DataFrame plans:

- InsertJob: CSV -> typed DF -> append            (reference D1, etl/etl.py:296-312)
- UpdateJob: keyed MERGE-style rewrite            (reference D2, etl/etl.py:315-351;
  implemented from the documented semantics, README.md:128-148 — NOT the leftover
  ipdb breakpoint at etl/etl.py:321)
- DeleteJob: keyed anti-join rewrite              (reference D3, etl/etl.py:354-372)
- retry + dead-letter around sink actions         (reference D4, etl/etl.py:273-293)
- observer events total_rows/progress/error       (reference D9, etl/etl.py:159-164)
- chunk/row range offsets use the DOCUMENTED semantics (README.md:125-126), not
  the buggy ``chunks()`` indexing (SURVEY §2.1 S7).

Scale notes: the insert path is one distributed append (Spark gives per-task
retry); update/delete are single shuffle joins (broadcast when the keyed side is
small).  The parquet TargetTable rewrites via tmp-dir swap — on a real deployment
you would back this with a transactional table format (Delta/Iceberg MERGE), which
slots in behind the same TargetTable interface.
"""

from __future__ import annotations

import logging
import shutil
import uuid
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from carto_etl_spark.config import JobConfig
from carto_etl_spark.functions.coerce import float_expr, timestamp_expr
from carto_etl_spark.functions.geom import staged_geom
from carto_etl_spark.sources.csv import (
    chunk_range_filter,
    normalize_headers,
    read_csv,
    row_range_filter,
    with_chunk_id,
    with_row_index,
)

logger = logging.getLogger("carto-etl-spark")


class TargetTable:
    """A parquet-directory-backed table with append / rewrite operations,
    optionally hive-partitioned.

    - Unpartitioned rewrite writes to a sibling tmp dir and swaps (Spark
      cannot overwrite a path it is reading).
    - Partitioned tables (``partition_by``) additionally support
      ``overwrite_partitions``: dynamic partition overwrite replaces ONLY the
      partitions present in the written DataFrame — the keyed update/delete
      jobs use it to touch affected partitions instead of rewriting the
      table, which is the difference between O(touched data) and O(100 TB).
    - With a transactional format (Delta/Iceberg) this interface maps to real
      MERGE/DELETE; the jobs are format-agnostic behind it."""

    def __init__(
        self,
        spark: SparkSession,
        path: str | Path,
        partition_by: list[str] | None = None,
    ):
        self.spark = spark
        self.path = Path(path)
        self.partition_by = [c.lower() for c in (partition_by or [])]

    def exists(self) -> bool:
        return self.path.exists() and any(self.path.iterdir())

    def read(self) -> DataFrame:
        return self.spark.read.parquet(str(self.path))

    def read_partitions(self, values: list[tuple]) -> DataFrame:
        """Read only the named partitions (partition-pruned scan)."""
        df = self.read()
        if not self.partition_by or not values:
            return df
        cond = None
        for tup in values:
            eq = None
            for col, val in zip(self.partition_by, tup):
                c = F.col(col) == F.lit(val)
                eq = c if eq is None else (eq & c)
            cond = eq if cond is None else (cond | eq)
        return df.filter(cond)

    def _writer(self, df: DataFrame):
        w = df.write
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        return w

    def append(self, df: DataFrame) -> None:
        self._writer(df).mode("append").parquet(str(self.path))

    def overwrite(self, df: DataFrame) -> None:
        # Write to tmp, move the old table ASIDE (rename, not delete), swap
        # tmp in, then drop the old copy. A crash mid-sequence leaves either
        # the old or the new table reachable under a predictable name —
        # rmtree-before-rename left a window with no table at all and the new
        # data stranded under a random tmp name.
        token = uuid.uuid4().hex[:8]
        tmp = self.path.with_name(f"{self.path.name}.tmp-{token}")
        self._writer(df).mode("overwrite").parquet(str(tmp))
        old = self.path.with_name(f"{self.path.name}.old-{token}")
        had_old = self.path.exists()
        if had_old:
            self.path.rename(old)
        tmp.rename(self.path)
        if had_old:
            shutil.rmtree(old)

    def overwrite_partitions(self, df: DataFrame) -> None:
        """Replace only the partitions present in ``df`` (dynamic partition
        overwrite); other partitions are untouched on disk."""
        if not self.partition_by:
            raise ValueError("overwrite_partitions requires partition_by")
        current = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            self._writer(df).mode("overwrite").parquet(str(self.path))
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", current
            )


class UploadJob:
    """Base job: config handling, observer, retry-wrapped sink actions.

    ``source`` may be a CSV path (scanned per config) or an existing DataFrame
    (the reference likewise accepts an open stream, etl/etl.py:148-157).
    """

    def __init__(
        self,
        source: str | DataFrame,
        spark: SparkSession | None = None,
        target: TargetTable | None = None,
        config: JobConfig | None = None,
        **kwargs: Any,
    ):
        if config is not None and kwargs:
            raise ValueError("pass either a JobConfig or kwargs, not both")
        self.cfg = config or JobConfig.from_kwargs(**kwargs)
        self.source = source
        self.spark = spark or (
            source.sparkSession if isinstance(source, DataFrame) else None
        )
        if self.spark is None:
            raise ValueError("spark session required when source is a path")
        self.target = target
        self.dead_letters: list[DataFrame] = []

    # -- observer (reference D9, etl/etl.py:159-164) ------------------------
    def notify(self, message_type: str, message: Any) -> bool:
        observer = self.cfg.observer
        if callable(observer):
            observer({"type": message_type, "msg": str(message)})
            return True
        return False

    # -- source -------------------------------------------------------------
    def source_df(self) -> DataFrame:
        if isinstance(self.source, DataFrame):
            return normalize_headers(self.source)
        fmt = str(self.cfg.extras.get("source_format", "csv")).lower()
        if fmt == "csv":
            return read_csv(self.spark, self.source, self.cfg)
        if fmt in ("parquet", "json", "orc"):
            # columnar/semi-structured feeds arrive typed; header
            # normalization still applies (reference S2)
            return normalize_headers(
                self.spark.read.format(fmt).load(self.source)
                if fmt != "json"
                else self.spark.read.json(self.source)
            )
        raise ValueError(f"unsupported source_format: {fmt}")

    def projected_columns(self, df: DataFrame) -> list[str]:
        cols = [c.lower() for c in self.cfg.columns_list]
        if not cols:
            cols = [c for c in df.columns if c not in ("row_idx", "chunk_id")]
        return cols

    def coerced_df(
        self,
        df: DataFrame,
        include_geom: bool = True,
        passthrough: tuple[str, ...] = (),
    ) -> DataFrame:
        """Project configured columns with typed coercion.

        Column typing (vs the reference's per-value dispatch): date columns
        become timestamps; a string column becomes double only when every
        non-null, non-blank value float-parses (one aggregate pass — see
        ``infer_float_columns``); everything else stays string.
        """
        cols = self.projected_columns(df)
        declared = self.cfg.column_types_map
        if declared:
            # declared schema: no inference scan (the engine fast path)
            float_cols = {c for c, t in declared.items() if t == "double"}
        else:
            float_cols = infer_float_columns(
                df,
                [c for c in cols if not self.cfg.is_date_column(c) and c in df.columns],
                self.cfg,
            )
        exprs = []
        # membership checks below must see the SOURCE columns, not the staged
        # frame: staging adds a generated 'the_geom', which a projected source
        # column of the same name must not silently resolve to
        src_cols = set(df.columns)
        if include_geom:
            # staged: each coordinate parses once in its own projection
            # (the single-Column geom_expr form re-inlines the float parse
            # ~6x per coord and pushes codegen past the JIT's method limit)
            df = staged_geom(df, self.cfg)
            exprs.append(F.col("the_geom"))
        for c in cols:
            if include_geom and c == "the_geom":
                # the generated geometry already occupies this output slot
                continue
            if c not in src_cols:
                exprs.append(F.lit(None).cast("string").alias(c))
            elif self.cfg.is_date_column(c) or declared.get(c) == "timestamp":
                exprs.append(
                    timestamp_expr(
                        F.col(c), self.cfg.datetime_format, self.cfg.date_format
                    ).alias(c)
                )
            elif c in float_cols:
                exprs.append(
                    float_expr(
                        c,
                        self.cfg.float_comma_separator,
                        self.cfg.float_thousand_separator,
                    ).alias(c)
                )
            else:
                # blank/whitespace -> NULL (reference etl/etl.py:213-214)
                exprs.append(
                    F.when(F.trim(F.col(c)) == "", None)
                    .otherwise(F.col(c))
                    .alias(c)
                )
        exprs += [F.col(c) for c in passthrough if c in df.columns]
        return df.select(*exprs)

    # -- retry-wrapped sink action (reference D4, etl/etl.py:273-293) -------
    def send(
        self,
        action,
        batch_df: DataFrame,
        batch_num: int,
        notify_progress: bool = True,
    ) -> bool:
        for attempt in range(self.cfg.max_attempts):
            try:
                action(batch_df)
            except Exception as exc:  # noqa: BLE001 — retry any sink failure
                logger.warning("Batch #%s: Retrying (%s)", batch_num + 1, exc)
                self.notify("error", exc)
            else:
                logger.info("Batch #%s: Success!", batch_num + 1)
                if notify_progress:
                    self.notify("progress", batch_num + 1)
                return True
        logger.error("Batch #%s: Failed!", batch_num + 1)
        self.notify("error", f"Failed {batch_num + 1}")
        self.dead_letters.append(batch_df)
        if not self.cfg.skip_failed_batches:
            raise RuntimeError(
                f"batch {batch_num + 1} failed after {self.cfg.max_attempts} attempts"
            )
        return False

    # -- overviews (reference D5/D6) ----------------------------------------
    def regenerate_overviews(self, **kw) -> str:
        from carto_etl_spark.operators.overviews import submit_overview_job

        if self.target is None or not self.target.exists():
            raise ValueError("regenerate_overviews requires an existing target")
        return submit_overview_job(self.target, **kw)

    def check_job(self, job_id: str) -> dict:
        from carto_etl_spark.operators.overviews import check_job

        return check_job(job_id)


def infer_float_columns(
    df: DataFrame, candidates: list[str], cfg: JobConfig
) -> set[str]:
    """One distributed aggregate deciding which string columns are fully
    float-parseable (ignoring null/blank cells) — the columnar answer to the
    reference's per-value float-vs-string dispatch."""
    if not candidates:
        return set()
    string_cols = {c for c, t in df.dtypes if t == "string"}
    aggs = []
    for c in candidates:
        if c not in string_cols:
            continue
        considered = F.col(c).isNotNull() & (F.trim(F.col(c)) != "")
        parsed = float_expr(
            c, cfg.float_comma_separator, cfg.float_thousand_separator
        )
        bad = F.sum(F.when(considered & parsed.isNull(), 1).otherwise(0))
        some = F.sum(F.when(considered, 1).otherwise(0))
        aggs.append(bad.alias(f"bad__{c}"))
        aggs.append(some.alias(f"some__{c}"))
    if not aggs:
        return set()
    row = df.agg(*aggs).first()
    out = set()
    for c in candidates:
        if c in string_cols and row[f"bad__{c}"] == 0 and row[f"some__{c}"] > 0:
            out.add(c)
    return out


#: Ceiling on ``per_chunk_writes`` output partitions / progress events.  The
#: strict-parity path plans one output partition and one driver-side observer
#: callback per chunk; past ~10^5 chunks the partition count and the callback
#: loop are both driver-side scale-killers (at 100 TB with chunk_size=1000
#: that would be ~10^8 of each).  The default path has no such ceiling — it
#: plans ONE write job regardless of data size; use it, or raise chunk_size.
MAX_PER_CHUNK_PARTITIONS = 100_000


class InsertJob(UploadJob):
    """Bulk append (reference D1).  One distributed write; optional chunk-range
    resume offsets; optional per-chunk writes for strict observer parity."""

    def run(
        self,
        start_chunk: int = 1,
        end_chunk: int | None = None,
        per_chunk_writes: bool = False,
        max_chunk_partitions: int = MAX_PER_CHUNK_PARTITIONS,
    ) -> DataFrame:
        df = self.source_df()
        needs_chunks = per_chunk_writes or start_chunk != 1 or end_chunk is not None
        if needs_chunks:
            df = with_chunk_id(
                with_row_index(df), self.cfg.chunk_size
            )
            df = chunk_range_filter(df, start_chunk, end_chunk)
        total = df.count()
        self.notify("total_rows", total / int(self.cfg.chunk_size))

        passthrough = ("chunk_id",) if needs_chunks else ()
        out = self.coerced_df(df, passthrough=passthrough)

        if self.target is not None and self.target.exists():
            # schema drift guard: a later batch whose inference disagrees with
            # the existing target (e.g. an all-numeric column gains a bad
            # value) must not append a conflicting parquet schema — the
            # target's types are authoritative, like the reference's
            # pre-existing server table (README.md:107).
            tgt_types = dict(self.target.read().dtypes)
            out_types = dict(out.dtypes)
            aligned = []
            for c in out.columns:
                if c in tgt_types and out_types[c] != tgt_types[c]:
                    aligned.append(F.col(c).try_cast(tgt_types[c]).alias(c))
                else:
                    aligned.append(F.col(c))
            out = out.select(*aligned)

        if self.target is not None:
            if per_chunk_writes:
                # Strict observer parity WITHOUT per-chunk Spark jobs: one
                # aggregate computes the ordered chunk list, one
                # range-partitioned write emits every chunk (chunk rows
                # co-located, ~one output file per chunk), then the ordered
                # per-chunk progress events fire. The previous form ran one
                # sequential filtered write per chunk — with chunk_size 1000
                # that is millions of jobs at 100 TB.
                # Chunk ids are contiguous by construction (with_chunk_id is
                # floor(row_idx/chunk_size)+1 and chunk_range_filter keeps a
                # contiguous band), so a single-row min/max agg replaces the
                # former one-row-per-chunk collect (~10^8 rows at 100 TB with
                # chunk_size 1000).
                lo, hi = out.agg(
                    F.min("chunk_id"), F.max("chunk_id")
                ).first()
                n_chunks = 0 if lo is None else int(hi) - int(lo) + 1
                if n_chunks > max_chunk_partitions:
                    raise ValueError(
                        f"per_chunk_writes would plan {n_chunks} output "
                        f"partitions and fire {n_chunks} observer callbacks "
                        f"(cap: {max_chunk_partitions}). This opt-in parity "
                        "path does not scale past the cap; raise chunk_size "
                        f"(currently {self.cfg.chunk_size}) or use the "
                        "default single-write path, which has no ceiling."
                    )
                batch = out.repartitionByRange(
                    max(n_chunks, 1), "chunk_id"
                ).drop("chunk_id")
                if self.send(
                    self.target.append, batch, 0, notify_progress=False
                ):
                    for i in range(n_chunks):
                        self.notify("progress", i + 1)
            else:
                self.send(self.target.append, out.drop("chunk_id"), 0)
        return out.drop("chunk_id")


def _align_id(update_id: F.Column, target_df: DataFrame, id_column: str):
    """Join-key typing: the reference float-probes the id to decide numeric vs
    quoted rendering (etl/etl.py:341-349).  Typed equivalent: cast both sides
    to the target's id type when numeric, else compare as strings."""
    target_type = dict(target_df.dtypes)[id_column]
    if target_type in ("double", "float", "bigint", "int", "smallint", "tinyint"):
        return update_id.try_cast("double"), F.col(id_column).cast("double")
    return update_id.cast("string"), F.col(id_column).cast("string")


class UpdateJob(UploadJob):
    """Keyed update as a single MERGE-shaped join (reference D2, from the
    documented semantics README.md:128-148).

    Matched target rows take the update's values for every configured column
    (including NULLs — the reference SETs whatever parsed, NULL included);
    unmatched rows pass through; update rows with no target match are dropped.
    When the same id appears multiple times in the update set, the LAST file
    row wins (the reference issues sequential per-row UPDATEs).
    """

    def __init__(self, id_column: str, source, **kw):
        super().__init__(source, **kw)
        self.cfg.id_column = id_column.lower()

    def run(self, start_row: int = 1, end_row: int | None = None) -> DataFrame:
        if self.target is None:
            raise ValueError("UpdateJob requires a target table")
        idc = self.cfg.id_column
        df = with_row_index(self.source_df())
        self.notify("total_rows", df.count())
        df = row_range_filter(df, start_row, end_row)

        target_df = self.target.read()

        # Last occurrence of each id wins — dedup on the CAST join key, not
        # the raw string: distinct raw ids that cast equal ('1' vs '1.0')
        # address the same target row, and keeping both would fan out the
        # merge join and duplicate the matched target row.
        dedup_key, _ = _align_id(df[idc], target_df, idc)
        keyed = df.withColumn("__dk", dedup_key)
        latest = keyed.groupBy(F.col("__dk").alias("__id_key")).agg(
            F.max("row_idx").alias("row_idx")
        )
        df = keyed.join(
            latest,
            keyed["__dk"].eqNullSafe(latest["__id_key"])
            & (keyed["row_idx"] == latest["row_idx"]),
            "left_semi",
        ).drop("__dk")

        updates = self.coerced_df(df).withColumn("__matched", F.lit(True))

        # The target's schema is authoritative (the reference updates a
        # pre-existing server table, README.md:107): align update columns to
        # the target's types, tolerantly (unparseable -> NULL, not error).
        tgt_types = dict(target_df.dtypes)
        upd_types = dict(updates.dtypes)
        for c, tgt_t in tgt_types.items():
            if c in upd_types and upd_types[c] != tgt_t:
                updates = updates.withColumn(c, F.col(c).try_cast(tgt_t))

        upd_key, _ = _align_id(updates[idc], target_df, idc)
        updates = updates.withColumn("__key", upd_key)
        set_cols = [
            c for c in self.projected_columns(df) if c != idc and c != "row_idx"
        ]

        def merge(tgt: DataFrame) -> DataFrame:
            _, tgt_key = _align_id(updates[idc], tgt, idc)
            t = tgt.withColumn("__key", tgt_key).alias("t")
            u = updates.alias("u")
            joined = t.join(
                F.broadcast(u) if _is_small(updates) else u,
                F.col("t.__key").eqNullSafe(F.col("u.__key")),
                "left",
            )
            matched = F.col("u.__matched").isNotNull()
            select_exprs = []
            for c in tgt.columns:
                if (c == "the_geom" and "the_geom" in updates.columns) or c in set_cols:
                    select_exprs.append(
                        F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
                    )
                else:
                    select_exprs.append(F.col(f"t.{c}").alias(c))
            return joined.select(*select_exprs)

        if self.target.partition_by:
            # partition-scoped rewrite: find partitions holding matched keys
            # (column-pruned + semi-join scan), merge only those, dynamic
            # overwrite leaves every other partition untouched on disk.
            # Updating a partition column would move rows between partition
            # dirs and leave stale copies — that is a delete+insert, not an
            # update.
            moved = set(self.target.partition_by) & set(set_cols)
            if moved:
                raise ValueError(
                    f"cannot update partition column(s) {sorted(moved)}; "
                    "delete + insert instead"
                )
            _, tgt_key = _align_id(updates[idc], target_df, idc)
            affected = (
                target_df.withColumn("__key", tgt_key)
                .join(updates.select("__key").distinct(), "__key", "left_semi")
                .select(*self.target.partition_by)
                .distinct()
                .collect()
            )
            if not affected:
                return target_df
            sub = self.target.read_partitions([tuple(r) for r in affected])
            # materialize before overwriting the partitions being read
            result = merge(sub).localCheckpoint(eager=True)
            self.send(self.target.overwrite_partitions, result, 0)
            return result

        result = merge(target_df)
        self.send(self.target.overwrite, result, 0)
        return result


class DeleteJob(UploadJob):
    """Keyed delete as an anti-join rewrite (reference D3, etl/etl.py:354-372)."""

    def __init__(self, id_column: str, source, **kw):
        super().__init__(source, **kw)
        self.cfg.id_column = id_column.lower()

    def run(self, start_chunk: int = 1, end_chunk: int | None = None) -> DataFrame:
        if self.target is None:
            raise ValueError("DeleteJob requires a target table")
        idc = self.cfg.id_column
        df = self.source_df()
        if start_chunk != 1 or end_chunk is not None:
            df = chunk_range_filter(
                with_chunk_id(with_row_index(df), self.cfg.chunk_size),
                start_chunk,
                end_chunk,
            )
        self.notify("total_rows", df.count() / int(self.cfg.chunk_size))

        target_df = self.target.read()
        del_key, tgt_key = _align_id(df[idc], target_df, idc)
        doomed = df.select(del_key.alias("__key")).distinct()
        doomed = F.broadcast(doomed) if _is_small(doomed) else doomed

        if self.target.partition_by:
            # partition-scoped delete: only partitions containing doomed keys
            # are rewritten (anti-joined); the rest stay untouched on disk.
            affected = (
                target_df.withColumn("__key", tgt_key)
                .join(doomed, "__key", "left_semi")
                .select(*self.target.partition_by)
                .distinct()
                .collect()
            )
            if not affected:
                return target_df
            affected_tuples = [tuple(r) for r in affected]
            sub = self.target.read_partitions(affected_tuples)
            _, sub_key = _align_id(df[idc], sub, idc)
            survivors = (
                sub.withColumn("__key", sub_key)
                .join(doomed, "__key", "left_anti")
                .drop("__key")
                .localCheckpoint(eager=True)
            )
            self.send(self.target.overwrite_partitions, survivors, 0)
            # dynamic overwrite only replaces partitions PRESENT in the
            # output — a fully-deleted partition writes nothing and its old
            # dir would survive; drop those dirs explicitly.
            remaining = {
                tuple(r)
                for r in survivors.select(*self.target.partition_by)
                .distinct()
                .collect()
            }
            for tup in affected_tuples:
                if tup not in remaining:
                    part_dir = self.target.path.joinpath(
                        *[
                            f"{c}={v}"
                            for c, v in zip(self.target.partition_by, tup)
                        ]
                    )
                    if part_dir.exists():
                        shutil.rmtree(part_dir)
            return survivors

        survivors = (
            target_df.withColumn("__key", tgt_key)
            .join(doomed, "__key", "left_anti")
            .drop("__key")
        )
        self.send(self.target.overwrite, survivors, 0)
        return survivors


def _is_small(df: DataFrame, threshold_rows: int = 2_000_000) -> bool:
    """Cheap broadcast heuristic for the keyed side of update/delete joins.
    At 100 TB the update/delete sets are usually << the target; broadcast
    avoids shuffling the big side entirely.  Falls back to letting AQE decide
    when we cannot cheaply tell."""
    try:
        plan_rows = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if plan_rows.isDefined():
            return plan_rows.get() <= threshold_rows
    except Exception:  # noqa: BLE001 — stats are advisory
        pass
    return False
