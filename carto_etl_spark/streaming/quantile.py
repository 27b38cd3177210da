"""Streaming quantile state: maintain a bounded hash-threshold sample
across micro-batches — the quantile leg of the streaming sketch family
(bloom = membership, count-min = multiplicity, HLL = cardinality, this =
rank), and the incremental form of the batch ``sample_quantiles``
(operators/quantiles.py).

The state is an adaptive-level sample (Gibbons' adaptive/distinct sampling,
PODS 2001 lineage): keep every row whose ``hash_expr(key)`` falls under
``cutoff(level) = LEHMER_M // 2**level``; whenever the kept set would
exceed ``cap``, raise ``level`` to the smallest value whose re-filtered
sample fits.  Two properties make this the ONLY quantile sketch in the
family that an independent engine can re-derive value-for-value:

* **Order independence.**  The final level is exactly
  ``min {L : |{rows with hash < cutoff(L)}| <= cap}`` over the WHOLE
  stream: the end state fits by construction, and if a smaller L also fit
  the full data it would have fit every prefix (prefix counts only grow),
  so the process never passed it.  Hence (level, sample) is a pure
  function of the data SET — batch boundaries, arrival order and restarts
  cannot change it.  GK/KLL/t-digest compactions are order-dependent and
  cannot offer this.
* **Mergeability.**  Two states merge by unioning samples at
  ``max(level_a, level_b)`` and re-leveling — the same rule as a batch
  boundary.

Exactly-once ``n_total``: counting is not idempotent under replay, so the
state carries a content-addressed ledger of applied batches (count plus two
independent Lehmer-hash key sums — order-independent, one aggregate pass,
no driver materialization of the batch).  Ledger, sample and meta live in
ONE state directory promoted by ONE rename (the shared
``streaming.state.SnapshotState``), so
no crash point can leave a half-applied batch; ``SnapshotState.recover`` heals
the window between the two promote renames.  The documented trade-off mirrors
frequency.py: two DISTINCT batches with identical key multisets dedupe —
carry a batch sequence column if that is a real case upstream.

Scale shape (100 TB/day): per batch one scan-stage filter + one aggregate
(count/fingerprint/level counts fused), a <= cap-row state rewrite, zero
shuffles of history.  The sample is sketch-sized by contract (``cap`` is
the same budget class as the CMS cell table or the bloom bitmap).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from carto_etl_spark.operators.quantiles import rank_target
from carto_etl_spark.operators.sampling import LEHMER_M, hash_expr
from carto_etl_spark.session import local_df
from carto_etl_spark.streaming.state import SnapshotState

_SAMPLE = "sample"
_META = "meta"
#: deepest candidate level probed in one pass (cutoff ~ M / 2^40 < 2000 —
#: a sample that still overflows cap at level 40 means cap < rows/2^40,
#: i.e. a misconfiguration the handler surfaces as an error)
MAX_LEVEL = 40


def level_cutoff(level: int) -> int:
    """Keep-threshold in hash units at ``level`` (integer halving so both
    engines reproduce the exact boundary)."""
    return LEHMER_M // (2 ** level)


def _fingerprint_and_counts(
    df: DataFrame, key_col: str, from_level: int, flag_col: str | None = None
) -> tuple[str, int, list[int]]:
    """ONE aggregate pass over the batch — or, with ``flag_col``, over
    (state ∪ batch) where the flag marks state rows: the batch count and
    two-hash content fingerprint (batch rows only), and the kept-row count
    at every candidate level >= from_level (all rows).  Fusing both reads
    into one job matters because every action inside ``foreachBatch``
    re-scans the batch files — this is the single full-batch aggregate of
    the handler."""
    h = hash_expr(key_col, 0)
    is_batch = (
        ~F.col(flag_col) if flag_col is not None else F.lit(True)
    )
    aggs = [
        F.sum(F.when(is_batch, 1).otherwise(0)).alias("__n"),
        F.sum(F.when(is_batch, h)).alias("__s1"),
        F.sum(F.when(is_batch, hash_expr(key_col, 104729))).alias("__s2"),
    ] + [
        F.sum(
            F.when(h < F.lit(level_cutoff(lv)), 1).otherwise(0)
        ).alias(f"__lv_{lv}")
        for lv in range(from_level, MAX_LEVEL + 1)
    ]
    row = df.agg(*aggs).collect()[0]
    # sum (unlike the old count) is NULL over zero input rows — a fresh
    # stream whose first batch is all-NULL values must yield n=0, not a
    # TypeError that kills the streaming query
    n = int(row["__n"] or 0)
    fp = f"{n}:{row['__s1']}:{row['__s2']}"
    counts = [int(row[f"__lv_{lv}"] or 0) for lv in range(from_level, MAX_LEVEL + 1)]
    return fp, n, counts


def _load_meta(state: SnapshotState, spark: SparkSession) -> tuple[int, int]:
    """(level, n_total) — one driver-side Arrow read, no Spark job on
    POSIX state."""
    meta = state.read_arrow(spark, _META)
    return (
        int(meta.column("level")[0].as_py()),
        int(meta.column("n_total")[0].as_py()),
    )


def load_quantile_state(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame, int, int]:
    """(sample_df, level, n_total) for the current state."""
    state = SnapshotState(state_dir)
    level, n_total = _load_meta(state, spark)
    sample = state.read(spark, _SAMPLE)
    return sample, level, n_total


#: Arrow scalar type -> Spark SQL DDL name, for the estimate column of the
#: state_quantiles output (the sample's value column is a plain scalar).
_ARROW_SPARK_NAMES = {
    "double": "double", "float": "float", "int64": "bigint",
    "int32": "int", "int16": "smallint", "int8": "tinyint",
    "string": "string", "large_string": "string", "bool": "boolean",
    "date32[day]": "date",
}


def state_quantiles(
    spark: SparkSession, state_dir: str, probs: list[float]
) -> DataFrame:
    """Quantile estimates from the current state: one row per probe —
    (q, est, sample_m, n_total, level).  The sample is sketch-sized by
    contract, so ranking it is a driver-side sort (the same budget class
    as reading the CMS cell table); both state tables come through the
    Arrow fast path — zero Spark jobs before the output frame."""
    state = SnapshotState(state_dir)
    level, n_total = _load_meta(state, spark)
    tbl = state.read_arrow(spark, _SAMPLE)
    cols = tbl.column_names  # [value, key]
    rows = sorted(
        zip(tbl.column(cols[0]).to_pylist(), tbl.column(cols[1]).to_pylist())
    )
    m = len(rows)
    out = [
        (float(q), rows[rank_target(q, m) - 1][0] if m else None,
         m, n_total, level)
        for q in probs
    ]
    vt = _ARROW_SPARK_NAMES.get(str(tbl.schema.field(cols[0]).type))
    if vt is None:
        vt = dict(state.read(spark, _SAMPLE).dtypes)[cols[0]]
    return local_df(
        spark, out, f"q double, est {vt}, sample_m long, n_total long, level int"
    )


def track_quantiles(
    stream_df: DataFrame,
    value_col: str,
    key_col: str,
    state_dir: str,
    cap: int = 4096,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the quantile tracker.  ``key_col`` must be a unique integer
    row key (it drives keep/drop and never changes across replays);
    ``cap`` bounds the persisted sample — rank error is the DKW
    O(sqrt(q(1-q)/cap)) of the batch operator."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = SnapshotState(state_dir)
        have_state = state.exists()
        if have_state:
            level, n_total = _load_meta(state, spark)
        else:
            level, n_total = 0, 0

        src = batch_df.select(
            F.col(value_col).alias("v"), F.col(key_col).alias("k")
        ).where(F.col("v").isNotNull())
        # ONE aggregate over (state ∪ full batch) yields the batch
        # fingerprint (flag-gated to batch rows) AND the kept counts at
        # every candidate level — the counts at levels >= the current one
        # are identical over the full batch and the level-filtered batch,
        # since cutoff(lv) <= cutoff(level) already implies the keep
        # predicate.  Two full-batch passes total (this one + the sample
        # write); the old three-pass shape paid an extra scan because each
        # foreachBatch action re-reads the batch files.
        if have_state:
            union = state.read(spark, _SAMPLE).withColumn(
                "__st", F.lit(True)
            ).unionByName(src.withColumn("__st", F.lit(False)))
        else:
            union = src.withColumn("__st", F.lit(False))
        fp, batch_n, counts = _fingerprint_and_counts(
            union, "k", level, flag_col="__st"
        )
        if batch_n == 0:
            return
        if have_state and state.ledger_contains(spark, fp):
            return  # replayed batch: already applied

        new_level = None
        for off, cnt in enumerate(counts):
            if cnt <= cap:
                new_level = level + off
                break
        if new_level is None:
            raise ValueError(
                f"sample exceeds cap={cap} even at level {MAX_LEVEL}: "
                "raise cap (it must be >= a ~2^-40 fraction of the stream)"
            )
        # the new-level filter applies to state rows too (a deeper level
        # prunes previously kept rows — the re-leveling rule)
        merged = union.where(
            hash_expr("k", 0) < F.lit(level_cutoff(new_level))
        ).drop("__st")

        fps = state.ledger_fps(spark) + [fp]
        tmp = state.begin_tmp()
        # repartition, NOT coalesce: coalesce(1) would collapse the whole
        # batch-filter scan into one task; repartition keeps the scan
        # parallel and shuffles only the <= cap surviving rows to one file
        merged.repartition(1).write.parquet(os.path.join(tmp, _SAMPLE))
        import pyarrow as pa

        state.write_arrow(
            spark, tmp, _META,
            pa.table(
                {
                    "level": pa.array([new_level], pa.int32()),
                    "n_total": pa.array([n_total + batch_n], pa.int64()),
                }
            ),
        )
        state.write_ledger(spark, tmp, fps)
        state.promote()

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
