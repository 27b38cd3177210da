"""Streaming cardinality state: maintain HyperLogLog registers across
micro-batches — the incremental form of the batch ``hll_build``
(operators/sketch.py), completing the streaming sketch quartet:
``streaming/dedup.py`` bloom = membership, ``streaming/frequency.py``
count-min = multiplicity, ``streaming/lshindex.py`` = near-duplication,
this = distinct count.

Per batch: build the batch's register table (<= 2^p rows, the map-side
partial max collapsing arbitrarily many input rows), max-merge it into the
persisted registers (``hll_merge`` — O(2^p) regardless of history), and
promote the new state atomically.

Replay semantics: unlike counting (frequency.py needs a content-addressed
ledger because a replayed batch would double every count), register-max
merge is IDEMPOTENT — a replayed batch max-merges the same rhos and changes
nothing — so exactly-once here needs NO ledger.  Crash-safety reduces to
the shared ``streaming.state.SnapshotState`` promote/recover pair.

Scale posture: state is <= 2^p register rows forever (4 KB at p=10); the
per-batch cost is one scan of the batch plus an O(2^p) merge.  Estimation
(``operators.sketch.hll_estimate``) reads the tiny state table on demand —
no contention with the writer beyond the promote rename.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from carto_etl_spark.operators.sketch import hll_build, hll_estimate
from carto_etl_spark.streaming.state import SnapshotState

_REGS = "registers"


def load_cardinality_registers(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Read the current register table (bucket, max_rho)."""
    return SnapshotState(state_dir).read(spark, _REGS)


def estimate_cardinality(
    spark: SparkSession, state_dir: str, p: int = 10
) -> DataFrame:
    """One row (n_buckets_used, estimate) from the current state."""
    return hll_estimate(load_cardinality_registers(spark, state_dir), p=p)


def track_cardinality(
    stream_df: DataFrame,
    item_col: str,
    state_dir: str,
    p: int = 10,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the cardinality tracker.  ``p`` is fixed at state creation
    (registers only merge shape-to-shape); standard error is
    ~1.04/sqrt(2^p), so size it for the precision the EVENTUAL stream
    needs, not the first batch."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = SnapshotState(state_dir)
        regs = {
            int(r["bucket"]): int(r["max_rho"])
            for r in hll_build(batch_df, item_col, p=p).collect()
        }
        if not regs:
            return
        # register state is <= 2^p rows: merge (bucket-wise max — the
        # same rule as hll_merge, associative) on the driver and write
        # through the Arrow fast path instead of paying two more Spark
        # jobs per batch for a KB-sized table
        if state.exists():
            prior = state.read_arrow(spark, _REGS)
            for b, r in zip(
                prior.column("bucket").to_pylist(),
                prior.column("max_rho").to_pylist(),
            ):
                b = int(b)
                regs[b] = max(regs.get(b, 0), int(r))
        import pyarrow as pa

        buckets = sorted(regs)
        tmp = state.begin_tmp()
        state.write_arrow(
            spark, tmp, _REGS,
            pa.table(
                {
                    "bucket": pa.array(buckets, pa.int32()),
                    "max_rho": pa.array(
                        [regs[b] for b in buckets], pa.int32()
                    ),
                }
            ),
        )
        state.promote()

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
