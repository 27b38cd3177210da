"""Distributed total-order ranking: contiguous global rank / row index and
SQL-``ntile`` banding WITHOUT a single-partition window.

Why this module exists: the obvious Spark spelling of a global rank —
``row_number().over(Window.orderBy(...))`` — funnels the entire input
through ONE task (Spark itself warns "Moving all data to a single
partition").  That is a driver-killer at fact scale, yet a global row index
is exactly the semantics the reference's chunking and row-range scans are
built on (chunk = floor(row_idx / chunk_size), /root/reference/etl/etl.py:37-56;
start_row/end_row, /root/reference/etl/etl.py:325-330).

Design (the classic range-partitioned rank, the same shape Spark's own
global sort uses — but with DETERMINISTIC, literal bucket boundaries so the
multi-job plan can never disagree with itself):

1. **Boundaries** (one tiny driver job): a seeded, capped sample of the
   first sort key is collected, sorted, and quantile cut points become plain
   Python literals.  Approximation here affects only bucket BALANCE, never
   correctness.  We deliberately avoid ``repartitionByRange``: its internal
   RangePartitioner re-samples with a seed derived from the (fresh) RDD id
   on every job, so the count job and the final job could disagree on
   partition membership.  Literal boundaries make every downstream job a
   pure function of the data.
2. **Bucket assignment** (codegen, no shuffle): ``bucket = #boundaries <
   key`` via a chain of ``when`` comparisons against literals.  Rows with a
   NULL first key land in bucket 0, matching Spark's nulls-first ascending
   window order.
3. **Bucket counts → offsets** (one small aggregate job): ``groupBy(bucket)
   .count()`` — deterministic — cumulated on the driver into per-bucket
   starting offsets (O(n_buckets) rows, not O(rows)).
4. **Final rank** (one shuffle on bucket): ``row_number`` over a window
   partitioned by bucket (dozens-to-thousands of buckets — parallel, never
   single-partition) plus a broadcast join of the offsets.

Skew note: all rows sharing one first-key value share a bucket.  For
near-unique keys (order keys, account balances, timestamps) buckets stay
balanced; a pathological constant key degrades to the single-partition sort
this module exists to avoid — callers with such keys should pass a more
selective leading key.

``ntile_from_rank`` reproduces exact SQL NTILE(k) semantics (bucket sizes
differ by at most one, larger buckets first) as pure arithmetic over the
global rank, so banding queries (deciles, RFM quintiles) need no window at
all once the rank exists.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from carto_etl_spark.session import local_df

#: boundary-sample cap: 100k scalar values ≈ a few MB on the driver, enough
#: for ±1% bucket balance at any input size.
_SAMPLE_CAP = 100_000


def range_boundaries(
    df: DataFrame, key: str, n_buckets: int, sample_cap: int = _SAMPLE_CAP,
    total: int | None = None,
) -> list:
    """Driver-side literal cut points splitting ``key``'s distribution into
    ``n_buckets`` roughly equal ranges.  Returns a sorted, deduplicated list
    of at most ``n_buckets - 1`` values.  One count job (skipped when the
    caller already knows ``total``) + one sample-collect job, both
    O(sample) on the driver."""
    if total is None:
        total = df.count()
    if total == 0 or n_buckets <= 1:
        return []
    frac = min(1.0, sample_cap / total)
    nn = df.select(key).where(F.col(key).isNotNull())
    if frac >= 1.0:
        sample = [r[0] for r in nn.collect()]
    else:
        sample = [r[0] for r in nn.sample(False, frac, seed=42).collect()]
    sample.sort()
    if not sample:
        return []
    bounds: list = []
    for i in range(1, n_buckets):
        cut = sample[min(len(sample) - 1, (i * len(sample)) // n_buckets)]
        if not bounds or cut > bounds[-1]:
            bounds.append(cut)
    return bounds


def _bucket_expr(key: str, bounds: list) -> Column:
    """bucket = number of boundaries strictly below the key (0-based).
    NULL keys compare NULL everywhere -> sum of otherwise(0) -> bucket 0,
    consistent with ascending nulls-first ordering."""
    if not bounds:
        return F.lit(0)
    terms = [
        F.when(F.col(key) > F.lit(b), F.lit(1)).otherwise(F.lit(0))
        for b in bounds
    ]
    return reduce(lambda a, b: a + b, terms)


def with_global_rank(
    df: DataFrame,
    keys: list[str],
    name: str = "rank",
    n_buckets: int | None = None,
    total: int | None = None,
) -> DataFrame:
    """Attach a contiguous 1-based global rank in the total ascending order
    of ``keys`` (the key combination should be unique for a deterministic
    result — ties are broken by Spark's within-bucket sort, which is stable
    only up to partitioning).  Plan: codegen bucket column, one small
    count aggregate, one bucket-partitioned window + broadcast offset join.
    No single-partition WindowExec anywhere."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    bounds = range_boundaries(df, keys[0], n_buckets, total=total)
    bucketed = df.withColumn("__bucket", _bucket_expr(keys[0], bounds))

    counts = bucketed.groupBy("__bucket").count().collect()
    offsets = []
    running = 0
    for row in sorted(counts, key=lambda r: r["__bucket"]):
        offsets.append((row["__bucket"], running))
        running += row["count"]
    offsets_df = local_df(
        spark, offsets or [(0, 0)], "__bucket int, __offset long"
    )

    w = Window.partitionBy("__bucket").orderBy(*[F.col(k) for k in keys])
    return (
        bucketed.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(offsets_df), "__bucket")
        .withColumn(name, (F.col("__offset") + F.col("__rn")).cast("long"))
        .drop("__bucket", "__rn", "__offset")
    )


def with_keyed_row_index(
    df: DataFrame,
    keys: list[str],
    name: str = "row_idx",
    n_buckets: int | None = None,
) -> DataFrame:
    """Contiguous 0-based row index in the total order of ``keys`` — the
    distributed engine path behind reference S7 chunking and S8 row ranges
    (sources/csv.py composes this with with_chunk_id / row_range_filter)."""
    ranked = with_global_rank(df, keys, name="__rank", n_buckets=n_buckets)
    return ranked.withColumn(name, F.col("__rank") - 1).drop("__rank")


def with_prefix_sums(
    df: DataFrame,
    keys: list[str],
    value_cols: list[str],
    inclusive: bool = True,
    prefix: str = "cum_",
    n_buckets: int | None = None,
) -> DataFrame:
    """Distributed running totals over the total ascending order of ``keys``:
    for each value column ``v`` (must be integral — cast upstream), appends
    ``<prefix><v>`` = sum of ``v`` over all rows ordered before this one
    (``inclusive`` adds the row itself).  Same two-level design as
    ``with_global_rank``: literal range buckets, per-bucket totals cumulated
    on the driver (O(n_buckets) rows), within-bucket window cumsum +
    broadcast offsets — no single-partition window.

    Rows that tie on ALL ``keys`` get a deterministic cumulative value only
    up to intra-tie order; pass a tiebreak key when that matters."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    bounds = range_boundaries(df, keys[0], n_buckets)
    bucketed = df.withColumn("__bucket", _bucket_expr(keys[0], bounds))

    totals = (
        bucketed.groupBy("__bucket")
        .agg(*[F.sum(v).cast("long").alias(v) for v in value_cols])
        .collect()
    )
    offsets = []
    running = {v: 0 for v in value_cols}
    for row in sorted(totals, key=lambda r: r["__bucket"]):
        offsets.append((row["__bucket"], *[running[v] for v in value_cols]))
        for v in value_cols:
            running[v] += row[v] or 0
    schema = "__bucket int, " + ", ".join(
        f"__off_{i} long" for i in range(len(value_cols))
    )
    offsets_df = local_df(
        spark, offsets or [(0, *[0] * len(value_cols))], schema
    )

    end = 0 if inclusive else -1
    w = (
        Window.partitionBy("__bucket")
        .orderBy(*[F.col(k) for k in keys])
        .rowsBetween(Window.unboundedPreceding, end)
    )
    out = bucketed.join(F.broadcast(offsets_df), "__bucket")
    for i, v in enumerate(value_cols):
        out = out.withColumn(
            f"{prefix}{v}",
            (
                F.col(f"__off_{i}")
                + F.coalesce(F.sum(v).over(w), F.lit(0))
            ).cast("long"),
        )
    return out.drop(
        "__bucket", *[f"__off_{i}" for i in range(len(value_cols))]
    )


def ntile_from_rank(rank: Column, n: int, k: int) -> Column:
    """Exact SQL ``NTILE(k) OVER (ORDER BY ...)`` from a precomputed 1-based
    global rank over ``n`` rows: the first ``n % k`` tiles hold
    ``n // k + 1`` rows, the rest ``n // k`` — pure integer arithmetic, no
    window.  ``ceil`` via ``floor((a + b - 1) / b)`` on doubles is exact for
    any realistic n (quotients are correctly rounded and whole results are
    representable far past 2^40)."""
    q, rem = divmod(n, k)
    big = rem * (q + 1)
    head = F.floor((rank + F.lit(q)) / F.lit(float(q + 1)))
    if q == 0:
        # fewer rows than tiles: tile == rank for every row
        return rank.cast("int")
    tail = F.lit(rem) + F.floor(
        (rank - F.lit(big) + F.lit(q - 1)) / F.lit(float(q))
    )
    return (
        F.when(rank <= F.lit(big), head).otherwise(tail).cast("int")
    )
