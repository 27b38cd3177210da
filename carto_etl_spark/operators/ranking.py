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
   single-partition) plus a LITERAL-MAP lookup of the offsets
   (``element_at(create_map(...), bucket)``) — the offsets table is
   driver-resident already, so attaching it as a codegen expression skips
   the broadcast-relation build a join would pay per call.

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


def _sql_lit(v) -> str | None:
    """Exact Spark-SQL literal for a boundary value, or None when the type
    has no safe rendering (caller falls back to ``F.lit``).  Exactness
    notes: ``repr`` of a float is the shortest round-trip decimal and
    string->double casts are correctly rounded, so the CAST form is
    bit-identical to ``F.lit(v)``; the others are lossless by construction."""
    import datetime
    import decimal

    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v) + "L" if -(2**63) <= v < 2**63 else None
    if isinstance(v, float):
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        if "\x00" in v:
            return None
        esc = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{esc}'"
    if isinstance(v, decimal.Decimal):
        return f"{v}BD"
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    return None


def _quote_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _offset_expr(bucket_col: str, offsets: list[int]) -> Column:
    """Bucket -> starting-offset lookup as ONE literal array expression:
    ``element_at(array(o_0, ..., o_k), bucket + 1)`` — offsets are
    driver-resident already, so attaching them as a single parsed SQL
    string costs one py4j round-trip (a ``create_map`` of 2k ``F.lit``
    calls costs hundreds, which dominated the pre-pass wall-clock) and
    zero joins.  ``offsets[b]`` must cover every bucket value 0..k the
    data can produce (callers fill empty buckets with the running total)."""
    if not offsets:
        return F.lit(0).cast("long")
    vals = ", ".join(f"{v}L" for v in offsets)
    return F.expr(
        f"element_at(array({vals}), {_quote_ident(bucket_col)} + 1)"
    )


def _bucket_expr(key: str, bounds: list) -> Column:
    """bucket = number of boundaries strictly below the key (0-based).
    NULL keys compare NULL everywhere -> 0 from every term -> bucket 0,
    consistent with ascending nulls-first ordering.

    Emitted as ONE parsed SQL string (sum of ``CASE WHEN key > lit``)
    when every boundary renders exactly (``_sql_lit``): building the same
    chain from ``F.when``/``F.lit`` costs ~3 py4j round-trips per boundary
    and measurably dominates the driver pre-pass.  Unrenderable boundary
    types fall back to the Column chain — identical semantics."""
    if not bounds:
        return F.lit(0)
    lits = [_sql_lit(b) for b in bounds]
    if all(lit is not None for lit in lits):
        k = _quote_ident(key)
        return F.expr(
            " + ".join(
                f"(CASE WHEN {k} > {lit} THEN 1 ELSE 0 END)" for lit in lits
            )
        )
    terms = [
        F.when(F.col(key) > F.lit(b), F.lit(1)).otherwise(F.lit(0))
        for b in bounds
    ]
    return reduce(lambda a, b: a + b, terms)


def _guard_reserved(df: DataFrame, reserved: set[str], who: str) -> None:
    """Raise on collisions between caller columns and this module's scratch
    names — ``withColumn`` would silently OVERWRITE the caller's column and
    corrupt the result (same contract as cms_estimate's ``__cms_`` guard)."""
    clash = sorted(set(df.columns) & reserved)
    if clash:
        raise ValueError(
            f"{who}: input columns {clash} collide with reserved scratch "
            "names; rename them before ranking"
        )


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
    count aggregate, one bucket-partitioned window + literal-map offset
    lookup (no join).
    No single-partition WindowExec anywhere."""
    _guard_reserved(df, {"__bucket", "__rn"}, "with_global_rank")
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    bounds = range_boundaries(df, keys[0], n_buckets, total=total)
    bucketed = df.withColumn("__bucket", _bucket_expr(keys[0], bounds))

    counts = {
        row["__bucket"]: row["count"]
        for row in bucketed.groupBy("__bucket").count().collect()
    }
    offsets = []
    running = 0
    for b in range(len(bounds) + 1):  # empty buckets filled: array covers
        offsets.append(running)  # every value _bucket_expr can produce
        running += counts.get(b, 0)

    w = Window.partitionBy("__bucket").orderBy(*[F.col(k) for k in keys])
    return (
        bucketed.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            name,
            (_offset_expr("__bucket", offsets) + F.col("__rn")).cast("long"),
        )
        .drop("__bucket", "__rn")
    )


def with_global_ranks(
    df: DataFrame,
    axes: dict[str, list[str]],
    n_buckets: int | None = None,
    total: int | None = None,
) -> DataFrame:
    """Multi-axis global rank: attach one contiguous 1-based rank column per
    entry of ``axes`` (output-name -> ordering key list), sharing the
    driver pre-pass across ALL axes.  ``with_global_rank`` costs one count +
    one boundary-sample + one bucket-count job per call; a k-axis banding
    query (RFM pays three) repays 3k driver jobs.  This variant runs:

    - ONE count (skipped when ``total`` is passed),
    - ONE joint boundary-sample collect over every axis's first key
      (per-axis NULLs are dropped driver-side; vs. the single-axis path,
      which null-filters before sampling, only bucket BALANCE can differ,
      never rank correctness),
    - ONE ``groupingSets`` aggregate producing every axis's marginal bucket
      counts in a single shuffle (output ≤ k x n_buckets rows — never the
      n_buckets^k cross product a joint groupBy would risk at scale),

    then one bucket-partitioned window + literal-map offset lookup per axis,
    chained on a single frame (the windows run inside ONE action; boundary
    and count jobs never re-execute window stages because they all complete
    before the first window is planned).  Shuffle work equals k independent
    calls; driver job count drops from 3k to 3."""
    names = list(axes)
    bucket_cols = {nm: f"__bucket_{i}" for i, nm in enumerate(names)}
    _guard_reserved(
        df,
        set(bucket_cols.values()) | {"__rn"} | set(names),
        "with_global_ranks",
    )
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    if total is None:
        total = df.count()

    # one joint sample over the union of first keys
    first_keys = list(dict.fromkeys(axes[nm][0] for nm in names))
    if total == 0:
        sample_rows: list = []
    else:
        frac = min(1.0, _SAMPLE_CAP / total)
        sel = df.select(*first_keys)
        sample_rows = (
            sel.collect()
            if frac >= 1.0
            else sel.sample(False, frac, seed=42).collect()
        )

    bucketed = df
    n_bounds: dict[str, int] = {}
    for nm in names:
        key = axes[nm][0]
        vals = sorted(r[key] for r in sample_rows if r[key] is not None)
        bounds: list = []
        if vals and n_buckets > 1:
            for i in range(1, n_buckets):
                cut = vals[min(len(vals) - 1, (i * len(vals)) // n_buckets)]
                if not bounds or cut > bounds[-1]:
                    bounds.append(cut)
        n_bounds[nm] = len(bounds)
        bucketed = bucketed.withColumn(
            bucket_cols[nm], _bucket_expr(key, bounds)
        )

    # one grouping-sets aggregate: marginal bucket counts for every axis.
    # Bucket values are never NULL (``_bucket_expr`` is total), so a NULL
    # cell in the output means "column not in this grouping set".
    bcols = [bucket_cols[nm] for nm in names]
    marginals = (
        bucketed.groupingSets([[c] for c in bcols], *[F.col(c) for c in bcols])
        .count()
        .collect()
    )

    out = bucketed
    for nm in names:
        bc = bucket_cols[nm]
        marg: dict[int, int] = {}
        for row in marginals:
            if row[bc] is not None:
                marg[row[bc]] = marg.get(row[bc], 0) + row["count"]
        offsets = []
        running = 0
        for b in range(n_bounds[nm] + 1):
            offsets.append(running)
            running += marg.get(b, 0)
        w = Window.partitionBy(bc).orderBy(*[F.col(k) for k in axes[nm]])
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .withColumn(
                nm,
                (_offset_expr(bc, offsets) + F.col("__rn")).cast("long"),
            )
            .drop("__rn")
        )
    return out.drop(*bcols)


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
    literal-map offsets — no single-partition window.

    Rows that tie on ALL ``keys`` get a deterministic cumulative value only
    up to intra-tie order; pass a tiebreak key when that matters."""
    _guard_reserved(
        df,
        {"__bucket"},
        "with_prefix_sums",
    )
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
    totals_map = {row["__bucket"]: row for row in totals}
    offsets: dict[str, list[int]] = {v: [] for v in value_cols}
    running = {v: 0 for v in value_cols}
    for b in range(len(bounds) + 1):
        row = totals_map.get(b)
        for v in value_cols:
            offsets[v].append(running[v])
            running[v] += (row[v] if row is not None else 0) or 0

    end = 0 if inclusive else -1
    w = (
        Window.partitionBy("__bucket")
        .orderBy(*[F.col(k) for k in keys])
        .rowsBetween(Window.unboundedPreceding, end)
    )
    out = bucketed
    for v in value_cols:
        out = out.withColumn(
            f"{prefix}{v}",
            (
                _offset_expr("__bucket", offsets[v])
                + F.coalesce(F.sum(v).over(w), F.lit(0))
            ).cast("long"),
        )
    return out.drop("__bucket")


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
