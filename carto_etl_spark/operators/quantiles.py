"""Mergeable approximate quantiles from a deterministic hash-threshold
sample — the quantile leg of the sketch family (bloom = membership,
count-min = multiplicity, HLL = cardinality, this = rank).

Why not GK/KLL/t-digest: all three keep order-DEPENDENT compactor state, so
two runs of the same job (or the same job on a different partitioning)
produce different sketches and the result can never be oracle-checked by an
independent engine.  A hash-threshold sample — keep exactly the rows whose
``hash_expr(key)`` falls under a rate cutoff — is a function of the DATA
only: order-independent, partitioning-independent, and mergeable by plain
union (the filter distributes over it), with the same O(k) summary size and
the standard Binomial(n, k/n) sample-size concentration.  Quantile error is
the classic bottom-k bound: for sample size m, empirical ranks deviate from
true ranks by O(sqrt(q(1-q)/m)) w.h.p. (Dvoretzky-Kiefer-Wolfowitz), and the
operator REPORTS the realized error per probe instead of asking for trust:
each output row carries the estimate's exact rank in the full data, computed
by one conditional-aggregate pass.

Scale shape (100 TB): one count, one scan-stage filter (no shuffle), a
global rank over the ~k-row sample via the range-bucket ranking machinery
(no single-partition window), a |probs|-row driver collect, and one final
conditional-aggregate pass over the fact scan.  Nothing anywhere is
proportional to n except pure map-side scans.

Reference parity: the reference engine delegates percentile queries to its
backing warehouse (/root/reference/etl/etl.py — SQL text passthrough); this
module is the distributed-native scale path, with the exact `percentile`
catalog entry (queries.q_percentiles) as the small-data twin.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from carto_etl_spark.operators.ranking import with_global_rank
from carto_etl_spark.operators.sampling import (
    LEHMER_M,
    hash_expr,
    hash_sql,
)
from carto_etl_spark.session import local_df


def sample_cutoff(target_sample: int, total: int) -> int:
    """Keep-threshold in hash units for an expected ``target_sample`` rows
    out of ``total``.  float64 arithmetic in a FIXED shape
    (min(1, target/total) * M, floored) so the oracle can reproduce the
    exact integer with the same two IEEE ops."""
    if target_sample <= 0:
        raise ValueError(f"target_sample must be positive, got {target_sample}")
    if total <= 0:
        return 0
    return int(min(1.0, target_sample / total) * LEHMER_M)


def cutoff_sql(target_sample: int, total_sql: str) -> str:
    """DuckDB twin of :func:`sample_cutoff` (same op order: divide, min,
    multiply, floor)."""
    return (
        f"CAST(floor(least(1.0, CAST({target_sample} AS DOUBLE) / "
        f"({total_sql})) * {LEHMER_M}) AS BIGINT)"
    )


def rank_target(q: float, m: int) -> int:
    """1-based sample rank probed for quantile ``q``: ceil(q*m) clamped to
    [1, m] — the lower empirical quantile.  No interpolation: the estimate
    is always a real data value, so it is exact across engines for any
    column type (ints, decimals, strings all work)."""
    return max(1, min(m, math.ceil(q * m)))


def sample_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    probs: list[float],
    target_sample: int = 4096,
    salt: int = 0,
    total: int | None = None,
) -> DataFrame:
    """Approximate quantiles of ``value_col`` with per-probe realized error.

    ``key_col`` must be a unique integer row key (it seeds the keep/drop
    hash AND breaks rank ties, so the total order (value, key) is unique and
    both engines agree on every rank).  Returns one row per probe::

        q double, est <value type>, sample_m long, n_total long,
        true_rank long, true_frac double, rank_err double

    ``true_rank`` = exact count of rows with value < est (one conditional
    aggregate over the full scan — the sketch grades itself); ``true_frac``
    = true_rank/n; ``rank_err`` = true_frac - q.  For binary-fraction probes
    (q = i/2^b) every derived number is bit-identical across engines.
    NULL values are excluded up front (SQL percentile semantics).
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    for q in probs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"probs must be in (0, 1], got {q}")
    spark = df.sparkSession
    src = df.select(value_col, key_col).where(F.col(value_col).isNotNull())
    n = total if total is not None else src.count()
    cutoff = sample_cutoff(target_sample, n)
    sample = src.where(hash_expr(key_col, salt) < F.lit(cutoff))
    m = sample.count()
    if m == 0:
        schema = (
            f"q double, est {dict(src.dtypes)[value_col]}, sample_m long, "
            "n_total long, true_rank long, true_frac double, rank_err double"
        )
        return local_df(spark, [], schema)

    ranked = with_global_rank(sample, [value_col, key_col], name="__r")
    targets = sorted({rank_target(q, m) for q in probs})
    # |probs| rows at most — the "sketch-sized collect" pattern: the
    # estimates must become literals for the error pass's conditional sums.
    est_rows = {
        r["__r"]: r[value_col]
        for r in ranked.where(F.col("__r").isin(targets)).collect()
    }

    # One pass over the full data: exact rank (strict count below) of every
    # distinct estimate, as |probs| conditional sums.
    rank_aggs = [
        F.sum(
            F.when(F.col(value_col) < F.lit(est_rows[t]), 1).otherwise(0)
        ).alias(f"__rk_{t}")
        for t in targets
    ]
    true_ranks = src.agg(*rank_aggs).collect()[0]

    out = [
        (
            float(q),
            est_rows[rank_target(q, m)],
            m,
            n,
            int(true_ranks[f"__rk_{rank_target(q, m)}"]),
        )
        for q in probs
    ]
    value_type = dict(src.dtypes)[value_col]
    res = local_df(
        spark,
        out,
        f"q double, est {value_type}, sample_m long, n_total long, true_rank long",
    )
    return res.select(
        "q",
        "est",
        "sample_m",
        "n_total",
        "true_rank",
        (F.col("true_rank") / F.col("n_total")).alias("true_frac"),
        (F.col("true_rank") / F.col("n_total") - F.col("q")).alias("rank_err"),
    )


def sample_quantiles_oracle_sql(
    src_sql: str,
    value_sql: str = "v",
    key_sql: str = "k",
    probs: list[float] | None = None,
    target_sample: int = 4096,
    salt: int = 0,
) -> str:
    """DuckDB re-derivation of the ENTIRE operator — count, cutoff, hash
    filter, sample ranks, rank targets, estimates, exact-rank error pass —
    from the same source relation, so a hash-green row proves every stage.

    ``src_sql`` must yield columns ``{value_sql}`` (non-null values) and
    ``{key_sql}`` (unique integer key)."""
    probs = probs or [0.25, 0.5, 0.75]
    # CAST each probe: a bare 0.25 literal parses as DECIMAL in DuckDB and
    # decimal ceil(q*m) / rank_err arithmetic would diverge from Spark's
    # float64.
    probs_values = ", ".join(f"(CAST({float(q)!r} AS DOUBLE))" for q in probs)
    return f"""
WITH src AS ({src_sql}),
tot AS (SELECT count(*) AS n FROM src),
samp AS (
  SELECT {value_sql} AS v, {key_sql} AS k FROM src, tot
  WHERE {hash_sql(key_sql, salt)} < {cutoff_sql(target_sample, "tot.n")}
),
msize AS (SELECT count(*) AS m FROM samp),
ranked AS (SELECT v, row_number() OVER (ORDER BY v, k) AS r FROM samp),
probes(q) AS (VALUES {probs_values}),
tgt AS (
  SELECT q, greatest(1, least(m, CAST(ceil(q * m) AS BIGINT))) AS r_tgt, m
  FROM probes, msize
),
est AS (
  SELECT tgt.q, ranked.v AS est, tgt.m AS sample_m
  FROM tgt JOIN ranked ON ranked.r = tgt.r_tgt
),
graded AS (
  SELECT est.q, est.est, est.sample_m, tot.n AS n_total,
         (SELECT count(*) FROM src WHERE src.{value_sql} < est.est) AS true_rank
  FROM est, tot
)
SELECT q, est, sample_m, n_total, true_rank,
       CAST(true_rank AS DOUBLE) / n_total AS true_frac,
       CAST(true_rank AS DOUBLE) / n_total - q AS rank_err
FROM graded
"""


def group_sample_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    probs: list[float],
    target_per_group: int = 4096,
    salt: int = 0,
) -> DataFrame:
    """Per-group approximate quantiles, fully distributed — unlike
    :func:`sample_quantiles` nothing is collected, so the group count can
    be arbitrarily large (per-language length percentiles over a million
    languages-x-sources cells work the same as three TPC-H flags).

    Plan: one group-count aggregate, one join to attach the per-group
    cutoff (broadcast when the group table is small, shuffle otherwise),
    one scan-stage filter, then group-partitioned windows over the
    ~target_per_group-per-group sample and a |probs|-way explode.  No
    unpartitioned window, no driver state.

    Output: one row per (group, probe): group_cols..., q, est, sample_m,
    n_total.  Estimates are the lower empirical quantile (rank
    ceil(q*m) clamped to [1, m]) — always a real data value.
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    for q in probs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"probs must be in (0, 1], got {q}")
    from pyspark.sql import Window

    src = df.select(*group_cols, value_col, key_col).where(
        F.col(value_col).isNotNull()
    )
    counts = src.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    cutoff = F.floor(
        F.least(
            F.lit(1.0),
            F.lit(float(target_per_group)) / F.col("__n").cast("double"),
        )
        * F.lit(LEHMER_M)
    ).cast("long")
    with_cut = src.join(counts.withColumn("__cut", cutoff), group_cols)
    sample = with_cut.where(hash_expr(key_col, salt) < F.col("__cut"))

    wg = Window.partitionBy(*group_cols)
    wr = wg.orderBy(F.col(value_col), F.col(key_col))
    ranked = sample.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.col("__n"),
        F.row_number().over(wr).alias("__r"),
        F.count(F.lit(1)).over(wg).alias("__m"),
    )
    probed = ranked.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in probs]))
    )
    target = F.greatest(
        F.lit(1),
        F.least(F.col("__m"), F.ceil(F.col("q") * F.col("__m"))),
    )
    return probed.where(F.col("__r") == target).select(
        *group_cols,
        "q",
        F.col("__v").alias("est"),
        F.col("__m").cast("long").alias("sample_m"),
        F.col("__n").cast("long").alias("n_total"),
    )


def group_sample_quantiles_oracle_sql(
    src_sql: str,
    group_sql: str = "g",
    value_sql: str = "v",
    key_sql: str = "k",
    probs: list[float] | None = None,
    target_per_group: int = 4096,
    salt: int = 0,
) -> str:
    """DuckDB re-derivation of :func:`group_sample_quantiles` — per-group
    counts, float64 cutoffs, hash filter, partitioned ranks, rank targets."""
    probs = probs or [0.25, 0.5, 0.75]
    probs_values = ", ".join(f"(CAST({float(q)!r} AS DOUBLE))" for q in probs)
    return f"""
WITH src AS ({src_sql}),
counts AS (
  SELECT {group_sql} AS g, count(*) AS n FROM src GROUP BY 1
),
samp AS (
  SELECT s.{group_sql} AS g, s.{value_sql} AS v, s.{key_sql} AS k, c.n
  FROM src s JOIN counts c ON s.{group_sql} = c.g
  WHERE {hash_sql(key_sql, salt)} <
        CAST(floor(least(1.0, CAST({target_per_group} AS DOUBLE)
                              / CAST(c.n AS DOUBLE)) * {LEHMER_M}) AS BIGINT)
),
ranked AS (
  SELECT g, v, n,
         row_number() OVER (PARTITION BY g ORDER BY v, k) AS r,
         count(*) OVER (PARTITION BY g) AS m
  FROM samp
),
probes(q) AS (VALUES {probs_values})
SELECT g, q, v AS est, m AS sample_m, n AS n_total
FROM ranked, probes
WHERE r = greatest(1, least(m, CAST(ceil(q * m) AS BIGINT)))
"""


def equi_depth_boundaries(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_buckets: int,
    target_sample: int = 4096,
    salt: int = 0,
) -> list:
    """Approximate equi-depth bucket boundaries from the deterministic
    hash-threshold sample: the lower empirical quantiles at i/n_buckets
    (use a power-of-two ``n_buckets`` so every probe is a binary fraction
    and rank targets are bit-identical across engines).  Driver-side list
    of ``n_buckets - 1`` values — sketch-sized by construction."""
    src = df.select(value_col, key_col).where(F.col(value_col).isNotNull())
    n = src.count()
    cutoff = sample_cutoff(target_sample, n)
    sample = src.where(hash_expr(key_col, salt) < F.lit(cutoff))
    m = sample.count()
    if m == 0:
        return []
    ranked = with_global_rank(sample, [value_col, key_col], name="__r")
    targets = sorted(
        {rank_target(i / n_buckets, m) for i in range(1, n_buckets)}
    )
    by_rank = {
        r["__r"]: r[value_col]
        for r in ranked.where(F.col("__r").isin(targets)).collect()
    }
    return [by_rank[rank_target(i / n_buckets, m)] for i in range(1, n_buckets)]


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_buckets: int,
    target_sample: int = 4096,
    salt: int = 0,
) -> DataFrame:
    """Approximate equi-depth histogram: boundaries from the quantile
    sketch, then ONE exact counting pass (bucket = number of boundaries
    <= value, counted with multiplicity so duplicate boundaries keep both
    engines in lockstep).  The complement of stats.py's equi-WIDTH
    histogram: bucket populations stay balanced under any skew, which is
    what makes the result useful as a range-partitioning or
    stats-collection primitive at 100 TB.  Counts are EXACT; only the
    boundary placement is approximate (DKW on the sample)."""
    bounds = equi_depth_boundaries(
        df, value_col, key_col, n_buckets, target_sample, salt
    )
    src = df.select(value_col).where(F.col(value_col).isNotNull())
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(value_col) >= F.lit(b), 1).otherwise(0)
    return (
        src.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def equi_depth_oracle_sql(
    src_sql: str,
    value_sql: str = "v",
    key_sql: str = "k",
    n_buckets: int = 8,
    target_sample: int = 4096,
    salt: int = 0,
) -> str:
    """DuckDB re-derivation of :func:`equi_depth_histogram`: sample,
    ranks, boundary selection, then the multiplicity-counting bucket
    assignment and exact counts."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    probs_values = ", ".join(f"(CAST({float(q)!r} AS DOUBLE))" for q in probs)
    return f"""
WITH src AS ({src_sql}),
tot AS (SELECT count(*) AS n FROM src),
samp AS (
  SELECT {value_sql} AS v, {key_sql} AS k FROM src, tot
  WHERE {hash_sql(key_sql, salt)} < {cutoff_sql(target_sample, "tot.n")}
),
msize AS (SELECT count(*) AS m FROM samp),
ranked AS (SELECT v, row_number() OVER (ORDER BY v, k) AS r FROM samp),
probes(q) AS (VALUES {probs_values}),
bnd AS (
  SELECT ranked.v AS bval
  FROM probes CROSS JOIN msize
  JOIN ranked
    ON ranked.r = greatest(1, least(msize.m, CAST(ceil(q * msize.m) AS BIGINT)))
)
SELECT (SELECT count(*) FROM bnd WHERE bnd.bval <= src.{value_sql}) AS bucket,
       count(*) AS n
FROM src
GROUP BY 1
"""
