"""Robust per-key outlier detection: lower-median / MAD (median absolute
deviation) scoring — the classic robust alternative to z-scores, immune to
the outliers it is hunting (mean/std get dragged by the very anomalies they
should flag).

Not in the reference (its scope ends at SQL-text DML,
/root/reference/etl/etl.py); a north-star analytics operator that composes
with operators/timeseries.py (resample a stream, then flag anomalous
buckets).

Determinism / verifiability design: both statistics are LOWER medians —
exact rank selection (the sorted multiset's element at rank ⌈n/2⌉), never an
interpolated average of two middle values.  Rank selection is pure integer
arithmetic over a sort, and the score is a single subtract/divide — so every
number this operator emits is bit-identical on any IEEE-754 engine, with no
accumulation-order noise (there are NO sums anywhere).

Plan shape / scale posture:
- per-key medians use a rank window (row_number + count over the key
  partition), then the tiny (one row per key) stats table joins back —
  broadcast when small, hash on the same key partitioning otherwise.  No
  collect_list: no per-key array ever materializes, so a hot key with 10^9
  rows sorts distributed instead of OOMing an executor.
- the MAD pass repeats the same trick on |x - median|; partitioning by the
  same key is reused.
- z-score variant included for completeness (mean/std are one aggregate),
  but MAD is the oracle-checked path — sums carry accumulation-order FP
  noise, medians don't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _lower_median(df: DataFrame, keys: list[str], value: str,
                  out: str) -> DataFrame:
    """One row per key: the lower median of ``value`` (exact rank
    selection: sorted element at rank ceil(n/2); n odd -> the true median,
    n even -> the lower of the two middle values).  NULL values excluded."""
    nn = df.where(F.col(value).isNotNull())
    w = Window.partitionBy(*keys).orderBy(F.col(value))
    ranked = nn.select(
        *keys,
        F.col(value),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("__n"),
    )
    return ranked.where(
        F.col("__rn") == F.ceil(F.col("__n") / 2)
    ).select(*keys, F.col(value).alias(out))


def with_mad_scores(
    df: DataFrame, keys: list[str], value: str,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Append per-key robust statistics and score: ``med`` (lower median),
    ``mad`` (lower median of |x - med|), and ``score`` = |x - med| / mad
    (NULL when mad = 0 — a constant key has no scale to score against).
    Rows with NULL value get NULL score.  ``broadcast_stats=False`` switches
    the stats joins to hash joins for key domains too large to broadcast
    (they reuse the key partitioning either way)."""
    bc = F.broadcast if broadcast_stats else (lambda d: d)
    med = _lower_median(df, keys, value, "med")
    scored = df.join(bc(med), keys, "left")
    dev = scored.withColumn("__dev", F.abs(F.col(value) - F.col("med")))
    mad = _lower_median(dev, keys, "__dev", "mad")
    out = dev.join(bc(mad), keys, "left")
    return out.withColumn(
        "score",
        F.when(F.col("mad") > 0, F.col("__dev") / F.col("mad")),
    ).drop("__dev")


def mad_outliers(
    df: DataFrame, keys: list[str], value: str, threshold: float = 3.5,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Rows whose robust score exceeds ``threshold`` (3.5 is the classic
    Iglewicz–Hoaglin cutoff for the equivalent modified-z formulation),
    with med/mad/score attached."""
    return with_mad_scores(df, keys, value, broadcast_stats).where(
        F.col("score") > threshold
    )


def with_zscores(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Classic per-key z-scores (mean/population-std, one aggregate +
    broadcast join back).  Sums carry accumulation-order FP noise — use
    ``with_mad_scores`` when bit-reproducibility matters."""
    stats = df.groupBy(*keys).agg(
        F.avg(value).alias("mean"),
        F.stddev_pop(value).alias("std"),
    )
    return df.join(F.broadcast(stats), keys, "left").withColumn(
        "zscore",
        F.when(F.col("std") > 0, (F.col(value) - F.col("mean")) / F.col("std")),
    )


def cusum_scores(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value: str,
    target,
    slack,
    threshold,
    decimals: int = 6,
) -> DataFrame:
    """One-sided (upper) CUSUM change detection per key: the classic
    sequential drift detector ``s_i = max(0, s_{i-1} + (x_i - target -
    slack))``, alarm when ``s_i > threshold``.

    The textbook recurrence looks inherently sequential, but it has a
    closed form: with ``y_i = x_i - target - slack`` and prefix sums
    ``P_i = y_1 + ... + y_i``,

        s_i = P_i - min(0, P_1, ..., P_i)

    (the restart-at-zero is exactly "subtract the lowest point seen so
    far") — so the whole detector is TWO key-partitioned running windows
    (sum, then min), no iteration, no state, no unpartitioned window.

    Determinism: ``x`` is quantized to ``decimals`` and cast to DECIMAL
    before any sum, so the running prefix is exact integer arithmetic —
    bit-identical on any engine regardless of how its window accumulates
    (float prefix sums agree only if both engines add in the same order;
    decimals agree unconditionally).  ``order_cols`` must be unique per
    key for a deterministic sequence.

    Returns the input plus ``cusum`` (DECIMAL) and ``alarm`` (boolean).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec = f"decimal(28,{decimals})"
    y = (
        F.round(F.col(value), decimals).cast(dec)
        - F.round(F.lit(target), decimals).cast(dec)
        - F.round(F.lit(slack), decimals).cast(dec)
    )
    out = df.withColumn("__p", F.sum(y).over(run))
    low = F.least(F.lit(0).cast(dec), F.min("__p").over(run))
    out = out.withColumn("cusum", (F.col("__p") - low).cast(dec))
    return out.withColumn(
        "alarm", F.col("cusum") > F.round(F.lit(threshold), decimals).cast(dec)
    ).drop("__p")


def theil_sen(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
    id_col: str,
    sample_cap: int = 64,
    salt: int = 0,
) -> DataFrame:
    """Per-key Theil-Sen robust trend: the LOWER MEDIAN of all pairwise
    slopes (y_j - y_i)/(x_j - x_i) — up to ~29% contamination cannot move
    it, where least squares is dragged by a single outlier.  The robust
    slope to pair with the CUSUM shift detector above.

    Pairwise slopes are quadratic, so each key is first thinned to
    ``sample_cap`` points by the deterministic hash-threshold sample
    (per-key float64 cutoff from the group counts — the
    group_sample_quantiles pattern), bounding pairs at cap^2/2 per key
    regardless of key size.  Vertical pairs (equal x) are excluded, the
    standard Theil-Sen convention.

    Determinism: the median is exact rank selection over the unique order
    (slope, id_i, id_j) — no sums anywhere, and each slope is ONE IEEE
    division — so every emitted number is bit-identical on any engine.
    ``id_col`` must be a unique integer row key.

    Output: keys..., n_points (sampled), n_pairs, slope (NULL when fewer
    than 2 distinct-x points survive).
    """
    from carto_etl_spark.operators.sampling import LEHMER_M, hash_expr

    src = df.select(*keys, x_col, y_col, id_col).where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    counts = src.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    cutoff = F.floor(
        F.least(
            F.lit(1.0),
            F.lit(float(sample_cap)) / F.col("__n").cast("double"),
        )
        * F.lit(LEHMER_M)
    ).cast("long")
    pts = (
        src.join(counts.withColumn("__cut", cutoff), keys)
        .where(hash_expr(id_col, salt) < F.col("__cut"))
        .select(*keys, x_col, y_col, id_col)
    )
    n_pts = pts.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_points"))

    a = pts.select(
        *keys,
        F.col(x_col).alias("__xa"),
        F.col(y_col).alias("__ya"),
        F.col(id_col).alias("__ka"),
    )
    b = pts.select(
        *keys,
        F.col(x_col).alias("__xb"),
        F.col(y_col).alias("__yb"),
        F.col(id_col).alias("__kb"),
    )
    pairs = (
        a.join(b, keys)
        .where((F.col("__ka") < F.col("__kb")) & (F.col("__xa") != F.col("__xb")))
        .select(
            *keys,
            ((F.col("__yb") - F.col("__ya"))
             / (F.col("__xb") - F.col("__xa"))).alias("__slope"),
            "__ka",
            "__kb",
        )
    )
    w = Window.partitionBy(*keys).orderBy("__slope", "__ka", "__kb")
    wc = Window.partitionBy(*keys)
    med = (
        pairs.withColumn("__r", F.row_number().over(w))
        .withColumn("__np", F.count(F.lit(1)).over(wc))
        .where(F.col("__r") == F.ceil(F.col("__np") / 2.0))
        .select(
            *keys,
            F.col("__np").cast("long").alias("n_pairs"),
            F.col("__slope").alias("slope"),
        )
    )
    return n_pts.join(med, keys, "left").select(
        *keys,
        F.col("n_points").cast("long").alias("n_points"),
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
        "slope",
    )
