"""Exact-arithmetic evaluation statistics: AUC, two-sample KS, Gini
concentration, Benford digit profile, and a one-pass Pearson correlation
matrix.

These are the metrics a training-data / analytics pipeline computes to
EVALUATE itself — does a quality score actually separate good from bad
documents (AUC), did the distribution drift between two cohorts (KS), how
concentrated is revenue/token mass (Gini), does a numeric column look
fabricated (Benford), which features are redundant (correlation).  Not in
the reference (its scope ends at SQL-text DML, /root/reference/etl/etl.py);
north-star extension operators.

Determinism contract (the repo-wide convention, see queries.py header):
every accumulation is exact — integer counts, decimal(18,2)-cast values,
decimal(38,x) sums — and floating point appears only in a FINAL fixed
expression tree of IEEE-correctly-rounded ops (+ - * / sqrt, never libm
transcendentals), so results are bit-identical across engines and
partitionings and a SQL oracle can replay them.

Scale posture:
- `auc` / `ks_statistic` reduce the input to one row per DISTINCT score
  value before any ordered computation runs.  For fixed-resolution scores
  (money cents, basis points, quantized quality scores) that aggregate is
  bounded by the value RANGE, not the row count — ~50k rows for cent-priced
  values under $500 whether the input is 1e6 or 1e12 rows.  Unbounded-
  resolution scores should be quantized by the caller first (the metrics
  are rank statistics; quantization is the standard tie treatment).
- running totals / global ranks use the DISTRIBUTED prefix-sum machinery in
  operators/ranking.py (literal range buckets + bucket-partitioned window +
  broadcast offsets) — there is no single-partition WindowExec anywhere in
  this module (plan-gated catalog-wide in tests/test_plans.py).  The
  per-value aggregate is pinned with localCheckpoint so the multi-job rank
  plan reads it once instead of re-running the upstream scan.
- scalar totals (KS marginals, Benford share denominator) attach via a
  single-row broadcast cross join, not a global window.
- `benford` and `corr_matrix` are single map-side-combining aggregation
  passes — no ordered windows at all; `corr_matrix` profiles all column
  pairs in ONE scan (the stats.py profile() trick applied to second
  moments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,2)"
BIG = "decimal(38,0)"


def _per_value_counts(
    df: DataFrame, value_col: str, pos_expr
) -> DataFrame:
    """One row per distinct decimal(18,2) value: (v, np, nn)."""
    return (
        df.select(
            F.col(value_col).cast(DEC).alias("v"),
            F.when(pos_expr, 1).otherwise(0).alias("y"),
        )
        .groupBy("v")
        .agg(
            F.sum("y").cast("long").alias("np"),
            (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("nn"),
        )
    )


def auc(df: DataFrame, value_col: str, pos_expr) -> DataFrame:
    """Exact ROC AUC of ``value_col`` as a score for the binary label
    ``pos_expr``, with the standard average-rank tie treatment, via the
    Mann-Whitney U statistic.

    Works on the distinct-value aggregate: for each score value v (ascending)
    with np(v) positives and nn(v) negatives,

        2U = sum over v of  np(v) * (2 * negatives_below(v) + nn(v))

    — a positive beats every negative strictly below it and half-ties the
    negatives at its own value.  All integer; AUC = 2U / (2 * Npos * Nneg)
    is the single double division.  Returns one row
    (n_pos, n_neg, auc)."""
    from carto_etl_spark.operators.ranking import with_prefix_sums

    per = _per_value_counts(df, value_col, pos_expr).localCheckpoint(
        eager=False
    )
    cum = with_prefix_sums(
        per, ["v"], ["nn"], inclusive=False, prefix="below_"
    )
    contrib = (
        F.col("np") * (2 * F.col("below_nn") + F.col("nn"))
    ).cast(BIG)
    out = cum.select("np", "nn", contrib.alias("c")).agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum("c").cast(BIG).alias("u2"),
    )
    return out.select(
        "n_pos",
        "n_neg",
        (
            F.col("u2").cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


def auc_oracle_sql(rows_sql: str) -> str:
    """Mirror of `auc`: ``rows_sql`` must yield (v DECIMAL(18,2), y INT)."""
    return f"""
WITH per AS (
  SELECT v, CAST(sum(y) AS BIGINT) AS np,
         CAST(count(*) - sum(y) AS BIGINT) AS nn
  FROM ({rows_sql}) r GROUP BY v
), cum AS (
  SELECT np, nn,
         CAST(np * (2 * COALESCE(sum(nn) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + nn) AS DECIMAL(38,0)) AS c
  FROM per
), tot AS (
  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
         CAST(sum(nn) AS BIGINT) AS n_neg,
         CAST(sum(c) AS DECIMAL(38,0)) AS u2
  FROM cum
)
SELECT n_pos, n_neg,
       CAST(u2 AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
FROM tot
"""


def ks_statistic(df: DataFrame, value_col: str, a_expr, b_expr) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D between the ``value_col``
    distributions of subpopulations ``a_expr`` and ``b_expr``.

    D = max over v of |Fa(v) - Fb(v)|, kept exact as the integer
    cross-product |cum_a(v) * n_b - cum_b(v) * n_a| and divided once at the
    end.  Returns one row (n_a, n_b, d_scaled, d)."""
    per = (
        df.select(
            F.col(value_col).cast(DEC).alias("v"),
            F.when(a_expr, 1).otherwise(0).alias("ya"),
            F.when(b_expr, 1).otherwise(0).alias("yb"),
        )
        .groupBy("v")
        .agg(
            F.sum("ya").cast("long").alias("na"),
            F.sum("yb").cast("long").alias("nb"),
        )
    )
    from carto_etl_spark.operators.ranking import with_prefix_sums

    per = per.localCheckpoint(eager=False)
    tot = per.agg(
        F.sum("na").cast("long").alias("ta"),
        F.sum("nb").cast("long").alias("tb"),
    )
    cum = (
        with_prefix_sums(
            per, ["v"], ["na", "nb"], inclusive=True, prefix="c"
        )
        .withColumnRenamed("cna", "ca")
        .withColumnRenamed("cnb", "cb")
        .crossJoin(F.broadcast(tot))
    )
    diff = F.abs(
        (F.col("ca") * F.col("tb")).cast(BIG)
        - (F.col("cb") * F.col("ta")).cast(BIG)
    )
    out = cum.select(
        diff.alias("diff"), F.col("ta"), F.col("tb")
    ).agg(
        F.max("ta").cast("long").alias("n_a"),
        F.max("tb").cast("long").alias("n_b"),
        F.max("diff").cast("long").alias("d_scaled"),
    )
    return out.select(
        "n_a",
        "n_b",
        "d_scaled",
        (
            F.col("d_scaled").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("d"),
    )


def ks_oracle_sql(rows_sql: str) -> str:
    """Mirror of `ks_statistic`: ``rows_sql`` must yield
    (v DECIMAL(18,2), ya INT, yb INT)."""
    return f"""
WITH per AS (
  SELECT v, CAST(sum(ya) AS BIGINT) AS na, CAST(sum(yb) AS BIGINT) AS nb
  FROM ({rows_sql}) r GROUP BY v
), cum AS (
  SELECT sum(na) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         sum(nb) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         sum(na) OVER () AS ta, sum(nb) OVER () AS tb
  FROM per
), agg AS (
  SELECT CAST(max(ta) AS BIGINT) AS n_a, CAST(max(tb) AS BIGINT) AS n_b,
         CAST(max(abs(CAST(ca * tb AS DECIMAL(38,0))
                      - CAST(cb * ta AS DECIMAL(38,0)))) AS BIGINT)
           AS d_scaled
  FROM cum
)
SELECT n_a, n_b, d_scaled,
       CAST(d_scaled AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS d
FROM agg
"""


def gini(entity_values: DataFrame, value_col: str, id_col: str) -> DataFrame:
    """Exact Gini coefficient of non-negative integer ``value_col`` over
    entities (one input row per entity; ``id_col`` breaks value ties so the
    rank is total and the result partition-independent).

        G = (2 * sum(i * x_i) - (n + 1) * sum(x_i)) / (n * sum(x_i))

    with x ascending, i = 1..n.  The rank-weighted sum stays exact in
    decimal(38,0); the final expression is one fixed double tree.  Returns
    one row (n, total, gini)."""
    from carto_etl_spark.operators.ranking import with_global_rank

    base = entity_values.select(
        F.col(value_col).cast("long").alias("x"),
        F.col(id_col).alias("__id"),
    ).localCheckpoint(eager=False)
    ranked = with_global_rank(base, ["x", "__id"], name="i")
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast(BIG).alias("s"),
        F.sum((F.col("i") * F.col("x")).cast(BIG)).cast(BIG).alias("ws"),
    )
    return agg.select(
        "n",
        F.col("s").cast("long").alias("total"),
        (
            (
                2 * F.col("ws").cast("double")
                - (F.col("n") + 1).cast("double") * F.col("s").cast("double")
            )
            / (F.col("n").cast("double") * F.col("s").cast("double"))
        ).alias("gini"),
    )


def gini_oracle_sql(entity_sql: str) -> str:
    """Mirror of `gini`: ``entity_sql`` must yield (id, x BIGINT)."""
    return f"""
WITH ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, id) AS i
  FROM ({entity_sql}) e
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DECIMAL(38,0)) AS s,
         CAST(sum(CAST(i * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ws
  FROM ranked
)
SELECT n, CAST(s AS BIGINT) AS total,
       (2 * CAST(ws AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(s AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) AS gini
FROM agg
"""


def benford(df: DataFrame, value_col: str) -> DataFrame:
    """Leading-significant-digit profile of a positive money column — the
    classic fabricated-data screen.  The digit is taken arithmetically-safely:
    cents = round(value * 100) as bigint (exact for 2-dp money doubles), and
    the leading digit of the INTEGER's decimal rendering (integer-to-string
    is engine-identical; no float formatting or log10 anywhere).  Returns
    (digit, n, share) for digits 1-9, share = one double division."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    per = (
        df.where(F.col(value_col) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    ).localCheckpoint(eager=False)
    tot = per.agg(F.sum("n").cast("long").alias("__total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("__total").cast("double")).alias(
            "share"
        ),
    )


def benford_oracle_sql(table: str, value_col: str) -> str:
    return f"""
WITH per AS (
  SELECT CAST(substr(CAST(CAST(round({value_col} * 100) AS BIGINT)
                     AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM {table} WHERE {value_col} > 0 GROUP BY 1
)
SELECT digit, n,
       CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share
FROM per
"""


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pearson correlation of every column pair in ONE aggregation pass.

    Values are cast to decimal(18,2) so every first and second moment
    accumulates exactly (sums in decimal(38,4)); each pair's correlation is
    then one fixed double expression

        (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))

    over those exact sums — sqrt and / are IEEE-correctly-rounded, so the
    doubles are bit-identical across engines.  Returns one row per unordered
    pair (col_x, col_y, corr), pairs in the given column order."""
    d = df.select(
        *[F.col(c).cast(DEC).alias(c) for c in cols]
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c)).cast("double").alias(f"s{i}"))
        for j in range(i, len(cols)):
            aggs.append(
                F.sum(
                    (F.col(c) * F.col(cols[j])).cast("decimal(38,4)")
                )
                .cast("double")
                .alias(f"p{i}_{j}")
            )
    row = d.agg(*aggs)
    pairs = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            num = F.col("n") * F.col(f"p{i}_{j}") - F.col(f"s{i}") * F.col(
                f"s{j}"
            )
            den = F.sqrt(
                F.col("n") * F.col(f"p{i}_{i}")
                - F.col(f"s{i}") * F.col(f"s{i}")
            ) * F.sqrt(
                F.col("n") * F.col(f"p{j}_{j}")
                - F.col(f"s{j}") * F.col(f"s{j}")
            )
            pairs.append(
                F.struct(
                    F.lit(cols[i]).alias("col_x"),
                    F.lit(cols[j]).alias("col_y"),
                    (num / den).alias("corr"),
                )
            )
    return row.select(
        F.explode(F.array(*pairs)).alias("e")
    ).select("e.col_x", "e.col_y", "e.corr")


def corr_matrix_oracle_sql(table: str, cols: list[str]) -> str:
    """Mirror of `corr_matrix` for DuckDB, same sums and the same final
    double expression tree (NOT DuckDB's corr(), which accumulates floats
    in its own order)."""
    sel = ["CAST(count(*) AS DOUBLE) AS n"]
    for i, c in enumerate(cols):
        sel.append(
            f"CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s{i}"
        )
        for j in range(i, len(cols)):
            sel.append(
                f"CAST(sum(CAST(CAST({c} AS DECIMAL(18,2))"
                f" * CAST({cols[j]} AS DECIMAL(18,2))"
                f" AS DECIMAL(38,4))) AS DOUBLE) AS p{i}_{j}"
            )
    parts = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            parts.append(
                f"SELECT '{cols[i]}' AS col_x, '{cols[j]}' AS col_y,\n"
                f"  (n * p{i}_{j} - s{i} * s{j})\n"
                f"  / (sqrt(n * p{i}_{i} - s{i} * s{i})"
                f" * sqrt(n * p{j}_{j} - s{j} * s{j})) AS corr\n"
                f"FROM a"
            )
    return (
        f"WITH a AS (SELECT {', '.join(sel)} FROM {table})\n"
        + "\nUNION ALL\n".join(parts)
    )


def _psi_bin_expr(value: str, boundaries: list[float]):
    """bin = number of boundaries at or below the value (codegen CASE
    chain, 0-based; NULL values excluded by the caller)."""
    out = F.lit(0)
    for b in boundaries:
        out = out + F.when(F.col(value) >= F.lit(float(b)), 1).otherwise(0)
    return out


def psi_bins(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    boundaries: list[float],
) -> DataFrame:
    """Population stability index between a reference and a current
    snapshot of ``value_col`` — THE standard per-feature drift gate
    (PSI < 0.1 stable, > 0.25 drifted) and the distribution-shape
    complement of the KS statistic above (KS = max CDF gap; PSI weights
    every bin).

    Per bin b: ``psi_term = (p_b - q_b) * ln(p_b / q_b)`` with the
    deterministic Laplace smoothing ``p_b = (n_b + 0.5)/(N + 0.5*B)`` on
    BOTH sides (so empty bins never divide by zero and the formula is one
    fixed shape).  Each term is rounded to 6dp at the bin level — the
    single libm ``ln`` per bin cannot accumulate ulp drift into the total
    (the lm_fluency pattern), so the per-bin rows are cross-engine exact.

    Plan: one codegen CASE projection + one count aggregate per side
    (map-side combined, shuffle = B rows), then a B-row join.  At 100 TB
    both sides are single scans; nothing is proportional to n after the
    partial aggregate.
    """
    if not boundaries:
        raise ValueError("boundaries must be non-empty")
    nb = len(boundaries) + 1

    def side(df: DataFrame, n_name: str) -> DataFrame:
        return (
            df.where(F.col(value_col).isNotNull())
            .groupBy(_psi_bin_expr(value_col, boundaries).alias("bin"))
            .agg(F.count(F.lit(1)).cast("long").alias(n_name))
        )

    spark = ref.sparkSession
    bins = spark.range(nb).select(F.col("id").cast("int").alias("bin"))
    r = side(ref, "ref_n")
    c = side(cur, "cur_n")
    joined = (
        bins.join(r, "bin", "left")
        .join(c, "bin", "left")
        .fillna(0, subset=["ref_n", "cur_n"])
    )
    rt = joined.agg(F.sum("ref_n")).collect()[0][0] or 0
    ct = joined.agg(F.sum("cur_n")).collect()[0][0] or 0
    p = (F.col("ref_n") + 0.5) / F.lit(rt + 0.5 * nb)
    q = (F.col("cur_n") + 0.5) / F.lit(ct + 0.5 * nb)
    return joined.select(
        "bin",
        "ref_n",
        "cur_n",
        F.round(p, 6).alias("ref_frac"),
        F.round(q, 6).alias("cur_frac"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )


def psi_oracle_sql(
    ref_sql: str,
    cur_sql: str,
    value_sql: str,
    boundaries: list[float],
) -> str:
    """DuckDB twin of :func:`psi_bins` — same bin CASE chain, same
    smoothing shape, same per-bin 6dp rounding."""
    nb = len(boundaries) + 1
    bin_expr = " + ".join(
        f"CASE WHEN v >= {float(b)!r} THEN 1 ELSE 0 END" for b in boundaries
    )
    return f"""
WITH refv AS (SELECT {value_sql} AS v FROM ({ref_sql}) r WHERE {value_sql} IS NOT NULL),
curv AS (SELECT {value_sql} AS v FROM ({cur_sql}) c WHERE {value_sql} IS NOT NULL),
bins AS (SELECT CAST(range AS INT) AS bin FROM range(0, {nb})),
rc AS (SELECT ({bin_expr}) AS bin, count(*) AS ref_n FROM refv GROUP BY 1),
cc AS (SELECT ({bin_expr}) AS bin, count(*) AS cur_n FROM curv GROUP BY 1),
j AS (
  SELECT bins.bin,
         coalesce(rc.ref_n, 0) AS ref_n,
         coalesce(cc.cur_n, 0) AS cur_n
  FROM bins LEFT JOIN rc ON rc.bin = bins.bin LEFT JOIN cc ON cc.bin = bins.bin
), tot AS (
  SELECT sum(ref_n) AS rt, sum(cur_n) AS ct FROM j
)
SELECT j.bin, j.ref_n, j.cur_n,
       round((j.ref_n + 0.5) / (tot.rt + {0.5 * nb!r}), 6) AS ref_frac,
       round((j.cur_n + 0.5) / (tot.ct + {0.5 * nb!r}), 6) AS cur_frac,
       round(((j.ref_n + 0.5) / (tot.rt + {0.5 * nb!r})
              - (j.cur_n + 0.5) / (tot.ct + {0.5 * nb!r}))
             * ln(((j.ref_n + 0.5) / (tot.rt + {0.5 * nb!r}))
                  / ((j.cur_n + 0.5) / (tot.ct + {0.5 * nb!r}))), 6)
         AS psi_term
FROM j, tot
"""
