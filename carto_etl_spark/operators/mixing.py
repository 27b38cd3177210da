"""Dataset mixture planning — compose a training epoch from weighted
sources under a token budget (the Pile/DoReMi-style mixing step: some
sources are over-sampled with repetition, others down-sampled, so the
epoch hits a target share per source).

Not in the reference (it moves rows, it does not compose corpora); a
first-class LLM-pipeline operator: given per-source mixture weights and a
size budget, every source gets ``repeat = target_size / source_size``
epochs — ``floor(repeat)`` full passes plus a deterministic hash-sampled
fraction — and the expansion is a pure scan-stage ``explode(sequence)``
over a broadcast plan, so composing a 100 TB epoch is one map pass with
no shuffle (the plan table is sources-sized).

Everything is declarative and engine-portable: the plan math (weight
normalization, targets, repeat factors, fractional keep-thresholds in
Lehmer hash units) is DataFrame column arithmetic with a fixed double
operation order, and the per-row fractional keep decision reuses
``sampling.hash_expr`` — so a SQL oracle re-derives the plan AND the
materialized epoch row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from carto_etl_spark.operators.sampling import LEHMER_M, hash_expr, hash_sql

COPY_COL = "copy_id"


def _weight_expr(source_col: str, weights: dict[str, float], default: float) -> Column:
    w = F.lit(float(default))
    for value, wt in sorted(weights.items()):
        w = F.when(F.col(source_col) == value, F.lit(float(wt))).otherwise(w)
    return w


def epoch_plan(
    df: DataFrame,
    source_col: str,
    size_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    budget_multiple: int = 3,
) -> DataFrame:
    """Sources-sized plan table: per source its current size, the epoch
    target (normalized weight share of ``budget_multiple x`` the corpus),
    full-copy count, and the fractional-pass keep threshold in hash units.

    One map-side-combined aggregate over the corpus; the scalar total
    attaches via a single-row broadcast (never a driver round-trip), so the
    plan composes into a larger job without an action.

    Rows with a NULL source are excluded from BOTH the budget totals and
    the epoch (materialize_epoch's equi-join would drop them anyway — a
    NULL group that still inflated the normalization would silently
    deflate every real source's target)."""
    totals = (
        df.where(F.col(source_col).isNotNull())
        .groupBy(source_col)
        .agg(F.sum(F.col(size_col).cast("long")).alias("have"))
    )
    grand = totals.select(
        F.sum("have").alias("__total"),
        F.sum(
            _weight_expr(source_col, weights, default_weight)
        ).alias("__sum_w"),
    )
    wt = _weight_expr(source_col, weights, default_weight)
    # fixed double order, mirrored in SQL: target = (w / sum_w) * (k*total);
    # repeat = target / have
    target = (wt / F.col("__sum_w")) * (
        F.lit(int(budget_multiple)) * F.col("__total")
    ).cast("double")
    rpt = target / F.col("have").cast("double")
    return (
        totals.join(F.broadcast(grand))
        .withColumn("target_size", target)
        .withColumn("full_copies", F.floor(rpt).cast("int"))
        .withColumn(
            "frac_threshold",
            F.floor((rpt - F.floor(rpt)) * F.lit(LEHMER_M)).cast("long"),
        )
        .select(
            source_col, "have", "target_size", "full_copies", "frac_threshold"
        )
    )


def materialize_epoch(
    df: DataFrame,
    plan: DataFrame,
    source_col: str,
    key_col: str,
    salt: int = 0,
) -> DataFrame:
    """Expand the corpus into the epoch: each row appears in copies
    0..full_copies-1 unconditionally plus copy ``full_copies`` iff its hash
    clears the source's fractional threshold.  ``explode(sequence(...))``
    plus the broadcast plan keeps this a single scan-stage pass — row
    destinations never shuffle.

    ``key_col`` must be integral: the fractional keep decision runs
    through ``sampling.hash_expr``, whose ``cast('long')`` turns a string
    key into NULL and would silently drop the whole fractional pass.
    String-keyed corpora should derive an integer key first (md5-prefix
    int, the repo-standard recipe)."""
    ktype = dict(df.dtypes).get(key_col)
    if ktype not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(
            f"key_col {key_col!r} must be an integral column for the "
            f"fractional-pass hash, got {ktype!r}; derive an int key "
            "(e.g. md5-prefix) upstream"
        )
    staged = df.join(F.broadcast(plan), source_col)
    out = staged.withColumn(
        COPY_COL,
        F.explode(F.sequence(F.lit(0), F.col("full_copies"))),
    ).where(
        (F.col(COPY_COL) < F.col("full_copies"))
        | (hash_expr(key_col, salt) < F.col("frac_threshold"))
    )
    return out.drop("have", "target_size", "full_copies", "frac_threshold")


def epoch_plan_sql(
    source_sql: str,
    source_col: str,
    size_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    budget_multiple: int = 3,
) -> str:
    """DuckDB twin of ``epoch_plan`` (kept beside it so the plan math can
    never drift): same normalization, same double order, same floor/hash
    units."""
    cases = " ".join(
        f"WHEN '{v}' THEN {float(w)}" for v, w in sorted(weights.items())
    )
    wt = f"(CASE {source_col} {cases} ELSE {float(default_weight)} END)"
    return f"""
SELECT {source_col}, have, target_size,
       CAST(floor(rpt) AS INTEGER) AS full_copies,
       CAST(floor((rpt - floor(rpt)) * {LEHMER_M}) AS BIGINT) AS frac_threshold
FROM (
  SELECT {source_col}, have,
         ({wt} / sum_w) * CAST({int(budget_multiple)} * total AS DOUBLE)
             AS target_size,
         (({wt} / sum_w) * CAST({int(budget_multiple)} * total AS DOUBLE))
             / CAST(have AS DOUBLE) AS rpt
  FROM (
    SELECT {source_col}, CAST(sum({size_col}) AS BIGINT) AS have FROM
      ({source_sql}) WHERE {source_col} IS NOT NULL GROUP BY {source_col}) t
  CROSS JOIN (
    SELECT CAST(sum(have) AS BIGINT) AS total, sum({wt}) AS sum_w
    FROM (SELECT {source_col}, CAST(sum({size_col}) AS BIGINT) AS have
          FROM ({source_sql}) WHERE {source_col} IS NOT NULL
          GROUP BY {source_col}))
)
"""


def epoch_counts_sql(
    source_sql: str,
    plan_sql: str,
    source_col: str,
    key_col: str,
    size_col: str,
    salt: int = 0,
) -> str:
    """DuckDB derivation of ``materialize_epoch`` aggregated per
    (source, copy): full copies 0..full_copies-1 each carry the whole
    source (expanded from the sources-sized plan, so the unnest is
    dimension-level), and copy ``full_copies`` carries exactly the rows
    whose hash clears the fractional threshold — every per-row copy
    decision is value-checked without materializing corpus x copies.

    (Deliberately NOT a row-level ``unnest`` replay: DuckDB 1.0 has an
    internal binder bug filtering on an unnest-derived column behind this
    plan shape — and the aggregate form is the stronger oracle anyway,
    since it derives the expected totals independently of the expansion
    mechanism.)"""
    return f"""
SELECT {source_col}, copy_id, n_docs, sum_{size_col}
FROM (
  SELECT c.{source_col}, CAST(c.copy_id AS INTEGER) AS copy_id,
         st.n_docs, st.sum_{size_col}
  FROM (
    SELECT {source_col},
           unnest(generate_series(0, full_copies - 1)) AS copy_id
    FROM ({plan_sql})) c
  JOIN (
    SELECT {source_col}, count(*) AS n_docs,
           CAST(sum({size_col}) AS BIGINT) AS sum_{size_col}
    FROM ({source_sql}) GROUP BY {source_col}) st USING ({source_col})
  UNION ALL
  SELECT d.{source_col}, CAST(p.full_copies AS INTEGER) AS copy_id,
         count(*) AS n_docs, CAST(sum(d.{size_col}) AS BIGINT) AS sum_{size_col}
  FROM ({source_sql}) d
  JOIN ({plan_sql}) p USING ({source_col})
  WHERE {hash_sql(f"d.{key_col}", salt)} < p.frac_threshold
  GROUP BY d.{source_col}, p.full_copies
)
"""
