"""Data-quality constraint suite: declare a list of expectations (not-null,
uniqueness, ranges, set membership, regex shape, free-form predicates,
referential integrity) and evaluate them over a table in as few passes as the
constraint mix allows — the pre-flight gate a 100 TB ingest runs before
publishing a snapshot, and the post-load assertion layer the reference's
users run by hand as ad-hoc SQL today.

Not in the reference (its scope ends at SQL-text DML,
/root/reference/etl/etl.py); a north-star utility operator in the spirit of
Deequ's analyzer-batching design (one job computes many metrics).

Plan shape — the property that makes this scale:
- ALL scalar constraints (not_null / in_range / in_set / matches / satisfies
  / unique) collapse into ONE global aggregate over ONE scan of the table:
  conditional counts are map-side partial sums, and uniqueness rides the same
  Aggregate as a count-distinct.  Checking 50 constraints costs one pass over
  the bytes, not 50 table scans.
- each referential (foreign-key) constraint adds one semi-join pass; the
  reference side is aggregated to distinct keys first and broadcast when
  small, so the fact table is never shuffled for containment checks.
- the report is a handful of rows; ``passed`` aggregates client-side cost 0.

Every constraint returns (check, target, n_rows, violations, passed) so a
suite is itself a DataFrame — filter ``passed = false`` and fail the job, or
append it to a history table for drift monitoring.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declared expectation.  ``kind`` drives the evaluation strategy;
    scalar kinds share a single aggregation pass, ``foreign_key`` plans its
    own join."""

    kind: str
    target: str              # column (or comma-joined columns) under test
    name: str                # report label
    params: tuple = field(default=())
    tolerance: float = 0.0   # max allowed violation fraction (0 = strict)


def not_null(col: str, tolerance: float = 0.0) -> Check:
    return Check("not_null", col, f"not_null({col})", tolerance=tolerance)


def unique(*cols: str) -> Check:
    t = ",".join(cols)
    return Check("unique", t, f"unique({t})", params=tuple(cols))


def in_range(col: str, lo=None, hi=None, tolerance: float = 0.0) -> Check:
    if lo is None and hi is None:
        raise ValueError("in_range needs at least one bound")
    return Check("in_range", col, f"in_range({col})", params=(lo, hi),
                 tolerance=tolerance)


def in_set(col: str, values: Sequence, tolerance: float = 0.0) -> Check:
    return Check("in_set", col, f"in_set({col})", params=tuple(values),
                 tolerance=tolerance)


def matches(col: str, pattern: str, tolerance: float = 0.0) -> Check:
    return Check("matches", col, f"matches({col})", params=(pattern,),
                 tolerance=tolerance)


def satisfies(name: str, predicate: str, tolerance: float = 0.0) -> Check:
    """Free-form SQL predicate; a row violates when the predicate is not
    TRUE (NULL counts as a violation, as an assertion should)."""
    return Check("satisfies", name, name, params=(predicate,),
                 tolerance=tolerance)


def foreign_key(col: str, ref_name: str, ref_col: str) -> Check:
    """Every non-null ``col`` value must exist in ``ref[ref_col]``.  The ref
    DataFrame is supplied to :func:`run_checks` via ``refs={ref_name: df}``."""
    return Check("foreign_key", col, f"foreign_key({col}->{ref_name}.{ref_col})",
                 params=(ref_name, ref_col))


def _violation_expr(c: Check) -> Column:
    col = F.col(c.target)
    if c.kind == "not_null":
        return F.count(F.lit(1)) - F.count(col)
    if c.kind == "in_range":
        lo, hi = c.params
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (col < F.lit(lo))
        if hi is not None:
            cond = cond | (col > F.lit(hi))
        return F.sum(F.when(col.isNotNull() & cond, 1).otherwise(0))
    if c.kind == "in_set":
        return F.sum(
            F.when(col.isNotNull() & ~col.isin(list(c.params)), 1).otherwise(0)
        )
    if c.kind == "matches":
        return F.sum(
            F.when(col.isNotNull() & ~col.rlike(c.params[0]), 1).otherwise(0)
        )
    if c.kind == "satisfies":
        pred = F.expr(c.params[0])
        return F.sum(F.when(pred, 0).otherwise(1))
    if c.kind == "unique":
        cols = [F.col(x) for x in c.params]
        all_nn = cols[0].isNotNull()
        for x in cols[1:]:
            all_nn = all_nn & x.isNotNull()
        # SQL count-distinct semantics drop tuples with any NULL on both
        # engines, so measure duplicates over the fully-non-null tuples only
        return F.sum(F.when(all_nn, 1).otherwise(0)) - F.countDistinct(*cols)
    raise ValueError(f"unknown scalar check kind: {c.kind}")


def run_checks(
    df: DataFrame,
    checks: Sequence[Check],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate every check; one report row per check:
    (check, target, n_rows, violations, passed)."""
    refs = refs or {}
    scalar = [c for c in checks if c.kind != "foreign_key"]
    fks = [c for c in checks if c.kind == "foreign_key"]
    for c in fks:
        if c.params[0] not in refs:
            raise ValueError(
                f"foreign_key check {c.name!r} needs refs[{c.params[0]!r}]"
            )

    parts: list[DataFrame] = []
    if scalar:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, c in enumerate(scalar):
            aggs.append(_violation_expr(c).cast("long").alias(f"__v_{i}"))
        row = df.agg(*aggs)
        entries = [
            F.struct(
                F.lit(c.name).alias("check"),
                F.lit(c.target).alias("target"),
                F.col("__n").alias("n_rows"),
                F.coalesce(F.col(f"__v_{i}"), F.lit(0)).alias("violations"),
                (
                    F.coalesce(F.col(f"__v_{i}"), F.lit(0))
                    <= F.lit(float(c.tolerance)) * F.col("__n")
                ).alias("passed"),
            )
            for i, c in enumerate(scalar)
        ]
        parts.append(
            row.select(F.explode(F.array(*entries)).alias("r")).select("r.*")
        )

    for c in fks:
        ref_name, ref_col = c.params
        # distinct keys first: the broadcast payload is the key domain, not
        # the reference table; anti-join leaves exactly the orphan rows
        ref_keys = refs[ref_name].select(F.col(ref_col).alias("__k")).distinct()
        col = F.col(c.target)
        orphans = (
            df.where(col.isNotNull())
            .join(
                F.broadcast(ref_keys),
                on=col == F.col("__k"),
                how="left_anti",
            )
        )
        agg = df.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
            orphans.agg(F.count(F.lit(1)).cast("long").alias("violations"))
        )
        parts.append(
            agg.select(
                F.lit(c.name).alias("check"),
                F.lit(c.target).alias("target"),
                "n_rows",
                "violations",
                (F.col("violations") == 0).alias("passed"),
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def assert_checks(df: DataFrame, checks: Sequence[Check],
                  refs: dict[str, DataFrame] | None = None) -> None:
    """Fail fast: raise ``ValueError`` listing every failed check."""
    report = run_checks(df, checks, refs)
    failed = [
        f"{r['check']}: {r['violations']}/{r['n_rows']} rows violate"
        for r in report.where(~F.col("passed")).collect()
    ]
    if failed:
        raise ValueError("data-quality checks failed: " + "; ".join(failed))
