"""Reshaping: pivot (long → wide) and unpivot (wide → long) with
deterministic column order and explicit scale guards.

Not in the reference (its scope ends at SQL-text DML,
/root/reference/etl/etl.py); a north-star analytics operator — the report
shape every BI consumer asks of a fact table.

Plan shape / scale posture:
- a pivot with EXPLICIT values is one ordinary shuffle: Catalyst rewrites it
  to a single aggregate with one conditional expression per (value, agg)
  pair — no per-value scans.  A pivot with implicit values needs a distinct
  job over the pivot column first; ``pivot_table`` allows it but caps the
  discovered domain (``max_values``) so a miskeyed pivot column (say,
  customer id) errors out instead of planning a million-column aggregate.
- discovered values are SORTED so the output schema is deterministic —
  resilient to partition order, which Spark's raw ``pivot()`` is not when
  values are discovered.
- unpivot is Spark's native ``unpivot`` (map-side ``Expand``; no shuffle,
  no Python).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_table(
    df: DataFrame,
    keys: list[str],
    pivot_col: str,
    aggs: Mapping[str, Column],
    values: list | None = None,
    max_values: int = 1000,
    prefix: str = "",
) -> DataFrame:
    """Wide report: one row per ``keys``, one column per (pivot value, agg).
    Column names: ``{prefix}{value}`` for a single agg, else
    ``{prefix}{value}_{agg_name}``.  ``values=None`` discovers the domain
    (extra distinct pass; capped at ``max_values`` and sorted so the schema
    is deterministic)."""
    if values is None:
        found = (
            df.select(pivot_col).distinct().limit(max_values + 1).collect()
        )
        if len(found) > max_values:
            raise ValueError(
                f"pivot domain of {pivot_col!r} exceeds max_values="
                f"{max_values}; pass explicit values or raise the cap"
            )
        values = sorted(r[0] for r in found if r[0] is not None)
    named = list(aggs.items())
    agged = (
        df.groupBy(*keys)
        .pivot(pivot_col, list(values))
        .agg(*[expr.alias(name) for name, expr in named])
    )
    # Spark names columns "<value>" (single agg) or "<value>_<agg>"; apply
    # the prefix and keep our own naming stable across Spark versions
    out = agged
    for v in values:
        if len(named) == 1:
            out = out.withColumnRenamed(str(v), f"{prefix}{v}")
        else:
            for name, _ in named:
                out = out.withColumnRenamed(
                    f"{v}_{name}", f"{prefix}{v}_{name}"
                )
    return out


def unpivot(
    df: DataFrame,
    keys: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long: one output row per (input row, value column).  Native
    ``unpivot`` — a map-side Expand, no shuffle."""
    return df.unpivot(
        [F.col(k) for k in keys],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )
