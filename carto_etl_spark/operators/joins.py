"""Join operators beyond Catalyst's built-ins: as-of (time-travel) join and
range join — the custom-operator tier for time-series workloads (not in the
reference, which delegates all joins to PostgreSQL; SURVEY §2.5).

Two as-of strategies, both shuffle-once:

- ``asof_join`` (default): equi-join on key + time predicate + window pick of
  the latest right row.  Pure DataFrame ops — Catalyst plans a shuffle join
  and one window; right-sized when each key's right side is bounded (the
  common case: per-entity state tables).
- ``asof_join_pandas``: co-partition both sides by key, then
  ``applyInPandas`` with a per-group sorted merge (pandas merge_asof) —
  linear per group instead of candidate x candidate, for keys with very
  large right sides.

Range join: interval containment via bucketed equi-join so Catalyst gets an
equi-condition to hash on, instead of a cartesian nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction="backward"; "forward" takes the
    smallest ``right_ts >= left_ts``) sharing the join key.  Left rows with
    no match keep NULL right columns (left join semantics, like
    pandas.merge_asof)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    renamed = right
    for c in rcols:
        renamed = renamed.withColumnRenamed(
            c, c + suffix if c in lcols else c
        )
    rts = right_ts + suffix if right_ts in lcols else right_ts
    rout = [c + suffix if c in lcols else c for c in rcols]

    pred = (
        (F.col(rts) <= F.col(left_ts))
        if direction == "backward"
        else (F.col(rts) >= F.col(left_ts))
    )
    order = F.col(rts).desc() if direction == "backward" else F.col(rts).asc()

    # unique left-row id so duplicate left rows each keep their match
    tagged = left.withColumn("__lid", F.monotonically_increasing_id())
    joined = tagged.join(renamed, on=on, how="left").withColumn("__ok", pred)
    w = Window.partitionBy("__lid").orderBy(F.col("__ok").desc(), order)
    picked = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    # rows whose best candidate fails the predicate -> NULL right side
    out_cols = [F.col(c) for c in lcols] + [
        F.when(F.col("__ok"), F.col(c)).alias(c) for c in rout
    ]
    return picked.select(*out_cols)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """Scale path: co-group both sides by key and run a linear sorted merge
    per group (Arrow-batched).  Equivalent semantics to ``asof_join``."""
    import pandas as pd

    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    rout = [c + suffix if c in lcols else c for c in rcols]
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(left.schema.fields)
        + [
            T.StructField(
                name,
                right.schema[c].dataType,
            )
            for name, c in zip(rout, rcols)
        ]
    )

    rts_out = right_ts + suffix if right_ts in lcols else right_ts

    def merge(lpdf, rpdf):
        lpdf = lpdf.sort_values(left_ts)
        rpdf = rpdf.sort_values(right_ts).rename(
            columns=dict(zip(rcols, rout))
        )
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        if rpdf.empty:
            merged = lpdf.copy()
            for c in rout:
                merged[c] = None
            return merged
        merged = pd.merge_asof(
            lpdf,
            rpdf.drop(columns=[on]),
            left_on=left_ts,
            right_on=rts_out,
            direction=direction,
        )
        return merged[[f.name for f in out_schema.fields]]

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(
        merge, schema=out_schema
    )


def range_join(
    left: DataFrame,
    points: DataFrame,
    start: str,
    end: str,
    point: str,
    bucket_width: int,
) -> DataFrame:
    """Interval containment join (start <= point < end) executed as a
    bucketed equi-join: each interval is exploded into the buckets it spans,
    each point hashes to one bucket — Catalyst gets an equi-key and plans a
    hash join instead of a nested loop.  ``bucket_width`` should be ~the
    typical interval length (wider = fewer duplicates, narrower = tighter
    candidate sets)."""
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bucket_width),
                F.floor((F.col(end) - 1) / bucket_width),
            )
        ),
    )
    pb = points.withColumn("__bucket", F.floor(F.col(point) / bucket_width))
    return (
        lb.join(pb, "__bucket")
        .filter((F.col(point) >= F.col(start)) & (F.col(point) < F.col(end)))
        .drop("__bucket")
    )
