"""Skew mitigation: salted joins and two-stage aggregation.

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew at
runtime, but two cases still need explicit salting at 100 TB:

- a skewed join key where the small side is too big to broadcast: replicate
  the small side ``salt_factor`` times and scatter the big side's hot keys
  across salts so no single task owns a hot key;
- exact distinct-count on skewed groups: a single hot group funnels every
  distinct value through one task unless the distinct pass is split.

Both transformations are semantics-preserving (equivalence-tested against the
unsalted plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's rows scattered over ``salt_factor``
    sub-keys and the small side replicated once per salt.  The shuffle key
    becomes (key, salt), so a hot key spreads across ``salt_factor`` tasks.

    Deterministic salt (hash of the whole big row) — no RNG, so retries and
    resumed stages land rows on the same salt."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), salt_factor)
    big_s = big.withColumn("__salt", salt.cast("int"))
    small_s = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])),
    )
    out = big_s.join(small_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def two_stage_count_distinct(
    df: DataFrame, group_col: str, distinct_col: str
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per group without funneling a hot group
    through one task: stage 1 reduces to distinct (group, value) pairs
    (shuffle key includes the value, so a hot group spreads), stage 2 counts
    pairs per group."""
    pairs = df.select(group_col, distinct_col).distinct()
    return pairs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias(f"n_distinct_{distinct_col}")
    )


def top_hot_keys(
    df: DataFrame, key_col: str, threshold_ratio: float = 0.01, top_n: int = 20
) -> DataFrame:
    """Diagnostic: keys holding more than ``threshold_ratio`` of all rows —
    the candidates for salting / broadcast isolation."""
    total = df.count()
    return (
        df.groupBy(key_col)
        .count()
        .filter(F.col("count") > total * threshold_ratio)
        .orderBy(F.desc("count"))
        .limit(top_n)
    )
