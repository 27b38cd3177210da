"""Domain/source reputation gating — the group-level quality filter real
web pipelines run beside the per-document gates (FineWeb's URL filtering,
RefinedWeb §3.1: whole domains are kept or dropped on aggregate signals,
because a spam domain's individual pages can each look plausible).

Semantics: per-document integer quality scores roll up to exact per-group
(domain / source / crawl) statistics, a group passes when its aggregate
clears the bar, and documents ride or die with their group.  The pass
rule is evaluated WITHOUT division — ``sum_score * tau_den >= tau_num *
n_docs`` compares exact int64 products (mean >= tau_num/tau_den), so the
gate is engine-exact at any corpus size; a minimum group size guards the
small-sample regime (a 1-doc domain says nothing about the domain).

Distributed shape: one ``groupBy(group)`` hash-aggregate (map-side
combine; output is one row per domain — millions at web scale, far under
broadcast limits), then the per-group verdict BROADCAST back onto the
corpus: the second pass is a scan-stage broadcast-hash-join filter, no
shuffle of the corpus.  At 100 TB the same plan holds as long as the
domain count stays broadcastable (~10^7 rows); past that pass
``broadcast=False`` — the explicit hint is honored regardless of size,
so the caller, not the optimizer, must choose the shuffle-join plan.

The reference has no quality surface (/root/reference/etl/etl.py
delegates to PostgreSQL); part of the LLM-pipeline extension suite with
classifier.py (whose integer scores this composes) and c4rules.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["group_reputation", "gate_by_reputation", "reputation_sql"]


def group_reputation(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tau_num: int,
    tau_den: int,
    min_docs: int = 2,
) -> DataFrame:
    """Per-group verdicts: ``(group, n_docs, sum_score, grp_ok)`` where
    ``grp_ok = n_docs >= min_docs AND sum_score * tau_den >= tau_num *
    n_docs`` — the exact-integer form of ``mean(score) >= tau_num/tau_den``.
    Groups under ``min_docs`` fail closed (drop): too few documents to
    certify a domain; flip by filtering them upstream if the policy is
    keep-unknown."""
    if tau_den <= 0 or min_docs < 1:
        raise ValueError("tau_den must be positive and min_docs >= 1")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(score_col)).cast("long").alias("sum_score"),
    )
    ok = (F.col("n_docs") >= min_docs) & (
        F.col("sum_score") * F.lit(int(tau_den))
        >= F.lit(int(tau_num)) * F.col("n_docs")
    )
    return agg.select(group_col, "n_docs", "sum_score", ok.alias("grp_ok"))


def gate_by_reputation(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tau_num: int,
    tau_den: int,
    min_docs: int = 2,
    broadcast: bool = True,
) -> DataFrame:
    """Documents annotated with their group verdict: the input columns
    plus (n_docs, sum_score, grp_ok).  Consumers filter ``grp_ok``.

    ``broadcast=True`` (default) hints the one-row-per-group verdict frame
    to broadcast, making the gate a scan-stage filter on the corpus side.
    The hint is honored REGARDLESS of size (r8 ADVICE), so past ~10^7
    groups the caller must pass ``broadcast=False`` — the join then plans
    as an ordinary shuffle join on the group key; the corpus shuffles
    once, but nothing OOMs."""
    rep = group_reputation(df, group_col, score_col, tau_num, tau_den, min_docs)
    return df.join(F.broadcast(rep) if broadcast else rep, [group_col], "left")


def reputation_sql(
    rows_sql: str,
    group_col: str,
    score_sql: str,
    tau_num: int,
    tau_den: int,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of `gate_by_reputation`: ``rows_sql`` yields the doc
    frame, ``score_sql`` is the score expression over its columns."""
    return f"""
WITH __docs AS (
  SELECT r.*, ({score_sql}) AS __score FROM ({rows_sql}) r
), __rep AS (
  SELECT {group_col},
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(__score) AS BIGINT) AS sum_score
  FROM __docs GROUP BY {group_col}
)
SELECT d.* EXCLUDE (__score), r.n_docs, r.sum_score,
       (r.n_docs >= {min_docs}
        AND r.sum_score * {tau_den} >= {tau_num} * r.n_docs) AS grp_ok
FROM __docs d LEFT JOIN __rep r USING ({group_col})
"""
