"""Fellegi-Sunter probabilistic record linkage: turn candidate pairs (from
any blocking — SymSpell fuzzy_pairs, MinHash, exact keys) into principled
match scores, the way Splink/fastLink do.

For each comparison field ``f`` the model needs two probabilities:

* ``m_f`` — P(field agrees | pair IS a match): supplied by the caller
  (domain knowledge or EM-fitted elsewhere; data on its own cannot reveal
  it without labels);
* ``u_f`` — P(field agrees | pair is NOT a match): estimated from the data
  itself as the probability two RANDOM records agree, which for exact
  comparisons is sum_v c_v*(c_v-1) / (N*(N-1)) over the field's value
  counts — computed here in EXACT integer/decimal arithmetic with one
  double division at the end.

A pair's likelihood ratio is the product over fields of m/u (agree) or
(1-m)/(1-u) (disagree), with a NULL on either side skipping the field
(ratio 1 — no evidence).  No logarithms anywhere: ln differs in the last
ulp across libm implementations (the tfidf_terms lesson), while this
fixed-order product of one-division ratios is a deterministic IEEE tree
that any engine reproduces bit-for-bit.  Callers wanting log-weights can
take log2 of the emitted ratio themselves.

Scale: the u-statistics are one groupBy per field collapsed map-side to a
single row (value-cardinality-bounded, like the AUC distinct-value
reduction), broadcast to the pairs; scoring is pure column math on the
candidate set — cost tracks CANDIDATES (what blocking already bounded),
never records².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def field_u_stats(records: DataFrame, field: str) -> DataFrame:
    """One row: (u_num, u_den) decimals with u = u_num/u_den the exact
    random-agreement probability for exact comparison on ``field``
    (NULLs excluded — they are skipped at scoring time too)."""
    counts = (
        records.where(F.col(field).isNotNull())
        .groupBy(field)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.agg(
        F.sum((F.col("c") * (F.col("c") - 1)).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias(f"u_num_{field}"),
        (
            F.sum("c").cast("decimal(38,0)")
            * (F.sum("c").cast("decimal(38,0)") - 1)
        )
        .cast("decimal(38,0)")
        .alias(f"u_den_{field}"),
    )


def fellegi_sunter_scores(
    records: DataFrame,
    id_col: str,
    pairs: DataFrame,
    m_probs: dict[str, float],
) -> DataFrame:
    """Score candidate ``pairs`` (columns ``id_a``/``id_b``) against
    ``records``: per-field agreement flags (1 agree / 0 disagree / NULL
    skipped) plus the composite likelihood ratio ``lr``.

    ``m_probs`` maps field name -> m-probability; its insertion order fixes
    the multiplication order of the composite product (keep it identical in
    any external re-derivation — see ``fs_oracle_sql``)."""
    fields = list(m_probs)
    a = records.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f).alias(f"__a_{f}") for f in fields],
    )
    b = records.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f).alias(f"__b_{f}") for f in fields],
    )
    px = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")

    ustats = None
    for f in fields:
        s = field_u_stats(records, f)
        ustats = s if ustats is None else ustats.crossJoin(s)
    scored = px.join(F.broadcast(ustats), how="cross")

    lr = F.lit(1.0)
    agree_cols = []
    for f in fields:
        av, bv = F.col(f"__a_{f}"), F.col(f"__b_{f}")
        skip = av.isNull() | bv.isNull()
        agree = (av == bv).cast("int")
        agree_cols.append(
            F.when(skip, F.lit(None).cast("int"))
            .otherwise(agree)
            .alias(f"agree_{f}")
        )
        u = F.col(f"u_num_{f}").cast("double") / F.col(
            f"u_den_{f}"
        ).cast("double")
        m = float(m_probs[f])
        ratio = (
            F.when(skip, F.lit(1.0))
            .when(agree == 1, F.lit(m) / u)
            .otherwise(F.lit(1.0 - m) / (F.lit(1.0) - u))
        )
        lr = lr * ratio
    return scored.select("id_a", "id_b", *agree_cols, lr.alias("lr"))


def fs_oracle_sql(
    records_sql: str,
    pairs_sql: str,
    id_col: str,
    m_probs: dict[str, float],
) -> str:
    """DuckDB twin of ``fellegi_sunter_scores``: same u-statistics, same
    fixed-order product, and — critically — the SAME floating literals,
    emitted as ``CAST('<repr>' AS DOUBLE)``.  Two traps live here: a
    hand-written 0.05 is not the binary 1.0-0.95 (0.050000000000000044),
    and a bare numeric literal with that many digits parses as DECIMAL,
    whose DECIMAL->DOUBLE conversion is off by one ulp in DuckDB —
    string->DOUBLE is the correctly-rounded path (measured:
    3fa99999999999a1 vs 3fa99999999999a0)."""
    fields = list(m_probs)
    u_ctes = ",\n".join(
        f"""u_{f} AS (
  SELECT CAST(sum(c * (c - 1)) AS DOUBLE) AS num,
         CAST(sum(c) * (sum(c) - 1) AS DOUBLE) AS den
  FROM (SELECT count(*) AS c FROM recs WHERE {f} IS NOT NULL GROUP BY {f})
)"""
        for f in fields
    )
    agree_exprs = ",\n       ".join(
        f"CASE WHEN a.{f} IS NULL OR b.{f} IS NULL THEN NULL "
        f"WHEN a.{f} = b.{f} THEN 1 ELSE 0 END AS agree_{f}"
        for f in fields
    )
    def dbl(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    lr = "1.0"
    for f in fields:
        m = float(m_probs[f])
        ratio = (
            f"CASE WHEN a.{f} IS NULL OR b.{f} IS NULL THEN 1.0 "
            f"WHEN a.{f} = b.{f} THEN {dbl(m)} / (u_{f}.num / u_{f}.den) "
            f"ELSE {dbl(1.0 - m)} / (1.0 - (u_{f}.num / u_{f}.den)) END"
        )
        lr = f"({lr} * {ratio})"
    u_joins = " ".join(f"CROSS JOIN u_{f}" for f in fields)
    return f"""
WITH recs AS ({records_sql}),
pairs AS ({pairs_sql}),
{u_ctes}
SELECT p.id_a, p.id_b,
       {agree_exprs},
       {lr} AS lr
FROM pairs p
JOIN recs a ON a.{id_col} = p.id_a
JOIN recs b ON b.{id_col} = p.id_b
{u_joins}
"""
