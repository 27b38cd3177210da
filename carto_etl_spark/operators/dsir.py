"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick the raw-corpus documents whose hashed-n-gram
distribution looks most like a small in-domain target set.  Fit two
bag-of-hashed-n-grams unigram models (target, raw), weight every feature
by its smoothed log-likelihood ratio, score each candidate document by the
count-weighted sum of its feature LLRs, and resample top-``n`` under
Gumbel noise (Gumbel-top-k == sampling without replacement proportional
to exp(score/tau)).  The published recipe for "give me CommonCrawl that
looks like Wikipedia"; the reference has no ML/data-selection surface at
all (it delegates everything to PostgreSQL, /root/reference/etl/etl.py),
so this is part of the LLM-pipeline extension suite beside the CCNet
classifier gate (operators/classifier.py) and quality_mixture.

Determinism contract (the bigram_lm pattern, operators/text.py:506): all
counts are exact integers; each feature's LLR is four ``ln`` calls summed
and immediately round()-ed to MICRO-nat integers (one knife-edge libm ulp
can move a weight by 1e-6 nat — the same accepted per-term risk bigram_lm
documents), after which EVERYTHING downstream is exact int64 arithmetic:
per-doc score = sum(count * llr_micro), Gumbel key = score*tau_den +
g_micro*tau_num, ordering on (key, id).  The Gumbel uniform comes from a
52-bit md5 slice of the document id — engine-reproducible, seedable by
``salt``, and partition-invariant.

Distributed shape (nothing driver-side scales with the corpus):
- fit: two global ``groupBy(feature)`` hash-aggregates (map-side combine;
  output is <= ``dim`` rows each) + one dim-sized full-outer join.  The
  two corpus token totals are collected as 2 longs (parameter-server
  scalar state, same as the classifier's weight vector).
- score: per-doc sparse features (one shuffle, operators/text.py
  hashed_features) broadcast-joined against the <=dim-row weight table,
  then one ``groupBy(id)`` hash-aggregate.
- select: ``orderBy(key).limit(n)`` — Spark plans TakeOrderedAndProject
  (per-partition top-n + driver merge), no global sort shuffle.

At 100 TB the same plan holds: weights stay broadcast-sized (dim is
fixed), both aggregates combine map-side, and the top-n never
materializes a sort.  Overflow envelope: |llr_micro| <= ~45e6 (ln ratio
bounded by ln of total token count), so a doc needs ~2e11 tokens to
threaten int64 — far past any real document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from carto_etl_spark.operators.text import hashed_features

__all__ = [
    "MICRO",
    "feature_counts",
    "dsir_weights",
    "dsir_scores",
    "dsir_scores_arrow",
    "gumbel_micro_expr",
    "dsir_select",
    "feature_counts_sql",
    "dsir_oracle_sql",
]

#: fixed-point scale for LLR weights and Gumbel noise: micro-nats.
MICRO = 1_000_000

#: 52-bit uniform source: md5 hex slice width and the (exclusive) divisor
#: that maps [0, 2^52) onto the open interval (0, 1).
_U_BITS = 52
_U_DEN = float((1 << _U_BITS) + 1)


def feature_counts(
    df: DataFrame, text_col: str, dim: int = 1024, ngram: int = 2
) -> DataFrame:
    """Global hashed-n-gram counts ``(feature, count)`` for one corpus —
    ``hashed_features`` with no id columns, so the groupBy collapses to a
    <= ``dim``-row frame with full map-side combining."""
    return hashed_features(df, text_col, [], dim=dim, ngram=ngram)


def _llr_micro_expr(tc: Column, rc: Column, t_total: int, r_total: int,
                    dim: int) -> Column:
    """round(1e6 * [ln(tc+1) - ln(T_t+dim) - ln(rc+1) + ln(T_r+dim)]) —
    add-one-smoothed log-likelihood ratio in micro-nats.  Logs of the two
    totals are per-engine constant-folded literals; the count logs are the
    only data-dependent libm calls."""
    v = (
        F.log((tc + F.lit(1)).cast("double"))
        - F.log(F.lit(float(t_total + dim)))
        - F.log((rc + F.lit(1)).cast("double"))
        + F.log(F.lit(float(r_total + dim)))
    )
    return F.round(v * F.lit(float(MICRO))).cast("long")


def dsir_weights(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    dim: int = 1024,
) -> tuple[DataFrame, int, int]:
    """Per-feature LLR weights from two ``(feature, count)`` frames.

    Returns ``(weights_df(feature, llr_micro), t_total, r_total)`` — the
    totals come back so callers can form the unseen-feature default with
    the same expression.  The two totals are single longs
    (parameter-server scalar state); the join output is <= ``dim`` rows.

    Each counts frame is localCheckpoint-ed first: it is <= ``dim`` rows
    but its LINEAGE is a full corpus scan, and without the boundary the
    total and the join side would each re-run that scan (4 corpus reads
    for a 2-corpus fit).  After the boundary each corpus is read once.
    """
    target_counts = target_counts.localCheckpoint(eager=True)
    raw_counts = raw_counts.localCheckpoint(eager=True)
    t_total = target_counts.agg(F.coalesce(F.sum("count"), F.lit(0))).first()[0]
    r_total = raw_counts.agg(F.coalesce(F.sum("count"), F.lit(0))).first()[0]
    tc = target_counts.withColumnRenamed("count", "__tc")
    rc = raw_counts.withColumnRenamed("count", "__rc")
    joined = tc.join(rc, ["feature"], "full_outer")
    w = joined.select(
        "feature",
        _llr_micro_expr(
            F.coalesce(F.col("__tc"), F.lit(0)),
            F.coalesce(F.col("__rc"), F.lit(0)),
            t_total,
            r_total,
            dim,
        ).alias("llr_micro"),
    )
    return w, int(t_total), int(r_total)


def dsir_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: DataFrame,
    t_total: int,
    r_total: int,
    dim: int = 1024,
    ngram: int = 2,
) -> DataFrame:
    """Per-document DSIR score ``(id, n_feats, score_micro)``: sparse
    hashed features broadcast-joined to the weight table, weighted counts
    summed per doc.  Features unseen in BOTH fit corpora (possible when
    scoring a third corpus) fall back to the smoothed-zero LLR, formed by
    the engine itself from the totals so no Python libm value enters the
    plan.  Docs with no tokens are kept with score 0 (empty product —
    importance weight 1)."""
    feats = hashed_features(df, text_col, [id_col], dim=dim, ngram=ngram)
    default = _llr_micro_expr(F.lit(0), F.lit(0), t_total, r_total, dim)
    scored = (
        feats.join(F.broadcast(weights), ["feature"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum(
                F.col("count") * F.coalesce(F.col("llr_micro"), default)
            ).cast("long").alias("score_micro"),
        )
    )
    base = df.select(F.col(id_col))
    return base.join(scored, [id_col], "left").select(
        id_col,
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("score_micro", F.lit(0)).cast("long").alias("score_micro"),
    )


def dsir_scores_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: DataFrame,
    t_total: int,
    r_total: int,
    dim: int = 1024,
    ngram: int = 2,
) -> DataFrame:
    """Arrow twin of `dsir_scores` for md5-bound corpora: the weight table
    collects to the driver (<= dim rows — parameter-server state, the
    classifier pattern), and one ``mapInPandas`` pass tokenizes, buckets
    through a PER-PARTITION md5 memo (one dict built in `_score_batches`
    and shared across that partition's batches — strictly better than a
    per-batch lifetime; Zipfian corpora hit the memo far more often than
    the hash), and integer-sums — no explode, no shuffle, no join.  BIT-IDENTICAL to the join path (equality-tested): same Java-\\s
    token split, same md5-prefix bucket, Python arbitrary-precision sums,
    and the unseen-feature default is EVALUATED BY THE ENGINE once (one
    ln round-trip) so no Python libm value enters the result.

    Measured at 505k docs / 54.6M features (dim=4096, ngram=2, paired
    same-session runs): join 30.0 s vs arrow 25.5 s — only ~1.2x on THIS
    corpus, because its synthetic bigrams are high-cardinality and mostly
    miss the memo (Python md5 per miss ~ JVM md5 per feature).  The twin
    still removes the (doc, feature) exchange entirely — the term that
    grows with corpus size — and on real Zipfian text (unigram-heavy,
    heavy-tailed bigrams) the memo hit rate, not the hash, dominates.
    Prefer the join path when in doubt: it is the oracle-shaped
    reference and AQE handles its skew."""
    import re

    from pyspark.sql.types import LongType, StructField, StructType

    if ngram not in (1, 2):
        raise ValueError(f"ngram must be 1 or 2, got {ngram}")
    w_map = {int(r["feature"]): int(r["llr_micro"]) for r in weights.collect()}
    spark = df.sparkSession
    default = int(
        spark.range(1)
        .select(_llr_micro_expr(F.lit(0), F.lit(0), t_total, r_total, dim))
        .first()[0]
    )
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            id_field,
            StructField("n_feats", LongType(), False),
            StructField("score_micro", LongType(), False),
        ]
    )
    split = re.compile("[ \t\n\x0b\f\r]+").split

    def _score_batches(batches):
        import hashlib

        memo: dict = {}

        def bucket(tok: str) -> int:
            b = memo.get(tok)
            if b is None:
                b = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % dim
                memo[tok] = b
            return b

        for pdf in batches:
            nfs, scores = [], []
            for text in pdf[text_col]:
                toks = [t for t in split(text) if t] if text is not None else []
                grams = list(toks)
                if ngram == 2:
                    grams += [
                        f"{a} {b}" for a, b in zip(toks, toks[1:])
                    ]
                feats: dict = {}
                for g in grams:
                    b = bucket(g)
                    feats[b] = feats.get(b, 0) + 1
                nfs.append(len(feats))
                scores.append(
                    sum(c * w_map.get(f, default) for f, c in feats.items())
                )
            out = pdf[[id_col]].copy()
            out["n_feats"] = nfs
            out["score_micro"] = scores
            yield out

    return df.mapInPandas(_score_batches, schema=out_schema)


def gumbel_micro_expr(id_col: Column | str, salt: int = 0) -> Column:
    """Standard Gumbel(0,1) noise in micro-nats, derived from a 52-bit md5
    slice of ``'g{salt}:' || id``: u in (0,1) exactly representable, then
    round(-ln(-ln(u)) * 1e6).  Reproducible across engines, partitions,
    and runs; vary ``salt`` to redraw."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"g{salt}:"), c.cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(_U_DEN)
    return F.round(-F.log(-F.log(u)) * F.lit(float(MICRO))).cast("long")


def dsir_select(
    scores: DataFrame,
    id_col: str,
    n: int,
    salt: int = 0,
    tau_num: int = 1,
    tau_den: int = 1,
) -> DataFrame:
    """Gumbel-top-k resampling: key = score*tau_den + gumbel*tau_num (the
    integer-exact form of score/tau + g, tau = tau_num/tau_den), take the
    ``n`` largest with id tie-break.  Plans as TakeOrderedAndProject — no
    global sort."""
    g = gumbel_micro_expr(id_col, salt)
    keyed = scores.select(
        id_col,
        "score_micro",
        (F.col("score_micro") * F.lit(int(tau_den)) + g * F.lit(int(tau_num)))
        .cast("long")
        .alias("key_micro"),
    )
    return keyed.orderBy(F.desc("key_micro"), F.col(id_col)).limit(n)


# ---------------------------------------------------------------------------
# DuckDB oracle builders
# ---------------------------------------------------------------------------

def _toks_sql(ngram: int) -> str:
    base = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"
    if ngram == 1:
        return f"SELECT __did, {base} AS t"
    if ngram == 2:
        return (
            f"SELECT __did, list_concat(t, list_transform("
            "range(1, greatest(len(t), 1)), i -> t[i] || ' ' || t[i+1])) AS t "
            f"FROM (SELECT __did, {base} AS t"
        )
    raise ValueError(f"ngram must be 1 or 2, got {ngram}")


def feature_counts_sql(rows_sql: str, dim: int, ngram: int = 2) -> str:
    """Global-counts twin of `feature_counts`: ``rows_sql`` must yield a
    ``text`` column.  Same md5-prefix bucketing as hashed_features."""
    head = _toks_sql(ngram)
    tail = ") r" if ngram == 2 else ""
    return f"""
WITH __b AS (
  {head} FROM (SELECT 0 AS __did, text FROM ({rows_sql}) src) q{tail}
), __t AS (SELECT unnest(t) AS tok FROM __b)
SELECT CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {dim} AS INT)
         AS feature,
       CAST(count(*) AS BIGINT) AS count
FROM __t GROUP BY feature
"""


def dsir_oracle_sql(
    target_sql: str,
    raw_sql: str,
    score_sql: str,
    id_col: str,
    dim: int = 1024,
    ngram: int = 2,
    n: int = 100,
    salt: int = 0,
    tau_num: int = 1,
    tau_den: int = 1,
) -> str:
    """Full fit + score + Gumbel-top-k chain for DuckDB.  ``score_sql``
    must yield (id, text); the target/raw fits use `feature_counts_sql`.
    Mirrors every rounding boundary of the Spark path."""
    tc = feature_counts_sql(target_sql, dim, ngram)
    rc = feature_counts_sql(raw_sql, dim, ngram)
    llr = (
        "CAST(round((ln(CAST({tc} + 1 AS DOUBLE))"
        f" - ln(CAST(tt.t + {dim} AS DOUBLE))"
        " - ln(CAST({rc} + 1 AS DOUBLE))"
        f" + ln(CAST(rt.t + {dim} AS DOUBLE))) * 1000000.0) AS BIGINT)"
    )
    w_llr = llr.format(tc="COALESCE(tc.count, 0)", rc="COALESCE(rc.count, 0)")
    d_llr = llr.format(tc="0", rc="0")
    head = _toks_sql(ngram).replace("__did", id_col)
    tail = ") r" if ngram == 2 else ""
    return f"""
WITH tc AS ({tc}), rc AS ({rc}),
tt AS (SELECT COALESCE(SUM(count), 0) AS t FROM tc),
rt AS (SELECT COALESCE(SUM(count), 0) AS t FROM rc),
w AS (
  SELECT COALESCE(tc.feature, rc.feature) AS feature, {w_llr} AS llr_micro
  FROM tc FULL OUTER JOIN rc ON tc.feature = rc.feature
  CROSS JOIN tt CROSS JOIN rt
),
sb AS (
  {head} FROM (SELECT {id_col}, text FROM ({score_sql}) src) q{tail}
),
st AS (SELECT {id_col}, unnest(t) AS tok FROM sb),
sf AS (
  SELECT {id_col},
         CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {dim} AS INT)
           AS feature,
         CAST(count(*) AS BIGINT) AS count
  FROM st GROUP BY {id_col}, feature
),
ds AS (
  SELECT sf.{id_col},
         CAST(SUM(sf.count * COALESCE(w.llr_micro,
             (SELECT {d_llr} FROM tt, rt))) AS BIGINT) AS score_micro
  FROM sf LEFT JOIN w ON sf.feature = w.feature
  GROUP BY sf.{id_col}
),
scored AS (
  SELECT b.{id_col}, CAST(COALESCE(ds.score_micro, 0) AS BIGINT) AS score_micro
  FROM (SELECT {id_col} FROM ({score_sql}) src2) b
  LEFT JOIN ds ON b.{id_col} = ds.{id_col}
),
keyed AS (
  SELECT {id_col}, score_micro,
         CAST(score_micro * {tau_den}
              + CAST(round(-ln(-ln(
                  (CAST(CAST(('0x' || substr(md5('g{salt}:' ||
                       CAST({id_col} AS VARCHAR)), 1, 13)) AS BIGINT)
                       AS DOUBLE) + 1) / {_U_DEN!r}
                )) * 1000000.0) AS BIGINT) * {tau_num}
              AS BIGINT) AS key_micro
  FROM scored
)
SELECT {id_col}, score_micro, key_micro
FROM keyed ORDER BY key_micro DESC, {id_col} LIMIT {n}
"""
