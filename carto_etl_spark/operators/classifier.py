"""Trainable quality classifier — the CCNet/GPT-3 "classifier quality
gate" (Wenzek et al. 2020 arXiv:1911.00359 §4.4; Brown et al. 2020
arXiv:2005.14165 appendix A): train a linear classifier on labeled
documents, then score every corpus document at scan time and keep the
high-quality tail.  The reference has no ML surface (it delegates all
compute to PostgreSQL, /root/reference/etl/etl.py); this module is part of
the LLM-pipeline extension suite.

Design: distributed full-batch gradient descent over hashed bag-of-words
features (operators/text.py hashed_features), in EXACT FIXED-POINT INTEGER
arithmetic — the graph.py pagerank recipe — so every training iteration is
unrollable into portable SQL and the entire train + score pipeline is
oracle-checkable value-for-value, not just AUC-for-AUC.  The price is the
logistic sigmoid: it is transcendental, so the model trains with the
piecewise-linear HARD sigmoid sigma(z) ~= clamp(z/4 + 1/2, 0, 1) (the
"hard sigmoid" of quantized-network practice; its gradient-descent
direction matches logistic regression inside the linear region and the
decision boundary is identical).  Every op below is integer +, *, %, and
truncating integer division — Spark ``div`` and DuckDB ``//`` BOTH
truncate toward zero (verified, including negatives), so the unrolled
oracle replays training bit-for-bit.

Distributed shape (per iteration, driver-resident weights a la parameter
server — the weight vector is dim+1 longs, the DATA never leaves
executors):

1. margins: one hash-aggregate ``groupBy(doc).sum(count * w[feature])``
   (map-side combine; weights ride the plan as a literal array — one
   F.expr parse, no join, no broadcast exchange);
2. errors:  hard-sigmoid + label subtraction, scan-stage arithmetic;
3. gradient: one join (features x per-doc error, shuffle keyed by doc id)
   + ``groupBy(feature)`` hash-aggregate down to ``dim`` rows, collected.

Two shuffles per iteration, both keyed and combiner-friendly; nothing
driver-side scales with the corpus.  At 100 TB the same plan holds: the
feature frame is checkpointed once and re-scanned per iteration (swap in
``.checkpoint()`` to durable storage for fault-tolerant long runs).

Overflow envelope (like graph.py): |err| <= scale, so the gradient sum is
bounded by scale * total_token_count.  At the default scale 10^6 that is
exact in BIGINT up to ~9 * 10^12 tokens; past that, lower ``scale`` or
widen the sums to DECIMAL(38,0) (DuckDB already sums in HUGEINT — the
CAST back to BIGINT is where the bound bites).  Spark 4 runs ANSI mode,
so an overflow raises rather than silently wrapping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_quality_classifier",
    "quality_score_expr",
    "quality_scores_arrow",
    "quality_score_sql",
    "classifier_train_sql",
]


#: feature rows at or below this run the identical integer GD loop on the
#: driver (one collect, zero per-iteration scheduling) — the graph.py
#: DRIVER_LOOP_MAX_EDGES pattern.  Bit-identical to the distributed path
#: by construction (equality-tested): integer sums are order-independent
#: and the update rule is the same code.  The probe materializes via
#: Arrow (``toArrow``), so the transfer footprint is near the raw column
#: size (~50 MB at the threshold); the real driver cost is the Python-side
#: per-row structures ``_train_py`` builds (~100-150 B/row in dict-of-list
#: form), so 2M rows is ~300 MB peak — sized against that, not the raw
#: bytes (the pre-r8 5M threshold under row-object collect() was ~GBs of
#: Row overhead right at the limit it existed to avoid).
DRIVER_LOOP_MAX_ROWS = 2_000_000


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — Python's ``//`` FLOORS,
    which disagrees with Spark ``div`` / DuckDB ``//`` on negative
    operands; driver-side weight updates must replay engine-side."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _w_arr_sql(weights: list[int]) -> str:
    return "array(" + ", ".join(f"{int(w)}L" for w in weights) + ")"


def _train_py(
    feat_rows, label_rows, dim, iterations, lr_num, lr_den, scale
) -> tuple[list[int], int]:
    """The driver fast path: the SAME exact integer update rule as the
    distributed loop (Python ints are arbitrary-precision, so there is no
    overflow divergence either) — see DRIVER_LOOP_MAX_ROWS."""
    docs: dict = {}
    for d, f, c in feat_rows:
        docs.setdefault(d, []).append((f, int(c)))
    if not label_rows:
        raise ValueError("no labeled rows")
    n = len(label_rows)
    den = lr_den * n
    half = scale // 2
    w = [0] * dim
    b = 0
    for _ in range(iterations):
        grads = [0] * dim
        bg = 0
        for d, y in label_rows:
            z = sum(c * w[f] for f, c in docs.get(d, ())) + b
            p = max(0, min(scale, _tdiv(z, 4) + half))
            err = p - int(y) * scale
            for f, c in docs.get(d, ()):
                grads[f] += err * c
            bg += err
        for j in range(dim):
            w[j] -= _tdiv(lr_num * grads[j], den)
        b -= _tdiv(lr_num * bg, den)
    return w, b


def train_quality_classifier(
    features: DataFrame,
    labels: DataFrame,
    dim: int,
    iterations: int = 5,
    lr_num: int = 1,
    lr_den: int = 1,
    scale: int = 10**6,
    id_col: str = "doc_id",
    feature_col: str = "feature",
    count_col: str = "count",
    label_col: str = "label",
    driver_threshold_rows: int = DRIVER_LOOP_MAX_ROWS,
) -> tuple[list[int], int]:
    """Train the gate: full-batch GD over sparse hashed features.

    ``features``: (id_col, feature_col, count_col) — the hashed_features
    layout, feature in [0, dim).  ``labels``: (id_col, label_col) with
    label in {0, 1}; every labeled doc should have feature rows (docs with
    no tokens contribute margin = bias, which is handled).

    Returns ``(weights, bias)`` — ``dim`` longs + 1, in units of
    1/``scale`` — ready for ``quality_score_expr``.  Deterministic:
    zero-initialized weights, full-batch gradients, integer arithmetic; no
    seed, no shuffle-order dependence (sums are associative-exact in
    integers).

    Per-iteration update (all integer; hard sigmoid p = clamp(z div 4 +
    scale div 2, 0, scale), err = p - label * scale):

        w_j   -= (lr_num * sum_i err_i * x_ij) div (lr_den * n)
        bias  -= (lr_num * sum_i err_i)        div (lr_den * n)

    i.e. learning rate lr_num / lr_den in units of 1/n — the standard
    mean-gradient step with the division deferred so it stays exact."""
    if dim <= 0 or iterations < 0 or lr_num <= 0 or lr_den <= 0:
        raise ValueError("dim/lr must be positive, iterations >= 0")
    f = features.select(
        F.col(id_col).alias("__id"),
        F.col(feature_col).cast("int").alias("__f"),
        F.col(count_col).cast("long").alias("__c"),
    )
    lab = labels.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("long").alias("__y"),
    )
    if driver_threshold_rows > 0:
        # Arrow-batched probe: columnar buffers at ~raw-data size instead
        # of one PySpark Row object per feature row (~100+ B each — the
        # Row path made the probe itself the OOM risk at the threshold)
        probe = f.limit(driver_threshold_rows + 1).toArrow()
        if probe.num_rows <= driver_threshold_rows:
            lab_t = lab.toArrow()
            return _train_py(
                list(
                    zip(
                        probe.column("__id").to_pylist(),
                        probe.column("__f").to_pylist(),
                        probe.column("__c").to_pylist(),
                    )
                ),
                list(
                    zip(
                        lab_t.column("__id").to_pylist(),
                        lab_t.column("__y").to_pylist(),
                    )
                ),
                dim, iterations, lr_num, lr_den, scale,
            )
    f = f.localCheckpoint(eager=True)
    lab = lab.localCheckpoint(eager=True)
    n = lab.count()
    if n == 0:
        raise ValueError("no labeled rows")
    den = lr_den * n

    w = [0] * dim
    b = 0
    for _ in range(iterations):
        w_sql = _w_arr_sql(w)
        margins = f.groupBy("__id").agg(
            F.sum(
                F.expr(f"__c * element_at({w_sql}, __f + 1)")
            ).alias("__m")
        )
        errs = lab.join(margins, "__id", "left").select(
            "__id",
            (
                F.expr(
                    f"greatest(0L, least({scale}L, "
                    f"(coalesce(__m, 0L) + {b}L) div 4 + {scale // 2}L))"
                )
                - F.col("__y") * scale
            ).alias("__e"),
        )
        grad_rows = (
            f.join(errs, "__id")
            .groupBy("__f")
            .agg(F.sum(F.col("__e") * F.col("__c")).alias("__g"))
            .collect()
        )
        bias_grad = errs.agg(F.sum("__e").alias("__g")).first()["__g"]
        for r in grad_rows:
            w[r["__f"]] -= _tdiv(lr_num * r["__g"], den)
        b -= _tdiv(lr_num * bias_grad, den)
    return w, b


def quality_score_expr(
    text: Column | str,
    weights: list[int],
    bias: int,
    scale: int = 10**6,
) -> Column:
    """Scan-stage quality score in [0, scale]: hash each whitespace token
    to its md5 bucket (the EXACT hashed_features bucketing), sum the
    bucket weights, hard-sigmoid — one expression, no shuffle, no UDF.
    This is the classifier-gate form: ``df.filter(quality_score_expr(...)
    >= tau)`` rides the scan like any other predicate.

    The token fold is a higher-order ``aggregate`` (interpreted, ~0.5 us
    per token — see SCALING.md r6): at ~10^2-10^3 tokens/doc that is the
    same order as the md5 calls themselves and the expression keeps the
    whole gate engine-portable; corpora whose docs carry 10^5+ tokens
    should pre-chunk (text.py chunk_documents) anyway."""
    t = text if isinstance(text, str) else f"`{text._jc.toString()}`"
    dim = len(weights)
    w_sql = _w_arr_sql(weights)
    tok_sum = (
        f"aggregate(filter(split(trim({t}), '\\\\s+'), x -> x != ''), 0L, "
        f"(acc, x) -> acc + element_at({w_sql}, CAST("
        f"CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT) % {dim}"
        " AS INT) + 1))"
    )
    # coalesce: NULL text must score like empty text (bias only) — without
    # it the NULL aggregate rides through div/+, Spark's least/greatest
    # SKIP null operands, and a NULL doc silently scores `scale` (full
    # quality) while the DuckDB twin coalesces to bias-only
    return F.expr(
        f"greatest(0L, least({scale}L, "
        f"(coalesce({tok_sum}, 0L) + {int(bias)}L) div 4 + {scale // 2}L))"
    )


def quality_scores_arrow(
    df: DataFrame,
    text_col: str,
    weights: list[int],
    bias: int,
    scale: int = 10**6,
    out_col: str = "score_scaled",
) -> DataFrame:
    """Arrow-batched twin of ``quality_score_expr``: appends ``out_col``
    (BIGINT, same [0, scale] hard-sigmoid score) via ``mapInPandas`` —
    still scan-stage (no shuffle, no join; batches stream through the
    Python worker once), for corpora where the interpreted per-token HOF
    fold is the scan bottleneck.

    BIT-IDENTICAL to the expression path (equality-tested): same token
    split (the Java ``\\s`` class ``[ \\t\\n\\x0B\\f\\r]``, blanks
    dropped — ``trim`` in the expression only strips a leading blank the
    filter drops anyway), same md5-prefix bucket, Python arbitrary-
    precision integer sums (order-independent), same truncating division.
    Per batch, distinct tokens are bucketed once through a memo dict —
    Zipfian corpora hit the memo far more often than the md5."""
    import re

    from pyspark.sql.types import LongType, StructField, StructType

    dim = len(weights)
    if dim <= 0:
        raise ValueError("weights must be non-empty")
    w = [int(x) for x in weights]
    b, half = int(bias), scale // 2
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, LongType(), False)]
    )
    split = re.compile("[ \t\n\x0b\f\r]+").split

    def _score_batches(batches):
        import hashlib

        memo: dict = {}

        def bucket_w(tok: str) -> int:
            v = memo.get(tok)
            if v is None:
                v = w[
                    int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
                    % dim
                ]
                memo[tok] = v
            return v

        for pdf in batches:
            scores = []
            for t in pdf[text_col]:
                tot = b
                if t is not None:
                    for tok in split(t):
                        if tok:
                            tot += bucket_w(tok)
                scores.append(max(0, min(scale, _tdiv(tot, 4) + half)))
            pdf[out_col] = scores
            yield pdf

    return df.mapInPandas(_score_batches, schema=out_schema)


def quality_score_sql(
    text_sql: str,
    weights: list[int],
    bias: int,
    scale: int = 10**6,
) -> str:
    """DuckDB twin of ``quality_score_expr`` (same tokens, same md5
    buckets, same truncating division — value-exact)."""
    dim = len(weights)
    w_list = "[" + ", ".join(
        f"CAST({int(w)} AS BIGINT)" for w in weights
    ) + "]"
    tok_sum = (
        "coalesce(list_sum(list_transform("
        f"list_filter(string_split_regex(trim({text_sql}), '\\s+'),"
        " x -> x != ''), "
        f"x -> {w_list}[CAST(CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)"
        f" % {dim} AS INT) + 1])), 0)"
    )
    return (
        f"greatest(CAST(0 AS BIGINT), least(CAST({scale} AS BIGINT), "
        f"CAST(({tok_sum} + {int(bias)}) // 4 + {scale // 2} AS BIGINT)))"
    )


def classifier_train_sql(
    features_sql: str,
    labels_sql: str,
    dim: int,
    iterations: int = 5,
    lr_num: int = 1,
    lr_den: int = 1,
    scale: int = 10**6,
) -> str:
    """The ENTIRE training loop unrolled into a WITH-chain a plain SQL
    engine replays bit-for-bit (the pagerank_oracle_sql pattern): one pair
    of CTEs per iteration (margins+errors, then gradient+weights).
    ``features_sql`` must yield (doc_id, feature, count); ``labels_sql``
    (doc_id, label).  Yields (feature, weight) with feature ``dim`` =
    bias.  DuckDB sums widen to HUGEINT — every sum is cast back to
    BIGINT, exact within the module's documented envelope."""
    # f/lab MATERIALIZED: DuckDB inlines plain CTEs per reference — with
    # 2 references per unrolled iteration that re-reads the base parquet
    # O(iterations) times (and can exhaust file descriptors outright)
    parts = [
        f"f AS MATERIALIZED ({features_sql})",
        f"lab AS MATERIALIZED ({labels_sql})",
        "n AS (SELECT count(*) AS n FROM lab)",
        # w0: zero weights for features 0..dim-1, bias at feature = dim
        f"w0 AS (SELECT CAST(range AS INT) AS feature,"
        f" CAST(0 AS BIGINT) AS weight FROM range({dim + 1}))",
    ]
    for t in range(1, iterations + 1):
        p = t - 1
        parts.append(
            f"""e{t} AS MATERIALIZED (
  SELECT lab.doc_id,
         CAST(greatest(0, least({scale},
              (COALESCE(m.m, 0) + b.weight) // 4 + {scale // 2}))
              - lab.label * {scale} AS BIGINT) AS err
  FROM lab
  LEFT JOIN (
    SELECT f.doc_id, CAST(SUM(f.count * w.weight) AS BIGINT) AS m
    FROM f JOIN w{p} w ON f.feature = w.feature
    GROUP BY f.doc_id) m ON lab.doc_id = m.doc_id
  CROSS JOIN (SELECT weight FROM w{p} WHERE feature = {dim}) b)"""
        )
        parts.append(
            f"""w{t} AS MATERIALIZED (
  SELECT w.feature,
         CAST(w.weight - ({lr_num} * COALESCE(g.g, 0))
              // ({lr_den} * n.n) AS BIGINT) AS weight
  FROM w{p} w
  CROSS JOIN n
  LEFT JOIN (
    SELECT f.feature, CAST(SUM(e.err * f.count) AS BIGINT) AS g
    FROM f JOIN e{t} e ON f.doc_id = e.doc_id
    GROUP BY f.feature
    UNION ALL
    SELECT {dim} AS feature, CAST(SUM(err) AS BIGINT) AS g FROM e{t}
  ) g ON w.feature = g.feature)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT feature, weight FROM w{iterations}"
    )
