"""Deterministic sampling and sequence-packing operators for training-data
pipelines: portable hash sampling, per-stratum rates, exact k-per-group
sampling, and token-budget sequence packing.

Not in the reference (its scope ends at SQL-text DML,
/root/reference/etl/etl.py); mandated by the engine's north star as
first-class 100 TB-scale operators.  A training pipeline needs *deterministic*
sampling — `df.sample()` is seed-stable only for a fixed partitioning, which
no 100 TB pipeline has — so everything here derives from a pure-arithmetic
hash of a key column:

* re-running the pipeline reproduces the same sample bit-for-bit;
* adding data never flips the keep/drop decision of an existing row;
* the decision is a scan-stage filter (no shuffle, no state).

The hash is the Lehmer / Park–Miller multiplicative congruential generator
(`(key mod M) * 48271 mod M`, M = 2^31-1, a public-domain classic).  Chosen
over xxhash64 deliberately: its arithmetic is expressible in ANSI SQL, so the
duckdb oracle can verify every sampling decision value-for-value.  Swapping in
`F.xxhash64` for production corpora is a one-line change to ``hash_expr``;
every operator below is parameterized on the hash column, not the function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from carto_etl_spark.session import local_df

#: Park–Miller constants: multiplier and modulus (2^31 - 1, prime).
LEHMER_A = 48271
LEHMER_M = 2147483647


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def hash_expr(key: Column | str, salt: int = 0) -> Column:
    """Deterministic uniform hash of an integer key into [0, M).

    Three Lehmer multiply rounds with xor-shift steps between them.  Both
    pieces are load-bearing:

    * one multiply round is just ``k * 48271`` for keys below M/A (~44k) —
      no modular wrap, so sequential ids map to an increasing sequence and
      every rate filter degenerates to a prefix (measured: rate=0.25 kept
      100% of ids 0..499);
    * iterated multiplies alone stay LINEAR (three rounds ≡ one round with
      multiplier A³ mod M), so h(k+1) − h(k) is a global constant and
      keep-decisions of neighboring keys — hence of neighboring salts, which
      fold into the key — are lockstep-correlated (measured: two salts gave
      ZERO sample overlap where independence predicts 30%).

    The xor-shifts break the linearity; measured on 100k sequential keys:
    decile occupancy uniform to ±1%, salt-to-salt overlap 30.3% at rate 0.3
    (independence predicts 30%), consecutive-key co-keeps at chance level.
    All intermediates fit in int64: (M-1) * 48271 < 2^47.
    """
    x = F.pmod(_col(key).cast("long") + F.lit(salt), F.lit(LEHMER_M))
    x = F.pmod(x * F.lit(LEHMER_A), F.lit(LEHMER_M))
    x = x.bitwiseXOR(F.shiftright(x, 16))
    x = F.pmod(x * F.lit(LEHMER_A), F.lit(LEHMER_M))
    x = x.bitwiseXOR(F.shiftright(x, 13))
    return F.pmod(x * F.lit(LEHMER_A), F.lit(LEHMER_M))


def hash_sql(key_sql: str, salt: int = 0) -> str:
    """DuckDB-SQL twin of ``hash_expr`` (same rounds, same constants), for
    oracle construction — kept beside the Spark expression so the two can
    never drift independently.  The xor steps textually duplicate their
    operand (SQL has no let-binding); DuckDB's CSE collapses them."""
    x = f"(({key_sql} + {salt}) % {LEHMER_M})"
    x = f"(({x} * {LEHMER_A}) % {LEHMER_M})"
    x = f"xor({x}, {x} >> 16)"
    x = f"(({x} * {LEHMER_A}) % {LEHMER_M})"
    x = f"xor({x}, {x} >> 13)"
    return f"(({x} * {LEHMER_A}) % {LEHMER_M})"


def hash_sample(
    df: DataFrame, key: Column | str, rate: float, salt: int = 0
) -> DataFrame:
    """Keep ~``rate`` of rows, decided per-row by ``hash_expr(key) < rate*M``.

    A pure scan-stage filter: no shuffle, no sort, no driver state; the same
    row is kept or dropped identically on any cluster size or partitioning.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.where(hash_expr(key, salt) < int(rate * LEHMER_M))


def stratum_rate_expr(
    strata: Column | str, rates: dict[str, float], default_rate: float
) -> Column:
    """Per-stratum keep-threshold as a CASE expression (threshold in hash
    units, i.e. rate * M)."""
    out = F.lit(int(default_rate * LEHMER_M))
    for value, rate in sorted(rates.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {value!r} must be in [0,1], got {rate}")
        out = F.when(_col(strata) == value, F.lit(int(rate * LEHMER_M))).otherwise(out)
    return out


def stratified_sample(
    df: DataFrame,
    key: Column | str,
    strata: Column | str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. keep 10% of English, all
    of everything else — the standard language-rebalancing step).

    Still a single scan-stage filter: the stratum only changes the threshold
    the row's hash is compared against.  No shuffle, no per-group state, no
    skew sensitivity — a hot stratum costs the same as a cold one.
    """
    return df.where(
        hash_expr(key, salt) < stratum_rate_expr(strata, rates, default_rate)
    )


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """Cumulative hash-unit thresholds for ``dataset_split``.  Weight order is
    the dict's insertion order (part of the determinism contract: the same
    weights dict always yields the same assignment).  The last threshold is
    pinned to M so rounding can never leave a row unassigned."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative with positive sum: {weights}")
    out: list[tuple[str, int]] = []
    cum = 0.0
    for name, w in weights.items():
        cum += w / total
        out.append((name, int(cum * LEHMER_M)))
    out[-1] = (out[-1][0], LEHMER_M)
    return out


def split_expr(
    key: Column | str, weights: dict[str, float], salt: int = 0
) -> Column:
    """Deterministic dataset-split label (train/valid/test/...) for a row.

    The standard contract a training pipeline needs from its split and that
    ``df.randomSplit`` cannot give: re-running reproduces the same assignment
    bit-for-bit on any partitioning, and appending new data NEVER moves an
    existing row between splits (its hash doesn't change).  A pure scan-stage
    expression — no shuffle, no state."""
    thresholds = split_thresholds(weights)
    h = hash_expr(key, salt)
    expr = F.lit(thresholds[-1][0])
    for name, t in reversed(thresholds[:-1]):
        expr = F.when(h < t, F.lit(name)).otherwise(expr)
    return expr


def dataset_split(
    df: DataFrame,
    key: Column | str,
    weights: dict[str, float],
    salt: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic split-assignment column (see ``split_expr``)."""
    return df.withColumn(split_col, split_expr(key, weights, salt))


def split_sql(key_sql: str, weights: dict[str, float], salt: int = 0) -> str:
    """DuckDB-SQL twin of ``split_expr`` (same thresholds, same hash), kept
    beside it so the two can never drift independently."""
    thresholds = split_thresholds(weights)
    h = hash_sql(key_sql, salt)
    whens = " ".join(
        f"WHEN ({h}) < {t} THEN '{name}'" for name, t in thresholds[:-1]
    )
    return f"CASE {whens} ELSE '{thresholds[-1][0]}' END"


def group_sample(
    df: DataFrame,
    group: Column | str | list,
    key: Column | str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """EXACTLY min(k, group size) rows per group, chosen uniformly by hash
    order (rate-based sampling can't hit an exact per-group quota).

    One hash-partition shuffle on the group key + a row_number window —
    the minimum possible for an exact quota.  Ties in the hash are broken by
    the key itself so the result is total-order deterministic.  For skewed
    groups at 100 TB prefer ``stratified_sample`` (no shuffle) unless the
    exact-k contract is required.
    """
    groups = group if isinstance(group, list) else [group]
    groups = [_col(g) for g in groups]
    h = hash_expr(key, salt)
    w = Window.partitionBy(*groups).orderBy(h.asc(), _col(key).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    tokens: Column | str,
    order: Column | str,
    budget: int,
    partition: Column | str | None = None,
    seq_col: str = "seq_id",
) -> DataFrame:
    """Assign each document to a training sequence under a token budget:
    documents are taken in ``order`` and a new sequence starts whenever the
    running token total crosses a multiple of ``budget``.

    Semantics (deliberately window-expressible, hence oracle-checkable):
    ``seq_id = floor(exclusive_running_sum(tokens) / budget)`` — the classic
    "greedy boundary-crossing" packing where a sequence may overflow by at
    most one document (the overflowing document opens the next sequence's
    budget accounting).  This is the packing used when documents are later
    split at token granularity; for strict no-overflow bin packing you need a
    sequential pass, which does not distribute.

    Scale posture: with ``partition`` set (e.g. source shard), packing is a
    window per partition — one hash shuffle, arbitrary corpus size, sequences
    never span shards (which real pipelines want anyway: shard-local packing
    keeps data lineage and lets shards pack in parallel).  Without
    ``partition`` the window is global: correct, but a single-reducer sort —
    only for small corpora.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    parts = [] if partition is None else [_col(partition)]
    w = (
        Window.partitionBy(*parts)
        .orderBy(_col(order).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(_col(tokens)).over(w), F.lit(0))
    return df.withColumn(seq_col, F.floor(before / F.lit(budget)))


def pack_stats(
    packed: DataFrame,
    tokens: Column | str,
    partition: Column | str | None = None,
    seq_col: str = "seq_id",
) -> DataFrame:
    """Per-sequence roll-up of a ``pack_sequences`` result: document count,
    token total, and budget utilization inputs.  Partial-aggregates map-side;
    the shuffle is one row per sequence."""
    keys = ([] if partition is None else [_col(partition)]) + [F.col(seq_col)]
    return packed.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(_col(tokens)).cast("long").alias("total_tokens"),
    )


def temperature_mixture_plan(
    counts: dict[str, int], total_target: int, alpha: float = 0.5
) -> dict[str, int]:
    """Per-source keep thresholds (hash units) for temperature-weighted
    mixture sampling: source s gets mixture weight n_s^alpha / Σ n_t^alpha
    — alpha < 1 flattens the source distribution (the standard multilingual
    / multi-source LLM data-mixing step: big sources stop dominating, small
    ones are not starved), alpha = 1 is proportional, alpha = 0 uniform.

    Sampling is WITHOUT replacement, so a source whose target exceeds its
    size caps at keeping everything (rate 1); genuine upsampling is a
    repetition/layout concern, not a sampling one.

    Cross-engine exactness contract: with the default alpha = 0.5 every
    operation here (sqrt, a fixed-order + chain over sorted source names,
    * and /, min, floor) is IEEE-correctly-rounded, so a SQL oracle
    replaying the same expressions reproduces the thresholds bit-for-bit.
    Other alphas remain deterministic within the engine but go through
    ``pow``, which libms round differently — don't expect cross-engine
    threshold equality there."""
    import math

    powed = {
        s: (math.sqrt(n) if alpha == 0.5 else float(n) ** alpha)
        for s, n in counts.items()
        if n > 0
    }
    denom = 0.0
    for s in sorted(powed):  # fixed order: part of the exactness contract
        denom += powed[s]
    out: dict[str, int] = {}
    for s in sorted(powed):
        rate = min(1.0, (total_target * (powed[s] / denom)) / counts[s])
        out[s] = int(rate * LEHMER_M)
    return out


def temperature_mixture(
    df: DataFrame,
    key: Column | str,
    source_col: str,
    target_fraction: float = 0.5,
    alpha: float = 0.5,
    salt: int = 0,
) -> DataFrame:
    """Deterministic temperature-weighted mixture over ``source_col``:
    one tiny counts aggregate (#sources rows, collected driver-side) derives
    the per-source thresholds (``temperature_mixture_plan``), which apply as
    a SINGLE scan-stage hash filter — no shuffle, no state, reproducible on
    any partitioning, and appending data never flips an existing row's
    decision.  ``target_fraction`` sizes the output against the current
    total (T = floor(N * fraction)).

    Rows with a NULL source are excluded from both the budget totals and
    the output, matching ``mixing.epoch_plan``'s documented NULL policy
    (the threshold when-chain already routes NULL to the -1 sentinel, so
    this keeps the counts consistent with what the filter can emit)."""
    counts = {
        r[source_col]: r["count"]
        for r in df.where(F.col(source_col).isNotNull())
        .groupBy(source_col)
        .count()
        .collect()
    }
    total = sum(counts.values())
    target = int(total * target_fraction)
    thresholds = temperature_mixture_plan(counts, target, alpha)
    thr = F.lit(-1)
    for s, t in sorted(thresholds.items()):
        thr = F.when(F.col(source_col) == s, F.lit(t)).otherwise(thr)
    return df.where(hash_expr(key, salt) < thr)


def with_running_weight(
    df: DataFrame,
    weight: Column | str,
    order: Column | str,
    cum_col: str = "cum_weight",
) -> tuple[DataFrame, int]:
    """Exclusive global prefix sum of ``weight`` in ``order`` order, without
    a single-reducer sort: range-partition on the order key, per-partition
    subtotals (one tiny job, one row per partition) become driver-side
    offsets broadcast back, and each partition windows only its own rows —
    the zipWithIndex design ``sources/csv.py:with_row_index`` established,
    generalized from counts to sums.  Returns (df + cum_col, total_weight).

    ``order`` must be globally unique for the prefix sum to be well-defined
    (ties make "the rows before me" ambiguous across engines)."""
    ranged = df.repartitionByRange(_col(order)).withColumn(
        "__pid", F.spark_partition_id()
    )
    sums = (
        ranged.groupBy("__pid")
        .agg(F.sum(_col(weight)).cast("long").alias("__s"))
        .orderBy("__pid")
        .collect()
    )
    offsets, running = [], 0
    for r in sums:
        offsets.append((r["__pid"], running))
        running += r["__s"] or 0
    spark = df.sparkSession
    odf = local_df(spark, offsets or [(0, 0)], "__pid int, __off long")
    local = (
        Window.partitionBy("__pid")
        .orderBy(_col(order))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        ranged.join(F.broadcast(odf), "__pid")
        .withColumn(
            cum_col,
            F.col("__off")
            + F.coalesce(F.sum(_col(weight)).over(local), F.lit(0)),
        )
        .drop("__pid", "__off")
    )
    return out, running


def weighted_systematic_sample(
    df: DataFrame,
    weight: Column | str,
    k: int,
    order: Column | str,
    picks_col: str = "n_picks",
) -> DataFrame:
    """Exact, deterministic weighted sampling of ``k`` picks: systematic
    (grid) selection over the cumulative weight axis.  Thresholds sit at
    t_j = (2j+1)·W / 2k for j = 0..k-1; a row is picked once per threshold
    falling inside its weight interval [C, C+w), so a heavy row can be
    picked multiple times (``picks_col`` carries the multiplicity — the
    standard PPS-systematic estimator's behavior).  All comparisons are
    integer arithmetic: reproducible bit-for-bit on any engine, no floats,
    no RNG.  Rows with NULL or non-positive weight are excluded.

    Weights must be integers (pre-scale fractional weights).  Guard:
    2·k·W must fit in int64 — at extreme scale pre-scale weights down
    (the sampling distribution only depends on weight ratios)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = _col(weight)
    pos = df.where(w.isNotNull() & (w > 0))
    cum, total = with_running_weight(pos, weight, order, "__cum")
    if total == 0:
        return cum.drop("__cum").withColumn(
            picks_col, F.lit(0).cast("long")
        ).where(F.lit(False))
    if 2 * k * (total + 1) > 2**63 - 1:
        raise ValueError(
            f"2*k*W = {2 * k * total} overflows int64; pre-scale weights "
            "(only ratios matter) or lower k"
        )
    two_kc = 2 * k * F.col("__cum")
    two_kcw = 2 * k * (F.col("__cum") + w.cast("long"))
    big_w = F.lit(total).cast("long")

    def _ceil_div(num: Column, den: Column) -> Column:
        # exact positive-ceiling division: long/long would promote to double
        # (2^53 exactness cliff), so divide as decimal(38,0) and floor
        q = (num + den - 1).cast("decimal(38,0)") / den.cast("decimal(38,0)")
        return F.floor(q).cast("long")

    # smallest j with (2j+1)W >= 2kC, clamped at 0: ceil((2kC - W) / 2W);
    # the numerator is kept non-negative so ceil-by-offset is exact
    num_lo = two_kc - big_w
    j_min = F.when(num_lo <= 0, F.lit(0).cast("long")).otherwise(
        _ceil_div(num_lo, 2 * big_w)
    )
    # largest j with (2j+1)W < 2k(C+w): ceil((2k(C+w) - W) / 2W) - 1
    num_hi = two_kcw - big_w
    j_max = F.when(num_hi <= 0, F.lit(-1).cast("long")).otherwise(
        _ceil_div(num_hi, 2 * big_w) - 1
    )
    j_max = F.least(j_max, F.lit(k - 1).cast("long"))
    picks = F.greatest(j_max - j_min + 1, F.lit(0).cast("long"))
    return (
        cum.withColumn(picks_col, picks)
        .where(F.col(picks_col) > 0)
        .drop("__cum")
    )
