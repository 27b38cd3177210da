"""Iterative graph algorithms on DataFrames: weighted PageRank in exact
fixed-point integer arithmetic.

Why integers: PageRank is a fixpoint of float sums, and float addition is
not associative -- two engines (or two partitionings of the SAME engine)
summing contributions in different orders drift in the last ulp, which a
value-hashing correctness gate amplifies into a hard mismatch.  Scaling
ranks to integers (``scale`` = 1e9 by default) makes every operation --
multiply, floor-divide, sum -- exact and associative, so the result is
bit-identical regardless of partitioning, engine, or iteration plan, and a
plain SQL engine can replay the computation as an unrolled CTE chain
(`pagerank_oracle_sql`) for verification.

Update rule per iteration (all integer ops)::

    contrib(u->v) = rank[u] * w(u,v) div out[u]
    rank'[v]      = teleport + damping_pct * sum(contrib) div 100
    teleport      = damping-complement mass = (100-damping_pct)*scale div 100

Semantics notes:
- dangling nodes (no out-edges) contribute nothing; their mass evaporates
  (the common simplification; redistribution would need an extra global sum
  per iteration).  Nodes with no in-edges settle at the teleport value.
- overflow bound: rank <= n_nodes*scale, so rank*w must stay under 2^63 --
  with the default scale=1e9 that allows n_nodes * max_edge_weight < 9e9,
  plenty for aggregated edge tables (weights are usually counts); callers
  with hotter weights should pre-normalize or lower ``scale``.

Scale posture: the per-iteration work is one equi-join of edges against the
node-sized rank table plus one groupBy(dst) -- shuffle volume ~edges, never
quadratic.  ``ranks`` is localCheckpoint-ed (eager) every
``checkpoint_every`` iterations so lineage stays bounded instead of
compounding every join of the loop into one tree; each checkpoint is a
scheduled job, so the knob trades plan depth against scheduler round-trips
(tiny graphs want it higher, huge ones lower).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from carto_etl_spark.session import local_df

# Below this many (aggregated) edge rows the iteration state is
# broadcast-sized, and looping on the DRIVER is the iterative analogue of a
# broadcast join: every distributed round would otherwise pay scheduler +
# AQE-replan latency that dwarfs the arithmetic (measured ~0.3 s/round for a
# 50-edge graph).  The driver loop replays the SAME exact integer update
# rule, so results are bit-identical to the distributed path (property-
# tested); graphs above the threshold take the distributed path unchanged.
DRIVER_LOOP_MAX_EDGES = 100_000


def _pagerank_py(
    edge_rows, iterations: int, damping_pct: int, scale: int
) -> list:
    """Exact integer PageRank on driver-collected (src, dst, w) rows —
    the same update rule as the distributed loop, op for op."""
    out_w: dict = {}
    nodes = set()
    for s, d, w in edge_rows:
        nodes.add(s)
        nodes.add(d)
        out_w[s] = out_w.get(s, 0) + w
    teleport = (100 - damping_pct) * scale // 100
    ranks = {n: scale for n in nodes}
    for _ in range(iterations):
        inc: dict = {}
        for s, d, w in edge_rows:
            inc[d] = inc.get(d, 0) + ranks[s] * w // out_w[s]
        ranks = {
            n: teleport + damping_pct * inc.get(n, 0) // 100
            for n in nodes
        }
    return sorted(ranks.items())


def _node_result_schema(e: DataFrame, value_name: str):
    """(node, <value>) schema preserving the caller's node type."""
    from pyspark.sql import types as T

    node_type = e.schema["src"].dataType
    return T.StructType(
        [
            T.StructField("node", node_type),
            T.StructField(value_name, T.LongType()),
        ]
    )


def _relax_py(edge_rows, sources: list, rounds: int) -> list:
    """Exact integer relax-and-min loop on driver-collected
    (src, dst, w) rows — mirrors `_relax_loop` including its self-loop
    semantics (a node keeps its current distance every round)."""
    nodes = set()
    for s, d, _ in edge_rows:
        nodes.add(s)
        nodes.add(d)
    dist = {s: 0 for s in sources if s in nodes}
    for _ in range(rounds):
        nxt = dict(dist)  # self-loop: current distances survive the round
        for s, d, w in edge_rows:
            if s in dist:
                cand = dist[s] + w
                if d not in nxt or cand < nxt[d]:
                    nxt[d] = cand
        dist = nxt
    return sorted(dist.items())


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping_pct: int = 85,
    scale: int = 10**9,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    checkpoint_every: int = 5,
    driver_threshold_edges: int = DRIVER_LOOP_MAX_EDGES,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, weight)``.

    Returns (node, rank_scaled): rank in units of 1/scale, exact integers.
    Broadcast-sized graphs (≤ ``driver_threshold_edges`` aggregated edge
    rows) run the identical integer loop on the driver instead of paying
    per-round scheduling — see `DRIVER_LOOP_MAX_EDGES`.
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    small = _collect_if_small(e, driver_threshold_edges)
    if small is not None:
        result = _pagerank_py(small, iterations, damping_pct, scale)
        return local_df(
            edges.sparkSession, result, _node_result_schema(e, "rank_scaled")
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    # edges pre-joined to their source's total outgoing weight: loop-invariant,
    # so compute once and checkpoint instead of re-joining every iteration
    ew = e.join(outw, "src").localCheckpoint(eager=True)
    teleport = (100 - damping_pct) * scale // 100

    ranks = nodes.select(
        "node", F.lit(scale).cast("long").alias("rank")
    ).localCheckpoint(eager=True)
    for it in range(1, iterations + 1):
        inc = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(
                "dst",
                F.expr("rank * w div ow").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        ranks = (
            nodes.join(inc, nodes["node"] == inc["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"{damping_pct} * coalesce(inc, 0L) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
        # truncate lineage every k iterations: each checkpoint is a job, so
        # k trades plan depth (k join+agg layers, still linear) against
        # scheduler round-trips; the LAST iteration is left lazy so the
        # caller's action doesn't pay one extra materialization
        if it % checkpoint_every == 0 and it < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("rank").alias("rank_scaled"))


def _relax_loop(
    e: DataFrame, sources: list, rounds: int, checkpoint_every: int
) -> DataFrame:
    """Shared relax-and-min loop over weighted edges ``e(src, dst, w)``.

    The naive step ``dist.union(relax(dist))`` references ``dist`` TWICE,
    so an un-checkpointed plan tree DOUBLES per round — 2^rounds leaves,
    and Catalyst analysis time explodes exponentially even though
    ReusedExchange keeps execution sane (measured: a 10-round loop took
    40+ s of pure planning).  Instead the edge set is augmented with
    zero-weight SELF-LOOPS on every node, which makes "keep my current
    distance" just another relaxation: each round is one join + one
    min-aggregate referencing ``dist`` exactly once, so lineage grows
    linearly and checkpoints become a fault-tolerance choice rather than
    a planning necessity.
    """
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
    )
    e_aug = (
        e.union(
            nodes.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0).cast("long").alias("w"),
            )
        )
        .localCheckpoint(eager=True)
    )
    dist = (
        nodes.where(F.col("node").isin(sources))
        .select("node", F.lit(0).cast("long").alias("d"))
        .localCheckpoint(eager=True)
    )
    for it in range(1, rounds + 1):
        dist = (
            e_aug.join(dist, e_aug["src"] == dist["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("d") + F.col("w")).alias("d"))
        )
        if it % checkpoint_every == 0 and it < rounds:
            dist = dist.localCheckpoint(eager=True)
    return dist


def bfs_hops(
    edges: DataFrame,
    sources: list,
    max_hops: int = 8,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
    driver_threshold_edges: int = DRIVER_LOOP_MAX_EDGES,
) -> DataFrame:
    """Minimum hop distance from any of ``sources`` along directed edges,
    by iterative relaxation: each round extends every known distance across
    every edge and keeps the per-node minimum.  All-integer, so exact and
    order-independent like `pagerank`.  Nodes unreached within ``max_hops``
    are absent from the output (not null-padded).

    Per-round cost is one equi-join of edges against the reached set plus a
    min-groupBy -- ~edges shuffle volume; correct (not just frontier-fast)
    because min() makes re-relaxation idempotent.  Lineage stays LINEAR in
    rounds via the self-loop trick (see `_relax_loop`).
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.lit(1).cast("long").alias("w"),
    )
    small = _collect_if_small(e, driver_threshold_edges)
    if small is not None:
        result = _relax_py(small, sources, max_hops)
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("node", e.schema["src"].dataType),
                T.StructField("hops", T.IntegerType()),
            ]
        )
        return local_df(
            edges.sparkSession, [(n, int(d)) for n, d in result], schema
        )
    dist = _relax_loop(e, sources, max_hops, checkpoint_every)
    return dist.select("node", F.col("d").cast("int").alias("hops"))


def _collect_if_small(e: DataFrame, threshold: int):
    """Collect (src, dst, w) tuples if the edge table fits the driver-loop
    threshold, else None.  The probe is byte-budgeted against the live
    maxResultSize (operators/probe.py — r8 verdict #7: a row cap alone is
    the wrong unit when node ids are wide strings) and transfers via
    Arrow, not Row objects."""
    if threshold <= 0:
        return None
    from carto_etl_spark.operators.probe import arrow_probe

    t = arrow_probe(e.select("src", "dst", "w"), threshold)
    if t is None or t.num_rows > threshold:
        return None
    return list(
        zip(
            t.column("src").to_pylist(),
            t.column("dst").to_pylist(),
            t.column("w").to_pylist(),
        )
    )


def _relax_oracle_sql(
    weighted_edges_sql: str,
    sources: list,
    rounds: int,
    final_select: str,
) -> str:
    """Shared unrolled-CTE generator mirroring `_relax_loop`, INCLUDING
    its linear-lineage property: the naive ``d ∪ relax(d)`` step
    references each round's CTE twice, and a SQL engine that inlines
    (rather than materializes) multiply-referenced CTEs then pays a
    2^rounds subplan — measured 15 s in DuckDB for 10 rounds on a
    50-edge graph.  Zero-weight self-loops make every round reference
    its predecessor exactly once, so the oracle stays linear too."""
    src_list = ", ".join(str(s) for s in sources)
    parts = [
        f"edges AS ({weighted_edges_sql})",
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)",
        "e_aug AS (SELECT src, dst, w FROM edges UNION ALL"
        " SELECT node, node, 0 FROM nodes)",
        f"d0 AS (SELECT node, CAST(0 AS BIGINT) AS d FROM nodes"
        f" WHERE node IN ({src_list}))",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""d{i} AS (
  SELECT e.dst AS node, CAST(MIN(r.d + e.w) AS BIGINT) AS d
  FROM e_aug e JOIN d{i - 1} r ON e.src = r.node
  GROUP BY e.dst)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"\n{final_select} FROM d{rounds}"
    )


def bfs_oracle_sql(
    edges_sql: str, sources: list, max_hops: int = 8
) -> str:
    """`bfs_hops` unrolled into a SQL CTE chain: one relax-and-min step per
    hop.  ``edges_sql`` must yield (src, dst)."""
    return _relax_oracle_sql(
        f"SELECT src, dst, 1 AS w FROM ({edges_sql}) raw_edges",
        sources,
        max_hops,
        "SELECT node, CAST(d AS INT) AS hops",
    )


def shortest_paths(
    edges: DataFrame,
    sources: list,
    max_rounds: int = 10,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    checkpoint_every: int = 5,
    driver_threshold_edges: int = DRIVER_LOOP_MAX_EDGES,
) -> DataFrame:
    """Single/multi-source shortest path distances with integer edge
    weights: Bellman-Ford-style relax-and-min rounds (the weighted
    generalization of `bfs_hops` — min() keeps re-relaxation idempotent,
    so no frontier bookkeeping is needed for correctness).

    Exact: distances are integer sums, so results are bit-identical across
    partitionings and replayable as an unrolled SQL CTE chain
    (`shortest_paths_oracle_sql`).  ``max_rounds`` must be ≥ the hop count
    of the longest shortest path (standard Bellman-Ford bound: n−1);
    negative weights are accepted but negative CYCLES are not detected —
    the result after ``max_rounds`` is then round-limited, as in any
    bounded Bellman-Ford.  Unreached nodes are absent.

    The self-loop lineage trick (see `_relax_loop`) preserves semantics:
    tentative distances in Bellman-Ford are monotone non-increasing, and
    min-with-self-loop is exactly that invariant.
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    small = _collect_if_small(e, driver_threshold_edges)
    if small is not None:
        result = _relax_py(small, sources, max_rounds)
        return local_df(
            edges.sparkSession, result, _node_result_schema(e, "dist")
        )
    dist = _relax_loop(e, sources, max_rounds, checkpoint_every)
    return dist.select("node", F.col("d").alias("dist"))


def shortest_paths_oracle_sql(
    edges_sql: str, sources: list, max_rounds: int = 10
) -> str:
    """`shortest_paths` unrolled into SQL CTEs, one relax-and-min step per
    round.  ``edges_sql`` must yield (src, dst, w)."""
    return _relax_oracle_sql(
        edges_sql, sources, max_rounds, "SELECT node, d AS dist"
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count of the UNDIRECTED graph under ``edges``
    (direction, duplicates, and self-loops are normalized away first).

    Uses the degree-orientation trick: orient every edge from the
    lower-(degree, node) endpoint to the higher one, enumerate wedges by
    joining oriented edges on their midpoint, and close each wedge against
    the oriented edge set.  Every triangle is counted exactly once (its
    orientation is acyclic), and — the scale property — wedge counts are
    bounded by orienting AWAY from high-degree hubs: a star graph yields
    zero wedges at the hub instead of degree² of them, so the shuffle
    volume tracks sum of min-degree² rather than max-degree².
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("n"))
        .union(canon.select("b"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(
        F.col("n").alias("a"), F.col("deg").alias("deg_a")
    )
    db = deg.select(
        F.col("n").alias("b"), F.col("deg").alias("deg_b")
    )
    with_deg = canon.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    # wedges = ordered pairs of out-neighbors of one source; the closing
    # join matches only the pair whose (y, z) agrees with the closing
    # edge's orientation, so each triangle is counted exactly once.  Out-
    # degrees are what orientation bounds (sum out² ≤ O(m^1.5)), which is
    # why wedges form at the SOURCE, not along a midpoint path.
    e1 = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    wedges = e1.join(e2, "x").where(F.col("y") != F.col("z"))
    closing = oriented.select(
        F.col("lo").alias("y"), F.col("hi").alias("z")
    )
    return wedges.join(closing, ["y", "z"]).agg(
        F.count(F.lit(1)).alias("triangles")
    )


def triangle_oracle_sql(edges_sql: str) -> str:
    """Independent brute force: canonicalize to a < b < c and count each
    triangle's three edges directly — no orientation logic shared with the
    engine path, so what the oracle verifies is the algorithm, not a
    transcription of it.  ``edges_sql`` must yield (src, dst)."""
    return f"""
WITH raw AS ({edges_sql}),
canon AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw WHERE src != dst
)
SELECT CAST(count(*) AS BIGINT) AS triangles
FROM canon e1
JOIN canon e2 ON e1.b = e2.a AND e1.a < e2.a
JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 10,
    damping_pct: int = 85,
    scale: int = 10**9,
) -> str:
    """The same computation as `pagerank`, unrolled into a WITH-chain a
    plain SQL engine can run: one CTE per iteration, integer ops throughout
    (DuckDB's SUM(BIGINT) widens to HUGEINT, so every sum is cast back --
    the values fit, per the module overflow bound).  ``edges_sql`` must
    yield (src, dst, w)."""
    teleport = (100 - damping_pct) * scale // 100
    parts = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)",
        "outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow"
        " FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST({teleport} + ({damping_pct} * COALESCE(s.inc, 0)) // 100
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM((r.rank * e.w) // o.ow) AS BIGINT) AS inc
    FROM edges e
    JOIN r{i - 1} r ON e.src = r.node
    JOIN outw o ON e.src = o.src
    GROUP BY e.dst) s ON n.node = s.node)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, rank AS rank_scaled FROM r{iterations}"
    )
