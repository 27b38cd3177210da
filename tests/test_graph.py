"""PageRank: exact equality against a pure-python reference running the
same fixed-point integer recurrence, semantic edge cases (dangling nodes,
sources, disconnection), partition invariance, and the DuckDB unrolled-CTE
oracle generator replaying the Spark result bit-for-bit."""

from __future__ import annotations

import duckdb

from carto_etl_spark.operators.graph import pagerank, pagerank_oracle_sql

SCALE = 10**9


def _py_pagerank(edges, iterations=10, damping_pct=85, scale=SCALE):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0) + w
    teleport = (100 - damping_pct) * scale // 100
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        inc = {n: 0 for n in nodes}
        for s, d, w in edges:
            inc[d] += rank[s] * w // out[s]
        rank = {n: teleport + damping_pct * inc[n] // 100 for n in nodes}
    return rank


EDGES = [
    (1, 2, 3), (2, 1, 1), (1, 3, 1), (3, 2, 2), (4, 1, 5),
    (2, 4, 1), (5, 5, 1),          # self-loop component
    (6, 7, 2),                     # 7 is dangling (no out-edges)
]


def _spark_pagerank(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    return {
        r["node"]: r["rank_scaled"] for r in pagerank(df, **kw).collect()
    }


def test_matches_python_reference_exactly(spark):
    assert _spark_pagerank(spark, EDGES) == _py_pagerank(EDGES)


def test_damping_and_iterations_params(spark):
    got = _spark_pagerank(spark, EDGES, iterations=3, damping_pct=70)
    assert got == _py_pagerank(EDGES, iterations=3, damping_pct=70)


def test_dangling_node_keeps_teleport_only_inflow_accounting(spark):
    # node 7 has no out-edges: its mass evaporates, but it still RECEIVES
    # from 6 every iteration; node 6 receives nothing -> settles at teleport
    got = _spark_pagerank(spark, EDGES)
    ref = _py_pagerank(EDGES)
    assert got[6] == (100 - 85) * SCALE // 100
    assert got[7] == ref[7] > got[6]


def test_partition_invariance(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long, w long")
    a = {r["node"]: r["rank_scaled"] for r in pagerank(df).collect()}
    b = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df.repartition(7)).collect()
    }
    assert a == b


def test_oracle_sql_replays_spark_bit_for_bit(spark):
    got = _spark_pagerank(spark, EDGES)
    rows = ", ".join(f"({s}, {d}, {w})" for s, d, w in EDGES)
    sql = pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {rows}) AS t(src, dst, w)"
    )
    oracle = dict(duckdb.sql(sql).fetchall())
    assert got == oracle


def test_total_mass_bounded(spark):
    got = _spark_pagerank(spark, EDGES)
    n = len(got)
    assert 0 < sum(got.values()) <= n * SCALE


# --- BFS hop distances -----------------------------------------------------

from carto_etl_spark.operators.graph import bfs_hops, bfs_oracle_sql

# chain 1->2->3->4, a shortcut 1->3, an unreachable pair 8->9
BFS_EDGES = [(1, 2), (2, 3), (3, 4), (1, 3), (8, 9)]


def _py_bfs(edges, sources, max_hops):
    dist = {s: 0 for s in sources}
    for _ in range(max_hops):
        for s, d in edges:
            if s in dist and dist[s] + 1 < dist.get(d, 1 << 30):
                dist[d] = dist[s] + 1
    return dist


def _spark_bfs(spark, edges, sources, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["hops"]
        for r in bfs_hops(df, sources=sources, **kw).collect()
    }


def test_bfs_matches_reference_and_prefers_shortcut(spark):
    got = _spark_bfs(spark, BFS_EDGES, [1], max_hops=5)
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}  # 3 via shortcut, not the chain
    assert 8 not in got and 9 not in got     # unreachable: absent, not null


def test_bfs_multi_source_and_hop_cap(spark):
    got = _spark_bfs(spark, BFS_EDGES, [1, 8], max_hops=1)
    assert got == {1: 0, 2: 1, 3: 1, 8: 0, 9: 1}
    full = _spark_bfs(spark, BFS_EDGES, [1, 8], max_hops=5)
    assert full == _py_bfs(BFS_EDGES, [1, 8], 5)


def test_bfs_checkpoint_cadence_is_invisible(spark):
    a = _spark_bfs(spark, BFS_EDGES, [1], max_hops=6, checkpoint_every=1)
    b = _spark_bfs(spark, BFS_EDGES, [1], max_hops=6, checkpoint_every=6)
    assert a == b


def test_bfs_oracle_sql_matches(spark):
    got = _spark_bfs(spark, BFS_EDGES, [1], max_hops=4)
    rows = ", ".join(f"({s}, {d})" for s, d in BFS_EDGES)
    sql = bfs_oracle_sql(
        f"SELECT * FROM (VALUES {rows}) AS t(src, dst)", [1], max_hops=4
    )
    assert got == dict(duckdb.sql(sql).fetchall())


# --- triangle counting -----------------------------------------------------

from itertools import combinations

from carto_etl_spark.operators.graph import triangle_count, triangle_oracle_sql


def _py_triangles(edges):
    adj = {}
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )


def _spark_triangles(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return triangle_count(df).collect()[0]["triangles"]


def test_triangles_known_graphs(spark):
    tri = [(1, 2), (2, 3), (3, 1)]
    assert _spark_triangles(spark, tri) == 1
    square = [(1, 2), (2, 3), (3, 4), (4, 1)]
    assert _spark_triangles(spark, square) == 0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _spark_triangles(spark, k4) == 4
    star = [(0, i) for i in range(1, 8)]
    assert _spark_triangles(spark, star) == 0


def test_triangles_normalize_dupes_reversals_loops(spark):
    messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (3, 1), (1, 3)]
    assert _spark_triangles(spark, messy) == 1


def test_triangles_match_python_on_circulant(spark):
    edges = [(i, (i + o) % 13) for i in range(13) for o in (1, 3, 4)]
    assert _spark_triangles(spark, edges) == _py_triangles(edges)


def test_triangle_oracle_matches(spark):
    edges = [(i, (i + o) % 11) for i in range(11) for o in (1, 2)]
    got = _spark_triangles(spark, edges)
    rows = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = triangle_oracle_sql(
        f"SELECT * FROM (VALUES {rows}) AS t(src, dst)"
    )
    assert got == duckdb.sql(sql).fetchone()[0] == _py_triangles(edges)


# --- weighted shortest paths -----------------------------------------------

from carto_etl_spark.operators.graph import (
    shortest_paths,
    shortest_paths_oracle_sql,
)

# direct 1->4 costs 10; detour 1->2->3->4 costs 3: longer path must win
SP_EDGES = [(1, 4, 10), (1, 2, 1), (2, 3, 1), (3, 4, 1), (5, 6, 2)]


def _py_sp(edges, sources, rounds):
    dist = {s: 0 for s in sources}
    for _ in range(rounds):
        for s, d, w in edges:
            if s in dist and dist[s] + w < dist.get(d, 1 << 60):
                dist[d] = dist[s] + w
    return dist


def _spark_sp(spark, edges, sources, **kw):
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    return {
        r["node"]: r["dist"]
        for r in shortest_paths(df, sources=sources, **kw).collect()
    }


def test_cheaper_longer_path_beats_direct_edge(spark):
    got = _spark_sp(spark, SP_EDGES, [1], max_rounds=5)
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}
    assert 5 not in got and 6 not in got


def test_sp_round_cap_limits_relaxation(spark):
    got = _spark_sp(spark, SP_EDGES, [1], max_rounds=1)
    assert got == {1: 0, 2: 1, 4: 10}  # detour not yet discovered


def test_sp_matches_python_multi_source(spark):
    got = _spark_sp(spark, SP_EDGES, [1, 5], max_rounds=6)
    assert got == _py_sp(SP_EDGES, [1, 5], 6)


def test_sp_oracle_matches(spark):
    got = _spark_sp(spark, SP_EDGES, [1], max_rounds=4)
    rows = ", ".join(f"({s}, {d}, {w})" for s, d, w in SP_EDGES)
    sql = shortest_paths_oracle_sql(
        f"SELECT * FROM (VALUES {rows}) AS t(src, dst, w)", [1],
        max_rounds=4,
    )
    assert got == dict(duckdb.sql(sql).fetchall())


# --- driver-loop fast path vs distributed path ------------------------------
# Small graphs run the exact integer loop on the DRIVER (the iterative
# analogue of a broadcast join); these tests pin that both paths produce
# bit-identical results, so the oracle/property tests above (which now hit
# the driver path) transfer to the distributed loop too.


def test_pagerank_driver_matches_distributed(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst", "w"])
    fast = {r["node"]: r["rank_scaled"] for r in pagerank(df).collect()}
    dist = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, driver_threshold_edges=0).collect()
    }
    assert fast == dist


def test_bfs_driver_matches_distributed(spark):
    edges = [(i, (2 * i + 1) % 25) for i in range(25)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    fast = {r["node"]: r["hops"] for r in bfs_hops(df, sources=[0]).collect()}
    dist = {
        r["node"]: r["hops"]
        for r in bfs_hops(df, sources=[0], driver_threshold_edges=0).collect()
    }
    assert fast == dist


def test_sp_driver_matches_distributed(spark):
    df = spark.createDataFrame(SP_EDGES, ["src", "dst", "w"])
    fast = {r["node"]: r["dist"] for r in shortest_paths(df, [1]).collect()}
    dist = {
        r["node"]: r["dist"]
        for r in shortest_paths(df, [1], driver_threshold_edges=0).collect()
    }
    assert fast == dist


def test_driver_threshold_probe_respects_limit(spark):
    # graph bigger than the threshold takes the distributed path and still
    # produces the same answer
    edges = [(i, (i + 1) % 40, 1) for i in range(40)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    fast = {r["node"]: r["dist"] for r in shortest_paths(df, [0]).collect()}
    forced = {
        r["node"]: r["dist"]
        for r in shortest_paths(df, [0], driver_threshold_edges=10).collect()
    }
    assert fast == forced
