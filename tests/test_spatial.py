"""Grid-bucketed spatial joins: equivalence against python brute force
(so the blocking's completeness is what gets tested), edge/boundary
semantics, guard rails, and the no-cartesian plan gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.spatial import (
    nearest_join,
    point_in_box_join,
    with_cell,
)


def _points(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id long, x double, y double",
    )


def _boxes(spark, boxes):
    return spark.createDataFrame(
        [
            (i, float(x0), float(y0), float(x1), float(y1))
            for i, (x0, y0, x1, y1) in enumerate(boxes)
        ],
        "box_id long, xmin double, ymin double, xmax double, ymax double",
    )


PTS = [
    (0.0, 0.0), (0.5, 0.5), (2.5, 2.5), (-1.5, 3.2), (10.0, 10.0),
    (9.99, 9.99), (-0.01, 0.0), (7.3, -2.2), (3.0, 3.0), (1.0, 1.0),
]
BOXES = [
    (-1.0, -1.0, 1.0, 1.0),      # around origin
    (0.0, 0.0, 10.0, 10.0),      # big box, many cells
    (2.5, 2.5, 2.5, 2.5),        # degenerate: single point box
    (-5.0, 2.0, -1.0, 4.0),
    (8.0, -3.0, 12.0, -1.0),
]


def _brute_contains():
    out = set()
    for pi, (x, y) in enumerate(PTS):
        for bi, (x0, y0, x1, y1) in enumerate(BOXES):
            if x0 <= x <= x1 and y0 <= y <= y1:
                out.add((pi, bi))
    return out


def test_point_in_box_matches_brute_force(spark):
    got = point_in_box_join(
        _points(spark, PTS), _boxes(spark, BOXES), cell=1.0
    )
    pairs = {(r["id"], r["box_id"]) for r in got.collect()}
    assert pairs == _brute_contains()
    # each pair meets in exactly one cell: no dup rows to begin with
    assert got.count() == len(pairs)


def test_point_in_box_closed_edges(spark):
    # point exactly on every edge/corner is contained (closed envelope)
    pts = _points(spark, [(0.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.5, 0.0)])
    bxs = _boxes(spark, [(0.0, 0.0, 1.0, 1.0)])
    assert point_in_box_join(pts, bxs, cell=0.7).count() == 4


def test_point_in_box_cell_size_invariance(spark):
    expected = _brute_contains()
    for cell in (0.3, 1.0, 5.0, 100.0):
        got = point_in_box_join(
            _points(spark, PTS), _boxes(spark, BOXES), cell=cell
        )
        assert {(r["id"], r["box_id"]) for r in got.collect()} == expected


def test_max_cells_guard(spark):
    bxs = _boxes(spark, [(0.0, 0.0, 1000.0, 1000.0)])
    with pytest.raises(ValueError, match="max_cells_per_box"):
        point_in_box_join(
            _points(spark, PTS), bxs, cell=1.0, max_cells_per_box=100
        )


def _brute_nearest(left, right, radius, k=1):
    out = []
    for li, (lx, ly) in enumerate(left):
        cands = []
        for ri, (rx, ry) in enumerate(right):
            d2 = (lx - rx) ** 2 + (ly - ry) ** 2
            if d2 <= radius * radius:
                cands.append((d2, ri))
        cands.sort()
        for rank, (d2, ri) in enumerate(cands[:k], start=1):
            out.append((li, ri, rank))
    return set(out)


RIGHT = [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (10.0, 10.0), (2.0, 2.0),
         (-4.0, -4.0), (6.0, 1.0)]


def test_nearest_matches_brute_force(spark):
    got = nearest_join(
        _points(spark, PTS),
        _points(spark, RIGHT).withColumnRenamed("id", "rid"),
        cell=5.0,
        radius=5.0,
        left_id="id",
        right_id="rid",
        k=2,
    )
    pairs = {(r["id"], r["rid"], r["nn_rank"]) for r in got.collect()}
    assert pairs == _brute_nearest(PTS, RIGHT, 5.0, k=2)


def test_nearest_tiebreak_on_id(spark):
    # two candidates exactly equidistant: the smaller id wins rank 1
    left = _points(spark, [(0.0, 0.0)])
    right = _points(spark, [(1.0, 0.0), (-1.0, 0.0)]).withColumnRenamed(
        "id", "rid"
    )
    rows = (
        nearest_join(left, right, cell=2.0, radius=2.0,
                     left_id="id", right_id="rid", k=2)
        .orderBy("nn_rank")
        .collect()
    )
    assert [(r["rid"], r["nn_rank"]) for r in rows] == [(0, 1), (1, 2)]


def test_nearest_radius_guard(spark):
    with pytest.raises(ValueError, match="radius"):
        nearest_join(
            _points(spark, PTS), _points(spark, RIGHT),
            cell=1.0, radius=2.0, left_id="id", right_id="id",
        )


def test_nearest_out_of_range_emits_nothing(spark):
    left = _points(spark, [(100.0, 100.0)])
    right = _points(spark, RIGHT).withColumnRenamed("id", "rid")
    assert nearest_join(
        left, right, cell=5.0, radius=5.0, left_id="id", right_id="rid"
    ).count() == 0


def test_negative_coordinate_cells(spark):
    # floor (not trunc) cell math: -0.01 must land in cell -1, not 0
    df = with_cell(_points(spark, [(-0.01, -0.01), (0.01, 0.01)]), cell=1.0)
    cells = {(r["cx"], r["cy"]) for r in df.collect()}
    assert cells == {(-1, -1), (0, 0)}


# --- point-in-polygon ------------------------------------------------------

from carto_etl_spark.operators.spatial import point_in_polygon_join

# concave "U" shape: bbox is [0,3]x[0,3] but the notch (1,1)-(2,3) is outside
U_POLY = [(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (2.0, 3.0), (2.0, 1.0),
          (1.0, 1.0), (1.0, 3.0), (0.0, 3.0)]
STAR = [(2.0, 0.0), (0.5, 0.5), (0.0, 2.0), (-0.5, 0.5), (-2.0, 0.0),
        (-0.5, -0.5), (0.0, -2.0), (0.5, -0.5)]


def _py_ray_cast(px, py, poly):
    c = 0
    for i in range(len(poly)):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % len(poly)]
        if (y1 > py) != (y2 > py) and px < x1 + (py - y1) * (x2 - x1) / (
            y2 - y1
        ):
            c += 1
    return c % 2 == 1


def _poly_df(spark, polys):
    return spark.createDataFrame(
        [(i, [{"x": x, "y": y} for x, y in p]) for i, p in enumerate(polys)],
        "poly_id long, vertices array<struct<x:double,y:double>>",
    )


def test_polygon_concavity_beats_bbox(spark):
    pts = _points(spark, [(1.5, 2.0), (0.5, 0.5), (2.5, 2.5), (1.5, 0.5)])
    got = point_in_polygon_join(pts, _poly_df(spark, [U_POLY]), cell=1.0)
    inside = {r["id"] for r in got.collect()}
    # (1.5, 2.0) is inside the BBOX but inside the notch -> outside the poly
    assert inside == {1, 2, 3}


def test_polygon_matches_python_ray_cast(spark):
    grid = [(x * 0.37 - 2.2, y * 0.41 - 2.1) for x in range(12)
            for y in range(11)]
    polys = [STAR, U_POLY, [(c[0] + 1.0, c[1] - 0.5) for c in STAR]]
    got = point_in_polygon_join(
        _points(spark, grid), _poly_df(spark, polys), cell=1.5
    )
    pairs = {(r["id"], r["poly_id"]) for r in got.collect()}
    expected = {
        (i, j)
        for i, (px, py) in enumerate(grid)
        for j, poly in enumerate(polys)
        if _py_ray_cast(px, py, poly)
    }
    assert pairs == expected


def test_polygon_cell_size_invariance(spark):
    pts = _points(spark, [(0.0, 0.1), (1.8, 0.0), (0.0, 1.9), (5.0, 5.0)])
    expected = None
    for cell in (0.5, 2.0, 50.0):
        got = point_in_polygon_join(
            pts, _poly_df(spark, [STAR]), cell=cell
        )
        pairs = {(r["id"], r["poly_id"]) for r in got.collect()}
        if expected is None:
            expected = pairs
        assert pairs == expected
    assert expected == {(0, 0), (1, 0), (2, 0)}


def test_spatial_plans_have_no_cartesian(spark):
    contains = point_in_box_join(
        _points(spark, PTS), _boxes(spark, BOXES), cell=1.0
    )
    nearest = nearest_join(
        _points(spark, PTS),
        _points(spark, RIGHT).withColumnRenamed("id", "rid"),
        cell=5.0, radius=5.0, left_id="id", right_id="rid",
    )
    for df in (contains, nearest):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
