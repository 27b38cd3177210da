"""Grid-bucketed spatial joins: point-in-box containment and nearest-
neighbor-within-radius, without a cartesian product anywhere.

The reference delegates every spatial predicate to PostGIS (the `the_geom`
column it renders in /root/reference/etl/etl.py is consumed by CARTO's
PostGIS tier); these operators give the same join shapes a distributed
execution, which is the part that matters at 100 TB: a naive points x
polygons join is O(n*m) and unrunnable, while grid blocking makes the
shuffle volume ~points + boxes*cells_covered and lets every candidate pair
meet in an equi-join that Catalyst can hash- or broadcast-plan.

Blocking scheme
---------------
Space is cut into square cells of side ``cell`` (floor division on each
axis).  A *point* lands in exactly one cell.  A *box* is exploded to every
cell its envelope covers (bounded by ``max_cells_per_box`` -- a miskeyed
units mismatch should error, not plan a billion-row explode).  Because the
point's single cell is always among the box's covering cells, joining on
the cell key loses nothing, and -- the property that keeps the operator
cheap -- each surviving (point, box) pair meets in exactly ONE cell (the
point's), so no post-join dedup pass is needed.

For nearest-neighbor the roles flip: the probe side explodes to its 3x3
cell neighborhood and candidates pair up in the *candidate's* single cell.
Any candidate within ``radius <= cell`` of the probe lies in one of those 9
cells, so the blocking is exact, and again each (probe, candidate) pair
meets exactly once.

Determinism: every emitted coordinate/distance is plain double arithmetic
written in the same operation order as the DuckDB oracles (IEEE-754 ops are
correctly rounded, so identical expressions give bit-identical results
across engines); winners are tie-broken on (dist2, candidate id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def cell_expr(coord: Column, cell: float) -> Column:
    """Grid cell index along one axis: floor(coord / cell) as a long."""
    return F.floor(coord / F.lit(float(cell))).cast("long")


def with_cell(
    df: DataFrame, x: str = "x", y: str = "y", cell: float = 1.0
) -> DataFrame:
    return df.withColumn("cx", cell_expr(F.col(x), cell)).withColumn(
        "cy", cell_expr(F.col(y), cell)
    )


def _covering_cells(
    df: DataFrame,
    xmin: str,
    ymin: str,
    xmax: str,
    ymax: str,
    cell: float,
    max_cells_per_box: int,
) -> DataFrame:
    """Explode each box to the grid cells its envelope touches.

    The cell count is validated *before* the explode with a plain column
    predicate aggregated to one row -- a box spanning the planet because the
    caller mixed degrees and meters must fail fast, not materialize 10^8
    rows per box into the shuffle.
    """
    cx0 = cell_expr(F.col(xmin), cell)
    cx1 = cell_expr(F.col(xmax), cell)
    cy0 = cell_expr(F.col(ymin), cell)
    cy1 = cell_expr(F.col(ymax), cell)
    n_cells = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
    worst = (
        df.select(F.max(n_cells).alias("m")).first()["m"]
        if max_cells_per_box is not None
        else None
    )
    if worst is not None and worst > max_cells_per_box:
        raise ValueError(
            f"a box covers {worst} grid cells (> max_cells_per_box="
            f"{max_cells_per_box}); the cell size is too small for the box "
            "extents (units mismatch?) -- raise `cell` or the cap"
        )
    return (
        df.withColumn("cx", F.explode(F.sequence(cx0, cx1)))
        .withColumn("cy", F.explode(F.sequence(cy0, cy1)))
    )


def point_in_box_join(
    points: DataFrame,
    boxes: DataFrame,
    cell: float,
    x: str = "x",
    y: str = "y",
    xmin: str = "xmin",
    ymin: str = "ymin",
    xmax: str = "xmax",
    ymax: str = "ymax",
    max_cells_per_box: int = 4096,
) -> DataFrame:
    """All (point, box) pairs where the point lies inside the box envelope
    (closed on all four edges), via the grid equi-join described in the
    module docstring.  Output: all point columns + all box columns."""
    pts = with_cell(points, x, y, cell)
    bxs = _covering_cells(boxes, xmin, ymin, xmax, ymax, cell, max_cells_per_box)
    contained = (
        (F.col(x) >= F.col(xmin))
        & (F.col(x) <= F.col(xmax))
        & (F.col(y) >= F.col(ymin))
        & (F.col(y) <= F.col(ymax))
    )
    return pts.join(bxs, ["cx", "cy"]).where(contained).drop("cx", "cy")


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    cell: float,
    x: str = "x",
    y: str = "y",
    poly_id: str = "poly_id",
    vertices: str = "vertices",
    max_cells_per_poly: int = 4096,
) -> DataFrame:
    """All (point, polygon) pairs where the point is inside the (possibly
    non-convex) polygon, by even-odd ray casting.

    ``polygons[vertices]`` is an ``array<struct<x,y>>`` in boundary order
    (closing edge implied).  Blocking reuses the grid scheme: each polygon
    explodes to the cells its BBOX covers, the point meets candidates in
    its single cell, and the exact test runs entirely map-side after the
    equi-join -- the edge list rides along as an array column and a single
    ``aggregate`` lambda counts ray crossings, so there is no second join
    against an exploded edge table and no regrouping pass.

    The crossing test guards its division behind a lazy conditional (a
    horizontal edge can never satisfy the straddle condition, and both
    Spark and DuckDB define CASE as lazy), so no NULL/Inf from
    divide-by-zero can leak into the count.  Points exactly ON a boundary
    edge follow raw even-odd semantics (half-open in practice); callers
    needing closed-boundary semantics should buffer, as with PostGIS
    ST_Contains vs ST_Covers.
    """
    vx = F.transform(F.col(vertices), lambda v: v["x"])
    vy = F.transform(F.col(vertices), lambda v: v["y"])
    polys = (
        polygons.withColumn("xmin", F.array_min(vx))
        .withColumn("xmax", F.array_max(vx))
        .withColumn("ymin", F.array_min(vy))
        .withColumn("ymax", F.array_max(vy))
    )
    n = F.size(F.col(vertices))
    rotated = F.concat(
        F.slice(F.col(vertices), 2, n - 1), F.slice(F.col(vertices), 1, 1)
    )
    polys = polys.withColumn(
        "_edges", F.arrays_zip(F.col(vertices).alias("a"), rotated.alias("b"))
    )
    cells = _covering_cells(
        polys, "xmin", "ymin", "xmax", "ymax", cell, max_cells_per_poly
    ).select(poly_id, "_edges", "cx", "cy")

    pts = with_cell(points, x, y, cell)
    px, py = F.col(x), F.col(y)

    def _crossing(acc, e):
        straddles = (e["a"]["y"] > py) != (e["b"]["y"] > py)
        intersects_right_of_px = px < e["a"]["x"] + (py - e["a"]["y"]) * (
            e["b"]["x"] - e["a"]["x"]
        ) / (e["b"]["y"] - e["a"]["y"])
        return acc + F.when(
            straddles & intersects_right_of_px, F.lit(1)
        ).otherwise(F.lit(0))

    crossings = F.aggregate(F.col("_edges"), F.lit(0), _crossing)
    return (
        pts.join(cells, ["cx", "cy"])
        .where((crossings % 2) == 1)
        .drop("cx", "cy", "_edges")
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    cell: float,
    radius: float,
    left_id: str,
    right_id: str,
    x: str = "x",
    y: str = "y",
    k: int = 1,
) -> DataFrame:
    """For each left point, its ``k`` nearest right points within
    ``radius`` (squared-euclidean metric, ties broken on the right id;
    requires ``radius <= cell`` so the 3x3 neighborhood is exact).

    Output: left_id, right_id, dist2, nn_rank (1-based).  Left points with
    no candidate in range emit nothing (inner-join semantics).
    """
    if radius > cell:
        raise ValueError(
            f"radius ({radius}) must be <= cell ({cell}): the 3x3 cell "
            "neighborhood only covers distances up to one cell size"
        )
    offsets = F.array(
        *[
            F.struct(F.lit(i).alias("ox"), F.lit(j).alias("oy"))
            for i in (-1, 0, 1)
            for j in (-1, 0, 1)
        ]
    )
    probes = (
        with_cell(left, x, y, cell)
        .select(
            F.col(left_id),
            F.col(x).alias("_lx"),
            F.col(y).alias("_ly"),
            "cx",
            "cy",
            F.explode(offsets).alias("_o"),
        )
        .select(
            left_id,
            "_lx",
            "_ly",
            (F.col("cx") + F.col("_o.ox")).cast("long").alias("cx"),
            (F.col("cy") + F.col("_o.oy")).cast("long").alias("cy"),
        )
    )
    cands = with_cell(right, x, y, cell).select(
        F.col(right_id),
        F.col(x).alias("_rx"),
        F.col(y).alias("_ry"),
        "cx",
        "cy",
    )
    dx = F.col("_lx") - F.col("_rx")
    dy = F.col("_ly") - F.col("_ry")
    dist2 = (dx * dx + dy * dy).alias("dist2")
    from pyspark.sql import Window

    w = Window.partitionBy(left_id).orderBy("dist2", right_id)
    return (
        probes.join(cands, ["cx", "cy"])
        .select(left_id, right_id, dist2)
        .where(F.col("dist2") <= F.lit(float(radius)) * F.lit(float(radius)))
        .withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= k)
    )
