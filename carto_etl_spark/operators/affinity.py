"""Market-basket affinity: item-pair co-occurrence, support, and lift over
an order/basket table — the association-rule core of recommendation and
assortment analytics.

Not in the reference (its scope ends at SQL-text DML,
/root/reference/etl/etl.py); a north-star analytics operator.

Plan shape — why this survives 100 TB:
- baskets are deduplicated to distinct (basket, item) FIRST, so the pair
  self-join keys on basket_id and its output is sum over baskets of
  lines-choose-2 — linear in rows for bounded basket sizes (retail baskets
  are tens of lines, never millions).  A degenerate mega-basket would blow
  that bound, so ``max_basket_items`` drops baskets above a cap (standard
  practice in association mining — a basket with 10k items carries no
  pairwise signal anyway) and makes the quadratic term explicitly bounded:
  pairs ≤ rows × cap / 2.
- per-item counts join back onto the pair aggregate (item-sized, broadcast
  when small); the basket total is a single-row aggregate cross-joined in.
- lift = (pair_count · n_baskets) / (count_a · count_b): integer products,
  ONE double division — exact and engine-reproducible (the repo-wide
  no-float-accumulation convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def item_pair_affinity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_items: int = 200,
) -> DataFrame:
    """Co-occurrence statistics for every item pair appearing in at least
    ``min_pair_count`` baskets: (item_a, item_b, pair_count, count_a,
    count_b, n_baskets, support, lift), item_a < item_b canonical."""
    baskets = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    sizes = baskets.groupBy("basket").agg(
        F.count(F.lit(1)).alias("__sz")
    )
    # materialize ``bounded``: it feeds FOUR plan branches (both pair-join
    # sides, the item counts, the basket total) and unmaterialized each
    # branch replayed the scan + distinct + size join (r10 measure: 20
    # Exchanges in the plan).  The checkpoint holds two columns of the
    # deduplicated basket lines — the same order of bytes the pair join
    # must process anyway.  (Sizes stay a groupBy, not a count-window: the
    # partial agg collapses a degenerate mega-basket map-side, where a
    # window would funnel its rows into one task.)
    bounded = (
        baskets.join(
            sizes.where(F.col("__sz") <= max_basket_items), "basket"
        )
        .select("basket", "item")
        .localCheckpoint(eager=True)
    )
    left = bounded.select("basket", F.col("item").alias("item_a"))
    right = bounded.select("basket", F.col("item").alias("item_b"))
    pairs = (
        left.join(right, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_count)
    )
    item_counts = bounded.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    totals = bounded.agg(
        F.countDistinct("basket").cast("long").alias("n_baskets")
    )
    ca = item_counts.select(
        F.col("item").alias("item_a"), F.col("cnt").alias("count_a")
    )
    cb = item_counts.select(
        F.col("item").alias("item_b"), F.col("cnt").alias("count_b")
    )
    out = (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        "item_a",
        "item_b",
        "pair_count",
        "count_a",
        "count_b",
        "n_baskets",
        (
            F.col("pair_count").cast("double")
            / F.col("n_baskets").cast("double")
        ).alias("support"),
        (
            (F.col("pair_count") * F.col("n_baskets")).cast("double")
            / (F.col("count_a") * F.col("count_b")).cast("double")
        ).alias("lift"),
    )


def item_pair_affinity_oracle_sql(
    rows_sql: str,
    min_pair_count: int = 2,
    max_basket_items: int = 200,
) -> str:
    """Mirror of `item_pair_affinity`: ``rows_sql`` must yield
    (basket, item)."""
    return f"""
WITH raw AS (SELECT DISTINCT basket, item FROM ({rows_sql}) r),
bounded AS (
  SELECT basket, item FROM raw
  WHERE basket IN (SELECT basket FROM raw GROUP BY basket
                   HAVING count(*) <= {max_basket_items})
),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(count(*) AS BIGINT) AS pair_count
  FROM bounded a JOIN bounded b ON a.basket = b.basket
  WHERE a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= {min_pair_count}
),
items AS (
  SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM bounded GROUP BY 1
),
tot AS (
  SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM bounded
)
SELECT p.item_a, p.item_b, p.pair_count,
       ia.cnt AS count_a, ib.cnt AS count_b, t.n_baskets,
       CAST(p.pair_count AS DOUBLE) / CAST(t.n_baskets AS DOUBLE)
         AS support,
       CAST(p.pair_count * t.n_baskets AS DOUBLE)
         / CAST(ia.cnt * ib.cnt AS DOUBLE) AS lift
FROM pairs p
JOIN items ia ON p.item_a = ia.item
JOIN items ib ON p.item_b = ib.item
CROSS JOIN tot t
"""
