"""Driver-facing query catalog: every implemented operator from SURVEY.md §2
(plus the LLM-pipeline extensions) as a (spark, sf_dir) -> DataFrame callable,
with a DuckDB-runnable ANSI-SQL oracle where the semantics are SQL-expressible.

Conventions (driver compare is column-name-sorted value hashing):
- every computed column is aliased identically in Spark and SQL;
- floating aggregates are rounded (sums of exact decimals: 2, ratios/cosines:
  6) so accumulation-order FP noise cannot flip the hash;
- NO rounded averages/interpolations of decimal values in hash outputs: when
  the true value lands a '5' just past the rounding cut on an inexact double,
  Spark (HALF_UP on the shortest decimal repr) and DuckDB (round on the
  binary value) disagree — emit (sum, count) pairs or min/max instead, and
  give threshold comparisons an epsilon margin;
- timestamps are rendered to strings on both sides;
- ordering only matters where a LIMIT exists, and is always made deterministic
  by a unique tie-break key on the *rounded* value.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from carto_etl_spark.config import JobConfig
from carto_etl_spark.functions.coerce import float_expr, timestamp_expr
from carto_etl_spark.functions.geom import (
    point_struct,
    tile_x,
    tile_y,
    validated_lat,
    validated_lon,
    wkt_point,
)
from carto_etl_spark.operators import decontam as dc
from carto_etl_spark.operators.bloom import bloom_anti_join
from carto_etl_spark.operators import dedup as dd
from carto_etl_spark.operators import overviews as ov
from carto_etl_spark.operators import sampling as smp
from carto_etl_spark.operators import scrub as sc
from carto_etl_spark.operators import similarity as sim
from carto_etl_spark.operators import text as tx
from carto_etl_spark.session import local_df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet carries TIMESTAMP(NANOS), which Spark's reader rejects
    # unless nanos arrive as long. The conf is runtime-settable, and setting it
    # here makes the catalog self-sufficient under any session (the driver
    # harness builds its own plain session that lacks it).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # nanosecond-precision parquet timestamps arrive as long (see session.py
    # nanosAsLong); convert to microsecond timestamps. Integer `div` keeps the
    # conversion exact — bigint `/` promotes to double, and epoch-nanos exceed
    # double's 53-bit exact range.
    for c, t in df.dtypes:
        if c == "ts" and t == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def widen(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Round-robin repartition so CPU-heavy per-row work engages every core
    when the file layout under-splits the scan (the local test tables are
    single-row-group parquet: Spark plans byte-range splits but only the one
    containing the row-group midpoint yields rows, so effective scan
    parallelism is 1).  No-op whenever the scan already produces at least
    one split per core — on a real cluster a large table yields orders of
    magnitude more splits than ``defaultParallelism``, so this never inserts
    a shuffle at scale.  Use only ahead of expression chains whose per-row
    cost dwarfs one extra pass over the bytes (md5 shingles, locale parse)."""
    try:
        parts = spark.sparkContext.defaultParallelism
        # df.rdd forces a plan conversion and is unsupported under Spark
        # Connect; any failure here means "can't tell" -> leave df alone
        if df.rdd.getNumPartitions() >= parts:
            return df
    except Exception:
        return df
    return df.repartition(parts)


# ---------------------------------------------------------------------------
# Relational core (the execution surface the reference delegates to PostgreSQL)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy partial-agg benchmark anchor."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.sum("l_discount"), 2).alias("sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(sum(l_discount), 2) AS sum_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders_per_customer(spark, sf_dir):
    """Window top-k per group (reference S8/top-k analog)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


ORACLE_TOP_ORDERS = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    return (
        joined.groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("l_orderkey"))
        .limit(10)
    )


ORACLE_SHIPPING = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_region_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join with small dims broadcast."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, (li["l_suppkey"] == s["s_suppkey"])
              & (c["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


ORACLE_REGION_VOLUME = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY n_name
"""


def q_mktsegment_stats(spark, sf_dir):
    """Aggregation surface: count / avg / distinct."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


ORACLE_MKTSEGMENT = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS sum_acctbal,
       count(DISTINCT c_nationkey) AS n_nations
FROM customer GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# ETL-job semantics as queries (insert coercion / update merge / delete /
# chunking / row ranges)
# ---------------------------------------------------------------------------

def q_locale_float_coercion(spark, sf_dir):
    """Reference F2: locale float parse round-trip (decimal comma)."""
    li = widen(load(spark, sf_dir, "lineitem"), spark)
    qty_str = F.replace(
        F.col("l_quantity").cast("string"), F.lit("."), F.lit(",")
    )
    disc_str = F.replace(
        F.col("l_discount").cast("string"), F.lit("."), F.lit(",")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        float_expr(qty_str, comma_separator=",").alias("qty_parsed"),
        float_expr(disc_str, comma_separator=",").alias("disc_parsed"),
        float_expr(F.lit("INFINITY")).alias("forbidden_is_null"),
    )


ORACLE_LOCALE_FLOAT = """
SELECT l_orderkey, l_linenumber,
       try_cast(replace(replace(cast(l_quantity AS varchar), '.', ','), ',', '.') AS double) AS qty_parsed,
       try_cast(replace(replace(cast(l_discount AS varchar), '.', ','), ',', '.') AS double) AS disc_parsed,
       CAST(NULL AS double) AS forbidden_is_null
FROM lineitem
"""


def q_dual_format_dates(spark, sf_dir):
    """Reference F3: dual-format date parse + CARTO render."""
    o = load(spark, sf_dir, "orders")
    as_string = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.date_format("o_orderdate", "dd/MM/yyyy HH:mm:ss"),
    ).otherwise(F.date_format("o_orderdate", "dd/MM/yyyy"))
    parsed = timestamp_expr(as_string, "%d/%m/%Y %H:%M:%S", "%d/%m/%Y")
    return o.select(
        "o_orderkey",
        as_string.alias("raw_string"),
        F.date_format(parsed, "yyyy-MM-dd HH:mm:ss'+00'").alias("carto_rendered"),
    )


ORACLE_DUAL_DATES = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
            ELSE strftime(o_orderdate, '%d/%m/%Y') END AS raw_string,
       strftime(
         coalesce(
           try_strptime(CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
                             ELSE strftime(o_orderdate, '%d/%m/%Y') END, '%d/%m/%Y %H:%M:%S'),
           try_strptime(CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
                             ELSE strftime(o_orderdate, '%d/%m/%Y') END, '%d/%m/%Y')),
         '%Y-%m-%d %H:%M:%S+00') AS carto_rendered
FROM orders
"""


def q_update_merge(spark, sf_dir):
    """Reference D2 (keyed UPDATE) as one MERGE-shaped join: every 10th
    customer gets acctbal+1000 and an uppercased name."""
    c = load(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("u_key"),
        F.round(F.col("c_acctbal") + 1000.0, 2).alias("u_acctbal"),
        F.upper("c_name").alias("u_name"),
        F.lit(True).alias("u_matched"),
    )
    joined = c.join(F.broadcast(updates), c["c_custkey"] == updates["u_key"], "left")
    m = F.col("u_matched").isNotNull()
    return joined.select(
        "c_custkey",
        F.when(m, F.col("u_name")).otherwise(F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.round(
            F.when(m, F.col("u_acctbal")).otherwise(F.col("c_acctbal")), 2
        ).alias("c_acctbal"),
        "c_mktsegment",
    )


ORACLE_UPDATE_MERGE = """
SELECT c_custkey,
       CASE WHEN c_custkey % 10 = 0 THEN upper(c_name) ELSE c_name END AS c_name,
       c_nationkey,
       round(CASE WHEN c_custkey % 10 = 0 THEN round(c_acctbal + 1000.0, 2)
                  ELSE c_acctbal END, 2) AS c_acctbal,
       c_mktsegment
FROM customer
"""


def q_transactional_lifecycle(spark, sf_dir):
    """Transactional sink end-to-end (operators/transactional.py): two atomic
    append commits, a copy-on-write merge overwrite, then vacuum — the final
    snapshot read must equal the declarative merge the oracle computes.
    Exercises the manifest protocol, snapshot reads, and file GC, not just
    the query layer."""
    import shutil
    import tempfile

    from carto_etl_spark.operators.transactional import TransactionalTable

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    workdir = tempfile.mkdtemp(prefix="txn-lifecycle-")
    try:
        t = TransactionalTable(spark, f"{workdir}/t")
        t.append(c.filter(F.col("c_custkey") % 2 == 0))
        t.append(c.filter(F.col("c_custkey") % 2 == 1))
        snap = t.read()
        merged = snap.select(
            "c_custkey",
            F.when(F.col("c_custkey") % 10 == 0, F.upper("c_name"))
            .otherwise(F.col("c_name"))
            .alias("c_name"),
            F.round(
                F.when(
                    F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 1000.0
                ).otherwise(F.col("c_acctbal")),
                2,
            ).alias("c_acctbal"),
        )
        t.overwrite(merged)
        t.vacuum(retain_versions=1)
        out = t.read()
        # materialize before the workdir disappears
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_TXN_LIFECYCLE = """
SELECT c_custkey,
       CASE WHEN c_custkey % 10 = 0 THEN upper(c_name) ELSE c_name END AS c_name,
       round(CASE WHEN c_custkey % 10 = 0 THEN round(c_acctbal, 2) + 1000.0
                  ELSE round(c_acctbal, 2) END, 2) AS c_acctbal
FROM customer
"""


def q_delete_antijoin(spark, sf_dir):
    """Reference D3 (keyed DELETE) as an anti-join: drop lineitems of 'F'
    orders, then aggregate survivors."""
    li = load(spark, sf_dir, "lineitem")
    doomed = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    survivors = li.join(
        doomed, li["l_orderkey"] == doomed["o_orderkey"], "left_anti"
    )
    return survivors.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


ORACLE_DELETE = """
SELECT l_returnflag, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
GROUP BY l_returnflag
"""


def q_chunk_assignment(spark, sf_dir):
    """Reference S7 (documented chunk semantics): chunk = floor(row_idx /
    chunk_size) + 1 over a deterministic row order.

    Runs on the engine's DISTRIBUTED row index (operators/ranking.py:
    literal range-bucket boundaries + bucket-partitioned window + broadcast
    offsets) — not an unpartitioned ``row_number`` window, which would
    funnel the fact table through one task (plan-gated in
    tests/test_plans.py)."""
    from carto_etl_spark.operators.ranking import with_keyed_row_index

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    indexed = with_keyed_row_index(
        li, ["l_orderkey", "l_linenumber"], name="row_idx"
    )
    chunked = indexed.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("row_idx") / 1000) + 1).alias("chunk_id"),
    )
    return chunked.groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("first_key"),
        F.max("l_orderkey").alias("last_key"),
    )


ORACLE_CHUNKS = """
SELECT chunk_id, count(*) AS n_rows,
       min(l_orderkey) AS first_key, max(l_orderkey) AS last_key
FROM (
  SELECT l_orderkey, l_linenumber,
         cast(floor((row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1) / 1000) + 1 AS bigint) AS chunk_id
  FROM lineitem
) GROUP BY chunk_id
"""


def q_row_range(spark, sf_dir):
    """Reference S8 (UpdateJob start_row/end_row): rows 1001..1100 of the
    ordered scan — via the distributed global rank (operators/ranking.py),
    then sources/csv.py row_range_filter semantics (1-based inclusive
    window).  No unpartitioned WindowExec (plan-gated)."""
    from carto_etl_spark.operators.ranking import with_global_rank

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    ranked = with_global_rank(
        li, ["l_orderkey", "l_linenumber"], name="rn"
    )
    return (
        ranked.filter((F.col("rn") >= 1001) & (F.col("rn") <= 1100))
        .select(
            F.col("rn").cast("int").alias("rn"),
            "l_orderkey",
            "l_linenumber",
            F.round("l_quantity", 2).alias("qty"),
        )
    )


ORACLE_ROW_RANGE = """
SELECT rn, l_orderkey, l_linenumber, round(l_quantity, 2) AS qty
FROM (
  SELECT l_orderkey, l_linenumber, l_quantity,
         row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
  FROM lineitem
) WHERE rn BETWEEN 1001 AND 1100
"""


def q_threeway_fanout(spark, sf_dir):
    """Reference D7 (geocode 3-way fan-out sink shape): classify rows into
    found / not_found / invalid and aggregate each branch."""
    e = load(spark, sf_dir, "events")
    status = (
        F.when(F.col("value") < 10, "invalid")
        .when(F.col("value") < 100, "not_found")
        .otherwise("found")
    )
    return e.select(status.alias("status"), "value").groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


ORACLE_FANOUT = """
SELECT CASE WHEN value < 10 THEN 'invalid'
            WHEN value < 100 THEN 'not_found'
            ELSE 'found' END AS status,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Geometry + overviews
# ---------------------------------------------------------------------------

def _synth_lon(key, modulo=400, offset=200):
    return (key % modulo - offset + F.lit(0.5)).cast("double")


def _wkb_fixture_rows() -> list[tuple[int, str | None]]:
    """Deterministic hex-WKB corpus for the wkb_points entry: EWKB + plain
    WKB, both byte orders, mixed SRIDs, and a tail of undecodable rows
    (NaN coords, a LINESTRING, bad hex, truncation, NULL/empty).  The hex
    is built driver-side with struct.pack — the ENCODE side is shared
    input; what the oracle independently re-derives is the DECODE."""
    import math as _math
    import struct as _struct

    def ewkb(x, y, srid=4326, little=True, gtype=1, with_srid=True):
        bo = "<" if little else ">"
        t = gtype | (0x20000000 if with_srid else 0)
        out = bytes([1 if little else 0]) + _struct.pack(bo + "I", t)
        if with_srid:
            out += _struct.pack(bo + "I", srid)
        out += _struct.pack(bo + "dd", x, y)
        return out.hex()

    rows: list[tuple[int, str | None]] = []
    for i in range(48):
        x = round(-180 + (i * 7.31) % 360, 6)
        y = round(-85 + (i * 3.77) % 170, 6)
        rows.append(
            (
                i,
                ewkb(
                    x,
                    y,
                    srid=3857 if i % 7 == 3 else 4326,
                    little=i % 6 != 5,
                    with_srid=i % 5 != 4,
                ),
            )
        )
    rows += [
        (100, ewkb(_math.nan, 1.0)),
        (101, ewkb(_math.inf, 1.0)),
        (102, ewkb(1.0, 2.0, gtype=2)),          # LINESTRING
        (103, "zz" + ewkb(1.0, 2.0)[2:]),         # non-hex
        (104, ewkb(1.0, 2.0)[:-4]),               # truncated
        (105, None),
        (106, ""),
    ]
    return rows


def q_wkb_points(spark, sf_dir):
    """Hex-WKB POINT decoding (functions/geom.py wkb_point_expr): the
    reference's force_the_geom passthrough column (README.md:82 — "an
    hexstring value that has to be inserted directly into PostGIS",
    etl/etl.py:177-178) decoded into the engine's typed point struct with
    pure column math (substring + conv + integer bit arithmetic + one
    exact power-of-two scale per coordinate — IEEE-754 reconstruction is
    exact, no UDF, scan-stage).  Output: per-row st_x/st_y/srid plus the
    zoom-4 overview tile the decoded point lands in, proving passthrough
    geometries are first-class overview inputs.  The oracle re-derives
    the decode INDEPENDENTLY in DuckDB from the same hex strings."""
    from carto_etl_spark.functions.geom import wkb_point_expr

    df = local_df(spark, _wkb_fixture_rows(), "pid long, wkb string")
    g = wkb_point_expr("wkb")
    staged = df.select("pid", g.alias("g"))
    return staged.select(
        "pid",
        F.col("g.x").alias("x"),
        F.col("g.y").alias("y"),
        F.col("g.srid").alias("srid"),
        F.when(
            F.col("g").isNotNull(), tile_x(F.col("g.x"), 4)
        ).alias("tile_x"),
        F.when(
            F.col("g").isNotNull(), tile_y(F.col("g.y"), 4)
        ).alias("tile_y"),
    )


def _oracle_wkb_points() -> str:
    from carto_etl_spark.functions.geom import wkb_point_sql

    vals = ", ".join(
        f"({pid}, {'NULL' if h is None else chr(39) + h + chr(39)})"
        for pid, h in _wkb_fixture_rows()
    )
    sn = wkb_point_sql("wkb")
    return f"""
WITH raw(pid, wkb) AS (VALUES {vals}),
dec AS (
  SELECT pid,
         CASE WHEN {sn['ok']} THEN {sn['x']} END AS x,
         CASE WHEN {sn['ok']} THEN {sn['y']} END AS y,
         CASE WHEN {sn['ok']} THEN {sn['srid']} END AS srid
  FROM raw
)
SELECT pid, x, y, srid,
       CASE WHEN x IS NOT NULL THEN
         CAST(least(greatest(floor((x + 180) / 360 * 16), 0), 15) AS BIGINT)
       END AS tile_x,
       CASE WHEN y IS NOT NULL THEN
         CAST(least(greatest(floor((1 - ln(tan(radians(
                least(greatest(y, -85.05112878), 85.05112878)))
              + 1 / cos(radians(least(greatest(y, -85.05112878),
                85.05112878)))) / pi()) / 2 * 16), 0), 15) AS BIGINT)
       END AS tile_y
FROM dec
"""


def q_geom_points(spark, sf_dir):
    """Reference F5/P3/P4: point construction with bounds validation; some
    synthesized coords are deliberately out of range -> NULL geometry."""
    c = load(spark, sf_dir, "customer")
    lon = validated_lon((F.col("c_custkey") % 400 - 200 + F.lit(0.5)).cast("double"))
    lat = validated_lat((F.col("c_custkey") % 200 - 100 + F.lit(0.5)).cast("double"))
    return c.select(
        "c_custkey",
        lon.alias("lon"),
        lat.alias("lat"),
        wkt_point(lon, lat).alias("the_geom_wkt"),
    )


ORACLE_GEOM_POINTS = """
WITH pts AS (
  SELECT c_custkey,
         CASE WHEN abs(raw_lon) > 180 THEN NULL ELSE raw_lon END AS lon,
         CASE WHEN abs(raw_lat) > 90 THEN NULL ELSE raw_lat END AS lat
  FROM (SELECT c_custkey,
               cast(c_custkey % 400 - 200 + 0.5 AS double) AS raw_lon,
               cast(c_custkey % 200 - 100 + 0.5 AS double) AS raw_lat
        FROM customer)
)
SELECT c_custkey, lon, lat,
       CASE WHEN lon IS NOT NULL AND lat IS NOT NULL
            THEN concat('POINT (', cast(lon AS varchar), ' ', cast(lat AS varchar), ')')
       END AS the_geom_wkt
FROM pts
"""


def q_utm_transform(spark, sf_dir):
    """Reference F5 generalized: WGS84 -> UTM zone 33N forward transform
    (Krüger series, functions/geom.py) over synthesized coords spanning
    lon [9,21) x lat [-60,60).  The oracle re-derives the identical series in
    SQL (sinh/atanh spelled via exp/ln), so the hash check verifies the
    projection math itself.  Both sides emit integer metres: the remaining
    cross-engine libm noise (~1e-7 m) cannot flip an integer rounding."""
    from carto_etl_spark.functions.geom import transform_geom

    c = load(spark, sf_dir, "customer")
    src = c.select(
        "c_custkey",
        (F.lit(9.0) + (F.col("c_custkey") * 13 % 1200) / F.lit(100.0)).alias("lon"),
        (F.lit(-60.0) + (F.col("c_custkey") * 7 % 12000) / F.lit(100.0)).alias("lat"),
    )
    out = transform_geom(
        src.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326)),
        "g", 4326, 32633, out_col="utm",
    )
    return out.select(
        "c_custkey",
        F.round(F.col("utm.x")).cast("long").alias("easting_m"),
        F.round(F.col("utm.y")).cast("long").alias("northing_m"),
    )


# The same third-order Krüger series as functions/geom.py, constants at full
# double precision; sinh/atanh composed from exp/ln (portable across engines).
ORACLE_UTM = """
WITH src AS (
  SELECT c_custkey,
         9.0  + (c_custkey * 13 % 1200)  / 100.0 AS lon,
         -60.0 + (c_custkey * 7 % 12000) / 100.0 AS lat
  FROM customer
), base AS (
  SELECT c_custkey,
         radians(lat) AS phi,
         radians(lon) - radians(15.0) AS lam
  FROM src
), conf AS (
  SELECT c_custkey, lam,
         -- t = sinh( atanh(sin phi) - e * atanh(e * sin phi) ), e = 0.08181919084262149
         (exp(u) - exp(-u)) / 2.0 AS t
  FROM (
    SELECT c_custkey, lam,
           0.5 * ln((1.0 + sin(phi)) / (1.0 - sin(phi)))
           - 0.08181919084262149 * 0.5 * ln(
               (1.0 + 0.08181919084262149 * sin(phi))
               / (1.0 - 0.08181919084262149 * sin(phi))) AS u
    FROM base)
), prime AS (
  SELECT c_custkey,
         atan2(t, cos(lam)) AS xi_p,
         0.5 * ln((1.0 + s) / (1.0 - s)) AS eta_p
  FROM (SELECT c_custkey, t, lam, sin(lam) / sqrt(t * t + 1.0) AS s FROM conf)
), series AS (
  SELECT c_custkey,
         xi_p
           + 0.0008377318188192541  * sin(2.0 * xi_p) * (exp(2.0 * eta_p) + exp(-2.0 * eta_p)) / 2.0
           + 7.608496958699166e-07  * sin(4.0 * xi_p) * (exp(4.0 * eta_p) + exp(-4.0 * eta_p)) / 2.0
           + 1.2034877875966646e-09 * sin(6.0 * xi_p) * (exp(6.0 * eta_p) + exp(-6.0 * eta_p)) / 2.0
           AS xi,
         eta_p
           + 0.0008377318188192541  * cos(2.0 * xi_p) * (exp(2.0 * eta_p) - exp(-2.0 * eta_p)) / 2.0
           + 7.608496958699166e-07  * cos(4.0 * xi_p) * (exp(4.0 * eta_p) - exp(-4.0 * eta_p)) / 2.0
           + 1.2034877875966646e-09 * cos(6.0 * xi_p) * (exp(6.0 * eta_p) - exp(-6.0 * eta_p)) / 2.0
           AS eta
  FROM prime
)
SELECT c_custkey,
       cast(round(500000.0 + 6364902.166165086 * eta) AS bigint) AS easting_m,
       cast(round(6364902.166165086 * xi) AS bigint) AS northing_m
FROM series
"""


def q_lcc_transform(spark, sf_dir):
    """Reference F5 generalized further: WGS84 -> RGF93/Lambert-93
    (EPSG:2154, Lambert conformal conic 2SP, functions/geom.py) over
    synthesized coords spanning the projection's service extent
    (lon [-4.5,9.5) x lat [41.5,51)).  The forward LCC map is closed-form,
    so the oracle re-derives it in portable SQL with the identical
    full-precision projection constants; integer-metre output absorbs
    cross-engine libm noise (~1e-6 m), as in ORACLE_UTM."""
    from carto_etl_spark.functions.geom import transform_geom

    c = load(spark, sf_dir, "customer")
    src = c.select(
        "c_custkey",
        (F.lit(-4.5) + (F.col("c_custkey") * 13 % 1400) / F.lit(100.0)).alias("lon"),
        (F.lit(41.5) + (F.col("c_custkey") * 7 % 950) / F.lit(100.0)).alias("lat"),
    )
    out = transform_geom(
        src.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326)),
        "g", 4326, 2154, out_col="l93",
    )
    return out.select(
        "c_custkey",
        F.round(F.col("l93.x")).cast("long").alias("easting_m"),
        F.round(F.col("l93.y")).cast("long").alias("northing_m"),
    )


# Same Snyder eq. 15-1..15-10 LCC(2SP) math as functions/geom.py with the
# EPSG:2154 constants precomputed at full double precision:
#   n = 0.72560776505326952, a*F = 11754255.426096004,
#   rho0 = 6055612.0498759849, e = 0.081819191042815792 (GRS80)
ORACLE_LCC = """
WITH src AS (
  SELECT c_custkey,
         -4.5 + (c_custkey * 13 % 1400) / 100.0 AS lon,
         41.5 + (c_custkey * 7  % 950)  / 100.0 AS lat
  FROM customer
), t AS (
  SELECT c_custkey, lon,
         tan(pi() / 4.0 - radians(lat) / 2.0)
         / pow((1.0 - 0.081819191042815792 * sin(radians(lat)))
               / (1.0 + 0.081819191042815792 * sin(radians(lat))),
               0.081819191042815792 / 2.0) AS tval
  FROM src
), polar AS (
  SELECT c_custkey,
         11754255.426096004 * pow(tval, 0.72560776505326952) AS rho,
         0.72560776505326952 * radians(lon - 3.0) AS theta
  FROM t
)
SELECT c_custkey,
       cast(round(700000.0 + rho * sin(theta)) AS bigint) AS easting_m,
       cast(round(6600000.0 + 6055612.0498759849 - rho * cos(theta)) AS bigint) AS northing_m
FROM polar
"""


def q_stateplane_transform(spark, sf_dir):
    """Reference F5, NAD83 state-plane family: WGS84 -> NAD83 / Texas South
    Central (EPSG:32140, LCC 2SP on GRS80; NAD83<->WGS84 treated as identity
    like ETRS89) over synthesized coords spanning the zone
    (lon [-100.2,-93.8) x lat [28,30.7)).  Same oracle strategy as
    ORACLE_LCC: closed-form forward re-derived in portable SQL with the
    identical full-precision constants; integer-metre output absorbs libm
    noise."""
    from carto_etl_spark.functions.geom import transform_geom

    c = load(spark, sf_dir, "customer")
    src = c.select(
        "c_custkey",
        (F.lit(-100.2) + (F.col("c_custkey") * 13 % 640) / F.lit(100.0)).alias("lon"),
        (F.lit(28.0) + (F.col("c_custkey") * 7 % 270) / F.lit(100.0)).alias("lat"),
    )
    out = transform_geom(
        src.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326)),
        "g", 4326, 32140, out_col="sp",
    )
    return out.select(
        "c_custkey",
        F.round(F.col("sp.x")).cast("long").alias("easting_m"),
        F.round(F.col("sp.y")).cast("long").alias("northing_m"),
    )


def _build_oracle_stateplane() -> str:
    from carto_etl_spark.functions.geom import _lcc_constants

    lon0, fe, fn, n, big_f, rho0, a, e = _lcc_constants(32140)
    return f"""
WITH src AS (
  SELECT c_custkey,
         -100.2 + (c_custkey * 13 % 640) / 100.0 AS lon,
         28.0 + (c_custkey * 7 % 270) / 100.0 AS lat
  FROM customer
), t AS (
  SELECT c_custkey, lon,
         tan(pi() / 4.0 - radians(lat) / 2.0)
         / pow((1.0 - {e!r} * sin(radians(lat)))
               / (1.0 + {e!r} * sin(radians(lat))), {e!r} / 2.0) AS tval
  FROM src
), polar AS (
  SELECT c_custkey,
         {a * big_f!r} * pow(tval, {n!r}) AS rho,
         {n!r} * radians(lon - {lon0!r}) AS theta
  FROM t
)
SELECT c_custkey,
       cast(round({fe!r} + rho * sin(theta)) AS bigint) AS easting_m,
       cast(round({fn!r} + {rho0!r} - rho * cos(theta)) AS bigint) AS northing_m
FROM polar
"""


ORACLE_STATEPLANE = _build_oracle_stateplane()


def q_albers_transform(spark, sf_dir):
    """Reference F5 via the projection REGISTRY (functions/geom.py
    _PROJECTED_FAMILIES): WGS84 -> NAD83 / Conus Albers (EPSG:5070, Albers
    equal-area conic 2SP on GRS80 — the standard CONUS analytics
    projection) over synthesized coords spanning the lower 48
    (lon [-124,-67) x lat [24,49)).  The forward map (Snyder ch. 14) is
    closed-form, so the oracle re-derives it in portable SQL with the
    identical full-precision constants; integer-metre output absorbs
    cross-engine libm noise, as in ORACLE_LCC/ORACLE_STATEPLANE."""
    from carto_etl_spark.functions.geom import transform_geom

    c = load(spark, sf_dir, "customer")
    src = c.select(
        "c_custkey",
        (F.lit(-124.0) + (F.col("c_custkey") * 13 % 5700) / F.lit(100.0)).alias("lon"),
        (F.lit(24.0) + (F.col("c_custkey") * 7 % 2500) / F.lit(100.0)).alias("lat"),
    )
    out = transform_geom(
        src.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326)),
        "g", 4326, 5070, out_col="aea",
    )
    return out.select(
        "c_custkey",
        F.round(F.col("aea.x")).cast("long").alias("easting_m"),
        F.round(F.col("aea.y")).cast("long").alias("northing_m"),
    )


def _build_oracle_albers() -> str:
    from carto_etl_spark.functions.geom import _aea_constants

    lon0, fe, fn, n, big_c, rho0, a, e, e2 = _aea_constants(5070)
    return f"""
WITH src AS (
  SELECT c_custkey,
         -124.0 + (c_custkey * 13 % 5700) / 100.0 AS lon,
         24.0 + (c_custkey * 7 % 2500) / 100.0 AS lat
  FROM customer
), s AS (
  SELECT c_custkey, lon, sin(radians(lat)) AS sphi FROM src
), q AS (
  SELECT c_custkey, lon,
         (1.0 - {e2!r}) * (sphi / (1.0 - {e2!r} * sphi * sphi)
             - (1.0 / (2.0 * {e!r}))
               * ln((1.0 - {e!r} * sphi) / (1.0 + {e!r} * sphi))) AS qv
  FROM s
), polar AS (
  SELECT c_custkey,
         {a!r} * sqrt({big_c!r} - {n!r} * qv) / {n!r} AS rho,
         {n!r} * radians(lon - ({lon0!r})) AS theta
  FROM q
)
SELECT c_custkey,
       cast(round({fe!r} + rho * sin(theta)) AS bigint) AS easting_m,
       cast(round({fn!r} + {rho0!r} - rho * cos(theta)) AS bigint)
         AS northing_m
FROM polar
"""


ORACLE_ALBERS = _build_oracle_albers()


def q_datum_shift(spark, sf_dir):
    """Reference F5, non-identity datums: WGS84 -> ED50 (EPSG:4230) via the
    7-parameter Helmert hook (EPSG tfm 1133 parameters, inverse direction)
    over synthesized European coords.  The whole chain — geodetic->ECEF,
    small-angle rotation+scale+translation, Bowring inverse on International
    1924 — is closed-form, so the oracle re-derives it in portable SQL;
    integer micro-degree output (~0.1 m grid) absorbs libm noise."""
    from carto_etl_spark.functions.geom import transform_geom

    c = load(spark, sf_dir, "customer")
    src = c.select(
        "c_custkey",
        (F.lit(-5.0) + (F.col("c_custkey") * 13 % 2500) / F.lit(100.0)).alias("lon"),
        (F.lit(36.0) + (F.col("c_custkey") * 7 % 1900) / F.lit(100.0)).alias("lat"),
    )
    out = transform_geom(
        src.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326)),
        "g", 4326, 4230, out_col="ed50",
    )
    return out.select(
        "c_custkey",
        F.round(F.col("ed50.x") * 1e6).cast("long").alias("ed50_lon_udeg"),
        F.round(F.col("ed50.y") * 1e6).cast("long").alias("ed50_lat_udeg"),
    )


def _build_oracle_datum_shift() -> str:
    from carto_etl_spark.functions.geom import _ELLIPSOIDS, _GEOGRAPHIC_DATUMS
    import math as _m

    ell, params = _GEOGRAPHIC_DATUMS[4230]
    # inverse direction (WGS84 -> ED50): negate, swap ellipsoids
    dx, dy, dz = (-v for v in params[:3])
    a_from, e2_from = _ELLIPSOIDS["WGS84"]
    a_to, e2_to = _ELLIPSOIDS[ell]
    b_to = a_to * _m.sqrt(1.0 - e2_to)
    ep2_to = e2_to / (1.0 - e2_to)
    return f"""
WITH src AS (
  SELECT c_custkey,
         radians(-5.0 + (c_custkey * 13 % 2500) / 100.0) AS lam,
         radians(36.0 + (c_custkey * 7 % 1900) / 100.0) AS phi
  FROM customer
), ecef AS (
  SELECT c_custkey,
         {dx!r} + ({a_from!r} / sqrt(1.0 - {e2_from!r} * sin(phi) * sin(phi)))
           * cos(phi) * cos(lam) AS x,
         {dy!r} + ({a_from!r} / sqrt(1.0 - {e2_from!r} * sin(phi) * sin(phi)))
           * cos(phi) * sin(lam) AS y,
         {dz!r} + ({a_from!r} / sqrt(1.0 - {e2_from!r} * sin(phi) * sin(phi)))
           * (1.0 - {e2_from!r}) * sin(phi) AS z
  FROM src
), bowring AS (
  SELECT c_custkey, x, y, z,
         atan2(z * {a_to!r}, sqrt(x*x + y*y) * {b_to!r}) AS theta,
         sqrt(x*x + y*y) AS p
  FROM ecef
)
SELECT c_custkey,
       cast(round(degrees(atan2(y, x)) * 1e6) AS bigint) AS ed50_lon_udeg,
       cast(round(degrees(atan2(
              z + {ep2_to * b_to!r} * sin(theta) * sin(theta) * sin(theta),
              p - {e2_to * a_to!r} * cos(theta) * cos(theta) * cos(theta)
            )) * 1e6) AS bigint) AS ed50_lat_udeg
FROM bowring
"""


ORACLE_DATUM_SHIFT = _build_oracle_datum_shift()


def q_bng_transform(spark, sf_dir):
    """Reference F5, projected CRS on a NON-WGS84 datum (the PostGIS
    capability tier, /root/reference/etl/etl.py:190-192): WGS84 -> OSGB36 /
    British National Grid (EPSG:27700) via the generalized tmerc registry
    family — 7-parameter Helmert (EPSG tfm 1314, inverse) into OSGB36, then
    Transverse Mercator on Airy 1830 (Karney series with
    ellipsoid-parameterized coefficients, k0=0.9996012717, origin 49N 2W).
    Synthesized coords span GB (lon [-6,1.8) x lat [50,58.5)).  Every stage
    is closed-form, so the oracle re-derives the ENTIRE chain in portable
    SQL (geodetic->ECEF, rotation+scale+translation, Bowring on Airy, the
    TM series with sinh/cosh/atanh expanded to exp/ln); integer-metre
    output absorbs cross-engine libm noise.  Forward validated against the
    OS worked example to 0.4 mm (test_lambert)."""
    from carto_etl_spark.functions.geom import transform_geom

    c = load(spark, sf_dir, "customer")
    src = c.select(
        "c_custkey",
        (F.lit(-6.0) + (F.col("c_custkey") * 13 % 780) / F.lit(100.0)).alias("lon"),
        (F.lit(50.0) + (F.col("c_custkey") * 7 % 850) / F.lit(100.0)).alias("lat"),
    )
    out = transform_geom(
        src.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326)),
        "g", 4326, 27700, out_col="bng",
    )
    return out.select(
        "c_custkey",
        F.round(F.col("bng.x")).cast("long").alias("easting_m"),
        F.round(F.col("bng.y")).cast("long").alias("northing_m"),
    )


def _build_oracle_bng() -> str:
    from carto_etl_spark.functions.geom import (
        _ELLIPSOIDS,
        _GEOGRAPHIC_DATUMS,
        _tmerc_constants,
    )
    import math as _m

    lon0, k0, fe, fn, big_a, e, alpha, _, _, m0, datum, ell = (
        _tmerc_constants(27700)
    )
    # Helmert WGS84 -> OSGB36: negate the stored TO-WGS84 params (the
    # inverse=True convention of helmert_shift_expr)
    d_ell, params = _GEOGRAPHIC_DATUMS[datum]
    dx, dy, dz, rx, ry, rz, ppm = (-v for v in params)
    arc = _m.pi / (180.0 * 3600.0)
    rxr, ryr, rzr = rx * arc, ry * arc, rz * arc
    scale = 1.0 + ppm * 1e-6
    a_w, e2_w = _ELLIPSOIDS["WGS84"]
    a_t, e2_t = _ELLIPSOIDS[d_ell]
    b_t = a_t * _m.sqrt(1.0 - e2_t)
    ep2_t = e2_t / (1.0 - e2_t)
    lam0 = _m.radians(lon0)
    a1, a2, a3 = alpha

    def _cosh(x):
        return f"(exp({x}) + exp(-({x}))) / 2.0"

    def _sinh(x):
        return f"(exp({x}) - exp(-({x}))) / 2.0"

    def _atanh(x):
        return f"0.5 * ln((1.0 + {x}) / (1.0 - {x}))"

    return f"""
WITH src AS (
  SELECT c_custkey,
         radians(-6.0 + (c_custkey * 13 % 780) / 100.0) AS lam,
         radians(50.0 + (c_custkey * 7 % 850) / 100.0) AS phi
  FROM customer
), ecef AS (
  SELECT c_custkey,
         ({a_w!r} / sqrt(1.0 - {e2_w!r} * sin(phi) * sin(phi)))
           * cos(phi) * cos(lam) AS x,
         ({a_w!r} / sqrt(1.0 - {e2_w!r} * sin(phi) * sin(phi)))
           * cos(phi) * sin(lam) AS y,
         ({a_w!r} / sqrt(1.0 - {e2_w!r} * sin(phi) * sin(phi)))
           * (1.0 - {e2_w!r}) * sin(phi) AS z
  FROM src
), shifted AS (
  SELECT c_custkey,
         {dx!r} + {scale!r} * (x - {rzr!r} * y + {ryr!r} * z) AS x,
         {dy!r} + {scale!r} * ({rzr!r} * x + y - {rxr!r} * z) AS y,
         {dz!r} + {scale!r} * (-({ryr!r}) * x + {rxr!r} * y + z) AS z
  FROM ecef
), bowring AS (
  SELECT c_custkey, x, y, z, sqrt(x*x + y*y) AS p,
         atan2(z * {a_t!r}, sqrt(x*x + y*y) * {b_t!r}) AS theta
  FROM shifted
), geo AS (
  SELECT c_custkey,
         atan2(y, x) - {lam0!r} AS ld,
         sin(atan2(
           z + {ep2_t * b_t!r} * sin(theta) * sin(theta) * sin(theta),
           p - {e2_t * a_t!r} * cos(theta) * cos(theta) * cos(theta)
         )) AS s
  FROM bowring
), tm0 AS (
  SELECT c_custkey, ld,
         {_atanh("s")} - {e!r} * ({_atanh(f"{e!r} * s")}) AS w
  FROM geo
), tm1 AS (
  SELECT c_custkey, ld, {_sinh("w")} AS t FROM tm0
), tm2 AS (
  SELECT c_custkey,
         atan2(t, cos(ld)) AS xi_p,
         {_atanh("sin(ld) / sqrt(t * t + 1.0)")} AS eta_p
  FROM tm1
), tm3 AS (
  SELECT c_custkey,
         xi_p + {a1!r} * sin(2.0 * xi_p) * ({_cosh("2.0 * eta_p")})
              + {a2!r} * sin(4.0 * xi_p) * ({_cosh("4.0 * eta_p")})
              + {a3!r} * sin(6.0 * xi_p) * ({_cosh("6.0 * eta_p")}) AS xi,
         eta_p + {a1!r} * cos(2.0 * xi_p) * ({_sinh("2.0 * eta_p")})
               + {a2!r} * cos(4.0 * xi_p) * ({_sinh("4.0 * eta_p")})
               + {a3!r} * cos(6.0 * xi_p) * ({_sinh("6.0 * eta_p")}) AS eta
  FROM tm2
)
SELECT c_custkey,
       cast(round({fe!r} + {k0 * big_a!r} * eta) AS bigint) AS easting_m,
       cast(round({fn!r} + {k0!r} * ({big_a!r} * xi - {m0!r})) AS bigint)
         AS northing_m
FROM tm3
"""


ORACLE_BNG = _build_oracle_bng()


def q_swiss_transform(spark, sf_dir):
    """Reference F5, the oblique-Mercator family (the last common
    PostGIS-parity projection gap, /root/reference/etl/etl.py:190-192):
    WGS84 -> CH1903 / LV03 (EPSG:21781) — 3-parameter Helmert (EPSG tfm
    1676, inverse) into CH1903, then Hotine Oblique Mercator variant B
    (azimuth 90, Bessel 1841; EPSG GN7-2 §3.2.6) — the Swiss national grid.
    Synthesized coords span Switzerland (lon [6.0,10.4) x lat
    [45.95,47.75)).  Every stage is closed-form, so the oracle re-derives
    the ENTIRE chain in portable SQL (geodetic->ECEF, translation, Bowring
    on Bessel, the HOM aposphere math with driver-side constants);
    integer-metre output absorbs cross-engine libm noise.  Core validated
    against the EPSG GN7-2 worked example (Timbalai, 2 mm) and swisstopo's
    Rigi example (sub-mm) in test_lambert."""
    from carto_etl_spark.functions.geom import transform_geom

    c = load(spark, sf_dir, "customer")
    src = c.select(
        "c_custkey",
        (F.lit(6.0) + (F.col("c_custkey") * 13 % 440) / F.lit(100.0)).alias("lon"),
        (F.lit(45.95) + (F.col("c_custkey") * 7 % 180) / F.lit(100.0)).alias("lat"),
    )
    out = transform_geom(
        src.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326)),
        "g", 4326, 21781, out_col="sw",
    )
    return out.select(
        "c_custkey",
        F.round(F.col("sw.x")).cast("long").alias("easting_m"),
        F.round(F.col("sw.y")).cast("long").alias("northing_m"),
    )


def _build_oracle_swiss() -> str:
    import math as _m

    from carto_etl_spark.functions.geom import (
        _ELLIPSOIDS,
        _GEOGRAPHIC_DATUMS,
        _omerc_constants,
    )

    (big_a, big_b, e, big_h, gamma0, lam0, gac, fe, fn,
     uc, _variant, sign, ell, datum) = _omerc_constants(21781)
    d_ell, params = _GEOGRAPHIC_DATUMS[datum]
    dx, dy, dz = (-v for v in params[:3])  # WGS84 -> CH1903 (inverse)
    a_w, e2_w = _ELLIPSOIDS["WGS84"]
    a_t, e2_t = _ELLIPSOIDS[d_ell]
    b_t = a_t * _m.sqrt(1.0 - e2_t)
    ep2_t = e2_t / (1.0 - e2_t)
    sg0, cg0 = _m.sin(gamma0), _m.cos(gamma0)
    sgc, cgc = _m.sin(gac), _m.cos(gac)
    uoff = abs(uc) * sign

    return f"""
WITH src AS (
  SELECT c_custkey,
         radians(6.0 + (c_custkey * 13 % 440) / 100.0) AS lam,
         radians(45.95 + (c_custkey * 7 % 180) / 100.0) AS phi
  FROM customer
), ecef AS (
  SELECT c_custkey,
         ({a_w!r} / sqrt(1.0 - {e2_w!r} * sin(phi) * sin(phi)))
           * cos(phi) * cos(lam) AS x,
         ({a_w!r} / sqrt(1.0 - {e2_w!r} * sin(phi) * sin(phi)))
           * cos(phi) * sin(lam) AS y,
         ({a_w!r} / sqrt(1.0 - {e2_w!r} * sin(phi) * sin(phi)))
           * (1.0 - {e2_w!r}) * sin(phi) AS z
  FROM src
), shifted AS (
  SELECT c_custkey, {dx!r} + x AS x, {dy!r} + y AS y, {dz!r} + z AS z
  FROM ecef
), bowring AS (
  SELECT c_custkey, x, y, z, sqrt(x*x + y*y) AS p,
         atan2(z * {a_t!r}, sqrt(x*x + y*y) * {b_t!r}) AS theta
  FROM shifted
), geo AS (
  SELECT c_custkey,
         atan2(y, x) AS lam,
         atan2(
           z + {ep2_t * b_t!r} * sin(theta) * sin(theta) * sin(theta),
           p - {e2_t * a_t!r} * cos(theta) * cos(theta) * cos(theta)
         ) AS phi
  FROM bowring
), hom0 AS (
  SELECT c_custkey, {big_b!r} * (lam - {lam0!r}) AS dlam,
         tan(pi() / 4.0 - phi / 2.0)
           / pow((1.0 - {e!r} * sin(phi)) / (1.0 + {e!r} * sin(phi)),
                 {e / 2.0!r}) AS t
  FROM geo
), hom1 AS (
  SELECT c_custkey, dlam, {big_h!r} / pow(t, {big_b!r}) AS q FROM hom0
), hom2 AS (
  SELECT c_custkey, dlam,
         (q - 1.0 / q) / 2.0 AS s, (q + 1.0 / q) / 2.0 AS tq,
         sin(dlam) AS v
  FROM hom1
), hom3 AS (
  SELECT c_custkey,
         {big_a!r} / (2.0 * {big_b!r})
           * ln((1.0 - (-v * {cg0!r} + s * {sg0!r}) / tq)
                / (1.0 + (-v * {cg0!r} + s * {sg0!r}) / tq)) AS vc,
         {big_a / big_b!r}
           * atan2(s * {cg0!r} + v * {sg0!r}, cos(dlam)) - {uoff!r} AS u
  FROM hom2
)
SELECT c_custkey,
       cast(round(vc * {cgc!r} + u * {sgc!r} + {fe!r}) AS bigint)
         AS easting_m,
       cast(round(u * {cgc!r} - vc * {sgc!r} + {fn!r}) AS bigint)
         AS northing_m
FROM hom3
"""


ORACLE_SWISS = _build_oracle_swiss()


def q_polar_transform(spark, sf_dir):
    """Reference F5, the polar-stereographic family (the UPS/polar tail):
    WGS84 -> NSIDC Sea Ice Polar Stereographic North (EPSG:3413, variant B:
    k0 derived from the 70N standard parallel driver-side; EPSG GN7-2
    §3.2.4).  Synthesized coords span the Arctic (lon [-180,180) x lat
    [55,89.5)).  Closed form throughout — the oracle replays t, rho and the
    grid equations with the same driver-side constants; integer-metre
    output absorbs libm noise.  Core validated against both GN7-2 worked
    examples (UPS North variant A, Australian Antarctic variant B) in
    test_lambert."""
    from carto_etl_spark.functions.geom import transform_geom

    c = load(spark, sf_dir, "customer")
    src = c.select(
        "c_custkey",
        (F.col("c_custkey") * 37 % 360 - 180 + F.lit(0.25)).cast("double").alias("lon"),
        (F.lit(55.0) + (F.col("c_custkey") * 11 % 3450) / F.lit(100.0)).alias("lat"),
    )
    out = transform_geom(
        src.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326)),
        "g", 4326, 3413, out_col="ps",
    )
    return out.select(
        "c_custkey",
        F.round(F.col("ps.x")).cast("long").alias("easting_m"),
        F.round(F.col("ps.y")).cast("long").alias("northing_m"),
    )


def _build_oracle_polar() -> str:
    from carto_etl_spark.functions.geom import _stere_constants

    a, e, cf, k0, lam0, fe, fn, south, _, _ = _stere_constants(3413)
    assert not south
    return f"""
WITH src AS (
  SELECT c_custkey,
         radians(cast(c_custkey * 37 % 360 - 180 + 0.25 AS double)) AS lam,
         radians(55.0 + (c_custkey * 11 % 3450) / 100.0) AS phi
  FROM customer
), t AS (
  SELECT c_custkey, lam,
         tan(pi() / 4.0 - phi / 2.0)
           / pow((1.0 - {e!r} * sin(phi)) / (1.0 + {e!r} * sin(phi)),
                 {e / 2.0!r}) AS t
  FROM src
), rho AS (
  SELECT c_custkey, lam, {2.0 * a * k0 / cf!r} * t AS rho FROM t
)
SELECT c_custkey,
       cast(round({fe!r} + rho * sin(lam - {lam0!r})) AS bigint) AS easting_m,
       cast(round({fn!r} - rho * cos(lam - {lam0!r})) AS bigint) AS northing_m
FROM rho
"""


ORACLE_POLAR = _build_oracle_polar()


def q_overview_grid(spark, sf_dir):
    """Reference D5 (CDB_CreateOverviews): finest-zoom grid aggregate over
    web-mercator tiles (zoom 4)."""
    c = load(spark, sf_dir, "customer")
    lon = (F.col("c_custkey") % 360 - 180 + F.lit(0.5)).cast("double")
    lat = (F.col("c_custkey") % 160 - 80 + F.lit(0.5)).cast("double")
    return (
        c.groupBy(
            tile_x(lon, 4).alias("tile_x"), tile_y(lat, 4).alias("tile_y")
        )
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.round(F.sum(lon), 1).alias("sum_x"),
            F.round(F.sum(lat), 1).alias("sum_y"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


ORACLE_OVERVIEW_GRID = """
WITH pts AS (
  SELECT cast(c_custkey % 360 - 180 + 0.5 AS double) AS lon,
         cast(c_custkey % 160 - 80 + 0.5 AS double) AS lat,
         c_acctbal
  FROM customer
)
SELECT cast(least(greatest(floor((lon + 180) / 360 * 16), 0), 15) AS bigint) AS tile_x,
       cast(least(greatest(floor((1 - ln(tan(radians(lat)) + 1 / cos(radians(lat))) / pi()) / 2 * 16), 0), 15) AS bigint) AS tile_y,
       count(*) AS n_features,
       round(sum(lon), 1) AS sum_x,
       round(sum(lat), 1) AS sum_y,
       round(sum(c_acctbal), 2) AS sum_acctbal
FROM pts GROUP BY 1, 2
"""


def q_salted_join(spark, sf_dir):
    """Skew machinery under the oracle gate (operators/skew.py): lineitem
    joined to nation-sized dim via the salted path + a two-stage exact
    distinct count, vs the oracle's plain join/COUNT(DISTINCT).  Equivalence
    of the salted plan to the declarative SQL IS the correctness claim."""
    from carto_etl_spark.operators.skew import (
        salted_join,
        two_stage_count_distinct,
    )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_join(
        li, s.withColumnRenamed("s_suppkey", "l_suppkey"), on="l_suppkey"
    )
    per_nation = two_stage_count_distinct(joined, "s_nationkey", "l_orderkey")
    qty = joined.groupBy("s_nationkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty")
    )
    return per_nation.join(qty, "s_nationkey").select(
        "s_nationkey",
        F.col("n_distinct_l_orderkey").alias("n_orders"),
        "sum_qty",
    )


ORACLE_SALTED = """
SELECT s_nationkey,
       count(DISTINCT l_orderkey) AS n_orders,
       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


def q_morton_tiles(spark, sf_dir):
    """Write-layout clustering key (operators/layout.py): Morton code over
    zoom-6 mercator tiles, aggregated per code.  Oracle re-derives the bit
    interleave with integer arithmetic — everything is exact ints after the
    tile floor, so the hash check is FP-free."""
    from carto_etl_spark.functions.geom import morton_expr

    c = load(spark, sf_dir, "customer")
    lon = (F.col("c_custkey") % 360 - 180 + F.lit(0.5)).cast("double")
    lat = (F.col("c_custkey") % 160 - 80 + F.lit(0.5)).cast("double")
    code = morton_expr(tile_x(lon, 6), tile_y(lat, 6), 6)
    return (
        c.select(code.alias("morton"), "c_custkey")
        .groupBy("morton")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("c_custkey").alias("min_key"),
        )
    )


ORACLE_MORTON = """
WITH pts AS (
  SELECT c_custkey,
         cast(c_custkey % 360 - 180 + 0.5 AS double) AS lon,
         cast(c_custkey % 160 - 80 + 0.5 AS double) AS lat
  FROM customer
), tiles AS (
  SELECT c_custkey,
         cast(least(greatest(floor((lon + 180) / 360 * 64), 0), 63) AS bigint) AS tx,
         cast(least(greatest(floor((1 - ln(tan(radians(lat)) + 1 / cos(radians(lat))) / pi()) / 2 * 64), 0), 63) AS bigint) AS ty
  FROM pts
), codes AS (
  SELECT c_custkey,
         ((tx >> 0) & 1) * 1     + ((ty >> 0) & 1) * 2
       + ((tx >> 1) & 1) * 4     + ((ty >> 1) & 1) * 8
       + ((tx >> 2) & 1) * 16    + ((ty >> 2) & 1) * 32
       + ((tx >> 3) & 1) * 64    + ((ty >> 3) & 1) * 128
       + ((tx >> 4) & 1) * 256   + ((ty >> 4) & 1) * 512
       + ((tx >> 5) & 1) * 1024  + ((ty >> 5) & 1) * 2048 AS morton
  FROM tiles
)
SELECT morton, count(*) AS n_points, min(c_custkey) AS min_key
FROM codes GROUP BY morton
"""


def q_overview_rollup(spark, sf_dir):
    """Hierarchical rollup: zoom-3 overview derived from the zoom-4 aggregate
    (parent tile = floor(child/2)) — the scale path that avoids re-scanning
    the base table per zoom."""
    c = load(spark, sf_dir, "customer")
    lon = (F.col("c_custkey") % 360 - 180 + F.lit(0.5)).cast("double")
    lat = (F.col("c_custkey") % 160 - 80 + F.lit(0.5)).cast("double")
    # Sum the money column as decimal(18,2): the two-level (z4 -> z3) double
    # sum accumulates in a different order than the oracle and can flip a digit
    # past the rounding cut. Decimal arithmetic is exact, so the rollup is
    # order-independent; the final cast back to double is exact too (the sums
    # carry only 2 fractional digits).
    pts = c.select(
        point_struct(lon, lat).alias("the_geom"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("c_acctbal"),
    )
    z4 = ov.base_overview(pts, 4, value_columns=["c_acctbal"])
    z3 = ov.rollup_overview(z4, value_columns=["c_acctbal"])
    return z3.select(
        "tile_x",
        "tile_y",
        "n_features",
        F.col("sum_c_acctbal").cast("double").alias("sum_acctbal"),
    )


ORACLE_OVERVIEW_ROLLUP = """
WITH pts AS (
  SELECT cast(c_custkey % 360 - 180 + 0.5 AS double) AS lon,
         cast(c_custkey % 160 - 80 + 0.5 AS double) AS lat,
         c_acctbal
  FROM customer
), z4 AS (
  SELECT cast(least(greatest(floor((lon + 180) / 360 * 16), 0), 15) AS bigint) AS tile_x,
         cast(least(greatest(floor((1 - ln(tan(radians(lat)) + 1 / cos(radians(lat))) / pi()) / 2 * 16), 0), 15) AS bigint) AS tile_y,
         count(*) AS n_features,
         sum(cast(c_acctbal AS DECIMAL(18,2))) AS sum_acctbal
  FROM pts GROUP BY 1, 2
)
SELECT cast(floor(tile_x / 2) AS bigint) AS tile_x,
       cast(floor(tile_y / 2) AS bigint) AS tile_y,
       cast(sum(n_features) AS bigint) AS n_features,
       cast(sum(sum_acctbal) AS double) AS sum_acctbal
FROM z4 GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def q_token_counts(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.token_count_expr("text").alias("n_ws_tokens"),
        tx.bpe_token_count_expr("text").alias("n_bpe_tokens"),
    )


ORACLE_TOKEN_COUNTS = r"""
SELECT doc_id,
       len(list_filter(string_split_regex(trim(text), '\s+'), x -> x != '')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_bpe_tokens
FROM documents
"""


_STOPLIST_SQL = "[" + ", ".join(f"'{w}'" for w in tx.STOPWORDS) + "]"


def q_text_quality(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(tx.stopword_ratio_expr("text"), 6).alias("stopword_ratio"),
        F.round(tx.punct_ratio_expr("text"), 6).alias("punct_ratio"),
        F.round(tx.mean_word_length_expr("text"), 6).alias("mean_word_len"),
    )


ORACLE_TEXT_QUALITY = r"""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS t
  FROM documents
)
SELECT doc_id,
       round(len(list_filter(t, x -> list_contains(STOPLIST, lower(x))))
             / cast(nullif(len(t), 0) AS double), 6) AS stopword_ratio,
       round(len(regexp_extract_all(text, '[.,;:!?]'))
             / cast(nullif(len(text), 0) AS double), 6) AS punct_ratio,
       round(list_sum(list_transform(t, x -> len(x)))
             / cast(nullif(len(t), 0) AS double), 6) AS mean_word_len
FROM toks
""".replace("STOPLIST", _STOPLIST_SQL)


def q_lang_id(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", tx.lang_id_expr("text").alias("lang_guess"))


def _lang_counts_sql() -> str:
    parts = []
    for lang, words in tx.LANG_MARKERS.items():
        lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        parts.append(
            f"len(list_filter(t, x -> list_contains({lst}, lower(x)))) AS s_{lang}"
        )
    return ", ".join(parts)


ORACLE_LANG_ID = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS t
  FROM documents
), scores AS (
  SELECT doc_id, {_lang_counts_sql()} FROM toks
)
SELECT doc_id,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 1 THEN 'und'
            WHEN s_de >= greatest(s_en, s_es, s_fr) THEN 'de'
            WHEN s_en >= greatest(s_es, s_fr) THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS lang_guess
FROM scores
"""


_QC_DIM, _QC_ITERS, _QC_SCALE = 64, 12, 10**6
_QC_LR_NUM, _QC_LR_DEN = 1, 16
#: the planted "low-quality" markers: a threshold on their token RATIO is
#: exactly a linear function of raw token counts (sum c_j * (24*junk_j - 1)
#: <= 0), so a linear model on hashed counts can genuinely learn it —
#: unlike the lang column, whose five languages share one 31-word
#: vocabulary in the synthetic corpus (AUC pinned ~0.5 by construction)
_QC_JUNK = ("slow", "dup", "a")


def _qc_label_col():
    toks = tx.tokens_expr(F.col("text"))
    junk = F.size(F.filter(toks, lambda x: x.isin(*_QC_JUNK)))
    return (junk * 24 <= F.size(toks)).cast("int").alias("label")


def q_quality_classifier(spark, sf_dir):
    """Trainable quality gate (operators/classifier.py) — the CCNet/GPT-3
    classifier leg of the pipeline suite: train a linear classifier by
    12 rounds of full-batch GD over 64-dim hashed bag-of-words (exact
    fixed-point integers, hard-sigmoid — the pagerank recipe, so the
    DuckDB oracle UNROLLS the whole training loop and replays every weight
    bit-for-bit), then score every document at scan stage.  Labels are a
    planted junk-token-ratio rule (see _QC_JUNK) the hashed features
    genuinely carry; tests assert the trained AUC.  The reference has no
    ML surface; this is extension scope."""
    from carto_etl_spark.operators import classifier as clf

    d = load(spark, sf_dir, "documents")
    feats = tx.hashed_features(d, "text", ["doc_id"], dim=_QC_DIM)
    labels = d.select("doc_id", _qc_label_col())
    w, b = clf.train_quality_classifier(
        feats, labels, dim=_QC_DIM, iterations=_QC_ITERS,
        lr_num=_QC_LR_NUM, lr_den=_QC_LR_DEN, scale=_QC_SCALE,
    )
    return d.select(
        "doc_id",
        _qc_label_col(),
        clf.quality_score_expr("text", w, b, scale=_QC_SCALE).alias(
            "score_scaled"
        ),
    )


def _qc_label_sql(doc_src: str = "SELECT doc_id, text FROM documents") -> str:
    junk = ", ".join(f"'{w}'" for w in _QC_JUNK)
    return rf"""
SELECT doc_id,
       CASE WHEN len(list_filter(t, x -> x IN ({junk}))) * 24 <= len(t)
            THEN 1 ELSE 0 END AS label
FROM (SELECT doc_id, list_filter(
        string_split_regex(trim(text), '\s+'), x -> x != '') AS t
      FROM ({doc_src}))"""


def _qc_train_sql(doc_src: str = "SELECT doc_id, text FROM documents") -> str:
    """The unrolled 12-iteration training WITH-chain over the labeled
    corpus — shared by the quality_classifier / quality_mixture /
    pipeline_ccnet oracles.  ``doc_src`` is the (doc_id, text) training
    source: the default is the full corpus; pipeline_ccnet passes the
    Lehmer hash-sample so BOTH features and labels come from the same
    bounded set, exactly like train_quality_gate on the Spark side."""
    from carto_etl_spark.operators.classifier import classifier_train_sql
    from carto_etl_spark.operators.text import hashed_features_oracle_sql

    feats = hashed_features_oracle_sql(doc_src, ["doc_id"], dim=_QC_DIM)
    return classifier_train_sql(
        feats,
        _qc_label_sql(doc_src),
        dim=_QC_DIM,
        iterations=_QC_ITERS,
        lr_num=_QC_LR_NUM,
        lr_den=_QC_LR_DEN,
        scale=_QC_SCALE,
    )


def _oracle_quality_classifier() -> str:
    train = _qc_train_sql()
    label_sql = _qc_label_sql()
    return rf"""
WITH wfin AS ({train}),
toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(trim(text), '\s+'), x -> x != '')) AS tok
  FROM documents
), tw AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {_QC_DIM}
              AS INT) AS feature
  FROM toks
), dsum AS (
  SELECT tw.doc_id, CAST(SUM(w.weight) AS BIGINT) AS m
  FROM tw JOIN wfin w USING (feature) GROUP BY tw.doc_id
)
, labs AS ({label_sql})
SELECT d.doc_id,
       CAST(l.label AS INT) AS label,
       CAST(greatest(0, least({_QC_SCALE},
            (COALESCE(s.m, 0) + b.weight) // 4 + {_QC_SCALE // 2}))
            AS BIGINT) AS score_scaled
FROM documents d
JOIN labs l ON d.doc_id = l.doc_id
LEFT JOIN dsum s ON d.doc_id = s.doc_id
CROSS JOIN (SELECT weight FROM wfin WHERE feature = {_QC_DIM}) b
"""


#: quality-mixture bucket thresholds (on the classifier's [0, scale]
#: score) and keep rates — the CCNet shape: keep everything the gate loves,
#: downsample the middle, keep a thin slice of the tail for diversity
_QM_HI, _QM_MID = 450_000, 250_000
_QM_RATES = {"high": 1.0, "mid": 0.5, "low": 0.125}
_QM_SALT = 13


def q_quality_mixture(spark, sf_dir):
    """Classifier-driven mixture sampling — what a CCNet-style pipeline
    DOES with the quality gate's scores: train the fixed-point classifier
    (operators/classifier.py, same config as quality_classifier), bucket
    every document by score (high/mid/low), and keep each bucket at its
    mixture rate via the engine-portable hash sample (operators/sampling.py
    — scan-stage, partition-invariant, reproducible).  Train + score +
    bucket + sample is ONE oracle-replayable chain: the DuckDB side unrolls
    the 12 GD iterations, rescores, and replays the Lehmer hash keep
    decisions bit-for-bit."""
    from carto_etl_spark.operators import classifier as clf
    from carto_etl_spark.operators.sampling import LEHMER_M, hash_expr

    d = load(spark, sf_dir, "documents")
    feats = tx.hashed_features(d, "text", ["doc_id"], dim=_QC_DIM)
    labels = d.select("doc_id", _qc_label_col())
    w, b = clf.train_quality_classifier(
        feats, labels, dim=_QC_DIM, iterations=_QC_ITERS,
        lr_num=_QC_LR_NUM, lr_den=_QC_LR_DEN, scale=_QC_SCALE,
    )
    s = clf.quality_score_expr("text", w, b, scale=_QC_SCALE)
    bucket = (
        F.when(s >= _QM_HI, "high")
        .when(s >= _QM_MID, "mid")
        .otherwise("low")
    )
    thresh = (
        F.when(s >= _QM_HI, int(_QM_RATES["high"] * LEHMER_M))
        .when(s >= _QM_MID, int(_QM_RATES["mid"] * LEHMER_M))
        .otherwise(int(_QM_RATES["low"] * LEHMER_M))
    )
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        (hash_expr(F.col("doc_id"), _QM_SALT) < thresh).alias("kept"),
    )


def _oracle_quality_mixture() -> str:
    from carto_etl_spark.operators.sampling import LEHMER_M, hash_sql

    h = hash_sql("doc_id", _QM_SALT)
    hi_t = int(_QM_RATES["high"] * LEHMER_M)
    mid_t = int(_QM_RATES["mid"] * LEHMER_M)
    lo_t = int(_QM_RATES["low"] * LEHMER_M)
    return f"""
WITH scored AS ({_oracle_quality_classifier()})
SELECT doc_id,
       CASE WHEN score_scaled >= {_QM_HI} THEN 'high'
            WHEN score_scaled >= {_QM_MID} THEN 'mid'
            ELSE 'low' END AS bucket,
       ({h}) < CASE WHEN score_scaled >= {_QM_HI} THEN {hi_t}
                    WHEN score_scaled >= {_QM_MID} THEN {mid_t}
                    ELSE {lo_t} END AS kept
FROM scored
"""


def q_paragraph_dedup(spark, sf_dir):
    """RefinedWeb-style cross-document PARAGRAPH dedup — drop_repeated_lines
    with sep="\\n\\n" (operators/dedup.py): every doc gets a corpus-wide
    boilerplate paragraph (dropped everywhere) and a per-source footer
    paragraph (dropped wherever the source has >= 2 docs), around its own
    unique body.  Same two-shuffle plan as line dedup — the unit boundary
    is the only difference."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    pages = d.select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.col("text"),
            F.lit("subscribe to our newsletter and join the community"),
            F.concat(F.lit("Footer for "), F.col("source")),
        ).alias("text"),
    )
    out = dd.drop_repeated_lines(
        pages, "text", "doc_id", max_occurrences=1, min_line_chars=15,
        sep="\n\n",
    )
    return out.select(
        "doc_id", F.md5("text").alias("text_md5"),
        "n_lines_kept", "n_lines_dropped",
    )


ORACLE_PARAGRAPH_DEDUP = r"""
WITH pages AS (
  SELECT doc_id,
         text || chr(10) || chr(10)
              || 'subscribe to our newsletter and join the community'
              || chr(10) || chr(10) || 'Footer for ' || source AS text
  FROM documents WHERE text IS NOT NULL
), paras AS (
  SELECT doc_id, CAST(u.l[2] AS BIGINT) AS pos, u.l[1] AS line
  FROM pages, unnest(list_zip(
         string_split(text, chr(10) || chr(10)),
         range(0, len(string_split(text, chr(10) || chr(10)))))) AS u(l)
), boiler AS (
  SELECT line FROM paras
  WHERE len(trim(line)) >= 15
  GROUP BY line HAVING count(*) > 1
), surv AS (
  SELECT doc_id, pos, line FROM paras
  WHERE len(trim(line)) < 15
     OR line NOT IN (SELECT line FROM boiler)
), rebuilt AS (
  SELECT doc_id,
         string_agg(line, chr(10) || chr(10) ORDER BY pos) AS clean,
         count(*) AS n_kept
  FROM surv GROUP BY doc_id
)
SELECT p.doc_id,
       md5(COALESCE(r.clean, '')) AS text_md5,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
       CAST(len(string_split(p.text, chr(10) || chr(10)))
            - COALESCE(r.n_kept, 0) AS BIGINT) AS n_lines_dropped
FROM pages p LEFT JOIN rebuilt r ON p.doc_id = r.doc_id
"""


#: source-reputation gate: mean classifier score the group must clear
#: (the quality_mixture "mid" boundary) and the minimum certifiable size.
_SR_MIN_DOCS = 3


def q_source_reputation(spark, sf_dir):
    """Domain-level reputation gating (operators/reputation.py — the
    FineWeb/RefinedWeb whole-domain filter): train the fixed-point quality
    classifier, score every document, roll scores up to exact per-SOURCE
    (n_docs, sum_score), and pass each source iff its MEAN score clears
    tau — compared without division (sum*den >= num*n, exact int64).
    Documents ride or die with their source; the verdict frame (one row
    per source) broadcasts back, so the gate is a scan-stage filter on
    the corpus side.  The oracle unrolls training AND replays the rollup."""
    from carto_etl_spark.operators import classifier as clf
    from carto_etl_spark.operators import reputation as rp

    d = load(spark, sf_dir, "documents")
    feats = tx.hashed_features(d, "text", ["doc_id"], dim=_QC_DIM)
    labels = d.select("doc_id", _qc_label_col())
    w, b = clf.train_quality_classifier(
        feats, labels, dim=_QC_DIM, iterations=_QC_ITERS,
        lr_num=_QC_LR_NUM, lr_den=_QC_LR_DEN, scale=_QC_SCALE,
    )
    scored = d.select(
        "doc_id", "source",
        clf.quality_score_expr("text", w, b, scale=_QC_SCALE).alias(
            "score_scaled"
        ),
    )
    out = rp.gate_by_reputation(
        scored, "source", "score_scaled",
        tau_num=_QM_MID, tau_den=1, min_docs=_SR_MIN_DOCS,
    )
    return out.select("doc_id", "source", "n_docs", "sum_score", "grp_ok")


def _oracle_source_reputation() -> str:
    return f"""
WITH scored AS ({_oracle_quality_classifier()}),
docs AS (
  SELECT d.doc_id, d.source, s.score_scaled
  FROM documents d JOIN scored s ON d.doc_id = s.doc_id
), rep AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(score_scaled) AS BIGINT) AS sum_score
  FROM docs GROUP BY source
)
SELECT d.doc_id, d.source, r.n_docs, r.sum_score,
       (r.n_docs >= {_SR_MIN_DOCS}
        AND r.sum_score * 1 >= {_QM_MID} * r.n_docs) AS grp_ok
FROM docs d LEFT JOIN rep r ON d.source = r.source
"""


NORM_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


def q_exact_dedup(spark, sf_dir):
    """Exact content dedup: the corpus unioned with a shifted-id copy of
    itself; min-id winner per normalized-text fingerprint."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    dup = d.withColumn("doc_id", F.col("doc_id") + 1000000)
    both = d.unionByName(dup)
    out = dd.exact_text_dedup(both, "doc_id", "text")
    return out.select("doc_id", "lang", "source")


ORACLE_EXACT_DEDUP = rf"""
WITH base AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, lang, source FROM documents
)
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY md5({NORM_SQL}) ORDER BY doc_id) AS rn
  FROM base
) WHERE rn = 1
"""


def q_shingle_fingerprint(spark, sf_dir):
    """Winnowing-style near-dup fingerprint: bottom-4 sketch of char-8-gram
    md5 hashes (portable across engines)."""
    d = widen(load(spark, sf_dir, "documents"), spark)
    normed = d.select("doc_id", tx.normalize_text_expr("text").alias("__norm"))
    return normed.select(
        "doc_id",
        F.array_join(
            tx.shingle_fingerprint_expr("__norm", k=8, n_min=4, prenormalized=True),
            "|",
        ).alias("fingerprint"),
    )


ORACLE_SHINGLE_FP = rf"""
SELECT doc_id,
       COALESCE(array_to_string(
         list_sort(list_transform(range(1, greatest(len(norm) - 7, 0) + 1),
                                  i -> md5(substr(norm, cast(i AS int), 8))))[1:4],
         '|'), '') AS fingerprint
FROM (SELECT doc_id, {NORM_SQL} AS norm FROM documents)
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors of vec_id=0 (ANN baseline).

    Ordering happens on the ROUNDED cosine (+ vec_id tie-break) exactly as
    the oracle does, so a near-tie at the k boundary cannot select different
    rows across engines."""
    e = load(spark, sf_dir, "embeddings")
    query = [float(v) for v in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    emb_sql = "CAST(`embedding` AS ARRAY<DOUBLE>)"
    scored = e.select(
        "vec_id",
        F.round(
            sim.cosine_fixed_expr(emb_sql, sim.arr_lit_sql(query), len(query)),
            6,
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col("vec_id")).limit(5)


ORACLE_COSINE_TOPK = """
WITH q AS (SELECT cast(embedding AS double[]) AS v FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(cast(embedding AS double[]), q.v)
             / nullif(sqrt(list_dot_product(cast(embedding AS double[]), cast(embedding AS double[])))
                      * sqrt(list_dot_product(q.v, q.v)), 0), 6) AS cosine
FROM embeddings, q
ORDER BY cosine DESC, vec_id LIMIT 5
"""


# ---------------------------------------------------------------------------
# Streaming-shaped (batch-equivalent windowed aggregation)
# ---------------------------------------------------------------------------

def q_events_window(spark, sf_dir):
    """5-minute tumbling window per event_type (the batch equivalent of the
    structured-streaming aggregation in streaming/jobs.py)."""
    e = load(spark, sf_dir, "events")
    bucket = F.from_unixtime(
        (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("long"),
        "yyyy-MM-dd HH:mm:ss",
    )
    return e.groupBy(
        bucket.alias("window_start"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


ORACLE_EVENTS_WINDOW = """
SELECT strftime(to_timestamp(cast(floor(epoch(ts) / 300) * 300 AS bigint)),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Time-series joins + windows + set ops
# ---------------------------------------------------------------------------

_SHIFT = 725_000_000  # ~23 years: shifts 1995-2001 orders into the events era


def q_asof_join(spark, sf_dir):
    """As-of (time-travel) join: each event picks the latest prior order of
    the same customer (custom operator — Spark has no native as-of join)."""
    from carto_etl_spark.operators.joins import asof_join

    e = load(spark, sf_dir, "events").select(
        "event_id", F.col("user_id"), "ts"
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderkey"),
        F.timestamp_seconds(
            F.unix_timestamp("o_orderdate") + _SHIFT
        ).alias("o_ts"),
        F.col("o_totalprice"),
    )
    joined = asof_join(e, o, on="user_id", left_ts="ts", right_ts="o_ts")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        "o_orderkey",
        F.date_format("o_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "order_ts"
        ),
        F.round("o_totalprice", 2).alias("totalprice"),
    )


ORACLE_ASOF = f"""
WITH o AS (
  SELECT o_custkey AS user_id, o_orderkey,
         to_timestamp(epoch(o_orderdate) + {_SHIFT}) AS o_ts, o_totalprice
  FROM orders
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       o.o_orderkey,
       strftime(o.o_ts, '%Y-%m-%d %H:%M:%S') AS order_ts,
       round(o.o_totalprice, 2) AS totalprice
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.user_id AND e.ts >= o.o_ts
"""


def q_sessionize(spark, sf_dir):
    """Gap-based session windows per user (streaming/jobs.py session_windows
    run in batch mode; oracle = gaps-and-islands SQL)."""
    from carto_etl_spark.streaming.jobs import session_windows

    e = load(spark, sf_dir, "events")
    s = session_windows(e, gap="30 minutes", key_col="user_id")
    return s.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        "sum_value",
    )


ORACLE_SESSIONIZE = """
WITH m AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM s GROUP BY user_id, sid
"""


def q_running_total(spark, sf_dir):
    """Running cumulative sum per customer (window frame surface)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


ORACLE_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM orders
"""


def q_rollup_revenue(spark, sf_dir):
    """ROLLUP aggregation (multi-level totals in one pass)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


ORACLE_ROLLUP = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def q_set_ops(spark, sf_dir):
    """Distinct set operations: big spenders vs high balances."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    spenders = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("key")
    ).distinct()
    rich = c.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("key")
    ).distinct()
    return (
        spenders.union(rich).distinct().select(F.lit("union").alias("op"), "key")
        .unionByName(
            spenders.intersect(rich).select(F.lit("intersect").alias("op"), "key")
        )
        .unionByName(
            spenders.exceptAll(rich).select(F.lit("except").alias("op"), "key")
        )
    )


ORACLE_SET_OPS = """
WITH spenders AS (SELECT DISTINCT o_custkey AS key FROM orders WHERE o_totalprice > 150000),
     rich AS (SELECT DISTINCT c_custkey AS key FROM customer WHERE c_acctbal > 5000)
SELECT 'union' AS op, key FROM (SELECT key FROM spenders UNION SELECT key FROM rich)
UNION ALL
SELECT 'intersect' AS op, key FROM (SELECT key FROM spenders INTERSECT SELECT key FROM rich)
UNION ALL
SELECT 'except' AS op, key FROM (SELECT key FROM spenders EXCEPT SELECT key FROM rich)
"""


def q_geocode_lookup(spark, sf_dir):
    """Reference F7/D7: broadcast-lookup geocoding with 3-way status fan-out;
    addresses synthesized from nation names (every 13th blank -> invalid,
    every 7th unknown -> not_found)."""
    from carto_etl_spark.operators.geocode import geocode_with_lookup

    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    lookup = n.select(
        F.col("n_name").alias("address"),
        F.lit("xx").alias("country"),
        (F.col("n_nationkey") % 360 - 180 + F.lit(0.5)).cast("double").alias("lon"),
        (F.col("n_nationkey") % 120 - 60 + F.lit(0.5)).cast("double").alias("lat"),
    )
    src = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            F.col("c_custkey").alias("recid"),
            F.when(F.col("c_custkey") % 13 == 0, F.lit(""))
            .when(F.col("c_custkey") % 7 == 0, F.lit("UNKNOWN PLACE"))
            .otherwise(F.col("n_name"))
            .alias("searchtext"),
            F.lit("xx").alias("country"),
        )
    )
    out = geocode_with_lookup(src, lookup)
    return out.select(
        "recid", "status", "displaylongitude", "displaylatitude"
    )


ORACLE_GEOCODE = """
WITH lookup AS (
  SELECT lower(trim(n_name)) AS addr,
         cast(n_nationkey % 360 - 180 + 0.5 AS double) AS lon,
         cast(n_nationkey % 120 - 60 + 0.5 AS double) AS lat
  FROM nation
), src AS (
  SELECT c_custkey AS recid,
         CASE WHEN c_custkey % 13 = 0 THEN ''
              WHEN c_custkey % 7 = 0 THEN 'UNKNOWN PLACE'
              ELSE n_name END AS searchtext
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT recid,
       CASE WHEN trim(searchtext) = '' THEN 'invalid'
            WHEN l.addr IS NOT NULL THEN 'found'
            ELSE 'not_found' END AS status,
       l.lon AS displaylongitude,
       l.lat AS displaylatitude
FROM src LEFT JOIN lookup l
  ON lower(trim(regexp_replace(src.searchtext, '\\s+', ' ', 'g'))) = l.addr
"""


def q_ingest_coercion(spark, sf_dir):
    """The Tier-A ingest path itself under the oracle gate: lineitem cast to
    CSV-like strings (comma decimals, %d/%m/%Y dates, blanks, coords), pushed
    through UploadJob.coerced_df — type inference, locale floats, dual-format
    dates, geometry, NULL rules."""
    from carto_etl_spark.operators.jobs import UploadJob

    # widen the RAW table, before the CSV-shaped string projection: the
    # shuffle then moves only narrow source columns, while the expensive
    # string prep + coercion run core-parallel in BOTH passes (inference
    # job and main job).  Measured at sf0.1 (interleaved, warm, median of
    # 5): raw-first 4.6 s vs prep-first 5.7 s vs no widen 7.1 s — the
    # earlier "repartition double-pays" finding applied only to the
    # widened-after-prep plan.
    li = widen(load(spark, sf_dir, "lineitem"), spark)
    src = li.select(
        F.col("l_orderkey").cast("string").alias("okey"),
        F.col("l_linenumber").cast("string").alias("line"),
        F.when(F.col("l_linenumber") == 7, F.lit("")).otherwise(
            F.replace(F.col("l_quantity").cast("string"), F.lit("."), F.lit(","))
        ).alias("qty"),
        F.date_format("l_shipdate", "dd/MM/yyyy HH:mm:ss").alias("ship"),
        (F.col("l_orderkey") % 400 - 200 + F.lit(0.5)).cast("string").alias("lon"),
        (F.col("l_orderkey") % 160 - 80 + F.lit(0.5)).cast("string").alias("lat"),
    )
    cfg = JobConfig.from_kwargs(
        columns="okey,line,qty,ship",
        date_columns="ship",
        date_format="%d/%m/%Y",
        datetime_format="%d/%m/%Y %H:%M:%S",
        float_comma_separator=",",
        x_column="lon",
        y_column="lat",
    )
    job = UploadJob(src, spark=spark, config=cfg)
    out = job.coerced_df(job.source_df())
    return out.select(
        F.col("the_geom.x").alias("geom_x"),
        F.col("the_geom.y").alias("geom_y"),
        "okey",
        "line",
        "qty",
        F.date_format("ship", "yyyy-MM-dd HH:mm:ss").alias("ship_parsed"),
    )


ORACLE_INGEST = """
WITH src AS (
  SELECT cast(l_orderkey AS double) AS okey,
         cast(l_linenumber AS double) AS line,
         CASE WHEN l_linenumber = 7 THEN NULL ELSE l_quantity END AS qty,
         strftime(l_shipdate, '%d/%m/%Y %H:%M:%S') AS ship,
         cast(l_orderkey % 400 - 200 + 0.5 AS double) AS lon,
         cast(l_orderkey % 160 - 80 + 0.5 AS double) AS lat
  FROM lineitem
)
SELECT CASE WHEN abs(lon) <= 180 AND abs(lat) <= 90 THEN lon END AS geom_x,
       CASE WHEN abs(lon) <= 180 AND abs(lat) <= 90 THEN lat END AS geom_y,
       okey, line, qty,
       strftime(coalesce(try_strptime(ship, '%d/%m/%Y %H:%M:%S'),
                         try_strptime(ship, '%d/%m/%Y')),
                '%Y-%m-%d %H:%M:%S') AS ship_parsed
FROM src
"""


def q_cube_revenue(spark, sf_dir):
    """CUBE aggregation: all grouping-set combinations in one pass."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


ORACLE_CUBE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_min_cost_supplier(spark, sf_dir):
    """Correlated-min-subquery shape (TPC-H Q2 flavor): for each part, the
    supplier(s) whose account balance equals the maximum among its
    suppliers."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    s = load(spark, sf_dir, "supplier")
    joined = li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .select(
            "l_partkey",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


ORACLE_MIN_COST = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT l_partkey, s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
FROM ps JOIN supplier ON l_suppkey = s_suppkey
WHERE s_acctbal = (
  SELECT max(s2.s_acctbal) FROM ps ps2
  JOIN supplier s2 ON ps2.l_suppkey = s2.s_suppkey
  WHERE ps2.l_partkey = ps.l_partkey
)
"""


def q_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (group-HAVING against a global-scalar fraction): per
    part, the supplier-held value (sum of extendedprice*quantity over the
    distinct part-supplier pairs standing in for partsupp, suppliers
    restricted to one nation), keeping parts whose value exceeds 1/1000 of
    the nation total.  The global scalar attaches as a single-row broadcast
    (no global window), and the HAVING comparison is EXACT decimal
    arithmetic — value*1000 > total — so no cross-engine FP boundary can
    flip a row."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_8"
    ).select("n_nationkey")
    val = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    )
    held = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum(val).cast("decimal(38,4)").alias("value"))
    ).localCheckpoint(eager=False)
    total = held.agg(
        F.sum("value").cast("decimal(38,4)").alias("__total")
    )
    return (
        held.crossJoin(F.broadcast(total))
        .where(F.col("value") * 1000 > F.col("__total"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


ORACLE_IMPORTANT_STOCK = """
WITH held AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2)))
              AS DECIMAL(38,4)) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_8'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(value AS DOUBLE) AS value
FROM held
WHERE value * 1000 > (SELECT CAST(sum(value) AS DECIMAL(38,4)) FROM held)
"""


def q_parts_supplier_relationship(spark, sf_dir):
    """TPC-H Q16 shape (distinct-count with NOT-IN supplier exclusion):
    supplier counts per (brand, type, size) for a filtered part universe —
    brand <>, type not-like, size IN — excluding 'risky' suppliers
    (negative account balance standing in for Q16's complaint scan) via an
    anti-join.  partsupp is the distinct (l_partkey, l_suppkey) projection,
    as in q_min_cost_supplier."""
    ps = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    ).distinct()
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").startswith("ECONOMY"))
        & (F.col("p_size").isin(5, 11, 17, 23, 28, 37, 41, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    risky = load(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(p), ps["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(risky),
            ps["l_suppkey"] == risky["s_suppkey"],
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_PARTS_SUPPLIER = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#2'
  AND p_type NOT LIKE 'ECONOMY%'
  AND p_size IN (5, 11, 17, 23, 28, 37, 41, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q_promotable_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (nested semi-joins + correlated half-threshold,
    decorrelated): suppliers in one nation who, for some 'red%' part,
    shipped MORE of it in 1995 than half their all-time volume of that
    part.  The correlated scalar becomes a conditional aggregate over one
    grouping — sum(qty in 1995) vs sum(qty) per (supplier, part) — and the
    half comparison is exact decimal (2*q95 > total).  Two broadcast semi
    joins, one fact aggregation, no subquery re-scan."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    red = load(spark, sf_dir, "part").where(
        F.col("p_name").startswith("red")
    ).select("p_partkey")
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    ).select("n_nationkey")
    q = F.col("l_quantity").cast("decimal(18,2)")
    per = (
        li.join(F.broadcast(red), li["l_partkey"] == red["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(F.year("l_shipdate") == 1995, q).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).cast("decimal(38,2)").alias("q95"),
            F.sum(q).cast("decimal(38,2)").alias("qall"),
        )
        .where(F.col("q95") * 2 > F.col("qall"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(per, s["s_suppkey"] == per["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
    )


ORACLE_PROMOTABLE = """
WITH per AS (
  SELECT l_suppkey, l_partkey,
         CAST(sum(CASE WHEN year(l_shipdate) = 1995
                  THEN CAST(l_quantity AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,2))
           AS q95,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS qall
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
  GROUP BY l_suppkey, l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
WHERE s_suppkey IN (SELECT l_suppkey FROM per WHERE q95 * 2 > qall)
"""


def q_compression_ratio(spark, sf_dir):
    """Gopher-style compression-ratio quality signal: zlib bytes-out /
    bytes-in per document (Arrow-batched pandas UDF; stdlib zlib).

    Emits exact integer byte counts (ratio = compressed_len / orig_len for
    the reader): integers hash identically across engines, and the oracle is
    a precomputed golden table (tools/make_zlib_golden.py) keyed by
    md5(text) — content-addressed, so one golden file covers every sf."""
    from carto_etl_spark.operators.text import compressed_len_expr

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("orig_len"),
        compressed_len_expr("text").alias("compressed_len"),
    )


_ZLIB_GOLDEN = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "tests", "golden", "zlib_lens.parquet",
)

ORACLE_COMPRESSION = f"""
SELECT d.doc_id, g.orig_len, g.compressed_len
FROM documents d
JOIN read_parquet('{_ZLIB_GOLDEN}') g ON md5(d.text) = g.md5
"""


def q_json_extract(spark, sf_dir):
    """Semi-structured surface: JSON property extraction from events.props
    (Spark get_json_object stays JVM-side)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


ORACLE_JSON = """
SELECT event_type, count(*) AS n,
       cast(sum(cast(json_extract(props, '$.k') AS int)) AS bigint) AS sum_k,
       min(cast(json_extract(props, '$.k') AS int)) AS min_k,
       max(cast(json_extract(props, '$.k') AS int)) AS max_k
FROM events GROUP BY event_type
"""


def q_percentiles(spark, sf_dir):
    """Exact percentiles (linear interpolation) per group."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )


ORACLE_PERCENTILES = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders GROUP BY o_orderpriority
"""


def q_above_customer_avg(spark, sf_dir):
    """Orders above their customer's average price (decorrelated-subquery
    shape via window).

    Cross-engine FP hygiene: a rounded *average* of cent-values can land
    exactly on a rounding boundary (x.xxx75) where Spark and DuckDB round
    binary doubles differently — so the output carries the exact-cents SUM
    (always clean at 2 decimals), and the filter uses a 1e-6 margin so
    boundary rows resolve identically in both engines."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cust_sum", F.sum("o_totalprice").over(w))
        .withColumn("cust_n", F.count(F.lit(1)).over(w))
        .filter(
            F.col("o_totalprice") > F.col("cust_sum") / F.col("cust_n") + 1e-6
        )
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("cust_sum", 2).alias("cust_total"),
            F.col("cust_n").alias("n_orders"),
        )
    )


ORACLE_ABOVE_AVG = """
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) AS totalprice,
       round(cust_sum, 2) AS cust_total,
       cust_n AS n_orders
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         sum(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_sum,
         count(*) OVER (PARTITION BY o_custkey) AS cust_n
  FROM orders
) WHERE o_totalprice > cust_sum / cust_n + 1e-6
"""


# ---------------------------------------------------------------------------
# Non-SQL-expressible operators (rows-only checks: xxhash64-based sketches,
# LSH buckets with engine-side hyperplanes)
# ---------------------------------------------------------------------------

def q_minhash_dedup(spark, sf_dir):
    """MinHash+LSH near-dedup over documents + a mutated near-copy of each
    10th document: survivor set after exact-verified candidate pairs and
    transitive (connected-component) survivorship.

    Oracle-checkable end to end: with ``verify_exact`` the edge set is
    {LSH candidates} ∩ {exact n-gram Jaccard >= t}, and bands=32 (2 rows per
    band) puts LSH recall at J>=0.5 above 1 - 1e-4 per pair — so the graph
    equals DuckDB's exact-Jaccard graph on this corpus, and the survivor set
    matches a recursive-CTE connected-components oracle.  A green row proves
    candidate recall, exact verification, AND the fixpoint min-label
    propagation all at once."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select(
            # offset past any plausible corpus id: the old +10^6 ALIASED
            # base ids on multi-million-doc scale corpora (r9 1091x run),
            # silently corrupting survivor accounting
            (F.col("doc_id") + 10_000_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
        )
    )
    both = widen(d.unionByName(near), spark)
    out = dd.minhash_dedup(
        both, "doc_id", "text", threshold=0.5, bands=32, verify_exact=True
    )
    return out.select("doc_id")


# Exact-Jaccard pair graph (same normalization/shingling as the engine) ->
# transitive closure via recursive CTE -> survivors = nodes that reach no
# smaller id.  Shingle construction mirrors ORACLE_NGRAM_JACCARD.
ORACLE_MINHASH_DEDUP = r"""
WITH RECURSIVE both_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000000 AS doc_id, text || ' extra token' AS text
  FROM documents WHERE doc_id % 10 = 0
), toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     x -> x != '') AS t
  FROM both_docs
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                                      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
  FROM toks
), ex AS (
  SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS g FROM sh
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
  HAVING count(*) / (a.sz + b.sz - count(*)) >= 0.5
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), reach AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
)
SELECT doc_id FROM both_docs
WHERE doc_id NOT IN (SELECT s FROM reach GROUP BY s HAVING min(d) < s)
"""


def _pipeline_messy_pages(spark, sf_dir):
    """Shared pipeline FIXTURE (pipeline_e2e + pipeline_ccnet): the
    deterministic messy-corpus synthesis — cookie-banner + per-source
    footer lines appended to every page, a mutated near-copy of every
    10th document.  Returns the raw (doc_id, text) pages; the cleaning /
    dedup chains themselves live in operators/pipeline.py and the
    entries below delegate to that public API."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    base = d.select("doc_id", "text", "source")
    near = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
        "source",
    )
    both = base.unionByName(near)
    # NO widen here, deliberately (r10 A/B): the pages frame feeds
    # drop_repeated_lines from TWO branches (line explode + the drop-list
    # attach join), so a round-robin repartition shuffles the full
    # synthesized text twice — measured e2e [36.6, 9.7, 14.9] s/iter
    # widened vs [7-8.5] unwidened at sf0.1.  The line-count exchange
    # already re-spreads the downstream work.
    return both.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("This site uses cookies to improve your experience"),
            F.concat(F.lit("Footer for "), F.col("source")),
        ).alias("text"),
    )


def _pipe_cfg(**overrides):
    """The catalog entries' PipelineConfig: the operators/pipeline.py
    public API parameterized with this harness's toy-scale knobs — the
    oracles therefore prove the LIBRARY composition path, not a parallel
    harness implementation."""
    from carto_etl_spark.operators.pipeline import PipelineConfig

    base = dict(
        dedup_threshold=0.5,
        dedup_bands=32,
        dedup_verify_exact=True,
        split_weights={"train": 0.8, "valid": 0.1, "test": 0.1},
        split_salt=11,
        n_shards=16,
        blocklist_terms=("hash value", "dup"),
        classifier_dim=_QC_DIM,
        classifier_iterations=_QC_ITERS,
        classifier_lr_num=_QC_LR_NUM,
        classifier_lr_den=_QC_LR_DEN,
        classifier_scale=_QC_SCALE,
        quality_tau=_PC_TAU,
        train_cap=_PC_TRAIN_CAP,
        train_salt=_PC_TRAIN_SALT,
        c4_min_words=3,
        c4_min_sentences=5,
        gopher_word_count_min=10,
        gopher_min_stopwords=1,
    )
    base.update(overrides)
    return PipelineConfig(**base)


def q_pipeline_e2e(spark, sf_dir):
    """The realistic preprocessing COMPOSITION, priced as one entry (r6
    verdict #4): every stage below is benched solo elsewhere, but a real
    corpus run chains them, and compositions carry cross-stage costs
    (recomputation, lost pushdowns, cache boundaries) per-stage benches
    can't see.  One deterministic messy-corpus synthesis (cookie-banner
    pages + per-source footers + near-copies of every 10th doc), then:

      line dedup (CCNet boilerplate removal) -> min-token quality gate ->
      term-blocklist gate -> PII scrub -> MinHash near-dedup
      (exact-verified, transitive survivorship) -> split assignment ->
      shard assignment

    — the html_extract/tokenize stages keep their solo entries (the
    extractor collapses line structure by design, which would blind the
    line-dedup stage here).  Emits the export manifest row per surviving
    doc: (doc_id, split, shard, n_tokens, text_md5).  The oracle replays
    the ENTIRE chain in one WITH-chain, including the recursive-CTE
    connected components — a green row prices and proves the composition
    end to end.  Plan posture: synthesis + gates + scrub FUSE into the
    line-dedup reassembly's output stage (verified: one scan of documents
    feeds the whole prefix), and the only shuffles are the three inherent
    ones (line-count agg, doc reassembly, minhash bands/components).

    The cross-stage cost this entry exists to expose: minhash_dedup
    references its input from FIVE plan branches (signatures, two verify
    join sides, touched-id semi-join, final anti-join), and without a
    materialization boundary each branch re-derived the whole prefix —
    8 scans of the corpus parquet (measured; test_pipeline_ops pins the
    bound).  One localCheckpoint of the cleaned+scrubbed frame cuts it
    to the line-dedup stage's own branches; at 100 TB this is the
    "stage output to durable storage" boundary every real pipeline puts
    exactly here.  (q_pipeline_ccnet adds the trained classifier quality
    gate to this same chain.)

    Since r10 the chain itself is the PUBLIC library composition
    (operators/pipeline.py e2e_pipeline) — this entry builds the messy
    fixture and delegates, so the oracle proves the library path."""
    from carto_etl_spark.operators.pipeline import e2e_pipeline

    pages = _pipeline_messy_pages(spark, sf_dir)
    return e2e_pipeline(pages, _pipe_cfg()).manifest


#: classifier-gate threshold for pipeline_ccnet, on the [0, _QC_SCALE]
#: hard-sigmoid score — the quality_mixture "mid" boundary: keep documents
#: the trained gate does not actively dislike
_PC_TAU = _QM_MID
#: bound the ccnet classifier's training set to ~this many labeled docs via
#: the deterministic Lehmer hash-sample (operators/pipeline.py
#: train_quality_gate).  Real CCNet trains its LM on a bounded held-out
#: set; in-query full-corpus training was the one composed stage without a
#: scale story (r9: ccnet 37.5x cost at 109x rows vs fineweb's 3.5x —
#: training dominated).  200 < the 500-doc sf0.01 corpus, so the
#: correctness gate exercises the sampled arm, and the oracle replays the
#: exact sample from count(*) + integer arithmetic.
_PC_TRAIN_CAP, _PC_TRAIN_SALT = 200, 17


def q_pipeline_ccnet(spark, sf_dir):
    """pipeline_e2e completed into the FULL CCNet shape (r7 verdict #3):
    the same messy-corpus synthesis and line-dedup/blocklist/scrub prefix,
    then the TRAINED quality classifier gates the corpus at scan stage
    before near-dedup — train (12 fixed-point GD iterations on a
    ``train_cap``-bounded deterministic hash-sample of the labeled seed
    corpus, operators/pipeline.py train_quality_gate) -> score every
    scrubbed doc with ``quality_score_expr`` -> keep score >= tau ->
    MinHash near-dedup -> split -> shard.  The oracle unrolls TRAINING —
    including the Lehmer sample filter, replayed exactly from count(*) +
    integer arithmetic — and the whole chain (recursive-CTE connected
    components and all) in one statement.  Plan posture: the score
    expression is one more scan-stage predicate on the fused prefix (no
    new shuffle, no UDF); the localCheckpoint boundary stays where
    pipeline_e2e pinned it; training reads the bounded sample, never the
    full corpus (the r9 scale finding: in-query full-corpus training was
    37.5x cost at 109x rows).  Delegates to the public library
    composition (operators/pipeline.py ccnet_pipeline)."""
    from carto_etl_spark.operators.pipeline import ccnet_pipeline

    d_raw = load(spark, sf_dir, "documents")
    labeled = d_raw.select("doc_id", "text", _qc_label_col())
    pages = _pipeline_messy_pages(spark, sf_dir)
    return ccnet_pipeline(pages, labeled, _pipe_cfg()).manifest


_PIPE_PREFIX_CTES = r"""base AS (
  SELECT doc_id, text, source FROM documents WHERE text IS NOT NULL
), both_docs AS (
  SELECT doc_id, text, source FROM base
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' extra token' AS text, source
  FROM base WHERE doc_id % 10 = 0
), pages AS (
  SELECT doc_id,
         text || chr(10) ||
         'This site uses cookies to improve your experience' || chr(10) ||
         'Footer for ' || source AS text
  FROM both_docs
), lines AS (
  SELECT doc_id, CAST(u.l[2] AS BIGINT) AS pos, u.l[1] AS line
  FROM pages, unnest(list_zip(string_split(text, chr(10)),
                     range(0, len(string_split(text, chr(10)))))) AS u(l)
), boiler AS (
  SELECT line FROM lines
  WHERE len(trim(line)) >= 10
  GROUP BY line HAVING count(*) > 1
), lsurv AS (
  SELECT doc_id, pos, line FROM lines
  WHERE len(trim(line)) < 10
     OR line NOT IN (SELECT line FROM boiler)
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM lsurv GROUP BY doc_id
), gated AS (
  SELECT doc_id, text FROM rebuilt
  WHERE len(list_filter(string_split_regex(trim(text), '\s+'),
                        x -> x != '')) >= 3
    AND len(regexp_extract_all(text, '(?i)\b(?:hash value|dup)\b')) <= 2
), scrubbed AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
             'https?://[^\s]+', '<URL>', 'g'),
             '\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b',
             '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+\d[\d \-]{6,}\d\b', '<PHONE>', 'g') AS text
  FROM gated
)"""


def _pipeline_tail_sql(src: str) -> str:
    """Shared pipeline-oracle TAIL (pipeline_e2e + pipeline_ccnet): the
    MinHash-equivalent exact near-dedup (3-gram Jaccard >= 0.5, transitive
    survivorship via a recursive CTE) over ``src``, then the split/shard
    manifest projection — parameterized on the CTE feeding the dedup."""
    split = smp.split_sql(
        "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}, salt=11
    )
    return rf""", toks AS (
  SELECT doc_id,
         list_filter(string_split(
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             x -> x != '') AS t
  FROM {src}
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                                      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
  FROM toks
), ex AS (
  SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS g FROM sh
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
  HAVING count(*) / (a.sz + b.sz - count(*)) >= 0.5
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), reach AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
), keep AS (
  SELECT doc_id, text FROM {src}
  WHERE doc_id NOT IN (SELECT s FROM reach GROUP BY s HAVING min(d) < s)
)
SELECT doc_id,
       {split} AS split,
       CAST(floor((('0x' || substr(md5('0' || ':' || doc_id), 1, 8))::BIGINT
                   * 16) / 4294967296.0) AS INTEGER) AS shard,
       CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x != '')) AS BIGINT) AS n_tokens,
       md5(text) AS text_md5
FROM keep
"""


def _oracle_pipeline_e2e() -> str:
    return "WITH RECURSIVE " + _PIPE_PREFIX_CTES + _pipeline_tail_sql(
        "scrubbed"
    )


def _oracle_pipeline_ccnet() -> str:
    """The ccnet composition oracle: the shared prefix, then the ENTIRE
    classifier training unrolled (12 GD iterations — the
    quality_classifier oracle's wfin) over the ``train_cap``-bounded
    Lehmer hash-sample of the labeled corpus (threshold = cap * M //
    count(*), pure integer arithmetic, so the sample — and therefore
    every weight — replays bit-for-bit), the scrubbed docs rescored
    through the trained weights, the tau gate, and the shared
    dedup/manifest tail over the gated set."""
    thr = (
        f"least({smp.LEHMER_M}::BIGINT, "
        f"{_PC_TRAIN_CAP} * {smp.LEHMER_M}::BIGINT "
        f"// (SELECT count(*) FROM documents))"
    )
    keep = smp.hash_sql("doc_id", _PC_TRAIN_SALT)
    train = _qc_train_sql(
        f"SELECT doc_id, text FROM documents WHERE {keep} < {thr}"
    )
    score_ctes = rf""", wfin AS MATERIALIZED (
  SELECT feature, weight FROM ({train}) t
), ptoks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(trim(text), '\s+'), x -> x != '')) AS tok
  FROM scrubbed
), pdsum AS (
  SELECT doc_id, CAST(SUM(w.weight) AS BIGINT) AS m
  FROM (SELECT doc_id,
               CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                    % {_QC_DIM} AS INT) AS feature
        FROM ptoks) tw
  JOIN wfin w USING (feature) GROUP BY doc_id
), qgated AS (
  SELECT s.doc_id, s.text
  FROM scrubbed s
  LEFT JOIN pdsum m ON s.doc_id = m.doc_id
  CROSS JOIN (SELECT weight FROM wfin WHERE feature = {_QC_DIM}) b
  WHERE greatest(0, least({_QC_SCALE},
          (COALESCE(m.m, 0) + b.weight) // 4 + {_QC_SCALE // 2}))
        >= {_PC_TAU}
)"""
    return (
        "WITH RECURSIVE "
        + _PIPE_PREFIX_CTES
        + score_ctes
        + _pipeline_tail_sql("qgated")
    )


def q_pipeline_fineweb(spark, sf_dir):
    """The FineWeb-shaped composition (Penedo et al. arXiv:2406.17557
    order: heuristic quality rules BEFORE dedup): sentence-ified messy
    corpus (cookie banner + per-source footer lines, near-copies of every
    10th doc) -> C4 line+page rules (operators/c4rules.py — here the
    punct-less banner/footer lines die at the LINE rule, so C4 does the
    boilerplate removal that pipeline_e2e's cross-doc line dedup performs)
    -> BOTH Gopher halves (operators/gopher.py): the QUALITY rule table
    (scan-stage projection, zero shuffle; toy-scale word-count/stop-word
    knobs the way this chain already relaxes C4's min_words) AND the
    repetition table (map-only Arrow counting) -> MinHash near-dedup ->
    split -> shard manifest (the shared tail).  The oracle replays the
    whole chain — all three rule tables nested as CTEs — in one
    statement.

    Two materialization boundaries, one per stage output that fans out:
    the C4-cleaned frame feeds the Gopher scorer AND the survivor join
    (without it the c4 prefix runs once per branch), and the gated frame
    feeds minhash_dedup's five plan branches (the pipeline_e2e lesson,
    pinned by test_pipeline_ops).  Delegates to the public library
    composition (operators/pipeline.py fineweb_pipeline), which owns the
    stage order and all three boundaries."""
    from carto_etl_spark.operators.pipeline import fineweb_pipeline

    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    sent = F.regexp_replace(F.col("text"), _C4_SENT_RE, "$1.\n")
    # NOT widened here, deliberately (r11 interleaved A/B): pushing the
    # widen below this sentence regex (onto the raw scan, so the regex
    # runs 32-wide instead of on the 2 scan partitions) measured 1.17x
    # SLOWER with jobs 21 -> 24 — the union's two branches stop sharing
    # one exchange and the fused Arrow chain fans to 64 partitions of
    # per-task Python worker overhead.  The pages-level widen below
    # keeps the chain at defaultParallelism.
    base = d.select("doc_id", sent.alias("text"), "source")
    near = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("\nnear copy extra line.")).alias("text"),
        "source",
    )
    both = base.unionByName(near)
    pages = both.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("This site uses cookies to improve your experience"),
            F.concat(F.lit("Footer for "), F.col("source")),
        ).alias("text"),
    )
    # the whole pre-dedup chain is one fused CPU-heavy map stage now
    # (keep_cols gates, no semi-joins) — spread the single-row-group scan
    return fineweb_pipeline(widen(pages, spark), _pipe_cfg()).manifest


def _oracle_pipeline_fineweb() -> str:
    from carto_etl_spark.operators.c4rules import c4_oracle_sql
    from carto_etl_spark.operators.gopher import (
        gopher_quality_sql,
        gopher_repetition_sql,
    )

    c4o = c4_oracle_sql(
        "SELECT doc_id, text FROM fpages", ["doc_id"],
        min_words=3, min_sentences=5,
    )
    qualo = gopher_quality_sql(
        "SELECT doc_id, text FROM c4kept", "doc_id",
        word_count_min=10, min_stopwords=1,
    )
    gopo = gopher_repetition_sql("SELECT doc_id, text FROM qkept", "doc_id")
    prefix = rf"""fbase AS (
  SELECT doc_id,
         regexp_replace(text, '{_C4_SENT_RE}', '\1.' || chr(10), 'g') AS text,
         source
  FROM documents WHERE text IS NOT NULL
), fboth AS (
  SELECT doc_id, text, source FROM fbase
  UNION ALL
  SELECT doc_id + 1000000,
         text || chr(10) || 'near copy extra line.', source
  FROM fbase WHERE doc_id % 10 = 0
), fpages AS (
  SELECT doc_id,
         text || chr(10) ||
         'This site uses cookies to improve your experience' || chr(10) ||
         'Footer for ' || source AS text
  FROM fboth
), c4o AS (
  {c4o}
), c4kept AS (
  SELECT doc_id, clean_text AS text FROM c4o WHERE doc_kept
), qualo AS (
  {qualo}
), qkept AS (
  SELECT k.doc_id, k.text
  FROM c4kept k JOIN qualo q ON k.doc_id = q.doc_id
  WHERE q.passes
), gopo AS (
  {gopo}
), fgated AS (
  SELECT k.doc_id, k.text
  FROM qkept k JOIN gopo g ON k.doc_id = g.doc_id
  WHERE g.passes
)"""
    return "WITH RECURSIVE " + prefix + _pipeline_tail_sql("fgated")


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-pairs over documents + mutated near-copies at
    hamming<=3, where the 16-bit-block candidate generation is
    pigeonhole-COMPLETE (4 disjoint blocks guarantee any pair within
    hamming 3 shares one) — so the result is exactly {pairs: hamming <= 3},
    not an approximation of it.

    The oracle joins a golden table of SimHash values computed by an
    INDEPENDENT pure-Python xxHash64 implementation
    (tools/xxhash64_ref.py, public spec) and enumerates all hamming<=3
    pairs directly in SQL: a green row cross-checks the engine's xxhash64
    signature math, the sign-counter packing, and the blocking completeness
    in one shot."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    both = widen(d.unionByName(near), spark)
    return dd.simhash_near_pairs(both, "doc_id", "text", max_hamming=3)


_SIMHASH_GOLDEN = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "tests", "golden", "simhash.parquet",
)

ORACLE_SIMHASH_PAIRS = f"""
WITH both_h AS (
  SELECT d.doc_id, g.simhash AS h
  FROM documents d JOIN read_parquet('{_SIMHASH_GOLDEN}') g ON md5(d.text) = g.md5
  UNION ALL
  SELECT d.doc_id + 1000000 AS doc_id, g.simhash_zz AS h
  FROM documents d JOIN read_parquet('{_SIMHASH_GOLDEN}') g ON md5(d.text) = g.md5
  WHERE d.doc_id % 10 = 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.h, b.h)) AS hamming
FROM both_h a JOIN both_h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h, b.h)) <= 3
"""


def q_ann_topk(spark, sf_dir):
    """LSH-bucketed approximate top-5 for vec_id=0 (scale path of
    q_cosine_topk).

    Fully oracle-checkable: the hyperplanes are deterministic literals
    (seeded LCG), so DuckDB reproduces the ENTIRE ANN semantics — signature,
    hamming-radius candidate pruning, scored top-k — from the same plane
    constants.  Ordering is on the rounded cosine + vec_id (the
    q_cosine_topk convention) so the k boundary resolves identically."""
    e = load(spark, sf_dir, "embeddings")
    query = [float(v) for v in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    # fold-form signature: the 8x64 expanded tree can never JIT (49KB
    # method > hugeMethodLimit) and, fused with the scoring projection,
    # overflowed janino's 64KB ceiling — every run paid a doomed compile
    # (see q_ann_ivf).  Values bit-identical.
    cands = sim.ann_candidates(
        e, query, n_planes=8, hamming_radius=2, expansion=False
    )
    emb_sql = "CAST(`embedding` AS ARRAY<DOUBLE>)"
    scored = cands.select(
        "vec_id",
        F.round(
            sim.cosine_fixed_expr(emb_sql, sim.arr_lit_sql(query), len(query)),
            6,
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col("vec_id")).limit(5)


def _plane_sql(plane: list[float]) -> str:
    return "[" + ",".join(repr(float(v)) for v in plane) + "]::DOUBLE[]"


def _lsh_sig_sql(vec_expr: str, planes: list[list[float]]) -> str:
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}, {_plane_sql(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def _build_oracle_ann_topk() -> str:
    from carto_etl_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim=64, n_planes=8, seed=42)
    return f"""
WITH q AS (SELECT cast(embedding AS double[]) AS v FROM embeddings WHERE vec_id = 0),
qsig AS (SELECT {_lsh_sig_sql('q.v', planes)} AS sig FROM q),
sigs AS (
  SELECT vec_id, cast(embedding AS double[]) AS v,
         {_lsh_sig_sql('cast(embedding AS double[])', planes)} AS sig
  FROM embeddings
)
SELECT s.vec_id,
       round(list_dot_product(s.v, q.v)
             / nullif(sqrt(list_dot_product(s.v, s.v))
                      * sqrt(list_dot_product(q.v, q.v)), 0), 6) AS cosine
FROM sigs s, q, qsig
WHERE bit_count(xor(s.sig, qsig.sig)) <= 2
ORDER BY cosine DESC, s.vec_id LIMIT 5
"""


ORACLE_ANN_TOPK = _build_oracle_ann_topk()


def q_ann_ivf(spark, sf_dir):
    """IVF-partitioned approximate top-5 for vec_id=0 (coarse quantizer +
    probe-limited scan; the file-pruning ANN scale path).

    The catalog entry uses the hash-sampled quantizer (centroids = the
    n_lists vectors whose md5(id) sorts first) instead of KMeans: identical
    IVF structure — assign to nearest centroid, probe the nprobe nearest
    lists — but every step is reproducible in portable SQL, so the oracle
    recomputes the whole index, not just the final ranking.  The KMeans
    quantizer (sim.ivf_index) stays the default for real corpora and is
    pytest-covered."""
    e = load(spark, sf_dir, "embeddings")
    query = [float(v) for v in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    centroids = sim.sampled_centroids(e, n_lists=8)
    # fold distances, not the literal expansion: at 8x64 centroid-dims the
    # expanded argmin generates a 49KB codegen method — past the 8000-byte
    # hugeMethodLimit it can never JIT, and fused with the scoring
    # projection it crosses janino's 64KB ceiling, so every run paid a
    # DOOMED compile (~2-3 s) before falling back to the same interpreted
    # eval the fold uses directly.  Values are bit-identical (documented +
    # equality-tested); r10 A/B: 3.2-4.1 s -> 1.0-1.5 s per run.
    indexed = sim.assign_ivf_lists(e, centroids, expansion=False)
    probes = sim.probe_lists(centroids, query, nprobe=3)
    cands = indexed.filter(F.col("ivf_list").isin(probes))
    emb_sql = "CAST(`embedding` AS ARRAY<DOUBLE>)"
    scored = cands.select(
        "vec_id",
        F.round(
            sim.cosine_fixed_expr(emb_sql, sim.arr_lit_sql(query), len(query)),
            6,
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col("vec_id")).limit(5)


ORACLE_ANN_IVF = """
WITH cents AS (
  SELECT vec_id AS cid, cast(embedding AS double[]) AS cv FROM embeddings
  ORDER BY md5(cast(vec_id AS varchar)), vec_id LIMIT 8
), q AS (SELECT cast(embedding AS double[]) AS v FROM embeddings WHERE vec_id = 0),
probes AS (
  SELECT cid FROM cents, q ORDER BY list_distance(cv, q.v), cid LIMIT 3
), assigned AS (
  SELECT e.vec_id, cast(e.embedding AS double[]) AS v,
         (SELECT cid FROM cents
          ORDER BY list_distance(cents.cv, cast(e.embedding AS double[])), cid
          LIMIT 1) AS lst
  FROM embeddings e
)
SELECT a.vec_id,
       round(list_dot_product(a.v, q.v)
             / nullif(sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(q.v, q.v)), 0), 6) AS cosine
FROM assigned a, q
WHERE a.lst IN (SELECT cid FROM probes)
ORDER BY cosine DESC, a.vec_id LIMIT 5
"""


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs via LSH bucket join.

    Emits id pairs only (no FP columns): the oracle recomputes the FULL
    pairwise cosine in DuckDB, so a green row proves the LSH bucketing lost
    no >=0.99 pair on this corpus (identical vectors always share a bucket;
    the nearest natural pair sits at cosine ~0.37, far from the boundary)."""
    e = load(spark, sf_dir, "embeddings")
    dup = e.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    both = e.unionByName(dup)
    return sim.embedding_near_dup_pairs(both, threshold=0.99, dim=64).select(
        "id_a", "id_b"
    )


ORACLE_EMBEDDING_NEAR_DUP = """
WITH both_v AS (
  SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, cast(embedding AS double[]) AS v
  FROM embeddings WHERE vec_id % 50 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM both_v a JOIN both_v b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.99
"""


def q_near_dup_banded(spark, sf_dir):
    """Embedding near-dup pairs via the BANDED (OR-amplified) LSH scale
    path (operators/similarity.py embedding_near_dup_banded): 3 independent
    6-plane signatures, candidate dedup across bands, one exact-cosine
    verify (small band/plane counts: the driver table is 530 rows, and the
    entry prices the PLAN SHAPE — the scale parameterization is measured
    separately in SCALING.md).  Same brute-force oracle contract as embedding_near_dup: the
    DuckDB side recomputes the FULL pairwise cosine, so a green row proves
    the banded bucketing lost no >=0.99 pair on this corpus (identical
    planted copies collide in EVERY band; the nearest natural pair sits far
    from the boundary) and the exact verify admitted nothing below it."""
    e = load(spark, sf_dir, "embeddings")
    dup = e.filter(F.col("vec_id") % 30 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    both = e.unionByName(dup)
    return sim.embedding_near_dup_banded(
        both, threshold=0.99, n_planes=6, n_bands=3
    ).select("id_a", "id_b")


ORACLE_NEAR_DUP_BANDED = """
WITH both_v AS (
  SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, cast(embedding AS double[]) AS v
  FROM embeddings WHERE vec_id % 30 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM both_v a JOIN both_v b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.99
"""


def q_knn_graph(spark, sf_dir):
    """k-NN graph over the embedding corpus: per vector, the top-5 banded-LSH
    neighbors by exact cosine — the neighbor-graph primitive under
    diversity sampling, dedup clustering and graph-based curation.

    Candidates come from 2 independent 6-plane signatures (collide in ANY
    band — the OR-amplified recall shape of near_dup_banded; small
    band/plane counts: the 500-row entry prices the plan shape, and each
    codegen signature costs a one-time Janino compile that would dominate
    the toy frame at larger counts); the exact
    cosine then ranks candidates per source id with a PARTITIONED window
    (never global).  Fully oracle-checkable: the hyperplanes are
    deterministic LCG literals, so DuckDB re-derives every band signature,
    the candidate set, and the rounded-cosine (+ neighbor-id tie-break)
    top-k.  At scale the same plan holds: candidates ~ n_bands x n x
    bucket-occupancy, the window partitions by source id."""
    e = load(spark, sf_dir, "embeddings")
    scored = _pinned_knn_scored(e)
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.col("nbr"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select(
            F.col("src").alias("vec_id"),
            F.col("nbr").alias("neighbor_id"),
            "cosine",
        )
    )


def _pinned_knn_scored(e):
    """The oracle-pinned LSH candidate set, exact-cosine scored: the shared
    prefix of q_knn_graph (top-k per source) and q_hard_negatives (per-kind
    triplet slates).  2 independent 6-plane fold signatures, OR-amplified;
    deterministic LCG hyperplanes so DuckDB re-derives everything."""
    parts = [
        # fold signatures (bit-identical to the expansion — the oracle
        # replays them either way): this entry is toy-pinned, and the two
        # expanded signature trees cost ~4 s of per-build Catalyst
        # analysis + compile; the parameterized scale twin
        # (similarity.knn_graph) keeps the Arrow path
        sim.with_lsh_buckets(
            e, n_planes=6, dim=64, seed=42 + b, expansion=False
        ).select(
            "vec_id", F.lit(b).alias("band"), F.col("lsh_bucket").alias("bucket")
        )
        for b in range(2)
    ]
    bucketed = parts[0]
    for p in parts[1:]:
        bucketed = bucketed.unionByName(p)
    a, b_ = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("src"), F.col("b.vec_id").alias("nbr")
        )
        .dropDuplicates(["src", "nbr"])
    )
    vecs = e.select(
        F.col("vec_id").alias("__vid"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    scored = (
        cand.join(
            vecs.withColumnRenamed("__vid", "src").withColumnRenamed(
                "__v", "__va"
            ),
            "src",
        )
        .join(
            vecs.withColumnRenamed("__vid", "nbr").withColumnRenamed(
                "__v", "__vb"
            ),
            "nbr",
        )
        .select(
            "src",
            "nbr",
            # fold cosine (bit-identical to the expansion): since r7 the
            # genuine scale workload lives in similarity.knn_graph (the
            # parameterized twin, norm-hoisted expansion); this pinned
            # entry prices the oracle plan shape on 500 rows, where the
            # expansion's build-time analysis dominated
            F.round(sim.cosine_expr(F.col("__va"), F.col("__vb")), 6).alias(
                "cosine"
            ),
        )
    )
    return scored


#: triplet-mining slate sizes for the hard_negatives entry
_HN_K_POS, _HN_K_NEG = 2, 2


def q_hard_negatives(spark, sf_dir):
    """Hard-triplet mining for embedding-model training (the standard
    contrastive-data recipe: positives = nearest same-label vectors, hard
    negatives = nearest WRONG-label vectors — the informative negatives a
    random sample never finds).  Reuses the oracle-pinned LSH candidate
    set of q_knn_graph, joins the anchor and neighbor labels, and ranks a
    per-(anchor, kind) slate with a partitioned window
    (similarity.rank_triplets).  At scale the same ranker composes onto
    similarity.knn_graph's parameterized edge list — mining is a
    projection + two keyed joins + one partitioned window over edges that
    already exist for dedup/diversity work."""
    e = load(spark, sf_dir, "embeddings")
    scored = _pinned_knn_scored(e)
    edges = scored.select(
        F.col("src").alias("vec_id"),
        F.col("nbr").alias("neighbor_id"),
        "cosine",
    )
    labels = e.select("vec_id", "label")
    return sim.rank_triplets(
        edges, labels, k_pos=_HN_K_POS, k_neg=_HN_K_NEG,
        id_col="vec_id", label_col="label",
    )


def _oracle_hard_negatives() -> str:
    return _build_oracle_knn_prefix() + f""", lab AS (
  SELECT vec_id, label FROM embeddings
), kinds AS (
  SELECT s.src, s.nbr, s.cosine,
         CASE WHEN la.label = lb.label THEN 'pos' ELSE 'neg' END AS kind
  FROM scored s
  JOIN lab la ON s.src = la.vec_id
  JOIN lab lb ON s.nbr = lb.vec_id
), ranked AS (
  SELECT src, nbr, cosine, kind,
         row_number() OVER (PARTITION BY src, kind
                            ORDER BY cosine DESC, nbr) AS rn
  FROM kinds
)
SELECT src AS vec_id, kind, CAST(rn AS INT) AS rank,
       nbr AS neighbor_id, cosine
FROM ranked
WHERE (kind = 'pos' AND rn <= {_HN_K_POS})
   OR (kind = 'neg' AND rn <= {_HN_K_NEG})
"""


def q_kmeans_embeddings(spark, sf_dir):
    """Fixed-point Lloyd k-means (operators/kmeans.py): 3 full Lloyd
    rounds over the embeddings table in exact integer arithmetic
    (quantize-once coordinates, integer argmin, truncating-division
    centroid means — the pagerank/classifier recipe), then the final
    assignment.  The DuckDB oracle unrolls every round and replays each
    centroid bit-for-bit, so a green row proves init sampling, the argmin
    tie-break, the empty-cluster rule, and all updates at once.  (The
    driver table is isotropic — clustering QUALITY on a separable corpus
    is asserted in tests/test_kmeans.py; the entry pins exactness.)"""
    from carto_etl_spark.operators import kmeans as km

    e = load(spark, sf_dir, "embeddings")
    cents = km.kmeans_fit(e, k=10, iterations=3)
    return km.assign_clusters(e, cents).select("vec_id", "cluster")


def _oracle_kmeans() -> str:
    from carto_etl_spark.operators.kmeans import kmeans_oracle_sql

    return kmeans_oracle_sql(
        "SELECT vec_id, embedding FROM embeddings", k=10, iterations=3
    )


def q_diversity_sample(spark, sf_dir):
    """Cluster-stratified diversity sampling (operators/kmeans.py
    diversity_sample): fixed-point Lloyd fit (k=8, 2 rounds), EXACT
    integer distance-to-centroid assignment, and the 3 nearest-to-centroid
    representatives per cluster — the "cover the embedding space" curation
    move beside SemDeDup.  The whole chain is exact integers, so the
    oracle unrolls the fit AND replays the per-cluster nearest-first
    ranking value-for-value."""
    from carto_etl_spark.operators import kmeans as km

    e = load(spark, sf_dir, "embeddings")
    return km.diversity_sample(e, k=8, m=3, iterations=2)


def _oracle_diversity() -> str:
    from carto_etl_spark.operators.kmeans import diversity_oracle_sql

    return diversity_oracle_sql(
        "SELECT vec_id, embedding FROM embeddings", k=8, m=3, iterations=2
    )


def _vec_batch_df(spark, sf_dir):
    """The match batch: 50% near-dups (identical copies of every even id)
    + 50% novel vectors (REVERSED embeddings of every odd id — a
    deterministic, SQL-replayable transform far from every history vector
    in cosine)."""
    e = load(spark, sf_dir, "embeddings")
    copies = e.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    novel = e.filter(F.col("vec_id") % 2 == 1).select(
        (F.col("vec_id") + 2000000).alias("vec_id"),
        F.reverse(F.col("embedding")).alias("embedding"),
    )
    return copies.unionByName(novel)


def q_incremental_vec_near_dup(spark, sf_dir):
    """Incremental embedding near-dup index (streaming/vecindex.py), full
    lifecycle: the embeddings table is indexed as history (random-plane
    band buckets into the shared AppendOnlyState), then a batch of 50%
    identical copies and 50% novel vectors matches against it with exact
    cosine verification of band-collision candidates.  Identical copies
    collide in EVERY band and the corpus's nearest natural pair sits far
    below the 0.99 threshold, so the result equals DuckDB's exact
    bipartite cosine join — a green row proves signature derivation,
    candidate generation, state round-trip, and verification at once."""
    import shutil
    import tempfile

    from carto_etl_spark.streaming.vecindex import (
        append_to_vec_index,
        match_against_vec_index,
    )

    workdir = tempfile.mkdtemp(prefix="vecindex-")
    try:
        hist = load(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        append_to_vec_index(hist, workdir)
        batch = _vec_batch_df(spark, sf_dir)
        pairs = match_against_vec_index(
            spark, batch, hist, workdir, threshold=0.99
        )
        agg = pairs.groupBy(F.col("id_a").alias("vec_id")).agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("id_b").alias("best_match"),
        )
        out = batch.select("vec_id").join(agg, "vec_id", "left").select(
            "vec_id",
            F.coalesce(F.col("n_matches"), F.lit(0))
            .cast("long")
            .alias("n_matches"),
            (F.coalesce(F.col("n_matches"), F.lit(0)) > 0).alias("is_dup"),
            "best_match",
        )
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def q_streaming_kmeans(spark, sf_dir):
    """Incremental mini-batch k-means lifecycle (streaming/kmeansstate.py):
    the embeddings table arrives as three deterministic batches
    (vec_id % 3 == 0, 1, 2, in order) folding into the crash-safe centroid
    state — seed from batch 0's md5(id) order, one exact-integer
    running-mean update per batch — then every vector is assigned to the
    final centroids.  The DuckDB oracle unrolls the WHOLE lifecycle
    (seeding, every per-batch assignment + update, final assignment) and
    replays it bit-for-bit: a green row proves the online update rule, the
    batch ordering, the untouched-cluster rule and the serving assignment
    at once.  (Replay/ledger semantics are pinned by
    tests/test_streaming_kmeans.py — a replayed batch is a no-op.)"""
    import shutil
    import tempfile

    from carto_etl_spark.streaming.kmeansstate import (
        apply_kmeans_batch,
        assign_from_state,
    )

    workdir = tempfile.mkdtemp(prefix="kmstate-")
    try:
        e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        for b in range(3):
            apply_kmeans_batch(
                e.filter(F.col("vec_id") % 3 == b), workdir, k=8
            )
        out = assign_from_state(spark, e, workdir).select(
            "vec_id", "cluster"
        )
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _oracle_streaming_kmeans() -> str:
    from carto_etl_spark.streaming.kmeansstate import (
        streaming_kmeans_oracle_sql,
    )

    return streaming_kmeans_oracle_sql(
        "SELECT vec_id, embedding FROM embeddings",
        k=8,
        n_batches=3,
        batch_sql="vec_id % 3",
    )


def q_embedding_decontam(spark, sf_dir):
    """Semantic eval-set decontamination (similarity.embedding_decontam):
    the embeddings table is the training corpus; the eval set is 50%
    verbatim copies of every even id (leaked) + 50% reversed embeddings of
    every odd id (clean, far from everything in cosine).  Identical
    vectors collide in every band and the corpus's nearest natural pair
    sits far below the 0.99 threshold, so the banded-LSH + exact-verify
    result equals DuckDB's exact bipartite cosine join — a green row
    proves both-side signature derivation, the broadcast bipartite
    candidate join, and the verify in one shot."""
    train = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    evals = _vec_batch_df(spark, sf_dir)
    return sim.embedding_decontam(train, evals, threshold=0.99)


ORACLE_EMBEDDING_DECONTAM = """
WITH evals AS (
  SELECT vec_id + 1000000 AS vec_id,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 2 = 0
  UNION ALL
  SELECT vec_id + 2000000 AS vec_id,
         list_reverse(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings WHERE vec_id % 2 = 1
), train AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), m AS (
  SELECT e.vec_id, count(*) AS n_matches, min(t.vec_id) AS contaminated_by
  FROM evals e JOIN train t
    ON list_cosine_similarity(e.v, t.v) >= 0.99
  GROUP BY e.vec_id
)
SELECT e.vec_id,
       CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches,
       coalesce(m.n_matches, 0) > 0 AS is_contaminated,
       m.contaminated_by
FROM evals e LEFT JOIN m USING (vec_id)
"""


ORACLE_INCREMENTAL_VEC_NEAR_DUP = """
WITH batch AS (
  SELECT vec_id + 1000000 AS vec_id,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 2 = 0
  UNION ALL
  SELECT vec_id + 2000000 AS vec_id,
         list_reverse(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings WHERE vec_id % 2 = 1
), hist AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), m AS (
  SELECT b.vec_id, count(*) AS n_matches, min(h.vec_id) AS best_match
  FROM batch b JOIN hist h
    ON list_cosine_similarity(b.v, h.v) >= 0.99
  GROUP BY b.vec_id
)
SELECT b.vec_id,
       CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches,
       coalesce(m.n_matches, 0) > 0 AS is_dup,
       m.best_match
FROM batch b LEFT JOIN m USING (vec_id)
"""


def _build_oracle_knn_prefix() -> str:
    """Shared sigs/cand/scored WITH-prefix of the knn_graph and
    hard_negatives oracles — the DuckDB replay of `_pinned_knn_scored`."""
    from carto_etl_spark.operators.similarity import _hyperplanes

    sig_cols = []
    for b in range(2):
        planes = _hyperplanes(dim=64, n_planes=6, seed=42 + b)
        sig_cols.append(
            f"{_lsh_sig_sql('cast(embedding AS double[])', planes)} AS s{b}"
        )
    sigs = ", ".join(sig_cols)
    return f"""
WITH sigs AS (
  SELECT vec_id, cast(embedding AS double[]) AS v, {sigs} FROM embeddings
), cand AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS nbr, a.v AS va, b.v AS vb
  FROM sigs a JOIN sigs b
    ON a.vec_id != b.vec_id
   AND (a.s0 = b.s0 OR a.s1 = b.s1)
), scored AS (
  SELECT src, nbr,
         round(list_dot_product(va, vb)
               / nullif(sqrt(list_dot_product(va, va))
                        * sqrt(list_dot_product(vb, vb)), 0), 6) AS cosine
  FROM cand
)"""


def _build_oracle_knn() -> str:
    return _build_oracle_knn_prefix() + """, ranked AS (
  SELECT src, nbr, cosine,
         row_number() OVER (PARTITION BY src ORDER BY cosine DESC, nbr)
           AS rn
  FROM scored
)
SELECT src AS vec_id, nbr AS neighbor_id, cosine
FROM ranked WHERE rn <= 5
"""


ORACLE_KNN_GRAPH = _build_oracle_knn()


def q_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard pairs over documents + planted near-copies,
    via the PPJoin-style prefix-filtered join (rarest-first canonical order,
    length filter, array_intersect verification) — exact results with a
    skew-safe shuffle; the DuckDB oracle is the naive set arithmetic."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail marker")).alias("text"),
    )
    # the shingle build + prefix explode are the expensive per-row chain;
    # spread the single-row-group toy scan (no-op on multi-split inputs)
    both = widen(d.unionByName(near), spark)
    pairs = dd.ngram_jaccard_pairs_prefix(
        both, "doc_id", "text", n=3, min_jaccard=0.6
    )
    # Emit the exact integer (intersection, union) pair instead of the rounded
    # ratio: identical set arithmetic in any engine, so the hash compare is
    # immune to FP rounding; jaccard = inter / union_sz for the reader. The
    # threshold filter itself divides identical small ints on both engines, so
    # boundary rows resolve identically.
    return pairs.select("id_a", "id_b", "inter", "union_sz")


ORACLE_NGRAM_JACCARD = r"""
WITH both_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' tail marker' AS text
  FROM documents WHERE doc_id % 25 = 0
), toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     x -> x != '') AS t
  FROM both_docs
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                                      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
  FROM toks
), ex AS (
  SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS g FROM sh
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       count(*) AS inter,
       a.sz + b.sz - count(*) AS union_sz
FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
HAVING count(*) / (a.sz + b.sz - count(*)) >= 0.6
"""


#: split weights shared by the split_leakage audit — same shape as the
#: dataset_split entry so the two read as one contract
_SL_WEIGHTS = {"train": 0.8, "valid": 0.1, "test": 0.1}


def q_split_leakage(spark, sf_dir):
    """Cross-split LEAKAGE AUDIT — the eval-integrity check Lee et al.
    (arXiv:2107.06499 §6.2) run after splitting: near-duplicate document
    pairs that landed in DIFFERENT splits (a test doc with a train
    near-copy inflates eval).  Pure composition, zero new shuffles beyond
    the pair join: exact prefix-filtered n-gram Jaccard pairs
    (dedup.ngram_jaccard_pairs_prefix) + the deterministic hash-split
    label applied DIRECTLY to each pair id (split_expr is a pure function
    of id and salt — no join back to the corpus, the label rides the
    pair-output stage).  Planted near-copies hash independently of their
    sources, so ~1/3 of true pairs cross splits at 80/10/10."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail marker")).alias("text"),
    )
    # the shingle build + prefix explode are the expensive per-row chain;
    # spread the single-row-group toy scan (no-op on multi-split inputs)
    both = widen(d.unionByName(near), spark)
    pairs = dd.ngram_jaccard_pairs_prefix(
        both, "doc_id", "text", n=3, min_jaccard=0.6
    )
    out = pairs.select(
        "id_a",
        "id_b",
        "inter",
        "union_sz",
        smp.split_expr(F.col("id_a"), _SL_WEIGHTS, salt=11).alias("split_a"),
        smp.split_expr(F.col("id_b"), _SL_WEIGHTS, salt=11).alias("split_b"),
    )
    return out.filter(F.col("split_a") != F.col("split_b"))


ORACLE_SPLIT_LEAKAGE = f"""
WITH pairs AS ({ORACLE_NGRAM_JACCARD}),
lab AS (
  SELECT id_a, id_b, inter, union_sz,
         {smp.split_sql("id_a", _SL_WEIGHTS, salt=11)} AS split_a,
         {smp.split_sql("id_b", _SL_WEIGHTS, salt=11)} AS split_b
  FROM pairs
)
SELECT id_a, id_b, inter, union_sz, split_a, split_b
FROM lab WHERE split_a != split_b
"""


#: DSIR hashed-feature space (the paper uses 10k buckets at CommonCrawl
#: scale; 1024 keeps the toy fit dense enough that most buckets are
#: observed) and the Gumbel redraw salt.
_DSIR_DIM = 1024
_DSIR_N = 100
_DSIR_SALT = 7


def q_dsir_sample(spark, sf_dir):
    """DSIR data selection (Xie et al. arXiv:2302.03169, operators/dsir.py):
    fit hashed word-{1,2}-gram unigram models on a small in-domain TARGET
    (the French docs) and on the selection POOL (the English docs), weight
    each feature by its smoothed log-likelihood ratio in exact micro-nats,
    score every pool doc by its count-weighted LLR sum, and Gumbel-top-k
    resample n=100 — "give me the pool documents that look most like the
    target domain", the published alternative to the CCNet classifier gate
    (quality_mixture).  Fit is two dim-bounded hash-aggregates + one
    dim-row join; scoring is one sparse-feature shuffle + a broadcast
    weight join; selection is TakeOrderedAndProject.  Everything after the
    per-feature round() is exact int64, so the oracle replays fit + score
    + resample value-for-value."""
    from carto_etl_spark.operators import dsir as ds

    d = load(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "fr")
    pool = d.filter(F.col("lang") == "en")
    tc = ds.feature_counts(target, "text", dim=_DSIR_DIM, ngram=2)
    rc = ds.feature_counts(pool, "text", dim=_DSIR_DIM, ngram=2)
    w, tt, rt = ds.dsir_weights(tc, rc, dim=_DSIR_DIM)
    scores = ds.dsir_scores(
        pool, "text", "doc_id", w, tt, rt, dim=_DSIR_DIM, ngram=2
    )
    return ds.dsir_select(scores, "doc_id", n=_DSIR_N, salt=_DSIR_SALT)


def _oracle_dsir_sample() -> str:
    from carto_etl_spark.operators.dsir import dsir_oracle_sql

    return dsir_oracle_sql(
        "SELECT text FROM documents WHERE lang = 'fr'",
        "SELECT text FROM documents WHERE lang = 'en'",
        "SELECT doc_id, text FROM documents WHERE lang = 'en'",
        "doc_id",
        dim=_DSIR_DIM,
        ngram=2,
        n=_DSIR_N,
        salt=_DSIR_SALT,
    )


#: every 6 whitespace-separated words become one period-terminated line —
#: the deterministic "sentence-ifier" that gives the punctuation-free
#: synthetic corpus a page structure for the C4 rules to act on.
_C4_SENT_RE = r"(\S+ \S+ \S+ \S+ \S+ \S+) "


def q_c4_rules(spark, sf_dir):
    """The C4 heuristic cleaning rules (Raffel et al. arXiv:1910.10683
    §2.2, operators/c4rules.py) over a deterministically structured copy
    of the corpus: each doc is split into 6-word period-terminated lines
    (the tail words stay unpunctuated, so every page exercises the
    terminal-punct line rule), and selected ids get a trailing
    "lorem ipsum" or curly-brace/javascript line to trip the page rules.
    Output: per-doc cleaned text + line/sentence counts + the page-keep
    flag.  One scan-stage projection — no shuffle anywhere."""
    from carto_etl_spark.operators import c4rules as c4

    d = load(spark, sf_dir, "documents")
    base = F.regexp_replace(F.col("text"), _C4_SENT_RE, "$1.\n")
    txt = (
        F.when(
            F.col("doc_id") % 37 == 0,
            F.concat(base, F.lit("\nlorem ipsum dolor sit amet.")),
        )
        .when(
            F.col("doc_id") % 41 == 0,
            F.concat(base, F.lit("\nwidget { javascript beacon }")),
        )
        .otherwise(base)
    )
    prepared = widen(d.select("doc_id", txt.alias("text")), spark)
    return c4.c4_filter(
        prepared, "text", ["doc_id"], min_words=3, min_sentences=5
    )


def _oracle_c4_rules() -> str:
    from carto_etl_spark.operators.c4rules import c4_oracle_sql

    rows = rf"""
SELECT doc_id,
       CASE WHEN doc_id % 37 = 0
              THEN s || chr(10) || 'lorem ipsum dolor sit amet.'
            WHEN doc_id % 41 = 0
              THEN s || chr(10) || 'widget {{ javascript beacon }}'
            ELSE s END AS text
FROM (SELECT doc_id,
             regexp_replace(text, '{_C4_SENT_RE}',
                            '\1.' || chr(10), 'g') AS s
      FROM documents)
"""
    return c4_oracle_sql(rows, ["doc_id"], min_words=3, min_sentences=5)


def q_gopher_repetition(spark, sf_dir):
    """The full Gopher repetition rule table (Rae et al. arXiv:2112.11446
    Table A1, operators/gopher.py): top-{2,3,4}-gram char fractions,
    duplicated-{5..10}-gram char fractions, duplicate-line fraction and
    char fraction, and the combined ``passes`` flag.  Runs over the same
    sentence-ified corpus as c4_rules, with every 11th doc given a twice-
    repeated line so the line-level signals fire; the 50-word synthetic
    vocabulary makes the n-gram mass genuinely non-trivial.  Runs the
    map-only Arrow counting path (no exchange at all; bit-identical to the
    relational twin — operators/gopher.py method="expr" — which pays a
    shuffle plus interpreted HOFs to say "count within each doc" in
    relational algebra: 9.4 s vs 1.5 s at sf0.1)."""
    from carto_etl_spark.operators.gopher import gopher_repetition

    d = widen(load(spark, sf_dir, "documents"), spark)
    base = F.regexp_replace(F.col("text"), _C4_SENT_RE, "$1.\n")
    txt = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(base, F.lit("\nrepeat me twice now.\nrepeat me twice now.")),
    ).otherwise(base)
    return gopher_repetition(d.select("doc_id", txt.alias("text")))


def _oracle_gopher_repetition() -> str:
    from carto_etl_spark.operators.gopher import gopher_repetition_sql

    rows = rf"""
SELECT doc_id,
       CASE WHEN doc_id % 11 = 0
              THEN s || chr(10) || 'repeat me twice now.'
                     || chr(10) || 'repeat me twice now.'
            ELSE s END AS text
FROM (SELECT doc_id,
             regexp_replace(text, '{_C4_SENT_RE}',
                            '\1.' || chr(10), 'g') AS s
      FROM documents)
"""
    return gopher_repetition_sql(rows, "doc_id")


def q_gopher_quality(spark, sf_dir):
    """The Gopher QUALITY rule table (Rae et al. arXiv:2112.11446 §A.1.1,
    operators/gopher.py — the non-repetition half FineWeb also applies):
    word-count bounds, mean word length 3-10, '#'/ellipsis symbol-to-word
    ratios, bullet-start and ellipsis-end line fractions, >=80% alphabetic
    words, and the >=2-distinct-stop-words rule, each as a per-rule flag
    plus the conjunction ``passes``.  Runs the default pure-projection
    path: every signal is scan-stage column math — NO shuffle, NO explode;
    at 100 TB this is a map-only pass (the Arrow twin exists only to hold
    the bit-identity contract).  Corpus mutations exercise every rule:
    every 7th doc gains bullet lines, every 5th an ellipsis-ended line +
    '…' forms, every 13th a '#' burst."""
    from carto_etl_spark.operators.gopher import gopher_quality

    d = widen(load(spark, sf_dir, "documents"), spark)
    base = F.regexp_replace(F.col("text"), _C4_SENT_RE, "$1.\n")
    txt = F.concat(
        base,
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit("\n• bullet point line\n- dash bullet\n* star bullet"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("\nto be continued...\ntrailing form…   "),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0, F.lit("\n## ## # hash burst")
        ).otherwise(F.lit("")),
    )
    return gopher_quality(d.select("doc_id", txt.alias("text")))


def _oracle_gopher_quality() -> str:
    from carto_etl_spark.operators.gopher import gopher_quality_sql

    rows = rf"""
SELECT doc_id,
       regexp_replace(text, '{_C4_SENT_RE}', '\1.' || chr(10), 'g')
       || CASE WHEN doc_id % 7 = 0
               THEN chr(10) || '• bullet point line' || chr(10)
                    || '- dash bullet' || chr(10) || '* star bullet'
               ELSE '' END
       || CASE WHEN doc_id % 5 = 0
               THEN chr(10) || 'to be continued...' || chr(10)
                    || 'trailing form…   '
               ELSE '' END
       || CASE WHEN doc_id % 13 = 0
               THEN chr(10) || '## ## # hash burst'
               ELSE '' END AS text
FROM documents
"""
    return gopher_quality_sql(rows, "doc_id")


def q_quality_scores(spark, sf_dir):
    """Composite document quality score (C4/Gopher-style blend of length,
    word-shape, stopword, punctuation components).  Every component is plain
    IEEE double arithmetic evaluated in the same order on both engines, so
    the blend is oracle-checkable."""
    d = widen(load(spark, sf_dir, "documents"), spark)
    return d.select(
        "doc_id", F.round(tx.quality_score_expr("text"), 6).alias("quality")
    )


# Mirrors text.quality_score_expr term by term, in the same evaluation order,
# so every intermediate double is bit-identical across engines.
ORACLE_QUALITY_SCORES = r"""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS t
  FROM documents
), comps AS (
  SELECT doc_id,
         least(length(text) / 200.0, 1.0) AS length_score,
         cast(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
           / cast(nullif(len(t), 0) AS DOUBLE) AS mwl,
         coalesce(len(list_filter(t, x -> list_contains(STOPLIST, lower(x))))
                  / cast(nullif(len(t), 0) AS DOUBLE), 0.0) AS stop_ratio,
         coalesce(len(regexp_extract_all(text, '[.,;:!?]'))
                  / cast(nullif(length(text), 0) AS DOUBLE), 0.0) AS punct_ratio
  FROM toks
)
SELECT doc_id,
       round(
         least(length_score, 1.0) * 0.3
         + (CASE WHEN mwl IS NULL THEN 0.0
                 WHEN mwl >= 3 AND mwl <= 10 THEN 1.0
                 ELSE 0.5 END) * 0.2
         + (CASE WHEN stop_ratio > 0.05 THEN 1.0 ELSE stop_ratio * 20.0 END) * 0.3
         + (CASE WHEN punct_ratio <= 0.1 THEN 1.0
                 ELSE greatest(0.0, 1.0 - (punct_ratio - 0.1) * 5.0) END) * 0.2,
         6) AS quality
FROM comps
""".replace("STOPLIST", _STOPLIST_SQL)


def q_approx_stats(spark, sf_dir):
    """Sketch path for heavy stats at 100 TB: HLL distinct counts and
    approximate percentiles.  The raw sketch estimates are engine-specific,
    so the catalog entry emits exact values plus booleans asserting the
    sketch landed within tolerance (HLL: 5% relative error, approx median:
    5% of the exact median) — deterministic on both engines while still
    exercising the sketch aggregates."""
    o = load(spark, sf_dir, "orders")
    # The sketches and the exact checks aggregate SEPARATELY, joined on the
    # 3-row group frame: mixing count_distinct into the same agg makes
    # Spark's distinct-rewrite key the partial aggregate by (status,
    # custkey), so every distinct customer group hauls its own 2^14-register
    # HLL sketch + percentile buffer through the plan — measured 8.0 s for
    # the combined agg vs 0.2-0.9 s for each aggregate alone (sf0.1); the
    # split-and-broadcast-join form runs 1.6 s.
    a = o.groupBy("o_orderstatus").agg(
        # rsd=0.01 so the 5% acceptance band is ~5 sigma (the default 0.05
        # leaves it at 1 sigma, which flips on real data).
        F.approx_count_distinct("o_custkey", 0.01).alias("__hll"),
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("__amed"),
        F.count(F.lit(1)).alias("n"),
    )
    b = o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("exact_customers"),
        F.expr("percentile(o_totalprice, 0.5)").alias("__emed"),
    )
    agg = a.join(F.broadcast(b), ["o_orderstatus"])
    return agg.select(
        "o_orderstatus",
        "n",
        "exact_customers",
        (
            F.abs(F.col("__hll") - F.col("exact_customers"))
            <= 0.05 * F.col("exact_customers")
        ).alias("hll_ok"),
        (
            F.abs(F.col("__amed") - F.col("__emed")) <= 0.05 * F.abs(F.col("__emed"))
        ).alias("approx_median_ok"),
    )


ORACLE_APPROX_STATS = """
SELECT o_orderstatus,
       count(*) AS n,
       count(DISTINCT o_custkey) AS exact_customers,
       true AS hll_ok,
       true AS approx_median_ok
FROM orders GROUP BY o_orderstatus
"""


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing: documents' bytes as fake image payloads ->
    Arrow-batched decode (deterministic stub) -> feature rows."""
    from carto_etl_spark.operators.multimodal import decode_image_features

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
    )
    feats = decode_image_features(d, fake=True)
    return feats.select(
        "media_id", "width", "height", "n_channels",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, v: a + v), 6).alias(
            "feature_sum"
        ),
    )


# The fake decoder derives every output from sha256(content): width/height
# from digest bytes 0-1, an 8-dim float32 feature vector from bytes 2-9.
# DuckDB's sha256() yields the same digest (hex), so the oracle re-derives
# the bytes from hex pairs. The float32 terms are dyadic rationals whose
# 8-term double sum is exact, so the left-associated sum matches Spark's
# aggregate() fold bit for bit.
ORACLE_MULTIMODAL = """
WITH h AS (
  SELECT doc_id AS media_id, sha256(text) AS d FROM documents
), b AS (
  SELECT media_id,
         list_transform(range(0, 10),
           i -> (strpos('0123456789abcdef', substr(d, cast(2*i+1 AS INT), 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(d, cast(2*i+2 AS INT), 1)) - 1)) AS by
  FROM h
)
SELECT media_id,
       cast(64 + by[1] % 192 AS INT) AS width,
       cast(64 + by[2] % 192 AS INT) AS height,
       cast(3 AS INT) AS n_channels,
       round(cast(cast(by[3] / 255.0 AS REAL) AS DOUBLE)
           + cast(cast(by[4] / 255.0 AS REAL) AS DOUBLE)
           + cast(cast(by[5] / 255.0 AS REAL) AS DOUBLE)
           + cast(cast(by[6] / 255.0 AS REAL) AS DOUBLE)
           + cast(cast(by[7] / 255.0 AS REAL) AS DOUBLE)
           + cast(cast(by[8] / 255.0 AS REAL) AS DOUBLE)
           + cast(cast(by[9] / 255.0 AS REAL) AS DOUBLE)
           + cast(cast(by[10] / 255.0 AS REAL) AS DOUBLE), 6) AS feature_sum
FROM b
"""


def q_audio_features(spark, sf_dir):
    """Multimodal audio under the oracle gate: synthesize a deterministic
    PCM WAV per document (mono 16-bit square wave, frame count from doc_id),
    decode with the REAL stdlib ``wave`` operator, emit the derived
    features.  A constant-|amplitude| square wave has exactly
    rms = 16384/32768 = 0.5 (dyadic), and duration is the same two-integer
    division in both engines, so every field is engine-exact."""
    from carto_etl_spark.operators.multimodal import (
        decode_audio_features,
        synth_square_wav_expr,
    )

    d = widen(load(spark, sf_dir, "documents"), spark).select(
        F.col("doc_id").alias("media_id"),
        (400 * (1 + F.col("doc_id") % 5)).cast("long").alias("__frames"),
    )
    src = d.withColumn("content", synth_square_wav_expr(F.col("__frames")))
    feats = decode_audio_features(src)
    return feats.select(
        "media_id",
        "sample_rate",
        "n_channels",
        "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round(F.col("rms")[0], 6).alias("rms0"),
    )


ORACLE_AUDIO = """
SELECT doc_id AS media_id,
       cast(8000 AS int) AS sample_rate,
       cast(1 AS int) AS n_channels,
       cast(400 * (1 + doc_id % 5) AS bigint) AS n_samples,
       round(cast(400 * (1 + doc_id % 5) AS double) / 8000.0, 6) AS duration_s,
       cast(0.5 AS double) AS rms0
FROM documents
"""


# ---------------------------------------------------------------------------
# Catalog
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Training-pipeline operators: deterministic sampling, packing, decontamination,
# PII scrubbing, repetition stats (operators/sampling.py, decontam.py, scrub.py)
# ---------------------------------------------------------------------------

# Oracle twin of sampling.hash_expr, generated by its sibling hash_sql so the
# Spark and SQL forms cannot drift (xor-shifted Lehmer rounds; see
# sampling.hash_expr for why plain iterated multiplies are not enough).
def _lehmer_sql(salt: int) -> str:
    return smp.hash_sql("doc_id", salt)


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language downsampling: keep 25% of English, 50% of
    Chinese, everything else whole — the standard corpus-rebalancing step,
    as a single scan-stage filter (operators/sampling.py)."""
    d = load(spark, sf_dir, "documents")
    kept = smp.stratified_sample(
        d, "doc_id", "lang", {"en": 0.25, "zh": 0.5}, default_rate=1.0, salt=7
    )
    return kept.select("doc_id", "lang", smp.hash_expr("doc_id", 7).alias("draw"))


ORACLE_STRATIFIED = f"""
SELECT doc_id, lang, {_lehmer_sql(7)} AS draw
FROM documents
WHERE {_lehmer_sql(7)} <
      CASE lang WHEN 'en' THEN {int(0.25 * 2147483647)}
                WHEN 'zh' THEN {int(0.5 * 2147483647)}
                ELSE 2147483647 END
"""


def q_temperature_mixture(spark, sf_dir):
    """Temperature-weighted language mixture (operators/sampling.py
    temperature_mixture): target half the corpus with per-language weights
    n_lang^0.5 / Σ n^0.5 — the standard multilingual data-mixing step
    (alpha=0.5 flattens the distribution so English stops dominating while
    small languages are not starved).  One tiny counts aggregate derives
    the thresholds; the sample itself is a single scan-stage hash filter.

    The oracle replays the WHOLE derivation in SQL — per-language counts,
    sqrt weights summed in sorted-language order, min(1, target·w/n),
    floor to hash units — every step IEEE-correctly-rounded, so the
    thresholds agree bit-for-bit (the alpha=0.5 exactness contract in
    temperature_mixture_plan's docstring)."""
    d = load(spark, sf_dir, "documents")
    kept = smp.temperature_mixture(
        d, "doc_id", "lang", target_fraction=0.5, alpha=0.5, salt=11
    )
    return kept.select("doc_id", "lang")


def _build_oracle_temperature_mixture() -> str:
    langs = ["de", "en", "es", "fr", "zh"]  # full TESTDATA lang domain
    n = {
        s: f"CAST(coalesce((SELECT count(*) FROM documents "
           f"WHERE lang = '{s}'), 0) AS DOUBLE)"
        for s in langs
    }
    denom = " + ".join(f"sqrt({n[s]})" for s in sorted(langs))
    target = (
        "CAST(floor(CAST((SELECT count(*) FROM documents) AS DOUBLE)"
        " * 0.5) AS DOUBLE)"
    )
    whens = " ".join(
        f"WHEN lang = '{s}' THEN CAST(floor(least(1.0, "
        f"(({target}) * (sqrt({n[s]}) / ({denom}))) / {n[s]})"
        f" * 2147483647.0) AS BIGINT)"
        for s in sorted(langs)
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE {_lehmer_sql(11)} < (CASE {whens} ELSE -1 END)
"""


ORACLE_TEMPERATURE_MIXTURE = _build_oracle_temperature_mixture()


def q_group_sample(spark, sf_dir):
    """Exact 10-docs-per-source uniform sample (hash order, doc_id
    tie-break) — the fixed-quota variant rate sampling can't provide."""
    d = load(spark, sf_dir, "documents")
    return smp.group_sample(d, "source", "doc_id", k=10, salt=3).select(
        "doc_id", "source"
    )


ORACLE_GROUP_SAMPLE = f"""
SELECT doc_id, source
FROM documents
QUALIFY row_number() OVER (
    PARTITION BY source
    ORDER BY {_lehmer_sql(3)}, doc_id) <= 10
"""


def q_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing, shard-local (partition=source): greedy
    boundary-crossing bins of 512 whitespace tokens, rolled up to per-sequence
    stats (operators/sampling.py:pack_sequences)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", tx.token_count_expr("text").alias("n_tokens")
    )
    packed = smp.pack_sequences(
        d, "n_tokens", "doc_id", budget=512, partition="source"
    )
    return smp.pack_stats(packed, "n_tokens", partition="source")


ORACLE_PACK = r"""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(trim(text), '\s+'), x -> x != ''))
             AS n_tokens
  FROM documents
), packed AS (
  SELECT source, n_tokens,
         CAST(floor(coalesce(sum(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512)
           AS BIGINT) AS seq_id
  FROM toks
)
SELECT source, seq_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM packed GROUP BY source, seq_id
"""


def q_decontam(spark, sf_dir):
    """Benchmark decontamination report: 5-gram overlap of every document
    against the doc_id%97==0 slice standing in for an eval set
    (operators/decontam.py — broadcast benchmark n-gram set, no corpus
    shuffle).  The corpus side is widened first: the 5-gram build is the
    plan's dominant per-row cost and the local single-row-group file caps
    scan parallelism at 1 (widen() is a no-op on real multi-split
    layouts)."""
    d = load(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 97 == 0)
    return dc.contamination(widen(d, spark), bench, n=5)


ORACLE_DECONTAM = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS t
  FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN len(t) < 5 THEN []::VARCHAR[]
              ELSE list_transform(range(1, len(t) - 3),
                                  i -> array_to_string(t[i:i+4], ' '))
         END AS g
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(g) AS ngram FROM grams WHERE doc_id % 97 = 0
), docg AS (
  SELECT doc_id, unnest(list_distinct(g)) AS ngram FROM grams
), ov AS (
  SELECT doc_id, count(*) AS n_overlap
  FROM docg JOIN bench USING (ngram) GROUP BY doc_id
)
SELECT grams.doc_id,
       len(list_distinct(g)) AS n_ngrams,
       CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(n_overlap, 0) > 0 AS contaminated
FROM grams LEFT JOIN ov ON grams.doc_id = ov.doc_id
"""


def q_pii_scrub(spark, sf_dir):
    """PII redaction over deterministically injected emails/URLs/IPs/phones
    (the corpus is synthetic, so the PII is synthesized too — the injection
    arithmetic is replayed by the oracle).  Emits per-category counts and the
    md5 of the scrubbed text (operators/scrub.py, regex-only, no UDF)."""
    d = load(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat_ws(
            "",
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com visit https://ex.org/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" from 10.2."), F.pmod(F.col("doc_id"), F.lit(250)).cast("string"),
            F.lit(".7 call +1 555 01"), F.pmod(F.col("doc_id"), F.lit(10)).cast("string"),
            F.lit("23"),
        ).alias("text"),
    )
    out = sc.scrub(injected, "text")
    return out.select(
        "doc_id", "n_url", "n_email", "n_ipv4", "n_phone",
        F.md5(F.col("text")).alias("scrub_md5"),
    )


ORACLE_PII = r"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || doc_id ||
         '@mail.example.com visit https://ex.org/p/' || doc_id ||
         ' from 10.2.' || (doc_id % 250) || '.7 call +1 555 01' ||
         (doc_id % 10) || '23' AS text
  FROM documents
), s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_url,
         regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g') AS text
  FROM injected
), s2 AS (
  SELECT doc_id, n_url,
         len(regexp_extract_all(text,
             '\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b')) AS n_email,
         regexp_replace(text,
             '\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b',
             '<EMAIL>', 'g') AS text
  FROM s1
), s3 AS (
  SELECT doc_id, n_url, n_email,
         len(regexp_extract_all(text,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
         regexp_replace(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                        '<IP>', 'g') AS text
  FROM s2
), s4 AS (
  SELECT doc_id, n_url, n_email, n_ipv4,
         len(regexp_extract_all(text, '\+\d[\d \-]{6,}\d\b')) AS n_phone,
         regexp_replace(text, '\+\d[\d \-]{6,}\d\b', '<PHONE>', 'g') AS text
  FROM s3
)
SELECT doc_id, n_url, n_email, n_ipv4, n_phone, md5(text) AS scrub_md5
FROM s4
"""


def q_repetition(spark, sf_dir):
    """Within-document repetition counts (Gopher-style repetition filter
    inputs): distinct-vs-total word occurrences and 3-gram occurrences.
    Integer counts, not the ratio, so the hash is FP-safe; the ratio reader
    is dup_ngram_fraction_expr (operators/text.py)."""
    d = load(spark, sf_dir, "documents")
    # staged projections: tokens and 3-grams are each multiply-referenced
    # non-cheap expressions — staging keeps CollapseProject from rebuilding
    # the tokenize/gram chain once per reference (measured 31x at sf0.1)
    toks = d.select("doc_id", tx.tokens_expr("text").alias("__t"))
    grams = toks.select(
        "doc_id",
        "__t",
        tx.word_ngrams_expr("__t", 3, pretokenized=True).alias("__g3"),
    )
    return grams.select(
        "doc_id",
        F.size("__t").alias("n_words"),
        F.size(F.array_distinct("__t")).alias("n_distinct_words"),
        F.size("__g3").alias("n_3grams"),
        F.size(F.array_distinct("__g3")).alias("n_distinct_3grams"),
    )


ORACLE_REPETITION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS t
  FROM documents
), grams AS (
  SELECT doc_id, t,
         CASE WHEN len(t) < 3 THEN []::VARCHAR[]
              ELSE list_transform(range(1, len(t) - 1),
                                  i -> array_to_string(t[i:i+2], ' '))
         END AS g3
  FROM toks
)
SELECT doc_id,
       len(t) AS n_words,
       len(list_distinct(t)) AS n_distinct_words,
       len(g3) AS n_3grams,
       len(list_distinct(g3)) AS n_distinct_3grams
FROM grams
"""


def q_dataset_split(spark, sf_dir):
    """Deterministic train/valid/test assignment (80/10/10) by doc_id hash
    (operators/sampling.py:dataset_split).  Unlike df.randomSplit, re-running
    reproduces the assignment bit-for-bit on any partitioning, and appending
    data never moves an existing row between splits."""
    d = load(spark, sf_dir, "documents")
    out = smp.dataset_split(
        d, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}, salt=11
    )
    return out.select("doc_id", "split")


ORACLE_DATASET_SPLIT = f"""
SELECT doc_id,
       {smp.split_sql("doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}, salt=11)}
           AS split
FROM documents
"""


def q_bloom_dedup(spark, sf_dir):
    """Content-hash dedup of a corpus against a reference shard via
    Bloom-prefiltered anti-join (operators/bloom.py): the doc_id%3==0 slice
    stands in for an already-ingested corpus; survivors are documents whose
    content key is absent from it.  Only the bloom-hit sliver of the corpus
    enters the exact verify join, so the corpus side stays map-only — the
    result is still EXACTLY the plain anti-join, which is what the oracle
    checks."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    keyed = d.select(
        "doc_id",
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("long")
        .alias("content_key"),
    )
    ref = keyed.where(F.col("doc_id") % 3 == 0).select("content_key")
    kept = bloom_anti_join(
        keyed, ref, on="content_key", expected_ref_keys=4096
    )
    return kept.select("doc_id", "content_key")


ORACLE_BLOOM_DEDUP = """
WITH keyed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS content_key
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, content_key FROM keyed
WHERE content_key NOT IN
      (SELECT content_key FROM keyed WHERE doc_id % 3 = 0)
"""


def q_line_dedup(spark, sf_dir):
    """CCNet-style cross-document line dedup (operators/dedup.py:
    drop_repeated_lines).  The corpus is reflowed deterministically into
    4-line pages — a near-unique lead (80-char text prefix), a cookie banner
    shared by every page, a per-source footer, and a short structural line —
    so the operator must drop exactly the corpus-repeated substantive lines
    and reassemble the rest in order."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    pages = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.substring("text", 1, 80),
            F.lit("This site uses cookies to improve your experience"),
            F.concat(F.lit("Footer for "), F.col("source")),
            F.lit("ok"),
        ).alias("text"),
    )
    out = dd.drop_repeated_lines(
        pages, max_occurrences=1, min_line_chars=10
    )
    return out.select("doc_id", "text", "n_lines_kept", "n_lines_dropped")


ORACLE_LINE_DEDUP = r"""
WITH pages AS (
  SELECT doc_id,
         substr(text, 1, 80) || chr(10) ||
         'This site uses cookies to improve your experience' || chr(10) ||
         'Footer for ' || source || chr(10) || 'ok' AS text
  FROM documents WHERE text IS NOT NULL
), lines AS (
  SELECT doc_id, CAST(u.l[2] AS BIGINT) AS pos, u.l[1] AS line
  FROM pages, unnest(list_zip(string_split(text, chr(10)),
                     range(0, len(string_split(text, chr(10)))))) AS u(l)
), boiler AS (
  SELECT line FROM lines
  WHERE len(trim(line)) >= 10
  GROUP BY line HAVING count(*) > 1
), survivors AS (
  SELECT doc_id, pos, line FROM lines
  WHERE len(trim(line)) < 10
     OR line NOT IN (SELECT line FROM boiler)
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
         count(*) AS n_kept
  FROM survivors GROUP BY doc_id
)
SELECT p.doc_id,
       coalesce(r.clean, '') AS text,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
       CAST(len(string_split(p.text, chr(10))) - coalesce(r.n_kept, 0)
            AS BIGINT) AS n_lines_dropped
FROM pages p LEFT JOIN rebuilt r USING (doc_id)
"""


def q_span_dedup(spark, sf_dir):
    """ExactSubstr-style duplicated token-span removal
    (operators/dedup.py:drop_repeated_spans).  Pages are a near-unique
    60-char lead from the document text, a 12-token terms-of-service
    sentence shared by every page (cut everywhere), and a per-source
    footer phrase (duplicated across each source's docs — and it crosses
    into the shared sentence's context differently per doc, so only the
    true duplicated windows are marked).  Catches boilerplate embedded
    mid-sentence that line-dedup (q_line_dedup) cannot see."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    pages = d.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.substring(
                F.trim(F.regexp_replace("text", r"\s+", " ")), 1, 60
            ),
            F.lit(
                "terms of service apply to all content on this site"
                " without exception"
            ),
            F.concat(F.lit("footer block for source "), F.col("source")),
        ).alias("text"),
    )
    out = dd.drop_repeated_spans(widen(pages, spark), k=8, max_occurrences=1)
    return out.select(
        "doc_id", "n_tokens", "dup_tokens", "n_dup_spans", "text"
    )


ORACLE_SPAN_DEDUP = r"""
WITH pages AS (
  SELECT doc_id,
         substr(trim(regexp_replace(text, '\s+', ' ', 'g')), 1, 60)
         || ' terms of service apply to all content on this site without exception'
         || ' footer block for source ' || source AS page
  FROM documents WHERE text IS NOT NULL
), toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(page, '\s+', ' ', 'g')), ' ') AS tk
  FROM pages
), grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         CAST(('0x' || substr(md5(array_to_string(tk[i+1:i+8], ' ')), 1, 15))
              AS BIGINT) AS gram_h
  FROM toks, unnest(range(0, greatest(len(tk) - 7, 0))) AS t(i)
), dup AS (
  SELECT gram_h FROM grams GROUP BY gram_h HAVING count(*) > 1
), marked AS (
  SELECT doc_id, pos, pos + 7 AS endpos
  FROM grams WHERE gram_h IN (SELECT gram_h FROM dup)
), flagged AS (
  SELECT doc_id, pos, endpos,
         CASE WHEN pos > coalesce(max(endpos) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS ns
  FROM marked
), sids AS (
  SELECT doc_id, pos, endpos,
         sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM flagged
), merged AS (
  SELECT doc_id, sid, min(pos) AS s, max(endpos) AS e
  FROM sids GROUP BY doc_id, sid
), spanstats AS (
  SELECT doc_id, sum(e - s + 1) AS dup_tokens, count(*) AS n_dup_spans
  FROM merged GROUP BY doc_id
), tokpos AS (
  SELECT doc_id, u.z[1] AS tok, CAST(u.z[2] AS BIGINT) AS p
  FROM toks, unnest(list_zip(tk, range(0, len(tk)))) AS u(z)
), kept AS (
  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.p) AS clean
  FROM tokpos t LEFT JOIN merged m
    ON t.doc_id = m.doc_id AND t.p BETWEEN m.s AND m.e
  WHERE m.s IS NULL
  GROUP BY t.doc_id
)
SELECT t.doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(coalesce(ss.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(coalesce(ss.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       coalesce(k.clean, '') AS text
FROM toks t
LEFT JOIN spanstats ss USING (doc_id)
LEFT JOIN kept k ON t.doc_id = k.doc_id
"""


def q_incremental_mv(spark, sf_dir):
    """Incremental materialized-view maintenance
    (operators/transactional.py:apply_aggregate_delta): build a grouped
    SUM/COUNT view at snapshot v1, churn the table (range delete + derived
    appends), then refresh the view FROM THE CHANGE FEED ONLY — shuffle
    proportional to churned rows, not the table.  Long-cents measures keep
    the maintained view bit-identical to a full recompute; the oracle
    aggregates the declaratively-derived final state directly."""
    import shutil
    import tempfile

    from carto_etl_spark.operators.transactional import (
        TransactionalTable,
        apply_aggregate_delta,
    )

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 97).alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    workdir = tempfile.mkdtemp(prefix="inc-mv-")
    try:
        t = TransactionalTable(
            spark, f"{workdir}/t", stats_columns=["o_orderkey"]
        )
        t.append(o)
        v1 = t.version()
        mv1 = (
            t.read(v1)
            .groupBy("grp")
            .agg(
                F.sum("cents").alias("cents"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            )
            .localCheckpoint()
        )
        t.delete_where("o_orderkey", lo=1000, hi=50000)
        t.append(
            o.where(F.col("o_orderkey") % 13 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "grp",
                (F.col("cents") + 555).alias("cents"),
            )
        )
        out = apply_aggregate_delta(mv1, t.diff(v1), ["grp"], ["cents"])
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_INCREMENTAL_MV = """
WITH base AS (
  SELECT o_orderkey, o_custkey % 97 AS grp,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), final AS (
  SELECT * FROM base WHERE o_orderkey < 1000 OR o_orderkey > 50000
  UNION ALL
  SELECT o_orderkey + 100000000, grp, cents + 555
  FROM base WHERE o_orderkey % 13 = 0
)
SELECT grp, CAST(sum(cents) AS BIGINT) AS cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM final GROUP BY grp
"""


def q_lm_fluency(spark, sf_dir):
    """Bigram language-model fluency scoring (operators/text.py:
    bigram_lm_scores — CCNet-style corpus-quality gate): train add-one-
    smoothed bigram counts on every third document, score the rest by mean
    bigram surprisal.  Per-bigram -log2 p is rounded to 6dp and decimal-
    cast BEFORE the per-doc sum, so the aggregate is partition-order-proof
    and the one libm call per term cannot accumulate ulp drift."""
    from carto_etl_spark.operators.text import bigram_lm_scores

    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    train = d.where(F.col("doc_id") % 3 == 0)
    score = d.where(F.col("doc_id") % 3 != 0)
    return bigram_lm_scores(train, score)


def _oracle_lm_fluency():
    from carto_etl_spark.operators.text import bigram_lm_oracle_sql

    return bigram_lm_oracle_sql(
        "SELECT doc_id, text FROM documents"
        " WHERE text IS NOT NULL AND doc_id % 3 = 0",
        "SELECT doc_id, text FROM documents"
        " WHERE text IS NOT NULL AND doc_id % 3 != 0",
    )


def q_hll_grouped(spark, sf_dir):
    """Per-GROUP HyperLogLog registers (sketch.hll_build_grouped): distinct
    ordering customers per order priority — the groupBy form of the
    cardinality sketch, whose map-side partial max keeps the shuffle at
    <= groups * 2^p rows no matter how many fact rows scan.  The catalog
    hashes the grouped register table; per-group FP estimates are
    bound-asserted in pytest like the global entry."""
    from carto_etl_spark.operators.sketch import hll_build_grouped

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_custkey").cast("string").alias("item"),
    )
    return hll_build_grouped(o, ["g"], "item", p=8)


def _oracle_hll_grouped() -> str:
    from carto_etl_spark.operators.sketch import hll_grouped_registers_oracle_sql

    return hll_grouped_registers_oracle_sql(
        "SELECT o_orderpriority AS g, CAST(o_custkey AS VARCHAR) AS item "
        "FROM orders",
        p=8,
    )


def q_hll_registers(spark, sf_dir):
    """HyperLogLog distinct-count REGISTERS (operators/sketch.py hll_build):
    fixed-size mergeable cardinality state over the ordering-customer keys
    of the fact table (a many-rows/many-distinct column that touches
    essentially every one of the 1024 registers) — the third sketch leg
    beside bloom membership and CMS frequency.  The catalog hashes the
    register TABLE (bucket, max_rho), which the oracle re-derives exactly
    from the same md5-prefix hash, shift, and minimal-length bin()
    arithmetic; the FP estimate derived from these registers is asserted
    in-engine (tests/test_sketch.py) against exact distinct counts, within
    the 1.04/sqrt(m) bound."""
    from carto_etl_spark.operators.sketch import hll_build

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("item")
    )
    return hll_build(o, "item", p=10)


ORACLE_HLL_REGISTERS = r"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
           AS hv
  FROM orders WHERE o_custkey IS NOT NULL
), reg AS (
  SELECT CAST(hv % 1024 AS INT) AS bucket,
         CAST(CASE WHEN (hv >> 10) = 0 THEN 51
              ELSE 51 - length(bin(hv >> 10)) END AS INT) AS rho
  FROM h
)
SELECT bucket, CAST(max(rho) AS INT) AS max_rho
FROM reg GROUP BY bucket
"""


def q_streaming_cardinality(spark, sf_dir):
    """Streaming HLL state (streaming/cardinality.py): the orders table is
    replayed as THREE micro-batches (split on o_orderkey % 3) through
    ``track_cardinality``; the final register state must equal the one-shot
    batch build — register-max merge is associative and idempotent — so the
    SAME exact-register oracle as hll_registers verifies a genuinely
    streaming, crash-promoted pipeline value-for-value."""
    import shutil
    import tempfile

    from carto_etl_spark.streaming.cardinality import (
        load_cardinality_registers,
        track_cardinality,
    )

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").cast("string").alias("item")
    )
    workdir = tempfile.mkdtemp(prefix="hllstream-")
    try:
        src = f"{workdir}/src"
        for i in range(3):
            o.filter(F.col("o_orderkey") % 3 == i).write.mode(
                "overwrite"
            ).parquet(f"{src}/b{i}")
        stream = spark.readStream.schema(
            "o_orderkey long, item string"
        ).option("recursiveFileLookup", "true").parquet(src)
        q = track_cardinality(
            stream, "item", state_dir=f"{workdir}/state", p=10,
            checkpoint=f"{workdir}/ck",
        )
        q.awaitTermination(300)
        out = load_cardinality_registers(spark, f"{workdir}/state")
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def q_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters (operators/sketch.py): build the
    4x512 sketch over every corpus token (fixed-size mergeable state — the
    map-side partial agg IS the per-partition sketch merge), then point-
    query it for the exact top-20 tokens.  The oracle recomputes the whole
    sketch cell table from the same md5 bucket arithmetic, so the
    ESTIMATES are value-checked, not just bounded."""
    from carto_etl_spark.operators.sketch import cms_build, cms_estimate
    from carto_etl_spark.operators.text import tokens_expr

    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = d.select(F.explode(tokens_expr(F.col("text"))).alias("item"))
    sketch = cms_build(toks, "item", depth=4, width=512)
    top = (
        toks.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("item"))
        .limit(20)
    )
    out = cms_estimate(sketch, top, "item", depth=4, width=512)
    return out.select(
        F.col("item").alias("token"), "exact_n", "cms_estimate"
    )


ORACLE_HEAVY_HITTERS = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                x -> x != '')) AS item
  FROM documents WHERE text IS NOT NULL
), cells AS (
  SELECT s.s AS seed,
         CAST(('0x' || substr(md5(CAST(s.s AS VARCHAR) || ':' || item),
               1, 15)) AS BIGINT) % 512 AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM toks, unnest(range(0, 4)) AS s(s)
  GROUP BY 1, 2
), top AS (
  SELECT item, CAST(count(*) AS BIGINT) AS exact_n
  FROM toks GROUP BY item
  ORDER BY exact_n DESC, item ASC LIMIT 20
), probes AS (
  SELECT t.item, t.exact_n, s.s AS seed,
         CAST(('0x' || substr(md5(CAST(s.s AS VARCHAR) || ':' || t.item),
               1, 15)) AS BIGINT) % 512 AS bucket
  FROM top t, unnest(range(0, 4)) AS s(s)
)
SELECT p.item AS token, p.exact_n,
       min(coalesce(c.n, 0)) AS cms_estimate
FROM probes p LEFT JOIN cells c ON p.seed = c.seed AND p.bucket = c.bucket
GROUP BY p.item, p.exact_n
"""


def q_image_features(spark, sf_dir):
    """Real PNG decode under the oracle gate: synthesize a deterministic
    gradient PNG per document (multimodal.py:synth_gradient_png_expr —
    filter type cycles None/Sub/Up with doc_id), decode with the stdlib
    zlib+numpy PNG operator, emit per-channel means.  Pixel values sweep
    (id*7 + c*31 + k) % 256 for k = 0..127, so each mean is an integer sum
    the oracle recomputes exactly; the float32 feature slot is re-created
    with a REAL cast on the oracle side (single rounding on both engines)."""
    from carto_etl_spark.operators.multimodal import (
        decode_image_features,
        synth_gradient_png_expr,
    )

    d = widen(load(spark, sf_dir, "documents"), spark).select(
        F.col("doc_id").alias("media_id")
    )
    src = d.withColumn("content", synth_gradient_png_expr(F.col("media_id")))
    feats = decode_image_features(src)
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_channels",
        F.element_at("feature", 1).cast("double").alias("r_mean"),
        F.element_at("feature", 2).cast("double").alias("g_mean"),
        F.element_at("feature", 3).cast("double").alias("b_mean"),
    )


ORACLE_IMAGE = """
WITH means AS (
  SELECT d.doc_id AS media_id, c.c AS c,
         CAST(CAST(
             CAST(SUM((d.doc_id * 7 + c.c * 31 + px.k) % 256) AS DOUBLE)
             / 128.0 / 255.0
         AS REAL) AS DOUBLE) AS m
  FROM documents d, (VALUES (0), (1), (2)) c(c), range(0, 128) px(k)
  GROUP BY d.doc_id, c.c
)
SELECT media_id,
       CAST(16 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       MAX(CASE WHEN c = 0 THEN m END) AS r_mean,
       MAX(CASE WHEN c = 1 THEN m END) AS g_mean,
       MAX(CASE WHEN c = 2 THEN m END) AS b_mean
FROM means GROUP BY media_id
"""


def q_gif_features(spark, sf_dir):
    """Real GIF decode under the oracle gate: a deterministic 16-color
    palette GIF per document (multimodal.py:synth_palette_gif_expr), decoded
    by the stdlib LZW operator; pixel index (id+k)%16 and palette value
    (j*37+c*11)%256 make every channel mean an integer sum the oracle
    recomputes exactly."""
    from carto_etl_spark.operators.multimodal import (
        decode_image_features,
        synth_palette_gif_expr,
    )

    d = widen(load(spark, sf_dir, "documents"), spark).select(
        F.col("doc_id").alias("media_id")
    )
    src = d.withColumn("content", synth_palette_gif_expr(F.col("media_id")))
    feats = decode_image_features(src)
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_channels",
        F.element_at("feature", 1).cast("double").alias("r_mean"),
        F.element_at("feature", 2).cast("double").alias("g_mean"),
        F.element_at("feature", 3).cast("double").alias("b_mean"),
    )


ORACLE_GIF = """
WITH means AS (
  SELECT d.doc_id AS media_id, c.c AS c,
         CAST(CAST(
             CAST(SUM((((d.doc_id + px.k) % 16) * 37 + c.c * 11) % 256)
                  AS DOUBLE) / 120.0 / 255.0
         AS REAL) AS DOUBLE) AS m
  FROM documents d, (VALUES (0), (1), (2)) c(c), range(0, 120) px(k)
  GROUP BY d.doc_id, c.c
)
SELECT media_id,
       CAST(12 AS INTEGER) AS width,
       CAST(10 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       MAX(CASE WHEN c = 0 THEN m END) AS r_mean,
       MAX(CASE WHEN c = 1 THEN m END) AS g_mean,
       MAX(CASE WHEN c = 2 THEN m END) AS b_mean
FROM means GROUP BY media_id
"""


def q_jpeg_features(spark, sf_dir):
    """Real baseline-JPEG decode under the oracle gate: a constant-color
    8x8 JPEG per document (multimodal.py:synth_const_jpeg_expr — DC-only
    blocks, unit quantization), decoded by the stdlib+numpy codec.  Every
    decode stage collapses to closed-form arithmetic on one value per
    channel — DC dequant, single-product IDCT (b0*DC*b0 with
    b0=0.5/sqrt(2)), the +128/-128 storage round-trip, YCbCr->RGB, and
    HALF-EVEN rounding (numpy's round; DuckDB mirrors with round_even) —
    so the oracle recomputes the decoded channel means exactly."""
    from carto_etl_spark.operators.multimodal import (
        decode_image_features,
        synth_const_jpeg_expr,
    )

    d = widen(load(spark, sf_dir, "documents"), spark).select(
        F.col("doc_id").alias("media_id")
    )
    src = d.withColumn("content", synth_const_jpeg_expr(F.col("media_id")))
    feats = decode_image_features(src)
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_channels",
        F.element_at("feature", 1).cast("double").alias("r_mean"),
        F.element_at("feature", 2).cast("double").alias("g_mean"),
        F.element_at("feature", 3).cast("double").alias("b_mean"),
    )


ORACLE_JPEG = """
WITH rgb AS (
  SELECT doc_id, (doc_id * 7) % 256 AS r0, (doc_id * 13) % 256 AS g0,
         (doc_id * 29) % 256 AS b0i
  FROM documents
), yc AS (
  SELECT *, 0.299 * r0 + 0.587 * g0 + 0.114 * b0i AS y,
         -0.168736 * r0 - 0.331264 * g0 + 0.5 * b0i + 128.0 AS cb,
         0.5 * r0 - 0.418688 * g0 - 0.081312 * b0i + 128.0 AS cr
  FROM rgb
), rec AS (
  SELECT doc_id,
    ((0.5 * (1.0 / sqrt(2.0))) * round_even(8.0 * (y - 128.0), 0))
        * (0.5 * (1.0 / sqrt(2.0))) + 128.0 AS yp,
    (((0.5 * (1.0 / sqrt(2.0))) * round_even(8.0 * (cb - 128.0), 0))
        * (0.5 * (1.0 / sqrt(2.0))) + 128.0) - 128.0 AS cbp,
    (((0.5 * (1.0 / sqrt(2.0))) * round_even(8.0 * (cr - 128.0), 0))
        * (0.5 * (1.0 / sqrt(2.0))) + 128.0) - 128.0 AS crp
  FROM yc
), px AS (
  SELECT doc_id,
    LEAST(255.0, GREATEST(0.0, round_even(yp + 1.402 * crp, 0))) AS rr,
    LEAST(255.0, GREATEST(0.0,
        round_even(yp - 0.344136 * cbp - 0.714136 * crp, 0))) AS gg,
    LEAST(255.0, GREATEST(0.0, round_even(yp + 1.772 * cbp, 0))) AS bb
  FROM rec
)
SELECT doc_id AS media_id,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(CAST(rr / 255.0 AS REAL) AS DOUBLE) AS r_mean,
       CAST(CAST(gg / 255.0 AS REAL) AS DOUBLE) AS g_mean,
       CAST(CAST(bb / 255.0 AS REAL) AS DOUBLE) AS b_mean
FROM px
"""


def q_video_frames(spark, sf_dir):
    """Video frame sampling under the oracle gate (multimodal.py
    sample_video_frames): a 4-frame Motion-JPEG per document — each frame a
    constant-color baseline JPEG keyed (doc_id*8 + frame) — is frame-split
    on SOI/EOI marker boundaries and only every 2nd frame (0, 2) is
    DECODED, the point of sampling being to skip the decode cost of the
    rest.  Each sampled frame's decode collapses to the same closed-form
    per-channel arithmetic as q_jpeg_features, so the oracle recomputes the
    sampled frames' means exactly (union over the two frame indices)."""
    from carto_etl_spark.operators.multimodal import (
        sample_video_frames,
        synth_const_jpeg_expr,
    )

    d = widen(load(spark, sf_dir, "documents"), spark).select(
        F.col("doc_id").alias("media_id")
    )
    mid = F.col("media_id")
    src = d.withColumn(
        "content",
        F.concat(*[synth_const_jpeg_expr(mid * 8 + f) for f in range(4)]),
    )
    frames = sample_video_frames(src, every_n=2)
    return frames.select(
        "media_id",
        "frame_idx",
        "width",
        "height",
        "n_channels",
        F.element_at("feature", 1).cast("double").alias("r_mean"),
        F.element_at("feature", 2).cast("double").alias("g_mean"),
        F.element_at("feature", 3).cast("double").alias("b_mean"),
    )


def _video_frame_oracle_select(frame: int) -> str:
    """The ORACLE_JPEG closed-form decode arithmetic with the per-frame
    key (doc_id*8 + frame) substituted, emitting frame_idx."""
    return f"""
WITH rgb AS (
  SELECT doc_id, ((doc_id * 8 + {frame}) * 7) % 256 AS r0,
         ((doc_id * 8 + {frame}) * 13) % 256 AS g0,
         ((doc_id * 8 + {frame}) * 29) % 256 AS b0i
  FROM documents
), yc AS (
  SELECT *, 0.299 * r0 + 0.587 * g0 + 0.114 * b0i AS y,
         -0.168736 * r0 - 0.331264 * g0 + 0.5 * b0i + 128.0 AS cb,
         0.5 * r0 - 0.418688 * g0 - 0.081312 * b0i + 128.0 AS cr
  FROM rgb
), rec AS (
  SELECT doc_id,
    ((0.5 * (1.0 / sqrt(2.0))) * round_even(8.0 * (y - 128.0), 0))
        * (0.5 * (1.0 / sqrt(2.0))) + 128.0 AS yp,
    (((0.5 * (1.0 / sqrt(2.0))) * round_even(8.0 * (cb - 128.0), 0))
        * (0.5 * (1.0 / sqrt(2.0))) + 128.0) - 128.0 AS cbp,
    (((0.5 * (1.0 / sqrt(2.0))) * round_even(8.0 * (cr - 128.0), 0))
        * (0.5 * (1.0 / sqrt(2.0))) + 128.0) - 128.0 AS crp
  FROM yc
), px AS (
  SELECT doc_id,
    LEAST(255.0, GREATEST(0.0, round_even(yp + 1.402 * crp, 0))) AS rr,
    LEAST(255.0, GREATEST(0.0,
        round_even(yp - 0.344136 * cbp - 0.714136 * crp, 0))) AS gg,
    LEAST(255.0, GREATEST(0.0, round_even(yp + 1.772 * cbp, 0))) AS bb
  FROM rec
)
SELECT doc_id AS media_id,
       CAST({frame} AS INTEGER) AS frame_idx,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(CAST(rr / 255.0 AS REAL) AS DOUBLE) AS r_mean,
       CAST(CAST(gg / 255.0 AS REAL) AS DOUBLE) AS g_mean,
       CAST(CAST(bb / 255.0 AS REAL) AS DOUBLE) AS b_mean
FROM px
"""


ORACLE_VIDEO_FRAMES = (
    "SELECT * FROM (" + _video_frame_oracle_select(0) + ") f0 "
    "UNION ALL SELECT * FROM (" + _video_frame_oracle_select(2) + ") f2"
)


def q_tfidf_terms(spark, sf_dir):
    """Top-3 most distinctive terms per document by tf/(1+df) — linear-idf
    TF-IDF ranking (operators/text.py:tfidf_topk; docstring explains why the
    score avoids ln: JVM Math.log and libm disagree in the last ulp, a
    single IEEE division does not)."""
    d = load(spark, sf_dir, "documents")
    return tx.tfidf_topk(d, "text", "doc_id", k=3)


ORACLE_TFIDF = r"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              x -> x != '')) AS term
    FROM documents
  ) GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)
SELECT doc_id, term, tf, df, tf / (1.0 + df) AS score
FROM tf JOIN dfreq USING (term)
QUALIFY row_number() OVER (
    PARTITION BY doc_id ORDER BY tf / (1.0 + df) DESC, term ASC) <= 3
"""


def q_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional trade volume between two nations by
    ship year.  Fact-side joins stay sort-merge; the two nation dims
    broadcast; the pair filter collapses the join output before the
    aggregate."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ))
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n1, s.s_nationkey == F.col("s_nk"))
        .join(n2, c.c_nationkey == F.col("c_nk"))
        .where(pair_ok)
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


ORACLE_Q7 = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned items in
    a one-year window; deterministic ordering via (rounded revenue desc,
    custkey)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: promotional revenue share over a ship-date window —
    conditional aggregation after a part-dim broadcast join."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = F.broadcast(load(spark, sf_dir, "part"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(p, li.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
            / F.sum(vol),
            6,
        ).alias("promo_share")
    )


ORACLE_Q14 = """
SELECT round(
         100.0 * sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0.0 END)
         / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: per-nation count and balance of customers whose
    account balance beats the positive-balance average but who have placed no
    order since 2000-06-01 (the driver corpus gives every customer SOME
    order, so dormancy, not absence, is the discriminating predicate).
    Decorrelated: the scalar average broadcasts as a one-row cross join; the
    no-recent-orders predicate is an anti-join.  All money math runs in
    exact integer cents (floored integer-cent threshold) so the cut is
    bit-identical in any engine — a double average's partial-agg ordering is
    not."""
    c = load(spark, sf_dir, "customer").withColumn(
        "cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "2000-06-01"
    )
    # floor() on the double quotient on BOTH sides: DuckDB's double->bigint
    # cast rounds to nearest while Spark's truncates, so the cast alone
    # would disagree whenever the average is fractional
    thr = c.where(F.col("cents") > 0).agg(
        F.floor(F.sum("cents") / F.count(F.lit(1))).cast("long").alias("thr_cents")
    )
    rich = c.join(F.broadcast(thr), how="cross").where(F.col("cents") > F.col("thr_cents"))
    idle = rich.join(
        o.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        on="c_custkey",
        how="left_anti",
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("cents").alias("total_cents"),
        )
    )


ORACLE_Q22 = """
WITH c AS (
  SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer
), thr AS (
  SELECT CAST(floor(sum(cents) / count(*)) AS BIGINT) AS thr_cents
  FROM c WHERE cents > 0
)
SELECT c_nationkey, count(*) AS numcust, sum(cents) AS total_cents
FROM c, thr
WHERE cents > thr_cents
  AND c_custkey NOT IN
      (SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY c_nationkey
"""


def q_funnel(spark, sf_dir):
    """Ordered view->click->purchase funnel over events: per-user earliest
    step-completion times (each step strictly after the previous) rolled up
    to per-step conversion counts (operators/funnel.py — one shuffle for the
    whole N-step window chain)."""
    from carto_etl_spark.operators.funnel import funnel_report

    e = load(spark, sf_dir, "events")
    return funnel_report(e, ["view", "click", "purchase"])


ORACLE_FUNNEL = """
WITH s1 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                OVER (PARTITION BY user_id) AS t1
  FROM events
), s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                OVER (PARTITION BY user_id) AS t2
  FROM s1
), s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                OVER (PARTITION BY user_id) AS t3
  FROM s2
), u AS (
  SELECT DISTINCT user_id, t1, t2, t3 FROM s3
)
SELECT 1 AS step, 'view' AS event_type, count(t1) AS n_users FROM u
UNION ALL
SELECT 2, 'click', count(t2) FROM u
UNION ALL
SELECT 3, 'purchase', count(t3) FROM u
"""


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention over events: distinct users per (first-event
    week, activity-week offset) — operators/funnel.py:cohort_retention."""
    from carto_etl_spark.operators.funnel import cohort_retention

    e = load(spark, sf_dir, "events")
    return cohort_retention(e)


ORACLE_COHORT = """
WITH f AS (
  SELECT *, min(ts) OVER (PARTITION BY user_id) AS first_ts FROM events
), s AS (
  SELECT user_id,
         strftime(date_trunc('week', first_ts), '%Y-%m-%d') AS cohort_week,
         CAST(datediff('day', date_trunc('week', first_ts),
                       date_trunc('week', ts)) / 7 AS INTEGER) AS week_offset
  FROM f
)
SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_users
FROM s GROUP BY cohort_week, week_offset
"""


def q_frequent_ngrams(spark, sf_dir):
    """Corpus-frequency top-20 word 3-grams (boilerplate mining / stop-phrase
    discovery input): explode → partial-agg count → global top-k with a
    deterministic (count desc, ngram asc) order."""
    d = widen(load(spark, sf_dir, "documents"), spark)
    grams = d.select(
        F.explode(tx.word_ngrams_expr("text", 3)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram").asc())
        .limit(20)
    )


ORACLE_FREQ_NGRAMS = r"""
WITH toks AS (
  SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS t
  FROM documents
), grams AS (
  SELECT unnest(CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                     ELSE list_transform(range(1, len(t) - 1),
                                         i -> array_to_string(t[i:i+2], ' '))
                END) AS ngram
  FROM toks
)
SELECT ngram, count(*) AS n FROM grams
GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 20
"""


def q_cow_dml(spark, sf_dir):
    """Copy-on-write DML end-to-end (operators/transactional.py): append two
    stats-tracked commits, UPSERT a keyed update set (matched customers
    renamed + rebalanced, a synthetic key inserted), then range-DELETE a
    c_custkey band — the final snapshot must equal the declarative
    insert→merge→delete the oracle computes.  Exercises stats-pruned file
    rewrite, additive merge semantics, and null-range survival, not just the
    query layer."""
    import shutil
    import tempfile

    from carto_etl_spark.operators.transactional import TransactionalTable

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    workdir = tempfile.mkdtemp(prefix="cow-dml-")
    try:
        t = TransactionalTable(
            spark, f"{workdir}/t", stats_columns=["c_custkey"]
        )
        t.append(c.filter(F.col("c_custkey") % 2 == 0))
        t.append(c.filter(F.col("c_custkey") % 2 == 1))
        updates = c.filter(F.col("c_custkey") % 7 == 0).select(
            "c_custkey",
            F.concat(F.lit("UPD_"), F.col("c_name")).alias("c_name"),
            F.round(F.col("c_acctbal") + 500.0, 2).alias("c_acctbal"),
        ).unionByName(
            spark.sql(
                "SELECT CAST(9000001 AS BIGINT) c_custkey, "
                "'INSERTED' c_name, CAST(1.23 AS DOUBLE) c_acctbal"
            )
        )
        t.upsert(updates, key="c_custkey")
        t.delete_where("c_custkey", lo=100, hi=199)
        out = t.read()
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_COW_DML = """
WITH base AS (
  SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal FROM customer
), merged AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'UPD_' || c_name ELSE c_name END
             AS c_name,
         CASE WHEN c_custkey % 7 = 0 THEN round(round(c_acctbal, 2) + 500.0, 2)
              ELSE round(c_acctbal, 2) END AS c_acctbal
  FROM base
  UNION ALL
  SELECT 9000001, 'INSERTED', 1.23
)
SELECT * FROM merged
WHERE c_custkey < 100 OR c_custkey > 199
"""


def q_range_join(spark, sf_dir):
    """Interval-containment join via the bucketed equi-join operator
    (operators/joins.py:range_join): 40 price bands of width 5000 against
    order total prices — Catalyst plans a hash join on the bucket key
    instead of a nested loop, then the exact containment filter applies.
    Emits per-band counts plus min/max order keys for value-level
    coverage."""
    from carto_etl_spark.operators.joins import range_join

    bands = spark.range(0, 40).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 5000).cast("double").alias("lo"),
        ((F.col("id") + 1) * 5000).cast("double").alias("hi"),
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    joined = range_join(
        bands, o, start="lo", end="hi", point="o_totalprice", bucket_width=5000
    )
    return (
        joined.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


ORACLE_RANGE_JOIN = """
SELECT b.range AS band_id, count(*) AS n_orders,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
FROM range(0, 40) b
JOIN orders ON o_totalprice >= b.range * 5000.0
           AND o_totalprice < (b.range + 1) * 5000.0
GROUP BY b.range
"""


def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: single-table filtered aggregate — the canonical
    predicate-pushdown + partial-agg benchmark.  One row out."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


ORACLE_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


def q_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of customers by order count, including
    zero-order customers via a left outer join — then a second aggregation
    over the first's output (the classic two-level group-by)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total line quantity exceeds a threshold
    (HAVING over a fact aggregate), joined back to customer detail — the
    aggregate-then-semi-join decorrelation pattern."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


ORACLE_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150
)
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


def q_sliding_windows(spark, sf_dir):
    """Sliding-window aggregation (10-minute windows every 5 minutes): each
    event contributes to exactly two overlapping windows via F.window —
    the batch twin of the streaming sliding aggregate.  The oracle expands
    each event into its two window starts explicitly."""
    e = load(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ORACLE_SLIDING = """
WITH starts AS (
  SELECT event_type, value,
         CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS s1
  FROM events
), expanded AS (
  SELECT event_type, value, s1 AS s FROM starts
  UNION ALL
  SELECT event_type, value, s1 - 300 FROM starts
)
SELECT strftime(to_timestamp(s), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM expanded GROUP BY s, event_type
"""


def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_3's share of STANDARD-part revenue sold into EUROPE, by order year — the widest join in the catalog (lineitem ⋈
    orders ⋈ customer ⋈ supplier ⋈ part ⋈ nation×2 ⋈ region) with a
    conditional-share aggregate on top."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    n1 = F.broadcast(n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    # customer nations restricted to the target region
    n2r = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == "EUROPE")
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2r, c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n1, s.s_nationkey == F.col("s_nk"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                9,
            ).alias("mkt_share")
        )
    )


ORACLE_Q8 = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(CASE WHEN n1.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 9) AS mkt_share
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_type = 'STANDARD'
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n2.n_regionkey AND r_name = 'EUROPE'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
GROUP BY year(o_orderdate)
"""


def q_priority_with_big_lines(spark, sf_dir):
    """TPC-H Q4 shape: order-priority counts for orders with at least one
    high-quantity line in a quarter — EXISTS decorrelated to a left-semi
    join on the fact table."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        o.join(li.select("l_orderkey"), o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    the revenue 'view' is a fact aggregate (pinned once), and the
    max-selection is a single-row broadcast scalar attach (no global
    window, no second fact scan, no correlated subquery)."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    ).localCheckpoint(eager=False)
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    best = rev.crossJoin(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("__mx")
    )
    return best.join(s, best.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


ORACLE_Q15 = """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2)
             AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: average yearly revenue loss from small-quantity
    orders of STANDARD parts — the correlated per-part average decorrelates
    into a window over the part key (one shuffle, no self-join)."""
    li = load(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    )
    joined = li.join(p, li.l_partkey == p.p_partkey)
    w = Window.partitionBy("p_partkey")
    flagged = joined.withColumn("__avg_qty", F.avg("l_quantity").over(w))
    return flagged.where(
        F.col("l_quantity") < 0.5 * F.col("__avg_qty")
    ).agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


ORACLE_Q17 = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_type = 'STANDARD'
WHERE l_quantity < 0.5 * (
  SELECT avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
)
"""


def q_table_profile(spark, sf_dir):
    """One-pass table profiling (operators/stats.py:profile) over orders:
    per-column row/null/distinct counts and string-rendered min/max.  The
    double column is rounded to cents first so both engines print the same
    decimal text."""
    from carto_etl_spark.operators.stats import profile

    o = load(spark, sf_dir, "orders").withColumn(
        "o_totalprice", F.round("o_totalprice", 2)
    )
    return profile(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    )


ORACLE_PROFILE = """
SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
       count(*) - count(o_orderkey) AS n_nulls,
       count(DISTINCT o_orderkey) AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR) AS min_value,
       CAST(max(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
       count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus),
       min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
       count(DISTINCT round(o_totalprice, 2)),
       CAST(min(round(o_totalprice, 2)) AS VARCHAR),
       CAST(max(round(o_totalprice, 2)) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority),
       min(o_orderpriority), max(o_orderpriority)
FROM orders
"""


def q_ship_delay_priority(spark, sf_dir):
    """TPC-H Q12 shape (adapted: the schema has no ``l_shipmode`` or
    commit/receipt dates, so the grouping key is a ship-delay class derived
    from ``l_shipdate - o_orderdate``): per delay class, how many lines
    belong to critical-priority orders vs the rest.  The orders side
    projects only (key, date, priority) so the scan is three columns; the
    conditional counts are one partial-aggregable pass."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    delay_class = F.when(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.lit("LATE"),
    ).otherwise(F.lit("ON-TIME"))
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.select(
            delay_class.alias("ship_delay_class"),
            F.col("o_orderpriority"),
        )
        .groupBy("ship_delay_class")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY
            THEN 'LATE' ELSE 'ON-TIME' END AS ship_delay_class,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue from three OR-ed brand/size/quantity
    conjunctions.  The part side is pre-filtered to the UNION of the
    brand+size envelopes (a pushable scan predicate) and broadcast; the
    full disjunction — which ties ``l_quantity`` to the matching brand —
    is the join condition, so no lineitem row survives that any branch
    doesn't accept."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (
            (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
        )
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
    ).select("p_partkey", "p_brand", "p_size")
    cond = (li.l_partkey == p.p_partkey) & (
        (
            (p.p_brand == "Brand#12")
            & p.p_size.between(1, 5)
            & li.l_quantity.between(1, 11)
        )
        | (
            (p.p_brand == "Brand#23")
            & p.p_size.between(1, 10)
            & li.l_quantity.between(10, 20)
        )
        | (
            (p.p_brand == "Brand#3")
            & p.p_size.between(1, 15)
            & li.l_quantity.between(20, 30)
        )
    )
    return li.join(F.broadcast(p), cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


ORACLE_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (adapted: no commit/receipt dates, so "kept the
    order waiting" means the supplier's line shipped strictly later than
    every OTHER supplier's line in a multi-supplier order).  The classic
    formulation is an EXISTS plus a NOT EXISTS against the same fact table
    (two correlated self-joins); here both decorrelate into window
    aggregates over one ``l_orderkey`` partitioning — a single exchange of
    the fact table, no self-join at all.  A supplier wins an order iff its
    best line equals the order's max ship date and no other supplier
    attains that max; per-order supplier/at-max-supplier distinct counts
    are tiny ``collect_set`` states (bounded by lines-per-order)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey")
    marked = li.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn("max_ship", F.max("l_shipdate").over(w))
    marked = marked.withColumn(
        "n_last",
        F.size(
            F.collect_set(
                F.when(
                    F.col("l_shipdate") == F.col("max_ship"), F.col("l_suppkey")
                )
            ).over(w)
        ),
    )
    winners = marked.where(
        (F.col("n_supp") > 1)
        & (F.col("l_shipdate") == F.col("max_ship"))
        & (F.col("n_last") == 1)
    )
    counts = winners.groupBy("l_suppkey").agg(
        F.countDistinct("l_orderkey").alias("numwait")
    )
    return (
        counts.join(F.broadcast(s), counts.l_suppkey == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


ORACLE_Q21 = """
SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate >= l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q_chunk_documents(spark, sf_dir):
    """Context-window chunking (operators/text.py:chunk_documents): 64-token
    windows with stride 48 over the whitespace tokenization — map-side only
    (sequence/explode/slice, no shuffle, no UDF)."""
    from carto_etl_spark.operators.text import chunk_documents

    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, "text", ["doc_id"], window=64, stride=48)


ORACLE_CHUNK_DOCS = """
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
), sized AS (
  SELECT doc_id, toks, len(toks) AS n_tok,
         CASE WHEN len(toks) <= 64 THEN 1
              ELSE 1 + (len(toks) - 64 + 47) // 48 END AS n_chunks
  FROM base WHERE len(toks) > 0
)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       array_to_string(toks[i*48+1 : i*48+64], ' ') AS chunk_text,
       len(toks[i*48+1 : i*48+64]) AS chunk_tokens
FROM sized, UNNEST(generate_series(0, n_chunks - 1)) AS t(i)
"""


def q_data_quality(spark, sf_dir):
    """Data-quality constraint suite (operators/checks.py): seven
    expectations over orders — key not-null + uniqueness, price range,
    status domain, priority shape, order-date epoch, and o_custkey
    referential integrity against customer.  All six scalar constraints
    share ONE aggregate over ONE scan; the FK check broadcasts the distinct
    customer-key domain."""
    from carto_etl_spark.operators import checks as ck

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    rep = ck.run_checks(
        o,
        [
            ck.not_null("o_orderkey"),
            ck.unique("o_orderkey"),
            ck.in_range("o_totalprice", lo=0.0),
            ck.in_set("o_orderstatus", ["O", "F", "P"]),
            ck.matches("o_orderpriority", r"^[1-5]-[A-Z ]+$"),
            ck.satisfies(
                "orderdate_in_epoch",
                "o_orderdate >= TIMESTAMP'1992-01-01' "
                "AND o_orderdate < TIMESTAMP'2002-01-01'",
            ),
            ck.foreign_key("o_custkey", "customer", "c_custkey"),
        ],
        refs={"customer": c},
    )
    return rep.orderBy("check")


ORACLE_DATA_QUALITY = """
WITH n AS (SELECT count(*) AS n_rows FROM orders),
rep AS (
  SELECT 'not_null(o_orderkey)' AS "check", 'o_orderkey' AS target, n_rows,
         CAST((SELECT count(*) - count(o_orderkey) FROM orders) AS BIGINT)
           AS violations
  FROM n
  UNION ALL
  SELECT 'unique(o_orderkey)', 'o_orderkey', n_rows,
         CAST((SELECT count(o_orderkey) - count(DISTINCT o_orderkey)
               FROM orders) AS BIGINT)
  FROM n
  UNION ALL
  SELECT 'in_range(o_totalprice)', 'o_totalprice', n_rows,
         CAST((SELECT count(*) FROM orders
               WHERE o_totalprice IS NOT NULL AND o_totalprice < 0) AS BIGINT)
  FROM n
  UNION ALL
  SELECT 'in_set(o_orderstatus)', 'o_orderstatus', n_rows,
         CAST((SELECT count(*) FROM orders
               WHERE o_orderstatus IS NOT NULL
                 AND o_orderstatus NOT IN ('O','F','P')) AS BIGINT)
  FROM n
  UNION ALL
  SELECT 'matches(o_orderpriority)', 'o_orderpriority', n_rows,
         CAST((SELECT count(*) FROM orders
               WHERE o_orderpriority IS NOT NULL
                 AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$'))
              AS BIGINT)
  FROM n
  UNION ALL
  SELECT 'orderdate_in_epoch', 'orderdate_in_epoch', n_rows,
         CAST((SELECT count(*) FROM orders
               WHERE NOT coalesce(o_orderdate >= TIMESTAMP '1992-01-01'
                                  AND o_orderdate < TIMESTAMP '2002-01-01',
                                  FALSE)) AS BIGINT)
  FROM n
  UNION ALL
  SELECT 'foreign_key(o_custkey->customer.c_custkey)', 'o_custkey', n_rows,
         CAST((SELECT count(*) FROM orders o
               WHERE o.o_custkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
  FROM n
)
SELECT "check", target, n_rows, violations, violations = 0 AS passed
FROM rep
ORDER BY "check"
"""


def q_resample_fill(spark, sf_dir):
    """Time-series resampling (operators/timeseries.py): hourly buckets per
    50-way user cohort, densified to every hour between each cohort's first
    and last event, gap rows flagged and forward-filled.  The raw stream is
    scanned once; densify/fill run over the keys x buckets aggregate."""
    from carto_etl_spark.operators.timeseries import resample_filled

    e = load(spark, sf_dir, "events")
    e = e.withColumn("cohort", (F.col("user_id") % 50).cast("long"))
    out = resample_filled(
        e,
        "ts",
        3600,
        ["cohort"],
        {
            "n_events": F.count(F.lit(1)),
            "sum_value": F.round(F.sum("value"), 2),
        },
        fill_cols=["sum_value"],
    )
    return out.select(
        "cohort",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
        "filled",
    )


ORACLE_RESAMPLE = """
WITH b AS (
  SELECT user_id % 50 AS cohort,
         cast(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_s,
         count(*) AS n_events,
         round(sum(value), 2) AS sum_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT cohort, min(bucket_s) AS mn, max(bucket_s) AS mx FROM b GROUP BY 1
), grid AS (
  SELECT cohort, unnest(generate_series(mn, mx, 3600)) AS bucket_s FROM bounds
), j AS (
  SELECT g.cohort, g.bucket_s, b.n_events, b.sum_value
  FROM grid g LEFT JOIN b ON b.cohort = g.cohort AND b.bucket_s = g.bucket_s
)
SELECT cohort,
       strftime(to_timestamp(bucket_s), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       -- carrier semantics, exactly: a gap cell takes the most recent
       -- OCCUPIED bucket's value (even if that value is NULL); an occupied
       -- bucket always keeps its own.  The struct wrapper is non-NULL on
       -- every occupied row, so IGNORE NULLS lands on the carrier itself
       -- rather than reaching back past a NULL aggregate.
       (last_value(CASE WHEN n_events IS NOT NULL
                        THEN struct_pack(s := sum_value) END IGNORE NULLS)
          OVER (PARTITION BY cohort ORDER BY bucket_s
                ROWS UNBOUNDED PRECEDING)).s AS sum_value,
       n_events IS NULL AS filled
FROM j
"""


def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling (operators/sampling.py:
    weighted_systematic_sample): 500 PPS-systematic picks over documents
    weighted by whitespace token count.  Thresholds are integer grid points
    on the cumulative-weight axis — every selection decision is integer
    arithmetic over a distributed prefix sum, bit-reproducible on any
    engine, no RNG."""
    from carto_etl_spark.operators.text import token_count_expr

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", token_count_expr(F.col("text")).cast("long").alias("wt")
    )
    out = smp.weighted_systematic_sample(docs, "wt", 500, "doc_id")
    return out.select("doc_id", "wt", "n_picks")


ORACLE_WEIGHTED_SAMPLE = r"""
WITH w AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x != '')) AS BIGINT) AS wt
  FROM documents
), p AS (
  SELECT doc_id, wt FROM w WHERE wt > 0
), c AS (
  SELECT doc_id, wt,
         CAST(coalesce(sum(wt) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum
  FROM p
), t AS (
  SELECT CAST(sum(wt) AS BIGINT) AS tw FROM p
)
SELECT doc_id, wt, n_picks FROM (
  SELECT doc_id, wt,
         CAST(greatest(
           least(CASE WHEN 1000 * (cum + wt) - tw <= 0 THEN -1
                      ELSE (1000 * (cum + wt) - tw + 2 * tw - 1) // (2 * tw) - 1
                 END, 499)
           - CASE WHEN 1000 * cum - tw <= 0 THEN 0
                  ELSE (1000 * cum - tw + 2 * tw - 1) // (2 * tw)
             END + 1, 0) AS BIGINT) AS n_picks
  FROM c, t
)
WHERE n_picks > 0
"""


def q_snapshot_diff(spark, sf_dir):
    """Snapshot diff / change feed (operators/transactional.py:diff): build
    a transactional customer table, apply an upsert (renames on
    c_custkey%11, one synthetic insert) and a range delete, then diff the
    initial snapshot against the final one.  Carried files are never opened
    — the feed reads only churned files; updates surface as
    delete+insert pairs.  The oracle recomputes the change feed as
    EXCEPT-ALL both ways between the declaratively-derived states."""
    import shutil
    import tempfile

    from carto_etl_spark.operators.transactional import TransactionalTable

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    workdir = tempfile.mkdtemp(prefix="snap-diff-")
    try:
        t = TransactionalTable(
            spark, f"{workdir}/t", stats_columns=["c_custkey"]
        )
        t.append(c)
        v1 = t.version()
        updates = c.filter(F.col("c_custkey") % 11 == 0).select(
            "c_custkey",
            F.concat(F.lit("CHG_"), F.col("c_name")).alias("c_name"),
            F.round(F.col("c_acctbal") - 250.0, 2).alias("c_acctbal"),
        ).unionByName(
            spark.sql(
                "SELECT CAST(8000001 AS BIGINT) c_custkey, "
                "'BRANDNEW' c_name, CAST(9.87 AS DOUBLE) c_acctbal"
            )
        )
        t.upsert(updates, key="c_custkey")
        t.delete_where("c_custkey", lo=300, hi=449)
        out = t.diff(v1)
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_SNAPSHOT_DIFF = """
WITH base AS (
  SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal FROM customer
), merged AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 11 = 0 THEN 'CHG_' || c_name ELSE c_name END
             AS c_name,
         CASE WHEN c_custkey % 11 = 0 THEN round(round(c_acctbal, 2) - 250.0, 2)
              ELSE round(c_acctbal, 2) END AS c_acctbal
  FROM base
  UNION ALL
  SELECT 8000001, 'BRANDNEW', 9.87
), final AS (
  SELECT * FROM merged WHERE c_custkey < 300 OR c_custkey > 449
)
SELECT c_custkey, c_name, c_acctbal, 'insert' AS _change
FROM (SELECT * FROM final EXCEPT ALL SELECT * FROM base)
UNION ALL
SELECT c_custkey, c_name, c_acctbal, 'delete' AS _change
FROM (SELECT * FROM base EXCEPT ALL SELECT * FROM final)
"""


def q_fuzzy_pairs(spark, sf_dir):
    """SymSpell fuzzy matching (operators/fuzzy.py): all customer-name pairs
    within Levenshtein distance 1, found by deletion-neighborhood blocking
    (equi-join on delete-variants, exact levenshtein verify on candidates —
    never n² pairs).  The oracle is the INDEPENDENT brute force: DuckDB
    evaluates levenshtein over every id-ordered pair, so blocking
    completeness itself is what's being checked."""
    from carto_etl_spark.operators.fuzzy import fuzzy_pairs

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return fuzzy_pairs(c, "c_custkey", "c_name", max_dist=1)


ORACLE_FUZZY = """
SELECT a.c_custkey AS id_a, a.c_name AS text_a,
       b.c_custkey AS id_b, b.c_name AS text_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def q_linkage_scores(spark, sf_dir):
    """Fellegi-Sunter probabilistic linkage (operators/linkage.py) on top
    of SymSpell blocking: candidate customer pairs within name edit
    distance 1 are scored by exact-arithmetic u-probabilities (random-
    agreement rates of nation / market segment) and caller m-probabilities,
    composed as a fixed-order product of one-division ratios — no ln, so
    every emitted double is bit-identical across engines.  The oracle
    re-derives candidates by brute force AND the full scoring chain."""
    from carto_etl_spark.operators.fuzzy import fuzzy_pairs
    from carto_etl_spark.operators.linkage import fellegi_sunter_scores

    c = load(spark, sf_dir, "customer")
    pairs = fuzzy_pairs(
        c.select("c_custkey", "c_name"), "c_custkey", "c_name", max_dist=1
    )
    return fellegi_sunter_scores(
        c, "c_custkey", pairs,
        {"c_nationkey": 0.95, "c_mktsegment": 0.9},
    )


def _oracle_linkage_scores():
    from carto_etl_spark.operators.linkage import fs_oracle_sql

    return fs_oracle_sql(
        "SELECT c_custkey, c_nationkey, c_mktsegment FROM customer",
        "SELECT a.c_custkey AS id_a, b.c_custkey AS id_b "
        "FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey "
        "WHERE levenshtein(a.c_name, b.c_name) <= 1",
        "c_custkey",
        {"c_nationkey": 0.95, "c_mktsegment": 0.9},
    )


def q_theil_sen(spark, sf_dir):
    """Per-priority Theil-Sen robust price trend over order dates
    (anomaly.theil_sen): deterministic per-key point sample (cap 40),
    bounded pair join, LOWER-MEDIAN slope by exact rank selection — no
    sums, one IEEE division per pair, so every number is bit-identical
    across engines with no rounding anywhere.  The oracle re-derives the
    per-key cutoffs, the sample, every pairwise slope and the median
    rank in DuckDB."""
    from carto_etl_spark.operators.anomaly import theil_sen

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("double")
        .alias("x"),
        F.col("o_totalprice").alias("y"),
        F.col("o_orderkey").alias("k"),
    )
    return theil_sen(o, ["g"], "x", "y", "k", sample_cap=40)


def _oracle_theil_sen() -> str:
    from carto_etl_spark.operators.sampling import LEHMER_M, hash_sql

    cap = 40
    return f"""
WITH src AS (
  SELECT o_orderpriority AS g,
         CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE) AS x,
         o_totalprice AS y, o_orderkey AS k
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
),
counts AS (SELECT g, count(*) AS n FROM src GROUP BY g),
pts AS (
  SELECT s.g, s.x, s.y, s.k
  FROM src s JOIN counts c ON s.g = c.g
  WHERE {hash_sql("k", 0)} <
        CAST(floor(least(1.0, CAST({cap} AS DOUBLE) / CAST(c.n AS DOUBLE))
                   * {LEHMER_M}) AS BIGINT)
),
npts AS (SELECT g, count(*) AS n_points FROM pts GROUP BY g),
pairs AS (
  SELECT a.g, (b.y - a.y) / (b.x - a.x) AS slope, a.k AS ka, b.k AS kb
  FROM pts a JOIN pts b ON a.g = b.g AND a.k < b.k AND a.x <> b.x
),
ranked AS (
  SELECT g, slope,
         row_number() OVER (PARTITION BY g ORDER BY slope, ka, kb) AS r,
         count(*) OVER (PARTITION BY g) AS np
  FROM pairs
),
med AS (
  SELECT g, CAST(np AS BIGINT) AS n_pairs, slope
  FROM ranked WHERE r = CAST(ceil(np / 2.0) AS BIGINT)
)
SELECT npts.g, CAST(npts.n_points AS BIGINT) AS n_points,
       coalesce(med.n_pairs, 0) AS n_pairs, med.slope
FROM npts LEFT JOIN med ON npts.g = med.g
"""


def q_equi_depth_hist(spark, sf_dir):
    """Equi-depth histogram of lineitem prices (quantiles.
    equi_depth_histogram): boundaries from the deterministic quantile
    sketch at i/8 (binary fractions), then ONE exact counting pass —
    the sketch composed into a downstream operator, with balanced bucket
    populations under any skew.  The oracle re-derives the sample, the
    boundary ranks AND the multiplicity-counting bucket assignment."""
    from carto_etl_spark.operators import quantiles as qt

    li = load(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k"),
    )
    return qt.equi_depth_histogram(src, "v", "k", n_buckets=8,
                                   target_sample=1000)


def _oracle_equi_depth_hist() -> str:
    from carto_etl_spark.operators import quantiles as qt

    return qt.equi_depth_oracle_sql(
        "SELECT l_extendedprice AS v, l_orderkey * 8 + l_linenumber AS k "
        "FROM lineitem WHERE l_extendedprice IS NOT NULL",
        n_buckets=8,
        target_sample=1000,
    )


def q_psi_drift(spark, sf_dir):
    """Population stability index (mlstats.psi_bins): order-value
    distribution drift between the even- and odd-orderkey halves of the
    orders table over five literal price bins — per-bin smoothed
    fractions and 6dp-rounded PSI terms, cross-engine exact (the
    lm_fluency one-libm-call-per-term pattern).  The oracle replays the
    identical bin chain, smoothing shape and rounding in DuckDB."""
    from carto_etl_spark.operators.mlstats import psi_bins

    o = load(spark, sf_dir, "orders")
    ref = o.filter(F.col("o_orderkey") % 2 == 0).select("o_totalprice")
    cur = o.filter(F.col("o_orderkey") % 2 == 1).select("o_totalprice")
    return psi_bins(
        ref, cur, "o_totalprice", [100000.0, 200000.0, 300000.0, 400000.0]
    )


def _oracle_psi_drift() -> str:
    from carto_etl_spark.operators.mlstats import psi_oracle_sql

    return psi_oracle_sql(
        "SELECT o_totalprice FROM orders WHERE o_orderkey % 2 = 0",
        "SELECT o_totalprice FROM orders WHERE o_orderkey % 2 = 1",
        "o_totalprice",
        [100000.0, 200000.0, 300000.0, 400000.0],
    )


def q_cusum_drift(spark, sf_dir):
    """CUSUM drift detection per event type (anomaly.cusum_scores): the
    sequential recurrence s_i = max(0, s_{i-1} + y_i) computed as its
    closed form — prefix sum minus running min — two key-partitioned
    windows, no iteration.  Exact DECIMAL accumulation (quantized before
    any sum) so the running values are integer-exact on both engines;
    the final report casts to double (single rounding each side)."""
    from carto_etl_spark.operators.anomaly import cusum_scores

    e = load(spark, sf_dir, "events")
    out = cusum_scores(
        e, ["event_type"], ["ts", "event_id"], "value",
        target=50.0, slack=2.0, threshold=200.0,
    )
    return out.select(
        "event_id",
        "event_type",
        F.col("cusum").cast("double").alias("cusum"),
        "alarm",
    )


ORACLE_CUSUM = """
WITH y AS (
  SELECT event_id, event_type, ts, value,
         CAST(round(value, 6) AS DECIMAL(28,6))
         - CAST(round(50.0, 6) AS DECIMAL(28,6))
         - CAST(round(2.0, 6) AS DECIMAL(28,6)) AS yv
  FROM events
), p AS (
  SELECT event_id, event_type, ts,
         sum(yv) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS pp
  FROM y
), s AS (
  SELECT event_id, event_type,
         CAST(pp - least(CAST(0 AS DECIMAL(28,6)), min(pp) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         )) AS DECIMAL(28,6)) AS cusum
  FROM p
)
SELECT event_id, event_type, CAST(cusum AS DOUBLE) AS cusum,
       cusum > CAST(round(200.0, 6) AS DECIMAL(28,6)) AS alarm
FROM s
"""


def q_mad_outliers(spark, sf_dir):
    """Robust anomaly detection (operators/anomaly.py): per-event-type
    lower-median / MAD outliers at the classic 3.5 cutoff.  Every statistic
    is exact rank selection (no interpolation) and the score is one
    subtract/divide — no sums anywhere, so all emitted doubles are
    bit-identical across engines and the threshold comparison itself cannot
    flip on FP noise."""
    from carto_etl_spark.operators.anomaly import mad_outliers

    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = mad_outliers(e, ["event_type"], "value", threshold=3.5)
    return out.select(
        "event_id", "event_type", "value", "med", "mad",
        F.round("score", 6).alias("score"),
    )


ORACLE_MAD = """
WITH nn AS (
  SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM nn
), med AS (
  SELECT event_type, value AS med FROM r WHERE rn = ceil(n / 2.0)
), d AS (
  SELECT nn.event_id, nn.event_type, nn.value, med.med,
         abs(nn.value - med.med) AS dev
  FROM nn JOIN med USING (event_type)
), r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d
), mad AS (
  SELECT event_type, dev AS mad FROM r2 WHERE rn = ceil(n / 2.0)
)
SELECT event_id, d.event_type, value, med, mad.mad,
       round(dev / mad.mad, 6) AS score
FROM d JOIN mad USING (event_type)
WHERE mad.mad > 0 AND dev / mad.mad > 3.5
"""


def q_pivot_revenue(spark, sf_dir):
    """Pivot report (operators/reshape.py:pivot_table): nation revenue by
    order year, long → wide with explicit values — Catalyst plans ONE
    aggregate whose conditional expressions cover every year column, not a
    scan per year.  Dims broadcast; sums rounded to cents."""
    from carto_etl_spark.operators.reshape import pivot_table

    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "n_name",
            F.year("o_orderdate").alias("yr"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    return pivot_table(
        joined,
        ["n_name"],
        "yr",
        {"rev": F.round(F.sum("rev"), 2)},
        values=list(range(1995, 2002)),
        prefix="y",
    )


ORACLE_PIVOT = """
SELECT n_name,
       round(sum(CASE WHEN yr = 1995 THEN rev END), 2) AS y1995,
       round(sum(CASE WHEN yr = 1996 THEN rev END), 2) AS y1996,
       round(sum(CASE WHEN yr = 1997 THEN rev END), 2) AS y1997,
       round(sum(CASE WHEN yr = 1998 THEN rev END), 2) AS y1998,
       round(sum(CASE WHEN yr = 1999 THEN rev END), 2) AS y1999,
       round(sum(CASE WHEN yr = 2000 THEN rev END), 2) AS y2000,
       round(sum(CASE WHEN yr = 2001 THEN rev END), 2) AS y2001
FROM (
  SELECT n_name, year(o_orderdate) AS yr,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
GROUP BY n_name
"""


def q_transitions(spark, sf_dir):
    """Event-flow transition matrix (operators/funnel.py:transitions):
    per-user consecutive event-type pairs with per-from probabilities — one
    lead window on the user partitioning, one aggregate over the |states|²
    matrix.  Tie order within equal timestamps pinned by event_id."""
    from carto_etl_spark.operators.funnel import transitions

    e = load(spark, sf_dir, "events")
    return transitions(e, "user_id", "ts", "event_type", tiebreak="event_id")


ORACLE_TRANSITIONS = """
WITH paired AS (
  SELECT event_type AS from_state,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_state
  FROM events
), counts AS (
  SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
  FROM paired WHERE to_state IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_state, to_state, n,
       round(n / CAST(sum(n) OVER (PARTITION BY from_state) AS BIGINT), 6)
         AS p
FROM counts
"""


def q_value_histogram(spark, sf_dir):
    """Complete-bin equi-width histogram (operators/stats.py:histogram):
    order total prices into 40 bins over [0, 500000] — empty bins emit a
    zero row (the spine is a range, not a scan), closed top edge."""
    from carto_etl_spark.operators.stats import histogram

    o = load(spark, sf_dir, "orders")
    out = histogram(o, "o_totalprice", 0.0, 500_000.0, 40)
    return out.select(
        "bin",
        F.round("bin_lo", 4).alias("bin_lo"),
        F.round("bin_hi", 4).alias("bin_hi"),
        "n",
    )


ORACLE_HISTOGRAM = """
WITH spine AS (
  SELECT unnest(generate_series(0, 39)) AS bin
), binned AS (
  SELECT least(CAST(floor((o_totalprice - 0.0) / 12500.0) AS BIGINT), 39)
           AS bin,
         count(*) AS n
  FROM orders
  WHERE o_totalprice IS NOT NULL
    AND o_totalprice >= 0.0 AND o_totalprice <= 500000.0
  GROUP BY 1
)
SELECT CAST(spine.bin AS BIGINT) AS bin,
       round(CAST(0.0 + spine.bin * 12500.0 AS DOUBLE), 4) AS bin_lo,
       round(CAST(0.0 + (spine.bin + 1) * 12500.0 AS DOUBLE), 4) AS bin_hi,
       CAST(coalesce(binned.n, 0) AS BIGINT) AS n
FROM spine LEFT JOIN binned ON spine.bin = binned.bin
"""


# ---------------------------------------------------------------------------
# Grid-bucketed spatial joins (operators/spatial.py) — the join shapes the
# reference delegates to PostGIS (ST_Contains / ST_DWithin / <-> kNN), run
# distributed.  Coordinates are synthesized from the keys with integer-mod
# arithmetic written identically here and in the oracles, so every emitted
# double is bit-identical across engines and nothing needs rounding.
# ---------------------------------------------------------------------------

def _spatial_points(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        (((F.col("c_custkey") * 48271) % 7200).cast("double") / 20.0 - 180.0
         ).alias("px"),
        (((F.col("c_custkey") * 69621) % 3400).cast("double") / 20.0 - 85.0
         ).alias("py"),
    )


def _spatial_boxes(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    cxd = ((F.col("s_suppkey") * 40503) % 7000).cast("double") / 20.0 - 175.0
    cyd = ((F.col("s_suppkey") * 65537) % 3200).cast("double") / 20.0 - 80.0
    hw = (1 + F.col("s_suppkey") % 97).cast("double") / 10.0
    hh = (1 + F.col("s_suppkey") % 89).cast("double") / 10.0
    return s.select(
        "s_suppkey",
        (cxd - hw).alias("xmin"),
        (cyd - hh).alias("ymin"),
        (cxd + hw).alias("xmax"),
        (cyd + hh).alias("ymax"),
    )


_SPATIAL_PTS_SQL = """
  SELECT c_custkey,
         CAST((c_custkey * 48271) % 7200 AS DOUBLE) / 20.0 - 180.0 AS px,
         CAST((c_custkey * 69621) % 3400 AS DOUBLE) / 20.0 - 85.0 AS py
  FROM customer
"""

_SPATIAL_BOX_SQL = """
  SELECT s_suppkey,
         (CAST((s_suppkey * 40503) % 7000 AS DOUBLE) / 20.0 - 175.0)
           - CAST(1 + s_suppkey % 97 AS DOUBLE) / 10.0 AS xmin,
         (CAST((s_suppkey * 65537) % 3200 AS DOUBLE) / 20.0 - 80.0)
           - CAST(1 + s_suppkey % 89 AS DOUBLE) / 10.0 AS ymin,
         (CAST((s_suppkey * 40503) % 7000 AS DOUBLE) / 20.0 - 175.0)
           + CAST(1 + s_suppkey % 97 AS DOUBLE) / 10.0 AS xmax,
         (CAST((s_suppkey * 65537) % 3200 AS DOUBLE) / 20.0 - 80.0)
           + CAST(1 + s_suppkey % 89 AS DOUBLE) / 10.0 AS ymax
  FROM supplier
"""


def q_spatial_contains(spark, sf_dir):
    """Point-in-box containment via grid blocking: no cartesian product,
    each surviving pair meets in exactly one cell (the point's), so the
    equi-join result needs no dedup.  PostGIS-parity for the reference's
    ST_Contains-style predicates (/root/reference/etl/etl.py the_geom)."""
    from carto_etl_spark.operators.spatial import point_in_box_join

    pts = _spatial_points(spark, sf_dir)
    bxs = _spatial_boxes(spark, sf_dir)
    return point_in_box_join(
        pts, bxs, cell=10.0, x="px", y="py"
    ).select("c_custkey", "s_suppkey", "px", "py")


ORACLE_SPATIAL_CONTAINS = f"""
WITH pts AS ({_SPATIAL_PTS_SQL}), bxs AS ({_SPATIAL_BOX_SQL})
SELECT c_custkey, s_suppkey, px, py
FROM pts, bxs
WHERE px >= xmin AND px <= xmax AND py >= ymin AND py <= ymax
"""


def q_spatial_nearest(spark, sf_dir):
    """Nearest supplier-point within radius 20 for every customer-point:
    3x3 neighbor-cell equi-join (cell=25 >= radius, so blocking is exact),
    then a per-probe row_number over (dist2, id).  The oracle is an
    INDEPENDENT brute force over all pairs, so what gets verified is the
    blocking's completeness, not a shared shortcut."""
    from carto_etl_spark.operators.spatial import nearest_join

    pts = _spatial_points(spark, sf_dir)
    sup = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (((F.col("s_suppkey") * 40503) % 7000).cast("double") / 20.0 - 175.0
         ).alias("sx"),
        (((F.col("s_suppkey") * 65537) % 3200).cast("double") / 20.0 - 80.0
         ).alias("sy"),
    )
    out = nearest_join(
        pts.withColumnRenamed("px", "x").withColumnRenamed("py", "y"),
        sup.withColumnRenamed("sx", "x").withColumnRenamed("sy", "y"),
        cell=25.0,
        radius=20.0,
        left_id="c_custkey",
        right_id="s_suppkey",
    )
    return out.select("c_custkey", "s_suppkey", "dist2", "nn_rank")


ORACLE_SPATIAL_NEAREST = f"""
WITH pts AS ({_SPATIAL_PTS_SQL}),
sups AS (
  SELECT s_suppkey,
         CAST((s_suppkey * 40503) % 7000 AS DOUBLE) / 20.0 - 175.0 AS sx,
         CAST((s_suppkey * 65537) % 3200 AS DOUBLE) / 20.0 - 80.0 AS sy
  FROM supplier
),
pairs AS (
  SELECT c_custkey, s_suppkey,
         (px - sx) * (px - sx) + (py - sy) * (py - sy) AS dist2
  FROM pts, sups
),
ranked AS (
  SELECT c_custkey, s_suppkey, dist2,
         CAST(row_number() OVER (
           PARTITION BY c_custkey ORDER BY dist2, s_suppkey) AS INT)
           AS nn_rank
  FROM pairs WHERE dist2 <= 400.0
)
SELECT c_custkey, s_suppkey, dist2, nn_rank FROM ranked WHERE nn_rank <= 1
"""


# 8-point star template (non-convex, no horizontal edges), scaled per
# polygon: a shape where bbox containment and true containment genuinely
# differ, so the ray-cast is what the oracle exercises
_STAR_DX = [2.0, 0.5, 0.0, -0.5, -2.0, -0.5, 0.0, 0.5]
_STAR_DY = [0.0, 0.5, 2.0, 0.5, 0.0, -0.5, -2.0, -0.5]


def q_spatial_polygons(spark, sf_dir):
    """Point-in-POLYGON containment (even-odd ray cast over vertex arrays,
    grid-blocked, exact test map-side after the cell equi-join) — the
    ST_Contains the reference delegates to PostGIS, on non-convex stars."""
    from carto_etl_spark.operators.spatial import point_in_polygon_join

    pts = _spatial_points(spark, sf_dir)
    n = load(spark, sf_dir, "nation")
    cx = ((F.col("n_nationkey") * 40503) % 7000).cast("double") / 20.0 - 175.0
    cy = ((F.col("n_nationkey") * 65537) % 3200).cast("double") / 20.0 - 80.0
    s = (1 + F.col("n_nationkey") % 10).cast("double")
    verts = F.array(
        *[
            F.struct(
                (cx + s * F.lit(dx)).alias("x"),
                (cy + s * F.lit(dy)).alias("y"),
            )
            for dx, dy in zip(_STAR_DX, _STAR_DY)
        ]
    )
    polys = n.select(
        F.col("n_nationkey").alias("poly_id"), verts.alias("vertices")
    )
    return point_in_polygon_join(
        pts, polys, cell=10.0, x="px", y="py"
    ).select("c_custkey", "poly_id", "px", "py")


def _oracle_spatial_polygons():
    edges = ", ".join(
        f"({_STAR_DX[i]}, {_STAR_DY[i]},"
        f" {_STAR_DX[(i + 1) % 8]}, {_STAR_DY[(i + 1) % 8]})"
        for i in range(8)
    )
    return f"""
WITH pts AS ({_SPATIAL_PTS_SQL}),
polys AS (
  SELECT n_nationkey AS poly_id,
         CAST((n_nationkey * 40503) % 7000 AS DOUBLE) / 20.0 - 175.0 AS cx,
         CAST((n_nationkey * 65537) % 3200 AS DOUBLE) / 20.0 - 80.0 AS cy,
         CAST(1 + n_nationkey % 10 AS DOUBLE) AS s
  FROM nation
),
tmpl(dx1, dy1, dx2, dy2) AS (VALUES {edges}),
edges AS (
  SELECT poly_id, cx + s * dx1 AS x1, cy + s * dy1 AS y1,
         cx + s * dx2 AS x2, cy + s * dy2 AS y2
  FROM polys, tmpl
),
counts AS (
  SELECT p.c_custkey, e.poly_id, p.px, p.py,
         SUM(CASE WHEN (e.y1 > p.py) != (e.y2 > p.py)
                   AND p.px < e.x1 + (p.py - e.y1) * (e.x2 - e.x1)
                                     / (e.y2 - e.y1)
                  THEN 1 ELSE 0 END) AS c
  FROM pts p, edges e GROUP BY 1, 2, 3, 4
)
SELECT c_custkey, poly_id, px, py FROM counts WHERE c % 2 = 1
"""


def q_latest_per_key(spark, sf_dir):
    """Current-state view of the event log: the newest event per user
    (row_number over one user-partitioned ordering, event_id tiebreak for
    equal timestamps) — the compaction read every CDC/upsert consumer runs."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
            "event_type",
            "value",
        )
    )


ORACLE_LATEST_PER_KEY = """
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       event_type, value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
"""


def q_haversine(spark, sf_dir):
    """Great-circle (haversine) distance in km from each customer point to
    its deterministically paired supplier point — pure JVM trig column math.
    Distances are rounded to 4 decimals (~10 cm): Spark's Math.* and
    DuckDB's libm may differ in the last ulp, and the rounding absorbs it."""
    pts = _spatial_points(spark, sf_dir)
    sup = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (((F.col("s_suppkey") * 40503) % 7000).cast("double") / 20.0 - 175.0
         ).alias("sx"),
        (((F.col("s_suppkey") * 65537) % 3200).cast("double") / 20.0 - 80.0
         ).alias("sy"),
    )
    # pair on a FIXED modulus (not the supplier count) so the oracle string
    # stays sf-independent; at tiny sf the inner join just matches fewer rows
    paired = pts.withColumn(
        "s_suppkey", (F.col("c_custkey") % 100) + 1
    ).join(F.broadcast(sup), "s_suppkey")
    rad = 3.141592653589793 / 180.0
    lat1, lat2 = F.col("py") * rad, F.col("sy") * rad
    dlat, dlon = (
        (F.col("sy") - F.col("py")) * rad,
        (F.col("sx") - F.col("px")) * rad,
    )
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(lat1) * F.cos(lat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    dist_km = 2.0 * 6371.0 * F.asin(F.sqrt(a))
    return paired.select(
        "c_custkey",
        "s_suppkey",
        F.round(dist_km, 4).alias("dist_km"),
    )


def _oracle_haversine() -> str:
    return f"""
WITH pts AS ({_SPATIAL_PTS_SQL}),
sups AS (
  SELECT s_suppkey,
         CAST((s_suppkey * 40503) % 7000 AS DOUBLE) / 20.0 - 175.0 AS sx,
         CAST((s_suppkey * 65537) % 3200 AS DOUBLE) / 20.0 - 80.0 AS sy
  FROM supplier
)
SELECT p.c_custkey, s.s_suppkey,
       round(2.0 * 6371.0 * asin(sqrt(
         sin((s.sy - p.py) * {3.141592653589793 / 180.0!r} / 2)
           * sin((s.sy - p.py) * {3.141592653589793 / 180.0!r} / 2)
         + cos(p.py * {3.141592653589793 / 180.0!r})
           * cos(s.sy * {3.141592653589793 / 180.0!r})
           * sin((s.sx - p.px) * {3.141592653589793 / 180.0!r} / 2)
           * sin((s.sx - p.px) * {3.141592653589793 / 180.0!r} / 2)
       )), 4) AS dist_km
FROM pts p JOIN sups s ON (p.c_custkey % 100) + 1 = s.s_suppkey
"""


def q_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase credited to the user's latest
    click within the preceding hour (streaming/joins.py interval join — the
    stream-stream join shape — run in its batch mode here)."""
    from carto_etl_spark.streaming.joins import attribute_conversions

    e = load(spark, sf_dir, "events")
    out = attribute_conversions(
        e, trigger_type="click", conversion_type="purchase",
        max_delay="1 hour",
    )
    return out.select(
        "user_id",
        "conversion_id",
        "trigger_id",
        F.date_format("trigger_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "trigger_ts"
        ),
        F.date_format("conversion_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "conversion_ts"
        ),
    )


ORACLE_ATTRIBUTION = """
WITH t AS (
  SELECT user_id, event_id AS trigger_id, ts FROM events
  WHERE event_type = 'click'
),
c AS (
  SELECT user_id, event_id AS conversion_id, ts FROM events
  WHERE event_type = 'purchase'
),
j AS (
  SELECT t.user_id, c.conversion_id, t.trigger_id,
         t.ts AS trigger_ts, c.ts AS conversion_ts
  FROM t JOIN c ON t.user_id = c.user_id
   AND c.ts >= t.ts AND c.ts <= t.ts + INTERVAL 1 HOUR
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY conversion_id ORDER BY trigger_ts DESC, trigger_id DESC
  ) AS rn FROM j
)
SELECT user_id, conversion_id, trigger_id,
       strftime(trigger_ts, '%Y-%m-%d %H:%M:%S') AS trigger_ts,
       strftime(conversion_ts, '%Y-%m-%d %H:%M:%S') AS conversion_ts
FROM r WHERE rn = 1
"""


def q_scd2_intervals(spark, sf_dir):
    """SCD-2 dimension build from the event log: each event opens a
    validity interval closed by the user's next event (lead over one user
    partitioning; open-ended current row emits NULL valid_to)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(
            F.lead("ts").over(w), "yyyy-MM-dd HH:mm:ss"
        ).alias("valid_to"),
    )


ORACLE_SCD2 = """
SELECT user_id, event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S') AS valid_to
FROM events
"""


def q_deciles(spark, sf_dir):
    """Decile banding with EXACT ntile(10) semantics (custkey tiebreak makes
    the banding deterministic), computed distributed: global rank via
    range-bucket boundaries (operators/ranking.py — bucket-partitioned
    window, broadcast offsets, no single-partition sort), then the tile is
    pure arithmetic over (rank, n).  Identical results to the SQL ntile the
    oracle runs, but the plan survives a fact-scale input."""
    from carto_etl_spark.operators.ranking import (
        ntile_from_rank,
        with_global_rank,
    )

    c = load(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    n = c.count()
    ranked = with_global_rank(
        c, ["c_acctbal", "c_custkey"], name="__r", total=n
    )
    return (
        ranked.withColumn(
            "decile", ntile_from_rank(F.col("__r"), n, 10)
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


ORACLE_DECILES = """
SELECT decile, count(*) AS n, min(c_acctbal) AS min_bal,
       max(c_acctbal) AS max_bal
FROM (
  SELECT c_acctbal,
         CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS INT)
           AS decile
  FROM customer
) t GROUP BY decile
"""


def q_trajectory_length(spark, sf_dir):
    """Per-user trajectory: haversine step distances between consecutive
    synthesized event positions, summed EXACTLY — each step is rounded to
    6dp and cast to decimal before the per-user sum, so the aggregate is
    associative and partition-order-proof (a raw double sum would drift)."""
    e = load(spark, sf_dir, "events")
    ex = ((F.col("event_id") * 48271) % 7200).cast("double") / 20.0 - 180.0
    ey = ((F.col("event_id") * 69621) % 3400).cast("double") / 20.0 - 85.0
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = e.select(
        "user_id", "ts", "event_id", ex.alias("ex"), ey.alias("ey")
    ).select(
        "user_id",
        "ex",
        "ey",
        F.lag("ex").over(w).alias("px"),
        F.lag("ey").over(w).alias("py"),
    )
    rad = 3.141592653589793 / 180.0
    a = (
        F.sin((F.col("ey") - F.col("py")) * rad / 2)
        * F.sin((F.col("ey") - F.col("py")) * rad / 2)
        + F.cos(F.col("py") * rad)
        * F.cos(F.col("ey") * rad)
        * F.sin((F.col("ex") - F.col("px")) * rad / 2)
        * F.sin((F.col("ex") - F.col("px")) * rad / 2)
    )
    step = F.round(2.0 * 6371.0 * F.asin(F.sqrt(a)), 6).cast(
        "decimal(18,6)"
    )
    return (
        pts.withColumn("step_km", step)
        .groupBy("user_id")
        .agg(
            F.count("step_km").alias("n_steps"),
            F.sum("step_km").cast("double").alias("total_km"),
        )
    )


_RAD = repr(3.141592653589793 / 180.0)
ORACLE_TRAJECTORY = f"""
WITH pts AS (
  SELECT user_id,
         CAST((event_id * 48271) % 7200 AS DOUBLE) / 20.0 - 180.0 AS ex,
         CAST((event_id * 69621) % 3400 AS DOUBLE) / 20.0 - 85.0 AS ey,
         lag(CAST((event_id * 48271) % 7200 AS DOUBLE) / 20.0 - 180.0)
           OVER w AS px,
         lag(CAST((event_id * 69621) % 3400 AS DOUBLE) / 20.0 - 85.0)
           OVER w AS py
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
steps AS (
  SELECT user_id,
         CAST(round(2.0 * 6371.0 * asin(sqrt(
           sin((ey - py) * {_RAD} / 2) * sin((ey - py) * {_RAD} / 2)
           + cos(py * {_RAD}) * cos(ey * {_RAD})
             * sin((ex - px) * {_RAD} / 2) * sin((ex - px) * {_RAD} / 2)
         )), 6) AS DECIMAL(18,6)) AS step_km
  FROM pts
)
SELECT user_id, count(step_km) AS n_steps,
       CAST(sum(step_km) AS DOUBLE) AS total_km
FROM steps GROUP BY user_id
"""


def q_ohlc_bars(spark, sf_dir):
    """OHLC resampling: open/high/low/close of `value` per (event_type,
    hour).  Open/close are pinned by an explicit (ts, event_id) total order
    — conditional aggregation over two row_numbers sharing ONE exchange
    (same partition keys), not a self-join."""
    e = load(spark, sf_dir, "events")
    bucket = F.date_format(
        F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
    )
    e = e.withColumn("bucket", bucket)
    wa = Window.partitionBy("event_type", "bucket").orderBy(
        "ts", "event_id"
    )
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("_ra", F.row_number().over(wa))
        .withColumn("_rd", F.row_number().over(wd))
        .groupBy("event_type", "bucket")
        .agg(
            F.max(F.when(F.col("_ra") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("_rd") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE_OHLC = """
SELECT event_type, bucket,
       max(CASE WHEN ra = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rd = 1 THEN value END) AS close,
       count(*) AS n
FROM (
  SELECT event_type, value,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS ra,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts DESC, event_id DESC) AS rd
  FROM events
) t GROUP BY event_type, bucket
"""


def q_state_runs(spark, sf_dir):
    """Gaps-and-islands: collapse each user's consecutive same-type events
    into runs (start/end/length) via the rn − rn_per_state difference trick
    — two row_numbers on the same user partitioning (one exchange), then a
    run-key aggregate; no self-join, no iteration."""
    e = load(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_st = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    runs = e.withColumn(
        "_g", F.row_number().over(w_all) - F.row_number().over(w_st)
    )
    return (
        runs.groupBy("user_id", "event_type", "_g")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "run_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "run_end"
            ),
            F.count(F.lit(1)).alias("run_len"),
        )
        .drop("_g")
    )


ORACLE_STATE_RUNS = """
SELECT user_id, event_type,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS run_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS run_end,
       count(*) AS run_len
FROM (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id) AS g
  FROM events
) t GROUP BY user_id, event_type, g
"""


_BM25_TERMS = ["spark", "merge", "window"]
_BM25_K1, _BM25_B = 1.2, 0.75


def q_bm25_scores(spark, sf_dir):
    """BM25 retrieval scoring for a fixed 3-term query, in ONE scan plus a
    single-row corpus-stats aggregate broadcast back — no explode, no
    per-term shuffle: per-term tf comes from a map-side array filter.

    Determinism: idf is the division-only (N−df+0.5)/(df+0.5) form (ln
    differs between JVM Math.log and libm in the last ulp); the 3 term
    scores are added in one FIXED left-associative expression instead of a
    SUM over rows, so every double is bit-identical to the oracle's."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    def _tf(term):
        # NB: a `lambda x, t=t:` default param would make this a TWO-arg
        # higher-order lambda, and Spark would bind the array INDEX to t
        return F.size(F.filter(F.col("_toks"), lambda x: x == F.lit(term)))

    d = d.select("doc_id", toks.alias("_toks")).select(
        "doc_id",
        F.size("_toks").alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    j = d.join(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    k1, b = _BM25_K1, _BM25_B

    def term_score(i):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf = (F.col("n_docs") - df + 0.5) / (df + 0.5)
        return idf * (tf * (k1 + 1)) / (
            tf + k1 * (1 - b + b * F.col("dl") / avgdl)
        )

    score = term_score(0) + term_score(1) + term_score(2)
    return (
        j.where(
            (F.col("tf_0") + F.col("tf_1") + F.col("tf_2")) > 0
        )
        .select("doc_id", "dl", score.alias("bm25"))
    )


def _oracle_bm25():
    tok = (
        r"list_filter(string_split_regex(trim(lower(text)), '\s+'),"
        r" x -> x != '')"
    )
    tf_cols = ", ".join(
        f"len(list_filter({tok}, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    k1, b = _BM25_K1, _BM25_B
    scores = " + ".join(
        f"((n_docs - CAST(df_{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * ({k1} + 1))"
        f" / (CAST(tf_{i} AS DOUBLE) + {k1}"
        f" * (1 - {b} + {b} * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH d AS (
  SELECT doc_id, len({tok}) AS dl, {tf_cols} FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl, {df_cols}
  FROM d
)
SELECT doc_id, CAST(dl AS INT) AS dl, {scores} AS bm25
FROM d, stats
WHERE tf_0 + tf_1 + tf_2 > 0
"""


def q_triangle_count(spark, sf_dir):
    """Global triangle count over a synthetic circulant graph on the nation
    keys (offsets 1, 3, 4 — rich in triangles), via degree-oriented wedge
    enumeration (operators/graph.py).  The oracle is an INDEPENDENT
    canonical a<b<c brute force sharing no orientation logic."""
    from carto_etl_spark.operators.graph import triangle_count

    n = load(spark, sf_dir, "nation")
    parts = [
        n.select(
            F.col("n_nationkey").alias("src"),
            ((F.col("n_nationkey") + off) % 25).alias("dst"),
        )
        for off in (1, 3, 4)
    ]
    edges = parts[0].union(parts[1]).union(parts[2])
    return triangle_count(edges)


def _oracle_triangles():
    from carto_etl_spark.operators.graph import triangle_oracle_sql

    edges_sql = " UNION ALL ".join(
        f"SELECT n_nationkey AS src, (n_nationkey + {off}) % 25 AS dst"
        " FROM nation"
        for off in (1, 3, 4)
    )
    return triangle_oracle_sql(edges_sql)


def q_golden_records(spark, sf_dir):
    """End-to-end entity resolution: SymSpell fuzzy pairs over customer
    names (edit distance ≤ 1) → fixpoint min-label connected components →
    every customer mapped to its cluster's minimum id as the golden
    record.  The oracle rebuilds the pair graph by BRUTE-FORCE levenshtein
    over all ordered pairs and closes it with a recursive CTE, so both the
    blocking completeness and the component labeling are what's verified."""
    from carto_etl_spark.operators.dedup import min_label_components
    from carto_etl_spark.operators.fuzzy import fuzzy_pairs

    c = load(spark, sf_dir, "customer")
    pairs = fuzzy_pairs(c, "c_custkey", "c_name", max_dist=1).select(
        "id_a", "id_b"
    )
    comps = min_label_components(pairs)
    return (
        c.join(comps, c["c_custkey"] == comps["node"], "left")
        .select(
            F.col("c_custkey").alias("member_id"),
            F.coalesce(F.col("root"), F.col("c_custkey")).alias(
                "golden_id"
            ),
        )
        .withColumn(
            "is_rep", (F.col("member_id") == F.col("golden_id"))
        )
    )


ORACLE_GOLDEN_RECORDS = """
WITH RECURSIVE pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey
   AND levenshtein(a.c_name, b.c_name) <= 1
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), reach AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
)
SELECT c.c_custkey AS member_id,
       least(c.c_custkey, coalesce(min(r.d), c.c_custkey)) AS golden_id,
       c.c_custkey = least(c.c_custkey, coalesce(min(r.d), c.c_custkey))
         AS is_rep
FROM customer c LEFT JOIN reach r ON r.s = c.c_custkey
GROUP BY c.c_custkey
"""


def q_label_centroids(spark, sf_dir):
    """Per-label embedding centroids as EXACT sums: each component is
    rounded to 6dp and decimal-cast before aggregation, so the per-(label,
    dim) sum is associative (partition-order-proof) and emitted with its
    count instead of as a division-lossy mean."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    )
    dec = F.round(F.col("val").cast("double"), 6).cast("decimal(18,6)")
    return (
        ex.groupBy("label", "dim")
        .agg(
            F.sum(dec).cast("double").alias("sum_val"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE_CENTROIDS = """
SELECT label, CAST(t.range AS INT) AS dim,
       CAST(sum(CAST(round(CAST(embedding[t.range + 1] AS DOUBLE), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_val,
       count(*) AS n
FROM embeddings CROSS JOIN range(64) t
GROUP BY 1, 2
"""


def q_quantize_int8(spark, sf_dir):
    """Symmetric int8 vector quantization (per-vector max-abs scale) —
    entirely map-side: scale computed on the array column BEFORE the
    explode, no shuffle anywhere.  floor(x + 0.5) instead of round():
    floor on bit-identical doubles is exact in both engines, while the two
    engines' round() implementations may disagree on exact .5 ties."""
    e = load(spark, sf_dir, "embeddings")
    maxabs = F.array_max(
        F.transform(
            F.col("embedding"), lambda x: F.abs(x.cast("double"))
        )
    )
    e = e.select(
        "vec_id", maxabs.alias("_m"),
        F.posexplode("embedding").alias("dim", "val"),
    )
    q = F.when(F.col("_m") == 0.0, F.lit(0)).otherwise(
        F.floor(
            127.0 * F.col("val").cast("double") / F.col("_m") + 0.5
        ).cast("int")
    )
    return e.select("vec_id", "dim", q.alias("q"))


ORACLE_QUANTIZE = """
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS m
  FROM embeddings
)
SELECT vec_id, CAST(t.range AS INT) AS dim,
       CASE WHEN m = 0.0 THEN 0
            ELSE CAST(floor(127.0 * CAST(embedding[t.range + 1] AS DOUBLE)
                            / m + 0.5) AS INT) END AS q
FROM m CROSS JOIN range(64) t
"""


def q_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss +-1 sign projection 64 -> 16 dims
    (similarity.random_projection) — the standard cheapening step in
    front of LSH banding / k-NN when the native dimension is wide.  Exact
    fixed-point: quantize once via the cross-engine floor(+0.5), then a
    +-1 dot product is an integer sum — order-independent, so the fold
    path, the Arrow matmul scale path, and this oracle are bit-identical
    (tests assert fold == arrow).  Emitted exploded (vec_id, dim, p) like
    quantize_int8, in units of 1/10^6."""
    e = load(spark, sf_dir, "embeddings")
    p = sim.random_projection(e, out_dim=16, method="fold")
    return p.select("vec_id", F.posexplode("proj").alias("dim", "p"))


ORACLE_RANDOM_PROJECTION = f"""
WITH q AS (
  SELECT vec_id,
         {sim.rp_quantize_sql("CAST(embedding AS DOUBLE[])")} AS qv
  FROM embeddings
), p AS (
  SELECT vec_id, {sim.rp_project_sql("qv", 64, 16)} AS proj FROM q
)
SELECT vec_id, CAST(t.range AS INT) AS dim, proj[t.range + 1] AS p
FROM p CROSS JOIN range(16) t
"""


def q_seasonal_residuals(spark, sf_dir):
    """Seasonal decomposition, the exact-arithmetic way: the hour-of-day
    profile per event_type is an exact decimal (sum, n) pair, the mean is
    ONE double division identical in both engines, and each event's
    residual subtracts that bit-identical mean — no averaged-of-averages
    drift anywhere.  Profile joins back broadcast (24×types rows)."""
    e = load(spark, sf_dir, "events")
    e = e.withColumn("hod", F.hour("ts"))
    dec = F.round(F.col("value"), 6).cast("decimal(18,6)")
    profile = (
        e.groupBy("event_type", "hod")
        .agg(
            F.sum(dec).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn("seasonal_mean", F.col("s") / F.col("n"))
        .drop("s")
    )
    return (
        e.join(F.broadcast(profile), ["event_type", "hod"])
        .select(
            "event_id",
            "event_type",
            "hod",
            "seasonal_mean",
            (F.col("value") - F.col("seasonal_mean")).alias("residual"),
        )
    )


ORACLE_SEASONAL = """
WITH e AS (
  SELECT event_id, event_type, value, CAST(hour(ts) AS INT) AS hod
  FROM events
),
profile AS (
  SELECT event_type, hod,
         CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE)
           / count(*) AS seasonal_mean,
         count(*) AS n
  FROM e GROUP BY 1, 2
)
SELECT e.event_id, e.event_type, e.hod, p.seasonal_mean,
       e.value - p.seasonal_mean AS residual
FROM e JOIN profile p ON e.event_type = p.event_type AND e.hod = p.hod
"""


def q_drawdown(spark, sf_dir):
    """Max drawdown per user over the ordered value series: running max
    minus current value, maximized — two stacked windows on ONE user
    partitioning, and only max/subtraction ops so no float-accumulation
    order exists to drift."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_max = F.max("value").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = run_max - F.col("value")
    return (
        e.withColumn("_dd", dd)
        .groupBy("user_id")
        .agg(
            F.max("_dd").alias("max_drawdown"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


ORACLE_DRAWDOWN = """
SELECT user_id, max(run_max - value) AS max_drawdown,
       count(*) AS n_events
FROM (
  SELECT user_id, value,
         max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS run_max
  FROM events
) t GROUP BY user_id
"""


def q_shortest_paths(spark, sf_dir):
    """Weighted shortest paths from node 0 over a synthetic weighted
    digraph on the nation keys — weights chosen so some cheaper-but-longer
    routes must beat direct hops, exercising true Bellman-Ford relaxation
    rather than hop counting; 10 rounds replayed by the unrolled-CTE
    oracle."""
    from carto_etl_spark.operators.graph import shortest_paths

    n = load(spark, sf_dir, "nation")
    edges = n.select(
        F.col("n_nationkey").alias("src"),
        ((2 * F.col("n_nationkey") + 1) % 25).alias("dst"),
        (1 + F.col("n_nationkey") % 5).alias("w"),
    ).union(
        n.select(
            F.col("n_nationkey"),
            ((3 * F.col("n_nationkey") + 2) % 25).alias("dst"),
            (3 + F.col("n_nationkey") % 7).alias("w"),
        )
    )
    return shortest_paths(
        edges, sources=[0], max_rounds=10, checkpoint_every=10
    )


def _oracle_shortest_paths():
    from carto_etl_spark.operators.graph import shortest_paths_oracle_sql

    edges_sql = (
        "SELECT n_nationkey AS src, (2 * n_nationkey + 1) % 25 AS dst,"
        " 1 + n_nationkey % 5 AS w FROM nation UNION ALL"
        " SELECT n_nationkey AS src, (3 * n_nationkey + 2) % 25 AS dst,"
        " 3 + n_nationkey % 7 AS w FROM nation"
    )
    return shortest_paths_oracle_sql(edges_sql, sources=[0], max_rounds=10)


def q_contingency(spark, sf_dir):
    """Chi-square independence scan: observed vs expected counts for the
    (event_type × hour-of-day) contingency table.  Marginals are window
    sums over the 120-cell aggregate (integers — exact), expected =
    row·col/total is integer products then ONE double division, and the
    per-cell chi² contribution is emitted UNAGGREGATED so no float-sum
    order exists; the analyst sums (or the oracle hashes) cells directly."""
    e = load(spark, sf_dir, "events")
    obs = (
        e.groupBy("event_type", F.hour("ts").alias("hod"))
        .agg(F.count(F.lit(1)).alias("o"))
    ).localCheckpoint(eager=False)
    row_t = F.sum("o").over(Window.partitionBy("event_type"))
    col_t = F.sum("o").over(Window.partitionBy("hod"))
    tot_df = obs.agg(F.sum("o").cast("long").alias("__tot"))
    cells = obs.crossJoin(F.broadcast(tot_df)).select(
        "event_type",
        "hod",
        "o",
        ((row_t * col_t).cast("double") / F.col("__tot")).alias("expected"),
    )
    contrib = (
        (F.col("o") - F.col("expected"))
        * (F.col("o") - F.col("expected"))
        / F.col("expected")
    )
    return cells.withColumn("chi2_cell", contrib)


ORACLE_CONTINGENCY = """
WITH obs AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hod, count(*) AS o
  FROM events GROUP BY 1, 2
),
cells AS (
  SELECT event_type, hod, o,
         CAST(sum(o) OVER (PARTITION BY event_type)
              * sum(o) OVER (PARTITION BY hod) AS DOUBLE)
           / sum(o) OVER () AS expected
  FROM obs
)
SELECT event_type, hod, o, expected,
       (o - expected) * (o - expected) / expected AS chi2_cell
FROM cells
"""


def q_latency_bands(spark, sf_dir):
    """Observability-style P50/P95/P99 per event_type by exact rank
    selection (rank = ceil(p·n) of the (value, event_id)-ordered series):
    the emitted percentiles are RAW data values — no interpolation, no
    arithmetic — so they hash bit-for-bit.  The rank formula keeps ceil on
    a DOUBLE product in BOTH engines: DuckDB's decimal 0.95·n would ceil
    differently than the binary double at exact-integer boundaries."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    d = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias(
            "n"
        ),
    )

    def pick(p):
        rank = F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("n")))
        return F.max(F.when(F.col("rn") == rank, F.col("value")))

    return d.groupBy("event_type").agg(
        F.max("n").alias("n"),
        pick(0.50).alias("p50"),
        pick(0.95).alias("p95"),
        pick(0.99).alias("p99"),
    )


ORACLE_LATENCY_BANDS = """
WITH d AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, max(n) AS n,
       max(CASE WHEN rn = greatest(1, ceil(CAST(0.50 AS DOUBLE) * n))
           THEN value END) AS p50,
       max(CASE WHEN rn = greatest(1, ceil(CAST(0.95 AS DOUBLE) * n))
           THEN value END) AS p95,
       max(CASE WHEN rn = greatest(1, ceil(CAST(0.99 AS DOUBLE) * n))
           THEN value END) AS p99
FROM d GROUP BY event_type
"""


def q_revenue_share(spark, sf_dir):
    """Ratio-to-report: each nation's share of global revenue.  Revenue
    sums are exact decimals; the share is ONE double division against the
    window total, so no averaged-average or rounding step exists."""
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    oo = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount").cast("decimal(18,2)"))
    )
    per_nation = (
        li.join(oo, li["l_orderkey"] == oo["o_orderkey"])
        .join(F.broadcast(c), oo["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(rev).cast("decimal(38,4)").alias("rev"))
    ).localCheckpoint(eager=False)
    total_df = per_nation.agg(
        F.sum("rev").cast("decimal(38,4)").alias("__total")
    )
    return per_nation.crossJoin(F.broadcast(total_df)).select(
        F.col("n_name").alias("nation"),
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / F.col("__total").cast("double")).alias(
            "share"
        ),
    )


ORACLE_REVENUE_SHARE = """
WITH per_nation AS (
  SELECT n.n_name AS nation,
         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
              AS DECIMAL(38,4)) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT nation, CAST(rev AS DOUBLE) AS revenue,
       CAST(rev AS DOUBLE)
         / CAST(sum(rev) OVER () AS DOUBLE) AS share
FROM per_nation
"""


def q_pagerank_nations(spark, sf_dir):
    """Weighted PageRank over the nation-level trade graph (customer nation
    -> supplier nation, weight = lineitem count).  Exact fixed-point integer
    iterations (operators/graph.py) make the result bit-identical across
    engines and partitionings; the oracle replays all 10 iterations as an
    unrolled CTE chain, so the iterative operator itself is what's checked."""
    from carto_etl_spark.operators.graph import pagerank

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # 25-node graph: lineage depth is trivial, so skip mid-run checkpoints
    # entirely — the whole loop plans as ONE job of chained shuffles (4x
    # faster than per-iteration materialization; measured 2.3s vs 10s sf0.1)
    pr = pagerank(edges, iterations=10, checkpoint_every=10)
    return pr.select(F.col("node").alias("nationkey"), "rank_scaled")


_PAGERANK_EDGES_SQL = """
SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
       CAST(count(*) AS BIGINT) AS w
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""


def _oracle_pagerank():
    from carto_etl_spark.operators.graph import pagerank_oracle_sql

    return (
        pagerank_oracle_sql(_PAGERANK_EDGES_SQL, iterations=10)
        .replace("SELECT node, rank AS rank_scaled",
                 "SELECT node AS nationkey, rank AS rank_scaled")
    )


def q_nation_profit(spark, sf_dir):
    """TPC-H Q9 shape adapted to the schema (no partsupp table: unit cost is
    proxied as 10% of p_retailprice): profit by supplier nation and order
    year over the widest fact join, part filter pushed into its scan and
    every dimension broadcast."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("%ol%"))
        .select("p_partkey", "p_retailprice")
    )
    # exact decimal terms (the source doubles are 2dp-valued, so the casts
    # are exact), x10 so the 10% cost factor needs no decimal division; the
    # single final /10.0 happens on a <2^53 exact double, so the result is
    # bit-identical across engines with NO rounding anywhere
    ext = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    retail = F.col("p_retailprice").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    amount_x10 = ext * (1 - disc) * 10 - retail * qty
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            (
                F.sum(amount_x10).cast("decimal(38,4)").cast("double")
                / 10.0
            ).alias("sum_profit")
        )
    )


ORACLE_NATION_PROFIT = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,2))) * 10
                     - CAST(p.p_retailprice AS DECIMAL(18,2))
                       * CAST(l.l_quantity AS DECIMAL(18,2)))
                 AS DECIMAL(38,4)) AS DOUBLE) / 10.0 AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%ol%'
GROUP BY 1, 2
"""


def q_rolling_features(spark, sf_dir):
    """Per-user rolling ML features over the event stream: lag-1 value and
    5-row trailing sum/min/max/count, one shuffle on the user partitioning
    (all five windows share it)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-4, 0)
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("lag1_value"),
        F.round(F.sum("value").over(frame), 2).alias("roll_sum5"),
        F.min("value").over(frame).alias("roll_min5"),
        F.max("value").over(frame).alias("roll_max5"),
        F.count("value").over(frame).alias("roll_cnt5"),
    )


ORACLE_ROLLING = """
SELECT event_id, user_id,
       lag(value) OVER w AS lag1_value,
       round(sum(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 2)
         AS roll_sum5,
       min(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         AS roll_min5,
       max(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         AS roll_max5,
       count(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         AS roll_cnt5
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_bfs_hops(spark, sf_dir):
    """Minimum hop distances from node 0 over a synthetic sparse digraph on
    the nation keys (i -> (2i+1)%25, i -> (3i+2)%25) — exercises multi-round
    relaxation with non-trivial distances; all-integer so the unrolled-CTE
    oracle matches bit-for-bit."""
    from carto_etl_spark.operators.graph import bfs_hops

    n = load(spark, sf_dir, "nation")
    edges = n.select(
        F.col("n_nationkey").alias("src"),
        ((2 * F.col("n_nationkey") + 1) % 25).alias("dst"),
    ).union(
        n.select(
            F.col("n_nationkey"),
            ((3 * F.col("n_nationkey") + 2) % 25).alias("dst"),
        )
    )
    return bfs_hops(edges, sources=[0], max_hops=8, checkpoint_every=8)


def _oracle_bfs():
    from carto_etl_spark.operators.graph import bfs_oracle_sql

    edges_sql = (
        "SELECT n_nationkey AS src, (2 * n_nationkey + 1) % 25 AS dst"
        " FROM nation UNION ALL"
        " SELECT n_nationkey AS src, (3 * n_nationkey + 2) % 25 AS dst"
        " FROM nation"
    )
    return bfs_oracle_sql(edges_sql, sources=[0], max_hops=8)


def q_quality_auc(spark, sf_dir):
    """Exact ROC AUC (operators/mlstats.py) of event value as a score for
    "is a purchase": the Mann-Whitney 2U statistic accumulates in integers
    over the distinct-value aggregate (bounded by value RESOLUTION, not row
    count), and AUC is the single final double division — the metric a
    pipeline runs to check that a quality score actually separates its
    classes."""
    from carto_etl_spark.operators.mlstats import auc

    e = load(spark, sf_dir, "events")
    return auc(e, "value", F.col("event_type") == "purchase")


def q_value_ks(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift check between the value
    distributions of 'error' and 'purchase' events, exact via the integer
    cross-product |cum_a*n_b - cum_b*n_a| (operators/mlstats.py)."""
    from carto_etl_spark.operators.mlstats import ks_statistic

    e = load(spark, sf_dir, "events")
    return ks_statistic(
        e,
        "value",
        F.col("event_type") == "error",
        F.col("event_type") == "purchase",
    )


def q_revenue_gini(spark, sf_dir):
    """Gini concentration of customer order spend: per-customer cents are
    exact decimal sums, the rank-weighted Gini sum stays in decimal(38,0),
    one double expression at the end (operators/mlstats.py)."""
    from carto_etl_spark.operators.mlstats import gini

    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("cents")
    )
    return gini(per_cust, "cents", "o_custkey")


def q_benford_digits(spark, sf_dir):
    """Leading-digit Benford profile of order totals — the fabricated-data
    screen.  Digit extraction is integer-only (cents -> decimal string),
    no log10/float formatting (operators/mlstats.py)."""
    from carto_etl_spark.operators.mlstats import benford

    return benford(load(spark, sf_dir, "orders"), "o_totalprice")


def q_corr_matrix(spark, sf_dir):
    """Pearson correlations of all lineitem measure pairs in ONE
    aggregation pass: exact decimal moments, correlation as a fixed
    IEEE double tree (operators/mlstats.py) — NOT the engine's corr(),
    whose float accumulation order is partition-dependent."""
    from carto_etl_spark.operators.mlstats import corr_matrix

    return corr_matrix(
        load(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def _oracle_quality_auc():
    from carto_etl_spark.operators.mlstats import auc_oracle_sql

    return auc_oracle_sql(
        "SELECT CAST(value AS DECIMAL(18,2)) AS v,"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y"
        " FROM events"
    )


def _oracle_value_ks():
    from carto_etl_spark.operators.mlstats import ks_oracle_sql

    return ks_oracle_sql(
        "SELECT CAST(value AS DECIMAL(18,2)) AS v,"
        " CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ya,"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS yb"
        " FROM events"
    )


def _oracle_revenue_gini():
    from carto_etl_spark.operators.mlstats import gini_oracle_sql

    return gini_oracle_sql(
        "SELECT o_custkey AS id,"
        " CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
        " AS DECIMAL(38,0))) AS BIGINT) AS x"
        " FROM orders GROUP BY o_custkey"
    )


def _oracle_benford():
    from carto_etl_spark.operators.mlstats import benford_oracle_sql

    return benford_oracle_sql("orders", "o_totalprice")


def _oracle_corr_matrix():
    from carto_etl_spark.operators.mlstats import corr_matrix_oracle_sql

    return corr_matrix_oracle_sql(
        "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def q_hashed_features(spark, sf_dir):
    """Feature-hashing bag-of-words (operators/text.py hashed_features):
    md5-prefix buckets (engine-reproducible, unlike xxhash64) mod 32,
    sparse (doc_id, feature, count) output; every 10th document keeps the
    emitted result compact while the operator runs its full plan shape."""
    from carto_etl_spark.operators.text import hashed_features

    d = load(spark, sf_dir, "documents").where(
        F.col("doc_id") % 10 == 0
    )
    return hashed_features(d, "text", ["doc_id"], dim=32)


def q_peak_concurrency(spark, sf_dir):
    """Peak interval overlap per event type: each event holds a resource
    for `value` seconds; the +1/-1 boundary sweep (operators/timeseries.py
    max_concurrency) finds the max number simultaneously live.  Integer
    counts over epoch-micro boundaries — exact, partitioned windows."""
    from carto_etl_spark.operators.timeseries import max_concurrency

    e = load(spark, sf_dir, "events")
    iv = e.select(
        "event_type",
        F.col("ts").alias("t_start"),
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.round(F.col("value") * 1000000).cast("long")
        ).alias("t_end"),
    )
    return max_concurrency(iv, "t_start", "t_end", ["event_type"])


def _oracle_hashed_features():
    from carto_etl_spark.operators.text import hashed_features_oracle_sql

    return hashed_features_oracle_sql(
        "SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0",
        ["doc_id"],
        dim=32,
    )


def _oracle_peak_concurrency():
    from carto_etl_spark.operators.timeseries import (
        max_concurrency_oracle_sql,
    )

    return max_concurrency_oracle_sql(
        "SELECT event_type, ts AS t_start,"
        " ts + to_microseconds(CAST(round(value * 1000000) AS BIGINT))"
        " AS t_end FROM events",
        ["event_type"],
    )


def q_item_affinity(spark, sf_dir):
    """Market-basket association: part pairs co-ordered in ≥2 orders with
    exact support and lift (operators/affinity.py — basket-bounded pair
    self-join, integer products, one double division)."""
    from carto_etl_spark.operators.affinity import item_pair_affinity

    li = load(spark, sf_dir, "lineitem")
    return item_pair_affinity(
        li, "l_orderkey", "l_partkey", min_pair_count=2
    )


def q_rfm_segments(spark, sf_dir):
    """RFM segmentation: per-customer recency/frequency/monetary quintiles
    with exact NTILE(5) semantics (custkey tiebreak — deterministic), then
    segment counts and exact monetary totals per (r, f, m) cell.  Each
    quintile comes from a DISTRIBUTED global rank + arithmetic tile
    (operators/ranking.py) — no single-partition ntile window.  The freq
    axis has few distinct values, so its range buckets degrade toward
    one-bucket-per-value; parallelism is bounded by the value domain there,
    which is still far from the one-task global sort this replaces."""
    o = load(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias(
            "last_order"
        ),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("cents"),
    )
    from carto_etl_spark.operators.ranking import (
        ntile_from_rank,
        with_global_ranks,
    )

    # Three independent total orders over the per-customer aggregate; pin
    # the (dimension-sized) aggregate once, then rank all three axes in ONE
    # shared pre-pass (with_global_ranks: one count + one joint boundary
    # sample + one grouping-sets bucket-count for every axis — 3 driver
    # jobs instead of the 9 three separate with_global_rank calls cost),
    # with the three windows chained in a single action.  No per-axis
    # equi-joins back on the customer key either: the ranks land as three
    # columns on one frame.
    # lazy checkpoint + count: the count action materializes the checkpoint
    # in the SAME job (eager=True would pay a separate materialization job)
    per = per.localCheckpoint(eager=False)
    n = per.count()
    ranked = with_global_ranks(
        per,
        {
            "__r_rank": ["last_order", "o_custkey"],
            "__f_rank": ["freq", "o_custkey"],
            "__m_rank": ["cents", "o_custkey"],
        },
        total=n,
    )
    banded = ranked.select(
        ntile_from_rank(F.col("__r_rank"), n, 5).alias("r_band"),
        ntile_from_rank(F.col("__f_rank"), n, 5).alias("f_band"),
        ntile_from_rank(F.col("__m_rank"), n, 5).alias("m_band"),
        "cents",
    )
    return banded.groupBy("r_band", "f_band", "m_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


ORACLE_RFM = """
WITH per AS (
  SELECT o_custkey,
         max(strftime(o_orderdate, '%Y-%m-%d')) AS last_order,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS DECIMAL(38,0))) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), banded AS (
  SELECT ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_band,
         ntile(5) OVER (ORDER BY freq, o_custkey) AS f_band,
         ntile(5) OVER (ORDER BY cents, o_custkey) AS m_band,
         cents
  FROM per
)
SELECT r_band, f_band, m_band,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM banded GROUP BY 1, 2, 3
"""


def _oracle_item_affinity():
    from carto_etl_spark.operators.affinity import (
        item_pair_affinity_oracle_sql,
    )

    return item_pair_affinity_oracle_sql(
        "SELECT l_orderkey AS basket, l_partkey AS item FROM lineitem",
        min_pair_count=2,
    )


def _synth_url_exprs():
    """Deterministic messy URLs from orders keys (the corpus is synthetic,
    so the crawl frontier is synthesized too — replayed by the oracle).
    Exercises every canonicalization rule: scheme/host case, ``www.``,
    default vs non-default ports, trailing slashes, tracking params,
    unsorted query params."""
    o, c = F.col("o_orderkey"), F.col("o_custkey")
    s = lambda e: e.cast("string")  # noqa: E731
    return F.concat(
        F.when(o % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http")),
        F.lit("://WWW.Shop"), s(c % 40), F.lit(".Example.COM"),
        F.when(o % 5 == 0,
               F.when(o % 2 == 0, F.lit(":443")).otherwise(F.lit(":80")))
         .when(o % 7 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/Catalog/Item-"), s(o % 500),
        F.when(o % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?id="), s(o % 100), F.lit("&utm_source=feed"),
        F.when(o % 6 == 0, F.lit("&b=2&a=1")).otherwise(F.lit("")),
        F.lit("&ref=aff"), s(o % 4),
    )


#: the synthesis above, replayed as DuckDB string concatenation.
_SYNTH_URL_SQL = """
  (CASE WHEN o_orderkey % 2 = 0 THEN 'HTTPS' ELSE 'http' END) ||
  '://WWW.Shop' || (o_custkey % 40) || '.Example.COM' ||
  (CASE WHEN o_orderkey % 5 = 0
        THEN (CASE WHEN o_orderkey % 2 = 0 THEN ':443' ELSE ':80' END)
        WHEN o_orderkey % 7 = 0 THEN ':8080' ELSE '' END) ||
  '/Catalog/Item-' || (o_orderkey % 500) ||
  (CASE WHEN o_orderkey % 3 = 0 THEN '/' ELSE '' END) ||
  '?id=' || (o_orderkey % 100) || '&utm_source=feed' ||
  (CASE WHEN o_orderkey % 6 = 0 THEN '&b=2&a=1' ELSE '' END) ||
  '&ref=aff' || (o_orderkey % 4)
"""

#: canonicalization replayed with DuckDB's independent function set
#: (string_split / list_filter / list_sort vs Spark's filter/array_sort).
_CANON_URL_SQL = r"""
parts AS (
  SELECT *,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         lower(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
         regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
         regexp_extract(url, '\?([^#]*)', 1) AS rawquery
  FROM u
), hostport AS (
  SELECT *,
         regexp_replace(regexp_extract(
             regexp_replace(auth, '^[^@]*@', ''),
             '^(\[[^\]]*\]|[^:]*)', 1), '^www\.', '') AS chost,
         regexp_extract(regexp_replace(auth, '^[^@]*@', ''),
                        ':(\d+)$', 1) AS port,
         CASE scheme WHEN 'http' THEN '80' WHEN 'https' THEN '443'
              WHEN 'ftp' THEN '21' END AS dport,
         -- COALESCE: array_to_string([]) is NULL in DuckDB, and an
         -- all-tracking-param query must canonicalize like an empty one
         -- (NULL would null the whole canonical_url through the CASE)
         COALESCE(array_to_string(list_sort(list_filter(
             string_split(rawquery, '&'),
             x -> NOT regexp_matches(x,
                 '^(?:utm_[^=]*|ref|fbclid|gclid|msclkid|mc_eid)=')
                  AND x <> '')), '&'), '') AS cq
  FROM parts
), canon AS (
  SELECT * EXCLUDE (scheme, auth, rawpath, rawquery, port, dport, cq),
         chost AS host,
         regexp_extract(chost, '([^.]+\.[^.]+)$', 1) AS domain,
         scheme || '://' || chost ||
         (CASE WHEN port = '' OR port = dport THEN ''
               ELSE ':' || port END) ||
         regexp_replace(rawpath, '/+$', '') ||
         (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS canonical_url
  FROM hostport
)
"""


def q_url_canonical(spark, sf_dir):
    """Crawl-URL canonicalization (operators/urls.py): lowercase
    scheme/host, strip ``www.`` and default ports, trim trailing slashes,
    drop tracking params and sort the rest.  Pure projection — rides the
    scan, no exchange (plan-gated in tests/test_urls.py)."""
    from carto_etl_spark.operators.urls import canonicalize

    o = load(spark, sf_dir, "orders")
    # widen: the canonicalize regex chain is per-row heavy and the toy
    # parquet yields a single scan split (no-op at scale — see widen())
    urls_df = widen(
        o.select("o_orderkey", _synth_url_exprs().alias("url")), spark
    )
    return canonicalize(urls_df, "url").select(
        "o_orderkey", "url", "canonical_url", "host", "domain"
    )


ORACLE_URL_CANONICAL = (
    "WITH u AS (SELECT o_orderkey, " + _SYNTH_URL_SQL + " AS url FROM orders), "
    + _CANON_URL_SQL
    + "SELECT o_orderkey, url, canonical_url, host, domain FROM canon"
)


def q_url_dedup(spark, sf_dir):
    """Canonical-URL dedup, the first pass over a web-crawl corpus: spelling
    variants of the same page (case, www, default port, trailing slash,
    tracking params) collapse to one canonical key; survivor is the minimum
    orderkey.  Content is custkey-driven so variants genuinely collide
    (~10 raw spellings per canonical at sf0.01).  One hash-aggregate keyed
    by canonical URL; a hot URL partial-aggs map-side before the exchange."""
    from carto_etl_spark.operators.urls import url_dedup

    o = load(spark, sf_dir, "orders")
    ok, c = F.col("o_orderkey"), F.col("o_custkey")
    s = lambda e: e.cast("string")  # noqa: E731
    url = F.concat(
        F.when(ok % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(ok % 3 == 0, F.lit("WWW.Shop")).otherwise(F.lit("shop")),
        s(c % 40), F.lit(".Example.COM"),
        F.when(ok % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"), s(c % 300),
        F.when(ok % 2 == 1, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_campaign=c"), s(ok % 9), F.lit("&id="), s(c % 10),
    )
    urls_df = widen(o.select("o_orderkey", url.alias("url")), spark)
    return url_dedup(urls_df, "url", "o_orderkey")


ORACLE_URL_DEDUP = (
    """
WITH u AS (
  SELECT o_orderkey,
         (CASE WHEN o_orderkey % 2 = 0 THEN 'HTTPS' ELSE 'https' END) ||
         '://' ||
         (CASE WHEN o_orderkey % 3 = 0 THEN 'WWW.Shop' ELSE 'shop' END) ||
         (o_custkey % 40) || '.Example.COM' ||
         (CASE WHEN o_orderkey % 5 = 0 THEN ':443' ELSE '' END) ||
         '/p/' || (o_custkey % 300) ||
         (CASE WHEN o_orderkey % 2 = 1 THEN '/' ELSE '' END) ||
         '?utm_campaign=c' || (o_orderkey % 9) || '&id=' || (o_custkey % 10)
           AS url
  FROM orders
), """
    + _CANON_URL_SQL
    + """
SELECT canonical_url,
       min(o_orderkey) AS survivor,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(count(DISTINCT url) AS BIGINT) AS n_spellings
FROM canon GROUP BY canonical_url
"""
)


def q_unicode_fold(spark, sf_dir):
    """Unicode normalization (operators/textnorm.py): NFC / NFKC forms and
    the NFKD-strip-casefold dedup key from ONE Arrow pandas-UDF pass (the
    justified-UDF case — Spark exposes no built-in normalizer).  The corpus
    is ASCII, so representative non-ASCII text is injected: combining vs
    precomposed ``é`` (doc-parity), the ``ﬁ`` ligature, ``ß`` (full case
    fold -> ``ss``, which lower() gets wrong), fullwidth ``１``,
    superscript ``²``, and ``Ä``.  The oracle re-derives with DuckDB's
    INDEPENDENT native functions (nfc_normalize / strip_accents) plus an
    explicit compat replace chain for the injected charset."""
    from carto_etl_spark.operators.textnorm import with_normalized

    d = load(spark, sf_dir, "documents")
    inj = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Caf"),
            # combining vs precomposed e-acute: same text, different bytes
            F.when(F.col("doc_id") % 2 == 0, F.lit("e\u0301"))
             .otherwise(F.lit("\u00e9")),
            F.lit(" \ufb01n STRA\u00dfE \uff11\u00b2 \u00c4"),
        ).alias("text"),
    )
    return with_normalized(widen(inj, spark), "text").select(
        "doc_id",
        F.md5("nfc").alias("nfc_md5"),
        F.md5("nfkc").alias("nfkc_md5"),
        F.md5("fold_key").alias("fold_md5"),
    )


ORACLE_UNICODE_FOLD = """
WITH inj AS (
  SELECT doc_id,
         text || ' Caf' ||
         (CASE WHEN doc_id % 2 = 0 THEN 'e' || chr(769) ELSE chr(233) END) ||
         ' ' || chr(64257) || 'n STRA' || chr(223) || 'E ' ||
         chr(65297) || chr(178) || ' ' || chr(196) AS text
  FROM documents
), forms AS (
  SELECT doc_id,
         nfc_normalize(text) AS nfc,
         nfc_normalize(replace(replace(replace(text,
             chr(64257), 'fi'), chr(65297), '1'), chr(178), '2')) AS nfkc
  FROM inj
)
SELECT doc_id,
       md5(nfc) AS nfc_md5,
       md5(nfkc) AS nfkc_md5,
       md5(lower(replace(strip_accents(nfkc), chr(223), 'ss'))) AS fold_md5
FROM forms
"""


def q_dataset_shuffle(spark, sf_dir):
    """Deterministic global shuffle (operators/shuffle.py): every document
    gets a (shard, position) that is a pure function of (seed, doc_id) —
    reproducible training order without `orderBy(rand())`'s global range
    sort or retry non-determinism.  One exchange keyed by range-sharded
    md5 prefix; sort is per-shard only (plan-gated)."""
    from carto_etl_spark.operators.shuffle import global_shuffle

    d = load(spark, sf_dir, "documents").select("doc_id")
    return global_shuffle(d, "doc_id", n_shards=8, seed=42)


def _oracle_dataset_shuffle():
    from carto_etl_spark.operators.shuffle import shuffle_oracle_sql

    return shuffle_oracle_sql(
        "SELECT doc_id FROM documents", "doc_id", n_shards=8, seed=42
    )


def _lsh_history_df(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return widen(d, spark)


def _lsh_batch_df(spark, sf_dir):
    """50% near-copies (every 10th doc + ' extra token'), 50% novel docs
    (disjoint synthetic vocab)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
    )
    nid = (F.col("doc_id") + 2000000).cast("string")
    novel = d.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit("zzq"), nid, F.lit(s)) for s in "abcde"],
        ).alias("text"),
    )
    return widen(near.unionByName(novel), spark)


def _lsh_build_index(spark, sf_dir, workdir):
    from carto_etl_spark.operators.dedup import minhash_signatures
    from carto_etl_spark.streaming.lshindex import append_to_index

    signed = minhash_signatures(
        _lsh_history_df(spark, sf_dir), "doc_id", "text", num_hashes=64
    )
    append_to_index(signed, workdir, "doc_id", bands=32)


def _lsh_match_summary(spark, sf_dir, workdir):
    from carto_etl_spark.streaming.lshindex import match_against_index

    hist = _lsh_history_df(spark, sf_dir)
    batch = _lsh_batch_df(spark, sf_dir)
    pairs = match_against_index(
        spark, batch, hist, workdir, "doc_id", "text",
        threshold=0.5, num_hashes=64, bands=32,
    )
    agg = pairs.groupBy(F.col("id_a").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("id_b").alias("best_match"),
    )
    # broadcast the per-batch match summary: it is bounded by the batch
    # size (one row per matched batch doc), but its lineage roots in the
    # checkpointed candidate list, whose missing stats otherwise planned a
    # SortMergeJoin that re-shuffled BOTH sides (r11 plan: the batch side
    # paid a stacked hash exchange over its widen exchange)
    return batch.select("doc_id").join(F.broadcast(agg), "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_matches"), F.lit(0)).alias("n_matches"),
        (F.coalesce(F.col("n_matches"), F.lit(0)) > 0).alias("is_dup"),
        "best_match",
    )


def q_incremental_near_dup(spark, sf_dir):
    """Incremental MinHash-LSH near-dup index (streaming/lshindex.py), FULL
    lifecycle in one entry: the documents table is indexed as history, then
    a batch of 50% near-copies and 50% novel docs is matched against it.
    Exact-Jaccard verification of LSH candidates + bands=32 recall
    >1-1e-9 at these similarities means the result equals DuckDB's exact
    bipartite Jaccard join — a green row proves index hashing, candidate
    generation, and verification at once.  (The bench measures the phases
    separately via q_lsh_index_build / q_lsh_match_steady: an incremental
    pipeline pays the build once and the match per batch.)"""
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="lshindex-")
    try:
        _lsh_build_index(spark, sf_dir, workdir)
        out = _lsh_match_summary(spark, sf_dir, workdir)
        # materialize before the index state disappears
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def q_lsh_index_build(spark, sf_dir):
    """Index-BUILD phase of the incremental near-dup index in isolation
    (signature + banding + atomic state append for the whole documents
    table).  Output is the state's per-band row count — every document
    contributes exactly one bucket row to each of the 32 bands (appends are
    per-id idempotent), so each band must hold count(documents) rows; the
    oracle replays that as a constant table: a derived-property check
    (bucket VALUES are xxhash64, which has no DuckDB twin — same convention
    as ORACLE_MINHASH_DEDUP).  The profile is one map-side-combined count,
    so the entry's wall time measures the BUILD, not verification."""
    import shutil
    import tempfile

    from carto_etl_spark.streaming.lshindex import _read_index

    workdir = tempfile.mkdtemp(prefix="lshbuild-")
    try:
        _lsh_build_index(spark, sf_dir, workdir)
        out = (
            _read_index(spark, workdir)
            .groupBy(F.col("band").cast("int").alias("band"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


#: derived-property oracle for the build phase: 32 bands, each carrying one
#: row per document, all documents distinct.
ORACLE_LSH_INDEX_BUILD = """
SELECT CAST(r.range AS INT) AS band,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows
FROM range(32) r
"""


#: per-process prebuilt index dirs for the steady-state match entry,
#: keyed by sf_dir; live until process exit (bench/driver processes are
#: short-lived, and steady-state reuse is exactly the point).
_LSH_STEADY_INDEX: dict = {}


def q_lsh_match_steady(spark, sf_dir):
    """Steady-state MATCH phase: the batch is matched against an index built
    ONCE per process (cached across bench iterations) — the number that
    matters for an incremental pipeline, where history indexing is sunk
    cost.  Output and oracle are identical to q_incremental_near_dup: the
    prebuilt index holds exactly the same state."""
    import os as _os
    import tempfile

    workdir = _LSH_STEADY_INDEX.get(sf_dir)
    if workdir is None or not _os.path.isdir(workdir):
        workdir = tempfile.mkdtemp(prefix="lshsteady-")
        _lsh_build_index(spark, sf_dir, workdir)
        _LSH_STEADY_INDEX[sf_dir] = workdir
    return _lsh_match_summary(spark, sf_dir, workdir)


# bipartite exact-Jaccard join (same normalization/shingling as the engine,
# mirroring ORACLE_MINHASH_DEDUP) between the synthesized batch and history.
ORACLE_INCREMENTAL_NEAR_DUP = r"""
WITH batch AS (
  SELECT doc_id + 1000000 AS doc_id, text || ' extra token' AS text
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT nid AS doc_id,
         'zzq' || nid || 'a zzq' || nid || 'b zzq' || nid || 'c zzq' ||
         nid || 'd zzq' || nid || 'e' AS text
  FROM (SELECT doc_id + 2000000 AS nid FROM documents WHERE doc_id % 10 = 5)
), bt AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     x -> x != '') AS t
  FROM batch
), bs AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                                      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
  FROM bt
), be AS (
  SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS g FROM bs
), ht AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                     x -> x != '') AS t
  FROM documents
), hs AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                                      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
  FROM ht
), he AS (
  SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS g FROM hs
), pairs AS (
  SELECT b.doc_id AS id_a, h.doc_id AS id_b
  FROM be b JOIN he h ON b.g = h.g
  GROUP BY b.doc_id, h.doc_id, b.sz, h.sz
  HAVING count(*) / (b.sz + h.sz - count(*)) >= 0.5
), agg AS (
  SELECT id_a AS doc_id, count(*) AS n_matches, min(id_b) AS best_match
  FROM pairs GROUP BY id_a
)
SELECT batch.doc_id,
       CAST(coalesce(n_matches, 0) AS BIGINT) AS n_matches,
       coalesce(n_matches, 0) > 0 AS is_dup,
       best_match
FROM batch LEFT JOIN agg ON batch.doc_id = agg.doc_id
"""


def q_html_extract(spark, sf_dir):
    """HTML-to-text extraction (operators/html.py): documents are wrapped
    in deterministic markup (title, style/script bodies, comments, the six
    common entities) and the extractor must recover the visible prose —
    codegen-only regexp chain, no UDF, no exchange (plan-gated in
    tests/test_html.py).  The oracle replays the same rewrite chain in
    DuckDB (Java-regex/RE2 common-subset patterns, like pii_scrub)."""
    from carto_etl_spark.operators.html import extract

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    s = F.col("doc_id").cast("string")
    page = d.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title> Doc &amp; "), s,
            F.lit(" </title><style>p{color:red}</style></head>"
                  "<body><script>var x="), s,
            F.lit(";</script><h1>Header "), s,
            F.lit("</h1><!-- hidden "), s,
            F.lit(' --><p>fish &lt;3 &quot;q&quot; A&amp;B&nbsp;'),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    return extract(page, "html").select(
        "doc_id",
        "title",
        F.md5("text").alias("text_md5"),
        F.length("text").alias("text_len"),
        "n_tags",
    )


ORACLE_HTML_EXTRACT = r"""
WITH page AS (
  SELECT doc_id,
         '<html><head><title> Doc &amp; ' || doc_id ||
         ' </title><style>p{color:red}</style></head><body><script>var x=' ||
         doc_id || ';</script><h1>Header ' || doc_id || '</h1><!-- hidden ' ||
         doc_id || ' --><p>fish &lt;3 &quot;q&quot; A&amp;B&nbsp;' || text ||
         '</p></body></html>' AS html
  FROM documents
), stripped AS (
  SELECT doc_id, html,
         regexp_replace(regexp_replace(regexp_replace(html,
             '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
             '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
             '(?s)<!--.*?-->', ' ', 'g') AS no_elems,
         regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1) AS rawtitle
  FROM page
), decoded AS (
  SELECT doc_id, html, rawtitle,
         replace(replace(replace(replace(replace(replace(
             regexp_replace(no_elems, '<[^>]+>', ' ', 'g'),
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS dectext,
         replace(replace(replace(replace(replace(replace(rawtitle,
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS dectitle
  FROM stripped
)
SELECT doc_id,
       trim(regexp_replace(dectitle, '\s+', ' ', 'g')) AS title,
       md5(trim(regexp_replace(dectext, '\s+', ' ', 'g'))) AS text_md5,
       CAST(length(trim(regexp_replace(dectext, '\s+', ' ', 'g'))) AS INTEGER)
         AS text_len,
       CAST(len(regexp_extract_all(html, '<[^>]+>')) AS INTEGER) AS n_tags
FROM decoded
"""


def q_blocklist_filter(spark, sf_dir):
    """Term-blocklist content filter (operators/blocklist.py): one
    case-insensitive word-boundary alternation per document flags blocked
    terms (a word and a two-word phrase from the corpus vocabulary) —
    codegen-only, no UDF, no exchange.  The oracle replays the same
    alternation in DuckDB."""
    from carto_etl_spark.operators.blocklist import flag

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return flag(d, "text", ("slow", "hash value")).select(
        "doc_id", "n_blocked", "blocked", "first_term"
    )


ORACLE_BLOCKLIST_FILTER = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
           '(?i)\b(?:hash value|slow)\b')) AS INTEGER) AS n_blocked,
       len(regexp_extract_all(text,
           '(?i)\b(?:hash value|slow)\b')) > 0 AS blocked,
       lower(regexp_extract(text, '(?i)\b(?:hash value|slow)\b'))
         AS first_term
FROM documents
"""


def _dhash_bits_sql(gray) -> tuple[str, str]:
    """(dh_lo, dh_hi) SQL from a ``gray(y, x) -> SQL string`` callback over
    the 9x8 dHash grid — shared by every image-hash oracle so the bit
    layout can never drift from multimodal.dhash_grid/image_dhash."""
    from carto_etl_spark.operators.multimodal import (
        DHASH_COLS,
        DHASH_ROWS,
        dhash_grid,
    )

    xs, ys = dhash_grid(16, 8)
    lo_terms, hi_terms = [], []
    for y in range(DHASH_ROWS):
        for x in range(DHASH_COLS - 1):
            idx = y * (DHASH_COLS - 1) + x
            cond = f"({gray(ys[y], xs[x])}) < ({gray(ys[y], xs[x + 1])})"
            if idx < 32:
                lo_terms.append(f"CASE WHEN {cond} THEN {1 << idx} ELSE 0 END")
            else:
                hi_terms.append(
                    f"CASE WHEN {cond} THEN {1 << (idx - 32)} ELSE 0 END"
                )
    return (
        "CAST(" + " + ".join(lo_terms) + " AS BIGINT)",
        "CAST(" + " + ".join(hi_terms) + " AS BIGINT)",
    )


def q_image_dhash(spark, sf_dir):
    """Perceptual image hash under the oracle gate (multimodal.image_dhash):
    the REAL PNG decode chain (chunk walk, zlib inflate, all five unfilter
    paths via id%5) feeds the dHash — integer grayscale, 9x8 grid,
    adjacent-column comparisons packed into two 32-bit halves.  The oracle
    recomputes every bit from the gradient generator's integer formula."""
    from carto_etl_spark.operators.multimodal import (
        image_dhash,
        synth_gradient_png_expr,
    )

    d = widen(load(spark, sf_dir, "documents"), spark).select(
        F.col("doc_id").alias("media_id")
    )
    src = d.withColumn("content", synth_gradient_png_expr(F.col("media_id")))
    return image_dhash(src)


def _build_oracle_image_dhash() -> str:
    def gray(y, x):
        k = y * 16 + x
        chans = " + ".join(
            f"((doc_id * 7 + {c * 31 + k}) % 256)" for c in range(3)
        )
        return f"({chans}) // 3"

    lo, hi = _dhash_bits_sql(gray)
    return f"""
SELECT doc_id AS media_id,
       CAST(16 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       {lo} AS dh_lo,
       {hi} AS dh_hi
FROM documents
"""


ORACLE_IMAGE_DHASH = _build_oracle_image_dhash()


def q_image_near_dup(spark, sf_dir):
    """Image near-duplicate pairs (multimodal.image_near_dup_pairs):
    pseudo-random PPM corpus (expected pairwise hamming ~32) plus a
    one-pixel-perturbed near-copy of every 25th document — the copies must
    come out within hamming 1 of their source via the 16-bit pigeonhole
    blocking join, never an all-pairs scan.  The oracle re-derives every
    dHash bit from the noise generator's integer formula and brute-forces
    the exact hamming join."""
    from carto_etl_spark.operators.multimodal import (
        image_dhash,
        image_near_dup_pairs,
        synth_noise_ppm_expr,
    )

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    copies = d.filter(F.col("media_id") % 25 == 0).select(
        (F.col("media_id") + 1000000).alias("media_id")
    )
    src = d.unionByName(copies).withColumn(
        "content", synth_noise_ppm_expr(F.col("media_id"))
    )
    return image_near_dup_pairs(image_dhash(src), max_hamming=2)


def _build_oracle_image_near_dup() -> str:
    def gray(y, x):
        terms = []
        for c in range(3):
            p = (y * 16 + x) * 3 + c
            v = (
                f"(('0x' || substr(md5(concat(CAST(src_id AS VARCHAR), "
                f"':{p}')), 1, 2))::BIGINT)"
            )
            if p == 0:
                v = f"(({v} + CASE WHEN is_copy THEN 128 ELSE 0 END) % 256)"
            terms.append(v)
        return "(" + " + ".join(terms) + ") // 3"

    lo, hi = _dhash_bits_sql(gray)
    return f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id AS src_id, FALSE AS is_copy
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS media_id, doc_id AS src_id, TRUE AS is_copy
  FROM documents WHERE doc_id % 25 = 0
), hashes AS (
  SELECT media_id, {lo} AS dh_lo, {hi} AS dh_hi FROM ids
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.dh_lo, b.dh_lo))
            + bit_count(xor(a.dh_hi, b.dh_hi)) AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dh_lo, b.dh_lo))
      + bit_count(xor(a.dh_hi, b.dh_hi)) <= 2
"""


ORACLE_IMAGE_NEAR_DUP = _build_oracle_image_near_dup()


def q_audio_fingerprint(spark, sf_dir):
    """Perceptual audio fingerprint (multimodal.audio_fingerprint): the
    REAL PCM-WAV decode feeds an energy-contour hash — integer |sample|
    sums over 65 fixed bins, bit b = energy[b] < energy[b+1], packed in
    the same two-32-bit-halves layout as the image dHash so the pigeonhole
    hamming pair join works on audio unchanged (pytest drives that
    composition).  Corpus = md5-noise clips per document plus a
    one-sample-pinned near-copy of every 25th; the oracle re-derives every
    sample, bin energy and bit from the generator's integer formula."""
    from carto_etl_spark.operators.multimodal import (
        audio_fingerprint,
        synth_noise_wav_expr,
    )

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    copies = d.filter(F.col("media_id") % 25 == 0).select(
        (F.col("media_id") + 1000000).alias("media_id")
    )
    src = widen(d.unionByName(copies), spark).withColumn(
        "content", synth_noise_wav_expr(F.col("media_id"))
    )
    return audio_fingerprint(src)


def _build_oracle_audio_fingerprint(n: int = 200) -> str:
    from carto_etl_spark.operators.multimodal import (
        AUDIO_FP_BINS,
        audio_fp_bounds,
    )

    def sample(j):
        v = (
            f"(('0x' || substr(md5(concat(CAST(src_id AS VARCHAR), "
            f"':{j}')), 1, 2))::BIGINT * 128 - 16384)"
        )
        if j == 0:
            v = f"(CASE WHEN is_copy THEN 16256 ELSE {v} END)"
        return f"abs({v})"

    bounds = audio_fp_bounds(n)

    def energy(b):
        return "(" + " + ".join(
            sample(j) for j in range(bounds[b], bounds[b + 1])
        ) + ")"

    lo_terms, hi_terms = [], []
    for b in range(AUDIO_FP_BINS - 1):
        cond = f"{energy(b)} < {energy(b + 1)}"
        if b < 32:
            lo_terms.append(f"CASE WHEN {cond} THEN {1 << b} ELSE 0 END")
        else:
            hi_terms.append(f"CASE WHEN {cond} THEN {1 << (b - 32)} ELSE 0 END")
    lo = "CAST(" + " + ".join(lo_terms) + " AS BIGINT)"
    hi = "CAST(" + " + ".join(hi_terms) + " AS BIGINT)"
    return f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id AS src_id, FALSE AS is_copy
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS media_id, doc_id AS src_id, TRUE AS is_copy
  FROM documents WHERE doc_id % 25 = 0
)
SELECT media_id, CAST({n} AS INTEGER) AS n_frames,
       {lo} AS dh_lo, {hi} AS dh_hi
FROM ids
"""


ORACLE_AUDIO_FP = _build_oracle_audio_fingerprint()


def q_scd2_dimension(spark, sf_dir):
    """Type-2 slowly-changing dimension (operators/scd.py): each customer's
    order-priority history becomes versioned validity intervals —
    consecutive identical observations collapse, valid_to = next version's
    start, the open version flags is_current.  One key-partitioned window
    chain (single hash exchange, no global sort).  The oracle replays the
    same run-collapse with DuckDB windows."""
    from carto_etl_spark.operators.scd import scd2_build

    o = load(spark, sf_dir, "orders")
    dim = scd2_build(
        o.select("o_custkey", "o_orderdate", "o_orderpriority", "o_orderkey"),
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderpriority"],
        tiebreak_cols=["o_orderkey"],
    )
    return dim.select(
        "o_custkey",
        "version",
        "o_orderpriority",
        "valid_from",
        "valid_to",
        "is_current",
    )


ORACLE_SCD2_DIMENSION = """
WITH ordered AS (
  SELECT o_custkey, o_orderdate, o_orderpriority, o_orderkey,
         CASE WHEN lag(o_orderpriority) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ) IS DISTINCT FROM o_orderpriority THEN 1 ELSE 0 END AS opens
  FROM orders
), runs AS (
  SELECT *, sum(opens) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS UNBOUNDED PRECEDING
         ) AS version
  FROM ordered
), vers AS (
  SELECT o_custkey, CAST(version AS BIGINT) AS version,
         min(o_orderpriority) AS o_orderpriority,
         min(o_orderdate) AS valid_from
  FROM runs GROUP BY o_custkey, version
)
SELECT o_custkey, version, o_orderpriority, valid_from,
       lead(valid_from) OVER (
         PARTITION BY o_custkey ORDER BY version
       ) AS valid_to,
       lead(valid_from) OVER (
         PARTITION BY o_custkey ORDER BY version
       ) IS NULL AS is_current
FROM vers
"""


def q_ann_pq(spark, sf_dir):
    """Product-quantization ANN (similarity.pq_codebooks/pq_encode/
    pq_adc_topk): the compression tier of the similarity stack (brute ->
    LSH buckets -> IVF lists -> PQ codes).  64-dim corpus -> 8 subspaces x
    16 codes (md5-sampled codebooks, engine-reproducible), asymmetric-
    distance top-5 for vec_id 0 over the code column only — at 100 TB the
    ADC scan reads ~32x less than the f32 vectors.  The oracle re-derives
    codebooks, per-subspace argmin codes, the query lookup table and the
    fixed-order ADC sum entirely in DuckDB; 6dp rounding absorbs the
    sqrt/square libm noise as in ORACLE_ANN_IVF."""
    e = load(spark, sf_dir, "embeddings")
    query = [float(v) for v in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    cbs = sim.pq_codebooks(e, n_sub=8, n_codes=16)
    # fold-form distances: the 8x16x8-term expansion fused with the ADC
    # projection crosses janino's 64KB method ceiling, so every run paid a
    # doomed ~2 s compile before the same interpreted eval (see q_ann_ivf).
    # Codes bit-identical (equality-tested).
    enc = sim.pq_encode(e, cbs, expansion=False)
    return sim.pq_adc_topk(enc, cbs, query, k=5)


def _build_oracle_ann_pq(n_sub: int = 8, w: int = 8) -> str:
    enc_cols = ",\n         ".join(
        f"(SELECT c FROM cb ORDER BY list_distance("
        f"list_slice(cast(e.embedding AS double[]), {s * w + 1}, {s * w + w}), "
        f"list_slice(cb.v, {s * w + 1}, {s * w + w})), c LIMIT 1) AS c{s}"
        for s in range(n_sub)
    )
    lut_cols = ",\n         ".join(
        f"power(list_distance(list_slice(q.v, {s * w + 1}, {s * w + w}), "
        f"list_slice(cb.v, {s * w + 1}, {s * w + w})), 2) AS d{s}"
        for s in range(n_sub)
    )
    joins = "\n".join(
        f"JOIN lut l{s} ON l{s}.c = enc.c{s}" for s in range(n_sub)
    )
    adc = " + ".join(f"l{s}.d{s}" for s in range(n_sub))
    return f"""
WITH cbrows AS (
  SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings
  ORDER BY md5(cast(vec_id AS varchar)), vec_id LIMIT 16
), cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v FROM cbrows
), q AS (
  SELECT cast(embedding AS double[]) AS v FROM embeddings WHERE vec_id = 0
), enc AS (
  SELECT e.vec_id,
         {enc_cols}
  FROM embeddings e
), lut AS (
  SELECT cb.c,
         {lut_cols}
  FROM cb, q
)
SELECT enc.vec_id, round({adc}, 6) AS adc_dist
FROM enc
{joins}
ORDER BY adc_dist, enc.vec_id LIMIT 5
"""


ORACLE_ANN_PQ = _build_oracle_ann_pq()


def q_group_quantiles(spark, sf_dir):
    """Per-group approximate quantiles (quantiles.group_sample_quantiles):
    price quartiles per return flag from per-group hash-threshold samples —
    fully distributed (group counts -> per-group float64 cutoff -> filter
    -> group-partitioned ranks -> probe explode), no driver state, so a
    million groups cost the same plan.  The oracle re-derives every stage
    per group in DuckDB."""
    from carto_etl_spark.operators import quantiles as qt

    li = load(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k"),
    )
    return qt.group_sample_quantiles(
        src, ["g"], "v", "k", [0.25, 0.5, 0.75], target_per_group=500
    )


def _oracle_group_quantiles() -> str:
    from carto_etl_spark.operators import quantiles as qt

    return qt.group_sample_quantiles_oracle_sql(
        "SELECT l_returnflag AS g, l_extendedprice AS v, "
        "l_orderkey * 8 + l_linenumber AS k FROM lineitem "
        "WHERE l_extendedprice IS NOT NULL",
        probs=[0.25, 0.5, 0.75],
        target_per_group=500,
    )


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup semantic deduplication (similarity.semantic_dedup): coarse
    clusters from the md5-sampled quantizer, within-cluster cosine >= 0.9
    against a lower id marks a duplicate (keep-min-id rule).  Corpus =
    embeddings plus an exact copy of every 40th vector; copies land in
    their source's cluster (identical distances, deterministic cid
    tie-break) and MUST come out flagged with dup_of = the source.  The
    oracle re-derives the whole pipeline — centroid sample, argmin
    assignment, pair join, min-covering id — in DuckDB."""
    e = load(spark, sf_dir, "embeddings")
    dup = e.filter(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    both = e.unionByName(dup)
    out = sim.semantic_dedup(both, n_clusters=8, threshold=0.9)
    return out.select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        "is_dup",
        "dup_of",
    )


def q_semantic_dedup_bulk(spark, sf_dir):
    """The applyInPandas SemDeDup scale path (semantic_dedup_bulk: Arrow
    bulk coarse assignment + per-cluster normalized Gram-matrix blocks)
    under the SAME oracle as the DataFrame twin — equality of the two
    implementations on planted duplicates IS the correctness claim.  The
    Gram accumulation order differs from the fold by ulps, but every pair
    on this corpus sits far from the 0.9 boundary (planted copies ~1.0,
    natural pairs <0.8), so the threshold decision is stable."""
    e = load(spark, sf_dir, "embeddings")
    dup = e.filter(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    both = e.unionByName(dup)
    return sim.semantic_dedup_bulk(both, n_clusters=8, threshold=0.9)


ORACLE_SEMANTIC_DEDUP = """
WITH both_v AS (
  SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, cast(embedding AS double[]) AS v
  FROM embeddings WHERE vec_id % 40 = 0
),
cents AS (
  SELECT vec_id AS cid, v AS cv FROM both_v
  ORDER BY md5(cast(vec_id AS varchar)), vec_id LIMIT 8
),
assigned AS (
  SELECT b.vec_id, b.v,
         (SELECT cid FROM cents
          ORDER BY list_distance(cents.cv, b.v), cid LIMIT 1) AS cluster
  FROM both_v b
),
dups AS (
  SELECT b.vec_id, min(a.vec_id) AS dup_of
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
        / nullif(sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v)), 0) >= 0.9
  GROUP BY b.vec_id
)
SELECT s.vec_id, s.cluster, d.dup_of IS NOT NULL AS is_dup, d.dup_of
FROM assigned s LEFT JOIN dups d USING (vec_id)
"""


def q_streaming_quantiles(spark, sf_dir):
    """Streaming quantile state (streaming/quantile.py): lineitem fed
    through ``track_quantiles`` (adaptive-level hash-threshold sample,
    cap=512) as an availableNow file stream.  The final (level, sample)
    pair is a pure function of the data SET — the final level is provably
    min {L : |hash < cutoff(L)| <= cap} over the whole stream, independent
    of batch boundaries (split/replay invariance is pinned in
    tests/test_streaming_quantile.py) — so the oracle re-derives the
    ENTIRE state in DuckDB (level search, sample filter, rank targets)
    and checks the quantile estimates value-for-value; a genuinely
    streaming pipeline graded by an exact batch oracle."""
    import shutil
    import tempfile

    from carto_etl_spark.streaming.quantile import (
        state_quantiles,
        track_quantiles,
    )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k"),
    )
    workdir = tempfile.mkdtemp(prefix="qstream-")
    try:
        src = f"{workdir}/src"
        li.drop("l_orderkey").write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("v double, k long").option(
            "recursiveFileLookup", "true"
        ).parquet(src)
        q = track_quantiles(
            stream, "v", "k", state_dir=f"{workdir}/state", cap=512,
            checkpoint=f"{workdir}/ck",
        )
        q.awaitTermination(300)
        out = state_quantiles(
            spark, f"{workdir}/state", [0.25, 0.5, 0.75]
        )
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _build_oracle_streaming_quantiles() -> str:
    from carto_etl_spark.operators.sampling import hash_sql
    from carto_etl_spark.streaming.quantile import MAX_LEVEL, level_cutoff

    levels_values = ", ".join(
        f"({lv}, {level_cutoff(lv)})" for lv in range(MAX_LEVEL + 1)
    )
    probs_values = ", ".join(
        f"(CAST({q!r} AS DOUBLE))" for q in (0.25, 0.5, 0.75)
    )
    h = hash_sql("k", 0)
    return f"""
WITH src AS (
  SELECT l_extendedprice AS v, l_orderkey * 8 + l_linenumber AS k
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
tot AS (SELECT count(*) AS n FROM src),
levels(l, cut) AS (VALUES {levels_values}),
counts AS (
  SELECT l, cut,
         (SELECT count(*) FROM src WHERE {h} < cut) AS m
  FROM levels
),
chosen AS (
  SELECT l, cut, m FROM counts WHERE m <= 512 ORDER BY l LIMIT 1
),
samp AS (
  SELECT v, k FROM src, chosen WHERE {h} < chosen.cut
),
ranked AS (SELECT v, row_number() OVER (ORDER BY v, k) AS r FROM samp),
probes(q) AS (VALUES {probs_values}),
tgt AS (
  SELECT q, greatest(1, least(m, CAST(ceil(q * m) AS BIGINT))) AS r_tgt, m, l
  FROM probes, chosen
)
SELECT tgt.q, ranked.v AS est, tgt.m AS sample_m, tot.n AS n_total,
       CAST(tgt.l AS INTEGER) AS level
FROM tgt JOIN ranked ON ranked.r = tgt.r_tgt, tot
"""


ORACLE_STREAMING_QUANTILES = _build_oracle_streaming_quantiles()


def q_sample_quantiles(spark, sf_dir):
    """Mergeable approximate quantiles with self-graded error
    (operators/quantiles.py): deterministic hash-threshold sample ->
    range-bucketed sample ranks -> lower empirical quantile per probe ->
    one conditional-aggregate pass computes each estimate's EXACT rank in
    the full table.  The oracle re-derives every stage (count, float64
    cutoff, Lehmer hash filter, rank targets, estimates, error pass) in
    DuckDB, so a green row proves the whole sketch, not just the output
    shape.  Probes are binary fractions so ceil(q*m) and the error
    divisions are bit-identical across engines."""
    from carto_etl_spark.operators import quantiles as qt

    li = load(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k"),
    )
    return qt.sample_quantiles(
        src, "v", "k", [0.25, 0.5, 0.75], target_sample=2000
    )


def _oracle_sample_quantiles() -> str:
    from carto_etl_spark.operators import quantiles as qt

    return qt.sample_quantiles_oracle_sql(
        "SELECT l_extendedprice AS v, l_orderkey * 8 + l_linenumber AS k "
        "FROM lineitem WHERE l_extendedprice IS NOT NULL",
        probs=[0.25, 0.5, 0.75],
        target_sample=2000,
    )


def q_bpe_merges(spark, sf_dir):
    """BPE tokenizer training (operators/bpe.py): word-frequency table
    from the documents corpus -> 10 learned merge rules.  The merge loop
    is the real distributed algorithm (pair explode + weighted hash-agg +
    scan-stage rewrite per iteration, lineage kept one merge deep); the
    oracle unrolls all 10 iterations in SQL — pair counting, the
    (count DESC, left, right) argmax, and the space-doubling rewrite whose
    sequential ``replace`` semantics are identical in both engines — so a
    green row proves every selected pair and every intermediate corpus
    state, not just the output shape."""
    from carto_etl_spark.operators.bpe import train_bpe, word_counts

    docs = load(spark, sf_dir, "documents")
    return train_bpe(word_counts(docs, "text"), n_merges=10)


_BPE_RULES: dict = {}


def q_bpe_tokenize(spark, sf_dir):
    """BPE tokenization with learned merges (operators/bpe.py): segment
    every document with 10 rules trained on the corpus — the inference
    half of the tokenizer.  Training runs ONCE per process and the rules
    are cached (training is deterministic, so this is pure memoization —
    same precedent as q_lsh_match_steady: an inference pipeline pays
    training once and tokenization per batch, and the bench should price
    the steady state; q_bpe_merges prices training itself).  Application
    is a chain of scan-stage string projections (no shuffle, no UDF:
    plan-gated), so tokenizing 100 TB costs one codegen pass over the
    corpus.  Output is per-doc token count and the full token sequence;
    the oracle re-trains the merges AND replays the segmentation in SQL."""
    from carto_etl_spark.operators.bpe import apply_bpe, train_bpe, word_counts

    docs = load(spark, sf_dir, "documents")
    rules = _BPE_RULES.get(sf_dir)
    if rules is None:
        merges = train_bpe(word_counts(docs, "text"), n_merges=10)
        # rule ORDER is load-bearing for apply_bpe — pin it explicitly
        rules = [
            (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
        ]
        _BPE_RULES[sf_dir] = rules
    out = apply_bpe(widen(docs, spark), "text", rules)
    return out.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.concat_ws(" ", "tokens").alias("token_str"),
    )


def _bpe_merge_ctes(n_merges: int) -> str:
    """Shared WITH-chain re-deriving the full BPE training loop in DuckDB:
    words -> w0 (wrapped char strings) -> [pK (pair counts), mK (argmax),
    wK (rewrite)] x n_merges.  Mirrors operators/bpe.py exactly."""
    parts = [
        """words AS (
  SELECT word, count(*) AS cnt FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
    FROM documents)
  WHERE word != '' GROUP BY word
),
w0 AS (
  SELECT ' ' || trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' ' AS s,
         CAST(cnt AS BIGINT) AS cnt
  FROM words
)"""
    ]
    for k in range(1, n_merges + 1):
        prev = f"w{k - 1}"
        parts.append(
            f"""p{k} AS (
  SELECT t1, t2, sum(cnt) AS c FROM (
    SELECT a[i] AS t1, a[i + 1] AS t2, cnt FROM (
      SELECT string_split(trim(s), ' ') AS a, cnt,
             unnest(generate_series(1, len(string_split(trim(s), ' ')) - 1)) AS i
      FROM {prev}))
  GROUP BY t1, t2
),
m{k} AS (SELECT t1, t2, c FROM p{k} ORDER BY c DESC, t1, t2 LIMIT 1),
w{k} AS (
  SELECT replace(replace(replace(s, ' ', '  '),
                         ' ' || m{k}.t1 || '  ' || m{k}.t2 || ' ',
                         ' ' || m{k}.t1 || m{k}.t2 || ' '),
                 '  ', ' ') AS s, cnt
  FROM {prev}, m{k}
)"""
        )
    return ",\n".join(parts)


def _oracle_bpe_merges(n_merges: int = 10) -> str:
    selects = "\nUNION ALL\n".join(
        f'SELECT {k} AS rank, t1 AS "left", t2 AS "right", '
        f"t1 || t2 AS merged, CAST(c AS BIGINT) AS pair_count FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + _bpe_merge_ctes(n_merges)
        + f"\nSELECT CAST(rank AS INTEGER) AS rank, \"left\", \"right\", "
        f"merged, pair_count FROM ({selects})"
    )


def _oracle_bpe_tokenize(n_merges: int = 10) -> str:
    chain = [
        """d0 AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(lower(text), '[a-z]+'),
                        w -> ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ') AS sp
  FROM documents
)"""
    ]
    for k in range(1, n_merges + 1):
        chain.append(
            f"""d{k} AS (
  SELECT doc_id,
         list_transform(sp, s -> replace(replace(replace(s, ' ', '  '),
                                ' ' || m{k}.t1 || '  ' || m{k}.t2 || ' ',
                                ' ' || m{k}.t1 || m{k}.t2 || ' '),
                        '  ', ' ')) AS sp
  FROM d{k - 1}, m{k}
)"""
        )
    return (
        "WITH "
        + _bpe_merge_ctes(n_merges)
        + ",\n"
        + ",\n".join(chain)
        + f""",
toks AS (
  SELECT doc_id,
         flatten(list_transform(sp, s -> string_split(trim(s), ' '))) AS tk
  FROM d{n_merges}
)
SELECT doc_id,
       CAST(len(tk) AS INTEGER) AS n_tokens,
       COALESCE(array_to_string(tk, ' '), '') AS token_str
FROM toks"""
    )


def q_quant_recall(spark, sf_dir):
    """Scalar int8 embedding quantization audited by recall
    (operators/quantize.py): quantize the whole corpus (scan-stage
    transform, no shuffle), score 20 query vectors against it with BOTH the
    exact cosine and the integer-code cosine (one broadcast pass — the
    corpus is read once, queries ride along broadcast), and report per
    query the exact-vs-quantized top-10 overlap, the summed micro-unit
    score error over the exact top-10, and the query's integer code norm.
    Every double op is order-mirrored in the oracle, so the codes, both
    cosines, and the recall counts are bit-identical across engines — the
    oracle re-derives the entire quantizer in SQL, not just the output
    shape."""
    from carto_etl_spark.operators import quantize as qt

    e = load(spark, sf_dir, "embeddings")
    corpus = qt.quantize_int8(e).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        "q_vec",
    )
    queries = corpus.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("q_vec").alias("qq"),
        qt.int_dot_expr(F.col("q_vec"), F.col("q_vec")).alias("q_norm2"),
    )
    micro = F.lit(1000000.0)
    pairs = corpus.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "q_norm2",
        "vec_id",
        F.round(sim.cosine_fixed_expr("emb", "qemb", 64) * micro)
        .cast("long")
        .alias("ecos_u"),
        F.round(
            qt.quantized_cosine_fixed_expr("q_vec", "qq", 64) * micro
        )
        .cast("long")
        .alias("qcos_u"),
    )
    w_e = Window.partitionBy("query_id").orderBy(
        F.desc("ecos_u"), F.col("vec_id")
    )
    w_q = Window.partitionBy("query_id").orderBy(
        F.desc("qcos_u"), F.col("vec_id")
    )
    ranked = pairs.withColumn("rn_e", F.row_number().over(w_e)).withColumn(
        "rn_q", F.row_number().over(w_q)
    )
    return ranked.groupBy("query_id", "q_norm2").agg(
        F.sum(
            F.when((F.col("rn_e") <= 10) & (F.col("rn_q") <= 10), 1).otherwise(0)
        )
        .cast("int")
        .alias("hits"),
        F.sum(
            F.when(F.col("rn_e") <= 10, F.abs(F.col("qcos_u") - F.col("ecos_u")))
        ).alias("sum_err_u"),
    )


ORACLE_QUANT_RECALL = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), qz AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
  FROM base
), codes AS (
  SELECT vec_id, emb,
         CASE WHEN scale = 0.0
              THEN list_transform(emb, x -> CAST(0 AS DOUBLE))
              ELSE list_transform(emb, x -> floor(x / scale + 0.5)) END AS q
  FROM qz
), queries AS (
  SELECT vec_id AS query_id, emb AS qemb, q AS qq,
         CAST(list_dot_product(q, q) AS BIGINT) AS q_norm2
  FROM codes WHERE vec_id < 20
), pairs AS (
  SELECT query_id, q_norm2, c.vec_id,
         CAST(round((list_dot_product(c.emb, qemb)
               / nullif(sqrt(list_dot_product(c.emb, c.emb))
                        * sqrt(list_dot_product(qemb, qemb)), 0.0))
              * 1000000.0) AS BIGINT) AS ecos_u,
         CAST(round((list_dot_product(c.q, qq)
               / nullif(sqrt(list_dot_product(c.q, c.q))
                        * sqrt(list_dot_product(qq, qq)), 0.0))
              * 1000000.0) AS BIGINT) AS qcos_u
  FROM codes c, queries
), ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ecos_u DESC, vec_id) AS rn_e,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY qcos_u DESC, vec_id) AS rn_q
  FROM pairs
)
SELECT query_id, q_norm2,
       CAST(sum(CASE WHEN rn_e <= 10 AND rn_q <= 10 THEN 1 ELSE 0 END)
            AS INTEGER) AS hits,
       CAST(sum(CASE WHEN rn_e <= 10 THEN abs(qcos_u - ecos_u) END)
            AS BIGINT) AS sum_err_u
FROM ranked GROUP BY query_id, q_norm2
"""


def q_export_shards(spark, sf_dir):
    """Sharded JSONL dataset export (operators/export.py): write the
    documents table as 16 deterministic JSONL shards + manifest, then read
    the ACTUAL files back (text -> from_json) and aggregate per shard —
    count, key sums, and an md5 content checksum of every text value — so
    a green row proves the real write/read round-trip preserved every
    document byte-for-byte and put it in the oracle-predicted shard.  The
    oracle replays the md5 range-shard assignment and the same aggregates
    straight from the source table."""
    import shutil
    import tempfile

    from carto_etl_spark.operators import export as ex

    docs = load(spark, sf_dir, "documents")
    workdir = tempfile.mkdtemp(prefix="export-")
    try:
        path = f"{workdir}/out"
        ex.export_jsonl(docs, path, n_shards=16, key_col="doc_id")
        ex.write_manifest(docs, path, n_shards=16, key_col="doc_id")
        back = ex.read_jsonl(spark, path, docs.schema)
        text_ck = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast(
            "long"
        )
        out = back.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum("n_chars").alias("sum_n_chars"),
            F.sum(text_ck).alias("text_checksum"),
        )
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_EXPORT_SHARDS = """
WITH sharded AS (
  SELECT *,
         CAST(floor((('0x' || substr(md5('0' || ':' || doc_id), 1, 8))::BIGINT
                     * 16) / 4294967296.0) AS INTEGER) AS shard
  FROM documents
)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
       CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT)
           AS text_checksum
FROM sharded GROUP BY shard
"""


def q_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): the corpus
    word-adjacency graph (text.py:cooccurrence_edges — one scan, pair-table
    shuffles only) ranked by the exact-integer PageRank of
    operators/graph.py, top-20 by (rank DESC, word).  A composition entry:
    the oracle chains the edge-table SQL twin into the unrolled 10-iteration
    PageRank CTE chain, so the whole text->graph->rank pipeline is
    value-checked end-to-end.  Top-k is a TakeOrdered tree-aggregate, not a
    global sort."""
    from carto_etl_spark.operators.graph import pagerank

    docs = load(spark, sf_dir, "documents")
    edges = tx.cooccurrence_edges(docs, "text")
    pr = pagerank(edges, iterations=10, checkpoint_every=10)
    return (
        pr.orderBy(F.desc("rank_scaled"), F.col("node"))
        .limit(20)
        .select(F.col("node").alias("word"), "rank_scaled")
    )


def _oracle_textrank() -> str:
    from carto_etl_spark.operators.graph import pagerank_oracle_sql
    from carto_etl_spark.operators.text import cooccurrence_edges_sql

    edges = cooccurrence_edges_sql("SELECT text FROM documents", "text")
    return (
        pagerank_oracle_sql(edges, iterations=10).replace(
            "SELECT node, rank AS rank_scaled",
            "SELECT node AS word, rank AS rank_scaled",
        )
        + "\nORDER BY rank_scaled DESC, word LIMIT 20"
    )


_MIX_WEIGHTS = {"src0": 8.0, "src1": 4.0}


def q_mixture_epoch(spark, sf_dir):
    """Dataset mixture planning + epoch materialization
    (operators/mixing.py): compose a 3x-corpus training epoch where src0
    gets 8x weight and src1 4x — over-sampled sources repeat whole passes
    plus a deterministic hash-sampled fraction, under-sampled ones keep a
    fraction, all via one broadcast plan + scan-stage explode (no shuffle
    in the expansion).  Output is per (source, copy) doc/char totals; the
    oracle re-derives the plan arithmetic (weight normalization, repeat
    factors, hash-unit thresholds) AND replays the row-level expansion, so
    every copy decision is value-checked."""
    from carto_etl_spark.operators import mixing as mx

    docs = load(spark, sf_dir, "documents")
    plan = mx.epoch_plan(docs, "source", "n_chars", _MIX_WEIGHTS)
    epoch = mx.materialize_epoch(docs, plan, "source", "doc_id")
    return epoch.groupBy("source", "copy_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def _oracle_mixture_epoch() -> str:
    from carto_etl_spark.operators.mixing import (
        epoch_counts_sql,
        epoch_plan_sql,
    )

    plan = epoch_plan_sql(
        "SELECT * FROM documents", "source", "n_chars", _MIX_WEIGHTS
    )
    return epoch_counts_sql(
        "SELECT * FROM documents", plan, "source", "doc_id", "n_chars"
    ).replace("sum_n_chars", "sum_chars")


def q_pareto_parts(spark, sf_dir):
    """Pareto frontier / skyline (operators/skyline.py): the parts not
    dominated on (retail price, size) — minimize both.  The engine runs the
    distributed sort-scan (range-bucketed prefix-min, no single-partition
    window, no O(n²) join); the oracle is the brute-force dominance
    anti-join, so the two derivations share nothing but the semantics."""
    from carto_etl_spark.operators.skyline import pareto_frontier

    p = load(spark, sf_dir, "part")
    return pareto_frontier(p, "p_retailprice", "p_size")


def _oracle_pareto() -> str:
    from carto_etl_spark.operators.skyline import pareto_frontier_sql

    return pareto_frontier_sql(
        "SELECT p_retailprice, p_size FROM part", "p_retailprice", "p_size"
    )


def q_streaming_export(spark, sf_dir):
    """Streaming JSONL shard export (streaming/export.py): the documents
    table replayed as a multi-micro-batch file stream through the
    exactly-once content-addressed sink, then every complete batch read
    BACK from disk and aggregated per shard.  Because shard assignment is
    a pure per-row function shared with the batch sink, the union of the
    streamed batches equals one batch export of the whole corpus — so the
    oracle is the SAME per-shard derivation as export_shards, and a green
    row proves the incremental write path end-to-end (replay/crash
    behavior is pinned in tests/test_streaming_export.py)."""
    import shutil
    import tempfile

    from carto_etl_spark.streaming.export import (
        read_stream_export,
        stream_export_jsonl,
    )

    docs = load(spark, sf_dir, "documents")
    workdir = tempfile.mkdtemp(prefix="sexport-")
    try:
        src = f"{workdir}/src"
        docs.write.parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(src)
        )
        q = stream_export_jsonl(
            stream,
            f"{workdir}/out",
            n_shards=16,
            key_col="doc_id",
            checkpoint=f"{workdir}/ckpt",
        )
        q.awaitTermination(300)
        back = read_stream_export(spark, f"{workdir}/out", docs.schema)
        text_ck = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast(
            "long"
        )
        out = back.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum("n_chars").alias("sum_n_chars"),
            F.sum(text_ck).alias("text_checksum"),
        )
        return local_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def q_ann_ivf_sq8(spark, sf_dir):
    """IVF-SQ8 approximate top-5 (the standard FAISS composition): the
    hash-sampled coarse quantizer prunes to nprobe lists, and candidates
    are scored with the int8 quantized cosine (operators/quantize.py) —
    the index stores 4x-compressed codes and the scan does integer dot
    products.  The oracle re-derives BOTH halves in SQL: the whole IVF
    index (centroid sample, assignment, probe set) and the whole
    quantizer (codes, scale-cancelling cosine), so a green row proves the
    composition end-to-end."""
    from carto_etl_spark.operators import quantize as qt

    e = load(spark, sf_dir, "embeddings")
    centroids = sim.sampled_centroids(e, n_lists=8)
    qz = qt.quantize_int8(e)
    # fold distances: see q_ann_ivf — the literal expansion's argmin method
    # cannot JIT and its doomed janino compile cost ~2 s per run here
    indexed = sim.assign_ivf_lists(qz, centroids, expansion=False)
    qrow = qz.filter(F.col("vec_id") == 0).select("embedding", "q_vec").first()
    query = [float(v) for v in qrow["embedding"]]
    qq_sql = "array(" + ", ".join(f"{int(v)}L" for v in qrow["q_vec"]) + ")"
    probes = sim.probe_lists(centroids, query, nprobe=3)
    cands = indexed.filter(F.col("ivf_list").isin(probes))
    qcos_u = F.round(
        qt.quantized_cosine_fixed_expr("q_vec", qq_sql, len(query))
        * F.lit(1000000.0)
    ).cast("long")
    return (
        cands.select("vec_id", qcos_u.alias("qcos_u"))
        .orderBy(F.desc("qcos_u"), F.col("vec_id"))
        .limit(5)
    )


ORACLE_ANN_IVF_SQ8 = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), qz AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM base
), codes AS (
  SELECT vec_id, v,
         CASE WHEN scale = 0.0
              THEN list_transform(v, x -> CAST(0 AS DOUBLE))
              ELSE list_transform(v, x -> floor(x / scale + 0.5)) END AS q
  FROM qz
), cents AS (
  SELECT vec_id AS cid, v AS cv FROM base
  ORDER BY md5(cast(vec_id AS varchar)), vec_id LIMIT 8
), qv AS (SELECT v, q AS qq FROM codes WHERE vec_id = 0),
probes AS (
  SELECT cid FROM cents, qv ORDER BY list_distance(cv, qv.v), cid LIMIT 3
), assigned AS (
  SELECT c.vec_id, c.q,
         (SELECT cid FROM cents
          ORDER BY list_distance(cents.cv, c.v), cid LIMIT 1) AS lst
  FROM codes c
)
SELECT a.vec_id,
       CAST(round((list_dot_product(a.q, qv.qq)
             / nullif(sqrt(list_dot_product(a.q, a.q))
                      * sqrt(list_dot_product(qv.qq, qv.qq)), 0.0))
            * 1000000.0) AS BIGINT) AS qcos_u
FROM assigned a, qv
WHERE a.lst IN (SELECT cid FROM probes)
ORDER BY qcos_u DESC, a.vec_id LIMIT 5
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "top_orders_per_customer": q_top_orders_per_customer,
    "shipping_priority": q_shipping_priority,
    "region_volume": q_region_volume,
    "mktsegment_stats": q_mktsegment_stats,
    "locale_float_coercion": q_locale_float_coercion,
    "dual_format_dates": q_dual_format_dates,
    "update_merge": q_update_merge,
    "delete_antijoin": q_delete_antijoin,
    "chunk_assignment": q_chunk_assignment,
    "row_range": q_row_range,
    "threeway_fanout": q_threeway_fanout,
    "geom_points": q_geom_points,
    "wkb_points": q_wkb_points,
    "utm_transform": q_utm_transform,
    "lcc_transform": q_lcc_transform,
    "stateplane_transform": q_stateplane_transform,
    "albers_transform": q_albers_transform,
    "bng_transform": q_bng_transform,
    "swiss_transform": q_swiss_transform,
    "polar_transform": q_polar_transform,
    "datum_shift": q_datum_shift,
    "transactional_lifecycle": q_transactional_lifecycle,
    "morton_tiles": q_morton_tiles,
    "salted_join": q_salted_join,
    "overview_grid": q_overview_grid,
    "overview_rollup": q_overview_rollup,
    "token_counts": q_token_counts,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "quality_classifier": q_quality_classifier,
    "quality_mixture": q_quality_mixture,
    "exact_dedup": q_exact_dedup,
    "shingle_fingerprint": q_shingle_fingerprint,
    "cosine_topk": q_cosine_topk,
    "events_window": q_events_window,
    "asof_join": q_asof_join,
    "sessionize": q_sessionize,
    "running_total": q_running_total,
    "rollup_revenue": q_rollup_revenue,
    "set_ops": q_set_ops,
    "geocode_lookup": q_geocode_lookup,
    "ingest_coercion": q_ingest_coercion,
    "json_extract": q_json_extract,
    "percentiles": q_percentiles,
    "sample_quantiles": q_sample_quantiles,
    "bpe_merges": q_bpe_merges,
    "bpe_tokenize": q_bpe_tokenize,
    "quant_recall": q_quant_recall,
    "export_shards": q_export_shards,
    "textrank_keywords": q_textrank_keywords,
    "mixture_epoch": q_mixture_epoch,
    "pareto_parts": q_pareto_parts,
    "streaming_export": q_streaming_export,
    "ann_ivf_sq8": q_ann_ivf_sq8,
    "group_quantiles": q_group_quantiles,
    "ann_pq": q_ann_pq,
    "image_dhash": q_image_dhash,
    "image_near_dup": q_image_near_dup,
    "audio_fingerprint": q_audio_fingerprint,
    "scd2_dimension": q_scd2_dimension,
    "semantic_dedup": q_semantic_dedup,
    "semantic_dedup_bulk": q_semantic_dedup_bulk,
    "streaming_quantiles": q_streaming_quantiles,
    "above_customer_avg": q_above_customer_avg,
    "cube_revenue": q_cube_revenue,
    "min_cost_supplier": q_min_cost_supplier,
    "important_stock": q_important_stock,
    "parts_supplier_relationship": q_parts_supplier_relationship,
    "promotable_suppliers": q_promotable_suppliers,
    "compression_ratio": q_compression_ratio,
    "minhash_dedup": q_minhash_dedup,
    "pipeline_e2e": q_pipeline_e2e,
    "pipeline_ccnet": q_pipeline_ccnet,
    "pipeline_fineweb": q_pipeline_fineweb,
    "simhash_pairs": q_simhash_pairs,
    "ann_topk": q_ann_topk,
    "ann_ivf": q_ann_ivf,
    "approx_stats": q_approx_stats,
    "quality_scores": q_quality_scores,
    "ngram_jaccard": q_ngram_jaccard,
    "embedding_near_dup": q_embedding_near_dup,
    "near_dup_banded": q_near_dup_banded,
    "knn_graph": q_knn_graph,
    "hard_negatives": q_hard_negatives,
    "diversity_sample": q_diversity_sample,
    "incremental_vec_near_dup": q_incremental_vec_near_dup,
    "kmeans_embeddings": q_kmeans_embeddings,
    "embedding_decontam": q_embedding_decontam,
    "streaming_kmeans": q_streaming_kmeans,
    "multimodal_features": q_multimodal_features,
    "audio_features": q_audio_features,
    "stratified_sample": q_stratified_sample,
    "temperature_mixture": q_temperature_mixture,
    "group_sample": q_group_sample,
    "pack_sequences": q_pack_sequences,
    "decontam": q_decontam,
    "pii_scrub": q_pii_scrub,
    "repetition": q_repetition,
    "dataset_split": q_dataset_split,
    "bloom_dedup": q_bloom_dedup,
    "line_dedup": q_line_dedup,
    "span_dedup": q_span_dedup,
    "heavy_hitters": q_heavy_hitters,
    "hll_registers": q_hll_registers,
    "hll_grouped": q_hll_grouped,
    "streaming_cardinality": q_streaming_cardinality,
    "lm_fluency": q_lm_fluency,
    "incremental_mv": q_incremental_mv,
    "tfidf_terms": q_tfidf_terms,
    "image_features": q_image_features,
    "nation_trade_volume": q_nation_trade_volume,
    "returned_revenue": q_returned_revenue,
    "promo_share": q_promo_share,
    "idle_rich_customers": q_idle_rich_customers,
    "funnel": q_funnel,
    "cohort_retention": q_cohort_retention,
    "frequent_ngrams": q_frequent_ngrams,
    "gif_features": q_gif_features,
    "cow_dml": q_cow_dml,
    "range_join": q_range_join,
    "forecast_revenue": q_forecast_revenue,
    "order_count_distribution": q_order_count_distribution,
    "large_volume_customers": q_large_volume_customers,
    "jpeg_features": q_jpeg_features,
    "video_frames": q_video_frames,
    "sliding_windows": q_sliding_windows,
    "market_share": q_market_share,
    "priority_with_big_lines": q_priority_with_big_lines,
    "top_supplier": q_top_supplier,
    "small_qty_revenue": q_small_qty_revenue,
    "table_profile": q_table_profile,
    "ship_delay_priority": q_ship_delay_priority,
    "disjunctive_revenue": q_disjunctive_revenue,
    "waiting_suppliers": q_waiting_suppliers,
    "chunk_documents": q_chunk_documents,
    "data_quality": q_data_quality,
    "resample_fill": q_resample_fill,
    "weighted_sample": q_weighted_sample,
    "snapshot_diff": q_snapshot_diff,
    "fuzzy_pairs": q_fuzzy_pairs,
    "linkage_scores": q_linkage_scores,
    "theil_sen": q_theil_sen,
    "equi_depth_hist": q_equi_depth_hist,
    "psi_drift": q_psi_drift,
    "cusum_drift": q_cusum_drift,
    "mad_outliers": q_mad_outliers,
    "pivot_revenue": q_pivot_revenue,
    "transitions": q_transitions,
    "value_histogram": q_value_histogram,
    "spatial_contains": q_spatial_contains,
    "spatial_nearest": q_spatial_nearest,
    "pagerank_nations": q_pagerank_nations,
    "nation_profit": q_nation_profit,
    "rolling_features": q_rolling_features,
    "bfs_hops": q_bfs_hops,
    "spatial_polygons": q_spatial_polygons,
    "latest_per_key": q_latest_per_key,
    "haversine_pairs": q_haversine,
    "attribution": q_attribution,
    "scd2_intervals": q_scd2_intervals,
    "deciles": q_deciles,
    "trajectory_length": q_trajectory_length,
    "ohlc_bars": q_ohlc_bars,
    "state_runs": q_state_runs,
    "bm25_scores": q_bm25_scores,
    "triangle_count": q_triangle_count,
    "golden_records": q_golden_records,
    "label_centroids": q_label_centroids,
    "quantize_int8": q_quantize_int8,
    "random_projection": q_random_projection,
    "split_leakage": q_split_leakage,
    "dsir_sample": q_dsir_sample,
    "c4_rules": q_c4_rules,
    "gopher_repetition": q_gopher_repetition,
    "gopher_quality": q_gopher_quality,
    "source_reputation": q_source_reputation,
    "paragraph_dedup": q_paragraph_dedup,
    "seasonal_residuals": q_seasonal_residuals,
    "drawdown": q_drawdown,
    "shortest_paths": q_shortest_paths,
    "contingency": q_contingency,
    "latency_bands": q_latency_bands,
    "revenue_share": q_revenue_share,
    "quality_auc": q_quality_auc,
    "value_ks": q_value_ks,
    "revenue_gini": q_revenue_gini,
    "benford_digits": q_benford_digits,
    "corr_matrix": q_corr_matrix,
    "hashed_features": q_hashed_features,
    "peak_concurrency": q_peak_concurrency,
    "item_affinity": q_item_affinity,
    "rfm_segments": q_rfm_segments,
    "url_canonical": q_url_canonical,
    "url_dedup": q_url_dedup,
    "unicode_fold": q_unicode_fold,
    "dataset_shuffle": q_dataset_shuffle,
    "incremental_near_dup": q_incremental_near_dup,
    "lsh_index_build": q_lsh_index_build,
    "lsh_match_steady": q_lsh_match_steady,
    "html_extract": q_html_extract,
    "blocklist_filter": q_blocklist_filter,
}

ORACLES = {
    "pricing_summary": ORACLE_PRICING,
    "top_orders_per_customer": ORACLE_TOP_ORDERS,
    "shipping_priority": ORACLE_SHIPPING,
    "region_volume": ORACLE_REGION_VOLUME,
    "mktsegment_stats": ORACLE_MKTSEGMENT,
    "locale_float_coercion": ORACLE_LOCALE_FLOAT,
    "dual_format_dates": ORACLE_DUAL_DATES,
    "update_merge": ORACLE_UPDATE_MERGE,
    "delete_antijoin": ORACLE_DELETE,
    "chunk_assignment": ORACLE_CHUNKS,
    "row_range": ORACLE_ROW_RANGE,
    "threeway_fanout": ORACLE_FANOUT,
    "wkb_points": _oracle_wkb_points(),
    "geom_points": ORACLE_GEOM_POINTS,
    "utm_transform": ORACLE_UTM,
    "lcc_transform": ORACLE_LCC,
    "stateplane_transform": ORACLE_STATEPLANE,
    "albers_transform": ORACLE_ALBERS,
    "bng_transform": ORACLE_BNG,
    "swiss_transform": ORACLE_SWISS,
    "polar_transform": ORACLE_POLAR,
    "datum_shift": ORACLE_DATUM_SHIFT,
    "transactional_lifecycle": ORACLE_TXN_LIFECYCLE,
    "morton_tiles": ORACLE_MORTON,
    "salted_join": ORACLE_SALTED,
    "overview_grid": ORACLE_OVERVIEW_GRID,
    "overview_rollup": ORACLE_OVERVIEW_ROLLUP,
    "token_counts": ORACLE_TOKEN_COUNTS,
    "text_quality": ORACLE_TEXT_QUALITY,
    "lang_id": ORACLE_LANG_ID,
    "quality_classifier": _oracle_quality_classifier(),
    "quality_mixture": _oracle_quality_mixture(),
    "exact_dedup": ORACLE_EXACT_DEDUP,
    "shingle_fingerprint": ORACLE_SHINGLE_FP,
    "cosine_topk": ORACLE_COSINE_TOPK,
    "events_window": ORACLE_EVENTS_WINDOW,
    "asof_join": ORACLE_ASOF,
    "sessionize": ORACLE_SESSIONIZE,
    "running_total": ORACLE_RUNNING_TOTAL,
    "rollup_revenue": ORACLE_ROLLUP,
    "set_ops": ORACLE_SET_OPS,
    "geocode_lookup": ORACLE_GEOCODE,
    "ingest_coercion": ORACLE_INGEST,
    "json_extract": ORACLE_JSON,
    "percentiles": ORACLE_PERCENTILES,
    "sample_quantiles": _oracle_sample_quantiles(),
    "bpe_merges": _oracle_bpe_merges(),
    "bpe_tokenize": _oracle_bpe_tokenize(),
    "quant_recall": ORACLE_QUANT_RECALL,
    "export_shards": ORACLE_EXPORT_SHARDS,
    "textrank_keywords": _oracle_textrank(),
    "mixture_epoch": _oracle_mixture_epoch(),
    "pareto_parts": _oracle_pareto(),
    "streaming_export": ORACLE_EXPORT_SHARDS,
    "ann_ivf_sq8": ORACLE_ANN_IVF_SQ8,
    "group_quantiles": _oracle_group_quantiles(),
    "ann_pq": ORACLE_ANN_PQ,
    "image_dhash": ORACLE_IMAGE_DHASH,
    "image_near_dup": ORACLE_IMAGE_NEAR_DUP,
    "audio_fingerprint": ORACLE_AUDIO_FP,
    "scd2_dimension": ORACLE_SCD2_DIMENSION,
    "semantic_dedup": ORACLE_SEMANTIC_DEDUP,
    "semantic_dedup_bulk": ORACLE_SEMANTIC_DEDUP,
    "streaming_quantiles": ORACLE_STREAMING_QUANTILES,
    "above_customer_avg": ORACLE_ABOVE_AVG,
    "cube_revenue": ORACLE_CUBE,
    "min_cost_supplier": ORACLE_MIN_COST,
    "important_stock": ORACLE_IMPORTANT_STOCK,
    "parts_supplier_relationship": ORACLE_PARTS_SUPPLIER,
    "promotable_suppliers": ORACLE_PROMOTABLE,
    "ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "quality_scores": ORACLE_QUALITY_SCORES,
    "approx_stats": ORACLE_APPROX_STATS,
    "multimodal_features": ORACLE_MULTIMODAL,
    "audio_features": ORACLE_AUDIO,
    "compression_ratio": ORACLE_COMPRESSION,
    "embedding_near_dup": ORACLE_EMBEDDING_NEAR_DUP,
    "near_dup_banded": ORACLE_NEAR_DUP_BANDED,
    "knn_graph": ORACLE_KNN_GRAPH,
    "hard_negatives": _oracle_hard_negatives(),
    "diversity_sample": _oracle_diversity(),
    "incremental_vec_near_dup": ORACLE_INCREMENTAL_VEC_NEAR_DUP,
    "kmeans_embeddings": _oracle_kmeans(),
    "embedding_decontam": ORACLE_EMBEDDING_DECONTAM,
    "streaming_kmeans": _oracle_streaming_kmeans(),
    "ann_topk": ORACLE_ANN_TOPK,
    "ann_ivf": ORACLE_ANN_IVF,
    "minhash_dedup": ORACLE_MINHASH_DEDUP,
    "pipeline_e2e": _oracle_pipeline_e2e(),
    "pipeline_ccnet": _oracle_pipeline_ccnet(),
    "pipeline_fineweb": _oracle_pipeline_fineweb(),
    "simhash_pairs": ORACLE_SIMHASH_PAIRS,
    "stratified_sample": ORACLE_STRATIFIED,
    "temperature_mixture": ORACLE_TEMPERATURE_MIXTURE,
    "group_sample": ORACLE_GROUP_SAMPLE,
    "pack_sequences": ORACLE_PACK,
    "decontam": ORACLE_DECONTAM,
    "pii_scrub": ORACLE_PII,
    "repetition": ORACLE_REPETITION,
    "dataset_split": ORACLE_DATASET_SPLIT,
    "bloom_dedup": ORACLE_BLOOM_DEDUP,
    "line_dedup": ORACLE_LINE_DEDUP,
    "span_dedup": ORACLE_SPAN_DEDUP,
    "heavy_hitters": ORACLE_HEAVY_HITTERS,
    "hll_registers": ORACLE_HLL_REGISTERS,
    "hll_grouped": _oracle_hll_grouped(),
    "streaming_cardinality": ORACLE_HLL_REGISTERS,
    "lm_fluency": _oracle_lm_fluency(),
    "incremental_mv": ORACLE_INCREMENTAL_MV,
    "tfidf_terms": ORACLE_TFIDF,
    "image_features": ORACLE_IMAGE,
    "nation_trade_volume": ORACLE_Q7,
    "returned_revenue": ORACLE_Q10,
    "promo_share": ORACLE_Q14,
    "idle_rich_customers": ORACLE_Q22,
    "funnel": ORACLE_FUNNEL,
    "cohort_retention": ORACLE_COHORT,
    "frequent_ngrams": ORACLE_FREQ_NGRAMS,
    "gif_features": ORACLE_GIF,
    "cow_dml": ORACLE_COW_DML,
    "range_join": ORACLE_RANGE_JOIN,
    "forecast_revenue": ORACLE_Q6,
    "order_count_distribution": ORACLE_Q13,
    "large_volume_customers": ORACLE_Q18,
    "jpeg_features": ORACLE_JPEG,
    "video_frames": ORACLE_VIDEO_FRAMES,
    "sliding_windows": ORACLE_SLIDING,
    "market_share": ORACLE_Q8,
    "priority_with_big_lines": ORACLE_Q4,
    "top_supplier": ORACLE_Q15,
    "small_qty_revenue": ORACLE_Q17,
    "table_profile": ORACLE_PROFILE,
    "ship_delay_priority": ORACLE_Q12,
    "disjunctive_revenue": ORACLE_Q19,
    "waiting_suppliers": ORACLE_Q21,
    "chunk_documents": ORACLE_CHUNK_DOCS,
    "data_quality": ORACLE_DATA_QUALITY,
    "resample_fill": ORACLE_RESAMPLE,
    "weighted_sample": ORACLE_WEIGHTED_SAMPLE,
    "snapshot_diff": ORACLE_SNAPSHOT_DIFF,
    "fuzzy_pairs": ORACLE_FUZZY,
    "linkage_scores": _oracle_linkage_scores(),
    "theil_sen": _oracle_theil_sen(),
    "equi_depth_hist": _oracle_equi_depth_hist(),
    "psi_drift": _oracle_psi_drift(),
    "cusum_drift": ORACLE_CUSUM,
    "mad_outliers": ORACLE_MAD,
    "pivot_revenue": ORACLE_PIVOT,
    "transitions": ORACLE_TRANSITIONS,
    "value_histogram": ORACLE_HISTOGRAM,
    "spatial_contains": ORACLE_SPATIAL_CONTAINS,
    "spatial_nearest": ORACLE_SPATIAL_NEAREST,
    "pagerank_nations": _oracle_pagerank(),
    "nation_profit": ORACLE_NATION_PROFIT,
    "rolling_features": ORACLE_ROLLING,
    "bfs_hops": _oracle_bfs(),
    "spatial_polygons": _oracle_spatial_polygons(),
    "latest_per_key": ORACLE_LATEST_PER_KEY,
    "haversine_pairs": _oracle_haversine(),
    "attribution": ORACLE_ATTRIBUTION,
    "scd2_intervals": ORACLE_SCD2,
    "deciles": ORACLE_DECILES,
    "trajectory_length": ORACLE_TRAJECTORY,
    "ohlc_bars": ORACLE_OHLC,
    "state_runs": ORACLE_STATE_RUNS,
    "bm25_scores": _oracle_bm25(),
    "triangle_count": _oracle_triangles(),
    "golden_records": ORACLE_GOLDEN_RECORDS,
    "label_centroids": ORACLE_CENTROIDS,
    "quantize_int8": ORACLE_QUANTIZE,
    "random_projection": ORACLE_RANDOM_PROJECTION,
    "split_leakage": ORACLE_SPLIT_LEAKAGE,
    "dsir_sample": _oracle_dsir_sample(),
    "c4_rules": _oracle_c4_rules(),
    "gopher_repetition": _oracle_gopher_repetition(),
    "gopher_quality": _oracle_gopher_quality(),
    "source_reputation": _oracle_source_reputation(),
    "paragraph_dedup": ORACLE_PARAGRAPH_DEDUP,
    "seasonal_residuals": ORACLE_SEASONAL,
    "drawdown": ORACLE_DRAWDOWN,
    "shortest_paths": _oracle_shortest_paths(),
    "contingency": ORACLE_CONTINGENCY,
    "latency_bands": ORACLE_LATENCY_BANDS,
    "revenue_share": ORACLE_REVENUE_SHARE,
    "quality_auc": _oracle_quality_auc(),
    "value_ks": _oracle_value_ks(),
    "revenue_gini": _oracle_revenue_gini(),
    "benford_digits": _oracle_benford(),
    "corr_matrix": _oracle_corr_matrix(),
    "hashed_features": _oracle_hashed_features(),
    "peak_concurrency": _oracle_peak_concurrency(),
    "item_affinity": _oracle_item_affinity(),
    "rfm_segments": ORACLE_RFM,
    "url_canonical": ORACLE_URL_CANONICAL,
    "url_dedup": ORACLE_URL_DEDUP,
    "unicode_fold": ORACLE_UNICODE_FOLD,
    "dataset_shuffle": _oracle_dataset_shuffle(),
    "incremental_near_dup": ORACLE_INCREMENTAL_NEAR_DUP,
    "lsh_index_build": ORACLE_LSH_INDEX_BUILD,
    "lsh_match_steady": ORACLE_INCREMENTAL_NEAR_DUP,
    "html_extract": ORACLE_HTML_EXTRACT,
    "blocklist_filter": ORACLE_BLOCKLIST_FILTER,
}
