"""Plan-quality gates: the properties that make these operators survive a
100x scale-up — predicate pushdown into the parquet scan, column pruning,
broadcast joins for small dims, whole-stage codegen on hot paths.  These are
assertions on ``explain()`` output, so a regression in plan shape fails CI
even while results stay correct."""

from __future__ import annotations

import pytest

from carto_etl_spark.plans.inspect import (
    codegen_stage_count,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
)
from carto_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_pricing_summary_prunes_and_partial_aggregates(spark):
    df = QUERIES["pricing_summary"](spark, SF)
    cols = scan_columns(df)
    # 6 needed columns only — no l_partkey/l_suppkey/l_shipdate etc.
    assert "l_partkey" not in cols and "l_shipdate" not in cols
    assert {"l_returnflag", "l_quantity", "l_extendedprice"} <= cols
    # map-side combine: partial aggregation runs before the exchange, so the
    # shuffle carries one row per (flag,status) per task, not 6M rows
    from carto_etl_spark.plans.inspect import explain_str

    assert "partial_sum" in explain_str(df)


def test_shipping_priority_pushdown_and_broadcast(spark):
    df = QUERIES["shipping_priority"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "c_mktsegment" in pushed  # filter reached the customer scan
    assert "o_orderdate" in pushed
    assert "l_shipdate" in pushed
    assert has_broadcast_join(df)


def test_region_volume_broadcasts_dims(spark):
    df = QUERIES["region_volume"](spark, SF)
    assert has_broadcast_join(df)
    pushed = " ".join(pushed_filters(df))
    assert "r_name" in pushed


def test_geom_points_reads_only_needed_columns(spark):
    df = QUERIES["geom_points"](spark, SF)
    assert scan_columns(df) == {"c_custkey"}


def test_delete_antijoin_pushes_status_filter(spark):
    df = QUERIES["delete_antijoin"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderstatus" in pushed


def test_asof_join_bounded_shuffles(spark):
    from carto_etl_spark.plans.inspect import shuffle_count

    df = QUERIES["asof_join"](spark, SF)
    # one shuffle for the key join + one for the per-row window pick; a
    # regression to a cartesian or extra exchange fails here
    assert shuffle_count(df) <= 3


def test_read_partitions_prunes_at_partition_level(spark, tmp_path):
    from carto_etl_spark.operators.jobs import TargetTable
    from carto_etl_spark.plans.inspect import explain_str

    t = TargetTable(spark, tmp_path / "pp", partition_by=["region"])
    t.append(
        spark.createDataFrame([("r1", "eu"), ("r2", "us")], ["id", "region"])
    )
    plan = explain_str(t.read_partitions([("eu",)]))
    # the filter lands in PartitionFilters (directory pruning), not a
    # post-scan row filter
    assert "PartitionFilters" in plan
    part_section = plan.split("PartitionFilters")[1].split("]")[0]
    assert "region" in part_section


def test_utm_transform_prunes_to_key_column(spark):
    # the whole Krüger series is column math off c_custkey; the scan must
    # read nothing else and the plan must stay UDF-free
    from carto_etl_spark.plans.inspect import explain_str

    df = QUERIES["utm_transform"](spark, SF)
    assert scan_columns(df) == {"c_custkey"}
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ngram_prefix_join_no_nested_loop(spark):
    # prefix-filtered Jaccard must never degrade to a cartesian/nested-loop
    # product; candidate generation is an equi-join on the prefix shingle
    from carto_etl_spark.operators.dedup import ngram_jaccard_pairs_prefix
    from carto_etl_spark.plans.inspect import explain_str

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g"), (3, "x y z w v u")],
        ["doc_id", "text"],
    )
    plan = explain_str(
        ngram_jaccard_pairs_prefix(df, "doc_id", "text", min_jaccard=0.5)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_counts_prunes_documents(spark):
    df = QUERIES["token_counts"](spark, SF)
    cols = scan_columns(df)
    assert "lang" not in cols and "source" not in cols
    assert {"doc_id", "text"} <= cols


def test_shingle_expressions_stay_out_of_scan_filters(spark):
    """Regression gate for the r4 pathology: a `size(shingles) > 0`-style
    filter that predicate-pushdown alias-substitutes into the parquet scan
    re-evaluates the whole tokenize+shingle chain inside scan tasks, which
    cannot split below a row group — the most expensive computation in the
    dedup plan serialized onto one core (measured 6x at sf0.1).  The scans
    feeding the exact-verify path must carry only cheap key filters."""
    from pyspark.sql import functions as F

    from carto_etl_spark.operators import dedup as dd
    from carto_etl_spark.plans.inspect import explain_str

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], ["id_a", "id_b"]
    )
    ver = dd.verify_pairs_jaccard(pairs, d, "doc_id", "text", 3, 0.5)
    plan = explain_str(ver)
    for line in plan.splitlines():
        if "DataFilters" in line:
            assert "array_distinct" not in line and "transform(" not in line, line
    # and the pair list, not the shingle-array table, is the broadcast side
    assert "BroadcastExchange" in plan


def test_nation_trade_volume_broadcasts_and_pushes(spark):
    df = QUERIES["nation_trade_volume"](spark, SF)
    assert has_broadcast_join(df)  # nation/supplier dims off the shuffle path
    # the big fact tables must not read money columns they don't use
    cols = scan_columns(df)
    assert "l_tax" not in cols and "o_totalprice" not in cols


def test_returned_revenue_pushes_flag_and_window(spark):
    df = QUERIES["returned_revenue"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "l_returnflag" in pushed  # reached the lineitem scan
    assert "o_orderdate" in pushed  # window reached the orders scan
    assert has_broadcast_join(df)


def test_promo_share_pushes_shipdate(spark):
    df = QUERIES["promo_share"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed
    assert has_broadcast_join(df)  # part dim


def test_idle_rich_customers_anti_join_no_cartesian(spark):
    from carto_etl_spark.plans.inspect import explain_str

    df = QUERIES["idle_rich_customers"](spark, SF)
    plan = explain_str(df)
    assert plan.count("Join type: LeftAnti") == 1
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed  # dormancy cutoff reached the orders scan


def test_catalog_wide_plan_hygiene(spark):
    """Every catalog entry's physical plan must be free of the three
    unconditional scale-killers: row-at-a-time Python UDFs (BatchEvalPython;
    Arrow-batched pandas UDFs are the sanctioned slow path), cartesian
    products (CartesianProduct; one-row broadcast cross joins plan as
    BroadcastNestedLoopJoin and are fine), and single-partition window
    funnels (a Window over Exchange SinglePartition sorts the whole input
    in ONE task — global ranks/banding must use the distributed machinery
    in operators/ranking.py instead).  NO allowlist: zero entries are
    exempt."""
    from carto_etl_spark.plans.inspect import explain_str, unpartitioned_windows
    from carto_etl_spark.queries import QUERIES

    bad = {}
    for name, fn in QUERIES.items():
        df = fn(spark, SF)
        plan = explain_str(df)
        problems = [
            marker
            for marker in ("BatchEvalPython", "CartesianProduct")
            if marker in plan
        ]
        global_windows = unpartitioned_windows(df)
        if global_windows:
            problems.append(f"unpartitioned window: {global_windows}")
        if problems:
            bad[name] = problems
    assert not bad, f"plan pathologies: {bad}"


def test_market_share_widest_join_is_all_broadcast_dims(spark):
    df = QUERIES["market_share"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "p_type" in pushed  # part filter reached its scan
    assert "r_name" in pushed  # region filter reached its scan
    assert has_broadcast_join(df)
    from carto_etl_spark.plans.inspect import explain_str

    plan = explain_str(df)
    # the only sort-merge-eligible joins are fact-to-fact; every dim
    # (part, supplier, nation x2, region-restricted nations) broadcasts
    assert plan.count("BroadcastHashJoin") >= 4


def test_ship_delay_priority_scans_only_needed_columns(spark):
    df = QUERIES["ship_delay_priority"](spark, SF)
    cols = scan_columns(df)
    # lineitem contributes key+date, orders key+date+priority; no money cols
    assert "l_extendedprice" not in cols and "o_totalprice" not in cols


def test_disjunctive_revenue_pushes_brand_envelope_and_broadcasts(spark):
    df = QUERIES["disjunctive_revenue"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    # the OR-of-brands envelope is a pushable part-scan predicate
    assert "p_brand" in pushed or "p_size" in pushed
    assert has_broadcast_join(df)


def test_waiting_suppliers_single_fact_exchange_no_self_join(spark):
    from carto_etl_spark.plans.inspect import explain_str

    df = QUERIES["waiting_suppliers"](spark, SF)
    plan = explain_str(df)
    # the classic EXISTS/NOT-EXISTS pair would self-join lineitem twice;
    # the decorrelated form scans it once and windows over one partitioning
    import re

    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)
    assert len(scans) <= 2, scans  # lineitem + supplier only
    assert plan.count("hashpartitioning(l_orderkey") <= 1


def test_nation_profit_broadcasts_dims_and_prunes(spark):
    from carto_etl_spark.plans.inspect import shuffle_count

    df = QUERIES["nation_profit"](spark, SF)
    assert has_broadcast_join(df)
    cols = scan_columns(df)
    assert "l_shipdate" not in cols and "l_tax" not in cols
    pushed = " ".join(pushed_filters(df))
    assert "p_name" in pushed  # LIKE '%ol%' reaches the part scan


def test_single_exchange_window_entries(spark):
    """rolling_features / latest_per_key / scd2_intervals each share ONE
    user-partitioned exchange across all their window functions."""
    from carto_etl_spark.plans.inspect import shuffle_count

    for name in ("rolling_features", "latest_per_key", "scd2_intervals"):
        df = QUERIES[name](spark, SF)
        assert shuffle_count(df) == 1, name


def test_spatial_entries_no_cartesian_and_pruned(spark):
    from carto_etl_spark.plans.inspect import explain_str

    for name in ("spatial_contains", "spatial_nearest", "spatial_polygons"):
        df = QUERIES[name](spark, SF)
        plan = explain_str(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # the containment entry reads only the key column from each side
    assert scan_columns(QUERIES["spatial_contains"](spark, SF)) == {
        "c_custkey",
        "s_suppkey",
    }


def test_attribution_interval_join_is_equi_not_cartesian(spark):
    from carto_etl_spark.plans.inspect import explain_str

    df = QUERIES["attribution"](spark, SF)
    plan = explain_str(df)
    # the time-range predicate rides ON TOP of a key equi-join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quantize_is_map_side_only(spark):
    from carto_etl_spark.plans.inspect import shuffle_count

    assert shuffle_count(QUERIES["quantize_int8"](spark, SF)) == 0


def test_label_centroids_single_partial_agg_exchange(spark):
    from carto_etl_spark.plans.inspect import explain_str, shuffle_count

    df = QUERIES["label_centroids"](spark, SF)
    assert shuffle_count(df) == 1
    assert "partial_sum" in explain_str(df)
