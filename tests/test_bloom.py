"""Bloom-prefiltered anti-join (operators/bloom.py): exact equivalence with
the plain anti-join, no false negatives, null-key routing, prefilter
effectiveness, and the plan shapes that make it scale (distributed bitmap
build with map-side partial aggregation; the verify join sees only the
bloom-hit sliver)."""

from __future__ import annotations

from pyspark.sql import functions as F

from carto_etl_spark.operators.bloom import (
    _BLOOM_COL,
    bloom_anti_join,
    build_bloom,
    might_contain,
    suggest_num_bits,
)
from carto_etl_spark.plans.inspect import explain_str


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=str)


def test_equivalence_with_plain_anti_join(spark):
    big = spark.range(0, 20000).select(
        (F.col("id") % 7000).alias("k"), F.col("id").alias("v")
    )
    ref = spark.range(0, 3000).select((F.col("id") * 3).alias("k"))
    expect = big.join(ref, on="k", how="left_anti")
    got = bloom_anti_join(big, ref, on="k", expected_ref_keys=3000)
    assert _rows(got) == _rows(expect)


def test_equivalence_across_sizings(spark):
    # tiny bitmap (high fp rate) still EXACT — false positives only grow the
    # verify-join input, never the answer
    big = spark.range(0, 5000).select((F.col("id") % 911).alias("k"))
    ref = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    expect = _rows(big.join(ref, on="k", how="left_anti"))
    for num_bits, num_hashes in [(1024, 1), (1024, 3), (1 << 16, 2)]:
        got = bloom_anti_join(
            big, ref, on="k", num_bits=num_bits, num_hashes=num_hashes
        )
        assert _rows(got) == expect


def test_null_keys_survive_like_plain_anti_join(spark):
    big = spark.range(0, 100).select(F.col("id").alias("k")).unionByName(
        spark.sql("SELECT CAST(NULL AS LONG) AS k")
    )
    ref = spark.range(0, 50).select(F.col("id").alias("k"))
    expect = _rows(big.join(ref, on="k", how="left_anti"))
    got = _rows(bloom_anti_join(big, ref, on="k", expected_ref_keys=50))
    assert got == expect
    assert any(r[0] is None for r in got)  # NULL key kept, as in left_anti


def test_empty_reference_keeps_everything(spark):
    big = spark.range(0, 200).select(F.col("id").alias("k"))
    ref = spark.range(0, 1).select(F.col("id").alias("k")).where("k < 0")
    got = bloom_anti_join(big, ref, on="k", expected_ref_keys=1)
    assert got.count() == 200


def test_no_false_negatives_and_low_fp(spark):
    # every true member hits the bloom; non-members hit at ~1% (10 bits/key)
    big = spark.range(0, 20000).select((F.col("id") % 7000).alias("k"))
    ref = spark.range(0, 3000).select((F.col("id") * 3).alias("k"))
    nb = suggest_num_bits(3000)
    bloom = build_bloom(ref, "k", nb)
    tagged = big.join(F.broadcast(bloom), how="cross")
    hit = tagged.where(might_contain(F.col("k"), F.col(_BLOOM_COL), nb))
    hits = hit.count()
    true_hits = big.join(ref, "k", "left_semi").count()
    assert hits >= true_hits  # no false negatives (guaranteed, spot-checked)
    assert (hits - true_hits) / 20000 < 0.05  # fp sliver, not the corpus


def test_bitmap_build_is_distributed_partial_agg(spark):
    # the reference side aggregates (word_idx, partial bit_or) map-side before
    # the shuffle — per-partition shuffle volume is bounded by num_bits/64,
    # not by reference row count
    ref = spark.range(0, 10000).select(F.col("id").alias("k"))
    plan = explain_str(build_bloom(ref, "k", 1 << 15))
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "CollectLimit" not in plan  # never materialized on the driver


def test_verify_join_input_is_filtered(spark):
    # the only join over the corpus side takes the bloom-filtered sliver as
    # input: the plan's anti-join sits above a Filter containing the getbit
    # membership test, and the definite-absent branch has no join at all
    big = spark.range(0, 1000).select(F.col("id").alias("k"))
    ref = spark.range(0, 100).select(F.col("id").alias("k"))
    out = bloom_anti_join(big, ref, on="k", num_bits=1 << 14)
    plan = explain_str(out)
    assert plan.count("Join type: LeftAnti") == 1  # exactly one verify join
    assert "getbit" in plan  # membership test compiled to column math
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_string_keys_first_class(spark):
    # string keys must NOT go through cast("long") — ANSI mode throws on
    # non-numeric text; the md5-derived 60-bit key keeps everything exact
    words = ["apple", "pear", "kiwi", "plum", "fig", "mango", "grape"]
    big = spark.createDataFrame([(w,) for w in words], ["k"])
    ref = spark.createDataFrame([("pear",), ("fig",), ("absent",)], ["k"])
    expect = _rows(big.join(ref, on="k", how="left_anti"))
    got = _rows(bloom_anti_join(big, ref, on="k", expected_ref_keys=3))
    assert got == expect
    assert {r[0] for r in got} == {"apple", "kiwi", "plum", "mango", "grape"}


def test_string_key_bloom_actually_filters(spark):
    # the md5 key must feed the bloom: non-members of a large string corpus
    # should mostly miss (i.e. the prefilter does real work, not pass-all)
    big = spark.range(0, 5000).selectExpr("concat('doc-', id) AS k")
    ref = spark.range(0, 500).selectExpr("concat('doc-', id * 7) AS k")
    nb = suggest_num_bits(500)
    from carto_etl_spark.operators.bloom import numeric_key_expr

    bloom = build_bloom(ref, numeric_key_expr(ref, "k"), nb)
    tagged = big.join(F.broadcast(bloom), how="cross")
    hits = tagged.where(
        might_contain(numeric_key_expr(big, "k"), F.col(_BLOOM_COL), nb)
    ).count()
    true_hits = big.join(ref, "k", "left_semi").count()
    assert hits >= true_hits
    assert hits < true_hits + 0.05 * 5000  # fp sliver, not pass-all


def test_merge_blooms_equals_union_bloom(spark):
    from carto_etl_spark.operators.bloom import merge_blooms

    a = spark.range(0, 300).select(F.col("id").alias("k"))
    b = spark.range(300, 600).select(F.col("id").alias("k"))
    nb = 1 << 13
    merged = merge_blooms(build_bloom(a, "k", nb), build_bloom(b, "k", nb))
    direct = build_bloom(a.unionByName(b), "k", nb)
    assert merged.collect()[0][0] == direct.collect()[0][0]


def test_bloom_roundtrips_through_parquet(spark, tmp_path):
    from carto_etl_spark.operators.bloom import load_bloom, save_bloom

    ref = spark.range(0, 500).select(F.col("id").alias("k"))
    nb = 1 << 13
    bloom = build_bloom(ref, "k", nb)
    save_bloom(bloom, str(tmp_path / "bloom"))
    loaded = load_bloom(spark, str(tmp_path / "bloom"))
    assert loaded.collect()[0][0] == bloom.collect()[0][0]


def test_bloom_semi_join_equivalence(spark):
    from carto_etl_spark.operators.bloom import bloom_semi_join

    big = spark.range(0, 5000).select((F.col("id") % 911).alias("k")).unionByName(
        spark.sql("SELECT CAST(NULL AS LONG) AS k")
    )
    ref = spark.range(0, 300).select((F.col("id") * 5).alias("k"))
    expect = _rows(big.join(ref, on="k", how="left_semi"))
    got = _rows(bloom_semi_join(big, ref, on="k", expected_ref_keys=300))
    assert got == expect
    assert all(r[0] is not None for r in got)  # null dropped, as in left_semi
