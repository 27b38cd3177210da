"""Scalar int8 quantization (operators/quantize.py): codes must land in
[-127, 127] with per-coordinate reconstruction error <= scale/2, equal a
pure-Python replay of the same expression order, and the scale-cancelling
quantized cosine must rank identical vectors first."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from carto_etl_spark.operators.quantize import (
    Q_MAX,
    dequantize_expr,
    int_dot_expr,
    quantize_int8,
    quantized_cosine_expr,
)

VECS = [
    (0, [0.5, -1.0, 0.25, 0.0]),
    (1, [1e-3, 2e-3, -3e-3, 4e-3]),
    (2, [0.0, 0.0, 0.0, 0.0]),  # all-zero: scale 0, codes 0
    (3, [-7.5, 7.5, 3.75, -1.875]),
    (4, [1.0, 1.0, 1.0, 1.0]),
]


def _py_quant(vec):
    maxabs = max(abs(v) for v in vec)
    if maxabs == 0.0:
        return 0.0, [0] * len(vec)
    scale = maxabs / 127.0
    return scale, [int(math.floor(v / scale + 0.5)) for v in vec]


def _df(spark):
    return spark.createDataFrame(
        VECS, "vec_id int, embedding array<double>"
    )


def test_codes_match_python_replay(spark):
    rows = {
        r["vec_id"]: r
        for r in quantize_int8(_df(spark)).collect()
    }
    for vid, vec in VECS:
        scale, codes = _py_quant(vec)
        assert rows[vid]["q_vec"] == codes, vid
        assert abs(rows[vid]["q_scale"] - scale) == 0.0, vid


def test_code_range_and_reconstruction_error(spark):
    out = quantize_int8(_df(spark))
    recon = out.select(
        "vec_id",
        "embedding",
        "q_scale",
        dequantize_expr(F.col("q_vec"), F.col("q_scale")).alias("back"),
        F.array_max(F.transform("q_vec", lambda x: F.abs(x))).alias("amax"),
    ).collect()
    for r in recon:
        assert r["amax"] <= Q_MAX
        for orig, back in zip(r["embedding"], r["back"]):
            assert abs(orig - back) <= r["q_scale"] / 2.0 + 1e-12


def test_quantized_cosine_self_is_one_and_scale_invariant(spark):
    # v and 1000*v quantize to the SAME codes (scale absorbs magnitude),
    # and the quantized cosine of a vector with itself is 1 up to the one
    # ulp sqrt(n)*sqrt(n) can drift from n — the catalog entry's micro-unit
    # rounding absorbs exactly this.
    base = [0.3, -0.6, 0.9, 0.15]
    df = spark.createDataFrame(
        [(0, base), (1, [1000.0 * v for v in base])],
        "vec_id int, embedding array<double>",
    )
    q = quantize_int8(df).select("vec_id", "q_vec").collect()
    codes = {r["vec_id"]: r["q_vec"] for r in q}
    assert codes[0] == codes[1]
    one = (
        quantize_int8(df.filter("vec_id = 0"))
        .select(
            quantized_cosine_expr(F.col("q_vec"), F.col("q_vec")).alias("c")
        )
        .first()["c"]
    )
    assert abs(one - 1.0) < 1e-12


def test_int_dot_is_exact(spark):
    df = spark.createDataFrame(
        [([127, -127, 64], [127, 127, -64])], "a array<long>, b array<long>"
    )
    got = df.select(int_dot_expr(F.col("a"), F.col("b")).alias("d")).first()
    assert got["d"] == 127 * 127 - 127 * 127 - 64 * 64


def test_recall_entry_plan_and_self_hit(spark):
    """The catalog entry must keep the corpus scan join broadcast (no
    CartesianProduct) and every query's exact top-10 must contain itself
    in both rankings (cosine with itself is 1 in both scorings)."""
    from carto_etl_spark.plans.inspect import explain_str
    from carto_etl_spark.queries import q_quant_recall

    df = q_quant_recall(spark, "/root/testdata/sf0.001")
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    rows = df.collect()
    assert len(rows) == 20
    for r in rows:
        assert 1 <= r["hits"] <= 10
        assert r["q_norm2"] > 0


def test_ivf_sq8_self_hit_and_quantized_recall(spark):
    """IVF-SQ8 composition: the query's own list is always probed, the
    query ranks first (integer self-cosine is the maximum), and the
    quantized top-5 equals the exact-cosine top-5 restricted to the same
    probed candidates at this corpus's separation."""
    from pyspark.sql import functions as F

    from carto_etl_spark.operators import similarity as sim
    from carto_etl_spark.queries import q_ann_ivf_sq8

    rows = q_ann_ivf_sq8(spark, "/root/testdata/sf0.001").collect()
    assert rows[0]["vec_id"] == 0
    assert rows[0]["qcos_u"] == 1000000
    # quantized ranking matches exact ranking over the probed candidates
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    query = [
        float(v)
        for v in e.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    exact = [
        r["vec_id"]
        for r in sim.ivf_sampled_topk(
            e, query, k=5, n_lists=8, nprobe=3
        ).collect()
    ]
    assert [r["vec_id"] for r in rows] == exact
