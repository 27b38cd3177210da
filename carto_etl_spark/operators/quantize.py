"""Scalar int8 embedding quantization — the standard 4x compression step
for embedding stores and ANN indexes (per-vector symmetric linear
quantization, the "SQ8" of FAISS; complementary to the product-quantization
codebooks in similarity.py: PQ compresses harder via codebooks, SQ8 keeps
per-coordinate fidelity and needs no training pass).

Not in the reference (it delegates all vector work to the database,
/root/reference/etl/etl.py:177-200); a first-class training-data-pipeline
operator: a 100 TB embedding column becomes 25 TB of int8 + one float
scale per vector, and similarity search runs on integer dot products.

Design for scale and for the differential oracle at once:

* Quantization is a pure scan-stage projection — ``transform`` over the
  array, no shuffle, no UDF.  ``q_i = floor(x_i / scale + 0.5)`` with
  ``scale = maxabs / 127``: every double op is written in ONE fixed order
  and mirrored textually in the DuckDB oracle, so the integer codes are
  bit-identical across engines (floor(+0.5) is half-up rounding in both).
* |q_i| <= 127 by construction: x_i/scale <= maxabs/scale = 127 up to one
  ulp, and floor(127 + ulp + 0.5) = 127, so no clamp branch is needed.
* The quantized COSINE needs no dequantization: the per-vector scales
  cancel, leaving ``dot(qa, qb) / (|qa| * |qb|)`` where dot and the
  squared norms are exact int64 sums (bounded by 64 * 127^2 < 2^20) — the
  only doubles are the final sqrt/divide, again in one mirrored order.
  Recall audits against the exact-cosine ranking are therefore
  value-checkable to the last bit, not just statistically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Q_MAX = 127  # symmetric int8 range [-127, 127]


def _maxabs_expr(vec: Column) -> Column:
    return F.aggregate(
        vec, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v))
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_vec",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Append per-vector symmetric int8 codes (as ``array<long>`` so the
    downstream integer dot products stay in one type) and the dequant
    scale.  All-zero vectors — and vectors whose maxabs is denormal enough
    that ``maxabs / 127`` underflows to 0.0 — quantize to all-zero codes
    with scale 0 (the zero-guard tests the SCALE, not maxabs, so the
    underflow case cannot divide by zero; the SQL oracle gates the same
    way).

    The scale is materialized as its own projection FIRST and the
    transform lambda references the resulting attribute: embedding the
    maxabs fold inside the lambda would re-run the O(d) aggregate per
    ELEMENT (higher-order functions evaluate their body per element with
    no loop-invariant hoisting) — O(d²) per row on the hottest scan.  The
    multiple references below also keep CollapseProject from inlining the
    non-cheap fold back in."""
    emb = F.col(vec_col).cast("array<double>")
    staged = df.withColumn(
        scale_col, _maxabs_expr(emb) / F.lit(float(Q_MAX))
    )
    scale = F.col(scale_col)
    q = F.when(
        scale == F.lit(0.0),
        F.transform(emb, lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            emb, lambda x: F.floor(x / scale + F.lit(0.5)).cast("long")
        )
    )
    return staged.withColumn(out_col, q)


def int_dot_expr(a: Column, b: Column) -> Column:
    """Exact integer dot product of two long-array columns (HOF fold —
    interpreted; use ``int_dot_fixed_expr`` when the dimension is known)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _int_dot_fixed_sql(a_sql: str, b_sql: str, dim: int) -> str:
    # flat left-associative sum — identical tree, linear parse (see
    # similarity._dot_fixed_sql)
    terms = " + ".join(
        f"(get({a_sql}, {i}) * get({b_sql}, {i}))" for i in range(dim)
    )
    return f"(CAST(0 AS BIGINT) + {terms})" if dim else "CAST(0 AS BIGINT)"


def int_dot_fixed_expr(a, b, dim: int) -> Column:
    """``int_dot_expr`` expanded over a statically known dimension — exact
    integer math, so the expansion is trivially identical; it exists purely
    to keep the hot quantized scans inside whole-stage codegen (HOFs are
    CodegenFallback, ~100x slower per element).  Operands may be Columns or
    SQL fragments; prefer strings — the Column form costs ~4 py4j round
    trips per term at expression-BUILD time."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_int_dot_fixed_sql(a, b, dim))
    acc: Column = F.lit(0).cast("long")
    for i in range(dim):
        acc = acc + F.get(a, i) * F.get(b, i)
    return acc


def quantized_cosine_expr(qa: Column, qb: Column) -> Column:
    """Cosine of the dequantized vectors — the scales cancel, so this is a
    pure function of the integer codes; NULL when either code vector is
    all-zero."""
    dot = int_dot_expr(qa, qb).cast("double")
    na = F.sqrt(int_dot_expr(qa, qa).cast("double"))
    nb = F.sqrt(int_dot_expr(qb, qb).cast("double"))
    return dot / F.nullif(na * nb, F.lit(0.0))


def quantized_cosine_fixed_expr(qa, qb, dim: int) -> Column:
    """``quantized_cosine_expr`` on the codegen expansion — identical values
    (integer dots are exact either way).  Column or SQL-string operands."""
    if isinstance(qa, str) and isinstance(qb, str):
        return F.expr(
            f"CAST({_int_dot_fixed_sql(qa, qb, dim)} AS DOUBLE) / "
            f"nullif(sqrt(CAST({_int_dot_fixed_sql(qa, qa, dim)} AS DOUBLE))"
            f" * sqrt(CAST({_int_dot_fixed_sql(qb, qb, dim)} AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE))"
        )
    dot = int_dot_fixed_expr(qa, qb, dim).cast("double")
    na = F.sqrt(int_dot_fixed_expr(qa, qa, dim).cast("double"))
    nb = F.sqrt(int_dot_fixed_expr(qb, qb, dim).cast("double"))
    return dot / F.nullif(na * nb, F.lit(0.0))


def dequantize_expr(q: Column, scale: Column) -> Column:
    """Reconstruct ``array<double>`` from codes + scale (error <= scale/2
    per coordinate by the half-up rounding)."""
    return F.transform(q, lambda x: x.cast("double") * scale)
