"""Bloom-prefiltered anti-join: dedup a huge corpus against a reference set
without shuffling the corpus.

Not in the reference (its scope ends at SQL-text DML,
/root/reference/etl/etl.py); a north-star scale operator.  The standing
problem in a 100 TB training pipeline is "drop every document whose key
already appears in an existing corpus / blocklist" — a plain ``left_anti``
join shuffles BOTH sides on the key, and the big side is 100 TB.

Design — the asymmetry is the point:

* The REFERENCE side (existing corpus keys, a blocklist) is aggregated once
  into a Bloom bitmap of ``num_bits`` bits packed into an ``array<long>``.
  The aggregation is fully distributed (per-partition partial ``bit_or`` by
  word index, then a single-row dense-array assembly); the driver never
  materializes anything — the bitmap lives in ONE Spark row and is
  broadcast.  State is O(num_bits), independent of reference row count.
* The CORPUS side is scanned once.  Rows whose key misses the bloom are
  DEFINITELY absent from the reference (no false negatives) and pass
  straight through with zero shuffle.  Only the bloom hits — true matches
  plus the ~``fpp`` false-positive sliver — enter an exact ``left_anti``
  verify join, so the final result is EXACTLY ``corpus left_anti reference``
  while the join input is a small fraction of the corpus.
* Hash family: k salted rounds of the same Lehmer/xor-shift hash the
  sampling operators use (operators/sampling.py:hash_expr), so the whole
  decision chain stays pure column arithmetic with a DuckDB-SQL twin.

At 100 TB: corpus side is map-only until the verify join; reference side
shuffles only (word_idx, partial-or) pairs, at most ``num_bits/64`` per
partition.  ``suggest_num_bits`` sizes the filter at ~10 bits/key (<1% fp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

from carto_etl_spark.operators.sampling import hash_expr, hash_sql

#: Bitmap array column name used internally on the broadcast side.
_BLOOM_COL = "__bloom_words"


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def numeric_key_expr(df: DataFrame, on: str) -> Column:
    """Numeric hash-input key for a column of any type.  Integral columns
    cast directly; string/binary keys (content hashes, URLs — the common
    case) derive a 60-bit integer from an md5 prefix, since a bare
    ``cast("long")`` THROWS under ANSI mode for non-numeric text.  An md5
    collision between two distinct keys only merges their bloom bits — one
    more false positive for the exact verify join to discard — so
    correctness is unaffected."""
    col = F.col(on)
    if isinstance(df.schema[on].dataType, (StringType, BinaryType)):
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return col.cast("long")


def suggest_num_bits(expected_keys: int, bits_per_key: int = 10) -> int:
    """Power-of-two bitmap size for ~``bits_per_key`` bits per distinct key
    (10 bits/key with 3 hashes gives ~1% false positives).  Capped at 2^27
    bits (16 MiB = 2 Mi longs) to keep the broadcast row sane."""
    want = max(1024, expected_keys * bits_per_key)
    bits = 1024
    while bits < want and bits < (1 << 27):
        bits <<= 1
    return bits


def bloom_positions(
    key: Column | str, num_bits: int, num_hashes: int = 3
) -> list[Column]:
    """The ``num_hashes`` bit positions of a key, each from an independently
    salted hash round.  Positions are in [0, num_bits)."""
    return [
        F.pmod(hash_expr(_col(key), salt=1000003 * (i + 1)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    ref: DataFrame,
    key: Column | str,
    num_bits: int,
    num_hashes: int = 3,
) -> DataFrame:
    """ONE-row DataFrame holding the reference side's Bloom bitmap as
    ``array<long>`` (``num_bits/64`` words).

    Stage 1 sets bits distributed: explode each key's positions, map to
    (word_idx, single-bit long), and ``bit_or``-aggregate per word — a
    shuffle of at most ``num_bits/64`` rows per partition after map-side
    partial aggregation.  Stage 2 assembles the dense array in a single-row
    aggregate: sparse (idx, word) entries → map → ``transform(sequence(...))``
    fill.  No driver-side collect anywhere.
    """
    n_words = (num_bits + 63) // 64
    pos = F.explode(F.array(*bloom_positions(key, num_bits, num_hashes)))
    sparse = (
        ref.select(pos.alias("pos"))
        .where(F.col("pos").isNotNull())
        .selectExpr(
            "CAST(shiftright(pos, 6) AS INT) AS word_idx",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS bit",
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    return sparse.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word_idx"), F.col("word")))
        ).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.col("m")[i], F.lit(0).cast("long")),
        ).alias(_BLOOM_COL)
    )


def might_contain(
    key: Column | str, bloom_words: Column, num_bits: int, num_hashes: int = 3
) -> Column:
    """Bloom membership test against the broadcast ``array<long>`` bitmap.
    NULL keys test NULL (callers route them to the exact path).  Guaranteed
    no false negatives: a False here proves the key is not in the set."""
    conds = []
    for pos in bloom_positions(key, num_bits, num_hashes):
        word = F.element_at(bloom_words, F.shiftright(pos, 6).cast("int") + F.lit(1))
        conds.append(F.getbit(word, (pos % 64).cast("int")) == 1)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def bloom_anti_join(
    big: DataFrame,
    ref: DataFrame,
    on: str,
    num_bits: int | None = None,
    num_hashes: int = 3,
    expected_ref_keys: int | None = None,
) -> DataFrame:
    """EXACT ``big.join(ref, on, "left_anti")`` where only the Bloom-hit
    sliver of ``big`` enters the join.

    Rows that miss the bloom are provably absent from ``ref`` and bypass the
    join entirely (map-only).  Bloom hits — true matches plus ~1% false
    positives — are verified by a real anti-join against ``ref``'s distinct
    keys, so false positives cost a little join input, never a wrong answer.
    NULL keys short-circuit to the exact path, where ``left_anti``'s
    null-safe-less equality keeps them (matching the plain anti-join).
    """
    if num_bits is None:
        num_bits = suggest_num_bits(
            expected_ref_keys if expected_ref_keys is not None else 1 << 16
        )
    # lazy localCheckpoint: both union branches reference the SAME
    # materialized one-row bitmap, so the reference side is scanned once for
    # the bitmap build instead of once per branch
    bloom = build_bloom(
        ref, numeric_key_expr(ref, on), num_bits, num_hashes
    ).localCheckpoint(eager=False)
    tagged = big.join(F.broadcast(bloom), how="cross")
    maybe = _col(on).isNull() | might_contain(
        numeric_key_expr(big, on), F.col(_BLOOM_COL), num_bits, num_hashes
    )
    definite_absent = tagged.where(~maybe).drop(_BLOOM_COL)
    candidates = (
        tagged.where(maybe)
        .drop(_BLOOM_COL)
        .join(ref.select(on).distinct(), on=on, how="left_anti")
    )
    return definite_absent.unionByName(candidates)


def bloom_positions_sql(key_sql: str, num_bits: int, num_hashes: int = 3) -> list[str]:
    """DuckDB-SQL twins of ``bloom_positions`` (same salts, same modulus), so
    an oracle can re-derive every membership decision value-for-value."""
    return [
        f"(({hash_sql(key_sql, salt=1000003 * (i + 1))}) % {num_bits})"
        for i in range(num_hashes)
    ]


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bitwise OR of two bitmaps built with the SAME (num_bits, num_hashes):
    the bloom of the union of their key sets.  This is what makes the filter
    incrementally maintainable — ingest batch N's bitmap merges into the
    corpus bitmap in O(num_bits) without revisiting old data."""
    aw = a.select(F.col(_BLOOM_COL).alias("__a"))
    bw = b.select(F.col(_BLOOM_COL).alias("__b"))
    return aw.crossJoin(bw).select(
        F.zip_with("__a", "__b", lambda x, y: x.bitwiseOR(y)).alias(_BLOOM_COL)
    )


def save_bloom(bloom: DataFrame, path: str) -> None:
    """Persist a bitmap as a one-row parquet — the durable dedup state a
    streaming/batch ingest keeps between runs."""
    bloom.write.mode("overwrite").parquet(path)


def load_bloom(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def bloom_semi_join(
    big: DataFrame,
    ref: DataFrame,
    on: str,
    num_bits: int | None = None,
    num_hashes: int = 3,
    expected_ref_keys: int | None = None,
) -> DataFrame:
    """EXACT ``big.join(ref, on, "left_semi")`` (whitelist filtering) with the
    same prefilter structure as ``bloom_anti_join``: bloom misses are
    provably absent and drop map-side; only hits reach the exact semi join.
    NULL keys are dropped up front, matching left_semi's null semantics."""
    if num_bits is None:
        num_bits = suggest_num_bits(
            expected_ref_keys if expected_ref_keys is not None else 1 << 16
        )
    bloom = build_bloom(
        ref, numeric_key_expr(ref, on), num_bits, num_hashes
    ).localCheckpoint(eager=False)
    tagged = big.join(F.broadcast(bloom), how="cross")
    maybe = might_contain(
        numeric_key_expr(big, on), F.col(_BLOOM_COL), num_bits, num_hashes
    )
    return (
        tagged.where(F.col(on).isNotNull() & maybe)
        .drop(_BLOOM_COL)
        .join(ref.select(on).distinct(), on=on, how="left_semi")
    )
