"""Benchmark decontamination: flag / drop training documents that share word
n-grams with an evaluation set.

Not in the reference (scope ends at SQL-text DML, /root/reference/etl/etl.py);
a mandated north-star operator — every serious training corpus is scrubbed of
eval-benchmark text before training, and the standard method (PaLM/GPT-3
style) is exact word-n-gram overlap: a document is contaminated if it shares
at least one n-gram (n ≈ 8–13) with any benchmark document.

Scale posture — the asymmetry is the whole design:

* the CORPUS side is 100 TB, the BENCHMARK side is a few hundred MB of eval
  sets.  The benchmark's distinct n-gram set is built once (tiny) and
  broadcast; the corpus side is an explode → broadcast-hash semi-join →
  per-document count.  No shuffle ever touches corpus text.
* corpus n-grams are deduplicated per-document *inside the array* before the
  explode (``array_distinct``), so the exploded row count is bounded by
  distinct-n-grams-per-doc, and the join emits at most one row per
  (document, overlapping n-gram).
* if the benchmark outgrows broadcast size, the same plan degrades gracefully
  to a sort-merge join on the n-gram string — drop the broadcast hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from carto_etl_spark.operators import text as tx


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


#: Word n-gram construction lives with the other text expressions.
word_ngrams_expr = tx.word_ngrams_expr


def distinct_ngrams(
    df: DataFrame, text: Column | str, n: int, id_col: str
) -> DataFrame:
    """One row per (id, distinct n-gram).  The distinct happens inside the
    array (cheap, per-row) before the explode, so no row-level distinct
    shuffle is needed."""
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams_expr(text, n))).alias("ngram"),
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination report against a benchmark set.

    Returns ``(id_col, n_ngrams, n_overlap, contaminated)`` for EVERY corpus
    document: total distinct n-grams, how many also occur anywhere in the
    benchmark, and the ≥1-overlap flag.  ``n_ngrams`` comes from the array
    length (no join needed); only the overlap count goes through the join, as
    a broadcast-semi-shaped inner join + count.
    """
    bench_ngrams = (
        distinct_ngrams(benchmark, text_col, n, id_col)
        .select("ngram")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_ngrams = F.broadcast(bench_ngrams)

    # ONE corpus pass: stage the distinct-gram array (multiply-referenced
    # non-cheap alias — CollapseProject keeps it staged, so the
    # tokenize+gram chain is built once, not once per reference), carry its
    # size through an explode_outer (empty docs survive as a null-gram row),
    # and count benchmark hits via a left join against the flagged broadcast
    # set.  The previous totals-join-overlaps shape built the gram chain
    # twice and re-joined per doc (measured 2.4x slower at sf0.1).
    grams = corpus.select(
        F.col(id_col),
        F.array_distinct(word_ngrams_expr(text_col, n)).alias("__grams"),
    )
    staged = grams.select(
        F.col(id_col), F.size("__grams").alias("n_ngrams"), F.col("__grams")
    )
    exploded = staged.select(
        F.col(id_col), "n_ngrams", F.explode_outer("__grams").alias("ngram")
    )
    return (
        exploded.join(bench_ngrams, "ngram", "left")
        .groupBy(id_col, "n_ngrams")
        .agg(F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_overlap"))
        .select(
            id_col,
            "n_ngrams",
            "n_overlap",
            (F.col("n_overlap") > 0).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop corpus documents sharing ≥ ``min_overlap`` distinct n-grams with
    the benchmark; the surviving DataFrame keeps the original schema.

    Implemented as an anti-join against the contaminated-id set.  The id set
    is usually tiny (bounded by benchmark hits) and AQE will broadcast it
    from runtime stats; it is NOT force-broadcast here because a heavily
    contaminated corpus could make it arbitrarily large.
    """
    bad = (
        contamination(corpus, benchmark, n, text_col, id_col)
        .where(F.col("n_overlap") >= min_overlap)
        .select(id_col)
    )
    return corpus.join(bad, id_col, "left_anti")
