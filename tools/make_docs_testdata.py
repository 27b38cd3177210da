"""Generate a large synthetic documents table for corpus-scale gate-scan
measurements (r7 verdict #2: the classifier gate is the corpus-wide scan
filter, but the driver's documents table caps at 5k rows / sf0.1 — every
per-token cost question needs a corpus where token volume, not session
fixed overhead, dominates).

Recipe (md5-mixed like make_vector_testdata — deterministic, no RNG
state): doc i carries ``30 + (u(i) * 50)`` tokens; token j of doc i is
``vocab[floor(u(i:j)^3 * V)]`` — the cube skews draws toward low indices,
giving the Zipf-ish repeat structure real corpora have (and that the
Arrow gate's per-batch token memo exists for).  The vocabulary mixes the
quality-gate junk markers into ordinary words so trained weights produce
a full score spread.

Usage: python tools/make_docs_testdata.py [n_rows] [out_dir]
       (defaults: 505000, /tmp/carto-docs505k; writes
       <out_dir>/documents.parquet with columns doc_id, text)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from carto_etl_spark.session import get_spark

VOCAB_SIZE = 512
N_FILES = 32


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 505_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/carto-docs505k"
    spark = get_spark("make-docs-testdata")
    spark.sparkContext.setLogLevel("ERROR")

    # junk markers every ~16th slot so the planted junk-ratio label rule
    # (queries.py _QC_JUNK) has real signal at every corpus size
    vocab = [
        ("slow", "dup", "a")[i % 3] if i % 16 == 0 else f"w{i:03d}"
        for i in range(VOCAB_SIZE)
    ]
    vocab_sql = "array(" + ", ".join(f"'{w}'" for w in vocab) + ")"
    u_doc = "conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) / 4294967296.0"
    u_tok = (
        "conv(substring(md5(concat(cast(doc_id as string), ':', cast(j as string))),"
        " 1, 8), 16, 10) / 4294967296.0"
    )
    df = (
        spark.range(n).withColumnRenamed("id", "doc_id")
        .withColumn("n_tok", F.expr(f"30 + cast({u_doc} * 50 as int)"))
        .withColumn(
            "text",
            F.expr(
                "concat_ws(' ', transform(sequence(1, n_tok), j -> "
                f"element_at({vocab_sql}, cast(pow({u_tok}, 3)"
                f" * {VOCAB_SIZE} as int) + 1)))"
            ),
        )
        .select("doc_id", "text")
    )
    os.makedirs(out, exist_ok=True)
    df.repartition(N_FILES).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    back = spark.read.parquet(f"{out}/documents.parquet")
    stats = back.agg(
        F.count("*").alias("docs"),
        F.avg(F.size(F.split(F.col("text"), " "))).alias("avg_tokens"),
    ).first()
    print(f"{out}: {stats['docs']} docs, avg {stats['avg_tokens']:.1f} tokens")


if __name__ == "__main__":
    main()
