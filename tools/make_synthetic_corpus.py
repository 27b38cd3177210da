"""Generate a NON-TILED synthetic document corpus at arbitrary scale
(r8 verdict #3).

tools/make_scaled_testdata.py replicates the sf0.1 tables K-fold with
per-replica mutations; that keeps cross-replica similarity near zero, but
operators with oracle-PINNED parameters (fixed LSH plane/band counts,
fixed IVF lists) still see bucket occupancy grow with K and their pair
volume grows ~quadratically — so every composed-pipeline ratio above the
measured 11x carried a tiling caveat.  This tool instead SYNTHESIZES n
fresh documents directly, with controlled structure:

- text: 10-100 words drawn per-position from the sf0.1 vocabulary via
  xxhash64(doc_id, position) — fully distributed column expressions
  (spark.range -> transform/sequence/element_at), no driver data, no
  Python, deterministic across runs;
- near-dups: a configurable fraction of docs (default ~9%, matching the
  driver corpus convention) gets exactly ONE mutated near-copy (first
  word swapped + a tail sentence, doc_id offset by 10^9): clusters of
  size 2, so true pair volume grows LINEARLY with n at every scale;
- boilerplate is NOT baked in: the pipeline queries construct their own
  banner/footer lines in-query, on top of whatever corpus they read;
- lang/source columns mimic the driver distribution (en-heavy + fr/es/
  de/zh, 20 sources) so dsir_sample's fr-target/en-pool split and the
  reputation/mixture groupings stay meaningful.

Other tables are symlinked from the source sf dir so the output directory
is a drop-in SPARK_GRAFT_SF_DIR for bench.py subset runs:

    python tools/make_synthetic_corpus.py 500000 /tmp/carto-syn100x
    SPARK_GRAFT_SF_DIR=/tmp/carto-syn100x \
    SPARK_GRAFT_BENCH_ONLY=pipeline_fineweb,pipeline_ccnet,minhash_dedup,dsir_sample \
    python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from carto_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

#: the sf0.1 vocabulary (50 engine-flavored words, same as the driver's
#: generator output — see TESTDATA.md)
VOCAB = [
    "the", "a", "spark", "table", "scan", "merge", "join", "sort", "agg",
    "group", "window", "filter", "row", "column", "value", "key", "hash",
    "batch", "stream", "query", "data", "line", "part", "order", "customer",
    "small", "big", "fast", "slow", "vector", "dup", "span", "token",
    "shard", "split", "sample", "mix", "pack", "score", "rank", "tile",
    "grid", "point", "zone", "code", "text", "doc", "page", "word", "char",
]

LANGS = ["en", "en", "en", "en", "es", "de", "fr", "zh"]


def build(spark, n: int, near_dup_every: int = 11):
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    langs = F.array(*[F.lit(l) for l in LANGS])
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    nwords = (F.pmod(F.xxhash64("doc_id", F.lit("len")), F.lit(90)) + 10)

    # 20% core vocabulary (stop-word-bearing, keeps lang-ID / quality /
    # DSIR signals meaningful), 80% from a 200k hashed vocabulary.  The
    # big tail is what makes the corpus minhash-REALISTIC: with only the
    # 50 core words the 3-gram shingle universe is ~10^5, the min over a
    # doc's shingle hashes concentrates on the globally smallest values,
    # and at a few 10^5 docs every LSH bucket collides — candidate pairs
    # grow quadratically and the verify broadcast OOMs (observed r9 at
    # 545k docs).  Real web text has an effectively unbounded shingle
    # universe; 200k word types restores that regime.
    def word_at(i):
        core = F.element_at(
            vocab,
            (F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(1)), F.lit(50)) + 1
             ).cast("int"),
        )
        rare = F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(2)), F.lit(200_000)),
        )
        return F.when(
            F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(3)), F.lit(5)) == 0,
            core,
        ).otherwise(rare)

    words = F.transform(F.sequence(F.lit(1), nwords), word_at)
    docs = base.select(
        "doc_id",
        F.concat_ws(" ", words).alias("text"),
        F.element_at(
            langs,
            (F.pmod(F.xxhash64("doc_id", F.lit("lang")), F.lit(len(LANGS)))
             + 1).cast("int"),
        ).alias("lang"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64("doc_id", F.lit("src")), F.lit(20))
        ).alias("source"),
    )
    # exactly one near-copy per selected source doc: swap the first word,
    # keep the rest, append a short tail — high-Jaccard, cluster size 2
    near = docs.filter(F.col("doc_id") % near_dup_every == 0).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
        F.concat(
            F.lit("mutated "),
            # drop the first word: everything after the first space (a
            # one-word doc keeps its word; still a near-dup after the tail)
            F.expr("substring(text, instr(text, ' ') + 1)"),
            F.lit(" near dup tail."),
        ).alias("text"),
        "lang",
        "source",
    )
    out = docs.unionByName(near)
    return out.withColumn("n_chars", F.length("text").cast("long"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/carto-syn100x"
    files = int(os.environ.get("SYN_CORPUS_FILES", "64"))
    spark = get_spark("make-synthetic-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    docs = build(spark, n)
    docs.repartition(files).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    total = spark.read.parquet(os.path.join(out_dir, "documents.parquet")).count()
    print(f"documents: {total} rows ({n} base + near-dups) -> {out_dir}")
    for name in os.listdir(SRC):
        if name == "documents.parquet":
            continue
        dst = os.path.join(out_dir, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, name), dst)
    print("other tables symlinked from", SRC)


if __name__ == "__main__":
    main()
