"""Measure the classifier quality gate at corpus scale (r7 verdict #2).

``quality_score_expr`` is the corpus-wide scan filter of the CCNet-style
pipeline, and its per-token cost is a higher-order ``aggregate`` fold —
interpreted, like every Spark HOF.  This tool prices that fold against
the two alternatives at real token volumes, plus a distributed-training
datapoint past the scheduler-floor regime:

- **fold**: the shipped scan-stage expression (HOF aggregate; md5 runs
  interpreted inside the lambda);
- **arrow**: ``quality_scores_arrow`` — mapInPandas, per-batch token
  memo, bit-identical (the tool asserts score-sum equality every run);
- **explode**: the expansion recipe — explode tokens, codegen md5
  bucket, hash-aggregate the weight sum per doc (one shuffle; loses the
  scan-stage property, shown as the codegen-cost floor).

Corpora: sf0.1 documents (5k docs), the 10x tile (50k), and the 505k
md5-mixed corpus from tools/make_docs_testdata.py (~27M tokens).

Training datapoint: hashed_features over the big corpus (>=10^6 feature
rows), driver_threshold_rows=0 to force the 2-shuffle/iteration
distributed loop, reported per iteration.

Usage: python tools/bench_classifier_gate.py [--train-only|--gate-only]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from carto_etl_spark.operators import classifier as clf
from carto_etl_spark.operators import text as tx
from carto_etl_spark.session import get_spark

CORPORA = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("x10", "/tmp/carto-sfx10"),
    ("505k", "/tmp/carto-docs505k"),
]
DIM = 64
TAU = 500_000


def _time(fn, iters: int = 2) -> float:
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def _gate_agg(scored, col):
    return scored.agg(
        F.sum(col).alias("s"),
        F.sum((F.col(col) >= TAU).cast("long")).alias("kept"),
    ).first()


def main() -> None:
    spark = get_spark("bench-classifier-gate")
    spark.sparkContext.setLogLevel("ERROR")
    mode = sys.argv[1] if len(sys.argv) > 1 else ""

    # one fixed model for every corpus: train on sf0.1 (driver path —
    # training cost is measured separately below)
    d01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    feats = tx.hashed_features(d01, "text", ["doc_id"], dim=DIM)
    toks = tx.tokens_expr(F.col("text"))
    junk = F.size(F.filter(toks, lambda x: x.isin("slow", "dup", "a")))
    labels = d01.select(
        "doc_id", (junk * 24 <= F.size(toks)).cast("int").alias("label")
    )
    w, b = clf.train_quality_classifier(feats, labels, dim=DIM, iterations=12)

    out: dict = {}
    if mode != "--train-only":
        w_sql = "array(" + ", ".join(f"{x}L" for x in w) + ")"
        for name, path in CORPORA:
            if not os.path.exists(f"{path}/documents.parquet"):
                print(f"# {name}: missing {path}, skipping", file=sys.stderr)
                continue
            d = spark.read.parquet(f"{path}/documents.parquet")
            n_docs = d.count()
            n_toks = d.agg(F.sum(F.size(tx.tokens_expr(F.col("text"))))).first()[0]

            expr_scored = d.select(
                clf.quality_score_expr("text", w, b).alias("s")
            )
            arrow_scored = clf.quality_scores_arrow(
                d.select("text"), "text", w, b, out_col="s"
            )
            # expansion recipe: codegen md5 + hash-agg (the cost floor for
            # JVM-side per-token work; one shuffle keyed by doc)
            bucket = (
                F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
                .cast("long") % DIM
            ).cast("int")
            explode_scored = (
                d.select(
                    "doc_id",
                    F.explode(tx.tokens_expr(F.col("text"))).alias("tok"),
                )
                .select(
                    "doc_id",
                    F.element_at(F.expr(w_sql), bucket + 1).alias("wt"),
                )
                .groupBy("doc_id")
                .agg(F.sum("wt").alias("m"))
                .select(
                    F.expr(
                        f"greatest(0L, least(1000000L, "
                        f"(coalesce(m, 0L) + {b}L) div 4 + 500000L))"
                    ).alias("s")
                )
            )

            r_fold = _gate_agg(expr_scored, "s")
            r_arrow = _gate_agg(arrow_scored, "s")
            assert (r_fold["s"], r_fold["kept"]) == (r_arrow["s"], r_arrow["kept"]), (
                name, dict(r_fold.asDict()), dict(r_arrow.asDict()))

            t_fold = _time(lambda: _gate_agg(expr_scored, "s"))
            t_arrow = _time(lambda: _gate_agg(arrow_scored, "s"))
            t_explode = _time(lambda: _gate_agg(explode_scored, "s"))
            out[name] = {
                "docs": n_docs,
                "tokens": int(n_toks),
                "fold_s": round(t_fold, 3),
                "arrow_s": round(t_arrow, 3),
                "explode_s": round(t_explode, 3),
                "fold_Mtok_per_s": round(n_toks / t_fold / 1e6, 2),
                "arrow_Mtok_per_s": round(n_toks / t_arrow / 1e6, 2),
                "kept_frac": round(r_fold["kept"] / n_docs, 4),
            }
            print(name, json.dumps(out[name]))

    if mode != "--gate-only":
        big = spark.read.parquet("/tmp/carto-docs505k/documents.parquet")
        bfeats = tx.hashed_features(big, "text", ["doc_id"], dim=DIM)
        n_feat = bfeats.count()
        bjunk = F.size(F.filter(tx.tokens_expr(F.col("text")),
                                lambda x: x.isin("slow", "dup", "a")))
        blabels = big.select(
            "doc_id",
            (bjunk * 24 <= F.size(tx.tokens_expr(F.col("text"))))
            .cast("int").alias("label"),
        )
        iters = 3
        t0 = time.time()
        clf.train_quality_classifier(
            bfeats, blabels, dim=DIM, iterations=iters,
            driver_threshold_rows=0,
        )
        wall = time.time() - t0
        out["train_distributed"] = {
            "feature_rows": n_feat,
            "iterations": iters,
            "wall_s": round(wall, 2),
            "per_iter_s": round(wall / iters, 2),
        }
        print("train_distributed", json.dumps(out["train_distributed"]))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
