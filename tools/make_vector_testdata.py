"""Generate a large synthetic embeddings table for honest vector-family
scaling runs.

Why this exists: the driver's TESTDATA embeddings table is fixed at 500
rows x 64 dims at EVERY scale factor, so the 10x scaling datapoints for the
ANN / quantization / SemDeDup family are flat by construction — the 100 TB
vector story was argued from plan shape only (r5 verdict #1).  This tool
makes corpora big enough that the measured ratio reflects the algorithm.

Recipe (md5-mixed, the TESTDATA synthetic-data idiom — deterministic, no
RNG state, reproducible by any engine):

- ``label = vec_id % n_clusters``; cluster centroids are md5-derived unit
  ranges: ``c(label, d) = (u('c:<label>:<d>') - 0.5) * 2``.
- ``embedding[d] = (u('<vec_id>:<d>') - 0.5) * 1.2 + c(label, d)`` where
  ``u(s) = conv(substr(md5(s), 1, 8), 16, 10) / 2^32`` — uniform noise
  around the centroid, so the corpus has real cluster structure (IVF /
  SemDeDup assignment is meaningful) while every value is a pure function
  of (vec_id, d).  The noise scale (1.2 vs the centroid range of 2) puts
  intra-cluster cosines at ~0.7 — clustered enough that IVF/SemDeDup
  assignment is meaningful, spread enough that LSH buckets do not collapse
  (a 0.4-scale first cut left cluster-mates at ~0.96 cosine and every
  banded-LSH candidate stage quadratic in cluster size).
- every 100th vector gains a NEAR-DUP partner (id + 10^9, dim-0 nudged by
  +1e-3): a controlled ~1% near-dup incidence so semantic-dedup output
  stays proportional instead of exploding or vanishing with n.

Float32 like the driver table (oracles mirror with a REAL cast).

Usage: python tools/make_vector_testdata.py [n_rows] [out_dir]
       (defaults: 500000, /tmp/carto-vec500k; writes
       <out_dir>/embeddings.parquet with columns vec_id, embedding, label)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from carto_etl_spark.session import get_spark

DIM = 64
N_CLUSTERS = 4096
NEAR_DUP_EVERY = 100
NEAR_DUP_OFFSET = 1_000_000_000


def _u(expr):
    """md5-mixed uniform in [0, 1): top 32 bits of md5 over 2^32."""
    return F.conv(F.substring(F.md5(expr), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(2**32))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/carto-vec500k"
    spark = get_spark("make-vector-testdata")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % N_CLUSTERS).cast("int").alias("label"),
    )
    vid, lab = F.col("vec_id").cast("string"), F.col("label").cast("string")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (
            (_u(F.concat(vid, F.lit(":"), d.cast("string"))) - 0.5) * 1.2
            + (
                _u(F.concat(F.lit("c:"), lab, F.lit(":"), d.cast("string")))
                - 0.5
            )
            * 2.0
        ).cast("float"),
    )
    df = base.select("vec_id", emb.alias("embedding"), "label")

    near = (
        df.filter(F.col("vec_id") % NEAR_DUP_EVERY == 0)
        .select(
            (F.col("vec_id") + NEAR_DUP_OFFSET).alias("vec_id"),
            F.concat(
                F.array((F.element_at("embedding", 1) + F.lit(1e-3)).cast("float")),
                F.slice("embedding", 2, DIM - 1),
            ).alias("embedding"),
            "label",
        )
    )
    full = df.unionByName(near)
    os.makedirs(out, exist_ok=True)
    full.repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    print(f"wrote {out}/embeddings.parquet: {n} + {n // NEAR_DUP_EVERY} rows")
    spark.stop()


if __name__ == "__main__":
    main()
