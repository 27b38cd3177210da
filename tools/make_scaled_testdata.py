"""Scale the sf0.1 test tables K-fold into a scratch dir for scaling runs.

The driver generates sf<=0.1 only; the 100 TB posture claim needs at least
one measured scale-up datapoint.  This tool replicates every table K times
with per-replica key offsets (joins stay consistent within a replica; dims
nation/region are shared) and writes MULTI-FILE parquet (32 files per
table) so scans split the way they would on a real cluster — the driver's
single-row-group files cap scan parallelism at 1, which would understate
every scan-bound query.

Dedup-sensitive columns are NOT tiled verbatim (r4 lesson: a replica token
appended to otherwise-identical text leaves replicas mutual NEAR-dups, so
the pair graph grows ~K^2 and 10x ratios measure the tiling artifact, not
the algorithm):

- ``documents.text``: replica i>0 prefixes every word with ``r<i>`` — zero
  shared shingles across replicas, so cross-replica similarity is 0 — and
  each replica re-creates the CONTROLLED near-dup rate instead: for every
  10th doc a near-copy row (text + ' scaled near dup', doc_id offset by
  5*10^8) is emitted inside the same replica.  Corpus = K * 1.1x docs with
  a known ~9% near-dup incidence at every scale.
- ``customer.c_name``: replica i>0 appends ``-r<i>`` so entity-resolution
  blocking (SymSpell edit-1 deletions) does not pair identical names
  across replicas.
- ``embeddings.embedding``: replica i>0 rotates every vector by i
  positions — one permutation per replica preserves every intra-replica
  dot product exactly while cross-replica cosines drop to
  random-orthogonal levels, so near-dup pair graphs stay ~linear.

Usage: python tools/make_scaled_testdata.py [K] [out_dir]
       (defaults: K=10, out_dir=/tmp/carto-sfx10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from carto_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

#: key columns shifted per replica (offset = replica * 10^9)
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
SHARED_DIMS = ["region", "nation"]
OFFSET = 1_000_000_000


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/carto-sfx10"
    spark = get_spark("make-scaled-testdata")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    for name in SHARED_DIMS:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: copied {df.count()} rows")

    for name, keys in KEY_SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        cols = df.columns
        replicas = []
        for i in range(k):
            rep = df
            for key in keys:
                if key in cols:
                    rep = rep.withColumn(
                        key, (F.col(key) + F.lit(i * OFFSET)).cast("long")
                    )
            if name == "documents" and i > 0:
                # disjoint per-replica vocabulary: no shingle survives
                # across replicas, so cross-replica Jaccard is exactly 0
                rep = rep.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), r"\s+"),
                            lambda w: F.concat(F.lit(f"r{i}"), w),
                        ),
                    ),
                )
            if name == "customer" and i > 0:
                rep = rep.withColumn(
                    "c_name", F.concat(F.col("c_name"), F.lit(f"-r{i}"))
                )
            if name == "embeddings" and i > 0:
                # rotate each vector by i positions: ONE permutation applied
                # to the whole replica preserves every intra-replica dot
                # product exactly, while cross-replica pairs become
                # (v, rot_i(w)) — near-orthogonal for random vectors — so
                # embedding near-dup pair graphs stop growing ~K^2
                rep = rep.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(
                            F.col("embedding"),
                            i + 1,
                            F.size(F.col("embedding")) - i,
                        ),
                        F.slice(F.col("embedding"), 1, i),
                    ),
                )
            if name == "documents":
                # controlled near-dup rate inside each replica: every 10th
                # doc gains one near-copy partner (+' scaled near dup',
                # id offset well clear of the replica key ranges)
                near = rep.filter(F.col("doc_id") % 10 == 0).withColumns({
                    "doc_id": (F.col("doc_id") + F.lit(OFFSET // 2)).cast(
                        "long"
                    ),
                    "text": F.concat(
                        F.col("text"), F.lit(" scaled near dup")
                    ),
                })
                rep = rep.unionByName(near.select(*cols))
            replicas.append(rep.select(*cols))
        union = replicas[0]
        for rep in replicas[1:]:
            union = union.unionByName(rep)
        union.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: {k}x tiled")
    spark.stop()
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
