"""Bucketed catalog tables: pre-shuffled data layout for co-located keyed
joins (SURVEY §4: the analog of the reference's "index the id column"
recommendation, README.md:148 — but instead of an index, the table is laid
out so the join needs NO shuffle at read time).

At 100 TB, a keyed update/delete/join against a table bucketed on the key
skips the Exchange on the bucketed side entirely: each bucket is read by the
task that joins it.  Writing costs one up-front shuffle; every subsequent
keyed operation amortizes it."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class BucketedTable:
    """A Spark-catalog-managed table bucketed (and sorted) by a key."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        bucket_col: str,
        num_buckets: int = 32,
    ):
        self.spark = spark
        self.name = name
        self.bucket_col = bucket_col
        self.num_buckets = num_buckets

    def create_from(self, df: DataFrame) -> None:
        (
            df.write.bucketBy(self.num_buckets, self.bucket_col)
            .sortBy(self.bucket_col)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(self.name)
        )

    def append(self, df: DataFrame) -> None:
        (
            df.write.bucketBy(self.num_buckets, self.bucket_col)
            .sortBy(self.bucket_col)
            .mode("append")
            .format("parquet")
            .saveAsTable(self.name)
        )

    def read(self) -> DataFrame:
        return self.spark.table(self.name)

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.name}")


def colocated_join(
    left: BucketedTable, right: BucketedTable, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket count —
    Catalyst plans a sort-merge join with NO Exchange on either side."""
    if (
        left.bucket_col != right.bucket_col
        or left.num_buckets != right.num_buckets
    ):
        raise ValueError(
            "co-located join requires identical bucket column and count"
        )
    return left.read().join(right.read(), left.bucket_col, how)
