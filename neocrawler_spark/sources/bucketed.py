"""Bucketed `pages` corpus: the storage-partitioned fetch join (r3 VERDICT
#4 — the last genuine 100-TB scale-killer in the hot path).

The fetch join `pages ⋈ batch ON url` is the only place the multi-GB html
column could ever enter a shuffle. With the corpus written as a Spark
bucketed table on the join key (bucketBy(url) + sortBy(url), one file per
bucket), the scan itself REPORTS hashpartitioning(url, n_buckets), so
EnsureRequirements shuffles only the slim batch side into the corpus's
bucketing — the html column never moves:

    ShuffledHashJoin [url], BuildRight
    :- FileScan pages_bucketed  (Bucketed: true — NO Exchange)
    +- Exchange hashpartitioning(url, n_buckets)  (batch side only)

This is the same plan shape an Iceberg storage-partitioned join produces on
a real cluster; the plain-parquet bucketed table is the sandbox stand-in
(tests/test_bucketed_join.py pins the no-Exchange property).

Usage: write once with `write_bucketed_pages`, pass `bucketed_pages(spark,
name)` as CrawlContext.pages — plans/round.py needs no change; the bucketing
rides in the DataFrame's scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_pages(spark: SparkSession, df: DataFrame, path: str,
                         name: str = "pages_bucketed",
                         n_buckets: int = 32) -> DataFrame:
    """Write `df` as an external bucketed table on `url` and return a reader.

    The pre-write repartition uses the SAME murmur3-pmod hash as bucketBy, so
    each writer task holds exactly one bucket → one file per bucket, which is
    what lets the scan publish its sort order (Spark trusts per-bucket sort
    only with a single file per bucket)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.repartition(n_buckets, F.col("url"))
        .write.bucketBy(n_buckets, "url")
        .sortBy("url")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )
    return spark.table(name)


def bucketed_pages(spark: SparkSession, name: str = "pages_bucketed") -> DataFrame:
    return spark.table(name)
