"""Salted repartition: a zipf-hot domain must spread evenly, and
row-local results must be partition-layout invariant."""

from pyspark.sql import functions as F

from dq.skew import salted_repartition


def test_salted_repartition_balances_hot_domain(spark):
    # 20% of rows on one domain (the FIXTURES.md zipf shape); keying the
    # shuffle by domain would put them all in ONE task
    n = 10_000
    df = spark.range(n).select(
        F.concat(F.lit("https://"),
                 F.when(F.col("id") % 5 == 0, F.lit("hot.example"))
                  .otherwise(F.concat(F.lit("d"), (F.col("id") % 997)
                                      .cast("string"), F.lit(".example"))),
                 F.lit("/p/"), F.col("id").cast("string")).alias("url"))
    parts = 16
    out = salted_repartition(df, parts, "url")
    sizes = [r["c"] for r in out.groupBy(F.spark_partition_id().alias("p"))
             .agg(F.count(F.lit(1)).alias("c")).collect()]
    assert len(sizes) == parts
    # even spread: no partition more than 30% off the mean (hash noise
    # only) — domain-keyed partitioning would put >=20% in one task
    mean = n / parts
    assert max(sizes) < 1.3 * mean and min(sizes) > 0.7 * mean


def test_salted_repartition_result_invariant(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 7).alias("v"))
    agg = lambda d: sorted(map(tuple, d.groupBy("v")
                               .agg(F.count(F.lit(1)).alias("c")).collect()))
    assert agg(salted_repartition(df, 4, "url")) == \
           agg(salted_repartition(df, 32, "url", salt=9)) == agg(df)
