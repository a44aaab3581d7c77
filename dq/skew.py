"""Skew handling for zipf-distributed web domains.

The synthetic corpus (FIXTURES.md §1) puts ~20% of rows on one domain, the
shape real Common-Crawl shards have. Two complementary mechanisms:

1. AQE skew-join splitting — enabled session-wide in ``dq.session``
   (``spark.sql.adaptive.skewJoin.enabled``): oversized shuffle partitions
   are split at runtime for joins.
2. Salted repartition — for explicit stage-boundary balancing: hash the
   row's unique key (url), NOT the domain, so a hot domain spreads evenly
   over all buckets. Content is a pure function of the row, so this is
   always safe for row-local stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, num_partitions: int,
                       key_col: str = "url", salt: int = 0) -> DataFrame:
    """Evenly spread rows regardless of domain skew."""
    return (df.withColumn("_salt", F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)),
                                          num_partitions))
              .repartition(num_partitions, "_salt")
              .drop("_salt"))
