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
    """Evenly spread rows regardless of domain skew.

    The salt column spans the full 64-bit hash domain — deliberately NOT
    ``pmod(hash, num_partitions)``: with only ``num_partitions`` distinct
    salt values, the partitioner's second hash collides some of them into
    the same task (birthday at n of n), leaving empty partitions and
    doubled ones (measured: 10 of 16 non-empty, max 2x mean). With the
    full domain every task averages over ~rows/num_partitions
    independent values, so sizes concentrate tightly around the mean.
    """
    return (df.withColumn("_salt", F.xxhash64(F.col(key_col), F.lit(salt)))
              .repartition(num_partitions, "_salt")
              .drop("_salt"))
