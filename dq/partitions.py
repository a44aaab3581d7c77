"""Catalog-metadata partition discovery (SURVEY.md §2.1 S2).

The reference discovers partitions by running ``SHOW PARTITIONS
db.table`` over Thrift and parsing the ``k=v/k=v`` path strings into
dicts (``core/data_fetcher.py:23-58`` in /root/reference, parse at
:46-52), then builds conjunctive-equality WHERE clauses from them
(``core/data_fetcher.py:85-88``). Spark's ``SHOW PARTITIONS`` emits the
same ``k=v/k=v`` strings for catalog tables, so this is a direct
re-expression — with two Spark-side upgrades:

- values come back URL-decoded (Spark percent-escapes special chars in
  partition directory names; the reference's raw split would return the
  escaped form);
- the equality filter is returned as a Column so Catalyst turns it into
  partition pruning on the scan, instead of string-interpolating SQL.

For path-mode (non-catalog) data the pipeline keeps its data-derived
partitioning (``to_date(warc_ts)`` — dq/pipeline.py) and checkpoint
listing (dq/checkpoint.py); this module is the catalog-metadata path
that completes the mapping for managed tables.
"""

from __future__ import annotations

from urllib.parse import unquote

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def parse_partition_spec(spec: str) -> dict[str, str]:
    """``'k1=v1/k2=v2'`` → ``{'k1': 'v1', 'k2': 'v2'}`` — the
    reference's parse loop at ``core/data_fetcher.py:46-52``: segments
    without ``=`` are skipped, exactly as the reference does. Two
    deliberate Spark-side deviations (not in the reference): values are
    URL-decoded (module docstring) and keys are lowercased — Spark
    resolves ``F.col(key)`` case-insensitively by default
    (``spark.sql.caseSensitive=false``), so a normalized key always
    matches the scan's partition column regardless of how the metastore
    cased it."""
    out: dict[str, str] = {}
    for part in spec.split("/"):
        if "=" not in part:
            continue
        key, _, value = part.partition("=")
        out[key.lower()] = unquote(value)
    return out


def show_partitions(spark: SparkSession, table: str) -> list[dict[str, str]]:
    """All partitions of a catalog table as ``[{col: value}]`` —
    ``get_table_partitions`` (``core/data_fetcher.py:23-58``) on
    catalog metadata: no data scan, one metastore call."""
    rows = spark.sql(f"SHOW PARTITIONS {table}").collect()
    return [parse_partition_spec(r[0]) for r in rows]


def table_exists(spark: SparkSession, table: str) -> bool:
    """Existence probe (S4, ``core/data_fetcher.py:246-274``) via the
    catalog — no DESCRIBE round-trip."""
    return spark.catalog.tableExists(table)


def partition_filter(partition: dict[str, str]) -> Column:
    """Conjunctive equality predicate for one partition dict — the
    reference's ``WHERE k='v' AND ...`` builder
    (``core/data_fetcher.py:85-88``) as a Column, so Catalyst prunes the
    scan to the matching partition directories."""
    cond: Column | None = None
    for key, value in partition.items():
        c = F.col(key) == F.lit(value)
        cond = c if cond is None else cond & c
    if cond is None:
        raise ValueError("empty partition spec")
    return cond


def read_partition(spark: SparkSession, table: str,
                   partition: dict[str, str], limit: int | None = None):
    """One partition of a catalog table, pruned at the scan
    (``fetch_data``'s partition path, ``core/data_fetcher.py:60-121``,
    without the driver materialization).

    ``limit`` is the reference's sampling ``LIMIT n`` suffix
    (``core/data_fetcher.py:91``) as ``df.limit`` — Spark plans it as
    CollectLimit/LocalLimit, stopping the scan early instead of
    materializing the partition."""
    df = spark.read.table(table).filter(partition_filter(partition))
    return df.limit(limit) if limit is not None else df
