"""Audit store — the Iceberg-audit-table analog of the reference's Postgres
metrics sink (``storage/postgres_storage.py:74-180``: dimension_scores,
summary_metrics_table, summary_metrics_database, freshness,
row_count_history), plus the north-rule additions ``lineage``,
``rule_metrics`` and ``checkpoint`` (FIXTURES.md §4).

The write layer hides the catalog behind one module (SURVEY.md §7.0): when
an Iceberg catalog is configured the same calls become
``df.writeTo(table).append()``; in the sandbox it is a partitioned parquet
directory per table with identical schemas and append semantics.
Distributed writes — the reference's batched psycopg2 INSERTs
(batch_size=1000, ``config/settings.py:97``) become executor-parallel file
commits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "check_results", "dimension_scores", "summary_metrics_table",
    "summary_metrics_database", "freshness", "row_count_history",
    "lineage", "rule_metrics", "checkpoint", "checkpoint_tables", "docs",
)


class AuditStore:
    def __init__(self, base_path: str, partition_by: dict[str, list[str]] | None = None):
        self.base = base_path.rstrip("/")
        self.partition_by = partition_by or {
            "lineage": ["partition_value"],
            "rule_metrics": ["partition_value"],
            "docs": ["partition_value"],
        }

    def path(self, table: str) -> str:
        return f"{self.base}/{table}"

    def append(self, table: str, df: DataFrame) -> None:
        writer = df.write.mode("append")
        parts = self.partition_by.get(table)
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(self.path(table))

    def exists(self, table: str) -> bool:
        p = self.path(table)
        if not os.path.isdir(p):
            return False
        for root, _dirs, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        if not self.exists(table):
            return None
        return spark.read.parquet(self.path(table))
