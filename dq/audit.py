"""Audit store — the Iceberg-audit-table analog of the reference's Postgres
metrics sink (``storage/postgres_storage.py:74-180``: dimension_scores,
summary_metrics_table, summary_metrics_database, freshness,
row_count_history), plus the north-rule additions ``lineage``,
``rule_metrics`` and ``checkpoint`` (FIXTURES.md §4).

The write layer hides the storage behind one module (SURVEY.md §7.0).
Two modes, same call sites:

- **path mode** (default): a partitioned parquet directory per table —
  the sandbox stand-in, identical schemas and append semantics.
- **catalog mode** (``catalog_db=...``): managed catalog tables written
  through the DataFrameWriterV2 API (``df.writeTo(db.t).append()``).
  With an Iceberg catalog configured on the cluster
  (``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog``)
  these are Iceberg tables with snapshot isolation; the sandbox
  exercises the exact same code path against the built-in session
  catalog (parquet provider), which is what keeps the mode testable
  here without Iceberg jars.

Distributed writes — the reference's batched psycopg2 INSERTs
(batch_size=1000, ``config/settings.py:97``) become executor-parallel
file commits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "check_results", "dimension_scores", "summary_metrics_table",
    "summary_metrics_database", "freshness", "row_count_history",
    "lineage", "rule_metrics", "checkpoint", "checkpoint_tables", "docs",
)

DEFAULT_PARTITIONING = {
    "lineage": ["partition_value"],
    "rule_metrics": ["partition_value"],
    "docs": ["partition_value"],
}


class AuditStore:
    def __init__(self, base_path: str | None = None,
                 partition_by: dict[str, list[str]] | None = None,
                 catalog_db: str | None = None):
        if base_path is None and catalog_db is None:
            raise ValueError("need base_path (path mode) or catalog_db "
                             "(catalog mode)")
        self.base = base_path.rstrip("/") if base_path else None
        self.catalog_db = catalog_db
        self.partition_by = partition_by or dict(DEFAULT_PARTITIONING)

    # ------------------------------------------------------------ common

    def path(self, table: str) -> str:
        if self.catalog_db:
            return f"{self.catalog_db}.{table}"
        return f"{self.base}/{table}"

    def append(self, table: str, df: DataFrame) -> None:
        if self.catalog_db:
            self._append_catalog(table, df)
            return
        writer = df.write.mode("append")
        parts = self.partition_by.get(table)
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(self.path(table))

    def exists(self, table: str) -> bool:
        if self.catalog_db:
            spark = SparkSession.getActiveSession()
            return spark.catalog.tableExists(self.path(table))
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
        if self.catalog_db:
            return spark.read.table(self.path(table))
        return spark.read.parquet(self.path(table))

    # ----------------------------------------------------------- catalog

    def _append_catalog(self, table: str, df: DataFrame) -> None:
        from pyspark.errors.exceptions.captured import AnalysisException
        from pyspark.sql import functions as F
        spark = df.sparkSession
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.catalog_db}")
        full = self.path(table)
        if not spark.catalog.tableExists(full):
            writer = df.writeTo(full)
            parts = self.partition_by.get(table)
            if parts:
                writer = writer.partitionedBy(*[F.col(p) for p in parts])
            writer.create()
            return
        try:
            # V2 catalogs (Iceberg): transactional append
            df.writeTo(full).append()
        except AnalysisException:
            # built-in session catalog registers V1 tables, which the
            # writer-V2 append refuses; the V1 append is equivalent there
            writer = df.write.mode("append")
            parts = self.partition_by.get(table)
            if parts:
                writer = writer.partitionBy(*parts)
            writer.saveAsTable(full)
