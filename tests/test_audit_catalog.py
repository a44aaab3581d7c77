"""AuditStore catalog mode: managed tables through the DataFrameWriterV2
path (`df.writeTo(db.t).append()` — the Iceberg code path, exercised
here against the built-in session catalog; SURVEY.md §7.0)."""

import datetime as dt

import pytest

from dq.audit import AuditStore
from dq.checks_job import TableSpec, run_checks_job

RUN_DATE = dt.date(2025, 10, 3)


@pytest.fixture()
def store(spark):
    db = "dq_audit_test"
    yield AuditStore(catalog_db=db)
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_catalog_append_read_roundtrip(spark, store):
    assert not store.exists("row_count_history")
    df = spark.createDataFrame([("e1", "DEV", "db", "t", 5)],
                               "execution_id string, environment string, "
                               "database_name string, table_name string, "
                               "row_count long")
    store.append("row_count_history", df)
    assert store.exists("row_count_history")
    assert store.read(spark, "row_count_history").count() == 1
    store.append("row_count_history", df.withColumn(
        "execution_id", df.execution_id.substr(1, 1)))
    assert store.read(spark, "row_count_history").count() == 2


def test_catalog_partitioned_table(spark, store):
    df = spark.createDataFrame(
        [(dt.date(2025, 1, 1), "u1", 1), (dt.date(2025, 1, 2), "u2", 2)],
        "partition_value date, url string, n long")
    store.append("lineage", df)
    store.append("lineage", df)
    got = store.read(spark, "lineage")
    assert got.count() == 4
    assert got.filter("partition_value = DATE'2025-01-01'").count() == 2


def test_show_partitions_discovery_and_pruned_read(spark, store):
    """S2 catalog-metadata partition discovery: SHOW PARTITIONS parse
    (k=v/k=v → dict, the reference's core/data_fetcher.py:23-58) plus
    the pruning-predicate read path (:85-88)."""
    from dq import partitions as P

    df = spark.createDataFrame(
        [(dt.date(2025, 1, 1), "u1", 1), (dt.date(2025, 1, 1), "u2", 2),
         (dt.date(2025, 1, 2), "u3", 3)],
        "partition_value date, url string, n long")
    store.append("lineage", df)
    table = store.path("lineage")
    assert P.table_exists(spark, table)
    assert not P.table_exists(spark, store.path("nope"))

    parts = sorted(P.show_partitions(spark, table),
                   key=lambda d: d["partition_value"])
    assert parts == [{"partition_value": "2025-01-01"},
                     {"partition_value": "2025-01-02"}]

    one = P.read_partition(spark, table, parts[0])
    assert {r["url"] for r in one.collect()} == {"u1", "u2"}
    # the predicate reaches the scan as a partition filter, not a
    # post-scan row filter
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "2025-01-01" in plan, plan

    # P3: the reference's sampling `LIMIT n` (core/data_fetcher.py:91)
    # plans as an early-stopping limit, still partition-pruned
    lim = P.read_partition(spark, table, parts[0], limit=1)
    assert lim.count() == 1
    lplan = lim._jdf.queryExecution().executedPlan().toString()
    assert "Limit" in lplan and "PartitionFilters: [" in lplan, lplan


def test_parse_partition_spec_url_decoding():
    from dq.partitions import parse_partition_spec
    assert parse_partition_spec("Day=2025-01-01/kind=a%20b") == {
        "day": "2025-01-01", "kind": "a b"}
    # '='-less segments are skipped, matching the reference parse loop
    # (core/data_fetcher.py:48-50) — not turned into {segment: ''}
    assert parse_partition_spec("garbage/day=2025-01-01/") == {
        "day": "2025-01-01"}
    assert parse_partition_spec("no-equals-at-all") == {}


def test_checks_job_on_catalog_store(spark, store, tmp_path):
    path = str(tmp_path / "t1")
    ts = dt.datetime.combine(RUN_DATE - dt.timedelta(days=1), dt.time(12))
    spark.createDataFrame(
        [(i, ts) for i in range(30)],
        "id long, date_insertion timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    specs = [TableSpec("DEV", "db1", "t1", path,
                       {"id": "bigint", "date_insertion": "timestamp"})]
    out1 = run_checks_job(spark, specs, "e1", RUN_DATE, store)
    assert len(out1["results"]) == 6
    for t in ("check_results", "summary_metrics_table", "freshness",
              "row_count_history", "checkpoint_tables"):
        assert store.read(spark, t).count() > 0, t
    # feedback loop works through catalog tables too
    out2 = run_checks_job(spark, specs, "e2",
                          RUN_DATE + dt.timedelta(days=1), store)
    out3 = run_checks_job(spark, specs, "e3",
                          RUN_DATE + dt.timedelta(days=2), store)
    assert out3["thresholds"][("DEV", "db1", "t1")].method == "increment"


def test_pipeline_on_catalog_store(spark, store):
    """run_pipeline (N5-N7) end-to-end against a CATALOG-mode
    AuditStore: dynamic partition overwrite on managed tables plus
    checkpoint resume — the Iceberg-shaped deployment path
    (``df.writeTo(db.t)``), closing the S2/S5 loop the path-mode
    pipeline tests leave open."""
    from dq.pipeline import run_pipeline
    from dq.synth import webpages

    pages = webpages(spark, 300, num_partitions=4)
    run_ts = dt.datetime(2024, 1, 20, 12, 0)
    out1 = run_pipeline(spark, pages, "e1", run_ts, store=store)
    n_docs = store.read(spark, "docs").count()
    assert n_docs == out1["docs"].count() > 0
    assert store.read(spark, "lineage").count() > 0
    assert store.read(spark, "rule_metrics").count() > 0
    done = store.read(spark, "checkpoint")
    assert done.count() > 0
    out1["scored"].unpersist()
    # rerun with a new execution id: every partition is checkpointed,
    # so the resume anti-join drops all input and nothing is rewritten
    out2 = run_pipeline(spark, pages, "e2", run_ts, store=store)
    assert store.read(spark, "docs").count() == n_docs
    assert out2["docs"].count() == 0
    out2["scored"].unpersist()
