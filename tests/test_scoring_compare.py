"""Scoring bands, rollups, and the DEV≤PROD comparison."""

from dq.compare import compare_row_counts
from dq.scoring import (
    database_summary,
    dimension_scores,
    results_to_df,
    table_summary,
)


def _mk_results(spark, spec):
    """spec: list of (env, db, table, dimension, passed)."""
    rows = [
        {"environment": e, "database": d, "table": t, "partition": None,
         "test_name": "t%d" % i, "dimension": dim, "passed": p,
         "details": ""}
        for i, (e, d, t, dim, p) in enumerate(spec)
    ]
    return results_to_df(spark, rows)


def test_table_summary_bands_and_overrides(spark):
    # generic table at 60% → HIGH band (50 ≤ 60 < 70)
    # tva_due at 60% → CRITICAL (override: <80)
    spec = (
        [("DEV", "db", "generic", "completeness", True)] * 3
        + [("DEV", "db", "generic", "completeness", False)] * 2
        + [("DEV", "db", "tva_due", "completeness", True)] * 3
        + [("DEV", "db", "tva_due", "completeness", False)] * 2
    )
    rows = {r["table"]: r for r in
            table_summary(_mk_results(spark, spec)).collect()}
    assert rows["generic"]["overall_score"] == 60.0
    assert rows["generic"]["status"] == "HIGH"
    assert rows["tva_due"]["status"] == "CRITICAL"

    # personnes at 96% → LOW under override (92-97), PASS under defaults
    spec2 = ([("DEV", "db", "personnes", "x", True)] * 24
             + [("DEV", "db", "personnes", "x", False)])
    r2 = table_summary(_mk_results(spark, spec2)).collect()[0]
    assert r2["overall_score"] == 96.0 and r2["status"] == "LOW"


def test_database_summary_rollup(spark):
    # t1 100% → PASS (successful); t2 0% → CRITICAL (failed)
    spec = ([("DEV", "db", "t1", "x", True)] * 2
            + [("DEV", "db", "t2", "x", False)] * 2)
    r = database_summary(_mk_results(spark, spec)).collect()[0]
    assert r["total_tables"] == 2
    assert r["successful_tables"] == 1 and r["failed_tables"] == 1
    assert r["overall_score"] == 50.0 and r["status"] == "HIGH"


def test_dimension_scores(spark):
    spec = [("DEV", "db", "t", "completeness", True),
            ("DEV", "db", "t", "completeness", False),
            ("DEV", "db", "t", "uniqueness", True)]
    rows = {r["dimension"]: r for r in
            dimension_scores(_mk_results(spark, spec)).collect()}
    assert rows["completeness"]["score"] == 50.0
    assert rows["completeness"]["failed_tests"] == 1
    assert rows["uniqueness"]["score"] == 100.0


def test_compare_row_counts(spark):
    counts = spark.createDataFrame(
        [("DEV", "db", "ok", 10), ("PROD", "db", "ok", 20),
         ("DEV", "db", "bad", 30), ("PROD", "db", "bad", 20),
         ("DEV", "db", "zero", 0), ("PROD", "db", "zero", 5),
         ("DEV", "db", "devonly", 7)],
        "environment string, database string, table string, row_count long")
    rows = {r["table"]: r for r in compare_row_counts(counts).collect()}
    assert set(rows) == {"ok", "bad"}          # zero skipped, unpaired skipped
    assert rows["ok"]["passed"] and rows["ok"]["difference"] == -10
    assert not rows["bad"]["passed"] and rows["bad"]["difference"] == 10
