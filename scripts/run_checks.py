"""Production entrypoint: the table-check lifecycle via spark-submit.

The Spark analog of the reference's ``python main.py`` daily run
(``main.py:503-572`` → ``run_all_checks`` → ``store_results_in_postgres``),
driven by a JSON table config instead of ``config/settings.py``:

    spark-submit --py-files /tmp/dq.zip scripts/run_checks.py \
        --config  tables.json                  \
        --audit   s3://bucket/dq_audit/        \
        --execution-id 2025-10-03-daily        \
        --run-date 2025-10-03                  \
        --manifest-dir results/

tables.json: [{"environment": "DEV", "database": "db", "table": "t",
               "path": "s3://.../t/", "expected_schema": {"col": "type"}}]

Re-running the same execution id after a failure skips tables already
checkpointed (idempotent appends); the run's row counts feed the NEXT
run's dynamic thresholds through the audit store's row_count_history —
the reference's only cross-run dataflow, closed here without Postgres.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="table quality-check run")
    p.add_argument("--config", required=True,
                   help="JSON list of table specs")
    p.add_argument("--audit", required=True, help="audit store base path")
    p.add_argument("--execution-id", required=True)
    p.add_argument("--run-date", required=True,
                   help="YYYY-MM-DD; injected clock for freshness "
                        "semantics (never the wall clock)")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--manifest-dir", default=None,
                   help="write a JSON run manifest here")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv or sys.argv[1:])
    from dq.audit import AuditStore
    from dq.checks_job import TableSpec, run_checks_job
    from dq.session import get_spark

    with open(args.config, encoding="utf-8") as f:
        specs = [TableSpec(s["environment"], s["database"], s["table"],
                           s["path"], s["expected_schema"])
                 for s in json.load(f)]

    spark = get_spark("dq-table-checks")
    try:  # no-op under --py-files; covers bare local runs from any cwd
        from dq.queries import ensure_dq_shipped
        ensure_dq_shipped(spark)
    except Exception:  # noqa: BLE001
        pass
    out = run_checks_job(
        spark, specs, args.execution_id,
        dt.date.fromisoformat(args.run_date),
        AuditStore(args.audit), resume=not args.no_resume,
        manifest_dir=args.manifest_dir)
    n = len(out["results"])
    passed = sum(1 for r in out["results"] if r["passed"])
    print(f"execution {args.execution_id}: {passed}/{n} checks passed; "
          f"audit at {args.audit}"
          + (f"; manifest {out['manifest_path']}"
             if out["manifest_path"] else ""))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
