"""Scaling-efficiency evidence: the same pipeline job at N and 4N cores.

North rule (BASELINE.json): "throughput scaling efficiency >= 0.8 between
N- and 4N-executor clusters", evidenced in-sandbox as two parallelism
levels on one machine (local[8] vs local[32] — 32 physical cores, no SMT)
over the SAME materialized input. Each level runs in its own subprocess
(clean JVM, no cross-contamination), reps with best-of to shed page-cache
warmup.

Writes the result table to BENCH.md and prints one JSON line.

Usage: python scripts/scaling_bench.py [n_docs] [N] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N_LOW = int(sys.argv[2]) if len(sys.argv) > 2 else 8
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
N_HIGH = N_LOW * 4
PAGES = "/tmp/dq_scaling_pages"

CHILD = r"""
import sys, time, json, datetime as dt
sys.path.insert(0, ".")
from dq.session import get_spark
from dq.pipeline import run_pipeline

cores, pages_path, reps = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = get_spark("scale", master=f"local[{cores}]",
                  shuffle_partitions=max(cores, 8))
best = float("inf")
for rep in range(reps):
    pages = spark.read.parquet(pages_path)
    t0 = time.time()
    out = run_pipeline(spark, pages, f"scale-{cores}-{rep}",
                       dt.datetime(2025, 10, 3), store=None, resume=False)
    for frame in ("docs", "metrics", "lineage"):
        out[frame].write.format("noop").mode("overwrite").save()
    best = min(best, time.time() - t0)
    out["scored"].unpersist()
spark.stop()
print("RESULT " + json.dumps({"cores": cores, "sec": best}))
"""


def materialize() -> None:
    sub = r"""
import sys; sys.path.insert(0, ".")
from dq.session import get_spark
from dq.synth import webpages
spark = get_spark("gen", master="local[32]")
webpages(spark, %d, num_partitions=64).write.mode("overwrite").parquet(%r)
spark.stop()
print("RESULT done")
""" % (N_DOCS, PAGES)
    run_child(["python", "-c", sub])


def run_child(cmd: list[str]) -> dict | None:
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            payload = line[len("RESULT "):]
            return json.loads(payload) if payload.startswith("{") else None
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    raise SystemExit(f"child failed: {cmd[:2]}")


def main() -> None:
    if not os.path.exists(os.path.join(PAGES, "_SUCCESS")):
        materialize()
    results = {}
    for cores in (N_LOW, N_HIGH):
        r = run_child(["python", "-c", CHILD, str(cores), PAGES, str(REPS)])
        results[cores] = r["sec"]

    thr = {c: N_DOCS / s for c, s in results.items()}
    eff = (thr[N_HIGH] / thr[N_LOW]) / (N_HIGH / N_LOW)
    summary = {
        "n_docs": N_DOCS,
        "low_cores": N_LOW, "low_sec": round(results[N_LOW], 2),
        "low_docs_per_sec": round(thr[N_LOW], 1),
        "high_cores": N_HIGH, "high_sec": round(results[N_HIGH], 2),
        "high_docs_per_sec": round(thr[N_HIGH], 1),
        "speedup": round(thr[N_HIGH] / thr[N_LOW], 2),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))

    block = (
        "## Scaling evidence (north rule: efficiency >= 0.8 from N to 4N)\n\n"
        "Same end-to-end pipeline job (heuristics + langid + perplexity +\n"
        "dedup + scrub + lineage/metrics) over the same materialized\n"
        f"{N_DOCS:,}-doc webpages input, each level a fresh JVM, best of\n"
        f"{REPS} reps:\n\n"
        "| cores | wall sec | docs/sec |\n|---|---|---|\n"
        f"| local[{N_LOW}] | {summary['low_sec']} | {summary['low_docs_per_sec']} |\n"
        f"| local[{N_HIGH}] | {summary['high_sec']} | {summary['high_docs_per_sec']} |\n\n"
        f"Speedup {summary['speedup']}x over a {N_HIGH // N_LOW}x core increase → "
        f"**scaling efficiency {summary['scaling_efficiency']}**.\n"
    )
    marker = "## Scaling evidence"
    path = "BENCH.md"
    existing = ""
    if os.path.exists(path):
        with open(path) as f:
            existing = f.read()
        if marker in existing:
            existing = existing[:existing.index(marker)]
    with open(path, "w") as f:
        f.write(existing + block)


if __name__ == "__main__":
    main()
