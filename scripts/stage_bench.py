"""Stage-isolated scaling: each pipeline stage alone at N vs 4N cores.

Same measurement protocol as scripts/scaling_bench.py (taskset pinning
covering pandas workers, fresh JVM per level, warm-up, interleaved A/B
reps, best-of) but per STAGE, so the one badly-scaling stage cannot
hide inside the end-to-end number. Stages:

- heuristics: token-stats Arrow UDF + rule columns (dq.heuristics)
- models:     langid + perplexity Arrow UDFs (dq.models)
- scrub:      compiled-regex PII scrub Arrow UDF (dq.scrub)
- dedup:      signature groupBy(min) + keeper join (dq.pipeline shape)

Each stage reads the same materialized webpages parquet and drains
through an aggregate sink (sum of a cheap function of the stage output)
so the measurement is the stage, not a write path.

Usage: python scripts/stage_bench.py [n_docs] [N] [reps] [stage,stage]
(4th arg restricts to a comma-separated stage subset — lets a short
cool window on the shared host re-measure one stage)
Prints one JSON line; paste the table into BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_LOW = int(sys.argv[2]) if len(sys.argv) > 2 else 8
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
N_HIGH = N_LOW * 4
PAGES = f"/tmp/dq_scaling_pages_{N_DOCS}"

CHILD = r"""
import sys, time, json
sys.path.insert(0, ".")
from dq.session import get_spark
from pyspark.sql import functions as F

cores, pages_path = int(sys.argv[1]), sys.argv[2]
spark = get_spark("stage", master=f"local[{cores}]",
                  shuffle_partitions=max(cores, 8))
pages = spark.read.parquet(pages_path).select("url", "text")


def stage_heuristics(df):
    from dq.heuristics import with_heuristics
    out = with_heuristics(df)
    return out.agg(F.sum("n_words"),
                   F.sum(F.col("rule_stopword_frac").cast("long")))


def stage_models(df):
    from dq.models import make_langid_udf, make_perplexity_udf
    out = df.withColumns({"lang_pred": make_langid_udf(spark)(F.col("text")),
                          "ppl": make_perplexity_udf(spark)(F.col("text"))})
    return out.agg(F.count_distinct("lang_pred"), F.sum("ppl"))


def stage_scrub(df):
    from dq.scrub import scrub_udf
    return df.select(scrub_udf(F.col("text")).alias("s")) \
             .agg(F.sum(F.length("s")))


def stage_dedup(df):
    sig = F.when(F.col("text").isNotNull() & (F.trim("text") != ""),
                 F.xxhash64("text")) \
           .otherwise(F.xxhash64(F.col("url"), F.lit("nulltext")))
    keyed = df.withColumn("text_sig", sig)
    keepers = (keyed.select("url", "text_sig").groupBy("text_sig")
               .agg(F.min("url").alias("_keep")))
    out = keyed.join(keepers, "text_sig") \
               .withColumn("not_dup", F.col("url") == F.col("_keep"))
    return out.agg(F.sum(F.col("not_dup").cast("long")))


STAGES = {"heuristics": stage_heuristics, "models": stage_models,
          "scrub": stage_scrub, "dedup": stage_dedup}

for fn in STAGES.values():          # warm-up: JIT/codegen/worker spin-up
    fn(pages.limit(100_000)).collect()
print("READY", flush=True)
for line in sys.stdin:
    name = line.strip()
    if name == "quit":
        break
    t0 = time.time()
    STAGES[name](pages).collect()
    print("RESULT " + json.dumps({"stage": name,
                                  "sec": time.time() - t0}), flush=True)
spark.stop()
"""


class Level:
    def __init__(self, cores: int):
        self.cores = cores
        self.proc = subprocess.Popen(
            ["taskset", "-c", f"0-{cores - 1}", "python", "-c", CHILD,
             str(cores), PAGES],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            bufsize=1)
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise SystemExit(f"child {cores} died during warmup")
            if line.startswith("READY"):
                break

    def run(self, stage: str) -> float:
        self.proc.stdin.write(stage + "\n")
        self.proc.stdin.flush()
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise SystemExit(f"child {self.cores} died")
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])["sec"]

    def stop(self):
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:  # noqa: BLE001
            self.proc.kill()


def _host_probe() -> float:
    """bench.py's single-core clock probe (ONE implementation — the two
    numbers are compared side-by-side in BENCH.md, so they must come
    from the same calibration): the host throttles ~2-6x under load,
    and a stage row measured in a throttled window is only
    interpretable with the probe beside it."""
    from bench import host_probe  # repo root is on sys.path (line 29)
    return round(host_probe(), 2)


def main() -> None:
    probe_before = _host_probe()
    if not os.path.exists(os.path.join(PAGES, "_SUCCESS")):
        sub = (
            "import sys; sys.path.insert(0, '.')\n"
            "from dq.session import get_spark\n"
            "from dq.synth import webpages\n"
            "spark = get_spark('gen', master='local[32]')\n"
            f"webpages(spark, {N_DOCS}, num_partitions=64)"
            f".write.mode('overwrite').parquet({PAGES!r})\n"
            "spark.stop()\n")
        subprocess.run(["python", "-c", sub], check=True, timeout=1800)
    stages = ["heuristics", "models", "scrub", "dedup"]
    if len(sys.argv) > 4:
        want = sys.argv[4].split(",")
        unknown = set(want) - set(stages)
        if unknown:
            raise SystemExit(f"unknown stages: {sorted(unknown)}")
        stages = [s for s in stages if s in want]
    low, high = Level(N_LOW), Level(N_HIGH)
    times: dict[str, dict[int, list[float]]] = \
        {s: {N_LOW: [], N_HIGH: []} for s in stages}
    for _rep in range(REPS):                 # interleave per rep pair
        for s in stages:
            times[s][N_LOW].append(low.run(s))
            times[s][N_HIGH].append(high.run(s))
    low.stop()
    high.stop()
    ratio = N_HIGH / N_LOW
    out = {}
    for s in stages:
        tl, th = min(times[s][N_LOW]), min(times[s][N_HIGH])
        pair_effs = [round((a / b) / ratio, 3)
                     for a, b in zip(times[s][N_LOW], times[s][N_HIGH])]
        out[s] = {"low_sec": round(tl, 2), "high_sec": round(th, 2),
                  "efficiency": round((tl / th) / ratio, 3),
                  "pair_efficiencies": pair_effs,
                  "best_pair": max(pair_effs)}
        sys.stderr.write(f"{s}: {times[s]}\n")
    print(json.dumps({"n_docs": N_DOCS, "low_cores": N_LOW,
                      "high_cores": N_HIGH, "stages": out,
                      "probe_before_sec": probe_before,
                      "probe_after_sec": _host_probe()}))


if __name__ == "__main__":
    main()
