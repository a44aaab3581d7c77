"""Regenerate tests/goldens/quality_filter_pipeline.json.

Run ONLY after an intentional model/rule change: the goldens pin the
flagship's per-(source, rule) pass tallies and quantized model-score
sums at sf0.001 and sf0.01, giving the one no-SQL-oracle driver query
a hard regression gate (tests/test_pipeline.py::test_flagship_goldens).

    python scripts/make_goldens.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from dq import queries  # noqa: E402
from dq.session import get_spark  # noqa: E402

OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "tests" / "goldens" / "quality_filter_pipeline.json")


def score_pins(scored):
    """Order-independent long sums of per-doc model outputs — see
    test_flagship_goldens for why these are partition-invariant."""
    return scored.groupBy("source").agg(
        F.sum(F.pmod(F.xxhash64("lang_pred"),
                     F.lit(1000003))).alias("lang_hash_sum"),
        F.sum(F.floor(F.col("ppl") * 100).cast("long")).alias("ppl_q_sum"),
        F.sum(F.col("lang_pred").eqNullSafe(F.lit("en"))
              .cast("long")).alias("n_en"))


def main():
    spark = get_spark("make-goldens", master="local[8]")
    out = {}
    for sf in ("sf0.001", "sf0.01"):
        d = f"/root/testdata/{sf}"
        tallies = sorted(
            (r.asDict() for r in
             queries.q_quality_filter_pipeline(spark, d).collect()),
            key=lambda r: r["source"])
        pins = sorted(
            (r.asDict() for r in
             score_pins(queries.flagship_scored(spark, d)).collect()),
            key=lambda r: r["source"])
        out[sf] = {"tallies": tallies, "score_pins": pins}
    OUT.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    spark.stop()
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
