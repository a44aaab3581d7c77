"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The catalog itself lives in ``dq.queries`` (importable / unit-testable);
this module is the thin adapter the driver imports.

Session-conf note: every catalog query pins ``spark.sql.ansi.enabled=
false`` and ``spark.sql.session.timeZone=UTC`` on the session it is
given and leaves them set (see ``dq.queries._t``) — callers that need
ANSI afterwards should save/restore those two confs.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dq.queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    ivf_oracle_sql,
    q_quality_filter_pipeline,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end web-text quality-filter pipeline
    (heuristic rules + langid + perplexity + exact dedup) over the
    sf0.001 documents table — per-source keep/drop + rule tallies."""
    return q_quality_filter_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    oracles = dict(ORACLES)
    # The IVF oracle embeds DATA-dependent centroid literals (trained
    # from the gate fixture via the pyarrow twin of the Spark trainer),
    # so it is generated here rather than committed as a static string.
    # The driver compares at sf=0.01; if the fixture is absent the query
    # degrades to the rows-only check instead of crashing the contract.
    gate = "/root/testdata/sf0.01"
    if os.path.exists(f"{gate}/embeddings.parquet"):
        oracles["embedding_ivf_topk"] = ivf_oracle_sql(gate)
    return oracles
