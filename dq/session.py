"""SparkSession factory with scale-oriented defaults.

Replaces the reference's PyHive/Thrift connection layer
(``core/connection.py:44-68`` in /root/reference) — there is no connection
pool to manage; the session IS the engine. Defaults are chosen for the
sandbox (single-JVM local mode) but every knob is the one you would set on
a real multi-executor cluster:

- AQE on (runtime coalesce, skew-join splitting) — the skew story for
  zipf-skewed web domains.
- Arrow on — all pandas UDFs ride vectorized Arrow batches.
- Session timezone pinned UTC — the reference's freshness semantics are
  wall-clock-date sensitive (``core/quality_checks.py:734-735``); we pin TZ
  and inject run_date instead.
- ANSI off — hash/modulo arithmetic in dedup signatures must wrap, not
  throw (Spark 4 defaults ANSI on).
- shuffle.partitions sized to cores locally; on a real cluster set it to
  2-3x total executor cores or rely on AQE coalescing.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dq",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 in the sandbox)
    — but ONLY when the process was not launched by spark-submit. Under
    spark-submit the py4j gateway JVM already exists (marked by
    ``PYSPARK_GATEWAY_PORT`` in the environment) and carries the
    ``--master`` the operator chose (YARN/K8s/standalone); forcing
    ``.master()`` here would silently override it back to local mode, so
    we leave it untouched unless the caller passed one explicitly.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not submitted:
        master = f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = SparkSession.builder
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("DQ_DRIVER_MEM", "48g"))
        # throughput GC: the allocation-heavy string stages (tokenize/
        # normalize) measured ~1.8x faster at 32 threads under
        # ParallelGC than default G1 (and G1 showed multi-10s full-GC
        # stalls under sustained allocation); for a batch engine,
        # throughput collector > pause-target collector
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # managed-table warehouse for AuditStore catalog mode (on a real
        # cluster this is the Iceberg catalog's warehouse location)
        .config("spark.sql.warehouse.dir",
                os.environ.get("DQ_WAREHOUSE", "/tmp/dq_warehouse"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


# Confs the query catalog pins on the session it is given (see
# dq.queries._t — the values are part of the catalog's semantics and
# are read lazily at ACTION time, so they cannot be scoped per-query).
_CATALOG_CONFS = ("spark.sql.ansi.enabled", "spark.sql.session.timeZone")


@contextmanager
def catalog_session(spark: SparkSession):
    """Save/restore wrapper for hosts embedding catalog queries in a
    session whose ANSI mode or timezone they depend on.

    The catalog's session-mutation contract (dq.queries._t) deliberately
    leaves ``ansi.enabled=false`` + UTC set — correct for the driver and
    bench, silent semantic drift for an ANSI-on host. Usage::

        with catalog_session(spark):
            df = QUERIES["freshness"](spark, sf_dir)
            rows = df.collect()        # ACTIONS must run inside too —
                                       # lazy frames read confs at
                                       # action time, not build time

    On exit the two confs are restored to their entry values (unset
    stays unset)."""
    saved = {k: spark.conf.get(k, None) for k in _CATALOG_CONFS}
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
