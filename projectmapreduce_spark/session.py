"""SparkSession builder with scale-appropriate defaults.

Correctness-critical settings (FIXTURES.md "Notes for test authors"):

- ``spark.sql.session.timeZone=UTC`` so timestamp values hash
  identically to the DuckDB oracle (parquet stores naive/UTC values).
- AQE enabled (Spark 4 default, made explicit) so shuffle partition
  counts, skew splits, and dynamic broadcast decisions are runtime-
  adaptive — the same plan that runs on local[32] re-plans itself on a
  1000-executor cluster.

``ensure_session_conf`` is applied by every declared query because the
driver owns the SparkSession; we must not assume it was built here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs every query depends on.  Session timezone is a
# runtime conf in Spark, so we can enforce it even on a session we did
# not build (the driver's).
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    # Per-DataFrame-call Python stack capture for error enrichment costs
    # ~0.5 s on wide plan builds (profiled: _capture_call_site); the
    # engine's own errors carry enough context.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    # Streaming stateful operators key their state store on the shuffle
    # partition count and AQE does not coalesce them — 200 near-empty
    # state tasks per micro-batch on local fixtures.  Batch plans are
    # unaffected (AQE re-coalesces).  On a real cluster this is sized
    # to cores × ~2 by the deployment, not left at the 200 default.
    "spark.sql.shuffle.partitions": "32",
}


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Force the runtime confs this engine's correctness depends on.

    Called at the top of every declared query — the driver may hand us
    a session built with different defaults.
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by driver
            pass
    return spark


def get_spark(
    app_name: str = "projectmapreduce-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession with engine defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``.  Shuffle
    partitions default to the core count — at 100 TB on a real cluster
    this would be sized to ~128 MB per post-shuffle partition and then
    AQE-coalesced, which is why AQE stays on.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        builder = builder.config("spark.sql.shuffle.partitions", "32")
    spark = builder.getOrCreate()
    return ensure_session_conf(spark)
