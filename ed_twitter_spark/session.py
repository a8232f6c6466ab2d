"""SparkSession factory with scale-oriented defaults.

Defaults are tuned for correctness at local[N] test scale while encoding the
settings we would ship to a 1000-executor cluster: AQE on (runtime join
re-selection + skew-join splitting), Arrow enabled for all pandas UDF
exchange, explicit shuffle-partition sizing, and UTC session time so
timestamp semantics are engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size bounds per-batch memory of the embedding kernels
# (reference batches per-document; we batch per Arrow chunk).
ARROW_BATCH = 4096


def get_spark(
    app_name: str = "ed_twitter_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster the master/url comes from spark-submit and these local[] settings
    are inert.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or max(cores * 2, 8)

    # One BLAS thread per Python worker: Spark provides the parallelism
    # (one task per core); letting OpenBLAS/MKL also fan out oversubscribes
    # cores and silently skews any N-vs-4N scaling measurement. Set before
    # the JVM launches so python workers inherit it.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = SparkSession.builder.appName(app_name)
    # Under spark-submit the gateway JVM already carries the master and
    # driver memory from the CLI (--master, --driver-memory); setting them
    # here would *override* the submit args, not defer to them. The gateway
    # port env var marks that mode.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if not under_submit:
        builder = builder.master(f"local[{cores}]").config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g")
        )
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
