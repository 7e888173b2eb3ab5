"""SparkSession factory with the engine's recommended configuration.

Scale posture (SURVEY.md §4): AQE on (skew-join + coalesce), Arrow exchange
on with bounded batches (the image `bytes` column can make rows ~12 KB, so
batches are capped by records — see input_hint watch-list §7(5)).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "coords-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        # default: 2x cores for local mode; a real cluster would size this
        # to cores*2..3 via spark-submit conf
        try:
            cores = int(master.split("[")[1].rstrip("]*"))
        except (IndexError, ValueError):
            cores = 32
        shuffle_partitions = max(8, cores * 2)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # re-launch straggling tasks — on shared/noisy hosts a single starved
        # task otherwise sets the stage wall time. The scaling bench turns
        # this OFF (speculative duplicates inflate CPU and pollute the
        # N-vs-4N comparison on pinned cores).
        .config("spark.speculation", os.environ.get("SPARK_GRAFT_SPECULATION", "true"))
        .config("spark.speculation.multiplier", "2")
        .config("spark.speculation.quantile", "0.9")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "16384"),
        )
        .config("spark.sql.parquet.filterPushdown", "true")
        # size scan splits so task count >= cores (the payload tables here
        # are ~1 GB across ~128 small files; the 128 MB default + 4 MB open
        # cost coalesces them to ~12 partitions, capping parallelism at 12
        # regardless of cores — the single biggest local-scaling killer).
        # On a real cluster with 256 MB+ files the default is fine; both
        # knobs are env-overridable.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", "1m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return b.getOrCreate()
