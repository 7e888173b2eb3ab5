"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implemented by the coords_spark engine (SURVEY.md §2 inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial chunk rollup. Derives a deterministic point feature
    per order (phash <- splitmix64(o_orderkey), anchor -> lat/lon — the
    same skewed geo distribution as the graft images table), assigns each
    point its quadtree chunk with the size-bounded split-set rule, and
    returns per-chunk stats (SURVEY.md M2 flagship; driver checks rows>0)."""
    from pyspark.sql import functions as F

    from coords_spark.operators import ingest, tiling
    from coords_spark.operators.cells import point_z_col
    from coords_spark.kernels.phash import splitmix64  # noqa: F401  (kernel parity)

    orders = spark.read.parquet(f"{SF0001}/orders.parquet")
    pts = orders.select(
        F.col("o_orderkey").alias("key"),
        F.xxhash64(F.col("o_orderkey")).alias("phash"),
        F.col("o_totalprice").alias("weight"),
    )
    pts = ingest.with_point_cell(ingest.with_anchor(pts), tiling.DEFAULT_BASE_LEVEL)
    pts = pts.withColumn("nbytes", F.lit(128).cast("long"))
    split = tiling.compute_split_set(pts, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL)
    chunked = tiling.with_chunk(pts, split, base_level=tiling.DEFAULT_BASE_LEVEL)
    return (
        chunked.groupBy("chunk_id")
        .agg(
            F.count("*").alias("n_points"),
            F.sum("weight").alias("total_weight"),
            F.min("cell").alias("cell_min"),
            F.max("cell").alias("cell_max"),
        )
        .orderBy("chunk_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Registered in coords_spark/driver_surface.py; aliases match oracle_sql.
    """
    from coords_spark.driver_surface import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query in
    ``queries()``; non-SQL-expressible spatial/streaming ops are omitted
    (driver records rows-only) and get pytest oracles instead."""
    from coords_spark.driver_surface import ORACLE_SQL

    return dict(ORACLE_SQL)
