"""End-to-end ingest: images table -> anchored points -> quadtree chunks ->
icepick chunk table (SURVEY.md M2; BASELINE.json north_star pipeline).

Stages (all DataFrame ops; per-row math in Arrow-batched numpy):
  1. anchor: (lat, lon) derived from phash (FIXTURES.md §1),
  2. cell encode: deepest-containing cell — for points that is simply the
     cell at base_level (a point's envelope is itself),
  3. split-set pre-pass: subtree size rollup vs max_bytes (tiling.py),
  4. chunk assignment + salted range-partitioned materialization with
     per-group atomic commits (resume).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coords_spark.operators import cells as C
from coords_spark.operators import tiling as T
from coords_spark.sources.icepick import IcepickTable


def with_anchor(df: DataFrame, phash_col: str = "phash") -> DataFrame:
    return df.withColumn("lat", C.anchor_lat_col(F.col(phash_col))).withColumn(
        "lon", C.anchor_lon_col(F.col(phash_col))
    )


def with_point_cell(df: DataFrame, level: int, lat: str = "lat", lon: str = "lon") -> DataFrame:
    return df.withColumn("cell", C.cell_col(F.col(lat), F.col(lon), level))


def _drop_derived(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """phash is the source of truth for derived geo columns — recompute
    rather than trust stale inputs (and avoid duplicate-column errors)."""
    present = [c for c in cols if c in df.columns]
    return df.drop(*present) if present else df


def with_anchor_cell(df: DataFrame, level: int, phash_col: str = "phash") -> DataFrame:
    """Fused hot path: one Arrow exchange for anchor + mercator + cell
    (equivalent to with_point_cell(with_anchor(df), level), 3x fewer
    Python<->JVM roundtrips)."""
    df = _drop_derived(df, ("lat", "lon", "cell"))
    return df.withColumn("_ac", C.anchor_cell_struct(F.col(phash_col), level)).select(
        "*", "_ac.lat", "_ac.lon", "_ac.cell"
    ).drop("_ac")


def with_anchor_cell_chunk(
    df: DataFrame, split_set, base_level: int, phash_col: str = "phash"
) -> DataFrame:
    """Fully fused assignment stage (anchor + cell + chunk in one Python
    stage) for jobs that already hold the split set."""
    df = _drop_derived(df, ("lat", "lon", "cell", "chunk_id"))
    return df.withColumn(
        "_ac", C.anchor_cell_chunk_struct(F.col(phash_col), split_set, base_level)
    ).select("*", "_ac.lat", "_ac.lon", "_ac.cell", "_ac.chunk_id").drop("_ac")


def payload_nbytes_col(df: DataFrame) -> F.Column:
    """Serialized size estimate per row: payload bytes + fixed overhead.
    Columns that may be absent contribute 0 (bench tables carry no bytes)."""
    cols = set(df.columns)
    size = F.lit(64)
    if "bytes" in cols:
        size = size + F.coalesce(F.length(F.col("bytes")), F.lit(0))
    if "caption" in cols:
        size = size + F.coalesce(F.length(F.col("caption")), F.lit(0))
    return size.cast("long")


def ingest_images(
    images: DataFrame,
    table_path: str,
    base_level: int = T.DEFAULT_BASE_LEVEL,
    max_bytes: int = T.DEFAULT_MAX_BYTES,
    group_level: int = 2,
    key_col: str = "image_id",
) -> tuple[IcepickTable, np.ndarray]:
    """The flagship pipeline. Returns (icepick table, split set).

    Two Spark jobs, as in COORDS' tiler (SURVEY.md §3 E3): (a) the size
    rollup producing the split set, (b) assignment + write. Both read the
    same lineage-tracked input once each."""
    pts = with_anchor_cell(images, base_level).withColumn(
        "nbytes", payload_nbytes_col(images)
    )
    # split set AND per-chunk byte weights from one logical pass — the
    # weights let materialization place rows explicitly instead of paying
    # repartitionByRange's boundary-sampling re-evaluation of the input
    split_set, weights = T.compute_split_set_and_weights(
        pts, cell="cell", nbytes="nbytes", max_bytes=max_bytes, base_level=base_level
    )
    # pass 2 re-derives everything from phash in ONE fused Python stage
    chunked = with_anchor_cell_chunk(images, split_set, base_level)
    table = T.materialize_chunk_table(
        chunked, table_path, key_col=key_col, group_level=group_level,
        chunk_weights=weights,
    )
    return table, split_set


def read_chunk_table(spark, table_path: str, chunk_min: int | None = None, chunk_max: int | None = None) -> DataFrame:
    """Manifest-pruned read: only files overlapping [chunk_min, chunk_max]
    reach Spark; parquet row-group pruning then applies within files."""
    t = IcepickTable(table_path)
    paths = t.data_paths(chunk_min, chunk_max)
    if not paths:
        raise FileNotFoundError(f"no data files for range in {table_path}")
    df = spark.read.parquet(*paths)
    if chunk_min is not None:
        df = df.filter(F.col("chunk_id") >= chunk_min)
    if chunk_max is not None:
        df = df.filter(F.col("chunk_id") <= chunk_max)
    return df
