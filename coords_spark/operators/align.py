"""Raster-tile <-> vector-chunk alignment join (SURVEY.md §2.3 J6;
BASELINE.json:6 "raster-tile<->vector-chunk alignment").

Raster payloads (image chunk tables) and vector geometry chunk tables are
both keyed by quadtree cells, generally at different depths. Alignment maps
each raster chunk to the vector chunk on the same quadtree path:

    pair key = z_ancestor(deeper_chunk, level(shallower_chunk))

Implemented as a pure equi-join after a JVM-side ancestor projection: for
each vector chunk level L present (small distinct set), raster chunks
re-key at L and join. No UDF, no shuffle beyond the join itself; with both
tables range-partitioned by chunk id this is a co-located merge at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coords_spark.kernels import zcurve
from coords_spark.operators.cells import ancestor_expr


def _level_col(name: str):
    return F.col(name).bitwiseAND(F.lit(int(zcurve.LEVEL_MASK)))


def align_chunks(
    raster: DataFrame,
    vector: DataFrame,
    raster_chunk: str = "chunk_id",
    vector_chunk: str = "chunk_id",
) -> DataFrame:
    """Returns (vector_chunk, raster_chunk) pairs where the raster chunk
    lies on the vector chunk's quadtree path (either may be the deeper
    one). Distinct vector levels drive the fan-out (bounded by tree depth)."""
    vlevels = [r[0] for r in vector.select(_level_col(vector_chunk).alias("l")).distinct().collect()]
    v = vector.select(F.col(vector_chunk).alias("v_chunk")).distinct()
    r = raster.select(F.col(raster_chunk).alias("r_chunk")).distinct()

    out = None
    for lv in sorted(vlevels):
        # raster chunks at level >= lv re-keyed to their ancestor at lv
        deep_r = r.filter(_level_col("r_chunk") >= lv).select(
            "r_chunk", ancestor_expr("r_chunk", lv).alias("v_chunk")
        )
        j1 = deep_r.join(v.filter(_level_col("v_chunk") == lv), "v_chunk").select(
            "v_chunk", "r_chunk"
        )
        # vector chunks at level lv whose ancestor path passes through a
        # SHALLOWER raster chunk: re-key vector up to each raster level
        out = j1 if out is None else out.unionAll(j1)
    rlevels = [x[0] for x in raster.select(_level_col(raster_chunk).alias("l")).distinct().collect()]
    for lr in sorted(rlevels):
        deep_v = v.filter(_level_col("v_chunk") > lr).select(
            "v_chunk", ancestor_expr("v_chunk", lr).alias("r_chunk")
        )
        j2 = deep_v.join(r.filter(_level_col("r_chunk") == lr), "r_chunk").select(
            "v_chunk", "r_chunk"
        )
        out = j2 if out is None else out.unionAll(j2)
    if out is None:  # both inputs empty
        return raster.sparkSession.createDataFrame([], "v_chunk long, r_chunk long")
    return out.distinct()
