"""coords_spark — a from-scratch, PySpark-native spatial-join + tiling engine.

Capabilities modeled on rbuch703/coords (chunk-organized quadtree spatial
storage, see SURVEY.md): vectorized quadkey/Z-order cell encoding, deepest-
containing-cell chunk assignment with size-bounded subdivision, location-
resolution joins, multipolygon reconstruction, ray-cast point-in-polygon
joins, cell-ring kNN, raster-tile<->vector-chunk alignment, and an
Iceberg-style manifest table layer ("icepick") with per-partition lineage
and kill-safe resume.

Design tenet (SURVEY.md §7): kernels are pure numpy functions (testable
without Spark), wrapped once in Arrow-batched pandas UDFs; all orchestration
is DataFrame ops; nothing row-at-a-time in Python.
"""

__version__ = "0.1.0"
