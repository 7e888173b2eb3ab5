"""Multipolygon reconstruction operator (SURVEY.md §2.4 T8).

Per-relation ring assembly is an inherently per-entity algorithm, so it
runs as grouped applyInPandas (one Arrow batch = many relations; the numpy
kernel runs per relation inside the batch) — the sanctioned custom-operator
shape (input_hint: Arrow-batched, no per-row Spark Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from coords_spark.kernels.rings import build_polygons

_OUT_SCHEMA = (
    "relation_id long, poly_idx int, "
    "outer array<struct<lat:int,lon:int>>, "
    "inners array<array<struct<lat:int,lon:int>>>"
)


def _pts_to_np(pts) -> np.ndarray:
    # Arrow gives list<struct> as a numpy array / list of {'lat','lon'} dicts
    return np.asarray([[p["lat"], p["lon"]] for p in pts], dtype=np.int64)


def _np_to_pts(arr: np.ndarray):
    return [{"lat": int(a), "lon": int(b)} for a, b in arr]


def _assemble(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for rid, grp in pdf.groupby("relation_id"):
        grp = grp.sort_values("member_pos")
        arcs = [_pts_to_np(p) for p in grp["pts"]]
        for i, (outer, holes) in enumerate(build_polygons(arcs)):
            out.append(
                {
                    "relation_id": rid,
                    "poly_idx": i,
                    "outer": _np_to_pts(outer),
                    "inners": [_np_to_pts(h) for h in holes],
                }
            )
    if not out:
        return pd.DataFrame(
            {"relation_id": pd.Series(dtype="int64"), "poly_idx": pd.Series(dtype="int32"),
             "outer": pd.Series(dtype=object), "inners": pd.Series(dtype=object)}
        )
    return pd.DataFrame(out)


def reconstruct_multipolygons(members: DataFrame) -> DataFrame:
    """members: output of resolve.resolve_relation_members filtered to
    multipolygon relations; returns one row per assembled polygon."""
    return members.groupBy("relation_id").applyInPandas(_assemble, _OUT_SCHEMA)
