"""Projection / filter / predicate operators (SURVEY.md §2.2 P1-P5).

COORDS drops render-irrelevant tags and non-renderable entities during
conversion (REF? converter tag filtering [M]). All pure Column ops —
Catalyst pushes them into the scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# standard OSM metadata tags COORDS strips before storage
DROP_TAG_KEYS = ("created_by", "source", "note", "fixme", "odbl")


def filter_tags(df: DataFrame, drop_keys=DROP_TAG_KEYS, tags: str = "tags") -> DataFrame:
    """P1: remove render-irrelevant tag keys (map_filter, JVM-side)."""
    keys = ", ".join(f"'{k}'" for k in drop_keys)
    return df.withColumn(tags, F.expr(f"map_filter({tags}, (k, v) -> NOT k IN ({keys}))"))


def renderable_nodes(nodes: DataFrame) -> DataFrame:
    """P2: only tagged nodes are renderable features (untagged nodes exist
    solely as way vertices)."""
    return nodes.filter(F.size(F.map_keys(F.col("tags"))) > 0)


def polygon_relations(relations: DataFrame) -> DataFrame:
    """P2: relations that assemble into polygons."""
    return relations.filter(
        F.col("tags")["type"].isin("multipolygon", "boundary")
    )


def closed_way_col(refs: str = "refs") -> F.Column:
    """P4: a way is a candidate polygon iff first ref == last ref."""
    return F.element_at(F.col(refs), 1) == F.element_at(F.col(refs), -1)


def bbox_intersects(
    minlat: str, minlon: str, maxlat: str, maxlon: str, q_minlat: int, q_minlon: int, q_maxlat: int, q_maxlon: int
) -> F.Column:
    """P5: envelope-vs-query-box intersection as a prunable conjunction."""
    return (
        (F.col(maxlat) >= q_minlat)
        & (F.col(minlat) <= q_maxlat)
        & (F.col(maxlon) >= q_minlon)
        & (F.col(minlon) <= q_maxlon)
    )
