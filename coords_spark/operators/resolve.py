"""Location resolution + reverse index (SURVEY.md §2.3 J1/J2/J3, §3 E2).

COORDS resolves way node-refs against a dense vertex array via random mmap
reads (REF? coordsResolveLocations [M]). Spark-first: the lookup becomes an
equi-join —

    ways --posexplode(refs)--> (way_id, pos, node_id)
         --join nodes--------> (way_id, pos, node_id, lat, lon)
         --groupBy(way_id)---> sort_array(collect_list(struct(pos, ...)))

Skew posture (T6 / BASELINE.json:6): urban nodes are referenced by many
ways and mega-ways explode into thousands of rows; AQE skew-join splits
oversized post-shuffle partitions (enabled in session.py), and the
groupBy(way_id) key is unique per way so the agg side is balanced. Ways
with ANY dangling ref are excluded from the resolved output and reported
by `dangling_refs` (left_anti), matching the oracle's drop semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_refs(ways: DataFrame) -> DataFrame:
    return ways.select(
        F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "node_id")
    )


def resolve_ways(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """way_id -> pts: array<struct<node_id,lat,lon>> in ref order; ways with
    missing refs dropped (complete resolution only)."""
    ex = explode_refs(ways)
    nd = nodes.select(F.col("id").alias("node_id"), "lat", "lon")
    joined = ex.join(nd, "node_id")
    resolved = (
        joined.groupBy("way_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "node_id", "lat", "lon"))
            ).alias("_raw"),
        )
        .select(
            "way_id",
            F.expr(
                "transform(_raw, p -> struct(p.node_id as node_id, p.lat as lat, p.lon as lon))"
            ).alias("pts"),
            F.size("_raw").alias("_n"),
        )
    )
    sizes = ways.select(F.col("id").alias("way_id"), F.size("refs").alias("_want"))
    return (
        resolved.join(sizes, "way_id")
        .filter(F.col("_n") == F.col("_want"))
        .select("way_id", "pts")
    )


def dangling_refs(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """(way_id, node_id) pairs whose node does not exist (left_anti)."""
    ex = explode_refs(ways)
    nd = nodes.select(F.col("id").alias("node_id"))
    return ex.join(nd, "node_id", "left_anti").select("way_id", "node_id").distinct()


def reverse_index(ways: DataFrame) -> DataFrame:
    """node_id -> sorted set of referencing way ids (REF? reverseIndex [M]);
    supports incremental update queries ("which ways touch node X")."""
    return (
        explode_refs(ways)
        .groupBy("node_id")
        .agg(F.array_sort(F.collect_set("way_id")).alias("way_ids"))
    )


def resolve_relation_members(relations: DataFrame, resolved_ways: DataFrame) -> DataFrame:
    """J2: explode relation members, attach resolved way geometry for
    mtype=1 (way) members. Returns (relation_id, member_pos, role, way_id,
    pts); dangling way members are dropped here and surfaced by
    `dangling_members`."""
    mem = relations.select(
        F.col("id").alias("relation_id"), F.posexplode("members").alias("member_pos", "m")
    ).select(
        "relation_id",
        "member_pos",
        F.col("m.mtype").alias("mtype"),
        F.col("m.ref").alias("way_id"),
        F.col("m.role").alias("role"),
    )
    return mem.filter(F.col("mtype") == 1).join(resolved_ways, "way_id").select(
        "relation_id", "member_pos", "role", "way_id", "pts"
    )


def dangling_members(relations: DataFrame, resolved_ways: DataFrame) -> DataFrame:
    mem = relations.select(
        F.col("id").alias("relation_id"), F.explode("members").alias("m")
    ).select("relation_id", F.col("m.mtype").alias("mtype"), F.col("m.ref").alias("way_id"))
    return (
        mem.filter(F.col("mtype") == 1)
        .join(resolved_ways.select("way_id"), "way_id", "left_anti")
        .select("relation_id", "way_id")
        .distinct()
    )
