"""Deterministic fixture synthesizers (FIXTURES.md): the graft images table,
the OSM-extract-like vector tables, and the PIP/alignment polygon targets.
Everything derives from pure hash functions of (table_name, row_index) —
never RNG state — so any subset regenerates identically at any scale.
"""

from coords_spark.fixtures.generate import (  # noqa: F401
    expected_caption,
    gen_admin_polygons,
    gen_coastline,
    gen_images,
    gen_nodes,
    gen_points,
    gen_relations,
    gen_update_diffs,
    gen_update_world,
    gen_ways,
    write_fixtures,
)
