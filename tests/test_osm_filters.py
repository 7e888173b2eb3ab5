import os

from pyspark.sql import functions as F

from coords_spark.operators import osm_filters as OF


def test_tag_filter_and_predicates(spark, fixture_dir):
    nodes = spark.read.parquet(os.path.join(fixture_dir, "nodes.parquet"))
    ways = spark.read.parquet(os.path.join(fixture_dir, "ways.parquet"))
    rels = spark.read.parquet(os.path.join(fixture_dir, "relations.parquet"))

    # P1: after filtering, no dropped key survives anywhere
    filtered = OF.filter_tags(
        nodes.withColumn("tags", F.expr("map_concat(tags, map('source', 'x'))"))
    )
    assert filtered.filter(F.array_contains(F.map_keys("tags"), "source")).count() == 0

    # P2: renderable nodes are exactly the tagged ones
    n_tagged = nodes.filter(F.size(F.map_keys("tags")) > 0).count()
    assert OF.renderable_nodes(nodes).count() == n_tagged
    assert 0 < n_tagged < nodes.count()

    # P2: polygon relations = the multipolygon fixtures
    mp = OF.polygon_relations(rels).count()
    assert mp == rels.filter(F.col("tags")["type"] == "multipolygon").count() > 0

    # P4: closed-way predicate matches first==last ref
    w = ways.withColumn("closed", OF.closed_way_col())
    got = w.filter("closed").count()
    want = ways.filter(F.expr("refs[0] = refs[size(refs)-1]")).count()
    assert got == want > 0

    # P5: bbox predicate sanity on envelope ints
    df = spark.createDataFrame(
        [(0, 0, 10, 10), (20, 20, 30, 30)], "env_minlat int, env_minlon int, env_maxlat int, env_maxlon int"
    )
    hit = df.filter(
        OF.bbox_intersects("env_minlat", "env_minlon", "env_maxlat", "env_maxlon", 5, 5, 15, 15)
    ).count()
    assert hit == 1
