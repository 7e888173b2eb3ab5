"""Physical-plan audit (BENCH/PLANS.md evidence). Prints pushdown /
join-strategy / python-boundary properties of the key plans.

    python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from coords_spark.driver_surface import QUERIES
    from coords_spark.operators import ingest, tiling
    from coords_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def plan(df) -> str:
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        return df._jdf.queryExecution().explainString(mode)

    p = plan(QUERIES["q1_pricing_summary"](spark, sf))
    print("q1 pushdown:", "LessThanOrEqual(l_shipdate" in p)
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    print("q1 read columns:", len(m.group(1).split(",")) if m else "?")

    p = plan(QUERIES["q5_region_nation_revenue"](spark, sf))
    print("q5 broadcast joins:", p.count("BroadcastHashJoin"), "sort-merge:", p.count("SortMergeJoin"))

    p = plan(QUERIES["q3_top_orders"](spark, sf))
    print("q3 TakeOrderedAndProject:", "TakeOrderedAndProject" in p)

    p = plan(QUERIES["semi_join_active_customers"](spark, sf))
    print("semi LeftSemi:", "LeftSemi" in p)

    p = plan(QUERIES["knn_cosine_top10"](spark, sf))
    print("knn BroadcastNestedLoop + TakeOrdered:", "BroadcastNestedLoopJoin" in p and "TakeOrderedAndProject" in p)

    # chunk pipeline pass 2: exactly one python boundary
    pts = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.col("o_orderkey").cast("string").alias("image_id"),
        F.xxhash64("o_orderkey").alias("phash"),
    )
    def executed(df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    chunked = ingest.with_anchor_cell_chunk(pts, [], tiling.DEFAULT_BASE_LEVEL)
    print("assign ArrowEvalPython nodes:", executed(chunked).count("ArrowEvalPython"))

    rollup = tiling.subtree_sizes(
        ingest.with_anchor_cell(pts, 12).withColumn("nbytes", F.lit(1).cast("long")),
        "cell", "nbytes", 12,
    )
    print("rollup exchanges:", executed(rollup).count("Exchange"))

    # round-3 plans ------------------------------------------------------
    from coords_spark.operators import dedup

    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "lang", "source", "text"
    )
    cand = dedup.ngram_candidates(dedup.bucketed_shingles(d, n=3), df_cap=32)
    pc = executed(cand)
    # one exchange to the shingle key + one for the final pair distinct;
    # zero extra scans: the groupBy reuses the window's partitioning
    print("ngram candidate exchanges:", pc.count("Exchange"),
          "scans:", pc.count("Scan parquet"))

    p = plan(QUERIES["geo_pip_enrich"](spark, sf))
    print("pip cover distributed (MapInPandas):", "MapInPandas" in p,
          "| cogroup refine (FlatMapCoGroups):", "FlatMapCoGroupsInPandas" in p,
          "| broadcast cover joins:", p.count("BroadcastHashJoin"))

    p = plan(QUERIES["embedding_ivf_topk"](spark, sf))
    print("ivf equi-join (no nested loop):", "BroadcastNestedLoopJoin" not in p
          and ("BroadcastHashJoin" in p or "SortMergeJoin" in p or "ShuffledHashJoin" in p))
    spark.stop()


if __name__ == "__main__":
    main()
