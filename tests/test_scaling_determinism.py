"""Determinism under parallelism (SURVEY.md §5.3.6): the same chunk job at
local[2] and local[8] must produce byte-identical assignments — all
tie-breaks are data-keyed, never partition-keyed."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import hashlib, json, os, sys
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F
from coords_spark.session import get_spark
from coords_spark.fixtures import gen_points
from coords_spark.operators import ingest, tiling
import pandas as pd

spark = get_spark(master=os.environ["MASTER"], shuffle_partitions=8, app_name="determinism")
spark.sparkContext.setLogLevel("ERROR")
pts = spark.createDataFrame(gen_points(20000).to_pandas()).repartition(16)
pts = ingest.with_anchor_cell(pts.select("image_id", "phash"), tiling.DEFAULT_BASE_LEVEL)
pts = pts.withColumn("nbytes", F.lit(4096).cast("long"))
split = tiling.compute_split_set(pts, max_bytes=256 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL)
chunked = tiling.with_chunk(pts, split, base_level=tiling.DEFAULT_BASE_LEVEL)
rows = sorted((r["image_id"], r["chunk_id"]) for r in chunked.select("image_id", "chunk_id").collect())
h = hashlib.sha256(json.dumps(rows).encode()).hexdigest()
print(json.dumps({"hash": h, "splits": sorted(int(x) for x in split), "n": len(rows)}))
spark.stop()
"""


def _run(master: str) -> dict:
    env = dict(os.environ, REPO=REPO, MASTER=master)
    out = subprocess.run([sys.executable, "-c", _CHILD], env=env, capture_output=True, text=True)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stderr[-2000:]
    return json.loads(lines[-1])


def test_identical_output_across_parallelism():
    a = _run("local[2]")
    b = _run("local[8]")
    assert a["n"] == b["n"] == 20000
    assert a["splits"] == b["splits"]
    assert a["hash"] == b["hash"]


_CHILD_ROLLUP = r"""
import hashlib, json, os, sys
sys.path.insert(0, os.environ["REPO"])
from coords_spark.session import get_spark
from coords_spark.driver_surface import QUERIES

spark = get_spark(master=os.environ["MASTER"], shuffle_partitions=8, app_name="rollup_det")
spark.sparkContext.setLogLevel("ERROR")
rows = sorted(tuple(r) for r in QUERIES["geo_chunk_rollup"](spark, "/root/testdata/sf0.01").collect())
h = hashlib.sha256(json.dumps(rows).encode()).hexdigest()
print(json.dumps({"hash": h, "n": len(rows)}))
spark.stop()
"""


def test_geo_chunk_rollup_deterministic_across_parallelism():
    """Cheap insurance while geo_chunk_rollup sits in the driver window
    (round-2 verdict #8): the driver-registered query itself — split-set
    derivation + chunk assignment + rollup — must hash identically at two
    masters, pinning chunk-assignment byte-stability under parallelism."""
    env = dict(os.environ, REPO=REPO)
    outs = []
    for master in ("local[2]", "local[8]"):
        env["MASTER"] = master
        out = subprocess.run(
            [sys.executable, "-c", _CHILD_ROLLUP], env=dict(env), capture_output=True, text=True
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        assert lines, out.stderr[-2000:]
        outs.append(json.loads(lines[-1]))
    a, b = outs
    assert a["n"] == b["n"] > 0
    assert a["hash"] == b["hash"]
