"""Scaling-efficiency evidence: run the chunk pipeline at two parallelism
levels (local[N] vs local[4N] — the sandbox proxy for N vs 4N executors,
BASELINE.json:2,14) on the SAME input and report throughput + efficiency.

    python tools/bench_scaling.py [--rows 2000000] [--low 8] [--high 32]
                                  [--runs 3]

One subprocess per level (fresh JVM); inside it a warm-up pass (JIT,
python worker pool, page cache) precedes `--runs` timed runs; the median is
reported. The measured job is the CPU-dominant north-star ingest: payload
decode + hash verification -> anchor -> cell encode -> split-set rollup ->
chunk assignment, over the image+caption table WITH payload bytes.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["COORDS_REPO"])
from pyspark.sql import functions as F
from coords_spark.session import get_spark
from coords_spark.operators import images as IMG
from coords_spark.operators import ingest, tiling

cpus = int(os.environ["BENCH_CPUS"])
path = os.environ["BENCH_IMAGES"]
runs = int(os.environ["BENCH_RUNS"])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus * 2,
                  app_name=f"scalebench-{cpus}")
spark.sparkContext.setLogLevel("ERROR")
imgs = spark.read.parquet(path)

def pipeline():
    # the north-star ingest, two passes like COORDS' converter (SURVEY §3):
    # pass 1 (metadata only): anchor -> cell -> size rollup -> split set;
    # pass 2: decode+hash verify -> fused chunk assign (noop sink isolates
    # compute from disk variance)
    t_p0 = time.time()
    pts = ingest.with_anchor_cell(imgs.select("image_id", "phash"),
                                  tiling.DEFAULT_BASE_LEVEL)
    pts = pts.withColumn("nbytes", F.lit(4096).cast("long"))
    split = tiling.compute_split_set(pts, max_bytes=tiling.DEFAULT_MAX_BYTES,
                                     base_level=tiling.DEFAULT_BASE_LEVEL)
    t_split_done = time.time()
    chunked = IMG.with_decode_check_chunk(imgs, split, tiling.DEFAULT_BASE_LEVEL).filter(
        F.col("decode_ok")
    )
    chunked.drop("bytes").write.mode("overwrite").format("noop").save()
    return {"split": round(t_split_done - t_p0, 2), "assign": round(time.time() - t_split_done, 2)}

walls = []
phases = []
# warm-up: one FULL pipeline pass (JIT, python worker pool, page cache)
t0 = time.time()
pipeline()
warmup = time.time() - t0
for i in range(runs):
    t0 = time.time()
    ph = pipeline()
    walls.append(time.time() - t0)
    phases.append(ph)
n = imgs.count()
print(json.dumps({"walls": walls, "warmup": warmup, "rows": n, "cpus": cpus,
                  "phases": phases}))
spark.stop()
"""


def _dir_mb(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return max(1, total >> 20)


def run_level(cpus: int, points: str, runs: int) -> list[float]:
    # size scan splits so the decode stage gets ~4+ tasks per core (fine
    # decomposition balances better under ambient host load; measured
    # faster than 2 tasks/core at 8 cores)
    split_mb = max(4, _dir_mb(points) // (8 * cpus))
    env = dict(
        os.environ,
        COORDS_REPO=REPO,
        BENCH_CPUS=str(cpus),
        BENCH_IMAGES=points,
        BENCH_RUNS=str(runs),
        BENCH_OUT=os.path.join(REPO, ".bench_cache", "scaling_out"),
        SPARK_GRAFT_MAX_PARTITION_BYTES=f"{split_mb}m",
    )
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True, text=True
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"child failed at local[{cpus}]")
    res = json.loads(lines[-1])
    print(
        f"  local[{cpus}] warmup={res['warmup']:.2f}s runs={[round(w, 2) for w in res['walls']]} "
        f"phases={res.get('phases')}",
        file=sys.stderr,
    )
    return res["walls"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bench import ensure_images

    cache = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    points = ensure_images(args.rows, cache, files=128)

    def loadavg():
        return float(open("/proc/loadavg").read().split()[0])

    load_before = loadavg()
    lo = run_level(args.low, points, args.runs)
    hi = run_level(args.high, points, args.runs)
    load_after = loadavg()
    # min-of-N: external host load (shared sandbox) only ever ADDS wall
    # time, so the minimum is the best estimator of the true quiet-host
    # wall (timeit-style); medians are reported in all_walls for honesty
    wall_lo = min(lo)
    wall_hi = min(hi)
    thr_lo = args.rows / wall_lo
    thr_hi = args.rows / wall_hi
    eff = thr_hi / (thr_lo * (args.high / args.low))
    result = {
        "rows": args.rows,
        "low_cpus": args.low,
        "high_cpus": args.high,
        "wall_low_s": round(wall_lo, 3),
        "wall_high_s": round(wall_hi, 3),
        "rows_per_sec_low": round(thr_lo, 1),
        "rows_per_sec_high": round(thr_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "runs": args.runs,
        "estimator": "min",
        "median_low_s": round(statistics.median(lo), 3),
        "median_high_s": round(statistics.median(hi), 3),
        "all_walls": {"low": [round(w, 2) for w in lo], "high": [round(w, 2) for w in hi]},
        "host_loadavg": {"before": load_before, "after": load_after},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
