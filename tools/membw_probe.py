"""Spark-free host-ceiling probe: run N pinned python workers doing the
bench's dominant kernel work (zlib inflate + numpy reshape — the pngz
decode path) and report per-worker throughput vs N.

If per-worker throughput decays as N grows, the host's shared memory
system (LLC / controllers / frequency budget) is the scaling ceiling —
an artifact of emulating a cluster on ONE socket. A real 4N-executor
cluster brings 4x the memory bandwidth; local[4N] does not.

    python tools/membw_probe.py [workers ...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
import zlib

import numpy as np

PAYLOAD_N = 64  # distinct payloads per worker (defeat trivial caching)
ROUNDS_S = 6.0


def _worker(args):
    wid, cpu = args
    os.sched_setaffinity(0, {cpu})
    rng = np.random.default_rng(wid)
    blobs = []
    for _ in range(PAYLOAD_N):
        img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        blobs.append(zlib.compress(img.tobytes(), 6))
    t_end = time.time() + ROUNDS_S
    n = 0
    while time.time() < t_end:
        raw = zlib.decompress(blobs[n % PAYLOAD_N])
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(64, 64, 3)
        arr.astype(np.float64).mean()  # touch every byte like blockhash does
        n += 1
    return n / ROUNDS_S


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    out = {}
    for n in levels:
        with mp.Pool(n) as pool:
            rates = pool.map(_worker, [(i, i % os.cpu_count()) for i in range(n)])
        out[n] = {
            "per_worker_imgs_s": round(sum(rates) / len(rates), 1),
            "total_imgs_s": round(sum(rates), 1),
            "loadavg": round(float(open("/proc/loadavg").read().split()[0]), 1),
        }
        print(n, out[n], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
