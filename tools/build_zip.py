"""Rebuild dist/coords_spark.zip from the live coords_spark/ tree.

The driver imports the engine from this zip (--py-files contract,
BASELINE.json north_rule "run via spark-submit --py-files"). Round 1's
biggest evidence gap was a stale zip: 5 queries added after the last build
never got CORRECTNESS rows (VERDICT.md "What's wrong" #2). bench.py now
calls rebuild() at startup so the artifact is regenerated every round.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rebuild(repo: str = REPO) -> str:
    dist = os.path.join(repo, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "coords_spark.zip")
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(os.path.join(repo, "coords_spark")):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, repo))
    os.replace(tmp, out)
    return out


if __name__ == "__main__":
    print("built", rebuild())
