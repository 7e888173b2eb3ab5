"""spark-submit entry point for the chunk-table pipeline (BASELINE.json:14
"run via spark-submit --py-files on a multi-executor cluster").

    spark-submit --py-files dist/coords_spark.zip tools/submit_job.py \
        --input <images parquet dir> --output <icepick table path> \
        [--base-level 12] [--max-bytes 4194304] [--group-level 2] [--verify]

Resumable: re-submitting with the same --output skips committed chunk
groups (icepick manifests). The SparkSession comes from spark-submit's
conf, so --master/--num-executors/--conf all apply untouched.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--base-level", type=int, default=12)
    ap.add_argument("--max-bytes", type=int, default=4 << 20)
    ap.add_argument("--group-level", type=int, default=2)
    ap.add_argument("--verify", action="store_true", help="decode+hash check payloads first")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from coords_spark.operators import images as IMG
    from coords_spark.operators import ingest

    spark = SparkSession.builder.appName("coords-chunk-pipeline").getOrCreate()
    images = spark.read.parquet(args.input)
    if args.verify and "bytes" in images.columns:
        images = IMG.with_decode_check(images).filter(F.col("decode_ok")).drop(
            "phash_rec", "decode_ok"
        )
    table, split = ingest.ingest_images(
        images,
        args.output,
        base_level=args.base_level,
        max_bytes=args.max_bytes,
        group_level=args.group_level,
    )
    print(
        json.dumps(
            {
                "output": args.output,
                "rows": table.total_rows(),
                "files": len(table.files()),
                "groups": sorted(table.committed_groups()),
                "split_nodes": len(split),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
