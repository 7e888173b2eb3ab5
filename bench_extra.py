"""Component micro-benches behind OPTIMIZATION_r08.md (guide §1.4).

NOT part of the driver contract — bench.py is the frozen measurement
surface. These isolate the operators the r8 optimization round touched so
before/after claims are reproducible:

    python bench_extra.py decode     # payload decode UDF body, single-core
    python bench_extra.py upsert     # 16-batch entity-store upsert loop
    python bench_extra.py split      # split-set + weights phases (150k rows)
    python bench_extra.py pyramid    # sink build / refresh / rebuild world

Each prints plain timings; run at low ambient load (check /proc/loadavg)
and prefer min-of-N — the host is shared (CLAUDE.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def bench_decode() -> None:
    """Single-core UDF-body timing: the pre-r8 per-row loop vs the
    batched _decode_hash_batch on one cached bench file."""
    import numpy as np
    import pyarrow.parquet as pq

    from coords_spark.kernels import phash
    from coords_spark.operators import images as IMG

    part = ".bench_cache/images_200000/part-0000.parquet"
    if not os.path.exists(part):
        print("run bench.py once first (builds .bench_cache)")
        return
    t = pq.read_table(part)
    b = t.column("bytes").combine_chunks()
    fmts = t.column("fmt").to_pylist()
    ws = t.column("w").to_numpy()
    hs = t.column("h").to_numpy()

    def scalar_loop():
        n = len(b)
        hashes = np.zeros(n, np.int64)
        for i in range(n):
            try:
                img = IMG._decode(b[i].as_buffer(), fmts[i], int(ws[i]), int(hs[i]))
            except IMG.DECODE_ERRORS:
                continue
            hashes[i] = phash.blockhash64(img)
        return hashes

    # min-of-3: the host is shared, a single interleaved pair is noise
    t_old = t_new = float("inf")
    h_old = h_new = None
    for _ in range(3):
        t0 = time.time()
        h_old = scalar_loop()
        t_old = min(t_old, time.time() - t0)
        t0 = time.time()
        h_new, _ = IMG._decode_hash_batch(b, fmts, ws, hs)
        t_new = min(t_new, time.time() - t0)
    assert (h_old == h_new).all()
    print(
        f"decode+hash {t.num_rows} rows (min of 3): scalar {t_old:.3f}s  "
        f"batched {t_new:.3f}s  ({t_old / t_new:.2f}x, bit-identical)"
    )


def _spark():
    from coords_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def bench_upsert() -> None:
    """The bench.py lifecycle loop in isolation: 16 x 200-row upserts on
    a 2M-row entity store, then one maintenance sweep."""
    from pyspark.sql import functions as F

    from coords_spark.operators import entity_store as ES
    from coords_spark.sources.icepick import IcepickTable
    from coords_spark.streaming.update_stream import maintain_tables

    spark = _spark()
    cols = [
        F.col("id"),
        F.lit(1).alias("version"),
        (F.col("id") % 1_000_000).cast("int").alias("lat"),
        (F.col("id") % 999_983).cast("int").alias("lon"),
        F.expr("cast(map() as map<string,string>)").alias("tags"),
    ]
    n_ent = 2_000_000
    tmp = tempfile.mkdtemp(prefix="bx_upsert_")
    store = os.path.join(tmp, "store")
    t0 = time.time()
    ES.build_entity_store(spark.range(1, n_ent + 1).select(*cols), store, id_shift=10)
    print(f"build: {time.time() - t0:.2f}s")
    t0 = time.time()
    for bno in range(16):
        lo = 1 + (bno * 7919) % (n_ent - 400)
        ups = spark.range(lo, lo + 200).select(*cols).withColumn("version", F.lit(2 + bno))
        ES.upsert_entities(spark, store, ups, group=f"d{bno}")
    dt = time.time() - t0
    st = IcepickTable(store)
    print(f"16-batch upsert loop: {dt:.2f}s ({dt / 16:.3f}s/batch) files={len(st.files())}")
    t0 = time.time()
    s1 = spark.read.parquet(*st.data_paths()).agg(F.sum("id"), F.sum("version")).collect()[0]
    print(f"fragmented read: {time.time() - t0:.2f}s")
    t0 = time.time()
    maintain_tables(spark, [store], group="maint", target_bytes=64 << 20, keep_n=1)
    print(f"maintain: {time.time() - t0:.2f}s")
    s2 = spark.read.parquet(*st.data_paths()).agg(F.sum("id"), F.sum("version")).collect()[0]
    assert tuple(s1) == tuple(s2), "maintenance changed content"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def bench_split() -> None:
    """compute_split_set_and_weights + explicit materialize phases on the
    150k-row orders-derived point table (the render_bbox_build shape)."""
    from pyspark.sql import functions as F

    from coords_spark import driver_surface as DS
    from coords_spark.operators import ingest, tiling

    spark = _spark()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    o = (
        DS._t(spark, sf, "orders")
        .select(F.col("o_orderkey").alias("image_id"), F.xxhash64("o_orderkey").alias("phash"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    pts = ingest.with_anchor_cell(o, tiling.DEFAULT_BASE_LEVEL).withColumn(
        "nbytes", F.lit(128).cast("long")
    )
    pts.write.format("noop").mode("overwrite").save()  # warm workers
    for run in range(2):
        tmp = tempfile.mkdtemp(prefix="bx_split_")
        t0 = time.time()
        split, weights = tiling.compute_split_set_and_weights(
            pts, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
        )
        t1 = time.time()
        chunked = ingest.with_anchor_cell_chunk(o, split, tiling.DEFAULT_BASE_LEVEL)
        tiling.materialize_chunk_table(chunked, f"{tmp}/t", chunk_weights=weights)
        t2 = time.time()
        print(
            f"run{run}: split+weights={t1 - t0:.2f}s materialize={t2 - t1:.2f}s "
            f"(nsplit={len(split)} nchunks={len(weights)})"
        )
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def bench_pyramid() -> None:
    """The bench.py local-cluster pyramid world: sink build, dirty
    refresh, full rebuild (refresh rows must equal rebuild rows)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F

    from coords_spark.operators import geometry, render, resolve
    from coords_spark.operators import tiling as TL
    from coords_spark.sources.icepick import IcepickTable

    spark = _spark()
    tmp = tempfile.mkdtemp(prefix="bx_pyr_")
    bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))
    n_clusters, per = 256, 400
    cl = np.repeat(np.arange(n_clusters), per)
    k = np.tile(np.arange(per), n_clusters)
    nid = np.arange(cl.size, dtype=np.int64) + 1
    clat = 501_000_000 + (cl // 16) * 1_700_000
    clon = -19_000_000 + (cl % 16) * 2_300_000
    nlat = (clat + ((k * 37) % 41) * 60_000).astype(np.int32)
    nlon = (clon + ((k * 53) % 37) * 60_000).astype(np.int32)
    lnodes = spark.createDataFrame(
        pa.table({"id": pa.array(nid), "lat": pa.array(nlat), "lon": pa.array(nlon)})
    ).localCheckpoint()
    way_refs = [
        [int(c * per + s + j + 1) for j in range(6)]
        for c in range(n_clusters)
        for s in range(0, per - 6, 2)
    ]
    lways = spark.createDataFrame(
        pa.table(
            {
                "id": pa.array(np.arange(len(way_refs), dtype=np.int64) + 1),
                "refs": pa.array(way_refs, pa.list_(pa.int64())),
            }
        )
    ).localCheckpoint()

    def chunkify(nd, out):
        rs = resolve.resolve_ways(lways, nd)
        g = geometry.with_geometry_cell(geometry.with_envelope(rs)).withColumn(
            "nbytes", (F.size("pts") * 8 + 64).cast("long")
        )
        sp = TL.compute_split_set(g, max_bytes=256 * 1024)
        rows = TL.with_chunk(g, sp).select(
            "way_id", "cell", "chunk_id", "pts",
            F.expr("pts[0].lat").alias("lat"), F.expr("pts[0].lon").alias("lon"),
        )
        TL.materialize_chunk_table(rows, out, key_col="way_id")
        return out

    pre = chunkify(lnodes, os.path.join(tmp, "pre"))
    t0 = time.time()
    sink1 = os.path.join(tmp, "sink")
    render.build_pyramid_table(spark, pre, sink1, bbox, zoom=12, min_zoom=10)
    print(f"sink build: {time.time() - t0:.2f}s")
    anchor_ids = {r[0] for r in way_refs}
    moved_ids = [int(i) for i in range(1, per + 1) if i % 7 == 3 and i not in anchor_ids]
    moved = spark.createDataFrame([(i,) for i in moved_ids], "id long")
    post_nodes = (
        lnodes.join(moved, "id", "anti")
        .unionByName(
            lnodes.join(moved, "id", "semi")
            .withColumn("lat", F.col("lat") + F.lit(500_000))
            .withColumn("lon", F.col("lon") + F.lit(700_000))
        )
        .localCheckpoint()
    )
    aff = (
        lways.select(F.col("id").alias("way_id"), F.explode("refs").alias("nid"))
        .join(F.broadcast(moved.withColumnRenamed("id", "nid")), "nid")
        .select(F.col("way_id").alias("id"))
        .distinct()
    )
    old_g = resolve.resolve_ways(lways.join(aff, "id", "semi"), lnodes)
    new_g = resolve.resolve_ways(lways.join(aff, "id", "semi"), post_nodes)
    dirty = render.dirty_tiles(old_g.unionByName(new_g), 12, 10).localCheckpoint()
    post = chunkify(post_nodes, os.path.join(tmp, "post"))
    t0 = time.time()
    render.refresh_pyramid_table(spark, post, sink1, bbox, dirty, zoom=12, min_zoom=10)
    print(f"refresh: {time.time() - t0:.2f}s")
    t0 = time.time()
    sink2 = os.path.join(tmp, "rebuild")
    render.build_pyramid_table(spark, post, sink2, bbox, zoom=12, min_zoom=10)
    print(f"rebuild: {time.time() - t0:.2f}s")
    n1 = spark.read.parquet(*IcepickTable(sink1).data_paths()).count()
    n2 = spark.read.parquet(*IcepickTable(sink2).data_paths()).count()
    assert n1 == n2, (n1, n2)
    print(f"refresh rows == rebuild rows: {n1}")
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "decode"
    {"decode": bench_decode, "upsert": bench_upsert,
     "split": bench_split, "pyramid": bench_pyramid}[which]()
