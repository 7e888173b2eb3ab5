"""S1 PBF-shaped ingest (SURVEY.md §2.1; VERDICT r3 ask #6): the cpbf
blocked varint/delta/string-table format must roundtrip the entity fixtures
byte-identically through the Spark binaryFile + mapInArrow decode path."""

import os

import numpy as np
import pytest

from coords_spark.fixtures import gen_nodes, gen_ways
from coords_spark.kernels import varint as V
from coords_spark.sources import cpbf


def test_varint_roundtrip_extremes():
    rng = np.random.default_rng(0)
    v = np.concatenate(
        [
            rng.integers(0, 2**63, 5000, dtype=np.int64).astype(np.uint64),
            np.asarray([0, 1, 127, 128, 16383, 16384, 2**56, 2**64 - 1], dtype=np.uint64),
        ]
    )
    assert (V.decode_uvarints(V.encode_uvarints(v)) == v).all()
    s = rng.integers(-(2**62), 2**62, 5000, dtype=np.int64)
    assert (V.unzigzag(V.zigzag(s)) == s).all()


def test_varint_truncation_detected():
    buf = V.encode_uvarints(np.asarray([300], dtype=np.uint64))
    with pytest.raises(ValueError):
        V.decode_uvarints(buf[:-1])


@pytest.fixture(scope="module")
def cpbf_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("cpbf")
    nodes = gen_nodes(4000)
    ways = gen_ways(600, 4000)
    cpbf.write_cpbf(nodes, str(d / "nodes"), cpbf.KIND_NODES, rows_per_block=512, blocks_per_file=3)
    cpbf.write_cpbf(ways, str(d / "ways"), cpbf.KIND_WAYS, rows_per_block=97, blocks_per_file=2)
    # parquet keeps the map type — the type-faithful expected side
    pq.write_table(nodes, str(d / "nodes.parquet"))
    pq.write_table(ways, str(d / "ways.parquet"))
    return str(d)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_spark_decode_nodes_byte_identical(spark, cpbf_dir):
    d = cpbf_dir
    got = cpbf.read_cpbf(spark, os.path.join(d, "nodes"), cpbf.KIND_NODES)
    want = spark.read.parquet(os.path.join(d, "nodes.parquet"))
    g = _rows(got.selectExpr("id", "version", "lat", "lon", "to_json(tags) as t"), ["id", "version", "lat", "lon", "t"])
    w = _rows(want.selectExpr("id", "version", "lat", "lon", "to_json(tags) as t"), ["id", "version", "lat", "lon", "t"])
    assert g == w and len(g) == 4000


def test_spark_decode_ways_byte_identical(spark, cpbf_dir):
    d = cpbf_dir
    got = cpbf.read_cpbf(spark, os.path.join(d, "ways"), cpbf.KIND_WAYS)
    want = spark.read.parquet(os.path.join(d, "ways.parquet"))
    cols = ["id", "version", "r", "t"]
    g = _rows(got.selectExpr("id", "version", "to_json(refs) as r", "to_json(tags) as t"), cols)
    w = _rows(want.selectExpr("id", "version", "to_json(refs) as r", "to_json(tags) as t"), cols)
    assert g == w and len(g) == 600


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bogus.cpbf"
    p.write_bytes(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError):
        list(cpbf.iter_blocks(p.read_bytes()))


def test_spark_decode_relations_byte_identical(spark, tmp_path_factory):
    import pyarrow.parquet as pq

    from coords_spark.fixtures import gen_relations

    d = tmp_path_factory.mktemp("cpbf_rel")
    rels, _ = gen_relations(100)
    cpbf.write_cpbf(rels, str(d / "rels"), cpbf.KIND_RELATIONS, rows_per_block=17, blocks_per_file=3)
    pq.write_table(rels, str(d / "rels.parquet"))
    got = cpbf.read_cpbf(spark, str(d / "rels"), cpbf.KIND_RELATIONS)
    want = spark.read.parquet(str(d / "rels.parquet"))
    cols = ["id", "version", "m", "t"]
    g = _rows(got.selectExpr("id", "version", "to_json(members) as m", "to_json(tags) as t"), cols)
    w = _rows(want.selectExpr("id", "version", "to_json(members) as m", "to_json(tags) as t"), cols)
    assert g == w and len(g) == 100


def test_cpbf_feeds_resolve_pipeline(spark, cpbf_dir):
    """The cpbf front door must feed the engine identically to the parquet
    path: decode nodes+ways from cpbf, run the J1 location-resolution join,
    and match the parquet-sourced result exactly."""
    from pyspark.sql import functions as F

    from coords_spark.operators import resolve

    d = cpbf_dir
    nodes_c = cpbf.read_cpbf(spark, os.path.join(d, "nodes"), cpbf.KIND_NODES)
    ways_c = cpbf.read_cpbf(spark, os.path.join(d, "ways"), cpbf.KIND_WAYS)
    nodes_p = spark.read.parquet(os.path.join(d, "nodes.parquet"))
    ways_p = spark.read.parquet(os.path.join(d, "ways.parquet"))

    def digest(nodes, ways):
        r = resolve.resolve_ways(ways, nodes)
        return sorted(
            tuple(x)
            for x in r.selectExpr(
                "way_id",
                "size(pts) as n",
                "aggregate(transform(pts, p -> cast(p.lat as bigint) + p.lon), 0L, (a, x) -> a + x) as coord_sum",
            ).collect()
        )

    a = digest(nodes_c, ways_c)
    b = digest(nodes_p, ways_p)
    assert a == b and len(a) > 0


def test_streaming_cpbf_ingest_incremental(spark, tmp_path):
    """read_cpbf_stream must decode exactly the files present per trigger
    and pick up NEW files on the next trigger (file-source incrementality)."""
    from coords_spark.fixtures import gen_nodes

    src = tmp_path / "stream_src"
    ckpt = str(tmp_path / "ckpt")
    nodes = gen_nodes(300)
    first, second = nodes.slice(0, 200), nodes.slice(200, 100)
    cpbf.write_cpbf(first, str(src), cpbf.KIND_NODES, basename="a", rows_per_block=64, blocks_per_file=2)

    out = str(tmp_path / "decoded")

    def drain():
        q = (
            cpbf.read_cpbf_stream(spark, str(src), cpbf.KIND_NODES)
            .select("id", "version", "lat", "lon")  # parquet sink: no map col needed
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got1 = spark.read.parquet(out).selectExpr("count(*) n", "sum(id) s").collect()[0]
    assert got1["n"] == 200
    cpbf.write_cpbf(second, str(src), cpbf.KIND_NODES, basename="b", rows_per_block=64, blocks_per_file=2)
    drain()
    got2 = spark.read.parquet(out).selectExpr("count(*) n", "sum(id) s").collect()[0]
    assert got2["n"] == 300
    want_sum = sum(nodes.column("id").to_pylist())
    assert got2["s"] == want_sum


def test_edge_case_entities_roundtrip():
    """Zero-ref ways, memberless relations, empty tag maps — incl at block
    boundaries (the segmented-delta edge the property test exposed)."""
    import pyarrow as pa

    ways = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "version": pa.array([1, 1, 1], pa.int32()),
            "refs": pa.array([[5, 9, 5], [], []], pa.list_(pa.int64())),
            "tags": pa.array(
                [[("a", "b")], [], []], pa.map_(pa.string(), pa.string())
            ),
        }
    )
    rels = pa.table(
        {
            "id": pa.array([10, 11], pa.int64()),
            "version": pa.array([1, 1], pa.int32()),
            "members": pa.array(
                [[{"mtype": 1, "ref": 7, "role": "outer"}], []],
                pa.list_(pa.struct([("mtype", pa.int8()), ("ref", pa.int64()), ("role", pa.string())])),
            ),
            "tags": pa.array([[], []], pa.map_(pa.string(), pa.string())),
        }
    )
    for tbl, kind, col in ((ways, cpbf.KIND_WAYS, "refs"), (rels, cpbf.KIND_RELATIONS, "members")):
        for rpb in (1, 2, 10):  # empty entities land at every block position
            body_blocks = []
            import tempfile

            d = tempfile.mkdtemp()
            paths = cpbf.write_cpbf(tbl, d, kind, rows_per_block=rpb)
            got = []
            for p in paths:
                for body in cpbf.iter_blocks(open(p, "rb").read()):
                    k, cols = cpbf.decode_block(body)
                    got.append(cpbf._block_to_batch(k, cols))
            back = pa.Table.from_batches(got)
            assert back.column("id").to_pylist() == tbl.column("id").to_pylist()
            assert back.column(col).to_pylist() == tbl.column(col).to_pylist()
            assert back.column("tags").to_pylist() == tbl.column("tags").to_pylist()


def test_streaming_planet_ingest_exactly_once(spark, tmp_path):
    """cpbf node stream -> cell -> chunk -> icepick, exactly-once: two
    availableNow drains over two file drops produce the same row set and
    chunk assignments as the batch path, with one manifest group per
    micro-batch and no duplicates on re-drain."""
    import numpy as np
    from pyspark.sql import functions as F

    from coords_spark.fixtures import gen_nodes
    from coords_spark.operators import knn as K
    from coords_spark.operators import tiling as T
    from coords_spark.sources.icepick import IcepickTable
    from coords_spark.streaming import ingest_stream as S

    nodes = gen_nodes(1000)
    src = tmp_path / "pbf"
    out = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # split set from the full batch (the production flow computes it on a
    # seed batch or prior snapshot)
    batch = spark.createDataFrame(nodes.to_pandas()[["id", "lat", "lon"]])
    pts = batch.withColumn("cell", K.cell_at_level_col(8)).withColumn(
        "nbytes", F.lit(4096).cast("long")
    )
    split = T.compute_split_set(pts, max_bytes=256 * 1024, base_level=8)

    cpbf.write_cpbf(nodes.slice(0, 600), str(src), cpbf.KIND_NODES, basename="d0",
                    rows_per_block=128, blocks_per_file=2)
    q = S.stream_ingest_nodes(
        cpbf.read_cpbf_stream(spark, str(src), cpbf.KIND_NODES), out, split, 8, ckpt
    )
    q.processAllAvailable(); q.stop()
    t = IcepickTable(out)
    assert t.total_rows() == 600
    cpbf.write_cpbf(nodes.slice(600, 400), str(src), cpbf.KIND_NODES, basename="d1",
                    rows_per_block=128, blocks_per_file=2)
    q = S.stream_ingest_nodes(
        cpbf.read_cpbf_stream(spark, str(src), cpbf.KIND_NODES), out, split, 8, ckpt
    )
    q.processAllAvailable(); q.stop()
    assert t.total_rows() == 1000
    # re-drain with nothing new: no duplicates
    q = S.stream_ingest_nodes(
        cpbf.read_cpbf_stream(spark, str(src), cpbf.KIND_NODES), out, split, 8, ckpt
    )
    q.processAllAvailable(); q.stop()
    assert t.total_rows() == 1000
    # chunk assignments equal the batch pipeline's
    got = {
        r["id"]: r["chunk_id"]
        for r in spark.read.parquet(*t.data_paths()).select("id", "chunk_id").collect()
    }
    want = {
        r["id"]: r["chunk_id"]
        for r in T.with_chunk(pts, split, base_level=8).select("id", "chunk_id").collect()
    }
    assert got == want and len(got) == 1000


def test_streaming_way_ingest_matches_batch(spark, tmp_path):
    """Way stream (VERDICT r4 ask #7): a 3-file cpbf way stream, resolved
    per micro-batch against the static node table, must land the same
    chunked rows as the batch twin (chunk_way_batch over the batch read),
    exactly-once across two drains + an empty re-drain."""
    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.operators import tiling as T
    from coords_spark.sources.icepick import IcepickTable
    from coords_spark.streaming import ingest_stream as S

    nodes, ways = gen_nodes(2000), gen_ways(300, 2000)
    src = tmp_path / "waypbf"
    out = str(tmp_path / "waytable")
    ckpt = str(tmp_path / "wayckpt")
    nodes_df = spark.createDataFrame(nodes).localCheckpoint()

    bl = T.DEFAULT_BASE_LEVEL
    batch_ways = lambda: cpbf.read_cpbf(spark, str(src), cpbf.KIND_WAYS)  # noqa: E731
    # split from the full way set (production: seed batch / prior snapshot)
    cpbf.write_cpbf(ways, str(tmp_path / "all"), cpbf.KIND_WAYS, rows_per_block=100)
    allw = cpbf.read_cpbf(spark, str(tmp_path / "all"), cpbf.KIND_WAYS)
    from coords_spark.operators import geometry, resolve

    from pyspark.sql import functions as F

    g = geometry.with_geometry_cell(
        geometry.with_envelope(resolve.resolve_ways(allw, nodes_df))
    ).withColumn("nbytes", (F.size("pts") * 8 + 64).cast("long"))
    split = T.compute_split_set(g, max_bytes=8 * 1024, base_level=bl)

    # drop 1: two files; drop 2: one more file; then an empty re-drain
    cpbf.write_cpbf(ways.slice(0, 200), str(src), cpbf.KIND_WAYS, basename="d0",
                    rows_per_block=50, blocks_per_file=2)
    q = S.stream_ingest_ways(
        cpbf.read_cpbf_stream(spark, str(src), cpbf.KIND_WAYS), nodes_df, out, split, bl, ckpt
    )
    q.processAllAvailable(); q.stop()
    cpbf.write_cpbf(ways.slice(200, 100), str(src), cpbf.KIND_WAYS, basename="d1",
                    rows_per_block=50, blocks_per_file=2)
    q = S.stream_ingest_ways(
        cpbf.read_cpbf_stream(spark, str(src), cpbf.KIND_WAYS), nodes_df, out, split, bl, ckpt
    )
    q.processAllAvailable(); q.stop()
    q = S.stream_ingest_ways(
        cpbf.read_cpbf_stream(spark, str(src), cpbf.KIND_WAYS), nodes_df, out, split, bl, ckpt
    )
    q.processAllAvailable(); q.stop()

    t = IcepickTable(out)
    rows = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.selectExpr(
            "way_id", "chunk_id", "to_json(pts) as p", "tags_json"
        ).collect()
    )
    got = rows(spark.read.parquet(*t.data_paths()))
    want = rows(S.chunk_way_batch(batch_ways(), nodes_df, split, bl))
    assert got == want and len(got) == 300


def test_streaming_relation_ingest_matches_batch(spark, tmp_path):
    """Relation stream (VERDICT r4 ask #7): members join the static
    resolved-way table per batch; stream rows must equal the batch twin."""
    from pyspark.sql import functions as FF

    from coords_spark.fixtures import gen_relations
    from coords_spark.operators import tiling as T
    from coords_spark.sources.icepick import IcepickTable
    from coords_spark.streaming import ingest_stream as S

    rels, ring_ways = gen_relations(80)
    src = tmp_path / "relpbf"
    out = str(tmp_path / "reltable")
    ckpt = str(tmp_path / "relckpt")
    resolved = (
        spark.createDataFrame(ring_ways)
        .select(FF.col("id").alias("way_id"), "pts")
        .localCheckpoint()
    )
    bl = T.DEFAULT_BASE_LEVEL
    cpbf.write_cpbf(rels, str(src), cpbf.KIND_RELATIONS, rows_per_block=20, blocks_per_file=2)
    rels_batch = cpbf.read_cpbf(spark, str(src), cpbf.KIND_RELATIONS)
    g = S.chunk_relation_batch(rels_batch, resolved, split_set=[], base_level=bl)
    split = []  # all-root split: chunk = ancestor at base; fine for parity
    q = S.stream_ingest_relations(
        cpbf.read_cpbf_stream(spark, str(src), cpbf.KIND_RELATIONS), resolved, out, split, bl, ckpt
    )
    q.processAllAvailable(); q.stop()
    t = IcepickTable(out)
    rows = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.select(
            "relation_id", "chunk_id", "tags_json", "members_json"
        ).collect()
    )
    assert rows(spark.read.parquet(*t.data_paths())) == rows(g)
    assert spark.read.parquet(*t.data_paths()).count() > 0
