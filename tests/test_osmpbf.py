"""Real .osm.pbf front door (SURVEY.md §2.1 S1; VERDICT r4 ask #1): the
protobuf wire-format reader must roundtrip the entity fixtures
byte-identically through the distributed blob-index + seek-read path, and
the blob index must actually split ONE file into many work units."""

import os
import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from coords_spark.fixtures import gen_nodes, gen_relations, gen_ways
from coords_spark.kernels import proto as P
from coords_spark.kernels import varint as V
from coords_spark.sources import osmpbf


def test_wire_walk_roundtrip_scalars():
    msg = (
        P.enc_field_varint(1, 300)
        + P.enc_field_len(2, b"hello")
        + P.enc_field_varint(17, 100)
        + P.enc_key(3, P.WT_FIXED64) + struct.pack("<Q", 7)
        + P.enc_key(4, P.WT_FIXED32) + struct.pack("<I", 9)
    )
    fd = P.fields_dict(msg, 0, len(msg))
    assert fd[1] == [300] and fd[17] == [100] and fd[3] == [7] and fd[4] == [9]
    s, e = fd[2][0]
    assert msg[s:e] == b"hello"


def test_wire_truncation_detected():
    msg = P.enc_field_len(2, b"hello")
    with pytest.raises(ValueError):
        P.fields_dict(msg[:-2], 0, len(msg) - 2)


def test_packed_bulk_span_counting():
    rng = np.random.default_rng(7)
    segs = [rng.integers(0, 1 << 40, rng.integers(0, 9), dtype=np.int64).astype(np.uint64)
            for _ in range(50)]
    payloads = [P.enc_packed_uvarints(8, s) for s in segs]
    buf = b"".join(payloads)
    spans, pos = [], 0
    for p, s in zip(payloads, segs):
        if not p:
            spans.append((0, 0))
            continue
        fd = P.fields_dict(buf, pos, pos + len(p))
        spans.append(fd[8][0])
        pos += len(p)
    arr = np.frombuffer(buf, dtype=np.uint8)
    tc = np.cumsum(arr < 0x80)
    starts = np.asarray([a for a, _ in spans])
    ends = np.asarray([b for _, b in spans])
    counts = P.count_varints_per_span(tc, starts, ends)
    assert (counts == np.asarray([len(s) for s in segs])).all()
    from coords_spark.kernels import varint as V

    vals = V.decode_uvarints(P.concat_spans(buf, starts, ends))
    assert (vals == np.concatenate(segs)).all()


@pytest.fixture(scope="module")
def pbf_path(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("osmpbf")
    nodes, ways, rels = gen_nodes(4000), gen_ways(600, 4000), gen_relations(200)[0]
    p = str(d / "mini.osm.pbf")
    osmpbf.write_osmpbf(p, nodes=nodes, ways=ways, relations=rels, rows_per_block=512)
    pq.write_table(nodes, str(d / "nodes.parquet"))
    pq.write_table(ways, str(d / "ways.parquet"))
    pq.write_table(rels, str(d / "rels.parquet"))
    return p


def test_header_and_blob_index(pbf_path):
    hdr = osmpbf.read_header_block(pbf_path)
    assert "DenseNodes" in hdr["required_features"]
    assert hdr["writingprogram"] == "coords_spark"
    idx = osmpbf.scan_blob_index(pbf_path)
    kinds = [t for t, _, _ in idx]
    assert kinds[0] == "OSMHeader"
    # 4000/512 node blobs + 600/512 way blobs + 200/512 rel blobs: ONE file
    # yields many independently-decodable work units (the scale story)
    assert kinds.count("OSMData") == 8 + 2 + 1


def _rows(df, exprs, cols):
    return sorted(tuple(r) for r in df.selectExpr(*exprs).select(*cols).collect())


def test_spark_decode_nodes_byte_identical(spark, pbf_path):
    got = osmpbf.read_osmpbf(spark, pbf_path, osmpbf.KIND_NODES)
    want = spark.read.parquet(os.path.join(os.path.dirname(pbf_path), "nodes.parquet"))
    ex = ["id", "version", "lat", "lon", "to_json(tags) as t"]
    cols = ["id", "version", "lat", "lon", "t"]
    assert _rows(got, ex, cols) == _rows(want, ex, cols)
    assert got.count() == 4000


def test_spark_decode_ways_byte_identical(spark, pbf_path):
    got = osmpbf.read_osmpbf(spark, pbf_path, osmpbf.KIND_WAYS)
    want = spark.read.parquet(os.path.join(os.path.dirname(pbf_path), "ways.parquet"))
    ex = ["id", "version", "to_json(refs) as r", "to_json(tags) as t"]
    cols = ["id", "version", "r", "t"]
    assert _rows(got, ex, cols) == _rows(want, ex, cols)


def test_spark_decode_relations_byte_identical(spark, pbf_path):
    got = osmpbf.read_osmpbf(spark, pbf_path, osmpbf.KIND_RELATIONS)
    want = spark.read.parquet(os.path.join(os.path.dirname(pbf_path), "rels.parquet"))
    ex = ["id", "version", "to_json(members) as m", "to_json(tags) as t"]
    cols = ["id", "version", "m", "t"]
    assert _rows(got, ex, cols) == _rows(want, ex, cols)


def test_plain_nodes_group_decoded(tmp_path):
    """Spec-legal non-dense Node messages must decode too (hand-built
    group, since our writer always emits DenseNodes)."""
    table = osmpbf._stringtable([b"highway", b"stop"])
    node = (
        P.enc_field_sint64(1, 42)
        + P.enc_packed_uvarints(2, np.asarray([1], dtype=np.uint64))
        + P.enc_packed_uvarints(3, np.asarray([2], dtype=np.uint64))
        + P.enc_field_len(4, P.enc_field_varint(1, 3))
        + P.enc_field_sint64(8, 515000000)
        + P.enc_field_sint64(9, -1000)
    )
    block = (
        P.enc_field_len(1, table)
        + P.enc_field_len(2, P.enc_field_len(1, node))
        + P.enc_field_varint(17, 100)
    )
    batches = list(osmpbf.decode_primitive_block(block, osmpbf.KIND_NODES))
    assert len(batches) == 1
    row = batches[0].to_pylist()[0]
    assert row["id"] == 42 and row["version"] == 3
    assert row["lat"] == 515000000 and row["lon"] == -1000
    assert row["tags"] == [("highway", "stop")]


def test_granularity_and_offsets_applied():
    """granularity=1000 + offsets: decoded i32 units are nanodeg // 100."""
    nodes = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            "version": pa.array([1], pa.int32()),
            "lat": pa.array([7], pa.int32()),
            "lon": pa.array([-3], pa.int32()),
            "tags": pa.array([[]], pa.map_(pa.string(), pa.string())),
        }
    )
    # hand-encode a dense block with granularity 1000 and lat_offset 500
    from coords_spark.kernels import varint as V

    dense = (
        P.enc_packed_sint64(1, np.asarray([1]))
        + P.enc_packed_sint64(8, np.asarray([7]))
        + P.enc_packed_sint64(9, np.asarray([-3]))
    )
    block = (
        P.enc_field_len(1, osmpbf._stringtable([]))
        + P.enc_field_len(2, P.enc_field_len(2, dense))
        + P.enc_field_varint(17, 1000)
        + P.enc_field_varint(19, 500)
    )
    row = list(osmpbf.decode_primitive_block(block, osmpbf.KIND_NODES))[0].to_pylist()[0]
    assert row["lat"] == (500 + 1000 * 7) // 100
    assert row["lon"] == (1000 * -3) // 100
    assert row["version"] == -1  # no denseinfo -> spec default


def test_truncated_file_rejected(pbf_path, tmp_path):
    data = open(pbf_path, "rb").read()
    p = tmp_path / "trunc.osm.pbf"
    p.write_bytes(data[: len(data) - 10])
    with pytest.raises(ValueError, match="truncated pbf"):
        osmpbf.scan_blob_index(str(p))


def test_raw_uncompressed_blob_supported(tmp_path):
    """Blob.raw (f1) is spec-legal; the reader must accept it."""
    nodes = gen_nodes(10)
    block = osmpbf._dense_group(nodes, 0, 10)
    body = P.enc_field_len(1, block)
    hdr = P.enc_field_len(1, b"OSMData") + P.enc_field_varint(3, len(body))
    p = tmp_path / "raw.osm.pbf"
    p.write_bytes(struct.pack(">I", len(hdr)) + hdr + body)
    idx = osmpbf.scan_blob_index(str(p))
    with open(p, "rb") as f:
        f.seek(idx[0][1])
        data = osmpbf.decode_blob(f.read(idx[0][2]))
    got = list(osmpbf.decode_primitive_block(data, osmpbf.KIND_NODES))[0]
    assert got.num_rows == 10


def test_streaming_osmpbf_matches_batch(spark, pbf_path, tmp_path):
    """read_osmpbf_stream over a dropped .osm.pbf file must yield exactly
    the batch reader's rows (memory-sink drain)."""
    import shutil

    d = tmp_path / "drop"
    d.mkdir()
    shutil.copy(pbf_path, d / "mini.osm.pbf")
    stream = osmpbf.read_osmpbf_stream(spark, str(d), osmpbf.KIND_WAYS)
    q = (
        stream.writeStream.format("memory")
        .queryName("pbf_ways_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    ex = ["id", "version", "to_json(refs) as r", "to_json(tags) as t"]
    cols = ["id", "version", "r", "t"]
    got = _rows(spark.table("pbf_ways_stream"), ex, cols)
    want = _rows(osmpbf.read_osmpbf(spark, pbf_path, osmpbf.KIND_WAYS), ex, cols)
    assert got == want and len(got) == 600


def test_streaming_planet_ingest_from_real_pbf(spark, tmp_path):
    """The full loop the reference runs: a REAL .osm.pbf drop streamed
    into the exactly-once icepick ingest (read_osmpbf_stream ->
    stream_ingest_nodes), chunk assignments equal to the batch path."""
    from pyspark.sql import functions as F

    from coords_spark.operators import knn as K
    from coords_spark.operators import tiling as T
    from coords_spark.sources.icepick import IcepickTable
    from coords_spark.streaming import ingest_stream as S

    nodes = gen_nodes(1000)
    src = tmp_path / "drop"
    src.mkdir()
    osmpbf.write_osmpbf(str(src / "a.osm.pbf"), nodes=nodes, rows_per_block=128)
    out, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")

    batch = spark.createDataFrame(nodes.to_pandas()[["id", "lat", "lon"]])
    pts = batch.withColumn("cell", K.cell_at_level_col(8)).withColumn(
        "nbytes", F.lit(4096).cast("long")
    )
    split = T.compute_split_set(pts, max_bytes=256 * 1024, base_level=8)
    q = S.stream_ingest_nodes(
        osmpbf.read_osmpbf_stream(spark, str(src), osmpbf.KIND_NODES), out, split, 8, ckpt
    )
    q.processAllAvailable(); q.stop()
    t = IcepickTable(out)
    got = {
        r["id"]: r["chunk_id"]
        for r in spark.read.parquet(*t.data_paths()).select("id", "chunk_id").collect()
    }
    want = {
        r["id"]: r["chunk_id"]
        for r in T.with_chunk(pts, split, base_level=8).select("id", "chunk_id").collect()
    }
    assert got == want and len(got) == 1000


def test_distributed_index_scan_matches_driver_side(spark, tmp_path):
    """Above the file-count threshold the blob-index scan distributes as a
    Spark job; rows must be identical to the driver-side path."""
    d = tmp_path / "many"
    d.mkdir()
    for i in range(6):
        osmpbf.write_osmpbf(
            str(d / f"x{i}.osm.pbf"), nodes=gen_nodes(200), rows_per_block=64
        )
    ex = ["id", "version", "lat", "lon"]
    a = _rows(osmpbf.read_osmpbf(spark, str(d), osmpbf.KIND_NODES,
                                 index_scan_spark_threshold=2), ex, ex)
    b = _rows(osmpbf.read_osmpbf(spark, str(d), osmpbf.KIND_NODES,
                                 index_scan_spark_threshold=1000), ex, ex)
    assert a == b and len(a) == 1200
    # BYTE-count routing (VERDICT r5 ask #8): few big-ish files must also
    # distribute — file count below threshold, total bytes above the bound
    c = _rows(osmpbf.read_osmpbf(spark, str(d), osmpbf.KIND_NODES,
                                 index_scan_spark_threshold=1000,
                                 index_scan_spark_bytes=1), ex, ex)
    assert c == b
    # a SINGLE file always scans driver-side, whatever its size
    one = _rows(osmpbf.read_osmpbf(spark, str(d / "x0.osm.pbf"),
                                   osmpbf.KIND_NODES,
                                   index_scan_spark_bytes=1), ex, ex)
    assert len(one) == 200


def test_split_packed_fields_concatenated():
    """A packed field emitted as SEVERAL length-delimited occurrences is
    spec-legal; the decoder must concatenate them in byte order — in the
    vectorized way/relation walk AND the scalar fields_dict path."""
    table = osmpbf._stringtable([b"highway", b"primary", b"name", b"A1"])
    # way 7: refs [100, 101, 105] delta-coded then SPLIT [100,1] + [5];
    # keys/vals split 1+1 each. way 8 unsplit, to pin per-message grouping.
    w1 = (
        P.enc_field_varint(1, 7)
        + P.enc_packed_uvarints(2, np.asarray([1], dtype=np.uint64))
        + P.enc_packed_uvarints(3, np.asarray([2], dtype=np.uint64))
        + P.enc_packed_sint64(8, np.asarray([100, 1], dtype=np.int64))
        + P.enc_packed_uvarints(2, np.asarray([3], dtype=np.uint64))
        + P.enc_packed_uvarints(3, np.asarray([4], dtype=np.uint64))
        + P.enc_packed_sint64(8, np.asarray([5], dtype=np.int64))
    )
    w2 = (
        P.enc_field_varint(1, 8)
        + P.enc_packed_sint64(8, np.asarray([200, -1], dtype=np.int64))
    )
    block = P.enc_field_len(1, table) + P.enc_field_len(
        2, P.enc_field_len(3, w1) + P.enc_field_len(3, w2)
    )
    rows = list(osmpbf.decode_primitive_block(block, osmpbf.KIND_WAYS))[0].to_pylist()
    assert rows[0]["id"] == 7
    assert rows[0]["refs"] == [100, 101, 106]
    assert rows[0]["tags"] == [("highway", "primary"), ("name", "A1")]
    assert rows[1]["id"] == 8 and rows[1]["refs"] == [200, 199]

    # scalar path: plain Node with keys/vals each split across occurrences
    node = (
        P.enc_field_sint64(1, 5)
        + P.enc_packed_uvarints(2, np.asarray([1], dtype=np.uint64))
        + P.enc_packed_uvarints(3, np.asarray([2], dtype=np.uint64))
        + P.enc_packed_uvarints(2, np.asarray([3], dtype=np.uint64))
        + P.enc_packed_uvarints(3, np.asarray([4], dtype=np.uint64))
        + P.enc_field_sint64(8, 10)
        + P.enc_field_sint64(9, 20)
    )
    nblock = P.enc_field_len(1, table) + P.enc_field_len(
        2, P.enc_field_len(1, node)
    ) + P.enc_field_varint(17, 100)
    nrow = list(osmpbf.decode_primitive_block(nblock, osmpbf.KIND_NODES))[0].to_pylist()[0]
    assert nrow["tags"] == [("highway", "primary"), ("name", "A1")]


def test_split_info_occurrences_merged():
    """A spec-legal writer may split a singular embedded message (Way.info)
    across several length-delimited occurrences; embedded-message merge
    semantics require field-wise merging, so a version carried only by the
    FIRST occurrence must survive a later version-less occurrence
    (ADVICE r6 — last-occurrence-wins would drop it)."""
    table = osmpbf._stringtable([])
    way = (
        P.enc_field_varint(1, 7)
        # first Info occurrence carries version=5
        + P.enc_field_len(4, P.enc_field_varint(1, 5))
        # second occurrence carries only a timestamp (field 2) — merged
        # message keeps version=5; last-wins would reset it to absent
        + P.enc_field_len(4, P.enc_field_varint(2, 1234567))
        + P.enc_packed_sint64(8, V.delta_encode(np.asarray([1, 2], dtype=np.int64)))
    )
    block = (
        P.enc_field_len(1, table)
        + P.enc_field_len(2, P.enc_field_len(3, way))
        + P.enc_field_varint(17, 100)
    )
    rows = []
    for b in osmpbf.decode_primitive_block(block, osmpbf.KIND_WAYS):
        rows += b.to_pylist()
    assert len(rows) == 1
    assert rows[0]["id"] == 7 and rows[0]["version"] == 5
    assert rows[0]["refs"] == [1, 2]


def test_split_info_later_version_wins():
    """When BOTH occurrences carry a version, the later one overrides —
    exactly proto's scalar-field merge rule."""
    table = osmpbf._stringtable([])
    way = (
        P.enc_field_varint(1, 8)
        + P.enc_field_len(4, P.enc_field_varint(1, 5))
        + P.enc_field_len(4, P.enc_field_varint(1, 9))
        + P.enc_packed_sint64(8, V.delta_encode(np.asarray([3], dtype=np.int64)))
    )
    block = (
        P.enc_field_len(1, table)
        + P.enc_field_len(2, P.enc_field_len(3, way))
        + P.enc_field_varint(17, 100)
    )
    rows = []
    for b in osmpbf.decode_primitive_block(block, osmpbf.KIND_WAYS):
        rows += b.to_pylist()
    assert rows[0]["version"] == 9
