"""osmChange front door (sources/osc.py): the writer/parser must be exact
inverses on the shared diff fixture, coordinates must survive the 1e-7
integer grid exactly (string math, no float), and the Spark batch +
streaming readers must deliver DIFF_SCHEMA rows one interval per batch."""

import glob
import gzip
import os

from coords_spark.fixtures import gen_update_diffs, gen_update_world
from coords_spark.sources import osc


def _fixture_rows():
    b1, b2 = gen_update_diffs(*gen_update_world(10))
    return b1, b2


def test_coord_string_math():
    assert osc._coord_to_i7("51.5074") == 515074000
    assert osc._coord_to_i7("-0.1278") == -1278000
    assert osc._coord_to_i7("7") == 70000000
    assert osc._coord_to_i7("+1.5") == 15000000
    assert osc._coord_to_i7("-33.87000004") == -338700000  # >7 digits truncate
    for v in (515074000, -1278000, 0, -10_000_000, 7):
        assert osc._coord_to_i7(osc._i7_to_coord(v)) == v


def test_write_parse_roundtrip(tmp_path):
    b1, b2 = _fixture_rows()
    rows = b1 + b2
    p = str(tmp_path / "a.osc")
    osc.write_osc(p, rows)
    back = osc.parse_osc_bytes(open(p, "rb").read())
    assert len(back) == len(rows)
    for got, want in zip(back, rows):
        kind, action = want[0], want[1]
        assert got[:4] == tuple(want[:4])
        if action == "delete":
            assert got[4:] == (None, None, None, None, None)
        elif kind == 0:
            assert got[4] == want[4] and got[5] == want[5] and got[8] == (want[8] or {})
        elif kind == 1:
            assert got[6] == list(want[6]) and got[8] == (want[8] or {})
        else:
            assert got[7] == [tuple(m) for m in want[7]]


def test_gzip_deterministic(tmp_path):
    b1, _ = _fixture_rows()
    p1, p2 = str(tmp_path / "a.osc.gz"), str(tmp_path / "b.osc.gz")
    osc.write_osc(p1, b1)
    osc.write_osc(p2, b1)
    raw1, raw2 = open(p1, "rb").read(), open(p2, "rb").read()
    assert raw1 == raw2  # mtime=0 -> byte-deterministic
    assert raw1[:2] == b"\x1f\x8b"
    assert osc.parse_osc_bytes(raw1) == osc.parse_osc_bytes(gzip.decompress(raw2))


def test_escaping_roundtrip(tmp_path):
    rows = [
        (2, "upsert", 9, 1, None, None, None,
         [(1, 5, 'outer "x" & <y>')], {"na<me>": 'va"l&ue'}),
    ]
    p = str(tmp_path / "esc.osc")
    osc.write_osc(p, rows)
    back = osc.parse_osc_bytes(open(p, "rb").read())
    assert back[0][7] == [(1, 5, 'outer "x" & <y>')]
    assert back[0][8] == {"na<me>": 'va"l&ue'}


def _norm(r):
    members = r[7]
    if members is not None:
        members = [
            (m["mtype"], m["ref"], m["role"]) if isinstance(m, dict) else tuple(m)
            for m in members
        ]
    # XML has no none-vs-empty tags distinction: upserts normalize to {}
    tags = r[8] if (r[8] is not None or r[1] == "delete") else {}
    return (r[0], r[1], r[2], r[3], r[4], r[5],
            None if r[6] is None else tuple(r[6]), members,
            None if tags is None else tuple(sorted(tags.items())))


def test_spark_batch_read(spark, tmp_path):
    b1, b2 = _fixture_rows()
    d = str(tmp_path / "diffs")
    os.makedirs(d)
    osc.write_osc(f"{d}/000001.osc.gz", b1)
    osc.write_osc(f"{d}/000002.osc", b2)
    got = sorted(_norm(tuple(r)) for r in osc.read_osc(spark, d).collect())
    want = sorted(
        _norm((k, a, i, v, la, lo, rf, mm, tg))
        for k, a, i, v, la, lo, rf, mm, tg in b1 + b2
    )
    assert got == want


def test_stream_one_interval_per_batch(spark, tmp_path):
    b1, b2 = _fixture_rows()
    d = str(tmp_path / "stream")
    os.makedirs(d)
    for i, b in enumerate((b1, b2)):
        p = f"{d}/{i:06d}.osc.gz"
        osc.write_osc(p, b)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    seen: dict[int, list] = {}

    def sink(batch_df, batch_id):
        seen[batch_id] = sorted(_norm(tuple(r)) for r in batch_df.collect())

    q = (
        osc.stream_osc_diffs(spark, d)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(seen) == 2
    want = [
        sorted(_norm((k, a, i, v, la, lo, rf, mm, tg)) for k, a, i, v, la, lo, rf, mm, tg in b)
        for b in (b1, b2)
    ]
    assert sorted(seen.keys()) == [0, 1]
    assert [seen[0], seen[1]] == want

    # leftover glob guard: nothing else writes into the source dir
    assert len(glob.glob(f"{d}/*")) == 2


def test_non_osc_sidecars_ignored(spark, tmp_path):
    """Real replication dirs carry state.txt beside the diffs; the readers
    must glob *.osc* only instead of crashing on non-XML payloads
    (ADVICE r6)."""
    b1, b2 = _fixture_rows()
    d = str(tmp_path / "diffs")
    os.makedirs(d)
    osc.write_osc(f"{d}/000001.osc.gz", b1)
    osc.write_osc(f"{d}/000002.osc", b2)
    with open(f"{d}/state.txt", "w") as f:
        f.write("sequenceNumber=2\ntimestamp=2026-01-01T00\\:00\\:00Z\n")
    got = sorted(_norm(tuple(r)) for r in osc.read_osc(spark, d).collect())
    want = sorted(
        _norm((k, a, i, v, la, lo, rf, mm, tg))
        for k, a, i, v, la, lo, rf, mm, tg in b1 + b2
    )
    assert got == want
