"""XXH64 kernel parity with Spark SQL's xxhash64 (seed 42, argument
chaining) — the kernel lets tools/gen_goldens.py derive phash/anchor
inputs without a Spark session."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from coords_spark.kernels import xxh64

LONGS = [0, 1, -1, 42, 2**62, -(2**62), 123456789012345, -987654321]
STRINGS = [
    "",
    "a",
    "hello",
    "x" * 31,
    "y" * 32,
    "z" * 33,
    "w" * 100,
    "the quick brown fox jumps over the lazy dog and keeps going for a while",
]


def test_hash_long_parity(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], "v long").select(
        "v", F.xxhash64("v").alias("h")
    )
    got = {r["v"]: r["h"] for r in df.collect()}
    assert {v: xxh64.hash_long(v) for v in LONGS} == got
    arr = np.array(LONGS, dtype=np.int64)
    assert [int(x) for x in xxh64.hash_long(arr)] == [got[v] for v in LONGS]


def test_hash_bytes_parity(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    assert {s: xxh64.hash_bytes(s.encode()) for s in STRINGS} == got


def test_multiarg_chaining_parity(spark):
    rows = [("3", "foo bar baz"), ("0", ""), ("17", "x y z")]
    df = spark.createDataFrame(rows, "a string, b string").select(
        "a", "b", F.xxhash64("a", "b").alias("h")
    )
    for r in df.collect():
        assert r["h"] == xxh64.spark_xxhash64_str(r["a"], r["b"])


def test_hash_int_parity(spark):
    df = spark.createDataFrame([(7,), (-7,), (0,)], "v int").select(
        "v", F.xxhash64("v").alias("h")
    )
    for r in df.collect():
        assert r["h"] == xxh64.hash_int(r["v"])


def test_deterministic_no_spark():
    # pinned values so the kernel is testable without a JVM at all
    assert xxh64.hash_long(42) == xxh64.hash_long(np.int64(42))
    assert xxh64.hash_bytes(b"abc") != xxh64.hash_bytes(b"abd")
    assert xxh64.hash_bytes(b"", seed=0) != xxh64.hash_bytes(b"", seed=1)


def test_randomized_parity(spark):
    """200 random strings + longs (seeded) against F.xxhash64 in one shot."""
    import random

    rnd = random.Random(1234)
    strs = [
        "".join(chr(rnd.randint(32, 0x2FF)) for _ in range(rnd.randint(0, 120)))
        for _ in range(200)
    ]
    longs = [rnd.randint(-(2**63), 2**63 - 1) for _ in range(200)]
    df = spark.createDataFrame(
        list(zip(strs, longs)), "s string, v long"
    ).select("s", "v", F.xxhash64("s").alias("hs"), F.xxhash64("v").alias("hv"),
             F.xxhash64("s", "v").alias("hsv"))
    for r in df.collect():
        assert r["hs"] == xxh64.hash_bytes(r["s"].encode("utf-8"))
        assert r["hv"] == xxh64.hash_long(r["v"])
        seed = xxh64.hash_bytes(r["s"].encode("utf-8")) & 0xFFFFFFFFFFFFFFFF
        assert r["hsv"] == xxh64.hash_long(r["v"], seed=seed)
