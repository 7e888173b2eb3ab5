"""Pure-numpy kernels (no Spark imports).

Each module is a standalone, vectorized implementation of one COORDS
capability (SURVEY.md §2): zcurve (T2/T4 cell algebra), mercator (T1),
pip (J4 ray-cast), codec (image payload, input_hint), phash (blockhash +
geo anchor), simplify (T7 Douglas-Peucker), geomblob (GenericGeometry-style
serialization).
"""
