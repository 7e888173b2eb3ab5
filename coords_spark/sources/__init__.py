"""Sources & sinks: the "icepick" Iceberg-style table layer (parquet data
files + JSON manifests with per-file lineage: chunk range, row count,
checksum; atomic commits; kill-safe resume; chunk-range file pruning).
"""

from coords_spark.sources.icepick import IcepickTable  # noqa: F401
