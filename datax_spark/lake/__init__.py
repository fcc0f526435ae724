"""Snapshot-versioned lake table format on parquet (Iceberg-style, from scratch).

No Iceberg/Delta JARs are available in this environment, so the lake layer
the CDC engine merges into is implemented here: JSON metadata log with
atomic rename commits, bucket-partitioned parquet data files tracked by
per-snapshot manifests, copy-on-write MERGE limited to touched buckets,
schema evolution (add / widen), tombstoned deletes, and batch-id fencing
for exactly-once streaming sinks (the StarRocks/Doris stream-load *label*
pattern, reference
``starrockswriter/.../StarRocksStreamLoadVisitor.java:160-185``).
"""

from datax_spark.lake.table import LakeTable  # noqa: F401
from datax_spark.lake.schema import TableSchema, Field  # noqa: F401
