"""datax_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimagining of alibaba/DataX's reader→transformer→writer
pipeline as a Spark-first engine: a binlog/WAL-style change-event tail
(insert/update/delete with LSN ordering) is consumed via Structured
Streaming, deduplicated last-writer-wins on ``(warc_ts, lsn)``, and applied
as key-partitioned MERGE upserts into a snapshot-versioned lake table
(Iceberg-style format implemented here on parquet — no external lake JARs),
with schema evolution, exactly-once batch-id fencing, per-batch lineage
metrics, and dirty-record quarantine.

Reference semantics (NOT code) derive from alibaba/DataX @ /root/reference;
each module docstring cites the reference file:line whose behavior it
re-expresses Spark-first.
"""

__version__ = "0.1.0"

from datax_spark.session import get_spark  # noqa: F401
