"""Custom stateful streaming operator: cross-batch LWW advance filter.

``applyInPandasWithState`` keeps per-key ``(warc_ts, lsn)`` high-water
marks across micro-batches and lets through only events that ADVANCE a
key's state — a streaming pre-filter in front of the MERGE that drops
stale/duplicate deliveries before they cost a bucket rewrite. This is
the engine's ``applyInPandasWithState`` surface (north-star "custom
stateful operators"); the reference's closest notion is the per-shard
``skipCount`` dedup on checkpoint resume
(``otsstreamreader/.../model/ShardCheckpoint.java:8-75``), which only
dedupes within one shard iterator — this operator dedupes across the
whole stream per key.

Note the MERGE itself stays idempotent without this (the stale guard in
``lake/merge.py``); the stateful filter is an optimization that turns
redundant deliveries into state lookups instead of merge work. State
size is O(live keys) × ~24 bytes; with GroupStateTimeout it can be
bounded to recently-active keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "max_ts double, max_lsn long"


def _advance(
    key,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        max_ts, max_lsn = state.get
    else:
        max_ts, max_lsn = float("-inf"), -1
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("lsn")  # binlog replay order
        ts_vals = pdf["warc_ts"].map(lambda t: t.timestamp())
        for row, ts in zip(pdf.itertuples(index=False), ts_vals):
            if (ts, row.lsn) > (max_ts, max_lsn):
                max_ts, max_lsn = ts, row.lsn
                out.append(row)
    state.update((max_ts, max_lsn))
    if out:
        yield pd.DataFrame(out)


def lww_advance_filter(
    changes: DataFrame,
    key_col: str = "url",
    output_schema: T.StructType | None = None,
) -> DataFrame:
    """Keep only events that advance their key's (warc_ts, lsn) state.

    Works on a streaming DataFrame (state persists in the checkpoint
    across micro-batches — survives restarts) and, for testing, on a
    batch DataFrame via groupBy().applyInPandas with empty prior state.
    """
    schema = output_schema or changes.schema
    if changes.isStreaming:
        return changes.groupBy(key_col).applyInPandasWithState(
            _advance,
            outputStructType=schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("lsn")  # binlog replay order
        keep, max_key = [], (float("-inf"), -1)
        for i, row in enumerate(pdf.itertuples(index=False)):
            k = (row.warc_ts.timestamp(), row.lsn)
            if k > max_key:
                max_key = k
                keep.append(i)
        return pdf.iloc[keep]

    return changes.groupBy(key_col).applyInPandas(batch_fn, schema)
