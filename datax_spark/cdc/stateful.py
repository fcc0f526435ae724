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
size is O(live keys) × ~16 bytes; with GroupStateTimeout it can be
bounded to recently-active keys.

The per-batch kernel is numpy-vectorized (no per-row Python): events
sort by lsn (binlog replay order), timestamps become int64 nanoseconds
(pandas NaT maps to INT64_MIN, so null-ts events lose deterministically
against any real timestamp instead of crashing — they can only advance
a key that has never seen a real ts), and the advancing subset falls
out of a prefix-max over the ts array. Because lsn is strictly
increasing within the sorted batch, a row advances iff its ts strictly
exceeds the running max, OR ties it where the max was already achieved
by an earlier batch row (its lsn is then automatically higher), OR ties
a state-only max with a higher lsn than the state's.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# int64 epoch-nanos + lsn — exact (no float truncation of microseconds).
# NB: state-schema v2 (round 1 stored float seconds); Spark's state store
# pins the schema per checkpoint, so round-1 checkpoints of THIS operator
# must be restarted fresh (the merge stale guard makes the replay
# convergent — same story as a fence-epoch reset).
STATE_SCHEMA = "max_ts_ns long, max_lsn long"

_TS_MIN = np.iinfo(np.int64).min  # == pandas NaT's int64 value


def _advance_kernel(
    pdf: pd.DataFrame, state_ts: int, state_lsn: int
) -> tuple[np.ndarray, int, int]:
    """Vectorized LWW advance over one key-group batch.

    Returns (keep_mask over the lsn-sorted frame, new_state_ts_ns,
    new_state_lsn). ``pdf`` must already be sorted by lsn ascending.
    """
    ts = pdf["warc_ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64)
    lsn = pdf["lsn"].to_numpy(dtype=np.int64)
    # running max of ts over [state] + rows[:i]  (i.e. BEFORE row i)
    prev = np.maximum.accumulate(np.concatenate(([state_ts], ts)))[:-1]
    strictly = ts > prev
    ties = ts == prev
    # On a ts tie with the running max: if the max ts differs from the
    # state's, it was achieved by an earlier batch row whose lsn is
    # necessarily smaller (lsn-sorted) → advance. If it equals the
    # state's ts, the binding lsn is the state's (any earlier batch row
    # at that ts has a smaller lsn than ours) → need lsn > state_lsn.
    keep = strictly | (ties & ((prev != state_ts) | (lsn > state_lsn)))
    if keep.any():
        new_ts = int(max(state_ts, ts.max()))
        cand = lsn[ts == new_ts]
        new_lsn = int(cand.max()) if cand.size else state_lsn
        if new_ts == state_ts:
            new_lsn = max(new_lsn, state_lsn)
    else:
        new_ts, new_lsn = state_ts, state_lsn
    return keep, new_ts, new_lsn


def _make_advance(ttl_ms: int | None):
    def _advance(
        key,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # idle key expired: drop its high-water mark. Expiry only
            # RELAXES the filter (a late event for this key passes to the
            # merge, whose cross-batch stale guard still rejects it), so
            # bounding state never breaks convergence.
            state.remove()
            return
        if state.exists:
            max_ts, max_lsn = state.get
        else:
            max_ts, max_lsn = _TS_MIN, -1
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("lsn")  # binlog replay order
            keep, max_ts, max_lsn = _advance_kernel(pdf, max_ts, max_lsn)
            if keep.any():
                yield pdf[keep]
        state.update((int(max_ts), int(max_lsn)))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return _advance


def lww_advance_filter(
    changes: DataFrame,
    key_col: str = "url",
    output_schema: T.StructType | None = None,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Keep only events that advance their key's (warc_ts, lsn) state.

    Works on a streaming DataFrame (state persists in the checkpoint
    across micro-batches — survives restarts) and, for testing, on a
    batch DataFrame via groupBy().applyInPandas with empty prior state.

    ``state_ttl_ms`` bounds state to recently-active keys (processing
    -time timeout): at web scale the live-key set is ~10^9 urls × 16 B,
    but only the actively-changing tail needs a high-water mark — an
    expired key's late events fall through to the merge stale guard.
    """
    schema = output_schema or changes.schema
    if changes.isStreaming:
        return changes.groupBy(key_col).applyInPandasWithState(
            _make_advance(state_ttl_ms),
            outputStructType=schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if state_ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("lsn")
        keep, _, _ = _advance_kernel(pdf, _TS_MIN, -1)
        return pdf[keep]

    return changes.groupBy(key_col).applyInPandas(batch_fn, schema)
