"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only 'state' is the processed-documents ledger; this
module provides the general-purpose stateful primitive a streaming corpus
feed needs: per-key running aggregates with explicit state schema and
timeout-based eviction — e.g. per-host crawl accounting (pages seen, bytes,
failure counts) maintained incrementally as page batches stream in.

Pattern notes (the part worth copying):
- state is a single-row tuple matching ``state_schema``; GroupState.update
  replaces it wholesale
- on ProcessingTimeTimeout expiry the operator EMITS the final row and
  drops state — bounded memory under unbounded key cardinality
- output rows are emitted per trigger (update semantics), so downstream
  sinks see monotone per-key progress
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOST_STATS_OUTPUT_SCHEMA = (
    "host string, n_pages long, n_bytes long, n_failures long, "
    "closed boolean"
)
HOST_STATS_STATE_SCHEMA = "n_pages long, n_bytes long, n_failures long"


def streaming_host_stats(docs_stream, timeout_ms: int = 60_000):
    """docs stream (host, n_bytes, failure_code) → stateful per-host
    counters. ``docs_stream`` must already carry a ``host`` column.

    ``timeout_ms``: idle eviction horizon. NOTE: under
    Trigger.AvailableNow the query keeps running empty micro-batches
    until every pending timer fires ("cleaning up state"), so drain-style
    jobs should pass a short timeout.

    The state function is a local closure on purpose: cloudpickle ships
    closures by VALUE to the python workers, while module-level functions
    pickle by reference and require the package on every worker's
    PYTHONPATH (true under spark-submit --py-files, not guaranteed in
    arbitrary driver sessions).
    """
    def host_stats_func(key: Tuple[Any, ...],
                        pdfs: Iterable[pd.DataFrame],
                        state: GroupState) -> Iterable[pd.DataFrame]:
        (host,) = key
        if state.hasTimedOut:
            n_pages, n_bytes, n_failures = state.get
            state.remove()
            yield pd.DataFrame([{
                "host": host, "n_pages": n_pages, "n_bytes": n_bytes,
                "n_failures": n_failures, "closed": True}])
            return
        n_pages, n_bytes, n_failures = (state.get if state.exists
                                        else (0, 0, 0))
        for pdf in pdfs:
            n_pages += len(pdf)
            n_bytes += int(pdf["n_bytes"].sum())
            n_failures += int((pdf["failure_code"] != "").sum())
        state.update((n_pages, n_bytes, n_failures))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame([{
            "host": host, "n_pages": n_pages, "n_bytes": n_bytes,
            "n_failures": n_failures, "closed": False}])

    return (docs_stream
            .groupBy("host")
            .applyInPandasWithState(
                host_stats_func,
                outputStructType=HOST_STATS_OUTPUT_SCHEMA,
                stateStructType=HOST_STATS_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


__all__ = ["streaming_host_stats", "HOST_STATS_OUTPUT_SCHEMA",
           "HOST_STATS_STATE_SCHEMA"]
