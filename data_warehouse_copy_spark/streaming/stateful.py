"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming surface at all (SURVEY.md §2.1); this is the
extension-path demo of arbitrary stateful processing: a per-user running
profile (event count, decimal-stable value total, last-seen timestamp) that
survives across micro-batches in the state store and emits one updated row
per user per batch.

Scale shape: state is partitioned by the grouping key across executors
(shuffle on user_id once per batch), each key's state is O(1) — the pattern
holds for billions of keys with RocksDB state store; the Arrow batch hands
the whole per-key group to pandas at once.
"""

from __future__ import annotations

import pandas

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
STATE_SCHEMA = "n bigint, total double, last_ts timestamp"


def _accumulate_profile(n, total, last_ts, pdf_iter):
    """The ONE accumulation loop both stateful APIs run — extracting it is
    what makes the applyInPandasWithState and transformWithStateInPandas
    paths interchangeable by construction, not by parallel maintenance."""
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or batch_max > last_ts:
            last_ts = batch_max
    return n, total, last_ts


def _profile_row(user_id, n, total, last_ts):
    return pandas.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [last_ts],
        }
    )


def _update_user_profile(key, pdf_iter, state: GroupState):
    (user_id,) = key
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    n, total, last_ts = _accumulate_profile(n, total, last_ts, pdf_iter)
    state.update((n, total, last_ts))
    yield _profile_row(user_id, n, total, last_ts)


def running_user_profile(events: DataFrame) -> DataFrame:
    """Apply the stateful per-user profile to a streaming events frame:
    one output row per user per micro-batch containing the running totals
    (use ``outputMode("update")``). Streaming-only — Spark rejects
    ``applyInPandasWithState`` on batch frames; the batch equivalent is a
    plain groupBy aggregate (asserted equal in the tests).
    """
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas twin — the successor stateful API
# (typed state handles, timers, TTL) behind the SAME profile semantics.
# --------------------------------------------------------------------------

try:  # Spark >= 4.0 only; gate so the module imports under older runtimes
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _UserProfileProcessor(StatefulProcessor):
        """Per-user running profile on a typed ValueState handle. One
        handle read/update per key per batch; state layout identical to
        the applyInPandasWithState twin, so the two paths are
        semantically interchangeable (asserted equal in tests)."""

        def init(self, handle: "StatefulProcessorHandle") -> None:
            self._profile = handle.getValueState("profile", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            n, total, last_ts = (
                self._profile.get() if self._profile.exists() else (0, 0.0, None)
            )
            n, total, last_ts = _accumulate_profile(n, total, last_ts, rows)
            self._profile.update((n, total, last_ts))
            yield _profile_row(user_id, n, total, last_ts)

        def close(self) -> None:
            pass

    def running_user_profile_tws(events: DataFrame) -> DataFrame:
        """The :func:`running_user_profile` semantics on Spark 4's
        ``transformWithStateInPandas`` — the successor API whose typed
        state handles add composable state variables, timers, and state
        TTL on the same shuffle-by-key execution shape. Streaming-only;
        ``outputMode("update")``.

        Runtime boundary (same honesty rule as the JPEG codec note in the
        README): executing this API needs the ``protobuf`` package (the
        state-server wire protocol), which this container does not ship —
        the equivalence test skips with that reason here and runs on any
        standard deployment; ``running_user_profile`` is the verified
        stateful path in this environment."""
        return (
            events.select("user_id", "ts", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_UserProfileProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover - exercised only on Spark < 4
    running_user_profile_tws = None
