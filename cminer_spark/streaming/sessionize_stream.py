"""Streaming sessionization — the online twin of
:func:`cminer_spark.operators.temporal.sessionize`.

``applyInPandasWithState`` with one tiny state row per key
``(last_event_us, session_idx)``: each micro-batch's events for a key
are sorted, gap-flagged against the stored last event time, and
emitted in append mode with their session index — the per-event
labeling a downstream windowed aggregate or sink upsert can fold.

Batch parity: for per-key in-order delivery (the normal ingest case —
asserted stream-vs-batch in ``tests/test_streaming.py``) the emitted
``(key, event, session_idx)`` rows equal the batch operator's. An
event arriving LATE (older than the key's stored last event) cannot be
retro-sessionized under append semantics; it is clamped into the
CURRENT session (its backward gap is negative, hence never a session
break) — the documented bounded-state trade-off, mirroring
``dropDuplicatesWithinWatermark``'s.

State size: two int64s per active key, forever (no timeout by
default) — size with the key cardinality, not the event volume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id long, event_id long, ts_us long, session_idx long"
_STATE_SCHEMA = "last_us long, sess long"


def _make_kernel(gap_us: int):
    def _sessionize_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_us, sess = state.get if state.exists else (None, -1)
        # a key's micro-batch rows can arrive as SEVERAL Arrow chunks
        # in arbitrary post-shuffle order — concatenate and sort ONCE,
        # otherwise per-chunk sorting breaks the in-order batch-parity
        # contract (chunk 2 may hold timestamps older than chunk 1's)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            us = pdf["ts_us"].astype("int64")
            prev = us.shift(1)
            if last_us is None:
                first_new = True
            else:
                first_new = bool(us.iloc[0] - last_us > gap_us)
            is_new = (us - prev) > gap_us
            is_new.iloc[0] = first_new
            sess_idx = sess + is_new.astype("int64").cumsum()
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": pdf["event_id"].astype("int64"),
                    "ts_us": us,
                    "session_idx": sess_idx,
                }
            )
            # late events clamp: state time never goes backwards
            mx = int(us.iloc[-1])
            last_us = mx if last_us is None else max(last_us, mx)
            sess = int(sess_idx.iloc[-1])
        if last_us is not None:
            state.update((last_us, sess))

    return _sessionize_group


def stream_sessionize(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming per-user sessionization of an events stream
    ``(event_id, ts, user_id, ...)`` — appends
    ``(user_id, event_id, ts_us, session_idx)`` rows with 0-based
    session indexes per user, sessions split on gaps >
    ``gap_seconds``.
    """
    from cminer_spark.operators.temporal import _unix_micros
    from pyspark.sql import functions as F

    gap_us = int(gap_seconds) * 1_000_000
    return (
        events_stream.select(
            "user_id",
            "event_id",
            _unix_micros(F.col("ts")).alias("ts_us"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_kernel(gap_us),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
