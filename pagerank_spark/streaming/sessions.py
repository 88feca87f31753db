"""Custom stateful streaming operator: gap-based sessionization.

The engine's demonstration of ``applyInPandasWithState`` — arbitrary
per-key state kept by the Spark state store across micro-batches, with
the per-batch work vectorized in pandas (no per-row Python beyond the
group loop Spark itself drives). A session is a maximal run of events
for one user with no gap larger than ``gap``; closed sessions are
emitted, the open tail is carried in state to the next micro-batch.

This is pure extension surface: the C reference is batch-only
(SURVEY.md §2.2 — no streaming constructs exist in it).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"

_US = 1_000_000  # timestamps carried in state as microseconds


def _sessionize_fn(gap_us: int):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            cur_start, cur_last, cur_n, cur_total = state.get
        else:
            cur_start = cur_last = None
            cur_n, cur_total = 0, 0.0
        closed = []
        # Chunks from the iterator are NOT globally time-ordered — a key
        # with more rows than one Arrow batch arrives as several chunks.
        # Concatenate and sort ONCE per micro-batch before folding.
        # Cross-micro-batch late data (t before the open session carried
        # in state): events within the gap of the open session extend it
        # (in both directions); events MORE than a gap older cannot
        # belong to it and are folded into their own immediately-closed
        # late session(s) — bounded state, deterministic output.
        late = None  # [start, last, n, total] of the pre-open-session run
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = pd.concat(frames, ignore_index=True).sort_values("ts")
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            vals = pdf["value"].to_numpy()
            for t_raw, v_raw in zip(ts_us.to_numpy(), vals):
                t, v = int(t_raw), float(v_raw)
                if cur_start is None:
                    cur_start, cur_last, cur_n, cur_total = t, t, 1, v
                elif t < cur_start - gap_us:
                    if late is None:
                        late = [t, t, 1, v]
                    elif t - late[1] > gap_us:
                        closed.append(tuple(late))
                        late = [t, t, 1, v]
                    else:
                        late[1] = max(late[1], t)
                        late[2] += 1
                        late[3] += v
                elif t - cur_last > gap_us:
                    closed.append((cur_start, cur_last, cur_n, cur_total))
                    cur_start, cur_last, cur_n, cur_total = t, t, 1, v
                else:
                    cur_start = min(cur_start, t)
                    cur_last = max(cur_last, t)
                    cur_n += 1
                    cur_total += v
        if late is not None:
            closed.append(tuple(late))
        if cur_start is not None:
            state.update((cur_start, cur_last, cur_n, cur_total))
        if closed:
            out = pd.DataFrame(
                closed, columns=["start", "last", "n", "total"]
            )
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "session_start": pd.to_datetime(out["start"], unit="us"),
                    "session_end": pd.to_datetime(out["last"], unit="us"),
                    "n_events": out["n"].astype("int64"),
                    "total_value": out["total"].round(6),
                }
            )

    return fn


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Closed sessions per user; open sessions persist in state.

    Works on a streaming DataFrame (the intended use) and equally on a
    batch DataFrame re-read as a stream for testing.
    """
    gap_us = gap_minutes * 60 * _US
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_us),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
