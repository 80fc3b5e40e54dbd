"""Event-stream-shaped operators over the batch `events` table
(SURVEY §2.11 / ray_guide "streaming-shaped workloads").

Ray Data has no event-time windows; windowing is expressed as
``groupby(key).map_groups`` over ts-sorted groups.  Ordering assumption:
all events of a key fit one group (partitioned log); results are pure
functions of each key's event set, so they are parallelism-invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def sessionize(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 1_800_000_000,  # 30 min
) -> Dataset:
    """Gap-based session windows: consecutive events of a key belong to
    one session while inter-event gap < gap_us.

    Returns one row per session: (key, session_start ts µs, n_events,
    sum_value_cents).  Canonical SQL equivalent: lag + cumulative sum of
    gap-breaks over (key ORDER BY ts, event_id).
    """

    def per_key(group: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), ("event_id", "ascending")]
        )
        g = group.take(idx)
        ts = pa.compute.cast(g.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        vals = g.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
        breaks = np.empty(len(ts), dtype=np.int64)
        breaks[0] = 1
        breaks[1:] = (ts[1:] - ts[:-1] >= gap_us).astype(np.int64)
        sess = np.cumsum(breaks)
        starts = np.nonzero(breaks)[0]
        ends = np.append(starts[1:], len(ts))
        n_ev = ends - starts
        sums = np.add.reduceat(cents, starts)
        kval = g.column(key)[0].as_py()
        return pa.table(
            {
                key: pa.array([kval] * len(starts), type=g.schema.field(key).type),
                "session_start_us": pa.array(ts[starts], type=pa.int64()),
                "n_events": pa.array(n_ev, type=pa.int64()),
                "sum_value_cents": pa.array(sums, type=pa.int64()),
            }
        )

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")
