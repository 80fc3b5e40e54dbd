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
        group = group.drop_columns(["__gk"])
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

    from .aggregates import encoded_group_key

    keyed = ds.map_batches(
        lambda b: b.append_column("__gk", encoded_group_key(b, [key])),
        batch_format="pyarrow",
    )
    return keyed.groupby("__gk").map_groups(per_key, batch_format="pyarrow")


def running_total(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
) -> Dataset:
    """Per-key cumulative sum (SQL ``SUM(...) OVER (PARTITION BY key
    ORDER BY ts, tiebreak)``): one co-location groupby, numpy cumsum per
    sorted group.  Values accumulate as integer cents (frozen float
    policy).  Returns (key, tiebreak, running_cents)."""
    import pyarrow.compute as pc

    def per_key(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gk"])
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (order_tiebreak, "ascending")]
        )
        g = group.take(idx)
        vals = g.column(value_col).to_numpy(zero_copy_only=False)
        # SQL SUM OVER semantics: NULL values are skipped (not summed),
        # and rows before the first non-null value get a NULL total
        isnull = np.isnan(vals) if vals.dtype.kind == "f" else np.zeros(len(vals), bool)
        cents = np.floor(np.where(isnull, 0.0, vals) * 100.0 + 0.5).astype(np.int64)
        running = np.cumsum(cents)
        seen_any = np.cumsum(~isnull) > 0
        return pa.table(
            {
                key: g.column(key),
                order_tiebreak: g.column(order_tiebreak),
                "running_cents": pa.array(running, mask=~seen_any, type=pa.int64()),
            }
        )

    from .aggregates import encoded_group_key

    keyed = ds.map_batches(
        lambda b: b.append_column("__gk", encoded_group_key(b, [key])),
        batch_format="pyarrow",
    )
    return keyed.groupby("__gk").map_groups(per_key, batch_format="pyarrow")


def lag_gap(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    out_col: str = "gap_us",
    lead: bool = False,
) -> Dataset:
    """Per-key LAG window: µs since the key's previous event under the
    total order (ts, tiebreak) — SQL ``epoch_us(ts) - LAG(epoch_us(ts))
    OVER (PARTITION BY key ORDER BY ts, tiebreak)``.  The first event of
    a key gets NULL.  With ``lead=True`` the symmetric LEAD window: µs
    UNTIL the key's next event (``LEAD(epoch_us(ts)) − epoch_us(ts)``),
    last event NULL.  One co-location groupby of the (key, ts,
    tiebreak) projection; numpy diff per sorted group.  Returns (key,
    tiebreak, out_col)."""
    import pyarrow.compute as pc

    def per_key(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gk"])
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (order_tiebreak, "ascending")]
        )
        g = group.take(idx)
        ts_arr = pc.cast(g.column(ts_col), pa.int64())
        # null-safe int64 extraction: a nullable cast to numpy yields
        # float64 (NaN → INT64_MIN garbage on assignment); fill + mask
        isnull = np.asarray(pc.is_null(ts_arr).to_numpy(zero_copy_only=False))
        ts = pc.fill_null(ts_arr, 0).to_numpy(zero_copy_only=False)
        gaps = np.empty(len(ts), dtype=np.int64)
        mask = np.zeros(len(ts), dtype=bool)
        # SQL: the diff is NULL when either operand is NULL (null ts
        # rows sort last, matching DuckDB's NULLS LAST window order)
        if lead:
            gaps[-1] = 0
            gaps[:-1] = ts[1:] - ts[:-1]
            mask[-1] = True  # LEAD of the last row is NULL
            mask |= isnull
            mask[:-1] |= isnull[1:]
        else:
            gaps[0] = 0
            gaps[1:] = ts[1:] - ts[:-1]
            mask[0] = True  # LAG of the first row is NULL
            mask |= isnull
            mask[1:] |= isnull[:-1]
        return pa.table(
            {
                key: g.column(key),
                order_tiebreak: g.column(order_tiebreak),
                out_col: pa.array(gaps, mask=mask, type=pa.int64()),
            }
        )

    from .aggregates import encoded_group_key

    keyed = ds.select_columns([key, ts_col, order_tiebreak]).map_batches(
        lambda b: b.append_column("__gk", encoded_group_key(b, [key])),
        batch_format="pyarrow",
    )
    return keyed.groupby("__gk").map_groups(per_key, batch_format="pyarrow")


def moving_sum(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
    window_rows: int = 3,
    out_col: str = "moving_cents",
) -> Dataset:
    """Per-key rows-based moving window: SQL ``SUM(cents) OVER
    (PARTITION BY key ORDER BY ts, tiebreak ROWS BETWEEN window_rows-1
    PRECEDING AND CURRENT ROW)``.  Values accumulate as integer cents
    (frozen float policy); SQL SUM-over-window null semantics (nulls are
    skipped; an all-null window yields NULL).  cumsum minus its shifted
    self per sorted group — O(n) per key.  Returns (key, tiebreak,
    out_col)."""
    import pyarrow.compute as pc

    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")

    def per_key(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gk"])
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (order_tiebreak, "ascending")]
        )
        g = group.take(idx)
        vals = g.column(value_col).to_numpy(zero_copy_only=False)
        isnull = (
            np.isnan(vals) if vals.dtype.kind == "f"
            else np.asarray(pc.is_null(g.column(value_col)).to_numpy(zero_copy_only=False))
        )
        cents = np.floor(np.where(isnull, 0.0, vals) * 100.0 + 0.5).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(cents)))
        cnt = np.concatenate(([0], np.cumsum(~isnull)))
        lo = np.maximum(np.arange(len(cents)) - (window_rows - 1), 0)
        win_sum = csum[1:] - csum[lo]
        win_cnt = cnt[1:] - cnt[lo]
        return pa.table(
            {
                key: g.column(key),
                order_tiebreak: g.column(order_tiebreak),
                out_col: pa.array(win_sum, mask=win_cnt == 0, type=pa.int64()),
            }
        )

    from .aggregates import encoded_group_key

    keyed = ds.select_columns([key, ts_col, order_tiebreak, value_col]).map_batches(
        lambda b: b.append_column("__gk", encoded_group_key(b, [key])),
        batch_format="pyarrow",
    )
    return keyed.groupby("__gk").map_groups(per_key, batch_format="pyarrow")


def hopping_window(
    ds: Dataset,
    keys: list[str],
    *,
    ts_col: str = "ts",
    size_us: int = 3_600_000_000,  # 1 h
    hop_us: int = 900_000_000,  # 15 min
    value_col: str = "value",
) -> Dataset:
    """Hopping (sliding) windows: windows of ``size_us`` starting every
    ``hop_us``; an event at slot s = floor(ts/hop) belongs to the
    size/hop consecutive windows starting at slots s-(size/hop-1) .. s.

    Vectorized explode: per batch, concat size/hop shifted copies (no
    per-row Python), then the usual pre-aggregated groupby.  Window id
    ``win`` = start-slot index (win × hop_us = window start µs).
    Returns (keys..., win, n, sum_value_cents)."""
    import pyarrow.compute as pc

    if size_us % hop_us != 0:
        raise ValueError("size_us must be a multiple of hop_us")
    fan = size_us // hop_us

    def explode(batch: pa.Table) -> pa.Table:
        slot = pc.cast(
            pc.floor(
                pc.divide(pc.cast(pc.cast(batch.column(ts_col), pa.int64()), pa.float64()),
                          float(hop_us))
            ),
            pa.int64(),
        )
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(pc.cast(batch.column(value_col), pa.float64()), 100.0), 0.5)),
            pa.int64(),
        )
        base = pa.table(
            {**{k: batch.column(k) for k in keys}, "slot": slot, "cents": cents}
        )
        shifted = []
        for k in range(fan):
            t = base.set_column(
                base.schema.get_field_index("slot"), "win",
                pc.subtract(base.column("slot"), pa.scalar(k, type=pa.int64())),
            )
            shifted.append(t)
        exploded = pa.concat_tables(shifted)
        g = exploded.group_by(keys + ["win"]).aggregate([("cents", "count"), ("cents", "sum")])
        return g.rename_columns(keys + ["win", "n", "sum_value_cents"])

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(keys + ["win"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value_cents", alias_name="sum_value_cents"))
    )


def range_sum(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
    range_us: int = 300_000_000,  # 5 min
    out_col: str = "range_cents",
) -> Dataset:
    """Per-key time-RANGE moving window: SQL ``SUM(cents) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN range_us PRECEDING AND
    CURRENT ROW)`` — includes every PEER row sharing the current ts
    (SQL RANGE frame semantics), which a rows-frame can't express.
    Values accumulate as integer cents of COALESCE(value, 0) (callers
    mirror the COALESCE in SQL — avoids SQL's all-null-window NULL).
    Null-ts rows are excluded.  Prefix sums + two searchsorted per
    sorted group — O(n log n) per key.  Returns (key, tiebreak,
    out_col)."""
    import pyarrow.compute as pc

    def per_key(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gk"])
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (order_tiebreak, "ascending")]
        )
        g = group.take(idx)
        ts = pc.cast(g.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(
            pc.cast(g.column(value_col), pa.float64()), 0.0
        ).to_numpy(zero_copy_only=False)
        cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(cents)))
        lo = np.searchsorted(ts, ts - range_us, side="left")
        hi = np.searchsorted(ts, ts, side="right")  # peers included
        return pa.table(
            {
                key: g.column(key),
                order_tiebreak: g.column(order_tiebreak),
                out_col: pa.array(csum[hi] - csum[lo], type=pa.int64()),
            }
        )

    from .aggregates import encoded_group_key

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(ts_col)))
        return b.append_column("__gk", encoded_group_key(b, [key]))

    keyed = ds.select_columns([key, ts_col, order_tiebreak, value_col]).map_batches(
        prep, batch_format="pyarrow",
    )
    return keyed.groupby("__gk").map_groups(per_key, batch_format="pyarrow")


def funnel(
    ds: Dataset,
    stages: list[str],
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    out_col: str = "depth",
    within_us: int | None = None,
) -> Dataset:
    """Ordered funnel per key: depth = how many of ``stages`` the key
    completed IN ORDER, where stage i+1 counts only at/after the
    earliest qualifying time of stage i (inclusive — SQL MIN(ts) ≥
    chain), and — with ``within_us`` — no more than that many µs after
    it (conversion window).  Classic conversion analysis
    (view → click → purchase within 1 h).

    One co-location groupby of the (key, ts, type) projection; per
    sorted group one searchsorted per stage.  Null-ts rows are
    excluded.  Returns (key, out_col) with depth ∈ 0..len(stages)."""
    import pyarrow.compute as pc

    def per_key(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gk"])
        ts = pc.cast(group.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        types = group.column(type_col).to_pylist()
        depth = 0
        t_prev = -(1 << 62)
        for si, st in enumerate(stages):
            st_ts = np.sort(ts[np.fromiter(
                (t == st for t in types), dtype=bool, count=len(types))])
            i = np.searchsorted(st_ts, t_prev, side="left")
            if i >= len(st_ts):
                break
            t = int(st_ts[i])
            if within_us is not None and si > 0 and t > t_prev + within_us:
                break
            t_prev = t
            depth += 1
        return pa.table(
            {key: group.column(key).slice(0, 1),
             out_col: pa.array([depth], type=pa.int64())}
        )

    def prep(b: pa.Table) -> pa.Table:
        b = b.select([key, ts_col, type_col]).filter(
            pc.is_valid(b.column(ts_col)))
        from .aggregates import encoded_group_key

        return b.append_column("__gk", encoded_group_key(b, [key]))

    keyed = ds.map_batches(prep, batch_format="pyarrow")
    return keyed.groupby("__gk").map_groups(per_key, batch_format="pyarrow")
