"""Functional-dependency DISCOVERY over a Dataset (TANE-style candidate
lattice, Huhtala et al. 1999; the discovery counterpart of the CFD/DC
checking rules this engine enforces — Bohannon et al. ICDE 2007 frame
CFD mining over exactly such FD lattices).

``discover_fds`` tests every candidate LHS → RHS with |LHS| ≤
``max_lhs`` over the given columns and reports, per candidate, the
number of violating LHS groups (groups with > 1 distinct RHS value)
and whether the FD holds exactly.  Pruning: any candidate whose LHS is
a superset of an already-holding FD with the same RHS is implied and
skipped (TANE's key rule), so clean data costs only the first lattice
level.

Scale shape (100 TB): each candidate is one streaming pass emitting
batch-local DISTINCT (LHS, RHS) rows (thin: only the candidate's
columns), merged with the adaptive driver/distributed machinery
(`driver_merge_or_none`).  Above the driver cap the whole chain stays
distributed: distinct pairs → per-LHS pair counts (second thin merge)
→ two scalar aggregates — the driver sees two ints, never rows
(forced-fallback parity tested).  Candidates are evaluated as a driver
loop over the (small, ≤ cols²·2^max_lhs) lattice — a loop over
CANDIDATES, not data; each candidate re-reads only its ≤ 3 columns.

NULL semantics follow SQL GROUP BY: NULL is a value (one group /
one RHS value), matching the DuckDB oracle exactly.
"""

from __future__ import annotations

from itertools import combinations

import pyarrow as pa
from ray.data import Dataset


def _fd_group_stats(ds: Dataset, lhs: "tuple[str, ...]", rhs: str,
                    max_driver_rows: int = 2_000_000):
    """(n_groups, n_violating_groups) for candidate LHS → RHS: a group
    violates iff it holds > 1 distinct RHS value.  Two thin exchanges:
    distinct (LHS, RHS) combos, then per-LHS combo counts.
    ``max_driver_rows`` is the driver-merge cap (test hook: a tiny cap
    forces the fully-distributed path)."""
    from ..aggregates import (_fallback_group_merge, driver_merge_or_none)

    cols = list(lhs) + [rhs]

    def distinct_partial(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        g = t.group_by(cols, use_threads=False).aggregate([([], "count_all")])
        return g.select(cols)  # batch-local distinct (LHS, RHS) rows

    pairs = ds.map_batches(distinct_partial, batch_format="pyarrow")
    # global distinct (LHS, RHS): groupby with count over the partials —
    # same machinery as every thin-partial merge in aggregates.py
    table, mat = driver_merge_or_none(
        pairs.map_batches(
            lambda b: b.append_column("n", pa.array([1] * b.num_rows,
                                                    type=pa.int64())),
            batch_format="pyarrow"),
        cols, [("n", "sum", "n")], max_driver_rows=max_driver_rows,
    )
    if table is not None:  # distinct pairs fit the driver: Arrow group
        from collections import Counter

        lhs_cols = [table.column(c).to_pylist() for c in lhs]
        per_lhs = Counter(zip(*lhs_cols) if lhs_cols else [])
        return len(per_lhs), sum(1 for v in per_lhs.values() if v > 1)
    # big case: stay distributed end-to-end — per-LHS pair counts via a
    # second thin-partial merge; the driver only ever sees two ints
    import pyarrow.compute as pc

    pairs_ds = _fallback_group_merge(mat, cols, [("n", "sum", "n")])
    lhs_l = list(lhs)

    def lhs_partial(b: pa.Table) -> pa.Table:
        g = b.select(lhs_l).group_by(
            lhs_l, use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(lhs_l + ["m"])

    ctable, mat2 = driver_merge_or_none(
        pairs_ds.map_batches(lhs_partial, batch_format="pyarrow"),
        lhs_l, [("m", "sum", "m")], max_driver_rows=max_driver_rows,
    )
    if ctable is not None:
        ms = ctable.column("m").to_numpy(zero_copy_only=False)
        return len(ms), int((ms > 1).sum())
    cd = _fallback_group_merge(mat2, lhs_l, [("m", "sum", "m")]).materialize()
    n_groups = cd.count()
    n_viol = cd.map_batches(
        lambda b: b.filter(pc.greater(b.column("m"), 1)),
        batch_format="pyarrow").count()
    return n_groups, n_viol


def fd_candidates(columns: "list[str]", max_lhs: int):
    """The deterministic candidate lattice (lhs tuple sorted, order =
    (lhs size, lhs, rhs)) — shared by discover_fds and the SQL oracle
    generator so both sides enumerate identically."""
    cands = []
    for size in range(1, max_lhs + 1):
        for lhs in combinations(sorted(columns), size):
            for rhs in sorted(columns):
                if rhs in lhs:
                    continue
                cands.append((lhs, rhs))
    return cands


def discover_constant_cfds(
    ds: Dataset,
    lhs: "list[str]",
    rhs: str,
    *,
    min_support: int = 10,
    min_conf: "tuple[int, int]" = (9, 10),
    max_driver_rows: int = 2_000_000,
) -> Dataset:
    """Mine CONSTANT conditional functional dependencies (CFDMiner-style
    patterns; Fan et al. TKDE 2011 — the discovery counterpart of the
    `rules/cfd.py` checker): for each LHS value combination, the
    majority RHS value becomes a candidate pattern (lhs=v̄ → rhs=c),
    kept when support = majority count ≥ ``min_support`` and
    confidence = majority/group ≥ ``min_conf[0]/min_conf[1]``
    (compared by integer cross-multiplication — no float in the
    decision, so SQL mirrors exactly).  Ties break toward the smallest
    RHS value (SQL ORDER BY n DESC, rhs parity).

    Returns a Dataset with columns lhs... , rhs, support (majority
    count), group_size (int64).  NULL is a value (SQL GROUP BY parity).

    Scale shape: ONE streaming pass emits thin per-batch (LHS, RHS, n)
    partials (bounded by batch-distinct combos); the adaptive merge
    resolves global counts; the majority step is a driver Arrow pass
    below ``max_driver_rows`` distinct pairs, else a distributed
    `groupby(LHS).map_groups` over the thin pair rows.  The driver
    never holds corpus rows."""
    from ..aggregates import _fallback_group_merge, driver_merge_or_none

    cn, cd = int(min_conf[0]), int(min_conf[1])
    if cd <= 0 or cn < 0:
        raise ValueError("min_conf must be (num >= 0, den > 0)")
    cols = list(lhs) + [rhs]

    def pair_counts(b: pa.Table) -> pa.Table:
        g = b.select(cols).group_by(
            cols, use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(cols + ["n"])

    def majority(t: pa.Table) -> pa.Table:
        """Per-LHS majority pick over a (LHS, RHS, n) pair table —
        deterministic (n desc, rhs asc) and support/conf filtered."""
        order = [(c, "ascending") for c in lhs] + [
            ("n", "descending"), (rhs, "ascending")]
        t = t.sort_by(order)
        lhs_keys = list(zip(*(t.column(c).to_pylist() for c in lhs)))
        ns = t.column("n").to_pylist()
        first_idx: "dict[tuple, int]" = {}
        totals: "dict[tuple, int]" = {}
        for i, k in enumerate(lhs_keys):
            totals[k] = totals.get(k, 0) + ns[i]
            first_idx.setdefault(k, i)  # best row: sorted n desc, rhs asc
        keep, supports, sizes = [], [], []
        for k, i in first_idx.items():
            sup, size = ns[i], totals[k]
            if sup >= min_support and sup * cd >= size * cn:
                keep.append(i)
                supports.append(sup)
                sizes.append(size)
        picked = t.take(pa.array(keep, type=pa.int64()))
        return pa.table(
            {c: picked.column(c) for c in cols}
            | {"support": pa.array(supports, type=pa.int64()),
               "group_size": pa.array(sizes, type=pa.int64())})

    table, mat = driver_merge_or_none(
        ds.map_batches(pair_counts, batch_format="pyarrow"),
        cols, [("n", "sum", "n")], max_driver_rows=max_driver_rows,
    )
    import ray.data as _rd

    if table is not None:
        return _rd.from_arrow(majority(table))
    pairs_ds = _fallback_group_merge(mat, cols, [("n", "sum", "n")])
    return pairs_ds.groupby(list(lhs)).map_groups(
        majority, batch_format="pyarrow")


def discover_fds(
    ds: Dataset,
    columns: "list[str]",
    *,
    max_lhs: int = 2,
    max_lattice: int = 10_000,
    prune: bool = True,
) -> pa.Table:
    """Mine exact FDs LHS → RHS over ``columns``.  Returns a pa.Table
    (lhs: comma-joined string, rhs, n_groups, n_violating_groups,
    holds: bool) with one row per candidate tested.  With ``prune``
    (default), candidates implied by an already-holding smaller FD
    (same RHS, LHS superset) are skipped per TANE and not reported;
    ``prune=False`` evaluates the full lattice (the SQL-comparable
    mode).  Deterministic order: (lhs size, lhs, rhs)."""
    cands = fd_candidates(columns, max_lhs)
    if len(cands) > max_lattice:
        raise ValueError(
            f"FD lattice has {len(cands)} candidates > {max_lattice}; "
            "reduce columns or max_lhs")

    holding: "set[tuple[tuple[str, ...], str]]" = set()
    rows = []
    for lhs, rhs in cands:  # loop over candidates, not data
        if prune and any(set(hl) <= set(lhs) and hr == rhs
                         for hl, hr in holding):
            continue  # implied by a minimal FD already found
        n_groups, n_viol = _fd_group_stats(ds, lhs, rhs)
        holds = n_viol == 0
        if holds:
            holding.add((lhs, rhs))
        rows.append({"lhs": ",".join(lhs), "rhs": rhs,
                     "n_groups": n_groups,
                     "n_violating_groups": n_viol, "holds": holds})
    return pa.table({
        "lhs": pa.array([r["lhs"] for r in rows], type=pa.string()),
        "rhs": pa.array([r["rhs"] for r in rows], type=pa.string()),
        "n_groups": pa.array([r["n_groups"] for r in rows], type=pa.int64()),
        "n_violating_groups": pa.array(
            [r["n_violating_groups"] for r in rows], type=pa.int64()),
        "holds": pa.array([r["holds"] for r in rows], type=pa.bool_()),
    })
