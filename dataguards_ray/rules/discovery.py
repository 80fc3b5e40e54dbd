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

Scale shape (100 TB): each candidate is ONE streaming pass — per-batch
`group_by(LHS).aggregate(count_distinct(RHS))` partials are THIN
((lhs-hash, rhs-set partial) rows bounded by the batch's distinct LHS)
merged with the adaptive driver/distributed machinery
(`driver_merge_or_none`); the driver sees per-candidate aggregate
counts, never rows.  Candidates are evaluated as a driver loop over
the (small, ≤ cols²·2^max_lhs) lattice — a loop over CANDIDATES, not
data.  Distinct-count partials use the exact two-level groupby: first
distinct (LHS, RHS) pairs, then group sizes per LHS — both all-to-all
exchanges move only the candidate's ≤ 2 columns + hashes.

NULL semantics follow SQL GROUP BY: NULL is a value (one group /
one RHS value), matching the DuckDB oracle exactly.
"""

from __future__ import annotations

from itertools import combinations

import pyarrow as pa
from ray.data import Dataset


def _fd_group_stats(ds: Dataset, lhs: "tuple[str, ...]", rhs: str):
    """(n_groups, n_violating_groups) for candidate LHS → RHS: a group
    violates iff it holds > 1 distinct RHS value.  Two thin exchanges:
    distinct (LHS, RHS) combos, then per-LHS combo counts."""
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
            lambda b: b.append_column("one", pa.array([1] * b.num_rows,
                                                      type=pa.int64())),
            batch_format="pyarrow"),
        cols, [("one", "sum", "n")],
    )
    if table is None:
        merged = _fallback_group_merge(mat, cols, [("one", "sum", "n")])
        distinct = merged.select_columns(cols).take_all()
        lhs_vals = [tuple(r[c] for c in lhs) for r in distinct]
    else:
        lhs_cols = [table.column(c).to_pylist() for c in lhs]
        lhs_vals = list(zip(*lhs_cols)) if lhs_cols else []
    # per-LHS distinct-RHS counts (the distinct table is already thin)
    from collections import Counter

    per_lhs = Counter(lhs_vals)
    n_groups = len(per_lhs)
    n_viol = sum(1 for v in per_lhs.values() if v > 1)
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
