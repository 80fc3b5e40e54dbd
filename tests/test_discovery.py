"""FD discovery (rules/discovery.py) vs a pandas scalar oracle:
full-lattice stats, TANE pruning, NULL-as-value semantics."""

from __future__ import annotations

from itertools import combinations

import pandas as pd
import pytest


def _scalar_fds(df: pd.DataFrame, columns, max_lhs):
    """Scalar oracle: per candidate, group by LHS (NULL = a value) and
    count distinct RHS values (NULL counted)."""
    out = []
    for size in range(1, max_lhs + 1):
        for lhs in combinations(sorted(columns), size):
            for rhs in sorted(columns):
                if rhs in lhs:
                    continue
                tmp = pd.DataFrame({
                    f"k{i}": df[c].astype(object).where(df[c].notna(),
                                                        "\0NULL")
                    for i, c in enumerate(lhs)})
                tmp["r"] = df[rhs].astype(object).where(df[rhs].notna(),
                                                        "\0NULL")
                g = tmp.groupby([f"k{i}" for i in range(len(lhs))],
                                sort=False)["r"].nunique()
                out.append((",".join(lhs), rhs, len(g),
                            int((g > 1).sum()), bool((g <= 1).all())))
    return out


@pytest.mark.usefixtures("ray_session")
def test_discover_fds_full_lattice_matches_scalar():
    import ray.data

    from dataguards_ray.rules.discovery import discover_fds

    df = pd.DataFrame({
        "a": [1, 1, 2, 2, 3, 3, None, None],
        "b": ["x", "x", "y", "y", "z", "z", "w", "w"],
        "c": [10, 10, 10, 20, 20, 20, None, 30],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    got = discover_fds(ds, ["a", "b", "c"], max_lhs=2,
                       prune=False).to_pylist()
    want = _scalar_fds(df, ["a", "b", "c"], 2)
    assert [(r["lhs"], r["rhs"], r["n_groups"], r["n_violating_groups"],
             r["holds"]) for r in got] == want
    # sanity on this fixture: a <-> b are mutually determining, c is not
    holds = {(r["lhs"], r["rhs"]) for r in got if r["holds"]}
    assert ("a", "b") in holds and ("b", "a") in holds
    assert ("a", "c") not in holds


@pytest.mark.usefixtures("ray_session")
def test_discover_fds_pruning_skips_implied():
    import ray.data

    from dataguards_ray.rules.discovery import discover_fds

    df = pd.DataFrame({
        "k": range(8),  # key: k -> everything holds at size 1
        "u": ["a", "a", "b", "b", "c", "c", "d", "d"],
        "v": [1, 2, 1, 2, 1, 2, 1, 2],
    })
    ds = ray.data.from_pandas(df)
    full = discover_fds(ds, ["k", "u", "v"], max_lhs=2,
                        prune=False).to_pylist()
    pruned = discover_fds(ds, ["k", "u", "v"], max_lhs=2,
                          prune=True).to_pylist()
    # k -> u and k -> v hold at size 1, so every size-2 candidate with
    # k in the LHS and u/v as RHS is implied and absent when pruning
    pruned_keys = {(r["lhs"], r["rhs"]) for r in pruned}
    assert ("k,u", "v") not in pruned_keys
    assert ("k,v", "u") not in pruned_keys
    assert len(pruned) < len(full)
    # pruning never changes reported stats for the candidates it keeps
    full_map = {(r["lhs"], r["rhs"]): r for r in full}
    for r in pruned:
        assert full_map[(r["lhs"], r["rhs"])] == r


@pytest.mark.usefixtures("ray_session")
def test_fd_group_stats_forced_fallback_parity():
    """A tiny driver-merge cap forces the fully-distributed path (both
    merge levels); stats must equal the driver-merge path exactly."""
    import ray.data

    from dataguards_ray.rules.discovery import _fd_group_stats

    df = pd.DataFrame({
        "u": [f"u{i % 7}" for i in range(60)],
        "v": [i % 3 if i % 5 else 99 for i in range(60)],
    })
    ds = ray.data.from_pandas(df).repartition(4)
    fast = _fd_group_stats(ds, ("u",), "v")
    slow = _fd_group_stats(ds, ("u",), "v", max_driver_rows=1)
    assert fast == slow
    assert fast[0] == 7  # seven u-groups


@pytest.mark.usefixtures("ray_session")
def test_discover_fds_lattice_cap():
    import ray.data

    from dataguards_ray.rules.discovery import discover_fds

    ds = ray.data.from_items([{"a": 1, "b": 2, "c": 3}])
    with pytest.raises(ValueError, match="lattice"):
        discover_fds(ds, ["a", "b", "c"], max_lhs=2, max_lattice=3)
