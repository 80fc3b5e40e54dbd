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


def _scalar_cfds(df, lhs, rhs, min_support, conf):
    cn, cd = conf
    out = []
    key = df[lhs[0]] if len(lhs) == 1 else list(zip(*(df[c] for c in lhs)))
    for k, grp in df.groupby(key, sort=True, dropna=False):
        vc = grp[rhs].value_counts(dropna=False)
        best_n = int(vc.max())
        best_v = min(v for v, n in vc.items() if n == best_n)  # rhs asc tie
        size = len(grp)
        if best_n >= min_support and best_n * cd >= size * cn:
            out.append((k, best_v, best_n, size))
    return sorted(out)


@pytest.mark.usefixtures("ray_session")
def test_discover_constant_cfds_matches_scalar():
    import ray.data

    from dataguards_ray.rules.discovery import discover_constant_cfds

    rng = __import__("random").Random(3)
    rows = [{"g": f"g{rng.randrange(6)}", "v": rng.choice("aab")}
            for _ in range(300)]
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df).repartition(5)
    got = discover_constant_cfds(ds, ["g"], "v", min_support=20,
                                 min_conf=(3, 5)).take_all()
    got = sorted((r["g"], r["v"], r["support"], r["group_size"])
                 for r in got)
    assert got == _scalar_cfds(df, ["g"], "v", 20, (3, 5))
    assert got  # fixture yields at least one pattern


@pytest.mark.usefixtures("ray_session")
def test_discover_constant_cfds_forced_fallback_parity():
    import ray.data

    from dataguards_ray.rules.discovery import discover_constant_cfds

    rows = [{"g": f"g{i % 4}", "v": "x" if i % 5 else "y"}
            for i in range(80)]
    ds = ray.data.from_items(rows).repartition(3)
    kw = dict(min_support=2, min_conf=(1, 2))
    fast = sorted((r["g"], r["v"], r["support"], r["group_size"])
                  for r in discover_constant_cfds(
                      ds, ["g"], "v", **kw).take_all())
    slow = sorted((r["g"], r["v"], r["support"], r["group_size"])
                  for r in discover_constant_cfds(
                      ds, ["g"], "v", max_driver_rows=1, **kw).take_all())
    assert fast == slow and len(fast) == 4


@pytest.mark.usefixtures("ray_session")
def test_discover_constant_cfds_thresholds():
    import ray.data

    from dataguards_ray.rules.discovery import discover_constant_cfds

    rows = ([{"g": "a", "v": "x"}] * 9 + [{"g": "a", "v": "y"}]
            + [{"g": "b", "v": "x"}] * 5 + [{"g": "b", "v": "y"}] * 5)
    ds = ray.data.from_items(rows)
    # conf 9/10: only group a qualifies (b's majority is a 5/10 tie)
    got = discover_constant_cfds(ds, ["g"], "v", min_support=2,
                                 min_conf=(9, 10)).take_all()
    assert [(r["g"], r["v"], r["support"], r["group_size"])
            for r in got] == [("a", "x", 9, 10)]
    # b's tie breaks toward the smaller rhs value at looser confidence
    got = discover_constant_cfds(ds, ["g"], "v", min_support=2,
                                 min_conf=(1, 2)).take_all()
    assert sorted((r["g"], r["v"]) for r in got) == [("a", "x"), ("b", "x")]
    with pytest.raises(ValueError):
        discover_constant_cfds(ds, ["g"], "v", min_conf=(1, 0))


@pytest.mark.usefixtures("ray_session")
def test_discover_fds_lattice_cap():
    import ray.data

    from dataguards_ray.rules.discovery import discover_fds

    ds = ray.data.from_items([{"a": 1, "b": 2, "c": 3}])
    with pytest.raises(ValueError, match="lattice"):
        discover_fds(ds, ["a", "b", "c"], max_lhs=2, max_lattice=3)
