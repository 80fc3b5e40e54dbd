"""Rule DSL tests (SURVEY §2.2 / §5.2): predicates, range/regex rules,
CFD (both compile targets), denial constraints, report."""

from __future__ import annotations

import pyarrow as pa
import pytest

from dataguards_ray.rules import (
    CFD,
    Atom,
    DenialConstraint,
    Predicate,
    PredicateRule,
    RangeRule,
    RegexRule,
    RuleSet,
    violation_report,
)


@pytest.fixture()
def mini(ray_session):
    import ray.data

    t = pa.table(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "city": ["NYC", "NYC", "LA", "LA", "SF", None],
            "zip": ["10001", "10002", "90001", "90001", "94103", "x"],
            "bal": [10.0, -5.0, 3.0, 99.0, -1.0, 0.0],
            "seg": ["A", "B", "A", "A", "B", "A"],
        }
    )
    return ray.data.from_arrow(t)


def _by_id(ds):
    df = ds.to_pandas().sort_values("id").set_index("id")
    return {i: list(df.loc[i, "rule_hits"]) for i in df.index}


def test_predicate_ops(mini):
    t = pa.table({"x": [1, 2, None], "y": ["a", "bb", "ccc"]})
    assert Predicate("x", ">", 1).mask(t).to_pylist() == [False, True, False]
    assert Predicate("x", "is_null").mask(t).to_pylist() == [False, False, True]
    assert Predicate("x", "between", (1, 2)).mask(t).to_pylist() == [True, True, False]
    assert Predicate("y", "matches", "^b+$").mask(t).to_pylist() == [False, True, False]
    assert Predicate("y", "in", ["a", "ccc"]).mask(t).to_pylist() == [True, False, True]


def test_range_regex_predicate_rules(mini):
    rs = RuleSet(
        [
            RangeRule("bal.nonneg", "bal", lo=0.0),
            RegexRule("zip.format", "zip", r"^\d{5}$"),
            PredicateRule("city.notnull", [Predicate("city", "not_null")]),
        ]
    )
    hits = _by_id(rs.evaluate(mini))
    assert hits[1] == []
    assert hits[2] == ["bal.nonneg"]
    assert hits[6] == ["zip.format", "city.notnull"]


def test_range_rule_timestamp_bounds():
    """Round-5: a RangeRule on a timestamp column accepts ISO-string
    bounds (the natural JSON-config spelling); incomparable bounds
    raise a config-level ValueError naming the rule, not a raw Arrow
    kernel error from inside a Ray task."""
    batch = pa.table({
        "ts": pa.array([0, 10**6 * 86400 * 20000, None],
                       type=pa.timestamp("us")),
    })
    r = RangeRule("ts.window", "ts", lo="1971-01-01", hi="2030-01-01")
    # row0 = 1970 (below lo), row1 ≈ 2024 (in range), row2 null (violates)
    assert r.violations(batch).to_pylist() == [True, False, True]

    bad = RangeRule("ts.bad", "ts", lo=0, hi=99)
    with pytest.raises(ValueError, match="ts.bad.*timestamp"):
        bad.violations(batch)


def test_predicate_timestamp_constants():
    """Round-5: predicate atoms accept ISO-string constants against
    temporal columns (>=, between, in); incomparable constants raise a
    config-level ValueError instead of a raw Arrow kernel error."""
    batch = pa.table({
        "ts": pa.array([0, 10**6 * 86400 * 20000, None],
                       type=pa.timestamp("us")),
    })
    assert Predicate("ts", ">=", "1971-01-01").mask(batch).to_pylist() == [
        False, True, False]
    assert Predicate(
        "ts", "between", ("1969-01-01", "1971-01-01")
    ).mask(batch).to_pylist() == [True, False, False]
    assert Predicate("ts", "in", ["1970-01-01"]).mask(batch).to_pylist() == [
        True, False, False]
    with pytest.raises(ValueError, match="not comparable"):
        Predicate("ts", ">=", 5).mask(batch)


def test_cfd_temporal_tableau_constants():
    """Round-5: CFD tableau constants against temporal columns accept
    ISO strings; incomparable constants raise a config-level error."""
    batch = pa.table({
        "day": pa.array([0, 0, 86400_000_000], type=pa.timestamp("us")),
        "status": ["open", "closed", "open"],
    })
    cfd = CFD("cfd.day", ["day"], "status",
              [{"day": "1970-01-01", "status": "open"}])
    assert cfd.violations(batch).to_pylist() == [False, True, False]

    bad = CFD("cfd.bad", ["day"], "status", [{"day": 5, "status": "open"}])
    with pytest.raises(ValueError, match="not comparable"):
        bad.violations(batch)


def test_cfd_constant_and_variable(mini):
    # constant tableau: city == SF must have zip 94103 (holds)
    const = CFD("cfd.sf", ["city"], "zip", [{"city": "SF", "zip": "94103"}])
    assert const.row_local
    # variable: FD city -> zip violated by NYC (two zips)
    var = CFD("cfd.fd", ["city"], "zip", [{"city": "_", "zip": "_"}])
    assert not var.row_local
    rs = RuleSet([const, var])
    hits = _by_id(rs.evaluate(mini))
    assert hits[1] == ["cfd.fd"] and hits[2] == ["cfd.fd"]
    assert hits[3] == [] and hits[5] == []


def test_dc_single_and_pair(mini):
    rs = RuleSet(
        [
            DenialConstraint(
                "dc.negB",
                single=[Predicate("bal", "<", 0.0), Predicate("seg", "==", "B")],
            ),
            DenialConstraint(
                "dc.pair", eq_keys=["seg"], pair_atoms=[Atom("bal", "<", "bal")]
            ),
        ]
    )
    hits = _by_id(rs.evaluate(mini))
    assert hits[2] == ["dc.negB", "dc.pair"]
    # every row participates in a within-seg bal inequality pair
    assert all("dc.pair" in h for h in hits.values())


def test_dc_pair_group_cap(ray_session):
    import ray.data

    # DCs the fast paths can't express (here: a cross-column atom) take
    # the O(n²) matrix and enforce the group cap (1-atom DCs use the
    # extreme-value path, same-column 2-atom DCs the dominance sweep)
    t = pa.table({"k": ["a"] * 5, "v": [1, 2, 3, 4, 5], "w": [5, 4, 3, 2, 1]})
    dc = DenialConstraint("dc.cap", eq_keys=["k"],
                          pair_atoms=[Atom("v", "<", "w"), Atom("w", "<", "w")],
                          max_group=3)
    with pytest.raises(Exception):
        dc.apply_shuffle(ray.data.from_arrow(t)).materialize()


def test_cfd_join_mark_matches_broadcast(ray_session):
    """Round-2 scale path: with max_broadcast_keys forced to 0 the CFD
    mark runs as a left_outer join — flags must equal the broadcast
    path's."""
    import ray.data

    from dataguards_ray.rules.cfd import CFD

    rows = []
    for i in range(200):
        rows.append({"x": f"k{i % 40}", "y": f"v{i % 40}" if i % 40 >= 10 else f"v{i}", "i": i})
    ds = ray.data.from_items(rows).materialize()
    flag = "__viol_fd.xy"

    def flags(cfd):
        out = cfd.apply_shuffle(ds).to_pandas().sort_values("i")
        return list(out[flag])

    base = flags(CFD("fd.xy", ["x"], "y", [{"x": "_", "y": "_"}]))
    joined = flags(CFD("fd.xy", ["x"], "y", [{"x": "_", "y": "_"}], max_broadcast_keys=0))
    assert joined == base and sum(base) > 0


def test_dc_two_atom_sweep_matches_bruteforce():
    """Round-2 verdict item #6: the O(n log n) dominance sweep for
    two-inequality-atom DCs ≡ the O(n²) matrix, including heavy ties."""
    import numpy as np

    from dataguards_ray.rules.dc import two_atom_flags

    _OPS = {"<": np.less, "<=": np.less_equal, ">": np.greater, ">=": np.greater_equal}
    rng = np.random.RandomState(7)
    for trial in range(12):
        n = int(rng.randint(2, 100))
        x = rng.randint(0, 6, n).astype(np.int64)  # small range → many ties
        y = rng.randint(0, 6, n).astype(np.int64)
        g = pa.table({"x": x, "y": y})
        for op1 in _OPS:
            for op2 in _OPS:
                got = two_atom_flags(g, Atom("x", op1, "x"), Atom("y", op2, "y"))
                conj = _OPS[op1](x[:, None], x[None, :]) & _OPS[op2](y[:, None], y[None, :])
                np.fill_diagonal(conj, False)
                want = conj.any(axis=1) | conj.any(axis=0)
                assert np.array_equal(got, want), (op1, op2, x.tolist(), y.tolist())


def test_dc_null_eq_keys_never_witness(ray_session):
    """Code-review fix: rows with a null equality-atom value form
    singleton groups (SQL: NULL never equals NULL) instead of crashing
    the groupby or witnessing each other."""
    import ray.data

    rows = [{"g": None, "v": 1}, {"g": None, "v": 5},
            {"g": "a", "v": 1}, {"g": "a", "v": 5}, {"g": "b", "v": 2}]
    dc = DenialConstraint("dc.t", eq_keys=["g"], pair_atoms=[Atom("v", "<", "v")])
    res = dc.apply_shuffle(ray.data.from_items(rows).repartition(2)).take_all()
    flags = sorted((str(r["g"]), r["v"], r["__viol_dc.t"]) for r in res)
    assert flags == [("None", 1, False), ("None", 5, False),
                     ("a", 1, True), ("a", 5, True), ("b", 2, False)]


def test_dc_single_atom_fast_path_rejects_nulls(ray_session):
    """Code-review fix: the single-atom extreme-value path defers groups
    with nulls/NaN to the exact matrix (nulls never compare)."""
    import ray.data

    rows = [{"g": "x", "v": 1}, {"g": "x", "v": 5}, {"g": "x", "v": None}]
    dc = DenialConstraint("dc.n", eq_keys=["g"], pair_atoms=[Atom("v", ">", "v")])
    res = dc.apply_shuffle(ray.data.from_items(rows)).take_all()
    flags = {(r["v"], r["__viol_dc.n"]) for r in res}
    # 1 and 5 witness each other; the null row never participates
    assert flags == {(1, True), (5, True), (None, False)}


def test_dc_two_atom_sweep_rejects_nat():
    """Code-review fix: null timestamps (NaT = INT64_MIN) must defer to
    the matrix path instead of acting as a -infinity value."""
    from dataguards_ray.rules.dc import two_atom_flags

    t = pa.table({"a": pa.array([1000, 2000, None], type=pa.timestamp("us")),
                  "b": pa.array([5, 1, 7], type=pa.int64())})
    assert two_atom_flags(t, Atom("a", ">", "a"), Atom("b", ">", "b")) is None
    # non-null timestamps still take the sweep
    t2 = pa.table({"a": pa.array([1000, 2000], type=pa.timestamp("us")),
                   "b": pa.array([5, 1], type=pa.int64())})
    got = two_atom_flags(t2, Atom("a", ">", "a"), Atom("b", "<", "b"))
    # both rows participate in the witness pair (one per role)
    assert got is not None and list(got) == [True, True]


def test_dc_two_atom_sweep_beyond_group_cap(ray_session):
    """A 50k-row group sails past max_group because the sweep never
    builds the pairwise matrix."""
    import numpy as np
    import ray.data

    rng = np.random.RandomState(0)
    n = 50_000
    t = pa.table(
        {"k": ["one"] * n,
         "price": rng.randint(0, 1000, n).astype(np.int64),
         "size": rng.randint(0, 50, n).astype(np.int64),
         "i": np.arange(n, dtype=np.int64)}
    )
    dc = DenialConstraint("dc.sweep", eq_keys=["k"],
                          pair_atoms=[Atom("price", ">", "price"), Atom("size", "<", "size")],
                          max_group=1000)
    out = dc.apply_shuffle(ray.data.from_arrow(t)).to_pandas()
    # with 50k random rows essentially every row is in some witness pair
    assert out["__viol_dc.sweep"].sum() > n * 0.99


def test_violation_report(mini):
    rs = RuleSet([RangeRule("bal.nonneg", "bal", lo=0.0)])
    rep = violation_report(rs.evaluate(mini)).to_pandas()
    assert rep.iloc[0]["rule"] == "bal.nonneg"
    assert rep.iloc[0]["drops"] == 2


def test_step_registry(ray_session):
    from dataguards_ray.pipeline import MapBatchesStep, make_step

    step = make_step("prepare", num_parts=8)
    assert step.name == "prepare"
    wrap = MapBatchesStep("noop", lambda t: t)
    assert wrap.name == "noop"


def test_dc_single_atom_fast_path_matches_bruteforce(ray_session):
    """O(n) extreme-value evaluation ≡ O(n²) pairwise for 1-atom DCs."""
    import random

    import ray.data

    rng = random.Random(7)
    for op in ("<", "<=", ">", ">=", "!="):
        for trial in range(6):
            n = rng.randint(2, 30)
            vals = [rng.randint(0, 5) for _ in range(n)]
            t = pa.table({"k": ["g"] * n, "v": vals, "i": list(range(n))})
            dc_fast = DenialConstraint(f"f.{op}.{trial}", eq_keys=["k"],
                                       pair_atoms=[Atom("v", op, "v")])
            out = dc_fast.apply_shuffle(ray.data.from_arrow(t)).to_pandas()
            out = out.sort_values("i")
            got = list(out[f"__viol_f.{op}.{trial}"])
            # brute force
            import numpy as _np
            a = _np.array(vals)
            conj = {"<": _np.less, "<=": _np.less_equal, ">": _np.greater,
                    ">=": _np.greater_equal, "!=": _np.not_equal}[op](
                a[:, None], a[None, :])
            _np.fill_diagonal(conj, False)
            want = list(conj.any(axis=1) | conj.any(axis=0))
            assert got == want, (op, vals, got, want)


def test_inclusion_rule_match_simple_and_scale_path():
    """IND: absent keys violate, present keys don't, NULL components are
    exempt (MATCH SIMPLE); the join-mark scale path (max_broadcast_keys
    forced below the key count) gives identical flags; empty reference
    → every non-null row violates."""
    import ray.data

    from dataguards_ray.rules.integrity import InclusionRule

    left = ray.data.from_items([
        {"id": 1, "fk": 10}, {"id": 2, "fk": 99},
        {"id": 3, "fk": None}, {"id": 4, "fk": 20},
    ])
    ref = ray.data.from_items([{"k1": 10}, {"k1": 20}, {"k1": None}])

    def flags(rule):
        out = rule.apply_shuffle(left).take_all()
        return {r["id"]: r[f"__viol_{rule.name}"] for r in out}

    expect = {1: False, 2: True, 3: False, 4: False}
    assert flags(InclusionRule("f", ["fk"], ref, ["k1"])) == expect
    assert flags(InclusionRule("f", ["fk"], ref, ["k1"],
                               max_broadcast_keys=1)) == expect

    empty_ref = ray.data.from_items([{"k1": None}])  # only-null ref rows
    assert flags(InclusionRule("f", ["fk"], empty_ref, ["k1"])) == {
        1: True, 2: True, 3: False, 4: True}

    # reserved internal column names fail fast instead of being dropped
    clash = ray.data.from_items([{"id": 1, "fk": 10, "k": "user-data"}])
    with pytest.raises(ValueError, match="collide"):
        InclusionRule("f", ["fk"], ref, ["k1"]).apply_shuffle(clash).take_all()


def test_unique_rule_all_copies_and_null_exempt():
    """UNIQUE: all copies of a duplicated key flagged, singletons not,
    NULL-component keys exempt; broadcast and join-mark paths agree."""
    import ray.data

    from dataguards_ray.rules.integrity import UniqueRule

    rows = [
        {"id": 1, "a": "x", "b": 1}, {"id": 2, "a": "x", "b": 1},
        {"id": 3, "a": "x", "b": 2}, {"id": 4, "a": None, "b": 1},
        {"id": 5, "a": None, "b": 1},
    ]
    expect = {1: True, 2: True, 3: False, 4: False, 5: False}
    for cap in (1_000_000, 1):
        ds = ray.data.from_items(rows).repartition(3)
        out = UniqueRule("u", ["a", "b"], max_broadcast_keys=cap).apply_shuffle(ds)
        got = {r["id"]: r["__viol_u"] for r in out.take_all()}
        assert got == expect, cap


def test_rules_from_config_all_types(tmp_path, ray_session):
    """Declarative JSON config → RuleSet: every rule type, canonical
    order = config order (drop_rule is the FIRST violated)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from dataguards_ray.rules.config import rules_from_config

    ref = tmp_path / "ref.parquet"
    pq.write_table(pa.table({"rk": [1, 2, 3]}), str(ref))

    cfg = {"rules": [
        {"type": "range", "name": "r.range", "col": "x", "lo": 0, "hi": 10},
        {"type": "regex", "name": "r.regex", "col": "s", "pattern": "^ok"},
        {"type": "predicate", "name": "r.pred", "all_of": [
            {"col": "flag", "op": "in", "value": ["a", "b"]}]},
        {"type": "cfd", "name": "r.cfd", "lhs": ["grp"], "rhs": "v",
         "tableau": [{"grp": "_", "v": "_"}]},
        {"type": "dc", "name": "r.dc", "eq_keys": ["grp"], "pair_atoms": [
            {"left": "x", "op": "<", "right": "lo_bound"}]},
        {"type": "unique", "name": "r.uniq", "cols": ["uid"]},
        {"type": "inclusion", "name": "r.fk", "cols": ["fk"],
         "ref_table": str(ref), "ref_cols": ["rk"]},
    ]}
    # also accept a JSON file path
    cfg_path = tmp_path / "rules.json"
    cfg_path.write_text(json.dumps(cfg))
    rs = rules_from_config(str(cfg_path))
    assert [r.name for r in rs.rules] == [
        "r.range", "r.regex", "r.pred", "r.cfd", "r.dc", "r.uniq", "r.fk"]

    rows = [
        # clean row
        {"x": 5, "s": "ok fine", "flag": "a", "grp": "g1", "v": "same",
         "lo_bound": 0, "uid": 1, "fk": 1},
        # range violation (x=99) + regex violation
        {"x": 99, "s": "bad", "flag": "a", "grp": "g2", "v": "w1",
         "lo_bound": 0, "uid": 2, "fk": 2},
        # cfd violation partner (k=g2 with different v) + dup uid
        {"x": 5, "s": "ok too", "flag": "b", "grp": "g2", "v": "w2",
         "lo_bound": 0, "uid": 3, "fk": 3},
        # dc violation pair member (x < other's lo_bound) + bad fk
        {"x": 1, "s": "ok dc", "flag": "a", "grp": "g3", "v": "z",
         "lo_bound": 0, "uid": 3, "fk": 99},
        {"x": 5, "s": "ok dc2", "flag": "a", "grp": "g3", "v": "z",
         "lo_bound": 3, "uid": 4, "fk": 1},
    ]
    out = {r["uid"] if False else i: r for i, r in enumerate(
        sorted(rs.evaluate(ray.data.from_items(rows)).take_all(),
               key=lambda r: (r["x"], r["s"])))}
    by_s = {r["s"]: r for r in out.values()}
    assert by_s["ok fine"]["keep"] is True and by_s["ok fine"]["rule_hits"] == []
    assert by_s["bad"]["drop_rule"] == "r.range"
    assert set(by_s["bad"]["rule_hits"]) == {"r.range", "r.regex", "r.cfd"}
    assert "r.cfd" in by_s["ok too"]["rule_hits"]
    assert "r.uniq" in by_s["ok too"]["rule_hits"]  # uid 3 duplicated
    assert "r.dc" in by_s["ok dc"]["rule_hits"]     # x=1 < partner lo_bound 3
    assert "r.fk" in by_s["ok dc"]["rule_hits"]     # fk=99 not in ref
    # duplicate names rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate"):
        rules_from_config({"rules": [
            {"type": "range", "name": "n", "col": "x"},
            {"type": "regex", "name": "n", "col": "s", "pattern": "a"}]})


def test_domain_block_rule(tmp_path, ray_session):
    """UT1-style domain blocklist as a first-class rule: registered-
    domain match (case/subdomain/PSL), nulls pass, config via inline
    list or domains_file, ray.put'ed Arrow list via domains_ref."""
    import pyarrow as pa
    import ray
    import ray.data

    from dataguards_ray.rules.config import rules_from_config
    from dataguards_ray.rules.dsl import DomainBlockRule, RuleSet

    rows = [
        {"id": 1, "url": "https://www.bad.com/a", "x": 1},
        {"id": 2, "url": "https://ok.org/b", "x": 1},
        {"id": 3, "url": "https://sub.BAD.com/c", "x": 1},
        {"id": 4, "url": "https://news.bbc.co.uk/d", "x": 1},
        {"id": 5, "url": None, "x": 1},
    ]
    ds = ray.data.from_items(rows)

    rule = DomainBlockRule(name="url.block",
                           domains={"bad.com", "BBC.co.uk"})
    out = {r["id"]: r for r in RuleSet([rule]).evaluate(ds).take_all()}
    assert {i: out[i]["keep"] for i in out} == {
        1: False, 2: True, 3: False, 4: False, 5: True}
    assert out[1]["drop_rule"] == "url.block"

    # domains_file config path (comments + blanks ignored)
    bl = tmp_path / "blocklist.txt"
    bl.write_text("# UT1 snapshot\nbad.com\n\nbbc.co.uk\n")
    rs = rules_from_config({"rules": [
        {"type": "domain_block", "name": "url.block",
         "domains_file": str(bl)}]})
    out2 = {r["id"]: r["keep"] for r in rs.evaluate(ds).take_all()}
    assert out2 == {i: out[i]["keep"] for i in out}

    # object-store blocklist (the UT1-sized path)
    ref = ray.put(pa.array(["bad.com", "bbc.co.uk"], type=pa.string()))
    rule3 = DomainBlockRule(name="url.block", domains_ref=ref)
    out3 = {r["id"]: r["keep"]
            for r in RuleSet([rule3]).evaluate(ds).take_all()}
    assert out3 == out2

    # MIXED-CASE object-store blocklist must behave like the inline
    # path (which lowercases): extracted domains are always lowercase,
    # so the ref list is lowered before probing
    ref_mc = ray.put(pa.array(["BAD.com", "Bbc.CO.UK"], type=pa.string()))
    rule4 = DomainBlockRule(name="url.block", domains_ref=ref_mc)
    out4 = {r["id"]: r["keep"]
            for r in RuleSet([rule4]).evaluate(ds).take_all()}
    assert out4 == out2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="domain_block"):
        rules_from_config({"rules": [
            {"type": "domain_block", "name": "n"}]})

    # --block-domains shorthand: appends 'url.blocklist' to an existing
    # config (path or inline or none) as inline JSON
    from dataguards_ray.rules.config import merge_block_domains

    merged = rules_from_config(merge_block_domains(None, str(bl)))
    assert [r.name for r in merged.rules] == ["url.blocklist"]
    base = tmp_path / "base.json"
    base.write_text('{"rules": [{"type": "range", "name": "x.range", '
                    '"col": "x", "lo": 0}]}')
    merged2 = rules_from_config(merge_block_domains(str(base), str(bl)))
    assert [r.name for r in merged2.rules] == ["x.range", "url.blocklist"]
    out4 = {r["id"]: r["keep"] for r in merged2.evaluate(ds).take_all()}
    assert out4 == out2  # x passes everywhere; blocklist decides


def test_check_job_end_to_end(tmp_path, ray_session):
    """dg check: config-driven violations over parquet + JSON summary."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from jobs.check_job import run_check_job

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist([
        {"id": 1, "price": 10.0, "status": "O"},
        {"id": 2, "price": -5.0, "status": "O"},   # range violation
        {"id": 3, "price": 20.0, "status": "X"},   # status violation
        {"id": 3, "price": 30.0, "status": "F"},   # dup id
    ]), str(src / "p.parquet"))
    cfg = {"rules": [
        {"type": "range", "name": "price.pos", "col": "price", "lo": 0},
        {"type": "predicate", "name": "status.known", "all_of": [
            {"col": "status", "op": "in", "value": ["O", "F", "P"]}]},
        {"type": "unique", "name": "id.unique", "cols": ["id"]},
    ]}
    cfg_path = tmp_path / "rules.json"
    cfg_path.write_text(json.dumps(cfg))

    res = run_check_job(str(src), str(cfg_path),
                        out_dir=str(tmp_path / "out"), violations_only=True)
    assert res["rows"] == 4 and res["violations"] == 3
    assert res["rule_drops"] == {"price.pos": 1, "status.known": 1,
                                 "id.unique": 2}
    bad = ray.data.read_parquet(str(tmp_path / "out"))
    assert bad.count() == 3
    assert all(not r["keep"] for r in bad.take_all())


def test_randomized_differential_rule_configs(ray_session):
    """Seeded-random differential suite vs DuckDB for the declarative
    config loader: random range/regex/predicate/cfd/unique rules over
    random tables with NULLs — per-row keep, drop_rule (first violated
    in config order) and the full hit set must match SQL semantics."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dataguards_ray.rules.config import rules_from_config

    pool = ["Alpha one", "beta TWO", "gamma3", "Delta#4", "epsilon five"]
    for seed in (3, 19, 57):
        rng = np.random.default_rng(seed)
        n = 300
        v = rng.integers(-50, 50, size=n).astype(object)
        w = rng.integers(-50, 50, size=n).astype(object)
        s = rng.choice(pool, size=n).astype(object)
        grp = rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1]).astype(object)
        for col in (v, w, s, grp):
            col[rng.random(n) < 0.12] = None
        tbl = pa.table({
            "id": pa.array(np.arange(n), type=pa.int64()),
            "v": pa.array(list(v), type=pa.int64()),
            "w": pa.array(list(w), type=pa.int64()),
            "s": pa.array(list(s), type=pa.string()),
            "grp": pa.array(list(grp), type=pa.string()),
        })
        lo, hi = sorted(rng.integers(-40, 40, size=2).tolist())
        cut = int(rng.integers(-30, 30))
        cfd_c = int(rng.integers(-50, 50))
        cfg = {"rules": [
            {"type": "range", "name": "r.range", "col": "v",
             "lo": lo, "hi": hi},
            {"type": "regex", "name": "r.regex", "col": "s",
             "pattern": "a", "must_match": bool(rng.integers(0, 2))},
            {"type": "predicate", "name": "r.pred", "all_of": [
                {"col": "grp", "op": "in", "value": ["a", "b"]},
                {"col": "v", "op": "<", "col2": "w"},
                {"col": "w", "op": ">=", "value": cut}]},
            {"type": "cfd", "name": "r.cfd", "lhs": ["grp"], "rhs": "v",
             "tableau": [{"grp": "a", "v": cfd_c}]},
            {"type": "unique", "name": "r.uniq", "cols": ["v"]},
        ]}
        must = cfg["rules"][1]["must_match"]
        rs = rules_from_config(cfg)
        got = {}
        out = rs.evaluate(ray.data.from_arrow(tbl).repartition(4))
        for r in out.take_all():
            got[r["id"]] = (sorted(r["rule_hits"]), r["keep"], r["drop_rule"])

        con = duckdb.connect()
        con.register("t", tbl)
        flags = {
            "r.range": f"(v IS NULL OR NOT (v >= {lo} AND v <= {hi}))",
            "r.regex": ("(s IS NULL OR NOT regexp_matches(s, 'a'))" if must
                        else "(s IS NOT NULL AND regexp_matches(s, 'a'))"),
            "r.pred": ("(grp IS NULL OR grp NOT IN ('a','b')"
                       " OR v IS NULL OR w IS NULL OR NOT (v < w)"
                       f" OR NOT (w >= {cut}))"),
            "r.cfd": f"(grp = 'a' AND (v IS NULL OR v != {cfd_c}))",
            "r.uniq": ("(v IS NOT NULL AND "
                       "COUNT(*) OVER (PARTITION BY v) > 1)"),
        }
        sel = ", ".join(f"COALESCE({e}, FALSE) AS \"{k}\""
                        for k, e in flags.items())
        want = {}
        for row in con.sql(f"SELECT id, {sel} FROM t").fetchall():
            rid, hits = row[0], [k for k, hit in zip(flags, row[1:]) if hit]
            want[rid] = (sorted(hits), not hits, hits[0] if hits else None)
        assert got == want, f"seed {seed}"


def test_filter_pipeline_extra_rules(tmp_path, ray_session):
    """Declarative extra rules merged into the flagship gate: default
    run unchanged; with a config rule the kept set shrinks by exactly
    the rows the rule flags, drop_rule prefers the spec rule, and
    extra-only drops carry the extra rule name."""
    import json

    from dataguards_ray.pipeline import run_filter_job
    from tests.conftest import corpus_path

    src = corpus_path(300, seed=7)
    base_out = tmp_path / "base"
    rules_out = tmp_path / "extra"

    base = run_filter_job(str(src), str(base_out), concurrency=4)
    cfg = {"rules": [
        {"type": "predicate", "name": "user.lang_en_only", "all_of": [
            {"col": "lang_id", "op": "in", "value": ["en"]}]},
    ]}
    extra = run_filter_job(str(src), str(rules_out), concurrency=4,
                           rules_config=json.dumps(cfg))

    import ray.data

    kept_base = ray.data.read_parquet(
        str(base_out)).select_columns(["url", "lang_id"]).take_all()
    kept_extra = {r["url"] for r in ray.data.read_parquet(
        str(rules_out)).select_columns(["url"]).take_all()}
    want = {r["url"] for r in kept_base if r["lang_id"] == "en"}
    assert kept_extra == want
    # lineage counters see the extra rule
    drops = {}
    for rec in extra:
        rc = rec.get("rule_counts") or {}
        items = rc.items() if isinstance(rc, dict) else [
            (d["rule"], d["n"]) for d in rc]
        for rule, n in items:
            drops[rule] = drops.get(rule, 0) + n
    assert drops.get("user.lang_en_only", 0) > 0


def test_check_job_clean_data_violations_only(tmp_path, ray_session):
    """Review r03: clean data + --out --violations-only must report
    zero, not crash on the empty write's read-back."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.check_job import run_check_job

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(
        [{"id": 1, "price": 10.0}, {"id": 2, "price": 20.0}]),
        str(src / "p.parquet"))
    cfg = {"rules": [
        {"type": "range", "name": "price.pos", "col": "price", "lo": 0}]}
    res = run_check_job(str(src), json.dumps(cfg),
                        out_dir=str(tmp_path / "out"), violations_only=True)
    assert res == {"rows": 2, "violations": 0, "rule_drops": {}}


def test_merge_extra_rules_gates_only_survivors(ray_session):
    """Review r03: extra rules must not re-flag rows the spec already
    dropped (their payload is slimmed in the streaming run)."""
    import ray.data

    from dataguards_ray.rules.config import rules_from_config
    from dataguards_ray.rules.dsl import merge_extra_rules

    rows = [
        {"id": 1, "text_scrubbed": "", "rule_hits": ["spec.len"],
         "keep": False, "drop_rule": "spec.len"},          # slimmed drop
        {"id": 2, "text_scrubbed": "short", "rule_hits": [],
         "keep": True, "drop_rule": None},                 # survivor, hits
        {"id": 3, "text_scrubbed": "long enough text here", "rule_hits": [],
         "keep": True, "drop_rule": None},                 # survivor, clean
    ]
    rs = rules_from_config({"rules": [
        {"type": "regex", "name": "user.long", "col": "text_scrubbed",
         "pattern": "enough"}]})
    out = {r["id"]: r for r in merge_extra_rules(
        ray.data.from_items(rows), rs).take_all()}
    assert out[1]["rule_hits"] == ["spec.len"]          # NOT re-flagged
    assert out[1]["drop_rule"] == "spec.len"
    assert out[2]["rule_hits"] == ["user.long"] and not out[2]["keep"]
    assert out[3]["rule_hits"] == [] and out[3]["keep"]


def test_resume_with_groupwise_extra_rules_raises(tmp_path, ray_session):
    """Review r03: resuming with a group-wise extra rule would evaluate
    it over partial groups — must refuse."""
    import pytest as _pytest

    from dataguards_ray.pipeline import run_filter_job
    from tests.conftest import corpus_path

    src = corpus_path(300, seed=7)
    out = tmp_path / "run"
    cfg = {"rules": [{"type": "unique", "name": "user.uniq",
                      "cols": ["lang_id"]}]}
    run_filter_job(str(src), str(out), concurrency=4, rules_config=cfg)
    with _pytest.raises(ValueError, match="group-wise"):
        run_filter_job(str(src), str(out), concurrency=4, resume=True,
                       rules_config=cfg)


def test_merge_extra_rules_groupwise_ignores_dropped(ray_session):
    """Review r03 #2: a group-wise extra rule must not let DROPPED rows
    contaminate survivors' groups — a survivor whose key is unique among
    survivors stays kept even when a dropped row shares it."""
    import ray.data

    from dataguards_ray.rules.config import rules_from_config
    from dataguards_ray.rules.dsl import merge_extra_rules

    rows = [
        # dropped by spec; shares url with survivor 2
        {"id": 1, "url": "http://x/a", "rule_hits": ["spec.len"],
         "keep": False, "drop_rule": "spec.len"},
        {"id": 2, "url": "http://x/a", "rule_hits": [],
         "keep": True, "drop_rule": None},
        # two SURVIVORS sharing a url → both flagged by unique
        {"id": 3, "url": "http://x/b", "rule_hits": [],
         "keep": True, "drop_rule": None},
        {"id": 4, "url": "http://x/b", "rule_hits": [],
         "keep": True, "drop_rule": None},
    ]
    rs = rules_from_config({"rules": [
        {"type": "unique", "name": "user.url_unique", "cols": ["url"]}]})
    out = {r["id"]: r for r in merge_extra_rules(
        ray.data.from_items(rows).repartition(2), rs).take_all()}
    assert len(out) == 4
    assert out[1]["keep"] is False and out[1]["rule_hits"] == ["spec.len"]
    assert out[2]["keep"] is True and out[2]["rule_hits"] == []  # not contaminated
    assert out[3]["rule_hits"] == ["user.url_unique"]
    assert out[4]["rule_hits"] == ["user.url_unique"]


def test_codec_corrupt_blobs_raise_cleanly():
    """Review r03 #2/#3: truncated/corrupt blobs raise ValueError (or
    the documented NotImplementedError), never hang or leak raw
    struct/zlib errors."""
    import pytest as _pytest

    from dataguards_ray.codecs import decode_image, decode_ppm
    from dataguards_ray.multimodal import _decode_audio_one, _decode_one

    with _pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6 10 10")  # used to hang forever
    with _pytest.raises(ValueError, match="corrupt"):
        decode_image(b"BM" + b"\x00" * 8)  # truncated BMP header
    with _pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)  # truncated PNG
    with _pytest.raises(ValueError):
        _decode_one(b"\xff\xd8\xff\xe0JFIF")  # JPEG now decodes for real
        # (round 4): a truncated blob is a corrupt recognized format
    with _pytest.raises(NotImplementedError):
        _decode_audio_one(b"RIFF\x00\x00\x00\x00AVI LIST")  # RIFF non-WAV
    with _pytest.raises(ValueError):
        _decode_audio_one(b"RIFF\x04\x00\x00\x00WAVEfmt")  # truncated WAV


def test_rule_config_missing_keys_name_the_rule():
    """A config typo ("column" for "col", a missing tableau) fails as a
    ValueError naming the rule and the missing key — never a raw
    KeyError traceback (found probing `dg check` with a hand-written
    config)."""
    from dataguards_ray.rules.config import rule_from_config

    cases = [
        ({"type": "range", "name": "r", "column": "x", "lo": 0},
         "range rule 'r' needs 'col'"),
        ({"type": "regex", "name": "g", "col": "x"},
         "regex rule 'g' needs 'pattern'"),
        ({"type": "cfd", "name": "c", "lhs": ["a"], "rhs": "b"},
         "cfd rule 'c' needs 'tableau'"),
        ({"type": "dc", "name": "d", "pair_atoms": [{"left": "a"}]},
         "dc rule 'd' atom needs 'op'"),
        ({"type": "unique", "name": "u"},
         "unique rule 'u' needs 'cols'"),
        ({"type": "inclusion", "name": "i", "cols": ["a"]},
         "inclusion rule 'i' needs 'ref_table'"),
        ({"type": "predicate", "name": "p",
          "all_of": [{"column": "x", "op": "=="}]},
         "predicate needs 'col'"),
    ]
    for cfg, msg in cases:
        with pytest.raises(ValueError, match=""):
            try:
                rule_from_config(cfg)
            except ValueError as e:
                assert msg in str(e), (cfg, str(e))
                raise
