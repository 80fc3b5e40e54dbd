"""Declarative rule configs (JSON-shaped dicts) → RuleSet.

The DataGuards user surface is rules-as-DATA: a config file declares
conditional functional dependencies, denial constraints, range/regex/
predicate checks and integrity constraints, and the engine compiles
them into vectorized map_batches stages / keyed shuffles (SURVEY §2.2
R6).  This module is the loader; ``dg check`` (jobs/check_job.py) is
the runnable entry.

Config shape (top level: {"rules": [...]}; every rule needs a unique
"name" — canonical evaluation order = list order, so ``drop_rule`` is
the FIRST violated rule in config order):

  {"type": "range",  "name": "price.range", "col": "price",
   "lo": 0, "hi": 1000000}                      # nulls violate
  {"type": "regex",  "name": "clerk.format", "col": "clerk",
   "pattern": "^Clerk#", "must_match": true}
  {"type": "predicate", "name": "status.known", "all_of": [
      {"col": "status", "op": "in", "value": ["O", "F", "P"]}]}
      # op ∈ ==/!=/</<=/>/>=/in/not_in/is_null/not_null/between/
      #      matches/not_matches; "col2" compares two columns;
      #      violation = any listed predicate FAILS
  {"type": "cfd", "name": "zip.city", "lhs": ["zip"], "rhs": "city",
   "tableau": [{"zip": "_", "city": "_"}]}      # "_" = wildcard [CFD]
  {"type": "dc", "name": "no.pair", "single": [pred...],
   "eq_keys": ["k"], "pair_atoms": [
      {"left": "ship_ts", "op": "<", "right": "order_ts"}]}   # [DC]
  {"type": "domain_block", "name": "url.blocklist", "col": "url",
   "domains": ["bad.com"]}    # or "domains_file": one domain per line,
                              # '#'-comments allowed; nulls pass;
                              # "match": either|domain|host (default
                              # either — UT1 lists mix granularities)
  {"type": "unique", "name": "pk.unique", "cols": ["id"]}
  {"type": "inclusion", "name": "fk.nation", "cols": ["nation_key"],
   "ref_table": "/path/to/nation.parquet", "ref_cols": ["n_nationkey"]}

``inclusion`` resolves ``ref_table`` through ``resolve_table`` (default:
``ray.data.read_parquet`` of the path, pruned to ``ref_cols``).
"""

from __future__ import annotations

import json
from typing import Any, Callable

from .cfd import CFD
from .dc import Atom, DenialConstraint
from .dsl import (DomainBlockRule, Predicate, PredicateRule, RangeRule,
                  RegexRule, Rule, RuleSet)
from .integrity import InclusionRule, UniqueRule


def _req(d: dict[str, Any], key: str, what: str) -> Any:
    """d[key] with a config error naming the rule and the missing key
    (a raw KeyError traceback told a user typing "column" for "col"
    nothing about which rule or what to fix)."""
    try:
        return d[key]
    except KeyError:
        raise ValueError(
            f"{what} needs {key!r} (got keys {sorted(d)}): {d!r}") from None


def _predicate(d: dict[str, Any]) -> Predicate:
    value = d.get("value")
    if d.get("op") == "between" and isinstance(value, list):
        value = tuple(value)
    return Predicate(col=_req(d, "col", "predicate"),
                     op=_req(d, "op", "predicate"), value=value,
                     col2=d.get("col2"))


def rule_from_config(
    d: dict[str, Any],
    *,
    resolve_table: "Callable[[str], Any] | None" = None,
) -> Rule:
    t = d.get("type")
    name = d.get("name")
    if not name:
        raise ValueError(f"rule config needs a 'name': {d!r}")
    if t == "range":
        return RangeRule(name=name, col=_req(d, "col", f"range rule {name!r}"), lo=d.get("lo"),
                         hi=d.get("hi"))
    if t == "regex":
        return RegexRule(name=name, col=_req(d, "col", f"regex rule {name!r}"),
                         pattern=_req(d, "pattern", f"regex rule {name!r}"),
                         must_match=bool(d.get("must_match", True)))
    if t == "predicate":
        preds = [_predicate(p) for p in d.get("all_of", d.get("predicates", []))]
        if not preds:
            raise ValueError(f"predicate rule {name!r} needs 'all_of'")
        return PredicateRule(name=name, predicates=preds)
    if t == "cfd":
        return CFD(name=name, lhs=list(_req(d, "lhs", f"cfd rule {name!r}")),
                   rhs=_req(d, "rhs", f"cfd rule {name!r}"),
                   tableau=[dict(row) for row in
                            _req(d, "tableau", f"cfd rule {name!r}")])
    if t == "dc":
        return DenialConstraint(
            name=name,
            single=[_predicate(p) for p in d.get("single", [])],
            eq_keys=list(d.get("eq_keys", [])),
            pair_atoms=[Atom(_req(a, "left", f"dc rule {name!r} atom"),
                             _req(a, "op", f"dc rule {name!r} atom"),
                             _req(a, "right", f"dc rule {name!r} atom"))
                        for a in d.get("pair_atoms", [])],
        )
    if t == "domain_block":
        domains = d.get("domains")
        if domains is None and d.get("domains_file"):
            with open(d["domains_file"]) as f:
                domains = [ln.strip() for ln in f if ln.strip()
                           and not ln.lstrip().startswith("#")]
        if not domains:
            raise ValueError(f"domain_block rule {name!r} needs 'domains' "
                             "or a non-empty 'domains_file'")
        return DomainBlockRule(name=name, col=d.get("col", "url"),
                               domains=frozenset(domains),
                               match=d.get("match", "either"))
    if t == "unique":
        return UniqueRule(name=name,
                          cols=list(_req(d, "cols", f"unique rule {name!r}")))
    if t == "inclusion":
        ref = _req(d, "ref_table", f"inclusion rule {name!r}")
        if resolve_table is not None:
            ref_ds = resolve_table(ref)
        else:
            import ray.data

            ref_ds = ray.data.read_parquet(
                ref, columns=list(_req(d, "ref_cols", f"inclusion rule {name!r}")))
        return InclusionRule(name=name,
                             cols=list(_req(d, "cols", f"inclusion rule {name!r}")),
                             ref_ds=ref_ds,
                             ref_cols=list(_req(d, "ref_cols", f"inclusion rule {name!r}")))
    raise ValueError(f"unknown rule type {t!r} in {d!r}")


def merge_block_domains(
    rules_cfg: "str | None",
    domains_file: str,
    *,
    col: str = "url",
    match: str = "either",
) -> str:
    """Append a UT1-style blocklist rule (named 'url.blocklist', read
    from ``domains_file``) to an optional existing config (path or
    inline JSON); returns inline JSON, accepted anywhere a config path
    is.  Backs the jobs' ``--block-domains FILE`` convenience flag —
    operators have a blocklist file, not a rules JSON."""
    cfg: Any = {"rules": []}
    if rules_cfg:
        s = rules_cfg.strip()
        if s.startswith("{") or s.startswith("["):
            cfg = json.loads(s)
        else:
            with open(rules_cfg) as f:
                cfg = json.load(f)
        if isinstance(cfg, list):
            cfg = {"rules": cfg}
    cfg["rules"].append({"type": "domain_block", "name": "url.blocklist",
                         "col": col, "domains_file": domains_file,
                         "match": match})
    return json.dumps(cfg)


def rules_from_config(
    cfg: "dict[str, Any] | list | str",
    *,
    resolve_table: "Callable[[str], Any] | None" = None,
) -> RuleSet:
    """Build a RuleSet from a config dict, a bare rule list, a JSON
    string, or a path to a JSON file."""
    if isinstance(cfg, str):
        s = cfg.strip()
        if s.startswith("{") or s.startswith("["):
            cfg = json.loads(s)
        else:
            with open(cfg) as f:
                cfg = json.load(f)
    rules = cfg["rules"] if isinstance(cfg, dict) else cfg
    names = [d.get("name") for d in rules]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate rule names: {dupes}")
    return RuleSet([rule_from_config(d, resolve_table=resolve_table)
                    for d in rules])
