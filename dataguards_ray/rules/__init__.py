"""Declarative data-quality rule DSL (SURVEY §2.2) — the DataGuards core:
predicates, range/regex rules, conditional functional dependencies and
denial constraints, compiled into vectorized map_batches stages (row-
local rules) plus groupby stages (pairwise/FD rules)."""

from .dsl import (  # noqa: F401
    Predicate,
    PredicateRule,
    RangeRule,
    RegexRule,
    RuleSet,
    violation_report,
)
from .cfd import CFD  # noqa: F401
from .dc import DenialConstraint, Atom  # noqa: F401
