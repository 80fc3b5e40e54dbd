"""dataguards_ray — a Ray-Data-native webtext quality-filter engine.

A from-scratch rebuild of the capability set of ``visenger/DataGuards``
(reference checkout empty — see SURVEY.md §0; normative spec is
BASELINE.json:6/14/15): a declarative data-quality rule DSL (conditional
functional dependencies, denial constraints, regex/range predicates)
compiled into vectorized ``map_batches`` stages over zero-copy Arrow,
chained with language-ID, n-gram perplexity scoring, Gopher/C4-style
heuristic rules and regex PII/toxicity scrubbing, over Parquet-backed
``ray.data.Dataset``s.

Library code NEVER calls ``ray.init()`` / ``ray.shutdown()`` — sessions
are owned by ``bench.py``, CLI entry points and the test fixture only.
"""

from __future__ import annotations

__version__ = "0.2.0"

# drop Ray 2.49's harmless-but-flooding schema-hash warning in this
# process (see lognoise.py; session owners forward install() to workers
# via worker_process_setup_hook)
from . import lognoise as _lognoise  # noqa: E402

_lognoise.install()

# Curated top-level surface (heavy submodules stay lazy — import the
# module for the full API; nothing here triggers model loads or Ray).
from .rules import (  # noqa: F401
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
