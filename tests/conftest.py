"""Session-scoped Ray + shared fixture corpora / golden labels.

Ray is initialised ONCE per pytest session (driver contract / SURVEY §5).
Fixture corpora and oracle golden labels are cached under /tmp keyed by
(n, seed) — the oracle is sequential and the corpus deterministic, so a
cache hit is byte-equivalent to a fresh run.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_001 = "/root/testdata/sf0.001"
SF_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


def _spec_hash() -> str:
    """Cache key component: golden labels/corpora depend on the frozen
    spec + measures + textproc + model artifacts."""
    import hashlib

    import dataguards_ray

    root = os.path.dirname(dataguards_ray.__file__)
    h = hashlib.sha256()
    for rel in ("spec.py", "measures.py", "textproc.py", "langid.py", "perplexity.py"):
        with open(os.path.join(root, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def corpus_path(n: int, seed: int = 42) -> str:
    """Deterministic pages corpus parquet, cached in /tmp."""
    from fixtures.gen import pages_parquet

    path = f"/tmp/dg_fixtures/pages_n{n}_s{seed}.parquet"
    if not os.path.exists(path):
        pages_parquet(path, n, seed)
    return path


def golden_path(n: int, seed: int = 42) -> str:
    """Oracle golden labels for corpus (n, seed), cached in /tmp."""
    from oracle.oracle import oracle_run

    path = f"/tmp/dg_fixtures/golden_n{n}_s{seed}_{_spec_hash()}.parquet"
    if not os.path.exists(path):
        res = oracle_run(pq.read_table(corpus_path(n, seed)))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(res["golden"], path + ".tmp")
        os.replace(path + ".tmp", path)
    return path


@pytest.fixture(scope="session")
def corpus500() -> pa.Table:
    return pq.read_table(corpus_path(500))


@pytest.fixture(scope="session")
def golden500() -> pa.Table:
    return pq.read_table(golden_path(500))
