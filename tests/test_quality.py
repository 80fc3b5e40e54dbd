"""Model-based quality classifier (quality.py) — kernel determinism,
held-out separation, Ray-stage ≡ scalar-oracle bit-identity, and the
``--quality-tau`` gate's chained-gates semantics through the flagship.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dataguards_ray import quality, spec  # noqa: E402
from tests.conftest import corpus_path  # noqa: E402


@pytest.fixture(scope="module")
def model():
    return quality.load_model()


def _docs(n: int = 64) -> list[str]:
    import pyarrow.parquet as pq

    t = pq.read_table(corpus_path(500), columns=["text"])
    return [x for x in t.column("text").to_pylist() if x][:n]


def test_scalar_equals_batch_bitwise(model):
    W, T = model
    docs = _docs()
    batch = quality.score_batch(docs, W, T)
    for i, d in enumerate(docs):
        assert quality.score_one(d, W, T) == batch[i]


def test_batch_composition_invariance(model):
    W, T = model
    docs = _docs()
    whole = quality.score_batch(docs, W, T)
    # odd split sizes + reversed order: scores must be positionally equal
    parts = np.concatenate(
        [quality.score_batch(docs[:7], W, T),
         quality.score_batch(docs[7:40], W, T),
         quality.score_batch(docs[40:], W, T)]
    )
    assert np.array_equal(whole, parts)
    rev = quality.score_batch(list(reversed(docs)), W, T)
    assert np.array_equal(whole, rev[::-1])


def test_empty_and_null_are_junk(model):
    W, T = model
    assert np.array_equal(
        quality.score_batch(["", None], W, T), np.zeros(2, dtype=np.float32)
    )


def test_heldout_separation(model):
    """Fresh doc stream (kind='test', never seen by trainer or
    calibrator): saturated-bimodal scores around DEFAULT_TAU."""
    from models.train_models import QUALITY_JUNK_CATS, _quality_doc

    W, T = model
    clean = [_quality_doc("test", "clean", spec.LANGS[i % len(spec.LANGS)], i)
             for i in range(60)]
    junk = [_quality_doc("test", QUALITY_JUNK_CATS[i % 2],
                         spec.LANGS[i % len(spec.LANGS)], i)
            for i in range(60)]
    sc = quality.score_batch(clean, W, T)
    sj = quality.score_batch(junk, W, T)
    assert sc.min() > 0.95
    assert sj.max() < 0.05


@pytest.mark.usefixtures("ray_session")
def test_ray_stage_matches_scalar(model):
    import ray.data

    W, T = model
    docs = _docs()
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs, type=pa.string())})
    out = (
        quality.add_quality_score(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .sort_values("doc_id")
    )
    expect = quality.score_batch(docs, W, T)
    assert np.array_equal(out["quality_score"].to_numpy(), expect)


@pytest.mark.usefixtures("ray_session")
def test_quality_gate_matches_oracle(tmp_path):
    """dg filter --quality-tau ≡ oracle_run(quality_tau=τ): same
    keep/drop_rule/rule_hits per url and bit-identical quality_score —
    including the chained-gates rule that already-dropped rows never
    record a quality.model hit."""
    import ray.data

    from dataguards_ray.pipeline import FilterPipeline
    from oracle.oracle import oracle_run

    # the fixture corpus has kept docs with marginal scores (min ~0.67
    # on this seed) and plenty of heuristic-dropped docs scoring < tau —
    # so a 0.95 gate both fires AND exercises chained-gates semantics
    tbl = pq.read_table(corpus_path(300))
    tau = 0.95
    golden = oracle_run(tbl, quality_tau=tau)["golden"].to_pandas()
    assert (golden["drop_rule"] == "quality.model").any(), "gate never fired"

    pipe = FilterPipeline(num_parts=4, quality_tau=tau)
    ann = pipe.annotate(ray.data.from_arrow(tbl)).to_pandas()

    a = ann.set_index("url").sort_index()
    g = golden.set_index("url").sort_index()
    assert set(a.index) == set(g.index)
    assert (a["keep"] == g["keep"]).all()
    assert (a["drop_rule"].fillna("") == g["drop_rule"].fillna("")).all()
    assert np.array_equal(
        a["quality_score"].to_numpy(dtype=np.float32),
        g["quality_score"].to_numpy(dtype=np.float32),
    )
    # chained gates: a row dropped by the frozen rules must not list
    # quality.model even when its score is below tau
    dropped_low = a[(a["drop_rule"].notna())
                    & (a["drop_rule"] != "quality.model")
                    & (a["quality_score"] < tau)]
    assert len(dropped_low) > 0, "no heuristic-dropped low-score rows to check"
    assert not dropped_low["rule_hits"].apply(
        lambda h: "quality.model" in list(h)).any()


@pytest.mark.usefixtures("ray_session")
def test_quality_gate_streaming_run(tmp_path):
    """The streaming write path (run with slim_dropped) honors the gate:
    survivors = oracle's dedup_keep set under quality_tau."""
    import ray.data  # noqa: F401

    from dataguards_ray import io as dg_io
    from dataguards_ray.pipeline import FilterPipeline
    from oracle.oracle import oracle_run

    tau = 0.95
    tbl = pq.read_table(corpus_path(300))
    inp = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, inp)

    golden = oracle_run(tbl, quality_tau=tau)
    out = str(tmp_path / "out")
    FilterPipeline(num_parts=4, quality_tau=tau).run(inp, out)
    kept = dg_io.read_filtered(out).to_pandas()
    assert sorted(kept["url"]) == golden["survivor_urls"]

    # checkpoint resume under the gate: delete two finished partitions
    # (kept parquet + lineage manifest), resume, survivors byte-equal
    import os

    done = sorted(dg_io.partitions_by_stage(out)["final"])
    for pid in done[:2]:
        os.remove(os.path.join(out, "_lineage", f"part-{pid:05d}.json"))
        for pref in ("part", "kept"):
            f = os.path.join(out, f"{pref}-{pid:05d}.parquet")
            if os.path.exists(f):
                os.remove(f)
    FilterPipeline(num_parts=4, quality_tau=tau).run(inp, out, resume=True)
    kept2 = dg_io.read_filtered(out).to_pandas()
    assert sorted(kept2["url"]) == golden["survivor_urls"]
    a = kept.sort_values("url").reset_index(drop=True)
    b = kept2.sort_values("url").reset_index(drop=True)
    assert (a["text_scrubbed"] == b["text_scrubbed"]).all()
    assert (a["quality_score"].astype("float32")
            == b["quality_score"].astype("float32")).all()
