"""DSIR (hashed-n-gram importance resampling) and mixture sampling:
scalar-oracle bit-parity, determinism, parallelism invariance."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from dataguards_ray import spec

SF_001 = "/root/testdata/sf0.001"

U64 = (1 << 64) - 1
FNV_PRIME = 0x100000001B3


# -- scalar (pure-Python) reimplementation of the frozen DSIR feature map --

def _scalar_buckets(text, n_buckets):
    toks = spec.lm_tokens(text or "")
    hs = [spec.fnv1a64(t.encode("utf-8")) for t in toks]
    feats = list(hs)
    feats += [((a * FNV_PRIME) + b) & U64 for a, b in zip(hs, hs[1:])]
    return np.asarray([f % n_buckets for f in feats], dtype=np.int64)


def _scalar_dist(texts, n_buckets):
    cnt = np.zeros(n_buckets, dtype=np.int64)
    for t in texts:
        fb = _scalar_buckets(t, n_buckets)
        if len(fb):
            cnt += np.bincount(fb, minlength=n_buckets)
    return (cnt + 1.0) / float(cnt.sum() + n_buckets)


def test_feature_buckets_match_scalar():
    from dataguards_ray.dsir import batch_feature_buckets, feature_buckets

    cases = ["", None, "one", "two words", "a b c d e", "Héllo wörld 123"]
    batch = batch_feature_buckets(cases, 10_000)
    for t, fb in zip(cases, batch):
        want = _scalar_buckets(t, 10_000)
        assert np.array_equal(feature_buckets(t, 10_000), want)
        assert np.array_equal(fb, want)  # vectorized batch path parity
    assert batch_feature_buckets([], 10_000) == []
    assert all(len(x) == 0 for x in batch_feature_buckets(["", None], 64))


def test_dsir_log_weights_bit_identical_scalar_oracle(ray_session):
    """Distributed DSIR log-weights == scalar oracle, float64 bit-exact
    (same feature order, same np reduction) on the sf0.001 corpus."""
    import ray.data

    from dataguards_ray.dsir import dsir_log_weights

    tbl = pq.read_table(f"{SF_001}/documents.parquet",
                        columns=["doc_id", "text", "lang"])
    texts = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("text").to_pylist()))
    langs = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("lang").to_pylist()))
    B = 10_000
    p_t = _scalar_dist([t for d, t in texts.items() if langs[d] == "en"], B)
    p_r = _scalar_dist(list(texts.values()), B)
    lr = np.log(p_t) - np.log(p_r)
    want = {}
    for d, t in texts.items():
        fb = _scalar_buckets(t, B)
        want[d] = float(lr[fb].sum()) if len(fb) else 0.0

    docs = ray.data.read_parquet(
        f"{SF_001}/documents.parquet",
        columns=["doc_id", "text", "lang"]).repartition(5)
    target = docs.filter(lambda r: r["lang"] == "en")
    got = {r["doc_id"]: r["dsir_logw"]
           for r in dsir_log_weights(docs, target).take_all()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == want[d], (d, got[d], want[d])  # bit-exact float64


def test_dsir_resample_deterministic_and_invariant(ray_session):
    """Gumbel-top-k selection: exactly k rows, equals the scalar
    top-k, and invariant to input partitioning."""
    import ray.data

    from dataguards_ray.dsir import dsir_log_weights, dsir_resample, gumbel_key

    k, B = 25, 10_000

    def run(parts):
        docs = ray.data.read_parquet(
            f"{SF_001}/documents.parquet",
            columns=["doc_id", "text", "lang"]).repartition(parts)
        target = docs.filter(lambda r: r["lang"] == "en")
        out = dsir_resample(docs, target, k, seed=7).take_all()
        return [r["doc_id"] for r in out]

    a, b = run(2), run(9)
    assert len(a) == k and a == b  # deterministic incl. order

    # scalar top-k: weights from the bit-parity oracle + the same gumbel
    tbl = pq.read_table(f"{SF_001}/documents.parquet",
                        columns=["doc_id", "text", "lang"])
    texts = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("text").to_pylist()))
    langs = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("lang").to_pylist()))
    p_t = _scalar_dist([t for d, t in texts.items() if langs[d] == "en"], B)
    p_r = _scalar_dist(list(texts.values()), B)
    lr = np.log(p_t) - np.log(p_r)
    keys = []
    for d, t in texts.items():
        fb = _scalar_buckets(t, B)
        w = float(lr[fb].sum()) if len(fb) else 0.0
        keys.append((-(w + gumbel_key(t, d, 7)), d))
    want = [d for _, d in sorted(keys)[:k]]
    assert a == want


def test_gumbel_key_range_and_determinism():
    from dataguards_ray.dsir import gumbel_key

    a = gumbel_key("some text", 5, 0)
    assert a == gumbel_key("some text", 5, 0)
    assert a != gumbel_key("some text", 5, 1)  # seed matters
    assert a != gumbel_key("some text", 6, 0)  # id matters
    assert math.isfinite(a)
    assert math.isfinite(gumbel_key(None, 0, 0))
    assert math.isfinite(gumbel_key("", 0, 0))


def test_dsir_property_arbitrary_corpora(ray_session):
    """Hypothesis: distributed DSIR log-weights stay bit-identical to
    the scalar oracle for arbitrary corpora (unicode, empty docs,
    duplicated texts, tiny target)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import ray.data

    from dataguards_ray.dsir import dsir_log_weights

    WORD = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=0, max_size=6)
    DOC = st.lists(WORD, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(docs=st.lists(DOC, min_size=1, max_size=15),
           tmask=st.lists(st.booleans(), min_size=15, max_size=15))
    def inner(docs, tmask):
        B = 256  # small bucket space → collisions exercised
        rows = [{"doc_id": i, "text": t, "is_t": bool(tmask[i])}
                for i, t in enumerate(docs)]
        t_texts = [r["text"] for r in rows if r["is_t"]] or [rows[0]["text"]]
        p_t = _scalar_dist(t_texts, B)
        p_r = _scalar_dist([r["text"] for r in rows], B)
        lr = np.log(p_t) - np.log(p_r)
        want = {}
        for r in rows:
            fb = _scalar_buckets(r["text"], B)
            want[r["doc_id"]] = float(lr[fb].sum()) if len(fb) else 0.0

        ds = ray.data.from_items(rows).repartition(3)
        target = ray.data.from_items(
            [{"text": t} for t in t_texts])
        got = {r["doc_id"]: r["dsir_logw"]
               for r in dsir_log_weights(ds, target,
                                         n_buckets=B).take_all()}
        assert got == want

    inner()


def test_sample_mixture_matches_scalar_oracle(ray_session):
    """sample_mixture ≡ per-source windowed-cumsum scalar definition on
    a corpus with empty docs, duplicated texts and an unlisted source."""
    import ray.data

    from dataguards_ray.aggregates import sample_mixture

    rows = []
    for i in range(120):
        src = f"s{i % 4}"  # s3 is NOT in weights → dropped
        text = ("alpha beta gamma " * (i % 7)).strip()
        if i % 11 == 0:
            text = ""  # zero tokens
        if i % 13 == 0:
            text = "dup dup dup"  # duplicated text, id tiebreak
        rows.append({"doc_id": i, "text": text, "source": src})

    weights = {"s0": 2.0, "s1": 1.0, "s2": 1.0}
    budget = 200
    tot = float(sum(weights.values()))
    budgets = {s: int(w / tot * budget) for s, w in weights.items()}

    keep = set()
    for s in weights:
        scored = sorted(
            (hashlib.md5(r["text"].encode()).hexdigest(), r["doc_id"],
             len(re.findall(r"\w+", r["text"])))
            for r in rows if r["source"] == s)
        run = 0
        for h, d, n in scored:
            if run + n > budgets[s]:
                break
            run += n
            keep.add(d)

    ds = ray.data.from_items(rows).repartition(4)
    got = {r["doc_id"]
           for r in sample_mixture(ds, budget, weights).take_all()}
    assert got == keep
    assert not any(r["doc_id"] in got for r in rows if r["source"] == "s3")


def test_sample_mixture_whole_source_fits(ray_session):
    """A source whose docs fit its budget entirely is kept whole."""
    import ray.data

    from dataguards_ray.aggregates import sample_mixture

    rows = [{"doc_id": i, "text": "a b c", "source": "tiny"} for i in range(3)]
    rows += [{"doc_id": 100 + i, "text": "w " * 50, "source": "big"}
             for i in range(20)]
    ds = ray.data.from_items(rows)
    out = sample_mixture(ds, 100, {"tiny": 0.5, "big": 0.5})
    got = {r["doc_id"] for r in out.take_all()}
    assert {0, 1, 2} <= got  # tiny (9 tokens ≤ 50) kept whole


def test_sample_mixture_rejects_bad_weights(ray_session):
    import ray.data

    from dataguards_ray.aggregates import sample_mixture

    ds = ray.data.from_items([{"doc_id": 1, "text": "x", "source": "a"}])
    with pytest.raises(ValueError):
        sample_mixture(ds, 10, {})
    with pytest.raises(ValueError):
        sample_mixture(ds, 10, {"a": -1.0})
    with pytest.raises(ValueError):
        sample_mixture(ds, 10, {"a": 0.0})


def test_dsir_empty_corpus(ray_session):
    """Empty docs corpus → 0 selected rows, no crash.  Pins the
    fit_hashed_ngram_dist int cast: a ZERO-chunk Arrow int64 column
    round-trips through to_numpy as float64, which numpy rejects as a
    fancy index (found probing `dg sample --mode dsir` on an empty
    parquet)."""
    import pyarrow as pa
    import ray.data

    from dataguards_ray.dsir import dsir_resample, fit_hashed_ngram_dist

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    target = ray.data.from_items(
        [{"doc_id": i, "text": f"target text {i}"} for i in range(5)])

    dist = fit_hashed_ngram_dist(empty, n_buckets=64)
    assert dist.shape == (64,) and np.allclose(dist, 1.0 / 64)

    out = dsir_resample(empty, target, 3)
    assert out.count() == 0
