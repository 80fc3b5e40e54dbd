"""fastText-style quality classifier (round-4 verdict item #3):
P(clean | doc) from a binary linear model over the SAME hashed char
n-gram features as langid (langid.ngram_buckets — orders 1–4,
LANGID_DIM buckets), with fastText's length normalization.

Weights are trained deterministically (closed-form multinomial
Naive-Bayes counts — no SGD, no RNG at runtime) by
models/train_models.py::train_quality over synthetic clean docs
(langdata.clean_doc, all spec.LANGS) vs LEXICALLY-DEGENERATE junk
(fixtures.gen gibberish + non-alpha floods), and shipped as
``dataguards_ray/models_data/quality.npz`` together with a calibration
temperature (score = sigmoid(T·(mean clean log-weight − mean junk
log-weight)); T chosen once so held-out clean p01 ≥ 0.99 and junk
p99 ≤ 0.01 — Platt-style scaling of the NB margin).

SCOPE (measured, models/train_models.py::calibrate_quality): a
bag-of-char-n-grams linear model separates lexical junk perfectly
(held-out margin gap ≈ 0.9 between clean p01 and junk p90) but is
structurally blind — duplicated lines, bullet walls, symbol spam,
length violations and missing stopwords share clean docs' n-gram
distribution by construction and stay near score 1.  Those are exactly
what the 15 frozen heuristic rules catch; the model is the SOFT,
vocabulary-level complement (the Gopher/CCNet two-signal design:
heuristics for structure, model for lexical quality).

ONE scoring kernel (`score_batch`) is shared by the Ray stage
(steps/annotate.py QualityStage / the fused chain's opt-in
quality_score column) and the scalar oracle path (`score_one`) —
float64 elementwise ops + per-doc reductions only, so quality_score is
bit-identical at any parallelism or batch composition (same contract
as langid.score_batch; tests/test_quality.py).

The model score is a SOFT signal: the flagship's 15 frozen heuristic
rules stay the keep/drop authority (golden labels are pinned), and the
model rides as an OPT-IN column + declarative gate
(``dg filter --quality-tau τ`` ⇒ drop rows with quality_score < τ —
wired through the same merge_extra_rules path as user rule configs).
"""

from __future__ import annotations

import os

import numpy as np

from . import langid

_MODEL_PATH = os.path.join(os.path.dirname(__file__), "models_data", "quality.npz")

#: classifier classes, column order of W (frozen by the trainer)
CLASSES = ("junk", "clean")

#: default gate threshold for --quality-tau with no value: the held-out
#: score distributions are saturated bimodal (clean p01 ≥ 0.99, junk
#: p99 ≤ 0.01 after temperature calibration), so the midpoint is robust
DEFAULT_TAU = 0.5


def load_model(path: str = _MODEL_PATH) -> "tuple[np.ndarray, float]":
    """(W, T): W (LANGID_DIM, 2) float64 log-probability weights with
    columns ordered per CLASSES, T the frozen calibration temperature."""
    with np.load(path) as z:
        w = z["W"]
        classes = [str(x) for x in z["classes"]]
        t = float(z["temperature"])
    assert tuple(classes) == CLASSES, f"model classes {classes} != {CLASSES}"
    return np.ascontiguousarray(w, dtype=np.float64), t


def score_batch(texts: "list[str | None]", W: np.ndarray,
                T: float) -> np.ndarray:
    """P(clean) per text as float32.  Deterministic per doc.

    margin = mean over the doc's feature buckets of
    (W[bucket, clean] − W[bucket, junk]) (bincount matvec — the count
    vector is a pure function of the doc, so scores are
    batch-composition-invariant); score = sigmoid(T · margin).  Docs
    with no hashable content (empty/None) carry no evidence of
    cleanliness → score 0.0 (junk-by-default, mirroring langid's UND).
    """
    n = len(texts)
    scores = np.zeros(n, dtype=np.float32)
    if n == 0:
        return scores
    dim = W.shape[0]
    d = W[:, CLASSES.index("clean")] - W[:, CLASSES.index("junk")]
    for i, t in enumerate(texts):
        b = langid.ngram_buckets(t if t is not None else "")
        if len(b) == 0:
            continue
        counts = np.bincount(b.astype(np.int64), minlength=dim)
        margin = (counts @ d) / len(b)
        scores[i] = np.float32(1.0 / (1.0 + np.exp(-T * margin)))
    return scores


def score_one(text: str, W: np.ndarray, T: float) -> float:
    """Scalar path (oracle): same kernel, batch of one → bit-identical."""
    return float(score_batch([text], W, T)[0])


_CACHED: "tuple[np.ndarray, float] | None" = None


def add_quality_score(ds, text_col: str = "text",
                      out_col: str = "quality_score"):
    """+ ``out_col`` = P(clean) float32 over ``text_col``.  Task-pool
    stage with a per-worker-process model singleton (same init
    amortization as an actor's __init__ — see steps/annotate.py's
    fused_annotate_batch for the measured rationale)."""
    import pyarrow as pa

    def f(batch: pa.Table) -> pa.Table:
        global _CACHED
        if _CACHED is None:
            _CACHED = load_model()
        W, T = _CACHED
        scores = score_batch(batch.column(text_col).to_pylist(), W, T)
        return batch.append_column(out_col, pa.array(scores, type=pa.float32()))

    return ds.map_batches(f, batch_format="pyarrow")
