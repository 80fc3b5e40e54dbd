"""fastText-style language ID: linear model over hashed char n-grams.

Design per Joulin et al. 2017 ([FASTTEXT], SURVEY.md §2.4 A1): a linear
classifier over a hashed bag of character n-grams (orders 1–4), softmax
over spec.LANGS, with fastText's length normalization (mean feature
log-weight, so logits don't grow with document length).  Weights are
trained deterministically (closed-form multinomial Naive Bayes counts —
no SGD, no RNG) by models/train_models.py over langdata.training_corpus
and shipped as ``dataguards_ray/models_data/langid.npz``.

ONE scoring kernel (`score_batch`) is shared by the Ray actor stage and
the scalar oracle so (lang_id, lang_score) are bit-identical in both
(float64 elementwise ops + per-doc reductions only).
"""

from __future__ import annotations

import os

import numpy as np

from . import spec

_MODEL_PATH = os.path.join(os.path.dirname(__file__), "models_data", "langid.npz")

_B = np.uint64(spec.LANGID_HASH_BASE)
_DIM = np.uint64(spec.LANGID_DIM)

UND = "und"  # returned for docs with no hashable content


def char_codes(text: str) -> np.ndarray:
    """Codepoints of the first LANGID_MAX_CHARS chars, as uint64."""
    t = text[: spec.LANGID_MAX_CHARS]
    return np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)


def ngram_buckets(text: str) -> np.ndarray:
    """Hashed feature buckets of all char n-grams, orders 1–4 (uint64 < DIM).

    Polynomial rolling hash h = ((h*B) + cp + 1) mod 2^64, bucket = h % DIM.
    Order of the returned array is frozen: all 1-grams, then 2-grams, …
    """
    cp = char_codes(text)
    n = len(cp)
    outs = []
    with np.errstate(over="ignore"):
        h = np.zeros(0, dtype=np.uint64)
        for order in spec.LANGID_NGRAM_ORDERS:
            if n < order:
                break
            if order == 1:
                h = cp + np.uint64(1)
            else:
                h = h[:-1] * _B + (cp[order - 1 :] + np.uint64(1))
            outs.append(h % _DIM)
    if not outs:
        return np.zeros(0, dtype=np.uint64)
    return np.concatenate(outs)


def load_model(path: str = _MODEL_PATH) -> np.ndarray:
    """W: (LANGID_DIM, n_langs) float64 log-probability weights."""
    with np.load(path) as z:
        w = z["W"]
        langs = [str(x) for x in z["langs"]]
    assert tuple(langs) == spec.LANGS, f"model langs {langs} != spec {spec.LANGS}"
    return np.ascontiguousarray(w, dtype=np.float64)


def score_batch(texts: list[str], W: np.ndarray) -> tuple[list[str], np.ndarray]:
    """(lang_id, lang_score float32) per text.  Deterministic per doc.

    logits[l] = mean over the doc's feature buckets of W[bucket, l]
    (np.add.reduceat → sequential per-doc sum, batch-composition-invariant);
    score = softmax(logits) max; lang = argmax (ties → first in LANGS).
    """
    buckets: list[np.ndarray] = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = ngram_buckets(t if t is not None else "")
        buckets.append(b)
        lens[i] = len(b)
    langs_out = [UND] * len(texts)
    scores = np.zeros(len(texts), dtype=np.float32)
    if not texts:
        return langs_out, scores
    nonempty = np.nonzero(lens > 0)[0]
    if nonempty.size:
        # per-doc bucket-count × weight matvec: O(DIM·L) flops per doc and
        # no per-gram row gather; count vector is a pure function of the
        # doc, so scores are batch-composition-invariant.
        dim = W.shape[0]
        means = np.empty((nonempty.size, W.shape[1]), dtype=np.float64)
        for j, i in enumerate(nonempty):
            counts = np.bincount(buckets[i].astype(np.int64), minlength=dim)
            means[j] = (counts @ W) / lens[i]
        shifted = means - means.max(axis=1, keepdims=True)
        e = np.exp(shifted)
        probs = e / e.sum(axis=1, keepdims=True)
        best = probs.argmax(axis=1)
        for j, i in enumerate(nonempty):
            langs_out[i] = spec.LANGS[best[j]]
            scores[i] = np.float32(probs[j, best[j]])
    return langs_out, scores


def score_one(text: str, W: np.ndarray) -> tuple[str, float]:
    """Scalar path (oracle): same kernel, batch of one → bit-identical."""
    langs, scores = score_batch([text], W)
    return langs[0], float(scores[0])
