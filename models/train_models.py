"""Deterministic offline training of the langid + LM artifacts.

Run once (``python models/train_models.py``); outputs are committed to
``dataguards_ray/models_data/`` and NEVER retrained implicitly — they are
part of the byte-determinism contract (SURVEY.md §2.4).

- langid.npz: multinomial-NB log-prob weights over hashed char n-grams
  (closed-form counting — no SGD, no RNG ⇒ bit-reproducible anywhere).
- lm_{lang}.npz: order-3 count tables (sorted int64 key arrays) for
  Stupid-Backoff perplexity.

Also prints the per-language perplexity calibration (66.7th percentile
of clean held-out docs) used ONCE to freeze spec.PPL_THRESHOLDS.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dataguards_ray import langdata, langid, perplexity, spec  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "dataguards_ray", "models_data")
N_TRAIN = 600  # docs per language
N_CALIB = 300


def train_langid() -> None:
    counts = np.ones((spec.LANGID_DIM, len(spec.LANGS)), dtype=np.float64)  # +1 smooth
    for li, lang in enumerate(spec.LANGS):
        for doc in langdata.training_corpus(lang, N_TRAIN):
            b = langid.ngram_buckets(doc)
            np.add.at(counts[:, li], b.astype(np.int64), 1.0)
    W = np.log(counts / counts.sum(axis=0, keepdims=True))
    np.savez_compressed(
        os.path.join(OUT_DIR, "langid.npz"),
        W=W,
        langs=np.array(spec.LANGS),
    )
    print(f"langid.npz: W {W.shape}, {os.path.getsize(os.path.join(OUT_DIR, 'langid.npz'))} bytes")


def train_lm(lang: str) -> None:
    vocab = langdata.vocab(lang)
    # lm_tokens lowercases; vocab entries must round-trip through the tokenizer
    vocab = sorted({t for w in vocab for t in spec.lm_tokens(w)})
    word2id = {w: i + 1 for i, w in enumerate(vocab)}
    K = len(vocab) + 1
    uni = np.zeros(K, dtype=np.int64)
    big: dict[int, int] = {}
    tri: dict[int, int] = {}
    for doc in langdata.training_corpus(lang, N_TRAIN):
        ids = [word2id.get(t, 0) for t in spec.lm_tokens(doc)]
        for i, w in enumerate(ids):
            uni[w] += 1
            if i >= 1:
                bk = ids[i - 1] * K + w
                big[bk] = big.get(bk, 0) + 1
            if i >= 2:
                tk = (ids[i - 2] * K + ids[i - 1]) * K + w
                tri[tk] = tri.get(tk, 0) + 1
    bk = np.array(sorted(big), dtype=np.int64)
    tk = np.array(sorted(tri), dtype=np.int64)
    np.savez_compressed(
        os.path.join(OUT_DIR, f"lm_{lang}.npz"),
        vocab=np.array(vocab),
        uni=uni,
        big_keys=bk,
        big_vals=np.array([big[k] for k in bk], dtype=np.int64),
        tri_keys=tk,
        tri_vals=np.array([tri[k] for k in tk], dtype=np.int64),
    )
    print(f"lm_{lang}.npz: V={len(vocab)} big={len(bk)} tri={len(tk)}")


def calibrate() -> None:
    W = langid.load_model()
    lms = perplexity.load_models()
    import random

    for lang in spec.LANGS:
        base = spec.fnv1a64(f"calib:{lang}:42".encode())
        docs = [
            langdata.clean_doc(random.Random(base ^ spec.fnv1a64(str(i).encode())), lang)
            for i in range(N_CALIB)
        ]
        langs_pred, scores = langid.score_batch(docs, W)
        acc = sum(p == lang for p in langs_pred) / len(docs)
        ppls = perplexity.ppl_batch([spec.lm_tokens(d) for d in docs], lms[lang])
        thr = float(np.percentile(ppls, 66.7))
        print(
            f"{lang}: langid acc={acc:.3f} score_min={scores.min():.3f} "
            f"ppl p10/p50/p66.7/p90 = {np.percentile(ppls, [10, 50, 66.7, 90]).round(1)} "
            f"-> threshold {thr:.1f}"
        )
    # sanity: gibberish + cross-lang
    rng = random.Random(7)
    gib = [langdata.gibberish_doc(random.Random(1000 + i)) for i in range(50)]
    gl, gs = langid.score_batch(gib, W)
    gp = perplexity.ppl_batch([spec.lm_tokens(d) for d in gib], lms["en"])
    print(f"gibberish: score_max={gs.max():.3f} ppl_min={gp.min():.1f}")
    del rng


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    train_langid()
    for lang in spec.LANGS:
        train_lm(lang)
    calibrate()
