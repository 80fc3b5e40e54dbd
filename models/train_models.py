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


#: the model's honest scope is LEXICAL junk — vocabulary-level garbage a
#: bag-of-char-n-grams can see.  Structural junk (dup_lines, bullet
#: walls, symbol spam, length violations, missing stopwords) shares
#: clean docs' n-gram distribution by construction (measured: margins
#: overlap clean's) and is the frozen heuristic rules' domain.
QUALITY_JUNK_CATS = ("gibberish", "non_alpha")
N_QUALITY_CLEAN_PER_LANG = 240
N_QUALITY_JUNK_PER_CAT_LANG = 120
N_QUALITY_HELDOUT = 200
#: deterministic temperature ladder for Platt-style calibration
QUALITY_TEMPS = (1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0)


def _quality_doc(kind: str, cat: str, lang: str, i: int) -> str:
    """Deterministic per-(kind,cat,lang,i) synthetic doc — its own seed
    stream (fnv-derived), disjoint from langid's training_corpus."""
    import random

    from fixtures.gen import _content

    rng = random.Random(spec.fnv1a64(f"quality:{kind}:{cat}:{lang}:{i}".encode()))
    return _content(rng, cat, lang, seed=42)


def _quality_margins(W: np.ndarray, kind: str,
                     n: int) -> "tuple[np.ndarray, np.ndarray]":
    """Held-out raw NB margins (mean clean−junk log-weight per doc) for
    n clean docs and n junk docs — the calibration inputs."""
    from dataguards_ray import quality

    d = W[:, quality.CLASSES.index("clean")] - W[:, quality.CLASSES.index("junk")]

    def margin(text: str) -> float:
        b = langid.ngram_buckets(text)
        if len(b) == 0:
            return 0.0
        counts = np.bincount(b.astype(np.int64), minlength=W.shape[0])
        return float((counts @ d) / len(b))

    mc = np.array([
        margin(_quality_doc(kind, "clean", spec.LANGS[i % len(spec.LANGS)], i))
        for i in range(n)
    ])
    mj = np.array([
        margin(_quality_doc(kind, QUALITY_JUNK_CATS[i % len(QUALITY_JUNK_CATS)],
                            spec.LANGS[i % len(spec.LANGS)], i))
        for i in range(n)
    ])
    return mc, mj


def train_quality() -> None:
    """Binary clean-vs-junk NB weights over langid's hashed char
    n-grams (dataguards_ray/quality.py), plus a Platt-style calibration
    temperature: the smallest T on a fixed ladder with held-out
    sigmoid(T·margin) clean p01 ≥ 0.99 and junk p99 ≤ 0.01 (the
    distributions must be saturated-bimodal so DEFAULT_TAU=0.5 is
    robust).  Everything is deterministic — counted NB weights, seeded
    synthetic docs, a frozen ladder — so retraining is reproducible."""
    from dataguards_ray import quality

    counts = np.ones((spec.LANGID_DIM, len(quality.CLASSES)), dtype=np.float64)
    cj = quality.CLASSES.index("junk")
    cc = quality.CLASSES.index("clean")
    for lang in spec.LANGS:
        for i in range(N_QUALITY_CLEAN_PER_LANG):
            b = langid.ngram_buckets(_quality_doc("train", "clean", lang, i))
            np.add.at(counts[:, cc], b.astype(np.int64), 1.0)
        for cat in QUALITY_JUNK_CATS:
            for i in range(N_QUALITY_JUNK_PER_CAT_LANG):
                b = langid.ngram_buckets(_quality_doc("train", cat, lang, i))
                np.add.at(counts[:, cj], b.astype(np.int64), 1.0)
    W = np.log(counts / counts.sum(axis=0, keepdims=True))

    mc, mj = _quality_margins(W, "calib", N_QUALITY_HELDOUT)
    temperature = QUALITY_TEMPS[-1]
    for T in QUALITY_TEMPS:
        sc = 1.0 / (1.0 + np.exp(-T * mc))
        sj = 1.0 / (1.0 + np.exp(-T * mj))
        if np.percentile(sc, 1) >= 0.99 and np.percentile(sj, 99) <= 0.01:
            temperature = T
            break
    np.savez_compressed(
        os.path.join(OUT_DIR, "quality.npz"),
        W=W,
        classes=np.array(quality.CLASSES),
        temperature=np.float64(temperature),
    )
    print(f"quality.npz: W {W.shape}, T={temperature}, "
          f"{os.path.getsize(os.path.join(OUT_DIR, 'quality.npz'))} bytes")


def calibrate_quality() -> None:
    """Held-out separation report on a DISJOINT doc stream from the
    calibration set (kind='heldout' vs 'calib')."""
    from dataguards_ray import quality

    W, T = quality.load_model()
    clean = [
        _quality_doc("heldout", "clean", spec.LANGS[i % len(spec.LANGS)], i)
        for i in range(N_QUALITY_HELDOUT)
    ]
    junk = [
        _quality_doc("heldout", QUALITY_JUNK_CATS[i % len(QUALITY_JUNK_CATS)],
                     spec.LANGS[i % len(spec.LANGS)], i)
        for i in range(N_QUALITY_HELDOUT)
    ]
    sc = quality.score_batch(clean, W, T)
    sj = quality.score_batch(junk, W, T)
    acc = (np.concatenate([sc >= 0.5, sj < 0.5]).mean())
    print(
        f"quality(T={T}): clean p01/p50 = {np.percentile(sc, [1, 50]).round(4)} "
        f"junk p50/p99 = {np.percentile(sj, [50, 99]).round(4)} "
        f"acc@0.5 = {acc:.4f}"
    )


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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=("langid", "lm", "quality"), default=None,
                    help="retrain one artifact (default: all + calibration)")
    a = ap.parse_args()
    os.makedirs(OUT_DIR, exist_ok=True)
    if a.only in (None, "langid"):
        train_langid()
    if a.only in (None, "lm"):
        for lang in spec.LANGS:
            train_lm(lang)
    if a.only in (None, "quality"):
        train_quality()
        calibrate_quality()
    if a.only is None:
        calibrate()
