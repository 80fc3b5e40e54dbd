"""KenLM-style word n-gram perplexity (order 3, Stupid Backoff).

Design per Heafield 2011 ([KENLM]) / Brants et al.'s Stupid Backoff as
used in CCNet ([CCNET] §4.3; SURVEY.md §2.4 A2): per-language trigram
counts with backoff weight spec.LM_BACKOFF_ALPHA, frozen semantics:

  pos 0:   P = c1(w)/total               if c1>0 else 1/(V+1)
  pos 1:   P = c2(w0,w)/c1(w0)           if c2>0 else α·P_uni(w)
  pos ≥2:  P = c3(a,b,w)/c2(a,b)         if c3>0 else α·P_bi(b,w)

  ppl = 10^( −(1/N)·Σ log10 P ),  N = #tokens;  0 tokens → spec.PPL_EMPTY_DOC.

Count tables are built deterministically by models/train_models.py from
langdata.training_corpus (pure counting, no RNG) and shipped as
``models_data/lm_{lang}.npz``: sorted key arrays + np.searchsorted lookup
(SURVEY.md §2.4: numpy tables, no kenlm binary — not installable here).

ONE kernel (`ppl_batch`) shared by the Ray actor and the scalar oracle:
float64 elementwise ops + np.add.reduceat per-doc sums → bit-identical
regardless of batch composition.
"""

from __future__ import annotations

import os

import numpy as np

from . import spec

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "models_data")


class LangLM:
    """One language's count tables (loaded once per actor)."""

    __slots__ = ("vocab", "word2id", "K", "V", "total", "uni", "big_keys",
                 "big_vals", "tri_keys", "tri_vals")

    def __init__(self, path: str):
        with np.load(path, allow_pickle=False) as z:
            self.vocab = [str(w) for w in z["vocab"]]
            self.uni = z["uni"].astype(np.float64)          # (V+1,), uni[0]=0 (UNK)
            self.big_keys = z["big_keys"].astype(np.int64)  # sorted a*K+b
            self.big_vals = z["big_vals"].astype(np.float64)
            self.tri_keys = z["tri_keys"].astype(np.int64)  # sorted (a*K+b)*K+c
            self.tri_vals = z["tri_vals"].astype(np.float64)
        self.V = len(self.vocab)
        self.K = self.V + 1
        self.total = float(self.uni.sum())
        self.word2id = {w: i + 1 for i, w in enumerate(self.vocab)}

    def encode(self, tokens: list[str]) -> np.ndarray:
        g = self.word2id.get
        return np.fromiter((g(t, 0) for t in tokens), dtype=np.int64, count=len(tokens))


def load_models(models_dir: str = _MODELS_DIR) -> dict[str, LangLM]:
    return {
        lang: LangLM(os.path.join(models_dir, f"lm_{lang}.npz"))
        for lang in spec.LANGS
    }


def _lookup(sorted_keys: np.ndarray, vals: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Counts for `keys` in a sorted key table (0 where absent)."""
    if sorted_keys.size == 0 or keys.size == 0:
        return np.zeros(len(keys), dtype=np.float64)
    idx = np.searchsorted(sorted_keys, keys)
    idx_c = np.minimum(idx, len(sorted_keys) - 1)
    hit = sorted_keys[idx_c] == keys
    return np.where(hit, vals[idx_c], 0.0)


def ppl_batch(token_lists: list[list[str]], lm: LangLM) -> np.ndarray:
    """Perplexity per document (float32), Stupid Backoff as in module doc."""
    n_docs = len(token_lists)
    out = np.full(n_docs, spec.PPL_EMPTY_DOC, dtype=np.float32)
    lens = np.array([len(t) for t in token_lists], dtype=np.int64)
    nonempty = np.nonzero(lens > 0)[0]
    if nonempty.size == 0:
        return out
    ids = np.concatenate([lm.encode(token_lists[i]) for i in nonempty])
    ne_lens = lens[nonempty]
    offsets = np.zeros(nonempty.size, dtype=np.int64)
    np.cumsum(ne_lens[:-1], out=offsets[1:])
    pos = np.arange(ids.size, dtype=np.int64) - np.repeat(offsets, ne_lens)
    # context ids (garbage at pos<order-1 — masked out below)
    b = np.concatenate(([0], ids[:-1]))
    a = np.concatenate(([0, 0], ids[:-2]))
    K = np.int64(lm.K)
    alpha = spec.LM_BACKOFF_ALPHA

    uni_c = lm.uni[ids]
    p_uni = np.where(uni_c > 0, uni_c / lm.total, 1.0 / (lm.V + 1))

    big_key = b * K + ids
    c2 = _lookup(lm.big_keys, lm.big_vals, big_key)
    c1_b = lm.uni[b]
    p_bi = np.where(c2 > 0, c2 / np.maximum(c1_b, 1.0), alpha * p_uni)

    tri_key = (a * K + b) * K + ids
    c3 = _lookup(lm.tri_keys, lm.tri_vals, tri_key)
    ctx_key = a * K + b
    c2_ctx = _lookup(lm.big_keys, lm.big_vals, ctx_key)
    p_tri = np.where(c3 > 0, c3 / np.maximum(c2_ctx, 1.0), alpha * p_bi)

    p = np.where(pos == 0, p_uni, np.where(pos == 1, p_bi, p_tri))
    logp = np.log10(p)
    doc_sums = np.add.reduceat(logp, offsets)  # sequential per segment
    ppl = np.power(10.0, -(doc_sums / ne_lens))
    out[nonempty] = np.minimum(ppl, spec.PPL_EMPTY_DOC).astype(np.float32)
    return out


def ppl_one(tokens: list[str], lm: LangLM) -> float:
    """Scalar path (oracle): same kernel, batch of one → bit-identical."""
    return float(ppl_batch([tokens], lm)[0])
