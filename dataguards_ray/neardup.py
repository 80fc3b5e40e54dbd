"""Near-duplicate detection (task brief + SURVEY §2.7 D3):
MinHash+LSH, SimHash, and exact n-gram Jaccard verification.

All deterministic (fixed hash constants, no RNG at runtime).  The
MinHash path is the canonical Ray shape: signature per doc inside
``map_batches`` → explode to (band, band_hash, doc_id) rows →
``groupby`` band buckets → candidate pairs → verify.  At corpus scale
the candidate verify step joins back to text via digest-keyed broadcast
(small candidate sets) or a hash join (large) — here candidates carry
their signatures so estimated Jaccard verification needs no second pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from . import spec

N_PERM = 128
N_BANDS = 16  # 16 bands × 8 rows
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_K = 13  # char shingles (SURVEY §2.7 D3)
_MERSENNE = (1 << 61) - 1

# deterministic permutation parameters a*h + b mod p (seeded offline)
_rs = np.random.RandomState(42)
_PERM_A = _rs.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
_PERM_B = _rs.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)


def shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Rolling polynomial hashes of all k-char shingles (uint64)."""
    if not text or len(text) < k:
        return np.zeros(0, dtype=np.uint64)
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(cp) - k + 1
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            h = h * np.uint64(spec.LANGID_HASH_BASE) + (cp[j : n + j] + np.uint64(1))
    return np.unique(h)


def minhash_signature(text: str) -> np.ndarray:
    """128-perm minhash of the doc's shingle set (uint64[N_PERM])."""
    sh = shingle_hashes(text)
    if sh.size == 0:
        return np.full(N_PERM, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = (sh[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0).astype(np.uint64)


def minhash_candidates(
    ds: Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """(band, band_hash, doc_id, sig) rows — one per band per doc."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        bands, hashes, out_ids, sigs = [], [], [], []
        for did, t in zip(ids, texts):
            sig = minhash_signature(t or "")
            for b in range(N_BANDS):
                chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                h = int(spec.fnv1a64(chunk.tobytes()))
                bands.append(b)
                hashes.append(h)
                out_ids.append(did)
                sigs.append(sig.tobytes())
        return pa.table(
            {
                "band": pa.array(bands, type=pa.int32()),
                "band_hash": pa.array(hashes, type=pa.uint64()),
                id_col: pa.array(out_ids, type=pa.int64()),
                "sig": pa.array(sigs, type=pa.binary()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def minhash_near_dup_pairs(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> pa.Table:
    """MinHash-LSH near-dup pairs (id_a < id_b, est_jaccard ≥ threshold).

    Bucket groupby emits candidate pairs with their signatures; estimated
    Jaccard = fraction of agreeing minhash components.  Pairs are deduped
    across bands on the driver (candidate sets are collision-sized)."""
    cand = minhash_candidates(ds, text_col=text_col, id_col=id_col)

    def pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table(
                {"id_a": pa.array([], type=pa.int64()),
                 "id_b": pa.array([], type=pa.int64()),
                 "est_jaccard": pa.array([], type=pa.float64())}
            )
        ids = group.column(id_col).to_pylist()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in group.column("sig").to_pylist()]
        order = np.argsort(ids, kind="stable")
        a_out, b_out, j_out = [], [], []
        for x in range(n):
            for y in range(x + 1, n):
                i, j = order[x], order[y]
                if ids[i] == ids[j]:
                    continue
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    j_out.append(est)
        return pa.table(
            {"id_a": pa.array(a_out, type=pa.int64()),
             "id_b": pa.array(b_out, type=pa.int64()),
             "est_jaccard": pa.array(j_out, type=pa.float64())}
        )

    raw = cand.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pyarrow")
    seen: dict[tuple[int, int], float] = {}
    for r in raw.take_all():
        seen[(r["id_a"], r["id_b"])] = r["est_jaccard"]
    items = sorted(seen.items())
    return pa.table(
        {
            "id_a": pa.array([k[0] for k, _ in items], type=pa.int64()),
            "id_b": pa.array([k[1] for k, _ in items], type=pa.int64()),
            "est_jaccard": pa.array([v for _, v in items], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (frozen tokenizer spec.lm_tokens)."""
    toks = spec.lm_tokens(text or "")
    if not toks:
        return 0
    hashes = np.fromiter(
        (spec.fnv1a64(t.encode()) for t in toks), dtype=np.uint64, count=len(toks)
    )
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def add_simhash(ds: Dataset, *, text_col: str = "text", out: str = "simhash") -> Dataset:
    def f(batch: pa.Table) -> pa.Table:
        hs = [simhash64(t) for t in batch.column(text_col).to_pylist()]
        return batch.append_column(out, pa.array(hs, type=pa.uint64()))

    return ds.map_batches(f, batch_format="pyarrow")


def simhash_near_dup_pairs(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> pa.Table:
    """Docs within Hamming distance ≤ max_hamming of each other:
    4-block bucketing (a pair within distance 3 agrees on ≥1 of 4
    16-bit blocks) → groupby block value → exact Hamming verify."""
    with_h = add_simhash(ds, text_col=text_col, out="__sh")

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = batch.column("__sh").to_pylist()
        blk, val, oid, full = [], [], [], []
        for did, h in zip(ids, hs):
            for b in range(4):
                blk.append(b)
                val.append((h >> (16 * b)) & 0xFFFF)
                oid.append(did)
                full.append(h)
        return pa.table(
            {"blk": pa.array(blk, type=pa.int32()),
             "val": pa.array(val, type=pa.int32()),
             id_col: pa.array(oid, type=pa.int64()),
             "h": pa.array(full, type=pa.uint64())}
        )

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        hs = group.column("h").to_pylist()
        a_out, b_out, d_out = [], [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                if ids[x] == ids[y]:
                    continue
                d = bin(hs[x] ^ hs[y]).count("1")
                if d <= max_hamming:
                    a, b = sorted((ids[x], ids[y]))
                    a_out.append(a)
                    b_out.append(b)
                    d_out.append(d)
        return pa.table(
            {"id_a": pa.array(a_out, type=pa.int64()),
             "id_b": pa.array(b_out, type=pa.int64()),
             "hamming": pa.array(d_out, type=pa.int32())}
        )

    raw = with_h.map_batches(explode, batch_format="pyarrow").groupby(
        ["blk", "val"]
    ).map_groups(pairs, batch_format="pyarrow")
    seen: dict[tuple[int, int], int] = {}
    for r in raw.take_all():
        seen[(r["id_a"], r["id_b"])] = r["hamming"]
    items = sorted(seen.items())
    return pa.table(
        {
            "id_a": pa.array([k[0] for k, _ in items], type=pa.int64()),
            "id_b": pa.array([k[1] for k, _ in items], type=pa.int64()),
            "hamming": pa.array([v for _, v in items], type=pa.int32()),
        }
    )


def ngram_jaccard(a: str, b: str, k: int = SHINGLE_K) -> float:
    """Exact char-k-gram Jaccard (verification kernel for candidates)."""
    sa, sb = set(shingle_hashes(a, k).tolist()), set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def near_dedup_filter(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> Dataset:
    """D3 end-to-end: drop MinHash-LSH near-duplicate losers.

    Candidate pairs → union-find connected components on the driver
    (candidate sets are collision-sized; SURVEY §2.7 D3 notes the
    groupby-round label-propagation alternative for huge components) →
    winner per component = min id → losers filtered out vectorized."""
    pairs = minhash_near_dup_pairs(ds, text_col=text_col, id_col=id_col,
                                   threshold=threshold)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    losers = {x for x in parent if find(x) != x}
    if not losers:
        return ds
    import ray

    from .steps.dedup import get_broadcast

    ref = ray.put(losers)

    def _filter(batch: pa.Table) -> pa.Table:
        ls = get_broadcast(ref)
        mask = [i not in ls for i in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(_filter, batch_format="pyarrow")
