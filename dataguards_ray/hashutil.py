"""Vectorized hashing kernels (round-4 verdict item #4).

``spec.fnv1a64`` is the frozen scalar definition (spec.py is SHA-pinned,
so the vectorized kernels live here); everything in this module is
bit-identical to the scalar loop and tested for parity
(tests/test_operators.py::test_fnv1a64_array_parity).

The batch kernel processes an Arrow string/binary array column-wise:
rows are sorted by byte length once, then one fused ``(h ^ byte) *
prime`` numpy step per byte POSITION updates the suffix of rows still
active — total work O(total_bytes) with no per-row Python loop.  A
10^12-doc dedup job derives its 64-bit row ids and its ``part_id``
partition keys through this kernel, so the prepare stage stays a
vectorized Arrow pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .spec import FNV_OFFSET, FNV_PRIME

_PRIME = np.uint64(FNV_PRIME)


def fnv1a64_bytes(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """FNV-1a 64 per row over flattened bytes (``data``) sliced by
    ``offsets`` (len n+1).  Returns uint64[n]; empty rows hash to the
    offset basis (== fnv1a64(b""))."""
    n = len(offsets) - 1
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    h = np.full(n, np.uint64(FNV_OFFSET), dtype=np.uint64)
    if n == 0:
        return h
    maxlen = int(lengths.max())
    if maxlen == 0:
        return h
    order = np.argsort(lengths, kind="stable")
    sl = lengths[order]
    ss = starts[order]
    hs = h  # operate in sorted space, un-permute at the end
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            k = int(np.searchsorted(sl, j, side="right"))
            if k >= n:
                break
            b = data[ss[k:] + j].astype(np.uint64)
            hs[k:] = (hs[k:] ^ b) * _PRIME
    out = np.empty(n, dtype=np.uint64)
    out[order] = hs
    return out


def fnv1a64_array(arr: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """FNV-1a 64 of each element of an Arrow string/binary array
    (uint64[n]).  Null rows hash like empty rows (the offset basis) —
    callers that need null-distinct ids must mask nulls themselves
    (Arrow null slots have zero-length payloads)."""
    offsets, data = _string_buffer_view(arr)
    return fnv1a64_bytes(offsets, np.frombuffer(data, dtype=np.uint8))


def _as_string_array(col: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Column → string array whose per-row text equals Python
    ``str(value)`` for the types dedup ids use (string passthrough;
    integers via Arrow decimal cast).  Raises TypeError otherwise so
    callers fall back to the scalar path for exotic id types."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return col
    if pa.types.is_integer(t):
        import pyarrow.compute as pc

        return pc.cast(col, pa.string())
    raise TypeError(f"no vectorized str() equivalent for {t}")


def nid64_array(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Signed-int64 row ids for the near-dup pair machinery:
    ``fnv1a64(f"v:{v}".encode()) - 2**63`` per value, bit-identical to
    the scalar expression jobs/dedup_job.py froze in round 3 (prior-run
    ``_dedup_manifest`` rows carry these ids, so the derivation can
    never change).  Only defined for non-null string/int ids — callers
    guard nulls upstream.  TypeError for other types (scalar fallback).
    """
    import pyarrow.compute as pc

    s = _as_string_array(col)
    prefixed = pc.binary_join_element_wise(
        pa.array(["v:"] * len(s), type=pa.string()), s, "")
    return (fnv1a64_array(prefixed) - np.uint64(1 << 63)).view(np.int64)


def _string_buffer_view(arr: "pa.Array | pa.ChunkedArray"):
    """(offsets int64[n+1], memoryview of the utf-8 data buffer) for a
    string/binary Arrow array — the raw slices Arrow already holds, so
    per-row hashing needs no Python string/bytes object per row."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t):
        odt = np.int32
    elif pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        odt = np.int64
    else:
        raise TypeError(f"need a string/binary array, got {t}")
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odt)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return offsets, data


def md5_digest_matrix(arr: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """MD5 digest per row of a string/binary array → uint8[n,16],
    identical to ``hashlib.md5(text.encode()).digest()`` per row (Arrow
    string payloads ARE the utf-8 bytes).  The loop hashes memoryview
    slices of the shared data buffer — OpenSSL does the work; no
    per-row Python string/encode/hexdigest objects.  Null rows hash
    like empty rows (zero-length slice); mask nulls upstream if they
    must stay distinct."""
    import hashlib

    offsets, data = _string_buffer_view(arr)
    n = len(offsets) - 1
    if n == 0:
        return np.empty((0, 16), dtype=np.uint8)
    md5 = hashlib.md5
    o = offsets.tolist()
    raw = b"".join([md5(data[s:e]).digest() for s, e in zip(o, o[1:])])
    return np.frombuffer(raw, dtype=np.uint8).reshape(n, 16)


def hex_prefix_buckets(dig: np.ndarray, prefix_len: int) -> np.ndarray:
    """``int(hexdigest[:prefix_len], 16)`` per row from a digest
    matrix, vectorized — one numpy pass per NIBBLE (prefix_len ≤ 8)."""
    if not 1 <= prefix_len <= 8:
        raise ValueError("prefix_len must be in 1..8")
    out = np.zeros(len(dig), dtype=np.int64)
    for i in range(prefix_len):
        byte = dig[:, i // 2].astype(np.int64)
        nib = (byte >> 4) if i % 2 == 0 else (byte & 15)
        out = out * 16 + nib
    return out


def md5_hex_array(dig: np.ndarray) -> pa.Array:
    """Digest matrix → Arrow string array of lowercase 32-char
    hexdigests (one C hexlify over the whole matrix, no per-row
    Python)."""
    import binascii

    if len(dig) == 0:
        return pa.array([], type=pa.string())
    hexes = np.frombuffer(binascii.hexlify(
        np.ascontiguousarray(dig).tobytes()), dtype="S32")
    return pa.array(hexes.astype("U32"), type=pa.string())


def partition_ids(col: "pa.Array | pa.ChunkedArray", partitions: int) -> pa.Array:
    """Deterministic partition id per row for the resumable writers:
    ``((fnv1a64(f"v:{v}") - 2**63) mod 2**64) % partitions`` — the
    signed ``nid64_array`` view reinterpreted as uint64.  ONE shared
    definition for io.write_partitioned_resumable AND the dedup job's
    survivor write (ADVICE r04: two private copies drifted — the
    scalar fallback computed plain ``fnv1a64 % P``, which disagrees
    whenever P is not a power of two, so a resume whose id column
    arrived with a different Arrow type silently shifted rows between
    partitions).  The scalar fallback handles exotic id types that
    ``nid64_array`` rejects; both paths are parity-tested.
    """
    from .spec import fnv1a64

    P = int(partitions)
    try:
        pid = (nid64_array(col).view(np.uint64) % np.uint64(P)).astype(
            np.int64)
        return pa.array(pid, type=pa.int64())
    except TypeError:  # exotic id type → scalar fallback, same mapping
        return pa.array(
            [(fnv1a64(f"v:{v}".encode()) - (1 << 63)) % (1 << 64) % P
             for v in col.to_pylist()],
            type=pa.int64())
