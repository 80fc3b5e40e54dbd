"""Bloom filter over string/int keys (numpy bit array, FNV-based double
hashing) — the documented scale path for broadcast memberships
(steps/dedup.py, joins.py): when an exact key set outgrows the driver,
ship a fixed-size Bloom instead; false positives only route extra rows
into the exact check, never change semantics.
"""

from __future__ import annotations

import math

import numpy as np

from . import spec


class BloomFilter:
    """m bits, k hashes via double hashing h1 + i*h2 (Kirsch-Mitzenmacher)."""

    __slots__ = ("m", "k", "bits")

    def __init__(self, n_items: int, fp_rate: float = 0.01):
        n_items = max(n_items, 1)
        m = int(-n_items * math.log(fp_rate) / (math.log(2) ** 2))
        self.m = max(64, (m + 63) // 64 * 64)
        self.k = max(1, round(self.m / n_items * math.log(2)))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    @staticmethod
    def _h(key: str | int | bytes) -> tuple[int, int]:
        data = (
            key if isinstance(key, bytes)
            else str(key).encode("utf-8")
        )
        h1 = spec.fnv1a64(data)
        h2 = spec.fnv1a64(data + b"\x00") | 1  # odd → full period
        return h1, h2

    def add(self, key) -> None:
        h1, h2 = self._h(key)
        for i in range(self.k):
            # wrap to 64 bits BEFORE % m so the scalar path computes the
            # same probe positions as the numpy (mod-2^64) batch path
            b = ((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % self.m
            self.bits[b >> 6] |= np.uint64(1 << (b & 63))

    def _hash_many(self, keys) -> tuple[np.ndarray, np.ndarray]:
        n = len(keys)
        h1 = np.empty(n, dtype=np.uint64)
        h2 = np.empty(n, dtype=np.uint64)
        h = self._h
        for i, k in enumerate(keys):  # one _h call (two FNV hashes) per key
            a, b = h(k)
            h1[i] = a
            h2[i] = b
        return h1, h2

    def update(self, keys) -> None:
        """Batch insert (bit probes vectorized in numpy)."""
        keys = list(keys)
        if not keys:
            return
        h1, h2 = self._hash_many(keys)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                b = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
                np.bitwise_or.at(
                    self.bits, (b >> np.uint64(6)), np.uint64(1) << (b & np.uint64(63))
                )

    def __contains__(self, key) -> bool:
        h1, h2 = self._h(key)
        for i in range(self.k):
            b = ((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % self.m
            if not (int(self.bits[b >> 6]) >> (b & 63)) & 1:
                return False
        return True

    def contains_many(self, keys) -> np.ndarray:
        """Vectorized membership for a batch of keys (bool[n]) — the hot
        path for Bloom-prefiltered joins (per-key work is just the two
        FNV hashes; the k bit probes are numpy)."""
        keys = list(keys)
        if not keys:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._hash_many(keys)
        out = np.ones(len(keys), dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                b = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
                word = self.bits[(b >> np.uint64(6))]
                out &= ((word >> (b & np.uint64(63))) & np.uint64(1)).astype(bool)
        return out

    @property
    def nbytes(self) -> int:
        return self.bits.nbytes


def bloom_from(keys, fp_rate: float = 0.01) -> BloomFilter:
    keys = list(keys)
    bf = BloomFilter(len(keys), fp_rate)
    bf.update(keys)
    return bf
