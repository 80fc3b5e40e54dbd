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
            b = (h1 + i * h2) % self.m
            self.bits[b >> 6] |= np.uint64(1 << (b & 63))

    def update(self, keys) -> None:
        for key in keys:
            self.add(key)

    def __contains__(self, key) -> bool:
        h1, h2 = self._h(key)
        for i in range(self.k):
            b = (h1 + i * h2) % self.m
            if not (int(self.bits[b >> 6]) >> (b & 63)) & 1:
                return False
        return True

    @property
    def nbytes(self) -> int:
        return self.bits.nbytes


def bloom_from(keys, fp_rate: float = 0.01) -> BloomFilter:
    keys = list(keys)
    bf = BloomFilter(len(keys), fp_rate)
    bf.update(keys)
    return bf
