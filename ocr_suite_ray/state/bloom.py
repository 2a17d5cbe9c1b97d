"""Bloom filter — the broadcastable membership test for the dedup scale path.

``stages/dedup.py`` and the finalize split rely on broadcasting the dup-url
set. At trillion-row scale that exact set outgrows a broadcast object; a
Bloom filter of it stays small (≈1.2 GB per 10^9 keys at 1% fpp) and its
false positives are HARMLESS here: a false-positive url is merely routed
through the exact winners reduce, which keeps its single capture unchanged.
Deterministic (blake2b double hashing), mergeable (bitwise OR).
"""

from __future__ import annotations

import hashlib
import math
import struct

import numpy as np


class BloomFilter:
    def __init__(self, capacity: int, fpp: float = 0.01):
        capacity = max(1, capacity)
        m = int(-capacity * math.log(fpp) / (math.log(2) ** 2))
        self.m = max(64, (m + 63) // 64 * 64)
        self.k = max(1, int(round(self.m / capacity * math.log(2))))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    @staticmethod
    def _h(value: str) -> tuple[int, int]:
        d = hashlib.blake2b(value.encode(), digest_size=16).digest()
        return struct.unpack("<QQ", d)

    def _positions(self, value: str):
        h1, h2 = self._h(value)
        for i in range(self.k):
            yield (h1 + i * h2) % self.m

    def add(self, value: str) -> None:
        for p in self._positions(value):
            self.bits[p >> 6] |= np.uint64(1 << (p & 63))

    def add_many(self, values) -> None:
        for v in values:
            self.add(v)

    def __contains__(self, value: str) -> bool:
        for p in self._positions(value):
            if not (int(self.bits[p >> 6]) >> (p & 63)) & 1:
                return False
        return True

    def contains_many(self, values) -> np.ndarray:
        return np.fromiter((v in self for v in values), dtype=bool, count=len(values))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self

    def to_bytes(self) -> bytes:
        return struct.pack("<QQ", self.m, self.k) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        m, k = struct.unpack("<QQ", data[:16])
        bf = cls.__new__(cls)
        bf.m, bf.k = m, k
        bf.bits = np.frombuffer(data[16:], dtype=np.uint64).copy()
        return bf
