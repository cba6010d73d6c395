"""Cuckoo-filter sidecar — supports DELETION, which Bloom cannot.

North-rule component: the seen-set needs expiry/recrawl ("forget this
URL so it can be fetched again"). A Bloom filter cannot delete; the
cuckoo sidecar tracks deletions so membership is:

    member(url) = bloom_maybe(url) AND NOT cuckoo_contains(deleted, url)

(with the exact anti-join still confirming — filters only prune).

Plain-numpy implementation: 2-choice bucketed cuckoo filter with
16-bit fingerprints, 4 slots/bucket, partial-key cuckoo hashing
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14
— public paper). Deterministic eviction (slot 0, fixed kick sequence)
so filters built on different workers are identical.
"""

from __future__ import annotations

import zlib

import numpy as np

_EMPTY = 0  # fingerprints are 1..65535; 0 marks an empty slot


def _fingerprint(url: str) -> int:
    fp = zlib.crc32(b"fp:" + url.encode()) & 0xFFFF
    return fp or 1


def _index(url: str, n_buckets: int) -> int:
    return zlib.crc32(b"ix:" + url.encode()) % n_buckets


def _alt_index(i: int, fp: int, n_buckets: int) -> int:
    # partial-key cuckoo: i2 = i XOR hash(fp)
    return (i ^ (zlib.crc32(fp.to_bytes(2, "little")) & 0x7FFFFFFF)) % n_buckets


class CuckooFilter:
    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 12):
        # power of two REQUIRED: the partial-key alt index i2=(i^h)%n is
        # an involution only when %n keeps low bits (n=2^k) — otherwise
        # an evicted fingerprint can land in a bucket contains() never
        # probes, and a false NEGATIVE breaks the seen-set exactness
        # proof (a cuckoo miss is treated as not-tombstoned PROOF)
        if n_buckets <= 0 or n_buckets & (n_buckets - 1):
            raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)

    def _candidates(self, url: str) -> tuple[int, int, int]:
        fp = _fingerprint(url)
        i1 = _index(url, self.n_buckets)
        return fp, i1, _alt_index(i1, fp, self.n_buckets)

    def insert(self, url: str) -> bool:
        fp, i1, i2 = self._candidates(url)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # deterministic eviction chain
        i, cur = i1, fp
        for kick in range(self.MAX_KICKS):
            victim = int(self.table[i, kick % self.SLOTS])
            self.table[i, kick % self.SLOTS] = cur
            cur = victim
            i = _alt_index(i, cur, self.n_buckets)
            row = self.table[i]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        return False  # table full

    def contains(self, url: str) -> bool:
        fp, i1, i2 = self._candidates(url)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, url: str) -> bool:
        fp, i1, i2 = self._candidates(url)
        for i in (i1, i2):
            hit = np.nonzero(self.table[i] == fp)[0]
            if len(hit):
                self.table[i, hit[0]] = _EMPTY
                return True
        return False

    # ------------------------------------------------- (de)serialization

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_buckets: int) -> "CuckooFilter":
        f = cls(n_buckets)
        f.table = np.frombuffer(data, dtype=np.uint16).reshape(n_buckets, cls.SLOTS).copy()
        return f
