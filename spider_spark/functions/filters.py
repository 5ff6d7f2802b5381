"""Probabilistic membership filters for the URL-seen set.

Graft of the reference's ``uriPage`` unique B-tree index — the URL-seen
set (db/PerstRoot.java:32,46-67) — per the north rule: a **Bloom filter**
prefilter ahead of the exact anti-join, with a **cuckoo filter** fallback
where force-requeue (Spider.java:185-188) semantically deletes from the
"currently queued-or-done" set.

Both filters are *prefilters only*: every admission is confirmed by an
exact anti-join against the ``seen`` table, so false positives cannot
corrupt the seen set (SURVEY.md §7.3).  The filter state is a plain
numpy array — cheap to broadcast to executors and probe inside an
Arrow-batched pandas UDF.

Hashing: the ENGINE path computes the two 64-bit hashes JVM-side
(``xxhash64(url)`` / ``xxhash64(url, 1)``) and feeds them to the
numpy-vectorized array APIs — Bloom ``add_hash_arrays`` /
``contains_hash_arrays`` and cuckoo ``fp_buckets_arrays`` /
``add_fp`` / ``contains_arrays`` — so the only per-key Python left is
the cuckoo kick loop, which is inherently sequential.  The per-string
BLAKE2b API remains for standalone use; both families are fully
deterministic across processes (unlike Python's salted ``hash()``),
which the bit-identical-resume requirement needs.  Build and probe must
use the SAME API family (the two hash different bit positions).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _hash128(key: str) -> tuple[int, int]:
    d = hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest()
    return (
        int.from_bytes(d[:8], "little"),
        int.from_bytes(d[8:], "little") | 1,  # odd → good stride
    )


class BloomFilter:
    """Classic Bloom filter over strings (Kirsch–Mitzenmacher double
    hashing).  Serializable as (bits, num_hashes) for broadcast."""

    def __init__(self, capacity: int, bits_per_key: int = 10):
        self.m = max(64, capacity * bits_per_key)
        self.k = max(1, int(round(bits_per_key * 0.6931)))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def add(self, key: str) -> None:
        h1, h2 = _hash128(key)
        for i in range(self.k):
            pos = (h1 + i * h2) % self.m
            self.bits[pos >> 6] |= np.uint64(1 << (pos & 63))

    def add_many(self, keys) -> None:
        for key in keys:
            self.add(key)

    # -- vectorized hash-pair API (the engine hot path) --------------------

    def add_hash_arrays(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Set bits for a batch of pre-hashed keys.  h1/h2 are uint64
        views of JVM-side xxhash64 values; everything here is whole-array
        numpy — no per-row Python.

        ``np.bitwise_or.at`` was once the textbook slow path (unbuffered
        ufunc), but on this numpy it is the FASTEST option — measured
        0.23s vs 3.06s for a sort+``reduceat`` merge at 1M keys (k=7),
        so the scatter-OR stays."""
        h1 = np.ascontiguousarray(h1, dtype=np.uint64)
        h2 = np.ascontiguousarray(h2, dtype=np.uint64) | np.uint64(1)  # odd stride
        m = np.uint64(self.m)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % m
            np.bitwise_or.at(
                self.bits, pos >> np.uint64(6),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def contains_hash_arrays(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Batch probe for pre-hashed keys -> bool array."""
        h1 = np.ascontiguousarray(h1, dtype=np.uint64)
        h2 = np.ascontiguousarray(h2, dtype=np.uint64) | np.uint64(1)
        m = np.uint64(self.m)
        ok = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % m
            word = self.bits[pos >> np.uint64(6)]
            ok &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return ok

    def __contains__(self, key: str) -> bool:
        h1, h2 = _hash128(key)
        for i in range(self.k):
            pos = (h1 + i * h2) % self.m
            if not (int(self.bits[pos >> 6]) >> (pos & 63)) & 1:
                return False
        return True

    def contains_series(self, keys: pd.Series) -> pd.Series:
        """Arrow-batch probe: Series[str] -> Series[bool]."""
        bits, m, k = self.bits, self.m, self.k

        def probe(key):
            if key is None:
                return False
            h1, h2 = _hash128(key)
            for i in range(k):
                pos = (h1 + i * h2) % m
                if not (int(bits[pos >> 6]) >> (pos & 63)) & 1:
                    return False
            return True

        return keys.map(probe)


class CuckooFilter:
    """Cuckoo filter (Fan et al., CoNEXT'14 — public algorithm):
    4-slot buckets, 16-bit fingerprints, partial-key cuckoo hashing.
    Supports DELETE, which Bloom cannot — needed because force-requeue
    (SURVEY.md §2 B5) removes entries from the "queued-or-done" view."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        nb = 1
        while nb * self.SLOTS < capacity * 1.3:
            nb <<= 1
        self.num_buckets = nb
        self.table = np.zeros((nb, self.SLOTS), dtype=np.uint16)
        # deterministic "random" eviction slot counter
        self._kick_seq = 0

    def _fp_and_buckets(self, key: str) -> tuple[int, int, int]:
        h1, h2 = _hash128(key)
        fp = (h1 & 0xFFFF) or 1  # fingerprint 0 means empty slot
        i1 = h2 % self.num_buckets
        i2 = (i1 ^ self._fp_hash(fp)) % self.num_buckets
        return fp, i1, i2

    # -- vectorized hash-pair API (the engine hot path) --------------------
    #
    # Same partial-key scheme, but fingerprints/bucket indices derive
    # from JVM-side xxhash64 pairs computed as Columns (like the Bloom
    # path) and come back as whole numpy arrays — the per-key Python
    # cost drops to just the cuckoo kick loop, which is inherently
    # sequential.  The two hash families place keys at different slots,
    # so a filter must be built and probed by the SAME family.

    @staticmethod
    def fp_buckets_arrays(h1: np.ndarray, h2: np.ndarray, nb: int):
        """(h1, h2) uint64 arrays → (fp, i1, i2) int64 arrays."""
        h1 = np.ascontiguousarray(h1, dtype=np.uint64)
        h2 = np.ascontiguousarray(h2, dtype=np.uint64)
        fp = (h1 & np.uint64(0xFFFF)).astype(np.int64)
        fp[fp == 0] = 1
        i1 = (h2 % np.uint64(nb)).astype(np.int64)
        # fp <= 0xFFFF so fp*0x5BD1E995 < 2^48: no int64 overflow, and
        # the scalar _fp_hash's implicit unbounded-int arithmetic
        # agrees with this exactly
        x = fp * 0x5BD1E995
        fph = (x ^ (x >> 13)) & 0x7FFFFFFF
        i2 = (i1 ^ fph) % nb
        return fp, i1, i2

    def add_fp(self, fp: int, i1: int, i2: int) -> bool:
        """Insert a precomputed (fingerprint, bucket, alt-bucket) key —
        the kick loop of ``add`` without the hashing."""
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            return True
        i = i1 if (self._kick_seq & 1) == 0 else i2
        for _ in range(self.MAX_KICKS):
            s = self._kick_seq % self.SLOTS
            self._kick_seq += 1
            fp, self.table[i][s] = int(self.table[i][s]), fp
            i = self._alt(i, fp)
            if self._try_put(i, fp):
                return True
        return False

    def delete_fp(self, fp: int, i1: int, i2: int) -> bool:
        for i in (i1, i2):
            row = self.table[i]
            for s in range(self.SLOTS):
                if row[s] == fp:
                    row[s] = 0
                    return True
        return False

    def contains_arrays(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Whole-array membership probe for xxhash64-pair keys."""
        fp, i1, i2 = self.fp_buckets_arrays(h1, h2, self.num_buckets)
        fpc = fp[:, None].astype(self.table.dtype)
        return ((self.table[i1] == fpc).any(axis=1)
                | (self.table[i2] == fpc).any(axis=1))

    @staticmethod
    def _fp_hash(fp: int) -> int:
        # small deterministic scramble of the fingerprint
        x = fp * 0x5BD1E995
        return (x ^ (x >> 13)) & 0x7FFFFFFF

    def _alt(self, i: int, fp: int) -> int:
        return (i ^ self._fp_hash(fp)) % self.num_buckets

    def _try_put(self, i: int, fp: int) -> bool:
        row = self.table[i]
        for s in range(self.SLOTS):
            if row[s] == 0:
                row[s] = fp
                return True
        return False

    def add(self, key: str) -> bool:
        # False = table full — caller should rebuild larger
        return self.add_fp(*self._fp_and_buckets(key))

    def __contains__(self, key: str) -> bool:
        fp, i1, i2 = self._fp_and_buckets(key)
        return fp in self.table[i1] or fp in self.table[i2]

    def delete(self, key: str) -> bool:
        return self.delete_fp(*self._fp_and_buckets(key))

    def contains_series(self, keys: pd.Series) -> pd.Series:
        return keys.map(lambda k: k is not None and k in self)
