"""Shared dataset helpers."""

from __future__ import annotations

import numpy as np
import pandas as pd


def topk(ds, keys: list[str], descending: list[bool], k: int):
    """Global top-k without a full distributed sort.

    Each batch keeps its local top-k (a streaming prune — at most k rows
    per block survive), then the tiny remainder is coalesced to one block
    and sorted once.  O(n) scan instead of an all-to-all sort shuffle.
    """
    ascending = [not d for d in descending]

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(keys, ascending=ascending).head(k)

    pruned = ds.map_batches(local_topk, batch_format="pandas", batch_size=65536)
    return (
        pruned.repartition(1)
        .map_batches(local_topk, batch_format="pandas", batch_size=None)
    )


class BloomFilter:
    """Minimal Bloom filter for broadcast semi/anti-join prefilters.

    At 100 TB the build side's key set may not fit in memory as a Python
    set; a Bloom filter of it still does (~1.2 GB per 10^9 keys at 1%
    fp).  No false negatives → an anti-join can DROP any key the filter
    rejects; keys it accepts are verified against the exact (possibly
    sharded) set.
    """

    def __init__(self, n_items: int, fp_rate: float = 0.01):
        import math

        self.n_bits = max(64, int(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
        self.n_hashes = max(1, int(round(self.n_bits / max(1, n_items) * math.log(2))))
        self.bits = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    def _positions(self, key: int):
        import zlib

        h1 = zlib.crc32(str(key).encode())
        h2 = zlib.crc32(str(key).encode()[::-1]) | 1
        for i in range(self.n_hashes):
            yield (h1 + i * h2) % self.n_bits

    def add(self, key: int) -> None:
        for p in self._positions(key):
            self.bits[p >> 6] |= np.uint64(1) << np.uint64(p & 63)

    def __contains__(self, key: int) -> bool:
        return all(
            self.bits[p >> 6] >> np.uint64(p & 63) & np.uint64(1)
            for p in self._positions(key)
        )

