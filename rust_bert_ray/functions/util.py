"""Shared dataset helpers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """``list<float>`` column → ``(n, dim)`` matrix WITHOUT per-row
    Python objects.

    ``to_pylist()`` + ``np.stack`` materializes one Python list + n·dim
    PyFloat objects per batch — measured ~30× slower than flattening the
    Arrow child array (``pc.list_flatten`` respects offsets/slices, the
    ``to_numpy`` on the flat float child is zero-copy).  Values are
    bit-identical to the old path: float32 → float64 widening is exact
    either way.  Used by every ANN / dedup / clustering hot loop AND by
    the expected-oracle builders (same floats on both sides — the
    expected-table contract).
    """
    flat = pc.list_flatten(col)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    v = flat.to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(v.reshape(n, len(v) // n).astype(dtype, copy=False))


def round_ha(a, digits: int):
    """Round half away from zero — DuckDB ``ROUND`` parity.

    numpy/pandas default to banker's rounding (half to even), so values
    landing exactly on a representable midpoint (e.g. 0.125 at 2 dp) flip
    the driver's value hash vs the DuckDB oracle.  Verified bit-exact
    against DuckDB ROUND on 300k samples at 2/4/5 dp.
    """
    a = np.asarray(a, dtype=np.float64)
    scale = 10.0 ** digits
    scaled = a * scale
    return np.copysign(np.floor(np.abs(scaled) + 0.5), scaled) / scale


def pc_round_ha(arr, digits: int):
    """Arrow rounding with DuckDB ``ROUND`` parity (half away from zero).

    Implemented with the same scale→floor(+0.5)→divide double arithmetic
    DuckDB uses: Arrow's own ``round(round_mode=half_towards_infinity)``
    skips the final divide on already-representable inputs and returns
    e.g. 6707.5199999999995 where DuckDB returns 6707.52 — bit-different
    doubles that flip the driver's value hash.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(round_ha(arr.to_numpy(zero_copy_only=False), digits))


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


def grouped_topk(
    ds, group_key: str, keys: list[str], descending: list[bool], k: int
):
    """Per-group top-k without a sort shuffle (batched-query serving's
    reduce step).

    Same streaming prune as :func:`topk`, applied per group: each batch
    keeps at most ``k`` rows PER group value (≤ groups×k survive per
    block), then the pruned remainder coalesces to one block for the
    final per-group head.  Valid for any number of groups, but the
    single-block finish assumes groups×k is driver-small — exactly the
    batched-retrieval shape (a query table of 10^0-10^3 rows, k ≤ 100).
    """
    ascending = [not d for d in descending]

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([group_key] + keys, ascending=[True] + ascending)
            .groupby(group_key, sort=False)
            .head(k)
        )

    pruned = ds.map_batches(local, batch_format="pandas", batch_size=65536)
    return (
        pruned.repartition(1)
        .map_batches(local, batch_format="pandas", batch_size=None)
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

    @staticmethod
    def _hash2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Two independent 64-bit hash streams (splitmix64 finalizer),
        fully vectorized — the probe path must not loop per key."""
        k = keys.astype(np.uint64, copy=False)

        def mix(x: np.ndarray) -> np.ndarray:
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return x ^ (x >> np.uint64(31))

        h1 = mix(k + np.uint64(0x9E3779B97F4A7C15))
        h2 = mix(k + np.uint64(0xD6E8FEB86659FD93)) | np.uint64(1)
        return h1, h2

    def add_many(self, keys: np.ndarray) -> None:
        h1, h2 = self._hash2(np.asarray(keys))
        nb = np.uint64(self.n_bits)
        for i in range(self.n_hashes):
            p = (h1 + np.uint64(i) * h2) % nb
            np.bitwise_or.at(
                self.bits, (p >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (p & np.uint64(63)),
            )

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership test → bool array (no Python per-key loop)."""
        h1, h2 = self._hash2(np.asarray(keys))
        nb = np.uint64(self.n_bits)
        ok = np.ones(len(h1), dtype=bool)
        for i in range(self.n_hashes):
            p = (h1 + np.uint64(i) * h2) % nb
            word = self.bits[(p >> np.uint64(6)).astype(np.int64)]
            ok &= ((word >> (p & np.uint64(63))) & np.uint64(1)).astype(bool)
        return ok

    def add(self, key: int) -> None:
        self.add_many(np.array([key], dtype=np.int64))

    def __contains__(self, key: int) -> bool:
        return bool(self.contains_many(np.array([key], dtype=np.int64))[0])

