"""Shared dataset helpers."""

from __future__ import annotations

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
