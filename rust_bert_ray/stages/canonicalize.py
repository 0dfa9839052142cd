"""Canonicalization + graph materialization: nodes and edges from linked
triples.

Net-new operators (north rule).  Shuffle discipline for 100 TB:

- **Combiner first**: every wide aggregation pre-aggregates inside
  ``map_batches`` (one partial row per key per batch) so the all-to-all
  exchange moves per-key summaries, not per-mention rows.
- **Bucketed merge, not per-group tasks**: partials are hash-bucketed
  (``_bucket = crc(key [+ salt]) % n_buckets``) and each bucket is merged
  with ONE vectorized pandas groupby — thousands of tiny per-group UDF
  calls collapse into ``n_buckets`` calls.
- **Salting for hot keys**: mention surfaces are Zipfian ("France" can be
  a large fraction of mentions).  Phase A buckets by crc(key, salt) —
  the salt (derived from each batch's first doc_id) splits a hot key's
  partials across reducers; phase B merges the ≤salt per-key summaries
  by crc(key).  All merges are associative+commutative → salt-invariant
  results.
- **Union-find semantics**: surfaces linked to the same canonical entity
  collapse into one node — the final merge groups surface summaries by
  ``node_id`` (the linking stage's canonical assignment), collecting
  surface forms as aliases.  Unlinked surfaces found their own node.
- doc_id provenance on edges is a capped sample (``doc_sample_cap``) —
  at 10^12 docs the full list is unboundable; the count stays exact.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _crc_bucket(keys: pd.Series, n_buckets: int, salt: pd.Series | None = None) -> np.ndarray:
    joined = keys if salt is None else keys + "\x00" + salt.astype(str)
    return np.fromiter(
        (zlib.crc32(k.encode()) % n_buckets for k in joined),
        dtype=np.int64,
        count=len(joined),
    )


def _batch_salt(batch: pa.Table, salt: int) -> int:
    if salt <= 1 or batch.num_rows == 0:
        return 0
    first = batch.column("doc_id")[0].as_py() or ""
    return zlib.crc32(first.encode()) % salt


def _kind_of(node_id: str, label: str) -> str:
    if node_id.startswith("ent:"):
        return node_id.split(":", 2)[1]
    return label


# ------------------------------------------------------------------- nodes

class MentionPartials:
    """linked triples → one partial row per (node_id, surface_key) per batch."""

    def __init__(self, salt: int = 8):
        self.salt = salt

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = _batch_salt(batch, self.salt)
        frames = []
        for side in ("subj", "obj"):
            sub = batch.select(
                [f"{side}_id", f"{side}_key", f"{side}_canonical",
                 f"{side}_label", f"{side}_score"]
            ).rename_columns(["node_id", "surface_key", "canonical", "label", "score"])
            frames.append(sub.to_pandas())
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby(["node_id", "surface_key"], as_index=False).agg(
            canonical=("canonical", "first"),
            label=("label", "first"),
            n_mentions=("score", "size"),
            score=("score", "max"),
        )
        g["kind"] = [
            _kind_of(nid, lab) for nid, lab in zip(g["node_id"], g["label"])
        ]
        g["_salt"] = s
        return pa.Table.from_pandas(
            g[["node_id", "surface_key", "canonical", "kind", "n_mentions", "score", "_salt"]],
            preserve_index=False,
        )


def _merge_surfaces(df: pd.DataFrame) -> pd.DataFrame:
    return df.groupby(["node_id", "surface_key"], as_index=False).agg(
        canonical=("canonical", "first"),
        kind=("kind", "first"),
        n_mentions=("n_mentions", "sum"),
        score=("score", "max"),
    )


def merge_node_state(df: pd.DataFrame, n_buckets: int = 32) -> pa.Table:
    """Merge per-(node_id, surface_key) summaries and (re)assign the final
    per-node bucket.  Associative + commutative in every field (sum / max
    / first-of-functionally-dependent), so it serves BOTH as phase A of
    the full build (merging salted partials) and as the incremental
    bucket-state merge (persisted state ∪ an increment's partials)."""
    out = _merge_surfaces(df)
    out["_bucket"] = _crc_bucket(out["node_id"], n_buckets)
    return pa.Table.from_pandas(out, preserve_index=False)


def finalize_nodes_group(df: pd.DataFrame, alias_cap: int = 16) -> pd.DataFrame:
    """One node-bucket of surface state → final node rows (finish the
    surface merge, then union-find collapse into nodes)."""
    df = _merge_surfaces(df)

    def agg_group(g: pd.DataFrame) -> pd.Series:
        return pd.Series(
            {
                "canonical": g["canonical"].iloc[0],
                "kind": g["kind"].iloc[0],
                "aliases": sorted(set(g["surface_key"]))[:alias_cap],
                "n_mentions": int(g["n_mentions"].sum()),
                "score": float(g["score"].max()),
            }
        )

    out = (
        df.groupby("node_id")
        .apply(agg_group, include_groups=False)
        .reset_index()
    )
    return out[["node_id", "canonical", "kind", "aliases", "n_mentions", "score"]]


def node_state(
    linked: "ray.data.Dataset", salt: int = 8, n_buckets: int = 32
) -> "ray.data.Dataset":
    """linked triples → the per-bucket surface state feeding the node
    finalize: one merged row per (node_id, surface_key), ``_bucket`` =
    crc(node_id) % n_buckets.  This is the canonicalize CLUSTER STATE the
    incremental-ingest path persists per bucket — linear in distinct
    (node, surface) pairs, not in mentions."""
    partials = linked.map_batches(
        MentionPartials(salt=salt), batch_format="pyarrow", batch_size=65536
    )

    def bucket_salted(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["_bucket"] = _crc_bucket(
            df["node_id"] + "|" + df["surface_key"], n_buckets, df["_salt"]
        )
        # return Arrow: shuffling pandas blocks is ~10x slower
        return pa.Table.from_pandas(df, preserve_index=False)

    np_ = min(n_buckets, 16)
    # phase A: salted bucket merge (hot surfaces split across reducers),
    # re-bucketed by node_id so the finalize phase can both finish the
    # surface merge AND collapse surfaces into nodes in one grouping
    return (
        partials.map_batches(bucket_salted, batch_format="pyarrow", batch_size=65536)
        .groupby("_bucket", num_partitions=np_)
        .map_groups(
            lambda df: merge_node_state(df, n_buckets), batch_format="pandas"
        )
    )


def build_nodes(
    linked: "ray.data.Dataset",
    salt: int = 8,
    alias_cap: int = 16,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """linked triples → nodes table (canonicalized entities)."""
    np_ = min(n_buckets, 16)
    return (
        node_state(linked, salt=salt, n_buckets=n_buckets)
        .groupby("_bucket", num_partitions=np_)
        .map_groups(
            lambda df: finalize_nodes_group(df, alias_cap), batch_format="pandas"
        )
    )


# ------------------------------------------------------------------- edges

class EdgePartials:
    """linked triples → one partial row per (subj_id, pred, obj_id) per batch."""

    def __init__(self, salt: int = 8, doc_sample_cap: int = 8):
        self.salt = salt
        self.doc_sample_cap = doc_sample_cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = _batch_salt(batch, self.salt)
        cap = self.doc_sample_cap
        df = (
            batch.select(["subj_id", "pred", "obj_id", "doc_id", "rel_score"])
            .rename_columns(["subj_id", "pred", "obj_id", "doc_id", "score"])
            .to_pandas()
        )
        g = df.groupby(["subj_id", "pred", "obj_id"], as_index=False).agg(
            n_obs=("doc_id", "size"),
            score=("score", "max"),
            # min-cap (sorted before truncating): the merge layer's
            # "doc_ids min-cap set union" is associative/commutative ONLY
            # if partials are min-cap too — first-cap-in-arrival-order
            # would make incremental state merges and full rebuilds keep
            # DIFFERENT provenance samples for >cap-observation edges
            doc_ids=("doc_id", lambda sr: sorted(set(sr))[:cap]),
        )
        g["_salt"] = s
        return pa.Table.from_pandas(g, preserve_index=False)


def _merge_edges(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    return df.groupby(["subj_id", "pred", "obj_id"], as_index=False).agg(
        n_obs=("n_obs", "sum"),
        score=("score", "max"),
        doc_ids=("doc_ids", lambda sr: sorted({d for lst in sr for d in lst})[:cap]),
    )


def merge_edge_state(
    df: pd.DataFrame, doc_sample_cap: int = 8, n_buckets: int = 32
) -> pa.Table:
    """Merge per-(subj, pred, obj) summaries and (re)assign the final
    edge bucket.  Associative + commutative (n_obs sum, score max,
    doc_ids min-cap set union), so it serves both phase A of the full
    build and the incremental bucket-state merge."""
    out = _merge_edges(df, doc_sample_cap)
    key = out["subj_id"] + "|" + out["pred"] + "|" + out["obj_id"]
    out["_bucket"] = _crc_bucket(key, n_buckets)
    return pa.Table.from_pandas(out, preserve_index=False)


def finalize_edges_group(df: pd.DataFrame, doc_sample_cap: int = 8) -> pd.DataFrame:
    """One edge-bucket of state → final deduplicated edge rows."""
    out = _merge_edges(df, doc_sample_cap)
    out["edge_id"] = [
        f"edge:{zlib.crc32(f'{s}|{p}|{o}'.encode()):08x}"
        for s, p, o in zip(out["subj_id"], out["pred"], out["obj_id"])
    ]
    return out[
        ["edge_id", "subj_id", "pred", "obj_id", "n_obs", "score", "doc_ids"]
    ]


def edge_state(
    linked: "ray.data.Dataset",
    salt: int = 8,
    doc_sample_cap: int = 8,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """linked triples → per-bucket edge state (one merged row per
    (subj, pred, obj), ``_bucket`` = crc(key) % n_buckets) — the edge
    cluster state the incremental-ingest path persists."""
    cap = doc_sample_cap
    partials = linked.map_batches(
        EdgePartials(salt=salt, doc_sample_cap=cap),
        batch_format="pyarrow",
        batch_size=65536,
    )

    def bucket_salted(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        key = df["subj_id"] + "|" + df["pred"] + "|" + df["obj_id"]
        df["_bucket"] = _crc_bucket(key, n_buckets, df["_salt"])
        return pa.Table.from_pandas(df, preserve_index=False)

    np_ = min(n_buckets, 16)
    return (
        partials.map_batches(bucket_salted, batch_format="pyarrow", batch_size=65536)
        .groupby("_bucket", num_partitions=np_)
        .map_groups(
            lambda df: merge_edge_state(df, cap, n_buckets), batch_format="pandas"
        )
    )


def build_edges(
    linked: "ray.data.Dataset",
    salt: int = 8,
    doc_sample_cap: int = 8,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """linked triples → deduplicated edges table."""
    cap = doc_sample_cap
    np_ = min(n_buckets, 16)
    return (
        edge_state(linked, salt=salt, doc_sample_cap=cap, n_buckets=n_buckets)
        .groupby("_bucket", num_partitions=np_)
        .map_groups(
            lambda df: finalize_edges_group(df, cap), batch_format="pandas"
        )
    )
