"""Canonicalization + graph materialization: nodes and edges from linked
triples.

Net-new operators (north rule).  Shuffle discipline for 100 TB:

- **Combiner first**: every wide aggregation here pre-aggregates inside
  ``map_batches`` (one partial row per key per batch) so the all-to-all
  exchange moves per-key summaries, not per-mention rows.
- **Salting for hot keys**: mention surfaces are Zipfian ("France" can be
  a large fraction of all mentions).  Partial rows carry a deterministic
  ``_salt`` (crc of the batch's first doc_id, mod ``salt``); phase A
  groups by (key, _salt) so no single reducer sees every partial of a hot
  key, phase B merges the ≤salt per-key summaries.  Results are
  salt-invariant (all merges are associative+commutative).
- **Union-find semantics**: surfaces linked to the same canonical entity
  collapse into one node — phase B groups surface summaries by
  ``node_id`` (the linking stage's canonical assignment), collecting the
  surface forms as aliases.  Unlinked surfaces found their own node.
- doc_id provenance on edges is a capped sample (``doc_sample_cap``) —
  at 10^12 docs the full list is unboundable; the count is exact.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa

import ray.data

NODE_SCHEMA = pa.schema(
    [
        ("node_id", pa.string()),
        ("canonical", pa.string()),
        ("kind", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("n_mentions", pa.int64()),
        ("score", pa.float64()),
    ]
)

EDGE_SCHEMA = pa.schema(
    [
        ("edge_id", pa.string()),
        ("subj_id", pa.string()),
        ("pred", pa.string()),
        ("obj_id", pa.string()),
        ("n_obs", pa.int64()),
        ("score", pa.float64()),
        ("doc_ids", pa.list_(pa.string())),
    ]
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


class MentionPartials:
    """linked triples → one partial row per (node_id, surface_key) per batch."""

    def __init__(self, salt: int = 8):
        self.salt = salt

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = _batch_salt(batch, self.salt)
        agg: dict[tuple[str, str], dict] = {}
        for side in ("subj", "obj"):
            node_ids = batch.column(f"{side}_id").to_pylist()
            keys = batch.column(f"{side}_key").to_pylist()
            canonicals = batch.column(f"{side}_canonical").to_pylist()
            labels = batch.column(f"{side}_label").to_pylist()
            scores = batch.column(f"{side}_score").to_pylist()
            for nid, k, canon, lab, sc in zip(node_ids, keys, canonicals, labels, scores):
                row = agg.get((nid, k))
                if row is None:
                    agg[(nid, k)] = {
                        "node_id": nid,
                        "surface_key": k,
                        "canonical": canon,
                        "kind": _kind_of(nid, lab),
                        "n_mentions": 1,
                        "score": sc,
                        "_salt": s,
                    }
                else:
                    row["n_mentions"] += 1
                    row["score"] = max(row["score"], sc)
        return pa.Table.from_pylist(
            list(agg.values()),
            schema=pa.schema(
                [
                    ("node_id", pa.string()),
                    ("surface_key", pa.string()),
                    ("canonical", pa.string()),
                    ("kind", pa.string()),
                    ("n_mentions", pa.int64()),
                    ("score", pa.float64()),
                    ("_salt", pa.int32()),
                ]
            ),
        )


def _merge_surface_partials(g: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "node_id": [g["node_id"].iloc[0]],
            "surface_key": [g["surface_key"].iloc[0]],
            "canonical": [g["canonical"].iloc[0]],
            "kind": [g["kind"].iloc[0]],
            "n_mentions": [int(g["n_mentions"].sum())],
            "score": [float(g["score"].max())],
            "_salt": [0],
        }
    )


def _merge_node_group(g: pd.DataFrame, alias_cap: int) -> pd.DataFrame:
    aliases = sorted(set(g["surface_key"]))[:alias_cap]
    return pd.DataFrame(
        {
            "node_id": [g["node_id"].iloc[0]],
            "canonical": [g["canonical"].iloc[0]],
            "kind": [g["kind"].iloc[0]],
            "aliases": [aliases],
            "n_mentions": [int(g["n_mentions"].sum())],
            "score": [float(g["score"].max())],
        }
    )


def build_nodes(
    linked: "ray.data.Dataset", salt: int = 8, alias_cap: int = 16
) -> "ray.data.Dataset":
    """linked triples → nodes table (canonicalized entities)."""
    partials = linked.map_batches(MentionPartials(salt=salt), batch_format="pyarrow")
    # phase A: salted merge per (node_id, surface_key, _salt)
    per_surface = partials.groupby(["node_id", "surface_key", "_salt"]).map_groups(
        _merge_surface_partials, batch_format="pandas"
    )
    # phase A': collapse salts per surface
    per_surface = per_surface.groupby(["node_id", "surface_key"]).map_groups(
        _merge_surface_partials, batch_format="pandas"
    )
    # phase B: union-find collapse — surfaces sharing a canonical node_id
    nodes = per_surface.groupby("node_id").map_groups(
        lambda g: _merge_node_group(g, alias_cap), batch_format="pandas"
    )
    return nodes


class EdgePartials:
    """linked triples → one partial row per (subj_id, pred, obj_id) per batch."""

    def __init__(self, salt: int = 8, doc_sample_cap: int = 8):
        self.salt = salt
        self.doc_sample_cap = doc_sample_cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = _batch_salt(batch, self.salt)
        agg: dict[tuple[str, str, str], dict] = {}
        subj_ids = batch.column("subj_id").to_pylist()
        preds = batch.column("pred").to_pylist()
        obj_ids = batch.column("obj_id").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        scores = batch.column("rel_score").to_pylist()
        for sid, p, oid, d, sc in zip(subj_ids, preds, obj_ids, doc_ids, scores):
            row = agg.get((sid, p, oid))
            if row is None:
                agg[(sid, p, oid)] = {
                    "subj_id": sid,
                    "pred": p,
                    "obj_id": oid,
                    "n_obs": 1,
                    "score": sc,
                    "doc_ids": [d],
                    "_salt": s,
                }
            else:
                row["n_obs"] += 1
                row["score"] = max(row["score"], sc)
                if len(row["doc_ids"]) < self.doc_sample_cap:
                    row["doc_ids"].append(d)
        return pa.Table.from_pylist(
            list(agg.values()),
            schema=pa.schema(
                [
                    ("subj_id", pa.string()),
                    ("pred", pa.string()),
                    ("obj_id", pa.string()),
                    ("n_obs", pa.int64()),
                    ("score", pa.float64()),
                    ("doc_ids", pa.list_(pa.string())),
                    ("_salt", pa.int32()),
                ]
            ),
        )


def _merge_edge_partials(g: pd.DataFrame, doc_sample_cap: int = 8) -> pd.DataFrame:
    doc_ids: list[str] = []
    for ds_ in g["doc_ids"]:
        for d in ds_:
            if len(doc_ids) >= doc_sample_cap:
                break
            doc_ids.append(d)
    sid, p, oid = g["subj_id"].iloc[0], g["pred"].iloc[0], g["obj_id"].iloc[0]
    return pd.DataFrame(
        {
            "edge_id": [f"edge:{zlib.crc32(f'{sid}|{p}|{oid}'.encode()):08x}"],
            "subj_id": [sid],
            "pred": [p],
            "obj_id": [oid],
            "n_obs": [int(g["n_obs"].sum())],
            "score": [float(g["score"].max())],
            "doc_ids": [sorted(set(doc_ids))[:doc_sample_cap]],
            "_salt": [0],
        }
    )


def build_edges(
    linked: "ray.data.Dataset", salt: int = 8, doc_sample_cap: int = 8
) -> "ray.data.Dataset":
    """linked triples → deduplicated edges table."""
    partials = linked.map_batches(
        EdgePartials(salt=salt, doc_sample_cap=doc_sample_cap), batch_format="pyarrow"
    )
    merged = partials.groupby(["subj_id", "pred", "obj_id", "_salt"]).map_groups(
        lambda g: _merge_edge_partials(g, doc_sample_cap), batch_format="pandas"
    )
    edges = merged.groupby(["subj_id", "pred", "obj_id"]).map_groups(
        lambda g: _merge_edge_partials(g, doc_sample_cap), batch_format="pandas"
    )
    return edges.drop_columns(["_salt"])
