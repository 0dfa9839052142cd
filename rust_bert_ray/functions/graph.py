"""Graph analytics over the materialized KG edges table.

The north-star pipeline materializes ``nodes`` and ``edges`` tables
(stages/canonicalize.py); a KG user's next question is always a graph
query over them — degree profiles, multi-hop paths, reachability.  These
operators re-express those queries Ray-Data-first over the edges table
``(edge_id, subj_id, pred, obj_id, n_obs, score)``:

- ``kg_degree_stats`` — per-node in/out degree + observation mass via a
  combiner (per-batch partial counts) feeding one vocab-sized grouped
  sum; the shuffle moves one partial row per distinct node per batch,
  never an edge row.
- ``kg_paths_2hop`` — the 2-hop path profile via Ray's hash-partitioned
  ``Dataset.join`` of the edges table with itself on the mid node
  (both-sides-large plan shape: at 10^12 docs neither side fits in
  memory, so this is the shuffle join, not a broadcast).
- ``kg_reachability`` — BFS hop distance from a deterministic hub seed
  (max out-degree, ties to min node_id) with the frontier broadcast via
  ``ray.put`` each hop: per-hop cost is one distributed filter over the
  edges table; the driver only ever holds (node_id, hop) pairs for
  *visited* nodes.  That invariant (visited set ≪ corpus) is the same
  bound the CC keep-list documents (functions/dedup.py); past it, swap
  the broadcast for a per-hop semi-join of edges against the frontier
  dataset — the plan shape stays otherwise identical.

Every output column is an integer count or a string id, so the DuckDB
oracles (native SQL over the INDEPENDENTLY built expected edges table —
rust_bert_ray/expected.py:1172 builds it from a fresh pandas pipeline,
not the Ray stages) hash-match exactly with no float-order traps.

Reference correspondence: the reference stops at triple emission
(token_classification.rs outputs spans; no graph layer exists there) —
these are net-new KG-construction operators the north rule's "graph
materialize" step implies.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data


# ------------------------------------------------------------ edge feed ----

_EDGES_CACHE: dict[str, "ray.data.MaterializedDataset"] = {}


def edges_dataset(sf_dir: str) -> "ray.data.Dataset":
    """Materialized edges table for the corpus scale matching ``sf_dir``.

    Runs the full extraction pipeline (NER → relations → linking →
    canonicalize) once per corpus and caches the materialized result for
    the session: the graph queries below are *consumers* of the edges
    table, and re-running three NER passes to answer three graph
    questions would benchmark the extractor, not the graph operator.
    The pipeline itself is oracle-verified separately (``kg_edges``).
    """
    import __ray_entry__ as entry_mod

    from rust_bert_ray.pipelines.kg import extract_and_link
    from rust_bert_ray.stages.canonicalize import build_edges

    root, docs_dir = entry_mod.corpus_for(sf_dir)
    cached = _EDGES_CACHE.get(root)
    if cached is None:
        docs = ray.data.read_parquet(docs_dir, columns=["doc_id", "spans"])
        cached = build_edges(extract_and_link(docs)).select_columns(
            ["subj_id", "pred", "obj_id", "n_obs"]
        ).materialize()
        _EDGES_CACHE[root] = cached
    return cached


# --------------------------------------------------------- degree stats ----

def kg_degree_stats(sf_dir: str):
    """Per-node degree profile: (node_id, out_deg, in_deg, out_obs, in_obs).

    Combiner shape: each batch emits one partial row per distinct node it
    touches (counts + n_obs mass, out- and in-side), then a single
    grouped sum merges partials.  Node cardinality bounds the shuffle.
    """
    import pandas as pd

    edges = edges_dataset(sf_dir)

    def partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby("subj_id", as_index=False).agg(
            p_out=("pred", "size"), p_out_obs=("n_obs", "sum")
        ).rename(columns={"subj_id": "node_id"})
        out["p_in"] = 0
        out["p_in_obs"] = 0
        inn = df.groupby("obj_id", as_index=False).agg(
            p_in=("pred", "size"), p_in_obs=("n_obs", "sum")
        ).rename(columns={"obj_id": "node_id"})
        inn["p_out"] = 0
        inn["p_out_obs"] = 0
        cols = ["node_id", "p_out", "p_in", "p_out_obs", "p_in_obs"]
        merged = pd.concat([out[cols], inn[cols]], ignore_index=True)
        return pa.Table.from_pydict(
            {
                "node_id": pa.array(merged["node_id"], type=pa.string()),
                "p_out": pa.array(merged["p_out"], type=pa.int64()),
                "p_in": pa.array(merged["p_in"], type=pa.int64()),
                "p_out_obs": pa.array(merged["p_out_obs"], type=pa.int64()),
                "p_in_obs": pa.array(merged["p_in_obs"], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        edges.map_batches(partials, batch_format="pyarrow", batch_size=65536)
        .groupby("node_id", num_partitions=8)
        .aggregate(
            Sum("p_out", alias_name="out_deg"),
            Sum("p_in", alias_name="in_deg"),
            Sum("p_out_obs", alias_name="out_obs"),
            Sum("p_in_obs", alias_name="in_obs"),
        )
    )


KG_DEGREE_STATS_SQL_TEMPLATE = """
WITH e AS MATERIALIZED (
    SELECT subj_id, obj_id, n_obs FROM read_parquet('{edges}')
),
o AS (SELECT subj_id AS node_id, COUNT(*) AS out_deg,
             CAST(SUM(n_obs) AS BIGINT) AS out_obs
      FROM e GROUP BY 1),
i AS (SELECT obj_id AS node_id, COUNT(*) AS in_deg,
             CAST(SUM(n_obs) AS BIGINT) AS in_obs
      FROM e GROUP BY 1)
SELECT COALESCE(o.node_id, i.node_id) AS node_id,
       COALESCE(out_deg, 0) AS out_deg,
       COALESCE(in_deg, 0) AS in_deg,
       COALESCE(out_obs, 0) AS out_obs,
       COALESCE(in_obs, 0) AS in_obs
FROM o FULL OUTER JOIN i ON o.node_id = i.node_id
"""


# ---------------------------------------------------------- 2-hop paths ----

def kg_paths_2hop(sf_dir: str):
    """2-hop path profile: (pred_1, pred_2, n_paths, n_mid).

    ``n_paths`` counts (src, mid, dst) walks with src != dst whose first
    edge carries pred_1 and second pred_2; ``n_mid`` counts distinct mid
    nodes per predicate pair.  Plan: rename-project both sides, hash-
    partitioned self-join on the mid node (``Dataset.join`` — the
    both-sides-large path), per-batch partial (pred_1, pred_2, mid)
    counts, then a tiny grouped finalize (predicate pairs are
    schema-bounded, so map_groups sees a handful of groups).
    """
    import pandas as pd

    edges = edges_dataset(sf_dir)

    def as_left(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "src": t.column("subj_id"),
                "pred_1": t.column("pred"),
                "mid": t.column("obj_id"),
            }
        )

    def as_right(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "mid_r": t.column("subj_id"),
                "pred_2": t.column("pred"),
                "dst": t.column("obj_id"),
            }
        )

    left = edges.map_batches(as_left, batch_format="pyarrow")
    right = edges.map_batches(as_right, batch_format="pyarrow")
    joined = left.join(right, "inner", 8, on=("mid",), right_on=("mid_r",))

    def partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["src"] != df["dst"]]
        g = df.groupby(["pred_1", "pred_2", "mid"], as_index=False).size()
        return pa.Table.from_pydict(
            {
                "pred_1": pa.array(g["pred_1"], type=pa.string()),
                "pred_2": pa.array(g["pred_2"], type=pa.string()),
                "mid": pa.array(g["mid"], type=pa.string()),
                "p_n": pa.array(g["size"], type=pa.int64()),
            }
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pred_1": [df["pred_1"].iloc[0]],
                "pred_2": [df["pred_2"].iloc[0]],
                "n_paths": [int(df["p_n"].sum())],
                "n_mid": [int(df["mid"].nunique())],
            }
        )

    return (
        joined.map_batches(partials, batch_format="pyarrow", batch_size=65536)
        .groupby(["pred_1", "pred_2"], num_partitions=4)
        .map_groups(finalize, batch_format="pandas")
    )


KG_PATHS_2HOP_SQL_TEMPLATE = """
WITH e AS MATERIALIZED (
    SELECT subj_id, pred, obj_id FROM read_parquet('{edges}')
),
p AS (
    SELECT a.pred AS pred_1, b.pred AS pred_2, a.obj_id AS mid
    FROM e a JOIN e b ON a.obj_id = b.subj_id
    WHERE a.subj_id <> b.obj_id
)
SELECT pred_1, pred_2, COUNT(*) AS n_paths, COUNT(DISTINCT mid) AS n_mid
FROM p GROUP BY 1, 2
"""


# --------------------------------------------------------- reachability ----

def hub_seed(edges: "ray.data.Dataset") -> str:
    """Deterministic BFS seed: the node with max out-degree, ties broken
    to the lexicographically smallest node_id."""
    from ray.data.aggregate import Sum

    from rust_bert_ray.functions.util import topk

    def partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("subj_id", as_index=False).agg(p_out=("pred", "size"))
        return pa.Table.from_pydict(
            {
                "node_id": pa.array(g["subj_id"], type=pa.string()),
                "p_out": pa.array(g["p_out"], type=pa.int64()),
            }
        )

    deg = (
        edges.map_batches(partials, batch_format="pyarrow", batch_size=65536)
        .groupby("node_id", num_partitions=8)
        .aggregate(Sum("p_out", alias_name="out_deg"))
    )
    top = topk(deg, ["out_deg", "node_id"], [True, False], 1).take(1)
    return top[0]["node_id"]


def kg_reachability(sf_dir: str, max_hops: int = 4):
    """Min-hop BFS distances (node_id, hops) from the hub seed, directed,
    capped at ``max_hops``.

    Per hop: broadcast the frontier id-set once (``ray.put``), one
    distributed filter over edges emits per-batch distinct successors,
    and ``unique()`` collapses them.  Driver state is the visited map —
    bounded by reachable-node count, not edges.  (Scale note: module
    docstring; swap broadcast → semi-join when a frontier outgrows the
    object store.)
    """
    edges = edges_dataset(sf_dir)
    seed = hub_seed(edges)

    visited: dict[str, int] = {seed: 0}
    frontier = {seed}
    for hop in range(1, max_hops + 1):
        fr_ref = ray.put(frontier)

        def succ(t: pa.Table, _ref=fr_ref) -> pa.Table:
            fr = ray.get(_ref)
            df = t.to_pandas()
            out = df.loc[df["subj_id"].isin(fr), "obj_id"].unique()
            return pa.Table.from_pydict(
                {"node_id": pa.array(sorted(out), type=pa.string())}
            )

        nxt = edges.map_batches(
            succ, batch_format="pyarrow", batch_size=65536
        ).unique("node_id")
        frontier = {n for n in nxt if n not in visited}
        if not frontier:
            break
        for n in frontier:
            visited[n] = hop

    items = sorted(visited.items())
    return pa.Table.from_pydict(
        {
            "node_id": pa.array([k for k, _ in items], type=pa.string()),
            "hops": pa.array([v for _, v in items], type=pa.int64()),
        }
    )


KG_REACHABILITY_SQL_TEMPLATE = """
WITH RECURSIVE e AS MATERIALIZED (
    SELECT subj_id, obj_id FROM read_parquet('{edges}')
),
seed AS MATERIALIZED (
    SELECT subj_id AS node_id FROM e
    GROUP BY subj_id ORDER BY COUNT(*) DESC, subj_id LIMIT 1
),
walk(node_id, hops) AS (
    SELECT node_id, 0 FROM seed
    UNION
    SELECT e.obj_id, w.hops + 1
    FROM walk w JOIN e ON e.subj_id = w.node_id
    WHERE w.hops < {max_hops}
)
SELECT node_id, CAST(MIN(hops) AS BIGINT) AS hops
FROM walk GROUP BY node_id
"""
