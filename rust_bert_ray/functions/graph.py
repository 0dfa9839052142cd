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
- ``kg_components`` — weakly-connected component labels via the same
  hash-to-min star contraction as dedup's CC (functions/dedup.py:600),
  re-keyed for STRING node ids (lexicographic min is the label; the
  algorithm only needs a total order).  Per round: one bucketed groupby
  + vectorized pandas contraction; the driver sees three scalars
  (count + two checksums) per round, never an edge.
- ``kg_triangles`` — per-node triangle participation counts on the
  undirected simple graph: orient edges a<b, build wedges with one
  hash-partitioned self-join (x<y<z by construction, so each triangle
  is closed exactly once), close them with a two-key join back against
  the edge set, explode corners, combine.  Hub wedges are the skew
  risk at scale — cap or sample per-node adjacency before the wedge
  join past ~10^4 degree (same knob as dedup's bucket_cap).
- ``kg_influence`` — integer path-count centrality: the number of
  directed WALKS of length 1, 2 and 3 ending at each node (walks, not
  simple paths — revisits count, which keeps the algebra exact and
  join-expressible).  Chained hash-partitioned self-joins with
  per-batch partial counts; all-integer output, so the SQL oracle is
  exact.

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


# ------------------------------------------ weakly-connected components ----

def _string_cc(pairs_ds, u_col: str, v_col: str, *, n_buckets: int = 64,
               num_partitions: int = 8, max_iters: int = 16,
               driver_finish_limit: int = 2_000_000):
    """Hash-to-min star contraction over STRING node ids.

    Same algorithm as functions/dedup.py:600 (see its docstring for the
    contraction invariant and O(log diameter) bound), re-keyed for
    string ids: the component label is the lexicographic minimum, and
    bucketing/checksums hash the strings (pandas' vectorized
    hash_pandas_object — deterministic for a fixed pandas build, which
    is all a within-run convergence check needs).  Returns labels
    (node_id, component_id) for nodes with >= 1 non-self edge.

    Like dedup's CC, a frontier of ``≤ driver_finish_limit`` symmetric
    edges is closed in one driver pass: strings are densified to sorted
    ``np.unique`` indices (index minimum ≡ lexicographic minimum), the
    integer kernel ``dedup._local_cc`` runs over the indices, and the
    labels map back through the same sorted array.  Above the limit the
    distributed loop runs unchanged — KG entity graphs at web scale can
    exceed any driver budget, dup-style small frontiers should not pay
    O(log d) scheduling floors.
    """
    import pandas as pd
    from pandas.util import hash_pandas_object

    from ray.data.aggregate import Sum

    def make_sym(a_col: str, b_col: str):
        def sym(t: pa.Table) -> pa.Table:
            u = pa.concat_arrays(
                [t.column(a_col).combine_chunks(), t.column(b_col).combine_chunks()]
            )
            v = pa.concat_arrays(
                [t.column(b_col).combine_chunks(), t.column(a_col).combine_chunks()]
            )
            return pa.Table.from_pydict({"u": u, "v": v})

        return sym

    def add_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        h = hash_pandas_object(
            t.column("u").to_pandas(), index=False
        ).to_numpy() % np.uint64(n_buckets)
        return t.append_column("_bucket", pa.array(h.astype("int64")))

    def contract(df: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        df = df[["u", "v"]].drop_duplicates()
        m = np.minimum(df.groupby("u")["v"].transform("min"), df["u"])
        star = pd.DataFrame(
            {"u": pd.concat([df["v"], df["u"]]), "v": pd.concat([m, m])}
        )
        star = star[star["u"] != star["v"]].drop_duplicates()
        return star

    def checksum_partial(t: pa.Table) -> pa.Table:
        import numpy as np

        hu = hash_pandas_object(t.column("u").to_pandas(), index=False).to_numpy()
        hv = hash_pandas_object(t.column("v").to_pandas(), index=False).to_numpy()
        # per-element 31-bit masks -> partial sums add exactly across any
        # block layout (dedup.py checksum_partial rationale)
        m1 = (hu * np.uint64(2654435761) ^ hv) & np.uint64((1 << 31) - 1)
        m2 = (hv * np.uint64(0x9E3779B1) ^ (hu >> np.uint64(1))) & np.uint64(
            (1 << 31) - 1
        )
        return pa.Table.from_pydict(
            {
                "n": pa.array([len(hu)], type=pa.int64()),
                "ck": pa.array([int(m1.sum())], type=pa.int64()),
                "ck2": pa.array([int(m2.sum())], type=pa.int64()),
            }
        )

    def signature(ds) -> tuple:
        agg = ds.map_batches(
            checksum_partial, batch_format="pyarrow", batch_size=65536
        ).aggregate(
            Sum("n", alias_name="n"),
            Sum("ck", alias_name="ck"),
            Sum("ck2", alias_name="ck2"),
        )
        return (agg.get("n") or 0, agg.get("ck") or 0, agg.get("ck2") or 0)

    edges = pairs_ds.map_batches(
        make_sym(u_col, v_col), batch_format="pyarrow", batch_size=65536
    ).materialize()
    if edges.count() <= driver_finish_limit:
        import numpy as np

        from rust_bert_ray.functions.dedup import _local_cc

        tables = [
            t for t in (ray.get(r) for r in edges.to_arrow_refs()) if t.num_rows
        ]
        if not tables:
            empty = pa.table(
                {
                    "node_id": pa.array([], type=pa.string()),
                    "component_id": pa.array([], type=pa.string()),
                }
            )
            return ray.data.from_arrow(empty)
        flat = pa.concat_tables(tables)
        u = flat.column("u").to_numpy(zero_copy_only=False)
        v = flat.column("v").to_numpy(zero_copy_only=False)
        ids = np.unique(np.concatenate([u, v]))  # sorted → index min ≡ lex min
        idx, lab = _local_cc(
            np.searchsorted(ids, u).astype(np.int64),
            np.searchsorted(ids, v).astype(np.int64),
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    "node_id": pa.array(ids[idx], type=pa.string()),
                    "component_id": pa.array(ids[lab], type=pa.string()),
                }
            )
        )
    prev_sig = None
    for _ in range(max_iters):
        edges = (
            edges.map_batches(add_bucket, batch_format="pyarrow", batch_size=65536)
            .groupby("_bucket", num_partitions=num_partitions)
            .map_groups(contract, batch_format="pandas")
            .map_batches(make_sym("u", "v"), batch_format="pyarrow", batch_size=65536)
            .materialize()
        )
        sig = signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig

    def labels(df: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        lab = df.groupby("u", as_index=False)["v"].min()
        lab["component_id"] = np.minimum(lab["u"], lab["v"])
        return lab.rename(columns={"u": "node_id"})[["node_id", "component_id"]]

    return (
        edges.map_batches(add_bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("_bucket", num_partitions=num_partitions)
        .map_groups(labels, batch_format="pandas")
    )


def _all_nodes(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct node ids appearing on either side of the edges table
    (per-batch unique partials, then one grouped distinct — the shuffle
    carries node ids, never edges)."""

    def both(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [
                t.column("subj_id").combine_chunks(),
                t.column("obj_id").combine_chunks(),
            ]
        )
        return pa.Table.from_pydict({"node_id": pa.compute.unique(ids)})

    return (
        edges.map_batches(both, batch_format="pyarrow", batch_size=65536)
        .groupby("node_id", num_partitions=8)
        .map_groups(
            lambda df: df.head(1)[["node_id"]], batch_format="pandas"
        )
    )


def kg_components(sf_dir: str):
    """Weakly-connected component labels (node_id, component_id) over
    EVERY node in the edges table; component_id = lexicographic minimum
    of the component.  Nodes whose only edges are self-loops (or which
    the contraction never labels) map to themselves via a
    hash-partitioned left_outer join — no driver-side label broadcast.
    """
    edges = edges_dataset(sf_dir)

    def drop_loops(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.not_equal(t.column("subj_id"), t.column("obj_id")))

    non_loop = edges.map_batches(drop_loops, batch_format="pyarrow")
    # materialize so the empty-labels branch is a metadata check, not a
    # recompute; an EMPTY labels side would feed the hash-shuffle join
    # schema-less partitions (ArrowInvalid "No match ... FieldRef"), so
    # a label-free graph (all self-loops) self-labels map-only instead
    labels = _string_cc(non_loop, "subj_id", "obj_id").materialize()
    if labels.count() == 0:
        return _all_nodes(edges).map_batches(
            lambda t: pa.Table.from_pydict(
                {"node_id": t.column("node_id"), "component_id": t.column("node_id")}
            ),
            batch_format="pyarrow",
        )

    joined = _all_nodes(edges).join(
        labels, "left_outer", 8, on=("node_id",)
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        comp = pc.coalesce(t.column("component_id"), t.column("node_id"))
        return pa.Table.from_pydict(
            {"node_id": t.column("node_id"), "component_id": comp}
        )

    return joined.map_batches(fill, batch_format="pyarrow")


KG_COMPONENTS_SQL_TEMPLATE = """
WITH RECURSIVE raw AS MATERIALIZED (
    SELECT subj_id, obj_id FROM read_parquet('{edges}')
),
ed AS MATERIALIZED (
    SELECT subj_id AS u, obj_id AS v FROM raw WHERE subj_id <> obj_id
    UNION
    SELECT obj_id, subj_id FROM raw WHERE subj_id <> obj_id
),
nodes AS MATERIALIZED (
    SELECT subj_id AS node_id FROM raw UNION SELECT obj_id FROM raw
),
walk(node_id, r) AS (
    SELECT node_id, node_id FROM nodes
    UNION
    SELECT w.node_id, ed.v FROM walk w JOIN ed ON ed.u = w.r
)
SELECT node_id, MIN(r) AS component_id FROM walk GROUP BY node_id
"""


# ------------------------------------------------------------ triangles ----

def kg_triangles(sf_dir: str):
    """Per-node triangle participation (node_id, n_tri) on the
    undirected simple graph; only nodes in >= 1 triangle are emitted.

    Plan: orient a<b + distinct (bucketed drop_duplicates — all copies
    of an (a, b) pair share hash(a)), wedge join on the middle node
    (x<y<z by construction, so each triangle closes exactly once), then
    close wedges against the edge set with a REDUCE-SIDE bucketed merge
    (union both sides keyed on the (lo, hi) endpoint pair, bucket by
    key hash, one vectorized pandas merge per bucket) — Ray 2.49's
    hash-join operator leaves schema-less empty partitions when its
    input is another join, so the closing step deliberately uses the
    groupby-merge join shape instead of chaining ``Dataset.join``.
    Corner counting folds into the same per-bucket body; the final
    shuffle carries (node_id, partial_count) rows only.
    """
    from ray.data.aggregate import Sum

    edges = edges_dataset(sf_dir)

    def orient(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s, o = t.column("subj_id"), t.column("obj_id")
        keep = pc.not_equal(s, o)
        a = pc.if_else(pc.less(s, o), s, o)
        b = pc.if_else(pc.less(s, o), o, s)
        return pa.Table.from_pydict({"a": a, "b": b}).filter(keep)

    def dedup_pairs(df):
        return df.drop_duplicates(["a", "b"])[["a", "b"]]

    und = (
        edges.map_batches(orient, batch_format="pyarrow", batch_size=65536)
        .groupby("a", num_partitions=8)
        .map_groups(dedup_pairs, batch_format="pandas")
    ).materialize()

    left = und.map_batches(
        lambda t: pa.Table.from_pydict({"x": t.column("a"), "y": t.column("b")}),
        batch_format="pyarrow",
    )
    right = und.map_batches(
        lambda t: pa.Table.from_pydict({"y_r": t.column("a"), "z": t.column("b")}),
        batch_format="pyarrow",
    )
    wedges = left.join(right, "inner", 8, on=("y",), right_on=("y_r",))

    def tag_wedges(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "k1": t.column("x"),
                "k2": t.column("z"),
                "mid": t.column("y"),
                "side": pa.array([1] * t.num_rows, type=pa.int64()),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "k1": t.column("a"),
                "k2": t.column("b"),
                "mid": pa.array([""] * t.num_rows, type=pa.string()),
                "side": pa.array([0] * t.num_rows, type=pa.int64()),
            }
        )

    tagged = wedges.map_batches(tag_wedges, batch_format="pyarrow").union(
        und.map_batches(tag_edges, batch_format="pyarrow")
    )

    def close_and_count(df) -> "pa.Table":
        import numpy as np
        import pandas as pd

        e = df.loc[df["side"] == 0, ["k1", "k2"]]
        w = df.loc[df["side"] == 1, ["k1", "k2", "mid"]]
        closed = w.merge(e, on=["k1", "k2"])
        corners = np.concatenate(
            [closed["k1"].to_numpy(), closed["mid"].to_numpy(),
             closed["k2"].to_numpy()]
        )
        uniq, counts = np.unique(corners, return_counts=True)
        return pd.DataFrame({"node_id": uniq, "p_n": counts.astype("int64")})

    return (
        tagged.map_batches(
            _with_bucket(["k1", "k2"]), batch_format="pyarrow", batch_size=65536
        )
        .groupby("_bucket", num_partitions=8)
        .map_groups(close_and_count, batch_format="pandas")
        .groupby("node_id", num_partitions=8)
        .aggregate(Sum("p_n", alias_name="n_tri"))
    )


KG_TRIANGLES_SQL_TEMPLATE = """
WITH ed AS MATERIALIZED (
    SELECT DISTINCT LEAST(subj_id, obj_id) AS a, GREATEST(subj_id, obj_id) AS b
    FROM read_parquet('{edges}') WHERE subj_id <> obj_id
),
tri AS MATERIALIZED (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM ed e1
    JOIN ed e2 ON e2.a = e1.b
    JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node_id, COUNT(*) AS n_tri
FROM (SELECT x AS node_id FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
GROUP BY node_id
"""


# ------------------------------------------------- path-count influence ----

def _with_bucket(key_cols, n_buckets: int = 32):
    """map_batches fn: append ``_bucket`` = hash of the concatenated key
    columns mod n_buckets (vectorized pandas string hash — only
    within-run consistency is needed for co-location)."""

    def f(t: pa.Table) -> pa.Table:
        import numpy as np
        from pandas.util import hash_pandas_object

        key = t.column(key_cols[0]).to_pandas()
        for c in key_cols[1:]:
            key = key + "\x00" + t.column(c).to_pandas()
        h = hash_pandas_object(key, index=False).to_numpy() % np.uint64(n_buckets)
        return t.append_column("_bucket", pa.array(h.astype("int64")))

    return f


def _propagate_counts(counts_ds, edges):
    """One hop of count propagation: given per-node walk counts
    (node_id, n), return (node_id, n) where n' [v] = sum over edges
    (u -> v) of n[u].  Reduce-side bucketed merge keyed on the source
    node — the shuffle carries the node-bounded count table plus edges,
    never materialized walks, which is what keeps path counting viable
    when walk cardinality explodes (hub nodes at 10^12 docs).
    """
    from ray.data.aggregate import Sum

    def tag_counts(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "k": t.column("node_id"),
                "n": t.column("n"),
                "dst": pa.array([""] * t.num_rows, type=pa.string()),
                "side": pa.array([1] * t.num_rows, type=pa.int64()),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "k": t.column("subj_id"),
                "n": pa.array([0] * t.num_rows, type=pa.int64()),
                "dst": t.column("obj_id"),
                "side": pa.array([0] * t.num_rows, type=pa.int64()),
            }
        )

    tagged = counts_ds.map_batches(tag_counts, batch_format="pyarrow").union(
        edges.map_batches(tag_edges, batch_format="pyarrow")
    )

    def merge_and_sum(df) -> "pd.DataFrame":
        import pandas as pd

        c = df.loc[df["side"] == 1, ["k", "n"]]
        e = df.loc[df["side"] == 0, ["k", "dst"]]
        hit = e.merge(c, on="k")
        out = hit.groupby("dst", as_index=False)["n"].sum()
        return out.rename(columns={"dst": "node_id"})[["node_id", "n"]]

    return (
        tagged.map_batches(
            _with_bucket(["k"]), batch_format="pyarrow", batch_size=65536
        )
        .groupby("_bucket", num_partitions=8)
        .map_groups(merge_and_sum, batch_format="pandas")
        .groupby("node_id", num_partitions=8)
        .aggregate(Sum("n", alias_name="n"))
    )


def kg_influence(sf_dir: str):
    """Integer path-count centrality: (node_id, paths_1, paths_2,
    paths_3, influence) where paths_h counts directed WALKS of length h
    ending at the node (revisits count — what keeps the algebra exact
    and shuffle-expressible) and influence is their sum.  Only nodes
    with >= 1 incoming walk are emitted.

    Plan: paths_1 = in-degree counts; each further hop is one
    ``_propagate_counts`` round (n'[v] = sum over (u -> v) of n[u]) —
    the recurrence means NO walk is ever materialized; every shuffle is
    bounded by node count + edge count regardless of walk cardinality.
    """
    from ray.data.aggregate import Sum

    edges = edges_dataset(sf_dir)

    def in_partials(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("obj_id").to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(ids, return_counts=True)
        return pa.Table.from_pydict(
            {
                "node_id": pa.array(uniq, type=pa.string()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    p1 = (
        edges.map_batches(in_partials, batch_format="pyarrow", batch_size=65536)
        .groupby("node_id", num_partitions=8)
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    p2 = _propagate_counts(p1, edges).materialize()
    p3 = _propagate_counts(p2, edges).materialize()

    def widen(which: str):
        def f(t: pa.Table) -> pa.Table:
            import numpy as np

            n = t.column("n").to_numpy(zero_copy_only=False)
            zero = np.zeros(len(n), dtype="int64")
            return pa.Table.from_pydict(
                {
                    "node_id": t.column("node_id"),
                    "p1": pa.array(n if which == "p1" else zero, type=pa.int64()),
                    "p2": pa.array(n if which == "p2" else zero, type=pa.int64()),
                    "p3": pa.array(n if which == "p3" else zero, type=pa.int64()),
                }
            )

        return f

    merged = (
        p1.map_batches(widen("p1"), batch_format="pyarrow")
        .union(
            p2.map_batches(widen("p2"), batch_format="pyarrow"),
            p3.map_batches(widen("p3"), batch_format="pyarrow"),
        )
        .groupby("node_id", num_partitions=8)
        .aggregate(
            Sum("p1", alias_name="paths_1"),
            Sum("p2", alias_name="paths_2"),
            Sum("p3", alias_name="paths_3"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        infl = pc.add(
            pc.add(t.column("paths_1"), t.column("paths_2")), t.column("paths_3")
        )
        return t.append_column("influence", infl)

    return merged.map_batches(finish, batch_format="pyarrow")


KG_INFLUENCE_SQL_TEMPLATE = """
WITH e AS MATERIALIZED (
    SELECT subj_id, obj_id FROM read_parquet('{edges}')
),
p1 AS (SELECT obj_id AS node_id, COUNT(*) AS n FROM e GROUP BY 1),
p2 AS (SELECT b.obj_id AS node_id, COUNT(*) AS n
       FROM e a JOIN e b ON a.obj_id = b.subj_id GROUP BY 1),
p3 AS (SELECT c.obj_id AS node_id, COUNT(*) AS n
       FROM e a JOIN e b ON a.obj_id = b.subj_id
              JOIN e c ON b.obj_id = c.subj_id GROUP BY 1)
SELECT COALESCE(p1.node_id, p2.node_id, p3.node_id) AS node_id,
       COALESCE(p1.n, 0) AS paths_1,
       COALESCE(p2.n, 0) AS paths_2,
       COALESCE(p3.n, 0) AS paths_3,
       COALESCE(p1.n, 0) + COALESCE(p2.n, 0) + COALESCE(p3.n, 0) AS influence
FROM p1
FULL OUTER JOIN p2 ON p1.node_id = p2.node_id
FULL OUTER JOIN p3 ON COALESCE(p1.node_id, p2.node_id) = p3.node_id
"""


# ----------------------------------------------- fixed-point PageRank ----

def _edges_with_outdeg(edges: "ray.data.Dataset"):
    """Distinct (subj_id, obj_id) pairs annotated with the source's
    out-degree ``d``.  Bucketing by hash(subj) co-locates every edge of
    a source, so dedupe + degree are ONE vectorized pandas body per
    bucket — no separate degree join."""

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"subj_id": t.column("subj_id"), "obj_id": t.column("obj_id")}
        )

    def dedup_and_degree(df) -> "pd.DataFrame":
        df = df.drop_duplicates(["subj_id", "obj_id"])[["subj_id", "obj_id"]]
        df["d"] = df.groupby("subj_id")["obj_id"].transform("size").astype("int64")
        return df

    return (
        edges.map_batches(project, batch_format="pyarrow", batch_size=65536)
        .map_batches(
            _with_bucket(["subj_id"]), batch_format="pyarrow", batch_size=65536
        )
        .groupby("_bucket", num_partitions=8)
        .map_groups(dedup_and_degree, batch_format="pandas")
    )


def kg_pagerank(sf_dir: str, iters: int = 3):
    """Fixed-point integer PageRank: (node_id, rank_micro) after
    ``iters`` power iterations at damping 0.85 over the DISTINCT
    (subj, obj) edge graph, in micro-rank units (start 1_000_000 per
    node; update r'[v] = 150_000 + sum over (u -> v) of
    (r[u] * 85 // 100) // out_deg[u], all int64 floor arithmetic).

    Fixed-point on purpose: float PageRank's per-node contribution sum
    depends on reduction order, which no distributed/SQL pair can pin
    bit-exactly — integer floor algebra makes the DuckDB chained-CTE
    oracle EXACT.  Dangling mass (sink nodes) is dropped, as the
    documented semantics on both sides.

    Plan per iteration (same propagation shape as ``kg_influence``):
    union the node-bounded rank table with degree-annotated edges,
    bucket by source, one vectorized merge per bucket emitting integer
    contributions, grouped sum, union with the base-mass rows.  No
    per-node tasks; shuffles bounded by nodes + edges.
    """
    from ray.data.aggregate import Sum

    edges = edges_dataset(sf_dir)
    ed = _edges_with_outdeg(edges).materialize()
    nodes = _all_nodes(edges).materialize()

    def base_rows(r0: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "node_id": t.column("node_id"),
                    "r": pa.array([r0] * t.num_rows, type=pa.int64()),
                }
            )

        return f

    rank = nodes.map_batches(base_rows(1_000_000), batch_format="pyarrow")

    def tag_rank(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "k": t.column("node_id"),
                "r": t.column("r"),
                "dst": pa.array([""] * t.num_rows, type=pa.string()),
                "d": pa.array([0] * t.num_rows, type=pa.int64()),
                "side": pa.array([1] * t.num_rows, type=pa.int64()),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "k": t.column("subj_id"),
                "r": pa.array([0] * t.num_rows, type=pa.int64()),
                "dst": t.column("obj_id"),
                "d": t.column("d"),
                "side": pa.array([0] * t.num_rows, type=pa.int64()),
            }
        )

    def contribs(df) -> "pd.DataFrame":
        import pandas as pd

        rk = df.loc[df["side"] == 1, ["k", "r"]]
        e = df.loc[df["side"] == 0, ["k", "dst", "d"]]
        hit = e.merge(rk, on="k")
        hit["p"] = (hit["r"].to_numpy() * 85 // 100) // hit["d"].to_numpy()
        out = hit.groupby("dst", as_index=False)["p"].sum()
        return out.rename(columns={"dst": "node_id"})[["node_id", "p"]]

    for _ in range(iters):
        propagated = (
            rank.map_batches(tag_rank, batch_format="pyarrow")
            .union(ed.map_batches(tag_edges, batch_format="pyarrow"))
            .map_batches(
                _with_bucket(["k"]), batch_format="pyarrow", batch_size=65536
            )
            .groupby("_bucket", num_partitions=8)
            .map_groups(contribs, batch_format="pandas")
            .map_batches(
                lambda t: pa.Table.from_pydict(
                    {"node_id": t.column("node_id"), "r": t.column("p")}
                ),
                batch_format="pyarrow",
            )
        )
        rank = (
            nodes.map_batches(base_rows(150_000), batch_format="pyarrow")
            .union(propagated)
            .groupby("node_id", num_partitions=8)
            .aggregate(Sum("r", alias_name="r"))
            .materialize()
        )

    return rank.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_id": t.column("node_id"), "rank_micro": t.column("r")}
        ),
        batch_format="pyarrow",
    )


KG_PAGERANK_SQL_TEMPLATE = """
WITH e AS MATERIALIZED (
    SELECT DISTINCT subj_id, obj_id FROM read_parquet('{edges}')
),
nodes AS MATERIALIZED (
    SELECT subj_id AS node_id FROM e UNION SELECT obj_id FROM e
),
deg AS MATERIALIZED (
    SELECT subj_id AS node_id, COUNT(*) AS d FROM e GROUP BY 1
),
r0 AS (SELECT node_id, CAST(1000000 AS BIGINT) AS r FROM nodes),
r1 AS (
    SELECT n.node_id,
           CAST(150000 + COALESCE(SUM(r.r * 85 // 100 // deg.d), 0) AS BIGINT) AS r
    FROM nodes n
    LEFT JOIN e ON e.obj_id = n.node_id
    LEFT JOIN r0 r ON r.node_id = e.subj_id
    LEFT JOIN deg ON deg.node_id = e.subj_id
    GROUP BY n.node_id
),
r2 AS (
    SELECT n.node_id,
           CAST(150000 + COALESCE(SUM(r.r * 85 // 100 // deg.d), 0) AS BIGINT) AS r
    FROM nodes n
    LEFT JOIN e ON e.obj_id = n.node_id
    LEFT JOIN r1 r ON r.node_id = e.subj_id
    LEFT JOIN deg ON deg.node_id = e.subj_id
    GROUP BY n.node_id
),
r3 AS (
    SELECT n.node_id,
           CAST(150000 + COALESCE(SUM(r.r * 85 // 100 // deg.d), 0) AS BIGINT) AS r
    FROM nodes n
    LEFT JOIN e ON e.obj_id = n.node_id
    LEFT JOIN r2 r ON r.node_id = e.subj_id
    LEFT JOIN deg ON deg.node_id = e.subj_id
    GROUP BY n.node_id
)
SELECT node_id, r AS rank_micro FROM r3
"""


# --------------------------------------------- neighbor similarity ----

def _undirected_pairs(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct a<b endpoint pairs of the undirected simple graph
    (same orientation+bucketed-dedup shape as kg_triangles)."""

    def orient(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s, o = t.column("subj_id"), t.column("obj_id")
        keep = pc.not_equal(s, o)
        a = pc.if_else(pc.less(s, o), s, o)
        b = pc.if_else(pc.less(s, o), o, s)
        return pa.Table.from_pydict({"a": a, "b": b}).filter(keep)

    def dedup_pairs(df):
        return df.drop_duplicates(["a", "b"])[["a", "b"]]

    return (
        edges.map_batches(orient, batch_format="pyarrow", batch_size=65536)
        .groupby("a", num_partitions=8)
        .map_groups(dedup_pairs, batch_format="pandas")
    )


def kg_similar_nodes(sf_dir: str, min_common: int = 2):
    """Node-pair Jaccard similarity by shared neighbors.

    For every unordered node pair (a < b) with at least ``min_common``
    common neighbors on the undirected simple graph: |N(a) ∩ N(b)|,
    |N(a) ∪ N(b)| and their ratio (the classic link-prediction /
    entity-merge-candidate score).

    Plan: wedge join of the adjacency list with itself on the middle
    node (each common neighbor of (x, z) produces exactly one wedge
    row), bucketed pandas pair-count (same reduce shape as
    kg_triangles' closing step — hot mids are the skew knob, cap
    adjacency past ~10^4 degree at scale), then degrees merged in via
    a driver-side broadcast (the node vocabulary is gazetteer-bounded;
    see kg_reachability's frontier note for the semi-join swap past
    that bound).  jaccard is one IEEE divide of two exact ints, so the
    native-SQL oracle hash-matches bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    edges = edges_dataset(sf_dir)
    und = _undirected_pairs(edges).materialize()

    adj = und.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "mid": pa.concat_arrays(
                    [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [t.column("b").combine_chunks(), t.column("a").combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
        batch_size=4096,  # feeds Dataset.join: batch_size must be declared
    )

    # node degrees on the undirected simple graph (vocab-bounded)
    deg_df = (
        adj.groupby("mid", num_partitions=8).count().to_pandas()
    )
    deg = dict(zip(deg_df["mid"], deg_df["count()"].astype(np.int64)))
    deg_ref = ray.put(deg)

    left = adj.map_batches(
        lambda t: pa.Table.from_pydict(
            {"mid": t.column("mid"), "x": t.column("nbr")}
        ),
        batch_format="pyarrow",
        batch_size=4096,
    )
    right = adj.map_batches(
        lambda t: pa.Table.from_pydict(
            {"mid_r": t.column("mid"), "z": t.column("nbr")}
        ),
        batch_format="pyarrow",
        batch_size=4096,
    )
    wedges = left.join(right, "inner", 8, on=("mid",), right_on=("mid_r",))

    def pair_counts(df: "pd.DataFrame") -> "pd.DataFrame":
        sub = df.loc[df["x"] < df["z"]]
        g = sub.groupby(["x", "z"], as_index=False).size()
        g = g.loc[g["size"] >= min_common]
        return pd.DataFrame(
            {
                "node_a": g["x"],
                "node_b": g["z"],
                "n_common": g["size"].astype(np.int64),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        a = t.column("node_a").to_pylist()
        b = t.column("node_b").to_pylist()
        common = t.column("n_common").to_numpy(zero_copy_only=False).astype(np.int64)
        da = np.array([d[x] for x in a], dtype=np.int64)
        db = np.array([d[x] for x in b], dtype=np.int64)
        union = da + db - common
        return pa.Table.from_pydict(
            {
                "node_a": pa.array(a, pa.string()),
                "node_b": pa.array(b, pa.string()),
                "n_common": pa.array(common, pa.int64()),
                "n_union": pa.array(union, pa.int64()),
                "jaccard": pa.array(common.astype(np.float64) / union, pa.float64()),
            }
        )

    return (
        wedges.map_batches(
            _with_bucket(["x", "z"]), batch_format="pyarrow", batch_size=65536
        )
        .groupby("_bucket", num_partitions=8)
        .map_groups(pair_counts, batch_format="pandas")
        .map_batches(finalize, batch_format="pyarrow", batch_size=65536)
    )


KG_SIMILAR_NODES_SQL_TEMPLATE = """
WITH ed AS MATERIALIZED (
    SELECT DISTINCT LEAST(subj_id, obj_id) AS a, GREATEST(subj_id, obj_id) AS b
    FROM read_parquet('{edges}') WHERE subj_id <> obj_id
),
adj AS MATERIALIZED (
    SELECT a AS mid, b AS nbr FROM ed UNION ALL SELECT b, a FROM ed
),
deg AS MATERIALIZED (
    SELECT mid AS node, COUNT(*) AS d FROM adj GROUP BY 1
),
cnt AS (
    SELECT a1.nbr AS node_a, a2.nbr AS node_b, COUNT(*) AS n_common
    FROM adj a1 JOIN adj a2 ON a1.mid = a2.mid AND a1.nbr < a2.nbr
    GROUP BY ALL HAVING COUNT(*) >= {min_common}
)
SELECT c.node_a, c.node_b,
       CAST(c.n_common AS BIGINT) AS n_common,
       CAST(da.d + db.d - c.n_common AS BIGINT) AS n_union,
       CAST(c.n_common AS DOUBLE) / (da.d + db.d - c.n_common) AS jaccard
FROM cnt c
JOIN deg da ON da.node = c.node_a
JOIN deg db ON db.node = c.node_b
"""


# ------------------------------------------------- k-core extraction ----

def kg_kcore(sf_dir: str, k: int = 3, max_rounds: int = 64):
    """Nodes of the k-core of the undirected simple graph with their
    within-core degree.

    Distributed peel: each round recomputes degrees with one
    vocab-sized grouped count, broadcasts the surviving-node set
    (gazetteer-bounded, like kg_reachability's frontier) and filters
    the edge list; stops at the fixpoint.  The driver only ever holds
    node-vocab-sized degree tables and one edge count per round.
    Oracle: independent sequential peel in rust_bert_ray.expected
    (expected-table), built from the independently-derived expected
    edges — not from these stages.
    """
    import numpy as np

    edges = edges_dataset(sf_dir)
    und = _undirected_pairs(edges).materialize()
    n_edges = und.count()

    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg_df = (
            und.map_batches(
                lambda t: pa.Table.from_pydict(
                    {
                        "node": pa.concat_arrays(
                            [
                                t.column("a").combine_chunks(),
                                t.column("b").combine_chunks(),
                            ]
                        )
                    }
                ),
                batch_format="pyarrow",
                batch_size=65536,
            )
            .groupby("node", num_partitions=8)
            .count()
            .to_pandas()
        )
        keep = set(deg_df.loc[deg_df["count()"] >= k, "node"])
        if len(keep) == len(deg_df):
            break  # fixpoint: every remaining node has degree >= k
        keep_ref = ray.put(keep)

        def peel(t: pa.Table, _ref=keep_ref) -> pa.Table:
            import pyarrow.compute as pc

            kept = pa.array(sorted(ray.get(_ref)), pa.string())
            mask = pc.and_(
                pc.is_in(t.column("a"), value_set=kept),
                pc.is_in(t.column("b"), value_set=kept),
            )
            return t.filter(mask)

        und = und.map_batches(
            peel, batch_format="pyarrow", batch_size=65536
        ).materialize()
        n_edges = und.count()

    def core_deg(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
        )
        return pa.Table.from_pydict({"node_id": nodes})

    out = (
        und.map_batches(core_deg, batch_format="pyarrow", batch_size=65536)
        .groupby("node_id", num_partitions=8)
        .count()
    )
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "node_id": pa.array(t.column("node_id").to_pylist(), pa.string()),
                "core_deg": pa.array(
                    np.asarray(t.column("count()"), dtype=np.int64), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
