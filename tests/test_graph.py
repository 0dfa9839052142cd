"""Graph analytics (functions/graph.py) on a tiny hand-built edges table.

The sf0.01 oracle gate cross-checks the full pipeline; these tests pin
the graph algebra itself — degree partials/merge, 2-hop join semantics
(src != dst, distinct-mid counting), BFS hop minimality and the
deterministic hub-seed tie-break — against DuckDB on a graph small
enough to verify by eye.
"""

import duckdb
import pyarrow as pa
import pytest

import ray.data

from rust_bert_ray.functions import graph

#      a --r1--> b --r2--> c
#      a --r1--> c          (direct shortcut: c is hop 1, not 2)
#      b --r2--> a          (cycle back; a stays hop 0)
#      d --r3--> b          (d unreachable from a)
_EDGES = pa.table(
    {
        "subj_id": ["a", "a", "b", "b", "d"],
        "pred": ["r1", "r1", "r2", "r2", "r3"],
        "obj_id": ["b", "c", "c", "a", "b"],
        "n_obs": pa.array([2, 1, 3, 1, 5], type=pa.int64()),
    }
)


@pytest.fixture()
def tiny_edges(monkeypatch):
    monkeypatch.setattr(
        graph, "edges_dataset", lambda sf_dir: ray.data.from_arrow(_EDGES)
    )


def _sorted_df(result):
    t = result.to_pandas() if hasattr(result, "to_pandas") else result
    return t.sort_values(t.columns.tolist()).reset_index(drop=True)


def test_degree_stats_matches_duckdb(tiny_edges):
    got = _sorted_df(graph.kg_degree_stats("unused"))
    want = duckdb.sql(
        graph.KG_DEGREE_STATS_SQL_TEMPLATE.replace(
            "read_parquet('{edges}')", "_EDGES"
        )
    ).df()
    want = _sorted_df(want)[got.columns.tolist()]
    assert got.equals(want)
    # spot-check one row by hand: b has out {c,a} and in {a->b, d->b}
    b = got.set_index("node_id").loc["b"]
    assert (b.out_deg, b.in_deg, b.out_obs, b.in_obs) == (2, 2, 4, 7)


def test_paths_2hop_excludes_src_eq_dst(tiny_edges):
    got = _sorted_df(graph.kg_paths_2hop("unused"))
    # walks: a-b-c, a-b-a(drop src==dst), b-a-b(drop), b-a-c, d-b-c, d-b-a
    rows = {
        (r.pred_1, r.pred_2): (r.n_paths, r.n_mid) for r in got.itertuples()
    }
    assert rows == {
        ("r1", "r2"): (1, 1),  # a-b-c via b (a-b-a dropped)
        ("r2", "r1"): (1, 1),  # b-a-c via a (b-a-b dropped)
        ("r3", "r2"): (2, 1),  # d-b-c, d-b-a via b
    }


def test_reachability_min_hops_and_seed(tiny_edges):
    t = graph.kg_reachability("unused")
    hops = dict(zip(t.column("node_id").to_pylist(), t.column("hops").to_pylist()))
    # seed = max out-degree: a has 2, b has 2 -> tie broken to "a"
    assert hops == {"a": 0, "b": 1, "c": 1}  # c direct, d unreachable


def test_reachability_hop_cap(tiny_edges):
    t = graph.kg_reachability("unused", max_hops=0)
    assert t.to_pydict() == {"node_id": ["a"], "hops": [0]}


def test_components_two_clusters_and_self_loop(monkeypatch):
    # a-b-c chain | d-e | f self-loop only: three components
    cc_edges = pa.table(
        {
            "subj_id": ["a", "b", "d", "f"],
            "pred": ["r"] * 4,
            "obj_id": ["b", "c", "e", "f"],
            "n_obs": pa.array([1, 1, 1, 1], type=pa.int64()),
        }
    )
    monkeypatch.setattr(
        graph, "edges_dataset", lambda sf_dir: ray.data.from_arrow(cc_edges)
    )
    got = _sorted_df(graph.kg_components("unused"))
    assert dict(zip(got.node_id, got.component_id)) == {
        "a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "f",
    }
    # DuckDB recursive-closure oracle agrees on the same table
    want = duckdb.sql(
        graph.KG_COMPONENTS_SQL_TEMPLATE.replace(
            "read_parquet('{edges}')", "cc_edges"
        )
    ).df()
    want = _sorted_df(want)[got.columns.tolist()]
    assert got.equals(want)


def test_string_cc_driver_finish_matches_distributed(monkeypatch):
    # chain long enough to need >1 contraction round + a star + an island
    subj = [f"n{i:02d}" for i in range(20)] + ["hub"] * 5 + ["x1"]
    obj = [f"n{i:02d}" for i in range(1, 21)] + [f"leaf{j}" for j in range(5)] + ["x2"]
    pairs = ray.data.from_arrow(pa.table({"subj_id": subj, "obj_id": obj}))

    def run(**kw):
        return _sorted_df(graph._string_cc(pairs, "subj_id", "obj_id", **kw))

    local, dist = run(), run(driver_finish_limit=0)
    assert local.equals(dist)
    lab = dict(zip(local.node_id, local.component_id))
    assert lab["n20"] == "n00" and lab["leaf3"] == "hub" and lab["x2"] == "x1"


def test_components_all_self_loops(monkeypatch):
    # labels dataset is EMPTY (every edge is a loop): the empty typed
    # block must survive the left_outer join and every node self-labels
    loops = pa.table(
        {
            "subj_id": ["a", "b"],
            "pred": ["r", "r"],
            "obj_id": ["a", "b"],
            "n_obs": pa.array([1, 1], type=pa.int64()),
        }
    )
    monkeypatch.setattr(
        graph, "edges_dataset", lambda sf_dir: ray.data.from_arrow(loops)
    )
    got = _sorted_df(graph.kg_components("unused"))
    assert dict(zip(got.node_id, got.component_id)) == {"a": "a", "b": "b"}


def test_triangles_single_triangle(tiny_edges):
    # undirected simple edges: ab, ac, bc, bd -> one triangle {a,b,c}
    got = _sorted_df(graph.kg_triangles("unused"))
    assert dict(zip(got.node_id, got.n_tri)) == {"a": 1, "b": 1, "c": 1}
    want = duckdb.sql(
        graph.KG_TRIANGLES_SQL_TEMPLATE.replace("read_parquet('{edges}')", "_EDGES")
    ).df()
    want = _sorted_df(want)[got.columns.tolist()]
    assert got.astype(str).equals(want.astype(str))


def test_pagerank_fixed_point(tiny_edges):
    got = _sorted_df(graph.kg_pagerank("unused"))
    # hand-run of the integer recurrence (deg: a=2, b=2, d=1; 3 iters)
    assert dict(zip(got.node_id, got.rank_micro)) == {
        "a": 371796, "b": 598640, "c": 692936, "d": 150000,
    }
    want = duckdb.sql(
        graph.KG_PAGERANK_SQL_TEMPLATE.replace("read_parquet('{edges}')", "_EDGES")
    ).df()
    want = _sorted_df(want)[got.columns.tolist()]
    assert got.astype(str).equals(want.astype(str))


def test_influence_walk_counts(tiny_edges):
    got = _sorted_df(graph.kg_influence("unused"))
    rows = {
        r.node_id: (r.paths_1, r.paths_2, r.paths_3, r.influence)
        for r in got.itertuples()
    }
    # hand-enumerated walks on the module graph (see _EDGES comment)
    assert rows == {
        "a": (1, 2, 1, 4),
        "b": (2, 1, 2, 5),
        "c": (2, 3, 3, 8),
    }
    want = duckdb.sql(
        graph.KG_INFLUENCE_SQL_TEMPLATE.replace("read_parquet('{edges}')", "_EDGES")
    ).df()
    want = _sorted_df(want)[got.columns.tolist()]
    assert got.astype(str).equals(want.astype(str))


def test_similar_nodes_matches_duckdb(tiny_edges):
    # undirected: a-b, a-c, b-c, d-b.  Common-neighbor pairs with >=1
    # shared: (a,c) via b, (a,d) via b, (c,d) via b, (b,c) via a, ...
    got = _sorted_df(graph.kg_similar_nodes("unused", min_common=1))
    want = _sorted_df(
        duckdb.sql(
            graph.KG_SIMILAR_NODES_SQL_TEMPLATE.format(
                edges="{edges}", min_common=1
            ).replace("read_parquet('{edges}')", "_EDGES")
        ).df()
    )
    assert got.shape == want.shape
    assert got.equals(want.astype(got.dtypes.to_dict()))


def test_similar_nodes_jaccard_hand_value(tiny_edges):
    out = _sorted_df(graph.kg_similar_nodes("unused", min_common=1))
    row = out[(out.node_a == "a") & (out.node_b == "d")].iloc[0]
    # N(a)={b,c}, N(d)={b}: common {b}=1, union {b,c}=2
    assert row.n_common == 1 and row.n_union == 2 and row.jaccard == 0.5


def test_kcore_peels_to_triangle(tiny_edges):
    # 2-core of {a-b, a-c, b-c, d-b} is the a/b/c triangle (d is pendant)
    out = _sorted_df(graph.kg_kcore("unused", k=2))
    assert out.node_id.tolist() == ["a", "b", "c"]
    assert out.core_deg.tolist() == [2, 2, 2]


def test_kcore_k4_plus_pendant(monkeypatch):
    nodes = ["p", "q", "r", "s"]
    subj, obj = [], []
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            subj.append(u)
            obj.append(v)
    subj.append("s")
    obj.append("t")  # pendant keeps t out of the 3-core
    t = pa.table(
        {
            "subj_id": subj,
            "pred": ["r"] * len(subj),
            "obj_id": obj,
            "n_obs": pa.array([1] * len(subj), type=pa.int64()),
        }
    )
    monkeypatch.setattr(
        graph, "edges_dataset", lambda sf_dir: ray.data.from_arrow(t)
    )
    out = _sorted_df(graph.kg_kcore("unused", k=3))
    assert out.node_id.tolist() == ["p", "q", "r", "s"]
    assert out.core_deg.tolist() == [3, 3, 3, 3]


def test_kcore_empty_when_overpeeled(tiny_edges):
    # k=3 on the triangle+pendant graph removes everything
    out = graph.kg_kcore("unused", k=3).to_pandas()
    assert len(out) == 0


def test_expected_kcore_independent_peel_agrees():
    """The sequential expected-builder peel and the distributed peel
    agree on the tiny graph (same definition, different algorithms)."""
    from rust_bert_ray import expected

    nodes = ["p", "q", "r", "s"]
    subj, obj = [], []
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            subj.append(u)
            obj.append(v)
    subj.append("s")
    obj.append("t")
    fake_edges = pa.table({"subj_id": subj, "obj_id": obj})
    orig = expected.kg_edges
    try:
        expected.kg_edges = lambda sf_dir, corpus_root: fake_edges
        out = expected.kg_kcore("x", "y", k=3).to_pandas()
    finally:
        expected.kg_edges = orig
    assert out.node_id.tolist() == ["p", "q", "r", "s"]
    assert out.core_deg.tolist() == [3, 3, 3, 3]
