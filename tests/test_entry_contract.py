"""Driver-contract guard: __ray_entry__ keeps its promised shape."""

import inspect


def test_module_has_no_ray_init_calls():
    """The driver owns the Ray session; the module must never call
    ray.init/ray.shutdown (docstrings mentioning them are fine)."""
    import ast

    import __ray_entry__ as e

    tree = ast.parse(inspect.getsource(e))
    for node in ast.walk(tree):
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
            if node.func.attr in ("init", "shutdown"):
                base = node.func.value
                assert not (
                    isinstance(base, ast.Name) and base.id == "ray"
                ), f"forbidden ray.{node.func.attr}() at line {node.lineno}"


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    assert set(sql) <= set(qs)
    assert len(qs) >= 40
    assert len(sql) >= 24


def test_every_query_has_an_oracle():
    """Full verified surface: every queries() entry must carry an oracle
    (SQL-native or expected-table) — a new query without one silently
    downgrades the correctness gate to rows-only."""
    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    assert set(qs) == set(sql), f"rows-only queries: {sorted(set(qs) - set(sql))}"


def test_entry_returns_dataset_with_stable_schema(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    names = ds.schema().names
    assert {"doc_id", "subj", "pred", "obj", "subj_id", "obj_id"} <= set(names)
    assert ds.count() >= 0


def test_kg_triples_query_matches_expected_at_smoke_scale(ray_session):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    got = e.queries()["kg_triples"]("/root/testdata/sf0.001").to_pandas()
    exp = pq.read_table("/tmp/rbr_corpus/200/expected_triples.parquet").to_pandas()
    g = set(map(tuple, got[["doc_id", "subj", "pred", "obj"]].to_numpy()))
    w = set(map(tuple, exp[["doc_id", "subj", "pred", "obj"]].to_numpy()))
    tp = len(g & w)
    assert tp / max(1, len(g)) >= 0.95
    assert tp / max(1, len(w)) >= 0.95
