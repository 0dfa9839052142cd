"""Driver-contract guard: __ray_entry__ keeps its promised shape."""

import inspect


def test_module_imports_without_ray_init():
    import __ray_entry__ as e

    # import must not have initialised Ray (the driver owns the session)
    import ray

    # conftest's session fixture may have initialised Ray in other tests;
    # assert the module itself performs no init at import by checking the
    # module source for forbidden calls instead.
    src = inspect.getsource(e)
    assert "ray.init(" not in src
    assert "ray.shutdown(" not in src


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    assert set(sql) <= set(qs)
    assert len(qs) >= 40
    assert len(sql) >= 24


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
