"""Hot-entity skew: corpus knob + pipeline P/R under skew.

The north rule claims "salting for hot-entity skew" (BASELINE.json).
Salt-invariance is covered by test_canonicalize_salt.py; these tests
cover the skew *generator* contract and prove the flagship pipeline
stays exact on a corpus where ~90% of entity mentions collapse onto
three canonical nodes (Amy / Acme Corp / Paris) — the adversarial key
distribution for the canonicalize groupby.  The wall-clock side is
measured in BASELINE.md (skew stress table).
"""

import os

import pyarrow.dataset as pads
import pyarrow.parquet as pq

from rust_bert_ray.corpus import generate, write_corpus
from rust_bert_ray.pipelines.kg import run_kg_pipeline

HOT = {"Amy", "Acme Corp", "Paris", "France"}


def test_skew_zero_is_default_path():
    d0, t0 = generate(120)
    d1, t1 = generate(120, skew=0.0)
    assert d0.equals(d1) and t0.equals(t1)


def test_skew_changes_only_entity_fillers():
    """The bias mask is drawn after every other array, so a skewed corpus
    has identical doc ids, span counts, kinds, offsets and media refs —
    only the slot fillers (and therefore triples) move."""
    d0, _ = generate(200, skew=0.0)
    d1, _ = generate(200, skew=0.9)
    assert d0.column("doc_id").equals(d1.column("doc_id"))
    s0, s1 = d0.column("spans").to_pylist(), d1.column("spans").to_pylist()
    for row0, row1 in zip(s0, s1):
        assert len(row0) == len(row1)
        for a, b in zip(row0, row1):
            assert (a["kind"], a["offset"], a["media_ref"]) == (
                b["kind"],
                b["offset"],
                b["media_ref"],
            )


def test_skew_concentrates_entities():
    _, tri = generate(2000, skew=0.9)
    ends = tri.column("subj").to_pylist() + tri.column("obj").to_pylist()
    hot_frac = sum(e in HOT for e in ends) / max(1, len(ends))
    assert hot_frac > 0.85, hot_frac
    # uniform corpus for contrast: the same endpoints are a small minority
    _, uni = generate(2000, skew=0.0)
    ends_u = uni.column("subj").to_pylist() + uni.column("obj").to_pylist()
    uni_frac = sum(e in HOT for e in ends_u) / max(1, len(ends_u))
    assert uni_frac < 0.5, uni_frac


def test_kg_pipeline_exact_under_skew(ray_session, tmp_path):
    corp = str(tmp_path / "corpus")
    out = str(tmp_path / "kg_out")
    docs_dir = write_corpus(corp, 200, shard_rows=50, skew=0.9)
    run_kg_pipeline(docs_dir, out, n_groups=2)
    tri = pads.dataset(os.path.join(out, "triples")).to_table()
    exp = pq.read_table(os.path.join(corp, "expected_triples.parquet"))
    got = set(
        zip(
            tri.column("doc_id").to_pylist(),
            tri.column("subj_canonical").to_pylist(),
            tri.column("pred").to_pylist(),
            tri.column("obj_canonical").to_pylist(),
        )
    )
    want = set(
        zip(
            exp.column("doc_id").to_pylist(),
            exp.column("subj").to_pylist(),
            exp.column("pred").to_pylist(),
            exp.column("obj").to_pylist(),
        )
    )
    tp = len(got & want)
    assert tp / max(1, len(got)) >= 0.95
    assert tp / max(1, len(want)) >= 0.95
    # the hot nodes exist and carry most of the mentions
    nodes = pads.dataset(os.path.join(out, "nodes")).to_table()
    names = nodes.column("canonical").to_pylist()
    assert "Amy" in names and "Acme Corp" in names and "Paris" in names
