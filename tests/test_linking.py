"""AliasIndex linking paths: exact, ANN+string-prior, unlinked."""

from rust_bert_ray.stages.linking import AliasIndex, node_id_for


def make_index():
    return AliasIndex(
        {"New York": "LOC", "Paris": "LOC", "Acme Corp": "ORG", "John Smith": "PER"},
        aliases={"NYC": "New York"},
    )


def test_exact_match_canonical_surface():
    idx = make_index()
    canonical, kind, score, method = idx.link("Paris")
    assert (canonical, kind, method) == ("Paris", "LOC", "exact")
    assert score == 1.0


def test_exact_match_is_case_insensitive():
    idx = make_index()
    canonical, _, _, method = idx.link("paris")
    assert canonical == "Paris" and method == "exact"


def test_alias_resolves_to_canonical():
    idx = make_index()
    canonical, kind, _, method = idx.link("NYC")
    assert (canonical, kind, method) == ("New York", "LOC", "exact")


def test_ann_path_links_variant_surface():
    idx = make_index()
    canonical, kind, score, method = idx.link("New York City")
    assert (canonical, kind, method) == ("New York", "LOC", "ann")
    assert 0.6 <= score <= 1.0


def test_ann_path_links_typo():
    idx = make_index()
    canonical, _, _, method = idx.link("Acme Corpp")
    assert canonical == "Acme Corp" and method == "ann"


def test_unrelated_surface_stays_unlinked():
    idx = make_index()
    canonical, _, score, method = idx.link("Zzyzx Quux")
    assert canonical is None and method == "none"


def test_node_id_normalization():
    assert node_id_for("LOC", "New York") == "ent:LOC:new_york"
