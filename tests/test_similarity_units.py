"""ANN units: k-means determinism, IVF/LSH recall vs brute force.

Uses the Ray-free expected builders so no cluster is needed.
"""

import numpy as np

from rust_bert_ray.expected import ann_ivf_topk, ann_lsh_topk, _ann_common, _topk_table
from rust_bert_ray.functions.similarity import kmeans_centroids
from rust_bert_ray.functions.util import round_ha

SF = "/root/testdata/sf0.001"


def _exact_topk(k=10):
    ids, M, q = _ann_common(SF, 0)
    qn = q / max(np.linalg.norm(q), 1e-300)
    norms = np.maximum(np.linalg.norm(M, axis=1), 1e-300)
    cos = round_ha((M @ qn) / norms, 5)
    mask = ids != 0
    return set(_topk_table(ids[mask], cos[mask], k).column("vec_id").to_pylist())


def test_kmeans_deterministic_and_normalized():
    rng = np.random.default_rng(5)
    X = rng.standard_normal((200, 16))
    C1 = kmeans_centroids(X, 8)
    C2 = kmeans_centroids(X, 8)
    assert np.array_equal(C1, C2)
    assert C1.shape == (8, 16)
    assert np.allclose(np.linalg.norm(C1, axis=1), 1.0)


def test_ivf_recall_vs_bruteforce():
    exact = _exact_topk()
    ivf = set(ann_ivf_topk(SF, "", n_probe=4).column("vec_id").to_pylist())
    # 4/16 probes: the true neighbors are concentrated near the query's
    # centroid, so recall should be well above the 25% scan fraction
    assert len(ivf & exact) >= 5, (ivf, exact)


def test_lsh_candidates_are_exact_cosines():
    # every LSH hit must carry the exact cosine the brute-force assigns
    ids, M, q = _ann_common(SF, 0)
    qn = q / max(np.linalg.norm(q), 1e-300)
    norms = np.maximum(np.linalg.norm(M, axis=1), 1e-300)
    cos_by_id = dict(zip(ids.tolist(), round_ha((M @ qn) / norms, 5).tolist()))
    t = ann_lsh_topk(SF, "")
    for vid, c in zip(t.column("vec_id").to_pylist(), t.column("cos").to_pylist()):
        assert cos_by_id[vid] == c
