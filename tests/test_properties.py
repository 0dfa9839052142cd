"""Property-based checks (hypothesis) over the pure decode/sketch layers.

Fast, deterministic profile: small example counts, no Ray in the hot
loop (the distributed CC cross-check uses the session fixture with a
fixed set of random graphs, not hypothesis-driven Ray calls).
"""

import string

import numpy as np
from hypothesis import given, settings, strategies as st

from rust_bert_ray.functions.dedup import MinHashStage, SimHashStage
from rust_bert_ray.tokenization import WordPieceTokenizer

_TK = WordPieceTokenizer()

words = st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=12)
texts = st.lists(words, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(texts)
def test_wordpiece_offsets_tile_each_word(text):
    enc = _TK.encode(text)
    toks = _TK.convert_ids_to_tokens(enc.ids)
    # offsets must slice the source exactly, piece by piece
    for (b, e), tok in zip(enc.offsets, toks):
        raw = tok[2:] if tok.startswith("##") else tok
        assert tok == "[UNK]" or text[b:e] == raw
    # pieces of one word are contiguous and cover it completely
    by_word = {}
    for (b, e), w in zip(enc.offsets, enc.word_indices):
        lo, hi = by_word.get(w, (b, e))
        by_word[w] = (min(lo, b), max(hi, e))
    for (lo, hi) in by_word.values():
        assert text[lo:hi].strip() == text[lo:hi]  # no whitespace inside a word


@settings(max_examples=60, deadline=None)
@given(texts)
def test_wordpiece_ascii_roundtrip(text):
    # ascii-word texts round-trip exactly (char+##char fallback alphabet)
    full = _TK.build_with_special_tokens(_TK.encode(text))
    assert _TK.decode(full.ids) == text


@settings(max_examples=30, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_minhash_signature_properties(batch):
    st_ = MinHashStage()
    sig = st_.signatures(batch)
    assert sig.shape == (len(batch), st_.n_perm)
    # identical text → identical signature; est of self == 1.0
    sig2 = st_.signatures(list(batch))
    assert np.array_equal(sig, sig2)
    for row in sig:
        assert float((row == row).mean()) == 1.0


@settings(max_examples=30, deadline=None)
@given(texts, texts)
def test_simhash_hamming_bounds(a, b):
    ha, hb = SimHashStage.simhashes([a, b])
    ham = bin(int(ha) ^ int(hb)).count("1")
    assert 0 <= ham <= 64
    if set(a.split()) == set(b.split()):
        assert ham == 0  # simhash depends only on the token set


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    )
)
def test_unionfind_reference_matches_adjacency_bfs(pairs):
    """The expected-side union-find labeling equals a BFS ground truth."""
    # union-find (as in expected.dedup_clusters_minhash)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # BFS ground truth
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen = {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.append(x)
            stack.extend(adj[x] - set(comp))
        m = min(comp)
        for x in comp:
            seen[x] = m
    for node, label in seen.items():
        assert find(node) == label


def test_distributed_cc_matches_unionfind_on_random_graphs(ray_session):
    """Distributed hash-to-min CC == sequential union-find on 5 seeded
    random graphs (one Ray call per graph, outside hypothesis)."""
    import pyarrow as pa

    import ray.data

    from rust_bert_ray.functions.dedup import connected_components

    rng = np.random.default_rng(23)
    for trial in range(5):
        n_edges = int(rng.integers(1, 60))
        a = rng.integers(0, 50, n_edges)
        b = rng.integers(0, 50, n_edges)
        keep = a != b
        a, b = a[keep], b[keep]
        if not len(a):
            continue
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_a": pa.array(a, type=pa.int64()),
                 "doc_b": pa.array(b, type=pa.int64())}
            )
        )
        got = dict(
            zip(*[connected_components(ds).to_pandas()[c] for c in ("doc_id", "cluster_id")])
        )
        parent = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for u, v in zip(a.tolist(), b.tolist()):
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        want = {x: find(x) for x in set(a.tolist()) | set(b.tolist())}
        assert got == want, f"trial {trial}"


def test_simhash_trailing_empty_doc_regression():
    """A batch whose LAST doc tokenizes to zero tokens must not crash
    (reduceat start index == len(flat))."""
    from rust_bert_ray.functions.dedup import SimHashStage

    out = SimHashStage.simhashes(["hello world", ""])
    assert out[1] == 0 and out[0] != 0
    out2 = SimHashStage.simhashes(["", "", "a b", ""])
    assert list(out2[[0, 1, 3]]) == [0, 0, 0] and out2[2] != 0


def test_range_join_matches_bruteforce(ray_session):
    """Distributed range join == O(n^2) brute force on a small slice."""
    import pandas as pd

    import __ray_entry__ as e

    got = (
        e.queries()["q_events_range_join"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    purchases = ev[ev.event_type == "purchase"]
    clicks = ev[ev.event_type == "click"]
    delta = pd.Timedelta(minutes=15)
    want = []
    for _, p in purchases.iterrows():
        c = clicks[(clicks.user_id == p.user_id)
                   & (clicks.ts >= p.ts - delta) & (clicks.ts <= p.ts + delta)]
        want.append((p.event_id, p.user_id, len(c)))
    want_df = pd.DataFrame(
        want, columns=["event_id", "user_id", "n_nearby_clicks"]
    ).sort_values("event_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)


# ------------------------------------------- gopher algebra vs DuckDB ----

@settings(max_examples=25, deadline=None)
@given(st.lists(texts, min_size=1, max_size=6))
def test_gopher_metrics_match_duckdb_on_random_corpora(doc_texts):
    import duckdb
    import pyarrow as pa

    from rust_bert_ray.functions.quality import (
        Q_GOPHER_QUALITY_SQL,
        gopher_metrics_batch,
    )

    t = pa.table(
        {
            "doc_id": pa.array(range(len(doc_texts)), pa.int64()),
            "text": pa.array(doc_texts, pa.string()),
        }
    )
    got = gopher_metrics_batch(t).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    want = (
        con.execute(Q_GOPHER_QUALITY_SQL)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want[got.columns.tolist()].astype(got.dtypes.to_dict()))


@settings(max_examples=25, deadline=None)
@given(st.lists(texts, min_size=1, max_size=6))
def test_pii_scan_matches_duckdb_on_random_corpora(doc_texts):
    import duckdb
    import pyarrow as pa

    from rust_bert_ray.functions.quality import Q_PII_SCAN_SQL, pii_scan_batch

    t = pa.table(
        {
            "doc_id": pa.array(range(len(doc_texts)), pa.int64()),
            "text": pa.array(doc_texts, pa.string()),
        }
    )
    got = pii_scan_batch(t).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    want = (
        con.execute(Q_PII_SCAN_SQL).df().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.equals(want[got.columns.tolist()].astype(got.dtypes.to_dict()))


@given(
    st.lists(
        st.tuples(
            st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=20,
    ),
    st.randoms(),
)
@settings(max_examples=40, deadline=None)
def test_bpe_merge_loop_is_input_order_invariant(word_counts, rnd):
    """Pair counting sums over the whole table and ties break on the
    pair value, so the learned merges cannot depend on word order —
    the property that makes the distributed word-count fan-in safe."""
    from rust_bert_ray.functions.bpe_train import merge_loop

    a = merge_loop(list(word_counts), n_merges=8)
    shuffled = list(word_counts)
    rnd.shuffle(shuffled)
    assert merge_loop(shuffled, n_merges=8) == a


@given(
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=4),
        st.integers(min_value=-10**6, max_value=-1),
        min_size=1,
        max_size=12,
    ),
    st.text(alphabet="abcd", min_size=1, max_size=10),
)
@settings(max_examples=60, deadline=None)
def test_unigram_viterbi_reconstructs_word(weights, word):
    """Any segmentation must concatenate back to the input word, and
    every emitted piece must come from the vocab (or be a raw char on
    the no-path fallback)."""
    from rust_bert_ray.functions.unigram_train import viterbi_tokens

    toks = viterbi_tokens(word, weights)
    assert "".join(toks) == word
    if any(len(t) > 1 for t in toks):
        for t in toks:
            assert t in weights


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=1,
        max_size=120,
    )
)
@settings(max_examples=100, deadline=None)
def test_local_cc_matches_union_find(edges):
    """The vectorized driver-side CC kernel (hash-to-min + pointer
    jumping) must produce exactly the component-minimum labels of an
    independent scalar union-find on any graph shape."""
    from rust_bert_ray.functions.dedup import _local_cc

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    u = np.array([a for a, _ in edges], dtype=np.int64)
    v = np.array([b for _, b in edges], dtype=np.int64)

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)
    want = {n: min(members) for members in comp.values() for n in members}

    ids, lab = _local_cc(u, v)
    assert dict(zip(ids.tolist(), lab.tolist())) == want
