"""Unit semantics for the corpus-quality operators (beyond the driver
oracle gate): Gopher repetition algebra on hand-computed docs, PII
redaction, bigram partial counts, KMV estimate formula."""

import hashlib

import numpy as np
import pyarrow as pa


def _docs_table(texts, doc_ids=None):
    ids = doc_ids or list(range(len(texts)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


class TestGopher:
    def test_hand_computed_metrics(self):
        from rust_bert_ray.functions.quality import gopher_metrics_batch

        # doc0: "ab cd ab cd ab" — bigrams: (ab,cd)x2 (cd,ab)x2 — tie on
        # count breaks lexicographically → "ab cd".
        out = gopher_metrics_batch(_docs_table(["ab cd ab cd ab"])).to_pandas()
        r = out.iloc[0]
        assert r.n_words == 5
        assert r.mean_word_len == 10 / 5
        assert r.top_bigram == "ab cd"
        assert r.top_bigram_n == 2
        # covered chars 2*(2+2)=8 of 10; dup chars: both bigrams dup → 16/10
        assert r.frac_top_bigram == 8 / 10
        assert r.dup_bigram_frac == 16 / 10
        assert r.keep == 0  # n_words < 40

    def test_single_word_doc_no_bigrams(self):
        from rust_bert_ray.functions.quality import gopher_metrics_batch

        out = gopher_metrics_batch(_docs_table(["hello"])).to_pandas()
        r = out.iloc[0]
        assert r.n_words == 1 and r.top_bigram == "" and r.top_bigram_n == 0
        assert r.frac_top_bigram == 0.0 and r.dup_bigram_frac == 0.0

    def test_batch_boundary_invariance(self):
        """Metrics are per-doc: one batch of N docs == N batches of 1."""
        from rust_bert_ray.functions.quality import gopher_metrics_batch

        texts = ["x y x y z", "aa bb aa", "solo", "p q r s p q"]
        whole = gopher_metrics_batch(_docs_table(texts)).to_pandas()
        parts = [
            gopher_metrics_batch(_docs_table([t], doc_ids=[i])).to_pandas()
            for i, t in enumerate(texts)
        ]
        import pandas as pd

        single = pd.concat(parts, ignore_index=True)
        pd.testing.assert_frame_equal(whole, single)


class TestPii:
    def test_redaction_and_counts(self):
        from rust_bert_ray.functions.quality import pii_scan_batch

        out = pii_scan_batch(_docs_table(["hello world"], doc_ids=[7])).to_pandas()
        r = out.iloc[0]
        # augmentation for doc 7: user7@example.com, 555-(7*7919%10000=5433), 10.7.0.7
        assert r.n_emails == 1 and r.n_phones == 1 and r.n_ipv4 == 1
        assert "<EMAIL>" in r.redacted and "<PHONE>" in r.redacted and "<IP>" in r.redacted
        assert "@" not in r.redacted and "555-" not in r.redacted

    def test_organic_pii_in_text(self):
        from rust_bert_ray.functions.quality import pii_scan_batch

        out = pii_scan_batch(
            _docs_table(["mail a.b@c.org and b@d.net ip 1.2.3.4 call 123-4567"])
        ).to_pandas()
        r = out.iloc[0]
        assert r.n_emails == 3  # two organic + one planted
        assert r.n_ipv4 == 2 and r.n_phones == 2


class TestNgramStats:
    def test_partials_count_within_doc_only(self):
        from rust_bert_ray.functions.quality import _bigram_partials

        # "a b" twice across two docs but never spanning the doc boundary
        t = _bigram_partials(_docs_table(["a b c", "b c a b"])).to_pandas()
        got = dict(zip(t.bigram, t.n))
        assert got == {"a b": 2, "b c": 2, "c a": 1}

    def test_topk_global_merge(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from rust_bert_ray.functions.quality import q_ngram_stats

        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(
            _docs_table(["a b a b", "a b z z", "q r"]), sf / "documents.parquet"
        )
        out = q_ngram_stats(str(sf), k=3).to_pandas()
        assert list(out.bigram) == ["a b", "b a", "a a"][:1] + list(out.bigram)[1:]
        assert out.iloc[0].bigram == "a b" and out.iloc[0].n == 3
        # ties broken lexicographically ascending
        assert list(out.n) == sorted(out.n, reverse=True)


class TestKmv:
    def test_estimate_formula(self):
        from rust_bert_ray.functions.quality import KMV_K, kmv_estimate

        # uniform hashes: v_k = k/(n+1) * 2^56 → estimate ≈ n
        n = 1000
        vk = int((KMV_K / (n + 1)) * (1 << 56))
        est = kmv_estimate(vk)
        assert abs(est - n) / n < 0.15

    def test_matches_brute_force(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from rust_bert_ray.functions.quality import (
            KMV_K,
            _KMV_HEX,
            kmv_estimate,
            q_distinct_sketch,
        )

        rng = np.random.default_rng(3)
        words = [f"w{i}" for i in range(200)]
        texts = [
            " ".join(rng.choice(words, size=30)) for _ in range(50)
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(50), pa.int64()),
                "source": pa.array(["s0"] * 50),
                "text": pa.array(texts),
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(t, sf / "documents.parquet")

        out = q_distinct_sketch(str(sf)).to_pandas()
        assert len(out) == 1
        distinct = sorted({w for txt in texts for w in txt.split(" ")})
        hv = sorted(
            int(hashlib.md5(w.encode()).hexdigest()[:_KMV_HEX], 16) for w in distinct
        )
        r = out.iloc[0]
        assert r.exact_distinct == len(distinct)
        assert r.est_distinct == kmv_estimate(hv[KMV_K - 1])
        assert r.kth_hash == format(hv[KMV_K - 1], f"0{_KMV_HEX}x")


class TestSourceSimilarity:
    def test_pairwise_jaccard_hand_case(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from rust_bert_ray.functions.quality import q_source_similarity

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "source": ["a", "b", "c"],
                "text": ["x y z", "y z w", "q r"],
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(t, sf / "documents.parquet")
        out = q_source_similarity(str(sf))
        got = {
            (r.source_a, r.source_b): (r.n_common, r.n_union, r.jaccard)
            for r in out.itertuples()
        }
        assert got[("a", "b")] == (2, 4, 0.5)
        assert got[("a", "c")] == (0, 5, 0.0)
        assert got[("b", "c")] == (0, 5, 0.0)
