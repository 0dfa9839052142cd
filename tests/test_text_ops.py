"""Unit semantics for the training-data text operators (beyond the
driver oracle gate): deterministic mixture sampling."""


def test_sample_mixture_deterministic_and_stratified(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_bert_ray.functions.text import (
        MIXTURE_RATES,
        q_sample_mixture,
    )

    rng = np.random.default_rng(7)
    n = 20_000
    langs = rng.choice(["en", "de", "zh", "xx"], size=n)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(langs),
            "text": pa.array(["t"] * n),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, sf / "documents.parquet")

    out = q_sample_mixture(str(sf)).to_pandas()
    # keep decision is a pure function of (doc_id, lang): a second run
    # over a different partitioning returns the identical id set
    out2 = q_sample_mixture(str(sf)).to_pandas()
    assert set(out.doc_id) == set(out2.doc_id)

    # realized rates within ~3 sigma of the targets (hash uniformity)
    for lang, rate in [("en", MIXTURE_RATES["en"]), ("de", MIXTURE_RATES["de"]),
                       ("zh", MIXTURE_RATES["zh"]), ("xx", 0.10)]:
        total = int((langs == lang).sum())
        kept = int((out.lang == lang).sum())
        sigma = (rate * (1 - rate) / total) ** 0.5
        assert abs(kept / total - rate) < max(3 * sigma, 0.02), (lang, kept / total)


def test_tfidf_topk_semantics(ray_session, tmp_path):
    """tf * (SCALE // df) integer weights; top-3 per doc, token-ascending
    tie-break; tokens present in every doc get the minimal idf."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_bert_ray.functions.text import q_tfidf_topk

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    "apple apple banana common",
                    "cherry banana common common",
                ]
            ),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, sf / "documents.parquet")
    out = (
        q_tfidf_topk(str(sf))
        .to_pandas()
        .sort_values(["doc_id", "weight", "token"],
                     ascending=[True, False, True], ignore_index=True)
    )
    # df: apple 1, banana 2, cherry 1, common 2 → idf 1e6, 5e5, 1e6, 5e5
    d1 = out[out.doc_id == 1]
    assert list(zip(d1.token, d1.weight)) == [
        ("apple", 2_000_000), ("banana", 500_000), ("common", 500_000)
    ]
    d2 = out[out.doc_id == 2]
    assert list(zip(d2.token, d2.weight)) == [
        ("cherry", 1_000_000), ("common", 1_000_000), ("banana", 500_000)
    ]
