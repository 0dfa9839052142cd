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
