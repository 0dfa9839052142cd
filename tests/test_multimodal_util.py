"""Multimodal stage plumbing + BloomFilter unit tests."""

import pyarrow as pa
import pytest

from rust_bert_ray.corpus import generate
from rust_bert_ray.functions.util import BloomFilter
from rust_bert_ray.stages.multimodal import (
    MEDIA_FEATURE_DIM,
    MEDIA_SCHEMA,
    MediaDecodeStage,
    decode_media,
)


def test_decode_media_strict_raises():
    with pytest.raises(NotImplementedError):
        decode_media("image", "media://abc", strict=True)


def test_decode_media_deterministic_fake():
    a = decode_media("image", "media://abc")
    b = decode_media("image", "media://abc")
    assert a["width"] == b["width"] and (a["feature"] == b["feature"]).all()
    assert a["width"] > 0 and a["duration_ms"] == 0
    audio = decode_media("audio", "media://xyz")
    assert audio["width"] == 0 and audio["duration_ms"] >= 0


def test_media_stage_schema_and_rows():
    docs, _ = generate(50)
    out = MediaDecodeStage()(docs)
    assert out.schema.equals(MEDIA_SCHEMA)
    rows = out.to_pylist()
    n_media = sum(
        1 for spans in docs.column("spans").to_pylist()
        for s in spans if s["kind"] != "text"
    )
    assert len(rows) == n_media
    assert all(len(r["feature"]) == MEDIA_FEATURE_DIM for r in rows)
    assert all(r["media_ref"].startswith("media://") for r in rows)


def test_media_stage_strict_propagates():
    docs, _ = generate(50)
    with pytest.raises(NotImplementedError):
        MediaDecodeStage(strict=True)(docs)


def test_bloom_no_false_negatives():
    b = BloomFilter(1000)
    keys = list(range(0, 2000, 2))
    for k in keys:
        b.add(k)
    assert all(k in b for k in keys)


def test_bloom_fp_rate_reasonable():
    b = BloomFilter(1000, fp_rate=0.01)
    for k in range(1000):
        b.add(k)
    fps = sum(1 for k in range(10_000, 20_000) if k in b)
    assert fps < 500  # ~1% expected; wide margin for hash quality


def test_bloom_vectorized_matches_scalar():
    import numpy as np

    b = BloomFilter(500)
    b.add_many(np.arange(0, 1000, 3))
    probe = np.arange(0, 1500)
    vec = b.contains_many(probe)
    assert all(bool(vec[i]) == (int(i) in b) for i in probe)
    assert vec[::3][:334].all()  # no false negatives


def test_round_half_away_matches_duckdb():
    """round_ha / pc_round_ha must match DuckDB ROUND bit-for-bit —
    banker's rounding (numpy/pandas/Arrow default) flips value hashes at
    representable midpoints like 0.125."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from rust_bert_ray.functions.util import pc_round_ha, round_ha

    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [
            rng.uniform(-1e5, 1e5, 20000),
            np.round(rng.uniform(0, 1000, 10000), 3),  # many *.xx5 midpoints
            # price*(1-disc)-shaped products: near-representable values like
            # 6707.5199999999995 where Arrow's own round kernel skips the
            # final divide and returns a bit-different double than DuckDB
            np.round(rng.uniform(0, 1.2e5, 10000), 2)
            * (1 - np.round(rng.uniform(0, 0.1, 10000), 2)),
            np.array([0.125, -0.125, 2.675, -2.675, 0.005, 1.005, 6707.5199999999995]),
        ]
    )
    for d in (2, 4, 5):
        duck = (
            duckdb.sql(
                f"SELECT ROUND(v, {d}) r FROM (SELECT UNNEST(?::DOUBLE[]) v)",
                params=[vals.tolist()],
            )
            .df()["r"]
            .to_numpy()
        )
        assert (round_ha(vals, d) == duck).all()
        assert (pc_round_ha(pa.array(vals), d).to_numpy() == duck).all()


def test_media_frame_sample_rows_and_determinism():
    from rust_bert_ray.stages.multimodal import FRAME_SCHEMA, MediaFrameSampleStage

    docs, _ = generate(80)
    out = MediaFrameSampleStage(n_frames=3)(docs)
    assert out.schema.equals(FRAME_SCHEMA)
    n_timed = sum(
        1 for spans in docs.column("spans").to_pylist()
        for s in spans if s["kind"] in ("audio", "video")
    )
    assert out.num_rows == 3 * n_timed
    again = MediaFrameSampleStage(n_frames=3)(docs)
    assert out.equals(again)
    # timestamps are evenly spaced within the duration, increasing
    rows = out.to_pylist()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r["ts_ms"])
    assert all(ts == sorted(ts) for ts in by_ref.values())


def test_media_frame_sample_strict_raises():
    from rust_bert_ray.stages.multimodal import MediaFrameSampleStage

    docs, _ = generate(80)
    with pytest.raises(NotImplementedError):
        MediaFrameSampleStage(strict=True)(docs)


def test_media_resize_fit_in_box():
    from rust_bert_ray.stages.multimodal import RESIZE_SCHEMA, MediaResizeStage

    docs, _ = generate(80)
    out = MediaResizeStage(max_side=512)(docs)
    assert out.schema.equals(RESIZE_SCHEMA)
    rows = out.to_pylist()
    assert rows
    for r in rows:
        assert max(r["dst_w"], r["dst_h"]) <= 512
        assert r["dst_w"] <= r["src_w"] and r["dst_h"] <= r["src_h"]  # no upscale
        # aspect preserved within integer rounding
        if r["src_w"] and r["src_h"]:
            src_ar = r["src_w"] / r["src_h"]
            dst_ar = r["dst_w"] / r["dst_h"]
            assert abs(src_ar - dst_ar) / src_ar < 0.05
    with pytest.raises(NotImplementedError):
        MediaResizeStage(strict=True)(docs)


def test_media_transitions_offset_ordered(ray_session):
    import pyarrow as pa
    import ray.data

    from rust_bert_ray.stages.multimodal import media_transitions

    def span(kind, off):
        return {"kind": kind, "text": "", "media_ref": "", "offset": off}

    # doc A: text -> image -> text (listed OUT of offset order on purpose)
    # doc B: image -> image
    docs = pa.table(
        {
            "doc_id": ["a", "b"],
            "spans": [
                [span("image", 1), span("text", 0), span("text", 2)],
                [span("image", 0), span("image", 1)],
            ],
        }
    )
    out = media_transitions(ray.data.from_arrow(docs)).to_pandas()
    got = {(r.kind_a, r.kind_b): r.n for r in out.itertuples()}
    assert got == {("text", "image"): 1, ("image", "text"): 1, ("image", "image"): 1}
