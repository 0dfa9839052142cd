"""QA span algebra, pooling modes, keyword rankers (FIXTURES.md §3.8)."""

import numpy as np
import pytest

from rust_bert_ray.decode.qa import (
    Answer,
    decode_spans,
    masked_softmax,
    merge_and_rank,
    slice_answer,
)
from rust_bert_ray.decode.pooling import l2_normalize, pool
from rust_bert_ray.decode.rankers import cosine_topk, max_sum, mmr


# ---------- QA ----------

def test_masked_softmax_zeroes_masked_positions():
    logits = np.array([1.0, 2.0, 3.0])
    p_mask = np.array([0, 1, 0])
    p = masked_softmax(logits, p_mask)
    assert p[1] == pytest.approx(0.0)
    assert p.sum() == pytest.approx(1.0)


def test_decode_spans_picks_best_valid_span():
    start = np.array([0.1, 0.7, 0.1, 0.1])
    end = np.array([0.1, 0.1, 0.7, 0.1])
    starts, ends, scores = decode_spans(start, end, top_k=1, max_answer_len=15)
    assert (starts[0], ends[0]) == (1, 2)
    assert scores[0] == pytest.approx(0.49)


def test_decode_spans_band_limit_excludes_long_answers():
    start = np.array([0.9, 0.0, 0.0, 0.0, 0.1])
    end = np.array([0.0, 0.0, 0.0, 0.0, 1.0])
    # span (0,4) has prob 0.9 but length 5 > max_answer_len=2 → banded out
    starts, ends, _ = decode_spans(start, end, top_k=1, max_answer_len=2)
    assert ends[0] - starts[0] <= 1


def test_decode_spans_rejects_end_before_start():
    start = np.array([0.0, 0.9, 0.1])
    end = np.array([0.9, 0.0, 0.1])
    starts, ends, _ = decode_spans(start, end, top_k=1, max_answer_len=15)
    assert ends[0] >= starts[0]


def test_decode_spans_topk_ordering():
    start = np.array([0.5, 0.3, 0.2])
    end = np.array([0.5, 0.3, 0.2])
    starts, ends, scores = decode_spans(start, end, top_k=3, max_answer_len=15)
    assert len(scores) == 3
    assert list(scores) == sorted(scores, reverse=True)


def test_merge_and_rank_dedups_first_occurrence():
    a = Answer(0.9, 0, 4, "Amy")
    b = Answer(0.9, 0, 4, "Amy")
    c = Answer(0.5, 5, 9, "Paris")
    out = merge_and_rank([c, a, b], top_k=5)
    assert out == [a, c]


def test_slice_answer_char_semantics():
    ctx = "Amy lives in Amsterdam"
    assert slice_answer(ctx, 13, 22) == "Amsterdam"


# ---------- pooling ----------

EMB = np.array([[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]])
MASK = np.array([1, 1, 0])  # third position is padding


def test_pool_cls():
    assert pool(EMB, MASK, "cls").tolist() == [1.0, 2.0]


def test_pool_max_ignores_padding():
    assert pool(EMB, MASK, "max").tolist() == [3.0, 4.0]


def test_pool_mean_ignores_padding():
    assert pool(EMB, MASK, "mean").tolist() == [2.0, 3.0]


def test_pool_mean_sqrt_len():
    out = pool(EMB, MASK, "mean_sqrt_len")
    assert out == pytest.approx(np.array([4.0, 6.0]) / np.sqrt(2.0))


def test_l2_normalize_clamps_zero_vector():
    out = l2_normalize(np.zeros((1, 3)))
    assert np.isfinite(out).all()


# ---------- rankers ----------

def test_cosine_topk():
    doc = np.array([1.0, 0.0])
    words = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    top = cosine_topk(doc, words, 2)
    assert [i for i, _ in top] == [0, 2]
    assert top[0][1] == pytest.approx(1.0)
    assert top[1][1] == pytest.approx(1 / np.sqrt(2))


def test_mmr_first_pick_is_argmax_then_diversifies():
    doc = np.array([1.0, 0.0])
    # words 0 and 1 nearly identical & closest to doc; word 2 orthogonal-ish
    words = np.array([[1.0, 0.0], [0.99, 0.01], [0.2, 1.0]])
    picks = mmr(doc, words, 2, diversity=0.9)
    assert picks[0][0] == 0
    assert picks[1][0] == 2  # diversity pushes away the near-duplicate


def test_mmr_zero_diversity_equals_topk_order():
    doc = np.array([1.0, 0.0])
    words = np.array([[1.0, 0.0], [0.9, 0.1], [0.2, 1.0]])
    picks = mmr(doc, words, 3, diversity=0.0)
    assert [i for i, _ in picks] == [i for i, _ in cosine_topk(doc, words, 3)]


def test_max_sum_prefers_internally_dissimilar_combo():
    doc = np.array([1.0, 0.0])
    words = np.array([[1.0, 0.0], [0.999, 0.001], [0.7, 0.7]])
    picks = max_sum(doc, words, 2, max_sum_candidates=3)
    assert sorted(i for i, _ in picks) == [0, 2]
