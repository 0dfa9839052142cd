"""Consolidation + label-aggregation fixtures (FIXTURES.md §3.8)."""

import pytest

from rust_bert_ray.decode.consolidate import (
    AGG_FIRST,
    AGG_LAST,
    AGG_MODE,
    Token,
    consolidate_tokens,
)
from rust_bert_ray.tokenization import MASK_CONTINUATION, MASK_NONE


def tok(text, score, label, label_index, mask=MASK_NONE, offset=(0, 1), index=0, word_index=0):
    return Token(
        text=text,
        score=score,
        label=label,
        label_index=label_index,
        sentence=0,
        index=index,
        word_index=word_index,
        offset=offset,
        mask=mask,
    )


def test_singleton_groups_pass_through():
    tokens = [tok("Amy", 0.9, "I-PER", 1), tok(".", 0.99, "O", 0)]
    out = consolidate_tokens(tokens)
    assert out == tokens


def test_score_product_agreeing_subtokens():
    tokens = [
        tok("Amst", 0.9, "I-LOC", 5, offset=(0, 4)),
        tok("erda", 0.8, "I-LOC", 5, MASK_CONTINUATION, offset=(4, 8)),
        tok("m", 0.7, "I-LOC", 5, MASK_CONTINUATION, offset=(8, 9)),
    ]
    out = consolidate_tokens(tokens, AGG_FIRST)
    assert len(out) == 1
    merged = out[0]
    assert merged.text == "Amsterdam"
    assert merged.offset == (0, 9)
    assert merged.label == "I-LOC"
    assert merged.score == pytest.approx(0.9 * 0.8 * 0.7)


def test_dissenting_subtoken_contributes_one_minus_p():
    # token_classification.rs:1174-1182 — dissenters contribute (1 - p).
    tokens = [
        tok("Par", 0.9, "I-LOC", 5, offset=(0, 3)),
        tok("is", 0.6, "O", 0, MASK_CONTINUATION, offset=(3, 5)),
    ]
    out = consolidate_tokens(tokens, AGG_FIRST)
    assert out[0].label == "I-LOC"
    assert out[0].score == pytest.approx(0.9 * (1.0 - 0.6))


def test_last_aggregation():
    tokens = [
        tok("ab", 0.9, "I-PER", 1, offset=(0, 2)),
        tok("cd", 0.8, "I-ORG", 3, MASK_CONTINUATION, offset=(2, 4)),
    ]
    out = consolidate_tokens(tokens, AGG_LAST)
    assert out[0].label == "I-ORG"
    assert out[0].score == pytest.approx((1.0 - 0.9) * 0.8)


def test_mode_majority_wins():
    tokens = [
        tok("a", 0.6, "I-PER", 1, offset=(0, 1)),
        tok("b", 0.7, "I-ORG", 3, MASK_CONTINUATION, offset=(1, 2)),
        tok("c", 0.5, "I-ORG", 3, MASK_CONTINUATION, offset=(2, 3)),
    ]
    out = consolidate_tokens(tokens, AGG_MODE)
    assert out[0].label == "I-ORG"


def test_mode_tie_broken_by_max_score():
    # (count, max score) tie-break — token_classification.rs:1218-1232.
    tokens = [
        tok("a", 0.6, "I-PER", 1, offset=(0, 1)),
        tok("b", 0.9, "I-ORG", 3, MASK_CONTINUATION, offset=(1, 2)),
    ]
    out = consolidate_tokens(tokens, AGG_MODE)
    assert out[0].label == "I-ORG"


def test_custom_aggregation_callable():
    tokens = [
        tok("a", 0.6, "I-PER", 1, offset=(0, 1)),
        tok("b", 0.9, "I-ORG", 3, MASK_CONTINUATION, offset=(1, 2)),
    ]
    out = consolidate_tokens(tokens, lambda ts: (0, "O"))
    assert out[0].label == "O"
    # both tokens dissent from "O" → (1-p)(1-p)
    assert out[0].score == pytest.approx(0.4 * 0.1)
