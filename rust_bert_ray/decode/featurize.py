"""Sliding-window featurization with window-ownership flags.

Reproduces the semantics of ``generate_features`` +
``get_reference_feature_flag`` at
/root/reference/src/pipelines/token_classification.rs:836-928:

- ``doc_stride = max_length / 4`` (integer division),
- windows of ``max_content_length = max_length - n_special_tokens`` content
  tokens, each wrapped in [CLS]/[SEP],
- consecutive windows overlap by ``doc_stride`` content tokens
  (``start_token = end_token - doc_stride``),
- ``reference_feature[pos]`` marks which window *owns* each token: a
  non-first window disowns its first ``doc_stride/2`` content positions, a
  non-last window disowns its last ``doc_stride/2`` content positions —
  so every source token is owned by exactly one window.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from rust_bert_ray.tokenization import (
    MASK_SPECIAL,
    EncodedText,
    SubwordTokenizer,
)


@dataclass
class InputFeature:
    """One window of one example (token_classification.rs:194-207)."""

    input_ids: list[int]
    offsets: list[Optional[tuple[int, int]]]
    masks: list[int]
    word_indices: list[int]
    reference_feature: list[bool]
    example_index: int


def _reference_feature_flag(
    start_token: int,
    end_token: int,
    total_length: int,
    doc_stride: int,
    span: EncodedText,
) -> list[bool]:
    n = len(span.ids)
    if start_token > 0:
        leading_special = 0
        for m in span.masks:
            if m != MASK_SPECIAL:
                break
            leading_special += 1
        start_cutoff = doc_stride // 2 + leading_special
    else:
        start_cutoff = 0
    if end_token < total_length:
        trailing_special = 0
        for m in reversed(span.masks):
            if m != MASK_SPECIAL:
                break
            trailing_special += 1
        end_cutoff = n - doc_stride // 2 - trailing_special
    else:
        end_cutoff = n
    flags = [True] * n
    for i in range(min(start_cutoff, n)):
        flags[i] = False
    for i in range(max(end_cutoff, 0), n):
        flags[i] = False
    return flags


def generate_features(
    encoded: EncodedText,
    example_index: int,
    max_length: int = 128,
    n_special_tokens: int = 2,
    doc_stride: int | None = None,
) -> list[InputFeature]:
    """Window a full-document encoding into overlapping features.

    ``doc_stride`` defaults to ``max_length // 4`` (token-classification
    semantics, token_classification.rs:837); QA passes its own
    ``doc_stride`` (question_answering.rs:200-203 default 128).
    """
    max_content_length = max_length - n_special_tokens
    if doc_stride is None:
        doc_stride = max_length // 4
    doc_stride = max(1, min(doc_stride, max_content_length))
    total_length = len(encoded.ids)
    features: list[InputFeature] = []
    start_token = 0
    # Loop condition mirrors token_classification.rs:843 exactly
    # (`while spans.len() * doc_stride < len`), including the empty-input
    # case producing zero features.
    while len(features) * doc_stride < total_length:
        end_token = min(start_token + max_content_length, total_length)
        sub = EncodedText(
            ids=encoded.ids[start_token:end_token],
            offsets=encoded.offsets[start_token:end_token],
            masks=encoded.masks[start_token:end_token],
            word_indices=encoded.word_indices[start_token:end_token],
        )
        span = SubwordTokenizer.build_with_special_tokens(sub)
        flags = _reference_feature_flag(
            start_token, end_token, total_length, doc_stride, span
        )
        features.append(
            InputFeature(
                input_ids=span.ids,
                offsets=span.offsets,
                masks=span.masks,
                word_indices=span.word_indices,
                reference_feature=flags,
                example_index=example_index,
            )
        )
        if end_token == total_length:
            break
        start_token = end_token - doc_stride
    return features
