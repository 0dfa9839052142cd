"""Sub-token consolidation and label aggregation.

Reproduces ``consolidate_tokens`` / ``consolidate_labels`` at
/root/reference/src/pipelines/token_classification.rs:1137-1235:

- tokens are grouped into words: a token whose mask is ``CONTINUATION``
  belongs to the word started by the nearest preceding non-continuation
  token (``iter_consolidate_tokens`` semantics);
- only groups with >1 sub-token are replaced; singletons pass through
  untouched;
- merged text = concatenation of sub-token texts; offset = first.begin ..
  last.end; score = ∏ p(chosen label) over agreeing sub-tokens × ∏ (1−p)
  over dissenting sub-tokens (token_classification.rs:1174-1182);
- label aggregation: First / Last / Mode (ties broken by (count, max
  score), token_classification.rs:1218-1232) / Custom callable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from rust_bert_ray.tokenization import MASK_CONTINUATION, MASK_NONE


@dataclass
class Token:
    """Classified token (token_classification.rs:152-171)."""

    text: str
    score: float
    label: str
    label_index: int
    sentence: int
    index: int
    word_index: int
    offset: Optional[tuple[int, int]]
    mask: int


AGG_FIRST = "first"
AGG_LAST = "last"
AGG_MODE = "mode"

LabelAggregation = str | Callable[[list[Token]], tuple[int, str]]


def iter_word_groups(tokens: list[Token]) -> list[list[Token]]:
    """Split a token sequence into word groups (continuations attach left)."""
    groups: list[list[Token]] = []
    for tok in tokens:
        if tok.mask == MASK_CONTINUATION and groups:
            groups[-1].append(tok)
        else:
            groups.append([tok])
    return groups


def consolidate_labels(
    tokens: list[Token], aggregation: LabelAggregation
) -> tuple[int, str]:
    if callable(aggregation):
        return aggregation(tokens)
    if aggregation == AGG_FIRST:
        t = tokens[0]
        return t.label_index, t.label
    if aggregation == AGG_LAST:
        t = tokens[-1]
        return t.label_index, t.label
    if aggregation == AGG_MODE:
        counts: dict[tuple[int, str], tuple[int, float]] = {}
        for t in tokens:
            count, score = counts.get((t.label_index, t.label), (0, 0.0))
            counts[(t.label_index, t.label)] = (count + 1, max(score, t.score))
        # max by (count, max score); dict order breaks exact ties like the
        # reference's HashMap iteration (unspecified there too).
        best = max(counts.items(), key=lambda kv: (kv[1][0], kv[1][1]))
        return best[0]
    raise ValueError(f"unknown aggregation {aggregation!r}")


def consolidate_tokens(
    tokens: list[Token], aggregation: LabelAggregation = AGG_FIRST
) -> list[Token]:
    """Merge continuation sub-tokens into word-level tokens."""
    out: list[Token] = []
    for group in iter_word_groups(tokens):
        if len(group) == 1:
            out.append(group[0])
            continue
        label_index, label = consolidate_labels(group, aggregation)
        offset_start = group[0].offset[0] if group[0].offset else None
        offset_end = group[-1].offset[1] if group[-1].offset else None
        offset = (
            (offset_start, offset_end)
            if offset_start is not None and offset_end is not None
            else None
        )
        text = ""
        score = 1.0
        for t in group:
            text += t.text
            score *= t.score if t.label_index == label_index else 1.0 - t.score
        out.append(
            Token(
                text=text,
                score=score,
                label=label,
                label_index=label_index,
                sentence=group[0].sentence,
                index=group[0].index,
                word_index=group[0].word_index,
                offset=offset,
                mask=MASK_NONE,
            )
        )
    return out
