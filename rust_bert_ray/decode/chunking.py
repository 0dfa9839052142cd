"""BIO/BIOES entity chunking (seqeval-style state machine).

Reproduces ``EntityBuilder`` + ``consolidate_entities`` at
/root/reference/src/pipelines/ner.rs:324-457:

- tags parsed from labels as ``B- I- O E- S-`` prefixes (``get_tag``,
  ner.rs:437-446); the part after ``-`` is the entity label;
- ``O`` flushes; ``B``/``S`` flush then start; ``I``/``E`` continue unless
  the previous tag was ``E``/``S`` or the label changed (then flush+start);
- a trailing open entity is flushed at end of sequence;
- entity word = token texts joined with ``" "``; score = ∏ token scores;
  offset = first.begin .. last.end (ner.rs:400-415).

Also provides the non-chunked path of ``NERModel::predict``
(ner.rs:253-273): keep tokens whose label != "O" verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass

from rust_bert_ray.decode.consolidate import Token


@dataclass
class Entity:
    """ner.rs:140-149."""

    word: str
    score: float
    label: str
    offset: tuple[int, int]


def _tag_and_label(full_label: str) -> tuple[str, str]:
    parts = full_label.split("-", 1)
    tag = parts[0]
    if tag not in ("B", "I", "O", "E", "S"):
        raise ValueError(f"invalid BIOES tag in label {full_label!r}")
    return tag, parts[1] if len(parts) > 1 else ""


def _build_entity(tokens: list[Token], start: int, end: int, label: str) -> Entity | None:
    span = tokens[start:end]
    if not span or span[0].offset is None or span[-1].offset is None:
        return None
    score = 1.0
    for t in span:
        score *= t.score
    return Entity(
        word=" ".join(t.text for t in span),
        score=score,
        label=label,
        offset=(span[0].offset[0], span[-1].offset[1]),
    )


def consolidate_entities(tokens: list[Token]) -> list[Entity]:
    """Full-entity (chunked) decode — ``predict_full_entities`` semantics."""
    entities: list[Entity] = []
    previous: tuple[int, str, str] | None = None  # (start_pos, tag, label)

    def flush(position: int) -> None:
        nonlocal previous
        if previous is not None:
            start, _, label = previous
            ent = _build_entity(tokens, start, position, label)
            if ent is not None:
                entities.append(ent)
        previous = None

    for position, token in enumerate(tokens):
        tag, label = _tag_and_label(token.label)
        if tag == "O":
            flush(position)
        elif tag in ("B", "S"):
            flush(position)
            previous = (position, tag, label)
        else:  # I or E
            if previous is not None:
                _, prev_tag, prev_label = previous
                if prev_tag in ("E", "S") or prev_label != label:
                    flush(position)
                    previous = (position, tag, label)
            else:
                previous = (position, tag, label)
    flush(len(tokens))
    return entities


def filter_outside_tokens(tokens: list[Token]) -> list[Entity]:
    """Non-chunked path: every non-"O" token is its own entity (ner.rs:253-273)."""
    out = []
    for t in tokens:
        if t.label != "O" and t.offset is not None:
            out.append(Entity(word=t.text, score=t.score, label=t.label, offset=t.offset))
    return out
