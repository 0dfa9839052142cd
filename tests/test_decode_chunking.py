"""BIO/BIOES chunker truth table (FIXTURES.md §3.8; ner.rs:366-457)."""

import pytest

from rust_bert_ray.decode.chunking import consolidate_entities, filter_outside_tokens
from rust_bert_ray.decode.consolidate import Token
from rust_bert_ray.tokenization import MASK_NONE


def tok(text, label, score=0.9, offset=(0, 1)):
    return Token(
        text=text,
        score=score,
        label=label,
        label_index=0,
        sentence=0,
        index=0,
        word_index=0,
        offset=offset,
        mask=MASK_NONE,
    )


def labels_to_tokens(pairs):
    toks = []
    pos = 0
    for text, label in pairs:
        toks.append(tok(text, label, offset=(pos, pos + len(text))))
        pos += len(text) + 1
    return toks


def words(entities):
    return [(e.word, e.label) for e in entities]


def test_simple_b_i_o():
    ents = consolidate_entities(
        labels_to_tokens(
            [("John", "B-PER"), ("Smith", "I-PER"), ("said", "O"), ("hi", "O")]
        )
    )
    assert words(ents) == [("John Smith", "PER")]
    assert ents[0].offset == (0, 10)


def test_score_is_product():
    toks = labels_to_tokens([("John", "B-PER"), ("Smith", "I-PER")])
    toks[0].score, toks[1].score = 0.9, 0.8
    ents = consolidate_entities(toks)
    assert ents[0].score == pytest.approx(0.72)


def test_i_after_o_starts_entity():
    # dangling I without B still opens an entity (ner.rs:393-396 else branch)
    ents = consolidate_entities(
        labels_to_tokens([("in", "O"), ("Paris", "I-LOC"), ("now", "O")])
    )
    assert words(ents) == [("Paris", "LOC")]


def test_label_change_mid_entity_splits():
    ents = consolidate_entities(
        labels_to_tokens([("Acme", "B-ORG"), ("Paris", "I-LOC")])
    )
    assert words(ents) == [("Acme", "ORG"), ("Paris", "LOC")]


def test_b_after_i_splits():
    ents = consolidate_entities(
        labels_to_tokens([("New", "B-LOC"), ("York", "I-LOC"), ("Paris", "B-LOC")])
    )
    assert words(ents) == [("New York", "LOC"), ("Paris", "LOC")]


def test_single_and_end_tags():
    ents = consolidate_entities(
        labels_to_tokens(
            [("Amy", "S-PER"), ("at", "O"), ("Acme", "B-ORG"), ("Corp", "E-ORG")]
        )
    )
    assert words(ents) == [("Amy", "PER"), ("Acme Corp", "ORG")]


def test_i_after_e_within_b_started_entity_continues():
    # previous_node keeps the entity's STARTING tag (start_new only fires on
    # B/S or after a split, ner.rs:375-396), so B,E,I is ONE entity.
    ents = consolidate_entities(
        labels_to_tokens([("Acme", "B-ORG"), ("Corp", "E-ORG"), ("Labs", "I-ORG")])
    )
    assert words(ents) == [("Acme Corp Labs", "ORG")]


def test_i_after_s_started_entity_splits():
    ents = consolidate_entities(
        labels_to_tokens([("Amy", "S-PER"), ("Smith", "I-PER")])
    )
    assert words(ents) == [("Amy", "PER"), ("Smith", "PER")]


def test_i_after_dangling_e_started_entity_splits():
    # dangling E opens an entity with starting tag E; a following I splits.
    ents = consolidate_entities(
        labels_to_tokens([("Corp", "E-ORG"), ("Labs", "I-ORG")])
    )
    assert words(ents) == [("Corp", "ORG"), ("Labs", "ORG")]


def test_trailing_open_entity_flushed():
    ents = consolidate_entities(
        labels_to_tokens([("go", "O"), ("to", "O"), ("New", "B-LOC"), ("York", "I-LOC")])
    )
    assert words(ents) == [("New York", "LOC")]


def test_invalid_tag_raises():
    with pytest.raises(ValueError):
        consolidate_entities(labels_to_tokens([("x", "X-FOO")]))


def test_filter_outside_tokens_keeps_non_o():
    toks = labels_to_tokens([("Amy", "I-PER"), (".", "O"), ("Paris", "I-LOC")])
    ents = filter_outside_tokens(toks)
    assert words(ents) == [("Amy", "I-PER"), ("Paris", "I-LOC")]
