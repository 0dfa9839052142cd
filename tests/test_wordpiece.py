"""WordPiece tokenizer: greedy longest-match, char offsets, decode+cleanup,
and drop-in substitution into the NER stage's injectable tokenizer slot."""

import pyarrow as pa
import pytest

from rust_bert_ray.corpus import GAZETTEER, generate
from rust_bert_ray.stages.ner import NerStage
from rust_bert_ray.tokenization import (
    MASK_CONTINUATION,
    MASK_NONE,
    MASK_SPECIAL,
    WordPieceTokenizer,
    clean_up_tokenization,
)

REF_SENTENCES = [
    "My name is Amy. I live in Paris.",
    "Paris is a city in France.",
    "Asked John Smith about Acme Corp",
    "Let's go to New York!",
]


@pytest.fixture(scope="module")
def tk():
    return WordPieceTokenizer()


def test_greedy_longest_match_prefers_whole_words(tk):
    enc = tk.encode("Paris is a city in France.")
    toks = tk.convert_ids_to_tokens(enc.ids)
    assert toks == ["Paris", "is", "a", "city", "in", "France", "."]
    assert all(m == MASK_NONE for m in enc.masks)


def test_continuation_pieces_and_masks(tk):
    enc = tk.encode("zzz")  # not in vocab → char pieces
    toks = tk.convert_ids_to_tokens(enc.ids)
    assert toks == ["z", "##z", "##z"]
    assert enc.masks == [MASK_NONE, MASK_CONTINUATION, MASK_CONTINUATION]
    assert enc.offsets == [(0, 1), (1, 2), (2, 3)]


def test_char_offsets_slice_source(tk):
    for text in REF_SENTENCES:
        enc = tk.encode(text)
        for (b, e), tok in zip(enc.offsets, tk.convert_ids_to_tokens(enc.ids)):
            raw = tok[2:] if tok.startswith("##") else tok
            assert text[b:e] == raw or tok == "[UNK]"


def test_unk_covers_whole_word(tk):
    enc = tk.encode("naïve")  # 'ï' not in the ascii alphabet → dead-end
    toks = tk.convert_ids_to_tokens(enc.ids)
    assert toks == ["[UNK]"]
    assert enc.offsets == [(0, 5)]


def test_special_token_assembly(tk):
    enc = tk.build_with_special_tokens(tk.encode("Paris"))
    assert enc.ids[0] == tk.cls_id and enc.ids[-1] == tk.sep_id
    assert enc.masks[0] == MASK_SPECIAL and enc.masks[-1] == MASK_SPECIAL
    assert enc.offsets[0] is None and enc.offsets[-1] is None
    # standard BERT vocab layout: [CLS]=101, [SEP]=102
    assert (tk.cls_id, tk.sep_id) == (101, 102)


def test_decode_roundtrip_reference_sentences(tk):
    for text in REF_SENTENCES:
        full = tk.build_with_special_tokens(tk.encode(text))
        assert tk.decode(full.ids) == text


def test_decode_keeps_specials_when_asked(tk):
    full = tk.build_with_special_tokens(tk.encode("Paris"))
    assert tk.decode(full.ids, skip_special_tokens=False) == "[CLS] Paris [SEP]"


def test_cleanup_rules():
    assert clean_up_tokenization("do n't stop") == "don't stop"
    assert clean_up_tokenization("it 's here , now .") == "it's here, now."
    assert clean_up_tokenization("they 've , we 're") == "they've, we're"


def test_ner_stage_with_wordpiece_backend_matches_default(tk):
    """The injectable-tokenizer slot: swapping the synthetic splitter for
    real WordPiece must not change the decoded entities (both produce
    word-aligned pieces; the decode algebra is tokenizer-agnostic)."""
    docs, _ = generate(40)
    default_out = NerStage(gazetteer=GAZETTEER)(docs)
    wp_out = NerStage(gazetteer=GAZETTEER, tokenizer=tk)(docs)

    def ents(t: pa.Table):
        return [
            [(e["word"], e["label"], e["begin"], e["end"]) for e in row]
            for row in t.column("entities").to_pylist()
        ]

    assert ents(default_out) == ents(wp_out)
    assert any(ents(default_out))  # non-trivial corpus


def test_qa_stage_with_wordpiece_backend_matches_default(tk):
    """QA answers are tokenizer-agnostic too: char-space span decode over
    word-aligned pieces gives identical answers with real WordPiece."""
    import pyarrow as pa

    from rust_bert_ray.stages.qa import QaStage

    inputs = pa.Table.from_pydict(
        {
            "qa_id": ["a", "b"],
            "question": ["Where does Amy live ?", "Where does John Smith live ?"],
            "context": [
                "My name is Amy. I live in Paris.",
                "My name is John Smith. I live in New York.",
            ],
        }
    )
    default_out = QaStage(gazetteer=GAZETTEER)(inputs).to_pylist()
    wp_out = QaStage(gazetteer=GAZETTEER, tokenizer=tk)(inputs).to_pylist()
    strip = lambda rows: [
        (r["qa_id"], r["answer"], r["start"], r["end"]) for r in rows
    ]
    assert strip(default_out) == strip(wp_out)
    assert {r["answer"] for r in wp_out} == {"Paris", "New York"}


def test_truncate_pair_strategies():
    from rust_bert_ray.tokenization import (
        TRUNCATE_DO_NOT,
        TRUNCATE_LONGEST_FIRST,
        TRUNCATE_ONLY_FIRST,
        TRUNCATE_ONLY_SECOND,
        truncate_pair,
    )

    a, b = [1, 2, 3, 4, 5], [10, 11]
    # longest_first removes from the longer side one at a time
    ta, tb, ov = truncate_pair(a, b, 3, TRUNCATE_LONGEST_FIRST)
    assert (ta, tb) == ([1, 2], [10, 11]) and ov == [5, 4, 3]
    # interleaves once lengths equalize
    ta, tb, ov = truncate_pair([1, 2, 3], [10, 11, 12], 2, TRUNCATE_LONGEST_FIRST)
    assert len(ta) + len(tb) == 4 and ov == [3, 12]
    ta, tb, ov = truncate_pair(a, b, 2, TRUNCATE_ONLY_FIRST)
    assert (ta, tb) == ([1, 2, 3], [10, 11]) and ov == [5, 4]
    ta, tb, ov = truncate_pair(a, b, 1, TRUNCATE_ONLY_SECOND)
    assert (ta, tb) == ([1, 2, 3, 4, 5], [10]) and ov == [11]
    with pytest.raises(ValueError, match="truncation is disabled"):
        truncate_pair(a, b, 1, TRUNCATE_DO_NOT)
    with pytest.raises(ValueError, match="cannot remove"):
        truncate_pair(a, b, 5, TRUNCATE_ONLY_SECOND)
    # no-op path copies, never mutates
    ta, tb, ov = truncate_pair(a, b, 0)
    assert ta == a and ta is not a and ov == []


def test_strip_accents_flag():
    from rust_bert_ray.tokenization import WordPieceTokenizer, strip_accents

    assert strip_accents("café") == "cafe"
    assert strip_accents("naïve") == "naive"
    tk = WordPieceTokenizer(strip_accents=True)
    enc = tk.encode("café time")
    toks = tk.convert_ids_to_tokens(enc.ids)
    # 'café' (composed, 4 chars) strips to 'cafe' (4 chars) → char pieces,
    # never [UNK]; offsets still slice the ORIGINAL text
    assert "[UNK]" not in toks
    assert enc.offsets[0] == (0, 1)
    b, e = enc.offsets[len(toks) - 2 - 1]  # last piece of first word
    assert "café time"[:4] == "café"
