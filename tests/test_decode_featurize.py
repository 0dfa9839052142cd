"""Sliding-window featurize fixtures (FIXTURES.md §3.8, seam ownership)."""

from rust_bert_ray.decode.featurize import generate_features
from rust_bert_ray.tokenization import (
    CLS_ID,
    MASK_SPECIAL,
    SEP_ID,
    SubwordTokenizer,
)

TOK = SubwordTokenizer(piece_len=4)


def test_short_text_single_window():
    enc = TOK.encode("My name is Amy.")
    feats = generate_features(enc, example_index=0, max_length=32)
    assert len(feats) == 1
    f = feats[0]
    assert f.input_ids[0] == CLS_ID and f.input_ids[-1] == SEP_ID
    assert all(f.reference_feature)  # single window owns everything
    assert f.example_index == 0
    # content tokens carry offsets; specials don't
    assert f.offsets[0] is None and f.offsets[-1] is None
    assert all(o is not None for o in f.offsets[1:-1])


def test_empty_text_zero_features():
    enc = TOK.encode("")
    assert generate_features(enc, 0, max_length=32) == []


def test_long_text_windows_overlap_and_exact_ownership():
    # Build a text long enough for >=3 windows at max_length=16:
    # content=14, stride=4.
    words = " ".join(f"w{i}" for i in range(60))
    enc = TOK.encode(words)
    max_length = 16
    feats = generate_features(enc, 7, max_length=max_length)
    assert len(feats) >= 3
    stride = max_length // 4

    # Reconstruct ownership: every source token position must be owned by
    # exactly one (window, position) with reference_feature=True.
    owned: dict[tuple[int, int], int] = {}
    start_token = 0
    for f in feats:
        content_len = len(f.input_ids) - 2  # [CLS], [SEP]
        for pos in range(len(f.input_ids)):
            if f.masks[pos] == MASK_SPECIAL:
                continue
            src = start_token + (pos - 1)  # 1 leading special
            if f.reference_feature[pos]:
                owned[(src, 0)] = owned.get((src, 0), 0) + 1
        start_token = start_token + content_len - stride
    assert all(v == 1 for v in owned.values())
    assert len(owned) == len(enc.ids)


def test_first_window_owns_prefix_last_owns_suffix():
    words = " ".join(f"w{i}" for i in range(40))
    enc = TOK.encode(words)
    feats = generate_features(enc, 0, max_length=16)
    first, last = feats[0], feats[-1]
    # first window: ownership starts at position 0 (no start cutoff)
    assert first.reference_feature[0] is True or first.masks[0] == MASK_SPECIAL
    assert first.reference_feature[1]
    # middle windows disown leading stride/2 content tokens
    if len(feats) > 2:
        mid = feats[1]
        stride_half = (16 // 4) // 2
        for i in range(1, 1 + stride_half):
            assert not mid.reference_feature[i]
    # last window owns its trailing content
    assert last.reference_feature[len(last.input_ids) - 2]
