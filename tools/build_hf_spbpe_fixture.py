"""Train a metaspace-marked character BPE and emit its HF ``tokenizer.json``.

The sentencepiece-BPE tokenizer family (Marian / XLM; reference
common.rs:259-301 dispatch, hf_tokenizers.rs BPE-with-Metaspace match
arm) merges RAW characters of ``▁ + word`` — the metaspace marker
prefixes every whitespace-pretokenized word.  HF `tokenizers`
serializes it as ``model.type == "BPE"`` with NO ``end_of_word_suffix``
plus a ``Metaspace`` pre_tokenizer section.  Training is classic
Sennrich BPE (public algorithm) over the project's own text — no
external vocab files exist in this sandbox, and the reference
tokenizers just *load* such files.

Usage: python tools/build_hf_spbpe_fixture.py [n_merges]
Writes rust_bert_ray/data/tokenizer_spbpe.json (deterministic).
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_bert_ray.bpe import DATA_DIR  # noqa: E402
from tools.build_bpe import corpus_texts  # noqa: E402

OUT_PATH = os.path.join(DATA_DIR, "tokenizer_spbpe.json")
MARKER = "▁"
UNK = "<unk>"


def train(n_merges: int = 500):
    word_freq: Counter[tuple[str, ...]] = Counter()
    for text in corpus_texts():
        for w in text.split():
            word_freq[tuple(MARKER + w)] += 1

    # alphabet first (deterministic sorted order): every observed char
    # including the marker, so only truly novel characters hit UNK
    alphabet: set[str] = set()
    for units in word_freq:
        alphabet.update(units)

    merges: list[tuple[str, str]] = []
    words = dict(word_freq)
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for word, freq in words.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += freq
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for word, freq in words.items():
            out = []
            i = 0
            while i < len(word):
                if (
                    i + 1 < len(word)
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + freq
        words = new_words

    vocab: dict[str, int] = {UNK: 0}
    for unit in sorted(alphabet):
        vocab[unit] = len(vocab)
    for a, b in merges:
        unit = a + b
        if unit not in vocab:
            vocab[unit] = len(vocab)
    return merges, vocab


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    merges, vocab = train(n_merges)
    doc = {
        "version": "1.0",
        "normalizer": None,
        "pre_tokenizer": {
            "type": "Metaspace",
            "replacement": MARKER,
            "prepend_scheme": "always",
            "split": True,
        },
        "model": {
            "type": "BPE",
            "dropout": None,
            "unk_token": UNK,
            "continuing_subword_prefix": None,
            "end_of_word_suffix": None,
            "fuse_unk": False,
            "vocab": vocab,
            "merges": [[a, b] for a, b in merges],
        },
    }
    with open(OUT_PATH, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False, indent=1)
        f.write("\n")
    print(f"wrote {OUT_PATH}: {len(merges)} merges, vocab {len(vocab)}")


if __name__ == "__main__":
    main()
