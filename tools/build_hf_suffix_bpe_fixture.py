"""Train a suffix-marked character BPE and emit its HF ``tokenizer.json``.

The OpenAI-GPT / CTRL tokenizer family (reference common.rs:259-301)
merges RAW characters with an ``</w>`` end-of-word marker over a
lowercased corpus; HF `tokenizers` serializes it as ``model.type ==
"BPE"`` with ``end_of_word_suffix`` set plus a ``Lowercase``
normalizer.  Training is classic Sennrich BPE (public algorithm) over
the project's own text — no external vocab files exist in this
sandbox, and the reference tokenizers just *load* such files.

Usage: python tools/build_hf_suffix_bpe_fixture.py [n_merges]
Writes rust_bert_ray/data/tokenizer_suffix_bpe.json (deterministic).
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_bert_ray.bpe import DATA_DIR  # noqa: E402
from tools.build_bpe import corpus_texts  # noqa: E402

OUT_PATH = os.path.join(DATA_DIR, "tokenizer_suffix_bpe.json")
SUFFIX = "</w>"
UNK = "<unk>"
_WORD_RE = re.compile(r"(?u)\w+|[^\w\s]")


def lower_preserving(word: str) -> str:
    lowered = word.lower()
    return lowered if len(lowered) == len(word) else word


def train(n_merges: int = 500):
    word_freq: Counter[tuple[str, ...]] = Counter()
    for text in corpus_texts():
        for w in _WORD_RE.findall(text):
            w = lower_preserving(w)
            units = list(w)
            units[-1] = units[-1] + SUFFIX
            word_freq[tuple(units)] += 1

    # alphabet first (deterministic sorted order): every observed bare
    # char and every observed suffixed char, so encode never dead-ends
    # on corpus text
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

    vocab: dict[str, int] = {}
    for unit in sorted(alphabet):
        vocab[unit] = len(vocab)
    for a, b in merges:
        unit = a + b
        if unit not in vocab:
            vocab[unit] = len(vocab)
    vocab[UNK] = len(vocab)
    return merges, vocab


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    merges, vocab = train(n_merges)
    doc = {
        "version": "1.0",
        "normalizer": {"type": "Lowercase"},
        "pre_tokenizer": None,
        "model": {
            "type": "BPE",
            "dropout": None,
            "unk_token": UNK,
            "continuing_subword_prefix": None,
            "end_of_word_suffix": SUFFIX,
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
