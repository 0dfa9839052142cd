"""Train a Metaspace (▁-prefixed, sentencepiece-convention) unigram LM
and emit its HF ``tokenizer.json``.

Real sentencepiece exports (T5 / Albert / XLNet tokenizer.json files)
carry a ``Metaspace`` pre_tokenizer and pieces that START with the
U+2581 word-boundary marker — a different piece space from the
word-regex unigram fixture.  Training reuses the public Kudo (2018)
loop from tools/build_unigram.py over whitespace tokens prefixed with
the marker.  Vocab file order is (-logp, piece) with unk first, same
convention as the other Unigram fixture.

Usage: python tools/build_hf_metaspace_fixture.py [target_vocab]
Writes rust_bert_ray/data/tokenizer_metaspace.json (deterministic).
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_bert_ray.unigram import DATA_DIR, UNK_PIECE  # noqa: E402
from tools.build_bpe import corpus_texts  # noqa: E402
from tools.build_unigram import train  # noqa: E402

OUT_PATH = os.path.join(DATA_DIR, "tokenizer_metaspace.json")
MARKER = "▁"  # ▁


def metaspace_tokens() -> Counter:
    freq: Counter = Counter()
    for text in corpus_texts():
        for tok in text.split():
            freq[MARKER + tok] += 1
    return freq


def main() -> None:
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    model = train(target, freq=metaspace_tokens())
    pieces: dict[str, float] = model["pieces"]
    vocab = [[UNK_PIECE, model["unk_logp"]]]
    vocab.extend(
        [p, lp] for p, lp in sorted(pieces.items(), key=lambda kv: (-kv[1], kv[0]))
    )
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
            "type": "Unigram",
            "unk_id": 0,
            "vocab": vocab,
            "byte_fallback": False,
        },
    }
    with open(OUT_PATH, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False, indent=1)
        f.write("\n")
    print(f"wrote {OUT_PATH}: {len(vocab)} vocab entries (unk_id=0)")


if __name__ == "__main__":
    main()
