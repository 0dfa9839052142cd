"""Emit a standard HF ``tokenizer.json`` (``model.type == "Unigram"``)
from the bundled unigram piece LM.

The HF `tokenizers` Unigram serialization stores the vocabulary as an
ORDERED list of ``[piece, log_prob]`` pairs plus an ``unk_id`` index
(reference analog: src/pipelines/hf_tokenizers.rs consumes the same
file for the sentencepiece-family tokenizers).  File order defines the
token ids, so this fixture deliberately orders pieces by
``(-logp, piece)`` — different from the native
:class:`UnigramTokenizer`'s sorted-piece id assignment — to exercise
the loader's file-order id mapping rather than letting both sides
coincide by accident.

Usage: python tools/build_hf_unigram_fixture.py
Writes rust_bert_ray/data/tokenizer_unigram.json (deterministic).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_bert_ray.unigram import DATA_DIR, DEFAULT_MODEL_PATH, UNK_PIECE  # noqa: E402

OUT_PATH = os.path.join(DATA_DIR, "tokenizer_unigram.json")


def main() -> None:
    with open(DEFAULT_MODEL_PATH, encoding="utf-8") as f:
        model = json.load(f)
    pieces: dict[str, float] = model["pieces"]
    vocab = [[UNK_PIECE, model["unk_logp"]]]
    vocab.extend(
        [p, lp] for p, lp in sorted(pieces.items(), key=lambda kv: (-kv[1], kv[0]))
    )
    doc = {
        "version": "1.0",
        "normalizer": None,
        "pre_tokenizer": None,
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
