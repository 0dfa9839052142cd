"""Train the bundled byte-level BPE merges/vocab deterministically.

Classic Sennrich BPE (public algorithm) over the project's own text:
the sf0.001 documents table plus the interleaved-corpus templates — no
external vocab/merges files exist in this sandbox, and the reference's
Gpt2Tokenizer just *loads* merges.txt/vocab.json, so training our own
keeps the runtime format identical while staying self-contained.

Usage: python tools/build_bpe.py [n_merges]
Writes rust_bert_ray/data/bpe_merges.txt and bpe_vocab.json.
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_bert_ray.bpe import (  # noqa: E402
    DEFAULT_MERGES_PATH,
    DEFAULT_VOCAB_PATH,
    EOT_TOKEN,
    bytes_to_unicode,
    pretokenize,
)


def corpus_texts() -> list[str]:
    import pyarrow.parquet as pq

    texts: list[str] = []
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    texts.extend(docs.column("text").to_pylist())
    from rust_bert_ray.corpus import generate

    corpus_docs, _ = generate(500, diversify=False)
    for spans in corpus_docs.column("spans").to_pylist():
        for span in spans:
            if span["kind"] == "text" and span["text"]:
                texts.append(span["text"])
    return texts


def train(n_merges: int = 600) -> tuple[list[tuple[str, str]], dict[str, int]]:
    b2u = bytes_to_unicode()
    word_freq: Counter[tuple[str, ...]] = Counter()
    for text in corpus_texts():
        for _, token in pretokenize(text):
            word_freq[tuple(b2u[b] for b in token.encode("utf-8"))] += 1

    merges: list[tuple[str, str]] = []
    words = dict(word_freq)
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for word, freq in words.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += freq
        if not pairs:
            break
        # deterministic: max count, ties broken lexicographically
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words = {}
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
    for b in range(256):
        vocab[b2u[b]] = len(vocab)
    for a, b in merges:
        unit = a + b
        if unit not in vocab:
            vocab[unit] = len(vocab)
    vocab[EOT_TOKEN] = len(vocab)
    return merges, vocab


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    merges, vocab = train(n_merges)
    with open(DEFAULT_MERGES_PATH, "w", encoding="utf-8") as f:
        f.write("# trained by tools/build_bpe.py (deterministic)\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    with open(DEFAULT_VOCAB_PATH, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False, indent=0)
    print(f"wrote {len(merges)} merges, vocab size {len(vocab)}")


if __name__ == "__main__":
    main()
