"""Train the bundled unigram-LM piece vocabulary deterministically.

Simplified Kudo (2018) unigram training (public algorithm) over the
project corpus: seed with frequent substrings, then iterate {Viterbi
re-segmentation → piece count re-estimation → prune the lowest-
probability pieces} down to the target size.  Single-char pieces are
never pruned (encode stays total).

Usage: python tools/build_unigram.py [target_vocab]
Writes rust_bert_ray/data/unigram_model.json.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_bert_ray.unigram import DEFAULT_MODEL_PATH  # noqa: E402

_WORD_RE = re.compile(r"(?u)\w+|[^\w\s]")


def corpus_words() -> Counter:
    import pyarrow.parquet as pq

    from rust_bert_ray.corpus import generate

    freq: Counter = Counter()
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    texts = docs.column("text").to_pylist()
    corpus_docs, _ = generate(500, diversify=False)
    for spans in corpus_docs.column("spans").to_pylist():
        for span in spans:
            if span["kind"] == "text" and span["text"]:
                texts.append(span["text"])
    for text in texts:
        for w in _WORD_RE.findall(text):
            freq[w] += 1
    return freq


def viterbi(word: str, logp: dict[str, float], max_len: int, unk: float) -> list[str]:
    n = len(word)
    NEG = -math.inf
    best: list[tuple[float, int, int, str | None]] = [(NEG, 0, -1, None)] * (n + 1)
    best[0] = (0.0, 0, -1, None)
    for i in range(1, n + 1):
        cand = None
        cand_key = None
        for j in range(max(0, i - max_len), i):
            if best[j][0] == NEG:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = unk
                else:
                    continue
            key = (best[j][0] + lp, -(best[j][1] + 1), -j)
            if cand_key is None or key > cand_key:
                cand_key = key
                cand = (key[0], best[j][1] + 1, j, piece)
        best[i] = cand if cand is not None else (NEG, 0, -1, None)
    out = []
    i = n
    while i > 0:
        _, _, j, piece = best[i]
        out.append(piece)
        i = j
    out.reverse()
    return out


def train(
    target_vocab: int = 1200, max_piece_len: int = 8, freq: Counter | None = None
) -> dict:
    if freq is None:
        freq = corpus_words()
    # seed: all substrings ≤ max_piece_len weighted by word freq
    seed: Counter = Counter()
    for word, f in freq.items():
        n = len(word)
        for a in range(n):
            for b in range(a + 1, min(n, a + max_piece_len) + 1):
                seed[word[a:b]] += f
    chars = {p for p in seed if len(p) == 1}
    # keep the most frequent seeds (cap ~8× target), all chars always
    keep = {p for p, _ in seed.most_common(target_vocab * 8)} | chars
    counts = {p: seed[p] for p in keep}

    def to_logp(c: dict[str, int]) -> dict[str, float]:
        total = sum(c.values())
        return {p: math.log(v / total) for p, v in c.items() if v > 0}

    logp = to_logp(counts)
    unk = min(logp.values()) - 10.0
    for _round in range(6):
        seg_counts: Counter = Counter()
        for word, f in freq.items():
            for piece in viterbi(word, logp, max_piece_len, unk):
                seg_counts[piece] += f
        # plus-one smoothing keeps currently-unused pieces alive so the
        # vocabulary shrinks gradually (greedy Viterbi concentrates all
        # mass on one segmentation; without smoothing everything not in
        # it would die in one round — the EM expected-count analog)
        smoothed = {p: seg_counts.get(p, 0) + 1 for p in logp}
        # prune: drop the lowest-count multi-char pieces, 20% per round,
        # but never below target
        multi = sorted(
            (p for p in smoothed if len(p) > 1),
            key=lambda p: (smoothed[p], p),
        )
        n_keep_multi = max(target_vocab - len(chars), int(len(multi) * 0.8))
        pruned = set(multi[: max(0, len(multi) - n_keep_multi)])
        kept = {p: c for p, c in smoothed.items() if p not in pruned}
        for ch in chars:  # chars always survive with ≥1 count
            kept.setdefault(ch, 1)
        logp = to_logp(kept)
        unk = min(logp.values()) - 10.0
        if len(logp) <= target_vocab:
            break
    return {"pieces": logp, "unk_logp": unk}


def main() -> None:
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    model = train(target)
    with open(DEFAULT_MODEL_PATH, "w", encoding="utf-8") as f:
        json.dump(model, f, ensure_ascii=False, sort_keys=True)
    print(f"wrote {len(model['pieces'])} pieces, unk_logp={model['unk_logp']:.3f}")


if __name__ == "__main__":
    main()
