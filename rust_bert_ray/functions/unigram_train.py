"""Unigram (SentencePiece-style) tokenizer TRAINING + Viterbi apply.

The second member of the tokenizer-training family (BPE merges →
functions/bpe_train.py): induce a unigram vocabulary from corpus
substring statistics, then tokenize by maximum-score segmentation —
the inference rule the reference's unigram tokenizer applies with a
PRETRAINED vocab (rust_bert_ray/unigram.py reimplements that side).

Simplifications vs full SentencePiece EM, chosen for exactness: the
vocabulary is selected by raw substring frequency (top-V weighted
occurrence counts over the compressed word table) rather than EM
likelihood pruning, and token scores are fixed-point log-frequencies.
Both choices keep every number integer-exact, so the distributed
run and the single-process oracle agree bit-for-bit.

Phase shape (identical scaling story to the BPE trainer):

1. **Distributed word count** — the only corpus-sized pass (shared
   ``distributed_word_counts``; exchange is vocab-sized per batch).
2. **Driver-side induction over the (word, count) table**: every
   substring of length 1..``max_piece`` of every kept word scores
   Σ (occurrences-in-word × word count); top-``vocab_size`` by
   (count desc, piece asc), with ALL single characters force-included
   (coverage guarantee — any word segments).
3. **Apply** (map-only, broadcast vocab): per word, Viterbi max-sum
   segmentation over fixed-point log-frequency weights; ties prefer
   FEWER tokens, then the lexicographically smallest token sequence —
   a total order, so the segmentation is unique.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from rust_bert_ray.functions.bpe_train import (
    _read_documents,
    distributed_word_counts,
)

UNI_SCALE = 1_000_000  # micro-units for log-frequency weights
UNI_MAX_PIECE = 4
UNI_VOCAB = 200


def piece_counts(
    word_counts: list[tuple[str, int]], max_piece: int = UNI_MAX_PIECE
) -> dict[str, int]:
    """Weighted occurrence counts of every substring (length ≤
    max_piece) across the word table — each occurrence position counts,
    matching how often the piece could appear in a segmentation."""
    counts: dict[str, int] = {}
    for w, n in word_counts:
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece, L) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + n
    return counts


def select_vocab(
    counts: dict[str, int], vocab_size: int = UNI_VOCAB
) -> dict[str, int]:
    """Top-``vocab_size`` pieces by (count desc, piece asc), with every
    single character force-included first (full coverage)."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    vocab = dict(chars)
    for p, c in multi:
        if len(vocab) >= max(vocab_size, len(chars)):
            break
        vocab[p] = c
    return vocab


def piece_weights(vocab: dict[str, int]) -> dict[str, int]:
    """Fixed-point log-frequency weight per piece:
    rint(SCALE · log(count / total)).  The ONLY float step — computed
    once from exact integer counts identically on both sides; the
    Viterbi DP below is pure integer."""
    total = sum(vocab.values())
    return {
        p: int(np.rint(UNI_SCALE * np.log(c / total)).astype(np.int64))
        for p, c in vocab.items()
    }


def viterbi_tokens(
    word: str, weights: dict[str, int], max_piece: int = UNI_MAX_PIECE
) -> list[str]:
    """Max-total-weight segmentation.  Tie order (a total order the
    forward DP decomposes over — cut tuples share their last element at
    every DP state, so the first differing element always lies in the
    decided prefix): ties → fewer tokens → lexicographically LARGEST
    tuple of piece-end positions (= leftmost-longest pieces).  Note a
    plain "lexicographically smallest token sequence" tie-break would
    NOT be DP-decomposable (a shorter prefix token can lose to a longer
    one only after unseen suffixes are compared)."""
    L = len(word)
    best: list[tuple | None] = [None] * (L + 1)
    best[0] = (0, 0, ())
    for i in range(L):
        if best[i] is None:
            continue
        s0, n0, cuts0 = best[i]
        for j in range(i + 1, min(i + max_piece, L) + 1):
            w = weights.get(word[i:j])
            if w is None:
                continue
            cand = (s0 + w, n0 - 1, cuts0 + (j,))
            cur = best[j]
            if cur is None or cand > cur:
                best[j] = cand
    end = best[L]
    if end is None:  # unreachable with full char coverage, kept for safety
        return list(word)
    toks, prev = [], 0
    for j in end[2]:
        toks.append(word[prev:j])
        prev = j
    return toks


def unigram_train(
    sf_dir: str,
    vocab_size: int = UNI_VOCAB,
    min_count: int = 2,
    max_words: int = 100_000,
):
    """→ Arrow table (piece, count, weight) of the learned vocabulary."""
    wc = distributed_word_counts(sf_dir).to_pandas()
    wc = wc[wc["n"] >= min_count].sort_values(
        ["n", "word"], ascending=[False, True]
    ).head(max_words)
    vocab = select_vocab(
        piece_counts([(w, int(n)) for w, n in zip(wc["word"], wc["n"]) if w]),
        vocab_size,
    )
    weights = piece_weights(vocab)
    pieces = sorted(vocab)
    return pa.Table.from_pydict(
        {
            "piece": pa.array(pieces, pa.string()),
            "count": pa.array([vocab[p] for p in pieces], pa.int64()),
            "weight": pa.array([weights[p] for p in pieces], pa.int64()),
        }
    )


class UnigramApplyStage:
    """Map-only Viterbi tokenization with the trained vocab (broadcast
    weight table; trivial init → task pool; per-task Zipf word memo)."""

    def __init__(self, weights_ref):
        self._weights_ref = weights_ref
        self._weights: dict | None = None
        self._memo: dict[str, list[str]] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        import zlib

        if self._weights is None:
            w = self._weights_ref
            self._weights = ray.get(w) if isinstance(w, ray.ObjectRef) else w
        n_out, crcs = [], []
        for text in t.column("text").to_pylist():
            toks: list[str] = []
            for word in text.split(" "):
                if not word:
                    continue
                got = self._memo.get(word)
                if got is None:
                    got = viterbi_tokens(word, self._weights)
                    if len(self._memo) < 200_000:
                        self._memo[word] = got
                toks.extend(got)
            n_out.append(len(toks))
            crcs.append(zlib.crc32(" ".join(toks).encode()))
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "n_uni_tokens": pa.array(n_out, pa.int64()),
                "token_crc": pa.array(crcs, pa.int64()),
            }
        )


def unigram_tokenize(sf_dir: str, vocab_size: int = UNI_VOCAB):
    """Train → apply composition for the unigram family; output
    (doc_id, n_uni_tokens, token_crc)."""
    v = unigram_train(sf_dir, vocab_size=vocab_size)
    weights = dict(
        zip(v.column("piece").to_pylist(), v.column("weight").to_pylist())
    )
    weights_ref = ray.put(weights)
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        UnigramApplyStage(weights_ref), batch_format="pyarrow", batch_size=None
    )
