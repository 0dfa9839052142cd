"""Distributed BPE vocabulary TRAINING over the documents table.

The reference ships only pretrained vocabs (inference-side BPE/WordPiece
/unigram — tokenization.py, bpe.py, unigram.py reimplement those); a
100-TB curation engine also needs to INDUCE a vocabulary from its own
corpus.  This operator uses the industry-standard two-phase shape (HF
``tokenizers``' BPE trainer, Sennrich et al. 2016):

1. **Distributed word count** — the only corpus-sized pass: per-batch
   Arrow ``value_counts`` combiner → grouped sum.  The exchange carries
   (word, partial_count) rows, vocab-sized per batch, never
   corpus-sized.
2. **Merge induction over the compressed (word, count) table** —
   driver-side BY DESIGN, exactly like every production BPE trainer:
   after word-counting, the problem size is the distinct-word count
   (bounded further by ``min_count``/``max_words``), independent of
   corpus bytes.  At 10^12 documents the word table still fits one
   machine (Heaps' law; cap enforced deterministically by
   (count desc, word asc) top-``max_words``).

Merge loop semantics (deterministic, integer-exact):

- a word is a symbol sequence, initially its characters with ``</w>``
  appended to the last symbol (Sennrich's end-of-word marker);
- each round counts adjacent symbol pairs weighted by word count and
  merges the pair with the highest count, ties broken by the
  lexicographically smallest (left, right);
- emits (rank, left, right, pair_count) per merge; stops early when no
  pair repeats (pair_count < 2 would only memorize single words).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _read_documents(sf_dir: str, columns):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def distributed_word_counts(sf_dir: str, num_partitions: int = 8):
    """(word, n) Dataset via combiner partials + grouped sum — the
    corpus-sized phase (same plan family as q_vocab_stats)."""
    from ray.data.aggregate import Sum

    docs = _read_documents(sf_dir, ["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        vc = toks.flatten().value_counts()
        return pa.Table.from_pydict(
            {
                "word": vc.field("values"),
                "p_n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial_counts, batch_format="pyarrow", batch_size=65536)
        .groupby("word", num_partitions=num_partitions)
        .aggregate(Sum("p_n", alias_name="n"))
    )


def merge_loop(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Sequential BPE merge induction over (word, count) rows.

    Pure-integer algebra; the oracle re-derives it independently — any
    divergence in pair counting, tie-breaks, or merge application flips
    the value hash."""
    words: list[list[str]] = []
    counts: list[int] = []
    for w, n in word_counts:
        if not w:
            continue
        syms = list(w)
        syms[-1] = syms[-1] + "</w>"
        words.append(syms)
        counts.append(int(n))

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pair_n: dict[tuple[str, str], int] = {}
        for syms, n in zip(words, counts):
            for a, b in zip(syms, syms[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + n
        if not pair_n:
            break
        (left, right), best = min(
            pair_n.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best < 2:
            break
        merges.append((rank, left, right, best))
        joined = left + right
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i : i + 2] = [joined]
                else:
                    i += 1
    return merges


def bpe_train(
    sf_dir: str,
    n_merges: int = 40,
    min_count: int = 2,
    max_words: int = 100_000,
):
    """→ Arrow table (rank, left, right, pair_count) of learned merges."""
    wc = distributed_word_counts(sf_dir).to_pandas()
    wc = wc[wc["n"] >= min_count].sort_values(
        ["n", "word"], ascending=[False, True]
    ).head(max_words)
    merges = merge_loop(list(zip(wc["word"], wc["n"])), n_merges)
    return pa.Table.from_pydict(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


class BpeApplyStage:
    """Map-only BPE inference with the TRAINED merge table: per word,
    repeatedly merge the lowest-rank applicable adjacent pair (leftmost
    among equal ranks — standard BPE apply order).  The merge-rank dict
    is broadcast once (``ray.put``) and read zero-copy per task;
    trivial init → pass an instance (task pool).  Per-task word memo:
    apply is a pure word function, so Zipfian reuse only saves wall
    time."""

    def __init__(self, ranks_ref):
        self._ranks_ref = ranks_ref
        self._ranks: dict | None = None
        self._memo: dict[str, list[str]] = {}

    def _word_tokens(self, w: str) -> list[str]:
        res = self._memo.get(w)
        if res is not None:
            return res
        syms = list(w)
        syms[-1] = syms[-1] + "</w>"
        ranks = self._ranks
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        if len(self._memo) < 200_000:
            self._memo[w] = syms
        return syms

    def __call__(self, t: pa.Table) -> pa.Table:
        import zlib

        if self._ranks is None:
            ranks = self._ranks_ref
            self._ranks = (
                ray.get(ranks) if isinstance(ranks, ray.ObjectRef) else ranks
            )
        n_out, crcs = [], []
        for text in t.column("text").to_pylist():
            toks: list[str] = []
            for w in text.split(" "):
                if w:
                    toks.extend(self._word_tokens(w))
            n_out.append(len(toks))
            crcs.append(zlib.crc32(" ".join(toks).encode()))
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "n_bpe_tokens": pa.array(n_out, pa.int64()),
                "token_crc": pa.array(crcs, pa.int64()),
            }
        )


def bpe_tokenize(sf_dir: str, n_merges: int = 40):
    """Train → apply composition: learn merges from the corpus
    (``bpe_train``), broadcast the rank table, and tokenize every
    document map-only.  Output (doc_id, n_bpe_tokens, token_crc) — the
    crc32 of the joined token stream stands in for the token list (the
    driver's value hash cannot sort list columns)."""
    merges = bpe_train(sf_dir, n_merges=n_merges)
    ranks = {
        (l, r): k
        for k, l, r in zip(
            merges.column("rank").to_pylist(),
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist(),
        )
    }
    ranks_ref = ray.put(ranks)
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        BpeApplyStage(ranks_ref), batch_format="pyarrow", batch_size=None
    )
