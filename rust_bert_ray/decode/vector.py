"""Batch-flat vectorized NER decode building blocks.

The per-text decode in ``stages/ner.py`` (tokenize → window → logits →
softmax/argmax → consolidate → chunk) is semantically fixed by
/root/reference/src/pipelines/token_classification.rs:957-1235 and
ner.rs:324-457, but a Python loop per token position caps throughput at
~1k docs/s/actor.  This module re-expresses the same algebra as flat
numpy arrays spanning *every text in a batch at once*:

- ``BatchWordSplitter`` — one regex pass over the whole batch (texts
  joined with ``\\n``) for word surfaces, plus a vectorized
  codepoint-class scan for word begins; the two are cross-checked
  (count + length equality) and any disagreement falls back to the
  caller's per-text path, so exactness never rests on the numpy scan.
- ``bio_runs`` — the BIO subset of the reference chunker
  (ner.rs:376-457) as a vectorized run-finder over word-level label
  ids.  Only B-/I-/O tags appear in ``scorers.NER_LABELS``; label sets
  containing E/S tags must use ``decode.chunking.consolidate_entities``
  (the stage gates on this).

Scale note: everything here is O(batch) numpy with no per-row Python in
the hot path; per-entity Python objects are built only for the spans
that survive chunking (a ~15× smaller set than token positions).
"""

from __future__ import annotations

import re

import numpy as np

_WORD_RE = re.compile(r"(?u)\w+|[^\w\s]")
_ONE_WORD_RE = re.compile(r"(?u)\w\Z")
_ONE_SPACE_RE = re.compile(r"(?u)\s\Z")


class BatchWordSplitter:
    """Vectorized ``\\w+|[^\\w\\s]`` splitter over a list of texts.

    Returns, for the concatenated batch: word surfaces (exactly the
    regex ``findall`` output), per-word character begin offsets *within
    their own text*, and per-word text index.  Codepoint classes are
    derived from the regex itself (one probe per distinct codepoint,
    cached), so the numpy scan agrees with ``findall`` by construction;
    a count/length cross-check still guards the merge and returns
    ``None`` on any disagreement.
    """

    def __init__(self) -> None:
        self._is_word = np.zeros(128, dtype=bool)
        self._is_space = np.zeros(128, dtype=bool)
        for c in range(128):
            ch = chr(c)
            self._is_word[c] = bool(_ONE_WORD_RE.match(ch))
            self._is_space[c] = bool(_ONE_SPACE_RE.match(ch))
        # lazily-extended classes for codepoints >= 128
        self._ext_word: dict[int, bool] = {}
        self._ext_space: dict[int, bool] = {}

    def _classify(self, codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        is_word = np.zeros(len(codes), dtype=bool)
        is_space = np.zeros(len(codes), dtype=bool)
        small = codes < 128
        sc = codes[small]
        is_word[small] = self._is_word[sc]
        is_space[small] = self._is_space[sc]
        if not small.all():
            big_idx = np.flatnonzero(~small)
            uniq = np.unique(codes[big_idx])
            for c in uniq.tolist():
                if c not in self._ext_word:
                    ch = chr(c)
                    self._ext_word[c] = bool(_ONE_WORD_RE.match(ch))
                    self._ext_space[c] = bool(_ONE_SPACE_RE.match(ch))
            bw = np.array([self._ext_word[c] for c in codes[big_idx].tolist()])
            bs = np.array([self._ext_space[c] for c in codes[big_idx].tolist()])
            is_word[big_idx] = bw
            is_space[big_idx] = bs
        return is_word, is_space

    def split(
        self, texts: list[str]
    ) -> tuple[list[str], np.ndarray, np.ndarray] | None:
        """→ (words, begins_within_text, text_id) or None on mismatch."""
        if not texts:
            return [], np.zeros(0, np.int64), np.zeros(0, np.int64)
        mega = "\n".join(texts)
        words = _WORD_RE.findall(mega)
        if not mega:
            return [], np.zeros(0, np.int64), np.zeros(0, np.int64)
        codes = np.frombuffer(mega.encode("utf-32-le"), dtype=np.uint32)
        is_word, is_space = self._classify(codes)
        prev = np.empty(len(is_word), dtype=bool)
        prev[0] = False
        prev[1:] = is_word[:-1]
        w_start = np.flatnonzero(is_word & ~prev)
        nxt = np.empty(len(is_word), dtype=bool)
        nxt[-1] = False
        nxt[:-1] = is_word[1:]
        w_end = np.flatnonzero(is_word & ~nxt) + 1
        punct = np.flatnonzero(~is_word & ~is_space)
        pos = np.concatenate([w_start, punct])
        end = np.concatenate([w_end, punct + 1])
        order = np.argsort(pos, kind="stable")
        pos = pos[order]
        end = end[order]
        if len(pos) != len(words):
            return None
        lens = np.fromiter(map(len, words), dtype=np.int64, count=len(words))
        if len(words) and not np.array_equal(end - pos, lens):
            return None
        # text boundaries in the megastring
        tlens = np.fromiter(map(len, texts), dtype=np.int64, count=len(texts))
        starts = np.empty(len(texts), dtype=np.int64)
        starts[0] = 0
        np.cumsum(tlens[:-1] + 1, out=starts[1:])
        tid = np.searchsorted(starts, pos, side="right") - 1
        begins = pos - starts[tid]
        return words, begins, tid


# BIO label-id algebra for scorers.NER_LABELS layout:
#   0 = O, odd ids = B-<type>, even ids > 0 = I-<type>,
#   entity type = (id + 1) // 2.
def bio_runs(
    label_ids: np.ndarray, first_of_text: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Find entity runs over word-level BIO label ids.

    Mirrors ``consolidate_entities`` (ner.rs:376-457) restricted to
    B/I/O tags: O flushes; B flushes then starts; I continues an open
    run of the same type, else starts one.  ``first_of_text`` marks
    word positions that begin a new text (runs never cross texts).

    Returns ``(nz, run_start, run_end)`` where ``nz`` indexes the
    non-O words in order and ``run_start``/``run_end`` are inclusive
    index ranges *into nz* for each entity.
    """
    lid = label_ids
    non_o = lid > 0
    typ = (lid + 1) // 2
    is_b = (lid & 1) == 1
    n = len(lid)
    prev_non_o = np.empty(n, dtype=bool)
    prev_typ = np.empty(n, dtype=typ.dtype)
    if n:
        prev_non_o[0] = False
        prev_non_o[1:] = non_o[:-1]
        prev_non_o[first_of_text] = False
        prev_typ[0] = 0
        prev_typ[1:] = typ[:-1]
    start = non_o & (is_b | ~prev_non_o | (prev_typ != typ))
    run_id = np.cumsum(start)
    nz = np.flatnonzero(non_o)
    eid = run_id[nz]
    if len(nz) == 0:
        empty = np.zeros(0, np.int64)
        return nz, empty, empty
    bnd = np.flatnonzero(np.diff(eid)) + 1
    run_start = np.concatenate(([0], bnd))
    run_end = np.concatenate((bnd, [len(nz)])) - 1
    return nz, run_start, run_end
