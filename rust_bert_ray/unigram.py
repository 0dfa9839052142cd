"""Unigram-LM (SentencePiece-style) subword tokenizer.

Third of the reference's three subword algorithm families
(/root/reference/src/pipelines/common.rs:1332-1396 dispatches WordPiece,
byte-level-BPE and SentencePiece-unigram tokenizers via rust_tokenizers;
Albert/XLNet/T5/Marian families are unigram models).  This module
implements the *algorithm* from the public Kudo (2018) formulation:

- vocabulary = pieces with log-probabilities, trained by iterative
  Viterbi re-estimation + pruning over the project corpus
  (``tools/build_unigram.py`` — deterministic, no external files);
- encode = Viterbi best segmentation per word (max Σ log p, ties broken
  toward FEWER pieces then lexicographically earlier split — fully
  deterministic);
- unknown characters fall back to a per-char UNK piece so encode is
  total.

Interface contract matches the repo's other tokenizers (ids, char
offsets, masks, word_indices): words come from the shared
``\\w+|[^\\w\\s]`` regex, pieces segment *within* a word, first piece
``MASK_NONE``, continuations ``MASK_CONTINUATION``.
"""

from __future__ import annotations

import json
import math
import os

from rust_bert_ray.tokenization import (
    MASK_CONTINUATION,
    MASK_NONE,
    EncodedText,
    _WORD_RE,
)

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
DEFAULT_MODEL_PATH = os.path.join(DATA_DIR, "unigram_model.json")

UNK_PIECE = "<unk>"


class UnigramTokenizer:
    """Viterbi segmentation over a trained unigram piece LM."""

    def __init__(self, model_path: str = DEFAULT_MODEL_PATH, cache_cap: int = 500_000):
        with open(model_path, encoding="utf-8") as f:
            model = json.load(f)
        # model: {"pieces": {piece: logp}, "unk_logp": float}
        self.metaspace: str | None = None
        self.logp: dict[str, float] = model["pieces"]
        self.unk_logp: float = model["unk_logp"]
        self.vocab: dict[str, int] = {
            p: i for i, p in enumerate(sorted(self.logp))
        }
        self.vocab[UNK_PIECE] = len(self.vocab)
        self.inv_vocab = {i: p for p, i in self.vocab.items()}
        self.unk_id = self.vocab[UNK_PIECE]
        self.max_piece_len = max((len(p) for p in self.logp), default=1)
        self._cache: dict[str, list[str]] = {}
        self._cache_cap = cache_cap

    @classmethod
    def from_hf(
        cls, model: dict, metaspace: str | None = None, cache_cap: int = 500_000
    ):
        """Construct from a ``tokenizer.json`` ``model`` object
        (``{"type": "Unigram", "vocab": [[piece, logp], ...],
        "unk_id": int}`` — the HF `tokenizers` serialization of the
        sentencepiece family; reference analog
        src/pipelines/hf_tokenizers.rs).  FILE ORDER defines the token
        ids (unlike the native constructor's sorted-piece assignment);
        the piece at ``unk_id`` supplies the UNK log-prob and is
        excluded from the segmentation LM (it is a control piece, not
        matchable text).  ``metaspace`` is the word-boundary marker
        from a ``Metaspace`` pre_tokenizer section (real sentencepiece
        exports — T5/Albert/XLNet — carry one): encode then splits on
        whitespace and segments ``marker + token``, the sentencepiece
        convention, instead of the word-regex path."""
        vocab_list = model["vocab"]
        unk_id = int(model.get("unk_id") or 0)
        self = cls.__new__(cls)
        self.metaspace = metaspace
        self.vocab = {p: i for i, (p, _) in enumerate(vocab_list)}
        if len(self.vocab) != len(vocab_list):
            raise ValueError("tokenizer.json Unigram vocab has duplicate pieces")
        self.inv_vocab = {i: p for p, i in self.vocab.items()}
        self.logp = {
            p: float(lp) for i, (p, lp) in enumerate(vocab_list) if i != unk_id
        }
        self.unk_logp = float(vocab_list[unk_id][1])
        self.unk_id = unk_id
        self.max_piece_len = max((len(p) for p in self.logp), default=1)
        self._cache = {}
        self._cache_cap = cache_cap
        return self

    # ----------------------------------------------------------- viterbi

    def segment(self, word: str) -> list[str]:
        """Best segmentation (max Σ log p; ties → fewer pieces, then the
        longest LAST piece, recursively — deterministic; matches the
        enumeration oracle's reversed-piece-length-tuple rule)."""
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        n = len(word)
        NEG = -math.inf
        # best[i] = (score, n_pieces, backpointer j, piece)
        best: list[tuple[float, int, int, str | None]] = [(NEG, 0, -1, None)] * (n + 1)
        best[0] = (0.0, 0, -1, None)
        logp = self.logp
        for i in range(1, n + 1):
            lo = max(0, i - self.max_piece_len)
            cand: tuple[float, int, int, str | None] | None = None
            cand_key = None
            for j in range(lo, i):
                if best[j][0] == NEG:
                    continue
                piece = word[j:i]
                lp = logp.get(piece)
                if lp is None:
                    if i - j == 1:
                        lp = self.unk_logp  # per-char UNK fallback
                    else:
                        continue
                score = best[j][0] + lp
                pieces = best[j][1] + 1
                # maximize score; ties → fewer pieces; ties → longer
                # final piece (smaller j)
                key = (score, -pieces, -j)
                if cand_key is None or key > cand_key:
                    cand_key = key
                    cand = (score, pieces, j, piece)
            best[i] = cand if cand is not None else (NEG, 0, -1, None)
        out: list[str] = []
        i = n
        while i > 0:
            _, _, j, piece = best[i]
            assert piece is not None
            out.append(piece)
            i = j
        out.reverse()
        if len(self._cache) < self._cache_cap:
            self._cache[word] = out
        return out

    # ------------------------------------------------------------ encode

    def encode(self, text: str) -> EncodedText:
        if self.metaspace is not None:
            return self._encode_metaspace(text)
        ids: list[int] = []
        offsets: list[tuple[int, int] | None] = []
        masks: list[int] = []
        word_indices: list[int] = []
        words: list[str] = []
        vocab = self.vocab
        for w_idx, m in enumerate(_WORD_RE.finditer(text)):
            word = m.group(0)
            words.append(word)
            pos = m.start()
            for p_no, piece in enumerate(self.segment(word)):
                ids.append(vocab.get(piece, self.unk_id))
                offsets.append((pos, pos + len(piece)))
                masks.append(MASK_NONE if p_no == 0 else MASK_CONTINUATION)
                word_indices.append(w_idx)
                pos += len(piece)
        return EncodedText(
            ids=ids, offsets=offsets, masks=masks, word_indices=word_indices,
            words=words,
        )

    def _encode_metaspace(self, text: str) -> EncodedText:
        """Sentencepiece-convention encode: split on whitespace, segment
        ``marker + token``.  The marker consumes no ORIGINAL characters
        — a piece's char span is its length minus its leading marker,
        so offsets stay exact slices of the input text."""
        import re as _re

        marker = self.metaspace
        ids: list[int] = []
        offsets: list[tuple[int, int] | None] = []
        masks: list[int] = []
        word_indices: list[int] = []
        words: list[str] = []
        vocab = self.vocab
        for w_idx, m in enumerate(_re.finditer(r"\S+", text)):
            token = m.group(0)
            words.append(token)
            pos = m.start()
            for p_no, piece in enumerate(self.segment(marker + token)):
                n_chars = len(piece) - (1 if piece.startswith(marker) else 0)
                ids.append(vocab.get(piece, self.unk_id))
                offsets.append((pos, pos + n_chars))
                masks.append(MASK_NONE if p_no == 0 else MASK_CONTINUATION)
                word_indices.append(w_idx)
                pos += n_chars
        return EncodedText(
            ids=ids, offsets=offsets, masks=masks, word_indices=word_indices,
            words=words,
        )

    # ------------------------------------------------------------ decode

    def decode(self, ids: list[int], word_indices: list[int] | None = None) -> str:
        """ids (+ optional word boundaries) → text.  Without boundaries,
        pieces are joined directly (lossless only within one word); with
        them, words are joined by single spaces.  Metaspace models
        decode by the sentencepiece rule instead: markers become spaces
        (word boundaries are IN the ids — lossless for single-spaced
        text, no word_indices needed)."""
        pieces = [self.inv_vocab.get(int(i), UNK_PIECE) for i in ids]
        if self.metaspace is not None:
            return "".join(pieces).replace(self.metaspace, " ").lstrip(" ")
        if word_indices is None:
            return "".join(pieces)
        parts: list[str] = []
        last_w = None
        for piece, w in zip(pieces, word_indices):
            if w != last_w:
                parts.append(piece)
                last_w = w
            else:
                parts[-1] += piece
        return " ".join(parts)
