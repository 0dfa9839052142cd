"""Byte-level BPE tokenizer (GPT-2 family) beside WordPiece.

Fills the reference's second big tokenizer family
(/root/reference/src/pipelines/common.rs:1332-1396 dispatches Gpt2 /
Roberta / Bart / DeBERTa tokenizers — all byte-level BPE from
rust_tokenizers): greedy lowest-rank pair merging over byte units, the
GPT-2 byte→unicode table, UNK-free byte fallback, and the id→text
decode.  The merges/vocab are TRAINED deterministically from the
project corpus by ``tools/build_bpe.py`` (classic Sennrich BPE —
public algorithm; no external vocab files exist in this sandbox), so
piece boundaries are corpus-realistic while every byte remains
encodable.

Interface contract matches ``SubwordTokenizer`` / ``WordPieceTokenizer``
(ids, **character** offsets, masks, word_indices) so the tokenizer
drops into the injectable slot of every stage.

Pretokenization reimplements the GPT-2 pattern
``'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+``
as an explicit scanner (stdlib ``re`` has no ``\\p{..}`` classes):
contractions split, a single leading space attaches to the following
word, interior whitespace runs keep their last space attached to the
next token.
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache

from rust_bert_ray.tokenization import (
    MASK_CONTINUATION,
    MASK_NONE,
    EncodedText,
)

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
DEFAULT_MERGES_PATH = os.path.join(DATA_DIR, "bpe_merges.txt")
DEFAULT_VOCAB_PATH = os.path.join(DATA_DIR, "bpe_vocab.json")

EOT_TOKEN = "<|endoftext|>"

_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte → printable-unicode map (public algorithm):
    printable ASCII + latin-1 ranges map to themselves, the remaining 68
    byte values map to 256+offset code points."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


@lru_cache(maxsize=1)
def unicode_to_bytes() -> dict[str, int]:
    return {v: k for k, v in bytes_to_unicode().items()}


def _cat(ch: str) -> str:
    """Character class for the pretokenizer: L(etter), N(umber),
    S(pace), O(ther)."""
    if ch.isspace():
        return "S"
    if ch.isalpha():
        return "L"
    if ch.isnumeric():
        return "N"
    return "O"


def pretokenize(text: str) -> list[tuple[int, str]]:
    """GPT-2-pattern pretokens as (char_start, token_text) pairs.

    The concatenation of token texts equals ``text`` exactly (whitespace
    is part of tokens), which is what makes byte-level round-trips
    lossless."""
    out: list[tuple[int, str]] = []
    n = len(text)
    pos = 0
    while pos < n:
        ch = text[pos]
        # contractions: 's 't 're 've 'm 'll 'd  (literal, case-sensitive)
        if ch == "'":
            rest = text[pos : pos + 3]
            hit = next((c for c in _CONTRACTIONS if rest.startswith(c)), None)
            if hit is not None:
                out.append((pos, hit))
                pos += len(hit)
                continue
        cat = _cat(ch)
        if ch == " " and pos + 1 < n and _cat(text[pos + 1]) in ("L", "N", "O"):
            # " ?X+": single leading space attaches to the run
            run_cat = _cat(text[pos + 1])
            end = pos + 2
            while end < n and _cat(text[end]) == run_cat:
                end += 1
            out.append((pos, text[pos:end]))
            pos = end
            continue
        if cat in ("L", "N", "O"):
            end = pos + 1
            while end < n and _cat(text[end]) == cat:
                end += 1
            out.append((pos, text[pos:end]))
            pos = end
            continue
        # whitespace run: "\s+(?!\S)" keeps the run only when it ends the
        # text; otherwise the final whitespace char is left for the next
        # token (it becomes the " ?" prefix when it is a plain space)
        end = pos + 1
        while end < n and text[end].isspace():
            end += 1
        if end == n or end - pos == 1:
            out.append((pos, text[pos:end]))
            pos = end
        else:
            out.append((pos, text[pos : end - 1]))
            pos = end - 1
    return out


class ByteLevelBpeTokenizer:
    """Trained byte-level BPE with char offsets; build once per actor."""

    def __init__(
        self,
        vocab_path: str = DEFAULT_VOCAB_PATH,
        merges_path: str = DEFAULT_MERGES_PATH,
        cache_cap: int = 500_000,
    ):
        with open(vocab_path, encoding="utf-8") as f:
            self.vocab: dict[str, int] = json.load(f)
        self.id_to_unit = {i: u for u, i in self.vocab.items()}
        self.ranks: dict[tuple[str, str], int] = {}
        with open(merges_path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                a, b = line.split(" ")
                self.ranks[(a, b)] = len(self.ranks)
        self.b2u = bytes_to_unicode()
        self.u2b = unicode_to_bytes()
        self.eot_id = self.vocab[EOT_TOKEN]
        self._cache: dict[str, list[str]] = {}
        self._cache_cap = cache_cap

    @classmethod
    def from_hf(cls, model: dict, cache_cap: int = 500_000):
        """Construct from a ``tokenizer.json`` ``model`` object
        (``{"type": "BPE", "vocab": {...}, "merges": [...]}`` — the HF
        `tokenizers` serialization; reference analog
        src/pipelines/hf_tokenizers.rs).  Merges accept both the legacy
        ``"a b"`` string form and the current ``["a", "b"]`` list form.
        """
        self = cls.__new__(cls)
        self.vocab = dict(model["vocab"])
        self.id_to_unit = {i: u for u, i in self.vocab.items()}
        self.ranks = {}
        for m in model.get("merges", []):
            a, b = m if isinstance(m, (list, tuple)) else m.split(" ")
            self.ranks[(a, b)] = len(self.ranks)
        self.b2u = bytes_to_unicode()
        self.u2b = unicode_to_bytes()
        # eot is optional in arbitrary HF vocabs (set but unused fields
        # stay harmless; -1 never collides with a real id)
        self.eot_id = self.vocab.get(EOT_TOKEN, -1)
        self._cache = {}
        self._cache_cap = cache_cap
        return self

    # ---------------------------------------------------------- merges

    def _bpe_units(self, token: str) -> list[str]:
        """token text → merged byte-unit strings (greedy lowest rank)."""
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        units = [self.b2u[b] for b in token.encode("utf-8")]
        ranks = self.ranks
        while len(units) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(units) - 1):
                r = ranks.get((units[i], units[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            units = (
                units[:best_i]
                + [units[best_i] + units[best_i + 1]]
                + units[best_i + 2 :]
            )
        if len(self._cache) < self._cache_cap:
            self._cache[token] = units
        return units

    # ---------------------------------------------------------- encode

    def encode(self, text: str) -> EncodedText:
        ids: list[int] = []
        offsets: list[tuple[int, int] | None] = []
        masks: list[int] = []
        word_indices: list[int] = []
        words: list[str] = []
        vocab = self.vocab
        for w_idx, (start, token) in enumerate(pretokenize(text)):
            words.append(token)
            units = self._bpe_units(token)
            # byte → char map for offset fidelity on multi-byte chars
            byte_char: list[int] = []
            for c_idx, ch in enumerate(token):
                byte_char.extend([c_idx] * len(ch.encode("utf-8")))
            b = 0
            for p_no, unit in enumerate(units):
                n_bytes = len(unit)  # one unicode unit char per source byte
                c0 = byte_char[b]
                c1 = byte_char[b + n_bytes - 1] + 1
                ids.append(vocab[unit])  # byte fallback ⇒ never UNK
                offsets.append((start + c0, start + c1))
                masks.append(MASK_NONE if p_no == 0 else MASK_CONTINUATION)
                word_indices.append(w_idx)
                b += n_bytes
        return EncodedText(
            ids=ids,
            offsets=offsets,
            masks=masks,
            word_indices=word_indices,
            words=words,
        )

    # ---------------------------------------------------------- decode

    def decode(self, ids: list[int], skip_special_tokens: bool = True) -> str:
        parts: list[str] = []
        for i in ids:
            unit = self.id_to_unit.get(int(i))
            if unit is None:
                continue
            if unit == EOT_TOKEN:
                if skip_special_tokens:
                    continue
                parts.append(unit)
                continue
            parts.append(unit)
        data = bytes(self.u2b[u] for part in parts for u in part)
        return data.decode("utf-8", errors="replace")


class SuffixBpeTokenizer:
    """Non-byte-level BPE with an end-of-word suffix marker — the
    OpenAI-GPT / CTRL tokenizer family (reference common.rs:259-301
    dispatches OpenAiGpt/Ctrl via rust_tokenizers; both lowercase and
    merge over RAW characters with ``</w>`` on the word-final unit,
    unlike the GPT-2 byte-level table).  HF `tokenizers` serializes
    this family as ``model.type == "BPE"`` with ``end_of_word_suffix``
    set — :func:`rust_bert_ray.hf_tokenizers.load_hf_tokenizer`
    dispatches here on that field.

    Contract matches the repo's other tokenizers (ids, CHARACTER
    offsets into the original text, masks, word_indices).  Lowercasing
    follows WordPiece's length-preserving rule (tokenization.py:275) so
    offsets never drift; units absent from the vocab map to the UNK id
    (this family has a true UNK — no byte fallback).
    """

    def __init__(
        self,
        vocab: dict[str, int],
        merges: list[tuple[str, str]],
        suffix: str = "</w>",
        unk_token: str = "<unk>",
        lower_case: bool = True,
        cache_cap: int = 500_000,
    ):
        self.vocab = dict(vocab)
        self.inv_vocab = {i: u for u, i in self.vocab.items()}
        self.ranks = {tuple(m): r for r, m in enumerate(merges)}
        self.suffix = suffix
        self.unk_token = unk_token
        if unk_token not in self.vocab:
            raise ValueError(f"vocab lacks its unk_token {unk_token!r}")
        self.unk_id = self.vocab[unk_token]
        self.lower_case = lower_case
        self._cache: dict[str, list[str]] = {}
        self._cache_cap = cache_cap

    @classmethod
    def from_hf(cls, model: dict, lower_case: bool = True, cache_cap: int = 500_000):
        """Construct from a ``tokenizer.json`` ``model`` object with
        ``end_of_word_suffix`` (the GPT-1/CTRL serialization).  Merges
        accept both the legacy ``"a b"`` string form and the current
        ``["a", "b"]`` list form."""
        merges = [
            tuple(m) if isinstance(m, (list, tuple)) else tuple(m.split(" "))
            for m in model.get("merges", [])
        ]
        return cls(
            vocab=model["vocab"],
            merges=merges,
            suffix=model["end_of_word_suffix"],
            unk_token=model.get("unk_token") or "<unk>",
            lower_case=lower_case,
            cache_cap=cache_cap,
        )

    # ---------------------------------------------------------- merges

    def _bpe_units(self, word: str) -> list[str]:
        """word → merged units (greedy lowest rank; last unit carries
        the suffix)."""
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        units = list(word)
        units[-1] = units[-1] + self.suffix
        ranks = self.ranks
        while len(units) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(units) - 1):
                r = ranks.get((units[i], units[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            units = (
                units[:best_i]
                + [units[best_i] + units[best_i + 1]]
                + units[best_i + 2 :]
            )
        if len(self._cache) < self._cache_cap:
            self._cache[word] = units
        return units

    def _char_len(self, unit: str) -> int:
        return len(unit) - (len(self.suffix) if unit.endswith(self.suffix) else 0)

    # ---------------------------------------------------------- encode

    def encode(self, text: str) -> EncodedText:
        from rust_bert_ray.tokenization import _WORD_RE

        ids: list[int] = []
        offsets: list[tuple[int, int] | None] = []
        masks: list[int] = []
        word_indices: list[int] = []
        words: list[str] = []
        vocab = self.vocab
        for w_idx, m in enumerate(_WORD_RE.finditer(text)):
            word = m.group(0)
            if self.lower_case:
                lowered = word.lower()
                word = lowered if len(lowered) == len(word) else word
            words.append(word)
            pos = m.start()
            for p_no, unit in enumerate(self._bpe_units(word)):
                n_chars = self._char_len(unit)
                ids.append(vocab.get(unit, self.unk_id))
                offsets.append((pos, pos + n_chars))
                masks.append(MASK_NONE if p_no == 0 else MASK_CONTINUATION)
                word_indices.append(w_idx)
                pos += n_chars
        return EncodedText(
            ids=ids,
            offsets=offsets,
            masks=masks,
            word_indices=word_indices,
            words=words,
        )

    # ---------------------------------------------------------- decode

    def decode(self, ids: list[int]) -> str:
        """ids → text: suffix markers become word-separating spaces (the
        rust_tokenizers convert_tokens_to_string rule for this family)."""
        parts = [self.inv_vocab.get(int(i), self.unk_token) for i in ids]
        return "".join(parts).replace(self.suffix, " ").strip()


class MetaspaceBpeTokenizer:
    """Sentencepiece-BPE — the Marian / XLM tokenizer family (reference
    common.rs:259-301 dispatches Marian/XLM via rust_tokenizers'
    sentencepiece-BPE model; hf_tokenizers.rs handles its
    ``tokenizer.json`` export: ``model.type == "BPE"`` with a
    ``Metaspace`` pre_tokenizer).  Unlike GPT-2's byte-level table or
    the GPT-1 ``</w>`` suffix convention, this family marks the word
    START: whitespace pre-tokenization prepends the metaspace marker
    (▁) to each token, then classic BPE merges raw characters of
    ``marker + token``.  Units absent from the vocab map to the UNK id
    (true UNK, no byte fallback); decode replaces markers with spaces
    (the sentencepiece decoder rule).

    Contract matches the repo's other tokenizers: ids, CHARACTER
    offsets into the ORIGINAL text (the marker consumes no source
    characters — same offset algebra as
    ``UnigramTokenizer._encode_metaspace``), masks, word_indices.
    """

    def __init__(
        self,
        vocab: dict[str, int],
        merges: list[tuple[str, str]],
        marker: str = "▁",
        unk_token: str = "<unk>",
        cache_cap: int = 500_000,
    ):
        self.vocab = dict(vocab)
        self.inv_vocab = {i: u for u, i in self.vocab.items()}
        self.ranks = {tuple(m): r for r, m in enumerate(merges)}
        self.marker = marker
        self.unk_token = unk_token
        if unk_token not in self.vocab:
            raise ValueError(f"vocab lacks its unk_token {unk_token!r}")
        self.unk_id = self.vocab[unk_token]
        self._cache: dict[str, list[str]] = {}
        self._cache_cap = cache_cap

    @classmethod
    def from_hf(cls, model: dict, marker: str = "▁", cache_cap: int = 500_000):
        """Construct from a ``tokenizer.json`` ``model`` object whose
        document carries a ``Metaspace`` pre_tokenizer (the Marian/XLM
        sentencepiece-BPE export; ``marker`` is that section's
        ``replacement``).  Merges accept both the legacy ``"a b"``
        string form and the current ``["a", "b"]`` list form."""
        merges = [
            tuple(m) if isinstance(m, (list, tuple)) else tuple(m.split(" "))
            for m in model.get("merges", [])
        ]
        return cls(
            vocab=model["vocab"],
            merges=merges,
            marker=marker,
            unk_token=model.get("unk_token") or "<unk>",
            cache_cap=cache_cap,
        )

    # ---------------------------------------------------------- merges

    def _bpe_units(self, token: str) -> list[str]:
        """``marker + token`` → merged units (greedy lowest rank)."""
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        units = list(self.marker + token)
        ranks = self.ranks
        while len(units) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(units) - 1):
                r = ranks.get((units[i], units[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            units = (
                units[:best_i]
                + [units[best_i] + units[best_i + 1]]
                + units[best_i + 2 :]
            )
        if len(self._cache) < self._cache_cap:
            self._cache[token] = units
        return units

    # ---------------------------------------------------------- encode

    def encode(self, text: str) -> EncodedText:
        ids: list[int] = []
        offsets: list[tuple[int, int] | None] = []
        masks: list[int] = []
        word_indices: list[int] = []
        words: list[str] = []
        vocab = self.vocab
        marker = self.marker
        for w_idx, m in enumerate(re.finditer(r"\S+", text)):
            token = m.group(0)
            words.append(token)
            pos = m.start()
            for p_no, unit in enumerate(self._bpe_units(token)):
                n_chars = len(unit) - unit.count(marker)
                ids.append(vocab.get(unit, self.unk_id))
                offsets.append((pos, pos + n_chars))
                masks.append(MASK_NONE if p_no == 0 else MASK_CONTINUATION)
                word_indices.append(w_idx)
                pos += n_chars
        return EncodedText(
            ids=ids,
            offsets=offsets,
            masks=masks,
            word_indices=word_indices,
            words=words,
        )

    # ---------------------------------------------------------- decode

    def decode(self, ids: list[int]) -> str:
        """ids → text by the sentencepiece rule: markers become spaces
        (word boundaries are IN the ids — lossless on single-spaced
        text, no word_indices needed)."""
        parts = [self.inv_vocab.get(int(i), self.unk_token) for i in ids]
        return "".join(parts).replace(self.marker, " ").lstrip(" ")
