"""Deterministic sub-word tokenizer with character offsets and masks.

Mirrors the *interface contract* of the reference tokenizers
(``rust_tokenizers`` as consumed via
/root/reference/src/pipelines/common.rs:1332-1396): every token carries

- ``id``      — stable integer id (crc32 of the piece text),
- ``offset``  — **character** (not byte) span ``(begin, end)`` into the
  source string, or ``None`` for special tokens
  (char semantics confirmed at
  /root/reference/src/pipelines/token_classification.rs:1108-1118),
- ``mask``    — token category (``NONE`` word-initial piece,
  ``CONTINUATION`` sub-word piece, ``SPECIAL`` for [CLS]/[SEP]),
  matching the reference ``Mask`` enum usage
  (/root/reference/src/pipelines/token_classification.rs:1011-1017).

The tokenizer itself is *not* a port of any wordpiece vocab: it splits on
``(?u)\\w+|[^\\w\\s]`` and breaks words longer than ``piece_len`` chars into
fixed-width pieces, which is enough to exercise every downstream decode
path (sliding windows, continuation consolidation, char-offset slicing)
deterministically without shipping a vocab file.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass
from typing import Optional

# Token categories (subset of the reference's Mask enum that the decode
# paths actually branch on).
MASK_NONE = 0
MASK_SPECIAL = 1
MASK_CONTINUATION = 2

CLS_ID = 101
SEP_ID = 102

_WORD_RE = re.compile(r"(?u)\w+|[^\w\s]")


def stable_id(piece: str) -> int:
    """Deterministic token id (crc32; Python's hash() is salted)."""
    return zlib.crc32(piece.encode("utf-8")) & 0x7FFFFFFF


@dataclass
class EncodedText:
    """Flat encoding of one text: parallel lists, one entry per sub-word."""

    ids: list[int]
    offsets: list[Optional[tuple[int, int]]]
    masks: list[int]
    word_indices: list[int]  # index of the source word each piece belongs to
    words: list[str] | None = None  # source word surfaces (one per word)


class SubwordTokenizer:
    """Stateless, deterministic; build once per actor in ``__init__``."""

    def __init__(self, piece_len: int = 4, lower_case: bool = False, cache_cap: int = 500_000):
        self.piece_len = piece_len
        self.lower_case = lower_case
        # word → (piece ids, piece lengths, piece masks); pure function of
        # the word, so safe to memoize (vocabulary-bounded)
        self._word_cache: dict[str, tuple[list[int], list[int], list[int]]] = {}
        self._cache_cap = cache_cap

    def _encode_word(self, word: str) -> tuple[list[int], list[int], list[int]]:
        cached = self._word_cache.get(word)
        if cached is not None:
            return cached
        ids: list[int] = []
        lengths: list[int] = []
        masks: list[int] = []
        pos = 0
        piece_no = 0
        while pos < len(word):
            piece = word[pos : pos + self.piece_len]
            ids.append(stable_id(piece if piece_no == 0 else "##" + piece))
            lengths.append(len(piece))
            masks.append(MASK_NONE if piece_no == 0 else MASK_CONTINUATION)
            pos += len(piece)
            piece_no += 1
        out = (ids, lengths, masks)
        if len(self._word_cache) < self._cache_cap:
            self._word_cache[word] = out
        return out

    def encode(self, text: str) -> EncodedText:
        ids: list[int] = []
        offsets: list[Optional[tuple[int, int]]] = []
        masks: list[int] = []
        word_indices: list[int] = []
        words: list[str] = []
        for w_idx, m in enumerate(_WORD_RE.finditer(text)):
            begin = m.start()
            word = m.group(0)
            if self.lower_case:
                word = word.lower()
            words.append(word)
            w_ids, w_lens, w_masks = self._encode_word(word)
            ids.extend(w_ids)
            masks.extend(w_masks)
            pos = begin
            for ln in w_lens:
                offsets.append((pos, pos + ln))
                word_indices.append(w_idx)
                pos += ln
        return EncodedText(
            ids=ids, offsets=offsets, masks=masks, word_indices=word_indices, words=words
        )

    @staticmethod
    def build_with_special_tokens(enc: EncodedText) -> EncodedText:
        """[CLS] + pieces + [SEP], special tokens carry no offset.

        Mirrors ``build_input_with_special_tokens``
        (/root/reference/src/common/... via token_classification.rs:853-855).
        """
        return EncodedText(
            ids=[CLS_ID, *enc.ids, SEP_ID],
            offsets=[None, *enc.offsets, None],
            masks=[MASK_SPECIAL, *enc.masks, MASK_SPECIAL],
            word_indices=[-1, *enc.word_indices, -1],
            words=enc.words,
        )


# --------------------------------------------------------------- WordPiece

DEFAULT_VOCAB_PATH = __file__.rsplit("/", 1)[0] + "/data/wordpiece_vocab.txt"

PAD_TOKEN, UNK_TOKEN, CLS_TOKEN, SEP_TOKEN, MASK_TOKEN_WP = (
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
)
SPECIAL_TOKENS = {PAD_TOKEN, UNK_TOKEN, CLS_TOKEN, SEP_TOKEN, MASK_TOKEN_WP}


def load_vocab(path: str = DEFAULT_VOCAB_PATH) -> dict[str, int]:
    """piece → id, by file line number (the standard vocab.txt layout the
    reference's BertTokenizer consumes, common.rs:1332-1396)."""
    vocab: dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            vocab[line.rstrip("\n")] = i
    return vocab


class WordPieceTokenizer:
    """Real greedy longest-match-first WordPiece over a bundled vocab.

    Same interface contract as ``SubwordTokenizer`` (ids, char offsets,
    masks, word_indices) so it drops into the injectable-tokenizer slot
    of every stage; additionally implements the id→text ``decode`` +
    cleanup path (/root/reference/src/pipelines/common.rs:1397-1466 —
    the reference delegates to rust_tokenizers' decode with
    ``skip_special_tokens`` / ``clean_up_tokenization_spaces``).

    Words whose greedy match dead-ends become a single [UNK] covering
    the whole word span (standard WordPiece ``is_bad`` semantics); the
    bundled vocab carries an ascii char + ##char alphabet so this only
    happens for non-ascii-alphabet words.
    """

    def __init__(
        self,
        vocab_path: str = DEFAULT_VOCAB_PATH,
        lower_case: bool = False,
        strip_accents: bool = False,
        max_input_chars_per_word: int = 100,
        cache_cap: int = 500_000,
    ):
        self.strip_accents = strip_accents
        self.vocab = load_vocab(vocab_path)
        self.inv_vocab = {i: p for p, i in self.vocab.items()}
        self.unk_id = self.vocab[UNK_TOKEN]
        self.cls_id = self.vocab[CLS_TOKEN]
        self.sep_id = self.vocab[SEP_TOKEN]
        self.special_ids = {self.vocab[t] for t in SPECIAL_TOKENS if t in self.vocab}
        self.lower_case = lower_case
        self.max_input_chars_per_word = max_input_chars_per_word
        self._word_cache: dict[str, tuple[list[int], list[int], list[int]]] = {}
        self._cache_cap = cache_cap

    @classmethod
    def from_hf(
        cls,
        model: dict,
        lower_case: bool = False,
        strip_accents: bool = False,
        cache_cap: int = 500_000,
    ):
        """Construct from a ``tokenizer.json`` ``model`` object
        (``{"type": "WordPiece", "vocab": {...}, "unk_token": ...,
        "max_input_chars_per_word": ...}``; reference analog
        src/pipelines/hf_tokenizers.rs).  The normalizer flags come from
        the document's ``normalizer`` section via
        hf_tokenizers.load_hf_tokenizer.
        """
        self = cls.__new__(cls)
        self.strip_accents = strip_accents
        self.vocab = dict(model["vocab"])
        self.inv_vocab = {i: p for p, i in self.vocab.items()}
        unk = model.get("unk_token", UNK_TOKEN)
        if unk not in self.vocab:
            raise ValueError(f"tokenizer.json vocab lacks its unk_token {unk!r}")
        self.unk_id = self.vocab[unk]
        # CLS/SEP are required for the pair-assembly layout; standard
        # BERT-family tokenizer.json vocabs always carry them
        self.cls_id = self.vocab[CLS_TOKEN]
        self.sep_id = self.vocab[SEP_TOKEN]
        self.special_ids = {self.vocab[t] for t in SPECIAL_TOKENS if t in self.vocab}
        self.lower_case = lower_case
        self.max_input_chars_per_word = int(
            model.get("max_input_chars_per_word", 100)
        )
        self._word_cache = {}
        self._cache_cap = cache_cap
        return self

    def _encode_word(self, word: str) -> tuple[list[int], list[int], list[int]]:
        """→ (piece ids, piece char-lengths, piece masks); greedy
        longest-match-first; [UNK] spans the whole word on dead-end."""
        cached = self._word_cache.get(word)
        if cached is not None:
            return cached
        if len(word) > self.max_input_chars_per_word:
            out = ([self.unk_id], [len(word)], [MASK_NONE])
        else:
            ids: list[int] = []
            lengths: list[int] = []
            masks: list[int] = []
            pos = 0
            bad = False
            while pos < len(word):
                end = len(word)
                cur_id = None
                while pos < end:
                    sub = word[pos:end]
                    if pos > 0:
                        sub = "##" + sub
                    pid = self.vocab.get(sub)
                    if pid is not None:
                        cur_id = pid
                        break
                    end -= 1
                if cur_id is None:
                    bad = True
                    break
                ids.append(cur_id)
                lengths.append(end - pos)
                masks.append(MASK_NONE if pos == 0 else MASK_CONTINUATION)
                pos = end
            out = (
                ([self.unk_id], [len(word)], [MASK_NONE]) if bad
                else (ids, lengths, masks)
            )
        if len(self._word_cache) < self._cache_cap:
            self._word_cache[word] = out
        return out

    def encode(self, text: str) -> EncodedText:
        ids: list[int] = []
        offsets: list[Optional[tuple[int, int]]] = []
        masks: list[int] = []
        word_indices: list[int] = []
        words: list[str] = []
        for w_idx, m in enumerate(_WORD_RE.finditer(text)):
            begin = m.start()
            raw = m.group(0)
            word = raw
            # Normalizations apply only when they PRESERVE the word's char
            # length — Unicode lowercase ('İ' → 'i̇') or accent stripping on
            # decomposed input can change it, and piece lengths would then
            # drift off the ORIGINAL char positions downstream slices
            # against.  Length-changing words keep their raw form (pieces
            # fall back to the char/[UNK] alphabet); offsets stay exact.
            if self.strip_accents:
                stripped = strip_accents(word)
                word = stripped if len(stripped) == len(word) else word
            if self.lower_case:
                lowered = word.lower()
                word = lowered if len(lowered) == len(word) else word
            words.append(word)
            w_ids, w_lens, w_masks = self._encode_word(word)
            ids.extend(w_ids)
            masks.extend(w_masks)
            pos = begin
            for ln in w_lens:
                offsets.append((pos, pos + ln))
                word_indices.append(w_idx)
                pos += ln
        return EncodedText(
            ids=ids, offsets=offsets, masks=masks, word_indices=word_indices,
            words=words,
        )

    def build_with_special_tokens(self, enc: EncodedText) -> EncodedText:
        return EncodedText(
            ids=[self.cls_id, *enc.ids, self.sep_id],
            offsets=[None, *enc.offsets, None],
            masks=[MASK_SPECIAL, *enc.masks, MASK_SPECIAL],
            word_indices=[-1, *enc.word_indices, -1],
            words=enc.words,
        )

    # ----------------------------------------------------------- decode

    def convert_ids_to_tokens(self, ids: list[int]) -> list[str]:
        return [self.inv_vocab.get(i, UNK_TOKEN) for i in ids]

    def decode(
        self,
        ids: list[int],
        skip_special_tokens: bool = True,
        clean_up_tokenization_spaces: bool = True,
    ) -> str:
        """ids → text (common.rs:1397-1412 contract): join pieces, fusing
        ``##`` continuations; optional special-token skip + cleanup."""
        parts: list[str] = []
        for i in ids:
            if skip_special_tokens and i in self.special_ids:
                continue
            piece = self.inv_vocab.get(i, UNK_TOKEN)
            if piece.startswith("##"):
                # continuation marker is stripped even when the sequence
                # STARTS mid-word (e.g. decoding an answer-span slice)
                if parts:
                    parts[-1] += piece[2:]
                else:
                    parts.append(piece[2:])
            else:
                parts.append(piece)
        text = " ".join(parts)
        if clean_up_tokenization_spaces:
            text = clean_up_tokenization(text)
        return text


TRUNCATE_LONGEST_FIRST = "longest_first"
TRUNCATE_ONLY_FIRST = "only_first"
TRUNCATE_ONLY_SECOND = "only_second"
TRUNCATE_DO_NOT = "do_not_truncate"


def truncate_pair(
    seq_a: list,
    seq_b: list,
    num_to_remove: int,
    strategy: str = TRUNCATE_LONGEST_FIRST,
) -> tuple[list, list, list]:
    """Pair truncation with the reference's strategies
    (rust_tokenizers ``TruncationStrategy`` as consumed via
    ``encode_pair_list``, common.rs:936-1085):

    - ``longest_first``: remove one token at a time from the end of the
      currently-longer sequence;
    - ``only_first`` / ``only_second``: remove from the end of that
      sequence only (error if it is too short);
    - ``do_not_truncate``: error when removal is required.

    → (seq_a, seq_b, overflow) — overflow lists the removed tokens in
    removal order.
    """
    if num_to_remove <= 0:
        return list(seq_a), list(seq_b), []
    a, b = list(seq_a), list(seq_b)
    overflow: list = []
    if strategy == TRUNCATE_DO_NOT:
        raise ValueError(
            f"sequence pair needs {num_to_remove} tokens removed but "
            "truncation is disabled"
        )
    if strategy == TRUNCATE_LONGEST_FIRST:
        for _ in range(num_to_remove):
            if not a and not b:
                break
            src = a if len(a) >= len(b) else b
            overflow.append(src.pop())
        return a, b, overflow
    if strategy in (TRUNCATE_ONLY_FIRST, TRUNCATE_ONLY_SECOND):
        src = a if strategy == TRUNCATE_ONLY_FIRST else b
        if len(src) < num_to_remove:
            raise ValueError(
                f"cannot remove {num_to_remove} tokens from a "
                f"{len(src)}-token sequence with strategy {strategy!r}"
            )
        for _ in range(num_to_remove):
            overflow.append(src.pop())
        return a, b, overflow
    raise ValueError(f"unknown truncation strategy {strategy!r}")


def strip_accents(word: str) -> str:
    """NFD-decompose and drop combining marks (the tokenizer's
    ``strip_accents`` flag, token_classification.rs:237-242)."""
    import unicodedata

    return "".join(
        c for c in unicodedata.normalize("NFD", word)
        if unicodedata.category(c) != "Mn"
    )


def clean_up_tokenization(text: str) -> str:
    """The standard decode cleanup (rust_tokenizers / common.rs:1413-1466
    behavior): re-attach punctuation and English contractions that the
    whitespace join detached."""
    for src, dst in (
        (" .", "."), (" ?", "?"), (" !", "!"), (" ,", ","),
        (" ' ", "'"), (" n't", "n't"), (" 'm", "'m"), (" 's", "'s"),
        (" 've", "'ve"), (" 're", "'re"),
    ):
        text = text.replace(src, dst)
    return text


# ------------------------------------------- special-token assembly matrix

@dataclass
class AssembledInput:
    """Single/pair sequence with special tokens (the reference's
    ``TokenizedInput`` shape, common.rs:1467-1570)."""

    tokens: list[str]
    segment_ids: list[int]
    special_tokens_mask: list[int]
    offsets: list[Optional[tuple[int, int]]]


# family → (layout template) where A/B are the sequences and quoted
# strings are special tokens.  One row per tokenizer family the
# reference dispatches (common.rs:1472-1560 — one match arm each for
# Bert, Deberta, DebertaV2, Roberta, Bart, XLMRoberta, Marian, T5,
# Albert, XLNet, GPT2, OpenAiGpt, Reformer, ProphetNet, Pegasus,
# MBart50, M2M100, NLLB, FNet); layout conventions fixed by the
# rust_tokenizers crate / the matching HF tokenizer classes:
#   bert/albert/deberta/deberta-v2/fnet :
#       [CLS] A [SEP]  (+ B [SEP], segment 1)
#   roberta/bart/xlm-roberta : <s> A </s>  (+ </s> B </s>, segment 0)
#   gpt2/openai-gpt/reformer : A           (+ B — no specials at all)
#   t5                       : A </s>      (+ B </s>)
#   marian/pegasus/m2m100/mbart50/nllb :
#       A </s>; pair joins the sequences under ONE trailing eos —
#       A B </s> (HF {Pegasus,Marian,M2M100,...}Tokenizer
#       build_inputs_with_special_tokens; language-code prefixes are
#       text-level in the reference's translation path, not assembly)
#   xlnet                    : A <sep> (B <sep>) <cls> — classes at END,
#                              segments 0/1, final <cls> segment 2
#   prophetnet               : A [SEP]     (+ B [SEP])
SPECIAL_TOKEN_FAMILIES = (
    "bert", "albert", "deberta", "deberta-v2", "fnet",
    "roberta", "bart", "xlm-roberta",
    "gpt2", "openai-gpt", "reformer",
    "t5",
    "marian", "pegasus", "m2m100", "mbart50", "nllb",
    "xlnet", "prophetnet",
)


def assemble_special_tokens(
    family: str,
    enc_a: EncodedText,
    enc_b: EncodedText | None = None,
) -> AssembledInput:
    """Per-family single/pair special-token assembly.

    Mirrors ``TokenizerOption::build_input_with_special_tokens``
    (common.rs:1467-1570): the pair layout differs per family —
    ``[CLS]A[SEP]B[SEP]`` vs ``<s>A</s></s>B</s>`` vs bare
    concatenation — and segment ids / special-token masks follow."""

    def body(enc: EncodedText, seg: int):
        toks = [str(i) for i in enc.ids]
        return (
            toks,
            [seg] * len(toks),
            [0] * len(toks),
            list(enc.offsets),
        )

    a_t, a_s, a_m, a_o = body(enc_a, 0)
    has_b = enc_b is not None
    if has_b:
        # families with token_type_ids give the pair sequence segment 1;
        # roberta/bart/gpt2/t5-style models have no segment embedding
        b_seg = (
            1
            if family in ("bert", "albert", "deberta", "deberta-v2", "fnet",
                          "xlnet", "prophetnet")
            else 0
        )
        b_t, b_s, b_m, b_o = body(enc_b, b_seg)

    def special(tok: str, seg: int):
        return ([tok], [seg], [1], [None])

    if family in ("bert", "albert", "deberta", "deberta-v2", "fnet"):
        parts = [special("[CLS]", 0), (a_t, a_s, a_m, a_o), special("[SEP]", 0)]
        if has_b:
            parts += [(b_t, b_s, b_m, b_o), special("[SEP]", 1)]
    elif family in ("roberta", "bart", "xlm-roberta"):
        parts = [special("<s>", 0), (a_t, a_s, a_m, a_o), special("</s>", 0)]
        if has_b:
            parts += [special("</s>", 0), (b_t, b_s, b_m, b_o), special("</s>", 0)]
    elif family in ("gpt2", "openai-gpt", "reformer"):
        parts = [(a_t, a_s, a_m, a_o)]
        if has_b:
            parts += [(b_t, b_s, b_m, b_o)]
    elif family == "t5":
        parts = [(a_t, a_s, a_m, a_o), special("</s>", 0)]
        if has_b:
            parts += [(b_t, b_s, b_m, b_o), special("</s>", 0)]
    elif family in ("marian", "pegasus", "m2m100", "mbart50", "nllb"):
        # pair joins A and B under ONE trailing eos (HF convention for
        # the sentencepiece translation/summarization families — T5 is
        # the odd one out with its per-sequence </s>)
        parts = [(a_t, a_s, a_m, a_o)]
        if has_b:
            parts += [(b_t, b_s, b_m, b_o)]
        parts += [special("</s>", 0)]
    elif family == "xlnet":
        parts = [(a_t, a_s, a_m, a_o), special("<sep>", 0)]
        if has_b:
            parts += [(b_t, b_s, b_m, b_o), special("<sep>", 1)]
        parts += [special("<cls>", 2)]
    elif family == "prophetnet":
        parts = [(a_t, a_s, a_m, a_o), special("[SEP]", 0)]
        if has_b:
            parts += [(b_t, b_s, b_m, b_o), special("[SEP]", 1)]
    else:
        raise ValueError(f"unknown special-token family {family!r}")

    tokens, segs, mask, offsets = [], [], [], []
    for t, s, m, o in parts:
        tokens += t
        segs += s
        mask += m
        offsets += o
    return AssembledInput(
        tokens=tokens, segment_ids=segs, special_tokens_mask=mask, offsets=offsets
    )
