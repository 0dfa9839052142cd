"""Standard ``tokenizer.json`` loader — the HF `tokenizers` serialization.

Reference analog: ``src/pipelines/hf_tokenizers.rs`` (768 LoC), the
``new_with_tokenizer`` path every reference pipeline exposes
(token_classification.rs:770-796).  A user brings the single file their
model hub ships; we construct the matching in-repo tokenizer family:

- ``model.type == "BPE"``       → :class:`ByteLevelBpeTokenizer`, or
  :class:`SuffixBpeTokenizer` when ``end_of_word_suffix`` is set (the
  OpenAI-GPT / CTRL serialization; a ``Lowercase`` normalizer section
  is honored), or :class:`MetaspaceBpeTokenizer` when the document
  carries a ``Metaspace`` pre_tokenizer (the Marian / XLM
  sentencepiece-BPE export; hf_tokenizers.rs BPE-with-Metaspace arm)
- ``model.type == "WordPiece"`` → :class:`WordPieceTokenizer`
- ``model.type == "Unigram"``   → :class:`UnigramTokenizer` (the
  sentencepiece-family serialization: ordered ``[piece, logp]`` vocab
  plus ``unk_id``; a ``Metaspace`` pre_tokenizer section — the real
  T5/Albert/XLNet export shape with ▁-prefixed pieces — switches the
  tokenizer to the sentencepiece whitespace/marker convention)

Normalizer flags (``lowercase`` / ``strip_accents`` from a
``BertNormalizer`` section) are honored for WordPiece; unsupported
model types fail fast with the supported list (the reference's
``ConversionError`` behavior, hf_tokenizers.rs match arms).
"""

from __future__ import annotations

import json

from rust_bert_ray.bpe import (
    ByteLevelBpeTokenizer,
    MetaspaceBpeTokenizer,
    SuffixBpeTokenizer,
)
from rust_bert_ray.tokenization import WordPieceTokenizer
from rust_bert_ray.unigram import UnigramTokenizer

SUPPORTED = ("BPE", "WordPiece", "Unigram")


def load_hf_tokenizer(path: str, cache_cap: int = 500_000):
    """``tokenizer.json`` → tokenizer object (family by ``model.type``)."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    model = doc.get("model") or {}
    mtype = model.get("type")
    if mtype == "BPE":
        pre = doc.get("pre_tokenizer") or {}
        ptype = pre.get("type")
        if ptype == "Metaspace":
            # sentencepiece-BPE (Marian/XLM export): whitespace
            # pre-tokenization + word-START marker.  A suffix-marked
            # Metaspace BPE is no serialization HF emits — fail fast
            # rather than mis-tokenize.
            if model.get("end_of_word_suffix"):
                raise ValueError(
                    "tokenizer.json combines a Metaspace pre_tokenizer "
                    "with end_of_word_suffix — no supported BPE family "
                    "uses both; refusing to guess"
                )
            # Real Marian exports can carry a normalizer (typically the
            # 'Precompiled' sentencepiece charsmap).  This loader doesn't
            # implement any normalizer for this family — fail fast
            # rather than BPE un-normalized text against a vocab trained
            # on normalized text (silent wrong ids).
            norm = doc.get("normalizer") or {}
            if norm.get("type"):
                raise ValueError(
                    f"unsupported normalizer {norm.get('type')!r} for the "
                    "Metaspace-BPE family; this loader implements no "
                    "normalization here — refusing to mis-tokenize"
                )
            return MetaspaceBpeTokenizer.from_hf(
                model,
                marker=pre.get("replacement") or "▁",
                cache_cap=cache_cap,
            )
        if ptype not in (None, "ByteLevel"):
            # The byte-level table only round-trips text that was
            # pre-tokenized the GPT-2 way; any other pre_tokenizer
            # means a family this loader doesn't implement.
            raise ValueError(
                f"unsupported BPE pre_tokenizer {ptype!r}; supported: "
                "ByteLevel (or none), Metaspace"
            )
        if model.get("end_of_word_suffix"):
            norm = doc.get("normalizer") or {}
            lower = norm.get("type") == "Lowercase" or bool(
                norm.get("lowercase", False)
            )
            return SuffixBpeTokenizer.from_hf(
                model, lower_case=lower, cache_cap=cache_cap
            )
        return ByteLevelBpeTokenizer.from_hf(model, cache_cap=cache_cap)
    if mtype == "Unigram":
        pre = doc.get("pre_tokenizer") or {}
        metaspace = pre.get("replacement") if pre.get("type") == "Metaspace" else None
        return UnigramTokenizer.from_hf(
            model, metaspace=metaspace, cache_cap=cache_cap
        )
    if mtype == "WordPiece":
        norm = doc.get("normalizer") or {}
        # BertNormalizer: strip_accents=None means "follow lowercase"
        lower = bool(norm.get("lowercase", False))
        sa = norm.get("strip_accents")
        strip_accents = lower if sa is None else bool(sa)
        return WordPieceTokenizer.from_hf(
            model,
            lower_case=lower,
            strip_accents=strip_accents,
            cache_cap=cache_cap,
        )
    raise ValueError(
        f"unsupported tokenizer.json model.type {mtype!r}; supported: {SUPPORTED}"
    )
