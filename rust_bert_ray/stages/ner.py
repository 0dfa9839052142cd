"""Triple-extraction stages: NER over interleaved docs, then relation
classification over entity pairs.

``NerStage`` mirrors the end-to-end decode of ``NERModel::predict_full_entities``
(/root/reference/src/pipelines/ner.rs:324-352 →
token_classification.rs:957-1235): tokenize with char offsets → sliding-window
featurize → batched logits → softmax → argmax → per-token decode (owned,
non-special positions only) → sub-token consolidation → BIOES chunking.
The model backend is a pluggable scorer (see rust_bert_ray.scorers); the
decode algebra is the reference's, unchanged.

Both stages are **actor classes** for ``map_batches(Cls, concurrency=N)``:
tokenizer/scorer construction happens once per actor in ``__init__``
(the reference's load-once ``VarStore::load`` boundary,
token_classification.rs:511-513), per-batch work in ``__call__``.

Scale notes (100 TB):
- rows stay zero-copy Arrow until the per-document text loop, which is the
  irreducible NLP hot path (the reference loops per token in Rust too);
  logits/softmax are vectorized per feature-batch with numpy;
- a bounded memo on exact span text amortizes repeated content (dedup'd
  web corpora repeat heavily); cache is per-actor, no shared state;
- the ``spans`` column is carried through *untouched* (never reconstructed)
  to honor the per-row span-sequence invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rust_bert_ray.decode.chunking import Entity, consolidate_entities
from rust_bert_ray.decode.consolidate import (
    AGG_FIRST,
    AGG_LAST,
    AGG_MODE,
    Token,
    consolidate_tokens,
)
from rust_bert_ray.decode.featurize import generate_features
from rust_bert_ray.decode.vector import BatchWordSplitter, bio_runs
from rust_bert_ray.scorers import (
    NER_LABEL_INDEX,
    NER_LABELS,
    DeterministicRelationScorer,
    DeterministicTagScorer,
    PREDICATES,
    softmax,
)
from rust_bert_ray.tokenization import MASK_SPECIAL, SubwordTokenizer

ENTITY_TYPE_NAMES = [""] + [label[2:] for label in NER_LABELS[1::2]]


class _GrowArray:
    """Amortized-O(1) append numpy array (capacity doubling)."""

    def __init__(self, dtype, cap: int = 1024):
        self._arr = np.empty(cap, dtype=dtype)
        self.n = 0

    def _reserve(self, extra: int) -> None:
        need = self.n + extra
        if need > len(self._arr):
            new = np.empty(max(need, 2 * len(self._arr)), dtype=self._arr.dtype)
            new[: self.n] = self._arr[: self.n]
            self._arr = new

    def append(self, v) -> None:
        self._reserve(1)
        self._arr[self.n] = v
        self.n += 1

    def extend(self, vals) -> None:
        vals = np.asarray(vals, dtype=self._arr.dtype)
        self._reserve(len(vals))
        self._arr[self.n : self.n + len(vals)] = vals
        self.n += len(vals)

    @property
    def view(self) -> np.ndarray:
        return self._arr[: self.n]


class _PieceCache:
    """Per-actor word → piece summary cache for the batch-flat decode.

    For each distinct word surface stores: piece count, total char
    length, whether the word can start a gazetteer match, and a slice
    (start, count) into a flat per-piece jitter array.  Piece ids and
    per-piece arithmetic match ``SubwordTokenizer._encode_word`` +
    ``DeterministicTagScorer.jitter_for`` exactly — the fast path reads
    this cache instead of re-deriving pieces per occurrence.  All flat
    arrays grow by capacity doubling (amortized O(1) per word): on
    diversified corpora every batch adds new words, and a full rebuild
    per batch would be quadratic over an actor's lifetime.
    """

    def __init__(self, tokenizer, scorer, cap: int = 1_000_000):
        self.tokenizer = tokenizer
        self.scorer = scorer
        self.cap = cap
        self.uid: dict[str, int] = {}
        self._start = _GrowArray(np.int64)
        self._count = _GrowArray(np.int64)
        self._wlen = _GrowArray(np.int64)
        self._first_gaz = _GrowArray(bool)
        self._jitter = _GrowArray(np.float64)

    # live views (cheap slices of the growable buffers)
    @property
    def start(self) -> np.ndarray:
        return self._start.view

    @property
    def count(self) -> np.ndarray:
        return self._count.view

    @property
    def wlen(self) -> np.ndarray:
        return self._wlen.view

    @property
    def first_gaz(self) -> np.ndarray:
        return self._first_gaz.view

    @property
    def jitter(self) -> np.ndarray:
        return self._jitter.view

    def _add(self, word: str) -> int:
        if len(self.uid) >= self.cap:
            return -1
        ids, lens, _masks = self.tokenizer._encode_word(word)
        j = self._start.n
        self.uid[word] = j
        self._start.append(self._jitter.n)
        self._count.append(len(ids))
        self._wlen.append(sum(lens))
        self._first_gaz.append(word in self.scorer.index)
        jit = self.scorer.jitter_for
        self._jitter.extend([jit(pid) for pid in ids])
        return j

    def ensure(self, words: list[str]) -> np.ndarray:
        """Register all words; → uid per word (-1 = over cap)."""
        uid = self.uid
        inv = np.empty(len(words), np.int64)
        add = self._add
        for i, w in enumerate(words):
            j = uid.get(w)
            if j is None:
                j = add(w)
            inv[i] = j
        return inv

ENTITY_STRUCT = pa.struct(
    [
        ("sent_idx", pa.int32()),
        ("word", pa.string()),
        ("label", pa.string()),
        ("score", pa.float64()),
        ("begin", pa.int32()),
        ("end", pa.int32()),
    ]
)
ENTITY_LIST_TYPE = pa.list_(ENTITY_STRUCT)

TRIPLE_FIELDS = [
    ("doc_id", pa.string()),
    ("sent_idx", pa.int32()),
    ("subj", pa.string()),
    ("subj_label", pa.string()),
    ("subj_begin", pa.int32()),
    ("subj_end", pa.int32()),
    ("subj_score", pa.float64()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_label", pa.string()),
    ("obj_begin", pa.int32()),
    ("obj_end", pa.int32()),
    ("obj_score", pa.float64()),
    ("rel_score", pa.float64()),
]
TRIPLE_SCHEMA = pa.schema(TRIPLE_FIELDS)


class NerStage:
    """docs(doc_id, spans) → docs + entities list column."""

    def __init__(
        self,
        gazetteer: dict[str, str],
        max_length: int = 64,
        piece_len: int = 4,
        label_aggregation: str = AGG_FIRST,
        memo_cap: int = 200_000,
        tokenizer=None,
        scorer=None,
        scorer_weights=None,
    ):
        # ``tokenizer``/``scorer`` are injectable (the reference's
        # new_with_tokenizer + ModelResource hooks, SURVEY.md §2.10): any
        # object with .encode() / .tag_words()+.logits_for_pieces() works.
        # ``scorer_weights`` (a path or ResourceProvider to an .npz) is
        # the serialized-model boundary: the load happens HERE, once per
        # actor — NerStage is the map_batches actor class, so a weights
        # file is fetched/parsed per pool member, never shipped through
        # the driver's task closure (the reference's VarStore::load at
        # pipeline build, token_classification.rs:511-513).
        if scorer_weights is not None:
            if scorer is not None:
                raise ValueError("pass scorer OR scorer_weights, not both")
            from rust_bert_ray.scorers import TensorTagScorer

            scorer = TensorTagScorer.from_npz(scorer_weights)
        self.tokenizer = tokenizer or SubwordTokenizer(piece_len=piece_len)
        self.scorer = scorer or DeterministicTagScorer(gazetteer)
        self.max_length = max_length
        self.label_aggregation = label_aggregation
        self.memo: dict[str, list[Entity]] = {}
        self.memo_cap = memo_cap
        # Batch-flat fast decode applies only to the default stack: the
        # built-in tokenizer (contiguous piece offsets, no lowercasing),
        # a BIO-only DeterministicTagScorer, and a label aggregation
        # that is invariant when every sub-token of a word carries the
        # same label (First/Last/Mode — this scorer tags per word, so
        # all three collapse to the word tag).  Injected backends and
        # custom aggregations take the per-text reference path.
        self._fast = (
            tokenizer is None
            and scorer is None
            and label_aggregation in (AGG_FIRST, AGG_LAST, AGG_MODE)
            and getattr(self.scorer, "supports_bio_fast", False)
        )
        if self._fast:
            self._splitter = BatchWordSplitter()
            self._pieces = _PieceCache(self.tokenizer, self.scorer)
        # Batched-tensor backend (torch/ONNX boundary): a scorer exposing
        # ``forward(input_ids, attention_mask, tag_ids)`` gets ONE padded
        # call per map_batches invocation (pad-to-max-in-batch) instead
        # of per-feature logits_for_pieces.
        self._tensor = hasattr(self.scorer, "forward")

    def _entities_for_text(self, text: str) -> list[Entity]:
        cached = self.memo.get(text)
        if cached is not None:
            return cached
        enc = self.tokenizer.encode(text)
        # word-level tags once per text (the scorer's view of "weights")
        word_tags = self.scorer.tag_words(enc.words or [])
        if all(t == "O" for t in word_tags):
            # exact shortcut: all-O spans decode to zero entities
            # (consolidation keeps labels, chunker emits nothing) — skip
            # windowing and the per-position decode for the no-entity case
            if len(self.memo) < self.memo_cap:
                self.memo[text] = []
            return []
        features = generate_features(enc, example_index=0, max_length=self.max_length)

        tokens: list[Token] = []
        for f in features:
            logits = self.scorer.logits_for_pieces(
                word_tags, f.word_indices, f.input_ids
            )
            probs = softmax(logits, axis=-1)
            label_ids = probs.argmax(axis=-1)
            for pos in range(len(f.input_ids)):
                if f.masks[pos] == MASK_SPECIAL or not f.reference_feature[pos]:
                    continue
                li = int(label_ids[pos])
                b, e = f.offsets[pos]
                tokens.append(
                    Token(
                        text=text[b:e],
                        score=float(probs[pos, li]),
                        label=NER_LABELS[li],
                        label_index=li,
                        sentence=0,
                        index=pos,
                        word_index=f.word_indices[pos],
                        offset=(b, e),
                        mask=f.masks[pos],
                    )
                )
        merged = consolidate_tokens(tokens, self.label_aggregation)
        entities = consolidate_entities(merged)
        if len(self.memo) < self.memo_cap:
            self.memo[text] = entities
        return entities

    # --------------------------------------------------- batch-flat decode

    def _decode_texts_fast(
        self, texts: list[str], results: list[list[Entity] | None]
    ) -> None:
        """Vectorized single-window decode; fills ``results`` in place.

        Texts it cannot take (splitter disagreement, word-cache
        overflow, multi-window length) are left as ``None`` for the
        caller's per-text path.  Everything here is flat numpy over the
        whole text set; Entity objects are built only for surviving
        spans.  Bit-equality with ``_entities_for_text`` is enforced by
        tests/test_vector_decode.py.
        """
        split = self._splitter.split(texts)
        if split is None:
            return
        words, begins, tid = split
        nt = len(texts)
        uids = self._pieces.ensure(words)
        cache = self._pieces
        known = uids >= 0
        # word-index range of each text: tid is ascending
        t_last = np.searchsorted(tid, np.arange(nt), side="right") - 1
        text_last_word = t_last[tid]
        cand = np.flatnonzero(known & cache.first_gaz[np.maximum(uids, 0)])
        tags = self.scorer.tag_word_ids_flat(words, cand, text_last_word)

        has_ent = np.zeros(nt, dtype=bool)
        has_ent[tid[tags > 0]] = True
        text_known = np.ones(nt, dtype=bool)
        text_known[tid[~known]] = False
        counts_all = np.where(known, cache.count[np.maximum(uids, 0)], 0)
        ppt = np.bincount(tid, weights=counts_all, minlength=nt).astype(np.int64)
        single = ppt <= (self.max_length - 2)
        fast_text = has_ent & single & text_known
        for i in np.flatnonzero(~has_ent & text_known).tolist():
            results[i] = []
        if not fast_text.any():
            return

        # ---- subset arrays over words of fast texts
        ws = fast_text[tid]
        gsel = np.flatnonzero(ws)
        uids_s = uids[gsel]
        tags_s = tags[gsel].astype(np.int64)
        begins_s = begins[gsel]
        tid_s = tid[gsel]
        counts_s = cache.count[uids_s]
        wend_s = begins_s + cache.wlen[uids_s]

        # ---- probabilities for pieces of non-O words only
        nz_w = np.flatnonzero(tags_s > 0)
        cnt_nz = counts_s[nz_w]
        tot = int(cnt_nz.sum())
        src0 = np.repeat(cache.start[uids_s[nz_w]], cnt_nz)
        cum = np.cumsum(cnt_nz)
        within = np.arange(tot) - np.repeat(cum - cnt_nz, cnt_nz)
        pj = cache.jitter[src0 + within]
        ptag = np.repeat(tags_s[nz_w], cnt_nz)
        probs = self.scorer.probs_np(ptag, pj)
        # word score = ∏ p over the word's pieces (all agree on the tag,
        # so the dissent factor (1-p) never applies — consolidate.py:103)
        word_score_nz = np.multiply.reduceat(probs, cum - cnt_nz)

        # ---- vectorized BIO chunking over word-level labels
        first_of_text = np.zeros(len(gsel), dtype=bool)
        if len(gsel):
            first_of_text[0] = True
            first_of_text[1:] = tid_s[1:] != tid_s[:-1]
        nz, run_start, run_end = bio_runs(tags_s, np.flatnonzero(first_of_text))
        # nz indexes non-O words in order == nz_w
        ent_score = np.multiply.reduceat(word_score_nz, run_start)
        first_w = nz[run_start]
        last_w = nz[run_end]
        typ = (tags_s[first_w] + 1) // 2
        ent_begin = begins_s[first_w]
        ent_end = wend_s[last_w]
        ent_text = tid_s[first_w]

        words_obj = words
        ent_words = []
        for k in range(len(run_start)):
            lo, hi = run_start[k], run_end[k] + 1
            ent_words.append(
                " ".join(words_obj[gsel[nz[m]]] for m in range(lo, hi))
            )
        # group entities by text (ent_text ascending by construction)
        fast_idx = np.flatnonzero(fast_text)
        bounds = np.searchsorted(ent_text, fast_idx, side="left")
        bounds_hi = np.searchsorted(ent_text, fast_idx, side="right")
        for pos, i in enumerate(fast_idx.tolist()):
            lo, hi = int(bounds[pos]), int(bounds_hi[pos])
            results[i] = [
                Entity(
                    word=ent_words[k],
                    score=float(ent_score[k]),
                    label=ENTITY_TYPE_NAMES[typ[k]],
                    offset=(int(ent_begin[k]), int(ent_end[k])),
                )
                for k in range(lo, hi)
            ]

    def _entities_for_texts(self, texts: list[str]) -> list[list[Entity]]:
        """Memo → batch-flat fast decode → per-text fallback."""
        out: list[list[Entity] | None] = [None] * len(texts)
        todo_idx: list[int] = []
        todo_texts: list[str] = []
        memo = self.memo
        for i, t in enumerate(texts):
            cached = memo.get(t)
            if cached is not None:
                out[i] = cached
            else:
                todo_idx.append(i)
                todo_texts.append(t)
        if todo_texts:
            sub: list[list[Entity] | None] = [None] * len(todo_texts)
            if self._fast:
                self._decode_texts_fast(todo_texts, sub)
            elif self._tensor:
                self._decode_texts_tensor(todo_texts, sub)
            for j, ents in enumerate(sub):
                if ents is None:
                    ents = self._entities_for_text(todo_texts[j])
                else:
                    if len(memo) < self.memo_cap:
                        memo[todo_texts[j]] = ents
                out[todo_idx[j]] = ents
        return out  # type: ignore[return-value]

    # ------------------------------------------- batched-tensor backend

    def _decode_texts_tensor(
        self, texts: list[str], results: list[list[Entity] | None]
    ) -> None:
        """One padded forward pass for ALL windows of the batch.

        Dynamic per-batch padding (reference token_classification.rs:
        1044-1090): T = longest window in this batch, not a fixed
        max_length — short batches cost short tensors.  Per-row softmax
        is independent of padding rows, so floats are bit-identical to
        ``_entities_for_text``; tests/test_tensor_backend.py asserts
        field-level equality against the reference path.
        """
        # A deterministic stand-in scorer exposes ``tag_words`` (the
        # all-O shortcut + the tag_ids side-channel it derives logits
        # from); a REAL serialized-model backend (OnnxTagScorer — the
        # reference's ModelResource::ONNX slot) computes logits from
        # input_ids alone, so tag_words is optional here and tag_ids
        # stays all-O for it (forward() ignores it by contract).
        has_tags = hasattr(self.scorer, "tag_words")
        feats: list[tuple[int, object, list[str] | None]] = []
        for i, text in enumerate(texts):
            enc = self.tokenizer.encode(text)
            word_tags = None
            if has_tags:
                word_tags = self.scorer.tag_words(enc.words or [])
                if all(t == "O" for t in word_tags):
                    results[i] = []  # same all-O shortcut as the reference path
                    continue
            n_before = len(feats)
            for f in generate_features(
                enc, example_index=0, max_length=self.max_length
            ):
                feats.append((i, f, word_tags))
            if not has_tags and len(feats) == n_before:
                # no features (empty text) and no per-text fallback
                # available for a forward-only backend
                results[i] = []
        if not feats:
            return
        B = len(feats)
        T = max(len(f.input_ids) for _, f, _ in feats)
        input_ids = np.zeros((B, T), dtype=np.int64)
        attention = np.zeros((B, T), dtype=bool)
        tag_ids = np.zeros((B, T), dtype=np.int8)
        for r, (_, f, wt) in enumerate(feats):
            n = len(f.input_ids)
            input_ids[r, :n] = f.input_ids
            attention[r, :n] = True
            if wt is not None:
                for pos, w in enumerate(f.word_indices):
                    tag_ids[r, pos] = NER_LABEL_INDEX[wt[w] if w >= 0 else "O"]

        logits = self.scorer.forward(input_ids, attention, tag_ids)

        tokens_of: dict[int, list[Token]] = {}
        for r, (i, f, _) in enumerate(feats):
            n = len(f.input_ids)
            probs = softmax(logits[r, :n], axis=-1)
            label_ids = probs.argmax(axis=-1)
            toks = tokens_of.setdefault(i, [])
            text = texts[i]
            for pos in range(n):
                if f.masks[pos] == MASK_SPECIAL or not f.reference_feature[pos]:
                    continue
                li = int(label_ids[pos])
                b, e = f.offsets[pos]
                toks.append(
                    Token(
                        text=text[b:e],
                        score=float(probs[pos, li]),
                        label=NER_LABELS[li],
                        label_index=li,
                        sentence=0,
                        index=pos,
                        word_index=f.word_indices[pos],
                        offset=(b, e),
                        mask=f.masks[pos],
                    )
                )
        for i, toks in tokens_of.items():
            merged = consolidate_tokens(toks, self.label_aggregation)
            results[i] = consolidate_entities(merged)

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        flat = pc.list_flatten(spans_col)
        parent = pc.list_parent_indices(spans_col).to_numpy(zero_copy_only=False)
        kind = flat.field("kind")
        txt = flat.field("text")
        keep = pc.and_(pc.equal(kind, "text"), pc.not_equal(txt, ""))
        sel = np.flatnonzero(keep.to_numpy(zero_copy_only=False))
        texts = pc.take(txt, pa.array(sel)).to_pylist()
        sent_off = flat.field("offset").to_numpy(zero_copy_only=False)[sel]
        doc_of_text = parent[sel]

        per_text = self._entities_for_texts(texts)

        n_ent = sum(len(e) for e in per_text)
        col_sent = np.empty(n_ent, dtype=np.int32)
        col_word: list[str] = []
        col_label: list[str] = []
        col_score = np.empty(n_ent, dtype=np.float64)
        col_begin = np.empty(n_ent, dtype=np.int32)
        col_end = np.empty(n_ent, dtype=np.int32)
        k = 0
        for i, ents in enumerate(per_text):
            s = sent_off[i]
            for e in ents:
                col_sent[k] = s
                col_word.append(e.word)
                col_label.append(e.label)
                col_score[k] = e.score
                col_begin[k] = e.offset[0]
                col_end[k] = e.offset[1]
                k += 1
        counts = np.bincount(
            doc_of_text,
            weights=np.fromiter(
                map(len, per_text), dtype=np.float64, count=len(per_text)
            ),
            minlength=batch.num_rows,
        ).astype(np.int64)
        offsets = np.zeros(batch.num_rows + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        struct_arr = pa.StructArray.from_arrays(
            [
                pa.array(col_sent, type=pa.int32()),
                pa.array(col_word, type=pa.string()),
                pa.array(col_label, type=pa.string()),
                pa.array(col_score, type=pa.float64()),
                pa.array(col_begin, type=pa.int32()),
                pa.array(col_end, type=pa.int32()),
            ],
            fields=list(ENTITY_STRUCT),
        )
        list_arr = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct_arr)
        return batch.append_column("entities", list_arr)


class RelationStage:
    """docs+entities → exploded (subj, pred, obj) candidate triple rows.

    Sequence-classification semantics (softmax + argmax over predicate
    logits, /root/reference/src/pipelines/sequence_classification.rs:745-752)
    applied to each ordered entity pair within one text span; candidates
    scoring ``no_relation`` or below ``min_score`` are dropped.  Entirely
    row-local — no shuffle.
    """

    def __init__(self, min_score: float = 0.5, memo_cap: int = 500_000):
        self.scorer = DeterministicRelationScorer()
        self.min_score = min_score
        self.memo: dict[tuple[str, str, str], tuple[str, float]] = {}
        self.memo_cap = memo_cap

    def _classify(self, gap: str, s_label: str, o_label: str) -> tuple[str, float]:
        key = (gap, s_label, o_label)
        cached = self.memo.get(key)
        if cached is not None:
            return cached
        logits = self.scorer.logits_for_pair(gap, s_label, o_label)
        probs = softmax(logits)
        idx = int(probs.argmax())
        out = (PREDICATES[idx], float(probs[idx]))
        if len(self.memo) < self.memo_cap:
            self.memo[key] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Arrow-flattened pair generation: entities and spans are read
        via ``list_flatten`` + numpy (no per-row Python dicts); the only
        Python loop is over (doc, sent) groups — the same pair algebra,
        with the gap-keyed classification memo unchanged."""
        doc_ids = batch.column("doc_id").to_pylist()
        ents_col = batch.column("entities")
        if isinstance(ents_col, pa.ChunkedArray):
            ents_col = ents_col.combine_chunks()
        ent = pc.list_flatten(ents_col)
        e_parent = pc.list_parent_indices(ents_col).to_numpy(zero_copy_only=False)
        e_sent = ent.field("sent_idx").to_numpy(zero_copy_only=False)
        e_begin = ent.field("begin").to_numpy(zero_copy_only=False)

        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        sflat = pc.list_flatten(spans_col)
        s_parent = pc.list_parent_indices(spans_col).to_numpy(zero_copy_only=False)
        s_kind = sflat.field("kind")
        tsel = np.flatnonzero(pc.equal(s_kind, "text").to_numpy(zero_copy_only=False))
        s_texts = pc.take(sflat.field("text"), pa.array(tsel)).to_pylist()
        s_off = sflat.field("offset").to_numpy(zero_copy_only=False)[tsel]
        text_of = {
            (int(d), int(o)): t
            for d, o, t in zip(s_parent[tsel].tolist(), s_off.tolist(), s_texts)
        }

        # sort entities by (doc, sent, begin) — stable, matching the
        # legacy per-group begin sort; pair semantics are order-local
        order = np.lexsort((e_begin, e_sent, e_parent))
        p_s = e_parent[order]
        sent_s = e_sent[order]
        key = (p_s.astype(np.int64) << 32) | sent_s.astype(np.int64)
        if len(key):
            gb = np.flatnonzero(np.diff(key)) + 1
            g_start = np.concatenate(([0], gb)).tolist()
            g_end = np.concatenate((gb, [len(key)])).tolist()
        else:
            g_start, g_end = [], []
        take_idx = pa.array(order)
        word_l = pc.take(ent.field("word"), take_idx).to_pylist()
        label_l = pc.take(ent.field("label"), take_idx).to_pylist()
        score_l = ent.field("score").to_numpy(zero_copy_only=False)[order].tolist()
        begin_l = e_begin[order].tolist()
        end_l = ent.field("end").to_numpy(zero_copy_only=False)[order].tolist()
        parent_l = p_s.tolist()
        sent_l = sent_s.tolist()

        rows: dict[str, list] = {name: [] for name, _ in TRIPLE_FIELDS}
        classify = self._classify
        min_score = self.min_score
        for s, e in zip(g_start, g_end):
            if e - s < 2:
                continue
            doc_row = parent_l[s]
            sent_idx = sent_l[s]
            text = text_of.get((doc_row, sent_idx), "")
            doc_id = doc_ids[doc_row]
            for i in range(s, e):
                for j in range(i + 1, e):
                    gap = text[end_l[i] : begin_l[j]]
                    pred, score = classify(gap, label_l[i], label_l[j])
                    if pred == "no_relation" or score < min_score:
                        continue
                    rows["doc_id"].append(doc_id)
                    rows["sent_idx"].append(sent_idx)
                    rows["subj"].append(word_l[i])
                    rows["subj_label"].append(label_l[i])
                    rows["subj_begin"].append(begin_l[i])
                    rows["subj_end"].append(end_l[i])
                    rows["subj_score"].append(score_l[i])
                    rows["pred"].append(pred)
                    rows["obj"].append(word_l[j])
                    rows["obj_label"].append(label_l[j])
                    rows["obj_begin"].append(begin_l[j])
                    rows["obj_end"].append(end_l[j])
                    rows["obj_score"].append(score_l[j])
                    rows["rel_score"].append(score)
        return pa.Table.from_pydict(rows, schema=TRIPLE_SCHEMA)
