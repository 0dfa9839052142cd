"""Pluggable scorer backends (the "model" layer).

The reference hosts libtorch transformer weights behind each pipeline
(e.g. /root/reference/src/pipelines/token_classification.rs:348-534).  In
this engine the model is a *protocol*: any object with the right scoring
method can back a stage, so a GPU torch backend is a drop-in replacement
for the deterministic backends below.  The deterministic backends produce
logits (not final labels), and every downstream step — softmax, argmax,
score extraction, consolidation, chunking — runs the reference's decode
algebra unchanged, so correctness tests exercise the full path.

All randomness is hash-derived (crc32) → identical across processes,
actors and runs; Ray task retries are therefore idempotent.
"""

from __future__ import annotations

import zlib

import numpy as np

from rust_bert_ray.decode.pooling import l2_normalize, pool

NER_LABELS = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC"]
NER_LABEL_INDEX = {l: i for i, l in enumerate(NER_LABELS)}


def _crc(s: str) -> int:
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def softmax(logits: np.ndarray, axis: int = -1) -> np.ndarray:
    """exp/Σexp — token_classification.rs:991-995."""
    x = logits - logits.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


class DeterministicTagScorer:
    """Word-level BIO tagger driven by a gazetteer (stands in for trained
    token-classification weights).

    Greedy longest-match over word sequences; matched surfaces get
    ``B-X``/``I-X`` logits, everything else ``O``.  Logit magnitudes carry
    a small hash jitter so consolidation score products are non-trivial.
    """

    BASE_LOGIT = 5.0

    def __init__(self, gazetteer: dict[str, str]):
        self.max_words = max(len(s.split()) for s in gazetteer) if gazetteer else 1
        # index: first word -> [(word_tuple, label)] sorted longest-first
        self.index: dict[str, list[tuple[tuple[str, ...], str]]] = {}
        for surface, label in gazetteer.items():
            parts = tuple(surface.split())
            self.index.setdefault(parts[0], []).append((parts, label))
        for v in self.index.values():
            v.sort(key=lambda e: -len(e[0]))

    def tag_words(self, words: list[str]) -> list[str]:
        tags = ["O"] * len(words)
        i = 0
        n = len(words)
        while i < n:
            matched = False
            for parts, label in self.index.get(words[i], ()):
                if tuple(words[i : i + len(parts)]) == parts:
                    tags[i] = f"B-{label}"
                    for j in range(i + 1, i + len(parts)):
                        tags[j] = f"I-{label}"
                    i += len(parts)
                    matched = True
                    break
            if not matched:
                i += 1
        return tags

    _jitter_cache: dict[int, float] = {}

    def jitter_for(self, pid: int) -> float:
        """Deterministic per-piece-id logit jitter (crc-derived)."""
        jc = self._jitter_cache
        jitter = jc.get(pid)
        if jitter is None:
            jitter = (_crc(str(pid)) % 97) / 1000.0
            if len(jc) < 1_000_000:
                jc[pid] = jitter
        return jitter

    def logits_for_pieces(
        self, word_tags: list[str], word_indices: list[int], piece_ids: list[int]
    ) -> np.ndarray:
        """[n_pieces, n_labels] logits; specials (word_index<0) stay "O"-ish."""
        n = len(word_indices)
        logits = np.zeros((n, len(NER_LABELS)), dtype=np.float64)
        for pos in range(n):
            w = word_indices[pos]
            tag = word_tags[w] if w >= 0 else "O"
            logits[pos, NER_LABEL_INDEX[tag]] = self.BASE_LOGIT + self.jitter_for(
                piece_ids[pos]
            )
        return logits

    # ------------------------------------------------ vectorized fast path

    @property
    def supports_bio_fast(self) -> bool:
        """True when every gazetteer label has B-/I- ids in NER_LABELS —
        the precondition for the batch-flat decode in stages/ner.py."""
        labels = {label for entries in self.index.values() for _, label in entries}
        return all(
            f"B-{label}" in NER_LABEL_INDEX and f"I-{label}" in NER_LABEL_INDEX
            for label in labels
        )

    def tag_word_ids_flat(
        self,
        words: list[str],
        cand_idx: np.ndarray,
        text_last_word: np.ndarray,
    ) -> np.ndarray:
        """``tag_words`` over a flat batch word stream → NER label ids.

        ``cand_idx``: sorted indices whose surface is a gazetteer first
        word (others can never start a match); ``text_last_word[i]``:
        index of the last word in i's text (matches never cross texts).
        Greedy longest-match left-to-right, identical to ``tag_words``.
        """
        tags = np.zeros(len(words), dtype=np.int8)
        next_free = 0
        index = self.index
        for i in cand_idx.tolist():
            if i < next_free:
                continue
            entries = index.get(words[i])
            if not entries:
                continue
            limit = int(text_last_word[i])
            for parts, label in entries:
                ln = len(parts)
                if i + ln - 1 > limit:
                    continue
                ok = True
                for k in range(1, ln):
                    if words[i + k] != parts[k]:
                        ok = False
                        break
                if ok:
                    tags[i] = NER_LABEL_INDEX[f"B-{label}"]
                    if ln > 1:
                        tags[i + 1 : i + ln] = NER_LABEL_INDEX[f"I-{label}"]
                    next_free = i + ln
                    break
        return tags

    def probs_np(self, tag_ids: np.ndarray, jitters: np.ndarray) -> np.ndarray:
        """Chosen-label softmax probabilities for piece rows.

        Builds the same per-row logits as ``logits_for_pieces`` (one
        positive entry ``BASE_LOGIT + jitter`` at the tag column, zeros
        elsewhere) and runs the identical row-wise softmax, so results
        are bit-equal to the per-text path.  The argmax of such a row
        is the tag column itself (the single positive logit), so the
        caller may use ``tag_ids`` directly as label ids.
        """
        k = len(tag_ids)
        logits = np.zeros((k, len(NER_LABELS)), dtype=np.float64)
        rows = np.arange(k)
        logits[rows, tag_ids] = self.BASE_LOGIT + jitters
        probs = softmax(logits, axis=-1)
        return probs[rows, tag_ids]


# predicate rules: (substring in the inter-entity gap, subj label, obj label)
RELATION_RULES: list[tuple[str, str, str, str]] = [
    ("live", "PER", "LOC", "lives_in"),
    ("is a city in", "LOC", "LOC", "located_in"),
    ("works for", "PER", "ORG", "works_for"),
    ("headquartered in", "ORG", "LOC", "headquartered_in"),
    ("about", "PER", "ORG", "affiliated_with"),
    ("visited", "PER", "LOC", "visited"),
]

PREDICATES = ["no_relation", "lives_in", "affiliated_with", "located_in",
              "works_for", "headquartered_in", "visited"]
PREDICATE_INDEX = {p: i for i, p in enumerate(PREDICATES)}


class DeterministicRelationScorer:
    """Sequence-classification head analog (softmax+argmax semantics of
    /root/reference/src/pipelines/sequence_classification.rs:729-770) over
    an entity-pair context window."""

    BASE_LOGIT = 4.0

    def logits_for_pair(
        self, gap_text: str, subj_label: str, obj_label: str
    ) -> np.ndarray:
        logits = np.zeros(len(PREDICATES), dtype=np.float64)
        for needle, s_lab, o_lab, pred in RELATION_RULES:
            if s_lab == subj_label and o_lab == obj_label and needle in gap_text:
                jitter = (_crc(gap_text) % 97) / 1000.0
                logits[PREDICATE_INDEX[pred]] = self.BASE_LOGIT + jitter
                break
        return logits


class HashEmbedder:
    """Deterministic sentence/mention embedder (sentence-embeddings analog).

    Per-word embeddings from hashed char 3-grams, pooled with the
    reference's pooling algebra (layers.rs:39-74 semantics via
    decode.pooling) and L2-normalized with the reference's 1e-12 clamp
    (pipeline.rs:403-411).  float32 output like ``Embedding = Vec<f32>``
    (sentence_embeddings/mod.rs:64).
    """

    def __init__(self, dim: int = 64, pooling: str = "mean", dense=None):
        # ``dense``: optional decode.pooling.Dense projection applied
        # between pooling and L2 normalization (the sentence-transformers
        # module order the reference follows, pipeline.rs:372-417)
        self.dim = dim
        self.pooling = pooling
        self.dense = dense
        # word-vector memo: _word_vec is deterministic, so caching across
        # texts/batches changes nothing but wall time (Zipfian words)
        self._word_cache: dict[str, np.ndarray] = {}

    def _word_vec(self, word: str) -> np.ndarray:
        v = self._word_cache.get(word)
        if v is not None:
            return v
        v = np.zeros(self.dim, dtype=np.float64)
        padded = f"#{word.lower()}#"
        for i in range(max(1, len(padded) - 2)):
            g = padded[i : i + 3]
            v[_crc(g) % self.dim] += 1.0
        if len(self._word_cache) < 200_000:
            self._word_cache[word] = v
        return v

    @property
    def out_dim(self) -> int:
        return self.dim if self.dense is None else self.dense.weight.shape[0]

    def embed(self, text: str) -> np.ndarray:
        words = text.split()
        if not words:
            return np.zeros(self.out_dim, dtype=np.float32)
        token_emb = np.stack([self._word_vec(w) for w in words])
        mask = np.ones(len(words))
        pooled = pool(token_emb, mask, self.pooling)
        if self.dense is not None:
            pooled = self.dense(pooled)
        return l2_normalize(pooled[None, :])[0].astype(np.float32)

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        """Batch-in/batch-out seam → ``(n, out_dim)`` float32.

        A real model (torch/ONNX) replaces this with ONE padded forward
        pass per batch; stages must call THIS, never a per-row loop, so
        the swap is a drop-in (VERDICT r3 item 5).  Floats are identical
        to ``[embed(t) for t in texts]`` — the word-vector memo is the
        only sharing and it is value-transparent.
        """
        out = np.zeros((len(texts), self.out_dim), dtype=np.float32)
        for i, text in enumerate(texts):
            out[i] = self.embed(text)
        return out


class TensorTagScorer(DeterministicTagScorer):
    """Batched-tensor token-classification backend (torch/ONNX stand-in).

    Exercises the one boundary a GPU model needs that the per-text
    deterministic path never did: the stage collects every window of a
    ``map_batches`` call, pads ``input_ids`` to the LONGEST window in
    the batch (dynamic per-batch padding — reference
    token_classification.rs:1044-1090, common.rs:2250-2297) and makes
    ONE ``forward(input_ids, attention_mask, tag_ids)`` call returning
    ``[B, T, n_labels]`` logits.  This numpy "model" reproduces the
    deterministic weights' algebra exactly (one positive logit
    ``BASE_LOGIT + jitter(piece_id)`` at the tag column), so every
    downstream float is bit-identical to the per-text reference path —
    backend-invariance is asserted by tests/test_tensor_backend.py.

    A real torch/ONNX backend implements the same ``forward`` signature
    from its own weights (ignoring ``tag_ids``, which stands in for
    what a trained model computes from ``input_ids``); swap it in via
    ``NerStage(scorer=...)`` + ``ner_ray_remote_args={"num_gpus": 1}``.
    """

    # ------------------------------------------- serialized weights ----
    # The reference's VarStore::load boundary (token_classification.rs:
    # 511-513: weights come from a FILE named by a ModelResource, loaded
    # once when the pipeline is built).  Here the scorer's "weights" are
    # the gazetteer table + the logit scale; a real torch/ONNX backend
    # stores its tensors the same way (one archive, validated label
    # head) and loads them in the same place — the actor __init__ via
    # ``NerStage(scorer_weights=...)``.

    WEIGHTS_FORMAT = "rbr-tag-scorer-v1"

    def save_npz(self, path: str) -> str:
        """Serialize this scorer's parameters to an ``.npz`` archive."""
        surfaces, labels = [], []
        for entries in self.index.values():
            for parts, label in entries:
                surfaces.append(" ".join(parts))
                labels.append(label)
        order = np.argsort(np.asarray(surfaces))
        np.savez(
            path,
            format=np.asarray(self.WEIGHTS_FORMAT),
            label_names=np.asarray(NER_LABELS),
            base_logit=np.float64(self.BASE_LOGIT),
            surfaces=np.asarray(surfaces)[order],
            labels=np.asarray(labels)[order],
        )
        return path

    @classmethod
    def from_npz(cls, resource) -> "TensorTagScorer":
        """Construct from serialized weights.

        ``resource`` is a local path OR any ResourceProvider
        (``get_local_path()`` — RemoteResource downloads/caches with
        sha256 + atomic rename, so a partial fetch never loads).  The
        label head is validated against this build's NER_LABELS: a
        weights file trained for a different label set must fail fast,
        never mis-index logit columns silently."""
        path = (
            resource.get_local_path()
            if hasattr(resource, "get_local_path")
            else resource
        )
        with np.load(path, allow_pickle=False) as z:
            fmt = str(z["format"])
            if fmt != cls.WEIGHTS_FORMAT:
                raise ValueError(
                    f"unsupported weights format {fmt!r}; expected "
                    f"{cls.WEIGHTS_FORMAT!r}"
                )
            label_names = [str(x) for x in z["label_names"]]
            if label_names != list(NER_LABELS):
                raise ValueError(
                    "weights label head does not match this build's "
                    f"NER_LABELS: {label_names} != {list(NER_LABELS)}"
                )
            gazetteer = {
                str(s): str(lab)
                for s, lab in zip(z["surfaces"], z["labels"])
            }
            base_logit = float(z["base_logit"])
        scorer = cls(gazetteer)
        scorer.BASE_LOGIT = base_logit
        return scorer

    def forward(
        self,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        tag_ids: np.ndarray,
    ) -> np.ndarray:
        """``int64[B,T] × bool[B,T] × int8[B,T] → float64[B,T,L]``."""
        B, T = input_ids.shape
        logits = np.zeros((B, T, len(NER_LABELS)), dtype=np.float64)
        b_idx, t_idx = np.nonzero(attention_mask)
        ids = input_ids[b_idx, t_idx]
        jit = np.fromiter(
            (self.jitter_for(int(p)) for p in ids),
            dtype=np.float64,
            count=len(ids),
        )
        logits[b_idx, t_idx, tag_ids[b_idx, t_idx]] = self.BASE_LOGIT + jit
        return logits


class HeuristicTagScorer:
    """Second token-classification backend: capitalization/shape heuristics
    instead of a gazetteer — demonstrates that NerStage is genuinely
    scorer-agnostic (SURVEY.md §2.10 extension surface).

    Tags capitalized words (not sentence-initial) as entities; runs of
    capitalized words become B/I chunks.  Kind heuristics: known corporate
    suffixes → ORG, else PER for two-word runs, LOC for singles.  Not
    oracle-grade — used to exercise the pluggable-backend path in tests.
    """

    BASE_LOGIT = 5.0
    ORG_SUFFIX = {"Corp", "Inc", "Ltd", "Group", "Industries", "Systems", "Bank"}

    def tag_words(self, words: list[str]) -> list[str]:
        n = len(words)
        tags = ["O"] * n
        sentence_start = True
        i = 0
        while i < n:
            w = words[i]
            is_cap = w[:1].isupper() and w[1:].islower() and len(w) > 1
            if is_cap and not sentence_start:
                j = i
                while j + 1 < n and words[j + 1][:1].isupper() and len(words[j + 1]) > 1:
                    j += 1
                run = words[i : j + 1]
                if run[-1] in self.ORG_SUFFIX:
                    kind = "ORG"
                elif len(run) >= 2:
                    kind = "PER"
                else:
                    kind = "LOC"
                tags[i] = f"B-{kind}"
                for k in range(i + 1, j + 1):
                    tags[k] = f"I-{kind}"
                i = j + 1
                sentence_start = False
                continue
            sentence_start = w in {".", "!", "?"}
            i += 1
        return tags

    # logits identical in shape to DeterministicTagScorer's
    logits_for_pieces = DeterministicTagScorer.logits_for_pieces
    jitter_for = DeterministicTagScorer.jitter_for
    _jitter_cache = {}
