"""Single-process expected-output tables — the oracle side for queries
whose semantics DuckDB SQL cannot express.

The driver's correctness gate runs each ``queries()`` entry AND its
``oracle_sql()`` side by side.  For deterministic-but-non-SQL operators
(heuristic NLP stages, sketch/LSH dedup, ANN) the oracle is an
*expected table*: computed here once, WITHOUT Ray — stages are invoked
over one in-memory Arrow table (every stage is per-row deterministic),
and sketch/ANN expectations are recomputed with independent flat-numpy
implementations over the full corpus (no banding shuffle, no bucketed
map_groups, no actor pools).  The table is written under
``/tmp/rbr_expected/<sf>/<query>.parquet`` and the oracle SQL is
``SELECT * FROM read_parquet(...)``.

What the gate then verifies: the distributed Ray execution — actor
pools, batch boundaries, all-to-all shuffles, bucketed merges, salted
two-phase reductions — reproduces the sequential run value-for-value.
Partitioning bugs (a pair lost in a band shuffle, a group split across
buckets, batch-boundary state leaks) flip the hash.

Regeneration is idempotent via a versioned marker; bump ``VERSION``
whenever any algorithm constant changes.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rust_bert_ray.functions.util import embedding_matrix

EXPECTED_ROOT = "/tmp/rbr_expected"
VERSION = 43  # bump whenever any builder's semantics change OR a builder is added


# ------------------------------------------------------------ input helpers

def _documents(sf_dir: str) -> pa.Table:
    return pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def _embeddings(sf_dir: str) -> pa.Table:
    return pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _corpus_docs(corpus_root: str) -> pa.Table:
    import pyarrow.dataset as pads

    return pads.dataset(os.path.join(corpus_root, "docs")).to_table()


def emb_digest(vec: np.ndarray) -> int:
    """Stable digest of a float32 embedding (bit-exact across processes)."""
    return zlib.crc32(np.asarray(vec, dtype=np.float32).tobytes())


def offsets_str(offsets) -> str:
    return ";".join(f"{b}-{e}" for b, e in offsets)


# ------------------------------------------- generation oracle (independent)
# Straight-line re-derivation of the decode semantics from the reference
# (generation_utils.rs:555-614 top-k/p, :948-963 greedy, :1059-1591 beam,
# :2294-2365 BeamHypotheses) — does NOT import rust_bert_ray.stages.generation,
# so an algorithmic bug in the stage cannot reproduce on the oracle side.

_GEN_EOS = "</s>"
_GEN_VOCAB = [
    "data", "table", "row", "batch", "stream", "query", "join", "merge",
    "fast", "slow", "window", "sort", "hash", "scan", "group", "value",
    _GEN_EOS,
]


def _gen_logits(tokens: list[str], vocab: list[str], eos_id: int) -> np.ndarray:
    """The deterministic bigram LM contract: crc32-derived next-token
    logits over the fixed vocab, with EOS pressure growing with length."""
    ctx = "\x00".join(tokens[-2:])
    out = np.empty(len(vocab), dtype=np.float64)
    for i, tok in enumerate(vocab):
        out[i] = (
            (zlib.crc32(f"{ctx}|{tok}".encode("utf-8")) & 0xFFFFFFFF) % 1000
        ) / 100.0
    out[eos_id] += 0.02 * len(tokens)
    return out


def _gen_banned_ngrams(tokens: list[str], n: int) -> set[str]:
    """Tokens completing an already-seen n-gram (no_repeat_ngram_size)."""
    if n <= 0 or len(tokens) < n - 1:
        return set()
    prefix = tuple(tokens[-(n - 1):]) if n > 1 else ()
    banned: set[str] = set()
    for i in range(len(tokens) - n + 1):
        if tuple(tokens[i : i + n - 1]) == prefix:
            banned.add(tokens[i + n - 1])
    return banned


def _gen_step_logits(
    tokens: list[str],
    vocab: list[str],
    eos_id: int,
    *,
    min_length: int = 0,
    no_repeat: int = 0,
) -> np.ndarray:
    logits = _gen_logits(tokens, vocab, eos_id)
    if min_length and len(tokens) < min_length:
        logits[eos_id] = -np.inf
    if no_repeat:
        banned = _gen_banned_ngrams(tokens, no_repeat)
        for i, tok in enumerate(vocab):
            if tok in banned:
                logits[i] = -np.inf
    return logits


def _gen_greedy(
    prompt: str,
    vocab: list[str],
    *,
    max_length: int,
    min_length: int = 0,
    no_repeat: int = 0,
    forced_bos: str | None = None,
) -> str:
    eos_id = len(vocab) - 1
    tokens = prompt.split() if prompt else []
    n_prompt = len(tokens)
    for step in range(max_length):
        if forced_bos is not None and step == 0:
            tok = forced_bos
        else:
            logits = _gen_step_logits(
                tokens, vocab, eos_id, min_length=min_length, no_repeat=no_repeat
            )
            tok = vocab[int(np.argmax(logits))]
        if tok == _GEN_EOS:
            break
        tokens.append(tok)
    return " ".join(tokens[n_prompt:])


def _gen_beam(
    prompt: str,
    vocab: list[str],
    *,
    num_beams: int,
    max_length: int,
    min_length: int = 0,
    no_repeat: int = 0,
    length_penalty: float = 1.0,
    early_stopping: bool = True,
) -> str:
    """Beam search per generation_utils.rs:1059-1591 + 2294-2365: per
    beam keep the top 2×num_beams successors by log-prob, globally rank,
    retire EOS hypotheses into a best-k pool scored by
    ``logp / len**length_penalty``, stop when the pool can no longer
    improve."""
    eos_id = len(vocab) - 1
    prompt_tokens = prompt.split() if prompt else []
    beams: list[tuple[list[str], float]] = [(list(prompt_tokens), 0.0)]
    pool: list[tuple[float, list[str], float]] = []  # (score, tokens, logp)

    def pool_add(tokens: list[str], logp: float) -> None:
        score = logp / max(1, len(tokens)) ** length_penalty
        pool.append((score, tokens, logp))
        pool.sort(key=lambda t: -t[0])
        if len(pool) > num_beams:
            pool.pop()

    for _step in range(max_length):
        candidates: list[tuple[list[str], float]] = []
        for toks, logp in beams:
            logits = _gen_step_logits(
                toks, vocab, eos_id, min_length=min_length, no_repeat=no_repeat
            )
            lp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
            for idx in np.argsort(-lp)[: 2 * num_beams]:
                candidates.append((toks + [vocab[int(idx)]], logp + float(lp[idx])))
        candidates.sort(key=lambda c: -c[1])
        beams = []
        for ctoks, clogp in candidates:
            if ctoks[-1] == _GEN_EOS:
                pool_add(ctoks[:-1], clogp)
            else:
                beams.append((ctoks, clogp))
            if len(beams) >= num_beams:
                break
        if not beams:
            break
        best_possible = max(lp for _, lp in beams) / max(
            1, len(beams[0][0])
        ) ** length_penalty
        if len(pool) >= num_beams and (
            early_stopping or pool[-1][0] >= best_possible
        ):
            break
    for toks, logp in beams:
        pool_add(toks, logp)
    best = pool[0][1]
    return " ".join(best[len(prompt_tokens):])


def _gen_table(doc_ids: list[int], outs: list[str]) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "generated": pa.array(outs, type=pa.string()),
            "n_tokens": pa.array(
                [len(o.split()) if o else 0 for o in outs], type=pa.int32()
            ),
        }
    )


def q_generate(sf_dir: str, corpus_root: str) -> pa.Table:
    t = _documents(sf_dir).slice(0, 200)
    outs = [
        _gen_greedy(
            " ".join(text.split()[:4]), _GEN_VOCAB, max_length=16, no_repeat=3
        )
        for text in t.column("text").to_pylist()
    ]
    return _gen_table(t.column("doc_id").to_pylist(), outs)


def q_summarize(sf_dir: str, corpus_root: str) -> pa.Table:
    t = _documents(sf_dir).slice(0, 200)
    outs = [
        _gen_beam(
            "summarize: " + " ".join(text.split()[:4]),
            _GEN_VOCAB,
            num_beams=3,
            min_length=6,
            max_length=14,
            no_repeat=3,
        )
        for text in t.column("text").to_pylist()
    ]
    return _gen_table(t.column("doc_id").to_pylist(), outs)


def q_translate(sf_dir: str, corpus_root: str) -> pa.Table:
    # marian family: ">>fr<< " text prefix, no forced BOS
    t = _documents(sf_dir).slice(0, 200)
    outs = [
        _gen_greedy(
            ">>fr<< " + " ".join(text.split()[:4]), _GEN_VOCAB, max_length=12
        )
        for text in t.column("text").to_pylist()
    ]
    return _gen_table(t.column("doc_id").to_pylist(), outs)


def q_translate_m2m(sf_dir: str, corpus_root: str) -> pa.Table:
    # m2m100 family: ">>en.<< " prefix + forced decoder BOS ">>de.<<",
    # which must be id-resolvable → vocab extended with the lang token
    vocab = _GEN_VOCAB[:-1] + [">>de.<<", _GEN_EOS]
    t = _documents(sf_dir).slice(0, 200)
    outs = [
        _gen_greedy(
            ">>en.<< " + " ".join(text.split()[:4]),
            vocab,
            max_length=12,
            forced_bos=">>de.<<",
        )
        for text in t.column("text").to_pylist()
    ]
    return _gen_table(t.column("doc_id").to_pylist(), outs)


def q_pos_tags(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent of the stage's subword machinery: words come straight
    from the regex (no piece encoding / word reconstruction), so the
    oracle checks the Ray stage's tokenize→reconstruct path, not just
    its distribution.  The rule table itself is shared (single source
    of truth); the decode around it is re-derived."""
    import re

    from rust_bert_ray.scorers import softmax
    from rust_bert_ray.stages.pos import (
        POS_SCHEMA,
        POS_TAGS,
        _word_logits,
        is_punctuation,
    )

    word_re = re.compile(r"(?u)\w+|[^\w\s]")
    t = _documents(sf_dir)
    rows: dict[str, list] = {n: [] for n in POS_SCHEMA.names}
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        for m in word_re.finditer(text):
            word = m.group(0)
            probs = softmax(_word_logits(word))
            li = int(probs.argmax())
            label, score = POS_TAGS[li], float(probs[li])
            if score < 0.5 and is_punctuation(word):
                label, score = ".", 1.0
            rows["doc_id"].append(doc_id)
            rows["word"].append(word)
            rows["label"].append(label)
            rows["score"].append(round(score, 5))
            rows["begin"].append(m.start())
            rows["end"].append(m.end())
    return pa.Table.from_pydict(rows, schema=POS_SCHEMA)


def embed_projection(t: pa.Table, embedder) -> pa.Table:
    """Hash-friendly scalar projection of an embedding batch: leading 4
    components + full-vector digest + norm.  Shared by the Ray query and
    the expected builder so both sides compute the identical floats."""
    from rust_bert_ray.functions.util import round_ha

    embs = embedder.embed_batch(t.column("text").to_pylist())
    embs32 = np.asarray(embs, dtype=np.float32)
    return pa.Table.from_pydict(
        {
            "doc_id": t.column("doc_id"),
            "e0": pa.array(round_ha(embs32[:, 0], 5), type=pa.float64()),
            "e1": pa.array(round_ha(embs32[:, 1], 5), type=pa.float64()),
            "e2": pa.array(round_ha(embs32[:, 2], 5), type=pa.float64()),
            "e3": pa.array(round_ha(embs32[:, 3], 5), type=pa.float64()),
            "emb_digest": pa.array(
                [emb_digest(v) for v in embs32], type=pa.int64()
            ),
            "norm": pa.array(
                round_ha(np.linalg.norm(embs, axis=1), 4), type=pa.float64()
            ),
        }
    )


def _mean_embedder():
    from rust_bert_ray.scorers import HashEmbedder

    return HashEmbedder(dim=64, pooling="mean")


def _dense_embedder():
    """mean_sqrt_len pooling + Dense(64→32, tanh) projection — the
    layers.rs:113-153 path."""
    from rust_bert_ray.decode.pooling import Dense
    from rust_bert_ray.scorers import HashEmbedder

    return HashEmbedder(
        dim=64, pooling="mean_sqrt_len", dense=Dense.deterministic(64, 32)
    )


def q_embed_docs(sf_dir: str, corpus_root: str) -> pa.Table:
    return embed_projection(_documents(sf_dir), _mean_embedder())


def q_embed_dense(sf_dir: str, corpus_root: str) -> pa.Table:
    return embed_projection(_documents(sf_dir), _dense_embedder())


def q_keywords(sf_dir: str, corpus_root: str, k: int = 5) -> pa.Table:
    """Independent candidate scan + ranking: the word regex, stopword
    filter, first-occurrence candidate order, cosine scoring and stable
    top-k are all re-derived here (only the embedder — the 'model' — and
    the shared stopword table come from the library)."""
    import re

    from rust_bert_ray.decode.pooling import l2_normalize
    from rust_bert_ray.functions.util import round_ha
    from rust_bert_ray.scorers import HashEmbedder
    from rust_bert_ray.stages.keywords import STOPWORDS

    word_re = re.compile(r"(?u)\b\w+\b")
    embedder = HashEmbedder(dim=64)
    t = _documents(sf_dir)
    rows: dict[str, list] = {"doc_id": [], "keyword": [], "score": [], "offsets": []}
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        cands: dict[str, list[tuple[int, int]]] = {}
        for m in word_re.finditer(text):
            w = m.group(0)
            if w.lower() in STOPWORDS:
                continue
            cands.setdefault(w.lower(), []).append((m.start(), m.end()))
        if not cands:
            continue
        names = list(cands)
        doc_emb = embedder.embed(text)
        cand_embs = embedder.embed_batch(names)
        sims = (
            l2_normalize(np.atleast_2d(doc_emb))
            @ l2_normalize(np.atleast_2d(cand_embs)).T
        ).ravel()
        for i in np.argsort(-sims, kind="stable")[: min(k, len(names))]:
            rows["doc_id"].append(doc_id)
            rows["keyword"].append(names[int(i)])
            rows["score"].append(round(float(sims[int(i)]), 5))
            rows["offsets"].append(offsets_str(cands[names[int(i)]]))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
            "keyword": pa.array(rows["keyword"], type=pa.string()),
            "score": pa.array(rows["score"], type=pa.float64()),
            "offsets": pa.array(rows["offsets"], type=pa.string()),
        }
    )


def q_masked_lm(sf_dir: str, corpus_root: str, top_k: int = 3) -> pa.Table:
    """Independent reimplementation (no stage code): mask the 3rd token,
    rank visible-token counts (count desc, token asc), emit top-k raw
    logits per mask."""
    from collections import Counter

    t = _documents(sf_dir)
    rows: dict[str, list] = {
        "doc_id": [], "mask_index": [], "rank": [], "token": [], "score": []
    }
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        toks = text.split(" ")
        if len(toks) > 2:
            toks[2] = "<mask>"
        positions = [i for i, x in enumerate(toks) if x == "<mask>"]
        if not positions:
            continue
        ranked = sorted(
            Counter(x for x in toks if x != "<mask>" and x).items(),
            key=lambda kv: (-kv[1], kv[0]),
        )
        for m_idx, _pos in enumerate(positions):
            for rank, (tok, count) in enumerate(ranked[:top_k]):
                rows["doc_id"].append(doc_id)
                rows["mask_index"].append(m_idx)
                rows["rank"].append(rank)
                rows["token"].append(tok)
                rows["score"].append(float(count))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
            "mask_index": pa.array(rows["mask_index"], type=pa.int32()),
            "rank": pa.array(rows["rank"], type=pa.int32()),
            "token": pa.array(rows["token"], type=pa.string()),
            "score": pa.array(rows["score"], type=pa.float64()),
        }
    )


def qa_answers(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent QA oracle: re-derives the windowed span decode of
    question_answering.rs:828-917 from the spec — fresh gazetteer
    matcher, fixed-width piece expansion (ceil(len/4)), single-window
    layout, masked softmax, band-limited outer-product argmax — without
    importing rust_bert_ray.stages.qa or decode.qa.  Shares only the
    GAZETTEER table, the word regex, and the question-template input
    prep (input contracts)."""
    import re as _re

    from rust_bert_ray.corpus import GAZETTEER

    word_re = _re.compile(r"(?u)\w+|[^\w\s]")
    # gazetteer as (word-tuple → label), longest surfaces first
    entries: dict[str, list[tuple[tuple[str, ...], str]]] = {}
    for surface, label in GAZETTEER.items():
        parts = tuple(surface.split())
        entries.setdefault(parts[0], []).append((parts, label))
    for v in entries.values():
        v.sort(key=lambda e: -len(e[0]))

    def tag(words: list[str]) -> list[str]:
        tags = ["O"] * len(words)
        i = 0
        while i < len(words):
            for parts, label in entries.get(words[i], ()):
                if tuple(words[i : i + len(parts)]) == parts:
                    tags[i] = f"B-{label}"
                    for k in range(i + 1, i + len(parts)):
                        tags[k] = f"I-{label}"
                    i += len(parts) - 1
                    break
            i += 1
        return tags

    def n_pieces(word: str) -> int:
        return max(1, -(-len(word) // 4))  # ceil(len/4), 4-char pieces

    rows: dict[str, list] = {
        k: [] for k in ("qa_id", "question", "answer", "start", "end", "score")
    }
    t = _corpus_docs(corpus_root)
    for doc_id, spans in zip(
        t.column("doc_id").to_pylist(), t.column("spans").to_pylist()
    ):
        for span in spans or []:
            if span["kind"] != "text" or "I live in" not in span["text"]:
                continue
            name = span["text"].split("My name is ")[-1].split(".")[0]
            qa_id = f"{doc_id}:{span['offset']}"
            question = f"Where does {name} live ?"
            context = span["text"]
            kind = "LOC"  # "where" question
            toks = [(m.start(), m.group(0)) for m in word_re.finditer(context)]
            words = [w for _, w in toks]
            tags = tag(words)
            # piece layout: [CLS] + pieces + [SEP]; offsets per piece
            piece_word: list[int] = []
            piece_first: list[bool] = []
            offsets: list[tuple[int, int]] = []
            for wi, (begin, w) in enumerate(toks):
                np_w = n_pieces(w)
                pos = begin
                for p in range(np_w):
                    ln = min(4, len(w) - 4 * p)
                    piece_word.append(wi)
                    piece_first.append(p == 0)
                    offsets.append((pos, pos + ln))
                    pos += ln
            total = len(piece_word)
            q_pieces = sum(n_pieces(w) for w in word_re.findall(question))
            q_len = min(q_pieces, 64)
            content = max(8, 384 - q_len - 3)
            assert total <= content, "corpus context exceeds one QA window"
            n = total + 2
            start_logits = np.zeros(n)
            end_logits = np.zeros(n)
            p_mask = np.zeros(n)
            p_mask[0] = p_mask[n - 1] = 1

            def ent(pos: int) -> bool:
                if pos <= 0 or pos >= n - 1:
                    return False
                tg = tags[piece_word[pos - 1]]
                return tg != "O" and tg.endswith(kind)

            for pos in range(1, n - 1):
                if not ent(pos):
                    continue
                wi = piece_word[pos - 1]
                if tags[wi].startswith("B") and piece_first[pos - 1]:
                    start_logits[pos] = 8.0
                nxt = pos + 1
                continues = ent(nxt) and (
                    piece_word[nxt - 1] == wi
                    or tags[piece_word[nxt - 1]].startswith("I")
                )
                end_logits[pos] = 4.0 if continues else 8.0

            def msoftmax(x: np.ndarray) -> np.ndarray:
                z = np.where(p_mask.astype(bool), -np.inf, x.astype(np.float64))
                z = z - np.max(z)
                e = np.exp(z)
                return e / e.sum()

            sp, ep = msoftmax(start_logits), msoftmax(end_logits)
            outer = np.outer(sp, ep)
            cand = np.triu(np.tril(outer, 15 - 1))
            flat = cand.reshape(-1)
            idx = int(np.argmax(flat))
            s_pos, e_pos = idx // n, idx % n
            so = offsets[s_pos - 1] if 1 <= s_pos <= total else None
            eo = offsets[e_pos - 1] if 1 <= e_pos <= total else None
            begin = so[0] if so else 0
            stop = eo[1] if eo else 0
            rows["qa_id"].append(qa_id)
            rows["question"].append(question)
            rows["answer"].append(context[begin:stop])
            rows["start"].append(begin)
            rows["end"].append(stop)
            rows["score"].append(round(float(flat[idx]), 5))
    return pa.Table.from_pydict(
        {
            "qa_id": pa.array(rows["qa_id"], type=pa.string()),
            "question": pa.array(rows["question"], type=pa.string()),
            "answer": pa.array(rows["answer"], type=pa.string()),
            "start": pa.array(rows["start"], type=pa.int32()),
            "end": pa.array(rows["end"], type=pa.int32()),
            "score": pa.array(rows["score"], type=pa.float64()),
        }
    )


def q_lang_id(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent of the stage's Arrow kernels: pure-Python str.count
    scoring over the same trigram profiles (shared constants, re-derived
    argmax/tie-break)."""
    from rust_bert_ray.functions.text import LangIdStage

    profiles = LangIdStage.PROFILES
    langs = sorted(profiles)
    t = _documents(sf_dir)
    preds = []
    for text in t.column("text").to_pylist():
        scores = [sum(text.count(g) for g in profiles[lang]) for lang in langs]
        best = max(range(len(langs)), key=lambda i: (scores[i], -i))
        preds.append(langs[best] if scores[best] > 0 else "und")
    return pa.Table.from_pydict(
        {"doc_id": t.column("doc_id"), "lang_pred": pa.array(preds)}
    )


def q_fingerprints(sf_dir: str, corpus_root: str, shingle: int = 8) -> pa.Table:
    # independent reimplementation of the rolling min-shingle-hash
    t = _documents(sf_dir)
    fps = []
    for text in t.column("text").to_pylist():
        words = text.split()
        if len(words) < shingle:
            grams = [" ".join(words)]
        else:
            grams = [
                " ".join(words[i : i + shingle])
                for i in range(len(words) - shingle + 1)
            ]
        fps.append(min(zlib.crc32(g.encode()) for g in grams))
    return pa.Table.from_pydict(
        {"doc_id": t.column("doc_id"), "fingerprint": pa.array(fps, type=pa.int64())}
    )


def q_decode(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent WordPiece round-trip oracle: greedy longest-match is
    re-derived with a TRIE walk (deepest terminal wins) instead of the
    runtime's shrinking-suffix probe, and the ``##``-fusing decode +
    cleanup is re-written from the common.rs:1397-1466 contract.  Shares
    only the vocab FILE and the word regex (input contract)."""
    import re as _re

    from rust_bert_ray.tokenization import DEFAULT_VOCAB_PATH

    vocab: dict[str, int] = {}
    with open(DEFAULT_VOCAB_PATH, encoding="utf-8") as f:
        for i, line in enumerate(f):
            vocab[line.rstrip("\n")] = i
    inv = {i: p for p, i in vocab.items()}
    specials = {"[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"}
    special_ids = {vocab[t] for t in specials if t in vocab}
    unk_id = vocab["[UNK]"]

    # trie over pieces: node = {char: node, id?: terminal}
    root: dict = {}
    cont_root: dict = {}
    for piece, pid in vocab.items():
        if piece in specials:
            continue
        node = cont_root if piece.startswith("##") else root
        for ch in piece[2:] if piece.startswith("##") else piece:
            node = node.setdefault(ch, {})
        node["\x00id"] = pid

    def encode_word(word: str) -> list[int]:
        if len(word) > 100:
            return [unk_id]
        ids: list[int] = []
        pos = 0
        while pos < len(word):
            node = root if pos == 0 else cont_root
            best = None
            best_end = pos
            j = pos
            while j < len(word):
                node = node.get(word[j])
                if node is None:
                    break
                j += 1
                if "\x00id" in node:
                    best, best_end = node["\x00id"], j
            if best is None:
                return [unk_id]
            ids.append(best)
            pos = best_end
        return ids

    word_re = _re.compile(r"(?u)\w+|[^\w\s]")
    t = _documents(sf_dir)
    n_pieces, n_unk, decoded, roundtrip = [], [], [], []
    for text in t.column("text").to_pylist():
        ids: list[int] = []
        for w in word_re.findall(text):
            ids.extend(encode_word(w))
        parts: list[str] = []
        for i in ids:  # CLS/SEP wrap then skip_special_tokens ⇒ identity
            if i in special_ids:
                continue
            piece = inv.get(i, "[UNK]")
            if piece.startswith("##") and parts:
                parts[-1] += piece[2:]
            elif piece.startswith("##"):
                parts.append(piece[2:])
            else:
                parts.append(piece)
        out = " ".join(parts)
        for src, dst in (
            (" .", "."), (" ?", "?"), (" !", "!"), (" ,", ","),
            (" ' ", "'"), (" n't", "n't"), (" 'm", "'m"), (" 's", "'s"),
            (" 've", "'ve"), (" 're", "'re"),
        ):
            out = out.replace(src, dst)
        n_pieces.append(len(ids))
        n_unk.append(sum(1 for i in ids if i == unk_id))
        decoded.append(out)
        roundtrip.append(int(out == text))
    return pa.Table.from_pydict(
        {
            "doc_id": t.column("doc_id"),
            "n_pieces": pa.array(n_pieces, type=pa.int64()),
            "n_unk": pa.array(n_unk, type=pa.int64()),
            "decoded": pa.array(decoded, type=pa.string()),
            "roundtrip": pa.array(roundtrip, type=pa.int64()),
        }
    )


def q_decode_bpe(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent BPE oracle: applies the learned merges IN TRAINING
    ORDER to completion (the original Sennrich formulation) instead of
    the runtime's greedy lowest-rank-pair loop — the two are provably
    equivalent, so a bug in either merge engine flips the hash.  Shares
    only the pretokenizer and byte↔unicode table (input contract);
    decode is re-derived via the reverse byte map."""
    from rust_bert_ray.bpe import (
        DEFAULT_MERGES_PATH,
        DEFAULT_VOCAB_PATH,
        bytes_to_unicode,
        pretokenize,
    )
    import json as _json

    with open(DEFAULT_VOCAB_PATH, encoding="utf-8") as f:
        vocab = _json.load(f)
    merges: list[tuple[str, str]] = []
    with open(DEFAULT_MERGES_PATH, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if line and not line.startswith("#"):
                a, b = line.split(" ")
                merges.append((a, b))
    b2u = bytes_to_unicode()
    u2b = {v: k for k, v in b2u.items()}

    def apply_in_order(units: list[str]) -> list[str]:
        for a, b in merges:
            i = 0
            while i < len(units) - 1:
                if units[i] == a and units[i + 1] == b:
                    units[i : i + 2] = [a + b]
                else:
                    i += 1
        return units

    word_cache: dict[str, list[str]] = {}
    inv = {i: u for u, i in vocab.items()}
    t = _documents(sf_dir)
    n_pieces, n_words, decoded, roundtrip = [], [], [], []
    for text in t.column("text").to_pylist():
        toks = pretokenize(text)
        ids: list[int] = []
        for _, token in toks:
            units = word_cache.get(token)
            if units is None:
                units = apply_in_order([b2u[b] for b in token.encode("utf-8")])
                word_cache[token] = units
            ids.extend(vocab[u] for u in units)
        data = bytes(u2b[ch] for i in ids for ch in inv[i])
        out = data.decode("utf-8", errors="replace")
        n_pieces.append(len(ids))
        n_words.append(len(toks))
        decoded.append(out)
        roundtrip.append(int(out == text))
    return pa.Table.from_pydict(
        {
            "doc_id": t.column("doc_id"),
            "n_pieces": pa.array(n_pieces, type=pa.int64()),
            "n_words": pa.array(n_words, type=pa.int64()),
            "decoded": pa.array(decoded, type=pa.string()),
            "roundtrip": pa.array(roundtrip, type=pa.int64()),
        }
    )


def q_decode_hf(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent tokenizer.json oracle: parses the SAME fixture file
    the Ray stage loads, but builds the ids with the training-order
    merge engine (Sennrich formulation, like the q_decode_bpe oracle)
    and a hand-rolled reverse byte map — a loader bug (merge order,
    vocab mixup, list-form merge parse) flips ``ids_crc`` even when
    byte fallback hides it from the round-trip flag."""
    import json as _json

    from rust_bert_ray.bpe import bytes_to_unicode, pretokenize
    from rust_bert_ray.functions.text import HF_TOKENIZER_FIXTURE

    with open(HF_TOKENIZER_FIXTURE, encoding="utf-8") as f:
        model = _json.load(f)["model"]
    vocab: dict[str, int] = model["vocab"]
    merges = [tuple(m) if isinstance(m, list) else tuple(m.split(" "))
              for m in model["merges"]]
    b2u = bytes_to_unicode()
    u2b = {v: k for k, v in b2u.items()}

    def apply_in_order(units: list[str]) -> list[str]:
        for a, b in merges:
            i = 0
            while i < len(units) - 1:
                if units[i] == a and units[i + 1] == b:
                    units[i : i + 2] = [a + b]
                else:
                    i += 1
        return units

    word_cache: dict[str, list[str]] = {}
    inv = {i: u for u, i in vocab.items()}
    t = _documents(sf_dir)
    n_pieces, ids_crc, decoded, roundtrip = [], [], [], []
    for text in t.column("text").to_pylist():
        toks = pretokenize(text)
        ids: list[int] = []
        for _, token in toks:
            units = word_cache.get(token)
            if units is None:
                units = apply_in_order([b2u[b] for b in token.encode("utf-8")])
                word_cache[token] = units
            ids.extend(vocab[u] for u in units)
        data = bytes(u2b[ch] for i in ids for ch in inv[i])
        out = data.decode("utf-8", errors="replace")
        n_pieces.append(len(ids))
        ids_crc.append(zlib.crc32(np.asarray(ids, dtype=np.int64).tobytes()))
        decoded.append(out)
        roundtrip.append(int(out == text))
    return pa.Table.from_pydict(
        {
            "doc_id": t.column("doc_id"),
            "n_pieces": pa.array(n_pieces, type=pa.int64()),
            "ids_crc": pa.array(ids_crc, type=pa.int64()),
            "decoded": pa.array(decoded, type=pa.string()),
            "roundtrip": pa.array(roundtrip, type=pa.int64()),
        }
    )


def q_decode_hf_unigram(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent tokenizer.json Unigram oracle: parses the SAME
    fixture file the Ray stage loads, but segments by EXHAUSTIVE
    enumeration (no Viterbi) and maps pieces to file-order ids with a
    hand-rolled table — a loader bug (unk_id handling, vocab order,
    logp-vs-id mixup) flips ``ids_crc`` even when the round-trip flag
    hides it."""
    import json as _json
    import re as _re

    from rust_bert_ray.functions.text import HF_UNIGRAM_FIXTURE

    with open(HF_UNIGRAM_FIXTURE, encoding="utf-8") as f:
        model = _json.load(f)["model"]
    vocab_list = model["vocab"]
    unk_id = int(model["unk_id"])
    piece_id = {p: i for i, (p, _) in enumerate(vocab_list)}
    logp = {p: float(lp) for i, (p, lp) in enumerate(vocab_list) if i != unk_id}
    unk_logp = float(vocab_list[unk_id][1])
    unk_piece = vocab_list[unk_id][0]
    max_len = max(len(p) for p in logp)
    word_re = _re.compile(r"(?u)\w+|[^\w\s]")

    seg_cache: dict[str, list[str]] = {}

    def enumerate_best(word: str) -> list[str]:
        cached = seg_cache.get(word)
        if cached is not None:
            return cached
        n = len(word)
        best_key = None
        best_pieces: list[str] | None = None
        stack: list[tuple[int, float, list[str]]] = [(0, 0.0, [])]
        while stack:
            pos, score, pieces = stack.pop()
            if pos == n:
                key = (
                    score,
                    -len(pieces),
                    tuple(len(p) for p in reversed(pieces)),
                )
                if best_key is None or key > best_key:
                    best_key = key
                    best_pieces = pieces
                continue
            for end in range(pos + 1, min(n, pos + max_len) + 1):
                piece = word[pos:end]
                lp = logp.get(piece)
                if lp is None:
                    if end - pos == 1:
                        lp = unk_logp
                    else:
                        continue
                stack.append((end, score + lp, pieces + [piece]))
        assert best_pieces is not None
        if len(seg_cache) < 200_000:
            seg_cache[word] = best_pieces
        return best_pieces

    t = _documents(sf_dir)
    n_pieces, ids_crc, decoded, roundtrip = [], [], [], []
    for text in t.column("text").to_pylist():
        words = word_re.findall(text)
        ids: list[int] = []
        out_words: list[str] = []
        for w in words:
            pieces = enumerate_best(w)
            ids.extend(piece_id.get(p, unk_id) for p in pieces)
            out_words.append(
                "".join(p if p in logp else unk_piece for p in pieces)
            )
        out = " ".join(out_words)
        for src, dst in (
            (" .", "."), (" ?", "?"), (" !", "!"), (" ,", ","),
            (" ' ", "'"), (" n't", "n't"), (" 'm", "'m"), (" 's", "'s"),
            (" 've", "'ve"), (" 're", "'re"),
        ):
            out = out.replace(src, dst)
        n_pieces.append(len(ids))
        ids_crc.append(zlib.crc32(np.asarray(ids, dtype=np.int64).tobytes()))
        decoded.append(out)
        roundtrip.append(int(out == text))
    return pa.Table.from_pydict(
        {
            "doc_id": t.column("doc_id"),
            "n_pieces": pa.array(n_pieces, type=pa.int64()),
            "ids_crc": pa.array(ids_crc, type=pa.int64()),
            "decoded": pa.array(decoded, type=pa.string()),
            "roundtrip": pa.array(roundtrip, type=pa.int64()),
        }
    )


def q_decode_hf_metaspace(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent Metaspace-unigram oracle: parses the SAME
    tokenizer.json the Ray stage loads, segments ``marker + token`` by
    EXHAUSTIVE enumeration (no Viterbi, no UnigramTokenizer import),
    maps pieces to file-order ids by hand, and decodes by the
    sentencepiece marker→space rule."""
    import json as _json
    import re as _re

    from rust_bert_ray.functions.text import HF_METASPACE_FIXTURE

    with open(HF_METASPACE_FIXTURE, encoding="utf-8") as f:
        doc = _json.load(f)
    model = doc["model"]
    marker = doc["pre_tokenizer"]["replacement"]
    vocab_list = model["vocab"]
    unk_id = int(model["unk_id"])
    piece_id = {p: i for i, (p, _) in enumerate(vocab_list)}
    logp = {p: float(lp) for i, (p, lp) in enumerate(vocab_list) if i != unk_id}
    unk_logp = float(vocab_list[unk_id][1])
    unk_piece = vocab_list[unk_id][0]
    max_len = max(len(p) for p in logp)
    tok_re = _re.compile(r"\S+")

    seg_cache: dict[str, list[str]] = {}

    def enumerate_best(word: str) -> list[str]:
        cached = seg_cache.get(word)
        if cached is not None:
            return cached
        n = len(word)
        best_key = None
        best_pieces: list[str] | None = None
        stack: list[tuple[int, float, list[str]]] = [(0, 0.0, [])]
        while stack:
            pos, score, pieces = stack.pop()
            if pos == n:
                key = (
                    score,
                    -len(pieces),
                    tuple(len(p) for p in reversed(pieces)),
                )
                if best_key is None or key > best_key:
                    best_key = key
                    best_pieces = pieces
                continue
            for end in range(pos + 1, min(n, pos + max_len) + 1):
                piece = word[pos:end]
                lp = logp.get(piece)
                if lp is None:
                    if end - pos == 1:
                        lp = unk_logp
                    else:
                        continue
                stack.append((end, score + lp, pieces + [piece]))
        assert best_pieces is not None
        if len(seg_cache) < 200_000:
            seg_cache[word] = best_pieces
        return best_pieces

    t = _documents(sf_dir)
    n_pieces, n_unk, ids_crc, decoded, roundtrip = [], [], [], [], []
    for text in t.column("text").to_pylist():
        ids: list[int] = []
        out_parts: list[str] = []
        for m in tok_re.finditer(text):
            pieces = enumerate_best(marker + m.group(0))
            ids.extend(piece_id.get(p, unk_id) for p in pieces)
            out_parts.extend(p if p in logp else unk_piece for p in pieces)
        out = "".join(out_parts).replace(marker, " ").lstrip(" ")
        n_pieces.append(len(ids))
        n_unk.append(sum(1 for i in ids if i == unk_id))
        ids_crc.append(zlib.crc32(np.asarray(ids, dtype=np.int64).tobytes()))
        decoded.append(out)
        roundtrip.append(int(out == text))
    return pa.Table.from_pydict(
        {
            "doc_id": t.column("doc_id"),
            "n_pieces": pa.array(n_pieces, type=pa.int64()),
            "n_unk": pa.array(n_unk, type=pa.int64()),
            "ids_crc": pa.array(ids_crc, type=pa.int64()),
            "decoded": pa.array(decoded, type=pa.string()),
            "roundtrip": pa.array(roundtrip, type=pa.int64()),
        }
    )


def q_decode_hf_suffix(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent suffix-BPE (GPT-1/CTRL family) oracle: parses the
    SAME tokenizer.json the Ray stage loads, but applies merges in
    TRAINING ORDER (Sennrich formulation) instead of the runtime's
    greedy lowest-rank loop, with a hand-rolled unk/id mapping — a
    loader bug (suffix handling, merge order, unk fallback) flips
    ``ids_crc`` and the decode parity."""
    import json as _json
    import re as _re

    from rust_bert_ray.functions.text import HF_SUFFIX_FIXTURE

    with open(HF_SUFFIX_FIXTURE, encoding="utf-8") as f:
        model = _json.load(f)["model"]
    vocab: dict[str, int] = model["vocab"]
    suffix: str = model["end_of_word_suffix"]
    unk_token: str = model["unk_token"]
    unk_id = vocab[unk_token]
    inv = {i: u for u, i in vocab.items()}
    merges = [
        tuple(m) if isinstance(m, list) else tuple(m.split(" "))
        for m in model["merges"]
    ]
    word_re = _re.compile(r"(?u)\w+|[^\w\s]")

    def apply_in_order(units: list[str]) -> list[str]:
        for a, b in merges:
            i = 0
            while i < len(units) - 1:
                if units[i] == a and units[i + 1] == b:
                    units[i : i + 2] = [a + b]
                else:
                    i += 1
        return units

    word_cache: dict[str, list[int]] = {}
    t = _documents(sf_dir)
    n_pieces, n_unk, ids_crc, decoded, roundtrip = [], [], [], [], []
    for text in t.column("text").to_pylist():
        ids: list[int] = []
        for word in word_re.findall(text):
            lowered = word.lower()
            if len(lowered) == len(word):
                word = lowered
            cached = word_cache.get(word)
            if cached is None:
                units = list(word)
                units[-1] = units[-1] + suffix
                units = apply_in_order(units)
                cached = [vocab.get(u, unk_id) for u in units]
                word_cache[word] = cached
            ids.extend(cached)
        out = "".join(inv[i] for i in ids).replace(suffix, " ").strip()
        for src, dst in (
            (" .", "."), (" ?", "?"), (" !", "!"), (" ,", ","),
            (" ' ", "'"), (" n't", "n't"), (" 'm", "'m"), (" 's", "'s"),
            (" 've", "'ve"), (" 're", "'re"),
        ):
            out = out.replace(src, dst)
        n_pieces.append(len(ids))
        n_unk.append(sum(1 for i in ids if i == unk_id))
        ids_crc.append(zlib.crc32(np.asarray(ids, dtype=np.int64).tobytes()))
        decoded.append(out)
        roundtrip.append(int(out == text.lower()))
    return pa.Table.from_pydict(
        {
            "doc_id": t.column("doc_id"),
            "n_pieces": pa.array(n_pieces, type=pa.int64()),
            "n_unk": pa.array(n_unk, type=pa.int64()),
            "ids_crc": pa.array(ids_crc, type=pa.int64()),
            "decoded": pa.array(decoded, type=pa.string()),
            "roundtrip": pa.array(roundtrip, type=pa.int64()),
        }
    )


def q_decode_hf_spbpe(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent sentencepiece-BPE (Marian/XLM family) oracle: parses
    the SAME tokenizer.json the Ray stage loads, but applies merges in
    TRAINING ORDER (Sennrich formulation) instead of the runtime's
    greedy lowest-rank loop, with a hand-rolled unk/id mapping — a
    loader bug (Metaspace dispatch, marker handling, merge order, unk
    fallback) flips ``ids_crc`` and the decode parity."""
    import json as _json

    from rust_bert_ray.functions.text import HF_SPBPE_FIXTURE

    with open(HF_SPBPE_FIXTURE, encoding="utf-8") as f:
        doc = _json.load(f)
    model = doc["model"]
    marker: str = doc["pre_tokenizer"]["replacement"]
    vocab: dict[str, int] = model["vocab"]
    unk_token: str = model["unk_token"]
    unk_id = vocab[unk_token]
    inv = {i: u for u, i in vocab.items()}
    merges = [
        tuple(m) if isinstance(m, list) else tuple(m.split(" "))
        for m in model["merges"]
    ]

    def apply_in_order(units: list[str]) -> list[str]:
        for a, b in merges:
            i = 0
            while i < len(units) - 1:
                if units[i] == a and units[i + 1] == b:
                    units[i : i + 2] = [a + b]
                else:
                    i += 1
        return units

    word_cache: dict[str, list[int]] = {}
    t = _documents(sf_dir)
    n_pieces, n_unk, ids_crc, decoded, roundtrip = [], [], [], [], []
    for text in t.column("text").to_pylist():
        ids: list[int] = []
        for word in text.split():
            cached = word_cache.get(word)
            if cached is None:
                units = apply_in_order(list(marker + word))
                cached = [vocab.get(u, unk_id) for u in units]
                word_cache[word] = cached
            ids.extend(cached)
        out = (
            "".join(inv[i] for i in ids).replace(marker, " ").lstrip(" ")
        )
        n_pieces.append(len(ids))
        n_unk.append(sum(1 for i in ids if i == unk_id))
        ids_crc.append(zlib.crc32(np.asarray(ids, dtype=np.int64).tobytes()))
        decoded.append(out)
        roundtrip.append(int(out == text))
    return pa.Table.from_pydict(
        {
            "doc_id": t.column("doc_id"),
            "n_pieces": pa.array(n_pieces, type=pa.int64()),
            "n_unk": pa.array(n_unk, type=pa.int64()),
            "ids_crc": pa.array(ids_crc, type=pa.int64()),
            "decoded": pa.array(decoded, type=pa.string()),
            "roundtrip": pa.array(roundtrip, type=pa.int64()),
        }
    )


def q_pack_sequences(
    sf_dir: str, corpus_root: str, target: int = 256, shard_size: int = 100
) -> pa.Table:
    """Independent sequence-packing oracle: single pass over the full
    corpus sorted by doc_id, fresh greedy next-fit implementation (no
    shard grouping machinery — shard boundaries emerge from the key
    rule alone)."""
    t = _documents(sf_dir)
    rows = sorted(
        zip(
            t.column("doc_id").to_pylist(),
            (len(x.split(" ")) for x in t.column("text").to_pylist()),
        )
    )
    out: dict[str, list] = {
        "pack_id": [], "n_docs": [], "n_words": [], "fill_bp": [], "doc_ids": [],
    }
    cur_shard = None
    k = 0
    ids: list[int] = []
    words = 0
    def emit() -> None:
        nonlocal k, ids, words
        if ids:
            out["pack_id"].append(f"{cur_shard}:{k}")
            out["n_docs"].append(len(ids))
            out["n_words"].append(words)
            out["fill_bp"].append((10_000 * words) // target)
            out["doc_ids"].append(";".join(map(str, ids)))
            k += 1
            ids, words = [], 0
    for doc_id, nw in rows:
        shard = doc_id // shard_size
        if shard != cur_shard:
            emit()
            cur_shard, k = shard, 0
        elif ids and words + nw > target:
            emit()
        ids.append(doc_id)
        words += nw
    emit()
    return pa.Table.from_pydict(
        {
            "pack_id": pa.array(out["pack_id"], type=pa.string()),
            "n_docs": pa.array(out["n_docs"], type=pa.int64()),
            "n_words": pa.array(out["n_words"], type=pa.int64()),
            "fill_bp": pa.array(out["fill_bp"], type=pa.int64()),
            "doc_ids": pa.array(out["doc_ids"], type=pa.string()),
        }
    )


def q_decode_unigram(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent unigram oracle: EXHAUSTIVE segmentation enumeration
    per word (corpus words are short) scored by the global selection
    rule the runtime's forward Viterbi realizes — max total log-prob,
    then fewest pieces, then lexicographically-largest reversed piece-
    length tuple (longest last piece first).  Shares only the model
    FILE and word regex; no UnigramTokenizer import."""
    import json as _json
    import re as _re

    from rust_bert_ray.unigram import DEFAULT_MODEL_PATH

    with open(DEFAULT_MODEL_PATH, encoding="utf-8") as f:
        model = _json.load(f)
    logp: dict[str, float] = model["pieces"]
    unk_logp: float = model["unk_logp"]
    vocab = {p: i for i, p in enumerate(sorted(logp))}
    unk_id = len(vocab)
    max_len = max(len(p) for p in logp)
    word_re = _re.compile(r"(?u)\w+|[^\w\s]")

    seg_cache: dict[str, list[str]] = {}

    def enumerate_best(word: str) -> list[str]:
        cached = seg_cache.get(word)
        if cached is not None:
            return cached
        n = len(word)
        best_key = None
        best_pieces: list[str] | None = None
        # DFS over all split points; pieces must be in-vocab or 1-char UNK
        stack: list[tuple[int, float, list[str]]] = [(0, 0.0, [])]
        while stack:
            pos, score, pieces = stack.pop()
            if pos == n:
                key = (
                    score,
                    -len(pieces),
                    tuple(len(p) for p in reversed(pieces)),
                )
                if best_key is None or key > best_key:
                    best_key = key
                    best_pieces = pieces
                continue
            for end in range(pos + 1, min(n, pos + max_len) + 1):
                piece = word[pos:end]
                lp = logp.get(piece)
                if lp is None:
                    if end - pos == 1:
                        lp = unk_logp
                    else:
                        continue
                stack.append((end, score + lp, pieces + [piece]))
        assert best_pieces is not None
        if len(seg_cache) < 200_000:
            seg_cache[word] = best_pieces
        return best_pieces

    t = _documents(sf_dir)
    n_pieces, n_unk, decoded, roundtrip = [], [], [], []
    for text in t.column("text").to_pylist():
        words = word_re.findall(text)
        total = unk = 0
        out_words: list[str] = []
        for w in words:
            pieces = enumerate_best(w)
            total += len(pieces)
            unk += sum(1 for p in pieces if p not in vocab)
            out_words.append(
                "".join(p if p in vocab else "<unk>" for p in pieces)
            )
        out = " ".join(out_words)
        for src, dst in (
            (" .", "."), (" ?", "?"), (" !", "!"), (" ,", ","),
            (" ' ", "'"), (" n't", "n't"), (" 'm", "'m"), (" 's", "'s"),
            (" 've", "'ve"), (" 're", "'re"),
        ):
            out = out.replace(src, dst)
        n_pieces.append(total)
        n_unk.append(unk)
        decoded.append(out)
        roundtrip.append(int(out == text))
    return pa.Table.from_pydict(
        {
            "doc_id": t.column("doc_id"),
            "n_pieces": pa.array(n_pieces, type=pa.int64()),
            "n_unk": pa.array(n_unk, type=pa.int64()),
            "decoded": pa.array(decoded, type=pa.string()),
            "roundtrip": pa.array(roundtrip, type=pa.int64()),
        }
    )


def q_conversation(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent re-derivation of the keyed conversation semantics
    (conversation.rs:469-699 add/mark-processed, :925-934 batched
    generate, :997-1064 EOS-boundary history truncation) — does NOT
    import rust_bert_ray.state.conversation."""
    turns, wpt, max_ctx, max_len, no_repeat = 2, 3, 64, 8, 3
    t = _documents(sf_dir).slice(0, 100)
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    histories: list[list[str]] = [[] for _ in doc_ids]
    out: dict[str, list] = {"doc_id": [], "turn": [], "user_input": [], "response": []}

    def truncate(history: list[str]) -> list[str]:
        if len(history) <= max_ctx:
            return history
        overflow = len(history) - max_ctx
        for i, tok in enumerate(history):
            if tok == _GEN_EOS and i + 1 >= overflow:
                return history[i + 1:]
        return history[-max_ctx:]

    for turn in range(turns):
        for k, (doc_id, text) in enumerate(zip(doc_ids, texts)):
            words = text.split()
            seg = " ".join(words[turn * wpt : (turn + 1) * wpt]) or "pad"
            prompt_tokens = histories[k] + seg.split() + [_GEN_EOS]
            prompt = " ".join(tok for tok in prompt_tokens if tok != _GEN_EOS)
            response = _gen_greedy(
                prompt, _GEN_VOCAB, max_length=max_len, no_repeat=no_repeat
            )
            histories[k] = truncate(prompt_tokens + response.split() + [_GEN_EOS])
            out["doc_id"].append(doc_id)
            out["turn"].append(turn)
            out["user_input"].append(seg)
            out["response"].append(response)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "turn": pa.array(out["turn"], type=pa.int64()),
            "user_input": pa.array(out["user_input"], type=pa.string()),
            "response": pa.array(out["response"], type=pa.string()),
        }
    )


# --------------------------------------------- media oracle (independent)
# Re-derives the declared-stub decode formulas (crc-keyed metadata,
# seeded-rng features) without importing rust_bert_ray.stages.multimodal.

_MEDIA_DIM = 8


def _media_meta(kind: str, media_ref: str) -> dict:
    h = zlib.crc32(media_ref.encode())
    rng = np.random.default_rng(h)
    is_visual = kind in ("image", "video", "table")
    return {
        "width": int(64 + h % 1920) if is_visual else 0,
        "height": int(64 + (h >> 8) % 1080) if is_visual else 0,
        "n_bytes": int(1024 + h % (1 << 20)),
        "duration_ms": int(h % 600_000) if kind in ("audio", "video") else 0,
        "feature": rng.standard_normal(_MEDIA_DIM).astype(np.float32),
    }


def _media_spans(corpus_root: str):
    t = _corpus_docs(corpus_root)
    for doc_id, spans in zip(
        t.column("doc_id").to_pylist(), t.column("spans").to_pylist()
    ):
        for span in spans or []:
            yield doc_id, span


def kg_media_frames(sf_dir: str, corpus_root: str, n_frames: int = 3) -> pa.Table:
    rows: dict[str, list] = {
        k: [] for k in (
            "doc_id", "span_offset", "kind", "media_ref", "frame_idx",
            "ts_ms", "feature_digest",
        )
    }
    for doc_id, span in _media_spans(corpus_root):
        if span["kind"] not in ("audio", "video"):
            continue
        duration = _media_meta(span["kind"], span["media_ref"])["duration_ms"]
        h = zlib.crc32(span["media_ref"].encode())
        for k in range(n_frames):
            ts = (duration * (k + 1)) // (n_frames + 1)
            feat = (
                np.random.default_rng((h + 1) * 1_000_003 + k)
                .standard_normal(_MEDIA_DIM)
                .astype(np.float32)
            )
            rows["doc_id"].append(doc_id)
            rows["span_offset"].append(span["offset"])
            rows["kind"].append(span["kind"])
            rows["media_ref"].append(span["media_ref"])
            rows["frame_idx"].append(k)
            rows["ts_ms"].append(int(ts))
            rows["feature_digest"].append(zlib.crc32(feat.tobytes()))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(rows["doc_id"], type=pa.string()),
            "span_offset": pa.array(rows["span_offset"], type=pa.int32()),
            "kind": pa.array(rows["kind"], type=pa.string()),
            "media_ref": pa.array(rows["media_ref"], type=pa.string()),
            "frame_idx": pa.array(rows["frame_idx"], type=pa.int32()),
            "ts_ms": pa.array(rows["ts_ms"], type=pa.int32()),
            "feature_digest": pa.array(rows["feature_digest"], type=pa.int64()),
        }
    )


def kg_media_resize(sf_dir: str, corpus_root: str, max_side: int = 512) -> pa.Table:
    rows: dict[str, list] = {
        k: [] for k in (
            "doc_id", "span_offset", "kind", "media_ref", "src_w", "src_h",
            "dst_w", "dst_h", "scale_pct",
        )
    }
    for doc_id, span in _media_spans(corpus_root):
        if span["kind"] not in ("image", "video", "table"):
            continue
        meta = _media_meta(span["kind"], span["media_ref"])
        w, h = meta["width"], meta["height"]
        scale = min(1.0, max_side / max(w, h, 1))
        rows["doc_id"].append(doc_id)
        rows["span_offset"].append(span["offset"])
        rows["kind"].append(span["kind"])
        rows["media_ref"].append(span["media_ref"])
        rows["src_w"].append(w)
        rows["src_h"].append(h)
        rows["dst_w"].append(max(1, int(w * scale)))
        rows["dst_h"].append(max(1, int(h * scale)))
        rows["scale_pct"].append(int(round(scale * 10_000)))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(rows["doc_id"], type=pa.string()),
            "span_offset": pa.array(rows["span_offset"], type=pa.int32()),
            "kind": pa.array(rows["kind"], type=pa.string()),
            "media_ref": pa.array(rows["media_ref"], type=pa.string()),
            "src_w": pa.array(rows["src_w"], type=pa.int32()),
            "src_h": pa.array(rows["src_h"], type=pa.int32()),
            "dst_w": pa.array(rows["dst_w"], type=pa.int32()),
            "dst_h": pa.array(rows["dst_h"], type=pa.int32()),
            "scale_pct": pa.array(rows["scale_pct"], type=pa.int64()),
        }
    )


def kg_media_features(sf_dir: str, corpus_root: str) -> pa.Table:
    rows: dict[str, list] = {
        k: [] for k in (
            "doc_id", "span_offset", "kind", "media_ref", "width", "height",
            "n_bytes", "duration_ms", "feature_digest",
        )
    }
    for doc_id, span in _media_spans(corpus_root):
        if span["kind"] == "text":
            continue
        meta = _media_meta(span["kind"], span["media_ref"])
        rows["doc_id"].append(doc_id)
        rows["span_offset"].append(span["offset"])
        rows["kind"].append(span["kind"])
        rows["media_ref"].append(span["media_ref"])
        rows["width"].append(meta["width"])
        rows["height"].append(meta["height"])
        rows["n_bytes"].append(meta["n_bytes"])
        rows["duration_ms"].append(meta["duration_ms"])
        rows["feature_digest"].append(emb_digest(meta["feature"]))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(rows["doc_id"], type=pa.string()),
            "span_offset": pa.array(rows["span_offset"], type=pa.int32()),
            "kind": pa.array(rows["kind"], type=pa.string()),
            "media_ref": pa.array(rows["media_ref"], type=pa.string()),
            "width": pa.array(rows["width"], type=pa.int32()),
            "height": pa.array(rows["height"], type=pa.int32()),
            "n_bytes": pa.array(rows["n_bytes"], type=pa.int64()),
            "duration_ms": pa.array(rows["duration_ms"], type=pa.int32()),
            "feature_digest": pa.array(rows["feature_digest"], type=pa.int64()),
        }
    )


# ----------------------------------------------- KG nodes/edges (sequential
# extraction + an INDEPENDENT plain-pandas graph build: no salted two-phase
# merge, no bucketing — checks canonicalize.py's distributed reduction)

def _linked_triples(corpus_root: str) -> pd.DataFrame:
    from rust_bert_ray.corpus import GAZETTEER
    from rust_bert_ray.pipelines.kg import default_alias_index
    from rust_bert_ray.stages.linking import LinkingStage
    from rust_bert_ray.stages.ner import NerStage, RelationStage

    docs = _corpus_docs(corpus_root)
    enriched = NerStage(gazetteer=GAZETTEER)(docs)
    triples = RelationStage()(enriched)
    linked = LinkingStage(index_ref=default_alias_index())(triples)
    return linked.to_pandas()


def kg_nodes(sf_dir: str, corpus_root: str, alias_cap: int = 16) -> pa.Table:
    df = _linked_triples(corpus_root)
    frames = []
    for side in ("subj", "obj"):
        sub = df[
            [f"{side}_id", f"{side}_key", f"{side}_canonical", f"{side}_label",
             f"{side}_score"]
        ].copy()
        sub.columns = ["node_id", "surface_key", "canonical", "label", "score"]
        frames.append(sub)
    m = pd.concat(frames, ignore_index=True)

    def kind_of(node_id: str, label: str) -> str:
        return node_id.split(":", 2)[1] if node_id.startswith("ent:") else label

    m["kind"] = [kind_of(n, l) for n, l in zip(m["node_id"], m["label"])]
    g = m.groupby("node_id").agg(
        canonical=("canonical", "first"),
        kind=("kind", "first"),
        aliases=("surface_key", lambda s: ";".join(sorted(set(s))[:alias_cap])),
        n_mentions=("score", "size"),
        score=("score", "max"),
    ).reset_index()
    return pa.Table.from_pydict(
        {
            "node_id": g["node_id"],
            "canonical": g["canonical"],
            "kind": g["kind"],
            "aliases": g["aliases"],
            "n_mentions": pa.array(g["n_mentions"], type=pa.int64()),
            "score": pa.array(g["score"], type=pa.float64()),
        }
    )


def kg_edges(sf_dir: str, corpus_root: str) -> pa.Table:
    df = _linked_triples(corpus_root)
    g = df.groupby(["subj_id", "pred", "obj_id"], as_index=False).agg(
        n_obs=("doc_id", "size"),
        score=("rel_score", "max"),
        # min-cap provenance sample — deterministic under any batching
        # since the round-5 EdgePartials min-cap fix, so now value-hashed
        # (joined to a scalar: the driver can't sort list columns)
        doc_ids=("doc_id", lambda sr: ";".join(sorted(set(sr))[:8])),
    )
    g["edge_id"] = [
        f"edge:{zlib.crc32(f'{s}|{p}|{o}'.encode()):08x}"
        for s, p, o in zip(g["subj_id"], g["pred"], g["obj_id"])
    ]
    return pa.Table.from_pydict(
        {
            "edge_id": g["edge_id"],
            "subj_id": g["subj_id"],
            "pred": g["pred"],
            "obj_id": g["obj_id"],
            "n_obs": pa.array(g["n_obs"], type=pa.int64()),
            "score": pa.array(g["score"], type=pa.float64()),
            "doc_ids": pa.array(g["doc_ids"], type=pa.string()),
        }
    )


# ------------------------------------------- sketch dedup (independent numpy)

def dedup_minhash_pairs(
    sf_dir: str,
    corpus_root: str,
    threshold: float = 0.7,
    bucket_cap: int = 200,
) -> pa.Table:
    from rust_bert_ray.functions.dedup import MinHashStage
    from rust_bert_ray.functions.util import round_ha

    t = _documents(sf_dir)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    st = MinHashStage()
    sig = st.signatures(t.column("text").to_pylist())  # (n, n_perm) uint16
    bh = st.band_hashes(sig)  # (n, n_bands)
    rpb = st.n_perm // st.n_bands
    order = np.argsort(ids, kind="stable")
    pairs: dict[tuple[int, int], float] = {}
    for band in range(st.n_bands):
        keys = bh[:, band]
        groups: dict[int, list[int]] = {}
        for i in order:  # doc_id-sorted, matching the distributed sort
            groups.setdefault(int(keys[i]), []).append(int(i))
        for members in groups.values():
            m = np.array(members[:bucket_cap])
            n = len(m)
            if n < 2:
                continue
            sub = sig[m]
            eq3 = sub[:, None, :] == sub[None, :, :]
            iu, ju = np.triu_indices(n, 1)
            est = eq3.mean(axis=2)[iu, ju]
            # emitted only in the pair's first signature-colliding band
            # (mirrors the distributed rule exactly, incl. bucket_cap
            # truncation interplay)
            band_eq = eq3.reshape(n, n, st.n_bands, rpb).all(axis=3)[iu, ju]
            first = band_eq.argmax(axis=1)
            keep = (est >= threshold) & (~band_eq.any(axis=1) | (first == band))
            for i, j, e_ in zip(iu[keep], ju[keep], est[keep]):
                key = (int(ids[m[i]]), int(ids[m[j]]))
                pairs.setdefault(key, float(round_ha(e_, 5)))
    rows = sorted(pairs.items())
    return pa.Table.from_pydict(
        {
            "doc_a": pa.array([k[0] for k, _ in rows], type=pa.int64()),
            "doc_b": pa.array([k[1] for k, _ in rows], type=pa.int64()),
            "est_jaccard": pa.array([v for _, v in rows], type=pa.float64()),
        }
    )


def dedup_incremental_minhash(
    sf_dir: str, corpus_root: str, threshold: float = 0.5
) -> pa.Table:
    """Independent cross-snapshot near-dup oracle: same MinHashStage
    signature helper (the shared-floats rule), but the banding, seen/
    arriving split, candidate generation and max-similarity fold are a
    fresh brute-force pass — no index, no join, no groupby machinery."""
    from rust_bert_ray.functions.dedup import _SNAP_MOD, _SNAP_REM, MinHashStage
    from rust_bert_ray.functions.util import round_ha

    t = _documents(sf_dir)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    st = MinHashStage()
    sig = st.signatures(t.column("text").to_pylist())
    bh = st.band_hashes(sig)
    seen_mask = ids % _SNAP_MOD == _SNAP_REM
    seen_idx = np.where(seen_mask)[0]
    arr_idx = np.where(~seen_mask)[0]
    best: dict[int, float] = {}
    for band in range(st.n_bands):
        groups: dict[int, list[int]] = {}
        for j in seen_idx:
            groups.setdefault(int(bh[j, band]), []).append(int(j))
        for i in arr_idx:
            members = groups.get(int(bh[i, band]))
            if not members:
                continue
            sims = (sig[members] == sig[i]).mean(axis=1)
            m = float(sims.max())
            if m > best.get(int(i), -1.0):
                best[int(i)] = m
    rows = sorted(
        (int(ids[i]), s) for i, s in best.items() if s >= threshold
    )
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "max_sim": pa.array(
                [float(round_ha(r[1], 5)) for r in rows], type=pa.float64()
            ),
        }
    )


def dedup_simhash_pairs(
    sf_dir: str,
    corpus_root: str,
    max_hamming: int = 3,
    bucket_cap: int = 200,
) -> pa.Table:
    from rust_bert_ray.functions.dedup import SimHashStage

    t = _documents(sf_dir)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    hs = SimHashStage.simhashes(t.column("text").to_pylist())
    order = np.argsort(ids, kind="stable")
    pairs: dict[tuple[int, int], int] = {}
    for band in range(4):
        keys = (hs >> np.uint64(16 * band)) & np.uint64(0xFFFF)
        groups: dict[int, list[int]] = {}
        for i in order:
            groups.setdefault(int(keys[i]), []).append(int(i))
        for members in groups.values():
            members = members[:bucket_cap]
            for a in range(len(members)):
                for b in range(a + 1, len(members)):
                    i, j = members[a], members[b]
                    ham = int(bin(int(hs[i]) ^ int(hs[j])).count("1"))
                    if ham <= max_hamming:
                        pairs.setdefault((int(ids[i]), int(ids[j])), ham)
    rows = sorted(pairs.items())
    return pa.Table.from_pydict(
        {
            "doc_a": pa.array([k[0] for k, _ in rows], type=pa.int64()),
            "doc_b": pa.array([k[1] for k, _ in rows], type=pa.int64()),
            "hamming": pa.array([v for _, v in rows], type=pa.int64()),
        }
    )


def dedup_clusters_minhash(
    sf_dir: str, corpus_root: str, threshold: float = 0.7
) -> pa.Table:
    """Independent union-find over the expected MinHash pairs → per-doc
    (cluster_id, keep) — no star contraction, no bucketing."""
    pairs = dedup_minhash_pairs(sf_dir, corpus_root, threshold=threshold)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in zip(
        pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()
    ):
        union(int(a), int(b))
    # union always parents the larger root under the smaller, so each
    # component's root IS its minimum doc_id
    ids = _documents(sf_dir).column("doc_id").to_numpy(zero_copy_only=False)
    cluster = np.array([find(int(i)) for i in ids], dtype=np.int64)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "cluster_id": pa.array(cluster, type=pa.int64()),
            "keep": pa.array((ids == cluster).astype(np.int64)),
        }
    )


def dedup_embedding_lsh_pairs(
    sf_dir: str,
    corpus_root: str,
    threshold: float = 0.35,
    n_bits: int = 8,
    n_tables: int = 8,
    bucket_cap: int = 2000,
) -> pa.Table:
    from rust_bert_ray.functions.similarity import _srp_hash, _srp_planes
    from rust_bert_ray.functions.util import round_ha

    t = _embeddings(sf_dir)
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    M = embedding_matrix(t.column("embedding"))
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    pairs: dict[tuple[int, int], float] = {}
    for tab in range(n_tables):
        srp = _srp_hash(_srp_planes(M.shape[1], n_bits, seed=11 + tab), M)
        order = np.lexsort((ids, srp))
        groups: dict[int, list[int]] = {}
        for i in order:
            groups.setdefault(int(srp[i]), []).append(int(i))
        for members in groups.values():
            m = np.array(members[:bucket_cap])
            if len(m) < 2:
                continue
            sub = Mn[m]
            cos = sub @ sub.T
            iu, ju = np.triu_indices(len(m), 1)
            c = round_ha(cos[iu, ju], 5)
            keep = c >= threshold
            for i, j, v in zip(iu[keep], ju[keep], c[keep]):
                pairs.setdefault((int(ids[m[i]]), int(ids[m[j]])), float(v))
    rows = sorted(pairs.items())
    return pa.Table.from_pydict(
        {
            "vec_a": pa.array([k[0] for k, _ in rows], type=pa.int64()),
            "vec_b": pa.array([k[1] for k, _ in rows], type=pa.int64()),
            "cos": pa.array([v for _, v in rows], type=pa.float64()),
        }
    )


# ----------------------------------------------------- ANN (independent numpy)

def _ann_common(sf_dir: str, query_vec_id: int = 0):
    t = _embeddings(sf_dir)
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    M = embedding_matrix(t.column("embedding"))
    qi = int(np.nonzero(ids == query_vec_id)[0][0])
    q = M[qi]
    return ids, M, q


def _topk_table(ids, cos, k: int = 10) -> pa.Table:
    df = pd.DataFrame({"vec_id": ids, "cos": cos}).sort_values(
        ["cos", "vec_id"], ascending=[False, True]
    ).head(k)
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array(df["vec_id"].to_numpy(), type=pa.int64()),
            "cos": pa.array(df["cos"].to_numpy(), type=pa.float64()),
        }
    )


def ann_lsh_topk(
    sf_dir: str, corpus_root: str, query_vec_id: int = 0, k: int = 10,
    n_bits: int = 8,
) -> pa.Table:
    from rust_bert_ray.functions.similarity import _srp_hash, _srp_planes
    from rust_bert_ray.functions.util import round_ha

    ids, M, q = _ann_common(sf_dir, query_vec_id)
    planes = _srp_planes(M.shape[1], n_bits)
    q_bucket = int(_srp_hash(planes, q[None, :])[0])
    near = {q_bucket} | {q_bucket ^ (1 << b) for b in range(n_bits)}
    buckets = _srp_hash(planes, M)
    keep = np.array(
        [b in near and i != query_vec_id for b, i in zip(buckets, ids)]
    )
    qn = q / max(np.linalg.norm(q), 1e-300)
    norms = np.maximum(np.linalg.norm(M[keep], axis=1), 1e-300)
    cos = round_ha((M[keep] @ qn) / norms, 5)
    return _topk_table(ids[keep], cos, k)


def ann_ivf_topk(
    sf_dir: str, corpus_root: str, query_vec_id: int = 0, k: int = 10,
    n_centroids: int = 32, n_probe: int = 4, sample_rows: int = 256,
) -> pa.Table:
    from rust_bert_ray.functions.similarity import (
        kmeans_centroids,
        strided_sample_indices,
    )
    from rust_bert_ray.functions.util import round_ha

    ids, M, q = _ann_common(sf_dir, query_vec_id)
    # seeded spherical k-means over the strided row-group sample (the
    # sample SPEC is shared — metadata-derived row indices — while the
    # assignment/probe/score algebra is recomputed here independently)
    idxs = strided_sample_indices(
        os.path.join(sf_dir, "embeddings.parquet"), sample_rows
    )
    C = kmeans_centroids(M[idxs], n_centroids)
    qn = q / max(np.linalg.norm(q), 1e-300)
    probe = set(np.argsort(-(C @ qn))[:n_probe].tolist())
    norms = np.maximum(np.linalg.norm(M, axis=1), 1e-300)
    An = M / norms[:, None]
    assign = (An @ C.T).argmax(axis=1)
    keep = np.array(
        [a in probe and i != query_vec_id for a, i in zip(assign, ids)]
    )
    # divide-after-matmul, matching the scoring kernel's float-op order
    cos = round_ha((M[keep] @ qn) / norms[keep], 5)
    return _topk_table(ids[keep], cos, k)


def ann_pq_topk(
    sf_dir: str, corpus_root: str, query_vec_id: int = 0, k: int = 10,
    m: int = 8, n_centroids: int = 16, sample_rows: int = 256,
) -> pa.Table:
    """PQ/ADC reference: codebook training and code packing share the
    float kernels (pq_codebooks/pq_encode — the embedding-parity helper
    pattern); the ADC lookup-sum, exclusion, and top-k ranking are
    re-derived here with a plain left-to-right loop (elementwise adds in
    subspace order — the same float-op order the distributed kernel
    documents)."""
    from rust_bert_ray.functions.similarity import pq_codebooks, pq_encode
    from rust_bert_ray.functions.util import round_ha

    ids, M, q = _ann_common(sf_dir, query_vec_id)
    A = M.astype(np.float64)
    An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
    books = pq_codebooks(sf_dir, m, n_centroids, sample_rows)
    codes = pq_encode(An, books)
    qn = q / max(np.linalg.norm(q), 1e-300)
    d = len(qn) // m
    dist = None
    for j in range(m):
        table = ((qn[j * d : (j + 1) * d][None, :] - books[j]) ** 2).sum(axis=1)
        term = table[(codes >> (4 * j)) & 15]
        dist = term if dist is None else dist + term
    dist = round_ha(dist, 5)
    keep = ids != query_vec_id
    df = pd.DataFrame({"vec_id": ids[keep], "dist": dist[keep]}).sort_values(
        ["dist", "vec_id"], ascending=[True, True]
    ).head(k)
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array(df["vec_id"].to_numpy(), type=pa.int64()),
            "dist": pa.array(df["dist"].to_numpy(), type=pa.float64()),
        }
    )


def ann_ivfpq_topk(
    sf_dir: str, corpus_root: str, query_vec_id: int = 0, k: int = 10,
    n_centroids: int = 32, n_probe: int = 8, m: int = 8,
    pq_k: int = 16, sample_rows: int = 256,
) -> pa.Table:
    """IVF-PQ reference: coarse centroids and PQ codebooks/encode share
    the float kernels; bucket assignment, probe-set selection, the ADC
    loop, exclusion, and ranking are re-derived independently."""
    from rust_bert_ray.functions.similarity import (
        kmeans_centroids,
        pq_codebooks,
        pq_encode,
        strided_sample_indices,
    )
    from rust_bert_ray.functions.util import round_ha

    ids, M, q = _ann_common(sf_dir, query_vec_id)
    A = M.astype(np.float64)
    An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
    idxs = strided_sample_indices(
        os.path.join(sf_dir, "embeddings.parquet"), sample_rows
    )
    C = kmeans_centroids(M[idxs], n_centroids)
    books = pq_codebooks(sf_dir, m, pq_k, sample_rows)
    codes = pq_encode(An, books)
    qn = q / max(np.linalg.norm(q), 1e-300)
    probe = set(np.argsort(-(C @ qn))[:n_probe].tolist())
    assign = (An @ C.T).argmax(axis=1)
    d = len(qn) // m
    dist = None
    for j in range(m):
        table = ((qn[j * d : (j + 1) * d][None, :] - books[j]) ** 2).sum(axis=1)
        term = table[(codes >> (4 * j)) & 15]
        dist = term if dist is None else dist + term
    dist = round_ha(dist, 5)
    keep = np.array(
        [a in probe and i != query_vec_id for a, i in zip(assign, ids)]
    )
    df = pd.DataFrame({"vec_id": ids[keep], "dist": dist[keep]}).sort_values(
        ["dist", "vec_id"], ascending=[True, True]
    ).head(k)
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array(df["vec_id"].to_numpy(), type=pa.int64()),
            "dist": pa.array(df["dist"].to_numpy(), type=pa.float64()),
        }
    )


def ann_pq_rerank_topk(
    sf_dir: str, corpus_root: str, query_vec_id: int = 0, k: int = 10,
    shortlist: int = 64, m: int = 8, n_centroids: int = 16,
    sample_rows: int = 256,
) -> pa.Table:
    """Widen-then-rerank reference: the PQ shortlist comes from the
    ann_pq_topk builder above (shared encode/ADC spec); the exact
    cosine rerank and final ranking are re-derived with the brute-force
    kernel (divide-after-matmul order, matching CosineScore)."""
    from rust_bert_ray.functions.util import round_ha

    short = ann_pq_topk(
        sf_dir, corpus_root, query_vec_id, shortlist, m, n_centroids, sample_rows
    )
    keep_ids = set(short.column("vec_id").to_pylist())
    ids, M, q = _ann_common(sf_dir, query_vec_id)
    qn = q / max(np.linalg.norm(q), 1e-300)
    norms = np.maximum(np.linalg.norm(M, axis=1), 1e-300)
    cos = round_ha((M @ qn) / norms, 5)
    mask = np.array(
        [i in keep_ids and i != query_vec_id for i in ids]
    )
    return _topk_table(ids[mask], cos[mask], k)


def ann_ivfpq_topk_many(
    sf_dir: str, corpus_root: str, k: int = 10,
    n_centroids: int = 32, n_probe: int = 8, m: int = 8,
    pq_k: int = 16, sample_rows: int = 256,
) -> pa.Table:
    """Batched-query IVF-PQ reference: the single-query builder above
    run per query vec_id (every branch keeps its independently-derived
    assign/probe/ADC/ranking spec), tagged and concatenated — per-query
    results MUST equal ann_ivfpq_topk's, which is exactly what the
    distributed union-of-probed-files scan promises."""
    from rust_bert_ray.functions.similarity import MANY_QUERY_VEC_IDS

    parts = []
    for qid in MANY_QUERY_VEC_IDS:
        t = ann_ivfpq_topk(
            sf_dir, corpus_root, qid, k, n_centroids, n_probe, m,
            pq_k, sample_rows,
        )
        parts.append(
            t.add_column(
                0,
                "query_vec_id",
                pa.array(np.full(t.num_rows, qid, dtype=np.int64), type=pa.int64()),
            )
        )
    return pa.concat_tables(parts)


def ann_pq_topk_many(
    sf_dir: str, corpus_root: str, k: int = 10,
    m: int = 8, n_centroids: int = 16, sample_rows: int = 256,
) -> pa.Table:
    """Batched-query PQ reference: the single-query builder above run
    per query vec_id (so every branch keeps its independently-derived
    ADC/ranking spec), tagged and concatenated — the per-query results
    MUST equal ann_pq_topk's, which is exactly what the distributed
    ``ann_pq_topk_many`` promises of its one-scan amortization."""
    from rust_bert_ray.functions.similarity import MANY_QUERY_VEC_IDS

    parts = []
    for qid in MANY_QUERY_VEC_IDS:
        t = ann_pq_topk(sf_dir, corpus_root, qid, k, m, n_centroids, sample_rows)
        parts.append(
            t.add_column(
                0,
                "query_vec_id",
                pa.array(np.full(t.num_rows, qid, dtype=np.int64), type=pa.int64()),
            )
        )
    return pa.concat_tables(parts)


def q_bpe_merges(
    sf_dir: str, corpus_root: str, n_merges: int = 40,
    min_count: int = 2, max_words: int = 100_000,
) -> pa.Table:
    """Independent BPE-trainer reference: Counter word count over the
    raw table, the same (count desc, word asc) head-``max_words`` cap
    spec, then a tuple-based merge loop written independently of
    functions/bpe_train.merge_loop (pure-integer algebra — any
    divergence in pair counting, tie-break, or merge application flips
    the hash)."""
    from collections import Counter

    t = _documents(sf_dir)
    c: Counter = Counter()
    for text in t.column("text").to_pylist():
        c.update(text.split(" "))
    kept = sorted(
        ((w, n) for w, n in c.items() if n >= min_count),
        key=lambda kv: (-kv[1], kv[0]),
    )[:max_words]

    seqs: list[tuple] = []
    weights: list[int] = []
    for w, n in kept:
        if not w:
            continue
        syms = tuple(w)
        seqs.append(syms[:-1] + (syms[-1] + "</w>",))
        weights.append(int(n))

    rows = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in zip(seqs, weights):
            for j in range(len(syms) - 1):
                pairs[(syms[j], syms[j + 1])] += n
        if not pairs:
            break
        (left, right), best = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best < 2:
            break
        rows.append((rank, left, right, best))
        merged = left + right
        out = []
        for syms in seqs:
            new: list[str] = []
            j = 0
            while j < len(syms):
                if (
                    j < len(syms) - 1
                    and syms[j] == left
                    and syms[j + 1] == right
                ):
                    new.append(merged)
                    j += 2
                else:
                    new.append(syms[j])
                    j += 1
            out.append(tuple(new))
        seqs = out
    return pa.Table.from_pydict(
        {
            "rank": pa.array([r[0] for r in rows], pa.int64()),
            "left": pa.array([r[1] for r in rows], pa.string()),
            "right": pa.array([r[2] for r in rows], pa.string()),
            "pair_count": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def q_bpe_tokens(sf_dir: str, corpus_root: str, n_merges: int = 40) -> pa.Table:
    """Independent BPE-apply reference: merges come from the q_bpe_merges
    builder above; per word, each iteration enumerates (rank, position)
    candidates and merges min((rank, position)) — the same lowest-rank,
    leftmost-tie spec as the distributed stage, mechanized differently.
    Output spec: n tokens + crc32 of the space-joined token stream."""
    import zlib

    m = q_bpe_merges(sf_dir, corpus_root, n_merges=n_merges)
    ranks = {
        (l, r): k
        for k, l, r in zip(
            m.column("rank").to_pylist(),
            m.column("left").to_pylist(),
            m.column("right").to_pylist(),
        )
    }

    def word_tokens(w: str) -> tuple:
        syms = tuple(w[:-1]) + (w[-1] + "</w>",)
        while True:
            cand = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cand:
                return syms
            _, i = min(cand)
            syms = syms[:i] + (syms[i] + syms[i + 1],) + syms[i + 2 :]

    t = _documents(sf_dir)
    ids, ns, crcs = [], [], []
    memo: dict[str, tuple] = {}
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        toks: list[str] = []
        for w in text.split(" "):
            if not w:
                continue
            got = memo.get(w)
            if got is None:
                got = word_tokens(w)
                memo[w] = got
            toks.extend(got)
        ids.append(doc_id)
        ns.append(len(toks))
        crcs.append(zlib.crc32(" ".join(toks).encode()))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_bpe_tokens": pa.array(ns, pa.int64()),
            "token_crc": pa.array(crcs, pa.int64()),
        }
    )


def q_unigram_vocab(
    sf_dir: str, corpus_root: str, vocab_size: int = 200,
    min_count: int = 2, max_words: int = 100_000, max_piece: int = 4,
) -> pa.Table:
    """Independent unigram-trainer reference: Counter word count,
    per-length substring window counting (vs the trainer's per-start
    nested scan), the same (count desc, piece asc) top-V +
    char-coverage selection spec; the fixed-point log weight shares the
    piece_weights kernel (the one float step)."""
    from collections import Counter

    from rust_bert_ray.functions.unigram_train import piece_weights

    t = _documents(sf_dir)
    c: Counter = Counter()
    for text in t.column("text").to_pylist():
        c.update(text.split(" "))
    kept = sorted(
        ((w, n) for w, n in c.items() if n >= min_count),
        key=lambda kv: (-kv[1], kv[0]),
    )[:max_words]

    pieces: Counter = Counter()
    for w, n in kept:
        if not w:
            continue
        for length in range(1, max_piece + 1):
            for i in range(len(w) - length + 1):
                pieces[w[i : i + length]] += n

    chars = {p: c_ for p, c_ in pieces.items() if len(p) == 1}
    vocab = dict(chars)
    for p, c_ in sorted(
        ((p, c_) for p, c_ in pieces.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    ):
        if len(vocab) >= max(vocab_size, len(chars)):
            break
        vocab[p] = c_
    weights = piece_weights(vocab)
    ordered = sorted(vocab)
    return pa.Table.from_pydict(
        {
            "piece": pa.array(ordered, pa.string()),
            "count": pa.array([vocab[p] for p in ordered], pa.int64()),
            "weight": pa.array([weights[p] for p in ordered], pa.int64()),
        }
    )


def q_unigram_tokens(sf_dir: str, corpus_root: str, max_piece: int = 4) -> pa.Table:
    """Independent unigram-apply reference: backward-memoized recursion
    over suffixes (vs the stage's forward DP), same total order —
    (score, -n_tokens, piece-end tuple compared descending)."""
    import sys
    import zlib

    v = q_unigram_vocab(sf_dir, corpus_root)
    weights = dict(
        zip(v.column("piece").to_pylist(), v.column("weight").to_pylist())
    )

    def segment(word: str) -> list[str]:
        memo: dict[int, tuple] = {len(word): (0, 0, ())}

        def best(i: int) -> tuple | None:
            got = memo.get(i)
            if got is not None or i in memo:
                return got
            top = None
            for j in range(i + 1, min(i + max_piece, len(word)) + 1):
                w = weights.get(word[i:j])
                if w is None:
                    continue
                sub = best(j)
                if sub is None:
                    continue
                cand = (w + sub[0], -1 + sub[1], (j,) + sub[2])
                if top is None or cand > top:
                    top = cand
            memo[i] = top
            return top

        got = best(0)
        if got is None:
            return list(word)
        toks, prev = [], 0
        for j in got[2]:
            toks.append(word[prev:j])
            prev = j
        return toks

    t = _documents(sf_dir)
    ids, ns, crcs = [], [], []
    memo: dict[str, list[str]] = {}
    sys.setrecursionlimit(10_000)
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        toks: list[str] = []
        for w in text.split(" "):
            if not w:
                continue
            got = memo.get(w)
            if got is None:
                got = segment(w)
                memo[w] = got
            toks.extend(got)
        ids.append(doc_id)
        ns.append(len(toks))
        crcs.append(zlib.crc32(" ".join(toks).encode()))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_uni_tokens": pa.array(ns, pa.int64()),
            "token_crc": pa.array(crcs, pa.int64()),
        }
    )


# ------------------------------------------------------------------ registry





def q_lm_scores(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent re-derivation of LmScoreStage's spec: crc bigram
    logits over the 16-word base vocab + actual token, incremental
    2-token context, nll = logsumexp - logit(actual), 5-dp half-away
    rounding.  Does NOT import the stage."""
    import zlib

    from rust_bert_ray.functions.util import round_ha

    vocab16 = _GEN_VOCAB[:-1]
    docs = _documents(sf_dir)
    out_id, out_n, out_nll = [], [], []
    memo = {}
    for doc_id, text in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        toks = text.split(" ")
        if len(toks) < 2:
            continue
        s_acc = 0.0
        for i in range(1, len(toks)):
            ctx = tuple(toks[max(0, i - 2) : i])
            j = "\x00".join(ctx)
            got = memo.get(ctx)
            if got is None:
                base = np.array(
                    [
                        (zlib.crc32(f"{j}|{t}".encode("utf-8")) % 1000) / 100.0
                        for t in vocab16
                    ],
                    dtype=np.float64,
                )
                got = float(np.sum(np.exp(base)))
                memo[ctx] = got
            a = (zlib.crc32(f"{j}|{toks[i]}".encode("utf-8")) % 1000) / 100.0
            s_acc += float(np.log(got + np.exp(a)) - a)
        out_id.append(doc_id)
        out_n.append(len(toks) - 1)
        out_nll.append(float(round_ha(s_acc / (len(toks) - 1), 5)))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "n_scored": pa.array(out_n, pa.int64()),
            "avg_nll": pa.array(out_nll, pa.float64()),
        }
    )


# --------------------------------- embedding k-means / SemDeDup (independent)
# Independent single-process re-derivation of clustering.py's semantics:
# the assignment here uses the DIRECT squared-distance formula
# ((x-c)^2 summed) where the Ray side uses the expanded ||c||^2 - 2x.c
# form — both are exact integer arithmetic in float64 (micro-unit
# quantized vectors, every term < 2^53), so the argmins agree by
# mathematics, not by shared float luck.  Sums/centroid updates are
# exact int64 with floor division on both sides.

def _quant_embeddings(sf_dir: str):
    t = _embeddings(sf_dir)
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    x = embedding_matrix(t.column("embedding")) * 1e6
    return ids, np.copysign(np.floor(np.abs(x) + 0.5), x)


def _kmeans_expected(ids, xq, k: int = 8, iters: int = 4):
    h = (
        (ids.astype(np.uint64) % np.uint64(4294967296))
        * np.uint64(2654435761)
        % np.uint64(4294967296)
    )
    order = np.lexsort((ids, h))
    cent = xq[order[:k]].copy()
    for _ in range(iters):
        d2 = ((xq[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                cent[j] = np.floor_divide(
                    xq[m].sum(axis=0).astype(np.int64), int(m.sum())
                ).astype(np.float64)
    d2 = ((xq[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return cent, d2.argmin(axis=1)


def q_embed_clusters(sf_dir: str, corpus_root: str) -> pa.Table:
    ids, xq = _quant_embeddings(sf_dir)
    _, a = _kmeans_expected(ids, xq)
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
        }
    )


def dedup_semantic(
    sf_dir: str, corpus_root: str, threshold: float = 0.38, k: int = 8
) -> pa.Table:
    from rust_bert_ray.functions.util import round_ha

    ids, xq = _quant_embeddings(sf_dir)
    _, a = _kmeans_expected(ids, xq, k=k)
    va, vb, cl, cs = [], [], [], []
    for j in range(k):
        m = np.nonzero(a == j)[0]
        m = m[np.argsort(ids[m], kind="mergesort")]
        if len(m) < 2:
            continue
        x = xq[m]
        g = x @ x.T  # exact integer dots — order-independent
        n = (x * x).sum(axis=1)
        cos = round_ha(g / np.sqrt(np.outer(n, n)), 5)
        iu, ju = np.triu_indices(len(m), k=1)
        keep = cos[iu, ju] >= threshold
        va.extend(ids[m][iu[keep]].tolist())
        vb.extend(ids[m][ju[keep]].tolist())
        cl.extend([j] * int(keep.sum()))
        cs.extend(cos[iu, ju][keep].tolist())
    return pa.Table.from_pydict(
        {
            "vec_a": pa.array(va, pa.int64()),
            "vec_b": pa.array(vb, pa.int64()),
            "cluster": pa.array(cl, pa.int64()),
            "cos": pa.array(cs, pa.float64()),
        }
    )


def q_dsir_weights(sf_dir: str, corpus_root: str) -> pa.Table:
    """Independent DSIR re-derivation: Counter-based distribution pass
    and per-doc Python-loop scoring (no bincount/reduceat, no Ray) —
    same crc32 bucketing and integer log-ratio spec as the query.

    Weight formula (the spec both sides implement): with Laplace
    smoothing, w_b = rint(1e6 * log(((n_tgt+1)*(S_raw+B)) /
    ((n_raw+1)*(S_tgt+B)))) — exact integer products, one float divide.
    """
    from collections import Counter

    from rust_bert_ray.functions.text import DSIR_TARGET_SOURCES

    B = 4096
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )

    def grams(text: str) -> list[int]:
        w = text.split()
        uni = [zlib.crc32(x.encode()) % B for x in w]
        bi = [zlib.crc32(f"{a} {b}".encode()) % B for a, b in zip(w, w[1:])]
        return uni + bi

    raw: Counter = Counter()
    tgt: Counter = Counter()
    docs = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("source").to_pylist(),
        )
    )
    for _, text, source in docs:
        g = grams(text)
        raw.update(g)
        if source in DSIR_TARGET_SOURCES:
            tgt.update(g)
    s_raw, s_tgt = sum(raw.values()), sum(tgt.values())
    w = np.empty(B, dtype=np.int64)
    for b in range(B):
        num = (tgt[b] + 1) * (s_raw + B)
        den = (raw[b] + 1) * (s_tgt + B)
        w[b] = int(np.rint(1_000_000 * np.log(num / den)))

    ids, scores, n_grams = [], [], []
    for doc_id, text, _ in docs:
        g = grams(text)
        ids.append(doc_id)
        scores.append(int(sum(int(w[b]) for b in g)))
        n_grams.append(len(g))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "dsir_score": pa.array(scores, pa.int64()),
            "n_grams": pa.array(n_grams, pa.int64()),
        }
    )


# ------------------------------------ RAG search (independent rerun) ----

def rag_search(sf_dir: str, corpus_root: str, k: int = 10) -> pa.Table:
    """Straight-line reimplementation of pipelines/rag.rag_search:
    plain-loop chunking, inline SRP sign-hash (same seeded planes
    constant), full cosine scan filtered to the probed buckets.  Shares
    ONLY the embedder floats (the documented embedding-parity helper
    pattern) — chunk/window/hash/score/tie-break logic is re-derived."""
    from rust_bert_ray.pipelines.rag import RAG_QUERY

    return _rag_search_impl(sf_dir, RAG_QUERY, k)


def _rag_search_impl(sf_dir: str, query: str, k: int) -> pa.Table:
    from rust_bert_ray.functions.util import round_ha
    from rust_bert_ray.pipelines.rag import RAG_N_BITS, _embedder

    chunk_words, overlap = 32, 8
    step = chunk_words - overlap
    emb = _embedder()
    t = _documents(sf_dir)
    rows = []  # (doc_id, chunk_idx, text, vec)
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        words = text.split(" ")
        n = len(words)
        start, ci = 0, 0
        while True:
            end = min(start + chunk_words, n)
            ct = " ".join(words[start:end])
            rows.append((doc_id, ci, ct, emb.embed(ct).astype(np.float32)))
            ci += 1
            start += step
            if end == n or start >= max(n - overlap, 1):
                break
    planes = np.random.default_rng(11).standard_normal((RAG_N_BITS, emb.out_dim))
    A = np.stack([r[3] for r in rows]).astype(np.float64)
    bits = (A @ planes.T) > 0
    buckets = np.zeros(len(A), dtype=np.int64)
    for b in range(RAG_N_BITS):
        buckets |= bits[:, b].astype(np.int64) << b

    qv = emb.embed(query).astype(np.float64)
    qbits = (qv[None, :] @ planes.T) > 0
    q_bucket = 0
    for b in range(RAG_N_BITS):
        q_bucket |= int(qbits[0, b]) << b
    near = {q_bucket} | {q_bucket ^ (1 << b) for b in range(RAG_N_BITS)}

    qhat = qv / max(np.linalg.norm(qv), 1e-300)
    norms = np.maximum(np.linalg.norm(A, axis=1), 1e-300)
    cos = round_ha((A @ qhat) / norms, 5)
    cand = [
        (float(cos[i]), rows[i][0], rows[i][1], rows[i][2])
        for i in range(len(rows))
        if int(buckets[i]) in near
    ]
    cand.sort(key=lambda r: (-r[0], r[1], r[2]))
    cand = cand[:k]
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([c[1] for c in cand], pa.int64()),
            "chunk_idx": pa.array([c[2] for c in cand], pa.int64()),
            "cos": pa.array([c[0] for c in cand], pa.float64()),
            "chunk_text": pa.array([c[3] for c in cand], pa.string()),
        }
    )


def rag_search_many(sf_dir: str, corpus_root: str, k: int = 10) -> pa.Table:
    """Batched-query dense-retrieval reference: the independent
    single-query spec above run per MANY_QUERIES entry (each branch
    keeps its own chunk/hash/scan/tie-break re-derivation), tagged and
    concatenated — per-query results MUST equal rag_search's for the
    same query text."""
    from rust_bert_ray.functions.search import MANY_QUERIES

    parts = []
    for qid, q in sorted(MANY_QUERIES.items()):
        t = _rag_search_impl(sf_dir, q, k)
        parts.append(
            t.add_column(
                0,
                "query_id",
                pa.array(np.full(t.num_rows, qid, dtype=np.int64), type=pa.int64()),
            )
        )
    return pa.concat_tables(parts)


def rerank_search(sf_dir: str, corpus_root: str, k: int = 10) -> pa.Table:
    """Retrieve-then-rerank reference: candidates come from the
    independent rag_search builder above (plain-loop chunking, inline
    SRP), widened to the rerank pool; pair scoring shares ONLY the
    CrossEncoderStage float kernel (the embedding-parity helper
    pattern); pool/sort/tie-break logic is re-derived here."""
    from rust_bert_ray.functions.search import RERANK_POOL, CrossEncoderStage
    from rust_bert_ray.pipelines.rag import RAG_QUERY

    cand = rag_search(sf_dir, corpus_root, k=RERANK_POOL)
    stage = CrossEncoderStage(RAG_QUERY)
    scores = stage.score_batch(cand.column("chunk_text").to_pylist())
    rows = sorted(
        zip(
            [float(s) for s in scores],
            cand.column("doc_id").to_pylist(),
            cand.column("chunk_idx").to_pylist(),
        ),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:k]
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
            "chunk_idx": pa.array([r[2] for r in rows], pa.int64()),
            "ce_score": pa.array([r[0] for r in rows], pa.float64()),
        }
    )


def rerank_search_many(sf_dir: str, corpus_root: str, k: int = 10) -> pa.Table:
    """Batched retrieve-then-rerank reference: the single-query rerank
    spec above run per MANY_QUERIES entry — candidates from the
    independent ``_rag_search_impl`` re-derivation widened to the rerank
    pool, pair scoring sharing ONLY the CrossEncoderStage float kernel,
    pool/sort/tie-break logic re-derived here — tagged and concatenated.
    Per-query rows MUST equal rerank_search's for the same query text."""
    from rust_bert_ray.functions.search import (
        MANY_QUERIES,
        RERANK_POOL,
        CrossEncoderStage,
    )

    parts = []
    for qid, q in sorted(MANY_QUERIES.items()):
        cand = _rag_search_impl(sf_dir, q, RERANK_POOL)
        stage = CrossEncoderStage(q)
        scores = stage.score_batch(cand.column("chunk_text").to_pylist())
        rows = sorted(
            zip(
                [float(s) for s in scores],
                cand.column("doc_id").to_pylist(),
                cand.column("chunk_idx").to_pylist(),
            ),
            key=lambda r: (-r[0], r[1], r[2]),
        )[:k]
        parts.append(
            pa.Table.from_pydict(
                {
                    "query_id": pa.array(
                        np.full(len(rows), qid, dtype=np.int64), pa.int64()
                    ),
                    "doc_id": pa.array([r[1] for r in rows], pa.int64()),
                    "chunk_idx": pa.array([r[2] for r in rows], pa.int64()),
                    "ce_score": pa.array([r[0] for r in rows], pa.float64()),
                }
            )
        )
    return pa.concat_tables(parts)


# ----------------------------------------- k-core (independent peel) ----

def kg_kcore(sf_dir: str, corpus_root: str, k: int = 3) -> pa.Table:
    """Sequential reference k-core: classic repeated peel over an
    adjacency dict — algorithmically independent of the distributed
    round-based filter in functions/graph.py (only the k-core
    *definition* is shared).  Emits (node_id, within-core degree)."""
    e = kg_edges(sf_dir, corpus_root)
    subj = e.column("subj_id").to_pylist()
    obj = e.column("obj_id").to_pylist()
    pairs = {
        (min(s, o), max(s, o)) for s, o in zip(subj, obj) if s != o
    }
    adj: dict[str, set[str]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                if m in adj:
                    adj[m].discard(n)
            changed = True
    rows = sorted(adj.items())
    return pa.Table.from_pydict(
        {
            "node_id": pa.array([n for n, _ in rows], pa.string()),
            "core_deg": pa.array([len(nb) for _, nb in rows], pa.int64()),
        }
    )


BUILDERS = {
    "q_generate": q_generate,
    "q_summarize": q_summarize,
    "q_translate": q_translate,
    "q_translate_m2m": q_translate_m2m,
    "q_pos_tags": q_pos_tags,
    "q_embed_docs": q_embed_docs,
    "q_embed_dense": q_embed_dense,
    "q_keywords": q_keywords,
    "q_masked_lm": q_masked_lm,
    "qa_answers": qa_answers,
    "q_conversation": q_conversation,
    "kg_media_frames": kg_media_frames,
    "kg_media_resize": kg_media_resize,
    "q_lang_id": q_lang_id,
    "q_decode": q_decode,
    "q_decode_bpe": q_decode_bpe,
    "q_decode_hf": q_decode_hf,
    "q_decode_hf_unigram": q_decode_hf_unigram,
    "q_decode_hf_suffix": q_decode_hf_suffix,
    "q_decode_hf_metaspace": q_decode_hf_metaspace,
    "q_decode_hf_spbpe": q_decode_hf_spbpe,
    "q_decode_unigram": q_decode_unigram,
    "q_pack_sequences": q_pack_sequences,
    "q_fingerprints": q_fingerprints,
    "kg_nodes": kg_nodes,
    "kg_edges": kg_edges,
    "kg_media_features": kg_media_features,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_incremental_minhash": dedup_incremental_minhash,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_embedding_lsh_pairs": dedup_embedding_lsh_pairs,
    "dedup_clusters_minhash": dedup_clusters_minhash,
    "ann_lsh_topk": ann_lsh_topk,
    "q_embed_clusters": q_embed_clusters,
    "q_lm_scores": q_lm_scores,
    "dedup_semantic": dedup_semantic,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_pq_topk_many": ann_pq_topk_many,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "ann_ivfpq_topk_many": ann_ivfpq_topk_many,
    "ann_pq_rerank_topk": ann_pq_rerank_topk,
    "q_bpe_merges": q_bpe_merges,
    "q_bpe_tokens": q_bpe_tokens,
    "q_unigram_vocab": q_unigram_vocab,
    "q_unigram_tokens": q_unigram_tokens,
    "q_dsir_weights": q_dsir_weights,
    "kg_kcore": kg_kcore,
    "rag_search": rag_search,
    "rag_search_many": rag_search_many,
    "rerank_search": rerank_search,
    "rerank_search_many": rerank_search_many,
}


def expected_path(sf_name: str, query: str) -> str:
    return os.path.join(EXPECTED_ROOT, sf_name, f"{query}.parquet")


def ensure_expected(sf_dir: str, corpus_root: str) -> str:
    """Write every expected table for ``sf_dir``; idempotent (versioned
    marker).  Single-process by design — never touches Ray."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(EXPECTED_ROOT, sf_name)
    marker = os.path.join(out_dir, f".complete-v{VERSION}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for name, builder in BUILDERS.items():
        # write-then-rename: a concurrent reader (the DuckDB oracle) never
        # sees a partially written parquet
        final = expected_path(sf_name, name)
        tmp = final + f".tmp-{os.getpid()}"
        pq.write_table(builder(sf_dir, corpus_root), tmp)
        os.replace(tmp, final)
    with open(marker + f".tmp-{os.getpid()}", "w") as f:
        f.write("ok")
    os.replace(marker + f".tmp-{os.getpid()}", marker)
    return out_dir
