"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline primitives: token counting, quality
scoring, language-ID (n-gram heuristic), document fingerprinting.  All
vectorized (pyarrow.compute / pandas str ops) inside ``map_batches``;
stateful pieces (compiled regexes, stopword tables, language profiles)
live in actor ``__init__``.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rust_bert_ray.functions.util import pc_round_ha


def _read_documents(sf_dir: str, columns: list[str] | None = None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


# ------------------------------------------------------------ token counts

def q_token_counts(sf_dir: str):
    """Per-document token count (single-space tokenization, fully vectorized)."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n_spaces = pc.count_substring(t.column("text"), " ")
        # int64 to match DuckDB BIGINT exactly (value-hash dtype parity)
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pc.cast(pc.add(n_spaces, 1), pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=65536)


Q_TOKEN_COUNTS_SQL = """
SELECT doc_id,
       length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
FROM documents
"""


# ----------------------------------------------------------- quality score

# quality-filter stopword probe (subset of the documents-table vocab so
# the ratio is non-trivial on the synthetic corpus)
QUALITY_STOPWORDS = ["a", "the"]


def q_doc_quality(sf_dir: str):
    """Per-document quality features: token count, mean token length,
    distinct-token ratio (repetitiveness) and stopword ratio — the usual
    heuristic quality filters of a training-data pipeline, fully
    vectorized (Arrow split + is_in + reduceat; no Python row loop)."""
    import numpy as np

    docs = _read_documents(sf_dir, ["doc_id", "text", "n_chars"])
    sw = pa.array(QUALITY_STOPWORDS, type=pa.string())

    def fn(t: pa.Table) -> pa.Table:
        n_tokens = pc.cast(
            pc.add(pc.count_substring(t.column("text"), " "), 1), pa.int64()
        )
        n_chars = pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        # single-space separated → token chars = n_chars - (n_tokens - 1)
        token_chars = pc.subtract(n_chars, pc.subtract(n_tokens, 1))
        nt_f = pc.cast(n_tokens, pa.float64())
        avg_len = pc_round_ha(
            pc.divide(pc.cast(token_chars, pa.float64()), nt_f), 5
        )
        # token lists once; per-row sums via reduceat over list offsets
        toks = pc.split_pattern(t.column("text"), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = toks.offsets.to_numpy(zero_copy_only=False)[:-1]
        flat = toks.values  # paired with .offsets (absolute indices)
        is_sw = pc.is_in(flat, value_set=sw).to_numpy(zero_copy_only=False)
        sw_counts = np.add.reduceat(is_sw.astype(np.int64), offsets)
        nt = n_tokens.to_numpy(zero_copy_only=False)
        from rust_bert_ray.functions.util import round_ha

        # distinct ratio: unique tokens per row (sorted-run trick on the
        # flat token array would need per-row sort; use pandas nunique on
        # the exploded frame — still columnar, no Python loop)
        import pandas as pd

        row_ids = np.repeat(np.arange(len(nt)), nt)
        distinct = (
            pd.DataFrame({"r": row_ids, "t": flat.to_pandas()})
            .groupby("r")["t"].nunique().to_numpy()
        )
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": n_tokens,
                "avg_token_len": avg_len,
                "distinct_ratio": pa.array(
                    round_ha(distinct / nt, 5), type=pa.float64()
                ),
                "stopword_ratio": pa.array(
                    round_ha(sw_counts / nt, 5), type=pa.float64()
                ),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=65536)


Q_DOC_QUALITY_SQL = """
SELECT doc_id,
       length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
       ROUND((length(text) - (length(text) - length(replace(text, ' ', '')))) * 1.0
             / (length(text) - length(replace(text, ' ', '')) + 1), 5) AS avg_token_len,
       ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
             / len(string_split(text, ' ')), 5) AS distinct_ratio,
       ROUND(len(list_filter(string_split(text, ' '),
                             t -> list_contains(['a', 'the'], t))) * 1.0
             / len(string_split(text, ' ')), 5) AS stopword_ratio
FROM documents
"""


# ------------------------------------------------------------- lang stats

def q_lang_stats(sf_dir: str):
    """Docs + mean length per declared language (grouped aggregate)."""
    docs = _read_documents(sf_dir, ["lang", "n_chars"])
    from ray.data.aggregate import Count, Sum

    agg = docs.groupby("lang", num_partitions=8).aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="s_chars")
    )
    return agg.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "lang": t.column("lang"),
                "n_docs": t.column("n_docs"),
                "avg_chars": pc_round_ha(
                    pc.divide(
                        pc.cast(t.column("s_chars"), pa.float64()),
                        pc.cast(t.column("n_docs"), pa.float64()),
                    ),
                    4,
                ),
            }
        ),
        batch_format="pyarrow",
    )


Q_LANG_STATS_SQL = """
SELECT lang, COUNT(*) AS n_docs, ROUND(SUM(n_chars) * 1.0 / COUNT(*), 4) AS avg_chars
FROM documents
GROUP BY lang
"""


# -------------------------------------------------------------- lang ID

class LangIdStage:
    """Character-n-gram language-ID heuristic (stateful: profiles built once).

    Scores each doc against per-language trigram profiles built from the
    declared-language docs of a seed sample; emits the argmax language.
    (On this synthetic corpus the text is language-neutral word salad, so
    this exercises the plumbing and the scoring math, not linguistics.)
    """

    PROFILES = {
        "en": ["the", "and", "ing", "ion", "en "],
        "de": ["der", "ein", "sch", "ung", "en "],
        "fr": ["les", "ent", "ion", "que", "de "],
        "es": ["de ", "que", "los", "ión", "ent"],
        "zh": ["的", "是", "了", "在", "一"],
    }

    def __init__(self):
        self.langs = sorted(self.PROFILES)
        self.patterns = {
            lang: [g for g in grams] for lang, grams in self.PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        scores = np.zeros((batch.num_rows, len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            for gram in self.patterns[lang]:
                scores[:, j] += pc.count_substring(texts, gram).to_numpy(
                    zero_copy_only=False
                )
        best = scores.argmax(axis=1)
        pred = [self.langs[i] if scores[k, i] > 0 else "und"
                for k, i in enumerate(best)]
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(pred)}
        )


def q_lang_id(sf_dir: str):
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        LangIdStage(), batch_format="pyarrow", batch_size=65536
    )


# ------------------------------------------------------------ vocab stats

def q_vocab_stats(sf_dir: str, k: int = 100):
    """Corpus token-frequency table (vocabulary building): explode tokens,
    pre-aggregate counts per batch (combiner), grouped sum, top-k.

    The token-level shuffle moves one (token, partial_count) row per
    distinct token per batch — at 100 TB that is vocab-sized per batch,
    never corpus-sized.
    """
    docs = _read_documents(sf_dir, ["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        # flatten() (not .values) — respects any list-view offset, so a
        # sliced block can never leak out-of-view tokens into the counts
        vc = toks.flatten().value_counts()  # Arrow kernel, no Python loop
        return pa.Table.from_pydict(
            {
                "token": vc.field("values"),
                "p_n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    from rust_bert_ray.functions.util import topk

    agg = (
        docs.map_batches(partial_counts, batch_format="pyarrow", batch_size=65536)
        .groupby("token", num_partitions=8)
        .aggregate(Sum("p_n", alias_name="n"))
    )
    return topk(agg, ["n", "token"], [True, False], k)


Q_VOCAB_STATS_SQL = """
SELECT t AS token, COUNT(*) AS n
FROM (SELECT UNNEST(string_split(text, ' ')) AS t FROM documents)
GROUP BY t
ORDER BY n DESC, t
LIMIT 100
"""


# ---------------------------------------------------- histogram quantiles

def q_quality_quantiles(sf_dir: str):
    """Per-language n_tokens quantiles (p50/p90/p99) via EXACT
    distributed histograms: each batch emits (lang, n_tokens, p_n)
    partials, a grouped sum merges them, and a tiny per-lang finalize
    reads the quantiles off the cumulative histogram.

    The sketch-style aggregate for bounded-domain statistics: the
    shuffle moves histogram-sized partials (distinct (lang, value)
    pairs), never rows, and the result is exact — rank rule mirrors
    DuckDB ``quantile_disc`` (smallest value with cumulative count ≥
    ceil(q·n), verified empirically).
    """
    import math

    import numpy as np

    docs = _read_documents(sf_dir, ["lang", "text"])

    def partial_hist(t: pa.Table) -> pa.Table:
        n_tokens = pc.cast(
            pc.add(pc.count_substring(t.column("text"), " "), 1), pa.int64()
        )
        df = pd.DataFrame(
            {
                "lang": t.column("lang").to_pandas(),
                "n_tokens": n_tokens.to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["lang", "n_tokens"], as_index=False).size()
        return pa.Table.from_pydict(
            {
                "lang": g["lang"],
                "n_tokens": pa.array(g["n_tokens"], type=pa.int64()),
                "p_n": pa.array(g["size"], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    hist = (
        docs.map_batches(partial_hist, batch_format="pyarrow", batch_size=65536)
        .groupby(["lang", "n_tokens"], num_partitions=8)
        .aggregate(Sum("p_n", alias_name="n"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("n_tokens")
        vals = df["n_tokens"].to_numpy()
        cum = df["n"].to_numpy().cumsum()
        total = int(cum[-1])

        def q(p: float) -> int:
            rank = math.ceil(p * total)
            return int(vals[np.searchsorted(cum, rank)])

        return pd.DataFrame(
            {
                "lang": [df["lang"].iloc[0]],
                "p50": [q(0.5)],
                "p90": [q(0.9)],
                "p99": [q(0.99)],
            }
        )

    return hist.groupby("lang", num_partitions=8).map_groups(
        finalize, batch_format="pandas"
    )


Q_QUALITY_QUANTILES_SQL = """
SELECT lang,
       quantile_disc(n_tokens, 0.5)  AS p50,
       quantile_disc(n_tokens, 0.9)  AS p90,
       quantile_disc(n_tokens, 0.99) AS p99
FROM (SELECT lang,
             length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
      FROM documents)
GROUP BY lang
"""


# ------------------------------------------------------------ split assign

def q_split_assign(sf_dir: str, train_pct: int = 90, val_pct: int = 5):
    """Deterministic train/val/test split assignment (doc_id mod 100) —
    the standard reproducible-split primitive of a training pipeline; no
    shuffle, no RNG state, stable under any partitioning."""
    docs = _read_documents(sf_dir, ["doc_id"])
    lo, hi = train_pct, train_pct + val_pct

    def fn(t: pa.Table) -> pa.Table:
        import numpy as np

        bucket = t.column("doc_id").to_numpy(zero_copy_only=False) % 100
        split = np.where(bucket < lo, "train", np.where(bucket < hi, "val", "test"))
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "split": pa.array(split.tolist(), type=pa.string()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=65536)


Q_SPLIT_ASSIGN_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 100 < 90 THEN 'train'
            WHEN doc_id % 100 < 95 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# ------------------------------------------------------- tokenize + decode

class WordPieceRoundTrip:
    """documents → encode → id-space → decode round-trip (the reference's
    tokenize / decode pair, common.rs:1332-1466).  Stateful actor stage:
    the vocab loads once per actor in ``__init__``."""

    def __init__(self, lower_case: bool = False):
        from rust_bert_ray.tokenization import WordPieceTokenizer

        self.tokenizer = WordPieceTokenizer(lower_case=lower_case)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tk = self.tokenizer
        n_pieces, n_unk, decoded, roundtrip = [], [], [], []
        for text in batch.column("text").to_pylist():
            enc = tk.encode(text)
            full = tk.build_with_special_tokens(enc)
            out = tk.decode(
                full.ids, skip_special_tokens=True, clean_up_tokenization_spaces=True
            )
            n_pieces.append(len(enc.ids))
            n_unk.append(sum(1 for i in enc.ids if i == tk.unk_id))
            decoded.append(out)
            roundtrip.append(int(out == text))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_pieces": pa.array(n_pieces, type=pa.int64()),
                "n_unk": pa.array(n_unk, type=pa.int64()),
                "decoded": pa.array(decoded, type=pa.string()),
                "roundtrip": pa.array(roundtrip, type=pa.int64()),
            }
        )


def q_decode(sf_dir: str):
    """WordPiece encode→decode round-trip over every document."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        WordPieceRoundTrip(), batch_format="pyarrow", batch_size=65536
    )


# ----------------------------------------------------------- fingerprints

def q_fingerprints(sf_dir: str, shingle: int = 8):
    """Rolling-hash document fingerprint: min crc32 over word ``shingle``-grams.

    The winnowing-style primitive behind shingle dedup; crc32 is stable
    across processes (Python ``hash`` is salted).  Per-doc minima are
    computed with one ``np.minimum.reduceat`` over the batch-flat gram
    hashes (same vectorization as the MinHash signature stage) instead
    of a per-doc Python ``min`` generator.
    """
    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        counts: list[int] = []
        gram_iter: list[int] = []
        for text in t.column("text").to_pylist():
            words = text.split()
            if len(words) < shingle:
                grams = [" ".join(words)]
            else:
                grams = [
                    " ".join(words[i : i + shingle])
                    for i in range(len(words) - shingle + 1)
                ]
            counts.append(len(grams))
            gram_iter.extend(zlib.crc32(g.encode()) for g in grams)
        flat = np.asarray(gram_iter, dtype=np.int64)
        starts = np.cumsum([0] + counts[:-1])
        fps = (
            np.minimum.reduceat(flat, starts)
            if len(flat)
            else np.empty(0, dtype=np.int64)
        )
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "fingerprint": pa.array(fps, type=pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=None)


class BpeRoundTrip:
    """documents → byte-level-BPE encode → id-space → decode round-trip
    (the GPT-2-family tokenize/decode pair the reference dispatches at
    common.rs:1332-1396; byte fallback ⇒ UNK-free and lossless).
    Stateful actor stage: merges/vocab load once per actor."""

    def __init__(self):
        from rust_bert_ray.bpe import ByteLevelBpeTokenizer

        self.tokenizer = ByteLevelBpeTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        tk = self.tokenizer
        n_pieces, n_words, decoded, roundtrip = [], [], [], []
        for text in batch.column("text").to_pylist():
            enc = tk.encode(text)
            out = tk.decode(enc.ids)
            n_pieces.append(len(enc.ids))
            n_words.append(len(enc.words or []))
            decoded.append(out)
            roundtrip.append(int(out == text))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_pieces": pa.array(n_pieces, type=pa.int64()),
                "n_words": pa.array(n_words, type=pa.int64()),
                "decoded": pa.array(decoded, type=pa.string()),
                "roundtrip": pa.array(roundtrip, type=pa.int64()),
            }
        )


def q_decode_bpe(sf_dir: str):
    """Byte-level BPE encode→decode round-trip over every document."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        BpeRoundTrip, batch_format="pyarrow", batch_size=65536, concurrency=2
    )


HF_TOKENIZER_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "tokenizer_bpe.json",
)


class HfRoundTrip:
    """documents → encode→decode round-trip through a tokenizer built
    from a standard ``tokenizer.json`` (the HF `tokenizers`
    serialization — reference src/pipelines/hf_tokenizers.rs, the
    ``new_with_tokenizer`` path).  Stateful actor stage: the json is
    parsed and the vocab/merges tables built once per actor.

    ``ids_crc`` binds ID-LEVEL parity into the oracle hash: the expected
    builder re-derives the ids from the same tokenizer.json with an
    independent merge engine (training-order instead of greedy
    lowest-rank), so a loader bug that still round-trips (byte fallback
    hides many) flips the hash anyway.
    """

    def __init__(self, path: str = HF_TOKENIZER_FIXTURE):
        from rust_bert_ray.hf_tokenizers import load_hf_tokenizer

        self.tokenizer = load_hf_tokenizer(path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tk = self.tokenizer
        n_pieces, ids_crc, decoded, roundtrip = [], [], [], []
        for text in batch.column("text").to_pylist():
            enc = tk.encode(text)
            out = tk.decode(enc.ids)
            n_pieces.append(len(enc.ids))
            ids_crc.append(zlib.crc32(np.asarray(enc.ids, dtype=np.int64).tobytes()))
            decoded.append(out)
            roundtrip.append(int(out == text))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_pieces": pa.array(n_pieces, type=pa.int64()),
                "ids_crc": pa.array(ids_crc, type=pa.int64()),
                "decoded": pa.array(decoded, type=pa.string()),
                "roundtrip": pa.array(roundtrip, type=pa.int64()),
            }
        )


def q_decode_hf(sf_dir: str):
    """tokenizer.json-loaded BPE encode→decode round-trip per document."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        HfRoundTrip, batch_format="pyarrow", batch_size=65536, concurrency=2
    )


HF_UNIGRAM_FIXTURE = os.path.join(
    os.path.dirname(HF_TOKENIZER_FIXTURE), "tokenizer_unigram.json"
)


class HfUnigramRoundTrip:
    """documents → encode→decode round-trip through a tokenizer built
    from a ``tokenizer.json`` with ``model.type == "Unigram"`` — the HF
    serialization of the sentencepiece family (reference
    src/pipelines/hf_tokenizers.rs; Albert/XLNet/T5 bring this file).
    FILE ORDER defines the ids, so ``ids_crc`` binds the loader's
    id mapping into the oracle hash: the expected builder re-derives
    the ids from the same file with an exhaustive-enumeration
    segmenter (no Viterbi, no UnigramTokenizer import)."""

    def __init__(self, path: str = HF_UNIGRAM_FIXTURE):
        from rust_bert_ray.hf_tokenizers import load_hf_tokenizer

        self.tokenizer = load_hf_tokenizer(path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from rust_bert_ray.tokenization import clean_up_tokenization

        tk = self.tokenizer
        n_pieces, ids_crc, decoded, roundtrip = [], [], [], []
        for text in batch.column("text").to_pylist():
            enc = tk.encode(text)
            out = clean_up_tokenization(tk.decode(enc.ids, enc.word_indices))
            n_pieces.append(len(enc.ids))
            ids_crc.append(zlib.crc32(np.asarray(enc.ids, dtype=np.int64).tobytes()))
            decoded.append(out)
            roundtrip.append(int(out == text))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_pieces": pa.array(n_pieces, type=pa.int64()),
                "ids_crc": pa.array(ids_crc, type=pa.int64()),
                "decoded": pa.array(decoded, type=pa.string()),
                "roundtrip": pa.array(roundtrip, type=pa.int64()),
            }
        )


def q_decode_hf_unigram(sf_dir: str):
    """tokenizer.json-loaded Unigram encode→decode round-trip per doc."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        HfUnigramRoundTrip, batch_format="pyarrow", batch_size=65536, concurrency=2
    )


HF_SUFFIX_FIXTURE = os.path.join(
    os.path.dirname(HF_TOKENIZER_FIXTURE), "tokenizer_suffix_bpe.json"
)


class HfSuffixRoundTrip:
    """documents → encode→decode through a suffix-marked BPE built from
    a ``tokenizer.json`` with ``end_of_word_suffix`` — the OpenAI-GPT /
    CTRL family (reference common.rs:259-301 dispatch; HF serialization
    handled by hf_tokenizers.load_hf_tokenizer).  ``ids_crc`` binds the
    merge order, unk mapping and id table into the oracle hash: the
    expected builder re-derives the ids from the same file with a
    training-order merge engine.  ``roundtrip`` compares against the
    LOWERCASED source (this family lowercases by contract)."""

    def __init__(self, path: str = HF_SUFFIX_FIXTURE):
        from rust_bert_ray.hf_tokenizers import load_hf_tokenizer

        self.tokenizer = load_hf_tokenizer(path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from rust_bert_ray.tokenization import clean_up_tokenization

        tk = self.tokenizer
        n_pieces, n_unk, ids_crc, decoded, roundtrip = [], [], [], [], []
        for text in batch.column("text").to_pylist():
            enc = tk.encode(text)
            out = clean_up_tokenization(tk.decode(enc.ids))
            n_pieces.append(len(enc.ids))
            n_unk.append(sum(1 for i in enc.ids if i == tk.unk_id))
            ids_crc.append(zlib.crc32(np.asarray(enc.ids, dtype=np.int64).tobytes()))
            decoded.append(out)
            roundtrip.append(int(out == text.lower()))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_pieces": pa.array(n_pieces, type=pa.int64()),
                "n_unk": pa.array(n_unk, type=pa.int64()),
                "ids_crc": pa.array(ids_crc, type=pa.int64()),
                "decoded": pa.array(decoded, type=pa.string()),
                "roundtrip": pa.array(roundtrip, type=pa.int64()),
            }
        )


def q_decode_hf_suffix(sf_dir: str):
    """tokenizer.json-loaded suffix-BPE (GPT-1/CTRL family) round-trip."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        HfSuffixRoundTrip, batch_format="pyarrow", batch_size=65536, concurrency=2
    )


HF_METASPACE_FIXTURE = os.path.join(
    os.path.dirname(HF_TOKENIZER_FIXTURE), "tokenizer_metaspace.json"
)


class HfMetaspaceRoundTrip:
    """documents → encode→decode through a Metaspace-unigram tokenizer
    loaded from a ``tokenizer.json`` — the shape REAL sentencepiece
    exports (T5/Albert/XLNet) ship: ▁-prefixed pieces, whitespace
    pre-tokenization, word boundaries carried IN the ids (decode needs
    no word_indices and is lossless on single-spaced text, so this
    round-trip is strict equality with no cleanup pass).  ``ids_crc``
    binds the marker handling and file-order id table into the oracle
    hash against an exhaustive-enumeration expected builder."""

    def __init__(self, path: str = HF_METASPACE_FIXTURE):
        from rust_bert_ray.hf_tokenizers import load_hf_tokenizer

        self.tokenizer = load_hf_tokenizer(path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tk = self.tokenizer
        n_pieces, n_unk, ids_crc, decoded, roundtrip = [], [], [], [], []
        for text in batch.column("text").to_pylist():
            enc = tk.encode(text)
            out = tk.decode(enc.ids)
            n_pieces.append(len(enc.ids))
            n_unk.append(sum(1 for i in enc.ids if i == tk.unk_id))
            ids_crc.append(zlib.crc32(np.asarray(enc.ids, dtype=np.int64).tobytes()))
            decoded.append(out)
            roundtrip.append(int(out == text))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_pieces": pa.array(n_pieces, type=pa.int64()),
                "n_unk": pa.array(n_unk, type=pa.int64()),
                "ids_crc": pa.array(ids_crc, type=pa.int64()),
                "decoded": pa.array(decoded, type=pa.string()),
                "roundtrip": pa.array(roundtrip, type=pa.int64()),
            }
        )


def q_decode_hf_metaspace(sf_dir: str):
    """tokenizer.json-loaded Metaspace-unigram (sentencepiece export
    shape) encode→decode round-trip per document."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        HfMetaspaceRoundTrip, batch_format="pyarrow", batch_size=65536, concurrency=2
    )


HF_SPBPE_FIXTURE = os.path.join(
    os.path.dirname(HF_TOKENIZER_FIXTURE), "tokenizer_spbpe.json"
)


class HfSpBpeRoundTrip:
    """documents → encode→decode through a sentencepiece-BPE tokenizer
    loaded from a ``tokenizer.json`` with ``model.type == "BPE"`` plus a
    ``Metaspace`` pre_tokenizer — the Marian / XLM export shape
    (reference common.rs:259-301 dispatch; hf_tokenizers.rs
    BPE-with-Metaspace arm).  Word boundaries are carried IN the ids by
    the ▁ word-start marker, so decode needs no word_indices and is
    lossless on single-spaced text: ``roundtrip`` is strict equality
    with no cleanup pass.  ``ids_crc`` binds merge order, unk mapping
    and the id table into the oracle hash — the expected builder
    re-derives ids from the same file with a training-order merge
    engine (Sennrich formulation), so a loader or merge-loop bug flips
    the hash."""

    def __init__(self, path: str = HF_SPBPE_FIXTURE):
        from rust_bert_ray.hf_tokenizers import load_hf_tokenizer

        self.tokenizer = load_hf_tokenizer(path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tk = self.tokenizer
        n_pieces, n_unk, ids_crc, decoded, roundtrip = [], [], [], [], []
        for text in batch.column("text").to_pylist():
            enc = tk.encode(text)
            out = tk.decode(enc.ids)
            n_pieces.append(len(enc.ids))
            n_unk.append(sum(1 for i in enc.ids if i == tk.unk_id))
            ids_crc.append(zlib.crc32(np.asarray(enc.ids, dtype=np.int64).tobytes()))
            decoded.append(out)
            roundtrip.append(int(out == text))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_pieces": pa.array(n_pieces, type=pa.int64()),
                "n_unk": pa.array(n_unk, type=pa.int64()),
                "ids_crc": pa.array(ids_crc, type=pa.int64()),
                "decoded": pa.array(decoded, type=pa.string()),
                "roundtrip": pa.array(roundtrip, type=pa.int64()),
            }
        )


def q_decode_hf_spbpe(sf_dir: str):
    """tokenizer.json-loaded sentencepiece-BPE (Marian/XLM family)
    encode→decode round-trip per document."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        HfSpBpeRoundTrip, batch_format="pyarrow", batch_size=65536, concurrency=2
    )


class UnigramRoundTrip:
    """documents → unigram-LM (SentencePiece-family) encode → decode
    round-trip — the third subword algorithm family the reference
    dispatches (common.rs:1332-1396; Albert/XLNet/T5 are unigram
    models).  Stateful actor stage: the trained piece LM loads once."""

    def __init__(self):
        from rust_bert_ray.unigram import UnigramTokenizer

        self.tokenizer = UnigramTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from rust_bert_ray.tokenization import clean_up_tokenization

        tk = self.tokenizer
        n_pieces, n_unk, decoded, roundtrip = [], [], [], []
        for text in batch.column("text").to_pylist():
            enc = tk.encode(text)
            out = clean_up_tokenization(tk.decode(enc.ids, enc.word_indices))
            n_pieces.append(len(enc.ids))
            n_unk.append(sum(1 for i in enc.ids if i == tk.unk_id))
            decoded.append(out)
            roundtrip.append(int(out == text))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_pieces": pa.array(n_pieces, type=pa.int64()),
                "n_unk": pa.array(n_unk, type=pa.int64()),
                "decoded": pa.array(decoded, type=pa.string()),
                "roundtrip": pa.array(roundtrip, type=pa.int64()),
            }
        )


def q_decode_unigram(sf_dir: str):
    """Unigram-LM encode→decode round-trip over every document."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        UnigramRoundTrip, batch_format="pyarrow", batch_size=65536, concurrency=2
    )


def q_chunk_docs(sf_dir: str, chunk_words: int = 32, overlap: int = 8):
    """Context-window chunking: split each document into fixed-size word
    windows with overlap — the LM-training chunker (same stride algebra
    as the token-classification featurizer, token_classification.rs:
    836-928, lifted to document level).  Chunks step by
    ``chunk_words - overlap``; the last chunk starts at the final step
    position that still begins before the end of the document.  Pure
    map — embarrassingly parallel, no shuffle.
    """
    step = chunk_words - overlap
    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out: dict[str, list] = {
            "doc_id": [], "chunk_idx": [], "start_word": [], "end_word": [],
            "n_words": [], "chunk_text": [],
        }
        for doc_id, text in zip(ids, texts):
            words = text.split(" ")
            n = len(words)
            k = 0
            for start in range(0, max(n - overlap, 1), step):
                end = min(start + chunk_words, n)
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(k)
                out["start_word"].append(start)
                out["end_word"].append(end - 1)
                out["n_words"].append(end - start)
                out["chunk_text"].append(" ".join(words[start:end]))
                k += 1
                if end == n:
                    break
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "chunk_idx": pa.array(out["chunk_idx"], type=pa.int64()),
                "start_word": pa.array(out["start_word"], type=pa.int64()),
                "end_word": pa.array(out["end_word"], type=pa.int64()),
                "n_words": pa.array(out["n_words"], type=pa.int64()),
                "chunk_text": pa.array(out["chunk_text"], type=pa.string()),
            }
        )

    return docs.map_batches(chunks, batch_format="pyarrow", batch_size=65536)


Q_CHUNK_DOCS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), steps AS (
  SELECT doc_id, t, len(t) AS n,
         unnest(generate_series(0, CAST(FLOOR((GREATEST(len(t) - 8, 1) - 1) / 24.0) AS BIGINT))) AS k
  FROM toks
)
SELECT doc_id, k AS chunk_idx, k * 24 AS start_word,
       LEAST(k * 24 + 32, n) - 1 AS end_word,
       LEAST(k * 24 + 32, n) - k * 24 AS n_words,
       array_to_string(t[k * 24 + 1 : LEAST(k * 24 + 32, n)], ' ') AS chunk_text
FROM steps
WHERE k = 0 OR (k - 1) * 24 + 32 < n
"""


def q_pack_sequences(sf_dir: str, target_words: int = 256, shard_size: int = 100):
    """Sequence packing for LM training: greedy next-fit packing of
    documents into ``target_words`` bins.

    Packing is inherently sequential, so it is made deterministic and
    distributed by a DATA-INDEPENDENT shard key (``doc_id //
    shard_size``): packs never cross shards (exactly how production
    pipelines pack per input file), each shard packs independently
    inside one ``map_groups`` call, and the result is invariant to Ray
    block boundaries.  Documents longer than the budget get their own
    pack (never split).
    """
    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n_words = pa.array(
            [len(x.split(" ")) for x in t.column("text").to_pylist()],
            type=pa.int64(),
        )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_words": n_words,
                "_shard": pa.array(ids // shard_size, type=pa.int64()),
            }
        )

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        out: dict[str, list] = {
            "pack_id": [], "n_docs": [], "n_words": [], "fill_bp": [],
            "doc_ids": [],
        }
        shard = int(df["_shard"].iloc[0])
        k = 0
        cur_ids: list[int] = []
        cur_words = 0
        def flush():
            nonlocal k, cur_ids, cur_words
            if not cur_ids:
                return
            out["pack_id"].append(f"{shard}:{k}")
            out["n_docs"].append(len(cur_ids))
            out["n_words"].append(cur_words)
            out["fill_bp"].append((10_000 * cur_words) // target_words)
            out["doc_ids"].append(";".join(str(i) for i in cur_ids))
            k += 1
            cur_ids, cur_words = [], 0
        for doc_id, nw in zip(df["doc_id"], df["n_words"]):
            if cur_ids and cur_words + int(nw) > target_words:
                flush()
            cur_ids.append(int(doc_id))
            cur_words += int(nw)
        flush()
        return pd.DataFrame(out)

    return (
        docs.map_batches(add_shard, batch_format="pyarrow", batch_size=65536)
        .groupby("_shard", num_partitions=16)
        .map_groups(pack, batch_format="pandas")
    )


# ----------------------------------------- stratified mixture sampling

# Target mixture weights (keep probability per language) for the
# training-data domain-mixing step.  Thresholds are PRE-COMPUTED integer
# literals in 1/2^32 units so the Ray side and the SQL oracle share the
# exact same integers (no float→int cast ambiguity).
MIXTURE_RATES = {"en": 0.85, "de": 0.60, "es": 0.50, "fr": 0.35, "zh": 0.20}
MIXTURE_DEFAULT_RATE = 0.10
_MIX_MULT = 2654435761  # Knuth multiplicative hash constant
_MIX_MOD = 4294967296  # 2^32
MIXTURE_THRESHOLDS = {
    lang: int(rate * _MIX_MOD) for lang, rate in MIXTURE_RATES.items()
}
MIXTURE_DEFAULT_THRESHOLD = int(MIXTURE_DEFAULT_RATE * _MIX_MOD)


def q_sample_mixture(sf_dir: str):
    """Deterministic stratified sampling to target per-language mixture
    weights (the domain-mixing step of a training-data pipeline): keep a
    document iff ``knuth_hash(doc_id) mod 2^32`` falls under its
    language's threshold.

    Scale shape: **map-only, zero shuffle** — the keep decision is a
    pure function of (doc_id, lang), so it is independent of
    partitioning, repeatable across resumed runs, and each worker needs
    only the tiny threshold dict.  Upsampling (rates > 1) composes by
    emitting ``floor(rate)`` copies plus one fractional-hash copy.
    """
    docs = _read_documents(sf_dir, ["doc_id", "lang"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        # (id mod 2^32) * C < 2^64 — exact in uint64, mirrored by the
        # oracle's HUGEINT arithmetic
        h = (ids % np.uint64(_MIX_MOD)) * np.uint64(_MIX_MULT) % np.uint64(_MIX_MOD)
        langs = t.column("lang").to_pandas()
        thr = (
            langs.map(MIXTURE_THRESHOLDS)
            .fillna(MIXTURE_DEFAULT_THRESHOLD)
            .to_numpy(dtype=np.uint64)
        )
        return t.filter(pa.array(h < thr))

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=65536)


def _mixture_case_sql() -> str:
    whens = "\n         ".join(
        f"WHEN '{lang}' THEN {thr}" for lang, thr in MIXTURE_THRESHOLDS.items()
    )
    return f"CASE lang {whens}\n         ELSE {MIXTURE_DEFAULT_THRESHOLD} END"


Q_SAMPLE_MIXTURE_SQL = f"""
SELECT doc_id, lang
FROM documents
WHERE CAST(doc_id % {_MIX_MOD} AS HUGEINT) * {_MIX_MULT} % {_MIX_MOD} <
      {_mixture_case_sql()}
"""


# --------------------------------------------------- TF-IDF top terms

_TFIDF_SCALE = 1_000_000  # integer idf units: idf_int = SCALE // df
_TFIDF_K = 3


def q_tfidf_topk(sf_dir: str, k: int = _TFIDF_K):
    """Top-``k`` characteristic terms per document by integer TF-IDF
    (``weight = tf * (SCALE // df)``; ties break token-ascending).

    Integer fixed-point idf keeps the distributed result bit-identical
    to the SQL oracle — float ``log`` idf would hash-diverge on
    reduction order.  Plan shape:

    1. **DF pass**: per batch, distinct tokens per doc pre-aggregate to
       (token, partial_count) — the combiner — then one vocab-bounded
       ``groupby(token).sum()``; the exchange carries token partials,
       never documents.
    2. The DF table is broadcast once (``ray.put``).  At 100 TB a raw
       web vocab outgrows a broadcast: the documented scale path swaps
       step 3 for a hash-partitioned join of the exploded (doc, token,
       tf) rows against the DF table, same algebra.
    3. **Scoring pass**: map-only — per batch explode tokens, vectorized
       pandas groupby for tf, dict-map df, one sort + groupby-head for
       the per-doc top-k.
    """
    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def df_partials(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.values.to_pandas().to_numpy(dtype=object)
        row = np.repeat(
            np.arange(len(offsets) - 1), offsets[1:] - offsets[:-1]
        )
        pairs = pd.DataFrame({"r": row, "token": flat}).drop_duplicates()
        part = pairs.groupby("token", sort=False).size().reset_index(name="n")
        return pa.Table.from_pydict(
            {
                "token": pa.array(part["token"], pa.string()),
                "n": pa.array(part["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    df_tbl = (
        docs.map_batches(df_partials, batch_format="pyarrow", batch_size=65536)
        .groupby("token", num_partitions=8)
        .sum("n")
        .to_pandas()
    )  # vocab-bounded (see docstring for the joined scale path)
    df_map = dict(zip(df_tbl["token"], df_tbl["sum(n)"].astype(np.int64)))
    df_ref = ray.put(df_map)

    class TfidfScore:
        def __init__(self, df_ref, k):
            m = ray.get(df_ref) if isinstance(df_ref, ray.ObjectRef) else df_ref
            self.idf = {t: _TFIDF_SCALE // int(d) for t, d in m.items()}
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            toks = pc.split_pattern(t.column("text"), " ")
            toks = (
                toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
            )
            offsets = toks.offsets.to_numpy(zero_copy_only=False)
            flat = toks.values.to_pandas().to_numpy(dtype=object)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            row = np.repeat(
                np.arange(len(ids)), offsets[1:] - offsets[:-1]
            )
            tf = (
                pd.DataFrame({"doc_id": ids[row], "token": flat})
                .groupby(["doc_id", "token"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            idf = tf["token"].map(self.idf).to_numpy(np.int64)
            tf["weight"] = tf["tf"].to_numpy(np.int64) * idf
            top = (
                tf.sort_values(
                    ["doc_id", "weight", "token"],
                    ascending=[True, False, True],
                    kind="mergesort",
                )
                .groupby("doc_id", sort=False)
                .head(self.k)
            )
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(top["doc_id"].to_numpy(np.int64), pa.int64()),
                    "token": pa.array(top["token"], pa.string()),
                    "weight": pa.array(top["weight"].to_numpy(np.int64), pa.int64()),
                }
            )

    return docs.map_batches(
        TfidfScore,
        fn_constructor_kwargs={"df_ref": df_ref, "k": k},
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=2,
    )


Q_TFIDF_TOPK_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
), df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token
), w AS (
  SELECT tf.doc_id, tf.token, tf.tf * ({_TFIDF_SCALE} // df.df) AS weight
  FROM tf JOIN df USING (token)
), r AS (
  SELECT doc_id, token, weight,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY weight DESC, token ASC
         ) AS rn
  FROM w
)
SELECT doc_id, token, CAST(weight AS BIGINT) AS weight
FROM r WHERE rn <= {_TFIDF_K}
"""


# ------------------------------------------------ global shuffle rank

_SHUF_MULT = 1103515245  # decorrelated from the mixture-sampling hash
_SHUF_MOD = 4294967296
_SHUF_BUCKETS = 64


def shuffle_rank(docs, num_buckets: int = _SHUF_BUCKETS):
    """Dense pseudorandom rank 0..n-1 over any Dataset with a ``doc_id``
    column (``hash(doc_id)`` asc, doc_id tie-break); all other columns
    pass through.  Distributed rank WITHOUT a monolithic global sort:

    1. histogram pass (combiner): per batch, counts per key-range bucket
       (top bits of the 32-bit hash) — the exchange is ``num_buckets``
       int64s per block;
    2. the driver prefix-sums the tiny histogram into per-bucket rank
       offsets (broadcast with the task closure);
    3. ONE bucketed groupby: each bucket sorts only its own members and
       emits ``offset + local_rank``.

    At 100 TB: set ``num_buckets`` ≈ cluster cores × 4 — each sort is
    then corpus/buckets rows, and the histogram stays KBs.  This is the
    sample-sort layout Ray's own ``Dataset.sort`` uses internally, but
    with deterministic equal-width key ranges (the hash is uniform by
    construction) and the rank emitted without a second pass.
    """
    shift = _SHUF_MOD // num_buckets

    def key_of(ids: np.ndarray) -> np.ndarray:
        u = ids.astype(np.uint64)
        return (u % np.uint64(_SHUF_MOD)) * np.uint64(_SHUF_MULT) % np.uint64(
            _SHUF_MOD
        )

    def hist(t: pa.Table) -> pa.Table:
        k = key_of(t.column("doc_id").to_numpy(zero_copy_only=False))
        b = (k // np.uint64(shift)).astype(np.int64)
        counts = np.bincount(b, minlength=num_buckets).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(np.arange(num_buckets, dtype=np.int64)),
                "n": pa.array(counts, pa.int64()),
            }
        )

    h = (
        docs.map_batches(hist, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket", num_partitions=4)
        .sum("n")
        .to_pandas()  # indexed assignment below needs no sort
    )
    counts = np.zeros(num_buckets, dtype=np.int64)
    if len(h):  # empty input → empty to_pandas frame without columns
        counts[h["bucket"].to_numpy()] = h["sum(n)"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])  # tiny; ships in closure

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        k = key_of(ids)
        t = t.append_column("key", pa.array(k, pa.uint64()))
        return t.append_column(
            "bucket", pa.array((k // np.uint64(shift)).astype(np.int64))
        )

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["key", "doc_id"], ignore_index=True)
        base = offsets[int(df["bucket"].iat[0])]
        out = df.drop(columns=["key", "bucket"])
        out["rank"] = np.arange(base, base + len(df), dtype=np.int64)
        return out

    return (
        docs.map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket", num_partitions=8)
        .map_groups(rank_bucket, batch_format="pandas")
    )


def q_shuffle_rank(sf_dir: str, num_buckets: int = _SHUF_BUCKETS):
    """Global deterministic training-data shuffle over the documents
    table — the "shuffle the corpus once before epoching" step,
    reproducible across runs and partitionings (see ``shuffle_rank``)."""
    return shuffle_rank(_read_documents(sf_dir, ["doc_id"]), num_buckets)


Q_SHUFFLE_RANK_SQL = f"""
SELECT doc_id,
       ROW_NUMBER() OVER (
         ORDER BY (doc_id % {_SHUF_MOD}) * {_SHUF_MULT} % {_SHUF_MOD}, doc_id
       ) - 1 AS rank
FROM documents
"""


# --------------------------------- DSIR importance weights (data selection)

_DSIR_BUCKETS = 4096
_DSIR_SCALE = 1_000_000  # micro-units for the integer log-ratio weights
DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")


def _dsir_bucket_flat(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Hashed unigram+bigram feature buckets, batch-flat: (flat bucket
    ids, per-doc gram counts).  crc32 so the bucketing is stable across
    processes (Python ``hash`` is salted)."""
    flat: list[int] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        words = text.split()
        n0 = len(flat)
        flat.extend(zlib.crc32(w.encode()) % _DSIR_BUCKETS for w in words)
        flat.extend(
            zlib.crc32(f"{a} {b}".encode()) % _DSIR_BUCKETS
            for a, b in zip(words, words[1:])
        )
        counts[i] = len(flat) - n0
    return np.asarray(flat, dtype=np.int64), counts


def dsir_bucket_weights(n_tgt: np.ndarray, n_raw: np.ndarray) -> np.ndarray:
    """Per-bucket integer importance weight: rint(SCALE * log(p/q)) with
    Laplace smoothing, p = target gram distribution, q = raw corpus.

    Computed ONCE on the driver from exact integer counts, so the weight
    table is identical under any partitioning; numerator/denominator are
    formed as exact integer products before the single float divide."""
    st, sr = int(n_tgt.sum()), int(n_raw.sum())
    num = (n_tgt.astype(np.int64) + 1) * np.int64(sr + _DSIR_BUCKETS)
    den = (n_raw.astype(np.int64) + 1) * np.int64(st + _DSIR_BUCKETS)
    return np.rint(_DSIR_SCALE * np.log(num / den)).astype(np.int64)


def q_dsir_weights(sf_dir: str, target_sources=DSIR_TARGET_SOURCES):
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169)
    re-expressed Ray-Data-first: score every document by how much its
    hashed n-gram profile resembles a target domain vs the raw corpus —
    the data-selection step before pretraining-corpus sampling.

    Plan shape:

    1. **distribution pass** (combiner): per batch, bincount feature
       buckets over ALL rows (raw distribution q) and over target-source
       rows (target distribution p) — each partial is ``B`` rows, so the
       exchange carries O(B) per batch, never grams; one bucket groupby
       sums them into a B-row table on the driver.
    2. driver derives the integer log-ratio weight table
       (``dsir_bucket_weights``) — a ~32 KB broadcast.
    3. **scoring pass** (map-only): ``dsir_score = Σ_grams w[bucket]``
       as an exact int64 ``np.add.reduceat`` over batch-flat lookups.

    At 100 TB the two scans stream; nothing materializes but the B-row
    count table.  Output: (doc_id, dsir_score, n_grams) — resampling is
    then a threshold/top-k over ``dsir_score`` (compose with
    ``shuffle_rank`` / ``q_sample_mixture``).
    """
    docs = _read_documents(sf_dir, ["doc_id", "text", "source"])
    tgt_set = pa.array(list(target_sources), pa.string())

    def partials(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        flat, counts = _dsir_bucket_flat(texts)
        is_tgt = pc.is_in(t.column("source"), value_set=tgt_set).to_numpy(
            zero_copy_only=False
        )
        row = np.repeat(np.arange(len(texts)), counts)
        n_raw = np.bincount(flat, minlength=_DSIR_BUCKETS)
        n_tgt = (
            np.bincount(flat[is_tgt[row]], minlength=_DSIR_BUCKETS)
            if len(flat)
            else np.zeros(_DSIR_BUCKETS, np.int64)
        )
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(np.arange(_DSIR_BUCKETS, dtype=np.int64)),
                "n_raw": pa.array(n_raw.astype(np.int64), pa.int64()),
                "n_tgt": pa.array(n_tgt.astype(np.int64), pa.int64()),
            }
        )

    # 65536-row bundles (fact #5): each partial is a fixed 4096-row
    # table, so block-as-batch over 64 tiny read blocks shuffled
    # 64×4096 rows where one bundle per ~65k docs shuffles 4096
    agg = (
        docs.map_batches(partials, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket", num_partitions=4)
        .sum(["n_raw", "n_tgt"])
        .to_pandas()
    )
    n_raw = np.zeros(_DSIR_BUCKETS, np.int64)
    n_tgt = np.zeros(_DSIR_BUCKETS, np.int64)
    if len(agg):
        n_raw[agg["bucket"].to_numpy()] = agg["sum(n_raw)"].to_numpy()
        n_tgt[agg["bucket"].to_numpy()] = agg["sum(n_tgt)"].to_numpy()
    weights = dsir_bucket_weights(n_tgt, n_raw)

    def score(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        flat, counts = _dsir_bucket_flat(texts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        if len(flat):
            per_gram = weights[flat]
            # clip: a trailing empty doc puts len(flat) in starts, which
            # reduceat rejects; empty slices are zeroed below anyway
            scores = np.add.reduceat(per_gram, np.minimum(starts, len(flat) - 1))
            out = np.where(counts > 0, scores, 0)
        else:
            out = np.zeros(len(texts), np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "dsir_score": pa.array(out.astype(np.int64), pa.int64()),
                "n_grams": pa.array(counts, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", batch_size=None)


def q_lang_confusion(sf_dir: str):
    """Language-ID evaluation: confusion matrix of labeled vs predicted
    language (classifier-quality diagnostics for the curation gate).

    Plan: the LangIdStage prediction pass (map-only) carries the label
    column through; a language-pair-bounded grouped count finishes —
    the shuffle moves one (lang, lang_pred, n) partial per pair per
    batch.  Oracle: native SQL joining the table against the
    INDEPENDENTLY-built expected q_lang_id predictions (the same
    cross-check pattern as the graph analytics over expected edges).
    """
    from ray.data.aggregate import Sum

    docs = _read_documents(sf_dir, ["doc_id", "text", "lang"])
    stage = LangIdStage()

    def predict_with_label(t: pa.Table) -> pa.Table:
        out = stage(pa.Table.from_pydict(
            {"doc_id": t.column("doc_id"), "text": t.column("text")}
        ))
        return pa.Table.from_pydict(
            {
                "lang": t.column("lang"),
                "lang_pred": out.column("lang_pred"),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["lang", "lang_pred"], as_index=False).size()
        g["p_n"] = g["size"].astype("int64")
        return pa.Table.from_pandas(
            g[["lang", "lang_pred", "p_n"]], preserve_index=False
        )

    agg = (
        docs.map_batches(predict_with_label, batch_format="pyarrow", batch_size=65536)
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["lang", "lang_pred"], num_partitions=4)
        .aggregate(Sum("p_n", alias_name="n"))
    )
    return agg.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "lang": t.column("lang"),
                "lang_pred": t.column("lang_pred"),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


Q_LANG_CONFUSION_SQL_TEMPLATE = """
SELECT d.lang, e.lang_pred, COUNT(*) AS n
FROM documents d
JOIN read_parquet('{expected_lang_id}') e USING (doc_id)
GROUP BY 1, 2
"""
