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

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=65536)


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
