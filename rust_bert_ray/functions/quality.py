"""Corpus-quality / curation operators over the ``documents`` table.

Large-scale training-data curation primitives beyond the basic text
stats in :mod:`rust_bert_ray.functions.text`:

- :func:`q_gopher_quality` — Gopher-style repetition/quality signals
  (Rae et al. 2021 §A1.1: fraction of characters in the most frequent
  n-gram, fraction of characters in duplicated n-grams, word-length
  gates), adapted to the single-space word corpus (bigrams; the corpus
  has no line structure so the duplicate-line rules do not apply).
- :func:`q_pii_scan` — regex PII detection + redaction (emails, phone
  numbers, IPv4), the C4/CCNet-style scrubbing pass.
- :func:`q_ngram_stats` — corpus-wide top-k bigram counts with a
  per-batch partial combiner (the shuffle carries (bigram, n) partials,
  never text).
- :func:`q_distinct_sketch` — per-source distinct-word cardinality via
  a KMV (k-minimum-values) sketch (Bar-Yossef et al. 2002), checked
  against the exact distinct count.

Everything is vectorized (pyarrow.compute / numpy / pandas str kernels)
inside ``map_batches``; no per-row Python in hot paths.  All four have
native DuckDB oracles (``Q_*_SQL``) computing the same algebra from
scratch.

Scale notes (100 TB):
- gopher/pii are map-only (embarrassingly parallel, no shuffle).
- ngram_stats shuffles only per-batch-combined (bigram, n) partials —
  bounded by batch vocabulary squared, not by corpus size.
- distinct_sketch shuffles distinct (source, word-hash) pairs after
  per-batch dedup; at real vocabulary sizes the per-batch partial would
  additionally be truncated to the k smallest hashes per source (KMV
  partials merge by union + re-truncate), keeping the exchange O(k) per
  source per batch.  The synthetic vocabulary is tiny so the truncation
  is a no-op here; the merge path is the same either way.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _read_documents(sf_dir: str, columns: list[str] | None = None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


# ----------------------------------------------------- gopher quality ----

# Keep-gate thresholds, chosen to be non-degenerate on the synthetic
# corpus (each rule individually passes/fails a real fraction of docs).
GOPHER_MIN_WORDS = 40
GOPHER_MIN_MEAN_WORD_LEN = 4.4
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.10
GOPHER_MAX_DUP_BIGRAM_FRAC = 0.30


def gopher_metrics_batch(t: pa.Table) -> pa.Table:
    """Vectorized Gopher repetition metrics for one Arrow batch.

    Word ids come from ``np.unique`` (sorted ⇒ id order == lexicographic
    order, which makes the top-bigram tie-break ``(count desc, w1, w2)``
    a pure integer sort).  All numerators/denominators are exact ints;
    each output double is produced by a single IEEE division so the
    DuckDB oracle reproduces it bit-for-bit.
    """
    doc_id = t.column("doc_id").to_numpy(zero_copy_only=False)
    lists = pc.split_pattern(t.column("text"), " ")
    flat = lists.combine_chunks().flatten() if isinstance(lists, pa.ChunkedArray) else lists.flatten()
    arr = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(doc_id)
    n_words = np.diff(offsets)

    words = np.asarray(flat.to_pylist(), dtype=object)
    word_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    total_chars = np.zeros(n_docs, dtype=np.int64)
    doc_idx = np.repeat(np.arange(n_docs), n_words)
    np.add.at(total_chars, doc_idx, word_len)

    uniq, inv = np.unique(words, return_inverse=True)
    ulen = np.array([len(w) for w in uniq], dtype=np.int64)
    V = max(len(uniq), 1)

    # bigrams: consecutive word pairs within the same doc
    same_doc = doc_idx[:-1] == doc_idx[1:] if len(doc_idx) > 1 else np.zeros(0, bool)
    code = inv[:-1][same_doc] * V + inv[1:][same_doc]
    bdoc = doc_idx[:-1][same_doc]
    key = bdoc * (V * V) + code
    uk, counts = np.unique(key, return_counts=True)
    ucode = uk % (V * V)
    udoc = uk // (V * V)
    uchars = ulen[ucode // V] + ulen[ucode % V]

    # per-doc top bigram: sort by (doc, -count, code) and take firsts
    order = np.lexsort((ucode, -counts, udoc))
    sdoc = udoc[order]
    first = np.ones(len(sdoc), dtype=bool)
    first[1:] = sdoc[1:] != sdoc[:-1]
    top_rows = order[first]

    top_bigram = np.full(n_docs, "", dtype=object)
    top_n = np.zeros(n_docs, dtype=np.int64)
    top_cov = np.zeros(n_docs, dtype=np.int64)  # chars covered by the top bigram
    d = udoc[top_rows]
    c = ucode[top_rows]
    top_bigram[d] = [f"{uniq[i // V]} {uniq[i % V]}" for i in c]
    top_n[d] = counts[top_rows]
    top_cov[d] = counts[top_rows] * uchars[top_rows]

    dup_chars = np.zeros(n_docs, dtype=np.int64)
    dup_w = np.where(counts > 1, counts * uchars, 0)
    np.add.at(dup_chars, udoc, dup_w)

    safe_tot = np.maximum(total_chars, 1)
    mwl = total_chars.astype(np.float64) / np.maximum(n_words, 1)
    ftb = top_cov.astype(np.float64) / safe_tot
    dbf = dup_chars.astype(np.float64) / safe_tot
    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (mwl >= GOPHER_MIN_MEAN_WORD_LEN)
        & (ftb < GOPHER_MAX_TOP_BIGRAM_FRAC)
        & (dbf < GOPHER_MAX_DUP_BIGRAM_FRAC)
    )
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": pa.array(mwl, pa.float64()),
            "top_bigram": pa.array(top_bigram.tolist(), pa.string()),
            "top_bigram_n": pa.array(top_n, pa.int64()),
            "frac_top_bigram": pa.array(ftb, pa.float64()),
            "dup_bigram_frac": pa.array(dbf, pa.float64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        }
    )


def q_gopher_quality(sf_dir: str):
    """Gopher-style repetition/quality gate per document (map-only)."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        gopher_metrics_batch, batch_format="pyarrow", batch_size=None
    )


Q_GOPHER_QUALITY_SQL = f"""
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
tot AS (
  SELECT doc_id, COUNT(*) AS n_words, SUM(length(w)) AS total_chars
  FROM w GROUP BY doc_id
),
big AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
cnt AS (
  SELECT doc_id, w1, w2, COUNT(*) AS n, length(w1) + length(w2) AS chars
  FROM big GROUP BY ALL
),
top AS (
  SELECT doc_id, w1, w2, n, chars,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, w1, w2) AS rk
  FROM cnt
),
dup AS (
  SELECT doc_id,
         SUM(CASE WHEN n > 1 THEN n * chars ELSE 0 END) AS dup_chars
  FROM cnt GROUP BY doc_id
),
m AS (
  SELECT t.doc_id,
         CAST(t.n_words AS BIGINT) AS n_words,
         CAST(t.total_chars AS DOUBLE) / t.n_words AS mean_word_len,
         COALESCE(p.w1 || ' ' || p.w2, '') AS top_bigram,
         CAST(COALESCE(p.n, 0) AS BIGINT) AS top_bigram_n,
         CAST(COALESCE(p.n * p.chars, 0) AS DOUBLE) / t.total_chars AS frac_top_bigram,
         CAST(COALESCE(d.dup_chars, 0) AS DOUBLE) / t.total_chars AS dup_bigram_frac
  FROM tot t
  LEFT JOIN top p ON p.doc_id = t.doc_id AND p.rk = 1
  LEFT JOIN dup d ON d.doc_id = t.doc_id
)
SELECT *,
       CAST(n_words >= {GOPHER_MIN_WORDS}
            AND mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN}
            AND frac_top_bigram < {GOPHER_MAX_TOP_BIGRAM_FRAC}
            AND dup_bigram_frac < {GOPHER_MAX_DUP_BIGRAM_FRAC} AS BIGINT) AS keep
FROM m
"""


# ------------------------------------------------------------- PII scan ----

# Patterns chosen to parse identically under Python re and DuckDB's RE2
# (no lookaround, no backrefs; \b and {m,n} are common to both).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_augment(doc_id: np.ndarray, text: pd.Series) -> pd.Series:
    """Deterministically embed synthetic PII derived from doc_id.

    The corpus has no organic PII, so the harness plants a known amount
    per document (same construction in the SQL oracle) — the operator
    under test is the scan/redact pass, not the planting.
    """
    ids = pd.Series(doc_id.astype(np.int64), index=text.index)
    phone = (ids * 7919 % 10000).astype(str).str.zfill(4)
    return (
        text
        + " contact user" + ids.astype(str) + "@example.com phone 555-"
        + phone
        + " host 10." + (ids % 256).astype(str) + ".0." + (ids % 100).astype(str)
    )


def pii_scan_batch(t: pa.Table) -> pa.Table:
    doc_id = t.column("doc_id").to_numpy(zero_copy_only=False)
    text = t.column("text").to_pandas()
    aug = pii_augment(doc_id, text)
    n_emails = aug.str.count(PII_EMAIL).astype(np.int64)
    n_phones = aug.str.count(PII_PHONE).astype(np.int64)
    n_ipv4 = aug.str.count(PII_IPV4).astype(np.int64)
    red = (
        aug.str.replace(PII_EMAIL, "<EMAIL>", regex=True)
        .str.replace(PII_PHONE, "<PHONE>", regex=True)
        .str.replace(PII_IPV4, "<IP>", regex=True)
    )
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "n_emails": pa.array(n_emails.to_numpy(), pa.int64()),
            "n_phones": pa.array(n_phones.to_numpy(), pa.int64()),
            "n_ipv4": pa.array(n_ipv4.to_numpy(), pa.int64()),
            "redacted": pa.array(red.tolist(), pa.string()),
        }
    )


def q_pii_scan(sf_dir: str):
    """Regex PII detection + redaction per document (map-only)."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(pii_scan_batch, batch_format="pyarrow", batch_size=None)


Q_PII_SCAN_SQL = rf"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com phone 555-'
              || lpad(CAST((doc_id * 7919) % 10000 AS VARCHAR), 4, '0')
              || ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
              || '.0.' || CAST(doc_id % 100 AS VARCHAR) AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t, '{PII_IPV4}')) AS BIGINT) AS n_ipv4,
       regexp_replace(
         regexp_replace(
           regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_PHONE}', '<PHONE>', 'g'),
         '{PII_IPV4}', '<IP>', 'g') AS redacted
FROM aug
"""


# ------------------------------------------------- corpus bigram stats ----

def _bigram_partials(t: pa.Table) -> pa.Table:
    """Per-batch combined (bigram, n) counts — the only thing shuffled."""
    lists = pc.split_pattern(t.column("text"), " ")
    arr = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = np.diff(offsets)
    words = np.asarray(arr.flatten().to_pylist(), dtype=object)
    doc_idx = np.repeat(np.arange(len(n_words)), n_words)

    uniq, inv = np.unique(words, return_inverse=True)
    V = max(len(uniq), 1)
    same_doc = doc_idx[:-1] == doc_idx[1:] if len(doc_idx) > 1 else np.zeros(0, bool)
    code = inv[:-1][same_doc] * V + inv[1:][same_doc]
    ucode, counts = np.unique(code, return_counts=True)
    grams = [f"{uniq[c // V]} {uniq[c % V]}" for c in ucode]
    return pa.Table.from_pydict(
        {
            "bigram": pa.array(grams, pa.string()),
            "n": pa.array(counts, pa.int64()),
        }
    )


def q_ngram_stats(sf_dir: str, k: int = 100):
    """Corpus-wide top-k bigrams by occurrence count.

    Shape: map_batches partial combiner (batch-local unique+count) →
    small groupby sum over (bigram) → global sort (n desc, bigram) →
    limit k.  The shuffle moves at most |batch vocab|² partial rows per
    batch, never the corpus text.
    """
    docs = _read_documents(sf_dir, ["text"])
    agg = (
        docs.map_batches(_bigram_partials, batch_format="pyarrow", batch_size=65536)
        .groupby("bigram", num_partitions=4)
        .sum("n")
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "bigram": t.column("bigram"),
                "n": pc.cast(t.column("sum(n)"), pa.int64()),
            }
        )

    return (
        agg.map_batches(finalize, batch_format="pyarrow")
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k)
    )


Q_NGRAM_STATS_SQL = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT a.w || ' ' || b.w AS bigram, COUNT(*) AS n
FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 100
"""


# ---------------------------------------------- KMV distinct sketch ----

KMV_K = 16
_KMV_HEX = 14  # 56-bit hash values: (k-1)*2^56 stays exactly a float64


def kmv_hash(words) -> np.ndarray:
    """56-bit integer hash per word (first 14 hex chars of md5)."""
    return np.array(
        [int(hashlib.md5(w.encode("utf-8")).hexdigest()[:_KMV_HEX], 16) for w in words],
        dtype=np.int64,
    )


def kmv_estimate(kth_value: int, k: int = KMV_K) -> int:
    """KMV cardinality estimate floor((k-1)·2^56 / v_k) — one IEEE divide."""
    return int(np.floor(np.float64((k - 1) * (1 << (_KMV_HEX * 4))) / np.float64(kth_value)))


def _kmv_partials(t: pa.Table) -> pa.Table:
    """Distinct (source, word, hash) triples for one batch.

    At real vocabulary scale this would also truncate to the k smallest
    hashes per source (KMV partials are mergeable by union+truncate);
    the synthetic vocab is smaller than k·sources so truncation is a
    no-op and is skipped for clarity.
    """
    src = np.asarray(t.column("source").to_pylist(), dtype=object)
    lists = pc.split_pattern(t.column("text"), " ")
    arr = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    n_words = np.diff(arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    words = np.asarray(arr.flatten().to_pylist(), dtype=object)
    src_per_word = np.repeat(src, n_words)
    pairs = (
        pd.DataFrame({"source": src_per_word, "w": words})
        .drop_duplicates()
        .reset_index(drop=True)
    )
    return pa.Table.from_pydict(
        {
            "source": pa.array(pairs["source"].tolist(), pa.string()),
            "w": pa.array(pairs["w"].tolist(), pa.string()),
            "hv": pa.array(kmv_hash(pairs["w"].tolist()), pa.int64()),
        }
    )


def q_distinct_sketch(sf_dir: str, k: int = KMV_K):
    """Per-source distinct-word cardinality: KMV sketch vs exact count."""
    docs = _read_documents(sf_dir, ["source", "text"])
    parts = docs.map_batches(_kmv_partials, batch_format="pyarrow", batch_size=65536)

    def per_source(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.drop_duplicates("w").sort_values("hv", kind="mergesort")
        nd = len(sub)
        if nd >= k:
            vk = int(sub["hv"].iloc[k - 1])
            est, kth = kmv_estimate(vk, k), format(vk, f"0{_KMV_HEX}x")
        else:
            est, kth = nd, ""
        return pd.DataFrame(
            {
                "source": [sub["source"].iloc[0]],
                "exact_distinct": np.array([nd], dtype=np.int64),
                "est_distinct": np.array([est], dtype=np.int64),
                "kth_hash": [kth],
            }
        )

    return (
        parts.groupby("source", num_partitions=4)
        .map_groups(per_source, batch_format="pandas")
    )


Q_DISTINCT_SKETCH_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT source, w
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
),
h AS (
  SELECT source, w,
         ('0x' || substr(md5(w), 1, {_KMV_HEX}))::BIGINT AS hv
  FROM pairs
),
rk AS (
  SELECT source, hv,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS nd
  FROM h
)
SELECT source,
       CAST(nd AS BIGINT) AS exact_distinct,
       CAST(CASE WHEN nd >= {KMV_K}
                 THEN floor(CAST({(KMV_K - 1) * (1 << (_KMV_HEX * 4))} AS DOUBLE) / hv)
                 ELSE nd END AS BIGINT) AS est_distinct,
       CASE WHEN nd >= {KMV_K} THEN lpad(format('{{:x}}', hv), {_KMV_HEX}, '0')
            ELSE '' END AS kth_hash
FROM rk
WHERE rk = {KMV_K} OR (nd < {KMV_K} AND rk = 1)
"""


# ------------------------------------------------- per-group top-k ----

def q_top_docs_per_source(sf_dir: str, k: int = 3):
    """Top-k longest documents per source (per-GROUP top-k — the window
    function ROW_NUMBER() OVER (PARTITION BY ...) shape).

    Plan: per-batch prune to the local top-k per source (a batch can
    only contribute k rows per source) → hash-partitioned groupby on
    source → exact top-k per group.  The shuffle carries at most
    k × sources × batches rows, never the corpus.  Tie-break
    (n_chars desc, doc_id asc) is total, so both engines agree.
    """
    import pandas as pd

    docs = _read_documents(sf_dir, ["doc_id", "source", "n_chars"])

    def local_topk(t: pa.Table) -> "pd.DataFrame":
        df = t.to_pandas()
        df = df.sort_values(
            ["source", "n_chars", "doc_id"], ascending=[True, False, True]
        )
        return df.groupby("source", as_index=False).head(k)

    def group_topk(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(k)
        out = df.reset_index(drop=True)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[["source", "rank", "doc_id", "n_chars"]]

    return (
        docs.map_batches(local_topk, batch_format="pyarrow", batch_size=65536)
        .groupby("source", num_partitions=4)
        .map_groups(group_topk, batch_format="pandas")
    )


Q_TOP_DOCS_PER_SOURCE_SQL = """
SELECT source, rank, doc_id, n_chars
FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents
)
WHERE rank <= 3
"""


# -------------------------------------------- source vocab similarity ----

def q_source_similarity(sf_dir: str):
    """Pairwise vocabulary Jaccard between sources (corpus-mixture
    diagnostics: which sources are near-duplicates of each other).

    Plan: the per-batch distinct (source, word) projection from the KMV
    sketch is reused — the shuffle is vocabulary-bounded, never corpus
    rows; a global distinct pass reduces to ≤ |vocab|·|sources| pairs,
    which finish on the driver (bounded by construction, like the KMV
    final).  jaccard = one IEEE divide of exact ints.
    """
    docs = _read_documents(sf_dir, ["source", "text"])
    parts = docs.map_batches(_kmv_partials, batch_format="pyarrow", batch_size=65536)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["source", "w"])[["source", "w"]]

    pairs = (
        parts.groupby("source", num_partitions=4)
        .map_groups(dedup, batch_format="pandas")
        .to_pandas()  # <= |vocab| x |sources| rows by construction
    )
    sets = {s: set(g["w"]) for s, g in pairs.groupby("source")}
    names = sorted(sets)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            common = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            rows.append((a, b, common, union))
    return pd.DataFrame(
        {
            "source_a": [r[0] for r in rows],
            "source_b": [r[1] for r in rows],
            "n_common": np.array([r[2] for r in rows], dtype=np.int64),
            "n_union": np.array([r[3] for r in rows], dtype=np.int64),
            "jaccard": np.array([r[2] for r in rows], dtype=np.float64)
            / np.array([r[3] for r in rows], dtype=np.int64),
        }
    )


Q_SOURCE_SIMILARITY_SQL = """
WITH v AS (
  SELECT DISTINCT source, w
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
),
d AS (SELECT source, COUNT(*) AS nd FROM v GROUP BY source),
c AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
  FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT da.source AS source_a, db.source AS source_b,
       CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
       CAST(da.nd + db.nd - COALESCE(c.n_common, 0) AS BIGINT) AS n_union,
       CAST(COALESCE(c.n_common, 0) AS DOUBLE)
         / (da.nd + db.nd - COALESCE(c.n_common, 0)) AS jaccard
FROM d da
JOIN d db ON da.source < db.source
LEFT JOIN c ON c.source_a = da.source AND c.source_b = db.source
"""
