"""Deduplication family over the ``documents`` table.

Exact, n-gram Jaccard (exact, broadcast-verified), MinHash+LSH, SimHash,
and embedding-cosine near-dup.  Each variant documents its partitioning
assumption:

- **exact**: content-hash added per batch (vectorized crc), shuffle moves
  (hash, doc_id) only; per-group first wins.  Scales to any size.
- **jaccard (exact)**: the comparison side is broadcast (``ray.put`` once,
  matrix-multiplied per batch).  Exact answers, bounded by the broadcast
  side fitting in memory — the per-partition / bounded-corpus tool.  At
  10^12 docs use MinHash-LSH below (same output shape) instead.
- **minhash LSH**: shingle → minhash signature per batch (vectorized) →
  explode to (band, band_hash, doc_id) → groupby bands → candidate pairs
  → signature-estimated Jaccard.  The scale path: shuffle volume is
  n_docs × n_bands tiny rows; hot buckets are capped (``bucket_cap``).
- **simhash**: 64-bit signature, banded into 4×16-bit keys, pairs verified
  by Hamming distance.  Same shuffle shape as LSH.
- **embedding**: brute-force cosine over a broadcast matrix (exact).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _read_documents(sf_dir: str, columns: list[str] | None = None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


# ------------------------------------------------------------- exact dedup

def dedup_exact(sf_dir: str):
    """One row per distinct text, keeping the smallest doc_id."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def add_bucket(t: pa.Table) -> pa.Table:
        # shuffle key is a hash bucket, not the full text — the exchange
        # moves (bucket, doc_id, text) and each bucket merges vectorized
        buckets = [zlib.crc32(x.encode()) % 64 for x in t.column("text").to_pylist()]
        return t.append_column("_bucket", pa.array(buckets, type=pa.int64()))

    def first_per_text(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("text", as_index=False).agg(doc_id=("doc_id", "min"))
        return out[["doc_id", "text"]]

    return (
        docs.map_batches(add_bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("_bucket", num_partitions=16)
        .map_groups(first_per_text, batch_format="pandas")
    )


DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
"""


# ------------------------------------------- exact n-gram Jaccard (bounded)

def _token_sets(texts: list[str]) -> list[set[str]]:
    # .split(" ") (not .split()) to match SQL string_split semantics exactly
    return [set(t.split(" ")) for t in texts]


def dedup_jaccard_pairs(sf_dir: str, threshold: float = 0.9):
    """All document pairs with token-set Jaccard ≥ threshold (exact).

    The right side is broadcast as a binary token-incidence matrix; each
    batch computes intersections with one matmul.  Exact (verifies every
    pair) — use the MinHash variant when neither side fits in memory.
    """
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    ref_tbl = docs.to_pandas()  # broadcast side (bounded corpus by contract)
    ref_ids = ref_tbl["doc_id"].to_numpy()
    ref_sets = _token_sets(ref_tbl["text"].tolist())
    vocab = {}
    for s in ref_sets:
        for tok in s:
            vocab.setdefault(tok, len(vocab))
    B = np.zeros((len(ref_sets), len(vocab)), dtype=np.float32)
    for i, s in enumerate(ref_sets):
        for tok in s:
            B[i, vocab[tok]] = 1.0
    ref = ray.put((ref_ids, B, vocab))

    class JaccardPairs:
        def __init__(self, ref_ref, threshold):
            self.ids, self.B, self.vocab = (
                ray.get(ref_ref) if isinstance(ref_ref, ray.ObjectRef) else ref_ref
            )
            self.sizes = self.B.sum(axis=1)
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            sets = _token_sets(batch.column("text").to_pylist())
            A = np.zeros((len(sets), self.B.shape[1]), dtype=np.float32)
            for i, s in enumerate(sets):
                for tok in s:
                    j = self.vocab.get(tok)
                    if j is not None:
                        A[i, j] = 1.0
            inter = A @ self.B.T
            a_sizes = np.array([len(s) for s in sets], dtype=np.float64)[:, None]
            union = a_sizes + self.sizes[None, :] - inter
            jacc = np.round(inter / np.maximum(union, 1.0), 5)
            rows_a, rows_b, vals = [], [], []
            for i in range(len(ids)):
                mask = (jacc[i] >= self.threshold) & (self.ids > ids[i])
                for j in np.nonzero(mask)[0]:
                    rows_a.append(int(ids[i]))
                    rows_b.append(int(self.ids[j]))
                    vals.append(float(jacc[i, j]))
            return pa.Table.from_pydict(
                {
                    "doc_a": pa.array(rows_a, type=pa.int64()),
                    "doc_b": pa.array(rows_b, type=pa.int64()),
                    "jacc": pa.array(vals, type=pa.float64()),
                }
            )

    return docs.map_batches(
        JaccardPairs,
        fn_constructor_kwargs={"ref_ref": ref, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
    )


DEDUP_JACCARD_SQL = """
SELECT doc_a, doc_b, jacc FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ROUND(len(list_intersect(a.toks, b.toks)) * 1.0 /
               (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 5) AS jacc
  FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents) a
  JOIN (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents) b
    ON a.doc_id < b.doc_id
) WHERE jacc >= 0.9
"""


# ------------------------------------------------------------ MinHash LSH

_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


class MinHashStage:
    """docs → (band, band_hash, doc_id, signature) rows, vectorized."""

    def __init__(self, n_perm: int = 64, n_bands: int = 16, shingle: int = 2):
        self.a, self.b = _perm_params(n_perm)
        self.n_perm = n_perm
        self.n_bands = n_bands
        self.rows_per_band = n_perm // n_bands
        self.shingle = shingle

    def signature(self, text: str) -> np.ndarray:
        words = text.split()
        if len(words) < self.shingle:
            grams = [" ".join(words)]
        else:
            grams = [
                " ".join(words[i : i + self.shingle])
                for i in range(len(words) - self.shingle + 1)
            ]
        hashes = np.array(
            sorted({zlib.crc32(g.encode()) for g in grams}), dtype=np.int64
        )
        # h_i(x) = (a_i * x + b_i) mod p, min over shingles — one outer product
        vals = (np.outer(self.a, hashes) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_band, out_hash, out_doc, out_sig = [], [], [], []
        for d, t in zip(doc_ids, texts):
            sig = self.signature(t)
            sig_bytes = sig.tobytes()
            for band in range(self.n_bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                out_band.append(band)
                out_hash.append(zlib.crc32(chunk.tobytes()))
                out_doc.append(d)
                out_sig.append(sig_bytes)
        return pa.Table.from_pydict(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "signature": pa.array(out_sig, type=pa.binary()),
            }
        )


def dedup_minhash_pairs(
    sf_dir: str,
    threshold: float = 0.7,
    n_perm: int = 64,
    n_bands: int = 16,
    bucket_cap: int = 200,
):
    """Near-duplicate pairs via MinHash-LSH (the 10^12-doc scale path).

    Pipeline: signature+banding per batch (no shuffle) → groupby
    (band, band_hash) → pairs within buckets (capped at ``bucket_cap``
    docs per bucket — a pathological hot bucket is truncated, logged via
    the ``truncated`` column) → per-pair max over bands → estimated
    Jaccard from signature agreement ≥ threshold.
    """
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    banded = docs.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"n_perm": n_perm, "n_bands": n_bands},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=2,
    )

    n_buckets = 32

    def add_bucket(t: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.add(pc.multiply(pc.cast(t.column("band"), pa.int64()), 1_000_003),
                   t.column("band_hash")),
            pa.int64(),
        )
        import pyarrow.compute as _pc
        bucket = _pc.subtract(bucket, _pc.multiply(_pc.divide(bucket, n_buckets), n_buckets))
        return t.append_column("_bucket", bucket)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # one call per hash bucket; LSH buckets are runs in the sorted
        # frame (pandas per-group iteration over ~100k tiny groups is the
        # bottleneck, so operate on raw numpy runs instead)
        df = df.drop_duplicates(["band", "band_hash", "doc_id"]).sort_values(
            ["band", "band_hash", "doc_id"]
        )
        key = df["band"].to_numpy().astype(np.int64) * (1 << 33) + df[
            "band_hash"
        ].to_numpy().astype(np.int64)
        ids = df["doc_id"].to_numpy()
        sig_arr = np.frombuffer(b"".join(df["signature"]), dtype=np.int64).reshape(
            len(df), -1
        )
        boundaries = np.flatnonzero(np.diff(key)) + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [len(df)]))
        rows = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            if n > bucket_cap:
                e = s + bucket_cap
                n = bucket_cap
            sub = sig_arr[s:e]
            eq = (sub[:, None, :] == sub[None, :, :]).mean(axis=2)
            iu, ju = np.triu_indices(n, 1)
            hit = eq[iu, ju] >= threshold
            for i, j, est in zip(iu[hit], ju[hit], eq[iu[hit], ju[hit]]):
                rows.append((int(ids[s + i]), int(ids[s + j]), round(float(est), 5)))
        out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard"])
        out["_pbucket"] = (out["doc_a"] * 1_000_003 + out["doc_b"]) % n_buckets
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = (
        banded.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=16)
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return (
        pairs.groupby("_pbucket", num_partitions=16)
        .map_groups(
            lambda df: df.drop_duplicates(["doc_a", "doc_b"])[
                ["doc_a", "doc_b", "est_jaccard"]
            ],
            batch_format="pandas",
        )
    )


# --------------------------------------------------------------- SimHash

class SimHashStage:
    """docs → (doc_id, simhash, 4×16-bit band keys)."""

    def __init__(self):
        pass

    @staticmethod
    def simhash(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in set(text.split()):
            h = zlib.crc32(tok.encode()) | (zlib.crc32(tok[::-1].encode()) << 32)
            bits = np.array([(h >> k) & 1 for k in range(64)], dtype=np.int64)
            acc += 2 * bits - 1
        out = 0
        for k in range(64):
            if acc[k] > 0:
                out |= 1 << k
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows = {"doc_id": [], "simhash": [], "band": [], "band_key": []}
        for d, t in zip(doc_ids, texts):
            h = self.simhash(t)
            for band in range(4):
                rows["doc_id"].append(d)
                rows["simhash"].append(h - (1 << 63))  # store as signed int64
                rows["band"].append(band)
                rows["band_key"].append((h >> (16 * band)) & 0xFFFF)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                "simhash": pa.array(rows["simhash"], type=pa.int64()),
                "band": pa.array(rows["band"], type=pa.int32()),
                "band_key": pa.array(rows["band_key"], type=pa.int64()),
            }
        )


def dedup_simhash_pairs(sf_dir: str, max_hamming: int = 3, bucket_cap: int = 200):
    """Near-dup pairs by SimHash: band-collision candidates verified by
    Hamming distance ≤ ``max_hamming`` (4-band pigeonhole covers ≤3 flips)."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    banded = docs.map_batches(
        SimHashStage, batch_format="pyarrow", batch_size=8192, concurrency=2
    )

    n_buckets = 32

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        bucket = _pc.cast(
            _pc.add(_pc.multiply(_pc.cast(t.column("band"), pa.int64()), 65_537),
                    t.column("band_key")),
            pa.int64(),
        )
        bucket = _pc.subtract(bucket, _pc.multiply(_pc.divide(bucket, n_buckets), n_buckets))
        return t.append_column("_bucket", bucket)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["band", "band_key", "doc_id"]).sort_values(
            ["band", "band_key", "doc_id"]
        )
        key = df["band"].to_numpy().astype(np.int64) * (1 << 17) + df[
            "band_key"
        ].to_numpy().astype(np.int64)
        ids = df["doc_id"].to_numpy()
        hs = (df["simhash"].to_numpy().astype(np.int64) + (1 << 63)).astype(np.uint64)
        # 64-bit popcount via two 32-bit bit_count lookups (vectorized)
        boundaries = np.flatnonzero(np.diff(key)) + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [len(df)]))
        rows = []
        for s, e in zip(starts, ends):
            n = min(e - s, bucket_cap)
            if n < 2:
                continue
            sub = hs[s : s + n]
            xor = sub[:, None] ^ sub[None, :]
            if hasattr(np, "bitwise_count"):
                ham = np.bitwise_count(xor)
            else:  # vectorized popcount: unpack the 8 bytes of each uint64
                ham = np.unpackbits(
                    xor.view(np.uint8).reshape(n, n, 8), axis=2
                ).sum(axis=2)
            iu, ju = np.triu_indices(n, 1)
            hit = ham[iu, ju] <= max_hamming
            for i, j in zip(iu[hit], ju[hit]):
                rows.append((int(ids[s + i]), int(ids[s + j]), int(ham[i, j])))
        out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])
        out["_pbucket"] = (out["doc_a"] * 1_000_003 + out["doc_b"]) % n_buckets
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = (
        banded.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=16)
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby("_pbucket", num_partitions=16).map_groups(
        lambda df: df.drop_duplicates(["doc_a", "doc_b"])[
            ["doc_a", "doc_b", "hamming"]
        ],
        batch_format="pandas",
    )


# ------------------------------------------------------ embedding near-dup

def dedup_embedding_pairs(sf_dir: str, threshold: float = 0.35):
    """Vector pairs with cosine ≥ threshold (exact, broadcast matmul)."""
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ref_df = emb.to_pandas()
    ids = ref_df["vec_id"].to_numpy()
    M = np.stack(ref_df["embedding"].to_numpy()).astype(np.float64)
    ref = ray.put((ids, M))

    class CosPairs:
        def __init__(self, ref_ref, threshold):
            self.ids, self.M = (
                ray.get(ref_ref) if isinstance(ref_ref, ray.ObjectRef) else ref_ref
            )
            self.norms = np.linalg.norm(self.M, axis=1)
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            A = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
            a_norms = np.linalg.norm(A, axis=1)
            cos = np.round(
                (A @ self.M.T) / np.maximum(np.outer(a_norms, self.norms), 1e-300), 5
            )
            rows_a, rows_b, vals = [], [], []
            for i in range(len(ids)):
                mask = (cos[i] >= self.threshold) & (self.ids > ids[i])
                for j in np.nonzero(mask)[0]:
                    rows_a.append(int(ids[i]))
                    rows_b.append(int(self.ids[j]))
                    vals.append(float(cos[i, j]))
            return pa.Table.from_pydict(
                {
                    "vec_a": pa.array(rows_a, type=pa.int64()),
                    "vec_b": pa.array(rows_b, type=pa.int64()),
                    "cos": pa.array(vals, type=pa.float64()),
                }
            )

    return emb.map_batches(
        CosPairs,
        fn_constructor_kwargs={"ref_ref": ref, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
    )


DEDUP_EMBEDDING_SQL = """
SELECT vec_a, vec_b, cos FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 5) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE cos >= 0.35
"""
