"""End-to-end training-data curation pipeline over the ``documents``
table — the composition the individual operators exist for:

    quality filter (token count)
      → benchmark-split removal + n-gram decontamination
      → exact dedup (keep lowest doc_id per text)
      → stratified mixture sampling (per-language hash thresholds)
      → global deterministic shuffle rank

Output: ``(doc_id, lang, rank)`` — the curated, mixed, shuffled corpus
manifest a trainer would consume.  Every stage is the SAME rule as its
standalone query (shared constants), so the composed DuckDB oracle is
exact CTE-for-stage.

Scale shape at 100 TB (each stage documented at its home operator):

- stages 1/2/4 are **map-only** (quality/mixture are pure row
  predicates; decontamination probes a broadcast benchmark gram set);
- stage 3's exchange carries (16-B digest, doc_id) only;
- stage 5 is the histogram-prefix rank (one bucketed groupby);
- the contaminated-id drop list is collected once (structurally small:
  eval-overlap hits); the duplicate-id drop list is CHECKPOINTED to
  parquet (8 B/row on disk, count read from the footers — never pinned
  in the object store: duplicate-majority web corpora make it ~8 TB at
  10^12 docs) and applied ADAPTIVELY exactly as ``dedup_exact`` does:
  ``≤ broadcast_limit`` drops → driver reads the small files once +
  ``ray.put`` broadcast filter; above it the list never touches the
  driver — a hash-partitioned ``left_anti`` join re-streams the files
  with per-partition memory only;
- the curated (doc_id, lang) set is CHECKPOINTED to partitioned
  parquet (atomic tmp+rename, pipelines/checkpoint contract) and the
  two shuffle-rank passes re-STREAM it from disk — nothing is pinned
  in the object store between passes (at the north rule's 10^12 docs
  a materialized manifest would be ~16 TB of object store).
"""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from rust_bert_ray.functions.dedup import (
    DEDUP_CONTAMINATION_SQL,
    dedup_contamination,
)
from rust_bert_ray.functions.text import (
    MIXTURE_DEFAULT_THRESHOLD,
    MIXTURE_THRESHOLDS,
    _MIX_MOD,
    _MIX_MULT,
    _SHUF_MOD,
    _SHUF_MULT,
    _mixture_case_sql,
    shuffle_rank,
)

MIN_TOKENS = 15
BENCH_MOD, BENCH_REM = 10, 3  # must match dedup_contamination defaults
CKPT_ROOT = "/tmp/rbr_curation_ckpt"


def curate(
    sf_dir: str,
    min_tokens: int = MIN_TOKENS,
    broadcast_limit: int = 5_000_000,
    checkpoint_dir: str | None = None,
):
    """→ Dataset of (doc_id, lang, rank) for the curated corpus.

    ``broadcast_limit``: duplicate drop-lists above this row count are
    removed with a hash-partitioned ``left_anti`` join instead of a
    driver-collected broadcast (same adaptive rule as
    functions/dedup.dedup_exact — tests force the join path with 0).
    ``checkpoint_dir``: where the curated (doc_id, lang) boundary is
    checkpointed; defaults to a path keyed on (sf_dir, params).
    """
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    # ---- stage 2 prep: contaminated train-doc ids (reuses the
    # standalone operator — same bench split, same 8-gram rule)
    contam = dedup_contamination(sf_dir).to_pandas()  # eval-overlap hits: tiny
    contam_ids = (
        contam["doc_id"].to_numpy(np.int64)
        if "doc_id" in contam.columns  # zero hits → column-less empty frame
        else np.empty(0, np.int64)
    )
    contam_ref = ray.put(np.sort(contam_ids))

    # ---- stages 1+2: quality + bench-split + decontamination (map-only).
    # Task pool, not actor pool: the only state is a broadcast id array
    # (zero-copy ray.get from the local object store per task), and task
    # pools can't starve the scheduler the way CPU-reserving actor pools
    # do (CLAUDE.md fact #1/#11).
    def quality_filter(t: pa.Table) -> pa.Table:
        contam = ray.get(contam_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n_tokens = pc.add(
            pc.count_substring(t.column("text"), " "), 1
        ).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(contam, ids), max(len(contam) - 1, 0))
        is_contam = (
            (contam[pos] == ids) if len(contam) else np.zeros(len(ids), bool)
        )
        keep = (
            (n_tokens >= min_tokens)
            & (ids % BENCH_MOD != BENCH_REM)
            & ~is_contam
        )
        return t.filter(pa.array(keep))

    survivors = docs.map_batches(
        quality_filter, batch_format="pyarrow", batch_size=65536
    )

    # ---- stage 3: exact dedup among survivors (digest-only exchange,
    # same algebra as functions/dedup.dedup_exact)
    def add_digest(t: pa.Table) -> pa.Table:
        dg = [
            hashlib.blake2b(x.encode(), digest_size=16).digest()
            for x in t.column("text").to_pylist()
        ]
        return pa.Table.from_pydict(
            {
                "digest": pa.array(dg, type=pa.binary()),
                "doc_id": t.column("doc_id"),
                "_bucket": pa.array([d[0] % 64 for d in dg], type=pa.int64()),
            }
        )

    def drops_per_bucket(df: pd.DataFrame) -> pa.Table:
        mins = df.groupby("digest")["doc_id"].transform("min")
        return pa.Table.from_pandas(
            df.loc[df["doc_id"] != mins, ["doc_id"]], preserve_index=False
        )

    drops = (
        survivors.map_batches(add_digest, batch_format="pyarrow", batch_size=None)
        .groupby("_bucket", num_partitions=16)
        .map_groups(drops_per_bucket, batch_format="pandas")
    )

    # ---- checkpoint the drop-list to parquet instead of materialize():
    # on a duplicate-majority web corpus the (doc_id)-only list is still
    # ~8 TB at 10^12 docs — pinning it in the object store before count()
    # picks the path spills for nothing.  8 B/row on disk; the row count
    # comes from the parquet FOOTERS (metadata-only read), and the join
    # path re-streams the files.
    from rust_bert_ray.pipelines.checkpoint import atomic_write_parquet, digest

    ckpt_dir = checkpoint_dir or os.path.join(
        CKPT_ROOT, digest(os.path.abspath(sf_dir), min_tokens, "v1"), "curated"
    )
    drops_dir = ckpt_dir + ".drops"
    atomic_write_parquet(drops, drops_dir)
    drop_files = sorted(glob.glob(os.path.join(drops_dir, "*.parquet")))
    n_drops = sum(pq.ParquetFile(f).metadata.num_rows for f in drop_files)

    # Adaptive drop-list application (mirrors functions/dedup.dedup_exact):
    # duplicate-MAJORITY corpora must never collect the list to the driver.
    if n_drops > broadcast_limit:
        dup_ref = None
        deduped = survivors.join(
            ray.data.read_parquet(drop_files),
            "left_anti",
            num_partitions=16,
            on=("doc_id",),
        )
    else:
        dup_ids = (
            pq.read_table(drop_files, columns=["doc_id"])
            .column("doc_id")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            if drop_files
            else np.empty(0, np.int64)
        )
        dup_ref = ray.put(np.sort(dup_ids))
        deduped = survivors

    # ---- stage 4: drop duplicates (broadcast path) + mixture sampling,
    # project away text
    def mixture_filter(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        if dup_ref is not None:
            dup = ray.get(dup_ref)
            pos = np.minimum(np.searchsorted(dup, ids), max(len(dup) - 1, 0))
            is_dup = (dup[pos] == ids) if len(dup) else np.zeros(len(ids), bool)
        else:  # join path already removed duplicates
            is_dup = np.zeros(len(ids), bool)
        h = (
            (ids.astype(np.uint64) % np.uint64(_MIX_MOD))
            * np.uint64(_MIX_MULT)
            % np.uint64(_MIX_MOD)
        )
        thr = (
            t.column("lang")
            .to_pandas()
            .map(MIXTURE_THRESHOLDS)
            .fillna(MIXTURE_DEFAULT_THRESHOLD)
            .to_numpy(dtype=np.uint64)
        )
        return t.filter(pa.array(~is_dup & (h < thr))).select(["doc_id", "lang"])

    sampled = deduped.map_batches(
        mixture_filter, batch_format="pyarrow", batch_size=65536
    )

    # ---- checkpoint boundary: the curated (doc_id, lang) set is written
    # to parquet (atomic tmp+rename) and RE-STREAMED by shuffle_rank's two
    # passes — never pinned in the object store (at 10^12 docs a
    # materialized manifest is ~16 TB).  16 B/row on disk; a resumable
    # production run keys this dir per input partition (checkpoint.py).
    atomic_write_parquet(sampled, ckpt_dir)
    if glob.glob(os.path.join(ckpt_dir, "*.parquet")):
        sampled = ray.data.read_parquet(ckpt_dir)
    # (empty curated set ⇒ zero-file dir; fall through with the in-memory
    # empty dataset — nothing to re-stream)

    # ---- stage 5: global shuffle rank over the curated set
    return shuffle_rank(sampled)


def curation_corpus(sf_dir: str):
    """queries() entry: the curated corpus manifest (doc_id, lang, rank)."""
    return curate(sf_dir)


# Composed oracle: one CTE per stage, each reusing the standalone
# operator's exact rule/constants.
CURATION_SQL = f"""
WITH base AS (
  SELECT doc_id, text, lang,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents
), contam AS (
  SELECT doc_id FROM ({DEDUP_CONTAMINATION_SQL.strip()})
), q AS (
  SELECT doc_id, text, lang FROM base
  WHERE n_tokens >= {MIN_TOKENS}
    AND doc_id % {BENCH_MOD} <> {BENCH_REM}
    AND doc_id NOT IN (SELECT doc_id FROM contam)
), keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text
), s AS (
  SELECT q.doc_id, q.lang FROM q SEMI JOIN keepers USING (doc_id)
), m AS (
  SELECT doc_id, lang FROM s
  WHERE CAST(doc_id % {_MIX_MOD} AS HUGEINT) * {_MIX_MULT} % {_MIX_MOD} <
        {_mixture_case_sql()}
)
SELECT doc_id, lang,
       ROW_NUMBER() OVER (
         ORDER BY (doc_id % {_SHUF_MOD}) * {_SHUF_MULT} % {_SHUF_MOD}, doc_id
       ) - 1 AS rank
FROM m
"""


if __name__ == "__main__":
    import sys

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = curate(sf).to_pandas().sort_values("rank", ignore_index=True)
    print(out.head(10).to_string())
    print(f"{len(out)} curated docs; langs: {out['lang'].value_counts().to_dict()}")
    ray.shutdown()
